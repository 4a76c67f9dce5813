package graft

import graft.operators.QualityModel
import org.apache.spark.sql.functions._

/** Pins the model-based quality filter: planted clean-vs-junk corpora
  * must separate perfectly, scoring is total and bounded, and the
  * self-supervised weak-label loop agrees with its own training signal.
  * (No DuckDB oracle exists — L-BFGS probabilities are float-iteration
  * artifacts — so this spec IS the correctness gate for
  * `quality_model_score`.) */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  // fluent-ish sentences (stopword-rich, varied transitions) vs junk
  // (shuffled rare tokens / digit salad): linearly separable on hashed
  // unigram+bigram counts by construction
  private def planted = {
    val clean = (0 until 40).map { i =>
      val subj = Seq("the table", "a window", "the query", "a batch")(i % 4)
      val verb = Seq("scans", "merges", "sorts", "filters")((i / 4) % 4)
      val obj = Seq("the rows", "each part", "the keys", "a value")((i / 16) % 4)
      (i.toLong, s"$subj $verb $obj and then $subj $verb $obj again", 1.0)
    }
    val junk = (0 until 40).map { i =>
      val w = Seq("zzz9", "qq7x", "0x1f", "kjhg", "99aa", "b0b0")
      (100L + i, s"${w(i % 6)} ${w((i + 1) % 6)} ${w((i + 3) % 6)} ${w((i * 5) % 6)}", 0.0)
    }
    (clean ++ junk).toDF("id", "text", "label")
  }

  test("planted clean vs junk separates: min clean score > max junk score") {
    val df = planted
    val model = QualityModel.train(df, col("text"), col("label"),
      numFeatures = 1 << 12, maxIter = 30)
    val scored = QualityModel.score(model, df, col("text"))
      .select($"label", $"model_quality").collect()
    val clean = scored.filter(_.getDouble(0) == 1.0).map(_.getDouble(1))
    val junk = scored.filter(_.getDouble(0) == 0.0).map(_.getDouble(1))
    assert(clean.min > junk.max,
      s"no separation: clean.min=${clean.min} junk.max=${junk.max}")
    assert(clean.min > 0.9 && junk.max < 0.1, "weak margins")
  }

  test("score is total, bounded, and null-safe") {
    val df = planted
    val model = QualityModel.train(df, col("text"), col("label"),
      numFeatures = 1 << 12, maxIter = 10)
    val withNull = df.unionByName(
      Seq((999L, null.asInstanceOf[String], 0.0)).toDF("id", "text", "label"))
    val out = QualityModel.score(model, withNull, col("text"))
    assert(out.count() == withNull.count(), "scoring must not drop rows")
    assert(out.filter($"model_quality".isNull).select($"id").as[Long]
      .collect().toSeq == Seq(999L), "exactly the null-text row scores null")
    assert(out.filter($"model_quality" < 0 || $"model_quality" > 1).isEmpty,
      "probabilities must be in [0,1]")
  }

  test("train-time hash sampling is deterministic and actually caps") {
    val df = planted
    val m1 = QualityModel.train(df, col("text"), col("label"),
      numFeatures = 1 << 12, maxIter = 10, trainPct = 50)
    val m2 = QualityModel.train(df.repartition(7), col("text"), col("label"),
      numFeatures = 1 << 12, maxIter = 10, trainPct = 50)
    // same md5-selected training rows regardless of partitioning ->
    // identical data -> coefficient vectors agree to float tolerance
    val d = m1.coefficients.toArray.zip(m2.coefficients.toArray)
      .map { case (a, b) => math.abs(a - b) }.max
    assert(d < 1e-6, s"sampled training set must be partition-invariant: $d")
  }

  test("weak-label loop: labels split on the corpus's own LM quartiles " +
    "and the model agrees with its training extremes") {
    val docs = planted.select($"id".as("doc_id"), $"text")
    val out = QualityModel.weakLabelScore(docs, "doc_id", col("text"),
      numFeatures = 1 << 12, maxIter = 20)
    assert(out.count() == 80, "every doc comes back scored")
    val pos = out.filter($"weak_label" === 1.0)
    val neg = out.filter($"weak_label" === 0.0)
    assert(pos.count() >= 20 && neg.count() >= 20, "quartile extremes labeled")
    val meanPos = pos.agg(avg($"model_quality")).as[Double].head()
    val meanNeg = neg.agg(avg($"model_quality")).as[Double].head()
    assert(meanPos > meanNeg + 0.5,
      s"model must separate its weak classes: $meanPos vs $meanNeg")
  }

  test("declarative scoring == model.transform probabilities " +
    "(SQL hash() must be HashingTF's murmur3)") {
    import org.apache.spark.ml.feature.HashingTF
    import org.apache.spark.ml.functions.vector_to_array
    val df = planted
    val model = QualityModel.train(df, col("text"), col("label"),
      numFeatures = 1 << 12, maxIter = 10)
    val ours = QualityModel.score(model, df, col("text"))
      .select($"id", $"model_quality").as[(Long, Double)].collect().toMap
    // reference: the full spark.ml transform path on the same grams
    val tf = new HashingTF().setInputCol("__g").setOutputCol("features")
      .setNumFeatures(model.numFeatures)
    val prepped = tf.transform(df
      .withColumn("__qm_toks", split($"text", " "))
      .withColumn("__g", graft.operators.QualityModel.grams("__qm_toks")))
    val ref = model.transform(prepped)
      .select($"id", vector_to_array(col("probability"))(1))
      .as[(Long, Double)].collect().toMap
    val worst = ours.map { case (k, v) => math.abs(v - ref(k)) }.max
    assert(worst < 1e-12,
      s"declarative margin drifted from model.transform: $worst")
  }

  test("a batch-trained model scores a STREAM, bit-identical to batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val df = planted
    val model = QualityModel.train(df, col("text"), col("label"),
      numFeatures = 1 << 12, maxIter = 10)
    val mem = MemoryStream[(Long, String)]
    mem.addData(planted.select($"id", $"text").as[(Long, String)]
      .collect().toSeq: _*)
    val scored = QualityModel.score(model,
      mem.toDF().toDF("id", "text"), col("text"))
    val q = scored.writeStream.format("memory")
      .queryName("qm_stream").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("qm_stream")
      .select($"id", $"model_quality").as[(Long, Double)]
      .collect().toMap
    val batch = QualityModel.score(model, df, col("text"))
      .select($"id", $"model_quality").as[(Long, Double)]
      .collect().toMap
    assert(streamed == batch,
      "stream scoring must equal batch scoring exactly")
  }

  test("ml_term_index matches HashingTF's bucket for every probe term") {
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setNumFeatures(1 << 12)
    val terms = Seq("the", "table", "a b", "zzz9", "", "😀", "merge batch")
    val got = terms.toDF("t")
      .select(graft.functions.MlHashFunctions
        .ml_term_index(col("t"), 1 << 12))
      .as[Int].collect().toSeq
    assert(got == terms.map(t => tf.indexOf(t)))
  }

  test("margin skips null tokens and breaks bigram adjacency on them") {
    val model = QualityModel.train(planted, col("text"), col("label"),
      numFeatures = 1 << 12, maxIter = 5)
    val withNullTok = Seq(1).toDF("one")
      .select(array(lit("the"), lit(null).cast("string"), lit("table"))
        .as("toks"))
      .select(graft.functions.MlHashFunctions.linear_text_margin(
        col("toks"), model.coefficients.toArray, model.intercept,
        model.numFeatures).as("m"))
      .as[Double].head()
    val separate = Seq(1).toDF("one")
      .select((graft.functions.MlHashFunctions.linear_text_margin(
          array(lit("the")), model.coefficients.toArray, 0.0,
          model.numFeatures) +
        graft.functions.MlHashFunctions.linear_text_margin(
          array(lit("table")), model.coefficients.toArray,
          model.intercept, model.numFeatures)).as("m"))
      .as[Double].head()
    assert(math.abs(withNullTok - separate) < 1e-12,
      "null token must contribute nothing and break the bigram")
  }

  test("reserved output column is guarded") {
    val df = planted.withColumn("model_quality", lit(0.0))
    val model = QualityModel.train(planted, col("text"), col("label"),
      numFeatures = 1 << 10, maxIter = 5)
    intercept[IllegalArgumentException] {
      QualityModel.score(model, df, col("text"))
    }
  }
}
