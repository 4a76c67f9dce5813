package graft

import graft.operators.Unigram
import org.apache.spark.sql.functions._

/** Pins the unigram-LM tokenizer: segmentation always reconstructs the
  * input (coverage), frequent words collapse to single pieces, the DP
  * prefers higher-probability splits, training is partition-invariant,
  * and unknown characters never break encoding. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the table scans the rows"),
    (2L, "the table merges the keys"),
    (3L, "a window sorts the rows"),
    (4L, "the window filters a value"),
    (5L, "the table the table the table")).toDF("doc_id", "text")

  test("coverage: concatenated pieces reconstruct every word") {
    val vocab = Unigram.train(corpus, col("text"), vocabSize = 60)
    val bad = corpus
      .select(explode(split(col("text"), " ")).as("w")).distinct()
      .withColumn("rt",
        concat_ws("", Unigram.tokens(col("w"), vocab)))
      .filter(col("rt") =!= col("w"))
    assert(bad.isEmpty, s"round-trip broke: ${bad.collect().toSeq}")
  }

  test("frequent words become single pieces") {
    val vocab = Unigram.train(corpus, col("text"), vocabSize = 60)
    val pieces = vocab.map(_._1).toSet
    assert(pieces.contains("the") && pieces.contains("table"),
      s"high-frequency words must be whole pieces, got ${pieces.take(20)}")
    val segged = spark.range(1)
      .select(Unigram.tokens(lit("the table"), vocab).as("t"))
      .as[Seq[String]].head()
    assert(segged == Seq("the", "table"), s"got $segged")
  }

  test("higher-probability piece wins over char-by-char splits") {
    // 'scans' occurs once; its chars occur in many words — the word
    // piece must still beat a per-char decomposition when present
    val vocab = Unigram.train(corpus, col("text"), vocabSize = 120)
    val segged = spark.range(1)
      .select(Unigram.tokens(lit("scans"), vocab).as("t"))
      .as[Seq[String]].head()
    assert(segged.length < 5, s"'scans' split char-by-char: $segged")
  }

  test("training and encoding are partition-invariant") {
    val v1 = Unigram.train(corpus, col("text"), vocabSize = 60)
    val v2 = Unigram.train(corpus.repartition(7), col("text"), vocabSize = 60)
    assert(v1 == v2, "learned vocabulary depends on partitioning")
    val t1 = corpus.select(col("doc_id"),
      Unigram.tokens(col("text"), v1).as("t")).orderBy(col("doc_id"))
      .as[(Long, Seq[String])].collect().toSeq
    val t2 = corpus.repartition(5).select(col("doc_id"),
      Unigram.tokens(col("text"), v2).as("t")).orderBy(col("doc_id"))
      .as[(Long, Seq[String])].collect().toSeq
    assert(t1 == t2)
  }

  test("unknown characters segment via the coverage floor") {
    val vocab = Unigram.train(corpus, col("text"), vocabSize = 60)
    val segged = spark.range(1)
      .select(Unigram.tokens(lit("the zq"), vocab).as("t"))
      .as[Seq[String]].head()
    assert(segged.head == "the" && segged.mkString("") == "thezq",
      s"unknown chars must not break segmentation: $segged")
  }

  test("astral (non-BMP) characters survive training and segmentation") {
    // the emoji is 2 UTF-16 units but ONE code point: it must stay in
    // the pruned vocabulary as a coverage char, and an UNKNOWN astral
    // char must segment via the one-code-point floor, never as lone
    // surrogates (which would mangle to replacement chars)
    val astral = Seq((1L, "the 😀 table"), (2L, "the 😀 window"))
      .toDF("doc_id", "text")
    val vocab = Unigram.train(astral, col("text"), vocabSize = 30)
    assert(vocab.exists(_._1 == "😀"), "astral char pruned from vocab")
    val segged = spark.range(1)
      .select(Unigram.tokens(lit("the 🎉"), vocab).as("t"))
      .as[Seq[String]].head()
    assert(segged == Seq("the", "🎉"),
      s"unknown astral char must segment whole: $segged")
  }

  test("null text yields null, empty text yields no pieces") {
    val vocab = Unigram.train(corpus, col("text"), vocabSize = 60)
    val df = Seq((1L, "the table"), (2L, ""),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      Unigram.tokens(col("text"), vocab).as("t"))
      .orderBy(col("doc_id")).collect()
    assert(out(0).getSeq[String](1).nonEmpty)
    assert(out(1).getSeq[String](1).isEmpty)
    assert(out(2).isNullAt(1))
  }
}
