package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Recall/consistency specs for the similarity-search tiers. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, Sf0).cache()

  test("double and exact-decimal cosine agree to 1e-6") {
    val q = emb.filter($"vec_id" < 5)
    val both = Similarity.bruteForceTopK(q, emb, 5)
      .withColumnRenamed("cos_sim", "fast")
      .join(Similarity.bruteForceTopK(q, emb, 5, exact = true)
        .withColumnRenamed("cos_sim", "exact")
        .withColumnRenamed("rank", "rank_e"),
        Seq("query_id", "neighbor_id"))
    val rows = both.select($"fast", $"exact").as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (f, e) => assert(math.abs(f - e) < 1e-6) }
  }

  test("self-similarity is 1, antisymmetric pairs agree") {
    val a = emb.filter($"vec_id" === 0).select($"embedding".as("a"))
    val one = a.select(Similarity.cosine($"a", $"a").as("c"))
      .as[Double].head()
    assert(math.abs(one - 1.0) < 1e-12)
  }

  test("mutualNearestPairs: planted aligned pairs are mutual, the " +
      "one-sided attraction case is not") {
    // tgt space: three well-separated anchors; src: one vector near
    // each anchor, plus a src vector whose nearest tgt (anchor 0) has
    // a DIFFERENT nearest src — one-sided, must not pair
    val src = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(0f, 1f, 0.1f, 0f), 0),
      (2L, Array(0f, 0f, 0f, 1f), 0),
      (3L, Array(0.9f, 0.1f, 0f, 0f), 0)) // also points at anchor 10
      .toDF("vec_id", "embedding", "label")
    val tgt = Seq(
      (10L, Array(0.99f, 0.01f, 0f, 0f), 1),
      (11L, Array(0.01f, 0.99f, 0.1f, 0f), 1),
      (12L, Array(0f, 0.01f, 0f, 0.99f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.mutualNearestPairs(src, tgt)
      .select($"src_id", $"tgt_id", $"margin_src", $"margin_tgt")
      .collect().map(r => r.getLong(0) -> r).toMap
    // src 0 (exactly on anchor 0) beats src 3 for tgt 10's affection
    assert(out.keySet == Set(0L, 1L, 2L))
    assert(out(0L).getLong(1) == 10L)
    assert(out(1L).getLong(1) == 11L)
    assert(out(2L).getLong(1) == 12L)
    // margins are best-minus-second: strictly positive for clean pairs
    out.values.foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(3) > 0)
    }
  }

  test("marginMining surfaces boundary points first; margins ordered " +
      "and consistent") {
    // two tight clusters on orthogonal axes + one planted point on the
    // bisector: its two centroid cosines nearly tie -> smallest margin
    val rows = (0 until 10).map(i =>
        (i.toLong, Array(1f, 0.01f * i, 0f, 0f), 0)) ++
      (10 until 20).map(i =>
        (i.toLong, Array(0.01f * (i - 10), 1f, 0f, 0f), 1)) ++
      Seq((99L, Array(0.705f, 0.709f, 0f, 0f), 0))
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.marginMining(df, k = 5)
      .select($"vec_id", $"best_label", $"second_label", $"best_cos",
        $"second_cos", $"margin")
      .collect()
    assert(out.length == 5)
    assert(out.head.getLong(0) == 99L, "bisector point must mine first")
    out.foreach { r =>
      assert(r.getInt(1) != r.getInt(2)) // two DIFFERENT labels
      assert(math.abs(r.getDouble(5) -
        (r.getDouble(3) - r.getDouble(4))) < 1e-15)
      assert(r.getDouble(5) >= 0)
    }
    // ascending margins
    val ms = out.map(_.getDouble(5))
    assert(ms.zip(ms.tail).forall { case (a, b) => a <= b })
  }

  test("hard negatives: no same-label neighbor, exactly the best " +
      "different-label scores") {
    val q = emb.filter($"vec_id" < 5)
    val out = Similarity.hardNegativesTopK(q, emb, k = 10)
    // every mined negative has a different label than its query
    val labels = emb.select($"vec_id", $"label")
      .as[(Long, Int)].collect().toMap
    val rows = out.select($"query_id", $"rank", $"neighbor_id", $"neg_label",
      $"cos_sim").as[(Long, Int, Long, Int, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (qid, _, nid, nl, _) =>
      assert(labels(nid) == nl)
      assert(labels(qid) != nl, s"same-label negative $nid for query $qid")
    }
    // the mined set IS the exact top-k of the label-excluded brute force:
    // per query, the worst mined score >= the best unmined different-label
    // score (checked against the unfiltered exact ranking)
    val all = Similarity.bruteForceTopK(q, emb, emb.count().toInt,
        exact = true)
      .select($"query_id", $"neighbor_id", $"cos_sim")
      .as[(Long, Long, Double)].collect()
    val mined = rows.groupBy(_._1)
    for ((qid, ms) <- mined) {
      val minedIds = ms.map(_._3).toSet
      val bestUnmined = all.filter { case (q2, n, _) =>
        q2 == qid && labels(n) != labels(qid) && !minedIds.contains(n) }
        .map(_._3).maxOption.getOrElse(Double.NegativeInfinity)
      val worstMined = ms.map(_._5).min
      assert(worstMined >= bestUnmined,
        s"query $qid missed a harder negative: $bestUnmined > $worstMined")
    }
  }

  test("LSH finds planted near-duplicates (recall >= 0.8)") {
    // random embeddings have no near neighbors (8-bit bucket collision
    // ~1% per table), so recall is measured on planted near-dups:
    // noisy copies with cosine ~0.97 against their source.
    val rng = new scala.util.Random(7)
    val base = emb.filter($"vec_id" < 20)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val noisy = base.map { case (id, v) =>
      (id + 100000L, v.map(x => x + 0.02f * rng.nextGaussian().toFloat))
    }
    val q = spark.createDataFrame(noisy.toSeq).toDF("vec_id", "embedding")
    val hits = Similarity.lshTopK(q, emb, 5, dim = 64, bits = 8, tables = 8)
      .filter($"neighbor_id" === $"query_id" - 100000L)
      .select($"query_id").distinct().count()
    val recall = hits.toDouble / base.length
    assert(recall >= 0.8, s"planted near-dup recall $recall")
  }

  test("MIPS-LSH recalls planted high-ip neighbors (recall >= 0.7)") {
    // On RANDOM embeddings the true MIPS winners are not angular
    // neighbors, so no LSH family can find them — same reasoning as the
    // planted-near-dup cosine specs above. MIPS structure is planted
    // instead: for each query, a 3x-scaled noisy copy (high norm AND
    // aligned — the shape real recommender item towers produce). The
    // exact gate must rank the plant first; the bucketed tier must
    // recover most plants, and must score every recovered pair with the
    // IDENTICAL integer ip as the exact gate.
    val rng = new scala.util.Random(11)
    val base = emb.filter($"vec_id" < 20)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val planted = base.map { case (id, v) =>
      (id + 200000L,
        v.map(x => 3.0f * x + 0.01f * rng.nextGaussian().toFloat))
    }
    val corpus = emb.select($"vec_id", $"embedding").unionByName(
      spark.createDataFrame(planted.toSeq).toDF("vec_id", "embedding"))
    val q = emb.filter($"vec_id" < 20)
    val exact = Similarity.mipsTopK(q, corpus, 5)
    assert(exact.filter($"rank" === 1 &&
        $"neighbor_id" === $"query_id" + 200000L).count() == base.length,
      "exact MIPS must rank each planted 3x copy first")
    val lsh = Similarity.mipsLshTopK(q, corpus, 5, dim = 64, bits = 6,
        tables = 12)
    val hits = lsh.filter($"neighbor_id" === $"query_id" + 200000L)
      .select($"query_id").distinct().count()
    val recall = hits.toDouble / base.length
    assert(recall >= 0.7, s"MIPS-LSH planted recall $recall")
    val ipParity = exact.select($"query_id", $"neighbor_id", $"ip".as("e"))
      .join(lsh, Seq("query_id", "neighbor_id"))
      .filter($"ip" =!= $"e").count()
    assert(ipParity == 0,
      "LSH tier must score recovered pairs identically to the exact gate")
  }

  test("maxSim: subVecs=1 reduces to exact MIPS; brute-force parity at 4") {
    val q = emb.filter($"vec_id" < 10)
    // degenerate reduction: one sub-vector means max over one doc token
    // of the full dot — exactly the MIPS ranking, score for score
    val mips = Similarity.mipsTopK(q, emb, 5)
      .select($"query_id", $"rank", $"neighbor_id", $"ip")
      .as[(Long, Long, Long, Long)].collect().toSet
    val ms1 = Similarity.maxSimTopK(q, emb, 5, subVecs = 1)
      .select($"query_id", $"rank", $"neighbor_id", $"maxsim")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(ms1 == mips)

    // brute-force reference at subVecs = 4 over a small corpus slice
    val slice = emb.filter($"vec_id" < 40)
    val vecs = slice.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
    def quant(v: Array[Float]): Array[Long] =
      v.map(x => math.round(x.toDouble * 10000))
    def msim(a: Array[Long], b: Array[Long], s: Int): Long = {
      val m = a.length / s
      (0 until s).map { t =>
        (0 until s).map { u =>
          (0 until m).map(i => a(t * m + i) * b(u * m + i)).sum
        }.max
      }.sum
    }
    val expect = vecs.filter(_._1 < 10).flatMap { case (qid, qv) =>
      vecs.filter(_._1 != qid)
        .map { case (nid, nv) => (nid, msim(quant(qv), quant(nv), 4)) }
        .sortBy { case (nid, sc) => (-sc, nid) }.take(5).zipWithIndex
        .map { case ((nid, sc), i) => (qid, i + 1L, nid, sc) }
    }.toSet
    val got = Similarity.maxSimTopK(emb.filter($"vec_id" < 10), slice, 5,
        subVecs = 4)
      .select($"query_id", $"rank", $"neighbor_id", $"maxsim")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expect)
  }

  test("IVF finds planted near-duplicates (recall >= 0.9)") {
    // The IVF guarantee that matters for dedup: a genuine near-neighbor
    // (cosine ~0.97) lands in one of the query's nprobe probed cells. The
    // fixture's labels cluster the space only weakly — the hard case for a
    // coarse quantizer — but a near-dup sits so close to its source that
    // both rank the same cells.
    val rng = new scala.util.Random(13)
    val base = emb.filter($"vec_id" < 20)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val noisy = base.map { case (id, v) =>
      (id + 100000L, v.map(x => x + 0.02f * rng.nextGaussian().toFloat))
    }
    val q = spark.createDataFrame(noisy.toSeq).toDF("vec_id", "embedding")
    val hits = Similarity.ivfTopK(q, emb, 5, nprobe = 3)
      .filter($"neighbor_id" === $"query_id" - 100000L)
      .select($"query_id").distinct().count()
    val recall = hits.toDouble / base.length
    assert(recall >= 0.9, s"IVF planted near-dup recall $recall")
  }

  test("PQ finds planted near-duplicates (recall >= 0.9)") {
    // ADC candidate cut + exact re-rank: a cosine-~0.97 near-dup's PQ
    // distance is far below the random-pair floor, so it must survive
    // the candMult*k cut and then win the exact re-rank.
    val rng = new scala.util.Random(29)
    val base = emb.filter($"vec_id" < 20)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val noisy = base.map { case (id, v) =>
      (id + 100000L, v.map(x => x + 0.02f * rng.nextGaussian().toFloat))
    }
    val q = spark.createDataFrame(noisy.toSeq).toDF("vec_id", "embedding")
    val hits = Similarity.pqTopK(q, emb, 5, dim = 64)
      .filter($"neighbor_id" === $"query_id" - 100000L)
      .select($"query_id").distinct().count()
    val recall = hits.toDouble / base.length
    assert(recall >= 0.9, s"PQ planted near-dup recall $recall")
  }

  test("OPQ finds planted near-duplicates (recall >= 0.9)") {
    // rotated PQ: the orthonormal eigen-rotation preserves cosines, so
    // the planted pair survives the candidate cut for the same reason
    // as plain PQ — with balanced per-subspace variance on top
    val rng = new scala.util.Random(31)
    val base = emb.filter($"vec_id" < 20)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val noisy = base.map { case (id, v) =>
      (id + 100000L, v.map(x => x + 0.02f * rng.nextGaussian().toFloat))
    }
    val q = spark.createDataFrame(noisy.toSeq).toDF("vec_id", "embedding")
    val hits = Similarity.opqTopK(q, emb, 5, dim = 64)
      .filter($"neighbor_id" === $"query_id" - 100000L)
      .select($"query_id").distinct().count()
    val recall = hits.toDouble / base.length
    assert(recall >= 0.9, s"OPQ planted near-dup recall $recall")
  }

  test("integer OPQ finds planted near-duplicates (recall >= 0.9) and " +
      "its rotation is energy-balanced") {
    // the exact-integer tier: 45-degree Givens pairs + snake-drafted
    // subspaces must keep the planted pair through the ADC cut just
    // like the float eigenbasis tier
    val rng = new scala.util.Random(47)
    val base = emb.filter($"vec_id" < 20)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val noisy = base.map { case (id, v) =>
      (id + 100000L, v.map(x => x + 0.02f * rng.nextGaussian().toFloat))
    }
    val q = spark.createDataFrame(noisy.toSeq).toDF("vec_id", "embedding")
    val hits = Similarity.opqIntTopK(q, emb, 5, dim = 64)
      .filter($"neighbor_id" === $"query_id" - 100000L)
      .select($"query_id").distinct().count()
    val recall = hits.toDouble / base.length
    assert(recall >= 0.9, s"integer-OPQ planted near-dup recall $recall")
  }

  test("integer PCA: orthogonal-iteration components are near-" +
      "orthogonal and the prefiltered ANN finds planted near-dups") {
    val comps = Similarity.pcaIntComponents(emb, 64, nComp = 4,
      iters = 30)
    assert(comps.length == 4)
    // fixed-point Gram-Schmidt: normalized cross-dots stay small
    for (i <- comps.indices; j <- 0 until i) {
      val a = comps(i); val b = comps(j)
      val dot = math.abs(a.indices.map(k => a(k).toDouble * b(k)).sum)
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      assert(dot / (na * nb) < 0.05,
        s"components $j,$i not orthogonal: ${dot / (na * nb)}")
    }
    val rng = new scala.util.Random(53)
    val base = emb.filter($"vec_id" < 20)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val noisy = base.map { case (id, v) =>
      (id + 100000L, v.map(x => x + 0.02f * rng.nextGaussian().toFloat))
    }
    val q = spark.createDataFrame(noisy.toSeq).toDF("vec_id", "embedding")
    val hits = Similarity.pcaIntTopK(q, emb, 5, dim = 64, nComp = 4,
        iters = 30)
      .filter($"neighbor_id" === $"query_id" - 100000L)
      .select($"query_id").distinct().count()
    assert(hits.toDouble / base.length >= 0.7,
      s"integer-PCA planted recall ${hits.toDouble / base.length}")
  }

  test("eigenvalue allocation balances and is a valid permutation") {
    val vals = Array(100.0, 50.0, 25.0, 12.0, 6.0, 3.0, 2.0, 1.0)
    val perm = Similarity.eigenvalueAllocation(vals, m = 2, cap = 4)
    assert(perm.sorted == (0 until 8))
    val (b0, b1) = perm.splitAt(4)
    def logp(b: Seq[Int]) = b.map(i => math.log(vals(i))).sum
    // greedy balance: the log-product gap is far below the sorted-split
    // gap (which would put 100*50*25*12 against 6*3*2*1)
    assert(math.abs(logp(b0) - logp(b1)) < math.log(16.0))
  }

  test("IVF-PQ finds planted near-duplicates (recall >= 0.9)") {
    // the composite must keep BOTH filters honest: the near-dup's cell
    // must be probed (IVF recall) and its ADC distance must survive the
    // candidate cut (PQ recall)
    val rng = new scala.util.Random(41)
    val base = emb.filter($"vec_id" < 20)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val noisy = base.map { case (id, v) =>
      (id + 100000L, v.map(x => x + 0.02f * rng.nextGaussian().toFloat))
    }
    val q = spark.createDataFrame(noisy.toSeq).toDF("vec_id", "embedding")
    val hits = Similarity.ivfPqTopK(q, emb, 5, dim = 64, nprobe = 3)
      .filter($"neighbor_id" === $"query_id" - 100000L)
      .select($"query_id").distinct().count()
    val recall = hits.toDouble / base.length
    assert(recall >= 0.9, s"IVF-PQ planted near-dup recall $recall")
  }

  test("PQ survives codebooks shorter than kCodes (corpus < kCodes)") {
    // 8 vectors with kCodes=16: every Lloyd's book holds < kCodes
    // centroids, so the flattened ADC LUT's segments are SHORT — a fixed
    // s*kCodes stride would read past the LUT (ANSI element_at error).
    // With candMult*k >= corpus the exact re-rank makes results exact.
    val tiny = emb.filter($"vec_id" < 8)
      .select($"vec_id", $"embedding")
    val q = tiny.filter($"vec_id" < 2)
    val got = Similarity.pqTopK(q, tiny, 3, dim = 64)
      .select($"query_id", $"rank", $"neighbor_id")
    val want = Similarity.bruteForceTopK(q, tiny, 3)
      .select($"query_id", $"rank", $"neighbor_id")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "short-book PQ must match brute force on a tiny corpus")
  }

  test("fixed-point quantization propagates nulls instead of saturating") {
    val df = Seq((1L, Seq[java.lang.Double](0.5, null, -0.25)))
      .toDF("id", "v")
    val q = df.select(Similarity.quantizeFixedPoint($"v").as("q"))
      .as[Seq[java.lang.Long]].head()
    assert(q == Seq(32L, null, -16L), s"got $q")
  }

  test("fixed-point quantization matches scalar floor/clamp semantics") {
    val rows = emb.filter($"vec_id" < 10)
      .select($"embedding",
        Similarity.quantizeFixedPoint($"embedding", fracBits = 6).as("q"))
      .as[(Array[Float], Array[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (v, q) =>
      assert(v.length == q.length)
      v.zip(q).foreach { case (x, qi) =>
        val want = math.max(-128L,
          math.min(127L, math.floor(x.toDouble * 64).toLong))
        assert(qi == want, s"quantize($x) = $qi, want $want")
      }
    }
  }

  test("k-means codebook recovers planted clusters; IVF over it recalls") {
    // planted mixture: 4 well-separated centers +- small noise — Lloyd's
    // must place one centroid near each center
    val rng = new scala.util.Random(17)
    val centers = Array.tabulate(4, 64) { (c, i) =>
      if (i % 4 == c) 1.0f else 0.0f }
    val pts = (0 until 200).map { n =>
      val c = n % 4
      (n.toLong, centers(c).map(x => x + 0.05f * rng.nextGaussian().toFloat))
    }
    val df = spark.createDataFrame(pts).toDF("vec_id", "embedding")
    val cb = Similarity.kMeansCodebook(df, k = 4, maxIter = 10)
      .as[(Int, Seq[Double])].collect()
    assert(cb.length == 4)
    // every true center has a codebook centroid within noise distance
    centers.foreach { tc =>
      val best = cb.map { case (_, cv) =>
        math.sqrt(cv.zip(tc).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.min
      assert(best < 0.1, s"no centroid near a planted center (d=$best)")
    }
    // the IVF plan over the k-means codebook still finds planted near-dups
    val base = emb.filter($"vec_id" < 20)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val noisy = base.map { case (id, v) =>
      (id + 100000L, v.map(x => x + 0.02f * rng.nextGaussian().toFloat))
    }
    val q = spark.createDataFrame(noisy.toSeq).toDF("vec_id", "embedding")
    val codebook = Similarity.kMeansCodebook(emb, k = 8)
    val hits = Similarity.ivfTopK(q, emb, 5, nprobe = 3,
        codebook = Some(codebook))
      .filter($"neighbor_id" === $"query_id" - 100000L)
      .select($"query_id").distinct().count()
    val recall = hits.toDouble / base.length
    assert(recall >= 0.9, s"IVF-kmeans planted near-dup recall $recall")
  }

  test("LSH near-dup pairs are a subset of exact pairs, good recall on dups") {
    val rng = new scala.util.Random(11)
    val base = emb.filter($"vec_id" < 20)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val noisy = base.map { case (id, v) =>
      (id + 100000L, v.map(x => x + 0.02f * rng.nextGaussian().toFloat))
    }
    val corpus = emb.select($"vec_id", $"embedding")
      .union(spark.createDataFrame(noisy.toSeq).toDF("vec_id", "embedding"))
    val exact = Similarity.nearDupPairs(corpus, tau = 0.9)
      .select($"id_a", $"id_b")
    val lsh = Similarity.nearDupPairsLsh(corpus, tau = 0.9, dim = 64,
      bits = 8, tables = 8).select($"id_a", $"id_b")
    assert(lsh.exceptAll(exact).isEmpty, "LSH pairs must pass the exact check")
    val recall = lsh.intersect(exact).count().toDouble / exact.count()
    assert(recall >= 0.8, s"near-dup LSH recall $recall")
  }

  test("integer-SRP near-dup pairs: subset of exact, good recall on " +
      "planted dups, deterministic buckets") {
    val rng = new scala.util.Random(13)
    val base = emb.filter($"vec_id" < 20)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val noisy = base.map { case (id, v) =>
      (id + 100000L, v.map(x => x + 0.02f * rng.nextGaussian().toFloat))
    }
    val corpus = emb.select($"vec_id", $"embedding")
      .union(spark.createDataFrame(noisy.toSeq).toDF("vec_id", "embedding"))
    val exact = Similarity.nearDupPairs(corpus, tau = 0.9)
      .select($"id_a", $"id_b")
    val lsh = Similarity.nearDupPairsLshInt(corpus, tau = 0.9, dim = 64,
      bits = 8, tables = 8).select($"id_a", $"id_b")
    assert(lsh.exceptAll(exact).isEmpty,
      "int-SRP pairs must pass the exact check")
    val recall = lsh.intersect(exact).count().toDouble / exact.count()
    assert(recall >= 0.8, s"int-SRP near-dup recall $recall")
    // repartitioning can't move a bucket: the planes are pure integer
    // arithmetic over the quantized vector (the oracle-replay contract)
    val again = Similarity.nearDupPairsLshInt(corpus.repartition(7),
      tau = 0.9, dim = 64, bits = 8, tables = 8).select($"id_a", $"id_b")
    assert(again.exceptAll(lsh).isEmpty && lsh.exceptAll(again).isEmpty)
  }

  test("integer-SRP top-k: every hit verified against the exact ranking " +
      "score, ±1 weights balanced") {
    val q = emb.filter($"vec_id" < 5)
    val hits = Similarity.lshTopKInt(q, emb, 5, dim = 64)
      .select($"query_id", $"neighbor_id", $"cos_sim")
      .as[(Long, Long, Double)].collect()
    assert(hits.nonEmpty)
    val exact = Similarity.bruteForceTopK(q, emb, 1000000, exact = true)
      .select($"query_id", $"neighbor_id", $"cos_sim")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    hits.foreach { case (qid, nid, cs) =>
      assert(exact((qid, nid)) == cs, s"score drift for ($qid,$nid)")
    }
    // weight family sanity: roughly half the weights are +1 in every
    // plane (a constant-sign plane would bucket everything together)
    (0 until 8).foreach { t =>
      (0 until 8).foreach { b =>
        val pos = (0 until 64).count(i =>
          Similarity.srpWeight(t, b, i, 8, 64) == 1L)
        assert(pos >= 16 && pos <= 48, s"plane ($t,$b) degenerate: $pos")
      }
    }
    // and planes are pairwise near-orthogonal (the round-7 md5-parity
    // fix: the old Weyl-parity rows repeated (++--) and some were
    // IDENTICAL — |dot| averaged 30/64, so multi-plane constructions
    // had far less effective dimension than designed). For i.i.d. ±1
    // rows |dot| ~ sqrt(64) = 8; bound loosely at 28.
    val rows = for (t <- 0 until 8; b <- 0 until 8)
      yield (0 until 64).map(i => Similarity.srpWeight(t, b, i, 8, 64))
    for (j <- rows.indices; k <- j + 1 until rows.length) {
      val dot = rows(j).zip(rows(k)).map { case (a, c) => a * c }.sum
      assert(math.abs(dot) <= 28, s"planes $j,$k correlated: dot=$dot")
    }
  }

  test("integer-MIPS LSH: every hit's ip equals the exact MIPS gate's, " +
      "decent recall, partitioning-invariant buckets") {
    val q = emb.filter($"vec_id" < 10)
    val hits = Similarity.mipsLshTopKInt(q, emb, 5, dim = 64, tables = 8)
      .select($"query_id", $"neighbor_id", $"ip")
      .as[(Long, Long, Long)].collect()
    assert(hits.nonEmpty)
    val exact = Similarity.mipsTopK(q, emb, 1000000)
      .select($"query_id", $"neighbor_id", $"ip")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    hits.foreach { case (qid, nid, ip) =>
      assert(exact((qid, nid)) == ip, s"ip drift for ($qid,$nid)")
    }
    // planted recall (the gaussian tier's own protocol): a 3x-scaled
    // copy is each query's unambiguous MIPS winner; the ±1 planes at
    // the same bits/tables must retrieve most of them
    val base = emb.filter($"vec_id" < 10)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val copies = base.map { case (id, v) =>
      (id + 200000L, v.map(_ * 3.0f))
    }
    val corpus = emb.select($"vec_id", $"embedding")
      .union(spark.createDataFrame(copies.toSeq).toDF("vec_id", "embedding"))
    val planted = Similarity.mipsLshTopKInt(q, corpus, 5, dim = 64,
        bits = 6, tables = 12)
      .filter($"neighbor_id" === $"query_id" + 200000L)
      .select($"query_id").distinct().count()
    val recall = planted.toDouble / base.length
    assert(recall >= 0.7, s"int-MIPS-LSH planted recall $recall")
    val again = Similarity.mipsLshTopKInt(
        q.repartition(5), emb.repartition(7), 5, dim = 64, tables = 8)
      .select($"query_id", $"neighbor_id", $"ip")
      .as[(Long, Long, Long)].collect()
    assert(again.toSet == hits.toSet, "buckets must be data-position-free")
  }

  test("all-pairs nearDupPairs refuses inputs beyond its size guard") {
    val e = intercept[IllegalArgumentException] {
      Similarity.nearDupPairs(emb, tau = 0.4, maxRows = 10).count()
    }
    assert(e.getMessage.contains("nearDupPairsLsh"))
  }

  test("label-centroid cosine: one score per vector, centroid-true") {
    val out = Similarity.labelCentroidCosine(emb).cache()
    assert(out.count() == emb.count())
    // scores are genuine cosines in [-1, 1]...
    assert(out.filter($"cos_centroid" < -1.0 || $"cos_centroid" > 1.0).isEmpty)
    // ...and positive on average: a vector correlates with a mean it is
    // part of, so a real centroid (not an arbitrary vector) scores > 0
    val own = out.agg(avg($"cos_centroid")).as[Double].head()
    assert(own > 0.0, s"own-label centroid cosine avg $own should be > 0")
    out.unpersist()
  }

  test("PCA: planted dominant direction recovered, projection centered") {
    // synthetic 8-dim data: strong variance along a known direction u
    // (t in -50..50 steps), small deterministic wiggle elsewhere
    val dim = 8
    val u = Array(0.5f, 0.5f, 0.5f, 0.5f, 0f, 0f, 0f, 0f)
    val rows = (-50 to 50).map { t =>
      val base = u.map(_ * t)
      val wiggle = Array.tabulate(dim)(i =>
        0.01f * (((t * 7 + i * 13) % 5) - 2))
      (t.toLong + 50, base.zip(wiggle).map { case (a, b) => a + b })
    }
    val df = rows.toDF("id", "v")
    val (vals, comps) = Similarity.pcaComponents(df, $"v", dim, k = 3)
    // eigenvalues descending, dominant one far above the wiggle
    assert(vals(0) > vals(1) && vals(1) >= vals(2))
    assert(vals(0) > 100 * math.max(vals(1), 1e-12))
    // first component aligns with the planted direction (unit u = 0.5s)
    val cos = comps(0).zip(u.map(_.toDouble)).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.999, s"alignment $cos")
    // components orthonormal
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(comps(0), comps(0)) - 1.0) < 1e-9)
    assert(math.abs(dot(comps(0), comps(1))) < 1e-9)
    // projection: centered (mean ~ 0), first coord variance ~ val(0)
    val proj = Similarity.pcaProject(df, $"v", dim, k = 2)
      .select(element_at($"pca", 1)).as[Double].collect()
    val m = proj.sum / proj.length
    assert(math.abs(m) < 1e-6, s"projection mean $m")
    val varr = proj.map(x => (x - m) * (x - m)).sum / proj.length
    assert(math.abs(varr - vals(0)) / vals(0) < 1e-6,
      s"projected variance $varr vs eigenvalue ${vals(0)}")
  }

  test("PCA coarse filter finds planted near-duplicates (recall >= 0.9)") {
    // same planted-near-dup protocol as LSH/IVF/PQ: a cosine-~0.97 copy
    // must survive the 8-dim coarse cut and win the exact re-rank
    val rng = new scala.util.Random(41)
    val base = emb.filter($"vec_id" < 20)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val noisy = base.map { case (id, v) =>
      (id + 100000L, v.map(x => x + 0.02f * rng.nextGaussian().toFloat))
    }
    val q = spark.createDataFrame(noisy.toSeq).toDF("vec_id", "embedding")
    val hits = Similarity.pcaTopK(q, emb, 5, dim = 64, pcaK = 8,
        shortlist = 32)
      .filter($"neighbor_id" === $"query_id" - 100000L)
      .select($"query_id").distinct().count()
    val recall = hits.toDouble / base.length
    assert(recall >= 0.9, s"PCA planted near-dup recall $recall")
  }

  test("LSH candidate set is much smaller than all-pairs") {
    val q = emb.filter($"vec_id" < 20)
    val nCand = Similarity.lshTopK(q, emb, 1000000, dim = 64,
      bits = 8, tables = 4).count()
    val allPairs = 20L * (emb.count() - 1)
    assert(nCand < allPairs / 2, s"$nCand candidates vs $allPairs pairs")
  }

  test("semanticDedup drops planted semantic copies, keeps the originals") {
    val rng = new scala.util.Random(11)
    val base = emb.filter($"vec_id" < 40)
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Array[Float], Int)].collect()
    // near-copies at cosine ~0.999: same direction, tiny noise, higher ids
    val noisy = base.take(15).map { case (id, v, l) =>
      (id + 100000L, v.map(x => x + 0.002f * rng.nextGaussian().toFloat), l)
    }
    val corpus = spark.createDataFrame((base ++ noisy).toSeq)
      .toDF("vec_id", "embedding", "label")
    val kept = Similarity.semanticDedup(corpus, k = 4, tau = 0.99)
      .select($"vec_id").as[Long].collect().toSet
    // every original survives (it is the smallest id of its group)
    base.foreach { case (id, _, _) => assert(kept.contains(id), s"lost $id") }
    // every planted copy is removed (identical direction => same cluster)
    noisy.foreach { case (id, _, _) =>
      assert(!kept.contains(id), s"copy $id survived") }
  }

  test("semanticDedup with tau above any real cosine keeps everything") {
    val corpus = emb.filter($"vec_id" < 60)
    assert(Similarity.semanticDedup(corpus, k = 3, tau = 0.9999).count() ==
      corpus.count())
  }

  test("power-iteration PC1: projections align with the float " +
      "eigen direction and are bit-deterministic") {
    val proj = Similarity.powerIterationPc1(emb, 64, iters = 100)
      .orderBy($"vec_id").as[(Long, Long)].collect()
    // float reference: 2000 double power iterations on the same Gramian
    val vecs = emb.orderBy($"vec_id").select($"embedding")
      .as[Array[Float]].collect()
      .map(_.map(x => math.round(x.toDouble * 1e4).toDouble))
    val dim = 64
    val c = Array.ofDim[Double](dim, dim)
    vecs.foreach { q =>
      var j = 0
      while (j < dim) {
        var k = 0
        while (k < dim) { c(j)(k) += q(j) * q(k); k += 1 }
        j += 1
      }
    }
    var v = Array.fill(dim)(1.0)
    (0 until 2000).foreach { _ =>
      val w = Array.tabulate(dim)(j =>
        (0 until dim).map(k => c(j)(k) * v(k)).sum)
      val n = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / n)
    }
    val refProj = vecs.map(q => (0 until dim).map(i => q(i) * v(i)).sum)
    // Pearson correlation up to sign (shift normalization scales the
    // integer vector arbitrarily; direction is what must agree)
    val a = proj.map(_._2.toDouble); val b = refProj
    def corr(x: Array[Double], y: Array[Double]): Double = {
      val mx = x.sum / x.length; val my = y.sum / y.length
      val cov = x.zip(y).map { case (p, q) => (p - mx) * (q - my) }.sum
      val sx = math.sqrt(x.map(p => (p - mx) * (p - mx)).sum)
      val sy = math.sqrt(y.map(q => (q - my) * (q - my)).sum)
      cov / (sx * sy)
    }
    assert(math.abs(corr(a, b)) > 0.99,
      s"integer PC1 misaligned: corr=${corr(a, b)}")
    // bit-determinism: a second run reproduces every projection
    val proj2 = Similarity.powerIterationPc1(emb, 64, iters = 100)
      .orderBy($"vec_id").as[(Long, Long)].collect()
    assert(proj.sameElements(proj2))
  }

  test("integer Lloyd's: recovers planted clusters, bit-deterministic, " +
      "truncating-division centroids; int IVF/PQ find the exact top-1") {
    // planted: 3 tight clusters around orthogonal-ish directions
    val rng = new scala.util.Random(5)
    val protos = Array.tabulate(3)(c =>
      Array.tabulate(64)(i => if (i % 3 == c) 0.8f else 0.01f))
    val rows = (0 until 90).map { n =>
      val c = n % 3
      (n.toLong, protos(c).map(x => x + 0.02f * rng.nextGaussian().toFloat))
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val cents = Similarity.kMeansIntCodebook(df, k = 3, iters = 6, dim = 64)
    val assign = Similarity.kMeansIntAssign(df, cents)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    // every planted cluster lands in ONE cell
    (0 until 3).foreach { c =>
      val cells = (0 until 90).filter(_ % 3 == c).map(n => assign(n.toLong))
      assert(cells.distinct.size == 1, s"cluster $c split across $cells")
    }
    // determinism
    val cents2 = Similarity.kMeansIntCodebook(df, 3, 6, 64)
    assert(cents.map(_.toSeq).toSeq == cents2.map(_.toSeq).toSeq)
    // centroids sit on the truncating-division grid of their members
    assert(cents.flatten.forall(v => math.abs(v) <= 10000))

    // the int IVF and PQ tiers retrieve each noisy copy's source at
    // rank 1 on the fixture corpus (cluster structure >> noise)
    val emb64 = emb.filter($"vec_id" < 40)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val queries = emb64.take(10).map { case (id, v) =>
      (id + 70000L, v.map(x => x + 0.002f * rng.nextGaussian().toFloat))
    }
    val qdf = spark.createDataFrame(queries.toSeq)
      .toDF("vec_id", "embedding")
    val ivf1 = Similarity.ivfIntTopK(qdf, emb, k = 1, dim = 64)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    ivf1.foreach { case (q, n) => assert(n == q - 70000L, s"ivf $q -> $n") }
    val pq1 = Similarity.pqIntTopK(qdf, emb, k = 1, dim = 64)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    pq1.foreach { case (q, n) => assert(n == q - 70000L, s"pq $q -> $n") }
  }

  test("JL projection: planted near-copies retrieved at rank 1 (the " +
      "distance-class guarantee); projection matches brute-force weights") {
    val rng = new scala.util.Random(7)
    val base = emb.filter($"vec_id" < 20)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    // queries = noisy copies of 20 corpus vectors at cosine ~0.999 —
    // separated from the ~0-cosine bulk by far more than the outDim-16
    // noise, so JL must rank each query's source first
    val queries = base.map { case (id, v) =>
      (id + 50000L, v.map(x => x + 0.002f * rng.nextGaussian().toFloat))
    }
    val corpus = emb.select($"vec_id", $"embedding")
    val qdf = spark.createDataFrame(queries.toSeq)
      .toDF("vec_id", "embedding")
    val top1 = Similarity.jlTopK(qdf, corpus, k = 1, dim = 64, outDim = 16)
      .select($"query_id", $"neighbor_id", $"cos_full")
      .as[(Long, Long, Double)].collect()
    top1.foreach { case (q, n, cf) =>
      assert(n == q - 50000L, s"query $q retrieved $n, not its source")
      assert(cf > 0.99, s"full-dim rescore $cf should be ~1")
    }
    // jlProjectInt coordinates equal the explicit weight dot products
    val v = base.head._2
    val qv = v.map(x => math.round(x.toDouble * 1e4))
    val expect = (0 until 16).map { j =>
      (0 until 64).map(i => qv(i) * Similarity.srpWeight(0, j, i, 16, 64)).sum
    }
    val got = Seq((1L, v)).toDF("vec_id", "embedding")
      .select(Similarity.jlProjectInt(
        Similarity.quantizeAt($"embedding", 1e4), 64, 16))
      .head().getSeq[Long](0)
    assert(got == expect)
  }

  test("semanticDedupLshInt drops planted copies (same SRP cell by " +
      "direction), keeps originals; high tau keeps everything") {
    val rng = new scala.util.Random(11)
    val base = emb.filter($"vec_id" < 40)
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Array[Float], Int)].collect()
    val noisy = base.take(15).map { case (id, v, l) =>
      (id + 100000L, v.map(x => x + 0.002f * rng.nextGaussian().toFloat), l)
    }
    val corpus = spark.createDataFrame((base ++ noisy).toSeq)
      .toDF("vec_id", "embedding", "label")
    val kept = Similarity.semanticDedupLshInt(corpus, tau = 0.99, dim = 64)
      .select($"vec_id").as[Long].collect().toSet
    base.foreach { case (id, _, _) => assert(kept.contains(id), s"lost $id") }
    // a ~0.999-cosine copy signs every SRP plane identically UNLESS a
    // projection sits within noise of zero — the cluster-boundary miss
    // SemDeDup trades for blocking (on this seed, 1 of 15 copies flips
    // a near-zero plane). Most copies must drop; none may drop its
    // original (asserted above).
    val survivedCopies = noisy.count { case (id, _, _) => kept.contains(id) }
    assert(survivedCopies <= 2,
      s"$survivedCopies of ${noisy.length} planted copies survived")
    assert(Similarity.semanticDedupLshInt(emb.filter($"vec_id" < 60),
      tau = 0.9999, dim = 64).count() == 60)
  }

  test("semantic decontamination drops planted paraphrases, keeps rest") {
    import graft.operators.Decontaminate
    val evalSet = emb.filter($"vec_id" < 5)
    // plant: corpus row 9001 = eval row 0's embedding scaled by 2
    // (same direction -> cosine 1), 9002 with sign flipped (cosine -1)
    val planted = evalSet.filter($"vec_id" === 0)
      .select(lit(9001L).as("vec_id"),
        transform($"embedding", x => x * 2.0f).as("embedding"),
        lit(7).as("label"))
      .unionByName(evalSet.filter($"vec_id" === 0)
        .select(lit(9002L).as("vec_id"),
          transform($"embedding", x => -x).as("embedding"),
          lit(7).as("label")))
    val corpus = emb.filter($"vec_id" >= 5 && $"vec_id" < 60)
      .unionByName(planted)
    val kept = Decontaminate.semantic(corpus, evalSet, tau = 0.95)
      .select($"vec_id").as[Long].collect().toSet
    assert(!kept.contains(9001L), "scaled copy of an eval vector survived")
    assert(kept.contains(9002L), "opposite-direction vector wrongly dropped")
    // nothing outside the planted copy is near the eval set at 0.95
    assert(kept.size == corpus.count() - 1)
  }

  test("knnClassify: planted clusters vote their own label; majority " +
      "tie breaks to the smaller label") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // two tight clusters along orthogonal axes + a query per cluster
    def vec(axis: Int, eps: Float): Array[Float] = {
      val a = Array.fill(4)(0.0f); a(axis) = 1.0f; a((axis + 1) % 4) = eps; a
    }
    val rows = (0 until 6).map(i => Row(10L + i, vec(0, 0.01f * i).toSeq, 3)) ++
      (0 until 6).map(i => Row(20L + i, vec(2, 0.01f * i).toSeq, 8)) ++
      Seq(Row(0L, vec(0, 0.001f).toSeq, 99), Row(1L, vec(2, 0.002f).toSeq, 99))
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq), schema)
    val out = Similarity.knnClassify(df.filter($"vec_id" < 2), df, 5)
      .select("query_id", "true_label", "pred_label", "votes", "correct")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(0L) == ((99L, 3L, 5L, 0L))) // axis-0 cluster wins 5/5
    assert(out(1L) == ((99L, 8L, 5L, 0L)))
    // tie case: k=4 over two 2-vote labels -> smaller label wins.
    // query on the diagonal, two corpus points per axis equidistant
    val diag = Array(1.0f, 0.0f, 1.0f, 0.0f)
    val tieRows = Seq(
      Row(0L, diag.toSeq, 1),
      Row(10L, vec(0, 0.0f).toSeq, 5), Row(11L, vec(0, 0.0f).toSeq, 5),
      Row(20L, vec(2, 0.0f).toSeq, 2), Row(21L, vec(2, 0.0f).toSeq, 2))
    val tdf = spark.createDataFrame(
      spark.sparkContext.parallelize(tieRows), schema)
    val tie = Similarity.knnClassify(tdf.filter($"vec_id" === 0), tdf, 4)
      .select("pred_label", "votes").as[(Long, Long)].head()
    assert(tie == ((2L, 2L)))
  }
}
