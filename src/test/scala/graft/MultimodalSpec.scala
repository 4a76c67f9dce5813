package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary column contract, partition-batched decode
  * (stub codec), frame sampling, and the feature-extraction seam into the
  * similarity operators. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media =
    Multimodal.withMediaColumn(Tables.documents(spark, Sf0)).cache()

  test("media column carries bytes + typed metadata") {
    val r = media.select($"media", $"media_meta.n_bytes",
      $"media_meta.content_hash", $"text").head
    assert(r.getAs[Array[Byte]](0).length == r.getLong(1))
    assert(r.getLong(1) == r.getString(3).getBytes("UTF-8").length)
    assert(r.getString(2).length == 32) // md5 hex
    // schema contract
    assert(media.schema("media").dataType.typeName == "binary")
  }

  test("partition-batched decode yields deterministic frames") {
    val frames = Multimodal.decodeFrames(spark, media)
    assert(frames.count() == media.count() * 2)
    val again = Multimodal.decodeFrames(spark, media)
    assert(frames.except(again).isEmpty) // deterministic in payload bytes
    val one = frames.filter($"doc_id" === 0).collect().sortBy(_.frame_idx)
    assert(one.map(_.frame_idx).toSeq == Seq(0, 1))
    assert(one(0).width == 4 && one(0).height == 4)
  }

  test("frame sampling keeps every nth frame") {
    val frames = Multimodal.decodeFrames(spark, media)
    val sampled = Multimodal.sampleFrames(frames, 2)
    assert(sampled.count() == media.count()) // frame 0 of 2 per doc
    assert(sampled.filter($"frame_idx" =!= 0).count() == 0)
  }

  test("resize keeps identity lineage; duplicate media dedups end-to-end") {
    val frames = Multimodal.decodeFrames(spark, media.limit(20))
    val resized = Multimodal.resizeFrames(frames, 2, 2)
    assert(resized.count() == frames.count())
    assert(resized.filter(f => f.width != 2 || f.height != 2).isEmpty)
    // identical inputs stay identical through resize (dedup invariant)
    val r2 = Multimodal.resizeFrames(frames, 2, 2)
    assert(resized.except(r2).isEmpty)
    intercept[IllegalArgumentException](
      Multimodal.resizeFrames(frames, 0, 2))

    // end-to-end multimodal dedup: a planted duplicate payload flows
    // decode -> resize -> features -> LSH and surfaces as a cosine-1 pair
    val dup = media.limit(5)
      .select(($"doc_id" + 100000L).as("doc_id"), $"media")
    val corpus = media.select($"doc_id", $"media").unionByName(dup)
    val feats = graft.operators.Multimodal.frameFeatures(spark,
        Multimodal.resizeFrames(
          Multimodal.decodeFrames(spark, corpus), 2, 2), dim = 8)
      .filter($"frame_idx" === 0)
      .select($"doc_id".as("vec_id"), $"embedding")
    val pairs = graft.operators.Similarity
      .nearDupPairsLsh(feats, tau = 0.999, dim = 8, bits = 4, tables = 8)
      .filter($"id_b" === $"id_a" + 100000L)
    assert(pairs.count() == 5, "every planted duplicate pair surfaces")
  }

  test("audioWindows: hand-computed bounds, hop overlap, " +
      "short-payload edge") {
    // payloads of 300 / 128 / 63 bytes -> 150 / 64 / 31 samples
    val df = Seq(
      (1L, "x" * 300), (2L, "y" * 128), (3L, "z" * 63))
      .toDF("doc_id", "text")
    val out = Multimodal.audioWindows(
        Multimodal.withMediaColumn(df), windowSamples = 64,
        hopSamples = 25, sampleRate = 16000)
      .select($"doc_id", $"win_idx", $"start_sample", $"end_sample",
        $"start_ms")
      .as[(Long, Long, Long, Long, Long)].collect().sorted
    // doc 1: 150 samples -> (150-64)/25+1 = 4 windows at 0,25,50,75
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._3).toSeq == Seq(0L, 25L, 50L, 75L))
    assert(d1.forall(w => w._4 == w._3 + 64))
    assert(d1.head._5 == 0L && d1(1)._5 == 25L * 1000 / 16000)
    // doc 2: exactly one full window; doc 3: one sample short -> none
    assert(out.count(_._1 == 2L) == 1)
    assert(!out.exists(_._1 == 3L))
  }

  test("frame features keep the array<float> similarity contract") {
    val feats = Multimodal.frameFeatures(spark,
      Multimodal.decodeFrames(spark, media.limit(10)), dim = 8)
    assert(feats.schema("embedding").dataType.simpleString == "array<float>")
    assert(feats.count() == 20)
    // deterministic: same stub hash -> same features
    val f2 = Multimodal.frameFeatures(spark,
      Multimodal.decodeFrames(spark, media.limit(10)), dim = 8)
    assert(feats.except(f2).isEmpty)
  }

  test("perceptualHash: non-negative 63-bit, equal payloads collide") {
    val df = Seq((1L, "same"), (2L, "same"), (3L, "other"))
      .toDF("doc_id", "text")
    val ph = Multimodal.perceptualHash(
        Multimodal.withMediaColumn(df))
      .select($"doc_id", $"phash").as[(Long, Long)].collect().toMap
    assert(ph.values.forall(_ >= 0L))
    assert(ph(1L) == ph(2L) && ph(1L) != ph(3L))
  }

  test("hammingPairs64 blocking equals brute force on random codes") {
    // random 63-bit codes + planted near-pairs at distances 0..9 around
    // maxDist=8: the banded plan must reproduce exact all-pairs
    val rng = new scala.util.Random(7)
    val base = (0 until 120).map(i =>
      (i.toLong, rng.nextLong() & Long.MaxValue))
    val planted = (0 until 10).map { d =>
      val (id, code) = base(d * 3)
      // flip exactly d distinct bit positions
      val flipped = (0 until d).foldLeft(code)((c, b) => c ^ (1L << (b * 5)))
      (1000L + d, flipped)
    }
    val all = base ++ planted
    val df = all.toDF("doc_id", "sh")
    val got = graft.operators.Dedup.hammingPairs64(df, maxDist = 8)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val want = (for {
      (ia, ca) <- all; (ib, cb) <- all
      if ia < ib && java.lang.Long.bitCount(ca ^ cb) <= 8
    } yield (ia, ib)).toSet
    assert(got == want)
    // the 9 planted pairs at distance 0..8 are all present
    assert(want.count(_._2 >= 1000L) >= 9)
  }

  test("sceneCuts: boundary-only detection, jitter tolerated, " +
      "single-frame assets silent") {
    // asset 1: frames 0-2 near 0x0F0F..., frames 3-5 near 0xFF00...
    // (in-shot jitter 1 bit); asset 2: one frame only
    val b1 = 0x0F0F0F0FL; val b2 = 0x7F00FF00FF00L
    val frames = Seq(
      (1L, 0, b1), (1L, 1, b1 ^ 2L), (1L, 2, b1 ^ 4L),
      (1L, 3, b2), (1L, 4, b2 ^ 1L), (1L, 5, b2 ^ 8L),
      (2L, 0, b1)).toDF("a", "i", "c")
    val cuts = Multimodal.sceneCuts(frames, $"a", $"i", $"c", tau = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3))).toSeq
    assert(cuts.map(c => (c._1, c._2, c._3)) == Seq((1L, 2, 3)))
    assert(cuts.head._4 ==
      java.lang.Long.bitCount((b1 ^ 4L) ^ b2).toLong)
  }
}
