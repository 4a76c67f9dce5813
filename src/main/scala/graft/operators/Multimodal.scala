package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: media as opaque `binary` columns with typed
  * metadata structs, processed by per-partition batch transforms.
  *
  * The Spark-side plumbing is real — schema contract, partition-wise
  * batched execution (the Scala analogue of arrow-batched UDFs), metadata
  * extraction, frame sampling shapes. The codec itself is STUBBED with a
  * deterministic fake (`fakeDecode`): media libraries are not on this
  * classpath, and the engine seam is the transform contract, not the
  * codec. Swap `decodeFn` for a real implementation (JNI/javacv) without
  * touching any plan shape.
  */
object Multimodal {

  final case class MediaMeta(media_type: String, n_bytes: Long,
      content_hash: String)
  final case class DecodedFrame(doc_id: Long, frame_idx: Int,
      width: Int, height: Int, pixels_hash: Long)

  /** Attach a media payload column (here fabricated from text — the
    * fixtures carry no binary columns) + typed metadata struct. At scale
    * the binary bytes stay columnar in parquet and prune away unless
    * selected. */
  def withMediaColumn(df: DataFrame, payload: String = "text"): DataFrame =
    df.withColumn("media", col(payload).cast("binary"))
      .withColumn("media_meta", struct(
        lit("image/fake").as("media_type"),
        octet_length(col("media")).cast("long").as("n_bytes"),
        md5(col("media")).as("content_hash")))

  /** STUB decode: deterministic pseudo-decode of a binary payload into
    * fixed-shape "frames" (here 2 frames of 4x4) — stands in for an image/
    * video codec. Deterministic in the payload bytes only. */
  def fakeDecode(docId: Long, bytes: Array[Byte]): Seq[DecodedFrame] = {
    val h = java.util.Arrays.hashCode(bytes).toLong
    (0 until 2).map(i => DecodedFrame(docId, i, 4, 4, h * 31 + i))
  }

  /** Partition-batched decode — the mapInPandas/arrow-batch shape in
    * Scala: one decoder instantiation per partition, rows streamed
    * through it, output exploded to frame granularity. `decodeFn` is the
    * pluggable codec (defaults to the stub). */
  def decodeFrames(spark: SparkSession, df: DataFrame,
      decodeFn: (Long, Array[Byte]) => Seq[DecodedFrame] = fakeDecode)
      : Dataset[DecodedFrame] = {
    import spark.implicits._
    df.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder lifecycle (open once, stream rows)
        it.flatMap { case (id, bytes) => decodeFn(id, bytes) }
      }
  }

  /** Frame sampling: every nth frame per doc — pure plan, no codec. */
  def sampleFrames(frames: Dataset[DecodedFrame], every: Int)
      : Dataset[DecodedFrame] =
    frames.filter(f => f.frame_idx % every == 0)

  /** Resize stub: dimension change with a deterministic pixels-hash
    * lineage (the real resampler is codec-side; the engine contract is
    * the map-only shape transform). Identical inputs stay identical
    * after resize — the property multimodal dedup relies on. */
  def resizeFrames(frames: Dataset[DecodedFrame], w: Int, h: Int)
      : Dataset[DecodedFrame] = {
    require(w > 0 && h > 0)
    frames.map(f => f.copy(width = w, height = h,
      pixels_hash = f.pixels_hash * 1315423911L + w.toLong * 31 + h))(
      frames.encoder)
  }

  /** Perceptual-hash column over the media payload: a 63-bit code on
    * which Hamming distance means visual similarity. The CODE ITSELF is
    * the codec stub (a real pHash DCTs a downscaled grayscale; media
    * libs are not on this classpath): two 31/32-bit halves of
    * md5(bytes) packed into one non-negative long — deterministic,
    * cross-engine reproducible (hex arithmetic only, so the DuckDB
    * oracle computes the identical code), and hash-like, so identical
    * payloads collide at distance 0 and the dedup plumbing downstream
    * is exercised for real. 63 bits (top bit masked) keeps the pack
    * exact in any signed-64 engine. Swap this projection for a real
    * codec hash without touching [[phashPairs]]. */
  def perceptualHash(df: DataFrame, media: Column = col("media"),
      as: String = "phash"): DataFrame = {
    val hex = md5(media)
    val hi = conv(substring(hex, 1, 8), 16, 10).cast("long")
      .bitwiseAND(lit(0x7FFFFFFFL))
    val lo = conv(substring(hex, 9, 8), 16, 10).cast("long")
    df.withColumn(as, shiftleft(hi, 32).bitwiseOR(lo))
  }

  /** Shot-boundary (scene-cut) detection over per-frame 64-bit
    * perceptual codes — the video-curation primitive that turns raw
    * footage into shot-level training clips: a cut is where
    * consecutive frames' codes differ by >= `tau` Hamming bits
    * (within-shot frames share most bits, a hard cut flips ~half).
    * Codes come from the caller (the codec seam, same contract as
    * [[perceptualHash]]); this operator is pure plan — one window
    * pass per asset (lag + codegen'd xor/bit_count), no self-join,
    * no state beyond the 1-frame lag.
    *
    * Returns cut rows (asset_id, prev_idx, frame_idx, hamming) —
    * compose with a gaps-and-islands pass for shot spans. */
  def sceneCuts(frames: DataFrame, asset: Column, idx: Column,
      code: Column, tau: Int): DataFrame = {
    require(tau >= 1 && tau <= 64, s"tau must be in [1,64]: $tau")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("asset_id")).orderBy(col("frame_idx"))
    frames
      .select(asset.as("asset_id"), idx.as("frame_idx"), code.as("__c"))
      .withColumn("__prev", lag(col("__c"), 1).over(w))
      .withColumn("prev_idx", lag(col("frame_idx"), 1).over(w))
      .where(col("__prev").isNotNull)
      .withColumn("hamming",
        bit_count(col("__c").bitwiseXOR(col("__prev"))).cast("long"))
      .where(col("hamming") >= tau)
      .select(col("asset_id"), col("prev_idx"), col("frame_idx"),
        col("hamming"))
  }

  /** Audio frame segmentation — the ASR/mel-frame windowing fan-out:
    * each payload (interpreted as 16-bit PCM mono at `sampleRate`)
    * explodes into overlapping sample windows of `windowSamples` with
    * stride `hopSamples`, each row carrying sample AND millisecond
    * bounds. Everything is metadata arithmetic over the byte length —
    * the decode itself stays behind the codec seam like every other
    * media op here — so the whole fan-out is a map-side explode of a
    * `sequence()` (the plan a real featurizer feeds from), and the
    * window math is integer-exact, fully oracle-checkable. Payloads
    * shorter than one window emit no rows (a partial window has no
    * fixed-shape feature). */
  def audioWindows(df: DataFrame, windowSamples: Int, hopSamples: Int,
      sampleRate: Int = 16000): DataFrame = {
    require(windowSamples > 0 && hopSamples > 0 && sampleRate > 0)
    df.select(col("doc_id"),
        expr("octet_length(media) div 2").as("n_samples"))
      // integer `div` throughout — Spark's `/` is always double
      .withColumn("__nw", when(col("n_samples") >= windowSamples,
        expr(s"(n_samples - $windowSamples) div $hopSamples + 1"))
        .otherwise(0L))
      .withColumn("win_idx", explode(when(col("__nw") > 0,
        sequence(lit(0L), col("__nw") - 1)).otherwise(
        array().cast("array<bigint>"))))
      .withColumn("start_sample", col("win_idx") * hopSamples)
      .withColumn("end_sample", col("start_sample") + windowSamples)
      // `div` (integer division), not `/` (Spark's `/` is always double)
      .withColumn("start_ms", expr(s"start_sample * 1000 div $sampleRate"))
      .withColumn("end_ms", expr(s"end_sample * 1000 div $sampleRate"))
      .drop("__nw")
  }

  /** Near-duplicate media pairs by perceptual-hash Hamming distance:
    * delegates to the pigeonhole-complete chunk-combination blocking in
    * [[Dedup.hammingPairs64]] — banded shuffle keys, never all-pairs,
    * exact bit_count verify. Output (doc_a, doc_b, hamming). */
  def phashPairs(df: DataFrame, id: Column, maxDist: Int): DataFrame =
    Dedup.hammingPairs64(
      perceptualHash(df).select(id.as("doc_id"), col("phash").as("sh")),
      maxDist)

  /** Feature extraction stub over decoded frames: deterministic
    * "embedding" per frame, keeping the array<float> contract that feeds
    * graft.operators.Similarity. */
  def frameFeatures(spark: SparkSession, frames: Dataset[DecodedFrame],
      dim: Int = 8): DataFrame = {
    import spark.implicits._
    frames.map { f =>
      val rng = new scala.util.Random(f.pixels_hash)
      (f.doc_id, f.frame_idx, Array.fill(dim)(rng.nextFloat()))
    }.toDF("doc_id", "frame_idx", "embedding")
  }
}
