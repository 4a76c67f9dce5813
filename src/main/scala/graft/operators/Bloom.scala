package graft.operators

import graft.functions.BloomFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter pre-filtering — the scale technique for shrinking a
  * shuffle BEFORE it happens. A big⋈small equi join shuffles the entire
  * big side even when only a sliver of its keys survive the join; a
  * bloom filter of the small side's keys (fixed size: ~1.2 MB per 1M
  * keys at 1% fpp, independent of value width) ships to every task and
  * drops non-matching big-side rows at the SCAN, so the exchange carries
  * ~selectivity x |big| + fpp x |big| rows instead of |big|.
  *
  * Exactness: a bloom filter has NO false negatives, so every row the
  * join would keep survives the prefilter; the join's own equality check
  * then discards the false positives — the final result is bit-identical
  * to the unfiltered join (inner/semi shapes; outer joins must keep
  * non-matching rows and cannot prefilter the outer side).
  *
  * This is Spark's own `InjectRuntimeFilter` shape, exposed as an
  * explicit operator: the automatic rule only fires under size/stats
  * heuristics, while a pipeline author often KNOWS the small side is
  * selective (e.g. a curated id list vs a 100 TB corpus).
  */
object Bloom {

  /** Standard optimal bit count for `n` items at false-positive rate
    * `fpp` — delegates to spark-sketch's own formula so sizing can
    * never drift from the engine's bloom machinery. */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"need items > 0, 0 < fpp < 1: $expectedItems / $fpp")
    org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
  }

  /** Aggregate `key` of `df` into one bloom filter and return its
    * serialized bytes (null when the input is empty/all-null). One
    * combiner-tree aggregation; the driver holds only numBits/8 bytes,
    * never the key set itself.
    *
    * FAILS LOUD when the requested size exceeds Spark's runtime-filter
    * caps: `BloomFilterAggregate` silently clamps its item/bit
    * parameters with `spark.sql.optimizer.runtime.bloomFilter
    * .maxNumItems` / `.maxNumBits` (defaults 4M / 2^26) — above them
    * the real fpp would quietly approach 1 and every membership
    * guarantee this operator's callers document (prefilter selectivity,
    * decontamination over-drop ~fpp) would be silently void. Raise
    * those confs to the requested size instead of shrinking the ask. */
  def buildBytes(df: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val bits = optimalNumBits(expectedItems, fpp)
    val conf = df.sparkSession.conf
    val maxItems = conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems").toLong
    val maxBits = conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits").toLong
    require(expectedItems <= maxItems && bits <= maxBits,
      s"bloom sizing ($expectedItems items / $bits bits) exceeds Spark's " +
        s"runtime-filter caps ($maxItems items / $maxBits bits) and WOULD " +
        "BE SILENTLY CLAMPED (real fpp -> 1). Raise spark.sql.optimizer." +
        "runtime.bloomFilter.maxNumItems / .maxNumBits to at least the " +
        "requested size.")
    df.agg(BloomFunctions.bloom_agg(key, expectedItems, bits).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Build a REPLAYABLE md5 double-hash bloom bitmap of `key` — the
    * oracle-checkable sibling of [[buildBytes]] (hash scheme:
    * [[graft.functions.Md5BloomUtil]]). Positions are computed
    * distributed and declaratively (one digest + kHashes modular steps
    * per key); only the DISTINCT set positions come back to the driver
    * — bounded by min(kHashes * |keys|, mBits), and the build side of a
    * bloom is small by contract (that is the whole point of the
    * filter). Returns null on an empty input, like [[buildBytes]]. */
  def buildMd5Bitmap(df: DataFrame, key: Column, mBits: Int = 1 << 20,
      kHashes: Int = 7): Array[Byte] = {
    require(mBits > 0 && mBits % 8 == 0 && kHashes > 0,
      s"need mBits > 0 divisible by 8 and kHashes > 0: $mBits/$kHashes")
    val h1 = graft.functions.HashFunctions.md5_u32(key, 0)
    val h2 = graft.functions.HashFunctions.md5_u32(key, 1)
    val positions = df
      .select(explode(transform(sequence(lit(0), lit(kHashes - 1)),
        j => (h1 + j * h2) % mBits)).as("p"))
      .distinct()
      .collect().map(_.getLong(0))
    if (positions.isEmpty) null
    else {
      val bitmap = new Array[Byte](mBits / 8)
      positions.foreach { pos =>
        bitmap((pos >> 3).toInt) =
          (bitmap((pos >> 3).toInt) | (1 << (pos & 7).toInt)).toByte
      }
      bitmap
    }
  }

  /** Exact big⋈small equi join with the big side bloom-prefiltered.
    * `joinType` is restricted to the shapes where dropping non-matching
    * big-side rows early is semantics-preserving. */
  def prefilteredJoin(big: DataFrame, small: DataFrame, bigKey: Column,
      smallKey: Column, expectedItems: Long, fpp: Double = 0.01,
      joinType: String = "inner"): DataFrame = {
    val ok = Set("inner", "left_semi", "leftsemi", "left_anti", "leftanti")
    require(ok.contains(joinType.toLowerCase.replace("_", "")) ||
      ok.contains(joinType.toLowerCase),
      s"bloom prefilter preserves inner/semi shapes only, not $joinType")
    val bytes = buildBytes(small, smallKey, expectedItems, fpp)
    val anti = joinType.toLowerCase.replace("_", "") == "leftanti"
    if (bytes == null) {
      // empty build side: inner/semi joins are empty; anti keeps all
      if (anti) big else big.filter(lit(false)).join(small, bigKey === smallKey, joinType)
    } else if (anti) {
      // anti join keeps DEFINITE non-members immediately (no false
      // negatives => might_contain false is a certain miss); only the
      // might-contain sliver needs the join's exact re-check
      val maybe = big.filter(BloomFunctions.bloom_might_contain(bytes, bigKey))
        .join(small, bigKey === smallKey, "left_anti")
      big.filter(!BloomFunctions.bloom_might_contain(bytes, bigKey))
        .unionByName(maybe)
    } else {
      big.filter(BloomFunctions.bloom_might_contain(bytes, bigKey))
        .join(small, bigKey === smallKey, joinType)
    }
  }
}
