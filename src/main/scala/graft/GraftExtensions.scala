package graft

import graft.functions._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL registration for graft's native expressions, so the querySql
  * passthrough surface (the Spark analogue of the reference's raw-SQL
  * entry point, /root/reference/database/dbms/reader/parameter.go:94-101)
  * can call them: `SELECT vec_dot(a, b)`, `word_shingle_hashes(text, 3)`.
  *
  * Two registration seams, same function list:
  *  - [[GraftFunctions.register]] adds them to a live session (tests,
  *    interactive);
  *  - [[GraftExtensions]] is the `spark.sql.extensions` entry point for
  *    cluster deployments (`--conf spark.sql.extensions=graft.GraftExtensions`).
  */
object GraftFunctions {
  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: n must be an integer literal, got $other")
  }

  private def strLit(e: Expression, fn: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String,
        org.apache.spark.sql.types.StringType) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: expected a string literal, got $other")
  }

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "", "", "", "", "",
      "", "built-in")

  private def arity(fn: String, n: Int)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != n) throw new IllegalArgumentException(
        s"$fn expects $n arguments, got ${args.length}")
      b(args)
    }

  val all: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("vec_dot"),
      info(classOf[FloatVectorDot], "vec_dot",
        "vec_dot(a, b) - dot product of two float/double arrays"),
      arity("vec_dot", 2)(args => FloatVectorDot(args(0), args(1)))),
    (FunctionIdentifier("vec_dot_long"),
      info(classOf[LongVectorDot], "vec_dot_long",
        "vec_dot_long(a, b) - exact integer dot product of two bigint arrays"),
      arity("vec_dot_long", 2)(args => LongVectorDot(args(0), args(1)))),
    (FunctionIdentifier("word_shingles"),
      info(classOf[WordShingles], "word_shingles",
        "word_shingles(text, n) - word n-gram shingles"),
      arity("word_shingles", 2)(args =>
        WordShingles(args(0), intLit(args(1), "word_shingles")))),
    (FunctionIdentifier("word_shingle_hashes"),
      info(classOf[WordShingleHashes], "word_shingle_hashes",
        "word_shingle_hashes(text, n) - xxhash64 of each word n-gram"),
      arity("word_shingle_hashes", 2)(args =>
        WordShingleHashes(args(0), intLit(args(1), "word_shingle_hashes")))),
    (FunctionIdentifier("minhash_signature"),
      info(classOf[MinHashSignature], "minhash_signature",
        "minhash_signature(hashes, perms) - MinHash sketch of a bigint " +
          "hash array"),
      arity("minhash_signature", 2)(args =>
        MinHashSignature(args(0), intLit(args(1), "minhash_signature")))),
    (FunctionIdentifier("simhash64"),
      info(classOf[SimHash64], "simhash64",
        "simhash64(hashes) - 64-bit SimHash fingerprint of a bigint " +
          "hash array"),
      arity("simhash64", 1)(args => SimHash64(args(0)))),
    (FunctionIdentifier("misra_gries_topk"),
      info(classOf[MisraGriesTopK], "misra_gries_topk",
        "misra_gries_topk(term, k) - bounded-memory heavy-hitters " +
          "aggregate: <= k (term, cnt) counters, exact above N/(k+1)"),
      arity("misra_gries_topk", 2)(args =>
        MisraGriesTopK(args(0), intLit(args(1), "misra_gries_topk"))
          .toAggregateExpression())),
    (FunctionIdentifier("theta_sketch_agg"),
      info(classOf[ThetaSketchAgg], "theta_sketch_agg",
        "theta_sketch_agg(v, lgK) - theta distinct sketch (binary); " +
          "supports union/intersection/difference set operations"),
      arity("theta_sketch_agg", 2)(args =>
        ThetaSketchAgg(args(0), intLit(args(1), "theta_sketch_agg"))
          .toAggregateExpression())),
    (FunctionIdentifier("kll_sketch_agg"),
      info(classOf[KllSketchAgg], "kll_sketch_agg",
        "kll_sketch_agg(v, k) - KLL quantile sketch (binary); " +
          "mergeable, ~1.65% rank error at k=200"),
      arity("kll_sketch_agg", 2)(args =>
        KllSketchAgg(args(0), intLit(args(1), "kll_sketch_agg"))
          .toAggregateExpression())),
    (FunctionIdentifier("bpe_merge"),
      info(classOf[BpeMerge], "bpe_merge",
        "bpe_merge(symbols, a, b) - one BPE merge pass: fuse adjacent " +
          "(a, b) symbol pairs left-to-right into a+b"),
      arity("bpe_merge", 3)(args =>
        BpeMerge(args(0), strLit(args(1), "bpe_merge"),
          strLit(args(2), "bpe_merge")))),
    (FunctionIdentifier("topk_by"),
      info(classOf[TopKByAgg], "topk_by",
        "topk_by(score, id, k) - bounded-heap top-k aggregate: the k " +
          "best (score DESC, id ASC) pairs per group, map-side combined"),
      arity("topk_by", 3)(args =>
        TopKByAgg(args(0), args(1), intLit(args(2), "topk_by"))
          .toAggregateExpression())),
    (FunctionIdentifier("deflate_len"),
      info(classOf[DeflateLen], "deflate_len",
        "deflate_len(text) - DEFLATE-compressed byte count (level 6, " +
          "raw): the compression-ratio quality signal"),
      arity("deflate_len", 1)(args => DeflateLen(args(0)))),
    (FunctionIdentifier("log2_fp"),
      info(classOf[Log2Fp], "log2_fp",
        "log2_fp(x) - floor(2^20 * log2(x)) by exact integer " +
          "shift-and-square: the cross-engine-exact log for entropy/" +
          "PSI/PMI statistics; NULL for x <= 0"),
      arity("log2_fp", 1)(args => Log2Fp(args(0)))),
    (FunctionIdentifier("hilbert_index"),
      info(classOf[HilbertIndex2], "hilbert_index",
        "hilbert_index(x, y, order) - Hilbert curve distance of the " +
          "quantized (x, y) cell in a 2^order grid; the locality-" +
          "preserving file-clustering key"),
      arity("hilbert_index", 3)(args =>
        HilbertIndex2(args(0), args(1), intLit(args(2),
          "hilbert_index")))),
    (FunctionIdentifier("range_lookup_idx"),
      info(classOf[RangeLookupIdx], "range_lookup_idx",
        "range_lookup_idx(x, los, his) - binary search sorted " +
          "non-overlapping inclusive intervals; 0-based index of the " +
          "interval containing x, else NULL"),
      arity("range_lookup_idx", 3)(args =>
        RangeLookupIdx(args(0), args(1), args(2)))),
    (FunctionIdentifier("md5_u32"),
      info(classOf[Md5U32], "md5_u32",
        "md5_u32(str, w) - unsigned 32-bit window w (0..3) of md5(str): " +
          "the cross-engine deterministic draw, native twin of " +
          "conv(substring(md5(str), 1+8*w, 8), 16, 10)"),
      arity("md5_u32", 2)(args =>
        Md5U32(args(0), intLit(args(1), "md5_u32")))),
    (FunctionIdentifier("md5_pois4"),
      info(classOf[Md5Pois4], "md5_pois4",
        "md5_pois4(str) - four Poisson(1) bootstrap weights from one " +
          "md5 digest (inverse-CDF threshold count per u32 window)"),
      arity("md5_pois4", 1)(args => Md5Pois4(args(0)))),
    (FunctionIdentifier("vec_maxsim_long"),
      info(classOf[LongVectorMaxSim], "vec_maxsim_long",
        "vec_maxsim_long(a, b, subVecs) - ColBERT MaxSim over two " +
          "flattened multi-vector bigint arrays: sum over a's sub-" +
          "vectors of the best exact int64 dot against b's"),
      arity("vec_maxsim_long", 3)(args =>
        LongVectorMaxSim(args(0), args(1),
          intLit(args(2), "vec_maxsim_long")))),
    (FunctionIdentifier("md5_head63"),
      info(classOf[Md5Head63], "md5_head63",
        "md5_head63(str) - nonnegative 63-bit head of md5(str): the " +
          "replayable-oracle hash ((u32_0 & 0x7fffffff) << 32 | u32_1)"),
      arity("md5_head63", 1)(args => Md5Head63(args(0)))),
    (FunctionIdentifier("md5_word_shingle_heads63"),
      info(classOf[Md5WordShingleHeads63], "md5_word_shingle_heads63",
        "md5_word_shingle_heads63(str, k) - md5_head63 of every word " +
          "k-shingle (space-split tokens, one byte pass)"),
      arity("md5_word_shingle_heads63", 2)(args =>
        Md5WordShingleHeads63(args(0),
          intLit(args(1), "md5_word_shingle_heads63")))),
    (FunctionIdentifier("md5_char_window_heads63"),
      info(classOf[Md5CharWindowHeads63], "md5_char_window_heads63",
        "md5_char_window_heads63(str, w) - md5_head63 of every " +
          "w-code-point window (one byte pass)"),
      arity("md5_char_window_heads63", 2)(args =>
        Md5CharWindowHeads63(args(0),
          intLit(args(1), "md5_char_window_heads63")))))

  /** Register into a live session's function registry. */
  def register(spark: SparkSession): Unit = all.foreach { case (id, fi, b) =>
    spark.sessionState.functionRegistry.registerFunction(id, fi, b)
  }
}

/** `spark.sql.extensions` entry point (must be applied at session build:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or the
  * `spark.sql.extensions` conf on a cluster). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    // declarative HOF dot products -> codegen'd native expressions
    ext.injectOptimizerRule(_ => DotProductRewrite)
    // time-range predicates push through the micros->nanos normalization
    ext.injectOptimizerRule(_ => TimeScalePushdown)
    // custom as-of + interval join physical operators (graft.plans)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
  }
}
