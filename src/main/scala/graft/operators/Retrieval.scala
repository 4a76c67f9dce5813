package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a lexical ranking
  * (BM25 / idf term match) with a semantic one (embedding ANN) is the
  * standard retrieval layout of a training-data curation pipeline
  * (mine-by-query, hard-negative pools, eval-set construction). The
  * fusion rule is reciprocal-rank fusion (Cormack, Clarke & Buettcher
  * 2009, "Reciprocal rank fusion outperforms Condorcet and individual
  * rank learning methods"): score(d) = Σ_lists 1/(kConst + rank_list(d))
  * — rank-only, so lists with incomparable score scales (a bigint
  * fixed-point BM25 vs a float cosine) fuse without calibration.
  *
  * Determinism contract: the reciprocal rides the repo's fixed point —
  * each list contributes `scale div (kConst + rank)` (integer floor
  * division, scale = 2^20), so fused scores are exact bigints, the
  * ranking is engine-independent, and the whole fusion oracle-checks.
  *
  * Scale shape: input lists are already top-k-per-query CUT (the
  * expensive part — ANN / inverted-index retrieval — happened
  * upstream), so everything here is arithmetic over |queries|·k rows:
  * one union, one groupBy on (query, id). No window over the corpus.
  */
object Retrieval {

  /** Attach a 1-based `rank` to a ranked list: row_number over
    * `order` within `by` (the per-query partition; empty = one global
    * list). Meant for ALREADY-CUT top-k lists — the window runs over
    * |queries|·k rows, never the corpus; cutting is the retriever's
    * job ([[TextAnalysis.bm25TopK]], [[Similarity]] topK paths). Ties
    * must be broken by a unique trailing column in `order` or ranks
    * are nondeterministic. */
  def rankOf(ranked: DataFrame, by: Seq[String], order: Seq[Column])
      : DataFrame = {
    require(order.nonEmpty, "rankOf needs an explicit total order")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(by.map(col): _*).orderBy(order: _*)
    ranked.withColumn("rank", row_number().over(w).cast("long"))
  }

  /** Fuse ranked lists by reciprocal rank. Every input must carry
    * `by` ++ (`idCol`, `rank`) — see [[rankOf]]. Returns one row per
    * (by, id) seen in ANY list: `n_lists` (how many lists retrieved
    * it — itself a useful agreement signal) and `rrf_fp`
    * (Σ scale div (kConst + rank), exact bigint). kConst=60 is the
    * paper's setting; larger flattens the head. */
  def rrfFuse(ranked: Seq[DataFrame], idCol: String,
      by: Seq[String] = Nil, kConst: Int = 60, scale: Long = 1L << 20)
      : DataFrame = {
    require(ranked.nonEmpty, "rrfFuse needs at least one ranked list")
    require(kConst >= 0 && scale > 0, s"bad rrf params: $kConst $scale")
    val keys = by :+ idCol
    val contribs = ranked.map { df =>
      df.select(keys.map(col) :+
        expr(s"$scale div (rank + $kConst)").as("__rrf"): _*)
    }
    contribs.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_lists"), sum(col("__rrf")).as("rrf_fp"))
  }
}
