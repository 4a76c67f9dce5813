package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit salting for skewed equi-joins.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on in the
  * bench/verify sessions) is the first line of defense — it needs no plan
  * change. Salting is the complement for the cases AQE can't fix: a
  * single hot key that exceeds one task even after splitting, or a
  * broadcast-ineligible dim under a skewed fact. The fact side spreads
  * each key over `salt` sub-keys; the dim side is replicated `salt` ways;
  * the join key becomes (key, salt), so one hot key fans across `salt`
  * tasks. Result is row-identical to the unsalted join (oracle-checked in
  * the `join_salted_skew` query).
  */
object SkewJoin {

  private val SaltCol = "__graft_salt"

  /** Equi-join `fact` with `dim` on `key`, spreading each fact key over
    * `salt` partitions. `dim` is replicated `salt`x — size the factor so
    * salt * |dim| stays shuffle-friendly (or broadcast-eligible). */
  private val SupportedJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti", "cross")

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    // right/full-outer would null-extend the salt-1 dim replicas that have
    // no matching fact sub-key — not row-identical to the unsalted join
    require(SupportedJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin supports fact-preserving join types only, got $joinType")
    // any per-row spreader works; a hash of the whole row avoids both the
    // nondeterminism of rand() and the partition-ordering dependence of
    // monotonically_increasing_id()
    val saltedFact = fact.withColumn(SaltCol,
      pmod(xxhash64(struct(fact.columns.map(col).toSeq: _*)), lit(salt))
        .cast("int"))
    val repDim = dim.withColumn(SaltCol,
      explode(array((0 until salt).map(lit): _*)))
    saltedFact.join(repDim, Seq(key, SaltCol), joinType).drop(SaltCol)
  }
}
