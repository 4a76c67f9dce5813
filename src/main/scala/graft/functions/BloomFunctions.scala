package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge

/** Bloom-filter column functions over Spark's own spark-sketch
  * `BloomFilter` — the machinery behind the engine's runtime row-level
  * join filters (`InjectRuntimeFilter`), exposed as library functions so
  * operators can build/probe filters with explicit sizing.
  *
  * Values hash through `XxHash64` (default seed) on BOTH the build and
  * probe sides — exactly what Spark's own runtime-filter rewrite does —
  * so any hashable column type participates and the two sides can even
  * be different-but-hash-equal types.
  */
object BloomFunctions {

  /** Aggregate a column into ONE serialized bloom filter (binary).
    * Returns null on empty/all-null input (Spark's own convention). */
  def bloom_agg(c: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(c))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a pre-built filter's bytes. The bloom side
    * must be a constant (the expression requires a foldable literal or
    * scalar subquery — same restriction as Spark's runtime filters). */
  def bloom_might_contain(bloomBytes: Array[Byte], c: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBytes),
      new XxHash64(Seq(ColumnBridge.expression(c)))))
}
