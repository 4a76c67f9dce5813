package graft

import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** The native md5-u32 expressions must be VALUE-IDENTICAL to the
  * composed `conv(substring(md5(x), 1+8w, 8), 16, 10)` form — that
  * composition is what every DuckDB oracle replays (hashU32Sql), so a
  * single-bit drift here silently breaks dozens of hash-keyed gates. */
class HashExprSpec extends SparkSpec {
  import spark.implicits._

  private def inputs = (
    (1 to 300).map(i => s"k$i#${i % 7}") ++
      Seq("", "é中文🙂", "a|b|ø", "0", "-1", " space  padded ")
  ).toDF("s")

  test("md5_u32 window 0..3 equals the conv/substring/md5 composition") {
    (0 until 4).foreach { w =>
      val r = inputs.select(
          HashFunctions.md5_u32(col("s"), w).as("nat"),
          conv(substring(md5(col("s")), 1 + 8 * w, 8), 16, 10)
            .cast("long").as("ref"))
        .where(col("nat") =!= col("ref"))
      assert(r.count() == 0L, s"window $w drifted")
    }
  }

  test("md5_u32x4 equals the four windows; null propagates; " +
      "range is unsigned 32-bit") {
    val r = inputs.select(col("s"),
        HashFunctions.md5_u32x4(col("s")).as("a"),
        array((0 until 4).map(w =>
          HashFunctions.md5_u32(col("s"), w)): _*).as("b"))
      .where(col("a") =!= col("b"))
    assert(r.count() == 0L)
    val n = Seq(Option.empty[String]).toDF("s")
      .select(HashFunctions.md5_u32(col("s")).as("u"),
        HashFunctions.md5_u32x4(col("s")).as("a")).head()
    assert(n.isNullAt(0) && n.isNullAt(1))
    val bounds = inputs.select(
      explode(HashFunctions.md5_u32x4(col("s"))).as("u"))
    assert(bounds.where(col("u") < 0L || col("u") > 4294967295L)
      .count() == 0L)
  }

  test("md5_head63 equals the masked/shifted u32 composition, is " +
      "nonnegative, propagates null") {
    val r = inputs.select(
        HashFunctions.md5_head63(col("s")).as("nat"),
        (HashFunctions.md5_u32(col("s"), 0).bitwiseAND(lit(2147483647L)) *
          lit(4294967296L) + HashFunctions.md5_u32(col("s"), 1)).as("ref"))
    assert(r.where(col("nat") =!= col("ref")).count() == 0L)
    assert(r.where(col("nat") < 0L).count() == 0L)
    val n = Seq(Option.empty[String]).toDF("s")
      .select(HashFunctions.md5_head63(col("s"))).head()
    assert(n.isNullAt(0))
    // driver-side util agrees with the expression (the winnow map path)
    val viaUtil = graft.functions.HashUtil.md5head63(
      org.apache.spark.unsafe.types.UTF8String.fromString("k1#0"))
    val viaSpark = Seq("k1#0").toDF("s")
      .select(HashFunctions.md5_head63(col("s"))).head().getLong(0)
    assert(viaUtil == viaSpark)
  }

  test("interpreted eval matches codegen (expression used in a " +
      "non-codegen context)") {
    // force interpreted path via an eval on the driver
    val e = graft.functions.Md5U32(
      org.apache.spark.sql.catalyst.expressions.Literal("k1#0"), 0)
    val viaSpark = Seq("k1#0").toDF("s")
      .select(HashFunctions.md5_u32(col("s"))).head().getLong(0)
    assert(e.eval(null) == viaSpark)
  }
}
