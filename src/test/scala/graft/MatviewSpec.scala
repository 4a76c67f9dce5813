package graft

import graft.operators.Matview
import graft.sinks.VersionedTable
import org.apache.spark.sql.functions._

/** Pins delta-propagation IVM (operators.Matview) against full
  * recompute: randomized mutation rounds over the versioned lake where
  * the maintained aggregate must equal a from-scratch aggregate of the
  * head — including group birth (insert into a new group), group death
  * (count reaches zero), and chained rounds feeding the previous
  * maintained state back in. */
class MatviewSpec extends SparkSpec {
  import spark.implicits._

  private def agg(df: org.apache.spark.sql.DataFrame) =
    Matview.sumsOf(df, Seq("g"), Seq("x"))

  private def asMap(df: org.apache.spark.sql.DataFrame)
      : Map[String, (Long, Long)] =
    df.select("g", "n_rows", "sum_x").as[(String, Long, Long)]
      .collect().map { case (g, n, s) => g -> (n, s) }.toMap

  test("randomized mutation rounds: maintained == recompute, chained") {
    val rnd = new scala.util.Random(3)
    val root = java.nio.file.Files.createTempDirectory("mvspec")
      .toString + "/t"
    val base = (0 until 300).map(i =>
      (i.toLong, s"g${rnd.nextInt(6)}", rnd.nextInt(100)))
    val v0 = VersionedTable.write(base.toDF("id", "g", "x"), root)
    var maintained = agg(VersionedTable.read(spark, root, Some(v0)))
    var fromV = v0
    for (round <- 0 until 3) {
      // random upsert batch: some updates (possibly moving groups — an
      // update is remove(old)+insert(new)), some fresh inserts into a
      // brand-new group, then a delete that can kill a whole group
      val ups = (0 until 40).map(_ => rnd.nextInt(300).toLong).distinct
        .map(id => (id, s"g${rnd.nextInt(7)}", rnd.nextInt(100)))
      val ins = (0 until 10).map(i =>
        (1000L + round * 100 + i, s"new$round", rnd.nextInt(100)))
      VersionedTable.upsert((ups ++ ins).toDF("id", "g", "x"), root,
        Seq("id"))
      val doomed = s"g${rnd.nextInt(6)}"
      val toV = VersionedTable.deleteWhere(spark, root, col("g") === doomed)

      val cdc = VersionedTable.diff(spark, root, Seq("id"), fromV, toV)
      val inserted = cdc.filter(col("change_type").isin("insert", "update"))
      val removed = VersionedTable.read(spark, root, Some(fromV))
        .join(cdc.filter(col("change_type").isin("update", "delete"))
          .select("id"), Seq("id"), "leftsemi")
      maintained = Matview.maintainSums(maintained, inserted, removed,
        Seq("g"), Seq("x"))
      // chain: materialize the maintained state before the lake mutates
      // again (plans over VersionedTable roots are version-pinned, but
      // keep the comparison honest round by round)
      val got = asMap(maintained)
      val expect = asMap(agg(VersionedTable.read(spark, root)))
      assert(got == expect, s"round=$round (doomed=$doomed)")
      maintained = got.toSeq.map { case (g, (n, s)) => (g, n, s) }
        .toDF("g", "n_rows", "sum_x")
      fromV = toV
    }
    val p = new org.apache.hadoop.fs.Path(root).getParent
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("update that only changes the sum column keeps counts stable") {
    val prev = Seq(("a", 2L, 10L)).toDF("g", "n_rows", "sum_x")
    val out = asMap(Matview.maintainSums(prev,
      inserted = Seq(("a", 9L)).toDF("g", "x"),
      removed = Seq(("a", 4L)).toDF("g", "x"),
      groupCols = Seq("g"), sumCols = Seq("x")))
    assert(out == Map("a" -> (2L, 15L)))
  }

  test("group death drops the row; group birth creates it") {
    val prev = Seq(("a", 1L, 5L)).toDF("g", "n_rows", "sum_x")
    val out = asMap(Matview.maintainSums(prev,
      inserted = Seq(("b", 7L)).toDF("g", "x"),
      removed = Seq(("a", 5L)).toDF("g", "x"),
      groupCols = Seq("g"), sumCols = Seq("x")))
    assert(out == Map("b" -> (1L, 7L)))
  }
}
