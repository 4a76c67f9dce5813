package graft

import graft.functions.FixedLog
import graft.operators.Survival
import org.apache.spark.sql.functions._

/** Pins Survival.kaplanMeier: textbook at-risk/step arithmetic on a
  * planted cohort, the fixed-point survival against the double KM
  * product, support truncation when S hits exact zero, and partition
  * invariance. */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  // (t, event): churns at 1,2,2,4; censored at 3,4,5
  private val cohort =
    Seq((1L, 1L), (2L, 1L), (2L, 1L), (3L, 0L), (4L, 1L), (4L, 0L),
      (5L, 0L))

  test("matches the textbook KM table on a planted cohort") {
    val r = Survival.kaplanMeier(cohort.toDF("t", "e"), col("t"),
        col("e"))
      .orderBy("t").collect()
    // steps at t=1 (n=7,d=1), t=2 (n=6,d=2), t=4 (n=3,d=1)
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
      x.getLong(3))).toSeq ==
      Seq((1L, 7L, 1L, 0L), (2L, 6L, 2L, 0L), (4L, 3L, 1L, 1L)))
    // fixed-point survival ~ the double product within 2e-6 * steps
    val sTrue = Seq(6.0 / 7, 6.0 / 7 * 4 / 6, 6.0 / 7 * 4 / 6 * 2 / 3)
    r.zip(sTrue).foreach { case (row, s) =>
      val fp = row.getLong(row.fieldIndex("log2_surv_fp"))
      val approx = math.pow(2.0, fp.toDouble / (1L << FixedLog.FracBits))
      assert(math.abs(approx - s) < 1e-4, s"row $row vs $s")
    }
  }

  test("support ends when the at-risk set churns out entirely") {
    // churns at 1 and 2 with nobody censored: at t=2, n=d=1 -> S=0,
    // log undefined -> NULL from that step on
    val r = Survival.kaplanMeier(Seq((1L, 1L), (2L, 1L)).toDF("t", "e"),
        col("t"), col("e"))
      .orderBy("t").collect()
    assert(!r(0).isNullAt(r(0).fieldIndex("log2_surv_fp")))
    assert(r(1).isNullAt(r(1).fieldIndex("log2_surv_fp")))
  }

  test("bit-identical under repartitioning") {
    val rows = (1L to 500L).map(i => (i % 37, (i % 5 != 0).compare(false)
      .toLong))
    def run(np: Int) = {
      val base = rows.toDF("t", "e")
      Survival.kaplanMeier(if (np > 0) base.repartition(np) else base,
          col("t"), col("e"))
        .orderBy("t").collect().map(_.toSeq).toSeq
    }
    assert(run(0) == run(19))
  }
}
