package graft

import graft.operators.split.RangeSplitter
import graft.operators.split.RangeSplitter._
import org.scalacheck.Gen

/** Split-planner invariants (SURVEY.md §5 property list): slices cover
  * [min,max] exactly, are disjoint and adjacent, count shrinks to the gap,
  * remainder spreads over the first slices; the string codec round-trips
  * ASCII. Property sampling runs directly over scalacheck Gens (the
  * scalatestplus bridge isn't on the offline classpath). */
class RangeSplitterSpec extends SparkSpec {

  private def forSamples[A](g: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach(_ => g.sample.foreach(f))

  private val ranges = for {
    min <- Gen.chooseNum(-100000L, 100000L)
    width <- Gen.chooseNum(0L, 500000L)
    n <- Gen.chooseNum(1, 64)
  } yield (BigInt(min), BigInt(min) + width, n)

  test("slices cover the domain exactly, disjoint and adjacent") {
    forSamples(ranges) { case (min, max, n) =>
      val s = split(min, max, n)
      assert(s.nonEmpty)
      assert(s.head.lo == min)
      assert(s.last.hi == max && s.last.closed)
      s.sliding(2).foreach {
        case Seq(a, b) => assert(a.hi == b.lo); assert(!a.closed)
        case _ =>
      }
      val total = s.map(x => x.hi - x.lo).sum + 1 // +1: last slice closed
      assert(total == max - min + 1)
      assert(s.size <= n)
    }
  }

  test("slice count shrinks to the gap when gap < n") {
    val s = split(BigInt(10), BigInt(12), 8)
    assert(s.size == 3)
    assert(s.map(x => (x.lo, x.hi)) == Seq((BigInt(10), BigInt(11)),
      (BigInt(11), BigInt(12)), (BigInt(12), BigInt(12))))
  }

  test("remainder spreads one-per-slice over the first slices") {
    val s = split(BigInt(0), BigInt(9), 3) // gap 10 = 3*3 + 1
    assert(s.map(x => x.hi - x.lo) == Seq(BigInt(4), BigInt(3), BigInt(2)))
  }

  test("degenerate inputs") {
    assert(split(BigInt(5), BigInt(4), 3).isEmpty)
    assert(split(BigInt(5), BigInt(5), 3) ==
      Seq(Slice(BigInt(5), BigInt(5), closed = true)))
    assert(split(BigInt(0), BigInt(10), 0).isEmpty)
  }

  test("string codec round-trips ASCII and preserves order") {
    val asciiStr = Gen.listOf(Gen.choose(1.toChar, 127.toChar)).map(_.mkString)
    forSamples(asciiStr) { s =>
      assert(bigInt2String(string2BigInt(s)) == s)
    }
    forSamples(Gen.zip(asciiStr, asciiStr)) { case (a, b) =>
      // base-128 order agrees with lexicographic order at equal lengths
      if (a.length == b.length)
        assert((string2BigInt(a) < string2BigInt(b)) == (a < b))
    }
    intercept[IllegalArgumentException](string2BigInt("héllo"))
  }

  test("predicateSql shape matches the reference scan predicate") {
    val s = split(BigInt(1), BigInt(100), 2)
    val sql = predicateSql("k", s, _.toString)
    assert(sql == Seq("k >= 1 and k < 51", "k >= 51 and k <= 100"))
  }

  test("time split scan keeps intra-unit rows (closed bound = true max)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // max has intra-day time: floor(max)*day would drop it
    val df = Seq("2024-01-01 00:00:00", "2024-01-03 15:30:00",
        "2024-01-07 23:59:59").toDF("s")
      .select(to_timestamp($"s").as("t"))
    assert(RangeSplitter.splitScanTime(df, "t", 3).count() == 3)
    assert(RangeSplitter.splitScanTime(df, "t", 1).count() == 3)
  }

  test("string split scan partitions fixed-width keys exactly") {
    val cust = Tables.customer(spark, Sf0)
    val out = RangeSplitter.splitScanString(cust, "c_name", 5)
    assert(out.count() == cust.count())
    // a partition, not just a cover: no row matched twice
    assert(out.select("c_custkey").distinct().count() == cust.count())
  }

  test("splitScan over lineitem equals the plain scan") {
    val li = Tables.lineitem(spark, Sf0)
    val got = RangeSplitter.splitScan(li, "l_orderkey", 8).count()
    assert(got == li.count())
  }

  test("nanos split: exact partition at ns accuracy incl. negative keys") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // every accuracy tier partitions the events table exactly (a
    // partition, not just a cover: event_id matched exactly once)
    val ev = Tables.events(spark, Sf0)
    for (acc <- Seq("ns", "us", "s", "day")) {
      val out = RangeSplitter.splitScanNanos(ev, "ts", 6, acc)
      assert(out.count() == ev.count(), s"accuracy=$acc")
      assert(out.select("event_id").distinct().count() == ev.count(),
        s"accuracy=$acc")
    }
    // pre-epoch nanos with sub-unit components: floor quantization must
    // keep the true min/max rows at a coarse accuracy
    val neg = Seq(-86400000000001L, -1L, 0L, 1L, 86400000000001L)
      .toDF("ts")
    val outNeg = RangeSplitter.splitScanNanos(neg, "ts", 3, "day")
    assert(outNeg.count() == 5)
    assert(outNeg.distinct().count() == 5)
    // unit table mirrors split.go:312-327; unknown accuracy rejects
    assert(AccuracyNanos("ns") == 1L && AccuracyNanos("us") == 1000L &&
      AccuracyNanos("day") == 86400000000000L)
    intercept[IllegalArgumentException](
      RangeSplitter.splitScanNanos(neg, "ts", 2, "fortnight"))
  }
}
