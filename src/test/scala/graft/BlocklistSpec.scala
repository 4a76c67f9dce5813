package graft

import graft.functions.{AcAutomaton, AhoCorasickFunctions}
import graft.operators.Scrub
import org.apache.spark.sql.functions._

/** Pins the Aho-Corasick blocklist matcher: every (pattern, start)
  * occurrence counted (self-overlap, nesting, sub-word alignment),
  * brute-force parity on adversarial seeded strings, whole-stage
  * codegen presence, and the keep-filter semantics incl. NULL text. */
class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private def bruteCounts(t: String, pats: Seq[String]): Seq[Long] =
    pats.map { p =>
      (0 to t.length - p.length)
        .count(i => t.regionMatches(i, p, 0, p.length)).toLong
    }

  test("every (pattern, start) occurrence counts: overlap and nesting") {
    val auto = new AcAutomaton(
      Array("aa", "aaa", "ab", "ba").map(_.getBytes("UTF-8")))
    val got = auto.countAll(
      org.apache.spark.unsafe.types.UTF8String.fromString("aaabab"))
    // aa at 0,1; aaa at 0; ab at 2,4; ba at 3
    assert(got.toSeq == Seq(2L, 1L, 2L, 1L))
  }

  test("brute-force parity on seeded adversarial strings") {
    val pats = Seq("aa", "aaa", "aab", "ba", "abab", "b")
    val rnd = new scala.util.Random(41)
    val texts = (1 to 200).map(_ =>
      (1 to (1 + rnd.nextInt(60))).map(_ =>
        if (rnd.nextBoolean()) 'a' else 'b').mkString)
    val auto = new AcAutomaton(pats.map(_.getBytes("UTF-8")).toArray)
    texts.foreach { t =>
      val got = auto.countAll(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)).toSeq
      assert(got == bruteCounts(t, pats), s"text: $t")
    }
  }

  test("expression runs inside WholeStageCodegen and matches eval") {
    val df = Seq((1L, "the table scan merge scan"), (2L, "no hits"),
      (3L, null.asInstanceOf[String])).toDF("id", "t")
    val pats = Seq("table scan", "scan merge", "an")
    val q = df.repartition(2).select($"id",
      AhoCorasickFunctions.multi_pattern_counts($"t", pats).as("c"))
    q.collect() // finalize the adaptive plan before inspecting it
    // '*(n)' is the WholeStageCodegen marker in the simple plan string;
    // a CodegenFallback expression would print an unstarred Project
    assert(q.queryExecution.executedPlan.toString
      .contains("*(1) Project"))
    val rows = q.orderBy($"id").collect()
    assert(rows(0).getSeq[Long](1) == Seq(1L, 1L, 2L))
    assert(rows(1).getSeq[Long](1) == Seq(0L, 0L, 0L))
    assert(rows(2).isNullAt(1))
  }

  test("blocklistHits explodes only matches; blocklistKeep keeps " +
      "clean + NULL rows") {
    val df = Seq((1L, "a table scan here"), (2L, "clean text"),
      (3L, null.asInstanceOf[String])).toDF("id", "t")
    val hits = Scrub.blocklistHits(df, $"id", $"t",
        Seq("table scan", "zzz"))
      .as[(Long, String, Long)].collect().toSeq
    assert(hits == Seq((1L, "table scan", 1L)))
    val kept = Scrub.blocklistKeep(df, $"t", Seq("table scan", "zzz"))
      .select($"id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 3L))
  }

  test("multibyte patterns align on character boundaries (UTF-8 " +
      "self-synchronization)") {
    val auto = new AcAutomaton(
      Array("é", "éé", "e").map(_.getBytes("UTF-8")))
    val got = auto.countAll(
      org.apache.spark.unsafe.types.UTF8String.fromString("éée")).toSeq
    assert(got == Seq(2L, 1L, 1L))
  }
}
