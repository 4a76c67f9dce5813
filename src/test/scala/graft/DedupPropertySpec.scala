package graft

import graft.operators.{Dedup, Urls}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Randomized parity for the set-similarity prefix filters and URL
  * canonicalization: on random small corpora the prefix-filtered joins
  * must be ROW-IDENTICAL to their all-postings forms (the prefix-filter
  * completeness theorem, exercised far beyond the fixture's similarity
  * structure), a naive per-pair reference must agree with both, and
  * canonicalization must be idempotent over randomized URL shapes. */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  // tiny vocabulary forces heavy shingle collisions — the hard case for
  // prefix filtering (high-df "stop shingles", near-dup pairs common)
  private val docGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 14)
    ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e"))
  } yield ws.mkString(" ")

  private def corpora(n: Int): Seq[Seq[(Long, String)]] =
    (0 until n * 3).flatMap { _ =>
      Gen.listOfN(10, docGen).sample
    }.take(n).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  private def shingleSet(t: String, k: Int): Set[Seq[String]] =
    t.split(" ").toSeq.sliding(k).filter(_.size == k).map(_.toSeq).toSet

  test("jaccardPairsPrefix == jaccardPairs == naive reference on " +
      "random high-collision corpora") {
    corpora(5).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.select($"doc_a", $"doc_b", $"n_inter", $"jaccard")
          .as[(Long, Long, Long, Double)].collect().sorted.toSeq
      val full = rows(Dedup.jaccardPairs(df, col("doc_id"), col("text"),
        k = 2, tau = 0.4))
      val pref = rows(Dedup.jaccardPairsPrefix(df, col("doc_id"),
        col("text"), k = 2, tau = 0.4))
      assert(pref == full, s"corpus: $docs")
      // naive O(n^2) reference
      val ref = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        sa = shingleSet(ta, 2); sb = shingleSet(tb, 2)
        inter = (sa & sb).size
        if inter > 0
        j = inter.toDouble / (sa.size + sb.size - inter)
        if j >= 0.4
      } yield (ia, ib, inter.toLong, j)).sorted
      assert(full == ref, s"corpus: $docs")
    }
  }

  test("containmentPairsPrefix == containmentPairs == naive reference") {
    corpora(5).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.select($"doc_a", $"doc_b", $"n_inter", $"containment")
          .as[(Long, Long, Long, Double)].collect().sorted.toSeq
      val full = rows(Dedup.containmentPairs(df, col("doc_id"),
        col("text"), k = 2, tau = 0.6))
      val pref = rows(Dedup.containmentPairsPrefix(df, col("doc_id"),
        col("text"), k = 2, tau = 0.6))
      assert(pref == full, s"corpus: $docs")
      val ref = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        sa = shingleSet(ta, 2); sb = shingleSet(tb, 2)
        inter = (sa & sb).size
        if inter > 0
        c = inter.toDouble / math.min(sa.size, sb.size)
        if c >= 0.6
      } yield (ia, ib, inter.toLong, c)).sorted
      assert(full == ref, s"corpus: $docs")
    }
  }

  test("Urls.canonicalize is idempotent over randomized URL shapes") {
    val urlGen: Gen[String] = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS")
      www <- Gen.oneOf("", "www.", "WWW.")
      host <- Gen.oneOf("ex.com", "a.b.co.uk", "News.Site.org", "10.0.0.7")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/x/y", "/x%20y")
      qs <- Gen.oneOf("", "?id=1", "?utm_source=a", "?utm_a=1&id=2&gclid=9")
      frag <- Gen.oneOf("", "#f", "#a=b")
    } yield s"$scheme://$www$host$port$path$qs$frag"
    val urls = (0 until 120).flatMap(_ => urlGen.sample).distinct
    val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
    val once = df.select($"id", Urls.canonicalize($"url").as("c"))
    val twice = once.select($"id", Urls.canonicalize($"c").as("c2"),
      $"c")
    val bad = twice.filter($"c" =!= $"c2")
      .as[(Long, String, String)].collect()
    assert(bad.isEmpty, s"non-idempotent: ${bad.take(3).toSeq}")
    // and the canonical form never keeps fragments/tracking/default junk
    val cs = once.select($"c").as[String].collect()
    cs.foreach { c =>
      assert(!c.contains("#") && !c.contains("utm_") &&
        !c.contains("gclid") && !c.contains("://www."), c)
    }
  }
}
