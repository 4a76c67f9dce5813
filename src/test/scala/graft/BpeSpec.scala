package graft

import graft.functions.BpeFunctions
import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE training/encoding parity against a transparent single-node
  * reference implementation (direct transcription of the Sennrich 2016
  * pseudocode), plus expression edge cases and the partitioning-
  * invariance claim of the deterministic argmax. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- single-node reference: the classic dict-of-words algorithm ----
  private def refTrain(corpus: Seq[String], nMerges: Int)
      : Seq[(String, String)] = {
    var vocab: Map[List[String], Long] = corpus.flatMap(_.split(" "))
      .filter(_.nonEmpty).groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString).toList :+ Bpe.EndMark) -> ws.size.toLong
      }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((sym, c) <- vocab; p <- sym.zip(sym.tail))
        counts(p) = counts.getOrElse(p, 0L) + c
      // tie-break identical to the engine: weight DESC then pair ASC
      val best = counts.toSeq
        .sortBy { case ((a, b), w) => (-w, a, b) }.headOption
      best match {
        case Some((pair, w)) if w >= 2 =>
          merges += pair
          vocab = vocab.map { case (sym, c) => (refMerge(sym, pair), c) }
            .groupBy(_._1).map { case (k, vs) => k -> vs.values.sum }
        case _ => done = true
      }
    }
    merges.toSeq
  }

  private def refMerge(sym: List[String], p: (String, String))
      : List[String] = sym match {
    case a :: b :: rest if a == p._1 && b == p._2 =>
      (a + b) :: refMerge(rest, p)
    case a :: rest => a :: refMerge(rest, p)
    case Nil => Nil
  }

  private def refEncode(word: String, merges: Seq[(String, String)])
      : List[String] =
    merges.foldLeft(word.map(_.toString).toList :+ Bpe.EndMark)(refMerge)

  private val corpus = Seq(
    "low low low low low", "lower lower newest newest",
    "newest newest newest newest widest widest widest", "low lower newest")

  test("train matches the single-node reference merges exactly") {
    val docs = corpus.toDF("text")
    assert(Bpe.train(docs, col("text"), 8) == refTrain(corpus, 8))
  }

  test("merge list is partitioning-invariant") {
    val docs = corpus.toDF("text")
    val one = Bpe.train(docs.repartition(1), col("text"), 6)
    val eight = Bpe.train(docs.repartition(8), col("text"), 6)
    assert(one == eight && one.nonEmpty)
  }

  test("tokens match reference encode per word, concatenated in order") {
    val docs = corpus.toDF("text")
    val merges = Bpe.train(docs, col("text"), 8)
    val got = docs.select(Bpe.tokens(col("text"), merges).as("t"))
      .as[Seq[String]].collect().toSeq
    val want = corpus.map(_.split(" ").filter(_.nonEmpty).toSeq
      .flatMap(w => refEncode(w, merges)))
    assert(got == want)
  }

  test("merge properties: content-preserving, shrinking, matches reference") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val syms = org.scalacheck.Gen.listOf(
      org.scalacheck.Gen.oneOf("a", "b", "c", "d"))
    val pairs = org.scalacheck.Gen.zip(
      org.scalacheck.Gen.oneOf("a", "b", "c", "d"),
      org.scalacheck.Gen.oneOf("a", "b", "c", "d"))
    (0 until 500).foreach { _ =>
      for (s <- syms.sample; (a, b) <- pairs.sample) {
        val in = new GenericArrayData(
          s.map(x => UTF8String.fromString(x)).toArray[Any])
        val out = graft.functions.BpeUtil.mergePair(in,
          UTF8String.fromString(a), UTF8String.fromString(b),
          UTF8String.fromString(a + b))
        val got = (0 until out.numElements())
          .map(out.getUTF8String(_).toString)
        assert(got == refMerge(s.toList, (a, b)), s"$s merge ($a,$b)")
        assert(got.mkString == s.mkString, "content must be preserved")
        assert(got.size <= s.size)
      }
    }
  }

  test("merge expression: left-to-right, non-overlapping (aaa -> [aa, a])") {
    val r = Seq(Seq("a", "a", "a")).toDF("sym")
      .select(BpeFunctions.bpe_merge(col("sym"), "a", "a").as("m"))
      .as[Seq[String]].head()
    assert(r == Seq("aa", "a"))
  }

  test("encode stops early on single-symbol sequences and applies ranks in order") {
    // merges (a,b)->ab then (ab,c)->abc: rank order must cascade
    val r = Seq(Seq("a", "b", "c")).toDF("sym")
      .select(BpeFunctions.bpe_encode(col("sym"),
        Seq(("a", "b"), ("ab", "c"))).as("m"))
      .as[Seq[String]].head()
    assert(r == Seq("abc"))
    val single = Seq(Seq("x")).toDF("sym")
      .select(BpeFunctions.bpe_encode(col("sym"),
        Seq(("a", "b"))).as("m"))
      .as[Seq[String]].head()
    assert(single == Seq("x"))
  }
}
