package graft

import graft.functions.ShingleFunctions._
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Native byte-slice shingling vs the declarative HOF reference —
  * identical arrays on the fixtures and on adversarial edge cases, and
  * hash parity with xxhash64 over the sliced strings. */
class ShingleExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, Sf0)

  private val edges = Seq(
    "",                       // split("") = [""] -> no 3-shingles
    "one",                    // < n tokens
    "one two",                // < n tokens
    "one two three",          // exactly n
    "a  b   c d",             // repeated spaces -> empty tokens kept
    " leading and trailing ", // boundary empties
    "καλή μέρα UTF-8 ありがとう world", // multibyte
    "x " * 500 + "x")         // long doc

  test("word_shingles equals the HOF reference on fixtures + edge cases") {
    val ref = TextAnalysis.shinglesOf(split(col("text"), " "), 3)
    val bad = docs.select(col("text"))
      .union(edges.toDF("text"))
      .select(when(word_shingles(col("text"), 3) === ref, 0).otherwise(1).as("x"))
      .agg(sum($"x")).head.getLong(0)
    assert(bad == 0)
  }

  test("word_shingle_hashes equals xxhash64 over the shingle strings") {
    val ref = transform(TextAnalysis.shinglesOf(split(col("text"), " "), 3),
      s => xxhash64(s))
    val bad = docs.select(col("text"))
      .union(edges.toDF("text"))
      .select(when(word_shingle_hashes(col("text"), 3) === ref, 0)
        .otherwise(1).as("x"))
      .agg(sum($"x")).head.getLong(0)
    assert(bad == 0)
  }

  test("interpreted eval path and type checks") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = graft.functions.WordShingles(Literal("a b c d"), 2)
    val arr = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(arr.numElements() == 3)
    assert(arr.getUTF8String(0).toString == "a b")
    assert(arr.getUTF8String(2).toString == "c d")
    assert(!graft.functions.WordShingles(Literal(1), 2)
      .checkInputDataTypes().isSuccess)
    assert(!graft.functions.WordShingleHashes(Literal("x"), 0)
      .checkInputDataTypes().isSuccess)
    // null text -> null array
    val df = Seq((1L, null: String)).toDF("id", "text")
    assert(df.select(word_shingles(col("text"), 3)).head.isNullAt(0))
  }

  test("property: native equals HOF on random space/unicode strings") {
    import org.scalacheck.Gen
    val alphabet = Gen.oneOf(' ', ' ', 'a', 'b', 'é', 'あ', '0', '|')
    val texts = Gen.chooseNum(0, 40)
      .flatMap(n => Gen.listOfN(n, alphabet).map(_.mkString))
    val sample = (0 until 400).flatMap(_ => texts.sample)
    val df = sample.toDF("text")
    (1 to 4).foreach { n =>
      val ref = TextAnalysis.shinglesOf(split(col("text"), " "), n)
      val bad = df.select(
        when(word_shingles(col("text"), n) === ref, 0).otherwise(1).as("x"),
        when(word_shingle_hashes(col("text"), n) ===
          transform(ref, s => xxhash64(s)), 0).otherwise(1).as("y"))
        .agg(sum($"x" + $"y")).head.getLong(0)
      assert(bad == 0, s"mismatch at n=$n")
    }
  }

  test("n=1 degenerates to tokens") {
    val bad = docs.select(col("text"))
      .select(when(word_shingles(col("text"), 1) === split(col("text"), " "), 0)
        .otherwise(1).as("x"))
      .agg(sum($"x")).head.getLong(0)
    assert(bad == 0)
  }
}
