package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The feature index `spark.ml`'s `HashingTF` assigns a term — exposed
  * as a scalar expression so a model trained on HashingTF features can
  * be SCORED by a declarative plan (coefficient-literal lookup per
  * gram) without shipping the model object into task closures.
  *
  * Delegates to the PUBLIC `HashingTF.indexOf`, so the mapping is the
  * real one by construction. (It is NOT SQL's `hash()`: ml hashes
  * strings with murmur3 `hashUnsafeBytes2`, the SQL expression with the
  * lenient `hashUnsafeBytes` — same seed, different tail mixing; parity
  * against `model.transform` is spec-asserted.) */
object MlHashUtil {
  def make(numFeatures: Int): org.apache.spark.ml.feature.HashingTF =
    new org.apache.spark.ml.feature.HashingTF().setNumFeatures(numFeatures)

  def index(tf: org.apache.spark.ml.feature.HashingTF,
      term: UTF8String): Int = tf.indexOf(term.toString)

  /** Fused unigram+bigram linear margin over one token array. A null
    * element contributes nothing and breaks bigram adjacency (the
    * tokenizer paths never produce one, but the expression accepts any
    * array<string> — a null must not NPE the task). */
  def margin(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      tf: org.apache.spark.ml.feature.HashingTF, coefs: Array[Double],
      intercept: Double): Double = {
    val n = arr.numElements()
    var s = intercept
    var prev: String = null
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) prev = null
      else {
        val t = arr.getUTF8String(i).toString
        s += coefs(tf.indexOf(t))
        if (prev != null) s += coefs(tf.indexOf(prev + " " + t))
        prev = t
      }
      i += 1
    }
    s
  }
}

/** `ml_term_index(term)` — HashingTF's bucket for the term. */
case class MlTermIndex(child: Expression, numFeatures: Int)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if numFeatures > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"numFeatures must be > 0, got $numFeatures")
    case t => TypeCheckResult.TypeCheckFailure(
      s"ml_term_index needs a string term, got ${t.simpleString}")
  }

  @transient private lazy val tf = MlHashUtil.make(numFeatures)

  override def nullSafeEval(input: Any): Any =
    MlHashUtil.index(tf, input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mlHashTf", tf,
      "org.apache.spark.ml.feature.HashingTF")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MlHashUtil.index($ref, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MlTermIndex = copy(child = newChild)
}

object MlHashFunctions {
  def ml_term_index(term: Column, numFeatures: Int): Column =
    ColumnBridge.column(MlTermIndex(ColumnBridge.expression(term),
      numFeatures))

  def linear_text_margin(tokens: Column, coefs: Array[Double],
      intercept: Double, numFeatures: Int): Column =
    ColumnBridge.column(LinearTextMargin(ColumnBridge.expression(tokens),
      coefs, intercept, numFeatures))
}

/** `linear_text_margin(tokens)` — the fused scoring kernel for a linear
  * model over hashed unigram+bigram counts: one JVM pass over the token
  * array accumulates `intercept + coef[index(tok)] +
  * coef[index(prev + ' ' + tok)]`, exactly the dot product of the
  * model's coefficients with the HashingTF count vector of the gram
  * expansion (parity vs model.transform spec-asserted at 1e-12 — the
  * accumulation order matches the gram array's: unigram i, then bigram
  * (i-1, i)). Replaces an interpreted per-gram HOF chain on the
  * corpus-scoring hot path. */
case class LinearTextMargin(child: Expression, coefs: Array[Double],
    intercept: Double, numFeatures: Int) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if coefs.length == numFeatures =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"coefs length ${coefs.length} != numFeatures $numFeatures")
    case t => TypeCheckResult.TypeCheckFailure(
      s"linear_text_margin needs array<string> tokens, got ${t.simpleString}")
  }

  @transient private lazy val tf = MlHashUtil.make(numFeatures)

  override def nullSafeEval(input: Any): Any =
    MlHashUtil.margin(input.asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData], tf, coefs, intercept)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tfRef = ctx.addReferenceObj("mlHashTf", tf,
      "org.apache.spark.ml.feature.HashingTF")
    val cRef = ctx.addReferenceObj("marginCoefs", coefs, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MlHashUtil.margin($c, $tfRef, " +
        s"$cRef, ${intercept}D);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : LinearTextMargin = copy(child = newChild)
}
