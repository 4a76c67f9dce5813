package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Catalyst rule: rewrite the declarative dot-product idiom
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (s, v) -> s + v)`
  * to the codegen'd [[FloatVectorDot]] (and the `0L` integer form to
  * [[LongVectorDot]]).
  *
  * Higher-order functions evaluate interpreted — one expression-tree walk
  * per element — so user SQL written in the natural declarative form pays
  * ~µs/element; the native expressions run the same left-to-right
  * accumulation as a primitive loop inside whole-stage codegen. Injected
  * via [[graft.GraftExtensions]] (`injectOptimizerRule`).
  *
  * Semantics caveat (why this is an extension, not a default): `zip_with`
  * null-pads when array lengths differ, making the HOF form return null,
  * while the native dot truncates to the shorter length. The rewrite
  * therefore matches the embedding-column contract (equal-length,
  * non-null vectors) that every graft similarity operator assumes.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def stripDoubleCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => stripDoubleCast(c.child)
    case other => other
  }

  /** body is `x * y` (possibly double-cast) over exactly the two lambda
    * variables, in either order. */
  private def isPairProduct(body: Expression,
      args: Seq[NamedExpression], allowCast: Boolean): Boolean = body match {
    case Multiply(l, r, _) =>
      val (sl, sr) =
        if (allowCast) (stripDoubleCast(l), stripDoubleCast(r)) else (l, r)
      val ids = args.collect { case v: NamedLambdaVariable => v.exprId }.toSet
      (sl, sr) match {
        case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
          a.exprId != b.exprId && ids == Set(a.exprId, b.exprId)
        case _ => false
      }
    case _ => false
  }

  /** body is `s + v` over exactly the two lambda variables. */
  private def isPairSum(body: Expression, args: Seq[NamedExpression]): Boolean =
    body match {
      case Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _) =>
        val ids = args.collect { case v: NamedLambdaVariable => v.exprId }.toSet
        l.exprId != r.exprId && ids == Set(l.exprId, r.exprId)
      case _ => false
    }

  /** finish lambda is the identity. */
  private def isIdentity(f: LambdaFunction): Boolean = (f.function, f.arguments) match {
    case (v: NamedLambdaVariable, Seq(a: NamedLambdaVariable)) =>
      v.exprId == a.exprId
    case _ => false
  }

  // containsNull must be false: with null slots the HOF form returns null
  // while the native dot would read them as 0 — a silent value change.
  // (Unequal lengths remain the caller's contract, as documented above;
  // null-free arrays from graft's own encoders satisfy this, parquet
  // arrays with containsNull=true fall back to the HOF form.)
  private def isNumericArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, false) => true
    case _ => false
  }

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, false) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.HIGH_ORDER_FUNCTION)) {
      case ArrayAggregate(
          ZipWith(a, b, prod: LambdaFunction),
          Literal(0.0, DoubleType), merge: LambdaFunction,
          finish: LambdaFunction)
          if isNumericArray(a) && isNumericArray(b) &&
            isPairProduct(prod.function, prod.arguments, allowCast = true) &&
            isPairSum(merge.function, merge.arguments) && isIdentity(finish) =>
        FloatVectorDot(a, b)
      case ArrayAggregate(
          ZipWith(a, b, prod: LambdaFunction),
          Literal(0L, LongType), merge: LambdaFunction,
          finish: LambdaFunction)
          if isLongArray(a) && isLongArray(b) &&
            isPairProduct(prod.function, prod.arguments, allowCast = false) &&
            isPairSum(merge.function, merge.arguments) && isIdentity(finish) =>
        LongVectorDot(a, b)
    }
}
