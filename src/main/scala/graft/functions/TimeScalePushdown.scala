package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Catalyst rule: push range predicates through the micros→nanos
  * normalization so they reach the parquet scan as plain column filters.
  *
  * [[graft.Tables.normalizeEventTs]] rewrites a physical-timestamp event
  * column to the epoch-nanos long the whole query surface computes on:
  * `unix_micros(cast(ts as timestamp)) * 1000`. Any range predicate a
  * query then places on the nanos value — every split-scan branch does
  * exactly this — lands in the scan's DataFilters as an EXPRESSION over
  * `ts`, which the parquet source cannot translate: no PushedFilters, no
  * row-group stats pruning, full-file reads. At 100 TB a time-sliced
  * scan that stops pruning is the difference between reading a day and
  * reading a decade.
  *
  * The transform is strictly monotone and exactly invertible on longs,
  * so `unix_micros(c)*1000 cmp L` rewrites to `c cmp' L'` with floor/
  * ceil-divided literal micros — an equivalence that holds per-row
  * INCLUDING null (`c` is null exactly when the expression is), so the
  * rewrite is safe in any boolean context (NOT/OR included). Equality
  * only rewrites when the literal is 1000-divisible (otherwise the
  * predicate can never hold, but `null = L` must stay null — leave it).
  * The NTZ form `unix_micros(cast(ntz as timestamp))` additionally
  * requires a fixed zero-offset session zone (graft sessions pin UTC),
  * because only then is the NTZ→TZ cast the identity on the underlying
  * micros; a DST zone shifts by wall-clock rules and is not rewritten.
  */
object TimeScalePushdown extends Rule[LogicalPlan] {

  private def isFixedUtc(tz: Option[String]): Boolean = tz.exists { z =>
    try {
      val rules = java.time.ZoneId.of(z).getRules
      rules.isFixedOffset &&
        rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds == 0
    } catch { case _: Exception => false }
  }

  /** Match `unix_micros(col) * 1000` (either operand order) and return
    * the underlying column plus the literal type to compare it as. */
  private object NanosOfCol {
    def unapply(e: Expression): Option[(Expression, DataType)] = {
      val um = e match {
        case Multiply(u: UnixMicros, Literal(1000L, LongType), _) => Some(u)
        case Multiply(Literal(1000L, LongType), u: UnixMicros, _) => Some(u)
        case _ => None
      }
      um.flatMap { u =>
        u.child match {
          case c: Cast if c.dataType == TimestampType &&
              c.child.dataType == TimestampNTZType &&
              isFixedUtc(c.timeZoneId) =>
            Some((c.child, TimestampNTZType))
          case a if a.dataType == TimestampType =>
            Some((a, TimestampType))
          case _ => None
        }
      }
    }
  }

  private def floorDiv(l: Long): Long = Math.floorDiv(l, 1000L)
  private def ceilDiv(l: Long): Long =
    if (l > Long.MaxValue - 1000L) Long.MaxValue / 1000L
    else Math.floorDiv(l + 999L, 1000L)

  private def lit(us: Long, t: DataType): Literal = Literal(us, t)

  private val rewriteCmp: PartialFunction[Expression, Expression] = {
    // nanos-expr cmp literal
    case GreaterThanOrEqual(NanosOfCol(c, t), Literal(l: Long, LongType)) =>
      GreaterThanOrEqual(c, lit(ceilDiv(l), t))
    case GreaterThan(NanosOfCol(c, t), Literal(l: Long, LongType)) =>
      GreaterThan(c, lit(floorDiv(l), t))
    case LessThanOrEqual(NanosOfCol(c, t), Literal(l: Long, LongType)) =>
      LessThanOrEqual(c, lit(floorDiv(l), t))
    case LessThan(NanosOfCol(c, t), Literal(l: Long, LongType)) =>
      LessThan(c, lit(ceilDiv(l), t))
    case EqualTo(NanosOfCol(c, t), Literal(l: Long, LongType))
        if l % 1000L == 0 =>
      EqualTo(c, lit(l / 1000L, t))
    // literal cmp nanos-expr (mirrored)
    case GreaterThanOrEqual(Literal(l: Long, LongType), NanosOfCol(c, t)) =>
      LessThanOrEqual(c, lit(floorDiv(l), t))
    case GreaterThan(Literal(l: Long, LongType), NanosOfCol(c, t)) =>
      LessThan(c, lit(ceilDiv(l), t))
    case LessThanOrEqual(Literal(l: Long, LongType), NanosOfCol(c, t)) =>
      GreaterThanOrEqual(c, lit(ceilDiv(l), t))
    case LessThan(Literal(l: Long, LongType), NanosOfCol(c, t)) =>
      GreaterThan(c, lit(floorDiv(l), t))
    case EqualTo(Literal(l: Long, LongType), NanosOfCol(c, t))
        if l % 1000L == 0 =>
      EqualTo(c, lit(l / 1000L, t))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val newCond = cond transformUp {
        case e if rewriteCmp.isDefinedAt(e) => rewriteCmp(e)
      }
      if (newCond.fastEquals(cond)) f else Filter(newCond, child)
  }
}
