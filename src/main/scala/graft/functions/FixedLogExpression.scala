package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Fixed-point base-2 logarithm over exact integer arithmetic — the
  * primitive that makes information-theoretic statistics (entropy, PSI
  * drift, PMI) hash-exact cross-engine. `log2_fp(x)` returns
  * `floor(2^20 * log2(x))` computed by the classical shift-and-square
  * binary-digit algorithm on 64-bit integers: no floating point, no
  * libm, so every engine that can shift and multiply 64-bit integers
  * reproduces it bit-for-bit (the DuckDB oracles replay it as a
  * 20-step recursive CTE). Truncation error is < 2 units of 2^-20
  * (~2e-6 in log2), far below any statistical decision threshold,
  * and — unlike `ln()` — identical everywhere.
  *
  * Algorithm (all ops exact on Long):
  *   ip  = floor(log2 x)            (bit length - 1)
  *   a   = mantissa in Q30: floor(x * 2^30 / 2^ip), in [2^30, 2^31)
  *   20x: a = (a*a) >> 30; emit bit [a >= 2^31], halving a if set
  *   result = (ip << 20) | bits
  * `a*a < 2^62` always (a < 2^31 at each squaring), so the loop never
  * leaves signed-64 range.
  */
object FixedLog {
  /** Fractional bits of the fixed point: results are in units of
    * 2^-20 ~ 1e-6 of a bit (log2). */
  val FracBits: Int = 20

  /** floor(2^20 * log2(x)) for x >= 1; callers guard the domain. */
  def log2Fp(x: Long): Long = {
    var a = {
      val ip = 63 - java.lang.Long.numberOfLeadingZeros(x)
      if (ip <= 30) x << (30 - ip) else x >> (ip - 30)
    }
    val ip: Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var acc = 0L
    var i = 0
    while (i < FracBits) {
      a = (a * a) >> 30
      if (a >= (1L << 31)) { acc = 2 * acc + 1; a >>= 1 }
      else acc = 2 * acc
      i += 1
    }
    (ip << FracBits) + acc
  }

  /** The DuckDB replay of [[log2Fp]] as SQL: a 20-step recursive CTE
    * over the distinct values of `srcSql` (a one-column subquery or CTE
    * name whose column is `x`, BIGINT >= 1). Produces a relation
    * `lg<suffix> (x, l)` — join it back wherever the expression's
    * result is needed; `suffix` lets several instances coexist in one
    * WITH clause (e.g. one per unrolled training round). Kept next to
    * the Scala algorithm so the two can only drift in review. */
  def duckdbCte(srcSql: String, suffix: String = ""): String =
    s"""lg0$suffix AS (SELECT x, CAST(length(bin(x))-1 AS BIGINT) AS ip,
       |    CAST(CASE WHEN length(bin(x))-1 <= 30
       |      THEN x << (30-(length(bin(x))-1))
       |      ELSE x >> ((length(bin(x))-1)-30) END AS BIGINT) AS a,
       |    CAST(0 AS BIGINT) AS acc, 0 AS i
       |  FROM (SELECT DISTINCT x FROM $srcSql)),
       |lgr$suffix AS (
       |  SELECT x, ip, a, acc, i FROM lg0$suffix
       |  UNION ALL
       |  SELECT x, ip,
       |    CASE WHEN ((a*a) >> 30) >= 2147483648
       |      THEN ((a*a) >> 30) >> 1 ELSE (a*a) >> 30 END,
       |    CASE WHEN ((a*a) >> 30) >= 2147483648
       |      THEN 2*acc+1 ELSE 2*acc END,
       |    i+1 FROM lgr$suffix WHERE i < ${FracBits}),
       |lg$suffix AS (SELECT x, ip*${1L << FracBits} + acc AS l
       |  FROM lgr$suffix WHERE i = ${FracBits})""".stripMargin
}

/** `log2_fp(x)`: floor(2^20*log2(x)) for x >= 1, NULL for x <= 0 or
  * NULL — see [[FixedLog.log2Fp]]. Codegen'd (stays inside
  * whole-stage codegen; the loop lives in the static JVM method). */
case class Log2Fp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"log2_fp needs a bigint column, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[Long]
    if (x <= 0L) null else FixedLog.log2Fp(x)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c > 0L) {
         |  ${ev.value} = graft.functions.FixedLog.log2Fp($c);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression)
      : Log2Fp = copy(child = newChild)
}

object FixedLogFunctions {
  /** Column API for [[Log2Fp]]. */
  def log2_fp(x: Column): Column =
    ColumnBridge.column(Log2Fp(ColumnBridge.expression(x)))
}
