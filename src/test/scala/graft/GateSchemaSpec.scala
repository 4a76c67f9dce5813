package graft

import org.apache.spark.sql.types._

/** The decimal-gate contract (SURVEY §5): NO query in
  * [[SparkEntry.queries]] may ship a DecimalType column in its FINAL
  * schema. The driver's correctness hash converts result parquet
  * through a pandas path whose decimal handling (int128-backed for
  * precision > 18, object-backed otherwise) hashes differently from
  * Spark's parquet decimal even when every value is exactly equal —
  * the q12 HUGEINT escape generalized to the round-5 psi/kappa/IV
  * family. Internal decimal math is encouraged (exact, order-free);
  * the GATE projection must land on BIGINT/DOUBLE/VARCHAR.
  *
  * This spec builds every query's plan at sf0.001 and rejects
  * DecimalType anywhere in the final schema (top level or nested) —
  * making the escape class unshippable locally rather than
  * discoverable only in the driver's round report.
  */
class GateSchemaSpec extends SparkSpec {

  private def decimalPaths(dt: DataType, path: String): Seq[String] =
    dt match {
      case _: DecimalType => Seq(path)
      case s: StructType =>
        s.fields.flatMap(f => decimalPaths(f.dataType, s"$path.${f.name}"))
      case a: ArrayType => decimalPaths(a.elementType, s"$path[]")
      case m: MapType =>
        decimalPaths(m.keyType, s"$path<key>") ++
          decimalPaths(m.valueType, s"$path<value>")
      case _ => Nil
    }

  test("no SparkEntry query ships DecimalType in its final schema") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // building the plan is enough for schema in almost every case;
        // streaming/lake queries execute eagerly, which is fine at
        // sf0.001 — a build failure is its own (reported) offense
        val schema =
          try Right(fn(spark, Sf0).schema)
          catch { case e: Throwable => Left(e) }
        schema match {
          case Left(e) => Seq(s"$name: BUILD FAILED: $e")
          case Right(s) =>
            s.fields.flatMap(f => decimalPaths(f.dataType, f.name))
              .map(p => s"$name: $p")
        }
    }
    assert(offenders.isEmpty,
      s"final-schema DecimalType is driver-hash-hazardous; cast the " +
        s"gate projection to BIGINT/DOUBLE/VARCHAR:\n  " +
        offenders.mkString("\n  "))
  }
}
