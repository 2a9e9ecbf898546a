package graft

import org.apache.spark.sql.types.{DataType, ArrayType, DecimalType, MapType, StructType, StructField, TimestampType, TimestampNTZType}
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.7b rule 4, enforced mechanically (round-8 verdict #2): no
  * declared query may emit DECIMAL, TIMESTAMP, or MAP in its OUTPUT schema —
  * engines, Arrow, and drivers represent wide decimals / timezone semantics
  * / map ordering differently, so those types hash-diverge at the driver
  * even when values are equal (p27's round-8 regression was exactly a
  * DECIMAL(38,0) checksum that matched cell-for-cell locally yet failed the
  * driver hash). Intermediate decimal arithmetic (HUGEINT-parity moments,
  * cross-multiplied fraction tests) stays legal — only what reaches the
  * result schema is checked.
  *
  * Builds every `SparkEntry.queries` plan at sf0.001 and walks its schema,
  * recursing into arrays and structs.
  */
class OutputSchemaRuleTest extends AnyFunSuite {

  private def banned(dt: DataType, path: String): Seq[String] = dt match {
    case _: DecimalType => Seq(s"$path: $dt")
    case _: MapType => Seq(s"$path: MAP")
    case TimestampType | TimestampNTZType => Seq(s"$path: TIMESTAMP")
    case ArrayType(et, _) => banned(et, s"$path[]")
    case StructType(fields) =>
      fields.toSeq.flatMap { case StructField(n, t, _, _) => banned(t, s"$path.$n") }
    case _ => Seq.empty
  }

  test("no DecimalType / TimestampType / MapType in any declared output schema") {
    val spark = TestSpark.spark
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      banned(q(spark, TestSpark.sf0001).schema, name)
    }
    assert(offenders.isEmpty,
      s"rule-4 banned types in output schemas:\n  ${offenders.mkString("\n  ")}")
  }
}
