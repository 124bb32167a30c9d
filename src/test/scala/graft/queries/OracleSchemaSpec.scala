package graft.queries

import graft.TestSpark
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Guards the NEXT dtype-mismatch class before it ships (round-8 lesson:
  * 23 driver-gate rows went red on oracle output typing the local gate
  * could not see). The driver's harness materializes both sides through
  * pandas, which cannot faithfully represent three type families:
  *
  *  - nested types (array/map/struct) — `sort_values` throws on ndarray
  *    cells (the events_holt_winters round-8 error);
  *  - DECIMAL — object-dtype `decimal.Decimal` cells render unlike the
  *    double the Spark side writes;
  *  - (DuckDB-side) HUGEINT — coerced to float64, rendering `144.0` vs
  *    Spark's `144`. The Spark side of that class is unrepresentable here,
  *    so tools/check.py rejects it via DESCRIBE; this spec pins the Spark
  *    half of the contract.
  *
  * Every oracle-gated query's OUTPUT schema must therefore be flat and
  * decimal-free. Rows-only queries (no oracle entry) are exempt — they are
  * never hashed.
  */
class OracleSchemaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def hostile(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => true
    case _: DecimalType => true
    case _ => false
  }

  test("every oracle-gated query output schema is flat and decimal-free") {
    val queries = graft.SparkEntry.queries
    // oracleSql is snapshotted BEFORE any query lambda runs, so the
    // run-captured oracles (DynamicOracles) are absent from it here —
    // include their declared names explicitly or they'd never be
    // schema-checked despite being oracle-gated at the driver.
    val gated =
      graft.SparkEntry.oracleSql.keySet ++ graft.queries.DynamicOracles.declared
    val missing = gated.diff(queries.keySet)
    assert(missing.isEmpty, s"oracles without a query: $missing")
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    gated.toSeq.sorted.foreach { name =>
      val schema =
        try queries(name)(spark, dir).schema
        finally ParityQueries.releaseSessions()
      schema.fields.foreach { f =>
        if (hostile(f.dataType))
          bad += s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(bad.isEmpty,
      s"pandas-hostile output columns in oracle-gated queries (flatten " +
        s"arrays to scalars, cast decimals to double):\n  " +
        bad.mkString("\n  "))
  }
}
