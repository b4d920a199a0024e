package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-compare dtype discipline (VERDICT r6 item 2): the driver hashes
  * query outputs through pandas, where DuckDB HUGEINT / DECIMAL(38,0) /
  * DECIMAL(30,16) degrade to float64 and array cells are unhashable —
  * the failure class behind all five round-6 reds. This gate pins the
  * SPARK side of the contract: every oracle-checked query's output schema
  * must contain only types that survive the pandas round-trip exactly
  * (integrals, double/float, string, boolean, date, timestamp, and
  * decimals that fit float64 with scale 0). The DuckDB side of the same
  * contract is checked by devcheck.py (DuckDB is driver-side only — not
  * on this classpath).
  */
class OracleDtypeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("every oracle-checked query emits only pandas-compare-safe column types") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if SparkEntry.oracleSql.contains(name) =>
        fn(spark, TestSpark.SF).schema.fields.flatMap { f =>
          tools.DtypeScan.risky(f.dataType).map(why => s"$name.${f.name}: $why")
        }
      case _ => Nil
    }
    assert(violations.isEmpty,
      "pandas-unsafe oracle output columns:\n" + violations.mkString("\n"))
  }
}
