package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import graft.{SparkEntry, Tables}

/** Scan every oracle-eligible query's OUTPUT SCHEMA for types that the
  * driver's pandas-based compare degrades or rejects (see VERDICT r6:
  * DuckDB HUGEINT/DECIMAL(38)/DECIMAL(30,16) → float64; array cells are
  * unhashable). Prints one line per risky column. Dev probe behind the
  * OracleDtypeSpec gate.
  */
object DtypeScan {
  def risky(dt: DataType): Option[String] = dt match {
    case _: ArrayType  => Some("array (pandas cannot sort/hash ndarray cells)")
    case _: MapType    => Some("map (pandas object cells)")
    case _: StructType => Some("struct (pandas object cells)")
    case BinaryType    => Some("binary (bytes cells)")
    case d: DecimalType if d.precision > 15 =>
      Some(s"decimal(${d.precision},${d.scale}) exceeds float64 53-bit mantissa on the DuckDB side")
    case d: DecimalType if d.scale > 0 =>
      Some(s"decimal(${d.precision},${d.scale}) renders with trailing zeros on Spark, float on DuckDB")
    case _ => None
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = Tables.configure(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (SparkEntry.oracleSql.contains(name)) {
        val schema = fn(spark, sfDir).schema
        schema.fields.foreach { f =>
          risky(f.dataType).foreach { why =>
            bad += 1
            println(s"[dtype] $name.${f.name}: $why")
          }
        }
      }
    }
    println(s"[dtype] risky columns: $bad")
    spark.stop()
  }
}
