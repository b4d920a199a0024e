package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.functions.{VariantFunctions => vf}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  private val SF0001 = "/root/testdata/sf0.001"

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * SURVEY §7.2's end-to-end slice: JSON → variant → typed extraction →
    * aggregate → sort.
    */
  def entry(spark: SparkSession): DataFrame =
    Tables.events(spark, SF0001)
      .withColumn("v", vf.variant_from_json(col("props")))
      .groupBy(col("event_type"))
      .agg(sum(vf.variant_get(col("v"), "$.k", LongType)).as("k_sum"))
      .orderBy(col("event_type"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queryMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleMap
}
