package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{VariantFunctions => vf}
object BmProbe {
  def time(label: String)(f: => Unit): Unit = {
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"[bmprobe] $label%-28s ${ts.min}%.3f s")
  }
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val o = Tables.orders(spark, d)
    o.count()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    time("scan+count") { noop(o.groupBy(expr("CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT)").as("ym"), expr("day(o_orderdate)").as("dom")).agg(count(lit(1)).as("n"))) }
    time("daily countDistinct") { noop(o.groupBy(expr("CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT)").as("ym"), expr("day(o_orderdate)").as("dom")).agg(countDistinct(col("o_custkey")).as("n"))) }
    time("daily bitmap build") { noop(o.groupBy(expr("CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT)").as("ym"), expr("day(o_orderdate)").as("dom")).agg(vf.bitmap_agg(col("o_custkey")).as("bm"))) }
    val daily = o.groupBy(expr("CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT)").as("ym"), expr("day(o_orderdate)").as("dom")).agg(vf.bitmap_agg(col("o_custkey")).as("bm"))
    time("full rollup") { noop(daily.groupBy(col("ym")).agg(vf.bitmap_cardinality(vf.bitmap_or_agg(col("bm"))).as("n_cust"), count(lit(1)).as("n_days")).orderBy(col("ym"))) }
    spark.stop()
  }
}
