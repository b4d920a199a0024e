package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object BrjProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.Tables.events(spark, d)
      .select(col("user_id"), expr("unix_micros(ts)").as("t"))
    val win = graft.Tables.events(spark, d).select(to_date(col("ts")).as("day")).distinct()
      .withColumn("w_start", expr("unix_micros(cast(day as timestamp)) + 79200000000"))
      .withColumn("w_end", expr("unix_micros(cast(day as timestamp)) + 82800000000"))
    println("n_windows=" + win.count())
    def time(label: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        println(f"[brj] $label run$i ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
      }
    }
    time("custom BroadcastRangeJoin") {
      graft.operators.Joins.broadcastRangeJoin(ev, win, "t", "w_start", "w_end").count()
    }
    time("Spark BNLJ") {
      ev.crossJoin(broadcast(win))
        .filter(col("t") >= col("w_start") && col("t") <= col("w_end")).count()
    }
    // the regime the operator exists for: MANY intervals
    val win2 = graft.Tables.events(spark, d).filter(col("event_id") % 20 === 0)
      .select(col("event_id").as("iv_id"), expr("unix_micros(ts)").as("w_start"),
        expr("unix_micros(ts) + ((event_id % 7) + 1) * 60000000").as("w_end"))
    println("n_windows2=" + win2.count())
    time("custom BRJ 5k intervals") {
      graft.operators.Joins.broadcastRangeJoin(ev, win2, "t", "w_start", "w_end").count()
    }
    time("Spark BNLJ 5k intervals") {
      ev.crossJoin(broadcast(win2))
        .filter(col("t") >= col("w_start") && col("t") <= col("w_end")).count()
    }
    spark.stop()
  }
}
