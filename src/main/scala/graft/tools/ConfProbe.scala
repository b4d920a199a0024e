package graft.tools

import org.apache.spark.sql.SparkSession

/** Checks that a bare session (no graft configs) can still run
  * SparkEntry.entry — the driver's smoke-check constructs its own
  * session.
  */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = graft.SparkEntry.entry(spark).collect()
    println(s"[confprobe] entry rows=${rows.length} first=${rows.headOption}")
    spark.stop()
  }
}
