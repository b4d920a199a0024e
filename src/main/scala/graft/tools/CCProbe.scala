package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CCProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cc] $tag%-20s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val pairs = t("pairs_mine") {
      graft.operators.TextQueries.exactJaccardPairs(spark, d)
        .select(col("doc_a"), col("doc_b"))
    }
    t("pairs_count") { println("  n=" + pairs.count()) }
    (1 to 3).foreach { i =>
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val (nLabels, iters) = t(s"cc_run_$i") {
        val r = graft.operators.ConnectedComponents.labelComponents(pairs)
        (r._1.collect().length, r._2)
      }
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      println(s"  labels=$nLabels iters=$iters")
    }
    spark.stop()
  }
}
