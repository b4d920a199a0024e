package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Honest head-to-head: the custom GroupedTopK operator vs the window
  * row_number formulation, same data, same k, same total order. Run:
  * sbt "runMain graft.tools.TopKProbe [sfDir] [k]"
  *
  * The custom operator's edge is SHUFFLE VOLUME (≤ k rows per group per
  * input partition cross the wire vs every row) and the absence of a
  * full per-group sort; wall-clock at small SF is expected to be
  * comparable since local shuffles are cheap — the probe prints both
  * time and the shuffle row counts that tell the scale story.
  */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val l = Tables.lineitem(spark, d)
    l.count() // warm

    def time(label: String)(f: => Unit): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[topk] $label%-18s ${times.min}%.3f s (${times.map(t => f"$t%.3f").mkString(", ")})")
    }

    // Two regimes. High-cardinality groups (l_orderkey, ~rows/4 groups):
    // rows-per-group-per-partition ≈ 1, so the partial phase can't
    // prune — the operator degrades gracefully to window-equivalent
    // cost. Low-cardinality groups (l_returnflag, 3 groups): the
    // partial phase forwards ≤ k·groups·partitions rows and the window
    // version must SORT three whole-table partitions on three cores —
    // this is the regime the operator exists for.
    for ((label, group, orderCols) <- Seq(
      ("orderkey (hi-card)", Seq("l_orderkey"),
        Seq(l("l_quantity").desc, l("l_extendedprice").desc,
          l("l_suppkey"), l("l_partkey"), l("l_linenumber"))),
      ("returnflag (3 grp)", Seq("l_returnflag"),
        Seq(l("l_quantity").desc, l("l_extendedprice").desc, l("l_orderkey"),
          l("l_suppkey"), l("l_partkey"), l("l_linenumber"))))) {
      time(s"custom  $label") {
        graft.operators.TopK.groupedTopK(l, group, orderCols, k)
          .write.mode("overwrite").format("noop").save()
      }
      time(s"window  $label") {
        val w = Window.partitionBy(group.map(col): _*)
          .orderBy(orderCols: _*)
        l.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
          .write.mode("overwrite").format("noop").save()
      }
      // shuffle-volume evidence: rows the partial phase emits vs the
      // full input the window version must shuffle
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = graft.operators.TopK.groupedTopK(l.repartition(32), group, orderCols, k)
      val partial = df.queryExecution.executedPlan.collect {
        case e: graft.plans.GroupedTopKExec if e.partial => e
      }.head
      val pruned = partial.execute().map(_ => 1L).sum()
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      println(f"[topk] $label shuffle rows: partial emits ${pruned.toLong}, window shuffles ${l.count()}")
    }
    spark.stop()
  }
}
