package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan-shape audit over the query set: counts join strategies,
  * exchanges, and cartesian products so scale anti-patterns surface
  * before the driver's bench does. Run:
  * `sbt "runMain graft.tools.PlanScan [sfDir]"`.
  */
object PlanScan {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    graft.Queries.all.filterNot(_.name.startsWith("s_")).foreach { q =>
      val p = q.build(spark, d).queryExecution.executedPlan.toString
      val smj = "SortMergeJoin".r.findAllIn(p).length
      val bhj = "BroadcastHashJoin".r.findAllIn(p).length
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
      val cart = "CartesianProduct".r.findAllIn(p).length
      val exch = "Exchange".r.findAllIn(p).length
      println(f"[plan] ${q.name}%-22s SMJ=$smj BHJ=$bhj BNLJ=$bnlj CART=$cart Exch=$exch")
    }
    spark.stop()
  }
}
