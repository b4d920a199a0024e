package graft.tools
import org.apache.spark.sql.SparkSession
object FuseCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.Queries.queryMap("v_merge_patch")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.optimizedPlan.toString
    println("fused_present=" + plan.contains("variant_merge_patch_fused"))
    println("unfused_present=" + (plan.contains("variant_merge_patch(") || plan.contains("variantmergepatch")))
    val lat = graft.Queries.queryMap("q_lateral_subquery")(spark, "/root/testdata/sf0.001")
    println(lat.queryExecution.optimizedPlan.toString.split("\n").filter(_.contains("Filter")).mkString("\n"))
    spark.stop()
  }
}
