package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** A/B probe for the q_sliding_distinct inverse-scaling found by
  * ScaleProbe round 8 (2.15 s @ c4 → 10.36 s @ c32 on 16x events):
  * compares the direct bitmap pre-aggregate (every map task builds
  * partial bitmaps for ALL ~3600 (type, hour) groups) against a
  * dedup-first formulation (exact codegen'd distinct on
  * (type, hour, user) rows, then repartition on (type, hour) so each
  * group's bitmap is built exactly once, in one task).
  * Run: `sbt "runMain graft.tools.SlideProbe [sfDir]"`.
  */
object SlideProbe {
  private def amplified(spark: SparkSession, d: String): DataFrame = {
    val p = spark.sparkContext.defaultParallelism
    graft.Tables.events(spark, d).repartition(p)
      .withColumn("rep", explode(expr("sequence(1, 16)")))
      .withColumn("user_id", col("user_id") + col("rep") * 1000000L)
  }

  private def direct(e: DataFrame): DataFrame = {
    val vfn = graft.functions.VariantFunctions
    val hourly = e.groupBy(col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("h_epoch"))
      .agg(vfn.bitmap_agg(col("user_id")).as("bm"), count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h_epoch"))
      .rangeBetween(-23L * 3600L, 0L)
    hourly.withColumn("n_users",
        vfn.bitmap_cardinality(vfn.bitmap_or_agg(col("bm")).over(w)))
      .groupBy().agg(sum(col("n_users")).as("s"), sum(col("n_events")).as("n"))
  }

  private def dedupFirst(e: DataFrame): DataFrame = {
    val vfn = graft.functions.VariantFunctions
    val perUser = e.groupBy(col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("h_epoch"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val hourly = perUser.repartition(col("event_type"), col("h_epoch"))
      .groupBy(col("event_type"), col("h_epoch"))
      .agg(vfn.bitmap_agg(col("user_id")).as("bm"), sum(col("n")).as("n_events"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h_epoch"))
      .rangeBetween(-23L * 3600L, 0L)
    hourly.withColumn("n_users",
        vfn.bitmap_cardinality(vfn.bitmap_or_agg(col("bm")).over(w)))
      .groupBy().agg(sum(col("n_users")).as("s"), sum(col("n_events")).as("n"))
  }

  private def colocate(e: DataFrame): DataFrame = {
    val vfn = graft.functions.VariantFunctions
    val hourly = e.withColumn("h_epoch",
        unix_timestamp(date_trunc("hour", col("ts"))))
      .repartition(col("event_type"), col("h_epoch"))
      .groupBy(col("event_type"), col("h_epoch"))
      .agg(vfn.bitmap_agg(col("user_id")).as("bm"), count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h_epoch"))
      .rangeBetween(-23L * 3600L, 0L)
    hourly.withColumn("n_users",
        vfn.bitmap_cardinality(vfn.bitmap_or_agg(col("bm")).over(w)))
      .groupBy().agg(sum(col("n_users")).as("s"), sum(col("n_events")).as("n"))
  }

  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    Seq(4, 32).foreach { cores =>
      val spark = graft.Tables.configure(SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      Seq("direct" -> direct _, "dedup_first" -> dedupFirst _,
          "colocate" -> colocate _).foreach {
        case (name, f) =>
          f(amplified(spark, d)).write.mode("overwrite").format("noop").save() // warm
          val t = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            f(amplified(spark, d)).write.mode("overwrite").format("noop").save()
            (System.nanoTime() - t0) / 1e9
          }.min
          println(f"c$cores%-3d $name%-12s $t%7.2f s")
      }
      spark.stop()
    }
  }
}
