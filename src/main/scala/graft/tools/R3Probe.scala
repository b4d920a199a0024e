package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Round-3 regression probe: timings + plan checks for the queries the
  * round-2 verdict flagged (v_schema_agg fusion, v_auto_shred inference
  * memo, v_filter_high memo allocation, v_explode_kv slice sharing).
  * Run: sbt "runMain graft.tools.R3Probe [sfDir]"
  */
object R3Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val targets = Seq("v_schema_agg", "v_auto_shred", "v_filter_high", "v_keys_size",
      "v_explode_kv", "v_schema_of", "v_group_by_variant", "d_dup_clusters",
      "s_window_counts", "s_minhash_dedup")
    // warm
    SparkEntry.entry(spark).count()

    targets.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, d).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[r3] $name%-20s run1=${times(0)}%.2f s  run2=${times(1)}%.2f s")
    }

    // plan check: v_schema_agg must use the fused aggregate
    val plan = SparkEntry.queries("v_schema_agg")(spark, d)
      .queryExecution.optimizedPlan.toString
    println("[r3] v_schema_agg fused: " + plan.contains("schema_of_json_agg")
      + (if (!plan.contains("schema_of_json_agg")) "\n" + plan else ""))
    spark.stop()
  }
}
