package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Targeted timing probe: min-of-2 noop-sink runs for the named
  * queries. Run:
  * sbt "runMain graft.tools.TimeQueries <sfDir> <q1> <q2> ..."
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val d = args.head
    val names = args.tail.toSeq
    // same tmpfs scratch + parked state maintenance as graft.Bench, so
    // per-query timings here predict the bench, not the disk
    var builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "3600s")
    val shm = new java.io.File("/dev/shm/graft_bench_scratch")
    if (shm.isDirectory || shm.mkdirs()) {
      System.setProperty("java.io.tmpdir", shm.toString)
      builder = builder.config("spark.local.dir", shm.toString)
    }
    val spark = Tables.configure(builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.entry(spark).count() // warm
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, d).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $name%-24s ${times.min}%.3f s (runs: ${times.map(t => f"$t%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
