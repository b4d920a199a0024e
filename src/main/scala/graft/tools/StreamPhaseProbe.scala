package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Phase-level breakdown of the streaming fixed overhead: run one
  * representative micro-batch query and print every recentProgress
  * durationMs bucket (queryPlanning, walCommit, stateStoreCommit,
  * addBatch, triggerExecution, ...) — Spark's own accounting of where
  * the per-batch time goes.
  * Run: sbt "runMain graft.tools.StreamPhaseProbe [sfDir]"
  */
object StreamPhaseProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val shm = new java.io.File("/dev/shm/graft_probe_scratch")
    if (shm.isDirectory || shm.mkdirs()) System.setProperty("java.io.tmpdir", shm.toString)
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.local.dir", shm.toString)
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "3600s"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val schema = spark.read.parquet(s"$d/events.parquet").schema
    val sd = java.nio.file.Files.createTempDirectory("graft_phase_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$d/events.parquet"), sd.resolve("events.parquet"))

    var n = 0
    def run(label: String, parts: Int): Unit = {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      n += 1
      val t0 = System.nanoTime()
      val agg = spark.readStream.schema(schema).parquet(sd.toString)
        .transform(graft.Tables.tsToTimestamp)
        .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName(s"phase_$n").start()
      q.processAllAvailable()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"[phase] $label total ${total}%.2f s; per-batch durationMs:")
      q.recentProgress.foreach { p =>
        val dm = p.durationMs
        println(s"  batch ${p.batchId} rows=${p.numInputRows} " +
          scala.jdk.CollectionConverters.MapHasAsScala(dm).asScala.toSeq
            .sortBy(-_._2).map { case (k, v) => s"$k=$v" }.mkString(" "))
      }
      q.stop()
    }
    run("warm p8", 8)
    run("again p8", 8)
    run("again p2", 2)
    run("again p2", 2)
    spark.stop()
  }
}
