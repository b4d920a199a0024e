package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Streaming-overhead experiments: where do the ~1.5 s per streaming
  * bench query go, and which knob (state partitions, trigger, state
  * store provider, no-data batches) buys the most back?
  * Run: sbt "runMain graft.tools.StreamProbe [sfDir]"
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val shm = new java.io.File("/dev/shm/graft_probe_scratch")
    if (shm.isDirectory || shm.mkdirs()) System.setProperty("java.io.tmpdir", shm.toString)
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", shm.toString))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark

    val staticSchema = sc.read.parquet(s"$d/events.parquet").schema
    val sd = java.nio.file.Files.createTempDirectory("graft_sprobe_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$d/events.parquet"), sd.resolve("events.parquet"))

    var n = 0
    def run(label: String, parts: Int, availableNow: Boolean,
            rocks: Boolean, noData: Boolean): Unit = {
      val prevParts = sc.conf.get("spark.sql.shuffle.partitions")
      sc.conf.set("spark.sql.shuffle.partitions", parts.toString)
      if (rocks) sc.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      else sc.conf.unset("spark.sql.streaming.stateStore.providerClass")
      sc.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", noData.toString)
      val t0 = System.nanoTime()
      val stream = sc.readStream.schema(staticSchema).parquet(sd.toString)
        .transform(graft.Tables.tsToTimestamp)
        .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      n += 1
      val qname = s"sprobe_$n"
      var w = stream.writeStream.outputMode("complete").format("memory").queryName(qname)
      if (availableNow) w = w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      val q = w.start()
      if (availableNow) q.awaitTermination() else { q.processAllAvailable(); q.stop() }
      val rows = sc.table(qname).count()
      println(f"[sprobe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
      sc.conf.set("spark.sql.shuffle.partitions", prevParts)
    }

    run("warmup p8", 8, availableNow = false, rocks = false, noData = true)
    run("baseline p8 processAll", 8, availableNow = false, rocks = false, noData = true)
    run("p8 noDataBatches off", 8, availableNow = false, rocks = false, noData = false)

    // ---- minhash dedup: the signature map is the cost; a single small
    // parquet file (594 KB, one row group) = ONE scan partition = serial
    // minhash over every doc. Measure repartition-before-signature.
    val docSchema = sc.read.parquet(s"$d/documents.parquet").schema
    val dd = java.nio.file.Files.createTempDirectory("graft_sprobe_docs_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$d/documents.parquet"), dd.resolve("documents.parquet"))

    def runDedup(label: String, parts: Int, repart: Int, noData: Boolean): Unit = {
      sc.conf.set("spark.sql.shuffle.partitions", parts.toString)
      sc.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", noData.toString)
      val t0 = System.nanoTime()
      var stream: org.apache.spark.sql.DataFrame =
        sc.readStream.schema(docSchema).parquet(dd.toString)
      if (repart > 0) stream = stream.repartition(repart)
      val pairs = graft.operators.StreamingDedup.minhashDupStream(stream, "doc_id", "text")
      n += 1
      val qname = s"sprobe_d_$n"
      val q = pairs.writeStream.outputMode("append").format("memory").queryName(qname).start()
      q.processAllAvailable(); q.stop()
      val rows = sc.table(qname).dropDuplicates("id_a", "id_b").count()
      println(f"[sprobe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows pairs)")
    }
    def runDedupBatch(label: String, repart: Int): Unit = {
      val t0 = System.nanoTime()
      var docs = sc.read.parquet(dd.toString)
      if (repart > 0) docs = docs.repartition(repart)
      val rows = graft.operators.StreamingDedup
        .minhashDupStream(docs, "doc_id", "text")
        .dropDuplicates("id_a", "id_b").count()
      println(f"[sprobe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows pairs)")
    }
    run("p8 rocksdb provider", 8, availableNow = false, rocks = true, noData = false)
    run("p8 rocksdb again", 8, availableNow = false, rocks = true, noData = false)
    run("p8 hdfs again", 8, availableNow = false, rocks = false, noData = false)

    // fixed-cost floor: same pipeline over a 1-row stream — whatever
    // this costs is per-query micro-batch machinery, not data
    val tiny = java.nio.file.Files.createTempDirectory("graft_sprobe_tiny_")
    sc.read.parquet(s"$d/events.parquet").limit(1)
      .write.mode("overwrite").parquet(tiny.toString)
    val tinySchema = sc.read.parquet(tiny.toString).schema
    def runTiny(label: String): Unit = {
      val t0 = System.nanoTime()
      val stream = sc.readStream.schema(tinySchema).parquet(tiny.toString)
        .transform(graft.Tables.tsToTimestamp)
        .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      n += 1
      val qname = s"sprobe_t_$n"
      val q = stream.writeStream.outputMode("complete").format("memory")
        .queryName(qname).start()
      q.processAllAvailable(); q.stop()
      val rows = sc.table(qname).count()
      println(f"[sprobe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }
    runTiny("FLOOR 1-row stream p8")
    runTiny("FLOOR 1-row stream p8 again")
    sc.conf.set("spark.sql.shuffle.partitions", "1")
    runTiny("FLOOR 1-row stream p1")
    runTiny("FLOOR 1-row stream p1 again")
    sc.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "600s")
    runTiny("FLOOR p1 no-maintenance")
    sc.conf.set("spark.sql.shuffle.partitions", "8")
    // timing breakdown: start → first batch done → stop
    locally {
      val t0 = System.nanoTime()
      val stream = sc.readStream.schema(tinySchema).parquet(tiny.toString)
        .transform(graft.Tables.tsToTimestamp)
        .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      n += 1
      val q = stream.writeStream.outputMode("complete").format("memory")
        .queryName(s"sprobe_t_$n").start()
      val t1 = System.nanoTime()
      q.processAllAvailable()
      val t2 = System.nanoTime()
      q.stop()
      val t3 = System.nanoTime()
      println(f"[sprobe] breakdown start=${(t1-t0)/1e9}%.2f process=${(t2-t1)/1e9}%.2f stop=${(t3-t2)/1e9}%.2f")
    }

    runDedupBatch("dedup BATCH repart0 (warm twice)", 0)
    runDedupBatch("dedup BATCH repart0", 0)
    runDedupBatch("dedup BATCH repart32", 32)
    runDedup("dedup stream p8 repart0", 8, 0, noData = true)
    runDedup("dedup stream p8 repart32", 8, 32, noData = true)
    runDedup("dedup stream p8 repart32 noData off", 8, 32, noData = false)
    runDedup("dedup stream p32 repart32 noData off", 32, 32, noData = false)
    spark.stop()
  }
}
