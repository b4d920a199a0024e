package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{VariantFunctions => vf}

/** VERDICT r9 item 5: measure whether a SHARED-metadata storage layout
  * for variant columns beats the per-row (metadata, value) struct at
  * rest — the persistence-side analogue of the reference's batch-shared
  * dictionary (arrow-open-variant/src/json.rs:51-63: one metadata blob
  * per record batch, rows carry only values).
  *
  * Layouts compared on the events table's parsed variant column:
  *   A (current)    : parquet struct<metadata: binary, value: binary>
  *   B (normalized) : fact (event_id, mid, value) + broadcast sidecar
  *                    (mid, metadata) of DISTINCT metadata blobs;
  *                    readback reassembles the struct via broadcast join
  *   C (inline-dict): same file as A — parquet's own dictionary
  *                    encoding already collapses repeated binary values
  *                    per column chunk, which is the null hypothesis:
  *                    if A ≈ B in bytes, the format is doing the
  *                    sharing for us and the code change buys nothing.
  *
  * Prints bytes on disk and min-of-3 readback times (full variant_get
  * scan) for each layout.
  * Run: sbt "runMain graft.tools.MetaShareProbe [sfDir]"
  */
object MetaShareProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    vf.register(spark)

    val parsed = Tables.events(spark, d)
      .select(col("event_id"), vf.variant_from_json(col("props")).as("v"))

    def dirBytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
      walk(new java.io.File(p))
    }
    def timed3(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[metashare] $label%-34s ${ts.map(_._1).min}%.3f s (rows ${ts.head._2})")
    }

    // ---- layout A: per-row struct (current persistence path)
    val dirA = java.nio.file.Files.createTempDirectory("graft_metaA_").toString
    parsed.write.mode("overwrite").parquet(dirA)
    println(f"[metashare] A per-row struct bytes      ${dirBytes(dirA)}%,d")

    // ---- layout B: normalized sidecar of distinct metadata
    val dirBf = java.nio.file.Files.createTempDirectory("graft_metaBf_").toString
    val dirBs = java.nio.file.Files.createTempDirectory("graft_metaBs_").toString
    val keyed = parsed.select(col("event_id"),
      md5(col("v.metadata")).as("mid"), col("v.metadata").as("metadata"),
      col("v.value").as("value"))
    keyed.select(col("mid"), col("metadata")).distinct()
      .write.mode("overwrite").parquet(dirBs)
    keyed.select(col("event_id"), col("mid"), col("value"))
      .write.mode("overwrite").parquet(dirBf)
    val sidecarRows = spark.read.parquet(dirBs).count()
    println(f"[metashare] B fact bytes                ${dirBytes(dirBf)}%,d")
    println(f"[metashare] B sidecar bytes             ${dirBytes(dirBs)}%,d (distinct metadata: $sidecarRows)")
    println(f"[metashare] B total                     ${dirBytes(dirBf) + dirBytes(dirBs)}%,d vs A ${dirBytes(dirA)}%,d")

    // ---- readback: full-scan variant_get k extraction + aggregate
    def readbackA(): Long = {
      spark.read.parquet(dirA)
        .select(vf.variant_get(col("v"), "$.k",
          org.apache.spark.sql.types.LongType).as("k"))
        .agg(sum(col("k"))).collect()
      spark.read.parquet(dirA).count()
    }
    def readbackB(): Long = {
      val side = spark.read.parquet(dirBs)
      val fact = spark.read.parquet(dirBf)
      fact.join(broadcast(side), Seq("mid"))
        .select(vf.variant_get(struct(col("metadata"), col("value")).as("v"),
          "$.k", org.apache.spark.sql.types.LongType).as("k"))
        .agg(sum(col("k"))).collect()
      fact.count()
    }
    // warm both
    readbackA(); readbackB()
    timed3("A readback variant_get sum")(readbackA())
    timed3("B readback join+variant_get sum")(readbackB())

    // ---- the null hypothesis: how much of A is metadata AT REST?
    // Write the two binary columns as separate files to see parquet's
    // dictionary-encoded size of the metadata column alone.
    val dirAm = java.nio.file.Files.createTempDirectory("graft_metaAm_").toString
    val dirAv = java.nio.file.Files.createTempDirectory("graft_metaAv_").toString
    parsed.select(col("v.metadata")).write.mode("overwrite").parquet(dirAm)
    parsed.select(col("v.value")).write.mode("overwrite").parquet(dirAv)
    println(f"[metashare] A metadata column alone     ${dirBytes(dirAm)}%,d")
    println(f"[metashare] A value column alone        ${dirBytes(dirAv)}%,d")
    spark.stop()
  }
}
