package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Task-retry chaos gate (round 11, VERDICT r10 item 2).
  *
  * Dozens of lanes argue cluster-invariance via content-keyed hashing
  * and exact-integer digests ("same result on any partitioning / any
  * retry") — this spec converts that argument into evidence: it runs a
  * representative lane per family with INJECTED first-attempt task
  * failures (TaskContext.attemptNumber-gated throw at the start of
  * result-stage partitions) and asserts the digest is identical to the
  * clean run. At 100 TB task retry and speculative re-execution are
  * routine, so a lane whose result shifts under recomputation is wrong
  * even if every single clean run passes its oracle.
  *
  * Mechanics: TestSpark runs `local[4, 2]` (maxFailures=2), so an
  * attempt-0 throw is retried exactly once and the job must then
  * succeed — job success itself proves the scheduler replayed the
  * failed partitions (with upstream shuffle data reused, exactly the
  * production retry shape). Injections are counted in a JVM-local
  * AtomicInteger, NOT a Spark accumulator: user accumulator updates
  * from FAILED tasks are discarded by design, which would always read
  * zero. `spark.speculation` is set on the context, but local mode
  * never launches speculative duplicates (TaskSchedulerImpl guards on
  * !isLocal) — the failure-retry path is the one exercised here.
  */
class ChaosRetrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.SF

  import ChaosRetrySpec.injections

  /** Canonical order-insensitive digest of a DataFrame, computed
    * through an RDD stage that throws on the first attempt of every
    * even-numbered partition when `chaos` is set.
    */
  private def digest(df: DataFrame, chaos: Boolean): String = {
    val rows = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val tc = TaskContext.get()
      if (chaos && tc != null && tc.attemptNumber() == 0 && pid % 2 == 0) {
        injections.incrementAndGet()
        throw new RuntimeException(s"chaos: injected failure in partition $pid")
      }
      it
    }.collect()
    val body = rows.map(_.toString).sorted.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(body.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def assertRetryStable(name: String): Unit = {
    val q = SparkEntry.queries(name)
    val clean = digest(q(spark, sf), chaos = false)
    val before = injections.get()
    val chaotic = digest(q(spark, sf), chaos = true)
    assert(injections.get() > before,
      s"$name: no task failure was injected — the chaos path did not run")
    assert(chaotic === clean,
      s"$name: digest changed under task retry ($clean -> $chaotic)")
  }

  test("dedup twin digest survives task retry (d_minhash_md5)") {
    assertRetryStable("d_minhash_md5")
  }

  test("sketch aggregate digest survives task retry (q_bitmap_distinct)") {
    assertRetryStable("q_bitmap_distinct")
  }

  test("media decode digest survives task retry (mm_jpeg_color)") {
    assertRetryStable("mm_jpeg_color")
  }

  test("lossy WebP decode digest survives task retry (mm_webp_lossy)") {
    assertRetryStable("mm_webp_lossy")
  }

  test("similarity join digest survives task retry (d_prefix_join)") {
    assertRetryStable("d_prefix_join")
  }

  test("streaming fMGWS dedup digest survives task retry inside micro-batches") {
    import spark.implicits._
    val docs = (0L until 40L).map { i =>
      // 4 near-dup clusters of 10: same text with one shifting suffix
      (i, s"alpha beta gamma delta epsilon zeta eta theta cluster${i % 4} " +
        s"iota kappa lambda mu nu xi omicron pi suffix${if (i < 4) i else i % 4}")
    }

    // two staged parquet files -> two micro-batches (maxFilesPerTrigger=1):
    // state built in batch 1 must survive batch-2 task retries (the
    // state-store reload path)
    val stage = java.nio.file.Files.createTempDirectory("graft_chaos_stream_").toString
    docs.take(20).toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$stage/f0.parquet")
    docs.drop(20).toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$stage/f1.parquet")
    val schema = spark.read.parquet(s"$stage/f0.parquet").schema

    def run(chaos: Boolean): String = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$stage/*/")
      val chaotic = src.as[(Long, String)].mapPartitions { it =>
        val tc = TaskContext.get()
        if (chaos && tc != null && tc.attemptNumber() == 0) {
          injections.incrementAndGet()
          throw new RuntimeException("chaos: injected failure in micro-batch")
        }
        it
      }.toDF("doc_id", "text")
      val pairs = graft.operators.StreamingDedup
        .minhashDupStream(chaotic, "doc_id", "text")
      val sink = s"chaos_dedup_${if (chaos) "c" else "n"}"
      val query = pairs.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try query.processAllAvailable() finally query.stop()
      val rows = spark.table(sink).collect().map(_.toString).sorted
      spark.catalog.dropTempView(sink)
      rows.mkString("\n")
    }

    val clean = run(chaos = false)
    val before = injections.get()
    val chaotic = run(chaos = true)
    assert(injections.get() > before,
      "streaming: no task failure was injected")
    assert(chaotic === clean, "streaming dedup result changed under micro-batch task retry")
    assert(clean.nonEmpty, "fixture produced no near-dup pairs — test would be vacuous")
  }
  // -------------------------------------------------------------
  // Round 12 (VERDICT r11 item 4): failures BEFORE wide shuffles —
  // shuffle-MAP-stage tasks die and the scheduler recomputes upstream
  // partials (potentially interleaved differently) — and a streaming
  // kill-restart that must rebuild state from the checkpoint.
  // -------------------------------------------------------------

  /** Wrap a DataFrame so its SCAN/map side throws on the first attempt
    * of every even partition — placed before a groupBy/join this makes
    * the failure land in the shuffle-map stage, not the result stage. */
  private def chaosSource(df: DataFrame, chaos: Boolean): DataFrame = {
    val rdd = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val tc = TaskContext.get()
      if (chaos && tc != null && tc.attemptNumber() == 0 && pid % 2 == 0) {
        injections.incrementAndGet()
        throw new RuntimeException(s"chaos: injected map-stage failure in partition $pid")
      }
      it
    }
    spark.createDataFrame(rdd, df.schema)
  }

  private def sortedDigest(df: DataFrame): String =
    df.collect().map(_.toString).sorted.mkString("\n")

  test("shuffle-map-stage failure: bitmap-distinct aggregate recomputes identically") {
    import org.apache.spark.sql.functions._
    import graft.functions.{VariantFunctions => vf}
    val o = graft.Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_custkey")).repartition(4)
    def run(chaos: Boolean): String = sortedDigest(
      chaosSource(o, chaos)
        .groupBy(col("o_orderpriority"))
        .agg(vf.bitmap_cardinality(vf.bitmap_agg(col("o_custkey"))).as("n_cust"),
          count(lit(1)).as("n_orders")))
    val clean = run(chaos = false)
    val before = injections.get()
    val chaotic = run(chaos = true)
    assert(injections.get() > before, "no map-stage failure was injected")
    assert(chaotic === clean,
      "bitmap-distinct digest changed under shuffle-map-stage retry")
    assert(clean.nonEmpty)
  }

  test("shuffle-map-stage failure: connected-components labels recompute identically") {
    import spark.implicits._
    // 8 chains of 25 nodes plus cross-links joining chains 2k/2k+1:
    // 4 components of 50 — iterative large/small-star shuffles all
    // sit downstream of the chaos source
    val edges = ((0 until 8).flatMap { c =>
      (0 until 24).map(i => (c * 100L + i, c * 100L + i + 1))
    } ++ (0 until 4).map(k => (2 * k * 100L + 7, (2 * k + 1) * 100L + 13)))
      .toDF("u", "v").repartition(4)
    def run(chaos: Boolean): String = {
      val (labels, _) = graft.operators.ConnectedComponents
        .labelComponents(chaosSource(edges, chaos))
      sortedDigest(labels)
    }
    val clean = run(chaos = false)
    val before = injections.get()
    val chaotic = run(chaos = true)
    assert(injections.get() > before, "no map-stage failure was injected")
    assert(chaotic === clean,
      "connected-components labels changed under shuffle-map-stage retry")
    assert(clean.count(_ == '\n') >= 199, "expected ~200 labeled nodes")
  }

  test("streaming kill-restart: fMGWS state rebuilds from the checkpoint") {
    import spark.implicits._
    val docs = (0L until 40L).map { i =>
      (i, s"alpha beta gamma delta epsilon zeta eta theta cluster${i % 4} " +
        s"iota kappa lambda mu nu xi omicron pi suffix${if (i < 4) i else i % 4}")
    }
    val base = java.nio.file.Files.createTempDirectory("graft_chaos_ckpt_").toString
    val schema = {
      docs.take(1).toDF("doc_id", "text").write.parquet(s"$base/probe")
      spark.read.parquet(s"$base/probe").schema
    }

    def stage(dir: String, slices: Seq[Seq[(Long, String)]]): Unit =
      slices.zipWithIndex.foreach { case (s0, i) =>
        s0.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/f$i.parquet")
      }

    def startQuery(src: String, ckpt: String, outDir: String) = {
      val in = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$src/*/")
      graft.operators.StreamingDedup.minhashDupStream(in, "doc_id", "text")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    // reference: one uninterrupted run over all 40 docs
    stage(s"$base/src_ref", Seq(docs.take(20), docs.drop(20)))
    val qRef = startQuery(s"$base/src_ref", s"$base/ckpt_ref", s"$base/out_ref")
    try qRef.processAllAvailable() finally qRef.stop()
    val refRows = spark.read.parquet(s"$base/out_ref")
      .collect().map(_.toString).sorted

    // kill-restart: process the first half, STOP the query, then land
    // the second half and restart from the same checkpoint — the
    // restarted query only produces the cross-half pairs if the
    // bucket state from batch 1 is reloaded from the state store
    stage(s"$base/src_kr", Seq(docs.take(20)))
    val q1 = startQuery(s"$base/src_kr", s"$base/ckpt_kr", s"$base/out_kr")
    try q1.processAllAvailable() finally q1.stop() // the "kill"
    stage2(s"$base/src_kr", docs.drop(20))
    val q2 = startQuery(s"$base/src_kr", s"$base/ckpt_kr", s"$base/out_kr")
    try q2.processAllAvailable() finally q2.stop()
    val krRows = spark.read.parquet(s"$base/out_kr")
      .collect().map(_.toString).sorted

    assert(refRows.nonEmpty, "fixture produced no near-dup pairs")
    assert(krRows.mkString("\n") === refRows.mkString("\n"),
      "kill-restart output differs from the uninterrupted run")
    // the load-bearing half: pairs that SPAN the restart boundary
    val crossing = spark.read.parquet(s"$base/out_kr")
      .filter("(id_a < 20 AND id_b >= 20) OR (id_b < 20 AND id_a >= 20)")
      .count()
    assert(crossing > 0,
      "no pair spans the restart — checkpoint state recovery was not exercised")
  }

  private def stage2(dir: String, slice: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    slice.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/f1.parquet")
  }
}

object ChaosRetrySpec {
  /** JVM-local: executor == driver JVM in local mode, and failed-task
    * accumulator updates are discarded, so this is the reliable count. */
  val injections = new AtomicInteger(0)
}
