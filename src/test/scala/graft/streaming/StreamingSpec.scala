package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

case class UserCount(user_id: Long, n: Long)

/** Structured Streaming coverage beyond the driver query: watermark +
  * append emission, stateful processing via flatMapGroupsWithState, and
  * the variant expressions running unchanged inside a stream (SURVEY
  * §2.2 Streaming row).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def stageEvents(): String = {
    val dir = Files.createTempDirectory("graft_stream_spec_")
    Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.SF}/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  private def eventsStream(stageDir: String) = {
    val schema = spark.read.parquet(s"${TestSpark.SF}/events.parquet").schema
    spark.readStream.schema(schema).parquet(stageDir)
      .transform(graft.Tables.tsToTimestamp)
  }

  test("watermark + append emits exactly the closed windows") {
    val stage = stageEvents()
    val agg = eventsStream(stage)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("wm_append").start()
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("wm_append")
    // append mode withholds windows not yet past the watermark: the
    // final watermark is max(ts) - 10min, so every window ending before
    // that must be present and none after
    val maxTs = Tables.events(spark, TestSpark.SF)
      .agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val watermark = new Timestamp(maxTs.getTime - 10 * 60 * 1000)
    val complete = Tables.events(spark, TestSpark.SF)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .filter(col("window.end") < lit(watermark))
    assert(emitted.filter(col("window.end") < lit(watermark)).count() == complete.count())
    assert(complete.count() > 0)
    // no window that is still open may have been emitted
    val lastStart = emitted.agg(max(col("window.start"))).collect()(0).getTimestamp(0)
    assert(!lastStart.after(watermark))
  }

  test("variant expressions run unchanged under readStream") {
    import graft.functions.{VariantFunctions => vf}
    val stage = stageEvents()
    val agg = eventsStream(stage)
      .withColumn("v", vf.variant_from_json(col("props")))
      .groupBy(col("event_type"))
      .agg(sum(vf.variant_get(col("v"), "$.k", LongType)).as("k_sum"))
    val q = agg.writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("stream_variant").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_variant")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val batch = graft.SparkEntry.entry(spark)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(streamed == batch)
  }

  test("multi-batch stream: state accumulates across micro-batches and matches batch") {
    import org.apache.spark.sql.types.LongType
    import graft.functions.{VariantFunctions => vf}
    // split events into 4 files, feed one file per micro-batch
    val stage = Files.createTempDirectory("graft_stream_multi_").toString
    val ev = spark.read.parquet(s"${TestSpark.SF}/events.parquet")
    ev.repartition(4).write.mode("overwrite").parquet(stage)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
      .transform(graft.Tables.tsToTimestamp)
      .withColumn("v", vf.variant_from_json(col("props")))
    val agg = stream.groupBy(col("event_type"))
      .agg(sum(vf.variant_get(col("v"), "$.k", LongType)).as("k_sum"))
    val q = agg.writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("multi_batch").start()
    q.processAllAvailable()
    val batches = q.recentProgress.length
    q.stop()
    assert(batches >= 4, s"expected >=4 micro-batches, saw $batches")
    val streamed = spark.table("multi_batch")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val batch = graft.SparkEntry.entry(spark)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(streamed == batch)
  }

  test("streaming exact dedup: duplicated input across micro-batches collapses to one copy") {
    // the same events file lands twice (e.g. at-least-once upstream
    // delivery); watermarked dropDuplicates keeps state bounded and
    // emits each event once
    val stage = Files.createTempDirectory("graft_stream_dup_").toString
    val src = java.nio.file.Paths.get(s"${TestSpark.SF}/events.parquet")
    Files.copy(src, java.nio.file.Paths.get(s"$stage/copy1.parquet"))
    Files.copy(src, java.nio.file.Paths.get(s"$stage/copy2.parquet"))
    val schema = spark.read.parquet(s"${TestSpark.SF}/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
      .transform(graft.Tables.tsToTimestamp)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id", "ts")
    val q = stream.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("stream_dedup").start()
    q.processAllAvailable()
    q.stop()
    val n = spark.table("stream_dedup").count()
    val expected = spark.read.parquet(s"${TestSpark.SF}/events.parquet").count()
    assert(n == expected, s"streamed $n vs $expected unique events")
  }

  test("dropDuplicatesWithinWatermark: cross-batch duplicates within the horizon are suppressed") {
    // same file twice across two micro-batches: every key in batch 2 is
    // a duplicate of batch 1 at the SAME event time, so it falls inside
    // the watermark horizon and must be suppressed — the emitted rows
    // are exactly the distinct keys
    val stage = Files.createTempDirectory("graft_stream_wmdedup_").toString
    val src = java.nio.file.Paths.get(s"${TestSpark.SF}/events.parquet")
    Files.copy(src, java.nio.file.Paths.get(s"$stage/copy1.parquet"))
    Files.copy(src, java.nio.file.Paths.get(s"$stage/copy2.parquet"))
    val schema = spark.read.parquet(s"${TestSpark.SF}/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
      .transform(graft.Tables.tsToTimestamp)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"))
    val q = stream.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("stream_wmdedup").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("stream_wmdedup")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = spark.read.parquet(s"${TestSpark.SF}/events.parquet")
      .select(col("user_id"), col("event_type")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.length == got.toSet.size, "a key was emitted more than once")
    assert(got.toSet == expected, "emitted key set differs from distinct keys")
  }

  test("windowed streaming top-k merges state across micro-batches; duplicate delivery is idempotent") {
    import graft.functions.{VariantFunctions => vf}
    // the same events file lands twice across two micro-batches: every
    // window's buffer is built in batch 1, re-merged with identical
    // (score, id) pairs in batch 2 through the state store — the result
    // must equal the batch computation over ONE copy
    val stage = Files.createTempDirectory("graft_stream_topk_").toString
    val src = java.nio.file.Paths.get(s"${TestSpark.SF}/events.parquet")
    Files.copy(src, java.nio.file.Paths.get(s"$stage/copy1.parquet"))
    Files.copy(src, java.nio.file.Paths.get(s"$stage/copy2.parquet"))
    val schema = spark.read.parquet(s"${TestSpark.SF}/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
      .transform(graft.Tables.tsToTimestamp)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(vf.topk_pairs(col("value"), col("event_id"), 3).as("top"))
    val q = stream.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("stream_topk_dup").start()
    q.processAllAvailable()
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(unix_timestamp(col("w.start")).as("ws"), col("event_type"),
        expr("transform(top, p -> concat(p.score, '@', p.id))").as("t"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2).mkString(",")))
      .sortBy(x => (x._1, x._2))
    val maxTs = Tables.events(spark, TestSpark.SF).agg(max(col("ts")))
      .collect()(0).getTimestamp(0)
    val watermark = new java.sql.Timestamp(maxTs.getTime - 10 * 60 * 1000)
    val streamed = rows(spark.table("stream_topk_dup").filter(col("w.end") < lit(watermark)))
    val batch = rows(Tables.events(spark, TestSpark.SF)
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(vf.topk_pairs(col("value"), col("event_id"), 3).as("top"))
      .filter(col("w.end") < lit(watermark)))
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("checkpoint recovery: a restarted query resumes from the committed offset, exactly once") {
    // run 1 sees two source files; the query stops; two more files land;
    // run 2 restarts from the SAME checkpoint and must process only the
    // new files — the union of both runs' sink output equals the batch
    // result over all four files with no duplicates
    val stage = Files.createTempDirectory("graft_stream_ckpt_src_").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt_").toString
    val sink = Files.createTempDirectory("graft_stream_ckpt_sink_").toString
    val all = spark.read.parquet(s"${TestSpark.SF}/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val parts = all.randomSplit(Array(0.25, 0.25, 0.25, 0.25), seed = 42L)
    def land(i: Int): Unit =
      parts(i).coalesce(1).write.mode("overwrite").parquet(s"$stage/f$i")
    def run(): Unit = {
      val schema = all.schema
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$stage/f*")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(sink)
          ()
        }.start()
      q.processAllAvailable()
      q.stop()
    }
    land(0); land(1)
    run()
    val afterRun1 = spark.read.parquet(sink).count()
    land(2); land(3)
    run()
    val out = spark.read.parquet(sink)
    assert(afterRun1 > 0 && afterRun1 < all.count())
    assert(out.count() == all.count(), "restart reprocessed or skipped files")
    assert(out.select(col("event_id")).distinct().count() == all.count(),
      "duplicate events after checkpoint resume")
  }

  test("streaming ANN serving equals the batch IVF result") {
    // same probes, same corpus, same cached index → the per-micro-batch
    // foreachBatch serve must reproduce the batch IVF answer exactly
    // the query itself now EMITS the per-probe equality digest (round 8:
    // the serve output is joined against the one-shot batch IVF answer)
    val served = graft.Queries.queryMap("s_ann_serve")(spark, TestSpark.SF)
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(served.length == 10, s"expected 10 probe digests, got ${served.length}")
    assert(served.forall(_._2),
      s"probes disagreeing with batch: ${served.filterNot(_._2).map(_._1).toSeq}")
  }

  test("streaming LSH dedup: multi-batch pairs equal the batch pipeline, incl. cross-batch pairs") {
    import graft.operators.StreamingDedup
    val docs = spark.read.parquet(s"${TestSpark.SF}/documents.parquet")
      .select(col("doc_id"), col("text"))
    // two files split by id parity, one per micro-batch: a near-dup pair
    // with one even and one odd id is only findable via state carried
    // across batches
    val stage = Files.createTempDirectory("graft_stream_lsh_").toString
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$stage/f0")
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$stage/f1")
    val dir = Files.createTempDirectory("graft_stream_lsh_in_").toString
    for ((f, i) <- Seq("f0", "f1").zipWithIndex;
         p <- new java.io.File(s"$stage/$f").listFiles() if p.getName.endsWith(".parquet"))
      Files.copy(p.toPath, java.nio.file.Paths.get(s"$dir/part$i.parquet"))
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = StreamingDedup.minhashDupStream(stream, "doc_id", "text")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("lsh_dedup").start()
    q.processAllAvailable()
    val batches = q.recentProgress.length
    q.stop()
    assert(batches >= 2, s"expected >=2 micro-batches, saw $batches")
    def pairSet(df: org.apache.spark.sql.DataFrame) = df
      .select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = pairSet(spark.table("lsh_dedup"))
    // same code path in batch mode: state starts empty, one call per
    // bucket — must yield the identical pair set for ANY batch split
    val batch = pairSet(StreamingDedup.minhashDupStream(docs, "doc_id", "text"))
    assert(streamed == batch,
      s"streaming ${streamed.size} vs batch ${batch.size}; " +
        s"only-stream=${(streamed -- batch).take(5)} only-batch=${(batch -- streamed).take(5)}")
    assert(streamed.nonEmpty)
    assert(streamed.exists { case (a, b) => a % 2 != b % 2 },
      "no cross-batch (even,odd) pair found — state did not carry across micro-batches")
  }

  test("flatMapGroupsWithState: per-user running event count with custom state") {
    val stage = stageEvents()
    val counted = eventsStream(stage)
      .select(col("user_id"))
      .as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, UserCount](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val total = prev + rows.size
          state.update(total)
          Iterator(UserCount(user, total))
      }
    val q = counted.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("fmgws").start()
    q.processAllAvailable()
    q.stop()
    // single micro-batch → state output equals a plain groupBy count
    val got = spark.table("fmgws")
      .groupBy(col("user_id")).agg(max(col("n")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = Tables.events(spark, TestSpark.SF)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
  }

  test("flatMapGroupsWithState + EventTimeTimeout: sessions close by gap OR by watermark timeout") {
    import spark.implicits._
    // Time-ordered quartile files so the watermark advances across
    // micro-batches and timeouts actually fire mid-stream.
    val stage = Files.createTempDirectory("graft_ett_").toString
    val ev = spark.read.parquet(s"${TestSpark.SF}/events.parquet")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("ts"))
    val quarts = ev.withColumn("q", ntile(4).over(w))
    (1 to 4).foreach { i =>
      val part = Files.createTempDirectory(s"graft_ett_part$i").toString
      quarts.filter(col("q") === i).drop("q")
        .coalesce(1).write.mode("overwrite").parquet(part)
      val src = new java.io.File(part).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = java.nio.file.Paths.get(stage, f"b_$i%02d.parquet")
      Files.move(src, dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(2000000L + i * 10000L))
    }
    val gapUs = 10L * 60 * 1000000 // 10-min inactivity gap
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
      .transform(graft.Tables.tsToTimestamp)
      .withWatermark("ts", "10 minutes")
      // keep the ts column (the watermark rides on it — projecting it
      // away disables event-time timeout) and carry full microseconds
      // beside it (Timestamp.getTime truncates to millis and would
      // diverge from the batch reference in the last three digits)
      .select(col("user_id"), col("ts"), expr("unix_micros(ts)").as("t_us"))
      .as[(Long, Timestamp, Long)]
    // state = open session (start, last, n); a new event either extends
    // it or closes it (gap) and opens another; the timeout closes it
    // when the watermark passes last + gap with no successor
    val sessions = stream.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Timestamp, Long)], state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            val (start, _, n) = state.get
            state.remove()
            Iterator((user, start, n))
          } else {
            val ts = rows.map(_._3).toArray.sorted
            val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
            var st = state.getOption
            ts.foreach { t =>
              st match {
                case Some((start, last, n)) =>
                  if (t - last > gapUs) { out += ((user, start, n)); st = Some((t, t, 1L)) }
                  else st = Some((start, math.max(last, t), n + 1))
                case None => st = Some((t, t, 1L))
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s._2 / 1000 + gapUs / 1000)
            }
            out.iterator
          }
      }
      .toDF("user_id", "sess_start_us", "n_events")
    val q = sessions.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ett_sessions").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ett_sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // batch reference: gaps-and-islands sessions; EMITTED = sessions
    // closed by a successor (every session but each user's last) plus
    // last sessions whose timeout (last + gap) is at or before the
    // final watermark (max ts - 10 min)
    val evb = Tables.events(spark, TestSpark.SF)
      .select(col("user_id"), expr("unix_micros(ts)").as("t"))
    val uw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("t"))
    val run = uw.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val sess = evb
      .withColumn("prev", lag(col("t"), 1).over(uw))
      .withColumn("new_s", when(col("prev").isNull || col("t") - col("prev") > gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(run))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("t")).as("start"), max(col("t")).as("last"), count(lit(1)).as("n"))
    val maxT = evb.agg(max(col("t"))).head.getLong(0)
    val watermarkUs = maxT - 10L * 60 * 1000000
    val lastSid = sess.groupBy(col("user_id")).agg(max(col("sid")).as("last_sid"))
    val expected = sess.join(lastSid, Seq("user_id"))
      .filter(col("sid") < col("last_sid") ||
        (col("last") + gapUs) <= watermarkUs)
      .select(col("user_id"), col("start"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected,
      s"got ${got.size} expected ${expected.size} " +
        s"extra=${(got -- expected).toSeq.sortBy(_._2).take(5)} " +
        s"missing=${(expected -- got).toSeq.sortBy(_._2).take(5)}")
    assert(expected.nonEmpty)
  }

  test("stream-stream join: multi-batch pairs equal the batch join, incl. cross-batch") {
    // Time-ordered quartile files, one per micro-batch: a purchase in
    // batch N+1 must still find its view from batch N in the join state
    // (the watermark is 30 min behind, so that state is retained).
    // Random splits would instead make late data and drop rows — the
    // point of the ordering is that equality with the batch join is the
    // CORRECT expectation, not a lucky one.
    val stage = Files.createTempDirectory("graft_ss_join_").toString
    val ev = spark.read.parquet(s"${TestSpark.SF}/events.parquet")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("ts"))
    val quarts = ev.withColumn("q", ntile(4).over(w))
    (1 to 4).foreach { i =>
      val part = Files.createTempDirectory(s"graft_ss_part$i").toString
      quarts.filter(col("q") === i).drop("q")
        .coalesce(1).write.mode("overwrite").parquet(part)
      val src = new java.io.File(part).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = java.nio.file.Paths.get(stage, f"batch_$i%02d.parquet")
      Files.move(src, dst)
      // FileStreamSource orders by modification time; make it explicit
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 10000L))
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
      .transform(graft.Tables.tsToTimestamp)
    val joined = graft.operators.StreamingJoins.viewPurchaseJoin(stream)
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ss_join").start()
    q.processAllAvailable()
    val batches = q.recentProgress.length
    q.stop()
    assert(batches >= 4, s"expected >=4 micro-batches, saw $batches")
    def pairSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), unix_micros(col("v_ts")).as("vt"),
        unix_micros(col("p_ts")).as("pt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = pairSet(spark.table("ss_join"))
    val evTs = Tables.events(spark, TestSpark.SF)
    val views = evTs.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"))
    val purchases = evTs.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val batchJoin = views.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"))
    val expected = pairSet(batchJoin)
    assert(streamed == expected)
    assert(expected.nonEmpty)
  }

  test("event-time timeout: sessions of silent users emit when LATER batches advance the watermark") {
    // batch 1: users 1 and 2 produce events, then go silent forever.
    // batch 2: only user 3 speaks, 3 hours later — its events push the
    // watermark past users 1/2's gap deadlines, so their sessions can
    // ONLY reach the sink through the EventTimeTimeout timer firing in
    // a later batch. This is the cross-batch timer path the single-file
    // driver query cannot exercise.
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(offsetMin: Long) = new java.sql.Timestamp(t0 + offsetMin * 60000L)
    val stage = Files.createTempDirectory("graft_stream_timer_").toString
    Seq((1L, ts(0)), (1L, ts(1)), (1L, ts(2)), (2L, ts(5)))
      .toDF("user_id", "ts").coalesce(1)
      .write.parquet(s"$stage/b1")
    Seq((3L, ts(180)), (3L, ts(181)))
      .toDF("user_id", "ts").coalesce(1)
      .write.parquet(s"$stage/b2")
    // force source pick order: batch 1's file strictly older
    new java.io.File(s"$stage/b1").listFiles().foreach(_.setLastModified(t0))
    val schema = spark.read.parquet(s"$stage/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$stage/*")
    val sessions = graft.operators.StreamingSession.sessionize(stream)
    val q = sessions.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_timer").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_timer")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val usec = (m: Long) => (t0 + m * 60000L) * 1000L
    // users 1 and 2: emitted by TIMER (no later event of theirs exists)
    assert(got.contains((1L, usec(0), 3L)), s"user 1 session missing from $got")
    assert(got.contains((2L, usec(5), 1L)), s"user 2 session missing from $got")
    // user 3's session stays OPEN (nothing advanced the watermark past
    // its deadline) — it must NOT appear
    assert(!got.exists(_._1 == 3L), s"user 3's open session leaked: $got")
  }

  test("transformWithState: ValueState accumulates across micro-batches (RocksDB provider)") {
    // 4 files, one per micro-batch: each user's LAST Update-mode
    // emission must equal the all-data totals — state carried across
    // batches through the typed ValueState, not recomputed per batch.
    val stage = Files.createTempDirectory("graft_tws_").toString
    val ev = spark.read.parquet(s"${TestSpark.SF}/events.parquet")
    ev.repartition(4).write.mode("overwrite").parquet(stage)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
      .select(col("user_id"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .as[graft.operators.TransformState.EventIn]
    val out = stream.groupByKey(_.user_id)
      .transformWithState(new graft.operators.TransformState.UserTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
    val pk = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(pk)
    spark.conf.set(pk,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = out.writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("tws_multi").start()
    try { q.processAllAvailable() } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(pk, v)
        case None => spark.conf.unset(pk)
      }
    }
    // Update mode emits one row per (user, touched batch); the final
    // totals are the max-n_events row per user
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("n_events").desc)
    val last = spark.table("tws_multi")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("n_events"), col("cents_sum"), col("min_event"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val expected = Tables.events(spark, TestSpark.SF)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("c"),
        min(col("event_id")).as("m"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(last == expected)
  }

  test("streaming CDC diff: every emission's patch-fold view equals its document; patches are incremental") {
    // 4 files → up to 4 emissions per user. Beyond the driver gate
    // (which checks only the FINAL emission), assert the invariant at
    // EVERY emission: recon (fold of emitted patches over {}) equals
    // the directly-built document — i.e. the change feed is losslessly
    // replayable at every point, not just at the end. Also pin that a
    // later emission's patch is incremental: it parses as an object
    // strictly smaller than the full document for keys that did not
    // change (the 't' subtree diff only carries touched types).
    val stage = Files.createTempDirectory("graft_cdc_").toString
    val ev = spark.read.parquet(s"${TestSpark.SF}/events.parquet")
    ev.repartition(4).write.mode("overwrite").parquet(stage)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
      .select(col("user_id"), col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .as[graft.operators.TransformState.DocEvent]
    val out = stream.groupByKey(_.user_id)
      .transformWithState(new graft.operators.TransformState.VariantCdcProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
    val pk = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(pk)
    spark.conf.set(pk,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = out.writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("cdc_multi").start()
    try { q.processAllAvailable() } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(pk, v)
        case None => spark.conf.unset(pk)
      }
    }
    val rows = spark.table("cdc_multi")
      .select(col("user_id"), col("n_events"), col("doc"), col("recon"), col("patch"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(2) === r.getString(3),
        s"user ${r.getLong(0)} at n=${r.getLong(1)}: recon != doc")
    }
    // at least one user emitted more than once, and its later patch is
    // a genuine increment (no full "t" replacement of untouched keys:
    // the patch is smaller than the document)
    val multi = rows.groupBy(_.getLong(0)).filter(_._2.length >= 2)
    assert(multi.nonEmpty, "no user spanned multiple micro-batches")
    // never larger (a patch re-states only changed keys)…
    multi.values.foreach { emissions =>
      val later = emissions.sortBy(_.getLong(1)).last
      assert(later.getString(4).length <= later.getString(2).length)
    }
    // …and for SOME user a type went untouched in its last batch, so
    // its patch is strictly smaller than the full document
    assert(multi.values.exists { emissions =>
      val later = emissions.sortBy(_.getLong(1)).last
      later.getString(4).length < later.getString(2).length
    }, "no later patch was strictly smaller than its document")
  }
}
