package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables
import graft.functions.{VariantFunctions => vf}

/** Ad-hoc perf probes against sf0.1. Run: sbt "runMain graft.tools.PerfProbe" */
object PerfProbe {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[perf] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"

    val ev = Tables.events(spark, d)
    time("warmup count")(ev.count())

    // Throughput record: JSON→variant conversion (the reference's single
    // kernel) over the events corpus.
    locally {
      val rows = ev.count()
      val bytes = ev.agg(sum(length(col("props")))).collect()(0).getLong(0)
      // warm once, then measure
      ev.select(vf.variant_from_json(col("props")).as("v"))
        .write.mode("overwrite").format("noop").save()
      val t0 = System.nanoTime()
      ev.select(vf.variant_from_json(col("props")).as("v"))
        .write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[perf] parse throughput: ${rows / secs / 1e6}%.2f M rows/s, " +
        f"${bytes / secs / 1e6}%.1f MB/s JSON in ($rows rows, $secs%.3f s, local[32])")
      // The staged file is ONE scan partition, so the number above is a
      // single-core figure (repartitioning 100k tiny rows costs more
      // than parsing them). For the scaling figure a many-file 100 TB
      // scan sees natively, generate the JSON in place on 32 partitions
      // (range → format_string, zero shuffle) and parse 3.2M rows.
      val n = 3200000L
      val gen = spark.range(0, n, 1, 32)
        .select(format_string("""{"k": %d, "s": "ev%d", "f": %d.5}""",
          col("id") % 200, col("id"), col("id") % 7).as("props"))
      val par = gen.select(vf.variant_from_json(col("props")).as("v"))
      par.write.mode("overwrite").format("noop").save()
      gen.write.mode("overwrite").format("noop").save()
      val tg = System.nanoTime()
      gen.write.mode("overwrite").format("noop").save()
      val gsecs = (System.nanoTime() - tg) / 1e9
      val t1 = System.nanoTime()
      par.write.mode("overwrite").format("noop").save()
      val psecs = (System.nanoTime() - t1) / 1e9
      println(f"[perf] parse throughput (32-way, 3.2M rows): ${n / psecs / 1e6}%.2f M rows/s " +
        f"(generation-only baseline ${n / gsecs / 1e6}%.2f M rows/s)")
    }

    def parsed = ev.withColumn("v", vf.variant_from_json(col("props")))

    time("parse+extract+agg (v_sum_by_type)") {
      parsed.groupBy(col("event_type"))
        .agg(sum(vf.variant_get(col("v"), "$.k", LongType)).as("k_sum"))
        .write.mode("overwrite").format("noop").save()
    }
    time("parse only, count via agg") {
      parsed.select(vf.variant_get(col("v"), "$.k", LongType).as("k"))
        .agg(sum(col("k"))).write.mode("overwrite").format("noop").save()
    }
    // Secondary yardstick (BASELINE.md): Spark 4.1's built-in variant
    // expressions on the identical workload. Constructed directly — our
    // extension shadows the registry names.
    time("BUILTIN parse_json+variant_get agg") {
      import org.apache.spark.sql.catalyst.expressions.variant.{ParseJson, VariantGet => SparkVG}
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.graftbridge.Bridge
      val parsedB = Bridge.column(ParseJson(Bridge.expression(col("props")), true))
      ev.withColumn("v", parsedB)
        .withColumn("k", Bridge.column(SparkVG(Bridge.expression(col("v")),
          Literal.create("$.k"), org.apache.spark.sql.types.LongType, true, None)))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("k_sum"))
        .write.mode("overwrite").format("noop").save()
    }
    time("OURS    parse+variant_get agg (2nd run)") {
      parsed.groupBy(col("event_type"))
        .agg(sum(vf.variant_get(col("v"), "$.k", LongType)).as("k_sum"))
        .write.mode("overwrite").format("noop").save()
    }

    // String-target extraction (the most common user operation): fused
    // path vs Spark's builtin variant vs get_json_object.
    locally {
      import org.apache.spark.sql.catalyst.expressions.variant.{ParseJson, VariantGet => SparkVG}
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.graftbridge.Bridge
      import org.apache.spark.sql.types.StringType
      val q = ev.select(vf.variant_get(
        vf.variant_from_json(col("props")), "$.k", StringType).as("ks"))
      q.write.mode("overwrite").format("noop").save() // warm
      time("OURS    fused string extraction") {
        q.write.mode("overwrite").format("noop").save()
      }
      time("BUILTIN variant string extraction") {
        ev.select(Bridge.column(SparkVG(
            Bridge.expression(Bridge.column(ParseJson(Bridge.expression(col("props")), true))),
            Literal.create("$.k"), StringType, true, None)).as("ks"))
          .write.mode("overwrite").format("noop").save()
      }
      time("BUILTIN get_json_object") {
        ev.select(get_json_object(col("props"), "$.k").as("ks"))
          .write.mode("overwrite").format("noop").save()
      }
    }

    // Read-back extraction: decoded-metadata id cache vs full re-parse.
    // Metadata marks are stripped so the shredded-pushdown rule cannot
    // shortcut the decode.
    locally {
      val staged = graft.operators.Shred.stageShreddedTable(spark, d)
      // mark-free read schema: the relation attrs carry no shred marks,
      // so the rewrite cannot shortcut the decode we want to measure
      val stripped = org.apache.spark.sql.types.StructType(
        spark.read.parquet(staged).schema.map(
          _.copy(metadata = org.apache.spark.sql.types.Metadata.empty)))
      val t = spark.read.schema(stripped).parquet(staged)
        .select(col("event_id"), col("v"))
      val q = t.select(vf.variant_get(col("v"), "$.k", LongType).as("k"))
        .agg(sum(col("k")))
      q.write.mode("overwrite").format("noop").save() // warm
      time("readback variant_get (id cache)") {
        q.write.mode("overwrite").format("noop").save()
      }
      time("reparse variant_get (same rows)") {
        parsed.select(vf.variant_get(col("v"), "$.k", LongType).as("k"))
          .agg(sum(col("k"))).write.mode("overwrite").format("noop").save()
      }
    }

    for (i <- 1 to 2) time(s"d_minhash_lsh run $i") {
      graft.Queries.queryMap("d_minhash_lsh")(spark, d)
        .write.mode("overwrite").format("noop").save()
    }

    val filterQ = parsed
      .withColumn("k", vf.variant_get(col("v"), "$.k", LongType))
      .filter(col("k") > 90)
      .select(col("event_id"), col("k"))
      .orderBy(col("event_id"))
    time("v_filter_high as written") {
      filterQ.write.mode("overwrite").format("noop").save()
    }
    println(filterQ.queryExecution.optimizedPlan.treeString.take(1500))
    spark.stop()
  }
}
