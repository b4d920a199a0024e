package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Source/sink breadth (SURVEY §2.2 scans/sinks rows): JSON-lines and
  * CSV round-trips of driver data, and partitioned parquet writes whose
  * partition filters prune at the scan.
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("JSON-lines sink + source round-trips events (variant parse intact)") {
    import graft.functions.{VariantFunctions => vf}
    import org.apache.spark.sql.types.LongType
    val dir = tmp("graft_jsonl_")
    val ev = Tables.events(spark, TestSpark.SF)
    ev.write.mode("overwrite").json(s"$dir/events_json")
    val back = spark.read.schema(ev.schema).json(s"$dir/events_json")
    assert(back.count() == ev.count())
    val sumOrig = ev.withColumn("v", vf.variant_from_json(col("props")))
      .agg(sum(vf.variant_get(col("v"), "$.k", LongType))).collect()(0).getLong(0)
    val sumBack = back.withColumn("v", vf.variant_from_json(col("props")))
      .agg(sum(vf.variant_get(col("v"), "$.k", LongType))).collect()(0).getLong(0)
    assert(sumOrig == sumBack)
  }

  test("CSV sink + source round-trips lineitem aggregates") {
    val dir = tmp("graft_csv_")
    val li = Tables.lineitem(spark, TestSpark.SF)
      .select("l_orderkey", "l_quantity", "l_returnflag")
    li.write.mode("overwrite").option("header", "true").csv(s"$dir/li_csv")
    val back = spark.read.schema(li.schema).option("header", "true").csv(s"$dir/li_csv")
    val a = li.groupBy("l_returnflag").agg(sum(col("l_quantity").cast("decimal(18,2)")).as("s"))
      .collect().map(r => (r.getString(0), r.getDecimal(1))).toMap
    val b = back.groupBy("l_returnflag").agg(sum(col("l_quantity").cast("decimal(18,2)")).as("s"))
      .collect().map(r => (r.getString(0), r.getDecimal(1))).toMap
    assert(a == b)
  }

  test("ORC sink + source round-trips an encoded variant column byte-exactly") {
    import graft.functions.{VariantFunctions => vf}
    import org.apache.spark.sql.types.LongType
    val dir = tmp("graft_orc_")
    val ev = Tables.events(spark, TestSpark.SF)
      .withColumn("v", vf.variant_from_json(col("props")))
      .select("event_id", "v")
    ev.write.mode("overwrite").orc(s"$dir/ev_orc")
    val back = spark.read.orc(s"$dir/ev_orc")
    assert(back.count() == ev.count())
    // the binary struct survives ORC verbatim: extraction agrees row-wise
    val joined = ev.select(col("event_id"), col("v").as("v1"))
      .join(back.select(col("event_id"), col("v").as("v2")), Seq("event_id"))
      .filter(!(vf.variant_get(col("v1"), "$.k", LongType) <=>
        vf.variant_get(col("v2"), "$.k", LongType)) ||
        !(col("v1") <=> col("v2")))
    assert(joined.count() == 0)
  }

  test("shredded variant fields get parquet filter pushdown; raw variant does not") {
    import graft.functions.{VariantFunctions => vf}
    import graft.operators.Shred
    val dir = tmp("graft_shred_")
    val parsed = Tables.events(spark, TestSpark.SF)
      .withColumn("v", vf.variant_from_json(col("props")))
    val fields = Shred.inferFields(parsed, "v")
    assert(fields == Seq(("$.k", org.apache.spark.sql.types.LongType, "v_k")), fields)
    Shred.autoShred(parsed, "v")
      .select("event_id", "v", "v_k")
      .write.mode("overwrite").parquet(s"$dir/shredded")
    val back = spark.read.parquet(s"$dir/shredded")
    val plan = back.filter(col("v_k") > 90).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(v_k), GreaterThan(v_k,90)]"), plan)
    // shredded result equals extracting from the variant column
    val a = back.filter(col("v_k") > 90).count()
    val b = back.filter(
      vf.variant_get(col("v"), "$.k", org.apache.spark.sql.types.LongType) > 90).count()
    assert(a == b && a > 0)
  }

  test("partitioned parquet write: partition filter prunes the scan") {
    val dir = tmp("graft_part_")
    Tables.events(spark, TestSpark.SF)
      .write.mode("overwrite").partitionBy("event_type").parquet(s"$dir/ev_part")
    val q = spark.read.parquet(s"$dir/ev_part")
      .filter(col("event_type") === "click")
      .select(count(lit(1)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    // variant column persists through parquet as struct<metadata,value>
    import graft.functions.{VariantFunctions => vf}
    val vdir = s"$dir/variant_out"
    Tables.events(spark, TestSpark.SF)
      .withColumn("v", vf.variant_from_json(col("props")))
      .select("event_id", "v")
      .write.mode("overwrite").parquet(vdir)
    val back = spark.read.parquet(vdir)
    val n = back.filter(vf.variant_get(col("v"), "$.k", org.apache.spark.sql.types.LongType) > 90)
      .count()
    assert(n > 0)
  }

  test("file-level variant interop: our bytes survive a parquet hop as native VariantType") {
    import spark.implicits._
    import graft.functions.{VariantFunctions => vf}
    val dir = java.nio.file.Files.createTempDirectory("graft_vint_").toString
    // OUR encoding -> native VariantType column -> parquet -> read ->
    // back through the bridge -> extract with OUR reader
    val src = Seq(
      (1L, """{"k": 7, "s": "a"}"""),
      (2L, """{"k": -3, "s": "b", "nested": {"x": [1, 2]}}"""),
      (3L, """{"k": 9007199254740993, "s": null}""")).toDF("id", "j")
    src.select($"id", vf.to_spark_variant(vf.variant_from_json($"j")).as("v"))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
      .select($"id",
        vf.variant_get(vf.from_spark_variant($"v"), "$.k", "bigint").as("k"),
        vf.variant_get(vf.from_spark_variant($"v"), "$.nested.x[1]", "bigint").as("x1"))
      .orderBy($"id").collect()
    assert(back.map(_.getLong(1)).toSeq === Seq(7L, -3L, 9007199254740993L))
    assert(back(1).getLong(2) === 2L)
    // reverse direction: Spark's builtin parse_json writes the file;
    // our reader extracts the same values the builtin does
    val dir2 = java.nio.file.Files.createTempDirectory("graft_vint2_").toString
    src.selectExpr("id", "parse_json(j) AS v").write.mode("overwrite").parquet(dir2)
    // our SQL registration shadows the builtin variant_get name, so the
    // builtin-side reference value goes through to_json (builtin)
    val both = spark.read.parquet(dir2)
      .select($"id",
        expr("CAST(get_json_object(to_json(v), '$.k') AS BIGINT)").as("builtin_k"),
        vf.variant_get(vf.from_spark_variant($"v"), "$.k", "bigint").as("our_k"))
      .collect()
    both.foreach(r => assert(r.getLong(1) === r.getLong(2), r.toString))
  }

  test("parquet codec choice: zstd writes smaller than snappy, values identical") {
    val docs = Tables.documents(spark, TestSpark.SF)
    def sizeOf(dir: String): Long =
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).toArray
        .map(_.asInstanceOf[java.nio.file.Path].toFile)
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.length).sum
    val snappyDir = java.nio.file.Files.createTempDirectory("graft_snappy_").toString
    val zstdDir = java.nio.file.Files.createTempDirectory("graft_zstd_").toString
    docs.coalesce(1).write.mode("overwrite").option("compression", "snappy").parquet(snappyDir)
    docs.coalesce(1).write.mode("overwrite").option("compression", "zstd").parquet(zstdDir)
    val (sn, zs) = (sizeOf(snappyDir), sizeOf(zstdDir))
    assert(zs < sn, s"zstd $zs not smaller than snappy $sn")
    val a = spark.read.parquet(snappyDir).orderBy("doc_id").collect().map(_.toString)
    val b = spark.read.parquet(zstdDir).orderBy("doc_id").collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }
}
