package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Robustness corners: the parse memo under concurrency, the lenient
  * cast matrix, and parallel correctness of the full parse path.
  */
class RobustnessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("parse memo is thread-safe: 32-way parallel parse of distinct payloads stays correct") {
    // many partitions, each thread interleaving distinct JSON docs; a
    // broken memo would cross-contaminate results between rows
    val n = 20000
    val df = spark.range(n).repartition(32)
      .withColumn("j", concat(lit("""{"k": """), col("id"), lit("}")))
      .withColumn("k", VariantFunctions.variant_get(
        VariantFunctions.variant_from_json(col("j")), "$.k", LongType))
    val bad = df.filter(col("k") =!= col("id")).count()
    assert(bad == 0)
    // and the sum matches closed form
    val s = df.agg(sum(col("k"))).collect()(0).getLong(0)
    assert(s == n.toLong * (n - 1) / 2)
  }

  test("lenient cast matrix: try extraction yields NULL, never an error") {
    val cases = Seq(
      ("""{"x": "not a number"}""", "bigint"),
      ("""{"x": "not a number"}""", "double"),
      ("""{"x": [1]}""", "bigint"),
      ("""{"x": {"y": 1}}""", "boolean"),
      ("""{"x": 1.5}""", "boolean"),
      ("""{"x": 99999999999999999999999999999999999999999}""", "decimal(38,0)"),
      ("""{"x": true}""", "double"))
    cases.foreach { case (doc, tpe) =>
      val r = spark.sql(
        s"""SELECT try_variant_get(try_variant_from_json('$doc'), '$$.x', '$tpe') AS v""")
        .collect()(0)
      assert(r.isNullAt(0), s"expected NULL for $doc as $tpe")
    }
  }

  test("widening casts that must succeed") {
    val r = spark.sql(
      """SELECT variant_get(variant_from_json('{"x": 5}'), '$.x', 'double') AS a,
        |       variant_get(variant_from_json('{"x": 5}'), '$.x', 'decimal(10,2)') AS b,
        |       variant_get(variant_from_json('{"x": true}'), '$.x', 'bigint') AS c,
        |       variant_get(variant_from_json('{"x": "  42 "}'), '$.x', 'bigint') AS d
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 5.0)
    assert(r.getDecimal(1).toPlainString == "5.00")
    assert(r.getLong(2) == 1L)
    assert(r.getLong(3) == 42L)
  }

  test("fused and unfused paths agree on the lenient matrix") {
    // fused: literal parse composed directly (rule fires for scalars);
    // unfused: via an intermediate non-fusable variant target
    val docs = Seq("""{"x": 1}""", """{"x": "7"}""", """{"x": 2.5}""",
      """{"x": null}""", """{"y": 1}""", """{"x": [3]}""").toDF("j")
    val fused = docs.select(VariantFunctions.variant_get(
        VariantFunctions.try_variant_from_json(col("j")), "$.x", LongType).as("v"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
    val unfused = docs
      .withColumn("vv", VariantFunctions.variant_get(
        VariantFunctions.try_variant_from_json(col("j")), "$.x"))
      .select(VariantFunctions.variant_get(col("vv"), "$", LongType).as("v"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
    assert(fused == unfused, s"fused $fused vs unfused $unfused")
  }
}
