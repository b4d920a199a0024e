package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** SumMinTfSorted — the compiled merge-walk kernel behind exact
  * weighted-Jaccard verification in the wminhash dedup lanes.
  * Property: over sorted unique-key entry arrays it equals the
  * brute-force Σ min(tf_a, tf_b) over the key intersection, and
  * Σmax = Σtf_a + Σtf_b − Σmin equals the brute-force union fold.
  */
class SumMinTfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def entries(m: Map[String, Long]): Seq[(String, Long)] =
    m.toSeq.sortBy(_._1)

  test("sum_min_tf_sorted equals brute-force Σmin on 200 random multiset pairs") {
    val rnd = new Random(42)
    val vocab = (0 until 30).map(i => s"tok$i")
    val cases = (0 until 200).map { i =>
      val a = vocab.filter(_ => rnd.nextBoolean())
        .map(t => t -> (1L + rnd.nextInt(5))).toMap
      val b = vocab.filter(_ => rnd.nextBoolean())
        .map(t => t -> (1L + rnd.nextInt(5))).toMap
      (i, entries(a), entries(b), a, b)
    }
    val df = cases.map { case (i, ea, eb, _, _) => (i, ea, eb) }
      .toDF("i", "ea", "eb")
      .select(col("i"),
        VariantFunctions.sum_min_tf_sorted(
          col("ea").cast("array<struct<g:string,tf:bigint>>"),
          col("eb").cast("array<struct<g:string,tf:bigint>>")).as("smin"))
    val got = df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    cases.foreach { case (i, _, _, a, b) =>
      val want = (a.keySet & b.keySet).toSeq
        .map(k => math.min(a(k), b(k))).sum
      assert(got(i) === want, s"case $i")
      // the Σmax identity the verify stage relies on
      val wantMax = (a.keySet ++ b.keySet).toSeq
        .map(k => math.max(a.getOrElse(k, 0L), b.getOrElse(k, 0L))).sum
      assert(a.values.sum + b.values.sum - want === wantMax, s"max identity $i")
    }
  }

  test("sum_min_tf_sorted over xxhash64-keyed long entries equals the string walk") {
    // r13: the wminhash verify ships struct<long,long> entries sorted by
    // the hash — the walk must agree with the string-keyed walk whenever
    // the hash is injective on the pair's union (always, in practice)
    val rnd = new Random(43)
    val vocab = (0 until 40).map(i => s"gram $i x")
    val cases = (0 until 200).map { i =>
      val a = vocab.filter(_ => rnd.nextBoolean())
        .map(t => t -> (1L + rnd.nextInt(5))).toMap
      val b = vocab.filter(_ => rnd.nextBoolean())
        .map(t => t -> (1L + rnd.nextInt(5))).toMap
      (i, entries(a), entries(b))
    }
    val df = cases.toDF("i", "ea", "eb")
      .select(col("i"),
        VariantFunctions.sum_min_tf_sorted(
          col("ea").cast("array<struct<g:string,tf:bigint>>"),
          col("eb").cast("array<struct<g:string,tf:bigint>>")).as("s_str"),
        VariantFunctions.sum_min_tf_sorted(
          expr("sort_array(transform(CAST(ea AS array<struct<g:string,tf:bigint>>), " +
            "e -> struct(xxhash64(e.g) AS h, e.tf AS tf)))"),
          expr("sort_array(transform(CAST(eb AS array<struct<g:string,tf:bigint>>), " +
            "e -> struct(xxhash64(e.g) AS h, e.tf AS tf)))"))
          .as("s_hash"))
    assert(df.filter(col("s_str") =!= col("s_hash")).count() === 0)
  }

  test("sum_min_tf_sorted: empty, disjoint, identical, null") {
    val df = Seq(
      (1, Seq.empty[(String, Long)], Seq("a" -> 2L)),
      (2, Seq("a" -> 2L), Seq("b" -> 3L)),
      (3, Seq("a" -> 2L, "b" -> 3L), Seq("a" -> 2L, "b" -> 3L))
    ).toDF("i", "ea", "eb")
      .select(col("i"), VariantFunctions.sum_min_tf_sorted(
        col("ea").cast("array<struct<g:string,tf:bigint>>"),
        col("eb").cast("array<struct<g:string,tf:bigint>>")).as("smin"))
    assert(df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap ===
      Map(1 -> 0L, 2 -> 0L, 3 -> 5L))
    val n = Seq((1, null: String)).toDF("i", "s")
      .select(VariantFunctions.sum_min_tf_sorted(
        expr("CAST(NULL AS array<struct<g:string,tf:bigint>>)"),
        expr("array(named_struct('g', 'a', 'tf', CAST(1 AS BIGINT)))")))
      .collect()
    assert(n(0).isNullAt(0))
  }
}
