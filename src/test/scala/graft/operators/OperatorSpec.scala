package graft.operators

import graft.{TestSpark, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality properties of the dedup/similarity operators: the LSH paths
  * must (on the fixture corpus) recover what the exact quadratic paths
  * find.
  */
class OperatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables.documents(spark, TestSpark.SF)

  test("minhash LSH finds every exact-Jaccard pair above threshold (recall = 1 on fixture)") {
    // exact quadratic ground truth, unblocked
    val toks = docs.select(col("doc_id").as("id"),
      array_distinct(TextAnalysis.tokens("text")).as("toks"))
    val a = toks.select(col("id").as("id_a"), col("toks").as("toks_a"))
    val b = toks.select(col("id").as("id_b"), col("toks").as("toks_b"))
    val exact = a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("jac",
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
          size(array_union(col("toks_a"), col("toks_b"))))
      .filter(col("jac") >= 0.7)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val lsh = Dedup.minhashDedup(docs, "doc_id", "text", numHashes = 128, bands = 32, threshold = 0.7)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // LSH candidates are exact-verified, so no false positives possible;
    // recall on this corpus with b=32, r=4 at t=0.7 should be total.
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    assert(exact == lsh, s"missed pairs: ${exact -- lsh}")
  }

  test("simhash of near-identical token lists has small hamming distance") {
    val r = spark.sql(
      """SELECT bit_count(simhash64(array('a','b','c','d','e','f','g','h')) ^
        |                 simhash64(array('a','b','c','d','e','f','g','x'))) AS near,
        |       bit_count(simhash64(array('a','b','c','d','e','f','g','h')) ^
        |                 simhash64(array('p','q','r','s','t','u','v','w'))) AS far
        |""".stripMargin).collect()(0)
    assert(r.getInt(0) < r.getInt(1))
  }

  test("brute-force ANN: a vector's nearest neighbor by construction ranks first") {
    // plant a near-duplicate of vec 0 and check it comes back at rank 1
    val emb = Tables.embeddings(spark, TestSpark.SF)
    val v0 = emb.filter(col("vec_id") === 0).select("embedding").as[Seq[Float]].head()
    val planted = v0.updated(0, v0.head + 0.001f)
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .union(Seq((99999L, planted)).toDF("vec_id", "embedding"))
    val probes = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val top = Similarity.bruteForceTopK(corpus, probes, 1).collect()(0)
    assert(top.getAs[Long]("neighbor_id") == 99999L)
  }

  test("exact dedup groups identical texts") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("doc_id", "text")
    val out = df.groupBy(md5(col("text")).as("fp"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 2L), (3L, 1L)))
  }

  test("multimodal stub decode emits typed metadata per blob") {
    val out = Multimodal.blobMeta(spark, docs.limit(5)).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getAs[Long]("n_bytes") > 0)
      assert(r.getAs[Long]("width") >= 64 && r.getAs[Long]("width") < 576)
      assert(Set("png", "jpeg", "webp").contains(r.getAs[String]("fmt")))
    }
  }
}
