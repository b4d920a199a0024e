package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Queries, TestSpark}

/** Round-7 curation operators: containment-join completeness vs brute
  * force on planted data, novelty boundary cases, streaming-bitmap
  * batch equivalence.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val SF = TestSpark.SF

  test("containmentJoin: complete vs quadratic brute force on planted corpus") {
    // B contains all of A (subset), C shares little, D is a near-subset
    // of B (9/10), E ties exactly at the 0.9 boundary (9/10 tokens)
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i")),                  // A
      (2L, (1 to 40).map(i => s"t$i")),                  // B ⊇ A
      (3L, Seq("x1", "x2", "x3", "x4", "t1")),           // C
      (4L, ((1 to 9).map(i => s"t$i") :+ "zz")),         // D: 9/10 in B
      (5L, (30 to 50).map(i => s"t$i"))                  // E overlaps B
    ).toDF("doc_id", "toks")
    val got = CurationQueries.containmentJoin(docs, 9, 10)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // brute force
    val rows = docs.as[(Long, Seq[String])].collect()
    val want = (for {
      (a, ta) <- rows; (b, tb) <- rows
      if a != b && ta.size >= 4 && tb.size >= 4
      inter = ta.toSet.intersect(tb.toSet).size
      if inter * 10 >= ta.size * 9
    } yield (a, b)).toSet
    assert(got === want)
    assert(want.contains((1L, 2L)))   // subset detected
    assert(want.contains((4L, 2L)))   // boundary 9/10 detected
    assert(!want.contains((2L, 1L)))  // asymmetry: B not inside A
  }

  test("d_novelty: earliest doc is fully novel; exact duplicate is fully stale") {
    val res = Queries.queryMap("d_novelty")(spark, SF)
    val first = res.orderBy($"doc_id").head()
    assert(first.getAs[Long]("novelty_ppm") === 1000000L)
    // every ppm in [0, 1e6] and novel <= total
    assert(res.filter($"novelty_ppm" < 0 || $"novelty_ppm" > 1000000L).count() === 0)
    assert(res.filter($"n_novel" > $"n_grams").count() === 0)
  }

  test("s_bitmap_distinct equals the batch COUNT(DISTINCT) per key") {
    val stream = Queries.queryMap("s_bitmap_distinct")(spark, SF)
      .as[(String, Long)].collect().toMap
    val batch = graft.Tables.events(spark, SF)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(stream === batch)
  }

  test("d_bpe_merge: ranks are 1..20 and counts non-increasing") {
    val rows = Queries.queryMap("d_bpe_merge")(spark, SF)
      .select($"rank", $"n").as[(Long, Long)].collect()
    assert(rows.map(_._1).toSeq === (1L to 20L))
    assert(rows.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("deflate_len: repetition compresses, randomness does not; NCD separates dup from unrelated") {
    import graft.functions.{VariantFunctions => vf}
    val rep = "spark variant engine " * 60
    val uniq = (1 to 180).map(i => s"w${i * 7919}").mkString(" ")
    val rows = Seq((1L, rep), (2L, uniq)).toDF("id", "t")
      .select($"id", vf.deflate_len($"t").as("c"), length($"t").cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ratioRep = rows(1L)._1.toDouble / rows(1L)._2
    val ratioUniq = rows(2L)._1.toDouble / rows(2L)._2
    assert(ratioRep < 0.2, s"repetitive ratio $ratioRep")
    assert(ratioUniq > 2 * ratioRep, s"uniq $ratioUniq vs rep $ratioRep")
    // NCD contrast on the higher-entropy strings (the tiny-C(x) regime
    // of an ultra-repetitive input inflates self-NCD — known small-
    // string behavior of the measure)
    val uniq2 = (1 to 180).map(i => s"v${i * 104729}").mkString(" ")
    val ncds = Seq((uniq, uniq), (uniq, uniq2)).toDF("a", "b")
      .select(vf.ncd_ppm($"a", $"b").as("d")).collect().map(_.getLong(0))
    assert(ncds(0) < 400000L, s"self NCD ${ncds(0)}")
    assert(ncds(1) > ncds(0) + 200000L, s"unrelated NCD ${ncds(1)} vs self ${ncds(0)}")
  }

  test("d_compress_ratio: ratios positive and bounded; digests hold; deterministic across partitioning") {
    import graft.functions.{VariantFunctions => vf}
    // the ratio values themselves (now internal to the digest query)
    val ratios = graft.Tables.documents(spark, SF)
      .select((vf.deflate_len($"text") * 1000000L / length($"text")).as("ratio_ppm"))
    assert(ratios.filter($"ratio_ppm" <= 0 || $"ratio_ppm" > 2000000L).count() === 0)
    val res = Queries.queryMap("d_compress_ratio")(spark, SF)
    assert(res.filter(!$"bounds_ok" || !$"roundtrip_ok").count() === 0)
    val a = res.collect().map(_.toString).toSeq
    val b = Queries.queryMap("d_compress_ratio")(spark, SF).repartition(7)
      .orderBy($"doc_id").collect().map(_.toString).toSeq
    assert(a === b)
  }
}
