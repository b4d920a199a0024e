package graft

import org.scalatest.funsuite.AnyFunSuite

/** t1 smoke (BASELINE.md): every declared query runs at sf0.001 and the
  * known-nonempty ones return rows.
  */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val mayBeEmpty = Set("e_cosine_near_dup", "d_minhash_lsh", "d_simhash",
    "d_ngram_jaccard", "q_anti_join", "q_set_except")

  Queries.all.foreach { q =>
    test(s"query ${q.name} runs on sf0.001") {
      // Execute the query's OWN plan (toRdd), not count(): a count() on
      // top lets column pruning drop the output projections, hiding
      // binding/codegen crashes in expressions the driver's noop write
      // WOULD materialize (caught live: an aggregate-fusion rewrite that
      // only crashed when the projected column was materialized).
      val n = q.build(spark, TestSpark.SF).queryExecution.toRdd.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("approx_count_distinct stays within 5% of exact") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, TestSpark.SF)
    val rows = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("a"),
        countDistinct(col("l_partkey")).as("e"))
      .collect()
    rows.foreach { r =>
      val a = r.getLong(1).toDouble
      val e = r.getLong(2).toDouble
      assert(math.abs(a - e) / e < 0.05, s"approx $a vs exact $e")
    }
  }

  test("every query name has either an oracle or a documented omission") {
    val noOracle = Queries.all.filter(_.oracle.isEmpty).map(_.name).toSet
    // only the approximate (non-SQL-expressible) operators may omit oracles
    assert(noOracle.subsetOf(Set(
      "d_minhash_lsh", "d_simhash", "d_winnow",
      "e_ann_lsh", "e_ann_ivf", "e_ann_pq", "e_semantic_dedup",
      "q_approx_distinct",
      "mm_features", "mm_pipeline", "s_minhash_dedup", "s_ann_serve")))
  }
}
