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

  test("results are shuffle-partition-count invariant (representative subset)") {
    // At 1000 executors the shuffle partition count is whatever the
    // cluster sizes it to — results must not depend on it. Covers the
    // operators where invariance is EARNED, not free: mergeable sketches
    // (bottom-k sample, Misra-Gries heavy hitters), the schema-lattice
    // aggregate, the content-keyed split, the LM scorers, z-order
    // locality stats, ANN ranking.
    val names = Seq("q1_pricing_summary", "d_sample", "d_heavy_hitters",
      "d_train_split", "v_schema_agg", "d_unigram_score", "d_bigram_score",
      "q_zorder", "e_ann_topk", "q_topk_agg", "q_map_funcs", "q_try_funcs",
      "q9_profit", "v_grouped_topk", "d_dup_clusters", "q_quantile_2pass",
      "q_equidepth_hist", "d_weighted_sample", "d_fuzzy_join",
      "q_skyline", "q_incremental_agg", "d_triangle_count",
      "q_fingerprint_table", "q_approx_quantile_gate", "q_regression",
      // round-7: bitmap sketch merge order, window-frame distinct,
      // containment candidates, e8-integer centroids, BSP relax rounds
      "q_bitmap_distinct", "q_bitmap_rollup", "q_running_distinct",
      "q_window_distinct", "d_containment_join", "e_label_centroids",
      "d_sssp", "q_ewma", "d_novelty", "e_ann_recall",
      // round-8: bitmap AND on merged sketches, ppm-sum MaxSim scores,
      // cross-multiplied drift ranking, greedy MMR over ppm sims,
      // vocabulary first-occurrence buckets, BPE chain sums
      "q_bitmap_overlap", "e_maxsim", "e_embed_drift", "e_mmr_rerank",
      "d_vocab_growth", "d_bpe_apply", "e_hard_negatives", "d_k_anonymity",
      "d_temperature_sample", "e_rrf_hybrid", "d_span_mask",
      // driver-round-7: sliding bitmap OR over hour buckets, corpus-wide
      // repeated-gram counting + island merge
      "q_sliding_distinct", "d_repeated_ngram_strip")
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    def results(n: String): Seq[String] =
      Queries.queryMap(n)(spark, TestSpark.SF).collect().map(_.toString).toSeq
    try {
      val base = names.map(n => n -> results(n)).toMap
      spark.conf.set(key, "5")
      names.foreach { n =>
        assert(results(n) == base(n), s"$n result depends on partition count")
      }
    } finally spark.conf.set(key, prev)
  }

  test("every query name has either an oracle or a documented omission") {
    val noOracle = Queries.all.filter(_.oracle.isEmpty).map(_.name).toSet
    // only the approximate (non-SQL-expressible) operators may omit oracles
    assert(noOracle.subsetOf(Set(
      "d_minhash_lsh", "d_simhash", "d_winnow", "d_wminhash_lsh",
      "e_ann_lsh", "e_ann_ivf", "e_ann_pq", "e_ann_ivfpq", "e_ann_sq8",
      "e_semantic_dedup"))) // approximate sketch/ANN families:
             // driver-gated by e_ann_recall / d_minhash_gate digests
  }
}
