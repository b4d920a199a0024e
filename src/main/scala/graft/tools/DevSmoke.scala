package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.functions.{VariantFunctions => vf}

/** Manual end-to-end drive of the variant surface against the driver
  * testdata. Run: `sbt "runMain graft.tools.DevSmoke"`.
  */
object DevSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-dev-smoke")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.createOrReplaceTempView("events")

    println("=== DSL: flagship aggregate over variant_get ===")
    val agg = events
      .withColumn("v", vf.variant_from_json($"props"))
      .groupBy($"event_type")
      .agg(sum(vf.variant_get($"v", "$.k", LongType)).as("k_sum"),
        count(lit(1)).as("n"))
      .orderBy($"event_type")
    agg.show(10, truncate = false)

    println("=== SQL via extensions: variant_get / typeof / to_json ===")
    spark.sql(
      """SELECT props,
        |       variant_get(variant_from_json(props), '$.k', 'bigint') AS k,
        |       variant_typeof(variant_from_json(props)) AS t,
        |       variant_to_json(variant_from_json(props)) AS j,
        |       is_variant_null(variant_get(variant_from_json(props), '$.missing')) AS isn
        |FROM events LIMIT 5""".stripMargin).show(truncate = false)

    println("=== nested JSON through SQL literals ===")
    spark.sql(
      """SELECT variant_get(variant_from_json('{"a": {"b": [1, 2, {"c": 42}]}}'), '$.a.b[2].c', 'bigint') AS deep,
        |       variant_to_json(variant_from_json('{"z": 1, "a": [true, null, 1.5]}')) AS rt,
        |       variant_typeof(variant_from_json('[1,2]')) AS t_arr,
        |       variant_from_json('null') IS NULL AS topnull,
        |       try_variant_from_json('{bad') IS NULL AS badjson,
        |       variant_get(variant_from_json('{"s": "87"}'), '$.s', 'bigint') AS cast_s,
        |       variant_to_json(to_variant(named_struct('x', 1, 'y', array(1.5D), 'z', 'str'))) AS tv
        |""".stripMargin).show(truncate = false)

    println("=== explain (plan shape) ===")
    agg.explain("formatted")

    println("=== wider surface: explode / schema / keys / dedup / ANN / asof ===")
    spark.sql(
      """SELECT key, variant_get(value, '$', 'bigint') AS v
        |FROM (SELECT variant_explode(variant_from_json('{"b": 2, "a": 1}')))""".stripMargin)
      .show(truncate = false)
    spark.sql(
      """SELECT schema_of_variant(variant_from_json('{"a": [1, 2.5]}')) AS sch,
        |       variant_keys(variant_from_json('{"z": 1, "a": 2}')) AS ks,
        |       variant_size(variant_from_json('[1,2,3]')) AS sz,
        |       simhash64(array('a','b')) AS sh,
        |       size(winnow_fingerprints('hello world hello world hello')) AS n_fp
        |""".stripMargin).show(truncate = false)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    println("minhash pairs: " +
      graft.operators.Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.5).count())
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = emb.filter($"vec_id" < 3).select($"vec_id".as("qid"), $"embedding".as("qv"))
    println("ann topk rows: " +
      graft.operators.Similarity.bruteForceTopK(emb, probes, 3).count())
    println("asof rows: " + graft.Queries.queryMap("q_asof_join")(spark, "/root/testdata/sf0.001").count())
    println("range join rows: " + graft.Queries.queryMap("q_range_join")(spark, "/root/testdata/sf0.001").count())

    println("=== round-2 surface: shred pushdown / readback / streaming dedup / curation ===")
    val sf = "/root/testdata/sf0.001"
    val pushPlan = graft.Queries.queryMap("v_shred_pushdown")(spark, sf)
      .queryExecution.executedPlan.toString
    println("shred pushdown fired: " +
      (pushPlan.contains("GreaterThan(v_k,90") && !pushPlan.contains("variant_get")))
    println("readback rows: " + graft.Queries.queryMap("v_readback")(spark, sf).count())
    println("streaming dedup pairs: " +
      graft.Queries.queryMap("s_minhash_dedup")(spark, sf).count())
    println("tfidf top terms: " + graft.Queries.queryMap("d_tfidf")(spark, sf).count())
    println("dedup survivors: " + graft.Queries.queryMap("d_dedup_keep")(spark, sf).count())
    println("packed bins: " + graft.Queries.queryMap("d_pack")(spark, sf).count())

    println("=== round-3 surface: curation pipeline / clusters / SQL / typed / streaming ===")
    graft.Queries.queryMap("d_curate_pipeline")(spark, sf).show(5, truncate = false)
    println("dup clusters: " + graft.Queries.queryMap("d_dup_clusters")(spark, sf).count())
    println("decontaminated: " + graft.Queries.queryMap("d_decontaminate")(spark, sf).count())
    println("sql surface rows: " + graft.Queries.queryMap("v_sql_surface")(spark, sf).count())
    println("typed dataset rows: " + graft.Queries.queryMap("q_typed_dataset")(spark, sf).count())
    println("nested paths rows: " + graft.Queries.queryMap("v_nested_paths")(spark, sf).count())
    println("stream enrich rows: " + graft.Queries.queryMap("s_enrich_join")(spark, sf).count())
    println("stream schema: " +
      graft.Queries.queryMap("s_schema_agg")(spark, sf).collect().mkString(","))

    println("=== round-4 surface: bloom join / sessionize / upsert ===")
    graft.Queries.queryMap("q_bloom_join")(spark, sf).show(5, truncate = false)
    println("sessions: " + graft.Queries.queryMap("q_sessionize")(spark, sf).count())
    println("upsert survivors: " + graft.Queries.queryMap("q_upsert_latest")(spark, sf).count())
    println("merge patch: " + spark.sql(
      """SELECT variant_to_json(variant_merge_patch(
        |  variant_from_json('{"a": {"x": 1, "drop": 2}}'),
        |  variant_from_json('{"a": {"drop": null, "y": 3}}')))""".stripMargin)
      .head().getString(0))
    println("pq ann rows: " + graft.Queries.queryMap("e_ann_pq")(spark, sf).count())
    println("part prune rows: " + graft.Queries.queryMap("q_part_prune")(spark, sf).count())
    println("stream-stream join rows: " + graft.Queries.queryMap("s_stream_join")(spark, sf).count())

    println("=== round-4 late surface: unigram / zorder / wm-dedup / semdedup ===")
    graft.Queries.queryMap("d_unigram_score")(spark, sf).show(3, truncate = false)
    println("zorder buckets: " + graft.Queries.queryMap("q_zorder")(spark, sf).count())
    println("wm-dedup keys: " + graft.Queries.queryMap("s_dedup_watermark")(spark, sf).count())
    println("semantic dedup removed: " +
      graft.Queries.queryMap("e_semantic_dedup")(spark, sf).count())
    println("bigram score rows: " +
      graft.Queries.queryMap("d_bigram_score")(spark, sf).count())
    println("ann serve rows: " + graft.Queries.queryMap("s_ann_serve")(spark, sf).count())
    println("binary source rows: " +
      graft.Queries.queryMap("mm_binary_source")(spark, sf).count())
    println("schema merge rows: " +
      graft.Queries.queryMap("q_schema_merge")(spark, sf).count())
    println("two-phase distinct rows: " +
      graft.Queries.queryMap("q_twophase_distinct")(spark, sf).count())
    println("topk agg rows: " + graft.Queries.queryMap("q_topk_agg")(spark, sf).count())
    println("stream window topk rows: " +
      graft.Queries.queryMap("s_window_topk")(spark, sf).count())
    println("q9 profit rows: " + graft.Queries.queryMap("q9_profit")(spark, sf).count())
    println("datetime sweep rows: " +
      graft.Queries.queryMap("q_datetime_funcs")(spark, sf).count())
    println("map sweep rows: " + graft.Queries.queryMap("q_map_funcs")(spark, sf).count())
    println("try sweep rows: " + graft.Queries.queryMap("q_try_funcs")(spark, sf).count())
    println("frame sample rows: " +
      graft.Queries.queryMap("mm_frame_sample")(spark, sf).count())

    println("=== round-5 surface: ann recall gate / variant grouped topk / CC ===")
    graft.Queries.queryMap("e_ann_recall")(spark, sf).show(3, truncate = false)
    println("variant grouped topk rows: " +
      graft.Queries.queryMap("v_grouped_topk")(spark, sf).count())
    println("dup clusters (large/small-star): " +
      graft.Queries.queryMap("d_dup_clusters")(spark, sf).count())
    graft.Queries.queryMap("q_quantile_2pass")(spark, sf).show(4, truncate = false)
    graft.Queries.queryMap("q_csv_corrupt")(spark, sf).show(truncate = false)
    graft.Queries.queryMap("d_cdc_shift")(spark, sf).show(truncate = false)
    println("stream outer join rows: " +
      graft.Queries.queryMap("s_outer_join")(spark, sf).count())
    println("stream timeout sessions: " +
      graft.Queries.queryMap("s_session_timeout")(spark, sf).count())
    println("q13 custdist rows: " +
      graft.Queries.queryMap("q13_custdist")(spark, sf).count())
    println("q18 large orders rows: " +
      graft.Queries.queryMap("q18_large_orders")(spark, sf).count())
    graft.Queries.queryMap("q22_idle_rich")(spark, sf).show(3, truncate = false)
    println("scd2 versions: " + graft.Queries.queryMap("q_scd2")(spark, sf).count())
    graft.Queries.queryMap("d_fuzzy_join")(spark, sf).show(truncate = false)
    graft.Queries.queryMap("q_equidepth_hist")(spark, sf).show(truncate = false)
    println("pit join rows: " + graft.Queries.queryMap("q_pit_join")(spark, sf).count())
    println("weighted sample rows: " +
      graft.Queries.queryMap("d_weighted_sample")(spark, sf).count())
    println("skyline rows: " + graft.Queries.queryMap("q_skyline")(spark, sf).count())
    println("compaction bins: " +
      graft.Queries.queryMap("q_compaction_plan")(spark, sf).count())
    println("incremental agg days: " +
      graft.Queries.queryMap("q_incremental_agg")(spark, sf).count())
    println("recursive walk rows: " +
      graft.Queries.queryMap("q_recursive_cte")(spark, sf).count())
    graft.Queries.queryMap("d_triangle_count")(spark, sf).show(truncate = false)
    println("session_window rows: " +
      graft.Queries.queryMap("q_session_window")(spark, sf).count())
    graft.Queries.queryMap("q_schema_drift")(spark, sf).show(truncate = false)
    println("native stream sessions: " +
      graft.Queries.queryMap("s_session_native")(spark, sf).count())
    println("interval join days: " +
      graft.Queries.queryMap("q_interval_join")(spark, sf).count())
    graft.Queries.queryMap("q_fingerprint_table")(spark, sf).show(truncate = false)
    println("contingency cells: " +
      graft.Queries.queryMap("q_contingency")(spark, sf).count())
    graft.Queries.queryMap("q_approx_quantile_gate")(spark, sf).show(truncate = false)
    graft.Queries.queryMap("q_regression")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("q_dq_audit")(spark, sf).show(truncate = false)
    graft.Queries.queryMap("q_table_diff")(spark, sf).show(truncate = false)
    graft.Queries.queryMap("q_agg_pushdown")(spark, sf).show(truncate = false)
    println("dpp partitions: " + graft.Queries.queryMap("q_dpp")(spark, sf).count())

    println("=== round 5: TPC-H shapes, graph, sketches, custom range join ===")
    graft.Queries.queryMap("q4_order_priority")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("q14_promo")(spark, sf).show(truncate = false)
    println("q17 rows: " + graft.Queries.queryMap("q17_small_qty")(spark, sf).count())
    println("q21 waiting suppliers: " +
      graft.Queries.queryMap("q21_wait_supplier")(spark, sf).count())
    println("q7 nation-pair rows: " +
      graft.Queries.queryMap("q7_nation_volume")(spark, sf).count())
    println("q10 returned top-20: " +
      graft.Queries.queryMap("q10_returned")(spark, sf).count())
    graft.Queries.queryMap("q19_brackets")(spark, sf).show(truncate = false)
    graft.Queries.queryMap("d_pagerank")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("q_mode_listagg")(spark, sf).show(truncate = false)
    graft.Queries.queryMap("q_kmv_overlap")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("v_strip_keys")(spark, sf).show(3, truncate = false)
    println("sq8 ANN rows: " + graft.Queries.queryMap("e_ann_sq8")(spark, sf).count())
    graft.Queries.queryMap("e_ann_recall")(spark, sf).show(truncate = false)
    println("transformWithState users: " +
      graft.Queries.queryMap("s_transform_state")(spark, sf).count())
    graft.Queries.queryMap("q_sql_ddl")(spark, sf).show(truncate = false)
    println("broadcast range join days: " +
      graft.Queries.queryMap("q_broadcast_range_join")(spark, sf).count())
    println("prefix-join near-dup pairs: " +
      graft.Queries.queryMap("d_prefix_join")(spark, sf).count())
    graft.Queries.queryMap("q_sql_scripting")(spark, sf).show(truncate = false)

    println("=== round 6: MERGE, robust stats, sketches, graph, weighted dedup ===")
    println("merge_into rows: " + graft.Queries.queryMap("q_merge_into")(spark, sf).count())
    graft.Queries.queryMap("q_outlier_mad")(spark, sf).show(truncate = false)
    println("window median users: " +
      graft.Queries.queryMap("q_window_median")(spark, sf).count())
    println("asof nearest rows: " +
      graft.Queries.queryMap("q_asof_nearest")(spark, sf).count())
    graft.Queries.queryMap("d_inverted_index")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("q_event_transitions")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("q_countmin")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("d_kcore")(spark, sf).show(truncate = false)
    println("weighted jaccard pairs: " +
      graft.Queries.queryMap("d_weighted_jaccard")(spark, sf).count())
    println("weighted minhash pairs: " +
      graft.Queries.queryMap("d_wminhash_lsh")(spark, sf).count())
    graft.Queries.queryMap("d_hits")(spark, sf).show(3, truncate = false)
    println("contamination rows: " +
      graft.Queries.queryMap("d_contamination")(spark, sf).count())
    println("orc source brands: " + graft.Queries.queryMap("q_orc_source")(spark, sf).count())
    println("map-state users: " + graft.Queries.queryMap("s_map_state")(spark, sf).count())
    graft.Queries.queryMap("q_window_rank_sweep")(spark, sf).show(3, truncate = false)

    println("=== round 7: bitmap distinct / benford / ewma / cusum / filtered ann ===")
    graft.Queries.queryMap("q_bitmap_distinct")(spark, sf).show(truncate = false)
    graft.Queries.queryMap("q_bitmap_rollup")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("q_benford")(spark, sf).show(truncate = false)
    println("ewma rows: " + graft.Queries.queryMap("q_ewma")(spark, sf).count())
    graft.Queries.queryMap("q_changepoint")(spark, sf).show(3, truncate = false)
    println("window-distinct rows: " +
      graft.Queries.queryMap("q_window_distinct")(spark, sf).count())
    println("filtered-ann rows: " +
      graft.Queries.queryMap("e_filtered_ann")(spark, sf).count())
    graft.Queries.queryMap("d_novelty")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("d_url_parse")(spark, sf).show(3, truncate = false)
    println("containment pairs: " +
      graft.Queries.queryMap("d_containment_join")(spark, sf).count())
    graft.Queries.queryMap("d_bpe_merge")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("s_bitmap_distinct")(spark, sf).show(truncate = false)
    graft.Queries.queryMap("q_sql_udf")(spark, sf).show(3, truncate = false)
    println("interval-union users: " +
      graft.Queries.queryMap("q_interval_union")(spark, sf).count())
    println("l2 ann rows: " + graft.Queries.queryMap("e_ann_l2")(spark, sf).count())
    graft.Queries.queryMap("q_observe")(spark, sf).show(truncate = false)
    graft.Queries.queryMap("q_hilbert")(spark, sf).show(3, truncate = false)
    println("cogroup rows: " + graft.Queries.queryMap("q_typed_cogroup")(spark, sf).count())
    graft.Queries.queryMap("q_typed_aggregator")(spark, sf).show(truncate = false)
    graft.Queries.queryMap("q_row_provenance")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("q_xml_source")(spark, sf).show(3, truncate = false)
    println("ivfpq rows: " + graft.Queries.queryMap("e_ann_ivfpq")(spark, sf).count())
    graft.Queries.queryMap("d_keyword_extract")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("q_sql_ergonomics")(spark, sf).show(truncate = false)
    graft.Queries.queryMap("d_compress_ratio")(spark, sf).show(3, truncate = false)
    println("ncd pairs: " + graft.Queries.queryMap("d_ncd_pairs")(spark, sf).count())
    graft.Queries.queryMap("q_running_distinct")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("q_autocorr")(spark, sf).show(truncate = false)
    graft.Queries.queryMap("q_funnel_window")(spark, sf).show(truncate = false)
    graft.Queries.queryMap("e_label_centroids")(spark, sf).show(3, truncate = false)
    println("sssp nodes: " + graft.Queries.queryMap("d_sssp")(spark, sf).count())
    graft.Queries.queryMap("q_grouping_id")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("q_unicode_funcs")(spark, sf).show(truncate = false)
    graft.Queries.queryMap("d_entity_resolution")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("d_minhash_gate")(spark, sf).show(truncate = false)

    println("=== round 8: exact algorithm twins (md5 LSH family + ANN family) ===")
    println("minhash md5 pairs: " +
      graft.Queries.queryMap("d_minhash_md5")(spark, sf).count())
    println("wminhash md5 pairs: " +
      graft.Queries.queryMap("d_wminhash_md5")(spark, sf).count())
    graft.Queries.queryMap("d_simhash_md5")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("d_winnow_md5")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("e_kmeans")(spark, sf).show(3, truncate = false)
    println("ivf exact rows: " +
      graft.Queries.queryMap("e_ivf_exact")(spark, sf).count())
    println("ivfpq exact rows: " +
      graft.Queries.queryMap("e_ivfpq_exact")(spark, sf).count())
    graft.Queries.queryMap("e_semdedup_exact")(spark, sf).show(3, truncate = false)

    println("=== round 8: hard negatives / maxsim / drift / k-anonymity / bitmap AND ===")
    println("hard negative rows: " +
      graft.Queries.queryMap("e_hard_negatives")(spark, sf).count())
    graft.Queries.queryMap("e_maxsim")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("e_embed_drift")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("d_k_anonymity")(spark, sf).show(truncate = false)
    graft.Queries.queryMap("q_bitmap_overlap")(spark, sf).show(3, truncate = false)
    println("variant diff: " + spark.sql(
      """SELECT variant_to_json(variant_diff(
        |  variant_from_json('{"a": 1, "b": {"x": 1}, "c": 3}'),
        |  variant_from_json('{"a": 2, "b": {"x": 1, "y": 4}}')))""".stripMargin)
      .head().getString(0))
    graft.Queries.queryMap("v_diff")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("d_vocab_growth")(spark, sf).show(3, truncate = false)
    println("wildcard extraction: " + spark.sql(
      """SELECT variant_get_all(variant_from_json(
        |  '{"items": [{"q": 1}, {"p": 2}, {"q": 3}]}'), '$.items[*].q', 'bigint')""".stripMargin)
      .head().getSeq[Any](0).mkString("[", ",", "]"))
    graft.Queries.queryMap("v_get_wildcard")(spark, sf).show(3, truncate = false)
    println("streaming CDC diff users: " +
      graft.Queries.queryMap("s_variant_diff")(spark, sf).count())
    graft.Queries.queryMap("e_mmr_rerank")(spark, sf).show(4, truncate = false)
    graft.Queries.queryMap("d_bpe_apply")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("d_temperature_sample")(spark, sf).show(truncate = false)
    println("sliding window rows: " +
      graft.Queries.queryMap("s_sliding_counts")(spark, sf).count())
    graft.Queries.queryMap("e_rrf_hybrid")(spark, sf).show(5, truncate = false)
    spark.sql("""SELECT variant_flatten(variant_from_json('{"a": 1, "b": [true]}'))""")
      .show(truncate = false)
    println("flatten rows: " + graft.Queries.queryMap("v_flatten")(spark, sf).count())
    graft.Queries.queryMap("q_pattern_match")(spark, sf).show(3, truncate = false)
    println("streaming CEP users: " +
      graft.Queries.queryMap("s_pattern_match")(spark, sf).count())
    println("generator sweep rows: " +
      graft.Queries.queryMap("q_generator_funcs")(spark, sf).count())
    graft.Queries.queryMap("d_span_mask")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("d_pack_bfd")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("e_triplet_mine")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("v_agg_build")(spark, sf).show(truncate = false)
    graft.Queries.queryMap("d_interleave_order")(spark, sf).show(3, truncate = false)

    // round-7 additions
    graft.Queries.queryMap("q_sliding_distinct")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("d_repeated_ngram_strip")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("mm_bmp_decode")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("mm_wav_decode")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("q_avro_source")(spark, sf).show(truncate = false)

    // round-8 additions
    graft.Queries.queryMap("mm_png_decode")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("mm_jpeg_decode")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("mm_webp_decode")(spark, sf).show(3, truncate = false)
    graft.Queries.queryMap("mm_pipeline")(spark, sf).show(3, truncate = false)

    spark.stop()
  }
}
