package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ParquetSource

/** Input-layout invariance: every catalog query must produce the
  * IDENTICAL multiset of rows whether a table arrives as one file (the
  * fixture shape, 1 input split) or many (the 100 TB shape, thousands
  * of splits). The DuckDB oracle gate can't see this — it always reads
  * the single-file layout — so layout-dependence (partition-local
  * row_number leaks, first()/limit nondeterminism, accumulation-order
  * floats) would slip straight through it. Representative queries from
  * every family run against an 8-way-split copy of sf0.001 and must
  * match the single-file result exactly (exceptAll in both directions:
  * bit-exact doubles, no tolerance).
  */
class PartitionInvarianceSpec extends AnyFunSuite with SparkSuite {

  private val queries = Seq(
    "q1_pricing_summary", "q5_local_supplier", "q_window_rank", "q_forward_fill", "q_interpolate",
    "q_global_sort", "q_seq_pack", "q_sessionize", "q_rollup",
    "q_salted_agg", "q_skew_join", "q_cdc_apply", "q_scd2",
    "q_train_split", "q_weighted_sample", "q_stratified_sample",
    "q_upsample_mix",
    "q_shard_layout", "q_approx_topk", "q_approx_distinct",
    "d1_exact_dedup", "d2_minhash_lsh", "d7_dup_clusters",
    "d13_dup_spans", "d14_span_strip", "d15_exact_keep", "d16_segment_dedup",
    "st10_neardup_screen", "mm5_audio_meta",
    "s1_knn_brute", "s6_random_projection",
    "t5_winnowing", "t9_surprisal", "t11_domain_cap",
    "t13_mix_rebalance", "t14_token_budget", "t16_classifier_score",
    "t17_ppl_buckets", "t18_char_entropy", "t19_collocations",
    "st1_first_seen", "st3_latest_state", "st5_scd2_stream", "st11_table_diff",
    "p1_pipeline", "p2_pipeline", "d10_dedup_canonical", "d12_semdedup",
    "t10_tfidf_keywords", "t15_bigram_surprisal", "q_percentiles",
    // round-6 continuation ops — every shape with a partitioning story:
    // aggregates feeding windows (changepoint, cohort), salted top-k
    // (s10), iterative joins (g1), banding joins (mm6, d18), pipelines
    "t20_bpe_pairs", "s10_diverse_sample", "g1_supplier_rank",
    "mm6_image_neardup", "d18_containment", "q_histogram",
    "q_cohort_retention", "q_changepoint", "st12_window_topk",
    "st13_anonymise_stream", "p3_ingest_pipeline", "o28_k_anonymity",
    "g2_triangles", "s12_knn_sq8", "s13_filtered_knn",
    "q_basket_pairs", "q_time_weighted", "st14_user_drift",
    "o29_subset_closure", "o30_schema_evolution",
    // this session's additions: cleaning map, census-walk enforcement,
    // per-user windows, and the partition-discovered change feed
    "t21_clean_text", "o31_generalize", "q_transitions", "st16_table_cdf",
    "o32_pseudonym_join", "mm7_scene_changes", "q_mad_outliers",
    "p4_privacy_pipeline", "o33_randomized_response", "st17_cdf_replication",
    "t22_bpe_train", "o34_forget", "s14_hybrid_rrf", "d19_cdc_chunks",
    "t23_perceptron", "s15_kmeans", "q_ab_chisq", "o35_masked_views",
    "st18_session_window",
    // round-7 additions: tokenizer application, DP release, linkage,
    // BFS reachability, survivorship consolidation
    "t24_bpe_encode", "o36_dp_counts", "er1_record_linkage",
    "g3_khop", "er2_golden_record", "q_seasonal_mad", "s16_mmr",
    "q_calibration", "o37_drift", "p5_link_pipeline", "t25_novelty",
    "st19_late_audit", "er3_blocking_quality", "o38_t_closeness",
    "q_auc", "q_attribution", "q_lag_features",
    "er4_incremental_linkage", "q_ks_test", "q_gini", "q_lorenz",
    "q_spearman", "q_benford", "g4_components", "q_trend",
    // round-8 additions: deadline funnel (per-entity fold), bootstrap
    // (coin + order statistics), SAR export (broadcast unpivot), RAG
    // chunking/watermark (narrow maps), rules + fertility (aggregate
    // joins), kNN graph (bucket self-joins + per-node window)
    "q_srm", "q_bootstrap_ci", "q_basket_rules", "q_funnel_window",
    "o39_subject_export", "t26_chunks", "t27_watermark", "t28_fertility",
    "s17_knn_graph", "q_conformal", "q_did", "q_rfm",
    "o40_retention_audit", "st20_chunks", "g5_clustering", "o41_fpe",
    "q_power", "q_returned_items", "q_large_orders", "q_abn_chisq",
    "q_cohort_ltv", "q_forecast_backtest", "st21_watermark_screen",
    "p6_rag_pipeline", "o42_minimisation", "q_corpus_report",
    // round-8 TPC-H completion: semi/anti joins, scalar subqueries,
    // correlated aggregates, count-distinct, disjunctive pushdown
    "q_order_priority", "q_volume_shipping", "q_market_share",
    "q_product_profit", "q_waiting_orders", "q_min_cost_supplier",
    "q_idle_customers", "q_small_qty", "q_supplier_count",
    "q_forecast_revenue", "q_custdist", "q_top_supplier",
    "q_dominant_supplier", "q_kappa", "q_group_split", "q_pack_waste",
    "d20_mirror_matrix", "o43_fk_orphans",
    "q_disjunctive", "q_shipmode_priority", "q_promo_revenue",
    // round-11 addition: the cross-family output-budget contract (the
    // salted two-phase top-k over the cosine pair relation — exactly
    // the shape where a partition-local row_number would leak)
    "d5_embedding_capped",
    // round-12 additions: the LSH-candidate ANN pair path (bucket
    // self-joins + window-chunked blocks — exactly the shape where a
    // partition-local artifact would leak) and the forced-blocked cap
    "d5_embedding_ann", "d5_embedding_capped_blocked",
    // frequency-capped blocking (per-key count aggregates + semi join)
    "er5_block_cap")

  private lazy val splitDir: String = {
    val out = java.nio.file.Files.createTempDirectory("graft_split_fixture").toString
    val tables = new java.io.File(sfDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName.stripSuffix(".parquet"))
    tables.foreach { t =>
      ParquetSource.normalizeNanoTimestamps(spark.read.parquet(s"$sfDir/$t.parquet"))
        .repartition(8)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    out
  }

  queries.foreach { name =>
    test(s"$name: result independent of input split layout") {
      val single = GraftQueries.all(name)(spark, sfDir)
      val split = GraftQueries.all(name)(spark, splitDir)
      val extra = split.exceptAll(single).count()
      val missing = single.exceptAll(split).count()
      assert(extra == 0 && missing == 0,
        s"$name drifts with input layout: +$extra/-$missing rows")
      graft.ops.OpCaches.releaseAll()
    }
  }
}
