package graft

/** Determinism regression guard: every oracle query must produce
  * byte-identical results across repeated runs (shuffle/partition
  * order must never leak into values — the invariant behind the
  * DuckDB hash compare). A representative query from each family.
  */
class DeterminismSpec extends SparkSpec {

  private val representative = Seq(
    "q1_agg", "q13_sessionize", "q16_topk_custom", "q21_range_window",
    "g4_response_parse", "t2_quality", "d2_minhash_lsh",
    "s1_knn_brute", "m3_chunking",
    // round-3 additions: iterative clustering, distributed order
    // statistics, probe joins, composed verdicts
    "d7_cluster", "q18_percentile", "q22_rank_family",
    "s4_ivf_probe", "d8_simhash_pairs", "t7_keep_drop", "t8_split_assign",
    // round-8 additions: cluster keep-best (double argmax over a
    // window), word-gram minhash, recall measurement
    "d10_cluster_keep", "d11_word_minhash", "s5_ann_recall",
    // round-9 additions: corpus-statistic join-backs, partial-merge
    // agg, quantized ranking, a double-ordered LIMIT boundary, and
    // the keeper-manifest / streaming admissions
    "t12_doc_frequency", "q28_delta_agg", "s7_sq8_recall",
    "d14_repeated_ngrams", "d15_minhash_accuracy",
    "d13_keeper_admit", "st9_stream_admit",
    // round-10 additions: the composed run+resume workflow end state,
    // persisted-manifest admission, iterative k-means, the pruned
    // partitioned layout, and the Bloom admission prefilter
    "g14_workflow_run", "d16_manifest_admit", "s8_kmeans",
    "q29_partition_prune", "d17_bloom_admit", "s9_pq_recall",
    "st10_stream_bloom", "q30_salted_agg", "m6_perceptual_hash",
    "t14_tfidf_top", "q31_grouping_sets",
    // round-11 additions
    "q32_outer_join", "s10_ivfpq_recall", "t15_curate_pipeline",
    "d18_semdedup",
    // round-11 continued: planted-PII scrub, line-DF removal, the
    // staged z-order/IVF layouts, the optimizer-rewritten window,
    // shard packing, corrupt quarantine
    "t16_pii_redact", "t17_line_dedup", "t18_model_score",
    "t19_temperature_mix", "q35_cohort_retention", "q36_zorder_skip",
    "q37_latest_rewrite", "g15_corrupt_quarantine", "s11_ivf_persist",
    "m7_shard_pack",
    // round-12 additions: span removal, learned BPE (in-query trained
    // merge table), integer-log perplexity, incremental clustering
    // over the persisted store, interleaved packing
    "d19_substring_remove", "t20_bpe_learned", "t21_perplexity_filter",
    "d20_cross_batch_cluster", "m8_interleaved_pack", "d21_dedup_pack",
    "t22_learned_pack",
    // round-13 addition: multi-benchmark decontamination verdict
    "d22_multi_decontam",
    // round-14 additions: token decontam, DSIR, cross-modal dedup,
    // the retrieval family (BM25/hybrid/hard-negatives), the genai
    // pre/post-submission passes, the streamed router
    "d23_token_decontam", "t24_dsir_resample", "m9_crossmodal_dedup",
    "s14_bm25", "s15_hybrid_rrf", "s16_hard_negatives",
    "g17_request_dedup", "g18_preference_pairs", "g19_model_router",
    "st13_stream_route", "s17_ivf_incremental",
    // round-15 additions: overlap chunking, the epoch permutation,
    // cluster-balanced sampling, the composed RAG DAG, chunking at
    // ingest
    "t25_chunk_windows", "t26_epoch_shuffle", "s18_cluster_sample",
    "s19_rag_pipeline", "st14_stream_chunk", "s20_mmr_diversify",
    "m10_scene_split",
    // round-16 additions: schema validation, context assembly, the
    // RAG recall contract, ingest scene cuts, filtered search + its
    // recall, the nprobe curve
    "g20_schema_validate", "t27_context_pack", "s21_rag_recall",
    "st15_stream_scene", "s22_filtered_search", "s23_filtered_recall",
    "s24_nprobe_curve",
    // round-17 additions: the URL/domain provenance gate (t28; t15's
    // rewired composition is already listed above), ranking-quality
    // metrics for the composed RAG DAG
    "t28_url_curate", "s25_rank_metrics", "t29_datasheet",
    // round-18 additions: the deterministic sketches (histogram / KMV
    // — partial-merge aggregation state must not leak merge order),
    // the graph-ANN walk over the staged index
    "q25_percentile_sketch", "q26_distinct_sketch", "s27_graph_ann",
    // round-19 additions: incremental graph maintenance (base ⊖
    // replaced ∪ delta assembly), the filtered 3-hop walk, the
    // ADC-pruned DiskANN composition, the outer as-of join, streaming
    // index admission
    "s29_graph_incremental", "s31_graph_filtered", "s33_graph_pq",
    "st20_stream_asof_outer", "st21_stream_index_admit")

  for (name <- representative) {
    test(s"$name is run-to-run deterministic") {
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sf).collect().toSeq
      val b = fn(spark, sf).collect().toSeq
      assert(a == b, s"$name differed between runs")
    }
  }
}
