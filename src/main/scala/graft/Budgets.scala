package graft

/** Per-query wall-clock budgets (seconds) at sf0.1 on local[32] —
  * the checked-in table in BASELINE.md, as data. [[Bench]] flags any
  * query slower than 2x its budget in the JSON line's `over_budget`
  * field; BudgetsSpec keeps this map and BASELINE.md in lockstep.
  */
object Budgets {

  /** Host-speed reference for budget normalization (VERDICT r14 #2):
    * the FIRST `calib_ms` reading taken when the calibration loop was
    * introduced (r14), pinning the host speed the budget table was
    * priced on. [[Bench]] scales the 2x over-budget comparison by
    * `calib_ms / CalibRefMs` (clamped to [0.5, 2.0] so a pathological
    * calibration reading can neither neuter nor double the gate), so
    * budgets keep their meaning as the shared host drifts: 9 r14
    * queries ran "over 1x budget" purely because the host had slowed
    * a measured 1.13-1.22x. The sf1 gate needs no calibration — its
    * ratios divide two same-host measurements. */
  val CalibRefMs: Double = 386.0

  val seconds: Map[String, Double] = Map(
    "d10_cluster_keep" -> 4.7,
    // r19 re-base (VERDICT r18 #4): isolated best-of-3 2.62 at
    // calib_ms 444 (single-thread norm 2.28; the parallel probe read
    // 1.61x that run while every query ran FASTER raw than the 1.30x
    // run 2h earlier, so single-thread is the defensible denominator)
    "d11_word_minhash" -> 2.9,
    "d12_incremental_dedup" -> 2.9,
    "d13_keeper_admit" -> 9.5,
    // r13: the d16 sweep went behind a freshness marker — warm runs
    // price the admit joins only (was 12.0 when every run re-swept)
    "d16_manifest_admit" -> 2.0,
    "d22_multi_decontam" -> 2.0,
    // r14: tokenize (t20's staged table) + the native O(bytes)
    // TokenGramHash rolling pass (the first md5-slice cut measured
    // 6.75 in-sweep and breached its sf1 allowance; the rolling form
    // measures 2.97 solo / ~3.2 in-sweep, sf1 ratio 10.65 -> 6.78)
    "d23_token_decontam" -> 4.0,
    "d17_bloom_admit" -> 0.9,
    "d19_substring_remove" -> 4.7, // r13: +~1s selective-salting insurance on the gram join-back
    "t20_bpe_learned" -> 5.5,
    "t21_perplexity_filter" -> 1.8,
    // r17: re-based on isolated best-of-3 evidence — 2.57 s at
    // calib_ms 374 (and 2.56-3.11 across three isolated r17 runs);
    // the old 2.2 was priced on a pre-r14 reading and t23 had sat at
    // 1.15-1.2x budget for two rounds on an unchanged plan
    "t23_ccnet_bucket" -> 2.8,
    "t24_dsir_resample" -> 2.3,
    // r15: measured 1.30 / 1.21 / 2.24 best-of-3 at sf0.1 in-round
    "t25_chunk_windows" -> 1.7,
    "t26_epoch_shuffle" -> 1.6,
    "s18_cluster_sample" -> 2.8,
    // r15: measured 4.22 best-of-3 at sf0.1 (the composed two-arm +
    // chunk-assembly DAG: ~= lexArm + s11 + t25 + wiring)
    "s19_rag_pipeline" -> 5.3,
    "s20_mmr_diversify" -> 2.5, // r15: measured 1.96 best-of-3 (~= s15 + the metadata-sized greedy)
    // r16: measured 3.66 best-of-3 (~= s20 + t25 + the broadcast lead-chunk join)
    "t27_context_pack" -> 4.5,
    // r16: measured 5.12 best-of-3 (the two composed pipelines it compares)
    "s21_rag_recall" -> 6.5,
    // r17: measured 4.63 best-of-3 (the same two pipelines s21 runs +
    // <= 10-row metadata arithmetic)
    "s25_rank_metrics" -> 5.8,
    // r17: measured 5.74 best-of-3 (~= d10's cluster pipeline + the
    // four cheap per-doc signal chains + a 20-row rollup)
    "t29_datasheet" -> 7.2,
    // r17: measured 2.91 best-of-3 at calib 412 (t18 scoring +
    // source-partitioned rank window + ExactPercentile scalar)
    "t30_quality_calibrate" -> 3.6,
    "q38_snapshot_diff" -> 0.6, // r17: measured 0.33 (two fp scans + one doc_id full-outer join)
    // r17: measured 2.46 best-of-3 (the candidateOverlap truth set +
    // signature joins + the 7-way tau explode)
    "d24_lsh_curve" -> 3.1,
    // r17: same-run A/B measured d25 = 1.16 x d24 (4.27 vs 3.67 on a
    // loaded host; 2.46 x 1.16 ~= 2.9 at the d24 pricing host speed)
    "d25_band_sweep" -> 3.6,
    "t31_heavyhitter" -> 1.3, // r17: measured 0.97 (two vocab-sized aggs + 1024-cell broadcast probe)
    "g21_judge_agreement" -> 1.8, // r17: measured 1.39 (two response pipelines + bounded marginal join)
    "g22_cost_reconcile" -> 1.7, // r17: measured 1.26 (plan + billed per-model aggregates joined)
    "s26_index_health" -> 2.6, // r17: measured 2.05 (one broadcast assignment pass + bounded cell agg)
    "m12_magic_sniff" -> 0.5, // r17: measured 0.25 (per-row prefix codegen, zero joins)
    "st18_stream_sniff" -> 1.9, // r17: measured 1.49 (m12 + fixed 4-batch micro-batch overhead)
    // r17: measured 2.12 best-of-3 (stateless URL gate under the
    // 4-file multi-batch regime; ~= t28 + fixed micro-batch overhead)
    "st17_stream_url" -> 2.7,
    "s22_filtered_search" -> 1.8, // r16: measured 1.35 best-of-3
    "s23_filtered_recall" -> 2.8, // r16: measured 2.20 best-of-3 (filtered brute truth + s22)
    "s24_nprobe_curve" -> 2.9, // r16: measured 2.23 best-of-3 (one probe join + 4-way explode + brute truth)
    "t22_learned_pack" -> 4.5,
    "d20_cross_batch_cluster" -> 5.0,
    "d21_dedup_pack" -> 5.5,
    "m8_interleaved_pack" -> 2.0,
    "m9_crossmodal_dedup" -> 2.6,
    "m10_scene_split" -> 5.4, // r15: measured 4.26 best-of-3 (m2 verbatim + AHash + the scene prefix)
    "m11_shard_index" -> 1.1, // r16: measured 0.83 best-of-3 (m7's offsets chain + shard-bounded windows)
    "d18_semdedup" -> 1.1,
    "d14_repeated_ngrams" -> 3.2,
    "d15_minhash_accuracy" -> 4.5,
    "t12_doc_frequency" -> 1.1,
    "t14_tfidf_top" -> 1.3,
    // r17: re-priced with the composed t28 provenance gate (stage 0):
    // measured 2.37 in-round at sf0.1 (was 2.2 for the 4-stage chain)
    "t15_curate_pipeline" -> 2.9,
    "t28_url_curate" -> 0.6, // r17: measured 0.37 (per-row regexps + broadcast blocklist join)
    "t16_pii_redact" -> 0.8,
    "t17_line_dedup" -> 1.4, // r19 re-base: isolated 1.25 at calib 444 (norm 1.09)
    "t18_model_score" -> 0.6,
    "t19_temperature_mix" -> 0.6,
    "m7_shard_pack" -> 0.8,
    "q33_unpivot" -> 1.5,
    "q34_compact_latest" -> 0.7,
    "q35_cohort_retention" -> 1.2,
    "q36_zorder_skip" -> 3.3,
    "q37_latest_rewrite" -> 0.8,
    "t13_bpe_tokens" -> 0.5,
    "d1_exact_dedup" -> 0.5,
    "d2_minhash_lsh" -> 3.0,
    "d3_simhash" -> 2.4,
    "d4_ngram_jaccard" -> 3.9,
    "d5_embedding_neardup" -> 0.5,
    "d6_contamination" -> 1.7,
    "d7_cluster" -> 4.0,
    "d8_simhash_pairs" -> 4.6,
    "d9_containment" -> 4.3,
    "g10_vertex_request" -> 0.5,
    "g11_multichoice" -> 0.6,
    "g12_retry_failed" -> 0.5,
    "g13_visual_exam" -> 0.6,
    "g14_workflow_run" -> 5.6,
    "g15_corrupt_quarantine" -> 0.5,
    "s8_kmeans" -> 1.9,
    "s9_pq_recall" -> 4.7,
    "g1_request_build" -> 0.5,
    "g2_request_validate" -> 0.5,
    "g3_batch_shard" -> 0.5,
    "g16_budget_shard" -> 1.5,
    "g17_request_dedup" -> 0.7,
    "g18_preference_pairs" -> 0.6,
    "g19_model_router" -> 0.9,
    "g20_schema_validate" -> 1.0, // r16: measured 0.78 best-of-3 at sf0.1
    "g4_response_parse" -> 0.7,
    "g5_result_join" -> 0.8,
    "g6_error_split" -> 0.5,
    "g7_status_monitor" -> 0.5,
    "g8_cost_estimate" -> 0.6,
    "g9_multimodal_request" -> 0.5,
    "m1_binary_meta" -> 0.5,
    "m2_frame_sample" -> 1.3,
    "m3_chunking" -> 0.5,
    "m4_chunk_dedup" -> 0.6,
    "m5_cdc_chunks" -> 0.6, // r13: native CdcChunks expression
    "m6_perceptual_hash" -> 0.8, // r13: native AHash expression
    "q10_setops" -> 1.0,
    "q11_corr_subquery" -> 1.0,
    "q12_case_agg" -> 0.9,
    "q13_sessionize" -> 1.3,
    "q14_event_window" -> 0.6,
    "q15_asof_join" -> 0.6,
    "q16_topk_custom" -> 0.5,
    "q17_json_extract" -> 0.7,
    "q18_percentile" -> 2.9,
    "q19_pivot" -> 0.8,
    "q1_agg" -> 1.7,
    "q20_cube" -> 0.9,
    "q21_range_window" -> 1.1,
    "q22_rank_family" -> 1.1,
    "q23_asof_native" -> 0.6,
    "q24_range_join" -> 0.6,
    "q25_percentile_sketch" -> 1.3,
    "q25b_sketch_bound" -> 1.5,
    "q26_distinct_sketch" -> 0.5,
    "q26b_sketch_bound" -> 0.7,
    // r13: the bucketed layout went behind a freshness marker — warm
    // runs attach the existing tables (catalog-only) and price the
    // co-located join alone (was 3.7 when every run re-wrote both
    // sides; measured warm 0.69 s)
    "q27_bucketed_join" -> 1.5,
    "q28_delta_agg" -> 1.5,
    "q29_partition_prune" -> 4.1,
    "q30_salted_agg" -> 1.1,
    "q31_grouping_sets" -> 1.2,
    "q32_outer_join" -> 1.4,
    "s10_ivfpq_recall" -> 7.1,
    "s11_ivf_persist" -> 1.2,
    "q2_filter_project" -> 0.5,
    "q3_join_agg" -> 2.1,
    "q4_broadcast_join" -> 1.7,
    "q5_topk" -> 0.8,
    "q6_window" -> 0.5,
    "q7_semi_anti" -> 0.5,
    "q8_rollup" -> 1.5,
    "q9_distinct" -> 0.7,
    "s1_knn_brute" -> 0.7,
    "s2_ann_lsh" -> 0.6,
    "s3_ivf_cells" -> 1.5,
    "s4_ivf_probe" -> 1.9,
    "s12_range_search" -> 1.9,
    "s13_range_recall" -> 2.5,
    "s14_bm25" -> 1.0,
    "s15_hybrid_rrf" -> 1.9,
    "s16_hard_negatives" -> 2.1,
    "s17_ivf_incremental" -> 1.7,
    "s5_ann_recall" -> 1.1,
    "s6_ivf_recall" -> 2.5,
    "s7_sq8_recall" -> 2.2,
    "st1_stream_window" -> 1.9,
    "st2_stream_dedup" -> 1.3,
    "st3_stream_static_join" -> 1.3,
    "st4_stream_sessionize" -> 1.4,
    "st5_stream_append_window" -> 2.0,
    "st6_stream_stream_join" -> 2.3,
    "st7_stream_dedup_bounded" -> 2.6, // r19 re-base: isolated 2.38 at calib 444 (norm 2.07)
    "st8_stream_multibatch" -> 3.3,
    "st9_stream_admit" -> 2.4,
    "st10_stream_bloom" -> 0.8,
    "st11_stream_compact" -> 3.4, // r19 re-base: isolated 3.07 at calib 444 (norm 2.67)
    "st12_stream_pii" -> 2.2, // r19 re-base: isolated 1.99 at calib 444 (norm 1.73)
    "st13_stream_route" -> 1.9,
    // r18: measured 4.17 best-of-3 (the two chained stateful
    // operators — interval join + windowed as-of max — over events)
    "st19_stream_asof_join" -> 5.2,
    // r19: priced by same-run A/B vs st19 (the d25-vs-d24 rule):
    // 7.32 vs 7.40 on a calib-1.30 host = 0.99x its sibling — the
    // outer mode adds no state and re-emits the same joins plus the
    // null rows, so it prices at st19's class
    "st20_stream_asof_outer" -> 5.2,
    // r18: measured 2.47 / 2.83 best-of-3 warm (staged graph index +
    // the bounded two-hop walk; s28 adds the brute-truth compare)
    "s27_graph_ann" -> 3.1,
    "s28_graph_recall" -> 3.5,
    // r19: priced by same-run A/B vs s27 (1.78x: 5.13 vs 2.88 at
    // calib 1.15 — the union-corpus bucketize + walk over base∪batch
    // reading base+delta edge segments; the maintenance itself is
    // staged and amortized like s27's build)
    "s29_graph_incremental" -> 5.5,
    // r19: same-run A/B vs s27 (0.87x: 3.36 vs 3.85 — the survivor
    // corpus is smaller than the base and the walk reads the staged
    // base+delete-delta segments)
    "s30_graph_delete" -> 2.8,
    // r19: same-run A/B vs s27 (0.94x: 3.36 vs 3.58 at calib 1.23 —
    // the 3-hop over-fetch walk reads the same staged index; the 50%
    // predicate halves the re-rank side, roughly offsetting the
    // deeper frontier)
    "s31_graph_filtered" -> 3.0,
    // r19: same-run A/B vs s28 (1.12x: 4.63 vs 4.13 — s31's walk plus
    // the filtered brute-truth compare over the admissible half)
    "s32_graph_filtered_recall" -> 3.9,
    // r19: same-run A/B vs st19 (0.59x: 3.20 vs 5.46 — three
    // stateless micro-batches of literal-centroid argmin projection;
    // no state store, no join, the wall is micro-batch overhead +
    // one corpus pass)
    "st21_stream_index_admit" -> 3.1,
    // r19: same-run A/B vs s9 (1.35x: 9.28 vs 6.88 at calib 1.28 —
    // s9's codebook train + encode dominates; the walk-candidate ADC
    // join replaces s9's full-corpus one, and the staged graph side
    // adds the seeds/hops plumbing)
    "s33_graph_pq" -> 6.3,
    // r19: same-run A/B vs s33 (1.10x: 10.19 vs 9.28 — adds the brute
    // truth compare)
    "s34_graph_pq_recall" -> 7.0,
    "st14_stream_chunk" -> 2.2, // r15: measured 1.74 warm best-of-3 (4-file multi-batch regime)
    "st15_stream_scene" -> 1.7, // r16: measured 1.25 best-of-3 (keyed state op, single-batch staging)
    "st16_stream_validate" -> 2.4, // r16: measured 1.83 best-of-3 (stateless per-row, 4-file multi-batch)
    "t10_pack" -> 1.2,
    "t11_stratified" -> 0.5,
    "t1_tokens" -> 0.5,
    "t2_quality" -> 0.7,
    "t3_langid" -> 0.5,
    "t4_fingerprint" -> 0.5,
    "t5_ngram_top" -> 0.5,
    "t6_repetition" -> 0.9,
    "t7_keep_drop" -> 1.4,
    "t8_split_assign" -> 0.5,
    "t9_mix_sample" -> 0.5
  )

  /** The sf1 (10x) scaling gate ([[Bench]], env `SPARK_GRAFT_SF1`):
    * scale-critical headline queries and the MAXIMUM allowed
    * wall-clock ratio sf1/sf0.1 for each. 10x data through a
    * sub-linear plan lands well under 8x (the r11 sweep measured
    * 1.0–4x for this set); a ratio above the allowance is the
    * s8-style scaling trap the gate exists to catch. q24's allowance
    * is higher because its OUTPUT grows ~100x (verified in the r11
    * sweep: 92,480 → 9,248,000 pairs — the data's shape, not a plan
    * regression). Ratios are only meaningful above noise: the gate
    * ignores queries whose sf1 time is under 1 s. */
  val sf1MaxRatio: Map[String, Double] = Map(
    // r15 (VERDICT r14 #3): allowances are DATA-DERIVED, not blanket —
    // per query, allowance = max(8, ceil(1.15 x worst HONEST ratio))
    // over SF1_HISTORY.jsonl's full unconf'd gate runs, where a
    // reading the gate flagged at its run time (a caught breach, like
    // d23's pre-fix 10.65) is not honest and is excluded. BudgetsSpec
    // recomputes the rule from the tracked history and fails on
    // drift, so a tail reading that erodes headroom below 15% forces
    // a deliberate regeneration here rather than a silent false trip.
    // Queries without history yet (new this round) sit at the 8.0
    // linear-plus-jitter default until their first full gate run.
    "q1_agg" -> 10.0, // worst honest 8.62 (r16 final gate; a pure scan-agg whose ratio breathes with host load — isolated confirmation in the r16 round log)
    "q3_join_agg" -> 9.0, // worst honest 7.29 (r16 final gate; context class — plans byte-identical at both SFs, isolated 5.0-5.7, see the r16 round log)
    // r14: q24's gate corpus is the range-scaled events variant
    // (Bench dirOverride + ScaleData.generateRangeScaledEvents), so
    // its output grows ~10x like everyone else's and the allowance
    // returns from the 16x output-shape carve-out to the standard 8x
    "q24_range_join" -> 8.0,
    // r18 (VERDICT r17 #3): back to 8 — the r17 9.0 was ratcheted by a
    // load-avg-8 closing gate whose trips all vanished isolated
    // (confirmation 4.18/5.68); contaminated runs no longer ratchet,
    // clean-run worst honest 6.73
    "q30_salted_agg" -> 8.0,
    "q36_zorder_skip" -> 8.0,
    "d2_minhash_lsh" -> 8.0,
    "d7_cluster" -> 8.0,
    "d8_simhash_pairs" -> 8.0,
    "d14_repeated_ngrams" -> 8.0,
    // r19 (VERDICT r18 #3): back to 8 under scale-eligibility — the
    // 6.97 reading that ratcheted this to 9 came from the r18 closing
    // gate at calib_scale 1.516 (a zero-trip but quota'd run, exactly
    // the blind spot the rule closes); worst scale-eligible honest
    // reading is 6.20. The d19 ratio genuinely breathes 5-7x (its
    // gram join-back is the pure-linear class whose sf0.1 denominator
    // is small), so this stays the watch-list entry for band
    // conversion if it ever trips honestly.
    "d19_substring_remove" -> 8.0,
    "d21_dedup_pack" -> 8.0,
    "s8_kmeans" -> 8.0,
    "s11_ivf_persist" -> 8.0,
    "t10_pack" -> 8.0,
    "t15_curate_pipeline" -> 8.0,
    // t20/t22 apply the learned replace chain per ROW — pure linear
    // scan work with no sub-linear stage to hide behind, so 10x data
    // is ~10x wall once the sf0.1 side is past fixed overhead. The
    // r12-era 12x also priced the UNCAPPED in-query trainer; with
    // BpeTrainCap the training input is scale-independent (binds at
    // sf1: 10000 -> 2000 docs), so the allowance drops back to the
    // linear-plus-jitter band (measured honest ratios ~6-7x)
    "t20_bpe_learned" -> 12.0, // worst honest 10.01 (r16 final gate; the pure per-row linear class above — its sf0.1 denominator moves with host load while the sf1 numerator runs in the long gate phase)
    // r18: back to 8 — the r17 7.58/8.28 readings were the load-avg-8
    // gate runs (both contaminated: their trips all vanished isolated;
    // t22's own isolated confirmation reads 5.32). Clean-run worst
    // honest 6.87.
    "t22_learned_pack" -> 8.0,
    // d23 is the same pure per-row class: the replace-chain
    // tokenization + the gram hash stream are linear scans with no
    // sub-linear stage to hide behind (its joins/aggregates are
    // broadcast-membership + survivor-sized)
    "d23_token_decontam" -> 10.0, // worst honest 8.14 (r16 full gate; same pure per-row class)
    "t21_perplexity_filter" -> 8.0,
    "m8_interleaved_pack" -> 8.0,
    "m9_crossmodal_dedup" -> 8.0, // r18: the 7.18 was a contaminated run (isolated conf 1.66); clean-run worst honest 3.19
    // r12 verdict #5: the sf0.1 budget gate cannot see superlinear
    // scaling, so every query > 2 s at sf0.1 (the expensive tail) now
    // carries an sf1 ratio check. Allowance 8.0 where the measured
    // honest ratio is <= 3x (ample contention headroom, still far
    // below superlinear); the three t20/t22-class exceptions below
    // are PURE per-row/staging-write work with no sublinear stage to
    // hide behind, measured 8.2-9.3x honest — their allowance is the
    // linear-plus-jitter band, not a cover for regressions.
    "d4_ngram_jaccard" -> 8.0,
    "d9_containment" -> 8.0,
    "d22_multi_decontam" -> 8.0,
    // r14 (VERDICT r13 #1): gate coverage is now an INVARIANT, not a
    // hand-maintained list — BudgetsSpec requires an sf1MaxRatio entry
    // for every key whose sf0.1 budget is >= 2 s, so a query landing
    // late in a round (t23 did, in the final r13 snapshot commit) can
    // no longer drift out of scale-gate coverage. The 13 entries below
    // close the gap that rule found; allowance 8.0 throughout (the
    // measured honest ratios are all <= 4x — t23's judge-measured 2.2x,
    // the rest ride sub-linear plans or bounded stages).
    "t23_ccnet_bucket" -> 8.0,
    "t24_dsir_resample" -> 8.0,
    "d3_simhash" -> 8.0,
    "d11_word_minhash" -> 8.0,
    "d12_incremental_dedup" -> 8.0,
    "q18_percentile" -> 8.0,
    "s6_ivf_recall" -> 8.0,
    "s7_sq8_recall" -> 8.0,
    "s13_range_recall" -> 8.0,
    "s16_hard_negatives" -> 8.0,
    "s18_cluster_sample" -> 8.0,
    "s19_rag_pipeline" -> 8.0,
    "s20_mmr_diversify" -> 8.0,
    "s21_rag_recall" -> 8.0,
    "s25_rank_metrics" -> 8.0,
    "t29_datasheet" -> 8.0,
    // r17: new >= 2s queries enter at the 8.0 default (no history yet)
    "t30_quality_calibrate" -> 8.0,
    "st17_stream_url" -> 8.0,
    "d24_lsh_curve" -> 8.0,
    "d25_band_sweep" -> 8.0,
    "s26_index_health" -> 8.0,
    "s23_filtered_recall" -> 8.0,
    "s24_nprobe_curve" -> 8.0,
    "t27_context_pack" -> 8.0,
    "m10_scene_split" -> 8.0,
    "st5_stream_append_window" -> 8.0,
    "st6_stream_stream_join" -> 8.0,
    "st19_stream_asof_join" -> 8.0, // r18: new, no gate history yet
    "st20_stream_asof_outer" -> 8.0, // r19: new, no gate history yet
    // r19: entered the >= 2s gate class via its budget re-base
    // (1.8 -> 2.2); stateless per-row scrub, no gate history yet
    "st12_stream_pii" -> 8.0,
    "s29_graph_incremental" -> 8.0, // r19: new; staged base+delta, best-of-2 rides the warm attach
    "s30_graph_delete" -> 8.0, // r19: new; same staged class
    "s31_graph_filtered" -> 8.0, // r19: new; staged index + corpus-size-independent walk
    "s32_graph_filtered_recall" -> 8.0, // r19: new; adds the filtered brute compare (linear)
    "s33_graph_pq" -> 8.0, // r19: new; codebook train + walk, the s9 linear class
    "s34_graph_pq_recall" -> 8.0, // r19: new; s33 + brute compare
    "st21_stream_index_admit" -> 8.0, // r19: new; stateless per-row admission, fixed micro-batch overhead
    "s27_graph_ann" -> 8.0, // r18: new; staged index, best-of-2 rides the warm attach (the q27/s11 class)
    "s28_graph_recall" -> 8.0, // r18: new

    "st7_stream_dedup_bounded" -> 8.0,
    "st9_stream_admit" -> 9.0, // worst honest 7.01 pre-r15-fix; isolated 4.8 after
    "d10_cluster_keep" -> 8.0,
    "d13_keeper_admit" -> 8.0,
    "d15_minhash_accuracy" -> 8.0,
    "d16_manifest_admit" -> 8.0,
    "d20_cross_batch_cluster" -> 8.0,
    "g14_workflow_run" -> 8.0,
    "m5_cdc_chunks" -> 8.0, // native CdcChunks: measured 2.4x (was 9.3x as an HOF)
    "m6_perceptual_hash" -> 8.0, // native AHash: measured 2.1x (was 8.2x exploded)
    "q27_bucketed_join" -> 8.0, // staged layout since r13: best-of-2 rides the warm attach, measured 2.8x (was 8.6x rewriting)
    "q29_partition_prune" -> 8.0,
    "s9_pq_recall" -> 8.0,
    "s10_ivfpq_recall" -> 8.0,
    "st8_stream_multibatch" -> 8.0,
    "st11_stream_compact" -> 8.0,
    "st14_stream_chunk" -> 8.0,
    "st16_stream_validate" -> 8.0)

  /** ADVICE r16 #4: the ratio gate's denominator (the query's sf0.1
    * best, ~1-3 s for the pure per-row-linear class) breathes with
    * host load while the sf1 numerator is stable — q1_agg's nine
    * honest gate readings span 8.1-10.4 s absolute but 6.3-8.6x as a
    * ratio — so each new wobble forced a ratio-allowance ratchet
    * (q1 9→10, q3 8→9, t20 10→12, d23 9→10 by r16), progressively
    * weakening the gate. For keys HERE the gate trips on ABSOLUTE sf1
    * seconds instead, host-normalized by calib_scale exactly like the
    * sf0.1 budget gate: band = ceil(1.3 × worst honest sf1 seconds)
    * over SF1_HISTORY's full unconf'd runs (readings flagged at their
    * own run time excluded — the sf1MaxRatio derivation rule, applied
    * to the stable axis). BudgetsSpec recomputes the rule from
    * history and fails on drift. These keys KEEP their sf1MaxRatio
    * entries — membership in the gated set and the reported ratio are
    * unchanged — but those ratio values are frozen at r16 and no
    * longer ratchet. */
  val sf1MaxSeconds: Map[String, Double] = Map(
    "q1_agg" -> 14.0, // worst honest 10.353 (r16 final gate)
    // r18: back to 13 under the contaminated-run rule (the r17 11.18 s
    // reading was the load-avg-8 gate; clean-run worst honest 9.73 s)
    "q3_join_agg" -> 13.0,
    // r18: back to 13 under the contaminated-run rule (the r17 11.81 s
    // reading was the load-avg-8 gate; clean-run worst honest 9.66 s)
    "t20_bpe_learned" -> 13.0,
    "d23_token_decontam" -> 28.0) // worst honest 21.042
}
