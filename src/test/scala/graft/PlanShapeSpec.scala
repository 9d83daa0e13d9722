package graft

/** Physical-plan shape guards for the analytics core — the properties
  * that decide whether a query survives a 100× scale-up. Asserted
  * against plan text so a refactor that silently loses pushdown, a
  * broadcast, or partial aggregation fails CI, not the cluster.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    // collect() runs THIS queryExecution, so AQE finalizes the plan
    // (a .write would execute a separate copy and leave this one
    // isFinalPlan=false with no codegen stage markers)
    df.collect()
    // keep only the finalized plan — AQE appends an "== Initial Plan =="
    // section that would double-count exchanges
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  // in the simple plan string, whole-stage codegen shows as "*(n) " node
  // prefixes, not the literal class name
  private def hasCodegen(p: String): Boolean = """\*\(\d+\)""".r.findFirstIn(p).isDefined

  test("q2 pushes filters and prunes columns at the parquet scan") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    // at least one real predicate reached the scan, not an empty list
    assert(!p.contains("PushedFilters: []"), p)
    // projection pruning: the scan must not read the wide l_comment
    assert(!p.contains("l_comment"), p)
  }

  test("q4 broadcasts the dimension side") {
    val p = plan("q4_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q3 join tree broadcasts dims, never shuffles them as fact") {
    val p = plan("q3_join_agg")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q5 plans top-k as TakeOrderedAndProject, not a global sort") {
    val p = plan("q5_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q1 aggregates with map-side partials") {
    val p = plan("q1_agg")
    // two HashAggregate levels around the exchange = partial + final
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(hasCodegen(p), p)
  }

  test("hot paths stay inside whole-stage codegen (no interpreted UDFs)") {
    for (q <- Seq("t1_tokens", "t2_quality", "t3_langid", "q12_case_agg")) {
      val p = plan(q)
      assert(hasCodegen(p), s"$q lost codegen:\n$p")
      assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
        s"$q has a non-codegen UDF:\n$p")
    }
  }

  test("s4 probe search never shuffles or broadcasts the corpus for the probe join") {
    val p = plan("s4_ivf_probe")
    // probes/centroids broadcast; the corpus streams through
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // corpus-side SortMergeJoin would mean the probe join shuffled it
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("d7 edge graph has no cartesian or nested-loop join") {
    val p = plan("d7_cluster")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("t7 verdict joins stay equi-joins on doc_id") {
    val p = plan("t7_keep_drop")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(hasCodegen(p), p)
  }

  test("q23 plans the native as-of merge exec, no window or union") {
    val p = plan("q23_asof_native")
    assert(p.contains("AsOfMergeJoin"), p)
    assert(!p.contains("Window") && !p.contains("Union"), p)
  }

  test("q24 range join executes as an equi-join on the band, never a nested loop") {
    val p = plan("q24_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("s29 serves from the staged index segments, never nested-loops") {
    // the incremental walk must READ the persisted base + delta edge
    // segments, not recompute the graph inline. r20: the walk's hop
    // frontiers are materialized eagerly (localCheckpoint), so the
    // staged-segment scans live in the maintained-edges relation the
    // hop jobs consume — pin them there; the final rerank plan keeps
    // the no-nested-loop contract.
    val ep = sim.GraphAnn.incrementalEdges(spark, sf)
      .queryExecution.executedPlan.toString
    assert(ep.contains("graft_graphindex_"), "base edge segment not scanned:\n" + ep)
    assert(ep.contains("graft_graphdelta_"), "delta segment not scanned:\n" + ep)
    val p = plan("s29_graph_incremental")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("s33 walks the staged index, ADC-joins on codes, ranks through heaps") {
    // the DiskANN composition's scale claims, pinned in the plan:
    // the graph comes from the persisted edge segment (never rebuilt
    // inline), the candidate/code/LUT joins are equi-joins (the ADC
    // pass must never nested-loop), and every ranking — seeds, ADC
    // beam, final re-rank — runs through bounded TopKPerKey heaps,
    // not a candidate-sized window sort
    // r20: the frontier materialization moved the staged-edges scan
    // into the hop jobs — pin the segment read on the edges relation
    val ep = sim.GraphAnn.stagedEdges(spark, sf)
      .queryExecution.executedPlan.toString
    assert(ep.contains("graft_graphindex_"), "staged edge segment not scanned:\n" + ep)
    val p = plan("s33_graph_pq")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert("TopKPerKey".r.findAllIn(p).size >= 2,
      "bounded heap stages missing from the ADC/rerank path:\n" + p)
  }

  test("d8 multi-index probe stays an equi-join on the block key") {
    val p = plan("d8_simhash_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the candidate join must be a real join on (block_id, bbits) —
    // hash or merge, either is equi
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("s1/s2/s4 rank candidates with bounded TopKPerKey heaps, never a window sort") {
    // the round-5 verdict's last scale-killer: a row_number window
    // partitioned by q_id ships EVERY scored candidate of a query to
    // one task and fully sorts it. The fix is TopKPerKey's partial +
    // final heap stages (Knn.rankTopK) — assert both survive in the
    // executed plan and no Window node ranks the candidate set.
    for (q <- Seq("s1_knn_brute", "s2_ann_lsh")) {
      val p = plan(q)
      assert("TopKPerKey".r.findAllIn(p).size >= 2,
        s"$q lost the partial+final top-k stages:\n$p")
      assert(!p.contains("Window"), s"$q ranks through a window sort:\n$p")
    }
    val p4 = plan("s4_ivf_probe")
    assert("TopKPerKey".r.findAllIn(p4).size >= 2, p4)
    // the one allowed Window exec ("Window [") ranks the tiny query
    // side's probe cells — and gets the WindowGroupLimit bound, which
    // is fine and not counted; corpus-side candidate ranking and
    // centroid assignment (min_by aggregate) must stay window-free
    assert("Window \\[".r.findAllIn(p4).size <= 1, p4)
  }

  test("q18 never buffers groups in a percentile aggregate or globally sorts the data") {
    val p = plan("q18_percentile")
    // the rebuilt operator's two load-bearing properties: no built-in
    // `percentile` (it collects every group value into one reducer's
    // buffer) ...
    assert(!p.contains("percentile("), p)
    // ... and no global sort of data rows. Window/SMJ sorts are local
    // ("Sort [...], false"); the one allowed global sort orders the
    // 3-row final output.
    val globalSorts = """Sort \[[^\]]*\], true""".r.findAllIn(p).size
    assert(globalSorts <= 1, s"$globalSorts global sorts:\n$p")
  }

  test("sketch queries aggregate with map-side partials — the mergeable-sketch contract") {
    // q25/q26 exist BECAUSE their sketches merge: partials must
    // combine map-side so the shuffle carries one sketch per group,
    // not the data. A plan without a partial aggregate level would be
    // the built-in buffering shape in disguise.
    for (q <- Seq("q25_percentile_sketch", "q26_distinct_sketch")) {
      val p = plan(q)
      assert(p.contains("partial_"), s"$q lost map-side partial aggregation:\n$p")
    }
  }

  test("t31 probes join the broadcast count-min cells — no vocab-sized shuffle join") {
    // the documented contract (VERDICT r17 #7): the d*w <= 1024-cell
    // sketch and the 1-row total BROADCAST to the 20 probe rows; the
    // only hash exchanges are the vocab-level token aggregates
    val p = plan("t31_heavyhitter")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"t31 cms join fell back to a shuffle join:\n$p")
    assert(p.contains("partial_min"), s"t31 lost the mergeable min estimate:\n$p")
  }

  test("g21 agreement is one doc-id equi-join tree + bounded lang aggregates") {
    val p = plan("g21_judge_agreement")
    // marginals/base aggregate with map-side partials on the bounded
    // lang key; the kappa join tree never goes cartesian and plans no
    // window over response rows
    assert("partial_(count|sum)".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), s"g21 planned a window over response rows:\n$p")
  }

  test("g22 reconciliation is two bounded per-model aggregates + one model-key join") {
    val p = plan("g22_cost_reconcile")
    // planned and billed sides each: partial+final HashAggregate on
    // model; joined LEFT on the <=|models|-row key (broadcast at any
    // scale — the agg output is bounded by the model count)
    assert("partial_(count|sum)".r.findAllIn(p).size >= 2, p)
    assert(p.contains("LeftOuter"), p)
    assert(!p.contains("SortMergeJoin"), s"g22 shuffled the bounded model join:\n$p")
    assert(!p.contains("Window"), p)
  }

  test("s26 index health joins cell stats LEFT on the ncells-row centroid list") {
    val p = plan("s26_index_health")
    // the LEFT join keeps empty cells visible; both scalar totals ride
    // broadcast cross joins of 1-row aggregates (the documented
    // driver-metadata class) — never a corpus-sized cartesian
    assert(p.contains("LeftOuter"), p)
    // every nested-loop join must be the broadcast-scalar Cross form
    // (1-row totals; the centroid pipeline adds its own) — a plain
    // inner NLJ or cartesian of data-sized sides is the failure mode
    val nlj = "BroadcastNestedLoopJoin [A-Za-z]+, [A-Za-z]+".r.findAllIn(p).toSeq
    assert(nlj.forall(_.endsWith("Cross")), s"non-scalar NLJ: $nlj\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("m12 magic sniffing is a zero-exchange codegen'd projection") {
    // cost independent of payload size (12-byte prefix hex) and of
    // cluster size: per-row verdicts, no join, no shuffle at all
    val p = plan("m12_magic_sniff")
    assert(!p.contains("Exchange"), s"m12 gained a shuffle:\n$p")
    assert(hasCodegen(p), p)
  }

  test("d6 decontamination broadcasts only the benchmark shingle set") {
    val p = plan("d6_contamination")
    assert(p.contains("BroadcastHashJoin"), p)
    // the corpus side must remain a streamed scan, not a broadcast:
    // exactly one broadcast exchange (the tiny eval-suite side)
    assert("BroadcastExchange".r.findAllIn(p).size == 1, p)
  }

  test("dedup family counts run window-free — no family-sized single-task buffer") {
    // the round-8 verdict's last scale finding: count/max over
    // Window.partitionBy(family) buffers a whole dup family / band
    // bucket / cluster in ONE task (a templated corpus at 100× has
    // million-doc families). d3's sig_count, d7's star roots +
    // cluster_size, d10's size+argmax, and d2/d11's bucket cap are all
    // groupBy().agg() + join back now — map-side partials, and the
    // join is AQE-skew-splittable. Assert no WindowExec survives.
    // t4 (dup_count over fp) and t7 (keeper rule over fp) carry the
    // same risk class — their window partitions are identical-text dup
    // families — and were de-windowed the same way in round 9.
    for (q <- Seq("d3_simhash", "d7_cluster", "d10_cluster_keep",
        "d2_minhash_lsh", "d11_word_minhash", "t4_fingerprint", "t7_keep_drop")) {
      val p = plan(q)
      assert(!"Window \\[".r.findAllIn(p).hasNext,
        s"$q reintroduced a family-sized window partition:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    }
  }

  test("d11 word-gram band join stays an equi-join, never a nested loop") {
    val p = plan("d11_word_minhash")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(hasCodegen(p), p)
  }

  test("d12 incremental admit joins the manifest window-free, scalar-broadcast only") {
    val p = plan("d12_incremental_dedup")
    // the manifest lookups are plain equi-joins (AQE-skew-splittable at
    // 100 TB); the ONLY nested-loop joins allowed are the one-row max-id
    // broadcasts that drive the batch split (docs ⋈ mx, sigs ⋈ mx)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    // four branches (new/corpus × fp/sig) each re-join the ONE-ROW max
    // aggregate; AQE reuses the broadcast exchange itself (ReusedExchange)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 4,
      s"d12 must not nested-loop anything but the max-id scalar:\n$p")
    // ... and every one of them must be the one-row scalar build:
    // exactly ONE materialized IdentityBroadcastMode exchange, the rest
    // ReusedExchange references to it (a ReusedExchange line repeats the
    // original's description, so filter those out before counting)
    val identityBuilds = p.linesIterator.count(l =>
      l.contains("BroadcastExchange IdentityBroadcastMode") && !l.contains("ReusedExchange"))
    assert(identityBuilds <= 1, s"$identityBuilds scalar broadcast builds:\n$p")
  }

  test("t14 tf-idf ranks on bounded heaps; only bounded relations are broadcast-hinted") {
    val df = SparkEntry.queries("t14_tfidf_top")(spark, sf)
    // the df table must NOT be broadcast-HINTED (web-scale vocabulary —
    // AQE may still convert at runtime when the actual size is tiny,
    // which is correct and scale-dependent; the t12 rule); the
    // declared hints are the one-row corpus count (one direct use +
    // dfJoinBack's two temperature predicates) and dfJoinBack's
    // bounded hot-key set — every one is metadata-sized by construction
    val hints = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.size == 4, s"expected 3 scalar + 1 hot-set broadcast hints, got ${hints.size}")
    val p = plan("t14_tfidf_top")
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("Window"), p)
    val identityBuilds = p.linesIterator.count(l =>
      l.contains("BroadcastExchange IdentityBroadcastMode") && !l.contains("ReusedExchange"))
    assert(identityBuilds <= 1, s"$identityBuilds scalar broadcast builds:\n$p")
  }

  test("q31 grouping sets plan one Expand over one scan — not a union of aggregations") {
    val p = plan("q31_grouping_sets")
    assert(p.contains("Expand"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    // all three sets share a single pass over the fact table
    assert("FileScan parquet".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Union"), p)
  }

  test("q30 salted agg runs two phases: a salted exchange, then a tiny key-only merge") {
    val p = plan("q30_salted_agg")
    // phase 1 shuffles on (key, salt) — the hot key spread across
    // reducers; phase 2 merges the ≤ salt partial rows per key
    assert("hashpartitioning\\(l_returnflag#\\d+, __salt".r.findFirstIn(p).isDefined, p)
    assert("hashpartitioning\\(l_returnflag#\\d+, \\d+\\)".r.findFirstIn(p).isDefined, p)
    // both phases keep map-side partials
    assert("HashAggregate".r.findAllIn(p).size >= 4, p)
  }

  test("q29 scan is partition-pruned on ship_month over a many-partition layout") {
    val df = SparkEntry.queries("q29_partition_prune")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the month equality resolves against directory metadata, not rows
    assert("PartitionFilters: \\[[^\\]]*ship_month".r.findFirstIn(p).isDefined, p)
    // and the pruned layout genuinely has many partitions to skip
    val stage = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_partitioned_" + StagePath.corpusToken(sf))
    val listing = java.nio.file.Files.list(stage)
    val months =
      try listing.filter(x => x.getFileName.toString.startsWith("ship_month=")).count()
      finally listing.close()
    assert(months > 12, s"staged month partitions: $months")
    // pruning OBSERVED at the executed scan, not assumed (ADVICE r10):
    // the scan's numFiles metric counts files actually read — it must
    // be strictly smaller than the staged file population
    val scans = collectInPlan(df.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.nonEmpty, s"no FileSourceScanExec in:\n$p")
    val numFiles = scans.map(_.metrics("numFiles").value).sum
    val stagedFiles = {
      val walk = java.nio.file.Files.walk(stage)
      try walk.filter(x => x.getFileName.toString.endsWith(".parquet")).count()
      finally walk.close()
    }
    assert(numFiles >= 1 && numFiles < stagedFiles,
      s"scan read $numFiles of $stagedFiles staged files — pruning not observed")
  }

  test("corpus-sized per-doc outputs carry no global Sort (g5/g14)") {
    // VERDICT r10 #8: the deterministic-compare ordering on outputs
    // proportional to the corpus is sortWithinPartitions — a global
    // Sort there is a full range exchange paid for presentation. The
    // local sort prints as "Sort [...], false" (global=false).
    // round-11 extension: EVERY query whose output is proportional to
    // the corpus (per-doc / per-vector / per-chunk / per-event rows)
    // now follows the convention — the bounded-output orderBys
    // (aggregates, top-k, recall summaries) keep their cheap sort
    val corpusSized = Seq(
      "g5_result_join", "g14_workflow_run",
      "d2_minhash_lsh", "d3_simhash", "d6_contamination", "d7_cluster",
      "d10_cluster_keep", "d12_incremental_dedup", "d17_bloom_admit",
      "d14_repeated_ngrams", "d18_semdedup",
      "t1_tokens", "t2_quality", "t3_langid", "t4_fingerprint",
      "t6_repetition", "t7_keep_drop", "t8_split_assign", "t9_mix_sample",
      "t10_pack", "t12_doc_frequency", "t13_bpe_tokens",
      "t15_curate_pipeline", "t16_pii_redact", "t17_line_dedup",
      "t18_model_score",
      "m1_binary_meta", "m2_frame_sample", "m3_chunking",
      "m4_chunk_dedup", "m5_cdc_chunks", "m6_perceptual_hash",
      "s3_ivf_cells", "q34_compact_latest",
      // round-12 per-doc outputs
      "d19_substring_remove", "d20_cross_batch_cluster",
      "t20_bpe_learned", "t21_perplexity_filter", "m8_interleaved_pack",
      "d21_dedup_pack", "t22_learned_pack",
      // round-13 per-doc outputs
      "d22_multi_decontam", "g16_budget_shard", "s12_range_search",
      // round-17 per-doc outputs
      "t28_url_curate")
    for (q <- corpusSized) {
      val p = plan(q)
      val globalSorts = "Sort \\[[^\\]]*\\], true".r.findAllIn(p).size
      assert(globalSorts == 0, s"$q has $globalSorts global Sort node(s):\n$p")
    }
  }

  test("q32 outer joins are shuffle equi-joins: no nested-loop, no broadcast fact") {
    val p = plan("q32_outer_join")
    // an equi full outer must never degrade to a nested-loop broadcast
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the full outer preserves both sides → sort-merge; the right
    // outer's only broadcastable side is the filtered FACT (the OOM
    // path at 100 TB) and the merge hint keeps it a shuffle join too
    assert("SortMergeJoin.*FullOuter".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("BroadcastHashJoin"),
      s"a fact side got broadcast — wrong at scale:\n$p")
  }

  test("r14 operators (d23/t24/m9): window-free, cartesian-free, bounded broadcasts") {
    // d23: the benchmark token-gram set rides a broadcast membership
    // join (metadata-sized by definition); the corpus gram stream is
    // never pre-shuffled — the only exchanges are the survivors'
    // distinct and the per-doc rollup
    val p23 = plan("d23_token_decontam")
    assert(!p23.contains("Window"), p23)
    assert(!p23.contains("CartesianProduct"), p23)
    assert(p23.contains("BroadcastHashJoin"), p23)
    // t24: the 256-row model broadcasts into the token stream; the
    // doc rollup is a partial-aggregated groupBy; no window anywhere
    val p24 = plan("t24_dsir_resample")
    assert(!p24.contains("Window"), p24)
    assert(!p24.contains("CartesianProduct"), p24)
    assert(p24.contains("BroadcastHashJoin"), p24)
    assert("HashAggregate".r.findAllIn(p24).size >= 2, p24)
    // m9: the phash block self-join must stay an equi-join (the
    // multi-index contract) — never a nested-loop or cartesian
    val p9 = plan("m9_crossmodal_dedup")
    assert(!p9.contains("Window"), p9)
    assert(!p9.contains("CartesianProduct"), p9)
    assert(!p9.contains("BroadcastNestedLoopJoin"), p9)
  }

  test("r14 retrieval family (s15/s16): window-free, cartesian-free, heap-ranked") {
    // s15: both arms end in bounded top-k; the only nested-loop joins
    // are one-row scalar crosses (stats/avgdl), never corpus-sized
    val p15 = plan("s15_hybrid_rrf")
    assert(!p15.contains("Window"), p15)
    assert(!p15.contains("CartesianProduct"), p15)
    assert(p15.contains("BroadcastHashJoin"), p15)
    // s16: per-query ranking is TopKPerKey's partial+final heaps; the
    // vocabulary/candidate joins are broadcast equi-joins
    val p16 = plan("s16_hard_negatives")
    assert(!p16.contains("Window"), p16)
    assert(!p16.contains("CartesianProduct"), p16)
    assert("TopKPerKey".r.findAllIn(p16).size >= 2,
      s"s16 per-query ranking is not the partial+final heap pair:\n$p16")
    assert(p16.contains("BroadcastHashJoin"), p16)
  }

  test("d17 bloom probe broadcasts only the bounded bitmap; no window, no cartesian") {
    val p = plan("d17_bloom_admit")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the word bitmap (≤ m/64 rows by construction) probes via
    // broadcast hash join; the fp manifest joins stay shuffle equi-joins
    assert(p.contains("BroadcastHashJoin"), p)
    // the only nested-loop broadcast is the one-row max-id scalar
    val identityBuilds = p.linesIterator.count(l =>
      l.contains("BroadcastExchange IdentityBroadcastMode") && !l.contains("ReusedExchange"))
    assert(identityBuilds <= 1, s"$identityBuilds scalar broadcast builds:\n$p")
  }

  test("d13 keeper-manifest admit stays window-free with scalar-only broadcasts too") {
    // same contract as d12's pin; the clustering runs eagerly inside the
    // query builder (localCheckpoint), so the FINAL plan here is the
    // manifest join — the cluster loop's own shape is pinned by the
    // d3/d7/d10 window-free test above
    val p = plan("d13_keeper_admit")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    val identityBuilds = p.linesIterator.count(l =>
      l.contains("BroadcastExchange IdentityBroadcastMode") && !l.contains("ReusedExchange"))
    assert(identityBuilds <= 1, s"$identityBuilds scalar broadcast builds:\n$p")
  }

  test("d14 gram coverage joins by shuffle on the gram key — no window, no nested loop") {
    val p = plan("d14_repeated_ngrams")
    assert(!"Window \\[".r.findAllIn(p).hasNext, p)
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop shape is dfJoinBack's one-row scalar cross
    // (IdentityBroadcastMode — the t12/q28 pattern, ≤1 distinct build);
    // no corpus-sized relation ever rides a nested loop
    val identityBuilds = p.linesIterator.count(l =>
      l.contains("BroadcastExchange IdentityBroadcastMode") && !l.contains("ReusedExchange"))
    assert(identityBuilds <= 1, s"$identityBuilds scalar broadcast builds:\n$p")
    val bnlj = "BroadcastNestedLoopJoin[^\\n]*".r.findAllIn(p).toSeq
    assert(bnlj.forall(_.contains("Cross")), s"non-scalar nested loop:\n$p")
    // both the gram-df aggregate and the per-doc aggregate keep
    // map-side partials
    assert(p.contains("partial_count") && p.contains("partial_sum"), p)
  }

  test("d15 estimate-vs-exact stays equi-join only — no quadratic path") {
    val p = plan("d15_minhash_accuracy")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // top-100 via TakeOrdered, not a global sort of all pairs
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("s7 quantized ranking runs on the same bounded heaps as s1") {
    val p = plan("s7_sq8_recall")
    // both rankings (exact truth + quantized) keep partial+final
    // TopKPerKey stages; no Window ranks any candidate set
    assert("TopKPerKey".r.findAllIn(p).size >= 4,
      s"s7 lost the partial+final top-k stages on one side:\n$p")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q28 partial-merge keeps map-side partials in BOTH stages, one scalar broadcast") {
    val p = plan("q28_delta_agg")
    assert(!p.contains("Window"), p)
    // partial aggregation must survive at the per-side stage AND the
    // merge stage (the shuffle carries group-sized partials, not rows)
    assert(p.contains("partial_sum") && p.contains("partial_count"), p)
    val identityBuilds = p.linesIterator.count(l =>
      l.contains("BroadcastExchange IdentityBroadcastMode") && !l.contains("ReusedExchange"))
    assert(identityBuilds <= 1, s"$identityBuilds scalar broadcast builds:\n$p")
  }

  test("t12 DF join-back shuffles on the token key — no window, bounded broadcasts only") {
    val df = SparkEntry.queries("t12_doc_frequency")(spark, sf)
    // the DF table must NOT be broadcast-HINTED (web-scale vocabulary
    // — AQE may still convert at runtime when the actual size is tiny,
    // which is correct and scale-dependent); the declared hints are
    // the one-row corpus count (direct + dfJoinBack's two temperature
    // predicates) and dfJoinBack's bounded hot-key set
    val hints = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.size == 4, s"expected 3 scalar + 1 hot-set broadcast hints, got ${hints.size}")
    val p = plan("t12_doc_frequency")
    assert(!p.contains("Window"), p)
    val identityBuilds = p.linesIterator.count(l =>
      l.contains("BroadcastExchange IdentityBroadcastMode") && !l.contains("ReusedExchange"))
    assert(identityBuilds <= 1, s"$identityBuilds scalar broadcast builds:\n$p")
    // both aggregations keep map-side partials
    assert(p.contains("partial_count") && p.contains("partial_sum"), p)
  }

  test("m2 frame sampling ranks per (user, time-bucket) — no whole-user window partition") {
    // the r9 verdict's last per-entity window in an oracle query:
    // row_number over partitionBy(user_id) buffers one hot user's whole
    // event history in one task. The t10-style two-level prefix-sum
    // replaces it; the surviving rank window must be bucket-scoped
    // (partition spec includes tb), and the bucket-count aggregate must
    // keep map-side partials.
    val p = plan("m2_frame_sample")
    val rn = p.linesIterator.filter(_.contains("row_number()")).toSeq
    assert(rn.nonEmpty, p)
    assert(rn.forall(_.contains("tb#")), s"row_number must partition by (user_id, tb):\n$p")
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the bucket-width stats row rides an in-plan scalar broadcast (the
    // d12/q28 pattern — replaced a separate driver action); it must be
    // the ONLY nested-loop build, and a one-row identity one at that
    val identityBuilds = p.linesIterator.count(l =>
      l.contains("BroadcastExchange IdentityBroadcastMode") && !l.contains("ReusedExchange"))
    assert(identityBuilds <= 1, s"$identityBuilds scalar broadcast builds:\n$p")
  }

  test("s9 PQ pipeline: assignment argmins and ADC stay window-free, codebooks broadcast") {
    val p = plan("s9_pq_recall")
    // per-(vec,sub) argmins are min-struct hash aggregates; candidate
    // ranking runs TopKPerKey + the re-rank's bounded heaps — a Window
    // here would mean a per-vector sort crept into encode or scoring
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    // ADC candidates and final rank both through the custom operator
    assert(p.contains("TopKPerKey"), p)
    // codebook/LUT joins broadcast their bounded side
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("s5 recall compare runs over heap-ranked sides — no window anywhere") {
    val p = plan("s5_ann_recall")
    // both ranking sides run through TopKPerKey; the comparison adds
    // only joins and aggregates — a Window here would mean a ranking
    // regression in s1/s2. (The semi-join itself may be folded away by
    // AQE's empty-relation propagation at this SF: the sf0.001 corpus
    // is so sparse that LSH recall is legitimately 0 for every query.)
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q27 bucketed join reads co-located buckets — no exchange on either join side") {
    // broadcast off: at test SF the dimension would fit a broadcast and
    // bypass bucketing entirely (at real scale neither fact side fits)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("q27_bucketed_join")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      // the aggregation above the join may exchange on its OWN key;
      // what bucketing must eliminate is any shuffle on the join keys
      assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
        !p.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle its inputs:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q27 layout is staged: warm runs attach without rewriting, a conf change re-writes") {
    val out1 = SparkEntry.queries("q27_bucketed_join")(spark, sf).collect().toSeq
    val stage = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_bucketed_" + StagePath.corpusToken(sf))
    // sentinel: a bucketed re-WRITE clears the table directory, a warm
    // (attach-only) run leaves it — the d16 probe discipline
    val probe = stage.resolve("graft_q27_lineitem").resolve("_graft_probe")
    java.nio.file.Files.write(probe, Array[Byte]())
    val warm = SparkEntry.queries("q27_bucketed_join")(spark, sf).collect().toSeq
    assert(java.nio.file.Files.exists(probe), "warm run re-wrote the bucketed layout")
    assert(warm == out1, "warm attach diverged from the staging run")
    // a different bucket count is a DIFFERENT layout, not a stale one —
    // the marker encodes it, so the run must re-write
    spark.conf.set("graft.bucket.n", "4")
    try {
      val rebuilt = SparkEntry.queries("q27_bucketed_join")(spark, sf).collect().toSeq
      assert(!java.nio.file.Files.exists(probe),
        "bucket-count change did not force a layout re-write")
      assert(rebuilt == out1, "bucket count changed the RESULT (layout must be semantics-free)")
    } finally spark.conf.unset("graft.bucket.n")
    // and the default-count run after it re-writes once more (marker
    // now encodes n=4), converging back to the default layout
    val back = SparkEntry.queries("q27_bucketed_join")(spark, sf).collect().toSeq
    assert(back == out1)
  }

  test("s12 range search is rank-free: no window, no top-k heap, broadcast probes") {
    val df = SparkEntry.queries("s12_range_search")(spark, sf)
    df.collect()
    val exec = df.queryExecution.executedPlan
    // the whole point of the range surface: the τ filter replaces the
    // per-query ranking machinery — nothing buffers a candidate set
    val windows = collectInPlan(exec) {
      case w: org.apache.spark.sql.execution.window.WindowExec
        // the probe-cell selection (2 cells per query over the tiny
        // centroid relation) legitimately ranks per q_id; only a
        // window over the corpus-sized scored output is a regression
        if w.partitionSpec.isEmpty => w.simpleStringWithNodeId()
    }
    assert(windows.isEmpty, s"unpartitioned window in range plan: $windows")
    val p = exec.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("TopKPerKey"), "range search must not pay the top-k heap")
    assert(p.contains("BroadcastHashJoin"), "probe join lost its broadcast")
  }

  test("s10 IVF+PQ composes the cell restriction before ADC — probed cells only") {
    val p = plan("s10_ivfpq_recall")
    // the candidate set is generated by the cell equi-join
    // (assigned_cell = probe_cell) and flows INTO the code/LUT joins —
    // vectors outside probed cells are never ADC-scored. The join is
    // visible in the plan; the ORACLE pins the semantics (scoring
    // unprobed cells would change the ADC top-20 and fail the compare).
    val cellJoin = p.linesIterator.exists(l =>
      l.contains("Join") && l.contains("probe_cell") && l.contains("assigned_cell"))
    assert(cellJoin, s"no (assigned_cell = probe_cell) join in:\n$p")
    // ranking through heaps; the only Window is the tiny query-side
    // probe-cell rank (5 query rows × ncells, the s4/s6 pin)
    assert(p.contains("TopKPerKey"), p)
    assert("Window \\[".r.findAllIn(p).size <= 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s6 IVF recall ranks through heaps; only the probe-cell window survives") {
    val p = plan("s6_ivf_recall")
    // both s1 (truth) and s4 (IVF) rank candidates through TopKPerKey;
    // the single allowed Window is s4's tiny query-side probe-cell rank
    // (5 query rows × ncells), same as the s4 plan pin
    assert(p.contains("TopKPerKey"), p)
    assert("Window \\[".r.findAllIn(p).size <= 1, p)
  }

  test("q33 unpivot melts through one Expand over one scan — not a 4x union re-scan") {
    val p = plan("q33_unpivot")
    // Dataset.unpivot plans an Expand (one scan, rows multiplied
    // in-operator); the union-of-projections formulation the oracle
    // SQL spells would scan the fact once per measure — 4x the scan
    // cost at 100 TB for an identical result
    assert(p.contains("Expand"), p)
    assert("FileScan parquet".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Union"), p)
    // the aggregate on top keeps map-side partials
    assert(p.contains("partial_count") || p.contains("partial"), p)
  }

  test("q34 compaction is a map-side-combining aggregate — no window, no per-key sort") {
    val p = plan("q34_compact_latest")
    // the row_number-over-key formulation the oracle spells would
    // shuffle every change row and sort each key's history; the
    // max(struct) aggregate must keep partial (map-side) stages and
    // plan zero Window/Sort-by-key operators
    assert(!p.contains("Window"), p)
    assert(p.contains("partial"), p)
    // exactly one exchange: the final per-key merge
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("s11 persisted-index probe prunes inverted-list directories, equals s4") {
    val df = SparkEntry.queries("s11_ivf_persist")(spark, sf)
    val rows = df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the probe's cell filter must resolve against the inverted-list
    // DIRECTORY layout, not rows
    assert("PartitionFilters: \\[[^\\]]*assigned_cell".r.findFirstIn(p).isDefined, p)
    // pruning observed: the lists scan reads fewer files than staged
    val stage = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_ivfindex_" + StagePath.corpusToken(sf)).resolve("lists")
    val stagedFiles = {
      val walk = java.nio.file.Files.walk(stage)
      try walk.filter(x => x.getFileName.toString.endsWith(".parquet")).count()
      finally walk.close()
    }
    val scans = collectInPlan(df.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains("graft_ivfindex")) => f }
    assert(scans.nonEmpty, p)
    val numFiles = scans.map(_.metrics("numFiles").value).sum
    assert(numFiles >= 1 && numFiles < stagedFiles,
      s"lists scan read $numFiles of $stagedFiles staged files — directory pruning not observed")
    // persistence must not change search semantics: s11 == s4
    val s4rows = SparkEntry.queries("s4_ivf_probe")(spark, sf).collect()
    assert(rows.toSeq == s4rows.toSeq, "persisted-index search diverged from s4")
  }

  test("s11 re-stages its persisted index when the logic version changes") {
    // the d16/st9 freshness rule: a staged artifact must encode the
    // logic version that built it, so an index laid out by an older
    // rule can never serve a newer search path. Simulate the stale
    // case by rewriting the marker with a foreign version token — the
    // next run must rebuild and restore the current meta.
    SparkEntry.queries("s11_ivf_persist")(spark, sf).collect() // ensure staged
    val dir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_ivfindex_" + StagePath.corpusToken(sf))
    val marker = dir.resolve("_src_meta")
    val current = new String(java.nio.file.Files.readAllBytes(marker), "UTF-8")
    assert(current.contains(":ivf1:"), s"marker must encode the index version: $current")
    val stale = current.replace(":ivf1:", ":ivf0:")
    java.nio.file.Files.write(marker, stale.getBytes("UTF-8"))
    val listsBefore = java.nio.file.Files.getLastModifiedTime(dir.resolve("lists")).toMillis
    val rows = SparkEntry.queries("s11_ivf_persist")(spark, sf).collect()
    val after = new String(java.nio.file.Files.readAllBytes(marker), "UTF-8")
    assert(after == current, s"version mismatch must force a re-stage: $after")
    // the marker alone could be restored without re-staging — prove the
    // index itself was rebuilt (r11 advice: assert on the lists dir)
    val listsAfter = java.nio.file.Files
      .getLastModifiedTime(dir.resolve("lists")).toMillis
    assert(listsAfter > listsBefore,
      s"stale marker must trigger an actual index rebuild " +
        s"(lists mtime $listsBefore -> $listsAfter)")
    assert(rows.nonEmpty)
  }

  test("packing prefix sums plan NO unpartitioned window (t10/t15/m7, r11 verdict #4)") {
    for (q <- Seq("t10_pack", "t15_curate_pipeline", "m7_shard_pack", "g16_budget_shard")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val bad = collectInPlan(df.queryExecution.executedPlan) {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w.simpleStringWithNodeId()
      }
      assert(bad.isEmpty,
        s"$q plans an unpartitioned Window (the serial √n point): ${bad.mkString("; ")}")
    }
  }

  test("q37 row_number()=1 is rewritten to a map-side struct-max aggregate") {
    val p = plan("q37_latest_rewrite")
    // the query is WRITTEN as a window; the session-registered
    // LatestRewrite rule must have replaced it wholesale — with ONE
    // atomic max(struct(...)) (tie-safe: never per-column max_by,
    // which could assemble a chimera row from tied inputs)
    assert(!p.contains("Window"), p)
    assert(p.contains("max(named_struct"), p)
    assert(!p.contains("max_by"), p)
    assert(p.contains("partial"), p)
    // exactly one exchange: the final per-key merge (q34's shape)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    // and the rewrite is semantics-preserving against the un-rewritten
    // plan: q34's struct-max compaction computes the same latest rows
    import org.apache.spark.sql.functions._
    val q37 = SparkEntry.queries("q37_latest_rewrite")(spark, sf)
      .orderBy("user_id").collect().toSeq
    val q34 = SparkEntry.queries("q34_compact_latest")(spark, sf)
      .select(col("user_id"), col("last_tus"), col("last_event_id"),
        col("last_event_type"), col("last_value"))
      .orderBy("user_id").collect().toSeq
    assert(q37 == q34, "rewritten window diverged from the aggregate formulation")
  }

  test("q36 z-order manifest skipping is observed at the executed scan") {
    val df = SparkEntry.queries("q36_zorder_skip")(spark, sf)
    df.collect()
    // r19: the layout is staged under <stage>/data beside its
    // once-written manifest (<stage>/manifest) — count data files only
    val stage = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_zorder_" + StagePath.corpusToken(sf), "data")
    val stagedFiles = {
      val walk = java.nio.file.Files.walk(stage)
      try walk.filter(x => x.getFileName.toString.endsWith(".parquet")).count()
      finally walk.close()
    }
    // the z-clustered layout must give the 2-d predicate something to
    // skip: the final scan reads strictly fewer files than were staged
    // (numFiles counts what the pruned listing handed the scan)
    val scans = collectInPlan(df.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val numFiles = scans.map(_.metrics("numFiles").value).sum
    assert(numFiles >= 1 && numFiles < stagedFiles,
      s"scan read $numFiles of $stagedFiles staged files — skipping not observed")
    // and the clustering is doing real work: a single month × 8 of 128
    // buckets must not touch more than half the corpus's files
    assert(numFiles * 2 <= stagedFiles,
      s"z-order boxes too loose: $numFiles of $stagedFiles files overlap a 2-d point-range predicate")
  }

  test("q35 cohort join shuffles the corpus-sized side, broadcasts only the matrix") {
    val p = plan("q35_cohort_retention")
    // the per-customer first-order table is corpus-proportional: it
    // must meet the fact in a shuffle equi-join, never a broadcast
    val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)[^\\n]*".r
      .findAllIn(p).toSeq
    val custJoins = joins.filter(_.contains("o_custkey#"))
    assert(custJoins.nonEmpty, p)
    // pinned by hint: the hinted shuffle join must survive AQE even at
    // toy scale, where an unhinted plan would broadcast
    assert(custJoins.forall(_.startsWith("ShuffledHashJoin")), custJoins.mkString("\n"))
    // the cohort-size join-back is months²-bounded → must broadcast
    assert(joins.exists(j => j.startsWith("BroadcastHashJoin") && j.contains("cmi#")), p)
    // first-order month is a map-side-partial min aggregate, no window
    assert(p.contains("partial_min"), p)
    assert(!p.contains("Window"), p)
  }

  test("t17 line-DF join-back is salted on the line hash, reassembly is window-free") {
    val p = plan("t17_line_dedup")
    // the DF join-back: both sides corpus-proportional, routed through
    // Salted.dfJoinBack — the executed equi-join runs on
    // (lh, __salt), so a boilerplate line hash cannot own a reducer.
    // The dict side carries no broadcast HINT (AQE may still convert
    // at runtime when the actual size is tiny — the t12/t14 rule; the
    // declared broadcasts are the scalar count and the hot-key set).
    val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)[^\\n]*".r
      .findAllIn(p).toSeq
    val lhJoins = joins.filter(_.contains("lh#"))
    assert(lhJoins.nonEmpty, p)
    assert(lhJoins.exists(_.contains("__salt")),
      "join-back lost the salt sub-key:\n" + lhJoins.mkString("\n"))
    // reassembly is ONE aggregate per doc — no window, no range sort
    assert(!p.contains("Window"), p)
    // the total_docs scalar rides a broadcast, never a shuffled cross
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t17 drops exactly the planted high-DF boilerplate lines") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("t17_line_dedup")(spark, sf)
    val expectedDrops =
      when(col("doc_id") % 3 === 0, 1).otherwise(0) +
      when(col("doc_id") % 4 === 1, 1).otherwise(0)
    assert(out.filter(col("n_lines") - col("n_kept") =!= expectedDrops).count() == 0L)
    // unique text and the rare footer survive: every doc keeps >= 1 line
    assert(out.filter(col("n_kept") < 1).count() == 0L)
    // cleaned text never contains a boilerplate line
    assert(out.filter(col("cleaned").contains("subscribe to our newsletter")).count() == 0L)
    // the %7 variant key is live (r11 advice: the old %5 key made only
    // variant 2 reachable): several DISTINCT footer variants survive,
    // each with DF ~ total/350, comfortably under the 2% threshold
    val nVariants = out
      .filter(col("cleaned").contains("regional footer variant"))
      .select(regexp_extract(col("cleaned"), "regional footer variant (\\d)", 1).as("v"))
      .distinct().count()
    assert(nVariants >= 2, s"expected multiple live footer variants, got $nVariants")
  }

  test("g15 corrupt quarantine is a shuffle-free per-line verdict") {
    val p = plan("g15_corrupt_quarantine")
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
    val out = SparkEntry.queries("g15_corrupt_quarantine")(spark, sf)
    import org.apache.spark.sql.functions._
    // the verdict matches the planted corruption rule exactly
    val wrong = out.filter(
      (col("doc_id") % 13 === 5 && col("reason") =!= "empty") ||
      (col("doc_id") % 13 =!= 5 && col("doc_id") % 7 === 3 && col("reason") =!= "malformed") ||
      (col("doc_id") % 13 =!= 5 && col("doc_id") % 7 =!= 3 && col("reason") =!= "ok")).count()
    assert(wrong == 0L)
    // ok rows parse; quarantined rows keep their raw bytes (empty lines
    // quarantine with an empty raw — present, zero-length)
    assert(out.filter(col("ok") && col("parsed_tokens").isNull).count() == 0L)
    assert(out.filter(col("reason") === "malformed" && col("raw_quarantine").isNull).count() == 0L)
  }

  test("g20 schema validation is per-row verdicts + a rollup-only exchange") {
    val p = plan("g20_schema_validate")
    // the verdict chain is join-free; the only exchanges carry the
    // <= 6-row reason rollup (hash for the agg, range for the orderBy)
    assert(!p.contains("Join"), p)
    val exchanges = "Exchange [a-z]+partitioning".r.findAllIn(p).toSeq
    assert(exchanges.size <= 2, s"expected only rollup exchanges:\n$p")
  }

  test("m7 shard packing keeps the prefix sum two-level and bucket-scoped") {
    val p = plan("m7_shard_pack")
    // every doc_id-ordered window is bucket-partitioned (the t10/t15
    // pin: a flat ORDER BY doc_id window would put the corpus into one
    // task); the only other window is the √n-row bucket-offset scan
    val wspecs = "windowspecdefinition\\([^)]*\\)".r.findAllIn(p).toSeq
    assert(wspecs.nonEmpty, p)
    for (w <- wspecs if w.contains("doc_id#"))
      assert(w.contains("pbucket#"), s"corpus-wide ordered window:\n$w\n$p")
    // bucket offsets are metadata-sized and broadcast
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("m7_shard_pack")(spark, sf)
    // shards partition the corpus: byte mass conserved, ids disjoint
    val tot = out.agg(sum("shard_bytes"), sum("n_docs")).head()
    val docs = Tables.documents(spark, sf)
    assert(tot.getLong(1) == docs.count())
    assert(tot.getLong(0) == docs.agg(sum(octet_length(col("text")).cast("long"))).head().getLong(0))
  }

  test("t19 temperature weights flatten the source distribution, scalar broadcast") {
    val p = plan("t19_temperature_mix")
    // per-source mass combines map-side; the normalizer is a broadcast
    // one-row scalar, never a shuffled cross
    assert(p.contains("partial"), p)
    assert(!p.contains("CartesianProduct"), p)
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("t19_temperature_mix")(spark, sf).collect()
    // α=0.5 flattens: the sampling boost p_sample/p_natural must be
    // strictly decreasing in source size (upsample tail, damp head)
    val bySize = out.sortBy(_.getAs[Long]("n_tokens"))
    val boosts = bySize.map(r => r.getAs[Double]("p_sample") / r.getAs[Double]("p_natural"))
    for (i <- 1 until boosts.length if bySize(i).getAs[Long]("n_tokens") > bySize(i - 1).getAs[Long]("n_tokens"))
      assert(boosts(i) < boosts(i - 1),
        s"boost not decreasing at ${bySize(i).getAs[String]("source")}")
    // probabilities normalize (integer milli-weights: exact to 1e-9)
    val psum = out.map(_.getAs[Double]("p_sample")).sum
    assert(math.abs(psum - 1.0) < 1e-9, s"p_sample sums to $psum")
  }

  test("t18 model scoring broadcasts the calibration dim and stays shuffle-free") {
    val p = plan("t18_model_score")
    // the 5-row calibration table must broadcast; any Exchange means
    // the corpus moved to meet a dictionary
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(hasCodegen(p), p)
  }

  test("t18 scores are positive (trunc-vs-floor division cannot diverge) and split") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("t18_model_score")(spark, sf)
    assert(out.filter(col("score") <= 0).count() == 0L)
    // every doc scored (no lang fell out of the calibration join)
    assert(out.count() == Tables.documents(spark, sf).count())
    // the thresholds genuinely split the corpus
    val labels = out.select(countDistinct(col("label"))).head().getLong(0)
    assert(labels == 2L, s"expected both keep and drop, got $labels label(s)")
  }

  test("t16 PII redaction is one shuffle-free codegen'd projection over the scan") {
    val p = plan("t16_pii_redact")
    // per-row scrub: any Exchange/join/aggregate here would mean the
    // scan-speed claim is false at 100 TB
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("HashAggregate"), p)
    assert(hasCodegen(p), p)
  }

  test("t16 redacted text carries no live PII span") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("t16_pii_redact")(spark, sf)
    val leaked = out.filter(
      col("redacted").rlike(text.TextAnalysis.EmailPat) ||
      col("redacted").rlike(text.TextAnalysis.PhonePat) ||
      col("redacted").rlike(text.TextAnalysis.Ipv4Pat) ||
      col("redacted").rlike(text.TextAnalysis.SsnPat)).count()
    assert(leaked == 0L)
    // every doc got exactly one planted instance of each kind
    val bad = out.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1 ||
      col("n_ips") =!= 1 || col("n_ssns") =!= 1 || col("n_pii") =!= 4).count()
    assert(bad == 0L)
  }

  test("t15 pipeline packs per split through bucketed windows, bucket offsets broadcast") {
    val p = plan("t15_curate_pipeline")
    // the per-split prefix sum must stay two-level: every Window that
    // orders by doc_id has pbucket in its partition spec (a flat
    // PARTITION BY split ORDER BY doc_id window would put a whole
    // split — most of the corpus — into one task), and the only other
    // window is the metadata-sized bucket-offset scan (split, pbucket)
    val wspecs = "windowspecdefinition\\([^)]*\\)".r.findAllIn(p).toSeq
    assert(wspecs.nonEmpty, p)
    for (w <- wspecs if w.contains("doc_id#"))
      assert(w.contains("pbucket#"), s"corpus-wide ordered window:\n$w\n$p")
    // the bucket-offset relation is metadata-sized and must broadcast
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the verdict joins stay equi-joins on doc_id (t7's pin holds
    // through the composition)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
