package graft

import org.apache.spark.sql.functions._

/** Accuracy and structure contracts for the graph-ANN family
  * (s27/s28) beyond the DuckDB hash-parity the driver checks:
  * the oracle proves both engines compute the same thing; this spec
  * proves the thing computed is a WORKING navigable index.
  */
class GraphAnnSpec extends SparkSpec {

  /** sf0.01, the same accuracy SF as SketchAccuracySpec: big enough
    * that the forest buckets and graph hops do real selection. */
  private val accSf = "/root/testdata/sf0.01"

  test("s28 graph recall@10 clears the measured floor") {
    // measured 0.9-1.0 per query at sf0.01/sf0.1/sf1 in r18; 0.5 is
    // the regression alarm, not the spec of the index (a broken walk
    // reads 0.0-0.3 — the single-table draft did)
    val rec = SparkEntry.queries("s28_graph_recall")(spark, accSf).collect()
    assert(rec.length === 5)
    for (r <- rec) {
      assert(r.getLong(1) === 10L, s"q${r.getLong(0)}: truth size wiring")
      assert(r.getDouble(3) >= 0.5,
        s"q${r.getLong(0)}: graph recall ${r.getDouble(3)} below the 0.5 floor")
    }
  }

  test("the navigation earns its keep: graph recall beats the forest-scan baseline") {
    // inject-then-measure (the t16/t28/t31 discipline): a graph whose
    // hops never add a neighbor is a vacuous index — the walk must
    // strictly beat the no-graph forest bucket scan somewhere, and
    // never lose to it
    val graph = SparkEntry.queries("s28_graph_recall")(spark, accSf)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val seeds = sim.GraphAnn.s28SeedsOnly(spark, accSf)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(graph.keySet === seeds.keySet)
    for ((q, g) <- graph)
      assert(g >= seeds(q) - 1e-12, s"q$q: graph $g lost to forest-only ${seeds(q)}")
    assert(graph.exists { case (q, g) => g > seeds(q) + 1e-12 },
      s"hops added nothing anywhere: graph=$graph forest=$seeds")
  }

  test("the graph index has bounded out-degree and no self-loops") {
    val edges = sim.GraphAnn.graphEdges(spark, accSf).collect()
    assert(edges.nonEmpty)
    assert(!edges.exists(r => r.getLong(0) == r.getLong(1)), "self-loop edge")
    val deg = edges.groupBy(_.getLong(0)).map(_._2.length)
    assert(deg.max <= 16, s"out-degree ${deg.max} exceeds G=16")
    // edges are (cos DESC)-ranked truncations: every stored cos is finite
    assert(edges.forall(r => !r.getDouble(2).isNaN), "NaN cosine survived")
  }

  test("s29 incremental maintenance equals the wholesale rebuild, edge for edge") {
    // the s17/d20 exactness discipline: the delta path (persisted base
    // edges + recomputed touched set) must be INDISTINGUISHABLE from
    // rebuilding the whole graph over base ∪ batch — not approximately,
    // label for label including the stored cosine
    val inc = sim.GraphAnn.incrementalEdges(spark, accSf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val scratch = sim.GraphAnn.s29FromScratchEdges(spark, accSf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(inc === scratch, "incremental graph maintenance diverged from the rebuild")
  }

  test("s29 actually reuses the base index: the touched set is a proper subset") {
    // inject-then-measure: maintenance that recomputes EVERY node is a
    // rebuild wearing a delta costume — the replaced set must cover
    // the batch (every planted node needs edges) yet leave a
    // meaningful share of base nodes untouched
    val deltaDir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_graphdelta_" + StagePath.corpusToken(accSf))
    sim.GraphAnn.incrementalEdges(spark, accSf).count() // ensure staged
    val replaced = spark.read.parquet(deltaDir.resolve("replaced").toString)
      .collect().map(_.getLong(0)).toSet
    val batchIds = spark.read.parquet(accSf + "/embeddings.parquet")
      .filter(col("vec_id") % 10 === 0)
      .collect().map(_.getAs[Long]("vec_id") + 1000000L).toSet
    assert(batchIds.subsetOf(replaced),
      "planted batch nodes missing from the touched set")
    val baseN = spark.read.parquet(accSf + "/embeddings.parquet").count()
    val baseTouched = (replaced -- batchIds).size
    assert(baseTouched < baseN,
      s"touched set covers every base node ($baseTouched of $baseN) — no reuse")
    assert(baseTouched > 0,
      "no base node touched — the batch must perturb SOME neighborhood")
  }

  test("s30 delete maintenance equals the survivor rebuild, edge for edge") {
    val inc = sim.GraphAnn.deleteMaintainedEdges(spark, accSf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val scratch = sim.GraphAnn.s30FromScratchEdges(spark, accSf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(inc === scratch, "delete maintenance diverged from the survivor rebuild")
  }

  test("s30 leaves no ghosts: deleted ids appear on neither edge side, and the path is non-vacuous") {
    val edges = sim.GraphAnn.deleteMaintainedEdges(spark, accSf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val deleted = spark.read.parquet(accSf + "/embeddings.parquet")
      .filter(col("vec_id") % 97 === 5).collect().map(_.getAs[Long]("vec_id")).toSet
    assert(deleted.nonEmpty, "delete set empty at this SF — the test corpus moved")
    assert(!edges.exists(e => deleted(e._1)), "deleted node still has out-edges")
    assert(!edges.exists(e => deleted(e._2)), "ghost edge points at a deleted node")
    // non-vacuous: the delete really hit pivots somewhere (the pair
    // universe changed, not just rows dropped) — the base index must
    // have contained at least one now-gone dst
    val baseEdges = spark.read.parquet(java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        "graft_graphindex_" + StagePath.corpusToken(accSf))
      .resolve("edges").toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(baseEdges.exists(e => deleted(e._2)),
      "no base edge pointed at a deleted id — pivot-loss path not exercised")
  }

  test("s31 filtered search: admissible-only results, and the filter binds") {
    // every returned neighbor satisfies the predicate (the s22
    // correctness contract: filter-then-rank, never post-filter a
    // top-k), with a FULL top-10 per query — the structural over-fetch
    // (<= S*G + S*G^2 candidates for a top-10 ask) must absorb the
    // 50% predicate without underfilling
    val admissible = spark.read.parquet(accSf + "/embeddings.parquet")
      .filter(expr(sim.Knn.FilterPredSql)).collect().map(_.getAs[Long]("vec_id")).toSet
    val filtered = SparkEntry.queries("s31_graph_filtered")(spark, accSf).collect()
    assert(filtered.length === 50, "underfilled: expected a full top-10 x 5 queries")
    assert(filtered.forall(r => admissible(r.getLong(2))),
      "inadmissible vector in the filtered result")
    // inject-then-measure: the predicate must CHANGE the answer — if
    // s27's unfiltered top-10 were all-admissible everywhere, this
    // measured nothing (50% selectivity makes that astronomically
    // unlikely; a corpus drift that breaks it should fail loudly here)
    val unfiltered = SparkEntry.queries("s27_graph_ann")(spark, accSf).collect()
    assert(unfiltered.exists(r => !admissible(r.getLong(2))),
      "s27's top-10 is already all-admissible — the filter test is vacuous")
  }

  test("s32 filtered-graph recall@10 clears the measured floor") {
    // same floor discipline as s28: measured high at sf0.01; 0.5 is
    // the regression alarm (a broken filtered re-rank — e.g.
    // post-filtering a plain top-10 — underfills n_found visibly)
    val rec = SparkEntry.queries("s32_graph_filtered_recall")(spark, accSf).collect()
    assert(rec.length === 5)
    for (r <- rec) {
      assert(r.getLong(1) === 10L, s"q${r.getLong(0)}: filtered truth size wiring")
      assert(r.getDouble(3) >= 0.5,
        s"q${r.getLong(0)}: filtered recall ${r.getDouble(3)} below the 0.5 floor")
    }
  }

  test("s33 PQ pruning is real, and s34's recall clears the mean floor") {
    // non-vacuous two-stage split: the walk's candidate pool must
    // exceed the beam everywhere, or the ADC stage prunes nothing and
    // the "DiskANN shape" is an exact re-rank in costume
    val counts = sim.GraphAnn.walkCandCounts(spark, accSf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.size === 5)
    for ((q, n) <- counts)
      assert(n > sim.GraphAnn.pqFetchK,
        s"q$q: only $n walk candidates — beam ${sim.GraphAnn.pqFetchK} prunes nothing")
    // accuracy: per-query values are hash-pinned by the oracle (the
    // s9 discipline — an approximate index's exact numbers ARE its
    // contract); the spec adds a MEAN floor as the regression alarm
    // (measured 0.54; a broken ADC join or LUT key mismatch reads
    // near 0.0)
    val rec = SparkEntry.queries("s34_graph_pq_recall")(spark, accSf)
      .collect().map(_.getDouble(3))
    assert(rec.length === 5)
    val mean = rec.sum / rec.length
    assert(mean >= 0.4, s"mean PQ-walk recall $mean below the 0.4 alarm floor")
  }

  test("s27 re-run rides the staged index (same results, marker untouched)") {
    // the s11 staged-artifact discipline: the second run must read the
    // persisted edges, not rebuild — proven by the freshness marker's
    // mtime being untouched across runs and results being identical
    val first = SparkEntry.queries("s27_graph_ann")(spark, accSf).collect().toSeq
    val dir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_graphindex_" + StagePath.corpusToken(accSf))
    val marker = dir.resolve("_src_meta")
    val mtime = java.nio.file.Files.getLastModifiedTime(marker)
    val second = SparkEntry.queries("s27_graph_ann")(spark, accSf).collect().toSeq
    assert(second === first, "staged-index re-run diverged")
    assert(java.nio.file.Files.getLastModifiedTime(marker) === mtime,
      "second run re-staged the index instead of reading it")
  }
}
