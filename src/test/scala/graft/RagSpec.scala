package graft

import org.apache.spark.sql.functions._

/** s19 composition pins (round 15 — VERDICT r14 #7): the RAG DAG must
  * be WIRING over the proven member stages, never a re-derivation —
  * each stage is checked against the member operator's own output, and
  * the fusion arithmetic is recomputed from s19's output rows alone
  * (the HybridSpec discipline).
  */
class RagSpec extends SparkSpec {

  private lazy val out =
    SparkEntry.queries("s19_rag_pipeline")(spark, sf).collect()

  private def optLong(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
    if (r.isNullAt(i)) None else Some(r.getLong(i))

  test("s19 returns 10 docs and its RRF score recomputes from the ranks alone") {
    assert(out.length == 10)
    out.foreach { r =>
      val lex = optLong(r, 1); val dense = optLong(r, 2)
      val expected = lex.map(k => 1000000L / (60L + k)).getOrElse(0L) +
        dense.map(k => 1000000L / (60L + k)).getOrElse(0L)
      assert(r.getLong(3) == expected, s"doc ${r.getLong(0)} rrf mismatch")
      assert(lex.nonEmpty || dense.nonEmpty, "a fused doc with no arm")
    }
  }

  test("s19 dense ranks are exactly s11's q0 slice, lex ranks exactly the BM25 arm") {
    val dense = graft.sim.Knn.s11(spark, sf)
      .filter(col("q_id") === graft.sim.Hybrid.QueryDoc)
      .select(col("vec_id"), col("rank")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lex = graft.sim.Hybrid.lexArm(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val doc = r.getLong(0)
      assert(optLong(r, 1) == lex.get(doc), s"doc $doc lex_rank drift")
      assert(optLong(r, 2) == dense.get(doc), s"doc $doc dense_rank drift")
    }
    // and the winner set is the RRF top-10 of the two arms, not a subset
    val fusedExpected = (lex.keySet ++ dense.keySet).toSeq.map { d =>
      val s0 = lex.get(d).map(k => 1000000L / (60L + k)).getOrElse(0L) +
        dense.get(d).map(k => 1000000L / (60L + k)).getOrElse(0L)
      (d, s0)
    }.sortBy { case (d, s0) => (-s0, d) }.take(10).map(_._1)
    assert(out.map(_.getLong(0)).toSeq == fusedExpected, "fused top-10 drift")
  }

  test("s19 context chunks are each doc's max-overlap t25 window") {
    val qvocab = Tables.documents(spark, sf)
      .filter(col("doc_id") === graft.sim.Hybrid.QueryDoc)
      .head().getString(1).toLowerCase.split("\\s+").toSet
    val chunks = graft.text.TextAnalysis.t25(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(7)))
      .groupBy(_._1)
    out.foreach { r =>
      val doc = r.getLong(0)
      val best = chunks(doc).map { case (_, cid, seq, text) =>
        (cid, seq, text.toLowerCase.split(" ").count(qvocab))
      }.minBy { case (_, seq, ov) => (-ov, seq) }
      assert(r.getLong(4) == best._1 && r.getLong(8) == best._3.toLong,
        s"doc $doc best chunk drift: got (${r.getLong(4)}, ${r.getLong(8)}), want $best")
    }
  }

  test("s19 plans one bounded per-doc window and broadcasts the winner set") {
    val df = SparkEntry.queries("s19_rag_pipeline")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val windows = collectInPlan(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // the probe-side crn window (s11, per-query over ncells rows) and
    // the argmax window (per fused doc over its chunks) are both
    // bounded and PARTITIONED; nothing may be unpartitioned
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "s19 plans an unpartitioned window")
    val bcasts = collectInPlan(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bcasts.nonEmpty, "s19 lost its broadcast joins")
  }

  test("s21 recall equals the in-JVM intersection of s15's truth and s19's docs") {
    val tru = SparkEntry.queries("s15_hybrid_rrf")(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val ann = SparkEntry.queries("s19_rag_pipeline")(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val row = SparkEntry.queries("s21_rag_recall")(spark, sf).collect().head
    assert(row.getAs[Long]("n_true") == tru.size.toLong)
    assert(row.getAs[Long]("n_found") == (tru & ann).size.toLong,
      s"n_found ${row.getAs[Long]("n_found")} != |truth ∩ s19| ${(tru & ann).size}")
    assert(row.getAs[Double]("recall") ==
      (tru & ann).size.toDouble / tru.size)
    // the serving contract: the composed persisted-index path keeps at
    // least half the brute-force hybrid top-10 (measured 0.7/0.6/1.0
    // at sf0.001/0.01/1 — the 2-probe IVF arm is the recall cost)
    assert(row.getAs[Double]("recall") >= 0.5,
      s"composed RAG recall ${row.getAs[Double]("recall")} below the 0.5 floor")
  }

  test("s25 cross-pins s21 and recomputes MRR/nDCG from first principles (round 17)") {
    val m = SparkEntry.queries("s25_rank_metrics")(spark, sf).collect().head
    // cross-pin: the two contracts measure the SAME run of the same
    // pipelines, so a silent divergence between their candidate or
    // truth plumbing fails here (the s24↔s6 discipline)
    val rec = SparkEntry.queries("s21_rag_recall")(spark, sf).collect().head
    assert(m.getAs[Long]("n_true") == rec.getAs[Long]("n_true"))
    assert(m.getAs[Long]("n_rel") == rec.getAs[Long]("n_found"),
      s"s25 n_rel ${m.getAs[Long]("n_rel")} != s21 n_found ${rec.getAs[Long]("n_found")}")
    // independent recompute: truth set from s15, candidate ORDER from
    // s19's rows (already rrf-sorted), metrics in plain JVM arithmetic
    val tru = SparkEntry.queries("s15_hybrid_rrf")(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val candOrder = SparkEntry.queries("s19_rag_pipeline")(spark, sf).collect()
      .sortBy(r => (-r.getAs[Long]("rrf_milli"), r.getAs[Long]("doc_id")))
      .map(_.getAs[Long]("doc_id"))
    val hits = candOrder.zipWithIndex.collect { case (d, i) if tru(d) => i + 1 }
    assert(m.getAs[Long]("n_cand") == candOrder.length.toLong)
    assert(m.getAs[Long]("n_rel") == hits.length.toLong)
    assert(m.getAs[Long]("first_rank") == hits.headOption.getOrElse(0).toLong)
    assert(m.getAs[Long]("rr_micro") ==
      hits.headOption.map(r => 1000000L / r).getOrElse(0L))
    // nDCG recomputed with libm log2 — the integer shift-and-square
    // discount is exact to ~1 milli-bit per term, so the two agree to
    // well under 1e-2 while sharing NO arithmetic
    def gain(r: Int) = 1.0 / (math.log(r + 1.0) / math.log(2.0))
    val dcg = hits.map(gain).sum
    val idcg = (1 to math.min(tru.size, 10)).map(gain).sum
    assert(math.abs(m.getAs[Double]("ndcg") - dcg / idcg) < 0.01,
      s"integer nDCG ${m.getAs[Double]("ndcg")} vs libm ${dcg / idcg}")
    // order sanity: the metrics sit in their defined ranges and nDCG
    // cannot exceed the recall ceiling's perfect-order value
    assert(m.getAs[Double]("ndcg") > 0.0 && m.getAs[Double]("ndcg") <= 1.0)
    assert(m.getAs[Long]("dcg_micro") <= m.getAs[Long]("idcg_micro"))
  }
}
