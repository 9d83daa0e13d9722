package graft

import org.apache.spark.sql.functions._

/** t30 invariants (round 17): the per-source quality calibration's
  * verdicts recomputed INDEPENDENTLY — per-source quota membership
  * from a JVM sort of the registered t18 scores, the global threshold
  * from a hand-rolled quantile_cont interpolation — plus the
  * calibration's reason to exist (flips in BOTH directions: sources
  * the global cut over-drops and sources it over-keeps).
  */
class QualityCalibrateSpec extends SparkSpec {

  private lazy val rows =
    SparkEntry.queries("t30_quality_calibrate")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))

  // the scoring surface through the REGISTERED t18 query (never
  // re-derived): doc_id -> score_per_kchar
  private lazy val t18Scores: Map[Long, Long] =
    SparkEntry.queries("t18_model_score")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap

  test("t30 scores are t18's scores and keep_cal is the per-source quota membership") {
    assert(rows.nonEmpty)
    rows.foreach { case (doc, _, spk, _, _, _, _) =>
      assert(t18Scores(doc) == spk, s"doc $doc score diverges from t18")
    }
    rows.groupBy(_._2).foreach { case (src, grp) =>
      // independent recomputation: sort by (score, doc_id), integer
      // micro rank ratio, quota cut at 700000
      val ordered = grp.sortBy(t => (t._3, t._1))
      val n = ordered.length.toLong
      ordered.zipWithIndex.foreach { case ((doc, _, _, prMicro, _, keepCal, _), i) =>
        val want = (i.toLong * 1000000L) / math.max(n - 1, 1L)
        assert(prMicro == want, s"doc $doc pr_micro $prMicro != independent $want")
        assert(keepCal == (want >= 700000L), s"doc $doc keep_cal")
      }
    }
  }

  test("t30 keep_global matches a hand-rolled quantile_cont(0.7) interpolation") {
    val scores = rows.map(_._3.toDouble).sorted
    val h = 0.7 * (scores.length - 1)
    val lo = math.floor(h).toInt
    val gthr =
      if (lo + 1 >= scores.length) scores(lo)
      else scores(lo) + (h - lo) * (scores(lo + 1) - scores(lo))
    rows.foreach { case (doc, _, spk, _, keepGlobal, keepCal, flip) =>
      assert(keepGlobal == (spk.toDouble >= gthr), s"doc $doc keep_global vs $gthr")
      assert(flip == (keepCal != keepGlobal), s"doc $doc flip")
    }
  }

  test("t30 calibration is non-vacuous: flips in both directions") {
    // saved: the calibrated rule keeps a doc the global cut dropped
    assert(rows.exists(t => t._6 && !t._5),
      "no doc saved by calibration — the per-source quota never disagreed upward")
    // sacrificed: the calibrated rule drops a doc the global cut kept
    assert(rows.exists(t => !t._6 && t._5),
      "no doc sacrificed by calibration — the per-source quota never disagreed downward")
    // and the per-source keep rate is ~30% by construction while the
    // global rule's per-source rate VARIES (the calibration's point)
    val bySrc = rows.groupBy(_._2)
    val calRates = bySrc.view.mapValues(g => g.count(_._6).toDouble / g.length).values.toSeq
    val globRates = bySrc.view.mapValues(g => g.count(_._5).toDouble / g.length).values.toSeq
    assert(calRates.max - calRates.min <= 0.2,
      s"calibrated keep rates should be near-uniform across sources: $calRates")
    assert(globRates.max - globRates.min > calRates.max - calRates.min,
      "global keep rates are not more dispersed than calibrated ones — corpus can't show the effect")
  }

  test("t30 plan: rank window partitioned by source, no global sort, broadcast scalar") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val plan = SparkEntry.queries("t30_quality_calibrate")(spark, sf)
      .queryExecution.executedPlan
    val windows = collectInPlan(plan) { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      "unpartitioned window in t30 — a global sort at 100 TB"))
    val globalSorts = collectInPlan(plan) {
      case s: SortExec if s.global => s
    }
    assert(globalSorts.isEmpty, "global sort in t30's plan")
    assert(collectInPlan(plan) { case j: BroadcastNestedLoopJoinExec => j }.nonEmpty,
      "the 1-row global-threshold scalar should ride a broadcast cross join")
  }
}
