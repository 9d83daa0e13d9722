package graft

/** d8's observation taps (VERDICT r7 #3): stage cardinalities must be
  * retrievable and mutually consistent, so a future bench regression
  * is diagnosable (plan/data blow-up vs host pressure) instead of
  * vanishing unexplained like round 6's 9.6 s inflation.
  */
class D8DiagSpec extends SparkSpec {

  test("d8Diag returns consistent stage cardinalities") {
    val m = dedup.Dedup.d8Diag(spark, sf)
    val out = SparkEntry.queries("d8_simhash_pairs")(spark, sf).count()
    assert(m("d8_distinct_sigs") > 0)
    assert(m("d8_blocks") === 4 * m("d8_distinct_sigs"),
      "4 disjoint 16-bit blocks per distinct signature")
    assert(m("d8_pairs_expand") + m("d8_pairs_same") === out,
      s"expand+same must equal the d8 output row count ($m vs $out)")
    assert(m("d8_sig_pairs") <= m("d8_pairs_expand"),
      "every verified signature pair expands to at least one doc pair")
  }

  test("d7Diag reports loop diagnostics consistent with the d7 output") {
    val m = dedup.Dedup.d7Diag(spark, sf)
    val out = SparkEntry.queries("d7_cluster")(spark, sf)
    assert(m("d7_docs") === out.count())
    assert(m("d7_iterations") >= 1 && m("d7_iterations") <= 50)
    assert(m("d7_verified_edges") <= m("d7_star_candidates"),
      "the Jaccard gate can only remove candidate edges")
    assert(m("d7_clusters") <= m("d7_docs"))
  }

  test("the default d8 plan carries no CollectMetrics node (taps are diag-only)") {
    val plan = SparkEntry.queries("d8_simhash_pairs")(spark, sf)
      .queryExecution.optimizedPlan
    val taps = plan.collect {
      case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics => c
    }
    assert(taps.isEmpty, "production d8 must not pay (or re-shape around) observation nodes")
  }
}
