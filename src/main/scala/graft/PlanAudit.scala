package graft

/** Dev main: dump formatted physical plans for the scan-heavy queries
  * to audit pushdown/pruning/broadcast decisions (SURVEY.md §5).
  * Usage: runMain graft.PlanAudit [queryName ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q2_filter_project", "q3_join_agg", "q4_broadcast_join",
        "q5_topk", "t5_ngram_top", "d2_minhash_lsh", "s1_knn_brute")
    // GRAFT_AUDIT_EXEC=1: execute first, so the ADAPTIVE plan finalizes
    // and runtime decisions (stage reuse, skew splits, coalesced
    // partitions) are visible — the static plan never shows AQE's
    // exchange reuse.
    val exec = sys.env.get("GRAFT_AUDIT_EXEC").contains("1")
    for (n <- names) {
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sf)
      // collect() drives THIS queryExecution's adaptive plan (a sink
      // write would execute a fresh one and leave this plan unfinalized)
      if (exec) df.collect()
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
