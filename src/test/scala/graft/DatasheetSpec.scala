package graft

/** t29 invariants (round 17 — VERDICT r16 #3 missing-list): the
  * corpus-datasheet rollup must be pure COMPOSITION over the proven
  * per-doc stages — every column is recomputed here from the
  * REGISTERED member queries' own collected outputs (t1 tokens, t3
  * language verdicts, t7 keep/drop reasons, d10 keeper flags, t16 PII
  * counts) grouped in plain JVM code, so a silent re-derivation or
  * mis-wiring in t29 fails against the members, not against itself.
  */
class DatasheetSpec extends SparkSpec {

  test("t29 rows recompute from the five registered member queries") {
    val bySource = Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val toks = SparkEntry.queries("t1_tokens")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_tokens")).toMap
    val langOk = SparkEntry.queries("t3_langid")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("is_match")).toMap
    val reason = SparkEntry.queries("t7_keep_drop")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("drop_reason")).toMap
    val ndKeep = SparkEntry.queries("d10_cluster_keep")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    val pii = SparkEntry.queries("t16_pii_redact")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_pii")).toMap
    val want = bySource.groupBy(_._2).map { case (src, docs) =>
      val ids = docs.keys.toSeq
      src -> (ids.size.toLong, ids.map(toks).sum, ids.count(!langOk(_)).toLong,
        ids.count(reason(_) == "").toLong, ids.count(reason(_) == "exact_dup").toLong,
        ids.count(reason(_) == "low_quality").toLong,
        ids.count(reason(_) == "repetitive").toLong,
        ids.count(!ndKeep(_)).toLong, ids.map(pii).sum)
    }
    val got = SparkEntry.queries("t29_datasheet")(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == want.keySet, "source set drift")
    got.foreach { r =>
      val w = want(r.getString(0))
      val g = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_lang_mismatch"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("n_exact_dup"), r.getAs[Long]("n_low_quality"),
        r.getAs[Long]("n_repetitive"), r.getAs[Long]("n_neardup_drop"),
        r.getAs[Long]("n_pii"))
      assert(g == w, s"source ${r.getString(0)}: got $g want $w")
    }
    // the artifact is meaningful: sources exist, the drop decomposition
    // partitions the corpus, and at least one source keeps something
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_exact_dup") +
        r.getAs[Long]("n_low_quality") + r.getAs[Long]("n_repetitive") ==
        r.getAs[Long]("n_docs"), s"${r.getString(0)}: reasons don't partition")
    }
    assert(got.map(_.getAs[Long]("n_kept")).sum > 0, "no source keeps anything")
    assert(got.map(_.getAs[Long]("n_pii")).sum > 0, "PII audit column is dead")
  }
}
