package graft

/** t28 invariants (round 17 — VERDICT r16 #2): the URL/domain
  * provenance gate's verdicts recomputed from an INDEPENDENT URL
  * parse (java.net.URI + hand-rolled label/digit scans, not the
  * operator's regexes), rule-priority and population non-degeneracy
  * pins, and the t15 composition contract (survivors = mixture sample
  * ∩ content keep ∩ URL keep — the stage-0 wiring, checked through
  * the three REGISTERED source queries, never re-derived).
  */
class UrlCurateSpec extends SparkSpec {

  private lazy val rows =
    SparkEntry.queries("t28_url_curate")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getBoolean(5), r.getString(6)))

  private lazy val sources: Set[String] =
    Tables.documents(spark, sf).select("source").distinct().collect()
      .map(_.getString(0)).toSet

  test("t28 verdicts recompute from an independent java.net.URI parse") {
    assert(rows.nonEmpty)
    // independent blocklist: the same configured rule, derived here
    // from the corpus's source set via JVM string ops only
    val tlds = Array("com", "org", "net", "info", "biz", "xyz")
    def tldOf(src: String) = tlds("([0-9]+)".r.findFirstIn(src).get.toInt % 6)
    val blocklist = sources.filter(s => "([0-9]+)".r.findFirstIn(s).get.toInt % 7 == 2)
      .map(s => s + "." + tldOf(s))
    rows.foreach { case (doc, url, domain, tld, nSegs, keep, reason) =>
      val u = new java.net.URI(url)
      assert(u.getScheme == "https", s"doc $doc scheme")
      val labels = u.getHost.split('.')
      assert(labels.takeRight(2).mkString(".") == domain, s"doc $doc domain")
      assert(labels.last == tld, s"doc $doc tld")
      assert(u.getPath.split("/").count(_.nonEmpty).toLong == nSegs, s"doc $doc path depth")
      val digitHost = u.getHost.sliding(4).exists(_.forall(_.isDigit))
      val want =
        if (blocklist(domain)) "blocked_domain"
        else if (tld == "biz" || tld == "xyz") "banned_tld"
        else if (digitHost) "digit_domain"
        else if (nSegs > 4) "deep_path"
        else ""
      assert(reason == want, s"doc $doc: reason '$reason' != independent '$want' ($url)")
      assert(keep == reason.isEmpty, s"doc $doc keep flag")
    }
  }

  test("t28 populations are non-degenerate: every rule fires and keeps survive") {
    val byReason = rows.groupBy(_._7).view.mapValues(_.length).toMap
    for (r <- Seq("", "blocked_domain", "banned_tld", "digit_domain", "deep_path"))
      assert(byReason.getOrElse(r, 0) > 0, s"verdict class '$r' is empty on this corpus")
    // priority pin: a blocklisted source whose TLD is ALSO banned must
    // read blocked_domain (the corpus has one by construction: sn%7=2
    // ∧ sn%6∈{4,5}); assert at least one such overlap resolved by rank
    val overlap = rows.filter { case (_, _, domain, tld, _, _, reason) =>
      reason == "blocked_domain" && (tld == "biz" || tld == "xyz")
    }
    assert(overlap.nonEmpty, "no blocked_domain ∧ banned-TLD overlap exercised priority")
  }

  test("t15 composes the provenance gate: survivors = t9 sample ∩ t7 keep ∩ t28 keep") {
    val got = SparkEntry.queries("t15_curate_pipeline")(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val sampled = SparkEntry.queries("t9_mix_sample")(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val contentKeep = SparkEntry.queries("t7_keep_drop")(spark, sf).collect()
      .filter(_.getBoolean(1)).map(_.getLong(0)).toSet
    val urlKeep = rows.filter(_._6).map(_._1).toSet
    assert(got == (sampled & contentKeep & urlKeep),
      s"t15 survivors diverge from the composed gates: " +
        s"extra=${(got -- (sampled & contentKeep & urlKeep)).take(5)} " +
        s"missing=${((sampled & contentKeep & urlKeep) -- got).take(5)}")
    // the gate genuinely bites: some sampled+content-kept docs are
    // dropped by provenance alone
    assert(((sampled & contentKeep) -- urlKeep).nonEmpty,
      "the URL gate dropped nothing the content gates kept — vacuous composition")
  }

  test("st17 ingest verdicts equal the batch URL gate row-for-row") {
    // the st12/st13/st16 compliance pin, applied to provenance: the
    // streamed gate (4-file multi-batch, stream-static blocklist join)
    // must be byte-identical to the nightly t28 batch run
    val stream = SparkEntry.queries("st17_stream_url")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getBoolean(5), r.getString(6))).sortBy(_._1).toSeq
    val batch = rows.sortBy(_._1).toSeq
    assert(stream == batch,
      s"stream/batch divergence; first diff: ${
        stream.zip(batch).find { case (a, b) => a != b }}")
  }
}
