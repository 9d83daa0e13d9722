package graft

/** m12 invariants (round 17): the container-sniffing verdicts
  * recomputed INDEPENDENTLY from the raw corpus bytes (JVM byte-array
  * prefix checks — none of the operator's hex-string machinery), plus
  * the audit populations the gate exists for.
  */
class MagicSniffSpec extends SparkSpec {

  private lazy val rows =
    SparkEntry.queries("m12_magic_sniff")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getBoolean(4), r.getBoolean(5)))

  test("m12 sniffs recompute from an independent JVM byte-prefix pass") {
    assert(rows.nonEmpty)
    val corpus = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def hexBytes(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val magics = Map(0L -> "FFD8FF", 1L -> "89504E470D0A1A0A",
      2L -> "474946383961", 3L -> "524946460000000057454250")
    rows.foreach { case (doc, nBytes, sniffed, claimed, mismatch, quarantine) =>
      val body = corpus(doc).getBytes("UTF-8")
      val payload = magics.get(doc % 5).map(hexBytes).getOrElse(Array.empty[Byte]) ++ body
      assert(nBytes == payload.length.toLong, s"doc $doc n_bytes")
      def pre(h: String) = {
        val m = hexBytes(h)
        payload.length >= m.length && payload.take(m.length).sameElements(m)
      }
      val want =
        if (pre("89504E470D0A1A0A")) "png"
        else if (pre("FFD8FF")) "jpeg"
        else if (pre("474946383961") || pre("474946383761")) "gif"
        else if (pre("52494646") && payload.length >= 12 &&
          payload.slice(8, 12).sameElements("WEBP".getBytes("US-ASCII"))) "webp"
        else "unknown"
      assert(sniffed == want, s"doc $doc sniffed '$sniffed' != independent '$want'")
      val wantClaim = (nBytes % 3) match {
        case 0 => "png"; case 1 => "jpeg"; case _ => "webp"
      }
      assert(claimed == wantClaim, s"doc $doc claim")
      assert(mismatch == (claimed != sniffed) && quarantine == (sniffed == "unknown"))
    }
  }

  test("m12 populations: every format sniffs, mismatches and quarantines are non-empty") {
    val bySniff = rows.groupBy(_._3).view.mapValues(_.length).toMap
    for (f <- Seq("jpeg", "png", "gif", "webp", "unknown"))
      assert(bySniff.getOrElse(f, 0) > 0, s"sniff class '$f' is empty on this corpus")
    // the wrong-extension audit and the quarantine route both fire
    assert(rows.exists(_._5), "no claimed/sniffed mismatch — the audit is vacuous")
    assert(rows.exists(r => !r._5), "everything mismatched — the claim signal is broken")
    assert(rows.count(_._6) == rows.count(_._3 == "unknown"))
  }

  test("st18 ingest sniffs equal the batch gate row-for-row") {
    // the st12/st17 compliance pin, applied to the decode router
    val stream = SparkEntry.queries("st18_stream_sniff")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getBoolean(4), r.getBoolean(5))).sortBy(_._1).toSeq
    val batch = rows.sortBy(_._1).toSeq
    assert(stream == batch,
      s"stream/batch divergence; first diff: ${
        stream.zip(batch).find { case (a, b) => a != b }}")
  }
}
