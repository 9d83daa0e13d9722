package graft

import org.apache.spark.sql.functions._

/** q38 invariants (round 17): the snapshot diff's statuses recomputed
  * INDEPENDENTLY from the corpus (JVM MD5 over the release-derivation
  * rules), every status class non-degenerate, and the incremental
  * contract (added ∪ changed is the re-process set; removed ∩ new
  * release is empty).
  */
class SnapshotDiffSpec extends SparkSpec {

  private lazy val rows =
    SparkEntry.queries("q38_snapshot_diff")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)), r.getString(4)))

  private lazy val corpus =
    Tables.documents(spark, sf).select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private def jvmMd5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q38 statuses recompute from an independent JVM MD5 diff") {
    assert(rows.nonEmpty)
    val want = corpus.flatMap { case (id, src, text) =>
      val inOld = id % 10 != 7
      val inNew = id % 13 != 5
      if (!inOld && !inNew) None
      else {
        val oldTxt =
          if (id % 7 == 3) text.substring(0, math.max(text.length - 1, 0)) else text
        val oldFp = if (inOld) Some(jvmMd5(oldTxt)) else None
        val newFp = if (inNew) Some(jvmMd5(text)) else None
        val status = (oldFp, newFp) match {
          case (None, Some(_)) => "added"
          case (Some(_), None) => "removed"
          case (Some(a), Some(b)) if a != b => "changed"
          case _ => "unchanged"
        }
        Some((id, src, oldFp, newFp, status))
      }
    }.sortBy(_._1).toSeq
    assert(rows.sortBy(_._1).toSeq == want,
      s"diff divergence; first: ${rows.sortBy(_._1).zip(want).find { case (a, b) => a != b }}")
  }

  test("q38 populations: every status class fires on this corpus") {
    val byStatus = rows.groupBy(_._5).view.mapValues(_.length).toMap
    for (st <- Seq("added", "removed", "changed", "unchanged"))
      assert(byStatus.getOrElse(st, 0) > 0, s"status '$st' is empty")
    // changed means the content REALLY differs (not just the rule fired):
    rows.filter(_._5 == "changed").foreach { case (id, _, o, n, _) =>
      assert(o.get != n.get, s"doc $id marked changed with equal fingerprints")
    }
    // a removed doc never carries a new fingerprint and vice versa
    assert(rows.filter(_._5 == "removed").forall(_._4.isEmpty))
    assert(rows.filter(_._5 == "added").forall(_._3.isEmpty))
  }
}
