package graft

/** m10 invariants: the scene numbering must be exactly the running
  * boundary count in frame order, the lag must align to the sampled
  * stride, and both the cut and the continue populations must be
  * non-degenerate at oracle scale (the τ=2 falsifiability probe).
  */
class SceneSplitSpec extends SparkSpec {

  private lazy val rows =
    SparkEntry.queries("m10_scene_split")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getBoolean(5), r.getLong(6)))
      .groupBy(_._1)

  test("m10 scene ids are the running boundary count; lag aligns to the sample stride") {
    assert(rows.nonEmpty)
    for ((user, fs) <- rows) {
      val sorted = fs.sortBy(_._2)
      // sampled indices are exactly 1, 11, 21, … per user
      assert(sorted.map(_._2).toSeq == (0 until sorted.length).map(i => 1L + 10L * i),
        s"user $user frame stride broken")
      // first frame: no previous, not a boundary, scene 0
      assert(sorted.head._5.isEmpty && !sorted.head._6 && sorted.head._7 == 0L)
      // later frames always have a hamming; scene = cumulative cuts
      var scene = 0L
      sorted.tail.foreach { case (_, idx, _, _, ham, b, sid) =>
        assert(ham.nonEmpty, s"user $user frame $idx missing ham_prev")
        assert(b == (ham.get >= graft.multimodal.Multimodal.SceneHamTau))
        if (b) scene += 1
        assert(sid == scene, s"user $user frame $idx scene $sid != $scene")
      }
    }
  }

  test("m10 cuts and multi-frame scenes are both non-degenerate") {
    val all = rows.values.flatten.toSeq
    assert(all.forall(_._4.length == 64), "phash must be 64 bits")
    val cuts = all.count(_._6)
    assert(cuts > 0, "no scene boundary ever fired — tau degenerate high")
    assert(cuts < all.size / 2, "most frames are cuts — tau degenerate low")
    val maxScene = all.groupBy(r => (r._1, r._7)).values.map(_.size).max
    assert(maxScene >= 3, "no multi-frame scene — the continue branch never held")
  }

  test("st15 ingest scene flags equal m10 minus scene_id row-for-row") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("user_id"), r.getAs[Long]("frame_idx"))
    def payload(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("event_id"), r.getAs[String]("phash"),
        Option(r.getAs[java.lang.Long]("ham_prev")).map(_.longValue),
        r.getAs[Boolean]("is_boundary"))
    val batch = SparkEntry.queries("m10_scene_split")(spark, sf).collect()
      .map(r => key(r) -> payload(r)).sortBy(_._1).toSeq
    val stream = SparkEntry.queries("st15_stream_scene")(spark, sf).collect()
      .map(r => key(r) -> payload(r)).sortBy(_._1).toSeq
    assert(stream == batch,
      s"stream/batch divergence; first diff: ${
        stream.zip(batch).find { case (a, b) => a != b }}")
  }
}
