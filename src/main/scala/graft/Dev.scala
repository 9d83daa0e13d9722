package graft

/** Entry smoke probe (see .claude/skills/verify): prints the flagship
  * query's row count; also a scratch main for environment probes.
  */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    args.headOption match {
      case Some("d8diag") =>
        // stage-cardinality dump for bench-regression diagnosis
        // (BASELINE.md "Diagnosing a d8 regression")
        val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
        dedup.Dedup.d8Diag(spark, sfDir).toSeq.sortBy(_._1)
          .foreach { case (k, v) => println(s"$k=$v") }
      case Some("d7diag") =>
        val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
        dedup.Dedup.d7Diag(spark, sfDir).toSeq.sortBy(_._1)
          .foreach { case (k, v) => println(s"$k=$v") }
      case Some("s8diag") =>
        // Lloyd loop observability: rounds to fixpoint, per-round
        // moved-centroid counts, final cell count — a jump in
        // s8_iterations toward the loud cap means the corpus's
        // cluster structure deepened (see Knn.KmeansMaxRounds)
        val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
        sim.Knn.s8Diag(spark, sfDir).toSeq.sortBy(_._1)
          .foreach { case (k, v) => println(s"$k=$v") }
      case Some("st8diag") =>
        // per-micro-batch input rows + watermark trace for the
        // multi-batch streaming oracle (st8) — diagnosis for a
        // drop/emit mismatch against st8Sql's per-batch model
        val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
        streaming.StreamingOps.st8Diag(spark, sfDir).foreach(println)
      case _ =>
        println(s"entry rows=${SparkEntry.entry(spark).count()}")
    }
    spark.stop()
  }
}
