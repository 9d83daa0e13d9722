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
