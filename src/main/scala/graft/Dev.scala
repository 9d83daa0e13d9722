package graft

/** Scratch main for environment probes during development. */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (n <- Seq("d2_minhash_lsh", "d2_minhash_lsh", "d3_simhash", "d3_simhash")) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sf).write.mode("overwrite").format("noop").save()
      println(f"TIMING $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
