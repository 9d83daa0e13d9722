package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SURVEY.md §2 query at the given scale
  * factor and prints one JSON line. Results are materialized through
  * the noop sink — full plan execution, no driver collect, and none of
  * `count()`'s column-pruning shortcuts.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // Untimed warm-up at the smallest SF: pays JIT/codegen compilation
    // once so the timed pass measures steady-state execution.
    for ((_, fn) <- ordered)
      try fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
