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
    // Best-of-N per query: single-shot timings on a shared host swing
    // up to 3x run-to-run from CPU contention; the minimum of N
    // back-to-back executions is the steady-state cost of the plan.
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "2").toInt.max(1)
    val results = ordered.map { case (name, fn) =>
      val times = (1 to repeats).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      }
      (name, if (times.nonEmpty) times.min else -1.0, times.nonEmpty)
    }
    // failed queries report the sentinel -1, never a misleading
    // duration; the run as a whole still emits a parseable line
    val qs = results.map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v else -1) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, true) => v }.sum
    val nFailed = results.count(!_._3)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","n_failed":$nFailed,"repeats":$repeats}"""
    println(line)
    // stdout can be lost in log noise; persist the line for the driver
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_last.json"), line + "\n")
    spark.stop()
  }
}
