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
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // local-iteration filter: SPARK_GRAFT_BENCH_ONLY=d8_simhash_pairs,d2_minhash_lsh
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_(n)) }
    // Untimed warm-up at the smallest SF: pays JIT/codegen compilation
    // once so the timed pass measures steady-state execution.
    for ((_, fn) <- ordered)
      try fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    // Best-of-N per query, N = whole-sweep passes (not back-to-back
    // reruns): host-contention windows on a shared box last minutes and
    // can inflate one query 10x+. Consecutive executions of the same
    // query land in the same window; sweep-level passes space each
    // query's samples ~a sweep apart, so the per-query minimum is a
    // far better steady-state estimate at identical total cost.
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3").toInt.max(1)
    val samples = (1 to repeats).flatMap { _ =>
      ordered.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          (name, Some((System.nanoTime() - t0) / 1e9))
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          (name, None)
        }
      }
    }
    val results = ordered.map { case (name, _) =>
      val times = samples.collect { case (`name`, Some(t)) => t }
      (name, if (times.nonEmpty) times.min else -1.0, times.nonEmpty)
    }
    // failed queries report the sentinel -1, never a misleading
    // duration; the run as a whole still emits a parseable line
    // 3-decimal seconds: ms resolution is below run-to-run jitter, and
    // a compact line survives a driver that captures only an output tail
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) f(v) else "-1") }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, true) => v }.sum
    val nFailed = results.count(!_._3)
    // regression gate vs BASELINE.md: a query over 2x its pinned budget
    // is a flag, not noise (budgets already carry 25% headroom)
    val over = results.collect {
      case (k, v, true) if Budgets.seconds.get(k).exists(b => v > 2 * b) =>
        "\"" + k + "\":" + v
    }.mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","n_failed":$nFailed,"over_budget":$over,"repeats":$repeats}"""
    // The stdout metric line stays SHORT (~150 bytes): BENCH_r09 came
    // back parsed:null because the 92-entry per-query map grew the line
    // to ~2.9 KB and the driver's 2000-char capture tail sliced it
    // mid-line. The full per-query map lives only in bench_last.json.
    val line =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","sf":"$sfDir","n_failed":$nFailed,"over_budget":$over,"repeats":$repeats}"""
    // stdout can be lost in log noise; persist the full map for the driver
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_last.json"), full + "\n")
    // sf1 (10x) scaling regression gate — opt-in via SPARK_GRAFT_SF1
    // (r11 verdict #8: the sweep was a one-off; wire it into the round
    // loop). "1"/"true" uses/creates testdata-sf1 from sfDir; any other
    // value is the corpus path. Each gate query runs ONCE at sf1; its
    // ratio vs this run's own best sfDir time must stay under
    // Budgets.sf1MaxRatio (ignored below 1 s of sf1 wall — noise).
    val sf1Line = sys.env.get("SPARK_GRAFT_SF1").map { v =>
      val sf1Dir = if (v == "1" || v.equalsIgnoreCase("true")) "testdata-sf1" else v
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(sf1Dir, "documents.parquet")))
        ScaleData.generate(spark, sfDir, sf1Dir, 10)
      val qmap = SparkEntry.queries
      val baseTime = results.collect { case (n, t, true) => n -> t }.toMap
      val gated = Budgets.sf1MaxRatio.toSeq.sortBy(_._1).filter(e => qmap.contains(e._1))
      val rows = gated.map { case (name, maxRatio) =>
        // reference: the main sweep's best, or one fresh sfDir pass if
        // the sweep was filtered past this query
        val ref = baseTime.getOrElse(name, {
          val t0 = System.nanoTime()
          try qmap(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
          catch { case _: Throwable => () }
          (System.nanoTime() - t0) / 1e9
        })
        // best-of-2 at sf1: the main sweep's reference is a warm
        // best-of-N, so the sf1 side must not charge one-time staging
        // (index/tokenizer builds) to the ratio — the first pass
        // stages, the second measures steady state
        var ok = true
        val t1 = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          try qmap(name)(spark, sf1Dir).write.mode("overwrite").format("noop").save()
          catch { case e: Throwable =>
            System.err.println(s"[bench-sf1] $name failed: ${e.getMessage}"); ok = false
          }
          (System.nanoTime() - t0) / 1e9
        }.min
        val ratio = if (ok && ref > 0) t1 / ref else -1.0
        (name, ok, t1, ratio, ok && t1 > 1.0 && ratio > maxRatio)
      }
      val ratios = rows.map { case (n, ok, t1, r, _) =>
        "\"" + n + "\":" + (if (ok) s"{${"\"sec\""}:${f(t1)},${"\"ratio\""}:${f(r)}}" else "-1")
      }.mkString("{", ",", "}")
      val over = rows.collect { case (n, _, _, r, true) => "\"" + n + "\":" + f(r) }
        .mkString("{", ",", "}")
      val totalSf1 = rows.collect { case (_, true, t1, _, _) => t1 }.sum
      val nFail = rows.count(!_._2)
      s"""{"metric":"sf1_gate","value":${f(totalSf1)},"unit":"sec","sf1":"$sf1Dir","n_failed":$nFail,"over_ratio":$over,"ratios":$ratios}"""
    }
    sf1Line.foreach { l =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_sf1_last.json"), l + "\n")
    }
    // Print the JSON only AFTER spark.stop(): executor-shutdown log
    // lines otherwise interleave with (or truncate) the metric line in
    // captured output. The marker line lets a parser seek to the JSON
    // without regex-ing through sbt/log4j noise.
    spark.stop()
    // emitted TWICE: a log collector that keeps only the tail of the
    // output can slice through the first copy (BENCH_r04's driver parse
    // lost the line's head exactly this way); the second, later copy
    // then still carries a complete marker + line.
    println("GRAFT_BENCH_JSON")
    println(line)
    println("GRAFT_BENCH_JSON")
    println(line)
    sf1Line.foreach { l =>
      // the sf1 gate line is a SEPARATE marker: a driver that parses
      // only GRAFT_BENCH_JSON is unaffected; the short over_ratio
      // summary also rides the main line's file sibling
      println("GRAFT_SF1_JSON")
      println(l)
    }
    System.out.flush()
  }
}
