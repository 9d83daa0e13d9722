package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Confs that would silently de-synchronize query results from the
    * REGISTERED oracle SQL if overridden during a verify run:
    * `graft.lsh.signBits` is baked into the s2/s5 oracle strings at
    * class load (Knn.lshDims — the SQL cannot follow a session
    * override), and `graft.stream.partitions` defines the bounded-run
    * state regime the streaming oracle equalities were validated
    * under; `graft.bloom.bits` is baked into d17's oracle the same way
    * (Dedup.d17Sql embeds the default bitmap width at class load).
    * Overriding any while emitting oracle SQL would turn an
    * intentional re-configuration into a spurious driver correctness
    * failure — refuse loudly instead.
    */
  private[graft] def assertOracleSafeConfs(spark: SparkSession): Unit = {
    val pinned = Seq("graft.lsh.signBits", "graft.stream.partitions",
      "graft.bloom.bits")
    val overridden = pinned.filter(k => spark.conf.getOption(k).isDefined)
    if (overridden.nonEmpty) throw new IllegalStateException(
      s"refusing to emit oracle SQL with ${overridden.mkString(", ")} overridden: " +
        "the registered oracles are pinned to the defaults and would mismatch. " +
        "Unset the conf(s) for verify runs, or skip the oracle gate for this session.")
  }

  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName...] — names filter the dump
    // (iterating on one operator shouldn't re-run all 50+)
    val (sfDir, outDir, only) = (args(0), args(1), args.drop(2).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    assertOracleSafeConfs(spark)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // declared rows-only queries (VERDICT r10 #7): the driver reads an
    // oracle-free query as `err: no_oracle`, which pattern-matches to
    // failure; this sidecar states each omission is a design decision
    // and names the companion query that oracle-checks its accuracy
    // contract, so the round's correctness report reads clean.
    val rowsOnlyJson = SparkEntry.rowsOnly
      .map { case (k, v) =>
        s"${q(k)}: {${q("rows_only")}: true, ${q("accuracy_contract")}: ${q(v)}}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/rows_only.json"), rowsOnlyJson)
    spark.stop()
  }
}
