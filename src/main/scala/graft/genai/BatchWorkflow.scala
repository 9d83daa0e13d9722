package graft.genai

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's top-level workflow (`BaseBatchProcessor.run`,
  * openai_batch_processor.py:262-303) as one composed Spark pipeline:
  * validate → prepare/upload (JSONL) → create batch (shard) → "run"
  * the external model (simulator) → retrieve/parse → split → save.
  *
  * Each stage is a lazy transform; the only actions are the JSONL
  * write and the result saves, so the whole workflow is two
  * distributed jobs regardless of corpus size.
  */
object BatchWorkflow {

  case class BatchResult(results: DataFrame, errors: DataFrame, finalStatus: String)

  /** Timestamped output prefix — the reference stamps
    * `{output_path_prefix}_{YYYYMMDD_HHMMSS}` at the start of every
    * run (openai_batch_processor.py:273-274) so reruns never clobber
    * earlier outputs. UTC, clock injectable for tests; pass the result
    * as [[run]]'s `outputPathPrefix`.
    */
  def timestampedPrefix(prefix: String,
      clock: () => Long = () => System.currentTimeMillis()): String = {
    val fmt = new java.text.SimpleDateFormat("yyyyMMdd_HHmmss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    s"${prefix}_${fmt.format(new java.util.Date(clock()))}"
  }

  /** @param documents       input corpus (doc_id, text, lang, ...)
    * @param outputPathPrefix where request/result files land
    *                         (reference: output_path_prefix)
    * @param shardSize        requests per batch file
    * @param validate         pre-flight check on a sample request; on
    *                         failure the workflow halts and returns
    *                         empty frames (reference:282-287)
    * @param endpoint         target API endpoint recorded per batch
    *                         (reference `_create_batch` endpoint arg)
    * @param completionWindow batch completion window (reference: only
    *                         "24h" is supported by the API today)
    * @param metadata         key/value metadata attached to each
    *                         created batch (reference:163-179)
    * @param jobStatus        external job-status supplier polled via
    *                         [[Monitor.await]] (the reference's
    *                         `_monitor_status`); `None` skips polling —
    *                         the simulator completes synchronously. A
    *                         `failed`/`cancelled`/`expired`/timed-out
    *                         job halts before retrieval and reports
    *                         that status (vertex:204-236)
    */
  def run(documents: DataFrame, outputPathPrefix: String,
      shardSize: Int = 50000, validate: Boolean = true,
      endpoint: String = "/v1/chat/completions",
      completionWindow: String = "24h",
      metadata: Map[String, String] = Map.empty,
      jobStatus: Option[() => String] = None,
      pollIntervalMs: Long = 30000L, timeoutMs: Long = 7200000L,
      clock: () => Long = () => System.currentTimeMillis(),
      sleep: Long => Unit = Thread.sleep): BatchResult = {
    val spark = documents.sparkSession
    val requests = Requests.chatRequests(documents)
    def halted(status: String): BatchResult = {
      val empty = Responses.parse(Simulator.respond(requests.limit(0)))
      BatchResult(empty, empty, status)
    }

    if (validate) {
      val sample = Validation.validate(
        requests.orderBy(col("doc_id")).limit(1))
      if (sample.filter(!col("is_valid")).count() > 0)
        return halted("validation_failed")
    }

    // 1. prepare + "upload" the batch input files, sharded
    val sharded = Sharding.assign(requests, shardSize)
    Jsonl.writeLines(Requests.toJsonLines(sharded), s"$outputPathPrefix/input")

    // 2a. batch-creation manifest — one record per shard with the
    // reference's `batches.create` arguments (endpoint,
    // completion_window, metadata) so a resubmission or audit can
    // reconstruct every job. Tiny (one row per shard).
    // metadata serialized via to_json so quotes/backslashes/control
    // chars in keys or values are escaped properly (hand-concatenated
    // JSON broke on a single embedded quote)
    val metaJson =
      if (metadata.isEmpty) lit("{}")
      else to_json(map(metadata.toSeq.sortBy(_._1)
        .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*))
    val manifest = sharded.groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_requests"))
      .select(col("shard_id"), col("n_requests"),
        lit(endpoint).as("endpoint"),
        lit(completionWindow).as("completion_window"),
        metaJson.as("metadata"))
    Jsonl.write(manifest, s"$outputPathPrefix/batches")

    // 2-3. create batch + monitor → terminal state. When the job is
    // external, poll it; a non-success terminal state or a timeout
    // means there is nothing to retrieve (reference:204-236, 241).
    val monitored = jobStatus match {
      case Some(st) => Monitor.await(st, pollIntervalMs, timeoutMs, clock, sleep)
      case None     => "completed"
    }
    if (monitored != "completed") return halted(monitored)
    // r20 (guide §2.4): parsed feeds THREE actions (results save,
    // errors save, the errors.isEmpty status probe) — lazily each
    // re-ran the whole request→simulate→parse pipeline. Materialize
    // once; a production run holds exactly this relation between
    // retrieval and the split saves anyway.
    val parsed = Responses.parse(Simulator.respond(sharded)).localCheckpoint()

    // 4. retrieve + split + save (reference:205-260)
    val results = Responses.results(parsed)
    val errors = Responses.errors(parsed)
    ResultSink.save(results, s"$outputPathPrefix/results.jsonl")
    ResultSink.save(errors, s"$outputPathPrefix/errors.jsonl")

    val status = if (errors.isEmpty) "completed" else "completed_with_errors"
    BatchResult(results, errors, status)
  }

  /** Resume an interrupted or partial run: documents that already have
    * a saved result OR error under `outputPathPrefix` are skipped
    * (anti-join on doc_id — distributed, no driver set), and only the
    * remainder is processed, into `outputPathPrefix/resume` so the
    * original outputs stay intact for the caller to union. Re-running
    * a completed prefix is a no-op over zero rows — the workflow is
    * idempotent.
    */
  def resume(documents: DataFrame, outputPathPrefix: String,
      shardSize: Int = 50000, validate: Boolean = true,
      endpoint: String = "/v1/chat/completions",
      completionWindow: String = "24h",
      metadata: Map[String, String] = Map.empty,
      jobStatus: Option[() => String] = None,
      pollIntervalMs: Long = 30000L, timeoutMs: Long = 7200000L,
      clock: () => Long = () => System.currentTimeMillis(),
      sleep: Long => Unit = Thread.sleep): BatchResult = {
    val spark = documents.sparkSession
    // explicit 1-field schema: the anti-join needs only doc_id, and
    // inference would scan each file once more just to learn it (r19)
    val idSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType)))
    val processed = Seq("results.jsonl", "errors.jsonl").flatMap { f =>
      scala.util.Try {
        val df = Jsonl.read(spark, s"$outputPathPrefix/$f", idSchema)
        df.queryExecution.assertAnalyzed() // missing path -> None, as before
        df.select(col("doc_id"))
      }.toOption
    }
    val remaining = processed.reduceOption(_ unionByName _) match {
      case Some(p) => documents.join(p.distinct(), Seq("doc_id"), "left_anti")
      case None    => documents
    }
    run(remaining, s"$outputPathPrefix/resume", shardSize, validate,
      endpoint, completionWindow, metadata, jobStatus,
      pollIntervalMs, timeoutMs, clock, sleep)
  }
}
