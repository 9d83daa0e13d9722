package graft.genai

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's Vertex `run()` workflow
  * (vertex_ai_batch_processor.py:355-420) as one composed Spark
  * pipeline: validate → prepare input (GCS-JSONL or BigQuery-table
  * shape) → create job (simulated) → monitor → retrieve
  * (`<job>/predictions.jsonl` glob via [[VertexResults]]) → optional
  * local save → cleanup manifest.
  *
  * External-service notes: on a real cluster the same Hadoop-FS code
  * path writes gs:// through the GCS connector; the BigQuery table
  * shape (single STRING `request` column,
  * vertex_ai_batch_processor.py:159-170) is materialized as parquet —
  * a warehouse writer consumes it unchanged. Inference is external by
  * design; [[VertexResults.simulateLines]] stands in for the model so
  * the whole retrieval path is exercised.
  */
object VertexWorkflow {

  case class VertexRun(results: Option[DataFrame], finalStatus: String,
      cleanup: CleanupManifest)

  /** Pre-flight validation on one sample request (the reference checks
    * a single item before submitting the whole corpus): a non-empty
    * prompt, positive token budget, and a Gemini model id.
    */
  private[genai] def validateSample(requests: DataFrame): Option[String] = {
    import org.apache.spark.sql.functions._
    requests.orderBy(col("doc_id")).limit(1)
      .select(col("part_text"), col("max_output_tokens"), col("model_id"))
      .collect().headOption.flatMap { r =>
        if (r.isNullAt(0) || r.getString(0).isEmpty) Some("empty_prompt")
        else if (r.getInt(1) <= 0) Some("max_output_tokens_out_of_range")
        else if (!r.getString(2).startsWith("gemini")) Some("unknown_model")
        else None
      }
  }

  /** @param documents   input corpus (doc_id, text, ...)
    * @param inputUri    where the prepared requests land; a `bq://`
    *                    prefix selects the BigQuery table shape
    *                    (parquet, single request column), anything else
    *                    the GCS JSONL shape — mirroring the reference's
    *                    scheme branch (vertex_ai_batch_processor.py:
    *                    396-403)
    * @param outputUri   job output root; the (simulated) job writes
    *                    `<job-id>/predictions.jsonl` beneath it
    * @param jobStatus   external status supplier polled via
    *                    [[Monitor.await]]; `None` completes
    *                    synchronously (the simulator)
    * @param localSavePath optional extension-dispatched local save
    *                    ([[ResultSink]], the reference's
    *                    `_save_results_locally`)
    */
  def run(documents: DataFrame, inputUri: String, outputUri: String,
      modelId: String = "gemini-2.0-flash-001",
      validate: Boolean = true,
      jobStatus: Option[() => String] = None,
      pollIntervalMs: Long = 30000L, timeoutMs: Long = 7200000L,
      clock: () => Long = () => System.currentTimeMillis(),
      sleep: Long => Unit = Thread.sleep,
      localSavePath: Option[String] = None): VertexRun = {
    val spark = documents.sparkSession
    val manifest = new CleanupManifest(spark)
    val requests = VertexRequests.generateContentRequests(documents, modelId)

    if (validate) {
      validateSample(requests) match {
        case Some(reason) => return VertexRun(None, s"validation_failed:$reason", manifest)
        case None => ()
      }
    }

    // 1. input preparation — scheme branch, artifact registered either way
    if (inputUri.startsWith("bq://")) {
      val path = inputUri.stripPrefix("bq://")
      VertexRequests.requestTable(requests).write.mode("overwrite").parquet(path)
      manifest.register(path)
    } else {
      Jsonl.writeLines(VertexRequests.toJsonLines(requests), inputUri)
      manifest.register(inputUri)
    }

    // 2-3. create + monitor. The simulated job completes synchronously;
    // an external one is polled to a terminal state, and anything but
    // success means there is nothing to retrieve (reference:404-420 —
    // Vertex's JOB_STATE_* is normalized by Monitor).
    val state = jobStatus match {
      case Some(st) => Monitor.await(st, pollIntervalMs, timeoutMs, clock, sleep)
      case None     => "completed"
    }
    if (state != "completed") return VertexRun(None, state, manifest)
    val jobDir = s"${outputUri.stripSuffix("/")}/job-0"
    Jsonl.writeLines(VertexResults.simulateLines(requests), s"$jobDir/predictions.jsonl")
    manifest.register(jobDir)

    // 4-5. retrieve through the same glob the reference resolves,
    // optionally persist locally by extension
    val results = VertexResults.readOutputDir(spark, outputUri)
    localSavePath.foreach(ResultSink.save(results, _))
    VertexRun(Some(results), "completed", manifest)
  }
}
