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

  /** @param documents       input corpus (doc_id, text, lang, ...)
    * @param outputPathPrefix where request/result files land
    *                         (reference: output_path_prefix)
    * @param shardSize        requests per batch file
    * @param validate         pre-flight check on a sample request; on
    *                         failure the workflow halts and returns
    *                         empty frames (reference:282-287)
    */
  def run(documents: DataFrame, outputPathPrefix: String,
      shardSize: Int = 50000, validate: Boolean = true): BatchResult = {
    val spark = documents.sparkSession
    val requests = Requests.chatRequests(documents)

    if (validate) {
      val sample = Validation.validate(
        requests.orderBy(col("doc_id")).limit(1))
      if (sample.filter(!col("is_valid")).count() > 0) {
        val empty = Responses.parse(Simulator.respond(requests.limit(0)))
        return BatchResult(empty, empty, "validation_failed")
      }
    }

    // 1. prepare + "upload" the batch input files, sharded
    val sharded = Sharding.assign(requests, shardSize)
    Jsonl.writeLines(Requests.toJsonLines(sharded), s"$outputPathPrefix/input")

    // 2-3. create batch + monitor → terminal state (external inference
    // is the simulator here, as the hosted Batch API is in the
    // reference)
    val parsed = Responses.parse(Simulator.respond(sharded))

    // 4. retrieve + split + save (reference:205-260)
    val results = Responses.results(parsed)
    val errors = Responses.errors(parsed)
    ResultSink.save(results, s"$outputPathPrefix/results.jsonl")
    ResultSink.save(errors, s"$outputPathPrefix/errors.jsonl")

    val status = if (errors.isEmpty) "completed" else "completed_with_errors"
    BatchResult(results, errors, status)
  }
}
