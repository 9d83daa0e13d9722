package graft.genai

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vertex AI (Gemini) batch request construction — the reference's
  * second backend (`vertex_ai_batch_processor.py:55` builds
  * GenerateContentRequest dicts; `:109` wraps each as
  * `{"request": ...}` JSONL lines; `:138` writes a single-STRING-column
  * "request" table for BigQuery input).
  *
  * Pure per-row projection; the BigQuery-table shape is exactly
  * `requestTable` (one JSON string column), which a warehouse writer
  * consumes unchanged.
  */
object VertexRequests {

  /** documents → flat Vertex request records. */
  def generateContentRequests(documents: DataFrame,
      modelId: String = "gemini-2.0-flash-001",
      maxOutputTokens: Int = 128): DataFrame =
    documents.select(
      col("doc_id"),
      lit(modelId).as("model_id"),
      lit("user").as("role"),
      concat(lit("Classify the following sentence: '"), col("text"), lit("'")).as("part_text"),
      lit(maxOutputTokens).as("max_output_tokens"),
      lit(0.1).as("temperature"))

  /** The GCS JSONL line shape: {"request": {contents, generationConfig}}. */
  def toJsonLines(requests: DataFrame): DataFrame = {
    val parts = array(struct(col("part_text").as("text")))
    val contents = array(struct(col("role"), parts.as("parts")))
    val genConfig = struct(
      col("max_output_tokens").as("maxOutputTokens"),
      col("temperature"))
    val request = struct(contents.as("contents"), genConfig.as("generationConfig"))
    requests.select(to_json(struct(request.as("request"))).as("line"))
  }

  /** The BigQuery input-table shape: a single STRING `request` column
    * (vertex_ai_batch_processor.py:159-170). */
  def requestTable(requests: DataFrame): DataFrame =
    toJsonLines(requests).select(get_json_object(col("line"), "$.request").as("request"))

  /** Azure-style deployment override: the reference swaps body.model
    * for the deployment name when targeting Azure OpenAI
    * (openai_batch_processor.py:106-108,141-143). */
  def overrideModel(requests: DataFrame, deployment: String): DataFrame =
    requests.withColumn("model", lit(deployment))
}
