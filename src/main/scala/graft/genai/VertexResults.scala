package graft.genai

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vertex batch-prediction retrieval — the reference's
  * `_retrieve_and_save_results` family (vertex_ai_batch_processor.py:
  * 238-330) re-expressed over Spark sources instead of a pandas fetch:
  * a GCS-style output directory is read with the distributed text
  * source over the same `<job>/predictions.jsonl` glob the reference
  * resolves with fsspec, a BigQuery-style output table is consumed as
  * a DataFrame with STRING request/response columns, and both land in
  * one typed results frame via identical prediction-column extraction.
  *
  * Extraction is `get_json_object` per row (the repo's response-parse
  * idiom — codegen'd, no shuffle, no schema inference pass over 100 TB
  * of response files).
  */
object VertexResults {

  /** One predictions.jsonl line (column `line`) → typed result row:
    * the echoed request text, the first candidate's text (the
    * "prediction" column the reference's examples read), token
    * accounting from usageMetadata, and the per-row status field
    * Vertex emits on failed rows.
    */
  def parse(lines: DataFrame): DataFrame =
    lines.select(
      get_json_object(col("line"), "$.request.contents[0].parts[0].text").as("request_text"),
      get_json_object(col("line"), "$.response.candidates[0].content.parts[0].text").as("prediction"),
      get_json_object(col("line"), "$.response.usageMetadata.promptTokenCount")
        .cast("long").as("prompt_tokens"),
      get_json_object(col("line"), "$.response.usageMetadata.candidatesTokenCount")
        .cast("long").as("candidates_tokens"),
      get_json_object(col("line"), "$.status").as("status"))

  /** GCS-style retrieval: the reference globs
    * `{output_uri}/<job>/predictions.jsonl` and reads the JSONL
    * (vertex_ai_batch_processor.py:263-280). Same glob, distributed.
    */
  def readOutputDir(spark: SparkSession, outputUri: String): DataFrame =
    parse(spark.read.text(s"${outputUri.stripSuffix("/")}/*/predictions.jsonl")
      .select(col("value").as("line")))

  /** BigQuery-style retrieval (vertex_ai_batch_processor.py:283-296):
    * the output table has STRING `request`/`response` (+`status`)
    * columns; extraction matches [[parse]] field-for-field.
    */
  def fromTable(table: DataFrame): DataFrame = {
    val status =
      if (table.columns.contains("status")) col("status")
      else lit(null).cast("string")
    table.select(
      get_json_object(col("request"), "$.contents[0].parts[0].text").as("request_text"),
      get_json_object(col("response"), "$.candidates[0].content.parts[0].text").as("prediction"),
      get_json_object(col("response"), "$.usageMetadata.promptTokenCount")
        .cast("long").as("prompt_tokens"),
      get_json_object(col("response"), "$.usageMetadata.candidatesTokenCount")
        .cast("long").as("candidates_tokens"),
      status.as("status"))
  }

  /** Deterministic stand-in for the Vertex batch endpoint: request
    * records (from [[VertexRequests.generateContentRequests]]) →
    * predictions.jsonl lines with the request echoed and a simulated
    * candidate, so the retrieval path round-trips in tests without the
    * external service.
    */
  def simulateLines(requests: DataFrame): DataFrame = {
    val request = struct(
      array(struct(col("role"), array(struct(col("part_text").as("text"))).as("parts"))).as("contents"),
      struct(col("max_output_tokens").as("maxOutputTokens"), col("temperature")).as("generationConfig"))
    val label = when(
      regexp_count(col("part_text"), lit("fast|small|value")) >=
        regexp_count(col("part_text"), lit("slow|error|big")),
      lit("positive")).otherwise(lit("negative"))
    val response = struct(
      array(struct(struct(array(struct(label.as("text"))).as("parts"),
        lit("model").as("role")).as("content"))).as("candidates"),
      struct((length(col("part_text")).cast("long") / 4).cast("long").as("promptTokenCount"),
        lit(1L).as("candidatesTokenCount")).as("usageMetadata"))
    requests.select(to_json(struct(
      request.as("request"), response.as("response"), lit("").as("status"))).as("line"))
  }
}

/** Cleanup manifest — the reference's `cleanup()`
  * (vertex_ai_batch_processor.py:331-354) tracks every artifact the
  * processor created (GCS prefixes, BigQuery tables, the job itself)
  * and deletes them at the end, tolerating per-resource failures. The
  * Spark-native analogue registers Hadoop-FS paths as they are written
  * and deletes them through the FileSystem API — one code path for
  * file://, hdfs://, s3a:// or gs:// — reporting per-path success
  * instead of silently swallowing everything.
  */
class CleanupManifest(spark: SparkSession) {
  private val resources = scala.collection.mutable.LinkedHashSet.empty[String]

  def register(path: String): Unit = synchronized { resources += path }

  def registered: Seq[String] = synchronized { resources.toSeq }

  /** Delete every registered path (recursive); returns path → deleted.
    * A path that no longer exists counts as success (idempotent, like
    * rerunning the reference's cleanup). Successfully deleted paths are
    * deregistered; failures stay registered for a retry.
    */
  def cleanup(): Map[String, Boolean] = synchronized {
    val conf = spark.sparkContext.hadoopConfiguration
    val outcome = resources.toSeq.map { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val ok = scala.util.Try {
        val fs = hp.getFileSystem(conf)
        !fs.exists(hp) || fs.delete(hp, true)
      }.getOrElse(false)
      p -> ok
    }
    outcome.collect { case (p, true) => p }.foreach(resources -= _)
    outcome.toMap
  }
}
