package graft.genai

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JSONL request/response file source+sink — the reference's batch
  * files (openai_batch_processor.py:136) as a distributed format.
  * Spark's json source reads/writes one JSON object per line, sharded
  * across partitions — exactly the Batch API file shape, but parallel.
  */
object Jsonl {
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Write pre-serialized lines (a single string column). */
  def writeLines(lines: DataFrame, path: String): Unit =
    lines.write.mode("overwrite").text(path)
}
