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

  /** Schema-typed read — r19: schema INFERENCE is a full extra pass
    * over the file (one Spark job per read; g14 pays it six times per
    * run). Callers that know the projection they need pass it
    * explicitly: absent fields read as typed nulls (exactly the
    * write-omits-all-null-fields contract the callers already handle)
    * and extra fields are ignored, so values are unchanged while the
    * inference job disappears. Also strictly more robust: an
    * empty-result file no longer throws "unable to infer schema". */
  def read(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Write pre-serialized lines (a single string column). */
  def writeLines(lines: DataFrame, path: String): Unit =
    lines.write.mode("overwrite").text(path)
}
