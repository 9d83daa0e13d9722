package graft.genai

import org.apache.spark.sql.DataFrame

/** Result persistence — the reference saves results as CSV / JSONL /
  * Parquet by extension (vertex_ai_batch_processor.py:298-320). Same
  * dispatch, but distributed writers.
  */
object ResultSink {
  def save(df: DataFrame, path: String): Unit = {
    val w = df.write.mode("overwrite")
    if (path.endsWith(".csv")) w.option("header", "true").csv(path)
    else if (path.endsWith(".jsonl")) w.json(path)
    else if (path.endsWith(".parquet")) w.parquet(path)
    else w.option("header", "true").csv(path + ".csv")
  }
}
