package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Format-dispatched table source/sink — the engine's counterpart of
  * the reference's multi-backend I/O (JSONL files, CSV/JSONL/Parquet
  * result saves; vertex_ai_batch_processor.py:298-320). Cloud-vendor
  * backends (GCS/BigQuery) map to the same API through Hadoop
  * filesystem URIs in a real deployment; locally everything is a path.
  *
  * Parquet is the scale default (columnar, predicate pushdown, column
  * pruning); CSV/JSONL exist for interchange with the batch APIs'
  * line formats.
  */
object TableSource {
  def read(spark: SparkSession, path: String, format: String = "parquet",
      options: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.options(options)
    format match {
      case "parquet" => r.parquet(path)
      case "csv" => r.option("header", "true").option("inferSchema", "true").csv(path)
      case "json" | "jsonl" => r.json(path)
      case "orc" => r.orc(path)
      case "text" => r.text(path)
      case other => throw new IllegalArgumentException(s"unsupported format: $other")
    }
  }

  def write(df: DataFrame, path: String, format: String = "parquet",
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    val pw = if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
    format match {
      case "parquet" => pw.parquet(path)
      case "csv" => pw.option("header", "true").csv(path)
      case "json" | "jsonl" => pw.json(path)
      case "orc" => pw.orc(path)
      case "text" => pw.text(path)
      case other => throw new IllegalArgumentException(s"unsupported format: $other")
    }
  }
}
