package graft.genai

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch-file sharding — the reference writes one JSONL file per batch
  * job (openai_batch_processor.py:127); at scale a corpus must be split
  * across many jobs (the Batch API caps requests per file).
  *
  * Shards are derived from the stable row key (`doc_id div size`), not
  * from a global row_number: key-derived sharding is embarrassingly
  * parallel and reproducible on a 1000-executor cluster, whereas a
  * global sequence would serialize through a single ordering.
  */
object Sharding {
  def assign(requests: DataFrame, shardSize: Int): DataFrame =
    requests.withColumn("shard_id", expr(s"doc_id div $shardSize"))
}
