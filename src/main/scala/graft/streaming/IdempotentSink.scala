package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Idempotent parquet sink for production streams — the file-output
  * counterpart of the memory sinks the oracle queries use.
  *
  * `foreachBatch` gives at-least-once batch delivery after a restart;
  * exactly-once lands by making the write idempotent: every micro-batch
  * overwrites its own `batch_id=<n>` directory, so a replayed batch
  * replaces its previous (possibly partial) output instead of
  * appending duplicates. Readers see the result as one partitioned
  * parquet table (`spark.read.parquet(root)` with batch_id as a
  * partition column).
  *
  * Scale: each micro-batch write is a plain distributed parquet job;
  * no coordination beyond the streaming checkpoint, which already
  * records the last committed batch id.
  */
object IdempotentSink {
  def start(df: DataFrame, root: String, checkpoint: String,
      queryName: String): StreamingQuery =
    df.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$root/batch_id=$batchId")
      }
      .start()
}
