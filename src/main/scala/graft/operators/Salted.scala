package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers: two-phase (salted) aggregation.
  *
  * A groupBy on a skewed key routes the hot key's entire volume to one
  * reducer. Salting splits each key into `salt` sub-keys, pre-
  * aggregates per (key, salt) — spreading the hot key across `salt`
  * reducers — then combines the partials with a second, tiny shuffle.
  * AQE's skew handling covers joins; this covers aggregations, where
  * the partial-combine must be expressed manually.
  *
  * The salt is derived from a deterministic row expression (not
  * rand()) so results are reproducible and retries are safe.
  */
object Salted {

  /** Sum `valueCol` per `key`, salted over a deterministic `saltBy`
    * expression. Equivalent to `df.groupBy(key).agg(sum(valueCol))`.
    */
  def sumByKey(df: DataFrame, key: String, valueCol: Column, resultName: String,
      saltBy: Column, salt: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(saltBy), lit(salt)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(resultName))
}
