package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Generalized as-of join: for each left row, the most recent right row
  * with `rightTime <= leftTime` within the same key.
  *
  * Implemented the scale-correct way — union both sides, one sort per
  * key partition, carry the latest right row forward with a window —
  * instead of an inequality join, which explodes into a per-key cross
  * product. One shuffle on the key, linear scan per partition; ties on
  * time resolve to the largest right id (deterministic).
  *
  * Used by query q15 (purchase → latest prior click).
  */
object AsOfJoin {

  /** @param left      rows to enrich; columns (key, leftTime, leftId)
    * @param right     rows to look up; columns (key, rightTime, rightId)
    * Output: leftId, key, leftTime, rightId (nullable), rightTime
    * (nullable). Time columns must be comparable integers (epoch-µs).
    */
  def latestAtOrBefore(left: DataFrame, right: DataFrame,
      key: String, leftTime: String, leftId: String,
      rightTime: String, rightId: String): DataFrame = {
    val l = left.select(col(key).as("__k"), col(leftTime).as("__t"),
      col(leftId).as("__lid")).withColumn("__isq", lit(1))
    val r = right.select(col(key).as("__k"), col(rightTime).as("__t"),
      col(rightId).as("__rid")).withColumn("__isq", lit(0))
    // right rows sort before an equal-time left row so "≤" matches
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__isq"), coalesce(col("__rid"), col("__lid")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.withColumn("__rid", lit(null).cast(r.schema("__rid").dataType))
      .unionByName(r.withColumn("__lid", lit(null).cast(l.schema("__lid").dataType)))
      .withColumn("__match_id", last(when(col("__isq") === 0, col("__rid")), ignoreNulls = true).over(w))
      .withColumn("__match_t", last(when(col("__isq") === 0, col("__t")), ignoreNulls = true).over(w))
      .filter(col("__isq") === 1)
      .select(col("__lid").as(leftId), col("__k").as(key), col("__t").as(leftTime),
        col("__match_id").as(rightId), col("__match_t").as(rightTime))
  }
}
