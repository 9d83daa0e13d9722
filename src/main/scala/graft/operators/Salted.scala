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

  /** The helpers inject fixed intermediate columns (`__salt`, `__c`,
    * `__partial`, `__p_<name>`). An input that already carries one
    * would be silently clobbered by `withColumn` or folded into the
    * wrong grouping — rejected loudly instead (ADVICE r10).
    */
  private def requireAbsent(df: DataFrame, reserved: Seq[String]): Unit = {
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"input already has reserved intermediate column(s) ${clash.toSeq.sorted.mkString(", ")}; " +
        "rename them before salting")
  }

  /** Sum `valueCol` per `key`, salted over a deterministic `saltBy`
    * expression. Equivalent to `df.groupBy(key).agg(sum(valueCol))`.
    */
  def sumByKey(df: DataFrame, key: String, valueCol: Column, resultName: String,
      saltBy: Column, salt: Int = 16): DataFrame = {
    requireAbsent(df, Seq("__salt", "__partial"))
    df.withColumn("__salt", pmod(hash(saltBy), lit(salt)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(resultName))
  }

  /** [[sumByKey]] generalized to a row count plus several summed
    * measures at once (same two-phase shape, one salted shuffle for
    * all of them). Counts re-sum and sums re-sum, so any measure whose
    * partial is EXACT under addition — longs, decimals — merges
    * bit-exactly; pass decimal-cast columns for float measures (the
    * q28 partial-merge discipline).
    */
  def countAndSumsByKey(df: DataFrame, key: String,
      values: Seq[(Column, String)], countName: String,
      saltBy: Column, salt: Int = 16): DataFrame = {
    requireAbsent(df, "__salt" +: "__c" +: values.map { case (_, n) => s"__p_$n" })
    val partials = count(lit(1)).as(s"__c") +:
      values.map { case (c, n) => sum(c).as(s"__p_$n") }
    val merged = sum(col("__c")).as(countName) +:
      values.map { case (_, n) => sum(col(s"__p_$n")).as(n) }
    df.withColumn("__salt", pmod(hash(saltBy), lit(salt)))
      .groupBy(col(key), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(merged.head, merged.tail: _*)
  }
}
