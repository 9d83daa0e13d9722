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

  /** Skew-proof dictionary lookup: inner equi-join of a corpus-sized
    * `fact` against a `dict` whose keys are UNIQUE, where one fact key
    * may be hot (a stopword token, a boilerplate n-gram).
    *
    * Why not AQE: OptimizeSkewedJoin's pattern requires BOTH join
    * inputs to be bare shuffle stages; when the dictionary is an
    * aggregate whose `hashpartitioning(key)` feeds the join directly —
    * the df join-back shape in t12/t14/d14 — the rule never matches
    * and the hot partition is NOT split (observed in SkewSpec: a
    * constructed stopword corpus leaves the fused join unsplit while
    * the same data in a scan-level join splits fine). Forcing an
    * extra ENSURE_REQUIREMENTS exchange on the dictionary would
    * re-enable AQE, but for a corpus-sized dictionary (d14's gram df)
    * that exchange costs a second near-fact-scale shuffle on EVERY
    * run to cover the occasional hot key.
    *
    * This is the deterministic alternative: replicate each dictionary
    * row across `salt` sub-keys and shuffle the fact on (key, salt) —
    * the hot key's probe rows spread over `salt` reducers while the
    * dictionary side grows by the bounded factor `salt`. The salt is
    * derived from a deterministic fact expression (not rand()), so
    * results are reproducible and retries safe. Inner-join-equivalent
    * to `fact.join(dict, key)` whenever dict keys are unique (each
    * fact row meets exactly one (key, salt) dictionary copy).
    */
  def lookupJoin(fact: DataFrame, dict: DataFrame, key: String,
      saltBy: Column, salt: Int = 16): DataFrame = {
    requireAbsent(fact, Seq("__salt"))
    requireAbsent(dict, Seq("__salt"))
    val replicated = dict.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    fact.withColumn("__salt", pmod(hash(saltBy), lit(salt)))
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
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
