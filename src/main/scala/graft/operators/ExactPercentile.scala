package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated per-group percentiles by distributed order
  * statistics — no per-group value buffering.
  *
  * Spark's built-in `percentile` aggregate collects every value of a
  * group into one reducer's buffer (OpenHashMap per group), so a
  * 100 TB fact table with 3 groups concentrates the whole table on 3
  * tasks. This operator instead:
  *
  *  1. buckets values by approximate quantile boundaries from a seeded
  *     random sample (the driver holds only the boundary array; a
  *     skewed or unlucky sample costs load balance, never correctness),
  *     assigned by the codegen'd binary-search [[graft.functions.SortedBucket]],
  *  2. aggregates per-(group, bucket) counts — map-side partials, so
  *     no data row shuffles — and turns them into rank offsets with a
  *     prefix-sum window over that tiny relation,
  *  3. identifies the ≤ 2 buckets per requested percentile that contain
  *     its target order statistics, and row-numbers ONLY inside those
  *     buckets (a broadcast join drops every other row at the scan),
  *  4. keeps the two order statistics that straddle each requested
  *     percentile,
  *  5. interpolates with the SQL-standard formula
  *     `(hi - pos) * v_lo + (pos - lo) * v_hi` (the same double
  *     arithmetic as Spark's `Percentile` and DuckDB's
  *     `quantile_cont`, so results are bit-identical).
  *
  * Every stage is a shuffle-parallel aggregation or a bounded window;
  * the only sort is over the handful of target buckets.
  */
object ExactPercentile {

  /** Long-form result: one row per (group, percentile).
    *
    * @return DataFrame(groupCol, "p", "value") — "p" the requested
    *         percentile, "value" the exact interpolated result over
    *         non-null, non-NaN `valueCol` values (NaN is excluded like
    *         null: it has no place in an ordered statistic, and a NaN
    *         boundary would poison the bucket binary search).
    */
  def percentiles(df: DataFrame, groupCol: String, valueCol: String,
                  ps: Seq[Double], nBuckets: Int = 64): DataFrame =
    percentilesMany(df, groupCol, Seq(valueCol -> ps), nBuckets).drop("vcol")

  /** Percentiles over SEVERAL value columns in ONE set of passes: the
    * columns melt into long form (vcol, v), so all of them share one
    * boundary action (the multi-column approxQuantile), one per-
    * (group, column, bucket) count, one bounded rank window, and one
    * target join — where the per-column formulation pays each of those
    * passes once per column.
    *
    * @param specs (valueCol, percentiles) per column
    * @return DataFrame(groupCol, "vcol", "p", "value")
    */
  def percentilesMany(df: DataFrame, groupCol: String,
                      specs: Seq[(String, Seq[Double])], nBuckets: Int = 64): DataFrame = {
    require(specs.nonEmpty &&
      specs.forall { case (_, ps) => ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0) })
    val vcols = specs.map(_._1)
    val spark = df.sparkSession
    val doubled = df.select(col(groupCol) +: vcols.map(c => col(c).cast("double").as(c)): _*)
    // Approximate bucket boundaries from a DRIVER-SIDE RANDOM SAMPLE
    // (seeded, ~50k rows, all columns in one narrow scan): any values
    // work — quantile-ish boundaries make buckets near-equal so the
    // per-bucket sort below stays bounded, and a skewed or unlucky
    // sample costs load balance, never correctness. This replaces
    // approxQuantile, whose Greenwald-Khanna merge pass cost more than
    // the rest of the query.
    // count the CALLER's frame: a plain scan count is satisfied from
    // parquet metadata, while counting the cast projection re-reads rows
    val total = df.count()
    val fraction = if (total <= 50000L) 1.0 else 50000.0 / total
    val sampleRows = doubled.sample(withReplacement = false, fraction, seed = 42)
      .select(vcols.map(col): _*).collect()
    val allBounds = vcols.indices.map { i =>
      // NaN is dropped with null: it sorts LAST, so a NaN-bearing
      // sample would otherwise push NaN into the boundary array and
      // break its strictly-increasing contract (SortedBucket.require)
      val vs = sampleRows.iterator
        .filterNot(r => r.isNullAt(i) || r.getDouble(i).isNaN)
        .map(_.getDouble(i)).toArray.sorted
      if (vs.isEmpty) Array(Double.NegativeInfinity)  // all rows land in bucket 1
      else (1 until nBuckets).map(b => vs((b.toLong * vs.length / nBuckets).toInt.min(vs.length - 1)))
        .distinct.toArray
    }
    // melt to (col_id, v) long form — an INT column id, not the column
    // name: the id rides every shuffled row and sort key below
    val melted = doubled
      .select(col(groupCol),
        explode(map(vcols.zipWithIndex.flatMap { case (c, i) => Seq(lit(i), col(c)) }: _*))
          .as(Seq("cid", "v")))
      .filter(col("v").isNotNull && !isnan(col("v")))
    // bucket via the native binary-search expression (codegen; the
    // higher-order filter alternative pays an interpreted lambda per
    // boundary per row and dominated the round-4 q18 profile)
    import graft.functions.SortedBucket
    val bucketExpr = vcols.indices.tail.foldLeft(
      SortedBucket.of(col("v"), allBounds(0).toSeq)) { (acc, i) =>
      when(col("cid") === lit(i), SortedBucket.of(col("v"), allBounds(i).toSeq)).otherwise(acc)
    }
    val bucketed = melted.withColumn("bucket", bucketExpr)

    // PASS 1 — per-(group, column, bucket) counts: map-side partial
    // aggregation collapses each task to ≤ groups×columns×buckets rows
    // before the exchange, so no data row ever shuffles.
    val counts = bucketed.groupBy(col(groupCol), col("cid"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    // metadata scale from here: prefix-sum offsets + totals via windows
    // over the counts relation, broadcast back.
    val wg = Window.partitionBy(groupCol, "cid")
    val offsets = counts
      .withColumn("offset", coalesce(
        sum(col("cnt")).over(wg.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val totals = counts.groupBy(col(groupCol), col("cid")).agg(sum(col("cnt")).as("n"))

    // Target order statistics per (group, column, percentile): 0-based
    // position pos = p*(n-1); ranks lo = floor(pos)+1, hi = ceil(pos)+1.
    import spark.implicits._
    val psDf = specs.zipWithIndex
      .flatMap { case ((_, ps), i) => ps.map(p => (i, p)) }.toDF("cid", "p")
    val targets = totals.join(broadcast(psDf), Seq("cid"))
      .withColumn("pos", col("p") * (col("n") - 1).cast("double"))
      .withColumn("lo", floor(col("pos")) + 1)
      .withColumn("hi", ceil(col("pos")) + 1)

    // The buckets that actually CONTAIN a target order statistic —
    // ≤ 2 per (group, column, percentile), metadata-sized.
    val targetBuckets = offsets.as("o")
      .join(targets.select(col(groupCol), col("cid"), col("lo"), col("hi")).as("t"),
        col(s"o.$groupCol") === col(s"t.$groupCol") && col("o.cid") === col("t.cid") &&
          ((col("t.lo") > col("o.offset") && col("t.lo") <= col("o.offset") + col("o.cnt")) ||
           (col("t.hi") > col("o.offset") && col("t.hi") <= col("o.offset") + col("o.cnt"))))
      .select(col(s"o.$groupCol").as(groupCol), col("o.cid").as("cid"),
        col("o.bucket").as("bucket"), col("o.offset").as("offset"))
      .distinct()

    // PASS 2 — rank ONLY inside target buckets: the broadcast semi-ish
    // join throws away every other row at the scan, so the window sort
    // touches a handful of bounded buckets, not the table.
    val ranked = bucketed
      .join(broadcast(targetBuckets), Seq(groupCol, "cid", "bucket"))
      .withColumn("rn",
        row_number().over(Window.partitionBy(groupCol, "cid", "bucket").orderBy("v"))
          + col("offset"))

    val vcolName = vcols.indices.tail.foldLeft(lit(vcols(0))) {
      (acc, i) => when(col("cid") === lit(i), lit(vcols(i))).otherwise(acc)
    }
    ranked
      .join(broadcast(targets.withColumnRenamed(groupCol, "__g").withColumnRenamed("cid", "__c")),
        ranked(groupCol) === col("__g") && ranked("cid") === col("__c") &&
          (col("rn") === col("lo") || col("rn") === col("hi")))
      .groupBy(col(groupCol), col("cid"), col("p"), col("pos"), col("lo"), col("hi"))
      .agg(max(when(col("rn") === col("lo"), col("v"))).as("vlo"),
        max(when(col("rn") === col("hi"), col("v"))).as("vhi"))
      .select(col(groupCol), vcolName.as("vcol"), col("p"),
        interpolate(col("pos"), col("lo"), col("hi"), col("vlo"), col("vhi")).as("value"))
  }

  /** Interpolation used by [[percentiles]]; exposed for tests. */
  private[operators] def interpolate(pos: Column, lo: Column, hi: Column,
                                     vlo: Column, vhi: Column): Column =
    when(lo === hi, vlo)
      .otherwise(((hi - 1).cast("double") - pos) * vlo + (pos - (lo - 1).cast("double")) * vhi)
}
