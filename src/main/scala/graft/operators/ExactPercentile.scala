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
  *  1. buckets values by approximate quantile boundaries (driver gets
  *     only the boundary array; a skewed or unlucky sample costs load
  *     balance, never correctness),
  *  2. computes per-(group, bucket) counts and turns them into rank
  *     offsets with a prefix-sum window over that tiny relation,
  *  3. row-numbers within each (group, bucket) — bounded partitions by
  *     construction — and adds the offset: the exact global rank of
  *     every row within its group,
  *  4. joins the (broadcast) per-group target ranks and keeps only the
  *     two order statistics that straddle each requested percentile,
  *  5. interpolates with the SQL-standard formula
  *     `(hi - pos) * v_lo + (pos - lo) * v_hi` (the same double
  *     arithmetic as Spark's `Percentile` and DuckDB's
  *     `quantile_cont`, so results are bit-identical).
  *
  * Every stage is a shuffle-parallel aggregation or a bounded window;
  * the widest sort is one bucket of one group.
  */
object ExactPercentile {

  /** Long-form result: one row per (group, percentile).
    *
    * @return DataFrame(groupCol, "p", "value") — "p" the requested
    *         percentile, "value" the exact interpolated result over
    *         non-null `valueCol` values.
    */
  def percentiles(df: DataFrame, groupCol: String, valueCol: String,
                  ps: Seq[Double], nBuckets: Int = 64): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0))
    val vals = df.select(col(groupCol), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    // Approximate boundaries: any values work; quantiles make buckets
    // near-equal so the per-bucket sort in step 3 stays bounded. The
    // loose 5% error keeps the Greenwald-Khanna summaries small — a
    // 5%-off boundary costs a 5%-bigger bucket, nothing else.
    val boundaries = vals.stat
      .approxQuantile("v", (1 until nBuckets).map(_.toDouble / nBuckets).toArray, 0.05)
      .distinct.sorted
    // empty on empty input (and a single bucket on constant input):
    // an untyped empty array literal would fail analysis, and any
    // sentinel below every v works — all rows land in bucket 1
    val bArr = array(
      (if (boundaries.isEmpty) Array(Double.NegativeInfinity) else boundaries).map(lit(_)): _*)
    val bucketed = vals.withColumn("bucket", size(filter(bArr, b => b <= col("v"))))

    val counts = bucketed.groupBy(col(groupCol), col("bucket")).agg(count(lit(1)).as("cnt"))
    // groups × buckets rows: metadata scale. Prefix-sum offsets + group
    // totals via windows over it, then broadcast back.
    val wg = Window.partitionBy(groupCol)
    val offsets = counts
      .withColumn("offset", coalesce(
        sum(col("cnt")).over(wg.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val totals = counts.groupBy(col(groupCol)).agg(sum(col("cnt")).as("n"))

    // Target order statistics per (group, percentile): 0-based position
    // pos = p*(n-1); ranks lo = floor(pos)+1 and hi = ceil(pos)+1.
    val targets = totals
      .select(col(groupCol), col("n"), explode(array(ps.map(lit(_)): _*)).as("p"))
      .withColumn("pos", col("p") * (col("n") - 1).cast("double"))
      .withColumn("lo", floor(col("pos")) + 1)
      .withColumn("hi", ceil(col("pos")) + 1)

    val ranked = bucketed
      .join(broadcast(offsets.select(col(groupCol), col("bucket"), col("offset"))),
        Seq(groupCol, "bucket"))
      .withColumn("rn",
        row_number().over(Window.partitionBy(groupCol, "bucket").orderBy("v")) + col("offset"))

    ranked
      .join(broadcast(targets), ranked(groupCol) === targets(groupCol) &&
        (col("rn") === col("lo") || col("rn") === col("hi")))
      .drop(targets(groupCol))
      .groupBy(col(groupCol), col("p"), col("pos"), col("lo"), col("hi"))
      .agg(max(when(col("rn") === col("lo"), col("v"))).as("vlo"),
        max(when(col("rn") === col("hi"), col("v"))).as("vhi"))
      .select(col(groupCol), col("p"),
        interpolate(col("pos"), col("lo"), col("hi"), col("vlo"), col("vhi")).as("value"))
  }

  /** Interpolation used by [[percentiles]]; exposed for tests. */
  private[operators] def interpolate(pos: Column, lo: Column, hi: Column,
                                     vlo: Column, vhi: Column): Column =
    when(lo === hi, vlo)
      .otherwise(((hi - 1).cast("double") - pos) * vlo + (pos - (lo - 1).cast("double")) * vhi)
}
