package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix-sum BUCKET OFFSETS with no unpartitioned window
  * anywhere — the top stage of the t10/t15/m7 packing idiom, made
  * fully parallel (r11 verdict #4: retire the √n serial point).
  *
  * Input: per-bucket partial sums `(parts..., pbucket, value)`.
  * Output: `(parts..., pbucket, boffset)` where boffset = sum of all
  * lower buckets' values within the parts group — exactly what the
  * old `Window.orderBy(pbucket)` computed, with the same values,
  * produced by:
  *
  *   1. superbucket = pbucket div b2; the level-2 cumulative runs in
  *      windows PARTITIONED by (parts, superbucket) — each holds ≤ b2
  *      rows, so no task ever sees the whole bucket vector;
  *   2. per-superbucket totals (≤ maxBucket/b2 + 1 rows per parts
  *      group) collect into ONE sorted array per group and fold to
  *      running offsets in a single linear `aggregate` pass — an
  *      explicit fold over a metadata-sized array (the s8-centroids
  *      size class), not a window, so the "No Partition Defined:
  *      moving all data to a single partition" warning class is
  *      structurally impossible;
  *   3. bucket offset = superbucket offset + level-2 cumulative,
  *      joined back by broadcast (superbucket table is tiny).
  *
  * Sizing: with bucket width √n the bucket vector is √n rows; b2 = √
  * of that puts n^¼ rows in each level-2 window and n^¼ entries in
  * the folded array — at 10¹² documents that is ~10³ per task. The
  * fold's `concat` accumulator is quadratic in array length (n^½
  * element copies total) — negligible below ~10⁵ superbuckets, i.e.
  * any corpus below ~10²⁰ rows.
  *
  * The arithmetic is identical to the single-window form (same
  * grouping, same longs, same order), so every oracle over t10/t15/m7
  * is unchanged — hash-equal results, different plan.
  */
object PrefixOffsets {

  /** Superbucket width for a bucket id domain of [0, maxBucket]. */
  def superBucket(maxBucket: Long): Long =
    math.max(64L, math.ceil(math.sqrt((maxBucket + 1).toDouble)).toLong)

  /** See object Scaladoc. `bsums` columns: `parts ++ (pbucket, sumCol)`,
    * pbucket and sumCol both LONG. */
  def bucketOffsets(bsums: DataFrame, parts: Seq[String], sumCol: String,
      b2: Long): DataFrame = {
    require(b2 > 0, s"superbucket width must be positive, got $b2")
    val pcols = parts.map(col)
    val withS = bsums
      .select((pcols ++ Seq(col("pbucket"), col(sumCol).as("_po_v"))): _*)
      .withColumn("_po_s", expr(s"pbucket div $b2"))
    val l2 = Window
      .partitionBy((pcols :+ col("_po_s")): _*)
      .orderBy(col("pbucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = withS.withColumn("_po_l2", coalesce(sum(col("_po_v")).over(l2), lit(0L)))
    val folded = withS
      .groupBy((pcols :+ col("_po_s")): _*).agg(sum(col("_po_v")).as("_po_t"))
      .groupBy(pcols: _*)
      .agg(sort_array(collect_list(struct(col("_po_s"), col("_po_t")))).as("_po_a"))
      .select((pcols :+ explode(expr(
        """aggregate(_po_a,
          |  struct(CAST(0 AS BIGINT) AS run,
          |         CAST(array() AS array<struct<s: bigint, off: bigint>>) AS out),
          |  (acc, x) -> struct(acc.run + x._po_t AS run,
          |    concat(acc.out, array(struct(x._po_s AS s, acc.run AS off))) AS out),
          |  acc -> acc.out)""".stripMargin)).as("_po_o")): _*)
      .select((pcols ++ Seq(col("_po_o.s").as("_po_s"), col("_po_o.off").as("_po_off"))): _*)
    local.join(broadcast(folded), parts :+ "_po_s")
      .select((pcols ++ Seq(col("pbucket"),
        (col("_po_off") + col("_po_l2")).as("boffset"))): _*)
  }
}
