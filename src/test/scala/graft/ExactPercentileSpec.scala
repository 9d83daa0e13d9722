package graft

import org.apache.spark.sql.functions._
import graft.operators.ExactPercentile

/** ExactPercentile must agree bit-for-bit with Spark's buffering
  * `percentile` aggregate — same order statistics, same interpolation
  * arithmetic — while never collecting a group into one task.
  */
class ExactPercentileSpec extends SparkSpec {

  private def builtin(df: org.apache.spark.sql.DataFrame, g: String, v: String, p: Double) =
    df.groupBy(col(g)).agg(expr(s"percentile($v, $p)").as("value"))
      .collect().map(r => r.get(0) -> r.getDouble(1)).toMap

  private def ours(df: org.apache.spark.sql.DataFrame, g: String, v: String, p: Double, buckets: Int = 64) =
    ExactPercentile.percentiles(df, g, v, Seq(p), buckets)
      .collect().map(r => r.get(0) -> r.getDouble(2)).toMap

  test("matches built-in percentile on lineitem for several p") {
    val li = Tables.lineitem(spark, sf)
    for (p <- Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)) {
      val exp = builtin(li, "l_returnflag", "l_extendedprice", p)
      val got = ours(li, "l_returnflag", "l_extendedprice", p)
      assert(got == exp, s"p=$p: $got != $exp")
    }
  }

  test("edge cases: single-row group, ties, tiny bucket count") {
    import spark.implicits._
    val df = Seq(
      ("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", 7.5),
      ("b", 3.0),
      ("c", -1.0), ("c", 0.0), ("c", 0.0), ("c", 0.0), ("c", 5.0))
      .toDF("g", "v")
    for (p <- Seq(0.0, 0.1, 0.5, 0.75, 1.0); nb <- Seq(2, 64)) {
      val exp = builtin(df, "g", "v", p)
      val got = ours(df, "g", "v", p, nb)
      assert(got == exp, s"p=$p buckets=$nb: $got != $exp")
    }
  }

  test("NaN values are excluded like nulls, never poison the boundaries") {
    import spark.implicits._
    // enough NaNs that the boundary sample is guaranteed to draw some —
    // the regression was a NaN boundary tripping SortedBucket's
    // strictly-increasing require and failing the whole query
    val df = (Seq.fill(200)(("a", Double.NaN)) ++
      Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("b", Double.NaN)))
      .toDF("g", "v")
    val got = ours(df, "g", "v", 0.5, 4)
    // group a: median of {1,2,3,4} = 2.5; group b: no real values →
    // no output row for it (same as an all-null group)
    assert(got == Map("a" -> 2.5), got.toString)
  }

  test("degenerate inputs: empty frame and constant values") {
    import spark.implicits._
    val empty = Seq.empty[(String, Double)].toDF("g", "v")
    assert(ExactPercentile.percentiles(empty, "g", "v", Seq(0.5)).count() == 0)
    val const = Seq.fill(40)(("a", 7.0)).toDF("g", "v")
    assert(ours(const, "g", "v", 0.5) == Map("a" -> 7.0))
  }

  test("plan has no single-reducer group sort: widest window is (group, bucket)") {
    val li = Tables.lineitem(spark, sf)
    val plan = ExactPercentile.percentiles(li, "l_returnflag", "l_extendedprice", Seq(0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ObjectHashAggregate"),
      s"buffering percentile aggregate leaked back into the plan:\n$plan")
  }
}
