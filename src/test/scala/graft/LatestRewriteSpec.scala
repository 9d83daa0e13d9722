package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[graft.plans.LatestRewrite]] edge semantics (r11 advice): a tied
  * order key must yield one ATOMIC input row — never a per-column
  * "chimera" assembled from different tied rows — an all-NULL order
  * group must still surface a real row, and a non-orderable payload
  * (map) must leave the window untouched. The rule arrives with the
  * session (GraftExtensions), so no registration happens here.
  */
class LatestRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def latestOf(df: DataFrame): DataFrame =
    df.withColumn("rn", row_number().over(
        Window.partitionBy($"k").orderBy($"ord".desc)))
      .filter($"rn" === 1).drop("rn")

  test("tied order keys yield one atomic input row, deterministically") {
    // two rows tie on (k, ord) with OPPOSING payload extremes: independent
    // per-column max_by could assemble ("b", 2.0) — a row that never
    // existed. The struct extremum must return a real input row.
    val df = Seq((1, 10, "a", 2.0), (1, 10, "b", 1.0), (1, 5, "z", 9.0))
      .toDF("k", "ord", "s", "v")
    val out = latestOf(df)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    val rows = out.collect().toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    val inputs = Set((1, 10, "a", 2.0), (1, 10, "b", 1.0))
    assert(rows.size == 1 && inputs.contains(rows.head),
      s"chimera or wrong row: $rows")
    // and the tie breaks deterministically on the payload ("b" > "a")
    assert(rows.head == ((1, 10, "b", 1.0)), rows)
  }

  test("an all-NULL order-key group still returns one real row") {
    val df = Seq((1, Option.empty[Int], "a", 2.0), (1, Option.empty[Int], "b", 1.0))
      .toDF("k", "ord", "s", "v")
    val out = latestOf(df)
    assert(!out.queryExecution.executedPlan.toString.contains("Window"))
    val rows = out.collect().toSeq
      .map(r => (r.getInt(0), r.getString(2), r.getDouble(3)))
    val inputs = Set((1, "a", 2.0), (1, "b", 1.0))
    assert(rows.size == 1 && inputs.contains(rows.head),
      s"all-NULL group must yield a real input row: $rows")
  }

  test("a non-orderable (map) payload declines the rewrite") {
    val df = Seq((1, 10, Map("a" -> 1)), (1, 5, Map("b" -> 2)))
      .toDF("k", "ord", "m")
    val out = latestOf(df)
    // MapType cannot ride a struct extremum — the window must survive
    assert(out.queryExecution.executedPlan.toString.contains("Window"))
    val rows = out.select($"ord").as[Int].collect().toSeq
    assert(rows == Seq(10))
  }
}
