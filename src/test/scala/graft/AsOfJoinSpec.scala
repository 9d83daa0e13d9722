package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches the latest right row at-or-before each left row") {
    val left = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 50L, 12L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 90L, 20L), (1L, 100L, 21L), (1L, 150L, 22L), (2L, 60L, 23L))
      .toDF("k", "t", "rid")
    val got = AsOfJoin.latestAtOrBefore(left, right, "k", "t", "lid", "t", "rid")
      .orderBy("lid")
      .select("lid", "rid").as[(Long, Option[Long])].collect().toSeq
    // lid 10 (t=100): right t=100 qualifies (≤) → 21
    // lid 11 (t=200): latest right ≤ 200 → 22
    // lid 12 (t=50): no right ≤ 50 → null
    assert(got == Seq((10L, Some(21L)), (11L, Some(22L)), (12L, None)))
  }

  test("agrees with q15 on real events") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), expr("ts div 1000").as("tus"),
        col("user_id"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
    val clicks = ev.filter(col("event_type") === "click")
    val viaOp = AsOfJoin.latestAtOrBefore(
      purchases.select(col("user_id"), col("tus"), col("event_id")),
      clicks.select(col("user_id"), col("tus"), col("event_id").as("click_id")),
      "user_id", "tus", "event_id", "tus", "click_id")
      .select(col("event_id").as("purchase_id"), col("click_id"))
      .orderBy("purchase_id").collect().toSeq
    val viaQuery = SparkEntry.queries("q15_asof_join")(spark, sf)
      .select(col("purchase_id"), col("click_id"))
      .orderBy("purchase_id").collect().toSeq
    assert(viaOp == viaQuery)
  }
}
