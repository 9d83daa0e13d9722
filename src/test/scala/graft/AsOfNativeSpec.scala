package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin
import graft.plans.AsOfNative

/** The native merge-join as-of operator must be row-identical to the
  * union+window formulation — on the real events table and on random
  * data with time ties, duplicate keys and unmatched left rows.
  */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  private def normalize(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.orderBy("lid").collect().toSeq.map(_.toSeq)

  test("native as-of equals union+window on the events table") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), expr("ts div 1000").as("tus"),
        col("user_id"), col("event_type"))
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("k"), col("tus").as("lt"), col("event_id").as("lid"))
    val r = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("k"), col("tus").as("rt"), col("event_id").as("rid"))
    val a = normalize(AsOfJoin.latestAtOrBefore(l, r, "k", "lt", "lid", "rt", "rid"))
    val b = normalize(AsOfNative.latestAtOrBefore(l, r, "k", "lt", "lid", "rt", "rid"))
    assert(a.nonEmpty && a == b)
  }

  test("native as-of is correct when inputs arrive mis-partitioned") {
    // one side pre-shuffled on the WRONG column, the other on the key
    // with a different partition count: EnsureRequirements must insert
    // the exchanges that make the merge's zipPartitions co-partitioned
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), expr("ts div 1000").as("tus"),
        col("user_id"), col("event_type"))
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("k"), col("tus").as("lt"), col("event_id").as("lid"))
      .repartition(7, col("lid"))
    val r = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("k"), col("tus").as("rt"), col("event_id").as("rid"))
      .repartition(3, col("k"))
    val a = normalize(AsOfJoin.latestAtOrBefore(l, r, "k", "lt", "lid", "rt", "rid"))
    val b = normalize(AsOfNative.latestAtOrBefore(l, r, "k", "lt", "lid", "rt", "rid"))
    assert(a.nonEmpty && a == b)
  }

  test("native as-of equals union+window on random data with ties and gaps") {
    def samples[T](g: Gen[T], n: Int): Seq[T] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))
    // few keys + tiny time domain → dense ties; key 9 exists only on
    // the left (never matches)
    val rowGen = Gen.zip(Gen.oneOf(1L, 2L, 3L, 9L), Gen.chooseNum(0L, 12L))
    for (seed <- 0 until 4) {
      val lRows = samples(Gen.listOfN(40, rowGen), 1).head.zipWithIndex
        .map { case ((k, t), i) => (k, t, 1000L + i) }
      val rRows = samples(Gen.listOfN(40, rowGen), 1).head.zipWithIndex
        .collect { case ((k, t), i) if k != 9L => (k, t, 2000L + i) }
      val l = lRows.toDF("k", "lt", "lid")
      val r = rRows.toDF("k", "rt", "rid")
      val a = normalize(AsOfJoin.latestAtOrBefore(l, r, "k", "lt", "lid", "rt", "rid"))
      val b = normalize(AsOfNative.latestAtOrBefore(l, r, "k", "lt", "lid", "rt", "rid"))
      assert(a == b, s"seed $seed:\n${a.diff(b)} vs ${b.diff(a)}")
    }
  }

  test("native as-of rejects null event times instead of matching epoch 0") {
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val l = Seq((1L, Some(5L), 100L), (1L, None, 101L)).toDF("k", "lt", "lid")
    val r = Seq((1L, 3L, 200L)).toDF("k", "rt", "rid")
    val exL = intercept[Exception] {
      AsOfNative.latestAtOrBefore(l, r, "k", "lt", "lid", "rt", "rid").collect()
    }
    assert(messages(exL).exists(_.contains("null left event time")), exL.toString)
    val l2 = Seq((1L, 5L, 100L)).toDF("k", "lt", "lid")
    val r2 = Seq((1L, Some(3L), 200L), (1L, None, 201L)).toDF("k", "rt", "rid")
    val exR = intercept[Exception] {
      AsOfNative.latestAtOrBefore(l2, r2, "k", "lt", "lid", "rt", "rid").collect()
    }
    assert(messages(exR).exists(_.contains("null right event time")), exR.toString)
  }

  test("AsOfMergeJoinExec reports numOutputRows (one per left row)") {
    val l = Seq((1L, 5L, 100L), (1L, 9L, 101L), (2L, 4L, 102L)).toDF("k", "lt", "lid")
    val r = Seq((1L, 3L, 200L), (2L, 9L, 201L)).toDF("k", "rt", "rid")
    val df = AsOfNative.latestAtOrBefore(l, r, "k", "lt", "lid", "rt", "rid")
    val n = df.collect().length
    val execs = collectInPlan(df.queryExecution.executedPlan) {
      case e: graft.plans.AsOfMergeJoinExec => e
    }
    assert(execs.nonEmpty, df.queryExecution.executedPlan.toString)
    assert(execs.head.metrics("numOutputRows").value == n.toLong)
    assert(n == 3)
  }
}
