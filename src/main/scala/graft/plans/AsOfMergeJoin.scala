package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Cast, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.DatasetBridge
import org.apache.spark.sql.types.LongType

/** Native as-of join — the canonical "operator Spark lacks" (DuckDB,
  * kdb and pandas all ship one; Spark users fall back to union+window
  * or an exploding inequality join).
  *
  * Semantics: for each left row, the single right row with equal keys
  * and the greatest `rightTime <= leftTime` (ties on time resolved by
  * the greatest `rightTie`); left rows with no match keep nulls.
  *
  * Physical shape: both sides hash-clustered on the keys (the planner
  * inserts the two shuffles and the per-partition sorts from
  * `requiredChildDistribution`/`requiredChildOrdering`), then a single
  * streaming merge pass per partition — no window buffer, no union
  * relation, no per-key cross product. O(left + right) per partition
  * with one retained candidate row of state.
  *
  * Times must be non-null comparable integers (the repo's epoch-µs
  * convention; the API layer casts to LongType).
  */
case class AsOfJoinLogical(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression, rightTie: Expression,
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinLogical(lk, rk, lt, rt, tie, l, r) =>
      AsOfMergeJoinExec(lk, rk, lt, rt, tie, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfMergeJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression, rightTie: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(rightTime, Ascending), SortOrder(rightTie, Ascending)))

  // every left row passes through exactly once, clustered and sorted as
  // required — declaring it lets the planner elide downstream exchanges
  // and sorts on the same keys
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val ltExpr = leftTime
    val rtExpr = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter0) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val ltBound = BindReferences.bindReference(ltExpr, lOut)
      val rtBound = BindReferences.bindReference(rtExpr, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeysB.map(_.dataType))
      // bind against nullable-marked right attrs: an unmatched left row
      // feeds an all-null right side, and a non-nullable BoundReference
      // would skip the isNullAt check and read garbage zeros
      val joiner = UnsafeProjection.create(outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      val rIter = rIter0.buffered
      // the best (latest admissible) right row seen for the current key
      var cand: UnsafeRow = null
      var candKey: UnsafeRow = null
      lIter.map { l =>
        val lk = lKeyProj(l)
        // enforce the documented non-null precondition: unboxing null
        // would silently coerce to 0L and match as epoch 0
        val ltv = ltBound.eval(l)
        if (ltv == null) throw new IllegalStateException(
          "as-of join: null left event time — filter nulls before joining")
        val lt = ltv.asInstanceOf[Long]
        // consume right rows that are now admissible (key behind ours,
        // or same key with time <= ours); the ordering guarantees no
        // later left row of this key needs anything we discard
        var advancing = true
        while (advancing && rIter.hasNext) {
          val rk = rKeyProj(rIter.head)
          val c = keyOrd.compare(rk, lk)
          val rtv = if (c == 0) rtBound.eval(rIter.head) else null
          if (c == 0 && rtv == null) throw new IllegalStateException(
            "as-of join: null right event time — filter nulls before joining")
          if (c < 0 || (c == 0 && rtv.asInstanceOf[Long] <= lt)) {
            val r = rIter.next()
            if (c == 0) {
              cand = r.asInstanceOf[UnsafeRow].copy()
              candKey = rKeyProj(r).copy()
            }
          } else advancing = false
        }
        val matched = cand != null && keyOrd.compare(candKey, lk) == 0
        numOutputRows += 1
        joiner(joined(l, if (matched) cand else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

/** User-facing API, mirroring [[graft.operators.AsOfJoin.latestAtOrBefore]]
  * so the two implementations are drop-in interchangeable (and
  * differential-testable).
  */
object AsOfNative {
  def latestAtOrBefore(left: DataFrame, right: DataFrame,
      key: String, leftTime: String, leftId: String,
      rightTime: String, rightId: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val l = left.select(col(key).as("__k"), col(leftTime).cast("long").as("__lt"),
      col(leftId).as("__lid"))
    val r = right.select(col(key).as("__rk"), col(rightTime).cast("long").as("__rt"),
      col(rightId).as("__rid"))
    val lp = l.queryExecution.analyzed
    val rp = r.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute = p.output.find(_.name == n).get
    val df = DatasetBridge.ofRows(spark, AsOfJoinLogical(
      Seq(attr(lp, "__k")), Seq(attr(rp, "__rk")),
      Cast(attr(lp, "__lt"), LongType), Cast(attr(rp, "__rt"), LongType),
      Cast(attr(rp, "__rid"), LongType), lp, rp))
    df.select(col("__lid").as(leftId), col("__k").as(key), col("__lt").as(leftTime),
      col("__rid").as(rightId), col("__rt").as(rightTime))
  }
}
