package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Cast, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.DatasetBridge
import org.apache.spark.sql.types.{DoubleType, LongType}
import scala.collection.mutable

/** Whole-operator custom plan: top-K rows per key.
  *
  * The composable alternative (window `row_number() <= k`) fully sorts
  * every partition — O(n log n) per key group and a complete sort
  * buffer. This operator keeps a bounded k-element heap per key —
  * O(n log k), O(keys·k) memory — which is the difference between a
  * spilling sort and a streaming pass when n/key is millions of rows at
  * 100 TB. Implemented as the full Catalyst stack: logical node →
  * planner Strategy → physical exec with a required hash distribution
  * (the planner inserts the one shuffle on the key).
  */
case class TopKPerKeyLogical(keys: Seq[Expression], order: Expression,
    tie: Expression, k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

/** Planner rule: logical top-k → heap-based exec. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyLogical(keys, order, tie, k, child) =>
      TopKPerKeyExec(keys, order, tie, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Per-partition bounded-heap top-k; rows ranked by (order DESC, tie
  * ASC). Requires clustering on `keys` so each key lives in exactly one
  * partition.
  *
  * Memory: heaps are O(distinct keys per partition × k) and never
  * spill. That is the operator's contract — top-k per key only makes
  * sense when k·keys ≪ rows — but a mis-keyed call (e.g. keying on a
  * unique id) would otherwise OOM an executor. The guard
  * `graft.topk.maxKeysPerPartition` (default 10M) fails fast with the
  * offending partition's key count instead.
  */
case class TopKPerKeyExec(keys: Seq[Expression], order: Expression,
    tie: Expression, k: Int, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val maxKeys = conf.getConfString("graft.topk.maxKeysPerPartition", "10000000").toLong
    val childOutput = child.output
    val keysL = keys
    val orderL = org.apache.spark.sql.catalyst.expressions.BindReferences
      .bindReference(order, childOutput)
    val tieL = org.apache.spark.sql.catalyst.expressions.BindReferences
      .bindReference(tie, childOutput)
    val kL = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keysL, childOutput)
      // (isNull, order, tie, row): a NULL order key ranks BELOW every
      // non-null value — `ORDER BY order DESC` NULLS LAST, matching the
      // window row_number formulation — never coerced to 0.0. NULL ties
      // rank after all real tie values.
      type Entry = (Boolean, Double, Long, UnsafeRow)
      // a outranks b?
      def beats(aNull: Boolean, av: Double, at: Long,
          bNull: Boolean, bv: Double, bt: Long): Boolean =
        if (aNull != bNull) bNull
        else if (!aNull && av != bv) av > bv
        else at < bt
      // heap head = current worst of the k retained rows
      val worstAtHead = new Ordering[Entry] {
        override def compare(a: Entry, b: Entry): Int =
          if (beats(a._1, a._2, a._3, b._1, b._2, b._3)) -1
          else if (beats(b._1, b._2, b._3, a._1, a._2, a._3)) 1
          else 0
      }
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[Entry]]
      for (row <- iter) {
        val vObj = orderL.eval(row)
        val isNull = vObj == null
        val v = if (isNull) 0.0 else vObj.asInstanceOf[Double]
        val tObj = tieL.eval(row)
        val t = if (tObj == null) Long.MaxValue else tObj.asInstanceOf[Long]
        val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
          mutable.PriorityQueue.empty[Entry](worstAtHead))
        if (heaps.size > maxKeys) throw new IllegalStateException(
          s"TopKPerKey: over $maxKeys distinct keys in one partition — " +
            "the key is too fine-grained for a per-key heap (heap memory " +
            "is keys×k); re-key or raise graft.topk.maxKeysPerPartition")
        if (heap.size < kL) {
          heap.enqueue((isNull, v, t, row.asInstanceOf[UnsafeRow].copy()))
        } else {
          val (wNull, wv, wt, _) = heap.head
          if (beats(isNull, v, t, wNull, wv, wt)) {
            heap.dequeue()
            heap.enqueue((isNull, v, t, row.asInstanceOf[UnsafeRow].copy()))
          }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map { e =>
        numOutputRows += 1
        e._4
      })
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

/** User-facing API. */
object TopK {
  /** Top-k rows per key, ranked by `orderCol` descending with
    * `tieCol` (unique, ascending) breaking ties deterministically.
    */
  def perKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
      tieCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute = child.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    DatasetBridge.ofRows(spark, TopKPerKeyLogical(
      keyCols.map(attr),
      Cast(attr(orderCol), DoubleType),
      Cast(attr(tieCol), LongType),
      k, child))
  }
}

/** SparkSessionExtensions hook for spark.sql.extensions deployments. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    e.injectPlannerStrategy(_ => TopKStrategy)
}
