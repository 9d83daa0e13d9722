package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Native codegen'd bucket assignment against a constant sorted
  * boundary array: returns `1 + |{b ∈ boundaries : b ≤ v}|`.
  *
  * This is the per-row hot op of [[graft.operators.ExactPercentile]] —
  * a higher-order `size(filter(array, b -> b <= v))` computes the same
  * value but dispatches an interpreted lambda per element (~1.1 s per
  * 75M element-evals in the round-4 q18 profile); a `when`-chain sum
  * builds an expression tree too deep for whole-stage codegen. Here the
  * boundaries are one referenced `double[]` and the lookup is a binary
  * search — ~log₂(64) compares, inside codegen.
  *
  * Boundaries must be sorted ascending and distinct (the caller
  * dedups); NULL input yields NULL.
  */
case class SortedBucket(child: Expression, boundaries: Seq[Double])
    extends UnaryExpression {

  require(boundaries.nonEmpty &&
    boundaries.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
    "boundaries must be sorted ascending and distinct")

  private val bounds: Array[Double] = boundaries.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"SortedBucket requires a double input, got ${child.dataType}")

  override def dataType: DataType = IntegerType

  /** #elements ≤ v in a sorted distinct array, via binarySearch: an
    * exact hit at i means i+1 elements ≤ v; a miss returns
    * -(insertionPoint)-1 with insertionPoint = #elements < v = #≤ v. */
  private def countLeq(arr: Array[Double], v: Double): Int = {
    val i = java.util.Arrays.binarySearch(arr, v)
    if (i >= 0) i + 1 else -i - 1
  }

  override def nullSafeEval(input: Any): Any =
    countLeq(bounds, input.asInstanceOf[Double]) + 1

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val arr = ctx.addReferenceObj("bounds", bounds, "double[]")
      val idx = ctx.freshName("idx")
      s"""
         |int $idx = java.util.Arrays.binarySearch($arr, $v);
         |${ev.value} = ($idx >= 0 ? $idx + 1 : -$idx - 1) + 1;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SortedBucket {
  /** Column API: bucket index (1-based) of `c` in `boundaries`. */
  def of(c: Column, boundaries: Seq[Double]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(SortedBucket(ColumnBridge.expression(c), boundaries))
  }
}
