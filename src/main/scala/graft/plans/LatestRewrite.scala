package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the `row_number() = 1` latest-record
  * anti-pattern into a max_by/min_by HASH AGGREGATE — the q34 trade,
  * applied automatically by Catalyst instead of by hand.
  *
  * The window formulation
  * {{{
  *   ... row_number() OVER (PARTITION BY k ORDER BY o1 DESC, o2 DESC) AS rn
  *   ... WHERE rn = 1
  * }}}
  * is partially mitigated by Spark 4 itself: InferWindowGroupLimit
  * plans partial+final WindowGroupLimit stages, so the shuffle already
  * carries ~|keys|·partitions rows, not the changelog. What the
  * native path still pays is SORT work — a per-partition sort in the
  * partial limit, a final per-key sort under the Window — all to keep
  * one row. The aggregate form (`max_by(col, struct(o1, o2))` per
  * payload column) does the same candidate thinning with hash/compare
  * semantics and no sort anywhere. MEASURED (Dev q37diag, noop sink,
  * best-of-3): a wash at sf0.1 (0.49 s both), ~15% at sf1 (1.30 →
  * 1.11 s) — the gap is the sort cost, so it grows with per-key
  * history depth; at changelog scale (long histories per key) the
  * sorts are the dominant term.
  *
  * The match is deliberately narrow — it fires only when ALL hold:
  *   - the Window computes exactly one expression, a bare
  *     `row_number()`;
  *   - the Filter right above it keeps exactly `rn = 1`;
  *   - partition and order expressions are plain attributes;
  *   - order directions are uniform (all DESC → max_by, all ASC →
  *     min_by) with default null ordering.
  * Anything else (rank/dense_rank, rn <= k, computed keys, mixed
  * directions) is left untouched — those have their own operators
  * (TopKPerKey for rn <= k).
  *
  * Caveat, documented not hidden: in a group whose EVERY ordering
  * value is NULL, the window form still surfaces one (arbitrary) row,
  * while max_by yields NULL payloads. The rule is registered
  * explicitly ([[graft.plans.GraftExtensions]] /
  * `spark.experimental.extraOptimizations`), an opt-in for pipelines
  * whose version keys are non-null — which a CDC changelog's are by
  * construction.
  *
  * Output attributes keep their original `exprId`s (aliases pin
  * them), so parent operators resolve unchanged; the `rn` output is
  * replaced by the literal 1 every surviving row satisfies.
  */
object LatestRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w).getOrElse(f)
  }

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] = {
    // exactly one window expression: Alias(row_number() OVER spec)
    val rnAlias = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(), _), _)) => a
      case _ => return None
    }
    // the filter keeps exactly rn = 1
    val keepsFirst = cond match {
      case EqualTo(a: AttributeReference, Literal(1, _)) => a.exprId == rnAlias.exprId
      case EqualTo(Literal(1, _), a: AttributeReference) => a.exprId == rnAlias.exprId
      case _ => false
    }
    if (!keepsFirst) return None
    // plain-attribute partition keys
    val partAttrs = w.partitionSpec.map {
      case a: AttributeReference => a
      case _ => return None
    }
    // plain-attribute, uniform-direction, default-null-ordering keys
    if (w.orderSpec.isEmpty) return None
    val dirs = w.orderSpec.map(_.direction).distinct
    if (dirs.size != 1) return None
    val orderAttrs = w.orderSpec.map {
      case SortOrder(a: AttributeReference, dir, no, _)
        if no == dir.defaultNullOrdering => a
      case _ => return None
    }
    val partSet = AttributeSet(partAttrs)
    val sortKey = CreateStruct(orderAttrs)
    def pick(value: Expression): Expression = (dirs.head match {
      case Descending => MaxBy(value, sortKey)
      case Ascending => MinBy(value, sortKey)
    }).toAggregateExpression()
    // InferWindowGroupLimit may already have slid a WindowGroupLimit
    // under the Window (Spark's own rn<=k mitigation — it pre-limits
    // each partition through a per-partition SORT). The max_by
    // partials subsume that work without the sort, so strip it.
    val input = w.child match {
      case wgl: WindowGroupLimit => wgl.child
      case c => c
    }
    val aggExprs: Seq[NamedExpression] = input.output.map { a =>
      if (partSet.contains(a)) a
      else Alias(pick(a), a.name)(exprId = a.exprId)
    } :+ Alias(Literal(1), rnAlias.name)(exprId = rnAlias.exprId)
    Some(Aggregate(partAttrs, aggExprs, input))
  }
}
