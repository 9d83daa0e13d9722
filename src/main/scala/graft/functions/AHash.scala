package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 8×8 average-hash (aHash) over a string payload — m6's
  * perceptual signature as ONE codegen'd per-row pass.
  *
  * Replicates the declarative pipeline exactly (Multimodal.scala m6):
  * the payload's code points are divided into 64 spans by
  * `seg = pos·64 div n` (0-based position, n = code-point count), and
  * bit j is '1' iff `num_j · n > total · len_j` — the integer
  * cross-multiplication that keeps every boundary case engine-exact
  * (no division, no floats). Output is the 64-char '0'/'1' string the
  * downstream group/popcount logic consumes; NULL for payloads
  * shorter than 64 code points (no 8×8 grid — the query's filter,
  * enforced here too so the expression is safe standalone).
  *
  * Why native: the explode form ships n rows per document through two
  * hash aggregates (span sums, then the per-doc rollup with a
  * collect_list) — linear, but every code point pays aggregate
  * hash-map bookkeeping, and the r10 measurement showed the HOF fold
  * alternative is even slower (interpreted lambdas). This pass pays
  * one array iteration per row and removes the per-character row
  * stream entirely. Overflow note: the cross-multiplication's wrap
  * point depends on the payload's average code-point value — roughly
  * 10^8 code points for high-code-point text up to ~2·10^9 for ASCII
  * (ADVICE r13: the earlier ~9·10^8 figure assumed one text mix) —
  * and wherever it wraps it does so bit-identically to the
  * declarative long arithmetic; both are far past any real document.
  */
case class AHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"AHash requires a string input, got $other")
  }

  override def dataType: DataType = StringType

  // nullable even for non-null children: sub-64-code-point payloads
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    AHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.AHash.compute($c);
      |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AHash {
  /** One pass over the code points (Spark's split('')/ascii/length all
    * speak code points). Called from generated code — the loop is
    * compiled Scala, so per-row cost is this call, not per-character
    * expression dispatch. Returns null below 64 code points. */
  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    val cps = s.codePoints().toArray
    val n = cps.length.toLong
    if (n < 64) return null
    val num = new Array[Long](64)
    val len = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < cps.length) {
      val seg = ((i.toLong * 64) / n).toInt
      num(seg) += cps(i)
      len(seg) += 1
      total += cps(i)
      i += 1
    }
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j < 64) {
      sb.append(if (num(j) * n > total * len(j)) '1' else '0')
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
