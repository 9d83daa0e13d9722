package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined chunking: split a string at every position
  * where the Rabin–Karp rolling hash of the last `window` code points
  * hits the mask — one O(n) pass, codegen'd.
  *
  * Exactly m5's declarative HOF pipeline (codes → boundary filter →
  * substring transform, Multimodal.scala), with two scale defects
  * removed that only show on LONG documents:
  *
  *   - the HOF form materializes a per-character codes array via
  *     `ascii(substring(text, i, 1))` — `substring` must walk from the
  *     string head to find the i-th code point on any non-ASCII text,
  *     making boundary detection O(n²) in document length (invisible
  *     on a ~600-char corpus, ruinous on 100 KB documents);
  *   - every position then pays `window` interpreted lambda
  *     multiply-adds where a rolling update pays one.
  *
  * Hash-identity with the HOF is arithmetic, not luck: the HOF sums
  * code points against the REDUCED residues 31^j mod 1000003 and
  * takes one final `% 1000003`; this fold maintains the canonical
  * residue via H_c ≡ 31·H_{c-1} + cp_c − 31^w·cp_{c−w} (mod M), and
  * congruence mod M of nonnegative canonical values makes the
  * `% mask` decision identical (spec-fuzzed against the HOF on
  * random unicode including astral chars, where Spark's codepoint
  * semantics — ascii/length/substring all count code points — are
  * the contract this implementation mirrors via codePointAt).
  *
  * Output: the non-empty chunks in order (the HOF's `c != ''` filter
  * folded in). The DuckDB oracle keeps the explicit polynomial form —
  * the driver parity compare is the cross-engine proof.
  */
case class CdcChunks(child: Expression, window: Int, mask: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"CdcChunks requires a string input, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String], window, mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcChunks.compute($c, $window, $mask)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunks {
  private val M = 1000003L
  private val Base = 31L

  /** 31^w mod M for the eviction term (w ≤ 12 in practice). */
  private def powW(w: Int): Long = {
    var p = 1L; var j = 0
    while (j < w) { p = p * Base % M; j += 1 }
    p
  }

  /** One pass over the UTF-16 form, codepoint-aware (Spark's
    * ascii/length/substring all speak code points). Called from
    * generated code — the loop itself is compiled Scala, so the only
    * per-ROW overhead is this call, not per-character dispatch. */
  def compute(text: UTF8String, window: Int, mask: Int): ArrayData = {
    val s = text.toString
    val n16 = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val buf = new Array[Int](window) // circular: last `window` code points
    val pw = powW(window)
    var h = 0L
    var cpCount = 0
    var chunkStart = 0
    var i = 0
    while (i < n16) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      val slot = cpCount % window
      val evicted = buf(slot)
      buf(slot) = cp
      cpCount += 1
      var boundary = false
      if (cpCount == window) {
        // first full window: the plain reduced-residue sum
        var acc = 0L
        var j = 0
        var p = 1L
        while (j < window) { // term j multiplies codepoint (window - j)
          acc += buf((window - 1 - j) % window).toLong * p
          p = p * Base % M
          j += 1
        }
        h = acc % M
        boundary = h % mask == 0
      } else if (cpCount > window) {
        h = java.lang.Math.floorMod(Base * h + cp - pw * evicted, M)
        boundary = h % mask == 0
      }
      if (boundary) {
        if (i > chunkStart) out += UTF8String.fromString(s.substring(chunkStart, i))
        chunkStart = i
      }
    }
    if (n16 > chunkStart) out += UTF8String.fromString(s.substring(chunkStart, n16))
    new GenericArrayData(out.toArray[Any])
  }
}
