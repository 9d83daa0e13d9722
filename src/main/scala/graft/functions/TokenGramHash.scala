package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native k-token-gram hashing: for a token array, emit one compact
  * hash key per consecutive k-token window — one O(tokens) rolling
  * Rabin–Karp pass, codegen'd.
  *
  * Why native (the CdcChunks/AHash lesson applied to d23): the
  * declarative form hashed every window as `md5(concat_ws(slice))` —
  * materializing ~k tokens of text per POSITION, so the gram stage
  * hashes ~k× the corpus bytes (measured: the dominant ~5 s of d23's
  * 6.7 s at sf0.1, and the stage that pushed its sf1 ratio past the
  * 10× per-row allowance). This pass hashes each code point once
  * (token codes) and each token once per lane (the rolling update),
  * so total work is O(corpus bytes), independent of k.
  *
  * Arithmetic (the cross-engine contract, mirrored by the DuckDB
  * oracle in 128-bit HUGEINT):
  *   - token code  = fold over code points: h ← (h·2^21 + cp) mod P,
  *     P = 2^61 − 1 (Mersenne; 2^21 > the max Unicode code point, so
  *     ≤ 2-codepoint tokens are injective and longer ones uniform);
  *   - gram hash per lane b ∈ {131, 1000003}:
  *     H(p) = Σ_{j<k} code(p+j) · b^{k−1−j} mod P — maintained by the
  *     rolling update H ← (H − code_out·b^{k−1})·b + code_in mod P;
  *   - key = "<lane1>_<lane2>" (decimal) — 122 collision bits, enough
  *     that at 10^13 grams (the 100 TB regime) the expected collision
  *     count is ~10^−11, i.e. the key behaves exactly like the md5 it
  *     replaces at ~1/60th the hashing work.
  *
  * 61-bit modular products use the Mersenne reduction over the
  * 128-bit product (Math.multiplyHigh): p = hi·2^64 + lo ≡
  * hi·8 + (lo >>> 61) + (lo & P) (mod P), exact for operands < P —
  * bit-identical to HUGEINT `%` by construction, and PropertySpec
  * fuzzes it against an independent BigInt reference on random
  * unicode tokens.
  *
  * NULL array → NULL; fewer than k tokens → empty array (the caller's
  * `size(ts) >= k` filter makes that row-free either way).
  */
case class TokenGramHash(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"TokenGramHash requires array<string>, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    TokenGramHash.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenGramHash.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenGramHash {
  /** Mersenne prime 2^61 − 1. */
  val P: Long = (1L << 61) - 1
  /** Token-code base: 2^21 (> max code point 0x10FFFF). */
  val B0: Long = 1L << 21
  /** The two gram-lane bases. */
  val B1: Long = 131L
  val B2: Long = 1000003L

  /** (a · b) mod P for a, b ∈ [0, P) via Mersenne reduction of the
    * 128-bit product: 2^64 ≡ 8 and 2^61 ≡ 1 (mod P). */
  def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = (lo & P) + ((hi << 3) | (lo >>> 61))
    if (r >= P) r -= P
    if (r >= P) r -= P
    r
  }

  private def addmod(a: Long, b: Long): Long = {
    val r = a + b
    if (r >= P) r - P else r
  }

  /** b^e mod P. */
  def powmod(b: Long, e: Int): Long = {
    var r = 1L; var i = 0
    while (i < e) { r = mulmod(r, b); i += 1 }
    r
  }

  /** The per-token code: fold h ← (h·2^21 + cp) mod P over the
    * token's code points (Spark's string functions speak code points
    * — the CdcChunks contract, mirrored via codePointAt). */
  def tokenCode(t: UTF8String): Long = {
    val s = t.toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      h = addmod(mulmod(h, B0), cp.toLong)
    }
    h
  }

  /** One rolling pass; called from generated code. */
  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val codes = new Array[Long](n)
    var i = 0
    while (i < n) {
      codes(i) = tokenCode(tokens.getUTF8String(i))
      i += 1
    }
    val out = new Array[Any](n - k + 1)
    val bk1 = powmod(B1, k - 1)
    val bk2 = powmod(B2, k - 1)
    var h1 = 0L; var h2 = 0L
    var j = 0
    while (j < k) { // first window: the plain fold
      h1 = addmod(mulmod(h1, B1), codes(j))
      h2 = addmod(mulmod(h2, B2), codes(j))
      j += 1
    }
    out(0) = UTF8String.fromString(s"${h1}_$h2")
    var p = 1
    while (p <= n - k) {
      val cOut = codes(p - 1)
      val cIn = codes(p + k - 1)
      // H ← (H − c_out·b^{k−1})·b + c_in, all mod P
      h1 = addmod(mulmod(addmod(h1, P - mulmod(cOut, bk1)), B1), cIn)
      h2 = addmod(mulmod(addmod(h2, P - mulmod(cOut, bk2)), B2), cIn)
      out(p) = UTF8String.fromString(s"${h1}_$h2")
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Oracle-side token-code expression over a token-array SQL column
    * `$ts` → `array<bigint>` codes: the same fold in HUGEINT. */
  def codesSql(ts: String): String =
    s"""list_transform($ts, t ->
       |  list_reduce(list_concat([CAST(0 AS BIGINT)],
       |      list_transform(generate_series(1, length(t)), i -> CAST(ascii(t[i]) AS BIGINT))),
       |    (h, x) -> CAST((CAST(h AS HUGEINT) * $B0 + x) % $P AS BIGINT)))""".stripMargin

  /** Oracle-side gram keys over a codes column `$cds`: each lane is
    * the polynomial Σ code(p+j−1)·b^{k−j} mod P the rolling update
    * maintains, evaluated against the CONSTANT power vector (terms
    * stay HUGEINT until the final reduce — a BIGINT sum of 28 61-bit
    * terms would overflow); keys formatted exactly like [[compute]]. */
  def gramsFromCodesSql(cds: String, k: Int): String = {
    def lane(b: Long): String = {
      val powers = (k - 1 to 0 by -1).map(e => powmod(b, e).toString)
        .mkString("[", ", ", "]")
      s"""CAST(CAST(list_sum(list_transform(generate_series(1, $k),
         |    j -> (CAST($cds[p + j - 1] AS HUGEINT) * ($powers)[j]) % $P)) % $P AS BIGINT) AS VARCHAR)""".stripMargin
    }
    s"""list_transform(generate_series(1, len($cds) - ${k - 1}), p ->
       |  ${lane(B1)} || '_' || ${lane(B2)})""".stripMargin
  }
}
