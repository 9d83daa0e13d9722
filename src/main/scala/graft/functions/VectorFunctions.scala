package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (zip_with/aggregate) — no UDFs.
  *
  * Determinism: a per-row array fold is sequential by construction, so
  * plain double arithmetic is bit-identical on any engine or cluster
  * size (unlike cross-row double SUMs, which need the decimal trick in
  * [[graft.Exact]]). The DuckDB oracles fold with `list_reduce` in the
  * same element order.
  */
object VectorFunctions {

  /** Sequential dot product of two float-array columns, as double —
    * the native [[FloatDot]] expression (codegen'd tight loop). */
  def dot(a: String, b: String): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(FloatDot(
      ColumnBridge.expression(expr(a)), ColumnBridge.expression(expr(b))))
  }

  /** Cosine similarity: dot/(sqrt(|a|²)·sqrt(|b|²)). */
  def cosine(a: String, b: String): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Sequential squared-L2 distance between a float array and a double
    * array (vector vs centroid) — the native [[FloatDoubleL2Sq]]
    * expression. */
  def l2sq(a: String, b: String): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(FloatDoubleL2Sq(
      ColumnBridge.expression(expr(a)), ColumnBridge.expression(expr(b))))
  }

  /** LSH bucket from hyperplane-like sign bits at fixed dims (1-based). */
  def signBucket(vec: String, dims: Seq[Int]): Column =
    concat(dims.map(i =>
      when(expr(s"element_at($vec, $i)") > 0f, lit("1")).otherwise(lit("0"))): _*)

  /** The default sign-bucket dims shared by s2 (ANN probe) and d5
    * (embedding near-dup blocking) — spread across the vector so the
    * bits are uncorrelated for typical embeddings. */
  val defaultSignDims: Seq[Int] = Seq(1, 8, 17, 33)
}
