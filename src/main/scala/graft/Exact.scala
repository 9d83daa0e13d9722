package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-arithmetic helpers for oracle parity.
  *
  * Double summation is order-dependent, and Spark's partial (map-side)
  * aggregation sums in a different order than a single-threaded oracle.
  * Casting each operand to DECIMAL first makes the sum exact and
  * order-independent — bit-identical across engines and across any
  * cluster size — at negligible cost (decimal adds are still codegen'd).
  * Final results are cast back to DOUBLE for a stable output schema.
  */
object Exact {
  /** Exact sum of a money-like double column (2 fractional digits). */
  def dsum2(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact sum of a derived double expression (4 fractional digits). */
  def dsum4(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Exact sum, 6 fractional digits. The decimal scale must cover the
    * expression's exact decimal count (e.g. a product of three 2-dp
    * factors has 6 dp): then the double→decimal cast is unambiguous in
    * every engine — otherwise engines may tie-break .5 differently.
    */
  def dsum6(c: Column): Column = sum(c.cast(DecimalType(24, 6))).cast("double")

  /** Exact mean: exact decimal sum divided by count, as double. */
  def dmean2(c: Column): Column = (dsum2(c) / count(lit(1))).cast("double")

  /** Exact running (windowed) sum — same decimal trick. */
  def drunning2(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(DecimalType(18, 2))).over(w).cast("double")
}
