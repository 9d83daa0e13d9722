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
    *
    * ORACLE CAVEAT once the UNSCALED sum exceeds 2^53 (≈9·10^15, i.e.
    * a 6-dp sum past ~9·10^9): DuckDB's decimal→DOUBLE conversion
    * double-rounds (int128 → double, then ·10^-scale) and can land
    * 1 ULP off the correctly-rounded value Spark produces
    * (BigDecimal.doubleValue is single-rounded). Demonstrated at the
    * sf1 sweep on q1's sum_charge: exact decimal 38297991581.938820 →
    * Spark/Java/Python 38297991581.93882, DuckDB direct cast
    * …938812. The oracle-side fix is to round through a string —
    * `CAST(CAST(SUM(…) AS VARCHAR) AS DOUBLE)` — which DuckDB rounds
    * correctly at any magnitude (q1Sql does this). dsum2/dsum4 sums
    * stay under 2^53 unscaled at every scale an oracle actually runs
    * (sf0.01 gate through the sf1 sweep, by 2-4 orders of magnitude);
    * any future bigger-corpus parity run should apply the same string
    * path to every decimal→double oracle cast.
    */
  def dsum6(c: Column): Column = sum(c.cast(DecimalType(24, 6))).cast("double")

  /** Exact mean: exact decimal sum divided by count, as double. */
  def dmean2(c: Column): Column = (dsum2(c) / count(lit(1))).cast("double")

  /** Exact running (windowed) sum — same decimal trick. */
  def drunning2(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(DecimalType(18, 2))).over(w).cast("double")
}
