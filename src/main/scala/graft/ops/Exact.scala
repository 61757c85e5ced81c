package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-exact aggregation helpers.
  *
  * Summing doubles is order-dependent: Spark's partial-aggregate tree
  * and a single-threaded engine (the DuckDB oracle, or a re-run with a
  * different partition count) can disagree in the last bits. Since the
  * corpus money/quantity columns carry <= 2 decimal digits, we sum in
  * DECIMAL (exact, associative) and cast the exact result back to
  * DOUBLE at the very end. The result is bit-identical regardless of
  * partitioning, parallelism, or engine — which is also the property
  * you want on a 1000-executor cluster: results that don't depend on
  * the shuffle layout.
  */
object Exact {
  /** Cast a <=2-decimal double column to exact decimal. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact sum of a 2-decimal double column, returned as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact sum of an already-decimal expression, returned as double. */
  def dsumExpr(e: Column): Column = sum(e).cast("double")

  /** Exact mean: exact decimal sum divided by count, in double. */
  def davg(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))

  /** extendedprice * (1 - discount) carried out in decimal (exact). */
  def discPrice(price: Column, discount: Column): Column =
    dec(price) * (lit(1) - dec(discount))

  /** price * (1 - discount) * (1 + tax) in decimal (exact). */
  def charge(price: Column, discount: Column, tax: Column): Column =
    dec(price) * (lit(1) - dec(discount)) * (lit(1) + dec(tax))

  /** Oracle-compatible double rounding. DuckDB rounds doubles as
    * multiply-by-10^n → round-half-away-from-zero → divide; Spark's
    * round() goes through BigDecimal on the exact binary expansion.
    * The two disagree when the multiply's double-rounding crosses a
    * .5 boundary (~1 row in a few thousand at 6 decimals), so every
    * rounded double in a verified output uses this replica of the
    * oracle's algorithm. */
  def duckRound(c: Column, n: Int): Column =
    graft.functions.DuckRoundExpr.duck_round(c, n)

  /** Exact-component sample stddev: the two sums are exact decimals,
    * the final scalar math is plain IEEE double (deterministic). */
  def dstddev(c: Column): Column = {
    val n  = count(lit(1)).cast("double")
    val s  = sum(dec(c)).cast("double")
    val s2 = sum(dec(c) * dec(c)).cast("double")
    when(n > 1, sqrt((s2 - s * s / n) / (n - lit(1)))).otherwise(lit(null))
  }
}
