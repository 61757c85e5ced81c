package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heavy-tail-safe mergeable quantile sketch: log₂ buckets.
  *
  * q120's fixed-width histogram guarantees an ABSOLUTE error ≤ W —
  * which is an UNBOUNDED relative error exactly where the 100 TB
  * columns live (token counts, file sizes: medians of 3, tails of
  * millions — a W=8 bin answers "≤ 8 off", useless at x=3 and
  * needlessly fine at x=10⁶). The log₂ sketch buckets a positive
  * integer by its BIT LENGTH — bucket(v) = |bin(v)| , i.e.
  * ⌊log₂ v⌋ + 1, computed as the length of the binary string: pure
  * integer, transcendental-free (a libm log2 rounds 2³ to
  * 2.9999… on some engines and floors wrong — the engine-parity trap
  * the no-transcendentals rule exists for), identical in Spark and
  * DuckDB by construction.
  *
  * The sketch is plain (scope, bin, cnt) rows — the q113/q120
  * convention: no binary blobs, mergeable by groupBy-sum, and the
  * merge is LOSSLESS (merged sketch ≡ sketch of the union, exactly —
  * SketchSpec proves the identity). The quantile estimate is the
  * bucket's inclusive upper edge 2^bin − 1 at the first bucket whose
  * cumulative count reaches rank ⌈q·n⌉, giving the deterministic
  * RELATIVE guarantee x ≤ est < 2·x (x ∈ [2^(bin−1), 2^bin − 1] ⇒
  * est = 2^bin − 1 ≥ x and 2x ≥ 2^bin > est): a factor-2 envelope at
  * EVERY magnitude, 64 buckets covering the whole BIGINT domain.
  * Tighter envelopes come from sub-bucketing the mantissa (the
  * HdrHistogram/DDSketch refinement — same machinery, more buckets);
  * the factor-2 skeleton is what the gate pins.
  *
  * Domain: v ≥ 1 (token counts, sizes). v = 0 shares bucket 1 with
  * v = 1 (bin(0) = "0"), harmless for counts-of-things; negative
  * values are the caller's contract to exclude.
  */
object LogHist {

  /** ⌊log₂ v⌋ + 1 as the length of the binary string — exact on both
    * engines, no floating point anywhere. */
  def bucket(v: Column): Column = length(bin(v)).cast("long")

  /** (scope, bin, cnt) sketch rows of (scope, v) inputs. */
  def sketch(vals: DataFrame): DataFrame =
    vals.select(col("scope"), bucket(col("v")).as("bin"))
      .groupBy(col("scope"), col("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge sketches: groupBy-sum over rows — associative,
    * commutative, lossless (bit-identical to re-sketching the
    * concatenated inputs). */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_.unionByName(_))
      .groupBy(col("scope"), col("bin"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Per-scope quantile estimates from sketch rows alone:
    * (scope, n, est per q) with est = 2^bin − 1 at the first bucket
    * whose cumulative count reaches ⌈q·n⌉. Deterministic — the
    * estimate itself is hash-checkable, not just bound-checkable. */
  def quantiles(sk: DataFrame, qs: Seq[(String, Double)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cum = sk
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("scope")).orderBy(col("bin"))))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("scope"))))
    // bin = 63 (values ≥ 2^62) needs the literal edge: shiftleft(1, 63)
    // wraps to Long.MinValue and the − 1 THROWS under Spark 4 ANSI —
    // 2^63 − 1 = Long.MaxValue is the correct inclusive edge and is
    // not reachable arithmetically (mirrored in q181's oracle SQL)
    val edge = expr(
      "CASE WHEN bin >= 63 THEN CAST(9223372036854775807 AS BIGINT) " +
        "ELSE shiftleft(CAST(1 AS BIGINT), CAST(bin AS INT)) - CAST(1 AS BIGINT) END")
    val aggs = qs.map { case (name, q) =>
      min(when(col("cum") >= ceil(lit(q) * col("n")), edge)).as(name)
    }
    cum.groupBy(col("scope"))
      .agg(max(col("n")).cast("long").as("n"), aggs: _*)
  }
}
