package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV / bottom-k) distinct sketch with SET
  * OPERATIONS — the capability the HLL family (q37/q113) lacks: two
  * HLL sketches union losslessly but cannot intersect, while two KMV
  * sketches support union AND intersection estimates from the same
  * k-row state (Beyer et al., SIGMOD'07 "On synopses for distinct-
  * value estimation under multiset operations"). The curation use is
  * source/crawl overlap triage at cardinality level — "how many
  * distinct tokens/urls/users do these two slices share" — answered
  * from k-row-per-slice state, never a corpus rescan (q150 answers
  * the same question as a Jaccard FRACTION; KMV gives the absolute
  * cardinalities).
  *
  * Representation: a sketch is PLAIN ROWS (scope, h, rn) with
  * rn ≤ K — the q120 histogram-sketch convention (no binary blobs,
  * mergeable by SQL alone, engine-portable). h is a 48-bit integer
  * from the first 12 sha-256 hex nibbles (sha for all hashing — the
  * oracle-parity rule; 48 bits keep every hex-decode term and the
  * (K-1)·2^48 estimator numerator inside BIGINT, and token-scale
  * collision odds at |V|²/2^49 are negligible).
  *
  * Scale shape: the only corpus-touching stage is the per-scope
  * distinct + rank; the rank filter `rn ≤ K` right above the
  * row_number window is Spark's WindowGroupLimit pattern — partial
  * map-side top-K BEFORE the exchange, so the shuffle carries
  * ≤ K rows per partition per scope, not the vocabulary (the same
  * two-phase limit q153's retrieve plans). Everything downstream
  * (merge, estimate) operates on k-sized lists: |scopes|·K rows.
  *
  * Estimator: est(D) = (K-1)·2^48 / h_(K) (integer division — both
  * engines exact), or the seen count when a scope holds fewer than K
  * distinct values (the sketch IS the set then). Union: K(A∪B) =
  * bottom-K of K(A) ∪ K(B) (min-K is associative). Intersection:
  * |{h ∈ K(A∪B) : h ∈ K(A) ∧ h ∈ K(B)}| / |K(A∪B)| · est(A∪B) —
  * the Beyer et al. ρ-estimator; the divisor is the MERGED LIST
  * SIZE min(|A∪B|, K), not K — dividing by K when the merged list
  * is short (sketch = whole set, est_union exact) would halve an
  * exact answer instead of returning n_common exactly. Integer
  * arithmetic end to end (n_common·est ≤ 64·2^54 ≪ 2^63).
  */
object Kmv {

  /** Sketch size. rsd ≈ 1/sqrt(K-2) ≈ 12.7% at 64. */
  val K = 64

  /** 48-bit element hash: first 12 sha-256 hex nibbles. */
  def hash48(c: Column): Column =
    conv(substring(sha2(c, 256), 1, 12), 16, 10).cast("long")

  /** Estimator numerator (K-1)·2^48. */
  val EST_NUM: Long = (K - 1).toLong * (1L << 48)

  /** The one bottom-K re-rank: distinct (scope, h) → ranked rows
    * rn ≤ K. sketch and merge both ARE this block — sharing it
    * makes the q174 merge ≡ sketch identity structural rather than
    * maintained by hand. The rank filter directly above row_number
    * is the WindowGroupLimit pattern (partial map-side top-K before
    * the exchange). */
  private def bottomK(rows: DataFrame): DataFrame =
    rows.distinct()
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("scope")).orderBy(col("h"))))
      .filter(col("rn") <= K)

  /** Bottom-K sketch rows (scope, h, rn), rn ≤ K, from element
    * strings. Input need not be distinct — the sketch dedups. */
  def sketch(df: DataFrame, scope: Column, elem: Column): DataFrame =
    bottomK(df.select(scope.as("scope"), hash48(elem).as("h")))

  /** Merge two sketch-row frames: bottom-K of the union per scope —
    * min-K is associative, so merge(sketch(A), sketch(B)) ≡
    * sketch(A ∪ B) EXACTLY (not approximately), which is what makes
    * KMV stats incrementally maintainable: a nightly delta's sketch
    * merges into the store without touching old data, and the
    * merged estimate equals the full-recompute estimate bit for bit
    * (q174's gate; SketchSpec pins the row-level identity). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    bottomK(a.select(col("scope"), col("h"))
      .unionByName(b.select(col("scope"), col("h"))))

  /** Distinct-cardinality estimate per scope from sketch rows:
    * (scope, n_seen, est). */
  def estimate(sk: DataFrame): DataFrame =
    sk.groupBy(col("scope"))
      .agg(count(lit(1)).as("n_seen"),
        max(when(col("rn") === K, col("h"))).as("kth"))
      .select(col("scope"), col("n_seen"),
        when(col("n_seen") < K, col("n_seen"))
          .otherwise(expr(s"$EST_NUM div kth")).as("est"))

  /** Pairwise union + intersection estimates for every scope pair
    * (s1 < s2) present in the sketch frame. Output: (s1, s2,
    * est_union, est_inter) — all BIGINT, deterministic. The pair
    * frame and everything here is |scopes|²·K rows: broadcast-scale
    * state, no corpus access. The scope×scope enumeration plans a
    * bounded BroadcastNestedLoopJoin over the MODEL-SIZED scope
    * list (PlanSpec-allowlisted): the |scopes|² pairs are this
    * operator's OUTPUT, so no join strategy changes the complexity. */
  def pairEstimates(sk: DataFrame): DataFrame = {
    val scopes = sk.select(col("scope")).distinct()
    val pairs = scopes.as("a")
      .join(scopes.as("b"), col("a.scope") < col("b.scope"))
      .select(col("a.scope").as("s1"), col("b.scope").as("s2"))
    val sideA = pairs.join(sk.withColumnRenamed("scope", "s1"), Seq("s1"))
      .select(col("s1"), col("s2"), col("h"), lit(1).as("fa"), lit(0).as("fb"))
    val sideB = pairs.join(sk.withColumnRenamed("scope", "s2"), Seq("s2"))
      .select(col("s1"), col("s2"), col("h"), lit(0).as("fa"), lit(1).as("fb"))
    val merged = sideA.unionByName(sideB)
      .groupBy(col("s1"), col("s2"), col("h"))
      .agg(max(col("fa")).as("fa"), max(col("fb")).as("fb"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("s1"), col("s2")).orderBy(col("h"))))
      .filter(col("rn") <= K)
    merged.groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("n_seen"),
        max(when(col("rn") === K, col("h"))).as("kth"),
        sum(col("fa") * col("fb")).as("n_common"))
      .select(col("s1"), col("s2"), col("n_seen"), col("n_common"),
        when(col("n_seen") < K, col("n_seen"))
          .otherwise(expr(s"$EST_NUM div kth")).as("est_union"))
      .select(col("s1"), col("s2"), col("est_union"),
        expr("(n_common * est_union) div n_seen").as("est_inter"))
  }
}
