package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-window SEQUENCE PACKING — the concat-and-chunk step that
  * turns a curated corpus into training sequences of EXACTLY `window`
  * tokens (the GPT-style packing: documents concatenate in a stable
  * order, the token stream is cut every `window` tokens, documents
  * may straddle cuts; Brown et al. 2020 §2.3 train this way, Krell et
  * al. 2022, arXiv:2107.02027, study the no-split alternative).
  * q60's shard packing answers "which ≤-budget bin does each doc
  * START in"; this operator answers the finer questions a training
  * loader actually needs: exactly where every document lands in the
  * packed stream, and what every sequence contains.
  *
  * Scale shape: the global token offsets come from
  * [[PrefixSum.withRunningSum]] (two passes over ONE range shuffle —
  * never a single-partition window), placement is then pure per-row
  * arithmetic, and the per-sequence manifest explodes each document
  * into the sequences it touches — ≤ n_tokens/window + 1 rows per
  * document, so the explode is output-sized (Σ ≈ total/window + docs
  * rows) and the groupBy partial-aggregates. All integer arithmetic
  * (floor divisions on non-negative longs) — engine-portable exactly.
  *
  * Invariants (OpsSpec): sequence fills sum to the corpus token
  * total; every sequence but the last fills to exactly `window`;
  * at most ONE document carries across any given cut (n_carry ≤ 1).
  */
object Pack {

  /** Per-document placement in the packed stream. Input: (doc_id,
    * n_tokens ≥ 1) rows; docs concatenate in doc_id order. Output
    * adds: `cum` (inclusive prefix token count), `first_seq` /
    * `last_seq` (the window indices this doc touches), `start_off`
    * (the doc's offset inside first_seq), `n_splits` (how many cuts
    * run through it — 0 for a doc contained in one window). */
  def packPlacement(docs: DataFrame, window: Long): DataFrame = {
    require(window >= 1, s"packPlacement: window must be >= 1, got $window")
    placementCols(
      PrefixSum.withRunningSum(docs, "doc_id", "n_tokens", "cum"), window)
  }

  /** INCREMENTAL placement — the O(Δ) face of [[packPlacement]]: pack
    * only `delta` (documents appended AFTER everything already
    * packed; every delta doc_id must exceed the packed corpus's max)
    * into the stream that already holds `baseTokens` tokens. The
    * prefix sum is prefix-decomposable, so
    * `packPlacement(base ∪ delta) ≡ packPlacement(base) ∪
    * packPlacementFrom(delta, Σ base tokens)` EXACTLY — a nightly
    * append packs at delta cost, never re-packing the corpus (q97's
    * store contract applied to the packing stage; q191 gates the
    * identity). `baseTokens` is one stored long — the packing
    * store's whole state. */
  def packPlacementFrom(delta: DataFrame, window: Long,
                        baseTokens: Long): DataFrame = {
    require(window >= 1, s"packPlacementFrom: window must be >= 1, got $window")
    require(baseTokens >= 0, s"packPlacementFrom: baseTokens must be >= 0")
    placementCols(
      PrefixSum.withRunningSum(delta, "doc_id", "n_tokens", "cum")
        .withColumn("cum", col("cum") + lit(baseTokens)), window)
  }

  private def placementCols(withCum: DataFrame, window: Long): DataFrame =
    withCum
      .withColumn("first_seq", expr(s"(cum - n_tokens) div ${window}L"))
      .withColumn("last_seq", expr(s"(cum - 1) div ${window}L"))
      .withColumn("start_off", (col("cum") - col("n_tokens")) % window)
      .withColumn("n_splits", col("last_seq") - col("first_seq"))

  /** Per-sequence manifest from [[packPlacement]] rows: for every
    * window index, how many documents it contains (`n_docs`), how
    * many of them started in an EARLIER window (`n_carry` — the
    * cross-contamination count an attention mask must separate; ≤ 1
    * by construction), and its token fill (`tok_fill` — `window`
    * everywhere except the final partial sequence). */
  def seqManifest(placement: DataFrame, window: Long): DataFrame = {
    require(window >= 1, s"seqManifest: window must be >= 1, got $window")
    placement
      .select(col("doc_id"), col("n_tokens"), col("cum"), col("first_seq"),
        explode(sequence(col("first_seq"), col("last_seq"))).as("seq_id"))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("first_seq") < col("seq_id"), 1)).as("n_carry"),
        sum(least(col("cum"), (col("seq_id") + 1) * window)
          - greatest(col("cum") - col("n_tokens"), col("seq_id") * window))
          .as("tok_fill"))
  }
}
