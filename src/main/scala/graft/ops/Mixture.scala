package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Source-mixture rebalancing — the data-mixing pass a training
  * pipeline runs between curation and tokenization: the crawled
  * corpus is dominated by its largest sources, the training recipe
  * wants controlled per-source proportions (cf. the mixture tables
  * in Gao et al. 2020 "The Pile" §1 and Du et al. 2022 GLaM §3).
  * Rebalancing is downsampling, so it composes with the q59/q95
  * family: selection must be DETERMINISTIC (rerun/reshard-stable),
  * which rand()/TABLESAMPLE are not.
  *
  * Mechanics: per-source counts (one tiny agg), target = the
  * minimum source count (the balanced mixture — every source
  * contributes equally), acceptance decided per row by a sha-256
  * bucket in 0..4095 (3 hex nibbles): keep ⇔ bucket·c_source <
  * target·4096 — pure integer arithmetic, no ratio rounding to
  * disagree on (the engine-portability lesson of q80/q81). Expected
  * kept per source ≈ target; exact proportions are not the contract
  * (the bucket is uniform, not stratified) — determinism is.
  *
  * Scale shape: the counts frame is |sources| rows — broadcast back
  * onto the corpus (map-side join), so the whole pass is one small
  * shuffle (the count agg) plus a map-only filter over the scan.
  * The target row attaches to the counts by the non-foldable-key
  * 1-row broadcast (the q126 pattern — a literal join key would
  * constant-fold into the BNLJ the engine-wide PlanSpec bans). */
object Mixture {

  /** The samplers' shared spelling — ONE definition each for the
    * 3-nibble sha bucket (0..4095), the non-foldable 1-row attach
    * key (the q126 trick), and the integer acceptance predicate, so
    * balancedSample / temperatureSample / nestedSubsamples cannot
    * drift on the parts they share. */
  /** 3-nibble sha bucket (0..4095) — the engine-wide deterministic
    * split/sample key: one spelling for every consumer
    * (balanced/temperature/nested samplers here, q185's leakage-safe
    * split in DedupOps); the oracle mirror is the strpos hex decode
    * (DuckDB 1.0 has no conv). */
  def shaBucket(c: Column): Column =
    conv(substring(sha2(c.cast("string"), 256), 1, 3), 16, 10)
      .cast("long")
  private[ops] def shaBucket(idCol: String): Column = shaBucket(col(idCol))
  private def gKey(c: Column): Column =
    (pmod(c, lit(1L)) + lit(1L)).cast("int")
  private def accept(targetCol: String): Column =
    col("bucket") * col("_c") < col(targetCol) * lit(4096L)

  /** Balanced downsample: ≈ min-source-count docs from every source.
    * Output keeps (idCol, srcCol, bucket) for auditability. */
  def balancedSample(docs: DataFrame, srcCol: String = "source",
                     idCol: String = "doc_id"): DataFrame = {
    val counts = docs.groupBy(col(srcCol)).agg(count(lit(1)).as("_c"))
    val target = counts.agg(min(col("_c")).as("_nmin"))
      .select(gKey(col("_nmin")).as("_g"), col("_nmin"))
    val rates = counts
      .withColumn("_g", gKey(col("_c")))
      .join(broadcast(target), Seq("_g"))
      .select(col(srcCol), col("_c"), col("_nmin"))
    docs.select(col(idCol), col(srcCol))
      .withColumn("bucket", shaBucket(idCol))
      .join(broadcast(rates), Seq(srcCol))
      .filter(accept("_nmin"))
      .select(col(idCol), col(srcCol), col("bucket"))
  }

  /** Temperature-scaled mixture sampling (the mT5/UniMax recipe,
    * Xue et al. 2021 §3.1 at T = 2): per-source sampling weight
    * ∝ n_s^(1/T) = √n_s — flatter than proportional, steeper than
    * balanced; the standard knob between "head sources drown the
    * tail" and "tail sources repeat too often". Deterministic like
    * [[balancedSample]]: per-source integer target t_s =
    * ⌊N_target · r_s / R⌋ with r_s = duckRound(√n_s, 6) and
    * R = Σ r_s summed as DECIMAL(21,10) (order-free — a plain
    * double sum would be partition-order dependent), then the
    * sha-bucket acceptance bucket·n_s < t_s·4096. √ is a
    * correctly-rounded IEEE op on both engines and the remaining
    * double multiply/divide/floor are identical IEEE ops on
    * identical inputs, so t_s is bit-reproducible (the q80/q81
    * portability argument extended to the one transcendental-free
    * root). N_target = ⌊N_total / 2⌋ here: the half-corpus budget
    * makes the temperature visible (proportional keeps half of
    * every source; T = 2 keeps MORE than half of small sources,
    * less of large ones).
    *
    * Same scale shape as balancedSample: one |sources|-row agg, the
    * 1-row total attached by the non-foldable-key broadcast, rates
    * broadcast back map-side. */
  def temperatureSample(docs: DataFrame, srcCol: String = "source",
                        idCol: String = "doc_id"): DataFrame =
    temperatureAccept(docs, temperatureTargets(docs, srcCol), srcCol, idCol)

  /** The T = 2 target table alone: (srcCol, _c, _t) — exposed so the
    * q177 bias audit reads the SAME targets the sampler enforces
    * (and a group that keeps nothing still has its target row). */
  def temperatureTargets(docs: DataFrame, srcCol: String = "source"): DataFrame = {
    val counts = docs.groupBy(col(srcCol)).agg(count(lit(1)).as("_c"))
      .withColumn("_r",
        graft.ops.Exact.duckRound(sqrt(col("_c").cast("double")), 6))
    val tot = counts.agg(
        sum(col("_c")).as("_ntot"),
        sum(col("_r").cast("decimal(21,10)")).cast("double").as("_rsum"))
      .select(gKey(col("_ntot")).as("_g"), col("_ntot"), col("_rsum"))
    counts
      .withColumn("_g", gKey(col("_c")))
      .join(broadcast(tot), Seq("_g"))
      .select(col(srcCol), col("_c"),
        floor(expr("_ntot div 2").cast("double")
          * col("_r") / col("_rsum")).cast("long").as("_t"))
  }

  private def temperatureAccept(docs: DataFrame, rates: DataFrame,
                                srcCol: String, idCol: String): DataFrame =
    docs.select(col(idCol), col(srcCol))
      .withColumn("bucket", shaBucket(idCol))
      .join(broadcast(rates), Seq(srcCol))
      .filter(accept("_t"))
      .select(col(idCol), col(srcCol), col("bucket"), col("_t").as("target"))

  /** Nested scaling-law subsample manifests — the ablation datasets a
    * scaling study needs (S_1/64 ⊂ S_1/16 ⊂ S_1/4 ⊂ S_full), one
    * manifest row per threshold. A doc's sha bucket (0..4095, the
    * q130 nibbles) fixes the SMALLEST threshold tier containing it;
    * every coarser tier contains it by arithmetic (bucket < t₁ < t₂),
    * so nesting is structural — stable under re-runs, re-sharding
    * and partitioning, and two corpus halves' manifests MERGE into
    * the whole's (every column is sum/min/max-mergeable).
    *
    * Scale shape: stage 1 groups by tier (≤|thresholds| rows after
    * map-side partial agg — the only shuffle); stage 2 explodes each
    * tier row into the literal list of thresholds it contributes to
    * (an equi-explode over ≤|thresholds| rows — NOT an inequality
    * join against a threshold frame, which would constant-fold into
    * the BNLJ the engine-wide PlanSpec bans) and re-sums. The id
    * checksum is the sum of each id's sha hex chars 4–9 —
    * order-independent and partial-aggregable, where a q155-style
    * sorted-id-list sha would collect corpus-sized fraction members
    * (the scale bug this spelling exists to avoid; q155's lists are
    * per-SHARD and budget-bounded). Checksum headroom: terms are
    * < 2^24, so the BIGINT sum stays exact (no ANSI overflow) below
    * ~5×10^11 documents per manifest — beyond any single release;
    * shard the manifest before that point.
    *
    * A threshold whose tiers are all empty emits no row (explode of
    * nothing), matching the oracle's empty group. */
  def nestedSubsamples(docs: DataFrame,
                       thresholds: Seq[Long] = Seq(64L, 256L, 1024L, 4096L),
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(thresholds.nonEmpty && thresholds == thresholds.sorted &&
      thresholds.distinct == thresholds && thresholds.last == 4096L,
      "thresholds must STRICTLY ascend and end at the full bucket space " +
        "(4096) — a duplicate would double-count its manifest row")
    val sha = sha2(col(idCol).cast("string"), 256)
    val bucket = shaBucket(idCol)
    val idVal = conv(substring(sha, 4, 6), 16, 10).cast("long")
    val nTok = size(split(col(textCol), " ")).cast("long")
    val tier = thresholds.init.zipWithIndex.reverse
      .foldLeft(lit(thresholds.size - 1): Column) {
        case (acc, (t, i)) => when(bucket < t, lit(i)).otherwise(acc)
      }
    val perTier = docs
      .select(tier.as("tier"), nTok.as("nt"), idVal.as("iv"), col(idCol).as("id"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"),
        sum("iv").as("id_sum"), min("id").as("min_id"), max("id").as("max_id"))
    val contributesTo = thresholds.indices.reverse
      .foldLeft(typedLit(Seq.empty[Long]): Column) {
        case (acc, i) => when(col("tier") === i, typedLit(thresholds.drop(i))).otherwise(acc)
      }
    perTier
      .select(explode(contributesTo).as("threshold"), col("n_docs"),
        col("n_tokens"), col("id_sum"), col("min_id"), col("max_id"))
      .groupBy("threshold")
      .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"),
        sum("id_sum").as("id_sum"), min("min_id").as("min_id"),
        max("max_id").as("max_id"))
      .orderBy("threshold")
  }
}
