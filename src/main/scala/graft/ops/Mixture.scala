package graft.ops

import org.apache.spark.sql.DataFrame
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

  /** Balanced downsample: ≈ min-source-count docs from every source.
    * Output keeps (idCol, srcCol, bucket) for auditability. */
  def balancedSample(docs: DataFrame, srcCol: String = "source",
                     idCol: String = "doc_id"): DataFrame = {
    val counts = docs.groupBy(col(srcCol)).agg(count(lit(1)).as("_c"))
    val target = counts.agg(min(col("_c")).as("_nmin"))
      .select((pmod(col("_nmin"), lit(1L)) + lit(1L)).cast("int").as("_g"),
        col("_nmin"))
    val rates = counts
      .withColumn("_g", (pmod(col("_c"), lit(1L)) + lit(1L)).cast("int"))
      .join(broadcast(target), Seq("_g"))
      .select(col(srcCol), col("_c"), col("_nmin"))
    val bucket = conv(substring(sha2(col(idCol).cast("string"), 256), 1, 3), 16, 10)
      .cast("long")
    docs.select(col(idCol), col(srcCol)).withColumn("bucket", bucket)
      .join(broadcast(rates), Seq(srcCol))
      .filter(col("bucket") * col("_c") < col("_nmin") * lit(4096L))
      .select(col(idCol), col(srcCol), col("bucket"))
  }
}
