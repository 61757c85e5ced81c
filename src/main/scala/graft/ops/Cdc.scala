package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture apply: fold a changelog of (key, seq, op,
  * payload…) rows into a keyed snapshot — the MERGE INTO face of the
  * engine next to `Merge.mergeByKey`'s append-only upsert (U2).
  *
  * Semantics: per key, only the LATEST change (max seq, ties
  * impossible when seq is unique per key — callers derive seq from a
  * monotonic log offset) is applied. 'D' deletes the key; 'U'/'I'
  * both upsert (an update to a missing key inserts — idempotent
  * replay over a compacted log). Untouched snapshot rows pass
  * through.
  *
  * Scale shape: the changelog reduces to one row per touched key via
  * a partial-agged max-struct (NO window sort — the q40 two-stage
  * idiom), then ONE full-outer equi-join against the snapshot. Both
  * sides shuffle on the key once; with a bucketed snapshot the join
  * co-locates and the nightly CDC apply is a single exchange of the
  * (small) changelog. The full-outer join still REWRITES the whole
  * snapshot per apply — against a durable TableLog table, use
  * [[graft.sinks.TableLog.merge]] (round 14): the same semantics
  * through this fold, but copy-on-write over a STATS-PRUNED touch
  * set, O(touched files + changes) instead of O(table).
  */
object Cdc {

  /** `payloadCols` are the value columns present in BOTH the snapshot
    * and the changelog; `keyCol` the join key, `seqCol` the change
    * order, `opCol` ∈ {'I','U','D'}. */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame, keyCol: String,
                     seqCol: String, opCol: String,
                     payloadCols: Seq[String]): DataFrame = {
    // latest change per key: lexicographic max over (seq, op, payload…)
    // — seq alone decides when unique; the trailing fields only pin
    // determinism if a caller ever feeds duplicate seqs
    val changeStruct = struct(
      (col(seqCol) +: col(opCol) +: payloadCols.map(col)).toIndexedSeq: _*)
    val latest = changes
      .groupBy(col(keyCol))
      .agg(max(changeStruct).as("_ch"))
      .select(col(keyCol),
        col(s"_ch.$opCol").as("_op"),
        struct(payloadCols.map(c => col(s"_ch.$c").as(c)).toIndexedSeq: _*).as("_new"))
    val snap = snapshot.select(col(keyCol),
      struct(payloadCols.map(col).toIndexedSeq: _*).as("_old"))
    snap.join(latest, Seq(keyCol), "full_outer")
      .filter(coalesce(col("_op"), lit("")) =!= lit("D")) // delete wins
      .select((col(keyCol) +: payloadCols.map(c =>
        when(col("_op").isNull, col(s"_old.$c"))   // untouched snapshot row
          .otherwise(col(s"_new.$c")).as(c))).toIndexedSeq: _*)
  }
}
