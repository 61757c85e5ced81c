package graft.streaming

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming corpus curation — the capstone's (q155) incremental
  * form for the stages that stream cleanly: documents arrive
  * continuously and each arrival passes
  *
  *   1. the q132 hard quality battery — STATELESS, evaluated with the
  *      exact batch Column expressions (native TextStats; no Scala
  *      replica to drift from the gate-verified spelling);
  *   2. q129 benchmark decontamination — stateless per doc: distinct
  *      4-gram windows probed against the broadcast benchmark gram
  *      set, ≥ 3 hits drops the doc (bit-equal window construction
  *      to the batch ShingleExplode — split keeps trailing empties);
  *   3. exact dedup — per-FINGERPRINT keyed state (sha-256 of
  *      normalized text, the same 32-byte uniform key the batch
  *      groupBy uses): the first arrival is the keeper and emits;
  *      later copies and at-least-once REPLAYS emit nothing.
  *
  * The near-dup and semantic stages keep their own dedicated twins
  * (DedupStream / SemanticStream) — composing those is piping this
  * stream's survivors into them; this object owns the
  * quality/decon/exact face those twins assume already happened.
  *
  * Keeper contract: within one batch the minimum doc_id wins
  * (deterministic under Spark's arbitrary group-iterator order);
  * across batches the FIRST ARRIVAL wins — identical to the batch
  * min-id keeper when ingestion is id-ordered (the parity spec's
  * regime), and the arrival-defined keeper otherwise (the q147
  * quality-keeper election is the batch-side refinement when
  * arrival order is not meaningful).
  *
  * Scale shape: stages 1–2 are map-only; state is keyed by sha-256
  * fingerprint (uniform, 32 B/key + one long) and grows with UNIQUE
  * documents — the RocksDB provider regime past memory, like the
  * dedup twins. The broadcast benchmark set is the gate-scale
  * spelling; at a 10^8–10^9-gram benchmark union, broadcast the
  * Bloom instead (Dedup.bloomProbe's filter bytes) and resolve the
  * fpp% survivors with the exact store in a foreachBatch join —
  * stage order and emitted rows are unchanged.
  *
  * CHECKPOINT COMPATIBILITY: [[FpState]] is the persisted schema
  * (ver = 1, the evolution latch); changing it means a fresh
  * checkpoint, state rebuilt by replaying the corpus (idempotent by
  * construction).
  */
object CurationStream {

  final case class Doc(doc_id: Long, source: String, lang: String, text: String)
  /** Internal stage-1 output (public: Dataset encoder codegen cannot
    * instantiate a private case class). */
  final case class Gated(fp: String, doc_id: Long, source: String, lang: String,
                         n_tokens: Long, text: String)
  final case class CuratedDoc(fp: String, doc_id: Long, source: String,
                              lang: String, n_tokens: Long)
  final case class FpState(keeper: Long, ver: Int = 1)

  /** Distinct k-gram windows — delegates to THE shared gram loop
    * ([[graft.functions.ShingleExplode.distinctShingles]]), so
    * bit-equality with the batch shingle set is structural. */
  private[streaming] def distinctGrams(text: String, k: Int = 4): Iterator[String] = {
    import scala.jdk.CollectionConverters._
    graft.functions.ShingleExplode.distinctShingles(text, k).iterator().asScala
  }

  /** The broadcast benchmark gram set, built batch-side once (the
    * exact gate-scale spelling; see scaladoc for the Bloom form at
    * benchmark-union scale). */
  def benchGrams(bench: DataFrame): Broadcast[Set[String]] = {
    val grams = graft.analytics.TextAnalysis.shingleSet(bench, 4)
      .select("s").distinct().collect().map(_.getString(0)).toSet
    bench.sparkSession.sparkContext.broadcast(grams)
  }

  /** The curated stream (Append mode): one CuratedDoc per unique,
    * quality-passing, uncontaminated document. */
  def curatedStream(docs: Dataset[Doc],
                    bench: Broadcast[Set[String]]): Dataset[CuratedDoc] = {
    import docs.sparkSession.implicits._
    // stage 1: THE q132 battery spelling (shared helper — a bound
    // change there changes this stream in the same commit)
    val battery = graft.analytics.TextAnalysis.qualityBattery(col("text"))
    val gated = docs.toDF()
      .withColumn("n_tokens", battery.getField("nt"))
      .filter(battery.getField("keep"))
      .withColumn("fp", graft.analytics.TextAnalysis.fingerprint(col("text")))
      .select(col("fp"), col("doc_id"), col("source"), col("lang"),
        col("n_tokens"), col("text"))
      .as[Gated]
    // stage 2: decontamination (hit counting stops at the threshold)
    val clean = gated.filter { g =>
      var hits = 0
      val grams = distinctGrams(g.text)
      while (hits < 3 && grams.hasNext) {
        if (bench.value.contains(grams.next())) hits += 1
      }
      hits < 3
    }.map(g => CuratedDoc(g.fp, g.doc_id, g.source, g.lang, g.n_tokens))
    // stage 3: exact-dedup keeper per fingerprint
    clean.groupByKey(_.fp)
      .flatMapGroupsWithState[FpState, CuratedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, it, state) =>
        if (state.exists) Iterator.empty // later copies + replays
        else {
          val first = it.minBy(_.doc_id) // deterministic within a batch
          state.update(FpState(first.doc_id))
          Iterator.single(first)
        }
      }
  }

  /** The COMPOSED streaming curation pipeline — QuotaStream wired
    * downstream of the curated stream as ONE running query: quality
    * battery → decontamination → fingerprint exact-dedup → per-source
    * mixture admission, the streaming face of q155's pre-packing
    * stages. Two keyed stateful operators chain inside one query
    * (fingerprint state, then source-quota state — Append mode both);
    * placing the quota BELOW the dedup stage is what makes its
    * first-N admission replay-safe: the dedup stage absorbs
    * at-least-once re-offers, so an admitted document can never be
    * admitted twice (the QuotaStream scaladoc's ordering contract,
    * now enforced by construction instead of by caller discipline).
    * Targets are the batch mixture table (q130/q169) — the
    * batch-computes-the-model, stream-enforces-it lifecycle. */
  def curatedAdmittedStream(docs: Dataset[Doc], bench: Broadcast[Set[String]],
                            targets: Map[String, Long]): Dataset[QuotaStream.Admitted] = {
    import docs.sparkSession.implicits._
    QuotaStream.admitted(
      curatedStream(docs, bench)
        .map(c => QuotaStream.Arrival(c.source, c.doc_id)),
      targets)
  }
}
