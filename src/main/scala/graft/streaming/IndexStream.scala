package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming inverted-index maintenance — the retrieval family's
  * streaming twin, completing the matrix every dedup family already
  * has (batch q146 / incremental q149 / streaming HERE): documents
  * arrive continuously, each arrival's tokens flow into PER-TERM
  * state holding that term's posting list, and the state updates
  * df/tf exactly as [[graft.analytics.Retrieval.buildIndex]] would
  * compute them over the union of everything that has arrived.
  * Emitted events are the NEW posting rows (term, doc_id, dl, tf)
  * plus the term's df after the batch, so a downstream sink
  * accumulating the events holds the live index: BM25 serves from it
  * via `bm25TopKFromIndex` with zero corpus rescans (StreamingSpec
  * proves rank-exact parity with the batch retrieve).
  *
  * Replay tolerance: the per-term state remembers which doc_ids
  * already posted, so an at-least-once source replaying a document
  * emits NOTHING the second time — the accumulated index stays
  * row-identical to `buildIndex` (the dedup twins' contract; the
  * batch append path q149 has no such guard and documents the
  * exactly-once-source requirement instead).
  *
  * Scale shape: state is keyed by term, so the shuffle per batch is
  * the batch's token postings — O(Δ), never the corpus. A hot term's
  * state grows with its df; at 100 TB the posting-list state for
  * stopword-class terms belongs in the RocksDB store (list growth is
  * append-only and the provider spills), or terms past a df ceiling
  * can be latched frozen like the dedup twins' saturated buckets —
  * the serving index for such terms adds little BM25 signal anyway
  * (idf → (0.5)/(df+0.5) ≈ 0).
  *
  * CHECKPOINT COMPATIBILITY: [[TermState]] is the persisted schema;
  * changing it breaks restore of existing checkpoints — rebuild from
  * a fresh checkpoint dir (the batch index regenerates state). `ver`
  * (this shape = 1) is the evolution latch.
  */
object IndexStream {

  final case class Doc(doc_id: Long, text: String)
  /** One stored posting: mirrors a buildIndex row minus the term. */
  final case class PostingEntry(doc_id: Long, dl: Double, tf: Long)
  /** An emitted index delta: the new posting row + the term's df
    * AFTER this batch (the "arrivals update df" signal — consumers
    * who only want the posting rows drop the column). */
  final case class PostingEvent(term: String, doc_id: Long, dl: Double,
                                tf: Long, df: Long)
  final case class TermState(postings: List[PostingEntry], ver: Int = 1)

  /** Tokenization bit-equal to the batch side: dl counts ALL
    * split-on-space parts including trailing empties (Spark's
    * `split(text, " ")` keeps them — Java split with limit -1, NOT
    * Scala's default trailing-empty drop), posting terms exclude
    * empty strings (buildIndex's `term <> ''` filter). */
  private[streaming] def tokenize(text: String): (Double, Array[String]) = {
    val parts = text.split(" ", -1)
    (parts.length.toDouble, parts.filter(_.nonEmpty))
  }

  /** The maintained index stream (Append mode). Within a batch a
    * document's token rows land in their terms' groups whole (a doc
    * row explodes in one task before the group shuffle), so tf is
    * exact; new docs append to the term's posting list in doc_id
    * order (deterministic state, batch-arrival-order independent). */
  def streamingIndex(docs: Dataset[Doc]): Dataset[PostingEvent] = {
    import docs.sparkSession.implicits._
    val toks = docs.flatMap { d =>
      val (dl, ws) = tokenize(d.text)
      ws.map(w => (w, d.doc_id, dl))
    }
    toks.groupByKey(_._1)
      .flatMapGroupsWithState[TermState, PostingEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (term, it, state) =>
          val st = state.getOption.getOrElse(TermState(Nil))
          val seen = st.postings.iterator.map(_.doc_id).toSet
          val fresh = it.toSeq.groupBy(t => (t._2, t._3)).iterator
            .filter { case ((id, _), _) => !seen.contains(id) }
            .map { case ((id, dl), rows) => PostingEntry(id, dl, rows.size.toLong) }
            .toIndexedSeq.sortBy(_.doc_id)
          if (fresh.isEmpty) Iterator.empty
          else {
            val grown = st.postings ++ fresh
            state.update(TermState(grown))
            val df = grown.size.toLong
            fresh.iterator.map(p => PostingEvent(term, p.doc_id, p.dl, p.tf, df))
          }
      }
  }
}
