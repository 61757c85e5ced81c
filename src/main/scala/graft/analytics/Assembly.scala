package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data ASSEMBLY operators — the post-curation step that
  * turns curated rows into model-ready training records:
  *
  *  - [[conversations]]: event streams → ordered multi-turn
  *    conversations (the SFT-data shape: sessionize, render turns
  *    through a role template, fingerprint, dedup) — the step between
  *    a product's event log and an instruction-tuning corpus.
  *  - [[preferencePairs]]: scored response groups → (chosen,
  *    rejected) preference pairs (the RLHF/DPO-data shape: group
  *    responses that share a prompt, elect best and worst by quality,
  *    emit the pair with its score margin).
  *
  * Scale notes (the 100 TB contract):
  *  - [[conversations]]'s only per-row sort is the per-user session
  *    window — inherent to sessionization and identical to the q22
  *    spelling (one hash exchange on user_id, sort within user). The
  *    conversation fold carries (ts_us, event_id, turn) structs only —
  *    never the raw event row — and turn strings are template-sized.
  *    Keeper election is an aggregate-free window flag partitioned by
  *    the 64-hex fingerprint (near-unique ⇒ tiny partitions).
  *  - [[preferencePairs]] is ONE partial-aggregated groupBy on the
  *    prompt fingerprint carrying (quality, doc_id) pairs — the
  *    max/min-struct argmax idiom (q40), no window sort, no join, and
  *    the document text never leaves the scan projection (both the
  *    prompt hash and the quality score are map-side).
  */
object Assembly {

  /** 30-minute session gap, microseconds — the q22 constant. */
  val SESSION_GAP_US: Long = 1800000000L

  /** Event types rendered as USER turns; everything else is an
    * assistant/system turn. One spelling for batch and any future
    * streaming twin (the shared-constants rule). */
  val USER_EVENT_TYPES: Seq[String] = Seq("click", "view", "signup")

  /** The turn template: `role: event_type` (Column form — the scan-
    * projection spelling q207 runs). */
  def turnText(eventType: Column): Column =
    concat(
      when(eventType.isin(USER_EVENT_TYPES: _*), lit("user"))
        .otherwise(lit("assistant")),
      lit(": "), eventType)

  /** [[turnText]]'s plain-Scala twin for the streaming state machine
    * ([[graft.streaming.AssemblyStream]]) — spec-pinned equal over
    * every event type, so batch and stream render one template. */
  def turnString(eventType: String): String =
    (if (USER_EVENT_TYPES.contains(eventType)) "user" else "assistant") +
      ": " + eventType

  /** Assemble an event log into ordered multi-turn conversations.
    *
    * Input: `events(event_id, ts, user_id, event_type, ...)`.
    * Output per (user_id, session_id): `n_turns`, `fp` (sha-256 of
    * the newline-joined turn sequence, ordered by (ts, event_id) —
    * partition-layout-free via in-agg struct sort, the q77 idiom),
    * and `is_keeper` (1 for the lexicographically first
    * (user_id, session_id) holding each fingerprint — conversation-
    * level exact dedup, the q28 policy on assembled records).
    */
  def conversations(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sess = events
      .withColumn("gap",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("session_id",
        sum(when(col("gap").isNull || col("gap") > SESSION_GAP_US, 1).otherwise(0))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .select(col("user_id"), col("session_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"),
        turnText(col("event_type")).as("turn"))
    val conv = sess
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        sha2(array_join(expr(
          "transform(array_sort(collect_list(struct(ts_us, event_id, turn))), x -> x.turn)"),
          "\n"), 256).as("fp"))
    val wf = Window.partitionBy(col("fp")).orderBy(col("user_id"), col("session_id"))
    conv.withColumn("is_keeper",
      when(row_number().over(wf) === 1, 1L).otherwise(0L))
  }

  /** Touched-user sets up to this size broadcast (the J1 anti-join);
    * past it the carry anti-join falls back to a shuffled join — a
    * monster delta must not OOM the driver for the carry step. */
  val TOUCHED_BROADCAST_CAP: Long = 2000000L

  /** O(Δ) incremental face of [[conversations]] (the q97/q117 store
    * contract): conversations are USER-decomposable — a delta batch of
    * events can only change the conversations of the users it
    * touches. `storeConvos` is the persisted output of a prior run
    * (columns user_id, session_id, n_turns, fp — the keeper flag is
    * NOT stored; it re-derives below), `touchedEvents` is the FULL
    * event history of every user appearing in the delta (at corpus
    * scale: a key-pruned read of the events table — user_id is the
    * natural cluster/bucket key, the q133/q149 store-read shape).
    * Untouched users' rows carry from the store BY IDENTITY; touched
    * users re-assemble from their own history; the keeper flag is
    * re-elected over the merged conversations frame — sessions-sized,
    * not events-sized, and min-per-fingerprint is mergeable so the
    * election never re-reads events. Identity: this ≡ a full
    * [[conversations]] over (store's events ∪ delta) — q209 gates it
    * against the SAME oracle as q207. */
  def conversationsIncremental(storeConvos: DataFrame,
                               touchedEvents: DataFrame): DataFrame = {
    val touchedUsers = touchedEvents.select("user_id").distinct()
    val small = touchedUsers.limit((TOUCHED_BROADCAST_CAP + 1).toInt)
      .count() <= TOUCHED_BROADCAST_CAP
    val probe = if (small) broadcast(touchedUsers) else touchedUsers
    val carried = storeConvos
      .select("user_id", "session_id", "n_turns", "fp")
      .join(probe, Seq("user_id"), "left_anti")
    val rebuilt = conversations(touchedEvents)
      .select("user_id", "session_id", "n_turns", "fp")
    val merged = carried.unionByName(rebuilt)
    val wf = Window.partitionBy(col("fp")).orderBy(col("user_id"), col("session_id"))
    merged.withColumn("is_keeper",
      when(row_number().over(wf) === 1, 1L).otherwise(0L))
  }

  /** Mine (chosen, rejected) preference pairs from documents that
    * share a prompt prefix.
    *
    * Prompt key = sha-256 of the first `promptTokens` whitespace
    * tokens (responses to one prompt share its rendered prefix —
    * the grouping a real preference pipeline does on the prompt id;
    * here recovered from the text itself). Within each group of ≥ 2:
    * chosen = highest quality (ties → LOWEST doc_id), rejected =
    * lowest quality (ties → HIGHEST doc_id) — so a group of equal
    * scores still yields a deterministic, distinct pair. `margin` =
    * quality(chosen) − quality(rejected), duck-rounded; a margin of
    * 0.0 flags a pair a training run should down-weight or drop —
    * the knob the emitted column leaves to the consumer.
    */
  def preferencePairs(docs: DataFrame, promptTokens: Int = 4): DataFrame = {
    val promptFp = sha2(
      concat_ws(" ", slice(split(col("text"), " "), 1, promptTokens)), 256)
    val scored = docs.select(
      promptFp.as("prompt_fp"),
      col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("q"))
    scored
      .groupBy(col("prompt_fp"))
      .agg(
        count(lit(1)).as("n_group"),
        max(struct(col("q"), (-col("doc_id")).as("nid"))).as("best"),
        min(struct(col("q"), (-col("doc_id")).as("nid"))).as("worst"))
      .filter(col("n_group") >= 2)
      .select(
        col("prompt_fp"),
        (-col("best.nid")).as("chosen_id"),
        (-col("worst.nid")).as("rejected_id"),
        graft.ops.Exact.duckRound(col("best.q") - col("worst.q"), 6).as("margin"),
        col("n_group"))
  }
}
