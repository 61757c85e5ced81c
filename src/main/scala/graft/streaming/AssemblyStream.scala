package graft.streaming

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.analytics.Assembly

/** Streaming SFT conversation assembly — the continuous twin of
  * `Assembly.conversations` (q207 batch): events stream in, each
  * user's open session buffers in per-user state, and a CONVERSATION
  * emits the moment its session closes — either a later event for the
  * same user arrives past the 30-minute gap, or the watermark passes
  * the session's last event + gap (event-time timeout — idle sessions
  * close without needing a successor event). A second chained
  * stateful stage (the CurationStream two-FMGWS pattern) flags
  * `first_seen` per fingerprint — the streaming form of the batch
  * keeper election (streams elect the FIRST ARRIVAL; batch elects the
  * lexicographically least key — same kept-fingerprint SET, one
  * keeper each, different representative when arrival order differs
  * from key order; the parity spec pins exactly that contract).
  *
  * One spelling with the batch side: the role map is
  * [[Assembly.USER_EVENT_TYPES]], the template is
  * [[Assembly.turnString]] (the Column twin [[Assembly.turnText]] is
  * spec-pinned equal over every event type), the fingerprint is
  * SHA-256 over the newline-joined turns ordered by (ts, event_id) —
  * `MessageDigest` here, `sha2` there, byte-identical by the O4
  * contract. Turn order inside a session is settled by a close-time
  * sort, so out-of-order arrivals WITHIN an open session are
  * absorbed; the per-arrival GAP decision assumes event-time-ordered
  * arrival per user (the standard streaming-sessionization contract —
  * an out-of-order arrival that should have split or joined an
  * already-closed session is a watermark violation, same as the
  * built-in `session_window`). Note the engine's late filter on a
  * watermarked stateful operator drops rows AT-or-below the current
  * watermark (`<=`, not `<`) — an event timestamped exactly at the
  * initial watermark (epoch 0) never reaches the state machine.
  *
  * Scale: state shards by user_id (stage 1) and by 64-hex
  * fingerprint (stage 2); per-user state holds ONE open session's
  * template-sized turns plus a session counter, bounded by
  * [[MAX_OPEN_TURNS]] — a session past the cap stops buffering and
  * flags itself (the saturation-latch convention of the other
  * twins: a runaway event source is a signal, not an OOM).
  *
  * CHECKPOINT COMPATIBILITY: [[AssemblyStream.SessState]] /
  * [[AssemblyStream.FpState]] are the persisted schemas; bump `ver`
  * and migrate on change. */
object AssemblyStream {

  /** Saturation cap on one open session's buffered turns. */
  val MAX_OPEN_TURNS: Int = 100000

  /** `ts` (the watermark attribute) rides along so the event-time
    * timeout checker sees it below the stateful operator; the state
    * machine reads only the exact-micros `ts_us`. */
  final case class Ev(event_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                      user_id: Long, event_type: String)
  final case class Turn(ts_us: Long, event_id: Long, turn: String)
  final case class SessState(open: List[Turn], lastTs: Long,
                             sessionId: Long, saturated: Boolean,
                             ver: Int = 1)
  /** `saturated` = the session hit [[MAX_OPEN_TURNS]] and later turns
    * were dropped — the latch must be VISIBLE on the emitted record
    * (a silently-truncated conversation read as complete is a data
    * bug; consumers drop or quarantine flagged rows). */
  final case class Convo(user_id: Long, session_id: Long, n_turns: Long,
                         fp: String, saturated: Boolean)
  final case class FlaggedConvo(user_id: Long, session_id: Long,
                                n_turns: Long, fp: String,
                                first_seen: Boolean, saturated: Boolean)
  final case class FpState(seen: Boolean, ver: Int = 1)

  private def sha256Hex(s: String): String = {
    val d = MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    d.map(b => f"$b%02x").mkString
  }

  private def close(userId: Long, st: SessState): Convo = {
    val ordered = st.open.sortBy(t => (t.ts_us, t.event_id))
    Convo(userId, st.sessionId, ordered.length.toLong,
      sha256Hex(ordered.map(_.turn).mkString("\n")), st.saturated)
  }

  /** events(event_id, ts TIMESTAMP, user_id, event_type, …) →
    * CLOSED conversations (stage 1 alone). `watermarkDelay` bounds
    * both late data and session-close latency (a session closes
    * `gap` after its last event's watermark, not wall clock). */
  def closedConversations(events: DataFrame,
                          watermarkDelay: String = "10 minutes"): Dataset[Convo] = {
    import events.sparkSession.implicits._
    val gapUs = Assembly.SESSION_GAP_US
    val evs = events
      .withWatermark("ts", watermarkDelay)
      .select(col("event_id").cast("long"), col("ts"),
        unix_micros(col("ts")).as("ts_us"),
        col("user_id").cast("long"), col("event_type"))
      .as[Ev]

    val closed: Dataset[Convo] = evs
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Convo](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastTs + gap: close the open session,
            // KEEP the session counter (a later event starts the next
            // session with the right index)
            val st = state.get
            val out = if (st.open.nonEmpty) Seq(close(userId, st)) else Seq.empty
            state.update(SessState(Nil, st.lastTs, st.sessionId, saturated = false))
            out.iterator
          } else {
            val arrivals = rows.toList.sortBy(e => (e.ts_us, e.event_id))
            var st = state.getOption.getOrElse(
              SessState(Nil, Long.MinValue, 0L, saturated = false))
            val emitted = List.newBuilder[Convo]
            arrivals.foreach { e =>
              val turn = Turn(e.ts_us, e.event_id, Assembly.turnString(e.event_type))
              if (st.open.isEmpty)
                st = SessState(turn :: Nil, e.ts_us, st.sessionId + 1,
                  saturated = false)
              else if (e.ts_us - st.lastTs > gapUs) {
                emitted += close(userId, st)
                st = SessState(turn :: Nil, e.ts_us, st.sessionId + 1,
                  saturated = false)
              } else if (st.open.length >= MAX_OPEN_TURNS)
                // saturation latch: stop buffering, remember the breach
                st = st.copy(lastTs = math.max(st.lastTs, e.ts_us),
                  saturated = true)
              else
                st = st.copy(open = turn :: st.open,
                  lastTs = math.max(st.lastTs, e.ts_us))
            }
            state.update(st)
            if (st.open.nonEmpty)
              state.setTimeoutTimestamp(st.lastTs / 1000L + gapUs / 1000L)
            emitted.result().iterator
          }
      }
    closed
  }

  /** Stage 2: flag the FIRST ARRIVAL per fingerprint (the streaming
    * keeper). Watermark-free, timeout-free state — it never discards
    * a late row and never evicts by time, so chaining it below the
    * watermarked stage 1 is sound even though Spark's conservative
    * global-watermark correctness check cannot see that (FMGWS is a
    * black box to the checker). Run the composed query with
    * `spark.sql.streaming.statefulOperator.checkCorrectness.enabled
    * = false`, or run the two stages as separate queries through a
    * table hop (the q192 pattern) to keep the check armed. */
  def flagFirstSeen(closed: Dataset[Convo]): Dataset[FlaggedConvo] = {
    import closed.sparkSession.implicits._
    closed
      .groupByKey(_.fp)
      .flatMapGroupsWithState[FpState, FlaggedConvo](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Convo], state: GroupState[FpState]) =>
          var seen = state.getOption.exists(_.seen)
          val out = rows.map { c =>
            val first = !seen
            seen = true
            FlaggedConvo(c.user_id, c.session_id, c.n_turns, c.fp, first,
              c.saturated)
          }.toList
          state.update(FpState(seen = true))
          out.iterator
      }
  }

  /** The composed twin: sessionize-and-close + first-seen flag in ONE
    * running query (requires the correctness-check conf noted on
    * [[flagFirstSeen]]). */
  def conversationStream(events: DataFrame,
                         watermarkDelay: String = "10 minutes"): Dataset[FlaggedConvo] =
    flagFirstSeen(closedConversations(events, watermarkDelay))
}
