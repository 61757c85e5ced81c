package graft

import org.apache.spark.sql.functions._
import graft.analytics.Assembly

/** Closed-form invariants of the training-data assembly operators
  * (q207/q208 gate the full-corpus runs; these pin the semantics the
  * oracle can't isolate: session splits, turn ordering under ts ties,
  * keeper election, argmax tiebreaks, singleton-group exclusion). */
class AssemblySpec extends SparkSpec {
  import spark.implicits._

  private def events(rows: (Long, Long, Long, String)*) =
    rows.toDF("event_id", "m", "user_id", "event_type")
      .select(col("event_id"), expr("timestamp_micros(m * 60000000)").as("ts"),
        col("user_id"), col("event_type"))

  test("conversations: session split at the 30-min gap, ordered turns, fp dedup") {
    // user 1: two sessions (gap 31 min between event 2 and 3); user 2:
    // one session whose turn SEQUENCE equals user 1's session 1 —
    // fingerprints must collide and user 1 (lower key) keeps.
    val ev = events(
      (1L, 0L, 1L, "click"), (2L, 10L, 1L, "purchase"),
      (3L, 41L, 1L, "view"),
      (4L, 500L, 2L, "click"), (5L, 505L, 2L, "purchase"))
    val out = Assembly.conversations(ev)
      .orderBy("user_id", "session_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    assert(out.length == 3)
    val Array(u1s1, u1s2, u2s1) = out
    assert(u1s1._3 == 2 && u1s2._3 == 1 && u2s1._3 == 2)
    assert(u1s1._4 == u2s1._4, "identical turn sequences must share a fingerprint")
    assert(u1s1._4 != u1s2._4)
    assert(u1s1._5 == 1L && u2s1._5 == 0L,
      "the lowest (user_id, session_id) holding a fingerprint keeps")
    assert(u1s2._5 == 1L)
  }

  test("conversations: ts ties order by event_id; roles follow the type map") {
    // Two events at the SAME timestamp — the fold must order by
    // event_id, so swapping ids flips the fingerprint.
    val a = Assembly.conversations(events((1L, 0L, 7L, "click"), (2L, 0L, 7L, "error")))
      .select("fp").as[String].head()
    val b = Assembly.conversations(events((2L, 0L, 7L, "click"), (1L, 0L, 7L, "error")))
      .select("fp").as[String].head()
    assert(a != b, "turn order under a ts tie is event_id order")
    // the rendered template: user types vs assistant types
    val expected = "user: click\nassistant: error"
    val direct = spark.sql(
      s"SELECT sha2('${expected}', 256)").as[String].head()
    assert(a == direct, "turn template is role: event_type joined by newline")
  }

  test("preferencePairs: argmax tiebreaks, margin, singleton exclusion") {
    // Prompt group A: three docs sharing a 4-token prefix with
    // different quality (longer text → higher q26 score on this
    // corpus shape); group B: a singleton that must not emit.
    val filler = (1 to 60).map(i => "the with that have word" + (i % 7)).mkString(" ")
    val docs = Seq(
      (10L, "p p p p " + filler),             // group A, long (high quality)
      (11L, "p p p p short"),                 // group A, short (low quality)
      (12L, "p p p p " + filler),             // group A, same text as 10
      (20L, "q q q q lonely")                 // group B singleton
    ).toDF("doc_id", "text")
    val out = Assembly.preferencePairs(docs).collect()
    assert(out.length == 1, "singleton groups emit nothing")
    val r = out.head
    assert(r.getAs[Long]("chosen_id") == 10L,
      "equal-quality tie elects the LOWEST doc_id as chosen")
    assert(r.getAs[Long]("rejected_id") == 11L)
    assert(r.getAs[Long]("n_group") == 3L)
    assert(r.getAs[Double]("margin") > 0.0)
  }

  test("preferencePairs: an all-equal group still yields a distinct, zero-margin pair") {
    val docs = Seq(
      (5L, "z z z z same text here"),
      (6L, "z z z z same text here")
    ).toDF("doc_id", "text")
    val r = Assembly.preferencePairs(docs).collect().head
    assert(r.getAs[Long]("chosen_id") == 5L && r.getAs[Long]("rejected_id") == 6L,
      "equal scores: chosen = min id, rejected = max id — never the same row")
    assert(r.getAs[Double]("margin") == 0.0)
  }

  test("conversationsIncremental: carry untouched, rebuild touched, re-elect keepers") {
    // store = pre-delta state: users 1 and 2 each hold an identical
    // 2-turn session (shared fingerprint, user 1 keeps). The delta is
    // ONE new event for user 1 (a later session), so user 1 rebuilds
    // from its full history while user 2 must carry BY IDENTITY —
    // and the keeper election must still see user 2's carried row.
    val pre = events(
      (1L, 0L, 1L, "click"), (2L, 10L, 1L, "purchase"),
      (3L, 0L, 2L, "click"), (4L, 10L, 2L, "purchase"))
    val all = events(
      (1L, 0L, 1L, "click"), (2L, 10L, 1L, "purchase"),
      (3L, 0L, 2L, "click"), (4L, 10L, 2L, "purchase"),
      (5L, 200L, 1L, "view"))
    val store = Assembly.conversations(pre)
      .select("user_id", "session_id", "n_turns", "fp")
    val touched = all.filter(col("user_id") === 1L) // user 1's full history
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "session_id", "n_turns", "fp", "is_keeper")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
          r.getLong(4))).toSet
    val inc = rows(Assembly.conversationsIncremental(store, touched))
    assert(inc == rows(Assembly.conversations(all)),
      "incremental (carry ∪ rebuild + re-election) must equal the full recompute")
    assert(inc.exists(c => c._1 == 2 && c._5 == 0L),
      "user 2's carried duplicate must lose the keeper election")
    assert(inc.exists(c => c._1 == 1 && c._2 == 2),
      "user 1's delta session must appear from the rebuild")
  }

  test("turnString ≡ turnText over every event type (one template, two faces)") {
    val types = Assembly.USER_EVENT_TYPES ++ Seq("purchase", "error", "zzz-unknown")
    val viaColumn = types.toDF("event_type")
      .select(Assembly.turnText(col("event_type"))).as[String].collect()
    assert(viaColumn.toSeq == types.map(Assembly.turnString),
      "the batch Column template and the stream's Scala template drifted")
  }

  test("conversation stream ≡ batch across file drops and a checkpoint restart") {
    import graft.streaming.AssemblyStream
    // Synthetic event log (minutes → micros): user 1's first session
    // SPANS the night-1/2 boundary (state survives a drop) and its
    // second session OPENS in night 3 (state survives the restart);
    // user 2's session repeats user 1's turn sequence (fingerprint
    // collision → exactly one first_seen); user 3 is a night-3
    // singleton. The sentinel user −1 advances the watermark so
    // event-time timeouts close everything still open.
    // minute 0 would sit exactly AT the initial watermark — the
    // stateful operator's late filter drops rows at-or-below the
    // watermark, so the fixture starts at minute 100
    val mk = (id: Long, min: Long, user: Long, typ: String) => (id, min + 100, user, typ)
    val night1 = Seq(mk(1, 0, 1, "click"), mk(2, 10, 1, "purchase"),
      mk(5, 5, 2, "click"), mk(6, 15, 2, "purchase"))
    val night2 = Seq(mk(3, 20, 1, "view"), mk(7, 25, 2, "view"))
    val night3 = Seq(mk(4, 120, 1, "signup"), mk(8, 200, 3, "error"))
    val sentinel = Seq(mk(9, 100000, -1L, "click"))
    def frame(rows: Seq[(Long, Long, Long, String)]) =
      rows.toDF("event_id", "m", "user_id", "event_type")
        .select(col("event_id"), expr("timestamp_micros(m * 60000000)").as("ts"),
          col("user_id"), col("event_type"))

    val dir = java.nio.file.Files.createTempDirectory("graft-asm-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-asm-ckpt").toString
    frame(night1).write.mode("overwrite").parquet(dir)
    AssemblySpec.collectedConvos.clear()
    def start() = {
      val stream = spark.readStream.schema(frame(night1).schema).parquet(dir)
      AssemblyStream.conversationStream(stream).toDF()
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.as[AssemblyStream.FlaggedConvo].collect()
            .foreach(AssemblySpec.collectedConvos.add)
        }
        .option("checkpointLocation", ckpt)
        .start()
    }
    // stage 2 is watermark-free (see AssemblyStream.flagFirstSeen):
    // Spark's conservative stateful-after-stateful check must be
    // stood down for the composed single-query form
    val checkKey = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val prior = spark.conf.getOption(checkKey)
    spark.conf.set(checkKey, "false")
    try {
    val q = start()
    q.processAllAvailable() // night 1: nothing closes (all sessions open)
    frame(night2).write.mode("append").parquet(dir)
    q.processAllAvailable() // night 2: still nothing past the gap
    q.stop()
    val q2 = start()        // RESTART: open sessions must recover
    frame(night3).write.mode("append").parquet(dir)
    q2.processAllAvailable() // user 1's span-session closes (gap arrival)
    frame(sentinel).write.mode("append").parquet(dir)
    q2.processAllAvailable() // watermark advance: timeouts close the rest
    q2.stop()

    import scala.jdk.CollectionConverters._
    val got = AssemblySpec.collectedConvos.asScala.toSeq
      .filter(_.user_id >= 0)
    val batch = Assembly.conversations(frame(night1 ++ night2 ++ night3))
      .select("user_id", "session_id", "n_turns", "fp")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got.map(c => (c.user_id, c.session_id, c.n_turns, c.fp)).toSet == batch,
      "streamed conversations must equal the batch assembly row for row")
    assert(got.size == batch.size, "duplicate conversation emissions")
    // the span-session really spanned: user 1 session 1 has 3 turns
    // fed across two drops and a restart
    assert(got.exists(c => c.user_id == 1 && c.session_id == 1 && c.n_turns == 3))
    // keeper contract: exactly one first_seen per fingerprint, and the
    // fingerprint collision is non-vacuous
    val byFp = got.groupBy(_.fp)
    assert(byFp.exists(_._2.size > 1), "no fp collision — dedup not exercised")
    byFp.foreach { case (fp, cs) =>
      assert(cs.count(_.first_seen) == 1, s"fp $fp keeper count != 1")
    }
    assert(byFp.keySet == batch.map(_._4),
      "kept-fingerprint set must match the batch side")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(checkKey, v)
        case None    => spark.conf.unset(checkKey)
      }
    }
  }
}

object AssemblySpec {
  val collectedConvos =
    new java.util.concurrent.ConcurrentLinkedQueue[
      graft.streaming.AssemblyStream.FlaggedConvo]()
}
