package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.sources.Tables

/** Structured Streaming semantics (§2.8): streaming results must match
  * their batch twins, and stateful dedup must stop-on-seen across
  * micro-batches.
  */
object StreamingSpec {
  val collected = new java.util.concurrent.ConcurrentLinkedQueue[EventStreams.Keyed]()
  val collectedTtl = new java.util.concurrent.ConcurrentLinkedQueue[EventStreams.TimedKeyed]()
  val collectedPairs =
    new java.util.concurrent.ConcurrentLinkedQueue[graft.streaming.DedupStream.CandidatePair]()
  val collectedVecPairs =
    new java.util.concurrent.ConcurrentLinkedQueue[graft.streaming.EmbedStream.VerifiedPair]()
  val collectedPrunes =
    new java.util.concurrent.ConcurrentLinkedQueue[graft.streaming.SemanticStream.PruneEvent]()
  val collectedCdc =
    new java.util.concurrent.ConcurrentLinkedQueue[graft.streaming.CdcStream.ChangeEvent]()
  val collectedPostings =
    new java.util.concurrent.ConcurrentLinkedQueue[graft.streaming.IndexStream.PostingEvent]()
  val collectedKmv =
    new java.util.concurrent.ConcurrentLinkedQueue[graft.streaming.KmvStream.Estimate]()
  val collectedQuota =
    new java.util.concurrent.ConcurrentLinkedQueue[graft.streaming.QuotaStream.Admitted]()
  val collectedDrift =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()
  val collectedErPairs =
    new java.util.concurrent.ConcurrentLinkedQueue[graft.streaming.ErStream.MatchPair]()
  val collectedCurated =
    new java.util.concurrent.ConcurrentLinkedQueue[graft.streaming.CurationStream.CuratedDoc]()
  val collectedHist =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Long]()
  val collectedUrl =
    new java.util.concurrent.ConcurrentLinkedQueue[graft.streaming.UrlStream.Admitted]()
}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("streaming band rows are bit-equal to the batch store") {
    import graft.streaming.DedupStream
    val docs = Tables.documents(spark, sf("sf0.001"))
    val streamed = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().flatMap { case (id, t) => DedupStream.bandRowsOf(id, t) }
      .map(r => (r.doc_id, r.k, r.bv)).toSet
    val batch = graft.analytics.DedupOps.minhashBandStore(docs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(streamed == batch)
  }

  test("streaming near-dup candidates: incremental across batches, equal to the batch self-join") {
    import graft.streaming.DedupStream
    import graft.analytics.DedupOps
    val docs = Tables.documents(spark, sf("sf0.001"))
    val night1 = docs.filter($"doc_id" % 3 === 1)
    val night2 = docs.filter($"doc_id" % 3 === 2)
    val night3 = docs.filter($"doc_id" % 3 === 0)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val (n2Ids, n3Ids) = (ids(night2), ids(night3))

    val dir = tmp("graft-dedup-stream")
    val ckpt = tmp("graft-dedup-ckpt")
    night1.select($"doc_id", $"text").write.mode("overwrite").parquet(dir)
    // foreachBatch collector: the memory sink cannot recover from a
    // checkpoint, and checkpoint recovery is exactly what the restart
    // half of this test proves
    StreamingSpec.collectedPairs.clear()
    def start() = {
      val stream = spark.readStream
        .schema(night1.select($"doc_id", $"text").schema).parquet(dir)
        .as[DedupStream.Doc]
      DedupStream.streamingNearDupCandidates(stream).toDF()
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.as[DedupStream.CandidatePair].collect()
            .foreach(StreamingSpec.collectedPairs.add)
        }
        .option("checkpointLocation", ckpt)
        .start()
    }
    def pairsNow() = {
      import scala.jdk.CollectionConverters._
      StreamingSpec.collectedPairs.asScala.toSeq
    }
    // ONE long-running query: bucket state must survive from night 1
    // to night 2 (a fresh query without the checkpoint starts empty)
    val q = start()
    q.processAllAvailable() // night 1
    val afterN1 = pairsNow()
    assert(afterN1.forall(p =>
      !n2Ids(p.d1) && !n2Ids(p.d2) && !n3Ids(p.d1) && !n3Ids(p.d2)))
    // night 2 lands in the same directory; only delta-involving pairs may emit
    night2.select($"doc_id", $"text").write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()
    val all12 = pairsNow()
    val delta2 = all12.diff(afterN1)
    assert(delta2.nonEmpty, "fixture has no cross-batch near-dups — vacuous test")
    assert(delta2.forall(p => n2Ids(p.d1) || n2Ids(p.d2)),
      "a pair of two already-stored docs re-emitted: not O(delta)")
    // RESTART from the checkpoint (new query, new sink): the band
    // store must come back — a night-3 doc pairing with a night-1/2
    // doc can only happen through recovered bucket state
    night3.select($"doc_id", $"text").write.mode("append").parquet(dir)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val delta3 = pairsNow().diff(all12)
    assert(delta3.forall(p => n3Ids(p.d1) || n3Ids(p.d2)),
      "restart re-emitted stored-stored pairs: state or source log lost")
    assert(delta3.exists(p => !n3Ids(p.d1) || !n3Ids(p.d2)),
      "no night-3 × earlier pair after restart: bucket state did not recover")
    // union over all nights == the batch band self-join (dedup the
    // at-least-once per-shared-band emissions)
    val store = DedupOps.minhashBandStore(docs)
    val want = store.select($"k", $"bv", $"doc_id".as("d1"))
      .join(store.select($"k", $"bv", $"doc_id".as("d2")), Seq("k", "bv"))
      .filter($"d1" < $"d2").select("d1", "d2").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = (all12 ++ delta3).map(p => (p.d1, p.d2)).toSet
    assert(got == want)
    // and the oracled LSH pair list (q31) is the verified subset of these
    val lsh = DedupOps.minhashLshPairs(docs, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(got))
  }

  test("streaming near-dup bucket cap: saturated buckets stop pairing and growing") {
    import graft.streaming.DedupStream
    // four identical documents: every band bucket receives all four
    val docs = Seq.tabulate(4)(i =>
      (i + 1L, "the same boilerplate sentence repeated across documents"))
      .toDF("doc_id", "text")
    val dir = tmp("graft-capstream")
    val ckpt = tmp("graft-capstream-ckpt")
    docs.select($"doc_id", $"text").write.mode("overwrite").parquet(dir)
    def run(cap: Int, sink: String): Set[(Long, Long)] = {
      val stream = spark.readStream.schema(docs.schema).parquet(dir)
        .as[DedupStream.Doc]
      val q = DedupStream.streamingNearDupCandidates(stream, cap).toDF()
        .writeStream.outputMode("append").format("memory").queryName(sink)
        .option("checkpointLocation", s"$ckpt-$sink-$cap")
        .start()
      q.processAllAvailable(); q.stop()
      spark.table(sink).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // uncapped: all 6 pairs of 4 identical docs
    assert(run(Int.MaxValue, "cap_off") ==
      (for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b)).toSet)
    // cap 2: buckets saturate after ids 1,2 — only (1,2) emits; ids
    // 3,4 neither pair nor grow the state
    assert(run(2, "cap_on") == Set((1L, 2L)))
  }

  test("streaming bucket ids are bit-equal to the batch embed bucket store") {
    import graft.streaming.EmbedStream
    import graft.analytics.Similarity
    val vecs = Tables.embeddings(spark, sf("sf0.001"))
    val planes = Similarity.planeWeights(6, 64)
    val streamed = vecs.select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().map { case (id, e) => (id, EmbedStream.bucketOf(e, planes)) }.toSet
    val batch = Similarity.embedBucketStore(vecs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
  }

  test("streaming embedding near-dup: verified pairs equal the batch LSH recompute, O(delta) across batches") {
    import graft.streaming.EmbedStream
    import graft.analytics.Similarity
    val vecs = Tables.embeddings(spark, sf("sf0.001"))
      .select($"vec_id", $"embedding")
    // the sf0.001 corpus has exactly two LSH pairs at 0.45 —
    // (45, 237) and (352, 411). The %5 split: 45 (≡ 0) arrives in
    // night 1; 237 and 352 (both ≡ 2) in night 2, completing the
    // first pair; 411 (≡ 1) in night 3, completing the second pair
    // against 352's NIGHT-2 state ACROSS the checkpoint restart
    val night1 = vecs.filter($"vec_id" % 5 =!= 1 && $"vec_id" % 5 =!= 2)
    val night2 = vecs.filter($"vec_id" % 5 === 2)
    val night3 = vecs.filter($"vec_id" % 5 === 1)
    def idsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val (n2Ids, n3Ids) = (idsOf(night2), idsOf(night3))
    val dir = tmp("graft-embstream")
    val ckpt = tmp("graft-embstream-ckpt")
    night1.write.mode("overwrite").parquet(dir)
    StreamingSpec.collectedVecPairs.clear()
    def start() = {
      val stream = spark.readStream.schema(night1.schema).parquet(dir)
        .as[EmbedStream.Vec]
      EmbedStream.streamingNearDupPairs(stream, 0.45).toDF()
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.as[EmbedStream.VerifiedPair].collect()
            .foreach(StreamingSpec.collectedVecPairs.add)
        }
        .option("checkpointLocation", ckpt)
        .start()
    }
    def pairsNow() = {
      import scala.jdk.CollectionConverters._
      StreamingSpec.collectedVecPairs.asScala.toSeq
    }
    // ONE long-running query: bucket state must survive night 1 → 2
    val q = start()
    q.processAllAvailable() // night 1
    val after1 = pairsNow()
    assert(after1.forall(p =>
      !n2Ids(p.v1) && !n2Ids(p.v2) && !n3Ids(p.v1) && !n3Ids(p.v2)))
    night2.write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()
    val all12 = pairsNow()
    val delta2 = all12.diff(after1)
    assert(delta2.nonEmpty, "fixture has no cross-batch near-dups — vacuous test")
    assert(delta2.forall(p => n2Ids(p.v1) || n2Ids(p.v2)),
      "a pair of two already-stored vectors re-emitted: not O(delta)")
    // RESTART from the checkpoint (new query, same sink): bucket state
    // — including the member VECTORS the in-stream verify needs —
    // must come back; a night-3 × earlier pair can only form through
    // recovered state
    night3.write.mode("append").parquet(dir)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val all = pairsNow()
    val delta3 = all.diff(all12)
    assert(delta3.forall(p => n3Ids(p.v1) || n3Ids(p.v2)),
      "restart re-emitted stored-stored pairs: state or source log lost")
    assert(delta3.exists(p => !n3Ids(p.v1) || !n3Ids(p.v2)),
      "no night-3 × earlier pair after restart: bucket state did not recover")
    // union over all nights == the batch recompute, SIMS INCLUDED
    // (in-stream verify must be bit-equal to the batch verify column)
    val want = Similarity.cosineNearDupPairsLsh(vecs, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = all.map(p => (p.v1, p.v2, p.sim)).toSet
    assert(got == want)
    assert(all.size == got.size, "duplicate emissions on a clean run")
  }

  test("streaming semantic cell assignment is bit-equal to the batch kmeansAssign") {
    import graft.streaming.SemanticStream
    import graft.analytics.Similarity
    val vecs = Tables.embeddings(spark, sf("sf0.001"))
    val cent = Similarity.kmeansCentroids(vecs, 16, 1)
    val quant = Similarity.frozenQuantizer(cent)
    val streamed = vecs.select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().map { case (id, e) => (id, SemanticStream.cellOf(e, quant)) }.toSet
    val batch = Similarity.kmeansAssign(vecs, cent)
      .select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
  }

  test("streaming semantic dedup: keepers equal batch SemDeDup across nights + restart") {
    import graft.streaming.SemanticStream
    import graft.analytics.Similarity
    val tau = 0.3
    val vecs = Tables.embeddings(spark, sf("sf0.001"))
      .select($"vec_id", $"embedding")
    val cent = Similarity.kmeansCentroids(vecs, 16, 1)
    val quant = Similarity.frozenQuantizer(cent)
    // %5 split interleaves ids, so LOWER-id vectors arrive in nights 2
    // and 3 AFTER higher-id cellmates — the retroactive-prune path
    // (monotonicity) and the checkpoint restart are both on the line
    val night1 = vecs.filter($"vec_id" % 5 =!= 1 && $"vec_id" % 5 =!= 2)
    val night2 = vecs.filter($"vec_id" % 5 === 2)
    val night3 = vecs.filter($"vec_id" % 5 === 1)
    def idsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val (n2Ids, n3Ids) = (idsOf(night2), idsOf(night3))
    val dir = tmp("graft-semstream")
    val ckpt = tmp("graft-semstream-ckpt")
    night1.write.mode("overwrite").parquet(dir)
    StreamingSpec.collectedPrunes.clear()
    def start() = {
      val stream = spark.readStream.schema(night1.schema).parquet(dir)
        .as[SemanticStream.Vec]
      SemanticStream.streamingSemanticPrunes(stream, quant, tau).toDF()
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.as[SemanticStream.PruneEvent].collect()
            .foreach(StreamingSpec.collectedPrunes.add)
        }
        .option("checkpointLocation", ckpt)
        .start()
    }
    def eventsNow() = {
      import scala.jdk.CollectionConverters._
      StreamingSpec.collectedPrunes.asScala.toSeq
    }
    val q = start()
    q.processAllAvailable() // night 1
    val after1 = eventsNow()
    night2.write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()
    val all12 = eventsNow()
    // O(delta): every night-2 event is caused by a night-2 arrival —
    // either the arrival is pruned or it retro-prunes a stored member
    val delta2 = all12.diff(after1)
    assert(delta2.forall(e => n2Ids(e.vec_id) || n2Ids(e.pruned_by)),
      "a night-2 event touched no night-2 vector: state rescan, not O(delta)")
    // restart from the checkpoint: cell state (members + pruned flags)
    // must recover — night-3 lower ids retro-prune night-1/2 members
    night3.write.mode("append").parquet(dir)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val all = eventsNow()
    assert(all.map(_.vec_id).distinct.size == all.size,
      "a vector was pruned twice: pruned flags lost (restart or batch bug)")
    // every witness is a genuinely lower-id cellmate at >= tau
    all.foreach { e =>
      assert(e.pruned_by < e.vec_id && e.sim >= tau, e.toString)
    }
    // the retro path must be non-vacuous on this fixture: some event's
    // pruner arrived in a LATER night than its victim
    val nightOf = (id: Long) => if (n3Ids(id)) 3 else if (n2Ids(id)) 2 else 1
    assert(all.exists(e => nightOf(e.pruned_by) > nightOf(e.vec_id)),
      "no retroactive prune exercised — fixture vacuous for the monotone path")
    // final keepers == batch SemDeDup over the union of all nights
    val prunedStream = all.map(_.vec_id).toSet
    val batchVerdict = Similarity.semanticDedup(vecs, cent, tau)
    val prunedBatch = batchVerdict.filter(!$"kept").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    Similarity.releaseRetained(spark)
    assert(prunedStream == prunedBatch,
      s"stream pruned ${prunedStream.size}, batch ${prunedBatch.size}")
    assert(prunedStream.nonEmpty, "fixture prunes nothing — vacuous")
  }

  test("streaming CDC apply: folded events equal batch applyChangelog across nights + restart") {
    import graft.streaming.CdcStream
    import graft.streaming.CdcStream.{Change, ChangeEvent}
    import graft.ops.Cdc
    val snapshot = (0L to 9L).map(k => (k, s"snap$k"))
    val night1 = Seq(
      Change(3L, 10L, "U", "v1"),
      Change(3L, 12L, "U", "v2"),   // same-batch collapse: ONE event, "v2"
      Change(5L, 11L, "D", ""),
      Change(20L, 13L, "I", "new20"))
    val night2 = Seq(
      Change(3L, 11L, "U", "late"), // below stored seq 12 → absorbed, no event
      Change(20L, 14L, "D", ""),    // delete after insert
      Change(5L, 15L, "I", "re5"),  // re-insert after delete
      Change(7L, 16L, "U", "v7"))
    val dir = tmp("graft-cdc-in"); val ckpt = tmp("graft-cdc-ck")
    val prime = snapshot.map { case (k, p) => CdcStream.snapshotChange(k, p) }
    StreamingSpec.collectedCdc.clear()
    (prime ++ night1).toDS().write.mode("overwrite").parquet(dir)
    def start() = {
      val st = spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[Change].schema)
        .parquet(dir).as[Change]
      CdcStream.currentEvents(st).toDF()
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.as[ChangeEvent].collect().foreach(StreamingSpec.collectedCdc.add)
        }
        .option("checkpointLocation", ckpt).start()
    }
    val q = start(); q.processAllAvailable(); q.stop()
    import scala.jdk.CollectionConverters._
    val after1 = StreamingSpec.collectedCdc.asScala.toSeq
    assert(after1.count(_.key == 3L) == 1 &&
      after1.find(_.key == 3L).get.payload == "v2",
      "same-batch changes must collapse to the single batch-max event")
    // key 5: prime + same-batch delete net to "was absent, still
    // absent" — a no-op, so NOTHING is emitted (state still records
    // the delete's seq, proven by the night-2 re-insert below)
    assert(!after1.exists(_.key == 5L),
      "absent→absent must not emit")
    // restart from checkpoint, then night 2 PLUS a full replay of
    // night 1 (at-least-once source): replays must emit nothing
    val q2 = start()
    (night2 ++ night1).toDS().write.mode("append").parquet(dir)
    q2.processAllAvailable(); q2.stop()
    val all = StreamingSpec.collectedCdc.asScala.toSeq
    val delta = all.diff(after1)
    assert(!delta.exists(_.key == 3L),
      "late/replayed change re-emitted: state lost across restart")
    // fold the emitted events per key → current serving table; the
    // fold uses the operator's full (seq, op, payload) order so a
    // duplicate-seq fixture would resolve like the contract, not by
    // encounter order
    val current = all.groupBy(_.key)
      .map { case (k, es) => k -> es.maxBy(e => (e.seq, e.op, e.payload)) }
      .collect { case (k, e) if e.op != "D" => k -> e.payload }
    // batch twin over snapshot + ALL changes (duplicates included —
    // the batch operator is replay-idempotent too)
    val batch = Cdc.applyChangelog(
        snapshot.toDF("key", "payload"),
        (night1 ++ night2 ++ night1).toDS().toDF(),
        "key", "seq", "op", Seq("payload"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(current == batch, s"stream $current vs batch $batch")
    assert(batch(5L) == "re5" && batch(7L) == "v7" && !batch.contains(20L),
      "fixture did not exercise delete/re-insert/late paths")
  }

  test("streaming inverted index: state-built postings equal batch buildIndex across nights + restart; BM25 serves from the accumulated index") {
    import graft.streaming.IndexStream
    import graft.streaming.IndexStream.{Doc, PostingEvent}
    import graft.analytics.Retrieval
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select($"doc_id", $"text").as[Doc].collect().toSeq
    val night1 = docs.filter(_.doc_id % 3 != 2)
    val night2 = docs.filter(_.doc_id % 3 == 2)
    val dir = tmp("graft-idx-in"); val ckpt = tmp("graft-idx-ck")
    StreamingSpec.collectedPostings.clear()
    night1.toDS().write.mode("overwrite").parquet(dir)
    def start() = {
      val st = spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[Doc].schema)
        .parquet(dir).as[Doc]
      IndexStream.streamingIndex(st).toDF()
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.as[PostingEvent].collect().foreach(StreamingSpec.collectedPostings.add)
        }
        .option("checkpointLocation", ckpt).start()
    }
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    import scala.jdk.CollectionConverters._
    val after1 = StreamingSpec.collectedPostings.asScala.toSeq
    // restart from checkpoint; night 2 arrives PLUS a full replay of
    // night 1 (at-least-once source) — replays must emit nothing
    val q2 = start()
    (night2 ++ night1).toDS().write.mode("append").parquet(dir)
    q2.processAllAvailable(); q2.stop()
    val events = StreamingSpec.collectedPostings.asScala.toSeq
    val streamed = events.map(e => (e.term, e.doc_id, e.dl, e.tf)).toSet
    assert(events.size == streamed.size,
      "replayed documents re-emitted postings: per-term state lost across restart")
    // the accumulated events ARE the batch index over the union
    val union = docs.toDS().toDF()
    val batchIdx = Retrieval.buildIndex(union).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(streamed == batchIdx,
      s"stream index ${streamed.size} rows vs batch ${batchIdx.size}")
    // "arrivals update df": each term's highest emitted df equals the
    // term's final df in the batch index, and night-1 emissions carry
    // the smaller night-1 df (the state genuinely grew)
    val finalDf = batchIdx.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val maxDf = events.groupBy(_.term).view.mapValues(_.map(_.df).max).toMap
    assert(maxDf == finalDf.filter { case (t, _) => maxDf.contains(t) } && maxDf.keySet == finalDf.keySet)
    val df1 = Retrieval.buildIndex(night1.toDS().toDF()).collect()
      .map(r => r.getString(0)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val maxDf1 = after1.groupBy(_.term).view.mapValues(_.map(_.df).max).toMap
    assert(maxDf1 == df1, "night-1 df emissions must reflect only night-1 state")
    // BM25 served from the accumulated event sink == batch retrieve
    // over the union corpus (rank-exact, scores included)
    val grid = Seq((1L, "scan"), (1L, "window"), (2L, "join"), (2L, "merge"))
      .toDF("query_id", "term")
    val idxDf = events.map(e => (e.term, e.doc_id, e.dl, e.tf))
      .toDF("term", "doc_id", "dl", "tf")
    val (n, tok) = Retrieval.corpusTokenStats(union)
    val served = Retrieval.bm25TopKFromIndex(idxDf, n, tok.toDouble / n, grid, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val direct = Retrieval.bm25TopK(union, grid, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(served == direct && served.nonEmpty,
      "BM25 from the stream-maintained index must match the direct retrieve")
  }

  test("streaming CDC tolerates null payloads like the batch twin") {
    import graft.streaming.CdcStream
    import graft.streaming.CdcStream.{Change, ChangeEvent}
    import graft.ops.Cdc
    // the batch twin's max(struct(...)) election orders null fields
    // smallest and never crashes; the stream's changeOrd must match —
    // a raw getBytes NPE here breaks the stream≡batch contract
    val snapshot = Seq((5L, "s5"))
    val changes = Seq(
      Change(1L, 10L, "U", null),                              // null-payload upsert
      Change(2L, 10L, "U", null), Change(2L, 10L, "U", "x"),   // same-seq tie: "x" beats null
      Change(3L, 10L, "D", null))                              // delete of an absent key
    val dir = tmp("graft-cdcnull-in"); val ckpt = tmp("graft-cdcnull-ck")
    StreamingSpec.collectedCdc.clear()
    val prime = snapshot.map { case (k, p) => CdcStream.snapshotChange(k, p) }
    (prime ++ changes).toDS().write.mode("overwrite").parquet(dir)
    val st = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[Change].schema)
      .parquet(dir).as[Change]
    val q = CdcStream.currentEvents(st).toDF()
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.as[ChangeEvent].collect().foreach(StreamingSpec.collectedCdc.add)
      }
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable(); q.stop()
    import scala.jdk.CollectionConverters._
    val events = StreamingSpec.collectedCdc.asScala.toSeq
    assert(events.groupBy(_.key).forall(_._2.size == 1), events.toString)
    val current = events.collect { case e if e.op != "D" => e.key -> e.payload }.toMap
    val batch = Cdc.applyChangelog(
        snapshot.toDF("key", "payload"), changes.toDS().toDF(),
        "key", "seq", "op", Seq("payload"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(current == batch, s"stream $current vs batch $batch")
    assert(current.get(1L).contains(null) && current(2L) == "x" &&
      !current.contains(3L) && current(5L) == "s5", current.toString)
  }

  test("streaming Hamming dedup: image pHash pairs equal batch banding across nights + restart") {
    import graft.streaming.HammingStream
    import graft.multimodal.Multimodal
    val docs = Tables.documents(spark, sf("sf0.001"))
    val sigs = Multimodal.perceptualHashes(Multimodal.syntheticPngClasses(docs))
    // pack the two 32-bit words into the stream's 128-bit container:
    // xor/bit_count are split-invariant, so Hamming values are
    // bit-equal to the batch two-word spelling
    val packed = sigs.selectExpr("media_id", "CAST(0 AS LONG) AS hi",
      "ph_lo | shiftleft(ph_hi, 32) AS lo")
    val dir = tmp("graft-hamstream")
    val ckpt = tmp("graft-hamstream-ckpt")
    val night1 = packed.filter($"media_id" % 3 =!= 0)
    val night2 = packed.filter($"media_id" % 3 === 0)
    val n2Ids = night2.select("media_id").collect().map(_.getLong(0)).toSet
    night1.write.mode("overwrite").parquet(dir)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    def start() = {
      val stream = spark.readStream.schema(packed.schema).parquet(dir)
        .as[HammingStream.Sig]
      HammingStream.streamingNearDupPairs(stream, 8, 8, 6).toDF()
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r =>
            got.add((r.getLong(0), r.getLong(1), r.getLong(2)))): Unit
        }
        .option("checkpointLocation", ckpt)
        .start()
    }
    val q = start()
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    val after1 = got.asScala.toSeq
    // restart from the checkpoint for night 2: bucket state recovers
    night2.write.mode("append").parquet(dir)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val all = got.asScala.toSeq
    val delta2 = all.diff(after1)
    assert(delta2.forall(p => n2Ids(p._1) || n2Ids(p._2)),
      "restart re-emitted stored-stored pairs: O(delta)/state lost")
    assert(delta2.exists(p => !n2Ids(p._1) || !n2Ids(p._2)),
      "no night-2 x night-1 pair: bucket state did not recover")
    // exactly-once on a clean run (the first-shared-band rule replaces
    // the batch distinct())
    assert(all.size == all.toSet.size, "duplicate pair emissions")
    val want = Multimodal.phashNearDupPairs(sigs, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(all.toSet == want, s"stream ${all.size} vs batch ${want.size}")
    assert(want.nonEmpty)
  }

  test("streaming Hamming dedup: audio fingerprint twin (4x8) and saturation cap") {
    import graft.streaming.HammingStream
    import graft.multimodal.Multimodal
    val docs = Tables.documents(spark, sf("sf0.001"))
    val fps = Multimodal.audioFingerprints(Multimodal.syntheticWavClasses(docs))
    val packed = fps.selectExpr("media_id", "CAST(0 AS LONG) AS hi", "fp AS lo")
    val dir = tmp("graft-hamstream-au")
    packed.write.mode("overwrite").parquet(dir)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    val stream = spark.readStream.schema(packed.schema).parquet(dir)
      .as[HammingStream.Sig]
    val q = HammingStream.streamingNearDupPairs(stream, 4, 8, 3).toDF()
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r =>
          got.add((r.getLong(0), r.getLong(1), r.getLong(2)))): Unit
      }
      .option("checkpointLocation", tmp("graft-hamstream-au-ckpt"))
      .start()
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    val all = got.asScala.toSeq
    assert(all.size == all.toSet.size, "duplicate pair emissions")
    val want = Multimodal.audioNearDupPairs(fps, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(all.toSet == want && want.nonEmpty)

    // saturation cap: four identical signatures collapse into the
    // same buckets; cap=2 latches on the third arrival, so only the
    // first pair ever emits
    val capDir = tmp("graft-hamstream-cap")
    Seq((1L, 0L, 5L), (2L, 0L, 5L), (3L, 0L, 5L), (4L, 0L, 5L))
      .toDF("media_id", "hi", "lo").write.mode("overwrite").parquet(capDir)
    val got2 = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    val q2 = HammingStream.streamingNearDupPairs(
        spark.readStream.schema(packed.schema).parquet(capDir)
          .as[HammingStream.Sig], 4, 8, 3, maxBucketIds = 2).toDF()
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r =>
          got2.add((r.getLong(0), r.getLong(1), r.getLong(2)))): Unit
      }
      .option("checkpointLocation", tmp("graft-hamstream-cap-ckpt"))
      .start()
    q2.processAllAvailable()
    q2.stop()
    assert(got2.asScala.toSet == Set((1L, 2L, 0L)),
      s"cap must stop pairing at saturation: ${got2.asScala.toSeq}")
  }

  test("streaming Hamming dedup: video temporal twin (16x8) fills the full 128-bit container") {
    import graft.streaming.HammingStream
    import graft.multimodal.Multimodal
    val docs = Tables.documents(spark, sf("sf0.001"))
    val sigs = Multimodal.videoSignatures(Multimodal.syntheticMp4Classes(docs))
    // four 32-bit words pack the container FULL — the first twin whose
    // hi word is nonzero, so bandOf's off >= 64 branch and the hi-side
    // xor both run for real (w3 can set hi's sign bit; >>> handles it)
    val packed = sigs.selectExpr("media_id",
      "w2 | shiftleft(w3, 32) AS hi", "w0 | shiftleft(w1, 32) AS lo")
    val dir = tmp("graft-hamstream-vid")
    packed.write.mode("overwrite").parquet(dir)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    val stream = spark.readStream.schema(packed.schema).parquet(dir)
      .as[HammingStream.Sig]
    val q = HammingStream.streamingNearDupPairs(stream, 16, 8, 10).toDF()
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r =>
          got.add((r.getLong(0), r.getLong(1), r.getLong(2)))): Unit
      }
      .option("checkpointLocation", tmp("graft-hamstream-vid-ckpt"))
      .start()
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    val all = got.asScala.toSeq
    assert(all.size == all.toSet.size, "duplicate pair emissions")
    val want = Multimodal.videoNearDupPairs(sigs, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(all.toSet == want, s"stream ${all.size} vs batch ${want.size}")
    assert(want.nonEmpty)
  }

  test("streaming semantic dedup cap: saturated cells stop pairing and growing") {
    import graft.streaming.SemanticStream
    // identical embeddings collapse into one cell of a 1-centroid
    // quantizer; cap=2 latches on the third arrival
    val e = Array.fill(64)(0.5f)
    val quant = Array((0L, Array.fill(64)(0.5), math.sqrt(16.0)))
    val docs = Seq.tabulate(4)(i => (i + 1L, e)).toDF("vec_id", "embedding")
    val dir = tmp("graft-semcap")
    docs.write.mode("overwrite").parquet(dir)
    StreamingSpec.collectedPrunes.clear()
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
      .as[SemanticStream.Vec]
    val q = SemanticStream.streamingSemanticPrunes(stream, quant, 0.9, maxCellIds = 2)
      .toDF()
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.as[SemanticStream.PruneEvent].collect()
          .foreach(StreamingSpec.collectedPrunes.add)
      }
      .option("checkpointLocation", tmp("graft-semcap-ckpt"))
      .start()
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    val events = StreamingSpec.collectedPrunes.asScala.toSeq
    // ids 1,2 stored (2 pruned by 1 at sim 1.0); 3 latches the cap; 4 blocked
    assert(events.map(e => (e.vec_id, e.pruned_by, e.sim)).toSet ==
      Set((2L, 1L, 1.0)),
      s"cap must stop pairing at saturation: $events")
  }

  test("streaming embedding near-dup cap: saturated buckets stop pairing and growing") {
    import graft.streaming.EmbedStream
    // four identical embeddings collapse into ONE bucket; 0.5f keeps
    // sqrt(na)*sqrt(nb) == na exact (na = 16.0), so sim is exactly 1.0
    val e = Array.fill(64)(0.5f)
    val docs = Seq.tabulate(4)(i => (i + 1L, e)).toDF("vec_id", "embedding")
    val dir = tmp("graft-embcap")
    val ckpt = tmp("graft-embcap-ckpt")
    docs.write.mode("overwrite").parquet(dir)
    def run(cap: Int, sink: String): Set[(Long, Long, Double)] = {
      val stream = spark.readStream.schema(docs.schema).parquet(dir)
        .as[EmbedStream.Vec]
      val q = EmbedStream.streamingNearDupPairs(stream, 0.9, maxBucketIds = cap)
        .toDF()
        .writeStream.outputMode("append").format("memory").queryName(sink)
        .option("checkpointLocation", s"$ckpt-$sink-$cap")
        .start()
      q.processAllAvailable(); q.stop()
      spark.table(sink).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    assert(run(Int.MaxValue, "vcap_off") ==
      (for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b, 1.0)).toSet)
    // cap 2: the bucket saturates after ids 1,2 — ids 3,4 neither
    // pair nor grow the state
    assert(run(2, "vcap_on") == Set((1L, 2L, 1.0)))
  }

  test("streaming embedding near-dup drops a null embedding instead of dying") {
    import graft.streaming.EmbedStream
    // a poison row must not kill the long-running query (the batch
    // path filters it via the null VecDot sim; the stream must too)
    val rows = Seq(
      (1L, Option(Array.fill(64)(0.5f))),
      (2L, Option.empty[Array[Float]]),
      (3L, Option(Array.fill(64)(0.5f))))
      .toDF("vec_id", "embedding")
    val dir = tmp("graft-embnull")
    rows.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(rows.schema).parquet(dir)
      .as[EmbedStream.Vec]
    val q = EmbedStream.streamingNearDupPairs(stream, 0.9).toDF()
      .writeStream.outputMode("append").format("memory").queryName("embnull")
      .option("checkpointLocation", tmp("graft-embnull-ckpt"))
      .start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("embnull").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet ==
      Set((1L, 3L, 1.0)))
  }

  test("streaming state compaction: drops evict non-keepers, arrivals pair with keepers only, state rows shrink") {
    import graft.streaming.DedupStream
    import graft.analytics.DedupOps
    // deterministic fixture (sha-based bands are stable): docs 1,2
    // identical; doc 3 a one-word mutation (jaccard 0.7778, shares
    // bands 1,3 with the base but OWNS bands 0,2 — dropping it must
    // empty those bucket rows); doc 4 unrelated
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val mut = "alpha beta gamma delta epsilon zeta eta theta iota omega"
    val other = "completely different unrelated text body appears here today"
    val night1 = Seq((1L, base, false), (2L, base, false),
      (3L, mut, false), (4L, other, false)).toDF("doc_id", "text", "drop")
    val dir = tmp("graft-compact-stream")
    val q = DedupStream.streamingNearDupCandidatesOps(
        spark.readStream.schema(night1.schema).parquet(dir)
          .as[DedupStream.DocOp]).toDF()
      .writeStream.outputMode("append").format("memory").queryName("compact_t")
      .option("checkpointLocation", tmp("graft-compact-ckpt"))
      .start()
    night1.write.mode("overwrite").parquet(dir)
    q.processAllAvailable()
    def pairs() = spark.table("compact_t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def stateRows() = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    val p1 = pairs()
    assert(p1 == Set((1L, 2L), (1L, 3L), (2L, 3L)), p1.toString)
    val rows1 = stateRows()
    // the compaction batch: the cluster's non-keepers (2, 3) are
    // dropped — the streaming analog of compactBandStore's anti-join
    Seq((2L, base, true), (3L, mut, true)).toDF("doc_id", "text", "drop")
      .write.mode("append").parquet(dir)
    q.processAllAvailable()
    assert(pairs() == p1, "a compaction batch must emit no candidates")
    val rows2 = stateRows()
    assert(rows2 < rows1,
      s"evicting doc 3 must remove its solely-owned bucket rows ($rows1 -> $rows2)")
    // night 2: a new member of the same cluster arrives — it must meet
    // the KEEPER only (transitivity makes that sound, q108's argument)
    Seq((6L, base, false)).toDF("doc_id", "text", "drop")
      .write.mode("append").parquet(dir)
    q.processAllAvailable(); q.stop()
    val delta = pairs().diff(p1)
    assert(delta == Set((1L, 6L)), s"arrival must pair with keeper only: $delta")
    // candidate parity with the batch nightly: probing the COMPACTED
    // band store with doc 6's band rows yields the same candidate set
    val docsBatch = Seq((1L, base), (2L, base), (3L, mut), (4L, other))
      .toDF("doc_id", "text")
    val compacted = DedupOps.compactBandStore(
      DedupOps.minhashBandStore(docsBatch),
      DedupOps.nearDupComponents(DedupOps.minhashLshPairs(docsBatch, 0.6)))
    val probe = DedupStream.bandRowsOf(6L, base).toDF()
    val batchCands = probe.select($"k", $"bv")
      .join(compacted, Seq("k", "bv"))
      .select($"doc_id").distinct()
      .collect().map(r => (r.getLong(0), 6L)).toSet
    assert(batchCands == delta,
      s"stream-after-compaction must match the compacted batch store: $batchCands vs $delta")
  }

  test("streaming embedding compaction: eviction empties bucket state and stops pairing") {
    import graft.streaming.EmbedStream
    val e = Array.fill(64)(0.5f)
    val ops1 = Seq((1L, e, false), (2L, e, false)).toDF("vec_id", "embedding", "drop")
    val dir = tmp("graft-embcompact")
    val q = EmbedStream.streamingNearDupPairsOps(
        spark.readStream.schema(ops1.schema).parquet(dir)
          .as[EmbedStream.VecOp], 0.9).toDF()
      .writeStream.outputMode("append").format("memory").queryName("compact_v")
      .option("checkpointLocation", tmp("graft-embcompact-ckpt"))
      .start()
    ops1.write.mode("overwrite").parquet(dir)
    q.processAllAvailable()
    def vpairs() = spark.table("compact_v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def stateRows() = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    assert(vpairs() == Set((1L, 2L, 1.0)))
    val rows1 = stateRows()
    assert(rows1 >= 1)
    // evict the whole retired bucket (both members): its state row
    // must disappear, and a later identical arrival finds nobody
    Seq((1L, e, true), (2L, e, true)).toDF("vec_id", "embedding", "drop")
      .write.mode("append").parquet(dir)
    q.processAllAvailable()
    assert(stateRows() < rows1,
      s"emptied bucket must remove its state row (${stateRows()} vs $rows1)")
    Seq((3L, e, false)).toDF("vec_id", "embedding", "drop")
      .write.mode("append").parquet(dir)
    q.processAllAvailable(); q.stop()
    assert(vpairs() == Set((1L, 2L, 1.0)),
      "an arrival after full eviction must find no partner")
  }

  test("ST1 streaming hourly rollup over file source matches batch result") {
    val events = Tables.events(spark, sf("sf0.001"))
    // batch twin
    val want = EventStreams.hourlyRollup(events)
      .orderBy("hour", "event_type").collect().toSeq
    // stream the same rows from parquet files
    val dir = tmp("graft-stream-in")
    events.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(events.schema).parquet(dir)
    // complete mode: append would hold back windows the watermark has
    // not closed at end-of-stream
    EventStreams.runToMemory(EventStreams.hourlyRollup(stream), "hourly_out", "complete")
    val got = spark.table("hourly_out").orderBy("hour", "event_type").collect().toSeq
    assert(got == want)
  }

  test("streaming rate anomaly: flags equal the batch rule under frozen stats") {
    import graft.ops.Exact
    val ev = Tables.events(spark, sf("sf0.01"))
    val h = ev.groupBy($"event_type",
        date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss").as("hour"))
      .agg(count(lit(1)).as("cnt"))
    // frozen stats: one batch pass over history, shared by both sides
    val stats = h.groupBy($"event_type").agg(
      Exact.davg($"cnt".cast("double")).as("mean"),
      Exact.dstddev($"cnt".cast("double")).as("sd"))
    val want = h.join(stats, Seq("event_type"))
      .filter($"cnt".cast("double") > $"mean" + lit(3.0) * $"sd")
      .select($"hour", $"event_type", $"cnt")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val dir = tmp("graft-anom-in")
    ev.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(ev.schema).parquet(dir)
    EventStreams.runToMemory(
      EventStreams.rateAnomalyFlags(stream, stats), "anom_out", "complete")
    val got = spark.table("anom_out").select("hour", "event_type", "cnt")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want, s"stream ${got.size} flags vs batch ${want.size}")
    assert(want.nonEmpty, "fixture flags nothing — vacuous")
  }

  test("streaming quantile-histogram sketch: bin-count state merges across batches ≡ batch histogram") {
    // q120's mergeable sketch IS streaming-shaped: the (bin, cnt) rows
    // are the aggregation state, and each micro-batch's arrivals merge by
    // vector add — same contract, no rescan of prior batches. Two
    // drops into ONE running query (state lives per query).
    val W = 8.0
    val events = Tables.events(spark, sf("sf0.001")).filter(col("value").isNotNull)
    val a = events.filter(col("event_id") % 2 === 0)
    val b = events.filter(col("event_id") % 2 =!= 0)
    val dir = tmp("graft-sketch-in")
    a.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(events.schema).parquet(dir)
      .filter(col("value").isNotNull)
    val q = stream
      .groupBy(floor(col("value") / W).cast("long").as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("sketch_out").start()
    q.processAllAvailable() // night 1: sketch of a
    val night1 = spark.table("sketch_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    b.write.mode("append").parquet(dir)
    q.processAllAvailable() // night 2: b's arrivals merge into the state
    val got = spark.table("sketch_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    q.stop()
    def batchSketch(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(floor(col("value") / W).cast("long").as("bin"))
        .agg(count(lit(1)).cast("long").as("cnt")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(night1 == batchSketch(a), "night-1 state ≡ batch sketch of a")
    assert(got == batchSketch(events),
      "merged streaming state ≡ the full-corpus batch histogram")
    assert(night1 != got, "night 2 must actually have merged new rows")
  }

  test("sliding windows: streaming rollup matches the q21 batch grid") {
    val events = Tables.events(spark, sf("sf0.001"))
    val dir = tmp("graft-slide-in")
    events.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(events.schema).parquet(dir)
    EventStreams.runToMemory(EventStreams.slidingRollup(stream), "slide_out", "complete")
    val got = spark.table("slide_out")
      .orderBy("win_start").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    // batch twin: q21's arithmetic window construction
    val want = SparkEntry.queries("q21_sliding_window")(spark, sf("sf0.001"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want) // native window() and the arithmetic grid agree
  }

  test("session windows: streaming session rollup completes and bounds sessions") {
    val events = Tables.events(spark, sf("sf0.001"))
    val dir = tmp("graft-sess-in")
    events.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(events.schema).parquet(dir)
    EventStreams.runToMemory(EventStreams.sessionRollup(stream), "sess_out")
    val got = spark.table("sess_out")
    assert(got.count() > 0)
    // every (user, session) is disjoint in time per user: no more
    // sessions than events
    assert(got.count() <= events.count())
  }

  test("ST1+K3 end-to-end: file stream -> validate -> foreachBatch HTTP delivery") {
    import graft.sinks.HttpSink
    val events = Tables.events(spark, sf("sf0.001")).limit(50)
    val dir = tmp("graft-e2e-in")
    events.write.mode("overwrite").parquet(dir)
    HttpSink.RecordingTransport.clear()
    val transport = new HttpSink.RecordingTransport()
    val stream = spark.readStream.schema(events.schema).parquet(dir)
      .filter(col("value").isNotNull && col("event_type").isin("click", "purchase"))
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", tmp("graft-e2e-ck"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        HttpSink.deliver(batch.toDF(), "http://api.test/events", "event_id", transport).count()
        ()
      }
      .start()
    q.awaitTermination()
    val expected = events.filter(col("value").isNotNull &&
      col("event_type").isin("click", "purchase")).count()
    assert(HttpSink.RecordingTransport.delivered.size() == expected)
    assert(expected > 0)
  }

  test("runAvailableNow delivers every micro-batch to the sink exactly once per run") {
    val events = Tables.events(spark, sf("sf0.001")).limit(20)
    val dir = tmp("graft-ran-in")
    events.write.mode("overwrite").parquet(dir)
    val seen = new java.util.concurrent.atomic.AtomicLong()
    val stream = spark.readStream.schema(events.schema).parquet(dir)
    EventStreams.runAvailableNow(stream, tmp("graft-ran-ck")) { (batch, _) =>
      seen.addAndGet(batch.count()); ()
    }
    assert(seen.get() == 20)
  }

  test("dropDuplicatesWithinWatermark: in-window duplicates collapse") {
    val dir = tmp("graft-wmdedup-in")
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    Seq((1L, "a", t("2024-01-01 10:00:00")), (2L, "a", t("2024-01-01 10:05:00")),
        (3L, "b", t("2024-01-01 10:06:00")))
      .toDF("event_id", "key", "ts").write.mode("overwrite").json(s"$dir/f1")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType)))
    val stream = spark.readStream.schema(schema).json(s"$dir/f*")
    EventStreams.runToMemory(
      EventStreams.dedupWithinWatermark(stream, Seq("key"), "1 hour"), "wmdedup_out")
    val keys = spark.table("wmdedup_out").select($"key").collect().map(_.getString(0)).sorted
    assert(keys.toSeq == Seq("a", "b")) // duplicate 'a' within the window collapsed
  }

  test("observable metrics report per-batch counts without a second pass") {
    val events = Tables.events(spark, sf("sf0.001"))
    val dir = tmp("graft-obs-in")
    events.write.mode("overwrite").parquet(dir)
    @volatile var observed: Option[(Long, Long)] = None
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val m = e.progress.observedMetrics.get("graft_metrics")
        if (m != null) observed = Some((m.getLong(0), m.getLong(1)))
      }
    }
    spark.streams.addListener(listener)
    try {
      val stream = spark.readStream.schema(events.schema).parquet(dir)
      EventStreams.runToMemory(EventStreams.observed(stream), "obs_out")
      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 20000
      while (observed.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      val (n, nerr) = observed.getOrElse(fail("no observed metrics delivered"))
      assert(n == events.count())
      assert(nerr == events.filter($"event_type" === "error").count())
    } finally spark.streams.removeListener(listener)
  }

  test("stream-stream interval join matches its batch twin") {
    val events = Tables.events(spark, sf("sf0.001"))
    val dir = tmp("graft-ssj-in")
    events.write.mode("overwrite").parquet(dir)
    def purchases(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") === "purchase")
    def clicks(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") === "click")
    // batch twin: same expression over batch frames
    val want = EventStreams.intervalJoin(purchases(events), clicks(events))
      .select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val s1 = spark.readStream.schema(events.schema).parquet(dir)
    val s2 = spark.readStream.schema(events.schema).parquet(dir)
    EventStreams.runToMemory(
      EventStreams.intervalJoin(purchases(s1), clicks(s2)), "ssj_out")
    val got = spark.table("ssj_out").select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty && got == want)
  }

  test("statefulDedupTtl: dedups inside the TTL window, state expires after it") {
    val dir = tmp("graft-ttl-in")
    val checkpoint = tmp("graft-ttl-ck")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType)))
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    def runOnce(): Seq[String] = {
      StreamingSpec.collectedTtl.clear()
      val stream = spark.readStream.schema(schema).json(s"$dir/f*")
        .as[EventStreams.TimedKeyed]
      val q = EventStreams.statefulDedupTtl(stream, "1 hour").toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.as[EventStreams.TimedKeyed].collect()
            .foreach(StreamingSpec.collectedTtl.add)
        }
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      StreamingSpec.collectedTtl.asScala.toSeq.map(_.id)
    }
    // run 1: a, b at 10:00 → both emit; replayed a deduped in-run
    Seq(("k", "a", t("2024-01-01 10:00:00")), ("k", "b", t("2024-01-01 10:00:00")),
        ("k", "a", t("2024-01-01 10:00:10")))
      .toDF("key", "id", "ts").write.mode("overwrite").json(s"$dir/f1")
    assert(runOnce().sorted == Seq("a", "b"))
    // run 2: replayed a within TTL → deduped; k's timeout := 10:00+1h
    Seq(("k", "a", t("2024-01-01 10:00:30")))
      .toDF("key", "id", "ts").write.mode("overwrite").json(s"$dir/f2")
    assert(runOnce().isEmpty)
    // run 3: other-key traffic at 13:00 advances the watermark past
    // k's 11:00 timeout (takes effect next batch)
    Seq(("k2", "x", t("2024-01-01 13:00:00")))
      .toDF("key", "id", "ts").write.mode("overwrite").json(s"$dir/f3")
    assert(runOnce() == Seq("x"))
    // run 4: k has no data this batch and its timeout < watermark →
    // state evicted (timeout branch emits nothing)
    Seq(("k2", "y", t("2024-01-01 13:01:00")))
      .toDF("key", "id", "ts").write.mode("overwrite").json(s"$dir/f4")
    assert(runOnce() == Seq("y"))
    // run 5: a replayed AFTER its window → re-emits on fresh state
    // (the documented at-least-once trade of any TTL'd dedup)
    Seq(("k", "a", t("2024-01-01 13:30:00")))
      .toDF("key", "id", "ts").write.mode("overwrite").json(s"$dir/f5")
    assert(runOnce() == Seq("a"))
  }

  test("statefulDedupTws (transformWithState): cross-batch dedup, native TTL expiry") {
    val dir = tmp("graft-tws-in")
    val checkpoint = tmp("graft-tws-ck")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType)))
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val checksumKey = "spark.sql.streaming.checkpoint.fileChecksum.enabled"
    val prev = spark.conf.getOption(providerKey)
    val prevChecksum = spark.conf.getOption(checksumKey)
    // transformWithState requires the RocksDB state store; 4.1's
    // checkpoint-file checksum writer deadlocks the RocksDB snapshot
    // upload in local mode (awaitResult with no timeout inside
    // ChecksumCancellableFSDataOutputStream.close) — disable it
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(checksumKey, "false")
    try {
      // A processing-time-TTL'd transformWithState operator schedules
      // maintenance batches indefinitely — AvailableNow never
      // self-terminates and processAllAvailable never returns
      // (measured: 1700+ empty micro-batches). So: TimeMode.None
      // (ttl=null) drains normally; the TTL leg polls for its
      // expected rows, then stops the query (the production shape is
      // a continuously-running query).
      // separate checkpoints per time mode: Spark pins the operator's
      // TimeMode in the state metadata, so None vs ProcessingTime
      // cannot share one
      val checkpointTtl = tmp("graft-tws-ck-ttl")
      def runOnce(ttl: java.time.Duration, expected: Int): Seq[String] = {
        StreamingSpec.collectedTtl.clear()
        val stream = spark.readStream.schema(schema).json(s"$dir/f*")
          .as[EventStreams.TimedKeyed]
        val writer = EventStreams.statefulDedupTws(stream, ttl).toDF()
          .writeStream.outputMode("append")
          .option("checkpointLocation", if (ttl == null) checkpoint else checkpointTtl)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            batch.as[EventStreams.TimedKeyed].collect()
              .foreach(StreamingSpec.collectedTtl.add)
          }
        if (ttl == null) {
          val q = writer
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
          q.awaitTermination()
        } else {
          val q = writer.start()
          val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
          while (StreamingSpec.collectedTtl.size < expected && System.nanoTime() < deadline)
            Thread.sleep(100)
          Thread.sleep(1500) // one extra beat: in-flight dups must NOT emit
          q.stop(); q.awaitTermination()
        }
        import scala.jdk.CollectionConverters._
        StreamingSpec.collectedTtl.asScala.toSeq.map(_.id)
      }
      // batch 1 (no TTL): a, b + in-batch replay of a → emits a, b
      Seq(("k", "a", t("2024-01-01 10:00:00")), ("k", "b", t("2024-01-01 10:00:00")),
          ("k", "a", t("2024-01-01 10:00:10")))
        .toDF("key", "id", "ts").write.mode("overwrite").json(s"$dir/f1")
      assert(runOnce(null, 2).sorted == Seq("a", "b"))
      // batch 2 (no TTL): replayed a deduped by the surviving
      // ListState, new c emits — cross-batch state via checkpoint
      Seq(("k", "a", t("2024-01-01 10:00:30")), ("k", "c", t("2024-01-01 10:00:30")))
        .toDF("key", "id", "ts").write.mode("overwrite").json(s"$dir/f2")
      assert(runOnce(null, 1) == Seq("c"))
      // TTL leg (fresh checkpoint → reprocesses f1+f2 with fresh
      // state): a,b,c emit once each under a 2 s TTL
      assert(runOnce(java.time.Duration.ofSeconds(2), 3).sorted == Seq("a", "b", "c"))
      Thread.sleep(2500) // past the TTL: the store expires the set itself
      // replayed a AFTER its window re-emits on expired state — the
      // same at-least-once trade as the EventTimeTimeout variant,
      // with zero hand-rolled timeout arithmetic
      Seq(("k", "a", t("2024-01-01 10:02:00")))
        .toDF("key", "id", "ts").write.mode("overwrite").json(s"$dir/f3")
      assert(runOnce(java.time.Duration.ofSeconds(2), 1) == Seq("a"))
    } finally {
      prev match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None    => spark.conf.unset(providerKey)
      }
      prevChecksum match {
        case Some(p) => spark.conf.set(checksumKey, p)
        case None    => spark.conf.unset(checksumKey)
      }
    }
  }

  test("ST2 statefulDedup emits each (key,id) once across micro-batches") {
    val dir = tmp("graft-dedup-in")
    // batch 1: ids a,b for key k1
    Seq(("k1", "a"), ("k1", "b")).toDF("key", "id")
      .write.mode("overwrite").json(s"$dir/f1")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.StringType)))
    val checkpoint = tmp("graft-dedup-ck")
    // memory sink cannot resume from a checkpoint; foreachBatch can.
    def runOnce(): Seq[EventStreams.Keyed] = {
      StreamingSpec.collected.clear()
      val stream = spark.readStream.schema(schema).json(s"$dir/f*")
        .as[EventStreams.Keyed]
      val q = EventStreams.statefulDedup(stream).toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.as[EventStreams.Keyed].collect()
            .foreach(StreamingSpec.collected.add)
        }
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      StreamingSpec.collected.asScala.toSeq
    }
    assert(runOnce().map(_.id).sorted == Seq("a", "b"))
    // batch 2: replay a + new c → only c must come out (stop-on-seen)
    Seq(("k1", "a"), ("k1", "c"), ("k1", "c")).toDF("key", "id")
      .write.mode("overwrite").json(s"$dir/f2")
    assert(runOnce().map(_.id) == Seq("c"))
  }

  test("streaming curation ≡ batch quality→decon→exact-dedup across drops, restart, and replay") {
    import graft.streaming.CurationStream
    import graft.analytics.TextAnalysis
    val all = Tables.documents(spark, sf("sf0.01"))
    val corpus = all.filter($"doc_id" % 50 =!= 0)
    val benchDocs = all.filter($"doc_id" % 50 === 0)
    val bench = CurationStream.benchGrams(benchDocs)

    // batch twin: q132 battery ∘ q129 ≥3-gram rule ∘ min-id keeper
    val gated = corpus.filter(
      TextAnalysis.qualityBattery(col("text")).getField("keep"))
    val benchSet = TextAnalysis.shingleSet(benchDocs, 4).select("s").distinct()
    val hits = TextAnalysis.shingleSet(gated, 4)
      .join(benchSet, Seq("s"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    val expected = gated.join(hits, Seq("doc_id"), "left")
      .filter(coalesce($"n_hits", lit(0L)) < 3)
      .select(TextAnalysis.fingerprint($"text").as("fp"), $"doc_id")
      .groupBy("fp").agg(min("doc_id").as("keeper"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture must exercise the pipeline")

    val input = corpus.select($"doc_id", $"source", $"lang", $"text")
    val drop1 = input.filter($"doc_id" <= 250).orderBy("doc_id")
    val drop2 = input.filter($"doc_id" > 250).orderBy("doc_id")
    val dir = tmp("graft-curation-stream")
    val ckpt = tmp("graft-curation-ckpt")
    StreamingSpec.collectedCurated.clear()
    def start() = {
      val stream = spark.readStream.schema(input.schema).parquet(dir)
        .as[CurationStream.Doc]
      CurationStream.curatedStream(stream, bench).toDF()
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.as[CurationStream.CuratedDoc].collect()
            .foreach(StreamingSpec.collectedCurated.add)
        }
        .option("checkpointLocation", ckpt)
        .start()
    }
    def curatedNow() = {
      import scala.jdk.CollectionConverters._
      StreamingSpec.collectedCurated.asScala.toSeq
    }
    drop1.write.mode("overwrite").parquet(dir)
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    val afterDrop1 = curatedNow().size
    // restart from the checkpoint: fingerprint state must survive
    drop2.write.mode("append").parquet(dir)
    // replay drop1 in the same batch dir — at-least-once tolerance
    drop1.write.mode("append").parquet(dir)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val events = curatedNow()
    assert(events.size > afterDrop1, "second night must add docs")
    assert(events.map(_.fp).distinct.size == events.size,
      "a fingerprint emits exactly once across drops and replays")
    val got = events.map(e => (e.fp, e.doc_id)).toSet
    assert(got == expected,
      s"stream ≡ batch: ${got.size} vs ${expected.size} keepers; " +
        s"diff ${(got diff expected).take(3)} / ${(expected diff got).take(3)}")

    // arrival-order contract: reversed drops elect DIFFERENT keepers
    // (first-arrival-wins) but the SAME fingerprint set — membership
    // is order-independent even when representatives are not
    val dir2 = tmp("graft-curation-rev")
    val ckpt2 = tmp("graft-curation-rev-ck")
    StreamingSpec.collectedCurated.clear()
    drop2.write.mode("overwrite").parquet(dir2) // high ids first
    def startRev() = {
      val stream = spark.readStream.schema(input.schema).parquet(dir2)
        .as[CurationStream.Doc]
      CurationStream.curatedStream(stream, bench).toDF()
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.as[CurationStream.CuratedDoc].collect()
            .foreach(StreamingSpec.collectedCurated.add)
        }
        .option("checkpointLocation", ckpt2)
        .start()
    }
    val q3 = startRev()
    q3.processAllAvailable()
    drop1.write.mode("append").parquet(dir2)
    q3.processAllAvailable()
    q3.stop()
    val rev = curatedNow()
    assert(rev.map(_.fp).toSet == expected.map(_._1),
      "fingerprint membership is arrival-order independent")
    assert(rev.map(_.fp).distinct.size == rev.size)
  }

  test("composed curation→quota: ONE query, two stateful stages, parity across drops + restart + replay") {
    import graft.streaming.{CurationStream, QuotaStream}
    import graft.analytics.TextAnalysis
    val all = Tables.documents(spark, sf("sf0.01"))
    val corpus = all.filter($"doc_id" % 50 =!= 0)
    val benchDocs = all.filter($"doc_id" % 50 === 0)
    val bench = CurationStream.benchGrams(benchDocs)

    // batch pre-packing survivors: battery ∘ decon ∘ min-id keeper,
    // with the keeper's source attached (q155's stages 1-3)
    val gated = corpus.filter(
      TextAnalysis.qualityBattery(col("text")).getField("keep"))
    val benchSet = TextAnalysis.shingleSet(benchDocs, 4).select("s").distinct()
    val hits = TextAnalysis.shingleSet(gated, 4)
      .join(benchSet, Seq("s"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    val keepers = gated.join(hits, Seq("doc_id"), "left")
      .filter(coalesce($"n_hits", lit(0L)) < 3)
      .select(TextAnalysis.fingerprint($"text").as("fp"), $"doc_id", $"source")
      .groupBy("fp").agg(min(struct($"doc_id", $"source")).as("k"))
      .select($"k.doc_id", $"k.source")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySource = keepers.groupBy(_._2).map { case (s, xs) => s -> xs.map(_._1).toSet }
    assert(bySource.size >= 2, "fixture needs several sources")

    // targets: one source admits EVERYTHING (set-equality arm); the
    // rest admit half (count arm — which half is arrival-defined
    // inside a micro-batch, deliberately not asserted)
    val full = bySource.keys.min
    val targets: Map[String, Long] = bySource.map { case (s, ids) =>
      s -> (if (s == full) Long.MaxValue / 2 else math.max(1L, ids.size / 2L)) }

    val input = corpus.select($"doc_id", $"source", $"lang", $"text")
    val drop1 = input.filter($"doc_id" <= 250).orderBy("doc_id")
    val drop2 = input.filter($"doc_id" > 250).orderBy("doc_id")
    val dir = tmp("graft-curq-stream")
    val ckpt = tmp("graft-curq-ckpt")
    StreamingSpec.collectedQuota.clear()
    def start() = {
      val stream = spark.readStream.schema(input.schema).parquet(dir)
        .as[CurationStream.Doc]
      CurationStream.curatedAdmittedStream(stream, bench, targets).toDF()
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.as[QuotaStream.Admitted].collect()
            .foreach(StreamingSpec.collectedQuota.add)
        }
        .option("checkpointLocation", ckpt)
        .start()
    }
    drop1.write.mode("overwrite").parquet(dir)
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    // restart from the checkpoint: BOTH states (fingerprints + quota
    // counters) must survive; replay drop1 — the dedup stage absorbs
    // it, so the quota can never double-admit
    drop2.write.mode("append").parquet(dir)
    drop1.write.mode("append").parquet(dir)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    import scala.jdk.CollectionConverters._
    val adm = StreamingSpec.collectedQuota.asScala.toSeq
    // no double admission across replay + restart
    assert(adm.map(a => (a.source, a.doc_id)).distinct.size == adm.size)
    // every admitted doc is a batch survivor keeper of its source
    assert(adm.forall(a => bySource(a.source).contains(a.doc_id)),
      "admitted a non-survivor")
    // per-source counts: min(target, survivors)
    val got = adm.groupBy(_.source).view.mapValues(_.size.toLong).toMap
    bySource.foreach { case (s, ids) =>
      val want = math.min(targets(s), ids.size.toLong)
      assert(got.getOrElse(s, 0L) == want, s"source $s: ${got.get(s)} vs $want")
    }
    // the admit-all source equals the survivor set exactly
    assert(adm.filter(_.source == full).map(_.doc_id).toSet == bySource(full))
    // per-source admission sequence is contiguous 1..n
    adm.groupBy(_.source).foreach { case (s, xs) =>
      assert(xs.map(_.seq).sorted == (1L to xs.size.toLong), s"seq gap in $s")
    }
  }

  test("streaming log-histogram: latest rows ≡ batch sketch across drops + restart; quantiles identical") {
    import graft.streaming.HistStream
    import graft.analytics.LogHist
    val vals = Tables.documents(spark, sf("sf0.01"))
      .select($"source".as("scope"),
        size(split($"text", " ")).cast("long").as("v"))
    val batchSketch = LogHist.sketch(vals)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val qs = Seq("e50" -> 0.5, "e90" -> 0.9, "e99" -> 0.99)
    val batchQ = LogHist.quantiles(LogHist.sketch(vals), qs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    val withId = vals.withColumn("i",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy($"scope", $"v")).cast("long"))
    val drop1 = withId.filter($"i" % 2 === 0).drop("i")
    val drop2 = withId.filter($"i" % 2 === 1).drop("i")
    val dir = tmp("graft-hist-stream")
    val ckpt = tmp("graft-hist-ckpt")
    StreamingSpec.collectedHist.clear()
    def start() = {
      val stream = spark.readStream.schema(drop1.schema).parquet(dir)
        .as[HistStream.Arrival]
      HistStream.runningSketch(stream)
        .writeStream.outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => StreamingSpec.collectedHist
            .put((r.getString(0), r.getLong(1)), r.getLong(2)))
        }
        .option("checkpointLocation", ckpt)
        .start()
    }
    drop1.write.mode("overwrite").parquet(dir)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    // restart from checkpoint: bucket counts must CONTINUE, not reset
    drop2.write.mode("append").parquet(dir)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    import scala.jdk.CollectionConverters._
    val got = StreamingSpec.collectedHist.asScala.toMap
    assert(got == batchSketch,
      s"stream sketch ≠ batch: ${got.size} vs ${batchSketch.size} bins")
    // the latest emitted rows feed the SAME estimator → identical quantiles
    val gotQ = LogHist.quantiles(
        got.toSeq.map { case ((s, b), c) => (s, b, c) }.toDF("scope", "bin", "cnt"),
        qs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(gotQ == batchQ, "quantiles from streamed rows ≠ batch quantiles")
  }

  test("streaming KMV: bottom-K state merges across drops and a restart ≡ batch sketch") {
    import graft.streaming.KmvStream
    import graft.analytics.Kmv
    // shingle elements (per-source trigram vocab ≫ K at sf0.001) so
    // the parity covers the ESTIMATOR regime, not just sub-K exact
    val docs = Tables.documents(spark, sf("sf0.001"))
    val input = docs.select($"doc_id", $"source".as("scope"),
      graft.functions.ShingleExplode.shingle_explode($"text", 3).as("elem"))
    val d1 = input.filter($"doc_id" % 3 === 0).drop("doc_id")
    val d2 = input.filter($"doc_id" % 3 === 1).drop("doc_id")
    val d3 = input.filter($"doc_id" % 3 === 2).drop("doc_id")
    val dir = tmp("graft-kmv-in")
    val ckpt = tmp("graft-kmv-ck")
    StreamingSpec.collectedKmv.clear()
    def start() = {
      val st = spark.readStream.schema(d1.schema).parquet(dir)
        .as[KmvStream.Arrival]
      KmvStream.sketches(st).toDF()
        .writeStream.outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.as[KmvStream.Estimate].collect()
            .foreach(StreamingSpec.collectedKmv.add)
        }
        .option("checkpointLocation", ckpt)
        .start()
    }
    def latest(): Map[String, KmvStream.Estimate] = {
      import scala.jdk.CollectionConverters._
      StreamingSpec.collectedKmv.asScala.toSeq.groupBy(_.scope)
        .view.mapValues(_.maxBy(_.n_total)).toMap
    }
    def batchOf(df: org.apache.spark.sql.DataFrame): Map[String, (Seq[Long], Long)] = {
      val sk = Kmv.sketch(df, col("scope"), col("elem"))
      val est = Kmv.estimate(sk).collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      sk.orderBy("scope", "rn").collect().toSeq.groupBy(_.getString(0))
        .map { case (sc, rows) => sc -> (rows.map(_.getLong(1)).toSeq, est(sc)) }
    }
    def check(got: Map[String, KmvStream.Estimate],
              exp: Map[String, (Seq[Long], Long)], label: String): Unit = {
      assert(got.keySet == exp.keySet, s"$label: scope sets differ")
      exp.foreach { case (sc, (hs, e)) =>
        assert(got(sc).hs == hs, s"$label/$sc: state ≠ batch sketch rows")
        assert(got(sc).est == e, s"$label/$sc: estimate ≠ batch estimate")
      }
    }
    d1.write.mode("overwrite").parquet(dir)
    val q1 = start()
    q1.processAllAvailable()
    check(latest(), batchOf(d1), "night 1")
    d2.write.mode("append").parquet(dir)
    q1.processAllAvailable() // night 2 merges into live state
    q1.stop()
    check(latest(), batchOf(d1.unionByName(d2)), "night 2")
    // estimator regime must actually be exercised
    assert(latest().values.exists(_.n_seen == Kmv.K.toLong),
      "fixture must push at least one scope past K")
    d3.write.mode("append").parquet(dir)
    val q2 = start() // restart: bottom-K state survives the checkpoint
    q2.processAllAvailable()
    q2.stop()
    check(latest(), batchOf(input.drop("doc_id")), "after restart")
  }

  test("streaming quotas: per-source admission stops at target, survives restart") {
    import graft.streaming.QuotaStream
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select($"source", $"doc_id")
    val targets = docs.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> (r.getLong(1) / 2 + 1)).toMap // ~half each
    val arrivalsPerSrc = docs.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val d1 = docs.filter($"doc_id" % 2 === 0)
    val d2 = docs.filter($"doc_id" % 2 === 1)
    val dir = tmp("graft-quota-in")
    val ckpt = tmp("graft-quota-ck")
    StreamingSpec.collectedQuota.clear()
    def start() = {
      val st = spark.readStream.schema(d1.schema).parquet(dir)
        .as[QuotaStream.Arrival]
      QuotaStream.admitted(st, targets).toDF()
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.as[QuotaStream.Admitted].collect()
            .foreach(StreamingSpec.collectedQuota.add)
        }
        .option("checkpointLocation", ckpt)
        .start()
    }
    def got(): Seq[QuotaStream.Admitted] = {
      import scala.jdk.CollectionConverters._
      StreamingSpec.collectedQuota.asScala.toSeq
    }
    d1.write.mode("overwrite").parquet(dir)
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    val night1 = got()
    val d1Counts = d1.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    night1.groupBy(_.source).foreach { case (src, rows) =>
      assert(rows.size.toLong == math.min(targets(src), d1Counts(src)),
        s"$src night 1: admitted ${rows.size}")
    }
    // restart from the checkpoint: counters must RESUME, not reset —
    // a reset would re-admit target docs from drop 2 alone
    d2.write.mode("append").parquet(dir)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val all = got()
    val bySrc = all.groupBy(_.source)
    assert(bySrc.keySet == targets.keySet)
    bySrc.foreach { case (src, rows) =>
      assert(rows.size.toLong == math.min(targets(src), arrivalsPerSrc(src)),
        s"$src final: admitted ${rows.size} vs target ${targets(src)}")
      // seq is the per-source admission index: 1..n exactly once
      assert(rows.map(_.seq).sorted == (1L to rows.size.toLong),
        s"$src: admission sequence broken")
      // admitted docs are a subset of the source's arrivals
      assert(rows.map(_.doc_id).distinct.size == rows.size)
    }
    assert(all.size > night1.size, "night 2 must admit under remaining quota")
  }

  test("streaming drift monitor: running chi-square vs reference, drift clears as the mixture completes") {
    import graft.streaming.DriftStream
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select($"lang".as("bin"), $"doc_id")
    val full = docs.groupBy($"bin").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nTot = full.values.sum.toDouble
    val reference = full.map { case (b, c) => b -> c / nTot }
    val d1 = docs.filter($"bin" === "en") // biased first night: en only
    val d2 = docs.filter($"bin" =!= "en")
    val dir = tmp("graft-drift-in")
    val ckpt = tmp("graft-drift-ck")
    StreamingSpec.collectedDrift.clear()
    def start() = {
      val st = spark.readStream.schema(d1.schema).parquet(dir)
        .select($"bin").as[DriftStream.Arrival]
      DriftStream.runningCounts(st)
        .writeStream.outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => // cumulative counts: latest wins
            StreamingSpec.collectedDrift.put(r.getString(0), r.getLong(1)))
        }
        .option("checkpointLocation", ckpt)
        .start()
    }
    def verdict() = {
      import scala.jdk.CollectionConverters._
      DriftStream.verdictOf(StreamingSpec.collectedDrift.asScala.toMap, reference)
    }
    d1.write.mode("overwrite").parquet(dir)
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    val v1 = verdict()
    assert(v1.drift, s"all-en night must flag against the mixed reference: $v1")
    assert(v1.n_total == full("en"))
    // batch-twin parity: same statistic from a batch groupBy (the
    // one-spelling contract)
    val batchV1 = DriftStream.verdictOf(
      d1.groupBy($"bin").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap, reference)
    assert(v1 == batchV1, "stream verdict ≡ batch verdict on the same arrivals")
    // restart: agg state resumes; the completed mixture clears the alarm
    d2.write.mode("append").parquet(dir)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val v2 = verdict()
    assert(v2.n_total == full.values.sum)
    assert(v2.chi2 < 1e-6 && !v2.drift,
      s"the full corpus matches its own mixture: $v2")
    // unknown-mass alarm: a reference that never saw 'de' must still
    // flag when de arrives in force — the known bins stay perfectly
    // proportional (chi2 ~ 0), so only the unknown-fraction rule can
    // catch the strongest drift of all
    val refNoDe = (full - "de").map { case (b, c) =>
      b -> c.toDouble / (nTot - full("de")) }
    val v3 = DriftStream.verdictOf(full, refNoDe)
    assert(v3.n_unknown == full("de") && v3.chi2 < 1e-6 && v3.drift,
      s"unknown-bin mass must fire the alarm: $v3")
  }

  test("streaming ER: emitted match pairs ≡ batch matchPairs across drops + restart") {
    import graft.streaming.ErStream
    val p = Tables.part(spark, sf("sf0.01"))
      .select($"p_partkey", $"p_brand", $"p_name", $"p_type", $"p_size")
    val expected = graft.analytics.EntityResolution.matchPairs(p, p)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture must contain corroborated matches")
    val d1 = p.filter($"p_partkey" % 3 === 0)
    val d2 = p.filter($"p_partkey" % 3 === 1)
    val d3 = p.filter($"p_partkey" % 3 === 2)
    val dir = tmp("graft-er-in")
    val ckpt = tmp("graft-er-ck")
    StreamingSpec.collectedErPairs.clear()
    def start() = {
      val st = spark.readStream.schema(p.schema).parquet(dir)
        .as[ErStream.Rec]
      ErStream.matchPairs(st).toDF()
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.as[ErStream.MatchPair].collect()
            .foreach(StreamingSpec.collectedErPairs.add)
        }
        .option("checkpointLocation", ckpt)
        .start()
    }
    def got(): Seq[(Long, Long)] = {
      import scala.jdk.CollectionConverters._
      StreamingSpec.collectedErPairs.asScala.toSeq.map(mp => (mp.d1, mp.d2))
    }
    d1.write.mode("overwrite").parquet(dir)
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    val night1 = got()
    assert(night1.toSet.subsetOf(expected), "stream pairs must be true matches")
    // restart: bucket members survive the checkpoint — drop-2
    // arrivals must pair against drop-1 records
    d2.write.mode("append").parquet(dir)
    val q2 = start()
    q2.processAllAvailable()
    d3.write.mode("append").parquet(dir) // third drop into the live query
    q2.processAllAvailable()
    q2.stop()
    val all = got()
    assert(all.size == all.distinct.size,
      "each pair emits exactly once on a clean run")
    assert(all.toSet == expected,
      s"stream ≡ batch: ${all.size} vs ${expected.size}; " +
        s"missing ${(expected -- all.toSet).take(3)}, " +
        s"extra ${(all.toSet -- expected).take(3)}")
    assert(all.size > night1.size, "later drops must add cross-drop pairs")
  }

  test("streaming URL curation: canon dedup + domain cap, replay-safe, invariants vs batch") {
    import graft.streaming.UrlStream
    import graft.ops.UrlOps
    // 3 domains; a.io has 4 distinct canonical URLs (cap 2 binds),
    // b.io has 2 (cap doesn't bind), c.io has 1; utm variants and a
    // www/port variant collide canonically ACROSS drops
    val drop1 = Seq(
      (1L, "https://a.io/p1?utm_source=x"),
      (2L, "https://a.io/p1"),                 // dup of 1 (in-batch)
      (3L, "https://a.io/p2"),
      (4L, "http://WWW.b.io:80/r/"),
      (10L, "https://c.io/only")).map((UrlStream.UrlDoc.apply _).tupled)
    val drop2 = Seq(
      (5L, "https://a.io/p1?utm_campaign=y"),  // dup of 1 (cross-drop)
      (6L, "https://a.io/p3"),                 // 3rd a.io keeper: capped out
      (7L, "https://a.io/p4"),                 // 4th: capped out
      (8L, "http://b.io/r"),                   // dup of 4 (cross-drop)
      (9L, "http://b.io/s")).map((UrlStream.UrlDoc.apply _).tupled)
    val all = drop1 ++ drop2
    val dir = tmp("graft-urlstream")
    val ckpt = tmp("graft-urlstream-ckpt")
    drop1.toDF().write.mode("overwrite").parquet(dir)
    StreamingSpec.collectedUrl.clear()
    def start() = spark.readStream.schema(drop1.toDF().schema).parquet(dir)
      .as[UrlStream.UrlDoc]
      .transform(s => UrlStream.urlCuratedAdmitted(s, cap = 2).toDF())
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.as[UrlStream.Admitted].collect().foreach(StreamingSpec.collectedUrl.add)
      }
      .option("checkpointLocation", ckpt).start()
    def got() = { import scala.jdk.CollectionConverters._
      StreamingSpec.collectedUrl.asScala.toSeq }
    val q = start(); q.processAllAvailable(); q.stop()
    val after1 = got()
    // in-batch dedup: ids 1/2 collide — exactly one admitted for p1
    assert(after1.count(_.canon == "https://a.io/p1") == 1)
    assert(after1.map(_.doc_id).toSet == Set(1L, 3L, 4L, 10L))
    // drop 2 + checkpoint restart; then REPLAY drop 1's rows (at-least
    // -once re-offer): dedup absorbs them before the cap counts
    drop2.toDF().write.mode("append").parquet(dir)
    val q2 = start(); q2.processAllAvailable()
    drop1.toDF().write.mode("append").parquet(dir) // replayed copies
    q2.processAllAvailable(); q2.stop()
    val fin = got()
    assert(fin.size == fin.map(_.doc_id).distinct.size, "exactly-once")
    // invariants vs the batch operator on the SAME rows
    val batch = UrlOps.urlCurate(all.toDF(), "url", "doc_id", cap = 2).collect()
    val batchKeeperCanon = batch.filter(_.getBoolean(3)).map(_.getString(1)).toSet
    assert(fin.map(_.canon).toSet.subsetOf(batchKeeperCanon),
      "admitted canonical URLs are batch keepers' canonical URLs")
    // per-domain counts = min(cap, distinct canonical URLs of the domain)
    val perDomain = fin.groupBy(_.domain).view.mapValues(_.size).toMap
    assert(perDomain == Map("a.io" -> 2, "b.io" -> 2, "c.io" -> 1))
    // cross-drop dedup: ids 5 (dup of 1) and 8 (dup of 4) never admitted
    assert(!fin.exists(a => a.doc_id == 5L || a.doc_id == 8L))
    // seq is contiguous 1..n per domain across restarts
    fin.groupBy(_.domain).foreach { case (_, as) =>
      assert(as.map(_.seq).sorted == (1L to as.size)) }
  }
}
