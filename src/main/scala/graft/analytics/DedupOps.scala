package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at corpus scale: exact (fingerprint
  * groupBy), shingle-Jaccard with an inverted-index candidate join,
  * MinHash+LSH banding, and SimHash with band-partitioned Hamming
  * join. Generalizes the reference's key-set dedup (SURVEY.md §2.3 J1,
  * §2.4 U3) to content similarity.
  *
  * Scale design: nothing here ever materializes the O(n²) pair space.
  *  - Jaccard: candidates come from an inverted index join on shared
  *    shingles (pairs with zero overlap never meet);
  *  - MinHash: candidates share an LSH band (4 bands × 4 rows);
  *  - SimHash: candidates share one of 4 4-bit sub-signatures — the
  *    pigeonhole guarantee for Hamming distance ≤ 3 on 16 bits.
  * Hash function is sha-256 (engine-portable, deterministic), not a
  * seeded murmur: signatures must be reproducible across engines and
  * across runs for the oracle and for incremental re-dedup.
  */
object DedupOps {
  import TextAnalysis._
  import graft.ops.Guards.lazyGuard

  /** Exact dedup groups: fingerprint → (keeper id, group size). */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))

  /** Release keeper-churn delta — the audit between two corpus
    * states (last night's release vs tonight's): per exact-dedup
    * fingerprint group, is the canonical keeper STABLE, REKEYED (the
    * group survives but a different copy became canonical — its
    * provenance/attribution changes even though content didn't),
    * ADDED (new content), or REMOVED (content left the corpus)?
    * Per-language counts of each — the four numbers a release diff
    * report leads with. Rekeyed is the subtle one a naive diff
    * misses: downstream artifacts keyed by keeper doc_id (shard
    * manifests, dedup stores) invalidate for rekeyed groups even
    * though the text is unchanged.
    *
    * Shape: two keeper elections (min(struct(doc_id, lang)) partial
    * aggs on the 32-byte fp — no window, the q40 idiom), one
    * full-outer equi-join on fp (the q144 CDC shape), one conditional
    * agg. Everything partial-aggregates map-side; the join is the
    * only real exchange and its key is uniform sha-256. */
  def releaseKeeperDelta(last: DataFrame, now: DataFrame): DataFrame = {
    def keepers(docs: DataFrame) = docs
      .select(col("doc_id"), col("lang"), fingerprint(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(struct(col("doc_id"), col("lang"))).as("k"))
      .select(col("fp"), col("k.doc_id").as("id"), col("k.lang").as("klang"))
    val l = keepers(last).select(col("fp"), col("id").as("lid"), col("klang").as("llang"))
    val n = keepers(now).select(col("fp"), col("id").as("nid"), col("klang").as("nlang"))
    val status = when(col("lid").isNotNull && col("nid").isNotNull && col("lid") === col("nid"), "stable")
      .when(col("lid").isNotNull && col("nid").isNotNull, "rekeyed")
      .when(col("nid").isNotNull, "added")
      .otherwise("removed")
    l.join(n, Seq("fp"), "full_outer")
      .select(coalesce(col("nlang"), col("llang")).as("lang"), status.as("st"))
      .groupBy("lang")
      .agg(count(when(col("st") === "stable", 1)).as("n_stable"),
        count(when(col("st") === "rekeyed", 1)).as("n_rekeyed"),
        count(when(col("st") === "added", 1)).as("n_added"),
        count(when(col("st") === "removed", 1)).as("n_removed"))
  }

  /** Distinct-shingle sizes per doc. */
  def shingleSizes(sh: DataFrame): DataFrame =
    sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))

  /** Pairwise Jaccard over docs sharing >= 1 shingle (inverted-index
    * candidate generation — the shuffle key is the shingle, so skew =
    * stop-shingles; for web-scale corpora drop ultra-frequent shingles
    * first, same as stopword removal).
    *
    * This is the EXACT BASELINE, guarded so it cannot silently be
    * mistaken for the scale path: it sums df² over the inverted
    * index — exactly the candidate rows the self-join will generate —
    * and refuses to run past `maxCandidatePairs`, naming the
    * sub-quadratic spellings. The guard is LAZY — part of the plan,
    * not an eager pre-job: the Σdf² aggregate is a 1-row broadcast
    * whose join key expression `raise_error`s past the cap, hash-
    * joined under the candidate join's build side. Broadcast exchanges
    * execute before the stage that streams them, so the check fires
    * before any candidate row materializes, and the caller sees ONE
    * query execution instead of a guard job plus the query. */
  def jaccardPairs(sh: DataFrame, threshold: Double,
                   maxCandidatePairs: Long = 200000000L): DataFrame = {
    val guard = lazyGuard(
      sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .agg(coalesce(sum(col("df") * col("df")), lit(0L)).as("fanout")),
      col("fanout"), maxCandidatePairs,
      "jaccardPairs is the exact quadratic baseline: the inverted index fans out to ",
      s" candidate rows (> $maxCandidatePairs). At this scale use " +
        "minhashLshPairs (banded LSH), jaccardPairsCapped (df cap), or " +
        "jaccardPairsPrefix (AllPairs prefix filter) instead.")
    val a = graft.ops.Guards.gate(sh, col("doc_id"), guard)
      .select(col("doc_id").as("d1"), col("s"))
    val b = sh.select(col("doc_id").as("d2"), col("s"))
    val common = a.join(b, Seq("s")).filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("c"))
    val sz = shingleSizes(sh)
    common
      .join(sz.select(col("doc_id").as("d1"), col("n").as("n1")), Seq("d1"))
      .join(sz.select(col("doc_id").as("d2"), col("n").as("n2")), Seq("d2"))
      .withColumn("jaccard",
        graft.ops.Exact.duckRound(col("c").cast("double") / (col("n1") + col("n2") - col("c")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** Jaccard with a document-frequency cap on the inverted index:
    * shingles appearing in more than `dfCap` documents are dropped
    * before the candidate join — the "stop-shingle" guard that bounds
    * worst-case join skew at corpus scale (a shingle shared by n docs
    * contributes n² candidate rows; capping df caps that at dfCap²).
    * Sizes still count ALL shingles, so the computed similarity is a
    * LOWER BOUND of exact Jaccard (shared stop-shingles don't count
    * toward the intersection) — thresholded output is therefore a
    * subset of the exact output, with exact values whenever no shared
    * shingle was capped. Same deliberate trade stopword removal
    * makes. */
  def jaccardPairsCapped(sh: DataFrame, threshold: Double, dfCap: Long): DataFrame = {
    // Anti-join the DROPPED set, not an inner join with the kept set:
    // stop-shingles above the cap are few by construction (bounded by
    // |shingle instances|/cap), so AQE broadcasts the build side and
    // the shingle corpus streams map-only — the kept-set inner join
    // would shuffle every shingle row against a nearly-corpus-sized
    // dictionary.
    val dropped = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap).select(col("s"))
    val shKept = sh.join(dropped, Seq("s"), "left_anti")
    val a = shKept.select(col("doc_id").as("d1"), col("s"))
    val b = shKept.select(col("doc_id").as("d2"), col("s"))
    val common = a.join(b, Seq("s")).filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("c"))
    val sz = shingleSizes(sh)
    common
      .join(sz.select(col("doc_id").as("d1"), col("n").as("n1")), Seq("d1"))
      .join(sz.select(col("doc_id").as("d2"), col("n").as("n2")), Seq("d2"))
      .withColumn("jaccard",
        graft.ops.Exact.duckRound(col("c").cast("double") / (col("n1") + col("n2") - col("c")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** Jaccard with a HASH-ORDER MEMBER CAP on the inverted index: each
    * shingle's posting list keeps only the `memberCap` members with
    * the lowest sha-256(s|doc_id) — a deterministic pseudorandom
    * M-subset per shingle — and candidates from the capped index are
    * verified with EXACT Jaccard over the FULL shingle sets (the q31
    * candidate-driven verify join), so every emitted pair carries its
    * true similarity; recall is the only trade.
    *
    * Why this exists next to [[jaccardPairsCapped]]: the df cap is an
    * ABSOLUTE threshold, and the 10x replication run (SCALING.md)
    * measured its recall collapsing 1.0 → 0.0 once corpus growth
    * multiplied every shingle's df past the fixed cap — and because
    * capped-Jaccard counts intersections only over kept shingles, the
    * pairs it does keep lose similarity mass too. The member cap is
    * scale-free: fan-out is bounded by Σ min(df, M)² ≤ M²·|shingles|,
    * linear in corpus size for fixed M, and the exact verify
    * decouples similarity values from the cap. Offline DuckDB
    * simulation on the 10x clique corpus (before any Scala): member
    * cap M=40 recall 0.996 at 45 M candidate fan-out vs the fixed df
    * cap's 0.0 and exact's 223 M (SCALE10_r07.json corpus).
    *
    * The hash order matters twice. Keeping the LOWEST doc_ids (the
    * band-store cap's choice, right for a saturation report) would
    * bias candidate coverage against high-id documents corpus-WIDE;
    * per-shingle hash order gives every doc an independent chance on
    * each shared shingle, so a true pair is missed only if EVERY
    * shared shingle's random M-subset excludes it. And the rank
    * filter compiles to WindowGroupLimit (Spark 4 pushes rn ≤ M into
    * a map-side per-key top-M before the exchange), so a boilerplate
    * shingle costs M rows per input partition in the shuffle, never
    * its df.
    *
    * `minCooccur` prunes candidates BEFORE the verify join: a pair
    * must share at least that many KEPT shingles. True pairs at
    * threshold 0.6 share most of their shingles, so the kept
    * M-subsets overlap many times; random collisions share one. The
    * verify join dominates end-to-end cost (measured sf0.1: 7.2 s
    * full vs 1.55 s through candidates at M=40, mc=1 — 1.13 M
    * candidates each exploding against full shingle sets), so this
    * is THE runtime knob. Measured grid (DuckDB sim on the real
    * corpora; recall vs exact): sf0.1 — mc=1/2/3 all recall 1.0,
    * candidates 1.13 M/112 k/10 k; 10x clique corpus (SCALE10_r07)
    * at M=40 — mc=1: 0.9963 @ 19.5 M cands, mc=2: 0.9823 @ 591 k,
    * mc=3: 0.9548 @ 231 k. Default mc=1 is the conservative
    * maximum-recall setting; q118 ships (40, 2). */
  def jaccardPairsMemberCapped(sh: DataFrame, threshold: Double,
                               memberCap: Int, minCooccur: Int = 1): DataFrame = {
    // Shared-subtree cost, measured (round 9): the self-join's two
    // branches repeat this window subtree, and on the COLD path AQE
    // ReusedExchange dedups it (PlanSpec pins that executed-plan
    // property — the path a 100 TB scan takes). Above a PERSISTED
    // shingle input (the gate/bench cache) the per-instance
    // TableCacheQueryStages break the canonical match and the window
    // exchange genuinely runs twice — both materialization rewrites
    // measured WORSE than paying it: collect_list + double-explode
    // pairs ~4.8 s (ObjectHashAggregate object buffers for 591k
    // shingle lists) and localCheckpoint(true) on `kept` ~3.9 s
    // (at sf0.1 the cap doesn't bind, so `kept` IS the corpus and
    // the checkpoint writes all of it) vs 2.8–3.5 s as-is, same-day
    // windows. A cap-bound corpus (10×) shifts that calculus, but
    // there the cold path + reuse is the realistic one.
    val kept = sh
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("s"))
          .orderBy(sha2(concat_ws("|", col("s"), col("doc_id").cast("string")), 256),
            col("doc_id"))))
      .filter(col("rk") <= memberCap)
      .select(col("doc_id"), col("s"))
    val cands = kept.select(col("doc_id").as("d1"), col("s"))
      .join(kept.select(col("doc_id").as("d2"), col("s")), Seq("s"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("cc"))
      .filter(col("cc") >= minCooccur)
      .select(col("d1"), col("d2"))
    verifyJaccard(cands, sh, shingleSizes(sh), threshold)
  }

  /** Exact Jaccard pairs via AllPairs prefix filtering (Bayardo et
    * al., WWW'07; Chaudhuri et al. SSJoin): under a global canonical
    * shingle order (document frequency asc, then value — rarest
    * first), a pair with Jaccard ≥ J must share a shingle inside each
    * side's PREFIX of length n − ⌈J·n⌉ + 1.
    *
    * Why: Jaccard ≥ J forces overlap c ≥ J·n for BOTH sizes (if
    * n2 < J·n1 the pair cannot qualify at all), and if the smallest
    * common element were outside A's prefix, all c ≥ ⌈J·n1⌉
    * intersection elements would sit in A's last ⌈J·n1⌉ − 1 slots —
    * a contradiction. So the candidate join runs on ~`(1−J)·n`
    * prefix rows instead of every shingle, and because prefixes hold
    * the RAREST shingles, per-shingle fan-out collapses: frequent
    * (stop) shingles land at the END of the canonical order and are
    * almost never indexed. Exact — same output as the naive inverted
    * index — with the candidate space of an approximate method; the
    * verify join is driven by the candidate list (q31's pattern).
    * The minOverlap is rounded DOWN on floating boundaries (longer
    * prefix = extra candidates, never a miss).
    *
    * Measured on the synthetic corpus (sf0.1): SLOWER than the naive
    * index (3.7 s vs 2.0 s) — the 30-word vocabulary makes the pair
    * space dense and df-skew-free (1.1M of 12.5M possible pairs share
    * a shingle), so prefix candidates stay large and the
    * per-candidate verify join dominates. q29 therefore keeps the
    * naive index; THIS is the plan for real power-law corpora, where
    * prefixes hold genuinely rare shingles and candidates collapse to
    * near the output size (AnalyticsSpec proves output parity either
    * way). */
  def jaccardPairsPrefix(sh: DataFrame, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val df = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val sz = shingleSizes(sh)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))
    val prefix = sh.join(df, Seq("s"))
      .withColumn("pos", row_number().over(w))
      .join(sz, Seq("doc_id"))
      .withColumn("minov",
        greatest(ceil(lit(threshold) * col("n") - lit(1e-9)), lit(1L)))
      .filter(col("pos") <= col("n") - col("minov") + 1)
      .select(col("doc_id"), col("s"))
    val cands = prefix.select(col("doc_id").as("d1"), col("s"))
      .join(prefix.select(col("doc_id").as("d2"), col("s")), Seq("s"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2")).distinct()
    val common = cands
      .join(sh.select(col("doc_id").as("d1"), col("s")), Seq("d1"))
      .join(sh.select(col("doc_id").as("d2"), col("s")), Seq("d2", "s"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("c"))
    common
      .join(sz.select(col("doc_id").as("d1"), col("n").as("n1")), Seq("d1"))
      .join(sz.select(col("doc_id").as("d2"), col("n").as("n2")), Seq("d2"))
      .withColumn("jaccard",
        graft.ops.Exact.duckRound(col("c").cast("double") / (col("n1") + col("n2") - col("c")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  val MINHASH_K = 16          // signature length
  val MINHASH_BANDS = 4       // 4 bands x 4 rows

  /** Universal-hash family over one sha-256 base hash per shingle:
    * h = first 8 hex chars of sha256(s) as a 32-bit int, then
    * hᵢ = (aᵢ·h + bᵢ) mod p with p prime < 2^30 — so aᵢ·h < 2^62
    * stays in BIGINT on every engine (no overflow, ANSI-safe).
    * One sha per shingle instead of K: ~16x less hashing than the
    * naive sha-per-seed scheme at identical LSH quality. */
  val MINHASH_PRIME = 1073741789L
  val MINHASH_A: Array[Long] = Array.tabulate(MINHASH_K)(i => 2L * i + 1L) // odd ⇒ coprime-ish spread
    .map(a => (a * 1000003L + 12345L) % MINHASH_PRIME)
  val MINHASH_B: Array[Long] = Array.tabulate(MINHASH_K)(i => (i * 999983L + 42L) % MINHASH_PRIME)

  /** 32-bit base hash of a shingle string. */
  def baseHash(s: Column): Column =
    conv(substring(sha2(s, 256), 1, 8), 16, 10).cast("long")

  /** MinHash signatures: explode the (map-side-distinct) shingle set,
    * hash once per shingle, and fold the K minima with a partial-
    * aggregate groupBy. The shuffle carries only ~|docs| x K values
    * (map-side combine collapses each partition to one row per doc
    * before the exchange); the shingle corpus itself never shuffles
    * (shingleSet is explode-of-array_distinct, no distinct exchange).
    *
    * Measured dead end (kept for the record): computing the K minima
    * per document row with array HOFs (aggregate + zip_with) has zero
    * shuffle but runs interpreted (HOFs are CodegenFallback) and
    * allocates a K-array per shingle — 2x SLOWER at sf0.1 than this
    * codegen'd explode+groupBy whose shuffle is already tiny. Partial
    * aggregation was the real map-side combine all along. */
  def minhashSignatures(sh: DataFrame): DataFrame =
    groupMinhash(sh, "doc_id") // ONE signature formula — the per-doc
    // and per-group (q150) spellings cannot drift from sigCols' SQL

  /** GROUP-level MinHash: one K-component signature per group — the
    * min-merge of all member shingle hashes. Because min is
    * associative/commutative, a group's signature is the merge of its
    * docs' signatures (and of its partitions' partial minima): the
    * map-side combine collapses each partition to one row per group
    * before the exchange, so corpus-level dataset similarity
    * (source-vs-source overlap, crawl-vs-crawl drift) costs one
    * groupBy over hashed shingles and shuffles only |groups|×K
    * values. Component-match fraction between two group signatures
    * estimates the Jaccard of their shingle VOCABULARIES (q150 audits
    * it against the exact value). Input: (grp, s) membership rows. */
  def groupMinhash(gs: DataFrame, grpCol: String = "source"): DataFrame = {
    val withH = gs.withColumn("h", baseHash(col("s")))
    val aggs = (0 until MINHASH_K).map { i =>
      min((lit(MINHASH_A(i)) * col("h") + lit(MINHASH_B(i))) % MINHASH_PRIME).as(f"m$i%02d")
    }
    withH.groupBy(col(grpCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH band values: separator-joined band minhashes (separator
    * prevents numeric-concat collisions like 12|345 vs 123|45). */
  def withBands(sig: DataFrame): DataFrame = {
    val rows = MINHASH_K / MINHASH_BANDS
    (0 until MINHASH_BANDS).foldLeft(sig) { (df, b) =>
      val cols = (0 until rows).map(r => col(f"m${b * rows + r}%02d"))
      df.withColumn(s"band$b", concat_ws("|", cols: _*))
    }
  }

  /** Banded signatures exploded to (doc_id, k, bv) rows — ONE row per
    * (document, band). This is the PERSISTABLE STORE FORMAT for
    * incremental re-dedup: band-equality within the same band index k
    * is exactly the LSH candidate condition, so a nightly pipeline
    * persists these rows (bucketed by (k, bv) at scale, so a delta
    * probe co-locates without reshuffling the store) and
    * `incrementalLshPairs` joins new documents against them. */
  def bandRows(banded: DataFrame): DataFrame =
    banded.select(col("doc_id"),
      explode(array((0 until MINHASH_BANDS).map(b =>
        struct(lit(b).as("k"), col(s"band$b").as("bv"))): _*)).as("kb"))
      .select(col("doc_id"), col("kb.k").as("k"), col("kb.bv").as("bv"))

  /** The full store build for a document batch: shingle → signature →
    * band rows. What a nightly pipeline persists per ingested batch.
    * `sh` optionally supplies a (cached) shingle frame that must equal
    * shingleSet(docs, 3). */
  def minhashBandStore(docs: DataFrame, sh: Option[DataFrame] = None): DataFrame =
    bandRows(withBands(minhashSignatures(sh.getOrElse(shingleSet(docs, 3)))))

  /** Exact-Jaccard verification of a candidate pair list: the
    * candidates DRIVE the shingle joins, so cost is
    * O(|candidates| · shingles-per-doc) regardless of how many
    * incidental co-shingle pairs exist in the corpus. `sh` must cover
    * every doc id appearing in `cands`; `sz` carries each doc's
    * distinct-shingle count. */
  private def verifyJaccard(cands: DataFrame, sh: DataFrame, sz: DataFrame,
                            threshold: Double): DataFrame = {
    val common = cands
      .join(sh.select(col("doc_id").as("d1"), col("s")), Seq("d1"))
      .join(sh.select(col("doc_id").as("d2"), col("s")), Seq("d2", "s"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("c"))
    common
      .join(sz.select(col("doc_id").as("d1"), col("n").as("n1")), Seq("d1"))
      .join(sz.select(col("doc_id").as("d2"), col("n").as("n2")), Seq("d2"))
      .withColumn("jaccard",
        graft.ops.Exact.duckRound(col("c").cast("double") / (col("n1") + col("n2") - col("c")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** Per-doc distinct-shingle counts, map-side (array_distinct on the
    * row's own shingle array — no explode, no groupBy). */
  private def shingleCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(array_distinct(shingles(tokens(col("text")), 3))).cast("long").as("n"))

  /** Band-store rows ranked within their (k, bv) bucket by doc_id —
    * the deterministic order the bucket cap keeps (lowest ids first).
    * One shuffle on the bucket key, the same partitioning the
    * candidate self-join needs anyway; the window sorts only within
    * each bucket, never globally. */
  private def rankedBandStore(store: DataFrame): DataFrame =
    store.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("k"), col("bv")).orderBy(col("doc_id"))))

  /** The band store with at most `maxBucketIds` members per (k, bv)
    * bucket — the batch twin of DedupStream's saturation cap. Kept
    * members are the LOWEST doc_ids of each bucket (deterministic, so
    * re-runs and the oracle agree); everything past the cap is what
    * [[bandSaturationReport]] accounts for. */
  def capBandStore(store: DataFrame, maxBucketIds: Int): DataFrame =
    rankedBandStore(store).filter(col("rn") <= maxBucketIds).drop("rn")

  /** Side report of the buckets the cap saturated: (k, bv, n_members,
    * n_dropped) for every bucket past `maxBucketIds`. A hot bucket is
    * boilerplate signal, not near-dup signal (the q79 stop-shingle
    * argument in band space) — at 100 TB this report is what a nightly
    * run consumes (feed the members to boilerplate removal), NEVER the
    * recovered pair list, whose size is exactly the b² blow-up the cap
    * exists to prevent. */
  def bandSaturationReport(store: DataFrame, maxBucketIds: Int): DataFrame =
    store.groupBy(col("k"), col("bv"))
      .agg(count(lit(1)).cast("long").as("n_members"))
      .filter(col("n_members") > maxBucketIds)
      .select(col("k"), col("bv"), col("n_members"),
        (col("n_members") - maxBucketIds).cast("long").as("n_dropped"))

  /** Candidate pairs from a band-row frame: one self-join on
    * (band-index, band-value) instead of a per-band join union —
    * band-equality within the same index IS the (k, bv) equi-join, so
    * candidates come from a single shuffle stage.
    *
    * `maxBucketIds` caps members per bucket BEFORE the self-join
    * (deterministically — lowest ids; see [[capBandStore]]): a
    * boilerplate-heavy corpus otherwise puts b documents in one
    * bucket and this join emits b²/2 rows on a single shuffle key —
    * the one uncapped quadratic the LSH family had left. Capped runs
    * bound every bucket's contribution at maxBucketIds²/2 and account
    * for the remainder via [[bandSaturationReport]]; q114
    * gate-verifies that capped ∪ diverted reconciles with uncapped.
    * Default Int.MaxValue = uncapped (q31/q97-era behavior). */
  private def bandCandidates(store: DataFrame,
                             maxBucketIds: Int = Int.MaxValue): DataFrame = {
    val side = if (maxBucketIds == Int.MaxValue) store
               else capBandStore(store, maxBucketIds)
    side.select(col("k"), col("bv"), col("doc_id").as("d1"))
      .join(side.select(col("k"), col("bv"), col("doc_id").as("d2")), Seq("k", "bv"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2")).distinct()
  }

  /** MinHash-LSH candidate pairs verified with exact Jaccard.
    *
    * The verify step computes Jaccard ONLY for LSH candidates — see
    * verifyJaccard. This is what makes the LSH path the 100 TB plan:
    * band-bucket join for candidates, then a narrow verify join. */
  def minhashLshPairs(docs: DataFrame, threshold: Double,
                      sh: Option[DataFrame] = None,
                      maxBucketIds: Int = Int.MaxValue): DataFrame = {
    val shingleFrame = sh.getOrElse(shingleSet(docs, 3))
    val cands = bandCandidates(
      bandRows(withBands(minhashSignatures(shingleFrame))), maxBucketIds)
    verifyJaccard(cands, shingleFrame, shingleCounts(docs), threshold)
  }

  /** Capped LSH pairs WITH the reconciliation the cap diverts — the
    * identity q114 gate-verifies:
    *
    *   minhashLshPairs (uncapped) ≡ this output, with `via` marking
    *   how each pair was found: 'capped' = the capped candidate join
    *   alone finds it (both members within the bucket cap in some
    *   band), 'overflow' = only recoverable through a saturated
    *   bucket's diverted members.
    *
    * The overflow recovery join (diverted rows × their full buckets)
    * is TEST-SCALE machinery: it re-creates exactly the hot-bucket
    * blow-up the cap prevents, and exists so the gate can prove the
    * cap loses nothing it didn't account for. A 100 TB run calls
    * minhashLshPairs(maxBucketIds = …) + bandSaturationReport and
    * routes saturated buckets to boilerplate removal instead. */
  def minhashLshPairsCapped(docs: DataFrame, threshold: Double,
                            maxBucketIds: Int,
                            sh: Option[DataFrame] = None): DataFrame = {
    val shingleFrame = sh.getOrElse(shingleSet(docs, 3))
    // ranked rows feed four consumers (both capped join sides, the
    // overflow probe, the full-store probe side) — materialize once
    val ranked = rankedBandStore(
      bandRows(withBands(minhashSignatures(shingleFrame))))
      .localCheckpoint(true)
    // same candidate semantics as the production path: bandCandidates
    // over the pre-capped store (capping here re-uses the shared
    // checkpointed ranking instead of bandCandidates' own capBandStore)
    val cappedCands = bandCandidates(
      ranked.filter(col("rn") <= maxBucketIds).drop("rn"))
    // pairs involving a diverted member: probe the FULL buckets with
    // the overflow rows only; least/greatest canonicalizes because a
    // diverted id can sit on either side of its partners
    val overCands = ranked.filter(col("rn") > maxBucketIds)
      .select(col("k"), col("bv"), col("doc_id").as("da"))
      .join(ranked.select(col("k"), col("bv"), col("doc_id").as("db")), Seq("k", "bv"))
      .filter(col("da") =!= col("db"))
      .select(least(col("da"), col("db")).as("d1"),
        greatest(col("da"), col("db")).as("d2")).distinct()
    // label with capped-path priority: a pair found by both routes is
    // 'capped' (the oracle labels identically via EXISTS-on-capped)
    val labeled = cappedCands.withColumn("via", lit("capped"))
      .unionByName(overCands.join(cappedCands, Seq("d1", "d2"), "left_anti")
        .withColumn("via", lit("overflow")))
      .localCheckpoint(true)
    verifyJaccard(labeled.select(col("d1"), col("d2")),
        shingleFrame, shingleCounts(docs), threshold)
      .join(labeled, Seq("d1", "d2"))
      .select(col("d1"), col("d2"), col("jaccard"), col("via"))
  }

  /** LSH pairs read from an already-materialized band store (the
    * persisted nightly artifact — signatures are NOT recomputed):
    * candidates from the store's band self-join, verified over `docs`,
    * which must cover every doc id in the store. Same output as
    * minhashLshPairs over the same corpus. `sh` optionally supplies a
    * (cached) shingle frame that must equal shingleSet(docs, 3). */
  def lshPairsFromStore(store: DataFrame, docs: DataFrame,
                        threshold: Double,
                        sh: Option[DataFrame] = None,
                        maxBucketIds: Int = Int.MaxValue): DataFrame =
    verifyJaccard(bandCandidates(store, maxBucketIds),
      sh.getOrElse(shingleSet(docs, 3)),
      shingleCounts(docs), threshold)

  /** O(delta) incremental re-dedup: near-dup pairs INVOLVING at least
    * one document of `delta`, found by probing the persisted band
    * store of the already-ingested corpus with only the delta's band
    * rows.
    *
    * Nightly contract (the engine analog of an incremental crawler's
    * stop-on-seen): after ingesting batch Δ into a corpus C whose
    * pairs P(C) and band store S(C) are already persisted,
    *   P(C ∪ Δ) = P(C) ∪ incrementalLshPairs(S(C), C, Δ)
    * EXACTLY — a MinHash signature depends only on the document's own
    * shingles, so old-old pairs cannot change when documents arrive,
    * and every new pair touches Δ. The new store is
    * S(C) ∪ minhashBandStore(Δ). Re-dedup cost per night is
    * O(|Δ| + |candidates|), never O(|C|): the candidate join's probe
    * side is the delta's band rows (broadcast-sized for a typical
    * nightly batch; at 100 TB persist the store bucketed by (k, bv)
    * so the probe shuffles only the delta), and the verify step
    * re-shingles ONLY candidate documents — the corpus frame is
    * touched by one semi-join on the candidate id list.
    *
    * AnalyticsSpec proves stored ∪ incremental ≡ full recompute across
    * two successive deltas; q97 gate-verifies the same identity
    * against the DuckDB full-corpus oracle. */
  def incrementalLshPairs(bandStore: DataFrame, corpus: DataFrame,
                          delta: DataFrame, threshold: Double): DataFrame = {
    val shDelta = shingleSet(delta, 3)
    // |delta|x4 rows; materialized because the probe join consumes it
    // on BOTH sides (delta-delta pairs) and the signature agg would
    // re-run per side — and it IS the store increment a nightly run
    // persists, so materializing mirrors the real pipeline.
    val deltaBands = bandRows(withBands(minhashSignatures(shDelta)))
      .localCheckpoint(true)
    // Probe old + new bands with the delta side only; least/greatest
    // canonicalizes because old and new ids interleave (an anti-join
    // on d1 < d2 would drop old<delta pairs seen from the delta side).
    val full = bandStore.unionByName(deltaBands)
    // Materialize the candidate list (localCheckpoint): it is tiny —
    // output-sized — but it feeds FIVE downstream branches (the ids
    // union's two, the verify chain via both shingle joins, the size
    // joins), and Spark re-evaluates shared subplans per branch, so an
    // unmaterialized candidate frame re-runs the delta signature agg
    // and store probe ~5x (measured: 3.7 s → 1.3 s on the q97 split).
    // A real nightly materializes candidates anyway before verify.
    val cands = deltaBands.select(col("k"), col("bv"), col("doc_id").as("da"))
      .join(full.select(col("k"), col("bv"), col("doc_id").as("db")), Seq("k", "bv"))
      .filter(col("da") =!= col("db"))
      .select(least(col("da"), col("db")).as("d1"),
        greatest(col("da"), col("db")).as("d2"))
      .distinct()
      .localCheckpoint(true)
    // Verify against shingles of CANDIDATE docs only: one narrow
    // semi-join restricts the corpus scan to matched old documents;
    // materialized too (candidate-doc-sized) because shingleSet and
    // shingleCounts each traverse it.
    val ids = cands.select(col("d1").as("doc_id"))
      .unionByName(cands.select(col("d2").as("doc_id"))).distinct()
    val docsNeeded = corpus.unionByName(delta)
      .join(ids, Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    verifyJaccard(cands, shingleSet(docsNeeded, 3),
      shingleCounts(docsNeeded), threshold)
  }

  /** Nightly GC of the incremental-dedup artifacts (what the q103
    * compaction report prices): rewrite the band store dropping the
    * rows of documents a keeper-only compaction removes — the
    * non-keepers of `components` (nearDupComponents /
    * componentsLargeSmallStar output; docs absent from it are
    * singletons and always kept). One anti-join on doc_id: the
    * dropped set is output-sized (non-keepers ≪ corpus), so AQE
    * broadcasts it and the store streams map-only; at 100 TB a store
    * bucketed by (k, bv) keeps its bucketing through this rewrite
    * because the anti-join never touches the (k, bv) key.
    * Invariant (AnalyticsSpec): store′ = store ∖ {rows of dropped
    * docs}, exactly — store′ ∪ droppedRows = store, store′ ∩
    * droppedRows = ∅. Future deltas probe keepers only, which is
    * sound BECAUSE compaction also removed the non-keeper documents
    * themselves: a new document near-dup to a dropped one is near-dup
    * to its keeper by transitivity of the cluster. */
  /** LEAKAGE-SAFE train/validation split: near-dup COMPONENTS are
    * assigned to splits WHOLE, so a document and its near-duplicates
    * can never straddle train and eval — the contamination channel
    * plain per-document random splits leave open (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better",
    * measure exactly this leak). Every document takes its component
    * label (itself when it is a singleton), the split key is the
    * 3-nibble sha bucket OF THE LABEL ([[graft.ops.Mixture.shaBucket]]
    * — the engine-wide deterministic sample key, q130/q157's
    * spelling), and `bucket < valBuckets` sends the whole group to
    * validation (410/4096 ≈ 10%). Deterministic, rerun- and
    * reshard-stable, and mergeable: membership depends only on
    * (component label, threshold). One broadcast-sized join (the
    * component list is near-dup-output-sized); the corpus side
    * streams map-only.
    *
    * AnalyticsSpec pins the invariant: NO near-dup pair straddles
    * the split, at every threshold. */
  def leakageSafeSplit(docIds: DataFrame, components: DataFrame,
                       valBuckets: Long = 410): DataFrame =
    docIds.select(col("doc_id"))
      .join(components.select(col("doc_id"), col("component")),
        Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
      .withColumn("bucket", graft.ops.Mixture.shaBucket(col("component")))
      .withColumn("split",
        when(col("bucket") < valBuckets, "val").otherwise("train"))

  def compactBandStore(store: DataFrame, components: DataFrame): DataFrame =
    store.join(
      components.filter(col("is_keeper") === false).select(col("doc_id")),
      Seq("doc_id"), "left_anti")

  /** Connected components over a near-dup pair list: every document
    * gets the MIN doc_id of its transitive near-dup group as its
    * component label — the canonical "keep one copy of each near-dup
    * cluster" step that follows pair generation in a dedup pipeline.
    *
    * Algorithm: iterative min-label propagation (each round, a node
    * takes the min of its own label and its neighbors' labels) with a
    * driver-side convergence check — the standard scalable CC
    * formulation (cf. Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14). Rounds = O(component diameter);
    * near-dup clusters are small and dense, so 2–4 rounds converge.
    * Each round is one shuffle-join on node id + one groupBy min.
    * Lineage is truncated per round (localCheckpoint) — without it
    * the plan doubles every iteration. The pair list is assumed ≪
    * corpus (it is the OUTPUT of LSH/Jaccard thresholding); docs with
    * no near-dup partner are implicit singletons and not emitted. */
  def nearDupComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .unionByName(pairs.select(col("d2").as("src"), col("d1").as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("node").as("dst"), col("label").as("nl")), "dst")
        .groupBy(col("src")).agg(min(col("nl")).as("nmin"))
        .select(col("src").as("node"), col("nmin"))
      val updated = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"), col("label"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("next"))
        .localCheckpoint(true)
      changed = updated.filter(col("next") < col("label")).count()
      labels = updated.select(col("node"), col("next").as("label"))
      i += 1
    }
    // A silent cap would return WRONG labels for any component whose
    // diameter exceeds maxIter — fail loudly; long-diameter graphs
    // should use componentsLargeSmallStar (O(log n) rounds) instead.
    require(changed == 0,
      s"nearDupComponents did not converge in $maxIter rounds " +
        "(component diameter too large) — use componentsLargeSmallStar")
    labels.select(col("node").as("doc_id"), col("label").as("component"),
      (col("node") === col("label")).as("is_keeper"))
  }

  /** Canonical-document election: which copy SURVIVES dedup. The
    * min-id keeper nearDupComponents emits is arbitrary; a curation
    * pipeline keeps the best member of each cluster under an explicit
    * policy — here max quality, doc_id tiebreak (q26's score in
    * q147's gate; any (doc_id, quality) frame works). Election is the
    * two-stage-argmax idiom (q40): ONE max(struct(quality, -doc_id))
    * partial agg per cluster, map-side combined — no window over the
    * corpus. Output: per clustered doc (doc_id, component, quality,
    * keeper_id, is_keeper).
    *
    * @param labels  (doc_id, component) cluster labels
    *                (nearDupComponents / componentsLargeSmallStar output)
    * @param quality (doc_id, quality) — the policy score; rounded
    *                doubles compare exactly across engines */
  def canonicalKeepers(labels: DataFrame, quality: DataFrame): DataFrame = {
    val m = labels.select(col("doc_id"), col("component"))
      .join(quality, Seq("doc_id"))
    val keep = m.groupBy(col("component"))
      .agg(max(struct(col("quality"), (-col("doc_id")).as("nid"))).as("b"))
      .select(col("component"), (-col("b.nid")).cast("long").as("keeper_id"))
    m.join(keep, Seq("component"))
      .select(col("doc_id"), col("component"), col("quality"),
        col("keeper_id"), (col("doc_id") === col("keeper_id")).as("is_keeper"))
  }

  /** Connected components by alternating large-star / small-star
    * rounds (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — converges in O(log n) rounds regardless of
    * component DIAMETER, where min-label propagation needs
    * diameter-many rounds. The scale path for chain-shaped duplicate
    * graphs (paraphrase chains, boilerplate drift): a 300-hop path
    * converges in ~10 rounds here vs 300 for label propagation.
    *
    *  - large-star: every node connects its LARGER neighbors to its
    *    minimum neighborhood member;
    *  - small-star: every node connects its smaller-or-equal
    *    neighbors (and itself) to that minimum.
    * Each star half is ONE window-min over its orientation key
    * ([[lssRound]] — round 17); lineage truncated per round; the edge
    * set only contracts. Output contract matches nearDupComponents:
    * (doc_id, component = min id of the group, is_keeper). */
  def componentsLargeSmallStar(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    var edges = lssCanon(pairs.select(col("d1").as("u"), col("d2").as("v")))
      .localCheckpoint(true)
    // the previous round's cardinality, carried in a driver var: the
    // convergence check needs |edges|, and re-counting the already-
    // checkpointed frame was one whole extra job per round (round 16)
    var prevN = edges.count()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val afterSmall = lssRound(edges).localCheckpoint(true)
      // set equality via count + ONE-way except: both frames are
      // distinct (canon ends in .distinct()), so |A| = |B| ∧ A∖B = ∅
      // ⟹ A = B. A bare one-way except would miss rounds that only
      // SHRINK the edge set; the count comparison (a cheap agg job)
      // restores soundness at half the exceptAll cost.
      val n = afterSmall.count()
      changed =
        if (n != prevN) 1L
        else afterSmall.exceptAll(edges).count()
      prevN = n
      edges = afterSmall
      i += 1
    }
    require(changed == 0,
      s"componentsLargeSmallStar did not converge in $maxIter rounds")
    // converged edge set is a star forest: (node, root)
    val roots = edges.select(col("v")).distinct()
      .join(edges.select(col("u").as("v")), Seq("v"), "left_anti")
      .select(col("v").as("node"), col("v").as("label"))
    edges.select(col("u").as("node"), col("v").as("label"))
      .unionByName(roots)
      .distinct()
      .select(col("node").as("doc_id"), col("label").as("component"),
        (col("node") === col("label")).as("is_keeper"))
  }

  /** Canonical distinct (u > v) edge set — the LSS loop invariant. */
  private def lssCanon(df: DataFrame): DataFrame =
    df.filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()

  /** ONE large-star + small-star round over a canonical (u > v,
    * distinct) edge set — factored out of [[componentsLargeSmallStar]]
    * so its plan shape is assertable (PlanSpec) and dumpable.
    *
    * Round 17: each star half is a single WINDOW-MIN over its
    * orientation key instead of groupBy-min + join-back — the q186
    * linear-plan rule. The join spelling paid, per half, one exchange
    * of the partial-agged mins PLUS one exchange (or broadcast build)
    * of the full edge frame for the join; the window pays exactly one
    * edge-frame exchange and evaluates the min in place. 5 exchanges +
    * 2 join builds per round → 3 exchanges per round; set-identical
    * output per half (same min, same emitted pairs):
    *  - large-star over both directions b: m = least(u, min(v) over
    *    partition u); emit (v, m) for v > u. Identical to joining
    *    b against groupBy(u).min(v) — per row, same m.
    *  - small-star over afterLarge (already u > v): m = min(v) over
    *    partition u; emit (v, m) per row AND (u, m) — the original
    *    mS.select(u, m) union emitted (u, m) once per group; here it
    *    rides every row and the k−1 extra copies collapse in the
    *    final distinct's map-side partial (co-partitioned by
    *    construction: rows leave the window partitioned by u).
    * afterLarge stays un-distinct'd mid-round (round 16): its only
    * consumer is the duplicate-insensitive window-min feeding the
    * round's FINAL distinct. */
  private[analytics] def lssRound(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("u"))
    val b = edges.unionByName(edges.select(col("v").as("u"), col("u").as("v")))
    val afterLarge = b
      .withColumn("m", least(col("u"), min(col("v")).over(w)))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
    val afterSmall = afterLarge
      .withColumn("m", min(col("v")).over(w))
      .select(explode(array(
        struct(col("v").as("u"), col("m").as("v")),
        struct(col("u").as("u"), col("m").as("v")))).as("t"))
      .select(col("t.u").as("u"), col("t.v").as("v"))
    lssCanon(afterSmall)
  }

  /** 32 bits / 4 bands of 8: 256 buckets per band keeps the banded
    * candidate join sparse (16-bit signatures made buckets of n/16
    * docs → millions of candidate pairs at sf0.1; 8-bit bands cut
    * that ~16x) while the pigeonhole guarantee (≤ 3 flipped bits
    * leaves one band intact) still holds. */
  val SIMHASH_BITS = 32
  val SIMHASH_BANDS = 4

  /** Per-token 32-bit hash: first 8 hex chars of sha256(token). */
  def tokenHash32(w: Column): Column =
    conv(substring(sha2(w, 256), 1, 8), 16, 10).cast("long")

  /** SimHash signature over token-frequency-weighted bit votes. */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    // parallelism floor: the per-token sha-256 vote pass is the cost,
    // and it otherwise runs on the document scan's split count
    // (1 task for a single-row-group file; no-op at real scale)
    val toks = graft.ops.Guards.parallelismFloor(
        docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .withColumn("v", tokenHash32(col("w")))
    val sig = (0 until SIMHASH_BITS).map { b =>
      when(sum(shiftright(col("v"), b).bitwiseAND(lit(1L)) * 2 - 1) >= 0, lit(1L))
        .otherwise(lit(0L)) * (1L << b)
    }.reduce(_ + _)
    toks.groupBy(col("doc_id")).agg(sig.as("sig"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist, found by
    * banding (pigeonhole: <= 3 flipped bits over 4 bands leaves one
    * band intact), never by cross join. */
  def simhashPairs(docs: DataFrame, maxDist: Int = 2): DataFrame = {
    val sig = simhashSignatures(docs)
    val bitsPerBand = SIMHASH_BITS / SIMHASH_BANDS
    val banded = sig.select(col("doc_id"), col("sig"),
      explode(array((0 until SIMHASH_BANDS).map(lit): _*)).as("k"))
      .withColumn("band",
        expr(s"shiftright(sig, cast(k * $bitsPerBand AS int))").bitwiseAND(lit((1 << bitsPerBand) - 1)))
    val l = banded.select(col("k"), col("band"), col("doc_id").as("d1"), col("sig").as("sig1"))
    val r = banded.select(col("k"), col("band"), col("doc_id").as("d2"), col("sig").as("sig2"))
    // Hamming filter BEFORE the dedup shuffle: filter and distinct
    // commute here, and the filter drops ~99.9% of banded candidates,
    // so the distinct shuffles thousands of rows instead of millions.
    l.join(r, Seq("k", "band")).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        bit_count(col("sig1").bitwiseXOR(col("sig2"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  /** Every k-token span occurrence — (doc_id, pos, h) where h is the
    * 16-hex sha-256 prefix of the space-joined span. The corpus-wide
    * substring multiset behind EXACT span-level dedup (cf. Lee et
    * al., "Deduplicating Training Data Makes Language Models Better",
    * ACL'22 — repeated long spans are memorization fuel that set-
    * similarity dedup misses when the containing documents differ).
    * Unlike shingleSet this keeps MULTIPLICITY and POSITION: the same
    * span at three positions is three rows. Map-only (the native
    * SpanExplode generator — one pass, one builder); the 8-byte key
    * keeps the shuffled rows narrow and uniformly distributed — no
    * span text ever shuffles. */
  def spanOccurrences(docs: DataFrame, k: Int): DataFrame =
    // parallelism floor: the span explode + per-span sha-256 is the
    // family's map-side cost and otherwise runs on the document
    // scan's split count (the simhashSignatures rationale)
    graft.ops.Guards.parallelismFloor(
        docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        graft.functions.SpanExplode.span_explode(col("text"), k))
      .select(col("doc_id"), col("pos"),
        substring(sha2(col("s"), 256), 1, 16).as("h"))

  /** The removal list of exact span dedup: every span occurring ≥ 2
    * times corpus-wide, with occurrence count, distinct-document
    * count, and the lowest containing doc_id (the canonical keeper).
    * Two-stage aggregation — (h, doc_id) partials, then per-h — so
    * the distinct-doc count never plans an Expand (the q40 lesson)
    * and both shuffles are partial-agg reduced map-side. */
  def repeatedSpanGroups(docs: DataFrame, k: Int): DataFrame =
    spanOccurrences(docs, k)
      .groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("c"))
      .groupBy(col("h"))
      .agg(sum(col("c")).as("n_occ"), count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_occ") >= 2)

  /** Per-document duplicated-span profile — the span-level filter
    * signal: of a document's n_spans k-token windows, n_dup occur at
    * least twice corpus-wide (anywhere, any document, the document's
    * own repeats included). dup_frac is the Lee-et-al-style "how much
    * of this text exists elsewhere" score a filtering pass thresholds
    * on. Shapes: one partial-agged span-count groupBy, one semi-join
    * on the uniform sha key, one per-doc count; n_spans is computed
    * map-side from the token count, never from the exploded frame.
    * The occurrence scan has two consumers and is cheap to recompute
    * (map-only), so it is not persisted — the ≥3-consumer rule.
    * Skew note: the count aggregate reduces a corpus-wide boilerplate
    * span map-side (partial agg), but the semi-join's probe side
    * shuffles every occurrence of it to one partition — AQE's
    * skew-join split handles that; for adversarial boilerplate apply
    * the q79 df-cap idea first (drop spans above a document-frequency
    * cap and report them separately — they are removal candidates by
    * definition, not filter-signal). */
  def spanDupProfile(docs: DataFrame, k: Int): DataFrame = {
    val occ = spanOccurrences(docs, k)
    val dup = occ.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
    val perDoc = occ.join(dup.select(col("h")), Seq("h"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
    val base = docs.select(col("doc_id"),
        greatest(size(tokens(col("text"))) - (k - 1), lit(0))
          .cast("long").as("n_spans"))
      .filter(col("n_spans") > 0)
    base.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        graft.ops.Exact.duckRound(
          coalesce(col("n_dup"), lit(0L)).cast("double") / col("n_spans").cast("double"),
          4).as("dup_frac"))
  }

  /** spanDupProfile with the q79 df-cap applied to spans — the
    * adversarial-boilerplate spelling the uncapped profile's scaladoc
    * names: a span whose distinct-DOCUMENT frequency exceeds `dfCap`
    * is boilerplate (headers, licenses, templates), not near-dup
    * signal, so it is EXCLUDED from n_dup and reported separately as
    * n_capped — removal candidates by definition. At scale this is
    * what bounds the semi-join skew the uncapped profile leaves to
    * AQE: a corpus-wide boilerplate span's occurrence rows all carry
    * the same `h`, and here they drop out of the dup-signal join by
    * classification instead of shuffling to one partition.
    *
    * Output per document: (doc_id, n_spans, n_dup, n_capped,
    * dup_frac = n_dup / n_spans). Invariant vs the uncapped profile
    * (AnalyticsSpec proves it): for dfCap ≥ 1 every capped span is a
    * dup span (df > dfCap ≥ 1 ⇒ ≥ 2 occurrences), so
    *   n_dup_uncapped = n_dup_capped + n_capped   exactly,
    * and n_dup_capped ≤ n_dup_uncapped row for row.
    *
    * Shapes: the same two-stage (h, doc)→h aggregation as
    * repeatedSpanGroups (no Expand), then ONE h-join of occurrences
    * against the classified span dictionary filtered to dup∪capped
    * rows (class 0 spans never join), one per-doc count of each
    * class. */
  def spanDupProfileCapped(docs: DataFrame, k: Int, dfCap: Long): DataFrame = {
    val occ = spanOccurrences(docs, k)
    val cls = spanDictionary(occ).select(col("h"),
        when(col("n_docs") > dfCap, lit(2))
          .when(col("n_occ") >= 2, lit(1))
          .otherwise(lit(0)).as("cl"))
      .filter(col("cl") =!= 0)
    classifiedSpanProfile(docs, occ, cls, k)
  }

  /** spanDupProfileCapped with the boilerplate threshold RELATIVE to
    * corpus size — the scale-free spelling the round-9 10× run showed
    * the absolute cap needs: replicating every document 10× pushed
    * every genuinely-duplicated span's distinct-doc frequency past
    * q107's fixed dfCap (1,697,788 of 1,713,998 dup occurrences
    * reclassified as boilerplate, SCALING.md), so the dup SIGNAL
    * collapsed exactly when duplication exploded. Here the cap is
    * `max(ceil(dfFrac · |docs|), minCap)`: under N× corpus
    * replication both a span's df and the threshold grow N×, so the
    * boilerplate/near-dup classification is replication-invariant —
    * the q118-vs-q79 relative-beats-absolute lesson applied to
    * spans. dfFrac is "a span in more than this fraction of the
    * corpus is template text" (licenses, headers) — the Lee et al.
    * boilerplate intuition stated scale-free; minCap keeps tiny
    * corpora from capping ordinary 3-doc dups.
    *
    * The corpus count enters the PLAN as a 1-row broadcast attached
    * to the span dictionary on a non-foldable constant key (the
    * Guards.gate spelling — a literal key would constant-fold into a
    * BroadcastNestedLoopJoin): no driver-side count action, one
    * query execution. Same output shape and the same
    * n_dup + n_capped = uncapped-n_dup identity as the absolute
    * spelling (AnalyticsSpec proves both). */
  def spanDupProfileRelCapped(docs: DataFrame, k: Int, dfFrac: Double,
                              minCap: Long = 2): DataFrame = {
    val occ = spanOccurrences(docs, k)
    val capRow = docs.agg(count(lit(1)).as("n_corpus"))
      .select(
        (pmod(col("n_corpus"), lit(1L)) + lit(1L)).cast("int").as("_g"),
        greatest(ceil(lit(dfFrac) * col("n_corpus")).cast("long"),
          lit(minCap)).as("df_cap"))
    val cls = spanDictionary(occ)
      .withColumn("_g", (pmod(col("n_docs"), lit(1L)) + lit(1L)).cast("int"))
      .join(broadcast(capRow), Seq("_g"))
      .select(col("h"),
        when(col("n_docs") > col("df_cap"), lit(2))
          .when(col("n_occ") >= 2, lit(1))
          .otherwise(lit(0)).as("cl"))
      .filter(col("cl") =!= 0)
    classifiedSpanProfile(docs, occ, cls, k)
  }

  /** Two-stage (h, doc)→h span dictionary — no Expand (q40 lesson). */
  private def spanDictionary(occ: DataFrame): DataFrame =
    occ.groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("c"))
      .groupBy(col("h"))
      .agg(sum(col("c")).as("n_occ"), count(lit(1)).as("n_docs"))

  /** Shared tail of the capped profiles: one h-join of occurrences
    * against the classified dictionary (class-0 spans never join),
    * per-doc counts of each class, profile columns. */
  private def classifiedSpanProfile(docs: DataFrame, occ: DataFrame,
                                    cls: DataFrame, k: Int): DataFrame = {
    val perDoc = occ.join(cls, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(when(col("cl") === 1, lit(1))).as("n_dup"),
        count(when(col("cl") === 2, lit(1))).as("n_capped"))
    val base = docs.select(col("doc_id"),
        greatest(size(tokens(col("text"))) - (k - 1), lit(0))
          .cast("long").as("n_spans"))
      .filter(col("n_spans") > 0)
    base.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        coalesce(col("n_capped"), lit(0L)).as("n_capped"),
        graft.ops.Exact.duckRound(
          coalesce(col("n_dup"), lit(0L)).cast("double") / col("n_spans").cast("double"),
          4).as("dup_frac"))
  }

  /** Span-dedup REWRITE — the actual output of exact substring dedup
    * (Lee et al. 2022 §4.1: when a k-token span repeats corpus-wide,
    * keep ONE occurrence and delete the rest), where q100/q101
    * profile and q103 drops whole documents. The canonical occurrence
    * of a duplicated span is its minimum (doc_id, pos) — one
    * `min(struct)` partial agg on the 8-byte span key, no window, no
    * global sort (the q40/q144 idiom). Every NON-canonical occurrence
    * of a duplicated span marks its k positions removed; a document's
    * kept tokens rebuild in position order. Within-doc repeats dedup
    * too (the second occurrence is non-canonical by pos order) — the
    * paper's semantics.
    *
    * Output: per doc, original token count, removed count, and the
    * sha-256 of the rewritten text (the artifact a release manifests;
    * emitting megabytes of rewritten text from the gate query would
    * verify the same bytes slower). A fully-deleted doc keeps the
    * empty-string sha.
    *
    * Scale shape: occurrences and the duplicated-span dictionary are
    * q100's frames (two partial-agged shuffles on the uniform 8-byte
    * key). The removal set explodes k rows per non-canonical
    * duplicated occurrence — OUTPUT-bound, like all removal work. The
    * rebuild is the only token-level shuffle (inherent: the operator
    * rewrites the corpus) and its per-doc state is doc-length
    * bounded; collect_list + array_sort run per document, never
    * corpus-wide. Boilerplate skew: a corpus-wide boilerplate span
    * shuffles its occurrences to one h partition — AQE skew split
    * handles moderate cases; adversarial corpora apply the q79 df-cap
    * first (a span above the cap is removal-candidate-by-definition;
    * cap survivors rewrite exactly). */
  def spanDedupRewrite(docs: DataFrame, k: Int = 8): DataFrame = {
    val occ = spanOccurrences(docs, k)
    val dup = occ.groupBy(col("h"))
      .agg(count(lit(1)).as("c"),
        min(struct(col("doc_id"), col("pos"))).as("canon"))
      .filter(col("c") >= 2)
      .select(col("h"), col("canon.doc_id").as("cd"), col("canon.pos").as("cp"))
    val removed = occ.join(dup, Seq("h"))
      .filter(!(col("doc_id") === col("cd") && col("pos") === col("cp")))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("p"))
      .distinct()
    val toks = docs.select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("p0", "w")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("w"))
    val rebuilt = toks.join(removed, Seq("doc_id", "p"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        sha2(array_join(
          transform(array_sort(collect_list(struct(col("p"), col("w")))),
            x => x.getField("w")), " "), 256).as("sha"))
    docs.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("sha"), sha2(lit(""), 256)).as("rewritten_sha"))
  }

  /** Contamination span profile (q158): for every (corpus doc, bench
    * doc) pair sharing k-grams, the longest contiguous run of matched
    * corpus positions — span_tokens = run + k−1 means every k-window
    * inside that corpus span appears somewhere in the bench doc (the
    * n-gram-collision window of decontamination reports) — plus total
    * matched positions and run count.
    *
    * Shape at scale: corpus-side positional k-grams (native
    * SpanExplode, map-only) are Bloom-pruned MAP-SIDE against the
    * union of benchmark grams before the equi-join attaches bench ids
    * ([[graft.ops.Dedup.bloomProbe]]; the inner join resolves false
    * positives exactly) — at real <1% hit rates the join input is
    * ~the hit set, not the corpus. Runs via i − row_number under a
    * (doc, bench) PARTITIONED window: per-pair rows are bounded by
    * document length, never a global sort. */
  def contaminationSpans(docs: DataFrame, isBench: Column, k: Int = 4,
                         expectedBenchGrams: Long = 1L << 18): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sp = docs.select(col("doc_id"), isBench.as("is_bench"),
      graft.functions.SpanExplode.span_explode(col("text"), k).as(Seq("i", "s")))
    val cg = sp.filter(!col("is_bench"))
    val bg = sp.filter(col("is_bench"))
      .select(col("doc_id").as("bench_id"), col("s")).distinct()
    val m = graft.ops.Dedup
      .bloomProbe(cg, bg.select("s"), "s", expectedBenchGrams)
      .join(bg, Seq("s"))
      .select(col("doc_id"), col("bench_id"), col("i").cast("long").as("i"))
      .distinct()
    val w = Window.partitionBy("doc_id", "bench_id").orderBy("i")
    m.withColumn("grp", col("i") - row_number().over(w))
      .groupBy("doc_id", "bench_id", "grp")
      .agg(count(lit(1)).as("run_len"))
      .groupBy("doc_id", "bench_id")
      .agg((max("run_len") + (k - 1)).as("span_tokens"),
        sum("run_len").as("n_matches"), count(lit(1)).as("n_runs"))
  }
}
