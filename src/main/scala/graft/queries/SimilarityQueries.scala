package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.analytics.Similarity

/** Embedding similarity search + multimodal column plumbing.
  * Oracle parity notes: embeddings are cast FLOAT→DOUBLE up front
  * (exact); dot products are folded in array order on both engines;
  * the similarity is rounded to 6 decimals at the output boundary so
  * sub-ulp summation-order noise cannot flip the compare; ranks are
  * computed over the ROUNDED value with a vec_id tiebreak so ordering
  * is engine-independent.
  */
object SimilarityQueries {

  private val N_QUERIES = 10
  private val TOP_K = 10
  private val N_PLANES = 6
  private val DIM = 64

  // q148 hybrid search: seed docs, per-arm depth, fused output depth
  private val N_SEEDS = 3
  private val K_ARM = 20
  private val K_OUT = 10

  /** Prebuilt IVF-PQ stores, memoized per sf dir — the bench-only
    * serve-path fixture behind `x_ivfpq_serve` (Bench.extraProbes):
    * the gate query q154 necessarily pays training + store BUILD to
    * prove the identity; this memo is what lets the probe price the
    * nightly SERVE alone (first repeat builds, best-of-N keeps the
    * store-hit run — the dedup-family cache pattern). Models train on
    * the full corpus here: the production store covers everything. */
  private val storeMemo =
    new java.util.concurrent.ConcurrentHashMap[String,
      (DataFrame, Array[(Int, Int, Array[Double])], DataFrame, DataFrame)]
  def ivfPqStores(s: SparkSession, d: String):
      (DataFrame, Array[(Int, Int, Array[Double])], DataFrame, DataFrame) =
    storeMemo.computeIfAbsent(d, _ => {
      val e = Tables.embeddings(s, d)
      val cent = Similarity.kmeansCentroids(e, 16, 1).localCheckpoint(true)
      val books = Similarity.pqTrainCodebooks(e, PQ_SUB, 16)
      val coarse = Similarity.kmeansAssign(e, cent).localCheckpoint(true)
      val codes = Similarity.pqEncode(e, books).localCheckpoint(true)
      (cent, books, coarse, codes)
    })

  /** The store-served retrieve over [[ivfPqStores]] — the probe body. */
  def ivfPqServeFrame(s: SparkSession, d: String): DataFrame = {
    val (cent, books, coarse, codes) = ivfPqStores(s, d)
    Similarity.ivfPqRerankTopKFromStore(
        Tables.embeddings(s, d).filter(col("vec_id") < N_QUERIES),
        coarse, codes, cent, books, TOP_K, PQ_RERANK, nProbe = 2)
      .orderBy("qid", "rnk")
  }

  /** Deterministic CLUSTERED corpus fixture for the
    * `x_simbrute_clustered` / `x_simserve_clustered` probes
    * (Bench.extraProbes): 400,000 64-dim vectors in 64 tight
    * axis-aligned balls (cluster c = vec_id % 64 spikes dim c at 10,
    * every dim carries a small seeded jitter) — the regime where
    * RewriteSimTopK's bound pruning bites, which the near-isotropic
    * gate embeddings deliberately cannot show (q98's frontier).
    * Memoized per session with the store artifacts (centroids trained
    * once, radii collected once) so best-of-N prices the SERVE, not
    * the nightly build — the x_ivfpq_serve convention. */
  private val clusterMemo =
    new java.util.concurrent.ConcurrentHashMap[String,
      (DataFrame, DataFrame, Array[(Long, Array[Double], Double)], Map[Long, Double])]
  def clusteredFixture(s: SparkSession):
      (DataFrame, DataFrame, Array[(Long, Array[Double], Double)], Map[Long, Double]) =
    clusterMemo.computeIfAbsent("fix", _ => {
      val jitter = (id: org.apache.spark.sql.Column, j: org.apache.spark.sql.Column) =>
        ((id * lit(1315423911L) + j.cast("long") * lit(2654435761L)) % 1000L)
          .cast("double") / lit(1000.0) * lit(0.05)
      val corpus = s.range(400000).select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(63)), j =>
            (jitter(col("id"), j) +
              when(j.cast("long") === col("id") % 64L, lit(10.0))
                .otherwise(lit(0.0))).cast("float")).as("embedding"))
        .localCheckpoint(true)
      val cent = Similarity.kmeansCentroids(corpus, 64, 1).localCheckpoint(true)
      val store = Similarity.kmeansAssign(corpus, cent).localCheckpoint(true)
      (corpus, store, Similarity.collectModel(cent),
        Similarity.cellRadii(store, cent))
    })

  private val normCtes =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)""".stripMargin

  private val PQ_SUB = 8       // subspaces: 64 dims → 8×8, codes fit 4 bits × 8 = one BIGINT
  private val PQ_RERANK = 100  // ADC shortlist width feeding the exact re-rank (measured: 0.73 recall@10 at 100 on sf0.1; 0.45 at 30)

  /** Shared PQ CTE chain — the SQL twin of Similarity.pqTrainCodebooks
    * + pqEncode: id-picked init books (16 lowest-id vectors of the
    * TRAINING relation sliced into 8 subspaces), init assignment, ONE
    * Lloyd round per subspace with q80's exact-decimal means (round 6
    * → DECIMAL(21,10) sum / count in double), then distances + argmin
    * sub-codes for ALL vectors against the TRAINED book. d = s·s −
    * 2·s·c + c·c with list_dot_product folds — bit-identical to the
    * engine's GetArrayItem chains. `train` parameterizes the training
    * base (q154 trains on the ingested 80% and encodes everything);
    * with train = "n" the emitted text is the original shared
    * spelling, so q134–q136/q145/q153 cannot drift. */
  private def pqChain(train: String): String = {
    val tsub = if (train == "n") "psub" else "psubt"
    val tsubCte = if (train == "n") ""
      else s"\n|$tsub AS (SELECT vec_id, m, v[m * 8 + 1 : m * 8 + 8] AS s FROM $train, ms),"
    s"""ms AS (SELECT unnest(generate_series(0, ${PQ_SUB - 1})) AS m),
       |pbase AS (SELECT v, CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) - 1 AS j
       |          FROM (SELECT vec_id, v FROM $train ORDER BY vec_id LIMIT 16)),
       |cb0 AS (SELECT m, j, v[m * 8 + 1 : m * 8 + 8] AS cv FROM pbase, ms),
       |psub AS (SELECT vec_id, m, v[m * 8 + 1 : m * 8 + 8] AS s FROM n, ms),$tsubCte
       |pd0 AS (SELECT vec_id, $tsub.m AS m, j,
       |         round(list_dot_product(s, s) - 2 * list_dot_product(s, cv)
       |               + list_dot_product(cv, cv), 6) AS d
       |       FROM $tsub JOIN cb0 ON $tsub.m = cb0.m),
       |pcode0 AS (SELECT vec_id, m, j AS cj FROM (
       |    SELECT vec_id, m, j,
       |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d ASC, j ASC) AS rr
       |    FROM pd0) WHERE rr = 1),
       |pcomp AS (SELECT vec_id, m, i - 1 AS pos, s[i] AS x
       |          FROM (SELECT vec_id, m, s, unnest(generate_series(1, 8)) AS i FROM $tsub)),
       |pm AS (SELECT pc.m AS m, pc.cj AS j, pos,
       |         CAST(sum(CAST(round(x, 6) AS DECIMAL(21,10))) AS DOUBLE) / count(*) AS c
       |       FROM pcomp JOIN pcode0 pc ON pc.vec_id = pcomp.vec_id AND pc.m = pcomp.m
       |       GROUP BY 1, 2, 3),
       |cb AS (SELECT m, j, list(c ORDER BY pos) AS cv FROM pm GROUP BY m, j),
       |pd AS (SELECT vec_id, psub.m AS m, j,
       |         round(list_dot_product(s, s) - 2 * list_dot_product(s, cv)
       |               + list_dot_product(cv, cv), 6) AS d
       |       FROM psub JOIN cb ON psub.m = cb.m),
       |pcode AS (SELECT vec_id, m, j AS cj FROM (
       |    SELECT vec_id, m, j,
       |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d ASC, j ASC) AS rr
       |    FROM pd) WHERE rr = 1)""".stripMargin
  }

  private lazy val pqCtes = s"$normCtes,\n${pqChain("n")}"

  /** ADC scores over [[pqCtes]]: for queries (vec_id < N_QUERIES),
    * approx(q, n) = Σ_m d(q's subvector m, centroid the candidate's
    * sub-code m names) — the query-side distance rows double as the
    * distance TABLE, keyed by the candidate's code; terms sum as
    * exact DECIMAL (the q80/q81 rounded-then-decimal rule). */
  /** q81's trained-quantizer CTE chain (cent0 → asg): one Lloyd
    * round with exact-decimal means, then per-vector assignment
    * ranks over ALL trained cells. Requires `n` (normCtes). One
    * spelling shared by q81 (trained IVF) and q153 (IVF-PQ), so the
    * two oracles cannot drift. */
  private def trainedAsgChain(train: String): String =
    s"""cent0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM $train ORDER BY vec_id LIMIT 16),
      |asg0 AS (SELECT vec_id, cid, v FROM (
      |    SELECT $train.vec_id, cent0.cid, $train.v,
      |      row_number() OVER (PARTITION BY $train.vec_id
      |        ORDER BY round(list_dot_product(v, cv) / (nrm * cn), 6) DESC, cid) AS rr
      |    FROM $train, cent0) WHERE rr = 1),
      |dims AS (SELECT cid, i - 1 AS pos, v[i] AS x
      |         FROM (SELECT cid, v, unnest(generate_series(1, len(v))) AS i FROM asg0)),
      |cm AS (SELECT cid, pos,
      |         CAST(sum(CAST(round(x, 6) AS DECIMAL(21,10))) AS DOUBLE) / count(*) AS m
      |       FROM dims GROUP BY cid, pos),
      |tc AS (SELECT cid, list(m ORDER BY pos) AS cv FROM cm GROUP BY cid),
      |tcn AS (SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM tc),
      |asg AS (SELECT vec_id, cid, rr FROM (
      |    SELECT n.vec_id, tcn.cid,
      |      row_number() OVER (PARTITION BY n.vec_id
      |        ORDER BY round(list_dot_product(v, cv) / (nrm * cn), 6) DESC, cid) AS rr
      |    FROM n, tcn))""".stripMargin

  private lazy val trainedAsgCtes = trainedAsgChain("n")

  /** q119's full SemDeDup CTE chain (norm base → trained quantizer →
    * within-cell best lower-id cosine), every CTE name prefixed by
    * `p` so the chain composes into oracles that already use the
    * unprefixed names (q155's capstone runs it as `sd_*` alongside
    * the near-dup component chain, whose `e`/`cm` would collide).
    * Ends at `${p}best`; consumers write their own kept tail
    * (kept ⇔ best_sim IS NULL OR best_sim < 0.3). With p = "" this
    * IS q119's spelling — one definition, the oracles cannot
    * drift. */
  private[queries] def semanticKeptChain(p: String): String =
    s"""${p}e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |${p}n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM ${p}e),
       |${p}cent0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM ${p}n ORDER BY vec_id LIMIT 16),
       |${p}asg0 AS (SELECT vec_id, cid, v FROM (
       |    SELECT ${p}n.vec_id, ${p}cent0.cid, ${p}n.v,
       |      row_number() OVER (PARTITION BY ${p}n.vec_id
       |        ORDER BY round(list_dot_product(v, cv) / (nrm * cn), 6) DESC, cid) AS rr
       |    FROM ${p}n, ${p}cent0) WHERE rr = 1),
       |${p}dims AS (SELECT cid, i - 1 AS pos, v[i] AS x
       |         FROM (SELECT cid, v, unnest(generate_series(1, len(v))) AS i FROM ${p}asg0)),
       |${p}cm AS (SELECT cid, pos,
       |         CAST(sum(CAST(round(x, 6) AS DECIMAL(21,10))) AS DOUBLE) / count(*) AS m
       |       FROM ${p}dims GROUP BY cid, pos),
       |${p}tc AS (SELECT cid, list(m ORDER BY pos) AS cv FROM ${p}cm GROUP BY cid),
       |${p}tcn AS (SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM ${p}tc),
       |${p}asg AS (SELECT vec_id, cid, v, nrm FROM (
       |    SELECT ${p}n.vec_id, ${p}tcn.cid, ${p}n.v, ${p}n.nrm,
       |      row_number() OVER (PARTITION BY ${p}n.vec_id
       |        ORDER BY round(list_dot_product(v, cv) / (nrm * cn), 6) DESC, cid) AS rr
       |    FROM ${p}n, ${p}tcn) WHERE rr = 1),
       |${p}best AS (SELECT a.vec_id,
       |           max(CASE WHEN a.nrm * b.nrm <> 0 THEN
       |             round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) + 0.0 END) AS best_sim
       |         FROM ${p}asg a JOIN ${p}asg b ON a.cid = b.cid AND b.vec_id < a.vec_id
       |         GROUP BY a.vec_id)""".stripMargin

  private val pqAdcCte =
    s"""adc AS (SELECT pd.vec_id AS qid, pcode.vec_id AS nid,
       |          CAST(sum(CAST(d AS DECIMAL(21,10))) AS DOUBLE) AS approx
       |        FROM pcode JOIN pd ON pd.m = pcode.m AND pd.j = pcode.cj
       |        WHERE pd.vec_id < $N_QUERIES AND pcode.vec_id <> pd.vec_id
       |        GROUP BY 1, 2)""".stripMargin

  /** q125's closed-form aHash pipeline (synthetic pixels → grayscale →
    * mean threshold → two 32-bit words → 8×8-bit banding), shared by
    * the uncapped (q125) and member-capped (q131) oracles. */
  private val phashCtes =
    """WITH p AS (SELECT doc_id, doc_id % 41 AS g, (doc_id // 41) % 2 AS v FROM documents),
      |d AS (SELECT doc_id, g, v, 8 + g % 9 AS w, 8 + g % 5 AS h FROM p),
      |cxs AS (SELECT doc_id, g, v, w, h, unnest(generate_series(0, 7)) AS cx FROM d),
      |cell AS (SELECT doc_id, g, v, w, h, cx, unnest(generate_series(0, 7)) AS cy FROM cxs),
      |px AS (SELECT doc_id, cy * 8 + cx AS j,
      |         ((((cx * w) // 8 + 16 * ((cy * h) // 8) + 1024 * g) * 2654435761) % 16777216
      |           + v * 2) % 16777216 AS pv
      |       FROM cell),
      |gr AS (SELECT doc_id, j,
      |         (((pv // 65536) % 256) + ((pv // 256) % 256) + (pv % 256)) // 3 AS gy
      |       FROM px),
      |mu AS (SELECT doc_id, CAST(sum(gy) // 64 AS BIGINT) AS m FROM gr GROUP BY doc_id),
      |bits AS (SELECT gr.doc_id, j, CASE WHEN gy >= m THEN 1 ELSE 0 END AS b
      |         FROM gr JOIN mu ON mu.doc_id = gr.doc_id),
      |sig AS (SELECT doc_id,
      |          CAST(sum(CASE WHEN j >= 32 THEN b * (CAST(1 AS BIGINT) << (j - 32)) ELSE 0 END) AS BIGINT) AS hi,
      |          CAST(sum(CASE WHEN j < 32 THEN b * (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS lo
      |        FROM bits GROUP BY doc_id),
      |bd AS (SELECT doc_id, hi, lo, k,
      |         CASE WHEN k < 4 THEN (lo >> (k * 8)) & 255
      |              ELSE (hi >> ((k - 4) * 8)) & 255 END AS band
      |       FROM sig, (SELECT unnest(generate_series(0, 7)) AS k))""".stripMargin

  /** The full uncapped pair list over [[phashCtes]] — q125's oracle,
    * and (incremental ≡ full being the property under test) q133's. */
  private lazy val phashPairsSql =
    s"""$phashCtes,
      |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      |         FROM bd a JOIN bd b ON a.k = b.k AND a.band = b.band
      |                            AND a.doc_id < b.doc_id),
      |pr AS (SELECT d1, d2,
      |         CAST(bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo)) AS BIGINT) AS hamming
      |       FROM cand JOIN sig x ON x.doc_id = d1 JOIN sig y ON y.doc_id = d2)
      |SELECT d1, d2, hamming FROM pr WHERE hamming <= 6
      |ORDER BY d1, d2""".stripMargin

  /** ±1 hyperplanes inlined as SQL list literals (computed once in
    * Scala from sha-256 parity — both engines consume the same
    * constants, so there is nothing hash-related to keep in sync). */
  private lazy val planesSql: String = {
    val planes = Similarity.planeWeights(N_PLANES, DIM)
    planes.zipWithIndex.map { case (w, p) =>
      s"($p, CAST([${w.map(x => if (x > 0) "1.0" else "-1.0").mkString(", ")}] AS DOUBLE[]))"
    }.mkString("planes(p, w) AS (VALUES\n  ", ",\n  ", ")")
  }

  /** The 18 planes of lshTopK's 6×3 multi-table structure, each row
    * carrying its table index t = p / 3 and in-table bit b = p % 3 —
    * same family, same slicing as Similarity.tableBucketsExpr. */
  private lazy val tablePlanesSql: String = {
    val nPl = Similarity.LSH_TABLES * Similarity.LSH_TABLE_PLANES
    val planes = Similarity.planeWeights(nPl, DIM)
    planes.zipWithIndex.map { case (w, p) =>
      s"($p, ${p / Similarity.LSH_TABLE_PLANES}, ${p % Similarity.LSH_TABLE_PLANES}, " +
        s"CAST([${w.map(x => if (x > 0) "1.0" else "-1.0").mkString(", ")}] AS DOUBLE[]))"
    }.mkString("tplanes(p, t, b, w) AS (VALUES\n  ", ",\n  ", ")")
  }

  /** Shared multi-table LSH top-k CTE chain: per-(vec, table) buckets,
    * query-side bucket probe, cross-table-dedup'd candidates, exact
    * rounded-cosine rank — the q35 oracle body, reused by q98. */
  private def lshTopKCtes(prefix: String): String =
    s"""${prefix}bk AS (SELECT vec_id, t,
       |         CAST(sum((CASE WHEN list_dot_product(v, w) >= 0 THEN 1 ELSE 0 END) * (1 << b)) AS BIGINT) AS bucket
       |       FROM n, tplanes GROUP BY vec_id, t),
       |${prefix}qb AS (SELECT vec_id AS qid, t, bucket FROM ${prefix}bk WHERE vec_id < $N_QUERIES),
       |${prefix}cand AS (SELECT DISTINCT qid, c.vec_id AS nid
       |         FROM ${prefix}qb qq JOIN ${prefix}bk c ON qq.t = c.t AND qq.bucket = c.bucket
       |         WHERE c.vec_id <> qid),
       |${prefix}s AS (SELECT qid, nid,
       |        round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) AS sim
       |      FROM ${prefix}cand JOIN n x ON x.vec_id = qid JOIN n y ON y.vec_id = nid),
       |${prefix}r AS (SELECT qid, nid, sim,
       |        CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rnk
       |      FROM ${prefix}s)""".stripMargin

  /** Full-table LSH near-dup SQL — q99's oracle, shared by q102 whose
    * Spark side computes the same rows incrementally (stored pairs ∪
    * delta probe ≡ full recompute). */
  private lazy val lshNearDupSql: String =
    s"""WITH $planesSql,
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       |bk AS (SELECT vec_id,
       |         CAST(sum((CASE WHEN list_dot_product(v, w) >= 0 THEN 1 ELSE 0 END) * (1 << p)) AS BIGINT) AS bucket
       |       FROM n, planes GROUP BY vec_id),
       |pr AS (SELECT vec_id AS v1, xor(bucket, m) AS probe
       |       FROM (SELECT vec_id, bucket,
       |               unnest([${Similarity.probeMasks(N_PLANES).mkString(", ")}]) AS m
       |             FROM bk)),
       |cand AS (SELECT DISTINCT v1, b.vec_id AS v2
       |         FROM pr JOIN bk b ON pr.probe = b.bucket AND pr.v1 < b.vec_id)
       |SELECT v1, v2,
       |  round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) AS sim
       |FROM cand JOIN n x ON x.vec_id = v1 JOIN n y ON y.vec_id = v2
       |WHERE round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) >= 0.45
       |ORDER BY v1, v2""".stripMargin

  val queries: Seq[Q] = Seq(

    // ---------------------------------------------------------------- q34
    // Brute-force exact cosine top-k (query side broadcast: one
    // map-only pass over the candidate table, no shuffle of the big
    // side — the exact baseline every ANN variant is judged against).
    Q("q34_cosine_topk",
      s"""$normCtes,
         |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < $N_QUERIES),
         |s AS (SELECT qid, n.vec_id AS nid,
         |        round(list_dot_product(qv, v) / (qn * nrm), 6) AS sim
         |      FROM q, n WHERE n.vec_id <> qid),
         |r AS (SELECT qid, nid, sim,
         |        CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rnk
         |      FROM s)
         |SELECT qid, nid, rnk, sim FROM r WHERE rnk <= $TOP_K
         |ORDER BY qid, rnk""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(e.filter(col("vec_id") < N_QUERIES), e, TOP_K)
        .select("qid", "nid", "rnk", "sim")
        .orderBy("qid", "rnk")
    },

    // ---------------------------------------------------------------- q35
    // Multi-table LSH approximate top-k: 6 independent 3-plane sign
    // tables; candidates = cross-table union of bucket matches. The
    // knob replaced the old 1-table Hamming-1 default after q98
    // measured it at recall@10 = 0.20 (this structure: 0.81 at sf0.1).
    Q("q35_ann_lsh_topk",
      s"""WITH $tablePlanesSql,
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
         |${lshTopKCtes("")}
         |SELECT qid, nid, rnk, sim FROM r WHERE rnk <= $TOP_K
         |ORDER BY qid, rnk""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.lshTopK(e.filter(col("vec_id") < N_QUERIES), e, TOP_K)
        .select("qid", "nid", "rnk", "sim")
        .orderBy("qid", "rnk")
    },

    // ---------------------------------------------------------------- q46
    // Embedding-cosine near-dup pairs (exact): the vector-space
    // counterpart of the Jaccard/MinHash text dedup.
    Q("q46_embedding_neardup",
      s"""$normCtes
         |SELECT a.vec_id AS v1, b.vec_id AS v2,
         |  round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS sim
         |FROM n a JOIN n b ON a.vec_id < b.vec_id
         |WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.45
         |ORDER BY v1, v2""".stripMargin) { (s, d) =>
      Similarity.cosineNearDupPairs(Tables.embeddings(s, d), 0.45)
        .orderBy("v1", "v2")
    },

    // ---------------------------------------------------------------- q99
    // Embedding near-dup at scale: sign-LSH bucket + Hamming-1 probe
    // candidates, exact-cosine verify — the sub-quadratic sibling of
    // q46 (same output columns, same threshold, output ⊆ q46's rows
    // with identical sim values). The pair space never materializes:
    // candidates come from an equi-join on bucket ids, verification
    // joins vectors back narrowly by id.
    Q("q99_embedding_neardup_lsh", lshNearDupSql) { (s, d) =>
      Similarity.cosineNearDupPairsLsh(Tables.embeddings(s, d), 0.45, N_PLANES)
        .orderBy("v1", "v2")
    },

    // ---------------------------------------------------------------- q102
    // Incremental embedding near-dup: the q97 nightly contract in
    // vector space. The table splits 80/20 into an ingested batch and
    // a delta; the Spark side unions the pairs read from the persisted
    // bucket store with the pairs found by probing that store with
    // ONLY the delta's buckets (O(delta) probe; the corpus is touched
    // by one candidate-id semi-join in the verify step). The oracle is
    // the FULL-corpus LSH recompute (q99's SQL): incremental ≡ full
    // is the property under test, hash-checked row for row.
    Q("q102_embedding_neardup_incr", lshNearDupSql) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val ingested = e.filter(col("vec_id") % 5 =!= 0)
      val delta = e.filter(col("vec_id") % 5 === 0)
      // the persisted nightly artifact, materialized ONCE; stored
      // pairs and the delta probe both derive from it (q97 pattern)
      val store = Similarity.embedBucketStore(ingested, N_PLANES)
        .localCheckpoint(true)
      Similarity.pairsFromBucketStore(store, ingested, 0.45, N_PLANES)
        .unionByName(
          Similarity.incrementalCosinePairsLsh(store, ingested, delta, 0.45, N_PLANES))
        .orderBy("v1", "v2")
    },

    // ---------------------------------------------------------------- q45
    // IVF-style ANN: deterministic coarse quantizer (16 cells, probe
    // 2) — the second scale path next to LSH; cells partition the
    // table, queries scan ~nProbe/nCentroids of it.
    Q("q45_ann_ivf_topk",
      s"""$normCtes,
         |cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n ORDER BY vec_id LIMIT 16),
         |asg AS (SELECT vec_id, cid, rr FROM (
         |    SELECT n.vec_id, cent.cid,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY round(list_dot_product(v, cv) / (nrm * cn), 6) DESC, cid) AS rr
         |    FROM n, cent)),
         |nb AS (SELECT n.vec_id AS nid, v AS nv, nrm AS nn, a.cid AS cell
         |       FROM n JOIN asg a ON n.vec_id = a.vec_id AND a.rr <= 1),
         |qb AS (SELECT n.vec_id AS qid, v AS qv, nrm AS qn, a.cid AS cell
         |       FROM n JOIN asg a ON n.vec_id = a.vec_id AND a.rr <= 2
         |       WHERE n.vec_id < $N_QUERIES),
         |s AS (SELECT qid, nid, round(list_dot_product(qv, nv) / (qn * nn), 6) AS sim
         |      FROM qb JOIN nb ON qb.cell = nb.cell WHERE nid <> qid),
         |r AS (SELECT qid, nid, sim,
         |        CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rnk
         |      FROM s)
         |SELECT qid, nid, rnk, sim FROM r WHERE rnk <= $TOP_K
         |ORDER BY qid, rnk""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.ivfTopK(e.filter(col("vec_id") < N_QUERIES), e, TOP_K, 16, 2)
        .select("qid", "nid", "rnk", "sim")
        .orderBy("qid", "rnk")
    },

    // ---------------------------------------------------------------- q80
    // Trained-quantizer verification intermediate: one Lloyd round
    // from the id-picked init — assignment by ROUNDED cosine, then
    // per-cell per-dimension component sums. Components round to 6
    // decimals before an exact DECIMAL sum (a raw float→DECIMAL(·,18)
    // cast is NOT portable: Spark goes through the double's shortest
    // decimal representation, DuckDB rounds the exact binary
    // expansion, and they disagree in the 18th digit). mean =
    // comp_sum / n, so this row set IS the trained centroid, hash-
    // verified; q81 consumes the same training end-to-end.
    Q("q80_kmeans_train",
      s"""$normCtes,
         |cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n ORDER BY vec_id LIMIT 16),
         |asg AS (SELECT vec_id, cid, v FROM (
         |    SELECT n.vec_id, cent.cid, n.v,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY round(list_dot_product(v, cv) / (nrm * cn), 6) DESC, cid) AS rr
         |    FROM n, cent) WHERE rr = 1),
         |dims AS (SELECT cid, i - 1 AS pos, v[i] AS x
         |         FROM (SELECT cid, v, unnest(generate_series(1, len(v))) AS i FROM asg))
         |SELECT cid, CAST(pos AS BIGINT) AS pos,
         |  CAST(sum(CAST(round(x, 6) AS DECIMAL(21,10))) AS DOUBLE) AS comp_sum,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM dims GROUP BY cid, pos ORDER BY cid, pos""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.kmeansCellSums(
          Similarity.kmeansAssign(e, Similarity.initCentroids(e, 16)))
        .select(col("cid"), col("pos").cast("long").as("pos"),
          col("comp_sum"), col("n"))
        .orderBy("cid", "pos")
    },

    // ---------------------------------------------------------------- q81
    // Trained-IVF ANN end-to-end: the 1-round k-means quantizer (same
    // training as q80; means are exact-decimal sums divided by counts
    // in double — every step engine-portable) feeds the same IVF
    // probe as q45. This is the full production path: train on the
    // corpus (or a sample at 100 TB), assign cells, probe nProbe
    // cells per query.
    Q("q81_ann_ivf_trained",
      s"""$normCtes,
         |$trainedAsgCtes,
         |nb AS (SELECT n.vec_id AS nid, v AS nv, nrm AS nn, a.cid AS cell
         |       FROM n JOIN asg a ON n.vec_id = a.vec_id AND a.rr <= 1),
         |qb AS (SELECT n.vec_id AS qid, v AS qv, nrm AS qn, a.cid AS cell
         |       FROM n JOIN asg a ON n.vec_id = a.vec_id AND a.rr <= 2
         |       WHERE n.vec_id < $N_QUERIES),
         |s AS (SELECT qid, nid, round(list_dot_product(qv, nv) / (qn * nn), 6) AS sim
         |      FROM qb JOIN nb ON qb.cell = nb.cell WHERE nid <> qid),
         |r AS (SELECT qid, nid, sim,
         |        CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rnk
         |      FROM s)
         |SELECT qid, nid, rnk, sim FROM r WHERE rnk <= $TOP_K
         |ORDER BY qid, rnk""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val trained = Similarity.kmeansCentroids(e, 16, 1)
      Similarity.ivfTopK(e.filter(col("vec_id") < N_QUERIES), e, TOP_K, 16, 2,
          Some(trained))
        .select("qid", "nid", "rnk", "sim")
        .orderBy("qid", "rnk")
    },

    // ---------------------------------------------------------------- q98
    // ANN recall audit: recall@k of the two approximate paths — LSH
    // (q35's buckets) and trained IVF (q81's quantizer) — against the
    // exact brute-force ranking (q34), as a user-runnable query: point
    // it at your own corpus to decide whether the ANN knobs (planes,
    // cells, probes) hold the recall you need before trading the full
    // scan away. One pass: the exact top-k set is built once and
    // semi-joins the union of both approximate sets (re-using it per
    // method would re-evaluate the brute-force subplan per branch —
    // the q31 multi-branch lesson); zero-hit queries are kept by a
    // (method × qid) grid left join. All three top-k sets are the
    // hash-verified q34/q35/q81 row sets, so recall here is exactly
    // the number a user would compute from those queries.
    Q("q98_ann_recall",
      s"""WITH $tablePlanesSql,
         |${normCtes.stripPrefix("WITH ")},
         |xq AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < $N_QUERIES),
         |xs AS (SELECT qid, n.vec_id AS nid,
         |        round(list_dot_product(qv, v) / (qn * nrm), 6) AS sim
         |      FROM xq, n WHERE n.vec_id <> qid),
         |xr AS (SELECT qid, nid,
         |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk FROM xs),
         |xk AS (SELECT qid, nid FROM xr WHERE rnk <= $TOP_K),
         |${lshTopKCtes("l")},
         |lk AS (SELECT qid, nid FROM lr WHERE rnk <= $TOP_K),
         |cent0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n ORDER BY vec_id LIMIT 16),
         |asg0 AS (SELECT vec_id, cid, v FROM (
         |    SELECT n.vec_id, cent0.cid, n.v,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY round(list_dot_product(v, cv) / (nrm * cn), 6) DESC, cid) AS rr
         |    FROM n, cent0) WHERE rr = 1),
         |dims AS (SELECT cid, i - 1 AS pos, v[i] AS x
         |         FROM (SELECT cid, v, unnest(generate_series(1, len(v))) AS i FROM asg0)),
         |cm AS (SELECT cid, pos,
         |         CAST(sum(CAST(round(x, 6) AS DECIMAL(21,10))) AS DOUBLE) / count(*) AS m
         |       FROM dims GROUP BY cid, pos),
         |tc AS (SELECT cid, list(m ORDER BY pos) AS cv FROM cm GROUP BY cid),
         |tcn AS (SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM tc),
         |asg AS (SELECT vec_id, cid, rr FROM (
         |    SELECT n.vec_id, tcn.cid,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY round(list_dot_product(v, cv) / (nrm * cn), 6) DESC, cid) AS rr
         |    FROM n, tcn)),
         |inb AS (SELECT n.vec_id AS nid, v AS nv, nrm AS nn, a.cid AS cell
         |       FROM n JOIN asg a ON n.vec_id = a.vec_id AND a.rr <= 1),
         |iqb AS (SELECT n.vec_id AS qid, v AS qv, nrm AS qn, a.cid AS cell
         |       FROM n JOIN asg a ON n.vec_id = a.vec_id AND a.rr <= 2
         |       WHERE n.vec_id < $N_QUERIES),
         |si AS (SELECT qid, nid, round(list_dot_product(qv, nv) / (qn * nn), 6) AS sim
         |      FROM iqb JOIN inb ON iqb.cell = inb.cell WHERE nid <> qid),
         |ir AS (SELECT qid, nid,
         |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk FROM si),
         |ik AS (SELECT qid, nid FROM ir WHERE rnk <= $TOP_K),
         |qids AS (SELECT vec_id AS qid FROM n WHERE vec_id < $N_QUERIES),
         |grid AS (SELECT qid, unnest(['ivf', 'lsh']) AS method FROM qids),
         |hits AS (SELECT method, qid, count(*) AS h FROM (
         |    SELECT 'lsh' AS method, qid, nid FROM lk
         |    UNION ALL SELECT 'ivf', qid, nid FROM ik) a
         |  WHERE EXISTS (SELECT 1 FROM xk x WHERE x.qid = a.qid AND x.nid = a.nid)
         |  GROUP BY method, qid)
         |SELECT g.method, g.qid, CAST(coalesce(h, 0) AS BIGINT) AS n_hits,
         |  round(CAST(coalesce(h, 0) AS DOUBLE) / $TOP_K, 4) AS recall
         |FROM grid g LEFT JOIN hits ON g.method = hits.method AND g.qid = hits.qid
         |ORDER BY g.method, g.qid""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val qv = e.filter(col("vec_id") < N_QUERIES)
      val exact = Similarity.bruteForceTopK(qv, e, TOP_K).select("qid", "nid")
      val lsh = Similarity.lshTopK(qv, e, TOP_K).select("qid", "nid")
      val ivf = Similarity.ivfTopK(qv, e, TOP_K, 16, 2,
          Some(Similarity.kmeansCentroids(e, 16, 1))).select("qid", "nid")
      val approx = lsh.withColumn("method", lit("lsh"))
        .unionByName(ivf.withColumn("method", lit("ivf")))
      val hits = approx.join(exact, Seq("qid", "nid"), "left_semi")
        .groupBy(col("method"), col("qid")).agg(count(lit(1)).as("h"))
      val grid = qv.select(col("vec_id").as("qid"))
        .withColumn("method", explode(array(lit("ivf"), lit("lsh"))))
      grid.join(hits, Seq("method", "qid"), "left")
        .select(col("method"), col("qid"),
          coalesce(col("h"), lit(0L)).as("n_hits"),
          graft.ops.Exact.duckRound(
            coalesce(col("h"), lit(0L)).cast("double") / lit(TOP_K.toDouble), 4).as("recall"))
        .orderBy("method", "qid")
    },

    // ---------------------------------------------------------------- q82
    // REAL image decode through the multimodal path: a deterministic
    // tiny PNG is encoded per document with the JDK's ImageIO (a real
    // encoder), and the engine's own byte-level parser reads back the
    // IHDR header — width, height, bit depth, color type — and
    // validates the chunk CRC-32. The oracle knows the constructed
    // dimensions, so a parser bug (endianness, offsets, CRC) breaks
    // the hash. Decode runs partition-batched (one codec instance per
    // partition); payloads stay opaque bytes end-to-end.
    Q("q82_image_decode",
      """SELECT doc_id, 'png' AS format,
        |  CAST(1 + doc_id % 16 AS BIGINT) AS width,
        |  CAST(1 + doc_id % 9 AS BIGINT) AS height,
        |  CAST(8 AS BIGINT) AS bit_depth,
        |  CAST(2 AS BIGINT) AS color_type,
        |  TRUE AS crc_ok
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      import graft.multimodal.Multimodal
      Multimodal.decodeImageMeta(Multimodal.syntheticPngs(Tables.documents(s, d)))
        .withColumnRenamed("media_id", "doc_id")
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- q104
    // REAL audio decode through the multimodal path — the audio twin
    // of q82: a deterministic PCM WAV is encoded per document with the
    // JDK's own javax.sound writer (a real encoder), and the engine's
    // byte-level RIFF chunk walk reads back the fmt/data blocks —
    // PCM code, channels, sample rate, bit depth, frame count — and
    // validates the declared RIFF size. The oracle knows the
    // constructed parameters, so an endianness, chunk-walk, or
    // word-alignment-padding bug breaks the hash.
    Q("q104_audio_decode",
      """SELECT doc_id, 'wav' AS format,
        |  CAST(1 AS BIGINT) AS audio_format,
        |  CAST(1 + doc_id % 2 AS BIGINT) AS channels,
        |  CAST(8000 + (doc_id % 4) * 4000 AS BIGINT) AS sample_rate,
        |  CAST(16 AS BIGINT) AS bits,
        |  CAST(50 + doc_id % 100 AS BIGINT) AS n_samples,
        |  TRUE AS size_ok
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      import graft.multimodal.Multimodal
      Multimodal.decodeAudioMeta(Multimodal.syntheticWavs(Tables.documents(s, d)))
        .withColumnRenamed("media_id", "doc_id")
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- q109
    // REAL pixel-level resize through the multimodal path: each
    // synthetic PNG is FULLY decoded by ImageIO (inflate + unfilter),
    // nearest-neighbor resized to 4×3 with integer source mapping,
    // re-encoded, and decoded AGAIN by pixelStats — so the checked
    // px_sum crosses two real decodes and one real encode. The oracle
    // recomputes the resized pixels in closed form: source pixel
    // (x,y) of image id is (x·31 + y·17 + id) mod 2^24 (the encoder's
    // fixed function), and nearest-neighbor picks sx = (x·w)//4,
    // sy = (y·h)//3 — any decoder, mapping, or re-encode bug shifts
    // the sum and breaks the hash.
    Q("q109_image_resize",
      """WITH g AS (SELECT doc_id, 1 + doc_id % 16 AS w, 1 + doc_id % 9 AS h FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(generate_series(0, 3)) AS x FROM g),
        |xy AS (SELECT doc_id, w, h, x, unnest(generate_series(0, 2)) AS y FROM xs)
        |SELECT doc_id, CAST(4 AS BIGINT) AS width, CAST(3 AS BIGINT) AS height,
        |  CAST(sum(((x * w) // 4 * 31 + (y * h) // 3 * 17 + doc_id) % 16777216) AS BIGINT) AS px_sum
        |FROM xy GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      import graft.multimodal.Multimodal
      Multimodal.pixelStats(
          Multimodal.resizeNearest(Multimodal.syntheticPngs(Tables.documents(s, d)), 4, 3))
        .withColumnRenamed("media_id", "doc_id")
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- q110
    // REAL audio frame sampling: the WAV data chunk decodes to
    // interleaved int16 PCM (the RIFF walk + little-endian read the
    // metadata codec uses), frames of 16 samples, every 2nd frame
    // kept, per-frame amplitude sums. The oracle recomputes the PCM
    // in closed form — sample i of doc id is
    // ((id + i·2654435761) mod 4096) − 2048, the encoder's sawtooth —
    // so an endianness, chunk-offset, or frame-boundary bug breaks
    // the hash on the exact frame it corrupts.
    Q("q110_audio_framesample",
      """WITH b AS (SELECT doc_id, (50 + doc_id % 100) * (1 + doc_id % 2) AS total FROM documents),
        |fr AS (SELECT doc_id, total, unnest(generate_series(0, (total - 1) // 16)) AS j FROM b),
        |k AS (SELECT doc_id, total, j FROM fr WHERE j % 2 = 0),
        |s AS (SELECT doc_id, j, unnest(generate_series(j * 16, least((j + 1) * 16, total) - 1)) AS i FROM k)
        |SELECT doc_id, CAST(j AS BIGINT) AS frame_idx, CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum((doc_id + i * 2654435761) % 4096 - 2048) AS BIGINT) AS amp_sum
        |FROM s GROUP BY doc_id, j ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      import graft.multimodal.Multimodal
      Multimodal.frameAmplitudes(Multimodal.syntheticWavs(Tables.documents(s, d)), 16, 2)
        .withColumnRenamed("media_id", "doc_id")
        .orderBy("doc_id", "frame_idx")
    },

    // ---------------------------------------------------------------- q111
    // REAL video-container decode — the triple's third leg after
    // q82 (image) and q104 (audio): a deterministic minimal MP4 per
    // document (hand-rolled to the ISO 14496-12 box layout — the JDK
    // ships no MP4 writer), parsed back by the engine's byte-level
    // box walk: big-endian sizes, nested moov traversal past sibling
    // free boxes, and BOTH mvhd versions (v0 32-bit / v1 64-bit
    // times, alternating by id parity) — a field-offset or endianness
    // bug breaks the hash on exactly the parity it corrupts. The
    // oracle knows the constructed parameters; duration_ms is integer
    // division on both engines.
    Q("q111_video_decode",
      """SELECT doc_id, 'mp4' AS format, 'isom' AS brand,
        |  CAST(600 * (1 + doc_id % 3) AS BIGINT) AS timescale,
        |  CAST(100 + doc_id % 1000 AS BIGINT) AS duration_ticks,
        |  CAST((100 + doc_id % 1000) * 1000 // (600 * (1 + doc_id % 3)) AS BIGINT) AS duration_ms,
        |  TRUE AS size_ok
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      import graft.multimodal.Multimodal
      Multimodal.decodeVideoMeta(Multimodal.syntheticMp4s(Tables.documents(s, d)))
        .withColumnRenamed("media_id", "doc_id")
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- q36
    // Multimodal column plumbing: treat payloads as opaque binary +
    // typed metadata; deterministic feature extraction (byte length,
    // content hash) — the decode step itself is stubbed in
    // graft.multimodal (no codecs in this container), but the schema,
    // partitioning and feature contract are real.
    Q("q36_multimodal_features",
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS content_sha,
        |  substr(sha256(text), 1, 16) AS content_key
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .select(
          col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          sha2(col("payload"), 256).as("content_sha"),
          substring(sha2(col("payload"), 256), 1, 16).as("content_key"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- q117
    // The persisted-IVF nightly lifecycle (the band store's O(Δ)
    // contract applied to the ANN regime): train the quantizer ONCE on
    // the already-ingested corpus (80%, q97/q102 split), persist the
    // centroids and the corpus cell assignments, then assign ONLY the
    // nightly delta with the FROZEN quantizer — no retrain, no corpus
    // re-assignment. Assignment depends on nothing but the row and
    // the model, so store ∪ assign(Δ) ≡ assign(corpus ∪ Δ) exactly;
    // the oracle recomputes that full assignment from first
    // principles (q81's training chain on the ingested subset, one
    // Lloyd round, then the argmax over ALL vectors) and the gate
    // hash-checks the incrementally-built store against it.
    Q("q117_ivf_incremental",
      s"""$normCtes,
         |ni AS (SELECT * FROM n WHERE vec_id % 5 <> 0),
         |cent0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM ni ORDER BY vec_id LIMIT 16),
         |asg0 AS (SELECT vec_id, cid, v FROM (
         |    SELECT ni.vec_id, cent0.cid, ni.v,
         |      row_number() OVER (PARTITION BY ni.vec_id
         |        ORDER BY round(list_dot_product(v, cv) / (nrm * cn), 6) DESC, cid) AS rr
         |    FROM ni, cent0) WHERE rr = 1),
         |dims AS (SELECT cid, i - 1 AS pos, v[i] AS x
         |         FROM (SELECT cid, v, unnest(generate_series(1, len(v))) AS i FROM asg0)),
         |cm AS (SELECT cid, pos,
         |         CAST(sum(CAST(round(x, 6) AS DECIMAL(21,10))) AS DOUBLE) / count(*) AS m
         |       FROM dims GROUP BY cid, pos),
         |tc AS (SELECT cid, list(m ORDER BY pos) AS cv FROM cm GROUP BY cid),
         |tcn AS (SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM tc),
         |asg AS (SELECT vec_id, cid FROM (
         |    SELECT n.vec_id, tcn.cid,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY round(list_dot_product(v, cv) / (nrm * cn), 6) DESC, cid) AS rr
         |    FROM n, tcn) WHERE rr = 1)
         |SELECT vec_id, cid AS cell FROM asg ORDER BY vec_id""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val ingested = e.filter(col("vec_id") % 5 =!= 0)
      val delta = e.filter(col("vec_id") % 5 === 0)
      // the persisted artifacts: trained centroids + the ingested
      // corpus's assignments, materialized once (localCheckpoint =
      // the query's analog of reading the nightly artifact from disk)
      val cent = Similarity.kmeansCentroids(ingested, 16, 1)
        .localCheckpoint(true)
      val store = Similarity.kmeansAssign(ingested, cent)
        .localCheckpoint(true)
      store.unionByName(Similarity.kmeansAssign(delta, cent))
        .select(col("vec_id"), col("cid").as("cell"))
        .orderBy("vec_id")
    },

    // ---------------------------------------------------------------- q119
    // SemDeDup (Abbas et al. 2023) semantic deduplication: q81's
    // trained quantizer clusters the corpus, vectors are compared only
    // WITHIN their cell, and a vector is pruned iff some LOWER-id
    // cellmate sits at rounded cosine ≥ tau. Every step is the
    // engine's pinned-boundary arithmetic (decimal-exact cell means,
    // round(…,6) cosines, +0.0 normalization, lowest-id keeper), so
    // the full keep/prune decision — not just a summary — is
    // hash-checked against DuckDB. tau=0.3 sits inside this corpus's
    // top-neighbor cosine band (0.31–0.41, BASELINE.md) so the gate
    // exercises both kept and pruned rows.
    Q("q119_semantic_dedup",
      s"""WITH ${semanticKeptChain("")}
         |SELECT a.vec_id, a.cid AS cell, best_sim,
         |  (best_sim IS NULL OR best_sim < 0.3) AS kept
         |FROM asg a LEFT JOIN best USING (vec_id)
         |ORDER BY vec_id""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.semanticDedup(e, Similarity.kmeansCentroids(e, 16, 1), 0.3)
        .orderBy("vec_id")
    },

    // ---------------------------------------------------------------- q122
    // Member-capped semantic dedup — the q118 boilerplate treatment in
    // vector space, and the spelling q119's scale note prescribes for
    // cells that outgrow memory: each cell contributes only its 50
    // lowest-sha(cid|vec_id) members as comparison candidates (pair
    // space ≤ M·n, linear for fixed M), every vector still judged.
    // The oracle mirrors the cap bit-for-bit (same sha-256 member
    // order both engines), so parity is exact equality; at sf0.1 the
    // ~125-member cells make the cap BIND (kept 669 uncapped → more
    // capped), so the gate exercises the trade, not a no-op.
    Q("q122_semantic_dedup_capped",
      s"""$normCtes,
         |cent0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n ORDER BY vec_id LIMIT 16),
         |asg0 AS (SELECT vec_id, cid, v FROM (
         |    SELECT n.vec_id, cent0.cid, n.v,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY round(list_dot_product(v, cv) / (nrm * cn), 6) DESC, cid) AS rr
         |    FROM n, cent0) WHERE rr = 1),
         |dims AS (SELECT cid, i - 1 AS pos, v[i] AS x
         |         FROM (SELECT cid, v, unnest(generate_series(1, len(v))) AS i FROM asg0)),
         |cm AS (SELECT cid, pos,
         |         CAST(sum(CAST(round(x, 6) AS DECIMAL(21,10))) AS DOUBLE) / count(*) AS m
         |       FROM dims GROUP BY cid, pos),
         |tc AS (SELECT cid, list(m ORDER BY pos) AS cv FROM cm GROUP BY cid),
         |tcn AS (SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM tc),
         |asg AS (SELECT vec_id, cid, v, nrm FROM (
         |    SELECT n.vec_id, tcn.cid, n.v, n.nrm,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY round(list_dot_product(v, cv) / (nrm * cn), 6) DESC, cid) AS rr
         |    FROM n, tcn) WHERE rr = 1),
         |capped AS (SELECT vec_id, cid, v, nrm FROM (
         |    SELECT vec_id, cid, v, nrm, row_number() OVER (
         |      PARTITION BY cid
         |      ORDER BY sha256(CAST(cid AS VARCHAR) || '|' || CAST(vec_id AS VARCHAR)),
         |        vec_id) AS rk
         |    FROM asg) WHERE rk <= 50),
         |best AS (SELECT a.vec_id,
         |           max(CASE WHEN a.nrm * b.nrm <> 0 THEN
         |             round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) + 0.0 END) AS best_sim
         |         FROM asg a JOIN capped b ON a.cid = b.cid AND b.vec_id < a.vec_id
         |         GROUP BY a.vec_id)
         |SELECT a.vec_id, a.cid AS cell, best_sim,
         |  (best_sim IS NULL OR best_sim < 0.3) AS kept
         |FROM asg a LEFT JOIN best ON a.vec_id = best.vec_id
         |ORDER BY a.vec_id""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.semanticDedupCapped(e, Similarity.kmeansCentroids(e, 16, 1),
          0.3, 50)
        .orderBy("vec_id")
    },

    // ---------------------------------------------------------------- q123
    // Semantic decontamination — q68's benchmark-overlap pass in
    // embedding space: the corpus splits 80/20 into train/eval
    // (q117's split), the quantizer trains on TRAIN only, both sides
    // assign with it frozen, and every train vector is flagged when
    // some eval vector shares its cell at rounded cosine ≥ tau. The
    // eval side broadcasts (benchmark ≪ corpus), so the whole query
    // is map-only — zero shuffles on the train side. tau=0.3 sits in
    // the corpus's top-neighbor band so the gate exercises both
    // flagged and clean rows; the full flag decision is hash-checked.
    Q("q123_semantic_decontamination",
      s"""$normCtes,
         |ni AS (SELECT * FROM n WHERE vec_id % 5 <> 0),
         |ne AS (SELECT * FROM n WHERE vec_id % 5 = 0),
         |cent0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM ni ORDER BY vec_id LIMIT 16),
         |asg0 AS (SELECT vec_id, cid, v FROM (
         |    SELECT ni.vec_id, cent0.cid, ni.v,
         |      row_number() OVER (PARTITION BY ni.vec_id
         |        ORDER BY round(list_dot_product(v, cv) / (nrm * cn), 6) DESC, cid) AS rr
         |    FROM ni, cent0) WHERE rr = 1),
         |dims AS (SELECT cid, i - 1 AS pos, v[i] AS x
         |         FROM (SELECT cid, v, unnest(generate_series(1, len(v))) AS i FROM asg0)),
         |cm AS (SELECT cid, pos,
         |         CAST(sum(CAST(round(x, 6) AS DECIMAL(21,10))) AS DOUBLE) / count(*) AS m
         |       FROM dims GROUP BY cid, pos),
         |tc AS (SELECT cid, list(m ORDER BY pos) AS cv FROM cm GROUP BY cid),
         |tcn AS (SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM tc),
         |asgt AS (SELECT vec_id, cid, v, nrm FROM (
         |    SELECT ni.vec_id, tcn.cid, ni.v, ni.nrm,
         |      row_number() OVER (PARTITION BY ni.vec_id
         |        ORDER BY round(list_dot_product(v, cv) / (nrm * cn), 6) DESC, cid) AS rr
         |    FROM ni, tcn) WHERE rr = 1),
         |asge AS (SELECT vec_id, cid, v, nrm FROM (
         |    SELECT ne.vec_id, tcn.cid, ne.v, ne.nrm,
         |      row_number() OVER (PARTITION BY ne.vec_id
         |        ORDER BY round(list_dot_product(v, cv) / (nrm * cn), 6) DESC, cid) AS rr
         |    FROM ne, tcn) WHERE rr = 1),
         |best AS (SELECT t.vec_id,
         |           max(CASE WHEN t.nrm * e.nrm <> 0 THEN
         |             round(list_dot_product(t.v, e.v) / (t.nrm * e.nrm), 6) + 0.0 END) AS best_eval_sim
         |         FROM asgt t JOIN asge e ON t.cid = e.cid
         |         GROUP BY t.vec_id)
         |SELECT t.vec_id, t.cid AS cell, best_eval_sim,
         |  (best_eval_sim IS NOT NULL AND best_eval_sim >= 0.3) AS contaminated
         |FROM asgt t LEFT JOIN best ON t.vec_id = best.vec_id
         |ORDER BY t.vec_id""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val train = e.filter(col("vec_id") % 5 =!= 0)
      val eval = e.filter(col("vec_id") % 5 === 0)
      val cent = Similarity.kmeansCentroids(train, 16, 1)
      Similarity.semanticContamination(train, eval, cent, 0.3)
        .orderBy("vec_id")
    },

    // ---------------------------------------------------------------- q124
    // SemDeDup approximation audit — the q98 pattern for the semantic
    // family: per vector, q119's within-cell best lower-id cosine
    // next to the TRUE best over all lower-id vectors (exact all-pairs
    // — the deliberate guarded baseline, sample-sized at corpus
    // scale), and `missed` = a full near-dup pass would prune it but
    // the cell approximation keeps it. User-runnable telemetry for
    // the k-vs-tau knob: a rising missed count means grow k or widen
    // probes. Every column is hash-checked, so the audit itself is
    // engine-portable, not just its summary.
    Q("q124_semantic_dedup_audit",
      s"""$normCtes,
         |cent0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n ORDER BY vec_id LIMIT 16),
         |asg0 AS (SELECT vec_id, cid, v FROM (
         |    SELECT n.vec_id, cent0.cid, n.v,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY round(list_dot_product(v, cv) / (nrm * cn), 6) DESC, cid) AS rr
         |    FROM n, cent0) WHERE rr = 1),
         |dims AS (SELECT cid, i - 1 AS pos, v[i] AS x
         |         FROM (SELECT cid, v, unnest(generate_series(1, len(v))) AS i FROM asg0)),
         |cm AS (SELECT cid, pos,
         |         CAST(sum(CAST(round(x, 6) AS DECIMAL(21,10))) AS DOUBLE) / count(*) AS m
         |       FROM dims GROUP BY cid, pos),
         |tc AS (SELECT cid, list(m ORDER BY pos) AS cv FROM cm GROUP BY cid),
         |tcn AS (SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM tc),
         |asg AS (SELECT vec_id, cid, v, nrm FROM (
         |    SELECT n.vec_id, tcn.cid, n.v, n.nrm,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY round(list_dot_product(v, cv) / (nrm * cn), 6) DESC, cid) AS rr
         |    FROM n, tcn) WHERE rr = 1),
         |best AS (SELECT a.vec_id,
         |           max(CASE WHEN a.nrm * b.nrm <> 0 THEN
         |             round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) + 0.0 END) AS cell_best
         |         FROM asg a JOIN asg b ON a.cid = b.cid AND b.vec_id < a.vec_id
         |         GROUP BY a.vec_id),
         |tb AS (SELECT a.vec_id,
         |         max(CASE WHEN a.nrm * b.nrm <> 0 THEN
         |           round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) + 0.0 END) AS true_best
         |       FROM n a JOIN n b ON b.vec_id < a.vec_id
         |       GROUP BY a.vec_id)
         |SELECT a.vec_id, a.cid AS cell, cell_best, true_best,
         |  (true_best IS NOT NULL AND true_best >= 0.3
         |    AND (cell_best IS NULL OR cell_best < 0.3)) AS missed
         |FROM asg a LEFT JOIN best ON a.vec_id = best.vec_id
         |             LEFT JOIN tb ON a.vec_id = tb.vec_id
         |ORDER BY a.vec_id""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.semanticDedupAudit(e, Similarity.kmeansCentroids(e, 16, 1),
          0.3)
        .orderBy("vec_id")
    },

    // ---------------------------------------------------------------- q125
    // Perceptual-hash image near-dup — the dedup family extended to
    // the media columns the engine already decodes: synthetic PNG
    // classes (41 groups, alternating generations perturb the base
    // 24-bit pixels by +2 AFTER the pattern mix — a whole-image
    // brightness nudge), REAL ImageIO pixel decode → integer 8×8
    // aHash packed as two 32-bit words, SimHash-style 8×8-bit banding
    // for Hamming candidates (exact to distance 7 by pigeonhole),
    // full-signature Hamming verify. The oracle recomputes every step
    // from the closed-form pixel mix
    // ((x + 16y + 1024g)·2654435761 mod 2^24, + 2v) — downsample map,
    // floor-div grayscale, floor-div mean, bit packing, and the SAME
    // banding (so its join is bounded like the engine's) — a decoder,
    // rounding, or band-slicing bug breaks the hash on the exact bit
    // it corrupts.
    Q("q125_image_phash_neardup", phashPairsSql) { (s, d) =>
      import graft.multimodal.Multimodal
      Multimodal.phashNearDupPairs(
          Multimodal.perceptualHashes(
            Multimodal.syntheticPngClasses(Tables.documents(s, d))), 6)
        .orderBy("d1", "d2")
    },

    // ---------------------------------------------------------------- q127
    // Acoustic-fingerprint audio near-dup — q125's recipe on the time
    // axis, completing media-dedup coverage (text/span/embedding/
    // semantic/image/audio): synthetic WAV classes (251 groups;
    // alternating generations TRUNCATE by 8 samples — a re-trimmed
    // clip), REAL RIFF-walk PCM decode → 32 frame energies (4 samples
    // each) → fixed-level threshold bits → one 32-bit fingerprint,
    // 4×8 banding (exact to Hamming 3 by pigeonhole), full-word
    // verify. The PCM is a Murmur-style two-round integer hash of
    // (seed + i) in 32-bit modular arithmetic (any LINEAR sample
    // function — sawtooth or single multiply — correlates
    // fingerprints across groups; the Multimodal.syntheticWavClasses
    // scaladoc has the measurements); the oracle recomputes every bit
    // from it with the same banding, so a chunk-walk, endianness,
    // frame-boundary, or threshold bug breaks the hash on the exact
    // bit it corrupts.
    Q("q127_audio_fingerprint_neardup",
      """WITH p AS (SELECT doc_id, doc_id % 251 AS g, (doc_id // 251) % 2 AS v FROM documents),
        |d AS (SELECT doc_id, g * 1009 + 7 AS seed, 128 - v * 8 AS n FROM p),
        |fr AS (SELECT doc_id, seed, n, unnest(generate_series(0, 31)) AS j FROM d),
        |sm AS (SELECT doc_id, seed, n, j, unnest(generate_series(4 * j, 4 * j + 3)) AS i FROM fr),
        |x0 AS (SELECT doc_id, n, j, i, (seed + i) * 2654435761 % 4294967296 AS x FROM sm),
        |x1 AS (SELECT doc_id, n, j, i, xor(x, x // 65536) AS x FROM x0),
        |x2 AS (SELECT doc_id, n, j, i, x % 268435456 * 2246822519 % 4294967296 AS x FROM x1),
        |x3 AS (SELECT doc_id, n, j, i, xor(x, x // 8192) AS x FROM x2),
        |e AS (SELECT doc_id, j,
        |        sum(CASE WHEN i < n THEN abs((x % 4096) - 2048) ELSE 0 END) AS en
        |      FROM x3 GROUP BY doc_id, j),
        |fp AS (SELECT doc_id,
        |         CAST(sum(CASE WHEN en >= 4096 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS fp
        |       FROM e GROUP BY doc_id),
        |bd AS (SELECT doc_id, fp, k, (fp >> (k * 8)) & 255 AS band
        |       FROM fp, (SELECT unnest(generate_series(0, 3)) AS k)),
        |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        |         FROM bd a JOIN bd b ON a.k = b.k AND a.band = b.band
        |                            AND a.doc_id < b.doc_id),
        |pr AS (SELECT d1, d2, CAST(bit_count(xor(x.fp, y.fp)) AS BIGINT) AS hamming
        |       FROM cand JOIN fp x ON x.doc_id = d1 JOIN fp y ON y.doc_id = d2)
        |SELECT d1, d2, hamming FROM pr WHERE hamming <= 3
        |ORDER BY d1, d2""".stripMargin) { (s, d) =>
      import graft.multimodal.Multimodal
      Multimodal.audioNearDupPairs(
          Multimodal.audioFingerprints(
            Multimodal.syntheticWavClasses(Tables.documents(s, d))), 3)
        .orderBy("d1", "d2")
    },

    // ---------------------------------------------------------------- q128
    // Temporal-signature video near-dup — the third media face,
    // completing the image (q125) / audio (q127) / video matrix:
    // synthetic MP4 classes (61 groups; frames are raw 8×8 grayscale
    // inside a REAL ISO-BMFF container; alternating generations add
    // +2 mod 256 per frame byte — a re-encoded upload), REAL box-walk
    // decode → 4 frames sampled evenly BY POSITION (s·nf//4, so the
    // grid survives trims/rate drops) → 32 fixed-level threshold bits
    // per frame → a 128-bit signature as four 32-bit words, 16×8
    // banding (exact to Hamming 15 by pigeonhole; threshold 10 sits
    // between the measured gen-pair ≤6 and cross-group ≥44), 4-word
    // verify. Frame bytes are the Murmur-style two-round mix (a
    // single multiplicative round collapses every group to identical
    // frames here: gray = x mod 256 sees only the low byte, and the
    // group stride kills it — Multimodal.syntheticMp4Classes scaladoc
    // has the arithmetic); the oracle recomputes every signature bit
    // from the mix with the same banding, so a box-walk, frame-
    // boundary, sample-position, or packing bug breaks the hash on
    // the exact bit it corrupts.
    Q("q128_video_temporal_neardup",
      """WITH p AS (SELECT doc_id, doc_id % 61 AS g, (doc_id // 61) % 2 AS v FROM documents),
        |d AS (SELECT doc_id, g * 1013 + 11 AS seed, v, 6 + g % 3 AS nf FROM p),
        |fs AS (SELECT doc_id, seed, v, nf, unnest(generate_series(0, 3)) AS s FROM d),
        |ft AS (SELECT doc_id, seed, v, s, (s * nf) // 4 AS f FROM fs),
        |bt AS (SELECT doc_id, seed, v, s, f, unnest(generate_series(0, 31)) AS t FROM ft),
        |x0 AS (SELECT doc_id, s, t, v, (seed + 2 * t + 64 * f) * 2654435761 % 4294967296 AS x FROM bt),
        |x1 AS (SELECT doc_id, s, t, v, xor(x, x // 65536) AS x FROM x0),
        |x2 AS (SELECT doc_id, s, t, v, x % 268435456 * 2246822519 % 4294967296 AS x FROM x1),
        |x3 AS (SELECT doc_id, s, t, v, xor(x, x // 8192) AS x FROM x2),
        |gy AS (SELECT doc_id, s, t, (x % 256 + 2 * v) % 256 AS gray FROM x3),
        |wd AS (SELECT doc_id, s,
        |         CAST(sum(CASE WHEN gray >= 128 THEN CAST(1 AS BIGINT) << t ELSE 0 END) AS BIGINT) AS w
        |       FROM gy GROUP BY doc_id, s),
        |sig AS (SELECT doc_id,
        |          max(CASE WHEN s = 0 THEN w END) AS w0, max(CASE WHEN s = 1 THEN w END) AS w1,
        |          max(CASE WHEN s = 2 THEN w END) AS w2, max(CASE WHEN s = 3 THEN w END) AS w3
        |        FROM wd GROUP BY doc_id),
        |bd AS (SELECT doc_id, w0, w1, w2, w3, k,
        |         ((CASE k // 4 WHEN 0 THEN w0 WHEN 1 THEN w1 WHEN 2 THEN w2 ELSE w3 END)
        |           >> ((k % 4) * 8)) & 255 AS band
        |       FROM sig, (SELECT unnest(generate_series(0, 15)) AS k)),
        |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        |         FROM bd a JOIN bd b ON a.k = b.k AND a.band = b.band
        |                            AND a.doc_id < b.doc_id),
        |pr AS (SELECT d1, d2,
        |         CAST(bit_count(xor(x.w0, y.w0)) + bit_count(xor(x.w1, y.w1))
        |            + bit_count(xor(x.w2, y.w2)) + bit_count(xor(x.w3, y.w3)) AS BIGINT) AS hamming
        |       FROM cand JOIN sig x ON x.doc_id = d1 JOIN sig y ON y.doc_id = d2)
        |SELECT d1, d2, hamming FROM pr WHERE hamming <= 10
        |ORDER BY d1, d2""".stripMargin) { (s, d) =>
      import graft.multimodal.Multimodal
      Multimodal.videoNearDupPairs(
          Multimodal.videoSignatures(
            Multimodal.syntheticMp4Classes(Tables.documents(s, d))), 10)
        .orderBy("d1", "d2")
    },

    // ---------------------------------------------------------------- q131
    // Member-capped pHash near-dup — the media-family fuse the
    // round-9 10× run demands (pairs ×101, wall ×31: enumeration over
    // mass-dup corpora is OUTPUT-bound, so at 100 TB the bucket must
    // stop shipping its clique). q114's reconciliation on the image
    // face: each (band, value) bucket keeps its 2 lowest ids, the
    // candidate join runs on the capped store (≤ C(2,2+) pairs per
    // bucket, two-phase WindowGroupLimit keeps partial buckets
    // map-side), diverted members probe their full buckets for the
    // 'overflow' label — and capped ∪ overflow ≡ the uncapped q125
    // row for row, which this query hash-checks including the label
    // (capped-path priority on overlap). Production at scale runs
    // includeOverflow = false; within a clique every band is shared,
    // so survival collapses to ONE chance and the cap is a memory
    // fuse, not a recall guarantee (the q122 one-chance regime).
    Q("q131_image_phash_membercap",
      s"""$phashCtes,
        |rk AS (SELECT doc_id, hi, lo, k, band,
        |         row_number() OVER (PARTITION BY k, band ORDER BY doc_id) AS rn FROM bd),
        |cpd AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        |        FROM rk a JOIN rk b ON a.k = b.k AND a.band = b.band AND a.doc_id < b.doc_id
        |        WHERE a.rn <= 2 AND b.rn <= 2),
        |cp AS (SELECT d1, d2,
        |         CAST(bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo)) AS BIGINT) AS hamming
        |       FROM cpd JOIN sig x ON x.doc_id = d1 JOIN sig y ON y.doc_id = d2),
        |cpf AS (SELECT * FROM cp WHERE hamming <= 6),
        |ovd AS (SELECT DISTINCT least(a.doc_id, b.doc_id) AS d1, greatest(a.doc_id, b.doc_id) AS d2
        |        FROM rk a JOIN rk b ON a.k = b.k AND a.band = b.band AND a.doc_id <> b.doc_id
        |        WHERE a.rn > 2),
        |ov AS (SELECT d1, d2,
        |         CAST(bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo)) AS BIGINT) AS hamming
        |       FROM ovd JOIN sig x ON x.doc_id = d1 JOIN sig y ON y.doc_id = d2),
        |ovf AS (SELECT ov.d1, ov.d2, ov.hamming FROM ov WHERE hamming <= 6
        |        AND NOT EXISTS (SELECT 1 FROM cpf c WHERE c.d1 = ov.d1 AND c.d2 = ov.d2))
        |SELECT * FROM (
        |  SELECT d1, d2, hamming, 'capped' AS via FROM cpf
        |  UNION ALL
        |  SELECT d1, d2, hamming, 'overflow' AS via FROM ovf)
        |ORDER BY d1, d2""".stripMargin) { (s, d) =>
      import graft.multimodal.Multimodal
      Multimodal.phashNearDupPairsCapped(
          Multimodal.perceptualHashes(
            Multimodal.syntheticPngClasses(Tables.documents(s, d))),
          6, 2, includeOverflow = true)
        .orderBy("d1", "d2")
    },

    // ---------------------------------------------------------------- q133
    // Incremental image near-dup — the q97/q102 O(Δ) contract on the
    // media face, completing the batch (q125) / capped (q131) /
    // streaming (HammingStream) / incremental matrix: the corpus
    // splits into an ingested store (2/3) and tonight's delta (1/3);
    // the store's banded rows are the persisted nightly artifact
    // (localCheckpoint = the query's read-from-disk analog,
    // signatures banded exactly once), stored pairs read FROM the
    // store, and the delta's signatures alone band and probe
    // store ∪ delta. Union ≡ the full q125 recompute, hash-checked
    // against the SAME oracle — a probe that misses a bucket, drops
    // a delta×delta pair, or double-emits a stored pair breaks the
    // row hash.
    Q("q133_phash_incremental", phashPairsSql) { (s, d) =>
      import graft.multimodal.Multimodal
      val sigs = Multimodal.perceptualHashes(
        Multimodal.syntheticPngClasses(Tables.documents(s, d)))
      val store = Multimodal.phashBandRows(
          sigs.filter(col("media_id") % 3 =!= 0))
        .localCheckpoint(true)
      val delta = sigs.filter(col("media_id") % 3 === 0)
      Multimodal.phashPairsFromStore(store, 6)
        .unionByName(Multimodal.incrementalPhashPairs(store, delta, 6))
        .orderBy("d1", "d2")
    },

    // ---------------------------------------------------------------- q134
    // Product-quantization code store: every vector encoded to 8
    // 4-bit sub-codes packed in ONE BIGINT (256 B of floats → 4 B of
    // code — the memory face of ANN scale, next to IVF's compute
    // face). Codebook = ONE Lloyd round per subspace from the
    // id-picked init (q80's exact-decimal means — the whole training
    // is rebuilt identically in SQL); sub-code = argmin by rounded
    // squared L2 (d = s·s − 2·s·c + c·c, every fold left-to-right,
    // ties → lowest j). The encode is one codegen'd map-side
    // expression — at 100 TB it is a map-only scan, and this gate
    // hash-verifies every nibble of it.
    Q("q134_pq_codes",
      s"""$pqCtes
         |SELECT vec_id,
         |  CAST(sum(cj * (CAST(1 AS BIGINT) << (4 * m))) AS BIGINT) AS code
         |FROM pcode GROUP BY vec_id ORDER BY vec_id""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.pqEncode(e, Similarity.pqTrainCodebooks(e, PQ_SUB, 16))
        .orderBy("vec_id")
    },

    // ---------------------------------------------------------------- q135
    // PQ ADC top-k: the query precomputes its 8×16 sub-distance
    // table; every candidate then costs 8 nibble lookups summed as
    // DECIMAL(21,10) (terms are 6-rounded doubles — exact, portable).
    // The scan side touches ONLY the BIGINT code column: approximate
    // search over a 64×-compressed corpus, the degraded-gracefully
    // sibling of q34's exact scan (same bounded broadcast shape, 4-
    // byte rows instead of 256-byte vectors).
    Q("q135_ann_pq_adc",
      s"""$pqCtes,
         |$pqAdcCte,
         |r AS (SELECT qid, nid, approx,
         |        CAST(row_number() OVER (PARTITION BY qid
         |          ORDER BY approx ASC, nid ASC) AS BIGINT) AS rnk
         |      FROM adc)
         |SELECT qid, nid, rnk, approx FROM r WHERE rnk <= $TOP_K
         |ORDER BY qid, rnk""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.pqTopK(e.filter(col("vec_id") < N_QUERIES), e, TOP_K,
          Similarity.pqTrainCodebooks(e, PQ_SUB, 16))
        .orderBy("qid", "rnk")
    },

    // ---------------------------------------------------------------- q136
    // PQ two-stage retrieve — the production shape: ADC narrows each
    // query to PQ_RERANK (=100; the measured 0.73-recall width — 30
    // was measured at 0.45, see the constant's note) candidates over
    // codes alone, full vectors are
    // fetched for THOSE rows only (equi-join, never a second scan),
    // and the returned top-10 is the exact rounded cosine. ADC's
    // approximation decides who gets re-ranked; it never decides the
    // returned order.
    Q("q136_ann_pq_rerank",
      s"""$pqCtes,
         |$pqAdcCte,
         |short AS (SELECT qid, nid FROM (
         |    SELECT qid, nid,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY approx ASC, nid ASC) AS ra
         |    FROM adc) WHERE ra <= $PQ_RERANK),
         |ex AS (SELECT s.qid, s.nid,
         |         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS sim
         |       FROM short s JOIN n q ON q.vec_id = s.qid
         |                    JOIN n c ON c.vec_id = s.nid),
         |r AS (SELECT qid, nid, sim,
         |        CAST(row_number() OVER (PARTITION BY qid
         |          ORDER BY sim DESC, nid ASC) AS BIGINT) AS rnk
         |      FROM ex)
         |SELECT qid, nid, rnk, sim FROM r WHERE rnk <= $TOP_K
         |ORDER BY qid, rnk""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.pqRerankTopK(e.filter(col("vec_id") < N_QUERIES), e,
          TOP_K, PQ_RERANK, Similarity.pqTrainCodebooks(e, PQ_SUB, 16))
        .orderBy("qid", "rnk")
    },

    // ---------------------------------------------------------------- q145
    // PQ recall audit — the q98 gate for the PQ regime: per query,
    // how many of the exact top-10 the two-stage PQ retrieve (q136)
    // returns, as hash-verified rows rather than an offline numpy
    // figure. At sf0.1 defaults (8×16 book, one Lloyd round,
    // re-rank@100) mean recall ≈ 0.73 — the number a user checks
    // against their corpus before trading the vector scan for the
    // 64×-compressed code scan. Sample-sized at corpus scale, like
    // every audit in this engine.
    Q("q145_pq_recall",
      s"""$pqCtes,
         |$pqAdcCte,
         |short AS (SELECT qid, nid FROM (
         |    SELECT qid, nid,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY approx ASC, nid ASC) AS ra
         |    FROM adc) WHERE ra <= $PQ_RERANK),
         |ex AS (SELECT s.qid, s.nid,
         |         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS sim
         |       FROM short s JOIN n q ON q.vec_id = s.qid
         |                    JOIN n c ON c.vec_id = s.nid),
         |rr AS (SELECT qid, nid FROM (
         |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
         |      ORDER BY sim DESC, nid ASC) AS rnk FROM ex) WHERE rnk <= $TOP_K),
         |xq AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < $N_QUERIES),
         |xs AS (SELECT qid, n.vec_id AS nid,
         |         round(list_dot_product(qv, v) / (qn * nrm), 6) AS sim
         |       FROM xq, n WHERE n.vec_id <> qid),
         |xr AS (SELECT qid, nid FROM (
         |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
         |      ORDER BY sim DESC, nid) AS rnk FROM xs) WHERE rnk <= $TOP_K),
         |h AS (SELECT xr.qid, count(rr.nid) AS n_hit
         |      FROM xr LEFT JOIN rr ON rr.qid = xr.qid AND rr.nid = xr.nid
         |      GROUP BY 1)
         |SELECT qid, CAST(n_hit AS BIGINT) AS n_hit,
         |  CAST((10000 * n_hit) // $TOP_K AS BIGINT) AS recall_bp
         |FROM h ORDER BY qid""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < N_QUERIES)
      val exact = Similarity.bruteForceTopK(q, e, TOP_K).select(col("qid"), col("nid"))
      val approx = Similarity.pqRerankTopK(q, e, TOP_K, PQ_RERANK,
          Similarity.pqTrainCodebooks(e, PQ_SUB, 16))
        .select(col("qid").as("aqid"), col("nid").as("anid"))
      exact.join(approx,
          col("qid") === col("aqid") && col("nid") === col("anid"), "left")
        .groupBy(col("qid"))
        .agg(count(col("anid")).as("n_hit"))
        .select(col("qid"), col("n_hit"),
          (lit(10000L) * col("n_hit") / lit(TOP_K.toLong)).cast("long").as("recall_bp"))
        .orderBy("qid")
    },

    // ---------------------------------------------------------------- q148
    // Hybrid related-document search: reciprocal-rank fusion of a
    // DENSE arm (exact cosine over the embedding prefix, q34's
    // machinery) and a SPARSE arm (BM25 where the query is the seed
    // document's own token set, q146's operator) — the modern
    // retrieval stack's fusion step, and the realistic
    // partially-embedded-corpus case: at sf0.1 only 2000 of 5000
    // docs carry embeddings, so each arm covers what it can and RRF
    // combines whatever ranks exist (missing arm contributes 0).
    // rrf = 1/(60+r_dense) + 1/(60+r_sparse) — rational, fixed
    // two-term expression (no ordered aggregation), engine-exact;
    // fused rank breaks ties on doc_id. Arms are top-K_ARM and BOTH
    // rank over self-free candidate sets (the dense arm's join
    // excludes qid=nid; the sparse arm filters the seed BEFORE
    // ranking) — so a doc both arms rank first fuses at the full
    // 2/(60+1). Scale: dense arm is the map-only broadcast scan,
    // sparse arm shuffles only query-vocabulary postings, fusion is
    // a full-outer join of two 3×K_ARM-row frames.
    Q("q148_hybrid_rrf",
      s"""$normCtes,
         |dq AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n
         |       WHERE vec_id < $N_SEEDS),
         |ds AS (SELECT query_id, n.vec_id AS doc_id,
         |         round(list_dot_product(qv, v) / (qn * nrm), 6) AS sim
         |       FROM dq, n WHERE n.vec_id <> query_id),
         |dr AS (SELECT query_id, doc_id, rd FROM (
         |    SELECT query_id, doc_id,
         |      CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY sim DESC, doc_id) AS BIGINT) AS rd
         |    FROM ds) WHERE rd <= $K_ARM),
         |st AS (SELECT CAST(count(*) AS DOUBLE) AS nn,
         |    CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS DOUBLE)
         |      / CAST(count(*) AS DOUBLE) AS avgdl FROM documents),
         |qt AS (SELECT DISTINCT doc_id AS query_id, term FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |    FROM documents WHERE doc_id < $N_SEEDS) WHERE term <> ''),
         |p AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf FROM (
         |    SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl, unnest(ws) AS term
         |    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))
         |  WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2, 3),
         |f AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY 1),
         |c AS (SELECT qt.query_id, p.doc_id,
         |        CAST(round(((st.nn - CAST(f.df AS DOUBLE) + 0.5)
         |                     / (CAST(f.df AS DOUBLE) + 0.5))
         |            * (CAST(tf AS DOUBLE) * 2.2)
         |            / (CAST(tf AS DOUBLE)
         |               + 1.2 * (0.25 + 0.75 * (dl / st.avgdl))), 6)
         |          AS DECIMAL(21,10)) AS c
         |      FROM p JOIN f USING (term) JOIN qt USING (term) CROSS JOIN st),
         |sc AS (SELECT query_id, doc_id, sum(c) AS sc FROM c GROUP BY 1, 2),
         |sr AS (SELECT query_id, doc_id, rs FROM (
         |    SELECT query_id, doc_id,
         |      CAST(row_number() OVER (PARTITION BY query_id
         |        ORDER BY sc DESC, doc_id) AS BIGINT) AS rs
         |    FROM sc WHERE doc_id <> query_id) WHERE rs <= $K_ARM),
         |fu AS (SELECT coalesce(d.query_id, s.query_id) AS query_id,
         |         coalesce(d.doc_id, s.doc_id) AS doc_id,
         |         coalesce(1.0 / (60.0 + CAST(d.rd AS DOUBLE)), 0.0)
         |           + coalesce(1.0 / (60.0 + CAST(s.rs AS DOUBLE)), 0.0) AS rrf
         |       FROM dr d FULL OUTER JOIN sr s
         |         ON d.query_id = s.query_id AND d.doc_id = s.doc_id),
         |r AS (SELECT query_id, doc_id, rrf,
         |        CAST(row_number() OVER (PARTITION BY query_id
         |          ORDER BY rrf DESC, doc_id) AS BIGINT) AS rnk FROM fu)
         |SELECT query_id, rnk, doc_id, round(rrf, 6) AS rrf
         |FROM r WHERE rnk <= $K_OUT ORDER BY query_id, rnk""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val e = Tables.embeddings(s, d)
      val dense = Similarity.bruteForceTopK(e.filter(col("vec_id") < N_SEEDS), e, K_ARM)
        .select(col("qid").as("query_id"), col("nid").as("doc_id"),
          col("rnk").as("rd"))
      val seedTerms = docs.filter(col("doc_id") < N_SEEDS)
        .select(col("doc_id").as("query_id"),
          explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "").distinct()
      val sparse = graft.analytics.Retrieval.rankTopK(
          graft.analytics.Retrieval.bm25Scores(docs, seedTerms)
            .filter(col("doc_id") =!= col("query_id")), K_ARM)
        .select(col("query_id"), col("doc_id"), col("rnk").as("rs"))
      val rrf =
        coalesce(lit(1.0) / (lit(60.0) + col("rd").cast("double")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(60.0) + col("rs").cast("double")), lit(0.0))
      dense.join(sparse, Seq("query_id", "doc_id"), "full_outer")
        .select(col("query_id"), col("doc_id"), rrf.as("rrf"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("rrf").desc, col("doc_id"))))
        .filter(col("rnk") <= K_OUT)
        .select(col("query_id"), col("rnk").cast("long").as("rnk"),
          col("doc_id"), graft.ops.Exact.duckRound(col("rrf"), 6).as("rrf"))
        .orderBy("query_id", "rnk")
    },

    // ---------------------------------------------------------------- q153
    // IVF-PQ two-stage retrieve — the two ANN scale levers COMPOSED
    // (Jégou et al. 2011 IVFADC; FAISS IndexIVFPQ): the trained
    // coarse quantizer (q81's, one shared CTE spelling) prunes WHICH
    // codes a query touches (2 of 16 cells), PQ (q134's code store)
    // prunes what each touch COSTS (8 B codes + broadcast distance
    // tables), and the exact re-rank (q136's) restores precise order
    // over the shortlist alone. At 100 TB corpus growth prices
    // ~nProbe/nCells of an 8 B/row scan — the multiplied contract of
    // its two parents. Cell pruning only REMOVES pairs flat-PQ ADC
    // would have scored, so the shortlist is the cell-restricted
    // argmin — the oracle rebuilds coarse training, sub-codebook
    // training, encoding, probe sets, the restricted ADC, and the
    // exact re-rank from first principles.
    Q("q153_ann_ivfpq",
      s"""$pqCtes,
         |$trainedAsgCtes,
         |ncell AS (SELECT vec_id AS nid, cid AS cell FROM asg WHERE rr <= 1),
         |qcell AS (SELECT vec_id AS qid, cid AS cell FROM asg
         |          WHERE rr <= 2 AND vec_id < $N_QUERIES),
         |adcc AS (SELECT pd.vec_id AS qid, pcode.vec_id AS nid,
         |           CAST(sum(CAST(d AS DECIMAL(21,10))) AS DOUBLE) AS approx
         |         FROM pcode JOIN pd ON pd.m = pcode.m AND pd.j = pcode.cj
         |              JOIN ncell ON ncell.nid = pcode.vec_id
         |              JOIN qcell ON qcell.qid = pd.vec_id
         |                        AND qcell.cell = ncell.cell
         |         WHERE pd.vec_id < $N_QUERIES AND pcode.vec_id <> pd.vec_id
         |         GROUP BY 1, 2),
         |short AS (SELECT qid, nid FROM (
         |    SELECT qid, nid,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY approx ASC, nid ASC) AS ra
         |    FROM adcc) WHERE ra <= $PQ_RERANK),
         |ex AS (SELECT s.qid, s.nid,
         |         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS sim
         |       FROM short s JOIN n q ON q.vec_id = s.qid
         |                    JOIN n c ON c.vec_id = s.nid),
         |r AS (SELECT qid, nid, sim,
         |        CAST(row_number() OVER (PARTITION BY qid
         |          ORDER BY sim DESC, nid ASC) AS BIGINT) AS rnk FROM ex)
         |SELECT qid, nid, rnk, sim FROM r WHERE rnk <= $TOP_K
         |ORDER BY qid, rnk""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      // the two model fits are INDEPENDENT collect chains over the
      // same corpus — overlapped driver-side (guide §2.6, round 17):
      // training wall = max(fit walls), not their sum
      val (books, cent) = graft.ops.Par.both(
        Similarity.pqTrainCodebooks(e, PQ_SUB, 16),
        Similarity.kmeansCentroids(e, 16, 1))
      Similarity.ivfPqRerankTopK(e.filter(col("vec_id") < N_QUERIES), e,
          TOP_K, PQ_RERANK, books, cent, nProbe = 2)
        .orderBy("qid", "rnk")
    },

    // ---------------------------------------------------------------- q154
    // IVF-PQ STORE lifecycle — the composed index without the per-run
    // retrain q153 pays: both models train ONCE on the already-
    // ingested corpus (80%, q117's split), the coarse-assignment and
    // code stores persist, the nightly delta is assigned + encoded
    // with the FROZEN models (pure row×model functions → O(Δ)
    // map-only passes), and the retrieve is served from the stores —
    // no training, no corpus re-assignment, no re-encoding in the
    // query path. Because assignment and encoding are deterministic
    // per row under a frozen model, store-served ≡ the full
    // from-first-principles recompute with the same models — which is
    // exactly what the oracle rebuilds (training CTEs over the
    // ingested subset, assignment/encoding over everything, then the
    // q153 retrieve tail).
    Q("q154_ann_ivfpq_store",
      s"""$normCtes,
         |ni AS (SELECT * FROM n WHERE vec_id % 5 <> 0),
         |${pqChain("ni")},
         |${trainedAsgChain("ni")},
         |ncell AS (SELECT vec_id AS nid, cid AS cell FROM asg WHERE rr <= 1),
         |qcell AS (SELECT vec_id AS qid, cid AS cell FROM asg
         |          WHERE rr <= 2 AND vec_id < $N_QUERIES),
         |adcc AS (SELECT pd.vec_id AS qid, pcode.vec_id AS nid,
         |           CAST(sum(CAST(d AS DECIMAL(21,10))) AS DOUBLE) AS approx
         |         FROM pcode JOIN pd ON pd.m = pcode.m AND pd.j = pcode.cj
         |              JOIN ncell ON ncell.nid = pcode.vec_id
         |              JOIN qcell ON qcell.qid = pd.vec_id
         |                        AND qcell.cell = ncell.cell
         |         WHERE pd.vec_id < $N_QUERIES AND pcode.vec_id <> pd.vec_id
         |         GROUP BY 1, 2),
         |short AS (SELECT qid, nid FROM (
         |    SELECT qid, nid,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY approx ASC, nid ASC) AS ra
         |    FROM adcc) WHERE ra <= $PQ_RERANK),
         |ex AS (SELECT s.qid, s.nid,
         |         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS sim
         |       FROM short s JOIN n q ON q.vec_id = s.qid
         |                    JOIN n c ON c.vec_id = s.nid),
         |r AS (SELECT qid, nid, sim,
         |        CAST(row_number() OVER (PARTITION BY qid
         |          ORDER BY sim DESC, nid ASC) AS BIGINT) AS rnk FROM ex)
         |SELECT qid, nid, rnk, sim FROM r WHERE rnk <= $TOP_K
         |ORDER BY qid, rnk""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val ingested = e.filter(col("vec_id") % 5 =!= 0)
      val delta = e.filter(col("vec_id") % 5 === 0)
      // the persisted artifacts (localCheckpoint = the query's analog
      // of reading the nightly store from disk): frozen models +
      // ingested-corpus stores, then O(Δ) delta append with the SAME
      // models — never a retrain, never a re-encode of old rows.
      // The two fit→store lanes are INDEPENDENT job chains (coarse
      // quantizer → assignment store ∥ PQ books → code store) —
      // overlapped driver-side (guide §2.6, round 17): store-build
      // wall = max(lane walls), not their sum
      val ((cent, coarse0), (books, code0)) = graft.ops.Par.both(
        {
          val c = Similarity.kmeansCentroids(ingested, 16, 1)
            .localCheckpoint(true)
          (c, Similarity.kmeansAssign(ingested, c).localCheckpoint(true))
        },
        {
          val b = Similarity.pqTrainCodebooks(ingested, PQ_SUB, 16)
          (b, Similarity.pqEncode(ingested, b).localCheckpoint(true))
        })
      val coarseStore = coarse0
        .unionByName(Similarity.kmeansAssign(delta, cent))
      val codeStore = code0
        .unionByName(Similarity.pqEncode(delta, books))
      Similarity.ivfPqRerankTopKFromStore(e.filter(col("vec_id") < N_QUERIES),
          coarseStore, codeStore, cent, books, TOP_K, PQ_RERANK, nProbe = 2)
        .orderBy("qid", "rnk")
    },

    // ---------------------------------------------------------------- q161
    // Hard-negative mining (Karpukhin et al. 2020 §3.2, the DPR
    // recipe): per anchor, the 3 most-confusable candidates from a
    // DIFFERENT source, below the 0.95 near-dup ceiling that keeps
    // disguised positives out of the negative set. The exact scan is
    // the gate-verifiable baseline; at corpus scale the candidate
    // generator swaps for the ANN paths (widened k), the filter +
    // rank tail is identical. Zero-norm sims are null on both
    // engines (the ANSI x/0 rule) and drop at the ceiling filter.
    Q("q161_hard_negatives",
      s"""$normCtes,
         |src AS (SELECT doc_id AS vec_id, source FROM documents),
         |ns AS (SELECT n.vec_id, v, nrm, source FROM n JOIN src USING (vec_id)),
         |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn, source AS qs
         |      FROM ns WHERE vec_id < $N_QUERIES),
         |s AS (SELECT qid, ns.vec_id AS nid, ns.source AS n_source,
         |        CASE WHEN (qn * nrm) <> 0
         |          THEN round(list_dot_product(qv, v) / (qn * nrm), 6) END AS sim
         |      FROM q, ns WHERE ns.vec_id <> qid AND ns.source <> qs),
         |f AS (SELECT * FROM s WHERE sim < 0.95),
         |r AS (SELECT qid, nid, n_source, sim,
         |        CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rnk
         |      FROM f)
         |SELECT qid, nid, rnk, sim, n_source FROM r WHERE rnk <= 3
         |ORDER BY qid, rnk""".stripMargin) { (s, d) =>
      val src = Tables.documents(s, d).select(col("doc_id").as("vec_id"), col("source"))
      val e = Tables.embeddings(s, d).join(src, Seq("vec_id"))
      Similarity.hardNegativesTopK(e.filter(col("vec_id") < N_QUERIES), e, 3, 0.95)
        .select("qid", "nid", "rnk", "sim", "n_source")
        .orderBy("qid", "rnk")
    },

    // ---------------------------------------------------------------- q178
    // Similarity top-k REWRITE (SURVEY §4/§7.3's custom planner
    // strategy): the Spark side runs the PLAIN brute-force spelling —
    // the same declarative code as q34 — with an IVF store registered
    // for the corpus, and RewriteSimTopK substitutes the store-served
    // bound-pruned plan (triangle-inequality cell pruning: provably
    // EXACT on any data, so the oracle is plain brute force — unlike
    // the approximate serves q153/q154, which the planner never
    // substitutes). The runner REQUIRES the rewrite fired (hitCount)
    // and materializes under the registration, so the hashed rows are
    // genuinely the substituted plan's output; RewriteSimTopKSpec
    // holds the plan-swap assert, the decline cases, and the
    // pruning-on-clustered-corpus measurement (on these near-isotropic
    // embeddings the radii approach the sphere diameter and pruning is
    // thin — the q98 recall-audit lesson — but exactness never
    // depends on it).
    Q("q178_simtopk_rewrite",
      s"""$normCtes,
         |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < $N_QUERIES),
         |s AS (SELECT qid, n.vec_id AS nid,
         |        round(list_dot_product(qv, v) / (qn * nrm), 6) AS sim
         |      FROM q, n WHERE n.vec_id <> qid),
         |r AS (SELECT qid, nid, sim,
         |        CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rnk
         |      FROM s)
         |SELECT qid, nid, rnk, sim FROM r WHERE rnk <= $TOP_K
         |ORDER BY qid, rnk""".stripMargin) { (s, d) =>
      graft.functions.GraftExtensions.install(s)
      val e = Tables.embeddings(s, d)
      val (cent, _, coarse, _) = ivfPqStores(s, d)
      val h = graft.plans.RewriteSimTopK.register(e, coarse, cent, label = s"q178:$d")
      try {
        val out = Similarity.bruteForceTopK(e.filter(col("vec_id") < N_QUERIES), e, TOP_K)
          .select("qid", "nid", "rnk", "sim")
          .orderBy("qid", "rnk")
          .localCheckpoint(true) // materialize WITH the store registered
        require(h.hitCount > 0,
          "q178: RewriteSimTopK did not fire — the gate would be hashing brute force")
        out
      } finally graft.plans.RewriteSimTopK.unregister(h)
    }
  )
}
