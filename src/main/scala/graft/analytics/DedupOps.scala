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

  /** Exact dedup groups: fingerprint → (keeper id, group size). */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))

  /** Distinct-shingle sizes per doc. */
  def shingleSizes(sh: DataFrame): DataFrame =
    sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))

  /** Pairwise Jaccard over docs sharing >= 1 shingle (inverted-index
    * candidate generation — the shuffle key is the shingle, so skew =
    * stop-shingles; for web-scale corpora drop ultra-frequent shingles
    * first, same as stopword removal). */
  def jaccardPairs(sh: DataFrame, threshold: Double): DataFrame = {
    val a = sh.select(col("doc_id").as("d1"), col("s"))
    val b = sh.select(col("doc_id").as("d2"), col("s"))
    val common = a.join(b, Seq("s")).filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("c"))
    val sz = shingleSizes(sh)
    common
      .join(sz.select(col("doc_id").as("d1"), col("n").as("n1")), Seq("d1"))
      .join(sz.select(col("doc_id").as("d2"), col("n").as("n2")), Seq("d2"))
      .withColumn("jaccard",
        round(col("c").cast("double") / (col("n1") + col("n2") - col("c")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  val MINHASH_K = 16          // signature length
  val MINHASH_BANDS = 4       // 4 bands x 4 rows

  /** Portable MinHash: the i-th hash of shingle s is the first 16 hex
    * chars of sha256(s || "#i"); min is taken over the hex STRING
    * (equal-length hex ⇒ string order = numeric order). */
  def minhashSignatures(sh: DataFrame): DataFrame = {
    val aggs = (0 until MINHASH_K).map { i =>
      min(substring(sha2(concat(col("s"), lit("#" + i)), 256), 1, 16)).as(f"m$i%02d")
    }
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH band values: concatenation of the band's minhashes. */
  def withBands(sig: DataFrame): DataFrame = {
    val rows = MINHASH_K / MINHASH_BANDS
    (0 until MINHASH_BANDS).foldLeft(sig) { (df, b) =>
      val cols = (0 until rows).map(r => col(f"m${b * rows + r}%02d"))
      df.withColumn(s"band$b", concat(cols: _*))
    }
  }

  /** MinHash-LSH candidate pairs verified with exact Jaccard. */
  def minhashLshPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = shingleSet(docs, 3)
    val banded = withBands(minhashSignatures(sh))
    val cands = (0 until MINHASH_BANDS).map { b =>
      val l = banded.select(col("doc_id").as("d1"), col(s"band$b").as("bv"))
      val r = banded.select(col("doc_id").as("d2"), col(s"band$b").as("bv"))
      l.join(r, Seq("bv")).filter(col("d1") < col("d2")).select(col("d1"), col("d2"))
    }.reduce(_.unionByName(_)).distinct()
    jaccardPairs(sh, threshold)
      .join(cands, Seq("d1", "d2"), "left_semi")
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  val SIMHASH_BITS = 16
  val SIMHASH_BANDS = 4

  /** Per-token 16-bit hash: first 4 hex chars of sha256(token). */
  def tokenHash16(w: Column): Column =
    conv(substring(sha2(w, 256), 1, 4), 16, 10).cast("long")

  /** SimHash signature over token-frequency-weighted bit votes. */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(tokens(col("text"))).as("w"))
      .withColumn("v", tokenHash16(col("w")))
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
    l.join(r, Seq("k", "band")).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        bit_count(col("sig1").bitwiseXOR(col("sig2"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
