package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: tokenization,
  * shingling, fingerprinting, language ID, quality scoring. All pure
  * column expressions (codegen'd, no UDFs) so they run inside
  * whole-stage codegen and scale linearly with input splits.
  *
  * Determinism rules (cross-engine oracle parity):
  *  - no transcendental functions (exp/log/pow are not correctly
  *    rounded and differ across libm implementations); only + * / and
  *    sqrt, which IEEE 754 requires to be exact;
  *  - hashing is sha-256 (bit-identical everywhere) — not murmur,
  *    which differs between engines.
  */
object TextAnalysis {

  /** Whitespace tokenization (corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Canonical text normalization: lowercase, trim, collapse runs of
    * whitespace — the usual pre-fingerprint cleanup. */
  def normalizeText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Content fingerprint: sha-256 of the normalized text. Used as the
    * exact-dedup key (a 100 TB-safe groupBy key: 32 bytes, uniform). */
  def fingerprint(text: Column): Column =
    sha2(normalizeText(text), 256)

  /** Word n-gram shingles as an array column, built by zipping n
    * shifted slices of the token array.
    *
    * Expression-shape warning learned the hard way: a lambda body that
    * captures an outer column (e.g. transform(seq, i =>
    * element_at(ws, i))) re-evaluates that captured expression on
    * EVERY lambda invocation — with ws = split(text) that meant
    * re-running the split ~300x per document (~20x slowdown). Here
    * the slices are first-class HOF arguments, evaluated once per
    * row; the lambdas touch only their bound variables.
    * Short texts: slice length max(size-n+1, 0) = 0 → empty result. */
  def shingles(ws: Column, n: Int): Column = {
    val len = greatest(size(ws) - (n - 1), lit(0))
    (1 to n).map(o => slice(ws, lit(o), len))
      .reduce((acc, p) => zip_with(acc, p, (a, b) => concat_ws(" ", a, b)))
  }

  /** (doc_id, s) distinct shingle set, exploded — the working set for
    * Jaccard / MinHash. Distinctness is per-document by construction,
    * so `array_distinct` BEFORE the explode gives the same rows as a
    * global distinct on (doc_id, s) with zero shuffle — the whole
    * frame is a map-only scan that pipelines into whatever join or
    * aggregation consumes it. (The earlier explode-then-distinct
    * formulation shuffled the full shingle set; at 100 TB that shuffle
    * is the corpus itself.) Cheap to recompute from the source, so it
    * is NOT persisted — measured: caching the exploded set costs more
    * in memory-format materialization than the recompute. */
  def shingleSet(docs: DataFrame, n: Int = 3,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      graft.functions.ShingleExplode.shingle_explode(col(textCol), n).as("s"))

  /** Number of tokens matching a fixed vocabulary (stopword counting
    * without an explode — runs entirely inside codegen). */
  def vocabHits(ws: Column, vocab: Seq[String]): Column =
    size(filter(ws, w => array_contains(typedLit(vocab), w)))

  private def charClassCount(text: Column, pattern: String): Column =
    length(text) - length(regexp_replace(text, pattern, ""))

  val EN_MARKERS = Seq("the", "a", "of", "and", "is", "to", "in")
  val DE_MARKERS = Seq("der", "die", "das", "und", "ist", "nicht", "ein")
  val FR_MARKERS = Seq("le", "la", "les", "et", "est", "un", "une")
  val ES_MARKERS = Seq("el", "los", "las", "y", "es", "un", "una")

  /** Language ID: character-script ratios decide CJK/Hangul/Cyrillic;
    * Latin-script text is classified by marker-word vote with a
    * deterministic tie-break (en > de > fr > es). An n-gram model
    * would slot in the same shape; the operator contract (one scan,
    * one string out) is what matters at scale.
    *
    * All counts come from ONE `TextStats` pass (the regexp spelling
    * ran 4 char-class regex passes + 4 tokenize-filter passes; the
    * struct fields are CSE'd to a single scan per row). */
  def langId(text: Column): Column = {
    val st = graft.functions.TextStats.text_stats(text)
    val n = greatest(st.getField("nc"), lit(1)).cast("double")
    val hangul = st.getField("hang").cast("double") / n
    val cjk = st.getField("cjk").cast("double") / n
    val kana = st.getField("kana").cast("double") / n
    val cyr = st.getField("cyr").cast("double") / n
    val nEn = st.getField("en")
    val nDe = st.getField("de")
    val nFr = st.getField("fr")
    val nEs = st.getField("es")
    when(kana > 0.05, "ja")
      .when(hangul > 0.3, "ko")
      .when(cjk > 0.3, "zh")
      .when(cyr > 0.3, "ru")
      .when(nDe > nEn && nDe >= nFr && nDe >= nEs, "de")
      .when(nFr > nEn && nFr >= nEs, "fr")
      .when(nEs > nEn, "es")
      .otherwise("en")
  }

  /** Document quality score in [0,1] from cheap surface statistics —
    * rational arithmetic only (deterministic across engines). Counts
    * come from one fused `TextStats` scan (was: a digit-regex pass +
    * a tokenize-filter pass + two length scans). */
  def qualityScore(text: Column): Column = {
    val st = graft.functions.TextStats.text_stats(text)
    val nChars = st.getField("nc").cast("double")
    val nTokens = st.getField("nt").cast("double")
    val digits = st.getField("dg").cast("double")
    val stop = st.getField("en").cast("double")
    val lengthTerm = least(lit(1.0), nTokens / lit(100.0))
    val digitTerm = lit(1.0) - digits / greatest(nChars, lit(1.0))
    val stopTerm = least(lit(1.0), stop / greatest(nTokens, lit(1.0)) * lit(5.0))
    val meanLenTerm = least(lit(1.0),
      nChars / greatest(nTokens, lit(1.0)) / lit(8.0))
    graft.ops.Exact.duckRound(lit(0.3) * lengthTerm + lit(0.2) * digitTerm +
          lit(0.3) * stopTerm + lit(0.2) * meanLenTerm, 6)
  }

  /** BPE merge training over a word-frequency dictionary `(word,
    * freq)`: `rounds` iterations of count-adjacent-pairs → take the
    * top pair under a (count desc, pair asc) total order → merge it
    * across the dictionary. Returns the merge table (rank, pair,
    * merged, count) and the post-training segmentation frame
    * `(word, freq, seg)` — q138 gates the former, q140 re-tokenizes
    * the corpus through the latter.
    *
    * The driver loop collects ONE model row per round (the MLlib-fit
    * pattern, not a data loop); all heavy lifting is
    * dictionary-sized and localCheckpoint'd between rounds. The
    * merge rule is non-overlapping left-to-right replace of the
    * spaced pair — the rule both Spark's and the oracle's native
    * `replace` implement, so training is reproducible and
    * SQL-unrollable (deliberately NOT HuggingFace-BPE emulation).
    * Costs scale with the dictionary, never the corpus. */
  def bpeTrain(words: DataFrame, rounds: Int): (Seq[(Long, String, String, Long)], DataFrame) = {
    val (merges, trace) = bpeTrainTrace(words, rounds)
    (merges, trace.last)
  }

  /** [[bpeTrain]] exposing every round's segmentation frame (index r
    * = after r merges; index 0 = the char segmentation) — each round
    * is localCheckpoint'd anyway, so the trace is free, and a
    * consumer wanting the whole compression curve (q189) trains ONCE
    * instead of once per round. Early exhaustion (fewer merges exist
    * than `rounds`) pads the trace with the final frame so indices
    * stay addressable. */
  def bpeTrainTrace(words: DataFrame, rounds: Int)
      : (Seq[(Long, String, String, Long)], Seq[DataFrame]) = {
    var segs = words
      .withColumn("seg", trim(regexp_replace(col("word"), "(.)", "$1 ")))
      .localCheckpoint(true) // dictionary-sized; every round re-reads it
    val trace = Seq.newBuilder[DataFrame]
    trace += segs
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      // the round's MODEL: one (pair, cnt) row; None when no word has
      // two adjacent tokens left (all-single-token dictionary or
      // rounds > available merges) — stop early with the merges found
      // so far, mirroring the SQL twin's empty-join no-op rather than
      // crashing on an empty collect
      val topOpt = segs
        .select(col("freq"), split(col("seg"), " ").as("ts"))
        .filter(size(col("ts")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(ts) - 1), i -> concat(ts[i-1], ' ', ts[i]))")).as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1).collect().headOption
      if (topOpt.isEmpty) exhausted = true
      else {
        val top = topOpt.get
        val (pair, cnt) = (top.getAs[String]("pair"), top.getAs[Long]("cnt"))
        val merged = pair.replace(" ", "")
        merges += ((r.toLong, pair, merged, cnt))
        segs = segs.withColumn("seg", trim(regexp_replace(
          concat(lit(" "), col("seg"), lit(" ")),
          lit(java.util.regex.Pattern.quote(s" $pair ")),
          lit(java.util.regex.Matcher.quoteReplacement(s" $merged ")))))
          .localCheckpoint(true)
        trace += segs
        r += 1
      }
    }
    val t = trace.result()
    (merges.result(), t ++ Seq.fill(rounds + 1 - t.length)(t.last))
  }

  /** The q132 hard quality-rule battery — THE single spelling of the
    * C4/Gopher-style keep decision, shared by the q132 gate, the q155
    * capstone's stage 1, and the streaming curation twin
    * (CurationStream): batch/stream parity is structural, not
    * copy-paste, and a bound change here changes every consumer at
    * once. Every ratio rule is integer cross-multiplied (no double
    * division for the engines to round differently — the q80/q81
    * portability lesson); inputs come from ONE fused TextStats pass.
    * Returns a struct (nt, r_wordcount, r_meanlen, r_digit,
    * r_stopword, keep) — the optimizer collapses getField(struct)
    * back to the underlying expressions. */
  def qualityBattery(text: Column): Column = {
    val st = graft.functions.TextStats.text_stats(text)
    val nt = st.getField("nt").cast("long")
    val nc = st.getField("nc").cast("long")
    val dg = st.getField("dg").cast("long")
    val en = st.getField("en").cast("long")
    val wc = length(replace(text, lit(" "), lit(""))).cast("long")
    val rWord = nt >= 30 && nt <= 10000
    val rMean = lit(3) * nt <= wc && lit(2) * wc <= lit(9) * nt
    val rDigit = lit(10) * dg <= nc
    val rStop = en >= 2
    struct(nt.as("nt"), rWord.as("r_wordcount"), rMean.as("r_meanlen"),
      rDigit.as("r_digit"), rStop.as("r_stopword"),
      (rWord && rMean && rDigit && rStop).as("keep"))
  }
}
