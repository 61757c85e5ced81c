package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-record entity resolution — the ER pipeline behind q166
  * and its incremental face q167, factored to ONE spelling so the
  * batch query and the nightly-delta path cannot drift (the
  * qualityBattery rule applied to ER).
  *
  * Record contract: part-shaped frames (p_partkey, p_brand, p_name,
  * p_type, p_size) — the key, the blocking field, the fuzzy field
  * and two corroborating fields. The FIELD WEIGHTS are the domain
  * config a user edits; the pipeline shape (block → score →
  * components → canonical) is the operator.
  *
  * Match rule (Fellegi–Sunter shape, integer-exact):
  * 2·[levenshtein(name) ≤ 2] + 1·[type =] + 1·[|size Δ| ≤ 1] ≥ 4 —
  * name similarity is NECESSARY but NOT SUFFICIENT (at sf0.1 the
  * 220k in-block lev-pairs collapse to 2,135 corroborated matches).
  *
  * Scale shape: q65's dictionary-first metric — the Levenshtein
  * runs over DISTINCT names × a ±2 length band (edit distance ≤ 2
  * forces |len Δ| ≤ 2), never rows²; record pairs are recovered
  * through ONE equi-join on the name-pair dictionary carrying the
  * multi-pass blocking coverage as a per-dictionary-pair flag
  * (see [[block2Col]]..[[block6Col]] and [[nameCoverage]]); the
  * pair list entering connected components is match-output-sized.
  */
object EntityResolution {

  /** The match rule's constants — ONE definition consumed by the
    * batch side (matchPairs below) AND the streaming twin
    * (ErStream.isMatch), so editing a weight cannot drift the two
    * (the qualityBattery rule applied to ER). */
  val MAX_NAME_DIST = 2
  val W_NAME = 2
  val W_TYPE = 1
  val W_SIZE = 1
  val SIZE_BAND = 1
  val MATCH_THRESHOLD = 4

  /** Second and third blocking keys (multi-pass blocking, round 12):
    * the name's FIRST and LAST tokens. The q180 audit measured
    * single-pass brand blocking at 390 bp recall on this name space
    * (names collide heavily ACROSS brands) — the standard fix is
    * additional blocking passes under independent keys, candidates
    * unioned (Papadakis et al.'s multi-pass blocking;
    * Hernández–Stolfo's multi-pass sorted neighborhood). The token
    * keys exploit the metric's own structure: a lev ≤ 2 edit budget
    * cannot disturb BOTH the first and the last token unless it
    * splits two single-char edits across them, so brand ∪ first ∪
    * last covers every match pair short of that corner (measured at
    * sf0.1: 390 bp single-pass → 10,000 bp three-pass, candidates
    * 5.5M — output-bounded, reported by the audit's cand_pairs
    * column). All passes stay EQUI keys — no new join shape. One
    * spelling batch + stream: [[block2Col]]/[[block3Col]] are
    * `substring_index(name, " ", ±1)`; [[block2Key]]/[[block3Key]]
    * their exact String twins (ErStream's bucket keys). */
  def block2Col(name: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring_index(name, " ", 1)

  /** Last token: `substring_index(name, " ", -1)`. */
  def block3Col(name: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring_index(name, " ", -1)

  /** String twin of [[block2Col]] — everything before the first
    * space, the whole string when spaceless. */
  def block2Key(name: String): String = {
    val i = name.indexOf(' ')
    if (i < 0) name else name.substring(0, i)
  }

  /** String twin of [[block3Col]] — everything after the last space. */
  def block3Key(name: String): String =
    name.substring(name.lastIndexOf(' ') + 1)

  /** Fourth blocking key (round 13): the name's MIDDLE SECTION —
    * everything between the first and last tokens ("" for names of
    * ≤ 2 tokens). This closes the r12 split-edit corner STRUCTURALLY
    * for ≥ 3-token names: a lev ≤ 2 budget split as one edit in the
    * first token and one in the last cannot touch anything between
    * them, so any pair evading passes 1–3 that way agrees on this
    * key. The EMPTY key is PURGED from pass 4 (standard oversized-
    * block hygiene, Papadakis et al.'s block purging): "" would be a
    * degenerate blocking key collecting EVERY ≤ 2-token name — on
    * this corpus's 2-token name space that is one 20,000-member
    * stream bucket scanning 4·10⁸ member pairs in a single FMGWS
    * group (measured: er 2,621 → 599 recs/s before the purge — the
    * constant-key-funnel anti-pattern) and, batch-side, the
    * unblocked truth arm in disguise. A 2-edit split across a
    * 2-token name touches the WHOLE name — no token-structural key
    * can block it; that corner stays accepted AND measured by the
    * q180 audit. The residual corner for long names narrows to
    * TOKEN-RESTRUCTURING edits (e.g. a deleted space merging two
    * tokens plus a far-end char edit, brands differing) —
    * AnalyticsSpec's space-merge evader. Anchored regexes, so the
    * first-match-vs-global replace semantics of Spark/Java/DuckDB
    * agree; oracle spelling in MiscQueries.erMiddleSql. */
  def block4Col(name: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(name, "^\\S+\\s*", ""), "\\s*\\S+$", "")

  /** String twin of [[block4Col]] (ErStream's bucket key). */
  def block4Key(name: String): String =
    name.replaceFirst("^\\S+\\s*", "").replaceFirst("\\s*\\S+$", "")

  /** Window width of the fifth/sixth blocking keys. 8 profiled on the
    * corpus BEFORE wiring (the block4Col lesson): stripped-prefix-8
    * buckets max 347 members at sf0.1 / stripped-suffix-8 max 1,238 —
    * both FINER than the existing first/last-token buckets (8 noun/
    * adjective keys ⇒ ~2,500 members), so the stream adds no new
    * worst bucket. */
  val STRIP_LEN = 8

  /** Fifth and sixth blocking keys (round 14): the SPACE-STRIPPED
    * name's first and last [[STRIP_LEN]] characters. Closes the
    * r13 residual TOKEN-RESTRUCTURING corner structurally: a lev ≤ 2
    * budget that spends one edit on a whitespace insert/delete (the
    * space-merge that re-tokenizes every token key, middle included)
    * leaves the STRIPPED forms within lev ≤ 1, and a single
    * character edit cannot disturb both the first STRIP_LEN and the
    * last STRIP_LEN stripped characters unless the stripped name is
    * shorter than 2·STRIP_LEN AND the edit falls in the overlap zone
    * [len−STRIP_LEN, STRIP_LEN) — suffix-from-the-END keys are
    * alignment-free under inserts/deletes before them, prefix keys
    * under edits after them (the PassJoin/pigeonhole observation).
    * What remains uncovered: 2-edit splits touching both windows
    * (the 2-token whole-name corner, already accepted-and-audited)
    * and mid-overlap edits on short names — both still measured by
    * the q180 audit's truth arm. Spark's regexp_replace is global;
    * the oracle twin carries DuckDB's 'g' flag. */
  def block5Col(name: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring(regexp_replace(name, "\\s+", ""), 1, STRIP_LEN)

  /** Last STRIP_LEN stripped chars — spelled substr(greatest(len−K+1,
    * 1)) so Spark and DuckDB agree on short strings. */
  def block6Col(name: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val s = regexp_replace(name, "\\s+", "")
    s.substr(greatest(length(s) - (STRIP_LEN - 1), lit(1)), length(s))
  }

  /** String twin of [[block5Col]] (ErStream's bucket key). */
  def block5Key(name: String): String = {
    val s = name.replaceAll("\\s+", "")
    s.substring(0, math.min(STRIP_LEN, s.length))
  }

  /** String twin of [[block6Col]]. */
  def block6Key(name: String): String = {
    val s = name.replaceAll("\\s+", "")
    s.substring(math.max(0, s.length - STRIP_LEN))
  }

  /** Length-band-blocked Levenshtein dictionary pairs — q65's
    * dictionary-first metric, the ONE spelling for every fuzzy
    * consumer (q65, matchPairs): edit distance ≤ maxDist forces
    * |len Δ| ≤ maxDist, so the probe dictionary explodes to its
    * 2·maxDist+1 candidate lengths and equi-joins the base
    * dictionary's exact length — O(|names| × names-per-length-band)
    * metric evaluations, never |names|². Inputs are single-column
    * name dictionaries; output (n1, n2, dist ≤ maxDist), both
    * orders present when probe = base. */
  def levBandPairs(probeNames: DataFrame, baseNames: DataFrame,
                   maxDist: Int): DataFrame = {
    val left = probeNames.toDF("n1")
      .withColumn("_lb",
        explode(array((-maxDist to maxDist).map(dl => length(col("n1")) + dl): _*)))
    val right = baseNames.toDF("n2").withColumn("_lb", length(col("n2")))
    left.join(broadcast(right), Seq("_lb")).drop("_lb")
      .withColumn("dist", levenshtein(col("n1"), col("n2")).cast("long"))
      .filter(col("dist") <= maxDist)
  }

  /** Scored candidate match pairs between `probe` and `base`
    * records: canonical (d1 < d2), distinct, self-pairs excluded.
    * `matchPairs(p, p)` is the full batch pass; `matchPairs(Δ, all)`
    * is the nightly delta probe — one-sided probing reaches every
    * old–new AND new–new pair (the q102 incremental contract),
    * so store ∪ deltaPairs ≡ the full recompute. */
  def matchPairs(probe: DataFrame, base: DataFrame): DataFrame =
    canonical(recoveredPairs(probe, base, blocked = true,
        nameDict(probe, base))
      .filter(matchScore >= MATCH_THRESHOLD))

  /** The lev ≤ MAX_NAME_DIST name-pair dictionary both recovery modes
    * join through — factored out so multi-arm consumers (the audit:
    * truth + blocked + candidates) compute it ONCE. */
  private def nameDict(probe: DataFrame, base: DataFrame): DataFrame =
    levBandPairs(
      probe.select(col("p_name")).distinct(),
      base.select(col("p_name")).distinct(), MAX_NAME_DIST)
      .drop("dist")

  private def matchScore =
    lit(W_NAME) + when(col("ta") === col("tb"), W_TYPE).otherwise(0) +
      when(abs(col("sa") - col("sb")) <= SIZE_BAND, W_SIZE).otherwise(0)

  /** Name-key blocking coverage of a dictionary pair (n1, n2) — the
    * plain OR the disjoint passes 2–6 telescope to (each later pass
    * is its key minus earlier coverage): first-token ∨ last-token ∨
    * non-empty middle ∨ non-empty stripped-prefix-8 ∨ non-empty
    * stripped-suffix-8. Evaluated ONCE PER DISTINCT NAME PAIR on the
    * dictionary (q65's dictionary-first rule applied to the blocking
    * regexes) — never per record pair. ONE spelling for the audit's
    * `_nk` flag and the production recovery's `_cov` flag. */
  private def nameCoverage: org.apache.spark.sql.Column =
    block2Col(col("n1")) === block2Col(col("n2")) ||
      block3Col(col("n1")) === block3Col(col("n2")) ||
      (block4Col(col("n1")) === block4Col(col("n2")) &&
        block4Col(col("n1")) =!= lit("")) ||
      (block5Col(col("n1")) === block5Col(col("n2")) &&
        block5Col(col("n1")) =!= lit("")) ||
      (block6Col(col("n1")) === block6Col(col("n2")) &&
        block6Col(col("n1")) =!= lit(""))

  private def canonical(pairs: DataFrame): DataFrame =
    pairs.select(least(col("ka"), col("kb")).as("d1"),
        greatest(col("ka"), col("kb")).as("d2"))
      .distinct()

  /** ONE spelling of the candidate-recovery join, parameterized by
    * whether BLOCKING applies — matchPairs (the production path), the
    * audit's unblocked truth arm, and its candidate count all read
    * this body, so the audit can never drift from the rule it audits.
    *
    * Blocked = the MULTI-PASS coverage (round 12, pass 4 round 13,
    * passes 5/6 round 14) spelled as ONE equi-join with a
    * DICTIONARY-LEVEL coverage flag (round 17): passes 2–6's blocking
    * keys are functions of the NAME PAIR alone, so their disjoint
    * union telescopes to [[nameCoverage]], evaluated once per
    * distinct name pair on the (tiny, lev-banded) dictionary; the
    * record-level residual is `ba = bb ∨ (_cov ∧ ba ≠ bb)` — two
    * string compares and a boolean, nothing name-derived. NULL
    * brands fail both arms, exactly as they failed every pass
    * (pass 1 needed ba = bb, passes 2–6 ba ≠ bb).
    *
    * Why this beats BOTH prior spellings (same-boot r17 A/B, sf0.1
    * AND the 10× mass-duplicate corpus — supersedes the SCALING.md
    * r14 "don't fold" row): the r14 one-join-OR (432 s vs union
    * 138 s at 10×) lost for two reasons this spelling removes — it
    * evaluated six REGEX keys per enumerated record pair (here the
    * regexes run on dictionary rows only; the residual is two string
    * compares and a boolean), and it ran the whole enumeration on
    * the record scan's SINGLE split (the union's six independent
    * single-task stages at least overlapped ~6-way; the floor gives
    * the one join the full session parallelism instead). The union
    * additionally re-enumerates every same-name pair per pass (all
    * six hash keys match when names are equal; five residuals drop
    * it after the probe) — exactly the pair class a mass-duplicate
    * corpus multiplies R². Measured (r17, same boot, isolated,
    * best-of-2 warm): sf0.1 matchPairs 2.0 → 0.7 s; 10× corpus
    * (tools/scale_rel_gen.py) 97–101 s (union) → 6.3–7.9 s, 15×,
    * identical 6,365,800 output pairs. No new join shape, no pair
    * blow-up at 100 TB. */
  private def recoveredPairs(probe: DataFrame, base: DataFrame,
                             blocked: Boolean, nd: DataFrame): DataFrame = {
    val a = probe.select(col("p_partkey").as("ka"), col("p_brand").as("ba"),
      col("p_name").as("n1"), col("p_type").as("ta"), col("p_size").as("sa"))
    val b = base.select(col("p_partkey").as("kb"), col("p_brand").as("bb"),
      col("p_name").as("n2b"), col("p_type").as("tb"), col("p_size").as("sb"))
    val recov = col("n2") === col("n2b") && col("ka") =!= col("kb")
    if (blocked) {
      // parallelism floor on the probe side (the audit's round-16
      // rationale): the whole per-pair enumeration otherwise runs on
      // the record scan's split count — ONE task for a single-row-
      // group file, and unlike the six-pass union (whose independent
      // single-task stages at least overlapped) the one flagged join
      // would serialize the entire enumeration. No-op at real scale.
      val ap = graft.ops.Guards.parallelismFloor(a)
      val ndc = nd.withColumn("_cov", nameCoverage)
      ap.join(broadcast(ndc), Seq("n1"))
        .join(b, recov && (col("ba") === col("bb") ||
          (col("_cov") && col("ba") =!= col("bb"))))
        .drop("_cov")
    } else a.join(broadcast(nd), Seq("n1")).join(b, recov)
  }

  /** Blocking-recall audit — the knob-validator the ER family owes
    * its block (the q98/q124/q142/q177 convention: every
    * approximation ships with the audit that measures it). The
    * production pipeline BLOCKS on brand equality ∪ first-token
    * equality (multi-pass — see [[block2Col]]; single-pass brand
    * alone measured 390 bp here, the round-11 verdict item): a pair
    * evading BOTH keys never reaches scoring, and nothing in
    * q166/q167 measures that miss. Here the TRUTH arm re-scores the
    * same rule WITHOUT any blocking key (the name length band is NOT
    * audited — edit distance ≤ d mathematically forces |len Δ| ≤ d,
    * a lossless block), and the audit reports, in one row: truth
    * pairs, blocked pairs (always ⊆ truth — same score rule), missed
    * pairs, recall in basis points, and the candidate-pair count the
    * blocking admits to scoring (recall is only honest next to the
    * candidate volume paid for it).
    *
    * `sampleMod` keeps the truth arm sample-sized at corpus scale
    * (p_partkey % sampleMod = 0 — deterministic, oracle-expressible);
    * the gate runs full (sampleMod = 1). Cost shape: the truth arm
    * pays the SAME dictionary × length-band Levenshtein as the
    * production pass (q65's metric) — only the record-recovery join
    * loses the brand key, so the extra cost is the wider recovered
    * pair list, bounded by per-name multiplicity. */
  def blockingRecallAudit(records: DataFrame, sampleMod: Long = 1): DataFrame = {
    val p0 = if (sampleMod == 1) records
      else records.filter(col("p_partkey") % sampleMod === 0)
    // parallelism FLOOR on the enumeration's stream side (round 16):
    // the truth arm is ONE unblocked recovery join whose stream side
    // inherits the record scan's split count — a catalog-sized input
    // in one parquet row group runs the whole per-pair scoring on ONE
    // core (measured: 9.1 s wall with ~13 executor-CPU-s at sf0.1;
    // 3.7 s floored). No-op at real scale (Guards.parallelismFloor).
    val p = graft.ops.Guards.parallelismFloor(p0)
    // ONE name-pair dictionary feeds the recovery join —
    // dictionary-pair-sized, so the eager checkpoint is the "tiny
    // many-branch intermediate" pattern (q97's candidate list), not a
    // corpus-sized write. The five NAME-derived blocking keys are
    // evaluated HERE, once per distinct name pair (q65's
    // dictionary-first rule applied to the blocking regexes), not per
    // recovered record pair — `_nk` rides through recoveredPairs'
    // broadcast join as an extra nd column.
    val nd = nameDict(p, p).withColumn("_nk", nameCoverage).localCheckpoint(true)
    // ROUND-16 SHAPE: ONE unblocked enumeration with the blocking
    // coverage as a PER-ROW FLAG, aggregated per canonical pair —
    // exactly the oracle's max(CASE WHEN <block OR> ...) spelling.
    // The previous three-arm spelling (truth + blocked + cands) paid
    // the six-pass recovery join TWICE on top of the unblocked truth
    // enumeration (27 joins total, ~42 executor-CPU-s at sf0.1); the
    // flag spelling pays the truth enumeration ONCE and evaluates the
    // six block conditions per row (13 joins → 3, measured 10.9 →
    // ~4 s isolated). Equivalence: the six disjoint passes' union is
    // the plain OR of their keys (each later pass adds its key's
    // coverage minus the earlier ones'), which is erBlockSql verbatim;
    // score and block flags are symmetric in (ka, kb), so max() over
    // the ≤2 recovered orders of a pair equals either row's value.
    // NOTE the production path (matchPairs) KEEPS the six-join union —
    // at 10× mass-duplication the finer-keyed joins enumerate fewer
    // pairs (the recoveredPairs scaladoc measurement); here the
    // unblocked arm must enumerate everything anyway, so the blocked
    // arms were pure re-computation.
    val rec = recoveredPairs(p, p, blocked = false, nd)
    val per = rec.select(
        least(col("ka"), col("kb")).as("d1"),
        greatest(col("ka"), col("kb")).as("d2"),
        (matchScore >= MATCH_THRESHOLD).as("m"),
        (col("ba") === col("bb") || col("_nk")).as("bf"))
      // rows that are neither matched nor block-covered cannot move
      // any of the three counts (a pair whose EVERY row is dropped
      // has max(m) = max(bf) = false and contributes nothing): drop
      // them BEFORE the pair shuffle, which bounds the exchange to
      // truth ∪ candidates instead of the full recovered enumeration
      .filter(col("m") || col("bf"))
      .groupBy(col("d1"), col("d2"))
      .agg(max(col("m")).as("m"), max(col("bf")).as("bf"))
    per.agg(
        sum(when(col("m"), 1L).otherwise(0L)).cast("long").as("truth_pairs"),
        sum(when(col("m") && col("bf"), 1L).otherwise(0L)).cast("long").as("blocked_pairs"),
        sum(when(col("bf"), 1L).otherwise(0L)).cast("long").as("cand_pairs"))
      .select(col("truth_pairs"), col("blocked_pairs"),
        (col("truth_pairs") - col("blocked_pairs")).as("missed_pairs"),
        // empty truth ⇒ null recall (the ANSI-vs-DuckDB ÷0 rule)
        when(col("truth_pairs") > 0,
          expr("blocked_pairs * 10000L div truth_pairs")).as("recall_bp"),
        col("cand_pairs"))
  }

  /** Entity labels for every record from a match-pair list:
    * connected components (min-key entity), singletons self-labeled,
    * canonical = the entity key itself, entity sizes attached.
    * Output: (p_partkey, entity, is_canonical, n_members).
    * Components run LARGE/SMALL-STAR (O(log n) rounds): round-12's
    * multi-pass blocking multiplied matches 25× and the merged
    * cross-brand entities have long chains — min-label propagation
    * paid diameter-many rounds (measured 18.6 s at sf0.1; LS/SS
    * 3.6 s, same labels — AnalyticsSpec pins the parity). */
  /** EXACT-DEDUP-FIRST ER — the 100× composition (round 15, closing
    * SCALE100_r14's "the FIRST move is q28 before ER" note): collapse
    * identical (name, brand, type, size) groups to one REPRESENTATIVE
    * (min key — q28's exact dedup as stage 0), run the full
    * match/resolve pipeline over representatives only, expand entity
    * labels back through group membership.
    *
    * EXACT by construction, not approximate: the match rule and every
    * blocking key read only (name, brand, type, size) — constant
    * within a group — so a member-level pair matches iff its rep pair
    * does; identical records always match each other (lev 0 + type =
    * + size = scores exactly MATCH_THRESHOLD), so a group is always a
    * clique inside one component; and entity = min p_partkey survives
    * because each rep IS its group's min. q206 gates the identity
    * (composed labels ≡ the direct-ER oracle, both scales).
    *
    * Scale shape: under mass replication (the SCALE100 corpus — R
    * copies of every record) the direct pipeline's candidate space
    * and match list grow R², while the representative space is
    * CONSTANT — the composed cost is one groupBy + the 1× pipeline +
    * two label-expansion joins, the only ER spelling that survives a
    * 100× duplicate-heavy decade. */
  def resolveDeduped(records: DataFrame): DataFrame = {
    val fields = Seq("p_name", "p_brand", "p_type", "p_size")
    // NULL-bearing records are MATCH-ISOLATED in the direct pipeline
    // (every blocked pass carries brand = or brand ≠ — NULL fails
    // both; and the score cannot reach MATCH_THRESHOLD = 4 = name(2)
    // + type(1) + size(1) with any of name/type/size null), so they
    // pass through as their own singleton entities. Grouping them
    // would merge identical null-brand records that direct ER keeps
    // apart — and a plain equi-join membership would DROP them
    // (NULL ≠ NULL): both r15 review findings.
    val clean = records.filter(fields.map(col(_).isNotNull).reduce(_ && _))
    val dirty = records.filter(fields.map(col(_).isNull).reduce(_ || _))
    val groups = clean.groupBy(fields.map(col): _*)
      .agg(min(col("p_partkey")).as("_rep"))
    val reps = groups.select(col("_rep").as("p_partkey"), col("p_brand"),
      col("p_name"), col("p_type"), col("p_size"))
    val comp = DedupOps.componentsLargeSmallStar(matchPairs(reps, reps))
      .select(col("doc_id").as("_rep"), col("component"))
    val labeled = clean.join(groups, fields) // group membership
      .join(comp, Seq("_rep"), "left")
      .select(col("p_partkey"),
        coalesce(col("component"), col("_rep")).as("entity"))
      .unionByName(dirty.select(col("p_partkey"),
        col("p_partkey").as("entity")))
    val sizes = labeled.groupBy(col("entity")).agg(count(lit(1)).as("n"))
    labeled.join(sizes, Seq("entity"))
      .select(col("p_partkey"), col("entity"),
        (col("entity") === col("p_partkey")).as("is_canonical"),
        col("n").cast("long").as("n_members"))
  }

  def resolve(records: DataFrame, pairs: DataFrame): DataFrame = {
    val comp = DedupOps.componentsLargeSmallStar(pairs)
      .select(col("doc_id").as("p_partkey"), col("component"))
    val sizes = comp.groupBy(col("component")).agg(count(lit(1)).as("n"))
    records.select(col("p_partkey"))
      .join(comp, Seq("p_partkey"), "left")
      .withColumn("entity", coalesce(col("component"), col("p_partkey")))
      .join(sizes.withColumnRenamed("component", "entity"), Seq("entity"), "left")
      .select(col("p_partkey"), col("entity"),
        (col("entity") === col("p_partkey")).as("is_canonical"),
        coalesce(col("n"), lit(1L)).cast("long").as("n_members"))
  }
}
