package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan assertions: the properties that decide whether a
  * query survives a 100x scale-up. Each check reads the executed plan
  * the optimizer actually chose — not what we hope it chose.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf("sf0.001"))
    df.queryExecution.executedPlan.toString
  }

  test("q02: filters and projection are pushed into the parquet scan") {
    val p = plan("q02_filter_pushdown")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("l_shipdate"), p)
    // pruned read schema: only the needed columns reach the reader
    assert(!p.contains("l_returnflag"), "scan must not read unused columns")
  }

  test("q116: count/min/max aggregate is pushed into the jsonl scan") {
    val p = graft.queries.ExtQueries.jsonlAggFrame(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedAggregates: [count(*), min(doc_id), max(doc_id)]"), p)
    assert(p.contains("PushedGroupBy: [lang]"), p)
  }

  test("q121: ORDER BY + LIMIT is pushed into the jsonl scan as a per-file top-N") {
    val p = graft.queries.ExtQueries.jsonlTopNFrame(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(p.contains(
      "PushedTopN: ORDER BY [lang DESC NULLS LAST, doc_id ASC NULLS FIRST] LIMIT 20"), p)
    // partial push: Spark must still plan the global TakeOrdered merge
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("plain LIMIT is pushed into the jsonl scan; a filter in between blocks it") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType)))
    val src = graft.queries.ExtQueries.jsonlTopNSrcDir(spark, sf("sf0.001"))
    val limited = spark.read.format("graft.sources.v2.JsonLinesSource")
      .schema(schema).load(src).limit(7)
    assert(limited.queryExecution.executedPlan.toString.contains("PushedLimit: 7"),
      limited.queryExecution.executedPlan.toString)
    assert(limited.count() == 7)
    // residual-reported filters sit between limit and scan → no push
    val filtered = spark.read.format("graft.sources.v2.JsonLinesSource")
      .schema(schema).load(src)
      .filter(org.apache.spark.sql.functions.col("doc_id") > 10).limit(7)
    assert(!filtered.queryExecution.executedPlan.toString.contains("PushedLimit"),
      filtered.queryExecution.executedPlan.toString)
    assert(filtered.count() == 7)
  }

  test("q03: small dim side is broadcast (no shuffle of lineitem)") {
    val p = plan("q03_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q05: anti-join executes as broadcast hash join") {
    val p = plan("q05_anti_join")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
  }

  test("q04: star joins broadcast every dimension table") {
    val p = plan("q04_nation_revenue")
    // customer/nation/region all small → 3+ broadcast joins
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q34: query side broadcasts; candidates stream (nested loop only vs k rows)") {
    val p = plan("q34_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q31: LSH pipeline contains no cartesian product anywhere") {
    val p = plan("q31_minhash_lsh_pairs")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q01: aggregation is two-phase (partial before shuffle)") {
    val p = plan("q01_pricing_summary")
    // partial HashAggregate appears below the exchange
    assert(p.contains("HashAggregate"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q11: top-k runs as TakeOrderedAndProject, not global sort") {
    val p = plan("q11_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q61: range join binned into equi-joins — no nested loop") {
    val p = plan("q61_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q65: dictionary pairs are length-band blocked — no nested loop at all") {
    val p = plan("q65_fuzzy_match")
    // the dictionary pair space equi-joins on the length band, so even
    // the name-dictionary product is bounded — zero nested loops
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("q60: token packing plans no window at all (two-pass cumsum)") {
    val p = plan("q60_token_packing")
    // the old spelling was sum() OVER (ORDER BY ...) — a single-
    // partition WindowExec that moves the whole corpus to one task
    assert(!p.contains("Window"), p)
  }

  test("q141 machinery: rank selection plans no partition-less Window") {
    // the skew audit runs ON pathological corpora — its own p50/p99
    // probes must not carry a one-task global sort. Every Window in
    // the histogram-narrowing plan partitions on (group[, bin]);
    // assert at the logical level (stable under AQE re-planning).
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val counts = graft.sources.Tables.lineitem(spark, sf("sf0.001"))
      .groupBy(col("l_suppkey").as("k")).agg(count(lit(1)).as("cnt"))
      .withColumn("_g", lit(0))
    val df = graft.ops.DistributedSelect.groupRankSelect(
      counts, "_g", "cnt", "k",
      Seq("p50" -> (_ => lit(50L)), "p99" -> (_ => lit(99L))))
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "expected the narrowing Windows in the plan")
    // The DATA-sized window (row_number over residual rows) must
    // partition — here on the histogram bin (the constant _g folds
    // away). The bin-cumsum window is allowed to fold to
    // partition-less: its input is the per-bin Aggregate, ≤ nBins+4
    // rows by construction, never the corpus.
    val rowNumWins = wins.filter(_.windowExpressions.exists(
      _.toString.contains("row_number")))
    assert(rowNumWins.nonEmpty, df.queryExecution.optimizedPlan.toString)
    assert(rowNumWins.forall(_.partitionSpec.nonEmpty),
      df.queryExecution.optimizedPlan.toString)
    val unpartitioned = wins.filterNot(rowNumWins.contains)
      .filter(_.partitionSpec.isEmpty)
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    assert(unpartitioned.forall(_.child.collectFirst {
      case a: Aggregate if a.groupingExpressions.exists(_.toString.contains("bin")) => a
    }.nonEmpty), df.queryExecution.optimizedPlan.toString)
  }

  test("q68: benchmark grams broadcast; corpus grams never cross-join") {
    val p = plan("q68_decontamination")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q84: per-source rollup plans no Expand (two-stage distinct)") {
    assert(!plan("q84_source_quality").contains("Expand"),
      "distinct-lang counting must pre-aggregate, not Expand the corpus")
  }

  test("q85: pair top-k runs as TakeOrderedAndProject") {
    assert(plan("q85_bpe_pair_counts").contains("TakeOrderedAndProject"))
  }

  test("q100/q101: span dedup plans no Expand, and no span text in any exchange") {
    Seq("q100_span_dup_profile", "q101_repeated_spans").foreach { name =>
      val p = plan(name)
      assert(!p.contains("Expand"),
        s"$name: distinct-doc counting must be two-stage, not Expand")
      // every Exchange row carries the 16-hex hash `h`, never the span
      // string `s` (SpanExplode's output column)
      assert(!p.linesIterator.exists(l => l.contains("Exchange") && l.contains(" s#")),
        s"$name shuffles raw span text")
    }
  }

  test("q81: inlined-quantizer assignment plans no join or window below the probe") {
    val p = plan("q81_ann_ivf_trained")
    // one Window remains (the final top-k rank); the old spelling had
    // three more plus per-assignment exchanges of the k-fold corpus
    assert("Window \\[row_number".r.findAllIn(p).size == 1, p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q90: correlation sums aggregate two-phase (partial before shuffle)") {
    val p = plan("q90_exact_corr")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q88: recursive-loop anchor projects distinct attributes") {
    // The recursive anchor must project DISTINCT attributes: a bare
    // `SELECT c_custkey, c_custkey, 0` collapses both slots to one
    // exprId under optimization, and every UnionLoop iteration the
    // engine materializes as a LogicalRDD then logs `WARN LogicalRDD:
    // output columns are expected to the same...` — Spark telling us
    // the loop plan's logical and optimized outputs don't line up.
    // Assert the invariant LogicalRDD checks, at its root: every
    // UnionLoop's anchor (and recursion step) output is duplicate-free
    // after optimization.
    import org.apache.spark.sql.catalyst.plans.logical.UnionLoop
    val df = SparkEntry.queries("q88_sql_recursive_chain")(spark, sf("sf0.001"))
    val loops = df.queryExecution.optimizedPlan.collect { case u: UnionLoop => u }
    assert(loops.nonEmpty, "q88 must plan a recursive UnionLoop")
    loops.foreach { u =>
      for (side <- Seq(u.anchor, u.recursion)) {
        val ids = side.output.map(_.exprId)
        assert(ids.distinct.size == ids.size,
          s"duplicate attributes in UnionLoop side: ${side.output.mkString(", ")}")
      }
    }
  }

  test("engine-wide: no query plans a nested loop except documented baselines") {
    // queries whose nested loop is the point (bounded by construction):
    //  q34: k query rows broadcast vs candidate stream (exact top-k)
    //  q45/q80/q81: candidates x 16 centroids (IVF cell assignment /
    //               k-means training assignment — same bounded shape)
    //  q46: blocked all-pairs — THE deliberate quadratic baseline
    // (q65's dictionary product is now length-band blocked: no longer
    // exempt)
    //  q98: recall audit — composes q34's exact scan and q81's trained
    //       IVF, so it inherits exactly their bounded shapes
    //  q135/q136: PQ ADC — q34's bounded broadcast shape over 8-byte
    //       codes instead of vectors (the point of the operator)
    //  q145: PQ recall audit — composes q34's exact arm (the truth
    //       side) with q136's retrieve, so it inherits q34's shape
    //  q148: hybrid RRF — its dense arm is q34's exact scan
    //  q161: hard-negative mining — q34's bounded anchor broadcast
    //        with the source/ceiling filters riding the same loop
    //  q164: KMV pair stage — scope×scope pair enumeration over the
    //        MODEL-SIZED scope list (|sources| rows broadcast; the
    //        |scopes|² pairs are the operator's OUTPUT, so no join
    //        strategy changes the complexity; corpus never enters)
    val allowed = Set("q34_cosine_topk", "q45_ann_ivf_topk",
      "q80_kmeans_train", "q81_ann_ivf_trained", "q46_embedding_neardup",
      "q98_ann_recall", "q135_ann_pq_adc", "q136_ann_pq_rerank",
      "q145_pq_recall", "q148_hybrid_rrf", "q161_hard_negatives",
      "q164_kmv_set_ops")
    val offenders = SparkEntry.allQueries
      .filterNot(q => allowed.contains(q.name))
      .flatMap { q =>
        val p = SparkEntry.queries(q.name)(spark, sf("sf0.001"))
          .queryExecution.executedPlan.toString
        if (p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"))
          Some(q.name)
        else None
      }
    assert(offenders.isEmpty, s"unbounded-join plans: ${offenders.mkString(", ")}")
  }

  test("q118: the member-cap window exchange is REUSED across the self-join (cold executed plan)") {
    // BASELINE.md's cost model assumes the shuffle feeding the
    // member-cap Window is paid once. On the cold path — the one a
    // 100 TB scan takes — AQE materializes that as a ReusedExchange
    // at runtime; this pins the EXECUTED plan so a future change
    // that breaks canonical-plan matching (and silently doubles
    // q118's most expensive stage) fails here. Known, documented
    // exception (DedupOps.jaccardPairsMemberCapped scaladoc): above
    // a PERSISTED shingle input, per-instance TableCacheQueryStages
    // break the match and the exchange runs twice — both
    // materialization rewrites measured worse (round 9), so the
    // cached gate path accepts the recompute deliberately.
    graft.queries.DedupQueries.releaseCaches(spark)
    val sh = graft.analytics.TextAnalysis.shingleSet(
      graft.sources.Tables.documents(spark, sf("sf0.001")), 3)
    val cold = graft.analytics.DedupOps.jaccardPairsMemberCapped(sh, 0.6, 40, 2)
    cold.collect() // AQE finalizes stage reuse only at execution
    val coldPlan = cold.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head // final adaptive plan only
    assert(coldPlan.contains("ReusedExchange"),
      s"member-cap window exchange must be reused on the cold path:\n$coldPlan")
  }

  test("q131 fuse: bucket cap plans two-phase WindowGroupLimit (partial before the exchange)") {
    // The fuse's scale claim is that a saturated bucket never ships
    // its clique: row_number <= M must plan WindowGroupLimit in
    // Partial mode BELOW the (k, band) exchange, so each map task
    // forwards at most M rows per bucket. A Spark upgrade or filter
    // rewrite that degrades this to a plain Window + Filter would
    // silently reintroduce the clique shuffle this operator exists
    // to avoid.
    val sigs = graft.multimodal.Multimodal.perceptualHashes(
      graft.multimodal.Multimodal.syntheticPngClasses(
        graft.sources.Tables.documents(spark, sf("sf0.001"))))
    val p = graft.multimodal.Multimodal
      .phashNearDupPairsCapped(sigs, 6, 2, includeOverflow = false)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("Partial"), s"map-side partial limit missing:\n$p")
  }

  test("q156: DSIR score pass is broadcast-joined and top-k is TakeOrdered, no window") {
    val p = plan("q156_dsir_selection")
    assert(p.contains("BroadcastHashJoin"), s"weight table must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-100 must not global-sort:\n$p")
    assert(!p.contains("Window"), s"no window anywhere in DSIR:\n$p")
  }

  test("q157: subsample manifests never plan a join (tier explode, not threshold join)") {
    val p = plan("q157_scaling_subsamples")
    assert(!p.contains("Join"), s"threshold fan-out must be an equi-explode:\n$p")
    assert(p.contains("Generate"), p)
  }

  test("q158: corpus grams are Bloom-pruned map-side before the bench join") {
    val p = plan("q158_contamination_spans")
    assert(p.contains("might_contain("), s"map-side Bloom probe missing:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q159: canonical-span election is a partial agg, not a window") {
    val p = plan("q159_span_dedup_rewrite")
    // the only acceptable window-free election: min(struct) partial agg
    assert(!p.contains("Window ["), s"canonical election must not sort per span:\n$p")
    assert(p.contains("partial_min"), s"map-side canonical partials missing:\n$p")
  }

  test("q186: URL curation plans LINEAR — no joins, three exchanges end to end") {
    val p = plan("q186_url_curation")
    // the groupBy+join-back spelling duplicated the deep
    // canonicalization tree across four plan BRANCHES (4x wall,
    // BASELINE session 2) — the verdict flags are windows, so the
    // plan must carry ZERO joins and exactly the linear pipeline's
    // exchanges: hash(canon) for the keeper window, hash(domain,
    // is_keeper) for the cap rank, range for the gate's final sort.
    // (Textual copies of the regex tree WITHIN one Project are fine —
    // whole-stage codegen's subexpression elimination evaluates them
    // once per row; branch duplication was the real cost.)
    assert(!p.contains("Join"), s"URL curation must not join back:\n$p")
    assert(p.contains("Window"), p)
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 3, s"linear plan needs <= 3 exchanges, got $exchanges:\n$p")
  }
}
