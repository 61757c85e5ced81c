package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Bounds for the sketch queries (no SQL oracle — accuracy is checked
  * against the exact computation instead). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("q37 emits exact distinct counts and an in-bound HLL flag") {
    val events = Tables.events(spark, sf("sf0.01"))
    val exact = events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact"))
    val got = SparkEntry.queries("q37_approx_distinct")(spark, sf("sf0.01"))
    val joined = got.join(exact, "event_type")
      .select($"event_type", $"exact_users", $"exact", $"approx_ok").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"${r.getString(0)}: exact mismatch")
      assert(r.getBoolean(3), s"${r.getString(0)}: HLL estimate out of bound")
    }
  }

  test("CMS heavy hitters are exact; sketch prunes skewed tails") {
    import graft.functions.CmsAgg
    // 3 hot words + a long rare tail: CMS must keep all hot words
    // (no false negatives) and the exact-count stage kills the tail
    val hot = Seq.fill(500)("alpha") ++ Seq.fill(400)("beta") ++ Seq.fill(300)("gamma")
    val tail = (1 to 2000).map(i => s"rare$i")
    val words = spark.createDataset(scala.util.Random.shuffle(hot ++ tail))(
      org.apache.spark.sql.Encoders.STRING).repartition(8)
    val got = CmsAgg.heavyHitters(words, 300).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("alpha" -> 500L, "beta" -> 400L, "gamma" -> 300L))
  }

  test("q67 equals the naive exact groupBy on the corpus") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val words = docs.select(explode(split($"text", " ")).as("w"))
    val total = words.count()
    val naive = words.groupBy($"w").agg(count(lit(1)).as("n"))
      .filter($"n" >= total / 100).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("q67_heavy_hitters")(spark, sf("sf0.001"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == naive && got.nonEmpty)
  }

  test("q38 approx quantiles bracket exact medians") {
    val events = Tables.events(spark, sf("sf0.01"))
    val approx = SparkEntry.queries("q38_approx_quantiles")(spark, sf("sf0.01"))
      .select($"event_type", $"p50").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val bounds = events.groupBy($"event_type")
      .agg(min($"value").as("lo"), max($"value").as("hi"),
           Exacts.medianIsh($"value").as("mean")).collect()
    bounds.foreach { r =>
      val p50 = approx(r.getString(0))
      assert(p50 >= r.getDouble(1) && p50 <= r.getDouble(2))
    }
  }

  private object Exacts {
    def medianIsh(c: org.apache.spark.sql.Column) = avg(c)
  }

  test("q120 histogram sketch: merge of per-type sketch rows ≡ rescan; est within one bin above the order stat") {
    val W = 8.0
    val events = Tables.events(spark, sf("sf0.01")).filter($"value".isNotNull)
    val binned = events.select($"event_type",
      floor($"value" / W).cast("long").as("bin"))
    // per-type sketch rows, then the MERGE (sum of cnt by bin) …
    val merged = binned.groupBy($"event_type", $"bin")
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"bin").agg(sum($"cnt").as("cnt"))
    // … must equal the sketch built by a full rescan
    val rescan = binned.groupBy($"bin").agg(count(lit(1)).cast("long").as("cnt"))
    assert(merged.join(rescan, Seq("bin"))
      .filter(merged("cnt") =!= rescan("cnt")).isEmpty,
      "histogram merge must be lossless")
    assert(merged.count() == rescan.count())
    // the q120 output invariant on real data: 0 < est − x_(rank) ≤ W
    val out = graft.SparkEntry.queries("q120_quantile_sketch_rollup")(
      spark, sf("sf0.01")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      Seq(("est50", "x50"), ("est90", "x90"), ("est99", "x99")).foreach {
        case (e, x) =>
          val d = r.getAs[Double](e) - r.getAs[Double](x)
          assert(d > 0 && d <= W, s"$e violates the bin bound: d=$d row=$r")
      }
      Seq("ok50", "ok90", "ok99").foreach(c =>
        assert(r.getAs[Boolean](c), s"$c must be TRUE"))
    }
  }

  test("KMV sketch is the bottom-K distinct hashes; estimate exact below K") {
    import graft.analytics.Kmv
    val elems = (1 to 500).map(i => ("big", s"elem$i")) ++
      (1 to 40).map(i => ("small", s"other$i"))
    val df = elems.toDF("scope", "e")
    val sk = Kmv.sketch(df, $"scope", $"e")
    // bottom-K: the sketch rows for 'big' are exactly the 64 smallest hashes
    val expect = df.filter($"scope" === "big")
      .select(Kmv.hash48($"e").as("h")).distinct()
      .orderBy($"h").limit(Kmv.K).as[Long].collect().toSeq
    val got = sk.filter($"scope" === "big").orderBy($"rn")
      .select($"h").as[Long].collect().toSeq
    assert(got == expect, "sketch must hold exactly the K smallest hashes")
    val est = Kmv.estimate(sk).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(est("small") == 40L, "below K the sketch IS the set — estimate exact")
    // deterministic sha hashes: the 'big' estimate is a fixed value;
    // pin it to the 3-sigma band rather than the exact number so the
    // assertion documents the GUARANTEE, not one hash outcome
    assert(est("big") > 250 && est("big") < 1000,
      s"500-element estimate ${est("big")} outside the rsd band")
  }

  test("KMV min-K merge == sketch of the union; pair set-op estimates") {
    import graft.analytics.Kmv
    val a = (1 to 1000).map(i => ("a", s"x$i"))
    val b = (500 to 1500).map(i => ("b", s"x$i")) // 50% overlap with a
    val c = (1 to 1000).map(i => ("c", s"y$i")) // disjoint from a
    val u = (a ++ b).map { case (_, e) => ("u", e) } // a ∪ b as one scope
    val sk = Kmv.sketch((a ++ b ++ c ++ u).toDF("scope", "e"), $"scope", $"e")
    // mergeability: bottom-K of (K(a) ∪ K(b)) == K(a ∪ b) — the
    // associativity the 100 TB partial-aggregation story leans on
    val mergedAb = sk.filter($"scope".isin("a", "b"))
      .select($"h").distinct().orderBy($"h").limit(Kmv.K).as[Long].collect().toSeq
    val direct = sk.filter($"scope" === "u").orderBy($"rn")
      .select($"h").as[Long].collect().toSeq
    assert(mergedAb == direct, "min-K merge must equal the direct union sketch")
    // the operator spelling of the same identity (q174's contract):
    // merge(sketch(a)|scope→u, sketch(b)|scope→u) row-equals sketch(u)
    val opMerged = Kmv.merge(
        sk.filter($"scope" === "a").withColumn("scope", lit("u")),
        sk.filter($"scope" === "b").withColumn("scope", lit("u")))
      .orderBy($"rn").select($"h").as[Long].collect().toSeq
    assert(opMerged == direct, "Kmv.merge must equal the direct union sketch")
    val pe = Kmv.pairEstimates(sk.filter($"scope".isin("a", "b", "c")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val (unionAb, interAb) = pe(("a", "b"))
    val (unionAc, interAc) = pe(("a", "c"))
    // a∪b holds 1500 distinct, a∩b holds 501; a∩c is empty
    assert(unionAb > 750 && unionAb < 3000, s"est_union(a,b)=$unionAb")
    assert(interAb > 150 && interAb < 1100, s"est_inter(a,b)=$interAb")
    assert(interAc * 5 <= unionAc,
      s"disjoint scopes must estimate a near-empty intersection, got $interAc")
  }

  test("LogHist: factor-2 relative envelope on a 6-decade heavy tail; fixed-W cannot") {
    import graft.analytics.LogHist
    // adversarial heavy tail: median 3, p99 spans to 10⁶ — exactly the
    // domain where q120's fixed W=8 bin has unbounded relative error
    val vals = (Seq.fill(600)(3L) ++ Seq.fill(300)(40L) ++
      Seq.fill(90)(5000L) ++ Seq.fill(10)(1000000L))
      .zipWithIndex.map { case (v, i) => ("t", v, i) }
      .toDF("scope", "v", "i").select($"scope", $"v")
    val sk = LogHist.sketch(vals)
    val est = LogHist.quantiles(sk, Seq("e50" -> 0.5, "e90" -> 0.9, "e99" -> 0.99))
      .collect().head
    val (e50, e90, e99) = (est.getLong(2), est.getLong(3), est.getLong(4))
    // exact order stats: x50=3, x90=40, x99=5000
    assert(e50 >= 3 && e50 < 6, s"e50=$e50")
    assert(e90 >= 40 && e90 < 80, s"e90=$e90")
    assert(e99 >= 5000 && e99 < 10000, s"e99=$e99")
    // the fixed-W=8 estimate at the median answers 8 for x=3: rel
    // error 2.67x already, and it grows with W⁻¹·x⁻¹ shrinkage —
    // the log sketch is the scale-safe default for count-like columns
    assert(8.0 / 3.0 > 2.0)
  }

  test("LogHist: merge is lossless — merged sketch ≡ re-sketch of the union") {
    import graft.analytics.LogHist
    val a = (1L to 500L).map(v => ("u", v)).toDF("scope", "v")
    val b = (200L to 900L).map(v => ("u", v)).toDF("scope", "v")
    val merged = LogHist.merge(LogHist.sketch(a), LogHist.sketch(b))
      .orderBy("bin").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val direct = LogHist.sketch(a.unionByName(b))
      .orderBy("bin").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(merged == direct, "groupBy-sum merge must equal re-sketching the union")
    // and the bucket function is the exact bit length (no libm drift)
    val edges = Seq(1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L, (1L << 40) - 1, 1L << 40)
      .map(v => ("e", v)).toDF("scope", "v")
      .select(LogHist.bucket($"v")).as[Long].collect().toSeq
    assert(edges == Seq(1L, 2L, 2L, 3L, 3L, 4L, 10L, 11L, 40L, 41L))
  }

  test("LogHist: bin 63 (values ≥ 2^62) estimates Long.MaxValue, no ANSI overflow") {
    import graft.analytics.LogHist
    // round-12 advisor finding: shiftleft(1, 63) wraps to Long.MinValue
    // and the − 1 threw under ANSI — the top bucket's inclusive edge is
    // the literal Long.MaxValue
    val vals = Seq(("t", 1L), ("t", (1L << 62) + 5), ("t", Long.MaxValue))
      .toDF("scope", "v")
    val est = LogHist.quantiles(LogHist.sketch(vals), Seq("e99" -> 0.99))
      .collect().head
    assert(est.getLong(2) == Long.MaxValue, s"e99=${est.getLong(2)}")
    // envelope still holds: x99 = Long.MaxValue ≤ est < 2·x99 (trivially)
  }
}
