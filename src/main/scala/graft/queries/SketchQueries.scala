package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sketch/approximate aggregations — the constant-memory per-group
  * path for 100 TB cardinalities and quantiles. No DuckDB oracle:
  * sketch internals are engine-specific (driver records the weaker
  * rows-only check); AnalyticsSketchSpec bounds them against exact
  * answers instead.
  */
object SketchQueries {

  val queries: Seq[Q] = Seq(

    // HyperLogLog++ distinct users per event type: shuffles one sketch
    // per (group, partition) instead of every distinct value.
    Q.noOracle("q37_approx_distinct") { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },

    // GK-sketch quantiles of event value per type. Scalar columns (not an
    // array) so the driver's rows-only comparator can sort the frame.
    Q.noOracle("q38_approx_quantiles") { (s, d) =>
      val q = percentile_approx(col("value"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(1000))
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(q.as("qs"))
        .select(col("event_type"),
          col("qs").getItem(0).as("p50"),
          col("qs").getItem(1).as("p90"),
          col("qs").getItem(2).as("p99"))
        .orderBy(col("event_type"))
    },

    // ---------------------------------------------------------------- q67
    // Count-Min-Sketch-prefiltered heavy hitters (custom typed
    // Aggregator — functions/CmsAgg). The sketch prunes candidates
    // with zero false negatives, exact counts decide — so the output
    // is exact and the oracle is a plain GROUP BY ... HAVING over the
    // same relative threshold (1% of occurrences).
    Q("q67_heavy_hitters",
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |SELECT w, CAST(count(*) AS BIGINT) AS n FROM t
        |GROUP BY w
        |HAVING count(*) >= (SELECT count(*) // 100 FROM t)
        |ORDER BY w""".stripMargin) { (s, d) =>
      import s.implicits._
      val words = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w")).as[String]
      val threshold = words.count() / 100
      graft.functions.CmsAgg.heavyHitters(words, threshold)
        .orderBy("w")
    }
  )
}
