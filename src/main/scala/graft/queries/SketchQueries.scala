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

    // GK-sketch quantiles of event value per type.
    Q.noOracle("q38_approx_quantiles") { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(percentile_approx(col("value"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(1000)).as("p50_p90_p99"))
        .orderBy(col("event_type"))
    }
  )
}
