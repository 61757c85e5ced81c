package graft.sinks

import org.apache.spark.sql.DataFrame
import graft.ops.{Dedup, Normalize}

/** K2: the RDS insert stage (review-crawler/restaurant_save.py:77-130)
  * as one set-oriented write: anti-join the incoming batch against
  * the current table on the composite business key, apply the sink's
  * NOT-NULL defaults, then bulk-append — replacing the reference's
  * O(N) per-row SELECT-then-INSERT with two scans and a join.
  *
  * The physical write is injected so the same logic serves
  * `df.write.jdbc(...)`, a lakehouse MERGE, or a test collector (no
  * database ships in this container; see PipelineSpec).
  */
object JdbcSink {

  /** Rows of `incoming` not already present in `existing` by `keys`,
    * with sink defaults applied — ready for bulk append. */
  def upsertBatch(incoming: DataFrame, existing: DataFrame,
                  keys: Seq[String] = Seq("name", "address")): DataFrame =
    Normalize.fillSinkDefaults(
      Dedup.antiJoinComposite(incoming, existing, keys))

  /** Full stage with injected writer (e.g.
    * `_.write.mode("append").jdbc(url, table, props)`). */
  def write(incoming: DataFrame, existing: DataFrame, keys: Seq[String])
           (writer: DataFrame => Unit): Unit =
    writer(upsertBatch(incoming, existing, keys))
}
