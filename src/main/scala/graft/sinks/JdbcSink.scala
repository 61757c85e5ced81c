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

  /** The `createTableColumnTypes` pin for the upsert's KEY columns —
    * `"name VARCHAR(64), address VARCHAR(128)"` style. Dialect
    * rationale (the dialect-matrix spec pins the underlying
    * mappings): Spark's default string mapping is a large-object
    * type on BOTH databases the reference pipeline touches — Derby
    * gets CLOB, which cannot be compared against literals (the
    * anti-join's pushed key filters fail outright, JdbcSpec), and
    * MySQL (the reference RDS, review-crawler/restaurant_save.py:15-23)
    * gets TEXT, which cannot carry a PRIMARY KEY or plain index
    * without a prefix length — so the existence probe the sink
    * replaces would degrade to full scans. VARCHAR(n) is the one
    * spelling both dialects index and compare; apply this to every
    * upsert key on table creation. */
  def keyColumnTypePins(keys: Seq[(String, Int)]): String =
    keys.map { case (c, n) => s"$c VARCHAR($n)" }.mkString(", ")
}
