package graft.ops

import org.apache.spark.sql.DataFrame

/** Union/merge semantics (SURVEY.md §2.4 U1/U2).
  *
  * The reference appends by read-whole-file + list-concat + rewrite
  * (restaurant-crawler/storage_manager.py:28-45) — a lost-update race
  * under concurrent writers and O(file) per append. The engine's
  * contract is: union-by-name (schema-aligned), then key-dedup, and
  * physical append is the writer's `mode("append")` on a partitioned
  * directory — no read-modify-write anywhere.
  *
  * Property (tested): mergeByKey is idempotent — merging the same
  * fresh batch twice equals merging it once.
  */
object Merge {

  /** U1: union-all of partition results; schema aligned by name,
    * missing columns null-filled (tolerates the reference's 8- vs
    * 9-field crawler variants). */
  def unionAll(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_.unionByName(_, allowMissingColumns = true))

  /** U2: append-merge with first-writer-wins key dedup. `existing`
    * rows win ties because they are unioned first and dropDuplicates
    * keeps the first row per key under a stable plan. For a real
    * lakehouse sink this becomes MERGE INTO; semantics are identical. */
  def mergeByKey(existing: DataFrame, fresh: DataFrame, keys: Seq[String]): DataFrame =
    existing.unionByName(fresh, allowMissingColumns = true).dropDuplicates(keys)
}
