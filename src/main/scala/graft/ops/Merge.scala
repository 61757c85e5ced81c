package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, lit, row_number}

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

  /** U2: append-merge with first-writer-wins key dedup. Precedence is
    * explicit: each side is tagged with a priority (existing=0,
    * fresh=1) and the min-priority row per key survives via a
    * row_number window — dropDuplicates' "first row wins" is
    * plan-dependent (shuffle/AQE ordering) and cannot be relied on
    * across a cluster. For a real lakehouse sink this becomes MERGE
    * INTO; semantics are identical. */
  def mergeByKey(existing: DataFrame, fresh: DataFrame, keys: Seq[String]): DataFrame = {
    val prio = "__graft_prio"
    val rn = "__graft_rn"
    val unioned = existing.withColumn(prio, lit(0))
      .unionByName(fresh.withColumn(prio, lit(1)), allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(prio))
    unioned.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(prio, rn)
  }
}
