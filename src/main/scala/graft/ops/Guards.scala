package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-plan size guards for the deliberate quadratic baselines.
  *
  * An eager `require(df.agg(...).head...)` guard costs a separate
  * job — the input is scanned once for the check and again for the
  * query. The lazy spelling here keeps the guard INSIDE the plan:
  * the size aggregate becomes a 1-row frame whose only column — the
  * join key — is `when(measure > cap, raise_error(...)).otherwise(1)`.
  * The caller broadcast-hash-joins that row on the constant key under
  * the build side of the join it bounds; the broadcast exchange
  * executes before the stage that streams against it, so the check
  * still fires before any quadratic row materializes, but it now
  * belongs to the same query execution (one entry in the SQL tab, no
  * extra pre-job).
  *
  * The guard key cannot be pruned away: it IS the equi-join key, so
  * column pruning must keep it, and `raise_error` over a non-foldable
  * aggregate never constant-folds.
  */
object Guards {

  /** 1-row guard frame: column `_g` = 1, or raises
    * `prefix + <measure> + suffix` when `measure` exceeds `cap`.
    * `sized` must be a 1-row aggregate containing `measure`. */
  def lazyGuard(sized: DataFrame, measure: Column, cap: Long,
                prefix: String, suffix: String): DataFrame =
    sized.select(
      when(measure > cap,
        raise_error(concat(lit(prefix), measure.cast("string"), lit(suffix))))
        .otherwise(lit(1)).cast("int").as("_g"))

  /** Hash-join `guard` under `df` on a constant-1 key. The key is
    * spelled non-foldably — pmod(id, 1) + 1, with `id` any non-null
    * numeric column of `df` — because a literal key constant-folds
    * OUT of the join condition and Catalyst then plans a
    * BroadcastNestedLoopJoin (one row, harmless, but it breaks the
    * engine-wide no-nested-loop invariant and the codegen span). */
  def gate(df: DataFrame, id: Column, guard: DataFrame): DataFrame =
    df.withColumn("_g", (pmod(id, lit(1L)) + lit(1L)).cast("int"))
      .join(broadcast(guard), Seq("_g")).drop("_g")
}
