package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.DatasetBridge
import org.apache.spark.sql.types.LongType

/** Distributed running prefix sum — the scale-safe replacement for a
  * global-order window cumsum (`sum(v) OVER (ORDER BY k)`), which
  * Spark plans as a SINGLE-partition WindowExec: the whole input moves
  * to one task, the exact anti-pattern at 100 TB.
  *
  * Two passes over ONE shuffle:
  *   1. range-repartition by the order column and sort within
  *      partitions (the only shuffle), then compute each partition's
  *      total — a tiny driver-side collect of numPartitions longs;
  *   2. broadcast the exclusive running offsets and stream each
  *      partition once more, seeding its local cumsum with its offset.
  * Both passes share the same RDD lineage, so the shuffle files from
  * pass 1 are reused (the second job skips the map stage) — the input
  * is scanned and shuffled exactly once overall.
  *
  * Determinism: range partition i holds strictly lower keys than
  * i+1 and rows are sorted within each partition, so the running sum
  * is the same as the single-partition window's for any partition
  * count (requires a total order — pass a unique `orderCol`).
  *
  * DETERMINISTIC-INPUT CONTRACT (same one `Dedup.bloomAntiJoinKeys`
  * documents): pass-1 offsets are collected from one execution of the
  * shuffle. If executor loss discards those shuffle files AND the
  * upstream plan is non-deterministic (sample, shuffle-order-dependent
  * row_number, rand), the pass-2 recompute can shuffle DIFFERENT rows
  * into a partition than the ones its collected offset summed — a
  * silently wrong cumsum. Feed deterministic input, or materialize
  * first (`df.localCheckpoint()`) to pin the lineage.
  */
object PrefixSum {

  /** Append `cumCol` = running sum of `valueCol` (LONG, nulls count
    * as 0) in `orderCol` order. Output partitioning: range-partitioned
    * and sorted by `orderCol` — downstream per-shard consumers read
    * contiguous key ranges without another exchange. */
  def withRunningSum(df: DataFrame, orderCol: String, valueCol: String,
                     cumCol: String, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = df.repartitionByRange(n, col(orderCol)).sortWithinPartitions(orderCol)
    val schema = parted.schema
    require(schema(valueCol).dataType == LongType, s"$valueCol must be LONG")
    val vIdx = schema.fieldIndex(valueCol)
    val rdd = parted.queryExecution.toRdd
    // pass 1: per-partition totals (numPartitions rows to the driver)
    val partSums = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => if (!r.isNullAt(vIdx)) s += r.getLong(vIdx))
      Iterator.single((pid, s))
    }.collect()
    val offsets = new Array[Long](rdd.getNumPartitions + 1)
    partSums.foreach { case (pid, s) => offsets(pid + 1) = s }
    (1 until offsets.length).foreach(i => offsets(i) += offsets(i - 1))
    val bcOff = spark.sparkContext.broadcast(offsets)
    val outSchema = schema.add(cumCol, LongType, nullable = false)
    // pass 2: local cumsum seeded by the partition's running offset
    val outRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      val proj = UnsafeProjection.create(outSchema)
      val joined = new JoinedRow
      val cumRow = new GenericInternalRow(1)
      var cum = bcOff.value(pid)
      it.map { r =>
        cum += (if (r.isNullAt(vIdx)) 0L else r.getLong(vIdx))
        cumRow.update(0, cum)
        // proj reuses its buffer — copy so downstream buffering is safe
        proj(joined(r, cumRow)).copy(): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    DatasetBridge.ofInternalRows(spark, outRdd, outSchema)
  }
}
