package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed 0-based row numbering (TQL `ROW_NUMBER()` — zero-based row
  * offset in dataset order, `docs/docs/advanced/tql.md:416-421`).
  *
  * The naive lowering `row_number().over(Window.orderBy(...))` funnels the
  * entire dataset through ONE task (unpartitioned window). This is the
  * classic zipWithIndex plan instead, kept in DataFrame land:
  *
  *   1. stamp each row with its partition id and a per-partition
  *      monotonic id (both computed map-side, no shuffle)
  *   2. aggregate per-partition counts — numPartitions rows, tiny —
  *      and turn them into cumulative start offsets
  *   3. broadcast-join the offsets back and add the within-partition
  *      rank (a window PARTITIONED by partition id — parallel)
  *
  * Global order = (partition_id, intra-partition position), which is
  * exactly `monotonically_increasing_id` order: scan order for a fresh
  * read, sorted order after an `orderBy` (range partitions are emitted
  * in key order). Everything is lazy — no driver-side action.
  */
object RowNumber {

  def withRowNumber(df: DataFrame, outCol: String): DataFrame = {
    val pid = s"__${outCol}_pid"
    val mid = s"__${outCol}_mid"
    val off = s"__${outCol}_off"
    val stamped = df
      .withColumn(pid, spark_partition_id())
      .withColumn(mid, monotonically_increasing_id())
    // per-partition counts -> cumulative offsets; the global prefix-sum
    // window runs over numPartitions rows, not the data
    // (BoundedWindow-enforced)
    val offsets = BoundedWindow.over(
      stamped.groupBy(col(pid)).agg(count(lit(1)).as("__cnt")), 1L << 21) {
        (d, w) =>
          d.withColumn(off,
            coalesce(sum(col("__cnt")).over(w.orderBy(col(pid))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      }
      .select(col(pid), col(off))
    val w = Window.partitionBy(col(pid)).orderBy(col(mid))
    stamped.join(broadcast(offsets), pid)
      .withColumn(outCol, col(off) + row_number().over(w) - 1)
      .drop(pid, mid, off)
  }
}
