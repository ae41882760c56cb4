package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file clustering for multi-column data skipping.
  *
  * Partition pruning handles ONE leading dimension; at 100 TB you also
  * want scans filtered on a second or third column to skip most files.
  * Sorting the layout by interleaved bits of several columns' rank
  * buckets keeps rows close in EVERY clustered dimension close on disk,
  * so parquet row-group min/max statistics prune files for a predicate
  * on ANY of the clustered columns — the same trick lakehouse table
  * formats expose as `OPTIMIZE ... ZORDER BY`.
  *
  * Implementation is pure DataFrame ops: per-column equi-width buckets
  * over the observed min/max (one tiny agg to fetch bounds), bit
  * interleave via shifts/ors, then a range repartition + within-partition
  * sort on the z-value so each output file covers a compact Morton range.
  */
object ZOrder {

  private val Bits = 16 // per-column bucket bits; 2 cols => 32-bit z-value

  /** interleave the low `Bits` bits of a and b (a gets even positions) */
  private def interleave(a: Column, b: Column): Column =
    (0 until Bits).map { i =>
      val bit = lit(1L << i)
      (shiftleft(a.bitwiseAND(bit), i) // bit i -> position 2i
        .bitwiseOR(shiftleft(b.bitwiseAND(bit), i + 1))) // bit i -> 2i+1
    }.reduce((x, y) => x.bitwiseOR(y))

  /** z-value column for two numeric columns, bucketed equi-width over
    * their observed [min, max] */
  def zValue(df: DataFrame, c1: String, c2: String): Column = {
    val b = df.agg(
      min(col(c1)).cast("double"), max(col(c1)).cast("double"),
      min(col(c2)).cast("double"), max(col(c2)).cast("double")).collect()(0)
    def bucket(c: String, lo: Double, hi: Double): Column = {
      val span = math.max(hi - lo, Double.MinPositiveValue)
      least(lit((1 << Bits) - 1), floor(
        (col(c).cast("double") - lit(lo)) / lit(span) * ((1 << Bits) - 1)))
        .cast("long")
    }
    interleave(bucket(c1, b.getDouble(0), b.getDouble(1)),
      bucket(c2, b.getDouble(2), b.getDouble(3)))
  }

  /** Rewrite `df` as `numFiles` parquet files clustered on the Morton
    * order of (c1, c2). Range partitioning gives each file a compact
    * z-range; the within-partition sort tightens per-row-group min/max
    * stats inside each file. */
  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
      numFiles: Int): Unit =
    df.withColumn("__z", zValue(df, c1, c2))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
