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
  *
  * Supports 2..6 clustered columns; per-column bucket bits shrink as
  * columns are added (min(16, 62/n)) so the z-value stays in a long —
  * the usual resolution/width trade every z-order implementation makes.
  */
object ZOrder {

  private def bitsPerCol(n: Int): Int = math.min(16, 62 / n)

  /** round-robin interleave of the low `bits` bits of each column:
    * bit i of column j lands at position i*n + j */
  private def interleave(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    (for { i <- 0 until bits; j <- cols.indices } yield {
      val bit = lit(1L << i)
      shiftleft(cols(j).bitwiseAND(bit), i * (n - 1) + j)
    }).reduce((x, y) => x.bitwiseOR(y))
  }

  /** z-value column for 2..6 numeric columns, each bucketed equi-width
    * over its observed [min, max] */
  def zValue(df: DataFrame, cs: Seq[String]): Column = {
    require(cs.size >= 2 && cs.size <= 6,
      s"z-order clusters 2..6 columns, got ${cs.size}")
    val bits = bitsPerCol(cs.size)
    val aggs = cs.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val bucketed = cs.zipWithIndex.map { case (c, i) =>
      val (lo, hi) = (bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1))
      val span = math.max(hi - lo, Double.MinPositiveValue)
      least(lit((1 << bits) - 1), floor(
        (col(c).cast("double") - lit(lo)) / lit(span) * ((1 << bits) - 1)))
        .cast("long")
    }
    interleave(bucketed, bits)
  }

  /** two-column form (kept for the common case) */
  def zValue(df: DataFrame, c1: String, c2: String): Column =
    zValue(df, Seq(c1, c2))

  /** Rewrite `df` as `numFiles` parquet files clustered on the Morton
    * order of `cs`. Range partitioning gives each file a compact
    * z-range; the within-partition sort tightens per-row-group min/max
    * stats inside each file. */
  def writeZOrdered(df: DataFrame, path: String, cs: Seq[String],
      numFiles: Int): Unit =
    df.withColumn("__z", zValue(df, cs))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
      numFiles: Int): Unit =
    writeZOrdered(df, path, Seq(c1, c2), numFiles)
}
