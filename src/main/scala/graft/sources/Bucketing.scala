package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout: shuffle-free co-located joins and aggregations.
  *
  * The reference co-locates chunks of a dataset by sample index so its
  * executor never redistributes rows to join tensor columns
  * (`cpp/heimdall/column_view.hpp:194` fetches aligned chunks). The Spark
  * analog for *relational* co-location is bucketing: both join sides are
  * written pre-hash-partitioned by the join key into the same number of
  * buckets, so `a JOIN b ON key` plans as a zipped per-bucket
  * SortMergeJoin with NO Exchange on either side.
  *
  * At 100 TB this is the difference between a join that moves both
  * tables across the network every query and one that only streams
  * already-aligned files: bucket layout is paid ONCE at ingest (a batch
  * write, like index builds), and every subsequent join/groupBy on the
  * bucket key is shuffle-free. AQE and broadcast thresholds still apply
  * to the non-bucketed side of a mixed join.
  *
  * Buckets also bound task input size deterministically (`numBuckets` ≈
  * table size / healthy-partition size), which is the same spill-control
  * lever `spark.sql.files.maxPartitionBytes` gives a raw scan.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. Sorting within
    * buckets means the per-bucket join needs no extra sort at read time.
    * The table lands in the session's warehouse dir; `numBuckets` should
    * divide total size into healthy (100-500 MB) per-bucket files at
    * the target scale. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, mode: String = "overwrite"): Unit =
    df.write
      .mode(mode)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table) // managed: lives under spark.sql.warehouse.dir

  /** Open a bucketed table (bucket metadata comes from the catalog, so
    * joins/aggregations on the bucket column skip their Exchange). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** True when `plan` of a query over bucketed inputs contains no
    * shuffle — the co-location check used by the spec and worth asserting
    * in any pipeline that relies on bucket alignment. */
  def isShuffleFree(df: DataFrame): Boolean = {
    val physical = df.queryExecution.executedPlan.toString
    !physical.contains("Exchange")
  }
}
