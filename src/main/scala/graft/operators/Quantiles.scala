package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT quantiles.
  *
  * Spark's exact `percentile()` aggregate carries a value→count map as
  * its state: every partial map funnels through ONE final reducer whose
  * merge is proportional to the global distinct-value count. On
  * high-cardinality doubles that single thread IS the query's wall
  * time — and at 100 TB it is a scale-killer (the map is the data).
  *
  * This operator computes the same interpolated quantiles
  * (`percentile`/`quantile_cont` semantics: linear interpolation at
  * 0-based rank q·(n−1)) with rank SELECTION instead of a value map —
  * the [[Drift.ksGaps]] machinery:
  *   1. ONE hash aggregate collapses ties: (value, count), fixed-width
  *   2. range-repartition by value (partition order == value order)
  *   3. per-partition totals → a numPartitions-row driver artifact,
  *      prefix-summed into start offsets (no global window anywhere)
  *   4. offsets broadcast back; each row knows its global 0-based rank
  *      range [start, start+count); the ≤ 2·|qs| rows covering the
  *      target ranks are collected and interpolated on the driver.
  * Every stage is parallel; nothing data-sized crosses one thread.
  *
  * The price is laziness: this runs jobs NOW and returns values (like
  * the literal-bound ANN centroids), where `percentile()` rides inside
  * a lazy plan. Consumers that need lazy 1-row frames keep
  * `percentile()`; consumers that broadcast the bounds anyway can bind
  * these as literals with identical results.
  */
object Quantiles {

  /** Exact interpolated quantiles of `valueCol` (NULLs excluded), same
    * arithmetic as `percentile(col, array(qs))`: value at fractional
    * 0-based rank r = q·(n−1) is lo + (r − ⌊r⌋)·(hi − lo). Throws on an
    * empty (all-NULL) input like percentile returns NULL — caller
    * checks. */
  def exactQuantiles(df: DataFrame, valueCol: String,
      qs: Seq[Double]): Array[Double] = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0,1]: $qs")
    val perV = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("__v"))
      .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
    val parts = perV.repartitionByRange(col("__v"))
      .sortWithinPartitions(col("__v"))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val totals = parts.groupBy(col("__pid")).agg(sum(col("__c")).as("__t"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val n = totals.map(_._2).sum
      require(n > 0, s"no non-NULL values in $valueCol")
      val offRows = {
        var o = 0L
        totals.map { case (pid, t) => val row = (pid, o); o += t; row }.toSeq
      }
      val ranks = qs.map(q => q * (n - 1))
      val targets = ranks
        .flatMap(r => Seq(math.floor(r).toLong, math.ceil(r).toLong))
        .distinct.sorted
      val spark = df.sparkSession
      import spark.implicits._
      val offs = offRows.toDF("__pid", "__off")
      val w = Window.partitionBy(col("__pid")).orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val hits = parts.join(broadcast(offs), "__pid")
        .withColumn("__start",
          col("__off") + sum(col("__c")).over(w) - col("__c"))
        .filter(targets.map(k =>
          col("__start") <= k && col("__start") + col("__c") > k)
          .reduce(_ || _))
        .select(col("__v"), col("__start"), col("__c"))
        .collect()
        .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
      def valueAt(k: Long): Double =
        hits.find(h => h._2 <= k && k < h._2 + h._3)
          .getOrElse(sys.error(s"rank $k not covered — bug"))._1
      ranks.map { r =>
        val lo = valueAt(math.floor(r).toLong)
        val hi = valueAt(math.ceil(r).toLong)
        // Spark Percentile's exact arithmetic (lo·(1−f) + hi·f), NOT
        // lo + f·(hi−lo) — the two differ in the last bit and the specs
        // gate bit-identity against percentile()
        val f = r - math.floor(r)
        lo * (1.0 - f) + hi * f
      }.toArray
    } finally { parts.unpersist(false); () }
  }
}
