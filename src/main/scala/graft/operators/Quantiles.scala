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

  /** Split-conformal prediction threshold (Vovk et al. 2005; the
    * finite-sample form popularized by Angelopoulos & Bates 2023):
    * given calibration nonconformity scores, the k-th smallest score
    * with k = ⌈(n+1)(1−α)⌉ guarantees P(new score ≤ threshold) ≥ 1−α
    * for exchangeable data — the coverage-GUARANTEED way to set a
    * "keep below this anomaly score" filter cutoff, where a plain
    * quantile has no finite-sample guarantee. k-th order statistic via
    * the funnel-free [[exactQuantiles]] rank selection at
    * q = (k−1)/(n−1) (integer rank — interpolation weight 0).
    * Returns one row `(n, k, alpha, threshold)` (threshold 6dp).
    * α must satisfy k ≤ n (n ≥ (1−α)/α calibration points). */
  def conformalThreshold(df: DataFrame, scoreCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0,1)")
    val vals = df.select(col(scoreCol).cast("double").as("__s"))
      .filter(col("__s").isNotNull)
    val n = vals.count()
    val k = math.ceil((n + 1) * (1.0 - alpha)).toLong
    require(k <= n, s"need more calibration points: k=$k > n=$n at alpha=$alpha")
    val q = if (n == 1) 0.0 else (k - 1).toDouble / (n - 1).toDouble
    val thr = exactQuantiles(vals, "__s", Seq(q)).head
    val spark = df.sparkSession
    import spark.implicits._
    Seq((n, k, alpha,
      BigDecimal(thr).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("n", "k", "alpha", "threshold")
  }

  /** Exact interpolated quantiles of `valueCol` (NULLs excluded), same
    * arithmetic as `percentile(col, array(qs))`: value at fractional
    * 0-based rank r = q·(n−1) is lo + (r − ⌊r⌋)·(hi − lo). Throws on an
    * empty (all-NULL) input like percentile returns NULL — caller
    * checks. */
  def exactQuantiles(df: DataFrame, valueCol: String,
      qs: Seq[Double]): Array[Double] =
    exactQuantilesOpt(df, valueCol, qs)
      .getOrElse(throw new IllegalArgumentException(
        s"requirement failed: no non-NULL values in $valueCol"))

  /** [[exactQuantiles]] that mirrors percentile()'s NULL-on-empty
    * instead of throwing: None when `valueCol` has no non-NULL values.
    * The graceful-degradation entry point for the exact-DEFAULT
    * consumers (winsorize/madScore/psiBins/discretize), whose old
    * percentile() plans produced NULL bounds on empty input rather
    * than failing the job. */
  def exactQuantilesOpt(df: DataFrame, valueCol: String,
      qs: Seq[Double]): Option[Array[Double]] =
    exactQuantilesByKey(
      df.select(lit("").as("__k"), col(valueCol).as("__val")), "__k", "__val", qs)
      .get("")

  /** [[exactQuantilesOpt]] over a PRE-COLLAPSED (value, weight) frame —
    * the entry point for multi-pass consumers ([[Robust.madScore]]'s
    * median-then-MAD): collapse the corpus to tie counts ONCE, persist
    * that, and run every later pass over the distinct-value frame
    * instead of re-scanning the source. Bit-identical to running
    * [[exactQuantilesOpt]] on the exploded rows (the rank arithmetic
    * only ever sees per-value totals). */
  def exactQuantilesWeightedOpt(df: DataFrame, valueCol: String,
      weightCol: String, qs: Seq[Double]): Option[Array[Double]] =
    exactQuantilesByKey(
      df.select(lit("").as("__k"), col(valueCol).as("__val"),
        col(weightCol).as("__wt")),
      "__k", "__val", qs, weightCol = Some("__wt"))
      .get("")

  /** [[exactQuantiles]] for SEVERAL value populations in ONE corpus
    * pass: `df` carries (key, value) rows — e.g. the per-signal explode
    * of [[graft.operators.Features.percentileBlend]] — and every key
    * gets its own exact interpolated quantiles. Same rank-selection
    * machinery, keys simply prepend the range-partition ordering; the
    * driver artifacts grow to numPartitions × |keys| rows (keys are
    * signals/metrics — a handful — never data-sized). Keys with no
    * non-NULL values are absent from the result (percentile's NULL). */
  def exactQuantilesByKey(df: DataFrame, keyCol: String, valueCol: String,
      qs: Seq[Double], weightCol: Option[String] = None): Map[String, Array[Double]] =
    exactQuantilesByKeyWithN(df, keyCol, valueCol, qs, weightCol)
      .map { case (k, (vs, _)) => k -> vs }

  /** [[exactQuantilesByKey]] also returning each key's non-NULL row
    * count — the machinery already collects per-partition totals to
    * build rank offsets, so consumers that need n (Theil-Sen's pair
    * count, conformal k) read it for free instead of paying a separate
    * count() pass over the same frame. */
  def exactQuantilesByKeyWithN(df: DataFrame, keyCol: String, valueCol: String,
      qs: Seq[Double], weightCol: Option[String] = None): Map[String, (Array[Double], Long)] = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0,1]: $qs")
    // perKV persists FIRST: repartitionByRange runs a range-boundary
    // sampling job over its input, which would otherwise re-execute the
    // whole tie-collapse aggregate (the corpus scan) a second time.
    // With weightCol, rows arrive as (value, weight) tie runs and skip
    // the collapse ENTIRELY — the rank machinery never needed unique
    // values (each row covers its own [start, start+c) rank range, ties
    // or not; the collapse was only a row-count optimization), so the
    // weighted path costs zero extra shuffles.
    val base = df.filter(col(valueCol).isNotNull && col(keyCol).isNotNull)
    val perKV = (weightCol match {
      case Some(wc) => base
        .select(col(keyCol).cast("string").as("__k"),
          col(valueCol).cast("double").as("__v"),
          col(wc).cast("long").as("__c"))
      case None => base
        .select(col(keyCol).cast("string").as("__k"),
          col(valueCol).cast("double").as("__v"))
        .groupBy(col("__k"), col("__v")).agg(count(lit(1)).as("__c"))
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val parts = perKV.repartitionByRange(col("__k"), col("__v"))
      .sortWithinPartitions(col("__k"), col("__v"))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val totals = parts.groupBy(col("__pid"), col("__k"))
        .agg(sum(col("__c")).as("__t"))
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      if (totals.isEmpty) return Map.empty
      val byKey = totals.groupBy(_._2)
      val offRows = byKey.toSeq.flatMap { case (k, rows) =>
        var o = 0L
        rows.sortBy(_._1).map { case (pid, _, t) =>
          val row = (pid, k, o); o += t; row
        }
      }
      val ranksByKey = byKey.map { case (k, rows) =>
        val n = rows.map(_._3).sum
        k -> qs.map(q => q * (n - 1))
      }
      val targetsByKey = ranksByKey.map { case (k, rs) =>
        k -> rs.flatMap(r => Seq(math.floor(r).toLong, math.ceil(r).toLong))
          .distinct.sorted
      }
      val spark = df.sparkSession
      import spark.implicits._
      val offs = offRows.toDF("__pid", "__k", "__off")
      // target ranks ride as a broadcast (key, rank) table and the
      // covering-row test is a hash join on key + a range filter — a
      // per-row cost of |qs|·2 comparisons for the row's OWN key. (A
      // literal OR-chain over every key's targets would cost
      // |keys|·|qs|·2 predicates per row — disastrous for the
      // many-bucket keyed consumers.)
      val targetRows = targetsByKey.toSeq
        .flatMap { case (k, ts) => ts.map(t => (k, t)) }
        .toDF("__k", "__t")
      val w = Window.partitionBy(col("__pid"), col("__k")).orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val hits = parts.join(broadcast(offs), Seq("__pid", "__k"))
        .withColumn("__start",
          col("__off") + sum(col("__c")).over(w) - col("__c"))
        .join(broadcast(targetRows), Seq("__k"))
        .filter(col("__start") <= col("__t") &&
          col("__start") + col("__c") > col("__t"))
        .select(col("__k"), col("__v"), col("__start"), col("__c"))
        .dropDuplicates("__k", "__start")
        .collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1)
      ranksByKey.map { case (k, ranks) =>
        val hs = hits.getOrElse(k, Array.empty)
        def valueAt(t: Long): Double =
          hs.find(h => h._3 <= t && t < h._3 + h._4)
            .getOrElse(sys.error(s"rank $t not covered for key $k — bug"))._2
        val vs = ranks.map { r =>
          val lo = valueAt(math.floor(r).toLong)
          val hi = valueAt(math.ceil(r).toLong)
          // Spark Percentile's exact arithmetic (lo·(1−f) + hi·f), NOT
          // lo + f·(hi−lo) — the two differ in the last bit and the
          // specs gate bit-identity against percentile()
          val f = r - math.floor(r)
          lo * (1.0 - f) + hi * f
        }.toArray
        k -> (vs, byKey(k).map(_._3).sum)
      }
    } finally { parts.unpersist(false); perKV.unpersist(false); () }
  }
}
