package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-engineering primitives for model-prep pipelines: quantile
  * discretization and categorical encodings — the transforms run over
  * the full corpus right before training, so their plan shapes matter
  * as much as any query's.
  *
  * Both operators follow the broadcast-bounds pattern ([[Robust]],
  * [[Drift]]): global statistics reduce to a tiny frame (k−1 edges, a
  * category table, a 1-row prior), ride back as broadcasts, and the
  * per-row transform is map-side math. Rows never shuffle.
  */
object Features {

  /** Equal-frequency discretization: bin(x) = number of quantile edges
    * at or below x, for k bins (edges at 1/k … (k−1)/k). Returns df +
    * `bin` (0-based; NULL values get NULL bins). The edges are ONE
    * array-percentile aggregate (never k−1 separate map states);
    * `approxBounds` swaps in the fixed-state sketch — the 100 TB
    * posture for high-cardinality doubles, exactly as
    * [[Robust.winsorize]]. */
  def discretize(df: DataFrame, valueCol: String, bins: Int,
      approxBounds: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(bins >= 2, "need at least 2 bins")
    val qs = (1 until bins).map(_.toDouble / bins)
    val qArr = qs.mkString("array(", ", ", ")")
    val edgeArr =
      if (approxBounds) expr(s"approx_percentile($valueCol, $qArr, $accuracy)")
      else expr(s"percentile($valueCol, $qArr)")
    val edges = df.filter(col(valueCol).isNotNull).agg(edgeArr.as("__edges"))
    df.crossJoin(broadcast(edges))
      .withColumn("bin",
        when(col(valueCol).isNotNull,
          aggregate(col("__edges"), lit(0),
            (acc, e) => acc + when(col(valueCol) >= e, 1).otherwise(0))))
      .drop("__edges")
  }

  /** Percentile-normalized quality blend: each signal is mapped to its
    * equal-frequency decile bin (the [[discretize]] edge rule) and the
    * bins combine as a weighted mean scaled to [0,1] — the standard
    * way to fuse incommensurable quality signals (length, token count,
    * ratios) into ONE ranking score without hand-tuned scale factors.
    * All edges come from a single 1-row aggregate that broadcasts onto
    * the rows; the blend itself is map-side array math. Returns df +
    * `bin_<signal>` per signal + `q_blend`. NULL in any signal ⇒ NULL
    * blend (an unscorable row, not a zero-quality row). `approxBounds`
    * swaps the exact percentile (value→count map state) for the
    * fixed-width sketch — the 100 TB posture, same convention as
    * [[discretize]]; exact stays default for the oracle. */
  def percentileBlend(df: DataFrame, signalCols: Seq[String],
      weights: Seq[Double], bins: Int = 10,
      approxBounds: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(signalCols.nonEmpty, "need at least one signal")
    require(signalCols.length == weights.length, "one weight per signal")
    require(weights.forall(_ >= 0) && weights.sum > 0, "weights must be non-negative, sum > 0")
    val qs = (1 until bins).map(_.toDouble / bins)
    val qArr = qs.mkString("array(", ", ", ")")
    val edgeAggs = signalCols.zipWithIndex.map { case (c, i) =>
      (if (approxBounds) expr(s"approx_percentile($c, $qArr, $accuracy)")
       else expr(s"percentile($c, $qArr)")).as(s"__e_$i")
    }
    val edges = df.agg(edgeAggs.head, edgeAggs.tail: _*)
    val binned = signalCols.zipWithIndex.foldLeft(
      df.crossJoin(broadcast(edges))) { case (acc, (c, i)) =>
      acc.withColumn(s"bin_$c",
        when(col(c).isNotNull,
          aggregate(col(s"__e_$i"), lit(0),
            (n, e) => n + when(col(c) >= e, 1).otherwise(0))))
    }
    val blend = signalCols.zipWithIndex
      .map { case (c, i) => col(s"bin_$c") * weights(i) }
      .reduce(_ + _) / (weights.sum * (bins - 1))
    binned
      .withColumn("q_blend", round(blend, 6))
      .drop(signalCols.indices.map(i => s"__e_$i"): _*)
  }

  /** Smoothed target encoding + frequency encoding of a categorical:
    *   target_enc = (Σ target + prior · smoothing) / (n + smoothing)
    *   freq_enc   = n / N
    * — the two classic high-cardinality categorical encoders. One
    * category-sized hash aggregate, the global prior/total as a 1-row
    * frame folded INTO that table before it broadcasts back onto the
    * rows; the per-row encode is a broadcast equi-join (for a
    * dimension-sized category set; at web-domain cardinality drop
    * `broadcastDims` and let AQE pick the join side). */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
      smoothing: Double = 10.0, broadcastDims: Boolean = true): DataFrame = {
    require(smoothing >= 0, "smoothing must be non-negative")
    val prior = df.agg(avg(col(targetCol)).as("__prior"),
      count(col(targetCol)).as("__total"))
    val stats = df.groupBy(col(catCol))
      .agg(count(col(targetCol)).as("__n"), sum(col(targetCol)).as("__sum"))
      .crossJoin(broadcast(prior))
      .select(col(catCol),
        ((col("__sum") + col("__prior") * smoothing) /
          (col("__n") + smoothing)).as("target_enc"),
        (col("__n").cast("double") / col("__total")).as("freq_enc"))
    df.join(if (broadcastDims) broadcast(stats) else stats, Seq(catCol))
  }
}
