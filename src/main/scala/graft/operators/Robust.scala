package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Outlier-robust numeric cleaning (winsorization): clamp a value
  * column to its [loQ, hiQ] quantile bounds. The bounds ride as a
  * broadcast 1-row frame — no driver action — and the clamp is
  * map-side math.
  *
  * Three bound postures:
  *   - exact (default): Spark's `percentile`, whose aggregation state
  *     is a value→count map — bit-exact against a SQL oracle and lazy
  *     (rides inside one plan), but the final map merge funnels through
  *     one reducer proportional to distinct cardinality;
  *   - `approxBounds = true`: `approx_percentile` (Greenwald-Khanna),
  *     fixed-size state with rank error ≤ 1/accuracy — the sketch
  *     posture, same plan shape otherwise;
  *   - [[Quantiles.exactQuantiles]]: exact AND funnel-free (range-
  *     partition rank selection, bit-identical results, spec-gated) at
  *     the price of eager driver-bound literals — the 100 TB posture
  *     when exactness is required on high-cardinality columns.
  */
object Robust {

  /** `df` + `lo`, `hi` (the quantile bounds) + `__w` (the clamped
    * value). Callers aggregate or project from there. */
  def winsorize(df: DataFrame, valueCol: String,
      loQ: Double = 0.01, hiQ: Double = 0.99,
      approxBounds: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(0 <= loQ && loQ < hiQ && hiQ <= 1, s"bad quantiles [$loQ, $hiQ]")
    // ONE percentile aggregate with an array of quantiles: separate
    // percentile() calls each carry their own value->count map state —
    // the array form shares a single map for both bounds
    val both =
      if (approxBounds)
        expr(s"approx_percentile($valueCol, array($loQ, $hiQ), $accuracy)")
      else expr(s"percentile($valueCol, array($loQ, $hiQ))")
    val bounds = df.agg(both.as("__b"))
      .select(element_at(col("__b"), 1).cast("double").as("lo"),
        element_at(col("__b"), 2).cast("double").as("hi"))
    df.crossJoin(broadcast(bounds))
      .withColumn("__w",
        least(greatest(col(valueCol).cast("double"), col("lo")), col("hi")))
  }

  /** Per-group winsorization: each group clamps to ITS OWN quantile
    * bounds (per-domain clipping — a global bound would let one
    * heavy-tailed domain set everyone's limits). ONE grouped
    * array-percentile aggregate (group-count rows) joins back by
    * broadcast, the clamp stays map-side; `approxBounds` as in
    * [[winsorize]]. Adds `lo`, `hi`, `__w`. */
  def winsorizeByGroup(df: DataFrame, groupCol: String, valueCol: String,
      loQ: Double = 0.01, hiQ: Double = 0.99,
      approxBounds: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(0 <= loQ && loQ < hiQ && hiQ <= 1, s"bad quantiles [$loQ, $hiQ]")
    val both =
      if (approxBounds)
        expr(s"approx_percentile($valueCol, array($loQ, $hiQ), $accuracy)")
      else expr(s"percentile($valueCol, array($loQ, $hiQ))")
    val bounds = df.groupBy(col(groupCol)).agg(both.as("__b"))
      .select(col(groupCol),
        element_at(col("__b"), 1).cast("double").as("lo"),
        element_at(col("__b"), 2).cast("double").as("hi"))
    df.join(broadcast(bounds), Seq(groupCol))
      .withColumn("__w",
        least(greatest(col(valueCol).cast("double"), col("lo")), col("hi")))
  }

  /** Median-absolute-deviation outlier scoring — the robust z-score
    * (0.6745 · (x − median) / MAD) that a single extreme value cannot
    * corrupt the way it corrupts mean/stddev. Two percentile aggregates
    * (median, then median of |x − median|), each a broadcast 1-row
    * frame, the score map-side; `approxBounds` swaps both to the
    * fixed-state sketch exactly as [[winsorize]]. A zero/NULL MAD
    * (constant-majority column) scores NULL — never a division blowup.
    * Returns df + `med`, `mad`, `robust_z`. */
  def madScore(df: DataFrame, valueCol: String,
      approxBounds: Boolean = false, accuracy: Int = 10000): DataFrame = {
    def med(c: String) =
      if (approxBounds) expr(s"approx_percentile($c, 0.5, $accuracy)")
      else expr(s"percentile($c, 0.5)")
    val m = df.agg(med(valueCol).cast("double").as("med"))
    val withMed = df.crossJoin(broadcast(m))
    val a = withMed.select(abs(col(valueCol).cast("double") - col("med")).as("__d"))
      .agg(med("__d").cast("double").as("mad"))
    withMed.crossJoin(broadcast(a))
      .withColumn("robust_z",
        when(col("mad") > 0,
          lit(0.6745) * (col(valueCol).cast("double") - col("med")) / col("mad")))
  }
}
