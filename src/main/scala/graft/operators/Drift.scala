package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between a reference window and a
  * current window of the same feature — the check that tells a training
  * pipeline its incoming data no longer looks like what the model was
  * built on.
  *
  * PSI (population stability index), the industry-standard scorecard
  * metric: bin by the REFERENCE distribution's exact quantiles (equal
  * expected mass — drift shows up as mass imbalance, not bin-edge
  * artifacts), then PSI = Σ (p_cur − p_ref) · ln(p_cur / p_ref) with
  * ε-smoothing for empty bins. Rule of thumb: < 0.1 stable, 0.1–0.25
  * drifting, > 0.25 broken.
  *
  * Plan shape: the reference's quantile edges are ONE exact-percentile
  * aggregate broadcast as a 1-row frame; both sides bucket map-side
  * against the literal edges and pay one small (nBins-row) aggregation
  * each. Neither side ever joins the other's rows.
  */
object Drift {

  /** per-bin breakdown: (bin, n_ref, n_cur, p_ref, p_cur, psi_term) */
  def psiBins(ref: DataFrame, cur: DataFrame, valueCol: String,
      nBins: Int = 10, eps: Double = 1e-4): DataFrame = {
    require(nBins >= 2, "need at least 2 bins")
    val qs = (1 until nBins).map(_.toDouble / nBins)
    val edgeCols = qs.zipWithIndex.map { case (q, i) =>
      expr(s"percentile($valueCol, $q)").as(s"__e$i")
    }
    val edges = ref.agg(edgeCols.head, edgeCols.tail: _*)
    def binned(df: DataFrame, side: String): DataFrame = {
      // bin = number of edges strictly below the value — map-side math
      // against the broadcast 1-row edge frame
      val b = (0 until nBins - 1).map(i =>
        when(col(valueCol) > col(s"__e$i"), 1).otherwise(0))
        .reduce[Column](_ + _)
      df.select(col(valueCol)).crossJoin(broadcast(edges))
        .select(b.as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(s"n_$side"))
    }
    val r = binned(ref, "ref")
    val c = binned(cur, "cur")
    val nr = ref.count().toDouble
    val nc = cur.count().toDouble
    r.join(c, Seq("bin"), "full")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .withColumn("p_ref", greatest(col("n_ref") / nr, lit(eps)))
      .withColumn("p_cur", greatest(col("n_cur") / nc, lit(eps)))
      .withColumn("psi_term",
        (col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")))
  }

  /** the scalar PSI */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
      nBins: Int = 10, eps: Double = 1e-4): Double =
    psiBins(ref, cur, valueCol, nBins, eps)
      .agg(sum(col("psi_term"))).head().getDouble(0)

  /** Categorical drift via Jensen-Shannon divergence — PSI's companion
    * for label/source/language columns where quantile bins make no
    * sense. Per category c: js_term = ½·p_ref·ln(p_ref/m) +
    * ½·p_cur·ln(p_cur/m) with m = (p_ref+p_cur)/2 and ε-smoothing; the
    * sum is bounded [0, ln 2], symmetric, and never infinite — the
    * properties that make JS the standard choice over raw KL for
    * monitoring. Two tiny per-side aggregations + one full join on the
    * category key; the rows of one side never meet the other's. */
  def jsBins(ref: DataFrame, cur: DataFrame, catCol: String,
      eps: Double = 1e-6): DataFrame = {
    def shares(df: DataFrame, side: String): DataFrame =
      df.groupBy(col(catCol).cast("string").as("category"))
        .agg(count(lit(1)).as(s"n_$side"))
    val nr = ref.count().toDouble
    val nc = cur.count().toDouble
    shares(ref, "ref").join(shares(cur, "cur"), Seq("category"), "full")
      .select(col("category"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .withColumn("p_ref", greatest(col("n_ref") / nr, lit(eps)))
      .withColumn("p_cur", greatest(col("n_cur") / nc, lit(eps)))
      .withColumn("__m", (col("p_ref") + col("p_cur")) / 2)
      .withColumn("js_term",
        (col("p_ref") * log(col("p_ref") / col("__m")) +
          col("p_cur") * log(col("p_cur") / col("__m"))) / 2)
      .drop("__m")
  }

  /** the scalar JS divergence (nats, in [0, ln 2]) */
  def jsDivergence(ref: DataFrame, cur: DataFrame, catCol: String,
      eps: Double = 1e-6): Double =
    jsBins(ref, cur, catCol, eps).agg(sum(col("js_term"))).head().getDouble(0)

  /** Exact two-sample Kolmogorov-Smirnov statistic — the bin-free
    * member of the drift family: D = sup_x |F_ref(x) − F_cur(x)|,
    * sensitive to ANY distributional difference, no binning choices.
    *
    * Distributed shape: union both sides tagged, ONE global sort-by-
    * value window computes both running ECDFs in a single pass, and
    * the sup is one max aggregation. The window is a global ORDER BY —
    * the price of an exact sup; for 100 TB use [[psi]] (bounded bins)
    * and reserve exact KS for the sampled slices where its sensitivity
    * matters. Ties handled exactly: the ECDF step at a tied value
    * applies both sides' mass before the gap is read (rangeBetween
    * frame = all rows with value <= current). */
  def ks(ref: DataFrame, cur: DataFrame, valueCol: String): Double = {
    import org.apache.spark.sql.expressions.Window
    val nr = ref.count().toDouble
    val nc = cur.count().toDouble
    require(nr > 0 && nc > 0, "both samples must be non-empty")
    val u = ref.select(col(valueCol).cast("double").as("v"), lit(1).as("__r"),
        lit(0).as("__c"))
      .unionByName(cur.select(col(valueCol).cast("double").as("v"),
        lit(0).as("__r"), lit(1).as("__c")))
    val w = Window.orderBy(col("v"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__gap", abs(
        sum(col("__r")).over(w) / nr - sum(col("__c")).over(w) / nc))
      .agg(max(col("__gap"))).head().getDouble(0)
  }
}
