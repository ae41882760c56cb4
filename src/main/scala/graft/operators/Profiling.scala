package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Operational data profiling: the key-distribution audit a pipeline
  * runs BEFORE deciding its partitioning strategy. A 100 TB shuffle on
  * a key whose top value owns 10% of the rows stalls on one reducer;
  * this report (top-share, entropy) is what justifies reaching for
  * [[SkewJoin]]'s salting or AQE skew handling — measured, not guessed.
  */
object Profiling {

  /** One-row key-skew profile of `keyCol`:
    * `(n_rows, n_keys, top1_share, topk_share, entropy, uniformity)`.
    *
    *  - top1_share / topk_share: row fraction owned by the heaviest 1 /
    *    `topK` keys — the direct "will one reducer drown" number
    *  - entropy: Shannon entropy of the key distribution in nats,
    *    ln(n_keys) when perfectly uniform
    *  - uniformity: entropy / ln(n_keys) in [0,1] (1-key degenerate
    *    distributions report 1.0 — ln(1)=0 guards to the uniform limit)
    *
    * Scale shape: ONE key-count hash aggregate does all the data-sized
    * work; both consumers (the 1-row stats agg and the TakeOrdered
    * top-`topK` sum) reuse the SAME aggregate subplan, so Spark's
    * exchange reuse computes it once. NULL keys count as their own key.
    * Entropy folds algebraically (Σ n·ln n), never a per-key pass twice. */
  def keyProfile(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    val counts = df
      .select(coalesce(col(keyCol).cast("string"), lit("\u0000null")).as("__k"))
      .groupBy(col("__k")).agg(count(lit(1)).as("n"))
    val stats = counts.agg(
      sum(col("n")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("n")).as("max_n"),
      sum(col("n").cast("double") * log(col("n").cast("double"))).as("nlogn"))
    val top = counts.orderBy(col("n").desc, col("__k")).limit(topK)
      .agg(sum(col("n")).as("top_n"))
    val h = log(col("n_rows").cast("double")) - col("nlogn") / col("n_rows")
    stats.crossJoin(broadcast(top)).select(
      col("n_rows").cast("long").as("n_rows"),
      col("n_keys").cast("long").as("n_keys"),
      round(col("max_n").cast("double") / col("n_rows"), 6).as("top1_share"),
      round(col("top_n").cast("double") / col("n_rows"), 6).as("topk_share"),
      round(h, 6).as("entropy"),
      round(when(col("n_keys") === 1, 1.0)
        .otherwise(h / log(col("n_keys").cast("double"))), 6).as("uniformity"))
  }

  /** Chi-square test of independence + Cramér's V between two
    * categorical columns (Pearson 1900; Cramér 1946) — the "are these
    * two dataset facets entangled" audit (e.g. does language predict
    * source, does label predict shard). Returns one row:
    * `(n, r_levels, c_levels, chi2, dof, cramers_v)`.
    *
    * The statistic sums (O−E)²/E over the FULL margin cross product —
    * zero-observed cells contribute their expected mass, which a
    * naive observed-cells-only sum silently drops. The cross product
    * is built from the two (bounded-by-contract) margin frames, so
    * data-sized work is exactly ONE (a,b) hash aggregate plus two
    * vocab-sized re-aggs; the margins join broadcast. NULLs count as
    * their own level. FULL oracle. */
  def chiSquareAssoc(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = df.select(
      coalesce(col(aCol).cast("string"), lit("\u0000null")).as("a"),
      coalesce(col(bCol).cast("string"), lit("\u0000null")).as("b"))
    val obs = base.groupBy(col("a"), col("b")).agg(count(lit(1)).as("o"))
    val ra = obs.groupBy(col("a")).agg(sum(col("o")).as("na"))
    val cb = obs.groupBy(col("b")).agg(sum(col("o")).as("nb"))
    val tot = obs.agg(sum(col("o")).cast("double").as("n"))
    val e = col("na") * col("nb") / col("n")
    broadcast(ra).crossJoin(broadcast(cb)).crossJoin(broadcast(tot))
      .join(obs, Seq("a", "b"), "left")
      .select(col("a"), col("b"), col("n"),
        (pow(coalesce(col("o"), lit(0L)) - e, 2) / e).as("term"))
      .agg(
        max(col("n")).cast("long").as("n"),
        countDistinct(col("a")).as("r_levels"),
        countDistinct(col("b")).as("c_levels"),
        sum(col("term")).as("__chi2"))
      .select(col("n"), col("r_levels"), col("c_levels"),
        round(col("__chi2"), 6).as("chi2"),
        ((col("r_levels") - 1) * (col("c_levels") - 1)).as("dof"),
        // a single-level margin makes V's denominator n·(min(r,c)−1) = 0;
        // chi2 and dof are both 0 there, so V is defined as 0, not NaN
        when(least(col("r_levels"), col("c_levels")) > 1,
          round(sqrt(col("__chi2") /
            (col("n") * (least(col("r_levels"), col("c_levels")) - 1))), 6))
          .otherwise(0.0).as("cramers_v"))
  }

  /** Cohen's kappa (Cohen 1960) — chance-corrected inter-annotator
    * agreement between two label columns over the SAME items: the
    * standard sanity check before trusting LLM-judge or heuristic
    * labels (two raters agreeing 80% of the time means little if one
    * label dominates; kappa subtracts the agreement chance predicts
    * from the raters' marginal label rates).
    *   kappa = (p_o − p_e) / (1 − p_e),
    *   p_o = Σ_k n_kk / n, p_e = Σ_k (row_k/n)(col_k/n).
    * NULL labels are a category of their own (the [[chiSquareAssoc]]
    * sentinel posture). Degenerate case: p_e = 1 (both raters constant
    * and identical) has kappa undefined → NULL, not NaN.
    *
    * Scale shape: ONE data-sized hash agg to the (a, b) contingency
    * table; margins and totals are label-count-sized aggregates of it.
    * Returns one row: (n, n_labels, po, pe, kappa), 6dp. */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.select(
        coalesce(col(aCol).cast("string"), lit("\u0000null")).as("a"),
        coalesce(col(bCol).cast("string"), lit("\u0000null")).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("o"))
    val ra = obs.groupBy(col("a").as("l")).agg(sum(col("o")).as("na"))
    val cb = obs.groupBy(col("b").as("l")).agg(sum(col("o")).as("nb"))
    // label universe = union of both sides' labels; a label missing
    // from one side has margin 0 and contributes nothing to p_e
    val margins = ra.join(cb, Seq("l"), "full_outer")
      .select(col("l"), coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    val tot = obs.agg(sum(col("o")).cast("double").as("n"))
    val diag = obs.filter(col("a") === col("b"))
      .agg(coalesce(sum(col("o")), lit(0L)).cast("double").as("agree"))
    margins.crossJoin(broadcast(tot)).crossJoin(broadcast(diag))
      .select(col("n"), col("agree"),
        ((col("na") / col("n")) * (col("nb") / col("n"))).as("__pk"))
      .agg(max(col("n")).cast("long").as("n"),
        count(lit(1)).as("n_labels"),
        max(col("agree") / col("n")).as("__po"),
        sum(col("__pk")).as("__pe"))
      .select(col("n"), col("n_labels"),
        round(col("__po"), 6).as("po"),
        round(col("__pe"), 6).as("pe"),
        when(col("__pe") < 1.0,
          round((col("__po") - col("__pe")) / (lit(1.0) - col("__pe")), 6))
          .as("kappa"))
  }

  /** Simpson's-paradox audit (Simpson 1951; the Berkeley-admissions
    * trap, Bickel et al. 1975) — does the AGGREGATE association between
    * a binary treatment and a binary outcome reverse inside strata?
    * The data-curation instance is constant: "English docs pass the
    * quality filter more often" can be pure source-mix confounding that
    * flips inside every source. Per stratum: both rates, the rate
    * difference, the shared aggregate difference, and `reversed`
    * (strict sign flip: diff·agg_diff < 0; NULL when a stratum lacks
    * one side, where the contrast is undefined).
    *
    * Scale shape: ONE conditional hash agg per stratum + a broadcast
    * 1-row aggregate. Returns (stratum, n_treat, n_ctrl, rate_treat,
    * rate_ctrl, diff, agg_diff, reversed), 6dp. */
  def simpsonAudit(df: DataFrame, treatPred: Column, outcomePred: Column,
      strataCol: String): DataFrame = {
    val t = treatPred
    val y = outcomePred.cast("int").cast("double")
    val base = df.select(
      coalesce(col(strataCol).cast("string"), lit("\u0000null")).as("stratum"),
      t.as("__t"), y.as("__y"))
    def rates(g: org.apache.spark.sql.RelationalGroupedDataset) = g.agg(
      count(when(col("__t"), 1)).as("n_treat"),
      count(when(!col("__t"), 1)).as("n_ctrl"),
      avg(when(col("__t"), col("__y"))).as("__rt"),
      avg(when(!col("__t"), col("__y"))).as("__rc"))
    val agg = rates(base.groupBy())
      .select((col("__rt") - col("__rc")).as("__agg_diff"))
    rates(base.groupBy(col("stratum")))
      .crossJoin(broadcast(agg))
      .select(col("stratum"), col("n_treat"), col("n_ctrl"),
        round(col("__rt"), 6).as("rate_treat"),
        round(col("__rc"), 6).as("rate_ctrl"),
        round(col("__rt") - col("__rc"), 6).as("diff"),
        round(col("__agg_diff"), 6).as("agg_diff"),
        ((col("__rt") - col("__rc")) * col("__agg_diff") < 0).as("reversed"))
  }

  /** Fleiss' kappa (Fleiss 1971) — [[cohenKappa]]'s generalization to
    * m raters per item (the LLM-judge-ensemble agreement audit): with
    * n_ij = raters assigning item i to category j,
    *   P_i = (Σ_j n_ij² − m) / (m(m−1))  (observed pairwise agreement),
    *   P̄_e = Σ_j p_j²,  p_j = Σ_i n_ij / (N·m),
    *   kappa = (P̄ − P̄_e) / (1 − P̄_e).
    * Requires the SAME rater count m on every item (enforced — a
    * ragged panel silently biases P_i).
    *
    * Scale shape: ONE (item, label) hash agg, an item-sized P_i re-agg,
    * a label-sized margin agg; everything joins broadcast. Returns one
    * row: (n_items, m_raters, p_bar, p_e, kappa), 6dp; p_e = 1 (all
    * raters constant and identical) → kappa NULL. */
  def fleissKappa(df: DataFrame, itemCol: String, labelCol: String): DataFrame = {
    val cnt = df.select(col(itemCol).as("i"),
        coalesce(col(labelCol).cast("string"), lit("\u0000null")).as("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val perItem = cnt.groupBy(col("i"))
        .agg(sum(col("n")).as("m"), sum(col("n") * col("n")).as("s2"))
      val mChk = perItem.agg(min(col("m")).as("lo"), max(col("m")).as("hi"))
        .head()
      require(!mChk.isNullAt(0), "fleissKappa: empty rating frame")
      require(mChk.getLong(0) == mChk.getLong(1),
        s"every item needs the same rater count (saw ${mChk.getLong(0)}..${mChk.getLong(1)})")
      val m = mChk.getLong(0).toDouble
      require(m >= 2, s"need >= 2 raters per item (got $m)")
      val pbar = perItem.agg(count(lit(1)).as("n_items"),
        avg((col("s2") - m) / lit(m * (m - 1.0))).as("__pbar"))
      val pe = cnt.groupBy(col("j")).agg(sum(col("n")).as("nj"))
        .crossJoin(broadcast(pbar.select(col("n_items"))))
        .select((col("nj") / (col("n_items") * m)).as("pj"))
        .agg(sum(col("pj") * col("pj")).as("__pe"))
      pbar.crossJoin(broadcast(pe))
        .select(col("n_items"), lit(m.toLong).as("m_raters"),
          round(col("__pbar"), 6).as("p_bar"),
          round(col("__pe"), 6).as("p_e"),
          when(col("__pe") < 1.0,
            round((col("__pbar") - col("__pe")) / (lit(1.0) - col("__pe")), 6))
            .as("kappa"))
    } finally { cnt.unpersist(false); () }
  }

  /** Empirical-Bayes beta-binomial rate shrinkage (Robbins 1956;
    * the method-of-moments prior everyone uses for "small domains lie"
    * rate tables): a domain with 3/4 docs passing a filter should NOT
    * outrank one with 700/1000 — each domain's raw rate shrinks toward
    * the cross-domain prior in proportion to its sample size:
    *   prior Beta(α, β) by MoM over the per-domain rates:
    *     K = (m(1−m) − v) / v,  α = mK, β = (1−m)K
    *   shrunk_k = (x_k + α) / (n_k + α + β).
    * Degenerate priors (v = 0, or v ≥ m(1−m) — overdispersion beyond
    * what a beta can carry) shrink nothing: shrunk = raw.
    *
    * Scale shape: ONE data-sized hash agg to (domain, x, n); the MoM
    * prior is a 1-row agg of the domain-sized frame, broadcast back.
    * Returns (domain, n, successes, rate, shrunk_rate), 6dp, plus the
    * prior's (alpha, beta) on every row for auditability. */
  def ebBetaBinomialRates(df: DataFrame, domainCol: String,
      successCol: String): DataFrame = {
    val per = df.select(
        coalesce(col(domainCol).cast("string"), lit("\u0000null")).as("domain"),
        col(successCol).cast("double").as("__s"))
      .filter(col("__s").isNotNull)
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n"), sum(col("__s")).as("x"))
      .withColumn("__r", col("x") / col("n"))
    val prior = per.agg(avg(col("__r")).as("__m"),
      var_samp(col("__r")).as("__v"))
    val k = (col("__m") * (lit(1.0) - col("__m")) - col("__v")) / col("__v")
    val usable = col("__v") > 0 && k > 0
    per.crossJoin(broadcast(prior))
      .select(col("domain"), col("n"),
        col("x").cast("long").as("successes"),
        round(col("__r"), 6).as("rate"),
        when(usable, round(col("__m") * k, 6)).as("alpha"),
        when(usable, round((lit(1.0) - col("__m")) * k, 6)).as("beta"),
        round(when(usable,
            (col("x") + col("__m") * k) / (col("n") + k))
          .otherwise(col("__r")), 6).as("shrunk_rate"))
  }

  /** Group selection-rate audit (the EEOC four-fifths screen, plus
    * statistical parity difference — Feldman et al. 2015's disparate-
    * impact formulation): per group, the rate at which `positiveCol`
    * holds, the ratio of that rate to the HIGHEST group rate
    * (disparate impact; flagged under `ratioFloor`, conventionally
    * 0.8), and the difference to the overall rate (statistical
    * parity). The dataset-curation use: check that a quality filter,
    * sampler, or labeler did not select one language/source/domain
    * at a structurally lower rate before training on the result.
    *
    * ONE hash aggregate over the group key does all data-sized work;
    * the max-rate and overall-rate frames ride back as broadcast
    * 1-row joins. FULL oracle. */
  def selectionRateAudit(df: DataFrame, groupCol: String,
      positiveCol: Column, ratioFloor: Double = 0.8): DataFrame = {
    val g = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(positiveCol.cast("long")).as("n_pos"))
      .withColumn("rate", col("n_pos").cast("double") / col("n"))
    val ref = g.agg(max(col("rate")).as("max_rate"))
    val overall = g.agg((sum(col("n_pos")).cast("double") /
      sum(col("n"))).as("overall_rate"))
    g.crossJoin(broadcast(ref)).crossJoin(broadcast(overall))
      .select(col(groupCol), col("n"), col("n_pos"),
        round(col("rate"), 6).as("rate"),
        round(col("rate") / col("max_rate"), 6).as("impact_ratio"),
        round(col("rate") - col("overall_rate"), 6).as("parity_diff"),
        (col("rate") / col("max_rate") < ratioFloor).as("flagged"))
  }

  /** Spearman rank correlation (Spearman 1904) — Pearson on average
    * ranks, the monotone-association complement to [[q_corr_matrix]]'s
    * linear Pearson: robust to outliers and nonlinear-but-monotone
    * relations (score calibration, heavy-tailed lengths). Ties get the
    * standard mid-rank.
    *
    * Ranks are computed DISTRIBUTED: repartitionByRange + per-partition
    * sort, then the [[RowNumber]] zipWithIndex offset trick (the naive
    * `rank().over(Window.orderBy(v))` funnels the data through one
    * task); mid-ranks fall out as the per-value AVERAGE of global row
    * numbers (tied values are contiguous in sort order, and any
    * within-tie order yields the same mean). Two rank maps join back on
    * value — ordinary shuffle joins — and one Pearson agg finishes.
    * Rows with a NULL on either side are dropped (pairwise-complete).
    * FULL oracle: DuckDB replays mid-ranks as rank() + (n_ties−1)/2.
    *
    * Returns one row `(n, spearman)` (6dp). */
  def spearmanCorr(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    // base feeds THREE consumers (both rank passes + the final pairing
    // join) — persisted, each pass reads the cached narrow projection
    // instead of re-scanning + re-parsing the source; the 1-row result
    // materializes eagerly so the cache can be released here
    val base = df
      .select(col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def avgRanks(c: String): DataFrame = {
        val sorted = base.select(col(c))
          .repartitionByRange(col(c)).sortWithinPartitions(col(c))
        RowNumber.withRowNumber(sorted, "__rn")
          .groupBy(col(c))
          .agg((avg(col("__rn")) + 1.0).as(s"r_$c"))
      }
      base.join(avgRanks("x"), "x").join(avgRanks("y"), "y")
        .agg(count(lit(1)).as("n"),
          round(corr(col("r_x"), col("r_y")), 6).as("spearman"))
        .localCheckpoint()
    } finally { base.unpersist(false); () }
  }

  /** Benford first-significant-digit audit (Newcomb 1881 / Benford 1938
    * — the classic screen for fabricated or truncated numeric columns:
    * naturally-occurring magnitudes follow P(d) = log10(1 + 1/d)):
    * per-digit observed counts/shares vs the Benford expectation and
    * the chi-square contribution (O−E)²/E on counts.
    *
    * The leading digit is extracted via INTEGER string formatting of
    * round(|v|·10^`decimals`) — never log10/pow on doubles, whose
    * last-ulp disagreement across engines could flip the digit at exact
    * powers of ten. `decimals` = the column's fixed decimal precision
    * (2 for money). Engine-exact, FULL oracle.
    *
    * Scale shape: one map-side digit projection + one 9-group hash agg;
    * the grand total rides back as a broadcast 1-row frame. */
  def benfordAudit(df: DataFrame, valCol: String, decimals: Int = 2): DataFrame = {
    val v = abs(col(valCol).cast("double"))
    val scaled = round(v * math.pow(10, decimals), 0).cast("long")
    val digit = substring(scaled.cast("string"), 1, 1).cast("int")
    // filter on the SCALED long, not the raw value: a value in
    // (0, 0.5·10^-decimals) is positive but rounds to scaled 0, which
    // would land on "digit 0" whose Benford share log10(1+1/0) is +Inf
    val counts = df.filter(scaled > 0)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).cast("double").as("n_tot"))
    val exp = col("n_tot") * col("benford_share")
    counts
      .withColumn("benford_share",
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 6))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n") / col("n_tot"), 6).as("obs_share"),
        col("benford_share"),
        round(pow(col("n") - exp, 2) / exp, 6).as("chi2_term"))
  }
}
