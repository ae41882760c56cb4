package graft.operators

import org.apache.spark.sql.DataFrame
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
    val counts = df.filter(v > 0)
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
