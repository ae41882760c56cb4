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
}
