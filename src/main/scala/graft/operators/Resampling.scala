package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Poisson bootstrap (Hanley & MacGibbon 2006; the Chamandy et al. 2012
  * "Estimating uncertainty for massive data streams" posture Google
  * published for exactly this setting) — THE scalable bootstrap: the
  * classical bootstrap resamples n rows WITH replacement per replicate,
  * which needs global coordination; at large n the per-row multiplicity
  * in one replicate converges to Poisson(1), so each row can draw its
  * own i.i.d. replicate weights from a hash PRF, map-side, with no
  * shuffle of the resampling itself.
  *
  * Determinism: the weight for (replicate r, row key) inverts the
  * Poisson(1) CDF at [[Sampling.hashUniform]] of `seed:r:key:boot` —
  * reproducible across engines/partitions and SQL-replayable (the CDF
  * thresholds are shared constants, [[Resampling.poissonCdf]]).
  *
  * Scale shape: rows explode ×R (map-side; R is small), ONE hash agg
  * over R groups computes every replicate's weighted sum/count with
  * map-side combine, and the R-row replicate frame ranks inside
  * [[BoundedWindow]]. Nothing data-sized crosses a window.
  */
object Resampling {

  /** Cumulative Poisson(1) CDF thresholds c_k = P(X <= k), k = 0..8
    * (P(X > 9) < 1.1e-7 — the inverse draw caps at 9). Shared verbatim
    * by the operator and its SQL oracle so both sides bucket the SAME
    * uniform identically. */
  val poissonCdf: Seq[Double] = {
    val e1 = math.exp(-1.0)
    (0 to 8).map { k =>
      (0 to k).map(j => e1 / (1 to j).map(_.toDouble).product).sum
    }
  }

  /** Per-row Poisson(1) multiplicity for replicate `rep` of row `key`. */
  private def poissonWeight(u: org.apache.spark.sql.Column) =
    poissonCdf.zipWithIndex.reverse.foldLeft(lit(9): org.apache.spark.sql.Column) {
      case (acc, (c, k)) => when(u <= lit(c), lit(k)).otherwise(acc)
    }

  /** Bootstrap percentile CI for the mean of `valueCol`, keyed by
    * `keyCol` (the PRF input — any stable row id). Returns ONE row:
    * (n_rows, n_replicates, mean, ci_lo, ci_hi), 6dp; the CI is the
    * percentile interval over the replicate means (sorted ascending,
    * ranks max(1, ceil((1-level)/2 ·R)) and ceil((1+level)/2 ·R), ties
    * broken by replicate id). Degenerate tiny inputs (a few rows):
    * all-zero replicates drop with probability e^-n each, so the fixed
    * percentile ranks can land past the survivors and the affected CI
    * bound reports NULL — honest "too few rows to bootstrap" (the SQL
    * oracle replays identically), not a fabricated interval. */
  def poissonBootstrapMean(df: DataFrame, keyCol: String, valueCol: String,
      replicates: Int = 40, seed: Long = 42L,
      level: Double = 0.95): DataFrame = {
    require(replicates >= 4, "need at least 4 replicates")
    require(level > 0 && level < 1, s"level must be in (0,1): $level")
    val base = df
      .select(col(keyCol).cast("string").as("__k"),
        col(valueCol).cast("double").as("__x"))
      .filter(col("__x").isNotNull)
    val rep = base
      .withColumn("__rep", explode(sequence(lit(0), lit(replicates - 1))))
      .withColumn("__u", Sampling.hashUniform(
        concat(lit(s"$seed:"), col("__rep"), lit(":"), col("__k"), lit(":boot"))))
      .withColumn("__w", poissonWeight(col("__u")).cast("double"))
    val perRep = rep.groupBy(col("__rep"))
      .agg(sum(col("__w") * col("__x")).as("__s"), sum(col("__w")).as("__n"))
      .filter(col("__n") > 0) // a fully-zero replicate carries no mean
      .select(col("__rep"), (col("__s") / col("__n")).as("__m"))
    // epsilon before ceil: (1.0-0.95)/2.0*40 lands at 1.0000000000000009
    // in doubles — bare ceil would silently shift the lower percentile
    // rank from 1 to 2
    val loRank = math.max(1,
      math.ceil((1.0 - level) / 2.0 * replicates - 1e-9).toInt)
    val hiRank = math.min(replicates,
      math.ceil((1.0 + level) / 2.0 * replicates - 1e-9).toInt)
    val ranked = BoundedWindow.over(perRep, replicates) { (d, w) =>
      d.withColumn("__rk", row_number().over(w.orderBy(col("__m"), col("__rep"))))
    }
    val ci = ranked.agg(
      min(when(col("__rk") === loRank, col("__m"))).as("__lo"),
      min(when(col("__rk") === hiRank, col("__m"))).as("__hi"),
      count(lit(1)).cast("int").as("n_replicates"))
    val point = base.agg(count(lit(1)).as("n_rows"),
      (sum(col("__x")) / count(lit(1))).as("__mean"))
    point.crossJoin(broadcast(ci))
      .select(col("n_rows"), col("n_replicates"),
        round(col("__mean"), 6).as("mean"),
        round(col("__lo"), 6).as("ci_lo"),
        round(col("__hi"), 6).as("ci_hi"))
  }
}
