package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Hybrid (vector + text) score fusion — reference
  * `cpp/deeplake_pg/hybrid_query_merge.hpp:27-130`: softmax-normalize each
  * result set's scores (clamped at 700 before exp, matching the
  * reference), then weighted-sum (default 0.5/0.5) and take top-k.
  *
  * Pure DataFrame composition: two scored sets -> per-set softmax via a
  * global-agg broadcast (max + sum are two tiny aggregates, not a window
  * over the corpus) -> full outer join on id -> weighted sum.
  */
object HybridSearch {

  /** softmax-normalize `score` within df: exp(s - max) / sum(exp(s - max)).
    * The softmax needs the scored set three times (max, sum, final
    * projection) — the caller is expected to hand in a CACHED frame
    * ([[fuse]] does) so the scoring pipeline runs once; the two scalar
    * stats then join back in as broadcast single-row DFs. */
  def softmaxScores(scored: DataFrame): DataFrame = {
    val m = scored.agg(max(col("score")).as("m"))
    val withExp = scored.crossJoin(broadcast(m))
      .select(col("id"), exp(least(col("score") - col("m"), lit(700.0))).as("e"))
    val z = withExp.agg(sum(col("e")).as("z"))
    withExp.crossJoin(broadcast(z)).select(col("id"), (col("e") / col("z")).as("p"))
  }

  /** fuse two (id, score) sets with weight alpha on the first. Each input
    * is persisted first: its (possibly expensive) scoring pipeline runs
    * once instead of once per softmax statistic. */
  def fuse(vec: DataFrame, text: DataFrame, alpha: Double = 0.5): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val v = softmaxScores(vec.persist(MEMORY_AND_DISK)).withColumnRenamed("p", "p_vec")
    val t = softmaxScores(text.persist(MEMORY_AND_DISK)).withColumnRenamed("p", "p_text")
    v.join(t, Seq("id"), "full")
      .select(col("id"),
        (coalesce(col("p_vec"), lit(0.0)) * alpha +
         coalesce(col("p_text"), lit(0.0)) * (1 - alpha)).as("hybrid_score"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the score-free
    * fusion that needs no calibration between heterogeneous scorers:
    * each (id, score) set truncates to its top `n` (TakeOrdered — from
    * there everything is result-set sized), ranks within the
    * truncation, and rrf(id) = Σ_sets 1/(k + rank). Ties break by id,
    * so ranks are deterministic. The rank window runs over an n-row
    * frame — a bounded artifact, not a corpus sort. Returns
    * (id, n_lists, rrf_score). */
  def rrf(sets: Seq[DataFrame], n: Int = 100, k: Int = 60): DataFrame = {
    require(sets.nonEmpty, "need at least one result set")
    require(n >= 1 && k >= 0, "bad truncation/constant")
    val ranked = sets.map { s =>
      val top = s.orderBy(col("score").desc, col("id")).limit(n)
      BoundedWindow.rank(top, "__rk", n, zeroBased = false,
        col("score").desc, col("id"))
        .select(col("id"), (lit(1.0) / (lit(k) + col("__rk"))).as("__r"))
    }
    ranked.reduce(_.unionByName(_))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_lists"), sum(col("__r")).as("rrf_score"))
  }

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein
    * 1998): greedily pick argmax λ·rel − (1−λ)·max-sim-to-selected —
    * the diversification pass run AFTER retrieval. Greedy selection is
    * inherently sequential, so it runs on the driver over the COLLECTED
    * candidate list — a bounded n-row artifact (the retrieval top-n,
    * same discipline as ANN centroids), never the corpus. Ties break by
    * id; returns (id, mmr_rank, mmr_score) for the k selected.
    * `candidates`: (id, score, vec) with unit-normalized vectors
    * (cosine == dot).
    *
    * `simDecimals >= 0` makes the greedy ORACLE-REPLAYABLE: the pairwise
    * sims come from the ENGINE, round()ed to that many decimals (the same
    * round() a SQL oracle applies), so a DuckDB unrolled-CTE replay of the
    * greedy sees bit-identical inputs and picks the same rows. Pass
    * engine-rounded rel scores for the same reason. The sim matrix is a
    * bounded maxCandidates² artifact — same discipline as the candidate
    * collect itself. */
  def mmr(candidates: DataFrame, k: Int, lambda: Double = 0.7,
      maxCandidates: Int = 1000, simDecimals: Int = -1): DataFrame = {
    require(k >= 1, "k must be positive")
    require(0 <= lambda && lambda <= 1, "lambda in [0, 1]")
    val spark = candidates.sparkSession
    import spark.implicits._
    val top = candidates
      .select(col("id").cast("long").as("id"),
        col("score").cast("double").as("score"),
        col("vec").cast("array<double>").as("vec"))
      .orderBy(col("score").desc, col("id")).limit(maxCandidates)
    val rows = top.collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Double](2).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    // engine-rounding (BigDecimal HALF_UP — exactly Spark's round())
    // applied on the DRIVER over the already-collected candidate
    // vectors: the previous Spark crossJoin shuffled maxCandidates²
    // pairs and re-executed the candidate plan a second time for the
    // same numbers
    val simLookup: Map[(Long, Long), Double] =
      if (simDecimals < 0) Map.empty
      else (for {
        (ai, _, va) <- rows.iterator
        (bi, _, vb) <- rows.iterator if bi != ai
      } yield ((ai, bi), BigDecimal(dot(va, vb))
        .setScale(simDecimals, BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Double)]
    val chosen = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
    val remaining = scala.collection.mutable.ArrayBuffer(rows: _*)
    while (selected.length < k && remaining.nonEmpty) {
      val scored = remaining.map { case (id, rel, v) =>
        val maxSim =
          if (chosen.isEmpty) 0.0
          else chosen.map { case (cid, cv) =>
            if (simDecimals < 0) dot(cv, v) else simLookup((cid, id))
          }.max
        (id, lambda * rel - (1 - lambda) * maxSim, v)
      }
      val best = scored.minBy { case (id, s, _) => (-s, id) }
      selected += ((best._1, selected.length + 1, best._2))
      chosen += ((best._1, best._3))
      remaining.remove(remaining.indexWhere(_._1 == best._1))
    }
    selected.toSeq.toDF("id", "mmr_rank", "mmr_score")
  }
}
