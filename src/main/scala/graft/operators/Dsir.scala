package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting for data selection (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling" —
  * public method): score each raw document by how much more likely its
  * word-n-gram bag is under a TARGET domain's feature model than under
  * the RAW corpus's own, log w(x) = Σ_g c_g(x)·[ln p̂_T(g) − ln p̂_R(g)]
  * with add-α smoothing, then select by weight — the standard recipe
  * for skewing a web-scale corpus toward a quality/target domain
  * without training a classifier.
  *
  * Features are unigrams+bigrams of whitespace tokens, optionally
  * hashed into a fixed bucket space (`hashBuckets` — the paper's
  * posture: feature state bounded at any corpus size; the count tables
  * become ≤B rows and broadcast, so scoring is map-side + ONE doc
  * re-agg shuffle). Exact-gram mode keeps string features (vocab-sized
  * count tables, equi-joined) and is what the SQL oracle checks; the
  * spec gates hashed-vs-exact ranking agreement.
  */
object Dsir {
  import TextAnalysis.{tokens, bigrams}

  /** unigrams ++ bigrams, duplicates kept (counts matter) */
  private def grams(text: Column): Column = {
    val w = tokens(text)
    concat(w, bigrams(w))
  }

  /** (id, n_grams, log_weight) for every raw doc. */
  def logWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, alpha: Double = 0.5,
      hashBuckets: Option[Int] = None): DataFrame = {
    require(alpha > 0, "need alpha > 0 (smoothing keeps probabilities finite)")
    // exact mode ALSO keys on xxhash64: count tables and the scoring
    // join then shuffle fixed-width longs instead of bigram strings
    // (the hashed-shingle posture of the jaccard dedups — per-gram
    // counts are hash-invariant absent 64-bit collisions)
    def bucketed(c: Column): Column = hashBuckets match {
      case Some(b) => pmod(xxhash64(c), lit(b.toLong))
      case None => xxhash64(c)
    }
    // the doc-gram frame feeds BOTH the raw count table and the scoring
    // join; persisting it avoids re-exploding the corpus (the staged-
    // frame pattern the MinHash/banded dedups use). Both explodes are
    // FLOP-bound over narrow scans — spread them (core.Par) or the gram
    // tokenize+hash chain runs on the input's (few) file splits.
    val docG = graft.core.Par.spread(raw).select(col(idCol).as("id"),
        explode(grams(col(textCol))).as("g0"))
      .select(col("id"), bucketed(col("g0")).as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tgtG = graft.core.Par.spread(target)
      .select(explode(grams(col(textCol))).as("g0"))
      .select(bucketed(col("g0")).as("g"))
    val rc = docG.groupBy(col("g")).agg(count(lit(1)).as("rc"))
    val tc = tgtG.groupBy(col("g")).agg(count(lit(1)).as("tc"))
    // ratio feeds the constants agg AND the scoring join — persist the
    // (vocab-bounded) table rather than recomputing both count passes
    val ratio0 = rc.join(tc, Seq("g"), "full")
      .select(col("g"), coalesce(col("rc"), lit(0L)).as("rc"),
        coalesce(col("tc"), lit(0L)).as("tc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exact mode: the gram-count table is vocab-sized, unknowable to the
    // planner (persisted frame, no stats) — one count() on the (already
    // persisted) table decides whether it fits a broadcast, which turns
    // the data-sized scoring join map-side (guide §3.1). The row gate
    // (2M rows ~ tens of MB framed) keeps unbounded exact vocabularies
    // on the shuffle-join path at scale.
    val ratio = if (hashBuckets.isDefined || ratio0.count() <= 2000000L)
      broadcast(ratio0) else ratio0
    // model constants as a broadcast 1-row frame — no driver action.
    // V = observed feature count in exact mode, the full bucket space
    // when hashing (the fixed feature domain the models live over).
    val consts = broadcast(ratio0.agg(
      sum(col("rc")).as("nr"), sum(col("tc")).as("nt"),
      hashBuckets.map(b => lit(b.toLong).as("v"))
        .getOrElse(count(lit(1)).as("v"))))
    docG.join(ratio, Seq("g"), "left")
      .crossJoin(consts)
      .select(col("id"),
        (log((coalesce(col("tc"), lit(0L)) + lit(alpha)) /
            (col("nt") + lit(alpha) * col("v"))) -
          log((coalesce(col("rc"), lit(0L)) + lit(alpha)) /
            (col("nr") + lit(alpha) * col("v")))).as("lr"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("lr")).as("log_weight"))
  }

  // ---- maintained feature-count state (the LSM posture every index
  // maintainer here uses): gram counts are algebraic (plain sums), so
  // an append absorbs as ONE O(delta) segment write — history text is
  // never re-exploded — and readers merge segments with a groupBy.

  /** materialize a corpus's feature counts: segment zero */
  def writeCounts(docs: DataFrame, textCol: String, dir: String,
      hashBuckets: Option[Int] = None): Unit =
    countSegment(docs, textCol, hashBuckets)
      .write.mode("overwrite").parquet(dir)

  /** absorb appended docs: count ONLY the delta, append its segment */
  def absorbCounts(delta: DataFrame, textCol: String, dir: String,
      hashBuckets: Option[Int] = None): Unit =
    countSegment(delta, textCol, hashBuckets)
      .write.mode("append").parquet(dir)

  /** merge-on-read current counts: (g, c) — one groupBy IS the
    * algebraic merge of however many segments accumulated */
  def readCounts(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    spark.read.parquet(dir).groupBy(col("g")).agg(sum(col("c")).as("c"))

  private def countSegment(docs: DataFrame, textCol: String,
      hashBuckets: Option[Int]): DataFrame = {
    val g = docs.select(explode(grams(col(textCol))).as("g0"))
    val keyed = hashBuckets match {
      case Some(b) => g.select(pmod(xxhash64(col("g0")), lit(b.toLong)).as("g"))
      case None => g.select(col("g0").cast("string").as("g"))
    }
    keyed.groupBy(col("g")).agg(count(lit(1)).as("c"))
  }

  /** [[logWeights]] against MAINTAINED count state instead of inline
    * aggregation — the serving shape: the corpus-sized explode happens
    * once per absorb, scoring reads only the (vocab- or B-bounded)
    * merged tables. Both mode and bucketing must match how the state
    * was written. */
  def logWeightsFromCounts(raw: DataFrame, idCol: String, textCol: String,
      rawCounts: DataFrame, targetCounts: DataFrame, alpha: Double = 0.5,
      hashBuckets: Option[Int] = None): DataFrame = {
    require(alpha > 0, "need alpha > 0")
    // exact mode joins on xxhash64 of the stored gram string — the
    // scoring shuffle moves fixed-width longs, not bigram strings
    // (identical to [[logWeights]]' keying; counts are hash-invariant
    // absent 64-bit collisions). Hashed mode joins the bucket key.
    def bucketed(c: Column): Column = hashBuckets match {
      case Some(b) => pmod(xxhash64(c), lit(b.toLong)).cast("string")
      case None => xxhash64(c)
    }
    def storedKey(c: Column): Column = hashBuckets match {
      case Some(_) => c.cast("string")
      case None => xxhash64(c.cast("string"))
    }
    val docG = graft.core.Par.spread(raw).select(col(idCol).as("id"),
        explode(grams(col(textCol))).as("g0"))
      .select(col("id"), bucketed(col("g0")).as("g"))
    val ratio0 = rawCounts.select(storedKey(col("g")).as("g"),
        col("c").as("rc"))
      .join(targetCounts.select(storedKey(col("g")).as("g"),
        col("c").as("tc")), Seq("g"), "full")
      .select(col("g"), coalesce(col("rc"), lit(0L)).as("rc"),
        coalesce(col("tc"), lit(0L)).as("tc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exact mode: the gram-count table is vocab-sized, unknowable to the
    // planner (persisted frame, no stats) — one count() on the (already
    // persisted) table decides whether it fits a broadcast, which turns
    // the data-sized scoring join map-side (guide §3.1). The row gate
    // (2M rows ~ tens of MB framed) keeps unbounded exact vocabularies
    // on the shuffle-join path at scale.
    val ratio = if (hashBuckets.isDefined || ratio0.count() <= 2000000L)
      broadcast(ratio0) else ratio0
    val consts = broadcast(ratio0.agg(
      sum(col("rc")).as("nr"), sum(col("tc")).as("nt"),
      hashBuckets.map(b => lit(b.toLong).as("v"))
        .getOrElse(count(lit(1)).as("v"))))
    docG.join(ratio, Seq("g"), "left")
      .crossJoin(consts)
      .select(col("id"),
        (log((coalesce(col("tc"), lit(0L)) + lit(alpha)) /
            (col("nt") + lit(alpha) * col("v"))) -
          log((coalesce(col("rc"), lit(0L)) + lit(alpha)) /
            (col("nr") + lit(alpha) * col("v")))).as("lr"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("lr")).as("log_weight"))
  }

  /** Importance RESAMPLING: draw `n` docs without replacement with
    * probability ∝ w(x)^(1/temperature), via the Gumbel-top-k trick —
    * key = logw/T + Gumbel(seed, id), take the n largest. Seeded and
    * deterministic; the perturbed top-n lowers to TakeOrderedAndProject
    * (never a global sort). */
  def select(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, n: Int, alpha: Double = 0.5,
      hashBuckets: Option[Int] = None, temperature: Double = 1.0,
      seed: Long = 42L, hashKeyed: Boolean = false): DataFrame = {
    require(temperature > 0, "temperature must be positive")
    val w = logWeights(raw, target, idCol, textCol, alpha, hashBuckets)
    // hashKeyed = the ORACLE-REPLAYABLE mode: the Gumbel uniform comes
    // from the engine-independent md5 fold (the open +0.5 lattice keeps
    // u interior by construction, not by fold-constant accident — the
    // double log must never see an endpoint), and the key rounds to
    // 6dp BEFORE the top-n cut so both engines rank identical doubles
    // (cross-engine fp drift in the log-weight sum stays ~1e-12, far
    // under the rounding quantum). Default mode keeps the cheaper
    // xxhash64 uniform.
    val u =
      if (hashKeyed) graft.operators.Sampling.hashUniformOpen(
        concat_ws(":", lit(seed.toString), col("id")))
      else (pmod(xxhash64(col("id"), lit(seed)), lit(1000000000L))
        .cast("double") + lit(0.5)) / lit(1e9)
    val key = col("log_weight") / lit(temperature) - log(-log(u))
    w.withColumn("gumbel_key", if (hashKeyed) round(key, 6) else key)
      .orderBy(col("gumbel_key").desc, col("id"))
      .limit(n)
  }

  /** [[select]] against MAINTAINED count state ([[readCounts]]) — same
    * Gumbel-top-k selection, but the count tables are read, not
    * re-aggregated from the corpus. */
  def selectFromCounts(raw: DataFrame, idCol: String, textCol: String,
      rawCounts: DataFrame, targetCounts: DataFrame, n: Int,
      alpha: Double = 0.5, hashBuckets: Option[Int] = None,
      temperature: Double = 1.0, seed: Long = 42L,
      hashKeyed: Boolean = false): DataFrame = {
    require(temperature > 0, "temperature must be positive")
    val w = logWeightsFromCounts(raw, idCol, textCol, rawCounts,
      targetCounts, alpha, hashBuckets)
    val u =
      if (hashKeyed) graft.operators.Sampling.hashUniformOpen(
        concat_ws(":", lit(seed.toString), col("id")))
      else (pmod(xxhash64(col("id"), lit(seed)), lit(1000000000L))
        .cast("double") + lit(0.5)) / lit(1e9)
    val key = col("log_weight") / lit(temperature) - log(-log(u))
    w.withColumn("gumbel_key", if (hashKeyed) round(key, 6) else key)
      .orderBy(col("gumbel_key").desc, col("id"))
      .limit(n)
  }
}
