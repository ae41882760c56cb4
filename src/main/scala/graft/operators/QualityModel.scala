package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier step of LLM corpus
  * curation (public practice: CCNet/LLaMA-style fastText quality
  * classifiers distinguishing "reference-quality" text from crawl
  * noise), built Spark-native instead of importing a model:
  * feature-hashed bag of words (the hashing trick — Weinberger et al.
  * 2009; map-side, fixed `dim` regardless of vocabulary) + logistic
  * regression (MLlib L-BFGS, tree-aggregated gradients — the same
  * distributed-training shape as the KMeans the ANN index uses).
  *
  * Scale: featurization is one map-side pass (no shuffle, no vocab
  * build); each L-BFGS iteration is a treeAggregate over the corpus;
  * scoring broadcasts the coefficient vector inside the MLlib
  * transform — O(corpus) map work. Deterministic for a fixed seed and
  * corpus (hashing is content-keyed, L-BFGS from a fixed init).
  *
  * The canonical use pairs it with [[TextAnalysis.ruleFlags]]: label a
  * slice by the cheap Gopher rules (or human/LLM judgments), train,
  * then score the WHOLE corpus with a model that generalizes past the
  * hard thresholds. */
object QualityModel {

  final case class Model(lr: LogisticRegressionModel, dim: Int)

  /** md5-fold feature hashing (the hashing trick, binary): bucket j is
    * set iff SOME token md5-folds to j — the same semantics as
    * HashingTF(binary=true) but with the repo's engine-portable 60-bit
    * md5 prefix fold instead of murmur3, so the EXACT bucketing replays
    * in the DuckDB oracle (`Registry.hex60Sql`). Sorted-distinct, ready
    * for sparse-vector construction. Map-side, codegen'd. */
  private[graft] def buckets(text: Column, dim: Int): Column =
    array_sort(array_distinct(transform(TextAnalysis.tokens(text),
      t => pmod(conv(substring(md5(t), 1, 15), 16, 10).cast("long"),
        lit(dim.toLong)).cast("int"))))

  private def featurize(docs: DataFrame, textCol: String, dim: Int): DataFrame = {
    val withB = docs.withColumn("__bkts", buckets(col(textCol), dim))
    val bIdx = withB.schema.fieldIndex("__bkts")
    val schema = withB.schema.add("features",
      org.apache.spark.ml.linalg.SQLDataTypes.VectorType)
    // mapPartitions ONLY constructs the MLlib SparseVector (no public
    // Column expression builds one — HashingTF does the same via an
    // internal udf); the hashing itself stays codegen'd above
    withB.mapPartitions { it =>
      it.map { r =>
        val idx = r.getSeq[Int](bIdx).toArray
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+
          org.apache.spark.ml.linalg.Vectors.sparse(dim, idx,
            Array.fill(idx.length)(1.0)))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
      .drop("__bkts")
  }

  /** Train on (textCol, labelCol∈{0,1}) rows. */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
      dim: Int = 1 << 14, maxIter: Int = 30, regParam: Double = 1e-4): Model = {
    val feat = featurize(
      labeled.withColumn("label", col(labelCol).cast("double")), textCol, dim)
    Model(new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .fit(feat), dim)
  }

  /** Persist the trained model as a relational artifact: nonzero
    * (bucket, w) coefficient rows + one meta row (intercept, dim).
    * Buckets never seen in training keep their zero init under L-BFGS
    * (zero gradient, zero L2 pull at 0), so the nonzero rows are the
    * complete model. [[scoreRelational]] — and the DuckDB oracle — score
    * by joining these tables. */
  def save(model: Model, spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    model.lr.coefficients.toArray.zipWithIndex
      .collect { case (w, i) if w != 0.0 => (i, w) }.toSeq
      .toDF("bucket", "w").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/weights")
    Seq((model.lr.intercept, model.dim)).toDF("intercept", "dim").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Score against PERSISTED weights with pure relational ops: explode
    * the distinct md5 buckets, broadcast-join the weight table,
    * sigmoid(intercept + Σw) — the same math the MLlib transform does
    * on binary features, and exactly what the SQL oracle replays from
    * the artifact parquet. Output: idCol, keepCols..., quality_prob
    * (rounded 6dp). One broadcast join + one group-by-id agg; the
    * weight table is bounded by the training vocabulary. */
  def scoreRelational(docs: DataFrame, idCol: String, keepCols: Seq[String],
      textCol: String, weights: DataFrame, intercept: Double,
      dim: Int): DataFrame = {
    val keyCols = (idCol +: keepCols).map(col)
    docs.select(keyCols :+ buckets(col(textCol), dim).as("__bkts"): _*)
      .select(keyCols :+ explode_outer(col("__bkts")).as("bucket"): _*)
      .join(broadcast(weights.select(col("bucket"), col("w"))), Seq("bucket"), "left")
      .groupBy(keyCols: _*)
      .agg(round(lit(1.0) / (lit(1.0) +
        exp(-(lit(intercept) + coalesce(sum(col("w")), lit(0.0))))), 6)
        .as("quality_prob"))
  }

  /** Score docs: input columns + `quality_prob` (P(label=1), extracted
    * from the probability vector via the native vector_to_array
    * expression — no Scala UDF). */
  def score(model: Model, docs: DataFrame, textCol: String): DataFrame =
    model.lr
      .setPredictionCol("__pred").setRawPredictionCol("__raw")
      .setProbabilityCol("__prob")
      .transform(featurize(docs, textCol, model.dim))
      .withColumn("quality_prob",
        round(element_at(
          org.apache.spark.ml.functions.vector_to_array(col("__prob")), 2), 6))
      .drop("features", "__pred", "__raw", "__prob")

  /** held-out ROC AUC (MLlib evaluator over the P(1) score) — the spec
    * gate */
  /** Isotonic (PAV) probability calibration (Ayer et al. 1955; Zadrozny
    * & Elkan 2002) — the monotone recalibration step between a quality
    * scorer and a THRESHOLD: a classifier's raw scores rank well but
    * their values aren't probabilities, so "keep docs above 0.8" means
    * nothing until scores are calibrated against observed label rates.
    *
    * Distributed shape: scores bucket into `bins` equal-width bins
    * (ONE hash agg — the only data-sized stage), the bounded bin frame
    * collects to the driver where pool-adjacent-violators merges
    * neighbors until the label-rate sequence is monotone (count-
    * weighted means — the exact PAV solution on the binned data), and
    * the resulting step function broadcasts back as a map-side lookup
    * join. Deterministic AND oracle-able: pools carry exact (Σlabel, n)
    * sums and compare by cross-multiplication, so every pooled rate is
    * ONE correctly-rounded division of exact sums — identical to the
    * minimax form max_{j≤i} min_{k≥i} Σy/Σn a SQL engine replays
    * (Barlow et al. 1972's isotonic-regression identity); no float
    * accumulation order to disagree on. NULL scores contribute nothing
    * to the fit and calibrate to NULL (the [[calibrationReport]]
    * posture); empty/all-NULL input returns NULL calibrated.
    *
    * Returns df + `calibrated` ∈ [0,1], monotone in `scoreCol`. */
  def isotonicCalibrate(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 100): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.filter(col(scoreCol).isNotNull)
    val stats = base.agg(min(col(scoreCol).cast("double")).as("lo"),
      max(col(scoreCol).cast("double")).as("hi")).head()
    if (stats.isNullAt(0))
      return df.withColumn("calibrated", lit(null).cast("double"))
    val (lo, hi) = (stats.getDouble(0), stats.getDouble(1))
    val width = math.max((hi - lo) / bins, 1e-12)
    def binOf = least(greatest(
      floor((col(scoreCol).cast("double") - lo) / width), lit(0)),
      lit(bins - 1)).cast("int")
    val binned = base.groupBy(binOf.as("__bin"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("double")).as("ysum"))
      .orderBy(col("__bin"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    // PAV: merge adjacent pools while a violation (rate decrease) exists;
    // the violation test cross-multiplies exact sums — no pooled-mean
    // rounding can reorder it
    final case class Pool(minBin: Int, maxBin: Int, n: Long, ysum: Double)
    val pools = scala.collection.mutable.ArrayBuffer[Pool]()
    binned.foreach { case (b, n, y) =>
      pools += Pool(b, b, n, y)
      while (pools.length >= 2 && {
          val l = pools(pools.length - 2); val r = pools.last
          l.ysum * r.n > r.ysum * l.n }) {
        val right = pools.remove(pools.length - 1)
        val left = pools.remove(pools.length - 1)
        pools += Pool(left.minBin, right.maxBin,
          left.n + right.n, left.ysum + right.ysum)
      }
    }
    val lookup = pools.flatMap(p =>
      (p.minBin to p.maxBin).map(b => (b, p.ysum / p.n))).toSeq
      .toDF("__bin", "calibrated")
    df.withColumn("__bin", binOf)
      .join(broadcast(lookup), Seq("__bin"), "left")
      .withColumn("calibrated", round(col("calibrated"), 6))
      .drop("__bin")
  }

  /** Exact tie-corrected ROC AUC from mid-ranks (the Mann-Whitney
    * identity AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺n⁻)) — the evaluation
    * number behind every "is this quality filter any good" decision,
    * as a DataFrame op with a FULL SQL oracle (the MLlib-based [[auc]]
    * gate has none).
    *
    * Mid-ranks need a GLOBAL cumulative count over the distinct-score
    * frame, which is computed the funnel-free ksGaps way: collapse to
    * (score, pos, total) counts, range-repartition by score, and add
    * each partition's driver-prefix-summed start offset to a
    * PARTITION-local cumulative window — no unpartitioned window
    * anywhere (PlanSpec's global gate), so the op scales to
    * corpus-sized score columns, not just bounded eval sets.
    * Returns one row `(n_pos, n_neg, auc)` (6dp). */
  def aucExact(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perV = df
      .select(col(scoreCol).cast("double").as("s"),
        col(labelCol).cast("long").as("y"))
      .filter(col("s").isNotNull && col("y").isNotNull)
      .groupBy(col("s"))
      .agg(sum(col("y")).as("p"), count(lit(1)).as("t"))
    val parts = perV.repartitionByRange(col("s"))
      .sortWithinPartitions(col("s"))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val totals = parts.groupBy(col("__pid")).agg(sum(col("t")).as("__pt"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val offRows = {
        var acc = 0L
        totals.map { case (pid, pt) => val r = (pid, acc); acc += pt; r }.toSeq
      }
      val spark0 = df.sparkSession
      import spark0.implicits._
      val offs = offRows.toDF("__pid", "__off")
      val wc = Window.partitionBy(col("__pid")).orderBy(col("s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val midRank = (col("__off") + sum(col("t")).over(wc)).cast("double") -
        (col("t").cast("double") - 1.0) / 2.0
      parts.join(broadcast(offs), "__pid")
        .withColumn("__mr", midRank)
        .agg(sum(col("p")).as("n_pos"),
          (sum(col("t")) - sum(col("p"))).as("n_neg"),
          sum(col("__mr") * col("p")).as("__rsum"))
        .select(col("n_pos"), col("n_neg"),
          round((col("__rsum") - col("n_pos").cast("double") *
            (col("n_pos") + 1.0) / 2.0) /
            (col("n_pos").cast("double") * col("n_neg")), 6).as("auc"))
        .localCheckpoint() // 1-row result; release the parts cache eagerly
    } finally { parts.unpersist(false); () }
  }

  /** Reliability table + expected calibration error (Naeini et al.
    * 2015's ECE on equal-width bins): per score bin, the mean
    * predicted probability (confidence) vs the observed label rate
    * (accuracy) and the bin's |gap|; the SAME weighted |gap| summed
    * over bins is ECE — the one number that says whether
    * [[isotonicCalibrate]] is needed. One hash agg over the bin key;
    * FULL oracle. Returns per-bin rows
    * `(bin, n, confidence, accuracy, gap, ece_term)`. */
  def calibrationReport(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val s = col(scoreCol).cast("double")
    val b = least(greatest(floor(s * bins), lit(0)), lit(bins - 1)).cast("int")
    val g = df.filter(s.isNotNull)
      .groupBy(b.as("bin"))
      .agg(count(lit(1)).as("n"), avg(s).as("__conf"),
        avg(col(labelCol).cast("double")).as("__acc"))
    val tot = g.agg(sum(col("n")).cast("double").as("__nt"))
    g.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"),
        round(col("__conf"), 6).as("confidence"),
        round(col("__acc"), 6).as("accuracy"),
        round(abs(col("__acc") - col("__conf")), 6).as("gap"),
        round(col("n") / col("__nt") * abs(col("__acc") - col("__conf")), 6)
          .as("ece_term"))
  }

  /** Unbiased pass@k (Chen et al. 2021, Codex eq. 1) — THE reporting
    * number for sampled generation evals: per task with n attempts and
    * c successes, pass@k = 1 − C(n−c, k)/C(n, k), computed stably as
    * 1 − Π_{i=0}^{k−1} (n−c−i)/(n−i) (never a factorial overflow).
    * Estimator is unbiased for P(≥1 success in k draws without
    * replacement); n−c < k short-circuits to 1 exactly.
    *
    * ONE task-keyed hash agg is the data-sized stage; the product is a
    * bounded in-plan fold (same left-to-right order as SQL's
    * list_reduce — FULL oracle). Tasks with n < k drop: the estimator
    * is undefined there, and silently clamping k would overstate.
    * Returns (task, n, c, pass_at_k), 6dp. */
  def passAtK(df: DataFrame, taskCol: String, successCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val perTask = df.groupBy(col(taskCol))
      .agg(count(lit(1)).as("n"),
        sum(col(successCol).cast("long")).as("c"))
      .filter(col("n") >= k)
    val prod = aggregate(sequence(lit(0), lit(k - 1)), lit(1.0),
      (acc, i) => acc *
        (col("n") - col("c") - i).cast("double") / (col("n") - i).cast("double"))
    perTask.withColumn("pass_at_k",
      round(when(col("n") - col("c") < k, 1.0).otherwise(lit(1.0) - prod), 6))
  }

  def auc(model: Model, labeled: DataFrame, textCol: String,
      labelCol: String): Double = {
    val scored = score(model,
      labeled.withColumn("label", col(labelCol).cast("double")), textCol)
    new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
      .setRawPredictionCol("quality_prob").setLabelCol("label")
      .evaluate(scored)
  }
}
