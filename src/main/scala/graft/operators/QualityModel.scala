package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.sql.DataFrame
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

  private def featurize(docs: DataFrame, textCol: String, dim: Int): DataFrame =
    new HashingTF().setInputCol("__toks").setOutputCol("features")
      .setNumFeatures(dim).setBinary(true)
      .transform(docs.withColumn("__toks", TextAnalysis.tokens(col(textCol))))
      .drop("__toks")

  /** Train on (textCol, labelCol∈{0,1}) rows. */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
      dim: Int = 1 << 14, maxIter: Int = 30, regParam: Double = 1e-4): Model = {
    val feat = featurize(
      labeled.withColumn("label", col(labelCol).cast("double")), textCol, dim)
    Model(new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .fit(feat), dim)
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
  def auc(model: Model, labeled: DataFrame, textCol: String,
      labelCol: String): Double = {
    val scored = score(model,
      labeled.withColumn("label", col(labelCol).cast("double")), textCol)
    new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
      .setRawPredictionCol("quality_prob").setLabelCol("label")
      .evaluate(scored)
  }
}
