package graft.operators

import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space transforms for curation pipelines. PCA reduction is
  * the standard pre-step before clustering / SemDeDup at scale (SemDeDup
  * itself operates on dimensionality-reduced embeddings): cut a 768-d
  * column to 32-128 dims once, then every downstream pairwise kernel
  * costs proportionally less.
  *
  * Scale shape: the covariance accumulates via treeAggregate (d x d
  * driver matrix — bounded by embedding WIDTH, never row count); the
  * fitted projection matrix broadcasts and the transform is one
  * map-side matrix-vector multiply per row. No shuffles anywhere.
  */
object EmbeddingOps {

  final case class PcaModel(model: org.apache.spark.ml.feature.PCAModel) {
    /** fraction of variance captured per component (descending) */
    def explainedVariance: Array[Double] = model.explainedVariance.toArray
    /** project `emb`'s vector column to the fitted k dims (map-side) */
    def transform(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
      model.transform(prep(emb, idCol, vecCol))
        .select(col("id").as(idCol),
          vector_to_array(col("__pca"), "float32").as(s"${vecCol}_pca"))
  }

  private def prep(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("id"),
      array_to_vector(col(vecCol).cast("array<double>")).as("__features"))

  /** Fit a k-component PCA on the embedding column. Deterministic given
    * the data (dense eigendecomposition of the Gramian) up to component
    * SIGN — norms, distances, and explained variance are sign-invariant
    * and fully stable. */
  def fitPca(emb: DataFrame, idCol: String, vecCol: String, k: Int): PcaModel = {
    require(k > 0, "k must be positive")
    PcaModel(new PCA().setInputCol("__features").setOutputCol("__pca")
      .setK(k).fit(prep(emb, idCol, vecCol)))
  }

  /** fit + transform in one call */
  def pcaReduce(emb: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame =
    fitPca(emb, idCol, vecCol, k).transform(emb, idCol, vecCol)

  /** Per-label element-wise mean vectors (class centroids — prototype
    * classifiers, per-class drift monitoring, cluster seeding).
    * MLlib's Summarizer is the aggregation: a FIXED-WIDTH d-double
    * buffer per label with map-side combine — the n×d explode a naive
    * (label, dim) aggregation would shuffle never exists. Returns
    * (label, centroid, n). */
  def labelCentroids(emb: DataFrame, labelCol: String,
      vecCol: String): DataFrame = {
    import org.apache.spark.ml.stat.Summarizer
    emb.select(col(labelCol).as("label"),
        array_to_vector(col(vecCol).cast("array<double>")).as("__v"))
      .groupBy(col("label"))
      .agg(Summarizer.mean(col("__v")).as("__m"), count(lit(1)).as("n"))
      .select(col("label"), vector_to_array(col("__m")).as("centroid"), col("n"))
  }

  /** Label-outlier scores (the cleanlab-style mislabeled-sample QA
    * check, public method — Northcutt et al. 2021 frame label noise
    * detection via per-class statistics): each sample's L2 distance to
    * its OWN label's centroid, z-scored within the label. A large z
    * means the sample sits far from its class — a mislabel, an
    * ambiguous sample, or genuine class spread worth auditing before
    * training.
    *
    * Scale shape: centroids are one fixed-width Summarizer agg (k×d,
    * broadcast back), distance is map-side array math, per-label
    * (μ, σ) is a k-row agg broadcast back — two tiny broadcasts, zero
    * data-sized shuffles beyond the centroid agg itself.
    * Returns (id, label, dist, z). */
  def labelOutliers(emb: DataFrame, idCol: String, labelCol: String,
      vecCol: String): DataFrame = {
    val cents = labelCentroids(emb, labelCol, vecCol)
      .select(col("label"), col("centroid"))
    val dists = emb.select(col(idCol).as("id"), col(labelCol).as("label"),
        col(vecCol).cast("array<double>").as("__e"))
      .join(broadcast(cents), "label")
      .select(col("id"), col("label"),
        sqrt(aggregate(
          zip_with(col("__e"), col("centroid"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x)).as("dist"))
    val stats = dists.groupBy(col("label"))
      .agg(avg(col("dist")).as("__mu"), stddev_samp(col("dist")).as("__sigma"))
    dists.join(broadcast(stats), "label")
      .select(col("id"), col("label"), col("dist"),
        ((col("dist") - col("__mu")) / col("__sigma")).as("z"))
  }

  /** Matryoshka truncation (Kusupati et al. 2022): keep the first
    * `dims` components and L2-renormalize — the storage/latency lever
    * of MRL-trained embeddings (search the short prefix, rerank with
    * the full vector). Map-side only; a zero prefix degrades to NULL
    * rather than dividing by zero. Cosine ranking over the output is
    * identical with or without the renorm (scale invariance), so the
    * renorm exists for the dot-product consumers. */
  def matryoshka(emb: DataFrame, vecCol: String, dims: Int,
      outCol: String = "vec_trunc"): DataFrame = {
    require(dims >= 1, "dims must be >= 1")
    val t = slice(col(vecCol).cast("array<double>"), 1, dims)
    val n = sqrt(aggregate(t, lit(0.0), (acc, x) => acc + x * x))
    emb.withColumn(outCol,
      when(n > 0, transform(t, x => x / n)))
  }
}
