package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.gf

/** Clustered ANN index (SURVEY.md §2.9) — the Spark analog of the
  * reference's `Clustered` embedding index (k-means centroids; search
  * scans the closest clusters only, then exact-reranks):
  * `cpp/query_core/search_config.hpp:18-161`,
  * `cpp/deeplake_pg/index_search.cpp:114-133`.
  *
  * Build is an MLlib KMeans batch job; the "index" is two DataFrames a
  * user persists as parquet: (cluster_id, centroid) — tiny, broadcastable
  * — and (id, cluster_id) assignments co-partitioned with the corpus.
  * Search prunes to the top-`nProbe` clusters per query (a broadcast
  * centroid scan, no shuffle), then exact-reranks candidates with the
  * codegen'd cosine kernel. Knobs mirror the reference: `accuracy_factor`
  * scales the rerank candidate pool, `cluster_search_accuracy_factor`
  * scales how many clusters are probed (default/high_accuracy/balanced/
  * fast presets in the reference map to these two numbers).
  */
object AnnIndex {

  /** reference search_config.hpp:30-100 analog */
  final case class SearchConfig(
      accuracyFactor: Int = 10,
      clusterSearchFactor: Double = 1.0)

  final case class Index(centroids: DataFrame, assignments: DataFrame, nClusters: Int)

  /** Build a clustered index. `buildMultiplier` scales k-means iterations
    * (reference index_build_config.build_multiplier, default 4). */
  def build(emb: DataFrame, idCol: String, vecCol: String,
      nClusters: Int, buildMultiplier: Int = 4, seed: Long = 42L): Index = {
    val feat = emb.select(col(idCol).as("id"),
      col(vecCol).as("vec"),
      array_to_vector(transform(col(vecCol), _.cast("double"))).as("features"))
    val model = new KMeans()
      .setK(nClusters).setSeed(seed).setMaxIter(5 * buildMultiplier)
      .fit(feat)
    val assignments = model.transform(feat)
      .select(col("id"), col("vec"), col("prediction").as("cluster_id"))
    val spark = emb.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("cluster_id", "centroid")
    Index(centroids, assignments, nClusters)
  }

  /** Top-k approximate neighbors per query via cluster pruning + exact
    * rerank. Queries broadcast; corpus touched only in probed clusters. */
  def search(index: Index, queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, config: SearchConfig = SearchConfig()): DataFrame = {
    val nProbe = math.max(1, math.min(index.nClusters,
      math.ceil(math.sqrt(index.nClusters.toDouble) * config.clusterSearchFactor).toInt))
    val q = queries.select(col(qIdCol).as("qid"), col(qVecCol).as("q_vec"))
    // rank clusters per query over the broadcast centroid table
    val probed = q.crossJoin(broadcast(index.centroids))
      .withColumn("c_rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(gf.cosine_similarity(col("q_vec"), col("centroid")).desc,
            col("cluster_id"))))
      .filter(col("c_rank") <= nProbe)
      .select(col("qid"), col("q_vec"), col("cluster_id"))
    // candidates = corpus rows in probed clusters; exact rerank
    val rerankPool = k * math.max(1, config.accuracyFactor)
    val scored = probed.join(index.assignments, "cluster_id")
      .select(col("qid"), col("id"),
        gf.cosine_similarity(col("vec"), col("q_vec")).as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= math.min(k, rerankPool))
  }

  /** exact-vs-ann recall@k (quality gate analog of the reference's
    * test_embedding_quality.py) */
  def recallAtK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, config: SearchConfig = SearchConfig(),
      nClusters: Int = 16): Double = {
    val exact = SimilaritySearch.bruteForceTopK(
        corpus, idCol, vecCol, queries, idCol, vecCol, k)
      .select(col("qid"), col("id"))
    val idx = build(corpus, idCol, vecCol, nClusters)
    val approx = search(idx, queries, idCol, vecCol, k, config)
      .select(col("qid"), col("id"))
    val hits = exact.intersect(approx).count().toDouble
    hits / exact.count().toDouble
  }
}
