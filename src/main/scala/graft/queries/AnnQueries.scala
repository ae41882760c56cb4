package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.AnnIndex

/** Clustered-ANN search surface (approximate — no SQL oracle; quality is
  * gated by the recall spec in AnnSpec, mirroring the reference's
  * test_embedding_quality.py minimum-pass-count gate).
  */
object AnnQueries extends QueryModule {

  override def qs: Seq[(String, Q)] = Seq(
    "q_vec_ann_topk" -> Q(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val idx = AnnIndex.build(e, "vec_id", "embedding", nClusters = 16)
        val queries = e.filter(col("vec_id") < 5)
        AnnIndex.search(idx, queries, "vec_id", "embedding", k = 10)
          .select(col("qid"), col("rank"), col("id").as("neighbor_id"),
            round(col("score"), 6).as("cos_sim"))
          .orderBy(col("qid"), col("rank"))
      },
      None,
      doc = "KMeans-clustered ANN: probe sqrt(n_clusters) clusters, exact rerank"),

    "q_vec_ann_high_accuracy" -> Q(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val idx = AnnIndex.build(e, "vec_id", "embedding", nClusters = 16)
        val queries = e.filter(col("vec_id") < 3)
        AnnIndex.search(idx, queries, "vec_id", "embedding", k = 10,
            AnnIndex.SearchConfig(accuracyFactor = 20, clusterSearchFactor = 8.0))
          .select(col("qid"), col("rank"), col("id").as("neighbor_id"),
            round(col("score"), 6).as("cos_sim"))
          .orderBy(col("qid"), col("rank"))
      },
      None,
      doc = "high_accuracy preset (factor 20, clusters x8) = exhaustive probe")
  )
}
