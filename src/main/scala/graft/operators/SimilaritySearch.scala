package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import graft.functions.gf

/** Similarity search over an embedding column (SURVEY.md §2.9; reference
  * top-k routing `cpp/query_core/top_k_search_info.hpp:17`,
  * `cpp/deeplake_pg/index_search.cpp:114-133`).
  *
  * Brute force is the exact baseline (reference: linear scan when no index
  * holder answers). The scale path (`cpp/query_core/search_config.hpp`
  * Clustered index analog) is [[graft.operators.AnnIndex]].
  *
  * Scale design: queries are broadcast (a query set is small by
  * definition); the corpus is never shuffled in full. Top-k runs in two
  * phases — a per-input-partition local top-k (window over
  * (query, spark_partition_id), each partition holds only its own rows)
  * followed by a global top-k over the k×numPartitions survivors. No
  * single reducer ever sees the whole corpus.
  */
object SimilaritySearch {

  /** Exact top-k neighbors for each query row.
    *
    * @param corpus   (id, embedding) rows — arbitrarily large
    * @param queries  (qid, embedding) rows — small, broadcastable
    * @param score    similarity column builder, higher = closer
    *                 (e.g. gf.cosine_similarity); pass a distance with
    *                 `ascending = true` for metric search
    * @return (qid, id, score, rank) with rank 1..k per qid
    */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int,
      score: (Column, Column) => Column = gf.cosine_similarity(_, _),
      ascending: Boolean = false): DataFrame = {
    val q = broadcast(queries.select(col(queryId).as("qid"), col(queryVec).as("q_vec")))
    val scored = corpus
      .select(col(corpusId).as("id"), col(corpusVec).as("c_vec"))
      .crossJoin(q)
      .select(col("qid"), col("id"), score(col("c_vec"), col("q_vec")).as("score"))
    val ord = if (ascending) Seq(col("score").asc, col("id").asc)
              else Seq(col("score").desc, col("id").asc)
    // phase 1: local top-k inside each input partition — no corpus shuffle
    val local = scored
      .withColumn("p", spark_partition_id())
      .withColumn("lr", row_number().over(
        Window.partitionBy(col("qid"), col("p")).orderBy(ord: _*)))
      .filter(col("lr") <= k)
      .drop("p", "lr")
    // phase 2: global top-k over the small survivor set
    local
      .withColumn("rank", row_number().over(Window.partitionBy(col("qid")).orderBy(ord: _*)))
      .filter(col("rank") <= k)
  }

  /** Hard-negative mining for contrastive training (the DPR/Contriever
    * practice, public): for each anchor row, the top-k most-similar
    * corpus vectors carrying a DIFFERENT label — the "close but wrong"
    * examples a bi-encoder learns the most from. Same scale shape as
    * [[bruteForceTopK]]: anchors broadcast, label mismatch filtered
    * map-side inside the scoring projection, per-partition local top-k
    * then global top-k over survivors — the corpus is never shuffled.
    * Scores round to 6dp BEFORE ranking so the ranking is stable across
    * float-summation orders. Returns `(qid, id, hn_sim, rank)`. */
  def hardNegatives(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, anchorPred: Column, k: Int): DataFrame = {
    val anchors = broadcast(df.filter(anchorPred)
      .select(col(idCol).as("qid"), col(vecCol).as("q_vec"),
        col(labelCol).as("q_label")))
    val scored = df
      .select(col(idCol).as("id"), col(vecCol).as("c_vec"),
        col(labelCol).as("c_label"))
      .crossJoin(anchors)
      .filter(col("c_label") =!= col("q_label"))
      .select(col("qid"), col("id"),
        round(gf.cosine_similarity(col("c_vec"), col("q_vec")), 6).as("hn_sim"))
    val ord = Seq(col("hn_sim").desc, col("id").asc)
    val local = scored
      .withColumn("p", spark_partition_id())
      .withColumn("lr", row_number().over(
        Window.partitionBy(col("qid"), col("p")).orderBy(ord: _*)))
      .filter(col("lr") <= k)
      .drop("p", "lr")
    local
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(ord: _*)))
      .filter(col("rank") <= k)
  }

  /** Ranking-agreement audit between two top-k result sets of the SAME
    * queries — the retrieval-quality monitor (does the cheap index /
    * truncated embedding / new scorer still return what the expensive
    * one does?). Per query: `(qid, n_a, n_b, n_common, overlap_at_k,
    * jaccard, top1_match)`.
    *
    * Plan shape: both inputs are result-set artifacts (≤ queries × k
    * rows), so the full join and per-query agg are bounded by
    * construction — nothing here touches a corpus. */
  def rankingAgreement(a: DataFrame, b: DataFrame, qCol: String,
      idCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val an = a.select(col(qCol).as("qid"), col(idCol).as("id"),
      col(rankCol).as("rank_a"))
    val bn = b.select(col(qCol).as("qid"), col(idCol).as("id"),
      col(rankCol).as("rank_b"))
    an.join(bn, Seq("qid", "id"), "full")
      .groupBy(col("qid"))
      .agg(
        count(col("rank_a")).as("n_a"),
        count(col("rank_b")).as("n_b"),
        sum(when(col("rank_a").isNotNull && col("rank_b").isNotNull, 1)
          .otherwise(0)).as("n_common"),
        max(when(col("rank_a") === 1 && col("rank_b") === 1, 1)
          .otherwise(0)).as("top1_match"))
      .select(col("qid"), col("n_a"), col("n_b"), col("n_common"),
        round(col("n_common").cast("double") / k, 6).as("overlap_at_k"),
        round(col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")), 6).as("jaccard"),
        col("top1_match"))
  }
}
