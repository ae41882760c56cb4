package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, IndexStore}

/** Clustered-ANN search surface (approximate — no SQL oracle; quality is
  * gated by the recall spec in AnnSpec, mirroring the reference's
  * test_embedding_quality.py minimum-pass-count gate).
  *
  * All three queries search a PERSISTED index from [[IndexStore]] — the
  * KMeans build runs once per dataset (Bench bills it to warm-up), so
  * the measured time is the probe + rerank, matching what the
  * reference's index-search numbers measure
  * (`cpp/deeplake_pg/index_search.cpp:114-133`).
  */
object AnnQueries extends QueryModule {

  override def qs: Seq[(String, Q)] = Seq(
    // FULL oracle (r13 verdict #4): the oracle reads the SAME artifact
    // parquet (centroids + cluster assignments) the engine serves from
    // and replays the route itself — probe the top-4 clusters per query
    // (cosine desc, cluster_id tiebreak; nProbe = ceil(sqrt(16))), score
    // probed candidates exactly, top-10 per query. The ANN ROUTING is
    // thereby oracle-checked, not just recall-gated.
    "q_vec_ann_topk" -> Q(
      (s, dir) => {
        val idx = IndexStore.ann(s, dir)
        val queries = table(s, dir, "embeddings").filter(col("vec_id") < 5)
        AnnIndex.search(idx, queries, "vec_id", "embedding", k = 10)
          .select(col("qid"), col("rank"), col("id").as("neighbor_id"),
            round(col("score"), 6).as("cos_sim"))
          .orderBy(col("qid"), col("rank"))
      },
      Some("""WITH c AS (SELECT cluster_id, centroid::DOUBLE[] AS cv
             |  FROM read_parquet('__ANN_ARTIFACT__/centroids/*.parquet')),
             |a AS (SELECT id, cluster_id, vec::DOUBLE[] AS v
             |  FROM read_parquet('__ANN_ARTIFACT__/assignments/**/*.parquet')),
             |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
             |pr AS (SELECT qid, qv, cluster_id FROM (
             |  SELECT q.qid, q.qv, c.cluster_id, row_number() OVER (PARTITION BY q.qid
             |    ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cluster_id) AS cr
             |  FROM q CROSS JOIN c) t WHERE cr <= 4),
             |sc AS (SELECT pr.qid, a.id, list_cosine_similarity(a.v, pr.qv) AS score
             |  FROM pr JOIN a USING (cluster_id)),
             |r AS (SELECT qid, id, score, row_number() OVER
             |  (PARTITION BY qid ORDER BY score DESC, id) AS rank FROM sc)
             |SELECT qid, rank::INT AS rank, id AS neighbor_id,
             |round(score, 6) AS cos_sim FROM r WHERE rank <= 10
             |ORDER BY qid, rank""".stripMargin.replace('\n', ' ')),
      doc = "KMeans-clustered ANN: probe sqrt(n_clusters) clusters, exact rerank (oracle replays the route over the artifact)"),

    "q_vec_ann_quantized" -> Q(
      (s, dir) => {
        val idx = IndexStore.annQuantized(s, dir)
        val queries = table(s, dir, "embeddings").filter(col("vec_id") < 5)
        AnnIndex.search(idx, queries, "vec_id", "embedding", k = 10)
          .select(col("qid"), col("rank"), col("id").as("neighbor_id"),
            round(col("score"), 6).as("cos_sim"))
          .orderBy(col("qid"), col("rank"))
      },
      None,
      doc = "ClusteredQuantized: int8 candidate scan gates the exact rerank pool"),

    // the SAME fast path reached from TQL text: ORDER BY
    // COSINE_SIMILARITY(col, const) DESC LIMIT k over a table whose
    // embedding column is registered in AnnIndex.Catalog routes to the
    // index (check_for_top_k_binary_function_search, `cpp/tql/tql.hpp:171`)
    "q_tql_ann_topk" -> Q(
      (s, dir) => {
        AnnIndex.Catalog.register("embeddings", "embedding", "vec_id",
          IndexStore.ann(s, dir))
        val qv = table(s, dir, "embeddings").filter(col("vec_id") === 0)
          .select(col("embedding")).collect()(0).getSeq[Float](0)
        val arr = qv.mkString("ARRAY[", ", ", "]")
        graft.dialect.Tql.query(s, dir,
          s"""SELECT vec_id, ROUND(COSINE_SIMILARITY(embedding, $arr), 6) AS score
             |FROM embeddings ORDER BY score DESC, vec_id LIMIT 10""".stripMargin)
      },
      None,
      doc = "dialect-routed indexed top-k: broadcast candidate semi-join, no full-corpus ranking"),

    // L2 ascending top-k routes to the SAME index (reference
    // `ORDER BY L2_NORM(emb - ARRAY[...]) ASC`, order_type::ascending)
    "q_tql_ann_l2" -> Q(
      (s, dir) => {
        AnnIndex.Catalog.register("embeddings", "embedding", "vec_id",
          IndexStore.ann(s, dir))
        val qv = table(s, dir, "embeddings").filter(col("vec_id") === 0)
          .select(col("embedding")).collect()(0).getSeq[Float](0)
        val arr = qv.mkString("ARRAY[", ", ", "]")
        graft.dialect.Tql.query(s, dir,
          s"""SELECT vec_id, ROUND(L2_NORM(embedding - $arr), 6) AS dist
             |FROM embeddings ORDER BY dist ASC, vec_id LIMIT 10""".stripMargin)
      },
      None,
      doc = "dialect-routed L2 ascending indexed top-k (reference order_type::ascending)"),

    // MIPS arm of the same route: ORDER BY DOT(col, const) DESC LIMIT k
    // probes clusters by q·centroid (the faiss IVF/METRIC_INNER_PRODUCT
    // coarse-probe posture) and exact-scores probed candidates
    "q_tql_ann_dot" -> Q(
      (s, dir) => {
        AnnIndex.Catalog.register("embeddings", "embedding", "vec_id",
          IndexStore.ann(s, dir))
        val qv = table(s, dir, "embeddings").filter(col("vec_id") === 0)
          .select(col("embedding")).collect()(0).getSeq[Float](0)
        val arr = qv.mkString("ARRAY[", ", ", "]")
        graft.dialect.Tql.query(s, dir,
          s"""SELECT vec_id, ROUND(DOT(embedding, $arr), 6) AS ip
             |FROM embeddings ORDER BY ip DESC, vec_id LIMIT 10""".stripMargin)
      },
      None,
      doc = "dialect-routed MIPS top-k: DOT DESC probes clusters by q·centroid"),

    // WHERE composes into the index search as a candidate pre-filter
    // (reference runs index queries against a filter bitmap,
    // `cpp/query_core/index_holder.hpp:33`): only filter survivors are
    // candidates, and the probe widens adaptively when the filter
    // starves a cluster
    "q_tql_ann_filtered" -> Q(
      (s, dir) => {
        AnnIndex.Catalog.register("embeddings", "embedding", "vec_id",
          IndexStore.ann(s, dir))
        val qv = table(s, dir, "embeddings").filter(col("vec_id") === 0)
          .select(col("embedding")).collect()(0).getSeq[Float](0)
        val arr = qv.mkString("ARRAY[", ", ", "]")
        graft.dialect.Tql.query(s, dir,
          s"""SELECT vec_id, ROUND(COSINE_SIMILARITY(embedding, $arr), 6) AS score
             |FROM embeddings WHERE vec_id % 5 == 0
             |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin)
      },
      None,
      doc = "filtered indexed top-k: WHERE gates the index probe, nProbe widens adaptively"),

    "q_vec_ann_pq" -> Q(
      (s, dir) => {
        val idx = IndexStore.annPq(s, dir)
        val queries = table(s, dir, "embeddings").filter(col("vec_id") < 5)
        AnnIndex.searchPq(idx, queries, "vec_id", "embedding", k = 10)
          .select(col("qid"), col("rank"), col("id").as("neighbor_id"),
            round(col("score"), 6).as("cos_sim"))
          .orderBy(col("qid"), col("rank"))
      },
      None,
      doc = "IVF-PQ: per-query ADC lookup tables score m-byte codes, exact rerank on survivors"),

    // PQ arm of the same dialect route: with only a PQ index registered
    // for the column, ORDER BY COSINE_SIMILARITY ... LIMIT k (plus a
    // WHERE pre-filter) searches the PQ artifact
    "q_tql_ann_pq" -> Q(
      (s, dir) => {
        AnnIndex.Catalog.clear()
        AnnIndex.Catalog.registerPq("embeddings", "embedding", "vec_id",
          IndexStore.annPq(s, dir))
        val qv = table(s, dir, "embeddings").filter(col("vec_id") === 0)
          .select(col("embedding")).collect()(0).getSeq[Float](0)
        val arr = qv.mkString("ARRAY[", ", ", "]")
        try graft.dialect.Tql.query(s, dir,
          s"""SELECT vec_id, ROUND(COSINE_SIMILARITY(embedding, $arr), 6) AS score
             |FROM embeddings WHERE vec_id % 2 == 0
             |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin)
        finally AnnIndex.Catalog.clear()
      },
      None,
      doc = "dialect-routed IVF-PQ top-k with WHERE pre-filter (ADC scan, exact rerank)"),

    "q_vec_ann_high_accuracy" -> Q(
      (s, dir) => {
        val idx = IndexStore.annQuantized(s, dir)
        val queries = table(s, dir, "embeddings").filter(col("vec_id") < 3)
        AnnIndex.search(idx, queries, "vec_id", "embedding", k = 10,
            AnnIndex.SearchConfig(accuracyFactor = 20, clusterSearchFactor = 2.0))
          .select(col("qid"), col("rank"), col("id").as("neighbor_id"),
            round(col("score"), 6).as("cos_sim"))
          .orderBy(col("qid"), col("rank"))
      },
      None,
      doc = "high_accuracy preset: 2x clusters probed, 2x rerank pool on the quantized index"),

    // MAXSIM arm of the dialect route (the reference's ColPali story
    // pairs MAXSIM with the embedding index, docs/docs/guide/rag.md:
    // 1377-1413): embeddings fold into 8-vector "pages"; the registered
    // index holds each page's MEAN-POOLED vector; every query vector
    // probes it and exact MAXSIM reranks only the candidate union —
    // ORDER BY MAXSIM(...) DESC LIMIT k no longer scans the corpus.
    "q_tql_maxsim_routed" -> Q(
      (s, dir) => {
        AnnIndex.Catalog.clear()
        val bags = IndexStore.maxsimBagsPath(s, dir)
        AnnIndex.Catalog.register(bags, "bag", "page_id",
          IndexStore.maxsimAnn(s, dir))
        val qbag = table(s, dir, "embeddings").filter(col("vec_id") < 3)
          .orderBy(col("vec_id")).select(col("embedding")).collect()
          .map(_.getSeq[Float](0).mkString("ARRAY[", ", ", "]"))
          .mkString("ARRAY[", ", ", "]")
        try graft.dialect.Tql.query(s, dir,
          s"""SELECT page_id, ROUND(MAXSIM(bag, $qbag), 6) AS score
             |FROM "$bags" ORDER BY score DESC, page_id LIMIT 10""".stripMargin)
        finally AnnIndex.Catalog.clear()
      },
      None,
      doc = "dialect-routed MAXSIM top-k: pooled-vector index probe, exact multi-vector rerank")
  )
}
