package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.gf
import graft.operators.{Bm25, HybridSearch, IndexStore}

/** Text relevance + hybrid retrieval (SURVEY.md §2.9: BM25_SIMILARITY,
  * hybrid softmax fusion `cpp/deeplake_pg/hybrid_query_merge.hpp`).
  */
object SearchQueries extends QueryModule {

  private val terms = Seq("spark", "join", "fast")

  override def qs: Seq[(String, Q)] = Seq(

    // ---- BM25 relevance top-k (scored against the persisted index —
    // the corpus is never tokenized at query time)
    "q_bm25_topk" -> Q(
      (s, dir) => {
        Bm25.scoreWithIndex(IndexStore.bm25(s, dir), terms)
          .select(col("doc_id"), round(col("score"), 6).as("bm25"))
          .orderBy(col("bm25").desc, col("doc_id"))
          .limit(20)
      },
      Some(Bm25.oracleSql(terms, roundTo = 6, k = 20))),

    // ---- the SAME BM25 search reached from TQL text:
    // ORDER BY BM25_SIMILARITY(text, 'query') DESC LIMIT k routes
    // through the registered index (BM25 arm of
    // check_for_top_k_binary_function_search; index_search.cpp:135-169)
    "q_tql_bm25_topk" -> Q(
      (s, dir) => {
        Bm25.Catalog.register("documents", "text", "doc_id", IndexStore.bm25(s, dir))
        graft.dialect.Tql.query(s, dir,
          s"""SELECT doc_id, ROUND(BM25_SIMILARITY(text, '${terms.mkString(" ")}'), 6) AS bm25
             |FROM documents ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin)
      },
      Some(Bm25.oracleSql(terms, roundTo = 6, k = 20))),

    // ---- reciprocal-rank fusion: the calibration-free hybrid (RRF,
    // Cormack et al. 2009) — rank-only fusion of the same two scorers
    "q_hybrid_rrf" -> Q(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
        val vecScores = e.crossJoin(broadcast(qv))
          .select(col("vec_id").as("id"),
            gf.cosine_similarity(col("embedding"), col("qv")).as("score"))
        val textScores = Bm25.scoreWithIndex(IndexStore.bm25(s, dir), terms)
          .select(col("doc_id").as("id"), col("score"))
        HybridSearch.rrf(Seq(vecScores, textScores), n = 100, k = 60)
          .select(col("id"), col("n_lists"),
            round(col("rrf_score"), 6).as("rrf_score"))
          .orderBy(col("rrf_score").desc, col("id"))
          .limit(20)
      },
      Some {
        val bm25Post =
          """post AS (
            |  SELECT doc_id, len(string_split(text,' ')) AS dl, t.term, count(*) AS tf
            |  FROM documents, unnest(string_split(text,' ')) AS t(term)
            |  GROUP BY doc_id, dl, t.term),
            |stats AS (SELECT count(DISTINCT doc_id) AS n_docs,
            |          (SELECT avg(dl) FROM (SELECT DISTINCT doc_id, dl FROM post)) AS avgdl FROM post),
            |tdf AS (SELECT term, count(DISTINCT doc_id) AS df FROM post GROUP BY term),
            |ts AS (SELECT doc_id AS id, sum(
            |  ln(1.0 + (n_docs - df + 0.5)/(df + 0.5)) * (tf * 2.2) /
            |  (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))) AS score
            |  FROM post JOIN tdf USING(term) CROSS JOIN stats
            |  WHERE term IN ('spark','join','fast') GROUP BY doc_id)""".stripMargin
        s"""WITH vs AS (SELECT e.vec_id AS id,
           |  list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS score
           |  FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q),
           |$bm25Post,
           |vr AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rk
           |       FROM vs ORDER BY score DESC, id LIMIT 100),
           |tr AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rk
           |       FROM ts ORDER BY score DESC, id LIMIT 100),
           |u AS (SELECT id, rk FROM vr UNION ALL SELECT id, rk FROM tr)
           |SELECT id, count(*) AS n_lists, round(sum(1.0/(60 + rk)), 6) AS rrf_score
           |FROM u GROUP BY id
           |ORDER BY rrf_score DESC, id LIMIT 20""".stripMargin.replace('\n', ' ')
      },
      doc = "reciprocal-rank fusion of cosine + BM25 top-100 lists (k = 60)"),

    // ---- MMR diversification: greedy λ·rel − (1−λ)·max-sim re-rank
    // over the retrieval top-100 (bounded driver artifact; greedy is
    // inherently sequential). rel + pairwise sims are ENGINE-rounded to
    // 6dp before the greedy, so the DuckDB oracle replays the selection
    // bit-identically via 10 unrolled pick-CTEs (the PageRank posture)
    "q_search_mmr" -> Q(
      (s, dir) => {
        val norm = graft.operators.EmbeddingOps.matryoshka(
          table(s, dir, "embeddings"), "embedding", 4096, outCol = "nv")
        val qv = norm.filter(col("vec_id") === 0).select(col("nv").as("qv"))
        val cands = norm.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
          .select(col("vec_id").as("id"),
            round(gf.dot(col("nv"), col("qv")), 6).as("score"),
            col("nv").as("vec"))
        HybridSearch.mmr(cands, k = 10, lambda = 0.7, maxCandidates = 100,
            simDecimals = 6)
          .select(col("id"), col("mmr_rank"),
            round(col("mmr_score"), 6).as("mmr_score"))
          .orderBy(col("mmr_rank"))
      },
      Some {
        // replay the greedy: pick_i = argmax over unselected of
        // λ·rel − (1−λ)·max sim-to-selected, ties on id — 10 unrolled
        // steps, doubles matching the Scala arithmetic exactly
        // (0.7::DOUBLE and (1 - 0.7::DOUBLE) reproduce the binary64
        // lambda values; rel/sim arrive round()ed identically)
        val steps = (2 to 10).map { i =>
          s"""p$i AS MATERIALIZED (SELECT c.id, 0.7::DOUBLE * c.rel
             |    - (1 - 0.7::DOUBLE) * max(p.sim) AS s
             |  FROM cands c JOIN pairs p ON p.ai = c.id
             |    AND p.bi IN (SELECT id FROM sel${i - 1})
             |  WHERE c.id NOT IN (SELECT id FROM sel${i - 1})
             |  GROUP BY c.id, c.rel ORDER BY s DESC, c.id LIMIT 1),
             |sel$i AS MATERIALIZED (SELECT * FROM sel${i - 1}
             |  UNION ALL SELECT id, $i, s FROM p$i)""".stripMargin
        }.mkString(", ")
        s"""WITH nrm AS MATERIALIZED (SELECT vec_id,
           |  list_transform(v, x -> x / sqrt(list_sum(
           |    list_transform(v, y -> y * y)))) AS nv
           |  FROM (SELECT vec_id, (embedding::DOUBLE[])[1:4096] AS v
           |        FROM embeddings)),
           |cands AS MATERIALIZED (SELECT n.vec_id AS id,
           |    round(list_dot_product(n.nv, q.nv), 6) AS rel, n.nv
           |  FROM nrm n, (SELECT nv FROM nrm WHERE vec_id = 0) q
           |  WHERE n.vec_id <> 0 ORDER BY rel DESC, id LIMIT 100),
           |pairs AS MATERIALIZED (SELECT a.id AS ai, b.id AS bi,
           |    round(list_dot_product(a.nv, b.nv), 6) AS sim
           |  FROM cands a, cands b WHERE a.id <> b.id),
           |p1 AS MATERIALIZED (SELECT id, 0.7::DOUBLE * rel AS s FROM cands
           |  ORDER BY s DESC, id LIMIT 1),
           |sel1 AS MATERIALIZED (SELECT id, 1 AS mmr_rank, s AS mmr_score FROM p1),
           |$steps
           |SELECT id, mmr_rank, round(mmr_score, 6) AS mmr_score
           |FROM sel10 ORDER BY mmr_rank""".stripMargin.replace('\n', ' ')
      },
      doc = "MMR-diversified top-10 over the cosine top-100; full-oracle replay"),

    // ---- hybrid search: cosine + BM25, softmax-fused 0.5/0.5
    "q_hybrid_search" -> Q(
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
        val vecScores = e.crossJoin(broadcast(qv))
          .select(col("vec_id").as("id"),
            gf.cosine_similarity(col("embedding"), col("qv")).as("score"))
        val textScores = Bm25.scoreWithIndex(IndexStore.bm25(s, dir), terms)
          .select(col("doc_id").as("id"), col("score"))
        HybridSearch.fuse(vecScores, textScores, alpha = 0.5)
          .select(col("id"), round(col("hybrid_score"), 6).as("hybrid_score"))
          .orderBy(col("hybrid_score").desc, col("id"))
          .limit(20)
      },
      Some {
        val bm25Post =
          """post AS (
            |  SELECT doc_id, len(string_split(text,' ')) AS dl, t.term, count(*) AS tf
            |  FROM documents, unnest(string_split(text,' ')) AS t(term)
            |  GROUP BY doc_id, dl, t.term),
            |stats AS (SELECT count(DISTINCT doc_id) AS n_docs,
            |          (SELECT avg(dl) FROM (SELECT DISTINCT doc_id, dl FROM post)) AS avgdl FROM post),
            |tdf AS (SELECT term, count(DISTINCT doc_id) AS df FROM post GROUP BY term),
            |ts AS (SELECT doc_id AS id, sum(
            |  ln(1.0 + (n_docs - df + 0.5)/(df + 0.5)) * (tf * 2.2) /
            |  (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))) AS score
            |  FROM post JOIN tdf USING(term) CROSS JOIN stats
            |  WHERE term IN ('spark','join','fast') GROUP BY doc_id)""".stripMargin
        s"""WITH vs AS (SELECT e.vec_id AS id,
           |  list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS score
           |  FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q),
           |vexp AS (SELECT id, exp(least(score - (SELECT max(score) FROM vs), 700)) AS e FROM vs),
           |vp AS (SELECT id, e / (SELECT sum(e) FROM vexp) AS p_vec FROM vexp),
           |$bm25Post,
           |texp AS (SELECT id, exp(least(score - (SELECT max(score) FROM ts), 700)) AS e FROM ts),
           |tp AS (SELECT id, e / (SELECT sum(e) FROM texp) AS p_text FROM texp)
           |SELECT coalesce(vp.id, tp.id) AS id,
           |round(coalesce(p_vec, 0)*0.5 + coalesce(p_text, 0)*0.5, 6) AS hybrid_score
           |FROM vp FULL JOIN tp ON vp.id = tp.id
           |ORDER BY hybrid_score DESC, id LIMIT 20""".stripMargin.replace('\n', ' ')
      }),

    // ---- retrieval-quality metrics (recall@k / precision@k / MRR /
    // NDCG@k) as a first-class operator — the RAG evaluation loop. The
    // run here is a supplier-recommendation ranking (suppliers by
    // pre-1999 purchase count per customer), judged against the
    // customer's actual post-1999 suppliers: integer ranks + ln
    // discount (the log base cancels in dcg/idcg), so the whole
    // evaluation replays in SQL. Judged queries missing from the run
    // score 0 — the honest "retrieval found nothing".
    "q_search_metrics" -> Q(
      (s, dir) => {
        val li = table(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        val o = table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
        val cut = lit("1999-01-01").cast("timestamp")
        val past = joined.filter(col("o_orderdate") < cut)
          .groupBy(col("o_custkey").as("custkey"), col("l_suppkey").as("suppkey"))
          .agg(count(lit(1)).as("c"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("custkey")).orderBy(col("c").desc, col("suppkey"))
        val run = past.withColumn("rank", row_number().over(w))
        val judged = joined.filter(col("o_orderdate") >= cut)
          .select(col("o_custkey").as("custkey"), col("l_suppkey").as("suppkey"))
        graft.operators.SearchMetrics.retrievalMetrics(
            run, "custkey", "suppkey", "rank", judged, "custkey", "suppkey", k = 10)
          .orderBy(col("custkey")).limit(200)
      },
      Some("""WITH j AS (SELECT o_custkey AS q, l_suppkey AS id, o_orderdate AS d
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |past AS (SELECT q, id, count(*) AS c FROM j
             |  WHERE d < TIMESTAMP '1999-01-01' GROUP BY 1, 2),
             |run AS (SELECT q, id,
             |  row_number() OVER (PARTITION BY q ORDER BY c DESC, id) AS r FROM past),
             |rel AS (SELECT DISTINCT q, id FROM j WHERE d >= TIMESTAMP '1999-01-01'),
             |nrel AS (SELECT q, count(*)::BIGINT AS n_relevant FROM rel GROUP BY 1),
             |tag AS (SELECT run.q, run.r,
             |  CASE WHEN rel.id IS NOT NULL THEN 1 ELSE 0 END AS h
             |  FROM run LEFT JOIN rel ON run.q = rel.q AND run.id = rel.id
             |  WHERE run.r <= 10),
             |pq AS (SELECT q, sum(h)::BIGINT AS hits,
             |  max(CASE WHEN h = 1 THEN 1.0/r END) AS mrr,
             |  sum(CASE WHEN h = 1 THEN 1.0/ln(r + 1.0) END) AS dcg
             |  FROM tag GROUP BY q),
             |m AS (SELECT nrel.q, nrel.n_relevant,
             |  coalesce(pq.hits, 0)::BIGINT AS hits,
             |  coalesce(pq.mrr, 0.0) AS mrr, coalesce(pq.dcg, 0.0) AS dcg,
             |  list_reduce(list_prepend(0.0,
             |    list_transform(range(1, least(nrel.n_relevant, 10) + 1),
             |      i -> 1.0/ln(i + 1.0))), (a, b) -> a + b) AS idcg
             |  FROM nrel LEFT JOIN pq USING (q))
             |SELECT q AS custkey, n_relevant, hits,
             |round(hits/10.0, 6) AS precision_at_k,
             |round(hits*1.0/n_relevant, 6) AS recall_at_k,
             |round(mrr, 6) AS mrr, round(dcg/idcg, 6) AS ndcg_at_k
             |FROM m ORDER BY custkey LIMIT 200""".stripMargin.replace('\n', ' ')),
      doc = "recall@10 / precision@10 / MRR / NDCG@10 of a supplier-recommendation run vs post-1999 judgments")
  )
}
