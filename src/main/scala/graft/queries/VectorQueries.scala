package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.gf
import graft.operators.SimilaritySearch

/** Vector similarity + array/tensor scalar surface (SURVEY.md §2.9/2.10)
  * over the `embeddings` table (64-dim float vectors, int label).
  *
  * Oracle parity note: DuckDB's native list functions accumulate FLOAT[]
  * in single precision; every oracle casts `embedding::DOUBLE[]` so both
  * engines fold in double, then results are round()ed on both sides.
  */
object VectorQueries extends QueryModule {

  private val E = "embeddings"

  override def qs: Seq[(String, Q)] = Seq(

    // ---- brute-force cosine top-k (ORDER BY score DESC LIMIT k; the
    // linear path of tql top_k_search_info)
    "q_vec_cosine_topk" -> Q(
      (s, dir) => {
        val e = table(s, dir, E)
        val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
        e.crossJoin(broadcast(q))
          .select(col("vec_id"),
            round(gf.cosine_similarity(col("embedding"), col("qv")), 6).as("cos_sim"))
          .orderBy(col("cos_sim").desc, col("vec_id"))
          .limit(10)
      },
      Some("""SELECT e.vec_id, round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]),6) AS cos_sim
             |FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
             |ORDER BY cos_sim DESC, e.vec_id LIMIT 10""".stripMargin.replace('\n', ' '))),

    // ---- greedy k-center coreset (farthest-first traversal): the
    // diversity-maximizing subset selection of active-learning /
    // data-selection pipelines. Fixed k unrolls the sequential greedy
    // into one CTE per step — FULL oracle, the q_graph_walks posture.
    "q_vec_kcenter" -> Q(
      (s, dir) => graft.operators.EmbeddingOps.kCenterGreedy(
          table(s, dir, E), "vec_id", "embedding", startId = 0L, k = 6)
        .orderBy(col("sel_rank")),
      Some(kCenterOracle(startId = 0L, k = 6)),
      doc = "greedy k-center selection over embeddings (unrolled-step oracle)"),

    // ---- k-means++ D² seeding (Arthur & Vassilvitskii 2007): each
    // next center samples ∝ squared min-distance via an exponential
    // race on the md5-fold uniform — deterministic, so the fixed k
    // unrolls into a FULL oracle (the probabilistic cousin of
    // q_vec_kcenter's farthest-first).
    "q_vec_kpp" -> Q(
      (s, dir) => graft.operators.EmbeddingOps.kMeansPlusPlusSeed(
          table(s, dir, E), "vec_id", "embedding", startId = 0L, k = 6,
          seed = "kpp42")
        .orderBy(col("sel_rank")),
      Some(kppOracle(startId = 0L, k = 6, seed = "kpp42")),
      doc = "k-means++ D² seeding over embeddings (exponential-race draw, unrolled-step oracle)"),

    // ---- spherical k-means Lloyd iterations (Dhillon & Modha 2001):
    // the topic-clustering pass over document embeddings. Distances
    // and centroid components both round to 6dp, so the fixed
    // iteration count unrolls into one assign+update CTE pair per
    // round — FULL oracle over every row's final assignment.
    "q_vec_kmeans" -> Q(
      (s, dir) => graft.operators.EmbeddingOps.kMeansLloyd(
          table(s, dir, E), "vec_id", "embedding",
          seedIds = Seq(0L, 1L, 2L, 3L), iters = 2)
        .orderBy(col("id")),
      Some(kmeansOracle(k = 4, iters = 2)),
      doc = "spherical k-means (2 Lloyd rounds, k=4) over embeddings; per-point final assignment (unrolled-iteration oracle)"),

    // ---- KNN-Shapley data valuation (Jia et al. 2019): the exact
    // Shapley value of every training vector under the KNN utility —
    // negative values flag mislabeled/poisoned rows. The closed-form
    // recursion is a suffix sum over neighbor ranks, so it runs as ONE
    // window frame per validation point and replays 1:1 in SQL (FULL
    // oracle); DedupSpec additionally gates it against an exhaustive
    // 2^N Shapley enumeration.
    "q_vec_knn_shapley" -> Q(
      (s, dir) => graft.operators.EmbeddingOps.knnShapley(
          table(s, dir, E), "vec_id", "embedding", "label",
          valPred = col("vec_id") % 10 === 0, k = 5)
        .orderBy(col("id")),
      Some("""WITH b AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v, label::BIGINT AS y FROM embeddings),
             |va AS (SELECT id AS vid, v AS vv, y AS vy FROM b WHERE id % 10 = 0),
             |tr AS (SELECT * FROM b WHERE id % 10 <> 0),
             |sim AS (SELECT va.vid, va.vy, tr.id, tr.y,
             |  round(list_cosine_similarity(tr.v, va.vv), 6) AS sim FROM tr, va),
             |rk AS (SELECT vid, vy, id, y, sim,
             |  row_number() OVER (PARTITION BY vid ORDER BY sim DESC, id) AS j,
             |  count(*) OVER (PARTITION BY vid) AS n,
             |  CASE WHEN y = vy THEN 1.0 ELSE 0.0 END AS i FROM sim),
             |t AS (SELECT vid, id, y, j, n, i,
             |  lead(i, 1) OVER (PARTITION BY vid ORDER BY j) AS i_next FROM rk),
             |u AS (SELECT vid, id, y, j, n, i,
             |  CASE WHEN j < n THEN (i - i_next)/5 * (least(5, j) * 1.0 / j)
             |  ELSE 0.0 END AS tt FROM t),
             |sfx AS (SELECT vid, id, y,
             |  sum(tt) OVER (PARTITION BY vid ORDER BY j
             |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             |  + last_value(i) OVER (PARTITION BY vid ORDER BY j
             |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) / n AS s FROM u)
             |SELECT id, y AS label, round(avg(s), 6) AS shapley
             |FROM sfx GROUP BY id, y ORDER BY id""".stripMargin.replace('\n', ' ')),
      doc = "exact KNN-Shapley data valuation over the embedding table (suffix-sum window form)"),

    // ---- hard-negative mining (DPR/Contriever practice): per anchor,
    // the top-5 most-similar OTHER-label vectors — anchors broadcast,
    // label filter map-side, two-phase top-k, corpus never shuffled
    "q_hard_negatives" -> Q(
      (s, dir) => graft.operators.SimilaritySearch.hardNegatives(
          table(s, dir, E), "vec_id", "embedding", "label",
          anchorPred = col("vec_id") < 5, k = 5)
        .orderBy(col("qid"), col("rank")),
      Some("""WITH a AS (SELECT vec_id AS qid, embedding AS qv, label AS ql
             |  FROM embeddings WHERE vec_id < 5),
             |sc AS (SELECT a.qid, e.vec_id AS id,
             |  round(list_cosine_similarity(e.embedding::DOUBLE[], a.qv::DOUBLE[]), 6)
             |    AS hn_sim
             |  FROM embeddings e JOIN a ON e.label <> a.ql),
             |rk AS (SELECT qid, id, hn_sim, row_number() OVER (
             |    PARTITION BY qid ORDER BY hn_sim DESC, id) AS rank FROM sc)
             |SELECT qid, id, hn_sim, rank FROM rk WHERE rank <= 5
             |ORDER BY qid, rank""".stripMargin.replace('\n', ' ')),
      doc = "top-5 other-label hard negatives per anchor (contrastive mining)"),

    // ---- Matryoshka prefix retrieval: cosine over the truncated+
    // renormalized 16-dim prefix (the MRL search-short/rerank-full
    // lever); renormed dot == prefix cosine by scale invariance
    "q_vec_truncate_topk" -> Q(
      (s, dir) => {
        val t = graft.operators.EmbeddingOps.matryoshka(
          table(s, dir, E), "embedding", 16)
        val q = t.filter(col("vec_id") === 0).select(col("vec_trunc").as("qv"))
        t.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
          .select(col("vec_id"),
            round(gf.dot(col("vec_trunc"), col("qv")), 6).as("cos_sim"))
          .orderBy(col("cos_sim").desc, col("vec_id"))
          .limit(20)
      },
      Some("""SELECT e.vec_id, round(list_cosine_similarity(
             |  e.embedding[1:16]::DOUBLE[], q.embedding[1:16]::DOUBLE[]), 6) AS cos_sim
             |FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
             |WHERE e.vec_id <> 0
             |ORDER BY cos_sim DESC, e.vec_id LIMIT 20""".stripMargin.replace('\n', ' ')),
      doc = "Matryoshka 16-dim prefix cosine retrieval (truncate + renormalize)"),

    // ---- retrieval-quality monitor: does 16-dim prefix retrieval
    // still return what full-dim retrieval does? Scores rounded to 6dp
    // BEFORE ranking on both engines for cross-engine rank stability
    "q_vec_rank_agreement" -> Q(
      (s, dir) => {
        val e = table(s, dir, E)
        val qs = e.filter(col("vec_id") < 10)
        val full = graft.operators.SimilaritySearch.bruteForceTopK(
          e, "vec_id", "embedding", qs, "vec_id", "embedding", 10,
          (a, b) => round(gf.cosine_similarity(a, b), 6))
        val tr = graft.operators.EmbeddingOps.matryoshka(e, "embedding", 16)
        val pref = graft.operators.SimilaritySearch.bruteForceTopK(
          tr, "vec_id", "vec_trunc", tr.filter(col("vec_id") < 10),
          "vec_id", "vec_trunc", 10,
          (a, b) => round(gf.dot(a, b), 6))
        graft.operators.SimilaritySearch.rankingAgreement(
            full, pref, "qid", "id", "rank", 10)
          .orderBy(col("qid"))
      },
      Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qv
             |  FROM embeddings WHERE vec_id < 10),
             |fa AS (SELECT qid, e.vec_id AS id, row_number() OVER (PARTITION BY qid
             |  ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
             |    qv::DOUBLE[]), 6) DESC, e.vec_id) AS r FROM embeddings e, q),
             |a AS (SELECT qid, id, r FROM fa WHERE r <= 10),
             |fb AS (SELECT qid, e.vec_id AS id, row_number() OVER (PARTITION BY qid
             |  ORDER BY round(list_cosine_similarity(e.embedding[1:16]::DOUBLE[],
             |    qv[1:16]::DOUBLE[]), 6) DESC, e.vec_id) AS r FROM embeddings e, q),
             |b AS (SELECT qid, id, r FROM fb WHERE r <= 10),
             |j AS (SELECT coalesce(a.qid, b.qid) AS qid, coalesce(a.id, b.id) AS id,
             |  a.r AS ra, b.r AS rb
             |  FROM a FULL JOIN b ON a.qid = b.qid AND a.id = b.id)
             |SELECT qid, count(ra)::BIGINT AS n_a, count(rb)::BIGINT AS n_b,
             |sum(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             |  AS n_common,
             |round(sum(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
             |  / 10, 6) AS overlap_at_k,
             |round(sum(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
             |  / (count(ra) + count(rb)
             |    - sum(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL THEN 1 ELSE 0 END)), 6)
             |  AS jaccard,
             |max(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END)::INT AS top1_match
             |FROM j GROUP BY qid ORDER BY qid""".stripMargin.replace('\n', ' ')),
      doc = "per-query overlap/jaccard/top1 agreement: full-dim vs 16-dim prefix retrieval"),

    // ---- euclidean nearest (ascending distance)
    "q_vec_l2_topk" -> Q(
      (s, dir) => {
        val e = table(s, dir, E)
        val q = e.filter(col("vec_id") === 7).select(col("embedding").as("qv"))
        e.filter(col("vec_id") =!= 7).crossJoin(broadcast(q))
          .select(col("vec_id"),
            round(gf.l2_norm(col("embedding"), col("qv")), 6).as("l2_dist"))
          .orderBy(col("l2_dist").asc, col("vec_id"))
          .limit(10)
      },
      Some("""SELECT e.vec_id, round(list_distance(e.embedding::DOUBLE[], q.embedding::DOUBLE[]),6) AS l2_dist
             |FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 7) q
             |WHERE e.vec_id <> 7 ORDER BY l2_dist ASC, e.vec_id LIMIT 10""".stripMargin.replace('\n', ' '))),

    // ---- dot-product ranking
    "q_vec_dot_topk" -> Q(
      (s, dir) => {
        val e = table(s, dir, E)
        val q = e.filter(col("vec_id") === 3).select(col("embedding").as("qv"))
        e.crossJoin(broadcast(q))
          .select(col("vec_id"),
            round(gf.dot(col("embedding"), col("qv")), 6).as("dot_score"))
          .orderBy(col("dot_score").desc, col("vec_id"))
          .limit(10)
      },
      Some("""SELECT e.vec_id, round(list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[]),6) AS dot_score
             |FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 3) q
             |ORDER BY dot_score DESC, e.vec_id LIMIT 10""".stripMargin.replace('\n', ' '))),

    // ---- L1 (manhattan) distance
    "q_vec_l1_topk" -> Q(
      (s, dir) => {
        val e = table(s, dir, E)
        val q = e.filter(col("vec_id") === 11).select(col("embedding").as("qv"))
        e.filter(col("vec_id") =!= 11).crossJoin(broadcast(q))
          .select(col("vec_id"),
            round(gf.l1_norm(col("embedding"), col("qv")), 6).as("l1_dist"))
          .orderBy(col("l1_dist").asc, col("vec_id"))
          .limit(10)
      },
      Some("""SELECT e.vec_id,
             |round(list_aggregate(list_transform(range(1, len(e.embedding)+1),
             |  i -> abs(e.embedding[i]::DOUBLE - q.embedding[i]::DOUBLE)), 'sum'),6) AS l1_dist
             |FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 11) q
             |WHERE e.vec_id <> 11 ORDER BY l1_dist ASC, e.vec_id LIMIT 10""".stripMargin.replace('\n', ' '))),

    // ---- Chebyshev (L-infinity) distance top-k (`cpp/nd/norm.hpp`)
    "q_vec_linf_topk" -> Q(
      (s, dir) => {
        val e = table(s, dir, E)
        val q = e.filter(col("vec_id") === 7).select(col("embedding").as("qv"))
        e.filter(col("vec_id") =!= 7).crossJoin(broadcast(q))
          .select(col("vec_id"),
            round(gf.linf_norm(col("embedding"), col("qv")), 6).as("linf_dist"))
          .orderBy(col("linf_dist").asc, col("vec_id"))
          .limit(10)
      },
      Some("""SELECT e.vec_id,
             |round(list_aggregate(list_transform(range(1, len(e.embedding)+1),
             |  i -> abs(e.embedding[i]::DOUBLE - q.embedding[i]::DOUBLE)), 'max'),6) AS linf_dist
             |FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 7) q
             |WHERE e.vec_id <> 7 ORDER BY linf_dist ASC, e.vec_id LIMIT 10""".stripMargin.replace('\n', ' '))),

    // ---- hamming distance over binary-quantized vectors (maxsim_bq analog)
    "q_vec_hamming_quantized" -> Q(
      (s, dir) => {
        val e = table(s, dir, E)
        val q = e.filter(col("vec_id") === 0)
          .select(gf.quantize(col("embedding")).as("qv"))
        e.crossJoin(broadcast(q))
          .select(col("vec_id"),
            gf.hamming_distance(gf.quantize(col("embedding")), col("qv")).as("hamming"))
          .orderBy(col("hamming").asc, col("vec_id"))
          .limit(10)
      },
      Some("""SELECT e.vec_id,
             |list_aggregate(list_transform(range(1, len(e.embedding)+1),
             |  i -> CASE WHEN (e.embedding[i] >= 0) <> (q.embedding[i] >= 0) THEN 1 ELSE 0 END), 'sum')::BIGINT AS hamming
             |FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
             |ORDER BY hamming ASC, e.vec_id LIMIT 10""".stripMargin.replace('\n', ' '))),

    // ---- MAXSIM late interaction: each label's vectors form a bag (doc);
    // query bag = vectors 0..2 (tql.md:114-136)
    "q_vec_maxsim" -> Q(
      (s, dir) => {
        val e = table(s, dir, E)
        val bags = e.groupBy(col("label"))
          .agg(collect_list(col("embedding")).as("bag"))
        val qbag = e.filter(col("vec_id") < 3)
          .agg(collect_list(col("embedding")).as("qbag"))
        bags.crossJoin(broadcast(qbag))
          .select(col("label"), round(gf.maxsim(col("bag"), col("qbag")), 6).as("maxsim_score"))
          .orderBy(col("label"))
      },
      Some("""SELECT label, round(sum(mx),6) AS maxsim_score FROM (
             |SELECT d.label, q.vec_id AS qid,
             |max(list_cosine_similarity(d.embedding::DOUBLE[], q.embedding::DOUBLE[])) AS mx
             |FROM embeddings d, (SELECT * FROM embeddings WHERE vec_id < 3) q
             |GROUP BY d.label, q.vec_id) t
             |GROUP BY label ORDER BY label""".stripMargin.replace('\n', ' '))),

    // ---- MAXSIM_POOLED: maxsim against the mean-pooled doc bag — the
    // one-vector prefilter variant (`cpp/nd/norm.hpp:46`)
    "q_vec_maxsim_pooled" -> Q(
      (s, dir) => {
        val e = table(s, dir, E)
        val bags = e.groupBy(col("label"))
          .agg(collect_list(col("embedding")).as("bag"))
        val qbag = e.filter(col("vec_id") < 3)
          .agg(collect_list(col("embedding")).as("qbag"))
        bags.crossJoin(broadcast(qbag))
          .select(col("label"),
            round(gf.maxsim_pooled(col("bag"), col("qbag")), 6).as("pooled_score"))
          .orderBy(col("label"))
      },
      Some("""WITH ex AS (
             |  SELECT label, u.i AS dim, avg(embedding[u.i]::DOUBLE) AS m
             |  FROM embeddings, range(1, 65) u(i) GROUP BY label, u.i
             |), pooled AS (
             |  SELECT label, list(m ORDER BY dim) AS pv FROM ex GROUP BY label
             |)
             |SELECT p.label, round(sum(list_cosine_similarity(p.pv, q.embedding::DOUBLE[])),6) AS pooled_score
             |FROM pooled p, (SELECT * FROM embeddings WHERE vec_id < 3) q
             |GROUP BY p.label ORDER BY p.label""".stripMargin.replace('\n', ' '))),

    // ---- MAXSIM_BQ: maxsim over binary-quantized token embeddings
    // (`cpp/nd/norm.hpp:48`; cos of {-1,+1} vectors = dot/dim, exact)
    "q_vec_maxsim_bq" -> Q(
      (s, dir) => {
        val e = table(s, dir, E)
        val bags = e.groupBy(col("label"))
          .agg(collect_list(col("embedding")).as("bag"))
        val qbag = e.filter(col("vec_id") < 3)
          .agg(collect_list(col("embedding")).as("qbag"))
        bags.crossJoin(broadcast(qbag))
          .select(col("label"),
            round(gf.maxsim_bq(col("bag"), col("qbag")), 6).as("bq_score"))
          .orderBy(col("label"))
      },
      Some("""SELECT label, round(sum(mx),6) AS bq_score FROM (
             |SELECT d.label, q.vec_id AS qid,
             |max(list_cosine_similarity(
             |  list_transform(d.embedding, x -> CASE WHEN x >= 0 THEN 1.0 ELSE -1.0 END),
             |  list_transform(q.embedding, x -> CASE WHEN x >= 0 THEN 1.0 ELSE -1.0 END))) AS mx
             |FROM embeddings d, (SELECT * FROM embeddings WHERE vec_id < 3) q
             |GROUP BY d.label, q.vec_id) t
             |GROUP BY label ORDER BY label""".stripMargin.replace('\n', ' '))),

    // ---- per-row vector norms aggregated by label
    "q_vec_norm_stats" -> Q(
      (s, dir) => {
        table(s, dir, E)
          .select(col("label"), gf.l2_norm(col("embedding")).as("nrm"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n"),
            round(avg(col("nrm")), 6).as("avg_norm"),
            round(min(col("nrm")), 6).as("min_norm"),
            round(max(col("nrm")), 6).as("max_norm"))
          .orderBy(col("label"))
      },
      Some("""SELECT label, count(*) AS n,
             |round(avg(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))),6) AS avg_norm,
             |round(min(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))),6) AS min_norm,
             |round(max(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))),6) AS max_norm
             |FROM embeddings GROUP BY label ORDER BY label""".stripMargin.replace('\n', ' '))),

    // ---- bulk k-NN: top-3 neighbors for each of 5 query vectors
    // (SimilaritySearch operator: broadcast queries, two-phase top-k)
    "q_vec_knn_bulk" -> Q(
      (s, dir) => {
        val e = table(s, dir, E)
        val queries = e.filter(col("vec_id") < 5)
        SimilaritySearch.bruteForceTopK(
            e.filter(col("vec_id") >= 5), "vec_id", "embedding",
            queries, "vec_id", "embedding", k = 3)
          .select(col("qid"), col("rank"), col("id").as("neighbor_id"),
            round(col("score"), 6).as("cos_sim"))
          .orderBy(col("qid"), col("rank"))
      },
      Some("""SELECT qid, rank, neighbor_id, cos_sim FROM (
             |SELECT q.vec_id AS qid, e.vec_id AS neighbor_id,
             |round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]),6) AS cos_sim,
             |CAST(row_number() OVER (PARTITION BY q.vec_id
             |  ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC, e.vec_id) AS INTEGER) AS rank
             |FROM embeddings e, (SELECT * FROM embeddings WHERE vec_id < 5) q
             |WHERE e.vec_id >= 5) t WHERE rank <= 3 ORDER BY qid, rank""".stripMargin.replace('\n', ' '))),

    // ---- DBSCAN density clustering (Ester 1996) in cosine space:
    // lossless blocked ε-pairs + pointer-jumping components for cores,
    // min-cluster border attachment, noise = -1. Oracle replays the
    // whole pipeline: brute-force pairs + recursive-CTE closure.
    "q_vec_dbscan" -> Q(
      (s, dir) => graft.operators.EmbeddingOps.dbscan(
          table(s, dir, E), "vec_id", "embedding", eps = 0.6, minPts = 4,
          centroids = Some(graft.operators.IndexStore.ann(s, dir).centroids))
        .orderBy(col("id")),
      Some("""WITH RECURSIVE p AS (SELECT a.vec_id AS a, b.vec_id AS b
             |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             |  WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) > 0.4),
             |e AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
             |deg AS (SELECT a AS id, count(*) AS d FROM e GROUP BY 1),
             |core AS (SELECT id FROM deg WHERE d >= 3),
             |ce AS (SELECT e.a, e.b FROM e JOIN core ca ON ca.id = e.a JOIN core cb ON cb.id = e.b),
             |walk(a, b) AS (SELECT a, b FROM ce UNION SELECT w.a, e2.b FROM walk w JOIN ce e2 ON w.b = e2.a),
             |clab AS (SELECT a AS id, least(a, min(b)) AS cluster FROM walk GROUP BY a),
             |cc AS (SELECT core.id, coalesce(clab.cluster, core.id) AS cluster
             |  FROM core LEFT JOIN clab ON clab.id = core.id),
             |battach AS (SELECT e.a AS id, min(cc.cluster) AS bcluster
             |  FROM e JOIN cc ON cc.id = e.b GROUP BY 1),
             |ids AS (SELECT vec_id AS id FROM embeddings)
             |SELECT ids.id AS id, coalesce(cc.cluster, battach.bcluster, -1) AS cluster,
             |CASE WHEN cc.cluster IS NOT NULL THEN 'core'
             |WHEN battach.bcluster IS NOT NULL THEN 'border' ELSE 'noise' END AS role
             |FROM ids LEFT JOIN cc ON cc.id = ids.id
             |LEFT JOIN battach ON battach.id = ids.id
             |ORDER BY ids.id""".stripMargin.replace('\n', ' ')),
      doc = "DBSCAN over embeddings: core/border/noise with deterministic labels"),

    // ---- kNN label-agreement noise audit (Wilson 1972 edited-NN):
    // fraction of each audited sample's 10 cosine-nearest neighbors
    // sharing its label + the neighborhood majority — the swap-noise
    // catch that centroid z-scores (q_vec_label_outliers) miss.
    "q_vec_label_agreement" -> Q(
      (s, dir) => {
        val e = table(s, dir, E)
        graft.operators.EmbeddingOps.knnLabelAgreement(
            e, "vec_id", "embedding", "label",
            e.filter(col("vec_id") < 50).select(col("vec_id")), k = 10)
          .orderBy(col("id"))
      },
      Some("""WITH b AS (SELECT vec_id AS id, label, embedding FROM embeddings),
             |q AS (SELECT id AS qid, label AS qlabel, embedding AS qv FROM b WHERE id < 50),
             |sc AS (SELECT q.qid, q.qlabel, b.id, b.label,
             |  list_cosine_similarity(b.embedding::DOUBLE[], q.qv::DOUBLE[]) AS sim
             |  FROM b, q WHERE b.id <> q.qid),
             |top AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rk FROM sc) WHERE rk <= 10),
             |ag AS (SELECT qid, qlabel, round(avg(CASE WHEN label = qlabel THEN 1.0 ELSE 0.0 END), 6) AS agreement
             |  FROM top GROUP BY qid, qlabel),
             |mj AS (SELECT qid, label AS majority_label FROM (
             |  SELECT qid, label, row_number() OVER (PARTITION BY qid ORDER BY count(*) DESC, label) AS mr
             |  FROM top GROUP BY qid, label) WHERE mr = 1)
             |SELECT ag.qid AS id, ag.qlabel AS label, agreement, majority_label,
             |agreement < 0.5 AS suspect
             |FROM ag JOIN mj USING (qid) ORDER BY id""".stripMargin.replace('\n', ' ')),
      doc = "kNN label-agreement mislabel audit over the embedding space"),

    // ---- array indexing + slicing (tql.md:587-604): col[0], col[-1], col[0:8]
    "q_array_indexing" -> Q(
      (s, dir) => {
        table(s, dir, E)
          .filter(col("vec_id") < 50)
          .select(col("vec_id"),
            round(element_at(col("embedding"), 1).cast("double"), 6).as("first_el"),
            round(element_at(col("embedding"), -1).cast("double"), 6).as("last_el"),
            round(gf.tsum(slice(col("embedding"), 1, 8)), 6).as("head_sum"),
            size(col("embedding")).as("dim"))
          .orderBy(col("vec_id"))
      },
      Some("""SELECT vec_id, round(embedding[1]::DOUBLE,6) AS first_el,
             |round(embedding[-1]::DOUBLE,6) AS last_el,
             |round(list_aggregate(embedding[1:8]::DOUBLE[], 'sum'),6) AS head_sum,
             |len(embedding) AS dim
             |FROM embeddings WHERE vec_id < 50 ORDER BY vec_id""".stripMargin.replace('\n', ' '))),

    // ---- ANY / ALL / ALL_STRICT over array predicates (tql.md:435-451)
    "q_array_any_all" -> Q(
      (s, dir) => {
        val e = table(s, dir, E)
        e.select(
            gf.any_(transform(col("embedding"), x => x > 0.25f)).as("has_big"),
            gf.all_(transform(col("embedding"), x => x > -0.5f)).as("all_moderate"))
          .groupBy(col("has_big"), col("all_moderate"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("has_big"), col("all_moderate"))
      },
      Some("""SELECT list_aggregate(list_transform(embedding, x -> x > 0.25), 'bool_or') AS has_big,
             |list_aggregate(list_transform(embedding, x -> x > -0.5), 'bool_and') AS all_moderate,
             |count(*) AS n FROM embeddings GROUP BY 1, 2 ORDER BY has_big, all_moderate""".stripMargin.replace('\n', ' '))),

    // ---- within-row tensor reductions (TQL SUM/AVG/AMIN/AMAX;
    // cpp/nd/functions.hpp:79-149)
    "q_tensor_reduce" -> Q(
      (s, dir) => {
        table(s, dir, E)
          .filter(col("vec_id") < 100)
          .select(col("vec_id"),
            round(gf.tsum(col("embedding")), 6).as("t_sum"),
            round(gf.tavg(col("embedding")), 6).as("t_avg"),
            round(gf.tmin(col("embedding")).cast("double"), 6).as("t_min"),
            round(gf.tmax(col("embedding")).cast("double"), 6).as("t_max"))
          .orderBy(col("vec_id"))
      },
      Some("""SELECT vec_id, round(list_aggregate(embedding::DOUBLE[], 'sum'),6) AS t_sum,
             |round(list_aggregate(embedding::DOUBLE[], 'sum') / len(embedding),6) AS t_avg,
             |round(list_aggregate(embedding, 'min')::DOUBLE,6) AS t_min,
             |round(list_aggregate(embedding, 'max')::DOUBLE,6) AS t_max
             |FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""".stripMargin.replace('\n', ' '))),

    // ---- quantize + elementwise ops: sum of sign bits = (#pos - #neg)
    "q_array_quantize" -> Q(
      (s, dir) => {
        table(s, dir, E)
          .select(col("label"), gf.tsum(gf.quantize(col("embedding"))).as("sign_balance"))
          .groupBy(col("label"))
          .agg(round(avg(col("sign_balance")), 6).as("avg_sign_balance"),
            count(lit(1)).as("n"))
          .orderBy(col("label"))
      },
      Some("""SELECT label,
             |round(avg(list_aggregate(list_transform(embedding, x -> CASE WHEN x >= 0 THEN 1.0 ELSE -1.0 END), 'sum')),6) AS avg_sign_balance,
             |count(*) AS n FROM embeddings GROUP BY label ORDER BY label""".stripMargin.replace('\n', ' ')))
  )

  /** DuckDB oracle for `q_vec_kcenter`: one CTE pair per greedy step —
    * min-distance census against the selected-so-far set, then the
    * 6dp-rounded argmax — replaying
    * [[graft.operators.EmbeddingOps.kCenterGreedy]] exactly. */
  /** DuckDB oracle for `q_vec_kpp`: one CTE pair per D² step — the
    * min-distance census, then the exponential-race argmin over
    * round(−ln(u)/md², 6) with the md5-fold open uniform — replaying
    * [[graft.operators.EmbeddingOps.kMeansPlusPlusSeed]] exactly. */
  private def kppOracle(startId: Long, k: Int, seed: String): String = {
    val steps = (1 until k).map { t =>
      val h = s"md5('$seed:$t:' || id::VARCHAR)"
      s"""c$t AS (SELECT b.id,
         |  min(round(1.0 - list_cosine_similarity(b.v, sv.v), 6)) AS md
         |  FROM b, b sv
         |  WHERE sv.id IN (SELECT id FROM sel${t - 1})
         |    AND b.id NOT IN (SELECT id FROM sel${t - 1})
         |  GROUP BY b.id),
         |s$t AS (SELECT id, $t AS sel_rank, md AS dist FROM c$t
         |  WHERE md > 0
         |  ORDER BY round(-ln(${uuOpenSql(h)}) / (md * md), 6), id LIMIT 1),
         |sel$t AS (SELECT * FROM sel${t - 1} UNION ALL SELECT * FROM s$t)"""
        .stripMargin
    }.mkString(", ")
    s"""WITH b AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
       |sel0 AS (SELECT $startId AS id, 0 AS sel_rank, 0.0 AS dist),
       |$steps
       |SELECT sel_rank, id, dist FROM sel${k - 1} ORDER BY sel_rank"""
      .stripMargin.replace('\n', ' ')
  }

  /** DuckDB oracle for `q_vec_kmeans`: one assign+update CTE pair per
    * Lloyd round (6dp distances, 6dp centroid components, empty
    * clusters keep their previous centroid via the LEFT JOIN), then a
    * final assignment against the last centroids — replaying
    * [[graft.operators.EmbeddingOps.kMeansLloyd]] exactly. */
  private def kmeansOracle(k: Int, iters: Int): String = {
    def assign(name: String, cents: String) =
      s"""$name AS (SELECT id, v, c, dist FROM (
         |  SELECT b.id, b.v, $cents.c,
         |    round(1.0 - list_cosine_similarity(b.v, $cents.cv), 6) AS dist,
         |    row_number() OVER (PARTITION BY b.id ORDER BY
         |      round(1.0 - list_cosine_similarity(b.v, $cents.cv), 6), $cents.c) AS rn
         |  FROM b, $cents) WHERE rn = 1)""".stripMargin
    val steps = (1 to iters).map { t =>
      s"""${assign(s"a$t", s"c${t - 1}")},
         |u$t AS (SELECT c, list(xa ORDER BY i) AS cv FROM (
         |  SELECT c, i, round(avg(x), 6) AS xa FROM (
         |    SELECT c, unnest(v) AS x, unnest(range(1, len(v)+1)) AS i FROM a$t
         |  ) GROUP BY c, i) GROUP BY c),
         |c$t AS (SELECT c${t - 1}.c, coalesce(u$t.cv, c${t - 1}.cv) AS cv
         |  FROM c${t - 1} LEFT JOIN u$t ON c${t - 1}.c = u$t.c)""".stripMargin
    }.mkString(", ")
    s"""WITH b AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
       |c0 AS (SELECT vec_id::INT AS c, embedding::DOUBLE[] AS cv
       |  FROM embeddings WHERE vec_id < $k),
       |$steps,
       |${assign("af", s"c$iters")}
       |SELECT id, c AS cluster, dist FROM af ORDER BY id"""
      .stripMargin.replace('\n', ' ')
  }

  private def kCenterOracle(startId: Long, k: Int): String = {
    val steps = (1 until k).map { t =>
      s"""c$t AS (SELECT b.id,
         |  min(round(1.0 - list_cosine_similarity(b.v, sv.v), 6)) AS md
         |  FROM b, b sv
         |  WHERE sv.id IN (SELECT id FROM sel${t - 1})
         |    AND b.id NOT IN (SELECT id FROM sel${t - 1})
         |  GROUP BY b.id),
         |s$t AS (SELECT id, $t AS sel_rank, md AS dist FROM c$t
         |  ORDER BY md DESC, id LIMIT 1),
         |sel$t AS (SELECT * FROM sel${t - 1} UNION ALL SELECT * FROM s$t)"""
        .stripMargin
    }.mkString(", ")
    s"""WITH b AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
       |sel0 AS (SELECT $startId AS id, 0 AS sel_rank, 0.0 AS dist),
       |$steps
       |SELECT sel_rank, id, dist FROM sel${k - 1} ORDER BY sel_rank"""
      .stripMargin.replace('\n', ' ')
  }
}
