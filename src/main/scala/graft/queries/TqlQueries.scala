package graft.queries

import graft.dialect.Tql
import org.apache.spark.sql.functions.col

/** Queries expressed in TQL and compiled through the dialect frontend
  * (graft.dialect.Tql), oracle-checked like every other operator — proves
  * the parser/compiler pipeline end-to-end, not just the operators it
  * lowers to. TQL surface per `docs/docs/advanced/tql.md`; grammar notes
  * in TqlParser.scala.
  */
object TqlQueries extends QueryModule {

  override def qs: Seq[(String, Q)] = Seq(

    // projection + arithmetic + where + order + limit
    "q_tql_filter_project" -> Q(
      (s, dir) => Tql.query(s, dir,
        """SELECT l_orderkey, l_linenumber, ROUND(l_quantity * l_extendedprice, 2) AS gross
          |FROM lineitem WHERE l_quantity > 45 AND l_discount BETWEEN 0.02 AND 0.08
          |ORDER BY gross DESC, l_orderkey, l_linenumber LIMIT 25""".stripMargin),
      Some("""SELECT l_orderkey, l_linenumber, round(l_quantity * l_extendedprice, 2) AS gross
             |FROM lineitem WHERE l_quantity > 45 AND l_discount BETWEEN 0.02 AND 0.08
             |ORDER BY gross DESC, l_orderkey, l_linenumber LIMIT 25""".stripMargin.replace('\n', ' '))),

    // the ds.query form: FROM omitted, the dataset itself is the source
    // (tql.md:14-30 basic usage; subqueries keep the implicit source too)
    "q_tql_implicit_from" -> Q(
      (s, dir) => Tql.queryDataset(
        graft.sources.Tables(s, dir, "documents"),
        """SELECT source, lang, ROUND(SUM(n_chars), 1) AS total_chars, ROUND(AVG(n_chars), 4) AS avg_chars
          |FROM (SELECT * WHERE n_chars > 400 AND lang != 'de')
          |GROUP BY source, lang ORDER BY source, lang""".stripMargin),
      Some("""SELECT source, lang, round(sum(n_chars) * 1.0, 1) AS total_chars,
             |round(avg(n_chars), 4) AS avg_chars
             |FROM (SELECT * FROM documents WHERE n_chars > 400 AND lang != 'de')
             |GROUP BY source, lang ORDER BY source, lang""".stripMargin.replace('\n', ' '))),

    // join with qualified refs + glob LIKE translation
    "q_tql_join_like" -> Q(
      (s, dir) => Tql.query(s, dir,
        """SELECT o.o_orderkey, c.c_name, o.o_totalprice
          |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          |WHERE c.c_name LIKE '*1?8*' ORDER BY o.o_orderkey LIMIT 30""".stripMargin),
      Some("""SELECT o.o_orderkey, c.c_name, o.o_totalprice
             |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |WHERE c.c_name LIKE '%1_8%' ORDER BY o.o_orderkey LIMIT 30""".stripMargin.replace('\n', ' '))),

    // array indexing (0-based + negative) and python slice via the dialect
    "q_tql_array_slice" -> Q(
      (s, dir) => Tql.query(s, dir,
        """SELECT vec_id, ROUND(embedding[0], 6) AS first_el, ROUND(embedding[-1], 6) AS last_el,
          |ROUND(SUM(embedding[0:8]), 6) AS head_sum
          |FROM embeddings WHERE vec_id < 40 ORDER BY vec_id""".stripMargin),
      Some("""SELECT vec_id, round(embedding[1]::DOUBLE,6) AS first_el,
             |round(embedding[-1]::DOUBLE,6) AS last_el,
             |round(list_aggregate(embedding[1:8]::DOUBLE[], 'sum'),6) AS head_sum
             |FROM embeddings WHERE vec_id < 40 ORDER BY vec_id""".stripMargin.replace('\n', ' '))),

    // vector top-k through the dialect (ORDER BY score DESC LIMIT k path,
    // `cpp/tql/tql.hpp:171` check_for_top_k_binary_function_search)
    "q_tql_vector_topk" -> Q(
      (s, dir) => Tql.query(s, dir,
        """SELECT e.vec_id, ROUND(COSINE_SIMILARITY(e.embedding, q.embedding), 6) AS score
          |FROM embeddings e JOIN embeddings q ON q.vec_id = 0
          |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin),
      Some("""SELECT e.vec_id, round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]),6) AS score
             |FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
             |ORDER BY score DESC, e.vec_id LIMIT 10""".stripMargin.replace('\n', ' '))),

    // GROUP BY sequence reshape + per-group reduction (tql.md:472)
    "q_tql_group_reduce" -> Q(
      (s, dir) => Tql.query(s, dir,
        """SELECT user_id, ROUND(SUM(value), 6) AS total, ROUND(AVG(value), 6) AS mean
          |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      Some("""SELECT user_id, round(sum(value),6) AS total, round(avg(value),6) AS mean
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin.replace('\n', ' '))),

    // set ops with per-branch order+limit (`cpp/query_core/statement.hpp:64-84`)
    "q_tql_union_branches" -> Q(
      (s, dir) => Tql.query(s, dir,
        """SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000
          |ORDER BY o_totalprice DESC, o_orderkey LIMIT 5
          |UNION SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 5000
          |ORDER BY o_totalprice ASC, o_orderkey LIMIT 5""".stripMargin),
      Some("""(SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 5)
             |UNION ALL
             |(SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 5000
             |ORDER BY o_totalprice ASC, o_orderkey LIMIT 5)""".stripMargin.replace('\n', ' '))),

    // JSON key access through string indexing (tql.md:143-166)
    "q_tql_json_access" -> Q(
      (s, dir) => Tql.query(s, dir,
        """SELECT event_id, props['k'] AS k_str FROM events
          |WHERE event_id < 40 ORDER BY event_id""".stripMargin),
      Some("""SELECT event_id, json_extract_string(props, '$.k') AS k_str
             |FROM events WHERE event_id < 40 ORDER BY event_id""".stripMargin.replace('\n', ' '))),

    // ANALYZE statement: computes StatsCatalog entries (row count, NDV,
    // min/max, MCVs) the CboHints broadcast rule consumes — the PG/DuckDB
    // ANALYZE analog (pg_statistic MCV lists) reachable from the dialect
    "q_tql_analyze" -> Q(
      (s, dir) => Tql.query(s, dir, "ANALYZE documents (lang, source, n_chars)"),
      Some("""SELECT 'documents' AS table_name, count(*) AS row_count,
             |CAST(3 AS BIGINT) AS num_cols FROM documents""".stripMargin.replace('\n', ' '))),

    // positional params (`cpp/tql/tql.hpp:81-103` prepare/run_batch)
    "q_tql_params" -> Q(
      (s, dir) => Tql.query(s, dir,
        """SELECT s_suppkey, s_name FROM supplier WHERE s_acctbal > ?
          |ORDER BY s_suppkey LIMIT ?""".stripMargin,
        params = Seq(5000.0, 12L)),
      Some("""SELECT s_suppkey, s_name FROM supplier WHERE s_acctbal > 5000.0
             |ORDER BY s_suppkey LIMIT 12""".stripMargin.replace('\n', ' '))),

    // vector ? params bind as array literals inside expressions
    // (reference param_expr, `cpp/query_core/expr.hpp:107-126`); routed
    // through the linear path so the oracle compares exact results
    "q_tql_params_vector" -> Q(
      (s, dir) => {
        val qv = table(s, dir, "embeddings").filter(col("vec_id") === 0)
          .select(col("embedding")).collect()(0).getSeq[Float](0)
        Tql.queryWithOptions(s, dir,
          """SELECT vec_id, ROUND(COSINE_SIMILARITY(embedding, ?), 6) AS score
            |FROM embeddings WHERE vec_id < 40
            |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,
          Tql.Options.linearOnly, params = Seq(qv)).get
      },
      Some("""SELECT e.vec_id, round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]),6) AS score
             |FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
             |WHERE e.vec_id < 40
             |ORDER BY score DESC, e.vec_id LIMIT 10""".stripMargin.replace('\n', ' '))),

    // keyword CONTAINS through the dialect (tql.md:179-185)
    "q_tql_contains" -> Q(
      (s, dir) => Tql.query(s, dir,
        """SELECT doc_id, lang, n_chars FROM documents
          |WHERE CONTAINS(text, 'vector') AND CONTAINS(text, 'spark')
          |ORDER BY doc_id""".stripMargin),
      Some("""SELECT doc_id, lang, n_chars FROM documents
             |WHERE list_contains(string_split(lower(text), ' '), 'vector')
             |AND list_contains(string_split(lower(text), ' '), 'spark')
             |ORDER BY doc_id""".stripMargin.replace('\n', ' '))),

    // text-pipeline scalar functions through the dialect: engine-global
    // TQL functions (Tql.GlobalFunctions) resolved by the expression
    // compiler between dataset-scoped functions and Spark's registry —
    // the TQL analog of the reference's registered SQL functions
    "q_tql_quality" -> Q(
      (s, dir) => Tql.query(s, dir,
        """SELECT doc_id, QUALITY_SCORE(text) AS q,
          |EST_TOKEN_COUNT(text) AS nt, BAG_FINGERPRINT(text) AS fp
          |FROM documents WHERE doc_id < 80 ORDER BY doc_id""".stripMargin),
      Some(s"""WITH t AS (SELECT doc_id, length(text) AS c, string_split(text,' ') AS w
              |          FROM documents WHERE doc_id < 80)
              |SELECT doc_id, round(
              |  0.3 * least(len(w)/50.0, 1.0) +
              |  0.3 * (len(list_distinct(w))::DOUBLE / len(w)) +
              |  0.2 * (1.0 - len(list_filter(w, x -> x IN (${graft.operators.TextAnalysis.stopwords.map(s0 => s"'$s0'").mkString(",")})))::DOUBLE / len(w)) +
              |  0.2 * least(((c - len(w) + 1.0) / len(w)) / 6.0, 1.0), 6) AS q,
              |(len(w) + ceil(c/16.0))::INTEGER AS nt,
              |md5(array_to_string(list_sort(list_distinct(w)),' ')) AS fp
              |FROM t ORDER BY doc_id""".stripMargin.replace('\n', ' '))),

    // EXPAND BY h w AS alias through the dialect (tql.md:370-386) — tiles
    // the 8x8 (flat-64) embedding into four 4x4 patches
    "q_tql_expand" -> Q(
      (s, dir) => Tql.query(s, dir,
        """SELECT vec_id, patch_idx, ROUND(SUM(patch), 6) AS patch_sum
          |FROM embeddings WHERE vec_id < 10 EXPAND BY 4 4 AS patch
          |ORDER BY vec_id, patch_idx""".stripMargin),
      Some("""SELECT vec_id, p.i::INTEGER AS patch_idx,
             |round(list_aggregate(list_transform(range(0, 16), k ->
             |  embedding[((p.i//2)*4 + k//4)*8 + (p.i%2)*4 + (k%4) + 1]::DOUBLE), 'sum'),6) AS patch_sum
             |FROM embeddings, range(4) AS p(i) WHERE vec_id < 10
             |ORDER BY vec_id, patch_idx""".stripMargin.replace('\n', ' '))),

    // EXPAND BY over a RECTANGULAR tensor: dims come from the column's
    // "shape" metadata (Multimodal.withShape — the htype-dims analog,
    // `cpp/heimdall_common/spatial_column.hpp:19`), not a square
    // assumption: the flat-64 embedding is declared 4x16 and tiled into
    // four 2x8 patches
    "q_tql_expand_rect" -> Q(
      (s, dir) => Tql.queryDataset(
        graft.sources.Multimodal.withShape(
          graft.sources.Tables(s, dir, "embeddings"), "embedding", 4, 16),
        """SELECT vec_id, patch_idx, ROUND(SUM(patch), 6) AS patch_sum
          |WHERE vec_id < 10 EXPAND BY 2 8 AS patch
          |ORDER BY vec_id, patch_idx""".stripMargin),
      Some("""SELECT vec_id, p.i::INTEGER AS patch_idx,
             |round(list_aggregate(list_transform(range(0, 16), k ->
             |  embedding[((p.i//2)*2 + k//8)*16 + (p.i%2)*8 + (k%8) + 1]::DOUBLE), 'sum'),6) AS patch_sum
             |FROM embeddings, range(4) AS p(i) WHERE vec_id < 10
             |ORDER BY vec_id, patch_idx""".stripMargin.replace('\n', ' '))),

    // sample_info tensor property through the dialect
    // (`cpp/tql/tensor_property.hpp:7-12`): dtype + logical shape of an
    // array tensor, dims from the column's shape metadata (the binary
    // header path — real image/WAV/MP4 parsing — is gated in
    // MultimodalSpec, since DuckDB can't parse containers)
    "q_tql_sample_info" -> Q(
      (s, dir) => Tql.queryDataset(
        graft.sources.Multimodal.withShape(
          graft.sources.Tables(s, dir, "embeddings"), "embedding", 4, 16),
        """SELECT vec_id, SAMPLE_INFO(embedding)['dtype'] AS dtype,
          |SAMPLE_INFO(embedding)['shape'][0] AS d0,
          |SAMPLE_INFO(embedding)['shape'][1] AS d1
          |WHERE vec_id < 25 ORDER BY vec_id""".stripMargin),
      Some("""SELECT vec_id, 'float' AS dtype, 4::BIGINT AS d0, 16::BIGINT AS d1
             |FROM embeddings WHERE vec_id < 25 ORDER BY vec_id"""
        .stripMargin.replace('\n', ' '))),

    // DATA(col, i) sample binding through the dialect (tql.md:414-417)
    "q_tql_data_at" -> Q(
      (s, dir) => Tql.query(s, dir,
        """SELECT vec_id, ROUND(L2_NORM(embedding - DATA(embedding, 10)), 6) AS dist
          |FROM embeddings WHERE vec_id < 30 ORDER BY vec_id""".stripMargin),
      Some("""SELECT e.vec_id, round(list_distance(e.embedding::DOUBLE[], q.embedding::DOUBLE[]),6) AS dist
             |FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 10) q
             |WHERE e.vec_id < 30 ORDER BY e.vec_id""".stripMargin.replace('\n', ' '))),

    // UNGROUP BY col SPLIT n through the dialect (split_by_number,
    // `cpp/query_core/ungroup_statement.hpp:18`)
    "q_tql_ungroup_split" -> Q(
      (s, dir) => Tql.query(s, dir,
        """SELECT vec_id, pos AS chunk_idx, ROUND(SUM(embedding), 6) AS chunk_sum
          |FROM embeddings WHERE vec_id < 20 UNGROUP BY embedding SPLIT 4
          |ORDER BY vec_id, chunk_idx""".stripMargin),
      Some("""SELECT e.vec_id, r.range::INTEGER AS chunk_idx,
             |round(list_aggregate(e.embedding[(r.range*16+1):(r.range*16+16)]::DOUBLE[], 'sum'),6) AS chunk_sum
             |FROM embeddings e CROSS JOIN range(4) r
             |WHERE e.vec_id < 20 ORDER BY e.vec_id, chunk_idx""".stripMargin.replace('\n', ' '))),

    // ROW_NUMBER() — zero-based dataset offset stamped pre-WHERE via the
    // distributed zipWithIndex plan (tql.md:416-421)
    "q_tql_row_number" -> Q(
      (s, dir) => Tql.query(s, dir,
        """SELECT o_orderkey, ROW_NUMBER() AS rn FROM orders
          |WHERE o_custkey = 7 ORDER BY o_orderkey""".stripMargin),
      Some("""SELECT o_orderkey, rn FROM
             |(SELECT o_orderkey, o_custkey, CAST(row_number() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS rn
             |FROM orders) t WHERE o_custkey = 7 ORDER BY o_orderkey""".stripMargin.replace('\n', ' '))),

    // EQUALS keyword (tql.md:187-193)
    "q_text_equals" -> Q(
      (s, dir) => Tql.query(s, dir,
        """SELECT doc_id, lang, n_chars FROM documents
          |WHERE EQUALS(lang, 'en') ORDER BY doc_id""".stripMargin),
      Some("""SELECT doc_id, lang, n_chars FROM documents
             |WHERE lang = 'en' ORDER BY doc_id""".stripMargin.replace('\n', ' '))),

    // SUM_WEIGHT / MAX_WEIGHT pair expressions projected deterministically
    // (`cpp/query_core/expr.hpp:158` cond:weight pairs; tql.md:336-347)
    "q_sum_weight" -> Q(
      (s, dir) => Tql.query(s, dir,
        """SELECT l_orderkey, l_linenumber,
          |SUM_WEIGHT(l_returnflag == 'R': 10.0, l_quantity > 40: 5.0) AS sw,
          |MAX_WEIGHT(l_returnflag == 'R': 10.0, l_quantity > 40: 5.0) AS mw
          |FROM lineitem WHERE l_orderkey < 40
          |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      Some("""SELECT l_orderkey, l_linenumber,
             |(CASE WHEN l_returnflag = 'R' THEN 10.0 ELSE 0.0 END
             | + CASE WHEN l_quantity > 40 THEN 5.0 ELSE 0.0 END)::DOUBLE AS sw,
             |greatest(CASE WHEN l_returnflag = 'R' THEN 10.0 ELSE 0.0 END,
             |         CASE WHEN l_quantity > 40 THEN 5.0 ELSE 0.0 END)::DOUBLE AS mw
             |FROM lineitem WHERE l_orderkey < 40
             |ORDER BY l_orderkey, l_linenumber""".stripMargin.replace('\n', ' '))),

    // GROUP BY ... ACROSS SPACE: samples concatenate along the spatial
    // axis into one contiguous tensor per key (`group_statement.hpp:15-19`,
    // grammar `bison_parser.y:886-888`)
    "q_tql_group_across_space" -> Q(
      (s, dir) => Tql.query(s, dir,
        """SELECT label, SHAPE(embedding)[0] AS cat_len, ROUND(SUM(embedding), 6) AS cat_sum
          |FROM embeddings WHERE vec_id < 50
          |GROUP BY label ACROSS SPACE ORDER BY label""".stripMargin),
      Some("""SELECT label, (count(*)*64)::INTEGER AS cat_len,
             |round(sum(list_aggregate(embedding::DOUBLE[], 'sum')),6) AS cat_sum
             |FROM embeddings WHERE vec_id < 50
             |GROUP BY label ORDER BY label""".stripMargin.replace('\n', ' '))),

    // within-row tensor reductions + elementwise compare via dialect
    "q_tql_tensor_fns" -> Q(
      (s, dir) => Tql.query(s, dir,
        """SELECT vec_id, ROUND(SUM(ABS(embedding)), 6) AS l1_mass,
          |ROUND(AMAX(embedding), 6) AS biggest,
          |SUM(SHAPE(embedding)) AS dim
          |FROM embeddings WHERE vec_id < 60 ORDER BY vec_id""".stripMargin),
      Some("""SELECT vec_id,
             |round(list_aggregate(list_transform(embedding::DOUBLE[], x -> abs(x)), 'sum'),6) AS l1_mass,
             |round(list_aggregate(embedding, 'max')::DOUBLE,6) AS biggest,
             |len(embedding)::DOUBLE AS dim
             |FROM embeddings WHERE vec_id < 60 ORDER BY vec_id""".stripMargin.replace('\n', ' ')))
  )
}
