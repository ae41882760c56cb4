package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** BM25 text relevance (SURVEY.md §2.9; reference BM25 index
  * `docs/docs/advanced/tql.md:170-176`, search routing
  * `cpp/deeplake_pg/index_search.cpp:135-169`).
  *
  * The reference maintains a BM25 index (df, avgdl) incrementally; we
  * compute corpus stats as DataFrames — at scale these are the "index
  * tables": (term, df) is tiny after aggregation and broadcast-joins to
  * the postings. Scoring never shuffles the corpus: postings are built
  * with one explode + hash-agg, query terms filter via broadcast
  * semi-join, and the final agg groups by doc id.
  *
  * Formula (Okapi BM25, k1=1.2, b=0.75, Lucene-style idf):
  *   idf(t)  = ln(1 + (N - df + 0.5)/(df + 0.5))
  *   score   = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  */
object Bm25 {
  val K1 = 1.2
  val B = 0.75

  /** Session-level BM25 index routing for the dialect's
    * `ORDER BY BM25_SIMILARITY(col, 'query') DESC LIMIT k` path — the
    * BM25 arm of the reference's
    * check_for_top_k_binary_function_search (`cpp/tql/tql.hpp:171`,
    * BM25 search routing `cpp/deeplake_pg/index_search.cpp:135-169`).
    * Keyed by (table, text column); `idCol` names the table's id column
    * candidates join back on. */
  object Catalog {
    final case class Entry(index: Index, idCol: String)
    @volatile private var entries: Map[(String, String), Entry] = Map.empty
    @volatile private var providers: Map[(String, String), () => Option[Entry]] =
      Map.empty

    def register(table: String, textCol: String, idCol: String, index: Index): Unit =
      entries += (table, textCol) -> Entry(index, idCol)

    /** Version-gated registration: the provider re-validates at LOOKUP
      * time (table-owned indexes re-check their manifest + artifact
      * stamp — see `Snapshots.bm25Provider`), so a drop/quarantine or
      * absorb in another process is observed instead of serving a
      * stale loaded frame; `None` means no route (linear fallback). An
      * eager [[register]] for the same key wins (session indexes have
      * no manifest to gate on). */
    def registerProvider(table: String, textCol: String,
        p: () => Option[Entry]): Unit =
      providers += (table, textCol) -> p

    def lookup(table: String, textCol: String): Option[Entry] =
      entries.get((table, textCol))
        .orElse(providers.get((table, textCol)).flatMap(_.apply()))

    def unregister(table: String, textCol: String): Unit = {
      entries -= ((table, textCol)); providers -= ((table, textCol))
    }

    def clear(): Unit = { entries = Map.empty; providers = Map.empty }
  }

  /** postings: one row per (doc, term) with tf and dl.
    * Repartition by doc id first — a single-partition scan would
    * serialize tokenize+explode (see Dedup.shingled note). */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__toks"))
      .select(col("doc_id"), size(col("__toks")).as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** corpus stats: (N, avgdl) single row + (term, df) table */
  def corpusStats(post: DataFrame): (DataFrame, DataFrame) = {
    val docStats = post.groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val termDf = post.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    (docStats, termDf)
  }

  /** Maintained BM25 index: the postings plus both stats tables — what
    * the reference keeps incrementally (`index_search.cpp:135-169`).
    * Built once ([[buildIndex]]/[[save]]), scored many ([[scoreWithIndex]]). */
  final case class Index(postings: DataFrame, docStats: DataFrame, termDf: DataFrame)

  def buildIndex(docs: DataFrame, idCol: String, textCol: String): Index = {
    val post = postings(docs, idCol, textCol)
    val (docStats, termDf) = corpusStats(post)
    Index(post, docStats, termDf)
  }

  /** Persist as three parquet tables. The postings are written FIRST and
    * the stats derived from the written parquet, so the corpus is
    * tokenized exactly once across all three artifacts. Each table is a
    * `batch=base` base segment so [[graft.streaming.StreamingText]] can
    * absorb batch-id-keyed delta segments into the same directory
    * (parquet discovery rejects mixed flat + partitioned layouts). */
  def save(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
      dir: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    Seq("postings", "doc_stats", "term_df").foreach { n =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$n")
      if (fs.exists(p)) fs.delete(p, true)
    }
    postings(docs, idCol, textCol).write.mode("overwrite")
      .parquet(s"$dir/postings/batch=base")
    val post = spark.read.parquet(s"$dir/postings").drop("batch")
    val (docStats, termDf) = corpusStats(post)
    docStats.write.mode("overwrite").parquet(s"$dir/doc_stats/batch=base")
    termDf.write.mode("overwrite").parquet(s"$dir/term_df/batch=base")
  }

  /** O(delta) index maintenance on append: tokenize ONLY the new docs,
    * then merge stats algebraically — doc counts and per-term document
    * frequencies are additive across disjoint doc sets, and avgdl merges
    * as a count-weighted mean. The existing corpus is never re-read;
    * this is the reference's incremental BM25 maintenance
    * (`cpp/deeplake_pg/sync_worker.cpp`) in DataFrame form. */
  def appendToIndex(index: Index, newDocs: DataFrame, idCol: String,
      textCol: String): Index = {
    val post2 = postings(newDocs, idCol, textCol)
    val (ds2, tdf2) = corpusStats(post2)
    val docStats = index.docStats.select(col("n_docs"), col("avgdl"))
      .unionByName(ds2)
      .agg((sum(col("n_docs") * col("avgdl")) / sum(col("n_docs"))).as("avgdl"),
        sum(col("n_docs")).as("n_docs"))
      .select(col("n_docs"), col("avgdl"))
    val termDf = index.termDf.unionByName(tdf2)
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    Index(index.postings.unionByName(post2), docStats, termDf)
  }

  /** O(delta) maintenance on DELETE (the right-to-be-forgotten path):
    * no re-tokenization — the deleted docs' own postings already carry
    * exactly the counts to subtract. Stats reverse algebraically:
    * n_docs and per-term df subtract, avgdl un-mixes as a
    * count-weighted mean; terms whose df reaches 0 drop from the
    * dictionary. The surviving corpus is never re-read. The id set is
    * a bounded request batch (AQE broadcasts it); a full-corpus purge
    * should rebuild instead. */
  def deleteFromIndex(index: Index, deletedIds: DataFrame,
      idKey: String): Index = {
    val ids = deletedIds.select(col(idKey).as("doc_id")).distinct()
    val deadPost = index.postings.join(ids, Seq("doc_id"), "left_semi")
    val (dsDead, tdfDead) = corpusStats(deadPost)
    val docStats = index.docStats.select(col("n_docs"), col("avgdl"))
      .crossJoin(broadcast(dsDead.select(col("n_docs").as("__dn"),
        coalesce(col("avgdl"), lit(0.0)).as("__davg"))))
      .select((col("n_docs") - col("__dn")).as("n_docs"),
        when(col("n_docs") - col("__dn") > 0,
          (col("n_docs") * col("avgdl") - col("__dn") * col("__davg")) /
            (col("n_docs") - col("__dn")))
          .otherwise(lit(0.0)).as("avgdl"))
    val termDf = index.termDf
      .join(tdfDead.select(col("term"), col("df").as("__ddf")), Seq("term"), "left")
      .select(col("term"), (col("df") - coalesce(col("__ddf"), lit(0L))).as("df"))
      .filter(col("df") > 0)
    Index(index.postings.join(ids, Seq("doc_id"), "left_anti"), docStats, termDf)
  }

  /** Load with MERGE-ON-READ over batch segments: postings union
    * naturally (per-doc rows); doc_stats rows (one per absorbed batch)
    * merge as a count-weighted mean; term_df rows sum per term. A
    * single batch=base layout reduces to the identity, so flat saves
    * load unchanged — and an append absorb can land as ONE new batch
    * segment per table (no delete-rewrite window for readers). */
  def load(spark: SparkSession, dir: String): Index = {
    val ds = spark.read.parquet(s"$dir/doc_stats").drop("batch")
      .agg((sum(col("n_docs") * col("avgdl")) / sum(col("n_docs"))).as("avgdl"),
        sum(col("n_docs")).as("n_docs"))
      .select(col("n_docs"), col("avgdl"))
    val tdf = spark.read.parquet(s"$dir/term_df").drop("batch")
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    Index(spark.read.parquet(s"$dir/postings").drop("batch"), ds, tdf)
  }

  /** BM25 scores for a bag of query terms against a maintained index:
    * (doc_id, score) for every doc containing at least one query term.
    * The term filter pushes into the postings scan; df and corpus stats
    * broadcast — the corpus itself is never re-tokenized. */
  def scoreWithIndex(index: Index, queryTerms: Seq[String],
      idFilter: Option[DataFrame] = None): DataFrame = {
    val lowered = queryTerms.distinct
    // WHERE pre-filter composition (index_holder.hpp:33): only ids
    // surviving the filter are scored/ranked; corpus stats (idf, avgdl)
    // stay global, exactly as an index search over a filter bitmap
    val base = idFilter match {
      case Some(ids) =>
        index.postings.join(
          ids.select(col(ids.columns.head).as("doc_id")).distinct(),
          Seq("doc_id"), "left_semi")
      case None => index.postings
    }
    base.filter(col("term").isin(lowered: _*))
      .join(broadcast(index.termDf.filter(col("term").isin(lowered: _*))), "term")
      .crossJoin(broadcast(index.docStats))
      .select(col("doc_id"),
        (log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (K1 + 1)) /
          (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / col("avgdl")))).as("term_score"))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_score")).as("score"))
  }

  /** Ad-hoc BM25 (no maintained index): tokenizes once — the postings are
    * cached so the three consumers (score join, docStats, termDf) don't
    * each re-run the scan→tokenize→explode→agg subtree. */
  def score(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String]): DataFrame = {
    val post = postings(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (docStats, termDf) = corpusStats(post)
    scoreWithIndex(Index(post, docStats, termDf), queryTerms)
  }

  /** Matching DuckDB oracle SQL for [[score]] over the `documents` table. */
  def oracleSql(queryTerms: Seq[String], roundTo: Int, k: Int): String = {
    val terms = queryTerms.distinct.map(t => s"'$t'").mkString(", ")
    s"""WITH post AS (
       |  SELECT doc_id, len(string_split(text,' ')) AS dl, t.term, count(*) AS tf
       |  FROM documents, unnest(string_split(text,' ')) AS t(term)
       |  GROUP BY doc_id, dl, t.term),
       |stats AS (SELECT count(DISTINCT doc_id) AS n_docs,
       |          (SELECT avg(dl) FROM (SELECT DISTINCT doc_id, dl FROM post)) AS avgdl FROM post),
       |tdf AS (SELECT term, count(DISTINCT doc_id) AS df FROM post GROUP BY term)
       |SELECT doc_id, round(sum(
       |  ln(1.0 + (n_docs - df + 0.5)/(df + 0.5)) * (tf * ${K1 + 1}) /
       |  (tf + $K1 * (1 - $B + $B * dl / avgdl))), $roundTo) AS bm25
       |FROM post JOIN tdf USING(term) CROSS JOIN stats
       |WHERE term IN ($terms)
       |GROUP BY doc_id
       |ORDER BY bm25 DESC, doc_id LIMIT $k""".stripMargin.replace('\n', ' ')
  }
}
