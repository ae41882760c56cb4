package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation — recall@k / precision@k / MRR / NDCG@k
  * of a ranked run against a relevance-judgment set, per query. This is
  * the evaluation loop the reference's RAG guide builds toward
  * (`docs/docs/guide/rag.md:45-157`: retrieve → judge → tune k and the
  * index knobs); here it is a first-class operator with a SQL oracle
  * instead of ad-hoc spec arithmetic, and the ANN/MAXSIM recall gates
  * (AnnSpec / TqlSpec) evaluate through it.
  *
  * Scale shape: one (query, id) equi-join of the run against the
  * distinct judgment set + one per-query hash-agg; the judgment-size
  * frame re-joins on the query key. The query universe is the JUDGED
  * queries: a judged query missing from the run scores 0 (the honest
  * "retrieval returned nothing relevant"), a run query with no
  * judgments drops (its metrics are undefined).
  *
  * NDCG uses the natural-log discount on BOTH dcg and idcg — the log
  * base cancels in the ratio, and ln is the engine-portable primitive
  * every existing oracle already leans on (1/ln precedent: adamicAdar).
  */
object SearchMetrics {

  /** `run`: (queryCol, idCol, rankCol) with rank 1-based;
    * `judgments`: (relQueryCol, relIdCol) relevant pairs (deduped here).
    * Returns per judged query:
    * (queryCol, n_relevant, hits, precision_at_k, recall_at_k, mrr,
    * ndcg_at_k), 6dp floats. */
  def retrievalMetrics(run: DataFrame, queryCol: String, idCol: String,
      rankCol: String, judgments: DataFrame, relQueryCol: String,
      relIdCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // the run is deduped on (query, id) keeping the best rank (r13
    // advice): a retriever that returns the same document twice inside
    // the top-k must not double-count it — precision/recall stay <= 1
    // and NDCG credits each relevant document once, per TREC convention.
    // A map-side partial agg over <= k rows per query; no-op (and thus
    // oracle-invariant) for the row_number-generated runs the registered
    // queries feed it.
    val r = run.select(col(queryCol).as("__q"), col(idCol).as("__id"),
        col(rankCol).cast("long").as("__r"))
      .filter(col("__r") <= k)
      .groupBy(col("__q"), col("__id")).agg(min(col("__r")).as("__r"))
    val rel = judgments.select(col(relQueryCol).as("__q"),
      col(relIdCol).as("__id")).distinct()
    val nRel = rel.groupBy(col("__q")).agg(count(lit(1)).as("n_relevant"))
    val tagged = r.join(rel.withColumn("__h", lit(1L)), Seq("__q", "__id"), "left")
      .select(col("__q"), col("__r"), coalesce(col("__h"), lit(0L)).as("__h"))
    val perQ = tagged.groupBy(col("__q")).agg(
      sum(col("__h")).as("__hits"),
      max(when(col("__h") === 1, lit(1.0) / col("__r"))).as("__mrr"),
      sum(when(col("__h") === 1,
        lit(1.0) / log(col("__r").cast("double") + 1.0))).as("__dcg"))
    // ideal DCG: the first min(n_relevant, k) ranks all relevant — a
    // bounded in-plan fold, same left-to-right order as SQL list_reduce
    val idcg = aggregate(
      sequence(lit(1), least(col("n_relevant"), lit(k.toLong)).cast("int")),
      lit(0.0),
      (a, i) => a + lit(1.0) / log(i.cast("double") + 1.0))
    val hits = coalesce(col("__hits"), lit(0L))
    nRel.join(perQ, Seq("__q"), "left")
      .select(col("__q").as(queryCol),
        col("n_relevant"),
        hits.as("hits"),
        round(hits / lit(k.toDouble), 6).as("precision_at_k"),
        round(hits / col("n_relevant").cast("double"), 6).as("recall_at_k"),
        round(coalesce(col("__mrr"), lit(0.0)), 6).as("mrr"),
        round(coalesce(col("__dcg"), lit(0.0)) / idcg, 6).as("ndcg_at_k"))
  }
}
