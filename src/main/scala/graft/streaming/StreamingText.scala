package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Bm25, InvertedIndex}

/** Streaming maintenance of the persisted TEXT indexes (inverted
  * postings + BM25), completing the maintained-index story next to
  * [[StreamingAnn]] — the reference keeps these fresh with a background
  * WAL sync (`cpp/deeplake_pg/sync_worker.cpp`).
  *
  * Design is append-only, LSM-style: every micro-batch tokenizes ONLY
  * its own docs and appends (a) postings rows and (b) one partial-stats
  * SEGMENT (doc count, avgdl, per-term df). Nothing ever read-modify-
  * writes existing data — at 100 TB a batch commit is a handful of new
  * parquet files. Readers merge segments on load: the same algebra as
  * [[Bm25.appendToIndex]] (doc counts and dfs are additive over
  * disjoint doc sets; avgdl is a count-weighted mean), executed over a
  * segment table that grows by ONE ROW per batch.
  *
  * DELETE mirrors append ([[delete]]): ids land as a tombstone segment,
  * readers fold it at merge-on-read (postings anti-join; BM25 stats
  * un-mix algebraically through [[Bm25.deleteFromIndex]] — the dead
  * docs' own postings carry exactly the counts to subtract, so the
  * surviving corpus is never re-read), and [[compactInverted]] /
  * [[compactBm25]] rewrite segments into one and drop the tombstones —
  * an LSM merge, right-to-be-forgotten included.
  */
object StreamingText {

  /** inverted postings: (term, doc_id) rows are a pure append into
    * `dir/postings` */
  def maintainInverted(stream: DataFrame, dir: String, idCol: String,
      textCol: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // restarted maintainer: complete an interrupted compaction swap
        // BEFORE absorbing — writing into a recreated live dir would
        // make recover refuse the move and strand the merged history
        Lsm.recover(dir, "postings")
        Lsm.absorbSegment(InvertedIndex.build(batch, idCol, textCol),
          s"$dir/postings", Lsm.segmentKey(checkpoint, batchId))
        ()
      }
      .start()

  def currentInverted(spark: SparkSession, dir: String): DataFrame = {
    Lsm.recover(dir, "postings")
    Lsm.dropTombstoned(spark, dir,
      Lsm.readSegments(spark, s"$dir/postings"), "doc_id")
  }

  /** Tombstone the docs (one appended id segment — O(request), no
    * history rewrite). Serves BOTH layouts: [[currentInverted]] and
    * [[currentBm25]] fold the same tombstone set. */
  def delete(spark: SparkSession, dir: String, ids: DataFrame,
      idKey: String): Unit =
    Lsm.tombstone(ids, idKey, dir)

  /** Stop-the-world LSM merge for the inverted layout: fold every
    * postings segment + the tombstones into ONE segment, drop the
    * tombstones. Caller pauses the maintainer first. */
  def compactInverted(spark: SparkSession, dir: String): Unit = {
    currentInverted(spark, dir)
      .write.mode("overwrite").parquet(s"$dir/postings__compact/batch=compact")
    Lsm.swapIn(dir, "postings")
    Lsm.clearTombstones(dir)
  }

  /** BM25: postings append + one partial-stats segment per batch */
  def maintainBm25(stream: DataFrame, dir: String, idCol: String,
      textCol: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // restarted maintainer: finish an interrupted swapInAll first —
        // absorbing into stale live dirs would let the next reader's
        // recoverAll rmTree this batch's checkpoint-committed segments
        Lsm.recoverAll(dir, Seq("postings", "doc_stats", "term_df"))
        val post = Bm25.postings(batch, idCol, textCol)
          .localCheckpoint() // tokenize once, feed both writes
        val (ds, tdf) = Bm25.corpusStats(post)
        // lineage-keyed: doc counts/avgdl/dfs merge algebraically, so
        // an at-least-once replay must rewrite, never re-add stats
        val key = Lsm.segmentKey(checkpoint, batchId)
        Lsm.absorbSegment(post, s"$dir/postings", key)
        Lsm.absorbSegment(ds, s"$dir/doc_stats", key)
        Lsm.absorbSegment(tdf, s"$dir/term_df", key)
        ()
      }
      .start()

  /** merge-on-read over the segment tables: weighted-mean avgdl and
    * summed dfs — a tiny aggregate (one row / term-df row per batch) —
    * then the tombstone fold: [[Bm25.deleteFromIndex]] un-mixes the
    * dead docs out of the merged stats from their own postings. */
  def currentBm25(spark: SparkSession, dir: String): Bm25.Index = {
    Lsm.recoverAll(dir, Seq("postings", "doc_stats", "term_df"))
    val docStats = Lsm.readSegments(spark, s"$dir/doc_stats")
      .agg((sum(col("n_docs") * col("avgdl")) / sum(col("n_docs"))).as("avgdl"),
        sum(col("n_docs")).as("n_docs"))
      .select(col("n_docs"), col("avgdl"))
    val termDf = Lsm.readSegments(spark, s"$dir/term_df")
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    val merged = Bm25.Index(Lsm.readSegments(spark, s"$dir/postings"),
      docStats, termDf)
    Lsm.tombstones(spark, dir) match {
      case Some(t) => Bm25.deleteFromIndex(merged, t, "id")
      case None => merged
    }
  }

  /** Stop-the-world LSM merge for the BM25 layout: rewrite the folded
    * index (segments merged, tombstones un-mixed) as one segment set and
    * drop the tombstones. Caller pauses the maintainer first. The three
    * dirs + the tombstone drop commit TOGETHER ([[Lsm.swapInAll]]'s
    * marker protocol) — per-dir swaps are each crash-safe, but a crash
    * between them would pair new postings with old stats, and the
    * algebraic stats un-mix is not idempotent. */
  def compactBm25(spark: SparkSession, dir: String): Unit = {
    val idx = currentBm25(spark, dir)
    idx.postings.write.mode("overwrite")
      .parquet(s"$dir/postings__compact/batch=compact")
    idx.docStats.write.mode("overwrite")
      .parquet(s"$dir/doc_stats__compact/batch=compact")
    idx.termDf.write.mode("overwrite")
      .parquet(s"$dir/term_df__compact/batch=compact")
    Lsm.swapInAll(dir, Seq("postings", "doc_stats", "term_df"))
  }
}
