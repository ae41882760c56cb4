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
  * segment table that grows by ONE ROW per batch. Periodic compaction
  * (a plain [[Bm25.save]]) rewrites segments into one, exactly like an
  * LSM merge.
  */
object StreamingText {

  /** inverted postings: (term, doc_id) rows are a pure append */
  def maintainInverted(stream: DataFrame, dir: String, idCol: String,
      textCol: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        InvertedIndex.build(batch, idCol, textCol)
          .write.mode("append").parquet(dir)
        ()
      }
      .start()

  def currentInverted(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** BM25: postings append + one partial-stats segment per batch */
  def maintainBm25(stream: DataFrame, dir: String, idCol: String,
      textCol: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val post = Bm25.postings(batch, idCol, textCol)
          .localCheckpoint() // tokenize once, feed both writes
        val (ds, tdf) = Bm25.corpusStats(post)
        post.write.mode("append").parquet(s"$dir/postings")
        ds.write.mode("append").parquet(s"$dir/doc_stats")
        tdf.write.mode("append").parquet(s"$dir/term_df")
        ()
      }
      .start()

  /** merge-on-read over the segment tables: weighted-mean avgdl and
    * summed dfs — a tiny aggregate (one row / term-df row per batch) */
  def currentBm25(spark: SparkSession, dir: String): Bm25.Index = {
    val docStats = spark.read.parquet(s"$dir/doc_stats")
      .agg((sum(col("n_docs") * col("avgdl")) / sum(col("n_docs"))).as("avgdl"),
        sum(col("n_docs")).as("n_docs"))
      .select(col("n_docs"), col("avgdl"))
    val termDf = spark.read.parquet(s"$dir/term_df")
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    Bm25.Index(spark.read.parquet(s"$dir/postings"), docStats, termDf)
  }
}
