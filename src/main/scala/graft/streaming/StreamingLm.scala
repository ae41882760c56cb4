package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming Kneser-Ney language-model maintenance: the ingest-time
  * side of [[graft.operators.TextAnalysis.writeKnCounts]] — each
  * micro-batch explodes ONLY its own documents into one algebraic
  * (w1, w2, c) bigram segment ([[graft.operators.TextAnalysis
  * .absorbKnCounts]]), so the train corpus is never re-scanned as it
  * grows. Scoring at any point reads the merged segments
  * ([[currentScores]]) and is spec-gated equal to inline
  * `knBigramLmScore` over the full corpus seen so far (a mid-corpus
  * split changes nothing — bigram counts are plain sums, and the
  * distinct-count derivatives re-derive from the merged table).
  *
  * The same LSM posture as every maintainer here ([[StreamingDrift]],
  * [[StreamingSketch]], the index maintainers): per-batch O(delta)
  * segment appends, merge-on-read, no Spark state-store growth.
  */
object StreamingLm {

  /** per micro-batch: one bigram-count segment write (O(batch)),
    * keyed by the batch id so an at-least-once replay rewrites the
    * same segment instead of double-counting it */
  def maintainKnCounts(stream: DataFrame, textCol: String, dir: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.TextAnalysis.absorbKnCounts(batch, textCol, dir,
          Lsm.segmentKey(checkpoint, batchId))
        ()
      }
      .start()

  /** KN-score `score` docs against everything streamed so far —
    * bounded-table reads only (the merged bigram-type table), zero
    * corpus re-scans */
  def currentScores(spark: SparkSession, dir: String, score: DataFrame,
      idCol: String, textCol: String, discount: Double = 0.75,
      eps: Double = 1e-10): DataFrame =
    graft.operators.TextAnalysis.knFromCounts(
      graft.operators.TextAnalysis.readKnCounts(spark, dir),
      score, idCol, textCol, discount, eps)
}
