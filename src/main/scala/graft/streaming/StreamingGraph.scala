package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.GraphStore

/** Streaming maintenance of the persisted GRAPH edge artifact
  * ([[graft.operators.GraphStore]]) — the graph family's member of the
  * maintained-index story next to [[StreamingText]] / [[StreamingAnn]]
  * / [[StreamingDedup]]: edge micro-batches land as replay-idempotent
  * Lsm segments of collapsed (src, dst, multiplicity) partial counts,
  * node deletes tombstone, and readers merge-on-read — so the
  * pagerank/hits/walks family always serves from graph state that is
  * as fresh as the last micro-batch, exactly like BM25 scoring serves
  * from the last text segment.
  *
  * Counts are ALGEBRAIC, so an at-least-once re-delivered batch
  * rewrites its own `batch=<key>` segment instead of double-counting
  * (the [[Lsm.absorbSegment]] contract); compaction is the caller's
  * stop-the-world [[GraphStore.compact]].
  */
object StreamingGraph {

  /** absorb streaming edge rows into the artifact at `dir` */
  def maintain(stream: DataFrame, dir: String, srcCol: String,
      dstCol: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // restarted maintainer: complete an interrupted compaction swap
        // BEFORE absorbing (the StreamingText discipline)
        Lsm.recover(dir, "edges")
        GraphStore.absorb(batch, srcCol, dstCol, dir,
          Lsm.segmentKey(checkpoint, batchId))
        ()
      }
      .start()

  /** merged (src, dst, w) view, tombstones folded */
  def current(spark: SparkSession, dir: String): DataFrame =
    GraphStore.read(spark, dir)

  /** tombstone nodes (edges die with either endpoint at read) */
  def deleteNodes(ids: DataFrame, idCol: String, dir: String): Unit =
    GraphStore.deleteNodes(ids, idCol, dir)
}
