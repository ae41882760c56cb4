package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.AnnIndex

/** Streaming maintenance of a persisted ANN index — the ingest half of
  * the reference's maintained embedding indexes (new rows become
  * searchable without a rebuild; `cpp/deeplake_pg/index_search.cpp:
  * 114-169` searches the maintained artifact, and the index absorbs
  * appends incrementally).
  *
  * Spark shape: the index lives in an [[AnnIndex.save]] directory; a
  * Structured Streaming query consumes an (id, vector) stream and, per
  * micro-batch, assigns each new vector to its nearest EXISTING
  * centroid (a map-side projection over the literal-bound centroid
  * array — no shuffle, no KMeans refit) and appends the delta to
  * `dir/assignments`. Readers call [[current]] at any time for a
  * searchable up-to-date index.
  *
  * 100-TB posture: centroids drift only under distribution shift, so
  * cheap per-batch absorbs bracketed by periodic batch rebuilds is the
  * standard IVF maintenance pattern. Appends are parquet file adds —
  * no read-modify-write of existing data — and exactly-once delivery
  * comes from the checkpointed sink contract.
  */
object StreamingAnn {

  /** Start maintaining `dir` (an [[AnnIndex.save]] layout) from
    * `stream` rows carrying `idCol` and `vecCol`. The centroid set is
    * read once at start (it only changes on a rebuild, which writes a
    * new dir). */
  def maintain(stream: DataFrame, dir: String, idCol: String, vecCol: String,
      checkpoint: String): StreamingQuery = {
    val spark = stream.sparkSession
    val base = AnnIndex.load(spark, dir)
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // restarted maintainer: complete an interrupted compaction swap
        // before absorbing (see StreamingText.maintainInverted)
        Lsm.recover(dir, "assignments")
        // lineage-keyed: an at-least-once replay rewrites its own
        // delta segment — duplicate assignment rows would surface the
        // same id twice from every probe
        Lsm.absorbSegment(AnnIndex.assignDelta(base, batch, idCol, vecCol),
          s"$dir/assignments", Lsm.segmentKey(checkpoint, batchId))
        ()
      }
      .start()
  }

  /** The up-to-date searchable index (base build + every absorbed
    * micro-batch so far, minus every tombstoned id). */
  def current(spark: SparkSession, dir: String): AnnIndex.Index = {
    Lsm.recover(dir, "assignments")
    val base = AnnIndex.load(spark, dir)
    Lsm.tombstones(spark, dir) match {
      case Some(t) => AnnIndex.deleteAssign(base, t, "id")
      case None => base
    }
  }

  /** Tombstone the vectors (one appended id segment — O(request), no
    * history rewrite); [[current]] folds them at merge-on-read, so
    * deleted ids never surface from any probe. Centroids stay as-built —
    * a routing artifact, refreshed only by a rebuild (the reference
    * re-clusters on OPTIMIZE, not per-delete). */
  def delete(spark: SparkSession, dir: String, ids: DataFrame,
      idKey: String): Unit =
    Lsm.tombstone(ids, idKey, dir)

  /** Stop-the-world LSM merge: rewrite the assignment segments minus
    * the tombstones into ONE segment and drop the tombstones. Caller
    * pauses the maintainer first. */
  def compact(spark: SparkSession, dir: String): Unit = {
    current(spark, dir).assignments
      .write.mode("overwrite").parquet(s"$dir/assignments__compact/batch=compact")
    Lsm.swapIn(dir, "assignments")
    Lsm.clearTombstones(dir)
  }
}
