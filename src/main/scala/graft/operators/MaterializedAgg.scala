package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted materialized aggregate view over an append-mostly table —
  * the batch-facing lifecycle around [[IncrementalAgg]]'s algebraic
  * state, in the same LSM posture as the streaming index maintainers:
  * `create` writes the base state, each `refresh(delta)` APPENDS the
  * delta's state as a new segment (O(delta) write — history state is
  * never read, let alone the history itself), readers merge segments
  * algebraically on load, and `compact` folds the segment pile back to
  * one. Because count/sum/min/max merge associatively, the maintained
  * view is bit-identical to a full recompute at every point — which is
  * exactly what the spec asserts.
  */
object MaterializedAgg {

  /** materialize the view: base state becomes segment zero */
  def create(df: DataFrame, keys: Seq[String], valueCol: String,
      dir: String): Unit =
    IncrementalAgg.state(df, keys, valueCol)
      .write.mode("overwrite").parquet(dir)

  /** absorb appended rows: aggregate ONLY the delta, append its state */
  def refresh(delta: DataFrame, keys: Seq[String], valueCol: String,
      dir: String): Unit =
    IncrementalAgg.state(delta, keys, valueCol)
      .write.mode("append").parquet(dir)

  /** merge-on-read current state (one row per key) */
  def state(spark: SparkSession, dir: String, keys: Seq[String]): DataFrame = {
    val segs = spark.read.parquet(dir)
    // a single groupBy IS the algebraic merge of however many segments
    // have accumulated
    IncrementalAgg.merge(segs.limit(0), segs, keys)
  }

  /** reader view with derived aggregates (avg from sum/count) */
  def read(spark: SparkSession, dir: String, keys: Seq[String]): DataFrame =
    IncrementalAgg.readout(state(spark, dir, keys), keys)

  /** Ingest-time maintenance: every micro-batch folds into the view as
    * one O(batch) state-segment append — the Structured Streaming twin
    * of [[refresh]], same files, same readers. */
  def maintain(stream: DataFrame, keys: Seq[String], valueCol: String,
      dir: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) refresh(batch, keys, valueCol, dir)
      }
      .start()

  /** Fold the accumulated segments back to one (bounds read cost).
    * Concurrent-append-safe: the segment FILES are snapshotted first,
    * only those files are merged, and only those files are deleted —
    * a segment appended mid-compaction (e.g. by a [[maintain]]
    * micro-batch) is neither read nor removed, it simply survives.
    * Crash window: a crash after the compacted segment lands but
    * before the old files are dropped leaves a transient double count
    * that the next [[compact]] repairs; there is no ordering that
    * loses appended state. */
  def compact(spark: SparkSession, dir: String, keys: Seq[String]): Unit = {
    import java.nio.file.{Files, Path, Paths}
    import scala.jdk.CollectionConverters._
    def partFiles(root: Path): Seq[Path] = {
      val walk = Files.walk(root)
      try walk.iterator().asScala.filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.startsWith("part-")).toList
      finally walk.close()
    }
    val snapshot = partFiles(Paths.get(dir))
    if (snapshot.nonEmpty) {
      val segs = spark.read.parquet(snapshot.map(_.toString): _*)
      val tmp = s"$dir.compacting"
      IncrementalAgg.merge(segs.limit(0), segs, keys)
        .write.mode("overwrite").parquet(tmp)
      // swap in: new compacted files first (readers may double-count for
      // an instant), then drop exactly the snapshotted segments
      partFiles(Paths.get(tmp)).foreach { p =>
        Files.move(p, Paths.get(dir).resolve(
          s"compacted-${java.util.UUID.randomUUID()}-${p.getFileName}"))
      }
      snapshot.foreach(Files.deleteIfExists(_))
      val tw = Files.walk(Paths.get(tmp))
      try tw.iterator().asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(Files.deleteIfExists(_))
      finally tw.close()
    }
  }
}
