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

  /** fold the accumulated segments back to one (bounds read cost):
    * the merged state lands in a sibling dir first, then swaps in —
    * never an overwrite of a path being read */
  def compact(spark: SparkSession, dir: String, keys: Seq[String]): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val tmp = s"$dir.compacting"
    state(spark, dir, keys).write.mode("overwrite").parquet(tmp)
    Files.walk(Paths.get(dir)).iterator().asScala.toSeq
      .sortBy(-_.getNameCount).foreach(Files.delete(_))
    Files.move(Paths.get(tmp), Paths.get(dir))
  }
}
