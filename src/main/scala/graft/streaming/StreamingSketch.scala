package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

import graft.operators.Sketches

/** Streaming maintenance of a heavy-hitters (frequent items) summary —
  * the trending-tokens / hot-keys monitor of an ingest pipeline, in the
  * same LSM posture as [[StreamingText]]: every micro-batch reduces to a
  * fixed-size Misra-Gries summary (distributed map-side partial agg
  * inside the batch) appended as at most k (item, cnt) segment rows;
  * nothing read-modify-writes. Readers sum the segment rows per item and
  * apply ONE final MG shrink — summing mergeable summaries then
  * shrinking once is itself a valid merge (Agarwal et al., PODS 2012),
  * with total undercount bounded by 2n/(k+1) (one n/(k+1) from the
  * per-batch summaries, one from the final shrink). Compaction = write
  * the merged summary back as a single segment.
  */
object StreamingSketch {

  /** per-batch MG summary rows appended to `dir` */
  def maintainHeavyHitters(stream: DataFrame, dir: String, itemCol: String,
      k: Int, checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val mg = new Sketches.MisraGries(k)
        val summary = batch
          .agg(udaf(mg, Encoders.STRING)(col(itemCol).cast("string")))
          .head().getMap[String, Long](0)
        summary.toSeq.toDF("item", "cnt")
          .coalesce(1).write.mode("append").parquet(dir)
        ()
      }
      .start()

  /** Merge-on-read: sum the (<= k per batch) segment rows and shrink to
    * k once. The pre-shrink frame is tiny (k x number of batches), so
    * the driver-side shrink is bounded — it never sees item-level data. */
  def currentHeavyHitters(spark: SparkSession, dir: String, k: Int): DataFrame = {
    import spark.implicits._
    val summed = spark.read.parquet(dir)
      .groupBy(col("item")).agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mg = new Sketches.MisraGries(k)
    mg.merge(mg.zero, summed).toSeq.toDF("item", "cnt")
  }

  /** compaction: rewrite all segments as the single merged summary */
  def compact(spark: SparkSession, dir: String, k: Int): Unit = {
    val merged = currentHeavyHitters(spark, dir, k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    import spark.implicits._
    merged.toDF("item", "cnt")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }
}
