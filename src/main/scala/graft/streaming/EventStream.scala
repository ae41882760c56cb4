package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Structured Streaming ingest over the `events` table (Spark-native
  * extension — SURVEY.md §2.13: the reference has no continuous queries,
  * so this goes beyond parity: watermarked tumbling-window aggregation
  * exactly matching the batch q_events_hourly results).
  *
  * The parquet file source reads TIMESTAMP(NANOS) as long (nanosAsLong),
  * so the stream derives the microsecond event-time column the same way
  * graft.sources.Tables does — batch/stream parity by construction.
  */
object EventStream {

  /** open the events dir as a file-source stream */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // the table is a single parquet FILE; the file stream source wants a
    // directory, so stream the parent dir filtered to this one file
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros((col("ts_ns") / 1000L).cast("long")))
  }

  /** watermarked tumbling-window counts per event type */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"), col("n"), col("total_value"))

  /** run to completion against the (finite) file source into a memory
    * sink; returns the sink table name */
  def runToMemorySink(spark: SparkSession, dir: String, name: String): StreamingQuery = {
    val q = hourlyCounts(readEvents(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .start()
    q.processAllAvailable()
    q
  }
}
