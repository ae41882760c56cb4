package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Structured Streaming ingest over the `events` table (Spark-native
  * extension — SURVEY.md §2.13: the reference has no continuous queries,
  * so this goes beyond parity: watermarked tumbling-window aggregation
  * exactly matching the batch q_events_hourly results).
  *
  * The stream derives `ts`/`ts_ns` from whatever logical type the corpus
  * stores (TIMESTAMP(MICROS) NTZ currently; nanos-as-long in older
  * generations) the same way graft.sources.Tables does — batch/stream
  * parity by construction.
  */
object EventStream {

  /** open the events dir as a file-source stream; `glob` widens the file
    * filter (e.g. "*.parquet" for a multi-file landing dir) */
  def readEvents(spark: SparkSession, dir: String, glob: String = "events.parquet"): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = spark.read.option("pathGlobFilter", glob).parquet(dir).schema
    // the table is a single parquet FILE; the file stream source wants a
    // directory, so stream the parent dir filtered to this one file
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", glob)
      .parquet(dir)
    schema("ts").dataType match {
      case LongType =>
        stream.withColumnRenamed("ts", "ts_ns")
          // integer DIV, not `/` (double division rounds some nanos up 1us)
          .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
      case _ =>
        // micros corpus; UTC session makes the NTZ cast exact
        stream.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
  }

  /** watermarked tumbling-window counts per event type */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"), col("n"), col("total_value"))

  /** Sliding-window counts (2h window, 1h slide): each event lands in
    * exactly two hour-aligned windows. Works identically on batch frames
    * (the DuckDB-oracled q_events_sliding is the batch twin). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:00").as("win_start"),
        col("event_type"), col("n"))

  /** Per-user sessionization via native session windows (gap-based
    * stateful streaming — the Spark-idiomatic form of
    * mapGroupsWithState sessionization; state merges windows closer than
    * the gap, the watermark bounds it). Works identically on batch
    * frames, so the DuckDB-oracled batch twin (q_user_sessions) pins the
    * semantics and the spec checks stream == batch. */
  def userSessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"))

  /** Streaming exact dedup: watermark-bounded state keeps the FIRST
    * arrival per key and expires once the watermark passes — the
    * streaming twin of exact dedup for at-least-once ingest (duplicate
    * deliveries land within the watermark horizon; state size stays
    * bounded by the horizon, not the stream length). */
  def dedupEvents(events: DataFrame, keys: Seq[String] = Seq("event_id")): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-stream event-time interval join: clicks landing within
    * `window` after a purchase by the same user. Both sides carry
    * watermarks so Spark bounds the join state: a purchase can stop
    * waiting for clicks once the click watermark passes its upper bound,
    * and vice versa — the streaming twin of the batch RangeJoin
    * (q_range_join), and the SAME code executes on batch frames (the
    * spec checks stream == batch). */
  def purchaseClickJoin(clicks: DataFrame, purchases: DataFrame,
      window: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val p = purchases.withWatermark("ts", "2 hours")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    c.join(p,
        col("c_user") === col("p_user") &&
        col("c_ts") >= col("p_ts") &&
        col("c_ts") <= col("p_ts") + expr(s"interval $window"), "inner")
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"))
  }

  /** Stream-static dimension enrichment: a streaming fact LEFT-joined
    * to a small static dimension. The dim broadcasts, so the stream
    * stays map-side (no shuffle, no state) and Spark re-resolves the
    * static side per micro-batch — the slowly-changing-dimension
    * enrichment every event pipeline runs. The SAME code executes on a
    * batch frame (spec gates stream == batch). */
  def enrich(events: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    events.join(broadcast(dim), keys, "left")

  /** input/state/output rows for the custom-state profile operator */
  final case class EventRow(user_id: Long, event_type: String, value: Double, ts_us: Long)
  final case class UserState(n: Long, total: BigDecimal, lastTs: Long, types: Seq[String])
  final case class UserProfile(user_id: Long, n_events: Long, total_value: Double,
      n_types: Int, last_ts_us: Long)

  /** Per-user running profile via CUSTOM state (flatMapGroupsWithState):
    * cumulative event count, value total, distinct-type count (types are
    * a small closed set, so the state stays O(1) per user), and last-seen
    * event time. Each micro-batch emits the updated profile row for every
    * user it touched (Update mode) — the change-capture shape a feature
    * store ingests.
    *
    * State is keyed by user and bounded: at scale idle users would expire
    * via an event-time timeout against the watermark; the finite replay
    * here never needs to drop state, so NoTimeout keeps the operator
    * deterministic for the batch-parity check. The SAME code runs on a
    * batch frame (Spark executes mapGroups-with-state over batch input as
    * one invocation per key with empty initial state), which is what the
    * DuckDB-oracled driver query pins down.
    */
  def userProfiles(events: DataFrame): Dataset[UserProfile] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      .as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, UserProfile](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (uid, rows, state) =>
        val prev = state.getOption.getOrElse(UserState(0L, BigDecimal(0), Long.MinValue, Nil))
        // totals accumulate as exact BigDecimal (each double's shortest
        // decimal form), so the fold is order-insensitive: a
        // partition-iterator reorder can't flip round(total, 2) on a
        // .005 boundary the way float addition order could
        val next = rows.foldLeft(prev) { (s, e) =>
          UserState(s.n + 1, s.total + BigDecimal(e.value), math.max(s.lastTs, e.ts_us),
            if (s.types.contains(e.event_type)) s.types else s.types :+ e.event_type)
        }
        state.update(next)
        // HALF_UP to match SQL round(x, 2) on both engines
        val rounded = next.total
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
        Iterator(UserProfile(uid, next.n, rounded, next.types.size, next.lastTs))
      }
  }

  /** run to completion against the (finite) file source into a memory
    * sink; returns the sink table name */
  def runToMemorySink(spark: SparkSession, dir: String, name: String): StreamingQuery =
    runToMemorySink(hourlyCounts(readEvents(spark, dir)), name, "complete")

  def runToMemorySink(out: DataFrame, name: String, mode: String): StreamingQuery = {
    val q = out.writeStream.outputMode(mode)
      .format("memory").queryName(name)
      .start()
    q.processAllAvailable()
    q
  }
}
