package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Streaming trailing z-score anomaly scoring:
  * [[graft.operators.EventAnalytics.anomalies]] maintained over an
  * unbounded event stream with flatMapGroupsWithState — each event
  * scores against its OWN key's preceding-window stats the moment it
  * arrives (the alerting shape of a telemetry pipeline; nightly batch
  * re-scoring alarms hours late).
  *
  * State per key is the trailing window's (ts, value) pairs — bounded
  * by window span × per-key event rate, evicted as the series advances
  * (an entry older than newest-ts − window can never enter a later
  * in-order event's baseline). In-order-per-key delivery is the
  * contract (the usual partitioned-log guarantee); a late event scores
  * against state as of arrival. Each invocation sorts its batch's rows
  * by (ts, id) before scoring, so stream-accumulated scores equal the
  * batch operator on the same corpus for ANY micro-batch split
  * (spec-gated, including a mid-series split).
  */
object StreamingAnomaly {
  case class Obs(event_id: Long, key: String, ts_ns: Long, value: Double)
  case class WinState(ts: Array[Long], v: Array[Double])
  case class Scored(event_id: Long, baseline_n: Long,
      baseline_mean: Option[Double], z: Option[Double], is_anomaly: Boolean)

  def score(events: DataFrame, keyCols: Seq[String], idCol: String,
      tsNsCol: String, valueCol: String, windowNs: Long, minN: Int = 5,
      threshold: Double = 3.0): Dataset[Scored] = {
    require(windowNs > 0, "windowNs must be positive")
    require(minN >= 2, "minN must be >= 2 (stddev needs two points)")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(idCol).cast("long").as("event_id"),
        concat_ws("\u0001", keyCols.map(col): _*).as("key"),
        col(tsNsCol).cast("long").as("ts_ns"),
        col(valueCol).cast("double").as("value"))
      .as[Obs]
      .groupByKey(_.key)
      .flatMapGroupsWithState[WinState, Scored](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, rows, state) =>
        val st = state.getOption.getOrElse(WinState(Array.empty, Array.empty))
        var buf = st.ts.zip(st.v).toVector // ascending ts
        val out = rows.toVector.sortBy(r => (r.ts_ns, r.event_id)).map { r =>
          // batch-operator frame parity: RANGE [-window, -1] on integer
          // ns == [ts - window, ts), so same-ts peers never see each
          // other regardless of processing order
          val lo = r.ts_ns - windowNs
          val base = buf.filter { case (t, _) => t >= lo && t < r.ts_ns }
          val n = base.size
          val mean = if (n > 0) Some(base.map(_._2).sum / n) else None
          val z =
            if (n >= minN) {
              val m = mean.get
              val sd = math.sqrt(
                base.map { case (_, x) => (x - m) * (x - m) }.sum / (n - 1))
              if (sd > 0) Some((r.value - m) / sd) else None
            } else None
          buf = (buf :+ (r.ts_ns -> r.value)).sortBy(_._1)
          Scored(r.event_id, n, mean, z, z.exists(x => math.abs(x) > threshold))
        }
        val newest = if (buf.nonEmpty) buf.last._1 else Long.MinValue
        val kept = buf.filter(_._1 >= newest - windowNs)
        state.update(WinState(kept.map(_._1).toArray, kept.map(_._2).toArray))
        out.iterator
      }
  }
}
