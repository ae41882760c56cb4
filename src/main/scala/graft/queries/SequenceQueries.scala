package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Grouping, Sampling}

/** TQL-specific reshaping operators (SURVEY.md §2.4, §2.8): sequence
  * GROUP BY / UNGROUP, EXPAND BY patch tiling, weighted sampling.
  */
object SequenceQueries extends QueryModule {

  override def qs: Seq[(String, Q)] = Seq(

    // ---- GROUP BY -> ordered sequences (group_statement across_type time)
    "q_group_sequence" -> Q(
      (s, dir) => {
        Grouping.groupToSequences(
            table(s, dir, "lineitem").filter(col("l_orderkey") < 200),
            keys = Seq("l_orderkey"), ordCol = "l_linenumber",
            valueCols = Seq("l_quantity"))
          .select(col("l_orderkey"),
            // serialize: driver row-sort can't order array cells; quantities
            // are scaled to integer hundredths for engine-stable formatting
            concat_ws(",", transform(col("l_quantity_seq"),
              q => round(q.cast("double") * 100d).cast("long"))).as("qty_seq"),
            size(col("l_quantity_seq")).as("seq_len"))
          .orderBy(col("l_orderkey"))
      },
      Some("""SELECT l_orderkey, array_to_string(list_transform(
             |list(l_quantity ORDER BY l_linenumber, l_quantity), q -> round(q*100)::BIGINT), ',') AS qty_seq,
             |count(*)::INTEGER AS seq_len FROM lineitem WHERE l_orderkey < 200
             |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin.replace('\n', ' '))),

    // ---- UNGROUP: sequences back to rows with 0-based position
    "q_ungroup_roundtrip" -> Q(
      (s, dir) => {
        val grouped = Grouping.groupToSequences(
          table(s, dir, "lineitem").filter(col("l_orderkey") < 100),
          keys = Seq("l_orderkey"), ordCol = "l_linenumber",
          valueCols = Seq("l_quantity"))
        Grouping.ungroup(grouped, "l_quantity_seq", keep = Seq("l_orderkey"))
          .orderBy(col("l_orderkey"), col("pos"))
      },
      Some("""SELECT l_orderkey,
             |CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity) - 1 AS INTEGER) AS pos,
             |l_quantity AS value
             |FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, pos""".stripMargin.replace('\n', ' '))),

    // ---- sequence grouping over event streams (per-user event history)
    "q_group_events" -> Q(
      (s, dir) => {
        Grouping.groupToSequences(
            table(s, dir, "events").filter(col("user_id") < 10),
            keys = Seq("user_id"), ordCol = "ts_ns", valueCols = Seq("event_type"))
          .select(col("user_id"), concat_ws(",", col("event_type_seq")).as("event_type_seq"),
            size(col("event_type_seq")).as("n_events"),
            element_at(col("event_type_seq"), 1).as("first_event"),
            element_at(col("event_type_seq"), -1).as("last_event"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, array_to_string(list(event_type ORDER BY ts, event_type), ',') AS event_type_seq,
             |count(*)::INTEGER AS n_events,
             |(list(event_type ORDER BY ts, event_type))[1] AS first_event,
             |(list(event_type ORDER BY ts, event_type))[-1] AS last_event
             |FROM events WHERE user_id < 10 GROUP BY user_id ORDER BY user_id""".stripMargin.replace('\n', ' '))),

    // ---- EXPAND BY 4 4: tile 8x8 tensors (embeddings reshaped) into 4 patches
    "q_expand_patches" -> Q(
      (s, dir) => {
        val e = table(s, dir, "embeddings").filter(col("vec_id") < 10)
        Grouping.expandBy(e, "embedding", rows = 8, cols = 8, h = 4, w = 4,
            keep = Seq("vec_id"))
          .select(col("vec_id"), col("patch_idx"),
            concat_ws(",", transform(col("patch"),
              x => round(x.cast("double") * 1e6d).cast("long"))).as("patch"))
          .orderBy(col("vec_id"), col("patch_idx"))
      },
      Some("""SELECT vec_id, p.i::INTEGER AS patch_idx,
             |array_to_string(list_transform(range(0, 16), k ->
             |  round(embedding[((p.i//2)*4 + k//4)*8 + (p.i%2)*4 + (k%4) + 1]::DOUBLE * 1e6)::BIGINT), ',') AS patch
             |FROM embeddings, range(4) AS p(i) WHERE vec_id < 10
             |ORDER BY vec_id, patch_idx""".stripMargin.replace('\n', ' '))),

    // ---- tumbling-window aggregation over the event stream (batch form;
    // the Structured Streaming twin lives in graft.streaming)
    "q_events_hourly" -> Q(
      (s, dir) => {
        table(s, dir, "events")
          .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hour"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
          .orderBy(col("hour"), col("event_type"))
      },
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
             |event_type, count(*) AS n, round(sum(value),2) AS total_value
             |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin.replace('\n', ' '))),

    // ---- sliding-window counts (2h window, 1h slide): each event lands
    // in exactly two hour-aligned windows — batch twin of the streaming
    // sliding aggregation (EventStream.slidingCounts)
    "q_events_sliding" -> Q(
      (s, dir) => {
        table(s, dir, "events")
          .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(date_format(col("window.start"), "yyyy-MM-dd HH:00").as("win_start"),
            col("event_type"), col("n"))
          .orderBy(col("win_start"), col("event_type"))
      },
      Some("""WITH e AS (SELECT date_trunc('hour', ts) AS h, event_type FROM events),
             |w AS (SELECT h - to_hours(o) AS ws, event_type FROM e, unnest([0, 1]) AS t(o))
             |SELECT strftime(ws, '%Y-%m-%d %H:00') AS win_start, event_type, count(*) AS n
             |FROM w GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin.replace('\n', ' '))),

    // ---- gap-based sessionization via native session windows (stateful
    // streaming twin in graft.streaming.EventStream.userSessions; Spark's
    // rule: an event exactly `gap` after the previous one starts a NEW
    // session, i.e. window end = last event + gap, exclusive)
    "q_user_sessions" -> Q(
      (s, dir) => {
        val ev = table(s, dir, "events").filter(col("user_id") < 20)
        ev.groupBy(col("user_id"),
            session_window(col("ts"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            unix_micros(col("sw.start")).as("start_us"),
            unix_micros(col("sw.end")).as("end_us"),
            col("n_events"))
          .orderBy(col("user_id"), col("start_us"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events WHERE user_id < 20),
             |f AS (SELECT user_id, us, CASE WHEN us - lag(us) OVER
             |  (PARTITION BY user_id ORDER BY us) >= 1800000000 THEN 1 ELSE 0 END AS nw FROM e),
             |s AS (SELECT user_id, us, sum(nw) OVER
             |  (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid FROM f)
             |SELECT user_id, min(us) AS start_us, max(us) + 1800000000 AS end_us,
             |count(*) AS n_events
             |FROM s GROUP BY user_id, sid
             |ORDER BY user_id, start_us""".stripMargin.replace('\n', ' '))),

    // ---- per-user running profile through the CUSTOM-state operator
    // (flatMapGroupsWithState; EventStream.userProfiles) — the same code
    // path streams with Update-mode state, and the batch execution here
    // is what the oracle pins (round via rint inside the operator)
    "q_user_profiles" -> Q(
      (s, dir) => {
        graft.streaming.EventStream.userProfiles(table(s, dir, "events"))
          .toDF()
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, count(*) AS n_events,
             |round(sum(value), 2) AS total_value,
             |count(DISTINCT event_type) AS n_types,
             |max(epoch_us(ts)) AS last_ts_us
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin.replace('\n', ' '))),

    // ---- as-of join (operators/AsOfJoin): each click joined to the most
    // recent purchase by the same user; the oracle is DuckDB's native
    // ASOF JOIN. Times compare as exact nanosecond longs on both sides.
    "q_asof_join" -> Q(
      (s, dir) => {
        import graft.operators.AsOfJoin
        val ev = table(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts_ns"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts_ns"))
          .agg(max(col("value")).as("r_value"))
        AsOfJoin.asOf(clicks, purchases, "user_id", "ts_ns", Seq("r_value"))
          .select(col("event_id"), round(col("r_value"), 2).as("last_purchase_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             |r AS (SELECT user_id, ts, max(value) AS r_value FROM events
             |      WHERE event_type = 'purchase' GROUP BY user_id, ts)
             |SELECT l.event_id, round(r.r_value, 2) AS last_purchase_value
             |FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
             |ORDER BY l.event_id""".stripMargin.replace('\n', ' '))),

    // ---- forward as-of with tolerance (pandas merge_asof parity):
    // each click joined to the NEXT purchase within 24h; oracle is
    // DuckDB's native ASOF with the inequality flipped + a tolerance
    // post-filter
    "q_asof_forward" -> Q(
      (s, dir) => {
        import graft.operators.AsOfJoin
        val ev = table(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts_ns"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts_ns"))
          .agg(max(col("value")).as("r_value"))
        AsOfJoin.asOf(clicks, purchases, "user_id", "ts_ns", Seq("r_value"),
            direction = "forward", tolerance = Some(86400L * 1000000000L))
          .select(col("event_id"), round(col("r_value"), 2).as("next_purchase_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH l AS (SELECT event_id, user_id, epoch_ns(ts) AS t FROM events
             |  WHERE event_type = 'click'),
             |r AS (SELECT user_id, epoch_ns(ts) AS t, max(value) AS r_value FROM events
             |      WHERE event_type = 'purchase' GROUP BY user_id, epoch_ns(ts))
             |SELECT l.event_id, round(r.r_value, 2) AS next_purchase_value
             |FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.t <= r.t
             |WHERE r.t - l.t <= 86400000000000
             |ORDER BY l.event_id""".stripMargin.replace('\n', ' ')),
      doc = "forward as-of join (next purchase within 24h of each click)"),

    // ---- bucketed range join (operators/RangeJoin): clicks landing in
    // the hour after each purchase by the same user; equi-join on
    // (user, bin) + residual BETWEEN — never a nested-loop range join
    "q_range_join" -> Q(
      (s, dir) => {
        import graft.operators.RangeJoin
        val hourNs = 3600L * 1000 * 1000 * 1000
        val ev = table(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_ns").as("t"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_ns").as("lo"),
            (col("ts_ns") + hourNs).as("hi"))
        RangeJoin.pointInInterval(clicks, "t", purchases, "lo", "hi",
            Seq("user_id"), binWidth = hourNs)
          .groupBy(col("event_id")).agg(count(lit(1)).as("n_clicks"))
          .orderBy(col("event_id"))
      },
      Some("""WITH c AS (SELECT user_id, epoch_ns(ts) AS t FROM events WHERE event_type = 'click'),
             |p AS (SELECT event_id, user_id, epoch_ns(ts) AS lo,
             |      epoch_ns(ts) + 3600000000000 AS hi FROM events WHERE event_type = 'purchase')
             |SELECT p.event_id, count(*) AS n_clicks
             |FROM p JOIN c ON c.user_id = p.user_id AND c.t BETWEEN p.lo AND p.hi
             |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin.replace('\n', ' '))),

    // ---- ordered funnel (first-touch, strictly ordered): stage k's
    // frame is ONE user-key equi-join against stage k-1's shrinking
    // (user, ts) frame — never a per-user event-array build
    "q_funnel" -> Q(
      (s, dir) => graft.operators.EventAnalytics.funnel(
          table(s, dir, "events"), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"))
        .orderBy(col("stage_idx")),
      Some("""WITH s1 AS (SELECT user_id AS u, min(epoch_us(ts)) AS t FROM events
             |  WHERE event_type = 'view' GROUP BY 1),
             |s2 AS (SELECT e.user_id AS u, min(epoch_us(e.ts)) AS t FROM events e
             |  JOIN s1 ON e.user_id = s1.u
             |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t GROUP BY 1),
             |s3 AS (SELECT e.user_id AS u, min(epoch_us(e.ts)) AS t FROM events e
             |  JOIN s2 ON e.user_id = s2.u
             |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t GROUP BY 1)
             |SELECT 1 AS stage_idx, 'view' AS stage, (SELECT count(*) FROM s1) AS n_users
             |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
             |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
             |ORDER BY stage_idx""".stripMargin.replace('\n', ' ')),
      doc = "view -> click -> purchase conversion counts, strictly ordered"),

    // ---- cohort retention: users cohort by first-seen day; per
    // (cohort_day, day_offset) distinct active users
    "q_retention_cohorts" -> Q(
      (s, dir) => graft.operators.EventAnalytics.retentionCohorts(
          table(s, dir, "events"), "user_id", "ts", maxOffsetDays = 7)
        .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
          col("day_offset").cast("long").as("day_offset"), col("n_active"))
        .orderBy(col("cohort_day"), col("day_offset")),
      Some("""WITH b AS (SELECT user_id AS u, ts::DATE AS d FROM events),
             |fs AS (SELECT u, min(d) AS cd FROM b GROUP BY u),
             |a AS (SELECT DISTINCT b.u, fs.cd, datediff('day', fs.cd, b.d) AS o
             |      FROM b JOIN fs ON b.u = fs.u WHERE datediff('day', fs.cd, b.d) <= 7)
             |SELECT strftime(cd, '%Y-%m-%d') AS cohort_day, o AS day_offset,
             |count(*) AS n_active FROM a GROUP BY 1, 2
             |ORDER BY cohort_day, day_offset""".stripMargin.replace('\n', ' ')),
      doc = "day-granularity cohort retention over offsets 0..7"),

    // ---- lag-debounce: telemetry double-fire suppression — drop events
    // within 60s of the previous event of the same (user, type)
    "q_events_debounce" -> Q(
      (s, dir) => graft.operators.EventAnalytics.debounce(
          table(s, dir, "events").filter(col("user_id") < 30),
          "user_id", "ts_ns", "event_type", gapNs = 60000000000L)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts_ns"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, user_id, event_type, ts_ns FROM (
             |SELECT event_id, user_id, event_type, epoch_ns(ts) AS ts_ns,
             |  epoch_ns(ts) - lag(epoch_ns(ts)) OVER (
             |    PARTITION BY user_id, event_type ORDER BY epoch_ns(ts)) AS gap
             |FROM events WHERE user_id < 30) t
             |WHERE gap IS NULL OR gap >= 60000000000
             |ORDER BY event_id""".stripMargin.replace('\n', ' ')),
      doc = "suppress same-(user,type) events within 60s of their predecessor"),

    // ---- burst-collapse debounce: an arbitrarily long rapid-fire
    // chain keeps exactly its first event (gaps-and-islands)
    "q_events_debounce_burst" -> Q(
      (s, dir) => graft.operators.EventAnalytics.debounceStrict(
          table(s, dir, "events").filter(col("user_id") < 30),
          "user_id", "ts_ns", "event_type", gapNs = 60000000000L)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts_ns"))
        .orderBy(col("event_id")),
      Some("""WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts) AS t
             |  FROM events WHERE user_id < 30),
             |f AS (SELECT *, CASE WHEN t - lag(t) OVER w >= 60000000000
             |      OR lag(t) OVER w IS NULL THEN 1 ELSE 0 END AS ni FROM e
             |      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY t)),
             |i AS (SELECT *, sum(ni) OVER (PARTITION BY user_id, event_type
             |      ORDER BY t ROWS UNBOUNDED PRECEDING) AS isl FROM f),
             |k AS (SELECT *, row_number() OVER (PARTITION BY user_id, event_type, isl
             |      ORDER BY t) AS rk FROM i)
             |SELECT event_id, user_id, event_type, t AS ts_ns FROM k WHERE rk = 1
             |ORDER BY event_id""".stripMargin.replace('\n', ' ')),
      doc = "burst-collapse debounce: first event per gap-burst survives"),

    // ---- trailing 24h rolling aggregate per user: RANGE frame over
    // the numeric time column — one window shuffle, no self-join
    "q_rolling_window" -> Q(
      (s, dir) => graft.operators.EventAnalytics.rollingWindow(
          table(s, dir, "events").filter(col("user_id") < 30)
            .select(col("event_id"), col("user_id"), col("ts_ns"), col("value")),
          "user_id", "ts_ns", "value", windowNs = 86400L * 1000000000L)
        .select(col("event_id"), round(col("rolling_sum"), 2).as("rolling_sum"),
          col("rolling_n"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, round(sum(value) OVER w, 2) AS rolling_sum,
             |count(*) OVER w AS rolling_n
             |FROM (SELECT event_id, user_id, epoch_ns(ts) AS t, value
             |      FROM events WHERE user_id < 30)
             |WINDOW w AS (PARTITION BY user_id ORDER BY t
             |  RANGE BETWEEN 86399999999999 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin.replace('\n', ' ')),
      doc = "per-user trailing-24h rolling sum/count (RANGE window frame)"),

    // ---- daily active/new/returning users: (user, day) distinct +
    // first-seen agg, user-keyed join — never a window or calendar join
    "q_events_dau" -> Q(
      (s, dir) => graft.operators.EventAnalytics.activeUsers(
          table(s, dir, "events"), "user_id", "ts")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("dau"), col("new_users"), col("returning_users"))
        .orderBy(col("day")),
      Some("""WITH bd AS (SELECT DISTINCT user_id AS u, ts::DATE AS day FROM events),
             |fs AS (SELECT u, min(day) AS first_day FROM bd GROUP BY u)
             |SELECT strftime(day, '%Y-%m-%d') AS day, count(*) AS dau,
             |sum(CASE WHEN first_day = day THEN 1 ELSE 0 END)::BIGINT AS new_users,
             |(count(*) - sum(CASE WHEN first_day = day THEN 1 ELSE 0 END))::BIGINT AS returning_users
             |FROM bd JOIN fs USING (u) GROUP BY day
             |ORDER BY day""".stripMargin.replace('\n', ' ')),
      doc = "daily active / new / returning users (first-seen classification)"),

    // ---- per-type linear trend: algebraic regr_* aggregates, one
    // map-side-combined hash agg (the "is this metric drifting" check)
    "q_events_trend" -> Q(
      (s, dir) => graft.operators.EventAnalytics.trend(
          table(s, dir, "events"), Seq("event_type"), "ts_ns", "value")
        .select(col("event_type"), col("n"),
          round(col("slope"), 6).as("slope"),
          round(col("intercept"), 4).as("intercept"),
          round(col("r2"), 6).as("r2"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(*) AS n,
             |round(regr_slope(value, epoch_ns(ts) / 3600000000000.0), 6) AS slope,
             |round(regr_intercept(value, epoch_ns(ts) / 3600000000000.0), 4) AS intercept,
             |round(regr_r2(value, epoch_ns(ts) / 3600000000000.0), 6) AS r2
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin.replace('\n', ' ')),
      doc = "per-type OLS trend: slope/intercept/R^2 of value over time (per-hour units)"),

    // ---- top event paths: the 3-step journeys users actually take,
    // by frequency (sequence mining; transitions only see pairs)
    "q_event_paths" -> Q(
      (s, dir) => graft.operators.EventAnalytics.topPaths(
          table(s, dir, "events"), "user_id", "ts_ns", "event_type",
          "event_id", steps = 3, k = 20),
      Some("""WITH s AS (SELECT event_type AS s0,
             |  lead(event_type, 1) OVER w AS s1, lead(event_type, 2) OVER w AS s2
             |  FROM events WINDOW w AS (PARTITION BY user_id
             |    ORDER BY epoch_ns(ts), event_id))
             |SELECT s0 || ' > ' || s1 || ' > ' || s2 AS path, count(*) AS n
             |FROM s WHERE s1 IS NOT NULL AND s2 IS NOT NULL
             |GROUP BY path ORDER BY n DESC, path LIMIT 20""".stripMargin.replace('\n', ' ')),
      doc = "top-20 3-step user journeys (lead-chain path mining, TakeOrdered rank)"),

    // ---- windowed EWMA trend smoothing: the standard drift baseline
    // over each (user, type) series — truncated exponential weights
    // over the trailing 16 observations, leading-edge normalized; ONE
    // ordered window + map-side array math, replayed in SQL via a list
    // window + index transform (FULL oracle)
    "q_events_ewma" -> Q(
      (s, dir) => graft.operators.EventAnalytics.ewmaSmooth(
          table(s, dir, "events").filter(col("user_id") < 40)
            .select(col("event_id"), col("user_id"), col("event_type"),
              col("ts_ns"), col("value")),
          Seq("user_id", "event_type"), "ts_ns", "event_id", "value",
          alpha = 0.2, window = 16)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts_ns"), col("ewma"))
        .orderBy(col("user_id"), col("event_type"), col("ts_ns"), col("event_id")),
      Some("""WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts) AS ts_ns,
             |  value::DOUBLE AS v FROM events WHERE user_id < 40),
             |win AS (SELECT event_id, user_id, event_type, ts_ns,
             |  list(v) OVER (PARTITION BY user_id, event_type
             |    ORDER BY ts_ns, event_id
             |    ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS vals FROM e)
             |SELECT event_id, user_id, event_type, ts_ns,
             |  round(list_sum(list_transform(range(1, len(vals) + 1),
             |    k -> vals[k] * pow(0.8, len(vals) - k)))
             |    / ((1 - pow(0.8, len(vals))) / 0.2), 6) AS ewma
             |FROM win
             |ORDER BY user_id, event_type, ts_ns, event_id""".stripMargin.replace('\n', ' ')),
      doc = "windowed EWMA trend smoothing per (user, type) series"),

    // ---- Holt double exponential smoothing: level + trend + one-step
    // forecast; the (l,b) recursion folds left-to-right over the same
    // window list in both engines (aggregate / list_reduce) —
    // bit-identical doubles, FULL oracle
    // ---- classical additive seasonal decomposition over the per-type
    // daily series: value = trend (centered 7-day MA, NULL at edges) +
    // seasonal (centered phase means) + residual — the de-seasonalized
    // signal CUSUM/anomaly monitors should watch on a periodic feed.
    // All windows partition by the series key; FULL oracle.
    "q_events_seasonal" -> Q(
      (s, dir) => {
        val daily = table(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(avg(col("value")).as("daily_mean"))
        graft.operators.EventAnalytics.seasonalDecompose(
            daily, Seq("event_type"), "day", "daily_mean", period = 7)
          .withColumn("day", col("day").cast("string"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH daily AS (SELECT event_type, date_trunc('day', ts)::DATE AS day,
             |  avg(value::DOUBLE) AS v FROM events GROUP BY 1, 2),
             |r AS (SELECT event_type, day, v,
             |  row_number() OVER (PARTITION BY event_type ORDER BY day) - 1 AS idx,
             |  CASE WHEN count(*) OVER w7 = 7 THEN avg(v) OVER w7 END AS trend
             |  FROM daily
             |  WINDOW w7 AS (PARTITION BY event_type ORDER BY day
             |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |ph AS (SELECT event_type, idx % 7 AS phase, avg(v - trend) AS sraw
             |  FROM r GROUP BY 1, 2),
             |ctr AS (SELECT event_type, phase,
             |  sraw - avg(sraw) OVER (PARTITION BY event_type) AS s FROM ph)
             |SELECT r.event_type AS event_type, CAST(r.day AS VARCHAR) AS day,
             |round(r.v, 6) AS value, round(r.trend, 6) AS trend,
             |round(c.s, 6) AS seasonal,
             |round(r.v - r.trend - c.s, 6) AS residual
             |FROM r JOIN ctr c ON c.event_type = r.event_type AND c.phase = r.idx % 7
             |ORDER BY 1, 2""".stripMargin.replace('\n', ' ')),
      doc = "additive seasonal decomposition (period-7 centered MA) of per-type daily means"),

    // ---- ACF + Ljung-Box over the per-type daily series: the
    // periodicity/whiteness screen run before picking a seasonal
    // period and after, on residuals. One key agg + one multi-lag
    // window pass; FULL oracle.
    "q_events_acf" -> Q(
      (s, dir) => {
        val daily = table(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(avg(col("value")).as("daily_mean"))
        graft.operators.EventAnalytics.autocorrelation(
            daily, Seq("event_type"), "day", "daily_mean", maxLag = 10)
          .orderBy(col("event_type"), col("lag"))
      },
      Some {
        val lagCols = (1 to 10).map(k => s"lag(v, $k) OVER w AS l$k").mkString(", ")
        val numCols = (1 to 10).map(k => s"sum((v-m)*(l$k-m)) AS x$k").mkString(", ")
        val numArr = (1 to 10).map(k => s"x$k").mkString("[", ", ", "]")
        s"""WITH daily AS (SELECT event_type, day, v FROM (
           |  SELECT event_type, date_trunc('day', ts)::DATE AS day,
           |  avg(value::DOUBLE) AS v FROM events GROUP BY 1, 2) t
           |  WHERE v IS NOT NULL),
           |st AS (SELECT event_type, count(*)::BIGINT AS n, avg(v) AS m,
           |  var_pop(v) AS vp FROM daily GROUP BY 1
           |  HAVING count(*) > 10 AND var_pop(v) > 0),
           |lg AS (SELECT d.event_type, v, m, n, vp, $lagCols
           |  FROM daily d JOIN st USING (event_type)
           |  WINDOW w AS (PARTITION BY d.event_type ORDER BY day)),
           |nums AS (SELECT event_type, max(n) AS n, max(vp) AS vp, $numCols
           |  FROM lg GROUP BY 1),
           |a AS (SELECT event_type, n,
           |  CAST(unnest(range(1, 11)) AS INT) AS lag,
           |  unnest($numArr) / (vp * n) AS r FROM nums)
           |SELECT event_type, lag, n, round(r, 6) AS r,
           |round(n*(n+2.0)*sum(r*r/(n - lag)) OVER (PARTITION BY event_type
           |  ORDER BY lag ROWS UNBOUNDED PRECEDING), 6) AS q_lb
           |FROM a ORDER BY event_type, lag""".stripMargin.replace('\n', ' ')
      },
      doc = "lag-1..10 autocorrelation + cumulative Ljung-Box Q per event type (daily means)"),

    // ---- unbiased pass@k (Chen et al. 2021 eq. 1): per task with n
    // attempts / c successes, 1 - C(n-c,k)/C(n,k) via the stable
    // product form — the sampled-generation eval number; one task agg,
    // bounded in-plan fold, FULL oracle (list_reduce product).
    "q_pass_at_k" -> Q(
      (s, dir) => graft.operators.QualityModel.passAtK(
          table(s, dir, "events")
            .select(col("user_id").as("task"),
              (coalesce(col("value"), lit(0.0)) > 75).cast("int").as("success")),
          "task", "success", k = 5)
        .orderBy(col("task")).limit(300),
      Some("""WITH t AS (SELECT user_id AS task,
             |  CASE WHEN coalesce(value::DOUBLE, 0) > 75 THEN 1 ELSE 0 END AS s FROM events),
             |pt AS (SELECT task, count(*)::BIGINT AS n, sum(s)::BIGINT AS c
             |  FROM t GROUP BY 1 HAVING count(*) >= 5)
             |SELECT task, n, c, round(CASE WHEN n - c < 5 THEN 1.0 ELSE
             |  1.0 - list_reduce(list_prepend(1.0, list_transform(range(0, 5),
             |    i -> (n - c - i)::DOUBLE / (n - i)::DOUBLE)), (a, b) -> a * b) END, 6) AS pass_at_k
             |FROM pt ORDER BY task LIMIT 300""".stripMargin.replace('\n', ' ')),
      doc = "unbiased pass@5 per task (stable product form) over value>75 successes"),

    "q_events_holt" -> Q(
      (s, dir) => graft.operators.EventAnalytics.holtSmooth(
          table(s, dir, "events").filter(col("user_id") < 40)
            .select(col("event_id"), col("user_id"), col("event_type"),
              col("ts_ns"), col("value")),
          Seq("user_id", "event_type"), "ts_ns", "event_id", "value",
          alpha = 0.3, beta = 0.2, window = 16)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts_ns"), col("level"), col("trend"), col("forecast"))
        .orderBy(col("user_id"), col("event_type"), col("ts_ns"), col("event_id")),
      Some("""WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts) AS ts_ns,
             |  value::DOUBLE AS v FROM events WHERE user_id < 40),
             |win AS (SELECT event_id, user_id, event_type, ts_ns,
             |  list(v) OVER (PARTITION BY user_id, event_type
             |    ORDER BY ts_ns, event_id
             |    ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS vals FROM e),
             |st AS (SELECT event_id, user_id, event_type, ts_ns,
             |  list_reduce(list_prepend([vals[1], 0.0],
             |    list_transform(vals[2:], x -> [x, 0.0])),
             |    (acc, e) -> [0.3*e[1] + 0.7*(acc[1]+acc[2]),
             |      0.2*((0.3*e[1] + 0.7*(acc[1]+acc[2])) - acc[1]) + 0.8*acc[2]]) AS s
             |  FROM win)
             |SELECT event_id, user_id, event_type, ts_ns,
             |  round(s[1], 6) AS level, round(s[2], 6) AS trend,
             |  round(s[1] + s[2], 6) AS forecast
             |FROM st
             |ORDER BY user_id, event_type, ts_ns, event_id""".stripMargin.replace('\n', ' ')),
      doc = "Holt level+trend smoothing with one-step forecast per (user, type) series"),

    // ---- trailing z-score anomaly detection: each event scored
    // against its own (user, type) series' preceding-window stats —
    // the current row never dilutes its own baseline
    "q_events_anomaly" -> Q(
      (s, dir) => graft.operators.EventAnalytics.anomalies(
          table(s, dir, "events").filter(col("user_id") < 40)
            .select(col("event_id"), col("user_id"), col("event_type"),
              col("ts_ns"), col("value")),
          Seq("user_id", "event_type"), "ts_ns", "value",
          windowNs = 30L * 86400L * 1000000000L, minN = 5, threshold = 2.0)
        .filter(col("z").isNotNull)
        // mean rounds at 6dp, NOT 4: value sits on a 0.01 grid, so the
        // n-row mean can land EXACTLY on a 4dp half-boundary where the
        // engines' round-half rules diverge; at 6dp the attainable grid
        // (0.01/n) never touches a boundary for n < 20000. z is
        // irrational (sqrt) — no boundary coincidence at any precision.
        .select(col("event_id"), col("baseline_n"),
          round(col("baseline_mean"), 6).as("baseline_mean"),
          round(col("z"), 4).as("z"), col("is_anomaly"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, baseline_n, round(baseline_mean, 6) AS baseline_mean,
             |round(z, 4) AS z, (abs(z) > 2.0) AS is_anomaly FROM (
             |  SELECT event_id, count(value) OVER w AS baseline_n,
             |    avg(value) OVER w AS baseline_mean,
             |    CASE WHEN count(value) OVER w >= 5 AND stddev_samp(value) OVER w > 0
             |      THEN (value - avg(value) OVER w) / stddev_samp(value) OVER w END AS z
             |  FROM (SELECT event_id, user_id, event_type, epoch_ns(ts) AS t, value
             |        FROM events WHERE user_id < 40)
             |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY t
             |    RANGE BETWEEN 2592000000000000 PRECEDING AND 1 PRECEDING))
             |WHERE z IS NOT NULL ORDER BY event_id""".stripMargin.replace('\n', ' ')),
      doc = "trailing z-score anomaly detection per (user, type) series (preceding-only RANGE baseline)"),

    // ---- hourly resampling with forward fill: regular grid from
    // map-side sequence explode, observations equi-join, one
    // last(ignoreNulls) window carries values across gaps
    "q_resample_fill" -> Q(
      (s, dir) => graft.operators.EventAnalytics.resampleFill(
          table(s, dir, "events").filter(col("user_id") < 6),
          "user_id", "ts", "value")
        .select(col("user_id"),
          date_format(col("t"), "yyyy-MM-dd HH:00").as("hour"),
          round(col("v"), 2).as("v"), round(col("v_filled"), 2).as("v_filled"))
        .orderBy(col("user_id"), col("hour")),
      Some("""WITH obs AS (SELECT user_id AS k, date_trunc('hour', ts) AS t,
             |  max(value) AS v FROM events WHERE user_id < 6 GROUP BY 1, 2),
             |b AS (SELECT k, min(t) AS lo, max(t) AS hi FROM obs GROUP BY k),
             |g AS (SELECT k, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS t FROM b),
             |j AS (SELECT g.k, g.t, obs.v FROM g LEFT JOIN obs ON g.k = obs.k AND g.t = obs.t)
             |SELECT k AS user_id, strftime(t, '%Y-%m-%d %H:00') AS hour,
             |round(v, 2) AS v,
             |round(last_value(v IGNORE NULLS) OVER (PARTITION BY k ORDER BY t
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS v_filled
             |FROM j ORDER BY user_id, hour""".stripMargin.replace('\n', ' ')),
      doc = "hourly regular-grid resampling with forward fill per user"),

    // ---- PSI drift monitor: click values (reference) vs purchase
    // values (current), binned by the reference's exact deciles —
    // edges broadcast, both sides bucket map-side, no cross-side join
    "q_drift_psi" -> Q(
      (s, dir) => {
        val ev = table(s, dir, "events")
        graft.operators.Drift.psiBins(
            ev.filter(col("event_type") === "click"),
            ev.filter(col("event_type") === "purchase"),
            "value", nBins = 10)
          .select(col("bin"), col("n_ref"), col("n_cur"),
            round(col("p_ref"), 6).as("p_ref"), round(col("p_cur"), 6).as("p_cur"),
            round(col("psi_term"), 6).as("psi_term"))
          .orderBy(col("bin"))
      },
      Some {
        val edgeDefs = (1 until 10).map(i =>
          s"quantile_cont(value, 0.$i) AS e${i - 1}").mkString(", ")
        val binExpr = (0 until 9).map(i =>
          s"CASE WHEN value > e$i THEN 1 ELSE 0 END").mkString(" + ")
        s"""WITH ref AS (SELECT value FROM events WHERE event_type = 'click'),
           |cur AS (SELECT value FROM events WHERE event_type = 'purchase'),
           |e AS (SELECT $edgeDefs FROM ref),
           |br AS (SELECT ($binExpr) AS bin FROM ref, e),
           |bc AS (SELECT ($binExpr) AS bin FROM cur, e),
           |cr AS (SELECT bin, count(*) AS n_ref FROM br GROUP BY bin),
           |cc AS (SELECT bin, count(*) AS n_cur FROM bc GROUP BY bin),
           |j AS (SELECT coalesce(cr.bin, cc.bin) AS bin,
           |      coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
           |      FROM cr FULL JOIN cc ON cr.bin = cc.bin),
           |p AS (SELECT bin, n_ref, n_cur,
           |      greatest(n_ref * 1.0 / (SELECT count(*) FROM ref), 0.0001) AS p_ref,
           |      greatest(n_cur * 1.0 / (SELECT count(*) FROM cur), 0.0001) AS p_cur
           |      FROM j)
           |SELECT bin, n_ref, n_cur, round(p_ref, 6) AS p_ref,
           |round(p_cur, 6) AS p_cur,
           |round((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_term
           |FROM p ORDER BY bin""".stripMargin.replace('\n', ' ')
      },
      doc = "population stability index bins: click vs purchase value distributions"),

    // ---- categorical drift (JS divergence): event-type mix of the
    // month's first half vs second half
    "q_drift_js" -> Q(
      (s, dir) => {
        val ev = table(s, dir, "events")
        graft.operators.Drift.jsBins(
            ev.filter(col("ts") < lit("2024-01-16").cast("timestamp")),
            ev.filter(col("ts") >= lit("2024-01-16").cast("timestamp")),
            "event_type")
          .select(col("category"), col("n_ref"), col("n_cur"),
            round(col("p_ref"), 6).as("p_ref"), round(col("p_cur"), 6).as("p_cur"),
            round(col("js_term"), 6).as("js_term"))
          .orderBy(col("category"))
      },
      Some("""WITH r AS (SELECT event_type FROM events WHERE ts < TIMESTAMP '2024-01-16'),
             |c AS (SELECT event_type FROM events WHERE ts >= TIMESTAMP '2024-01-16'),
             |cr AS (SELECT event_type AS category, count(*) AS n_ref FROM r GROUP BY 1),
             |cc AS (SELECT event_type AS category, count(*) AS n_cur FROM c GROUP BY 1),
             |j AS (SELECT coalesce(cr.category, cc.category) AS category,
             |      coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
             |      FROM cr FULL JOIN cc ON cr.category = cc.category),
             |p AS (SELECT category, n_ref, n_cur,
             |      greatest(n_ref * 1.0 / (SELECT count(*) FROM r), 0.000001) AS p_ref,
             |      greatest(n_cur * 1.0 / (SELECT count(*) FROM c), 0.000001) AS p_cur
             |      FROM j)
             |SELECT category, n_ref, n_cur, round(p_ref, 6) AS p_ref,
             |round(p_cur, 6) AS p_cur,
             |round((p_ref * ln(p_ref / ((p_ref + p_cur) / 2)) +
             |       p_cur * ln(p_cur / ((p_ref + p_cur) / 2))) / 2, 6) AS js_term
             |FROM p ORDER BY category""".stripMargin.replace('\n', ' ')),
      doc = "Jensen-Shannon category drift: event-type mix, first vs second half-month"),

    // ---- split-conformal threshold (Vovk 2005): the k = ceil((n+1)(1-a))
    // order statistic of calibration scores — a finite-sample coverage
    // GUARANTEE for "keep below this score" cutoffs, not just a quantile
    "q_conformal_threshold" -> Q(
      (s, dir) => graft.operators.Quantiles.conformalThreshold(
          table(s, dir, "events").filter(col("user_id") < 40)
            .select(col("value")),
          "value", alpha = 0.1),
      Some("""WITH v AS (SELECT value::DOUBLE AS s FROM events WHERE user_id < 40 AND value IS NOT NULL),
             |nn AS (SELECT count(*) AS n FROM v),
             |kk AS (SELECT n, CAST(ceil((n + 1) * 0.9) AS BIGINT) AS k FROM nn),
             |r AS (SELECT s, row_number() OVER (ORDER BY s) AS rn FROM v)
             |SELECT kk.n, kk.k, 0.1::DOUBLE AS alpha, round(r.s, 6) AS threshold
             |FROM r, kk WHERE r.rn = kk.k""".stripMargin.replace('\n', ' ')),
      doc = "split-conformal 90%-coverage threshold over calibration scores"),

    // ---- eventually-follows relation (process mining / α-algorithm
    // precedence): which orderings the log actually contains, with
    // support and confidence — the gapped generalization of the
    // adjacent-only q_event_transitions
    "q_event_follow" -> Q(
      (s, dir) => graft.operators.EventAnalytics.eventualFollow(
          table(s, dir, "events"), "user_id", "event_type", "ts_ns")
        .orderBy(col("from_type"), col("to_type")),
      Some("""WITH g AS (SELECT user_id AS u, event_type AS t,
             |  min(epoch_ns(ts)) AS mn, max(epoch_ns(ts)) AS mx FROM events GROUP BY 1, 2),
             |fu AS (SELECT t AS from_type, count(*) AS n_from_users FROM g GROUP BY 1),
             |f AS (SELECT a.t AS from_type, b.t AS to_type,
             |  sum(CASE WHEN a.mn < b.mx THEN 1 ELSE 0 END)::BIGINT AS n_follow
             |  FROM g a JOIN g b ON a.u = b.u AND a.t <> b.t GROUP BY 1, 2)
             |SELECT from_type, to_type, n_follow, n_from_users,
             |round(n_follow*1.0/n_from_users, 6) AS confidence
             |FROM f JOIN fu USING (from_type)
             |ORDER BY from_type, to_type""".stripMargin.replace('\n', ' ')),
      doc = "eventually-follows support/confidence per event-type pair"),

    // ---- Theil-Sen robust trend of value over time: median of slopes
    // on hash-deterministic disjoint pairs — one corrupted batch can't
    // bend it the way it bends the OLS forecast. Full SQL replay
    // (row_number pairing on the md5 key + quantile_cont medians).
    "q_theil_sen" -> Q(
      (s, dir) => graft.operators.Robust.theilSen(
          table(s, dir, "events")
            .select(col("event_id"),
              (col("ts_ns") / lit(8.64e13)).as("x_days"),
              col("value"))
            .filter(col("value").isNotNull),
          "event_id", "x_days", "value"),
      Some {
        val uu = uuSql("md5(event_id::VARCHAR)")
        s"""WITH b AS (SELECT event_id::VARCHAR AS id, epoch_ns(ts)/86400000000000.0 AS x,
           |  value::DOUBLE AS y, $uu AS u FROM events WHERE value IS NOT NULL),
           |r AS (SELECT *, row_number() OVER (ORDER BY u, id) - 1 AS rn FROM b),
           |p AS (SELECT CAST(floor(rn/2.0) AS BIGINT) AS pr, count(*) AS c,
           |  max(CASE WHEN rn%2=0 THEN x END) AS x1, max(CASE WHEN rn%2=0 THEN y END) AS y1,
           |  max(CASE WHEN rn%2=1 THEN x END) AS x2, max(CASE WHEN rn%2=1 THEN y END) AS y2
           |  FROM r GROUP BY 1),
           |s AS (SELECT (y2-y1)/(x2-x1) AS m FROM p WHERE c = 2 AND x1 <> x2),
           |mm AS (SELECT count(*)::BIGINT AS n_pairs, quantile_cont(m, 0.5) AS slope FROM s)
           |SELECT n_pairs, round(slope, 6) AS slope,
           |round((SELECT quantile_cont(y - mm.slope * x, 0.5) FROM b), 6) AS intercept
           |FROM mm""".stripMargin.replace('\n', ' ')
      },
      doc = "Theil-Sen robust value-over-time trend (hash-paired median of slopes)"),

    // ---- CUPED variance reduction (Deng 2013): per-user pre-period
    // covariate regression-adjusts the experiment metric; one per-unit
    // agg + one 1-row agg, exact arithmetic -> FULL oracle
    "q_cuped" -> Q(
      (s, dir) => graft.operators.EventAnalytics.cupedAdjust(
          table(s, dir, "events"), "user_id", "value",
          col("ts") < lit("2024-01-16").cast("timestamp"),
          col("ts") >= lit("2024-01-16").cast("timestamp")),
      Some("""WITH u AS (SELECT user_id, value::DOUBLE AS v,
             |  ts < TIMESTAMP '2024-01-16' AS pa, ts >= TIMESTAMP '2024-01-16' AS pb
             |  FROM events WHERE value IS NOT NULL),
             |per AS (SELECT user_id, avg(CASE WHEN pa THEN v END) AS x,
             |  avg(CASE WHEN pb THEN v END) AS y FROM u GROUP BY 1
             |  HAVING x IS NOT NULL AND y IS NOT NULL),
             |a AS (SELECT count(*)::BIGINT AS n_units, avg(y) AS my,
             |  covar_samp(x, y) AS cxy, var_samp(x) AS vx, var_samp(y) AS vy FROM per)
             |SELECT n_units,
             |CASE WHEN vx > 0 THEN round(cxy/vx, 6) END AS theta,
             |round(my, 6) AS mean_y, round(vy, 6) AS var_y,
             |CASE WHEN vx > 0 THEN round(vy - cxy*cxy/vx, 6) END AS var_adj,
             |CASE WHEN vx > 0 AND vy > 0 THEN round(100.0*(cxy*cxy/vx)/vy, 6) END AS var_reduction_pct
             |FROM a""".stripMargin.replace('\n', ' ')),
      doc = "CUPED pre-period variance reduction for the per-user value metric"),

    // ---- Welch's unequal-variance t (parametric mean-shift arm of the
    // drift family; Welch-Satterthwaite dof): one conditional agg, all
    // arithmetic exact -> FULL oracle
    "q_drift_welch" -> Q(
      (s, dir) => graft.operators.Drift.welchT(
          table(s, dir, "events"), "value",
          col("ts") < lit("2024-01-16").cast("timestamp"),
          col("ts") >= lit("2024-01-16").cast("timestamp")),
      Some("""WITH u AS (SELECT value::DOUBLE AS v,
             |  ts < TIMESTAMP '2024-01-16' AS pa, ts >= TIMESTAMP '2024-01-16' AS pb
             |  FROM events WHERE value IS NOT NULL),
             |a AS (SELECT count(CASE WHEN pa THEN 1 END)::BIGINT AS n_a,
             |  count(CASE WHEN pb THEN 1 END)::BIGINT AS n_b,
             |  avg(CASE WHEN pa THEN v END) AS ma, avg(CASE WHEN pb THEN v END) AS mb,
             |  var_samp(CASE WHEN pa THEN v END) AS va, var_samp(CASE WHEN pb THEN v END) AS vb
             |  FROM u)
             |SELECT n_a, n_b, round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
             |CASE WHEN va/n_a + vb/n_b > 0
             |  THEN round((ma - mb)/sqrt(va/n_a + vb/n_b), 6) END AS t,
             |CASE WHEN va/n_a + vb/n_b > 0
             |  THEN round((va/n_a + vb/n_b)*(va/n_a + vb/n_b) /
             |  ((va/n_a)*(va/n_a)/(n_a - 1) + (vb/n_b)*(vb/n_b)/(n_b - 1)), 6) END AS dof,
             |CASE WHEN va/n_a + vb/n_b > 0
             |  THEN abs((ma - mb)/sqrt(va/n_a + vb/n_b)) > 3.29 END AS big_shift
             |FROM a""".stripMargin.replace('\n', ' ')),
      doc = "Welch unequal-variance t statistic + Welch-Satterthwaite dof across the mid-January split"),

    // ---- two-sample Anderson-Darling (tie-adjusted Scholz-Stephens
    // A²): the TAIL-weighted drift statistic — KS reacts to the median-
    // area gap, AD integrates squared gaps weighted 1/(F(1−F)), so tail
    // contamination dominates. Rank-based (monotone-invariant), funnel-
    // free cumulative machinery; FULL oracle on the statistic.
    "q_drift_ad" -> Q(
      (s, dir) => graft.operators.Drift.andersonDarling(
          table(s, dir, "events"), "value",
          col("ts") < lit("2024-01-16").cast("timestamp"),
          col("ts") >= lit("2024-01-16").cast("timestamp")),
      Some("""WITH u AS (SELECT value::DOUBLE AS v,
             |  CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS tr,
             |  CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS tc
             |  FROM events WHERE value IS NOT NULL),
             |pv AS (SELECT v, sum(tr)::BIGINT AS n1, sum(tc)::BIGINT AS n2,
             |  (sum(tr) + sum(tc))::BIGINT AS l FROM u GROUP BY v),
             |tt AS (SELECT sum(n1)::BIGINT AS m1, sum(n2)::BIGINT AS m2,
             |  sum(l)::BIGINT AS nn FROM pv),
             |cw AS (SELECT pv.*, tt.m1, tt.m2, tt.nn,
             |  sum(l) OVER wv - l/2.0 AS ba,
             |  sum(n1) OVER wv - n1/2.0 AS ma1,
             |  sum(n2) OVER wv - n2/2.0 AS ma2
             |  FROM pv, tt WINDOW wv AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
             |t2 AS (SELECT max(m1) AS m1, max(m2) AS m2, max(nn) AS nn,
             |  sum(CASE WHEN ba*(nn - ba) - nn*l/4.0 > 0
             |    THEN (l::DOUBLE/nn) * pow(nn*ma1 - m1*ba, 2) / (ba*(nn - ba) - nn*l/4.0) END) AS s1,
             |  sum(CASE WHEN ba*(nn - ba) - nn*l/4.0 > 0
             |    THEN (l::DOUBLE/nn) * pow(nn*ma2 - m2*ba, 2) / (ba*(nn - ba) - nn*l/4.0) END) AS s2
             |  FROM cw)
             |SELECT m1 AS n_ref, m2 AS n_cur,
             |round((nn - 1.0)/nn * (coalesce(s1, 0)/m1 + coalesce(s2, 0)/m2), 6) AS a2
             |FROM t2""".stripMargin.replace('\n', ' ')),
      doc = "tie-adjusted two-sample Anderson-Darling A2 between the two event periods"),

    // ---- FDR-controlled drift screen (Benjamini-Hochberg 1995 over
    // per-key KS p-values): WHICH monitored keys actually drifted,
    // with the false-discovery rate held at q=0.05 — per-key
    // thresholds either drown in false alarms or Bonferroni-miss.
    // Kolmogorov p via the 20-term series, identical fold both engines.
    "q_drift_ks_fdr" -> Q(
      (s, dir) => graft.operators.Drift.ksScreenFdr(
          table(s, dir, "events"), "event_type", "value",
          col("ts") < lit("2024-01-16").cast("timestamp"),
          col("ts") >= lit("2024-01-16").cast("timestamp"), fdrQ = 0.05)
        .orderBy(col("rank")),
      Some("""WITH u AS (SELECT event_type AS k, value::DOUBLE AS v,
             |  CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS tr,
             |  CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS tc
             |  FROM events),
             |pv AS (SELECT k, v, sum(tr) AS r, sum(tc) AS c FROM u GROUP BY 1, 2),
             |tt AS (SELECT k, sum(r)::BIGINT AS n_ref, sum(c)::BIGINT AS n_cur FROM pv GROUP BY 1),
             |g AS (SELECT pv.k, abs(
             |  sum(r) OVER w * 1.0 / tt.n_ref - sum(c) OVER w * 1.0 / tt.n_cur) AS gap
             |  FROM pv JOIN tt USING (k)
             |  WINDOW w AS (PARTITION BY pv.k ORDER BY v ROWS UNBOUNDED PRECEDING)),
             |d AS (SELECT g.k, max(gap) AS d, max(n_ref) AS n_ref, max(n_cur) AS n_cur
             |  FROM g JOIN tt ON tt.k = g.k GROUP BY 1),
             |lamt AS (SELECT *, (sqrt(n_ref*1.0*n_cur/(n_ref+n_cur)) + 0.12 +
             |  0.11/sqrt(n_ref*1.0*n_cur/(n_ref+n_cur))) * d AS lam FROM d
             |  WHERE n_ref > 0 AND n_cur > 0),
             |p AS (SELECT k, n_ref, n_cur, d,
             |  CASE WHEN lam < 0.3 THEN 1.0
             |  ELSE least(1.0, greatest(0.0, 2.0 * list_reduce(list_prepend(0.0,
             |    list_transform(range(1, 21),
             |      j -> pow(-1.0, (j-1)::DOUBLE) * exp(-2.0 * (j*j)::DOUBLE * lam * lam))),
             |    (a, b) -> a + b))) END AS p_value FROM lamt),
             |r AS (SELECT *, row_number() OVER (ORDER BY p_value, k) AS rank,
             |  count(*) OVER () AS m FROM p),
             |cut AS (SELECT *, max(CASE WHEN p_value <= rank*1.0*0.05/m THEN rank END) OVER () AS mx FROM r)
             |SELECT k AS event_type, n_ref, n_cur, round(d, 6) AS d,
             |round(p_value, 6) AS p_value, rank,
             |coalesce(rank <= mx, false) AS rejected
             |FROM cut ORDER BY rank""".stripMargin.replace('\n', ' ')),
      doc = "BH-FDR drift screen: per-event-type KS p-values, q=0.05 selection"),

    // ---- Mann-Whitney rank-sum drift screen: the location-shift
    // companion to q_drift_ks_fdr, with rank-biserial effect size and
    // the same BH-FDR selection; Φ via the A&S 7.1.26 erf polynomial,
    // identical arithmetic both engines
    "q_drift_ranksum" -> Q(
      (s, dir) => graft.operators.Drift.rankSumScreenFdr(
          table(s, dir, "events"), "event_type", "value",
          col("ts") < lit("2024-01-16").cast("timestamp"),
          col("ts") >= lit("2024-01-16").cast("timestamp"), fdrQ = 0.05)
        .orderBy(col("rank")),
      Some("""WITH u AS (SELECT event_type AS k, value::DOUBLE AS v,
             |  CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS tr,
             |  CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS tc
             |  FROM events),
             |pv AS (SELECT k, v, sum(tr) AS r, sum(tc) AS c, sum(tr)+sum(tc) AS t FROM u GROUP BY 1, 2),
             |mr AS (SELECT *, sum(t) OVER (PARTITION BY k ORDER BY v ROWS UNBOUNDED PRECEDING) - (t - 1.0)/2.0 AS m FROM pv),
             |pk AS (SELECT k, sum(r)::BIGINT AS n_ref, sum(c)::BIGINT AS n_cur,
             |  sum(m*r) AS rsum, sum(t*t*t - t) AS ties FROM mr GROUP BY 1),
             |st AS (SELECT k, n_ref, n_cur,
             |  rsum - n_ref*1.0*(n_ref + 1.0)/2.0 AS uu,
             |  n_ref*1.0*n_cur/12.0 * ((n_ref + n_cur + 1.0) - ties*1.0/((n_ref + n_cur)*1.0*(n_ref + n_cur - 1.0))) AS vr
             |  FROM pk),
             |zz AS (SELECT *, CASE WHEN vr > 0 THEN (uu - n_ref*1.0*n_cur/2.0)/sqrt(vr) ELSE 0.0 END AS z FROM st),
             |pp AS (SELECT *, abs(z)/sqrt(2.0) AS x, 1.0/(1.0 + 0.3275911*abs(z)/sqrt(2.0)) AS tt FROM zz),
             |p2 AS (SELECT k, n_ref, n_cur, z,
             |  round(2.0*uu/(n_ref*1.0*n_cur) - 1.0, 6) AS effect_r,
             |  CASE WHEN vr > 0 THEN least(1.0, greatest(0.0,
             |    1.0 - (1.0 - (0.254829592*tt - 0.284496736*tt*tt + 1.421413741*tt*tt*tt
             |      - 1.453152027*tt*tt*tt*tt + 1.061405429*tt*tt*tt*tt*tt)*exp(-x*x))))
             |  ELSE 1.0 END AS p_value FROM pp),
             |r AS (SELECT *, row_number() OVER (ORDER BY p_value, k) AS rank,
             |  count(*) OVER () AS mm FROM p2),
             |cut AS (SELECT *, max(CASE WHEN p_value <= rank*1.0*0.05/mm THEN rank END) OVER () AS mx FROM r)
             |SELECT k AS event_type, n_ref, n_cur, round(z, 6) AS z, effect_r,
             |round(p_value, 6) AS p_value, rank, coalesce(rank <= mx, false) AS rejected
             |FROM cut ORDER BY rank""".stripMargin.replace('\n', ' ')),
      doc = "Mann-Whitney rank-sum drift screen with rank-biserial effect + BH-FDR"),

    // ---- two-sided CUSUM changepoint monitor (Page 1954): sustained
    // shifts accumulate past h where z-scores see only single points;
    // the (s+, s-) fold replays exactly in SQL like q_events_holt
    "q_events_cusum" -> Q(
      (s, dir) => graft.operators.EventAnalytics.cusum(
          table(s, dir, "events").filter(col("user_id") < 40)
            .select(col("event_id"), col("user_id"), col("event_type"),
              col("ts_ns"), col("value")),
          Seq("user_id", "event_type"), "ts_ns", "event_id", "value",
          mu0 = 50.0, kappa = 5.0, h = 200.0, window = 64)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts_ns"), col("cusum_pos"), col("cusum_neg"), col("alarm"))
        .orderBy(col("user_id"), col("event_type"), col("ts_ns"), col("event_id")),
      Some("""WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts) AS ts_ns,
             |  value::DOUBLE AS v FROM events WHERE user_id < 40),
             |win AS (SELECT event_id, user_id, event_type, ts_ns,
             |  list(v) OVER (PARTITION BY user_id, event_type
             |    ORDER BY ts_ns, event_id
             |    ROWS BETWEEN 63 PRECEDING AND CURRENT ROW) AS vals FROM e),
             |st AS (SELECT event_id, user_id, event_type, ts_ns,
             |  list_reduce(list_prepend([0.0, 0.0],
             |    list_transform(vals, x -> [x, 0.0])),
             |    (acc, e) -> [greatest(0.0, acc[1] + (e[1] - 50.0 - 5.0)),
             |      greatest(0.0, acc[2] + (50.0 - e[1] - 5.0))]) AS s
             |  FROM win)
             |SELECT event_id, user_id, event_type, ts_ns,
             |  round(s[1], 6) AS cusum_pos, round(s[2], 6) AS cusum_neg,
             |  (s[1] > 200.0 OR s[2] > 200.0) AS alarm
             |FROM st
             |ORDER BY user_id, event_type, ts_ns, event_id""".stripMargin.replace('\n', ' ')),
      doc = "two-sided CUSUM sustained-shift monitor per (user, type) series"),

    // ---- exact two-sample KS statistic (bin-free drift): one tagged
    // union + one value-ordered RANGE window + a max
    "q_drift_ks" -> Q(
      (s, dir) => {
        val s2 = s
        import s2.implicits._
        val ev = table(s, dir, "events")
        Seq(Tuple1(BigDecimal(graft.operators.Drift.ks(
            ev.filter(col("event_type") === "click"),
            ev.filter(col("event_type") === "purchase"), "value"))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
          .toDF("ks_stat")
      },
      Some("""WITH r AS (SELECT value AS v FROM events WHERE event_type = 'click'),
             |c AS (SELECT value AS v FROM events WHERE event_type = 'purchase'),
             |u AS (SELECT v, 1 AS tr, 0 AS tc FROM r
             |      UNION ALL SELECT v, 0, 1 FROM c),
             |g AS (SELECT abs(sum(tr) OVER w * 1.0 / (SELECT count(*) FROM r) -
             |             sum(tc) OVER w * 1.0 / (SELECT count(*) FROM c)) AS gap
             |      FROM u WINDOW w AS (ORDER BY v
             |        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT round(max(gap), 6) AS ks_stat FROM g""".stripMargin.replace('\n', ' ')),
      doc = "exact Kolmogorov-Smirnov distance between click and purchase values"),

    // ---- exact 1-D Wasserstein-1 (earth mover's) distance: the area
    // between the two ECDFs — measures HOW FAR mass moved in the
    // value's own units (KS sees only the max gap, PSI/JS only binned
    // shares). Same distributed ECDF machinery as KS; FULL oracle.
    "q_drift_wasserstein" -> Q(
      (s, dir) => {
        val s2 = s
        import s2.implicits._
        val ev = table(s, dir, "events")
        Seq(Tuple1(BigDecimal(graft.operators.Drift.wasserstein1(
            ev.filter(col("event_type") === "click"),
            ev.filter(col("event_type") === "purchase"), "value"))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
          .toDF("w1")
      },
      Some("""WITH r AS (SELECT value::DOUBLE AS v FROM events WHERE event_type = 'click'),
             |c AS (SELECT value::DOUBLE AS v FROM events WHERE event_type = 'purchase'),
             |u AS (SELECT v, 1 AS tr, 0 AS tc FROM r
             |      UNION ALL SELECT v, 0, 1 FROM c),
             |pv AS (SELECT v, sum(tr)::BIGINT AS tr, sum(tc)::BIGINT AS tc
             |       FROM u GROUP BY v),
             |e AS (SELECT v,
             |  abs(sum(tr) OVER w * 1.0 / (SELECT count(*) FROM r) -
             |      sum(tc) OVER w * 1.0 / (SELECT count(*) FROM c)) AS g,
             |  lead(v) OVER (ORDER BY v) AS nv
             |  FROM pv WINDOW w AS (ORDER BY v
             |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT round(coalesce(sum(g * (nv - v)), 0.0), 6) AS w1
             |FROM e WHERE nv IS NOT NULL""".stripMargin.replace('\n', ' ')),
      doc = "exact 1-D Wasserstein-1 distance between click and purchase value distributions"),

    // ---- energy distance (Székely & Rizzo): in 1-D,
    // D² = 2∫(F_ref − F_cur)² dx — the L2 cousin of W1's L1 area on the
    // SAME exact ECDF integral; more outlier-robust (tiny-mass far
    // excursions contribute gap², not gap·distance). FULL oracle.
    "q_drift_energy" -> Q(
      (s, dir) => {
        val s2 = s
        import s2.implicits._
        val ev = table(s, dir, "events")
        Seq(Tuple1(BigDecimal(graft.operators.Drift.energyDistance(
            ev.filter(col("event_type") === "click"),
            ev.filter(col("event_type") === "purchase"), "value"))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
          .toDF("energy_dist")
      },
      Some("""WITH r AS (SELECT value::DOUBLE AS v FROM events WHERE event_type = 'click'),
             |c AS (SELECT value::DOUBLE AS v FROM events WHERE event_type = 'purchase'),
             |u AS (SELECT v, 1 AS tr, 0 AS tc FROM r
             |      UNION ALL SELECT v, 0, 1 FROM c),
             |pv AS (SELECT v, sum(tr)::BIGINT AS tr, sum(tc)::BIGINT AS tc
             |       FROM u GROUP BY v),
             |e AS (SELECT v,
             |  abs(sum(tr) OVER w * 1.0 / (SELECT count(*) FROM r) -
             |      sum(tc) OVER w * 1.0 / (SELECT count(*) FROM c)) AS g,
             |  lead(v) OVER (ORDER BY v) AS nv
             |  FROM pv WINDOW w AS (ORDER BY v
             |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT round(sqrt(2.0 * coalesce(sum(g * g * (nv - v)), 0.0)), 6) AS energy_dist
             |FROM e WHERE nv IS NOT NULL""".stripMargin.replace('\n', ' ')),
      doc = "energy distance between click and purchase value distributions (L2 ECDF area)"),

    // ---- first-order Markov transitions over per-user event sequences
    "q_event_transitions" -> Q(
      (s, dir) => graft.operators.EventAnalytics.transitionMatrix(
          table(s, dir, "events"), "user_id", "ts_ns", "event_type", "event_id")
        .orderBy(col("from_type"), col("to_type")),
      Some("""WITH s AS (SELECT user_id, event_type,
             |  lag(event_type) OVER (PARTITION BY user_id
             |    ORDER BY epoch_ns(ts), event_id) AS from_type
             |FROM events),
             |c AS (SELECT from_type, event_type AS to_type, count(*) AS n
             |      FROM s WHERE from_type IS NOT NULL GROUP BY 1, 2)
             |SELECT from_type, to_type, n,
             |round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 6) AS p
             |FROM c ORDER BY from_type, to_type""".stripMargin.replace('\n', ' ')),
      doc = "event-type Markov transition counts + row-normalized probabilities"),

    // ---- SAMPLE BY weight LIMIT n — A-ExpJ key -ln(u)/w with the
    // md5-derived uniform keyed on row identity: the weighted-reservoir
    // distribution, yet layout-independent and replayed exactly by the
    // DuckDB oracle (rand(seed) stays available in the TQL dialect)
    "q_sample_weighted" -> Q(
      (s, dir) => {
        Sampling.weightedHashSample(
            table(s, dir, "lineitem"),
            concat_ws(":", col("l_orderkey"), col("l_linenumber")),
            col("l_quantity"), n = 100)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some {
        val uu = uuSql("md5(l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR)")
        s"""WITH u AS (SELECT l_orderkey, l_linenumber, l_quantity,
           |  $uu AS uu FROM lineitem WHERE l_quantity > 0),
           |r AS (SELECT l_orderkey, l_linenumber, l_quantity FROM u
           |  ORDER BY -ln(uu) / l_quantity::DOUBLE,
           |  l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR LIMIT 100)
           |SELECT l_orderkey, l_linenumber, l_quantity FROM r
           |ORDER BY l_orderkey, l_linenumber""".stripMargin.replace('\n', ' ')
      },
      doc = "A-ExpJ weighted reservoir on the md5 uniform; full-oracle"),

    // ---- SAMPLE BY MAX_WEIGHT(cond: w, ...) (tql.md:336-347)
    "q_sample_max_weight" -> Q(
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        Sampling.weightedHashSample(li,
            concat_ws(":", col("l_orderkey"), col("l_linenumber")),
            Sampling.maxWeight(
              (col("l_returnflag") === "R") -> 10.0,
              (col("l_quantity") > 40) -> 5.0,
              lit(true) -> 1.0),
            n = 200)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"))
      },
      Some {
        val uu = uuSql("md5(l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR)")
        s"""WITH u AS (SELECT l_returnflag,
           |  greatest(CASE WHEN l_returnflag = 'R' THEN 10.0 ELSE 0.0 END,
           |    CASE WHEN l_quantity > 40 THEN 5.0 ELSE 0.0 END, 1.0)::DOUBLE AS w,
           |  l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR AS k,
           |  $uu AS uu FROM lineitem),
           |r AS (SELECT l_returnflag FROM u ORDER BY -ln(uu) / w, k LIMIT 200)
           |SELECT l_returnflag, count(*) AS n FROM r
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replace('\n', ' ')
      },
      doc = "R-flag rows weighted 10x; composition skews accordingly; full-oracle"),

    // ---- entity-aware temporal split with embargo (purged time
    // split): users held out by deterministic md5 hash, a 2-day
    // embargo gap between the train and test periods, no user spans
    // both splits. Pure map-side tags — zero shuffles before the
    // summary agg
    "q_split_temporal_embargo" -> Q(
      (s, dir) => graft.operators.EventAnalytics.entityTemporalSplit(
          table(s, dir, "events"), "user_id", "ts",
          cutoff = "2024-01-22 00:00:00", embargoDays = 2)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          floor(unix_timestamp(min(col("ts")))).as("first_epoch"),
          floor(unix_timestamp(max(col("ts")))).as("last_epoch"))
        .orderBy(col("split")),
      Some("""WITH s AS (SELECT user_id, ts, CASE
             |  WHEN ('0x' || substr(md5(user_id::VARCHAR || '|split'), 1, 8))::BIGINT
             |    % 100 < 80 AND ts < TIMESTAMP '2024-01-22 00:00:00' THEN 'train'
             |  WHEN ('0x' || substr(md5(user_id::VARCHAR || '|split'), 1, 8))::BIGINT
             |    % 100 >= 80 AND ts >= TIMESTAMP '2024-01-24 00:00:00' THEN 'test'
             |  ELSE 'excluded' END AS split FROM events)
             |SELECT split, count(*) AS n_events,
             |count(DISTINCT user_id)::BIGINT AS n_users,
             |floor(epoch(min(ts)))::BIGINT AS first_epoch,
             |floor(epoch(max(ts)))::BIGINT AS last_epoch
             |FROM s GROUP BY split ORDER BY split""".stripMargin.replace('\n', ' ')),
      doc = "purged entity-temporal split: held-out users + embargo gap, map-side tags"),

    // ---- last-touch attribution: conversions credited to the latest
    // preceding non-conversion touch within 24h — one user-key window,
    // never a per-conversion self-join
    "q_attribution" -> Q(
      (s, dir) => graft.operators.EventAnalytics.attributionLastTouch(
          table(s, dir, "events"), "user_id", "ts_ns", "event_type",
          "event_id", conversionType = "purchase",
          lookbackNs = 86400L * 1000000000L)
        .orderBy(col("touch")),
      Some("""WITH t AS (SELECT user_id, epoch_ns(ts) AS tn, event_id, event_type,
             |  last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
             |    IGNORE NULLS) OVER w AS touch_type,
             |  last_value(CASE WHEN event_type <> 'purchase' THEN epoch_ns(ts) END
             |    IGNORE NULLS) OVER w AS touch_t
             |  FROM events WINDOW w AS (PARTITION BY user_id
             |    ORDER BY epoch_ns(ts), event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
             |c AS (SELECT CASE WHEN touch_t IS NOT NULL
             |    AND tn - touch_t <= 86400000000000 THEN touch_type
             |  ELSE 'unattributed' END AS touch
             |  FROM t WHERE event_type = 'purchase')
             |SELECT touch, count(*) AS n,
             |round(count(*) * 1.0 / (SELECT count(*) FROM c), 6) AS share
             |FROM c GROUP BY touch ORDER BY touch""".stripMargin.replace('\n', ' ')),
      doc = "last-touch attribution of purchases within a 24h lookback"),

    // ---- inter-arrival profile: gap quantiles per event type — the
    // arrival-rate fingerprint feeding debounce/anomaly thresholds
    "q_event_gaps" -> Q(
      (s, dir) => graft.operators.EventAnalytics.interArrival(
          table(s, dir, "events"), "user_id", "ts_ns", "event_type")
        .orderBy(col("event_type")),
      Some("""WITH g AS (SELECT event_type,
             |  (epoch_ns(ts) - lag(epoch_ns(ts), 1) OVER (
             |    PARTITION BY user_id, event_type ORDER BY epoch_ns(ts))) / 1e9
             |    AS gap FROM events)
             |SELECT event_type, count(*) AS n_gaps,
             |round(quantile_cont(gap, 0.5), 4) AS p50_gap_s,
             |round(quantile_cont(gap, 0.9), 4) AS p90_gap_s
             |FROM g WHERE gap IS NOT NULL
             |GROUP BY event_type ORDER BY event_type""".stripMargin.replace('\n', ' ')),
      doc = "per-type inter-arrival gap count and p50/p90 seconds"),

    // ---- key-skew audit: the distribution report that justifies (or
    // rules out) salting before a 100 TB shuffle on this key
    "q_key_skew" -> Q(
      (s, dir) => graft.operators.Profiling.keyProfile(
        table(s, dir, "events"), "user_id", topK = 10),
      Some("""WITH c AS (SELECT user_id::VARCHAR AS k, count(*) AS n
             |  FROM events GROUP BY 1),
             |s AS (SELECT sum(n)::BIGINT AS n_rows, count(*)::BIGINT AS n_keys,
             |  max(n) AS max_n, sum(n * ln(n)) AS nlogn FROM c),
             |t AS (SELECT sum(n) AS top_n FROM
             |  (SELECT n, k FROM c ORDER BY n DESC, k LIMIT 10))
             |SELECT n_rows, n_keys,
             |round(max_n::DOUBLE / n_rows, 6) AS top1_share,
             |round(top_n::DOUBLE / n_rows, 6) AS topk_share,
             |round(ln(n_rows) - nlogn / n_rows, 6) AS entropy,
             |round(CASE WHEN n_keys = 1 THEN 1.0
             |  ELSE (ln(n_rows) - nlogn / n_rows) / ln(n_keys) END, 6) AS uniformity
             |FROM s, t""".stripMargin.replace('\n', ' ')),
      doc = "one-row key-distribution profile of events.user_id (top shares, entropy)"),

    // ---- Benford first-digit audit: the fabricated/truncated-number
    // screen over a money column. Digit extraction via integer string
    // formatting of the cent amount — no log10/pow on doubles, so the
    // digit can never flip across engines at exact powers of ten.
    "q_benford_audit" -> Q(
      (s, dir) => graft.operators.Profiling.benfordAudit(
          table(s, dir, "lineitem"), "l_extendedprice", decimals = 2)
        .orderBy(col("digit")),
      Some("""WITH d AS (SELECT CAST(substr(CAST(CAST(round(abs(l_extendedprice)*100, 0) AS BIGINT) AS VARCHAR),1,1) AS INT) AS digit
             |  FROM lineitem WHERE CAST(round(abs(l_extendedprice)*100, 0) AS BIGINT) > 0),
             |c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
             |t AS (SELECT sum(n)::DOUBLE AS n_tot FROM c)
             |SELECT digit, n, round(n/n_tot,6) AS obs_share,
             |round(log10(1.0 + 1.0/digit),6) AS benford_share,
             |round(pow(n - n_tot*round(log10(1.0+1.0/digit),6), 2)
             |  / (n_tot*round(log10(1.0+1.0/digit),6)),6) AS chi2_term
             |FROM c, t ORDER BY digit""".stripMargin.replace('\n', ' ')),
      doc = "Benford first-significant-digit audit of l_extendedprice (per-digit chi-square terms)"),

    // ---- day-over-day PSI timeline: WHICH day the feed changed, not
    // just whether it differs from one fixed reference
    "q_drift_psi_timeline" -> Q(
      (s, dir) => graft.operators.Drift.psiTimeline(
          table(s, dir, "events").withColumn("day", to_date(col("ts"))),
          "day", "value", nBins = 10)
        .select(col("bucket").cast("string").as("day"),
          col("prev_bucket").cast("string").as("prev_day"),
          col("n_ref"), col("n_cur"), col("psi"))
        .orderBy(col("day")),
      Some("""WITH nn AS (SELECT date_trunc('day', ts)::DATE AS bucket,
             |  value::DOUBLE AS v FROM events WHERE value IS NOT NULL),
             |e AS (SELECT bucket,
             |  quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS edges,
             |  count(*) AS n FROM nn GROUP BY 1),
             |p AS (SELECT bucket, edges, n,
             |  lag(bucket) OVER (ORDER BY bucket) AS prev_bucket,
             |  lag(edges) OVER (ORDER BY bucket) AS prev_edges,
             |  lag(n) OVER (ORDER BY bucket) AS n_ref FROM e),
             |pp AS (SELECT bucket, prev_bucket, prev_edges, n AS n_cur, n_ref
             |  FROM p WHERE prev_bucket IS NOT NULL),
             |curb AS (SELECT pp.bucket AS t,
             |  len(list_filter(pp.prev_edges, x -> nn.v > x)) AS bin, count(*) AS ncb
             |  FROM nn JOIN pp ON nn.bucket = pp.bucket GROUP BY 1, 2),
             |refb AS (SELECT pp.bucket AS t,
             |  len(list_filter(pp.prev_edges, x -> nn.v > x)) AS bin, count(*) AS nrb
             |  FROM nn JOIN pp ON nn.bucket = pp.prev_bucket GROUP BY 1, 2),
             |j AS (SELECT coalesce(curb.t, refb.t) AS t,
             |  coalesce(curb.bin, refb.bin) AS bin,
             |  coalesce(ncb, 0) AS ncb, coalesce(nrb, 0) AS nrb
             |  FROM curb FULL JOIN refb ON curb.t = refb.t AND curb.bin = refb.bin)
             |SELECT pp.bucket::VARCHAR AS day, pp.prev_bucket::VARCHAR AS prev_day,
             |pp.n_ref::BIGINT AS n_ref, pp.n_cur::BIGINT AS n_cur,
             |round(sum((greatest(ncb / pp.n_cur::DOUBLE, 0.0001)
             |    - greatest(nrb / pp.n_ref::DOUBLE, 0.0001))
             |  * ln(greatest(ncb / pp.n_cur::DOUBLE, 0.0001)
             |    / greatest(nrb / pp.n_ref::DOUBLE, 0.0001))), 6) AS psi
             |FROM j JOIN pp ON j.t = pp.bucket
             |GROUP BY 1, 2, 3, 4 ORDER BY day""".stripMargin.replace('\n', ' ')),
      doc = "bucket-over-bucket PSI of event values by day (prev-day deciles)"),

    // ---- CDC latest-state view: one max_by hash agg, shuffle carries
    // keys not history (vs a window that sorts every key's past)
    "q_cdc_latest" -> Q(
      (s, dir) => graft.operators.EventAnalytics.latestSnapshot(
          table(s, dir, "events")
            .select(col("user_id"), col("event_type"), col("event_id"),
              col("ts_ns"), col("value")),
          Seq("user_id", "event_type"), "ts_ns", "event_id")
        .select(col("user_id"), col("event_type"), col("event_id"),
          round(col("value"), 6).as("value"))
        .orderBy(col("user_id"), col("event_type")),
      Some("""SELECT user_id, event_type, event_id, round(value, 6) AS value
             |FROM (SELECT user_id, event_type, event_id, value,
             |  row_number() OVER (PARTITION BY user_id, event_type
             |    ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn FROM events)
             |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin.replace('\n', ' ')),
      doc = "latest row per (user, event_type) — CDC current-state materialization"),

    // ---- association rules over (user, day) baskets: map-side pair
    // generation from per-basket item SETS, never a positions self-join
    "q_assoc_rules" -> Q(
      (s, dir) => graft.operators.EventAnalytics.assocRules(
          table(s, dir, "events").withColumn("day", to_date(col("ts"))),
          Seq("user_id", "day"), "event_type")
        .orderBy(col("antecedent"), col("consequent")),
      Some("""WITH b AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day,
             |  event_type AS i FROM events),
             |nb AS (SELECT count(*)::BIGINT AS n FROM
             |  (SELECT DISTINCT user_id, day FROM b)),
             |it AS (SELECT i, count(*) AS n_i FROM b GROUP BY 1),
             |pc AS (SELECT x.i AS a, y.i AS b, count(*) AS n_ab FROM b x JOIN b y
             |  ON x.user_id = y.user_id AND x.day = y.day AND x.i < y.i
             |  GROUP BY 1, 2),
             |d AS (SELECT a, b, n_ab FROM pc
             |  UNION ALL SELECT b, a, n_ab FROM pc)
             |SELECT d.a AS antecedent, d.b AS consequent, d.n_ab::BIGINT AS n_ab,
             |ia.n_i::BIGINT AS n_a, ib.n_i::BIGINT AS n_b,
             |round(d.n_ab::DOUBLE / nb.n, 6) AS support,
             |round(d.n_ab::DOUBLE / ia.n_i, 6) AS confidence,
             |round(d.n_ab::DOUBLE * nb.n / (ia.n_i::DOUBLE * ib.n_i), 6) AS lift
             |FROM d JOIN it ia ON d.a = ia.i JOIN it ib ON d.b = ib.i, nb
             |ORDER BY antecedent, consequent""".stripMargin.replace('\n', ' ')),
      doc = "event-type association rules (support/confidence/lift) over (user, day) baskets"),

    // ---- per-segment PSI: WHICH user segment drifted (each segment's
    // current values vs that segment's OWN reference deciles)
    "q_drift_psi_group" -> Q(
      (s, dir) => {
        val ev = table(s, dir, "events")
          .withColumn("segment", pmod(col("user_id"), lit(5)))
        graft.operators.Drift.psiBinsByGroup(
            ev.filter(col("event_type") === "click"),
            ev.filter(col("event_type") === "purchase"),
            "value", "segment", nBins = 10)
          .select(col("group").as("segment"), col("n_ref"), col("n_cur"),
            col("psi"))
          .orderBy(col("segment"))
      },
      Some("""WITH ref AS (SELECT (user_id % 5) AS grp, value::DOUBLE AS v
             |  FROM events WHERE event_type = 'click' AND value IS NOT NULL),
             |cur AS (SELECT (user_id % 5) AS grp, value::DOUBLE AS v
             |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
             |e AS (SELECT grp,
             |  quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS edges,
             |  count(*) AS n_ref FROM ref GROUP BY 1),
             |ct AS (SELECT grp, count(*) AS n_cur FROM cur GROUP BY 1),
             |rb AS (SELECT ref.grp, len(list_filter(edges, x -> v > x)) AS bin,
             |  count(*) AS nrb FROM ref JOIN e ON ref.grp = e.grp GROUP BY 1, 2),
             |cb AS (SELECT cur.grp, len(list_filter(edges, x -> v > x)) AS bin,
             |  count(*) AS ncb FROM cur JOIN e ON cur.grp = e.grp GROUP BY 1, 2),
             |j AS (SELECT coalesce(rb.grp, cb.grp) AS grp,
             |  coalesce(rb.bin, cb.bin) AS bin,
             |  coalesce(nrb, 0) AS nrb, coalesce(ncb, 0) AS ncb
             |  FROM rb FULL JOIN cb ON rb.grp = cb.grp AND rb.bin = cb.bin)
             |SELECT j.grp AS segment, e.n_ref::BIGINT AS n_ref,
             |ct.n_cur::BIGINT AS n_cur,
             |round(sum((greatest(ncb / ct.n_cur::DOUBLE, 0.0001)
             |    - greatest(nrb / e.n_ref::DOUBLE, 0.0001))
             |  * ln(greatest(ncb / ct.n_cur::DOUBLE, 0.0001)
             |    / greatest(nrb / e.n_ref::DOUBLE, 0.0001))), 6) AS psi
             |FROM j JOIN e ON j.grp = e.grp JOIN ct ON j.grp = ct.grp
             |GROUP BY 1, 2, 3 ORDER BY segment""".stripMargin.replace('\n', ' ')),
      doc = "per-segment PSI (click reference vs purchase current, user_id % 5 segments)"),

    // ---- time-weighted average: the correct mean of an irregularly
    // sampled signal (each reading holds until the next)
    "q_twap" -> Q(
      (s, dir) => graft.operators.EventAnalytics.timeWeightedAvg(
          table(s, dir, "events").filter(col("user_id") < 100),
          "user_id", "ts_ns", "value", "event_id")
        .orderBy(col("user_id")),
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS t, event_id,
             |  value::DOUBLE AS v FROM events WHERE user_id < 100),
             |l AS (SELECT user_id, t, v,
             |  lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS nt
             |  FROM e),
             |a AS (SELECT user_id, count(*) AS n_obs,
             |  (max(t) - min(t)) / 1e9 AS span,
             |  sum(CASE WHEN nt IS NOT NULL THEN v * (nt - t) ELSE 0.0 END) AS wsum,
             |  avg(v) AS mean FROM l GROUP BY 1)
             |SELECT user_id, n_obs, round(span, 4) AS span_s,
             |round(CASE WHEN span > 0 THEN wsum / (span * 1e9) ELSE mean END, 6)
             |  AS twa,
             |round(mean, 6) AS row_mean FROM a ORDER BY user_id""".stripMargin.replace('\n', ' ')),
      doc = "per-user time-weighted average event value vs the plain row mean"),

    // ---- day-over-day JS timeline: WHICH day the event-type MIX
    // changed (categorical sibling of the PSI timeline)
    "q_drift_js_timeline" -> Q(
      (s, dir) => graft.operators.Drift.jsTimeline(
          table(s, dir, "events").withColumn("day", to_date(col("ts"))),
          "day", "event_type")
        .select(col("bucket").cast("string").as("day"),
          col("prev_bucket").cast("string").as("prev_day"),
          col("n_ref"), col("n_cur"), col("js"))
        .orderBy(col("day")),
      Some("""WITH c AS (SELECT date_trunc('day', ts)::DATE AS bucket,
             |  event_type AS category, count(*) AS n FROM events GROUP BY 1, 2),
             |t AS (SELECT bucket, sum(n) AS tot FROM c GROUP BY 1),
             |p AS (SELECT bucket, tot,
             |  lag(bucket) OVER (ORDER BY bucket) AS prev_bucket,
             |  lag(tot) OVER (ORDER BY bucket) AS n_ref FROM t),
             |pp AS (SELECT bucket, prev_bucket, tot AS n_cur, n_ref FROM p
             |  WHERE prev_bucket IS NOT NULL),
             |cur AS (SELECT c.bucket, category, n AS nc FROM c
             |  JOIN pp ON c.bucket = pp.bucket),
             |ref AS (SELECT pp.bucket, category, n AS nr FROM c
             |  JOIN pp ON c.bucket = pp.prev_bucket),
             |j AS (SELECT coalesce(cur.bucket, ref.bucket) AS bucket,
             |  coalesce(cur.category, ref.category) AS category,
             |  coalesce(nc, 0) AS nc, coalesce(nr, 0) AS nr
             |  FROM cur FULL JOIN ref ON cur.bucket = ref.bucket
             |    AND cur.category = ref.category)
             |SELECT pp.bucket::VARCHAR AS day, pp.prev_bucket::VARCHAR AS prev_day,
             |pp.n_ref::BIGINT AS n_ref, pp.n_cur::BIGINT AS n_cur,
             |round(sum((greatest(nr / pp.n_ref::DOUBLE, 1e-6)
             |    * ln(greatest(nr / pp.n_ref::DOUBLE, 1e-6)
             |      / ((greatest(nr / pp.n_ref::DOUBLE, 1e-6)
             |        + greatest(nc / pp.n_cur::DOUBLE, 1e-6)) / 2))
             |  + greatest(nc / pp.n_cur::DOUBLE, 1e-6)
             |    * ln(greatest(nc / pp.n_cur::DOUBLE, 1e-6)
             |      / ((greatest(nr / pp.n_ref::DOUBLE, 1e-6)
             |        + greatest(nc / pp.n_cur::DOUBLE, 1e-6)) / 2))) / 2), 6) AS js
             |FROM j JOIN pp USING (bucket)
             |GROUP BY 1, 2, 3, 4 ORDER BY day""".stripMargin.replace('\n', ' ')),
      doc = "bucket-over-bucket JS divergence of the event-type mix by day")
  )
}
