package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{DeclaredQuery, Tables}
import graft.Fns._

/** Events / streaming-semantics queries e1–e4 (SURVEY §2.6), batch form.
  * All on the canonical `ts_us` µs column. Each has an exact Structured
  * Streaming counterpart (graft.streaming.StreamingQueries) verified by the
  * batch-equivalence test; tumbling/sliding/session windows are expressed
  * with integer bucket arithmetic here so results hash-match DuckDB.
  */
object EventsQ {

  val queries: Seq[DeclaredQuery] = Seq(

    DeclaredQuery("e1_hourly_tumbling",
      s"""SELECT ts_us // 3600000000 AS hour_bucket, event_type, COUNT(*) AS n,
         |       ${msumS("value")} AS sum_value
         |FROM ${eViewS} e GROUP BY ts_us // 3600000000, event_type
         |ORDER BY hour_bucket, event_type""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(expr("ts_us DIV 3600000000").as("hour_bucket"), col("event_type"))
          .agg(count(lit(1)).as("n"), msum(col("value")).as("sum_value"))
          .orderBy(col("hour_bucket"), col("event_type"))
    },

    DeclaredQuery("e2_sliding_windows",
      s"""SELECT win_start, COUNT(*) AS n
         |FROM (SELECT (ts_us // 900000000) - t.k AS win_start
         |      FROM ${eViewS} e, range(0,4) t(k)) q
         |WHERE win_start >= 0 GROUP BY win_start ORDER BY win_start""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .select(expr("ts_us DIV 900000000").as("b"), explode(sequence(lit(0), lit(3))).as("k"))
          .select((col("b") - col("k")).as("win_start"))
          .filter(col("win_start") >= 0)
          .groupBy(col("win_start"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("win_start"))
    },

    DeclaredQuery("e3_session_windows",
      s"""WITH e AS (SELECT * FROM ${eViewS}),
         |g AS (SELECT user_id, event_id, ts_us,
         |             CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
         |                       > 1800000000 THEN 1 ELSE 0 END AS brk
         |      FROM e),
         |s AS (SELECT user_id, ts_us,
         |             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
         |      FROM g),
         |per AS (SELECT user_id, sess, COUNT(*) AS n_ev, MAX(ts_us)-MIN(ts_us) AS dur_us
         |        FROM s GROUP BY user_id, sess)
         |SELECT user_id, COUNT(*) AS n_sessions, MAX(n_ev) AS max_events,
         |       ROUND(CAST(MAX(dur_us) AS DOUBLE)/1e6, 3) AS max_sess_s
         |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts_us"),
            when(col("ts_us") - lag(col("ts_us"), 1).over(w) > 1800000000L, 1).otherwise(0).as("brk"))
          .select(col("user_id"), col("ts_us"), sum(col("brk")).over(wRun).as("sess"))
          .groupBy(col("user_id"), col("sess"))
          .agg(count(lit(1)).as("n_ev"), (max(col("ts_us")) - min(col("ts_us"))).as("dur_us"))
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_sessions"),
            max(col("n_ev")).as("max_events"),
            round(max(col("dur_us")).cast("double") / lit(1e6), 3).as("max_sess_s"))
          .orderBy(col("user_id"))
    },

    DeclaredQuery("e4_stream_dedup",
      """SELECT COUNT(*) AS n_events, COUNT(DISTINCT event_id) AS n_ids,
        |       COUNT(DISTINCT CONCAT(CAST(user_id AS VARCHAR), '|', event_type)) AS n_user_type
        |FROM events""".stripMargin) {
      (s, dir) =>
        Tables.table(s, dir, "events")
          .agg(
            count(lit(1)).as("n_events"),
            countDistinct(col("event_id")).as("n_ids"),
            countDistinct(concat(col("user_id").cast("string"), lit("|"), col("event_type")))
              .as("n_user_type"))
    },

    // Stream-stream join surface (batch form): purchases matched to error
    // events of the SAME user within the preceding hour — the canonical
    // watermarked interval join. The streaming twin joins two watermarked
    // streams on (user, time-range) and is equivalence-tested by replay.
    DeclaredQuery("e6_stream_stream_join",
      """WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
        |           WHERE event_type = 'purchase'),
        |e AS (SELECT user_id, event_id AS err_id, epoch_us(ts) AS err_us FROM events
        |      WHERE event_type = 'error')
        |SELECT p.user_id, COUNT(*) AS n_pairs,
        |       COUNT(DISTINCT p.event_id) AS n_purchases_with_err
        |FROM p JOIN e ON p.user_id = e.user_id
        |  AND e.err_us <= p.ts_us AND e.err_us > p.ts_us - 3600000000
        |GROUP BY p.user_id ORDER BY p.user_id""".stripMargin) {
      (s, dir) =>
        val ev = Tables.events(s, dir)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts_us"))
        val e = ev.filter(col("event_type") === "error")
          .select(col("user_id").as("e_user"), col("event_id").as("err_id"),
            col("ts_us").as("err_us"))
        p.join(e, col("user_id") === col("e_user") &&
            col("err_us") <= col("ts_us") && col("err_us") > col("ts_us") - 3600000000L)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("event_id")).as("n_purchases_with_err"))
          .orderBy(col("user_id"))
    },

    // LEFT OUTER interval join: every purchase flows through, enriched with
    // its recent errors or NULLs — the enrich-or-null shape. The streaming
    // twin (streamStreamErrorsOuter) emits watermark-proven unmatched rows
    // exactly, equivalence-tested by replay with a sentinel flush.
    DeclaredQuery("e7_outer_interval_join",
      """WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
        |           WHERE event_type = 'purchase'),
        |e AS (SELECT user_id, event_id AS err_id, epoch_us(ts) AS err_us FROM events
        |      WHERE event_type = 'error')
        |SELECT p.user_id,
        |       CAST(COUNT(DISTINCT p.event_id) AS BIGINT) AS n_purchases,
        |       CAST(COUNT(DISTINCT CASE WHEN e.err_id IS NOT NULL THEN p.event_id END) AS BIGINT)
        |         AS n_matched,
        |       CAST(COUNT(e.err_id) AS BIGINT) AS n_pair_rows
        |FROM p LEFT JOIN e ON p.user_id = e.user_id
        |  AND e.err_us <= p.ts_us AND e.err_us > p.ts_us - 3600000000
        |GROUP BY p.user_id ORDER BY p.user_id""".stripMargin) {
      (s, dir) =>
        val ev = Tables.events(s, dir)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts_us"))
        val e = ev.filter(col("event_type") === "error")
          .select(col("user_id").as("e_user"), col("event_id").as("err_id"),
            col("ts_us").as("err_us"))
        p.join(e, col("user_id") === col("e_user") &&
            col("err_us") <= col("ts_us") && col("err_us") > col("ts_us") - 3600000000L,
          "left_outer")
          .groupBy(col("user_id"))
          .agg(countDistinct(col("event_id")).as("n_purchases"),
            countDistinct(when(col("err_id").isNotNull, col("event_id"))).as("n_matched"),
            count(col("err_id")).as("n_pair_rows"))
          .orderBy(col("user_id"))
    },

    // Stream-static enrichment join surface: events keyed to the customer
    // dimension (user_id ⊆ c_custkey in the fixture). The streaming twin
    // broadcast-joins the static dim per micro-batch
    // (StreamingQueries.streamStaticSegments, equivalence-tested).
    DeclaredQuery("e5_stream_static_join",
      s"""SELECT c.c_mktsegment, e.event_type, COUNT(*) AS n,
         |       ${msumS("e.value")} AS sum_value
         |FROM events e JOIN customer c ON e.user_id = c.c_custkey
         |GROUP BY c.c_mktsegment, e.event_type
         |ORDER BY c.c_mktsegment, e.event_type""".stripMargin) {
      (s, dir) =>
        Tables.table(s, dir, "events")
          .join(broadcast(Tables.table(s, dir, "customer")),
            col("user_id") === col("c_custkey"))
          .groupBy(col("c_mktsegment"), col("event_type"))
          .agg(count(lit(1)).as("n"), msum(col("value")).as("sum_value"))
          .orderBy(col("c_mktsegment"), col("event_type"))
    },

    // Conversion funnel view → click → purchase: per user, the earliest
    // view, the earliest click AT-OR-AFTER that view, and the earliest
    // purchase at-or-after that click (a sequentially-dependent min chain —
    // NOT three independent mins). Three user-keyed aggregations + left
    // joins: every shuffle is on user_id, so one exchange is reused across
    // all stages (co-partitioned joins, no re-shuffle); stage frames only
    // shrink down-funnel. The streaming twin (StreamingQueries.funnelCustom)
    // maintains the same chain as flatMapGroupsWithState per-user state.
    DeclaredQuery("e8_funnel",
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |u AS (SELECT DISTINCT user_id FROM e),
        |v AS (SELECT user_id, MIN(ts_us) AS v_us FROM e WHERE event_type='view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts_us) AS c_us FROM e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type='click' AND e.ts_us >= v.v_us GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts_us) AS p_us FROM e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type='purchase' AND e.ts_us >= c.c_us GROUP BY e.user_id)
        |SELECT u.user_id,
        |       CAST(CASE WHEN p.p_us IS NOT NULL THEN 3 WHEN c.c_us IS NOT NULL THEN 2
        |                 WHEN v.v_us IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage,
        |       v.v_us, c.c_us, p.p_us
        |FROM u LEFT JOIN v ON u.user_id = v.user_id
        |       LEFT JOIN c ON u.user_id = c.user_id
        |       LEFT JOIN p ON u.user_id = p.user_id
        |ORDER BY u.user_id""".stripMargin) {
      (s, dir) =>
        val e = Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts_us"))
        val u = e.select(col("user_id")).distinct()
        val v = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts_us")).as("v_us"))
        val c = e.filter(col("event_type") === "click")
          .join(v, Seq("user_id"))
          .filter(col("ts_us") >= col("v_us"))
          .groupBy(col("user_id")).agg(min(col("ts_us")).as("c_us"))
        val p = e.filter(col("event_type") === "purchase")
          .join(c, Seq("user_id"))
          .filter(col("ts_us") >= col("c_us"))
          .groupBy(col("user_id")).agg(min(col("ts_us")).as("p_us"))
        u.join(v, Seq("user_id"), "left")
          .join(c, Seq("user_id"), "left")
          .join(p, Seq("user_id"), "left")
          .select(col("user_id"),
            when(col("p_us").isNotNull, 3L).when(col("c_us").isNotNull, 2L)
              .when(col("v_us").isNotNull, 1L).otherwise(0L).as("stage"),
            col("v_us"), col("c_us"), col("p_us"))
          .orderBy(col("user_id"))
    },

    // Cohort retention matrix — users grouped by first-activity week, then
    // distinct-user counts per (cohort week, week offset): the classic
    // retention triangle. Integer epoch-week buckets keep the matrix exact
    // and portable. Both aggregations shuffle on user_id; the cohort frame
    // is user-cardinality (slim) and joins back pre-aggregated — the
    // distinct is per (cohort, offset, user), computed without ever
    // materializing per-user event lists.
    DeclaredQuery("e9_cohort_retention",
      """WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
        |f AS (SELECT user_id, MIN(wk) AS w0 FROM e GROUP BY user_id)
        |SELECT f.w0 AS cohort_week, e.wk - f.w0 AS week_offset,
        |       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM e JOIN f ON e.user_id = f.user_id
        |GROUP BY f.w0, e.wk - f.w0
        |ORDER BY cohort_week, week_offset""".stripMargin) {
      (s, dir) =>
        val e = Tables.events(s, dir)
          .select(col("user_id"), expr("ts_us DIV 604800000000").as("wk"))
        val f = e.groupBy(col("user_id")).agg(min(col("wk")).as("w0"))
        e.join(f, Seq("user_id"))
          .groupBy(col("w0").as("cohort_week"), (col("wk") - col("w0")).as("week_offset"))
          .agg(count_distinct(col("user_id")).cast("long").as("n_users"))
          .orderBy(col("cohort_week"), col("week_offset"))
    },

    // Window-of-window: the daily PEAK hourly event rate per type — an
    // aggregation OVER an aggregation, the re-windowing shape behind any
    // "max QPS per day" dashboard. Two integer-bucket hash aggregations;
    // the second consumes the already-reduced hourly frame (≤ 24×types rows
    // per day), so the day rollup is shuffle-trivial at any SF. Streaming
    // twin: StreamingQueries.dailyPeakHour (chained time-window aggregation
    // over window_time), replay-tested ≡ this batch form.
    DeclaredQuery("e10_daily_peak_hour",
      s"""WITH h AS (SELECT ts_us // 3600000000 AS hr, event_type, COUNT(*) AS n
         |           FROM ${eViewS} e GROUP BY 1, 2)
         |SELECT hr // 24 AS day_bucket, event_type,
         |       MAX(n) AS peak_hourly_n, ${bsumS("n")} AS day_n
         |FROM h GROUP BY 1, 2 ORDER BY day_bucket, event_type""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(expr("ts_us DIV 3600000000").as("hr"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .groupBy(expr("hr DIV 24").as("day_bucket"), col("event_type"))
          .agg(max(col("n")).as("peak_hourly_n"), sum(col("n")).as("day_n"))
          .orderBy(col("day_bucket"), col("event_type"))
    },

    // Rate-anomaly detection: hours whose event count sits >3σ above the
    // trailing-24-observed-hours mean, per type — the monitoring query
    // behind every "traffic spike" alert. ENTIRELY integer: the 3σ test
    // (n−μ)² > 9σ² cross-multiplies to (24n−S)² > 9(24Q−S²) over the
    // trailing count/sum/sum-of-squares, so there is NO float anywhere —
    // portable by construction, no rounding contract needed. One hourly
    // hash agg, one window pass partitioned by type (25 partitions of ~700
    // rows each at any SF — the hourly frame, not the event stream).
    DeclaredQuery("e11_rate_anomaly",
      s"""WITH h AS (SELECT event_type, ts_us // 3600000000 AS hr, COUNT(*) AS n
         |           FROM ${eViewS} e GROUP BY 1, 2),
         |w AS (SELECT event_type, hr, n,
         |        COUNT(*) OVER tr AS k,
         |        CAST(SUM(n)   OVER tr AS BIGINT) AS s,
         |        CAST(SUM(n*n) OVER tr AS BIGINT) AS q
         |      FROM h
         |      WINDOW tr AS (PARTITION BY event_type ORDER BY hr
         |                    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
         |SELECT event_type, hr, n, s AS trail_sum
         |FROM w
         |WHERE k = 24 AND 24*n - s > 0
         |  AND (24*n - s)*(24*n - s) > 9*(24*q - s*s)
         |ORDER BY event_type, hr""".stripMargin) {
      (s, dir) =>
        val tr = Window.partitionBy(col("event_type")).orderBy(col("hr"))
          .rowsBetween(-24, -1)
        Tables.events(s, dir)
          .groupBy(col("event_type"), expr("ts_us DIV 3600000000").as("hr"))
          .agg(count(lit(1)).as("n"))
          .select(col("event_type"), col("hr"), col("n"),
            count(lit(1)).over(tr).as("k"),
            sum(col("n")).over(tr).as("s"),
            // square in the WIDENED type: n*n in int64 wraps once an hourly
            // count passes ~3·10⁹ — exactly the cluster-scale regime the
            // decimal(38,0) arithmetic below exists for (DuckDB promotes
            // the whole expression to HUGEINT)
            sum(col("n").cast("decimal(38,0)") * col("n").cast("decimal(38,0)"))
              .over(tr).as("q"))
          .filter {
            // the squared deviation products in decimal(38,0): DuckDB
            // promotes to HUGEINT, and at cluster-scale hourly counts
            // (24n)² passes 2^63 — 64-bit Spark arithmetic would wrap
            // silently (the r16/r17 lesson applied here)
            val dev = (lit(24) * col("n") - col("s")).cast("decimal(38,0)")
            val varN = (lit(24) * col("q") -
              col("s").cast("decimal(38,0)") * col("s").cast("decimal(38,0)"))
            col("k") === 24 && lit(24) * col("n") - col("s") > 0 &&
              dev * dev > lit(9) * varN
          }
          .select(col("event_type"), col("hr"), col("n"), col("s").as("trail_sum"))
          .orderBy(col("event_type"), col("hr"))
    },

    // DYNAMIC-gap sessionization: each event extends its session by a gap
    // that depends on the event itself (purchases hold attention 60 min,
    // everything else 30) — the `session_window(ts, CASE ...)` semantic,
    // expressed exactly in batch as running-max gaps-and-islands: a session
    // breaks where ts reaches the running MAX (half-open [ts, ts+gap) windows — the
    // exact merge rule of Spark's dynamic session_window, so the streaming
    // twin is bit-equivalent) of all previous (ts + gap)
    // ends. Entirely integer µs; three window passes + two aggs, ALL keyed
    // on user_id — one exchange.
    DeclaredQuery("e12_dynamic_sessions",
      s"""WITH p AS (SELECT user_id, ts_us, event_id,
         |             CASE WHEN event_type = 'purchase' THEN 3600000000
         |                  ELSE 1800000000 END AS gap
         |           FROM ${eViewS} e),
         |w AS (SELECT user_id, ts_us,
         |        MAX(ts_us + gap) OVER (PARTITION BY user_id
         |                               ORDER BY ts_us, event_id
         |                               ROWS BETWEEN UNBOUNDED PRECEDING
         |                               AND 1 PRECEDING) AS prev_end,
         |        event_id
         |      FROM p),
         |s AS (SELECT user_id,
         |        CAST(SUM(CASE WHEN prev_end IS NULL OR ts_us >= prev_end
         |                      THEN 1 ELSE 0 END)
         |             OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
         |      FROM w),
         |g AS (SELECT user_id, sess_id, COUNT(*) AS n FROM s GROUP BY user_id, sess_id)
         |SELECT user_id, COUNT(*) AS n_sessions, ${bsumS("n")} AS n_events,
         |       CAST(MAX(n) AS BIGINT) AS longest_session
         |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (s, dir) =>
        val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .select(col("user_id"), col("ts_us"), col("event_id"),
            when(col("event_type") === "purchase", lit(3600000000L))
              .otherwise(lit(1800000000L)).as("gap"))
          .select(col("user_id"), col("ts_us"), col("event_id"),
            max(col("ts_us") + col("gap")).over(wPrev).as("prev_end"))
          .select(col("user_id"), col("ts_us"), col("event_id"),
            sum(when(col("prev_end").isNull || col("ts_us") >= col("prev_end"), 1)
              .otherwise(0)).over(wRun).cast("long").as("sess_id"))
          .groupBy(col("user_id"), col("sess_id"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"),
            max(col("n")).cast("long").as("longest_session"))
          .orderBy(col("user_id"))
    },

    // Time-series RESAMPLE / gap-fill: the dense hourly grid per event type
    // (missing hours materialized as zero) plus the gap diagnosis a
    // monitoring pipeline needs — silent-hour count and the LONGEST silent
    // streak (gaps-and-islands over the generated grid). The grid generates
    // from each type's (min, max) hour span — sequence+explode, never a
    // driver-side range; everything integer.
    DeclaredQuery("e13_gap_fill",
      s"""WITH h AS (SELECT event_type, ts_us // 3600000000 AS hr, COUNT(*) AS n
         |           FROM ${eViewS} e GROUP BY 1, 2),
         |b AS (SELECT event_type, MIN(hr) AS h0, MAX(hr) AS h1 FROM h GROUP BY 1),
         |grid AS (SELECT event_type, unnest(range(h0, h1 + 1)) AS hr FROM b),
         |f AS (SELECT g.event_type, g.hr, COALESCE(h.n, 0) AS n
         |      FROM grid g LEFT JOIN h ON g.event_type = h.event_type AND g.hr = h.hr),
         |r AS (SELECT event_type, hr, n,
         |        hr - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hr) AS grp
         |      FROM f WHERE n = 0),
         |streaks AS (SELECT event_type, COUNT(*) AS len
         |            FROM r GROUP BY event_type, grp)
         |SELECT f.event_type, COUNT(*) AS n_hours, ${bsumS("f.n")} AS n_events,
         |       CAST(SUM(CASE WHEN f.n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS silent_hours,
         |       CAST(COALESCE((SELECT MAX(len) FROM streaks s
         |                      WHERE s.event_type = f.event_type), 0) AS BIGINT) AS longest_silence
         |FROM f GROUP BY f.event_type ORDER BY f.event_type""".stripMargin) {
      (s, dir) =>
        val h = Tables.events(s, dir)
          .groupBy(col("event_type"), expr("ts_us DIV 3600000000").as("hr"))
          .agg(count(lit(1)).as("n"))
        val grid = h.groupBy(col("event_type"))
          .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
          .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("hr"))
        val f = grid.join(h, Seq("event_type", "hr"), "left_outer")
          .select(col("event_type"), col("hr"), coalesce(col("n"), lit(0L)).as("n"))
        val wt = Window.partitionBy(col("event_type")).orderBy(col("hr"))
        val streaks = f.filter(col("n") === 0)
          .select(col("event_type"), (col("hr") - row_number().over(wt)).as("grp"))
          .groupBy(col("event_type"), col("grp"))
          .agg(count(lit(1)).as("len"))
          .groupBy(col("event_type"))
          .agg(max(col("len")).as("ls"))
        f.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_hours"), sum(col("n")).as("n_events"),
            sum(when(col("n") === 0, 1).otherwise(0)).cast("long").as("silent_hours"))
          .join(streaks, Seq("event_type"), "left_outer")
          .select(col("event_type"), col("n_hours"), col("n_events"),
            col("silent_hours"), coalesce(col("ls"), lit(0L)).as("longest_silence"))
          .orderBy(col("event_type"))
    }
  )
}
