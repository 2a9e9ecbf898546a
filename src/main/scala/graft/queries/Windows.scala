package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{DeclaredQuery, Tables}
import graft.Fns._

/** Window / analytic functions w1–w6 (SURVEY §2.3): ranking, running
  * frames, lag-derived deltas, bounded frames, percent_rank/ntile, and
  * as-of-join semantics via a conditional running MAX. All money ordering
  * uses exact integer cents (portable across engines); ints widened to
  * BIGINT in outputs for schema parity.
  */
object Windows {

  val queries: Seq[DeclaredQuery] = Seq(

    DeclaredQuery("w1_order_rank",
      s"""SELECT * FROM (
         |  SELECT o_custkey, o_orderkey,
         |         CAST(${centsS("o_totalprice")} AS DOUBLE)/100.0 AS totalprice,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
         |              ORDER BY ${centsS("o_totalprice")} DESC, o_orderkey) AS BIGINT) AS rn,
         |         CAST(DENSE_RANK() OVER (PARTITION BY o_custkey
         |              ORDER BY ${centsS("o_totalprice")} DESC) AS BIGINT) AS drk
         |  FROM orders) t
         |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin) {
      (s, dir) =>
        val o = Tables.table(s, dir, "orders")
        val byPrice = Window.partitionBy(col("o_custkey"))
        o.select(
            col("o_custkey"), col("o_orderkey"),
            (cents(col("o_totalprice")).cast("double") / lit(100.0)).as("totalprice"),
            row_number().over(byPrice.orderBy(cents(col("o_totalprice")).desc, col("o_orderkey")))
              .cast("long").as("rn"),
            dense_rank().over(byPrice.orderBy(cents(col("o_totalprice")).desc))
              .cast("long").as("drk"))
          .filter(col("rn") <= 3)
          .orderBy(col("o_custkey"), col("rn"))
    },

    DeclaredQuery("w2_running_value",
      s"""SELECT user_id, event_id,
         |       CAST(SUM(${centsS("value")}) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/100.0 AS running_value
         |FROM ${eViewS} e ORDER BY user_id, event_id""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .select(
            col("user_id"), col("event_id"),
            (sum(cents(col("value"))).over(w).cast("double") / lit(100.0)).as("running_value"))
          .orderBy(col("user_id"), col("event_id"))
    },

    DeclaredQuery("w3_inter_event_gap",
      s"""SELECT user_id, COUNT(*) AS n_gaps,
         |       ROUND(CAST(SUM(gap_us) AS DOUBLE)/COUNT(*)/1e6, 3) AS avg_gap_s
         |FROM (SELECT user_id,
         |             ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS gap_us
         |      FROM ${eViewS} e) g
         |WHERE gap_us IS NOT NULL GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        Tables.events(s, dir)
          .select(col("user_id"), (col("ts_us") - lag(col("ts_us"), 1).over(w)).as("gap_us"))
          .filter(col("gap_us").isNotNull)
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_gaps"),
            round(sum(col("gap_us")).cast("double") / count(lit(1)) / lit(1e6), 3).as("avg_gap_s"))
          .orderBy(col("user_id"))
    },

    DeclaredQuery("w4_moving_sum_orders",
      s"""SELECT o_custkey, o_orderkey,
         |       CAST(SUM(${centsS("o_totalprice")}) OVER w AS DOUBLE)/100.0 AS mov_sum5,
         |       COUNT(*) OVER w AS n_in_frame
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
         |ORDER BY o_custkey, o_orderkey""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(-4, Window.currentRow)
        Tables.table(s, dir, "orders")
          .select(
            col("o_custkey"), col("o_orderkey"),
            (sum(cents(col("o_totalprice"))).over(w).cast("double") / lit(100.0)).as("mov_sum5"),
            count(lit(1)).over(w).as("n_in_frame"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    DeclaredQuery("w5_pct_rank",
      s"""SELECT c_custkey, c_nationkey,
         |       ROUND(PERCENT_RANK() OVER (PARTITION BY c_nationkey
         |             ORDER BY ${centsS("c_acctbal")}, c_custkey), 6) AS pr,
         |       CAST(NTILE(4) OVER (PARTITION BY c_nationkey
         |             ORDER BY ${centsS("c_acctbal")}, c_custkey) AS BIGINT) AS quartile
         |FROM customer ORDER BY c_custkey""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(cents(col("c_acctbal")), col("c_custkey"))
        Tables.table(s, dir, "customer")
          .select(
            col("c_custkey"), col("c_nationkey"),
            round(percent_rank().over(w), 6).as("pr"),
            ntile(4).over(w).cast("long").as("quartile"))
          .orderBy(col("c_custkey"))
    },

    // first/last/nth value window functions over the per-customer order
    // history (frame = whole partition so last/nth are well-defined).
    DeclaredQuery("w7_first_last_nth",
      """SELECT o_custkey,
        |       CAST(MIN(first_ord) AS BIGINT) AS first_ord,
        |       CAST(MIN(last_ord) AS BIGINT) AS last_ord,
        |       CAST(MIN(second_ord) AS BIGINT) AS second_ord,
        |       COUNT(*) AS n
        |FROM (SELECT o_custkey,
        |             FIRST_VALUE(o_orderkey) OVER w AS first_ord,
        |             LAST_VALUE(o_orderkey) OVER w AS last_ord,
        |             COALESCE(NTH_VALUE(o_orderkey, 2) OVER w, -1) AS second_ord
        |      FROM orders
        |      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) t
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.table(s, dir, "orders")
          .select(col("o_custkey"),
            first(col("o_orderkey")).over(w).as("fo"),
            last(col("o_orderkey")).over(w).as("lo"),
            coalesce(nth_value(col("o_orderkey"), 2).over(w), lit(-1L)).as("so"))
          .groupBy(col("o_custkey"))
          .agg(
            min(col("fo")).as("first_ord"),
            min(col("lo")).as("last_ord"),
            min(col("so")).as("second_ord"),
            count(lit(1)).as("n"))
          .orderBy(col("o_custkey"))
    },

    DeclaredQuery("w6_asof_last_error",
      s"""SELECT user_id, COUNT(*) AS n_after_err,
         |       ROUND(CAST(SUM(ts_us - last_err) AS DOUBLE)/COUNT(*)/1e6, 3) AS avg_since_err_s
         |FROM (SELECT user_id, ts_us,
         |             MAX(CASE WHEN event_type='error' THEN ts_us END)
         |               OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_err
         |      FROM ${eViewS} e) t
         |WHERE last_err IS NOT NULL GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .select(
            col("user_id"), col("ts_us"),
            max(when(col("event_type") === "error", col("ts_us"))).over(w).as("last_err"))
          .filter(col("last_err").isNotNull)
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_after_err"),
            round(sum(col("ts_us") - col("last_err")).cast("double") / count(lit(1)) / lit(1e6), 3)
              .as("avg_since_err_s"))
          .orderBy(col("user_id"))
    },

    // CUME_DIST — the rank-family member w5 skips: bottom-quartile
    // customers by account balance within their nation. The order key is
    // (exact cents, custkey) so the distribution is tie-free and the 6dp
    // round is portable.
    // cume_dist in EXACT integer micro-units: the order (cents, custkey) is
    // tie-free, so CUME_DIST ≡ row_number/partition_count — computed as
    // (rn·10⁶) DIV n and filtered as 4·rn ≤ n, never a rounded double.
    // (Round-11 finding at sf0.1: ROUND(CUME_DIST(),6) hit a decimal .5
    // boundary — k/N landing exactly on …x5 at 6dp — where Spark's
    // BigDecimal HALF_UP and DuckDB's float rounding disagree on 1 row in
    // 3 741: §2.7b rule 3 applies to ratio outputs too.)
    DeclaredQuery("w9_cume_dist",
      s"""SELECT c_custkey, c_nationkey, (rn * 1000000) // n AS cd_micro FROM (
         |  SELECT c_custkey, c_nationkey,
         |         ROW_NUMBER() OVER (PARTITION BY c_nationkey
         |               ORDER BY ${centsS("c_acctbal")}, c_custkey) AS rn,
         |         COUNT(*) OVER (PARTITION BY c_nationkey) AS n
         |  FROM customer) t
         |WHERE 4*rn <= n
         |ORDER BY c_custkey""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(cents(col("c_acctbal")), col("c_custkey"))
        val wAll = Window.partitionBy(col("c_nationkey"))
        Tables.table(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"),
            row_number().over(w).cast("long").as("rn"),
            count(lit(1)).over(wAll).as("n"))
          .filter(col("rn") * 4 <= col("n"))
          .select(col("c_custkey"), col("c_nationkey"),
            expr("(rn * 1000000) DIV n").as("cd_micro"))
          .orderBy(col("c_custkey"))
    },

    // LOCF (last observation carried forward) — the other half of e13's
    // resampling story: over each type's dense hourly grid, silent hours
    // inherit the last ACTIVE hour's count via IGNORE NULLS last_value.
    // Output stays bounded (per-type rollup: carried-hour count + the exact
    // integer checksum of the carried series).
    DeclaredQuery("w10_locf",
      s"""WITH h AS (SELECT event_type, ts_us // 3600000000 AS hr, COUNT(*) AS n
         |           FROM ${eViewS} e GROUP BY 1, 2),
         |b AS (SELECT event_type, MIN(hr) AS h0, MAX(hr) AS h1 FROM h GROUP BY 1),
         |grid AS (SELECT event_type, unnest(range(h0, h1 + 1)) AS hr FROM b),
         |f AS (SELECT g.event_type, g.hr, COALESCE(h.n, 0) AS n
         |      FROM grid g LEFT JOIN h ON g.event_type = h.event_type AND g.hr = h.hr),
         |l AS (SELECT event_type, hr, n,
         |        LAST_VALUE(CASE WHEN n > 0 THEN n END IGNORE NULLS)
         |          OVER (PARTITION BY event_type ORDER BY hr
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf
         |      FROM f)
         |SELECT event_type, COUNT(*) AS n_hours,
         |       CAST(SUM(CASE WHEN n = 0 AND locf IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |         AS carried_hours,
         |       ${bsumS("COALESCE(locf, 0)")} AS locf_checksum
         |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
        val h = Tables.events(s, dir)
          .groupBy(col("event_type"), expr("ts_us DIV 3600000000").as("hr"))
          .agg(count(lit(1)).as("n"))
        val grid = h.groupBy(col("event_type"))
          .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
          .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("hr"))
        val f = grid.join(h, Seq("event_type", "hr"), "left_outer")
          .select(col("event_type"), col("hr"), coalesce(col("n"), lit(0L)).as("n"))
        val wl = Window.partitionBy(col("event_type")).orderBy(col("hr"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        f.select(col("event_type"), col("n"),
            last(when(col("n") > 0, col("n")), ignoreNulls = true).over(wl).as("locf"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_hours"),
            sum(when(col("n") === 0 && col("locf").isNotNull, 1).otherwise(0)).cast("long")
              .as("carried_hours"),
            sum(coalesce(col("locf"), lit(0L))).as("locf_checksum"))
          .orderBy(col("event_type"))
    },

    // First-touch ATTRIBUTION: each purchase credits the event type that
    // OPENED its session (e3's 30-min-gap sessions) — the standard
    // marketing-attribution join of sessionization + window-first. One
    // user-keyed exchange carries the break flags, session ids, and the
    // session-opener lookup; the final rollup is by (tiny) touch type.
    DeclaredQuery("w11_first_touch",
      s"""WITH e AS (SELECT * FROM ${eViewS}),
         |g AS (SELECT user_id, event_id, ts_us, event_type,
         |             CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id
         |                       ORDER BY ts_us, event_id) > 1800000000
         |                  THEN 1 ELSE 0 END AS brk
         |      FROM e),
         |s AS (SELECT user_id, event_id, ts_us, event_type,
         |             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
         |      FROM g),
         |f AS (SELECT user_id, sess, event_type, ts_us, event_id,
         |             FIRST_VALUE(event_type) OVER (PARTITION BY user_id, sess
         |                         ORDER BY ts_us, event_id) AS touch
         |      FROM s)
         |SELECT touch, COUNT(*) AS n_purchases,
         |       COUNT(DISTINCT CONCAT(CAST(user_id AS VARCHAR), '#', CAST(sess AS VARCHAR)))
         |         AS n_sessions
         |FROM f WHERE event_type = 'purchase'
         |GROUP BY touch ORDER BY touch""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sess = Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"),
            when(col("ts_us") - lag(col("ts_us"), 1).over(w) > 1800000000L, 1)
              .otherwise(0).as("brk"))
          .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"),
            sum(col("brk")).over(wRun).as("sess"))
        val wSess = Window.partitionBy(col("user_id"), col("sess"))
          .orderBy(col("ts_us"), col("event_id"))
        sess
          .select(col("user_id"), col("sess"), col("event_type"),
            first(col("event_type")).over(wSess).as("touch"))
          .filter(col("event_type") === "purchase")
          .groupBy(col("touch"))
          // r13: distinct over the raw (user_id, sess) pair — the oracle's
          // CONCAT form is injective ('#' separator), so the counts are
          // identical, and the engine skips building a string per row and
          // shuffles two longs instead (guide §2.3 — narrower shuffle rows)
          .agg(count(lit(1)).as("n_purchases"),
            countDistinct(col("user_id"), col("sess")).as("n_sessions"))
          .orderBy(col("touch"))
    },

    // RANGE frame (value-based, not row-based): rolling 24h purchase sum per
    // user keyed on the integer µs timestamp. RANGE includes PEERS, so tied
    // timestamps get identical sums in every engine regardless of tie order.
    DeclaredQuery("w8_range_frame",
      s"""WITH pts AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         |                    ${centsS("value")} AS v_cents
         |             FROM events WHERE event_type = 'purchase')
         |SELECT user_id, event_id, ts_us,
         |       CAST(SUM(v_cents) OVER (PARTITION BY user_id ORDER BY ts_us
         |            RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS DOUBLE)/100.0
         |         AS sum_24h
         |FROM pts ORDER BY user_id, ts_us, event_id""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
          .rangeBetween(-86400000000L, Window.currentRow)
        Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts_us"),
            cents(col("value")).as("v_cents"))
          .withColumn("sum_24h", sum(col("v_cents")).over(w).cast("double") / lit(100.0))
          .drop("v_cents")
          .orderBy(col("user_id"), col("ts_us"), col("event_id"))
    }
  )
}
