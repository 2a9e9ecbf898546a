package graft.queries

import org.apache.spark.sql.functions._

import graft.{DeclaredQuery, Tables}
import graft.Fns._
import graft.util.Snap.Ops

/** Relational core r1–r9 (SURVEY §2.2): scans, filters, multi-way joins,
  * hash aggregation, rollup/cube, distinct aggregation, range-residual outer
  * join. All builtin Catalyst — broadcast hints only on the constant-size
  * dimension tables (region/nation); everything else is left to the
  * optimizer + AQE so plans keep improving as stats change with scale.
  */
object Relational {

  /** r21's checkpoint-BUILD frame (pre-snap): the semi-joined lineitem
    * per-part aggregation. Exposed so ExplainPlanTest can pin the build's
    * own shape — broadcast LeftSemi into lineitem, partial aggregation
    * before the partkey exchange — which the final `Scan ExistingRDD` plan
    * hides (round-13 ADVICE). */
  private[graft] def r21ValFBuild(s: org.apache.spark.sql.SparkSession,
                                  dir: String): org.apache.spark.sql.DataFrame = {
    val supp = Tables.table(s, dir, "supplier")
      .join(broadcast(Tables.table(s, dir, "nation")
        .filter(col("n_regionkey") === 2).select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    Tables.table(s, dir, "lineitem")
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("v"))
  }

  val queries: Seq[DeclaredQuery] = Seq(

    DeclaredQuery("r1_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
         |       ${msumS("l_quantity")} AS sum_qty,
         |       ${msumS("l_extendedprice")} AS sum_base_price,
         |       $mrevS AS sum_disc_price,
         |       ${msumS("l_extendedprice*(1-l_discount)*(1+l_tax)")} AS sum_charge,
         |       ROUND(CAST(SUM(${centsS("l_quantity")}) AS DOUBLE)/COUNT(*)/100.0, 4) AS avg_qty,
         |       COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin) {
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .filter(col("l_shipdate") <= expr("TIMESTAMP '1998-12-01 00:00:00'"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            msum(col("l_quantity")).as("sum_qty"),
            msum(col("l_extendedprice")).as("sum_base_price"),
            msum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
            msum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
            round(sum(cents(col("l_quantity"))).cast("double") / count(lit(1)) / lit(100.0), 4).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    DeclaredQuery("r2_top_revenue_customers",
      s"""SELECT c.c_custkey, c.c_name, $mrevS AS revenue
         |FROM customer c JOIN orders o ON c.c_custkey=o.o_custkey
         |JOIN lineitem l ON o.o_orderkey=l.l_orderkey
         |GROUP BY c.c_custkey, c.c_name
         |ORDER BY $mrevS DESC, c.c_custkey LIMIT 10""".stripMargin) {
      (s, dir) =>
        // Partial-aggregation pushdown: revenue cents are summed per order
        // BEFORE the joins (600k→150k rows into the shuffle), then re-summed
        // per customer — exact integer arithmetic, so associativity is free.
        val c = Tables.table(s, dir, "customer")
        val o = Tables.table(s, dir, "orders")
        val perOrder = Tables.table(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("order_cents"))
        o.join(perOrder, o("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(sum(col("order_cents")).as("cust_cents"))
          .join(c, col("o_custkey") === c("c_custkey"))
          .select(c("c_custkey"), c("c_name"),
            (col("cust_cents").cast("double") / lit(100.0)).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(10)
    },

    DeclaredQuery("r3_shipping_priority",
      s"""SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS o_orderdate,
         |       $mrevS AS revenue
         |FROM customer c JOIN orders o ON c.c_custkey=o.o_custkey
         |JOIN lineitem l ON o.o_orderkey=l.l_orderkey
         |WHERE c.c_mktsegment='BUILDING'
         |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l.l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
         |ORDER BY $mrevS DESC, o.o_orderkey LIMIT 10""".stripMargin) {
      (s, dir) =>
        val c = Tables.table(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.table(s, dir, "orders")
          .filter(col("o_orderdate") < expr("TIMESTAMP '1997-01-01 00:00:00'"))
        val l = Tables.table(s, dir, "lineitem")
          .filter(col("l_shipdate") > expr("TIMESTAMP '1997-01-01 00:00:00'"))
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy(o("o_orderkey"), o("o_orderdate").cast("date").as("o_orderdate"))
          .agg(msum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
    },

    DeclaredQuery("r4_local_supplier_volume",
      s"""SELECT n.n_name, $mrevS AS revenue, COUNT(*) AS n_items
         |FROM region r JOIN nation n   ON n.n_regionkey=r.r_regionkey
         |JOIN customer c ON c.c_nationkey=n.n_nationkey
         |JOIN orders o   ON o.o_custkey=c.c_custkey
         |JOIN lineitem l ON l.l_orderkey=o.o_orderkey
         |JOIN supplier s ON s.s_suppkey=l.l_suppkey AND s.s_nationkey=c.c_nationkey
         |WHERE r.r_name='ASIA'
         |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin) {
      (s, dir) =>
        val r = Tables.table(s, dir, "region").filter(col("r_name") === "ASIA")
        val n = Tables.table(s, dir, "nation")
        val c = Tables.table(s, dir, "customer")
        val o = Tables.table(s, dir, "orders")
          .filter(col("o_orderdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
                  col("o_orderdate") <  expr("TIMESTAMP '1998-01-01 00:00:00'"))
        val l = Tables.table(s, dir, "lineitem")
        val su = Tables.table(s, dir, "supplier")
        broadcast(r).join(n, n("n_regionkey") === r("r_regionkey"))
          .join(c, c("c_nationkey") === n("n_nationkey"))
          .join(o, o("o_custkey") === c("c_custkey"))
          .join(l, l("l_orderkey") === o("o_orderkey"))
          .join(su, su("s_suppkey") === l("l_suppkey") && su("s_nationkey") === c("c_nationkey"))
          .groupBy(n("n_name"))
          .agg(
            msum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("n_name"))
    },

    DeclaredQuery("r5_rollup_acctbal",
      s"""SELECT r.r_name, n.n_name, COUNT(*) AS n_cust,
         |       ${msumS("c.c_acctbal")} AS sum_bal,
         |       CAST(GROUPING(r.r_name) AS BIGINT) AS g_r,
         |       CAST(GROUPING(n.n_name) AS BIGINT) AS g_n
         |FROM customer c JOIN nation n ON c.c_nationkey=n.n_nationkey
         |JOIN region r ON n.n_regionkey=r.r_regionkey
         |GROUP BY ROLLUP(r.r_name, n.n_name)
         |ORDER BY g_r, g_n, r.r_name NULLS FIRST, n.n_name NULLS FIRST""".stripMargin) {
      (s, dir) =>
        val c = Tables.table(s, dir, "customer")
        val n = Tables.table(s, dir, "nation")
        val r = Tables.table(s, dir, "region")
        c.join(n, c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(
            count(lit(1)).as("n_cust"),
            msum(col("c_acctbal")).as("sum_bal"),
            grouping(col("r_name")).cast("long").as("g_r"),
            grouping(col("n_name")).cast("long").as("g_n"))
          .orderBy(col("g_r"), col("g_n"), col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    },

    DeclaredQuery("r6_distinct_parts_per_supplier",
      """SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_items
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin) {
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .groupBy(col("l_suppkey"))
          .agg(countDistinct(col("l_partkey")).as("n_parts"), count(lit(1)).as("n_items"))
          .orderBy(col("l_suppkey"))
    },

    DeclaredQuery("r7_promo_brand_discount",
      s"""SELECT p.p_brand,
         |       ROUND(CAST(SUM(${centsS("l.l_discount")}) AS DOUBLE)/COUNT(*)/100.0, 6) AS avg_disc,
         |       COUNT(*) AS n
         |FROM part p JOIN lineitem l ON p.p_partkey=l.l_partkey
         |WHERE p.p_type LIKE 'PROMO%' GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin) {
      (s, dir) =>
        val p = Tables.table(s, dir, "part").filter(col("p_type").like("PROMO%"))
        val l = Tables.table(s, dir, "lineitem")
        broadcast(p).join(l, p("p_partkey") === l("l_partkey"))
          .groupBy(col("p_brand"))
          .agg(
            round(sum(cents(col("l_discount"))).cast("double") / count(lit(1)) / lit(100.0), 6).as("avg_disc"),
            count(lit(1)).as("n"))
          .orderBy(col("p_brand"))
    },

    DeclaredQuery("r8_shipped_within_90d",
      """SELECT o.o_orderkey, COUNT(l.l_orderkey) AS n_shipped
        |FROM orders o LEFT JOIN lineitem l
        |  ON l.l_orderkey=o.o_orderkey
        | AND l.l_shipdate >= o.o_orderdate
        | AND l.l_shipdate <  o.o_orderdate + INTERVAL 90 DAY
        |GROUP BY o.o_orderkey ORDER BY o.o_orderkey""".stripMargin) {
      (s, dir) =>
        val o = Tables.table(s, dir, "orders")
        val l = Tables.table(s, dir, "lineitem")
        // equi key + non-equi residual → hash join with filter, not a BNLJ
        o.join(l,
            l("l_orderkey") === o("o_orderkey") &&
            l("l_shipdate") >= o("o_orderdate") &&
            l("l_shipdate") < o("o_orderdate") + expr("INTERVAL 90 DAY"),
            "left_outer")
          .groupBy(o("o_orderkey"))
          .agg(count(l("l_orderkey")).as("n_shipped"))
          .orderBy(col("o_orderkey"))
    },

    DeclaredQuery("r9_cube_orders",
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |       ${msumS("o_totalprice")} AS total,
         |       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_s,
         |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_p
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY g_s, g_p, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) {
      (s, dir) =>
        Tables.table(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n"),
            msum(col("o_totalprice")).as("total"),
            grouping(col("o_orderstatus")).cast("long").as("g_s"),
            grouping(col("o_orderpriority")).cast("long").as("g_p"))
          .orderBy(col("g_s"), col("g_p"),
            col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },

    // Exact continuous quantiles (linear interpolation — both engines use
    // the standard (n-1)p rule; single-interpolation arithmetic is safe
    // under ROUND(…,4) per §2.7b rule 5).
    DeclaredQuery("r10_quantiles",
      """SELECT l_returnflag,
        |       ROUND(quantile_cont(l_quantity, 0.25), 4) AS q25,
        |       ROUND(quantile_cont(l_quantity, 0.5), 4)  AS q50,
        |       ROUND(quantile_cont(l_quantity, 0.75), 4) AS q75,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            round(expr("percentile(l_quantity, 0.25)"), 4).as("q25"),
            round(expr("percentile(l_quantity, 0.5)"), 4).as("q50"),
            round(expr("percentile(l_quantity, 0.75)"), 4).as("q75"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"))
    },

    // Pivot (wide reshape): order counts by priority × status.
    DeclaredQuery("r11_pivot",
      """SELECT o_orderpriority,
        |       CAST(COALESCE(SUM(CASE WHEN o_orderstatus='F' THEN 1 END), 0) AS BIGINT) AS F,
        |       CAST(COALESCE(SUM(CASE WHEN o_orderstatus='O' THEN 1 END), 0) AS BIGINT) AS O,
        |       CAST(COALESCE(SUM(CASE WHEN o_orderstatus='P' THEN 1 END), 0) AS BIGINT) AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
      (s, dir) =>
        Tables.table(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .select(col("o_orderpriority"),
            coalesce(col("F"), lit(0L)).as("F"),
            coalesce(col("O"), lit(0L)).as("O"),
            coalesce(col("P"), lit(0L)).as("P"))
          .orderBy(col("o_orderpriority"))
    },

    // Unpivot (long reshape): one row of exact cent sums melted to
    // (metric, value) pairs.
    DeclaredQuery("r12_unpivot",
      s"""SELECT 'disc' AS metric, CAST(SUM(${centsS("l_discount")}) AS BIGINT) AS value FROM lineitem
         |UNION ALL SELECT 'price', CAST(SUM(${centsS("l_extendedprice")}) AS BIGINT) FROM lineitem
         |UNION ALL SELECT 'qty', CAST(SUM(${centsS("l_quantity")}) AS BIGINT) FROM lineitem
         |ORDER BY metric""".stripMargin) {
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .agg(
            sum(cents(col("l_discount"))).as("disc"),
            sum(cents(col("l_extendedprice"))).as("price"),
            sum(cents(col("l_quantity"))).as("qty"))
          .unpivot(Array.empty, Array(col("disc"), col("price"), col("qty")), "metric", "value")
          .orderBy(col("metric"))
    },

    // Correlated-aggregate semantics ("orders above their customer's
    // average") with an exact integer comparison: p·n > Σp in cents, so no
    // float division ever happens — portable across engines and shuffle
    // orders. One window, no self-join.
    DeclaredQuery("r13_above_cust_avg",
      s"""WITH oc AS (SELECT o_custkey, ${centsS("o_totalprice")} AS p_cents FROM orders),
         |st AS (SELECT o_custkey, SUM(p_cents) AS s, COUNT(*) AS n
         |       FROM oc GROUP BY o_custkey)
         |SELECT oc.o_custkey, COUNT(*) AS n_above
         |FROM oc JOIN st ON oc.o_custkey = st.o_custkey
         |WHERE oc.p_cents * st.n > st.s
         |GROUP BY oc.o_custkey ORDER BY oc.o_custkey LIMIT 100""".stripMargin) {
      (s, dir) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
        Tables.table(s, dir, "orders")
          .select(col("o_custkey"), cents(col("o_totalprice")).as("p_cents"))
          .withColumn("s", sum(col("p_cents")).over(w))
          .withColumn("n", count(lit(1)).over(w))
          .filter(col("p_cents") * col("n") > col("s"))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_above"))
          .orderBy(col("o_custkey"))
          .limit(100)
    },

    // TPC-H Q17 shape — revenue of small-quantity orders: lineitems whose
    // quantity is below 20% of their part's average. The per-part threshold
    // is a PRE-AGGREGATION on the fact table (sum, n per partkey) joined
    // back on the partkey — never a per-row correlated rescan — and the
    // comparison is exact integer arithmetic in quantity-cents
    // (q < sum/(5n) ⟺ 5·q·n < sum), so no float division touches the
    // predicate. The slim part dim broadcasts.
    DeclaredQuery("r14_small_qty_revenue",
      s"""WITH lc AS (SELECT l_partkey, ${centsS("l_quantity")} AS q_cents,
         |                   l_extendedprice FROM lineitem),
         |st AS (SELECT l_partkey, SUM(q_cents) AS s, COUNT(*) AS n
         |       FROM lc GROUP BY l_partkey)
         |SELECT p.p_brand, COUNT(*) AS n_small,
         |       ${msumS("lc.l_extendedprice")} AS small_rev
         |FROM lc JOIN st ON lc.l_partkey = st.l_partkey
         |        JOIN part p ON p.p_partkey = lc.l_partkey
         |WHERE 5 * lc.q_cents * st.n < st.s
         |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin) {
      (s, dir) =>
        val lc = Tables.table(s, dir, "lineitem")
          .select(col("l_partkey"), cents(col("l_quantity")).as("q_cents"),
            col("l_extendedprice"))
        val st = lc.groupBy(col("l_partkey"))
          .agg(sum(col("q_cents")).as("s"), count(lit(1)).as("n"))
        val p = Tables.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))
        lc.join(st, "l_partkey")
          .filter(lit(5) * col("q_cents") * col("n") < col("s"))
          .join(broadcast(p), col("p_partkey") === col("l_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_small"), msum(col("l_extendedprice")).as("small_rev"))
          .orderBy(col("p_brand"))
    },

    // TPC-H Q21 shape — suppliers who kept orders waiting: in multi-supplier
    // orders, the supplier who was the ONLY late shipper (> 60 days after
    // the order date). The doubly-correlated EXISTS / NOT EXISTS pair plans
    // as one SEMI and one ANTI hash join on the order key with the
    // supplier-inequality as residual — no per-row re-scan of lineitem.
    DeclaredQuery("r15_only_late_supplier",
      """WITH ls AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
        |late AS (SELECT DISTINCT l.l_orderkey, l.l_suppkey
        |         FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |         WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |SELECT s.s_name, COUNT(*) AS numwait
        |FROM late w
        |JOIN supplier s ON s.s_suppkey = w.l_suppkey
        |WHERE EXISTS (SELECT 1 FROM ls l2 WHERE l2.l_orderkey = w.l_orderkey
        |                                    AND l2.l_suppkey <> w.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3 WHERE l3.l_orderkey = w.l_orderkey
        |                                          AND l3.l_suppkey <> w.l_suppkey)
        |GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 20""".stripMargin) {
      (s, dir) =>
        // Decorrelated further than the semi/anti pair: ONE lineitem scan
        // flags each (order, supplier) as late-or-not; per-order counts
        // then encode both subqueries — EXISTS other supplier ⇔ n_supp ≥ 2,
        // NOT EXISTS other late one ⇔ n_late = 1 (the row itself is late).
        // Every aggregation/join after the first keys on l_orderkey, so the
        // (orderkey, suppkey) distinct exchange is planned once and reused.
        val l = Tables.table(s, dir, "lineitem")
        val o = Tables.table(s, dir, "orders")
        val sup = Tables.table(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))
        // r13 (guide §2.4 — share one exchange): hash the joined frame by
        // l_orderkey ONCE; hashpartitioning(l_orderkey) satisfies both the
        // (l_orderkey, l_suppkey) grouping (subset key co-locates the
        // pairs) and the per-order window below, so the window's own
        // exchange of the aggregated frame disappears (2 exchanges → 1 on
        // the fact path; plan-guarded).
        val flagged = l.join(o, l("l_orderkey") === o("o_orderkey"))
          .select(col("l_orderkey"), col("l_suppkey"),
            (l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAY"))
              .cast("int").as("late"))
          .repartition(col("l_orderkey"))
          .groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(max(col("late")).as("is_late"))
        // per-order counts as an UNORDERED window over the same frame — a
        // LINEAR plan (agg → window → filter), no self-referencing subtree
        // for Spark to plan twice; lineitem is scanned exactly once
        // (plan-guarded).
        val wOrd = org.apache.spark.sql.expressions.Window.partitionBy(col("l_orderkey"))
        flagged
          .select(col("l_orderkey"), col("l_suppkey"), col("is_late"),
            count(lit(1)).over(wOrd).as("n_supp"),
            sum(col("is_late")).over(wOrd).as("n_late"))
          .filter(col("is_late") === 1 && col("n_supp") >= 2 && col("n_late") === 1)
          .join(broadcast(sup), col("s_suppkey") === col("l_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
    },

    // TPC-H Q20 shape (no partsupp table in the fixture, so "availability"
    // is re-derived from shipments): suppliers who DOMINATE some red part —
    // shipped > 3× the average per-supplier quantity of that part. The
    // doubly-nested subquery plans as: per-(part,supplier) agg → ONE further
    // re-agg for the per-part total (no second lineitem scan) → broadcast
    // semi-join on the filtered part dim → semi-join into supplier. All
    // compares in exact integer quantity-cents; the threshold is RELATIVE
    // (vs the part's average supplier share), so the predicate is
    // scale-invariant — TPC-H itself rescales Q20's constant by 1/SF.
    DeclaredQuery("r16_dominant_supplier",
      s"""WITH pq AS (SELECT l_partkey, l_suppkey, SUM(${centsS("l_quantity")}) AS sq
         |            FROM lineitem GROUP BY l_partkey, l_suppkey),
         |pt AS (SELECT l_partkey, SUM(sq) AS tq, COUNT(*) AS ns FROM pq GROUP BY l_partkey)
         |SELECT s.s_suppkey, s.s_name FROM supplier s
         |WHERE s.s_suppkey IN (
         |  SELECT pq.l_suppkey FROM pq JOIN pt ON pq.l_partkey = pt.l_partkey
         |  WHERE pq.sq * pt.ns > 3 * pt.tq
         |    AND pq.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'))
         |ORDER BY s.s_suppkey""".stripMargin) {
      (s, dir) =>
        // r13 (guide §2.4 — the r15 trick): hash lineitem by l_partkey ONCE;
        // that partitioning satisfies the (l_partkey, l_suppkey) grouping
        // (subset key), the l_partkey re-aggregation, AND the pq⋈pt join —
        // 3 exchanges → 1 on the fact path (plans/r13/r16_*_after.txt).
        // r13: (a) the red-part restriction commutes with the per-part
        // aggregates (a part's own rows are untouched by filtering on the
        // part KEY), so semi-filter lineitem ONCE before the rollup — the
        // optimizer was pushing the semi into only the pq branch, leaving
        // pt to aggregate the full table; (b) the r15 exchange-sharing
        // trick: hash the surviving rows by l_partkey once — the
        // (l_partkey, l_suppkey) rollup, the per-part re-rollup AND the
        // pq⋈pt join all ride that one exchange (4 exchanges → 1 on the
        // fact path, plans/r13/r16_*_after.txt).
        val redParts = Tables.table(s, dir, "part")
          .filter(col("p_name").like("red%")).select(col("p_partkey"))
        val pq = Tables.table(s, dir, "lineitem")
          .join(broadcast(redParts), col("l_partkey") === col("p_partkey"), "left_semi")
          .select(col("l_partkey"), col("l_suppkey"), cents(col("l_quantity")).as("qc"))
          .repartition(col("l_partkey"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("qc")).as("sq"))
        val pt = pq.groupBy(col("l_partkey"))
          .agg(sum(col("sq")).as("tq"), count(lit(1)).as("ns"))
        val dominant = pq.join(pt, "l_partkey")
          // decimal(38,0) multiplies: DuckDB promotes the oracle's products
          // to 128-bit, so 64-bit wrap-around here would silently diverge.
          .filter(col("sq").cast("decimal(38,0)") * col("ns") >
            lit(3) * col("tq").cast("decimal(38,0)"))
          .select(col("l_suppkey"))
        Tables.table(s, dir, "supplier")
          .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_suppkey"), col("s_name"))
          .orderBy(col("s_suppkey"))
    },

    // TPC-H Q11 shape: high-value (supplier-nation, part) revenue groups
    // HAVING value above a GLOBAL aggregate scalar — here 4× the average
    // group value (scale-invariant; Q11's 0.0001 fraction is spec'd as
    // 0.0001/SF for the same reason). The global (total, count) is one
    // further re-agg of the grouped frame, broadcast back as a single-row
    // cross join; the compare is exact integer cents × counts.
    DeclaredQuery("r17_national_value_parts",
      s"""WITH v AS (SELECT s.s_nationkey AS nk, l.l_partkey AS pk,
         |                  SUM(${centsS("l.l_extendedprice*(1-l.l_discount)")}) AS val
         |           FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |           GROUP BY s.s_nationkey, l.l_partkey),
         |g AS (SELECT SUM(val) AS tot, COUNT(*) AS ng FROM v)
         |SELECT n.n_name, v.pk AS p_partkey, CAST(v.val AS DOUBLE)/100.0 AS value
         |FROM v JOIN nation n ON v.nk = n.n_nationkey, g
         |WHERE v.val * g.ng > 4 * g.tot
         |ORDER BY v.val DESC, n.n_name, v.pk""".stripMargin) {
      (s, dir) =>
        val sup = Tables.table(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
        // r13 (guide §3.3/§5): `g` re-ran the whole lineitem join+agg
        // subtree inside its broadcast build — materialize the grouped
        // frame once (≤ nations × parts rows) and derive the global scalar
        // from the checkpointed rows (2 lineitem passes → 1).
        val v = Tables.table(s, dir, "lineitem")
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey"), col("l_partkey"))
          .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("val"))
          .snap()
        val g = v.agg(sum(col("val")).as("tot"), count(lit(1)).as("ng"))
        val nat = Tables.table(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))
        v.crossJoin(broadcast(g))
          // decimal(38,0) multiplies: DuckDB promotes the oracle's products
          // to 128-bit, so 64-bit wrap-around here would silently diverge.
          .filter(col("val").cast("decimal(38,0)") * col("ng") >
            lit(4) * col("tot").cast("decimal(38,0)"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .select(col("n_name"), col("l_partkey").as("p_partkey"), col("val"),
            (col("val").cast("double") / lit(100.0)).as("value"))
          // order on the exact integer cents (the oracle's v.val DESC):
          // beyond 2^53 two distinct longs can collapse to one double.
          .orderBy(col("val").desc, col("n_name"), col("p_partkey"))
          .drop("val")
    },

    // TPC-H Q22 shape: rich-but-dormant customers — balance above the
    // average POSITIVE balance (exact integer cross-multiply, no float
    // division near the boundary) with no order since 1999. The correlated
    // NOT EXISTS decorrelates to a LEFT ANTI hash join with the date filter
    // pushed below it; the global (count, sum) scalar broadcasts as a
    // single-row cross join.
    DeclaredQuery("r18_dormant_rich_customers",
      s"""WITH pos AS (SELECT COUNT(*) AS n, SUM(${centsS("c_acctbal")}) AS s
         |             FROM customer WHERE ${centsS("c_acctbal")} > 0)
         |SELECT c.c_mktsegment, COUNT(*) AS numcust,
         |       ${msumS("c.c_acctbal")} AS totacctbal
         |FROM customer c, pos
         |WHERE ${centsS("c.c_acctbal")} * pos.n > pos.s
         |  AND NOT EXISTS (SELECT 1 FROM orders o
         |                  WHERE o.o_custkey = c.c_custkey
         |                    AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
         |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin) {
      (s, dir) =>
        val cust = Tables.table(s, dir, "customer")
          .withColumn("bal_cents", cents(col("c_acctbal")))
        val pos = cust.filter(col("bal_cents") > 0)
          .agg(count(lit(1)).as("n"), sum(col("bal_cents")).as("s"))
        val recent = Tables.table(s, dir, "orders")
          .filter(col("o_orderdate") >= expr("TIMESTAMP '1999-01-01 00:00:00'"))
          .select(col("o_custkey"))
        cust.crossJoin(broadcast(pos))
          // decimal(38,0) multiply — see r16; exact vs DuckDB's 128-bit.
          .filter(col("bal_cents").cast("decimal(38,0)") * col("n") > col("s"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("numcust"), msum(col("c_acctbal")).as("totacctbal"))
          .orderBy(col("c_mktsegment"))
    },

    // TPC-H Q2 shape: cheapest EUROPEAN supplier per blue part — the
    // correlated scalar-min subquery, decorrelated into a groupBy argmin +
    // self-equi-join on (part, min). Per-unit cost is exact integer cents
    // (one IEEE divide+multiply, bit-identical cross-engine), so the argmin
    // tie-set is exact. The part filter pushes BELOW the big aggregation
    // (semi-join on the slim blue-part keys); supplier×nation×region is a
    // broadcast dim. Shuffles: one, on (l_partkey, l_suppkey) — the
    // per-part min reuses it via AQE partial aggregation.
    DeclaredQuery("r19_cheapest_eu_supplier",
      """WITH eu AS (SELECT s_suppkey, s_name, n_name
        |            FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |                            JOIN region r ON n.n_regionkey = r.r_regionkey
        |            WHERE r.r_name = 'EUROPE'),
        |blue AS (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%'),
        |c AS (SELECT l.l_partkey, l.l_suppkey,
        |             MIN(CAST(FLOOR(l.l_extendedprice/l.l_quantity*100 + 0.5) AS BIGINT)) AS cost
        |      FROM lineitem l JOIN eu ON l.l_suppkey = eu.s_suppkey
        |                      JOIN blue ON l.l_partkey = blue.p_partkey
        |      GROUP BY l.l_partkey, l.l_suppkey),
        |m AS (SELECT l_partkey, MIN(cost) AS mc FROM c GROUP BY l_partkey)
        |SELECT c.l_partkey AS p_partkey, eu.s_name, eu.n_name,
        |       CAST(c.cost AS DOUBLE)/100.0 AS unit_cost
        |FROM c JOIN m ON c.l_partkey = m.l_partkey AND c.cost = m.mc
        |       JOIN eu ON c.l_suppkey = eu.s_suppkey
        |ORDER BY c.cost, c.l_partkey, eu.s_name""".stripMargin) {
      (s, dir) =>
        val nat = Tables.table(s, dir, "nation")
        val reg = Tables.table(s, dir, "region").filter(col("r_name") === "EUROPE")
        val eu = Tables.table(s, dir, "supplier")
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
        val blue = Tables.table(s, dir, "part")
          .filter(col("p_name").like("blue%")).select(col("p_partkey"))
        val c = Tables.table(s, dir, "lineitem")
          .join(broadcast(eu.select(col("s_suppkey"))),
            col("l_suppkey") === col("s_suppkey"), "left_semi")
          .join(broadcast(blue), col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(floor(col("l_extendedprice") / col("l_quantity") * lit(100) + lit(0.5))
            .cast("long")).as("cost"))
        val m = c.groupBy(col("l_partkey")).agg(min(col("cost")).as("mc"))
          .withColumnRenamed("l_partkey", "m_partkey")
        c.join(m, col("l_partkey") === col("m_partkey") && col("cost") === col("mc"))
          .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
          .select(col("l_partkey").as("p_partkey"), col("s_name"), col("n_name"),
            col("cost"), (col("cost").cast("double") / lit(100.0)).as("unit_cost"))
          .orderBy(col("cost"), col("p_partkey"), col("s_name"))
          .drop("cost")
    },

    // TPC-H Q15 shape: the top-revenue supplier(s) of a quarter — a global
    // argmax over an aggregated frame. The max is ONE further re-agg of the
    // revenue frame broadcast back as a single-row cross join (never a
    // rank-1 window over an unpartitioned total order); ties are exact
    // because revenue is compared in integer cents. Spec's view+subquery
    // decorrelates to exactly this shape.
    DeclaredQuery("r20_top_quarter_supplier",
      s"""WITH rev AS (SELECT l_suppkey, SUM(${centsS("l_extendedprice*(1-l_discount)")}) AS r
         |             FROM lineitem
         |             WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
         |               AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
         |             GROUP BY l_suppkey),
         |mx AS (SELECT MAX(r) AS m FROM rev)
         |SELECT s.s_suppkey, s.s_name, CAST(rev.r AS DOUBLE)/100.0 AS total_rev
         |FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey, mx
         |WHERE rev.r = mx.m
         |ORDER BY s.s_suppkey""".stripMargin) {
      (s, dir) =>
        val rev = Tables.table(s, dir, "lineitem")
          .filter(col("l_shipdate") >= expr("TIMESTAMP '1998-01-01 00:00:00'") &&
            col("l_shipdate") < expr("TIMESTAMP '1998-04-01 00:00:00'"))
          .groupBy(col("l_suppkey"))
          .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("r"))
          // r13: materialize the ≤|suppliers|-row frame once — the max
          // scalar's broadcast build re-ran the whole filtered lineitem
          // aggregation (the r17 pattern; 2 fact passes → 1)
          .snap()
        val mx = rev.agg(max(col("r")).as("m"))
        rev.crossJoin(broadcast(mx))
          .filter(col("r") === col("m"))
          .join(broadcast(Tables.table(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            (col("r").cast("double") / lit(100.0)).as("total_rev"))
          .orderBy(col("s_suppkey"))
    },

    // TPC-H Q11 shape: parts whose discounted revenue from region-2
    // suppliers exceeds 0.1% of that supply base's GLOBAL total. The global
    // scalar is one re-agg of the per-part frame broadcast back (single-row
    // cross join); the fraction test cross-multiplies in decimal(38,0)
    // (DuckDB promotes to 128-bit — 64-bit cents×1000 would wrap silently
    // at extreme SF). Supplier reduction reaches lineitem as a broadcast
    // semi join below the aggregation. Ordering on the exact integer cents.
    DeclaredQuery("r21_important_parts",
      s"""WITH val AS (SELECT l_partkey, SUM(${centsS("l_extendedprice*(1-l_discount)")}) AS v
         |             FROM lineitem
         |             WHERE l_suppkey IN (SELECT s_suppkey FROM supplier s
         |                                 JOIN nation n ON s.s_nationkey = n.n_nationkey
         |                                 WHERE n.n_regionkey = 2)
         |             GROUP BY l_partkey),
         |tot AS (SELECT SUM(v) AS t FROM val)
         |SELECT val.l_partkey AS p_partkey, CAST(val.v AS DOUBLE)/100.0 AS part_value
         |FROM val, tot
         |WHERE val.v * 1000 > tot.t
         |ORDER BY val.v DESC, val.l_partkey""".stripMargin) {
      (s, dir) =>
        // r13: materialize the ≤|parts|-row frame once — the total
        // scalar's broadcast build re-ran the semi-joined lineitem
        // aggregation (the r17 pattern; 2 fact passes → 1). The BUILD
        // frame is exposed (r21ValFBuild) so the plan guard pins its
        // broadcast-LeftSemi-into-lineitem shape (round-13 ADVICE).
        val valF = r21ValFBuild(s, dir).snap()
        val tot = valF.agg(sum(col("v")).as("t"))
        valF.crossJoin(broadcast(tot))
          .filter(col("v").cast("decimal(38,0)") * lit(1000) >
            col("t").cast("decimal(38,0)"))
          .select(col("l_partkey").as("p_partkey"), col("v"),
            (col("v").cast("double") / lit(100.0)).as("part_value"))
          .orderBy(col("v").desc, col("p_partkey"))
          .drop("v")
    },

    // TPC-H Q7 shape: bilateral trade volume between two nations by ship
    // year. Both nation maps broadcast DOWN to the fact tables first —
    // lineitem shrinks to the two supplier nations (~2/25) and orders to the
    // two customer nations BEFORE the only big join (l⋈o on orderkey), so
    // the shuffle carries the reduced sides and AQE can pick a broadcast for
    // the smaller one at low SF. Revenue is exact integer cents.
    DeclaredQuery("r22_nation_trade",
      s"""WITH sn AS (SELECT s_suppkey, n_name AS supp_nation FROM supplier s
         |            JOIN nation n ON s.s_nationkey = n.n_nationkey
         |            WHERE n.n_name IN ('NATION_1','NATION_2')),
         |cn AS (SELECT c_custkey, n_name AS cust_nation FROM customer c
         |       JOIN nation n ON c.c_nationkey = n.n_nationkey
         |       WHERE n.n_name IN ('NATION_1','NATION_2'))
         |SELECT sn.supp_nation, cn.cust_nation,
         |       CAST(YEAR(l.l_shipdate) AS BIGINT) AS l_year,
         |       $mrevS AS revenue
         |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |     JOIN sn ON l.l_suppkey = sn.s_suppkey
         |     JOIN cn ON o.o_custkey = cn.c_custkey
         |WHERE sn.supp_nation <> cn.cust_nation
         |GROUP BY sn.supp_nation, cn.cust_nation, CAST(YEAR(l.l_shipdate) AS BIGINT)
         |ORDER BY sn.supp_nation, cn.cust_nation, l_year""".stripMargin) {
      (s, dir) =>
        def natMap(tbl: String, key: String, natKey: String, out: String) =
          Tables.table(s, dir, tbl)
            .join(broadcast(Tables.table(s, dir, "nation")
              .filter(col("n_name").isin("NATION_1", "NATION_2"))),
              col(natKey) === col("n_nationkey"))
            .select(col(key), col("n_name").as(out))
        val sn = natMap("supplier", "s_suppkey", "s_nationkey", "supp_nation")
        val cn = natMap("customer", "c_custkey", "c_nationkey", "cust_nation")
        val l = Tables.table(s, dir, "lineitem")
          .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        val o = Tables.table(s, dir, "orders")
          .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(msum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // TPC-H Q8 shape: NATION_5's market share of ECONOMY-part revenue sold
    // to ASIA customers, per order year. Numerator and denominator are both
    // exact BIGINT cents aggregated in ONE pass (conditional sum — never two
    // scans); the share is a single IEEE division of two exact integers,
    // rounded to 6dp (SURVEY §2.7b rule on derived ratios). Part and
    // customer reductions reach lineitem/orders as broadcast joins.
    DeclaredQuery("r23_market_share",
      s"""WITH ac AS (SELECT c_custkey FROM customer c
         |            JOIN nation n ON c.c_nationkey = n.n_nationkey
         |            JOIN region r ON n.n_regionkey = r.r_regionkey
         |            WHERE r.r_name = 'ASIA'),
         |eco AS (SELECT p_partkey FROM part WHERE p_type LIKE 'ECONOMY%'),
         |base AS (SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
         |                ${centsS("l.l_extendedprice*(1-l.l_discount)")} AS vc,
         |                s.s_nationkey
         |         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |              JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |         WHERE o.o_custkey IN (SELECT c_custkey FROM ac)
         |           AND l.l_partkey IN (SELECT p_partkey FROM eco))
         |SELECT o_year,
         |       ROUND(CAST(SUM(CASE WHEN s_nationkey = 5 THEN vc ELSE 0 END) AS DOUBLE)
         |             / CAST(SUM(vc) AS DOUBLE), 6) AS mkt_share
         |FROM base GROUP BY o_year ORDER BY o_year""".stripMargin) {
      (s, dir) =>
        val ac = Tables.table(s, dir, "customer")
          .join(broadcast(Tables.table(s, dir, "nation")
            .join(broadcast(Tables.table(s, dir, "region").filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"))),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"))
        val eco = Tables.table(s, dir, "part")
          .filter(col("p_type").like("ECONOMY%")).select(col("p_partkey"))
        val supp = Tables.table(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
        val l = Tables.table(s, dir, "lineitem")
          .join(broadcast(eco), col("l_partkey") === col("p_partkey"), "left_semi")
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        val o = Tables.table(s, dir, "orders")
          .join(broadcast(ac), col("o_custkey") === col("c_custkey"), "left_semi")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .select(year(col("o_orderdate")).cast("long").as("o_year"),
            cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("vc"),
            col("s_nationkey"))
          .groupBy(col("o_year"))
          .agg(round(
            sum(when(col("s_nationkey") === 5, col("vc")).otherwise(lit(0L))).cast("double")
              / sum(col("vc")).cast("double"), 6).as("mkt_share"))
          .orderBy(col("o_year"))
    },

    // TPC-H Q9 shape: profit by supplier nation and ship year for one part
    // family. Profit = revenue cents − cost cents where unit cost is a
    // deterministic 10% of retail price — both sides pass through cents()
    // BEFORE subtraction so the sum is exact in any aggregation order.
    // p_retailprice rides the (broadcast) part join; nation resolves AFTER
    // the aggregation on the tiny (nation × year) frame.
    DeclaredQuery("r24_profit_rollup",
      s"""SELECT n.n_name AS nation, CAST(YEAR(l.l_shipdate) AS BIGINT) AS o_year,
         |       CAST(SUM(${centsS("l.l_extendedprice*(1-l.l_discount)")}
         |                - ${centsS("p.p_retailprice*l.l_quantity*0.1")}) AS DOUBLE)/100.0
         |         AS profit
         |FROM lineitem l
         |     JOIN part p ON l.l_partkey = p.p_partkey
         |     JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |     JOIN nation n ON s.s_nationkey = n.n_nationkey
         |WHERE p.p_name LIKE '%widget'
         |GROUP BY n.n_name, CAST(YEAR(l.l_shipdate) AS BIGINT)
         |ORDER BY nation, o_year""".stripMargin) {
      (s, dir) =>
        val p = Tables.table(s, dir, "part")
          .filter(col("p_name").like("%widget"))
          .select(col("p_partkey"), col("p_retailprice"))
        val supp = Tables.table(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
        val nat = Tables.table(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
        Tables.table(s, dir, "lineitem")
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey"), year(col("l_shipdate")).cast("long").as("o_year"))
          .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
            - cents(col("p_retailprice") * col("l_quantity") * lit(0.1))).as("pc"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .select(col("n_name").as("nation"), col("o_year"),
            (col("pc").cast("double") / lit(100.0)).as("profit"))
          .orderBy(col("nation"), col("o_year"))
    },

    // TPC-H Q4 shape: order-priority counts for a quarter, restricted to
    // orders with at least one LATE line (shipped >60 days after order
    // date) — the EXISTS decorrelates to a left-semi join whose range
    // condition rides the orderkey equi-join. Complements r15 (Q21 anti
    // shape on the same predicate family).
    DeclaredQuery("r25_late_priority_counts",
      """SELECT o.o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin) {
      (s, dir) =>
        val o = Tables.table(s, dir, "orders")
          .filter(col("o_orderdate") >= expr("TIMESTAMP '1997-01-01 00:00:00'") &&
            col("o_orderdate") < expr("TIMESTAMP '1997-04-01 00:00:00'"))
        val l = Tables.table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate"))
        o.join(l,
            o("o_orderkey") === l("l_orderkey") &&
              l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAY"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
    },

    // TPC-H Q13 shape: distribution of per-customer order counts (customers
    // with no qualifying orders count as 0). Orders aggregate FIRST on
    // their own key (600k→15k before any join); the customer frame then
    // left-joins the counts — never a fan-out join then count-distinct.
    DeclaredQuery("r26_cust_order_histogram",
      """WITH co AS (SELECT c.c_custkey, COUNT(o.o_custkey) AS c_count
        |            FROM customer c LEFT JOIN
        |                 (SELECT o_custkey FROM orders
        |                  WHERE o_orderpriority <> '5-LOW') o
        |            ON c.c_custkey = o.o_custkey
        |            GROUP BY c.c_custkey)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM co GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin) {
      (s, dir) =>
        val perCust = Tables.table(s, dir, "orders")
          .filter(col("o_orderpriority") =!= "5-LOW")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"))
        Tables.table(s, dir, "customer")
          .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
          .select(coalesce(col("n"), lit(0L)).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // TPC-H Q19 shape: revenue under a DISJUNCTION of brand/size/quantity
    // predicate blocks. The whole OR lives in one join filter over the
    // (broadcast) part join — Catalyst extracts the common l_quantity
    // bounds; no per-branch scan or union.
    DeclaredQuery("r27_disjunctive_revenue",
      s"""SELECT $mrevS AS revenue, COUNT(*) AS n
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
         |       AND l.l_quantity BETWEEN 1 AND 20)
         |   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
         |       AND l.l_quantity BETWEEN 10 AND 30)
         |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
         |       AND l.l_quantity BETWEEN 20 AND 40)""".stripMargin) {
      (s, dir) =>
        val p = Tables.table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_size"))
        def blk(brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =
          col("p_brand") === brand &&
            col("p_size").between(szLo, szHi) &&
            col("l_quantity").between(qLo, qHi)
        Tables.table(s, dir, "lineitem")
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .filter(blk("Brand#1", 1, 15, 1, 20) ||
            blk("Brand#2", 1, 25, 10, 30) ||
            blk("Brand#3", 1, 35, 20, 40))
          .agg(msum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n"))
    },

    // TPC-H Q20 shape: suppliers holding an outsized share (>30%) of some
    // blue part's 1997 shipped quantity — nested aggregation + share test.
    // Quantity sums are exact integer centi-units; the share test
    // cross-multiplies in decimal(38,0) like r21 (DuckDB HUGEINT parity).
    // DISTINCT is over the already-tiny qualifying (supplier) set.
    DeclaredQuery("r28_excess_share_suppliers",
      s"""WITH q AS (SELECT l_partkey, l_suppkey, SUM(${centsS("l_quantity")}) AS qc
         |           FROM lineitem
         |           WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |             AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
         |             AND l_partkey IN (SELECT p_partkey FROM part
         |                               WHERE p_name LIKE 'blue%')
         |           GROUP BY l_partkey, l_suppkey),
         |t AS (SELECT l_partkey, SUM(qc) AS tc FROM q GROUP BY l_partkey)
         |SELECT DISTINCT s.s_suppkey, s.s_name
         |FROM q JOIN t ON q.l_partkey = t.l_partkey
         |       JOIN supplier s ON q.l_suppkey = s.s_suppkey
         |WHERE q.qc * 10 > t.tc * 3
         |ORDER BY s.s_suppkey""".stripMargin) {
      (s, dir) =>
        val blue = Tables.table(s, dir, "part")
          .filter(col("p_name").like("blue%")).select(col("p_partkey"))
        val q = Tables.table(s, dir, "lineitem")
          .filter(col("l_shipdate") >= expr("TIMESTAMP '1997-01-01 00:00:00'") &&
            col("l_shipdate") < expr("TIMESTAMP '1998-01-01 00:00:00'"))
          .join(broadcast(blue), col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(cents(col("l_quantity"))).as("qc"))
        val t = q.groupBy(col("l_partkey")).agg(sum(col("qc")).as("tc"))
          .withColumnRenamed("l_partkey", "t_partkey")
        q.join(t, col("l_partkey") === col("t_partkey"))
          .filter(col("qc").cast("decimal(38,0)") * lit(10) >
            col("tc").cast("decimal(38,0)") * lit(3))
          .select(col("l_suppkey")).distinct()
          .join(broadcast(Tables.table(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"))
          .orderBy(col("s_suppkey"))
    },

    // TPC-H Q18 shape: bulk orders — orders whose total line quantity tops
    // a threshold, with the customer resolved. The HAVING aggregate runs on
    // lineitem ALONE keyed by orderkey (600k→150k before any join); orders
    // and customer attach to the already-tiny qualifying set. Quantity sums
    // are exact integer centi-units.
    DeclaredQuery("r29_bulk_orders",
      s"""WITH q AS (SELECT l_orderkey, SUM(${centsS("l_quantity")}) AS qc
         |           FROM lineitem GROUP BY l_orderkey
         |           HAVING SUM(${centsS("l_quantity")}) > 21000)
         |SELECT c.c_custkey, c.c_name, o.o_orderkey,
         |       CAST(o.o_orderdate AS DATE) AS o_orderdate,
         |       CAST(q.qc AS DOUBLE)/100.0 AS total_qty
         |FROM q JOIN orders o ON q.l_orderkey = o.o_orderkey
         |       JOIN customer c ON o.o_custkey = c.c_custkey
         |ORDER BY q.qc DESC, o.o_orderkey LIMIT 20""".stripMargin) {
      (s, dir) =>
        val q = Tables.table(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(cents(col("l_quantity"))).as("qc"))
          .filter(col("qc") > 21000)
        q.join(Tables.table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_orderdate").cast("date").as("o_orderdate"),
            col("qc"), (col("qc").cast("double") / lit(100.0)).as("total_qty"))
          .orderBy(col("qc").desc, col("o_orderkey"))
          .limit(20)
          .drop("qc")
    },

    // TPC-H Q10 shape: returned-item reporting — customers ranked by the
    // revenue they returned in a quarter, with their nation. Lineitem
    // reduces FIRST (returnflag + the quarter's orders via the orderkey
    // join), revenue pre-aggregates per order BEFORE the customer join —
    // r2's partial-aggregation pushdown on the filtered slice.
    DeclaredQuery("r31_returned_revenue",
      s"""SELECT c.c_custkey, c.c_name, n.n_name, $mrevS AS revenue
         |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
         |     JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |     JOIN nation n ON c.c_nationkey = n.n_nationkey
         |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
         |  AND l.l_returnflag = 'R'
         |GROUP BY c.c_custkey, c.c_name, n.n_name
         |ORDER BY $mrevS DESC, c.c_custkey LIMIT 20""".stripMargin) {
      (s, dir) =>
        val o = Tables.table(s, dir, "orders")
          .filter(col("o_orderdate") >= expr("TIMESTAMP '1997-01-01 00:00:00'") &&
            col("o_orderdate") < expr("TIMESTAMP '1997-04-01 00:00:00'"))
          .select(col("o_orderkey"), col("o_custkey"))
        val perOrder = Tables.table(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rc"))
        perOrder
          .join(Tables.table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.table(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_name"), col("n_name"),
            col("rc"), (col("rc").cast("double") / lit(100.0)).as("revenue"))
          .orderBy(col("rc").desc, col("c_custkey"))
          .limit(20)
          .drop("rc")
    },

    // TPC-H Q16 shape: supplier variety per (brand, size band) for parts
    // NOT touched by any sub-par supplier (negative account balance) — the
    // NOT IN decorrelates to an ANTI join on the part key (plan-guarded);
    // distinct-supplier counting happens AFTER the anti reduction.
    DeclaredQuery("r32_supplier_variety",
      """WITH bad AS (SELECT DISTINCT l.l_partkey FROM lineitem l
        |             JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |             WHERE s.s_acctbal < 0),
        |ok AS (SELECT p_partkey, p_brand, CAST(p_size // 10 AS BIGINT) AS size_band
        |       FROM part WHERE p_partkey NOT IN (SELECT l_partkey FROM bad))
        |SELECT ok.p_brand, ok.size_band,
        |       COUNT(DISTINCT l.l_suppkey) AS n_suppliers, COUNT(*) AS n_lines
        |FROM lineitem l JOIN ok ON l.l_partkey = ok.p_partkey
        |GROUP BY ok.p_brand, ok.size_band
        |ORDER BY n_suppliers DESC, ok.p_brand, ok.size_band LIMIT 25""".stripMargin) {
      (s, dir) =>
        val bad = Tables.table(s, dir, "lineitem")
          .join(broadcast(Tables.table(s, dir, "supplier")
            .filter(col("s_acctbal") < 0).select(col("s_suppkey"))),
            col("l_suppkey") === col("s_suppkey"), "left_semi")
          .select(col("l_partkey")).distinct()
        val ok = Tables.table(s, dir, "part")
          .join(bad, col("p_partkey") === col("l_partkey"), "left_anti")
          .select(col("p_partkey"), col("p_brand"),
            expr("p_size DIV 10").cast("long").as("size_band"))
        Tables.table(s, dir, "lineitem")
          .join(broadcast(ok), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("size_band"))
          .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("n_suppliers").desc, col("p_brand"), col("size_band"))
          .limit(25)
    },

    // TPC-H Q6 shape: forecast revenue change — one tight scan-level filter
    // (year × discount band × quantity cap) into a single global aggregate;
    // the query IS the predicate-pushdown test at 100 TB (plan-guarded:
    // every filter reaches PushedFilters).
    DeclaredQuery("r33_forecast_revenue",
      s"""SELECT ${msumS("l_extendedprice*l_discount")} AS revenue_delta,
         |       COUNT(*) AS n
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin) {
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .filter(col("l_shipdate") >= expr("TIMESTAMP '1997-01-01 00:00:00'") &&
            col("l_shipdate") < expr("TIMESTAMP '1998-01-01 00:00:00'") &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24)
          .agg(msum(col("l_extendedprice") * col("l_discount")).as("revenue_delta"),
            count(lit(1)).as("n"))
    },

    // HyperLogLog++ distinct-count SKETCH per group — the mergeable
    // bounded-memory companion to r6's exact distinct aggregation, and the
    // only distinct count that runs in one pass over 100 TB (the exact
    // rewrite needs a second shuffle keyed by the counted column). NO
    // oracle (estimator-dependent); OperatorsTest bounds the relative error
    // per group against the exact counts at the declared precision.
    DeclaredQuery.noOracle("r34_approx_distinct") {
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_rows"),
            approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
            approx_count_distinct(col("l_suppkey"), 0.02).as("approx_supps"))
          .orderBy(col("l_returnflag"))
    },

    // Mergeable one-pass quantile SKETCH (Greenwald–Khanna summaries —
    // Spark's approx_percentile) — the 100 TB complement to r10's exact
    // percentile_cont: exact quantiles need a full sort per group; the
    // sketch is a bounded-memory map-side structure merged associatively
    // across partitions (the same shape a 1000-executor scan needs).
    // Sketch answers are approximation-dependent, so NO DuckDB oracle —
    // OperatorsTest proves each reported value's exact RANK is within the
    // documented 1/accuracy error of its target quantile.
    DeclaredQuery.noOracle("r30_quantile_sketch") {
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            expr(s"approx_percentile(${"CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)"}, array(0.5, 0.9, 0.99), 10000)")
              .as("qs"))
          .select(col("l_returnflag"), col("n"),
            col("qs").getItem(0).as("p50_cents"),
            col("qs").getItem(1).as("p90_cents"),
            col("qs").getItem(2).as("p99_cents"))
          .orderBy(col("l_returnflag"))
    }
  )
}
