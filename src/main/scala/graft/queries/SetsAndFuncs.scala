package graft.queries

import org.apache.spark.sql.functions._

import graft.{DeclaredQuery, Tables}
import graft.Fns._

/** Semi/anti/outer joins, set operators, scalar functions (SURVEY §2.4):
  * s1–s4 exercise Catalyst's subquery decorrelation targets directly
  * (left_semi / left_anti / full_outer / EXCEPT-INTERSECT rewrites);
  * f1–f4 cover the string/date/math/conditional scalar surface.
  */
object SetsAndFuncs {

  val queries: Seq[DeclaredQuery] = Seq(

    DeclaredQuery("s1_cust_with_orders",
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey=c.c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) {
      (s, dir) =>
        val c = Tables.table(s, dir, "customer")
        val o = Tables.table(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("c_mktsegment"))
    },

    DeclaredQuery("s2_cust_without_orders",
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey=c.c_custkey)
        |ORDER BY c_custkey""".stripMargin) {
      (s, dir) =>
        val c = Tables.table(s, dir, "customer")
        val o = Tables.table(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"))
          .orderBy(col("c_custkey"))
    },

    DeclaredQuery("s3_set_ops",
      """SELECT 'except' AS op, COUNT(*) AS n
        |  FROM (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders) t1
        |UNION ALL SELECT 'intersect', COUNT(*)
        |  FROM (SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders) t2
        |UNION ALL SELECT 'union', COUNT(*)
        |  FROM (SELECT c_custkey FROM customer UNION SELECT o_custkey FROM orders) t3
        |ORDER BY op""".stripMargin) {
      (s, dir) =>
        val c = Tables.table(s, dir, "customer").select(col("c_custkey"))
        val o = Tables.table(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
        def one(op: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
        one("except", c.except(o))
          .unionAll(one("intersect", c.intersect(o)))
          .unionAll(one("union", c.union(o).distinct()))
          .orderBy(col("op"))
    },

    DeclaredQuery("s4_outer_join_nations",
      """SELECT n.n_nationkey, n.n_name, COUNT(s.s_suppkey) AS n_supp
        |FROM nation n FULL OUTER JOIN supplier s ON s.s_nationkey=n.n_nationkey
        |GROUP BY n.n_nationkey, n.n_name
        |ORDER BY n.n_nationkey NULLS LAST, n.n_name NULLS LAST""".stripMargin) {
      (s, dir) =>
        val n = Tables.table(s, dir, "nation")
        val su = Tables.table(s, dir, "supplier")
        n.join(su, su("s_nationkey") === n("n_nationkey"), "full_outer")
          .groupBy(n("n_nationkey"), n("n_name"))
          .agg(count(su("s_suppkey")).as("n_supp"))
          .orderBy(col("n_nationkey").asc_nulls_last, col("n_name").asc_nulls_last)
    },

    // Bag-semantics set operations — the ALL variants s3 deliberately skips
    // (multiplicity-preserving EXCEPT ALL / INTERSECT ALL lower to
    // count-balancing hash aggregations, not the distinct-hash of s3).
    // Input bags: customer nation keys vs supplier nation keys.
    DeclaredQuery("s6_set_ops_all",
      """SELECT 'except_all' AS op, COUNT(*) AS n
        |  FROM (SELECT c_nationkey FROM customer
        |        EXCEPT ALL SELECT s_nationkey FROM supplier) t1
        |UNION ALL SELECT 'intersect_all', COUNT(*)
        |  FROM (SELECT c_nationkey FROM customer
        |        INTERSECT ALL SELECT s_nationkey FROM supplier) t2
        |UNION ALL SELECT 'union_all', COUNT(*)
        |  FROM (SELECT c_nationkey FROM customer
        |        UNION ALL SELECT s_nationkey FROM supplier) t3
        |ORDER BY op""".stripMargin) {
      (s, dir) =>
        val c = Tables.table(s, dir, "customer").select(col("c_nationkey"))
        val su = Tables.table(s, dir, "supplier").select(col("s_nationkey").as("c_nationkey"))
        def one(op: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
        one("except_all", c.exceptAll(su))
          .unionAll(one("intersect_all", c.intersectAll(su)))
          .unionAll(one("union_all", c.unionAll(su)))
          .orderBy(col("op"))
    },

    DeclaredQuery("f1_part_name_stats",
      """SELECT regexp_extract(p_name, '^[a-z]+') AS first_word, COUNT(*) AS n,
        |       MIN(CONCAT(UPPER(p_brand), '|', TRIM(p_type))) AS min_tag,
        |       CAST(MAX(LENGTH(p_name)) AS BIGINT) AS max_len
        |FROM part GROUP BY regexp_extract(p_name, '^[a-z]+') ORDER BY first_word""".stripMargin) {
      (s, dir) =>
        Tables.table(s, dir, "part")
          .groupBy(regexp_extract(col("p_name"), "^[a-z]+", 0).as("first_word"))
          .agg(
            count(lit(1)).as("n"),
            min(concat(upper(col("p_brand")), lit("|"), trim(col("p_type")))).as("min_tag"),
            max(length(col("p_name"))).cast("long").as("max_len"))
          .orderBy(col("first_word"))
    },

    // Relational DIVISION (universal quantification): customers who bought
    // from ALL of NATION_3's suppliers. Decorrelates to count-matching —
    // distinct-supplier count per customer over the semi-joined fact equals
    // the (single-row, broadcast) divisor cardinality. No per-element
    // loop, no double negation.
    DeclaredQuery("s7_division",
      """WITH s3 AS (SELECT s_suppkey FROM supplier s
        |            JOIN nation n ON s.s_nationkey = n.n_nationkey
        |            WHERE n.n_name = 'NATION_3'),
        |tot AS (SELECT COUNT(*) AS c FROM s3),
        |cs AS (SELECT o.o_custkey, COUNT(DISTINCT l.l_suppkey) AS k
        |       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |       WHERE l.l_suppkey IN (SELECT s_suppkey FROM s3)
        |       GROUP BY o.o_custkey)
        |SELECT c.c_custkey, c.c_name
        |FROM cs JOIN customer c ON cs.o_custkey = c.c_custkey, tot
        |WHERE cs.k = tot.c ORDER BY c.c_custkey""".stripMargin) {
      (s, dir) =>
        val s3 = Tables.table(s, dir, "supplier")
          .join(broadcast(Tables.table(s, dir, "nation")
            .filter(col("n_name") === "NATION_3").select(col("n_nationkey"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"))
        val tot = s3.agg(count(lit(1)).as("c"))
        val cs = Tables.table(s, dir, "lineitem")
          .join(broadcast(s3), Seq("s_suppkey").map(_ => col("l_suppkey") === col("s_suppkey")).head, "left_semi")
          .join(Tables.table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(countDistinct(col("l_suppkey")).as("k"))
        cs.crossJoin(broadcast(tot))
          .filter(col("k") === col("c"))
          .join(Tables.table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
    },

    // Scalar string-function breadth in one pass: translate / lpad / rpad /
    // reverse / repeat / instr / substring / concat_ws — each portable
    // across engines (asserted by the oracle hash). Top-50 parts by key so
    // the output is bounded and totally ordered.
    DeclaredQuery("f8_string_kitchen",
      """SELECT p_partkey,
        |       TRANSLATE(p_name, 'aeiou', 'AEIOU') AS tx,
        |       LPAD(p_brand, 12, '.') AS lp,
        |       RPAD(SUBSTRING(p_type, 1, 6), 10, '_') AS rp,
        |       REVERSE(p_name) AS rev,
        |       REPEAT('ab', CAST(p_size % 3 AS INT) + 1) AS rep,
        |       CAST(INSTR(p_name, ' ') AS BIGINT) AS sp_at,
        |       CONCAT_WS('|', p_brand, p_type) AS cw
        |FROM part WHERE p_partkey <= 50 ORDER BY p_partkey""".stripMargin) {
      (s, dir) =>
        Tables.table(s, dir, "part")
          .filter(col("p_partkey") <= 50)
          .select(col("p_partkey"),
            translate(col("p_name"), "aeiou", "AEIOU").as("tx"),
            lpad(col("p_brand"), 12, ".").as("lp"),
            rpad(substring(col("p_type"), 1, 6), 10, "_").as("rp"),
            reverse(col("p_name")).as("rev"),
            repeat(lit("ab"), (col("p_size") % 3).cast("int") + lit(1)).as("rep"),
            instr(col("p_name"), " ").cast("long").as("sp_at"),
            concat_ws("|", col("p_brand"), col("p_type")).as("cw"))
          .orderBy(col("p_partkey"))
    },

    DeclaredQuery("f2_orders_by_month",
      s"""SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
         |       CAST(MIN(YEAR(o_orderdate)) AS BIGINT) AS yr, COUNT(*) AS n,
         |       ${msumS("o_totalprice")} AS total
         |FROM orders GROUP BY CAST(DATE_TRUNC('month', o_orderdate) AS DATE) ORDER BY month""".stripMargin) {
      (s, dir) =>
        Tables.table(s, dir, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
          .agg(
            min(year(col("o_orderdate"))).cast("long").as("yr"),
            count(lit(1)).as("n"),
            msum(col("o_totalprice")).as("total"))
          .orderBy(col("month"))
    },

    DeclaredQuery("f3_math_checksum",
      """SELECT CAST(SUM(CAST(FLOOR(l_extendedprice) AS BIGINT)) AS BIGINT)           AS sum_floor,
        |       CAST(SUM(CAST(CEIL(l_extendedprice*l_discount) AS BIGINT)) AS BIGINT) AS sum_ceil_disc,
        |       ROUND(MAX(SQRT(l_quantity)),6)                                        AS max_sqrt_qty,
        |       ROUND(MIN(LN(l_extendedprice)),6)                                     AS min_ln_price,
        |       ROUND(MAX(POWER(1+l_tax, 2)),6)                                       AS max_pow_tax,
        |       CAST(SUM(CAST(ABS(l_linenumber) AS BIGINT)) AS BIGINT)                AS sum_abs_line
        |FROM lineitem""".stripMargin) {
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .agg(
            sum(floor(col("l_extendedprice")).cast("long")).as("sum_floor"),
            sum(ceil(col("l_extendedprice") * col("l_discount")).cast("long")).as("sum_ceil_disc"),
            round(max(sqrt(col("l_quantity"))), 6).as("max_sqrt_qty"),
            round(min(log(col("l_extendedprice"))), 6).as("min_ln_price"),
            round(max(pow(lit(1) + col("l_tax"), lit(2))), 6).as("max_pow_tax"),
            sum(abs(col("l_linenumber")).cast("long")).as("sum_abs_line"))
    },

    // Statistical aggregates; ROUND(…,4) absorbs the ~1e-9 cross-engine
    // algorithm noise (Welford vs sum-of-squares) per §2.7b rule 5.
    DeclaredQuery("f5_stat_aggs",
      """SELECT l_returnflag,
        |       ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
        |       ROUND(var_samp(l_quantity), 4)    AS var_qty,
        |       ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |       ROUND(covar_samp(l_quantity, l_discount), 4) AS cov_qd,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
            round(var_samp(col("l_quantity")), 4).as("var_qty"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
            round(covar_samp(col("l_quantity"), col("l_discount")), 4).as("cov_qd"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"))
    },

    DeclaredQuery("f4_case_nulls",
      s"""SELECT CASE WHEN s_acctbal < 0 THEN 'neg' WHEN s_acctbal < 5000 THEN 'mid'
         |            ELSE 'high' END AS band,
         |       COUNT(*) AS n,
         |       ${msumS("COALESCE(NULLIF(s_acctbal, 0.0), 0.0)")} AS bal
         |FROM supplier
         |GROUP BY CASE WHEN s_acctbal < 0 THEN 'neg' WHEN s_acctbal < 5000 THEN 'mid'
         |              ELSE 'high' END
         |ORDER BY band""".stripMargin) {
      (s, dir) =>
        val band = when(col("s_acctbal") < 0, "neg")
          .when(col("s_acctbal") < 5000, "mid")
          .otherwise("high")
        Tables.table(s, dir, "supplier")
          .groupBy(band.as("band"))
          .agg(
            count(lit(1)).as("n"),
            msum(coalesce(nullif(col("s_acctbal"), lit(0.0)), lit(0.0))).as("bal"))
          .orderBy(col("band"))
    },

    // Arbitrary GROUPING SETS (beyond r5 rollup / r9 cube): two independent
    // single-column sets plus the grand total, disambiguated by GROUPING().
    // Ordering never compares the NULL placeholder columns within a set
    // (they are constant per set), so NULLS FIRST/LAST divergence between
    // engines cannot bite.
    DeclaredQuery("s5_grouping_sets",
      s"""SELECT CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg,
         |       CAST(GROUPING(c_nationkey) AS BIGINT) AS g_nat,
         |       c_mktsegment, c_nationkey,
         |       COUNT(*) AS n, ${msumS("c_acctbal")} AS sum_bal
         |FROM customer
         |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
         |ORDER BY g_seg, g_nat, c_mktsegment, c_nationkey""".stripMargin) {
      (s, dir) =>
        Tables.table(s, dir, "customer")
          .groupingSets(
            Seq(Seq(col("c_mktsegment")), Seq(col("c_nationkey")), Seq()),
            col("c_mktsegment"), col("c_nationkey"))
          .agg(
            grouping(col("c_mktsegment")).cast("long").as("g_seg"),
            grouping(col("c_nationkey")).cast("long").as("g_nat"),
            count(lit(1)).as("n"),
            msum(col("c_acctbal")).as("sum_bal"))
          .select(col("g_seg"), col("g_nat"), col("c_mktsegment"), col("c_nationkey"),
            col("n"), col("sum_bal"))
          .orderBy(col("g_seg"), col("g_nat"), col("c_mktsegment"), col("c_nationkey"))
    },

    // Regexp scalar functions. The oracle's regexp_replace carries DuckDB's
    // 'g' flag — Spark's replaces all matches by default (dialect text may
    // differ; semantics must match).
    DeclaredQuery("f6_regexp",
      """SELECT regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        |       COUNT(*) AS n,
        |       COUNT(DISTINCT regexp_replace(p_type, '[aeiou]', '', 'g')) AS n_types
        |FROM part GROUP BY regexp_extract(p_name, '^([a-z]+)', 1)
        |ORDER BY first_word""".stripMargin) {
      (s, dir) =>
        Tables.table(s, dir, "part")
          .groupBy(regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"))
          .agg(
            count(lit(1)).as("n"),
            countDistinct(regexp_replace(col("p_type"), "[aeiou]", "")).as("n_types"))
          .orderBy(col("first_word"))
    },

    // Fuzzy string matching (entity-resolution primitive): distinct part
    // names within edit distance 2, enumerated via length-band blocking —
    // an EQUI-join on candidate length buckets, never an all-pairs scan
    // (operators.FuzzyMatch). Both engines' levenshtein is the standard
    // unit-cost edit distance.
    DeclaredQuery("f7_fuzzy_name_match",
      """WITH n AS (SELECT DISTINCT p_name FROM part)
        |SELECT a.p_name AS name1, b.p_name AS name2,
        |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM n a JOIN n b ON a.p_name < b.p_name
        |WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
        |  AND levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY name1, name2""".stripMargin) {
      (s, dir) =>
        graft.operators.FuzzyMatch.levenshteinSelfJoin(
            Tables.table(s, dir, "part"), "p_name", maxDist = 2)
          .orderBy(col("name1"), col("name2"))
    }
  )
}
