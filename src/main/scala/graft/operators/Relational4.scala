package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fourth relational batch: the remaining classic TPC-H query shapes
  * (correlated scalar subqueries, nested aggregation, IN/NOT-IN subqueries,
  * disjunctive predicate bundles), grouping sets, ntile/range-frame
  * windows, band joins, and LIMIT/OFFSET pagination. All declarative —
  * Catalyst picks broadcast vs shuffle joins and rewrites the subqueries
  * to semi/anti joins; every probe has a DuckDB oracle twin.
  */
object Relational4 {

  def defs: Map[String, QueryDef] = Map(
    // ---- TPC-H Q2 shape: correlated scalar subquery (min per group) -----
    // partsupp does not exist in the test schema; lineitem's
    // (l_partkey, l_suppkey) serves as the part↔supplier bridge.
    "q2_min_supplier" -> QueryDef.sql(
      """SELECT p.p_partkey, s.s_suppkey, round(s.s_acctbal, 2) AS bal
        |FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |WHERE p.p_size <= 3
        |  AND s.s_acctbal = (SELECT min(s2.s_acctbal)
        |                     FROM supplier s2 JOIN lineitem l2
        |                       ON l2.l_suppkey = s2.s_suppkey
        |                     WHERE l2.l_partkey = p.p_partkey)
        |GROUP BY 1, 2, 3
        |ORDER BY p_partkey, s_suppkey""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d).select("l_partkey", "l_suppkey").distinct()
      val sup = Tables.supplier(s, d)
      val minBal = li.join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey").as("mb_partkey"))
        .agg(min("s_acctbal").as("min_bal"))
      Tables.part(s, d).filter(col("p_size") <= 3)
        .join(li, col("l_partkey") === col("p_partkey"))
        .join(sup, col("s_suppkey") === col("l_suppkey"))
        .join(minBal, col("mb_partkey") === col("p_partkey") &&
          col("s_acctbal") === col("min_bal"))
        .select(col("p_partkey"), col("s_suppkey"),
          round(col("s_acctbal"), 2).as("bal"))
        .distinct()
        .orderBy("p_partkey", "s_suppkey")
    },

    // ---- TPC-H Q13 shape: left outer join + nested aggregation ----------
    "q13_cust_distribution" -> QueryDef.sql(
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |      GROUP BY c.c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // ---- TPC-H Q14 shape: conditional-aggregate ratio over a join -------
    "q14_promo_share" -> QueryDef.sql(
      """SELECT CAST(100.0 AS DOUBLE)
        |  * CAST(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(round(l_extendedprice * 100, 0) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
        |      ELSE 0 END) AS DOUBLE)
        |  / CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
        |             * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
        |         AS DOUBLE) AS promo_share
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_shipdate >= DATE '1996-01-01'
        |  AND l_shipdate < DATE '1996-04-01'""".stripMargin) { (s, d) =>
      // exact integer-unit revenue on BOTH legs (ExactMoney): the ratio
      // of two exact BIGINT-derived doubles is a bit-identical quotient
      // on every engine — emitted UNROUNDED (round() of even an
      // identical double can split at decimal halves: Spark rounds the
      // shortest-decimal rendering, DuckDB the numeric value)
      val units = ExactMoney.cents(col("l_extendedprice")) *
        (lit(100L) - ExactMoney.pct(col("l_discount")))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
          col("l_shipdate") < lit("1996-04-01").cast("date"))
        .join(Tables.part(s, d), col("p_partkey") === col("l_partkey"))
        .agg((lit(100.0) *
          sum(when(col("p_type") === "PROMO", units).otherwise(0L)).cast("double")
          / sum(units).cast("double")).as("promo_share"))
    },

    // ---- TPC-H Q16 shape: NOT IN subquery + count distinct --------------
    "q16_supplier_cnt" -> QueryDef.sql(
      """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_size <= 10
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type
        |ORDER BY supplier_cnt DESC, p_brand, p_type""".stripMargin) { (s, d) =>
      val excluded = Tables.supplier(s, d)
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_size") <= 10),
          col("p_partkey") === col("l_partkey"))
        .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"))
    },

    // ---- TPC-H Q18 shape: IN (GROUP BY ... HAVING) subquery -------------
    "q18_large_orders" -> QueryDef.sql(
      """SELECT c.c_custkey, o.o_orderkey, round(t.sum_qty, 2) AS sum_qty
        |FROM orders o
        |JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
        |      GROUP BY l_orderkey HAVING sum(l_quantity) > 200) t
        |  ON t.l_orderkey = o.o_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY sum_qty DESC, o_orderkey""".stripMargin) { (s, d) =>
      val big = Tables.lineitem(s, d).groupBy("l_orderkey")
        .agg(sum("l_quantity").as("sum_qty"))
        .filter(col("sum_qty") > 200)
      Tables.orders(s, d)
        .join(big, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("o_orderkey"),
          round(col("sum_qty"), 2).as("sum_qty"))
        .orderBy(col("sum_qty").desc, col("o_orderkey"))
    },

    // ---- TPC-H Q19 shape: disjunctive predicate bundles over a join -----
    // Catalyst extracts the common join key from the OR'd bundles so this
    // stays an equi-join with a residual filter, not a nested loop.
    "q19_disjunctive" -> QueryDef.sql(
      """SELECT
        |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
        |       AS DOUBLE) / CAST(10000.0 AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_type = 'PROMO' AND l_quantity >= 25)""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("p_partkey") === col("l_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("l_quantity").between(10, 20)) ||
          (col("p_type") === "PROMO" && col("l_quantity") >= 25))
        // exact integer-unit revenue (ExactMoney — the q5 boundary class)
        .agg(ExactMoney.asCurrency(
          ExactMoney.revenueUnits(col("l_extendedprice"), col("l_discount")),
          10000.0).as("revenue"))
    },

    // ---- TPC-H Q22 shape: global-avg scalar subquery + NOT EXISTS -------
    "q22_idle_customers" -> QueryDef.sql(
      """SELECT CAST(c_custkey % 7 AS BIGINT) AS bucket,
        |  count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d)
      // scalar subquery as a broadcast single-row join: stays lazy, and a
      // NULL avg (no positive balances) filters to empty exactly like SQL
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg(avg("c_acctbal").as("avg_bal"))
      val bigSpenders = Tables.orders(s, d)
        .filter(col("o_totalprice") > 300000).select("o_custkey")
      cust.join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(bigSpenders, col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy((col("c_custkey") % 7).cast("long").as("bucket"))
        .agg(count(lit(1)).as("numcust"),
          round(sum("c_acctbal"), 2).as("totacctbal"))
        .orderBy("bucket")
    },

    // ---- GROUPING SETS with grouping() flags ----------------------------
    "u5_grouping_sets" -> QueryDef.sql(
      """SELECT n_name, o_orderpriority,
        |  CAST(grouping(n_name) AS INT) AS g_nation,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
        |  count(*) AS cnt
        |FROM orders o
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name), ())
        |ORDER BY g_nation, g_prio, n_name, o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.nation(s, d), col("n_nationkey") === col("c_nationkey"))
        .groupingSets(
          Seq(Seq(col("n_name"), col("o_orderpriority")), Seq(col("n_name")), Seq()),
          col("n_name"), col("o_orderpriority"))
        .agg(grouping(col("n_name")).cast("int").as("g_nation"),
          grouping(col("o_orderpriority")).cast("int").as("g_prio"),
          count(lit(1)).as("cnt"))
        .select(col("n_name"), col("o_orderpriority"), col("g_nation"),
          col("g_prio"), col("cnt"))
        .orderBy(col("g_nation"), col("g_prio"), col("n_name"),
          col("o_orderpriority"))
    },

    // ---- window: ntile bucketing ----------------------------------------
    "w8_ntile" -> QueryDef.sql(
      """SELECT event_id,
        |  ntile(8) OVER (PARTITION BY event_type ORDER BY value, event_id) AS bucket
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_id"), ntile(8).over(w).cast("long").as("bucket"))
        .orderBy("event_id")
    },

    // ---- window: value-based RANGE frame --------------------------------
    // The frame is defined on the ORDER BY value axis (all rows within 5.0
    // below the current row's value), not on row positions — peers with
    // equal values share one frame, so the result is order-insensitive.
    "w9_range_frame" -> QueryDef.sql(
      """SELECT event_id,
        |  round(sum(value) OVER (PARTITION BY event_type ORDER BY value
        |    RANGE BETWEEN 5.0 PRECEDING AND CURRENT ROW), 4) AS rsum
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d).select(col("event_id"),
        round(expr("sum(value) OVER (PARTITION BY event_type ORDER BY value " +
          "RANGE BETWEEN 5.0 PRECEDING AND CURRENT ROW)"), 4).as("rsum"))
        .orderBy("event_id")
    },

    // ---- gaps-and-islands: longest consecutive-active-day streak --------
    // the classic islands trick: day_number − row_number is constant
    // within a consecutive run, so runs fall out of one hash agg on the
    // derived group key. Windows run on the DEDUPED per-user day grid
    // (bounded by calendar days, not event volume).
    "w10_streaks" -> QueryDef.sql(
      """WITH d AS (
        |  SELECT DISTINCT user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |r AS (
        |  SELECT user_id, day,
        |    date_diff('day', DATE '1970-01-01', day)
        |      - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM d),
        |s AS (SELECT user_id, count(*) AS len FROM r GROUP BY user_id, grp)
        |SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak,
        |  CAST(count(*) AS BIGINT) AS n_streaks
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val days = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val grp = datediff(col("day"), lit("1970-01-01")).cast("long") -
        row_number().over(Window.partitionBy("user_id").orderBy("day"))
      days.withColumn("grp", grp)
        .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
        .groupBy("user_id").agg(max(col("len")).as("max_streak"),
          count(lit(1)).as("n_streaks"))
        .orderBy("user_id")
    },

    // ---- band (range) join: equi key + date-interval residual -----------
    "j9_band_join" -> QueryDef.sql(
      """SELECT o.o_orderkey, count(*) AS n_within
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  AND l.l_shipdate >= o.o_orderdate
        |  AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
        |GROUP BY o.o_orderkey ORDER BY o.o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") &&
            col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 30 DAY"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n_within"))
        .orderBy("o_orderkey")
    },

    // ---- pagination: ORDER BY + LIMIT/OFFSET ----------------------------
    "o2_limit_offset" -> QueryDef.sql(
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |ORDER BY l_orderkey, l_linenumber LIMIT 100 OFFSET 500""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
        .offset(500).limit(100)
    },

    // ---- TPC-H Q17 shape: correlated scalar avg per group ---------------
    "q17_small_quantity" -> QueryDef.sql(
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem l JOIN part p ON p_partkey = l_partkey
        |WHERE p.p_brand = 'Brand#13'
        |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = l.l_partkey)""".stripMargin) { (s, d) =>
      val partAvg = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("ap_partkey"))
        .agg((avg("l_quantity") * 0.2).as("qty_cap"))
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_brand") === "Brand#13"),
          col("p_partkey") === col("l_partkey"))
        .join(partAvg, col("ap_partkey") === col("l_partkey"))
        .filter(col("l_quantity") < col("qty_cap"))
        .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"))
    },

    // ---- TPC-H Q21 shape: EXISTS + NOT EXISTS double correlation --------
    // Catalyst plans the two correlated subqueries as a left-semi and a
    // left-anti join on the shared order key with residual conditions.
    "q21_waiting_supplier" -> QueryDef.sql(
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin) { (s, d) =>
      val l2 = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      val l3 = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"),
          col("l_shipdate").as("d3"))
      Tables.supplier(s, d)
        .join(Tables.lineitem(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
          col("o_orderkey") === col("l_orderkey"))
        .join(l2, col("o2") === col("l_orderkey") &&
          col("s2") =!= col("l_suppkey"), "left_semi")
        .join(l3, col("o3") === col("l_orderkey") &&
          col("s3") =!= col("l_suppkey") &&
          col("d3") > col("l_shipdate"), "left_anti")
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    },

    // ---- bitwise scalar family ------------------------------------------
    "sc16_bitwise" -> QueryDef.sql(
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS b_and, o_orderkey | 15 AS b_or,
        |  xor(o_orderkey, 85) AS b_xor,
        |  CAST(o_orderkey % 64 AS BIGINT) << 2 AS b_shl
        |FROM orders ORDER BY o_orderkey LIMIT 2000""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(col("o_orderkey"),
        col("o_orderkey").bitwiseAND(255).as("b_and"),
        col("o_orderkey").bitwiseOR(15).as("b_or"),
        col("o_orderkey").bitwiseXOR(85).as("b_xor"),
        shiftleft((col("o_orderkey") % 64).cast("long"), 2).cast("long").as("b_shl"))
        .orderBy("o_orderkey").limit(2000)
    })
}
