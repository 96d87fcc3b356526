package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational probe surface (SURVEY.md §2.2–§2.7): projection/filter,
  * joins, aggregation, windows, sort/limit, set ops, scalar functions.
  * Every query is declarative DataFrame API so Catalyst gets full freedom
  * (pushdown, pruning, broadcast selection, whole-stage codegen); each has
  * a DuckDB oracle with identical column aliases and a total ORDER BY.
  *
  * Float determinism: sums of large magnitude are rounded to 2 d.p.,
  * averages to 4 d.p., bounded values (cosine etc.) to 6 d.p. — summation
  * order differs between engines, so rounding must sit inside the noise
  * floor of a double at each magnitude (SURVEY §7 known-hard list).
  */
object Relational {

  def defs: Map[String, QueryDef] = Map(
    // ---- S7: scan --------------------------------------------------------
    "s7_scan_count" -> QueryDef.sql(
      "SELECT count(*) AS cnt FROM lineitem") { (s, d) =>
      Tables.lineitem(s, d).agg(count(lit(1)).as("cnt"))
    },

    // ---- P1: projection (column pruning reaches the parquet scan) --------
    "p1_project" -> QueryDef.sql(
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- F1: range predicate (reference coordinate validation shape) -----
    "f1_between" -> QueryDef.sql(
      """SELECT event_id, round(value, 6) AS value FROM events
        |WHERE value BETWEEN -90 AND 90 ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .filter(col("value").between(-90, 90))
        .select(col("event_id"), round(col("value"), 6).as("value"))
        .orderBy("event_id")
    },

    // ---- F3: date parse + range predicate --------------------------------
    "f3_date_range" -> QueryDef.sql(
      """SELECT o_orderkey FROM orders
        |WHERE o_orderdate BETWEEN DATE '1995-06-01' AND DATE '1996-12-31'
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderdate").between(lit("1995-06-01").cast("date"),
          lit("1996-12-31").cast("date")))
        .select("o_orderkey").orderBy("o_orderkey")
    },

    // ---- F5/SC4: clamp via least (forecast_days cap, server.py:239) ------
    "f5_clamp" -> QueryDef.sql(
      """SELECT event_id, round(least(16.0, floor(value)), 6) AS clamped
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          round(least(lit(16.0), floor(col("value"))), 6).as("clamped"))
        .orderBy("event_id")
    },

    // ---- F6/SC: null-safe fallback (coalesce / nullif) -------------------
    "f6_coalesce" -> QueryDef.sql(
      """SELECT c_custkey, coalesce(nullif(c_mktsegment, 'BUILDING'), '-') AS seg
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("-")).as("seg"))
        .orderBy("c_custkey")
    },

    // ---- J1: lookup join — small dim broadcast (geocode join shape) ------
    "j1_join_bcast" -> QueryDef.sql(
      """SELECT c_custkey, n_name FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "n_name").orderBy("c_custkey")
    },

    // ---- J2: 3-way fact⋈fact⋈dim join ------------------------------------
    "j2_join_3way" -> QueryDef.sql(
      """SELECT l_orderkey, l_linenumber, c_custkey, round(o_totalprice, 2) AS o_price
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("c_custkey"),
          round(col("o_totalprice"), 2).as("o_price"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- J5: semi / anti joins -------------------------------------------
    "j5_semi_join" -> QueryDef.sql(
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey").orderBy("c_custkey")
    },
    "j5_anti_join" -> QueryDef.sql(
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey").orderBy("c_custkey")
    },

    // ---- A10: TPC-H Q1 shape (partial/final hash agg) --------------------
    // sum_disc_price uses EXACT integer units (ExactMoney): the
    // discount product has 4 true decimals, so its rounded sum is the
    // summation-order half-boundary class the sf0.1 sweep caught on q5.
    // Raw-column sums (sum_qty/sum_price: true 2-d.p. sums, 0.005 from
    // any boundary) keep the plain rounded form — that class is safe.
    "a10_tpch_q1" -> QueryDef.sql(
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
        |       AS DOUBLE) / CAST(10000.0 AS DOUBLE) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS cnt
        |FROM lineitem
        |WHERE l_shipdate <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          ExactMoney.asCurrency(
            ExactMoney.revenueUnits(col("l_extendedprice"), col("l_discount")),
            10000.0).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- A11: exact count-distinct ---------------------------------------
    "a11_count_distinct" -> QueryDef.sql(
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy("l_returnflag")
    },

    // ---- A12: rollup / grouping sets -------------------------------------
    "a12_rollup" -> QueryDef.sql(
      """SELECT n_name, o_orderpriority, count(*) AS cnt
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, o_orderpriority)
        |ORDER BY n_name NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
      // Grouping columns are aliased (g_*) before the rollup: the Expand
      // node under rollup otherwise emits a second attribute with the same
      // name and the final sort becomes ambiguous.
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name").as("g_name"), col("o_orderpriority").as("g_prio"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("g_name").asc_nulls_first, col("g_prio").asc_nulls_first)
        .select(col("g_name").as("n_name"), col("g_prio").as("o_orderpriority"),
          col("cnt"))
    },

    // ---- A9 shape: tumbling-window resample on an event stream -----------
    "a9_resample_daily" -> QueryDef.sql(
      """SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, event_type,
        |  count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
        .orderBy("day", "event_type")
    },

    // ---- §2.5: window functions ------------------------------------------
    "w1_row_number" -> QueryDef.sql(
      """SELECT event_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("event_id"), row_number().over(w).cast("long").as("rn"))
        .orderBy("event_id")
    },
    "w2_lag_lead" -> QueryDef.sql(
      """SELECT event_id,
        |  round(lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS prev_value,
        |  round(lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS next_value
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("event_id"),
          round(lag("value", 1).over(w), 6).as("prev_value"),
          round(lead("value", 1).over(w), 6).as("next_value"))
        .orderBy("event_id")
    },
    "w3_rolling_avg" -> QueryDef.sql(
      """SELECT event_id,
        |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS roll_avg
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), round(avg("value").over(w), 4).as("roll_avg"))
        .orderBy("event_id")
    },
    "w4_rank" -> QueryDef.sql(
      """SELECT o_orderkey,
        |  rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rk,
        |  ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS quartile
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          rank().over(w).cast("long").as("rk"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy("o_orderkey")
    },

    // ---- §2.6: sort / top-k (TakeOrderedAndProject) ----------------------
    "o1_topk" -> QueryDef.sql(
      """SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
    },

    // ---- §2.6: set ops ----------------------------------------------------
    "u1_intersect" -> QueryDef.sql(
      """SELECT o_custkey AS custkey FROM orders
        |INTERSECT
        |SELECT c_custkey AS custkey FROM customer
        |ORDER BY custkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(col("o_custkey").as("custkey"))
        .intersect(Tables.customer(s, d).select(col("c_custkey").as("custkey")))
        .orderBy("custkey")
    },
    "u2_except" -> QueryDef.sql(
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders
        |ORDER BY custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("custkey"))
        .except(Tables.orders(s, d).select(col("o_custkey").as("custkey")))
        .orderBy("custkey")
    },

    // ---- SC1: CSV split / join of variable lists --------------------------
    "sc1_split_join" -> QueryDef.sql(
      """SELECT p_partkey, string_split(p_type, ' ')[1] AS first_word,
        |  concat_ws(',', p_brand, p_type) AS joined
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          split(col("p_type"), " ").getItem(0).as("first_word"),
          concat_ws(",", col("p_brand"), col("p_type")).as("joined"))
        .orderBy("p_partkey")
    },

    // ---- SC2: ISO date format / extract -----------------------------------
    "sc2_date_format" -> QueryDef.sql(
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_day"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"))
        .orderBy("o_orderkey")
    },

    // ---- SC3: relative date arithmetic ------------------------------------
    "sc3_date_arith" -> QueryDef.sql(
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) + 30 AS d30,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          date_add(col("o_orderdate"), 30).as("d30"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
            .cast("long").as("days_since"))
        .orderBy("o_orderkey")
    },

    // ---- SC5: JSON extraction ---------------------------------------------
    "sc5_json" -> QueryDef.sql(
      """SELECT event_id, json_extract_string(props, '$.k') AS k
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), get_json_object(col("props"), "$.k").as("k"))
        .orderBy("event_id")
    },

    // ---- SC9: haversine distance (J4 building block) ----------------------
    "sc9_haversine" -> QueryDef.sql(
      """SELECT event_id, round(
        |  2 * 6371.0 * asin(sqrt(
        |    pow(sin(radians((least(90.0, abs(value)) - 50.08) / 2)), 2) +
        |    cos(radians(50.08)) * cos(radians(least(90.0, abs(value)))) *
        |    pow(sin(radians((value - 14.43) / 2)), 2))), 4) AS dist_km
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val lat2 = least(lit(90.0), abs(col("value")))
      val dist = lit(2) * lit(6371.0) * asin(sqrt(
        pow(sin(radians((lat2 - lit(50.08)) / 2)), 2) +
          cos(radians(lit(50.08))) * cos(radians(lat2)) *
            pow(sin(radians((col("value") - lit(14.43)) / 2)), 2)))
      Tables.events(s, d)
        .select(col("event_id"), round(dist, 4).as("dist_km"))
        .orderBy("event_id")
    },

    // ---- J3: as-of join (scalable union+window pattern, no range join) ----
    "j3_asof_join" -> QueryDef.sql(
      """SELECT e.event_id,
        |  (SELECT max(CAST(p.ts AS TIMESTAMP)) FROM events p
        |   WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
        |     AND p.ts <= e.ts) AS last_purchase_ts
        |FROM events e WHERE e.event_type = 'click'
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      AsOf.lastEventBefore(Tables.events(s, d),
        probeType = "click", buildType = "purchase")
    }
  )
}
