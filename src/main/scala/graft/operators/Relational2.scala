package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second relational batch: TPC-H query shapes (Q3/Q5/Q6), statistical
  * aggregates, percentiles, string/array scalar functions, scalar
  * subqueries, HAVING, pivot, and the remaining window-function families.
  * Same rules as [[Relational]]: declarative plans, identical aliases in
  * the DuckDB oracle, total ORDER BY, magnitude-aware rounding.
  */
object Relational2 {

  def defs: Map[String, QueryDef] = Map(
    // ---- TPC-H Q3 shape: selective join + group + top-k by aggregate ---
    "q3_shipping_priority" -> QueryDef.sql(
      """SELECT l_orderkey,
        |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
        |       AS DOUBLE) / CAST(10000.0 AS DOUBLE) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS odate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < DATE '1997-03-15' AND l_shipdate > DATE '1997-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit("1997-03-15").cast("date"))
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > lit("1997-03-15").cast("date"))
        .groupBy("l_orderkey", "o_orderdate")
        // exact integer-unit revenue (ExactMoney — the q5 boundary class)
        .agg(ExactMoney.asCurrency(
          ExactMoney.revenueUnits(col("l_extendedprice"), col("l_discount")),
          10000.0).as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // ---- TPC-H Q5 shape: 6-way star join, revenue per nation ----------
    // Revenue sums in EXACT integer units (ExactMoney): the sf0.1
    // oracle sweep caught NATION_11's true sum landing ON a 2-d.p.
    // half (13237001.475) — float summation order then decides the
    // rounded digit per engine. Σ cents·(100−pct) is order-independent
    // BIGINT; the final /10⁴ is a bit-identical quotient, emitted
    // UNROUNDED (the exact revenue).
    "q5_local_supplier" -> QueryDef.sql(
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
        |       AS DOUBLE) / CAST(10000.0 AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON c_nationkey = n_nationkey AND s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1997-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("date") &&
          col("o_orderdate") < lit("1997-01-01").cast("date"))
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey") &&
            col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(ExactMoney.asCurrency(
          ExactMoney.revenueUnits(col("l_extendedprice"), col("l_discount")),
          10000.0).as("revenue"))
        .orderBy("n_name")
    },

    // ---- TPC-H Q6 shape: pure scan-filter-agg ---------------------------
    "q6_forecast_revenue" -> QueryDef.sql(
      """SELECT
        |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
        |           * CAST(round(l_discount * 100, 0) AS BIGINT))
        |       AS DOUBLE) / CAST(10000.0 AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
          col("l_shipdate") < lit("1997-01-01").cast("date") &&
          col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
        // exact integer-unit forecast revenue (ExactMoney)
        .agg((sum(ExactMoney.cents(col("l_extendedprice"))
            * ExactMoney.pct(col("l_discount"))).cast("double")
          / lit(10000.0)).as("revenue"))
    },

    // ---- statistical aggregates ----------------------------------------
    "a13_stats" -> QueryDef.sql(
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_samp(l_discount), 6) AS var_disc,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  round(min(l_quantity), 2) AS min_qty, round(max(l_quantity), 2) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag").agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_discount")), 6).as("var_disc"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        round(min("l_quantity"), 2).as("min_qty"),
        round(max("l_quantity"), 2).as("max_qty"))
        .orderBy("l_returnflag")
    },

    "a14_percentiles" -> QueryDef.sql(
      """SELECT l_returnflag,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 4) AS p50,
        |  round(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity), 4) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      // Spark's exact `percentile` uses the same linear interpolation as
      // ANSI percentile_cont.
      Tables.lineitem(s, d).groupBy("l_returnflag").agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_quantity, 0.9)"), 4).as("p90"))
        .orderBy("l_returnflag")
    },

    // ---- HAVING ---------------------------------------------------------
    "a15_having" -> QueryDef.sql(
      """SELECT o_custkey, count(*) AS n_orders
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 12
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 12)
        .orderBy("o_custkey")
    },

    // ---- scalar subquery ------------------------------------------------
    "q7_scalar_subquery" -> QueryDef.sql(
      """SELECT o_orderkey,
        |  round(o_totalprice / (SELECT avg(o_totalprice) FROM orders), 6) AS price_ratio
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d)
      val avgPrice = orders.agg(avg("o_totalprice").as("__avg"))
      orders.crossJoin(broadcast(avgPrice))
        .select(col("o_orderkey"),
          round(col("o_totalprice") / col("__avg"), 6).as("price_ratio"))
        .orderBy("o_orderkey")
    },

    // ---- UNION ALL + conditional agg ------------------------------------
    "u3_union_all" -> QueryDef.sql(
      """SELECT k, count(*) AS cnt FROM (
        |  SELECT o_custkey AS k FROM orders
        |  UNION ALL
        |  SELECT c_custkey AS k FROM customer
        |) GROUP BY k ORDER BY k""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(col("o_custkey").as("k"))
        .unionAll(Tables.customer(s, d).select(col("c_custkey").as("k")))
        .groupBy("k").agg(count(lit(1)).as("cnt"))
        .orderBy("k")
    },

    // ---- cross join (tiny dims) -----------------------------------------
    "q8_cross_join" -> QueryDef.sql(
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select("r_name", "n_name").orderBy("r_name", "n_name")
    },

    // ---- CASE WHEN bucketing --------------------------------------------
    "sc11_case_when" -> QueryDef.sql(
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 200000 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        |  count(*) AS cnt, round(avg(o_totalprice), 2) AS avg_price
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .withColumn("bucket",
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 200000, "medium")
            .otherwise("large"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"), round(avg("o_totalprice"), 2).as("avg_price"))
        .orderBy("bucket")
    },

    // ---- string functions -----------------------------------------------
    "sc12_strings" -> QueryDef.sql(
      """SELECT c_custkey, upper(c_name) AS uname, substr(c_name, 1, 8) AS prefix,
        |  replace(c_mktsegment, 'ING', '_') AS seg2,
        |  length(c_name) AS name_len, strpos(c_name, '0') AS zero_pos
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_custkey"),
        upper(col("c_name")).as("uname"),
        substring(col("c_name"), 1, 8).as("prefix"),
        expr("replace(c_mktsegment, 'ING', '_')").as("seg2"),
        length(col("c_name")).cast("long").as("name_len"),
        instr(col("c_name"), "0").cast("long").as("zero_pos"))
        .orderBy("c_custkey")
    },

    // ---- array functions over embeddings --------------------------------
    "sc13_arrays" -> QueryDef.sql(
      """SELECT vec_id, len(embedding) AS dim,
        |  round(list_sum(CAST(embedding[1:8] AS DOUBLE[])), 6) AS head_sum,
        |  round(list_max(CAST(embedding AS DOUBLE[])), 6) AS vmax
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d).select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(aggregate(transform(slice(col("embedding"), 1, 8), x => x.cast("double")),
          lit(0.0), (acc, x) => acc + x), 6).as("head_sum"),
        round(array_max(transform(col("embedding"), x => x.cast("double"))), 6).as("vmax"))
        .orderBy("vec_id")
    },

    // ---- window: value functions + distribution functions ---------------
    "w5_value_windows" -> QueryDef.sql(
      """SELECT event_id,
        |  round(first_value(value) OVER w, 6) AS first_v,
        |  round(last_value(value) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 6) AS last_v,
        |  round(nth_value(value, 2) OVER w, 6) AS second_v
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d).select(col("event_id"),
        round(first(col("value")).over(w), 6).as("first_v"),
        round(last(col("value")).over(wAll), 6).as("last_v"),
        round(nth_value(col("value"), 2).over(w), 6).as("second_v"))
        .orderBy("event_id")
    },

    "w6_distribution" -> QueryDef.sql(
      """SELECT event_id,
        |  round(percent_rank() OVER (PARTITION BY event_type ORDER BY value, event_id), 6) AS prk,
        |  round(cume_dist() OVER (PARTITION BY event_type ORDER BY value, event_id), 6) AS cd
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("event_type").orderBy("value", "event_id")
      Tables.events(s, d).select(col("event_id"),
        round(percent_rank().over(w), 6).as("prk"),
        round(cume_dist().over(w), 6).as("cd"))
        .orderBy("event_id")
    },

    // ---- window: running sum (frame to current row) ----------------------
    "w7_running_sum" -> QueryDef.sql(
      """SELECT event_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_sum
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d).select(col("event_id"),
        round(sum("value").over(w), 2).as("run_sum"))
        .orderBy("event_id")
    },

    // ---- pivot (Spark .pivot ≡ conditional aggregation) ------------------
    "a16_pivot" -> QueryDef.sql(
      """SELECT source,
        |  CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
        |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
        |  CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
        |  CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
        |  CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy("source")
        .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
        .count()
        .na.fill(0L, Seq("de", "en", "es", "fr", "zh"))
        .orderBy("source")
    },

    // ---- batch sessionization: session_window ≡ gaps-and-islands SQL ----
    "a17_sessionize" -> QueryDef.sql(
      """WITH g AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_id,
        |    CASE WHEN CAST(ts AS TIMESTAMP)
        |           - lag(CAST(ts AS TIMESTAMP)) OVER
        |             (PARTITION BY user_id ORDER BY ts, event_id)
        |           >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (
        |  SELECT *, sum(brk) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS sess FROM g)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
        |  round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, sess
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start")
    },

    // ---- cube (full grouping-set lattice) --------------------------------
    "a18_cube" -> QueryDef.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag").as("g_rf"), col("l_linestatus").as("g_ls"))
        .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy(col("g_rf").asc_nulls_first, col("g_ls").asc_nulls_first)
        .select(col("g_rf").as("l_returnflag"), col("g_ls").as("l_linestatus"),
          col("cnt"), col("sum_qty"))
    },

    // ---- exact-dedup operator output (keep lowest id per text) -----------
    "d6_dedup_keep" -> QueryDef.sql(
      """SELECT doc_id FROM documents
        |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Dedup.exact(Tables.documents(s, d))
        .select("doc_id").orderBy("doc_id")
    },

    // ---- generator / UDTF surface: posexplode ≡ unnest WITH ORDINALITY ---
    "u4_posexplode" -> QueryDef.sql(
      """SELECT doc_id, CAST(p.i - 1 AS BIGINT) AS pos, p.w AS word
        |FROM (
        |  SELECT doc_id,
        |    unnest([{'w': words[i], 'i': i} for i in range(1, len(words)+1)]) AS p
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
        |        FROM documents WHERE doc_id < 20))
        |ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 20)
        .select(col("doc_id"),
          posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "word")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("word"))
        .orderBy("doc_id", "pos")
    },

    // ---- date truncations ------------------------------------------------
    "sc14_date_trunc" -> QueryDef.sql(
      """SELECT date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS m,
        |  count(*) AS cnt, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY m""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("m")
    }
  )
}
