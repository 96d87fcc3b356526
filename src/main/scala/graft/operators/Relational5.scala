package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Fourth relational batch: the remaining classic TPC-H query shapes
  * adapted to the driver's schema (no `partsupp` table and no
  * `l_shipmode`/`l_receiptdate` columns exist, so Q9/Q11/Q12/Q15/Q20
  * keep their PLAN shapes — multi-way join + year agg, group-HAVING vs
  * a broadcast scalar subquery, conditional-count by category,
  * argmax-by-scalar-subquery, nested semi-join chain — over the columns
  * that do). All oracle-checked. With q11 every TPC-H query 1-22 has a
  * shape-faithful adaptation in the probe set.
  */
object Relational5 {

  def defs: Map[String, QueryDef] = Map(
    // ---- TPC-H Q9 shape: profit by (nation, year) over a 4-way join ----
    // (no ps_supplycost column: profit = discounted revenue)
    "q9_product_profit" -> QueryDef.sql(
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
        |       AS DOUBLE) / CAST(10000.0 AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY n_name, CAST(year(o_orderdate) AS INTEGER)
        |ORDER BY nation, o_year DESC""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_name").contains("red")),
          col("p_partkey") === col("l_partkey"))
        .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
        .join(Tables.nation(s, d), col("n_nationkey") === col("s_nationkey"))
        .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("int").as("o_year"))
        // exact integer-unit profit (ExactMoney — the q5 boundary class)
        .agg(ExactMoney.asCurrency(
          ExactMoney.revenueUnits(col("l_extendedprice"), col("l_discount")),
          10000.0).as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // ---- TPC-H Q12 shape: conditional counts by category over a join ----
    // (no l_shipmode/l_receiptdate: "late" = shipped >90 days after the
    // order date; category = order priority class, exactly Q12's
    // urgent/non-urgent split)
    "q12_late_shipments" -> QueryDef.sql(
      """SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |            THEN 'high' ELSE 'low' END AS priority_class,
        |  CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |                THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
        |  CAST(count(*) AS BIGINT) AS line_count
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY priority_class""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
          .otherwise("low").as("priority_class"))
        .agg(
          sum(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
            1).otherwise(0)).cast("long").as("late_count"),
          count(lit(1)).as("line_count"))
        .orderBy("priority_class")
    },

    // ---- TPC-H Q15 shape: argmax via scalar subquery over an agg view ----
    "q15_top_supplier" -> QueryDef.sql(
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
        |             * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
        |         AS DOUBLE) / CAST(10000.0 AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= DATE '1996-01-01'
        |    AND l_shipdate < DATE '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val revenue = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
          col("l_shipdate") < lit("1996-04-01").cast("date"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        // exact integer-unit revenue (ExactMoney): the argmax selection
        // below compares EXACT values — no rounded-tie ambiguity
        .agg(ExactMoney.asCurrency(
          ExactMoney.revenueUnits(col("l_extendedprice"), col("l_discount")),
          10000.0).as("total_revenue"))
      val maxRev = revenue.agg(max("total_revenue").as("max_revenue"))
      Tables.supplier(s, d)
        .join(revenue, col("s_suppkey") === col("supplier_no"))
        .join(broadcast(maxRev), col("total_revenue") === col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    },

    // ---- TPC-H Q11 shape: group-by HAVING vs a global scalar subquery ----
    // (no partsupp: "stock value" = shipped value per part for one
    // nation's suppliers, kept when above a fraction of that nation's
    // total). The threshold is a 1-row aggregate broadcast into the
    // HAVING — same plan family as q7/q15, but gating GROUPS not rows.
    "q11_important_stock" -> QueryDef.sql(
      """SELECT l_partkey AS partkey,
        |  round(sum(l_extendedprice * l_quantity), 2) AS value
        |FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |WHERE n_name = 'NATION_3'
        |GROUP BY l_partkey
        |HAVING sum(l_extendedprice * l_quantity) > (
        |  SELECT 0.001 * sum(l_extendedprice * l_quantity)
        |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  WHERE n_name = 'NATION_3')
        |ORDER BY value DESC, partkey""".stripMargin) { (s, d) =>
      def nationLines = Tables.lineitem(s, d)
        .join(Tables.supplier(s, d)
          .join(Tables.nation(s, d).filter(col("n_name") === "NATION_3"),
            col("n_nationkey") === col("s_nationkey"), "left_semi"),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
      val perPart = nationLines
        .groupBy(col("l_partkey").as("partkey"))
        .agg(sum(col("l_extendedprice") * col("l_quantity")).as("raw_value"))
      val threshold = nationLines
        .agg((sum(col("l_extendedprice") * col("l_quantity")) * 0.001).as("thr"))
      perPart.crossJoin(broadcast(threshold))
        .filter(col("raw_value") > col("thr"))
        .select(col("partkey"), round(col("raw_value"), 2).as("value"))
        .orderBy(col("value").desc, col("partkey"))
    },

    // ---- TPC-H Q20 shape: nested semi-join chain ----
    // suppliers (in a region) who shipped some part matching a name
    // prefix with total shipped quantity above a threshold — EXISTS
    // inside EXISTS, planned as two stacked left-semi joins
    "q20_heavy_suppliers" -> QueryDef.sql(
      """SELECT s_name, s_acctbal
        |FROM supplier JOIN nation ON n_nationkey = s_nationkey
        |JOIN region ON r_regionkey = n_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l
        |    WHERE l.l_suppkey = s_suppkey
        |      AND EXISTS (SELECT 1 FROM part p
        |                  WHERE p.p_partkey = l.l_partkey
        |                    AND p.p_name LIKE 'small%')
        |    GROUP BY l.l_partkey HAVING sum(l.l_quantity) > 50)
        |ORDER BY s_name""".stripMargin) { (s, d) =>
      val heavyParts = Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_name").startsWith("small")),
          col("p_partkey") === col("l_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum("l_quantity").as("shipped_qty"))
        .filter(col("shipped_qty") > 50)
        .select(col("l_suppkey").as("hp_suppkey"))
      Tables.supplier(s, d)
        .join(Tables.nation(s, d), col("n_nationkey") === col("s_nationkey"))
        .join(Tables.region(s, d).filter(col("r_name") === "EUROPE"),
          col("r_regionkey") === col("n_regionkey"), "left_semi")
        .join(heavyParts, col("hp_suppkey") === col("s_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    }
  )
}
