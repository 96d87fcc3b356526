package graft

import org.scalatest.funsuite.AnyFunSuite

/** Three-way parity: for every probe whose oracle SQL is dialect-shared
  * ANSI, the SAME SQL text must produce the SAME result through
  * `spark.sql` as the DataFrame program does (and the driver already
  * checks both against DuckDB). This pins the SQL front-end to the
  * DataFrame surface.
  */
class SqlParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Oracle strings that parse identically in Spark SQL and DuckDB. */
  private val shared = Seq(
    "s7_scan_count", "p1_project", "f3_date_range", "f6_coalesce",
    "j1_join_bcast", "j5_semi_join", "j5_anti_join", "j7_left_outer",
    "a10_tpch_q1", "a11_count_distinct", "a15_having",
    "q4_order_priority", "q6_forecast_revenue", "q7_scalar_subquery",
    "q8_cross_join", "q10_returned_items", "sc11_case_when",
    "u1_intersect", "u2_except", "u3_union_all", "n1_null_semantics",
    "d1_dedup_exact", "d6_dedup_keep", "t1_text_stats", "w7_running_sum",
    "q2_min_supplier", "q13_cust_distribution", "q14_promo_share",
    "q16_supplier_cnt", "q18_large_orders", "q19_disjunctive",
    "q22_idle_customers", "u5_grouping_sets", "w8_ntile", "w9_range_frame",
    "j9_band_join", "o2_limit_offset", "q17_small_quantity",
    "q21_waiting_supplier", "q9_product_profit", "q12_late_shipments",
    "q15_top_supplier", "q20_heavy_suppliers",
    // round-10 additions (CAST-only float handling, no :: or epoch_us)
    "q23_volume_shipping", "q24_market_share", "w15_ratio_to_report",
    "o3_keyset_page", "u6_except_all", "u7_intersect_all", "a30_profile",
    "a32_corr_matrix", "e20_incremental_agg", "e23_incremental_join_view",
    // round-11 additions (CAST-only, shared window/date_trunc surface)
    "e27_cusum", "a34_ks_drift", "a35_gini_engagement")

  private def registerViews(): Unit =
    Tables.names.foreach { t =>
      val df = t match {
        case "events" => Tables.events(spark, TestSpark.sfDir)
        case other    => Tables.load(spark, TestSpark.sfDir, other)
      }
      df.createOrReplaceTempView(t)
    }

  test("shared-dialect oracle SQL gives identical results via spark.sql") {
    registerViews()
    val oracle = SparkEntry.oracleSql
    val queries = SparkEntry.queries
    val failures = shared.flatMap { name =>
      val sqlRes = try Right(spark.sql(oracle(name)).collect().toSeq)
      catch { case e: Throwable => Left(s"$name: SQL failed: ${e.getMessage.take(120)}") }
      sqlRes match {
        case Left(err) => Some(err)
        case Right(viaSql) =>
          val viaDf = queries(name)(spark, TestSpark.sfDir).collect().toSeq
          if (viaSql.map(_.toString) == viaDf.map(_.toString)) None
          else Some(s"$name: ${viaSql.size} vs ${viaDf.size} rows or values differ")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("GraftExtensions injects all engine functions into a registry") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone()
    org.apache.spark.sql.GraftBridge.registerExtensionFunctions(ext, reg)
    Seq("minhash_signature", "simhash64", "simhash64_text",
      "ngram_jaccard", "text_stats").foreach { f =>
      assert(reg.functionExists(FunctionIdentifier(f)), s"$f not registered")
    }
  }
}
