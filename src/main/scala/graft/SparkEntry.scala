package graft

import graft.operators.{PipelineQueries, Relational}
import graft.weather.WeatherQueries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator probe (SURVEY.md §2) to a
  * DataFrame program over the parquet tables in the given scale-factor
  * directory; `oracleSql` gives the DuckDB-runnable ANSI SQL twin for each
  * SQL-expressible probe (identical column aliases + total ORDER BY).
  */
object SparkEntry {

  private def allDefs: Map[String, QueryDef] =
    Relational.defs ++ operators.Relational2.defs ++
      operators.Relational3.defs ++ operators.Relational4.defs ++
      operators.Relational5.defs ++ operators.Interval.defs ++
      PipelineQueries.defs ++ operators.CorpusQueries.defs ++
      operators.Analytics.defs ++ operators.Analytics2.defs ++
      operators.Analytics3.defs ++
      operators.Behavior.defs ++ operators.Incremental.defs ++
      WeatherQueries.defs ++ operators.Multimodal.defs ++
      streaming.StreamingQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape: scan → filter → partial/final hash agg → sort.
    */
  def entry(spark: SparkSession): DataFrame =
    allDefs("a10_tpch_q1").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (k, v) => k -> v.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
