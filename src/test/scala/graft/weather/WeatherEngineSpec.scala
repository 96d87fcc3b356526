package graft.weather

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WeatherEngineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val engine = new WeatherEngine(spark, TestSpark.fixtures)
  private val prague = Location(Some("Prague"), None, None)

  test("default forecast: 7 days forward from `now` (2024-07-03), fixture-bounded") {
    val df = engine.forecast(ForecastRequest(prague)).fold(e => fail(e), identity)
    // fixture covers 07-01..07-07; [07-03, 07-10) clips to 5 days × 24 h
    assert(df.count() === 5 * 24)
    assert(df.agg(min(to_date(col("ts_local")))).collect()(0)
      .getDate(0).toString == "2024-07-03")
  }

  test("past_days reaches back; forecast default suppressed (server.py:242-249)") {
    val df = engine.forecast(ForecastRequest(prague, pastDays = Some(2)))
      .fold(e => fail(e), identity)
    assert(df.count() === 2 * 24) // [07-01, 07-03)
  }

  test("geocode failure surfaces as error (server.py:112-114)") {
    assert(engine.forecast(ForecastRequest(Location(Some("Atlantis"), None, None)))
      .isLeft)
  }

  test("ambiguous place rejected (exactly_one semantics, server.py:110)") {
    assert(engine.geocode("Springfield").isLeft)
  }

  test("place overrides raw coordinates (server.py:188-194)") {
    val viaPlace = engine.forecast(ForecastRequest(
      Location(Some("Brno"), Some(50.08), Some(14.43)))).fold(e => fail(e), identity)
    assert(viaPlace.select("latitude").distinct().collect()(0).getDouble(0) === 49.19)
  }

  test("daily granularity returns native rollup rows") {
    val df = engine.forecast(ForecastRequest(prague, granularity = 1440,
      forecastDays = Some(7), pastDays = Some(2))).fold(e => fail(e), identity)
    assert(df.count() === 7)
    assert(df.columns.contains("temperature_2m_max"))
  }

  test("history daily over the archive block respects the date range") {
    val df = engine.history(HistoryRequest(prague, "2024-05-05", "2024-05-20",
      granularity = 1440)).fold(e => fail(e), identity)
    assert(df.count() === 16)
    assert(df.columns.contains("sunrise"))
  }

  test("variable projection narrows the wide schema (P1)") {
    val df = engine.forecast(ForecastRequest(prague,
      variables = Some(Seq("temperature_2m", "precipitation"))))
      .fold(e => fail(e), identity)
    assert(df.columns.toSet ===
      Set("latitude", "longitude", "ts_local", "ts_utc",
        "temperature_2m", "precipitation"))
  }
}
