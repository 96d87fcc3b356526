package graft.weather

import org.scalatest.funsuite.AnyFunSuite

/** Validation suites mirroring the reference's observable behavior
  * (SURVEY.md §5 item 1): each case cites the server.py line it mirrors.
  */
class RequestsSpec extends AnyFunSuite {
  private val prague = Location(None, Some(50.08), Some(14.43))

  test("F1: latitude 91 rejected (server.py:50)") {
    assert(Requests.validate(ForecastRequest(
      Location(None, Some(91.0), Some(0.0)))).isLeft)
  }

  test("F1: longitude -190 rejected (server.py:51)") {
    assert(Requests.validate(ForecastRequest(
      Location(None, Some(0.0), Some(-190.0)))).isLeft)
  }

  test("F2: no location rejected (server.py:196-197)") {
    assert(Requests.validate(ForecastRequest(Location(None, None, None))).isLeft)
    assert(Requests.validate(ForecastRequest(Location(None, Some(1.0), None))).isLeft)
  }

  test("F5: granularity 45 rejected (server.py:224-225)") {
    assert(Requests.validate(ForecastRequest(prague, granularity = 45)).isLeft)
  }

  test("granularity 15 allowed for forecast, rejected for history (server.py:351-352)") {
    assert(Requests.validate(ForecastRequest(prague, granularity = 15))
      .exists(_.granKey == WeatherSchemas.GranMinutely15))
    assert(Requests.validate(HistoryRequest(prague, "2024-05-01", "2024-05-02",
      granularity = 15)).isLeft)
  }

  test("forecast_days clamped to 16 (server.py:239)") {
    assert(Requests.validate(ForecastRequest(prague, forecastDays = Some(30)))
      .exists(_.forecastDays == 16))
  }

  test("default 7 days forward only when neither days param given (server.py:237-249)") {
    assert(Requests.validate(ForecastRequest(prague))
      .exists(p => p.forecastDays == 7 && p.pastDays == 0))
    // past_days alone suppresses the forward default
    assert(Requests.validate(ForecastRequest(prague, pastDays = Some(3)))
      .exists(p => p.forecastDays == 0 && p.pastDays == 3))
  }

  test("F3: bad ISO date and start>end rejected (server.py:340-345)") {
    assert(Requests.validate(HistoryRequest(prague, "01-05-2024", "2024-05-02")).isLeft)
    assert(Requests.validate(HistoryRequest(prague, "2024-05-09", "2024-05-02")).isLeft)
  }

  test("daily granularity selects daily defaults (server.py:219-223)") {
    assert(Requests.validate(ForecastRequest(prague, granularity = 1440))
      .exists(_.vars == WeatherSchemas.defaultDailyNames))
  }
}
