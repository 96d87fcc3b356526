package graft.weather

import java.time.LocalDate
import scala.util.Try

/** Request model + validation (SURVEY.md §2.2 F1–F5), mirroring the
  * reference's observable behavior:
  *  - location required: `place` or both coordinates (F2, `server.py:196-197`)
  *  - lat ∈ [-90,90], lon ∈ [-180,180] (F1, `server.py:50-51`)
  *  - granularity ∈ {15, 60, ≥1440}; 15 forbidden for history (F5,
  *    `server.py:224-225`, `:351-352`)
  *  - forecast_days clamped to 16 (`server.py:239`); default 7 forward
  *    only when neither days param is given (`server.py:247-249`)
  *  - history requires ISO dates with start ≤ end (F3, `server.py:337-345`)
  *
  * Validation is pure (`Either[String, _]`), applied before any Spark
  * plan is built — the engine-API analogue of the reference's error
  * envelopes (`server.py:280`).
  */
final case class Location(place: Option[String], latitude: Option[Double],
    longitude: Option[Double])

final case class ForecastRequest(
    location: Location,
    granularity: Int = 60,
    forecastDays: Option[Int] = None,
    pastDays: Option[Int] = None,
    variables: Option[Seq[String]] = None,
    dailyVariables: Option[Seq[String]] = None)

final case class HistoryRequest(
    location: Location,
    startDate: String,
    endDate: String,
    granularity: Int = 60,
    variables: Option[Seq[String]] = None)

/** A validated, normalized forecast plan: resolved day window and
  * granularity key.
  */
final case class ForecastPlan(location: Location, granKey: String,
    vars: Seq[String], dailyVars: Option[Seq[String]],
    forecastDays: Int, pastDays: Int)

final case class HistoryPlan(location: Location, granKey: String,
    vars: Seq[String], start: LocalDate, end: LocalDate)

object Requests {
  val DefaultForecastDays = 7 // server.py:33
  val MaxForecastDays     = 16 // server.py:239
  private val log = org.apache.log4j.Logger.getLogger(getClass)

  /** F1 + F2. */
  def validateLocation(loc: Location): Either[String, Location] = loc match {
    case Location(None, None, _) | Location(None, _, None) =>
      Left("Either 'place' or both 'latitude' and 'longitude' must be provided.")
    case Location(_, Some(lat), _) if lat < -90 || lat > 90 =>
      Left(s"Invalid coordinates: latitude $lat not in [-90, 90]")
    case Location(_, _, Some(lon)) if lon < -180 || lon > 180 =>
      Left(s"Invalid coordinates: longitude $lon not in [-180, 180]")
    case ok => Right(ok)
  }

  /** Granularity dispatch (`server.py:213-225`): 15 → minutely_15,
    * 60 → hourly, ≥1440 → daily; anything else rejected.
    */
  def granKey(granularity: Int): Either[String, String] = granularity match {
    case 15                => Right(WeatherSchemas.GranMinutely15)
    case 60                => Right(WeatherSchemas.GranHourly)
    case g if g >= 1440    => Right(WeatherSchemas.GranDaily)
    case g => Left(s"Unsupported granularity: $g. Use 15, 60, or >=1440.")
  }

  def validate(req: ForecastRequest): Either[String, ForecastPlan] =
    for {
      loc <- validateLocation(req.location)
      key <- granKey(req.granularity)
    } yield {
      val vars = req.variables.getOrElse(
        if (key == WeatherSchemas.GranDaily)
          req.dailyVariables.getOrElse(WeatherSchemas.defaultDailyNames)
        else WeatherSchemas.defaultHourlyNames)
      // Default horizon applies unless a POSITIVE days param was given —
      // the reference's checks are `is not None and > 0`
      // (server.py:237-245), so an explicit 0 behaves like absent there
      // too; forecast horizon capped at the API limit.
      val anyGiven = req.forecastDays.exists(_ > 0) || req.pastDays.exists(_ > 0)
      val fcst = req.forecastDays.filter(_ > 0)
        .map(d => math.min(d, MaxForecastDays))
        .getOrElse(if (anyGiven) 0 else DefaultForecastDays)
      val past = req.pastDays.filter(_ > 0).getOrElse(0)
      ForecastPlan(loc, key, vars, req.dailyVariables, fcst, past)
    }

  def validate(req: HistoryRequest): Either[String, HistoryPlan] =
    for {
      loc <- validateLocation(req.location)
      _ <- if (req.granularity == 15)
        Left("Granularity 15 not supported for historical data. Use 60 or >=1440.")
      else Right(())
      key <- granKey(req.granularity)
      start <- parseIso(req.startDate)
      end <- parseIso(req.endDate)
      _ <- if (start.isAfter(end)) Left("start_date cannot be after end_date.")
      else Right(())
    } yield HistoryPlan(loc, key,
      req.variables.getOrElse(
        if (key == WeatherSchemas.GranDaily) WeatherSchemas.defaultDailyNames
        else WeatherSchemas.defaultHourlyNames),
      start, end)

  private def parseIso(s: String): Either[String, LocalDate] =
    Try(LocalDate.parse(s)).toEither.left.map(_ =>
      s"Invalid date format: '$s'. Use YYYY-MM-DD.")
}
