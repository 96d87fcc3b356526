package graft.weather

import org.apache.spark.sql.types.IntegerType

/** DuckDB oracle SQL fragments for the weather-path probes: the fixture
  * payloads are plain JSON, so DuckDB mirrors every wx* query via
  * `read_json` with an explicit columns spec (never inference — same rule
  * as the Spark side, WeatherSchemas) and parallel `unnest`, which zips
  * same-level list columns positionally exactly like the block→wide
  * conversion (WeatherOps.toWide).
  *
  * Fragments are generated from the same WeatherSchemas catalog the engine
  * reads with, so a catalog change cannot silently diverge the oracle.
  *
  * Float determinism notes (verified empirically at sf0.01):
  *  - sums round 2 d.p., window/resample averages 4 d.p. (CLAUDE.md);
  *  - rolling means are `round(sum,4)/count` with NO outer round — the
  *    quotients land exactly on 4-d.p. halves where engines' rounding
  *    tie-breaks differ (see Features.hourlyFeatures);
  *  - ts_utc compares as naive wall-clock (both engines subtract
  *    utc_offset_seconds from the parsed local time).
  */
private[weather] object WxOracles {

  private def fix(file: String): String =
    s"${WeatherEngine.defaultFixtureDir}/$file"

  private def duckType(v: WeatherSchemas.VarSpec): String = v.dataType match {
    case IntegerType => "INTEGER"
    case _           => "DOUBLE"
  }

  private val hourlyStruct: String =
    "STRUCT(\"time\" VARCHAR[], " + WeatherSchemas.hourlyVars
      .map(v => s"${v.name} ${duckType(v)}[]").mkString(", ") + ")"

  private val dailyStruct: String =
    "STRUCT(\"time\" VARCHAR[], " + WeatherSchemas.dailyVars.map { v =>
      val t = v.name match {
        case "sunrise" | "sunset" => "VARCHAR"
        case _                    => duckType(v)
      }
      s"${v.name} $t[]"
    }.mkString(", ") + ")"

  /** Block → wide CTE over an hourly-shaped fixture (hourly or
    * minutely_15 granularity key).
    */
  def wideCte(file: String, cte: String = "wide", gran: String = "hourly"): String = {
    val unnests = WeatherSchemas.hourlyVars
      .map(v => s"    unnest($gran.${v.name}) AS ${v.name}").mkString(",\n")
    s"""$cte AS (
  SELECT latitude, longitude,
    strptime(unnest($gran."time"), '%Y-%m-%dT%H:%M') AS ts_local,
    strptime(unnest($gran."time"), '%Y-%m-%dT%H:%M') - to_seconds(utc_offset_seconds) AS ts_utc,
$unnests
  FROM read_json('${fix(file)}', format='newline_delimited',
    columns={latitude:'DOUBLE', longitude:'DOUBLE', utc_offset_seconds:'INTEGER',
      $gran:'$hourlyStruct'}))"""
  }

  /** Daily block → wide CTE. `parseSun` controls whether sunrise/sunset
    * parse to timestamps (dailyToWide does) or stay raw strings (the
    * connector's daily passthrough does).
    */
  def dailyWideCte(file: String, parseSun: Boolean, cte: String = "dwide"): String = {
    val unnests = WeatherSchemas.dailyVars.map {
      case v if v.name == "weather_code" =>
        s"    CAST(unnest(daily.${v.name}) AS INTEGER) AS ${v.name}"
      case v if (v.name == "sunrise" || v.name == "sunset") && parseSun =>
        s"    strptime(unnest(daily.${v.name}), '%Y-%m-%dT%H:%M') AS ${v.name}"
      case v => s"    unnest(daily.${v.name}) AS ${v.name}"
    }.mkString(",\n")
    s"""$cte AS (
  SELECT latitude, longitude,
    CAST(strptime(unnest(daily."time"), '%Y-%m-%d') AS DATE) AS date,
$unnests
  FROM read_json('${fix(file)}', format='newline_delimited',
    columns={latitude:'DOUBLE', longitude:'DOUBLE', utc_offset_seconds:'INTEGER',
      daily:'$dailyStruct'}))"""
  }

  /** A1–A7 daily rollup aggregation + dominant-code CTEs over `keyed`
    * (wide rows + `date`). Produces CTEs `agg` and `dom`.
    */
  val rollupCtes: String =
    """agg AS (
  SELECT latitude, longitude, date,
    max(temperature_2m) AS temperature_2m_max,
    min(temperature_2m) AS temperature_2m_min,
    max(apparent_temperature) AS apparent_temperature_max,
    min(apparent_temperature) AS apparent_temperature_min,
    round(sum(precipitation), 2) AS precipitation_sum,
    round(sum(rain), 2) AS rain_sum,
    round(sum(snowfall), 2) AS snowfall_sum,
    CAST(sum(CASE WHEN precipitation > 0 THEN 1 ELSE 0 END) * 1.0 AS DOUBLE) AS precipitation_hours,
    round(sum(CASE WHEN shortwave_radiation > 120 THEN 3600.0 ELSE 0.0 END), 1) AS sunshine_duration,
    max(uv_index) AS uv_index_max
  FROM keyed GROUP BY latitude, longitude, date),
dom AS (
  SELECT latitude, longitude, date, weather_code FROM (
    SELECT latitude, longitude, date, weather_code,
      row_number() OVER (PARTITION BY latitude, longitude, date
                         ORDER BY count(*) DESC, weather_code) AS rn
    FROM keyed WHERE weather_code IS NOT NULL
    GROUP BY latitude, longitude, date, weather_code) WHERE rn = 1)"""

  /** Haversine distance in km between two (lat, lon) column refs —
    * textually identical arithmetic to Geo.haversineKm.
    */
  def hav(lat1: String, lon1: String, lat2: String, lon2: String): String =
    s"2 * 6371.0088 * asin(sqrt(pow(sin(radians($lat2 - $lat1) / 2), 2) " +
      s"+ cos(radians($lat1)) * cos(radians($lat2)) * pow(sin(radians($lon2 - $lon1) / 2), 2)))"

  /** Per-variable ML feature block (wx13) mirroring Features.hourlyFeatures. */
  def featBlock(v: String): String = {
    def roll(n: Int) =
      s"""(PARTITION BY latitude, longitude ORDER BY ts_local
        ROWS BETWEEN $n PRECEDING AND CURRENT ROW)"""
    s"""  lag($v, 1) OVER w AS ${v}_lag1h,
  lag($v, 24) OVER w AS ${v}_lag24h,
  $v - lag($v, 1) OVER w AS ${v}_delta1h,
  round(sum($v) OVER ${roll(2)}, 4) / count($v) OVER ${roll(2)} AS ${v}_mean3h,
  round(sum($v) OVER ${roll(23)}, 4) / count($v) OVER ${roll(23)} AS ${v}_mean24h"""
  }

  /** Previous/next non-null value + epoch-second carriers for bounded
    * linear interpolation (wx14), over windows `wp` (preceding) and `wn`
    * (following).
    */
  def lastNext(v: String): String =
    s"""    last_value($v IGNORE NULLS) OVER wp AS pv_$v,
    last_value(CASE WHEN $v IS NOT NULL THEN t END IGNORE NULLS) OVER wp AS pt_$v,
    first_value($v IGNORE NULLS) OVER wn AS nv_$v,
    first_value(CASE WHEN $v IS NOT NULL THEN t END IGNORE NULLS) OVER wn AS nt_$v"""

  /** Bounded interpolation projection for one variable (wx14). */
  def interp(v: String): String =
    s"""  CASE WHEN $v IS NOT NULL THEN $v
       WHEN pv_$v IS NOT NULL AND nv_$v IS NOT NULL AND (nt_$v - pt_$v) <= 21600
       THEN round(pv_$v + (nv_$v - pv_$v) * (t - pt_$v) / (nt_$v - pt_$v), 4)
       END AS $v"""
}
