package graft.weather

import org.apache.spark.sql.types._

/** Static catalog of the reference's weather variables — name → Spark
  * type, unit, and aggregation kind — plus builders for the per-request
  * block `StructType` (SURVEY.md §1.2–1.3).
  *
  * Variable universe: the 15 default hourly variables
  * (`server.py:125-130`) and 16 default daily variables
  * (`server.py:131-136`). The payload is columnar (parallel arrays per
  * variable under a granularity key, `server.py:213-225`), with a sibling
  * `*_units` map and scalar location metadata. Schemas are assembled from
  * this catalog per request — never inferred in production paths.
  */
object WeatherSchemas {

  /** How a variable aggregates under time-coarsening (A9):
    * intensive → mean, extensive → sum, coded → mode/max, maxed → max.
    */
  sealed trait Kind
  case object Intensive extends Kind
  case object Extensive extends Kind
  case object Coded     extends Kind

  final case class VarSpec(name: String, dataType: DataType, unit: String, kind: Kind)

  /** Default hourly variables (reference `server.py:125-130`). */
  val hourlyVars: Seq[VarSpec] = Seq(
    VarSpec("temperature_2m", DoubleType, "°C", Intensive),
    VarSpec("relative_humidity_2m", DoubleType, "%", Intensive),
    VarSpec("dew_point_2m", DoubleType, "°C", Intensive),
    VarSpec("apparent_temperature", DoubleType, "°C", Intensive),
    VarSpec("precipitation", DoubleType, "mm", Extensive),
    VarSpec("rain", DoubleType, "mm", Extensive),
    VarSpec("snowfall", DoubleType, "cm", Extensive),
    VarSpec("snow_depth", DoubleType, "m", Intensive),
    VarSpec("weather_code", IntegerType, "wmo code", Coded),
    VarSpec("pressure_msl", DoubleType, "hPa", Intensive),
    VarSpec("cloud_cover", DoubleType, "%", Intensive),
    VarSpec("shortwave_radiation", DoubleType, "W/m²", Intensive),
    VarSpec("direct_radiation", DoubleType, "W/m²", Intensive),
    VarSpec("diffuse_radiation", DoubleType, "W/m²", Intensive),
    VarSpec("uv_index", DoubleType, "", Intensive))

  /** Default daily variables (reference `server.py:131-136`). */
  val dailyVars: Seq[VarSpec] = Seq(
    VarSpec("weather_code", IntegerType, "wmo code", Coded),
    VarSpec("temperature_2m_max", DoubleType, "°C", Intensive),
    VarSpec("temperature_2m_min", DoubleType, "°C", Intensive),
    VarSpec("apparent_temperature_max", DoubleType, "°C", Intensive),
    VarSpec("apparent_temperature_min", DoubleType, "°C", Intensive),
    VarSpec("sunrise", StringType, "iso8601", Coded),
    VarSpec("sunset", StringType, "iso8601", Coded),
    VarSpec("daylight_duration", DoubleType, "s", Intensive),
    VarSpec("sunshine_duration", DoubleType, "s", Extensive),
    VarSpec("precipitation_sum", DoubleType, "mm", Extensive),
    VarSpec("rain_sum", DoubleType, "mm", Extensive),
    VarSpec("snowfall_sum", DoubleType, "cm", Extensive),
    VarSpec("precipitation_hours", DoubleType, "h", Extensive),
    VarSpec("uv_index_max", DoubleType, "", Intensive),
    VarSpec("wind_speed_10m_max", DoubleType, "km/h", Intensive),
    VarSpec("wind_gusts_10m_max", DoubleType, "km/h", Intensive))

  val hourlyByName: Map[String, VarSpec] = hourlyVars.map(v => v.name -> v).toMap
  val dailyByName: Map[String, VarSpec]  = dailyVars.map(v => v.name -> v).toMap

  val defaultHourlyNames: Seq[String] = hourlyVars.map(_.name)
  val defaultDailyNames: Seq[String]  = dailyVars.map(_.name)

  /** Granularity keys as chosen by the reference (`server.py:213-225`). */
  val GranMinutely15 = "minutely_15"
  val GranHourly     = "hourly"
  val GranDaily      = "daily"

  /** Block struct for one granularity key: `time` array + one array per
    * requested variable (element-nullable — the source emits null gaps).
    */
  def seriesStruct(vars: Seq[String], byName: Map[String, VarSpec]): StructType =
    StructType(
      StructField("time", ArrayType(StringType, containsNull = false)) +:
        vars.map { v =>
          val dt = byName.get(v).map(_.dataType).getOrElse(DoubleType)
          StructField(v, ArrayType(dt, containsNull = true))
        })

  /** Full payload schema for a location × request block (§1.3 "block
    * form"): scalar location metadata + granularity struct + units map,
    * optionally with the sibling daily block (`server.py:228-233`).
    */
  def blockSchema(granKey: String, vars: Seq[String],
      withDaily: Boolean = true, dailyNames: Seq[String] = defaultDailyNames): StructType = {
    val byName = if (granKey == GranDaily) dailyByName else hourlyByName
    val base = Seq(
      StructField("latitude", DoubleType),
      StructField("longitude", DoubleType),
      StructField("elevation", DoubleType),
      StructField("timezone", StringType),
      StructField("timezone_abbreviation", StringType),
      StructField("utc_offset_seconds", IntegerType),
      StructField("generationtime_ms", DoubleType),
      StructField(granKey, seriesStruct(vars, byName)),
      StructField(s"${granKey}_units", MapType(StringType, StringType)))
    val daily =
      if (withDaily && granKey != GranDaily)
        Seq(StructField(GranDaily, seriesStruct(dailyNames, dailyByName)),
          StructField(s"${GranDaily}_units", MapType(StringType, StringType)))
      else Seq.empty
    StructType(base ++ daily)
  }
}
