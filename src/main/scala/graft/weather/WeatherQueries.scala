package graft.weather

import graft.QueryDef
import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** Weather-path probe queries (SURVEY.md §2.1–2.4, §3.4) over the payload
  * fixtures. These exercise the [REF]/[SEM] surface — block→wide→long
  * conversion, daily rollup, resampling, geocode/nearest-grid joins, the
  * dual projection, and the as-of alignment join. No DuckDB oracle (the
  * fixture JSON is not among the oracle's tables): the driver records
  * rows-only checks here, and the golden equivalences live in ScalaTest
  * (hourly→daily rollup ≡ the fixture's own daily block).
  */
object WeatherQueries {

  private def engine(s: org.apache.spark.sql.SparkSession) = new WeatherEngine(s)

  private val prague = Location(Some("Prague"), None, None)

  def defs: Map[String, QueryDef] = Map(
    // [SEM] A1–A7: native daily rollup from hourly, granularity ≥1440 path
    "wx1_daily_rollup" -> QueryDef.noOracle { (s, _) =>
      engine(s).forecast(ForecastRequest(prague, granularity = 1440,
        forecastDays = Some(7), pastDays = Some(2)))
        .fold(e => sys.error(e), identity)
        .orderBy("date")
    },

    // A9: 15-minute → hourly resample
    "wx2_resample_hourly" -> QueryDef.noOracle { (s, _) =>
      val wide = WeatherOps.toWide(
        WeatherOps.readBlocks(s, s"${WeatherEngine.defaultFixtureDir}/minutely15_2d.json",
          WeatherSchemas.GranMinutely15),
        WeatherSchemas.GranMinutely15)
      WeatherOps.resample(wide, "1 hour").orderBy("ts_local")
    },

    // §1.3 long (tidy) form — the downstream-ML layout (README.md:18)
    "wx3_long_form" -> QueryDef.noOracle { (s, _) =>
      val wide = WeatherOps.toWide(
        WeatherOps.readBlocks(s, s"${WeatherEngine.defaultFixtureDir}/hourly_7d.json"))
      WeatherOps.toLong(wide).orderBy("latitude", "ts_local", "variable")
    },

    // J1: geocode lookup join incl. missing + ambiguous names
    "wx4_geocode_join" -> QueryDef.noOracle { (s, _) =>
      import s.implicits._
      val requests = Seq("Prague", "Brno", "Atlantis", "Springfield")
        .toDF("place")
      Geo.geocodeJoin(requests, engine(s).places).orderBy("place")
    },

    // J4: nearest-grid-point theta join, bounding-box pruned
    "wx5_nearest_grid" -> QueryDef.noOracle { (s, _) =>
      import s.implicits._
      val queryPoints = Seq((50.0, 14.5), (49.3, 16.5), (49.9, 18.0))
        .toDF("latitude", "longitude")
      Geo.nearestGridPoint(queryPoints,
        engine(s).places.select("place", "latitude", "longitude"))
        .orderBy("latitude")
    },

    // §2.5 flagship: rolling 3-hour mean temperature per location
    "wx6_rolling_3h" -> QueryDef.noOracle { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      val wide = WeatherOps.toWide(
        WeatherOps.readBlocks(s, s"${WeatherEngine.defaultFixtureDir}/hourly_7d.json"))
      val w = Window.partitionBy("latitude", "longitude").orderBy("ts_local")
        .rowsBetween(-2, Window.currentRow)
      wide.select(col("latitude"), col("longitude"), col("ts_local"),
          col("temperature_2m"),
          round(avg("temperature_2m").over(w), 4).as("temp_3h_mean"))
        .orderBy("latitude", "ts_local")
    },

    // get_history daily path over the 31-day archive block
    "wx7_history_daily" -> QueryDef.noOracle { (s, _) =>
      engine(s).history(HistoryRequest(prague, "2024-05-05", "2024-05-20",
        granularity = 1440))
        .fold(e => sys.error(e), identity)
        .orderBy("date")
    },

    // P2/J2: hourly series enriched with daily rollup values
    "wx8_hourly_with_daily" -> QueryDef.noOracle { (s, _) =>
      engine(s).hourlyWithDaily(ForecastRequest(prague,
        forecastDays = Some(7), pastDays = Some(2)))
        .fold(e => sys.error(e), identity)
        .orderBy("ts_local")
    },

    // S1/S2: DataSource V2 connector path — projection + ts-range pushdown
    // reach the scan (asserted in OpenMeteoSourceSpec via the plan text)
    "wx10_connector_scan" -> QueryDef.noOracle { (s, _) =>
      s.read.format("openmeteo")
        .option("path", s"${WeatherEngine.defaultFixtureDir}/hourly_7d.json")
        .load()
        .filter(col("ts_local") >= lit("2024-07-02 00:00:00").cast("timestamp_ntz"))
        .select("latitude", "longitude", "ts_local", "temperature_2m", "precipitation")
        .orderBy("latitude", "ts_local")
    },

    // Connector daily rollup: pushed scan feeding the native A1-A7 agg
    "wx11_connector_rollup" -> QueryDef.noOracle { (s, _) =>
      val wide = s.read.format("openmeteo")
        .option("path", s"${WeatherEngine.defaultFixtureDir}/hourly_7d.json")
        .load()
      WeatherOps.dailyRollup(wide).orderBy("latitude", "date")
    },

    // ML feature prep (README.md:18): lags + rolling means + calendar +
    // next-hour target in one shuffle
    "wx13_ml_features" -> QueryDef.noOracle { (s, _) =>
      val wide = WeatherOps.toWide(
        WeatherOps.readBlocks(s, s"${WeatherEngine.defaultFixtureDir}/hourly_7d.json"))
      Features.hourlyFeatures(wide).orderBy("latitude", "ts_local")
    },

    // forecast-vs-actuals accuracy (batch twin of the stream-stream
    // interval join): hourly forecasts ⋈ 15-min observations equi on
    // (location, hour) — per-day MAE/bias of the temperature forecast
    "wx15_forecast_accuracy" -> QueryDef.noOracle { (s, _) =>
      val forecasts = WeatherOps.toWide(WeatherOps.readBlocks(s,
        s"${WeatherEngine.defaultFixtureDir}/hourly_7d.json"))
        .select(col("latitude"), col("longitude"),
          col("ts_local").as("hour"), col("temperature_2m").as("forecast_temp"))
      val observed = WeatherOps.toWide(
        WeatherOps.readBlocks(s,
          s"${WeatherEngine.defaultFixtureDir}/minutely15_2d.json",
          WeatherSchemas.GranMinutely15),
        WeatherSchemas.GranMinutely15)
        .select(col("latitude"), col("longitude"),
          date_trunc("hour", col("ts_local")).cast("timestamp_ntz").as("hour"),
          col("temperature_2m").as("observed_temp"))
      observed.join(forecasts, Seq("latitude", "longitude", "hour"))
        .groupBy(col("latitude"), col("longitude"),
          to_date(col("hour")).as("date"))
        .agg(round(avg(abs(col("observed_temp") - col("forecast_temp"))), 4)
            .as("mae"),
          round(avg(col("observed_temp") - col("forecast_temp")), 4).as("bias"),
          count(lit(1)).as("n_obs"))
        .orderBy("latitude", "date")
    },

    // gap filling: bounded linear interpolation of intensive variables
    "wx14_interpolate" -> QueryDef.noOracle { (s, _) =>
      val wide = WeatherOps.toWide(WeatherOps.readBlocks(s,
        s"${WeatherEngine.defaultFixtureDir}/edge_dst_nulls.json"))
      WeatherOps.interpolateGaps(wide)
        .select("latitude", "longitude", "ts_local", "temperature_2m",
          "relative_humidity_2m", "precipitation")
        .orderBy("latitude", "ts_local")
    },

    // §4 aggregate pushdown path: the source's pre-aggregated daily block
    "wx12_connector_daily" -> QueryDef.noOracle { (s, _) =>
      s.read.format("openmeteo")
        .option("path", s"${WeatherEngine.defaultFixtureDir}/hourly_7d.json")
        .option("granularity", "daily")
        .load()
        .select("latitude", "longitude", "date", "temperature_2m_max",
          "precipitation_sum", "weather_code", "sunrise")
        .orderBy("latitude", "date")
    },

    // J3 generic as-of: probe points 30 min past each hour joined to the
    // latest at-or-earlier weather observation
    "wx9_asof_weather" -> QueryDef.noOracle { (s, _) =>
      val wide = WeatherOps.toWide(
        WeatherOps.readBlocks(s, s"${WeatherEngine.defaultFixtureDir}/hourly_7d.json"))
        .select("latitude", "longitude", "ts_local", "temperature_2m", "precipitation")
      val probes = wide.select(col("latitude"), col("longitude"),
        (col("ts_local") + expr("INTERVAL 30 MINUTES")).as("ts_local"))
      AsOf.asofJoin(probes, wide, Seq("latitude", "longitude"), "ts_local",
        Seq("temperature_2m", "precipitation"))
        .orderBy("latitude", "ts_local")
    }
  )
}
