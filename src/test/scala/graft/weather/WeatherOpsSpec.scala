package graft.weather

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The decisive [SEM] test (SURVEY.md §5 item 3): the native hourly→daily
  * rollup must equal the payload's own daily block for every derivable
  * daily variable (A1–A7), per location and day.
  */
class WeatherOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val blocks =
    WeatherOps.readBlocks(spark, s"${TestSpark.fixtures}/hourly_7d.json")
  private lazy val wide = WeatherOps.toWide(blocks)

  private val derivable = Seq(
    "weather_code", "temperature_2m_max", "temperature_2m_min",
    "apparent_temperature_max", "apparent_temperature_min",
    "precipitation_sum", "rain_sum", "snowfall_sum",
    "precipitation_hours", "sunshine_duration", "uv_index_max")

  test("hourly→daily rollup equals the fixture's daily block (A1–A7)") {
    val rolled = WeatherOps.dailyRollup(wide)
      .select((Seq("latitude", "longitude", "date") ++ derivable).map(col): _*)
    val golden = WeatherOps.dailyToWide(blocks)
      .select((Seq("latitude", "longitude", "date") ++ derivable).map(col): _*)
    assert(rolled.count() === 14) // 2 locations × 7 days
    assert(golden.count() === 14)

    val joined = rolled.as("r").join(golden.as("g"),
      Seq("latitude", "longitude", "date"))
    assert(joined.count() === 14)
    derivable.foreach { v =>
      val mismatches = joined
        .filter(abs(col(s"r.$v") - col(s"g.$v")) > 1e-9)
        .count()
      assert(mismatches === 0, s"daily variable $v diverges from golden block")
    }
  }

  test("wide form has one row per (location, hour)") {
    assert(wide.count() === 2 * 7 * 24)
    assert(wide.columns.contains("ts_local") && wide.columns.contains("ts_utc"))
  }

  test("SC10: ts_utc is local wall-clock minus utc_offset_seconds") {
    val first = wide.orderBy("latitude", "ts_local")
      .select("ts_local", "ts_utc").limit(1).collect()(0)
    // 2024-07-01T00:00 local, offset +7200 s → 2024-06-30T22:00 UTC
    assert(first.getAs[java.time.LocalDateTime]("ts_local").toString
      .startsWith("2024-07-01T00:00"))
    assert(first.getAs[java.sql.Timestamp]("ts_utc").toInstant.toString
      .startsWith("2024-06-30T22:00"))
  }

  test("SC10: ts_utc does not depend on spark.sql.session.timeZone") {
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    def utcInstants(): Seq[String] = WeatherOps.toWide(blocks)
      .orderBy("latitude", "ts_local").limit(5)
      .select(unix_micros(col("ts_utc"))).collect().map(_.getLong(0).toString).toSeq
    try {
      spark.conf.set(tzKey, "UTC")
      val underUtc = utcInstants()
      spark.conf.set(tzKey, "America/New_York")
      assert(utcInstants() === underUtc, "ts_utc shifted with session timezone")
      spark.conf.set(tzKey, "Asia/Tokyo")
      assert(utcInstants() === underUtc, "ts_utc shifted with session timezone")
    } finally spark.conf.set(tzKey, saved)
  }

  test("long form is (location, ts, variable) tidy with 15 vars per hour") {
    val long = WeatherOps.toLong(wide)
    assert(long.count() === 2 * 7 * 24 * 15)
    assert(long.select("variable").distinct().count() === 15)
  }

  test("A9: 15-min → hourly resample preserves extensive sums, averages intensive") {
    val m15 = WeatherOps.toWide(
      WeatherOps.readBlocks(spark, s"${TestSpark.fixtures}/minutely15_2d.json",
        WeatherSchemas.GranMinutely15),
      WeatherSchemas.GranMinutely15)
    val hourly = WeatherOps.resample(m15, "1 hour")
    assert(hourly.count() === 2 * 24) // 2 days × 24 h, one location

    val precTotal15 = m15.agg(sum("precipitation")).collect()(0).getDouble(0)
    val precTotalH = hourly.agg(sum("precipitation")).collect()(0).getDouble(0)
    assert(math.abs(precTotal15 - precTotalH) < 0.05, "sum not preserved")

    // intensive: hourly mean must lie within the 15-min min/max envelope
    val t15 = m15.agg(min("temperature_2m"), max("temperature_2m")).collect()(0)
    val th = hourly.agg(min("temperature_2m"), max("temperature_2m")).collect()(0)
    assert(th.getDouble(0) >= t15.getDouble(0) - 1e-9)
    assert(th.getDouble(1) <= t15.getDouble(1) + 1e-9)
  }

  test("null gaps and DST wall-clock gap survive rollup (edge fixture)") {
    val edge = WeatherOps.readBlocks(spark, s"${TestSpark.fixtures}/edge_dst_nulls.json")
    val w = WeatherOps.toWide(edge)
    // 2 days × 24 h minus the skipped 02:00 on the DST day
    assert(w.count() === 47)
    assert(w.filter(col("temperature_2m").isNull).count() === 3)
    val rolled = WeatherOps.dailyRollup(w)
    assert(rolled.count() === 2)
    // max/min ignore the null hours rather than poisoning the day
    assert(rolled.filter(col("temperature_2m_max").isNull).count() === 0)
  }

  test("interpolateGaps fills bounded null gaps linearly, leaves long gaps null") {
    val edge = WeatherOps.readBlocks(spark, s"${TestSpark.fixtures}/edge_dst_nulls.json")
    val w = WeatherOps.toWide(edge)
    // fixture: temps null at local 03:00–05:00, neighbors 10.82 @01:00
    // and 18.8 @06:00 — a 5 h gap on the single-offset ts_utc axis (the
    // DST hour skipped at 02:00 is NOT visible to a per-block offset)
    val filled = WeatherOps.interpolateGaps(w)
    assert(filled.filter(col("temperature_2m").isNull).count() === 0)
    val got = filled
      .filter(col("ts_local").cast("string").startsWith("2024-03-31 0"))
      .orderBy("ts_local").collect()
      .map(r => r.getAs[java.time.LocalDateTime]("ts_local").getHour ->
        r.getAs[Double]("temperature_2m")).toMap
    assert(math.abs(got(3) - 14.012) < 1e-9, s"03:00 -> ${got(3)}")
    assert(math.abs(got(4) - 15.608) < 1e-9, s"04:00 -> ${got(4)}")
    assert(math.abs(got(5) - 17.204) < 1e-9, s"05:00 -> ${got(5)}")
    // tighter budget than the 5 h gap: stays null
    val strict = WeatherOps.interpolateGaps(w, maxGapSeconds = 3 * 3600L)
    assert(strict.filter(col("temperature_2m").isNull).count() === 3)
    // single shuffle for the whole fill
    val plan = filled.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1,
      s"expected one exchange:\n$plan")
  }

  test("ML feature builder: lags, rolling means, calendar, target") {
    val feats = Features.hourlyFeatures(wide)
    assert(feats.count() === 2 * 7 * 24)
    val cols = feats.columns.toSet
    assert(Seq("temperature_2m_lag1h", "temperature_2m_mean3h",
      "temperature_2m_mean24h", "precipitation_delta1h", "hour_of_day",
      "day_of_week", "target_next_1h").forall(cols.contains))
    // first hour of a location has null lag, last has null target
    val prague = feats.filter(col("latitude") === 50.08).orderBy("ts_local").collect()
    assert(prague.head.isNullAt(prague.head.fieldIndex("temperature_2m_lag1h")))
    assert(prague.last.isNullAt(prague.last.fieldIndex("target_next_1h")))
    // rolling mean at 3rd row = 4-d.p.-rounded running sum / count (the
    // cross-engine-reproducible mean contract — see Features.hourlyFeatures)
    val t = prague.take(3).map(_.getAs[Double]("temperature_2m"))
    val expected = BigDecimal(t.sum).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      .toDouble / 3
    assert(math.abs(prague(2).getAs[Double]("temperature_2m_mean3h") - expected) < 1e-12)
    // single shuffle: one Exchange hashpartitioning in the plan
    val plan = feats.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected one shuffle, plan:\n$plan")
  }
}
