package graft.weather

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ML feature preparation over weather series — the reference's stated
  * downstream purpose ("readily usable in downstream Machine Learning
  * pipelines", `README.md:18`). One pass over the wide form producing,
  * per (location, hour):
  *  - lag features (t-1 h, t-24 h) and deltas
  *  - rolling means over 3 h / 24 h windows
  *  - calendar encodings (hour-of-day, day-of-week)
  *  - the supervised target: next-hour temperature
  *
  * Everything is window functions over one (location) partitioning — a
  * single shuffle regardless of how many features are derived, which is
  * the property that matters at 100 TB (naive per-feature self-joins
  * would shuffle once per feature).
  */
object Features {

  def hourlyFeatures(wide: DataFrame,
      valueCols: Seq[String] = Seq("temperature_2m", "precipitation",
        "pressure_msl", "cloud_cover"),
      targetCol: String = "temperature_2m"): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must not be empty")
    require(valueCols.contains(targetCol),
      s"targetCol '$targetCol' must be one of valueCols")
    val byLoc = Window.partitionBy("latitude", "longitude").orderBy("ts_local")
    val roll3 = byLoc.rowsBetween(-2, Window.currentRow)
    val roll24 = byLoc.rowsBetween(-23, Window.currentRow)

    // Rolling means divide a 4-d.p.-rounded running SUM by the non-null
    // count instead of using avg(): source readings carry ≤2 decimals, so
    // the rounded sum is decimal-exact regardless of summation order, and
    // the IEEE quotient of identical dividend/divisor is bit-identical on
    // any engine. Deliberately NO outer round: /24 quotients of 2-d.p.
    // sums land exactly on 4-d.p. halves, where engines' rounding
    // implementations legitimately disagree by one ulp of the decimal.
    def mean(v: String, w: org.apache.spark.sql.expressions.WindowSpec) =
      round(sum(col(v)).over(w), 4) / count(col(v)).over(w)
    val featureCols = valueCols.flatMap { v =>
      Seq(
        lag(col(v), 1).over(byLoc).as(s"${v}_lag1h"),
        lag(col(v), 24).over(byLoc).as(s"${v}_lag24h"),
        (col(v) - lag(col(v), 1).over(byLoc)).as(s"${v}_delta1h"),
        mean(v, roll3).as(s"${v}_mean3h"),
        mean(v, roll24).as(s"${v}_mean24h"))
    }
    wide.select(
      Seq(col("latitude"), col("longitude"), col("ts_local"),
        hour(col("ts_local")).cast("int").as("hour_of_day"),
        dayofweek(col("ts_local")).cast("int").as("day_of_week")) ++
        valueCols.map(col) ++ featureCols :+
        lead(col(targetCol), 1).over(byLoc).as("target_next_1h"): _*)
  }
}
