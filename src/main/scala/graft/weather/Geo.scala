package graft.weather

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Geospatial helpers: the geocode lookup join (J1, the reference's
  * Nominatim lookup `server.py:96-119` re-expressed as a broadcast join
  * against a places dimension) and the nearest-grid-point join (J4 —
  * Open-Meteo resolves coordinates to its model grid, `WetIng.pdf` p.1).
  */
object Geo {

  /** Great-circle distance in km (haversine; all built-in math — SC9). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * 6371.0088) * asin(sqrt(a))
  }

  /** J1: resolve place names to coordinates via a broadcast lookup join.
    * Mirrors `exactly_one=True` (`server.py:110`): names matching zero or
    * more than one dimension row resolve to null coordinates with a
    * diagnostic `geocode_matches` count, so callers can fail fast the way
    * the reference's error envelope does (`server.py:112-114`).
    */
  def geocodeJoin(requests: DataFrame, places: DataFrame,
      placeCol: String = "place"): DataFrame = {
    val counted = places.groupBy(col(placeCol)).agg(
      count(lit(1)).as("geocode_matches"),
      min(struct(col("latitude"), col("longitude"))).as("best"))
    requests
      .join(broadcast(counted), Seq(placeCol), "left")
      .withColumn("geocode_matches", coalesce(col("geocode_matches"), lit(0L)))
      .withColumn("resolved_latitude",
        when(col("geocode_matches") === 1, col("best.latitude")))
      .withColumn("resolved_longitude",
        when(col("geocode_matches") === 1, col("best.longitude")))
      .drop("best")
  }

  /** Morton (Z-order) code of a (lat, lon) point at `bits` bits per axis:
    * interleaves the quantized axes so points close on the curve are
    * close in BOTH dimensions. Sorting/range-partitioning a geo table by
    * this key before writing gives every parquet file a compact lat AND
    * lon bounding box, so min/max row-group statistics prune 2-D box
    * queries — the standard Z-order data-layout trick (Delta/Iceberg
    * OPTIMIZE ZORDER), here as a plain column expression. The bit
    * interleave itself is the generic [[graft.operators.Scale.zValue]]
    * (lon on the even positions, lat on the odd — same curve as the
    * original fold); this wrapper only owns the degree quantization.
    */
  def mortonCode(lat: Column, lon: Column, bits: Int = 12): Column = {
    val scaleMax = (1L << bits) - 1
    val qLat = least(floor((lat + 90.0) / 180.0 * (1L << bits)),
      lit(scaleMax)).cast("long")
    val qLon = least(floor((lon + 180.0) / 360.0 * (1L << bits)),
      lit(scaleMax)).cast("long")
    graft.operators.Scale.zValue(qLon, qLat, bits)
  }

  /** J4: map each query point to the nearest grid point. The grid side is
    * small (model grid cells for the region of interest) → broadcast;
    * candidate pruning by a bounding box of `maxKm` before the exact
    * haversine ranking, so the nested-loop join touches a constant-size
    * neighborhood per query row instead of the full grid.
    */
  def nearestGridPoint(queries: DataFrame, grid: DataFrame, maxKm: Double = 100.0): DataFrame = {
    val degTol = maxKm / 111.0 // 1° latitude ≈ 111 km
    val g = broadcast(grid.select(
      Seq(col("latitude").as("g_lat"), col("longitude").as("g_lon")) ++
        grid.columns.filterNot(c => c == "latitude" || c == "longitude")
          .map(col): _*))
    // Longitude degrees shrink by cos(lat): widen the box accordingly
    // (clamped near the poles) and wrap the difference across the
    // antimeridian so ±180° neighbors stay candidates.
    // near the poles cos(lat)→0 and any longitude can be within maxKm:
    // let the tolerance grow to the full 180° instead of clamping it
    val lonTol = least(
      lit(degTol) / greatest(cos(radians(col("latitude"))), lit(1e-6)),
      lit(180.0))
    val lonDiff = abs(col("g_lon") - col("longitude"))
    val lonDist = least(lonDiff, lit(360.0) - lonDiff)
    // Unique row id on the query side: identical query rows keep their
    // multiplicity (the window dedups per input ROW, not per value), and a
    // left join surfaces queries with no grid point within maxKm as rows
    // with null grid columns instead of silently dropping them.
    val keyed = queries.withColumn("__qid", monotonically_increasing_id())
    // the box prune admits corners up to ~sqrt(2)*maxKm: the exact radial
    // bound must ALSO be part of the join condition, so an in-box but
    // out-of-range point resolves to the null (unmatched) row, not a match
    val joined = keyed.join(g,
      (abs(col("g_lat") - col("latitude")) <= degTol) && (lonDist <= lonTol) &&
        (haversineKm(col("latitude"), col("longitude"),
          col("g_lat"), col("g_lon")) <= maxKm),
      "left")
    val w = Window.partitionBy(col("__qid"))
      .orderBy(haversineKm(col("latitude"), col("longitude"),
        col("g_lat"), col("g_lon")).asc_nulls_last, col("g_lat"), col("g_lon"))
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__qid")
      .withColumn("grid_dist_km",
        round(haversineKm(col("latitude"), col("longitude"),
          col("g_lat"), col("g_lon")), 3))
  }
}
