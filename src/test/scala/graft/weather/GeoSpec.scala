package graft.weather

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** J4 nearest-grid-point join semantics (ADVICE r1): row multiplicity is
  * preserved for identical query rows, and queries with no grid point in
  * range surface as left-join rows with null grid columns.
  */
class GeoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val grid = Seq(
    (50.0, 14.25, "cell_a"),
    (50.0, 14.50, "cell_b"),
    (49.0, 16.50, "cell_c")
  ).toDF("latitude", "longitude", "cell")

  test("each query maps to its nearest cell with bounded distance") {
    val q = Seq((50.07, 14.43), (49.19, 16.61)).toDF("latitude", "longitude")
    val out = Geo.nearestGridPoint(q, grid, maxKm = 100.0)
      .orderBy("latitude").collect()
    assert(out.map(_.getAs[String]("cell")).toSeq === Seq("cell_c", "cell_b"))
    assert(out.forall(_.getAs[Double]("grid_dist_km") < 100.0))
  }

  test("identical query rows keep their multiplicity") {
    val q = Seq((50.07, 14.43), (50.07, 14.43), (50.07, 14.43))
      .toDF("latitude", "longitude")
    val out = Geo.nearestGridPoint(q, grid)
    assert(out.count() === 3, "duplicate query rows collapsed")
    assert(out.select("cell").distinct().collect().map(_.getString(0)).toSeq
      === Seq("cell_b"))
  }

  test("in-box but out-of-radius grid points resolve to null, not a match") {
    // grid point at the box corner: |dlat|≈0.85°(≈95 km), |dlon|≈1.30°
    // (≈91 km at 50°N) — inside the bounding box but haversine ≈131 km
    val cornerGrid = Seq((50.85, 15.73, "corner")).toDF("latitude", "longitude", "cell")
    val q = Seq((50.0, 14.43)).toDF("latitude", "longitude")
    val out = Geo.nearestGridPoint(q, cornerGrid, maxKm = 100.0).collect()(0)
    assert(out.isNullAt(out.fieldIndex("cell")),
      s"out-of-radius corner point matched: $out")
  }

  test("mortonCode: interleaving is monotone per axis and clusters 2-D files") {
    import org.apache.spark.sql.functions.{input_file_name, max => smax, min => smin}
    // synthetic world grid of points
    val pts = (for { la <- -80 to 80 by 4; lo <- -170 to 170 by 4 }
      yield (la.toDouble, lo.toDouble)).toDF("latitude", "longitude")
    // write range-partitioned by the Z-order key: 16 files
    val dir = graft.TestSpark.tempDir("graft_zorder")
    pts.withColumn("z", Geo.mortonCode(col("latitude"), col("longitude")))
      .repartitionByRange(16, col("z"))
      .write.mode("overwrite").parquet(dir)
    // every file's lat AND lon bounding box must be a small fraction of
    // the globe — the property min/max pruning relies on
    val boxes = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((smax("latitude") - smin("latitude")).as("dlat"),
        (smax("longitude") - smin("longitude")).as("dlon"))
      .collect()
    assert(boxes.length >= 8)
    val avgArea = boxes.map(r => r.getDouble(1) * r.getDouble(2)).sum / boxes.length
    val worldArea = 160.0 * 340.0
    assert(avgArea < worldArea / 4,
      f"files not spatially clustered: avg bbox $avgArea%.0f vs world $worldArea%.0f")
  }

  test("queries with no grid point within maxKm surface with null grid columns") {
    val q = Seq((50.07, 14.43), (-33.86, 151.21)).toDF("latitude", "longitude")
    val out = Geo.nearestGridPoint(q, grid, maxKm = 100.0)
    assert(out.count() === 2, "unmatched query row dropped")
    val sydney = out.filter(col("latitude") < 0).collect()(0)
    assert(sydney.isNullAt(sydney.fieldIndex("cell")))
    assert(sydney.isNullAt(sydney.fieldIndex("grid_dist_km")))
    val prague = out.filter(col("latitude") > 0).collect()(0)
    assert(prague.getAs[String]("cell") === "cell_b")
  }
}
