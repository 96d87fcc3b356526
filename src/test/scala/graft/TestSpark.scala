package graft

import org.apache.spark.sql.SparkSession

/** One shared session for all suites (SURVEY.md §5: local, UTC, small
  * shuffle fan-out).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions) // production wiring under test
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sfDir = "/root/testdata/sf0.001"
  val fixtures = "/root/repo/fixtures/weather"
}
