package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps the FINAL adaptive `explain("formatted")` plan of named queries to
  * plans/<tag>/<query>_<suffix>.txt (optimization-round evidence). The query
  * is collect()ed first so the SAME QueryExecution carries the final AQE
  * plan (the CLAUDE.md lesson: a noop write plans a separate execution).
  *
  * Usage: sbt "runMain graft.PlanDump <tag> <suffix> <q1,q2,...> [sfDir]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Paths.get(s"plans/$tag")
    Files.createDirectories(dir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // force execution: final adaptive plan on THIS QueryExecution
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(dir.resolve(s"${name}_$suffix.txt"), txt)
      println(s"[plandump] wrote plans/$tag/${name}_$suffix.txt")
    }
    try spark.stop() catch { case scala.util.control.NonFatal(_) => }
  }
}
