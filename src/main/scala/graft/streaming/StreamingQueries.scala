package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming probes under the driver's CORRECTNESS gate (SURVEY.md §2.8).
  *
  * The streaming family was ScalaTest-only through round 4 — these probes
  * put the REAL Structured Streaming machinery (file-drop source →
  * stateful operator → sink) behind a deterministic batch replay so the
  * DuckDB oracle can check the outcome: the stream input derives from the
  * `events` table, the file-drop is replayed with `Trigger.AvailableNow`,
  * and the upsert winner per key is unique by construction (revisions are
  * pre-deduplicated per (key, issued_at), so max-`issued_at` has no ties
  * and the outcome is independent of micro-batch boundaries).
  */
object StreamingQueries {

  private val runSeq = new AtomicLong(0)

  /** The deterministic revision feed: events replayed as forecast
    * revisions. latitude buckets the users, the valid hour is the event
    * hour, and the event timestamp is the issue time; value collisions
    * within one (key, issued_at) collapse to max(value) so the winning
    * revision is unique. Mirrored 1:1 by the oracle's `rev` CTE.
    */
  private def revisionFeed(ev: DataFrame): DataFrame =
    ev.groupBy(
        (col("user_id") % 3).cast("double").as("latitude"),
        lit(10.0).as("longitude"),
        date_trunc("hour", col("ts")).as("ts_valid"),
        col("ts").as("issued_at"))
      .agg(max("value").as("temperature_2m"))
      .withColumn("precipitation", lit(0.0))

  def defs: Map[String, QueryDef] = Map(
    // Revision upsert through the live stream path: write the feed to a
    // drop directory, run readStream → latestRevisions
    // (flatMapGroupsWithState, Update mode) → memory sink to completion,
    // then reduce the emitted updates to the final winner per key. The
    // update stream may emit intermediate winners (one per micro-batch
    // that improves a key), but the LAST winner is the global
    // max-issued_at revision regardless of batching — which is exactly
    // what the oracle computes relationally.
    "st1_stream_upsert" -> QueryDef.sql(
      """WITH rev AS (
        |  SELECT CAST(user_id % 3 AS DOUBLE) AS latitude, 10.0 AS longitude,
        |         date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ts_valid,
        |         CAST(ts AS TIMESTAMP) AS issued_at,
        |         max(value) AS temperature_2m
        |  FROM events GROUP BY 1, 2, 3, 4),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |      PARTITION BY latitude, longitude, ts_valid
        |      ORDER BY issued_at DESC) AS rn
        |  FROM rev)
        |SELECT latitude, longitude, ts_valid, issued_at,
        |       round(temperature_2m, 2) AS temperature
        |FROM ranked WHERE rn = 1
        |ORDER BY latitude, longitude, ts_valid""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val feed = revisionFeed(Tables.events(s, d))

      val dropDir = Files.createTempDirectory("graft_st1_drop").toString
      val ckDir = Files.createTempDirectory("graft_st1_ck").toString
      // several files so the drop directory looks like a real feed (all
      // are still one AvailableNow batch; the outcome is batch-agnostic)
      // default JSON timestampFormat is millisecond-precision; the events
      // timestamps carry microseconds, so spell the format out on BOTH
      // sides of the drop or the replay silently truncates issue times
      val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
      feed.repartition(4).write.mode("overwrite")
        .option("timestampFormat", tsFmt).json(dropDir)

      val schema = implicitly[org.apache.spark.sql.Encoder[WeatherStreams.Revision]].schema
      val stream = s.readStream.schema(schema)
        .option("timestampFormat", tsFmt).json(dropDir)
        .as[WeatherStreams.Revision]
      val sinkName = s"graft_st1_sink_${runSeq.incrementAndGet()}"
      // The stateful operator allocates one state-store instance per
      // shuffle partition at checkpoint creation; at probe scale 32 of
      // them are pure task/HDFS-state overhead. Pin the STREAM's state
      // partitioning to 8 (a per-checkpoint property, restored after
      // start so batch queries keep the session default). At cluster
      // scale this knob goes UP with key cardinality instead.
      val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val q = WeatherStreams.latestRevisions(stream)
          .writeStream.format("memory").queryName(sinkName)
          .outputMode("update")
          .option("checkpointLocation", ckDir)
          .trigger(Trigger.AvailableNow())
          .start()
        // restore only after termination: micro-batch planning reads the
        // conf asynchronously after start(), so an earlier restore races
        q.awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)

      val w = Window.partitionBy("latitude", "longitude", "ts_valid")
        .orderBy(col("issued_at").desc)
      s.table(sinkName)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("latitude"), col("longitude"), col("ts_valid"),
          col("issued_at"), round(col("temperature_2m"), 2).as("temperature"))
        .orderBy("latitude", "longitude", "ts_valid")
    })
}
