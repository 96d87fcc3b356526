package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.8). The reference is
  * request/response-only, but its source refreshes every 15 minutes
  * (`WetIng.pdf` p.2): a forecast for valid-hour H is re-published many
  * times until H arrives. That makes the streaming model two-axis:
  * event time = forecast *valid* time, revision time = *issue* time.
  * Correctness rule: keep the record with the maximum issue time per
  * (location, valid time); watermark on issue time because lateness is a
  * property of publication, not of the forecast horizon.
  */
object WeatherStreams {

  /** One streamed forecast revision: a (location, valid-hour) observation
    * re-published at `issued_at`.
    */
  final case class Revision(
      latitude: Double, longitude: Double,
      ts_valid: java.sql.Timestamp, issued_at: java.sql.Timestamp,
      temperature_2m: Double, precipitation: Double)

  /** File-drop ingest of block payloads (S8): the streaming twin of
    * `WeatherOps.readBlocks` — same explicit schema, never inference.
    */
  def readBlockStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(graft.weather.WeatherSchemas.blockSchema(
        graft.weather.WeatherSchemas.GranHourly,
        graft.weather.WeatherSchemas.defaultHourlyNames))
      .json(dir)

  /** Upsert of revised forecasts: for each (location, valid hour) keep the
    * revision with the greatest `issued_at`, emitting an update whenever a
    * strictly newer revision arrives (stale ones are dropped — late data
    * is *expected* here). `flatMapGroupsWithState` in Update mode; state
    * is one record per live key and is freed by watermark-driven timeout
    * once the valid hour has long passed.
    */
  def latestRevisions(revisions: Dataset[Revision]): Dataset[Revision] = {
    import revisions.sparkSession.implicits._
    revisions
      .withWatermark("issued_at", "2 hours")
      .groupByKey(r => (r.latitude, r.longitude, r.ts_valid.getTime))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (_: (Double, Double, Long), rows: Iterator[Revision],
         state: GroupState[Revision]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val newest = rows.reduceOption((a, b) =>
              if (a.issued_at.after(b.issued_at)) a else b)
            val current = state.getOption
            val winner = (current ++ newest).reduceOption((a, b) =>
              if (a.issued_at.after(b.issued_at)) a else b)
            winner.foreach { w =>
              state.update(w)
              state.setTimeoutTimestamp(w.issued_at.getTime + 4 * 3600 * 1000L)
            }
            if (winner != current) winner.iterator else Iterator.empty
          }
        })
  }

  /** [[latestRevisions]] re-expressed on Spark 4's arbitrary-state API
    * ([[org.apache.spark.sql.streaming.StatefulProcessor]] via
    * `transformWithState`): same key, same strictly-newer-wins upsert
    * contract, same event-time state expiry — a named [[ValueState]]
    * replaces `GroupState` and an explicit per-key timer replaces
    * `setTimeoutTimestamp`. Kept alongside the fMGWS path as its
    * forward-compatibility twin (the two are parity-tested and share
    * st1's oracle as st13); requires the RocksDB state store provider,
    * which the new API is built against.
    */
  def latestRevisionsTws(revisions: Dataset[Revision]): Dataset[Revision] = {
    import org.apache.spark.sql.streaming.TimeMode
    import revisions.sparkSession.implicits._
    revisions
      .withWatermark("issued_at", "2 hours")
      .groupByKey(r => (r.latitude, r.longitude, r.ts_valid.getTime))
      .transformWithState(new LatestRevisionProcessor,
        TimeMode.EventTime(), OutputMode.Update())
  }

  /** The transformWithState processor behind [[latestRevisionsTws]]:
    * keep-max-issued_at per (location, valid hour), emitting only strict
    * improvements. One live timer per key tracks the CURRENT winner's
    * expiry (issue time + 4 h): timers are additive — unlike
    * `GroupState.setTimeoutTimestamp`, which overwrites — so the
    * superseded expiry is deleted before the new one registers, and a
    * firing timer therefore always refers to the live winner.
    */
  private class LatestRevisionProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        (Double, Double, Long), Revision, Revision] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode,
      TimerValues, TTLConfig, ValueState}

    @transient private var latest: ValueState[Revision] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState("latest",
        org.apache.spark.sql.Encoders.product[Revision], TTLConfig.NONE)

    private def expiry(r: Revision): Long =
      r.issued_at.getTime + 4 * 3600 * 1000L

    override def handleInputRows(key: (Double, Double, Long),
        rows: Iterator[Revision], timers: TimerValues): Iterator[Revision] = {
      val newest = rows.reduceOption((a, b) =>
        if (a.issued_at.after(b.issued_at)) a else b)
      val current = if (latest.exists()) Some(latest.get()) else None
      val winner = (current ++ newest).reduceOption((a, b) =>
        if (a.issued_at.after(b.issued_at)) a else b)
      if (winner != current) {
        val w = winner.get
        current.foreach(c => getHandle.deleteTimer(expiry(c)))
        latest.update(w)
        getHandle.registerTimer(expiry(w))
        Iterator.single(w)
      } else Iterator.empty
    }

    override def handleExpiredTimer(key: (Double, Double, Long),
        timers: TimerValues, expired: ExpiredTimerInfo): Iterator[Revision] = {
      // defensive: only free state the fired timer actually covers
      if (latest.exists() && expiry(latest.get()) <= expired.getExpiryTimeInMs())
        latest.clear()
      Iterator.empty
    }
  }

  /** Exactly-once-per-revision dedup within the lateness horizon
    * (`dropDuplicatesWithinWatermark`): duplicate deliveries of the same
    * (location, valid, issued) revision collapse to one.
    */
  def dedupRevisions(revisions: Dataset[Revision]): Dataset[Revision] =
    revisions
      .withWatermark("issued_at", "2 hours")
      .dropDuplicatesWithinWatermark(
        "latitude", "longitude", "ts_valid", "issued_at")

  /** Tumbling/sliding windowed aggregation with late-data handling: mean
    * temperature and precipitation sum per location per window of valid
    * time. Watermark bounds state; slide defaults to tumbling.
    */
  def windowedMeans(revisions: Dataset[Revision], win: String = "1 hour",
      slide: Option[String] = None, watermark: String = "2 hours"): DataFrame = {
    val w = slide.map(s => window(col("ts_valid"), win, s))
      .getOrElse(window(col("ts_valid"), win))
    revisions
      .withWatermark("ts_valid", watermark)
      .groupBy(col("latitude"), col("longitude"), w.as("win"))
      .agg(avg("temperature_2m").as("temp_mean"),
        sum("precipitation").as("precip_sum"),
        count(lit(1)).as("n_obs"))
      .select(col("latitude"), col("longitude"),
        col("win.start").as("ts"), col("temp_mean"), col("precip_sum"), col("n_obs"))
  }

  /** Session windows over a generic event stream (gap-based
    * sessionization, §2.8): one row per (user, session) with bounds and
    * event count.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sess"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("user_id"), col("sess.start").as("session_start"),
        col("sess.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Batch-side upsert merge for `foreachBatch` sinks: merge a micro-batch
    * of revisions into a keyed table keeping max `issued_at` (the
    * idempotent-writer pattern for exactly-once upsert sinks).
    */
  def mergeBatch(existing: DataFrame, batch: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val unioned = existing.unionByName(batch)
    val w = Window.partitionBy("latitude", "longitude", "ts_valid")
      .orderBy(col("issued_at").desc)
    unioned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** An actual measurement arriving from a station/sensor stream. */
  final case class Observation(
      latitude: Double, longitude: Double,
      obs_ts: java.sql.Timestamp, observed_temp: Double)

  /** Stream-stream interval join (§2.8): pair each observation with the
    * forecast(s) for the valid hour it falls in, at the same location —
    * the forecast-accuracy stream (`README.md:18`'s "forecasts and
    * actuals" in one record). Both sides carry watermarks so Spark can
    * bound the join state: a forecast row is held only until the
    * watermark passes its valid hour + the join interval; observations
    * symmetrically. Inner join ⇒ append-mode output.
    *
    * REVISION CONTRACT: a valid hour is re-published every ~15 min, and
    * an append-mode stream-stream join cannot consult "the latest
    * revision so far" (that needs mutable state the join doesn't have) —
    * so every matching revision emits a row, tagged with `issued_at`.
    * Downstream pick the policy: max-`issued_at` per (location, hour,
    * obs) in a `foreachBatch` merge ([[mergeBatch]]), or per-lead-time
    * accuracy curves using (`ts_valid` − `issued_at`) directly — the
    * revision axis is analytic signal, not noise.
    */
  def forecastVsObserved(forecasts: Dataset[Revision],
      observations: Dataset[Observation]): DataFrame = {
    val f = forecasts.toDF().withWatermark("ts_valid", "2 hours")
      .select(col("latitude").as("f_lat"), col("longitude").as("f_lon"),
        col("ts_valid"), col("issued_at"),
        col("temperature_2m").as("forecast_temp"))
    val o = observations.toDF().withWatermark("obs_ts", "2 hours")
    o.join(f,
      col("f_lat") === col("latitude") && col("f_lon") === col("longitude") &&
        col("obs_ts") >= col("ts_valid") &&
        col("obs_ts") < col("ts_valid") + expr("INTERVAL 1 HOUR"))
      .select(col("latitude"), col("longitude"), col("ts_valid"),
        col("issued_at"), col("obs_ts"), col("forecast_temp"),
        col("observed_temp"),
        round(col("observed_temp") - col("forecast_temp"), 4).as("error"))
  }
}
