package graft.operators

import graft.TestSpark
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

class BehaviorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("e26 survival curve: KM invariants hold on the sf corpus") {
    val rows = graft.SparkEntry.queries("e26_survival_curve")(
      spark, graft.TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    // at-risk counts strictly decrease, hazards sit in [0, 1], survival
    // is non-increasing and starts from ≤ 1
    val atRisk = rows.map(_.getLong(1))
    assert(atRisk.zip(atRisk.tail).forall { case (a, b) => b < a })
    assert(rows.forall { r =>
      val h = r.getDouble(3); h >= 0.0 && h <= 1.0 })
    val surv = rows.map(_.getDouble(4))
    assert(surv.head <= 1.0 + 1e-9)
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a + 1e-9 })
    // censoring exists: the user anchoring the corpus max ts never churns
    assert(rows.map(r => r.getLong(2)).sum < atRisk.head,
      "every user churned — censoring rule broken")
  }

  test("funnel requires strict step ordering per user") {
    val events = Seq(
      // user 1 completes view → click → purchase in order
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      // user 2 clicked BEFORE viewing; the later click finishes step 2
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "click", ts("2024-01-01 11:00:00")),
      // user 3 purchased before clicking → never reaches step 3
      (3L, "view", ts("2024-01-01 10:00:00")),
      (3L, "purchase", ts("2024-01-01 10:30:00")),
      (3L, "click", ts("2024-01-01 11:00:00")),
      // user 4 never viewed
      (4L, "click", ts("2024-01-01 10:00:00")),
      (4L, "purchase", ts("2024-01-01 11:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Behavior.funnel(events, Seq("view", "click", "purchase"))
      .orderBy("step_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((1, "view", 3L), (2, "click", 3L), (3, "purchase", 1L)))
  }

  test("funnel step times use the first qualifying event, not the first ever") {
    // user 5: view at 10:00, purchase at 10:30 follows the 10:20 click
    // (the 09:00 click precedes the view and must not qualify)
    val events = Seq(
      (5L, "click", ts("2024-01-01 09:00:00")),
      (5L, "view", ts("2024-01-01 10:00:00")),
      (5L, "click", ts("2024-01-01 10:20:00")),
      (5L, "purchase", ts("2024-01-01 10:30:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Behavior.funnel(events, Seq("view", "click", "purchase"))
      .orderBy("step_idx").collect().map(_.getLong(2))
    assert(out.toSeq === Seq(1L, 1L, 1L))
  }

  test("eventTransitions counts consecutive pairs within the gap only") {
    val events = Seq(
      // user 1: view→click (5 min, counts), click→view (25 min, counts),
      // view→purchase (2 h gap — session break, must NOT count)
      (1L, 10L, "view", ts("2024-01-01 10:00:00")),
      (2L, 10L, "click", ts("2024-01-01 10:05:00")),
      (3L, 10L, "view", ts("2024-01-01 10:30:00")),
      (4L, 10L, "purchase", ts("2024-01-01 12:30:00")),
      // user 2: simultaneous events break ties by event_id: 5→6 then 6→7
      (5L, 20L, "view", ts("2024-01-01 09:00:00")),
      (6L, 20L, "view", ts("2024-01-01 09:00:00")),
      (7L, 20L, "click", ts("2024-01-01 09:10:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Behavior.eventTransitions(events, maxGapMinutes = 30)
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("click", "view", 1L), ("view", "click", 2L), ("view", "view", 1L)))
  }

  test("scdIntervals collapses same-state runs into chained validity windows") {
    val events = Seq(
      // user 1: view view click view → 3 runs
      (1L, 10L, "view", ts("2024-01-01 10:00:00")),
      (2L, 10L, "view", ts("2024-01-01 10:05:00")),
      (3L, 10L, "click", ts("2024-01-01 10:10:00")),
      (4L, 10L, "view", ts("2024-01-01 10:20:00")),
      // user 2: a single state → one open-ended interval
      (5L, 20L, "view", ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Behavior.scdIntervals(events)
      .orderBy("user_id", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.get(2).toString, Option(r.get(3)).map(_.toString).orNull))
    assert(out.toSeq === Seq(
      (10L, "view", "2024-01-01T10:00", "2024-01-01T10:10"),
      (10L, "click", "2024-01-01T10:10", "2024-01-01T10:20"),
      (10L, "view", "2024-01-01T10:20", null),
      (20L, "view", "2024-01-01T09:00", null)))
  }

  test("retentionCohorts buckets activity by exact week offsets") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00")),            // Monday: cohort 2024-01-01
      (1L, ts("2024-01-07 23:59:59")),            // 6d23h later → offset 0
      (1L, ts("2024-01-08 00:00:00")),            // exactly 7d → offset 1
      (2L, ts("2024-01-03 12:00:00")),            // same cohort week
      (2L, ts("2024-01-18 12:00:00"))             // 15d → offset 2
    ).toDF("user_id", "ts")
    val out = Behavior.retentionCohorts(events)
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 1L, 1L), ("2024-01-01", 2L, 1L)))
  }

  test("windowed funnel: conversions outside the per-step window don't count") {
    val events = Seq(
      // user 1 converts fully within 10-minute windows
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:12:00")),
      // user 2 clicks 30 min after viewing — outside a 10-minute window
      (2L, "view", ts("2024-01-01 09:00:00")),
      (2L, "click", ts("2024-01-01 09:30:00")),
      (2L, "purchase", ts("2024-01-01 09:31:00"))
    ).toDF("user_id", "event_type", "ts")
    val steps = Seq("view", "click", "purchase")
    val unwindowed = Behavior.funnel(events, steps)
      .orderBy("step_idx").collect().map(_.getLong(2))
    assert(unwindowed.toSeq === Seq(2L, 2L, 2L))
    val windowed = Behavior.funnel(events, steps, maxDelayMinutes = Some(10))
      .orderBy("step_idx").collect().map(_.getLong(2))
    assert(windowed.toSeq === Seq(2L, 1L, 1L))
    // user 2 must also not count at step 3 even though purchase follows
    // click within 10 min — the funnel died at step 2
  }

  test("stateDwell: closed intervals only, exact second sums") {
    val events = Seq(
      (1L, "a", ts("2024-01-01 10:00:00"), 1L),
      (1L, "b", ts("2024-01-01 10:01:30"), 2L), // a dwelt 90 s
      (1L, "a", ts("2024-01-01 10:02:30"), 3L), // b dwelt 60 s; a open
      (2L, "a", ts("2024-01-01 11:00:00"), 4L),
      (2L, "b", ts("2024-01-01 11:00:30"), 5L)  // a dwelt 30 s; b open
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = Behavior.stateDwell(events).orderBy("state").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(("a", 2L, 120L, 60.0), ("b", 1L, 60L, 60.0)))
  }

  test("scdMerge ≡ full recompute: continuation keeps old valid_from, untouched users pass") {
    val old = Seq(
      (1L, "view", ts("2024-01-01 10:00:00"), 1L),
      (1L, "view", ts("2024-01-01 11:00:00"), 2L), // non-change, dropped
      (1L, "click", ts("2024-01-01 12:00:00"), 3L),
      (2L, "view", ts("2024-01-01 09:00:00"), 4L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val batch = Seq(
      (1L, "click", ts("2024-01-02 08:00:00"), 5L), // continues the open run
      (1L, "view", ts("2024-01-02 09:00:00"), 6L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val merged = Behavior.scdMerge(Behavior.scdIntervals(old), batch)
      .orderBy("user_id", "valid_from", "state").collect().map(_.toString)
    val full = Behavior.scdIntervals(old.unionByName(batch))
      .orderBy("user_id", "valid_from", "state").collect().map(_.toString)
    assert(merged.toSeq === full.toSeq)
    // the continued 'click' run must keep its ORIGINAL start (12:00, not
    // the batch's 08:00) — the run-stitch is the merge's hard case
    assert(merged.exists(r => r.contains("click") && r.contains("12:00")))
    assert(merged.count(_.startsWith("[2,")) === 1) // user 2 untouched
  }

  test("rollingActiveUsers: trailing window counts, clipped at the observed max day") {
    import org.apache.spark.sql.functions._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-01 11:00:00"))
    ).toDF("user_id", "ts")
    val out = Behavior.rollingActiveUsers(events, windowDays = 2)
      .orderBy("wday").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    // window=2: day X counts users active on X-1 or X; clipped at Jan 3
    assert(out.toSeq === Seq(
      ("2024-01-01", 2L), ("2024-01-02", 2L), ("2024-01-03", 1L)))
  }

  test("stateDwellCapped: open intervals count up to the cap; explicit caps exclude later opens") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    // u1: a(t0) → b(t100) → open b until cap; u2: c(t50) open until cap
    val ev = Seq(
      (1L, 1L, "a", "2024-01-01 00:00:00"),
      (2L, 1L, "b", "2024-01-01 00:01:40"),
      (3L, 2L, "c", "2024-01-01 00:00:50"))
      .toDF("event_id", "user_id", "event_type", "s")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    // default cap = max(ts) = t100: a closed [0,100)=100s, b open 0s, c open 50s
    val dflt = Behavior.stateDwellCapped(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(dflt === Map("a" -> (1L, 100L), "b" -> (1L, 0L), "c" -> (1L, 50L)))
    // explicit cap at t60: a truncates to [0,60)=60s, b opens at
    // t100 > cap → excluded, c caps at [50,60)=10s
    val capped = Behavior.stateDwellCapped(ev,
        cap = Some(lit("2024-01-01 00:01:00").cast("timestamp"))).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(capped === Map("a" -> (1L, 60L), "c" -> (1L, 10L)))
  }

  test("rollingZAnomalies flags only the injected spike; warm-up and zero-variance guarded") {
    import org.apache.spark.sql.functions._
    // 30 hours of alternating 9/11 counts (baseline mean 10, var 24/23),
    // with hour 25 spiked to 30 → z ≈ 19.6; later hours see the spike in
    // their baseline (large variance) and must NOT flag
    def series(spike: Boolean) = (0 until 30).flatMap { h =>
      val n = if (spike && h == 25) 30 else if (h % 2 == 0) 9 else 11
      Seq.fill(n)(h.toLong)
    }
    def mkDf(spike: Boolean) = series(spike).toDF("h")
      .withColumn("ts", timestamp_seconds(lit(1704067200L) + col("h") * 3600))
      .withColumn("event_type", lit("A"))
    val flagged = Behavior.rollingZAnomalies(mkDf(spike = true)).collect()
    assert(flagged.length === 1)
    val row = flagged.head
    assert(row.getLong(2) === 30L) // cnt
    assert(row.getLong(3) === 24L) // full lookback window
    assert(row.getDouble(4) > 15.0 && row.getDouble(4) < 25.0)

    // without the spike nothing crosses z ≥ 3
    assert(Behavior.rollingZAnomalies(mkDf(spike = false)).isEmpty)

    // constant series: zero variance must be excluded, not NaN/Inf-flagged
    val flat = (0 until 30).flatMap(h => Seq.fill(10)(h.toLong)).toDF("h")
      .withColumn("ts", timestamp_seconds(lit(1704067200L) + col("h") * 3600))
      .withColumn("event_type", lit("B"))
    assert(Behavior.rollingZAnomalies(flat).isEmpty)
  }
}
