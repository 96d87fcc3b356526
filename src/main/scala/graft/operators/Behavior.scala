package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral-analytics operators over the event stream: ordered funnel
  * conversion and weekly retention cohorts — the two classic
  * product-analytics shapes (each step/cohort is a filter + keyed min
  * aggregation; no sessionization state needed).
  *
  * Scale notes: every stage is an equi join + hash agg on the user key,
  * so successive stages reuse the same hash partitioning (Catalyst
  * collapses the exchanges); event text/props never enter the shuffles —
  * only (user, ts) pairs. Week arithmetic is integer division of
  * microsecond epochs (exact in both engines, no FP floor hazard).
  */
object Behavior {

  /** Ordered funnel: users whose FIRST occurrence of each step strictly
    * follows their qualifying occurrence of the previous step (step i is
    * counted at the earliest event of type `steps(i)` after the step
    * i−1 time). Returns one row per step: (step_idx, step, users) —
    * monotonically non-increasing by construction.
    */
  def funnel(events: DataFrame, steps: Seq[String], userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      maxDelayMinutes: Option[Int] = None): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(maxDelayMinutes.forall(_ > 0), "maxDelayMinutes must be positive")
    val stepTimes = steps.zipWithIndex.drop(1).foldLeft(
      events.filter(col(typeCol) === steps.head)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))) {
      case (wide, (step, i)) =>
        // windowed variant: the qualifying step-i event must land within
        // maxDelay of the step-(i−1) time (per-step window, the standard
        // conversion-window contract), not merely after it
        val within = maxDelayMinutes.map(m =>
          col(tsCol) <= col(s"t$i") + expr(s"INTERVAL $m MINUTES"))
          .getOrElse(lit(true))
        val next = events.filter(col(typeCol) === step)
          .select(col(userCol), col(tsCol))
          .join(wide.select(col(userCol), col(s"t$i")), Seq(userCol))
          .filter(col(tsCol) > col(s"t$i") && within)
          .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t${i + 1}"))
        wide.join(next, Seq(userCol), "left")
    }
    val counts = stepTimes.agg(
      count(col("t1")).as("c1"),
      steps.indices.drop(1).map(i => count(col(s"t${i + 1}")).as(s"c${i + 1}")): _*)
    val stages = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i + 1).as("step_idx"), lit(step).as("step"),
        col(s"c${i + 1}").as("users"))
    }
    counts.select(explode(array(stages: _*)).as("s"))
      .select(col("s.step_idx").cast("int").as("step_idx"),
        col("s.step").as("step"), col("s.users").cast("long").as("users"))
  }

  /** Weekly retention cohorts: users grouped by the ISO week of their
    * first event; for every (cohort_week, week_offset) the count of
    * cohort users active that week. week_offset is the integer division
    * of the microsecond gap since the user's first event by one week —
    * exact integer arithmetic, identical across engines. Returns
    * (cohort_week DATE, week_offset, users).
    */
  def retentionCohorts(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val first = events.groupBy(col(userCol)).agg(min(col(tsCol)).as("__t0"))
    events.select(col(userCol), col(tsCol))
      .join(first, Seq(userCol))
      .select(col(userCol),
        to_date(date_trunc("week", col("__t0"))).as("cohort_week"), {
          // integer floor-division without FP: (d − d mod w) / w is an
          // exact multiple, so the double quotient is exact
          val d = unix_micros(col(tsCol)) - unix_micros(col("__t0"))
          val w = lit(604800000000L)
          ((d - pmod(d, w)) / w).cast("long").as("week_offset")
        })
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(userCol)).cast("long").as("users"))
  }

  /** Session transition matrix (first-order Markov counts): for every
    * consecutive event pair of a user within `maxGapMinutes` — the same
    * gap rule as the a17 sessionizer, so a "transition" never crosses a
    * session boundary — the global count of (from_type → to_type). One
    * window over the user key (payload is just type + timestamp; the
    * props column never enters the shuffle), then a tiny hash agg on the
    * type pair: at 100 TB the shuffle is one pass of (user, type, ts)
    * and the result is |types|² rows.
    */
  def eventTransitions(events: DataFrame, maxGapMinutes: Int = 30,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events.select(col(userCol), col(typeCol), col(tsCol), col(idCol))
      .withColumn("__next_type", lead(col(typeCol), 1).over(w))
      .withColumn("__gap_us",
        unix_micros(lead(col(tsCol), 1).over(w)) - unix_micros(col(tsCol)))
      .filter(col("__next_type").isNotNull &&
        col("__gap_us") <= maxGapMinutes * 60000000L)
      .groupBy(col(typeCol).as("from_type"), col("__next_type").as("to_type"))
      .agg(count(lit(1)).cast("long").as("transitions"))
  }

  /** SCD2 state-history build (gaps-and-islands): collapse each user's
    * event stream into contiguous same-state runs and emit one validity
    * interval per run — `valid_to` is the next run's start, null while
    * current. The classic warehouse dimension-history shape, here over
    * the event stream's `event_type` as the tracked state.
    *
    * Two windows over the SAME (user, ts, id) ordering — one exchange,
    * one sort, both windows ride it (Catalyst reuses the partitioning).
    * Run starts are detected with lag(); the id column breaks same-ts
    * ties deterministically.
    */
  def scdIntervals(events: DataFrame, userCol: String = "user_id",
      stateCol: String = "event_type", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byTime = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val starts = events
      .select(col(userCol), col(stateCol).as("state"), col(tsCol), col(idCol))
      .withColumn("__prev", lag(col("state"), 1).over(byTime))
      .filter(col("__prev").isNull || col("__prev") =!= col("state"))
    starts
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(byTime))
      .select(col(userCol), col("state"),
        col("valid_from").cast("timestamp_ntz"),
        col("valid_to").cast("timestamp_ntz"))
  }

  /** Time-in-state from the SCD2 intervals: per state, the number of
    * CLOSED intervals, total dwell seconds, and the mean dwell — the
    * state-duration report every state-machine/session analysis needs.
    * Open intervals are excluded (their duration is right-censored; a
    * production report would cap them at the watermark — documented
    * choice, not an accident). Dwell sums are exact integer seconds
    * (µs diff, integer division), so `avg_s` is the one unrounded
    * bit-identical quotient.
    */
  def stateDwell(events: DataFrame, userCol: String = "user_id",
      stateCol: String = "event_type", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame =
    scdIntervals(events, userCol, stateCol, tsCol, idCol)
      .filter(col("valid_to").isNotNull)
      .withColumn("dwell_s", expr(
        "(unix_micros(cast(valid_to as timestamp)) - " +
          "unix_micros(cast(valid_from as timestamp))) div 1000000"))
      .groupBy("state")
      .agg(count(lit(1)).as("n_intervals"), sum(col("dwell_s")).as("total_s"))
      .select(col("state"), col("n_intervals"), col("total_s"),
        (col("total_s").cast("double") / col("n_intervals").cast("double"))
          .as("avg_s"))

  /** [[stateDwell]] with right-censoring made computable: open
    * intervals (each user's current state) are capped at `cap` instead
    * of dropped — the "dwell as of the report time" convention a live
    * dashboard wants, where the final state's ongoing residence counts
    * up to now. `cap` defaults to the maximum observed event time (one
    * broadcast 1-row aggregate); an explicit earlier cap produces the
    * true "as of" report — every interval truncates at the cap (closed
    * ones included) and intervals opening after it are excluded. Same
    * exact-integer-seconds contract as [[stateDwell]]; `avg_s` stays
    * the one unrounded bit-identical quotient.
    */
  def stateDwellCapped(events: DataFrame, cap: Option[Column] = None,
      userCol: String = "user_id", stateCol: String = "event_type",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    val intervals = scdIntervals(events, userCol, stateCol, tsCol, idCol)
    val withCap = cap match {
      case Some(c) => intervals.withColumn("__cap", c)
      case None => intervals.join(
        broadcast(events.agg(max(col(tsCol)).as("__cap"))))
    }
    withCap
      .withColumn("valid_to", least(coalesce(col("valid_to"), col("__cap")),
        col("__cap")))
      .filter(col("valid_from") <= col("__cap"))
      .withColumn("dwell_s", expr(
        "(unix_micros(cast(valid_to as timestamp)) - " +
          "unix_micros(cast(valid_from as timestamp))) div 1000000"))
      .groupBy("state")
      .agg(count(lit(1)).as("n_intervals"), sum(col("dwell_s")).as("total_s"))
      .select(col("state"), col("n_intervals"), col("total_s"),
        (col("total_s").cast("double") / col("n_intervals").cast("double"))
          .as("avg_s"))
  }

  /** Incremental SCD2 merge: fold an append-only batch of new events
    * into an existing interval table WITHOUT recomputing untouched
    * users. Contract: every new event for a user occurs strictly after
    * all of that user's existing boundaries (the append-only feed case —
    * out-of-order history would need the dropped non-change events to
    * re-split runs, which no interval table can reconstruct).
    *
    *  - users absent from the batch pass through UNTOUCHED (left-anti) —
    *    at 100 TB this is the entire win: a daily batch touches a tiny
    *    user fraction, and partition-pruned storage makes the rewrite
    *    proportional to the batch, not the history;
    *  - affected users' intervals replay as pseudo change events
    *    (lossless — intervals ARE the change points) unioned with the
    *    new events, through the same [[scdIntervals]] window; run
    *    continuation falls out of the consecutive-state dedup (a batch
    *    opening with the still-open state keeps the OLD valid_from).
    *
    * Correctness contract (the e7 probe): merge(intervals(old), new)
    * ≡ intervals(old ∪ new) row-for-row.
    */
  def scdMerge(existing: DataFrame, newEvents: DataFrame,
      userCol: String = "user_id", stateCol: String = "event_type",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    val affected = newEvents.select(col(userCol)).distinct()
    val untouched = existing.join(affected, Seq(userCol), "left_anti")
    val touchedOld = existing.join(affected, Seq(userCol), "left_semi")
    // pseudo id −1: new events are strictly later under the contract, so
    // (ts, id) ties with real events cannot arise
    val pseudo = touchedOld.select(col(userCol),
      col("state").as(stateCol),
      col("valid_from").cast("timestamp").as(tsCol),
      lit(-1L).as(idCol))
    val replayed = scdIntervals(
      pseudo.unionByName(newEvents.select(col(userCol), col(stateCol),
        col(tsCol), col(idCol))),
      userCol, stateCol, tsCol, idCol)
    untouched.unionByName(replayed)
  }

  /** Exact trailing-`windowDays` rolling distinct active users (the
    * WAU/MAU primitive) per calendar day: each (user, active day)
    * contributes to the `windowDays` window-end days it falls in, so the
    * exact distinct becomes explode(×windowDays) → one (user, window-day)
    * dedup shuffle → a map-combinable count — the standard scalable
    * formulation (sliding distinct cannot pre-aggregate, so the explode
    * factor IS the cost, linear and bounded by the window length).
    * Emitted days are clipped to the observed day range (trailing
    * windows at the head are naturally partial).
    */
  def rollingActiveUsers(events: DataFrame, windowDays: Int = 7,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(windowDays >= 1, "windowDays must be at least 1")
    val d = events.select(col(userCol), to_date(col(tsCol)).as("day")).distinct()
    val maxDay = broadcast(d.agg(max(col("day")).as("__mx")))
    d.withColumn("wday", explode(expr(
        s"sequence(day, date_add(day, ${windowDays - 1}), interval 1 day)")))
      .join(maxDay).filter(col("wday") <= col("__mx"))
      .groupBy("wday")
      .agg(countDistinct(col(userCol)).as("wau"))
  }

  /** Rolling z-score anomaly flags on the hourly event-rate series: per
    * (`typeCol`, hour) counts; baseline = the trailing `lookback`
    * PRESENT hours (rows frame excluding the current row — absent hours
    * don't pad the frame); emit hours with z ≥ `zThreshold` where
    * z = (cnt − mean) / sd over the baseline.
    *
    * Determinism contract: the frame aggregates are exact integers
    * (n, Σx, Σx²), and mean/variance/z are derived by a FIXED scalar op
    * tree — each IEEE op correctly rounded — so the unrounded z is
    * bit-identical across engines (no stddev_samp, whose streaming-merge
    * op order is engine-private). Baselines need `minN` observations,
    * and zero-variance baselines are excluded EXPLICITLY (0/0 → NaN
    * orders differently across engines).
    *
    * Scale: one hash agg (type, hour) then one window shuffle on the
    * type key — hourly series are ~10⁴ rows/year/type, so even a
    * single-task-per-type window is bounded by calendar time, not by
    * corpus size; the raw event table never enters the window.
    */
  def rollingZAnomalies(events: DataFrame, typeCol: String = "event_type",
      tsCol: String = "ts", lookback: Int = 24, minN: Int = 12,
      zThreshold: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(lookback >= 2 && minN >= 2 && minN <= lookback,
      "need 2 <= minN <= lookback")
    val hourly = events.groupBy(col(typeCol).as("event_type"),
        date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(-lookback, -1)
    val stats = hourly.select(col("event_type"), col("hour"), col("cnt"),
      count(col("cnt")).over(w).as("n"),
      sum(col("cnt")).over(w).as("sx"),
      sum(col("cnt") * col("cnt")).over(w).as("sxx"))
    val nD = col("n").cast("double")
    val mean = col("sx").cast("double") / nD
    val vr = (col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double") / nD) /
      (nD - lit(1.0))
    val z = (col("cnt").cast("double") - mean) / sqrt(vr)
    stats.filter(col("n") >= minN)
      .withColumn("__vr", vr).withColumn("z", z)
      .filter(col("__vr") > 0.0 && col("z") >= zThreshold)
      .select(col("event_type"), col("hour"), col("cnt").cast("long").as("cnt"),
        col("n").cast("long").as("n"), col("z"))
  }

  def defs: Map[String, QueryDef] = Map(
    "e1_funnel" -> QueryDef.sql(
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND e.ts > t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND e.ts > t2 GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT 1 AS step_idx, 'view' AS step,
        |         (SELECT CAST(count(*) AS BIGINT) FROM s1) AS users
        |  UNION ALL SELECT 2, 'click', (SELECT CAST(count(*) AS BIGINT) FROM s2)
        |  UNION ALL SELECT 3, 'purchase', (SELECT CAST(count(*) AS BIGINT) FROM s3))
        |ORDER BY step_idx""".stripMargin) { (s, d) =>
      funnel(Tables.events(s, d), Seq("view", "click", "purchase"))
        .orderBy("step_idx")
    },

    "e3_event_transitions" -> QueryDef.sql(
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events),
        |n AS (
        |  SELECT event_type,
        |    lead(event_type) OVER w AS next_type,
        |    epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap_us
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_type AS from_type, next_type AS to_type,
        |  CAST(count(*) AS BIGINT) AS transitions
        |FROM n
        |WHERE next_type IS NOT NULL AND gap_us <= 1800000000
        |GROUP BY 1, 2
        |ORDER BY from_type, to_type""".stripMargin) { (s, d) =>
      eventTransitions(Tables.events(s, d), maxGapMinutes = 30)
        .orderBy("from_type", "to_type")
    },

    "e4_scd2_intervals" -> QueryDef.sql(
      """WITH e AS (
        |  SELECT user_id, event_type AS state, CAST(ts AS TIMESTAMP) AS ts,
        |         event_id
        |  FROM events),
        |c AS (
        |  SELECT *, lag(state) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
        |s AS (SELECT user_id, state, ts, event_id FROM c
        |      WHERE prev IS NULL OR prev <> state)
        |SELECT user_id, state, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |FROM s
        |ORDER BY user_id, valid_from, state""".stripMargin) { (s, d) =>
      scdIntervals(Tables.events(s, d))
        .orderBy("user_id", "valid_from", "state")
    },

    // weighted PageRank over the transition graph — the oracle unrolls
    // the same 5-round recurrence; 12-d.p. per-round rounding
    // re-synchronizes summation-order ulps (Graph.pageRank contract)
    "g1_pagerank" -> QueryDef.sql(
      """WITH e0 AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events),
        |nx AS (
        |  SELECT event_type,
        |    lead(event_type) OVER w AS next_type,
        |    epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap_us
        |  FROM e0 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |edges AS (
        |  SELECT event_type AS src, next_type AS dst,
        |    CAST(count(*) AS DOUBLE) AS w
        |  FROM nx WHERE next_type IS NOT NULL AND gap_us <= 1800000000
        |  GROUP BY 1, 2),
        |nodes AS (SELECT src AS node FROM edges
        |          UNION SELECT dst FROM edges),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |ow AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
        |r0 AS (SELECT node, 1.0::DOUBLE / n AS r FROM nodes, nn),
        |c1 AS (SELECT e.dst AS node, sum(r.r * e.w / ow.ow) AS contrib
        |       FROM edges e JOIN r0 r ON r.node = e.src JOIN ow ON ow.src = e.src
        |       GROUP BY e.dst),
        |d1 AS (SELECT coalesce(sum(r.r), 0.0::DOUBLE) AS mass
        |       FROM r0 r LEFT JOIN ow ON ow.src = r.node WHERE ow.src IS NULL),
        |r1 AS (SELECT n.node, round((1.0::DOUBLE - 0.85::DOUBLE) / nn.n
        |         + 0.85::DOUBLE * (coalesce(c.contrib, 0.0::DOUBLE)
        |                           + d.mass / nn.n), 12) AS r
        |       FROM nodes n LEFT JOIN c1 c ON c.node = n.node, d1 d, nn),
        |c2 AS (SELECT e.dst AS node, sum(r.r * e.w / ow.ow) AS contrib
        |       FROM edges e JOIN r1 r ON r.node = e.src JOIN ow ON ow.src = e.src
        |       GROUP BY e.dst),
        |d2 AS (SELECT coalesce(sum(r.r), 0.0::DOUBLE) AS mass
        |       FROM r1 r LEFT JOIN ow ON ow.src = r.node WHERE ow.src IS NULL),
        |r2 AS (SELECT n.node, round((1.0::DOUBLE - 0.85::DOUBLE) / nn.n
        |         + 0.85::DOUBLE * (coalesce(c.contrib, 0.0::DOUBLE)
        |                           + d.mass / nn.n), 12) AS r
        |       FROM nodes n LEFT JOIN c2 c ON c.node = n.node, d2 d, nn),
        |c3 AS (SELECT e.dst AS node, sum(r.r * e.w / ow.ow) AS contrib
        |       FROM edges e JOIN r2 r ON r.node = e.src JOIN ow ON ow.src = e.src
        |       GROUP BY e.dst),
        |d3 AS (SELECT coalesce(sum(r.r), 0.0::DOUBLE) AS mass
        |       FROM r2 r LEFT JOIN ow ON ow.src = r.node WHERE ow.src IS NULL),
        |r3 AS (SELECT n.node, round((1.0::DOUBLE - 0.85::DOUBLE) / nn.n
        |         + 0.85::DOUBLE * (coalesce(c.contrib, 0.0::DOUBLE)
        |                           + d.mass / nn.n), 12) AS r
        |       FROM nodes n LEFT JOIN c3 c ON c.node = n.node, d3 d, nn),
        |c4 AS (SELECT e.dst AS node, sum(r.r * e.w / ow.ow) AS contrib
        |       FROM edges e JOIN r3 r ON r.node = e.src JOIN ow ON ow.src = e.src
        |       GROUP BY e.dst),
        |d4 AS (SELECT coalesce(sum(r.r), 0.0::DOUBLE) AS mass
        |       FROM r3 r LEFT JOIN ow ON ow.src = r.node WHERE ow.src IS NULL),
        |r4 AS (SELECT n.node, round((1.0::DOUBLE - 0.85::DOUBLE) / nn.n
        |         + 0.85::DOUBLE * (coalesce(c.contrib, 0.0::DOUBLE)
        |                           + d.mass / nn.n), 12) AS r
        |       FROM nodes n LEFT JOIN c4 c ON c.node = n.node, d4 d, nn),
        |c5 AS (SELECT e.dst AS node, sum(r.r * e.w / ow.ow) AS contrib
        |       FROM edges e JOIN r4 r ON r.node = e.src JOIN ow ON ow.src = e.src
        |       GROUP BY e.dst),
        |d5 AS (SELECT coalesce(sum(r.r), 0.0::DOUBLE) AS mass
        |       FROM r4 r LEFT JOIN ow ON ow.src = r.node WHERE ow.src IS NULL),
        |r5 AS (SELECT n.node, round((1.0::DOUBLE - 0.85::DOUBLE) / nn.n
        |         + 0.85::DOUBLE * (coalesce(c.contrib, 0.0::DOUBLE)
        |                           + d.mass / nn.n), 12) AS r
        |       FROM nodes n LEFT JOIN c5 c ON c.node = n.node, d5 d, nn)
        |SELECT node, round(r, 6) AS pr FROM r5
        |ORDER BY node""".stripMargin) { (s, d) =>
      val edges = eventTransitions(Tables.events(s, d), maxGapMinutes = 30)
        .select(col("from_type").as("src"), col("to_type").as("dst"),
          col("transitions").as("weight"))
      Graph.pageRank(edges, iterations = 5)
        .select(col("node"), round(col("r"), 6).as("pr"))
        .orderBy("node")
    },

    // Kaplan-Meier churn survival: per-user lifetime in days (first→last
    // activity), churned iff inactive ≥ 14 days before the corpus max ts
    // (else right-censored — the e11 censoring discipline). Per distinct
    // lifetime day t: at-risk n(t) = users with lifetime ≥ t, events
    // d(t) = churners AT t; hazard d/n is an identical-operand quotient
    // (bit-exact unrounded), survival Π(1 − d/n) is computed as
    // exp(Σ ln(1 − d/n)) over the SAME deterministic t-order in both
    // engines and rounded 6 d.p. (the t33/t34 ln recipe — absorbs libm
    // ulp drift). The ordered window runs over the DISTINCT-day table —
    // bounded by the observation span, never data-sized, so the
    // single-partition window is safe at any corpus scale.
    "e26_survival_curve" -> QueryDef.sql(
      """WITH mx AS (SELECT max(CAST(ts AS TIMESTAMP)) AS m FROM events),
        |life AS (
        |  SELECT user_id,
        |    date_diff('day', CAST(min(CAST(ts AS TIMESTAMP)) AS DATE),
        |              CAST(max(CAST(ts AS TIMESTAMP)) AS DATE)) AS t,
        |    CASE WHEN max(CAST(ts AS TIMESTAMP)) <
        |              (SELECT m FROM mx) - INTERVAL 14 DAY
        |         THEN 1 ELSE 0 END AS churned
        |  FROM events GROUP BY user_id),
        |tot AS (SELECT count(*) AS n FROM life),
        |byt AS (
        |  SELECT t, count(*) AS ending, sum(churned) AS churned
        |  FROM life GROUP BY t),
        |curve AS (
        |  SELECT t, ending, churned,
        |    (SELECT n FROM tot)
        |      - sum(ending) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
        |      + ending AS n_at_risk
        |  FROM byt)
        |SELECT CAST(t AS BIGINT) AS t,
        |  CAST(n_at_risk AS BIGINT) AS n_at_risk,
        |  CAST(churned AS BIGINT) AS churned,
        |  CAST(churned AS DOUBLE) / CAST(n_at_risk AS DOUBLE) AS hazard,
        |  round(exp(sum(ln(greatest(1e-300,
        |          1.0 - CAST(churned AS DOUBLE) / CAST(n_at_risk AS DOUBLE))))
        |    OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)), 6) AS survival
        |FROM curve
        |ORDER BY t""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, d)
      val mx = broadcast(e.agg(max(col("ts")).as("m")))
      val life = e.groupBy("user_id")
        .agg(min(col("ts")).as("first"), max(col("ts")).as("last"))
        .join(mx)
        .select(
          datediff(col("last").cast("date"), col("first").cast("date")).as("t"),
          (col("last") < col("m") - expr("INTERVAL 14 DAYS"))
            .cast("int").as("churned"))
      val tot = broadcast(life.agg(count(lit(1)).as("n")))
      val byt = life.groupBy("t")
        .agg(count(lit(1)).as("ending"), sum("churned").as("churned"))
      val w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
      val hazard = col("churned").cast("double") / col("n_at_risk").cast("double")
      byt.join(tot)
        .withColumn("n_at_risk",
          col("n") - sum("ending").over(w) + col("ending"))
        .select(col("t").cast("long").as("t"),
          col("n_at_risk").cast("long").as("n_at_risk"),
          col("churned").cast("long").as("churned"),
          hazard.as("hazard"),
          // greatest floors a hazard of exactly 1 (all remaining at-risk
          // churn at t): Spark ln(0) is NULL where DuckDB gives -inf —
          // the floor makes both engines carry a finite log whose exp
          // rounds to 0.0 identically
          round(exp(sum(log(greatest(lit(1e-300), lit(1.0) - hazard)))
            .over(w)), 6).as("survival"))
        .orderBy("t")
    },

    "e2_retention" -> QueryDef.sql(
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |f AS (SELECT user_id, min(ts) AS t0 FROM e GROUP BY user_id)
        |SELECT CAST(date_trunc('week', t0) AS DATE) AS cohort_week,
        |  (epoch_us(e.ts) - epoch_us(t0)) // 604800000000 AS week_offset,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS users
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY cohort_week, week_offset""".stripMargin) { (s, d) =>
      retentionCohorts(Tables.events(s, d))
        .orderBy("cohort_week", "week_offset")
    },

    // Rolling z-score anomaly detection on the hourly event-rate series:
    // per (event_type, hour) counts, baseline = the TRAILING 24 present
    // hours (rows frame, excluding the current row), flag hours whose
    // count sits ≥ 3 sample-stddevs above the baseline mean. The z
    // quotient is emitted UNROUNDED: every input to the scalar tree (n,
    // Σx, Σx²) is an exact integer, so both engines evaluate the
    // identical correctly-rounded IEEE op sequence — bit-equal doubles
    // (the same identical-dividend/divisor argument as the avg rule).
    // `vr > 0` guards the constant-baseline case explicitly: Spark says
    // NaN ≥ 3 is false but DuckDB sorts NaN above all numbers, so an
    // unguarded 0/0 would diverge.
    "e5_anomaly" -> QueryDef.sql(
      """WITH h AS (
        |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |         count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, hour, cnt,
        |    count(cnt) OVER w AS n, sum(cnt) OVER w AS sx,
        |    sum(cnt * cnt) OVER w AS sxx
        |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hour
        |                      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |v AS (
        |  SELECT event_type, hour, cnt, n,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |       / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0::DOUBLE) AS vr
        |  FROM s WHERE n >= 12)
        |SELECT event_type, hour, CAST(cnt AS BIGINT) AS cnt,
        |  CAST(n AS BIGINT) AS n,
        |  (CAST(cnt AS DOUBLE) - mean) / sqrt(vr) AS z
        |FROM v
        |WHERE vr > 0.0::DOUBLE
        |  AND (CAST(cnt AS DOUBLE) - mean) / sqrt(vr) >= 3.0::DOUBLE
        |ORDER BY event_type, hour""".stripMargin) { (s, d) =>
      rollingZAnomalies(Tables.events(s, d))
        .orderBy("event_type", "hour")
    },

    // Time-in-state report: closed SCD2 intervals only; exact integer
    // dwell seconds; avg_s is the unrounded quotient of exact ints.
    "e9_state_dwell" -> QueryDef.sql(
      """WITH e AS (
        |  SELECT user_id, event_type AS state, CAST(ts AS TIMESTAMP) AS ts,
        |         event_id FROM events),
        |c AS (SELECT *, lag(state) OVER (
        |        PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
        |s AS (SELECT user_id, state, ts, event_id FROM c
        |      WHERE prev IS NULL OR prev <> state),
        |i AS (SELECT user_id, state, ts AS valid_from,
        |        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |          AS valid_to FROM s)
        |SELECT state, CAST(count(*) AS BIGINT) AS n_intervals,
        |  CAST(sum((epoch_us(valid_to) - epoch_us(valid_from)) // 1000000)
        |    AS BIGINT) AS total_s,
        |  CAST(sum((epoch_us(valid_to) - epoch_us(valid_from)) // 1000000)
        |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_s
        |FROM i WHERE valid_to IS NOT NULL
        |GROUP BY state ORDER BY state""".stripMargin) { (s, d) =>
      stateDwell(Tables.events(s, d)).orderBy("state")
    },

    // e9's right-censoring choice made computable (stateDwellCapped):
    // each user's current state counts its ongoing residence up to the
    // report time (max observed ts) — the live-dashboard convention.
    "e11_state_dwell_capped" -> QueryDef.sql(
      """WITH e AS (
        |  SELECT user_id, event_type AS state, CAST(ts AS TIMESTAMP) AS ts,
        |         event_id FROM events),
        |c AS (SELECT *, lag(state) OVER (
        |        PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
        |s AS (SELECT user_id, state, ts, event_id FROM c
        |      WHERE prev IS NULL OR prev <> state),
        |i AS (SELECT user_id, state, ts AS valid_from,
        |        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |          AS valid_to FROM s),
        |i2 AS (SELECT user_id, state, valid_from,
        |         coalesce(valid_to, (SELECT max(ts) FROM e)) AS valid_to
        |       FROM i WHERE valid_from <= (SELECT max(ts) FROM e))
        |SELECT state, CAST(count(*) AS BIGINT) AS n_intervals,
        |  CAST(sum((epoch_us(valid_to) - epoch_us(valid_from)) // 1000000)
        |    AS BIGINT) AS total_s,
        |  CAST(sum((epoch_us(valid_to) - epoch_us(valid_from)) // 1000000)
        |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_s
        |FROM i2
        |GROUP BY state ORDER BY state""".stripMargin) { (s, d) =>
      stateDwellCapped(Tables.events(s, d)).orderBy("state")
    },

    // Funnel with a per-step conversion window (120 min): step i counts
    // only within maxDelay of step i−1 — the windowed-conversion
    // contract every product funnel actually uses.
    "e10_windowed_funnel" -> QueryDef.sql(
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND e.ts > t1
        |         AND e.ts <= t1 + INTERVAL 120 MINUTE GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND e.ts > t2
        |         AND e.ts <= t2 + INTERVAL 120 MINUTE GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT 1 AS step_idx, 'view' AS step,
        |         (SELECT CAST(count(*) AS BIGINT) FROM s1) AS users
        |  UNION ALL SELECT 2, 'click', (SELECT CAST(count(*) AS BIGINT) FROM s2)
        |  UNION ALL SELECT 3, 'purchase', (SELECT CAST(count(*) AS BIGINT) FROM s3))
        |ORDER BY step_idx""".stripMargin) { (s, d) =>
      funnel(Tables.events(s, d), Seq("view", "click", "purchase"),
          maxDelayMinutes = Some(120))
        .orderBy("step_idx")
    },

    // Incremental SCD2 merge ≡ full recompute: existing = intervals from
    // events before Jan 24, batch = the rest; the oracle is e4's FULL
    // SQL over all events — row equality proves the merge is exact and
    // the untouched-user passthrough loses nothing.
    "e7_scd2_merge" -> QueryDef.sql(
      """WITH e AS (
        |  SELECT user_id, event_type AS state, CAST(ts AS TIMESTAMP) AS ts,
        |         event_id
        |  FROM events),
        |c AS (
        |  SELECT *, lag(state) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
        |s AS (SELECT user_id, state, ts, event_id FROM c
        |      WHERE prev IS NULL OR prev <> state)
        |SELECT user_id, state, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |FROM s
        |ORDER BY user_id, valid_from, state""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      val cut = lit("2024-01-24 00:00:00").cast("timestamp")
      val existing = scdIntervals(e.filter(col("ts") < cut))
      scdMerge(existing, e.filter(col("ts") >= cut))
        .orderBy("user_id", "valid_from", "state")
    },

    // Exact trailing-7-day rolling distinct active users (WAU) per
    // calendar day — explode each active (user, day) into the 7
    // window-end days it reaches, dedup, count. The oracle unnests the
    // same series relationally.
    "e8_rolling_wau" -> QueryDef.sql(
      """WITH d AS (
        |  SELECT DISTINCT user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |w AS (
        |  SELECT user_id,
        |    CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
        |      CAST(day + 6 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS wday
        |  FROM d),
        |m AS (SELECT max(day) AS mx FROM d)
        |SELECT wday, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        |FROM w, m WHERE wday <= mx
        |GROUP BY wday ORDER BY wday""".stripMargin) { (s, d) =>
      rollingActiveUsers(Tables.events(s, d), windowDays = 7)
        .orderBy("wday")
    },

    // As-of with max-staleness (pandas merge_asof tolerance): the latest
    // 'view' before each purchase, nulled when older than 30 minutes —
    // "attribute only if the view is still fresh". Oracle = ASOF LEFT
    // JOIN + the same staleness CASE. Context deduped per (user, ts) as
    // in e6 (tie determinism).
    "j11_asof_tolerance" -> QueryDef.sql(
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events),
        |v AS (
        |  SELECT user_id, ts FROM (
        |    SELECT *, row_number() OVER (
        |        PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |    FROM e WHERE event_type = 'view') WHERE rn = 1),
        |p AS (SELECT user_id, event_id, ts FROM e WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT p.user_id, p.event_id, p.ts, v.ts AS vts
        |  FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts)
        |SELECT user_id, event_id,
        |  CASE WHEN vts IS NOT NULL
        |         AND epoch_us(ts) - epoch_us(vts) <= 1800000000
        |       THEN (epoch_us(ts) - epoch_us(vts)) // 1000000 END AS view_age_s
        |FROM m ORDER BY event_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, d)
      val rn = row_number().over(
        Window.partitionBy("user_id", "ts").orderBy(col("event_id").desc))
      val views = e.filter(col("event_type") === "view")
        .withColumn("__rn", rn).filter(col("__rn") === 1)
        .select(col("user_id"), col("ts"), col("ts").as("view_ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      AsOf.asofJoinTolerant(purchases, views, keys = Seq("user_id"),
          tsCol = "ts", carry = Seq("view_ts"), toleranceSeconds = 1800L)
        .select(col("user_id"), col("event_id"),
          expr("(unix_micros(ts) - unix_micros(asof_view_ts)) div 1000000")
            .as("view_age_s"))
        .orderBy("event_id")
    },

    // Last-touch attribution: for each purchase, the latest non-purchase
    // event (the "channel") at-or-before it for the same user, plus the
    // delay in whole seconds — the SCD2/as-of composition every
    // marketing-analytics stack runs. Spark is the one-shuffle
    // union+window as-of (AsOf.asofJoin); the oracle is DuckDB's native
    // ASOF LEFT JOIN. Context rows are pre-deduped per (user, ts) by max
    // event_id: both engines' as-ofs pick an ARBITRARY build row on
    // exact-tie timestamps, so the contract dedups them away.
    "e6_last_touch" -> QueryDef.sql(
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events),
        |ctx AS (
        |  SELECT user_id, event_type, ts FROM (
        |    SELECT *, row_number() OVER (
        |        PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |    FROM e WHERE event_type <> 'purchase') WHERE rn = 1),
        |p AS (SELECT user_id, event_id, ts FROM e WHERE event_type = 'purchase')
        |SELECT p.user_id, p.event_id, c.event_type AS channel,
        |  (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS delay_s
        |FROM p ASOF LEFT JOIN ctx c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, d)
      val rn = row_number().over(
        Window.partitionBy("user_id", "ts").orderBy(col("event_id").desc))
      val ctx = e.filter(col("event_type") =!= "purchase")
        .withColumn("__rn", rn).filter(col("__rn") === 1)
        .select(col("user_id"), col("ts"),
          col("event_type").as("channel"), col("ts").as("ctx_ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      AsOf.asofJoin(purchases, ctx, keys = Seq("user_id"), tsCol = "ts",
          carry = Seq("channel", "ctx_ts"))
        .select(col("user_id"), col("event_id"),
          col("asof_channel").as("channel"),
          expr("(unix_micros(ts) - unix_micros(asof_ctx_ts)) div 1000000")
            .as("delay_s"))
        .orderBy("event_id")
    },

    // Exact triangle count over the co-purchase graph (parts sharing an
    // order). Spark runs the degree-ordered oriented wedge join
    // (Graph.triangleCount); the oracle counts the same triangles by the
    // textbook a<b<c three-way self-join — equality proves orientation
    // neither loses nor double-counts. Edge derivation uses the in-row
    // pair explode over per-order part sets (the t26 lesson: order
    // cardinality is bounded, so pairs never need a self-join shuffle).
    "g2_triangles" -> QueryDef.sql(
      """WITH e0 AS (
        |  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey)
        |SELECT
        |  (SELECT CAST(count(DISTINCT node) AS BIGINT) FROM
        |    (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)) AS n_nodes,
        |  (SELECT CAST(count(*) AS BIGINT) FROM e0) AS n_edges,
        |  (SELECT CAST(count(*) AS BIGINT)
        |   FROM e0 e1 JOIN e0 e2 ON e2.a = e1.b
        |     JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles
        |ORDER BY n_nodes""".stripMargin) { (s, d) =>
      val pairs = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(flatten(transform(col("ps"), (x, i) =>
          transform(slice(col("ps"), i + 2, size(col("ps"))), y =>
            struct(x.as("src"), y.as("dst")))))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      Graph.triangleCount(pairs).orderBy("n_nodes")
    }
  )
}
