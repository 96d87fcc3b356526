package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental-maintenance and engagement-scoring operators (round 7):
  * aggregate-view maintenance from a delta batch, integer-exact
  * exponential time-decay scoring, and position-based multi-touch
  * attribution. All three are oracle-checked against full relational
  * recomputes.
  *
  * Scale notes: the maintenance path is the whole point at 100 TB — the
  * merged view is one map-combinable hash agg over (state ∪ delta)
  * partials, so a daily refresh touches |state| + |delta| rows instead
  * of re-scanning the full history. Decay weights are powers of two on
  * integer cents (exact in BIGINT — no float pow, no cross-engine ulp),
  * and attribution credit is integer basis points with a deterministic
  * remainder rule, so every output column hash-checks.
  */
object Incremental {

  /** Per-(user, event_type) aggregate state: event count + EXACT integer
    * cents (the e12 discipline — sum of round(value·100) is
    * order-independent). This is both the bootstrap ("compute the view
    * from history") and the delta extractor ("compute the partial for
    * one new batch") — maintenance is closed under [[mergeAggState]].
    */
  def aggState(events: DataFrame): DataFrame =
    events.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))

  /** Merge an existing aggregate view with a delta partial: union of
    * partials re-aggregated with SUM — associative + commutative, so
    * any batching of the history produces the identical view (the probe
    * proves merged ≡ full recompute under the oracle). One hash agg,
    * map-side combined; the state never re-scans raw history.
    */
  def mergeAggState(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta)
      .groupBy("user_id", "event_type")
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("sum_cents")).as("sum_cents"))

  /** Integer-exact exponential time-decay engagement score: each event
    * contributes `cents · 2^(10 − min(age_weeks, 10))` where age_weeks
    * is the FLOOR week count back from the corpus max timestamp —
    * half-life one week, floor weight 1 at ≥10 weeks. Weights are
    * BIGINT powers of two (shiftleft); age_weeks is a long `/` (IEEE
    * double division) truncated by the long cast — exact here because
    * the microsecond gaps are < 2^53 (double-representable) and the
    * double spacing near gap/WeekUs is ≪ 1, so truncation lands on the
    * true floor quotient. No float pow anywhere, so the per-user sum is
    * exact and order-independent. The max-ts anchor broadcasts (one
    * row); everything else is a scan-local projection + one hash agg.
    */
  def decayScores(events: DataFrame): DataFrame = {
    val anchor = broadcast(events.agg(max(unix_micros(col("ts"))).as("__maxus")))
    val ageWeeks = ((col("__maxus") - unix_micros(col("ts"))) / lit(604800000000L))
      .cast("long")
    events.join(anchor)
      .select(col("user_id"),
        (round(col("value") * 100).cast("long") *
          call_function("shiftleft", lit(1L),
            (lit(10) - least(ageWeeks, lit(10L))).cast("int")))
          .as("__w"))
      .groupBy("user_id")
      .agg(sum(col("__w")).as("decay_score"), count(lit(1)).as("n_events"))
  }

  /** Position-based (U-shaped) multi-touch attribution in integer basis
    * points: for every conversion (`convType` event), the qualifying
    * touches are the user's `touchTypes` events strictly before the
    * conversion within `windowDays`. Credit of the conversion's integer
    * cents: 10000 bp to a lone touch, 5000/5000 for two, else
    * 4000/4000 to first/last and 2000 split over the middles by integer
    * division with the remainder assigned to the LAST middle — the
    * deterministic rule that makes the allocation sum exactly to
    * 10000 bp per conversion. Output is credited cents·bp per touch
    * type (exact BIGINT).
    *
    * Scale: touches join conversions on the user key (one shuffle);
    * the position windows partition by conversion id — bounded by
    * per-conversion touch counts, never a global sort.
    */
  def positionAttribution(events: DataFrame, convType: String = "purchase",
      touchTypes: Seq[String] = Seq("view", "click"),
      windowDays: Int = 7): DataFrame = {
    val conv = events.filter(col("event_type") === convType)
      .select(col("user_id"), col("event_id").as("conv_id"),
        col("ts").as("conv_ts"),
        round(col("value") * 100).cast("long").as("conv_cents"))
    val touch = events.filter(col("event_type").isin(touchTypes: _*))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("touch_type"), col("ts").as("touch_ts"))
    val paired = touch.join(conv, Seq("user_id"))
      .filter(col("touch_ts") < col("conv_ts") &&
        unix_micros(col("conv_ts")) - unix_micros(col("touch_ts")) <=
          lit(windowDays * 86400000000L))
    val w = Window.partitionBy(col("conv_id"))
    val asc = Window.partitionBy(col("conv_id"))
      .orderBy(col("touch_ts"), col("touch_id"))
    val desc = Window.partitionBy(col("conv_id"))
      .orderBy(col("touch_ts").desc, col("touch_id").desc)
    val n = count(lit(1)).over(w)
    val rn = row_number().over(asc)
    val rd = row_number().over(desc)
    val mid = lit(2000L)
    val bp = when(n === 1, lit(10000L))
      .when(n === 2, lit(5000L))
      .when(rn === 1 || rd === 1, lit(4000L))
      .otherwise(
        // middles: 2000 div (n−2), remainder pinned to the last middle
        (mid / (n - 2)).cast("long") +
          when(rd === 2, pmod(mid, n - 2).cast("long")).otherwise(lit(0L)))
    paired
      .withColumn("__bp", bp)
      .groupBy(col("touch_type"))
      .agg(sum(col("__bp") * col("conv_cents")).as("credit_cents_bp"),
        count(lit(1)).as("n_touches"))
  }

  /** Incremental JOIN delta (the bilinearity of ⋈ over union — the DBSP
    * / materialized-view-maintenance identity):
    * Δ(R ⋈ S) = ΔR ⋈ S_old ∪ R_old ⋈ ΔS ∪ ΔR ⋈ ΔS.
    * Feeding the delta through the same aggregate partials as the state
    * and merging with [[mergeAggState]]-style SUMs refreshes a join view
    * touching |Δ|-proportional data: each term probes the big old side
    * with a small delta (broadcast or bucketed-join-friendly), and the
    * old⋈old term — the 100 TB one — is never recomputed.
    */
  def joinDelta(rOld: DataFrame, rDelta: DataFrame, sOld: DataFrame,
      sDelta: DataFrame, keys: Seq[String]): DataFrame =
    rOld.join(sDelta, keys)
      .unionByName(rDelta.join(sOld, keys))
      .unionByName(rDelta.join(sDelta, keys))

  def defs: Map[String, QueryDef] = Map(

    // ---- incremental join-view maintenance ----
    // Revenue-per-customer over orders ⋈ lineitem, maintained from a
    // state snapshot (orders before 1998, lines shipped before Mar 1998)
    // plus both deltas. The oracle is the FULL recompute, so a green row
    // proves the join-delta identity including the cross term (orders
    // near the cutoffs ship on both sides of the line cutoff).
    "e23_incremental_join_view" -> QueryDef.sql(
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS rev_cents
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      val rCut = lit("1998-01-01").cast("timestamp")
      val sCut = lit("1998-03-01").cast("timestamp")
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"))
      val l = Tables.lineitem(s, d).select(col("l_orderkey").as("o_orderkey"),
        round(col("l_extendedprice") * 100).cast("long").as("__cents"),
        col("l_shipdate"))
      val (rOld, rDelta) = (o.filter(col("o_orderdate") < rCut),
        o.filter(col("o_orderdate") >= rCut))
      val (sOld, sDelta) = (l.filter(col("l_shipdate") < sCut),
        l.filter(col("l_shipdate") >= sCut))
      def partials(df: DataFrame): DataFrame =
        df.groupBy("o_custkey").agg(count(lit(1)).as("n_lines"),
          sum(col("__cents")).as("rev_cents"))
      val state = partials(rOld.join(sOld, Seq("o_orderkey")))
      val delta = partials(joinDelta(rOld, rDelta, sOld, sDelta,
        Seq("o_orderkey")))
      state.unionByName(delta)
        .groupBy("o_custkey")
        .agg(sum(col("n_lines")).cast("long").as("n_lines"),
          sum(col("rev_cents")).as("rev_cents"))
        .orderBy("o_custkey")
    },

    // ---- incremental aggregate-view maintenance ----
    // state (events before the cutoff) merged with one delta batch
    // (events on/after it) must equal the full recompute — the oracle IS
    // the full recompute, so a green row proves the merge algebra.
    "e20_incremental_agg" -> QueryDef.sql(
      """SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events
        |GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      val cutoff = lit("2024-01-25").cast("timestamp")
      val state = aggState(e.filter(col("ts") < cutoff))
      val delta = aggState(e.filter(col("ts") >= cutoff))
      mergeAggState(state, delta)
        .select(col("user_id"), col("event_type"),
          col("cnt").cast("long").as("cnt"), col("sum_cents"))
        .orderBy("user_id", "event_type")
    },

    // ---- integer-exact time-decay engagement ----
    "e21_decay_score" -> QueryDef.sql(
      """WITH m AS (SELECT max(epoch_us(ts)) AS maxus FROM events),
        |s AS (
        |  SELECT user_id,
        |    CAST(round(value * 100) AS BIGINT) *
        |      (CAST(1 AS BIGINT) << CAST(10 - least(
        |         (maxus - epoch_us(ts)) // 604800000000, 10) AS INTEGER))
        |      AS w
        |  FROM events, m)
        |SELECT user_id, CAST(sum(w) AS BIGINT) AS decay_score,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      decayScores(Tables.events(s, d)).orderBy("user_id")
    },

    // ---- position-based multi-touch attribution ----
    "e22_multi_touch" -> QueryDef.sql(
      """WITH conv AS (
        |  SELECT user_id, event_id AS conv_id, ts AS conv_ts,
        |    CAST(round(value * 100) AS BIGINT) AS conv_cents
        |  FROM events WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT user_id, event_id AS touch_id, event_type AS touch_type,
        |    ts AS touch_ts
        |  FROM events WHERE event_type IN ('view', 'click')),
        |paired AS (
        |  SELECT t.touch_type, c.conv_id, c.conv_cents,
        |    count(*) OVER (PARTITION BY c.conv_id) AS n,
        |    row_number() OVER (PARTITION BY c.conv_id
        |      ORDER BY t.touch_ts, t.touch_id) AS rn,
        |    row_number() OVER (PARTITION BY c.conv_id
        |      ORDER BY t.touch_ts DESC, t.touch_id DESC) AS rd
        |  FROM touch t JOIN conv c ON t.user_id = c.user_id
        |  WHERE t.touch_ts < c.conv_ts
        |    AND epoch_us(c.conv_ts) - epoch_us(t.touch_ts) <= 604800000000),
        |credited AS (
        |  SELECT touch_type, conv_cents,
        |    CASE WHEN n = 1 THEN 10000
        |         WHEN n = 2 THEN 5000
        |         WHEN rn = 1 OR rd = 1 THEN 4000
        |         ELSE 2000 // (n - 2) +
        |           CASE WHEN rd = 2 THEN 2000 % (n - 2) ELSE 0 END
        |    END AS bp
        |  FROM paired)
        |SELECT touch_type, CAST(sum(bp * conv_cents) AS BIGINT) AS credit_cents_bp,
        |  CAST(count(*) AS BIGINT) AS n_touches
        |FROM credited GROUP BY touch_type
        |ORDER BY touch_type""".stripMargin) { (s, d) =>
      positionAttribution(Tables.events(s, d)).orderBy("touch_type")
    }
  )
}
