package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics batch (round 11): HITS link analysis, CUSUM changepoint
  * detection, and graded n-gram contamination scoring. All oracle-checked.
  *
  * Float discipline: HITS follows the g1 per-round 12-d.p. rounding
  * contract (Graph.hits); CUSUM is EXACT BIGINT end to end (the
  * positive-part recursion reduced to prefix-sum windows); the
  * contamination fraction is one IEEE division of exact BIGINT operands.
  */
object Analytics3 {

  /** One-sided CUSUM changepoint statistic over per-day event counts
    * (Page, Biometrika 1954): S_t = max(0, S_{t-1} + (x_t − μ − k)) with
    * drift allowance k = μ/4, flagging sustained upward shifts in daily
    * volume — the pipeline-monitoring primitive ("did a source start
    * over-emitting?").
    *
    * The recursion is NOT computed recursively: max(0, ·)-folding has
    * the closed form S_t = P_t − min(0, min_{j≤t} P_j) where P is the
    * prefix sum of residuals — two ordered windows (running sum +
    * running min), fully parallel within each event_type partition and
    * identical in any engine with windowed aggregates. Residuals are
    * kept in EXACT integer units scaled by 4n (y = 4n·x − 5T where n =
    * #days, T = Σx, so y = 4n·(x − T/n − T/(4n))): no float mean, no
    * drift, hash-exact. Alarm when S ≥ 8T (scaled: cumulative excess ≥
    * 2× the daily mean); `cusum_rel` = S/(4T) rescales to
    * mean-days-of-excess units as a cast-then-divide of identical
    * integers on every engine.
    *
    * Overflow envelope: P_t = 4n·X_t − 5T·t with X_t ≤ T and t ≤ n, so
    * |P| ≤ 5·T·n (LINEAR in n) and BIGINT holds while n·T < 1.8e18 —
    * years of daily partitions (n ≤ 4·10³) at up to 10¹⁴ events per
    * type. Beyond that, scale y by 4 only (k becomes T/n·¼ rounded) or
    * bucket coarser.
    */
  def cusumDaily(events: DataFrame): DataFrame =
    cusumFromDaily(events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt")))

  /** [[cusumDaily]]'s finisher over an already-materialized
    * (event_type, day, cnt) grid — the shape an incremental view
    * maintains (st15 merges per-batch count partials into generations
    * and runs this on the final one; count-sum merging is associative,
    * so the streamed statistic equals the batch recompute). */
  def cusumFromDaily(daily: DataFrame): DataFrame = {
    val per = Window.partitionBy(col("event_type"))
    val ord = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily
      .withColumn("n", count(lit(1)).over(per))
      .withColumn("t", sum(col("cnt")).over(per))
      .withColumn("y",
        lit(4L) * col("n") * col("cnt") - lit(5L) * col("t"))
      .withColumn("p", sum(col("y")).over(ord))
      .withColumn("s", col("p") - least(lit(0L), min(col("p")).over(ord)))
      .select(col("event_type"), col("day"), col("cnt").cast("long").as("cnt"),
        col("s").as("cusum"),
        (col("s") >= lit(8L) * col("t")).as("alarm"),
        (col("s").cast("double") / (lit(4L) * col("t")).cast("double"))
          .as("cusum_rel"))
  }

  /** Theil-Sen robust trend per event type (Theil 1950 / Sen 1968): the
    * median of all pairwise slopes between daily volumes — immune to the
    * outlier days that wreck an OLS fit (a23's complement for dirty
    * telemetry). Runs on the (type, day) GRID, so the pair self-join is
    * observation-span-bounded (days² per type), never event-sized; the
    * only event-sized pass is the daily groupBy. Slopes are single IEEE
    * divisions of exact integer deltas (Δcount/Δdays) — bit-identical
    * cross-engine — and the median is the DISCRETE lower-median order
    * statistic (rank ⌊(n+1)/2⌋ under the total (slope, d1, d2) order),
    * never an interpolated average (the a14 trap).
    */
  def theilSenDaily(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("event_type"),
        datediff(col("day"), lit("1970-01-01").cast("date")).cast("long")
          .as("di"),
        col("cnt"))
    val a = daily.select(col("event_type"), col("di").as("d1"),
      col("cnt").as("c1"))
    val b = daily.select(col("event_type"), col("di").as("d2"),
      col("cnt").as("c2"))
    val pairs = a.join(b, Seq("event_type")).filter(col("d1") < col("d2"))
      .select(col("event_type"),
        ((col("c2") - col("c1")).cast("double") /
          (col("d2") - col("d1")).cast("double")).as("slope"),
        col("d1"), col("d2"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("slope"), col("d1"), col("d2"))
    pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("np", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .filter(col("rn") === floor((col("np") + 1) / lit(2)))
      .select(col("event_type"), col("np").cast("long").as("n_pairs"),
        col("slope"))
  }

  /** Two-sample Kolmogorov-Smirnov drift statistic, each source vs the
    * rest of the corpus, over the doc-length distribution: D_s =
    * sup_t |ECDF_s(t) − ECDF_rest(t)| — the distribution-shape
    * complement to t34's KL-over-buckets (KS needs no binning choice
    * and catches shifts KL's coarse buckets blur). The sup is exact:
    * both ECDFs are step functions, so it is attained on the pooled
    * distinct-value grid. Everything rides that (source × distinct
    * value) grid — value-cardinality-bounded, never doc-sized — and the
    * per-source cumulative windows are distinct-value-length. Each ECDF
    * is an exact-BIGINT quotient and the max runs over identically-
    * computed doubles: no rounding needed (identical operands, identical
    * single division, cross-engine).
    */
  def ksSourceDrift(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy(col("source"), col("n_chars"))
      .agg(count(lit(1)).as("c"))
    val valTot = docs.groupBy(col("n_chars")).agg(count(lit(1)).as("ct"))
    val srcTot = docs.groupBy(col("source")).agg(count(lit(1)).as("ns"))
    val nAll = broadcast(docs.agg(count(lit(1)).as("n")))
    val w = Window.partitionBy(col("source")).orderBy(col("n_chars"))
    broadcast(srcTot).crossJoin(valTot)
      .join(counts, Seq("source", "n_chars"), "left")
      .withColumn("cs", sum(coalesce(col("c"), lit(0L))).over(w))
      .withColumn("ca", sum(col("ct")).over(w))
      .join(nAll)
      .withColumn("diff", abs(
        col("cs").cast("double") / col("ns").cast("double") -
          (col("ca") - col("cs")).cast("double") /
            (col("n") - col("ns")).cast("double")))
      .groupBy(col("source"), col("ns"))
      .agg(max(col("diff")).as("d_stat"))
      .select(col("source"), col("ns").cast("long").as("n_docs"),
        col("d_stat"))
  }

  /** Gini coefficient of per-user event volume — the engagement-
    * inequality scalar (0 = uniform, →1 = one user generates
    * everything; the source-balance / power-user diagnostic). Uses the
    * prefix-sum identity Σᵢ i·xᵢ = (n+1)·T − Σᵢ cumᵢ so the only
    * ordered pass is ONE [[Scale.groupRunningSum]] (the two-phase
    * distributed prefix sum — no single-task global window), and
    * G = ((n+1)·T − 2·Σ cum) / (n·T) comes out as one IEEE division of
    * exact BIGINTs. Ties in x rank arbitrarily by user_id — Gini is
    * invariant to the order within a tie. Overflow envelope: (n+1)·T
    * must stay under 2^63 (n·T < 9·10¹⁸ — 10⁶ users × 10¹² events);
    * beyond that, lift the three scalars to decimal(38,0).
    */
  def giniEngagement(events: DataFrame): DataFrame = {
    val per = events.groupBy(col("user_id")).agg(count(lit(1)).as("x"))
      .withColumn("__g", lit(1))
    Scale.groupRunningSum(per, "__g", orderCol = "x", idCol = "user_id",
        weightCol = "x", outCol = "cum")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("t"),
        sum(col("cum")).as("s"))
      .select(col("n").cast("long").as("n_users"),
        col("t").cast("long").as("total_events"),
        (((col("n") + 1) * col("t") - lit(2L) * col("s")).cast("double") /
          (col("n") * col("t")).cast("double")).as("gini"))
  }

  def defs: Map[String, QueryDef] = Map(

    // HITS hubs/authorities over the event-transition graph — the same
    // derived relation g1 ranks with PageRank; the oracle unrolls the
    // identical 3-round L1-normalized recurrence with the 12-d.p.
    // half-step rounding contract (Graph.hits scaladoc).
    "g10_hits" -> QueryDef.sql(
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
        |h0 AS (SELECT node, 1.0::DOUBLE / n AS h FROM nodes, nn),
        |ac1 AS (SELECT e.dst AS node, round(sum(e.w * h.h), 12) AS ar
        |        FROM edges e JOIN h0 h ON h.node = e.src GROUP BY e.dst),
        |ar1 AS (SELECT n.node, coalesce(c.ar, 0.0::DOUBLE) AS ar
        |        FROM nodes n LEFT JOIN ac1 c ON c.node = n.node),
        |at1 AS (SELECT round(sum(ar), 12) AS at FROM ar1),
        |a1 AS (SELECT node, round(ar / at, 12) AS a FROM ar1, at1),
        |hc1 AS (SELECT e.src AS node, round(sum(e.w * a.a), 12) AS hr
        |        FROM edges e JOIN a1 a ON a.node = e.dst GROUP BY e.src),
        |hr1 AS (SELECT n.node, coalesce(c.hr, 0.0::DOUBLE) AS hr
        |        FROM nodes n LEFT JOIN hc1 c ON c.node = n.node),
        |ht1 AS (SELECT round(sum(hr), 12) AS ht FROM hr1),
        |h1 AS (SELECT node, round(hr / ht, 12) AS h FROM hr1, ht1),
        |ac2 AS (SELECT e.dst AS node, round(sum(e.w * h.h), 12) AS ar
        |        FROM edges e JOIN h1 h ON h.node = e.src GROUP BY e.dst),
        |ar2 AS (SELECT n.node, coalesce(c.ar, 0.0::DOUBLE) AS ar
        |        FROM nodes n LEFT JOIN ac2 c ON c.node = n.node),
        |at2 AS (SELECT round(sum(ar), 12) AS at FROM ar2),
        |a2 AS (SELECT node, round(ar / at, 12) AS a FROM ar2, at2),
        |hc2 AS (SELECT e.src AS node, round(sum(e.w * a.a), 12) AS hr
        |        FROM edges e JOIN a2 a ON a.node = e.dst GROUP BY e.src),
        |hr2 AS (SELECT n.node, coalesce(c.hr, 0.0::DOUBLE) AS hr
        |        FROM nodes n LEFT JOIN hc2 c ON c.node = n.node),
        |ht2 AS (SELECT round(sum(hr), 12) AS ht FROM hr2),
        |h2 AS (SELECT node, round(hr / ht, 12) AS h FROM hr2, ht2),
        |ac3 AS (SELECT e.dst AS node, round(sum(e.w * h.h), 12) AS ar
        |        FROM edges e JOIN h2 h ON h.node = e.src GROUP BY e.dst),
        |ar3 AS (SELECT n.node, coalesce(c.ar, 0.0::DOUBLE) AS ar
        |        FROM nodes n LEFT JOIN ac3 c ON c.node = n.node),
        |at3 AS (SELECT round(sum(ar), 12) AS at FROM ar3),
        |a3 AS (SELECT node, round(ar / at, 12) AS a FROM ar3, at3),
        |hc3 AS (SELECT e.src AS node, round(sum(e.w * a.a), 12) AS hr
        |        FROM edges e JOIN a3 a ON a.node = e.dst GROUP BY e.src),
        |hr3 AS (SELECT n.node, coalesce(c.hr, 0.0::DOUBLE) AS hr
        |        FROM nodes n LEFT JOIN hc3 c ON c.node = n.node),
        |ht3 AS (SELECT round(sum(hr), 12) AS ht FROM hr3),
        |h3 AS (SELECT node, round(hr / ht, 12) AS h FROM hr3, ht3)
        |SELECT a.node, round(a.a, 6) AS auth, round(h.h, 6) AS hub
        |FROM a3 a JOIN h3 h ON h.node = a.node
        |ORDER BY a.node""".stripMargin) { (s, d) =>
      val edges = Behavior
        .eventTransitions(Tables.events(s, d), maxGapMinutes = 30)
        .select(col("from_type").as("src"), col("to_type").as("dst"),
          col("transitions").as("weight"))
      Graph.hits(edges, iterations = 3)
        .select(col("node"), round(col("auth"), 6).as("auth"),
          round(col("hub"), 6).as("hub"))
        .orderBy("node")
    },

    // CUSUM changepoints over daily event volume — exact-integer
    // positive-part recursion via prefix-sum windows (cusumDaily).
    "e27_cusum" -> QueryDef.sql(
      """WITH d AS (
        |  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, day, cnt,
        |    count(*) OVER p AS n, sum(cnt) OVER p AS t
        |  FROM d WINDOW p AS (PARTITION BY event_type)),
        |y AS (
        |  SELECT *, 4 * n * cnt - 5 * t AS y FROM w),
        |pp AS (
        |  SELECT *, sum(y) OVER (PARTITION BY event_type ORDER BY day) AS p
        |  FROM y),
        |r AS (
        |  SELECT *, least(0, min(p)
        |    OVER (PARTITION BY event_type ORDER BY day)) AS mn
        |  FROM pp)
        |SELECT event_type, day, CAST(cnt AS BIGINT) AS cnt,
        |  CAST(p - mn AS BIGINT) AS cusum,
        |  (p - mn) >= 8 * t AS alarm,
        |  CAST(p - mn AS DOUBLE) / CAST(4 * t AS DOUBLE) AS cusum_rel
        |FROM r
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      cusumDaily(Tables.events(s, d)).orderBy("event_type", "day")
    },

    // robust daily-volume trend per event type — pairwise-slope lower
    // median on the (type, day) grid (theilSenDaily).
    "e28_theilsen_trend" -> QueryDef.sql(
      """WITH d AS (
        |  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |dd AS (
        |  SELECT event_type,
        |    date_diff('day', DATE '1970-01-01', CAST(day AS DATE)) AS di, cnt
        |  FROM d),
        |p AS (
        |  SELECT a.event_type,
        |    CAST(b.cnt - a.cnt AS DOUBLE) / CAST(b.di - a.di AS DOUBLE) AS slope,
        |    a.di AS d1, b.di AS d2
        |  FROM dd a JOIN dd b
        |    ON a.event_type = b.event_type AND a.di < b.di),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY slope, d1, d2) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS np
        |  FROM p)
        |SELECT event_type, CAST(np AS BIGINT) AS n_pairs, slope FROM r
        |WHERE rn = (np + 1) // 2
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      theilSenDaily(Tables.events(s, d)).orderBy("event_type")
    },

    // per-source distribution drift: exact two-sample KS statistic of
    // each source's doc-length ECDF against the rest (ksSourceDrift).
    "a34_ks_drift" -> QueryDef.sql(
      """WITH counts AS (
        |  SELECT source, n_chars, count(*) AS c FROM documents GROUP BY 1, 2),
        |vt AS (SELECT n_chars, count(*) AS ct FROM documents GROUP BY 1),
        |st AS (SELECT source, count(*) AS ns FROM documents GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM documents),
        |grid AS (SELECT s.source, s.ns, v.n_chars, v.ct
        |         FROM st s CROSS JOIN vt v),
        |cum AS (
        |  SELECT g.source, g.ns, g.n_chars,
        |    sum(coalesce(c.c, 0)) OVER w AS cs,
        |    sum(g.ct) OVER w AS ca
        |  FROM grid g LEFT JOIN counts c
        |    ON c.source = g.source AND c.n_chars = g.n_chars
        |  WINDOW w AS (PARTITION BY g.source ORDER BY g.n_chars))
        |SELECT source, CAST(ns AS BIGINT) AS n_docs,
        |  max(abs(CAST(cs AS DOUBLE) / CAST(ns AS DOUBLE)
        |      - CAST(ca - cs AS DOUBLE) / CAST(n - ns AS DOUBLE))) AS d_stat
        |FROM cum, nn GROUP BY source, ns
        |ORDER BY source""".stripMargin) { (s, d) =>
      ksSourceDrift(Tables.documents(s, d)).orderBy("source")
    },

    // engagement-inequality Gini over per-user event volume via the
    // prefix-sum identity (giniEngagement — one distributed prefix sum).
    "a35_gini_engagement" -> QueryDef.sql(
      """WITH per AS (SELECT user_id, count(*) AS x FROM events GROUP BY 1),
        |c AS (SELECT x, sum(x) OVER (ORDER BY x, user_id) AS cum FROM per),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS t,
        |        CAST(sum(cum) AS BIGINT) AS s FROM c)
        |SELECT n AS n_users, t AS total_events,
        |  CAST((n + 1) * t - 2 * s AS DOUBLE) / CAST(n * t AS DOUBLE) AS gini
        |FROM a""".stripMargin) { (s, d) =>
      giniEngagement(Tables.events(s, d))
    },

    // graded contamination: fraction of each corpus doc's distinct
    // 8-gram shingles present in the held-out eval slice (d10's split);
    // exact quotient of BIGINTs, two-phase hashed-candidate shape.
    "d17_contamination_frac" -> QueryDef.sql(
      """WITH ws AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                x -> x <> '') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
        |         WHEN len(w) < 8 THEN [array_to_string(w, ' ')]
        |         ELSE list_transform(range(len(w) - 7),
        |                i -> array_to_string(list_slice(w, i + 1, i + 8), ' ')) END) AS g
        |  FROM ws),
        |ev AS (SELECT DISTINCT unnest(g) AS t FROM sh WHERE doc_id % 7 = 0),
        |corp AS (SELECT doc_id, g FROM sh WHERE doc_id % 7 <> 0),
        |hits AS (
        |  SELECT p.doc_id, count(*) AS n_hits
        |  FROM (SELECT doc_id, unnest(g) AS t FROM corp) p
        |  JOIN ev USING (t) GROUP BY 1)
        |SELECT c.doc_id, CAST(len(c.g) AS BIGINT) AS n_shingles,
        |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        |  CASE WHEN len(c.g) = 0 THEN 0.0::DOUBLE
        |       ELSE CAST(coalesce(h.n_hits, 0) AS DOUBLE)
        |            / CAST(len(c.g) AS DOUBLE) END AS contamination
        |FROM corp c LEFT JOIN hits h USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      Dedup.contaminationScore(
          docs.filter(col("doc_id") % 7 =!= 0),
          docs.filter(col("doc_id") % 7 === 0), n = 8)
        .orderBy("doc_id")
    }
  )
}
