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
    * Overflow envelope: |P| ≤ 5·T·n², so BIGINT holds while n²·T <
    * 1.8e18 — years of daily partitions (n ≤ 4·10³) at up to 10¹¹
    * events per type. Beyond that, scale y by 4 only (k becomes T/n·¼
    * rounded) or bucket coarser.
    */
  def cusumDaily(events: DataFrame): DataFrame = {
    val per = Window.partitionBy(col("event_type"))
    val ord = Window.partitionBy(col("event_type")).orderBy(col("day"))
    events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
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
