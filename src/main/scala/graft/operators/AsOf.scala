package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-earlier-timestamp) join — SURVEY.md §2.3 J3, motivated by
  * aligning weather series with an events stream for ML features
  * (reference `README.md:18`).
  *
  * Spark has no built-in as-of join. The naive formulation
  * (`l.join(r, keys && r.ts <= l.ts)` + `row_number() == 1`) materializes
  * every (probe, earlier-build) pair before pruning — quadratic per key,
  * hopeless at 100 TB. Instead we use the union + window pattern:
  *
  *   1. union build and probe rows, tagged (build sorts before probe on
  *      timestamp ties so `<=` semantics hold);
  *   2. one window over (key) ordered by (ts, tag) carrying the last
  *      non-null build value forward;
  *   3. keep probe rows.
  *
  * Cost: ONE shuffle on the key (the union is shuffled once for the
  * window sort) — linear, skew-tolerant via AQE, and identical in shape
  * at any scale.
  */
object AsOf {

  /** Generic as-of join. For each row of `probe`, attaches the values of
    * `carry` columns from the latest `build` row with
    * `build.tsCol <= probe.tsCol`, matching on `keys`. Carried columns are
    * emitted as `asof_<name>`; probe columns pass through unchanged.
    */
  def asofJoin(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      tsCol: String,
      carry: Seq[String]): DataFrame = {
    val probeCols = probe.columns
    // Align schemas: probe side gets null carry columns, build side only
    // participates with keys + ts + carry.
    val carried = carry.map(c => s"asof_$c")
    val buildSide = build.select(
      (keys.map(col) :+ col(tsCol)) ++
        carry.map(c => col(c).as(s"asof_$c")) :+ lit(0).as("__asof_tag"): _*)
    val extra = probeCols.filterNot(c => keys.contains(c) || c == tsCol)
    val buildAligned = extra.foldLeft(buildSide)((df, c) =>
      df.withColumn(c, lit(null).cast(probe.schema(c).dataType)))
    val probeAligned = carried.zip(carry).foldLeft(
      probe.withColumn("__asof_tag", lit(1)))((df, cc) =>
      df.withColumn(cc._1, lit(null).cast(build.schema(cc._2).dataType)))

    val unioned = probeAligned.unionByName(buildAligned)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__asof_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = carried.foldLeft(unioned)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    filled.filter(col("__asof_tag") === 1)
      .select(probeCols.map(col) ++ carried.map(col): _*)
  }

  /** Specialized probe used by the correctness gate: for each `probeType`
    * event, the greatest `buildType` event timestamp at-or-before it for
    * the same user. Equivalent SQL: correlated `max(ts)` subquery.
    */
  def lastEventBefore(
      events: DataFrame,
      probeType: String,
      buildType: String): DataFrame = {
    val tagged = events
      .filter(col("event_type").isin(probeType, buildType))
      .withColumn("__tag", when(col("event_type") === buildType, 0).otherwise(1))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_purchase_ts",
        max(when(col("__tag") === 0, col("ts"))).over(w))
      .filter(col("__tag") === 1)
      .select("event_id", "last_purchase_ts")
      .orderBy("event_id")
  }
}
