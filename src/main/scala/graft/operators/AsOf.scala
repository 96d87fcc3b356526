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
    *
    * The carry columns travel as ONE struct and a single
    * `last(ignoreNulls)` picks the latest build ROW — per-column lasts
    * would skip a null field of the latest row and mix values from
    * different build rows (a latest reading with a null sensor must
    * carry that null, not resurrect an older reading).
    */
  def asofJoin(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      tsCol: String,
      carry: Seq[String]): DataFrame = {
    val probeCols = probe.columns
    // Align schemas: probe side gets a null carry struct, build side only
    // participates with keys + ts + the carry struct.
    val carryType = org.apache.spark.sql.types.StructType(
      carry.map(c => org.apache.spark.sql.types.StructField(
        c, build.schema(c).dataType, nullable = true)))
    val buildSide = build.select(
      (keys.map(col) :+ col(tsCol)) :+
        struct(carry.map(col): _*).as("__asof_row") :+
        lit(0).as("__asof_tag"): _*)
    val extra = probeCols.filterNot(c => keys.contains(c) || c == tsCol)
    val buildAligned = extra.foldLeft(buildSide)((df, c) =>
      df.withColumn(c, lit(null).cast(probe.schema(c).dataType)))
    val probeAligned = probe
      .withColumn("__asof_tag", lit(1))
      .withColumn("__asof_row", lit(null).cast(carryType))

    val unioned = probeAligned.unionByName(buildAligned)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__asof_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__asof_row",
      last(col("__asof_row"), ignoreNulls = true).over(w))
    filled.filter(col("__asof_tag") === 1)
      .select(probeCols.toIndexedSeq.map(col) ++
        carry.map(c => col(s"__asof_row.$c").as(s"asof_$c")): _*)
  }

  /** FORWARD as-of join (pandas `merge_asof(direction="forward")`):
    * for each probe row, the EARLIEST build row with
    * `build.tsCol >= probe.tsCol` — "the next scheduled thing after
    * this event". Implemented as [[asofJoin]] on the NEGATED
    * microsecond axis (order reversal turns nearest-later into
    * nearest-earlier; the build-before-probe tie rule becomes >=
    * inclusive, mirroring the backward join's <=). Same one-shuffle
    * union+window plan; the negated column never leaves the operator.
    */
  def asofJoinForward(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      tsCol: String,
      carry: Seq[String]): DataFrame = {
    val neg = "__asof_neg"
    val p = probe.withColumn(neg, -unix_micros(col(tsCol).cast("timestamp")))
    val b = build.withColumn(neg, -unix_micros(col(tsCol).cast("timestamp")))
    asofJoin(p, b, keys, neg, carry).drop(neg)
  }

  /** [[asofJoin]] with a max-staleness bound (pandas `merge_asof`'s
    * `tolerance`): carried values are nulled when the matched build row
    * is older than `toleranceSeconds` — "the latest reading, but only if
    * it is still fresh". All carry columns null TOGETHER (they come from
    * one build row; the bound either accepts or rejects that row whole),
    * preserving asofJoin's no-mixed-rows guarantee. Same single-shuffle
    * plan; the bound is a scan-local post-projection.
    */
  def asofJoinTolerant(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      tsCol: String,
      carry: Seq[String],
      toleranceSeconds: Long): DataFrame = {
    require(toleranceSeconds >= 0, "toleranceSeconds must be non-negative")
    val joined = asofJoin(probe,
      build.withColumn("__asof_build_ts", col(tsCol)),
      keys, tsCol, carry :+ "__asof_build_ts")
    val fresh = col("asof___asof_build_ts").isNotNull &&
      unix_micros(col(tsCol).cast("timestamp")) -
        unix_micros(col("asof___asof_build_ts").cast("timestamp")) <=
        toleranceSeconds * 1000000L
    carry.foldLeft(joined) { (df, c) =>
      df.withColumn(s"asof_$c", when(fresh, col(s"asof_$c")))
    }.drop("asof___asof_build_ts")
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
