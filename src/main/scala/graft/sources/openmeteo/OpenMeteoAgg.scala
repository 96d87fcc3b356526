package graft.sources.openmeteo

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._

import graft.weather.WeatherSchemas

/** Aggregate-pushdown scan (SURVEY.md §4 "aggregate pushdown" — the
  * reference asks the source for pre-computed daily rollups instead of
  * fetching hourly rows, `server.py:219-223`): a global MIN/MAX over an
  * hourly variable is answered from the payload's sibling DAILY block
  * (max of per-day maxes), reading two orders of magnitude fewer values
  * and shipping ONE row per scan instead of the full series.
  *
  * Pushed only when exactness is provable: no grouping, every aggregate
  * maps to a daily counterpart (min/max — sums are excluded because the
  * source's daily sums are rounded), and any pushed time bounds sit on
  * local-day boundaries. Everything else bails to the native path — the
  * golden equivalence pushed ≡ native is asserted in
  * OpenMeteoSourceSpec.
  *
  * One input partition: the result is a single combined row (complete
  * pushdown contract).
  */
final case class PushedAgg(kind: String, dailyCol: String)

/** `groupCols` ⊆ {latitude, longitude} selects the GROUPED variant:
  * per-location MIN/MAX rows (the multi-location fleet query). Grouped
  * pushdown is PARTIAL — Spark keeps the final merge aggregate — so
  * partitions may split or repeat a location freely and the scan
  * parallelism survives; the global (no grouping) variant stays a
  * complete pushdown returning exactly one row.
  */
class OpenMeteoAggScan(opts: OpenMeteoOptions, aggs: Seq[PushedAgg],
    loMicros: Option[Long], hiMicros: Option[Long],
    groupCols: Seq[String] = Seq.empty)
    extends Scan with Batch {

  override def readSchema(): StructType =
    StructType(groupCols.map(c =>
      StructField(c, DoubleType, nullable = false)) ++
      aggs.zipWithIndex.map { case (a, i) =>
        StructField(s"${a.kind}_${a.dailyCol}_$i", DoubleType, nullable = true)
      })

  override def toBatch: Batch = this

  override def description(): String =
    s"openmeteo AGG gran=daily PushedAggregates: " +
      s"[${aggs.map(a => s"${a.kind}(${a.dailyCol})").mkString(", ")}] " +
      (if (groupCols.nonEmpty) s"PushedGroupBy: [${groupCols.mkString(", ")}] "
       else "") +
      s"PushedTimeRange: [${loMicros.getOrElse("-inf")}, ${hiMicros.getOrElse("+inf")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(opts.blockUnitCount, 1)
    if (groupCols.isEmpty)
      // ONE partition over all blocks: complete pushdown returns one row
      Array(OpenMeteoPartition((0 until opts.blockUnitCount).toArray,
        loMicros, hiMicros))
    else {
      // partial pushdown merges on top: stride the blocks like the row
      // scan so a 10k-location fleet aggregates in parallel
      val parts = math.min(n, math.max(opts.maxPartitions, 1))
      (0 until parts).map(p =>
        OpenMeteoPartition((p until opts.blockUnitCount by parts).toArray,
          loMicros, hiMicros): InputPartition).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    OpenMeteoAggReaderFactory(opts, aggs, groupCols)
}

final case class OpenMeteoAggReaderFactory(opts: OpenMeteoOptions,
    aggs: Seq[PushedAgg], groupCols: Seq[String] = Seq.empty)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[OpenMeteoPartition]
    new OpenMeteoAggReader(opts, aggs, part.blockIndices, part.lo, part.hi,
      groupCols)
  }
}

/** Combines the per-day pre-aggregates of every block: one row total
  * (global complete pushdown, emitted even when empty) or one row per
  * distinct group key seen in this partition's blocks (grouped partial
  * pushdown — Spark's final aggregate merges across partitions).
  */
class OpenMeteoAggReader(opts: OpenMeteoOptions, aggs: Seq[PushedAgg],
    blockIndices: Array[Int], lo: Option[Long], hi: Option[Long],
    groupCols: Seq[String] = Seq.empty)
    extends PartitionReader[InternalRow] {

  // local-day bounds derived from the (day-aligned, validated at push
  // time) NTZ micro bounds
  private val loDay = lo.map(_ / OpenMeteoAggReader.DayMicros)
  private val hiDay = hi.map(_ / OpenMeteoAggReader.DayMicros)

  private var done = false
  // group key (empty Seq = the global row) -> per-agg accumulator
  private val groups =
    scala.collection.mutable.LinkedHashMap[Seq[Double], Array[java.lang.Double]]()
  private var rowIter: Iterator[(Seq[Double], Array[java.lang.Double])] = Iterator.empty
  private var current: (Seq[Double], Array[java.lang.Double]) = _

  // same decorator stack as the row scan (CLAUDE.md: policies stay on
  // the scan path) — retry ALWAYS, rate limit when configured
  private lazy val transport: Transport = {
    val base: Transport = opts.httpBaseUrl match {
      case Some(url) => new HttpTransport(url)
      case None => new LineOfflineTransport(opts.path, blockIndices, opts.chaosFailFirst)
    }
    val retried =
      new RetryingTransport(base, RetryPolicy(opts.maxRetries, opts.backoffBaseMs))
    if (opts.rateLimitMs > 0) new RateLimitedTransport(retried, opts.rateLimitMs)
    else retried
  }

  private def fetchParams(blockIdx: Int): Map[String, String] =
    if (opts.liveMode) {
      val (plat, plon) = opts.locations(blockIdx)
      // the pushed (day-aligned) window must reach the remote too — a
      // server default window would silently truncate the aggregate
      val dates = Map(
        "start_date" -> loDay.map(d => java.time.LocalDate.ofEpochDay(d).toString),
        "end_date" -> hiDay.map(d => java.time.LocalDate.ofEpochDay(d - 1).toString)
      ).collect { case (k, Some(v)) => k -> v }
      Map("latitude" -> plat.toString, "longitude" -> plon.toString,
        WeatherSchemas.GranDaily -> aggs.map(_.dailyCol).distinct.mkString(",")) ++
        dates
    } else Map("block" -> blockIdx.toString)

  private def combine(): Unit = {
    val mapper = new ObjectMapper()
    blockIndices.foreach { idx =>
      val root = mapper.readTree(transport.fetch(fetchParams(idx)))
      // group key from the payload's own coordinates — blocks repeating a
      // location accumulate into one group within this partition. A
      // payload lacking a pushed group column is a malformed response:
      // fail with the block + column named, not an opaque NPE.
      val key: Seq[Double] = groupCols.map { c =>
        val node = root.get(c)
        if (node == null || node.isNull)
          throw new IllegalStateException(
            s"openmeteo aggregate payload for block $idx has no '$c' field; " +
              "cannot form the pushed group key (malformed source response)")
        node.asDouble()
      }
      val acc = groups.getOrElseUpdate(key,
        Array.fill[java.lang.Double](aggs.size)(null))
      val daily = root.get(WeatherSchemas.GranDaily)
      if (daily != null && !daily.isNull && daily.get("time") != null) {
        val times = daily.get("time")
        (0 until times.size()).foreach { i =>
          val day = java.time.LocalDate.parse(times.get(i).asText()).toEpochDay
          if (loDay.forall(day >= _) && hiDay.forall(day < _)) {
            aggs.zipWithIndex.foreach { case (a, k) =>
              val arr = daily.get(a.dailyCol)
              if (arr != null && i < arr.size() && !arr.get(i).isNull) {
                val v = arr.get(i).asDouble()
                acc(k) =
                  if (acc(k) == null) v
                  else if (a.kind == "MIN") math.min(acc(k), v)
                  else if (a.kind == "SUM") acc(k) + v
                  else math.max(acc(k), v)
              }
            }
          }
        }
      }
    }
  }

  override def next(): Boolean = {
    if (!done) {
      combine()
      done = true
      rowIter =
        if (groupCols.isEmpty)
          // complete-pushdown contract: exactly one (possibly all-null) row
          Iterator((Seq.empty[Double],
            groups.getOrElse(Seq.empty, Array.fill[java.lang.Double](aggs.size)(null))))
        else groups.iterator
    }
    val has = rowIter.hasNext
    if (has) current = rowIter.next()
    has
  }

  override def get(): InternalRow = {
    val (key, acc) = current
    new GenericInternalRow(
      key.map(v => java.lang.Double.valueOf(v): Any).toArray ++
        acc.map(v =>
          if (v == null) null else java.lang.Double.valueOf(v.doubleValue()): Any))
  }

  override def close(): Unit = ()
}

object OpenMeteoAggReader {
  val DayMicros: Long = 24L * 3600L * 1000000L
}
