package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SpaceSaving heavy hitters: exact-regime equivalence to GROUP BY,
  * approximate-regime guarantees (overestimate bounds, guaranteed
  * survival of true heavy hitters), merge behavior across partitions,
  * and the SQL registration path.
  */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] =
    df.select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.count"), col("e.err"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("exact regime: equals GROUP BY counts, err 0, ordered (cnt desc, item asc)") {
    val data = (1 to 500).map(i => s"k${i % 23}").toDF("k").repartition(7)
    val hh = rows(data.agg(HeavyHitters.heavyHitters(col("k"), 64).as("hh")))
    val exact = data.groupBy("k").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (k, c) => (-c, k) }.toSeq
    assert(hh.map(t => (t._1, t._2)) === exact)
    assert(hh.forall(_._3 == 0L), "no eviction may happen below capacity")
  }

  test("approximate regime: bounds hold and true heavy hitters survive") {
    // skewed stream: 'whale' 400×, 'shark' 120×, 60 minnows 1-8× each
    val skewed = (Seq.fill(400)("whale") ++ Seq.fill(120)("shark") ++
      (1 to 60).flatMap(i => Seq.fill(i % 8 + 1)(s"m$i")))
    val n = skewed.size.toLong
    val trueCounts = skewed.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val capacity = 16
    val hh = rows(skewed.toDF("k").repartition(5)
      .agg(HeavyHitters.heavyHitters(col("k"), capacity).as("hh")))
    assert(hh.size <= capacity)
    // every reported key: count - err <= true <= count
    hh.foreach { case (k, c, e) =>
      val t = trueCounts.getOrElse(k, 0L)
      assert(t <= c, s"$k: estimate $c under-counts true $t")
      assert(c - e <= t, s"$k: lower bound ${c - e} exceeds true $t")
    }
    // any key with true frequency > N/capacity must be present
    val guaranteed = trueCounts.filter(_._2 > n / capacity).keySet
    assert(guaranteed.subsetOf(hh.map(_._1).toSet),
      s"guaranteed heavy hitters missing: ${guaranteed -- hh.map(_._1).toSet}")
    // the two whales dominate the ranking
    assert(hh.take(2).map(_._1) === Seq("whale", "shark"))
  }

  test("nulls are skipped; empty input yields an empty array") {
    val withNulls = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("k")
    val hh = rows(withNulls.agg(HeavyHitters.heavyHitters(col("k"), 8).as("hh")))
    assert(hh === Seq(("a", 2L, 0L), ("b", 1L, 0L)))
    val empty = spark.emptyDataset[String].toDF("k")
      .agg(HeavyHitters.heavyHitters(col("k"), 8).as("hh"))
      .collect().head.getSeq[Row](0)
    assert(empty.isEmpty)
  }

  test("SQL surface: heavy_hitters registered through GraftExtensions") {
    (1 to 100).map(i => s"t${i % 7}").toDF("k").createOrReplaceTempView("hh_in")
    val top = spark.sql(
      "SELECT slice(heavy_hitters(k, 32), 1, 3) AS top3 FROM hh_in")
      .collect().head.getSeq[Row](0)
    assert(top.size === 3)
    assert(top.map(_.getLong(1)).sorted.reverse === top.map(_.getLong(1)),
      "array must come back sorted by count desc")
  }

  test("grouped aggregation: one summary per group") {
    val df = (1 to 200).map(i => (s"g${i % 2}", s"v${i % 5}")).toDF("g", "v")
    val out = df.groupBy("g")
      .agg(HeavyHitters.heavyHitters(col("v"), 16).as("hh"))
      .collect().map(r => r.getString(0) -> r.getSeq[Row](1).size).toMap
    assert(out === Map("g0" -> 5, "g1" -> 5))
  }
}
