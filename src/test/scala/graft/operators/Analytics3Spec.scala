package graft.operators

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Analytics3Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cusumDaily: closed form equals the direct recursion; alarm fires only after the shift") {
    // 10 quiet days at 10/day, then 5 shifted days at 40/day
    val perDay = (1 to 10).map(d => (d, 10)) ++ (11 to 15).map(d => (d, 40))
    val events = perDay.flatMap { case (d, k) =>
      (1 to k).map(i => ("A", Timestamp.valueOf(f"2024-01-$d%02d 0${i % 9}:1$i:00")))
    }.toDF("event_type", "ts")
    val out = Analytics3.cusumDaily(events).orderBy("day").collect()
    assert(out.length === 15)

    // direct recursion S_t = max(0, S_{t-1} + y_t) over the same scaled
    // residuals (n = 15 days, T = 300 events, y = 4n·x − 5T)
    val xs = perDay.map(_._2.toLong)
    val n = xs.size
    val t = xs.sum
    var s = 0L
    val expected = xs.map { x =>
      s = math.max(0L, s + (4L * n * x - 5L * t)); s
    }
    out.zip(expected).foreach { case (row, e) =>
      assert(row.getAs[Long]("cusum") === e, s"day ${row.getAs[Any]("day")}")
      assert(row.getAs[Boolean]("alarm") === (e >= 8L * t))
      assert(row.getAs[Double]("cusum_rel") === e.toDouble / (4L * t).toDouble)
    }
    // quiet days never alarm; the shift is caught while it is live
    assert(out.take(10).forall(!_.getAs[Boolean]("alarm")))
    assert(out.drop(12).exists(_.getAs[Boolean]("alarm")))
  }

  test("theilSenDaily: recovers a linear trend through an outlier day that wrecks OLS") {
    // counts 10,12,14,...,28 over 10 days (slope 2/day), except day 6
    // spikes to 500 — the pairwise-slope median shrugs it off
    val events = (1 to 10).flatMap { d =>
      val k = if (d == 6) 500 else 8 + 2 * d
      (1 to k).map(i => ("A", Timestamp.valueOf(f"2024-03-$d%02d 0${i % 9}:2${i % 6}:00")))
    }.toDF("event_type", "ts")
    val out = Analytics3.theilSenDaily(events).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("n_pairs") === 45L)
    assert(out(0).getAs[Double]("slope") === 2.0)
  }

  test("ksSourceDrift: identical-to-rest source scores low, shifted source attains its gap") {
    // srcA and srcB share the same length distribution; srcC is shifted
    // entirely above both → its ECDF gap vs the rest is 1.0 somewhere
    val docs = (
      (1 to 10).map(i => (i.toLong, "srcA", (i % 5) + 1)) ++
      (11 to 20).map(i => (i.toLong, "srcB", (i % 5) + 1)) ++
      (21 to 30).map(i => (i.toLong, "srcC", (i % 5) + 100))
    ).map { case (id, s, n) => (id, s, n.toLong) }
      .toDF("doc_id", "source", "n_chars")
    val got = Analytics3.ksSourceDrift(docs).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"),
        r.getAs[Double]("d_stat"))).toMap
    assert(got.keySet === Set("srcA", "srcB", "srcC"))
    assert(got("srcC")._1 === 10L)
    // all of srcC sits above all of the rest: sup gap = 1 exactly
    assert(got("srcC")._2 === 1.0)
    // A vs (B ∪ C): B matches A, C is far away — the gap is C's mass
    // share of the rest at the boundary: |1 − 10/20| = 0.5
    assert(got("srcA")._2 === 0.5)
  }

  test("giniEngagement: zero for uniform users, matches the rank formula with ties") {
    def mkEvents(xs: Seq[(String, Int)]) = xs.flatMap { case (u, k) =>
      (1 to k).map(i => (u, Timestamp.valueOf(f"2024-01-01 0${i % 9}:0${i % 9}:2${i % 7}")))
    }.toDF("user_id", "ts")

    val uniform = Analytics3.giniEngagement(
      mkEvents(Seq("u1" -> 5, "u2" -> 5, "u3" -> 5, "u4" -> 5))).collect()(0)
    assert(uniform.getAs[Long]("n_users") === 4L)
    assert(uniform.getAs[Long]("total_events") === 20L)
    assert(uniform.getAs[Double]("gini") === 0.0)

    // skewed with a tie: reference = (2·Σi·x_i − (n+1)T) / (nT) over
    // ascending-sorted x
    val xs = Seq(1L, 1L, 2L, 16L)
    val n = xs.size
    val t = xs.sum
    val six = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val expected = (2.0 * six - (n + 1) * t) / (n.toDouble * t)
    val skewed = Analytics3.giniEngagement(
      mkEvents(Seq("a" -> 1, "b" -> 1, "c" -> 2, "d" -> 16))).collect()(0)
    assert(skewed.getAs[Double]("gini") === expected)
    assert(skewed.getAs[Double]("gini") > 0.5)
  }

  test("contaminationScore: exact overlap fractions, zero for clean docs, empty-safe") {
    val corpus = Seq(
      // 10 words → 3 distinct 8-shingles, 1 of which the eval doc shares
      (1L, "a b c d e f g h x y"),
      // short doc (<8 words) → single whole-text shingle, no overlap
      (2L, "z z z z"),
      // exact copy of the eval doc → both shingles hit → fraction 1.0
      (3L, "a b c d e f g h i"),
      // empty text → zero shingles → fraction 0 without dividing
      (4L, "")).toDF("doc_id", "text")
    val eval_ = Seq((100L, "a b c d e f g h i")).toDF("doc_id", "text")
    val got = Dedup.contaminationScore(corpus, eval_, n = 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_hits"),
          r.getAs[Double]("contamination")))).toMap
    assert(got(1L) === ((3L, 1L, 1.0 / 3.0)))
    assert(got(2L) === ((1L, 0L, 0.0)))
    assert(got(3L) === ((2L, 2L, 1.0)))
    assert(got(4L) === ((0L, 0L, 0.0)))
  }
}
