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
