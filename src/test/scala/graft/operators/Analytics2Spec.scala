package graft.operators

import graft.TestSpark
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

class Analytics2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cohortLtv accumulates purchase cents over week offsets per cohort") {
    val events = Seq(
      // user 1: first event Mon Jan 1 (cohort 2024-01-01); purchases in
      // week 0 (10.00) and week 2 (5.00)
      (1L, "view", ts("2024-01-01 10:00:00"), 0.0),
      (1L, "purchase", ts("2024-01-03 10:00:00"), 10.0),
      (1L, "purchase", ts("2024-01-16 10:00:00"), 5.0),
      // user 2: same cohort week, never purchases (counts in cohort size)
      (2L, "view", ts("2024-01-02 09:00:00"), 0.0),
      // user 3: cohort 2024-01-08, one purchase in week 1
      (3L, "signup", ts("2024-01-08 08:00:00"), 0.0),
      (3L, "purchase", ts("2024-01-15 08:30:00"), 20.0)
    ).toDF("user_id", "event_type", "ts", "value")
    val out = Analytics2.cohortLtv(events)
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0L, 2L, 1000L, 500.0),
      ("2024-01-01", 2L, 2L, 1500L, 750.0),
      ("2024-01-08", 1L, 1L, 2000L, 2000.0)))
  }

  test("associationRules: confidence and lift from exact supports") {
    // orders: {A,B}, {A,B}, {A,C}, {B} → supp(A)=3, supp(B)=3, supp(C)=1,
    // supp(A,B)=2, N=4. conf(A→B)=2/3, lift=4·2/(3·3)=8/9.
    val li = Seq(
      (100L, 1L), (100L, 2L),
      (101L, 1L), (101L, 2L), (101L, 2L), // dup line: DISTINCT collapses
      (102L, 1L), (102L, 3L),
      (103L, 2L)
    ).toDF("l_orderkey", "l_partkey")
    val out = Analytics2.associationRules(li, minSupport = 2)
      .orderBy("ante", "cons").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(5), r.getDouble(6)))
    assert(out.toSeq === Seq(
      (1L, 2L, 2L, 2.0 / 3, 8.0 / 9),
      (2L, 1L, 2L, 2.0 / 3, 8.0 / 9)))
  }

  test("conversionLag picks discrete order statistics and strict fp > fv") {
    val events = Seq(
      // cohort week 2024-01-01: three converters with lags 1h, 2h, 10h
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "purchase", ts("2024-01-01 11:00:00")),
      (2L, "view", ts("2024-01-02 10:00:00")),
      (2L, "purchase", ts("2024-01-02 12:00:00")),
      (3L, "view", ts("2024-01-03 10:00:00")),
      (3L, "purchase", ts("2024-01-03 20:00:00")),
      // user 4: purchase BEFORE first view → not a converter
      (4L, "purchase", ts("2024-01-04 09:00:00")),
      (4L, "view", ts("2024-01-04 10:00:00")),
      // user 5: view only → not a converter
      (5L, "view", ts("2024-01-05 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Analytics2.conversionLag(events).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 3L) // converters
    // n=3: p50 rank = min r with 2r≥3 → r=2 → 2h; p90 rank = min r with
    // 10r≥27 → r=3 → 10h
    assert(r.getLong(2) === 2L * 3600000000L)
    assert(r.getLong(3) === 10L * 3600000000L)
  }

  test("profileColumns: one-pass stats incl. nulls and distinct") {
    val df = Seq(
      (Some(1.0), 2.5), (None, 2.5), (Some(3.0), 4.0)
    ).toDF("x", "y")
    val out = Analytics2.profileColumns(df, Seq("x", "y"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(out.toSeq === Seq(
      ("x", 3L, 1L, 2L, 1.0, 3.0, 400L),
      ("y", 3L, 0L, 2L, 2.5, 4.0, 900L)))
  }
}
