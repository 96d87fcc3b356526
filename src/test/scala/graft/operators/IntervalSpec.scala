package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interval overlap join: the binned equi formulation must equal the
  * naive inequality join for EVERY bin width (losslessness does not
  * depend on the width — only the replication/density tradeoff does),
  * and the canonical-bin rule must dedup without a distinct.
  */
class IntervalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("overlapJoin ≡ naive inequality join across bin widths, negative axes included") {
    def mk(n: Int, seed: Int) = (1 to n).map { i =>
      val s = ((i * 97 + seed) % 200) - 100L
      (i.toLong, s, s + (i * 13 + seed) % 61)
    }
    val l = mk(120, 3).toDF("lid", "ls", "le")
    val r = mk(90, 41).toDF("rid", "rs", "re")
    val naive = l.join(r, col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(naive.nonEmpty)
    // naive has no duplicates, so plain equality also proves the
    // canonical-bin rule emits each pair exactly once
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = Interval.overlapJoin(l, r, "ls", "le", "rs", "re", w)
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      assert(got === naive, s"binWidth $w")
    }
  }

  test("overlapJoin respects equi keys and drops invalid/null intervals") {
    val l = Seq((1L, "k1", 0L, 10L), (2L, "k2", 0L, 10L), (3L, "k1", 5L, 4L))
      .toDF("lid", "k", "ls", "le")
      .union(spark.sql(
        "SELECT 4L AS lid, 'k1' AS k, CAST(NULL AS BIGINT) AS ls, 10L AS le"))
    val r = Seq((10L, "k1", 8L, 12L), (11L, "k2", 20L, 30L))
      .toDF("rid", "k", "rs", "re")
    val got = Interval.overlapJoin(l, r, "ls", "le", "rs", "re", 5L,
        keys = Seq("k"))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    // k1: only lid=1 overlaps rid=10 (lid=3 is end<start, lid=4 null);
    // k2: [0,10] vs [20,30] never meet — and rid=10's [8,12] must NOT
    // match lid=2 across keys
    assert(got.toSeq === Seq((1L, 10L)))
  }

  test("overlapJoin touching endpoints match under closed semantics") {
    val l = Seq((1L, 0L, 5L)).toDF("lid", "ls", "le")
    val r = Seq((9L, 5L, 9L), (8L, 6L, 9L)).toDF("rid", "rs", "re")
    val got = Interval.overlapJoin(l, r, "ls", "le", "rs", "re", 3L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(got.toSeq === Seq((1L, 9L)))
  }

  test("recommendedBinWidth: pow2 ceil of median length, degenerate fallbacks") {
    // uniform 7-day windows → median 7 → next pow2 = 8
    val uni = (1L to 100L).map(i => (i, i + 7L)).toDF("s", "e")
    assert(Interval.recommendedBinWidth(uni, "s", "e") === 8L)
    // exact power stays put: length 8 → 8
    val p2 = (1L to 50L).map(i => (i, i + 8L)).toDF("s", "e")
    assert(Interval.recommendedBinWidth(p2, "s", "e") === 8L)
    // mixed with inverted rows: inverted lengths are excluded
    val mixed = ((1L to 40L).map(i => (i, i + 30L)) ++
      (1L to 10L).map(i => (i + 100L, i))).toDF("s", "e")
    assert(Interval.recommendedBinWidth(mixed, "s", "e") === 32L)
    // empty / all-inverted → 1
    val inv = Seq((10L, 2L)).toDF("s", "e")
    assert(Interval.recommendedBinWidth(inv, "s", "e") === 1L)
    assert(Interval.recommendedBinWidth(uni.filter(col("s") < 0), "s", "e") === 1L)
  }
}
