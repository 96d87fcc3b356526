package graft.operators

import graft.{Tables, TestSpark}
import java.sql.Timestamp
import org.apache.spark.sql.functions._
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

  test("bpeMerges: greedy application, frequency weighting, tie-break") {
    // vocab: "aaab" ×3, "ab" ×2 → round 1 pairs: (a,a)=6 [two per "aaab"],
    // (a,b)=5, tie-break not needed. Merge (a,a): "aaab" → [aa, a, b]
    // (greedy left-to-right: the merged "aa" does NOT re-merge with the
    // third a). Round 2 pairs: (a,b)=5 [3 from "aaab" tails + 2 from
    // "ab"], (aa,a)=3 → merge (a,b).
    val docs = Seq(
      "aaab aaab ab", "aaab ab"
    ).toDF("text")
    val out = Corpus.bpeMerges(docs, rounds = 2).orderBy("merge_round")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(out.toSeq === Seq((1, "a", "a", 6L), (2, "a", "b", 5L)))
  }

  test("bpeMerges tie-break picks the lexicographically smallest pair") {
    // "xy" ×2 and "ab" ×2 both give pair count 2 → (a,b) wins over (x,y)
    val docs = Seq("xy ab", "ab xy").toDF("text")
    val out = Corpus.bpeMerges(docs, rounds = 1).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq === Seq(("a", "b", 2L)))
  }

  test("batched BPE ≡ sequential greedy on independent merges (property sweep)") {
    // Greedy-equivalence property: when the top merges touch disjoint
    // symbol regions (two-letter words over disjoint letter pools — a
    // merge consumes its whole word, so no batch member can create a
    // pair that overtakes another), one batched scan round MUST produce
    // the same merge table as k sequential rounds. Five seeded corpora,
    // each with distinct pair frequencies so the greedy order is unique.
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { case_ =>
      // six disjoint two-letter words with distinct random frequencies
      val pool = Seq("ab", "cd", "ef", "gh", "ij", "kl")
      val freqs = pool.map(_ -> (rnd.nextInt(40) + 10)).sortBy(-_._2)
      // distinct-ify frequencies so the greedy order is deterministic
      val uniq = freqs.zipWithIndex.map { case ((w, f), i) => (w, f + (5 - i)) }
      val corpus = uniq.flatMap { case (w, f) => Seq.fill(f)(w) }
      val docs = corpus.grouped(7).map(_.mkString(" ")).toSeq.toDF("text")
      val seq3 = Corpus.bpeMerges(docs, rounds = 3, batchK = 1).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val bat3 = Corpus.bpeMerges(docs, rounds = 3, batchK = 3).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      assert(bat3 === seq3, s"case $case_: batched diverged from greedy\n" +
        s"seq=$seq3\nbat=$bat3")
    }
  }

  test("batched BPE independence filter blocks interacting rules in one batch") {
    // "aaab"-style corpus: top pair (a,a) creates "aa", and the next
    // candidates all involve a/b or the created product — nothing is
    // independent of the first merge, so a batchK=3 scan may apply ONLY
    // (a,a) in round 1 and must converge to the same 2-merge table as
    // exact greedy (the k-vs-exactness dial never silently reorders
    // interacting rules).
    val docs = Seq("aaab aaab ab", "aaab ab").toDF("text")
    val seq2 = Corpus.bpeMerges(docs, rounds = 2, batchK = 1).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val bat2 = Corpus.bpeMerges(docs, rounds = 2, batchK = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(seq2 === Seq((1, "a", "a", 6L), (2, "a", "b", 5L)))
    assert(bat2 === seq2, "interacting rules must not co-batch")
  }

  test("batched BPE golden at k=8: one-scan batch equals 8 sequential rounds") {
    // eight disjoint two-letter words with strictly distinct frequencies:
    // all 8 top pairs are syntactically independent, so the k=8 trainer
    // resolves them in ONE pair-count scan and must reproduce the exact
    // greedy table — the rounds/k driver-round-trip saving with zero
    // divergence on this corpus class.
    val pool = Seq("ab" -> 90, "cd" -> 82, "ef" -> 75, "gh" -> 61,
      "ij" -> 54, "kl" -> 47, "mn" -> 33, "op" -> 21)
    val corpus = pool.flatMap { case (w, f) => Seq.fill(f)(w) }
    val docs = corpus.grouped(9).map(_.mkString(" ")).toSeq.toDF("text")
    def run(k: Int) = Corpus.bpeMerges(docs, rounds = 8, batchK = k).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val seq8 = run(1)
    val bat8 = run(8)
    assert(seq8 === pool.zipWithIndex.map { case ((w, f), i) =>
      (i + 1, w.substring(0, 1), w.substring(1), f.toLong) },
      "sequential greedy must rank the pools by frequency")
    assert(bat8 === seq8, "k=8 batch diverged from sequential greedy")
    // determinism across runs (fresh plan, fresh checkpoint chain)
    assert(run(8) === bat8)
  }

  test("batched BPE on the sf documents corpus: deterministic and greedy-prefixed") {
    val docs = graft.Tables.documents(spark, graft.TestSpark.sfDir)
    def run() = Corpus.bpeMerges(docs, rounds = 8, batchK = 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val m1 = run()
    assert(m1.length === 8)
    assert(m1.map(_._1) === (1 to 8), "merge_round must be a contiguous sequence")
    assert(m1.forall(_._4 > 0))
    assert(run() === m1, "batched trainer not deterministic on real text")
    // the first batched merge is always the exact greedy first merge
    val g1 = Corpus.bpeMerges(docs, rounds = 1, batchK = 1).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).head
    assert((m1.head._2, m1.head._3, m1.head._4) === g1)
  }

  test("joinDelta covers all three delta terms") {
    // state: r1/s1 join in OLD⋈OLD (not in any delta term);
    // r1 ⋈ s2(delta) exercises R_old⋈ΔS; r2(delta) ⋈ s1 exercises
    // ΔR⋈S_old; r2 ⋈ s3(delta) exercises ΔR⋈ΔS.
    val rOld = Seq((1L, "r1")).toDF("k", "rv")
    val rDelta = Seq((1L, "r2")).toDF("k", "rv")
    val sOld = Seq((1L, "s1")).toDF("k", "sv")
    val sDelta = Seq((1L, "s2"), (1L, "s3")).toDF("k", "sv")
    val delta = Incremental.joinDelta(rOld, rDelta, sOld, sDelta, Seq("k"))
      .select("rv", "sv").collect().map(r => (r.getString(0), r.getString(1)))
      .toSet
    // full − old⋈old = every pair except (r1, s1)
    assert(delta === Set(("r1", "s2"), ("r1", "s3"), ("r2", "s1"),
      ("r2", "s2"), ("r2", "s3")))
  }

  test("randomProjection is partitioning-invariant and md5-sign exact") {
    val emb = Seq(
      (1L, Seq(0.5f, -0.25f, 1.0f)),
      (2L, Seq(-1.0f, 0.125f, 0.0f))
    ).toDF("vec_id", "embedding")
    val a = Similarity.randomProjection(emb, k = 4)
      .orderBy("vec_id", "j").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = Similarity.randomProjection(emb.repartition(7), k = 4)
      .orderBy("vec_id", "j").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.toSeq === b.toSeq)
    // driver-side recompute of vec 1, dim j: sign from the identical
    // md5-hex-prefix rule over "i#j" (1-based i)
    def sign(i: Int, j: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i#$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1L else -1L
    }
    val v = Seq(0.5, -0.25, 1.0)
    val expected = (1 to 4).map { j =>
      (1 to 3).map(i => sign(i, j) * Math.round(v(i - 1) * 10000)).sum
    }
    assert(a.filter(_._1 == 1L).map(_._3).toSeq === expected)
  }

  test("risingRuns finds runs of strictly rising present-hour counts") {
    // type A counts by hour: 1, 2, 3, 4, 2, 3 → rises at h2,h3,h4 (run
    // of 3) and h6 (run of 1, below minLen)
    val rows = for {
      (h, n) <- Seq(10 -> 1, 11 -> 2, 12 -> 3, 13 -> 4, 14 -> 2, 15 -> 3)
      i <- 1 to n
    } yield (i.toLong, "A", ts(f"2024-01-01 $h%02d:30:00"))
    val events = rows.toDF("event_id", "event_type", "ts")
    val out = Analytics2.risingRuns(events, minLen = 3).collect()
      .map(r => (r.getString(0),
        r.getAs[java.time.LocalDateTime](1).toString.substring(11, 13),
        r.getLong(2)))
    assert(out.toSeq === Seq(("A", "11", 3L)))
  }

  test("scd2 PIT join: purchase before any dim event carries null state") {
    val e = Seq(
      (1L, 1L, "purchase", ts("2024-01-01 08:00:00")), // before any state
      (2L, 1L, "view", ts("2024-01-01 09:00:00")),
      (3L, 1L, "purchase", ts("2024-01-01 10:00:00")), // state = view
      (4L, 1L, "click", ts("2024-01-01 11:00:00")),
      (5L, 1L, "purchase", ts("2024-01-01 11:00:00"))  // tie ts: click wins
    ).toDF("event_id", "user_id", "event_type", "ts")
    val dim = Behavior.scdIntervals(e.filter($"event_type" =!= "purchase"))
      .select($"user_id", $"state", $"valid_from".as("ts"))
    val fact = e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts".cast("timestamp_ntz").as("ts"))
    val out = AsOf.asofJoin(fact, dim, Seq("user_id"), "ts", Seq("state"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(1), Option(r.getString(3))))
    assert(out.toSeq === Seq((1L, None), (3L, Some("view")),
      (5L, Some("click"))))
  }

  test("prefixRerank at full prefix equals exact top-k") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val exact = Similarity.topKCosine(emb, 0L, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val full = Similarity.prefixRerank(emb, 0L, k = 10, candK = 50,
        prefixDims = 64).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(full.toSeq === exact.toSeq)
  }

  test("prefixRerank 16-dim stage recalls most of the exact top-10") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val exact = Similarity.topKCosine(emb, 0L, 10).collect()
      .map(_.getLong(0)).toSet
    // synthetic embeddings are random — unlike trained Matryoshka
    // vectors the prefix carries only prefixDims/64 of the signal, so
    // recall here is a floor check, not the trained-model ~0.9
    val staged = Similarity.prefixRerank(emb, 0L, k = 10, candK = 50,
        prefixDims = 16).collect().map(_.getLong(0)).toSet
    assert((exact intersect staged).size >= 2,
      s"coarse-to-fine recall too low: ${(exact intersect staged).size}/10")
    val wider = Similarity.prefixRerank(emb, 0L, k = 10, candK = 200,
        prefixDims = 32).collect().map(_.getLong(0)).toSet
    assert((exact intersect wider).size > (exact intersect staged).size ||
      (exact intersect staged).size >= 8,
      "widening candK/prefixDims should improve recall")
  }

  test("bigramLogProb: hand-computed conditional probabilities") {
    // corpus bigrams: "a b" ×2 (docs 1, 2), "b a" ×1 (doc 2)
    // C(a b)=2, C(b a)=1; C(a ·)=2, C(b ·)=1
    // doc 1 = "a b": nll = −ln(2/2) = 0
    // doc 2 = "a b a": bigrams "a b", "b a" → −ln(2/2) − ln(1/1) = 0
    val docs = Seq((1L, "a b"), (2L, "a b a"), (3L, "x")).toDF("doc_id", "text")
    val out = Corpus.bigramLogProb(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // doc 3 has no bigrams and is absent
    assert(out.toSeq === Seq((1L, 1L, 0.0), (2L, 2L, 0.0)))
  }

  test("bigramLogProb penalizes rare continuations") {
    // "a b" ×3, "a c" ×1 → doc with "a c" scores −ln(1/4) ≈ 1.39 > 0
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"))
      .toDF("doc_id", "text")
    val out = Corpus.bigramLogProb(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.take(3).forall { case (_, nll) => nll === math.round(
      -math.log(3.0 / 4) * 100) / 100.0 })
    assert(out(3)._2 === math.round(-math.log(1.0 / 4) * 100) / 100.0)
  }

  test("bpeEncode applies the learned merges to the vocabulary") {
    // one merge on "aaab"×1: (a,a) wins (2 occurrences beat (a,b)'s 1)
    // encoded "aaab" = [aa, a, b] → counts: aa=1, a=1, b=1
    val docs = Seq("aaab").toDF("text")
    val out = Corpus.bpeEncode(docs, rounds = 1, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out === Set(("aa", 1L), ("a", 1L), ("b", 1L)))
  }

  test("peak concurrency counts overlapping sessions with [start,end)") {
    // u1: 10:00–11:00; u2: 10:30–11:30; u3: 10:45–10:50 → 3 overlap at
    // 10:45; u4 zero-length at 10:45 must NOT count (empty interval)
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")), // u1: one session 10:00–11:00
      (2L, 1L, ts("2024-01-01 10:20:00")), //   (every gap ≤ 30 min)
      (3L, 1L, ts("2024-01-01 10:40:00")),
      (4L, 1L, ts("2024-01-01 11:00:00")),
      (5L, 2L, ts("2024-01-01 10:30:00")), // u2: session 10:30–10:50
      (6L, 2L, ts("2024-01-01 10:50:00")),
      (7L, 3L, ts("2024-01-01 10:45:00")), // u3: session 10:45–10:48
      (8L, 3L, ts("2024-01-01 10:48:00")),
      (9L, 4L, ts("2024-01-01 10:45:00")) // u4: zero-length, counts 0
    ).toDF("event_id", "user_id", "ts")
    // at 10:45–10:48 u1+u2+u3 are all open → peak 3; u4's empty
    // [10:45, 10:45) interval never counts under ends-before-starts
    import org.apache.spark.sql.expressions.Window
    val gapW = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val runW = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = events
      .withColumn("brk", when(unix_micros($"ts") -
        unix_micros(lag($"ts", 1).over(gapW)) > 1800000000L, 1).otherwise(0))
      .withColumn("sess", sum($"brk").over(runW))
      .groupBy($"user_id", $"sess")
      .agg(min($"ts").as("t0"), max($"ts").as("t1"))
    val sweep = sess.select($"t0".as("t"), lit(1L).as("delta"), $"user_id")
      .unionByName(sess.select($"t1".as("t"), lit(-1L).as("delta"),
        $"user_id"))
      .withColumn("__g", lit(1))
      .withColumn("__ord", unix_micros($"t"))
      .withColumn("__id", ($"delta" + 1) * lit(1000000000000L) + $"user_id")
    val cum = Scale.groupRunningSum(sweep, "__g", "__ord", "__id", "delta",
      outCol = "cum")
    val peak = cum.agg(max($"cum")).head.getLong(0)
    assert(peak === 3L)
  }

  test("bfsHops: level-synchronous distances, unreachable nodes absent") {
    // chain 1–2–3–4 plus shortcut 1–3; island 8–9 unreachable from 1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (8L, 9L))
      .toDF("src", "dst")
    val out = Graph.bfsHops(edges, source = 1L, maxHops = 10)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    // shortest paths: 1→0, 2→1, 3→1 (via shortcut), 4→2; 8/9 absent
    assert(out.toSeq === Seq((1L, 0L), (2L, 1L), (3L, 1L), (4L, 2L)))
  }

  test("bfsHops honors the maxHops bound") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.bfsHops(edges, source = 1L, maxHops = 2)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 0L), (2L, 1L), (3L, 2L))) // 4 not reached
  }

  test("modularity: hand-computed Newman decomposition") {
    // triangle {1,2,3} labeled A, pendant edge 3–4 with 4 labeled B
    // m = 4; A: m_c = 3 (triangle edges), d_c = 2+2+3 = 7
    //   Q_A = 3/4 − (7/8)² ; B: m_c = 0, d_c = 1 → Q_B = −(1/8)²
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val labels = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"))
      .toDF("node", "label")
    val out = Graph.modularity(edges, labels).orderBy("label").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("A", 3L, 7L, 3.0 / 4 - (7.0 / 8) * (7.0 / 8)),
      ("B", 0L, 1L, 0.0 / 4 - (1.0 / 8) * (1.0 / 8))))
  }

  test("asofJoinForward picks the earliest build at or after probe ts") {
    val probe = Seq((1L, 10L, ts("2024-01-01 10:00:00")))
      .toDF("user_id", "pid", "ts")
    val build = Seq(
      (1L, 1L, ts("2024-01-01 09:00:00")), // before → must not match
      (1L, 2L, ts("2024-01-01 10:00:00")), // tie → inclusive, wins
      (1L, 3L, ts("2024-01-01 11:00:00"))
    ).toDF("user_id", "bid", "ts")
    val out = AsOf.asofJoinForward(probe, build, Seq("user_id"), "ts",
      Seq("bid")).collect()
    assert(out.length === 1 && out.head.getLong(3) === 2L)
    // with no later build row, the carry is null
    val none = AsOf.asofJoinForward(
      Seq((1L, 10L, ts("2024-01-01 12:00:00"))).toDF("user_id", "pid", "ts"),
      build.filter($"bid" =!= 3L), Seq("user_id"), "ts", Seq("bid"))
      .collect()
    assert(none.length === 1 && none.head.isNullAt(3))
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
