package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- lineDedup ----------------------------------------------------------

  private lazy val linedDocs = Seq(
    (0L, "COOKIE BANNER\nunique first body line\n\nshared footer text"),
    (1L, "COOKIE BANNER\nanother distinct sentence here\nshared footer text"),
    (2L, "COOKIE BANNER\nshared footer text"),
    (3L, "totally original document on one line"),
    (4L, "")
  ).toDF("doc_id", "text")

  test("lineDedup removes cross-document boilerplate, keeps order and blanks") {
    val out = Corpus.lineDedup(linedDocs, minDocs = 2).orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // doc 0: banner + footer removed, blank line and unique line kept, order intact
    assert(byId(0L).getAs[String]("clean_text") === "unique first body line\n")
    assert(byId(0L).getAs[Long]("n_lines") === 4L)
    assert(byId(0L).getAs[Long]("n_removed") === 2L)
    // doc 2: everything was boilerplate → empty reconstruction
    assert(byId(2L).getAs[String]("clean_text") === "")
    assert(byId(2L).getAs[Long]("n_removed") === 2L)
    // doc 3: untouched single-line document
    assert(byId(3L).getAs[String]("clean_text") === "totally original document on one line")
    assert(byId(3L).getAs[Long]("n_removed") === 0L)
    // doc 4: empty text = one blank line, never counted as boilerplate
    assert(byId(4L).getAs[Long]("n_lines") === 1L)
    assert(byId(4L).getAs[Long]("n_removed") === 0L)
  }

  test("lineDedup minDocs threshold: a 3-doc line survives minDocs = 4") {
    val out = Corpus.lineDedup(linedDocs, minDocs = 4).orderBy("doc_id").collect()
    // banner appears in 3 docs < 4 → kept everywhere now
    assert(out.forall(r =>
      r.getAs[String]("clean_text").contains("COOKIE BANNER") || r.getLong(0) >= 3L))
  }

  // ---- unigramLogProb -----------------------------------------------------

  test("unigramLogProb matches the hand-computed order-0 model") {
    val docs = Seq((0L, "a a b"), (1L, "a c")).toDF("doc_id", "text")
    val out = Corpus.unigramLogProb(docs).orderBy("doc_id").collect()
    // corpus: a=3, b=1, c=1, total=5
    val expected0 = 2 * -math.log(3.0 / 5) + -math.log(1.0 / 5)
    val expected1 = -math.log(3.0 / 5) + -math.log(1.0 / 5)
    assert(out(0).getAs[Long]("n_tokens") === 3L)
    assert(math.abs(out(0).getAs[Double]("nll") - expected0) < 0.005 + 1e-9)
    assert(out(1).getAs[Long]("n_tokens") === 2L)
    assert(math.abs(out(1).getAs[Double]("nll") - expected1) < 0.005 + 1e-9)
    // rare-token-heavy doc scores higher per token than the common-token doc
    assert(out(1).getAs[Double]("avg_nll") > out(0).getAs[Double]("avg_nll"))
  }

  test("unigramLogProb omits token-less documents") {
    val docs = Seq((0L, "real words"), (1L, "  "), (2L, "...")).toDF("doc_id", "text")
    assert(Corpus.unigramLogProb(docs).select("doc_id").as[Long].collect().toSeq === Seq(0L))
  }

  // ---- topNgrams ----------------------------------------------------------

  test("topNgrams counts bigrams with deterministic tie-break") {
    val docs = Seq(
      (0L, "x y x y z"),     // bigrams: "x y" ×2, "y x", "y z"
      (1L, "x y q")          // "x y", "y q"
    ).toDF("doc_id", "text")
    val out = Corpus.topNgrams(docs, n = 2, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out(0) === ("x y", 3L))
    // the three singleton bigrams tie at 1 → lexicographic order decides
    assert(out(1) === ("y q", 1L))
    assert(out(2) === ("y x", 1L))
  }

  // ---- knnClassify / hardNegatives ---------------------------------------

  private def vec(xs: Double*) = xs.map(_.toFloat).toArray

  private lazy val labeled = Seq(
    (0L, vec(1, 0, 0), 7),
    (1L, vec(0.9, 0.1, 0), 7),
    (2L, vec(0.8, 0.2, 0), 7),
    (3L, vec(0, 1, 0), 8),
    (4L, vec(0.1, 0.9, 0), 8),
    (5L, vec(0.6, 0.4, 0), 8)   // label-8 vector leaning toward the 7 cluster
  ).toDF("vec_id", "embedding", "label")

  test("knnClassify votes the local majority label") {
    val out = Corpus.knnClassify(labeled, k = 3, idCap = 6L)
      .orderBy("vec_id").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("label"), r.getAs[Long]("pred_label"))).toMap
    // vec 0's three nearest are 1, 2 (label 7) and 5 → majority 7
    assert(out(0L) === (7L, 7L))
    // vec 3's nearest are 4 (8), 5 (8), then a 7 → majority 8
    assert(out(3L) === (8L, 8L))
    // the leaner vec 5 sits among label-7 vectors → misclassified as 7
    assert(out(5L) === (8L, 7L))
    assert(out.size === 6)
  }

  test("hardNegatives returns only different-label candidates, nearest first") {
    val out = Corpus.hardNegatives(labeled, queryCap = 1L, k = 2).collect()
    assert(out.forall(r => r.getAs[Long]("neg_label") !== r.getAs[Long]("qlabel")))
    // for query 0 (label 7) the hardest negative is the leaner vec 5
    assert(out.map(_.getAs[Long]("neg_id")).head === 5L)
    assert(out.length === 2)
    val sims = out.map(_.getAs[Double]("sim"))
    assert(sims.sorted.reverse.toSeq === sims.toSeq)
  }

  test("hardNegativesAnn: degenerate settings reproduce exact hardNegatives; pooled settings stay valid") {
    val emb = Similarity.l2Normalized(
      graft.Tables.embeddings(spark, graft.TestSpark.sfDir))
    val n = emb.count().toInt
    val (cents, books) = Similarity.annQuantizers(emb)
    val index = Similarity.pqEncode(Similarity.ivfAssign(emb, cents), books)
      .select("vec_id", "centroid_id", "pq_code")
    val queryCap = 3L
    val k = 5
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("qid"), -r.getAs[Double]("sim"), r.getAs[Long]("neg_id"))
    def tup(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("qid"), r.getAs[Long]("qlabel"), r.getAs[Long]("neg_id"),
        r.getAs[Long]("neg_label"), r.getAs[Double]("sim"))
    // full probe + corpus-covering pool → the candidate stage is the
    // full exact ranking and the output must EQUAL the exact miner
    val exact = Corpus.hardNegatives(emb, queryCap, k).collect()
      .sortBy(key).map(tup).toSeq
    val ann = Corpus.hardNegativesAnn(emb, index, queryCap, k, cents, books,
        poolK = n, nProbe = 16, rerank = 1).collect()
      .sortBy(key).map(tup).toSeq
    assert(ann === exact,
      "degenerate ANN mining must reproduce the exact hard negatives")
    // production settings: output still k different-label rows per
    // query, descending sims, drawn from the ANN pool
    val pooled = Corpus.hardNegativesAnn(emb, index, queryCap, k, cents,
      books, poolK = 50, nProbe = 4, rerank = 4).collect()
    assert(pooled.groupBy(_.getAs[Long]("qid")).forall(_._2.length <= k))
    assert(pooled.forall(r =>
      r.getAs[Long]("neg_label") != r.getAs[Long]("qlabel")))
    pooled.groupBy(_.getAs[Long]("qid")).values.foreach { rs =>
      val sims = rs.sortBy(key).map(_.getAs[Double]("sim")).toSeq
      assert(sims.sorted.reverse === sims, "pool sims must be descending")
    }
  }

  // ---- sourceReport / shingleOverlapMatrix --------------------------------

  test("sourceReport aggregates docs, tokens, and quality per source") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today", "web"),
      (1L, "!!! ??? ... ,,, ;;; ::: !!! ??? ... ,,,", "web"),   // punct-heavy → low quality
      (2L, "a plain and simple sentence that reads fine", "books")
    ).toDF("doc_id", "text", "source")
    val out = Corpus.sourceReport(docs).orderBy("source").collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out("web").getAs[Long]("n_docs") === 2L)
    assert(out("web").getAs[Long]("low_quality_docs") === 1L)
    assert(out("books").getAs[Long]("n_docs") === 1L)
    assert(out("books").getAs[Long]("low_quality_docs") === 0L)
    assert(out("web").getAs[Long]("n_tokens") === 10L)
    assert(out("books").getAs[Double]("avg_quality") >
      out("web").getAs[Double]("avg_quality"))
  }

  test("shingleOverlapMatrix counts shared distinct n-grams with containment") {
    val docs = Seq(
      (0L, "alpha beta gamma delta", "s1"),    // 3-grams: ab g, b g d
      (1L, "alpha beta gamma epsilon", "s2"),  // shares "alpha beta gamma"
      (2L, "zeta eta theta iota", "s3")        // shares nothing
    ).toDF("doc_id", "text", "source")
    val out = Corpus.shingleOverlapMatrix(docs, n = 3).collect()
    assert(out.length === 1) // only (s1, s2) share anything
    val r = out.head
    assert(r.getAs[String]("src_a") === "s1" && r.getAs[String]("src_b") === "s2")
    assert(r.getAs[Long]("shared_ngrams") === 1L)
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Double]("overlap_coef") === 0.5)
  }

  test("fused word shingles equal the HOF formulation on messy inputs") {
    import graft.functions.{Sketches, TextFunctions}
    val texts = Seq("", "   ", "one", "Quick brown-FOX!! jumps,über 42 dogs",
      "a b c d e f", "tabs\tand\nnewlines  mixed", "ünïcode sépàrators slice",
      "1 2 3", "trailing space ", " leading")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3, 5)) {
      val mismatches = texts.select(
          Sketches.wordShinglesText(col("text"), n).as("fused"),
          TextFunctions.wordShingles(col("text"), n).as("hof"))
        .filter(not(col("fused") === col("hof")))
        .count()
      assert(mismatches === 0L, s"fused != HOF at n=$n")
    }
  }

  // ---- dsirWeights --------------------------------------------------------

  test("winsorize clamps to the group percentile band; approx tracks exact") {
    import spark.implicits._
    // group A: 1..100 plus a 10_000 outlier; p05/p95 over 101 values
    val rows = ((1 to 100).map(v => ("A", v.toLong)) :+ ("A", 10000L)) ++
      (1 to 50).map(v => ("B", (v * 2).toLong))
    val df = rows.toDF("source", "n_chars")
    val out = Corpus.winsorize(df, "source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val a = out.filter(_._1 == "A")
    // the outlier is pulled down to p95, small values up to p05
    assert(a.map(_._3).max < 10000.0)
    assert(a.filter(_._2 == 10000L).head._3 === a.map(_._3).max)
    assert(a.map(_._3).min > 1.0)
    // mid-band values pass through unchanged
    assert(a.filter(_._2 == 50L).head._3 === 50.0)
    // the approx path stays within a tight band of exact on this data
    val approx = Corpus.winsorize(df, "source", "n_chars", exact = false)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val exactByKey = out.groupBy(x => (x._1, x._2)).view.mapValues(_.head._3)
    approx.foreach { case (g, v, w) =>
      assert(math.abs(w - exactByKey((g, v))) <= 5.0, s"($g,$v): $w")
    }
  }

  test("nbClassifierScore separates held-out docs by train-side vocabulary") {
    import spark.implicits._
    // vocabulary is perfectly separable: target docs speak 'alpha beta',
    // the rest 'zork quux'. Ids 0..999 so both splits are populated by
    // the md5 gate at trainPermille = 700.
    val docs = (0L until 1000L).map { i =>
      val src = if (i % 2 == 0) "tgt" else "web"
      val text = if (src == "tgt") "alpha beta alpha" else "zork quux zork"
      (i, src, text)
    }.toDF("doc_id", "source", "text")
    val out = Corpus.nbClassifierScore(docs, targetSource = "tgt")
      .collect().map(r => (r.getString(1), r.getDouble(3), r.getBoolean(4)))
    assert(out.nonEmpty && out.length < 1000) // held-out split only
    // every held-out target doc scores positive, every web doc negative
    assert(out.forall { case (src, s, pred) =>
      if (src == "tgt") s > 0 && pred else s < 0 && !pred })
  }

  test("nbClassifierScore smooths terms unseen in the train split") {
    import spark.implicits._
    // doc 505 is held out (gate ≥ 700 for id 505 under seed 42) and
    // speaks ONLY a term absent from training: its score must be the
    // add-one floor times its token count, not null or zero
    val docs = ((0L until 500L).map(i =>
        (i, if (i % 2 == 0) "tgt" else "web",
          if (i % 2 == 0) "alpha beta" else "zork quux")) :+
      (505L, "web", "unseen unseen unseen"))
      .toDF("doc_id", "source", "text")
    val row = Corpus.nbClassifierScore(docs, targetSource = "tgt")
      .filter(col("doc_id") === 505L).collect()
    assert(row.length === 1)
    assert(row.head.getLong(2) === 3L)
    assert(!row.head.isNullAt(3) && row.head.getDouble(3) != 0.0)
  }

  test("dsirWeights scores target-like raw docs above target-unlike ones") {
    val docs = Seq(
      (0L, "alpha beta gamma delta alpha beta", "tgt"),
      (1L, "alpha beta gamma alpha beta delta", "tgt"),
      (2L, "alpha beta gamma delta epsilon", "raw"),   // target-like raw
      (3L, "zeta eta theta iota kappa", "raw")          // target-unlike raw
    ).toDF("doc_id", "text", "source")
    val out = Corpus.dsirWeights(docs, targetSource = "tgt", buckets = 16)
      .orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dsir_logw")).toMap
    assert(out(2L) > out(3L),
      s"target-like raw doc should outscore target-unlike: ${out(2L)} vs ${out(3L)}")
    assert(out.size === 4)
  }

  test("dsirWeights is deterministic across repartitioning") {
    val docs = Seq(
      (0L, "alpha beta gamma", "tgt"),
      (1L, "alpha delta zeta", "raw"),
      (2L, "beta beta gamma", "raw")
    ).toDF("doc_id", "text", "source")
    val a = Corpus.dsirWeights(docs, "tgt").orderBy("doc_id").collect().toSeq
    val b = Corpus.dsirWeights(docs.repartition(7), "tgt").orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("pmiBigrams: collocated pair scores high, independent pair low, short docs excluded") {
    import spark.implicits._
    // "x y" always adjacent (perfect collocation); "p"/"q" occur often
    // but never adjacent to each other except once
    val docs = (
      (1 to 10).map(i => (i.toLong, "x y filler" + i)) ++
      (11 to 20).map(i => (i.toLong, "p filler" + i + " q other")) ++
      Seq((21L, "p q"), (22L, "solo"))  // one p-q adjacency; 1-word doc
    ).toDF("doc_id", "text")
    val out = Corpus.pmiBigrams(docs, minCount = 1).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out.contains("x y") && out.contains("p q"))
    assert(out("x y") > out("p q") + 1.0,
      s"perfect collocation should dominate: ${out("x y")} vs ${out("p q")}")
    // the 1-word doc contributes no bigram (no partial-shingle leak)
    assert(!out.keys.exists(_.contains("solo")))
  }

  test("sourceKl: zero for identical sources, large for disjoint vocab, non-negative") {
    import spark.implicits._
    // twin sources with IDENTICAL content → each matches the blend
    // exactly → KL 0; an alien source with disjoint vocabulary diverges
    val docs = (
      (1 to 10).map(i => (i.toLong, "same", s"alpha beta gamma delta $i x")) ++
      (11 to 20).map(i => (i.toLong, "same2", s"alpha beta gamma delta ${i - 10} x")) ++
      (21 to 25).map(i => (i.toLong, "alien", "zork quux fnord blarg"))
    ).toDF("doc_id", "source", "text")
    val kl = Corpus.sourceKl(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(kl.keySet === Set("same", "same2", "alien"))
    assert(kl.values.forall(_ >= 0.0), s"KL must be non-negative: $kl")
    assert(kl("same") === kl("same2"), "identical sources must score equally")
    assert(kl("alien") > kl("same") + 0.5,
      s"disjoint vocabulary must diverge: $kl")
  }

  // ---- snapshotDiff -------------------------------------------------------

  test("snapshotDiff classifies added / removed / changed / unchanged") {
    import spark.implicits._
    val a = Seq((0L, "same"), (1L, "old"), (2L, "gone")).toDF("doc_id", "text")
    val b = Seq((0L, "same"), (1L, "new"), (3L, "fresh")).toDF("doc_id", "text")
    val m = Corpus.snapshotDiff(a, b).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m === Map(0L -> "unchanged", 1L -> "changed",
      2L -> "removed", 3L -> "added"))
  }

  test("snapshotDiff: null text on both sides is unchanged, null-vs-text is changed") {
    import spark.implicits._
    val a = Seq((0L, null: String), (1L, null: String), (2L, "x"))
      .toDF("doc_id", "text")
    val b = Seq((0L, null: String), (1L, "now set"), (2L, null: String))
      .toDF("doc_id", "text")
    val m = Corpus.snapshotDiff(a, b).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m === Map(0L -> "unchanged", 1L -> "changed", 2L -> "changed"))
  }

  test("qualityCurriculum: quantiles partition the corpus, bounds ascend, budget telescopes") {
    val docs = graft.Tables.documents(spark, graft.TestSpark.sfDir)
    val n = docs.count()
    val rows = Corpus.qualityCurriculum(docs, phases = 4).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 2, 3, 4))
    assert(rows.map(_.getLong(1)).sum === n,
      "phases must partition the corpus exactly")
    // quantile sizes differ by at most 1 (percent-rank split of a
    // total order)
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, s"unbalanced phases: ${sizes.toSeq}")
    // quality bounds ascend phase over phase (phase 1 = lowest)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(4) <= b.getDouble(3) + 1e-12,
        s"phase ${a.getInt(0)} q_max ${a.getDouble(4)} above " +
          s"phase ${b.getInt(0)} q_min ${b.getDouble(3)}")
    }
    // cumulative budget telescopes to the total token count
    assert(rows.last.getLong(5) === rows.map(_.getLong(2)).sum)
  }

  test("snapshotDiff against an empty snapshot: all added / all removed") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val s = Seq((7L, "x"), (8L, "y")).toDF("doc_id", "text")
    val added = Corpus.snapshotDiff(empty, s).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(added === Map(7L -> "added", 8L -> "added"))
    val removed = Corpus.snapshotDiff(s, empty).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(removed === Map(7L -> "removed", 8L -> "removed"))
  }
}
