package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Relevance scoring (TF-IDF, BM25), duplicated-span stats, and
  * temperature sampling — the round-7 additions to the §2.10 surface.
  */
class RelevanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("tfIdfTopTerms ranks a document's unique term over corpus-wide terms") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha common common"),
      (1L, "common beta common common"),
      (2L, "common common")).toDF("doc_id", "text")
    val top = Relevance.tfIdfTopTerms(docs, k = 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc0: alpha tf1·(N/df)=1·3/1=3.0 beats common 2·3/3=2.0
    assert(top(0L) === "alpha")
    assert(top(1L) === "beta")
    assert(top(2L) === "common")
  }

  test("tfIdfTopTerms emits exactly k rows per doc with correct tf and df") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a a b c"),
      (1L, "a b b d")).toDF("doc_id", "text")
    val out = Relevance.tfIdfTopTerms(docs, k = 2).collect()
    assert(out.count(_.getLong(0) == 0L) === 2)
    assert(out.count(_.getLong(0) == 1L) === 2)
    val all = Relevance.tfIdfTopTerms(docs, k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(all((0L, "a")) === (2L, 2L)) // tf=2 in doc0, df=2 (both docs)
    assert(all((0L, "c")) === (1L, 1L))
    assert(all((1L, "b")) === (2L, 2L))
  }

  test("bm25PerTerm: rarer query term outranks common one at equal tf and dl") {
    import spark.implicits._
    val docs = Seq(
      (0L, "rare common filler filler"),
      (1L, "common filler filler filler"),
      (2L, "common filler filler filler")).toDF("doc_id", "text")
    val out = Relevance.bm25PerTerm(docs, Seq("rare", "common"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(5)).toMap
    // doc0 contains both at tf=1, same dl → only idf differs; df(rare)=1 < df(common)=3
    assert(out((0L, "rare")) > out((0L, "common")))
    // docs without a term produce no row for it
    assert(!out.contains((1L, "rare")))
    // all three docs share dl=4 ⇒ identical 'common' scores
    assert(out((1L, "common")) === out((2L, "common")))
  }

  test("bm25PerTerm length normalization: same tf, shorter doc scores higher") {
    import spark.implicits._
    val docs = Seq(
      (0L, "term pad"),
      (1L, "term pad pad pad pad pad pad pad")).toDF("doc_id", "text")
    val out = Relevance.bm25PerTerm(docs, Seq("term"))
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(out(0L) > out(1L))
  }

  test("dupSpanStats: exact duplicate docs are fully duplicated spans") {
    import spark.implicits._
    val shared = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, shared),
      (1L, shared),
      (2L, (100 to 111).map(i => s"u$i").mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.dupSpanStats(docs, n = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // 12 words → 5 windows of 8; docs 0/1 duplicate each other completely
    assert(out(0L) === ((5L, 5L, 1.0)))
    assert(out(1L) === ((5L, 5L, 1.0)))
    // doc2's vocabulary is disjoint → zero duplicated windows
    assert(out(2L) === ((5L, 0L, 0.0)))
  }

  test("dupSpanStats counts a span repeated WITHIN one document") {
    import spark.implicits._
    val span = (1 to 8).map(i => s"s$i").mkString(" ")
    // span ... unique filler ... span again: the two identical windows
    // are 8 apart, so both occurrences count as duplicated
    val text = span + " " + (1 to 8).map(i => s"mid$i").mkString(" ") + " " + span
    val docs = Seq((0L, text)).toDF("doc_id", "text")
    val row = Dedup.dupSpanStats(docs, n = 8).collect().head
    val (nW, nDup) = (row.getLong(1), row.getLong(2))
    assert(nW === 17L) // 24 words → 17 windows
    assert(nDup === 2L) // exactly the two copies of `span`
    assert(row.getDouble(3) === 2.0 / 17.0)
  }

  test("dupSpanStats plan: two hash exchanges, no nested loop, no raw-gram shuffle") {
    import spark.implicits._
    val docs = (0L to 50L).map(i => (i, s"w$i " * 12)).toDF("doc_id", "text")
    val p = Dedup.dupSpanStats(docs, n = 8).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // exactly the digest window exchange + the per-doc agg exchange
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 2, p)
    // the projection under the first exchange carries the fused 16-byte
    // window digest, not the gram string
    assert(p.contains("window_digests("), p)
  }

  test("tfIdf/bm25 plans: corpus scalars broadcast; aggregation is hash-based") {
    import spark.implicits._
    val docs = (0L to 50L).map(i => (i, s"data table w$i row")).toDF("doc_id", "text")
    val pt = Relevance.tfIdfTopTerms(docs).queryExecution.executedPlan.toString
    // the only nested-loop is the 1-row N broadcast; tf is a hash agg
    assert("BroadcastNestedLoopJoin".r.findAllIn(pt).length <= 1, pt)
    assert(pt.contains("HashAggregate"), pt)
    val pb = Relevance.bm25PerTerm(docs, Seq("data", "row"))
      .queryExecution.executedPlan.toString
    assert("BroadcastNestedLoopJoin".r.findAllIn(pb).length <= 1, pb)
    assert(!pb.contains("CartesianProduct"), pb)
  }

  test("temperatureThresholds: largest stratum keeps 1000‰, ratios follow sqrt") {
    import spark.implicits._
    val df = (Seq.fill(400)("big") ++ Seq.fill(100)("small"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "src")
    val thr = Scale.temperatureThresholds(df, "src")
    assert(thr("big") === 1000)
    // sqrt(100/400) = 0.5 → 500‰ (exact)
    assert(thr("small") === 500)
    // alpha = 1 degenerates to proportional rates
    val thr1 = Scale.temperatureThresholds(df, "src", alpha = 1.0)
    assert(thr1("big") === 1000 && thr1("small") === 250)
  }

  test("temperatureSample is deterministic and keeps the head stratum whole") {
    import spark.implicits._
    val df = (Seq.fill(300)("big") ++ Seq.fill(75)("small"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "src")
    val a = Scale.temperatureSample(df, "src").collect().map(_.getLong(0)).sorted
    val b = Scale.temperatureSample(df, "src").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    val kept = Scale.temperatureSample(df, "src")
      .groupBy("src").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("big") === 300) // threshold 1000 ⇒ gate always passes
    // sqrt(75/300) = 0.5 ⇒ ~half of 'small' survives the md5 gate
    assert(kept("small") > 15 && kept("small") < 60)
  }

  test("invertedIndex: doc-ordered postings, df/cf counts, minDf prune") {
    import spark.implicits._
    val docs = Seq(
      (3L, "a b a"), (1L, "b c"), (2L, "a")).toDF("doc_id", "text")
    val out = Relevance.invertedIndex(docs).orderBy("term").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq(
      ("a", 2L, 3L, "2:1,3:2"),
      ("b", 2L, 2L, "1:1,3:1"),
      ("c", 1L, 1L, "1:1")))
    val pruned = Relevance.invertedIndex(docs, minDf = 2)
      .select("term").collect().map(_.getString(0)).sorted
    assert(pruned.toSeq === Seq("a", "b"))
  }

  test("hybridRrf: both-leg docs outrank single-leg docs; single-leg contributes 1/(k+r)") {
    import spark.implicits._
    // doc 1: lexical hit AND the vector nearest the query
    // doc 2: lexical hit only (it has NO vector — e.g. not yet embedded)
    // doc 3: vector hit only (no query term in its text)
    val docs = Seq(
      (0L, "query anchor document"),
      (1L, "spark spark data engine"),
      (2L, "spark data rows"),
      (3L, "nothing relevant textually")).toDF("doc_id", "text")
    val embeddings = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (3L, Seq(0.8f, 0.2f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Relevance.hybridRrf(docs, embeddings, Seq("spark", "data"),
        queryVecId = 0L, k = 10).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1 fuses both legs → strictly above every single-leg doc
    assert(got(1L)._1 > 0 && got(1L)._2 > 0)
    assert(got(1L)._3 > got(2L)._3 && got(1L)._3 > got(3L)._3)
    // single-leg contributions are exactly 1/(60 + rank)
    assert(got(2L)._2 === 0L)
    assert(got(2L)._3 === 1.0 / (60 + got(2L)._1))
    assert(got(3L)._1 === 0L)
    assert(got(3L)._3 === 1.0 / (60 + got(3L)._2))
  }

  test("retrievalEval: hand-computed metrics on a 2D fixture, exact dyadic nEDCG") {
    import spark.implicits._
    // query 0 (label 0) at (1,0); candidates on known angles:
    //   id1 (2,0)  lab 0 → cos 1.0       rank 1, relevant
    //   id2 (1,1)  lab 1 → cos 0.707107  rank 2, not relevant
    //   id3 (0,1)  lab 0 → cos 0.0       rank 3 (outside k=2)
    // n_rel(label 0) = 2; hits@2 = 1; precision = 0.5; recall = 0.5;
    // MRR = 1/1; DCG = 1·2^0 = 1.0; IDCG(min(2,2)) = 1 + 1/2 = 1.5;
    // nEDCG = 1/1.5 — an exact IEEE quotient both engines share.
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(2.0f, 0.0f), 0),
      (2L, Seq(1.0f, 1.0f), 1),
      (3L, Seq(0.0f, 1.0f), 0)).toDF("vec_id", "embedding", "label")
    val out = Relevance.retrievalEval(emb, col("vec_id") === 0, k = 2)
    val r = out.collect()
    assert(r.length === 1)
    val m = r.head
    assert(m.getLong(0) === 0L && m.getLong(1) === 2L && m.getLong(2) === 1L)
    assert(m.getDouble(3) === 0.5 && m.getDouble(4) === 0.5)
    assert(m.getDouble(5) === 1.0)
    assert(m.getDouble(6) === 1.0 / 1.5)
    // scale gate: the rank<=k filter must collapse to a map-side group
    // limit so the per-query shuffle carries Q·k rows, not Q·N (assert
    // on the FINAL adaptive plan — AQE hides markers pre-execution)
    val plan = out.queryExecution.executedPlan.toString()
    assert(plan.contains("WindowGroupLimit"),
      s"retrievalEval top-k should plan a WindowGroupLimit:\n$plan")
  }

  test("retrievalEval: all-relevant top-k yields nEDCG 1.0 and MRR 1.0") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f), 5),
      (1L, Seq(3.0f, 1.0f), 5),
      (2L, Seq(2.0f, 1.0f), 5),
      (3L, Seq(-1.0f, 0.0f), 7)).toDF("vec_id", "embedding", "label")
    val m = Relevance.retrievalEval(emb, col("vec_id") === 0, k = 2)
      .collect().head
    // both top-2 share label 5: hits=2, perfect ranking metrics
    assert(m.getLong(2) === 2L)
    assert(m.getDouble(5) === 1.0 && m.getDouble(6) === 1.0)
    assert(m.getDouble(3) === 1.0)       // precision@2
    assert(m.getDouble(4) === 1.0)       // recall: n_rel = 2, hits = 2
  }
}
