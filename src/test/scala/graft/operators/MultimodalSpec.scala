package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val media = Multimodal.mediaFromDocuments(
    Tables.documents(spark, TestSpark.sfDir))

  test("media table: binary payload + typed metadata, all kinds present") {
    assert(media.count() === 500)
    assert(media.schema("bytes").dataType.typeName === "binary")
    assert(media.select("kind").distinct().count() === 3)
    val m = media.select("meta.mime", "meta.width", "meta.duration_ms")
      .limit(1).collect()(0)
    assert(m.getString(0).startsWith("application/x-graft-"))
    assert(m.getInt(1) >= 64)
  }

  test("feature extraction: one normalized vector per payload, partition-local") {
    val feats = Multimodal.extractFeatures(media, bins = 16)
    assert(feats.count() === 500)
    val row = feats.filter(col("media_id") === 0L).collect()(0)
    val v = row.getSeq[Float](1)
    assert(v.length === 16)
    assert(math.abs(v.sum - 1.0f) < 1e-3, "histogram should be L1-normalized")
    // determinism: same payload → same features
    val again = Multimodal.extractFeatures(media, bins = 16)
      .filter(col("media_id") === 0L).collect()(0).getSeq[Float](1)
    assert(v === again)
  }

  test("frame sampling: stride/length respected, capped frame count") {
    val frames = Multimodal.sampleFrames(media.filter(col("kind") === "video"),
      frameLen = 64, stride = 256, maxFrames = 8)
    val byMedia = frames.groupBy("media_id")
      .agg(count(lit(1)).as("n"), max("frame_idx").as("maxIdx"))
    assert(byMedia.filter(col("n") > 8).count() === 0)
    assert(frames.filter(length(col("frame_bytes")) > 64).count() === 0)
    // a long document yields multiple frames
    assert(frames.groupBy("media_id").count().agg(max("count"))
      .collect()(0).getLong(0) >= 2)
  }

  test("resize mean-pools adjacent feature bins") {
    import spark.implicits._
    val one = Seq((1L, Seq(1.0f, 3.0f, 5.0f, 7.0f))).toDF("media_id", "features")
    val resized = Multimodal.resizeFeatures(one, from = 4, to = 2)
      .collect()(0).getSeq[Float](1)
    assert(resized === Seq(2.0f, 6.0f))
  }

  test("payloads shorter than a frame yield zero frames, not garbage") {
    import spark.implicits._
    val tiny = Seq((1L, "short"), (2L, "x" * 500)).toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("bytes"),
        lit(null).as("meta"))
    val frames = Multimodal.sampleFrames(tiny, frameLen = 64, stride = 256)
    val byId = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!byId.contains(1L), "short payload must produce no frames")
    assert(byId(2L) === 2L) // floor((500-64)/256)+1
  }

  test("phash dedup: identical payloads group under the min id, skew-free payloads differ") {
    import spark.implicits._
    // ids 3 and 9 share a kind (doc_id % 3 = 0) and an identical
    // payload; 6 shares the kind but skews toward different bins; 4 is
    // another kind entirely; 12 is empty (all-zero hash, still grouped)
    val docs = Seq(
      (3L, "aaaa bbbb aaaa bbbb"), (9L, "aaaa bbbb aaaa bbbb"),
      (6L, "zzzzzzzz yyyyyyyy zzzz"), (4L, "aaaa bbbb aaaa bbbb"),
      (12L, "")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val got = Multimodal.phashDupGroups(Multimodal.mediaFromDocuments(docs))
      .collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[String]("kind"), r.getAs[Long]("phash"),
          r.getAs[Long]("group_rep"), r.getAs[Boolean]("is_dup")))).toMap
    // identical payloads, same modality → one group, keep-first
    assert(got(3L)._2 === got(9L)._2)
    assert(got(3L)._3 === 3L && !got(3L)._4)
    assert(got(9L)._3 === 3L && got(9L)._4)
    // same modality, different byte distribution → different hash
    assert(got(6L)._2 !== got(3L)._2)
    assert(!got(6L)._4)
    // same payload in ANOTHER modality never joins the group
    assert(got(4L)._1 !== got(3L)._1)
    assert(got(4L)._3 === 4L && !got(4L)._4)
    // empty payload: all bins at zero, no bit set
    assert(got(12L)._2 === 0L)
  }

  test("phash bit rule: hand-computed golden, independent of the generated oracle SQL") {
    import spark.implicits._
    // Hand-computed hashes (bins=16, bit j set iff 16·count_j > n):
    //   "aaaa"             — 'a'=97, 97%16=1, c1=4, n=4  → bit 1    → 2
    //   "abcdefgh"         — bytes 97..104 → bins 1..8, c=1 each,
    //                        16·1 > 8 → bits 1..8                   → 510
    //   "0123456789ABCDEF" — '0'→bin 0 (c=1), digits+hex letters
    //                        double up bins 1..6 (c=2), bins 7..9
    //                        c=1; n=16, bit iff c ≥ 2 → bits 1..6   → 126
    val expected = Map(1L -> 2L, 2L -> 510L, 3L -> 126L)
    val texts = Map(1L -> "aaaa", 2L -> "abcdefgh", 3L -> "0123456789ABCDEF")
    val fixture = texts.toSeq.map { case (id, t) => (id, "image", t) }
      .toDF("media_id", "kind", "txt")
      .select(col("media_id"), col("kind"), col("txt").cast("binary").as("bytes"))
    val got = Multimodal.perceptualHash(fixture).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("phash")).toMap
    assert(got === expected, "Spark perceptualHash diverges from the hand golden")
    // the character-wise rule the DuckDB twin encodes, re-derived here
    // independently — a shared-formula bug in the generated SQL cannot
    // hide behind the implementation agreeing with itself
    def charRule(text: String): Long = (0 until 16).map { j =>
      val c = text.count(ch => ch.toInt % 16 == j)
      if (16 * c > text.length) 1L << j else 0L
    }.sum
    texts.foreach { case (id, t) =>
      assert(charRule(t) === expected(id),
        s"oracle-side character rule diverges from the hand golden for '$t'")
    }
  }

  test("phash radius-1 pairs: planted near-dup found at radius 1, not radius 0") {
    import spark.implicits._
    // phashes: 1→{bit1}=2, 2→{bits1,2}=6, 3→{bit10}=1024, 4→{bit1}=2
    // hamming: (1,2)=1  (1,4)=0  (2,4)=1  (x,3)≥2
    val fixture = Seq((1L, "aaaa"), (2L, "aabb"), (3L, "zzzz"), (4L, "aaaa"))
      .toDF("media_id", "txt")
      .select(col("media_id"), lit("image").as("kind"),
        col("txt").cast("binary").as("bytes"))
    def pairs(radius: Int): Set[(Long, Long, Long)] =
      Multimodal.phashNearDupPairs(fixture, radius = radius).collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Long]("hamming"))).toSet
    assert(pairs(0) === Set((1L, 4L, 0L)),
      "radius 0 must keep exact-hash pairs only")
    assert(pairs(1) === Set((1L, 2L, 1L), (1L, 4L, 0L), (2L, 4L, 1L)),
      "radius 1 must add exactly the 1-bit-perturbed pairs")
  }

  test("phash radius-1 pairs: pigeonhole bands are complete vs brute force on the corpus") {
    val hashes = Multimodal.perceptualHash(media).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[String]("kind"),
        r.getAs[Long]("phash")))
    val brute = (for {
      (ia, ka, ha) <- hashes; (ib, kb, hb) <- hashes
      if ka == kb && ia < ib
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= 1
    } yield (ka, ia, ib, d.toLong)).toSet
    val banded = Multimodal.phashNearDupPairs(media, radius = 1).collect()
      .map(r => (r.getAs[String]("kind"), r.getAs[Long]("id_a"),
        r.getAs[Long]("id_b"), r.getAs[Long]("hamming"))).toSet
    assert(banded === brute,
      s"banded ${banded.size} pairs != brute-force ${brute.size}")
    assert(brute.nonEmpty, "corpus fixture should contain radius-1 pairs")
  }

  test("phash pairs: large radius keeps every band non-empty (no all-pairs band)") {
    // radius 9 on 16 bits: a ceil-width layout (width 2) leaves bands
    // 8 and 9 past bit 16 with mask 0 — an all-pairs candidate band.
    // The even-split layout gives every band ≥ 1 real bit; completeness
    // (banded ≡ brute force) must still hold at this radius.
    val hashes = Multimodal.perceptualHash(media).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[String]("kind"),
        r.getAs[Long]("phash")))
    val brute = (for {
      (ia, ka, ha) <- hashes; (ib, kb, hb) <- hashes
      if ka == kb && ia < ib
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= 9
    } yield (ka, ia, ib, d.toLong)).toSet
    val banded = Multimodal.phashNearDupPairs(media, radius = 9).collect()
      .map(r => (r.getAs[String]("kind"), r.getAs[Long]("id_a"),
        r.getAs[Long]("id_b"), r.getAs[Long]("hamming"))).toSet
    assert(banded === brute,
      s"radius-9 banded ${banded.size} pairs != brute-force ${brute.size}")
  }

  test("phash delta round ≡ full pairs run restricted to delta-touching pairs") {
    // the incremental contract: banding is a pure function of the hash,
    // so probing frozen corpus postings with the delta alone must equal
    // the full run's delta-touching pairs exactly (the mm8 oracle's
    // relational form of the same identity)
    // parity split (NOT %3 — kind IS doc_id%3, and a %3 split would
    // strand the delta in a kind the corpus lacks: no cross pairs);
    // the shift stays ≡ 0 (mod 3) so each delta doc keeps its kind
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val corpus = docs.filter(col("doc_id") % 2 === 0).select("doc_id", "text")
    val delta = docs.filter(col("doc_id") % 2 === 1)
      .select((col("doc_id") + 1000002L).as("doc_id"), col("text"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("kind"), r.getAs[Long]("id_a"),
        r.getAs[Long]("id_b"), r.getAs[Long]("hamming"))
    val inc = Multimodal.phashNearDupPairsDelta(
        Multimodal.mediaFromDocuments(corpus),
        Multimodal.mediaFromDocuments(delta), bins = 16, radius = 1)
      .collect().map(key).toSet
    val full = Multimodal.phashNearDupPairs(
        Multimodal.mediaFromDocuments(corpus.unionByName(delta)),
        bins = 16, radius = 1)
      .filter(col("id_a") >= 1000000L || col("id_b") >= 1000000L)
      .collect().map(key).toSet
    assert(inc === full)
    assert(full.exists(p => p._2 < 1000000L && p._3 >= 1000000L),
      "fixture should contain a corpus-delta cross pair")
    assert(full.exists(p => p._2 >= 1000000L),
      "fixture should contain a delta-internal pair")
  }
}
