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
}
