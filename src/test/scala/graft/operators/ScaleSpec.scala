package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join returns exactly the plain join result on skewed data") {
    import spark.implicits._
    // hot key 1L carries 10k rows; keys 2..100 one row each
    val probe = (Seq.fill(10000)(1L) ++ (2L to 100L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val build = (1L to 100L).map(k => (k, s"dim_$k")).toDF("k", "name")

    val plain = probe.join(build, "k")
    val salted = Scale.saltedJoin(probe, build, "k", saltFactor = 8)

    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("bucketed tables join without any Exchange") {
    import spark.implicits._
    val facts = (1L to 1000L).map(k => (k % 50, k.toDouble)).toDF("k", "v")
    val dims = (0L until 50L).map(k => (k, s"d_$k")).toDF("k", "name")
    Scale.writeBucketed(facts, "graft_facts_b", "k", 8)
    Scale.writeBucketed(dims, "graft_dims_b", "k", 8)

    // disable broadcast so the planner must consider shuffle vs bucketing
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_facts_b")
        .join(spark.table("graft_dims_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketing unused:\n$plan")
      assert(joined.count() === 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("repartitionByRange produces range-partitioned output for ordered writes") {
    val li = graft.Tables.lineitem(spark, TestSpark.sfDir)
      .repartitionByRange(4, col("l_shipdate"))
    assert(li.rdd.getNumPartitions === 4)
    // per-partition min/max must not overlap (range partitioning)
    val bounds = li.select(col("l_shipdate").cast("timestamp").cast("long").as("d"))
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg(min("d").as("lo"), max("d").as("hi"))
      .orderBy("p").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    bounds.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("training-shard writer: token-budgeted, partition-per-shard, deterministic") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val docs = graft.Tables.documents(spark, graft.TestSpark.sfDir)
    Scale.writeTrainingShards(docs, out, tokensPerShard = 512)
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count(), "shard write lost documents")
    // every (source, pack) shard respects budget + one overflowing doc
    val sums = back.groupBy("source", "pack_id")
      .agg(sum("n_tokens").as("tok"), max("n_tokens").as("mx")).collect()
    sums.foreach { r =>
      assert(r.getLong(r.fieldIndex("tok")) <=
        512 + r.getLong(r.fieldIndex("mx")),
        s"shard over budget: $r")
    }
    // physical layout: one directory per (source, pack)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
    assert(dirs.nonEmpty && dirs.forall(_.getName.startsWith("source=")))
    // deterministic: second write produces identical shard assignment
    val out2 = java.nio.file.Files.createTempDirectory("graft_shards2").toString
    Scale.writeTrainingShards(docs, out2, tokensPerShard = 512)
    val a = back.select("doc_id", "pack_id").orderBy("doc_id").collect().toSeq
    val b = spark.read.parquet(out2).select("doc_id", "pack_id")
      .orderBy("doc_id").collect().toSeq
    assert(a.map(_.toString) === b.map(_.toString))
  }
}
