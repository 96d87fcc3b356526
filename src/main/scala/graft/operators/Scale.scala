package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale utilities (SURVEY.md §4 "Partitioning & shuffle"): explicit skew
  * salting and bucketed co-located joins — the two knobs AQE cannot
  * always turn for you at 100 TB.
  *
  * When to use what:
  *  - AQE skew-join handles moderate skew automatically (split oversized
  *    partitions at runtime) — the default, nothing to do.
  *  - [[saltedJoin]] is for pathological hot keys (one key ≫ executor
  *    memory): the build side is replicated `saltFactor`× and the probe
  *    side scattered, so no single task owns a whole hot key.
  *  - [[writeBucketed]] pre-shuffles once at write time; every later join
  *    or aggregation on the bucket key is exchange-free (the dominant
  *    cost at petabyte scale is repeated shuffles of the same fact
  *    table).
  */
object Scale {

  /** Skew-tolerant inner equi-join. The probe (large, skewed) side gets a
    * random-but-deterministic salt in [0, saltFactor); the build side is
    * exploded once per salt value. Result is exactly the plain join's
    * (verified by SkewSpec); cost trades `saltFactor`× build-side
    * replication for even task sizing on the probe side.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    // Salt must be DETERMINISTIC per row content: a nondeterministic salt
    // (rand / monotonically_increasing_id) changes on stage retry and
    // loses or duplicates rows across reducers (the SPARK-23207 class of
    // bug). Hashing the full row spreads a hot key as long as payloads
    // differ — identical full-duplicate rows co-locate, which is correct
    // if not load-balanced.
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Write a DataFrame bucketed + sorted by `key` into the session
    * catalog. Two tables bucketed the same way join with zero Exchange
    * (asserted in SkewSpec) — the pre-partitioning pattern for fact
    * tables that are joined repeatedly on the same key.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", s"${sys.props("java.io.tmpdir")}/graft_bucketed/$table")
      .saveAsTable(table)

  /** Token-budget pack assignment (ONE definition — the t6 probe and the
    * shard writer share it): running-sum binning of `tokenCount(text)`
    * within each `shardKeyCol` group, ordered by `idCol`. The cumulative
    * sum windows per group, never globally — a global cumsum serializes
    * at scale. Null/absent text counts as 0 tokens so every document
    * lands in a real pack (a null pack_id would silently route rows to
    * the Hive default partition at write time).
    */
  def packTokens(docs: DataFrame, tokensPerShard: Int = 512,
      textCol: String = "text", idCol: String = "doc_id",
      shardKeyCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(shardKeyCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tokens",
        coalesce(graft.functions.TextFunctions.tokenCount(col(textCol)), lit(0L)))
      .withColumn("pack_id",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / tokensPerShard)
          .cast("long"))
  }

  /** Deterministic stratified sampler (training-mix control): keep a row
    * iff an md5-derived hash of its id falls under the stratum's rate —
    * `h(id) mod 1000 < rate·1000`. Unlike `df.stat.sampleBy` (engine-RNG
    * bound, irreproducible across Spark versions), the md5 gate is a pure
    * function of the row id: portable across engines (DuckDB computes the
    * identical gate — the t7 oracle), stable under retries/partitioning,
    * and per-row independent, so stratum proportions concentrate tightly
    * at scale. Strata absent from `rates` are dropped, matching the
    * sampleBy contract. No shuffle: a scan-local filter.
    */
  def hashStratifiedSample(df: DataFrame, strataCol: String,
      rates: Map[String, Double], idCol: String = "doc_id",
      seed: Long = 42L): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0, 1]")
    // permille thresholds as a literal map: rate resolution 1/1000
    val thresholds = map(rates.toSeq.flatMap { case (k, v) =>
      Seq(lit(k), lit(math.round(v * 1000).toInt))
    }: _*)
    val gate = conv(substring(
        md5(concat(col(idCol).cast("string"), lit("#" + seed))), 1, 8),
      16, 10).cast("long") % 1000
    df.withColumn("__thr", element_at(thresholds, col(strataCol)))
      .filter(col("__thr").isNotNull && gate < col("__thr"))
      .drop("__thr")
  }

  /** Materialize a training corpus as token-budgeted shards via
    * [[packTokens]], written `partitionBy(shardKey, pack_id)` — every
    * (source, pack) directory is one reproducible training shard a
    * loader can consume independently. The pre-write repartition lines
    * tasks up with output directories (one shard = one task), and
    * sortWithinPartitions covers the dynamic-partition writer's required
    * (shardKey, pack_id) prefix PLUS idCol — the writer then inserts no
    * sort of its own, so in-file document order is pinned run-to-run.
    */
  def writeTrainingShards(docs: DataFrame, outDir: String,
      tokensPerShard: Int = 512, textCol: String = "text",
      idCol: String = "doc_id", shardKeyCol: String = "source"): Unit =
    packTokens(docs, tokensPerShard, textCol, idCol, shardKeyCol)
      .repartition(col(shardKeyCol), col("pack_id"))
      .sortWithinPartitions(col(shardKeyCol), col("pack_id"), col(idCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(shardKeyCol, "pack_id")
      .parquet(outDir)
}
