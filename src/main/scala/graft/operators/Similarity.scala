package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY.md §2.10): exact cosine top-k as
  * the baseline, random-hyperplane LSH bucketing as the approximate scale
  * path.
  *
  * All vector arithmetic is `zip_with`/`aggregate` over `array<double>` —
  * native Catalyst higher-order expressions evaluated in-row (no UDF, no
  * serialization). Folds are sequential left-to-right, which keeps results
  * bit-identical to any other engine that sums in element order (the
  * DuckDB oracle does).
  */
object Similarity {

  /** Cast a float embedding to double for stable arithmetic. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine against the embedding of `queryId`. The single
    * query vector is a broadcast nested-loop over the scan — a full pass
    * but no shuffle; `round` before ordering makes the ranking stable
    * across engines. At cluster scale this is the "flat" baseline: one map
    * stage + a TakeOrdered, network cost O(k × partitions).
    */
  def topKCosine(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = broadcast(embeddings.filter(col("vec_id") === queryId)
      .select(asDouble(col("embedding")).as("qv")))
    embeddings.filter(col("vec_id") =!= queryId)
      .crossJoin(q)
      .select(col("vec_id"),
        round(cosine(asDouble(col("embedding")), col("qv")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** All pairs with cosine ≥ `threshold` among vec_id < `idCap` — the
    * embedding near-dup probe. Bounded cross join (idCap² pairs) used as a
    * correctness oracle; the scale path is [[annBuckets]] + join within
    * buckets.
    */
  def nearDupPairs(embeddings: DataFrame, idCap: Long, threshold: Double): DataFrame = {
    val e = embeddings.filter(col("vec_id") < idCap)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val a = e.select(col("vec_id").as("id_a"), col("v").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va"), col("vb")), 6).as("sim"))
      .filter(col("sim") >= threshold)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Deterministic pseudo-random unit hyperplanes (fixed seed) for
    * sign-LSH. Generated driver-side once; tiny (nBits × dim doubles) and
    * embedded as a literal into the plan, so executors pay nothing.
    */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: bit i = sign(v · hyperplane_i). Vectors with high
    * cosine land in the same bucket with high probability (Charikar's
    * SimHash for angular distance).
    */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.foldLeft(lit(0L)) { case (acc, (p, i)) =>
      val plane = array(p.map(lit(_)): _*)
      acc.bitwiseOR(shiftleft(when(dot(v, plane) > 0, 1L).otherwise(0L), i))
    }

  /** Embeddings with an LSH `bucket` column. Downstream ANN = shuffle on
    * `bucket` (or bucketed-write once, then shuffle-free forever) and
    * search only within the query's bucket — the IVF-style scale path.
    */
  def annBuckets(embeddings: DataFrame, nBits: Int = 8, dim: Int = 64): DataFrame =
    embeddings.withColumn("bucket",
      lshBucket(asDouble(col("embedding")), hyperplanes(nBits, dim)))

  /** Approximate top-k: exact search restricted to the query vector's LSH
    * bucket and its Hamming-1 neighbor buckets (multi-probe).
    */
  def topKCosineApprox(embeddings: DataFrame, queryId: Long, k: Int,
      nBits: Int = 8, dim: Int = 64): DataFrame = {
    val bucketed = annBuckets(embeddings, nBits, dim)
    val qRow = bucketed.filter(col("vec_id") === queryId)
      .select(asDouble(col("embedding")).as("qv"), col("bucket").as("qb"))
    val q = broadcast(qRow)
    val probes = (0 until nBits).map(i => col("qb").bitwiseXOR(lit(1L << i))) :+ col("qb")
    bucketed.filter(col("vec_id") =!= queryId)
      .crossJoin(q)
      .filter(probes.map(p => col("bucket") === p).reduce(_ || _))
      .select(col("vec_id"),
        round(cosine(asDouble(col("embedding")), col("qv")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }
}
