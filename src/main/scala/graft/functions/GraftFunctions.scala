package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** SQL registration of the engine's custom Catalyst expressions, so the
  * `spark.sql(...)` surface reaches them too:
  *
  * {{{
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT minhash_signature(words, 64, 3) FROM docs")
  * }}}
  *
  * The single (name, arity, builder) table here also backs
  * [[graft.GraftExtensions]] — one list, two entry points, no drift.
  */
object GraftFunctions {

  private def intLit(e: Expression, fn: String, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got $other")
  }

  private def checked(name: String, arity: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      if (es.length != arity) throw new IllegalArgumentException(
        s"$name expects $arity arguments, got ${es.length}")
      build(es)
    }

  /** name → builder, shared by session-level and extensions registration. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minhash_signature" -> checked("minhash_signature", 3)(es =>
      MinHashSignatureExpr(es.head,
        intLit(es(1), "minhash_signature", "numHashes"),
        intLit(es(2), "minhash_signature", "shingleSize"))),
    "simhash64" -> checked("simhash64", 1)(es => SimHash64Expr(es.head)),
    "simhash64_text" -> checked("simhash64_text", 1)(es => SimHashTextExpr(es.head)),
    "ngram_jaccard" -> checked("ngram_jaccard", 3)(es =>
      NgramJaccardExpr(es.head, es(1), intLit(es(2), "ngram_jaccard", "shingleSize"))),
    "text_stats" -> checked("text_stats", 1)(es => TextStatsExpr(es.head)),
    "repetition_stats" -> checked("repetition_stats", 1)(es =>
      RepetitionStatsExpr(es.head)),
    "shingle_hashes" -> checked("shingle_hashes", 2)(es =>
      ShingleHashesExpr(es.head, intLit(es(1), "shingle_hashes", "shingleSize"))),
    "sorted_jaccard" -> checked("sorted_jaccard", 2)(es =>
      SortedLongJaccardExpr(es.head, es(1))),
    "sorted_overlap" -> checked("sorted_overlap", 2)(es =>
      SortedLongOverlapExpr(es.head, es(1))),
    "window_digests" -> checked("window_digests", 2)(es =>
      WindowDigestsExpr(es.head, intLit(es(1), "window_digests", "n"))),
    "heavy_hitters" -> checked("heavy_hitters", 2)(es =>
      HeavyHittersAgg(es.head, intLit(es(1), "heavy_hitters", "k"))))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}
