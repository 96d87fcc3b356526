package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration of the engine's custom Catalyst expressions, so the
  * `spark.sql(...)` surface reaches them too:
  *
  * {{{
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT minhash_signature(words, 64, 3) FROM docs")
  * }}}
  *
  * Registered: minhash_signature(words, numHashes, shingleSize),
  * simhash64(words), simhash64_text(text),
  * ngram_jaccard(wordsA, wordsB, n), text_stats(text).
  */
object GraftFunctions {

  private def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("minhash_signature",
      es => MinHashSignatureExpr(es.head, intLit(es(1), "numHashes"),
        intLit(es(2), "shingleSize")), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash64Expr(es.head), "built-in")
    reg.createOrReplaceTempFunction("simhash64_text",
      es => SimHashTextExpr(es.head), "built-in")
    reg.createOrReplaceTempFunction("ngram_jaccard",
      es => NgramJaccardExpr(es.head, es(1), intLit(es(2), "shingleSize")), "built-in")
    reg.createOrReplaceTempFunction("text_stats",
      es => TextStatsExpr(es.head), "built-in")
  }
}
