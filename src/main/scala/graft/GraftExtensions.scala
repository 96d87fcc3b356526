package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point: wire the engine's custom expressions
  * into any SparkSession at startup —
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Cluster-wide registration is what makes the SQL surface usable from
  * pure-SQL clients (Thrift server, notebooks) without touching Scala.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
    import graft.functions._

    def intLit(e: Expression, what: String): Int = e match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }

    def info(name: String): ExpressionInfo =
      new ExpressionInfo(classOf[GraftExtensions].getName, name)

    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature"),
      (es: Seq[Expression]) => MinHashSignatureExpr(es.head,
        intLit(es(1), "numHashes"), intLit(es(2), "shingleSize"))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64"), (es: Seq[Expression]) => SimHash64Expr(es.head)))
    ext.injectFunction((FunctionIdentifier("simhash64_text"),
      info("simhash64_text"), (es: Seq[Expression]) => SimHashTextExpr(es.head)))
    ext.injectFunction((FunctionIdentifier("ngram_jaccard"),
      info("ngram_jaccard"),
      (es: Seq[Expression]) => NgramJaccardExpr(es.head, es(1),
        intLit(es(2), "shingleSize"))))
    ext.injectFunction((FunctionIdentifier("text_stats"),
      info("text_stats"), (es: Seq[Expression]) => TextStatsExpr(es.head)))
  }
}
