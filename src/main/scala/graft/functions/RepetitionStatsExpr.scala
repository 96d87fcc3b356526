package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass repetition + filter-rule stats (Gopher §A1.1 / C4):
  * word count, mean word length, stopword ratio, duplicate-3-gram
  * fraction, and top-bigram fraction — one imperative scan per document.
  *
  * This exists because the HOF formulation (`wordShingles` →
  * `array_distinct` / explode → groupBy) measured 38.8 s (t10) and
  * 33.3 s (t11) at sf0.1 where this kernel runs in well under a second —
  * the same ~10-100× interpreted-lambda tax CLAUDE.md records for t9.
  * Semantics match [[TextFunctions.dupNgramFrac]] / the t10 oracle
  * exactly, including the partial-shingle rule (0 < words < n ⇒ ONE
  * shingle of all words) and the empty-document zeros; the equivalence
  * is property-tested against the HOF twins in TextStatsSpec.
  */
object RepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("stop_ratio", DoubleType, nullable = false),
    StructField("dup3_frac", DoubleType, nullable = false),
    StructField("top2_frac", DoubleType, nullable = false)))

  def repetitionStats(text: Column): Column =
    GraftBridge.toColumn(RepetitionStatsExpr(GraftBridge.toExpression(text)))

  /** One pass: tokenize (TextFunctions.words' split class), then count
    * 3-gram distinctness and the bigram mode in-row. Shingle DISTINCT
    * uses the joined strings (not hashes) so the count is exact vs the
    * string-based oracle under any input.
    */
  def compute(text: String): (Long, Double, Double, Double, Double) = {
    // full-string lowercase (Locale.ROOT) — per-char lowering diverges on
    // multi-char lowercase mappings (same fix as TextStatsExpr)
    val lowered = text.toLowerCase(java.util.Locale.ROOT)
    val llen = lowered.length
    val words = new scala.collection.mutable.ArrayBuffer[String](64)
    var wordLenSum = 0L
    var stopHits = 0
    val sb = new java.lang.StringBuilder(24)
    var i = 0
    while (i <= llen) {
      val alnum = i < llen && {
        val c = lowered.charAt(i)
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      }
      if (alnum) sb.append(lowered.charAt(i))
      else if (sb.length() > 0) {
        val w = sb.toString
        words += w
        wordLenSum += w.length
        if (TextStats.enStopwords.contains(w)) stopHits += 1
        sb.setLength(0)
      }
      i += 1
    }
    val n = words.length
    val nWords = n.toLong
    val meanLen = if (n == 0) 0.0 else wordLenSum.toDouble / n
    val stopRatio = if (n == 0) 0.0 else stopHits.toDouble / n

    // duplicate 3-gram fraction: windows of 3 (ONE whole-doc shingle when
    // 0 < n < 3), distinct by joined string — identical to wordShingles
    val dup3 =
      if (n == 0) 0.0
      else if (n < 3) 0.0 // single shingle: total 1, distinct 1
      else {
        val total = n - 2
        val seen = new java.util.HashSet[String](total * 2)
        var k = 0
        var distinct = 0
        while (k < total) {
          val g = words(k) + " " + words(k + 1) + " " + words(k + 2)
          if (seen.add(g)) distinct += 1
          k += 1
        }
        (total - distinct).toDouble / total
      }

    // top-bigram fraction: mode count / total windows of 2 (a single
    // partial shingle when n == 1 ⇒ fraction 1.0; 0.0 when empty)
    val top2 =
      if (n == 0) 0.0
      else if (n < 2) 1.0
      else {
        val total = n - 1
        val counts = new java.util.HashMap[String, Int](total * 2)
        var k = 0
        var maxCnt = 0
        while (k < total) {
          val g = words(k) + " " + words(k + 1)
          val c = counts.merge(g, 1, (a, b) => a + b)
          if (c > maxCnt) maxCnt = c
          k += 1
        }
        maxCnt.toDouble / total
      }

    (nWords, meanLen, stopRatio, dup3, top2)
  }
}

case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = RepetitionStats.schema
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any = {
    val (n, ml, sr, d3, t2) =
      RepetitionStats.compute(input.asInstanceOf[UTF8String].toString)
    new GenericInternalRow(Array[Any](n, ml, sr, d3, t2))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
