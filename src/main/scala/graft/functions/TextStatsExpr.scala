package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass text analytics (SURVEY.md §2.10): token count,
  * punctuation ratio, stopword ratio, mean word length, quality score,
  * language ID, and BPE-ish token estimate — one imperative scan per
  * document instead of ~10 interpreted higher-order-function passes.
  * Semantics match the column-function versions in [[TextFunctions]]
  * (same word split, same stopword profiles, same quality formula);
  * language-ID ties break to the alphabetically first language.
  */
object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("quality", DoubleType, nullable = false),
    StructField("lang_pred", StringType, nullable = false),
    StructField("token_est", LongType, nullable = false)))

  def textStats(text: Column): Column =
    GraftBridge.toColumn(TextStatsExpr(GraftBridge.toExpression(text)))

  val langProfiles: Seq[(String, Set[String])] = Seq(
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"),
    "en" -> Set("the", "and", "is", "of", "to", "in", "that", "it", "with"),
    "es" -> Set("el", "la", "los", "las", "es", "de", "que", "y", "en"),
    "fr" -> Set("le", "la", "les", "est", "et", "des", "une", "que", "dans"),
    "zh" -> Set("de", "shi", "le", "bu", "wo", "zai", "you", "ren", "ta"))

  private[functions] val enStopwords: Set[String] = Set(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this")

  private val punctChars = ".,!?;:'\"()[]{}-".toSet

  /** One pass over the text computing every stat. */
  def compute(text: String): (Long, Double, Double, Double,
      Double, String, Long) = {
    val len = text.length
    var punct = 0
    var tokenEst = 0L
    // BPE-ish estimate: letter runs, single digits, single non-alnum-non-ws
    var i = 0
    var inLetters = false
    while (i < len) {
      val c = text.charAt(i)
      // ASCII letter class, matching tokenEstimate's [A-Za-z] regex —
      // Character.isLetter would diverge on non-ASCII ("café" = 1 vs 2)
      val isLetter = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
      // whitespace per Java regex \s (ASCII only) — Character.isWhitespace
      // admits Unicode spaces the HOF regex does not
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
      if (isLetter && !inLetters) tokenEst += 1
      else if (!isLetter) {
        if (c >= '0' && c <= '9') tokenEst += 1
        else if (!isWs) {
          tokenEst += 1
          if (punctChars.contains(c)) punct += 1
        }
      }
      inLetters = isLetter
      i += 1
    }
    // word pass over the FULL-STRING lowercased text (Locale.ROOT) —
    // per-char toLowerCase diverges from Spark/DuckDB lower() on chars
    // like U+0130 whose lowercase is multi-char (same fix as
    // SimHashTextExpr); any char outside [a-z0-9] after lowering is a
    // separator, exactly TextFunctions.words' split class
    val lowered = text.toLowerCase(java.util.Locale.ROOT)
    val llen = lowered.length
    var nWords = 0L
    var wordLenSum = 0L
    var stopHits = 0
    val langHits = new Array[Int](langProfiles.size)
    val sb = new java.lang.StringBuilder(24)
    i = 0
    while (i <= llen) {
      val alnum = i < llen && {
        val c = lowered.charAt(i)
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      }
      if (alnum) sb.append(lowered.charAt(i))
      else if (sb.length() > 0) {
        val w = sb.toString
        nWords += 1
        wordLenSum += w.length
        if (enStopwords.contains(w)) stopHits += 1
        var p = 0
        while (p < langProfiles.size) {
          if (langProfiles(p)._2.contains(w)) langHits(p) += 1
          p += 1
        }
        sb.setLength(0)
      }
      i += 1
    }
    val punctRatio = if (len == 0) 0.0 else punct.toDouble / len
    val stopRatio = if (nWords == 0) 0.0 else stopHits.toDouble / nWords
    val meanLen = if (nWords == 0) 0.0 else wordLenSum.toDouble / nWords
    // quality formula identical to TextFunctions.qualityScore
    val lenScore = math.min(len / 500.0, 1.0)
    val stopScore = math.min(stopRatio * 4.0, 1.0)
    val punctScore = if (punctRatio > 0.3) 0.0 else 1.0 - punctRatio
    val wlScore = if (meanLen < 2.0 || meanLen > 12.0) 0.2 else 1.0
    val quality = BigDecimal((lenScore + stopScore + punctScore + wlScore) / 4.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var best = -1
    var bestHits = 0
    var p = 0
    while (p < langHits.length) {
      if (langHits(p) > bestHits) { bestHits = langHits(p); best = p }
      p += 1
    }
    val lang = if (best < 0) "und" else langProfiles(best)._1
    (nWords, punctRatio, stopRatio, meanLen, quality, lang, tokenEst)
  }
}

case class TextStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = TextStats.schema
  override def prettyName: String = "text_stats"

  override def nullSafeEval(input: Any): Any = {
    val (nWords, punctRatio, stopRatio, meanLen, quality, lang, tokenEst) =
      TextStats.compute(input.asInstanceOf[UTF8String].toString)
    new GenericInternalRow(Array[Any](nWords, punctRatio, stopRatio, meanLen,
      quality, UTF8String.fromString(lang), tokenEst))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
