package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for LLM-data-pipeline prep (SURVEY.md
  * §2.10). Everything here is built from `org.apache.spark.sql.functions`
  * primitives (codegen'd or native higher-order expressions) — no Python,
  * no serialization boundary — so the whole pipeline stays inside
  * whole-stage codegen / Tungsten at 100 TB.
  */
object TextFunctions {

  /** Whitespace token count. `split` on `\s+` after trim; empty string → 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish subword-token estimate: word chunks, digits, and punctuation
    * each count as a token (the GPT-2 pre-tokenizer regex family, reduced
    * to the RE2-safe subset Spark's codegen regexes support).
    */
  def tokenEstimate(text: Column): Column =
    size(regexp_extract_all(text,
      lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Distinct lower-cased word array — base for n-gram shingles. */
  def words(text: Column): Column =
    filter(split(lower(trim(text)), "[^a-z0-9]+"), w => length(w) > 0)

  /** Word n-gram shingles: sliding windows of `n` words joined by a space.
    * `sequence` + `transform` + `slice` — all native expressions.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val ws = words(text)
    // Empty/whitespace-only documents yield NO shingles (not [""]) so the
    // HOF path agrees with the fused NgramJaccardExpr / shingleHashes
    // (m == 0) behavior: Jaccard of two empty documents is 0.0 on both
    // APIs. A single partial shingle survives only for 0 < |words| < n.
    when(size(ws) === 0, array().cast("array<string>"))
      .otherwise(when(size(ws) < n, array(concat_ws(" ", ws)))
        .otherwise(transform(
          sequence(lit(0), size(ws) - n),
          i => concat_ws(" ", slice(ws, i + 1, lit(n))))))
  }

  /** Punctuation ratio: punctuation chars / total chars (0 for empty). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      size(regexp_extract_all(text, lit("[.,!?;:'\"()\\[\\]{}-]"), lit(0)))
        .cast("double") / length(text))

  private val stopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this")

  /** Fraction of tokens that are (English) stopwords — a cheap fluency
    * signal; near-zero for non-text or keyword-stuffed content.
    */
  def stopwordRatio(text: Column): Column = {
    val ws = words(text)
    when(size(ws) === 0, lit(0.0)).otherwise(
      size(filter(ws, w => w.isin(stopwords.map(lit(_)): _*)))
        .cast("double") / size(ws))
  }

  /** Mean word length — long-word outliers flag code/garbage documents. */
  def meanWordLen(text: Column): Column = {
    val ws = words(text)
    when(size(ws) === 0, lit(0.0)).otherwise(
      aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        size(ws))
  }

  /** Composite quality score in [0,1]: rewards sentence-like punctuation,
    * stopword presence, and plausible word lengths; penalizes extremes.
    * Heuristic in the C4/Gopher-rules family (published data-quality
    * filters), built entirely from native expressions.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    val punct = punctRatio(text)
    val punctScore = when(punct > 0.3, lit(0.0)).otherwise(lit(1.0) - punct)
    val wl = meanWordLen(text)
    val wlScore = when(wl < 2.0 || wl > 12.0, lit(0.2)).otherwise(lit(1.0))
    round((lenScore + stopScore + punctScore + wlScore) / 4.0, 6)
  }

  /** Fraction of word n-grams that are repeats of an earlier n-gram in
    * the same document (Gopher's "duplicate n-gram fraction" repetition
    * signal, Rae et al. 2021 §A1.1): 1 − distinct/total, 0 for empty.
    * In-row native expressions — no shuffle, scan-local at any scale.
    */
  def dupNgramFrac(text: Column, n: Int): Column = {
    val g = wordShingles(text, n)
    when(size(g) === 0, lit(0.0)).otherwise(
      (size(g) - size(array_distinct(g))).cast("double") / size(g))
  }

  /** PII scrub pass (training-data hygiene): mask email addresses and
    * phone-number-shaped digit runs with typed placeholder tokens. Both
    * patterns stay in the RE2-compatible subset so the DuckDB oracle can
    * run the identical regexes; Spark's regexp_replace is all-occurrence
    * by default (DuckDB needs the 'g' flag). Scan-local, codegen'd.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, "[a-z0-9._]+@[a-z0-9.-]+", "<EMAIL>"),
      "\\+?[0-9][0-9()\\- ]{6,}[0-9]", "<PHONE>")

  /** Content fingerprint: md5 of case/whitespace-normalized text. Exact-dup
    * key that survives trivial reformatting.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", words(text)))

  /** 64-bit rolling-hash document fingerprint (xxhash64 over normalized
    * words) — cheap join key for dedup candidate generation.
    */
  def fingerprint64(text: Column): Column =
    xxhash64(concat_ws(" ", words(text)))

  private val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "is", "of", "to", "in", "that", "it", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"),
    "es" -> Seq("el", "la", "los", "las", "es", "de", "que", "y", "en"),
    "fr" -> Seq("le", "la", "les", "est", "et", "des", "une", "que", "dans"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo", "zai", "you", "ren", "ta"))

  /** N-gram/stopword language-ID heuristic: score each language profile by
    * its stopword hit count; emit the argmax, or "und" (undetermined)
    * when nothing scores. Ties break to the alphabetically FIRST language
    * (a strict-greater fold over alphabetically ordered profiles — same
    * rule as the fused [[TextStats]] expression). Deterministic,
    * expression-only — at scale this is one projection, no shuffle.
    */
  def langId(text: Column): Column = {
    val ws = words(text)
    val scored = langProfiles.toSeq.sortBy(_._1).map { case (lang, sw) =>
      (lang, size(filter(ws, w => w.isin(sw.map(lit(_)): _*))))
    }
    val best = scored.foldLeft(struct(lit(0).as("hits"), lit("und").as("lang"))) {
      case (acc, (lang, hits)) =>
        when(hits > acc.getField("hits"),
          struct(hits.as("hits"), lit(lang).as("lang"))).otherwise(acc)
    }
    best.getField("lang")
  }
}
