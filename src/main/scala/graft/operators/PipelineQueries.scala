package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Probe queries for the LLM-data-pipeline surface (SURVEY.md §2.10):
  * text analysis, dedup, similarity search over the `documents` /
  * `embeddings` tables. Oracle SQL (DuckDB dialect) provided wherever the
  * semantics are SQL-expressible; sketch-based ops (MinHash, SimHash, ANN)
  * get rows-only checks here and exact golden tests in ScalaTest.
  */
object PipelineQueries {

  /** Scratch index directory for the lifecycle probes (s24/s27),
    * removed recursively at JVM shutdown — a full Bench run invokes
    * each probe several times and would otherwise strand dozens of
    * written indexes in /tmp (the StreamingQueries deleteOnExit
    * convention).
    */
  private val scratchDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  // ONE hook draining the shared list — a per-call hook would
  // accumulate a live Thread (holding its closure) for every probe
  // invocation across a full Bench run
  private lazy val scratchHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      scratchDirs.forEach(d => rm(new java.io.File(d)))
    }))

  /** Index scratch goes to tmpfs when available (r15, the
    * StreamingQueries scratchRoot rationale): the lifecycle probes
    * write/append/compact a 16-partition parquet index PER RUN — many
    * small fsync-ed files whose disk latency is probe overhead, not the
    * lifecycle work under test. Production indexes live on durable
    * storage; nothing here survives the JVM. SPARK_GRAFT_SCRATCH
    * overrides.
    */
  private val scratchRoot: java.nio.file.Path = {
    val pick = sys.env.get("SPARK_GRAFT_SCRATCH")
      .map(java.nio.file.Paths.get(_))
      .orElse {
        val shm = java.nio.file.Paths.get("/dev/shm")
        if (java.nio.file.Files.isDirectory(shm) &&
          java.nio.file.Files.isWritable(shm)) Some(shm)
        else None
      }
      .getOrElse(java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir")))
    java.nio.file.Files.createDirectories(pick)
    pick
  }

  private def tempIndexDir(prefix: String): String = {
    scratchHook
    val dir =
      java.nio.file.Files.createTempDirectory(scratchRoot, prefix).toString
    scratchDirs.add(dir)
    dir
  }

  def defs: Map[String, QueryDef] = Map(
    // ---- text analysis ----------------------------------------------------
    "t1_text_stats" -> QueryDef.sql(
      """SELECT lang, count(*) AS cnt, round(avg(n_chars), 4) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("cnt"), round(avg("n_chars"), 4).as("avg_chars"))
        .orderBy("lang")
    },

    // the CASE mirrors tokenCount's empty-string rule: DuckDB's
    // len(string_split_regex(trim(''), …)) is 1 (['']), Spark returns 0
    "t2_token_count" -> QueryDef.sql(
      """SELECT doc_id,
        |  CASE WHEN trim(text) = '' THEN 0
        |       ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id")
    },

    "t3_punct_ratio" -> QueryDef.sql(
      """SELECT doc_id,
        |  round(CAST(len(regexp_extract_all(text, '[.,!?;:''"()\[\]{}-]')) AS DOUBLE)
        |        / length(text), 6) AS punct_ratio
        |FROM documents WHERE length(text) > 0 ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"),
          round(TextFunctions.punctRatio(col("text")), 6).as("punct_ratio"))
        .orderBy("doc_id")
    },

    "t4_fingerprint" -> QueryDef.sql(
      """SELECT doc_id, md5(array_to_string(
        |    list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                x -> len(x) > 0), ' ')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    // quality + language ID + token estimate: fused single-pass native
    // expression (TextStatsExpr), every formula mirrored in DuckDB list
    // lambdas — same word split as t9, same stopword/profile sets, same
    // quality weights (TextStats.compute).
    "t5_quality_lang" -> QueryDef.sql(
      """WITH base AS (
        |  SELECT doc_id, length(text) AS len,
        |    list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                x -> x <> '') AS ws,
        |    len(regexp_extract_all(text, '[.,!?;:''"()\[\]{}-]')) AS punct,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+'))
        |       + len(regexp_extract_all(text, '[0-9]'))
        |       + len(regexp_extract_all(text, '[^A-Za-z0-9 \t\n\x0b\f\r]')) AS BIGINT) AS token_est
        |  FROM documents),
        |stats AS (
        |  SELECT doc_id, len, token_est, CAST(len(ws) AS BIGINT) AS n_words,
        |    CASE WHEN len(ws) = 0 THEN 0.0
        |         ELSE CAST(len(list_filter(ws, x -> list_contains(
        |           ['the','a','an','and','or','of','to','in','is','it','for','on','with','as','at','by','from','that','this'], x))) AS DOUBLE) / len(ws) END AS stop_ratio,
        |    CASE WHEN len = 0 THEN 0.0 ELSE CAST(punct AS DOUBLE) / len END AS punct_ratio,
        |    CASE WHEN len(ws) = 0 THEN 0.0
        |         ELSE CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE) / len(ws) END AS mean_wl,
        |    len(list_filter(ws, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','zu'], x))) AS de,
        |    len(list_filter(ws, x -> list_contains(['the','and','is','of','to','in','that','it','with'], x))) AS en,
        |    len(list_filter(ws, x -> list_contains(['el','la','los','las','es','de','que','y','en'], x))) AS es,
        |    len(list_filter(ws, x -> list_contains(['le','la','les','est','et','des','une','que','dans'], x))) AS fr,
        |    len(list_filter(ws, x -> list_contains(['de','shi','le','bu','wo','zai','you','ren','ta'], x))) AS zh
        |  FROM base)
        |SELECT doc_id,
        |  round((least(len / 500.0, 1.0) + least(stop_ratio * 4.0, 1.0)
        |       + CASE WHEN punct_ratio > 0.3 THEN 0.0 ELSE 1.0 - punct_ratio END
        |       + CASE WHEN mean_wl < 2.0 OR mean_wl > 12.0 THEN 0.2 ELSE 1.0 END) / 4.0, 6) AS quality,
        |  CASE WHEN greatest(de, en, es, fr, zh) = 0 THEN 'und'
        |       WHEN de = greatest(de, en, es, fr, zh) THEN 'de'
        |       WHEN en = greatest(de, en, es, fr, zh) THEN 'en'
        |       WHEN es = greatest(de, en, es, fr, zh) THEN 'es'
        |       WHEN fr = greatest(de, en, es, fr, zh) THEN 'fr'
        |       ELSE 'zh' END AS lang_pred,
        |  token_est, n_words, round(stop_ratio, 6) AS stopword_ratio
        |FROM stats ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.TextStats.textStats(col("text")).as("st"))
        .select(col("doc_id"), col("st.quality").as("quality"),
          col("st.lang_pred").as("lang_pred"),
          col("st.token_est").as("token_est"),
          col("st.n_words").as("n_words"),
          round(col("st.stopword_ratio"), 6).as("stopword_ratio"))
        .orderBy("doc_id")
    },

    // ---- training-data assembly -------------------------------------------
    // Sequence packing: assign documents to fixed-token-budget packs by
    // running-sum binning within each shard (source). The per-source
    // cumsum runs as a two-phase distributed prefix sum (see packTokens)
    // — the oracle's serial window is semantically identical.
    "t6_sequence_packing" -> QueryDef.sql(
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CASE WHEN trim(text) = '' THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT *, sum(n_tokens) OVER
        |    (PARTITION BY source ORDER BY doc_id) AS cum FROM t)
        |SELECT doc_id, source, n_tokens,
        |  CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS pack_id
        |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      // single source of truth: the same Scale.packTokens the shard
      // writer materializes with
      Scale.packTokens(Tables.documents(s, d), tokensPerShard = 512)
        .select(col("doc_id"), col("source"), col("n_tokens"), col("pack_id"))
        .orderBy("doc_id")
    },

    // Stratified sampling per language (training-mix control): the
    // deterministic md5 hash gate (Scale.hashStratifiedSample) — portable
    // across engines, so DuckDB computes the identical sample.
    "t7_stratified_sample" -> QueryDef.sql(
      """SELECT doc_id, lang FROM documents
        |WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#42'), 1, 8) AS UBIGINT) % 1000
        |      < CASE lang WHEN 'de' THEN 500 WHEN 'en' THEN 500
        |                  WHEN 'es' THEN 200 WHEN 'fr' THEN 200
        |                  WHEN 'zh' THEN 100 ELSE 0 END
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Scale.hashStratifiedSample(Tables.documents(s, d), "lang",
          Map("de" -> 0.5, "en" -> 0.5, "es" -> 0.2, "fr" -> 0.2, "zh" -> 0.1))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // d11's contract through the Bloom pre-filter (Dedup
    // .bloomIncrementalNew): definitively-new rows skip the anti join
    // entirely; might-contain candidates verify exactly. The oracle is
    // d11's NOT EXISTS, unchanged — equality proves no-false-negatives
    // and that bloom FPs die in the verify.
    "d15_bloom_incremental" -> QueryDef.sql(
      """SELECT n.doc_id FROM documents n
        |WHERE n.doc_id >= 400 AND NOT EXISTS (
        |  SELECT 1 FROM documents o
        |  WHERE o.doc_id < 400 AND md5(o.text) = md5(n.text))
        |ORDER BY n.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      Dedup.bloomIncrementalNew(
          docs.filter(col("doc_id") >= 400),
          docs.filter(col("doc_id") < 400),
          expectedItems = 1L << 16)
        .select("doc_id")
        .orderBy("doc_id")
    },

    // Per-ROW weighted Bernoulli gate (Scale.weightedSample): keep rate =
    // (n_chars % 1000)/1000 — varied, deterministic, and ×1000 lands
    // within an ulp of an integer so `round` can never face a .5 half
    // cross-engine. The oracle mirrors the gate AND the threshold tree.
    "t32_weighted_sample" -> QueryDef.sql(
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#42'), 1, 8)
        |        AS UBIGINT) % 1000
        |  < greatest(0, least(1000, CAST(round(
        |      CAST(n_chars % 1000 AS DOUBLE) / 1000.0::DOUBLE * 1000.0::DOUBLE)
        |      AS BIGINT)))
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Scale.weightedSample(Tables.documents(s, d),
          (col("n_chars") % 1000).cast("double") / lit(1000.0))
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    },

    // Exactly-k weighted sample WITHOUT replacement (A-Res exponential
    // races, Efraimidis & Spirakis 2006): key = ln(u)/w, top-k desc.
    // u = (13-hex-md5 + 0.5)/2^52 is EXACT IEEE double on both engines
    // (52-bit integer, half-spacing add, power-of-two divide); the
    // emitted columns are int-only, so the oracle is ulp-safe unless
    // two keys collide within ~2^-50 (not a realistic hazard).
    "t50_weighted_reservoir" -> QueryDef.sql(
      """SELECT doc_id, n_chars FROM (
        |  SELECT doc_id, n_chars FROM documents WHERE n_chars > 0
        |  ORDER BY ln((CAST('0x' || substring(md5('wres' || CAST(doc_id AS VARCHAR)), 1, 13)
        |                 AS UBIGINT)::DOUBLE + 0.5::DOUBLE) / 4503599627370496::DOUBLE)
        |           / CAST(n_chars AS DOUBLE) DESC, doc_id
        |  LIMIT 100)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Scale.weightedReservoir(Tables.documents(s, d), k = 100,
          weightCol = "n_chars")
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    },

    // per-source exact-k weighted draws (the training-budget shape):
    // the t50 A-Res key through topKPerGroup's salted two-stage window
    "t51_group_weighted_reservoir" -> QueryDef.sql(
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY
        |      ln((CAST('0x' || substring(md5('wres' || CAST(doc_id AS VARCHAR)), 1, 13)
        |            AS UBIGINT)::DOUBLE + 0.5::DOUBLE) / 4503599627370496::DOUBLE)
        |      / CAST(n_chars AS DOUBLE) DESC, doc_id) AS rn
        |  FROM documents WHERE n_chars > 0)
        |WHERE rn <= 10
        |ORDER BY source, doc_id""".stripMargin) { (s, d) =>
      Scale.weightedReservoirPerGroup(Tables.documents(s, d),
          groupCol = "source", k = 10, weightCol = "n_chars")
        .select("doc_id", "source", "n_chars")
        .orderBy("source", "doc_id")
    },

    // corpus vocabulary: explode → hash-agg → top-k. At 100 TB this is the
    // classic word-count shape: Generate (no shuffle) → partial agg on
    // every mapper → single narrow final agg → TakeOrdered.
    "t8_word_freq" -> QueryDef.sql(
      """SELECT w AS word, count(*) AS freq
        |FROM (SELECT unnest(string_split_regex(lower(trim(text)), '[^a-z0-9]+')) AS w
        |      FROM documents)
        |WHERE w <> '' GROUP BY w
        |ORDER BY freq DESC, word LIMIT 50""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(explode(TextFunctions.words(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("word"))
        .limit(50)
    },

    // language-ID heuristic, oracle-checked: per-language stopword hit
    // counts with argmax, ties to the alphabetically-first language, 'und'
    // when nothing scores — mirrored exactly in DuckDB list lambdas.
    "t9_lang_id" -> QueryDef.sql(
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                x -> x <> '') AS ws
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, len(ws) AS n_words,
        |    len(list_filter(ws, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','zu'], x))) AS de,
        |    len(list_filter(ws, x -> list_contains(['the','and','is','of','to','in','that','it','with'], x))) AS en,
        |    len(list_filter(ws, x -> list_contains(['el','la','los','las','es','de','que','y','en'], x))) AS es,
        |    len(list_filter(ws, x -> list_contains(['le','la','les','est','et','des','une','que','dans'], x))) AS fr,
        |    len(list_filter(ws, x -> list_contains(['de','shi','le','bu','wo','zai','you','ren','ta'], x))) AS zh
        |  FROM w)
        |SELECT doc_id, n_words,
        |  CASE WHEN greatest(de, en, es, fr, zh) = 0 THEN 'und'
        |       WHEN de = greatest(de, en, es, fr, zh) THEN 'de'
        |       WHEN en = greatest(de, en, es, fr, zh) THEN 'en'
        |       WHEN es = greatest(de, en, es, fr, zh) THEN 'es'
        |       WHEN fr = greatest(de, en, es, fr, zh) THEN 'fr'
        |       ELSE 'zh' END AS lang_pred
        |FROM h ORDER BY doc_id""".stripMargin) { (s, d) =>
      // fused TextStats expression, NOT the HOF langId: one imperative
      // pass per document (the HOF path measured 5.4 s vs 0.3 s at sf0.1)
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.TextStats.textStats(col("text")).as("st"))
        .select(col("doc_id"), col("st.n_words").cast("long").as("n_words"),
          col("st.lang_pred").as("lang_pred"))
        .orderBy("doc_id")
    },

    // Gopher-style repetition signals (Rae et al. 2021 §A1.1): duplicate
    // 3-gram fraction (in-row expression, scan-local) and top-bigram
    // fraction (explode → count → max/sum — distributed, partial-agg'd).
    // Both are bounded ratios → round 6 d.p. (CLAUDE.md oracle rules);
    // dividend/divisor are identical integers in both engines, so the
    // quotients are bit-identical.
    "t10_gopher_repetition" -> QueryDef.sql(
      """WITH ws AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                x -> x <> '') AS w
        |  FROM documents),
        |g3 AS (
        |  SELECT doc_id, CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
        |    WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |    ELSE list_transform(range(len(w) - 2),
        |           i -> array_to_string(list_slice(w, i + 1, i + 3), ' ')) END AS g
        |  FROM ws),
        |d3 AS (
        |  SELECT doc_id, CASE WHEN len(g) = 0 THEN 0.0
        |    ELSE CAST(len(g) - len(list_distinct(g)) AS DOUBLE) / len(g) END AS dup3
        |  FROM g3),
        |g2 AS (
        |  SELECT doc_id, CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
        |    WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
        |    ELSE list_transform(range(len(w) - 1),
        |           i -> array_to_string(list_slice(w, i + 1, i + 2), ' ')) END AS g
        |  FROM ws),
        |x2 AS (SELECT doc_id, unnest(g) AS t FROM g2),
        |c2 AS (SELECT doc_id, t, count(*) AS cnt FROM x2 GROUP BY 1, 2),
        |t2 AS (SELECT doc_id, max(cnt) AS topc, sum(cnt) AS tot FROM c2 GROUP BY 1)
        |SELECT d3.doc_id, round(d3.dup3, 6) AS dup3_frac,
        |  round(coalesce(CAST(t2.topc AS DOUBLE) / t2.tot, 0.0), 6) AS top2_frac
        |FROM d3 LEFT JOIN t2 USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      // fused RepetitionStats kernel, NOT the HOF/explode formulation:
      // the HOF path measured 38.8 s at sf0.1 vs sub-second fused (the
      // t9 lesson re-learned); both signals come out of ONE in-row pass.
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.RepetitionStats.repetitionStats(col("text")).as("st"))
        .select(col("doc_id"),
          round(col("st.dup3_frac"), 6).as("dup3_frac"),
          round(col("st.top2_frac"), 6).as("top2_frac"))
        .orderBy("doc_id")
    },

    // C4/Gopher RULE-based keep/drop filter (Raffel et al. 2020 §2.1;
    // Rae et al. 2021 §A1.1) — the boolean cousin of t5's soft score:
    // word-count bounds, mean-word-length bounds, stopword presence,
    // repetition cap. Every rule is a deterministic expression mirrored
    // exactly in DuckDB (identical dividends/divisors ⇒ identical
    // comparisons even at rule boundaries).
    "t11_c4_quality_filter" -> QueryDef.sql(
      """WITH ws AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                x -> x <> '') AS w
        |  FROM documents),
        |g3 AS (
        |  SELECT doc_id, CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
        |    WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |    ELSE list_transform(range(len(w) - 2),
        |           i -> array_to_string(list_slice(w, i + 1, i + 3), ' ')) END AS g
        |  FROM ws),
        |m AS (
        |  SELECT ws.doc_id, CAST(len(w) AS BIGINT) AS n_words,
        |    CASE WHEN len(w) = 0 THEN 0.0
        |      ELSE CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE) / len(w)
        |    END AS mwl,
        |    CASE WHEN len(w) = 0 THEN 0.0
        |      ELSE CAST(len(list_filter(w, x -> list_contains(
        |        ['the','a','an','and','or','of','to','in','is','it',
        |         'for','on','with','as','at','by','from','that','this'], x)))
        |        AS DOUBLE) / len(w) END AS stop_ratio,
        |    CASE WHEN len(g) = 0 THEN 0.0
        |      ELSE CAST(len(g) - len(list_distinct(g)) AS DOUBLE) / len(g)
        |    END AS dup3
        |  FROM ws JOIN g3 USING (doc_id))
        |SELECT doc_id, n_words,
        |  n_words >= 10 AND n_words <= 100000 AS r_len,
        |  mwl >= 2.0 AND mwl <= 12.0 AS r_wordlen,
        |  stop_ratio >= 0.02 AS r_stopword,
        |  dup3 < 0.5 AS r_repetition,
        |  (n_words >= 10 AND n_words <= 100000) AND (mwl >= 2.0 AND mwl <= 12.0)
        |    AND stop_ratio >= 0.02 AND dup3 < 0.5 AS keep
        |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
      // every rule input from the single fused pass (identical
      // dividends/divisors to the HOF twins ⇒ exact rule boundaries)
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.RepetitionStats.repetitionStats(col("text")).as("st"))
        .select(col("doc_id"), col("st.n_words").as("n_words"),
          (col("st.n_words") >= 10 && col("st.n_words") <= 100000).as("r_len"),
          (col("st.mean_word_len") >= 2.0 && col("st.mean_word_len") <= 12.0)
            .as("r_wordlen"),
          (col("st.stop_ratio") >= 0.02).as("r_stopword"),
          (col("st.dup3_frac") < 0.5).as("r_repetition"))
        .withColumn("keep",
          col("r_len") && col("r_wordlen") && col("r_stopword") && col("r_repetition"))
        .orderBy("doc_id")
    },

    // PII scrub pass: the synthetic docs carry no PII, so each doc is
    // AUGMENTED with a deterministic id-derived email + phone before
    // redaction — both engines build the identical augmented string and
    // run the identical RE2-subset regexes, so the masked output (and
    // the proof that masking actually fired) hash-matches.
    "t12_pii_redact" -> QueryDef.sql(
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(
        |    text || ' contact u' || CAST(doc_id AS VARCHAR) ||
        |      '@example.com or +1-555-01' || CAST(doc_id % 100 AS VARCHAR),
        |    '[a-z0-9._]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
        |    '\+?[0-9][0-9()\- ]{6,}[0-9]', '<PHONE>', 'g') AS redacted
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val aug = concat(col("text"),
        lit(" contact u"), col("doc_id").cast("string"),
        lit("@example.com or +1-555-01"), (col("doc_id") % 100).cast("string"))
      Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.redactPii(aug).as("redacted"))
        .orderBy("doc_id")
    },

    // Token-window chunking: long documents split into ≤64-token pieces
    // (the context-window precursor to packing) — scan-local slice +
    // explode, whitespace-normalized reconstruction on both engines.
    "t13_chunking" -> QueryDef.sql(
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'),
        |                x -> x <> '') AS ws
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, ws,
        |    unnest(range(CAST(ceil(len(ws) / 64.0) AS BIGINT))) AS chunk_idx
        |  FROM t WHERE len(ws) > 0)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  array_to_string(ws[chunk_idx*64+1 : chunk_idx*64+64], ' ') AS chunk_text,
        |  CAST(least(len(ws) - chunk_idx*64, 64) AS BIGINT) AS n_chunk_tokens
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
      Scale.chunkDocuments(Tables.documents(s, d), maxTokens = 64)
        .select("doc_id", "chunk_idx", "chunk_text", "n_chunk_tokens")
        .orderBy("doc_id", "chunk_idx")
    },

    // Overlapping sliding-window chunking (Scale.slidingChunks): window
    // 64, stride 48 ⇒ adjacent chunks share 16 tokens of retrieval
    // context; the last window is the first to reach the document end.
    "t36_sliding_chunks" -> QueryDef.sql(
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'),
        |                x -> x <> '') AS ws
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, ws,
        |    unnest(range(1 + CAST(ceil(greatest(len(ws) - 64, 0) / 48.0) AS BIGINT))) AS chunk_idx
        |  FROM t WHERE len(ws) > 0)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  array_to_string(ws[chunk_idx*48+1 : chunk_idx*48+64], ' ') AS chunk_text,
        |  CAST(least(len(ws) - chunk_idx*48, 64) AS BIGINT) AS n_chunk_tokens
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
      Scale.slidingChunks(Tables.documents(s, d), windowTokens = 64,
          strideTokens = 48)
        .select("doc_id", "chunk_idx", "chunk_text", "n_chunk_tokens")
        .orderBy("doc_id", "chunk_idx")
    },

    // Deterministic epoch shuffle: the reorder position each document
    // takes in training epoch 1 — an md5 key both engines compute
    // identically (no RNG). The probe ranks the operator's output with a
    // window (oracle formulation); the operator itself stays
    // range-partitioned + locally sorted.
    "t14_epoch_shuffle" -> QueryDef.sql(
      """SELECT doc_id, CAST(row_number() OVER (
        |    ORDER BY CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#ep1'), 1, 15) AS UBIGINT),
        |             doc_id) AS BIGINT) AS pos
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      Scale.epochShuffled(Tables.documents(s, d), epoch = 1)
        .withColumn("pos", row_number().over(
          Window.orderBy(col("__shuffle_key"), col("doc_id"))).cast("long"))
        .select("doc_id", "pos")
        .orderBy("doc_id")
    },

    // Per-document TF-IDF distinctive terms (Sparck Jones 1972), top-3
    // by tf·(N/df) — ratio idf, not log idf, so every score is a
    // quotient of integer-derived operands and bit-identical in DuckDB
    // (log idf is the same ranking through a monotone transform;
    // Relevance.tfIdfTopTerms(logScores = true) opts in).
    "t15_tfidf" -> QueryDef.sql(
      """WITH w AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                       x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
        |d AS (SELECT *, count(*) OVER (PARTITION BY term) AS df FROM tf),
        |n AS (SELECT count(*) AS n FROM documents),
        |s AS (SELECT doc_id, term, tf, df,
        |        CAST(tf * n AS DOUBLE) / df AS score FROM d, n),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY doc_id ORDER BY score DESC, term) AS rn FROM s)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
        |  CAST(df AS BIGINT) AS df, score
        |FROM r WHERE rn <= 3 ORDER BY doc_id, term""".stripMargin) { (s, d) =>
      Relevance.tfIdfTopTerms(Tables.documents(s, d), k = 3)
        .orderBy("doc_id", "term")
    },

    // Okapi BM25 (Robertson et al., TREC-3) against a fixed query-term
    // set, one row per (doc, matched term): per-term rows keep float
    // summation order out of the contract, and every arithmetic step is
    // parenthesized identically in the oracle, so the scores hash-match
    // unrounded (ratio idf; see Relevance's determinism note).
    "t16_bm25" -> QueryDef.sql(
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                x -> x <> '') AS ws
        |  FROM documents),
        |tok AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM w),
        |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM tok
        |       WHERE term IN ('data', 'table', 'row', 'spark')
        |       GROUP BY 1, 2, 3),
        |d AS (SELECT *, count(*) OVER (PARTITION BY term) AS df FROM tf),
        |st AS (SELECT count(*) AS n, sum(len(ws)) AS sumdl FROM w)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
        |  CAST(df AS BIGINT) AS df, CAST(dl AS BIGINT) AS dl,
        |  ((n - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE)) *
        |    ((tf * (1.2::DOUBLE + 1.0::DOUBLE)) /
        |     (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE + 0.75::DOUBLE *
        |        (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / n))))) AS score
        |FROM d, st ORDER BY doc_id, term""".stripMargin) { (s, d) =>
      Relevance.bm25PerTerm(Tables.documents(s, d),
          Seq("data", "table", "row", "spark"))
        .orderBy("doc_id", "term")
    },

    // hybrid retrieval: BM25 leg + cosine leg fused by reciprocal-rank
    // fusion (Cormack SIGIR'09) — the t16 × s1 serving composition. The
    // per-doc BM25 total is a term-ordered LEFT FOLD on both engines
    // (Spark aggregate ∘ sort_array ≡ DuckDB list_reduce ∘ ordered
    // list: identical operand order, bit-identical sums — so the
    // lexical leg ranks UNROUNDED; the cosine leg rounds to 6 d.p.,
    // the s1 discipline), id tiebreaks inside each top-100, and the
    // fused 1/(60+r) expression is the same two-term IEEE computation
    // on both sides.
    "t52_hybrid_rrf" -> QueryDef.sql(
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                x -> x <> '') AS ws
        |  FROM documents WHERE doc_id <> 0),
        |tok AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM w),
        |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM tok
        |       WHERE term IN ('data', 'table', 'row', 'spark')
        |       GROUP BY 1, 2, 3),
        |d AS (SELECT *, count(*) OVER (PARTITION BY term) AS df FROM tf),
        |st AS (SELECT count(*) AS n, sum(len(ws)) AS sumdl FROM w),
        |sc AS (SELECT doc_id, term,
        |  ((n - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE)) *
        |    ((tf * (1.2::DOUBLE + 1.0::DOUBLE)) /
        |     (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE + 0.75::DOUBLE *
        |        (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / n))))) AS score
        |  FROM d, st),
        |lex AS (SELECT doc_id,
        |          list_reduce(list(score ORDER BY term), (a, x) -> a + x)
        |            AS lex_score
        |        FROM sc GROUP BY doc_id),
        |lexr AS (SELECT doc_id, row_number() OVER (
        |           ORDER BY lex_score DESC, doc_id) AS lex_rank
        |         FROM lex QUALIFY lex_rank <= 100),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |semr AS (SELECT vec_id AS doc_id, row_number() OVER (
        |           ORDER BY round(list_cosine_similarity(v,
        |             (SELECT v FROM e WHERE vec_id = 0)), 6) DESC, vec_id)
        |             AS sem_rank
        |         FROM e WHERE vec_id <> 0 QUALIFY sem_rank <= 100)
        |SELECT doc_id,
        |  CAST(coalesce(l.lex_rank, 0) AS BIGINT) AS lex_rank,
        |  CAST(coalesce(s.sem_rank, 0) AS BIGINT) AS sem_rank,
        |  (coalesce(1.0::DOUBLE / (60 + l.lex_rank), 0.0::DOUBLE) +
        |   coalesce(1.0::DOUBLE / (60 + s.sem_rank), 0.0::DOUBLE)) AS rrf
        |FROM lexr l FULL OUTER JOIN semr s USING (doc_id)
        |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
      Relevance.hybridRrf(Tables.documents(s, d), Tables.embeddings(s, d),
        Seq("data", "table", "row", "spark"), queryVecId = 0L)
    },

    // retrieval-quality eval harness over a 10-query batch (label
    // relevance as proxy qrels): hits/precision/recall@10, MRR@10
    // (truncated at k — the `mrr_k` column name carries the cutoff), and
    // nEDCG@10 — nDCG under a dyadic 2^-(rank-1) discount, which makes
    // the DCG sum order-independent-exact and the normalized quotient
    // bit-identical cross-engine (the log2 discount is libm-dependent;
    // see Relevance.retrievalEval). Every other metric is one division
    // of small integers. Extends s11 (hits/recall/rr) with the RANKED
    // metrics a retrieval benchmark actually reports and the map-side
    // WindowGroupLimit top-k (plan-gated) — the full-pool recall
    // denominator here vs s11's min(k, pool) is deliberate: both
    // conventions exist in the literature, and each probe pins one.
    "t53_retrieval_eval" -> QueryDef.sql(
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         CAST(label AS BIGINT) AS lab
        |  FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv, lab AS qlab FROM e
        |      WHERE vec_id % 50 = 0 AND vec_id < 500),
        |lc AS (SELECT lab, count(*) AS lab_cnt FROM e GROUP BY lab),
        |qn AS (SELECT qid, qlab, qv, CAST(lab_cnt - 1 AS BIGINT) AS n_rel
        |       FROM q JOIN lc ON qlab = lc.lab),
        |scored AS (
        |  SELECT qn.qid, qn.n_rel, e.vec_id,
        |    CASE WHEN e.lab = qn.qlab THEN 1 ELSE 0 END AS rel,
        |    round(list_cosine_similarity(e.v, qn.qv), 6) AS sim
        |  FROM e, qn WHERE e.vec_id <> qn.qid),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY qid ORDER BY sim DESC, vec_id) AS rnk
        |  FROM scored QUALIFY rnk <= 10),
        |m AS (
        |  SELECT qid, n_rel, CAST(sum(rel) AS BIGINT) AS hits,
        |    coalesce(1.0::DOUBLE / min(CASE WHEN rel = 1 THEN rnk END),
        |             0.0::DOUBLE) AS mrr_k,
        |    sum(rel * (1.0::DOUBLE /
        |          CAST(1::BIGINT << (rnk - 1) AS DOUBLE))) AS dcg
        |  FROM ranked GROUP BY qid, n_rel)
        |SELECT qid, n_rel, hits,
        |  CAST(hits AS DOUBLE) / 10 AS precision_k,
        |  CASE WHEN n_rel = 0 THEN 0.0::DOUBLE
        |       ELSE CAST(hits AS DOUBLE) / n_rel END AS recall_k,
        |  mrr_k,
        |  CASE WHEN n_rel = 0 THEN 0.0::DOUBLE ELSE
        |    dcg / (2.0::DOUBLE - 1.0::DOUBLE /
        |      CAST(1::BIGINT << (least(n_rel, 10) - 1) AS DOUBLE)) END AS nedcg
        |FROM m ORDER BY qid""".stripMargin) { (s, d) =>
      Relevance.retrievalEval(Tables.embeddings(s, d),
        col("vec_id") % 50 === 0 && col("vec_id") < 500, k = 10)
    },

    // Temperature-based source rebalancing (Conneau & Lample 2019 mix
    // rule, α = 0.5): keep-rate per source = √(count/count_max), applied
    // through the md5 permille gate. floor(√ratio·1000) is bit-identical
    // cross-engine (correctly-rounded sqrt), so DuckDB derives the SAME
    // thresholds from the data and computes the identical sample.
    "t17_temperature_mix" -> QueryDef.sql(
      """WITH c AS (SELECT source, count(*) AS c FROM documents GROUP BY source),
        |m AS (SELECT max(c) AS cmax FROM c),
        |thr AS (SELECT source,
        |          floor(sqrt(CAST(c AS DOUBLE) / cmax) * 1000) AS thr
        |        FROM c, m)
        |SELECT d.doc_id, d.source FROM documents d JOIN thr USING (source)
        |WHERE CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || '#42'), 1, 8) AS UBIGINT) % 1000 < thr
        |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      Scale.temperatureSample(Tables.documents(s, d), "source")
        .select("doc_id", "source")
        .orderBy("doc_id")
    },

    // Deterministic fixed-size holdout per language (frozen eval sets):
    // the 20 lowest md5-ranked docs per lang. The operator runs the
    // salted two-stage top-k (no single-task strata); the oracle is the
    // direct window formulation — identical result by construction.
    "t18_fixed_holdout" -> QueryDef.sql(
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#ho42'), 1, 15) AS UBIGINT),
        |             doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY doc_id""".stripMargin) { (s, d) =>
      Scale.fixedHoldout(Tables.documents(s, d), "lang", nPerStratum = 20)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // Deterministic train/val/test assignment: split is a pure function
    // of (doc_id, seed) through the md5 permille gate — leak-free across
    // runs, engine-portable, and scan-local (no shuffle, no RNG).
    "t19_split_assign" -> QueryDef.sql(
      """SELECT doc_id,
        |  CASE WHEN g < 980 THEN 'train' WHEN g < 990 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#42'), 1, 8) AS UBIGINT) % 1000 AS g
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Scale.assignSplit(Tables.documents(s, d))
        .select("doc_id", "split")
        .orderBy("doc_id")
    },

    // Leakage-FREE train/val/test split: t19's md5 permille gate keyed
    // by the near-dup CLUSTER representative instead of the doc id, so
    // every member of a duplicate cluster lands in the SAME split —
    // the group-aware splitting discipline that keeps eval honest
    // (splitting near-dups across train/test leaks the answer). The
    // pipeline composes d7's oracle-checked clustering with t19's
    // engine-portable gate; singletons key by their own id, making
    // this a strict generalization of t19.
    "t49_cluster_safe_split" -> QueryDef.sql(
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(ws) = 0 THEN CAST([] AS VARCHAR[])
        |         WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |         ELSE list_transform(range(len(ws) - 2),
        |                i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) END) AS g
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                      x -> x <> '') AS ws
        |        FROM documents)),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE len(a.g) > 0 AND len(b.g) > 0
        |    AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |        / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.3),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  WITH RECURSIVE r(id, lab) AS (
        |    SELECT a, a FROM edges
        |    UNION
        |    SELECT e.a, r.lab FROM edges e JOIN r ON e.b = r.id)
        |  SELECT id, min(lab) AS cluster_id FROM r GROUP BY id),
        |lab AS (
        |  SELECT d.doc_id,
        |         CAST(coalesce(reach.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
        |  FROM documents d LEFT JOIN reach ON reach.id = d.doc_id)
        |SELECT doc_id, cluster_id,
        |  CASE WHEN g < 980 THEN 'train' WHEN g < 990 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id, cluster_id,
        |        CAST('0x' || substring(md5(CAST(cluster_id AS VARCHAR) || '#42'), 1, 8) AS UBIGINT) % 1000 AS g
        |      FROM lab)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val clustered = Dedup.nearDupClustersExact(
          Tables.documents(s, d), threshold = 0.3)
        .withColumn("cluster_id", col("cluster_id").cast("long"))
      Scale.assignSplit(clustered, idCol = "cluster_id")
        .select(col("doc_id"), col("cluster_id"), col("split"))
        .orderBy("doc_id")
    },

    // t49's 100 TB-SHAPED twin: the SAME cluster-keyed split gate over
    // banded-LSH candidates + exact Jaccard verify instead of the exact
    // all-pairs prefix join. At τ = 0.3 the exact prefix filter
    // degrades (t49 is the slowest non-streaming bench row for exactly
    // that reason); the banded candidate join is the plan that survives
    // 100 TB, at the standard LSH recall cost (a missed edge can split
    // a true cluster across splits — the documented dial).
    // ORACLE-CHECKED since r15 via the d3/d5 engine-portable md5
    // MinHash family: the DuckDB twin re-derives banding → exact
    // verify → connected components (WITH RECURSIVE, the d7 recipe) →
    // the md5 split gate end to end. The xxhash-seeded clustering
    // (Dedup.nearDupClusters) keeps its DedupSpec refinement +
    // co-cluster-recall gates against the exact path.
    "t55_cluster_safe_split_lsh" -> QueryDef.sql(
      """WITH ws AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                x -> x <> '') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |         ELSE list_transform(range(len(w) - 2),
        |                i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]) END AS g
        |  FROM ws WHERE len(w) > 0),
        |hp AS (
        |  SELECT j,
        |    ('0x' || substring(md5('mh_a#' || j::VARCHAR), 1, 8))::UBIGINT::BIGINT
        |      % 2147483646 + 1 AS a,
        |    ('0x' || substring(md5('mh_b#' || j::VARCHAR), 1, 8))::UBIGINT::BIGINT
        |      % 4294967311 AS b
        |  FROM (SELECT unnest(range(64)) AS j)),
        |mh AS (
        |  SELECT t.doc_id, hp.j,
        |    min(((hp.a * ('0x' || substring(md5(t.t), 1, 8))::UBIGINT::BIGINT)
        |         % 4294967311 + hp.b) % 4294967311) AS v
        |  FROM (SELECT doc_id, unnest(g) AS t FROM sh) t, hp
        |  GROUP BY t.doc_id, hp.j),
        |sg AS (SELECT doc_id, list(v ORDER BY j) AS sig FROM mh GROUP BY doc_id),
        |bd AS (
        |  SELECT doc_id, bb.b,
        |    array_to_string(sig[bb.b*4 + 1 : bb.b*4 + 4], ',') AS h
        |  FROM sg, (SELECT unnest(range(16)) AS b) bb),
        |cand AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
        |    FROM bd a JOIN bd c ON a.b = c.b AND a.h = c.h
        |                        AND a.doc_id < c.doc_id) p
        |  JOIN sg sa ON sa.doc_id = p.id_a
        |  JOIN sg sb ON sb.doc_id = p.id_b
        |  WHERE CAST(len(list_filter(range(64),
        |      i -> sa.sig[i+1] = sb.sig[i+1])) AS DOUBLE) / 64
        |    >= 0.18::DOUBLE),
        |shd AS (SELECT doc_id, list_distinct(g) AS g FROM sh),
        |pairs AS (
        |  SELECT cand.id_a, cand.id_b
        |  FROM cand
        |  JOIN shd a ON a.doc_id = cand.id_a
        |  JOIN shd b ON b.doc_id = cand.id_b
        |  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |        / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))
        |      >= 0.3::DOUBLE),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  WITH RECURSIVE r(id, lab) AS (
        |    SELECT a, a FROM edges
        |    UNION
        |    SELECT e.a, r.lab FROM edges e JOIN r ON e.b = r.id)
        |  SELECT id, min(lab) AS cluster_id FROM r GROUP BY id),
        |lab AS (
        |  SELECT d.doc_id,
        |         CAST(coalesce(reach.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
        |  FROM documents d LEFT JOIN reach ON reach.id = d.doc_id)
        |SELECT doc_id, cluster_id,
        |  CASE WHEN g < 980 THEN 'train' WHEN g < 990 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id, cluster_id,
        |        CAST('0x' || substring(md5(CAST(cluster_id AS VARCHAR) || '#42'), 1, 8) AS UBIGINT) % 1000 AS g
        |      FROM lab)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val clustered = Dedup.nearDupClustersPortable(
          Tables.documents(s, d), threshold = 0.3)
        .withColumn("cluster_id", col("cluster_id").cast("long"))
      Scale.assignSplit(clustered, idCol = "cluster_id")
        .select(col("doc_id"), col("cluster_id"), col("split"))
        .orderBy("doc_id")
    },

    // Per-source rank normalization: the two-phase distributed rank
    // (groupPercentRank), oracled by the naive per-source window. The
    // pct quotient divides identical integers on both engines —
    // bit-identical, emitted unrounded
    "t28_pct_rank" -> QueryDef.sql(
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CASE WHEN trim(text) = '' THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
        |    row_number() OVER (PARTITION BY source ORDER BY n_tokens, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM t)
        |SELECT doc_id, source, n_tokens,
        |  CASE WHEN n = 1 THEN 0.0::DOUBLE
        |       ELSE CAST(rk - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE) END AS pct_rank
        |FROM r ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).withColumn("n_tokens",
        TextFunctions.tokenCount(col("text")))
      Scale.groupPercentRank(docs, "source", "n_tokens", "doc_id")
        .select(col("doc_id"), col("source"), col("n_tokens"), col("pct_rank"))
        .orderBy("doc_id")
    },

    // Z-order layout key: the Morton interleave itself is engine-portable
    // integer bit math (the oracle spells out the same 20 shift terms);
    // the LAYOUT payoff (fewer files under a 2-D box filter) is proven in
    // PartitioningSpec against a single-dim-sorted write
    "t29_zorder" -> QueryDef.sql {
      val terms = (0 until 10).map(i =>
        s"(((dim_a >> $i) & 1) << ${2 * i}) + (((dim_b >> $i) & 1) << ${2 * i + 1})")
        .mkString("\n|    + ")
      s"""WITH t AS (
        |  SELECT event_id, user_id % 1024 AS dim_a,
        |    CAST(floor(abs(value)) AS BIGINT) % 1024 AS dim_b
        |  FROM events)
        |SELECT event_id, dim_a, dim_b,
        |  CAST($terms AS BIGINT) AS z
        |FROM t ORDER BY event_id""".stripMargin
    } { (s, d) =>
      val e = Tables.events(s, d)
      val a = col("user_id") % 1024L
      val b = floor(abs(col("value"))).cast("long") % 1024L
      e.select(col("event_id"), a.as("dim_a"), b.as("dim_b"),
          Scale.zValue(a, b, bits = 10).as("z"))
        .orderBy("event_id")
    },

    // Token-budget curation (Scale.budgetSelect): per source, keep the
    // longest-first (n_chars DESC, doc_id ASC) prefix of documents whose
    // running token total stays within 800 — "top docs until B tokens",
    // the selection every training-mix spec bottoms out in. The running
    // total is the packTokens two-phase distributed prefix sum with the
    // slice cut on the ORDER VALUE (descending); the oracle is the
    // serial per-source window, so equality proves the distributed
    // cumsum bit-exact in selection order.
    "t35_token_budget_select" -> QueryDef.sql(
      """WITH t AS (
        |  SELECT doc_id, source, n_chars,
        |    CASE WHEN trim(text) = '' THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM t)
        |SELECT doc_id, source, n_tokens, cum_tokens
        |FROM c WHERE cum_tokens <= 800
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Scale.budgetSelect(Tables.documents(s, d), budgetTokens = 800)
        .select(col("doc_id"), col("source"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("cum_tokens").cast("long").as("cum_tokens"))
        .orderBy("doc_id")
    },

    // Exact-size uniform draw: 5 docs per source by the md5 pseudo-random
    // total order (Scale.groupSample) — the eval-set sampler. DuckDB
    // ranks by the identical md5 key, proving the salted two-stage
    // top-k picks exactly the same rows.
    "t37_group_sample" -> QueryDef.sql(
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || '#gs42'), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 5 ORDER BY doc_id""".stripMargin) { (s, d) =>
      Scale.groupSample(Tables.documents(s, d), "source", k = 5)
        .select("doc_id", "source")
        .orderBy("doc_id")
    },

    // Curriculum ordering (Scale.curriculumOrder): 4 difficulty bands
    // by global n_chars percent rank (easy → hard), intra-band order by
    // the md5 epoch key. pct is the bit-identical (rk−1)/(n−1) integer
    // quotient on both engines, so floor(pct·4) bands match exactly.
    "t38_curriculum" -> QueryDef.sql(
      """WITH r AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY n_chars, doc_id) AS rk,
        |    count(*) OVER () AS n
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(least(floor(CAST(rk - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE)
        |    * 4), 3) AS BIGINT) AS band,
        |  md5(CAST(doc_id AS VARCHAR) || '#cu1') AS ord_key
        |FROM r ORDER BY band, ord_key, doc_id""".stripMargin) { (s, d) =>
      Scale.curriculumOrder(Tables.documents(s, d), bands = 4)
        .select("doc_id", "band", "ord_key")
        .orderBy("band", "ord_key", "doc_id")
    },

    // Quality-ranked curation: keep the top-3 docs per source by the t5
    // composite quality score (ties to the lowest doc_id). Runs the
    // salted two-stage top-k; the oracle recomputes the same quality
    // formula (already hash-proven by t5) and ranks directly.
    "t20_best_per_source" -> QueryDef.sql(
      """WITH base AS (
        |  SELECT doc_id, source, length(text) AS len,
        |    list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                x -> x <> '') AS ws,
        |    len(regexp_extract_all(text, '[.,!?;:''"()\[\]{}-]')) AS punct
        |  FROM documents),
        |stats AS (
        |  SELECT doc_id, source, len,
        |    CASE WHEN len(ws) = 0 THEN 0.0
        |         ELSE CAST(len(list_filter(ws, x -> list_contains(
        |           ['the','a','an','and','or','of','to','in','is','it','for','on','with','as','at','by','from','that','this'], x))) AS DOUBLE) / len(ws) END AS stop_ratio,
        |    CASE WHEN len = 0 THEN 0.0 ELSE CAST(punct AS DOUBLE) / len END AS punct_ratio,
        |    CASE WHEN len(ws) = 0 THEN 0.0
        |         ELSE CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE) / len(ws) END AS mean_wl
        |  FROM base),
        |q AS (
        |  SELECT doc_id, source,
        |    round((least(len / 500.0, 1.0) + least(stop_ratio * 4.0, 1.0)
        |         + CASE WHEN punct_ratio > 0.3 THEN 0.0 ELSE 1.0 - punct_ratio END
        |         + CASE WHEN mean_wl < 2.0 OR mean_wl > 12.0 THEN 0.2 ELSE 1.0 END) / 4.0, 6) AS quality
        |  FROM stats)
        |SELECT doc_id, source, quality FROM (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |      ORDER BY quality DESC, doc_id) AS rn FROM q)
        |WHERE rn <= 3 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          graft.functions.TextStats.textStats(col("text"))
            .getField("quality").as("quality"))
      Scale.topKPerGroup(scored, "source",
          Seq(col("quality").desc, col("doc_id")), k = 3,
          saltOn = col("doc_id"))
        .select("doc_id", "source", "quality")
        .orderBy("doc_id")
    },

    // ---- dedup ------------------------------------------------------------
    "d1_dedup_exact" -> QueryDef.sql(
      """SELECT count(*) AS n_total, count(DISTINCT text) AS n_unique
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .agg(count(lit(1)).as("n_total"), countDistinct(col("text")).as("n_unique"))
    },

    "d2_dedup_hash" -> QueryDef.sql(
      """SELECT md5(text) AS h, count(*) AS cnt FROM documents
        |GROUP BY md5(text) ORDER BY h""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("h")
    },

    // MinHash+LSH near-dup pairs. ORACLE-CHECKED since r15 via the
    // ENGINE-PORTABLE md5 affine hash family (MinHashPortableExpr):
    // the DuckDB twin re-derives shingles, the 64 (a_j, b_j) parameters
    // (md5 of the hash index — no seed table), per-(doc, j) MIN
    // signatures, comma-joined band keys, the banded self-join and the
    // agreement estimate (an exact multiple of 1/64) from the same
    // table — the full banding pipeline hash-gated end to end. The
    // xxhash-SEEDED family (Dedup.minhashNearDups) keeps its golden
    // recall-vs-exact S-curve gates in DedupSpec untouched.
    "d3_minhash_neardup" -> QueryDef.sql(
      """WITH ws AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                x -> x <> '') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |         ELSE list_transform(range(len(w) - 2),
        |                i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]) END AS g
        |  FROM ws WHERE len(w) > 0),
        |hp AS (
        |  SELECT j,
        |    ('0x' || substring(md5('mh_a#' || j::VARCHAR), 1, 8))::UBIGINT::BIGINT
        |      % 2147483646 + 1 AS a,
        |    ('0x' || substring(md5('mh_b#' || j::VARCHAR), 1, 8))::UBIGINT::BIGINT
        |      % 4294967311 AS b
        |  FROM (SELECT unnest(range(64)) AS j)),
        |mh AS (
        |  SELECT t.doc_id, hp.j,
        |    min(((hp.a * ('0x' || substring(md5(t.t), 1, 8))::UBIGINT::BIGINT)
        |         % 4294967311 + hp.b) % 4294967311) AS v
        |  FROM (SELECT doc_id, unnest(g) AS t FROM sh) t, hp
        |  GROUP BY t.doc_id, hp.j),
        |sg AS (SELECT doc_id, list(v ORDER BY j) AS sig FROM mh GROUP BY doc_id),
        |bd AS (
        |  SELECT doc_id, bb.b,
        |    array_to_string(sig[bb.b*4 + 1 : bb.b*4 + 4], ',') AS h
        |  FROM sg, (SELECT unnest(range(16)) AS b) bb),
        |cp AS (
        |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
        |  FROM bd a JOIN bd c ON a.b = c.b AND a.h = c.h
        |                      AND a.doc_id < c.doc_id)
        |SELECT cp.id_a, cp.id_b,
        |  round(CAST(len(list_filter(range(64),
        |    i -> sa.sig[i+1] = sb.sig[i+1])) AS DOUBLE) / 64, 6) AS est_jaccard
        |FROM cp
        |JOIN sg sa ON sa.doc_id = cp.id_a
        |JOIN sg sb ON sb.doc_id = cp.id_b
        |WHERE CAST(len(list_filter(range(64),
        |    i -> sa.sig[i+1] = sb.sig[i+1])) AS DOUBLE) / 64 >= 0.3::DOUBLE
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      Dedup.minhashNearDupsPortable(Tables.documents(s, d), threshold = 0.3)
        .orderBy("id_a", "id_b")
    },

    // SimHash near-dup pairs within hamming ≤ 7. ORACLE-CHECKED since
    // r15 via the ENGINE-PORTABLE md5 bit votes (SimHashPortableExpr,
    // two 32-bit halves so every op stays in exact BIGINT range on
    // both engines): the twin re-derives token hashes (md5 hex chars
    // 1–8 / 9–16), integer bit votes, the two signature halves, the
    // 8-block pigeonhole keys, and the xor-popcount hamming — the
    // pigeonhole-blocking recall guarantee checked as hash equality.
    // The xxhash-seeded Dedup.simhashNearDups keeps its spec gates.
    "d4_simhash_neardup" -> QueryDef.sql(
      """WITH ws AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                x -> x <> '') AS w
        |  FROM documents),
        |th AS (
        |  SELECT doc_id,
        |    ('0x' || substring(md5(t.t), 1, 8))::UBIGINT::BIGINT AS h1,
        |    ('0x' || substring(md5(t.t), 9, 8))::UBIGINT::BIGINT AS h2
        |  FROM (SELECT doc_id, unnest(w) AS t FROM ws WHERE len(w) > 0) t),
        |bv AS (
        |  SELECT doc_id, bb.b,
        |    sum(CASE WHEN ((h1 >> bb.b) & 1) = 1 THEN 1 ELSE -1 END) AS v1,
        |    sum(CASE WHEN ((h2 >> bb.b) & 1) = 1 THEN 1 ELSE -1 END) AS v2
        |  FROM th, (SELECT unnest(range(32)) AS b) bb
        |  GROUP BY doc_id, bb.b),
        |sg AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN v1 > 0 THEN (1::BIGINT << b) ELSE 0 END)
        |         AS BIGINT) AS s1,
        |    CAST(sum(CASE WHEN v2 > 0 THEN (1::BIGINT << b) ELSE 0 END)
        |         AS BIGINT) AS s2
        |  FROM bv GROUP BY doc_id),
        |bd AS (
        |  SELECT doc_id, s1, s2, bb.i,
        |    CASE WHEN bb.i < 4 THEN (s1 >> CAST(bb.i * 8 AS INTEGER)) & 255
        |         ELSE (s2 >> CAST((bb.i - 4) * 8 AS INTEGER)) & 255 END AS v
        |  FROM sg, (SELECT unnest(range(8)) AS i) bb)
        |SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
        |  CAST(bit_count(xor(a.s1, c.s1)) + bit_count(xor(a.s2, c.s2))
        |       AS BIGINT) AS hamming
        |FROM bd a JOIN bd c ON a.i = c.i AND a.v = c.v
        |                    AND a.doc_id < c.doc_id
        |WHERE bit_count(xor(a.s1, c.s1)) + bit_count(xor(a.s2, c.s2)) <= 7
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      Dedup.simhashNearDupsPortable(Tables.documents(s, d), maxHamming = 7)
        .orderBy("id_a", "id_b")
    },

    // two-phase verified near-dup: portable-MinHash banded candidates
    // at the relaxed 0.6·t threshold, exact 3-gram Jaccard verify at
    // t = 0.4 (cut on the UNROUNDED quotient — the d9 discipline).
    // ORACLE-CHECKED since r15: the twin runs the d3 candidate
    // pipeline at the relaxed cut, then the d9 string-set Jaccard on
    // the survivors — equality is simultaneously the FP-rejection
    // proof for the hashed verify kernel and the recall proof for the
    // banding at this operating point. The seeded variant
    // (Dedup.verifiedNearDups) keeps its spec gates.
    "d5_verified_neardup" -> QueryDef.sql(
      """WITH ws AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                x -> x <> '') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |         ELSE list_transform(range(len(w) - 2),
        |                i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]) END AS g
        |  FROM ws WHERE len(w) > 0),
        |hp AS (
        |  SELECT j,
        |    ('0x' || substring(md5('mh_a#' || j::VARCHAR), 1, 8))::UBIGINT::BIGINT
        |      % 2147483646 + 1 AS a,
        |    ('0x' || substring(md5('mh_b#' || j::VARCHAR), 1, 8))::UBIGINT::BIGINT
        |      % 4294967311 AS b
        |  FROM (SELECT unnest(range(64)) AS j)),
        |mh AS (
        |  SELECT t.doc_id, hp.j,
        |    min(((hp.a * ('0x' || substring(md5(t.t), 1, 8))::UBIGINT::BIGINT)
        |         % 4294967311 + hp.b) % 4294967311) AS v
        |  FROM (SELECT doc_id, unnest(g) AS t FROM sh) t, hp
        |  GROUP BY t.doc_id, hp.j),
        |sg AS (SELECT doc_id, list(v ORDER BY j) AS sig FROM mh GROUP BY doc_id),
        |bd AS (
        |  SELECT doc_id, bb.b,
        |    array_to_string(sig[bb.b*4 + 1 : bb.b*4 + 4], ',') AS h
        |  FROM sg, (SELECT unnest(range(16)) AS b) bb),
        |cp AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
        |    FROM bd a JOIN bd c ON a.b = c.b AND a.h = c.h
        |                        AND a.doc_id < c.doc_id) p
        |  JOIN sg sa ON sa.doc_id = p.id_a
        |  JOIN sg sb ON sb.doc_id = p.id_b
        |  WHERE CAST(len(list_filter(range(64),
        |      i -> sa.sig[i+1] = sb.sig[i+1])) AS DOUBLE) / 64
        |    >= 0.24::DOUBLE),
        |shd AS (SELECT doc_id, list_distinct(g) AS g FROM sh)
        |SELECT cp.id_a, cp.id_b,
        |  round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |        / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))),
        |        6) AS jaccard
        |FROM cp
        |JOIN shd a ON a.doc_id = cp.id_a
        |JOIN shd b ON b.doc_id = cp.id_b
        |WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |      / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))
        |    >= 0.4::DOUBLE
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      Dedup.verifiedNearDupsPortable(Tables.documents(s, d), threshold = 0.4)
        .orderBy("id_a", "id_b")
    },

    // incremental dedup: a recrawl delta (overlapping the corpus AND
    // carrying internal re-fetch copies) deduped against the frozen
    // corpus in O(|delta|) — the continuous-ingestion shape. The delta
    // is derived via the engine-portable md5 permille gate on the text,
    // so both engines build the byte-identical batch.
    "d18_delta_dedup" -> QueryDef.sql(
      """WITH g AS (
        |  SELECT doc_id, text, source,
        |    ('0x' || substring(md5(text), 1, 8))::UBIGINT % 1000 AS u
        |  FROM documents),
        |corpus AS (SELECT * FROM g WHERE u < 500),
        |delta AS (
        |  SELECT doc_id, text, source FROM g WHERE u >= 350
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text, source FROM g
        |  WHERE u BETWEEN 600 AND 699),
        |keep AS (
        |  SELECT min(doc_id) AS doc_id FROM delta
        |  WHERE md5(text) NOT IN (SELECT md5(text) FROM corpus)
        |  GROUP BY md5(text))
        |SELECT d.doc_id, d.source FROM delta d JOIN keep USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      def u = conv(substring(md5(col("text")), 1, 8), 16, 10)
        .cast("long") % 1000
      val corpus = docs.filter(u < 500)
      val delta = docs.filter(u >= 350)
        .select(col("doc_id"), col("text"), col("source"))
        .unionAll(docs.filter(u.between(600, 699))
          // 1e6-class shift (the d20/d21/mm8 convention): re-fetch copy
          // ids must clear any realistic scale factor's doc_id range —
          // a collision would change pair semantics identically on both
          // engines, so the oracle could never catch it
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
            col("source")))
      Dedup.deltaExact(corpus, delta)
        .select("doc_id", "source").orderBy("doc_id")
    },

    // incremental NEAR-dup ingest: a recrawl delta paired against the
    // frozen corpus postings index in O(|delta|) — d18's exact-digest
    // step upgraded to 3-gram Jaccard ≥ 0.4 (Dedup.deltaJaccardPairs:
    // frozen-df Bayardo prefixes, probe join + delta triangle). Corpus =
    // id-gate low 50%, delta = the [350, 650) mid-band re-ingested under
    // fresh ids, so (corpus, delta) J = 1 re-fetch pairs, natural
    // near-dups straddling the gate, and delta-internal pairs all
    // populate. Oracle: quadratic union Jaccard restricted to
    // delta-touching pairs (the d9 oracle + the touch filter).
    "d20_delta_jaccard_pairs" -> QueryDef.sql(
      """WITH g AS (
        |  SELECT doc_id, text,
        |    ('0x' || substring(md5(doc_id::VARCHAR || '#djp'), 1, 8))::UBIGINT
        |      % 1000 AS u
        |  FROM documents),
        |un AS (
        |  SELECT doc_id, text FROM g WHERE u < 500
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM g
        |  WHERE u >= 350 AND u < 650),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(ws) = 0 THEN CAST([] AS VARCHAR[])
        |         WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |         ELSE list_transform(range(len(ws) - 2),
        |                i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) END) AS g
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                      x -> x <> '') AS ws
        |        FROM un))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |        / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))), 6) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE (a.doc_id >= 1000000 OR b.doc_id >= 1000000)
        |  AND len(a.g) > 0 AND len(b.g) > 0
        |  AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |      / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      def u = conv(substring(
          md5(concat(col("doc_id").cast("string"), lit("#djp"))), 1, 8),
        16, 10).cast("long") % 1000
      val corpus = docs.filter(u < 500).select("doc_id", "text")
      val delta = docs.filter(u >= 350 && u < 650)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      Dedup.deltaJaccardPairs(corpus, delta, threshold = 0.4)
        .orderBy("id_a", "id_b")
    },

    // the COMPLETE clean-ingest round (Dedup.ingestRound): exact dedup
    // vs corpus + within batch, near-dup pairing against the frozen
    // postings, direct corpus-adjacency drop, min-id rep per
    // within-batch near-dup cluster. Delta = the d18-style recrawl
    // shape under FRESH ids (+1M re-ingest overlapping the corpus, +2M
    // internal re-fetch copies); every step is engine-deterministic so
    // the whole round oracles as d18's keep ∘ d9's quadratic pairs ∘
    // d7's recursive-CTE components.
    "d21_ingest_round" -> QueryDef.sql(
      """WITH g AS (
        |  SELECT doc_id, text,
        |    ('0x' || substring(md5(doc_id::VARCHAR || '#djp'), 1, 8))::UBIGINT
        |      % 1000 AS u
        |  FROM documents),
        |corpus AS (SELECT doc_id, text FROM g WHERE u < 500),
        |delta AS (
        |  SELECT doc_id + 1000000 AS doc_id, text FROM g
        |  WHERE u >= 350 AND u < 650
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id, text FROM g
        |  WHERE u >= 600 AND u < 700),
        |surv AS (
        |  SELECT min(doc_id) AS doc_id FROM delta
        |  WHERE md5(text) NOT IN (SELECT md5(text) FROM corpus)
        |  GROUP BY md5(text)),
        |sd AS (SELECT d.doc_id, d.text FROM delta d JOIN surv USING (doc_id)),
        |un AS (SELECT * FROM corpus UNION ALL SELECT * FROM sd),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(ws) = 0 THEN CAST([] AS VARCHAR[])
        |         WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |         ELSE list_transform(range(len(ws) - 2),
        |                i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) END) AS g
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                      x -> x <> '') AS ws
        |        FROM un)),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE (a.doc_id >= 1000000 OR b.doc_id >= 1000000)
        |    AND len(a.g) > 0 AND len(b.g) > 0
        |    AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |        / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.4),
        |adj AS (
        |  SELECT DISTINCT CASE WHEN id_a >= 1000000 THEN id_a ELSE id_b END
        |    AS doc_id
        |  FROM pairs WHERE (id_a < 1000000) <> (id_b < 1000000)),
        |rem AS (SELECT doc_id FROM sd
        |        WHERE doc_id NOT IN (SELECT doc_id FROM adj)),
        |dd AS (
        |  SELECT id_a, id_b FROM pairs
        |  WHERE id_a IN (SELECT doc_id FROM rem)
        |    AND id_b IN (SELECT doc_id FROM rem)),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM dd
        |  UNION SELECT id_b, id_a FROM dd),
        |reach AS (
        |  WITH RECURSIVE r(id, lab) AS (
        |    SELECT a, a FROM edges
        |    UNION
        |    SELECT e.a, r.lab FROM edges e JOIN r ON e.b = r.id)
        |  SELECT id, min(lab) AS cluster_id FROM r GROUP BY id)
        |SELECT doc_id FROM rem
        |WHERE NOT EXISTS (SELECT 1 FROM reach
        |                  WHERE reach.id = rem.doc_id
        |                    AND reach.cluster_id < rem.doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      def u = conv(substring(
          md5(concat(col("doc_id").cast("string"), lit("#djp"))), 1, 8),
        16, 10).cast("long") % 1000
      val corpus = docs.filter(u < 500).select("doc_id", "text")
      val delta = docs.filter(u >= 350 && u < 650)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        .unionAll(docs.filter(u >= 600 && u < 700)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
      Dedup.ingestRound(corpus, delta, threshold = 0.4)
        .select("doc_id").orderBy("doc_id")
    },

    // ---- similarity search -------------------------------------------------
    "s1_cosine_topk" -> QueryDef.sql(
      """SELECT vec_id, round(list_cosine_similarity(
        |    CAST(embedding AS DOUBLE[]),
        |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS sim
        |FROM embeddings WHERE vec_id <> 0
        |ORDER BY sim DESC, vec_id LIMIT 20""".stripMargin) { (s, d) =>
      Similarity.topKCosine(Tables.embeddings(s, d), queryId = 0L, k = 20)
    },

    // filtered vector search: metadata predicate BEFORE the distance
    // compute (scan-pushed), exact within the filtered set
    "s10_filtered_topk" -> QueryDef.sql(
      """SELECT vec_id, CAST(label AS BIGINT) AS label,
        |  round(list_cosine_similarity(
        |    CAST(embedding AS DOUBLE[]),
        |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS sim
        |FROM embeddings WHERE vec_id <> 0 AND label = 2
        |ORDER BY sim DESC, vec_id LIMIT 15""".stripMargin) { (s, d) =>
      Similarity.topKCosineFiltered(Tables.embeddings(s, d), queryId = 0L,
        k = 15, candidatePred = col("label") === 2)
    },

    "s2_embed_neardup" -> QueryDef.sql(
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])), 6) AS sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 200 AND b.vec_id < 200
        |  AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      Similarity.nearDupPairs(Tables.embeddings(s, d), idCap = 200L, threshold = 0.3)
    },

    // SemDeDup end-to-end (Similarity.semanticDedup): embedding
    // near-dup pairs → connected components → keep the min-id
    // representative per cluster (+ all singletons), with cluster
    // population. Oracle: DuckDB quadratic cosine pairs + WITH
    // RECURSIVE reachability (the s2 + d7 patterns composed).
    "s12_semantic_dedup" -> QueryDef.sql(
      """WITH e AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |         CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id < 200),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.3),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  WITH RECURSIVE r(id, lab) AS (
        |    SELECT a, a FROM edges
        |    UNION
        |    SELECT e2.a, r.lab FROM edges e2 JOIN r ON e2.b = r.id)
        |  SELECT id, min(lab) AS cluster_id FROM r GROUP BY id),
        |lab AS (
        |  SELECT e.vec_id, e.label,
        |         coalesce(reach.cluster_id, e.vec_id) AS cluster_id
        |  FROM e LEFT JOIN reach ON reach.id = e.vec_id),
        |sz AS (SELECT cluster_id, count(*) AS n FROM lab GROUP BY cluster_id)
        |SELECT lab.vec_id, lab.label, CAST(sz.n AS BIGINT) AS n_members
        |FROM lab JOIN sz USING (cluster_id)
        |WHERE lab.vec_id = lab.cluster_id
        |ORDER BY vec_id""".stripMargin) { (s, d) =>
      Similarity.semanticDedup(Tables.embeddings(s, d), threshold = 0.3,
          idCap = 200L)
        .orderBy("vec_id")
    },

    // single-table multi-probe ANN (query bucket + Hamming-1
    // neighbors). ORACLE-CHECKED since r15 via DATA-DEFINED
    // hyperplanes (plane p = exact difference of vectors 2p and 2p+1)
    // and the 6-d.p. rounded sign rule: the DuckDB twin re-derives the
    // 8 planes, every bucket, the xor-probe set and the exact cosine
    // ranking from the same table. The seeded-Gaussian geometry
    // (Similarity.topKCosineApprox) keeps its golden gates in spec.
    "s3_ann_topk" -> QueryDef.sql(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |pl AS (
        |  SELECT pp.p,
        |    list_transform(range(len(a.v)), j -> a.v[j+1] - b.v[j+1]) AS pv
        |  FROM (SELECT unnest(range(8)) AS p) pp
        |  JOIN e a ON a.vec_id = 2 * pp.p
        |  JOIN e b ON b.vec_id = 2 * pp.p + 1),
        |bits AS (
        |  SELECT e.vec_id, pl.p,
        |    CASE WHEN round(list_sum(list_transform(range(len(e.v)),
        |      j -> e.v[j+1] * pl.pv[j+1])), 6) > 0.0::DOUBLE
        |         THEN 1 ELSE 0 END AS bit
        |  FROM e, pl),
        |bk AS (
        |  SELECT vec_id, CAST(sum(bit << CAST(p AS INTEGER)) AS BIGINT) AS bkt
        |  FROM bits GROUP BY vec_id),
        |q AS (SELECT e.v AS qv, bk.bkt AS qb
        |      FROM e JOIN bk USING (vec_id) WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_cosine_similarity(e.v, q.qv), 6) + 0.0::DOUBLE AS sim
        |FROM e JOIN bk USING (vec_id) CROSS JOIN q
        |WHERE e.vec_id <> 0
        |  AND xor(bk.bkt, q.qb) IN (0, 1, 2, 4, 8, 16, 32, 64, 128)
        |ORDER BY sim DESC, vec_id LIMIT 20""".stripMargin) { (s, d) =>
      Similarity.topKCosineApproxDataDefined(Tables.embeddings(s, d),
        queryId = 0L, k = 20, nBits = 8)
    },

    // the named scale path for s2: multi-table sign-LSH candidates +
    // exact cosine verify (output ⊆ the s2 exact pairs — the verify is
    // exact; LSH only bounds recall). ORACLE-CHECKED since r15 via
    // DATA-DEFINED hyperplanes (12 planes = differences of the 24
    // lowest-id vectors, rounded sign rule), so the DuckDB twin
    // re-derives planes → 6 tables × 2-bit buckets → banded candidates
    // → exact verify end to end — the full pipeline hash-gated, where
    // the seeded probe could only golden-gate recall. nTables = 6 is
    // recommendedTables(0.25, 0.9, nBits = 2), frozen as a literal so
    // the twin's plane count is explicit. The seeded-Gaussian family
    // (Similarity.nearDupPairsBucketed) keeps its S-curve recall gates
    // in SimilarityAsOfSpec.
    "s6_embed_neardup_bucketed" -> QueryDef.sql(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id < 200),
        |pl AS (
        |  SELECT pp.p,
        |    list_transform(range(len(a.v)), j -> a.v[j+1] - b.v[j+1]) AS pv
        |  FROM (SELECT unnest(range(12)) AS p) pp
        |  JOIN e a ON a.vec_id = 2 * pp.p
        |  JOIN e b ON b.vec_id = 2 * pp.p + 1),
        |bits AS (
        |  SELECT e.vec_id, pl.p,
        |    CASE WHEN round(list_sum(list_transform(range(len(e.v)),
        |      j -> e.v[j+1] * pl.pv[j+1])), 6) > 0.0::DOUBLE
        |         THEN 1 ELSE 0 END AS bit
        |  FROM e, pl),
        |bk AS (
        |  SELECT vec_id, p // 2 AS t,
        |    CAST(sum(bit << CAST(p % 2 AS INTEGER)) AS BIGINT) AS bkt
        |  FROM bits GROUP BY vec_id, p // 2),
        |cp AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM bk a JOIN bk b ON a.t = b.t AND a.bkt = b.bkt
        |                      AND a.vec_id < b.vec_id)
        |SELECT cp.id_a, cp.id_b,
        |  round(list_cosine_similarity(ea.v, eb.v), 6) + 0.0::DOUBLE AS sim
        |FROM cp
        |JOIN e ea ON ea.vec_id = cp.id_a
        |JOIN e eb ON eb.vec_id = cp.id_b
        |WHERE round(list_cosine_similarity(ea.v, eb.v), 6) + 0.0::DOUBLE
        |      >= 0.25::DOUBLE
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      Similarity.nearDupPairsBucketedDataDefined(Tables.embeddings(s, d),
        threshold = 0.25, nBits = 2, nTables = 6, idCap = Some(200L))
    },

    // s6's incremental-ingest round (the embedding leg of the d18/d20
    // delta family): corpus = vec_id < 150, delta = [150, 200)
    // re-ingested under fresh ids, paired against the frozen postings
    // in O(|delta|). ORACLE-CHECKED since r15: the geometry is frozen
    // by the CORPUS (data-defined planes from its 24 lowest ids), so
    // the DuckDB twin computes all delta-touching pairs of the union
    // under the same buckets — the `delta round ≡ full run restricted
    // to delta-touching pairs` identity is now a hash equality, not
    // just the spec gate (which stays, on the seeded variant).
    "s30_embed_neardup_delta" -> QueryDef.sql(
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |              FROM embeddings),
        |c AS (SELECT vec_id, v FROM base WHERE vec_id < 150),
        |dl AS (SELECT vec_id + 1000000 AS vec_id, v FROM base
        |       WHERE vec_id >= 150 AND vec_id < 200),
        |u AS (SELECT * FROM c UNION ALL SELECT * FROM dl),
        |pl AS (
        |  SELECT pp.p,
        |    list_transform(range(len(a.v)), j -> a.v[j+1] - b.v[j+1]) AS pv
        |  FROM (SELECT unnest(range(12)) AS p) pp
        |  JOIN c a ON a.vec_id = 2 * pp.p
        |  JOIN c b ON b.vec_id = 2 * pp.p + 1),
        |bits AS (
        |  SELECT u.vec_id, pl.p,
        |    CASE WHEN round(list_sum(list_transform(range(len(u.v)),
        |      j -> u.v[j+1] * pl.pv[j+1])), 6) > 0.0::DOUBLE
        |         THEN 1 ELSE 0 END AS bit
        |  FROM u, pl),
        |bk AS (
        |  SELECT vec_id, p // 2 AS t,
        |    CAST(sum(bit << CAST(p % 2 AS INTEGER)) AS BIGINT) AS bkt
        |  FROM bits GROUP BY vec_id, p // 2),
        |cp AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM bk a JOIN bk b ON a.t = b.t AND a.bkt = b.bkt
        |                      AND a.vec_id < b.vec_id
        |  WHERE b.vec_id >= 1000000)
        |SELECT cp.id_a, cp.id_b,
        |  round(list_cosine_similarity(ua.v, ub.v), 6) + 0.0::DOUBLE AS sim
        |FROM cp
        |JOIN u ua ON ua.vec_id = cp.id_a
        |JOIN u ub ON ub.vec_id = cp.id_b
        |WHERE round(list_cosine_similarity(ua.v, ub.v), 6) + 0.0::DOUBLE
        |      >= 0.25::DOUBLE
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.nearDupPairsBucketedDeltaDataDefined(
        emb.filter(col("vec_id") < 150),
        emb.filter(col("vec_id") >= 150 && col("vec_id") < 200)
          .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")),
        threshold = 0.25, nBits = 2, nTables = 6)
    },

    // IVF-Flat top-k. ORACLE-CHECKED since r14 with DATA-DEFINED
    // centroids (the s22/s35 recipe): rounded-argmin assignment and
    // probe ranking are relational, the probed-list scan is an exact
    // 6-d.p. cosine rank — DuckDB reproduces the whole read path. The
    // TRAINED-centroid IVF path keeps its golden gates in
    // SimilarityAsOfSpec (deterministic centroids, candidate-scan
    // shrinkage, recall floor) and its persisted partition-prune gates
    // in PartitioningSpec — untouched (roundTo default -1).
    "s4_ivf_topk" -> QueryDef.sql(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |pl AS (
        |  SELECT cid FROM (
        |    SELECT c.cid, round(list_sum(list_transform(range(len(c.cv)),
        |      i -> (c.cv[i+1] - q.qv[i+1]) * (c.cv[i+1] - q.qv[i+1]))), 6)
        |      AS d2
        |    FROM cent c, q)
        |  QUALIFY row_number() OVER (ORDER BY d2, cid) <= 4),
        |asg AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT e.vec_id, e.v, c.cid,
        |      round(list_sum(list_transform(range(len(e.v)),
        |        i -> (e.v[i+1] - c.cv[i+1]) * (e.v[i+1] - c.cv[i+1]))), 6)
        |        AS d2
        |    FROM e, cent c)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |                             ORDER BY d2, cid) = 1)
        |SELECT a.vec_id,
        |  round(list_cosine_similarity(a.v, (SELECT qv FROM q)), 6)
        |    + 0.0::DOUBLE AS sim
        |FROM asg a JOIN pl ON pl.cid = a.cid
        |WHERE a.vec_id <> 0
        |ORDER BY sim DESC, vec_id LIMIT 20""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val (cents, _) =
        Similarity.dataDefinedQuantizers(emb, nCents = 16, m = 8)
      Similarity.topKCosineIVF(emb, queryId = 0L, k = 20, cents,
          nProbe = 4, roundTo = 6)
        .select(col("vec_id"), (col("sim") + lit(0.0)).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
    },

    // product quantization (the memory-bound billion-scale ANN form):
    // ADC code scan + exact cosine rerank. ORACLE-CHECKED since r15 via
    // the data-defined-quantizer recipe (s35 minus the coarse stage):
    // block codebooks are slices of the 16 lowest-id vectors, per-block
    // code distances / LUT entries / the ADC total all round 6 d.p.
    // before their argmin/cut (ties to the lowest id), the rerank is
    // the exact 6-d.p. cosine — DuckDB reproduces encode → ADC → cut →
    // rerank from the same table. Raw vectors (the s33 rule). The
    // TRAINED-codebook path (l2Normalized + IndexCache.pqCodebooksNorm
    // + pqTopK) keeps its golden gates in SimilarityAsOfSpec untouched:
    // candidate-coverage identity + the rerank*k ≥ N exact-scan
    // degeneracy.
    "s19_pq_topk" -> QueryDef.sql(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |code AS (
        |  SELECT vec_id, j, cid AS c FROM (
        |    SELECT p.vec_id, jj.j, c.cid,
        |      round(list_sum(list_transform(range(8),
        |        i -> (p.v[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1])
        |           * (p.v[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1]))), 6)
        |        AS bd
        |    FROM (SELECT vec_id, v FROM e WHERE vec_id <> 0) p,
        |         (SELECT unnest(range(8)) AS j) jj, cent c)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, j
        |                             ORDER BY bd, cid) = 1),
        |lut AS (
        |  SELECT jj.j, c.cid,
        |    round(list_sum(list_transform(range(8),
        |      i -> (q.qv[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1])
        |         * (q.qv[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1]))), 6)
        |      AS ld
        |  FROM (SELECT unnest(range(8)) AS j) jj, cent c, q),
        |a AS (
        |  SELECT code.vec_id, round(sum(l.ld), 6) AS adist
        |  FROM code JOIN lut l ON l.j = code.j AND l.cid = code.c
        |  GROUP BY code.vec_id),
        |cand AS (SELECT vec_id FROM a
        |         QUALIFY row_number() OVER (ORDER BY adist, vec_id) <= 80)
        |SELECT e.vec_id,
        |  round(list_cosine_similarity(e.v, (SELECT qv FROM q)), 6)
        |    + 0.0::DOUBLE AS sim
        |FROM cand JOIN e USING (vec_id)
        |ORDER BY sim DESC, vec_id LIMIT 20""".stripMargin) { (s, d) =>
      Similarity.pqTopKDataDefined(Tables.embeddings(s, d), queryId = 0L,
          k = 20, nCents = 16, m = 8, rerank = 4)
        .select(col("vec_id"), (col("sim") + lit(0.0)).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
    },

    // IVFADC — s4's coarse-quantizer prune composed with s19's ADC code
    // scan (the faiss billion-scale default): the scan reads
    // ≈ nProbe/nLists of the corpus as m-byte codes, never raw vectors.
    // ORACLE-CHECKED since r15 via the s35 data-defined-quantizer
    // recipe at a SECOND operating point (query 2, nProbe 6, k 15,
    // rerank 6 — s35 pins query 0 / nProbe 4 / k 20 / rerank 4), so
    // the composition is hash-gated at two points of its
    // probe-vs-recall surface. The TRAINED-quantizer path (l2Normalized
    // + IndexCache.annQuantizers + ivfAdcTopK) keeps its golden gates
    // in SimilarityAsOfSpec untouched: two-stage coverage identity
    // (measured hits = exact ∩ probed-list ADC candidates) and the
    // nProbe=nLists ∧ rerank·k≥N exact-scan degeneracy.
    "s20_ivfadc_topk" -> QueryDef.sql(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 2),
        |pl AS (
        |  SELECT cid FROM (
        |    SELECT c.cid, round(list_sum(list_transform(range(len(c.cv)),
        |      i -> (c.cv[i+1] - q.qv[i+1]) * (c.cv[i+1] - q.qv[i+1]))), 6)
        |      AS d2
        |    FROM cent c, q)
        |  QUALIFY row_number() OVER (ORDER BY d2, cid) <= 6),
        |asg AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT e.vec_id, e.v, c.cid,
        |      round(list_sum(list_transform(range(len(e.v)),
        |        i -> (e.v[i+1] - c.cv[i+1]) * (e.v[i+1] - c.cv[i+1]))), 6)
        |        AS d2
        |    FROM e, cent c)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |                             ORDER BY d2, cid) = 1),
        |probed AS (
        |  SELECT a.vec_id, a.v FROM asg a JOIN pl USING (cid)
        |  WHERE a.vec_id <> 2),
        |code AS (
        |  SELECT vec_id, j, cid AS c FROM (
        |    SELECT p.vec_id, jj.j, c.cid,
        |      round(list_sum(list_transform(range(8),
        |        i -> (p.v[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1])
        |           * (p.v[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1]))), 6)
        |        AS bd
        |    FROM probed p, (SELECT unnest(range(8)) AS j) jj, cent c)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, j
        |                             ORDER BY bd, cid) = 1),
        |lut AS (
        |  SELECT jj.j, c.cid,
        |    round(list_sum(list_transform(range(8),
        |      i -> (q.qv[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1])
        |         * (q.qv[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1]))), 6)
        |      AS ld
        |  FROM (SELECT unnest(range(8)) AS j) jj, cent c, q),
        |a AS (
        |  SELECT code.vec_id, round(sum(l.ld), 6) AS adist
        |  FROM code JOIN lut l ON l.j = code.j AND l.cid = code.c
        |  GROUP BY code.vec_id),
        |cand AS (SELECT vec_id FROM a
        |         QUALIFY row_number() OVER (ORDER BY adist, vec_id) <= 90)
        |SELECT e.vec_id,
        |  round(list_cosine_similarity(e.v, (SELECT qv FROM q)), 6)
        |    + 0.0::DOUBLE AS sim
        |FROM cand JOIN e USING (vec_id)
        |ORDER BY sim DESC, vec_id LIMIT 15""".stripMargin) { (s, d) =>
      Similarity.ivfAdcTopKDataDefined(Tables.embeddings(s, d),
          queryId = 2L, k = 15, nCents = 16, m = 8, nProbe = 6, rerank = 6)
        .select(col("vec_id"), (col("sim") + lit(0.0)).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
    },

    // 8-bit SCALAR quantization top-k (faiss SQ8 — the other standard
    // codec beside PQ/OPQ: d bytes a vector, per-dim affine levels, no
    // trained codebooks): approximate L2 over in-row DECODED codes,
    // exact cosine rerank. ORACLE-CHECKED since r15 via the s33
    // data-defined-bounds recipe at a SECOND operating point (query 3,
    // k 10, rerank 8 — s33 pins query 0 / k 20 / rerank 4), so the
    // codec path is hash-gated at two points of its candidate-budget
    // surface. The SAMPLE-TRAINED-bounds path (l2Normalized +
    // IndexCache.sqBounds + sqTopK) keeps its golden gates in
    // SimilarityAsOfSpec untouched: candidate-coverage identity,
    // rerank*k>=N exact-scan degeneracy, half-level reconstruction
    // bound, and the codec ladder position.
    "s31_sq8_topk" -> QueryDef.sql(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |b AS (
        |  SELECT i, min(v[i+1]) AS mn, max(v[i+1]) AS mx
        |  FROM e, (SELECT unnest(range((SELECT max(len(v)) FROM e))) AS i)
        |  GROUP BY i),
        |bm AS (SELECT
        |    list(mn ORDER BY i) AS mins,
        |    list(CASE WHEN mx > mn THEN 255.0::DOUBLE / (mx - mn)
        |              ELSE 0.0::DOUBLE END ORDER BY i) AS scales,
        |    list(CASE WHEN mx > mn THEN (mx - mn) / 255.0::DOUBLE
        |              ELSE 0.0::DOUBLE END ORDER BY i) AS steps
        |  FROM b),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 3),
        |c AS (
        |  SELECT e.vec_id, e.v,
        |    list_transform(range(len(e.v)), i ->
        |      CAST(least(greatest(floor(
        |        (e.v[i+1] - bm.mins[i+1]) * bm.scales[i+1] + 0.5::DOUBLE),
        |        0.0::DOUBLE), 255.0::DOUBLE) AS INTEGER)) AS code
        |  FROM e, bm WHERE e.vec_id <> 3),
        |a AS (
        |  SELECT c.vec_id, c.v,
        |    round(list_sum(list_transform(range(len(c.code)), i ->
        |      (bm.mins[i+1] + c.code[i+1] * bm.steps[i+1] - q.qv[i+1])
        |      * (bm.mins[i+1] + c.code[i+1] * bm.steps[i+1] - q.qv[i+1]))),
        |      6) AS adist
        |  FROM c, bm, q),
        |cand AS (SELECT vec_id, v FROM a
        |         QUALIFY row_number() OVER (ORDER BY adist, vec_id) <= 80)
        |SELECT vec_id,
        |  round(list_cosine_similarity(v, (SELECT qv FROM q)), 6)
        |    + 0.0::DOUBLE AS sim
        |FROM cand ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val (mins, maxs) = Similarity.sqBoundsExact(emb)
      Similarity.sqTopK(emb, queryId = 3L, k = 10, mins, maxs, rerank = 8,
          roundAdistTo = 6)
        .select(col("vec_id"), (col("sim") + lit(0.0)).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
    },

    // SQ8 with DATA-DEFINED bounds — the rare ANN probe with real SQL
    // ground truth (the s22 data-defined-quantizer trick, codec form):
    // exact per-dim min/max are relational, the floor(u+0.5) level is
    // the same double op on both engines, decode is literal affine
    // arithmetic, the decoded-L2 ranks on its 6-d.p. round (id ties),
    // and the exact rerank is the s1 cosine discipline — so DuckDB
    // reproduces bounds → codes → ADC rank → rerank END TO END and the
    // hash gate covers the entire codec path, not a golden proxy.
    // NOTE the deliberate deviation from sqTopK's "pass l2Normalized
    // inputs" guidance: cross-engine normalization is NOT
    // bit-reproducible (the norm is an unrounded fold), so the oracle
    // form runs on RAW vectors — the candidate cut is norm-biased
    // relative to the cosine rerank, which the oracle mirrors exactly;
    // the metric-matched production path stays s31's golden probe.
    "s33_sq8_exact_topk" -> QueryDef.sql(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |b AS (
        |  SELECT i, min(v[i+1]) AS mn, max(v[i+1]) AS mx
        |  FROM e, (SELECT unnest(range((SELECT max(len(v)) FROM e))) AS i)
        |  GROUP BY i),
        |bm AS (SELECT
        |    list(mn ORDER BY i) AS mins,
        |    list(CASE WHEN mx > mn THEN 255.0::DOUBLE / (mx - mn)
        |              ELSE 0.0::DOUBLE END ORDER BY i) AS scales,
        |    list(CASE WHEN mx > mn THEN (mx - mn) / 255.0::DOUBLE
        |              ELSE 0.0::DOUBLE END ORDER BY i) AS steps
        |  FROM b),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |c AS (
        |  SELECT e.vec_id, e.v,
        |    list_transform(range(len(e.v)), i ->
        |      CAST(least(greatest(floor(
        |        (e.v[i+1] - bm.mins[i+1]) * bm.scales[i+1] + 0.5::DOUBLE),
        |        0.0::DOUBLE), 255.0::DOUBLE) AS INTEGER)) AS code
        |  FROM e, bm WHERE e.vec_id <> 0),
        |a AS (
        |  SELECT c.vec_id, c.v,
        |    round(list_sum(list_transform(range(len(c.code)), i ->
        |      (bm.mins[i+1] + c.code[i+1] * bm.steps[i+1] - q.qv[i+1])
        |      * (bm.mins[i+1] + c.code[i+1] * bm.steps[i+1] - q.qv[i+1]))),
        |      6) AS adist
        |  FROM c, bm, q),
        |cand AS (SELECT vec_id, v FROM a
        |         QUALIFY row_number() OVER (ORDER BY adist, vec_id) <= 80)
        |SELECT vec_id,
        |  round(list_cosine_similarity(v, (SELECT qv FROM q)), 6)
        |    + 0.0::DOUBLE AS sim
        |FROM cand ORDER BY sim DESC, vec_id LIMIT 20""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val (mins, maxs) = Similarity.sqBoundsExact(emb)
      Similarity.sqTopK(emb, queryId = 0L, k = 20, mins, maxs, rerank = 4,
          roundAdistTo = 6)
        .select(col("vec_id"), (col("sim") + lit(0.0)).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
    },

    // Matryoshka truncated-dimension retrieval (MRL, Kusupati et al.
    // NeurIPS'22): cheap cosine over a dimension PREFIX, exact full-dim
    // rerank — the adaptive-retrieval read path (prefix bytes only in
    // the first pass). ORACLE-CHECKED since r15 via the s34 recipe at a
    // SECOND operating point on the MRL accuracy ladder (query 5,
    // dPrefix 32, rerank 2 — s34 pins query 0 / dPrefix 16 / rerank 4),
    // so the prefix-cut machinery is hash-gated at two truncation
    // budgets. The NORMALIZED path (l2Normalized + matryoshkaTopK)
    // keeps its golden gates in SimilarityAsOfSpec untouched:
    // prefix-candidate coverage identity against a driver-side
    // recompute, the dPrefix = dim ∧ rerank·k ≥ N exact degeneracy,
    // and the measured recall floor.
    "s32_matryoshka_topk" -> QueryDef.sql(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 5),
        |cand AS (
        |  SELECT vec_id, v FROM (
        |    SELECT e.vec_id, e.v,
        |      CASE WHEN list_sum(list_transform(e.v[1:32], x -> x * x)) = 0
        |             OR list_sum(list_transform(q.qv[1:32], x -> x * x)) = 0
        |           THEN 0.0::DOUBLE
        |           ELSE round(list_cosine_similarity(e.v[1:32], q.qv[1:32]), 6)
        |             + 0.0::DOUBLE END AS psim
        |    FROM e, q WHERE e.vec_id <> 5)
        |  QUALIFY row_number() OVER (ORDER BY psim DESC, vec_id) <= 40)
        |SELECT vec_id,
        |  round(list_cosine_similarity(v, (SELECT qv FROM q)), 6)
        |    + 0.0::DOUBLE AS sim
        |FROM cand ORDER BY sim DESC, vec_id LIMIT 20""".stripMargin) { (s, d) =>
      Similarity.matryoshkaTopK(Tables.embeddings(s, d), queryId = 5L,
          k = 20, dPrefix = 32, rerank = 2)
        .select(col("vec_id"), (col("sim") + lit(0.0)).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
    },

    // ORACLE-checked IVFADC — the full faiss-default composition with
    // DATA-DEFINED quantizers (coarse centroids = the 16 lowest-id
    // vectors; block-j codebook = their j-th 8-dim slices), so EVERY
    // stage is relational: coarse assignment (rounded argmin, lowest
    // ties), the query's 4-list probe ranking, per-block codes, the
    // m × ksub ADC tables, the rounded ADC total, the 80-candidate cut
    // and the exact cosine rerank — all reproduced by DuckDB from the
    // same table and hash-gated end to end. The trained-quantizer
    // probes (s19–s29) keep their golden identities; this pins the
    // COMPOSITION itself against SQL ground truth.
    "s35_ivfadc_exact_topk" -> QueryDef.sql(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |pl AS (
        |  SELECT cid FROM (
        |    SELECT c.cid, round(list_sum(list_transform(range(len(c.cv)),
        |      i -> (c.cv[i+1] - q.qv[i+1]) * (c.cv[i+1] - q.qv[i+1]))), 6)
        |      AS d2
        |    FROM cent c, q)
        |  QUALIFY row_number() OVER (ORDER BY d2, cid) <= 4),
        |asg AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT e.vec_id, e.v, c.cid,
        |      round(list_sum(list_transform(range(len(e.v)),
        |        i -> (e.v[i+1] - c.cv[i+1]) * (e.v[i+1] - c.cv[i+1]))), 6)
        |        AS d2
        |    FROM e, cent c)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |                             ORDER BY d2, cid) = 1),
        |probed AS (
        |  SELECT a.vec_id, a.v FROM asg a JOIN pl USING (cid)
        |  WHERE a.vec_id <> 0),
        |code AS (
        |  SELECT vec_id, j, cid AS c FROM (
        |    SELECT p.vec_id, jj.j, c.cid,
        |      round(list_sum(list_transform(range(8),
        |        i -> (p.v[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1])
        |           * (p.v[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1]))), 6)
        |        AS bd
        |    FROM probed p, (SELECT unnest(range(8)) AS j) jj, cent c)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, j
        |                             ORDER BY bd, cid) = 1),
        |lut AS (
        |  SELECT jj.j, c.cid,
        |    round(list_sum(list_transform(range(8),
        |      i -> (q.qv[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1])
        |         * (q.qv[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1]))), 6)
        |      AS ld
        |  FROM (SELECT unnest(range(8)) AS j) jj, cent c, q),
        |a AS (
        |  SELECT code.vec_id, round(sum(l.ld), 6) AS adist
        |  FROM code JOIN lut l ON l.j = code.j AND l.cid = code.c
        |  GROUP BY code.vec_id),
        |cand AS (SELECT vec_id FROM a
        |         QUALIFY row_number() OVER (ORDER BY adist, vec_id) <= 80)
        |SELECT e.vec_id,
        |  round(list_cosine_similarity(e.v, (SELECT qv FROM q)), 6)
        |    + 0.0::DOUBLE AS sim
        |FROM cand JOIN e USING (vec_id)
        |ORDER BY sim DESC, vec_id LIMIT 20""".stripMargin) { (s, d) =>
      Similarity.ivfAdcTopKDataDefined(Tables.embeddings(s, d),
          queryId = 0L, k = 20, nCents = 16, m = 8, nProbe = 4, rerank = 4)
        .select(col("vec_id"), (col("sim") + lit(0.0)).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
    },

    // ORACLE-checked matryoshka (s32's raw-embedding twin): prefix
    // cosine is pure SQL (list slice + list_cosine_similarity, 6 d.p.,
    // id ties), the cut is a row_number window, the rerank is the s1
    // discipline — prefix ranking is scale-invariant, so the raw form
    // covers the same read path the normalized golden probe serves.
    "s34_matryoshka_exact" -> QueryDef.sql(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |cand AS (
        |  SELECT vec_id, v FROM (
        |    -- zero-norm prefix guard: the engine's cosine totalizes
        |    -- degenerate inputs to 0.0 while list_cosine_similarity
        |    -- returns -1.0 for a zero vector; sums of squares compare
        |    -- to 0 EXACTLY so the guard is ulp-safe
        |    SELECT e.vec_id, e.v,
        |      CASE WHEN list_sum(list_transform(e.v[1:16], x -> x * x)) = 0
        |             OR list_sum(list_transform(q.qv[1:16], x -> x * x)) = 0
        |           THEN 0.0::DOUBLE
        |           ELSE round(list_cosine_similarity(e.v[1:16], q.qv[1:16]), 6)
        |             + 0.0::DOUBLE END AS psim
        |    FROM e, q WHERE e.vec_id <> 0)
        |  QUALIFY row_number() OVER (ORDER BY psim DESC, vec_id) <= 80)
        |SELECT vec_id,
        |  round(list_cosine_similarity(v, (SELECT qv FROM q)), 6)
        |    + 0.0::DOUBLE AS sim
        |FROM cand ORDER BY sim DESC, vec_id LIMIT 20""".stripMargin) { (s, d) =>
      Similarity.matryoshkaTopK(Tables.embeddings(s, d), queryId = 0L,
          k = 20, dPrefix = 16, rerank = 4)
        .select(col("vec_id"), (col("sim") + lit(0.0)).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
    },

    // IVF drift monitor — per-list occupancy + mean squared distance
    // against a data-defined frozen quantizer (centroids = the 16
    // lowest-id embeddings, so the oracle can join them relationally).
    // ORACLE-CHECKED: the rare ANN-family probe with SQL ground truth,
    // because assignment against a centroid TABLE is pure relational
    // argmin (6-d.p.-rounded d², ties to the lowest centroid id).
    "s22_ivf_drift" -> QueryDef.sql(
      """WITH c AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
        |           FROM embeddings WHERE vec_id < 16),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |d AS (SELECT e.vec_id, c.centroid_id,
        |        round(list_sum(list_transform(range(len(v)),
        |          i -> (v[i+1] - cv[i+1]) * (v[i+1] - cv[i+1]))), 6) AS d2
        |      FROM e CROSS JOIN c),
        |a AS (SELECT vec_id, centroid_id, d2,
        |        row_number() OVER (PARTITION BY vec_id
        |                           ORDER BY d2 ASC, centroid_id) AS rn
        |      FROM d)
        |SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_assigned,
        |  round(sum(d2), 2) / count(*) AS mean_d2
        |FROM a WHERE rn = 1 GROUP BY 1
        |ORDER BY centroid_id""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val cents = emb.filter(col("vec_id") < 16)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
      Similarity.ivfDriftStats(emb, cents).orderBy("centroid_id")
    },

    // the FULL Jégou IVFADC: PQ codes of coarse-quantizer RESIDUALS
    // with per-probed-list ADC tables — strictly tighter quantization
    // at the same m-byte budget (spec asserts the ADC-error drop vs
    // s20's raw encoding, on the TRAINED path — those golden gates stay
    // in SimilarityAsOfSpec untouched). ORACLE-CHECKED since r14 via
    // the s35 data-defined-quantizer recipe extended to the residual
    // composition: assignment, the residual subtraction (exact IEEE),
    // per-block residual codes, the per-(probed list, block) 6-d.p.
    // LUTs from q − c_L, the rounded ADC total, the cut and the exact
    // rerank are all relational — DuckDB reproduces the ENTIRE residual
    // pipeline from the same table. Raw vectors (the s33 rule:
    // cross-engine normalization is not bit-reproducible).
    "s21_ivfadc_residual" -> QueryDef.sql(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |pl AS (
        |  SELECT cid FROM (
        |    SELECT c.cid, round(list_sum(list_transform(range(len(c.cv)),
        |      i -> (c.cv[i+1] - q.qv[i+1]) * (c.cv[i+1] - q.qv[i+1]))), 6)
        |      AS d2
        |    FROM cent c, q)
        |  QUALIFY row_number() OVER (ORDER BY d2, cid) <= 4),
        |asg AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT e.vec_id, e.v, c.cid,
        |      round(list_sum(list_transform(range(len(e.v)),
        |        i -> (e.v[i+1] - c.cv[i+1]) * (e.v[i+1] - c.cv[i+1]))), 6)
        |        AS d2
        |    FROM e, cent c)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |                             ORDER BY d2, cid) = 1),
        |probed AS (
        |  SELECT a.vec_id, a.v, a.cid, c.cv AS acv
        |  FROM asg a JOIN pl ON pl.cid = a.cid
        |  JOIN cent c ON c.cid = a.cid
        |  WHERE a.vec_id <> 0),
        |code AS (
        |  SELECT vec_id, j, cid AS c FROM (
        |    SELECT p.vec_id, jj.j, c.cid,
        |      round(list_sum(list_transform(range(8),
        |        i -> ((p.v[jj.j*8 + i + 1] - p.acv[jj.j*8 + i + 1])
        |               - c.cv[jj.j*8 + i + 1])
        |           * ((p.v[jj.j*8 + i + 1] - p.acv[jj.j*8 + i + 1])
        |               - c.cv[jj.j*8 + i + 1]))), 6)
        |        AS bd
        |    FROM probed p, (SELECT unnest(range(8)) AS j) jj, cent c)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, j
        |                             ORDER BY bd, cid) = 1),
        |lut AS (
        |  SELECT pl.cid AS l, jj.j, c.cid,
        |    round(list_sum(list_transform(range(8),
        |      i -> ((q.qv[jj.j*8 + i + 1] - cl.cv[jj.j*8 + i + 1])
        |             - c.cv[jj.j*8 + i + 1])
        |         * ((q.qv[jj.j*8 + i + 1] - cl.cv[jj.j*8 + i + 1])
        |             - c.cv[jj.j*8 + i + 1]))), 6)
        |      AS ld
        |  FROM pl JOIN cent cl ON cl.cid = pl.cid,
        |       (SELECT unnest(range(8)) AS j) jj, cent c, q),
        |a AS (
        |  SELECT p.vec_id, round(sum(l.ld), 6) AS adist
        |  FROM probed p JOIN code ON code.vec_id = p.vec_id
        |  JOIN lut l ON l.l = p.cid AND l.j = code.j AND l.cid = code.c
        |  GROUP BY p.vec_id),
        |cand AS (SELECT vec_id FROM a
        |         QUALIFY row_number() OVER (ORDER BY adist, vec_id) <= 80)
        |SELECT e.vec_id,
        |  round(list_cosine_similarity(e.v, (SELECT qv FROM q)), 6)
        |    + 0.0::DOUBLE AS sim
        |FROM cand JOIN e USING (vec_id)
        |ORDER BY sim DESC, vec_id LIMIT 20""".stripMargin) { (s, d) =>
      Similarity.ivfAdcResidualTopKDataDefined(Tables.embeddings(s, d),
          queryId = 0L, k = 20, nCents = 16, m = 8, nProbe = 4, rerank = 4)
        .select(col("vec_id"), (col("sim") + lit(0.0)).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
    },

    // BATCHED IVFADC — the production retrieval read path: a query SET
    // against ONE scan of the code index (per-query probe lists, ADC
    // tables and candidacy all ride a broadcast |Q|·nProbe-row probe
    // relation; per-query top-k via the salted two-stage window).
    // ORACLE-CHECKED since r14: s35's data-defined-quantizer recipe
    // extended to the Q-query batch — per-query probe ranking, the
    // shared code index, per-query LUTs and the per-query cuts are all
    // relational windows, so DuckDB reproduces the whole batch from the
    // same table. The TRAINED-quantizer batch path keeps its golden
    // gates in SimilarityAsOfSpec (per-query bit-equality with the
    // single-query indexed path, coverage identity, one-scan+DPP plan
    // shape, exact-scan degeneracy) — those run on annQuantizers and
    // are untouched. Raw vectors (the s33 normalization rule).
    // Bench note: the index build amortizes through IndexCache (paid
    // once, in the discarded cold run), so the TIMED runs measure the
    // SERVE path — one DPP-pruned scan of the persisted
    // list-partitioned index — which is what the regression gate
    // watches (BASELINE.md fit/serve split).
    "s23_ivfadc_batch" -> QueryDef.sql(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 100 = 0),
        |pl AS (
        |  SELECT qid, cid FROM (
        |    SELECT q.qid, c.cid,
        |      round(list_sum(list_transform(range(len(c.cv)),
        |        i -> (c.cv[i+1] - q.qv[i+1]) * (c.cv[i+1] - q.qv[i+1]))), 6)
        |        AS d2
        |    FROM cent c, q)
        |  QUALIFY row_number() OVER (PARTITION BY qid
        |                             ORDER BY d2, cid) <= 4),
        |asg AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT e.vec_id, e.v, c.cid,
        |      round(list_sum(list_transform(range(len(e.v)),
        |        i -> (e.v[i+1] - c.cv[i+1]) * (e.v[i+1] - c.cv[i+1]))), 6)
        |        AS d2
        |    FROM e, cent c)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |                             ORDER BY d2, cid) = 1),
        |code AS (
        |  SELECT vec_id, j, cid AS c FROM (
        |    SELECT a.vec_id, jj.j, c.cid,
        |      round(list_sum(list_transform(range(8),
        |        i -> (a.v[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1])
        |           * (a.v[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1]))), 6)
        |        AS bd
        |    FROM asg a, (SELECT unnest(range(8)) AS j) jj, cent c)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, j
        |                             ORDER BY bd, cid) = 1),
        |lut AS (
        |  SELECT q.qid, jj.j, c.cid,
        |    round(list_sum(list_transform(range(8),
        |      i -> (q.qv[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1])
        |         * (q.qv[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1]))), 6)
        |      AS ld
        |  FROM q, (SELECT unnest(range(8)) AS j) jj, cent c),
        |a AS (
        |  SELECT pl.qid, a2.vec_id, round(sum(l.ld), 6) AS adist
        |  FROM pl JOIN asg a2 ON a2.cid = pl.cid
        |  JOIN code ON code.vec_id = a2.vec_id
        |  JOIN lut l ON l.qid = pl.qid AND l.j = code.j AND l.cid = code.c
        |  WHERE a2.vec_id <> pl.qid
        |  GROUP BY pl.qid, a2.vec_id),
        |cand AS (SELECT qid, vec_id FROM a
        |         QUALIFY row_number() OVER (PARTITION BY qid
        |                                    ORDER BY adist, vec_id) <= 40)
        |SELECT cand.qid, e.vec_id,
        |  round(list_cosine_similarity(e.v, q.qv), 6) + 0.0::DOUBLE AS sim
        |FROM cand JOIN e ON e.vec_id = cand.vec_id
        |JOIN q ON q.qid = cand.qid
        |QUALIFY row_number() OVER (PARTITION BY cand.qid
        |                           ORDER BY sim DESC, e.vec_id) <= 10
        |ORDER BY cand.qid, sim DESC, e.vec_id""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val (cents, books) =
        Similarity.dataDefinedQuantizers(emb, nCents = 16, m = 8)
      val idxDir = IndexCache.persistedIndex("ivfpqdd6", d,
        IndexCache.fitFingerprint(cents, books, roundTo = 6)) { out =>
        Similarity.pqEncode(Similarity.ivfAssign(emb, cents, roundTo = 6),
            books, roundTo = 6)
          .select("vec_id", "centroid_id", "pq_code")
          .write.mode("overwrite").partitionBy("centroid_id").parquet(out)
      }
      val queries = emb.filter(col("vec_id") % 100 === 0)
      Similarity.ivfAdcTopKBatch(s.read.parquet(idxDir), emb, queries,
          k = 10, cents, books, nProbe = 4, rerank = 4, roundTo = 6)
        .select(col("qid"), col("vec_id"), (col("sim") + lit(0.0)).as("sim"))
        .orderBy(col("qid"), col("sim").desc, col("vec_id"))
    },

    // batched RESIDUAL IVFADC — the s23 read path with the s21 encoder:
    // per-(query, probed list) ADC tables derive in-row on the
    // probe-pair relation (query residual against each probed centroid,
    // oncePerRow-barriered), one DPP-pruned scan of the residual-code
    // index serves the whole query set. ORACLE-CHECKED since r14: the
    // s21 residual twin × the s23 batch windows — the LUT keys on
    // (query, probed list, block, entry) and everything stays
    // relational. Trained-path golden gates (per-query BIT-equality
    // with ivfAdcResidualTopK, one-scan/DPP plan shape) stay in
    // SimilarityAsOfSpec untouched. Raw vectors (the s33 rule).
    // Bench note: serve-path timing via IndexCache, like s23.
    "s25_ivfadc_residual_batch" -> QueryDef.sql(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 100 = 0),
        |pl AS (
        |  SELECT qid, cid FROM (
        |    SELECT q.qid, c.cid,
        |      round(list_sum(list_transform(range(len(c.cv)),
        |        i -> (c.cv[i+1] - q.qv[i+1]) * (c.cv[i+1] - q.qv[i+1]))), 6)
        |        AS d2
        |    FROM cent c, q)
        |  QUALIFY row_number() OVER (PARTITION BY qid
        |                             ORDER BY d2, cid) <= 4),
        |asg AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT e.vec_id, e.v, c.cid,
        |      round(list_sum(list_transform(range(len(e.v)),
        |        i -> (e.v[i+1] - c.cv[i+1]) * (e.v[i+1] - c.cv[i+1]))), 6)
        |        AS d2
        |    FROM e, cent c)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |                             ORDER BY d2, cid) = 1),
        |code AS (
        |  SELECT vec_id, cid, j, ccid AS c FROM (
        |    SELECT a.vec_id, a.cid, jj.j, c.cid AS ccid,
        |      round(list_sum(list_transform(range(8),
        |        i -> ((a.v[jj.j*8 + i + 1] - ca.cv[jj.j*8 + i + 1])
        |               - c.cv[jj.j*8 + i + 1])
        |           * ((a.v[jj.j*8 + i + 1] - ca.cv[jj.j*8 + i + 1])
        |               - c.cv[jj.j*8 + i + 1]))), 6)
        |        AS bd
        |    FROM asg a JOIN cent ca ON ca.cid = a.cid,
        |         (SELECT unnest(range(8)) AS j) jj, cent c)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, j
        |                             ORDER BY bd, ccid) = 1),
        |lut AS (
        |  SELECT pl.qid, pl.cid AS l, jj.j, c.cid,
        |    round(list_sum(list_transform(range(8),
        |      i -> ((q.qv[jj.j*8 + i + 1] - cl.cv[jj.j*8 + i + 1])
        |             - c.cv[jj.j*8 + i + 1])
        |         * ((q.qv[jj.j*8 + i + 1] - cl.cv[jj.j*8 + i + 1])
        |             - c.cv[jj.j*8 + i + 1]))), 6)
        |      AS ld
        |  FROM pl JOIN q ON q.qid = pl.qid
        |  JOIN cent cl ON cl.cid = pl.cid,
        |       (SELECT unnest(range(8)) AS j) jj, cent c),
        |a AS (
        |  SELECT pl.qid, code.vec_id, round(sum(l.ld), 6) AS adist
        |  FROM pl JOIN code ON code.cid = pl.cid
        |  JOIN lut l ON l.qid = pl.qid AND l.l = code.cid
        |            AND l.j = code.j AND l.cid = code.c
        |  WHERE code.vec_id <> pl.qid
        |  GROUP BY pl.qid, code.vec_id),
        |cand AS (SELECT qid, vec_id FROM a
        |         QUALIFY row_number() OVER (PARTITION BY qid
        |                                    ORDER BY adist, vec_id) <= 40)
        |SELECT cand.qid, e.vec_id,
        |  round(list_cosine_similarity(e.v, q.qv), 6) + 0.0::DOUBLE AS sim
        |FROM cand JOIN e ON e.vec_id = cand.vec_id
        |JOIN q ON q.qid = cand.qid
        |QUALIFY row_number() OVER (PARTITION BY cand.qid
        |                           ORDER BY sim DESC, e.vec_id) <= 10
        |ORDER BY cand.qid, sim DESC, e.vec_id""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val (cents, books) =
        Similarity.dataDefinedQuantizers(emb, nCents = 16, m = 8)
      val idxDir = IndexCache.persistedIndex("ivfpqresdd6", d,
        IndexCache.fitFingerprint(cents, books, roundTo = 6)) { out =>
        Similarity.pqEncodeResidual(emb, cents, books, roundTo = 6)
          .select("vec_id", "centroid_id", "pq_code")
          .write.mode("overwrite").partitionBy("centroid_id").parquet(out)
      }
      val queries = emb.filter(col("vec_id") % 100 === 0)
      Similarity.ivfAdcResidualTopKBatch(s.read.parquet(idxDir), emb,
          queries, k = 10, cents, books, nProbe = 4, rerank = 4,
          roundTo = 6)
        .select(col("qid"), col("vec_id"), (col("sim") + lit(0.0)).as("sim"))
        .orderBy(col("qid"), col("sim").desc, col("vec_id"))
    },

    // ANN-accelerated hard-negative mining — the batch read path
    // composed into the training-data shape that motivated it:
    // candidates from ONE ivfAdcTopKBatch pass over the code index,
    // labels attached to the |Q|·poolK pool via a broadcast join,
    // per-query different-label top-k under the exact-miner contract.
    // ORACLE-CHECKED since r14: the s23 data-defined batch twin plus a
    // relational label join and a second per-query window — the WHOLE
    // mining pipeline (probe → ADC → pool rerank → label filter → cut)
    // hash-gates against DuckDB. Trained-quantizer coverage stays in
    // CorpusSpec (full-probe/corpus-pool degeneracy ≡ exact
    // hardNegatives), untouched. Raw vectors (the s33 rule).
    // Bench note: serve-path timing via IndexCache (shares s23's
    // persisted "ivfpqdd6" index — same quantizers, same fingerprint).
    "s26_hard_negatives_ann" -> QueryDef.sql(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 20),
        |pl AS (
        |  SELECT qid, cid FROM (
        |    SELECT q.qid, c.cid,
        |      round(list_sum(list_transform(range(len(c.cv)),
        |        i -> (c.cv[i+1] - q.qv[i+1]) * (c.cv[i+1] - q.qv[i+1]))), 6)
        |        AS d2
        |    FROM cent c, q)
        |  QUALIFY row_number() OVER (PARTITION BY qid
        |                             ORDER BY d2, cid) <= 4),
        |asg AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT e.vec_id, e.v, c.cid,
        |      round(list_sum(list_transform(range(len(e.v)),
        |        i -> (e.v[i+1] - c.cv[i+1]) * (e.v[i+1] - c.cv[i+1]))), 6)
        |        AS d2
        |    FROM e, cent c)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |                             ORDER BY d2, cid) = 1),
        |code AS (
        |  SELECT vec_id, j, cid AS c FROM (
        |    SELECT a.vec_id, jj.j, c.cid,
        |      round(list_sum(list_transform(range(8),
        |        i -> (a.v[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1])
        |           * (a.v[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1]))), 6)
        |        AS bd
        |    FROM asg a, (SELECT unnest(range(8)) AS j) jj, cent c)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, j
        |                             ORDER BY bd, cid) = 1),
        |lut AS (
        |  SELECT q.qid, jj.j, c.cid,
        |    round(list_sum(list_transform(range(8),
        |      i -> (q.qv[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1])
        |         * (q.qv[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1]))), 6)
        |      AS ld
        |  FROM q, (SELECT unnest(range(8)) AS j) jj, cent c),
        |a AS (
        |  SELECT pl.qid, a2.vec_id, round(sum(l.ld), 6) AS adist
        |  FROM pl JOIN asg a2 ON a2.cid = pl.cid
        |  JOIN code ON code.vec_id = a2.vec_id
        |  JOIN lut l ON l.qid = pl.qid AND l.j = code.j AND l.cid = code.c
        |  WHERE a2.vec_id <> pl.qid
        |  GROUP BY pl.qid, a2.vec_id),
        |cand AS (SELECT qid, vec_id FROM a
        |         QUALIFY row_number() OVER (PARTITION BY qid
        |                                    ORDER BY adist, vec_id) <= 200),
        |pool AS (
        |  SELECT cand.qid, e.vec_id,
        |    round(list_cosine_similarity(e.v, q.qv), 6) AS sim
        |  FROM cand JOIN e ON e.vec_id = cand.vec_id
        |  JOIN q ON q.qid = cand.qid
        |  QUALIFY row_number() OVER (PARTITION BY cand.qid
        |                             ORDER BY sim DESC, e.vec_id) <= 50),
        |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label
        |        FROM embeddings),
        |neg AS (
        |  SELECT p.qid, ql.label AS qlabel, p.vec_id AS neg_id,
        |         nl.label AS neg_label, p.sim
        |  FROM pool p JOIN lab ql ON ql.vec_id = p.qid
        |  JOIN lab nl ON nl.vec_id = p.vec_id
        |  WHERE nl.label <> ql.label),
        |topneg AS (
        |  SELECT qid, qlabel, neg_id, neg_label, sim FROM neg
        |  QUALIFY row_number() OVER (PARTITION BY qid
        |                             ORDER BY sim DESC, neg_id) <= 5)
        |SELECT qid, qlabel, neg_id, neg_label,
        |  sim + 0.0::DOUBLE AS sim
        |FROM topneg ORDER BY qid, sim DESC, neg_id""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val (cents, books) =
        Similarity.dataDefinedQuantizers(emb, nCents = 16, m = 8)
      val idxDir = IndexCache.persistedIndex("ivfpqdd6", d,
        IndexCache.fitFingerprint(cents, books, roundTo = 6)) { out =>
        Similarity.pqEncode(Similarity.ivfAssign(emb, cents, roundTo = 6),
            books, roundTo = 6)
          .select("vec_id", "centroid_id", "pq_code")
          .write.mode("overwrite").partitionBy("centroid_id").parquet(out)
      }
      Corpus.hardNegativesAnn(emb, s.read.parquet(idxDir), queryCap = 20L,
          k = 5, cents, books, poolK = 50, nProbe = 4, rerank = 4,
          roundTo = 6)
        .select(col("qid"), col("qlabel"), col("neg_id"), col("neg_label"),
          (col("sim") + lit(0.0)).as("sim"))
        .orderBy(col("qid"), col("sim").desc, col("neg_id"))
    },

    // END-TO-END index lifecycle (the s22 machinery composed into the
    // operational scenario): build the list-partitioned ADC index from
    // the even half, APPEND the odd half against the FROZEN quantizers,
    // take drift stats + the occupancy-skew retrain decision on the
    // appended batch, and prove the appended index serves BIT-identical
    // top-k to a full rebuild (`topk_match` — computed Spark-side over
    // both persisted indexes; a broken append/merge flips it to false
    // and the oracle hash catches it). ORACLE-CHECKED: the coarse
    // quantizer is data-defined (the 16 lowest-id embeddings, the s22
    // trick), so the drift/decision legs are pure relational argmin;
    // the retrain rule is integer arithmetic (n·nLists > 2·total — no
    // float boundary).
    "s24_index_lifecycle" -> QueryDef.sql(
      """WITH c AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
        |           FROM embeddings WHERE vec_id < 16),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |      WHERE vec_id % 2 = 1),
        |d AS (SELECT e.vec_id, c.centroid_id,
        |        round(list_sum(list_transform(range(len(v)),
        |          i -> (v[i+1] - cv[i+1]) * (v[i+1] - cv[i+1]))), 6) AS d2
        |      FROM e CROSS JOIN c),
        |a AS (SELECT vec_id, centroid_id, d2,
        |        row_number() OVER (PARTITION BY vec_id
        |                           ORDER BY d2 ASC, centroid_id) AS rn
        |      FROM d)
        |SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_assigned,
        |  round(sum(d2), 2) / count(*) AS mean_d2,
        |  count(*) * 16 > 2 * (SELECT count(*) FROM e) AS drifted,
        |  TRUE AS topk_match
        |FROM a WHERE rn = 1 GROUP BY centroid_id
        |ORDER BY centroid_id""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val cents = emb.filter(col("vec_id") < 16).orderBy("vec_id")
        .select(Similarity.asDouble(col("embedding"))).collect()
        .map(_.getSeq[Double](0).toArray)
      // fit memoized (IndexCache): the lifecycle ops under test are the
      // APPEND + rebuild-equivalence below, not the seeded codebook fit
      val books = IndexCache.pqCodebooksRaw(s, d)
      val build = emb.filter(col("vec_id") % 2 === 0)
      val delta = emb.filter(col("vec_id") % 2 === 1)
      val dirA = tempIndexDir("graft_s24_app")
      val dirB = tempIndexDir("graft_s24_full")
      Similarity.pqEncode(Similarity.ivfAssign(build, cents), books)
        .select("vec_id", "centroid_id", "pq_code")
        .write.mode("overwrite").partitionBy("centroid_id").parquet(dirA)
      Similarity.ivfIndexAppend(delta, dirA, cents, books)
      Similarity.pqEncode(Similarity.ivfAssign(emb, cents), books)
        .select("vec_id", "centroid_id", "pq_code")
        .write.mode("overwrite").partitionBy("centroid_id").parquet(dirB)
      def topk(dir: String): Seq[(Long, Double)] =
        Similarity.ivfAdcTopKIndexed(s.read.parquet(dir), emb, 0L, 10,
            cents, books, nProbe = 4, rerank = 4).collect()
          .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val matches = topk(dirA) == topk(dirB)
      val total = delta.count()
      val centsTable = emb.filter(col("vec_id") < 16)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
      Similarity.ivfDriftStats(delta, centsTable)
        .withColumn("drifted",
          col("n_assigned") * 16 > lit(2L * total))
        .withColumn("topk_match", lit(matches))
        .orderBy("centroid_id")
    },

    // OPQ (Ge et al., CVPR 2013): orthogonal transform before PQ —
    // redistributes within-block variance so the SAME m × ksub byte
    // budget quantizes with lower error. ORACLE-CHECKED since r15 with
    // a DATA-DEFINED transform: a permutation matrix (a valid
    // orthogonal rotation) that round-robins dims over the 8 blocks in
    // descending exact per-dim range — parametric OPQ's balanced
    // variance allocation restricted to the transform family a SQL
    // oracle re-derives (min/max are order-independent, max − min one
    // IEEE subtract, so both engines sort identical doubles and build
    // the identical permutation; element moves are exact). The s19
    // PQ tail then runs over the permuted space (query 4). The
    // TRAINED Procrustes rotation + codebooks (IndexCache.opqQuantizers
    // + rotated + pqTopK) keep their golden gates in SimilarityAsOfSpec
    // untouched, incl. the objective-≤-plain-PQ bound.
    "s28_opq_topk" -> QueryDef.sql(
      """WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |            FROM embeddings),
        |b AS (
        |  SELECT i, min(v[i+1]) AS mn, max(v[i+1]) AS mx
        |  FROM e0, (SELECT unnest(range((SELECT max(len(v)) FROM e0))) AS i)
        |  GROUP BY i),
        |pm AS (
        |  SELECT list(i ORDER BY rk % 8, rk // 8) AS p FROM (
        |    SELECT i, row_number() OVER (ORDER BY (mx - mn) DESC, i) - 1 AS rk
        |    FROM b)),
        |e AS (SELECT vec_id, list_transform(pm.p, j -> e0.v[j+1]) AS v
        |      FROM e0, pm),
        |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 4),
        |code AS (
        |  SELECT vec_id, j, cid AS c FROM (
        |    SELECT p.vec_id, jj.j, c.cid,
        |      round(list_sum(list_transform(range(8),
        |        i -> (p.v[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1])
        |           * (p.v[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1]))), 6)
        |        AS bd
        |    FROM (SELECT vec_id, v FROM e WHERE vec_id <> 4) p,
        |         (SELECT unnest(range(8)) AS j) jj, cent c)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, j
        |                             ORDER BY bd, cid) = 1),
        |lut AS (
        |  SELECT jj.j, c.cid,
        |    round(list_sum(list_transform(range(8),
        |      i -> (q.qv[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1])
        |         * (q.qv[jj.j*8 + i + 1] - c.cv[jj.j*8 + i + 1]))), 6)
        |      AS ld
        |  FROM (SELECT unnest(range(8)) AS j) jj, cent c, q),
        |a AS (
        |  SELECT code.vec_id, round(sum(l.ld), 6) AS adist
        |  FROM code JOIN lut l ON l.j = code.j AND l.cid = code.c
        |  GROUP BY code.vec_id),
        |cand AS (SELECT vec_id FROM a
        |         QUALIFY row_number() OVER (ORDER BY adist, vec_id) <= 80)
        |SELECT e.vec_id,
        |  round(list_cosine_similarity(e.v, (SELECT qv FROM q)), 6)
        |    + 0.0::DOUBLE AS sim
        |FROM cand JOIN e USING (vec_id)
        |ORDER BY sim DESC, vec_id LIMIT 20""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val perm = Similarity.rangePermutation(emb, m = 8)
      Similarity.pqTopKDataDefined(Similarity.permuted(emb, perm),
          queryId = 4L, k = 20, nCents = 16, m = 8, rerank = 4)
        .select(col("vec_id"), (col("sim") + lit(0.0)).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
    },

    // the FULL faiss default encoder stack composed — OPQ transform +
    // IVF coarse quantizer + residual PQ (OPQ{m}_{d},IVF{n},PQ{m} in
    // faiss index-factory terms). ORACLE-CHECKED since r15: s28's
    // data-defined range permutation composed with the s21
    // data-defined residual-IVFADC recipe (query 6), so the DuckDB
    // twin reproduces permute → assign → residual-encode → probe →
    // per-list ADC → rerank end to end. The TRAINED stack
    // (opqQuantizers + annQuantizersOpqRotated + ivfAdcResidualTopK)
    // keeps its golden gates in SimilarityAsOfSpec untouched, incl.
    // the encode-quality ladder raw ≥ residual ≥ OPQ+residual
    // (0.583/0.538/0.527 measured).
    "s29_opq_ivfadc_topk" -> QueryDef.sql(
      """WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |            FROM embeddings),
        |b AS (
        |  SELECT i, min(v[i+1]) AS mn, max(v[i+1]) AS mx
        |  FROM e0, (SELECT unnest(range((SELECT max(len(v)) FROM e0))) AS i)
        |  GROUP BY i),
        |pm AS (
        |  SELECT list(i ORDER BY rk % 8, rk // 8) AS p FROM (
        |    SELECT i, row_number() OVER (ORDER BY (mx - mn) DESC, i) - 1 AS rk
        |    FROM b)),
        |e AS (SELECT vec_id, list_transform(pm.p, j -> e0.v[j+1]) AS v
        |      FROM e0, pm),
        |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 6),
        |pl AS (
        |  SELECT cid FROM (
        |    SELECT c.cid, round(list_sum(list_transform(range(len(c.cv)),
        |      i -> (c.cv[i+1] - q.qv[i+1]) * (c.cv[i+1] - q.qv[i+1]))), 6)
        |      AS d2
        |    FROM cent c, q)
        |  QUALIFY row_number() OVER (ORDER BY d2, cid) <= 4),
        |asg AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT e.vec_id, e.v, c.cid,
        |      round(list_sum(list_transform(range(len(e.v)),
        |        i -> (e.v[i+1] - c.cv[i+1]) * (e.v[i+1] - c.cv[i+1]))), 6)
        |        AS d2
        |    FROM e, cent c)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |                             ORDER BY d2, cid) = 1),
        |probed AS (
        |  SELECT a.vec_id, a.v, a.cid, c.cv AS acv
        |  FROM asg a JOIN pl ON pl.cid = a.cid
        |  JOIN cent c ON c.cid = a.cid
        |  WHERE a.vec_id <> 6),
        |code AS (
        |  SELECT vec_id, j, cid AS c FROM (
        |    SELECT p.vec_id, jj.j, c.cid,
        |      round(list_sum(list_transform(range(8),
        |        i -> ((p.v[jj.j*8 + i + 1] - p.acv[jj.j*8 + i + 1])
        |               - c.cv[jj.j*8 + i + 1])
        |           * ((p.v[jj.j*8 + i + 1] - p.acv[jj.j*8 + i + 1])
        |               - c.cv[jj.j*8 + i + 1]))), 6)
        |        AS bd
        |    FROM probed p, (SELECT unnest(range(8)) AS j) jj, cent c)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, j
        |                             ORDER BY bd, cid) = 1),
        |lut AS (
        |  SELECT pl.cid AS l, jj.j, c.cid,
        |    round(list_sum(list_transform(range(8),
        |      i -> ((q.qv[jj.j*8 + i + 1] - cl.cv[jj.j*8 + i + 1])
        |             - c.cv[jj.j*8 + i + 1])
        |         * ((q.qv[jj.j*8 + i + 1] - cl.cv[jj.j*8 + i + 1])
        |             - c.cv[jj.j*8 + i + 1]))), 6)
        |      AS ld
        |  FROM pl JOIN cent cl ON cl.cid = pl.cid,
        |       (SELECT unnest(range(8)) AS j) jj, cent c, q),
        |a AS (
        |  SELECT p.vec_id, round(sum(l.ld), 6) AS adist
        |  FROM probed p JOIN code ON code.vec_id = p.vec_id
        |  JOIN lut l ON l.l = p.cid AND l.j = code.j AND l.cid = code.c
        |  GROUP BY p.vec_id),
        |cand AS (SELECT vec_id FROM a
        |         QUALIFY row_number() OVER (ORDER BY adist, vec_id) <= 80)
        |SELECT e.vec_id,
        |  round(list_cosine_similarity(e.v, (SELECT qv FROM q)), 6)
        |    + 0.0::DOUBLE AS sim
        |FROM cand JOIN e USING (vec_id)
        |ORDER BY sim DESC, vec_id LIMIT 20""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val perm = Similarity.rangePermutation(emb, m = 8)
      Similarity.ivfAdcResidualTopKDataDefined(
          Similarity.permuted(emb, perm), queryId = 6L, k = 20,
          nCents = 16, m = 8, nProbe = 4, rerank = 4)
        .select(col("vec_id"), (col("sim") + lit(0.0)).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
    },

    // index DELETE lifecycle (s24's sibling): build the full index,
    // tombstone every vec_id ≡ 3 (mod 10), run the partition-selective
    // compaction, and emit drift stats over the REMAINING rows against
    // the frozen data-defined quantizer + the remaining-row count +
    // `topk_match` (compacted index serves BIT-identical top-k to a
    // full rebuild without the deleted rows — computed over both
    // persisted indexes inside the probe; a compaction that leaks a
    // stale partition or drops a live row flips the count or the
    // boolean and the oracle hash catches it). The relational legs are
    // pure SQL over `embeddings WHERE vec_id % 10 <> 3`.
    "s27_index_delete" -> QueryDef.sql(
      """WITH c AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
        |           FROM embeddings WHERE vec_id < 16),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |      WHERE vec_id % 10 <> 3),
        |d AS (SELECT e.vec_id, c.centroid_id,
        |        round(list_sum(list_transform(range(len(v)),
        |          i -> (v[i+1] - cv[i+1]) * (v[i+1] - cv[i+1]))), 6) AS d2
        |      FROM e CROSS JOIN c),
        |a AS (SELECT vec_id, centroid_id, d2,
        |        row_number() OVER (PARTITION BY vec_id
        |                           ORDER BY d2 ASC, centroid_id) AS rn
        |      FROM d)
        |SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_assigned,
        |  round(sum(d2), 2) / count(*) AS mean_d2,
        |  CAST((SELECT count(*) FROM e) AS BIGINT) AS n_index_rows,
        |  TRUE AS topk_match
        |FROM a WHERE rn = 1 GROUP BY centroid_id
        |ORDER BY centroid_id""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val cents = emb.filter(col("vec_id") < 16).orderBy("vec_id")
        .select(Similarity.asDouble(col("embedding"))).collect()
        .map(_.getSeq[Double](0).toArray)
      // fit memoized (IndexCache): the op under test is the tombstone
      // COMPACTION + rebuild-equivalence, not the seeded codebook fit
      val books = IndexCache.pqCodebooksRaw(s, d)
      val dir = tempIndexDir("graft_s27")
      Similarity.pqEncode(Similarity.ivfAssign(emb, cents), books)
        .select("vec_id", "centroid_id", "pq_code")
        .write.mode("overwrite").partitionBy("centroid_id").parquet(dir)
      val tombstones = emb.filter(col("vec_id") % 10 === 3).select("vec_id")
      Similarity.ivfIndexCompact(s, dir, tombstones)
      val remaining = emb.filter(col("vec_id") % 10 =!= 3)
      val rebuilt = tempIndexDir("graft_s27_rb")
      Similarity.pqEncode(Similarity.ivfAssign(remaining, cents), books)
        .select("vec_id", "centroid_id", "pq_code")
        .write.mode("overwrite").partitionBy("centroid_id").parquet(rebuilt)
      def topk(idx: String): Seq[(Long, Double)] =
        Similarity.ivfAdcTopKIndexed(s.read.parquet(idx), emb, 1L, 10,
            cents, books, nProbe = 4, rerank = 4).collect()
          .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val matches = topk(dir) == topk(rebuilt)
      val nRows = s.read.parquet(dir).count()
      val centsTable = emb.filter(col("vec_id") < 16)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
      Similarity.ivfDriftStats(remaining, centsTable)
        .withColumn("n_index_rows", lit(nRows))
        .withColumn("topk_match", lit(matches))
        .orderBy("centroid_id")
    },

    // compressed-index search: int8-quantized vectors (4× smaller),
    // reconstructed on the fly for the cosine ranking. Quantize →
    // dequantize → cosine is exact arithmetic, so DuckDB mirrors it.
    "s5_quantized_topk" -> QueryDef.sql(
      """WITH dq AS (
        |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> round(x / (CASE WHEN m = 0 THEN 1.0 ELSE m / 127.0 END), 0)
        |           * (CASE WHEN m = 0 THEN 1.0 ELSE m / 127.0 END)) AS v
        |  FROM (SELECT vec_id, embedding,
        |          list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS m
        |        FROM embeddings))
        |SELECT vec_id, round(list_cosine_similarity(
        |    v, (SELECT v FROM dq WHERE vec_id = 0)), 6) AS sim
        |FROM dq WHERE vec_id <> 0
        |ORDER BY sim DESC, vec_id LIMIT 20""".stripMargin) { (s, d) =>
      val dq = Similarity.dequantizeInt8(
        Similarity.quantizeInt8(Tables.embeddings(s, d)))
        .select(col("vec_id"), col("embedding_dq").as("embedding"))
      Similarity.topKCosine(dq, queryId = 0L, k = 20)
    },

    // near-dup clustering, oracle-checked END-TO-END: exact similarity
    // join (prefix filtering) → iterative connected components, equal to
    // DuckDB's quadratic join + recursive-CTE closure. cluster_id IS the
    // minimum member id (clusters() invariant), so it doubles as the
    // representative.
    "d7_neardup_clusters" -> QueryDef.sql(
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(ws) = 0 THEN CAST([] AS VARCHAR[])
        |         WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |         ELSE list_transform(range(len(ws) - 2),
        |                i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) END) AS g
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                      x -> x <> '') AS ws
        |        FROM documents)),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE len(a.g) > 0 AND len(b.g) > 0
        |    AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |        / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.3),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  WITH RECURSIVE r(id, lab) AS (
        |    SELECT a, a FROM edges
        |    UNION
        |    SELECT e.a, r.lab FROM edges e JOIN r ON e.b = r.id)
        |  SELECT id, min(lab) AS cluster_id FROM r GROUP BY id)
        |SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
        |  CAST(count(*) AS BIGINT) AS cluster_size,
        |  CAST(cluster_id AS BIGINT) AS representative
        |FROM reach GROUP BY cluster_id HAVING count(*) > 1
        |ORDER BY cluster_size DESC, cluster_id""".stripMargin) { (s, d) =>
      Dedup.nearDupClustersExact(Tables.documents(s, d), threshold = 0.3)
        .groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
        .filter(col("cluster_size") > 1)
        .withColumn("representative", col("cluster_id"))
        .orderBy(col("cluster_size").desc, col("cluster_id"))
    },

    // EXACT near-dup ground truth, oracle-checked: the prefix-filtered
    // inverted-index join (100% recall by construction) must equal
    // DuckDB's quadratic all-pairs n-gram Jaccard exactly — this row
    // proves the scalable candidate path loses no pairs.
    "d9_exact_jaccard_pairs" -> QueryDef.sql(
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(ws) = 0 THEN CAST([] AS VARCHAR[])
        |         WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |         ELSE list_transform(range(len(ws) - 2),
        |                i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) END) AS g
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                      x -> x <> '') AS ws
        |        FROM documents))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |        / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))), 6) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE len(a.g) > 0 AND len(b.g) > 0
        |  AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |      / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      Dedup.exactJaccardPairs(Tables.documents(s, d), threshold = 0.4)
        .orderBy("id_a", "id_b")
    },

    // benchmark decontamination (GPT-3's n-gram collision rule): corpus =
    // doc_id % 7 != 0, eval set = the rest; a corpus doc is contaminated
    // iff it shares ≥1 distinct word 8-gram with any eval doc. The Spark
    // side is the two-phase hash-candidates + exact-string-verify join
    // (Dedup.decontaminate); the oracle computes the same flag by a plain
    // string-shingle intersection — result equality IS the FP-rejection
    // proof for the hashed phase.
    "d10_decontaminate" -> QueryDef.sql(
      """WITH ws AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                x -> x <> '') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
        |         WHEN len(w) < 8 THEN [array_to_string(w, ' ')]
        |         ELSE list_transform(range(len(w) - 7),
        |                i -> array_to_string(list_slice(w, i + 1, i + 8), ' ')) END) AS g
        |  FROM ws),
        |ev AS (SELECT DISTINCT unnest(g) AS t FROM sh WHERE doc_id % 7 = 0),
        |hits AS (
        |  SELECT DISTINCT p.doc_id
        |  FROM (SELECT doc_id, unnest(g) AS t FROM sh WHERE doc_id % 7 <> 0) p
        |  JOIN ev USING (t))
        |SELECT s.doc_id, s.doc_id IN (SELECT doc_id FROM hits) AS contaminated
        |FROM sh s WHERE s.doc_id % 7 <> 0
        |ORDER BY s.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      Dedup.decontaminate(
          docs.filter(col("doc_id") % 7 =!= 0),
          docs.filter(col("doc_id") % 7 === 0), n = 8)
        .orderBy("doc_id")
    },

    // NEAR-dup decontamination (Dedup.crossJaccardPairs): d10's split
    // (train = doc_id % 7 ≠ 0, eval = the rest), but flagging 3-gram
    // Jaccard ≥ 0.4 pairs instead of exact 8-gram collisions — the
    // paraphrase-leak audit. Oracle: quadratic train×eval n-gram
    // Jaccard (d9's oracle with the self-join triangle replaced by the
    // cross product) — equality proves the union-df prefix filter is
    // lossless across two collections, not just within one.
    "d16_cross_neardup" -> QueryDef.sql(
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(ws) = 0 THEN CAST([] AS VARCHAR[])
        |         WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |         ELSE list_transform(range(len(ws) - 2),
        |                i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) END) AS g
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                      x -> x <> '') AS ws
        |        FROM documents))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |        / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))), 6) AS jaccard
        |FROM sh a JOIN sh b
        |  ON a.doc_id % 7 <> 0 AND b.doc_id % 7 = 0
        |WHERE len(a.g) > 0 AND len(b.g) > 0
        |  AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |      / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      Dedup.crossJaccardPairs(
          docs.filter(col("doc_id") % 7 =!= 0),
          docs.filter(col("doc_id") % 7 === 0), threshold = 0.4)
        .orderBy("id_a", "id_b")
    },

    // d10's contract with phase 1 compressed into a Bloom filter
    // (Dedup.bloomDecontaminate — scan-local BloomFilterMightContain
    // probe instead of the broadcast hash-set semi join). The oracle is
    // d10's, UNCHANGED: equality proves bloom false positives never
    // survive the exact verify, and that the filter admits every true
    // collision (no false negatives). expectedItems is deliberately
    // modest at probe scale so the filter stays a few hundred KB.
    "d14_bloom_decontaminate" -> QueryDef.sql(
      """WITH ws AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                x -> x <> '') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
        |         WHEN len(w) < 8 THEN [array_to_string(w, ' ')]
        |         ELSE list_transform(range(len(w) - 7),
        |                i -> array_to_string(list_slice(w, i + 1, i + 8), ' ')) END) AS g
        |  FROM ws),
        |ev AS (SELECT DISTINCT unnest(g) AS t FROM sh WHERE doc_id % 7 = 0),
        |hits AS (
        |  SELECT DISTINCT p.doc_id
        |  FROM (SELECT doc_id, unnest(g) AS t FROM sh WHERE doc_id % 7 <> 0) p
        |  JOIN ev USING (t))
        |SELECT s.doc_id, s.doc_id IN (SELECT doc_id FROM hits) AS contaminated
        |FROM sh s WHERE s.doc_id % 7 <> 0
        |ORDER BY s.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      Dedup.bloomDecontaminate(
          docs.filter(col("doc_id") % 7 =!= 0),
          docs.filter(col("doc_id") % 7 === 0), n = 8,
          expectedItems = 1L << 16)
        .orderBy("doc_id")
    },

    // Duplicated-span statistics (Lee et al. 2021 exact-substring-dedup
    // signal): fraction of each document's position-indexed word 8-gram
    // windows whose content occurs at ≥2 positions corpus-wide. The
    // oracle counts the same windows relationally (window content is the
    // partition key — Spark's md5 keying changes bytes on the wire, not
    // counts); dup_frac is the unrounded quotient of identical integers.
    "d12_dup_spans" -> QueryDef.sql(
      """WITH ws AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                x -> x <> '') AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
        |    WHEN len(w) < 8 THEN [array_to_string(w, ' ')]
        |    ELSE list_transform(range(len(w) - 7),
        |           i -> array_to_string(list_slice(w, i + 1, i + 8), ' ')) END AS g
        |  FROM ws),
        |x AS (SELECT doc_id, unnest(g) AS t FROM g),
        |c AS (SELECT doc_id, count(*) OVER (PARTITION BY t) AS cnt FROM x)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
        |  CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
        |  CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_frac
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      Dedup.dupSpanStats(Tables.documents(s, d), n = 8)
        .orderBy("doc_id")
    },

    // EXACT overlap-coefficient (containment) pairs: |∩|/min ≥ 0.5 over
    // word 3-gram shingle sets — the quote/boilerplate-containment
    // measure Jaccard dilutes. The prefix-filtered join must equal
    // DuckDB's quadratic formulation exactly; containment is the
    // unrounded integer quotient (bit-identical cross-engine).
    "d13_containment_pairs" -> QueryDef.sql(
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(ws) = 0 THEN CAST([] AS VARCHAR[])
        |         WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |         ELSE list_transform(range(len(ws) - 2),
        |                i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) END) AS g
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |                      x -> x <> '') AS ws
        |        FROM documents))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.g, b.g)) AS BIGINT) AS overlap,
        |  CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |    / least(len(a.g), len(b.g)) AS containment
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE len(a.g) > 0 AND len(b.g) > 0
        |  AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |      / least(len(a.g), len(b.g)) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      Dedup.overlapPairs(Tables.documents(s, d), threshold = 0.5)
        .orderBy("id_a", "id_b")
    },

    // incremental ingest dedup: docs arriving as the "new batch"
    // (doc_id ≥ 400) survive only if their content digest is unseen in
    // the history (doc_id < 400) — digest anti join, text never shuffles
    "d11_incremental_dedup" -> QueryDef.sql(
      """SELECT n.doc_id FROM documents n
        |WHERE n.doc_id >= 400 AND NOT EXISTS (
        |  SELECT 1 FROM documents o
        |  WHERE o.doc_id < 400 AND md5(o.text) = md5(n.text))
        |ORDER BY n.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      Dedup.incrementalNew(
          docs.filter(col("doc_id") >= 400),
          docs.filter(col("doc_id") < 400))
        .select("doc_id")
        .orderBy("doc_id")
    },

    // fuzzy vocabulary matching, oracle-checked: the banded equi-join +
    // levenshtein verify must equal DuckDB's quadratic filter exactly
    "d8_fuzzy_match" -> QueryDef.sql(
      """WITH names AS (SELECT DISTINCT p_name FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM names a JOIN names b ON a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY name_a, name_b""".stripMargin) { (s, d) =>
      Dedup.editDistancePairs(Tables.part(s, d), "p_name", maxDist = 2)
        .orderBy("name_a", "name_b")
    }
  )
}
