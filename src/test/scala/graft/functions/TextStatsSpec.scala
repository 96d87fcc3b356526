package graft.functions

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity: the fused TextStatsExpr must agree with the composable
  * column-function versions on real documents.
  */
class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val both = Tables.documents(spark, TestSpark.sfDir)
    .select(col("doc_id"), col("text"),
      TextStats.textStats(col("text")).as("st"),
      TextFunctions.qualityScore(col("text")).as("quality_hof"),
      TextFunctions.tokenEstimate(col("text")).as("token_est_hof"),
      size(TextFunctions.words(col("text"))).cast("long").as("n_words_hof"),
      round(TextFunctions.punctRatio(col("text")), 9).as("punct_hof"),
      TextFunctions.langId(col("text")).as("lang_hof"))
    .cache()

  test("quality, token estimate, word count, punct ratio match the HOF versions") {
    assert(both.filter(col("st.quality") =!= col("quality_hof")).count() === 0)
    assert(both.filter(col("st.token_est") =!= col("token_est_hof")).count() === 0)
    assert(both.filter(col("st.n_words") =!= col("n_words_hof")).count() === 0)
    assert(both.filter(
      abs(col("st.punct_ratio") - col("punct_hof")) > 1e-9).count() === 0)
  }

  test("language ID agrees exactly (same alphabetical-first tie-break)") {
    assert(both.filter(col("st.lang_pred") =!= col("lang_hof")).count() === 0)
  }

  test("edge cases: empty, whitespace, digits") {
    import spark.implicits._
    val edge = Seq("", "   ", "12 34", "the the the").toDF("text")
      .select(TextStats.textStats(col("text")).as("st"))
      .select("st.n_words", "st.lang_pred", "st.token_est").collect()
    assert(edge(0).getLong(0) === 0 && edge(0).getString(1) === "und")
    assert(edge(1).getLong(0) === 0)
    assert(edge(2).getLong(0) === 2 && edge(2).getLong(2) === 4)
    assert(edge(3).getString(1) === "en")
  }

  test("fused RepetitionStats matches the HOF twins on real documents + edges") {
    val spark2 = spark
    import spark2.implicits._
    val real = Tables.documents(spark, TestSpark.sfDir).select("doc_id", "text")
    val edges = Seq((9001L, ""), (9002L, "   "), (9003L, "one"),
      (9004L, "one two"), (9005L, "a b a b a b"), (9006L, "x x x x x"))
      .toDF("doc_id", "text")
    val hofTop2 = real.unionByName(edges)
      .select(col("doc_id"), explode(TextFunctions.wordShingles(col("text"), 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg((max("cnt").cast("double") / sum("cnt")).as("top2_hof"))
    val joined = real.unionByName(edges)
      .select(col("doc_id"),
        RepetitionStats.repetitionStats(col("text")).as("st"),
        TextFunctions.dupNgramFrac(col("text"), 3).as("dup3_hof"),
        size(TextFunctions.words(col("text"))).cast("long").as("n_words_hof"),
        TextFunctions.meanWordLen(col("text")).as("mwl_hof"),
        TextFunctions.stopwordRatio(col("text")).as("stop_hof"))
      .join(hofTop2, Seq("doc_id"), "left")
      .withColumn("top2_hof", coalesce(col("top2_hof"), lit(0.0)))
    assert(joined.filter(col("st.n_words") =!= col("n_words_hof")).count() === 0)
    assert(joined.filter(col("st.mean_word_len") =!= col("mwl_hof")).count() === 0)
    assert(joined.filter(col("st.stop_ratio") =!= col("stop_hof")).count() === 0)
    assert(joined.filter(col("st.dup3_frac") =!= col("dup3_hof")).count() === 0)
    assert(joined.filter(col("st.top2_frac") =!= col("top2_hof")).count() === 0)
  }

  test("custom expressions are SQL-callable after registration") {
    GraftFunctions.register(spark)
    Tables.documents(spark, TestSpark.sfDir).limit(50)
      .createOrReplaceTempView("docs_sql")
    val viaSql = spark.sql(
      """SELECT doc_id, simhash64_text(text) AS sh,
        |  text_stats(text).lang_pred AS lang,
        |  ngram_jaccard(split(lower(text), '[^a-z0-9]+'),
        |                split(lower(text), '[^a-z0-9]+'), 3) AS self_j,
        |  repetition_stats(text).dup3_frac AS dup3
        |FROM docs_sql ORDER BY doc_id""".stripMargin).collect()
    assert(viaSql.length === 50)
    assert(viaSql.forall(r => math.abs(r.getDouble(3) - 1.0) < 1e-9),
      "self-jaccard must be 1")
    assert(viaSql.forall(r => r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0),
      "dup3_frac must be a bounded ratio")
    val viaApi = Tables.documents(spark, TestSpark.sfDir).limit(50)
      .select(graft.functions.Sketches.simhash64Text(col("text")))
      .collect().map(_.getLong(0))
    assert(viaSql.map(_.getLong(1)).sameElements(viaApi))
  }
}
