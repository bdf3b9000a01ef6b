package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.util.{Cols, Tables}

/** Text analysis operators (SURVEY.md §2.C).
  *
  * Each has a generic DataFrame→DataFrame core (`*On`) over any
  * id + text corpus, plus a testdata binding on `documents`.
  * All scan-side, codegen'd expressions — at 100 TB these run at parquet
  * read speed with no shuffle except the final (optional) sort.
  */
object TextAnalysis {

  /** Language ID: stopword-marker heuristic — ratio of English-marker
    * tokens decides en vs unknown; emitted with the ratio so downstream
    * filters can re-threshold. Output: (doc_id, n_words, en_ratio,
    * pred_lang).
    */
  def langidOn(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), TextFns.tokenize(col(textCol)).as("words"))
      .filter(size(col("words")) > 0)
      .withColumn("en_ratio", TextFns.markerRatio("words"))
      .select(
        col("doc_id"),
        size(col("words")).as("n_words"),
        col("en_ratio"),
        when(col("en_ratio") >= 0.05, "en").otherwise("unknown").as("pred_lang"))

  /** text_langid testdata binding. */
  def langid(spark: SparkSession, sfDir: String): DataFrame =
    langidOn(Tables.documents(spark, sfDir), "doc_id", "text").orderBy(col("doc_id"))

  def langidSql: String =
    s"""SELECT doc_id, CAST(len(words) AS INTEGER) AS n_words, en_ratio,
       | CASE WHEN en_ratio >= 0.05 THEN 'en' ELSE 'unknown' END AS pred_lang
       |FROM (SELECT doc_id, words, ${TextFns.markerRatioSql("words")} AS en_ratio
       |      FROM (SELECT doc_id, ${TextFns.tokenizeSql("text")} AS words FROM documents)
       |      WHERE len(words) > 0)
       |ORDER BY doc_id""".stripMargin

  /** Quality score from portable components: token count, unique-token
    * ratio, punctuation density, mean token length. All int/int or
    * int/len double divisions → bit-identical across engines.
    *
    * Hot path is fully codegen'd: word/char/punct counts come from the
    * single-pass [[graft.functions.TextCount]] expression (replacing
    * round 1's interpreted `aggregate` lambda and a per-row regex — the
    * 6 s hot spot of the bench). The tokenize array is only built once,
    * for the distinct-token ratio.
    */
  def qualityOn(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.TextCount
    df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("n_words", TextCount.column(col("text"), TextCount.Words).cast("int"))
      .filter(col("n_words") > 0)
      .withColumn("n_chars", length(col("text")))
      .withColumn("uniq_ratio",
        size(array_distinct(TextFns.tokenize(col("text")))).cast("double") / col("n_words"))
      .withColumn("punct_ratio",
        TextCount.column(col("text"), TextCount.Punct).cast("double") / col("n_chars"))
      .withColumn("mean_word_len",
        TextCount.column(col("text"), TextCount.NonWs).cast("double") / col("n_words"))
      .withColumn("quality_score",
        Cols.pround(col("uniq_ratio") * 0.5 + (lit(1.0) - col("punct_ratio")) * 0.3
          + least(col("mean_word_len") / 10.0, lit(1.0)) * 0.2, 6))
      .select(col("doc_id"), col("n_words"), col("n_chars"), col("uniq_ratio"),
        col("punct_ratio"), col("mean_word_len"), col("quality_score"))
  }

  /** text_quality testdata binding. */
  def quality(spark: SparkSession, sfDir: String): DataFrame =
    qualityOn(Tables.documents(spark, sfDir), "doc_id", "text").orderBy(col("doc_id"))

  def qualitySql: String =
    s"""SELECT doc_id, CAST(len(words) AS INTEGER) AS n_words, CAST(length(text) AS INTEGER) AS n_chars,
       | CAST(len(list_distinct(words)) AS DOUBLE) / len(words) AS uniq_ratio,
       | CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
       | CAST(list_reduce(list_prepend(0, list_transform(words, w -> length(w))), (a, b) -> a + b) AS DOUBLE) / len(words) AS mean_word_len,
       | floor(((CAST(len(list_distinct(words)) AS DOUBLE) / len(words)) * 0.5
       |   + (1.0 - CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) / length(text)) * 0.3
       |   + least((CAST(list_reduce(list_prepend(0, list_transform(words, w -> length(w))), (a, b) -> a + b) AS DOUBLE) / len(words)) / 10.0, 1.0) * 0.2) * 1000000.0 + 0.5) / 1000000.0 AS quality_score
       |FROM (SELECT doc_id, text, ${TextFns.tokenizeSql("text")} AS words FROM documents)
       |WHERE len(words) > 0 ORDER BY doc_id""".stripMargin

  /** Token counting: whitespace token count + BPE-ish regex token count
    * (letter runs / digit runs / single symbols).
    */
  def tokensOn(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      size(TextFns.tokenize(col(textCol))).as("n_ws_tokens"),
      regexp_count(lower(col(textCol)), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("int").as("n_bpe_tokens"),
      length(col(textCol)).as("n_chars"))

  /** text_tokens testdata binding. */
  def tokens(spark: SparkSession, sfDir: String): DataFrame =
    tokensOn(Tables.documents(spark, sfDir), "doc_id", "text").orderBy(col("doc_id"))

  def tokensSql: String =
    s"""SELECT doc_id, CAST(len(${TextFns.tokenizeSql("text")}) AS INTEGER) AS n_ws_tokens,
       | CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INTEGER) AS n_bpe_tokens,
       | CAST(length(text) AS INTEGER) AS n_chars
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Rolling polynomial document fingerprint over the normalized text:
    * two independent multipliers (31, 131 — both codegen'd
    * [[graft.functions.PolyCharFold]]) combined into a 62-bit value
    * (collision odds ~2^-62 per pair).
    */
  def fingerprintOn(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    df.withColumn("norm", norm)
      .withColumn("h1", TextFns.charFold(col("norm")))
      .withColumn("h2", graft.functions.PolyCharFold.column(col("norm"), 131L))
      .select(col(idCol).as("doc_id"), (col("h1") * 2147483648L + col("h2")).as("fp64"))
  }

  /** text_fingerprint testdata binding. */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    fingerprintOn(Tables.documents(spark, sfDir), "doc_id", "text").orderBy(col("doc_id"))

  def fingerprintSql: String = {
    val norm = raw"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
    val h2 = s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split(norm, ''), ch -> CAST(ascii(ch) AS BIGINT))), (acc, x) -> (acc * 131 + x) % ${TextFns.P})"
    s"""SELECT doc_id, h1 * 2147483648 + h2 AS fp64 FROM (
       | SELECT doc_id, ${TextFns.charFoldSql("norm")} AS h1, $h2 AS h2
       | FROM (SELECT doc_id, $norm AS norm FROM documents))
       |ORDER BY doc_id""".stripMargin
  }
}
