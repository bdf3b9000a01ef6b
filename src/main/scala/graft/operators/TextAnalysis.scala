package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    langidOn(Tables.documents(spark, sfDir), "doc_id", "text").transform(graft.util.Cols.verifySort(_, col("doc_id")))

  def langidSql: String =
    s"""SELECT doc_id, CAST(len(words) AS INTEGER) AS n_words, en_ratio,
       | CASE WHEN en_ratio >= 0.05 THEN 'en' ELSE 'unknown' END AS pred_lang
       |FROM (SELECT doc_id, words, ${TextFns.markerRatioSql("words")} AS en_ratio
       |      FROM (SELECT doc_id, ${TextFns.tokenizeSql("text")} AS words FROM documents)
       |      WHERE len(words) > 0)
       |ORDER BY doc_id""".stripMargin

  /** text_langid_eval — evaluation harness for the language-ID
    * heuristic: confusion counts of predicted vs LABELED language (the
    * `lang` column), the precision/recall raw material every classifier
    * in the pipeline needs. One agg over the scan; the confusion matrix
    * is |langs|² rows at any corpus size.
    */
  def langidEval(spark: SparkSession, sfDir: String): DataFrame =
    langidOn(Tables.documents(spark, sfDir), "doc_id", "text")
      .join(Tables.documents(spark, sfDir).select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang"))

  def langidEvalSql: String =
    s"""WITH p AS (SELECT doc_id,
       |  CASE WHEN ${TextFns.markerRatioSql(TextFns.tokenizeSql("text"))} >= 0.05
       |       THEN 'en' ELSE 'unknown' END AS pred_lang
       |  FROM documents WHERE len(${TextFns.tokenizeSql("text")}) > 0)
       |SELECT d.lang, p.pred_lang, count(*) AS n
       |FROM p JOIN documents d ON p.doc_id = d.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

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
    qualityOn(Tables.documents(spark, sfDir), "doc_id", "text").transform(graft.util.Cols.verifySort(_, col("doc_id")))

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

  /** The [[qualityOn]] combination score as an exact integer ppm —
    * floor(raw·10⁶ + ½) on the UNROUNDED combo, shared by
    * pipeline_token_budget's selection order (an integer sort key
    * cannot tie-break differently across engines the way a rounded
    * double could). `words` must be the [[TextFns.tokenize]] of
    * `text`.
    */
  def qualityPpm(text: Column, words: Column): Column = {
    import graft.functions.TextCount
    val nWords = TextCount.column(text, TextCount.Words).cast("double")
    val uniq = size(array_distinct(words)).cast("double") / nWords
    val punct = TextCount.column(text, TextCount.Punct).cast("double") / length(text)
    val mwl = TextCount.column(text, TextCount.NonWs).cast("double") / nWords
    floor((uniq * 0.5 + (lit(1.0) - punct) * 0.3
      + least(mwl / 10.0, lit(1.0)) * 0.2) * 1000000.0 + lit(0.5)).cast("long")
  }

  /** [[qualityPpm]]'s DuckDB mirror over aliases `text` and `words`. */
  def qualityPpmSql: String =
    "CAST(floor(((CAST(len(list_distinct(words)) AS DOUBLE) / len(words)) * 0.5" +
      " + (1.0 - CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) / length(text)) * 0.3" +
      " + least((CAST(list_reduce(list_prepend(0, list_transform(words, w -> length(w))), (a, b) -> a + b) AS DOUBLE) / len(words)) / 10.0, 1.0) * 0.2)" +
      " * 1000000.0 + 0.5) AS BIGINT)"

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
    tokensOn(Tables.documents(spark, sfDir), "doc_id", "text").transform(graft.util.Cols.verifySort(_, col("doc_id")))

  def tokensSql: String =
    s"""SELECT doc_id, CAST(len(${TextFns.tokenizeSql("text")}) AS INTEGER) AS n_ws_tokens,
       | CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INTEGER) AS n_bpe_tokens,
       | CAST(length(text) AS INTEGER) AS n_chars
       |FROM documents ORDER BY doc_id""".stripMargin

  /** TF-IDF keyword extraction: top-`k` terms per document scored by
    * tf · (N+1)/(df+1). The score is a pure integer-ratio double
    * (no log), so it is bit-identical across engines and fully
    * value-oracled; the ranking it induces is the same as classic
    * tf·idf for fixed tf. Shape at scale: one explode + two
    * aggregations (term frequencies re-aggregate to document
    * frequencies — the df agg rides the tf agg's shuffle), corpus size
    * joins in as a broadcast scalar, top-k per doc via window rank.
    */
  def tfidfOn(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(col(idCol).as("doc_id"), explode(TextFns.tokenize(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("dfreq"))
    val nDocs = df.agg(countDistinct(col(idCol)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        Cols.pround(col("tf").cast("double") * (col("n_docs") + 1) / (col("dfreq") + 1), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("term"), col("tf").cast("int").as("tf"),
        col("dfreq").cast("int").as("dfreq"), col("score"), col("rk"))
  }

  /** text_tfidf testdata binding (top-3 terms per doc). */
  def tfidf(spark: SparkSession, sfDir: String): DataFrame =
    tfidfOn(Tables.documents(spark, sfDir), "doc_id", "text").transform(graft.util.Cols.verifySort(_, col("doc_id"), col("rk")))

  def tfidfSql: String =
    s"""WITH tok AS (SELECT doc_id, unnest(${TextFns.tokenizeSql("text")}) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dfq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY 1),
       |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
       |s AS (SELECT doc_id, term, tf, dfreq,
       |        floor(CAST(tf AS DOUBLE) * (n_docs + 1) / (dfreq + 1) * 1000000.0 + 0.5) / 1000000.0 AS score
       |      FROM tf JOIN dfq USING (term) CROSS JOIN n),
       |r AS (SELECT s.*, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk FROM s)
       |SELECT doc_id, term, CAST(tf AS INTEGER) AS tf, CAST(dfreq AS INTEGER) AS dfreq, score, CAST(rk AS INTEGER) AS rk
       |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  /** Unigram-LM surprise scoring: per-document average Shannon surprise
    * under the corpus's own unigram distribution — the classic "is this
    * document typical or rare-token soup" quality signal (the cheap
    * stand-in for perplexity scoring where no external LM is
    * available). Surprise of a token with corpus count c out of T total
    * occurrences is log2(T/c) bits; to stay bit-identical across
    * engines (and overflow-free at any corpus size) it is quantized to
    * WHOLE bits via integer arithmetic: bits(t) = floor(log2(T div c))
    * = length(bin(T div c)) − 1 — no floating log anywhere, so the op
    * is fully value-oracled. Per doc: mean surprise (milli-bits),
    * rarest-token surprise, and hapax-occurrence count (tokens unique
    * in the corpus — the OCR-garbage/gibberish indicator).
    *
    * Shape at scale: one explode, (doc,term) tf agg, term-count agg
    * riding the tf shuffle, corpus total as a 1-row broadcast, per-doc
    * re-agg — the exact tfidf pipeline shape; every value bounded by
    * 63·n_tokens so no overflow envelope to document.
    */
  def surpriseOn(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df.select(col(idCol).as("doc_id"), explode(TextFns.tokenize(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val cnt = tf.groupBy(col("term")).agg(sum(col("tf")).as("cnt"))
    val tot = cnt.agg(sum(col("cnt")).as("total"))
    val perDoc = tf.join(cnt, Seq("term"))
      .crossJoin(broadcast(tot))
      .withColumn("bits", (length(bin(expr("total div cnt"))) - 1).cast("bigint"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("bits")).as("sum_bits"),
        max(col("bits")).as("max_surprise_bits"),
        sum(when(col("cnt") === 1, col("tf")).otherwise(0L)).as("n_hapax"))
      .select(col("doc_id"), col("n_tokens"),
        expr("(1000 * sum_bits) div n_tokens").as("avg_surprise_milli"),
        col("max_surprise_bits"), col("n_hapax"))
    df.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("avg_surprise_milli"), lit(0L)).as("avg_surprise_milli"),
        coalesce(col("max_surprise_bits"), lit(0L)).as("max_surprise_bits"),
        coalesce(col("n_hapax"), lit(0L)).as("n_hapax"))
  }

  /** text_surprise testdata binding. */
  def surprise(spark: SparkSession, sfDir: String): DataFrame =
    surpriseOn(Tables.documents(spark, sfDir), "doc_id", "text").transform(graft.util.Cols.verifySort(_, col("doc_id")))

  def surpriseSql: String =
    s"""WITH tok AS (SELECT doc_id, unnest(${TextFns.tokenizeSql("text")}) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |c AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1),
       |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
       |p AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
       |        CAST(sum(tf * (length(bin(total // cnt)) - 1)) AS BIGINT) AS sum_bits,
       |        CAST(max(length(bin(total // cnt)) - 1) AS BIGINT) AS max_surprise_bits,
       |        CAST(sum(CASE WHEN cnt = 1 THEN tf ELSE 0 END) AS BIGINT) AS n_hapax
       |      FROM tf JOIN c USING (term) CROSS JOIN t GROUP BY 1)
       |SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens,
       | coalesce((1000 * sum_bits) // n_tokens, 0) AS avg_surprise_milli,
       | coalesce(max_surprise_bits, 0) AS max_surprise_bits,
       | coalesce(n_hapax, 0) AS n_hapax
       |FROM documents d LEFT JOIN p USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Bigram-LM surprise — the second-order upgrade of [[surpriseOn]]:
    * a token's surprise is conditioned on its predecessor,
    * −log2 P(cur | prev) with P = C(prev,cur)/C(prev,·), quantized to
    * whole bits by the same integer-log2 device (C(prev,·) div
    * C(prev,cur) ≥ 1 always, since every bigram is one of its prefix's
    * continuations). Catches locally-incoherent text (word salad with
    * a plausible unigram mix) that unigram surprise scores as normal.
    * Shape: scan-side bigram explode (token array zipped with its own
    * tail — no window), bigram-count agg, context-count agg riding the
    * same shuffle, one corpus-keyed rejoin, per-doc re-agg.
    * Output: (doc_id, n_bigrams, avg_surprise_milli, max_surprise_bits).
    */
  def bigramSurpriseOn(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bi = df.select(col(idCol).as("doc_id"), TextFns.tokenize(col(textCol)).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => struct(a.as("prev"), b.as("cur")))).as("p"))
      .select(col("doc_id"), col("p.prev").as("prev"), col("p.cur").as("cur"))
    val c2 = bi.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(col("prev")).agg(sum(col("c2")).as("c1"))
    val perDoc = bi.join(c2, Seq("prev", "cur")).join(c1, Seq("prev"))
      .withColumn("bits", (length(bin(expr("c1 div c2"))) - 1).cast("bigint"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("bits")).as("sum_bits"),
        max(col("bits")).as("max_surprise_bits"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("(1000 * sum_bits) div n_bigrams").as("avg_surprise_milli"),
        col("max_surprise_bits"))
    df.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_surprise_milli"), lit(0L)).as("avg_surprise_milli"),
        coalesce(col("max_surprise_bits"), lit(0L)).as("max_surprise_bits"))
  }

  /** text_bigram_surprise testdata binding. */
  def bigramSurprise(spark: SparkSession, sfDir: String): DataFrame =
    bigramSurpriseOn(Tables.documents(spark, sfDir), "doc_id", "text")
      .transform(graft.util.Cols.verifySort(_, col("doc_id")))

  def bigramSurpriseSql: String =
    s"""WITH t AS (SELECT doc_id, ${TextFns.tokenizeSql("text")} AS w FROM documents),
       |bi AS (SELECT doc_id, w[i] AS prev, w[i + 1] AS cur
       |       FROM t, unnest(generate_series(1, len(w) - 1)) AS u(i)
       |       WHERE len(w) >= 2),
       |c2 AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS c2 FROM bi GROUP BY 1, 2),
       |c1 AS (SELECT prev, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
       |p AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |       CAST(sum(length(bin(c1 // c2)) - 1) AS BIGINT) AS sum_bits,
       |       CAST(max(length(bin(c1 // c2)) - 1) AS BIGINT) AS max_surprise_bits
       |      FROM bi JOIN c2 USING (prev, cur) JOIN c1 USING (prev)
       |      GROUP BY 1)
       |SELECT d.doc_id, coalesce(n_bigrams, 0) AS n_bigrams,
       | coalesce((1000 * sum_bits) // n_bigrams, 0) AS avg_surprise_milli,
       | coalesce(max_surprise_bits, 0) AS max_surprise_bits
       |FROM documents d LEFT JOIN p USING (doc_id) ORDER BY doc_id""".stripMargin

  /** PII patterns shared by the Spark and oracle forms — conservative
    * RE2-and-Java-compatible syntax (no lookaround, dash last in
    * classes). Scrub order is email → url → phone (a url may contain an
    * email-shaped substring; scrubbing emails first keeps the counts
    * and the replacements consistent).
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val PhoneRe = "\\+?[0-9][0-9() -]{7,}[0-9]"

  /** PII scrub: redact emails / urls / phone-shaped digit runs from the
    * lowercased text, reporting per-document counts and the scrubbed
    * length. All scan-side regexp expressions (codegen'd) — at corpus
    * scale this runs at parquet read speed, the shape of a
    * pre-training privacy pass.
    */
  def scrubOn(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = lower(col(textCol))
    val scrubbed = regexp_replace(regexp_replace(regexp_replace(t,
      EmailRe, "<email>"), UrlRe, "<url>"), PhoneRe, "<phone>")
    df.select(
      col(idCol).as("doc_id"),
      regexp_count(t, lit(EmailRe)).cast("int").as("n_emails"),
      regexp_count(t, lit(UrlRe)).cast("int").as("n_urls"),
      regexp_count(t, lit(PhoneRe)).cast("int").as("n_phones"),
      length(scrubbed).as("scrubbed_len"))
  }

  /** text_scrub testdata binding. */
  def scrub(spark: SparkSession, sfDir: String): DataFrame =
    scrubOn(Tables.documents(spark, sfDir), "doc_id", "text").transform(graft.util.Cols.verifySort(_, col("doc_id")))

  def scrubSql: String = {
    val t = "lower(text)"
    val scrubbed = s"regexp_replace(regexp_replace(regexp_replace($t, " +
      s"'$EmailRe', '<email>', 'g'), '$UrlRe', '<url>', 'g'), '$PhoneRe', '<phone>', 'g')"
    s"""SELECT doc_id,
       | CAST(len(regexp_extract_all($t, '$EmailRe')) AS INTEGER) AS n_emails,
       | CAST(len(regexp_extract_all($t, '$UrlRe')) AS INTEGER) AS n_urls,
       | CAST(len(regexp_extract_all($t, '$PhoneRe')) AS INTEGER) AS n_phones,
       | CAST(length($scrubbed) AS INTEGER) AS scrubbed_len
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** text_heavy_hitters — frequent-token sketch: approx_top_k over the
    * exploded token stream next to the exact token count. The sketch
    * state is fixed-size and MERGEABLE, so at 100 TB the corpus-wide
    * top-k costs one map-side-combined pass instead of a full
    * token-frequency shuffle + global sort — the vocabulary/stopword
    * profiling step of a corpus pipeline. Sketch internals are
    * engine-specific → rows-only; the spec pins every reported count
    * to the exact per-token count. The sketch's struct array is
    * exploded to one scalar row per hitter: round 2 returned the raw
    * array<struct> column and the driver's pandas row-sort crashed on
    * it (ndarray is unhashable) — verify outputs must be scalar-typed.
    */
  def heavyHitters(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(TextFns.tokenize(col("text"))).as("w"))
      .agg(expr(s"approx_top_k(w, $k, 65536)").as("tw"),
        count(lit(1)).as("n_tokens"))
      .select(posexplode(col("tw")).as(Seq("rank", "e")), col("n_tokens"))
      .select(col("rank").cast("int").as("rank"),
        col("e.item").as("w"), col("e.count").as("approx_cnt"), col("n_tokens"))

  /** text_length_profile — the sequence-length distribution report every
    * training-data card carries: per source, doc count and exact
    * interpolated p50/p90 token counts plus the mean. Token counts are
    * the codegen'd [[graft.functions.TextCount]]; one aggregation keyed
    * by source (exact percentiles sort per group — with billions of
    * docs per source swap in approx_percentile, same shape).
    */
  def lengthProfile(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("source"),
        graft.functions.TextCount.column(col("text"), graft.functions.TextCount.Words)
          .as("tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        Cols.pround(expr("percentile(tokens, 0.5)"), 4).as("p50_tokens"),
        Cols.pround(expr("percentile(tokens, 0.9)"), 4).as("p90_tokens"),
        Cols.pround(avg(col("tokens")), 6).as("mean_tokens"))
      .orderBy(col("source"))

  def lengthProfileSql: String =
    s"""SELECT source, count(*) AS n_docs,
       | ${Cols.proundSql("quantile_cont(tokens, 0.5)", 4)} AS p50_tokens,
       | ${Cols.proundSql("quantile_cont(tokens, 0.9)", 4)} AS p90_tokens,
       | ${Cols.proundSql("avg(tokens)", 6)} AS mean_tokens
       |FROM (SELECT source, CAST(len(${TextFns.tokenizeSql("text")}) AS BIGINT) AS tokens
       |      FROM documents)
       |GROUP BY 1 ORDER BY source""".stripMargin

  /** Winnowing window width (fingerprints guarantee detection of any
    * shared run of ≥ WinnowW + 2 tokens: W consecutive 3-gram windows).
    */
  val WinnowW = 4

  /** text_winnow — winnowing document fingerprints (the MOSS algorithm):
    * over the POSITION-PRESERVING 3-gram hash sequence, keep the
    * minimum hash of every width-W sliding window; the distinct minima
    * are the doc's fingerprint set. Unlike sampling "every Nth hash",
    * winnowing guarantees any two docs sharing a run of ≥ W+2 tokens
    * share a fingerprint — the plagiarism/attribution primitive.
    * Entirely scan-side (nested HOFs over the token-hash array, no
    * shuffle until the per-doc distinct), output exploded to scalar
    * (doc_id, fp) rows.
    */
  def winnowOn(df: DataFrame, idCol: String, textCol: String,
      w: Int = WinnowW): DataFrame =
    df.select(col(idCol).as("doc_id"),
        TextFns.orderedShingleHashes(TextFns.tokenize(col(textCol))).as("kg"))
      .filter(size(col("kg")) >= w)
      // window minima from the fused O(n) codegen WinnowMins (monotonic
      // deque) instead of n interpreted array_min(slice(...)) lambda
      // dispatches; same value SET, so the oracle is unchanged
      .select(col("doc_id"),
        explode(graft.functions.WinnowMins.column(col("kg"), w)).as("fp"))

  /** text_winnow testdata binding. */
  def winnow(spark: SparkSession, sfDir: String): DataFrame =
    winnowOn(Tables.documents(spark, sfDir), "doc_id", "text")
      .transform(graft.util.Cols.verifySort(_, col("doc_id"), col("fp")))

  def winnowSql: String = {
    val w = WinnowW
    s"""WITH kgs AS (SELECT doc_id, ${TextFns.orderedShingleHashesSql(TextFns.tokenizeSql("text"))} AS kg FROM documents)
       |SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(kg) - ${w - 1}),
       |  p -> list_min(kg[p : p + ${w - 1}])))) AS fp
       |FROM kgs WHERE len(kg) >= $w
       |ORDER BY doc_id, fp""".stripMargin
  }

  /** text_vocab_coverage — vocabulary coverage profile: the top-K corpus
    * tokens by frequency with their cumulative share of all token
    * occurrences (the "how big must the vocab be" question of tokenizer
    * design). The corpus-sized stages are the two count aggregations;
    * ranking happens on the AGGREGATED vocabulary via a global top-K
    * (TakeOrdered — never a full sort), and the running share windows
    * over only those K rows. Ratios are exact rationals.
    */
  def vocabCoverageOn(df: DataFrame, idCol: String, textCol: String,
      k: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(explode(TextFns.tokenize(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    val top = counts.orderBy(col("cnt").desc, col("w")).limit(k)
    val win = Window.orderBy(col("cnt").desc, col("w"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(total)
      .withColumn("rank", row_number().over(Window.orderBy(col("cnt").desc, col("w"))))
      .withColumn("cum_share", Cols.pround(sum(col("cnt")).over(win).cast("double") / col("total"), 6))
      .select(col("rank"), col("w"), col("cnt"), col("total").as("total_tokens"), col("cum_share"))
  }

  /** text_vocab_coverage testdata binding. */
  def vocabCoverage(spark: SparkSession, sfDir: String): DataFrame =
    vocabCoverageOn(Tables.documents(spark, sfDir), "doc_id", "text")
      .orderBy(col("rank"))

  def vocabCoverageSql: String =
    s"""WITH c AS (SELECT w, count(*) AS cnt
       |           FROM (SELECT unnest(${TextFns.tokenizeSql("text")}) AS w FROM documents)
       |           GROUP BY 1),
       |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_tokens FROM c),
       |top AS (SELECT w, cnt FROM c ORDER BY cnt DESC, w LIMIT 100)
       |SELECT CAST(row_number() OVER o AS INTEGER) AS rank, w, cnt, total_tokens,
       | ${Cols.proundSql("CAST(sum(cnt) OVER (ORDER BY cnt DESC, w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / total_tokens", 6)} AS cum_share
       |FROM top, t
       |WINDOW o AS (ORDER BY cnt DESC, w)
       |ORDER BY rank""".stripMargin

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
    fingerprintOn(Tables.documents(spark, sfDir), "doc_id", "text").transform(graft.util.Cols.verifySort(_, col("doc_id")))

  def fingerprintSql: String = {
    val norm = raw"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
    val h2 = s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split(norm, ''), ch -> CAST(ascii(ch) AS BIGINT))), (acc, x) -> (acc * 131 + x) % ${TextFns.P})"
    s"""SELECT doc_id, h1 * 2147483648 + h2 AS fp64 FROM (
       | SELECT doc_id, ${TextFns.charFoldSql("norm")} AS h1, $h2 AS h2
       | FROM (SELECT doc_id, $norm AS norm FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  /** Fixed query-term set for the text_bm25 binding — common corpus
    * vocabulary so every SF has hits.
    */
  val Bm25Terms = Seq("spark", "join", "window")

  /** BM25 relevance search (k1 = 1.2, b = 0.75) for a fixed query-term
    * set: top-`k` documents by summed per-term BM25. Uses the
    * RATIONAL-idf BM25 variant — idf = (N − df + 0.5)/(df + 0.5)
    * without the log — a monotone transform of Robertson idf chosen so
    * every score derives from exact integer counts through one fixed
    * expression tree (bit-identical across engines; ln() is
    * implementation-defined in the last ulp). Per-term scores quantize
    * to integer MICROPOINTS before the per-doc sum, so the aggregate is
    * exact and summation-order-free — the same order-independence trick
    * as embed_class_centroid. Shape: one token explode + three
    * aggregations; the (term-filtered) tf frame is tiny, corpus stats
    * are a 1-row broadcast; the final top-k is a sort of per-DOC rows
    * only. N and avgdl are measured over docs with ≥ 1 token.
    * Output: (doc_id, n_terms, bm25_micros), top k by score.
    */
  def bm25On(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int = 10): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"),
      explode(TextFns.tokenize(col(textCol))).as("term"))
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(sum(col("dl")).as("sum_dl"), count(lit(1)).as("n_docs"))
    val tf = tok.filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("dfreq"))
    val idf = ((col("n_docs") - col("dfreq")).cast("double") + lit(0.5)) /
      (col("dfreq").cast("double") + lit(0.5))
    val ratio = col("dl").cast("double") * col("n_docs").cast("double") /
      col("sum_dl").cast("double")
    val score = idf * ((col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) * ratio)))
    tf.join(dfreq, Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("micros", floor(score * lit(1000000.0) + lit(0.5)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_terms"), sum(col("micros")).as("bm25_micros"))
      .orderBy(col("bm25_micros").desc, col("doc_id"))
      .limit(k)
  }

  /** text_bm25 testdata binding. */
  def bm25(spark: SparkSession, sfDir: String): DataFrame =
    bm25On(Tables.documents(spark, sfDir), "doc_id", "text", Bm25Terms)

  def bm25Sql: String = {
    val termList = Bm25Terms.map(t => s"'$t'").mkString("(", ", ", ")")
    s"""WITH tok AS (SELECT doc_id, unnest(${TextFns.tokenizeSql("text")}) AS term FROM documents),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
       |stats AS (SELECT sum(dl) AS sum_dl, count(*) AS n_docs FROM dl),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok WHERE term IN $termList GROUP BY 1, 2),
       |dfq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY 1),
       |s AS (SELECT tf.doc_id,
       |  CAST(floor(
       |    ((CAST(n_docs - dfreq AS DOUBLE) + CAST(0.5 AS DOUBLE)) / (CAST(dfreq AS DOUBLE) + CAST(0.5 AS DOUBLE)))
       |    * ((CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE)) /
       |       (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) *
       |        (CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE)))))
       |    * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS micros
       | FROM tf JOIN dfq USING (term) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats)
       |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_terms, CAST(sum(micros) AS BIGINT) AS bm25_micros
       |FROM s GROUP BY doc_id ORDER BY bm25_micros DESC, doc_id LIMIT 10""".stripMargin
  }

  /** text_bpe_pairs — the counting step of one BPE-training iteration:
    * corpus-wide adjacent-token-pair frequencies, the top `k` merge
    * candidates with a deterministic tie-break (count desc, then pair
    * asc — an engine-defined tie order would make the merge table
    * irreproducible). Pairs derive SCAN-SIDE by zipping the token array
    * with its own tail — no window pass, no per-token shuffle; the only
    * shuffle is the (pair → count) aggregate, map-side combined, whose
    * state is bounded by the pair VOCABULARY, not the corpus; the final
    * top-k plans as TakeOrdered over the aggregate output (never a full
    * sort). This is the building block a distributed BPE trainer runs
    * per merge round at 100 TB.
    * Output: (rank, pair, n).
    */
  def bpePairsOn(df: DataFrame, textCol: String, k: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = df
      .select(TextFns.tokenize(col(textCol)).as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => concat_ws(" ", a, b))).as("pair"))
    pairs.groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("pair"))))
      .select(col("rank"), col("pair"), col("n"))
  }

  /** text_bpe_pairs testdata binding. */
  def bpePairs(spark: SparkSession, sfDir: String): DataFrame =
    bpePairsOn(Tables.documents(spark, sfDir), "text").orderBy(col("rank"))

  /** Per-document n-gram NOVELTY — the memorization/duplication risk
    * signal of a training corpus read per document: of a doc's distinct
    * 3-shingles, what fraction appears in NO other document
    * (corpus-wide document frequency 1). Low novelty marks templated /
    * heavily-duplicated docs even when no single pair crosses a
    * near-dup threshold; high novelty marks unique content worth
    * upsampling. Shape: shingles hash scan-side (the shared codegen
    * poly-hash, so the shuffle carries slim (doc, long) rows, never
    * n-gram strings), one df aggregation keyed on the shingle hash, one
    * join back on the same key, one doc-keyed count — all map-side
    * combinable, no stage state beyond (doc, shingle) cardinality.
    * Docs with < 3 tokens have no shingles and drop out (mirrored by
    * the oracle's join semantics).
    * Output: (doc_id, n_shingles, n_novel, novelty).
    */
  def noveltyOn(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val e = df.select(col(idCol).as("doc_id"),
        TextFns.shingleHashes(TextFns.tokenize(col(textCol))).as("h"))
      .select(col("doc_id"), explode(col("h")).as("x"))
      .transform(graft.util.CacheScope.cached) // read by the df agg AND the per-doc rollup
    val dfreq = e.groupBy(col("x")).agg(count(lit(1)).as("dfreq"))
    e.join(dfreq, Seq("x"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        count_if(col("dfreq") === 1).as("n_novel"))
      .withColumn("novelty",
        Cols.pround(col("n_novel").cast("double") / col("n_shingles"), 6))
  }

  /** text_novelty testdata binding. */
  def novelty(spark: SparkSession, sfDir: String): DataFrame =
    noveltyOn(Tables.documents(spark, sfDir), "doc_id", "text")
      .transform(graft.util.Cols.verifySort(_, col("doc_id")))

  def noveltySql: String =
    s"""WITH t AS (
       | SELECT doc_id, ${TextFns.shingleHashesSql("words")} AS h
       | FROM (SELECT doc_id, ${TextFns.tokenizeSql("text")} AS words FROM documents)),
       |e AS (SELECT doc_id, unnest(h) AS x FROM t),
       |d AS (SELECT x, count(*) AS dfreq FROM e GROUP BY 1)
       |SELECT doc_id, count(*) AS n_shingles,
       | count(CASE WHEN dfreq = 1 THEN 1 END) AS n_novel,
       | ${Cols.proundSql("CAST(count(CASE WHEN dfreq = 1 THEN 1 END) AS DOUBLE) / count(*)", 6)} AS novelty
       |FROM e JOIN d ON e.x = d.x GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  def bpePairsSql: String =
    s"""WITH t AS (SELECT ${TextFns.tokenizeSql("text")} AS w FROM documents),
       |p AS (SELECT w[i] || ' ' || w[i + 1] AS pair
       |      FROM t, unnest(generate_series(1, len(w) - 1)) AS u(i)
       |      WHERE len(w) >= 2),
       |c AS (SELECT pair, count(*) AS n FROM p GROUP BY 1
       |      ORDER BY n DESC, pair LIMIT 50)
       |SELECT CAST(row_number() OVER (ORDER BY n DESC, pair) AS INTEGER) AS rank,
       | pair, n
       |FROM c ORDER BY rank""".stripMargin

  /** Merge rounds for [[bpeTrainOn]] — bounded so the unrolled DuckDB
    * oracle stays tractable; a production vocabulary run raises it.
    */
  val BpeTrainRounds = 4

  /** text_bpe_train — the ITERATIVE BPE trainer over the per-round
    * counting primitive ([[bpePairsOn]]): `rounds` greedy merge rounds,
    * each one (1) counting corpus-wide adjacent symbol pairs, (2)
    * electing the top pair (count desc, then (s1, s2) asc — the
    * deterministic tie-break every reproducible merge table needs),
    * and (3) applying the merge LEFTMOST-FIRST, NON-OVERLAPPING to
    * every document via the codegen scan-side
    * [[graft.functions.BpeMergeApply]] (Sennrich et al. 2016's
    * training loop, word-level symbols standing in for the usual
    * character alphabet). The merge decision each round compares whole
    * array ELEMENTS — never the space-joined display strings, which
    * become ambiguous once merged symbols nest.
    *
    * Scale shape: per round, ONE map-side-combinable (s1, s2) count
    * shuffle whose state is the pair vocabulary (corpus-independent),
    * one single-row driver read (the elected merge is a scalar/round —
    * the sanctioned fixpoint pattern), and one zero-shuffle scan
    * applying it; each round ends in an eager `localCheckpoint` so the
    * iteration's lineage stays flat. A 100 TB trainer runs this on the
    * standard held-out sample, not the raw corpus — the loop's cost is
    * rounds × (count shuffle + corpus materialization).
    * Output: (round, s1, s2, pair, n) — the learned merge table.
    */
  def bpeTrainOn(df: DataFrame, textCol: String,
      rounds: Int = BpeTrainRounds): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    var sym = df.select(TextFns.tokenize(col(textCol)).as("w"))
      .filter(size(col("w")) >= 1)
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = sym.filter(size(col("w")) >= 2)
        .select(explode(zip_with(
          slice(col("w"), lit(1), size(col("w")) - 1),
          slice(col("w"), lit(2), size(col("w")) - 1),
          (x, y) => struct(x.as("s1"), y.as("s2")))).as("p"))
        .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("s1"), col("s2"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (s1, s2, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, s1, s2, n))
        sym = sym
          .select(graft.functions.BpeMergeApply.column(col("w"), s1, s2).as("w"))
          .localCheckpoint(true)
        r += 1
      }
    }
    merges.toSeq.toDF("round", "s1", "s2", "n")
      .select(col("round"), col("s1"), col("s2"),
        concat_ws(" ", col("s1"), col("s2")).as("pair"), col("n"))
  }

  /** text_bpe_train testdata binding. */
  def bpeTrain(spark: SparkSession, sfDir: String): DataFrame =
    bpeTrainOn(Tables.documents(spark, sfDir), "text").orderBy(col("round"))

  /** Bounded-unroll oracle: each round counts pairs, elects the top
    * merge, and applies it POSITIONALLY — match islands per doc, merge
    * at even offsets within each island — which equals the Spark
    * side's leftmost-first greedy walk (a >1-length island only arises
    * for an (x, x) merge over a run of x's, where leftmost-first
    * consumes exactly the even offsets).
    */
  def bpeTrainSql: String = {
    s"""WITH $bpeTrainCtes
       |SELECT CAST(round AS INTEGER) AS round, s1, s2,
       | s1 || ' ' || s2 AS pair, CAST(n AS BIGINT) AS n
       |FROM (${(1 to BpeTrainRounds)
        .map(r => s"SELECT $r AS round, s1, s2, n FROM m$r").mkString(" UNION ALL ")})
       |ORDER BY round""".stripMargin
  }

  /** The trainer's round CTEs as a reusable WITH body — `s0` (tokenized
    * docs) through `s$BpeTrainRounds` (post-merge symbols) and the
    * per-round elected merges `m1..mR`; shared by [[bpeTrainSql]] and
    * [[bpeApplySql]].
    */
  private def bpeTrainCtes: String = {
    val rounds = (1 to BpeTrainRounds).map { r =>
      val p = r - 1
      s"""p$r AS (SELECT w[i] AS s1, w[i + 1] AS s2, count(*) AS n
         |      FROM s$p, unnest(generate_series(1, len(w) - 1)) AS u(i)
         |      WHERE len(w) >= 2 GROUP BY 1, 2),
         |m$r AS MATERIALIZED (SELECT s1, s2, n FROM p$r ORDER BY n DESC, s1, s2 LIMIT 1),
         |x$r AS (SELECT doc_id, i, w[i] AS t, w[i + 1] AS nxt
         |      FROM s$p, unnest(generate_series(1, len(w))) AS u(i)),
         |mm$r AS (SELECT x.doc_id, x.i FROM x$r x, m$r m
         |      WHERE x.t = m.s1 AND x.nxt = m.s2),
         |g$r AS (SELECT doc_id, i,
         |        i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
         |      FROM mm$r),
         |sel$r AS (SELECT doc_id, i FROM (
         |      SELECT doc_id, i, min(i) OVER (PARTITION BY doc_id, grp) AS i0 FROM g$r)
         |      WHERE (i - i0) % 2 = 0),
         |s$r AS MATERIALIZED (
         |  SELECT x.doc_id,
         |    list(CASE WHEN sh.i IS NOT NULL THEN x.t || ' ' || x.nxt ELSE x.t END
         |         ORDER BY x.i) AS w
         |  FROM x$r x
         |  LEFT JOIN sel$r sh ON x.doc_id = sh.doc_id AND x.i = sh.i
         |  LEFT JOIN sel$r sc ON x.doc_id = sc.doc_id AND x.i = sc.i + 1
         |  WHERE sc.i IS NULL
         |  GROUP BY x.doc_id)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""s0 AS MATERIALIZED (SELECT doc_id, w FROM (
       | SELECT doc_id, ${TextFns.tokenizeSql("text")} AS w FROM documents)
       | WHERE len(w) >= 1)$rounds""".stripMargin
  }

  /** text_bpe_apply — the trained merge table APPLIED back to the
    * corpus (the tokenizer-deployment half of the BPE pair: train
    * elects merges, apply consumes them): the [[bpeTrainOn]] merge
    * sequence folds over every document as chained codegen
    * [[graft.functions.BpeMergeApply]] passes (k literal merges — one
    * zero-shuffle scan, whole-stage codegen'd), reporting per doc the
    * raw token count, the post-merge symbol count, and the tokens
    * saved — the compression the learned vocabulary buys, which is
    * the number a tokenizer rollout is judged on. The oracle replays
    * the same rounds positionally and diffs s0 against s_k.
    * Output: (doc_id, n_tokens, n_symbols, n_saved).
    */
  def bpeApplyOn(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val toks = TextFns.tokenize(col(textCol))
    val applied = merges.foldLeft(toks) { case (c, (a, b)) =>
      graft.functions.BpeMergeApply.column(c, a, b)
    }
    df.select(col(idCol).as("doc_id"), toks.as("w0"), applied.as("wk"))
      .filter(size(col("w0")) >= 1)
      .select(col("doc_id"),
        size(col("w0")).cast("long").as("n_tokens"),
        size(col("wk")).cast("long").as("n_symbols"))
      .withColumn("n_saved", col("n_tokens") - col("n_symbols"))
  }

  /** text_bpe_apply testdata binding: merges from the trainer on the
    * same corpus (one scalar-table driver read — the artifact hand-off
    * a deployed tokenizer does once).
    */
  def bpeApply(spark: SparkSession, sfDir: String): DataFrame = {
    val merges = bpeTrain(spark, sfDir).collect()
      .map(r => (r.getAs[String]("s1"), r.getAs[String]("s2"))).toSeq
    bpeApplyOn(Tables.documents(spark, sfDir), "doc_id", "text", merges)
      .transform(graft.util.Cols.verifySort(_, col("doc_id")))
  }

  def bpeApplySql: String =
    s"""WITH $bpeTrainCtes
       |SELECT a.doc_id, CAST(len(a.w) AS BIGINT) AS n_tokens,
       | CAST(len(b.w) AS BIGINT) AS n_symbols,
       | CAST(len(a.w) - len(b.w) AS BIGINT) AS n_saved
       |FROM s0 a JOIN s$BpeTrainRounds b ON a.doc_id = b.doc_id
       |ORDER BY a.doc_id""".stripMargin

  /** Longest run of equal ADJACENT elements in a string array — a
    * scan-side fold (state: previous element, current run, best run).
    * On a SORTED array this is the count of the most frequent element,
    * which is how [[repetitionOn]] gets per-gram mode counts without a
    * (doc, gram) aggregation shuffle. Empty/absent arrays fold to 0.
    */
  private def maxAdjRunExpr(arr: String): String =
    s"""aggregate($arr,
       |  named_struct('prev', CAST(NULL AS STRING), 'cur', 0, 'best', 0),
       |  (s, x) -> named_struct(
       |    'prev', x,
       |    'cur',  CASE WHEN s.prev <=> x THEN s.cur + 1 ELSE 1 END,
       |    'best', GREATEST(s.best, CASE WHEN s.prev <=> x THEN s.cur + 1 ELSE 1 END)),
       |  s -> s.best)""".stripMargin

  /** Count of positions in a SORTED string array whose value occurs more
    * than once: total length minus the singletons (elements equal to
    * neither sorted neighbor). Pure index arithmetic over the array —
    * no shuffle, no per-gram state.
    */
  private def dupPositionsExpr(arr: String): String =
    s"size($arr) - size(filter(transform($arr, (x, i) -> i), i -> " +
      s"(i = 0 OR element_at($arr, i) <> element_at($arr, i + 1)) AND " +
      s"(i = size($arr) - 1 OR element_at($arr, i + 2) <> element_at($arr, i + 1))))"

  /** text_repetition — Gopher-style within-document repetition signals
    * (the quality rules that catch boilerplate/spam the length and
    * stopword heuristics miss), adapted to token n-grams for a
    * newline-free corpus: the count of the most frequent token bigram,
    * the number of trigram positions inside duplicated trigrams, and the
    * longest same-token run. All EXACT integers — no ratios, so the
    * value oracle is trivial and downstream thresholds stay
    * engine-independent. Shape: pure scan-side HOFs over the token
    * array, zero shuffles — a repetition signal is a function of ONE
    * document, so nothing should ever leave the scan task. Bigram /
    * trigram arrays come from zipping the array with its own tail (the
    * [[bpePairsOn]] pattern); `array_sort` makes equal grams adjacent,
    * turning "most frequent gram" and "positions in duplicated grams"
    * into adjacent-run folds ([[maxAdjRunExpr]] / [[dupPositionsExpr]]).
    * Per-row cost is O(len · log len) in the doc's own length — at
    * 100 TB this is embarrassingly parallel with no stage state at all
    * (the prior window form shuffled every TOKEN of the corpus on
    * (doc, pos) three times).
    * Output: (doc_id, n_tokens, top_bigram_n, dup_trigram_n, max_run).
    */
  def repetitionOn(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), TextFns.tokenize(col(textCol)).as("w"))
      .withColumn("bgs", expr(
        "array_sort(zip_with(slice(w, 1, greatest(size(w) - 1, 0)), " +
          "slice(w, 2, greatest(size(w) - 1, 0)), (a, b) -> concat(a, ' ', b)))"))
      .withColumn("tgs", expr(
        "array_sort(zip_with(zip_with(slice(w, 1, greatest(size(w) - 2, 0)), " +
          "slice(w, 2, greatest(size(w) - 2, 0)), (a, b) -> concat(a, ' ', b)), " +
          "slice(w, 3, greatest(size(w) - 2, 0)), (p, c) -> concat(p, ' ', c)))"))
      .select(col("doc_id"), size(col("w")).as("n_tokens"),
        expr(maxAdjRunExpr("bgs")).as("top_bigram_n"),
        expr(dupPositionsExpr("tgs")).as("dup_trigram_n"),
        expr(maxAdjRunExpr("w")).as("max_run"))

  /** text_repetition testdata binding. */
  def repetition(spark: SparkSession, sfDir: String): DataFrame =
    repetitionOn(Tables.documents(spark, sfDir), "doc_id", "text")
      .transform(graft.util.Cols.verifySort(_, col("doc_id")))

  def repetitionSql: String =
    s"""WITH t AS (SELECT doc_id, ${TextFns.tokenizeSql("text")} AS w FROM documents),
       |tok AS (SELECT doc_id, i AS pos, w[i] AS tk
       |        FROM t, unnest(generate_series(1, len(w))) AS u(i) WHERE len(w) > 0),
       |seqd AS (SELECT doc_id, pos, tk,
       |   lead(tk, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt,
       |   lead(tk, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt2,
       |   CASE WHEN lag(tk, 1) OVER (PARTITION BY doc_id ORDER BY pos) IS DISTINCT FROM tk
       |        THEN 1 ELSE 0 END AS newrun
       | FROM tok),
       |rid AS (SELECT *, sum(newrun) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id FROM seqd),
       |bg AS (SELECT doc_id, max(c) AS top_bigram_n FROM (
       |   SELECT doc_id, tk || ' ' || nxt AS g, count(*) AS c
       |   FROM seqd WHERE nxt IS NOT NULL GROUP BY 1, 2) GROUP BY 1),
       |tg AS (SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_trigram_n FROM (
       |   SELECT doc_id, tk || ' ' || nxt || ' ' || nxt2 AS g, count(*) AS c
       |   FROM seqd WHERE nxt2 IS NOT NULL GROUP BY 1, 2) GROUP BY 1),
       |rn AS (SELECT doc_id, max(rl) AS max_run FROM (
       |   SELECT doc_id, run_id, count(*) AS rl FROM rid GROUP BY 1, 2) GROUP BY 1)
       |SELECT t.doc_id, CAST(len(w) AS INTEGER) AS n_tokens,
       |  CAST(coalesce(top_bigram_n, 0) AS INTEGER) AS top_bigram_n,
       |  CAST(coalesce(dup_trigram_n, 0) AS INTEGER) AS dup_trigram_n,
       |  CAST(coalesce(max_run, 0) AS INTEGER) AS max_run
       |FROM t LEFT JOIN bg USING (doc_id) LEFT JOIN tg USING (doc_id) LEFT JOIN rn USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** RAKE phrase-length cap and per-doc output width. */
  val RakeMaxPhrase = 3
  val RakeTopK = 3

  /** text_keyphrases — RAKE keyword extraction (Rose et al. 2010, the
    * public rapid-automatic-keyword-extraction recipe): stopwords
    * delimit candidate phrases (maximal runs of ≤ [[RakeMaxPhrase]]
    * non-stopword tokens, the library's EnMarkers family standing in
    * for a full stopword list); within each DOCUMENT every phrase word
    * w gets freq(w) = its occurrence count and deg(w) = Σ of the
    * lengths of the phrases it appears in, and a phrase scores
    * Σ_w (1000·deg(w)) div freq(w) — integer milli-units, positive
    * everywhere, so `div` ≡ `//` and the whole operator value-oracles
    * exactly. Top-[[RakeTopK]] distinct phrases per doc.
    *
    * Shape at scale: one token explode, then every window and both
    * aggregations partition on doc_id — a single document-key shuffle
    * end to end (RAKE statistics are per-document by definition), so
    * the operator scales exactly like the corpus scan that feeds it.
    * Output: (doc_id, phrase, n_words, score_milli, rk).
    */
  def keyphrasesOn(df: DataFrame, idCol: String, textCol: String,
      k: Int = RakeTopK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stops = TextFns.EnMarkers.map(m => s"'$m'").mkString("(", ", ", ")")
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val toks = df
      .select(col(idCol).as("doc_id"), posexplode(TextFns.tokenize(col(textCol))).as(Seq("pos", "w")))
      .withColumn("stop", expr(s"CASE WHEN w IN $stops THEN 1 ELSE 0 END"))
      .withColumn("phrase_id",
        sum(col("stop")).over(byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("stop") === 0)
    val phrases = toks
      .groupBy(col("doc_id"), col("phrase_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("w")))).as("ws"))
      .filter(size(col("ws")) <= RakeMaxPhrase)
      .select(col("doc_id"), col("phrase_id"),
        expr("array_join(transform(ws, s -> s.w), ' ')").as("phrase"),
        size(col("ws")).as("n_words"))
      .transform(graft.util.CacheScope.cached) // read by word stats AND the final score join
    val wordStats = phrases
      .select(col("doc_id"), col("n_words"), explode(split(col("phrase"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("n_words")).as("deg"))
      .withColumn("wscore", expr("(1000 * deg) div freq"))
    // score each phrase INSTANCE (sum of its words' scores, words
    // counted with multiplicity), then collapse repeated phrase texts —
    // instances of the same text share identical word stats, so the
    // distinct is exact, while the stats side above kept every
    // instance's contribution to freq/deg
    val scored = phrases
      .select(col("doc_id"), col("phrase_id"), col("phrase"), col("n_words"),
        explode(split(col("phrase"), " ")).as("w"))
      .join(wordStats.select(col("doc_id"), col("w"), col("wscore")), Seq("doc_id", "w"))
      .groupBy(col("doc_id"), col("phrase_id"), col("phrase"), col("n_words"))
      .agg(sum(col("wscore")).as("score_milli"))
      .select(col("doc_id"), col("phrase"), col("n_words"), col("score_milli"))
      .distinct()
    val wTop = Window.partitionBy(col("doc_id")).orderBy(col("score_milli").desc, col("phrase"))
    scored
      .withColumn("rk", row_number().over(wTop)).filter(col("rk") <= k)
      .select(col("doc_id"), col("phrase"), col("n_words").cast("int").as("n_words"),
        col("score_milli"), col("rk").cast("int").as("rk"))
  }

  /** text_keyphrases testdata binding. */
  def keyphrases(spark: SparkSession, sfDir: String): DataFrame =
    keyphrasesOn(Tables.documents(spark, sfDir), "doc_id", "text")
      .transform(graft.util.Cols.verifySort(_, col("doc_id"), col("rk")))

  def keyphrasesSql: String = {
    val stops = TextFns.EnMarkers.map(m => s"'$m'").mkString("(", ", ", ")")
    s"""WITH t AS (SELECT doc_id, ${TextFns.tokenizeSql("text")} AS wa FROM documents),
       |tok AS (SELECT doc_id, i AS pos, wa[i] AS w
       |        FROM t, unnest(generate_series(1, len(wa))) AS u(i) WHERE len(wa) > 0),
       |st AS (SELECT doc_id, pos, w,
       |        CASE WHEN w IN $stops THEN 1 ELSE 0 END AS stop FROM tok),
       |pid AS (SELECT *, sum(stop) OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id FROM st),
       |pw AS (SELECT doc_id, phrase_id, pos, w FROM pid WHERE stop = 0),
       |ph AS (SELECT doc_id, phrase_id, string_agg(w, ' ' ORDER BY pos) AS phrase,
       |        CAST(count(*) AS BIGINT) AS n_words
       |       FROM pw GROUP BY 1, 2 HAVING count(*) <= $RakeMaxPhrase),
       |wstat AS (SELECT pw.doc_id, w, CAST(count(*) AS BIGINT) AS freq,
       |           CAST(sum(n_words) AS BIGINT) AS deg
       |          FROM pw JOIN ph USING (doc_id, phrase_id) GROUP BY 1, 2),
       |inst AS (SELECT pw.doc_id, pw.phrase_id, ph.phrase, ph.n_words,
       |          CAST(sum((1000 * deg) // freq) AS BIGINT) AS score_milli
       |         FROM pw JOIN ph USING (doc_id, phrase_id)
       |         JOIN wstat ON wstat.doc_id = pw.doc_id AND wstat.w = pw.w
       |         GROUP BY 1, 2, 3, 4),
       |ded AS (SELECT DISTINCT doc_id, phrase, n_words, score_milli FROM inst),
       |r AS (SELECT doc_id, phrase, n_words, score_milli,
       |       row_number() OVER (PARTITION BY doc_id ORDER BY score_milli DESC, phrase) AS rk
       |      FROM ded)
       |SELECT doc_id, phrase, CAST(n_words AS INTEGER) AS n_words, score_milli,
       | CAST(rk AS INTEGER) AS rk
       |FROM r WHERE rk <= $RakeTopK ORDER BY doc_id, rk""".stripMargin
  }

  // ------------------------------------------------------------ gopher rules

  /** Rule thresholds for [[gopherRulesOn]] — the published Gopher-paper
    * bounds where the corpus can exercise them (mean-word-length 3–10,
    * alpha-word ≥ 0.8), tightened where the published bound would be
    * constant-true on short synthetic docs (min-words 50 vs Gopher's
    * 50; top-word 10% standing in for the duplicate-n-gram family,
    * which [[repetitionOn]] measures in full).
    */
  val RuleMinWords = 50L
  val RuleMaxWords = 100000L
  val RuleMinMwlMilli = 3000L
  val RuleMaxMwlMilli = 10000L
  val RuleMinAlphaPpm = 800000L
  val RuleMinStopwords = 2L
  val RuleMaxTopWordPpm = 100000L

  /** text_gopher_rules — the rule-based corpus quality filter of the
    * Gopher/MassiveText family (Rae et al. 2021, App. A; the same rule
    * shapes C4 and FineWeb apply): per document, word count in
    * [[[RuleMinWords]], [[RuleMaxWords]]], mean word length in
    * [3, 10], ≥ 80% of word instances containing a letter, ≥ 2 distinct
    * stopwords present, and no single word accounting for > 10% of the
    * document. Every metric is exact integer arithmetic (milli / ppm by
    * positive `div`, so Spark `div` ≡ DuckDB `//`) and every rule an
    * integer 0/1 flag — the whole filter value-oracles exactly.
    *
    * Shape at scale: the per-instance counters (words, non-ws chars)
    * ride the corpus scan as single-pass codegen [[TextCount]]s — no
    * shuffle; the distinct-word statistics (top-word count, distinct
    * stopwords, alpha instances) are one explode + two aggregations
    * both keyed on doc_id — a single document-key shuffle, the same
    * bound as RAKE — then one doc_id equi-join back to the scan side.
    * Nothing is corpus-global: the filter is embarrassingly parallel
    * over documents, the shape that matters when this gate is the first
    * pass over 100 TB of crawl.
    * Output: (doc_id, n_words, mwl_milli, alpha_ppm, n_stopwords,
    * top_word_ppm, r_words, r_mwl, r_alpha, r_stop, r_rep, pass).
    */
  def gopherRulesOn(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.TextCount
    val stops = TextFns.EnMarkers
    val toks = df.select(col(idCol).as("doc_id"),
        explode(TextFns.tokenize(col(textCol))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(
        max(col("c")).as("top_word_n"),
        sum(when(col("w").isin(stops: _*), 1L).otherwise(0L)).as("n_stopwords"),
        sum(when(col("w").rlike("[a-z]"), col("c")).otherwise(0L)).as("n_alpha"))
    val scan = df.select(col(idCol).as("doc_id"),
        TextCount.column(col(textCol), TextCount.Words).as("n_words"),
        TextCount.column(col(textCol), TextCount.NonWs).as("n_nonws"))
      .filter(col("n_words") > 0)
    val flag = (c: Column) => when(c, 1).otherwise(0)
    scan.join(toks, Seq("doc_id"))
      .withColumn("mwl_milli", expr("(1000 * n_nonws) div n_words"))
      .withColumn("alpha_ppm", expr("(1000000 * n_alpha) div n_words"))
      .withColumn("top_word_ppm", expr("(1000000 * top_word_n) div n_words"))
      .withColumn("r_words",
        flag(col("n_words").between(RuleMinWords, RuleMaxWords)))
      .withColumn("r_mwl",
        flag(col("mwl_milli").between(RuleMinMwlMilli, RuleMaxMwlMilli)))
      .withColumn("r_alpha", flag(col("alpha_ppm") >= RuleMinAlphaPpm))
      .withColumn("r_stop", flag(col("n_stopwords") >= RuleMinStopwords))
      .withColumn("r_rep", flag(col("top_word_ppm") <= RuleMaxTopWordPpm))
      .withColumn("pass", col("r_words") * col("r_mwl") * col("r_alpha")
        * col("r_stop") * col("r_rep"))
      .select(col("doc_id"), col("n_words").cast("int").as("n_words"),
        col("mwl_milli"), col("alpha_ppm"),
        col("n_stopwords").cast("int").as("n_stopwords"), col("top_word_ppm"),
        col("r_words"), col("r_mwl"), col("r_alpha"), col("r_stop"),
        col("r_rep"), col("pass"))
  }

  /** text_gopher_rules testdata binding. */
  def gopherRules(spark: SparkSession, sfDir: String): DataFrame =
    gopherRulesOn(Tables.documents(spark, sfDir), "doc_id", "text")
      .transform(graft.util.Cols.verifySort(_, col("doc_id")))

  def gopherRulesSql: String = {
    val stops = TextFns.EnMarkers.map(m => s"'$m'").mkString("(", ", ", ")")
    s"""WITH t AS (SELECT doc_id, ${TextFns.tokenizeSql("text")} AS words FROM documents),
       |cnt AS (SELECT doc_id, w, count(*) AS c
       |        FROM (SELECT doc_id, unnest(words) AS w FROM t) GROUP BY 1, 2),
       |st AS (SELECT doc_id, max(c) AS top_word_n,
       |        CAST(sum(CASE WHEN w IN $stops THEN 1 ELSE 0 END) AS BIGINT) AS n_stopwords,
       |        CAST(sum(CASE WHEN regexp_matches(w, '[a-z]') THEN c ELSE 0 END) AS BIGINT) AS n_alpha
       |       FROM cnt GROUP BY 1),
       |sc AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words,
       |        CAST(list_reduce(list_prepend(0, list_transform(words, w -> length(w))), (a, b) -> a + b) AS BIGINT) AS n_nonws
       |       FROM t WHERE len(words) > 0),
       |m AS (SELECT sc.doc_id, n_words, (1000 * n_nonws) // n_words AS mwl_milli,
       |        (1000000 * n_alpha) // n_words AS alpha_ppm, n_stopwords,
       |        (1000000 * top_word_n) // n_words AS top_word_ppm
       |       FROM sc JOIN st ON sc.doc_id = st.doc_id),
       |r AS (SELECT *,
       |        CASE WHEN n_words BETWEEN $RuleMinWords AND $RuleMaxWords THEN 1 ELSE 0 END AS r_words,
       |        CASE WHEN mwl_milli BETWEEN $RuleMinMwlMilli AND $RuleMaxMwlMilli THEN 1 ELSE 0 END AS r_mwl,
       |        CASE WHEN alpha_ppm >= $RuleMinAlphaPpm THEN 1 ELSE 0 END AS r_alpha,
       |        CASE WHEN n_stopwords >= $RuleMinStopwords THEN 1 ELSE 0 END AS r_stop,
       |        CASE WHEN top_word_ppm <= $RuleMaxTopWordPpm THEN 1 ELSE 0 END AS r_rep
       |       FROM m)
       |SELECT doc_id, CAST(n_words AS INTEGER) AS n_words, mwl_milli, alpha_ppm,
       | CAST(n_stopwords AS INTEGER) AS n_stopwords, top_word_ppm,
       | r_words, r_mwl, r_alpha, r_stop, r_rep,
       | r_words * r_mwl * r_alpha * r_stop * r_rep AS pass
       |FROM r ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------- entropy

  /** Fractional bits of the entropy fixed point (shared with
    * [[graft.util.FixedLog2]]'s DSIR use: 12 bits ≈ 2.4e-4 resolution).
    */
  val EntF = 12

  /** text_entropy — per-document token Shannon entropy in EXACT fixed
    * point: H = log2(n) − (Σ c_w·log2(c_w))/n over the doc's token
    * counts — the repetitiveness/diversity scalar (0 bits = one token
    * repeated; log2(n_distinct) = perfectly uniform) that quality
    * pipelines threshold alongside [[repetitionOn]]'s top-heavy ratio
    * and [[gopherRulesOn]]'s single-word cap. A float log would make
    * the score engine-dependent; [[graft.util.FixedLog2]]'s squaring
    * chain keeps every value int64-exact, so the operator fully
    * value-oracles (powers of two are exact: a uniform 8×2-token doc
    * scores exactly 3·2^12).
    *
    * Shape at scale: token counts are one (doc_id, w)-keyed aggregate;
    * the log table is computed ONCE over the DISTINCT count values —
    * a few hundred rows at any corpus size (counts and doc lengths,
    * not tokens) — and broadcast back; per-doc assembly is one more
    * doc-keyed aggregate. The log chain never rides the corpus-sized
    * stream.
    * Output: (doc_id, n_tokens, n_distinct, entropy_fp) in 2^-12 bits,
    * for docs with ≥1 token.
    */
  def entropyOn(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cnt = df.select(col(idCol).as("doc_id"),
        explode(TextFns.tokenize(col(textCol))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .transform(graft.util.CacheScope.cached) // feeds totals AND the value join
    val docn = cnt.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"))
    val vals = cnt.select(col("c").as("v"))
      .union(docn.select(col("n").as("v"))).distinct()
      .withColumn("q", expr(s"shiftleft(v, $EntF)"))
    val lg = graft.util.FixedLog2.log2Fp(vals, "q", "lg_fp", EntF)
      .select(col("v"), col("lg_fp"))
    val sumc = cnt
      .join(broadcast(lg.select(col("v").as("c"), col("lg_fp"))), Seq("c"))
      .groupBy(col("doc_id")).agg(sum(col("c") * col("lg_fp")).as("sum_clg"))
    docn
      .join(broadcast(lg.select(col("v").as("n"), col("lg_fp"))), Seq("n"))
      .join(sumc, Seq("doc_id"))
      .withColumn("entropy_fp", col("lg_fp") - expr("sum_clg div n"))
      .select(col("doc_id"), col("n").as("n_tokens"), col("n_distinct"),
        col("entropy_fp"))
  }

  /** text_compress_ratio — deflate-compressibility as a quality
    * signal (the CCNet/RefinedWeb-family filter): boilerplate and
    * repetition compress far below natural text, so ratio_milli =
    * 1000·deflated/raw separates templated junk (≲150‰ on heavy
    * repetition) from organic prose without any vocabulary model —
    * the cheap complement to [[entropyOn]] (token-level) and
    * [[repetitionOn]] (top-heaviness), catching LONG-RANGE structure
    * both miss. DEFLATE's bit stream is not SQL-expressible, so the
    * query is rows-only in CORRECTNESS (the codec-tier contract) with
    * the separation/determinism spec carrying the value checks; the
    * JDK Deflater at a fixed level is deterministic for a given
    * input, and one Deflater instance is REUSED per partition (reset
    * between docs — per-doc allocation dominated an early cut).
    * Shape: embarrassingly parallel scan, zero shuffle.
    * Output: (doc_id, raw_len, deflated_len, ratio_milli).
    */
  def compressRatioOn(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val d = new java.util.zip.Deflater(6, true)
        // native zlib buffers are freed by end(), not GC — release on
        // task completion so long-running executors don't accumulate
        // unreclaimed native memory across thousands of tasks
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => d.end()))
        val buf = new Array[Byte](1 << 16)
        it.map { case (id, text) =>
          val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          d.reset(); d.setInput(raw); d.finish()
          var n = 0L
          while (!d.finished()) n += d.deflate(buf)
          (id, raw.length.toLong, n,
            if (raw.length > 0) 1000L * n / raw.length else 0L)
        }
      }
      .toDF("doc_id", "raw_len", "deflated_len", "ratio_milli")
  }

  /** text_compress_ratio testdata binding. */
  def compressRatio(spark: SparkSession, sfDir: String): DataFrame =
    compressRatioOn(Tables.documents(spark, sfDir), "doc_id", "text")
      .transform(graft.util.Cols.verifySort(_, col("doc_id")))

  /** Head size for the [[zipfOn]] rank–frequency fit. */
  val ZipfK = 100

  /** text_zipf — Zipf rank–frequency slope of the corpus vocabulary:
    * OLS fit of log2(count) against log2(rank) over the [[ZipfK]] most
    * frequent tokens — natural language sits near slope −1 (Zipf's
    * law), and a corpus that departs hard (flat: templated/boilerplate
    * text; steep: degenerate repetition) fails the diagnostic before
    * anyone trains on it. The corpus-level complement of the per-doc
    * [[entropyOn]].
    *
    * Exactness: both logs come from the shared [[graft.util.FixedLog2]]
    * chain (exact int64), the five OLS moments are exact integer sums
    * over the ≤K head rows, and the slope is ONE fixed-order double
    * division prounded ([[graft.operators.Affinity.assortativityOn]]'s
    * device) — a single-row float that still value-oracles; degenerate
    * vocab (< 2 tokens) reports explicit NULL.
    *
    * Shape at scale: one (w)-keyed count aggregate (map-side combined),
    * a distributed top-K sort-limit (never a global window over the
    * vocabulary), then everything else rides K rows on the driver-side
    * plan — the rank window and log chains are K-row local.
    * Output: (n_fit, sum_lgr, sum_lgc, sum_xy, sum_x2, zipf_slope).
    */
  def zipfOn(df: DataFrame, textCol: String, k: Int = ZipfK): DataFrame = {
    val F = EntF
    val head = df.select(explode(TextFns.tokenize(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(k)
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("w"))).cast("long"))
      .withColumn("qr", expr(s"shiftleft(r, $F)"))
      .withColumn("qc", expr(s"shiftleft(c, $F)"))
    val logged = graft.util.FixedLog2.log2Fp(
      graft.util.FixedLog2.log2Fp(head, "qr", "lgr", F), "qc", "lgc", F)
    logged.agg(count(lit(1)).as("n_fit"),
        sum(col("lgr")).as("sum_lgr"), sum(col("lgc")).as("sum_lgc"),
        sum(col("lgr") * col("lgc")).as("sum_xy"),
        sum(col("lgr") * col("lgr")).as("sum_x2"))
      .withColumn("num",
        (col("n_fit") * col("sum_xy") - col("sum_lgr") * col("sum_lgc")).cast("double"))
      .withColumn("den",
        (col("n_fit") * col("sum_x2") - col("sum_lgr") * col("sum_lgr")).cast("double"))
      .withColumn("zipf_slope", when(col("den") === 0.0, lit(null).cast("double"))
        .otherwise(Cols.pround(col("num") / col("den"), 6)))
      .select(col("n_fit"), col("sum_lgr"), col("sum_lgc"), col("sum_xy"),
        col("sum_x2"), col("zipf_slope"))
  }

  /** text_zipf testdata binding. */
  def zipf(spark: SparkSession, sfDir: String): DataFrame =
    zipfOn(Tables.documents(spark, sfDir), "text")

  def zipfSql: String = {
    val F = EntF
    val (chainR, finR) =
      graft.util.FixedLog2.sqlCtes("tr", Seq("w"), "lgr", F, prefix = "lr")
    val (chainC, finC) =
      graft.util.FixedLog2.sqlCtes("tc", Seq("w"), "lgc", F, prefix = "lc")
    s"""WITH cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
       |      SELECT unnest(${TextFns.tokenizeSql("text")}) AS w FROM documents)
       |      GROUP BY 1),
       |head AS (SELECT w, c, CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT) AS r
       |      FROM (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT $ZipfK)),
       |tr AS (SELECT w, r << $F AS q FROM head),
       |tc AS (SELECT w, c << $F AS q FROM head),
       |$chainR,
       |$chainC,
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n_fit,
       |       CAST(sum(lgr) AS BIGINT) AS sum_lgr, CAST(sum(lgc) AS BIGINT) AS sum_lgc,
       |       CAST(sum(lgr * lgc) AS BIGINT) AS sum_xy,
       |       CAST(sum(lgr * lgr) AS BIGINT) AS sum_x2
       |      FROM $finR JOIN $finC USING (w))
       |SELECT n_fit, sum_lgr, sum_lgc, sum_xy, sum_x2,
       | CASE WHEN CAST(n_fit * sum_x2 - sum_lgr * sum_lgr AS DOUBLE) = 0.0 THEN NULL
       |      ELSE floor(CAST(n_fit * sum_xy - sum_lgr * sum_lgc AS DOUBLE)
       |        / CAST(n_fit * sum_x2 - sum_lgr * sum_lgr AS DOUBLE) * 1000000.0 + 0.5)
       |        / 1000000.0 END AS zipf_slope
       |FROM m""".stripMargin
  }

  /** text_entropy testdata binding. */
  def entropy(spark: SparkSession, sfDir: String): DataFrame =
    entropyOn(Tables.documents(spark, sfDir), "doc_id", "text")
      .transform(graft.util.Cols.verifySort(_, col("doc_id")))

  def entropySql: String = {
    val (chain, fin) =
      graft.util.FixedLog2.sqlCtes("vals", Seq("v"), "lg_fp", EntF)
    s"""WITH cnt AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c FROM (
       |      SELECT doc_id, unnest(${TextFns.tokenizeSql("text")}) AS w
       |      FROM documents) GROUP BY 1, 2),
       |docn AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
       |        CAST(count(*) AS BIGINT) AS n_distinct FROM cnt GROUP BY 1),
       |vals AS (SELECT v, v << $EntF AS q FROM (
       |      SELECT DISTINCT c AS v FROM cnt UNION SELECT DISTINCT n FROM docn)),
       |$chain,
       |sumc AS (SELECT doc_id, CAST(sum(c * lg_fp) AS BIGINT) AS sum_clg
       |      FROM cnt JOIN $fin ON cnt.c = $fin.v GROUP BY 1)
       |SELECT d.doc_id, d.n AS n_tokens, d.n_distinct,
       | lg.lg_fp - (sumc.sum_clg // d.n) AS entropy_fp
       |FROM docn d JOIN $fin lg ON d.n = lg.v JOIN sumc ON d.doc_id = sumc.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---------------------------------------------------------- perplexity

  /** Train-split share for [[perplexityOn]] (CCNet-style held-out
    * scoring: the LM is fit on one deterministic hash split and scores
    * the other, so a document never scores against counts it
    * contributed to — self-scoring systematically flatters near-dup
    * boilerplate, the exact text a perplexity filter exists to catch).
    */
  val PplTrainPct = 70

  /** text_perplexity — CCNet-family LM quality filter: an add-one
    * smoothed BIGRAM language model is fit on the train split of the
    * corpus (portable hash of the doc id — reproducible across engines
    * and partitionings) and every held-out document is scored by its
    * cross-entropy in bits per bigram, then bucketed head/middle/tail
    * PER LANGUAGE by ntile — the published CCNet recipe buckets per
    * language because cross-language entropy ranges aren't comparable.
    * P(cur|prev) = (C(prev,cur)+1)/(C(prev,·)+V) with V = train vocab
    * + 1 (OOV); an unseen context degrades to the uniform prior
    * 1/V — every bigram, seen or not, gets a finite score.
    *
    * Exactness: bits are [[graft.util.FixedLog2]] fixed point over the
    * integer ratio floor(((c1+V)<<12)/(c2+1)) — no float log, so the
    * score value-oracles. The log chain runs over the DISTINCT ratio
    * values only (bounded by distinct (c1,c2) pairs, corpus-size-free)
    * and broadcasts back, the [[entropyOn]] device.
    *
    * Shape at scale: two (prev[,cur])-keyed count aggregates over the
    * train split, two equi-joins of the scored bigram stream against
    * them (count tables are vocabulary-sized — candidates for
    * broadcast at any corpus size; Catalyst/AQE decides), one doc-keyed
    * re-agg. The tercile assignment is NOT a per-language ntile window
    * (that funnels a whole language's docs through one task); it is
    * the [[Training.tokenBudgetOn]] two-phase device — coarse
    * (lang, xent div 100) buckets aggregate counts, a slim
    * buckets-only prefix window computes each bucket's starting rank,
    * and docs rank within their (lang, bucket) only — reproducing
    * EXACT ntile(3) semantics (first n mod 3 tiles one larger, rank
    * tie-broken (xent, doc_id)) with (lang, bucket) as the parallel
    * unit. No all-pairs, no global or per-language sort.
    * Output: (doc_id, lang, n_bigrams, xent_milli, ppl_bucket) for
    * held-out docs with ≥1 bigram.
    */
  def perplexityOn(df: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    val F = EntF
    // NO fanOutScan here — re-measured r17 (Prof showed six ~0.7 s
    // single-task tokenize jobs, which LOOKED like the dedup/mm case):
    // spreading the scan measured 4.6 -> 6.3 s, with or without caching
    // the tokenized frame (the array<string> columnar cache is its own
    // regression, the q52 lesson). The broadcast-subtree consumers each
    // pay the exchange and AQE replans eat the spread's win — same
    // negative result as r16; the train-count/scoring joins stay the
    // wall. Twice measured, twice reverted: leave this one alone.
    val base = df.select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        TextFns.tokenize(col(textCol)).as("w"))
      .withColumn("split_h", pmod(TextFns.charFold(
        concat(lit("ppl:"), col("doc_id").cast("string"))), lit(100L)))
    val bi = base.filter(size(col("w")) >= 2)
      .select(col("doc_id"), col("lang"), col("split_h"), explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => struct(a.as("prev"), b.as("cur")))).as("p"))
      .select(col("doc_id"), col("lang"), col("split_h"),
        col("p.prev").as("prev"), col("p.cur").as("cur"))
      .transform(graft.util.CacheScope.cached) // feeds train counts AND scoring
    val train = bi.filter(col("split_h") < PplTrainPct)
    val c2 = train.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(col("prev")).agg(sum(col("c2")).as("c1"))
    // V = train-split distinct unigrams + 1 (the OOV slot); broadcast
    // 1-row scalar (sanctioned: constant-size, never a data crossJoin).
    val vocab = base.filter(col("split_h") < PplTrainPct)
      .select(explode(col("w")).as("u")).agg((count_distinct(col("u")) + 1L).as("v"))
    val scored = bi.filter(col("split_h") >= PplTrainPct)
      .join(c2, Seq("prev", "cur"), "left")
      .join(c1, Seq("prev"), "left")
      .na.fill(0L, Seq("c2", "c1"))
      .crossJoin(broadcast(vocab))
      .withColumn("q", expr(s"shiftleft(c1 + v, $F) div (c2 + 1)"))
    val vals = scored.select(col("q")).distinct()
    val lg = graft.util.FixedLog2.log2Fp(vals, "q", "lg_fp", F)
    val perDoc = scored
      .join(broadcast(lg), Seq("q"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lg_fp")).as("sum_fp"))
      .withColumn("xent_milli",
        expr(s"(1000 * sum_fp) div (n_bigrams * ${1L << F})"))
      .withColumn("bkt", expr("xent_milli div 100"))
      .transform(graft.util.CacheScope.cached) // feeds buckets AND ranking
    // two-phase exact ntile(3): bucket counts + slim prefix window
    // (rows = distinct (lang, bucket) — hundreds at any corpus size),
    // then rank within (lang, bucket) only
    val W = org.apache.spark.sql.expressions.Window
    val buckets = perDoc.groupBy(col("lang"), col("bkt"))
      .agg(count(lit(1)).as("b_n"))
    val pre = buckets
      .withColumn("cum_before", coalesce(sum(col("b_n")).over(
        W.partitionBy(col("lang")).orderBy(col("bkt"))
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum(col("b_n")).over(W.partitionBy(col("lang"))))
      .select(col("lang"), col("bkt"), col("cum_before"), col("n"))
    perDoc
      .join(broadcast(pre), Seq("lang", "bkt"))
      .withColumn("rank", col("cum_before") + row_number().over(
        W.partitionBy(col("lang"), col("bkt"))
          .orderBy(col("xent_milli"), col("doc_id"))))
      // ntile(3) boundaries: tile t ends at t·(n div 3) + min(t, n mod 3)
      .withColumn("ppl_bucket",
        when(col("rank") <= expr("n div 3 + least(1L, n % 3)"), lit("head"))
          .when(col("rank") <= expr("2 * (n div 3) + least(2L, n % 3)"),
            lit("middle"))
          .otherwise(lit("tail")))
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        col("xent_milli"), col("ppl_bucket"))
  }

  /** text_perplexity testdata binding. (fanOutScan on the documents
    * frame was TRIED in the r16 optimization round and measured WORSE —
    * 3.2 s → 4.6-5.4 s filtered: the tokenize is not this query's wall,
    * and the added exchange + AQE replan outweigh the spread. Left
    * as-is deliberately.)
    */
  def perplexity(spark: SparkSession, sfDir: String): DataFrame =
    perplexityOn(Tables.documents(spark, sfDir), "doc_id", "text", "lang")
      .transform(graft.util.Cols.verifySort(_, col("doc_id")))

  def perplexitySql: String = {
    val F = EntF
    val split = TextFns.charFoldSql("'ppl:' || CAST(doc_id AS VARCHAR)")
    val (chain, fin) =
      graft.util.FixedLog2.sqlCtes("vals", Seq("qk"), "lg_fp", F)
    s"""WITH base AS (SELECT doc_id, lang, ${TextFns.tokenizeSql("text")} AS w,
       |        ($split) % 100 AS split_h FROM documents),
       |bi AS (SELECT doc_id, lang, split_h, w[i] AS prev, w[i + 1] AS cur
       |       FROM base, unnest(generate_series(1, len(w) - 1)) AS u(i)
       |       WHERE len(w) >= 2),
       |c2 AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS c2
       |       FROM bi WHERE split_h < $PplTrainPct GROUP BY 1, 2),
       |c1 AS (SELECT prev, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
       |voc AS (SELECT CAST(count(DISTINCT u) + 1 AS BIGINT) AS v FROM (
       |       SELECT unnest(w) AS u FROM base WHERE split_h < $PplTrainPct)),
       |sc AS (SELECT doc_id, lang,
       |        ((coalesce(c1.c1, 0) + v) << $F) // (coalesce(c2.c2, 0) + 1) AS q
       |       FROM bi LEFT JOIN c2 USING (prev, cur) LEFT JOIN c1 USING (prev)
       |       CROSS JOIN voc WHERE split_h >= $PplTrainPct),
       |vals AS (SELECT q AS qk, q FROM (SELECT DISTINCT q FROM sc)),
       |$chain,
       |pd AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_bigrams,
       |        (1000 * CAST(sum(lg_fp) AS BIGINT)) // (count(*) * ${1L << F}) AS xent_milli
       |       FROM sc JOIN $fin ON sc.q = $fin.qk GROUP BY 1, 2)
       |SELECT doc_id, lang, n_bigrams, xent_milli,
       | (['head', 'middle', 'tail'])[ntile(3) OVER (PARTITION BY lang
       |    ORDER BY xent_milli, doc_id)] AS ppl_bucket
       |FROM pd ORDER BY doc_id""".stripMargin
  }
}
