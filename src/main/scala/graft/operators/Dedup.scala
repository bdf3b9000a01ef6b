package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.util.Tables

/** Document deduplication family (SURVEY.md §2.C) over `documents`.
  *
  * Scale notes (100 TB corpus):
  *  - exact: one hash-shuffle on the normalized-text hash; group state is
  *    tiny (min id + count).
  *  - ngram-jaccard: inverted-index candidate join (explode shingle →
  *    equi-join on shingle hash) — never an all-pairs cross join. Pair
  *    count is bounded by shared-shingle co-occurrence.
  *  - minhash LSH: fixed-width signature per doc (16 longs), then a
  *    band-bucket equi-join (4 bands × 4 rows) — the classic
  *    sub-quadratic near-dup path; shuffle keys are (band, bandKey).
  *  - simhash: 32-bit fingerprint, candidates via 4-chunk pigeonhole
  *    (hamming ≤ 1 ⇒ at least one 8-bit chunk identical) — an EXACT
  *    chunked equi-join prefilter, then the precise hamming test.
  *
  * All hashes are portable polynomial folds (TextFns) so every operator
  * here has a full DuckDB value oracle.
  */
object Dedup {

  /** dedup_exact — normalize → hash-groupBy → keep min doc_id. */
  def exact(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .withColumn("norm", regexp_replace(lower(trim(col("text"))), "\\s+", " "))
      .withColumn("fp", TextFns.charFold(col("norm")))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("fp"), col("n_copies"))
      .orderBy(col("keep_id"))
  }

  def exactSql: String = {
    val norm = raw"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
    s"""SELECT keep_id, fp, n_copies FROM (
       | SELECT ${TextFns.charFoldSql("norm")} AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
       | FROM (SELECT doc_id, $norm AS norm FROM documents) GROUP BY 1)
       |ORDER BY keep_id""".stripMargin
  }

  /** Shared prep: doc_id + distinct 3-shingle hash array, persisted —
    * every consumer self-joins (two plan branches), and Spark would
    * otherwise recompute the full tokenize+hash pipeline per branch (at
    * production scale this step is a materialized signature table).
    */
  private def shingled(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextFns.shingleHashes(TextFns.tokenize(col("text"))).as("h"))
      .persist()

  private val shingledSql =
    s"""SELECT doc_id, ${TextFns.shingleHashesSql("words")} AS h
       |FROM (SELECT doc_id, ${TextFns.tokenizeSql("text")} AS words FROM documents)""".stripMargin

  /** dedup_ngram_jaccard — shingle-set Jaccard ≥ 0.5 via inverted-index
    * candidate join. jac is an int/int double division — bit-identical
    * across engines.
    */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val t = shingled(spark, sfDir)
    // Inverted-index join on single shingle hashes; since each doc's
    // shingle array is DISTINCT, the per-pair match count IS the
    // intersection size — a codegen'd count aggregation replaces both
    // the pair-distinct and a per-pair array_intersect, and only slim
    // (doc_id, shingle) rows ever ride the shuffle. Set sizes rejoin
    // afterwards for the exact |A∩B| / (|A|+|B|−|A∩B|) Jaccard.
    val e = t.select(col("doc_id"), explode(col("h")).as("x"))
    val inter = e.select(col("doc_id").as("a_id"), col("x"))
      .join(e.select(col("doc_id").as("b_id"), col("x")), Seq("x"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).cast("double").as("i"))
    val sizes = t.select(col("doc_id"), size(col("h")).as("n"))
    inter
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), Seq("b_id"))
      .withColumn("jac", col("i") / (col("na") + col("nb") - col("i")))
      .filter(col("jac") >= 0.5)
      .select(col("a_id"), col("b_id"), col("jac"))
      .orderBy(col("a_id"), col("b_id"))
  }

  def ngramJaccardSql: String =
    s"""WITH t AS ($shingledSql),
       |e AS (SELECT doc_id, h, unnest(h) AS x FROM t),
       |pairs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |          FROM e a JOIN e b ON a.x = b.x AND a.doc_id < b.doc_id),
       |j AS (SELECT a_id, b_id,
       |        CAST(len(list_intersect(ta.h, tb.h)) AS DOUBLE)
       |          / (len(ta.h) + len(tb.h) - CAST(len(list_intersect(ta.h, tb.h)) AS DOUBLE)) AS jac
       |      FROM pairs JOIN t ta ON a_id = ta.doc_id JOIN t tb ON b_id = tb.doc_id)
       |SELECT a_id, b_id, jac FROM j WHERE jac >= 0.5 ORDER BY a_id, b_id""".stripMargin

  /** dedup_minhash — 16-wide MinHash signatures, 4×4 banded LSH:
    * candidate pairs share at least one full band; reported with the
    * signature-agreement jaccard estimate.
    */
  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    // persist the signatures: the band explode + self-join reads them
    // through two plan branches, and minhashSig's 16-permutation lambda
    // must not be recomputed per branch (nor re-inlined over the shingle
    // pipeline by CollapseProject)
    val sig = shingled(spark, sfDir)
      .filter(size(col("h")) > 0)
      .select(col("doc_id"), TextFns.minhashSig("h").as("s"))
      .persist()
    // slim band index: shuffle (doc_id, band, bandKey) only; signatures
    // rejoin after the candidate distinct
    val bands = sig
      .select(col("doc_id"), col("s"), explode(sequence(lit(0), lit(TextFns.Bands - 1))).as("band"))
      .select(col("doc_id"), col("band"), TextFns.bandKey("s", "band").as("bk"))
    val pairs = bands.select(col("doc_id").as("a_id"), col("band"), col("bk"))
      .join(bands.select(col("doc_id").as("b_id"), col("band"), col("bk")), Seq("band", "bk"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    pairs
      .join(sig.select(col("doc_id").as("a_id"), col("s").as("sa")), Seq("a_id"))
      .join(sig.select(col("doc_id").as("b_id"), col("s").as("sb")), Seq("b_id"))
      .withColumn("est_sim", TextFns.sigAgreement("sa", "sb"))
      .select(col("a_id"), col("b_id"), col("est_sim"))
      .orderBy(col("a_id"), col("b_id"))
  }

  def minhashLshSql: String =
    s"""WITH t AS ($shingledSql),
       |sig AS (SELECT doc_id, ${TextFns.minhashSigSql("h")} AS s FROM t WHERE len(h) > 0),
       |bands AS (SELECT doc_id, s, j AS band, ${TextFns.bandKeySql("s", "j")} AS bk
       |          FROM sig, generate_series(0, ${TextFns.Bands - 1}) AS g(j)),
       |pairs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id, a.s AS sa, b.s AS sb
       |          FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id)
       |SELECT a_id, b_id, ${TextFns.sigAgreementSql("sa", "sb")} AS est_sim
       |FROM pairs ORDER BY a_id, b_id""".stripMargin

  /** dedup_simhash — 32-bit SimHash; near-dup pairs at hamming ≤ 1.
    * Spark side generates candidates with the exact 4-chunk pigeonhole
    * equi-join (scales sub-quadratically); the oracle brute-forces the
    * same predicate — identical results by construction.
    */
  def simhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    // Fingerprint as a codegen'd aggregation rather than a nested
    // higher-order lambda (which is interpreted and makes 32 passes over
    // each token array): explode tokens, then 32 map-side-combined
    // bit-count sums per doc. Same votes — sum(±1 per token) > 0 ⟺
    // 2·count(bit set) > n — so the fingerprint (and the DuckDB oracle)
    // is unchanged. Zero-token docs drop out at the explode, matching
    // the size(wh) > 0 filter of the lambda form.
    val tok = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(TextFns.tokenize(col("text"))).as("w"))
      .select(col("doc_id"), TextFns.charFold(col("w")).as("h"))
    val bitSums = (0 until 32).map(i => sum(expr(s"(h >> $i) & 1")).as(s"c$i"))
    val fpCol = (0 until 32)
      .map(i => when(expr(s"2 * c$i > n"), lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    val fp = tok.groupBy(col("doc_id"))
      .agg(bitSums.head, (bitSums.tail :+ count(lit(1)).as("n")): _*)
      .select(col("doc_id"), fpCol.as("fp"))
      .persist()
    val chunks = fp.select(col("doc_id"), col("fp"),
        explode(sequence(lit(0), lit(3))).as("ci"))
      .select(col("doc_id"), col("ci"), expr("(fp >> (ci * 8)) & 255").as("cv"))
    val pairs = chunks.select(col("doc_id").as("a_id"), col("ci"), col("cv"))
      .join(chunks.select(col("doc_id").as("b_id"), col("ci"), col("cv")), Seq("ci", "cv"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    pairs
      .join(fp.select(col("doc_id").as("a_id"), col("fp").as("fa")), Seq("a_id"))
      .join(fp.select(col("doc_id").as("b_id"), col("fp").as("fb")), Seq("b_id"))
      .withColumn("hamming", expr("bit_count(fa ^ fb)"))
      .filter(col("hamming") <= 1)
      .select(col("a_id"), col("b_id"), col("hamming").cast("int").as("hamming"))
      .orderBy(col("a_id"), col("b_id"))
  }

  def simhashPairsSql: String =
    s"""WITH fp AS (
       | SELECT doc_id, ${TextFns.simhashSql("wh")} AS fp
       | FROM (SELECT doc_id, ${TextFns.tokenHashesSql("words")} AS wh
       |       FROM (SELECT doc_id, ${TextFns.tokenizeSql("text")} AS words FROM documents))
       | WHERE len(wh) > 0)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       | CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
       |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= 1
       |ORDER BY a_id, b_id""".stripMargin
}
