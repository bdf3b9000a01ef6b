package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{TextCount, TextFns}
import graft.util.{Cols, Tables}

/** Training-data pipeline operators beyond the dedup/similarity families
  * (SURVEY.md §2.C): benchmark decontamination, sequence packing,
  * cross-corpus dedup, lexical-diversity scoring. Like the rest of the
  * library each operator is a generic `*On` core plus a testdata binding,
  * and every hash is a portable TextFns polynomial fold so the DuckDB
  * value oracle covers the full computation.
  *
  * Scale notes (100 TB corpus):
  *  - contamination: the EVAL shingle set is bounded by the benchmark
  *    suite size (thousands of docs), not the corpus — the probe side
  *    left-semi joins against it (AQE broadcasts the small build side),
  *    so the corpus-sized stream never shuffles for candidates; the only
  *    corpus-sized shuffle is the per-doc hit count on doc_id.
  *  - packing: one window per SHARD (deterministic doc_id ranges), not a
  *    single global ORDER BY — a global cumulative sum would serialize
  *    the corpus through one partition, while per-shard packing is how
  *    production packing actually runs (each worker packs its shard).
  *  - cross-corpus dedup: banded MinHash LSH across corpora — candidate
  *    pairs meet in a (band, bandKey) equi-join, so cost tracks the true
  *    collision count, never |new| × |snapshot|.
  *  - diversity: two map-side-combinable aggregations (token counts,
  *    then per-doc moments) — no joins, no skew beyond token frequency
  *    itself, which the (doc_id, token) first-stage key disperses.
  */
object Training {

  // ------------------------------------------------------- contamination

  /** Benchmark-decontamination check: for every corpus doc, the fraction
    * of its distinct 3-word shingles that also appear anywhere in the
    * EVAL set (n-gram containment). A doc with containment ≥
    * `threshold` is flagged — the standard guard against test-set
    * leakage into training data. Containment, not Jaccard: a short
    * benchmark item quoted inside a long page should still flag.
    * Output: (doc_id, n_shingles, n_hit, containment, contaminated) for
    * corpus docs with ≥ 1 shingle.
    *
    * Cache contract: the shingled corpus is persist()ed because two
    * branches fork BEFORE any exchange (no ReusedExchange possible);
    * the cache lives until the caller clears it (`spark.catalog
    * .clearCache()`, as Bench/Verify do between queries) — long-lived
    * sessions own that cleanup.
    */
  def contaminationOn(corpus: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, threshold: Double): DataFrame = {
    def shingled(df: DataFrame) = df.select(col(idCol).as("doc_id"),
      TextFns.shingleHashes(TextFns.tokenize(col(textCol))).as("h"))
    val evalShingles = shingled(eval)
      .select(explode(col("h")).as("x")).distinct()
    val docs = shingled(corpus).filter(size(col("h")) > 0)
      .transform(graft.util.CacheScope.cached)
    val hits = docs.select(col("doc_id"), explode(col("h")).as("x"))
      .join(evalShingles, Seq("x"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    docs.select(col("doc_id"), size(col("h")).cast("long").as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("containment",
        Cols.pround(col("n_hit").cast("double") / col("n_shingles"), 6))
      .withColumn("contaminated", col("containment") >= threshold)
  }

  /** contamination_check testdata binding: docs with doc_id % 97 = 0
    * stand in for the benchmark suite; the rest are the corpus.
    */
  def contamination(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    contaminationOn(d.filter(col("doc_id") % 97 =!= 0),
      d.filter(col("doc_id") % 97 === 0), "doc_id", "text", 0.5)
      .transform(graft.util.Cols.verifySort(_, col("doc_id")))
  }

  def contaminationSql: String = {
    val sh = s"SELECT doc_id, ${TextFns.shingleHashesSql(TextFns.tokenizeSql("text"))} AS h FROM documents"
    s"""WITH sh AS ($sh),
       |ev AS (SELECT DISTINCT unnest(h) AS x FROM sh WHERE doc_id % 97 = 0),
       |docs AS (SELECT doc_id, h FROM sh WHERE doc_id % 97 <> 0 AND len(h) > 0),
       |probe AS (SELECT doc_id, unnest(h) AS x FROM docs),
       |hits AS (SELECT doc_id, count(*) AS n_hit FROM probe
       |         WHERE x IN (SELECT x FROM ev) GROUP BY 1),
       |r AS (SELECT d.doc_id, len(d.h) AS n_shingles, coalesce(hits.n_hit, 0) AS n_hit
       |      FROM docs d LEFT JOIN hits ON d.doc_id = hits.doc_id)
       |SELECT doc_id, n_shingles, n_hit,
       | ${Cols.proundSql("CAST(n_hit AS DOUBLE) / n_shingles", 6)} AS containment,
       | ${Cols.proundSql("CAST(n_hit AS DOUBLE) / n_shingles", 6)} >= 0.5 AS contaminated
       |FROM r ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------ contamination spans

  /** contamination_spans — span-level localization of eval overlap:
    * once [[contaminationOn]] (or its bloom form) flags a document,
    * the removal/redaction decision needs to know WHERE the leaked
    * benchmark text sits — this operator returns each maximal run of
    * consecutive eval-matching 3-shingles as a token span [span_start,
    * span_end] (inclusive 0-based token indices; a shingle at position
    * p covers tokens p..p+2). The decontamination family's third
    * stage: check → bloom prefilter → localize.
    *
    * Shape at scale: POSITION-preserving shingles explode scan-side;
    * the eval semi-join is the same bounded-build-side broadcast as
    * contamination_check, and only MATCHED positions (eval-bounded,
    * not corpus-bounded) reach the per-doc islands window — the
    * gaps-and-islands device (pos − row_number) runs partitioned on
    * doc_id over match rows only. All-integer → fully value-oracled.
    * Output: (doc_id, span_start, span_end, n_matched) per maximal
    * span, docs with ≥1 matching shingle only.
    */
  def contaminationSpansOn(corpus: DataFrame, eval: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val evalX = eval.select(
        explode(TextFns.shingleHashes(TextFns.tokenize(col(textCol)))).as("x"))
      .distinct()
    val px = corpus.select(col(idCol).as("doc_id"),
        posexplode(TextFns.orderedShingleHashes(TextFns.tokenize(col(textCol))))
          .as(Seq("pos", "x")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("x"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    px.join(evalX, Seq("x"), "left_semi")
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + 2L).as("span_end"),
        count(lit(1)).as("n_matched"))
      .select(col("doc_id"), col("span_start"), col("span_end"), col("n_matched"))
  }

  /** contamination_spans testdata binding — same eval split as the
    * doc-level checks.
    */
  def contaminationSpans(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    contaminationSpansOn(d.filter(col("doc_id") % 97 =!= 0),
      d.filter(col("doc_id") % 97 === 0), "doc_id", "text")
      .transform(graft.util.Cols.verifySort(_, col("doc_id"), col("span_start")))
  }

  def contaminationSpansSql: String = {
    val ord = TextFns.orderedShingleHashesSql(TextFns.tokenizeSql("text"))
    val dst = TextFns.shingleHashesSql(TextFns.tokenizeSql("text"))
    s"""WITH ev AS (SELECT DISTINCT unnest(h) AS x FROM (
       |      SELECT $dst AS h FROM documents WHERE doc_id % 97 = 0)),
       |t AS (SELECT doc_id, $ord AS h FROM documents WHERE doc_id % 97 <> 0),
       |px AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, h[i + 1] AS x
       |       FROM (SELECT doc_id, h, unnest(range(0, len(h))) AS i FROM t)),
       |m AS (SELECT doc_id, pos FROM px WHERE x IN (SELECT x FROM ev)),
       |g AS (SELECT doc_id, pos,
       |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |      FROM m)
       |SELECT doc_id, min(pos) AS span_start, max(pos) + 2 AS span_end,
       | CAST(count(*) AS BIGINT) AS n_matched
       |FROM g GROUP BY doc_id, grp ORDER BY doc_id, span_start""".stripMargin
  }

  // --------------------------------------------------- bloom prefilter

  /** Bloom filter geometry for [[contaminationBloomOn]]: 2^15 bits
    * packed as 1024 × 32-bit words (32-bit words so every set-bit mask
    * `1 << (pos % 32)` stays strictly positive in int64 — a 63-bit
    * shift's sign bit behaves differently across engines' literals).
    */
  val BloomBits = 32768L
  val BloomWordBits = 32L

  /** The k=2 Bloom hash family: h_j(x) = ((a_j·x + b_j) mod P) mod
    * [[BloomBits]]. Coefficients differ from the MinHash family so the
    * two sketches decorrelate; x < P < 2^31 keeps a_j·x < 2^62.
    */
  val BloomCoef: Seq[(Long, Long)] = Seq((1103515245L, 12345L), (69069L, 362437L))

  /** contamination_bloom — the decontamination probe restructured the
    * way a 100 TB pass actually runs: the EVAL shingle set is compiled
    * into a tiny Bloom filter (≤1024 words — kilobytes broadcast to
    * every executor), every corpus shingle is tested SCAN-SIDE against
    * it via two 1024-row broadcast word-table joins (zero shuffle for
    * the membership test), and only the shingles that pass the Bloom
    * enter the exact semi-join verification. On an uncontaminated
    * corpus — the overwhelmingly common case — the expensive
    * shingle-keyed shuffle of [[contaminationOn]] shrinks to the Bloom
    * false-positive stream (~n_shingles · (1 − e^{−kn/m})^k), while the
    * exact verify keeps the result identical to the unfiltered check:
    * a Bloom has no false negatives, so n_true_hit here ≡ n_hit there.
    * The report also surfaces the filter's measured FP count per doc —
    * the sizing feedback a production gate monitors.
    * Output: (doc_id, n_shingles, n_bloom_hit, n_true_hit, n_fp,
    * containment_milli, contaminated) for corpus docs with ≥1 shingle;
    * every metric exact int64, so the whole operator value-oracles.
    */
  def contaminationBloomOn(corpus: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, thresholdMilli: Long = 500L,
      bloomBits: Long = BloomBits): DataFrame = {
    // sizing rule: m ≳ 16× the eval shingle count keeps FP < 1% at k=2
    // (fp = (1−e^{−2s/m})²); the 2^15 default fits the testdata eval
    // split — a benchmark-suite-scale eval set wants 2^22 (still a
    // ~0.5 MB broadcast). The ORACLE binds the default; callers sizing
    // up pass bloomBits explicitly (ScaleRehearsal bloom mode).
    val P = TextFns.P
    def shingled(df: DataFrame) = df.select(col(idCol).as("doc_id"),
      TextFns.shingleHashes(TextFns.tokenize(col(textCol))).as("h"))
    // eval shingles feed BOTH the bloom build and the exact verify —
    // cache: the fork is pre-exchange, no ReusedExchange possible
    val evalX = shingled(eval).select(explode(col("h")).as("x")).distinct()
      .transform(graft.util.CacheScope.cached)
    def pos(j: Int, x: Column): Column = {
      val (a, b) = BloomCoef(j)
      (x * a + b) % P % bloomBits
    }
    val bloom = evalX
      .select(explode(array(BloomCoef.indices.map(j => pos(j, col("x"))): _*)).as("p"))
      .select(expr(s"p div $BloomWordBits").as("w"),
        expr(s"shiftleft(cast(1 as bigint), cast(p % $BloomWordBits as int))").as("m"))
      .groupBy(col("w")).agg(expr("bit_or(m)").as("bits"))
    val docs = shingled(corpus).filter(size(col("h")) > 0)
      .transform(graft.util.CacheScope.cached)
    // scan-side membership: one left join per hash against the
    // broadcast word table; hit ⇔ both probed bits set
    val probed = docs.select(col("doc_id"), explode(col("h")).as("x"))
      .withColumn("p0", pos(0, col("x"))).withColumn("p1", pos(1, col("x")))
      .withColumn("w0", expr(s"p0 div $BloomWordBits"))
      .withColumn("w1", expr(s"p1 div $BloomWordBits"))
      .join(broadcast(bloom.select(col("w").as("w0"), col("bits").as("bits0"))),
        Seq("w0"), "left")
      .join(broadcast(bloom.select(col("w").as("w1"), col("bits").as("bits1"))),
        Seq("w1"), "left")
      .withColumn("hit", when(
        col("bits0").isNotNull && col("bits1").isNotNull &&
          (col("bits0").bitwiseAND(expr(s"shiftleft(cast(1 as bigint), cast(p0 % $BloomWordBits as int))")) =!= 0L) &&
          (col("bits1").bitwiseAND(expr(s"shiftleft(cast(1 as bigint), cast(p1 % $BloomWordBits as int))")) =!= 0L),
        1L).otherwise(0L))
    val bloomHits = probed.groupBy(col("doc_id"))
      .agg(sum(col("hit")).as("n_bloom_hit"))
    // exact verify — ONLY the bloom survivors reach the semi join
    val trueHits = probed.filter(col("hit") === 1L)
      .select(col("doc_id"), col("x"))
      .join(evalX, Seq("x"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_true_hit"))
    docs.select(col("doc_id"), size(col("h")).cast("long").as("n_shingles"))
      .join(bloomHits, Seq("doc_id"), "left")
      .join(trueHits, Seq("doc_id"), "left")
      .withColumn("n_bloom_hit", coalesce(col("n_bloom_hit"), lit(0L)))
      .withColumn("n_true_hit", coalesce(col("n_true_hit"), lit(0L)))
      .withColumn("n_fp", col("n_bloom_hit") - col("n_true_hit"))
      .withColumn("containment_milli", expr("(1000 * n_true_hit) div n_shingles"))
      .withColumn("contaminated",
        when(col("containment_milli") >= thresholdMilli, 1).otherwise(0))
  }

  /** contamination_bloom testdata binding — same eval split as
    * [[contamination]] so the two reports are directly comparable
    * (n_true_hit ≡ contamination_check's n_hit).
    */
  def contaminationBloom(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    contaminationBloomOn(d.filter(col("doc_id") % 97 =!= 0),
      d.filter(col("doc_id") % 97 === 0), "doc_id", "text")
      .transform(graft.util.Cols.verifySort(_, col("doc_id")))
  }

  def contaminationBloomSql: String = {
    val P = TextFns.P
    val sh = s"SELECT doc_id, ${TextFns.shingleHashesSql(TextFns.tokenizeSql("text"))} AS h FROM documents"
    def posSql(j: Int, x: String) = {
      val (a, b) = BloomCoef(j)
      s"(($x * $a + $b) % $P) % $BloomBits"
    }
    def maskSql(p: String) =
      s"(CAST(1 AS BIGINT) << CAST($p % $BloomWordBits AS INTEGER))"
    s"""WITH sh AS ($sh),
       |ev AS (SELECT DISTINCT unnest(h) AS x FROM sh WHERE doc_id % 97 = 0),
       |pos AS (SELECT ${posSql(0, "x")} AS p FROM ev
       |        UNION ALL SELECT ${posSql(1, "x")} FROM ev),
       |bloom AS (SELECT p // $BloomWordBits AS w, bit_or(${maskSql("p")}) AS bits
       |          FROM pos GROUP BY 1),
       |docs AS (SELECT doc_id, h FROM sh WHERE doc_id % 97 <> 0 AND len(h) > 0),
       |px AS (SELECT doc_id, unnest(h) AS x FROM docs),
       |pp AS (SELECT doc_id, x, ${posSql(0, "x")} AS p0, ${posSql(1, "x")} AS p1 FROM px),
       |ht AS (SELECT pp.doc_id, pp.x,
       |        CASE WHEN b0.bits IS NOT NULL AND b1.bits IS NOT NULL
       |              AND (b0.bits & ${maskSql("pp.p0")}) <> 0
       |              AND (b1.bits & ${maskSql("pp.p1")}) <> 0
       |             THEN 1 ELSE 0 END AS hit
       |       FROM pp LEFT JOIN bloom b0 ON pp.p0 // $BloomWordBits = b0.w
       |               LEFT JOIN bloom b1 ON pp.p1 // $BloomWordBits = b1.w),
       |bh AS (SELECT doc_id, CAST(sum(hit) AS BIGINT) AS n_bloom_hit FROM ht GROUP BY 1),
       |th AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_true_hit FROM ht
       |       WHERE hit = 1 AND x IN (SELECT x FROM ev) GROUP BY 1),
       |r AS (SELECT d.doc_id, CAST(len(d.h) AS BIGINT) AS n_shingles,
       |        coalesce(bh.n_bloom_hit, 0) AS n_bloom_hit,
       |        coalesce(th.n_true_hit, 0) AS n_true_hit
       |      FROM docs d LEFT JOIN bh ON d.doc_id = bh.doc_id
       |                  LEFT JOIN th ON d.doc_id = th.doc_id)
       |SELECT doc_id, n_shingles, n_bloom_hit, n_true_hit,
       | n_bloom_hit - n_true_hit AS n_fp,
       | (1000 * n_true_hit) // n_shingles AS containment_milli,
       | CAST(CASE WHEN (1000 * n_true_hit) // n_shingles >= 500 THEN 1 ELSE 0 END AS INTEGER) AS contaminated
       |FROM r ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------ sharding

  /** Output shard count for [[shardAssignOn]]. */
  val NShards = 16L

  /** pipeline_shard_assign — deterministic output sharding + balance
    * audit: every doc routes to shard mix(id) mod N (the square-mod-P
    * round on top of the LCG — the repo's hash-consumer rule: a bare
    * LCG is monotone over small id ranges, which for sharding means
    * consecutive ids stripe predictably instead of mixing), and the
    * report is the thing a 100 TB writer checks BEFORE the write: per
    * shard, doc count, exact token load, and load_ppm = tokens·N·10⁶
    * div total (10⁶ = perfectly balanced). A skewed shard here is a
    * straggler executor and an oversized output file at scale.
    *
    * Shape: one scan (codegen token counts, arithmetic shard key) +
    * one N-row aggregate + a 1-row broadcast total — the audit costs
    * one pass regardless of corpus size. All-integer → fully
    * value-oracled.
    * Output: (shard, n_docs, n_tokens, min_doc, max_doc, load_ppm).
    */
  def shardAssignOn(df: DataFrame, idCol: String, textCol: String,
      nShards: Long = NShards): DataFrame = {
    val P = TextFns.P
    val mixed = df.select(col(idCol).as("doc_id"),
        TextCount.column(col(textCol), TextCount.Words).as("tokens"))
      .withColumn("h", pmod(col("doc_id") * 1000003L + 12289L, lit(P)))
      .withColumn("shard", pmod(col("h") * col("h"), lit(P)) % nShards)
    val per = mixed.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("n_tokens"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
    val total = per.agg(sum(col("n_tokens")).as("t_tokens"))
    per.crossJoin(broadcast(total))
      .withColumn("load_ppm",
        expr(s"(n_tokens * $nShards * 1000000) div t_tokens"))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        col("min_doc"), col("max_doc"), col("load_ppm"))
  }

  /** pipeline_shard_assign testdata binding. */
  def shardAssign(spark: SparkSession, sfDir: String): DataFrame =
    shardAssignOn(Tables.documents(spark, sfDir), "doc_id", "text")
      .orderBy(col("shard"))

  def shardAssignSql: String = {
    val P = TextFns.P
    s"""WITH tok AS (SELECT doc_id,
       |    CAST(len(${TextFns.tokenizeSql("text")}) AS BIGINT) AS tokens,
       |    ((doc_id * 1000003 + 12289) % $P) AS h
       |  FROM documents),
       |sh AS (SELECT doc_id, tokens, ((h * h) % $P) % $NShards AS shard FROM tok),
       |per AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(tokens) AS BIGINT) AS n_tokens,
       |    min(doc_id) AS min_doc, max(doc_id) AS max_doc
       |  FROM sh GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t_tokens FROM per)
       |SELECT shard, n_docs, n_tokens, min_doc, max_doc,
       | (n_tokens * $NShards * 1000000) // t_tokens AS load_ppm
       |FROM per CROSS JOIN tot ORDER BY shard""".stripMargin
  }

  // ------------------------------------------------------------- packing

  /** Token budget per packed training sequence. */
  val PackBudget = 512L

  /** Docs per deterministic packing shard (each shard packs
    * independently — the parallel unit).
    */
  val PackShard = 250L

  /** Sequence packing: documents are concatenated in deterministic
    * (shard, id) order and cut into `budget`-token training sequences; a
    * doc belongs to the pack where it STARTS (exclusive running token
    * offset ÷ budget). Token counts come from the codegen'd
    * [[graft.functions.TextCount]] (identical to `len(tokenize)`).
    * Output: one row per pack — (pack_id, n_docs, total_tokens,
    * first_doc).
    */
  def packOn(df: DataFrame, idCol: String, textCol: String,
      budget: Long = PackBudget, shardSize: Long = PackShard): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol).as("doc_id"),
        TextCount.column(col(textCol), TextCount.Words).as("tokens"))
      .withColumn("shard", expr(s"doc_id div $shardSize"))
      .withColumn("off", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"shard * 1000000 + off div $budget"))
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("total_tokens"),
        min(col("doc_id")).as("first_doc"))
  }

  /** pipeline_pack testdata binding. */
  def pack(spark: SparkSession, sfDir: String): DataFrame =
    packOn(Tables.documents(spark, sfDir), "doc_id", "text")
      .transform(graft.util.Cols.verifySort(_, col("pack_id")))

  def packSql: String =
    s"""WITH tok AS (SELECT doc_id, doc_id // $PackShard AS shard,
       |  CAST(len(${TextFns.tokenizeSql("text")}) AS BIGINT) AS tokens FROM documents),
       |off AS (SELECT doc_id, shard, tokens,
       |  CAST(coalesce(sum(tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off FROM tok),
       |p AS (SELECT CAST(shard * 1000000 + off // $PackBudget AS BIGINT) AS pack_id, doc_id, tokens FROM off)
       |SELECT pack_id, count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS total_tokens,
       | min(doc_id) AS first_doc
       |FROM p GROUP BY 1 ORDER BY pack_id""".stripMargin

  // ------------------------------------------------- cross-corpus dedup

  /** Cross-corpus near-dup detection: which NEW docs near-duplicate a
    * doc already in the SNAPSHOT corpus (the incremental-crawl dedup
    * step — new data is deduped against what's already in the training
    * set, not just against itself). Banded MinHash LSH across the two
    * corpora: signatures on each side, candidates meet in a
    * (band, bandKey) equi-join, exact signature agreement filters at
    * `minAgreement`. Output: (new_id, snap_id, est_sim) pairs.
    *
    * Cache contract: per-side signature frames are persist()ed (each is
    * read by the band join AND the agreement rejoin, forking before any
    * exchange); caller owns cleanup via `spark.catalog.clearCache()`.
    */
  def crossCorpusOn(newDocs: DataFrame, snapshot: DataFrame, idCol: String,
      textCol: String, minAgreement: Double): DataFrame = {
    def sigs(df: DataFrame) = df
      .select(col(idCol).as("doc_id"),
        TextFns.shingleHashes(TextFns.tokenize(col(textCol))).as("h"))
      .filter(size(col("h")) > 0)
      .select(col("doc_id"), TextFns.minhashSig("h").as("s"))
      .transform(graft.util.CacheScope.cached)
    def bands(sig: DataFrame, id: String) = sig
      .select(col("doc_id").as(id), col("s"),
        explode(sequence(lit(0), lit(TextFns.Bands - 1))).as("band"))
      .select(col(id), col("band"), TextFns.bandKey("s", "band").as("bk"))
    val ns = sigs(newDocs)
    val ss = sigs(snapshot)
    val cand = bands(ns, "new_id").join(bands(ss, "snap_id"), Seq("band", "bk"))
      .select(col("new_id"), col("snap_id")).distinct()
    cand
      .join(ns.select(col("doc_id").as("new_id"), col("s").as("sa")), Seq("new_id"))
      .join(ss.select(col("doc_id").as("snap_id"), col("s").as("sb")), Seq("snap_id"))
      .withColumn("est_sim", TextFns.sigAgreement("sa", "sb"))
      .filter(col("est_sim") >= minAgreement)
      .select(col("new_id"), col("snap_id"), col("est_sim"))
  }

  /** dedup_cross_corpus testdata binding: odd ids are the "new crawl",
    * even ids the snapshot (the planted near-dup content spans both).
    */
  def crossCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    crossCorpusOn(d.filter(col("doc_id") % 2 === 1),
      d.filter(col("doc_id") % 2 === 0), "doc_id", "text", 0.5)
      .transform(graft.util.Cols.verifySort(_, col("new_id"), col("snap_id")))
  }

  def crossCorpusSql: String = {
    val sh = s"SELECT doc_id, ${TextFns.shingleHashesSql(TextFns.tokenizeSql("text"))} AS h FROM documents"
    s"""WITH sh AS ($sh),
       |sig AS (SELECT doc_id, ${TextFns.minhashSigSql("h")} AS s FROM sh WHERE len(h) > 0),
       |nb AS (SELECT doc_id AS new_id, s, j AS band, ${TextFns.bandKeySql("s", "j")} AS bk
       |       FROM sig, generate_series(0, ${TextFns.Bands - 1}) AS g(j) WHERE doc_id % 2 = 1),
       |sb AS (SELECT doc_id AS snap_id, s, j AS band, ${TextFns.bandKeySql("s", "j")} AS bk
       |       FROM sig, generate_series(0, ${TextFns.Bands - 1}) AS g(j) WHERE doc_id % 2 = 0),
       |cand AS (SELECT DISTINCT new_id, snap_id, nb.s AS sa, sb.s AS sb2
       |         FROM nb JOIN sb ON nb.band = sb.band AND nb.bk = sb.bk)
       |SELECT new_id, snap_id, ${TextFns.sigAgreementSql("sa", "sb2")} AS est_sim
       |FROM cand WHERE ${TextFns.sigAgreementSql("sa", "sb2")} >= 0.5
       |ORDER BY new_id, snap_id""".stripMargin
  }

  // ------------------------------------------------------------- mixing

  /** Deterministic dataset mixing: each source is downsampled to its
    * configured weight (PPM — integer parts-per-million, so the
    * keep threshold is exact on every engine; a double weight times 1e6
    * truncates differently across engines). A row is kept iff
    * `charFold(source ‖ ':' ‖ id) mod 1e6 < ppm` — reproducible across
    * runs, engines, and partitionings, and INDEPENDENT per row, which
    * is what lets the mixture be re-materialized identically anywhere
    * (the training-mixture construction step). Pure scan-side
    * predicate: no shuffle, pushes the mixture into the first pass over
    * a 100 TB corpus.
    */
  def mixOn(df: DataFrame, idCol: String, sourceCol: String,
      ppmBySource: Map[String, Long], defaultPpm: Long): DataFrame = {
    val ppm = ppmBySource.foldLeft(lit(defaultPpm)) { case (acc, (s, w)) =>
      when(col(sourceCol) === s, lit(w)).otherwise(acc)
    }
    df.withColumn("mix_h",
        pmod(TextFns.charFold(concat(col(sourceCol), lit(":"), col(idCol).cast("string"))),
          lit(1000000L)))
      .filter(col("mix_h") < ppm)
      .drop("mix_h")
  }

  /** pipeline_mix testdata binding: even-indexed sources at 30%,
    * odd-indexed at 80%. Output aggregates per source with the kept-id
    * sum as an exact membership checksum.
    */
  def mix(spark: SparkSession, sfDir: String): DataFrame = {
    val weights = (0 until 20).map(i =>
      s"src$i" -> (if (i % 2 == 0) 300000L else 800000L)).toMap
    val d = Tables.documents(spark, sfDir)
    val kept = mixOn(d, "doc_id", "source", weights, 1000000L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_id_sum"))
    d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_id_sum"), lit(0L)).as("kept_id_sum"))
      .orderBy(col("source"))
  }

  def mixSql: String = {
    val h = TextFns.charFoldSql("source || ':' || CAST(doc_id AS VARCHAR)")
    s"""WITH k AS (SELECT source, doc_id,
       |  ($h) % 1000000 <
       |    (CASE WHEN CAST(substring(source, 4) AS INTEGER) % 2 = 0
       |          THEN 300000 ELSE 800000 END) AS keep
       |  FROM documents)
       |SELECT source, count(*) AS n_docs,
       | CAST(coalesce(sum(CASE WHEN keep THEN 1 END), 0) AS BIGINT) AS n_kept,
       | CAST(coalesce(sum(CASE WHEN keep THEN doc_id END), 0) AS BIGINT) AS kept_id_sum
       |FROM k GROUP BY 1 ORDER BY source""".stripMargin
  }

  /** pipeline_mix_temp — temperature-based source re-weighting: the
    * standard size^α mix (α = 1 proportional, α → 0 uniform; smaller
    * α upweights small sources — the multilingual/LLM data-mixing
    * technique). α is FIXED at 1/2 here because sqrt is
    * IEEE-correctly-rounded and therefore engine-portable, where a
    * general pow() is a libm transcendental with no such guarantee;
    * for other α, compute the per-source ppm offline and feed
    * [[mixOn]] — the distributed path is identical. The one hidden
    * trap: Σ√n over sources is FLOAT-SUMMATION-ORDER dependent, so
    * each √n_s is quantized to integer units (floor(√n·2²⁰) — sqrt,
    * exponent shift and floor are all exact) BEFORE summing; targets
    * k_s = (K · q_s) div Σq_s are then pure int64. Selection is
    * deterministic hash-rank within source (one window on the source
    * key); the bounded-heap reservoir is the drop-in at hub-source
    * scale. Output: (source, n_docs, target_k, n_kept, kept_id_sum).
    */
  def mixTempOn(df: DataFrame, idCol: String, sourceCol: String,
      budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // |sources|-row frame feeding two consumers (total + per-source
    // targets). Cache contract (same as the dedup family): operators
    // persist, CALLERS release — unpersist the lineage or
    // spark.catalog.clearCache() when done, as Bench/Verify do
    // between queries.
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("q", floor(sqrt(col("n_docs").cast("double")) * 1048576.0).cast("long"))
      .transform(graft.util.CacheScope.cached)
    val tot = counts.agg(sum(col("q")).as("sq"))
    val targets = counts.crossJoin(broadcast(tot))
      .withColumn("target_k", expr(s"($budget * q) div sq"))
      .select(col(sourceCol), col("n_docs"), col("target_k"))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(expr(s"($idCol * 1000003 + 12289) % 2147483647"), col(idCol))
    val kept = df.select(col(sourceCol), col(idCol))
      .join(broadcast(targets.select(col(sourceCol), col("target_k"))), Seq(sourceCol))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("target_k"))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_kept"), sum(col(idCol)).as("kept_id_sum"))
    targets.join(kept, Seq(sourceCol), "left")
      .select(col(sourceCol), col("n_docs"), col("target_k"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_id_sum"), lit(0L)).as("kept_id_sum"))
  }

  /** pipeline_mix_temp testdata binding: 200-doc budget at α = 1/2. */
  def mixTemp(spark: SparkSession, sfDir: String): DataFrame =
    mixTempOn(Tables.documents(spark, sfDir), "doc_id", "source", 200L)
      .orderBy(col("source"))

  def mixTempSql: String =
    """WITH c AS (
      | SELECT source, count(*) AS n_docs,
      |  CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1048576.0) AS BIGINT) AS q
      | FROM documents GROUP BY 1),
      |t AS (SELECT source, n_docs, (200 * q) // (SELECT sum(q) FROM c) AS target_k FROM c),
      |r AS (SELECT source, doc_id,
      |  row_number() OVER (PARTITION BY source
      |    ORDER BY (doc_id * 1000003 + 12289) % 2147483647, doc_id) AS rk
      | FROM documents),
      |k AS (SELECT r.source, count(*) AS n_kept, sum(doc_id) AS kept_id_sum
      |      FROM r JOIN t ON r.source = t.source WHERE rk <= target_k GROUP BY 1)
      |SELECT t.source, n_docs, CAST(target_k AS BIGINT) AS target_k,
      | CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
      | CAST(coalesce(kept_id_sum, 0) AS BIGINT) AS kept_id_sum
      |FROM t LEFT JOIN k ON t.source = k.source ORDER BY t.source""".stripMargin

  /** pipeline_quality_mix — quality-WEIGHTED downsampling, the curation
    * recipe between "hard threshold" (pipeline_curate) and "uniform
    * mixture" (pipeline_mix): high-quality docs (score ≥ 0.75) all
    * survive, mid-quality ([0.5, 0.75)) keep a deterministic 30% by the
    * same portable row hash pipeline_mix uses, low and unscorable docs
    * drop. Reported per (source, tier) with kept counts and the exact
    * kept-id checksum so the oracle verifies MEMBERSHIP, not just
    * counts. Scan-side predicate over the quality score (itself one
    * scan) — no shuffle beyond the report aggregate.
    */
  def qualityMix(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val score = graft.operators.TextAnalysis.qualityOn(d, "doc_id", "text")
      .select(col("doc_id"), col("quality_score"))
    d.join(score, Seq("doc_id"), "left")
      .withColumn("tier",
        when(col("quality_score") >= 0.75, "high")
          .when(col("quality_score") >= 0.5, "mid").otherwise("low"))
      .withColumn("ppm",
        when(col("tier") === "high", 1000000L)
          .when(col("tier") === "mid", 300000L).otherwise(0L))
      .withColumn("h",
        pmod(TextFns.charFold(concat(col("source"), lit(":"), col("doc_id").cast("string"))),
          lit(1000000L)))
      .withColumn("keep", col("h") < col("ppm"))
      .groupBy(col("source"), col("tier"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("doc_id")).otherwise(0L)).as("kept_id_sum"))
      .orderBy(col("source"), col("tier"))
  }

  def qualityMixSql: String = {
    val h = TextFns.charFoldSql("d.source || ':' || CAST(d.doc_id AS VARCHAR)")
    s"""WITH q AS (${graft.operators.TextAnalysis.qualitySql}),
       |t AS (SELECT d.source, d.doc_id,
       |  CASE WHEN quality_score >= 0.75 THEN 'high'
       |       WHEN quality_score >= 0.5 THEN 'mid' ELSE 'low' END AS tier,
       |  CASE WHEN quality_score >= 0.75 THEN 1000000
       |       WHEN quality_score >= 0.5 THEN 300000 ELSE 0 END AS ppm,
       |  ($h) % 1000000 AS h
       | FROM documents d LEFT JOIN q ON d.doc_id = q.doc_id)
       |SELECT source, tier, count(*) AS n_docs,
       | CAST(coalesce(sum(CASE WHEN h < ppm THEN 1 END), 0) AS BIGINT) AS n_kept,
       | CAST(coalesce(sum(CASE WHEN h < ppm THEN doc_id END), 0) AS BIGINT) AS kept_id_sum
       |FROM t GROUP BY 1, 2 ORDER BY source, tier""".stripMargin
  }

  // --------------------------------------------------- source similarity

  /** source_minhash_sim — corpus provenance analytics: pairwise content
    * overlap between SOURCES, estimated from per-source MinHash
    * signatures. Signatures are MERGEABLE (elementwise min), so the
    * per-source state is 16 longs regardless of source size: per-doc
    * signatures evaluate scan-side (codegen [[graft.functions.MinHashSig]]),
    * merge per source in one 16·|docs|-row aggregation, and the
    * pairwise comparison runs on |sources|² tiny rows — the "which
    * crawls duplicate each other" question answered without ever
    * joining documents. min-of-doc-mins = min over the source's whole
    * shingle set, so the oracle computes the same signature directly
    * from the flattened shingles.
    * Output: (a_src, b_src, est_sim) for all source pairs a < b.
    */
  def sourceMinhashSim(spark: SparkSession, sfDir: String): DataFrame = {
    val sig = Tables.documents(spark, sfDir)
      .select(col("source"),
        TextFns.shingleHashes(TextFns.tokenize(col("text"))).as("h"))
      .filter(size(col("h")) > 0)
      .select(col("source"), TextFns.minhashSig("h").as("s"))
      .select(col("source"), posexplode(col("s")).as(Seq("i", "v")))
      .groupBy(col("source"), col("i")).agg(min(col("v")).as("v"))
    sig.select(col("source").as("a_src"), col("i"), col("v").as("va"))
      .join(sig.select(col("source").as("b_src"), col("i"), col("v").as("vb")), Seq("i"))
      .filter(col("a_src") < col("b_src"))
      .groupBy(col("a_src"), col("b_src"))
      .agg((count_if(col("va") === col("vb")).cast("double") / TextFns.MinhashK.toDouble)
        .as("est_sim"))
      .orderBy(col("a_src"), col("b_src"))
  }

  def sourceMinhashSimSql: String = {
    val a = "(1000003*i + 12289)"
    val b = "(999983*i + 15373)"
    s"""WITH sh AS (SELECT source, unnest(h) AS x FROM
       |  (SELECT source, ${TextFns.shingleHashesSql(TextFns.tokenizeSql("text"))} AS h FROM documents)),
       |m AS (SELECT source, i, min(($a * x + $b) % ${TextFns.P}) AS v
       |      FROM sh, generate_series(0, ${TextFns.MinhashK - 1}) AS g(i) GROUP BY 1, 2)
       |SELECT a.source AS a_src, b.source AS b_src,
       | CAST(count(CASE WHEN a.v = b.v THEN 1 END) AS DOUBLE) / ${TextFns.MinhashK}.0 AS est_sim
       |FROM m a JOIN m b ON a.i = b.i AND a.source < b.source
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // ----------------------------------------------------------- diversity

  /** Lexical-diversity scoring — the repetitiveness signals a quality
    * filter thresholds on, all EXACT rationals (no transcendentals, so
    * the cross-engine value oracle holds bit-for-bit):
    *  - type-token ratio: distinct tokens / tokens
    *  - Gini–Simpson diversity: 1 − Σ cnt² / n² (probability two random
    *    tokens differ — the rational stand-in for entropy)
    *  - top-token ratio: max(cnt) / n (boilerplate/spam marker)
    * Output per doc with ≥ 1 token:
    * (doc_id, n_tokens, n_types, ttr, simpson, top_ratio).
    */
  def diversityOn(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(TextFns.tokenize(col(textCol))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("cnt") * col("cnt")).as("sq"), max(col("cnt")).as("top"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        Cols.pround(col("n_types").cast("double") / col("n_tokens"), 6).as("ttr"),
        Cols.pround(lit(1.0) - col("sq").cast("double")
          / (col("n_tokens") * col("n_tokens")), 6).as("simpson"),
        Cols.pround(col("top").cast("double") / col("n_tokens"), 6).as("top_ratio"))

  /** text_diversity testdata binding. */
  def diversity(spark: SparkSession, sfDir: String): DataFrame =
    diversityOn(Tables.documents(spark, sfDir), "doc_id", "text")
      .transform(graft.util.Cols.verifySort(_, col("doc_id")))

  def diversitySql: String =
    s"""WITH e AS (SELECT doc_id, unnest(${TextFns.tokenizeSql("text")}) AS w FROM documents),
       |c AS (SELECT doc_id, w, count(*) AS cnt FROM e GROUP BY 1, 2),
       |m AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens, count(*) AS n_types,
       |      CAST(sum(cnt * cnt) AS BIGINT) AS sq, max(cnt) AS top
       |      FROM c GROUP BY 1)
       |SELECT doc_id, n_tokens, n_types,
       | ${Cols.proundSql("CAST(n_types AS DOUBLE) / n_tokens", 6)} AS ttr,
       | ${Cols.proundSql("1.0 - CAST(sq AS DOUBLE) / (n_tokens * n_tokens)", 6)} AS simpson,
       | ${Cols.proundSql("CAST(top AS DOUBLE) / n_tokens", 6)} AS top_ratio
       |FROM m ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------- splitting

  /** pipeline_split — deterministic train/validation/test assignment:
    * each row's split is a pure function of its id via the portable
    * polynomial hash (`charFold('split:' ‖ id) mod 100` against
    * cumulative percentage cut points) — reproducible across runs,
    * engines, and partitionings, stable under corpus growth (a doc
    * never changes split when new docs arrive — the property date- or
    * position-based splits lack), and zero-shuffle: the assignment is a
    * scan-side expression a 100 TB pipeline evaluates in the first pass
    * (leakage-free by construction: splits partition the id space).
    * `cuts` are integer percentages, e.g. (80, 90) → 80/10/10.
    */
  def splitOn(df: DataFrame, idCol: String, cuts: (Int, Int)): DataFrame = {
    val h = pmod(TextFns.charFold(concat(lit("split:"), col(idCol).cast("string"))),
      lit(100L))
    df.withColumn("split",
      when(h < cuts._1, "train").when(h < cuts._2, "val").otherwise("test"))
  }

  /** pipeline_split testdata binding: 80/10/10 over documents, reported
    * per (source, split) with an exact membership checksum (id sum) so
    * the oracle verifies the ASSIGNMENT, not just the counts.
    */
  def split(spark: SparkSession, sfDir: String): DataFrame =
    splitOn(Tables.documents(spark, sfDir), "doc_id", (80, 90))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
      .orderBy(col("source"), col("split"))

  def splitSql: String = {
    val h = TextFns.charFoldSql("'split:' || CAST(doc_id AS VARCHAR)")
    s"""WITH s AS (SELECT source, doc_id,
       |  CASE WHEN ($h) % 100 < 80 THEN 'train'
       |       WHEN ($h) % 100 < 90 THEN 'val' ELSE 'test' END AS split
       | FROM documents)
       |SELECT source, split, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum
       |FROM s GROUP BY 1, 2 ORDER BY source, split""".stripMargin
  }

  /** Token budget for [[tokenBudget]] — ≈55% of the testdata corpus, so
    * the boundary bucket is genuinely split (some docs in, some out).
    */
  val TokenBudget = 15000L

  /** pipeline_token_budget — greedy best-first dataset assembly under a
    * token budget: take documents in (quality desc, id) order until the
    * budget is spent — the "fill the training run with the best data"
    * selection. A naive implementation is ONE global sort + running
    * sum (serializes the corpus through a single partition); this is
    * the [[graft.operators.RetailEtl.rfm]] bucketed two-phase shape
    * instead: coarse ppm-quality buckets aggregate token totals, a
    * ≤21-row prefix sum finds the BOUNDARY bucket, buckets above it
    * are wholly selected with no per-doc ordering at all, and only the
    * boundary bucket's docs rank within their bucket-local window.
    * Selection is exact-greedy and fully deterministic ((q_ppm, id)
    * total order, integer token counts), so the oracle verifies the
    * MEMBERSHIP via per-source checksums, not just counts.
    * Output: (source, n_docs, n_tokens, id_sum).
    */
  def tokenBudgetOn(docs: DataFrame, budget: Long): DataFrame = {
    val d = docs
      .select(col("source"), col("doc_id"), TextFns.tokenize(col("text")).as("w"),
        col("text"))
      .filter(size(col("w")) > 0)
      .select(col("source"), col("doc_id"), size(col("w")).cast("long").as("n_tok"),
        TextAnalysis.qualityPpm(col("text"), col("w")).as("q_ppm"))
      .withColumn("bkt", expr("q_ppm div 50000"))
    val buckets = d.groupBy(col("bkt"))
      .agg(sum(col("n_tok")).as("b_tok"))
    val wb = Window.orderBy(col("bkt").desc)
    val cum = buckets
      .withColumn("cum_before", coalesce(sum(col("b_tok"))
        .over(wb.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bkt"), col("cum_before"))
    val withCum = d.join(broadcast(cum), Seq("bkt"))
    val wdoc = Window.partitionBy(col("bkt"))
      .orderBy(col("q_ppm").desc, col("doc_id"))
    val selected = withCum
      .withColumn("run", sum(col("n_tok"))
        .over(wdoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_before") + col("run") <= lit(budget))
    selected.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        sum(col("doc_id")).as("id_sum"))
      .orderBy(col("source"))
  }

  /** pipeline_token_budget testdata binding. */
  def tokenBudget(spark: SparkSession, sfDir: String): DataFrame =
    tokenBudgetOn(Tables.documents(spark, sfDir), TokenBudget)

  def tokenBudgetSql: String =
    s"""WITH d AS (
       | SELECT source, doc_id,
       |  CAST(len(words) AS BIGINT) AS n_tok,
       |  ${TextAnalysis.qualityPpmSql} AS q_ppm
       | FROM (SELECT source, doc_id, text, ${TextFns.tokenizeSql("text")} AS words FROM documents)
       | WHERE len(words) > 0),
       |b AS (SELECT q_ppm // 50000 AS bkt, CAST(sum(n_tok) AS BIGINT) AS b_tok
       |      FROM d GROUP BY 1),
       |c AS (SELECT bkt, CAST(coalesce(sum(b_tok) OVER (ORDER BY bkt DESC
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
       |      FROM b),
       |r AS (SELECT d.source, d.doc_id, d.n_tok, c.cum_before,
       |       CAST(sum(d.n_tok) OVER (PARTITION BY d.q_ppm // 50000
       |         ORDER BY d.q_ppm DESC, d.doc_id
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
       |      FROM d JOIN c ON d.q_ppm // 50000 = c.bkt)
       |SELECT source, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       | CAST(sum(doc_id) AS BIGINT) AS id_sum
       |FROM r WHERE cum_before + run <= $TokenBudget
       |GROUP BY source ORDER BY source""".stripMargin

  /** pipeline_epoch_order — deterministic per-epoch example ordering,
    * the data-loader reshuffle of a training run expressed as a query:
    * each epoch permutes the corpus by a PORTABLE hash of (epoch, id)
    * — reproducible across engines, runs, and partitionings, unlike
    * seeded-RNG shuffles — and examples are dealt to `shards` loader
    * shards with a shard-local position. The parallel unit is (epoch,
    * shard): the position window sorts only ~N/shards rows per task
    * and there is NO global sort at any corpus size (a global
    * row_number would serialize the corpus through one partition).
    * Output: (epoch, shard, pos, doc_id).
    */
  def epochOrderOn(df: DataFrame, idCol: String, epochs: Int,
      shards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = df.select(col(idCol).as("doc_id"),
        explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      .withColumn("h", pmod(TextFns.charFold(
        concat(lit("epoch:"), col("epoch").cast("string"),
          lit(":"), col("doc_id").cast("string"))), lit(1000000007L)))
      .withColumn("shard", pmod(col("h"), lit(shards.toLong)).cast("int"))
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("h"), col("doc_id"))
    e.withColumn("pos", row_number().over(w))
      .select(col("epoch").cast("int").as("epoch"), col("shard"),
        col("pos"), col("doc_id"))
  }

  /** pipeline_epoch_order testdata binding: 2 epochs × 4 shards. */
  def epochOrder(spark: SparkSession, sfDir: String): DataFrame =
    epochOrderOn(Tables.documents(spark, sfDir), "doc_id", epochs = 2, shards = 4)
      .transform(graft.util.Cols.verifySort(_, col("epoch"), col("shard"), col("pos")))

  def epochOrderSql: String = {
    val h = TextFns.charFoldSql(
      "'epoch:' || CAST(ep AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")
    s"""WITH e AS (
       | SELECT doc_id, CAST(ep AS INTEGER) AS epoch, ($h) % 1000000007 AS h
       | FROM documents, generate_series(0, 1) AS g(ep))
       |SELECT epoch, CAST(h % 4 AS INTEGER) AS shard,
       | CAST(row_number() OVER (PARTITION BY epoch, h % 4 ORDER BY h, doc_id) AS INTEGER) AS pos,
       | doc_id
       |FROM e ORDER BY epoch, shard, pos""".stripMargin
  }

  // --------------------------------------------------------- batching

  /** Fixed power-of-two sequence-length buckets for
    * [[lengthBucketsOn]]. FIXED thresholds, not data-derived (a
    * quantile-derived bucketing would shift when the corpus grows —
    * batch shapes must be stable across pipeline runs; and computing
    * exact corpus quantiles is a sort, this is a scan).
    */
  val LengthBuckets: Seq[Int] = Seq(64, 128, 256, 512, 1024, 2048, 4096, 8192)

  /** pipeline_length_buckets — length-bucketed batching profile: docs
    * binned to the smallest power-of-two sequence length that fits,
    * with EXACT padding-waste accounting per bucket (padded slots =
    * bucket · n_docs; waste_ppm = wasted slots per million, integer
    * floor division) — the report that decides bucket boundaries for a
    * padded-batch training run, where the waste hides in the long
    * tail. One scan (token counts are scan-side) + one map-side
    * combined aggregate whose state is |buckets| rows; integer output
    * end-to-end so the oracle is exact.
    * Output: (bucket, n_docs, sum_tokens, padded_tokens, waste_ppm).
    */
  def lengthBucketsOn(df: DataFrame, textCol: String): DataFrame = {
    val n = size(TextFns.tokenize(col(textCol)))
    val bucket = LengthBuckets.init.reverse
      .foldLeft(lit(LengthBuckets.last): Column)((acc, b) =>
        when(col("n_tok") <= b, b).otherwise(acc))
    df.select(n.as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("bucket", bucket)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).cast("long").as("sum_tokens"))
      .withColumn("padded_tokens", col("bucket").cast("long") * col("n_docs"))
      .withColumn("waste_ppm",
        expr("((padded_tokens - sum_tokens) * 1000000) div padded_tokens"))
      .select(col("bucket"), col("n_docs"), col("sum_tokens"),
        col("padded_tokens"), col("waste_ppm"))
  }

  /** pipeline_length_buckets testdata binding. */
  def lengthBuckets(spark: SparkSession, sfDir: String): DataFrame =
    lengthBucketsOn(Tables.documents(spark, sfDir), "text").orderBy(col("bucket"))

  def lengthBucketsSql: String = {
    val cases = LengthBuckets.init.map(b => s"WHEN n_tok <= $b THEN $b")
      .mkString(" ")
    s"""WITH t AS (SELECT CAST(len(${TextFns.tokenizeSql("text")}) AS INTEGER) AS n_tok
       |           FROM documents),
       |b AS (SELECT CASE $cases ELSE ${LengthBuckets.last} END AS bucket, n_tok
       |      FROM t WHERE n_tok > 0),
       |a AS (SELECT bucket, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tokens
       |      FROM b GROUP BY 1)
       |SELECT bucket, n_docs, sum_tokens,
       | CAST(bucket * n_docs AS BIGINT) AS padded_tokens,
       | CAST((bucket * n_docs - sum_tokens) * 1000000 // (bucket * n_docs) AS BIGINT) AS waste_ppm
       |FROM a ORDER BY bucket""".stripMargin
  }

  // ----------------------------------------------------------------- dsir

  /** DSIR contract constants, shared with the oracle: hashed-feature
    * bucket count and fixed-point fractional bits of the integer log2.
    */
  val DsirB = 1024L
  val DsirF = 12

  /** Per-doc hashed n-gram feature buckets (unigram + bigram token
    * hashes mod [[DsirB]], with multiplicity — the bag-of-hashed-ngrams
    * model DSIR estimates distributions over). The token-hash array is
    * bound via a single-element `transform` lambda so it evaluates once
    * per row (the [[TextFns.shingleHashes]] CSE device).
    */
  private def dsirFeatures(words: Column): Column =
    element_at(transform(array(TextFns.tokenHashes(words)), a =>
      concat(
        transform(a, h => h % DsirB),
        when(size(a) >= 2,
          transform(sequence(lit(1), size(a) - 1), i =>
            ((element_at(a, i) * 131 + element_at(a, i + 1)) % TextFns.P) % DsirB))
          .otherwise(array().cast("array<bigint>")))), 1)

  private def dsirFeaturesSql(words: String): String =
    s"list_transform([${TextFns.tokenHashesSql(words)}], a -> " +
      s"list_concat(list_transform(a, h -> h % $DsirB), " +
      s"CASE WHEN len(a) >= 2 THEN list_transform(generate_series(1, len(a)-1), i -> " +
      s"((a[i]*131 + a[i+1]) % ${TextFns.P}) % $DsirB) ELSE [] END))[1]"

  /** pipeline_dsir — Data Selection via Importance Resampling (Xie et
    * al. 2023, arXiv:2302.03169): score every raw doc by how much more
    * likely it is under a TARGET distribution than under the raw-corpus
    * distribution, both estimated as hashed-ngram bag models —
    * weight(doc) = Σ_features log(p_target(f) / p_raw(f)) with
    * add-one smoothing. Docs with weight ≥ 0 look more target-like
    * than corpus-like; downstream selection resamples by this weight.
    *
    * The repo's exactness rule extended one step: a floating ln() would
    * make the score engine-dependent, so the log2 is computed in FIXED
    * POINT ([[DsirF]] fractional bits) by pure int64 arithmetic — the
    * ratio scales to q = max(1, num·2^F div den) (the max(1,·) floors a
    * vanishing ratio at −F·2^F units ≈ −12 bits, documented clamp);
    * integer part via the length(bin(q))−1 device (text_tokens'
    * integer log2), fractional bits by the classic SQUARING method
    * (square the [1,2) fixed-point mantissa; ≥2 ⇒ emit bit, halve —
    * each of the F steps is one integer multiply/shift). Identical
    * integers on both engines ⇒ the whole op value-oracles exactly.
    * Per-doc totals are INTEGER sums of per-bucket weights — order-free,
    * no float-fold contract needed. Exact while total feature
    * occurrences × per-bucket counts stay under 2^51 (num·2^F head
    * room); past that, scale the smoothing to per-mille counts before
    * widening the fixed point.
    *
    * Scale shape: feature explode is scan-side; the distribution table
    * is [[DsirB]] rows (the POINT of hashing the feature space — at
    * any corpus size the model is a constant-size broadcast, exactly
    * why the paper's method runs on full CommonCrawl); the fixed-point
    * log chain rides those B rows; per-doc scoring is one broadcast
    * join on the exploded stream + one map-side-combined doc_id sum —
    * a single corpus-sized shuffle end to end.
    * Output: (doc_id, n_feats, dsir_fp, keep); dsir_fp in 2^-F bits.
    */
  def dsirOn(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    val f = df.select(col(idCol).as("doc_id"), isTarget.cast("long").as("tgt"),
        explode(dsirFeatures(TextFns.tokenize(col(textCol)))).as("h"))
      .transform(graft.util.CacheScope.cached) // feeds the stats build AND the scoring join
    val stats = f.groupBy(col("h"))
      .agg(count(lit(1)).as("cr"), sum(col("tgt")).as("ct"))
    val tot = stats.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val wq = stats.crossJoin(broadcast(tot))
      .withColumn("q", greatest(lit(1L), expr(
        s"shiftleft((ct + 1) * (nr + $DsirB), $DsirF) div ((cr + 1) * (nt + $DsirB))")))
    val wt = graft.util.FixedLog2.log2Fp(wq, "q", "w_fp", DsirF)
      .select(col("h"), col("w_fp"))
    f.join(broadcast(wt), Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("w_fp")).as("dsir_fp"))
      .select(col("doc_id"), col("n_feats"), col("dsir_fp"),
        when(col("dsir_fp") >= 0, 1).otherwise(0).cast("int").as("keep"))
  }

  /** pipeline_dsir testdata binding: target distribution = the
    * lang='en' slice (the usual proxy-target setup: a trusted subset
    * stands in for the domain you want more of).
    */
  def dsir(spark: SparkSession, sfDir: String): DataFrame =
    dsirOn(Tables.documents(spark, sfDir), "doc_id", "text",
      col("lang") === "en")
      .transform(graft.util.Cols.verifySort(_, col("doc_id")))

  def dsirSql: String = {
    val (chain, fin) =
      graft.util.FixedLog2.sqlCtes("w0", Seq("h"), "w_fp", DsirF)
    s"""WITH f AS (SELECT doc_id, tgt, unnest(features) AS h FROM (
       |      SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS tgt,
       |        ${dsirFeaturesSql(TextFns.tokenizeSql("text"))} AS features
       |      FROM documents)),
       |s AS (SELECT h, CAST(count(*) AS BIGINT) AS cr, CAST(sum(tgt) AS BIGINT) AS ct
       |      FROM f GROUP BY 1),
       |t AS (SELECT CAST(sum(cr) AS BIGINT) AS nr, CAST(sum(ct) AS BIGINT) AS nt FROM s),
       |w0 AS (SELECT h, greatest(CAST(1 AS BIGINT),
       |        (((ct + 1) * (nr + $DsirB)) << $DsirF) // ((cr + 1) * (nt + $DsirB))) AS q
       |       FROM s CROSS JOIN t),
       |$chain,
       |d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
       |       CAST(sum(w_fp) AS BIGINT) AS dsir_fp
       |      FROM f JOIN $fin USING (h) GROUP BY 1)
       |SELECT doc_id, n_feats, dsir_fp,
       | CAST(CASE WHEN dsir_fp >= 0 THEN 1 ELSE 0 END AS INTEGER) AS keep
       |FROM d ORDER BY doc_id""".stripMargin
  }
}
