package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.{Cols, Tables}

/** Embedding similarity search (SURVEY.md §2.C) over `embeddings`
  * (64-dim float vectors).
  *
  * Numeric portability: every dot product is an explicit left fold in
  * DOUBLE over index order — the same IEEE operation sequence in Spark
  * (`aggregate`/`zip_with`) and DuckDB (`list_reduce`/`list_transform`),
  * so cosine values are bit-identical and fully value-oracled.
  *
  * Scale: brute-force is the correctness baseline (broadcast the query
  * set, scan candidates once — embarrassingly parallel but O(Q·N)).
  * The production path is [[lshAnn]]: sign-random-projection bucketing,
  * candidates meet queries in a bucket equi-join — O(N) shuffle keyed by
  * bucket, per-bucket top-k.
  */
object Similarity {

  val P: Long = 2147483647L

  /** Left-fold double dot product of two float-array columns (SQL text
    * shared with the oracle builder below).
    */
  private def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, v) -> acc + v)"

  /** Spark-side cosine: the codegen'd [[graft.functions.FloatVecDot]]
    * (same IEEE fold order as [[dotExpr]]/[[dotSql]], so the oracle is
    * unchanged) instead of the interpreted higher-order lambda.
    */
  private def cosExpr(a: String, b: String): Column = {
    val d = graft.functions.FloatVecDot.column(col(a), col(b))
    val na = graft.functions.FloatVecDot.column(col(a), col(a))
    val nb = graft.functions.FloatVecDot.column(col(b), col(b))
    d / sqrt(na * nb)
  }

  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / sqrt(${dotSql(a, a)} * ${dotSql(b, b)})"

  /** Deterministic sign-random-projection bucket (nPlanes bits): plane
    * i's component for dimension d is ±1 from a polynomial PRNG — no
    * stored model, reproducible everywhere. Spark side is the codegen'd
    * [[graft.functions.SrpBucket]]; [[bucketSql]] is the same arithmetic
    * for the DuckDB oracle.
    */
  private def bucketCol(v: String, nPlanes: Int): Column =
    graft.functions.SrpBucket.column(col(v), nPlanes)

  private def bucketSql(v: String, nPlanes: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(0, ${nPlanes - 1}), i -> " +
      s"CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(generate_series(1, len($v)), d -> CAST($v[d] AS DOUBLE) * " +
      s"(CASE WHEN (1000003 * (i * 64 + d - 1) + 12289) % $P > 1073741823 THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END))), (a, b) -> a + b) > 0 " +
      s"THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END)), (a, b) -> a + b)"

  /** Exact cosine top-k join: for each row of `queries` (`q_id`, `qv`)
    * the k highest-cosine rows of `candidates` (`c_id`, `cv`).
    * The query set is broadcast; the candidate scan is a single
    * distributed pass — the correctness baseline (O(Q·N)); use
    * [[lshTopkOn]] when Q is large. Output: (q_id, c_id, cos_sim, rk).
    */
  def bruteforceTopkOn(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    candidates.crossJoin(broadcast(queries))
      .withColumn("cos", cosExpr("qv", "cv"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("c_id"),
        Cols.pround(col("cos"), 6).as("cos_sim"),
        col("rk"))
  }

  /** sim_bruteforce_topk testdata binding: queries = vec_id < 8,
    * candidates = the rest, k = 5.
    */
  def bruteforceTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    bruteforceTopkOn(
      e.filter(col("vec_id") < 8).select(col("vec_id").as("q_id"), col("embedding").as("qv")),
      e.filter(col("vec_id") >= 8).select(col("vec_id").as("c_id"), col("embedding").as("cv")),
      5)
      .orderBy(col("q_id"), col("rk"))
  }

  def bruteforceTopkSql: String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
       |c AS (SELECT vec_id AS c_id, embedding AS cv FROM embeddings WHERE vec_id >= 8),
       |s AS (SELECT q_id, c_id, ${cosSql("qv", "cv")} AS cos FROM q CROSS JOIN c),
       |r AS (SELECT q_id, c_id, cos, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rk FROM s)
       |SELECT q_id, c_id, floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cos_sim, CAST(rk AS INTEGER) AS rk
       |FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

  /** LSH-bucketed ANN top-k join: queries (`q_id`, `qv`) meet candidates
    * (`c_id`, `cv`) in a sign-random-projection bucket equi-join, then
    * per-query top-k by TRUE cosine — the scale path (O(N) shuffle keyed
    * by bucket instead of all-pairs). `broadcastQueries` for small probe
    * sets; otherwise both sides shuffle on the bucket.
    * Output: (q_id, c_id, bucket, cos_sim, rk).
    */
  def lshTopkOn(queries: DataFrame, candidates: DataFrame, k: Int,
      nPlanes: Int = 8, broadcastQueries: Boolean = false,
      multiProbe: Boolean = false): DataFrame = {
    val home = bucketCol("qv", nPlanes)
    // multi-probe: also search every 1-bit-flip neighbor bucket —
    // queries replicate ×(nPlanes+1) (cheap, query side is small);
    // recall rises toward brute force without touching the candidate
    // side's O(N) bucket shuffle. Probe buckets are pairwise distinct,
    // so no candidate dedup is needed.
    val q0 =
      if (multiProbe)
        queries.withColumn("bucket", explode(array(
          home +: (0 until nPlanes).map(i => home.bitwiseXOR(lit(1L << i))): _*)))
      else queries.withColumn("bucket", home)
    val q = if (broadcastQueries) broadcast(q0) else q0
    val c = candidates.withColumn("bucket", bucketCol("cv", nPlanes))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    c.join(q, Seq("bucket"))
      .withColumn("cos", cosExpr("qv", "cv"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("c_id"), col("bucket"),
        Cols.pround(col("cos"), 6).as("cos_sim"),
        col("rk"))
  }

  /** sim_lsh_ann testdata binding: same probe/candidate split as
    * [[bruteforceTopk]], 8 planes, broadcast probes.
    */
  def lshAnn(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    lshTopkOn(
      e.filter(col("vec_id") < 8).select(col("vec_id").as("q_id"), col("embedding").as("qv")),
      e.filter(col("vec_id") >= 8).select(col("vec_id").as("c_id"), col("embedding").as("cv")),
      5, broadcastQueries = true)
      .orderBy(col("q_id"), col("rk"))
  }

  def lshAnnSql: String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qv, ${bucketSql("embedding", 8)} AS bucket
       |           FROM embeddings WHERE vec_id < 8),
       |c AS (SELECT vec_id AS c_id, embedding AS cv, ${bucketSql("embedding", 8)} AS bucket
       |      FROM embeddings WHERE vec_id >= 8),
       |s AS (SELECT q_id, c_id, q.bucket, ${cosSql("qv", "cv")} AS cos
       |      FROM q JOIN c ON q.bucket = c.bucket),
       |r AS (SELECT q_id, c_id, bucket, cos, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rk FROM s)
       |SELECT q_id, c_id, bucket, floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cos_sim, CAST(rk AS INTEGER) AS rk
       |FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

  /** sim_lsh_multiprobe — same probe/candidate split as [[lshAnn]] but
    * probing the home bucket plus all 8 one-bit-flip buckets.
    */
  def lshMultiprobe(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    lshTopkOn(
      e.filter(col("vec_id") < 8).select(col("vec_id").as("q_id"), col("embedding").as("qv")),
      e.filter(col("vec_id") >= 8).select(col("vec_id").as("c_id"), col("embedding").as("cv")),
      5, broadcastQueries = true, multiProbe = true)
      .select(col("q_id"), col("c_id"), col("cos_sim"), col("rk"))
      .orderBy(col("q_id"), col("rk"))
  }

  def lshMultiprobeSql: String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qv, ${bucketSql("embedding", 8)} AS b0
       |           FROM embeddings WHERE vec_id < 8),
       |qp AS (SELECT q_id, qv, b0 AS bucket FROM q
       |       UNION ALL SELECT q_id, qv, xor(b0, CAST(1 AS BIGINT) << i) FROM q, generate_series(0, 7) AS g(i)),
       |c AS (SELECT vec_id AS c_id, embedding AS cv, ${bucketSql("embedding", 8)} AS bucket
       |      FROM embeddings WHERE vec_id >= 8),
       |s AS (SELECT q_id, c_id, ${cosSql("qv", "cv")} AS cos FROM qp JOIN c ON qp.bucket = c.bucket),
       |r AS (SELECT q_id, c_id, cos, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rk FROM s)
       |SELECT q_id, c_id, floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cos_sim, CAST(rk AS INTEGER) AS rk
       |FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

  /** Fixed centroid count for [[ivfAnn]] — a real IVF trains a CONSTANT
    * k (4096-ish) regardless of corpus size, so assignment is O(N·k)
    * with a constant-size driver broadcast. A centroid set that scales
    * with N (e.g. every 64th vector) makes assignment O(N²/64) and the
    * broadcast O(N) — the round-1 design flaw this constant fixes.
    */
  val IvfK = 256

  /** sim_ivf_ann — IVF-skeleton ANN: candidates are assigned to their
    * nearest coarse centroid (the inverted file's cell), queries probe
    * their nprobe=2 nearest cells, true-cosine top-5 within the probed
    * cells. Centroids are a deterministic hash-ranked sample of exactly
    * [[IvfK]] vectors (min(N, k)) standing in for trained k-means
    * centers — the cardinality POLICY is the real one: |centroids| is
    * independent of N, so at scale the candidate side shuffles once on
    * cell id, assignment costs O(N·k) against a constant-size broadcast,
    * and probe fan-out is nprobe cells instead of the whole corpus.
    */
  def ivfAnn(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val cents = e
      .orderBy(expr(s"(vec_id * 1000003 + 12289) % $P"), col("vec_id")).limit(IvfK)
      .select(col("vec_id").as("cent_id"), col("embedding").as("centv"))
    val wAssign = Window.partitionBy(col("c_id")).orderBy(col("ccos").desc, col("cent_id"))
    val assigned = e.filter(col("vec_id") >= 8)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(cents))
      .withColumn("ccos", cosExpr("cv", "centv"))
      .withColumn("ark", row_number().over(wAssign)).filter(col("ark") === 1)
      .select(col("c_id"), col("cv"), col("cent_id"))
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("qcos").desc, col("cent_id"))
    val probes = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("qcos", cosExpr("qv", "centv"))
      .withColumn("prk", row_number().over(wProbe)).filter(col("prk") <= 2)
      .select(col("q_id"), col("qv"), col("cent_id"))
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    assigned.join(broadcast(probes), Seq("cent_id"))
      .withColumn("cos", cosExpr("qv", "cv"))
      .withColumn("rk", row_number().over(wTop)).filter(col("rk") <= 5)
      .select(col("q_id"), col("c_id"), col("cent_id"),
        Cols.pround(col("cos"), 6).as("cos_sim"), col("rk"))
      .orderBy(col("q_id"), col("rk"))
  }

  def ivfAnnSql: String =
    s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS centv FROM embeddings
       |               ORDER BY (vec_id * 1000003 + 12289) % $P, vec_id LIMIT $IvfK),
       |cand AS (SELECT vec_id AS c_id, embedding AS cv FROM embeddings WHERE vec_id >= 8),
       |assign0 AS (SELECT c_id, cv, cent_id,
       |             row_number() OVER (PARTITION BY c_id ORDER BY ${cosSql("cv", "centv")} DESC, cent_id) AS ark
       |            FROM cand CROSS JOIN cents),
       |assigned AS (SELECT c_id, cv, cent_id FROM assign0 WHERE ark = 1),
       |qs AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
       |probe0 AS (SELECT q_id, qv, cent_id,
       |            row_number() OVER (PARTITION BY q_id ORDER BY ${cosSql("qv", "centv")} DESC, cent_id) AS prk
       |           FROM qs CROSS JOIN cents),
       |probes AS (SELECT q_id, qv, cent_id FROM probe0 WHERE prk <= 2),
       |s AS (SELECT q_id, c_id, p.cent_id, ${cosSql("qv", "cv")} AS cos
       |      FROM assigned a JOIN probes p ON a.cent_id = p.cent_id),
       |r AS (SELECT q_id, c_id, cent_id, cos,
       |       row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rk FROM s)
       |SELECT q_id, c_id, cent_id, floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cos_sim, CAST(rk AS INTEGER) AS rk
       |FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

  /** embed_knn_join — k-NN join between two embedding sets (label 0 =
    * probe side, others = build side): candidates meet probes in a
    * sign-random-projection bucket equi-join, top-3 true-cosine
    * neighbors per probe. At corpus scale this is the shape of a
    * dataset-vs-dataset semantic join: O(N) bucket shuffle, per-bucket
    * scoring, per-probe top-k — never an all-pairs product.
    */
  def knnJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    lshTopkOn(
      e.filter(col("label") === 0).select(col("vec_id").as("q_id"), col("embedding").as("qv")),
      e.filter(col("label") =!= 0).select(col("vec_id").as("c_id"), col("embedding").as("cv")),
      3)
      .select(col("q_id"), col("c_id"), col("cos_sim"), col("rk"))
      .orderBy(col("q_id"), col("rk"))
  }

  def knnJoinSql: String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qv, ${bucketSql("embedding", 8)} AS bucket
       |           FROM embeddings WHERE label = 0),
       |c AS (SELECT vec_id AS c_id, embedding AS cv, ${bucketSql("embedding", 8)} AS bucket
       |      FROM embeddings WHERE label <> 0),
       |s AS (SELECT q_id, c_id, ${cosSql("qv", "cv")} AS cos FROM q JOIN c ON q.bucket = c.bucket),
       |r AS (SELECT q_id, c_id, cos, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rk FROM s)
       |SELECT q_id, c_id, floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cos_sim, CAST(rk AS INTEGER) AS rk
       |FROM r WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin

  /** dedup_embed_cosine — embedding-cosine near-dup pairs: same LSH
    * bucket AND true cosine ≥ 0.4. The bucket equi-join is the scale
    * path (≈N/2^planes candidates per vector); the oracle applies the
    * identical bucket prefilter, so results match by construction.
    */
  /** Embedding-cosine near-dup pairs within one vector set (`id`,
    * `vec`): same LSH bucket AND true cosine ≥ `threshold`.
    * Output: (a_id, b_id, cos_sim) with a_id < b_id.
    */
  def cosineNearDupOn(vectors: DataFrame, threshold: Double,
      nPlanes: Int = 8): DataFrame = {
    val e = vectors.withColumn("bucket", bucketCol("vec", nPlanes))
    val a = e.select(col("id").as("a_id"), col("vec").as("va"), col("bucket"))
    val b = e.select(col("id").as("b_id"), col("vec").as("vb"), col("bucket"))
    a.join(b, Seq("bucket")).filter(col("a_id") < col("b_id"))
      .withColumn("cos", cosExpr("va", "vb"))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), Cols.pround(col("cos"), 6).as("cos_sim"))
  }

  def embedCosineDedup(spark: SparkSession, sfDir: String): DataFrame =
    cosineNearDupOn(
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id").as("id"), col("embedding").as("vec")),
      0.4)
      .orderBy(col("a_id"), col("b_id"))

  def embedCosineDedupSql: String =
    s"""WITH e AS (SELECT vec_id, embedding, ${bucketSql("embedding", 8)} AS bucket FROM embeddings),
       |s AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, ${cosSql("a.embedding", "b.embedding")} AS cos
       |      FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT a_id, b_id, floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
       |FROM s WHERE cos >= 0.4 ORDER BY a_id, b_id""".stripMargin
}
