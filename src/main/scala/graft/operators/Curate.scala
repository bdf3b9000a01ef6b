package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables

/** pipeline_curate — the canonical training-data curation pipeline,
  * composed from the library's own operators:
  *
  *   language filter (langid en) ∧ quality threshold ∧
  *   near-dup cluster roots only (one representative per cluster)
  *
  * This is the end-to-end shape a 100 TB corpus actually runs: each
  * stage is scan-side or one shuffle, and the dedup stage reuses the
  * cluster labels — no operator here is bespoke, which is the point of
  * a composable DataFrame library. Fully value-oracled: the DuckDB
  * oracle composes the same stage SQL (including the recursive-CTE
  * closure) and must produce identical survivors.
  */
object Curate {

  def curate(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val english = TextAnalysis.langidOn(docs, "doc_id", "text")
      .filter(col("pred_lang") === "en").select(col("doc_id"))
    val quality = TextAnalysis.qualityOn(docs, "doc_id", "text")
      .filter(col("quality_score") >= 0.6)
      .select(col("doc_id"), col("n_words"), col("quality_score"))
    val roots = Dedup.clustersOn(
        Dedup.ngramJaccardOn(docs, "doc_id", "text", 0.5),
        docs.select(col("doc_id").as("id")))
      .filter(col("doc_id") === col("cluster_id"))
      .select(col("doc_id"))
    quality.join(english, Seq("doc_id")).join(roots, Seq("doc_id"))
      .transform(graft.util.Cols.verifySort(_, col("doc_id")))
  }

  /** pipeline_stratified — deterministic stratified sampling: keep up
    * to `perClass` documents per class (here: predicted language),
    * chosen by polynomial-hash order — the class-balancing step of a
    * training-data pipeline. Hash order makes the sample REPRODUCIBLE
    * across engines, runs, and partitionings (seed-RNG sampling is
    * none of those), and the per-class rank is one window over one
    * shuffle on the class key.
    */
  def stratified(spark: SparkSession, sfDir: String, perClass: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    val classed = TextAnalysis.langidOn(docs, "doc_id", "text")
      .select(col("doc_id"), col("pred_lang"))
    val w = Window.partitionBy(col("pred_lang"))
      .orderBy(expr("(doc_id * 1000003 + 12289) % 2147483647"), col("doc_id"))
    classed.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= perClass)
      .select(col("doc_id"), col("pred_lang"), col("rk"))
      .orderBy(col("pred_lang"), col("rk"))
  }

  def stratifiedSql: String =
    s"""WITH classed AS (SELECT doc_id, pred_lang FROM (${TextAnalysis.langidSql.replace("ORDER BY doc_id", "")})),
       |r AS (SELECT doc_id, pred_lang,
       |        row_number() OVER (PARTITION BY pred_lang
       |          ORDER BY (doc_id * 1000003 + 12289) % 2147483647, doc_id) AS rk
       |      FROM classed)
       |SELECT doc_id, pred_lang, CAST(rk AS INTEGER) AS rk
       |FROM r WHERE rk <= 100 ORDER BY pred_lang, rk""".stripMargin

  /** pipeline_reservoir — fixed-k per-stratum deterministic sampling
    * via the bounded-heap aggregate: the SCALE form of
    * [[stratified]]'s window sort. Priority is the q25 portable
    * polynomial hash of the id; (priority, id) is packed into one
    * int64 (priority·2²² + id — ids must fit 22 bits here; wider ids
    * would pack into priority·2⁴⁰ style splits or hash-join back) and
    * graft_topk keeps the k LARGEST packed values per stratum, which
    * is exactly ORDER BY priority DESC, id DESC LIMIT k because the
    * pack is lexicographic. Where the window form shuffles and sorts
    * EVERY row of every stratum, this ships k-element heaps per map
    * task — per-stratum state is O(k) and merges, so the sample of a
    * 100 TB corpus costs one map-side-combined aggregation and the
    * explode of |strata|·k longs. Output: (stratum, id, priority).
    */
  def reservoirOn(df: DataFrame, stratumCol: String, idCol: String,
      k: Int): DataFrame = {
    // loud failure beats silent corruption: an id outside the 22-bit
    // pack range would scramble the (priority, id) ordering, so the
    // scan itself rejects it (zero-cost branch in codegen when ids
    // are in range)
    val packed = expr(
      s"""IF($idCol BETWEEN 0 AND 4194303,
         |((($idCol % 2147483647) * 1000003 + 12289) % 2147483647) * 4194304 + $idCol,
         |raise_error(concat('pipeline_reservoir: id out of 22-bit pack range: ',
         |  cast($idCol as string))))""".stripMargin)
    df.select(col(stratumCol), packed.as("packed"))
      .groupBy(col(stratumCol))
      .agg(graft.functions.TopKAgg.column(col("packed"), k).as("top"))
      .select(col(stratumCol), explode(col("top")).as("packed"))
      .select(col(stratumCol),
        (col("packed") % 4194304L).as(idCol),
        expr("packed div 4194304").as("priority"))
      .orderBy(col(stratumCol), col("priority").desc, col(idCol).desc)
  }

  /** pipeline_reservoir testdata binding: 20 docs per source. */
  def reservoir(spark: SparkSession, sfDir: String): DataFrame =
    reservoirOn(Tables.documents(spark, sfDir), "source", "doc_id", 20)

  def reservoirSql: String =
    """WITH pr AS (
      | SELECT source, doc_id,
      |  ((doc_id % 2147483647) * 1000003 + 12289) % 2147483647 AS priority
      | FROM documents),
      |r AS (
      | SELECT source, doc_id, priority,
      |  row_number() OVER (PARTITION BY source ORDER BY priority DESC, doc_id DESC) AS rk
      | FROM pr)
      |SELECT source, doc_id, priority FROM r WHERE rk <= 20
      |ORDER BY source, priority DESC, doc_id DESC""".stripMargin

  /** dedup_keep_best — the keep-POLICY layer over near-dup clustering:
    * per cluster, keep the member with the highest quality score (ties
    * → lowest doc id), reporting cluster size and the kept doc's
    * quality. This is the decision a real curation pipeline makes —
    * "one representative per duplicate cluster, and the BEST one" —
    * where pipeline_curate's root-only policy keeps an arbitrary
    * (min-id) member. Zero-token docs have no quality row and carry a
    * −1 sentinel, so they never win against a scored member.
    */
  def keepBest(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val clusters = Dedup.clustersOn(
      Dedup.ngramJaccardOn(docs, "doc_id", "text", 0.5),
      docs.select(col("doc_id").as("id")))
    val quality = TextAnalysis.qualityOn(docs, "doc_id", "text")
      .select(col("doc_id"), col("quality_score"))
    // "best member" is an argmax, not a ranking: max over (qs, -doc_id)
    // structs gives the highest-quality member with lowest-id tie-break
    // as a PARTIALLY AGGREGATABLE group state (map-side combine, no
    // per-cluster sort) — the window formulation sorts every cluster's
    // full membership just to read row 1, which at corpus scale is a
    // full shuffle + sort of all N rows instead of a combine down to
    // one struct per cluster per mapper.
    clusters.join(quality, Seq("doc_id"), "left")
      .withColumn("qs", coalesce(col("quality_score"), lit(-1.0)))
      .groupBy(col("cluster_id"))
      .agg(
        max(struct(col("qs"), (-col("doc_id")).as("nid"))).as("m"),
        count(lit(1)).cast("int").as("n_members"))
      .select(col("cluster_id"), (-col("m.nid")).as("keep_id"),
        col("n_members"), col("m.qs").as("best_quality"))
      .transform(graft.util.Cols.verifySort(_, col("cluster_id")))
  }

  def keepBestSql: String =
    s"""WITH cl AS (${Dedup.clusterSql.replace("ORDER BY d.doc_id", "")}),
       |q AS (SELECT doc_id, quality_score FROM (${TextAnalysis.qualitySql.replace("ORDER BY doc_id", "")})),
       |j AS (SELECT cl.doc_id, cl.cluster_id, coalesce(q.quality_score, -1.0) AS qs
       |      FROM cl LEFT JOIN q ON cl.doc_id = q.doc_id),
       |r AS (SELECT j.*, row_number() OVER (PARTITION BY cluster_id ORDER BY qs DESC, doc_id) AS rk,
       |             count(*) OVER (PARTITION BY cluster_id) AS n_members FROM j)
       |SELECT cluster_id, doc_id AS keep_id, CAST(n_members AS INTEGER) AS n_members, qs AS best_quality
       |FROM r WHERE rk = 1 ORDER BY cluster_id""".stripMargin

  def curateSql: String =
    s"""SELECT q.doc_id, q.n_words, q.quality_score
       |FROM (SELECT doc_id, n_words, quality_score FROM (${TextAnalysis.qualitySql.replace("ORDER BY doc_id", "")})
       |      WHERE quality_score >= 0.6) q
       |JOIN (SELECT doc_id FROM (${TextAnalysis.langidSql.replace("ORDER BY doc_id", "")})
       |      WHERE pred_lang = 'en') l ON q.doc_id = l.doc_id
       |JOIN (SELECT doc_id FROM (${Dedup.clusterSql.replace("ORDER BY d.doc_id", "")})
       |      WHERE doc_id = cluster_id) c ON q.doc_id = c.doc_id
       |ORDER BY q.doc_id""".stripMargin
}
