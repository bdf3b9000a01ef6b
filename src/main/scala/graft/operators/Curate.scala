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
      .orderBy(col("doc_id"))
  }

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
