package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.TxTable

/** Micro-benchmark for the mergeClauses NMBS-candidate split question
  * (ADVICE-r16 medium): a merge whose matched side touches FEW files
  * (narrow key band) but whose NOT-MATCHED-BY-SOURCE condition touches
  * MANY currently left-outer-joins every NMBS file's rows against the
  * source — even files [[TxTable.keyCandidates]] proved hold no source
  * key. Scenario: 4M rows / 64 key-clustered files, a 1M-row source
  * hitting the first ~2 files' band, an NMBS update whose condition
  * stats cannot exclude any file. Usage:
  *   Test/runMain graft.MergeClausesBench [nRows [nFiles]]
  */
object MergeClausesBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 4000000L
    val files = if (args.length > 1) args(1).toInt else 64
    val spark = SparkSpecBase.session
    import spark.implicits._
    val t = Files.createTempDirectory("graft_mcb").resolve("t").toString
    val base = spark.range(n)
      .select(col("id").as("k"),
        concat(lit("S"), pmod(col("id") * 2654435761L, lit(10))).as("seg"),
        lit("base").as("tag"),
        (col("id") % 1000).as("amt"))
    TxTable.create(spark, t,
      base.repartitionByRange(files, col("k")), Seq("k"))
    // source: 1M rows inside the first ~1/32 of the key space (few
    // matched-candidate files), big enough that the join cannot
    // broadcast
    val srcN = n / 4
    val src = spark.range(srcN)
      .select((col("id") % (n / 32)).as("k"), lit("hot").as("tag"))
      .groupBy("k").agg(first("tag").as("tag"))
    src.persist().count()
    val t0 = System.nanoTime()
    val res = TxTable.mergeClauses(spark, t, src, "k", Seq("k"),
      whenMatched = Seq(TxTable.MergeClause(None,
        TxTable.MergeUpdate(Map("tag" -> lit("hot"))))),
      whenNotMatchedBySource = Seq(TxTable.MergeClause(
        Some(col("seg") === "S7"),
        TxTable.MergeUpdate(Map("tag" -> lit("cold"))))))
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[mergeClausesBench] n=$n files=$files rewritten=${res.rewritten} " +
      f"untouched=${res.untouched} wall=$secs%.2f s")
    // sanity: final state
    val got = TxTable.read(spark, t).groupBy("tag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"[mergeClausesBench] tags=$got")
    spark.stop()
  }
}
