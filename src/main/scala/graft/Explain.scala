package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Plan-capture aid for the optimization rounds: dumps
  * `.explain("formatted")` of each named query to `<outDir>/<name>_<tag>.txt`
  * under the exact Bench session config (nosort, 32 shuffle partitions,
  * AQE on), so plan diffs ride with the round's evidence.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.Explain <outDir> <tag> <q1,q2,...>"
  *
  * NOTE: composite queries (tx_*) execute their staging mutations while
  * building the returned frame; the dumped plan is the final read — the
  * plan the bench's noop sink times.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    System.setProperty("graft.bench.nosort", "1")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$tag.txt"), txt.getBytes("UTF-8"))
      println(s"[explain] wrote $name ($tag)")
      graft.util.CacheScope.drain()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
