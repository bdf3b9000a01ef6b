package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level profile of tx_cdc_replica (optimization round): replays
  * [[graft.sources.TxTable.cdcReplicaQuery]]'s exact steps with wall
  * timers around each phase, twice (run 2 is the JIT-warm number).
  */
object ProfCdc {
  def main(args: Array[String]): Unit = {
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
    import graft.sources.TxTable
    (1 to 2).foreach { run =>
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[profcdc] run=$run $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
        r
      }
      val root = Files.createTempDirectory("graft_tx_cdcrep_prof")
      val src = root.resolve("s").toString
      val rep = root.resolve("r").toString
      val base = graft.util.Tables.orders(spark, sfDir)
        .select(col("o_orderkey").cast("long").as("k"), lit("base").as("tag"))
      t("create source") {
        TxTable.create(spark, src, base.repartitionByRange(8, col("k")), Seq("k"))
      }
      val mk = t("max key")(base.agg(max(col("k"))).head().getLong(0))
      val q = t("sink start") {
        graft.streaming.EventStreams.cdcReplicaSink(spark, src, rep,
          "k", Seq("k"), root.resolve("ck").toString)
      }
      try {
        t("seed drain")(q.processAllAvailable())
        val updates = base.filter(pmod(col("k"), lit(10)) === 0)
          .select(col("k"), lit("upd").as("tag"))
          .unionByName(spark.range(1, TxTable.MergeInserts + 1)
            .select((col("id") + mk).as("k"), lit("ins").as("tag")))
        t("merge source")(TxTable.merge(spark, src, updates, "k", Seq("k")))
        t("delete source")(TxTable.deleteWhere(spark, src,
          pmod(col("k"), lit(10)) === 7, Seq("k")))
        t("apply drain")(q.processAllAvailable())
      } finally q.stop()
      t("final agg") {
        TxTable.read(spark, rep).groupBy(col("tag"))
          .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("k_sum"))
          .orderBy(col("tag"))
          .write.format("noop").mode("overwrite").save()
      }
      graft.util.CacheScope.drain()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
