package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.TxTable

/** Maintenance SQL statements (r16, [[graft.sources.GraftSqlParser]]):
  * DESCRIBE HISTORY / DESCRIBE DETAIL / VACUUM / OPTIMIZE over table
  * paths, plus proof the injected parser delegates everything else.
  */
class TxMaintenanceSqlSpec extends SparkSpecBase {

  private def tmpTable(): String =
    Files.createTempDirectory("graft_maint").resolve("t").toString

  test("DESCRIBE HISTORY / DETAIL surface the audit columns through SQL") {
    import spark.implicits._
    val t = tmpTable()
    TxTable.create(spark, t, (1L to 50L).map(i => (i, "x")).toDF("id", "tag"),
      Seq("id"))
    TxTable.append(spark, t, Seq((51L, "y")).toDF("id", "tag"), Seq("id"))
    TxTable.delete(spark, t, "id", "10", "20", Seq("id"))
    val h = spark.sql(s"DESCRIBE HISTORY '$t'").collect()
    assert(h.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(h.map(_.getString(1)).toSeq == Seq("create", "append", "delete"))
    assert(h.last.getAs[Long]("n_rows") == 40L)
    val d = spark.sql(s"DESCRIBE DETAIL '$t'").head()
    assert(d.getAs[Int]("version") == 3)
    assert(d.getAs[Long]("n_rows") == 40L)
    assert(d.getAs[String]("partition_cols") == "")
  }

  test("OPTIMIZE compacts; OPTIMIZE ZORDER BY re-lays; VACUUM RETAIN prunes history (DRY RUN lists only)") {
    import spark.implicits._
    val t = tmpTable()
    TxTable.create(spark, t,
      (1L to 200L).map(i => (i, (i * 7) % 99)).toDF("a", "b").repartition(4),
      Seq("a", "b"))
    (1 to 3).foreach { k =>
      TxTable.append(spark, t,
        (1 to 50).map(i => (200L + k * 50 + i, (i * 3L) % 99))
          .toDF("a", "b").repartition(2), Seq("a", "b"))
    }
    val preFiles = TxTable.manifest(t, TxTable.latestVersion(t)).files.size
    assert(preFiles >= 8)
    val vOpt = spark.sql(s"OPTIMIZE '$t'").head().getInt(0)
    assert(TxTable.manifest(t, vOpt).files.size < preFiles)
    assert(TxTable.read(spark, t).count() == 350)
    val vZ = spark.sql(s"OPTIMIZE '$t' ZORDER BY (a, b)").head().getInt(0)
    assert(vZ == vOpt + 1)
    assert(TxTable.read(spark, t).count() == 350)
    // DRY RUN: lists reclaimable files, deletes nothing
    val dry = spark.sql(s"VACUUM '$t' RETAIN 1 VERSIONS DRY RUN").collect()
    assert(dry.nonEmpty)
    assert(TxTable.read(spark, t, version = 1).count() == 200,
      "dry run must not reclaim")
    // real vacuum: old versions gone, latest intact
    val reclaimed = spark.sql(s"VACUUM '$t' RETAIN 1 VERSIONS").collect()
    assert(reclaimed.map(_.getString(0)).toSet == dry.map(_.getString(0)).toSet)
    intercept[Exception] { TxTable.read(spark, t, version = 1).count() }
    assert(TxTable.read(spark, t).count() == 350)
  }

  test("RESTORE TO VERSION rolls back through SQL; the mistaken versions stay travelable") {
    import spark.implicits._
    val t = tmpTable()
    TxTable.create(spark, t, (1L to 20L).map(i => (i, "x")).toDF("id", "tag"),
      Seq("id"))
    TxTable.delete(spark, t, "id", "1", "15", Seq("id"))
    assert(TxTable.read(spark, t).count() == 5)
    val v = spark.sql(s"RESTORE '$t' TO VERSION 1").head().getInt(0)
    assert(v == 3)
    assert(TxTable.read(spark, t).count() == 20, "rolled back")
    assert(TxTable.read(spark, t, version = 2).count() == 5,
      "the mistaken version stays travelable")
  }

  test("the injected parser delegates everything else verbatim") {
    // ordinary SQL parses and runs
    assert(spark.sql("SELECT 1 + 1 AS two").head().getInt(0) == 2)
    // DESCRIBE of a catalog object still routes to Spark's grammar
    spark.sql("DROP TABLE IF EXISTS maint_plain")
    spark.sql("CREATE TABLE maint_plain (id INT) USING parquet")
    assert(spark.sql("DESCRIBE TABLE maint_plain").count() >= 1)
    // syntax errors still surface as Spark parse errors
    intercept[Exception] { spark.sql("SELEKT 1") }
    // our statements with a malformed tail fall through to the
    // delegate's error, not a silent no-op
    intercept[Exception] { spark.sql("VACUUM WITHOUT A PATH") }
  }
}
