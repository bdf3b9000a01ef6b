package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.TxTable

/** ADD COLUMN + mergeSchema write evolution (r16, VERDICT-r15 missing
  * #3): metadata-declared columns, evolving appends, composition with
  * column mapping, CHECK-constraint guards, and streaming schema
  * stability under mid-stream evolution.
  */
class TxSchemaEvolutionSpec extends SparkSpecBase {

  private def tmpTable(): String =
    Files.createTempDirectory("graft_evo").resolve("t").toString

  test("addColumn surfaces typed nulls; later appends land values; old files read as nulls") {
    import spark.implicits._
    val t = tmpTable()
    TxTable.create(spark, t, (1L to 50L).map(i => (i, s"p$i")).toDF("id", "pay"),
      Seq("id"))
    val v2 = TxTable.addColumn(t, "score", "DOUBLE")
    assert(v2 == 2)
    val evolved = TxTable.read(spark, t)
    assert(evolved.schema("score").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(evolved.filter(col("score").isNotNull).count() == 0)
    // v1 time travel keeps the pre-evolution schema
    assert(!TxTable.read(spark, t, version = 1).columns.contains("score"))
    // an append carrying the declared column needs NO option, and the
    // stats pass records the new column when asked
    TxTable.append(spark, t,
      (51L to 60L).map(i => (i, s"p$i", i * 0.5)).toDF("id", "pay", "score"),
      Seq("id", "score"))
    val now = TxTable.read(spark, t)
    assert(now.count() == 60)
    assert(now.filter(col("score").isNotNull).count() == 10)
    assert(now.filter(col("id") === 55L).head().getAs[Double]("score") == 27.5)
    val withStats = TxTable.manifest(t, TxTable.latestVersion(t)).files
      .filter(_.stats.contains("score"))
    assert(withStats.nonEmpty, "evolved files carry score min/max stats")
    // duplicate declaration refuses, as does declaring an existing col
    intercept[IllegalArgumentException] { TxTable.addColumn(t, "score", "DOUBLE") }
    intercept[IllegalArgumentException] { TxTable.addColumn(t, "pay", "STRING") }
  }

  test("append refuses a superset schema without mergeSchema; evolves with it; declaration survives rewrites") {
    import spark.implicits._
    val t = tmpTable()
    TxTable.create(spark, t, (1L to 40L).map(i => (i, "x")).toDF("id", "tag"),
      Seq("id"))
    val e = intercept[IllegalArgumentException] {
      TxTable.append(spark, t,
        Seq((41L, "x", 9L)).toDF("id", "tag", "extra"), Seq("id"))
    }
    assert(e.getMessage.contains("mergeSchema"), e.getMessage)
    TxTable.append(spark, t,
      (41L to 45L).map(i => (i, "x", i * 2)).toDF("id", "tag", "extra"),
      Seq("id"), mergeSchema = true)
    val now = TxTable.read(spark, t)
    assert(now.count() == 45 && now.columns.contains("extra"))
    assert(now.filter(col("id") <= 40L && col("extra").isNotNull).count() == 0)
    // the evolving append DECLARED the column: even after a mutation
    // rewrites away every file that carried it, the schema keeps it
    val res = TxTable.delete(spark, t, "id", "41", "45", Seq("id"))
    assert(res.version > 0)
    assert(TxTable.read(spark, t).columns.contains("extra"),
      "declared column survives losing every file that carried values")
  }

  test("add -> rename -> drop round trip composes with column mapping") {
    import spark.implicits._
    val t = tmpTable()
    TxTable.create(spark, t, (1L to 20L).map(i => (i, "x")).toDF("id", "tag"),
      Seq("id"))
    TxTable.addColumn(t, "v", "BIGINT")
    TxTable.renameColumn(t, "v", "w")
    assert(TxTable.read(spark, t).columns.contains("w"))
    assert(!TxTable.read(spark, t).columns.contains("v"))
    // values land under the renamed declared column
    TxTable.append(spark, t, Seq((21L, "x", 7L)).toDF("id", "tag", "w"),
      Seq("id"))
    assert(TxTable.read(spark, t).filter(col("w") === 7L).count() == 1)
    TxTable.dropColumn(t, "w")
    assert(!TxTable.read(spark, t).columns.contains("w"))
    // rename/drop of a column a CHECK constraint references refuses
    TxTable.addCheckConstraint(spark, t, "tag_set", "tag = 'x'")
    val e1 = intercept[IllegalArgumentException] {
      TxTable.renameColumn(t, "tag", "label") }
    assert(e1.getMessage.contains("CHECK"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] { TxTable.dropColumn(t, "tag") }
    assert(e2.getMessage.contains("CHECK"), e2.getMessage)
    TxTable.dropCheckConstraint(t, "tag_set")
    assert(TxTable.renameColumn(t, "tag", "label") > 0)
  }

  test("merge refuses a wider update frame without mergeSchema; opts in and declares (r16)") {
    import spark.implicits._
    val t = tmpTable()
    TxTable.create(spark, t, (1L to 30L).map(i => (i, "x")).toDF("id", "tag"),
      Seq("id"))
    val wide = Seq((5L, "upd", 1.5), (31L, "ins", 2.5)).toDF("id", "tag", "sc")
    val e = intercept[IllegalArgumentException] {
      TxTable.merge(spark, t, wide, "id", Seq("id")) }
    assert(e.getMessage.contains("mergeSchema"), e.getMessage)
    TxTable.merge(spark, t, wide, "id", Seq("id"), mergeSchema = true)
    val now = TxTable.read(spark, t)
    assert(now.columns.contains("sc") && now.count() == 31)
    assert(now.filter(col("id") === 5L).head().getAs[Double]("sc") == 1.5)
    assert(now.filter(col("id") === 1L).head()
      .isNullAt(now.columns.indexOf("sc")),
      "carried rows read null for the newly declared column")
  }

  test("CHECK constraints validate the LANDED rows; a violating append deletes its files and commits nothing (r16)") {
    import spark.implicits._
    val t = tmpTable()
    TxTable.create(spark, t, Seq((1L, 5.0)).toDF("id", "v"), Seq("id"))
    TxTable.addCheckConstraint(spark, t, "v_pos", "v > 0")
    val vBefore = TxTable.latestVersion(t)
    def parquetCount(): Long = {
      val dir = java.nio.file.Paths.get(t, "data")
      java.nio.file.Files.walk(dir).filter(p =>
        p.toString.endsWith(".parquet")).count()
    }
    val filesBefore = parquetCount()
    intercept[IllegalArgumentException] {
      TxTable.append(spark, t, Seq((2L, -1.0)).toDF("id", "v"), Seq("id"))
    }
    assert(TxTable.latestVersion(t) == vBefore, "no version")
    assert(parquetCount() == filesBefore,
      "the violating write's files are deleted — no garbage")
    // a valid append still lands; the landed rows are the checked rows
    TxTable.append(spark, t, Seq((3L, 1.0)).toDF("id", "v"), Seq("id"))
    assert(TxTable.read(spark, t).count() == 2)
  }

  test("streaming read stays schema-stable across a mid-stream evolved append") {
    import spark.implicits._
    val t = tmpTable()
    TxTable.create(spark, t, (1L to 30L).map(i => (i, "x")).toDF("id", "tag"),
      Seq("id"))
    val qn = s"evo_sink_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = spark.readStream.format("graft-tx").option("path", t).load()
      .writeStream.format("memory").queryName(qn).outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(qn).columns.toSeq == Seq("id", "tag"))
      TxTable.append(spark, t,
        Seq((31L, "x", 1L), (32L, "x", 2L)).toDF("id", "tag", "extra"),
        Seq("id"), mergeSchema = true)
      q.processAllAvailable()
      // the feed serves the START-TIME view: rows arrive, the
      // mid-stream column does not shift the sink schema
      assert(spark.table(qn).count() == 32)
      assert(spark.table(qn).columns.toSeq == Seq("id", "tag"))
    } finally q.stop()
    // a NEW stream started after the evolution sees the widened view
    val qn2 = s"evo_sink2_${java.util.UUID.randomUUID().toString.take(8)}"
    val q2 = spark.readStream.format("graft-tx").option("path", t).load()
      .writeStream.format("memory").queryName(qn2).outputMode("append").start()
    try {
      q2.processAllAvailable()
      assert(spark.table(qn2).columns.contains("extra"))
      assert(spark.table(qn2).count() == 32)
    } finally q2.stop()
  }
}
