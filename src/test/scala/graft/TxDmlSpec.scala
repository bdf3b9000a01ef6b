package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.TxTable

/** SQL DML over graft-tx catalog tables (r16): the [[graft.sources
  * .TxDmlRule]] lowering of DELETE FROM / UPDATE / MERGE INTO onto the
  * TxTable mutation engine, plus its refusal paths.
  */
class TxDmlSpec extends SparkSpecBase {

  private def tmpTable(): String =
    Files.createTempDirectory("graft_dml").resolve("t").toString

  private def register(name: String, path: String, opts: String = ""): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING `graft-tx` " +
      s"OPTIONS (path '$path'$opts)")
    ()
  }

  test("DELETE FROM and UPDATE lower onto deleteWhere/updateWhere; versions commit per statement") {
    import spark.implicits._
    val t = tmpTable()
    TxTable.create(spark, t,
      (1L to 100L).map(i => (i, "base", i % 7)).toDF("id", "tag", "amt"),
      Seq("id"))
    register("dml_t1", t)
    spark.sql("DELETE FROM dml_t1 WHERE id % 10 = 1")
    assert(spark.table("dml_t1").count() == 90)
    assert(TxTable.latestVersion(t) == 2)
    spark.sql("UPDATE dml_t1 SET tag = 'hot' WHERE amt >= 5")
    val now = spark.table("dml_t1")
    assert(now.filter(col("tag") === "hot").count() ==
      (1L to 100L).count(i => i % 10 != 1 && i % 7 >= 5))
    assert(TxTable.latestVersion(t) == 3)
    // null-semantics ride through: NULL predicate rows survive a delete
    spark.sql("DELETE FROM dml_t1 WHERE amt > id") // never true
    assert(spark.table("dml_t1").count() == 90)
  }

  test("MERGE INTO with conditional clauses + NOT MATCHED BY SOURCE lowers onto mergeClauses") {
    import spark.implicits._
    val t = tmpTable()
    TxTable.create(spark, t,
      (1L to 60L).map(i => (i, "base", 0L)).toDF("id", "tag", "amt"),
      Seq("id"))
    register("dml_t2", t)
    Seq((10L, "d", "x", 0L), (20L, "u", "upd", 42L), (200L, "i", "ins", 7L))
      .toDF("id", "op", "tag", "amt").createOrReplaceTempView("dml_src2")
    spark.sql("""MERGE INTO dml_t2 t USING dml_src2 s ON t.id = s.id
      |WHEN MATCHED AND s.op = 'd' THEN DELETE
      |WHEN MATCHED AND s.op = 'u' THEN UPDATE SET tag = s.tag, amt = s.amt
      |WHEN NOT MATCHED AND s.op = 'i' THEN
      |  INSERT (id, tag, amt) VALUES (s.id, s.tag, s.amt)
      |WHEN NOT MATCHED BY SOURCE AND t.id = 30 THEN UPDATE SET tag = 'nmbs'
      |""".stripMargin)
    val now = spark.table("dml_t2")
    assert(now.count() == 60)
    assert(now.filter(col("id") === 10L).count() == 0)
    assert(now.filter(col("id") === 20L).select("tag", "amt").head() ==
      org.apache.spark.sql.Row("upd", 42L))
    assert(now.filter(col("id") === 200L).select("tag").head().getString(0) == "ins")
    assert(now.filter(col("id") === 30L).select("tag").head().getString(0) == "nmbs")
    assert(now.filter(col("id") === 31L).select("tag").head().getString(0) == "base")
    // INSERT * (star) form
    Seq((300L, "ins2", 9L)).toDF("id", "tag", "amt")
      .createOrReplaceTempView("dml_src2b")
    spark.sql("""MERGE INTO dml_t2 t USING dml_src2b s ON t.id = s.id
      |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.table("dml_t2").filter(col("id") === 300L)
      .select("tag").head().getString(0) == "ins2")
  }

  test("DML refusals: pinned relation, subquery predicate, key-name mismatch; non-tx tables pass through untouched") {
    import spark.implicits._
    val t = tmpTable()
    TxTable.create(spark, t, (1L to 10L).map(i => (i, "x")).toDF("id", "tag"),
      Seq("id"))
    TxTable.append(spark, t, Seq((11L, "x")).toDF("id", "tag"), Seq("id"))
    register("dml_pin", t, ", version '1'")
    val e1 = intercept[Exception] {
      spark.sql("DELETE FROM dml_pin WHERE id = 1") }
    assert(e1.getMessage.contains("version-pinned"), e1.getMessage)
    register("dml_t3", t)
    val e2 = intercept[Exception] {
      spark.sql("DELETE FROM dml_t3 WHERE id IN (SELECT id FROM dml_t3)") }
    assert(e2.getMessage.contains("subquery"), e2.getMessage)
    Seq((1L, "y")).toDF("k", "tag").createOrReplaceTempView("dml_src3")
    val e3 = intercept[Exception] {
      spark.sql("""MERGE INTO dml_t3 t USING dml_src3 s ON t.id = s.k
        |WHEN MATCHED THEN DELETE""".stripMargin) }
    assert(e3.getMessage.contains("SAME"), e3.getMessage)
    // a non-tx table keeps Spark's own behavior (the rule must not
    // swallow other formats): DELETE on parquet still errors, but NOT
    // with a graft message
    val pq = Files.createTempDirectory("graft_dml_pq").resolve("p").toString
    Seq((1L, "a")).toDF("id", "tag").write.parquet(pq)
    spark.sql("DROP TABLE IF EXISTS dml_pq")
    spark.sql(s"CREATE TABLE dml_pq USING parquet OPTIONS (path '$pq')")
    val e4 = intercept[Exception] {
      spark.sql("DELETE FROM dml_pq WHERE id = 1") }
    assert(!e4.getMessage.contains("graft"), e4.getMessage)
  }

  test("INSERT INTO appends (layout-aware), INSERT OVERWRITE versions, CTAS creates; pinned/partitioned-overwrite refuse") {
    import spark.implicits._
    val t = tmpTable()
    TxTable.create(spark, t, (1L to 10L).map(i => (i, "x")).toDF("id", "tag"),
      Seq("id"))
    register("dml_ins", t)
    spark.sql("INSERT INTO dml_ins VALUES (11, 'sql'), (12, 'sql')")
    assert(spark.table("dml_ins").count() == 12)
    assert(TxTable.latestVersion(t) == 2, "INSERT INTO is one append commit")
    // the FLOATING relation re-resolves per scan: a Scala-API commit is
    // visible through the same catalog entry without REFRESH
    TxTable.append(spark, t, Seq((13L, "api")).toDF("id", "tag"), Seq("id"))
    assert(spark.table("dml_ins").count() == 13)
    spark.sql("INSERT OVERWRITE dml_ins VALUES (100, 'ow')")
    assert(spark.table("dml_ins").count() == 1)
    assert(TxTable.read(spark, t, version = 3).count() == 13,
      "overwrite is versioned — the prior snapshot stays readable")
    // partitioned: INSERT INTO routes through appendPartitioned,
    // INSERT OVERWRITE refuses (it would de-partition)
    val pt = tmpTable()
    TxTable.createPartitioned(spark, pt,
      (1L to 20L).map(i => (i, i % 2, "x")).toDF("id", "p", "tag"),
      Seq("p"), Seq("id"))
    register("dml_insp", pt)
    // the read schema appends the partition column LAST (hive layout)
    spark.sql("INSERT INTO dml_insp VALUES (21, 'sql', 1)")
    assert(spark.table("dml_insp").count() == 21)
    assert(TxTable.manifest(pt, TxTable.latestVersion(pt)).files
      .forall(_.parts.contains("p")), "layout preserved through SQL insert")
    // partitioned INSERT OVERWRITE = DYNAMIC semantics: only p=1
    // replaces (its 11 rows -> 1), p=0 carries by reference
    val preP0 = TxTable.manifest(pt, TxTable.latestVersion(pt)).files
      .filter(_.parts("p") == "0").map(_.path).toSet
    spark.sql("INSERT OVERWRITE dml_insp VALUES (999, 'ow', 1)")
    val nowP = spark.table("dml_insp")
    assert(nowP.filter(col("p") === 1).count() == 1, "p=1 replaced wholesale")
    assert(nowP.filter(col("p") === 0).count() == 10, "p=0 untouched")
    assert(TxTable.manifest(pt, TxTable.latestVersion(pt)).files
      .filter(_.parts("p") == "0").map(_.path).toSet == preP0,
      "untouched partitions carry by reference")
    // pinned relations refuse inserts
    register("dml_ins_pin", t, ", version '1'")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO dml_ins_pin VALUES (999, 'no')") }
    assert(e.getMessage.contains("version-pinned"), e.getMessage)
    // CTAS: CREATE TABLE … USING graft-tx AS SELECT stages a new table
    val ctasDir = Files.createTempDirectory("graft_dml_ctas").resolve("t")
    spark.sql("DROP TABLE IF EXISTS dml_ctas")
    spark.sql(s"CREATE TABLE dml_ctas USING `graft-tx` " +
      s"OPTIONS (path '$ctasDir', statsColumns 'id') " +
      s"AS SELECT id, tag FROM dml_ins")
    assert(spark.table("dml_ctas").count() == 1)
    assert(TxTable.latestVersion(ctasDir.toString) == 1)
  }

  test("ALTER TABLE ADD COLUMNS lowers onto addColumn and keeps the catalog schema in sync") {
    import spark.implicits._
    val t = tmpTable()
    TxTable.create(spark, t, (1L to 5L).map(i => (i, "x")).toDF("id", "tag"),
      Seq("id"))
    register("dml_alter", t)
    spark.sql("ALTER TABLE dml_alter ADD COLUMNS (score DOUBLE, note STRING)")
    val now = spark.table("dml_alter")
    assert(now.columns.toSeq == Seq("id", "tag", "score", "note"))
    assert(now.filter(col("score").isNotNull).count() == 0)
    // manifest and catalog agree; values land through a plain insert
    assert(TxTable.read(spark, t).columns.contains("score"))
    spark.sql("INSERT INTO dml_alter VALUES (6, 'y', 1.5, 'n')")
    assert(spark.table("dml_alter").filter(col("score") === 1.5).count() == 1)
    // duplicate add refuses through the same manifest rule
    intercept[Exception] {
      spark.sql("ALTER TABLE dml_alter ADD COLUMNS (tag STRING)") }
  }

  test("temp-view reads stay FRESH across DML (floating re-resolution); partitioned overwrite guards") {
    import spark.implicits._
    val t = tmpTable()
    TxTable.create(spark, t, (1L to 30L).map(i => (i, "x")).toDF("id", "tag"),
      Seq("id"))
    // a FLOATING temp view re-resolves per scan: DML through the
    // catalog table is visible through the view without re-creation.
    // (DML with the VIEW as target is a Spark limitation — its own
    // resolution rejects DSv1 view targets before extension rules
    // run — so catalog tables are the DML surface.)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW dml_tv " +
      s"USING `graft-tx` OPTIONS (path '$t')")
    register("dml_tv_cat", t)
    assert(spark.table("dml_tv").count() == 30)
    spark.sql("DELETE FROM dml_tv_cat WHERE id <= 5")
    assert(spark.table("dml_tv").count() == 25,
      "the floating temp view serves the post-DML snapshot")
    // a version-PINNED view stays pinned across the same DML
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW dml_tv_pin " +
      s"USING `graft-tx` OPTIONS (path '$t', version '1')")
    spark.sql("UPDATE dml_tv_cat SET tag = 'v' WHERE id = 6")
    assert(spark.table("dml_tv_pin").count() == 30, "pinned view unmoved")
    assert(spark.table("dml_tv").filter(col("tag") === "v").count() == 1)
    // scala-API overwrite on a PARTITIONED table refuses (silent
    // de-partition guard, r16); the dynamic form is the replacement
    val pt = tmpTable()
    TxTable.createPartitioned(spark, pt,
      (1L to 10L).map(i => (i, i % 2)).toDF("id", "p"), Seq("p"), Seq("id"))
    val e2 = intercept[IllegalArgumentException] {
      TxTable.overwrite(spark, pt, Seq((99L, 0L)).toDF("id", "p"), Seq("id")) }
    assert(e2.getMessage.contains("de-partition"), e2.getMessage)
    val res = TxTable.overwritePartitions(spark, pt,
      Seq((99L, 0L)).toDF("id", "p"), Seq("p"), Seq("id"))
    assert(TxTable.read(spark, pt).filter(col("p") === 0).count() == 1)
    assert(TxTable.read(spark, pt).filter(col("p") === 1).count() == 5)
    assert(res.rewritten >= 1)
  }

  test("SQL UPDATE keeps the file-skipping contract: SET of a predicate-read column refuses") {
    import spark.implicits._
    val t = tmpTable()
    TxTable.create(spark, t, (1L to 10L).map(i => (i, i * 2)).toDF("id", "v"),
      Seq("id"))
    register("dml_t4", t)
    val e = intercept[Exception] {
      spark.sql("UPDATE dml_t4 SET v = 0 WHERE v > 5") }
    assert(e.getMessage.contains("file-skipping"), e.getMessage)
  }

  test("composite-key MERGE: multi-column ON matches whole keys, SQL and Scala API; CDF window stays conservative (r16)") {
    import spark.implicits._
    import TxTable.{InsertClause, MergeClause, MergeUpdate}
    val t = tmpTable()
    // (oid, line) composite keys — oid alone COLLIDES across lines, so
    // single-key matching would corrupt rows the clauses never named
    TxTable.create(spark, t,
      (1L to 20L).flatMap(o => (1L to 3L).map(l => (o, l, "base")))
        .toDF("oid", "line", "tag"), Seq("oid"))
    val src = Seq((5L, 2L, "upd"), (6L, 1L, "upd"), (21L, 1L, "ins"))
      .toDF("oid", "line", "tag")
    TxTable.mergeClauses(spark, t, src, "oid", Seq("oid"),
      whenMatched = Seq(MergeClause(None,
        MergeUpdate(Map("tag" -> TxTable.srcCol("tag"))))),
      whenNotMatched = Seq(InsertClause(None)),
      extraKeyCols = Seq("line"))
    val now = TxTable.read(spark, t)
    assert(now.count() == 61)
    assert(now.filter(col("tag") === "upd").select("oid", "line")
      .as[(Long, Long)].collect().toSet == Set((5L, 2L), (6L, 1L)),
      "only the FULL-key matches update — (5,1), (5,3), (6,2)… carry")
    assert(now.filter(col("oid") === 21L).count() == 1)
    // the composite window's CDF stays plain insert/delete (pairing on
    // a shared first key would mispair) and the op is audit-visible
    val h = TxTable.history(spark, t).collect().last
    assert(h.getAs[String]("operation") == "merge_multi")
    val cdf = TxTable.tableChanges(spark, t, 1, 2)
    assert(cdf.filter(col("_change_type").startsWith("update_")).count() == 0)
    assert(cdf.filter(col("_change_type") === "insert").count() == 3)
    assert(cdf.filter(col("_change_type") === "delete").count() == 2)
    // SQL MERGE with a two-part ON lowers onto the same path
    register("dml_comp", t)
    Seq((7L, 3L, "sqlupd")).toDF("oid", "line", "tag")
      .createOrReplaceTempView("dml_comp_src")
    spark.sql("""MERGE INTO dml_comp t USING dml_comp_src s
      |ON t.oid = s.oid AND t.line = s.line
      |WHEN MATCHED THEN UPDATE SET tag = s.tag""".stripMargin)
    assert(spark.table("dml_comp").filter(col("tag") === "sqlupd")
      .select("oid", "line").as[(Long, Long)].collect().toSet ==
      Set((7L, 3L)))
    // SET of ANY key column refuses
    val e = intercept[Exception] {
      TxTable.mergeClauses(spark, t, src, "oid", Seq("oid"),
        whenMatched = Seq(MergeClause(None,
          MergeUpdate(Map("line" -> lit(9L))))),
        extraKeyCols = Seq("line")) }
    assert(e.getMessage.contains("key column"), e.getMessage)
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF resolve pinned snapshots; refusals pass through") {
    import spark.implicits._
    val t = tmpTable()
    TxTable.create(spark, t, (1L to 20L).map(i => (i, "a")).toDF("id", "tag"),
      Seq("id"))
    val afterV1 = System.currentTimeMillis()
    Thread.sleep(15) // versionAtTime resolves at millisecond grain
    TxTable.append(spark, t, Seq((100L, "b"), (101L, "b")).toDF("id", "tag"),
      Seq("id"))
    register("tt_t1", t)
    assert(spark.sql("SELECT count(*) AS n FROM tt_t1 VERSION AS OF 1")
      .head().getLong(0) == 20)
    assert(spark.sql("SELECT count(*) AS n FROM tt_t1 VERSION AS OF 2")
      .head().getLong(0) == 22)
    assert(spark.table("tt_t1").count() == 22, "bare read stays floating")
    // TIMESTAMP AS OF: a string literal (epoch millis spelling) and a
    // TIMESTAMP literal both pin the version live at that instant
    assert(spark.sql(
      s"SELECT count(*) AS n FROM tt_t1 TIMESTAMP AS OF '$afterV1'")
      .head().getLong(0) == 20)
    val iso = java.time.Instant.ofEpochMilli(afterV1).toString
    assert(spark.sql(
      s"SELECT count(*) AS n FROM tt_t1 TIMESTAMP AS OF '$iso'")
      .head().getLong(0) == 20)
    val lts = new java.sql.Timestamp(afterV1).toString.take(23)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM tt_t1 TIMESTAMP AS OF TIMESTAMP'$lts'")
      .head().getLong(0) == 20)
    // DML composes: travel reads join the floating head in one query
    val both = spark.sql("""SELECT
      |(SELECT count(*) FROM tt_t1 VERSION AS OF 1) AS n1,
      |(SELECT count(*) FROM tt_t1) AS n2""".stripMargin).head()
    assert(both.getLong(0) == 20 && both.getLong(1) == 22)
    // an already-PINNED catalog table refuses further travel
    register("tt_pin", t, ", version '1'")
    val e = intercept[Exception] {
      spark.sql("SELECT count(*) FROM tt_pin VERSION AS OF 2").collect() }
    assert(e.getMessage.contains("version-pinned"), e.getMessage)
    // non-tx tables fall through to Spark's own v2-only error
    spark.sql("DROP TABLE IF EXISTS tt_plain")
    spark.sql("CREATE TABLE tt_plain (id BIGINT) USING parquet")
    val e2 = intercept[Exception] {
      spark.sql("SELECT count(*) FROM tt_plain VERSION AS OF 1").collect() }
    assert(!e2.getMessage.contains("graft"), e2.getMessage)
    // a shadowing TEMP VIEW wins name resolution: travel through the
    // view name is not silently redirected to the catalog table
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW tt_t1 " +
      s"USING `graft-tx` OPTIONS (path '$t')")
    val e3 = intercept[Exception] {
      spark.sql("SELECT count(*) FROM tt_t1 VERSION AS OF 1").collect() }
    assert(!e3.getMessage.contains("version-pinned"), e3.getMessage)
    spark.sql("DROP VIEW tt_t1")
  }
}
