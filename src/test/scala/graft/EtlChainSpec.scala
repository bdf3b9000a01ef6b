package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.{SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.RetailEtl
import graft.sources.{ExternalIngest, JdbcSink, XlsxIngest}

/** The reference pipeline's DEFINING artifact run end to end: the DAG
  * ordering `init_db >> clean >> stage_dims >> load_dims >> stage_fact
  * >> load_fact` (reference airflow/dags/etl.py:273-274) composed as
  * one integration test — xlsx extraction → type quarantine → shape
  * gate → SCD1-style dims → generated date dim → surrogate-key fact
  * staged against the WAREHOUSE-ASSIGNED identity keys → constrained
  * Derby star load — with FK soundness enforced by the database itself
  * (the append succeeding under REFERENCES is the proof) and the final
  * star's numbers equal to ONE independent SQL expression of the whole
  * chain over the raw typed rows.
  */
class EtlChainSpec extends SparkSpecBase {

  private def entry(z: ZipOutputStream, name: String, body: String): Unit = {
    z.putNextEntry(new ZipEntry(name))
    z.write(body.getBytes("UTF-8"))
    z.closeEntry()
  }

  /** Minimal spec-conformant workbook with inline-string cells only. */
  private def workbook(rows: Seq[Seq[String]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entry(z, "[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin)
    entry(z, "_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    entry(z, "xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    entry(z, "xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    val body = rows.zipWithIndex.map { case (cells, r) =>
      s"""<row r="${r + 1}">""" + cells.zipWithIndex.collect {
        case (v, c) if v != null =>
          s"""<c r="${('A' + c).toChar}${r + 1}" t="inlineStr"><is><t>$v</t></is></c>"""
      }.mkString + "</row>"
    }.mkString("\n")
    entry(z, "xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>
         |$body
         |</sheetData>
         |</worksheet>""".stripMargin)
    z.close()
    bos.toByteArray
  }

  private val Header =
    Seq("invoice_no", "stock_code", "customer_id", "qty", "unit_price", "invoice_date")

  // two "monthly drop" workbooks, the reference's multi-file extract:
  // clean rows across two dates + every dirty class the chain must
  // survive (cancelled invoice, type corruption, missing customer,
  // UNKNOWN customer that falls to the default member)
  private val Wb1Rows = Seq(
    Header,
    Seq("536365", "85123", "17850", "6", "2.55", "2011-01-04"),
    Seq("536365", "71053", "17850", "3", "3.39", "2011-01-04"),
    Seq("536366", "84406", "12583", "2", "7.65", "2011-01-05"),
    Seq("C53722", "22423", "12583", "1", "10.95", "2011-01-05"), // cancelled
    Seq("536367", "84406", "17850", "abc", "7.65", "2011-01-05"), // qty corrupt
    Seq("536368", "21730", null, "2", "1.25", "2011-01-05"))      // no customer
  private val Wb2Rows = Seq(
    Header,
    Seq("536370", "21730", "17851", "10", "1.25", "2011-01-06"),
    Seq("536370", "85123", "99999", "4", "2.55", "2011-01-06"), // unknown cust → default member
    Seq("536371", "21730", "17851", "5", "1.25", "2011-01-07"))

  private def writeDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("etl_chain_xlsx").toFile
    dir.deleteOnExit()
    Seq("jan_a.xlsx" -> workbook(Wb1Rows), "jan_b.xlsx" -> workbook(Wb2Rows))
      .foreach { case (n, b) =>
        val f = new FileOutputStream(new java.io.File(dir, n)); f.write(b); f.close()
      }
    dir.getAbsolutePath
  }

  test("full reference DAG: xlsx → quarantine → dims → dates → fact → constrained star load, FK-sound and equal to the one-SQL oracle") {
    import spark.implicits._
    val home = java.nio.file.Files.createTempDirectory("graft_derby_chain").toString
    System.setProperty("derby.system.home", home)
    val url = s"jdbc:derby:$home/dwh;create=true"
    val driver = Some("org.apache.derby.jdbc.EmbeddedDriver")

    // ---- init_db: constrained star (PKs, FKs, default members)
    JdbcSink.initStarSchema(url, driver)

    // ---- extract + clean: typed read, quarantine, shape gate
    val schema = StructType(Seq(
      StructField("invoice_no", StringType), StructField("stock_code", StringType),
      StructField("customer_id", StringType), StructField("qty", IntegerType),
      StructField("unit_price", DoubleType), StructField("invoice_date", DateType)))
    val typed = XlsxIngest.readTypedXlsx(spark, writeDir(), schema).persist()
    val (clean, quarantined) = ExternalIngest.splitQuarantine(typed)
    assert(quarantined.count() == 1, "exactly the qty-corrupt row quarantines")
    val (kept0, rejected) = ExternalIngest.retailShapeGate(
      clean, "invoice_no", "stock_code", "customer_id")
    val kept = kept0.persist()
    assert(rejected.count() == 2, "cancelled + missing-customer rows rejected")
    assert(kept.count() == 6)
    assert(quarantined.count() + rejected.count() + kept.count() == typed.count())

    // ---- stage_dims >> load_dims: natural keys staged, APPENDED under
    // the identity PK (the init-seeded '00000' default member stays)
    // non-null attributes: Derby's dialect binds StringType NULLs as
    // CLOB setNull, which its VARCHAR columns reject
    JdbcSink.loadTable(
      kept.select(col("customer_id").as("CUSTOMER_ID")).distinct()
        .withColumn("COUNTRY", lit("United Kingdom")),
      url, "RETAIL.DIM_CUSTOMERS", SaveMode.Append, driver)
    JdbcSink.loadTable(
      kept.select(col("stock_code").as("STOCK_CODE")).distinct()
        .withColumn("DESCRIPTION", concat(lit("item "), col("STOCK_CODE"))),
      url, "RETAIL.DIM_PRODUCTS", SaveMode.Append, driver)
    JdbcSink.loadTable(
      RetailEtl.dimDates(spark, SfDir).select(
        col("date_dim_id").as("DATE_DIM_ID"), col("date").as("DT"),
        col("year").cast("short").as("YR"), col("month").cast("short").as("MON"),
        col("day").cast("short").as("DAY"),
        col("day_of_week").cast("short").as("DAY_OF_WEEK"),
        col("week").cast("short").as("WEEK")),
      url, "RETAIL.DIM_DATES", SaveMode.Append, driver)

    // ---- stage_fact: resolve WAREHOUSE-ASSIGNED surrogate keys by
    // reading the dims back (reference etl.py joins staged facts to the
    // loaded dims); unknowns coalesce to the '00000' default member
    val dimC = JdbcSink.readTable(spark, url, "RETAIL.DIM_CUSTOMERS", driver).persist()
    val dimP = JdbcSink.readTable(spark, url, "RETAIL.DIM_PRODUCTS", driver).persist()
    val defaultC = dimC.filter(trim(col("CUSTOMER_ID")) === "00000")
      .select("CUSTOMER_DIM_ID").head().getInt(0)
    val defaultP = dimP.filter(trim(col("STOCK_CODE")) === "00000")
      .select("PRODUCT_DIM_ID").head().getInt(0)
    // one UNKNOWN customer planted: drop it from the dim to force the
    // default-member path (the reference's unmatched-fact attribution)
    Class.forName(driver.get)
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement()
      .execute("DELETE FROM RETAIL.DIM_CUSTOMERS WHERE CUSTOMER_ID = '99999'")
    finally conn.close()
    val dimC2 = JdbcSink.readTable(spark, url, "RETAIL.DIM_CUSTOMERS", driver)
    val fact = kept
      .join(dimC2.select(trim(col("CUSTOMER_ID")).as("customer_id"),
        col("CUSTOMER_DIM_ID")), Seq("customer_id"), "left")
      .join(dimP.select(trim(col("STOCK_CODE")).as("stock_code"),
        col("PRODUCT_DIM_ID")), Seq("stock_code"), "left")
      .select(
        col("invoice_no").as("INVOICE_ID"),
        date_format(col("invoice_date"), "yyyyMMdd").cast("int").as("INVOICE_DATE_DIM_ID"),
        coalesce(col("PRODUCT_DIM_ID"), lit(defaultP)).as("PRODUCT_DIM_ID"),
        coalesce(col("CUSTOMER_DIM_ID"), lit(defaultC)).as("CUSTOMER_DIM_ID"),
        col("unit_price").cast("decimal(8,2)").as("UNIT_PRICE"),
        col("qty").as("QUANTITY"))
      .persist()
    // ---- load_fact: the append runs under the FK REFERENCES — the
    // database enforcing referential integrity IS the soundness check
    JdbcSink.loadTable(fact, url, "RETAIL.FCT_INVOICES", SaveMode.Append, driver)

    // ---- the loaded star is FK-sound and complete
    val fctBack = JdbcSink.readTable(spark, url, "RETAIL.FCT_INVOICES", driver).persist()
    assert(fctBack.count() == kept.count(), "every shape-gate-kept row landed")
    assert(fctBack.join(dimC2, Seq("CUSTOMER_DIM_ID"), "left_anti").count() == 0)
    assert(fctBack.join(dimP, Seq("PRODUCT_DIM_ID"), "left_anti").count() == 0)
    assert(fctBack.filter(col("CUSTOMER_DIM_ID") === defaultC).count() == 1,
      "exactly the planted unknown customer attributed to the default member")

    // ---- the one-SQL oracle: the WHOLE chain as a single independent
    // SQL expression over the raw typed rows; per-invoice revenue and
    // line counts from the warehouse star must equal it exactly
    typed.createOrReplaceTempView("chain_raw")
    val oracle = spark.sql(
      """WITH clean AS (SELECT * FROM chain_raw WHERE _corrupt_record IS NULL),
        |kept AS (SELECT * FROM clean
        |  WHERE invoice_no RLIKE '^[0-9]{6}$' AND stock_code RLIKE '^[0-9]{5}$'
        |    AND customer_id IS NOT NULL AND customer_id RLIKE '^[0-9]{5}$')
        |SELECT invoice_no,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(qty AS DECIMAL(12,2)) * CAST(unit_price AS DECIMAL(8,2))) AS DECIMAL(14,2)) AS revenue
        |FROM kept GROUP BY invoice_no""".stripMargin)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDecimal(2)))).toMap
    val star = fctBack
      .groupBy(trim(col("INVOICE_ID")).as("invoice_no"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("UNIT_PRICE") * col("QUANTITY")).cast("decimal(14,2)").as("revenue"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDecimal(2)))).toMap
    assert(star == oracle, s"star=$star oracle=$oracle")
    // invoices span the staged date dim — every fact date resolves
    val dimD = JdbcSink.readTable(spark, url, "RETAIL.DIM_DATES", driver)
    assert(fctBack.join(dimD.select(col("DATE_DIM_ID").as("INVOICE_DATE_DIM_ID")),
      Seq("INVOICE_DATE_DIM_ID"), "left_anti").count() == 0)
    Seq(typed, kept, dimC, dimP, fact, fctBack).foreach(_.unpersist())
  }

  test("reference DAG as a logical-date backfill: per-date runs land the star exactly once across a kill AFTER a load committed") {
    import java.time.LocalDate
    import java.util.concurrent.atomic.AtomicInteger
    import graft.sources.{Backfill, StepRunner}
    val home = java.nio.file.Files.createTempDirectory("graft_derby_bf").toString
    val url = s"jdbc:derby:$home/dwh;create=true"
    val driver = Some("org.apache.derby.jdbc.EmbeddedDriver")
    JdbcSink.initStarSchema(url, driver)
    // extract + gate once (date-agnostic); each LOGICAL DATE slices its
    // own partition — the reference's daily `schedule` over one feed
    val schema = StructType(Seq(
      StructField("invoice_no", StringType), StructField("stock_code", StringType),
      StructField("customer_id", StringType), StructField("qty", IntegerType),
      StructField("unit_price", DoubleType), StructField("invoice_date", DateType)))
    val typed = XlsxIngest.readTypedXlsx(spark, writeDir(), schema)
    val (clean0, _) = ExternalIngest.splitQuarantine(typed)
    val (kept0, _) = ExternalIngest.retailShapeGate(
      clean0, "invoice_no", "stock_code", "customer_id")
    val raw = java.nio.file.Files.createTempDirectory("etl_bf_raw").resolve("kept").toString
    kept0.write.parquet(raw)
    // dims staged once (per-load dim mechanics are the first test's
    // subject; the backfill's subject is the dated fact spine)
    JdbcSink.loadTable(
      kept0.select(col("customer_id").as("CUSTOMER_ID")).distinct()
        .withColumn("COUNTRY", lit("United Kingdom")),
      url, "RETAIL.DIM_CUSTOMERS", SaveMode.Append, driver)
    JdbcSink.loadTable(
      kept0.select(col("stock_code").as("STOCK_CODE")).distinct()
        .withColumn("DESCRIPTION", concat(lit("item "), col("STOCK_CODE"))),
      url, "RETAIL.DIM_PRODUCTS", SaveMode.Append, driver)
    JdbcSink.loadTable(
      RetailEtl.dimDates(spark, SfDir).select(
        col("date_dim_id").as("DATE_DIM_ID"), col("date").as("DT"),
        col("year").cast("short").as("YR"), col("month").cast("short").as("MON"),
        col("day").cast("short").as("DAY"),
        col("day_of_week").cast("short").as("DAY_OF_WEEK"),
        col("week").cast("short").as("WEEK")),
      url, "RETAIL.DIM_DATES", SaveMode.Append, driver)
    val dimC = JdbcSink.readTable(spark, url, "RETAIL.DIM_CUSTOMERS", driver)
      .select(trim(col("CUSTOMER_ID")).as("customer_id"), col("CUSTOMER_DIM_ID")).persist()
    val dimP = JdbcSink.readTable(spark, url, "RETAIL.DIM_PRODUCTS", driver)
      .select(trim(col("STOCK_CODE")).as("stock_code"), col("PRODUCT_DIM_ID")).persist()
    dimC.count(); dimP.count()

    val root = java.nio.file.Files.createTempDirectory("etl_bf_runs").resolve("daily").toString
    val cleanRuns = new AtomicInteger(0)
    val loads = new AtomicInteger(0)
    val cleanups = new AtomicInteger(0)
    def pipeline(killOn: Option[LocalDate])(r: StepRunner, d: LocalDate): Unit =
      r.withFinalizer { cleanups.incrementAndGet(); () } {
        val daySlice = r.step("clean") {
          cleanRuns.incrementAndGet()
          spark.read.parquet(raw)
            .filter(col("invoice_date") === lit(java.sql.Date.valueOf(d)))
        }
        val fact = daySlice
          .join(dimC, Seq("customer_id"))
          .join(dimP, Seq("stock_code"))
          .select(
            col("invoice_no").as("INVOICE_ID"),
            date_format(col("invoice_date"), "yyyyMMdd").cast("int").as("INVOICE_DATE_DIM_ID"),
            col("PRODUCT_DIM_ID"), col("CUSTOMER_DIM_ID"),
            col("unit_price").cast("decimal(8,2)").as("UNIT_PRICE"),
            col("qty").as("QUANTITY"))
        r.effect("load_fact") {
          loads.incrementAndGet()
          JdbcSink.loadTable(fact, url, "RETAIL.FCT_INVOICES", SaveMode.Append, driver)
        }
        // the kill lands AFTER the load's marker published — the
        // hardest resume case: the date is incomplete but its
        // non-idempotent JDBC effect must NOT re-run
        if (killOn.contains(d)) throw new RuntimeException(s"killed on $d")
        ()
      }
    val start = LocalDate.parse("2011-01-04")
    val end = LocalDate.parse("2011-01-07")
    val kill = LocalDate.parse("2011-01-06")
    val e = intercept[RuntimeException] {
      Backfill.run(spark, root, start, end)(pipeline(Some(kill)))
    }
    assert(e.getMessage == "killed on 2011-01-06")
    assert(Backfill.missingDates(spark, root, start, end).map(_.toString)
      == Seq("2011-01-06", "2011-01-07"))
    val rep = Backfill.run(spark, root, start, end)(pipeline(None))
    assert(rep.executed.map(_.toString) == Seq("2011-01-06", "2011-01-07"))
    assert(cleanRuns.get() == 4, "one clean per date; the killed date's resumes from its artifact")
    assert(loads.get() == 4, "the killed date's JDBC load must NOT re-run on resume")
    assert(cleanups.get() == 5, "all_done finalizer runs on every attempt (06 twice)")
    // the backfilled star equals the one-shot chain over the same feed,
    // exactly once per row despite the kill
    val fctBack = JdbcSink.readTable(spark, url, "RETAIL.FCT_INVOICES", driver).persist()
    assert(fctBack.count() == kept0.count())
    typed.createOrReplaceTempView("bf_raw")
    val oracle = spark.sql(
      """WITH clean AS (SELECT * FROM bf_raw WHERE _corrupt_record IS NULL),
        |kept AS (SELECT * FROM clean
        |  WHERE invoice_no RLIKE '^[0-9]{6}$' AND stock_code RLIKE '^[0-9]{5}$'
        |    AND customer_id IS NOT NULL AND customer_id RLIKE '^[0-9]{5}$')
        |SELECT invoice_no,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(qty AS DECIMAL(12,2)) * CAST(unit_price AS DECIMAL(8,2))) AS DECIMAL(14,2)) AS revenue
        |FROM kept GROUP BY invoice_no""".stripMargin)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDecimal(2)))).toMap
    val star = fctBack
      .groupBy(trim(col("INVOICE_ID")).as("invoice_no"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("UNIT_PRICE") * col("QUANTITY")).cast("decimal(14,2)").as("revenue"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDecimal(2)))).toMap
    assert(star == oracle, s"star=$star oracle=$oracle")
    // full re-run of the whole backfill is a no-op: nothing doubles
    val rep2 = Backfill.run(spark, root, start, end)(pipeline(None))
    assert(rep2.executed.isEmpty && loads.get() == 4)
    assert(JdbcSink.readTable(spark, url, "RETAIL.FCT_INVOICES", driver).count() == kept0.count())
    Seq(dimC, dimP, fctBack).foreach(_.unpersist())
  }
}
