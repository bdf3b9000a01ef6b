package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{ExternalIngest, XlsxIngest}

/** xlsx ingestion spec (reference etl.py:46 pd.read_excel): writes a
  * REAL minimal workbook — zip container, content types, workbook
  * part, shared strings, worksheet — and round-trips it through
  * [[XlsxIngest]] and the quarantine + shape-gate contract.
  */
class XlsxSpec extends SparkSpecBase {

  private def entry(z: ZipOutputStream, name: String, body: String): Unit = {
    z.putNextEntry(new ZipEntry(name))
    z.write(body.getBytes("UTF-8"))
    z.closeEntry()
  }

  /** A spec-conformant workbook: `sheetRows` is the sheet XML between
    * the sheetData tags; `sst` the shared-string table in index order.
    */
  private def workbook(sst: Seq[String], sheetRows: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entry(z, "[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
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
    entry(z, "xl/sharedStrings.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sst.size}" uniqueCount="${sst.size}">
         |${sst.map(s => s"<si><t>$s</t></si>").mkString("\n")}
         |</sst>""".stripMargin)
    entry(z, "xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>
         |$sheetRows
         |</sheetData>
         |</worksheet>""".stripMargin)
    z.close()
    bos.toByteArray
  }

  private val Header = Seq("invoice_no", "stock_code", "customer_id", "qty", "unit_price")
  private val headerRow =
    """<row r="1">""" + Header.indices.map(i =>
      s"""<c r="${('A' + i).toChar}1" t="s"><v>$i</v></c>""").mkString + "</row>"

  // shared strings: 0-4 header, 5 = a shared-string invoice id
  private val Sst = Header :+ "536365"

  private def wb1: Array[Byte] = workbook(Sst,
    headerRow +
      // clean row: shared string, inline string, numbers
      """<row r="2"><c r="A2" t="s"><v>5</v></c><c r="B2" t="inlineStr"><is><t>85123</t></is></c><c r="C2" t="inlineStr"><is><t>17850</t></is></c><c r="D2"><v>6</v></c><c r="E2"><v>2.55</v></c></row>""" +
      // cancelled invoice (shape gate's signature reject)
      """<row r="3"><c r="A3" t="inlineStr"><is><t>C537226</t></is></c><c r="B3" t="inlineStr"><is><t>22423</t></is></c><c r="C3" t="inlineStr"><is><t>12583</t></is></c><c r="D3"><v>1</v></c><c r="E3"><v>10.95</v></c></row>""" +
      // type-corrupt row: qty is not an int → quarantine
      """<row r="4"><c r="A4" t="inlineStr"><is><t>536366</t></is></c><c r="B4" t="inlineStr"><is><t>71053</t></is></c><c r="C4" t="inlineStr"><is><t>17850</t></is></c><c r="D4" t="inlineStr"><is><t>abc</t></is></c><c r="E4"><v>3.39</v></c></row>""" +
      // sparse row: customer_id cell absent entirely → null → shape reject
      """<row r="5"><c r="A5" t="inlineStr"><is><t>536367</t></is></c><c r="B5" t="inlineStr"><is><t>84406</t></is></c><c r="D5"><v>2</v></c><c r="E5"><v>7.65</v></c></row>""")

  private def wb2: Array[Byte] = workbook(Sst,
    headerRow +
      """<row r="2"><c r="A2" t="inlineStr"><is><t>536370</t></is></c><c r="B2" t="inlineStr"><is><t>21730</t></is></c><c r="C2" t="inlineStr"><is><t>17851</t></is></c><c r="D2"><v>10</v></c><c r="E2"><v>1.25</v></c></row>""")

  private def writeDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("xlsx_spec").toFile
    dir.deleteOnExit()
    Seq("a_book.xlsx" -> wb1, "b_book.xlsx" -> wb2).foreach { case (n, b) =>
      val f = new FileOutputStream(new java.io.File(dir, n))
      f.write(b); f.close()
    }
    dir.getAbsolutePath
  }

  test("colIndex decodes spreadsheet column letters") {
    assert(XlsxIngest.colIndex("A1") == 0)
    assert(XlsxIngest.colIndex("Z9") == 25)
    assert(XlsxIngest.colIndex("AA12") == 26)
    assert(XlsxIngest.colIndex("BC23") == 54)
  }

  test("parseXlsx reads shared, inline, numeric and sparse cells") {
    val rows = XlsxIngest.parseXlsx(wb1)
    assert(rows.head == Header.toVector)
    assert(rows(1) == Vector("536365", "85123", "17850", "6", "2.55"))
    // sparse row: the skipped C cell is an explicit null, not a shift
    assert(rows(4) == Vector("536367", "84406", null, "2", "7.65"))
  }

  test("readXlsx fans out over workbooks with the first header as schema") {
    val df = XlsxIngest.readXlsx(spark, writeDir())
    assert(df.columns.toSeq == Header)
    assert(df.count() == 5) // 4 data rows in wb1 + 1 in wb2
    assert(df.schema.fields.forall(_.dataType == StringType))
    val invoices = df.select("invoice_no").collect().map(_.getString(0)).toSet
    assert(invoices == Set("536365", "C537226", "536366", "536367", "536370"))
  }

  test("first sheet follows WORKBOOK order, not part-name order") {
    // after a sheet deletion/reorder, display-order sheet 1 can live in
    // a part named sheet2.xml while a stale sheet1.xml sorts first —
    // the reader must follow workbook.xml's first <sheet> r:id through
    // the rels, as pandas does
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entry(z, "xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Current" sheetId="2" r:id="rId7"/><sheet name="Old" sheetId="1" r:id="rId3"/></sheets>
        |</workbook>""".stripMargin)
    entry(z, "xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId3" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId7" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    def sheet(v: String) =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>$v</t></is></c></row></sheetData>
         |</worksheet>""".stripMargin
    entry(z, "xl/worksheets/sheet1.xml", sheet("stale"))
    entry(z, "xl/worksheets/sheet2.xml", sheet("current"))
    z.close()
    val rows = XlsxIngest.parseXlsx(bos.toByteArray)
    assert(rows == Vector(Vector("current")),
      s"read ${rows} — part-name order won over workbook order")
  }

  test("malformed shared-string refs surface as null cells, not executor exceptions") {
    // out-of-range and empty <v> under t="s": the quarantine contract
    // says one bad workbook degrades to null cells, never a thrown
    // NumberFormatException/IndexOutOfBounds that fails the whole load
    val rows = XlsxIngest.parseXlsx(workbook(Seq("only"),
      """<row r="1"><c r="A1" t="s"><v>99</v></c><c r="B1" t="s"><v></v></c><c r="C1" t="s"><v>0</v></c></row>"""))
    assert(rows == Vector(Vector(null, null, "only")), rows.toString)
  }

  test("readTypedXlsx quarantines cast failures intact; shape gate labels the rest") {
    val schema = StructType(Seq(
      StructField("invoice_no", StringType), StructField("stock_code", StringType),
      StructField("customer_id", StringType), StructField("qty", IntegerType),
      StructField("unit_price", DoubleType)))
    val typed = XlsxIngest.readTypedXlsx(spark, writeDir(), schema).persist()
    val (clean, quarantined) = ExternalIngest.splitQuarantine(typed)
    val badRows = quarantined.collect()
    assert(badRows.length == 1, badRows.mkString("; "))
    assert(badRows.head.getAs[String](ExternalIngest.CorruptCol).contains("abc"))
    assert(clean.schema("qty").dataType == IntegerType)
    val (kept, rejected) = ExternalIngest.retailShapeGate(
      clean, "invoice_no", "stock_code", "customer_id")
    val keptInv = kept.collect().map(_.getAs[String]("invoice_no")).toSet
    assert(keptInv == Set("536365", "536370"))
    val reasons = rejected.collect()
      .map(r => r.getAs[String]("invoice_no") -> r.getAs[String]("reject_reason")).toMap
    assert(reasons == Map("C537226" -> "cancelled_invoice", "536367" -> "bad_customer_id"))
    typed.unpersist()
  }
}
