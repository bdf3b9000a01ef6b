package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Minimal .xlsx ingestion (reference airflow/dags/etl.py:46 —
  * `pd.read_excel("online_retail.xlsx", dtype=...)` is the pipeline's
  * actual extract step). An xlsx file is a zip of XML parts; this reads
  * `xl/sharedStrings.xml` plus the first worksheet with the JDK's
  * streaming StAX parser — no external dependency, and every cell
  * surfaces as a STRING so the load flows through the same
  * explicit-schema + quarantine contract as [[ExternalIngest.readTypedCsv]]
  * (no inference: digit-like codes keep their leading zeros, the same
  * reason the reference passes per-column dtype overrides).
  *
  * Scale shape: one xlsx is NOT splittable (a zip stream), so the unit
  * of parallelism is the FILE — `binaryFile` rows fan out to executors
  * and each parses its own workbook. The driver parses ONE workbook
  * (the lexicographically first) to fix the schema from its header
  * row — bounded by a single workbook's size, and the file is selected
  * by sorting PATHS only, never by dragging every workbook's bytes
  * through a sort. A single giant workbook should be converted to CSV
  * or parquet upstream — that boundary is deliberate and documented
  * (SURVEY §2.E); this reader exists for the many-small-workbooks drop
  * folder the reference's single-laptop step implies.
  *
  * Out of scope (documented, not silent): date cells surface as Excel
  * serial-number strings; formula cells surface as their cached value.
  */
object XlsxIngest {

  /** Parse one workbook's bytes: rows of cell strings from the first
    * worksheet in WORKBOOK order — the first `<sheet>` of
    * `xl/workbook.xml`, its `r:id` resolved through
    * `xl/_rels/workbook.xml.rels` (pandas' default sheet). Part NAMES
    * need not track display order after sheet deletion/reordering, so
    * the lexicographically-smallest `xl/worksheets/` entry is only the
    * FALLBACK when the workbook/rels parts are absent or unparsable.
    * Missing cells are null; trailing missing cells are padded by the
    * caller. Two streaming passes over the in-memory zip (locate the
    * target part, then parse it) — constant memory beyond one sheet
    * plus the shared-string table (which IS data).
    */
  def parseXlsx(bytes: Array[Byte], maxRows: Int = Int.MaxValue): Vector[Vector[String]] = {
    var sharedXml: Array[Byte] = null
    var workbookXml: Array[Byte] = null
    var relsXml: Array[Byte] = null
    var firstName: String = null
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val name = e.getName
        if (name == "xl/sharedStrings.xml") sharedXml = zin.readAllBytes()
        else if (name == "xl/workbook.xml") workbookXml = zin.readAllBytes()
        else if (name == "xl/_rels/workbook.xml.rels") relsXml = zin.readAllBytes()
        else if (name.startsWith("xl/worksheets/") && name.endsWith(".xml") &&
            (firstName == null || name < firstName)) firstName = name
        e = zin.getNextEntry
      }
    } finally zin.close()
    val target = resolveFirstSheet(workbookXml, relsXml).getOrElse(firstName)
    require(target != null, "not an xlsx: no xl/worksheets/*.xml entry")
    val sheetXml = readZipEntry(bytes, target)
      .orElse(if (firstName != null) readZipEntry(bytes, firstName) else None)
      .getOrElse(throw new IllegalArgumentException(
        s"xlsx: resolved sheet part '$target' not present in archive"))
    val sst = if (sharedXml == null) Vector.empty[String] else parseSharedStrings(sharedXml)
    parseSheet(sheetXml, sst, maxRows)
  }

  /** Second pass: one named part's bytes. */
  private def readZipEntry(bytes: Array[Byte], name: String): Option[Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName == name) return Some(zin.readAllBytes())
        e = zin.getNextEntry
      }
      None
    } finally zin.close()
  }

  /** The zip part name of the workbook's FIRST sheet: workbook.xml's
    * first `<sheet>` `r:id` resolved via the rels part's
    * Id → Target map ("worksheets/sheet2.xml", or absolute
    * "/xl/worksheets/sheet2.xml"). None when either part is missing
    * or malformed — callers fall back to part-name order.
    */
  private[graft] def resolveFirstSheet(workbookXml: Array[Byte],
      relsXml: Array[Byte]): Option[String] =
    if (workbookXml == null || relsXml == null) None
    else try {
      var rid: String = null
      val wr = staxFactory.createXMLStreamReader(new ByteArrayInputStream(workbookXml))
      try {
        while (rid == null && wr.hasNext) {
          if (wr.next() == XMLStreamConstants.START_ELEMENT &&
              wr.getLocalName == "sheet") {
            // r:id lives in the officeDocument relationship namespace;
            // match by local name to dodge prefix variance
            var i = 0
            while (rid == null && i < wr.getAttributeCount) {
              if (wr.getAttributeLocalName(i) == "id") rid = wr.getAttributeValue(i)
              i += 1
            }
          }
        }
      } finally wr.close()
      if (rid == null) None
      else {
        var target: String = null
        val rr = staxFactory.createXMLStreamReader(new ByteArrayInputStream(relsXml))
        try {
          while (target == null && rr.hasNext) {
            if (rr.next() == XMLStreamConstants.START_ELEMENT &&
                rr.getLocalName == "Relationship" &&
                rr.getAttributeValue(null, "Id") == rid)
              target = rr.getAttributeValue(null, "Target")
          }
        } finally rr.close()
        Option(target).map { t =>
          if (t.startsWith("/")) t.stripPrefix("/") else s"xl/$t"
        }
      }
    } catch { case _: Exception => None }

  private def staxFactory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    // spreadsheet XML never needs DTDs; disabling them also closes XXE
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** `<si>` entries in document order; rich-text runs (`<r><t>…`)
    * concatenate, matching how every reader flattens them.
    */
  private def parseSharedStrings(xml: Array[Byte]): Vector[String] = {
    val r = staxFactory.createXMLStreamReader(new ByteArrayInputStream(xml))
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = true; cur.clear()
              case "t" if inSi => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inT =>
            cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = false; out += cur.toString
              case "t" => inT = false
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    out.result()
  }

  /** Column index from a cell ref like "BC23" → 54 (0-based). */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  private def parseSheet(xml: Array[Byte], sst: Vector[String],
      maxRows: Int): Vector[Vector[String]] = {
    val r = staxFactory.createXMLStreamReader(new ByteArrayInputStream(xml))
    val rows = Vector.newBuilder[Vector[String]]
    var nRows = 0
    var row = collection.mutable.ArrayBuffer.empty[String]
    var inRow = false
    var cellCol = -1
    var cellType = ""
    var inV = false
    var inIsT = false
    val text = new StringBuilder
    def endCell(): Unit = if (cellCol >= 0) {
      val raw = text.toString
      val value = cellType match {
        // guard the shared-string lookup: an empty or out-of-range
        // index surfaces as a null CELL flowing into the quarantine
        // contract, never an executor-side exception that fails the
        // whole load for one malformed workbook
        case "s" => raw.trim.toIntOption
          .filter(i => i >= 0 && i < sst.length).map(sst).orNull
        case "b" => if (raw.trim == "1") "true" else "false"
        case _ => raw // n / str / inlineStr / e: the cached text
      }
      while (row.length < cellCol) row += null
      if (row.length == cellCol) row += value else row(cellCol) = value
      cellCol = -1
    }
    try {
      while (r.hasNext && nRows < maxRows) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => inRow = true; row = collection.mutable.ArrayBuffer.empty[String]
              case "c" if inRow =>
                val ref = r.getAttributeValue(null, "r")
                cellCol = if (ref == null) row.length else colIndex(ref)
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
                text.clear()
              case "v" => inV = true
              case "t" if cellType == "inlineStr" => inIsT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inV || inIsT =>
            text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "row" =>
                inRow = false
                rows += row.toVector
                nRows += 1
              case "c" => endCell()
              case "v" => inV = false
              case "t" => inIsT = false
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    rows.result()
  }

  /** All-string DataFrame from a path (file or directory) of xlsx
    * workbooks: header row of the first workbook names the columns,
    * every workbook's data rows fan out to executors. Ragged rows pad /
    * truncate to the header width (null-filled — the quarantine gate
    * downstream decides their fate, never this reader).
    */
  def readXlsx(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    // schema probe: sort PATHS (strings) to pick the first workbook,
    // then fetch that one file's bytes — an orderBy over (path, content)
    // would shuffle every workbook's full payload just to read one
    val firstPath = bin.select(col("path")).orderBy(col("path"))
      .head.getString(0)
    val first = bin.filter(col("path") === firstPath)
      .select(col("content")).head.getAs[Array[Byte]](0)
    val header = parseXlsx(first, maxRows = 1).headOption
      .getOrElse(Vector.empty)
    require(header.nonEmpty && header.forall(_ != null),
      s"first workbook has no usable header row: $header")
    val n = header.length
    val data = bin.select(col("content")).as[Array[Byte]]
      .flatMap { b =>
        parseXlsx(b).drop(1) // every workbook carries the header row
          .map(r => r.padTo(n, null: String).take(n))
      }
    data.select((0 until n).map(i =>
      element_at(col("value"), i + 1).as(header(i))): _*)
  }

  /** Typed xlsx read behind the [[ExternalIngest]] quarantine contract:
    * each column try_casts to its schema type; a row where any present
    * string fails its cast lands INTACT (as JSON) in
    * [[ExternalIngest.CorruptCol]] with nulls elsewhere — the xlsx
    * mirror of PERMISSIVE csv. Schema field order must match the
    * workbook's column order by NAME (names come from the header row).
    */
  def readTypedXlsx(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val raw = readXlsx(spark, path)
    val bad = schema.fields.map { f =>
      col(f.name).isNotNull && expr(s"try_cast(`${f.name}` AS ${f.dataType.sql})").isNull
    }.reduce(_ || _)
    val casts = schema.fields.map { f =>
      when(bad, lit(null)).otherwise(
        expr(s"try_cast(`${f.name}` AS ${f.dataType.sql})")).as(f.name)
    }
    raw.select(casts :+ when(bad,
      to_json(struct(raw.columns.map(col): _*))).as(ExternalIngest.CorruptCol): _*)
  }
}
