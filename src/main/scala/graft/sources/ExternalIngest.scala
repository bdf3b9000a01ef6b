package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Messy external tabular ingest — the reference pipeline's E step
  * (reference: airflow/dags/etl.py:46 pd.read_excel with per-column
  * dtype overrides; :73-81 digit-shape id filters that drop cancelled
  * invoices like "C537226" and malformed codes).
  *
  * The public, scale-safe form of "ingest a spreadsheet with explicit
  * types" is CSV with an explicit schema and PERMISSIVE corrupt-record
  * capture: rows that fail the schema are QUARANTINED into a side
  * column instead of silently dropped (or, worse, failing the whole
  * 100 TB load at row 3 billion). FAILFAST stays available for loads
  * that should abort on first corruption.
  */
object ExternalIngest {

  val CorruptCol = "_corrupt_record"

  /** Read CSV with an explicit schema; malformed rows land intact in
    * [[CorruptCol]] with nulls elsewhere. No schema inference — at
    * scale inference is an extra full pass AND a correctness hazard
    * (a column of digit-like codes inferred numeric loses leading
    * zeros — the reference's dtype overrides exist for the same
    * reason).
    */
  def readTypedCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, mode: String = "PERMISSIVE"): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("header", header.toString)
      .option("mode", mode)
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** Split a [[readTypedCsv]] frame into (clean rows without the
    * quarantine column, quarantined raw rows). Callers persist the
    * input first if both sides are consumed (Spark disallows plans
    * touching only the corrupt column of a raw scan).
    */
  def splitQuarantine(df: DataFrame): (DataFrame, DataFrame) = (
    df.filter(col(CorruptCol).isNull).drop(CorruptCol),
    df.filter(col(CorruptCol).isNotNull))

  /** Fixed-width digits-only id shape (reference etl.py:73-81: 6-digit
    * invoice numbers, 5-digit stock/customer codes). A codegen'd rlike —
    * pushes through the scan like any predicate.
    */
  def digitShape(c: Column, width: Int): Column =
    c.rlike(s"^[0-9]{$width}$$")

  /** The reference's signature cleaning rule applied to a typed retail
    * frame: keep rows whose invoice id is exactly 6 digits (dropping
    * cancelled "C..." invoices) and whose stock and customer codes are
    * exactly 5 digits. Returns (kept, rejected-with-reason) — rejects
    * are labeled, not silently dropped, so a load can audit what the
    * shape gate removed.
    */
  def retailShapeGate(df: DataFrame, invoiceCol: String = "invoice_no",
      stockCol: String = "stock_code", customerCol: String = "customer_id")
      : (DataFrame, DataFrame) = {
    // NULL ids must reject, not slip through: rlike(NULL) is NULL, so a
    // bare !digitShape(...) is NULL and every when() branch would skip
    // (PERMISSIVE CSV ingest turns empty fields into NULLs, so this is
    // the common path, not a corner). coalesce pins the predicate to a
    // boolean; a NULL id then fails its shape check like any other.
    def badShape(c: String, w: Int): Column =
      !coalesce(digitShape(col(c), w), lit(false))
    val reason = when(badShape(invoiceCol, 6),
        when(col(invoiceCol).startsWith("C"), "cancelled_invoice").otherwise("bad_invoice_shape"))
      .when(badShape(stockCol, 5), "bad_stock_code")
      .when(badShape(customerCol, 5), "bad_customer_id")
    val tagged = df.withColumn("reject_reason", reason)
    (tagged.filter(col("reject_reason").isNull).drop("reject_reason"),
      tagged.filter(col("reject_reason").isNotNull))
  }
}
