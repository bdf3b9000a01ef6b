package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC warehouse sink/source — the reference pipeline's load phase
  * (reference: airflow/dags/etl.py:126 create_engine, :145/:167/:245
  * df.to_sql into Postgres; DDL in airflow/dags/sql/init_db.sql),
  * re-expressed as Spark's distributed JDBC writer.
  *
  * Scale notes vs the reference's single-connection to_sql: each
  * PARTITION opens its own connection and streams batched inserts, so
  * load throughput scales with executors until the database becomes the
  * bottleneck — which it does; `numPartitions` exists precisely to cap
  * concurrent connections (a 1000-executor cluster must not open 1000
  * sessions against one warehouse). Dim-sized frames default to a
  * single partition (one transaction-ish stream, mirroring to_sql);
  * fact loads should pick min(executors, what-the-DB-tolerates).
  */
object JdbcSink {

  /** Write `df` to `url`/`table`. `mode` Overwrite mirrors the
    * reference's to_sql(if_exists="replace"), Append its "append".
    */
  def loadTable(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Overwrite,
      driver: Option[String] = None,
      numPartitions: Int = 1,
      batchSize: Int = 10000,
      isolationLevel: String = "READ_COMMITTED"): Unit = {
    val out = if (numPartitions > 0 && df.rdd.getNumPartitions > numPartitions)
      df.coalesce(numPartitions) else df
    val w = out.write.mode(mode)
      .option("batchsize", batchSize)
      .option("isolationLevel", isolationLevel)
    driver.foreach(d => w.option("driver", d))
    w.jdbc(url, table, new Properties())
  }

  /** The reference warehouse's constrained star-schema DDL
    * (init_db.sql:7-41), in portable-enough SQL: surrogate dim keys as
    * GENERATED ALWAYS AS IDENTITY (the SERIAL analog), NOT NULL natural
    * keys, FK REFERENCES from the fact to all three dims, and the
    * pre-seeded '00000' default members unknown facts attribute to.
    * Loads then go through [[loadTable]] with SaveMode.Append — an
    * Overwrite would re-create the table WITHOUT the constraints, the
    * same reason the reference splits init_db from to_sql(append).
    */
  def starSchemaDdl(schema: String = "RETAIL"): Seq[String] = Seq(
    s"CREATE SCHEMA $schema",
    s"""CREATE TABLE $schema.DIM_CUSTOMERS (
       |  CUSTOMER_DIM_ID INTEGER NOT NULL GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
       |  CUSTOMER_ID CHAR(5) NOT NULL,
       |  COUNTRY VARCHAR(64))""".stripMargin,
    s"INSERT INTO $schema.DIM_CUSTOMERS (CUSTOMER_ID, COUNTRY) VALUES ('00000', NULL)",
    s"""CREATE TABLE $schema.DIM_PRODUCTS (
       |  PRODUCT_DIM_ID INTEGER NOT NULL GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
       |  STOCK_CODE CHAR(5) NOT NULL,
       |  DESCRIPTION VARCHAR(256))""".stripMargin,
    s"INSERT INTO $schema.DIM_PRODUCTS (STOCK_CODE, DESCRIPTION) VALUES ('00000', NULL)",
    s"""CREATE TABLE $schema.DIM_DATES (
       |  DATE_DIM_ID INTEGER NOT NULL PRIMARY KEY,
       |  DT DATE,
       |  YR SMALLINT,
       |  MON SMALLINT,
       |  DAY SMALLINT,
       |  DAY_OF_WEEK SMALLINT,
       |  WEEK SMALLINT)""".stripMargin,
    s"""CREATE TABLE $schema.FCT_INVOICES (
       |  INVOICE_ID CHAR(6),
       |  INVOICE_DATE_DIM_ID INTEGER REFERENCES $schema.DIM_DATES (DATE_DIM_ID),
       |  PRODUCT_DIM_ID INTEGER REFERENCES $schema.DIM_PRODUCTS (PRODUCT_DIM_ID),
       |  CUSTOMER_DIM_ID INTEGER REFERENCES $schema.DIM_CUSTOMERS (CUSTOMER_DIM_ID),
       |  UNIT_PRICE DECIMAL(8,2) NOT NULL,
       |  QUANTITY INTEGER NOT NULL)""".stripMargin)

  /** Create (optionally re-create) the constrained star schema over a
    * plain JDBC connection — the init_db step that must run BEFORE any
    * [[loadTable]] append. Drops the four tables first when they exist
    * (the reference's DROP SCHEMA CASCADE; Derby has no cascading
    * schema drop, so tables go individually, fact first for FK order).
    */
  def initStarSchema(url: String, driver: Option[String] = None,
      schema: String = "RETAIL"): Unit = {
    driver.foreach(Class.forName)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      def tryExec(sql: String): Unit =
        try { st.execute(sql); () } catch { case _: java.sql.SQLException => () }
      Seq("FCT_INVOICES", "DIM_CUSTOMERS", "DIM_PRODUCTS", "DIM_DATES")
        .foreach(t => tryExec(s"DROP TABLE $schema.$t"))
      starSchemaDdl(schema).foreach { sql =>
        // CREATE SCHEMA alone may pre-exist after a drop/re-init
        if (sql.startsWith("CREATE SCHEMA")) tryExec(sql) else { st.execute(sql); () }
      }
      st.close()
    } finally conn.close()
  }

  /** Read a JDBC table back; `partitionColumn`+`bounds` enable a
    * parallel partitioned scan (without them the read is one task —
    * fine for dims, wrong for facts).
    */
  def readTable(spark: SparkSession, url: String, table: String,
      driver: Option[String] = None,
      partitionColumn: Option[String] = None,
      bounds: Option[(Long, Long)] = None,
      numPartitions: Int = 8): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    driver.foreach(d => r.option("driver", d))
    (partitionColumn, bounds) match {
      case (Some(c), Some((lo, hi))) =>
        r.option("partitionColumn", c)
          .option("lowerBound", lo).option("upperBound", hi)
          .option("numPartitions", numPartitions)
          .load()
      case _ => r.load()
    }
  }
}
