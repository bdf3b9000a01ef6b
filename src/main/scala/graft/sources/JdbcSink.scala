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
