package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.{Cols, Tables}

/** Range (interval-containment) join — naively a broadcast nested-loop
  * join (O(points × intervals) comparisons), re-expressed as a bucket
  * equi-join: points key by floor(value/w), intervals replicate to every
  * bucket they overlap (⌈len/w⌉+1 rows each), the join is a plain
  * equi-join on the bucket followed by the precise containment filter.
  * At 100 TB the point side shuffles (or broadcasts the replicated
  * intervals) on an integer key — no pair explosion, AQE-compatible.
  */
object Ranges {

  /** Generic core: join `points` to the `[lo, hi)` intervals of
    * `intervals` containing `valueCol`. `bucketWidth` trades interval
    * replication (≈len/w rows) against bucket selectivity; pick w near
    * the median interval length. Intervals are broadcast when small.
    */
  def bucketedRangeJoin(points: DataFrame, intervals: DataFrame,
      valueCol: String, loCol: String, hiCol: String, bucketWidth: Double,
      broadcastIntervals: Boolean = true): DataFrame = {
    val lastBucket = // hi is exclusive: an interval ending exactly on a bucket edge does not reach that bucket
      when(col(hiCol) % bucketWidth === 0.0, floor(col(hiCol) / bucketWidth).cast("long") - 1)
        .otherwise(floor(col(hiCol) / bucketWidth).cast("long"))
    val reps0 = intervals.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"), lastBucket)))
    val reps = if (broadcastIntervals) broadcast(reps0) else reps0
    points.withColumn("__bucket", floor(col(valueCol) / bucketWidth).cast("long"))
      .join(reps, Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }

  /** range_join_bucketed — testdata binding: events histogrammed into 20
    * overlapping price bands [15b, 15b+30).
    */
  def eventBands(spark: SparkSession, sfDir: String): DataFrame = {
    val bands = spark.range(0, 20)
      .select(col("id").as("band_id"),
        (col("id") * 15.0).as("lo"), (col("id") * 15.0 + 30.0).as("hi"))
    bucketedRangeJoin(Tables.events(spark, sfDir), bands, "value", "lo", "hi", 15.0)
      .groupBy(col("band_id"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_events"), Cols.pround(sum(col("value")), 2).as("total_value"))
      .orderBy(col("band_id"))
  }

  def eventBandsSql: String =
    """WITH bands AS (SELECT b AS band_id, b*15.0 AS lo, b*15.0 + 30.0 AS hi
      |               FROM generate_series(0, 19) AS g(b))
      |SELECT band_id, lo, hi, count(*) AS n_events,
      | floor(sum(value) * 100.0 + 0.5) / 100.0 AS total_value
      |FROM bands JOIN events ON value >= lo AND value < hi
      |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin
}
