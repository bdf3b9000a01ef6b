package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operations — the operational layer every parquet
  * warehouse needs at scale and no query engine gives you for free.
  *
  * Small-files compaction: streaming sinks and frequent small batch
  * appends degrade a table into thousands of KB-sized files; at 100 TB
  * the NameNode/listing cost and per-file open overhead dominate scan
  * time long before the bytes do. [[compact]] rewrites a parquet
  * directory to ~`targetBytes` files (computed from the actual on-disk
  * size, not a guessed partition count) and swaps it in atomically via
  * rename.
  */
object Maintenance {

  /** Rewrite the parquet dataset at `dir` into ceil(size/targetBytes)
    * files. Returns (filesBefore, filesAfter). The rewrite goes to a
    * sibling temp dir first and swaps via rename, so a reader never
    * sees a half-written table (single-writer assumption — real
    * multi-writer tables need a transaction log, which is a format
    * concern, not an engine one).
    */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles(p: Path): Seq[Path] = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) buf += it.next()
      buf.filter(f => f.isFile && f.getPath.getName.endsWith(".parquet")).map(_.getPath).toSeq
    }
    val before = parquetFiles(path)
    val totalBytes = before.map(fs.getFileStatus(_).getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new Path(path.getParent, path.getName + "._compact_tmp")
    fs.delete(tmp, true)
    spark.read.parquet(dir).repartition(nOut).write.parquet(tmp.toString)
    val old = new Path(path.getParent, path.getName + "._compact_old")
    fs.delete(old, true)
    require(fs.rename(path, old), s"could not stage $path aside")
    require(fs.rename(tmp, path), s"could not swap compacted table into $path")
    fs.delete(old, true)
    (before.size, parquetFiles(path).size)
  }

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative integer columns: bit i of `a` lands at position 2i+1
    * and bit i of `b` at 2i. Rows close in z-value are close in BOTH
    * dimensions, which is what makes the clustered layout below prune
    * on either filter column.
    */
  def zvalue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _) // disjoint bit positions: + is |

  /** Z-order-clustered parquet write — multi-dimensional data layout,
    * the OPTIMIZE ZORDER of the table formats expressed as a plain
    * parquet rewrite. A single-column sort prunes row groups only for
    * filters on THAT column; range-partitioning + sorting on the
    * interleaved [[zvalue]] tightens every row group's min/max stats on
    * BOTH dimensions, so parquet row-group skipping (and at cluster
    * scale, file skipping — range partitioning aligns file boundaries
    * with z-ranges) works for filters on either column or both. The
    * skipping is MEASURED, not assumed: SourcesSpec compares the scan's
    * output-row metric for the same selective filter over an unsorted
    * vs a z-ordered copy of the same data and asserts a multiple-×
    * reduction. At 100 TB this is the difference between touching a few
    * files and scanning the table for every point-ish query.
    */
  def zorderWrite(df: DataFrame, dir: String, c1: String, c2: String,
      nFiles: Int = 8, bits: Int = 16,
      rowGroupBytes: Long = 1L * 1024 * 1024): Unit =
    df.withColumn("_z", zvalue(col(c1), col(c2), bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.option("parquet.block.size", rowGroupBytes.toString)
      .mode("overwrite").parquet(dir)

  /** Idempotent batch append — the EXACTLY-ONCE sink contract for
    * foreachBatch: Structured Streaming guarantees at-least-once
    * delivery of (batchId, data), so a restarted query RE-DELIVERS the
    * last in-flight batch; a sink that blindly appends duplicates it.
    * Each batch writes to `dir/batch=<id>` via a temp dir + atomic
    * rename, and a re-delivered id is detected by the committed dir's
    * existence and skipped. Returns true if this call performed the
    * write, false if the batch was already committed (the replay path).
    * Readers see `dir` as an ordinary partitioned parquet table.
    */
  def appendBatchIdempotent(df: org.apache.spark.sql.DataFrame, dir: String,
      batchId: Long): Boolean = {
    val spark = df.sparkSession
    val target = new Path(dir, s"batch=$batchId")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(target)) return false // replayed batch: already committed
    val tmp = new Path(dir, s"._batch_${batchId}_tmp")
    fs.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    fs.mkdirs(target.getParent)
    require(fs.rename(tmp, target), s"could not commit batch $batchId into $dir")
    true
  }
}
