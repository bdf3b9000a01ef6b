package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

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
