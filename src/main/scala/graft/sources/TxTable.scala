package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transactional PARQUET TABLE with a version-log commit protocol —
  * the lakehouse-table story the reference delegates to Postgres
  * (reference etl.py:145-160 `to_sql(if_exists=...)`; init_db.sql's
  * constrained star): MERGE-INTO upsert semantics, snapshot reads
  * with time travel, optimistic concurrent-writer safety, per-file
  * column statistics for data skipping, and a Z-order re-layout pass
  * — the Delta/Iceberg-class feature set re-derived on plain parquet
  * plus an atomic-rename manifest log, no table-format dependency.
  *
  * Layout:
  * {{{
  *   <table>/data/v<N>/part-*.parquet     // immutable data files
  *   <table>/_log/v<N>.json               // manifest: the LIVE file set
  * }}}
  * A manifest lists every live file with its row count and typed
  * column min/max. Readers resolve the latest (or any historical)
  * manifest and read exactly its files — data files are immutable, so
  * every version stays readable until [[vacuum]] (time travel).
  *
  * COMMIT = write manifest to a temp name, then ATOMIC_MOVE to
  * `v<N+1>.json`. The filesystem's atomic rename is the transaction:
  * exactly one writer can create a given version, a concurrent writer
  * gets [[java.nio.file.FileAlreadyExistsException]] wrapped as
  * [[java.util.ConcurrentModificationException]] and must re-read the
  * new latest version and retry (optimistic concurrency, the Delta
  * protocol's shape). Atomic rename holds on POSIX filesystems and
  * HDFS; an object-store deployment swaps this single primitive for a
  * putIfAbsent/conditional-write commit — the rest of the protocol is
  * unchanged.
  *
  * MERGE is copy-on-write at FILE granularity: the update keys' range
  * is intersected with each live file's key stats, only intersecting
  * files are rewritten (existing rows of updated keys dropped via
  * anti-join, update rows appended), untouched files carry over by
  * reference. At 100 TB the rewrite cost is the touched fraction, not
  * the table — which is why the stats and the Z-order layout matter:
  * clustered keys → few touched files.
  */
object TxTable {

  /** Typed per-file min/max. Values ride as STRINGS with a type tag;
    * ordering dispatches on the tag — numeric for long/double,
    * lexicographic for string/date/timestamp (correct for ISO-8601
    * renderings, including variable-length fraction digits). String
    * keys are the realistic skipping case at 100 TB — natural keys are
    * CHAR codes (reference init_db.sql:9,17), not synthetic longs.
    */
  final case class ColStats(typ: String, min: String, max: String) {
    private def cmp(a: String, b: String): Int = typ match {
      case "long"   => java.lang.Long.compare(a.toLong, b.toLong)
      case "double" => java.lang.Double.compare(a.toDouble, b.toDouble)
      case _        => a.compareTo(b)
    }
    /** Does the file range [min,max] intersect the query range [lo,hi]? */
    def intersects(lo: String, hi: String): Boolean =
      cmp(min, hi) <= 0 && cmp(max, lo) >= 0
    def minLong: Long = min.toLong
    def maxLong: Long = max.toLong
  }
  object ColStats {
    def ofLongs(min: Long, max: Long): ColStats =
      ColStats("long", min.toString, max.toString)
  }
  /** `nullCounts`: per-stats-column null counts — the third skipping
    * signal after min/max. `IS NULL` skips files with zero nulls,
    * `IS NOT NULL` (and any range predicate, which null never
    * satisfies) skips files where the column is ENTIRELY null.
    * Absent for legacy manifests → conservative keep (same contract
    * as parquet footers' optional null_count).
    */
  final case class FileEntry(path: String, rows: Long, stats: Map[String, ColStats],
      nullCounts: Map[String, Long] = Map.empty)
  final case class Manifest(version: Int, files: Seq[FileEntry])
  final case class MergeResult(version: Int, rewritten: Int, untouched: Int)

  private val M = new ObjectMapper()

  // ------------------------------------------------------------ manifest io

  private def logDir(table: String): Path = Paths.get(table, "_log")

  /** Latest committed version, 0 when the table does not exist. */
  def latestVersion(table: String): Int = {
    val dir = logDir(table)
    if (!Files.isDirectory(dir)) return 0
    Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.matches("v\\d+\\.json") => s.stripPrefix("v").stripSuffix(".json").toInt }
      .foldLeft(0)(math.max)
  }

  /** Oldest version whose manifest is still retained ([[vacuum]]
    * drops manifests below its keepFromVersion) — the lower bound of
    * the time-travel window. 0 when the table does not exist.
    */
  def oldestRetainedVersion(table: String): Int = {
    val dir = logDir(table)
    if (!Files.isDirectory(dir)) return 0
    val vs = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.matches("v\\d+\\.json") => s.stripPrefix("v").stripSuffix(".json").toInt }
      .toSeq
    if (vs.isEmpty) 0 else vs.min
  }

  def manifest(table: String, version: Int): Manifest = {
    val node = M.readTree(Files.readAllBytes(logDir(table).resolve(f"v$version%08d.json")))
    val files = node.get("files").elements().asScala.map { f =>
      val stats = f.get("stats").properties().asScala.map { e =>
        val v = e.getValue
        val tn = v.get("typ")
        // pre-typed manifests carried bare numeric min/max (long-only)
        e.getKey -> (if (tn == null) ColStats.ofLongs(v.get("min").asLong(), v.get("max").asLong())
                     else ColStats(tn.asText(), v.get("min").asText(), v.get("max").asText()))
      }.toMap
      val nulls = Option(f.get("nulls")).map { nn =>
        nn.properties().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
      }.getOrElse(Map.empty[String, Long])
      FileEntry(f.get("path").asText(), f.get("rows").asLong(), stats, nulls)
    }.toSeq
    Manifest(node.get("version").asInt(), files)
  }

  private def writeManifest(table: String, m: Manifest,
      batches: Set[Long] = Set.empty): Unit = {
    val root = M.createObjectNode()
    root.put("version", m.version)
    if (batches.nonEmpty) {
      val ba = root.putArray("batches")
      batches.toSeq.sorted.foreach(ba.add)
    }
    val arr = root.putArray("files")
    m.files.foreach { f =>
      val fn = arr.addObject()
      fn.put("path", f.path)
      fn.put("rows", f.rows)
      val sn = fn.putObject("stats")
      f.stats.toSeq.sortBy(_._1).foreach { case (c, s) =>
        val cn = sn.putObject(c)
        if (s.typ == "long") { // long stays the bare-numeric legacy shape
          cn.put("min", s.min.toLong); cn.put("max", s.max.toLong)
        } else {
          cn.put("typ", s.typ); cn.put("min", s.min); cn.put("max", s.max)
        }
        ()
      }
      if (f.nullCounts.nonEmpty) {
        val nn = fn.putObject("nulls")
        f.nullCounts.toSeq.sortBy(_._1).foreach { case (c, n) => nn.put(c, n); () }
      }
    }
    val dir = logDir(table)
    Files.createDirectories(dir)
    val tmp = dir.resolve(f".tmp-v${m.version}%08d-${Thread.currentThread().getId}")
    Files.write(tmp, M.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    // EXCLUSIVE publish via link(2): rename(2) silently REPLACES an
    // existing target on POSIX (an ATOMIC_MOVE would let the second
    // writer clobber the first), while creating a hard link to an
    // existing name fails atomically with EEXIST — exactly the
    // putIfAbsent a version log needs.
    try {
      Files.createLink(dir.resolve(f"v${m.version}%08d.json"), tmp)
      Files.deleteIfExists(tmp)
    } catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new java.util.ConcurrentModificationException(
          s"version ${m.version} was committed by a concurrent writer — " +
            s"re-read latest and retry: $e")
    }
    ()
  }

  /** Commit `files` as the new live set on top of `expectedParent`.
    * Atomic: exactly one writer wins a version; losers must rebase.
    * The parent's batch ledger is CARRIED FORWARD: the exactly-once
    * dedup set must survive maintenance commits (compact/zorder/merge)
    * interleaved with streaming appends, or a replayed micro-batch
    * after a compaction would re-land (Delta retains its SetTransaction
    * ledger across commits for the same reason).
    */
  def commit(table: String, expectedParent: Int, files: Seq[FileEntry]): Int = {
    val v = expectedParent + 1
    writeManifest(table, Manifest(v, files), batchesAt(table, expectedParent))
    v
  }

  // ------------------------------------------------------------- data files

  /** Stats type tag for a column's Spark type — drives the ordering
    * used by [[ColStats.intersects]].
    */
  private def statTyp(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => "long"
      case FloatType | DoubleType | _: DecimalType       => "double"
      case DateType                                      => "date"
      case TimestampType                                 => "timestamp"
      case _                                             => "string"
    }
  }

  /** Write `df` as a new immutable file set under data/v<slot>/ and
    * return entries with per-file rows + typed min/max for `statsCols`
    * (the skipping keys — integral, string, date, decimal all work).
    * Stats come from ONE pass over the just-written files grouped by
    * input_file_name — exact, and at scale a metadata-only read of
    * parquet footers would replace it.
    */
  private def writeFiles(spark: SparkSession, table: String, slot: String,
      df: DataFrame, statsCols: Seq[String]): Seq[FileEntry] = {
    val dir = Paths.get(table, "data", slot)
    df.write.mode("errorifexists").parquet(dir.toString)
    val written = spark.read.parquet(dir.toString)
    val typs = statsCols.map(c => c -> statTyp(written.schema(c).dataType)).toMap
    val aggs = count(lit(1)).as("rows") +:
      statsCols.flatMap(c => Seq(min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"),
        // count(col) skips nulls: rows - count(col) = the null count
        count(col(c)).as(s"cnt_$c")))
    written
      .groupBy(input_file_name().as("f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map { r =>
        // input_file_name() yields a percent-encoded URI; decode via
        // java.net.URI so table paths with spaces/special chars resolve
        val raw = r.getAs[String]("f")
        val p = if (raw.startsWith("file:")) new java.net.URI(raw).getPath else raw
        val rel = Paths.get(table).toAbsolutePath.relativize(Paths.get(p).toAbsolutePath)
        val rows = r.getAs[Long]("rows")
        val stats = statsCols.flatMap { c =>
          val mn = r.getAs[String](s"min_$c"); val mx = r.getAs[String](s"max_$c")
          // an all-null column gets NO stat entry → the file is never
          // range-skipped on that column (conservative, like parquet
          // footers) — its null count below still carries the signal
          if (mn == null || mx == null) None else Some(c -> ColStats(typs(c), mn, mx))
        }.toMap
        val nulls = statsCols.map(c => c -> (rows - r.getAs[Long](s"cnt_$c"))).toMap
        FileEntry(rel.toString, rows, stats, nulls)
      }.toSeq
      .sortBy(_.path)
  }

  /** Create the table at version 1 (fails if it already exists). */
  def create(spark: SparkSession, table: String, df: DataFrame,
      statsCols: Seq[String]): Int = {
    require(latestVersion(table) == 0, s"table exists: $table")
    commit(table, 0, writeFiles(spark, table, "v00000001", df, statsCols))
  }

  /** Append-only commit: old files carry over by reference. */
  def append(spark: SparkSession, table: String, df: DataFrame,
      statsCols: Seq[String]): Int = {
    val parent = latestVersion(table)
    val slot = f"v${parent + 1}%08d"
    commit(table, parent, manifest(table, parent).files ++
      writeFiles(spark, table, slot, df, statsCols))
  }

  /** CONCURRENT-WRITER append: the multi-writer form of [[append]].
    * [[append]] names its data slot after the version it expects to
    * win, so two simultaneous appenders collide at the DATA write
    * (errorifexists on the same slot) before the manifest race even
    * arbitrates. Here the data lands ONCE under a writer-unique slot,
    * then the manifest commit retries on an OCC conflict by
    * re-reading the new latest and re-attaching the SAME files —
    * append vs append is always semantically compatible (Delta's
    * disjoint-operation conflict resolution), so the rebase is pure
    * manifest work: no data rewrite, no re-read, O(1) per retry.
    * At 100 TB this is the ingestion norm — N loaders appending to
    * one table — and the retry loop is the entire coordination cost.
    */
  def appendConcurrent(spark: SparkSession, table: String, df: DataFrame,
      statsCols: Seq[String], maxRetries: Int = 20): Int = {
    val slot = f"a-${java.util.UUID.randomUUID().toString.take(12)}"
    val written = writeFiles(spark, table, slot, df, statsCols)
    var attempt = 0
    while (true) {
      val parent = latestVersion(table)
      val base = if (parent == 0) Seq.empty[FileEntry] else manifest(table, parent).files
      try return commit(table, parent, base ++ written)
      catch {
        case e: java.util.ConcurrentModificationException =>
          if (attempt >= maxRetries) throw e
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** OVERWRITE commit: the new version's live set is ONLY the new
    * files — the prior content stays time-travelable (immutable files)
    * until [[vacuum]], unlike a filesystem overwrite. Creates the
    * table when absent (version 1).
    */
  def overwrite(spark: SparkSession, table: String, df: DataFrame,
      statsCols: Seq[String]): Int = {
    val parent = latestVersion(table)
    val slot = f"v${parent + 1}%08d-o"
    commit(table, parent, writeFiles(spark, table, slot, df, statsCols))
  }

  /** RESTORE: make version `toVersion`'s content the live set again,
    * as a NEW commit referencing the OLD version's files — a pure
    * manifest operation, zero data movement (Delta's RESTORE
    * semantics: a bad write is rolled back without losing the history
    * between; the mistaken versions stay travelable until [[vacuum]]).
    * The batch ledger carries forward — a restore must not re-admit
    * replayed micro-batches.
    */
  def restore(spark: SparkSession, table: String, toVersion: Int): Int = {
    val parent = latestVersion(table)
    val oldest = oldestRetainedVersion(table)
    require(toVersion >= 1 && toVersion <= parent,
      s"restore target $toVersion outside committed range [1, $parent]")
    if (toVersion < oldest)
      // same retention-contract voice as the streaming source: the
      // version existed but vacuum reclaimed it — actionable, not a
      // raw NoSuchFileException out of the manifest read
      throw new IllegalStateException(
        s"restore target $toVersion on $table was vacuumed: the retained " +
          s"time-travel window is [$oldest, $parent]. Vacuum with a larger " +
          s"keepFromVersion margin if restores this deep must stay possible.")
    writeManifest(table, Manifest(parent + 1, manifest(table, toVersion).files),
      batchesAt(table, parent))
    parent + 1
  }

  /** DESCRIBE HISTORY: one row per RETAINED version — file count,
    * row count (manifest sums, no data read), net files added/removed
    * vs the parent, and the exactly-once batch-ledger size. The audit
    * surface a table owner queries before vacuum/restore decisions —
    * which is exactly why it must keep working AFTER a vacuum: only
    * versions whose manifests survive are listed, and the oldest
    * retained version (the retention horizon) reports its whole live
    * set as `files_added` since its parent diff is gone.
    */
  def history(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val latest = latestVersion(table)
    val oldest = math.max(1, oldestRetainedVersion(table))
    (oldest to latest).map { v =>
      val m = manifest(table, v)
      val prior: Set[String] =
        if (v == oldest) Set.empty
        else manifest(table, v - 1).files.map(_.path).toSet
      val paths = m.files.map(_.path).toSet
      (v, m.files.size.toLong, m.files.map(_.rows).sum,
        (paths -- prior).size.toLong, (prior -- paths).size.toLong,
        batchesAt(table, v).size.toLong)
    }.toDF("version", "n_files", "n_rows", "files_added", "files_removed",
      "n_batches")
  }

  // ---------------------------------------------------------------- reading

  /** Snapshot read: exactly the manifest's files (latest by default;
    * any committed `version` for time travel — files are immutable).
    * mergeSchema: files within one live set may carry DIFFERENT
    * schemas after an add-column evolution (an append with a wider
    * frame); the merged read surfaces the union schema with nulls for
    * the pre-evolution files — Delta/Iceberg add-column semantics on
    * plain parquet.
    */
  def read(spark: SparkSession, table: String, version: Int = -1): DataFrame = {
    val v = if (version > 0) version else latestVersion(table)
    val files = manifest(table, v).files.map(f => s"$table/${f.path}")
    spark.read.option("mergeSchema", "true").parquet(files: _*)
  }

  /** Manifest-level data skipping: split the live set into (kept,
    * skipped) by intersecting each file's [min, max] on `colName` with
    * [lo, hi] — the reader never opens a skipped file.
    */
  def prune(table: String, colName: String, lo: Long, hi: Long): (Seq[FileEntry], Seq[FileEntry]) =
    pruneTyped(table, colName, lo.toString, hi.toString)

  /** [[prune]] with typed bounds: strings compare lexicographically,
    * dates as ISO — pass bounds in the column's natural rendering.
    */
  def pruneTyped(table: String, colName: String, lo: String, hi: String): (Seq[FileEntry], Seq[FileEntry]) =
    manifest(table, latestVersion(table)).files.partition { f =>
      f.stats.get(colName).forall(_.intersects(lo, hi))
    }

  /** Range read through [[prune]] — only intersecting files are opened
    * (the residual filter still applies row-level inside them).
    */
  def readPruned(spark: SparkSession, table: String, colName: String,
      lo: Long, hi: Long): DataFrame = {
    val (kept, _) = prune(table, colName, lo, hi)
    if (kept.isEmpty) return read(spark, table).filter(lit(false))
    spark.read.option("mergeSchema", "true").parquet(kept.map(f => s"$table/${f.path}"): _*)
      .filter(col(colName) >= lo && col(colName) <= hi)
  }

  /** [[readPruned]] for string-keyed tables (CHAR-code natural keys). */
  def readPrunedTyped(spark: SparkSession, table: String, colName: String,
      lo: String, hi: String): DataFrame = {
    val (kept, _) = pruneTyped(table, colName, lo, hi)
    if (kept.isEmpty) return read(spark, table).filter(lit(false))
    spark.read.option("mergeSchema", "true").parquet(kept.map(f => s"$table/${f.path}"): _*)
      .filter(col(colName) >= lit(lo) && col(colName) <= lit(hi))
  }

  // ------------------------------------------------------------------ merge

  /** MERGE INTO (upsert on `keyCol`): rows whose key matches an update
    * are REPLACED, new keys are INSERTED — copy-on-write at file
    * granularity. Only files whose key-range stats intersect the
    * update keys' range are rewritten; the rest carry over by
    * reference, so a clustered table rewrites a handful of files.
    * CONTRACT: `updates` must carry one row per key — duplicate update
    * keys would all insert (SQL MERGE's "multiple rows matched" error
    * class); callers dedupe upstream (keepLatest is the usual step).
    */
  def merge(spark: SparkSession, table: String, updates: DataFrame,
      keyCol: String, statsCols: Seq[String]): MergeResult = {
    val parent = latestVersion(table)
    mergeSlotted(spark, table, updates, keyCol, statsCols, parent,
      f"v${parent + 1}%08d")
  }

  /** Concurrent-writer MERGE: unlike [[appendConcurrent]]'s rebase, a
    * merge that loses the version race must RE-EXECUTE against the new
    * latest — its rewrite set depends on the snapshot it read (the
    * concurrent commit may have rewritten, appended into, or deleted
    * from the very key range this merge touched, so re-attaching the
    * stale outputs would resurrect replaced rows or drop the other
    * writer's). That is Delta's conflict rule: appends rebase,
    * overlapping rewrites re-run. Data lands under a writer-unique
    * slot per attempt; a failed attempt's files are unreferenced
    * garbage until [[vacuum]] (the standard OCC cost model).
    */
  def mergeConcurrent(spark: SparkSession, table: String, updates: DataFrame,
      keyCol: String, statsCols: Seq[String], maxRetries: Int = 20): MergeResult = {
    var attempt = 0
    while (true) {
      val parent = latestVersion(table)
      try {
        return mergeSlotted(spark, table, updates, keyCol, statsCols, parent,
          f"m-${java.util.UUID.randomUUID().toString.take(12)}")
      } catch {
        case e: java.util.ConcurrentModificationException =>
          if (attempt >= maxRetries) throw e
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def mergeSlotted(spark: SparkSession, table: String, updates: DataFrame,
      keyCol: String, statsCols: Seq[String], parent: Int, slot: String): MergeResult = {
    val live = manifest(table, parent).files
    val bounds = updates.agg(min(col(keyCol)).cast("string"), max(col(keyCol)).cast("string")).head()
    if (bounds.isNullAt(0)) // empty update set: nothing to do, no new version
      return MergeResult(parent, 0, live.size)
    val (lo, hi) = (bounds.getString(0), bounds.getString(1))
    val (touched, untouched) = live.partition { f =>
      f.stats.get(keyCol).forall(_.intersects(lo, hi))
    }
    val survivors =
      if (touched.isEmpty) updates
      else spark.read.option("mergeSchema", "true")
        .parquet(touched.map(f => s"$table/${f.path}"): _*)
        .join(updates.select(col(keyCol)), Seq(keyCol), "left_anti")
        .unionByName(updates)
    // REWRITES PRESERVE CLUSTERING: without this, the survivor set
    // lands under the join's shuffle partitioning — one logical band
    // rewrite fragments into shuffle-partition-count files with
    // OVERLAPPING key ranges, and every later stats-pruned read/merge/
    // delete on the band touches all of them (measured: a post-merge
    // single-band delete opened 10 files instead of 1 at 20M rows).
    // Range-partitioning to the touched-file count keeps file count
    // and per-file min/max locality commit-over-commit.
    val written = writeFiles(spark, table, slot,
      survivors.repartitionByRange(math.max(1, touched.size), col(keyCol)),
      statsCols)
    val v = commit(table, parent, untouched ++ written)
    MergeResult(v, touched.size, untouched.size)
  }

  /** DELETE WHERE `predCol` ∈ [lo, hi] (bounds as the stats-string
    * rendering of the column's type, like [[pruneTyped]]): copy-on-
    * write at file granularity — only files whose min/max stats
    * intersect the range are rewritten WITHOUT their matching rows,
    * disjoint files carry over by reference, and a rewrite left empty
    * writes nothing (the file simply leaves the live set). The
    * Delta-class row-level DELETE with data skipping; nulls never
    * match a range predicate, so they survive. Old snapshots stay
    * readable (immutable files + manifest isolation).
    */
  def delete(spark: SparkSession, table: String, predCol: String,
      lo: String, hi: String, statsCols: Seq[String]): MergeResult = {
    val parent = latestVersion(table)
    deleteSlotted(spark, table, predCol, lo, hi, statsCols, parent,
      f"v${parent + 1}%08d-d")
  }

  /** Concurrent-writer DELETE — [[mergeConcurrent]]'s re-execute-on-
    * conflict recipe applied to [[delete]] (a rewriting mutation can
    * never rebase stale outputs; see mergeConcurrent's contract).
    */
  def deleteConcurrent(spark: SparkSession, table: String, predCol: String,
      lo: String, hi: String, statsCols: Seq[String],
      maxRetries: Int = 20): MergeResult = {
    var attempt = 0
    while (true) {
      val parent = latestVersion(table)
      try {
        return deleteSlotted(spark, table, predCol, lo, hi, statsCols, parent,
          f"d-${java.util.UUID.randomUUID().toString.take(12)}")
      } catch {
        case e: java.util.ConcurrentModificationException =>
          if (attempt >= maxRetries) throw e
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def deleteSlotted(spark: SparkSession, table: String, predCol: String,
      lo: String, hi: String, statsCols: Seq[String], parent: Int,
      slot: String): MergeResult = {
    val live = manifest(table, parent).files
    val (touched, untouched) = live.partition { f =>
      f.stats.get(predCol).forall(_.intersects(lo, hi))
    }
    if (touched.isEmpty) return MergeResult(parent, 0, live.size)
    val touchedDf = spark.read.option("mergeSchema", "true")
      .parquet(touched.map(f => s"$table/${f.path}"): _*)
    val dt = touchedDf.schema(predCol).dataType
    val kept = touchedDf.filter(col(predCol) < lit(lo).cast(dt) ||
      col(predCol) > lit(hi).cast(dt) || col(predCol).isNull)
    // same clustering-preservation contract as merge's rewrite
    val written =
      if (kept.isEmpty) Seq.empty[FileEntry]
      else writeFiles(spark, table, slot,
        kept.repartitionByRange(math.max(1, touched.size), col(predCol)),
        statsCols)
    val v = commit(table, parent, untouched ++ written)
    MergeResult(v, touched.size, untouched.size)
  }

  /** UPDATE … SET WHERE `predCol` ∈ [lo, hi]: copy-on-write at file
    * granularity, riding the same stats-intersection machinery as
    * [[delete]] — only files whose min/max intersect the range are
    * rewritten (matching rows get the SET expressions applied,
    * non-matching rows in the same file carry through unchanged),
    * disjoint files carry over by reference, and zero intersecting
    * files is a NO-OP (no new version — the Delta UPDATE fast path).
    * `set` maps column → new-value expression over the row's existing
    * columns (so `price -> col("price") * 1.1` works). Nulls never
    * match a range predicate and are never updated. Old snapshots
    * stay readable; rewrites preserve clustering (merge's contract).
    */
  def update(spark: SparkSession, table: String, predCol: String,
      lo: String, hi: String, set: Map[String, org.apache.spark.sql.Column],
      statsCols: Seq[String]): MergeResult = {
    val parent = latestVersion(table)
    updateSlotted(spark, table, predCol, lo, hi, set, statsCols, parent,
      f"v${parent + 1}%08d-u")
  }

  /** Concurrent-writer UPDATE — [[mergeConcurrent]]'s re-execute-on-
    * conflict recipe applied to [[update]].
    */
  def updateConcurrent(spark: SparkSession, table: String, predCol: String,
      lo: String, hi: String, set: Map[String, org.apache.spark.sql.Column],
      statsCols: Seq[String], maxRetries: Int = 20): MergeResult = {
    var attempt = 0
    while (true) {
      val parent = latestVersion(table)
      try {
        return updateSlotted(spark, table, predCol, lo, hi, set, statsCols,
          parent, f"u-${java.util.UUID.randomUUID().toString.take(12)}")
      } catch {
        case e: java.util.ConcurrentModificationException =>
          if (attempt >= maxRetries) throw e
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def updateSlotted(spark: SparkSession, table: String, predCol: String,
      lo: String, hi: String, set: Map[String, org.apache.spark.sql.Column],
      statsCols: Seq[String], parent: Int, slot: String): MergeResult = {
    require(!set.contains(predCol),
      s"UPDATE must not rewrite its own predicate column $predCol — " +
        s"the file-skipping contract (stats bound the OLD values) would break")
    val live = manifest(table, parent).files
    val (touched, untouched) = live.partition { f =>
      f.stats.get(predCol).forall(_.intersects(lo, hi))
    }
    if (touched.isEmpty) return MergeResult(parent, 0, live.size)
    val touchedDf = spark.read.option("mergeSchema", "true")
      .parquet(touched.map(f => s"$table/${f.path}"): _*)
    val dt = touchedDf.schema(predCol).dataType
    val matches = col(predCol) >= lit(lo).cast(dt) && col(predCol) <= lit(hi).cast(dt)
    val updated = set.foldLeft(touchedDf) { case (df, (c, v)) =>
      df.withColumn(c, when(matches, v).otherwise(col(c)))
    }
    // same clustering-preservation contract as merge/delete rewrites
    val written = writeFiles(spark, table, slot,
      updated.repartitionByRange(math.max(1, touched.size), col(predCol)),
      statsCols)
    val v = commit(table, parent, untouched ++ written)
    MergeResult(v, touched.size, untouched.size)
  }

  // ---------------------------------------------------------------- zorder

  /** Interleave the low 16 bits of two non-negative values — the
    * Z-order curve key. A codegen-able pure-column expression.
    */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 16).map { i =>
      (shiftleft(shiftright(a, i).bitwiseAND(1), 2 * i + 1) +
        shiftleft(shiftright(b, i).bitwiseAND(1), 2 * i))
        .cast("long")
    }.reduce(_ + _)

  /** Z-ORDER re-layout: rewrite the table range-partitioned by the
    * interleaved-bit curve over two columns' RANK SPACE (ntile of each
    * column → uniform bit coverage regardless of value skew), so both
    * columns get tight per-file min/max and [[prune]] skips on either
    * dimension — the layout knob a 100 TB reader turns when one scan
    * key stops being enough. Same-content commit (a new version whose
    * files hold identical rows).
    */
  def zorder(spark: SparkSession, table: String, colA: String, colB: String,
      statsCols: Seq[String], numFiles: Int = 16): Int = {
    import org.apache.spark.sql.expressions.Window
    val parent = latestVersion(table)
    val df = read(spark, table, parent)
    // rank-quantize into 16-bit space (two global rank windows — at
    // scale these become approx-quantile bucket maps; exact ranks here
    // keep the layout deterministic for specs)
    val ra = (percent_rank().over(Window.orderBy(col(colA))) * 65535.0).cast("long")
    val rb = (percent_rank().over(Window.orderBy(col(colB))) * 65535.0).cast("long")
    val slot = f"v${parent + 1}%08d-z"
    val laid = df.withColumn("_z", zValue(ra, rb))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
    val written = writeFiles(spark, table, slot, laid, statsCols)
    commit(table, parent, written)
  }

  // ------------------------------------------------------------ change feed

  /** CHANGE-DATA FEED between two committed versions, computed from
    * the manifests' FILE diff: net row inserts and deletes (an upsert
    * surfaces as delete+insert of the key — the consumer's MERGE
    * semantics, a Delta-CDF-lite without tracking columns). Only the
    * symmetric difference of the FILE sets is read — an append-mostly
    * table diffs its appended files, never the table — and rows a
    * copy-on-write rewrite merely CARRIED OVER (present identically in
    * a removed and an added file) cancel via the multiset exceptAll,
    * so a merge's untouched survivors never surface as phantom churn.
    */
  def changesBetween(spark: SparkSession, table: String,
      fromV: Int, toV: Int): DataFrame = {
    val before = manifest(table, fromV).files.map(_.path).toSet
    val after = manifest(table, toV).files.map(_.path).toSet
    def readSet(paths: Set[String]): Option[DataFrame] =
      if (paths.isEmpty) None
      else Some(spark.read.option("mergeSchema", "true")
        .parquet(paths.toSeq.sorted.map(p => s"$table/$p"): _*))
    val empty = read(spark, table, toV).filter(lit(false))
    val added = readSet(after -- before).getOrElse(empty)
    val removed = readSet(before -- after).getOrElse(empty)
    added.exceptAll(removed).withColumn("_change", lit("insert"))
      .unionByName(removed.exceptAll(added).withColumn("_change", lit("delete")))
  }

  // ------------------------------------------------- streaming / compaction

  /** Batch ids already committed to the table (the exactly-once
    * ledger), read from the latest manifest.
    */
  def committedBatches(table: String): Set[Long] =
    batchesAt(table, latestVersion(table))

  private def batchesAt(table: String, version: Int): Set[Long] = {
    if (version == 0) return Set.empty
    val node = M.readTree(Files.readAllBytes(logDir(table).resolve(f"v$version%08d.json")))
    val b = node.get("batches")
    if (b == null) Set.empty
    else b.elements().asScala.map(_.asLong()).toSet
  }

  /** EXACTLY-ONCE streaming append: the foreachBatch body for a
    * `writeStream` landing in this table under at-least-once delivery.
    * A replayed micro-batch (same batchId after a sink retry /
    * restart) is detected against the manifest's batch ledger and
    * SKIPPED — the idempotent-sink contract, here fused with the
    * table's own atomic commit so data and ledger can never disagree
    * (the standalone file-sink form is Maintenance.appendBatchIdempotent).
    * Returns true when the batch was committed, false when replayed.
    */
  def appendBatchExactlyOnce(spark: SparkSession, table: String, df: DataFrame,
      batchId: Long, statsCols: Seq[String]): Boolean = {
    if (committedBatches(table).contains(batchId)) return false
    val parent = latestVersion(table)
    val slot = f"v${parent + 1}%08d-b$batchId"
    val prior = if (parent == 0) Seq.empty else manifest(table, parent).files
    val files = prior ++ writeFiles(spark, table, slot, df, statsCols)
    // the data files and the ledger entry publish as ONE atomic
    // manifest — idempotence can never desync from the data
    writeManifest(table, Manifest(parent + 1, files),
      committedBatches(table) + batchId)
    true
  }

  /** Small-files COMPACTION as a table commit: rewrite the live set
    * into ~`targetFiles` files (content-identical new version; old
    * versions stay time-travelable until [[vacuum]]) — the maintenance
    * pass that keeps a streaming-appended table scannable.
    */
  def compact(spark: SparkSession, table: String, statsCols: Seq[String],
      targetFiles: Int = 4): Int = {
    val parent = latestVersion(table)
    val slot = f"v${parent + 1}%08d-c"
    val df = read(spark, table, parent).repartition(targetFiles)
    commit(table, parent, writeFiles(spark, table, slot, df, statsCols))
  }

  // -------------------------------------------------------- driver queries

  /** Inserted-key count for the [[mergeQuery]] driver binding. */
  val MergeInserts = 50L

  /** tx_merge — the MERGE protocol as a driver-checkable query: stage
    * the customer table into a fresh transactional table, MERGE an
    * update set (every 10th key re-tagged) plus [[MergeInserts]] brand-
    * new keys, read the committed snapshot back. The oracle states the
    * post-merge truth relationally — matching it proves replace-not-
    * duplicate, insert, and carry-over semantics on the real files.
    */
  def mergeQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Files.createTempDirectory("graft_tx_merge").resolve("t").toString
    val base = graft.util.Tables.customer(spark, sfDir)
      .select(col("c_custkey").cast("long").as("c_custkey"), lit("base").as("tag"))
    create(spark, t, base, Seq("c_custkey"))
    val maxKey = base.agg(max(col("c_custkey"))).head().getLong(0)
    val updates = base.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), lit("upd").as("tag"))
      .unionByName(spark.range(1, MergeInserts + 1)
        .select((col("id") + maxKey).as("c_custkey"), lit("ins").as("tag")))
    merge(spark, t, updates, "c_custkey", Seq("c_custkey"))
    read(spark, t).transform(graft.util.Cols.verifySort(_, col("c_custkey")))
  }

  def mergeQuerySql: String =
    s"""WITH m AS (SELECT max(c_custkey) AS mk FROM customer)
       |SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       |  CASE WHEN c_custkey % 10 = 0 THEN 'upd' ELSE 'base' END AS tag
       |FROM customer
       |UNION ALL
       |SELECT CAST(mk + i AS BIGINT), 'ins'
       |FROM m, generate_series(1, ${MergeInserts}) AS g(i)
       |ORDER BY c_custkey""".stripMargin

  /** tx_time_travel — snapshot isolation as a query: create from
    * orders, append a shifted copy, then read BOTH versions of the
    * same table; the per-version row counts prove the old snapshot is
    * untouched by the append (immutable files + manifest isolation).
    */
  def timeTravelQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = Files.createTempDirectory("graft_tx_tt").resolve("t").toString
    val base = graft.util.Tables.orders(spark, sfDir)
      .select(col("o_orderkey").cast("long").as("k"))
    create(spark, t, base, Seq("k"))
    append(spark, t, base.select((col("k") + 1000000000L).as("k")), Seq("k"))
    Seq(1, 2).map(v => (v, read(spark, t, v).count()))
      .toDF("version", "n_rows").orderBy(col("version"))
  }

  def timeTravelQuerySql: String =
    """SELECT CAST(1 AS INTEGER) AS version, count(*) AS n_rows FROM orders
      |UNION ALL
      |SELECT CAST(2 AS INTEGER), 2 * count(*) FROM orders
      |ORDER BY version""".stripMargin

  /** tx_delete — row-level DELETE as a driver-checkable query: stage
    * orders key-clustered (range layout → tight per-file key stats),
    * DELETE the middle [max/4, max/2] key band — which touches only
    * the files whose stats intersect it — and read the survivor
    * snapshot back, per-status. The oracle states the post-delete
    * truth relationally; matching it proves the rewrite dropped
    * exactly the matching rows while carried-over files kept theirs,
    * and the id_sum pins MEMBERSHIP, not just counts. File-skipping
    * and old-snapshot isolation are spec-gated (TxTableSpec).
    */
  def deleteQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Files.createTempDirectory("graft_tx_del").resolve("t").toString
    val base = graft.util.Tables.orders(spark, sfDir)
      .select(col("o_orderkey").cast("long").as("k"),
        col("o_orderstatus").as("status"))
    create(spark, t, base.repartitionByRange(8, col("k")), Seq("k"))
    val mk = base.agg(max(col("k"))).head().getLong(0)
    delete(spark, t, "k", (mk / 4).toString, (mk / 2).toString, Seq("k"))
    read(spark, t).groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("id_sum"))
      .orderBy(col("status"))
  }

  def deleteQuerySql: String =
    """WITH m AS (SELECT max(o_orderkey) AS mk FROM orders)
      |SELECT o_orderstatus AS status, count(*) AS n_rows,
      | CAST(sum(o_orderkey) AS BIGINT) AS id_sum
      |FROM orders, m
      |WHERE o_orderkey < mk // 4 OR o_orderkey > mk // 2
      |GROUP BY 1 ORDER BY status""".stripMargin

  /** tx_update — the UPDATE WHERE surface as a driver query: stage
    * orders into a range-clustered transactional table, UPDATE the
    * middle key band (two SET columns — a literal and an expression
    * over the existing value), read the final snapshot back
    * aggregated. Matching the oracle's CASE-rewrite proves matched
    * rows updated, non-matched rows in touched files carried through
    * bit-identically, and disjoint files untouched.
    */
  def updateQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Files.createTempDirectory("graft_tx_upd").resolve("t").toString
    val base = graft.util.Tables.orders(spark, sfDir)
      .select(col("o_orderkey").cast("long").as("k"),
        col("o_orderstatus").as("status"),
        pmod(col("o_orderkey"), lit(10)).cast("long").as("bucket"))
    create(spark, t, base.repartitionByRange(8, col("k")), Seq("k"))
    val mk = base.agg(max(col("k"))).head().getLong(0)
    update(spark, t, "k", (mk / 4).toString, (mk / 2).toString,
      Map("status" -> lit("UPD"), "bucket" -> (col("bucket") + 100L)), Seq("k"))
    read(spark, t).groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("id_sum"),
        sum(col("bucket")).as("bucket_sum"))
      .orderBy(col("status"))
  }

  def updateQuerySql: String =
    """WITH m AS (SELECT max(o_orderkey) AS mk FROM orders),
      |u AS (SELECT o_orderkey AS k,
      |  CASE WHEN o_orderkey >= mk // 4 AND o_orderkey <= mk // 2
      |       THEN 'UPD' ELSE o_orderstatus END AS status,
      |  CASE WHEN o_orderkey >= mk // 4 AND o_orderkey <= mk // 2
      |       THEN o_orderkey % 10 + 100 ELSE o_orderkey % 10 END AS bucket
      | FROM orders, m)
      |SELECT status, count(*) AS n_rows, CAST(sum(k) AS BIGINT) AS id_sum,
      | CAST(sum(bucket) AS BIGINT) AS bucket_sum
      |FROM u GROUP BY 1 ORDER BY status""".stripMargin

  /** tx_sql_read — the SQL/catalog surface as a driver query: stage
    * customer into a transactional table, append a shifted copy (v2),
    * then read v1 through a `CREATE TEMPORARY VIEW … USING graft-tx`
    * SQL view and v2 through `spark.read.format("graft-tx")` — the two
    * public entry points of [[TxDataSource]]. Per-segment counts from
    * both snapshots joined: matching the oracle proves the format
    * resolves, time-travels, and isolates snapshots end to end.
    */
  def sqlReadQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Files.createTempDirectory("graft_tx_sql").resolve("t").toString
    val base = graft.util.Tables.customer(spark, sfDir)
      .select(col("c_custkey").cast("long").as("k"), col("c_mktsegment").as("seg"))
    create(spark, t, base, Seq("k", "seg"))
    append(spark, t, base.select((col("k") + 10000000L).as("k"), col("seg")), Seq("k", "seg"))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_tx_v1 " +
      s"USING `graft-tx` OPTIONS (path '$t', version '1')")
    val v1 = spark.table("graft_tx_v1").groupBy("seg").agg(count(lit(1)).as("n_v1"))
    val v2 = spark.read.format("graft-tx").load(t)
      .groupBy("seg").agg(count(lit(1)).as("n_v2"))
    v1.join(v2, Seq("seg")).select(col("seg"), col("n_v1"), col("n_v2"))
      .orderBy(col("seg"))
  }

  def sqlReadQuerySql: String =
    """SELECT c_mktsegment AS seg, count(*) AS n_v1, 2 * count(*) AS n_v2
      |FROM customer GROUP BY 1 ORDER BY seg""".stripMargin

  // ---------------------------------------------------------------- vacuum

  /** Delete data files referenced by NO manifest ≥ `keepFromVersion`
    * and drop the older manifests — bounding time travel to the kept
    * window, reclaiming the copy-on-write garbage.
    */
  def vacuum(table: String, keepFromVersion: Int): Seq[String] = {
    val latest = latestVersion(table)
    val keep = (keepFromVersion to latest)
      .flatMap(v => manifest(table, v).files.map(_.path)).toSet
    val dataDir = Paths.get(table, "data")
    if (!Files.isDirectory(dataDir)) return Nil
    val deleted = Files.walk(dataDir).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .map(p => Paths.get(table).toAbsolutePath.relativize(p.toAbsolutePath).toString)
      .filter(rel => rel.endsWith(".parquet") && !keep.contains(rel))
      .toList
    deleted.foreach(rel => Files.deleteIfExists(Paths.get(table, rel)))
    (1 until keepFromVersion).foreach { v =>
      Files.deleteIfExists(logDir(table).resolve(f"v$v%08d.json"))
    }
    deleted
  }
}
