package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, Row, SaveMode, SQLContext}
import org.apache.spark.sql.execution.streaming
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** SQL/catalog surface for [[TxTable]]: `spark.read.format("graft-tx")`
  * and `CREATE TEMPORARY VIEW t USING \`graft-tx\` OPTIONS (path '…',
  * version '…')` — snapshot reads and TIME TRAVEL become reachable
  * from plain SQL and BI tooling, the gap a warehouse user hits first
  * (the reference's star is SQL-queryable by design — dashboards over
  * Postgres, reference README.md:91).
  *
  * Options:
  *  - `path`     (required): the table root
  *  - `version`  (optional): snapshot to read; latest when absent
  *
  * The relation implements [[PrunedFilteredScan]]: pushed filters on
  * stats columns drive MANIFEST-LEVEL FILE SKIPPING (a skipped file is
  * never opened — the same pruning [[TxTable.prune]] exposes
  * programmatically), then column pruning and the residual row-level
  * filters execute inside the delegated parquet scan, so predicate
  * pushdown and column projection reach the parquet reader unchanged.
  * All filters are declared unhandled — Spark re-applies them above
  * the scan; the manifest skipping is a pure file-set reduction and
  * never changes row-level semantics.
  */
final class TxDataSource extends RelationProvider with DataSourceRegister
    with StreamSourceProvider with CreatableRelationProvider
    with StreamSinkProvider {
  override def shortName(): String = "graft-tx"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val table = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-tx requires a path option"))
    val version = parameters.get("version").map(_.toInt).getOrElse(-1)
    new TxRelation(sqlContext, table, version)
  }

  /** `df.write.format("graft-tx")` — the write half of the SQL
    * surface. SaveMode maps onto the table protocol: Append =
    * [[TxTable.append]] (create when absent), Overwrite =
    * [[TxTable.overwrite]] (a VERSIONED overwrite — prior snapshots
    * stay time-travelable), ErrorIfExists/Ignore with their standard
    * semantics. `statsColumns` (comma-separated) selects the manifest
    * min/max stats columns that drive data skipping on later reads.
    */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val table = tableOf(parameters)
    val stats = statsColsOf(parameters)
    val spark = sqlContext.sparkSession
    val exists = TxTable.latestVersion(table) > 0
    mode match {
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(s"graft-tx table exists: $table")
        TxTable.create(spark, table, data, stats)
      case SaveMode.Ignore =>
        if (!exists) TxTable.create(spark, table, data, stats)
      case SaveMode.Append =>
        if (exists) TxTable.append(spark, table, data, stats)
        else TxTable.create(spark, table, data, stats)
      case SaveMode.Overwrite =>
        TxTable.overwrite(spark, table, data, stats)
    }
    new TxRelation(sqlContext, table, -1)
  }

  // ------------------------------------------------- streaming source

  private def tableOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-tx requires a path option"))

  private def statsColsOf(parameters: Map[String, String]): Seq[String] =
    parameters.get("statsColumns")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val table = tableOf(parameters)
    (shortName(),
      schema.getOrElse(TxTable.read(sqlContext.sparkSession, table).schema))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): streaming.Source = {
    val table = tableOf(parameters)
    val ignoreChanges =
      parameters.get("ignoreChanges").exists(_.toBoolean)
    def cap(key: String): Option[Int] = parameters.get(key).map { s =>
      val k = s.toInt
      require(k >= 1, s"graft-tx: $key must be >= 1, got $k")
      k
    }
    // Delta's startingVersion: begin at a version instead of the full
    // snapshot — "latest" subscribes to changes committed after stream
    // start; a number N surfaces versions (N-1, ...] i.e. N onward
    val startingVersion = parameters.get("startingVersion").map {
      case "latest" => TxTable.latestVersion(table)
      case n =>
        val v = n.toInt
        require(v >= 1, s"graft-tx: startingVersion must be >= 1 or 'latest', got $n")
        v - 1 // exclusive base: version N itself is included
    }
    new TxStreamSource(sqlContext, table,
      schema.getOrElse(TxTable.read(sqlContext.sparkSession, table).schema),
      ignoreChanges, cap("maxVersionsPerTrigger"), cap("maxFilesPerTrigger"),
      startingVersion)
  }

  /** `df.writeStream.format("graft-tx")` — an EXACTLY-ONCE streaming
    * sink: each micro-batch lands through
    * [[TxTable.appendBatchExactlyOnce]], whose batch-id ledger rides
    * the same atomic manifest publish as the data, so a replayed
    * micro-batch (sink retry / query restart) commits nothing. Append
    * output mode only — the table protocol is append-structured;
    * aggregating queries use foreachBatch + merge.
    */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode): streaming.Sink = {
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graft-tx sink supports Append output mode only, got $outputMode")
    new TxStreamSink(tableOf(parameters), statsColsOf(parameters))
  }
}

/** The DSv1 sink behind `writeStream.format("graft-tx")`. */
final class TxStreamSink(table: String, statsCols: Seq[String])
    extends streaming.Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // re-base the micro-batch view onto a batch plan before writing
    // (the handed Dataset rides the streaming IncrementalExecution)
    val batch = GraftBridge.rebasedBatchDataFrame(data)
    TxTable.appendBatchExactlyOnce(batch.sparkSession, table, batch,
      batchId, statsCols)
  }
}

object TxDataSource {

  /** The manifest's live files for `version`, minus every file a
    * pushed-filter range provably excludes. Conservative: unknown
    * filter shapes, columns without stats, and timestamp-typed stats
    * (whose ISO rendering differs between engines in the fraction
    * digits) keep the file.
    */
  def filesFor(table: String, version: Int, filters: Seq[Filter]): Seq[TxTable.FileEntry] = {
    val v = if (version > 0) version else TxTable.latestVersion(table)
    TxTable.manifest(table, v).files.filter(f => filters.forall(keep(f, _)))
  }

  private def render(v: Any): String = v match {
    case null => null
    case s: String => s
    case other => other.toString // numbers, java.sql.Date (ISO) — matches ColStats rendering
  }

  /** Null-count skipping signals (manifest `nulls`; absent on legacy
    * manifests → conservative keep). A column KNOWN all-null can never
    * satisfy a range predicate; a column KNOWN null-free can never
    * satisfy IS NULL.
    */
  private def allNull(f: TxTable.FileEntry, c: String): Boolean =
    f.nullCounts.get(c).contains(f.rows) && f.rows > 0

  private def hasNulls(f: TxTable.FileEntry, c: String): Boolean =
    f.nullCounts.get(c).forall(_ > 0) // unknown → assume some

  private def rangeKeeps(f: TxTable.FileEntry, colName: String, lo: Any, hi: Any): Boolean =
    if (allNull(f, colName)) false
    else f.stats.get(colName) match {
      case Some(s) if s.typ != "timestamp" =>
        val (l, h) = (render(lo), render(hi))
        if (l == null || h == null) true else s.intersects(l, h)
      case _ => true
    }

  /** Max-rendered-string sentinel bounds: stats values never exceed
    * them in any typ's ordering, so "open" range ends keep files.
    */
  private def keep(f: TxTable.FileEntry, filter: Filter): Boolean = filter match {
    case EqualTo(c, v)            => rangeKeeps(f, c, v, v)
    case EqualNullSafe(c, null)   => hasNulls(f, c)
    case EqualNullSafe(c, v)      => rangeKeeps(f, c, v, v)
    case In(c, vs)                => vs.exists(v => rangeKeeps(f, c, v, v))
    case GreaterThan(c, v)        => lowerKeeps(f, c, v)
    case GreaterThanOrEqual(c, v) => lowerKeeps(f, c, v)
    case LessThan(c, v)           => upperKeeps(f, c, v)
    case LessThanOrEqual(c, v)    => upperKeeps(f, c, v)
    case IsNull(c)                => hasNulls(f, c)
    case IsNotNull(c)             => !allNull(f, c)
    case And(l, r)                => keep(f, l) && keep(f, r)
    case Or(l, r)                 => keep(f, l) || keep(f, r)
    case _                        => true
  }

  // one-sided ranges: file.max >= v  /  file.min <= v (strict vs
  // non-strict collapses to the non-strict test — conservative)
  private def lowerKeeps(f: TxTable.FileEntry, c: String, v: Any): Boolean =
    if (allNull(f, c)) false
    else f.stats.get(c) match {
      case Some(s) if s.typ != "timestamp" && render(v) != null =>
        s.intersects(render(v), s.max)
      case _ => true
    }

  private def upperKeeps(f: TxTable.FileEntry, c: String, v: Any): Boolean =
    if (allNull(f, c)) false
    else f.stats.get(c) match {
      case Some(s) if s.typ != "timestamp" && render(v) != null =>
        s.intersects(s.min, render(v))
      case _ => true
    }
}

/** One snapshot of a [[TxTable]] as a Spark relation. The scan
  * delegates to the session's parquet reader over EXACTLY the
  * manifest's (possibly filter-pruned) file set with the snapshot's
  * merged schema pinned — so schema evolution (add-column appends)
  * surfaces nulls for pre-evolution files, and a later writer's files
  * are invisible to this snapshot (snapshot isolation).
  */
final class TxRelation(ctx: SQLContext, table: String, version: Int)
    extends BaseRelation with PrunedFilteredScan {

  private val spark = ctx.sparkSession
  private val resolved = if (version > 0) version else TxTable.latestVersion(table)

  override def sqlContext: SQLContext = ctx

  override val schema: StructType = TxTable.read(spark, table, resolved).schema

  // rows cross the boundary as InternalRow straight from the delegated
  // parquet scan — no Row conversion layer on the hot path
  override def needConversion: Boolean = false

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val kept = TxDataSource.filesFor(table, resolved, filters.toSeq)
    val base: DataFrame =
      if (kept.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else
        // explicit snapshot schema (not re-inferred): pre-evolution
        // files yield nulls for later-added columns, and the pruned
        // file subset can't narrow the schema
        spark.read.schema(schema).parquet(kept.map(f => s"$table/${f.path}"): _*)
    // empty requiredColumns (count(*)-style scans) → zero-column rows
    val projected = base.select(requiredColumns.map(col).toSeq: _*)
    projected.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}

/** Structured-Streaming SOURCE over a [[TxTable]] — the lakehouse
  * round trip's read half (`appendBatchExactlyOnce` is the write
  * half): offsets ARE committed table versions, each micro-batch is
  * the file set ADDED between two manifests, so an append-only
  * producer streams through exactly once with no file-listing state —
  * the version log already total-orders commits. First batch = the
  * whole live set at source start (versions (0, latest]) — unless
  * `startingVersion` says otherwise: a number N starts the stream at
  * version N (inclusive), `"latest"` subscribes to changes committed
  * after stream start only (Delta's startingVersion semantics — the
  * CDC-consumer shape that must not replay a 100 TB snapshot).
  *
  * Append-only contract (Delta's streaming-read rule): a version that
  * REMOVED files (merge/delete/compact/zorder rewrites) aborts the
  * stream — silently re-reading added rewrite files would duplicate
  * carried-over rows. `ignoreChanges=true` opts into surfacing such
  * versions' added files anyway (consumer dedupes downstream,
  * Delta-semantics). Vacuum interacts the obvious way: the retention
  * window must cover consumer lag, or the lagging batch's files are
  * gone (same contract as Delta).
  *
  * Schema is pinned at source start; added files read under it
  * (pre-evolution files yield nulls — same alignment as the batch
  * relation).
  *
  * RATE LIMITING (Delta's maxFilesPerTrigger semantics): without a
  * cap, a lagging consumer — or a fresh checkpoint over a long-lived
  * table — gets the ENTIRE backlog as one micro-batch, the classic
  * catch-up OOM. `maxVersionsPerTrigger` bounds each batch to at most
  * k versions past the last offset this source handed out;
  * `maxFilesPerTrigger` additionally stops extending the batch once
  * the accumulated added-file count reaches the cap (always admitting
  * at least ONE version — a version is the atomic commit unit, so a
  * single version larger than the cap still flows, Delta-style).
  * Offsets stay committed table versions, so exactly-once across a
  * mid-backlog restart is unchanged: the engine re-runs the recovered
  * batch via getBatch before asking for new offsets (the documented
  * DSv1 recovery contract), which re-syncs the pacing state.
  */
final class TxStreamSource(ctx: SQLContext, table: String,
    override val schema: StructType, ignoreChanges: Boolean,
    maxVersionsPerTrigger: Option[Int] = None,
    maxFilesPerTrigger: Option[Int] = None,
    startingVersion: Option[Int] = None)
    extends streaming.Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, Offset => OffsetV2}

  private val spark = ctx.sparkSession

  /** Pacing watermark: the highest version this source has handed out
    * (via getOffset/latestOffset) or been asked to produce (via
    * getBatch). Synced in getBatch so checkpoint recovery — which
    * always replays the last batch through getBatch before the next
    * offset request — restores pacing relative to the consumer's true
    * progress, not version 0.
    */
  private var pacedThrough: Int = startingVersion.getOrElse(0)

  /** Trigger.AvailableNow's fixed horizon: versions committed AFTER
    * the trigger started are not part of this drain (the
    * SupportsTriggerAvailableNow contract — without it Spark falls
    * back to one uncapped batch, defeating the rate limit).
    */
  private var availableNowBound: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowBound = Some(TxTable.latestVersion(table))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def reportLatestOffset(): OffsetV2 = {
    val v = TxTable.latestVersion(table)
    if (v == 0) null else LongOffset(v.toLong)
  }

  /** The capped next end offset — the single pacing brain shared by
    * the DSv1 `getOffset` path and the admission-control
    * `latestOffset` path.
    */
  private def nextEndOffset(): Option[Int] = {
    val latestRaw = TxTable.latestVersion(table)
    val latest = availableNowBound.fold(latestRaw)(math.min(_, latestRaw))
    if (latest == 0) return None
    if (maxVersionsPerTrigger.isEmpty && maxFilesPerTrigger.isEmpty)
      return Some(latest)
    val base = pacedThrough
    if (latest <= base) return Some(latest)
    val byVersions = maxVersionsPerTrigger
      .map(k => math.min(latest, base + k)).getOrElse(latest)
    val end = maxFilesPerTrigger match {
      case None => byVersions
      case Some(fileCap) => capByFiles(base, byVersions, fileCap)
    }
    pacedThrough = math.max(pacedThrough, end)
    Some(end)
  }

  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 =
    nextEndOffset().map(v => LongOffset(v.toLong)).orNull

  override def getOffset: Option[streaming.Offset] =
    nextEndOffset().map(v => LongOffset(v.toLong))

  /** Largest version in (base, limit] whose cumulative added-file
    * count stays within `fileCap` — always at least base+1. Manifest
    * reads only (metadata-sized); a vacuumed base falls back to the
    * full range so getBatch surfaces the retention-contract error.
    */
  private def capByFiles(base: Int, limit: Int, fileCap: Int): Int = try {
    var prior: Set[String] =
      if (base == 0) Set.empty
      else TxTable.manifest(table, base).files.map(_.path).toSet
    var end = base
    var budget = fileCap
    var exhausted = false
    while (end < limit && !exhausted) {
      val next = TxTable.manifest(table, end + 1).files.map(_.path).toSet
      val added = (next -- prior).size
      if (added <= budget || end == base) { // first version always admitted
        end += 1; budget -= added; prior = next
        if (budget <= 0) exhausted = true
      } else exhausted = true
    }
    end
  } catch { case _: java.nio.file.NoSuchFileException => limit }

  // restart path hands back a SerializedOffset; LongOffset's json is
  // just the number, so parsing covers both shapes
  private def ver(o: streaming.Offset): Int = o match {
    case LongOffset(l) => l.toInt
    case other         => other.json.trim.toInt
  }

  /** Every missing-manifest / missing-file failure inside a batch is
    * the SAME root cause — vacuum outran the consumer — so every path
    * (start manifest, end manifest, the added files themselves)
    * surfaces the retention contract, not a raw missing-file trace.
    */
  private def retentionError(what: String, e: Throwable): Nothing =
    throw new IllegalStateException(
      s"graft-tx stream on $table: $what was vacuumed. Consumer lag " +
        s"exceeded the vacuum retention window — keep vacuum's " +
        s"keepFromVersion at or below every live consumer's offset, or " +
        s"restart the stream from a fresh checkpoint.", e)

  override def getBatch(start: Option[streaming.Offset],
      end: streaming.Offset): DataFrame = {
    // no checkpointed start = the stream's very first batch: begin at
    // startingVersion's exclusive base (0 = the full snapshot)
    val fromV = start.map(ver).getOrElse(startingVersion.getOrElse(0))
    val toV = ver(end)
    pacedThrough = math.max(pacedThrough, math.max(fromV, toV))
    val before =
      if (fromV == 0) Set.empty[String]
      else try TxTable.manifest(table, fromV).files.map(_.path).toSet
      catch {
        case e: java.nio.file.NoSuchFileException =>
          retentionError(s"committed offset (version $fromV)", e)
      }
    val after =
      try TxTable.manifest(table, toV).files
      catch {
        case e: java.nio.file.NoSuchFileException =>
          retentionError(s"batch end offset (version $toV)", e)
      }
    val removed = before -- after.map(_.path).toSet
    if (removed.nonEmpty && !ignoreChanges)
      throw new IllegalStateException(
        s"graft-tx stream on $table: version $toV removed ${removed.size} file(s) " +
          s"(merge/delete/compact rewrite). Streaming reads require append-only " +
          s"versions; set ignoreChanges=true to surface added files anyway.")
    val added = after.filterNot(f => before.contains(f.path))
    // verify the batch's data files still exist BEFORE handing the
    // plan to the engine — a vacuumed file inside the parquet scan
    // would otherwise surface as an opaque task failure mid-batch
    added.map(_.path).find(p => !java.nio.file.Files.exists(
        java.nio.file.Paths.get(table, p))).foreach { p =>
      retentionError(s"data file $p (batch versions ($fromV, $toV])",
        new java.nio.file.NoSuchFileException(s"$table/$p"))
    }
    val batch: DataFrame =
      if (added.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else
        spark.read.schema(schema).parquet(added.map(f => s"$table/${f.path}"): _*)
    GraftBridge.streamingDataFrame(batch)
  }

  override def stop(): Unit = ()
}
