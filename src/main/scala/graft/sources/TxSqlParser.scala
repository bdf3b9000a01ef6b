package graft.sources

import java.util.Locale

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

/** MAINTENANCE SQL for graft-tx tables (r16 — the Delta-style
  * statement tier a table owner runs from a SQL console), injected as
  * a PARSER extension (`GraftExtensions` → `injectParser`): statements
  * Spark's grammar has no production for are recognized up front,
  * everything else delegates verbatim (errors included) —
  *
  *   DESCRIBE HISTORY '<table path>'
  *   DESCRIBE DETAIL  '<table path>'
  *   VACUUM '<table path>' RETAIN <n> VERSIONS [DRY RUN]
  *   OPTIMIZE '<table path>' [ZORDER BY (colA, colB)]
  *   RESTORE '<table path>' TO VERSION <n>
  *
  * Paths (not catalog names) address the tables — maintenance acts on
  * the physical table whatever catalog entries point at it, the same
  * addressing the Scala API uses. VACUUM's `RETAIN n VERSIONS` keeps
  * the newest n versions (keepFromVersion = latest − n + 1); DRY RUN
  * lists reclaimable files without deleting. OPTIMIZE is [[TxTable
  * .compact]]; with ZORDER BY it is [[TxTable.zorder]] (flat tables —
  * the partition-level forms stay on the maintenance API, same
  * refusal messages).
  */
class GraftSqlParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.maintenancePlan(sqlText).getOrElse(
      delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  private val History =
    """(?is)\s*DESCRIBE\s+HISTORY\s+'([^']+)'\s*;?\s*""".r
  private val Detail =
    """(?is)\s*DESCRIBE\s+DETAIL\s+'([^']+)'\s*;?\s*""".r
  private val Vacuum =
    """(?is)\s*VACUUM\s+'([^']+)'\s+RETAIN\s+(\d+)\s+VERSIONS(\s+DRY\s+RUN)?\s*;?\s*""".r
  private val Optimize =
    """(?is)\s*OPTIMIZE\s+'([^']+)'\s*(?:ZORDER\s+BY\s*\(\s*([\w\s,]+?)\s*\))?\s*;?\s*""".r
  private val Restore =
    """(?is)\s*RESTORE\s+'([^']+)'\s+TO\s+VERSION\s+(\d+)\s*;?\s*""".r
  private val Convert =
    """(?is)\s*CONVERT\s+TO\s+TX\s+'([^']+)'(?:\s+STATS\s*\(\s*([\w\s,]+?)\s*\))?\s*;?\s*""".r
  private val AddConstraint =
    """(?is)\s*ALTER\s+TABLE\s+'([^']+)'\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""".r
  private val DropConstraint =
    """(?is)\s*ALTER\s+TABLE\s+'([^']+)'\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*""".r
  private val Constraints =
    """(?is)\s*DESCRIBE\s+CONSTRAINTS\s+'([^']+)'\s*;?\s*""".r
  private val Clone =
    """(?is)\s*CLONE\s+'([^']+)'\s+TO\s+'([^']+)'(?:\s+VERSION\s+(\d+))?\s*;?\s*""".r

  private[sources] def maintenancePlan(sql: String): Option[LogicalPlan] = {
    // cheap gate before the regexes: every statement starts with one
    // of six keywords (catalog-name ALTER TABLE falls through to
    // Spark's grammar — only the quoted-path constraint forms match)
    val head = sql.trim.takeWhile(!_.isWhitespace).toUpperCase(Locale.ROOT)
    if (head != "DESCRIBE" && head != "VACUUM" && head != "OPTIMIZE" &&
      head != "RESTORE" && head != "CONVERT" && head != "ALTER" &&
      head != "CLONE")
      return None
    sql match {
      case History(path)  => Some(GraftHistoryCommand(path))
      case Detail(path)   => Some(GraftDetailCommand(path))
      case Constraints(path) => Some(GraftConstraintsCommand(path))
      case Vacuum(path, n, dry) =>
        Some(GraftVacuumCommand(path, n.toInt, dry != null))
      case Optimize(path, cols) =>
        Some(GraftOptimizeCommand(path,
          if (cols == null) None
          else Some(cols.split(',').map(_.trim).filter(_.nonEmpty).toSeq)))
      case Restore(path, v) => Some(GraftRestoreCommand(path, v.toInt))
      case Convert(path, stats) =>
        Some(GraftConvertCommand(path,
          if (stats == null) Seq.empty
          else stats.split(',').map(_.trim).filter(_.nonEmpty).toSeq))
      case Clone(src, dst, v) =>
        Some(GraftCloneCommand(src, dst, if (v == null) -1 else v.toInt))
      case AddConstraint(path, name, pred) =>
        Some(GraftAddConstraintCommand(path, name, pred.trim))
      case DropConstraint(path, name) =>
        Some(GraftDropConstraintCommand(path, name))
      case _ => None
    }
  }
}

/** `DESCRIBE HISTORY '<path>'` → [[TxTable.history]]'s rows. */
case class GraftHistoryCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType)(),
    AttributeReference("operation", StringType)(),
    AttributeReference("n_files", LongType)(),
    AttributeReference("n_rows", LongType)(),
    AttributeReference("files_added", LongType)(),
    AttributeReference("files_removed", LongType)(),
    AttributeReference("n_batches", LongType)())
  override def run(spark: SparkSession): Seq[Row] =
    TxTable.history(spark, path).collect().toSeq
}

/** `DESCRIBE DETAIL '<path>'` → [[TxTable.detail]]'s one row. */
case class GraftDetailCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType)(),
    AttributeReference("oldest_retained", IntegerType)(),
    AttributeReference("n_files", LongType)(),
    AttributeReference("n_rows", LongType)(),
    AttributeReference("n_bytes", LongType)(),
    AttributeReference("n_dv_rows", LongType)(),
    AttributeReference("partition_cols", StringType)(),
    AttributeReference("renames", StringType)(),
    AttributeReference("dropped_cols", StringType)(),
    AttributeReference("n_batches", LongType)(),
    AttributeReference("checkpoint_interval", IntegerType)())
  override def run(spark: SparkSession): Seq[Row] =
    TxTable.detail(spark, path).collect().toSeq
}

/** `VACUUM '<path>' RETAIN n VERSIONS [DRY RUN]` — keeps the newest n
  * versions; DRY RUN lists without deleting (Delta's audit step).
  */
case class GraftVacuumCommand(path: String, retain: Int, dryRun: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("reclaimed_path", StringType)())
  override def run(spark: SparkSession): Seq[Row] = {
    require(retain >= 1, "VACUUM must RETAIN at least 1 version")
    val keepFrom = math.max(1, TxTable.latestVersion(path) - retain + 1)
    val files =
      if (dryRun) TxTable.vacuumDryRun(path, keepFrom)._1
      else TxTable.vacuum(path, keepFrom)
    files.map(Row(_))
  }
}

/** `RESTORE '<path>' TO VERSION n` — roll the live set back to an
  * older version's content as a NEW commit (zero data movement; the
  * in-between versions stay travelable until VACUUM — Delta's RESTORE).
  */
case class GraftRestoreCommand(path: String, toVersion: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxTable.restore(spark, path, toVersion)))
}

/** `ALTER TABLE '<path>' ADD CONSTRAINT name CHECK (pred)` —
  * registers a table CHECK constraint ([[TxTable.addCheckConstraint]]:
  * validates the existing rows, refuses on violation, then enforces
  * on every later write). Path-addressed like the other maintenance
  * statements; catalog-name ALTER TABLE stays on Spark's grammar.
  */
case class GraftAddConstraintCommand(path: String, name: String,
    predicateSql: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxTable.addCheckConstraint(spark, path, name, predicateSql)))
}

/** `ALTER TABLE '<path>' DROP CONSTRAINT name` — metadata-only drop. */
case class GraftDropConstraintCommand(path: String, name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxTable.dropCheckConstraint(path, name)))
}

/** `DESCRIBE CONSTRAINTS '<path>'` — the CHECK constraints in force
  * at the latest version, one row per (name, predicate).
  */
case class GraftConstraintsCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("name", StringType)(),
    AttributeReference("predicate", StringType)())
  override def run(spark: SparkSession): Seq[Row] =
    TxTable.checkConstraints(path).toSeq.sortBy(_._1)
      .map { case (n, p) => Row(n, p) }
}

/** `CLONE '<src>' TO '<dst>' [VERSION n]` — zero-copy table clone
  * ([[TxTable.cloneTable]]: hard-linked files, full logical state,
  * history collapsed to one version).
  */
case class GraftCloneCommand(source: String, target: String, version: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxTable.cloneTable(spark, source, target, version)))
}

/** `CONVERT TO TX '<path>' [STATS (a, b)]` — make an existing
  * plain-parquet directory a graft-tx table in place, zero data
  * rewritten ([[TxTable.convert]]). STATS picks the skipping-stats
  * columns; absent, every atomic column gets them.
  */
case class GraftConvertCommand(path: String, statsCols: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType)(),
    AttributeReference("n_files", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val v = TxTable.convert(spark, path, statsCols)
    Seq(Row(v, TxTable.detail(spark, path).head().getAs[Long]("n_files")))
  }
}

/** `OPTIMIZE '<path>' [ZORDER BY (a, b, …)]` — compaction or the
  * z-curve re-layout over 1-4 columns; stats columns carry forward
  * from the manifest.
  */
case class GraftOptimizeCommand(path: String, zorder: Option[Seq[String]])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", IntegerType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val stats = TxTable.statsColumnsOf(path)
    val v = zorder match {
      case Some(cols) => TxTable.zorderCols(spark, path, cols, stats)
      case None       => TxTable.compact(spark, path, stats)
    }
    Seq(Row(v))
  }
}
