package graft.functions

import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.Decimal

/** SQL registration of graft's codegen expressions, so `spark.sql`
  * users (and `expr(...)` strings) can call them directly:
  *
  *  - `graft_charfold(str[, mult])`      → BIGINT polynomial char hash
  *  - `graft_fvec_dot(va, vb)`           → DOUBLE float-vector dot
  *  - `graft_srp_bucket(vec[, planes])`  → BIGINT hyperplane LSH bucket
  *  - `graft_minhash_sig(hashes[, k])`   → ARRAY<BIGINT> MinHash signature
  *  - `graft_text_count(str[, mode])`    → BIGINT word/non-ws/punct count
  *  - `graft_simhash32(words)`           → BIGINT 32-bit SimHash fingerprint
  *  - `graft_topk(v[, k])`               → ARRAY<BIGINT> AGGREGATE: exact top-k per group
  *  - `graft_qsketch(v[, acc])`          → BINARY AGGREGATE: mergeable GK quantile sketch
  *  - `graft_qsketch_merge(sk[, acc])`   → BINARY AGGREGATE: union-merge of sketches
  *  - `graft_qsketch_quantile(sk, p)`    → DOUBLE quantile estimate from a sketch
  *
  * Two routes: `.withExtensions(new GraftExtensions)` at session build
  * (`spark.sql.extensions=graft.functions.GraftExtensions` also works),
  * or [[GraftFunctions.register]] on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
    // SQL DML (DELETE FROM / UPDATE / MERGE INTO) over graft-tx
    // relations lowers onto the TxTable mutation engine (r16)
    ext.injectResolutionRule(session =>
      new graft.sources.TxDmlRule(session))
    // SQL time travel (VERSION AS OF / TIMESTAMP AS OF) over graft-tx
    // catalog tables — hint batch so it runs BEFORE Spark's own
    // v2-only time-travel resolution can refuse the statement (r16)
    ext.injectHintResolutionRule(session =>
      new graft.sources.TxTimeTravelRule(session))
    // maintenance statements Spark's grammar lacks (DESCRIBE HISTORY/
    // DETAIL, VACUUM, OPTIMIZE [ZORDER]) — everything else delegates
    ext.injectParser((session, delegate) =>
      new graft.sources.GraftSqlParser(session, delegate))
  }
}

object GraftFunctions {

  private def longArg(args: Seq[Expression], i: Int, default: Long): Long =
    args.lift(i).map {
      case Literal(v: Number, _) => v.longValue()
      case e => e.eval().asInstanceOf[Number].longValue()
    }.getOrElse(default)

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_charfold" ->
      ((args: Seq[Expression]) => PolyCharFold(args.head, longArg(args, 1, 31L))),
    "graft_fvec_dot" ->
      ((args: Seq[Expression]) => FloatVecDot(args(0), args(1))),
    "graft_srp_bucket" ->
      ((args: Seq[Expression]) => SrpBucket(args.head, longArg(args, 1, 8L).toInt)),
    "graft_minhash_sig" ->
      ((args: Seq[Expression]) => MinHashSig(args.head, longArg(args, 1, 16L).toInt)),
    "graft_text_count" ->
      ((args: Seq[Expression]) => TextCount(args.head, longArg(args, 1, 0L).toInt)),
    "graft_simhash32" ->
      ((args: Seq[Expression]) => SimHash32(args.head)),
    "graft_topk" ->
      ((args: Seq[Expression]) =>
        TopKAgg(args.head, longArg(args, 1, 5L).toInt).toAggregateExpression()),
    "graft_qsketch" ->
      ((args: Seq[Expression]) =>
        QuantileSketchAgg(args.head,
          longArg(args, 1, QuantileSketch.DefaultAccuracy).toInt).toAggregateExpression()),
    "graft_qsketch_merge" ->
      ((args: Seq[Expression]) =>
        QuantileSketchMergeAgg(args.head,
          longArg(args, 1, QuantileSketch.DefaultAccuracy).toInt).toAggregateExpression()),
    "graft_qsketch_quantile" ->
      ((args: Seq[Expression]) =>
        QuantileSketchQuantile(args.head, args(1).eval() match {
          case d: java.lang.Double => d.doubleValue()
          case d: java.math.BigDecimal => d.doubleValue()
          case d: Decimal => d.toDouble
          case n: Number => n.doubleValue()
        })),
  )

  /** Register all graft SQL functions on an existing session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => GraftBridge.registerFunction(spark, name, b) }
}
