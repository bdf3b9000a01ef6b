package graft.util

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
import org.apache.spark.sql.functions._

/** Column helpers shared across operators. */
object Cols {

  /** Portable decimal rounding: floor(x·10^s + 0.5) / 10^s.
    *
    * `round()` is NOT portable across engines on exact .xx5 inputs:
    * Spark rounds via BigDecimal(shortest-repr).setScale(HALF_UP) while
    * e.g. DuckDB takes the float-multiply path, so round(2561.595, 2)
    * yields 2561.60 in one and 2561.59 in the other. This formulation is
    * a pure IEEE-double computation — identical bit-for-bit wherever
    * doubles are IEEE — which is what a cross-engine value oracle needs.
    */
  def pround(c: Column, scale: Int): Column = {
    val s = math.pow(10, scale)
    floor(c * lit(s) + lit(0.5)) / lit(s)
  }

  /** SQL text of [[pround]] for the DuckDB oracle side. */
  def proundSql(expr: String, scale: Int): String = {
    val s = math.pow(10, scale).toLong
    s"floor(($expr) * $s.0 + 0.5) / $s.0"
  }

  /** FLOORING integer division, matching DuckDB's `//`. Spark's `div`
    * truncates toward zero, so the two disagree on negative operands —
    * the pre-1970-timestamp trap for day bucketing. `x − pmod(x, d)`
    * is the floored multiple (pmod is non-negative), and integral
    * division of an exact multiple is exact, so this is pure int64
    * arithmetic with floor semantics on both engines (never the
    * Column `/` double path, which loses exactness past 2⁵³).
    */
  def floorDiv(x: Column, d: Long): Column = {
    val m = GraftBridge.toExpression(x - pmod(x, lit(d)))
    GraftBridge.toColumn(new IntegralDivide(m, Literal(d)))
  }

  /** Spread an under-parallel scan across the cluster before per-row
    * EXPENSIVE work (optimization guide §2.5, input skew: "one huge
    * unsplittable file … repartition immediately after the read").
    *
    * A single small/unsplittable input file plans as ONE scan task, so
    * a codec decode / per-row synthesis stage that follows it runs on
    * one core while the rest of the cluster idles. When the frame has
    * fewer partitions than the session's default parallelism this
    * round-robins it out to `defaultParallelism`; when the scan is
    * already parallel (the 100 TB case: thousands of input files) it is
    * a NO-OP — no extra exchange on the scaled path. Scale-adaptive by
    * construction: the threshold derives from the cluster, never a
    * constant tuned for local mode.
    *
    * Only for frames whose downstream work is per-row/partition-
    * independent (codec decodes, hash signatures); the caller keeps the
    * slim projection so the exchange moves keys, not payloads.
    */
  def fanOutScan(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Harness-imposed determinism sort, SKIPPED under the benchmark.
    *
    * Load-path operators (fact build, clean) have no semantic order —
    * a total range-sort of their full output exists ONLY so the
    * verify/oracle comparison sees a canonical row order. That sort is
    * pure overhead in the measured plan (at 100× data it is a real
    * cluster-wide range exchange on a path that needs none), so
    * [[graft.Bench]] sets the `graft.bench.nosort` system property and
    * this wrapper becomes identity there: the bench measures the
    * production plan, the verify path keeps its canonical order.
    * Operators whose SEMANTICS include order (top-k, ranked outputs)
    * must keep their own `orderBy` and never route through this.
    */
  def verifySort(df: org.apache.spark.sql.DataFrame, cols: Column*): org.apache.spark.sql.DataFrame =
    if (sys.props.contains("graft.bench.nosort")) df else df.orderBy(cols: _*)
}
