package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.{Cols, Tables}

/** Declarative data-quality constraint checking (the Deequ-style gate a
  * warehouse runs before publishing a load — generalizing etl_fk_audit
  * from one hand-built query to a constraint library).
  *
  * All constraint metrics for a table evaluate in ONE aggregation pass
  * (mergeable aggregates → one scan + one tiny shuffle at any scale);
  * the result unpivots to a row per constraint with the measured metric
  * and the pass verdict. Metrics are exact rationals or exact
  * aggregates, so the whole report is value-oracled.
  */
object Quality {

  /** One constraint: a metric aggregate over the table and the pass
    * predicate evaluated on the metric.
    */
  final case class Check(name: String, metric: Column, passes: Column => Column)

  /** Completeness: fraction of non-null values. Pass at ≥ `atLeast`. */
  def complete(c: String, atLeast: Double = 1.0): Check =
    Check(s"complete_$c",
      count(col(c)).cast("double") / count(lit(1)),
      m => m >= atLeast)

  /** Uniqueness: distinct values / rows. Pass at ≥ `atLeast` (1.0 = a
    * true key). Exact distinct — swap approx_count_distinct in when the
    * key cardinality makes exactness unaffordable.
    */
  def unique(c: String, atLeast: Double = 1.0): Check =
    Check(s"unique_$c",
      countDistinct(col(c)).cast("double") / count(lit(1)),
      m => m >= atLeast)

  /** Lower bound on a column's minimum. */
  def minAtLeast(c: String, bound: Double): Check =
    Check(s"min_$c", min(col(c)).cast("double"), m => m >= bound)

  /** Domain membership: fraction of values inside the allowed set. */
  def inDomain(c: String, allowed: Seq[String], atLeast: Double = 1.0): Check =
    Check(s"domain_$c",
      count_if(col(c).isin(allowed: _*)).cast("double") / count(lit(1)),
      m => m >= atLeast)

  /** Evaluate all checks in one aggregation; one output row per check:
    * (check, metric, passed).
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val agg = df.agg(checks.head.metric.as(checks.head.name),
      checks.tail.map(c => c.metric.as(c.name)): _*)
    val rows = checks.map(c =>
      struct(lit(c.name).as("check_name"),
        Cols.pround(col(c.name), 6).as("metric"),
        c.passes(col(c.name)).as("passed")))
    agg.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check_name").as("check_name"), col("r.metric").as("metric"),
        col("r.passed").as("passed"))
  }

  /** dq_constraints testdata binding: the publish gate for `orders`. */
  def dqConstraints(spark: SparkSession, sfDir: String): DataFrame =
    run(Tables.orders(spark, sfDir), Seq(
      complete("o_custkey"),
      complete("o_orderdate"),
      unique("o_orderkey"),
      minAtLeast("o_totalprice", 0.0),
      inDomain("o_orderstatus", Seq("F", "O", "P"))))
      .orderBy(col("check_name"))

  def dqConstraintsSql: String =
    """WITH m AS (SELECT
      | CAST(count(o_custkey) AS DOUBLE) / count(*) AS complete_o_custkey,
      | CAST(count(o_orderdate) AS DOUBLE) / count(*) AS complete_o_orderdate,
      | CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(*) AS unique_o_orderkey,
      | CAST(min(o_totalprice) AS DOUBLE) AS min_o_totalprice,
      | CAST(count(CASE WHEN o_orderstatus IN ('F','O','P') THEN 1 END) AS DOUBLE) / count(*) AS domain_o_orderstatus
      | FROM orders)
      |SELECT check_name, floor(metric * 1000000.0 + 0.5) / 1000000.0 AS metric, passed FROM (
      | SELECT 'complete_o_custkey' AS check_name, complete_o_custkey AS metric, complete_o_custkey >= 1.0 AS passed FROM m
      | UNION ALL SELECT 'complete_o_orderdate', complete_o_orderdate, complete_o_orderdate >= 1.0 FROM m
      | UNION ALL SELECT 'unique_o_orderkey', unique_o_orderkey, unique_o_orderkey >= 1.0 FROM m
      | UNION ALL SELECT 'min_o_totalprice', min_o_totalprice, min_o_totalprice >= 0.0 FROM m
      | UNION ALL SELECT 'domain_o_orderstatus', domain_o_orderstatus, domain_o_orderstatus >= 1.0 FROM m)
      |ORDER BY check_name""".stripMargin

  /** Statistical outlier detection: rows whose value sits more than
    * `zThresh` sample standard deviations from their GROUP's mean — the
    * anomaly screen run on a metric column before it feeds dashboards
    * or training labels.
    *
    * Shape: per-group moments are ONE map-side-combined aggregation
    * (output cardinality = group count, bounded); the stats table
    * broadcast-joins back onto the stream, so the screen is one scan +
    * one tiny shuffle at any corpus size. The threshold compares raw
    * doubles (`|v − μ| > z·σ`) identically on both engines; only the
    * REPORTED z is rounded.
    */
  def outliersOn(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, zThresh: Double): DataFrame = {
    val stats = df.groupBy(col(groupCol))
      .agg(avg(col(valueCol)).as("m"), stddev_samp(col(valueCol)).as("sd"))
    df.join(broadcast(stats), groupCol)
      .filter(abs(col(valueCol) - col("m")) > lit(zThresh) * col("sd"))
      .select(col(idCol), col(groupCol), col(valueCol),
        Cols.pround((col(valueCol) - col("m")) / col("sd"), 4).as("z"))
  }

  /** dq_outliers testdata binding: events whose value is > 2σ from the
    * event-type mean.
    */
  def dqOutliers(spark: SparkSession, sfDir: String): DataFrame =
    outliersOn(Tables.events(spark, sfDir), "event_type", "value", "event_id", 2.0)
      .transform(graft.util.Cols.verifySort(_, col("event_id")))

  /** Robust (MAD-based) outlier detection — the screen that survives
    * what breaks [[outliersOn]]: mean and σ are themselves dragged by
    * the outliers they're meant to find, while the median and the
    * median absolute deviation have a 50% breakdown point. Flags rows
    * with |v − median| > `kMad` · MAD within their group.
    *
    * Determinism: values enter as integer CENTS, so the interpolated
    * group median is exactly representable (midpoint of two longs →
    * a .0/.5 double — bit-identical on any engine, where interpolating
    * raw doubles can differ in ulps between engines' lerp forms), and
    * the flag compare is exact integer-valued double arithmetic.
    *
    * Shape: two aggregation passes (group medians, then deviation
    * medians), each map-side combined with |groups|-cardinality output
    * joined back AQE-broadcast — two scans + two tiny shuffles at any
    * corpus size. Exact medians need the full group in one pass; at
    * extreme group cardinality swap `percentile` for
    * `percentile_approx` and re-declare the op rows-only.
    */
  def madOutliersOn(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, kMad: Double): DataFrame = {
    val cents = df.select(col(idCol), col(groupCol),
      floor(col(valueCol) * 100.0 + 0.5).cast("long").as("cents"))
    val med = cents.groupBy(col(groupCol))
      .agg(percentile(col("cents"), lit(0.5)).as("med"))
    val dev = cents.join(med, groupCol)
      .withColumn("dev", abs(col("cents").cast("double") - col("med")))
    val mad = dev.groupBy(col(groupCol))
      .agg(percentile(col("dev"), lit(0.5)).as("mad"))
    dev.join(mad, groupCol)
      .filter(col("dev") > lit(kMad) * col("mad"))
      // MAD 0 (a >50%-constant group) degenerates the flag to dev > 0 —
      // still the right robust-stats read — but the score is undefined:
      // emit null rather than ±Inf (or an ANSI divide-by-zero error)
      .select(col(idCol), col(groupCol), col("cents"),
        when(col("mad") > 0.0, Cols.pround(col("dev") / col("mad"), 4))
          .as("mad_score"))
  }

  /** Benford's-law first-digit ppm, d = 1..9 — BAKED constants
    * (floor(log10(1+1/d)·10⁶ + ½)) so neither engine evaluates log10.
    */
  private val BenfordPpm: Seq[(Int, Long)] = Seq(1 -> 301030L, 2 -> 176091L,
    3 -> 124939L, 4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L,
    8 -> 51153L, 9 -> 45757L)

  /** dq_benford — first-significant-digit distribution audit (the
    * classic fabricated-numbers / unit-mixup screen: organically grown
    * monetary amounts follow Benford's law; keyed-in or re-scaled ones
    * don't): per digit the observed count, exact observed ppm, the
    * BAKED Benford expectation, and |deviation| ppm. The first digit
    * extracts from the INTEGER cents' decimal string (portable — no
    * float log10 whose rounding could reclassify a boundary value);
    * one map-side-combinable 9-group aggregate, 9 rows out at any
    * scale.
    */
  def dqBenford(spark: SparkSession, sfDir: String): DataFrame = {
    val expCase = BenfordPpm.map { case (d, p) => s"WHEN $d THEN ${p}L" }
      .mkString("CASE digit ", " ", " END")
    val o = Tables.orders(spark, sfDir)
      .select(floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
      .filter(col("cents") > 0)
      .select(substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
    val n = o.agg(count(lit(1)).as("n_total"))
    o.groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
      .crossJoin(broadcast(n))
      .select(col("digit"), col("n_obs"),
        expr("n_obs * 1000000 div n_total").as("obs_ppm"),
        expr(expCase).as("exp_ppm"))
      .withColumn("dev_ppm", abs(col("obs_ppm") - col("exp_ppm")))
      .orderBy(col("digit"))
  }

  def dqBenfordSql: String = {
    val expCase = BenfordPpm.map { case (d, p) => s"WHEN $d THEN $p" }
      .mkString("CASE digit ", " ", " END")
    s"""WITH c AS (
       | SELECT CAST(substring(CAST(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
       | FROM orders WHERE floor(o_totalprice * 100.0 + 0.5) > 0),
       |n AS (SELECT count(*) AS n_total FROM c)
       |SELECT digit, count(*) AS n_obs,
       | CAST(count(*) * 1000000 // n_total AS BIGINT) AS obs_ppm,
       | CAST($expCase AS BIGINT) AS exp_ppm,
       | CAST(abs(count(*) * 1000000 // n_total - ($expCase)) AS BIGINT) AS dev_ppm
       |FROM c, n GROUP BY digit, n_total ORDER BY digit""".stripMargin
  }

  /** dq_mad_outliers testdata binding: events whose value sits more
    * than 5 MADs from the event-type median.
    */
  def dqMadOutliers(spark: SparkSession, sfDir: String): DataFrame =
    madOutliersOn(Tables.events(spark, sfDir), "event_type", "value", "event_id", 5.0)
      .transform(graft.util.Cols.verifySort(_, col("event_id")))

  def dqMadOutliersSql: String =
    """WITH c AS (
      | SELECT event_id, event_type,
      |  CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      | FROM events),
      |med AS (SELECT event_type, quantile_cont(cents, 0.5) AS med FROM c GROUP BY 1),
      |dev AS (
      | SELECT event_id, c.event_type, cents, abs(CAST(cents AS DOUBLE) - med) AS dev
      | FROM c JOIN med ON c.event_type = med.event_type),
      |mad AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY 1)
      |SELECT event_id, d.event_type, cents,
      | CASE WHEN mad > 0.0 THEN floor((dev / mad) * 10000.0 + 0.5) / 10000.0 END AS mad_score
      |FROM dev d JOIN mad ON d.event_type = mad.event_type
      |WHERE dev > 5.0 * mad
      |ORDER BY event_id""".stripMargin

  def dqOutliersSql: String =
    """WITH s AS (
      | SELECT event_type, avg(value) AS m, stddev_samp(value) AS sd
      | FROM events GROUP BY 1)
      |SELECT event_id, e.event_type, value,
      | floor(((value - m) / sd) * 10000.0 + 0.5) / 10000.0 AS z
      |FROM events e JOIN s ON e.event_type = s.event_type
      |WHERE abs(value - m) > 2.0 * sd
      |ORDER BY event_id""".stripMargin

  /** Snapshot profile drift: per-column summary statistics of two data
    * slices (here: orders before vs from 1995) compared side by side
    * with an exact integer drift ratio — the monitoring report that
    * catches silent upstream changes (a price rescale, a vanished
    * segment, an id-space jump) BEFORE they poison downstream models.
    * The complement of etl_cdc_diff: CDC diffs row identity, this
    * diffs distributions.
    *
    * Shape: ONE aggregation pass computes both slices' metrics as
    * conditional aggregates (no second scan, no join of two profile
    * jobs), then the 1-wide-row result unpivots scan-side to a row per
    * metric. Constant output at any corpus size.
    * drift_ppm = |new − old| · 1e6 div max(old, 1) — all integer.
    */
  def profileDriftOn(df: DataFrame, oldPred: Column): DataFrame = {
    val isOld = when(oldPred, 1L).otherwise(0L)
    val isNew = lit(1L) - isOld
    val cents = floor(col("o_totalprice") * 100.0 + 0.5).cast("long")
    def side(flag: Column, c: Column): Column = when(flag === 1L, c)
    val wide = df.select(isOld.as("o"), cents.as("cents"),
        col("o_custkey"), col("o_orderpriority"))
      .agg(
        sum(col("o")).as("old_n_rows"),
        sum(lit(1L) - col("o")).as("new_n_rows"),
        min(side(col("o"), col("cents"))).as("old_min_cents"),
        min(side(lit(1L) - col("o"), col("cents"))).as("new_min_cents"),
        max(side(col("o"), col("cents"))).as("old_max_cents"),
        max(side(lit(1L) - col("o"), col("cents"))).as("new_max_cents"),
        countDistinct(side(col("o"), col("o_custkey"))).as("old_n_customers"),
        countDistinct(side(lit(1L) - col("o"), col("o_custkey"))).as("new_n_customers"),
        countDistinct(side(col("o"), col("o_orderpriority"))).as("old_n_priorities"),
        countDistinct(side(lit(1L) - col("o"), col("o_orderpriority"))).as("new_n_priorities"))
    val metrics = Seq("n_rows", "min_cents", "max_cents", "n_customers", "n_priorities")
    val stacked = metrics.map(m =>
      s"struct('$m' AS metric, old_$m AS v_old, new_$m AS v_new)").mkString(", ")
    wide.select(explode(expr(s"array($stacked)")).as("r"))
      .select(col("r.metric").as("metric"),
        col("r.v_old").as("v_old"), col("r.v_new").as("v_new"),
        expr("(abs(r.v_new - r.v_old) * 1000000) div greatest(abs(r.v_old), 1)")
          .as("drift_ppm"))
  }

  /** dq_profile_drift testdata binding: orders before vs from
    * 1995-01-01.
    */
  def dqProfileDrift(spark: SparkSession, sfDir: String): DataFrame =
    profileDriftOn(Tables.orders(spark, sfDir),
      col("o_orderdate") < lit("1995-01-01").cast("timestamp"))
      .orderBy(col("metric"))

  def dqProfileDriftSql: String =
    """WITH m AS (SELECT
      | CAST(sum(CASE WHEN old THEN 1 ELSE 0 END) AS BIGINT) AS old_n_rows,
      | CAST(sum(CASE WHEN old THEN 0 ELSE 1 END) AS BIGINT) AS new_n_rows,
      | min(CASE WHEN old THEN cents END) AS old_min_cents,
      | min(CASE WHEN NOT old THEN cents END) AS new_min_cents,
      | max(CASE WHEN old THEN cents END) AS old_max_cents,
      | max(CASE WHEN NOT old THEN cents END) AS new_max_cents,
      | CAST(count(DISTINCT CASE WHEN old THEN o_custkey END) AS BIGINT) AS old_n_customers,
      | CAST(count(DISTINCT CASE WHEN NOT old THEN o_custkey END) AS BIGINT) AS new_n_customers,
      | CAST(count(DISTINCT CASE WHEN old THEN o_orderpriority END) AS BIGINT) AS old_n_priorities,
      | CAST(count(DISTINCT CASE WHEN NOT old THEN o_orderpriority END) AS BIGINT) AS new_n_priorities
      | FROM (SELECT o_orderdate < TIMESTAMP '1995-01-01' AS old,
      |        CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
      |        o_custkey, o_orderpriority FROM orders)),
      |s AS (
      | SELECT 'n_rows' AS metric, old_n_rows AS v_old, new_n_rows AS v_new FROM m
      | UNION ALL SELECT 'min_cents', old_min_cents, new_min_cents FROM m
      | UNION ALL SELECT 'max_cents', old_max_cents, new_max_cents FROM m
      | UNION ALL SELECT 'n_customers', old_n_customers, new_n_customers FROM m
      | UNION ALL SELECT 'n_priorities', old_n_priorities, new_n_priorities FROM m)
      |SELECT metric, v_old, v_new,
      | (abs(v_new - v_old) * 1000000) // greatest(abs(v_old), 1) AS drift_ppm
      |FROM s ORDER BY metric""".stripMargin

  /** dq_freshness — event-time staleness audit: per key, the newest
    * event and its lag behind the table's global newest — the check a
    * pipeline runs to catch a SILENT partition: a source that stopped
    * producing fails no constraint (its historical rows are all
    * valid), it just goes quiet, and only its freshness lag says so.
    * One grouped aggregate (per-key max/count is map-side
    * combinable) plus a broadcast of the one-row global max; output is
    * |keys| rows at any scale. All-integer micros; staleness verdict
    * is an int flag at `staleSec`.
    */
  def freshnessOn(df: DataFrame, keyCol: String, tsCol: String,
      staleSec: Long): DataFrame = {
    // perKey feeds both the output and the global max — persist the
    // |keys|-row frame so the reuse is an explicit contract, not
    // ReuseExchange luck (the pagerank-pin lesson). Cache contract:
    // operators persist, CALLERS release (unpersist/clearCache when
    // done — Bench/Verify clearCache between queries)
    val perKey = df
      .select(col(keyCol), unix_micros(col(tsCol)).as("us"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), max(col("us")).as("max_us"))
      .transform(graft.util.CacheScope.cached)
    val global = perKey.agg(max(col("max_us")).as("global_max_us"))
    perKey.crossJoin(broadcast(global))
      .select(col(keyCol), col("n_events"), col("max_us"),
        expr("(global_max_us - max_us) div 1000000").as("lag_sec"))
      .withColumn("is_stale",
        when(col("lag_sec") > staleSec, 1).otherwise(0))
  }

  /** dq_freshness testdata binding: per event_type, stale past 1 h. */
  def dqFreshness(spark: SparkSession, sfDir: String): DataFrame =
    freshnessOn(Tables.events(spark, sfDir), "event_type", "ts", 3600L)
      .orderBy(col("event_type"))

  def dqFreshnessSql: String =
    """WITH k AS (
      | SELECT event_type, count(*) AS n_events, max(epoch_us(ts)) AS max_us
      | FROM events GROUP BY 1),
      |g AS (SELECT max(max_us) AS gmax FROM k)
      |SELECT event_type, n_events, max_us,
      | (gmax - max_us) // 1000000 AS lag_sec,
      | CAST(CASE WHEN (gmax - max_us) // 1000000 > 3600 THEN 1 ELSE 0 END AS INTEGER) AS is_stale
      |FROM k, g ORDER BY event_type""".stripMargin

  /** Warmup floor / flag band for [[volumeAnomalyOn]]: fewer than 3
    * trailing days yields no verdict; outside [½×, 2×] of the trailing
    * mean flags.
    */
  val VolMinPriorDays = 3L
  val VolLowPpm = 500000L
  val VolHighPpm = 2000000L

  /** dq_volume_anomaly — the silent-volume-shift monitor
    * ([[freshnessOn]]'s complement: freshness catches a source that
    * STOPPED; this catches one that silently halved or doubled): per
    * (key, day), today's row count as ppm of the trailing-week daily
    * mean, flagged outside [½×, 2×]. The trailing mean is exact
    * integer arithmetic — ppm = (n·10⁶·n_prior) div Σ_prior — over a
    * RANGE frame on the epoch-day ordinal (calendar-correct under gaps:
    * a silent day is absent from the frame, not zero-filled — the
    * frame denominator counts PRESENT days, so the ratio reads
    * "vs days that reported"). Days with < [[VolMinPriorDays]] prior
    * reporting days emit NULL ppm/flag (warmup, explicit).
    *
    * Shape: one (key, day) count aggregate + one key-partitioned range
    * window over the per-day rows (≤366·|keys| rows/yr — day-grain,
    * not event-grain); one shuffle end to end.
    * Output: (key, day_ord, n, n_prior, sum_prior, vol_ppm, flag).
    */
  def volumeAnomalyOn(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val perDay = df
      .select(col(keyCol),
        Cols.floorDiv(unix_micros(col(tsCol)), 86400000000L).as("day_ord"))
      .groupBy(col(keyCol), col("day_ord"))
      .agg(count(lit(1)).as("n"))
    val trail = Window.partitionBy(col(keyCol)).orderBy(col("day_ord"))
      .rangeBetween(-7, -1)
    perDay
      .withColumn("n_prior", count(col("n")).over(trail))
      .withColumn("sum_prior", sum(col("n")).over(trail))
      .withColumn("vol_ppm",
        when(col("n_prior") >= VolMinPriorDays,
          expr("(n * 1000000 * n_prior) div sum_prior")))
      .withColumn("flag",
        when(col("vol_ppm").isNull, lit(null).cast("int"))
          .when(col("vol_ppm") < VolLowPpm || col("vol_ppm") > VolHighPpm, 1)
          .otherwise(0))
      .select(col(keyCol), col("day_ord"), col("n"), col("n_prior"),
        col("sum_prior"), col("vol_ppm"), col("flag"))
  }

  /** dq_volume_anomaly testdata binding: per event_type daily volume. */
  def dqVolumeAnomaly(spark: SparkSession, sfDir: String): DataFrame =
    volumeAnomalyOn(Tables.events(spark, sfDir), "event_type", "ts")
      .orderBy(col("event_type"), col("day_ord"))

  def dqVolumeAnomalySql: String =
    s"""WITH d AS (
       | SELECT event_type, epoch_us(ts) // 86400000000 AS day_ord, count(*) AS n
       | FROM events GROUP BY 1, 2),
       |w AS (SELECT event_type, day_ord, n,
       |  CAST(count(n) OVER tr AS BIGINT) AS n_prior,
       |  CAST(sum(n) OVER tr AS BIGINT) AS sum_prior
       | FROM d WINDOW tr AS (PARTITION BY event_type ORDER BY day_ord
       |   RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING))
       |SELECT event_type, day_ord, CAST(n AS BIGINT) AS n, n_prior, sum_prior,
       | CASE WHEN n_prior >= $VolMinPriorDays
       |      THEN (n * 1000000 * n_prior) // sum_prior END AS vol_ppm,
       | CAST(CASE WHEN n_prior < $VolMinPriorDays THEN NULL
       |      WHEN (n * 1000000 * n_prior) // sum_prior < $VolLowPpm
       |        OR (n * 1000000 * n_prior) // sum_prior > $VolHighPpm THEN 1
       |      ELSE 0 END AS INTEGER) AS flag
       |FROM w ORDER BY event_type, day_ord""".stripMargin

  // ----------------------------------------------------------- key skew

  /** dq_skew_profile — shuffle-key skew diagnostics: the pre-flight a
    * 100 TB job runs on its join/groupBy keys BEFORE paying for the
    * shuffle, so the salting decision ([[Relational.saltedAgg]]/
    * [[Relational.saltedJoin]] and AQE's skew-join threshold) is made
    * from measurement, not from an OOM post-mortem. Per candidate key:
    * cardinality, total rows, heaviest-key count, the max/mean skew
    * ratio, the share held by the top-10 keys, and the integer salt
    * factor (ceil(max/mean)) that would level the heaviest partition
    * to the average.
    *
    * Shape at scale: one (key)-keyed count aggregate per profiled
    * column (map-side partials), a top-10 via distributed
    * TakeOrdered (never a global sort), and 1-row × 1-row scalar
    * joins. All integer arithmetic → fully value-oracled.
    * Output: one row per profiled key column.
    */
  def skewProfileOf(df: DataFrame, keyCol: String): DataFrame = {
    val cnt = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c"))
      .transform(graft.util.CacheScope.cached) // feeds stats AND top-10
    val top = cnt.orderBy(col("c").desc, col("k")).limit(10)
      .agg(sum(col("c")).as("top10"))
    cnt.agg(count(lit(1)).as("n_keys"), sum(col("c")).as("total_rows"),
        max(col("c")).as("max_cnt"))
      .crossJoin(broadcast(top))
      .select(lit(keyCol).as("key_col"), col("n_keys"), col("total_rows"),
        col("max_cnt"),
        // max_cnt×n_keys / 1000000×top10 products wrap silently in
        // Long at ~1e13-row×wide-key scale (non-ANSI semantics) — and
        // a wrapped product here yields a WRONG SALT FACTOR from the
        // very diagnostic meant to prevent bad shuffles. Route the
        // products through DECIMAL(38,0) (exact to 1e38; `div` still
        // returns BIGINT); quotients stay well inside Long.
        expr("(1000 * total_rows) div n_keys").as("mean_cnt_milli"),
        expr("(CAST(1000 AS DECIMAL(38,0)) * max_cnt * n_keys) div total_rows")
          .as("skew_ratio_milli"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * top10) div total_rows")
          .as("top10_ppm"),
        expr("(CAST(max_cnt AS DECIMAL(38,0)) * n_keys + total_rows - 1) div total_rows")
          .as("salt_factor"))
  }

  /** dq_skew_profile testdata binding: the three natural shuffle keys
    * of the star schema's fact joins.
    */
  def dqSkewProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    skewProfileOf(l, "l_suppkey")
      .unionAll(skewProfileOf(l, "l_partkey"))
      .unionAll(skewProfileOf(o, "o_custkey"))
      .orderBy(col("key_col"))
  }

  def dqSkewProfileSql: String = {
    def one(table: String, key: String): String =
      s"""(WITH c AS (SELECT $key AS k, CAST(count(*) AS BIGINT) AS c FROM $table GROUP BY 1),
         | s AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
         |        CAST(sum(c) AS BIGINT) AS total_rows,
         |        CAST(max(c) AS BIGINT) AS max_cnt FROM c),
         | t AS (SELECT CAST(sum(c) AS BIGINT) AS top10 FROM (
         |        SELECT c FROM c ORDER BY c DESC, k LIMIT 10))
         |SELECT '$key' AS key_col, n_keys, total_rows, max_cnt,
         | (1000 * total_rows) // n_keys AS mean_cnt_milli,
         | CAST((CAST(1000 AS HUGEINT) * max_cnt * n_keys) // total_rows AS BIGINT) AS skew_ratio_milli,
         | CAST((CAST(1000000 AS HUGEINT) * top10) // total_rows AS BIGINT) AS top10_ppm,
         | CAST((CAST(max_cnt AS HUGEINT) * n_keys + total_rows - 1) // total_rows AS BIGINT) AS salt_factor
         |FROM s CROSS JOIN t)""".stripMargin
    s"""${one("lineitem", "l_suppkey")}
       |UNION ALL ${one("lineitem", "l_partkey")}
       |UNION ALL ${one("orders", "o_custkey")}
       |ORDER BY key_col""".stripMargin
  }

  // -------------------------------------------------------- completeness

  /** dq_completeness — the first-look COLUMN PROFILE a table owner
    * runs before anything else: per column, row count, null count,
    * null rate (ppm), and exact distinct cardinality. One row per
    * profiled column.
    *
    * Shape at scale: ONE aggregate pass over the table. The exact
    * multi-column COUNT(DISTINCT) makes Catalyst plan an Expand
    * (one replicated stream per distinct column) — the exactness
    * contract this profile wants; a 100 TB caller trading exactness
    * for one pass swaps in the HLL sketch tier (q19_udaf_hll /
    * q36_hll_union). The ppm products ride DECIMAL(38,0) like
    * [[skewProfileOf]] — 1e6 × a 1e13 row count wraps Long silently.
    * The per-column fan-out is a union of 1-row projections over the
    * SAME aggregate (reused, not recomputed).
    */
  def completenessOf(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c")))
    val agged = df.agg(aggs.head, aggs.tail: _*)
      .transform(graft.util.CacheScope.cached) // one row, fanned out per column
    cols.map { c =>
      agged.select(
        lit(c).as("col_name"),
        col("n_rows"),
        (col("n_rows") - col(s"nn_$c")).as("n_null"),
        expr(s"(CAST(1000000 AS DECIMAL(38,0)) * (n_rows - nn_$c)) div n_rows")
          .as("null_ppm"),
        col(s"nd_$c").as("n_distinct"))
    }.reduce(_ unionAll _).orderBy(col("col_name"))
  }

  /** dq_completeness testdata binding: the events feed profiled
    * AFTER sentinel decoding — the realistic ordering (a feed encodes
    * "unknown" as a sentinel band; the profile must count it as
    * missing, so the decode runs first — the inverse of etl_clean's
    * sentinel null-FILL). Here every 7th user_id decodes to NULL, so
    * the null path carries real weight against the oracle.
    */
  def dqCompleteness(spark: SparkSession, sfDir: String): DataFrame =
    completenessOf(
      Tables.events(spark, sfDir).withColumn("user_id",
        when(pmod(col("user_id"), lit(7L)) === 0L, lit(null)).otherwise(col("user_id"))),
      Seq("event_id", "user_id", "event_type", "value"))

  def dqCompletenessSql: String = {
    def one(c: String): String =
      s"""(SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
         |  CAST((CAST(1000000 AS HUGEINT) * (count(*) - count($c))) // count(*) AS BIGINT) AS null_ppm,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct
         |FROM decoded)""".stripMargin
    "WITH decoded AS (SELECT event_id, " +
      "CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id END AS user_id, " +
      "event_type, value FROM events)\n" +
      Seq("event_id", "user_id", "event_type", "value").map(one)
        .mkString("", "\nUNION ALL ", "\nORDER BY col_name")
  }
}
