package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.{Cols, Tables}

/** Time-series analytics over irregular event/order streams: resampling
  * to a regular grid with forward-fill, sweep-line interval concurrency,
  * and cohort retention — the reporting family a warehouse layers on the
  * fact tables next to the star queries.
  *
  * Scale notes (100 TB):
  *  - gapfill generates the per-key date spine with `sequence` ON THE
  *    EXECUTORS (explode of a per-key array) — never a driver-side range
  *    join. Spine size is bounded by key-count × span-days, and the
  *    forward-fill window rides the same key partitioning as the
  *    spine join, so the whole op is two shuffles on the key.
  *  - concurrency reduces the raw interval rows to per-DAY deltas FIRST
  *    (map-side-combined groupBy on day — output cardinality = calendar
  *    days, thousands at most), then runs the running sum over that tiny
  *    aggregate. The single-partition window is over days, not rows, so
  *    it is a constant-size step at any corpus scale — the standard
  *    sweep-line shape that replaces the quadratic self-join
  *    ("how many intervals overlap day d" as a join is O(rows × days)).
  *  - cohort retention is three shuffles (member-month distinct, first
  *    month per member, cohort×offset count), each map-side combinable;
  *    output is |months|² regardless of member count.
  */
object TimeSeries {

  /** Resample (key, day, value) rows to a dense per-key daily grid over
    * each key's [min(day), max(day)] span, forward-filling missing days
    * with the last observed value. Output: key, day, observed value
    * (null on gap days), filled value, is_gap flag.
    */
  def gapfillOn(perDay: DataFrame, keyCol: String, dayCol: String,
      valueCol: String): DataFrame = {
    val spine = perDay.groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("mn"), max(col(dayCol)).as("mx"))
      .select(col(keyCol),
        explode(sequence(col("mn"), col("mx"), expr("interval 1 day"))).as(dayCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(perDay, Seq(keyCol, dayCol), "left")
      .select(col(keyCol), col(dayCol), col(valueCol),
        last(col(valueCol), ignoreNulls = true).over(w).as("filled"),
        col(valueCol).isNull.as("is_gap"))
  }

  /** ts_gapfill testdata binding: per-user daily spend for users 0-19,
    * resampled to a dense daily series with forward-fill.
    */
  def gapfill(spark: SparkSession, sfDir: String): DataFrame = {
    val perDay = Tables.events(spark, sfDir)
      .filter(col("user_id") < 20)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(Cols.pround(sum(col("value")), 2).as("day_spend"))
    gapfillOn(perDay, "user_id", "day", "day_spend")
      .transform(graft.util.Cols.verifySort(_, col("user_id"), col("day")))
  }

  def gapfillSql: String =
    """WITH pd AS (
      | SELECT user_id, CAST(ts AS DATE) AS day,
      |  floor(sum(value) * 100.0 + 0.5) / 100.0 AS day_spend
      | FROM events WHERE user_id < 20 GROUP BY 1, 2),
      |b AS (SELECT user_id, min(day) AS mn, max(day) AS mx FROM pd GROUP BY 1),
      |spine AS (
      | SELECT user_id, CAST(unnest(generate_series(CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
      | FROM b)
      |SELECT s.user_id, s.day, pd.day_spend,
      | last_value(pd.day_spend IGNORE NULLS) OVER (PARTITION BY s.user_id ORDER BY s.day ROWS UNBOUNDED PRECEDING) AS filled,
      | pd.day_spend IS NULL AS is_gap
      |FROM spine s LEFT JOIN pd ON s.user_id = pd.user_id AND s.day = pd.day
      |ORDER BY s.user_id, s.day""".stripMargin

  /** Linear-interpolation resampling — the other half of the resample
    * toolkit next to [[gapfillOn]]'s forward-fill: gap days get the
    * straight line between the surrounding observations instead of a
    * held value. All arithmetic is EXACT INTEGER: observed values enter
    * as integer cents, and a gap day d between observations (d0,v0) and
    * (d1,v1) interpolates as (v0·(d1−d) + v1·(d−d0)) div (d1−d0) —
    * weighted-average form whose operands are all non-negative, so
    * truncating and floor division agree and the result is identical on
    * any engine (a double lerp would be ulp-unstable in the oracle).
    * The spine spans each key's observed range, so every gap day has
    * both neighbors — no extrapolation case exists. Same scale shape as
    * gapfill: executor-side spine, and BOTH direction windows (previous
    * / next observation) ride the one key partitioning — still two
    * shuffles total.
    * Output: key, day, cents (observed), interp_cents, is_gap.
    */
  def interpLinearOn(perDay: DataFrame, keyCol: String, dayCol: String,
      centsCol: String): DataFrame = {
    val spine = perDay.groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("mn"), max(col(dayCol)).as("mx"))
      .select(col(keyCol),
        explode(sequence(col("mn"), col("mx"), expr("interval 1 day"))).as(dayCol))
    val back = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col(centsCol).isNotNull, col(dayCol))
    spine.join(perDay, Seq(keyCol, dayCol), "left")
      .select(col(keyCol), col(dayCol), col(centsCol),
        last(col(centsCol), ignoreNulls = true).over(back).as("v0"),
        last(obsDay, ignoreNulls = true).over(back).as("d0"),
        first(col(centsCol), ignoreNulls = true).over(fwd).as("v1"),
        first(obsDay, ignoreNulls = true).over(fwd).as("d1"))
      .withColumn("num",
        col("v0") * datediff(col("d1"), col(dayCol)) +
          col("v1") * datediff(col(dayCol), col("d0")))
      .withColumn("den", datediff(col("d1"), col("d0")))
      .select(col(keyCol), col(dayCol), col(centsCol),
        when(col(centsCol).isNotNull, col(centsCol))
          // strict gap: d0 < day < d1 → den > 0; num, den both ≥ 0 so
          // `div` (trunc) ≡ floor division, matching DuckDB's `//`
          .otherwise(expr("num div den"))
          .cast("long").as("interp_cents"),
        col(centsCol).isNull.as("is_gap"))
  }

  /** ts_interp_linear testdata binding: per-user daily spend (integer
    * cents) for users 0-19, linearly interpolated across gap days.
    */
  def interpLinear(spark: SparkSession, sfDir: String): DataFrame = {
    val perDay = Tables.events(spark, sfDir)
      .filter(col("user_id") < 20)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(floor(sum(col("value")) * 100.0 + 0.5).cast("long").as("cents"))
    interpLinearOn(perDay, "user_id", "day", "cents")
      .transform(graft.util.Cols.verifySort(_, col("user_id"), col("day")))
  }

  def interpLinearSql: String =
    """WITH pd AS (
      | SELECT user_id, CAST(ts AS DATE) AS day,
      |  CAST(floor(sum(value) * 100.0 + 0.5) AS BIGINT) AS cents
      | FROM events WHERE user_id < 20 GROUP BY 1, 2),
      |b AS (SELECT user_id, min(day) AS mn, max(day) AS mx FROM pd GROUP BY 1),
      |spine AS (
      | SELECT user_id, CAST(unnest(generate_series(CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
      | FROM b),
      |j AS (
      | SELECT s.user_id, s.day, pd.cents,
      |  last_value(pd.cents IGNORE NULLS) OVER wb AS v0,
      |  last_value(CASE WHEN pd.cents IS NOT NULL THEN s.day END IGNORE NULLS) OVER wb AS d0,
      |  first_value(pd.cents IGNORE NULLS) OVER wf AS v1,
      |  first_value(CASE WHEN pd.cents IS NOT NULL THEN s.day END IGNORE NULLS) OVER wf AS d1
      | FROM spine s LEFT JOIN pd ON s.user_id = pd.user_id AND s.day = pd.day
      | WINDOW
      |  wb AS (PARTITION BY s.user_id ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  wf AS (PARTITION BY s.user_id ORDER BY s.day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT user_id, day, cents,
      | CAST(CASE WHEN cents IS NOT NULL THEN cents
      |      ELSE (v0 * date_diff('day', day, d1) + v1 * date_diff('day', d0, day))
      |           // date_diff('day', d0, d1) END AS BIGINT) AS interp_cents,
      | cents IS NULL AS is_gap
      |FROM j ORDER BY user_id, day""".stripMargin

  /** Sweep-line interval concurrency: given (start_day, end_day)
    * intervals, the number of intervals open on each calendar day.
    * Raw intervals collapse to per-day +1/−1 deltas first (map-side
    * combined, day-cardinality output), then one running sum over the
    * day-level aggregate. Output: day, delta, n_open.
    */
  def concurrencyOn(intervals: DataFrame, startCol: String, endCol: String): DataFrame = {
    val deltas = intervals.select(col(startCol).as("day"), lit(1L).as("d"))
      .unionAll(intervals.select(date_add(col(endCol), 1).as("day"), lit(-1L).as("d")))
      .groupBy(col("day")).agg(sum(col("d")).as("delta"))
    // Day-cardinality input: the single-partition running-sum window is
    // over calendar days (bounded), not over interval rows.
    deltas.withColumn("n_open",
      sum(col("delta")).over(Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** ts_concurrency testdata binding: orders open from order date until
    * their last line shipment — concurrent open-order count per day.
    */
  def concurrency(spark: SparkSession, sfDir: String): DataFrame = {
    val spans = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey")).agg(max(to_date(col("l_shipdate"))).as("end_day"))
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select(to_date(col("o_orderdate")).as("start_day"), col("end_day"))
    concurrencyOn(spans, "start_day", "end_day")
      .filter(col("n_open") =!= 0 || col("delta") =!= 0)
      .orderBy(col("day"))
  }

  def concurrencySql: String =
    """WITH spans AS (
      | SELECT CAST(o_orderdate AS DATE) AS start_day, e.end_day
      | FROM orders JOIN (
      |   SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS end_day
      |   FROM lineitem GROUP BY 1) e ON o_orderkey = e.l_orderkey),
      |deltas AS (
      | SELECT day, CAST(sum(d) AS BIGINT) AS delta FROM (
      |   SELECT start_day AS day, 1 AS d FROM spans
      |   UNION ALL
      |   SELECT end_day + 1 AS day, -1 AS d FROM spans) u
      | GROUP BY 1),
      |r AS (
      | SELECT day, delta, CAST(sum(delta) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_open
      | FROM deltas)
      |SELECT day, delta, n_open FROM r WHERE n_open <> 0 OR delta <> 0 ORDER BY day""".stripMargin

  /** Cohort retention: members bucketed by first-activity month; for
    * each (cohort_month, month_offset), how many members were active
    * and what fraction of the cohort that is. Exact integer counts and
    * a portably-rounded ratio. Output: cohort_month, month_off,
    * n_active, cohort_size, retention.
    */
  def cohortRetentionOn(activity: DataFrame, memberCol: String, tsCol: String): DataFrame = {
    val monthOf = (c: org.apache.spark.sql.Column) =>
      year(c) * 12 + month(c) // absolute month index (differences only)
    val memberMonths = activity
      .select(col(memberCol).as("m"), to_date(date_trunc("month", col(tsCol))).as("am"))
      .distinct()
    val withCohort = memberMonths
      .withColumn("cm", min(col("am")).over(Window.partitionBy(col("m"))))
    val counts = withCohort
      .groupBy(col("cm").as("cohort_month"),
        (monthOf(col("am")) - monthOf(col("cm"))).cast("int").as("month_off"))
      .agg(count(lit(1)).as("n_active"))
    val wc = Window.partitionBy(col("cohort_month"))
    counts
      .withColumn("cohort_size",
        max(when(col("month_off") === 0, col("n_active"))).over(wc))
      .withColumn("retention",
        Cols.pround(col("n_active").cast("double") / col("cohort_size"), 4))
  }

  /** q49_cohort_retention testdata binding: customers cohorted by first
    * order month, retention = ordered again in month cohort+k.
    */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame =
    cohortRetentionOn(Tables.orders(spark, sfDir), "o_custkey", "o_orderdate")
      .orderBy(col("cohort_month"), col("month_off"))

  /** Gaps-and-islands: per key, maximal runs of CONSECUTIVE activity
    * days ("islands"). The classic trick: within a key, day_number −
    * row_number() is constant exactly along a consecutive run, so
    * islands fall out of one groupBy on that difference — no self-join,
    * no iteration. Output per key: active-day count, island count,
    * longest/mean streak.
    *
    * Scale: distinct (key, day) first — collapses the raw event volume
    * to at most key-count × span-days rows before any window. The
    * window, island groupBy, and per-key rollup all partition by key,
    * so AQE/exchange reuse keeps it to the one post-distinct shuffle
    * sequence; no stage sees more than the distinct-day row count.
    */
  def islandsOn(activity: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val days = activity
      .select(col(keyCol), to_date(col(tsCol)).as("day")).distinct()
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
    val islands = days
      .withColumn("grp", datediff(col("day"), lit("1970-01-01").cast("date"))
        - row_number().over(w))
      .groupBy(col(keyCol), col("grp"))
      .agg(count(lit(1)).as("len"))
    islands.groupBy(col(keyCol))
      .agg(sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_islands"),
        max(col("len")).cast("int").as("longest_streak"))
      .withColumn("mean_streak",
        Cols.pround(col("n_active_days").cast("double") / col("n_islands"), 4))
  }

  /** ts_islands testdata binding: per-user consecutive-activity-day
    * streak profile over the event stream.
    */
  def islands(spark: SparkSession, sfDir: String): DataFrame =
    islandsOn(Tables.events(spark, sfDir), "user_id", "ts")
      .transform(graft.util.Cols.verifySort(_, col("user_id")))

  def islandsSql: String =
    """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |grps AS (
      | SELECT user_id, day,
      |  date_diff('day', DATE '1970-01-01', day)
      |    - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
      | FROM days),
      |islands AS (SELECT user_id, grp, count(*) AS len FROM grps GROUP BY 1, 2)
      |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
      | count(*) AS n_islands, CAST(max(len) AS INTEGER) AS longest_streak,
      | floor(CAST(sum(len) AS DOUBLE) / count(*) * 10000.0 + 0.5) / 10000.0 AS mean_streak
      |FROM islands GROUP BY 1 ORDER BY user_id""".stripMargin

  /** OHLC downsampling: irregular (key, time, value) observations
    * resampled to per-(key, week) bars — open/close = value at the
    * first/last observation of the bar (total order: time, then id),
    * high/low = extremes, volume = observation count. One map-side-
    * combined groupBy: open/close ride min_by/max_by over a single
    * BIGINT ordering key (epoch-day · 10^10 + id — ids stay below
    * 10^10, so the composite preserves the (time, id) total order and
    * both engines compare it identically), never a sort. Values in
    * integer cents so the hashed output is float-free.
    */
  def ohlcOn(obs: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valueCol: String): DataFrame = {
    val cents = floor(col(valueCol) * 100.0 + 0.5).cast("long")
    val ord = (datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date")).cast("long")
      * lit(10000000000L)) + col(idCol)
    obs
      .select(col(keyCol), to_date(date_trunc("week", col(tsCol))).as("week"),
        cents.as("cents"), ord.as("ord"))
      .groupBy(col(keyCol), col("week"))
      .agg(min_by(col("cents"), col("ord")).as("open_cents"),
        max(col("cents")).as("high_cents"),
        min(col("cents")).as("low_cents"),
        max_by(col("cents"), col("ord")).as("close_cents"),
        count(lit(1)).as("volume"))
  }

  /** ts_ohlc testdata binding: weekly order-price bars per order
    * priority class.
    */
  def ohlc(spark: SparkSession, sfDir: String): DataFrame =
    ohlcOn(Tables.orders(spark, sfDir),
      "o_orderpriority", "o_orderdate", "o_orderkey", "o_totalprice")
      .orderBy(col("o_orderpriority"), col("week"))

  def ohlcSql: String =
    """WITH o AS (
      | SELECT o_orderpriority, CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
      |  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
      |  date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) * 10000000000
      |    + o_orderkey AS ord
      | FROM orders)
      |SELECT o_orderpriority, week,
      | arg_min(cents, ord) AS open_cents, max(cents) AS high_cents,
      | min(cents) AS low_cents, arg_max(cents, ord) AS close_cents,
      | count(*) AS volume
      |FROM o GROUP BY 1, 2 ORDER BY o_orderpriority, week""".stripMargin

  /** EWMA window width (lags 0..W−1) and the power-of-two weight of
    * lag k: 2^(W−1−k) — a truncated α=1/2 exponential decay whose
    * weights are exact integers, shared with the oracle.
    */
  val EwmaW = 8

  /** ts_ewma — truncated exponentially-weighted moving average per key:
    * each observation's smoothed value is the 2^k-weighted mean of the
    * trailing [[EwmaW]] observations (the standard recursive EWMA
    * truncated at 8 lags so the value is a FIXED finite expression
    * tree, not an order-sensitive running recursion — bit-identical
    * doubles on any IEEE engine, where true recursive EWMA cannot be
    * value-oracled). One key-partitioned window supplies all lags; at
    * 100 TB this is a single shuffle on the key and O(W) state per row
    * — no self-joins, no recursion.
    * Output: (idCol, keyCol, ewma).
    */
  def ewmaOn(obs: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val lags = (0 until EwmaW).map(k =>
      if (k == 0) col(valueCol) else lag(col(valueCol), k).over(w))
    val weights = (0 until EwmaW).map(k => 1L << (EwmaW - 1 - k))
    val num = lags.zip(weights)
      .map { case (c, wt) => coalesce(c, lit(0.0)) * lit(wt.toDouble) }
      .reduce(_ + _)
    val den = lags.zip(weights)
      .map { case (c, wt) => when(c.isNotNull, lit(wt)).otherwise(lit(0L)) }
      .reduce(_ + _)
    obs.select(col(idCol), col(keyCol), col(tsCol), col(valueCol))
      .withColumn("ewma", Cols.pround(num / den.cast("double"), 6))
      .select(col(idCol), col(keyCol), col("ewma"))
  }

  /** ts_ewma testdata binding: per-user smoothed event values. */
  def ewma(spark: SparkSession, sfDir: String): DataFrame =
    ewmaOn(Tables.events(spark, sfDir), "user_id", "ts", "event_id", "value")
      .transform(graft.util.Cols.verifySort(_, col("event_id")))

  def ewmaSql: String = {
    val num = (0 until EwmaW).map { k =>
      val wt = 1L << (EwmaW - 1 - k)
      val c = if (k == 0) "value" else s"lag(value, $k) OVER w"
      s"coalesce($c, 0.0) * $wt.0"
    }.mkString(" + ")
    val den = (0 until EwmaW).map { k =>
      val wt = 1L << (EwmaW - 1 - k)
      val c = if (k == 0) "value" else s"lag(value, $k) OVER w"
      s"CASE WHEN $c IS NOT NULL THEN $wt ELSE 0 END"
    }.mkString(" + ")
    s"""SELECT event_id, user_id,
       | ${Cols.proundSql(s"($num) / CAST($den AS DOUBLE)", 6)} AS ewma
       |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |ORDER BY event_id""".stripMargin
  }

  /** Weekly seasonal profile per series — the pre-forecasting
    * diagnostic that answers "does this series have a day-of-week
    * shape worth modeling" (the complement of [[trend]]'s direction
    * and [[autocorr]]'s momentum): per (key, ISO day-of-week), event
    * count, exact cents sum, and the seasonal index as integer ppm of
    * the series mean — 1 000 000 = flat, >1e6 = that weekday runs hot.
    *
    * Exactness: day-of-week derives from the epoch DAY ordinal
    * ((day + 3) mod 7 + 1 — epoch day 0 was a Thursday = ISO 4), pure
    * int64 both engines, no calendar/timezone functions whose
    * conventions differ; the index is one integer division of
    * DECIMAL(38,0) products ((s_d·n·10⁶) div (n_d·s), all positive at
    * this operator's precondition of non-negative values, where
    * truncating div and flooring // agree). Σcents·N·10⁶ stays under
    * 10³⁸ to ~10¹⁶ rows per key of ~$500 events.
    *
    * Scale shape: one key shuffle for the (key, dow) aggregate; the
    * series totals ride a ≤7-row window over the SAME partitioning —
    * no second shuffle, no join. Output bounded at 7·|keys| rows.
    */
  def seasonalityOn(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String): DataFrame = {
    val byDow = events
      .select(col(keyCol),
        (pmod(Cols.floorDiv(unix_micros(col(tsCol)), 86400000000L) + 3, lit(7)) + 1)
          .as("iso_dow"),
        floor(col(valCol) * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy(col(keyCol), col("iso_dow"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
    val wk = Window.partitionBy(col(keyCol))
    byDow
      .withColumn("n_total", sum(col("n_events")).over(wk))
      .withColumn("s_total", sum(col("sum_cents")).over(wk))
      .withColumn("seasonal_ppm",
        expr("(CAST(sum_cents AS DECIMAL(38,0)) * n_total * 1000000) " +
          "div (CAST(n_events AS DECIMAL(38,0)) * s_total)"))
      .select(col(keyCol), col("iso_dow"), col("n_events"), col("sum_cents"),
        col("seasonal_ppm"))
  }

  /** ts_seasonality testdata binding: per-event-type weekday profile. */
  def seasonality(spark: SparkSession, sfDir: String): DataFrame =
    seasonalityOn(Tables.events(spark, sfDir), "event_type", "ts", "value")
      .orderBy(col("event_type"), col("iso_dow"))

  def seasonalitySql: String =
    """WITH e AS (
      | SELECT event_type,
      |  ((((epoch_us(ts) // 86400000000 + 3) % 7) + 7) % 7) + 1 AS iso_dow,
      |  CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      | FROM events),
      |d AS (SELECT event_type, iso_dow, count(*) AS n_events,
      |       CAST(sum(cents) AS BIGINT) AS sum_cents
      |      FROM e GROUP BY 1, 2),
      |t AS (SELECT event_type, CAST(sum(n_events) AS BIGINT) AS n_total,
      |       CAST(sum(sum_cents) AS BIGINT) AS s_total
      |      FROM d GROUP BY 1)
      |SELECT d.event_type, iso_dow, n_events,
      | sum_cents,
      | CAST((CAST(sum_cents AS HUGEINT) * n_total * 1000000)
      |      // (CAST(n_events AS HUGEINT) * s_total) AS BIGINT) AS seasonal_ppm
      |FROM d JOIN t USING (event_type)
      |ORDER BY event_type, iso_dow""".stripMargin

  /** Merge overlapping intervals per key ("span coalescing"): maximal
    * unions of overlapping [start, end] ranges, the classic prerequisite
    * for utilization, coverage, and SLA math. One window pass computes
    * the running max of PRIOR interval ends; an interval whose start
    * exceeds it opens a new span, and the cumulative count of those
    * openings is the span id — no self-join, no iteration (the naive
    * "which intervals touch" formulation is a quadratic range self-join).
    * Both window frames and the span groupBy ride ONE key partitioning,
    * so the whole op is a single shuffle at any scale. Intervals are
    * inclusive; touching intervals (start = prior end) merge.
    * Output per span: key, span_start, span_end, n_intervals.
    */
  def mergeIntervalsOn(intervals: DataFrame, keyCol: String, startCol: String,
      endCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(startCol), col(idCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    intervals
      .withColumn("opens",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("span",
        sum(col("opens")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("span"))
      .agg(min(col(startCol)).as("span_start"), max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_intervals"))
      .drop("span")
  }

  /** ts_merge_intervals testdata binding: per-customer order-activity
    * spans — each order covers [order date, order date + 14 days];
    * overlapping orders coalesce into continuous engagement spans.
    */
  def mergeIntervals(spark: SparkSession, sfDir: String): DataFrame =
    mergeIntervalsOn(
      Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("start_day"),
          date_add(to_date(col("o_orderdate")), 14).as("end_day")),
      "o_custkey", "start_day", "end_day", "o_orderkey")
      .transform(graft.util.Cols.verifySort(_, col("o_custkey"), col("span_start")))

  def mergeIntervalsSql: String =
    """WITH iv AS (
      | SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS start_day,
      |  CAST(o_orderdate AS DATE) + 14 AS end_day
      | FROM orders),
      |m AS (
      | SELECT o_custkey, o_orderkey, start_day, end_day,
      |  CASE WHEN max(end_day) OVER w IS NULL OR start_day > max(end_day) OVER w
      |       THEN 1 ELSE 0 END AS opens
      | FROM iv
      | WINDOW w AS (PARTITION BY o_custkey ORDER BY start_day, o_orderkey
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |s AS (
      | SELECT o_custkey, start_day, end_day,
      |  sum(opens) OVER (PARTITION BY o_custkey ORDER BY start_day, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
      | FROM m)
      |SELECT o_custkey, min(start_day) AS span_start,
      | max(end_day) AS span_end, count(*) AS n_intervals
      |FROM s GROUP BY o_custkey, span
      |ORDER BY o_custkey, span_start""".stripMargin

  /** Cumulative-distinct curve (audience growth): per day, the active
    * user count, the count of FIRST-SEEN users, and the running total of
    * distinct users ever seen. The naive form — count(DISTINCT) over an
    * expanding window — re-scans the whole history per day and Spark
    * (correctly) refuses DISTINCT aggregates over windows; the scalable
    * identity is cum_distinct(d) = Σ_{d' ≤ d} |{users first seen d'}|:
    * one per-user min-day aggregate, one per-day count, and a running
    * sum over DAY-cardinality rows (bounded by the calendar, not the
    * data). Two map-side-combinable shuffles at any corpus size.
    */
  def cumDistinctOn(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val e = events.filter(col(keyCol).isNotNull)
      .select(to_date(col(tsCol)).as("day"), col(keyCol).as("k"))
    val active = e.distinct().groupBy(col("day")).agg(count(lit(1)).as("n_active"))
    val firstSeen = e.groupBy(col("k")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_new"))
    active.join(firstSeen, Seq("day"), "left")
      .select(col("day"), col("n_active"), coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("cum_distinct",
        sum(col("n_new")).over(Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** ts_cum_distinct testdata binding: daily audience growth over the
    * events stream.
    */
  def cumDistinct(spark: SparkSession, sfDir: String): DataFrame =
    cumDistinctOn(Tables.events(spark, sfDir), "user_id", "ts")
      .orderBy(col("day"))

  /** Oracle states the SEMANTICS directly — a correlated expanding
    * count(DISTINCT) — not the rewrite, so it independently checks the
    * first-seen identity.
    */
  def cumDistinctSql: String =
    """WITH e AS (
      | SELECT CAST(ts AS DATE) AS day, user_id FROM events WHERE user_id IS NOT NULL),
      |days AS (SELECT day, count(DISTINCT user_id) AS n_active FROM e GROUP BY 1)
      |SELECT d.day, d.n_active,
      | (SELECT count(*) FROM (SELECT user_id, min(day) AS fd FROM e GROUP BY 1) f
      |   WHERE f.fd = d.day) AS n_new,
      | (SELECT count(DISTINCT user_id) FROM e WHERE e.day <= d.day) AS cum_distinct
      |FROM days d ORDER BY day""".stripMargin

  /** Active-user curve — DAU and trailing-7-day WAU, EXACT: the product
    * metric every event stream reports, and the one a sliding
    * count(DISTINCT) window cannot express (Spark correctly refuses
    * DISTINCT window aggregates, and re-scanning 7 days per report day
    * re-reads the corpus 7×). The scalable identity: each distinct
    * (user, day) activity contributes that user to report days
    * d..d+6, so EXPLODE the bounded 7-day contribution range and
    * count distinct users per report day — deduplication across a
    * user's multiple active days inside one window happens in the
    * same distinct aggregate. Shape: one distinct over (user, day)
    * (bounded by user·calendar, not events), a 7× map-side explode of
    * those slim pairs, two distinct aggregates — every stage
    * map-side-combinable, no window over history. The distinct
    * (user, day) frame feeds both DAU and WAU, so it is persist-pinned
    * (twin-subtree contract). Report days without same-day activity
    * are omitted (they have no DAU row — the oracle agrees).
    * Day arithmetic is pure integer micros-div, identical on both
    * engines. Output: (day_ord, day, dau, wau).
    */
  def activeUsersOn(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    // floorDiv, not `div`: day bucketing must FLOOR so pre-1970
    // timestamps land on the right day (DuckDB's `//` floors; Spark's
    // `div` truncates toward zero — they diverge on negatives).
    // Cache contract on the persisted (u, d) frame: operators persist,
    // CALLERS release (unpersist/clearCache when done — Bench/Verify
    // clearCache between queries)
    val ud = events.filter(col(keyCol).isNotNull)
      .select(col(keyCol).as("u"),
        Cols.floorDiv(unix_micros(col(tsCol)), 86400000000L).as("d"))
      .distinct()
      .transform(graft.util.CacheScope.cached)
    val dau = ud.groupBy(col("d")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("u"), explode(sequence(col("d"), col("d") + 6)).as("rd"))
      .groupBy(col("rd")).agg(countDistinct(col("u")).as("wau"))
    dau.join(wau, col("d") === col("rd"))
      .select(col("d").as("day_ord"),
        expr("date_add('1970-01-01', cast(d as int))").as("day"),
        col("dau"), col("wau"))
  }

  /** ts_active_users testdata binding: DAU/WAU over the events stream. */
  def activeUsers(spark: SparkSession, sfDir: String): DataFrame =
    activeUsersOn(Tables.events(spark, sfDir), "user_id", "ts")
      .orderBy(col("day_ord"))

  /** Oracle states the semantics directly — per report day, distinct
    * users active in [d-6, d] — not the contribution-explode rewrite,
    * so it independently checks the identity.
    */
  def activeUsersSql: String =
    """WITH ud AS (
      | SELECT DISTINCT user_id AS u, epoch_us(ts) // 86400000000 AS d
      | FROM events WHERE user_id IS NOT NULL),
      |days AS (SELECT d, count(*) AS dau FROM ud GROUP BY 1)
      |SELECT days.d AS day_ord, DATE '1970-01-01' + CAST(days.d AS INTEGER) AS day,
      | dau,
      | (SELECT count(DISTINCT u) FROM ud w
      |   WHERE w.d BETWEEN days.d - 6 AND days.d) AS wau
      |FROM days ORDER BY day_ord""".stripMargin

  /** Rolling exact median (trailing 5 orders) of per-customer order
    * value, in integer cents — the robust smoother for spiky spend
    * series where the rolling MEAN (q7's running window) chases
    * outliers. Spark has no median window aggregate; over a SMALL fixed
    * frame the exact form is a sorted frame-array lookup (lower median
    * = element (n+1) div 2) — O(frame log frame) per row with frame a
    * constant 5, riding the one customer-key shuffle every other
    * per-key window shares. For wide frames this becomes the remedian /
    * two-heap territory — out of declarative range and documented as
    * such. Output: (custkey, orderkey, day, cents, n_window, med_cents).
    */
  def rollingMedianOn(obs: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String, frame: Int = 5): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(frame - 1), Window.currentRow)
    obs
      .withColumn("cents", floor(col(valCol) * 100.0 + 0.5).cast("long"))
      .withColumn("arr", sort_array(collect_list(col("cents")).over(w)))
      .select(col(keyCol), col(idCol), col(tsCol),
        col("cents"), size(col("arr")).cast("long").as("n_window"),
        expr("element_at(arr, cast((size(arr) + 1) div 2 as int))").as("med_cents"))
  }

  /** ts_rolling_median testdata binding: per-customer trailing-5-order
    * median price.
    */
  def rollingMedian(spark: SparkSession, sfDir: String): DataFrame =
    rollingMedianOn(
      Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("day"), col("o_totalprice")),
      "o_custkey", "day", "o_orderkey", "o_totalprice")
      .transform(graft.util.Cols.verifySort(_, col("o_custkey"), col("day"), col("o_orderkey")))

  def rollingMedianSql: String =
    """WITH o AS (
      | SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS day,
      |  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      | FROM orders),
      |f AS (
      | SELECT o_custkey, o_orderkey, day, cents,
      |  list(cents) OVER (PARTITION BY o_custkey ORDER BY day, o_orderkey
      |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS arr
      | FROM o)
      |SELECT o_custkey, o_orderkey, day, cents,
      | CAST(len(arr) AS BIGINT) AS n_window,
      | list_sort(arr)[(len(arr) + 1) // 2] AS med_cents
      |FROM f ORDER BY o_custkey, day, o_orderkey""".stripMargin

  case class MedRow(k: Long, id: Long, d: java.sql.Date, cents: Long,
    n_window: Long, med_cents: Long)

  /** Exact two-heap sliding median with lazy deletion — the classic
    * streaming structure: lower half in a max-heap, upper half in a
    * min-heap, evicted values deferred in a count map until they
    * surface at a heap top. O(log frame) per row vs the sorted-frame
    * window's O(frame·log frame); both produce the LOWER median
    * ((n+1) div 2-th smallest). One instance per key, state bounded by
    * 2·frame entries.
    */
  private final class TwoHeapMedian(frame: Int) {
    private val lo = collection.mutable.PriorityQueue.empty[Long] // max-heap
    private val hi = collection.mutable.PriorityQueue.empty[Long](Ordering[Long].reverse)
    private val delayed = collection.mutable.HashMap.empty[Long, Int]
    private val window = collection.mutable.ArrayDeque.empty[Long]
    private var loN = 0 // live (non-deleted) counts per half
    private var hiN = 0
    private def pruneLo(): Unit =
      while (lo.nonEmpty && delayed.getOrElse(lo.head, 0) > 0) {
        val v = lo.dequeue()
        if (delayed(v) == 1) delayed.remove(v) else delayed(v) -= 1
      }
    private def pruneHi(): Unit =
      while (hi.nonEmpty && delayed.getOrElse(hi.head, 0) > 0) {
        val v = hi.dequeue()
        if (delayed(v) == 1) delayed.remove(v) else delayed(v) -= 1
      }
    private def rebalance(): Unit = {
      if (loN > hiN + 1) { pruneLo(); hi.enqueue(lo.dequeue()); loN -= 1; hiN += 1 }
      else if (loN < hiN) { pruneHi(); lo.enqueue(hi.dequeue()); hiN -= 1; loN += 1 }
      pruneLo()
    }
    /** Push one value; returns (window size, lower median). */
    def push(x: Long): (Long, Long) = {
      pruneLo()
      if (loN == 0 || x <= lo.head) { lo.enqueue(x); loN += 1 }
      else { hi.enqueue(x); hiN += 1 }
      window.append(x)
      if (window.length > frame) {
        val out = window.removeHead()
        // classify against the LIVE boundary BEFORE marking the value
        // deleted — pruning first can pop `out` itself off lo and shift
        // the boundary below it, debiting the wrong half
        if (lo.nonEmpty && out <= lo.head) loN -= 1 else hiN -= 1
        delayed(out) = delayed.getOrElse(out, 0) + 1
        pruneLo()
      }
      rebalance()
      ((loN + hiN).toLong, lo.head)
    }
  }

  /** Wide-frame exact rolling median: the two-heap form of
    * [[rollingMedianOn]], for frames where the sorted-frame window's
    * per-row O(frame·log frame) sort stops being noise. Same window
    * semantics and output, different machinery: repartition by key,
    * sort within partitions by (key, ts, id), and run the streaming
    * structure per key in one mapPartitions pass — the declarative
    * window expresses no per-row incremental state, so this is the
    * documented (d)-tier escape hatch, used only where measurement
    * says it wins. Measured (1M rows × 200 keys, local[32], noop
    * sink): frame 5 sorted 0.72 s / two-heap 1.20 s; frame 64 sorted
    * 1.05 s / two-heap 0.93 s; frame 256 sorted 2.22 s / two-heap
    * 0.71 s. The crossover sits at frame ≈ 64: below it the sorted
    * window wins (rides the shared key shuffle, codegen, no object
    * boundary), above it the per-row frame-sized array (frame × 8
    * bytes per OUTPUT row, sorted per row) dominates while the
    * two-heap stays flat — its state is per KEY and its per-row cost
    * O(log frame). At sf0.1's orders table (150k rows) both forms are
    * overhead-bound (~0.3 s) — the gap is invisible until row counts
    * × frame width actually stress the executor, which is the point
    * of measuring before reaching for the imperative tier.
    * Output: (keyCol, idCol, tsCol, cents, n_window, med_cents).
    */
  def rollingMedianWideOn(obs: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String, frame: Int = 64): DataFrame = {
    import obs.sparkSession.implicits._
    val in = obs.select(col(keyCol).cast("long"), col(idCol).cast("long"),
        col(tsCol).cast("date"),
        floor(col(valCol) * 100.0 + 0.5).cast("long"))
      .as[(Long, Long, java.sql.Date, Long)]
    in.repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(tsCol), col(idCol))
      .mapPartitions { rows =>
        var curKey = 0L
        var state: TwoHeapMedian = null
        rows.map { case (k, id, d, cents) =>
          if (state == null || k != curKey) { curKey = k; state = new TwoHeapMedian(frame) }
          val (n, med) = state.push(cents)
          MedRow(k, id, d, cents, n, med)
        }
      }
      .toDF()
      .select(col("k").as(keyCol), col("id").as(idCol), col("d").as(tsCol),
        col("cents"), col("n_window"), col("med_cents"))
  }

  /** ts_rolling_median_wide testdata binding: trailing-64-order median —
    * the frame width where the two-heap form beats the sorted window.
    */
  def rollingMedianWide(spark: SparkSession, sfDir: String): DataFrame =
    rollingMedianWideOn(
      Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("day"), col("o_totalprice")),
      "o_custkey", "day", "o_orderkey", "o_totalprice")
      .transform(graft.util.Cols.verifySort(_, col("o_custkey"), col("day"), col("o_orderkey")))

  def rollingMedianWideSql: String =
    """WITH o AS (
      | SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS day,
      |  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      | FROM orders),
      |f AS (
      | SELECT o_custkey, o_orderkey, day, cents,
      |  list(cents) OVER (PARTITION BY o_custkey ORDER BY day, o_orderkey
      |    ROWS BETWEEN 63 PRECEDING AND CURRENT ROW) AS arr
      | FROM o)
      |SELECT o_custkey, o_orderkey, day, cents,
      | CAST(len(arr) AS BIGINT) AS n_window,
      | list_sort(arr)[(len(arr) + 1) // 2] AS med_cents
      |FROM f ORDER BY o_custkey, day, o_orderkey""".stripMargin

  /** Per-group OLS trend — the "is this customer's spend rising or
    * falling" slope every account dashboard wants, computed EXACTLY:
    * x = day ordinal (days since epoch, integer), y = integer cents,
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) emitted as the raw
    * int64 numerator/denominator pair plus the rounded double ratio.
    * All five moments (n, Σx, Σy, Σxy, Σx²) are plain sums — ONE
    * map-side-combinable aggregate per key, no window, no sort; the
    * shape holds at any scale because the state per key is five longs.
    * Magnitudes stay inside int64: day ordinals ~10⁴, cents ≤ ~10⁸,
    * n per key bounded by a customer's order count, so n·Σxy ≲ 10¹⁵.
    * Groups with a degenerate x spread (one order, or all orders the
    * same day) emit NULL slope — a fit over one x value is not a
    * trend. Output: (key, n_orders, slope_num, slope_den, slope_cpd).
    */
  def trendOn(obs: DataFrame, keyCol: String, tsCol: String,
      valCol: String): DataFrame = {
    val x = datediff(col(tsCol), lit("1970-01-01")).cast("long")
    val y = floor(col(valCol) * 100.0 + 0.5).cast("long")
    obs
      .select(col(keyCol), x.as("x"), y.as("y"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col(keyCol), col("n").as("n_orders"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
      .withColumn("slope_cpd", when(col("slope_den") === 0, lit(null).cast("double"))
        .otherwise(Cols.pround(col("slope_num").cast("double") / col("slope_den").cast("double"), 6)))
  }

  /** ts_trend testdata binding: per-customer order-value trend in
    * cents/day.
    */
  def trend(spark: SparkSession, sfDir: String): DataFrame =
    trendOn(
      Tables.orders(spark, sfDir)
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("day"), col("o_totalprice")),
      "o_custkey", "day", "o_totalprice")
      .transform(graft.util.Cols.verifySort(_, col("o_custkey")))

  def trendSql: String =
    """WITH o AS (
      | SELECT o_custkey,
      |  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
      |  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS y
      | FROM orders),
      |m AS (
      | SELECT o_custkey, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
      |  CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
      |  CAST(sum(x * x) AS BIGINT) AS sxx
      | FROM o GROUP BY 1)
      |SELECT o_custkey, n AS n_orders,
      | n * sxy - sx * sy AS slope_num,
      | n * sxx - sx * sx AS slope_den,
      | CASE WHEN n * sxx - sx * sx = 0 THEN NULL
      |      ELSE floor(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000 + 0.5) / 1000000
      | END AS slope_cpd
      |FROM m ORDER BY o_custkey""".stripMargin

  /** Per-series change-point detection via the exact integer CUSUM:
    * the point where a series' running behavior most departs from its
    * overall mean — "when did this customer's spend change". The
    * mean-centered cumulative sum Σ_{i≤t}(y_i − S/n) is kept EXACT by
    * scaling through n: C_t = n·ps_t − t·S (all int64 — ps ≲ 10⁹ per
    * key, n ≲ 10², so n·ps ≲ 10¹¹), and the change point is the t
    * maximizing |C_t| (earliest wins ties). One key shuffle: ranking,
    * running sum and per-key totals all ride the same partitioning,
    * and the argmax is a map-side-combinable struct max, not a second
    * sort. Output: (key, n_obs, cp_idx, cp_day, cusum).
    */
  def changepointOn(obs: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val run = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col(keyCol))
    obs
      .select(col(keyCol), col(idCol), col(tsCol),
        floor(col(valCol) * 100.0 + 0.5).cast("long").as("y"))
      .withColumn("t", row_number().over(byKey).cast("long"))
      .withColumn("ps", sum(col("y")).over(run))
      .withColumn("s", sum(col("y")).over(all))
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("cu", col("n") * col("ps") - col("t") * col("s"))
      .groupBy(col(keyCol))
      .agg(max(struct(abs(col("cu")).as("acu"), (-col("t")).as("nt"),
        col("cu").as("cv"), col(tsCol).as("dv"), col("n").as("nv"))).as("m"))
      .select(col(keyCol), col("m.nv").as("n_obs"), (-col("m.nt")).as("cp_idx"),
        col("m.dv").as("cp_day"), col("m.cv").as("cusum"))
  }

  /** ts_changepoint testdata binding: per-customer spend change point.
    */
  def changepoint(spark: SparkSession, sfDir: String): DataFrame =
    changepointOn(
      Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("day"), col("o_totalprice")),
      "o_custkey", "day", "o_orderkey", "o_totalprice")
      .transform(graft.util.Cols.verifySort(_, col("o_custkey")))

  def changepointSql: String =
    """WITH o AS (
      | SELECT o_custkey AS k, o_orderkey AS id, CAST(o_orderdate AS DATE) AS d,
      |  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS y
      | FROM orders),
      |w AS (
      | SELECT k, d, CAST(row_number() OVER pk AS BIGINT) AS t,
      |  CAST(sum(y) OVER (PARTITION BY k ORDER BY d, id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ps,
      |  CAST(sum(y) OVER (PARTITION BY k) AS BIGINT) AS s,
      |  CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n
      | FROM o WINDOW pk AS (PARTITION BY k ORDER BY d, id)),
      |c AS (SELECT k, d, t, n, n * ps - t * s AS cu FROM w),
      |r AS (SELECT k, d, t, n, cu,
      |      row_number() OVER (PARTITION BY k ORDER BY abs(cu) DESC, t) AS rk FROM c)
      |SELECT k AS o_custkey, n AS n_obs, t AS cp_idx, d AS cp_day, cu AS cusum
      |FROM r WHERE rk = 1 ORDER BY o_custkey""".stripMargin

  /** Per-series Theil–Sen slope — the ROBUST trend estimator (median
    * of all pairwise slopes, up to 29% outlier breakdown) next to
    * [[trendOn]]'s OLS, which one wild order drags arbitrarily far.
    * Exact end to end: each pair's slope is the rational (Δcents,
    * Δdays) with Δdays > 0 — same-day pairs are excluded (undefined
    * slope), so keys need two DISTINCT days to appear; the lower
    * median is selected by rank over (slope-as-double, Δy, Δx) —
    * the double is only a SORT key (identical int64→double conversion
    * and division on both engines), and rank ties can only occur
    * between pairs with identical (Δy, Δx), which emit identical
    * output. Scale shape: the per-key pair self-join is C(n,2) with n
    * a customer's ORDER COUNT (bounded small, ~10²), not corpus size
    * — the same per-key-bounded-frame class as the sorted rolling
    * median; both sides of the join ride one key shuffle. Output:
    * (key, n_pairs, med_num, med_den, slope_cpd).
    */
  def theilSenOn(obs: DataFrame, keyCol: String, tsCol: String,
      valCol: String): DataFrame = {
    val o = obs.select(col(keyCol).as("k"),
      datediff(col(tsCol), lit("1970-01-01")).cast("long").as("x"),
      floor(col(valCol) * 100.0 + 0.5).cast("long").as("y"))
    val a = o.select(col("k"), col("x").as("ax"), col("y").as("ay"))
    val b = o.select(col("k"), col("x").as("bx"), col("y").as("by"))
    val pairs = a.join(b, Seq("k")).filter(col("ax") < col("bx"))
      .select(col("k"), (col("by") - col("ay")).as("num"),
        (col("bx") - col("ax")).as("den"))
      .withColumn("sd", col("num").cast("double") / col("den").cast("double"))
    val w = Window.partitionBy(col("k")).orderBy(col("sd"), col("num"), col("den"))
    val n = Window.partitionBy(col("k"))
    pairs
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("m", count(lit(1)).over(n))
      .filter(col("rk") === expr("(m + 1) div 2"))
      .select(col("k").as(keyCol), col("m").as("n_pairs"),
        col("num").as("med_num"), col("den").as("med_den"),
        Cols.pround(col("sd"), 6).as("slope_cpd"))
  }

  /** ts_theil_sen testdata binding: robust per-customer order-value
    * trend in cents/day.
    */
  def theilSen(spark: SparkSession, sfDir: String): DataFrame =
    theilSenOn(
      Tables.orders(spark, sfDir)
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("day"), col("o_totalprice")),
      "o_custkey", "day", "o_totalprice")
      .transform(graft.util.Cols.verifySort(_, col("o_custkey")))

  def theilSenSql: String =
    """WITH o AS (
      | SELECT o_custkey AS k,
      |  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
      |  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS y
      | FROM orders),
      |p AS (
      | SELECT a.k, b.y - a.y AS num, b.x - a.x AS den,
      |  CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS sd
      | FROM o a JOIN o b ON a.k = b.k AND a.x < b.x),
      |r AS (
      | SELECT k, num, den, sd,
      |  CAST(row_number() OVER (PARTITION BY k ORDER BY sd, num, den) AS BIGINT) AS rk,
      |  CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS m
      | FROM p)
      |SELECT k AS o_custkey, m AS n_pairs, num AS med_num, den AS med_den,
      | floor(sd * 1000000 + 0.5) / 1000000 AS slope_cpd
      |FROM r WHERE rk = (m + 1) // 2 ORDER BY o_custkey""".stripMargin

  /** Per-series lag-1 autocorrelation — "is this customer's spending
    * momentum-driven or mean-reverting", the diagnostic read before
    * trusting any forecasting model on the series. Pearson r over the
    * consecutive pairs (y_{t-1}, y_t), kept EXACT to the last step:
    * all six moments (m pairs, Σa, Σb, Σab, Σa², Σb²) are int64 sums
    * of integer cents; the moment PRODUCTS (m·Σab, Σa·Σb, …) are
    * computed in DECIMAL(38,0) — with y ≤ 5·10⁷ cents and m ≤ 10²
    * pairs they reach ~2.5·10¹⁹, past int64, and ANSI mode would
    * throw — then the differences cast back to int64 (they are
    * m²·cov-scale, far below the products; the documented per-key
    * precondition is m·max|y| ≲ 3·10⁹, at which the DIFFERENCES still
    * fit — beyond that the cast throws rather than wrapping).
    * Only the final r = num / √(dena·denb) goes through IEEE double
    * (the denominator product would overflow int64; int64→double
    * conversion plus sqrt are bit-identical across engines). One lag
    * window and one aggregate ride the same key shuffle; state per
    * key is six longs, so the shape holds at any scale. Keys with
    * fewer than two observations vanish (no pair, no
    * autocorrelation); degenerate spreads (constant series) emit NULL.
    * Output: (key, n_pairs, ac1_num, ac1_dena, ac1_denb, ac1).
    */
  def autocorrOn(obs: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    obs
      .select(col(keyCol), col(idCol), col(tsCol),
        floor(col(valCol) * 100.0 + 0.5).cast("long").as("y"))
      .withColumn("py", lag(col("y"), 1).over(byKey))
      .filter(col("py").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("m"),
        sum(col("py")).as("sa"), sum(col("y")).as("sb"),
        sum(col("py") * col("y")).as("sab"),
        sum(col("py") * col("py")).as("saa"),
        sum(col("y") * col("y")).as("sbb"))
      .select(col(keyCol), col("m").as("n_pairs"),
        (col("m").cast("decimal(38,0)") * col("sab") -
          col("sa").cast("decimal(38,0)") * col("sb")).cast("long").as("ac1_num"),
        (col("m").cast("decimal(38,0)") * col("saa") -
          col("sa").cast("decimal(38,0)") * col("sa")).cast("long").as("ac1_dena"),
        (col("m").cast("decimal(38,0)") * col("sbb") -
          col("sb").cast("decimal(38,0)") * col("sb")).cast("long").as("ac1_denb"))
      .withColumn("ac1",
        when(col("ac1_dena") > 0 && col("ac1_denb") > 0,
          Cols.pround(col("ac1_num").cast("double") /
            sqrt(col("ac1_dena").cast("double") * col("ac1_denb").cast("double")), 6)))
  }

  /** Lag depth for [[acfOn]] — lags 1..4 cover the short-cycle
    * periodicities a weekly/monthly business series shows at daily
    * grain without blowing up the per-key state (6 longs per lag).
    */
  val AcfLags = 4

  /** ts_acf — the multi-lag autocorrelation PROFILE: [[autocorrOn]]'s
    * exact Pearson machinery at every lag 1..[[AcfLags]] — the
    * periodicity fingerprint (a strong lag-k with weak lag-1 is a
    * cycle, all-strong is a trend, all-weak is noise; this is the
    * pre-forecasting triage next to [[seasonalityOn]]'s weekday
    * shape). Same exactness contract as the lag-1 form: integer cents,
    * exact int64 moments per (key, lag) with DECIMAL(38,0) difference
    * guards, one IEEE division + sqrt at the end, NULL on degenerate
    * spreads.
    *
    * Shape: the lag columns all ride ONE key-ordered window (no extra
    * shuffle per lag), stack scan-side via an explode of (lag, py)
    * structs, and aggregate on (key, lag) — the same single key
    * shuffle as lag-1, ≤[[AcfLags]]·|keys| output rows.
    * Output: (key, lag, n_pairs, ac_num, ac_dena, ac_denb, ac).
    */
  def acfOn(obs: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String, lags: Int = AcfLags): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    var base = obs.select(col(keyCol), col(idCol), col(tsCol),
      floor(col(valCol) * 100.0 + 0.5).cast("long").as("y"))
    (1 to lags).foreach { l =>
      base = base.withColumn(s"py$l", lag(col("y"), l).over(byKey))
    }
    base
      .withColumn("lp", explode(array((1 to lags).map(l =>
        struct(lit(l).as("lag"), col(s"py$l").as("py"))): _*)))
      .filter(col("lp.py").isNotNull)
      .select(col(keyCol), col("lp.lag").as("lag"), col("lp.py").as("py"), col("y"))
      .groupBy(col(keyCol), col("lag"))
      .agg(count(lit(1)).as("m"),
        sum(col("py")).as("sa"), sum(col("y")).as("sb"),
        sum(col("py") * col("y")).as("sab"),
        sum(col("py") * col("py")).as("saa"),
        sum(col("y") * col("y")).as("sbb"))
      .select(col(keyCol), col("lag"), col("m").as("n_pairs"),
        (col("m").cast("decimal(38,0)") * col("sab") -
          col("sa").cast("decimal(38,0)") * col("sb")).cast("long").as("ac_num"),
        (col("m").cast("decimal(38,0)") * col("saa") -
          col("sa").cast("decimal(38,0)") * col("sa")).cast("long").as("ac_dena"),
        (col("m").cast("decimal(38,0)") * col("sbb") -
          col("sb").cast("decimal(38,0)") * col("sb")).cast("long").as("ac_denb"))
      .withColumn("ac",
        when(col("ac_dena") > 0 && col("ac_denb") > 0,
          Cols.pround(col("ac_num").cast("double") /
            sqrt(col("ac_dena").cast("double") * col("ac_denb").cast("double")), 6)))
  }

  /** ts_acf testdata binding: per-customer order-value ACF at lags
    * 1..4 in time order.
    */
  def acf(spark: SparkSession, sfDir: String): DataFrame =
    acfOn(
      Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("day"), col("o_totalprice")),
      "o_custkey", "day", "o_orderkey", "o_totalprice")
      .transform(graft.util.Cols.verifySort(_, col("o_custkey"), col("lag")))

  def acfSql: String = {
    val lagCols = (1 to AcfLags).map(l =>
      s"lag(y, $l) OVER (PARTITION BY k ORDER BY d, id) AS p$l").mkString(", ")
    val stack = (1 to AcfLags).map(l =>
      s"SELECT k, $l AS lag, p$l AS py, y FROM w WHERE p$l IS NOT NULL")
      .mkString(" UNION ALL ")
    s"""WITH o AS (
       | SELECT o_custkey AS k, o_orderkey AS id, CAST(o_orderdate AS DATE) AS d,
       |  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS y
       | FROM orders),
       |w AS (SELECT k, y, $lagCols FROM o),
       |st AS ($stack),
       |m AS (
       | SELECT k, lag, CAST(count(*) AS BIGINT) AS m, CAST(sum(py) AS BIGINT) AS sa,
       |  CAST(sum(y) AS BIGINT) AS sb, CAST(sum(py * y) AS BIGINT) AS sab,
       |  CAST(sum(py * py) AS BIGINT) AS saa, CAST(sum(y * y) AS BIGINT) AS sbb
       | FROM st GROUP BY 1, 2)
       |SELECT k AS o_custkey, CAST(lag AS INTEGER) AS lag, m AS n_pairs,
       | m * sab - sa * sb AS ac_num,
       | m * saa - sa * sa AS ac_dena,
       | m * sbb - sb * sb AS ac_denb,
       | CASE WHEN m * saa - sa * sa > 0 AND m * sbb - sb * sb > 0
       |  THEN floor(CAST(m * sab - sa * sb AS DOUBLE)
       |    / sqrt(CAST(m * saa - sa * sa AS DOUBLE) * CAST(m * sbb - sb * sb AS DOUBLE))
       |    * 1000000 + 0.5) / 1000000
       |  ELSE NULL END AS ac
       |FROM m ORDER BY o_custkey, lag""".stripMargin
  }

  /** ts_autocorr testdata binding: per-customer order-value lag-1
    * autocorrelation in time order.
    */
  def autocorr(spark: SparkSession, sfDir: String): DataFrame =
    autocorrOn(
      Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("day"), col("o_totalprice")),
      "o_custkey", "day", "o_orderkey", "o_totalprice")
      .transform(graft.util.Cols.verifySort(_, col("o_custkey")))

  def autocorrSql: String =
    """WITH o AS (
      | SELECT o_custkey AS k, o_orderkey AS id, CAST(o_orderdate AS DATE) AS d,
      |  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS y
      | FROM orders),
      |w AS (SELECT k, y, lag(y) OVER (PARTITION BY k ORDER BY d, id) AS py FROM o),
      |p AS (SELECT k, py, y FROM w WHERE py IS NOT NULL),
      |m AS (
      | SELECT k, CAST(count(*) AS BIGINT) AS m, CAST(sum(py) AS BIGINT) AS sa,
      |  CAST(sum(y) AS BIGINT) AS sb, CAST(sum(py * y) AS BIGINT) AS sab,
      |  CAST(sum(py * py) AS BIGINT) AS saa, CAST(sum(y * y) AS BIGINT) AS sbb
      | FROM p GROUP BY 1)
      |SELECT k AS o_custkey, m AS n_pairs,
      | m * sab - sa * sb AS ac1_num,
      | m * saa - sa * sa AS ac1_dena,
      | m * sbb - sb * sb AS ac1_denb,
      | CASE WHEN m * saa - sa * sa > 0 AND m * sbb - sb * sb > 0
      |  THEN floor(CAST(m * sab - sa * sb AS DOUBLE)
      |    / sqrt(CAST(m * saa - sa * sa AS DOUBLE) * CAST(m * sbb - sb * sb AS DOUBLE))
      |    * 1000000 + 0.5) / 1000000
      |  ELSE NULL END AS ac1
      |FROM m ORDER BY o_custkey""".stripMargin

  /** Entry-path mining (sequence analytics lite): each user's FIRST
    * three event types in time order form their entry path; the report
    * counts users per path — "how do people start" for onboarding and
    * funnel design, the complement of q45's one-step Markov matrix
    * (which forgets position). Output cardinality is bounded by
    * |event types|³ regardless of users. One user-key shuffle shared
    * by the ranking window and the path assembly; deterministic
    * ordering via (ts, event_id) ties and an in-array sort.
    * Output: (path, n_users).
    */
  def entryPathsOn(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, typeCol: String, depth: Int = 3): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    events.filter(col(keyCol).isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= depth)
      .groupBy(col(keyCol))
      .agg(concat_ws(">",
        transform(array_sort(collect_list(struct(col("rn"), col(typeCol).as("t")))),
          p => p.getField("t"))).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
  }

  /** q58_entry_paths testdata binding: first-3-event-type paths over
    * the events stream.
    */
  def entryPaths(spark: SparkSession, sfDir: String): DataFrame =
    entryPathsOn(Tables.events(spark, sfDir), "user_id", "ts", "event_id", "event_type")
      .orderBy(col("n_users").desc, col("path"))

  def entryPathsSql: String =
    """WITH e AS (
      | SELECT user_id, event_type,
      |  row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
      | FROM events WHERE user_id IS NOT NULL),
      |p AS (
      | SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      | FROM e WHERE rn <= 3 GROUP BY 1)
      |SELECT path, count(*) AS n_users FROM p GROUP BY 1
      |ORDER BY n_users DESC, path""".stripMargin

  /** Event-time disorder profile — the report that SIZES watermarks:
    * for each user stream (arrival order ≈ event_id), an event is late
    * by (max event time seen so far − its own event time); per day the
    * profile reports how many events are out of order, how many are
    * late beyond one minute, and the worst disorder. Pick the
    * streaming watermark delay / dropDuplicatesWithinWatermark window
    * from these numbers instead of folklore. Per-user running max +
    * day rollup ride one user-key shuffle then a day-cardinality agg.
    * Output: (day, n_events, n_out_of_order, n_late_1m, max_disorder_sec).
    */
  def outOfOrderOn(events: DataFrame, keyCol: String, tsCol: String,
      arrivalCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(arrivalCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("us", unix_micros(col(tsCol)))
      .withColumn("late_us", // first event per key: empty frame → 0 late
        greatest(lit(0L), coalesce(max(col("us")).over(w), col("us")) - col("us")))
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_us") > 0L, 1L).otherwise(0L)).as("n_out_of_order"),
        sum(when(col("late_us") > 60000000L, 1L).otherwise(0L)).as("n_late_1m"),
        coalesce(max(expr("late_us div 1000000")), lit(0L)).as("max_disorder_sec"))
  }

  /** ts_out_of_order testdata binding: per-user disorder over the
    * events stream, daily profile.
    */
  def outOfOrder(spark: SparkSession, sfDir: String): DataFrame =
    outOfOrderOn(Tables.events(spark, sfDir), "user_id", "ts", "event_id")
      .orderBy(col("day"))

  def outOfOrderSql: String =
    """WITH e AS (
      | SELECT CAST(ts AS DATE) AS day, epoch_us(ts) AS us, user_id, event_id
      | FROM events),
      |l AS (
      | SELECT day,
      |  greatest(0, coalesce(max(us) OVER (PARTITION BY user_id ORDER BY event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), us) - us) AS late_us
      | FROM e)
      |SELECT day, count(*) AS n_events,
      | CAST(coalesce(sum(CASE WHEN late_us > 0 THEN 1 END), 0) AS BIGINT) AS n_out_of_order,
      | CAST(coalesce(sum(CASE WHEN late_us > 60000000 THEN 1 END), 0) AS BIGINT) AS n_late_1m,
      | CAST(coalesce(max(late_us // 1000000), 0) AS BIGINT) AS max_disorder_sec
      |FROM l GROUP BY 1 ORDER BY day""".stripMargin

  /** Watermark grid (seconds): [[watermarkRecommendOn]] rounds its p99
    * recommendation UP to this granularity, floored at one grid step —
    * an operator deploys "30 s", not "23 s".
    */
  val WatermarkGridSec = 10L

  /** stream_watermark_size — the AUTO-SIZING step between the disorder
    * profile ([[outOfOrderOn]]) and a deployed watermark
    * (`withWatermark` / [[graft.streaming.EventStreams.latenessAudit]]):
    * per-event disorder (max-seen event time − own event time, per
    * key, arrival order), quantized to seconds, then EXACT p50/p95/p99
    * via the counts-and-cumulative-rank device — the smallest disorder
    * d with rank(d) ≥ ⌈q·n⌉ — and a deployable recommendation:
    * p99 rounded up to the [[WatermarkGridSec]] grid. A watermark of
    * that size keeps ≥99% of events inside the window (the producer's
    * tail beyond p99 is the documented loss budget); sizing from the
    * MAX instead holds state hostage to one pathological producer,
    * which is why p99 is the production rule of thumb.
    *
    * Shape at scale: one key shuffle for the running max (shared with
    * outOfOrderOn's profile), one map-side-combinable count keyed by
    * DISORDER SECOND — cardinality bounded by the worst disorder in
    * seconds, not the corpus — and a cumulative window over that tiny
    * set (bounded global window, the sanctioned bucket-prefix-sum
    * class). All-integer → fully value-oracled.
    * Output (single row): (n_events, p50_sec, p95_sec, p99_sec,
    * max_sec, recommended_watermark_sec).
    */
  def watermarkRecommendOn(events: DataFrame, keyCol: String, tsCol: String,
      arrivalCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(arrivalCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val lat = events
      .withColumn("us", unix_micros(col(tsCol)))
      .withColumn("late_us",
        greatest(lit(0L), coalesce(max(col("us")).over(w), col("us")) - col("us")))
      .select(expr("late_us div 1000000").as("late_sec"))
    val counts = lat.groupBy(col("late_sec")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("n"))
    val cum = counts.crossJoin(broadcast(total))
      .withColumn("cum", sum(col("c")).over(
        Window.orderBy(col("late_sec"))
          .rowsBetween(Window.unboundedPreceding, 0)))
    def pick(permille: Long): org.apache.spark.sql.Column =
      min(when(col("cum") * 1000L >= lit(permille) * col("n"), col("late_sec")))
    cum.agg(
        max(col("n")).as("n_events"),
        pick(500L).as("p50_sec"),
        pick(950L).as("p95_sec"),
        pick(990L).as("p99_sec"),
        max(col("late_sec")).as("max_sec"))
      .withColumn("recommended_watermark_sec",
        greatest(lit(WatermarkGridSec),
          Cols.floorDiv(col("p99_sec") + (WatermarkGridSec - 1L), WatermarkGridSec)
            * WatermarkGridSec))
  }

  /** stream_watermark_size testdata binding: sized from the events
    * stream's per-user disorder.
    */
  def watermarkRecommend(spark: SparkSession, sfDir: String): DataFrame =
    watermarkRecommendOn(Tables.events(spark, sfDir), "user_id", "ts", "event_id")

  def watermarkRecommendSql: String = {
    val g = WatermarkGridSec
    """WITH e AS (
      | SELECT epoch_us(ts) AS us, user_id, event_id FROM events),
      |l AS (
      | SELECT greatest(0, coalesce(max(us) OVER (PARTITION BY user_id ORDER BY event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), us) - us) // 1000000 AS late_sec
      | FROM e),
      |c AS (SELECT late_sec, CAST(count(*) AS BIGINT) AS c FROM l GROUP BY 1),
      |s AS (SELECT late_sec, c,
      |       sum(c) OVER (ORDER BY late_sec
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |       sum(c) OVER () AS n
      |      FROM c)
      |SELECT CAST(max(n) AS BIGINT) AS n_events,
      | CAST(min(CASE WHEN cum * 1000 >= 500 * n THEN late_sec END) AS BIGINT) AS p50_sec,
      | CAST(min(CASE WHEN cum * 1000 >= 950 * n THEN late_sec END) AS BIGINT) AS p95_sec,
      | CAST(min(CASE WHEN cum * 1000 >= 990 * n THEN late_sec END) AS BIGINT) AS p99_sec,
      | CAST(max(late_sec) AS BIGINT) AS max_sec,""".stripMargin + s"""
      | CAST(greatest($g, ((min(CASE WHEN cum * 1000 >= 990 * n THEN late_sec END) + ${g - 1}) // $g) * $g) AS BIGINT) AS recommended_watermark_sec
      |FROM s""".stripMargin
  }

  /** Linear multi-touch attribution: every click in the 30 minutes
    * before a purchase shares the purchase's credit equally (1/n_touch
    * each, in exact micro-units via integer division — deterministic
    * across engines), rolled up to the click's day: the marketing
    * question "which day's clicks actually drove purchases" that
    * last-touch (the as-of join) over-simplifies. Shape: one user-key
    * band join (the stream_interval_join shuffle — no range explosion
    * beyond true pairs), touch counts on the purchase key riding a
    * second slim shuffle, day-cardinality rollup.
    * Output per click-day: touches, distinct purchases touched, total
    * credit in micro-purchases.
    */
  def attribution(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir).withColumn("us", unix_micros(col("ts")))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("us").as("click_us"), to_date(col("ts")).as("click_day"))
    val buys = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("prc_id"), col("us").as("prc_us"))
    val touched = clicks.join(buys, Seq("user_id"))
      .filter(col("click_us") <= col("prc_us") &&
        col("click_us") > col("prc_us") - 1800000000L)
    val perPurchase = touched.groupBy(col("prc_id")).agg(count(lit(1)).as("n_touch"))
    touched.join(perPurchase, Seq("prc_id"))
      .withColumn("credit_micro", expr("1000000 div n_touch"))
      .groupBy(col("click_day").as("day"))
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("prc_id")).as("n_purchases_touched"),
        sum(col("credit_micro")).as("credit_micro"))
      .orderBy(col("day"))
  }

  def attributionSql: String =
    """WITH c AS (SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_us,
      |            CAST(ts AS DATE) AS click_day
      |           FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, event_id AS prc_id, epoch_us(ts) AS prc_us
      |      FROM events WHERE event_type = 'purchase'),
      |touched AS (
      | SELECT click_day, click_id, prc_id FROM c JOIN p ON c.user_id = p.user_id
      |  AND click_us <= prc_us AND click_us > prc_us - 1800000000),
      |nt AS (SELECT prc_id, count(*) AS n_touch FROM touched GROUP BY 1)
      |SELECT click_day AS day, count(*) AS n_touches,
      | count(DISTINCT touched.prc_id) AS n_purchases_touched,
      | CAST(sum(1000000 // n_touch) AS BIGINT) AS credit_micro
      |FROM touched JOIN nt ON touched.prc_id = nt.prc_id
      |GROUP BY 1 ORDER BY day""".stripMargin

  def cohortRetentionSql: String =
    """WITH mm AS (
      | SELECT DISTINCT o_custkey AS m, CAST(date_trunc('month', o_orderdate) AS DATE) AS am
      | FROM orders),
      |c AS (SELECT m, am, min(am) OVER (PARTITION BY m) AS cm FROM mm),
      |counts AS (
      | SELECT cm AS cohort_month,
      |  CAST((year(am) * 12 + month(am)) - (year(cm) * 12 + month(cm)) AS INTEGER) AS month_off,
      |  count(*) AS n_active
      | FROM c GROUP BY 1, 2),
      |sized AS (
      | SELECT cohort_month, month_off, n_active,
      |  max(CASE WHEN month_off = 0 THEN n_active END) OVER (PARTITION BY cohort_month) AS cohort_size
      | FROM counts)
      |SELECT cohort_month, month_off, n_active, cohort_size,
      | floor((CAST(n_active AS DOUBLE) / cohort_size) * 10000.0 + 0.5) / 10000.0 AS retention
      |FROM sized ORDER BY cohort_month, month_off""".stripMargin
}
