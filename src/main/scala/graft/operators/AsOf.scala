package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.Tables

/** As-of (backward) join — the time-series join Spark lacks natively
  * (pandas merge_asof / kdb aj): for each left row, attach the right
  * row with the greatest time ≤ the left row's time within the same
  * key group.
  *
  * Implementation is a composition of existing operators (preference
  * (a) over a custom physical plan): union both sides tagged, one
  * window scan per key ordered by (time, side) carrying the latest
  * right payload forward with `last(ignoreNulls)`. Cost: ONE shuffle on
  * the key and a per-key local sort — no range-join pair explosion, no
  * per-row binary search; at 100 TB this is the same shape as any
  * windowed aggregation. Ties at equal time resolve to the right row
  * (inclusive ≥ semantics, matching ANSI ASOF JOIN).
  */
object AsOf {

  /** Generic core. `left` and `right` must both have `key` and `time`
    * columns; right payload columns are emitted as `r_<name>` (plus
    * `r_<time>`, the matched row's time). Left rows with no prior right
    * row keep nulls (left-outer semantics). Determinism requires
    * unique (key, time) pairs on the right side.
    *
    * The right payload travels as ONE struct through a single
    * `last(ignoreNulls)` — filling each payload column independently
    * would backfill a NULL in the matched row's column from an OLDER
    * right row, silently mixing columns of different right rows (real
    * ASOF JOIN semantics attach the matched row's values, including its
    * NULLs).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      rightPrefix: String = "r_"): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val lPay = left.columns.filterNot(c => c == key || c == time).toSeq
    val rPay = (time +: right.columns.filterNot(c => c == key || c == time).toSeq)
    val rStruct = StructType(rPay.map(c => StructField(rightPrefix + c, right.schema(c).dataType)))
    val lSide = left.select(
      col(key) +: col(time) +: lit(1).as("__side") +:
        (lPay.map(col) :+ lit(null).cast(rStruct).as("__r")): _*)
    val rSide = right.select(
      col(key) +: col(time) +: lit(0).as("__side") +:
        (lPay.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(rPay.map(c => col(c).as(rightPrefix + c)): _*).as("__r")): _*)
    val w = Window.partitionBy(col(key)).orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((col(key) +: col(time) +: lPay.map(col)) ++
        rPay.map(c => col("__r").getField(rightPrefix + c).as(rightPrefix + c)): _*)
  }

  /** asof_join — testdata binding: each click event joined to the
    * user's most recent purchase at or before it.
    */
  def clicksToPurchases(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir).withColumn("us", unix_micros(col("ts")))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("us"), col("event_id").as("click_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), col("event_id").as("prc_id"), col("value").as("prc_value"))
    asofJoin(clicks, purchases, "user_id", "us")
      .select(col("user_id"), col("click_id"), col("us").as("click_us"),
        col("r_us").as("prc_us"), col("r_prc_id").as("prc_id"), col("r_prc_value").as("prc_value"),
        expr("(us - r_us) div 1000000").as("gap_sec"))
      .transform(graft.util.Cols.verifySort(_, col("click_id")))
  }

  def clicksToPurchasesSql: String =
    """WITH c AS (SELECT user_id, epoch_us(ts) AS us, event_id AS click_id
      |           FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, epoch_us(ts) AS us, event_id AS prc_id, value AS prc_value
      |      FROM events WHERE event_type = 'purchase')
      |SELECT c.user_id, click_id, c.us AS click_us, p.us AS prc_us, prc_id, prc_value,
      | (c.us - p.us) // 1000000 AS gap_sec
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.us >= p.us
      |ORDER BY click_id""".stripMargin

  /** FORWARD as-of join (pandas merge_asof direction='forward'): each
    * left row matched to the EARLIEST right row at or after it. Same
    * single-shuffle union+window core as [[asofJoin]], run on negated
    * time (forward-on-t ≡ backward-on-−t); the emitted `r_<time>` is
    * negated back. Completes the direction surface — backward here,
    * forward, and nearest = coalesce(closer of the two).
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      time: String, rightPrefix: String = "r_"): DataFrame = {
    val neg = (df: DataFrame) => df.withColumn(time, -col(time))
    asofJoin(neg(left), neg(right), key, time, rightPrefix)
      .withColumn(time, -col(time))
      .withColumn(rightPrefix + time, -col(rightPrefix + time))
  }

  /** asof_join_forward testdata binding: each purchase joined to the
    * user's NEXT click at or after it (the "what did the buyer do
    * next" direction).
    */
  def purchasesToNextClick(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir).withColumn("us", unix_micros(col("ts")))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), col("event_id").as("prc_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("us"), col("event_id").as("click_id"))
    asofJoinForward(purchases, clicks, "user_id", "us")
      .select(col("user_id"), col("prc_id"), col("us").as("prc_us"),
        col("r_us").as("click_us"), col("r_click_id").as("click_id"),
        expr("(r_us - us) div 1000000").as("gap_sec"))
      .transform(graft.util.Cols.verifySort(_, col("prc_id")))
  }

  def purchasesToNextClickSql: String =
    """WITH p AS (SELECT user_id, epoch_us(ts) AS us, event_id AS prc_id
      |           FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, epoch_us(ts) AS us, event_id AS click_id
      |      FROM events WHERE event_type = 'click')
      |SELECT p.user_id, prc_id, p.us AS prc_us, c.us AS click_us, click_id,
      | (c.us - p.us) // 1000000 AS gap_sec
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.us <= c.us
      |ORDER BY prc_id""".stripMargin

  /** NEAREST as-of join (pandas merge_asof direction='nearest' — the
    * sensor-fusion alignment): each left row matched to the right row
    * with the SMALLEST |Δt| in either direction, ties toward the
    * past. Composes the two directional passes (each the proven
    * single-shuffle union+window core) and chooses scan-side after an
    * equi-join on a caller-provided UNIQUE left id — the id, not
    * (key, time), because duplicate left timestamps must not
    * cross-match, and a synthetic monotonically_increasing_id would
    * be partitioning-dependent. The emitted lag stays in raw signed
    * MICROS: dividing it would hit the `div`-truncates vs `//`-floors
    * divergence on negative (future-match) lags. Output: left columns
    * + `<prefix><time>`/payload of the chosen row + matched_dir
    * ('past' / 'future' / null) — Δt=0 rows sit in 'past' by the tie
    * rule.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String,
      time: String, idCol: String, rightPrefix: String = "n_"): DataFrame = {
    val rPay = time +: right.columns.filterNot(c => c == key || c == time).toSeq
    val b = asofJoin(left, right, key, time, "__b_")
    val f = asofJoinForward(left, right, key, time, "__f_")
      .select(col(idCol) +: rPay.map(c => col("__f_" + c)): _*)
    val bt = col("__b_" + time)
    val ft = col("__f_" + time)
    val pickB = ft.isNull || (bt.isNotNull && (col(time) - bt) <= (ft - col(time)))
    val chosen = rPay.map(c =>
      when(pickB, col("__b_" + c)).otherwise(col("__f_" + c)).as(rightPrefix + c))
    val dir = when(pickB && bt.isNotNull, lit("past"))
      .when(!pickB, lit("future"))
      .otherwise(lit(null).cast("string")).as("matched_dir")
    b.join(f, Seq(idCol), "left")
      .select(left.columns.toSeq.map(col) ++ chosen :+ dir: _*)
  }

  /** asof_join_nearest testdata binding: each click to the user's
    * nearest purchase in time, either direction.
    */
  def clicksToNearestPurchase(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir).withColumn("us", unix_micros(col("ts")))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("us"), col("event_id").as("click_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), col("event_id").as("prc_id"), col("value").as("prc_value"))
    asofJoinNearest(clicks, purchases, "user_id", "us", "click_id")
      .select(col("user_id"), col("click_id"), col("us").as("click_us"),
        col("n_us").as("prc_us"), col("n_prc_id").as("prc_id"),
        col("n_prc_value").as("prc_value"),
        (col("us") - col("n_us")).as("lag_us"), col("matched_dir"))
      .transform(graft.util.Cols.verifySort(_, col("click_id")))
  }

  def clicksToNearestPurchaseSql: String =
    """WITH c AS (SELECT user_id, epoch_us(ts) AS us, event_id AS click_id
      |           FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, epoch_us(ts) AS us, event_id AS prc_id, value AS prc_value
      |      FROM events WHERE event_type = 'purchase'),
      |b AS (SELECT c.user_id, click_id, c.us,
      |        p.us AS bus, prc_id AS bid, prc_value AS bval
      |      FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.us >= p.us),
      |f AS (SELECT click_id, p.us AS fus, prc_id AS fid, prc_value AS fval
      |      FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.us <= p.us)
      |SELECT b.user_id, b.click_id, b.us AS click_us,
      | CASE WHEN fus IS NULL OR (bus IS NOT NULL AND b.us - bus <= fus - b.us)
      |      THEN bus ELSE fus END AS prc_us,
      | CASE WHEN fus IS NULL OR (bus IS NOT NULL AND b.us - bus <= fus - b.us)
      |      THEN bid ELSE fid END AS prc_id,
      | CASE WHEN fus IS NULL OR (bus IS NOT NULL AND b.us - bus <= fus - b.us)
      |      THEN bval ELSE fval END AS prc_value,
      | b.us - (CASE WHEN fus IS NULL OR (bus IS NOT NULL AND b.us - bus <= fus - b.us)
      |              THEN bus ELSE fus END) AS lag_us,
      | CASE WHEN (fus IS NULL OR (bus IS NOT NULL AND b.us - bus <= fus - b.us))
      |        AND bus IS NOT NULL THEN 'past'
      |      WHEN NOT (fus IS NULL OR (bus IS NOT NULL AND b.us - bus <= fus - b.us))
      |      THEN 'future' ELSE NULL END AS matched_dir
      |FROM b LEFT JOIN f ON b.click_id = f.click_id
      |ORDER BY b.click_id""".stripMargin
}
