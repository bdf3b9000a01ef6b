package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.{Cols, Tables}

/** Retail ETL surface (SURVEY.md §2.A) — the reference pipeline's
  * semantics (reference: airflow/dags/etl.py + airflow/dags/sql/init_db.sql),
  * re-expressed as declarative Spark plans over the testdata star schema.
  *
  * Reference steps → graft operators:
  *  - initial_clean (etl.py:44-90)  → [[clean]]: typed projection, rename,
  *    sentinel null-fill, predicate + id-shape filters, yyyyMMdd dim id.
  *  - stage_dims (etl.py:94-120) → [[scd1Customers]]/[[scd1Products]]:
  *    SCD type-1 "keep most recent per natural key", expressed as a
  *    row_number window (pandas drop_duplicates(keep="last") relied on
  *    file order; at 100 TB there is no file order — recency must be an
  *    explicit ORDER BY, so we sort by event time with unique-key
  *    tie-breaks).
  *  - load_dims dim_dates generation (etl.py:127-150) → [[dimDates]]:
  *    sequence+explode, fully distributed (no driver-side range).
  *  - stage_fact (etl.py:182-230) → [[factBuild]]: left-join facts to
  *    dims on natural keys, null → default member (init_db.sql's
  *    '00000' sentinel row), drop natural keys.
  *  - Superset dashboard queries → [[starRevenue]]/[[starTopn]].
  */
object RetailEtl {

  /** Generic SCD type-1 "keep most recent per natural key": one row per
    * key combination, chosen by the given recency ordering (which MUST
    * include unique tie-break columns — at 100 TB there is no file
    * order for drop_duplicates(keep="last") to lean on). One shuffle on
    * the key; the window sort is per-key local.
    */
  def keepLatest(df: DataFrame, keyCols: Seq[String], orderBy: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** etl_clean — initial cleaning of raw event rows. Filters and the
    * projection both push to the parquet scan; the regex shape check is
    * a codegen'd expression (no UDF).
    */
  def clean(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .select(
        col("event_id").as("invoice_id"),
        coalesce(col("user_id"), lit(0L)).as("customer_id"),
        col("event_type"),
        col("value").as("unit_price"),
        col("ts"))
      .filter(col("unit_price") > 0.0)
      .filter(col("event_type").rlike("^[a-z_]+$"))
      .withColumn("date_dim_id", date_format(col("ts"), "yyyyMMdd").cast("int"))
      .drop("ts")
      .transform(Cols.verifySort(_, col("invoice_id")))
  }

  /** etl_scd1_customers — SCD type-1 customer dim: latest order decides
    * the current attributes. One shuffle on the natural key; the window
    * sort is per-key local.
    */
  def scd1Customers(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val latest = keepLatest(o, Seq("o_custkey"),
        Seq(col("o_orderdate").desc, col("o_orderkey").desc))
      .select(col("o_custkey"), col("o_orderdate").as("last_order_date"),
        col("o_orderstatus").as("last_status"))
    c.join(latest, c("c_custkey") === latest("o_custkey"))
      .select(col("c_custkey").as("customer_id"), col("c_name").as("name"),
        col("c_mktsegment").as("segment"),
        col("last_order_date").cast("date").as("last_order_date"),
        col("last_status"))
      .transform(graft.util.Cols.verifySort(_, col("customer_id")))
  }

  /** etl_scd1_products — SCD type-1 product dim: most recent shipment
    * per part carries the current observed state.
    */
  def scd1Products(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    val latest = keepLatest(l, Seq("l_partkey"),
        Seq(col("l_shipdate").desc, col("l_orderkey").desc, col("l_linenumber").desc))
      .select(col("l_partkey"), col("l_shipdate").cast("date").as("last_ship_date"),
        Cols.pround(col("l_extendedprice") / col("l_quantity"), 2).as("last_unit_price"))
    p.join(latest, p("p_partkey") === latest("l_partkey"))
      .select(col("p_partkey").as("stock_code"), col("p_name").as("description"),
        col("p_brand").as("brand"), col("last_ship_date"), col("last_unit_price"))
      .transform(graft.util.Cols.verifySort(_, col("stock_code")))
  }

  /** etl_scd1_merge — INCREMENTAL dimension maintenance: the dim built
    * from history (orders before the cutoff) merged with a delta batch
    * (orders at/after the cutoff) via full-outer upsert — delta wins
    * because every delta row is newer than any history row for the same
    * key. At 100 TB this replaces the reference's truncate-and-reload
    * (etl.py load_dims rewrites dims each run) with a bounded-size merge
    * whose cost tracks the DELTA, not the accumulated history. The
    * oracle is the full-data SCD1 recompute: merge(history, delta) must
    * equal rebuild(all) — the incremental-correctness invariant.
    */
  def scd1Merge(spark: SparkSession, sfDir: String): DataFrame = {
    val cutoff = "1996-01-01"
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    def latestOf(part: DataFrame): DataFrame =
      keepLatest(part, Seq("o_custkey"), Seq(col("o_orderdate").desc, col("o_orderkey").desc))
        .select(col("o_custkey"), col("o_orderdate").as("last_order_date"),
          col("o_orderstatus").as("last_status"))
    val hist = latestOf(o.filter(col("o_orderdate") < lit(cutoff)))
    val delta = latestOf(o.filter(col("o_orderdate") >= lit(cutoff)))
      .select(col("o_custkey").as("d_custkey"), col("last_order_date").as("d_date"),
        col("last_status").as("d_status"))
    val merged = hist.join(delta, col("o_custkey") === col("d_custkey"), "full_outer")
      .select(
        coalesce(col("o_custkey"), col("d_custkey")).as("o_custkey"),
        coalesce(col("d_date"), col("last_order_date")).as("last_order_date"),
        coalesce(col("d_status"), col("last_status")).as("last_status"))
    c.join(merged, c("c_custkey") === merged("o_custkey"))
      .select(col("c_custkey").as("customer_id"), col("c_name").as("name"),
        col("c_mktsegment").as("segment"),
        col("last_order_date").cast("date").as("last_order_date"),
        col("last_status"))
      .transform(graft.util.Cols.verifySort(_, col("customer_id")))
  }

  /** etl_dim_dates — generated date dimension 2008-01-01..2012-01-01
    * (reference range, etl.py:130-134). sequence+explode is evaluated
    * on executors; ISO day-of-week/week match pandas isocalendar().
    */
  def dimDates(spark: SparkSession, sfDir: String): DataFrame = {
    spark.range(1)
      .select(explode(sequence(
        lit(java.sql.Date.valueOf("2008-01-01")),
        lit(java.sql.Date.valueOf("2012-01-01")),
        expr("interval 1 day"))).as("date"))
      .select(
        date_format(col("date"), "yyyyMMdd").cast("int").as("date_dim_id"),
        col("date"),
        year(col("date")).as("year"),
        month(col("date")).as("month"),
        dayofmonth(col("date")).as("day"),
        (weekday(col("date")) + 1).as("day_of_week"),
        weekofyear(col("date")).as("week"))
      .orderBy(col("date_dim_id"))
  }

  /** etl_fact_build — surrogate-key fact build: facts left-join dims on
    * natural keys; unmatched rows get the default member (dim id 0),
    * mirroring init_db.sql's '00000' sentinel rows. Customer/part dims
    * grow with the data (150K/200K rows per SF), so their join strategy
    * is left to AQE + autoBroadcastJoinThreshold — a hard broadcast()
    * hint here would force a multi-GB driver broadcast at 100× scale.
    * Only truly bounded dims (region/nation/dim_dates) deserve hard
    * hints. Surrogate ids are stable
    * key-derived values (not serials): at cluster scale a sequence is a
    * bottleneck, a deterministic mapping is free and idempotent.
    */
  def factBuild(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
    // "active" dim members only → some facts fall through to the sentinel
    val dimC = Tables.customer(spark, sfDir)
      .filter(col("c_acctbal") > 0.0)
      .select(col("c_custkey"), (col("c_custkey") + 1000000L).as("customer_dim_id"))
    val dimP = Tables.part(spark, sfDir)
      .filter(col("p_size") >= 5)
      .select(col("p_partkey"), (col("p_partkey") + 2000000L).as("product_dim_id"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(dimC, col("o_custkey") === dimC("c_custkey"), "left")
      .join(dimP, l("l_partkey") === dimP("p_partkey"), "left")
      .select(
        col("l_orderkey").as("invoice_id"),
        col("l_linenumber").as("line_no"),
        date_format(col("l_shipdate"), "yyyyMMdd").cast("int").as("date_dim_id"),
        coalesce(col("customer_dim_id"), lit(0L)).as("customer_dim_id"),
        coalesce(col("product_dim_id"), lit(0L)).as("product_dim_id"),
        Cols.pround(col("l_extendedprice") / col("l_quantity"), 2).as("unit_price"),
        col("l_quantity").as("quantity"))
      .transform(Cols.verifySort(_, col("invoice_id"), col("line_no")))
  }

  /** etl_fk_audit — the data-quality gate a fact load runs before
    * publishing: orphan counts for every foreign-key edge of the star
    * (anti-joins), plus duplicate-key counts on would-be primary keys.
    * All counts 0 ⇒ the load is referentially sound. Anti-joins
    * broadcast the key side when dim-sized.
    */
  def fkAudit(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("graft_audit_l")
    Tables.orders(spark, sfDir).createOrReplaceTempView("graft_audit_o")
    Tables.customer(spark, sfDir).createOrReplaceTempView("graft_audit_c")
    Tables.part(spark, sfDir).createOrReplaceTempView("graft_audit_p")
    // scalar subqueries: one declarative plan, each NOT EXISTS becomes
    // an anti-join the planner broadcasts where dim-sized
    spark.sql(
      """SELECT
        | (SELECT count(*) FROM graft_audit_l l WHERE NOT EXISTS
        |   (SELECT 1 FROM graft_audit_o o WHERE l.l_orderkey = o.o_orderkey)) AS orphan_lineitems,
        | (SELECT count(*) FROM graft_audit_o o WHERE NOT EXISTS
        |   (SELECT 1 FROM graft_audit_c c WHERE o.o_custkey = c.c_custkey)) AS orphan_orders,
        | (SELECT count(*) FROM graft_audit_l l WHERE NOT EXISTS
        |   (SELECT 1 FROM graft_audit_p p WHERE l.l_partkey = p.p_partkey)) AS orphan_part_refs,
        | (SELECT count(*) FROM (SELECT o_orderkey FROM graft_audit_o GROUP BY 1 HAVING count(*) > 1)) AS dup_orderkeys""".stripMargin)
  }

  /** Dense insert-ordered surrogate assignment (reference
    * init_db.sql:8,16 `SERIAL PRIMARY KEY`; :12-13 pre-seeded default
    * member): new rows receive serials max(existing.sk)+1, +2, … in
    * deterministic natural-key order — the load semantic a database
    * sequence provides, re-expressed without one (at cluster scale a
    * sequence is a serialization point; a deterministic rank is free
    * and idempotent). `existing` must carry `sk`; `incoming`'s keys
    * are assumed unique and disjoint from existing (anti-join first —
    * [[keepLatest]] / [[scd1Merge]] own that step).
    *
    * Shape: a naive global `row_number() OVER (ORDER BY key)` plans as
    * a SINGLE-PARTITION sort — the anti-pattern that serializes a
    * 100 TB load through one task. This computes the identical dense
    * rank in two phases: range-bucket the keys (scan-side div), count
    * per bucket (map-side-combined aggregate, output = #buckets rows),
    * prefix-sum those counts (a window over BUCKET COUNTS — bounded by
    * keyspace/bucketWidth, never by row count; size bucketWidth so
    * this stays thousands of rows), then rank WITHIN buckets only.
    * serial = max_sk + bucket_offset + within-bucket rank.
    *
    * Keys must be NUMERIC (castable to BIGINT): range bucketing by
    * integer division is what keeps the prefix-sum frame tiny without
    * a sampling pass. String natural keys need a range-sampled
    * boundary map (Spark's repartitionByRange machinery) — out of
    * scope until a consumer needs it; hash-bucketing instead would
    * break the insert-ordered (key-ordered) serial contract.
    */
  def dimSerialOn(existing: DataFrame, incoming: DataFrame, keyCol: String,
      bucketWidth: Long = 65536L): DataFrame = {
    val base = existing.agg(coalesce(max(col("sk")), lit(0L)).as("base"))
    val b = incoming.withColumn("bkt", expr(s"CAST($keyCol AS BIGINT) div $bucketWidth"))
    val cum = b.groupBy(col("bkt")).agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(
        Window.orderBy(col("bkt")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bkt"), col("off"))
    val w = Window.partitionBy(col("bkt")).orderBy(col(keyCol))
    b.join(broadcast(cum), Seq("bkt"))
      .crossJoin(broadcast(base))
      .withColumn("sk", col("base") + col("off") + row_number().over(w))
      .drop("bkt", "base", "off")
  }

  /** etl_dim_serial testdata binding: the reference's dim load replayed
    * as two batches — seed the default member (sk 1, 'Unknown'), load
    * nations 0–11's customers, then APPEND the rest; serials stay dense
    * and insert-ordered across the append, exactly what a SERIAL column
    * would have produced. Output: (sk, c_custkey, c_name).
    */
  def dimSerial(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    val seed = spark.range(1).select(lit(1L).as("sk"),
      lit(0L).as("c_custkey"), lit("Unknown").as("c_name"))
    val cols = Seq(col("sk"), col("c_custkey"), col("c_name"))
    val loaded1 = seed.unionByName(
      dimSerialOn(seed, c.filter(col("c_nationkey") < 12).drop("c_nationkey"),
        "c_custkey").select(cols: _*))
    loaded1.unionByName(
      dimSerialOn(loaded1, c.filter(col("c_nationkey") >= 12).drop("c_nationkey"),
        "c_custkey").select(cols: _*))
      .transform(graft.util.Cols.verifySort(_, col("sk")))
  }

  def dimSerialSql: String =
    """WITH seed AS (SELECT CAST(1 AS BIGINT) AS sk, CAST(0 AS BIGINT) AS c_custkey, 'Unknown' AS c_name),
      |b1 AS (SELECT c_custkey, c_name FROM customer WHERE c_nationkey < 12),
      |e1 AS (SELECT CAST(1 + row_number() OVER (ORDER BY c_custkey) AS BIGINT) AS sk, c_custkey, c_name FROM b1),
      |l1 AS (SELECT * FROM seed UNION ALL SELECT * FROM e1),
      |m AS (SELECT max(sk) AS mx FROM l1),
      |b2 AS (SELECT c_custkey, c_name FROM customer WHERE c_nationkey >= 12),
      |e2 AS (SELECT CAST(mx + row_number() OVER (ORDER BY c_custkey) AS BIGINT) AS sk, c_custkey, c_name FROM b2, m)
      |SELECT sk, c_custkey, c_name FROM l1
      |UNION ALL SELECT sk, c_custkey, c_name FROM e2
      |ORDER BY sk""".stripMargin

  /** Warehouse load step (reference: etl.py:145/:167/:245 df.to_sql →
    * dim_customers/dim_products/fct_invoices): write a dimension or
    * fact frame to a JDBC warehouse. Overwrite = the reference's
    * if_exists="replace". Thin delegation to
    * [[graft.sources.JdbcSink.loadTable]], which documents the
    * connection-cap scaling contract.
    */
  def loadDim(df: DataFrame, url: String, table: String,
      mode: org.apache.spark.sql.SaveMode = org.apache.spark.sql.SaveMode.Overwrite,
      driver: Option[String] = None, numPartitions: Int = 1): Unit =
    graft.sources.JdbcSink.loadTable(df, url, table, mode, driver, numPartitions)

  /** etl_star_revenue — dashboard query: monthly revenue by market
    * segment over the star. Customer grows with SF → join strategy is
    * AQE-decided (the slim 2-column projection keeps it broadcastable
    * far longer than the full row, without removing Spark's size check).
    */
  def starRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(
        year(col("l_shipdate")).as("yr"),
        month(col("l_shipdate")).as("mo"),
        col("c_mktsegment").as("segment"))
      .agg(
        Cols.pround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("yr"), col("mo"), col("segment"))
  }

  /** etl_star_topn — dashboard query: top-5 products by revenue within
    * each brand (rank over aggregate). Part grows with SF (200K/SF) →
    * AQE-decided join strategy, same rationale as [[starRevenue]].
    */
  def starTopn(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
    val p = Tables.part(spark, sfDir).select(col("p_partkey"), col("p_name"), col("p_brand"))
    val agg = l.join(p, l("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"), col("p_name"))
      .agg(Cols.pround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("revenue").desc, col("p_partkey"))
    agg.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("p_brand"), col("p_partkey"), col("p_name"), col("revenue"), col("rk"))
      .orderBy(col("p_brand"), col("rk"))
  }

  /** Closed-form SQL `ntile(k)` from a global 1-based rank and the
    * total row count: with q = n div k, r = n mod k, the first r tiles
    * get q+1 rows and the rest q. CASE branches evaluate lazily, but
    * the q=0 divisor is still guarded (greatest) so ANSI mode can
    * never see a div-by-zero.
    */
  private def ntileFromRank(rankCol: String, totalCol: String, k: Int): String =
    s"""CAST(CASE WHEN $rankCol <= ($totalCol % $k) * (($totalCol div $k) + 1)
       |  THEN 1 + ($rankCol - 1) div (($totalCol div $k) + 1)
       |  ELSE 1 + ($totalCol % $k)
       |       + ($rankCol - ($totalCol % $k) * (($totalCol div $k) + 1) - 1)
       |         div greatest($totalCol div $k, 1)
       |END AS INT)""".stripMargin

  /** etl_rfm — RFM customer segmentation (the classic retail-analytics
    * read off the invoice fact: Recency / Frequency / Monetary quartile
    * scores per customer, the reference dashboard's customer-value
    * cut). Recency is measured against the corpus max order date (a
    * 1-row aggregate, broadcast); quartiles are exact ntile(4) with
    * explicit tie-breaks (metric, then customer key) so the
    * segmentation is REPRODUCIBLE across engines and runs; monetary
    * rides in integer cents. |customers| scales with data, so a global
    * `ntile(4) OVER (ORDER BY …)` — a single-partition sort of every
    * customer row, executed three times — is replaced by the
    * dimSerialOn two-phase rank, generalized to three axes in ONE
    * pass:
    *  1. range-bucket each axis scan-side (`div` is monotone, so equal
    *     keys share a bucket and bucket order respects sort order;
    *     DESC recency buckets on the negated key);
    *  2. ONE grouping-sets aggregate emits all three per-bucket count
    *     tables in a single shuffle (bucket cardinality =
    *     value-range/width, never row count: recency is
    *     calendar-bounded at width 64, frequency order-count-bounded
    *     at width 4, monetary cents at width 2^22 ≈ $42k/bucket);
    *  3. bucket offsets and totals by prefix sum over the count
    *     tables — a window PARTITIONED by grouping id, so etl_rfm's
    *     plan has no unpartitioned window at all (PlanAuditSpec); the
    *     offset table is pinned with an eager localCheckpoint so the
    *     three axis joins share one computation;
    *  4. per axis: broadcast the offset map back, rank within buckets
    *     (partitioned window, local sorts), global rank = offset +
    *     local rank, quartile = closed-form [[ntileFromRank]].
    * Same integers as the three ntile windows, no data-scaled
    * single-partition sort anywhere.
    */
  def rfm(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val maxDate = o.agg(max(to_date(col("o_orderdate"))).as("max_d"))
    val per = o.groupBy(col("o_custkey").as("customer_id"))
      .agg(max(to_date(col("o_orderdate"))).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long")).as("monetary_cents"))
      .crossJoin(broadcast(maxDate)) // 1-row aggregate: bounded at any SF
      .withColumn("recency_days", datediff(col("max_d"), col("last_order")))
    // score 4 = best quartile on every axis (most recent, most
    // frequent, highest spend); ties broken by customer_id so every
    // engine assigns identical buckets
    val keyed = per
      .withColumn("_rb", expr("(-recency_days) div 64"))
      .withColumn("_fb", expr("frequency div 4"))
      .withColumn("_mb", expr(s"monetary_cents div ${1L << 22}"))
    val counts = keyed
      .groupingSets(Seq(Seq(col("_rb")), Seq(col("_fb")), Seq(col("_mb"))),
        col("_rb"), col("_fb"), col("_mb"))
      .agg(count(lit(1)).as("_n"), grouping_id().as("_gid"))
      .withColumn("_bkt", coalesce(col("_rb"), col("_fb"), col("_mb")))
    val wg = Window.partitionBy(col("_gid")).orderBy(col("_bkt"))
    // eager localCheckpoint, not persist: three axis joins read this
    // frame, and DeduplicateRelations re-aliases the 2nd and 3rd
    // occurrences of a repeated subtree, which breaks the cache's
    // sameResult match (measured: 1 of 3 joins hit, the others
    // re-planned the aggregate + prefix sum). A checkpoint pins the
    // bucket-cardinality rows (value-range/width, never row count) as
    // a concrete RDD leaf all three joins scan — the pagerank pin.
    val cum = counts.select(col("_gid"), col("_bkt"),
      coalesce(sum(col("_n")).over(
        wg.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("_off"),
      sum(col("_n")).over(
        wg.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).as("_tot"))
      .localCheckpoint()
    // axis rank + quartile: broadcast offset map, partitioned window
    def scoreAxis(df: DataFrame, bucketCol: String, orderKey: org.apache.spark.sql.Column,
        gid: Int, out: String): DataFrame = {
      val m = cum.filter(col("_gid") === gid)
        .select(col("_bkt").as(bucketCol), col("_off"), col("_tot"))
      val w = Window.partitionBy(col(bucketCol)).orderBy(orderKey, col("customer_id"))
      df.join(broadcast(m), Seq(bucketCol))
        .withColumn("_rank", col("_off") + row_number().over(w))
        .withColumn(out, expr(ntileFromRank("_rank", "_tot", 4)))
        .drop("_off", "_tot", "_rank")
    }
    // grouping_id bits (rb,fb,mb): 1 = not grouped → set {_rb}=0b011=3,
    // {_fb}=0b101=5, {_mb}=0b110=6
    val s1 = scoreAxis(keyed, "_rb", col("recency_days").desc, 3, "r_score")
    val s2 = scoreAxis(s1, "_fb", col("frequency"), 5, "f_score")
    val s3 = scoreAxis(s2, "_mb", col("monetary_cents"), 6, "m_score")
    s3.drop("_rb", "_fb", "_mb")
      .withColumn("rfm", concat(col("r_score"), col("f_score"), col("m_score")))
      .withColumn("segment",
        when(col("r_score") >= 3 && col("f_score") >= 3 && col("m_score") >= 3, "champion")
          .when(col("r_score") <= 2 && col("f_score") >= 3, "at_risk_loyal")
          .when(col("r_score") >= 3 && col("f_score") <= 2, "new_or_promising")
          .otherwise("hibernating"))
      .select(col("customer_id"), col("recency_days"), col("frequency"),
        col("monetary_cents"), col("r_score"), col("f_score"), col("m_score"),
        col("rfm"), col("segment"))
      .transform(graft.util.Cols.verifySort(_, col("customer_id")))
  }

  /** etl_scd2 — SCD TYPE-2 customer dimension: full status HISTORY as
    * versioned rows with effective-date ranges, not just the latest
    * state (the reference's SCD1 dims overwrite; type 2 is the other
    * half of the warehouse-dimension toolkit). One observation per
    * (customer, day) — the day's latest order wins — then consecutive
    * same-status runs collapse to one version row (change points via
    * lag), effective_to = day before the next version (null while
    * current). Both window passes share the customer-key partitioning,
    * so the whole history build is ONE shuffle on the natural key; at
    * 100 TB the per-key sort is local and the dimension's row count is
    * bounded by CHANGES, not by fact volume.
    */
  def scd2Customers(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val daily = keepLatest(
      o.select(col("o_custkey"), to_date(col("o_orderdate")).as("odate"),
        col("o_orderstatus").as("status"), col("o_orderkey")),
      Seq("o_custkey", "odate"), Seq(col("o_orderkey").desc))
    val wc = Window.partitionBy(col("o_custkey")).orderBy(col("odate"))
    daily
      .withColumn("prev", lag(col("status"), 1).over(wc))
      .filter(col("prev").isNull || col("status") =!= col("prev"))
      .withColumn("version", row_number().over(wc).cast("int"))
      .withColumn("effective_to", date_sub(lead(col("odate"), 1).over(wc), 1))
      .select(col("o_custkey").as("customer_id"), col("version"),
        col("status"), col("odate").as("effective_from"), col("effective_to"),
        when(col("effective_to").isNull, 1).otherwise(0).as("is_current"))
      .transform(graft.util.Cols.verifySort(_, col("customer_id"), col("version")))
  }

  def scd2CustomersSql: String =
    """WITH daily AS (
      | SELECT o_custkey, CAST(o_orderdate AS DATE) AS odate, o_orderstatus AS status,
      |  row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
      | FROM orders),
      |chg AS (
      | SELECT o_custkey, odate, status,
      |  lag(status) OVER (PARTITION BY o_custkey ORDER BY odate) AS prev
      | FROM daily WHERE rn = 1),
      |v AS (
      | SELECT o_custkey, odate, status,
      |  row_number() OVER (PARTITION BY o_custkey ORDER BY odate) AS version,
      |  lead(odate) OVER (PARTITION BY o_custkey ORDER BY odate) - INTERVAL 1 DAY AS eff_to
      | FROM chg WHERE prev IS NULL OR status <> prev)
      |SELECT o_custkey AS customer_id, CAST(version AS INTEGER) AS version, status,
      | odate AS effective_from, CAST(eff_to AS DATE) AS effective_to,
      | CASE WHEN eff_to IS NULL THEN 1 ELSE 0 END AS is_current
      |FROM v ORDER BY customer_id, version""".stripMargin

  /** etl_pit_lookup — POINT-IN-TIME dimension attribution, the Kimball
    * pattern SCD2 history exists to serve: each fact row joins the
    * dimension VERSION that was valid on its transaction date (not
    * today's row — the classic late-arriving-fact / restated-history
    * correctness trap), here orders attributed to the customer-status
    * version in force on the order date, rolled up by attributed
    * status × year. Scale shape: one equi-join shuffle on the customer
    * key with the validity-interval predicate applied post-join (a
    * customer's version list is tiny — interval filtering never
    * explodes), then a |statuses|×|years| aggregate.
    */
  def pitLookup(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = scd2Customers(spark, sfDir)
    val o = Tables.orders(spark, sfDir).select(col("o_custkey"),
      to_date(col("o_orderdate")).as("odate"), col("o_totalprice"))
    o.join(dim, col("o_custkey") === col("customer_id") &&
        col("odate") >= col("effective_from") &&
        (col("effective_to").isNull || col("odate") <= col("effective_to")))
      .groupBy(col("status").as("status_at_order"), year(col("odate")).as("yr"))
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long")).as("total_cents"))
      .orderBy(col("status_at_order"), col("yr"))
  }

  def pitLookupSql: String =
    s"""WITH dim AS ($scd2CustomersSql),
       |o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS odate, o_totalprice FROM orders)
       |SELECT status AS status_at_order, CAST(year(odate) AS INTEGER) AS yr,
       | count(*) AS n_orders,
       | CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
       |FROM o JOIN dim ON o.o_custkey = dim.customer_id
       | AND odate >= effective_from
       | AND (effective_to IS NULL OR odate <= effective_to)
       |GROUP BY 1, 2 ORDER BY status_at_order, yr""".stripMargin

  /** etl_cdc_diff — snapshot change-data-capture: diff two point-in-time
    * builds of the customer dimension (here: the dim as observed over
    * 1994–95 vs over 1995–96 order windows) into insert / delete /
    * update change rows — the feed an incremental downstream consumes
    * instead of re-reading a full dimension. One co-partitioned
    * full-outer join on the natural key; at scale both snapshots shuffle
    * once and the diff streams — no driver-side state.
    */
  def cdcDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    def snap(from: String, until: String): DataFrame =
      keepLatest(
        o.filter(col("o_orderdate") >= lit(from) && col("o_orderdate") < lit(until)),
        Seq("o_custkey"), Seq(col("o_orderdate").desc, col("o_orderkey").desc))
        .select(col("o_custkey").as("customer_id"),
          to_date(col("o_orderdate")).as("snap_date"),
          col("o_orderstatus").as("snap_status"))
    val a = snap("1994-01-01", "1996-01-01")
      .select(col("customer_id"), col("snap_date").as("old_date"), col("snap_status").as("old_status"))
    val b = snap("1995-01-01", "1997-01-01")
      .select(col("customer_id"), col("snap_date").as("new_date"), col("snap_status").as("new_status"))
    a.join(b, Seq("customer_id"), "full_outer")
      .withColumn("change_type",
        when(col("old_status").isNull, "insert")
          .when(col("new_status").isNull, "delete")
          .when(col("old_status") =!= col("new_status") || col("old_date") =!= col("new_date"), "update")
          .otherwise("unchanged"))
      .filter(col("change_type") =!= "unchanged")
      .select(col("customer_id"), col("change_type"),
        col("old_date"), col("old_status"), col("new_date"), col("new_status"))
      .transform(graft.util.Cols.verifySort(_, col("customer_id")))
  }

  def cdcDiffSql: String =
    """WITH snap_a AS (
      | SELECT o_custkey AS customer_id, CAST(o_orderdate AS DATE) AS old_date, o_orderstatus AS old_status
      | FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |       FROM orders WHERE o_orderdate >= '1994-01-01' AND o_orderdate < '1996-01-01')
      | WHERE rn = 1),
      |snap_b AS (
      | SELECT o_custkey AS customer_id, CAST(o_orderdate AS DATE) AS new_date, o_orderstatus AS new_status
      | FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |       FROM orders WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1997-01-01')
      | WHERE rn = 1),
      |d AS (
      | SELECT coalesce(snap_a.customer_id, snap_b.customer_id) AS customer_id,
      |  old_date, old_status, new_date, new_status,
      |  CASE WHEN old_status IS NULL THEN 'insert'
      |       WHEN new_status IS NULL THEN 'delete'
      |       WHEN old_status <> new_status OR old_date <> new_date THEN 'update'
      |       ELSE 'unchanged' END AS change_type
      | FROM snap_a FULL OUTER JOIN snap_b ON snap_a.customer_id = snap_b.customer_id)
      |SELECT customer_id, change_type, old_date, old_status, new_date, new_status
      |FROM d WHERE change_type <> 'unchanged' ORDER BY customer_id""".stripMargin

  def rfmSql: String =
    """WITH per AS (
      | SELECT o_custkey AS customer_id,
      |  max(CAST(o_orderdate AS DATE)) AS last_order,
      |  count(*) AS frequency,
      |  CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS monetary_cents
      | FROM orders GROUP BY 1),
      |mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS max_d FROM orders),
      |scored AS (
      | SELECT customer_id,
      |  CAST(date_diff('day', last_order, max_d) AS INTEGER) AS recency_days,
      |  frequency, monetary_cents,
      |  CAST(ntile(4) OVER (ORDER BY date_diff('day', last_order, max_d) DESC, customer_id) AS INTEGER) AS r_score,
      |  CAST(ntile(4) OVER (ORDER BY frequency, customer_id) AS INTEGER) AS f_score,
      |  CAST(ntile(4) OVER (ORDER BY monetary_cents, customer_id) AS INTEGER) AS m_score
      | FROM per CROSS JOIN mx)
      |SELECT customer_id, recency_days, frequency, monetary_cents,
      | r_score, f_score, m_score,
      | CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR) AS rfm,
      | CASE WHEN r_score >= 3 AND f_score >= 3 AND m_score >= 3 THEN 'champion'
      |      WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk_loyal'
      |      WHEN r_score >= 3 AND f_score <= 2 THEN 'new_or_promising'
      |      ELSE 'hibernating' END AS segment
      |FROM scored ORDER BY customer_id""".stripMargin

  /** Cutoff splitting "dim as loaded" from "late facts" for
    * [[lateDim]] — chosen so both sides are non-trivial at every SF.
    */
  val LateDimCutoff = "1996-01-01"

  /** etl_late_dim — LATE-ARRIVING DIMENSION handling, the star-schema
    * failure mode the reference's truncate-and-reload sidesteps but a
    * continuously-loaded warehouse cannot: fact rows referencing a
    * dimension key the dim table hasn't seen yet. The Kimball answer,
    * expressed as one plan: facts anti-joined against the dim mint an
    * INFERRED member per unknown key (attributes defaulted, flagged
    * inferred=true, so the FK constraint holds and the fact load never
    * blocks), and when the real attribute row later arrives the
    * inferred member is RESOLVED in place (SCD1 overwrite keyed on the
    * natural key — here the customer master standing in for the
    * late-arriving attribute feed). Output is the post-resolution dim
    * state: every member with its provenance (loaded / inferred /
    * resolved) — the audit a warehouse team actually queries.
    *
    * Shape at scale: one key-keyed anti-join (unknown keys), one
    * distinct over the late facts' keys (bounded by dim cardinality,
    * not fact volume), one left join for resolution. No window, no
    * global sort; every join keys on the dim natural key.
    * Output: (customer_id, segment, provenance) + per-provenance
    * rollup is left to the consumer; rows are the dim itself.
    */
  def lateDimOn(c: DataFrame, o: DataFrame, cutoff: String): DataFrame = {
    // dim as of the last load: customers who ordered before the cutoff
    val dim = c.join(
        o.filter(col("o_orderdate") < lit(cutoff))
          .select(col("o_custkey")).distinct(),
        c("c_custkey") === col("o_custkey"))
      .select(col("c_custkey").as("customer_id"),
        col("c_mktsegment").as("segment"), lit("loaded").as("provenance"))
    // late facts: orders at/after the cutoff; unknown keys mint members
    val lateKeys = o.filter(col("o_orderdate") >= lit(cutoff))
      .select(col("o_custkey").as("customer_id")).distinct()
    val inferred = lateKeys.join(dim, Seq("customer_id"), "left_anti")
    // resolution feed: the customer master (late attribute arrival)
    val resolved = inferred.join(
        c.select(col("c_custkey").as("customer_id"),
          col("c_mktsegment").as("m_segment")),
        Seq("customer_id"), "left")
      .select(col("customer_id"),
        coalesce(col("m_segment"), lit("<unknown>")).as("segment"),
        when(col("m_segment").isNotNull, lit("resolved"))
          .otherwise(lit("inferred")).as("provenance"))
    dim.unionAll(resolved).transform(graft.util.Cols.verifySort(_, col("customer_id")))
  }

  /** etl_late_dim testdata binding. */
  def lateDim(spark: SparkSession, sfDir: String): DataFrame =
    lateDimOn(Tables.customer(spark, sfDir), Tables.orders(spark, sfDir),
      LateDimCutoff)

  /** etl_fact_accumulating — the Kimball ACCUMULATING-SNAPSHOT fact,
    * completing the fact-table trilogy the star schema teaches
    * (transaction grain = [[factBuild]], periodic snapshot =
    * TimeSeries.concurrency/activeUsers forms, accumulating = this):
    * one row per order carrying its lifecycle MILESTONES — placed,
    * first ship, last ship (the milestones the testdata carries; a
    * richer schema adds commit/receipt the same way) — and the lag
    * columns a fulfillment dashboard actually plots (placed→first
    * ship, the fulfillment window, total cycle). In a live warehouse this row is
    * UPDATED as milestones land (the MERGE-on-natural-key pattern
    * [[scd1Merge]]/TxTable.merge already provide); the query states
    * the post-update truth, which is the oracle-checkable contract.
    *
    * Shape at scale: one (orderkey)-keyed aggregate over lineitem
    * (map-side combined) + one co-keyed join to orders — both on the
    * natural key, no window, no global sort. Integer day lags.
    * Output: (order_id, order_date, first_ship, last_ship, n_lines,
    * ship_lag_days, fulfill_days, cycle_days).
    */
  def factAccumulating(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("order_id"),
        col("o_orderdate").cast("date").as("order_date"))
    val m = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey").as("order_id"))
      .agg(min(col("l_shipdate")).cast("date").as("first_ship"),
        max(col("l_shipdate")).cast("date").as("last_ship"),
        count(lit(1)).as("n_lines"))
    o.join(m, Seq("order_id"))
      .withColumn("ship_lag_days",
        datediff(col("first_ship"), col("order_date")).cast("long"))
      .withColumn("fulfill_days",
        datediff(col("last_ship"), col("first_ship")).cast("long"))
      .withColumn("cycle_days",
        datediff(col("last_ship"), col("order_date")).cast("long"))
      // one row per ORDER: data-scaled output, order has no semantics —
      // verify-only canonical sort, skipped in the measured plan
      .transform(Cols.verifySort(_, col("order_id")))
  }

  def factAccumulatingSql: String =
    """WITH m AS (
      | SELECT l_orderkey AS order_id,
      |  CAST(min(l_shipdate) AS DATE) AS first_ship,
      |  CAST(max(l_shipdate) AS DATE) AS last_ship,
      |  count(*) AS n_lines
      | FROM lineitem GROUP BY 1)
      |SELECT o.o_orderkey AS order_id, CAST(o.o_orderdate AS DATE) AS order_date,
      | first_ship, last_ship, n_lines,
      | CAST(date_diff('day', CAST(o.o_orderdate AS DATE), first_ship) AS BIGINT) AS ship_lag_days,
      | CAST(date_diff('day', first_ship, last_ship) AS BIGINT) AS fulfill_days,
      | CAST(date_diff('day', CAST(o.o_orderdate AS DATE), last_ship) AS BIGINT) AS cycle_days
      |FROM orders o JOIN m ON o.o_orderkey = m.order_id
      |ORDER BY order_id""".stripMargin

  def lateDimSql: String =
    s"""WITH dim AS (
       | SELECT c_custkey AS customer_id, c_mktsegment AS segment,
       |  'loaded' AS provenance
       | FROM customer WHERE c_custkey IN (
       |   SELECT o_custkey FROM orders WHERE o_orderdate < DATE '$LateDimCutoff')),
       |late AS (SELECT DISTINCT o_custkey AS customer_id FROM orders
       |         WHERE o_orderdate >= DATE '$LateDimCutoff'),
       |unknown AS (SELECT customer_id FROM late
       |            WHERE customer_id NOT IN (SELECT customer_id FROM dim)),
       |res AS (SELECT u.customer_id,
       |         coalesce(c.c_mktsegment, '<unknown>') AS segment,
       |         CASE WHEN c.c_custkey IS NOT NULL THEN 'resolved'
       |              ELSE 'inferred' END AS provenance
       |        FROM unknown u LEFT JOIN customer c ON u.customer_id = c.c_custkey)
       |SELECT * FROM dim UNION ALL SELECT * FROM res ORDER BY customer_id""".stripMargin
}
