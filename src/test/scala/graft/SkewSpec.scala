package graft

import org.apache.spark.sql.functions._

/** AQE skew handling, demonstrated and pinned: at 100 TB the join that
  * kills a job is the one where one key holds half the rows. Spark's
  * OptimizeSkewedJoin splits oversized partitions at runtime — this
  * spec forces the thresholds down to test scale and asserts the split
  * actually happens (`isSkew=true` partitions in the executed plan), so
  * a config or plan-shape regression that silently disables skew
  * handling fails CI instead of an overnight cluster run.
  */
class SkewSpec extends SparkSpecBase {

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    // one giant key (90% of rows) + a spread of small keys
    val skewed = spark.range(0, 200000)
      .select((when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 1000)).as("k"),
        col("id").as("payload"))
    val dim = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("attr"))
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val joined = skewed.join(dim, Seq("k")).groupBy(col("attr")).agg(sum(col("payload")).as("s"))
      // collect() executes THIS DataFrame's own query execution, so its
      // AdaptiveSparkPlan finalizes (count() would spawn a separate one
      // and the inspected plan would never run)
      assert(joined.collect().nonEmpty)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(plan.contains("isSkew=true") || plan.contains("skew="),
        s"AQE did not mark any skewed partition:\n$plan")
    }
  }

  test("salted aggregation spreads a skewed key across reducers and re-merges exactly") {
    // the manual fallback (q20 pattern) checked mechanically: phase-1
    // output has >1 partial row for the hot key, phase-2 equals direct
    import spark.implicits._
    val rows = (1 to 50000).map(i => (if (i % 10 != 0) "hot" else s"key${i % 97}", i.toDouble))
    val df = rows.toDF("k", "v")
    val salted = df.withColumn("salt", pmod(crc32(col("v").cast("string")), lit(16)))
      .groupBy(col("k"), col("salt")).agg(count(lit(1)).as("pc"), sum(col("v")).as("ps"))
    assert(salted.filter(col("k") === "hot").count() > 1, "hot key not spread across salts")
    val merged = salted.groupBy(col("k"))
      .agg(sum(col("pc")).as("n"), sum(col("ps")).as("s"))
    val direct = df.groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val m = merged.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    direct.collect().foreach { r =>
      assert(m(r.getString(0)) == ((r.getLong(1), r.getDouble(2))), s"key ${r.getString(0)} diverged")
    }
  }

  test("bucket-rank exact percentiles: 2 groups × 1M rows — the adversarial shape a group-keyed sort window cannot survive") {
    // the planted truth: group A holds a permutation-equivalent of
    // 1..1e6 (every rank k selects value k), group B the even numbers
    // 2..2e6 — ceil-ranks are analytic: c50 = (n+1) div 2 = 500000,
    // c90 = (9n+9) div 10 = 900000, c99 = (99n+99) div 100 = 990000
    val n = 1000000L
    val a = spark.range(n).select(lit("A").as("event_type"),
      (col("id") + 1).cast("double").as("value"))
    val b = spark.range(n).select(lit("B").as("event_type"),
      ((col("id") + 1) * 2).cast("double").as("value"))
    val got = graft.operators.Relational.percentileExactOn(a.unionByName(b))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("A") == ((500000.0, 900000.0, 990000.0)), got("A").toString)
    assert(got("B") == ((1000000.0, 1800000.0, 1980000.0)), got("B").toString)
  }

  test("bucket-rank outlier guard: one 1e15 sentinel collapses the equi-width buckets over 1M rows — the recursion still answers exactly") {
    // a permutation-equivalent of 1..1e6 plus ONE 1e15 sentinel: the
    // equi-width range stretches until bucket 0 holds every real row
    // (the r13 scale adversary) — the located/boundary buckets exceed
    // the sort cap and take the one-level recursion, whose composed
    // ranks must still be analytic
    val n = 1000000L
    val a = spark.range(n).select(lit("A").as("event_type"),
      (col("id") + 1).cast("double").as("value"))
      .unionByName(spark.range(1).select(lit("A").as("event_type"),
        lit(1.0e15).as("value")))
    val pct = graft.operators.Relational.percentileExactOn(a)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    // n' = 1000001: c50 = 500001, c90 = 900001, c99 = 990001
    assert(pct("A") == ((500001.0, 900001.0, 990001.0)), pct("A").toString)
    val tm = graft.operators.Relational.trimmedMeanOn(a)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    // trim k = 100000 each end: kept ranks (100000, 900001] = values
    // 100001..900001 → mean exactly 500001
    assert(tm("A") == ((800001L, 500001.0)), tm("A").toString)
  }

  test("bucket-rank outlier guard: sentinels at TWO magnitudes over 1M rows — fixpoint recursion keeps every sorted slice bucket-bounded (r15, VERDICT r14 #7)") {
    // body: values k/10000 for k = 1..1e6 (rank k ↔ value k/10000),
    // plus 1000 sentinels at 1e9 and ONE at 1e15. Level 0's range
    // [1e-4, 1e15] collapses body+1e9s into bucket 0; level 1's range
    // [1e-4, 1e9] STILL collapses the whole body into sub-bucket 0 —
    // exactly where the r14 one-level guard handed 1e6 rows to a single
    // sort task; level 2's range [1e-4, 100] finally spreads them
    // (~244 rows per bucket).
    val n = 1000000L
    val a = spark.range(n).select(lit("A").as("event_type"),
      ((col("id") + 1).cast("double") / 10000.0).as("value"))
      .unionByName(spark.range(1000).select(lit("A").as("event_type"),
        lit(1.0e9).as("value")))
      .unionByName(spark.range(1).select(lit("A").as("event_type"),
        lit(1.0e15).as("value")))
    // n' = 1001001: c50 = 500501, c90 = 900901, c99 = 990991 — all
    // body ranks, so the selected values are analytic
    val pct = graft.operators.Relational.percentileExactOn(a)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(pct("A") == ((500501 / 10000.0, 900901 / 10000.0, 990991 / 10000.0)),
      pct("A").toString)
    // trim k = 100100 each end: kept ranks (100100, 900901] are all
    // body values 100101..900901 → mean = 500501/10000 exactly
    val tm = graft.operators.Relational.trimmedMeanOn(a)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(tm("A")._1 == 800801L, tm("A").toString)
    assert(math.abs(tm("A")._2 - 500501 / 10000.0) < 1e-5, tm("A").toString)
  }

  test("trimmedMean at 20k group cardinality: interior buckets fold distributively, driver reads only boundary rows (r15, VERDICT r14 #6)") {
    // 20k groups × 50 values: the r14 form collected groups × 4096
    // bucket rows (82M at this cardinality); the r15 form collects ≤ 2
    // boundary buckets per group. Reference = an in-plan window trim
    // (fine HERE because every group is tiny — the device exists for
    // when they are not).
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(1000000L).select(
      concat(lit("g"), (col("id") % 20000)).as("event_type"),
      ((col("id") * 37 + 11) % 1000).cast("double").as("value"))
    val got = graft.operators.Relational.trimmedMeanOn(df)
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"))
    val ref = df.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .filter(col("rn") > expr("n div 10") && col("rn") <= col("n") - expr("n div 10"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_kept"),
        graft.util.Cols.pround(avg(col("value")), 6).as("trimmed_mean"))
    val gm = got.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getDouble(2)))).toMap
    val rm = ref.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getDouble(2)))).toMap
    assert(gm.size == 20000 && rm.size == 20000)
    rm.foreach { case (g, (nk, m)) =>
      assert(gm(g)._1 == nk, s"$g n_kept: ${gm(g)._1} vs $nk")
      assert(math.abs(gm(g)._2 - m) <= 1e-6, s"$g mean: ${gm(g)._2} vs $m")
    }
  }
}
