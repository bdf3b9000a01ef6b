package graft

import org.apache.spark.sql.functions._

/** Engine sketch utilities (df.stat): Bloom filter and Count-Min
  * sketch, both computed DISTRIBUTIVELY (per-partition sketches merged
  * up the tree — the mergeable-state property that makes them usable
  * over a 100 TB scan) with the driver holding only the fixed-size
  * state. Complements the oracled sketch queries (q19 HLL,
  * q28 approx quantile, q36 HLL merge, text_heavy_hitters top-k).
  */
class SketchSpec extends SparkSpecBase {

  private def docs = spark.read.parquet(s"$SfDir/documents.parquet")

  test("bloom filter over snapshot fingerprints: zero false negatives, bounded false positives") {
    // the memory-bounded fast path of cross-corpus dedup: probe new
    // fingerprints against a snapshot-side bloom before any join
    val fp = graft.operators.TextAnalysis.fingerprintOn(docs, "doc_id", "text")
    val snapshot = fp.filter(col("doc_id") % 2 === 0)
    val bf = snapshot.stat.bloomFilter("fp64", 10000L, 0.03)
    // no false negatives — every snapshot member must hit
    val members = snapshot.select("fp64").collect().map(_.getLong(0))
    assert(members.forall(bf.mightContain), "bloom filter lost a member (impossible)")
    // false-positive rate on definite non-members stays near the target
    val universe = fp.select("fp64").collect().map(_.getLong(0)).toSet
    val probes = (1L to 20000L).map(_ * 1000003L).filterNot(universe)
    val fpRate = probes.count(bf.mightContain).toDouble / probes.size
    assert(fpRate < 0.06, s"false-positive rate $fpRate vs configured 0.03")
  }

  test("count-min sketch over tokens: estimates always >= exact, within eps*N") {
    import graft.functions.TextFns
    val tokens = docs.select(explode(TextFns.tokenize(col("text"))).as("w"))
    val n = tokens.count()
    val eps = 0.001
    val cms = tokens.stat.countMinSketch(col("w"), eps, 0.99, 42)
    val exact = tokens.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    exact.foreach { case (w, c) =>
      val est = cms.estimateCount(w)
      assert(est >= c, s"CMS underestimated '$w': $est < $c (impossible)")
      assert(est <= c + (eps * n).toLong + 1,
        s"CMS error for '$w' beyond eps*N: $est vs $c (N=$n)")
    }
  }

  /** Exact values whose ranks bracket quantile p with slack ε·n: the GK
    * contract says the estimate's rank is within ±ε·n of p·n, so the
    * estimate must lie between the exact (p−ε) and (p+ε) quantiles.
    */
  private def rankBand(sorted: Array[Long], p: Double, eps: Double): (Long, Long) = {
    val n = sorted.length
    val lo = math.max(0, math.floor((p - eps) * n).toInt - 1)
    val hi = math.min(n - 1, math.ceil((p + eps) * n).toInt)
    (sorted(lo), sorted(hi))
  }

  test("q62_quantile_rollup: merged quarter estimates sit inside the GK rank-error band of the exact quantiles") {
    val rows = graft.SparkEntry.queries("q62_quantile_rollup")(spark, SfDir).collect()
    assert(rows.nonEmpty)
    val cents = spark.read.parquet(s"$SfDir/orders.parquet")
      .select(year(col("o_orderdate")).as("yr"), quarter(col("o_orderdate")).as("qtr"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("c"))
      .collect().groupBy(r => (r.getInt(0), r.getInt(1)))
      .map { case (k, rs) => k -> rs.map(_.getLong(2)).sorted }
    val eps = 1.0 / graft.functions.QuantileSketch.DefaultAccuracy
    rows.foreach { r =>
      val key = (r.getAs[Int]("yr"), r.getAs[Int]("qtr"))
      val sorted = cents(key)
      Seq(("approx_p50", 0.5), ("approx_p90", 0.9)).foreach { case (c, p) =>
        val est = r.getAs[Long](c)
        val (lo, hi) = rankBand(sorted, p, eps)
        assert(est >= lo && est <= hi,
          s"$key $c=$est outside exact rank band [$lo, $hi] (n=${sorted.length})")
      }
      // exact columns in the output really are the exact percentiles
      // (FP-interpolation tolerance: both sides interpolate in double)
      val want = percentileExact(sorted, 0.5)
      assert(math.abs(r.getAs[Double]("exact_p50") - want) <= 1e-6 * math.max(1.0, math.abs(want)),
        s"$key exact_p50=${r.getAs[Double]("exact_p50")} vs $want")
    }
  }

  /** Spark `percentile` semantics: linear interpolation at rank p·(n−1). */
  private def percentileExact(sorted: Array[Long], p: Double): Double = {
    val pos = p * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  test("quantile sketch at coarse accuracy: rank error bounded, shard-merge ≡ direct within the same band") {
    import graft.functions.QuantileSketch
    import spark.implicits._
    // 100k distinct values over 16 shards at ε = 1/20: coarse enough
    // that the sketch genuinely approximates (state ~ tens of tuples,
    // not the data), yet every queried p must stay inside ±ε rank
    val acc = 20
    val n = 100000
    val df = (1 to n).map(i => ((i % 16).toLong, i.toLong)).toDF("shard", "v")
    val sharded = df.groupBy(col("shard"))
      .agg(QuantileSketch.sketch(col("v").cast("double"), acc).as("sk"))
    val merged = sharded.agg(QuantileSketch.merge(col("sk"), acc).as("sk"))
      .select(Seq(0.1, 0.5, 0.99).map(p =>
        QuantileSketch.quantile(col("sk"), p).as(s"p$p")): _*)
      .head
    val direct = df.agg(QuantileSketch.sketch(col("v").cast("double"), acc).as("sk"))
      .select(Seq(0.1, 0.5, 0.99).map(p =>
        QuantileSketch.quantile(col("sk"), p).as(s"p$p")): _*)
      .head
    Seq(0.1, 0.5, 0.99).zipWithIndex.foreach { case (p, i) =>
      // values are 1..n, so the exact p-quantile's value IS its rank:
      // a rank-error bound reads directly off the value. Merging k
      // sketches of ε inserts adds up to ε per merge step in GK's
      // worst case — allow 2ε for the merged read, ε for the direct.
      val exact = p * n
      assert(math.abs(merged.getDouble(i) - exact) <= 2.0 * n / acc + 1,
        s"merged p$p=${merged.getDouble(i)} vs exact $exact beyond 2ε·n")
      assert(math.abs(direct.getDouble(i) - exact) <= 1.0 * n / acc + 1,
        s"direct p$p=${direct.getDouble(i)} vs exact $exact beyond ε·n")
    }
  }

  test("graft_qsketch SQL surface: sketch → merge → quantile round-trips through spark.sql") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    (1 to 1000).map(i => ((i % 4).toLong, i.toLong)).toDF("g", "v")
      .createOrReplaceTempView("qsketch_in")
    val got = spark.sql(
      """SELECT graft_qsketch_quantile(graft_qsketch_merge(sk), 0.5d) AS p50
        |FROM (SELECT g, graft_qsketch(CAST(v AS DOUBLE)) AS sk
        |      FROM qsketch_in GROUP BY g)""".stripMargin).head
    assert(math.abs(got.getDouble(0) - 500.0) <= 2.0,
      s"SQL-path p50 ${got.getDouble(0)} far from 500")
  }
}
