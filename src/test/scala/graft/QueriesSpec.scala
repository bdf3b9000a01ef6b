package graft

import org.apache.spark.sql.functions._

/** Mechanics guard for every SparkEntry query: runs at sf0.001, checks
  * non-degenerate output and key invariants. Value-level correctness is
  * the DuckDB oracle's job (tools/selfcheck.py / driver t2).
  */
class QueriesSpec extends SparkSpecBase {

  test("every declared query runs and yields a stable schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, SfDir)
      assert(df.columns.nonEmpty, s"$name: no columns")
      assert(df.count() >= 0, s"$name: failed to execute")
    }
  }

  test("every query with an oracle is declared, and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o.diff(q)}")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1 aggregates to the return-flag × line-status grid") {
    val rows = SparkEntry.queries("q1_agg")(spark, SfDir).collect()
    assert(rows.length >= 3 && rows.length <= 9)
    // sf0.001 lineitem ~6k rows; the shipdate filter keeps a bit over half
    assert(rows.map(_.getAs[Long]("count_order")).sum > 2000)
  }

  test("q9 top-k is bounded and sorted") {
    val prices = SparkEntry.queries("q9_sort_limit")(spark, SfDir)
      .collect().map(_.getAs[Double]("price"))
    assert(prices.length == 20)
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("q19 HLL sketch stays within its 5% rsd of the exact distinct") {
    SparkEntry.queries("q19_udaf_hll")(spark, SfDir).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact <= 0.15, s"approx $approx vs exact $exact")
    }
  }

  test("q28 approx percentile stays near the exact median") {
    SparkEntry.queries("q28_approx_quantile")(spark, SfDir).collect().foreach { r =>
      val approx = r.getAs[Double]("approx_median")
      val exact = r.getAs[Double]("exact_median")
      assert(math.abs(approx - exact) / exact <= 0.05, s"approx $approx vs exact $exact")
    }
  }

  test("text_scrub redacts planted PII and counts each class") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "Contact Alice.Smith@example.COM or visit https://example.com/a?b=1 today"),
      (2L, "call +1 (415) 555-0199 now"),
      (3L, "clean text with no pii at all")).toDF("doc_id", "text")
    val out = TextAnalysis.scrubOn(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("n_emails") == 1)
    assert(out(1L).getAs[Int]("n_urls") == 1)
    assert(out(2L).getAs[Int]("n_phones") == 1)
    assert(out(3L).getAs[Int]("n_emails") == 0 && out(3L).getAs[Int]("n_urls") == 0
      && out(3L).getAs[Int]("n_phones") == 0)
    // redaction really shrinks/replaces: doc 3 untouched, others changed
    assert(out(3L).getAs[Int]("scrubbed_len") == docs.filter($"doc_id" === 3).head.getString(1).length)
  }

  test("text_tfidf: corpus-wide terms rank below distinctive terms") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "common common zebra zebra zebra"),
      (2L, "common quartz"),
      (3L, "common granite granite")).toDF("doc_id", "text")
    val top1 = TextAnalysis.tfidfOn(docs, "doc_id", "text", 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // "common" appears in every doc (df=3) and never wins over a term unique to the doc
    assert(top1 == Map(1L -> "zebra", 2L -> "quartz", 3L -> "granite"))
  }

  test("dedup_keep_best keeps the highest-quality member per cluster") {
    val out = SparkEntry.queries("dedup_keep_best")(spark, SfDir).collect()
    assert(out.nonEmpty)
    // one row per cluster, keep_id is a member (trivially true for roots),
    // multi-member clusters exist on this corpus and quality is bounded
    assert(out.map(_.getAs[Long]("cluster_id")).distinct.length == out.length)
    assert(out.exists(_.getAs[Int]("n_members") > 1), "expected at least one non-trivial cluster")
    assert(out.forall(r => r.getAs[Double]("best_quality") <= 1.0))
    // the kept member never has lower quality than the cluster root it replaced
    val quality = graft.operators.TextAnalysis.qualityOn(
        graft.util.Tables.documents(spark, SfDir), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score")).toMap
    out.filter(_.getAs[Int]("n_members") > 1).foreach { r =>
      val kept = quality.getOrElse(r.getAs[Long]("keep_id"), -1.0)
      val root = quality.getOrElse(r.getAs[Long]("cluster_id"), -1.0)
      assert(kept >= root, s"cluster ${r.getAs[Long]("cluster_id")}: kept $kept < root $root")
    }
  }

  test("text_heavy_hitters: every sketched count equals the exact token count") {
    import graft.functions.TextFns
    import graft.util.Tables
    val rows = SparkEntry.queries("text_heavy_hitters")(spark, SfDir)
      .orderBy("rank").collect()
    val top = rows.toSeq.map(r => r.getAs[String]("w") -> r.getAs[Long]("approx_cnt"))
    assert(top.length == 5)
    val exact = Tables.documents(spark, SfDir)
      .select(explode(TextFns.tokenize(col("text"))).as("w"))
      .groupBy("w").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    top.foreach { case (w, c) => assert(exact(w) == c, s"$w: sketch $c vs exact ${exact(w)}") }
    // the undisputed top-1 must be found
    val exactTop = exact.maxBy { case (w, c) => (c, w) }
    assert(top.head == exactTop, s"sketch top ${top.head} vs exact $exactTop")
  }

  test("q36 merged HLL sketches stay near the exact quarterly distincts") {
    SparkEntry.queries("q36_hll_union")(spark, SfDir).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_custs").toDouble
      val exact = r.getAs[Long]("exact_custs").toDouble
      assert(math.abs(approx - exact) / exact <= 0.1,
        s"yr=${r.get(0)} q=${r.get(1)}: approx $approx vs exact $exact")
    }
  }

  test("q29: NOT IN against a null-bearing subquery matches no rows") {
    val r = SparkEntry.queries("q29_not_in_null")(spark, SfDir).head()
    assert(r.getAs[Long]("n_not_in_with_null") == 0L)
    assert(r.getAs[Long]("n_not_exists") == r.getAs[Long]("n_not_in_clean"))
    assert(r.getAs[Long]("n_not_exists") > 0L)
  }

  test("etl_fact_build: sentinel dim ids appear for filtered-out members") {
    val f = SparkEntry.queries("etl_fact_build")(spark, SfDir)
    assert(f.filter(col("customer_dim_id") === 0L).count() > 0, "no sentinel customers")
    assert(f.filter(col("product_dim_id") === 0L).count() > 0, "no sentinel products")
    assert(f.filter(col("customer_dim_id") =!= 0L).count() > 0)
  }

  test("etl_dim_dates covers the reference range with ISO calendar") {
    val d = SparkEntry.queries("etl_dim_dates")(spark, SfDir).collect()
    assert(d.length == 1462) // 2008-01-01..2012-01-01 inclusive (leap years 2008
    val first = d.head       // and 2012)
    assert(first.getAs[Int]("date_dim_id") == 20080101)
    assert(first.getAs[Int]("day_of_week") == 2) // 2008-01-01 was a Tuesday
  }
}
