package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, TextAnalysis, TimeSeries, Training}

/** Value-level unit tests for the r5 batch: BPE pair counting,
  * length-bucket batching profile, 2-D skyline, and linear-interpolation
  * resampling. The DuckDB oracle covers the testdata bindings; these pin
  * the operator cores on constructed inputs where the expected output is
  * known by hand.
  */
class AnalyticsOpsSpec extends SparkSpecBase {

  test("bpePairsOn counts adjacent pairs with a deterministic tie-break") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    val rows = TextAnalysis.bpePairsOn(docs, "text", k = 10)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[String]("pair"), r.getAs[Long]("n")))
    // doc1 pairs: (a b), (b a), (a b); doc2: (b a) → both count 2,
    // "a b" < "b a" so it takes rank 1
    assert(rows.toSeq == Seq((1, "a b", 2L), (2, "b a", 2L)))
  }

  test("bpePairsOn ignores docs with fewer than two tokens") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "solo"), (3L, "  ")).toDF("doc_id", "text")
    assert(TextAnalysis.bpePairsOn(docs, "text").count() == 0)
  }

  test("lengthBucketsOn bins to the smallest fitting power of two with exact waste") {
    import spark.implicits._
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val docs = Seq((1L, words(1)), (2L, words(64)), (3L, words(65)), (4L, words(100)))
      .toDF("doc_id", "text")
    val byBucket = Training.lengthBucketsOn(docs, "text")
      .collect().map(r => r.getAs[Int]("bucket") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens"),
          r.getAs[Long]("padded_tokens"), r.getAs[Long]("waste_ppm")))).toMap
    // bucket 64: docs of 1 and 64 tokens → sum 65, padded 128,
    // waste = floor(63e6 / 128) = 492187
    assert(byBucket(64) == ((2L, 65L, 128L, 492187L)))
    // bucket 128: docs of 65 and 100 tokens → sum 165, padded 256,
    // waste = floor(91e6 / 256) = 355468
    assert(byBucket(128) == ((2L, 165L, 256L, 355468L)))
    assert(byBucket.size == 2)
  }

  test("q53 skyline matches the brute-force dominance filter") {
    val o = SparkEntry.queries("q53_skyline")(spark, SfDir)
      .collect().map(r => (r.getAs[Long]("o_orderkey"),
        r.getAs[java.sql.Date]("d").toLocalDate, r.getAs[Long]("cents")))
    val all = graft.util.Tables.orders(spark, SfDir)
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("d"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
      .collect().map(r => (r.getAs[Long]("o_orderkey"),
        r.getAs[java.sql.Date]("d").toLocalDate, r.getAs[Long]("cents")))
    val brute = all.filter { case (_, d, c) =>
      !all.exists { case (_, d2, c2) => !d2.isAfter(d) && c2 > c }
    }.sortBy(t => (t._2.toEpochDay, t._1))
    assert(o.nonEmpty && o.toSeq == brute.toSeq)
  }

  test("interpLinearOn draws exact integer lines across gaps") {
    import spark.implicits._
    val perDay = Seq(
      (1L, "2024-01-01", 100L), (1L, "2024-01-05", 500L), // even slope
      (2L, "2024-01-01", 0L), (2L, "2024-01-04", 100L)    // truncating slope
    ).toDF("user_id", "day_s", "cents")
      .select(col("user_id"), to_date(col("day_s")).as("day"), col("cents"))
    val got = TimeSeries.interpLinearOn(perDay, "user_id", "day", "cents")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("interp_cents"), r.getAs[Boolean]("is_gap")))
      .sortBy(t => (t._1, t._2))
    val expect = Seq(
      (1L, "2024-01-01", 100L, false), (1L, "2024-01-02", 200L, true),
      (1L, "2024-01-03", 300L, true), (1L, "2024-01-04", 400L, true),
      (1L, "2024-01-05", 500L, false),
      // 100/3 per day, truncated: 33, 66
      (2L, "2024-01-01", 0L, false), (2L, "2024-01-02", 33L, true),
      (2L, "2024-01-03", 66L, true), (2L, "2024-01-04", 100L, false))
    assert(got.toSeq == expect)
  }
}
