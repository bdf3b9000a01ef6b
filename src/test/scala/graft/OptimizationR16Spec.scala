package graft

import org.apache.spark.sql.functions._

/** Focused specs for the r16 optimization round's internal rewrites —
  * each one pins a changed operator's semantics against the formulation
  * it replaced (the optimization contract: same results, fewer passes).
  */
class OptimizationR16Spec extends SparkSpecBase {
  import spark.implicits._

  test("diffBothWays == exceptAll pair on multisets (duplicates, nulls, both-ways rows)") {
    // duplicates: (1,a) twice on one side, once on the other (net +1);
    // (2,b) cancels exactly; (3,c) deleted twice (net -2); a NULL row
    // groups as equal (exceptAll's null semantics); (5,e) 2-vs-1.
    val added = Seq(
      (1L, "a"), (1L, "a"), (2L, "b"), (4L, null.asInstanceOf[String]),
      (5L, "e"), (5L, "e")).toDF("k", "t")
    val removed = Seq(
      (1L, "a"), (2L, "b"), (3L, "c"), (3L, "c"),
      (4L, null.asInstanceOf[String]), (5L, "e")).toDF("k", "t")
    val expected = added.exceptAll(removed).withColumn("_c", lit("insert"))
      .unionByName(removed.exceptAll(added).withColumn("_c", lit("delete")))
      .as[(Long, String, String)].collect().sorted.toSeq
    val fused = graft.sources.TxTable.diffBothWays(added, removed, "_c")
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(fused == expected)
    // and the multiset multiplicities are right, not just the distinct set
    assert(fused.count(_ == ((1L, "a", "insert"))) == 1)
    assert(fused.count(_ == ((3L, "c", "delete"))) == 2)
    assert(!fused.exists(_._1 == 2L), "exact cancellation emits nothing")
    assert(!fused.exists(_._1 == 4L), "null rows group as equal and cancel")
    assert(fused.count(_ == ((5L, "e", "insert"))) == 1,
      "2-vs-1 duplicates net to exactly one insert")
  }

  test("diffBothWays: empty sides degenerate to pure insert / pure delete") {
    val rows = Seq((1L, "x"), (1L, "x")).toDF("k", "t")
    val empty = rows.filter(lit(false))
    val ins = graft.sources.TxTable.diffBothWays(rows, empty, "_c")
      .as[(Long, String, String)].collect().toSeq
    assert(ins.sorted == Seq((1L, "x", "insert"), (1L, "x", "insert")))
    val del = graft.sources.TxTable.diffBothWays(empty, rows, "_c")
      .as[(Long, String, String)].collect().toSeq
    assert(del.sorted == Seq((1L, "x", "delete"), (1L, "x", "delete")))
  }

  test("fanOutScan spreads an under-parallel frame and is a no-op on a parallel one") {
    val sc = spark.sparkContext
    val slim = spark.range(0, 1000).toDF("id").coalesce(1)
    val spread = graft.util.Cols.fanOutScan(slim)
    assert(spread.rdd.getNumPartitions == sc.defaultParallelism)
    // content preserved exactly (round-robin moves rows, never changes them)
    assert(spread.agg(sum(col("id")), count(lit(1))).as[(Long, Long)].head()
      == ((999L * 1000 / 2, 1000L)))
    val wide = spark.range(0, 1000).toDF("id")
      .repartition(sc.defaultParallelism + 4)
    assert(graft.util.Cols.fanOutScan(wide) eq wide,
      "an already-parallel frame passes through untouched (no added exchange)")
  }
}
