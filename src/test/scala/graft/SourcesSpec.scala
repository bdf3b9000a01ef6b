package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, RetailEtl}

/** Source/sink coverage (SURVEY.md §2.E): partitioned parquet DWH load,
  * csv/json round-trips, multimodal decode plumbing.
  */
class SourcesSpec extends SparkSpecBase {

  test("DWH load: fact table written partitioned by date survives round-trip") {
    val out = Files.createTempDirectory("graft_dwh").toString
    val fact = RetailEtl.factBuild(spark, SfDir)
      .withColumn("ship_month", (col("date_dim_id") / 100).cast("int"))
    fact.write.mode("overwrite").partitionBy("ship_month").parquet(s"$out/fct_invoices")
    val back = spark.read.parquet(s"$out/fct_invoices")
    assert(back.count() == fact.count())
    // partition pruning: one month selected reads a subset
    val months = back.select("ship_month").distinct().count()
    assert(months > 1, "expected multiple month partitions")
  }

  test("schema evolution: mergeSchema reads mixed-version parquet") {
    val out = Files.createTempDirectory("graft_evo").toString
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$out/t/v=1")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score").write.parquet(s"$out/t/v=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$out/t")
    assert(merged.columns.toSet == Set("id", "name", "score", "v"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score")), "old rows null-fill new columns")
    assert(rows(1).getDouble(rows(1).fieldIndex("score")) == 9.5)
  }

  test("orc round-trip preserves values") {
    val out = Files.createTempDirectory("graft_orc").toString
    val dim = RetailEtl.scd1Products(spark, SfDir)
    dim.write.mode("overwrite").orc(s"$out/orc")
    val back = spark.read.orc(s"$out/orc")
    assert(back.count() == dim.count())
    assert(back.agg(sum(col("stock_code"))).head.getLong(0)
      == dim.agg(sum(col("stock_code"))).head.getLong(0))
  }

  test("csv and json round-trips preserve row counts and values") {
    val out = Files.createTempDirectory("graft_io").toString
    val dim = RetailEtl.scd1Customers(spark, SfDir)
    dim.write.mode("overwrite").option("header", "true").csv(s"$out/csv")
    dim.write.mode("overwrite").json(s"$out/json")
    val csvBack = spark.read.option("header", "true").option("inferSchema", "true").csv(s"$out/csv")
    val jsonBack = spark.read.json(s"$out/json")
    assert(csvBack.count() == dim.count())
    assert(jsonBack.count() == dim.count())
    assert(jsonBack.agg(sum(col("customer_id"))).head.getLong(0)
      == dim.agg(sum(col("customer_id"))).head.getLong(0))
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    // external tables via option("path"): the static warehouse dir is
    // never touched
    val wh = Files.createTempDirectory("graft_wh").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.read.parquet(s"$SfDir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    spark.read.parquet(s"$SfDir/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("qty"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: the join itself needs no shuffle — the only exchange
    // allowed is the post-join aggregation's
    val joinSide = plan.split("HashAggregate").last
    assert(!joinSide.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed join still shuffles:\n$plan")
    // same answer as the plain (non-bucketed) join
    val direct = spark.read.parquet(s"$SfDir/lineitem.parquet")
      .join(spark.read.parquet(s"$SfDir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("qty"))
    assert(joined.orderBy("o_orderpriority").collect().toSeq
      == direct.orderBy("o_orderpriority").collect().toSeq)
  }

  test("streaming from a file source matches the batch window aggregation") {
    import graft.streaming.EventStreams
    val dir = Files.createTempDirectory("graft_stream_src").toString
    val batch = spark.read.parquet(s"$SfDir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .select("ts", "event_type", "value")
    batch.write.mode("overwrite").parquet(s"$dir/in")
    val streamIn = spark.readStream.schema(batch.schema).parquet(s"$dir/in")
    val q = EventStreams.windowAggStream(streamIn)
      .writeStream.format("memory").queryName("file_win_out").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("file_win_out")
      .select("window_start", "event_type", "n_events").collect()
      .map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
    val want = EventStreams.windowAgg(spark, SfDir)
      .select("window_start", "event_type", "n_events").collect()
      .map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(got.nonEmpty && got.subsetOf(want),
      s"file-source streaming diverges: ${got.diff(want).take(3)}")
  }

  test("multimodal frame sampling explodes deterministic per-frame features") {
    val frames = Multimodal.sampleFrames(spark, SfDir).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 5 == 0))
    val again = Multimodal.sampleFrames(spark, SfDir).collect()
    assert(frames.sortBy(f => (f.doc_id, f.frame_idx))
      .sameElements(again.sortBy(f => (f.doc_id, f.frame_idx))))
  }

  test("multimodal decode plumbing: per-partition batch decode yields typed metadata") {
    val metas = Multimodal.decodeAll(spark, SfDir).collect()
    assert(metas.length == 500)
    assert(metas.forall(m => m.payload_len > 0 && m.width >= 16 && m.height >= 16))
    // deterministic: same input → same fake decode
    val again = Multimodal.decodeAll(spark, SfDir).collect()
    assert(metas.sortBy(_.doc_id).sameElements(again.sortBy(_.doc_id)))
  }
}
