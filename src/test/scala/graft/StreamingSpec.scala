package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.streaming.{Ev, SessionOut}

/** True Structured Streaming runs: memory source → operator → memory
  * sink, drained synchronously with processAllAvailable.
  */
class StreamingSpec extends SparkSpecBase {

  test("streaming window agg matches the batch form on the same data") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val batch = graft.util.Tables.events(spark, SfDir)
      .select("ts", "event_type", "value")
    val data = batch.collect()

    val src = MemoryStream[(java.sql.Timestamp, String, Double)]
    src.addData(data.map(r => (
      new java.sql.Timestamp(r.getAs[java.sql.Timestamp]("ts").getTime),
      r.getAs[String]("event_type"), r.getAs[Double]("value"))).toSeq)
    val streamDf = src.toDF().toDF("ts", "event_type", "value")

    val q = EventStreams.windowAggStream(streamDf)
      .writeStream.format("memory").queryName("win_out").outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }

    // append mode only emits watermark-closed windows; with a finite batch
    // the final window stays open, so compare on the closed prefix
    val got = spark.table("win_out")
    val want = EventStreams.windowAgg(spark, SfDir)
    assert(got.count() > 0, "streaming emitted no closed windows")
    val g = got.select(col("window_start"), col("event_type"), col("n_events")).collect()
      .map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
    val w = want.select(col("window_start"), col("event_type"), col("n_events")).collect()
      .map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(g.subsetOf(w), s"streaming rows diverge from batch: ${g.diff(w).take(3)}")
  }

  test("latenessAudit surfaces watermark-dropped rows and state size per trigger") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(java.sql.Timestamp, String, Double)]
    def ts(min: Long) = java.sql.Timestamp.valueOf(
      f"2024-03-01 ${10 + min / 60}%02d:${min % 60}%02d:00")
    val streamDf = src.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.windowAggStream(streamDf)
      .writeStream.format("memory").queryName("late_out").outputMode("append").start()
    try {
      // batch 1: establish event time at minute 120
      src.addData((ts(120), "click", 1.0))
      q.processAllAvailable()
      // batch 2: advance the watermark well past minute 10 (wm = max - 30min)
      src.addData((ts(180), "click", 1.0))
      q.processAllAvailable()
      // batch 3: a row 2+ hours older than the watermark — must be DROPPED
      src.addData((ts(10), "click", 1.0))
      q.processAllAvailable()
      val audit = EventStreams.latenessAudit(spark, q).orderBy(col("batch_id"))
      val rows = audit.collect()
      assert(rows.nonEmpty, "no progress reports captured")
      assert(rows.map(_.getAs[Long]("dropped_by_watermark")).sum >= 1L,
        s"late row not counted as dropped:\n${rows.mkString("\n")}")
      assert(rows.exists(_.getAs[String]("watermark").nonEmpty),
        "watermark position never surfaced")
      assert(rows.exists(_.getAs[Long]("state_rows") > 0),
        "state size never surfaced")
    } finally q.stop()
  }

  test("watermark auto-sizing: the recommended delay loses no rows, an undersized one drops them") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def t(min: Long, sec: Long = 0) = java.sql.Timestamp.valueOf(
      f"2024-03-01 ${10 + min / 60}%02d:${min % 60}%02d:$sec%02d")
    // planted disorder (arrival order = event_id): event 4 arrives
    // carrying an event time 35 s BEHIND the max-seen (ev3 at
    // 10:01:10) — late enough that its 1-minute window [10:00, 10:01)
    // is already EXPIRED under an undersized 5 s watermark (wm
    // 10:01:05 >= window end) but alive under the sized one. All
    // other arrivals carry ascending event times (watermarks are
    // GLOBAL, so the plant keeps cross-user arrival order clean).
    val planted = (
      Seq((1L, 1L, t(0)), (2L, 2L, t(0, 30)), (1L, 3L, t(1, 10)),
        (1L, 4L, t(0, 35)), // 35 s behind the stream max
        (2L, 5L, t(1, 30))) ++
        (6L to 30L).map(i => (2L, i, t(i))))
      .toDF("user_id", "event_id", "ts")
    val rec = graft.operators.TimeSeries
      .watermarkRecommendOn(planted, "user_id", "ts", "event_id").head()
    assert(rec.getAs[Long]("max_sec") == 35L, s"planted disorder: $rec")
    assert(rec.getAs[Long]("p99_sec") == 35L, s"p99 over 30 events: $rec")
    val recSec = rec.getAs[Long]("recommended_watermark_sec")
    assert(recSec == 40L, s"35 s p99 must round up to the 10 s grid: $rec")

    // wire the recommendation into a live stream: count per 1-minute
    // window under (a) the recommended watermark, (b) an undersized 5 s
    def run(delaySec: Long, name: String): Long = {
      val src = MemoryStream[(Long, java.sql.Timestamp)]
      val q = src.toDF().toDF("user_id", "ts")
        .withWatermark("ts", s"$delaySec seconds")
        .groupBy(window(col("ts"), "1 minute")).agg(count(lit(1)))
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        // arrival order = event_id order, one batch per event: the
        // watermark advances between arrivals exactly as in production
        val rows = planted.orderBy("event_id").collect()
          .map(r => (r.getLong(0), r.getTimestamp(2)))
        rows.foreach { r => src.addData(r); q.processAllAvailable() }
        EventStreams.latenessAudit(spark, q)
          .agg(sum(col("dropped_by_watermark"))).head().getLong(0)
      } finally q.stop()
    }
    assert(run(5L, "wm_under") >= 1L,
      "undersized watermark must drop the 35 s-late event")
    assert(run(recSec, "wm_sized") == 0L,
      "the auto-sized watermark must lose nothing on the stream it was sized from")
  }

  test("sessionConversionOn: sessions count on their entry day, conversion flag per session") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: one session spanning midnight (23:50 -> 00:05 next day),
    // with a purchase — counts ONCE on day 1, converted;
    // user 2: a click-only session on day 2 — not converted
    val ev = Seq(
      (1L, 10L, t("2024-03-01 23:50:00"), "click"),
      (1L, 11L, t("2024-03-02 00:05:00"), "purchase"),
      (2L, 12L, t("2024-03-02 09:00:00"), "click"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = EventStreams.sessionConversionOn(ev, 30)
      .orderBy("day_ord").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L, 1000000L), (1L, 0L, 0L)),
      s"got ${got.toSeq}")
  }

  test("sessionNativeOn boundary: exactly gap later merges, one microsecond beyond splits") {
    import spark.implicits._
    // measured session_window semantics: per-event windows [ts, ts+gap]
    // merge when their CLOSED ends touch — diff == gap still merges
    // (same split rule as the lag form's diff > gap), diff == gap + 1us
    // splits
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-03-01 10:00:00"), 1.0), (1L, t("2024-03-01 10:30:00"), 2.0),
      (2L, t("2024-03-01 10:00:00"), 1.0), (2L, t("2024-03-01 10:30:00.000001"), 2.0))
      .toDF("user_id", "ts", "value")
    val got = EventStreams.sessionNativeOn(ev, 30)
      .orderBy("user_id", "start_us").collect()
    assert(got.length == 3)
    assert(got(0).getAs[Long]("n_events") == 2L, "30:00 successor must merge")
    assert(got(1).getAs[Long]("n_events") == 1L, "30:00.000001 successor must split")
    assert(got(2).getAs[Long]("n_events") == 1L)
    // window close = last event + gap, exact micros
    assert(got(0).getAs[Long]("end_us") ==
      got(0).getAs[Long]("start_us") + (30 * 60 + 30 * 60) * 1000000L)
    assert(got(2).getAs[Long]("start_us") % 1000000L == 1L, "micros must survive")
  }

  test("streaming native session window matches the batch form on the same data") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // feed epoch MICROS through the stream and rebuild the timestamp
    // inside the query — java.sql.Timestamp round-trips via getTime
    // (millis) would silently truncate the sub-millisecond precision
    // that session boundaries compare on
    val batch = graft.util.Tables.events(spark, SfDir)
      .select("user_id", "ts", "value")
    val data = batch.select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect()
    val src = MemoryStream[(Long, Long, Double)]
    src.addData(data.map(r => (r.getAs[Long]("user_id"),
      r.getAs[Long]("us"), r.getAs[Double]("value"))).toSeq)
    val streamDf = src.toDF().toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("value"))
    val q = EventStreams.sessionNativeStream(streamDf)
      .writeStream.format("memory").queryName("sess_native_out")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    // append mode emits only watermark-closed sessions; compare the
    // closed prefix against the batch form (identical output shape)
    val got = spark.table("sess_native_out")
    assert(got.count() > 0, "streaming emitted no closed sessions")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
        r.getAs[Long]("end_us"), r.getAs[Long]("n_events"))
    val g = got.collect().map(key).toSet
    val w = EventStreams.sessionNativeOn(batch, 30).collect().map(key).toSet
    assert(g.subsetOf(w), s"streaming sessions diverge from batch: ${g.diff(w).take(3)}")
  }

  test("streaming sessionization closes sessions on gap timeout") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[Ev]
    val q = EventStreams.sessionizeStream(src.toDS())
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      // two sessions for user 1 (gap > 30min), one for user 2; base is
      // away from epoch 0 — rows at exactly the initial watermark (0)
      // are dropped as late
      val B = 1_000_000_000_000L
      src.addData(Ev(1, B, 1.0), Ev(1, B + 60_000_000L, 2.0),
        Ev(1, B + 4_000_000_000L, 3.0), Ev(2, B, 5.0))
      q.processAllAvailable()
      val closed = spark.table("sess_out").as[SessionOut].collect()
      // the first session of user 1 closed by the in-batch gap
      assert(closed.exists(s => s.user_id == 1 && s.n_events == 2 && s.total_value == 3.0),
        s"expected user 1's first session closed, got ${closed.mkString(";")}")
    } finally q.stop()
  }

  test("native session_window refuses update mode — the engine boundary the fMGWS twin exists for") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // Spark supports session_window aggregation only in APPEND mode;
    // pin the refusal so a future Spark that lifts it surfaces here
    // (and the update-mode path below stops being the only route)
    val src = MemoryStream[(Long, Long, Double)]
    val streamDf = src.toDF().toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("value"))
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      EventStreams.sessionNativeStream(streamDf)
        .writeStream.format("memory").queryName("sess_native_upd_refused")
        .outputMode("update").start()
    }
    assert(ex.getMessage.toLowerCase.contains("session window") ||
      ex.getMessage.toLowerCase.contains("update"), ex.getMessage)
  }

  test("sessionize UPDATE mode: per-trigger open-session snapshots converge to the batch islands") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[Ev]
    val q = EventStreams.sessionizeUpdateStream(src.toDS())
      .writeStream.format("memory").queryName("sess_upd_out")
      .outputMode("update").start()
    try {
      val B = 1_000_000_000_000L
      val M = 60L * 1000000L
      // trigger 1: open session (n=1); trigger 2: same session grows
      // (n=2); trigger 3: 35min gap closes it (final) and opens a new
      // one (n=1 snapshot)
      src.addData(Ev(1, B, 1.0)); q.processAllAvailable()
      src.addData(Ev(1, B + 10 * M, 2.0)); q.processAllAvailable()
      src.addData(Ev(1, B + 45 * M, 5.0)); q.processAllAvailable()
      val rows = spark.table("sess_upd_out")
        .as[graft.streaming.SessionUpd].collect()
      // growth is visible: both the n=1 and n=2 snapshots of session 1
      // were emitted as non-final updates
      assert(rows.exists(r => !r.is_final && r.start_us == B && r.n_events == 1))
      assert(rows.exists(r => !r.is_final && r.start_us == B && r.n_events == 2
        && r.total_value == 3.0))
      // the gap closed session 1 exactly once, as final, at its batch
      // values
      val fin = rows.filter(_.is_final)
      assert(fin.toSeq == Seq(graft.streaming.SessionUpd(1, 2, B, B + 10 * M, 3.0, true)),
        fin.mkString(";"))
      // the open tail snapshot is the new session
      assert(rows.exists(r => !r.is_final && r.start_us == B + 45 * M && r.n_events == 1))
      // final picture (closed finals + latest open snapshots) ==
      // the batch gap-islands on the same data
      val batchSessions = EventStreams.sessionizeOn(
        Seq((1L, 1L, B, 1.0), (1L, 2L, B + 10 * M, 2.0), (1L, 3L, B + 45 * M, 5.0))
          .toDF("user_id", "event_id", "us", "value")
          .select(col("user_id"), col("event_id"),
            timestamp_micros(col("us")).as("ts"), col("value")),
        30).collect()
      assert(batchSessions.length == 2, batchSessions.mkString(";"))
    } finally q.stop()
  }

  test("streaming dedup drops in-watermark duplicates") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(java.sql.Timestamp, Long, String)]
    val streamDf = src.toDF().toDF("ts", "user_id", "event_type")
    val q = EventStreams.dedupStream(streamDf)
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      val t = new java.sql.Timestamp(3_000_000_000_000L)
      src.addData((t, 1L, "click"), (t, 1L, "click"), (t, 2L, "click"), (t, 1L, "view"))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 3, "expected exact-duplicate row dropped")
    } finally q.stop()
  }

  test("pre-1970 events: shared minute bucket FLOORS; watermarked stream drops them as late") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the bucket expression is SHARED by dedupBatch and dedupStream, so
    // proving floor semantics once covers both keys: -1 s of epoch is
    // bucket -1 (floorDiv), where a truncating div would say 0
    val pre = new java.sql.Timestamp(-1000L) // 1969-12-31T23:59:59Z
    val post = new java.sql.Timestamp(1000L)
    val buckets = Seq((pre, 9L, "click"), (post, 9L, "click"))
      .toDF("ts", "user_id", "event_type")
      .select(EventStreams.minuteBucket(col("ts")).as("b")).as[Long].collect()
    assert(buckets.toSeq == Seq(-1L, 0L), s"buckets: ${buckets.toSeq}")
    // and the engine-behavior caveat, pinned so it stays documented: the
    // initial event-time watermark is epoch 0, so a watermarked streaming
    // dedup treats pre-1970 rows as late data and emits NOTHING for them
    val src = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = EventStreams.dedupStream(src.toDF().toDF("ts", "user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup_pre_out").outputMode("append").start()
    try {
      src.addData((pre, 9L, "click"))
      q.processAllAvailable()
      assert(spark.table("dedup_pre_out").isEmpty,
        "pre-epoch rows are late vs the initial watermark and must be dropped")
    } finally q.stop()
  }

  test("streaming incremental components: state equals batch connectivity after every prefix") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Dedup
    // a 30-node chain dealt round-robin across 3 batches (so components
    // only fully merge once later batches bridge earlier fragments — the
    // worst case for an incremental design), plus a hash-random
    // background graph and an isolated pair
    val chain = (0L until 29L).map(i => (100L + i, 101L + i))
    val background = (0 until 40).map { i =>
      (((i * 1103515245L + 12345) % 50 + 50) % 50,
        ((i * 69069L + 7) % 50 + 50) % 50)
    }.filter { case (u, v) => u != v }
    val all = (chain ++ background :+ (900L, 901L)).zipWithIndex
    val batches = (0 until 3).map(k => all.filter(_._2 % 3 == k).map(_._1))
    def batchComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val p = edges.toDF("a_id", "b_id")
      val ids = p.select(col("a_id").as("id"))
        .unionByName(p.select(col("b_id").as("id"))).distinct()
      // the star-contraction variant: the 29-diameter chain exceeds the
      // frontier iteration's round cap (and its persist-only plan growth)
      Dedup.clustersPdOn(p, ids).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    var state = Seq.empty[(Long, Long)].toDF("id", "lbl")
    val src = MemoryStream[(Long, Long)]
    val q = EventStreams.componentsUpsertSink(src.toDF().toDF("u", "v"),
      load = () => state, save = d => { state = d })
    try {
      var seen = Seq.empty[(Long, Long)]
      batches.foreach { es =>
        src.addData(es: _*)
        q.processAllAvailable()
        seen ++= es
        // confluence is the whole point: after EVERY prefix the state
        // must equal the batch connectivity of the edges seen so far
        val got = state.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == batchComponents(seen),
          s"prefix of ${seen.size} edges diverged from batch connectivity")
      }
      // the dealt-out chain really did exercise cross-batch merges: all
      // 30 chain nodes share one final label
      val fin = state.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert((100L to 129L).map(fin).toSet.size == 1, "chain not fully merged")
      assert(fin(900L) == 900L && fin(901L) == 900L)
    } finally q.stop()
  }

  test("stream-stream interval join pairs clicks with in-window purchases") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val B = 4_000_000_000_000L
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    val cSrc = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val pSrc = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val q = EventStreams.intervalJoinStream(
      cSrc.toDF().toDF("click_ts", "c_user", "click_id"),
      pSrc.toDF().toDF("prc_ts", "p_user", "prc_id"))
      .writeStream.format("memory").queryName("ij_out").outputMode("append").start()
    try {
      // purchase 10 min before the click matches; 40 min before doesn't;
      // a purchase AFTER the click doesn't; other users don't
      pSrc.addData((ts(B - 600_000_000L), 1L, 100L), (ts(B - 2_400_000_000L), 1L, 101L),
        (ts(B + 60_000_000L), 1L, 102L), (ts(B - 300_000_000L), 2L, 103L))
      cSrc.addData((ts(B), 1L, 500L))
      q.processAllAvailable()
      val got = spark.table("ij_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((1L, 500L, 100L)), s"got $got")
    } finally q.stop()
  }

  test("left-outer stream-stream interval join emits unmatched clicks after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val B = 4_000_000_000_000L
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    val cSrc = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val pSrc = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val q = EventStreams.intervalJoinLeftStream(
      cSrc.toDF().toDF("click_ts", "c_user", "click_id"),
      pSrc.toDF().toDF("prc_ts", "p_user", "prc_id"))
      .writeStream.format("memory").queryName("ijl_out").outputMode("append").start()
    try {
      // user 1's click has an in-window purchase; user 2's click has
      // none — the outer row for it may only emit once the purchase
      // watermark proves no match can still arrive
      pSrc.addData((ts(B - 600_000_000L), 1L, 100L))
      cSrc.addData((ts(B), 1L, 500L), (ts(B), 2L, 501L))
      q.processAllAvailable()
      val early = spark.table("ijl_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!early.contains((2L, 501L)),
        s"outer row emitted before the watermark could prove no match: $early")
      // advance BOTH event-time watermarks far past the click windows
      pSrc.addData((ts(B + 90L * 60_000_000L), 9L, 900L))
      cSrc.addData((ts(B + 90L * 60_000_000L), 9L, 901L))
      q.processAllAvailable()
      // one more cycle so the new watermark value takes effect on state
      pSrc.addData((ts(B + 91L * 60_000_000L), 9L, 902L))
      cSrc.addData((ts(B + 91L * 60_000_000L), 9L, 903L))
      q.processAllAvailable()
      val rows = spark.table("ijl_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      assert(rows.contains((1L, 500L, 100L)), s"matched row missing: ${rows.toSeq}")
      assert(rows.contains((2L, 501L, -1L)),
        s"unmatched click never emitted its null-purchase row: ${rows.toSeq}")
    } finally q.stop()
  }

  test("foreachBatch SCD1 upsert keeps the latest state per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(Long, Long, String)]
    val updates = src.toDF().toDF("custkey", "ver", "status")
    var dim = Seq.empty[(Long, Long, String)].toDF("custkey", "ver", "status")
    val q = EventStreams.scd1UpsertSink(updates, "custkey", "ver",
      load = () => dim, save = d => dim = d.collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2))).toDF("custkey", "ver", "status"))
    try {
      src.addData((1L, 10L, "new"), (2L, 10L, "new"))
      q.processAllAvailable()
      src.addData((1L, 20L, "gold"), (3L, 20L, "new"))
      q.processAllAvailable()
      val state = dim.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      assert(state == Map(1L -> (20L, "gold"), 2L -> (10L, "new"), 3L -> (20L, "new")))
    } finally q.stop()
  }

  test("foreachBatch SCD1 upsert maintains a real JDBC warehouse dim across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val home = java.nio.file.Files.createTempDirectory("graft_derby_stream").toString
    System.setProperty("derby.system.home", home)
    val url = s"jdbc:derby:$home/dwh;create=true"
    val driver = Some("org.apache.derby.jdbc.EmbeddedDriver")
    // seed the warehouse table with the initial dim load
    graft.sources.JdbcSink.loadTable(
      Seq((1L, 5L, "old"), (2L, 5L, "old")).toDF("custkey", "ver", "status"),
      url, "dim_stream", org.apache.spark.sql.SaveMode.Overwrite, driver)
    val src = MemoryStream[(Long, Long, String)]
    val q = EventStreams.scd1JdbcUpsertSink(
      src.toDF().toDF("custkey", "ver", "status"), "custkey", "ver", url, "dim_stream", driver)
    try {
      src.addData((1L, 10L, "new"), (3L, 10L, "new"))
      q.processAllAvailable()
      src.addData((1L, 20L, "gold"))
      q.processAllAvailable()
      val state = graft.sources.JdbcSink.readTable(spark, url, "dim_stream", driver)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      assert(state == Map(1L -> (20L, "gold"), 2L -> (5L, "old"), 3L -> (10L, "new")),
        s"warehouse dim diverged: $state")
    } finally q.stop()
  }

  test("restart from checkpoint: file-source stream neither loses nor duplicates rows") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val (in, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    def startQuery() = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType))))
      .parquet(in)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    (1L to 100L).map(i => (i, i * 1.5)).toDF("id", "v").write.parquet(in)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    // "process restart": a NEW query from the same checkpoint; new files land meanwhile
    (101L to 150L).map(i => (i, i * 1.5)).toDF("id", "v")
      .write.mode("append").parquet(in)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val ids = spark.read.parquet(out).select("id").collect().map(_.getLong(0))
    assert(ids.length == 150, s"expected exactly-once 150 rows, got ${ids.length}")
    assert(ids.toSet == (1L to 150L).toSet, "lost or duplicated rows across restart")
  }

  test("stream-static enrichment join: streaming events pick up dim attributes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the standard streaming-enrichment shape: an unbounded stream
    // joined to a static (batch) dimension — re-read per micro-batch,
    // broadcast when small, no stream-stream state at all
    val dim = spark.read.parquet(s"$SfDir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val src = MemoryStream[(Long, Double)]
    val enriched = src.toDF().toDF("custkey", "amount")
      .join(dim, col("custkey") === col("c_custkey"))
      .select(col("custkey"), col("amount"), col("c_mktsegment"))
    val q = enriched.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      src.addData((1L, 10.0), (2L, 20.0), (999999999L, 5.0)) // last key not in dim
      q.processAllAvailable()
      val got = spark.table("enrich_out").collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
      val want = dim.filter(col("c_custkey").isin(1L, 2L)).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == want, s"enrichment diverged: $got vs $want")
    } finally q.stop()
  }

  test("custom TopKAgg aggregate runs in a streaming aggregation (complete mode)") {
    // the bounded-heap aggregate's state is mergeable, so it composes
    // with streaming state like any built-in: per-key top-k over an
    // unbounded stream with O(k) state per key
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(String, Long)]
    val agg = src.toDF().toDF("k", "v")
      .groupBy("k").agg(graft.functions.TopKAgg.column(col("v"), 2).as("top"))
    val q = agg.writeStream.format("memory").queryName("topk_out")
      .outputMode("complete").start()
    try {
      src.addData(("a", 5L), ("a", 9L), ("b", 1L))
      q.processAllAvailable()
      src.addData(("a", 7L), ("b", 4L)) // state must merge across batches
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("topk_out").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a") == Seq(9L, 7L), s"got ${got("a")}")
    assert(got("b") == Seq(4L, 1L), s"got ${got("b")}")
  }

  test("stream-static ANTI join: streaming docs dedup against the snapshot corpus") {
    // the streaming form of cross-corpus dedup: each micro-batch drops
    // docs whose exact fingerprint already exists in the (static)
    // training snapshot — per-batch snapshot probe, zero stream state
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val snapshot = Seq("known doc one", "known doc two").toDF("text")
      .select(graft.functions.TextFns.charFold(col("text")).as("fp"))
    val src = MemoryStream[(Long, String)]
    val stream = src.toDF().toDF("doc_id", "text")
      .withColumn("fp", graft.functions.TextFns.charFold(col("text")))
      .join(snapshot, Seq("fp"), "left_anti")
    val q = stream.writeStream.format("memory").queryName("anti_out")
      .outputMode("append").start()
    try {
      src.addData((1L, "known doc one"), (2L, "fresh document"), (3L, "known doc two"))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("anti_out").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L), s"snapshot members must drop: kept $kept")
  }

  test("stream-static NEAR-dup: banded-minhash flags vs the snapshot equal the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // snapshot docs vs a stream carrying one near-copy (one word
    // swapped), one exact copy, and one unrelated doc — delivered
    // across TWO micro-batches to prove the per-batch probe composes
    // long docs so a one-word swap stays at shingle-Jaccard ~0.9 — a
    // 14-token doc with one swap sits near 0.6, where 4x4 banding
    // only catches ~43% of pairs (batch and stream agreed on the miss)
    val snapA = "the quick brown fox jumps over the lazy dog again and again every day " +
      "while the patient heron waits beside the quiet river watching silver fish " +
      "drift slowly past the mossy stones under the fading autumn light"
    val snapB = "pack my box with five dozen liquor jugs before the long winter arrives " +
      "and stack the cellar shelves with preserves candles rope and sturdy boots " +
      "so the household weathers every storm the dark season brings"
    val snapshot = Seq((100L, snapA), (101L, snapB)).toDF("doc_id", "text")
    val nearA = snapA.replace("lazy", "sleepy")
    val fresh = "completely unrelated content about spark catalyst expression codegen internals"
    val src = MemoryStream[(Long, String)]
    val out = EventStreams.nearDupFlagStream(
      src.toDF().toDF("doc_id", "text"), snapshot, 0.5)
    val q = out.writeStream.format("memory").queryName("near_dup_out")
      .outputMode("append").start()
    try {
      src.addData((1L, nearA), (2L, fresh))
      q.processAllAvailable()
      src.addData((3L, snapB))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("near_dup_out")
      .select("new_id", "snap_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.operators.Training.crossCorpusOn(
        Seq((1L, nearA), (2L, fresh), (3L, snapB)).toDF("doc_id", "text"),
        snapshot, "doc_id", "text", 0.5)
      .select("new_id", "snap_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch, s"stream $streamed != batch $batch")
    assert(streamed.contains((1L, 100L)), "the near-copy must flag against its snapshot source")
    assert(streamed.contains((3L, 101L)), "the exact copy must flag")
    assert(!streamed.exists(_._1 == 2L), "the unrelated doc must not flag")
  }

  test("streaming quality gate routes every row to exactly one of good/quarantine") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_route").toString
    val src = MemoryStream[(Long, String)]
    val q = EventStreams.qualityRouteSink(
      src.toDF().toDF("doc_id", "text"),
      length(col("text")) >= 10, s"$dir/good", s"$dir/bad")
    try {
      src.addData((1L, "long enough to pass the gate"), (2L, "short"), (3L, "tiny too"))
      q.processAllAvailable()
      src.addData((4L, "second micro-batch, also long enough"))
      q.processAllAvailable()
    } finally q.stop()
    val good = spark.read.parquet(s"$dir/good").select("doc_id").as[Long].collect().toSet
    val bad = spark.read.parquet(s"$dir/bad").select("doc_id").as[Long].collect().toSet
    assert(good == Set(1L, 4L), s"good=$good")
    assert(bad == Set(2L, 3L), s"bad=$bad")
    assert((good & bad).isEmpty)
  }

  test("streaming sessionization closes idle sessions when the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[Ev]
    val q = EventStreams.sessionizeStream(src.toDS())
      .writeStream.format("memory").queryName("sess_wm_out").outputMode("append").start()
    try {
      val B = 2_000_000_000_000L
      src.addData(Ev(7, B, 1.5), Ev(7, B + 10_000_000L, 2.5))
      q.processAllAvailable()
      assert(spark.table("sess_wm_out").count() == 0, "session closed too early")
      // a later event from ANOTHER user advances the watermark past
      // user 7's last event + 30min gap + 30min watermark delay
      src.addData(Ev(8, B + 8_000_000_000L, 9.0))
      q.processAllAvailable()
      // one more batch so the new watermark's timeouts fire
      src.addData(Ev(8, B + 8_100_000_000L, 1.0))
      q.processAllAvailable()
      val closed = spark.table("sess_wm_out").as[SessionOut].collect()
      assert(closed.exists(s => s.user_id == 7 && s.n_events == 2 && s.total_value == 4.0),
        s"expected user 7's idle session closed by watermark, got ${closed.mkString(";")}")
    } finally q.stop()
  }

  test("streaming decontamination gate: stream-static containment equals the batch check on suspect docs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val d = graft.util.Tables.documents(spark, SfDir)
    val corpus = d.filter(col("doc_id") % 97 =!= 0)
    val eval = d.filter(col("doc_id") % 97 === 0)
    val src = MemoryStream[(Long, String, java.sql.Timestamp)]
    val batches = corpus.select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val (b1, b2) = batches.splitAt(batches.length / 2)
    val streamDocs = src.toDF().toDF("doc_id", "text", "ingest_ts")
    // batch 2 arrives an hour later: its event time advances the
    // watermark past batch 1's window, evicting batch 1's per-doc
    // state — output must still equal the batch check (each doc's
    // shingles complete within its own micro-batch)
    val t0 = 1_700_000_000_000L
    def at(rows: Array[(Long, String)], ts: Long) =
      rows.map { case (id, tx) => (id, tx, new java.sql.Timestamp(ts)) }.toSeq
    val q = graft.streaming.EventStreams
      .contaminationFlagStream(streamDocs, eval, ingestTsCol = "ingest_ts")
      .writeStream.format("memory").queryName("contam_out")
      .outputMode("update").start()
    try {
      src.addData(at(b1, t0)); q.processAllAvailable()
      src.addData(at(b2, t0 + 3_600_000L)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("contam_out")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_hit"), r.getAs[Int]("contaminated"))).toSet
    val want = graft.operators.Training
      .contaminationOn(corpus, eval, "doc_id", "text", 0.5)
      .filter(col("n_hit") > 0)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_hit"),
        if (r.getAs[Boolean]("contaminated")) 1 else 0)).toSet
    assert(got.nonEmpty, "stream gate surfaced no suspects on the planted split")
    assert(got == want,
      s"stream!=batch: missing=${want.diff(got).take(3)} extra=${got.diff(want).take(3)}")
  }

  test("streaming top-k tier: update-mode counts + snapshot upsert + serving rank equal the batch query") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val batchEvents = graft.util.Tables.events(spark, SfDir)
      .select("ts", "event_type", "value")
    val data = batchEvents.collect()
    val src = MemoryStream[(java.sql.Timestamp, String, Double)]
    // two prefix-ordered batches: the second updates windows the first
    // already emitted — the upsert path, not just the append path
    val sorted = data.sortBy(_.getAs[java.sql.Timestamp]("ts").getTime)
    val (first, second) = sorted.splitAt(sorted.length / 2)
    def tup(rows: Array[org.apache.spark.sql.Row]) = rows.map(r => (
      new java.sql.Timestamp(r.getAs[java.sql.Timestamp]("ts").getTime),
      r.getAs[String]("event_type"), r.getAs[Double]("value"))).toSeq
    val streamDf = src.toDF().toDF("ts", "event_type", "value")
    var snapshot = Seq.empty[(Long, String, Long)]
      .toDF("start_us", "event_type", "n_events")
    val q = EventStreams.countsUpsertSink(
      EventStreams.topkCountsStream(streamDf),
      load = () => snapshot, save = d => snapshot = d)
    try {
      src.addData(tup(first)); q.processAllAvailable()
      src.addData(tup(second)); q.processAllAvailable()
    } finally q.stop()
    val got = EventStreams.topkOfSnapshot(snapshot, 3)
      .collect().map(r => (r.getAs[Long]("start_us"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Int]("rk"))).toSet
    val want = EventStreams.topkBatch(spark, SfDir)
      .collect().map(r => (unixMicrosOf(r.getAs[java.sql.Timestamp]("window_start")),
        r.getAs[String]("event_type"), r.getAs[Long]("n_events"), r.getAs[Int]("rk"))).toSet
    assert(got == want,
      s"stream!=batch: missing=${want.diff(got).take(3)} extra=${got.diff(want).take(3)}")
  }

  private def unixMicrosOf(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000
}
