package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, RetailEtl}
import graft.sources.{ExternalIngest, JdbcSink, Maintenance}

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

  test("JDBC sink: dim load round-trips through an embedded Derby warehouse") {
    // reference parity: etl.py's load phase writes dims/facts via
    // df.to_sql; here the same step through df.write.jdbc against the
    // Derby embedded driver shipped with Spark
    val home = Files.createTempDirectory("graft_derby").toString
    System.setProperty("derby.system.home", home)
    val url = s"jdbc:derby:$home/dwh;create=true"
    val driver = Some("org.apache.derby.jdbc.EmbeddedDriver")
    val dim = RetailEtl.scd1Customers(spark, SfDir)
    JdbcSink.loadTable(dim, url, "dim_customers", SaveMode.Overwrite, driver)
    val back = JdbcSink.readTable(spark, url, "dim_customers", driver)
    assert(back.count() == dim.count())
    assert(back.agg(sum(col("customer_id"))).head.getLong(0)
      == dim.agg(sum(col("customer_id"))).head.getLong(0))
    // append mode doubles the rows (to_sql if_exists="append")
    RetailEtl.loadDim(dim, url, "dim_customers", SaveMode.Append, driver)
    assert(JdbcSink.readTable(spark, url, "dim_customers", driver).count() == 2 * dim.count())
    // overwrite replaces (to_sql if_exists="replace")
    RetailEtl.loadDim(dim, url, "dim_customers", SaveMode.Overwrite, driver)
    assert(JdbcSink.readTable(spark, url, "dim_customers", driver).count() == dim.count())
    // partitioned parallel read-back agrees
    val par = JdbcSink.readTable(spark, url, "dim_customers", driver,
      partitionColumn = Some("customer_id"), bounds = Some((0L, 10000L)), numPartitions = 4)
    assert(par.rdd.getNumPartitions == 4 && par.count() == dim.count())
  }

  test("JDBC init: constrained star schema (PK/FK/defaults) gates appended loads") {
    // reference parity: init_db.sql creates the constrained schema
    // (SERIAL PKs, FK REFERENCES, '00000' default members) BEFORE any
    // load; loads then APPEND so constraints survive
    val home = Files.createTempDirectory("graft_derby_ddl").toString
    System.setProperty("derby.system.home", home)
    val url = s"jdbc:derby:$home/dwh;create=true"
    val driver = Some("org.apache.derby.jdbc.EmbeddedDriver")
    JdbcSink.initStarSchema(url, driver)

    // the DDL-declared constraints exist in the catalog: 3 PKs, 3 FKs
    Class.forName(driver.get)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        """SELECT c.TYPE, count(*) FROM SYS.SYSCONSTRAINTS c
          |JOIN SYS.SYSSCHEMAS s ON c.SCHEMAID = s.SCHEMAID
          |WHERE s.SCHEMANAME = 'RETAIL' GROUP BY c.TYPE""".stripMargin)
      val types = Iterator.continually(rs)
        .takeWhile(_.next()).map(r => r.getString(1) -> r.getInt(2)).toMap
      assert(types.getOrElse("P", 0) == 3, s"want 3 primary keys, got $types")
      assert(types.getOrElse("F", 0) == 3, s"want 3 foreign keys, got $types")
    } finally conn.close()

    // pre-seeded default members, identity-assigned dim ids
    val dimC = JdbcSink.readTable(spark, url, "RETAIL.DIM_CUSTOMERS", driver)
    assert(dimC.filter(col("CUSTOMER_ID") === "00000").count() == 1)

    // appended load through the Spark writer keeps the constraints and
    // fills the identity surrogate
    import spark.implicits._
    val newDims = Seq(("17850", "United Kingdom"), ("12583", "France"))
      .toDF("CUSTOMER_ID", "COUNTRY")
    JdbcSink.loadTable(newDims, url, "RETAIL.DIM_CUSTOMERS", SaveMode.Append, driver)
    val loaded = JdbcSink.readTable(spark, url, "RETAIL.DIM_CUSTOMERS", driver)
    assert(loaded.count() == 3)
    assert(loaded.agg(countDistinct(col("CUSTOMER_DIM_ID"))).head.getLong(0) == 3,
      "identity surrogate keys not assigned")

    // FK enforcement: an orphan fact row is REJECTED by the warehouse
    val orphan = Seq(("536365", 99, 99, 99, java.math.BigDecimal.valueOf(2.55), 6))
      .toDF("INVOICE_ID", "INVOICE_DATE_DIM_ID", "PRODUCT_DIM_ID",
        "CUSTOMER_DIM_ID", "UNIT_PRICE", "QUANTITY")
    val err = intercept[Exception] {
      JdbcSink.loadTable(orphan, url, "RETAIL.FCT_INVOICES", SaveMode.Append, driver)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(err).exists(_.getMessage != null) &&
      causes(err).map(c => Option(c.getMessage).getOrElse("")).mkString(" ")
        .toUpperCase.contains("FOREIGN KEY"),
      s"expected a foreign-key violation, got: ${err.getMessage}")

    // re-init is idempotent: drops and re-creates with the seeds back
    JdbcSink.initStarSchema(url, driver)
    assert(JdbcSink.readTable(spark, url, "RETAIL.DIM_CUSTOMERS", driver).count() == 1)
  }

  test("messy external ingest: corrupt rows quarantined, id shapes gated with reasons") {
    val dir = Files.createTempDirectory("graft_ingest").toString
    val csv =
      """invoice_no,stock_code,customer_id,quantity,unit_price
        |536365,85123,17850,6,2.55
        |536366,71053,17850,6,3.39
        |C537226,85123,17850,1,2.55
        |536367,999,17850,2,1.10
        |536368,85123,99999,notanumber,totallybroken
        |536369,85123,12583,3,4.25
        |536370,85123,,4,1.99
        |""".stripMargin
    Files.write(java.nio.file.Paths.get(s"$dir/retail.csv"), csv.getBytes)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("invoice_no", StringType),   // string on purpose: leading
      StructField("stock_code", StringType),   // zeros + "C" prefixes survive
      StructField("customer_id", StringType),
      StructField("quantity", IntegerType),
      StructField("unit_price", DoubleType)))
    val raw = ExternalIngest.readTypedCsv(spark, s"$dir/retail.csv", schema).persist()
    val (clean, quarantined) = ExternalIngest.splitQuarantine(raw)
    // the type-broken row is captured intact, not dropped
    assert(quarantined.count() == 1)
    assert(quarantined.head.getAs[String](ExternalIngest.CorruptCol).contains("notanumber"))
    assert(clean.count() == 6)
    // reference shape gate: cancelled invoice + short stock code + NULL
    // customer id (the PERMISSIVE-ingest empty field) rejected, with reasons
    val (kept, rejected) = ExternalIngest.retailShapeGate(clean)
    assert(kept.count() == 3)
    val reasons = rejected.select("invoice_no", "reject_reason").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(reasons("C537226") == "cancelled_invoice")
    assert(reasons("536367") == "bad_stock_code")
    assert(reasons("536370") == "bad_customer_id")
    raw.unpersist()
  }

  test("z-order layout: row-group skipping measured on a two-dimensional filter") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    val base = spark.range(200000).select(
      pmod(hash(col("id")), lit(1024)).as("k1"),
      pmod(hash(col("id") * 7 + 1), lit(1024)).as("k2"),
      col("id").as("payload"))
    val dir = Files.createTempDirectory("zorder").toString
    // plain copy: same file count + row-group sizing, natural
    // (key-uncorrelated) order → every row group's k1/k2 stats span the
    // full domain and nothing can be skipped
    base.repartition(8)
      .write.option("parquet.block.size", (256 * 1024).toString)
      .mode("overwrite").parquet(s"$dir/plain")
    Maintenance.zorderWrite(base, s"$dir/z", "k1", "k2",
      nFiles = 8, bits = 10, rowGroupBytes = 256 * 1024)
    def scanned(path: String): (Long, Seq[Long]) = {
      val df = spark.read.parquet(path)
        .filter(col("k1") < 32 && col("k2") < 32)
      val rows = df.collect().map(_.getAs[Long]("payload")).sorted.toSeq
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
        case s: FileSourceScanExec => s
      }
      val read = scans(df.queryExecution.executedPlan)
        .map(_.metrics("numOutputRows").value).sum
      (read, rows)
    }
    val (plainRead, plainRows) = scanned(s"$dir/plain")
    val (zRead, zRows) = scanned(s"$dir/z")
    assert(zRows == plainRows, "layouts must return identical data")
    assert(plainRows.nonEmpty)
    // the measured point: the z-ordered layout's parquet stats prune
    // most row groups for a filter on BOTH dimensions
    assert(zRead * 3 <= plainRead,
      s"z-order read $zRead rows vs $plainRead unsorted — no skipping measured")
  }

  test("compaction rewrites a fragmented table to target-size files with identical data") {
    import graft.sources.Maintenance
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    val src = spark.read.parquet(s"$SfDir/orders.parquet")
    // fragment: 64 tiny files, the streaming-sink pathology
    src.repartition(64).write.parquet(dir)
    // order-independent exact fingerprint (double sums vary in the last
    // ulp with partition order)
    def fingerprint(d: org.apache.spark.sql.DataFrame): (Long, Long) =
      (d.count(), d.agg(bit_xor(xxhash64(col("o_orderkey"), col("o_totalprice"), col("o_orderdate")))).head.getLong(0))
    val beforeFp = fingerprint(spark.read.parquet(dir))
    val (nBefore, nAfter) = Maintenance.compact(spark, dir, targetBytes = 512L * 1024)
    assert(nBefore == 64, s"expected 64 fragments, saw $nBefore")
    assert(nAfter < nBefore / 4, s"compaction barely helped: $nBefore -> $nAfter")
    assert(fingerprint(spark.read.parquet(dir)) == beforeFp, "data changed under compaction")
  }

  test("streaming from a file source matches the batch window aggregation") {
    import graft.streaming.EventStreams
    val dir = Files.createTempDirectory("graft_stream_src").toString
    val batch = graft.util.Tables.events(spark, SfDir)
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

  test("multimodal REAL image decode: ImageIO reads true dimensions, resizes, quarantines junk") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, (x * 31 + y) % 0xffffff)))
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", buf)
      buf.toByteArray
    }
    val payloads = Seq(
      (1L, png(40, 30)), (2L, png(17, 99)), (3L, png(64, 64)),
      (4L, "this is not an image".getBytes)) // truncated/corrupt payload
    val df = payloads.toDF("doc_id", "payload")
    val metas = Multimodal.decodeImagesOn(df).collect().sortBy(_.doc_id)
    assert(metas.map(m => (m.doc_id, m.width, m.height)).toSeq
      == Seq((1L, 40, 30), (2L, 17, 99), (3L, 64, 64)), "true decoded dimensions")
    // corrupt payload quarantined (dropped), not crashed
    assert(!metas.exists(_.doc_id == 4L))
    // real resize: thumbnails re-decode to the requested size
    val thumbs = Multimodal.thumbnailsOn(df, 8, 8).collect()
    assert(thumbs.length == 3)
    thumbs.foreach { t =>
      val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(t.thumb))
      assert(back.getWidth == 8 && back.getHeight == 8)
    }
  }

  test("perceptual aHash image near-dup: brightened copy pairs with its original, unrelated image does not") {
    import spark.implicits._
    // deterministic noise image + a mild global brightening of the SAME
    // pixels (the re-encode/levels-tweak duplicate class) + an
    // unrelated noise image
    def noisePng(seed: Int, shift: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 64; y <- 0 until 64) {
        val h = ((x * 73856093 ^ y * 19349663 ^ seed * 83492791) & 0x7fffffff) % 200
        val v = math.min(255, h + shift)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", buf)
      buf.toByteArray
    }
    val df = Seq(
      (1L, noisePng(1, 0)), (2L, noisePng(1, 12)), // same structure, brightened
      (3L, noisePng(7, 0)),                        // unrelated
      (4L, "junk".getBytes))                       // quarantined
      .toDF("doc_id", "payload")
    val hashes = Multimodal.imageAHashesOn(df)
    val hs = hashes.collect().map(h => h.doc_id -> h.ahash).toMap
    assert(hs.keySet == Set(1L, 2L, 3L), "junk quarantined, images hashed")
    // aHash is mean-relative, so a global brightness shift preserves
    // most bits; unrelated noise differs in ~half of 64
    val pairs = Multimodal.imageNearDupOn(hashes.toDF()).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(pairs.contains((1L, 2L)), s"brightened copy not found: $pairs")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L),
      s"unrelated image paired: $pairs")
    // determinism: rehashing bit-identical
    val again = Multimodal.imageAHashesOn(df).collect().map(h => h.doc_id -> h.ahash).toMap
    assert(again == hs)
  }

  test("DCT pHash: exact brightness invariance (DC dropped), planted pairs only, ~balanced bits") {
    import spark.implicits._
    val df = Seq(
      (1L, Multimodal.synthNoisePng(1L, 0)),
      (2L, Multimodal.synthNoisePng(1L, 15)),  // same pattern, +15 brightness
      (3L, Multimodal.synthNoisePng(7L, 0)),   // unrelated
      (4L, "junk".getBytes))                   // quarantined
      .toDF("doc_id", "payload")
    val hs = Multimodal.imagePHashesOn(df).collect().map(h => h.doc_id -> h.phash).toMap
    assert(hs.keySet == Set(1L, 2L, 3L), "junk quarantined, images hashed")
    // a uniform shift moves ONLY the DC coefficient, which pHash drops:
    // the hashes are bit-identical, not merely close
    assert(hs(1L) == hs(2L), f"brightness shift changed the hash: ${hs(1L)}%x vs ${hs(2L)}%x")
    // median thresholding pins the bit balance near 31/63
    hs.values.foreach { h =>
      val bits = java.lang.Long.bitCount(h)
      assert(bits >= 24 && bits <= 39, s"unbalanced hash: $bits bits")
    }
    val pairs = Multimodal.imagePHashNearDupOn(Multimodal.imagePHashesOn(df).toDF())
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(pairs == Set((1L, 2L)), s"expected only the planted pair: $pairs")
  }

  test("mm_image_phash driver query: exactly the planted predecessor pairs at hamming 0") {
    val rows = Multimodal.imagePhashPairs(spark, "/root/testdata/sf0.001").collect()
    val pairs = rows.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    // docs 0..499: ids with id % 50 == 1 repeat id-1's pattern → (id-1, id)
    val planted = (0L until 500L).filter(_ % 50L == 1L).map(i => (i - 1, i)).toSet
    assert(pairs == planted, s"got ${pairs.size} pairs, want ${planted.size}: ${pairs.diff(planted)}")
    assert(rows.forall(_.getAs[Int]("hamming") == 0), "planted pairs differ only in DC")
  }

  test("mm_audio_fp: one spectral profile per doc, 2 windows each, deterministic, fixture fingerprints pinned") {
    val Sf = "/root/testdata/sf0.001"
    val rows = Multimodal.audioFp(spark, Sf).collect()
    val nDocs = graft.util.Tables.documents(spark, Sf).count()
    assert(rows.length == nDocs, s"${rows.length} profiles for $nDocs docs")
    assert(rows.forall(_.getAs[Long]("n_windows") == 2L), "2048 frames / 1024-frame windows")
    // the 16 fixture docs carry value-oracled fingerprints (r16); the
    // rest project null — the oracle pins the literals, this spec pins
    // membership, variation, and determinism
    val fixture = rows.filter(_.getLong(0) < 16L)
    assert(fixture.length == 16 && fixture.forall(!_.isNullAt(2)))
    assert(rows.filter(_.getLong(0) >= 16L).forall(_.isNullAt(2)))
    val fps = fixture.map(_.getAs[Long]("fp0_fixture")).distinct
    assert(fps.length > 8, s"only ${fps.length} distinct fixture fingerprints")
    // bit-identical across runs (StrictMath synth + integer thresholds)
    val again = Multimodal.audioFp(spark, Sf).collect()
    assert(rows.map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq ==
      again.map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq,
      "rerun drifted")
  }

  test("audio spectral fingerprint: attenuated copy pairs with its original, different tone does not") {
    import spark.implicits._
    // tone WAV: sum of two sines at periods p1/p2 frames, amp-scaled
    def toneWav(p1: Int, p2: Int, amp: Double, frames: Int): Array[Byte] = {
      val pcm = new Array[Byte](frames * 2)
      (0 until frames).foreach { i =>
        val v = (math.sin(i * 2 * math.Pi / p1) + 0.5 * math.sin(i * 2 * math.Pi / p2)) * amp
        val s = (v * 12000).toShort
        pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val buf = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
      buf.toByteArray
    }
    val df = Seq(
      (1L, toneWav(64, 16, 1.0, 4096)),  // original
      (2L, toneWav(64, 16, 0.55, 4096)), // same tones, quieter (re-encode class)
      (3L, toneWav(20, 7, 1.0, 4096)),   // different spectrum
      (4L, "not audio".getBytes))        // quarantined
      .toDF("doc_id", "payload")
    val fps = Multimodal.audioFingerprintsOn(df)
    val rows = fps.collect()
    assert(rows.map(_.doc_id).toSet == Set(1L, 2L, 3L))
    assert(rows.count(_.doc_id == 1L) == 4, "4096 frames / 1024-frame windows")
    // mean-relative band energies: global attenuation preserves the
    // fingerprint; a different tone pair flips spectral bits
    val pairs = Multimodal.audioNearDupOn(fps.toDF()).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(pairs.contains((1L, 2L)), s"attenuated copy not found: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"different tone paired: $pairs")
  }

  test("real multi-frame video decode: animated GIF frame count, dims, and strided luma sampling") {
    import spark.implicits._
    // write a real 3-frame animated GIF with ImageIO (solid luma levels
    // 10, 100, 200 — a single-color frame survives GIF palettization
    // exactly)
    def gif(lumas: Seq[Int], w: Int, h: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      lumas.foreach { l =>
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(l, l, l)); g.fillRect(0, 0, w, h); g.dispose()
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
          writer.getDefaultWriteParam)
      }
      writer.endWriteSequence(); writer.dispose(); ios.close()
      out.toByteArray
    }
    val df = Seq(
      (1L, gif(Seq(10, 100, 200), 12, 8)),
      (2L, gif(Seq(50), 6, 6)),
      (3L, "not a video".getBytes)).toDF("doc_id", "payload")
    val metas = Multimodal.decodeVideosOn(df).collect().sortBy(_.doc_id)
    assert(metas.map(m => (m.doc_id, m.width, m.height, m.frames)).toSeq
      == Seq((1L, 12, 8, 3), (2L, 6, 6, 1)), "true container frame counts and dims")
    assert(!metas.exists(_.doc_id == 3L), "non-video payload quarantined, not crashed")
    // strided sampling decodes frames 0 and 2 with their true pixel means
    val frames = Multimodal.sampleVideoFramesOn(df.filter($"doc_id" === 1L), stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(f => (f.frame_idx, f.mean_luma)).toSeq == Seq((0, 10L), (2, 200L)),
      "strided frames decode to their planted luma levels")
    // scene cuts over a planted hard cut: dark..dark | bright..bright;
    // every frame sampled (stride 1) so the boundary lands exactly
    val cutDf = Seq((7L, gif(Seq(20, 22, 230, 228), 10, 10))).toDF("doc_id", "payload")
    val cuts = Multimodal.sceneCutsOn(
      Multimodal.sampleVideoFramesOn(cutDf, stride = 1).toDF(), minDelta = 100L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(cuts.toSeq == Seq((7L, 2, 208L)),
      s"exactly the planted dark->bright boundary, with its signed delta: ${cuts.toSeq}")
  }

  test("mm_video_scenes: every doc profiles its planted cut at the planted frame, deterministic") {
    val Sf = "/root/testdata/sf0.001"
    val rows = Multimodal.videoScenes(spark, Sf).collect()
    val nDocs = graft.util.Tables.documents(spark, Sf).count()
    assert(rows.length == nDocs, s"${rows.length} profiles for $nDocs docs")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("n_frames") == 6 + (id % 5L).toInt, s"container frame count: $r")
      assert(r.getAs[Int]("n_sampled") == r.getAs[Int]("n_frames"), s"stride-1 samples all: $r")
      assert(r.getAs[Int]("n_cuts") == 1, s"exactly the planted cut: $r")
      assert(r.getAs[Int]("cut_frame") == 2 + (id % 3L).toInt, s"cut at planted frame: $r")
      assert(r.getAs[Long]("max_delta") == 220L - (40 + (id % 4L).toInt * 20),
        s"cut magnitude is the planted luma jump: $r")
    }
    val again = Multimodal.videoScenes(spark, Sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq, "rerun drifted")
  }

  test("idempotent batch append: a replayed batchId is skipped, not duplicated") {
    import graft.sources.Maintenance
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_idem").toString + "/t"
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b1 = Seq((3L, "c")).toDF("id", "v")
    assert(Maintenance.appendBatchIdempotent(b0, dir, 0L))
    assert(Maintenance.appendBatchIdempotent(b1, dir, 1L))
    // restart scenario: batch 1 re-delivered (at-least-once) -> skipped
    assert(!Maintenance.appendBatchIdempotent(b1, dir, 1L))
    val all = spark.read.parquet(dir)
    assert(all.count() == 3, "replay must not duplicate rows")
    assert(all.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // and it composes as a foreachBatch sink
    implicit val sqlCtx = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val dir2 = Files.createTempDirectory("graft_idem2").toString + "/t"
    val q = src.toDF().toDF("id", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        Maintenance.appendBatchIdempotent(batch.toDF(), dir2, id); ()
      }.start()
    try { src.addData((9L, "x")); q.processAllAvailable() } finally q.stop()
    assert(spark.read.parquet(dir2).count() == 1)
  }

  test("observe(): data-quality metrics ride the load job - no second pass over the data") {
    // the pipeline-monitoring primitive: row counts / null counts /
    // sums are collected DURING the write via AccumulatorV2, so a
    // 100 TB load gets its audit numbers for free instead of re-scanning
    val obs = org.apache.spark.sql.Observation("load_audit")
    val src = spark.read.parquet(s"$SfDir/orders.parquet")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("o_totalprice")).as("total"),
        count_if(col("o_custkey").isNull).as("null_keys"))
    val outDir = Files.createTempDirectory("graft_obs").toString + "/t"
    src.write.parquet(outDir)
    val m = obs.get
    assert(m("n_rows") == spark.read.parquet(outDir).count())
    assert(m("null_keys") == 0L)
    assert(m("total").asInstanceOf[Double] > 0.0)
  }

  test("multimodal REAL audio decode: WAV format read, per-window RMS tracks signal energy") {
    import spark.implicits._
    // synthesize 16-bit mono PCM WAV: a loud sine burst then digital silence
    def wav(sampleRate: Int, loudFrames: Int, silentFrames: Int): Array[Byte] = {
      val n = loudFrames + silentFrames
      val pcm = new Array[Byte](n * 2)
      (0 until loudFrames).foreach { i =>
        val s = (math.sin(i * 2 * math.Pi / 64) * 20000).toShort
        pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val buf = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
      buf.toByteArray
    }
    val payloads = Seq(
      (1L, wav(16000, 2048, 2048)),
      (2L, wav(8000, 1024, 0)),
      (3L, "not audio at all".getBytes))
    val df = payloads.toDF("doc_id", "payload")
    val metas = Multimodal.decodeAudiosOn(df).collect().sortBy(_.doc_id)
    assert(metas.map(m => (m.doc_id, m.sample_rate, m.channels, m.n_frames)).toSeq
      == Seq((1L, 16000, 1, 4096L), (2L, 8000, 1, 1024L)), "true decoded audio format")
    assert(metas.head.duration_ms == 256L) // 4096 frames at 16 kHz
    assert(!metas.exists(_.doc_id == 3L), "junk payload quarantined, not crashed")
    // RMS feature extraction: loud windows ≫ silent windows
    val rms = Multimodal.audioRmsOn(df).collect().filter(_.doc_id == 1L).sortBy(_.win_idx)
    assert(rms.length == 4) // 4096 frames / 1024-frame windows
    assert(rms.take(2).forall(_.rms > 10000), s"sine burst windows: ${rms.toSeq}")
    assert(rms.drop(2).forall(_.rms == 0.0), s"silent windows: ${rms.toSeq}")
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
