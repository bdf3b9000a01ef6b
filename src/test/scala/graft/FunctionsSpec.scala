package graft

import org.apache.spark.sql.functions._
import graft.functions.{FloatVecDot, MinHashSig, PolyCharFold, SimHash32, SrpBucket, TextCount, TextFns}

/** Pins each custom codegen'd Catalyst expression to the interpreted
  * higher-order-function formulation it replaced: the portable-hash
  * contract says both must be value-identical (the DuckDB oracle encodes
  * the same arithmetic). Any drift here would silently break the
  * cross-engine value oracles.
  */
class FunctionsSpec extends SparkSpecBase {

  private val P = 2147483647L

  private def docs = spark.read.parquet(s"$SfDir/documents.parquet")
  private def vecs = spark.read.parquet(s"$SfDir/embeddings.parquet")

  test("PolyCharFold == interpreted split/ascii fold (mult 31 and 131)") {
    val df = docs
      .withColumn("f31", PolyCharFold.column(col("text"), 31L))
      .withColumn("s31", expr(
        s"aggregate(transform(filter(split(text, ''), ch -> ch <> ''), ch -> CAST(ascii(ch) AS BIGINT)), CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % $P)"))
      .withColumn("f131", PolyCharFold.column(col("text"), 131L))
      .withColumn("s131", expr(
        s"aggregate(transform(filter(split(text, ''), ch -> ch <> ''), ch -> CAST(ascii(ch) AS BIGINT)), CAST(0 AS BIGINT), (acc, x) -> (acc * 131 + x) % $P)"))
    assert(df.filter(col("f31") =!= col("s31") || col("f131") =!= col("s131")).count() == 0)
  }

  test("FloatVecDot == interpreted zip_with/aggregate fold") {
    val df = vecs
      .withColumn("fast", FloatVecDot.column(col("embedding"), col("embedding")))
      .withColumn("slow", expr(
        "aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"))
    assert(df.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("SrpBucket == interpreted nested plane/dim aggregate") {
    val sE = s"CAST((1000003 * (i * 64 + d - 1) + 12289) % $P AS BIGINT)"
    val mE = s"((($sE * $sE) % $P + CAST(i * 64 + d - 1 AS BIGINT)) % $P)"
    val slow =
      s"aggregate(sequence(0, 7), CAST(0 AS BIGINT), (acc, i) -> acc + " +
        s"CASE WHEN aggregate(sequence(1, size(embedding)), CAST(0 AS DOUBLE), (a, d) -> a + CAST(element_at(embedding, d) AS DOUBLE) * " +
        s"(CASE WHEN ($mE * $mE) % $P > 1073741823 THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)) > 0 " +
        s"THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END)"
    val df = vecs
      .withColumn("fast", SrpBucket.column(col("embedding"), 8))
      .withColumn("slow", expr(slow))
    assert(df.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("SQL registration: graft_* functions callable from spark.sql") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_charfold('abc') AS h31, graft_charfold('abc', 131) AS h131").head
    // ((97*31+98)*31+99) % P and ((97*131+98)*131+99) % P
    assert(r.getLong(0) == ((97L * 31 + 98) * 31 + 99) % P)
    assert(r.getLong(1) == ((97L * 131 + 98) * 131 + 99) % P)
    val d = spark.sql(
      "SELECT graft_fvec_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>), CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS d").head
    assert(d.getDouble(0) == 11.0)
    val s = spark.sql("SELECT graft_minhash_sig(array(CAST(5 AS BIGINT), CAST(9 AS BIGINT)), 4) AS s").head
    assert(s.getSeq[Long](0).length == 4)
  }

  test("TextCount == interpreted tokenize/aggregate/regex formulations") {
    val df = docs
      .withColumn("words", TextFns.tokenize(col("text")))
      .withColumn("fw", TextCount.column(col("text"), TextCount.Words))
      .withColumn("sw", size(col("words")).cast("long"))
      .withColumn("fn", TextCount.column(col("text"), TextCount.NonWs))
      .withColumn("sn", expr("CAST(aggregate(words, 0, (a, w) -> a + length(w)) AS BIGINT)"))
      .withColumn("fp", TextCount.column(col("text"), TextCount.Punct))
      .withColumn("sp", length(regexp_replace(col("text"), "[^.!?,;:]", "")).cast("long"))
    assert(df.filter(col("fw") =!= col("sw") || col("fn") =!= col("sn")
      || col("fp") =!= col("sp")).count() == 0)
    // unicode / edge inputs
    import spark.implicits._
    val edge = Seq("", "  ", "héllo wörld.", "a\tb\nc", "¡Hola! ¿Qué tal?", "one")
      .toDF("text")
      .withColumn("words", TextFns.tokenize(col("text")))
    val bad = edge
      .withColumn("fw", TextCount.column(col("text"), TextCount.Words))
      .withColumn("sw", size(col("words")).cast("long"))
      .withColumn("fn", TextCount.column(col("text"), TextCount.NonWs))
      .withColumn("sn", expr("CAST(coalesce(aggregate(words, 0, (a, w) -> a + length(w)), 0) AS BIGINT)"))
      .withColumn("fp", TextCount.column(col("text"), TextCount.Punct))
      .withColumn("sp", length(regexp_replace(col("text"), "[^.!?,;:]", "")).cast("long"))
      .filter(col("fw") =!= col("sw") || col("fn") =!= col("sn") || col("fp") =!= col("sp"))
    assert(bad.count() == 0)
  }

  test("TextCount degrades on truncated/invalid UTF-8 instead of throwing") {
    import org.apache.spark.unsafe.types.UTF8String
    // lone continuation lead bytes with the sequence cut off at the end
    val truncated = Seq(
      Array(0xe4.toByte),                       // 3-byte lead, nothing after
      Array('a'.toByte, 0xc3.toByte),           // 2-byte lead at end
      Array('x'.toByte, 0xf0.toByte, 0x9f.toByte), // 4-byte lead, 2 of 3 cont
      Array(0xff.toByte))                       // not valid UTF-8 at all
    truncated.foreach { bytes =>
      val s = UTF8String.fromBytes(bytes)
      // must not throw, any of the three modes
      TextCount.count(s, TextCount.Words)
      TextCount.count(s, TextCount.NonWs)
      TextCount.count(s, TextCount.Punct)
    }
    // and through the SQL-registered path over binary-cast garbage
    graft.functions.GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT graft_text_count(CAST(unhex('61E4') AS STRING), 0) AS w").head.getLong(0)
    assert(n >= 1L)
  }

  test("SimHash32 skips NULL array elements instead of NPE") {
    graft.functions.GraftFunctions.register(spark)
    val withNull = spark.sql(
      "SELECT graft_simhash32(array('alpha', CAST(NULL AS STRING), 'beta')) AS fp").head.getLong(0)
    val without = spark.sql(
      "SELECT graft_simhash32(array('alpha', 'beta')) AS fp").head.getLong(0)
    assert(withNull == without) // null tokens don't vote
  }

  test("SimHash32 == interpreted explode-free lambda formulation") {
    val cmp = docs
      .withColumn("words", TextFns.tokenize(col("text")))
      .filter(size(col("words")) > 0)
      .withColumn("wh", TextFns.tokenHashes(col("words")))
      .withColumn("fast", SimHash32.column(col("words")))
      .withColumn("slow", TextFns.simhash("wh"))
    assert(cmp.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("WinnowMins == interpreted transform/array_min/slice (as a sorted set)") {
    import graft.functions.WinnowMins
    val w = 4
    val df = docs
      .select(TextFns.orderedShingleHashes(TextFns.tokenize(col("text"))).as("kg"))
      .filter(size(col("kg")) >= w)
      .withColumn("fast", WinnowMins.column(col("kg"), w))
      .withColumn("slow", array_sort(array_distinct(expr(
        s"transform(sequence(1, size(kg) - ${w - 1}), p -> array_min(slice(kg, p, $w)))"))))
    assert(df.filter(to_json(col("fast")) =!= to_json(col("slow"))).count() == 0)
    // short-array edge: fewer than w hashes -> empty fingerprint set
    import spark.implicits._
    val short = Seq(Seq(5L, 3L, 9L)).toDF("kg")
      .select(WinnowMins.column(col("kg"), w).as("f")).head.getSeq[Long](0)
    assert(short.isEmpty)
  }

  test("TopKAgg: bounded-heap aggregate == sort-desc-limit, across partition merges") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // values deliberately spread over many partitions so the heap's
    // serialize/merge path is exercised, with duplicates at the boundary
    val vals = (1L to 1000L) ++ Seq(1000L, 999L, 999L)
    val df = vals.toDF("v").repartition(13)
    df.createOrReplaceTempView("graft_topk_in")
    val got = spark.sql("SELECT graft_topk(v, 5) AS t FROM graft_topk_in")
      .head.getSeq[Long](0)
    assert(got == Seq(1000L, 1000L, 999L, 999L, 999L), s"got $got")
    // grouped form through the Column API
    val grouped = df.withColumn("g", col("v") % 2)
      .groupBy("g").agg(graft.functions.TopKAgg.column(col("v"), 3).as("t"))
      .collect().map(r => r.getAs[Long]("g") -> r.getSeq[Long](1)).toMap
    assert(grouped(0L) == Seq(1000L, 1000L, 998L))
    assert(grouped(1L) == Seq(999L, 999L, 999L))
  }

  test("MinHashSig == interpreted transform/array_min") {
    val df = docs
      .select(col("doc_id"), TextFns.shingleHashes(TextFns.tokenize(col("text"))).as("h"))
      .filter(size(col("h")) > 0)
      .withColumn("fast", MinHashSig.column(col("h"), TextFns.MinhashK))
      .withColumn("slow", expr(
        s"transform(sequence(0, ${TextFns.MinhashK - 1}), i -> " +
          s"array_min(transform(h, x -> ((1000003*i + 12289) * x + (999983*i + 15373)) % $P)))"))
    assert(df.filter(to_json(col("fast")) =!= to_json(col("slow"))).count() == 0)
  }
}
