package graft

import org.apache.spark.sql.functions._
import graft.operators.{Quality, RetailEtl, Similarity, TextAnalysis}

/** Value-level checks for the r11 curation/diagnostic operators
  * (text_perplexity, dq_skew_profile, sim_filtered_ann, etl_late_dim).
  * Mechanics (runs, schema, oracle declared) ride QueriesSpec; these
  * specs plant known inputs and assert the arithmetic / semantics.
  */
class CurationOpsSpec extends SparkSpecBase {
  import spark.implicits._

  /** The operator's own split hash, replicated: fold("ppl:"+id) mod 100. */
  private def splitOf(id: Long): Long = {
    val P = 2147483647L
    var acc = 0L
    s"ppl:$id".foreach(ch => acc = (acc * 31 + ch.toLong) % P)
    acc % 100
  }

  test("perplexityOn: word salad scores more bits than in-model prose and lands in the tail bucket") {
    val trainIds = (0L until 400L).filter(splitOf(_) < TextAnalysis.PplTrainPct)
    val scoreIds = (0L until 400L).filter(splitOf(_) >= TextAnalysis.PplTrainPct)
    assert(trainIds.size >= 100 && scoreIds.size >= 30, "split degenerate")
    // model text: a deterministic bigram chain every doc repeats
    val prose = "the cat sat on the mat and the cat ran"
    val salad = "zq xv qj vw jx wq qx vz jw xq" // all-OOV bigrams
    // every scored doc but one is prose; one is salad
    val saladId = scoreIds.head
    val docs = (trainIds ++ scoreIds).map { id =>
      (id, if (id == saladId) salad else prose, "en")
    }.toDF("doc_id", "text", "lang")
    val out = TextAnalysis.perplexityOn(docs, "doc_id", "text", "lang").collect()
    assert(out.length == scoreIds.size, "one row per held-out doc with bigrams")
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    val saladX = byId(saladId).getAs[Long]("xent_milli")
    val proseX = scoreIds.filter(_ != saladId)
      .map(byId(_).getAs[Long]("xent_milli")).distinct
    assert(proseX.size == 1, s"identical prose docs must score identically: $proseX")
    assert(saladX > proseX.head,
      s"salad $saladX milli-bits must exceed prose ${proseX.head}")
    assert(byId(saladId).getAs[String]("ppl_bucket") == "tail")
  }

  test("perplexityOn: unseen context degrades to the uniform prior log2(V), exactly") {
    // train: one doc, so V and all counts are hand-computable; the
    // scored doc's bigrams are all unseen-context → each costs
    // exactly log2(V) bits (c1=0, c2=0 → ratio = V), V = 4 distinct
    // train unigrams + 1 = 5.
    val trainId = (0L until 100L).find(splitOf(_) < TextAnalysis.PplTrainPct).get
    val scoreId = (0L until 100L).find(splitOf(_) >= TextAnalysis.PplTrainPct).get
    val docs = Seq(
      (trainId, "a b c d", "en"),
      (scoreId, "zz yy xx", "en")).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.perplexityOn(docs, "doc_id", "text", "lang").collect()
    assert(out.length == 1)
    val x = out.head.getAs[Long]("xent_milli")
    // log2(5) = 2.3219...; fixed-point floor at f=12 then milli-floor
    assert(x >= 2310 && x <= 2325, s"expected ~2322 milli-bits, got $x")
  }

  test("skewProfileOf: planted 90/1 skew yields exact integer diagnostics") {
    val rows = (Seq.fill(90)(1L) ++ (2L to 11L)).toDF("k")
    val r = Quality.skewProfileOf(rows, "k").collect().head
    assert(r.getAs[Long]("n_keys") == 11L)
    assert(r.getAs[Long]("total_rows") == 100L)
    assert(r.getAs[Long]("max_cnt") == 90L)
    assert(r.getAs[Long]("mean_cnt_milli") == 9090L)   // 1000*100/11
    assert(r.getAs[Long]("skew_ratio_milli") == 9900L) // 1000*90*11/100
    assert(r.getAs[Long]("top10_ppm") == 990000L)      // (90+9)/100
    assert(r.getAs[Long]("salt_factor") == 10L)        // ceil(9.9)
  }

  test("skewProfileOf: uniform keys report ratio 1000 and salt 1") {
    val rows = (1L to 40L).map(i => i % 8L).toDF("k")
    val r = Quality.skewProfileOf(rows, "k").collect().head
    assert(r.getAs[Long]("skew_ratio_milli") == 1000L)
    assert(r.getAs[Long]("salt_factor") == 1L)
  }

  test("sim_filtered_ann honors the predicate and reports exact cosines") {
    val out = Similarity.filteredAnn(spark, SfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Int]("label") >= 5,
        s"candidate ${r.getAs[Long]("c_id")} violates the filter")
      assert(r.getAs[Int]("rk") >= 1 && r.getAs[Int]("rk") <= 5)
    }
    // ranks are contiguous from 1 per query
    out.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      val rks = rs.map(_.getAs[Int]("rk")).sorted
      assert(rks.sameElements(1 to rks.length))
    }
    // each reported cosine matches the exact brute-force value for that pair
    val e = graft.util.Tables.embeddings(spark, SfDir)
    val exact = Similarity.bruteforceTopkOn(
      e.filter(col("vec_id") < 8).select(col("vec_id").as("q_id"), col("embedding").as("qv")),
      e.filter(col("vec_id") >= 8 && col("label") >= 5)
        .select(col("vec_id").as("c_id"), col("embedding").as("cv")),
      1000000)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id")) ->
        r.getAs[Double]("cos_sim")).toMap
    out.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))
      assert(exact.contains(key) && exact(key) == r.getAs[Double]("cos_sim"),
        s"pair $key cosine mismatch")
    }
  }

  test("embedOutliersOn: a planted inverted vector is flagged; the tight cluster is not") {
    // label 0: 40 near-identical vectors + one INVERTED one (cosine to
    // the centroid ≈ −1); label 1: a clean control cluster
    val vecs = ((0L until 40L).map(i =>
        (i, 0, Array(1.0f, 0.5f, 0.25f + (i % 3) * 0.001f))) ++
      Seq((99L, 0, Array(-1.0f, -0.5f, -0.25f))) ++
      (100L until 120L).map(i => (i, 1, Array(0.1f, 1.0f, 0.3f))))
      .toDF("id", "label", "vec")
    val out = graft.operators.Similarity.embedOutliersOn(vecs, kMad = 3.0).collect()
    val flagged = out.map(r => r.getAs[Long]("id")).toSet
    assert(flagged.contains(99L), s"inverted vector must be flagged, got $flagged")
    assert(!flagged.exists(_ >= 100L), "the clean control cluster must not flag")
    assert(flagged.size <= 3, s"tight cluster members must survive, got $flagged")
  }

  test("lateDimOn: loaded, resolved, and inferred members each carry the right provenance") {
    val customer = Seq(
      (1L, "seg_a"), (2L, "seg_b"), (3L, "seg_c")
    ).toDF("c_custkey", "c_mktsegment")
    val orders = Seq(
      (1L, "1995-06-01"), // before cutoff → loaded member
      (2L, "1996-03-01"), // only after cutoff, in master → resolved
      (9L, "1996-04-01")  // after cutoff, NOT in master → inferred
    ).toDF("o_custkey", "o_orderdate")
      .withColumn("o_orderdate", col("o_orderdate").cast("date"))
    val out = RetailEtl.lateDimOn(customer, orders, "1996-01-01").collect()
    val byId = out.map(r => r.getAs[Long]("customer_id") ->
      (r.getAs[String]("segment"), r.getAs[String]("provenance"))).toMap
    assert(byId(1L) == (("seg_a", "loaded")))
    assert(byId(2L) == (("seg_b", "resolved")))
    assert(byId(9L) == (("<unknown>", "inferred")))
    assert(!byId.contains(3L), "never-referenced customer must not mint a member")
  }

  test("lateDimOn: a key both loaded and late stays a single loaded member") {
    val customer = Seq((1L, "seg_a")).toDF("c_custkey", "c_mktsegment")
    val orders = Seq((1L, "1995-06-01"), (1L, "1996-06-01"))
      .toDF("o_custkey", "o_orderdate")
      .withColumn("o_orderdate", col("o_orderdate").cast("date"))
    val out = RetailEtl.lateDimOn(customer, orders, "1996-01-01").collect()
    assert(out.length == 1 && out.head.getAs[String]("provenance") == "loaded")
  }
}
