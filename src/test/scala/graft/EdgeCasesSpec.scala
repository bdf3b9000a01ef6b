package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOf, Dedup, Ranges, Similarity, TextAnalysis}

/** Robustness of the parametric DataFrame cores on degenerate inputs:
  * empty frames, empty strings, sub-shingle-length docs. A library user
  * hits all of these on the first real corpus.
  */
class EdgeCasesSpec extends SparkSpecBase {

  private def emptyDocs = {
    import spark.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  }

  test("dedup and text cores return empty (not error) on empty corpora") {
    assert(Dedup.exactOn(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.ngramJaccardOn(emptyDocs, "doc_id", "text", 0.5).count() == 0)
    assert(Dedup.minhashLshOn(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.simhashPairsOn(emptyDocs, "doc_id", "text").count() == 0)
    assert(TextAnalysis.qualityOn(emptyDocs, "doc_id", "text").count() == 0)
    assert(TextAnalysis.langidOn(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("degenerate docs: empty and sub-shingle texts hash without error") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "one"), (3L, "one two"), (4L, "a b c"), (5L, "a b c"))
      .toDF("doc_id", "text")
    // exact dedup sees all docs; the two identical docs collapse
    val ex = Dedup.exactOn(docs, "doc_id", "text").collect()
    assert(ex.length == 4)
    assert(ex.exists(r => r.getAs[Long]("n_copies") == 2))
    // only docs with >= 3 tokens shingle; the identical pair matches at jac 1.0
    val jac = Dedup.ngramJaccardOn(docs, "doc_id", "text", 0.5).collect()
    assert(jac.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((4L, 5L)))
    // quality/langid skip zero-token docs, keep the rest
    assert(TextAnalysis.qualityOn(docs, "doc_id", "text").count() == 4)
  }

  test("asofJoin: empty right side keeps left rows with null payload") {
    import spark.implicits._
    val left = Seq((1L, 100L, "x"), (1L, 200L, "y")).toDF("k", "t", "tag")
    val right = Seq.empty[(Long, Long, Double)].toDF("k", "t", "v")
    val out = AsOf.asofJoin(left, right, "k", "t").collect()
    assert(out.length == 2)
    assert(out.forall(_.isNullAt(out.head.fieldIndex("r_v"))))
  }

  test("asofJoin: inclusive tie and strictly-later right rows ignored") {
    import spark.implicits._
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq((1L, 100L, 7.0), (1L, 101L, 9.0)).toDF("k", "t", "v")
    val out = AsOf.asofJoin(left, right, "k", "t").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("r_v") == 7.0) // ts tie matches; later row doesn't
  }

  test("asofJoin: matched row's NULL payload column is NOT backfilled from older rows") {
    import spark.implicits._
    val left = Seq((1L, 300L)).toDF("k", "t")
    // older row has v=5.0; the MATCHED (most recent) row has v=NULL —
    // the output must carry the matched row's NULL, not mix in 5.0
    val right = Seq((1L, 100L, Some(5.0), "old"), (1L, 200L, None, "new"))
      .toDF("k", "t", "v", "tag")
    val out = AsOf.asofJoin(left, right, "k", "t").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("r_t") == 200L)
    assert(out.head.getAs[String]("r_tag") == "new")
    assert(out.head.isNullAt(out.head.fieldIndex("r_v")), "NULL in matched row was backfilled")
  }

  test("bucketedRangeJoin: interval edges are inclusive-lo / exclusive-hi") {
    import spark.implicits._
    val pts = Seq((1L, 0.0), (2L, 14.999), (3L, 15.0), (4L, 29.999), (5L, 30.0))
      .toDF("id", "value")
    val ivs = Seq((10L, 0.0, 30.0)).toDF("band", "lo", "hi")
    val hit = Ranges.bucketedRangeJoin(pts, ivs, "value", "lo", "hi", 15.0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(hit == Set(1L, 2L, 3L, 4L)) // 30.0 excluded
  }

  test("asofJoin matches an in-memory merge_asof reference on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val left = (1 to 300).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    // unique (key, time) on the right, as the contract requires
    val right = rnd.shuffle((0 until 5).flatMap(k =>
      rnd.shuffle((0 until 1000).toList).take(40).map(t => (k.toLong, t.toLong, rnd.nextDouble()))))
    val out = AsOf.asofJoin(
      left.toDF("k", "t", "lid"), right.toDF("k", "t", "v"), "k", "t")
      .select("k", "t", "lid", "r_t", "r_v").collect()
      .map(r => (r.getLong(2), (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getDouble(4))))))
      .toMap
    val byKey = right.groupBy(_._1).map { case (k, rs) => k -> rs.sortBy(_._2) }
    left.foreach { case (k, t, lid) =>
      val want = byKey.get(k).flatMap(_.takeWhile(_._2 <= t).lastOption).map(r => (r._2, r._3))
      assert(out(lid) == want, s"left row $lid (k=$k, t=$t)")
    }
  }

  test("ngramJaccard df-cap: a shingle shared by every doc stays out of candidate generation") {
    import spark.implicits._
    // 60 docs all opening with the same boilerplate shingle; tails unique.
    // Uncapped, the shared shingle alone emits 60*59/2 = 1770 candidate
    // pairs into one reducer; with dfCap=10 its posting list is dropped
    // and the candidate count stays linear in the true near-dup density.
    val boiler = (1 to 60).map(i => (i.toLong, s"common license header unique$i tail$i word$i"))
    // plus one genuine near-dup pair sharing rare shingles
    val dup = Seq((100L, "alpha beta gamma delta epsilon"), (101L, "alpha beta gamma delta zeta"))
    val docs = (boiler ++ dup).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardOn(docs, "doc_id", "text", 0.5, dfCap = 10).collect()
    // boilerplate-only overlaps are gone; the real near-dup survives with
    // its exact capped-universe jaccard (its shingles are all rare:
    // shares 2 of its 3 shingles, 2/4 = 0.5)
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((100L, 101L)))
    assert(pairs.head.getDouble(2) == 0.5)
    // and the same corpus uncapped would have found the boilerplate pairs
    val uncapped = Dedup.ngramJaccardOn(docs, "doc_id", "text", 0.0, dfCap = Int.MaxValue)
    assert(uncapped.count() >= 1770L)
  }

  test("r8 operators tolerate empty and degenerate inputs") {
    import spark.implicits._
    // empty events -> no seasonal rows
    val noEvents = Seq.empty[(String, java.sql.Timestamp, Double)]
      .toDF("k", "ts", "value")
    assert(graft.operators.TimeSeries.seasonalityOn(noEvents, "k", "ts", "value").count() == 0)
    // empty corpus -> empty budget selection
    val noDocs = Seq.empty[(String, Long, String)].toDF("source", "doc_id", "text")
    assert(graft.operators.Training.tokenBudgetOn(noDocs, 1000L).count() == 0)
    // whitespace-only docs are filtered, not divided by zero
    val wsDocs = Seq(("s", 1L, "   ")).toDF("source", "doc_id", "text")
    assert(graft.operators.Training.tokenBudgetOn(wsDocs, 1000L).count() == 0)
    // empty edge set -> empty communities
    val noEdges = Seq.empty[(Long, Long)].toDF("a_item", "b_item")
    assert(graft.operators.Affinity.communityLpOn(noEdges).count() == 0)
    // empty hash/fingerprint sets -> empty near-dup pairs
    val noHashes = Seq.empty[(Long, Long)].toDF("doc_id", "ahash")
    assert(graft.operators.Multimodal.imageNearDupOn(noHashes).count() == 0)
    val noFps = Seq.empty[(Long, Int, Long)].toDF("doc_id", "win_idx", "fp")
    assert(graft.operators.Multimodal.audioNearDupOn(noFps).count() == 0)
    // empty probe/candidate sets -> empty radius search (AutoPlanes on
    // an empty candidate side resolves to the 4-plane floor, no crash)
    val q0 = Seq.empty[(Long, Array[Float])].toDF("q_id", "qv")
    val c0 = Seq.empty[(Long, Array[Float])].toDF("c_id", "cv")
    assert(Similarity.rangeSearchOn(q0, c0, 0.5).count() == 0)
  }

  test("r9-late operators tolerate empty and degenerate inputs") {
    import spark.implicits._
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val oneEval = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    // empty corpus -> empty bloom report and empty span report
    assert(graft.operators.Training
      .contaminationBloomOn(noDocs, oneEval, "doc_id", "text").count() == 0)
    assert(graft.operators.Training
      .contaminationSpansOn(noDocs, oneEval, "doc_id", "text").count() == 0)
    // empty EVAL set -> every doc reports zero hits, nothing flags
    val docs = Seq((1L, "some ordinary words here today")).toDF("doc_id", "text")
    val b = graft.operators.Training
      .contaminationBloomOn(docs, noDocs, "doc_id", "text").collect()
    assert(b.length == 1 && b.head.getAs[Long]("n_bloom_hit") == 0L
      && b.head.getAs[Int]("contaminated") == 0)
    // whitespace-only docs: entropy emits no row (no tokens), sharding
    // still routes them (zero-token load)
    val ws = Seq((1L, "   ")).toDF("doc_id", "text")
    assert(graft.operators.TextAnalysis.entropyOn(ws, "doc_id", "text").count() == 0)
    assert(graft.operators.Training.shardAssignOn(ws, "doc_id", "text").count() == 1)
    // empty corpora -> zipf reports nothing; empty edges -> no
    // predictions and no assortativity row
    assert(graft.operators.TextAnalysis.zipfOn(noDocs, "text").head
      .getAs[Long]("n_fit") == 0L)
    val noEdges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(graft.operators.Affinity.linkPredOn(noEdges).count() == 0)
    // empty vector set -> no hard negatives (AutoPlanes floor, no crash)
    val noVecs = Seq.empty[(Long, Array[Float], Int)].toDF("id", "vec", "label")
    assert(Similarity.hardNegativesOn(noVecs, k = 1).count() == 0)
    // single-observation keys vanish from the ACF (no pair at any lag)
    val one = Seq((1L, 1L, java.sql.Date.valueOf("2024-01-01"), 5.0))
      .toDF("k", "id", "day", "v")
    assert(graft.operators.TimeSeries.acfOn(one, "k", "day", "id", "v").count() == 0)
  }

  test("similarity cores: empty vector sets produce empty results") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "vec")
    assert(Similarity.cosineNearDupOn(empty, 0.5).count() == 0)
    val q = Seq.empty[(Long, Array[Float])].toDF("q_id", "qv")
    val c = Seq((1L, Array(1.0f, 0.0f))).toDF("c_id", "cv")
    assert(Similarity.bruteforceTopkOn(q, c, 3).count() == 0)
    assert(Similarity.lshTopkOn(q, c, 3).count() == 0)
  }

  test("asofJoinNearest: closer side wins, exact tie goes to the past, no-match stays null") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L),  // past at 90 (d=10), future at 150 (d=50) -> past
      (1L, 200L, 11L),  // past at 150 (d=50), future at 210 (d=10) -> future
      (1L, 250L, 12L),  // past at 210 (d=40) == future at 290 (d=40) -> past
      (2L, 500L, 13L),  // only future at 600 -> future
      (3L, 700L, 14L))  // no right rows at all -> null
      .toDF("k", "t", "lid")
    val right = Seq(
      (1L, 90L, 900.0), (1L, 150L, 901.0), (1L, 210L, 902.0), (1L, 290L, 903.0),
      (2L, 600L, 904.0))
      .toDF("k", "t", "v")
    val got = AsOf.asofJoinNearest(left, right, "k", "t", "lid")
      .orderBy("lid").collect()
      .map(r => (r.getAs[Long]("lid"),
        if (r.isNullAt(r.fieldIndex("n_t"))) -1L else r.getAs[Long]("n_t"),
        r.getAs[String]("matched_dir")))
    assert(got.toSeq == Seq(
      (10L, 90L, "past"), (11L, 210L, "future"), (12L, 210L, "past"),
      (13L, 600L, "future"), (14L, -1L, null)))
  }

  test("time-series and curation cores return empty (not error) on empty inputs") {
    import spark.implicits._
    import graft.operators.{Curate, Quality, TimeSeries}
    import graft.streaming.EventStreams
    val emptyObs = Seq.empty[(Long, Long, java.sql.Date, Double)]
      .toDF("k", "id", "day", "v")
    assert(TimeSeries.trendOn(emptyObs, "k", "day", "v").count() == 0)
    assert(TimeSeries.changepointOn(emptyObs, "k", "day", "id", "v").count() == 0)
    assert(TimeSeries.autocorrOn(emptyObs, "k", "day", "id", "v").count() == 0)
    val emptyEv = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("user_id", "ts", "value")
    assert(EventStreams.sessionNativeOn(emptyEv, 30).count() == 0)
    assert(Quality.freshnessOn(emptyEv, "user_id", "ts", 3600L).count() == 0)
    val emptyDocs2 = Seq.empty[(Long, String)].toDF("doc_id", "source")
    assert(Curate.reservoirOn(emptyDocs2, "source", "doc_id", 5).count() == 0)
    // the LSH health eval on an empty corpus reports zero counts and
    // NULL ratios — not a crash, not a NULL count row
    val ev = Dedup.minhashEvalOn(emptyDocs, "doc_id", "text", 0.5).head
    assert(ev.getAs[Long]("n_exact") == 0L && ev.getAs[Long]("n_cand") == 0L)
    assert(ev.isNullAt(ev.fieldIndex("recall_ppm")))
  }

  private lazy val deviceCases: Seq[(String, Seq[Double])] = {
    val rnd = new scala.util.Random(20260815L)
    Seq(
      "n1" -> Seq(42.0),
      "n2" -> Seq(7.0, -3.0),
      "const" -> Seq.fill(100)(5.5),
      "twoval" -> (Seq.fill(63)(1.0) ++ Seq.fill(37)(2.0)),
      // 400 rows over a 3-value domain: every trim/rank boundary lands
      // inside a tie run
      "heavy" -> Seq.fill(400)(Seq(10.0, 20.0, 30.0)(rnd.nextInt(3))),
      "uniform" -> Seq.fill(500)(rnd.nextDouble() * 1000.0),
      "negcross" -> Seq.fill(257)(rnd.nextDouble() * 40.0 - 20.0),
      // near-identical values: the bucket function must stay monotone
      // when (v - vmin)/width underflows toward 0
      "tiny" -> (0 until 100).map(i => 1.0 + i * 1e-13),
      // a 1e12× sentinel outlier: the equi-width range stretches until
      // one bucket holds everything — the outlier-guard adversary
      "sentinel" -> (Seq.fill(399)(rnd.nextDouble() * 100.0) :+ 1e14),
      // sentinels at TWO magnitudes (r15, VERDICT r14 #7): level 1's
      // re-bucketing by [bmin, 1e9] STILL collapses the [0,100] body
      // into one sub-bucket — the r14 one-level guard stopped here;
      // the fixpoint recursion must peel both magnitudes
      "sentinel2" -> (Seq.fill(398)(rnd.nextDouble() * 100.0) ++ Seq(1e9, 1e14)))
  }

  private def checkDevice(sortCap: Long): Unit = {
    import spark.implicits._
    val cases = deviceCases
    val df = cases.flatMap { case (g, vs) => vs.map(v => (g, v)) }
      .toDF("event_type", "value")
    def pround6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // exact discrete percentiles vs direct sorted-array indexing
    val pct = graft.operators.Relational.percentileExactOn(df, sortCap).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    cases.foreach { case (g, vs) =>
      val s = vs.sorted
      val n = s.length
      def at(k: Long) = s((k - 1).toInt)
      val want = (at((n + 1L) / 2), at((9L * n + 9) / 10), at((99L * n + 99) / 100))
      assert(pct(g) == want,
        s"percentiles diverged for case $g at cap $sortCap: ${pct(g)} vs $want")
    }
    // exact trimmed mean vs direct slice-and-average
    val tm = graft.operators.Relational.trimmedMeanOn(df, 4096, sortCap).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    cases.foreach { case (g, vs) =>
      val s = vs.sorted
      val k = s.length / 10
      val kept = s.slice(k, s.length - k)
      assert(tm(g)._1 == kept.length.toLong,
        s"n_kept diverged for $g at cap $sortCap")
      assert(math.abs(tm(g)._2 - pround6(kept.sum / kept.length)) <= 1e-6,
        s"trimmed mean diverged for $g at cap $sortCap: " +
          s"${tm(g)._2} vs ${pround6(kept.sum / kept.length)}")
    }
  }

  test("bucket-rank device == in-memory reference across degenerate shapes (ties, constants, n=1, sub-ulp spreads, sign crossings, sentinel outlier)") {
    checkDevice(graft.operators.Relational.LocatedSortCap)
  }

  test("bucket-rank device outlier guard: a tiny sort cap forces the constant/recursion paths on every degenerate shape — results identical") {
    // cap 2 pushes essentially every located/boundary bucket down the
    // guard: constant buckets answer arithmetically, the rest recurse
    // into sub-buckets — TO FIXPOINT since r15 (GuardMaxDepth levels,
    // then a residual sort) — and the composed ranks must match the
    // one-task sort bit for bit, ties included
    checkDevice(2L)
  }

  test("bucket-rank devices tolerate null values: excluded from the rank space, no driver NPE (r15, ADVICE r14)") {
    import spark.implicits._
    // 100 non-null values 1..100 plus 20 nulls: the r14 driver folds
    // read bmin/bmax with getDouble and NPE'd on the null bucket; the
    // contract is SQL-aggregate null skipping — targets and rank space
    // both see only the 100 non-null rows
    val vals = (1 to 100).map(i => ("A", Some(i.toDouble))) ++
      Seq.fill(20)(("A", Option.empty[Double]))
    val df = vals.toDF("event_type", "value")
    val pct = graft.operators.Relational.percentileExactOn(df).collect()
    assert(pct.length == 1)
    assert((pct(0).getDouble(1), pct(0).getDouble(2), pct(0).getDouble(3)) ==
      ((50.0, 90.0, 99.0)), pct(0).toString)
    val tm = graft.operators.Relational.trimmedMeanOn(df).collect()
    // k = 10 trimmed each end of the NON-NULL multiset: kept 11..90
    assert(tm.length == 1 && tm(0).getLong(1) == 80L)
    assert(math.abs(tm(0).getDouble(2) - 50.5) < 1e-9, tm(0).toString)
  }
}
