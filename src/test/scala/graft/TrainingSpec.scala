package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, Training}

/** Semantic invariants for the training-pipeline operators (the value
  * oracles pin cross-engine equality; these pin MEANING).
  */
class TrainingSpec extends SparkSpecBase {

  test("tokenBudgetOn: greedy best-first fill respects the budget and quality order") {
    import spark.implicits._
    // quality separates by uniqueness: 'hi' docs have distinct words,
    // 'lo' docs repeat one word; each doc is 10 tokens
    def doc(i: Int, distinct: Boolean): (String, Long, String) = {
      val words = if (distinct) (0 until 10).map(j => s"w${i}_$j")
        else Seq.fill(10)(s"rep$i")
      (if (distinct) "hi" else "lo", i.toLong, words.mkString(" "))
    }
    val docs = ((0 until 8).map(doc(_, true)) ++ (8 until 16).map(doc(_, false)))
      .toDF("source", "doc_id", "text")
    // budget of 50 tokens = exactly 5 docs; all must come from 'hi'
    val out = graft.operators.Training.tokenBudgetOn(docs, 50L).collect()
    assert(out.length == 1 && out.head.getAs[String]("source") == "hi", out.toSeq.toString)
    assert(out.head.getAs[Long]("n_docs") == 5 && out.head.getAs[Long]("n_tokens") == 50)
    // greedy tie-break by id: docs 0..4 selected
    assert(out.head.getAs[Long]("id_sum") == (0L + 1 + 2 + 3 + 4))
    // a budget below one document selects nothing
    assert(graft.operators.Training.tokenBudgetOn(docs, 9L).count() == 0)
  }

  import spark.implicits._

  test("contamination: a doc quoting an eval doc verbatim flags; disjoint text does not") {
    val eval = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "intro text then the quick brown fox jumps over the lazy dog and more"),
      (11L, "completely unrelated words about spark shuffles and parquet footers"))
      .toDF("doc_id", "text")
    val r = Training.contaminationOn(corpus, eval, "doc_id", "text", 0.5)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Boolean]("contaminated")).toMap
    assert(r(10L), "verbatim quote must flag")
    assert(!r(11L), "disjoint text must not flag")
  }

  test("contamination bloom: no false negatives — n_true_hit equals the unfiltered check's n_hit") {
    val d = graft.util.Tables.documents(spark, SfDir)
    val corpus = d.filter(col("doc_id") % 97 =!= 0)
    val eval = d.filter(col("doc_id") % 97 === 0)
    val bloom = Training.contaminationBloomOn(corpus, eval, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bloom_hit"), r.getAs[Long]("n_true_hit"),
          r.getAs[Long]("n_fp"))).toMap
    val exact = Training.contaminationOn(corpus, eval, "doc_id", "text", 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hit")).toMap
    assert(bloom.keySet == exact.keySet)
    bloom.foreach { case (id, (bh, th, fp)) =>
      assert(th == exact(id), s"doc $id: bloom-verified $th vs exact ${exact(id)}")
      assert(fp == bh - th && fp >= 0L, s"doc $id: fp accounting")
    }
    // the bloom actually prunes: across the corpus, bloom hits must be
    // far below total shingles (a saturated filter would pass everything
    // and the prefilter would be a no-op at 100 TB)
    val totalShingles = Training.contaminationBloomOn(corpus, eval, "doc_id", "text")
      .agg(sum(col("n_shingles")), sum(col("n_bloom_hit"))).head
    assert(totalShingles.getLong(1) < totalShingles.getLong(0) / 2,
      s"filter saturated: ${totalShingles.getLong(1)} of ${totalShingles.getLong(0)} shingles pass")
  }

  test("contamination spans: the leaked quote localizes to its exact token range") {
    val eval = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val corpus = Seq(
      // tokens 3..11 are the 9-token quote -> shingle positions 3..9,
      // one maximal span [3, 11] with 7 matched shingles
      (10L, "intro text then the quick brown fox jumps over the lazy dog and more"),
      (11L, "completely unrelated words about spark shuffles and parquet footers"))
      .toDF("doc_id", "text")
    val r = Training.contaminationSpansOn(corpus, eval, "doc_id", "text").collect()
    assert(r.length == 1, r.mkString(";"))
    assert(r.head.getAs[Long]("doc_id") == 10L)
    assert(r.head.getAs[Long]("span_start") == 3L && r.head.getAs[Long]("span_end") == 11L,
      r.head.toString)
    assert(r.head.getAs[Long]("n_matched") == 7L)
    // two disjoint quotes in one doc -> two separate spans
    val split = Seq((20L,
      "the quick brown fox zzz yyy xxx over the lazy dog qqq")).toDF("doc_id", "text")
    val r2 = Training.contaminationSpansOn(split, eval, "doc_id", "text")
      .orderBy(col("span_start")).collect()
    assert(r2.length == 2, r2.mkString(";"))
  }

  test("contamination bloom: a verbatim eval quote flags; disjoint text does not") {
    val eval = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "intro text then the quick brown fox jumps over the lazy dog and more"),
      (11L, "completely unrelated words about spark shuffles and parquet footers"))
      .toDF("doc_id", "text")
    val r = Training.contaminationBloomOn(corpus, eval, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Int]("contaminated")).toMap
    assert(r(10L) == 1, "verbatim quote must flag")
    assert(r(11L) == 0, "disjoint text must not flag")
  }

  test("shard assign: every shard populated, loads near-balanced, ids mixed not striped") {
    // structural facts on testdata: total routing and full shard cover
    // (the 500-doc corpus is too small for a tight balance gate —
    // multinomial doc-count sd alone is ~18% per shard there)
    val r = Training.shardAssign(spark, SfDir).collect()
    assert(r.length == Training.NShards, s"empty shards: ${r.length} of ${Training.NShards}")
    val totalDocs = r.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs == graft.util.Tables.documents(spark, SfDir).count(),
      "every doc routed to exactly one shard")
    // the balance gate runs where the law of large numbers applies:
    // 20k uniform docs → 1250/shard, sd ~2.8%, so ±10% catches any
    // structural bias while never tripping on noise
    val big = spark.range(20000L).toDF("doc_id")
      .withColumn("text", expr(
        "concat_ws(' ', transform(sequence(1, 20), j -> concat('w', pmod(hash(doc_id, j), 997))))"))
    val loads = Training.shardAssignOn(big, "doc_id", "text").collect()
    assert(loads.length == Training.NShards)
    loads.foreach { row =>
      val ppm = row.getAs[Long]("load_ppm")
      assert(ppm > 900000 && ppm < 1100000,
        s"structural imbalance: shard ${row.getAs[Long]("shard")} at $ppm ppm of ideal")
    }
    // square-mix scatters consecutive ids: the 16 lowest doc_ids must
    // NOT land on 16 distinct shards in id order (the bare-LCG stripe)
    import spark.implicits._
    val first = (0L until 16L).toDF("doc_id")
      .withColumn("text", lit("a b c"))
    val shards = Training.shardAssignOn(first, "doc_id", "text")
      .orderBy("shard").collect().map(_.getAs[Long]("shard"))
    assert(shards.distinct.length < 16,
      s"consecutive ids stripe one-per-shard — assignment is not mixed: ${shards.toSeq}")
  }

  test("pack: budget semantics — a doc belongs to the pack of its starting offset") {
    // 5 docs x 300 tokens in one shard, budget 512: starts at 0,300,600,...
    // -> packs 0,0,1,1,2
    val docs = (0L to 4L).map(i => (i, Seq.fill(300)("tok").mkString(" "))).toDF("doc_id", "text")
    val r = Training.packOn(docs, "doc_id", "text").orderBy("pack_id").collect()
    assert(r.map(_.getAs[Long]("pack_id")).toSeq == Seq(0L, 1L, 2L))
    assert(r.map(_.getAs[Long]("n_docs")).toSeq == Seq(2L, 2L, 1L))
    // every doc's tokens counted exactly once
    assert(r.map(_.getAs[Long]("total_tokens")).sum == 1500L)
  }

  test("pack: shards pack independently (pack ids never cross shards)") {
    val r = Training.pack(spark, SfDir).collect()
    r.foreach { row =>
      val pack = row.getAs[Long]("pack_id")
      val firstDoc = row.getAs[Long]("first_doc")
      assert(pack / 1000000L == firstDoc / Training.PackShard,
        s"pack $pack claims a doc from another shard ($firstDoc)")
    }
  }

  test("cross-corpus dedup: finds planted near-dups, never pairs within one corpus") {
    val r = Training.crossCorpus(spark, SfDir).collect()
    assert(r.nonEmpty, "testdata plants near-dups across the even/odd split")
    r.foreach { row =>
      assert(row.getAs[Long]("new_id") % 2 == 1)
      assert(row.getAs[Long]("snap_id") % 2 == 0)
      assert(row.getAs[Double]("est_sim") >= 0.5)
    }
  }

  test("diversity: constant doc vs all-distinct doc bracket the scores") {
    val docs = Seq(
      (1L, Seq.fill(50)("same").mkString(" ")),            // zero diversity
      (2L, (1 to 50).map(i => s"w$i").mkString(" ")))      // max diversity
      .toDF("doc_id", "text")
    val r = Training.diversityOn(docs, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Double]("ttr") == 0.02 && r(1L).getAs[Double]("simpson") == 0.0
      && r(1L).getAs[Double]("top_ratio") == 1.0)
    assert(r(2L).getAs[Double]("ttr") == 1.0 && r(2L).getAs[Double]("simpson") == 0.98
      && r(2L).getAs[Double]("top_ratio") == 0.02)
  }

  test("edge cases: empty eval set, zero-token docs, empty corpus side") {
    val docs = Seq((1L, "some regular document text here okay"), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    val none = docs.filter(col("doc_id") < 0)
    // empty eval set: nothing can be contaminated, zero-token docs drop
    val c = Training.contaminationOn(docs, none, "doc_id", "text", 0.5).collect()
    assert(c.forall(r => !r.getAs[Boolean]("contaminated") && r.getAs[Long]("n_hit") == 0L))
    assert(!c.exists(r => r.getAs[Long]("doc_id") >= 2L), "shingle-less docs must drop")
    // packing: zero-token docs pack (contributing nothing to the budget)
    val p = Training.packOn(docs, "doc_id", "text").collect()
    assert(p.map(_.getAs[Long]("n_docs")).sum == 3L)
    // cross-corpus with an empty snapshot: no pairs, no crash
    assert(Training.crossCorpusOn(docs, none, "doc_id", "text", 0.5).count() == 0L)
    // diversity drops token-less docs
    assert(Training.diversityOn(docs, "doc_id", "text").count() == 1L)
  }

  test("mix: kept fraction tracks the PPM weight and the predicate is shuffle-free") {
    import graft.util.Tables
    val docs = Tables.documents(spark, SfDir)
    val kept = Training.mixOn(docs, "doc_id", "source",
      Map.empty, defaultPpm = 300000L)
    val rate = kept.count().toDouble / docs.count()
    assert(rate > 0.15 && rate < 0.45, s"30% mixture kept $rate")
    // scan-side claim: the mixture filter adds NO exchange to the scan
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mix filter introduced a shuffle:\n$plan")
    // reproducible: a second evaluation keeps the identical id set
    val a = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Training.mixOn(docs, "doc_id", "source", Map.empty, 300000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("winnowing guarantee: docs sharing a long-enough run share a fingerprint; disjoint docs don't") {
    import graft.operators.TextAnalysis
    // shared run of WinnowW + 2 = 6 tokens inside otherwise-different docs
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two three four five $shared six seven eight nine"),
      (2L, s"red orange yellow $shared green blue indigo violet extra"),
      (3L, "totally disjoint vocabulary nothing in common here at all okay"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.winnowOn(docs, "doc_id", "text")
      .collect().groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rows) => id -> rows.map(_.getAs[Long]("fp")).toSet }
    assert((fps(1L) & fps(2L)).nonEmpty, "guaranteed shared fingerprint missing")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty,
      "disjoint docs must not share fingerprints")
  }

  test("vocab coverage: cumulative share is monotone and reaches 1.0 when K covers the vocab") {
    import graft.operators.TextAnalysis
    val r = TextAnalysis.vocabCoverage(spark, SfDir).orderBy("rank").collect()
    assert(r.nonEmpty)
    val shares = r.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b }, "cum_share must be monotone")
    val counts = r.map(_.getAs[Long]("cnt"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b }, "rank order must follow counts")
    if (r.length < 100) // K covered the whole vocabulary
      assert(math.abs(shares.last - 1.0) < 1e-9, s"full-vocab coverage was ${shares.last}")
  }

  test("class centroid: separates aligned members from a planted outlier") {
    // class 0 clusters on axis e1, class 1 on e2; vector 99 carries label 0
    // but points along e2 — the mislabel the score exists to surface
    def vec(main: Int, wobble: Float): Seq[Float] =
      (0 until 64).map(d => if (d == main) 1.0f else if (d == main + 2) wobble else 0.0f)
    val rows =
      (0L to 4L).map(i => (i, 0, vec(0, 0.1f * i))) ++
        (5L to 9L).map(i => (i, 1, vec(1, 0.1f * (i - 5)))) :+
        ((99L, 0, vec(1, 0.0f)))
    val df = rows.toDF("id", "label", "vec")
    val r = Similarity.classCentroidOn(df)
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Double]("cos_centroid")).toMap
    (0L to 9L).foreach(i => assert(r(i) > 0.9, s"aligned member $i scored ${r(i)}"))
    assert(r(99L) < 0.5, s"planted outlier scored ${r(99L)} — should be far from its centroid")
    // full testdata: scores well-formed and positively biased (self-inclusion)
    val td = Similarity.classCentroid(spark, SfDir)
    assert(td.filter(col("cos_centroid") < -1.000001 || col("cos_centroid") > 1.000001).count() == 0)
    assert(td.agg(avg("cos_centroid")).head.getDouble(0) > 0.0)
  }

  test("dsir: target-vocabulary probes outrank off-target probes; keep follows the sign") {
    import spark.implicits._
    // target slice = lang 'en' docs on vocabulary A; raw-only noise on
    // vocabulary B. Probe 9 (A-vocab, OUTSIDE the target slice) must
    // outscore probe 10 (B-vocab): its features are relatively frequent
    // in the target distribution, B-vocab features appear 0 times there.
    // Note the smoothing floor: with B=1024 buckets and a toy corpus the
    // add-one prior dominates, so even A-vocab scores sit near 0 — the
    // ORDERING is the invariant, not positivity (the sf0.001 binding
    // keeps 81/500 docs, so real corpora do produce positive scores).
    val docs = ((1L to 4L).map(i => (i, "alpha beta gamma delta", "en")) ++
      (5L to 8L).map(i => (i, "zeta eta theta iota", "xx")) ++
      Seq((9L, "alpha beta gamma delta", "xx"),
          (10L, "zeta eta theta iota", "xx"))).toDF("doc_id", "text", "lang")
    val out = Training.dsirOn(docs, "doc_id", "text", col("lang") === "en")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dsir_fp"), r.getAs[Int]("keep"))).toMap
    assert(out.size == 10)
    assert(out(9L)._1 > out(10L)._1,
      s"target-vocab probe ${out(9L)._1} must outscore off-target ${out(10L)._1}")
    assert(out(10L)._1 < 0, "a feature set absent from the target must score negative")
    // identical text => identical integer score (the exactness contract)
    assert(out(9L)._1 == out(1L)._1)
    // keep is exactly the sign bit of the fixed-point score
    out.values.foreach { case (fp, k) => assert(k == (if (fp >= 0) 1 else 0)) }
    // full testdata binding: both classes occur and scores are bounded
    val td = Training.dsir(spark, SfDir)
    val keeps = td.groupBy("keep").count().collect()
      .map(r => r.getAs[Int]("keep") -> r.getAs[Long]("count")).toMap
    assert(keeps.getOrElse(1, 0L) > 0 && keeps.getOrElse(0, 0L) > 0,
      s"degenerate keep split on testdata: $keeps")
  }
}
