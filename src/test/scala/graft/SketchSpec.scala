package graft

import org.apache.spark.sql.functions._

/** Engine sketch utilities (df.stat): Bloom filter and Count-Min
  * sketch, both computed DISTRIBUTIVELY (per-partition sketches merged
  * up the tree — the mergeable-state property that makes them usable
  * over a 100 TB scan) with the driver holding only the fixed-size
  * state. Complements the oracled sketch queries (q19 HLL,
  * q28 approx quantile, q36 HLL merge, text_heavy_hitters top-k).
  */
class SketchSpec extends SparkSpecBase {

  private def docs = spark.read.parquet(s"$SfDir/documents.parquet")

  test("bloom filter over snapshot fingerprints: zero false negatives, bounded false positives") {
    // the memory-bounded fast path of cross-corpus dedup: probe new
    // fingerprints against a snapshot-side bloom before any join
    val fp = graft.operators.TextAnalysis.fingerprintOn(docs, "doc_id", "text")
    val snapshot = fp.filter(col("doc_id") % 2 === 0)
    val bf = snapshot.stat.bloomFilter("fp64", 10000L, 0.03)
    // no false negatives — every snapshot member must hit
    val members = snapshot.select("fp64").collect().map(_.getLong(0))
    assert(members.forall(bf.mightContain), "bloom filter lost a member (impossible)")
    // false-positive rate on definite non-members stays near the target
    val universe = fp.select("fp64").collect().map(_.getLong(0)).toSet
    val probes = (1L to 20000L).map(_ * 1000003L).filterNot(universe)
    val fpRate = probes.count(bf.mightContain).toDouble / probes.size
    assert(fpRate < 0.06, s"false-positive rate $fpRate vs configured 0.03")
  }

  test("count-min sketch over tokens: estimates always >= exact, within eps*N") {
    import graft.functions.TextFns
    val tokens = docs.select(explode(TextFns.tokenize(col("text"))).as("w"))
    val n = tokens.count()
    val eps = 0.001
    val cms = tokens.stat.countMinSketch(col("w"), eps, 0.99, 42)
    val exact = tokens.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    exact.foreach { case (w, c) =>
      val est = cms.estimateCount(w)
      assert(est >= c, s"CMS underestimated '$w': $est < $c (impossible)")
      assert(est <= c + (eps * n).toLong + 1,
        s"CMS error for '$w' beyond eps*N: $est vs $c (N=$n)")
    }
  }
}
