package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal main: the minhash→cluster→keep-best dedup stack on
  * a synthetic corpus 10-100× the ScaleSmokeSpec sizes — the dry run
  * for the 100 TB posture that a unit-test wall-clock budget can't
  * host. Run it by hand (not part of `sbt test`):
  *
  *   SPARK_GRAFT_CPUS=32 sbt 'runMain graft.ScaleRehearsal 2000000'
  *
  * The corpus is generated ON THE EXECUTORS (spark.range + hash-derived
  * words — a driver-side Seq of 2M docs would serialize ~400 MB through
  * the driver, the exact anti-pattern the operators avoid), with the
  * same planted structure the smoke specs verify: doc k*100 duplicated
  * at id N+k with its first word mutated (3-shingle jaccard ≈ 0.93).
  *
  * Prints ONE JSON line with per-stage seconds and the three
  * invariants that matter at scale: candidate-pair volume linear-ish
  * in N (a degenerate signature goes quadratic), planted-pair recall,
  * and survivor count (over-merge shows up as a deficit). Exits
  * nonzero if any invariant fails — this is a gate, not a demo.
  */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val planted = math.max(n / 100, 1L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // vocabulary scales with N so band-collision behavior mirrors a
    // real corpus (fixed small vocab at 2M docs would overload the
    // posting-list df-cap instead of exercising LSH)
    val vocab = math.max(4000L, n / 50)
    def words(idCol: String, from: Int) = expr(
      s"transform(sequence($from, 30), j -> concat('w', pmod(hash($idCol, j), $vocab)))")
    val base = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", words("id", 1)).as("text"))
    val dups = spark.range(planted).select((col("id") + n).as("doc_id"),
      concat(lit("mutated "), concat_ws(" ", words("id * 100", 2))).as("text"))
    val docs = base.unionByName(dups).persist()
    val nDocs = docs.count()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val (pairs, tPairs) = timed {
      val p = graft.operators.Dedup.minhashLshOn(docs, "doc_id", "text")
        .filter(col("est_sim") >= 0.5).persist()
      p.count(); p
    }
    val nPairs = pairs.count()
    val nPlantedFound = pairs
      .filter(col("b_id") >= n && col("a_id") === (col("b_id") - n) * 100)
      .count()
    val (clusters, tCluster) = timed {
      val c = graft.operators.Dedup.clustersOn(
        pairs, docs.select(col("doc_id").as("id"))).persist()
      c.count(); c
    }
    val (nSurv, tKeep) = timed {
      clusters.groupBy(col("cluster_id"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_members"))
        .count()
    }

    val pairOk = nPairs < n * 2
    val recallOk = nPlantedFound >= (planted * 95) / 100
    val survOk = nSurv <= n + planted / 20 && nSurv >= n - planted
    println(s"""{"metric":"scale_rehearsal","n_docs":$nDocs,"n_pairs":$nPairs,""" +
      s""""planted_found":$nPlantedFound,"planted":$planted,"n_survivors":$nSurv,""" +
      s""""pairs_sec":${f"$tPairs%.1f"},"cluster_sec":${f"$tCluster%.1f"},""" +
      s""""keep_sec":${f"$tKeep%.1f"},""" +
      s""""pair_volume_ok":$pairOk,"recall_ok":$recallOk,"survivors_ok":$survOk}""")
    spark.stop()
    if (!(pairOk && recallOk && survOk)) sys.exit(1)
  }
}
