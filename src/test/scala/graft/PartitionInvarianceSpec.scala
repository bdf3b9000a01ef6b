package graft

/** Determinism under parallelism: the same query must produce
  * bit-identical rows at different shuffle-partition counts. This is
  * the 100 TB concern the DuckDB oracle cannot see — the oracle run
  * fixes ONE partitioning, but a production cluster's width changes
  * with autoscaling, and any operator whose result depends on
  * partition count (float summation order, unstable intra-group
  * ordering, partition-id leakage) silently breaks reproducibility.
  * The operators were designed order-independent (integer/rational
  * arithmetic, explicit tie-breaks); this spec PROVES it for the
  * float-adjacent and ordering-sensitive ones by running each at 2
  * and at 13 shuffle partitions (13 is prime — no accidental
  * alignment with the 4-partition base config) and diffing the full
  * row multisets.
  */
class PartitionInvarianceSpec extends SparkSpecBase {

  // float-bearing aggregations, iterative fixpoints, windowed
  // orderings, sketches with declared determinism, and the new
  // round's moment arithmetic
  private val Sensitive = Seq(
    "ts_ewma", "text_tfidf", "embed_kmeans", "dedup_minhash",
    "q52_pagerank", "q21_stats_agg", "ts_trend", "ts_autocorr",
    "ts_changepoint", "ts_active_users", "pipeline_reservoir",
    "q43_triangles", "dedup_minhash_eval", "q46_topk_agg",
    "pipeline_mix_temp", "asof_join_nearest", "dedup_threshold_sweep",
    "ts_theil_sen", "q61_session_conversion",
    // r8: seasonal DECIMAL ratio, PCA double projections over a trained
    // basis, LPA fixpoint, sketch-audit verdicts, radius-search counts
    "ts_seasonality", "embed_pca", "q64_community_lp",
    "q63_sketch_audit", "sim_range_search",
    // r9: the two-stage IVF (double cosines in assignment/probing plus
    // the quantized-integer shortlist — every tie broken on ids), the
    // decoded-PCM spectral profile (per-doc local computation), the
    // cell-balance audit, and the IVFPQ composite (Lloyd fixpoints +
    // cosine routing + LUT sums, all id-tie-broken)
    "sim_ivf_refine", "mm_audio_fp", "sim_ivf_health", "sim_ivfpq",
    // r9: RAKE — collect_list assembly + integer scoring, pos-sorted
    "text_keyphrases",
    // r9 late: BFS frontier iteration (min-dist confluence), the
    // integer rule filter's grouped stats, and the decoded-GIF scene
    // profile (per-doc local computation + lag window)
    "q65_bfs", "text_gopher_rules", "mm_video_scenes",
    // r9 late: kmeans+exemplar cosine composite, LSH-seeded frontier
    // beam over the NN-Descent graph (double cosines at every keep
    // decision), and the fixed-point log2 importance weights (integer
    // sums — invariance here gates the feature explode + broadcast
    // join shape, not arithmetic)
    "dedup_semantic", "sim_graph_beam", "pipeline_dsir",
    // r10: the NN-Descent build itself (was only gated indirectly
    // through sim_graph_beam; the beam binding now memoizes the graph
    // artifact, so the build needs its own direct gate), and the
    // layered HNSW search (double cosines at every descent keep)
    "sim_knn_graph", "sim_hnsw",
    // r10 sweep — every remaining operator whose result COULD depend
    // on partitioning, by class:
    // double-sum/avg/ratio aggregations (float addition order)
    "q1_agg", "q3_join_agg", "etl_star_revenue", "etl_star_topn",
    "q16_subquery_avg", "q32_window_pct", "q35_histogram",
    "q49_cohort_retention", "q57_ab_test", "dq_outliers",
    "dq_profile_drift", "q51_assoc_rules",
    // float interpolation / per-key imperative passes (the two-heap
    // rolling median runs mapPartitions over key-sorted frames)
    "ts_gapfill", "ts_interp_linear", "ts_ohlc",
    "ts_rolling_median", "ts_rolling_median_wide",
    // sketches whose merge must be order/partition-free by design
    "q19_udaf_hll", "q36_hll_union", "q28_approx_quantile",
    "q62_quantile_rollup",
    // hash-derived sampling (deterministic by construction — proven)
    "q25_sample_hash", "pipeline_stratified",
    // iterative fixpoints not already gated
    "q59_coreness", "q56_kcore", "q54_khop", "text_bpe_train", "q70_ppr",
    // quantization chains + float evals over pinned models
    "embed_pq", "embed_rq", "embed_opq", "sim_pq_adc",
    "sim_mips_ann", "sim_recall_eval", "embed_mrl_eval",
    // islands/window assembly over matched positions
    "dedup_exact_spans",
    // r10 late: binary-code rerank (double cosines), merge-table apply
    "sim_hamming_ann", "text_bpe_apply",
    // r9 late: Bellman-Ford min-confluence distances and the expanded
    // weighted-minhash signature mins (both pure-integer aggregates —
    // invariance gates the frontier/banding join shapes)
    "q66_sssp", "dedup_minhash_weighted",
    // r9 late: bloom word-packing bit_or + broadcast membership joins,
    // the sequential greedy argmax (head() reads must not depend on
    // partitioning — ties broken on id), capped wedge generation +
    // degree joins, the decoded-PNG DCT near-dup pairs, and the
    // windowed rank (all integer; invariance gates the join shapes
    // and tie-breaks)
    "contamination_bloom", "sim_mmr", "q68_link_pred",
    "mm_image_phash", "stream_topk",
    // r9 late: cross-label bucket-join negatives (double cosines,
    // id tie-breaks), single-row moment correlations, the greedy
    // coverage argmin, and the top-K head fit (sort-limit ties broken
    // on the token)
    "sim_hard_negatives", "q69_assortativity", "sim_kcenter",
    "text_zipf",
    // r9 late: islands grouping over matched shingle positions, and
    // the multi-lag moment profile (same class as ts_autocorr)
    "contamination_spans", "ts_acf",
    // r9 late: top-20 boundary determinism under the two-phase rollup,
    // and the trailing range-frame volume monitor
    "q67_sole_blame", "dq_volume_anomaly",
    // r11: LM fit + fixed-point scoring + per-language ntile (tie-
    // broken), the delta-admission maintenance pass (LSH seed + local
    // repair fixpoint), filtered multi-table LSH (double cosines, id
    // tie-breaks), the top-10 boundary in the skew diagnostics, and
    // the anti-join/provenance assembly
    "text_perplexity", "sim_knn_insert", "sim_filtered_ann",
    "dq_skew_profile", "etl_late_dim",
    // r11 late: centroid-affinity doubles + two exact-median passes
    "embed_outliers")

  private def rowsAt(name: String, partitions: Int): Seq[String] = {
    spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    try SparkEntry.queries(name)(spark, SfDir)
      .collect().map(_.toString).sorted.toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }

  Sensitive.foreach { name =>
    test(s"$name: identical rows at 2 and 13 shuffle partitions") {
      spark.catalog.clearCache()
      val a = rowsAt(name, 2)
      spark.catalog.clearCache()
      val b = rowsAt(name, 13)
      assert(a.size == b.size, s"row count diverged: ${a.size} vs ${b.size}")
      val diff = a.zip(b).find { case (x, y) => x != y }
      assert(diff.isEmpty,
        diff.map { case (x, y) => s"first diverging row: $x vs $y" }.getOrElse(""))
    }
  }
}
