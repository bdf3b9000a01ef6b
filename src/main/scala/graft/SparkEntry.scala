package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Affinity, AsOf, Curate, Dedup, Multimodal, Quality, Ranges, Relational, RetailEtl, Similarity, TextAnalysis, TimeSeries, Training}
import graft.streaming.EventStreams

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RetailEtl.starRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.A retail ETL surface
    "etl_clean"          -> RetailEtl.clean _,
    "etl_scd1_customers" -> RetailEtl.scd1Customers _,
    "etl_scd1_products"  -> RetailEtl.scd1Products _,
    "etl_scd1_merge"     -> RetailEtl.scd1Merge _,
    "etl_fk_audit"       -> RetailEtl.fkAudit _,
    "etl_dim_dates"      -> RetailEtl.dimDates _,
    "etl_fact_build"     -> RetailEtl.factBuild _,
    "etl_star_revenue"   -> RetailEtl.starRevenue _,
    "etl_star_topn"      -> RetailEtl.starTopn _,
    // §2.B core relational engine
    "q1_agg"             -> Relational.q1Agg _,
    "q2_filter_project"  -> Relational.q2FilterProject _,
    "q3_join_agg"        -> Relational.q3JoinAgg _,
    "q4_broadcast_join"  -> Relational.q4BroadcastJoin _,
    "q5_semi_anti"       -> Relational.q5SemiAnti _,
    "q6_window_topn"     -> Relational.q6WindowTopn _,
    "q7_running_window"  -> Relational.q7RunningWindow _,
    "q8_distinct"        -> Relational.q8Distinct _,
    "q9_sort_limit"      -> Relational.q9SortLimit _,
    "q10_setops"         -> Relational.q10SetOps _,
    "q11_rollup"         -> Relational.q11Rollup _,
    "q12_case_pivot"     -> Relational.q12CasePivot _,
    "q13_date_funcs"     -> Relational.q13DateFuncs _,
    "q14_string_funcs"   -> Relational.q14StringFuncs _,
    "q15_json"           -> Relational.q15Json _,
    "q16_subquery_avg"   -> Relational.q16SubqueryAvg _,
    "q17_having"         -> Relational.q17Having _,
    "q18_null_handling"  -> Relational.q18NullHandling _,
    "q19_udaf_hll"       -> Relational.q19UdafHll _,
    "q20_salted_agg"     -> Relational.q20SaltedAgg _,
    "q21_stats_agg"      -> Relational.q21StatsAgg _,
    "q22_outer_join"     -> Relational.q22OuterJoin _,
    "q23_window_nav"     -> Relational.q23WindowNav _,
    "q24_cube"           -> Relational.q24Cube _,
    "q26_collect"        -> Relational.q26Collect _,
    "q27_explode"        -> Relational.q27Explode _,
    "q28_approx_quantile" -> Relational.q28ApproxQuantile _,
    "q29_not_in_null"    -> Relational.q29NotInNull _,
    "q30_date_arith"     -> Relational.q30DateArith _,
    "q31_unpivot"        -> Relational.q31Unpivot _,
    "q32_window_pct"     -> Relational.q32WindowPct _,
    "q25_sample_hash"    -> Relational.q25SampleHash _,
    "q33_lateral"        -> Relational.q33Lateral _,
    "q34_funnel"         -> Relational.q34Funnel _,
    "q35_histogram"      -> Relational.q35Histogram _,
    "q36_hll_union"      -> Relational.q36HllUnion _,
    "q37_incr_agg"       -> Relational.q37IncrAgg _,
    "q38_pivot_native"   -> Relational.q38PivotNative _,
    "q41_salted_join"    -> Relational.q41SaltedJoin _,
    "q42_copurchase"     -> Affinity.copurchase _,
    "q60_bipartite_proj" -> Affinity.bipartiteProj _,
    "q62_quantile_rollup" -> Relational.q62QuantileRollup _,
    "q63_sketch_audit"   -> Relational.q63SketchAudit _,
    "q44_map_funcs"      -> Relational.q44MapFuncs _,
    "q45_transitions"    -> Relational.q45Transitions _,
    "q46_topk_agg"       -> Relational.q46TopkAgg _,
    "q47_grouping_sets"  -> Relational.q47GroupingSets _,
    "q48_setops_all"     -> Relational.q48SetopsAll _,
    "dq_constraints"     -> Quality.dqConstraints _,
    "dq_outliers"        -> Quality.dqOutliers _,
    "ts_gapfill"         -> TimeSeries.gapfill _,
    "ts_concurrency"     -> TimeSeries.concurrency _,
    "ts_islands"         -> TimeSeries.islands _,
    "ts_ohlc"            -> TimeSeries.ohlc _,
    "q49_cohort_retention" -> TimeSeries.cohortRetention _,
    "q50_mode"           -> Relational.q50Mode _,
    "etl_rfm"            -> RetailEtl.rfm _,
    "etl_late_dim"       -> RetailEtl.lateDim _,
    "etl_fact_accumulating" -> RetailEtl.factAccumulating _,
    "etl_scd2"           -> RetailEtl.scd2Customers _,
    "etl_cdc_diff"       -> RetailEtl.cdcDiff _,
    "etl_pit_lookup"     -> RetailEtl.pitLookup _,
    "etl_dim_serial"     -> RetailEtl.dimSerial _,
    "q51_assoc_rules"    -> Affinity.assocRules _,
    "q52_pagerank"       -> Affinity.pagerank _,
    "q71_percentile_exact" -> Relational.q71PercentileExact _,
    "q72_mode_exact"      -> Relational.q72ModeExact _,
    "q73_trimmed_mean"    -> Relational.q73TrimmedMean _,
    "q70_ppr"            -> Affinity.ppr _,
    "q59_coreness"       -> Affinity.coreness _,
    "q64_community_lp"   -> Affinity.communityLp _,
    "q65_bfs"            -> Affinity.bfs _,
    "q66_sssp"           -> Affinity.sssp _,
    "q68_link_pred"      -> Affinity.linkPred _,
    "q69_assortativity"  -> Affinity.assortativity _,
    "text_bm25"          -> TextAnalysis.bm25 _,
    "dedup_spans"        -> Dedup.spanDedup _,
    "dedup_exact_spans"  -> Dedup.exactSpans _,
    "text_repetition"    -> TextAnalysis.repetition _,
    "text_keyphrases"    -> TextAnalysis.keyphrases _,
    "text_gopher_rules"  -> TextAnalysis.gopherRules _,
    "text_entropy"       -> TextAnalysis.entropy _,
    "text_perplexity"    -> TextAnalysis.perplexity _,
    "text_zipf"          -> ((s: SparkSession, d: String) => TextAnalysis.zipf(s, d)),
    "text_compress_ratio" -> TextAnalysis.compressRatio _,
    "text_surprise"      -> TextAnalysis.surprise _,
    "ts_ewma"            -> TimeSeries.ewma _,
    "pipeline_split"     -> Training.split _,
    "pipeline_token_budget" -> Training.tokenBudget _,
    "pipeline_shard_assign" -> Training.shardAssign _,
    "pipeline_length_buckets" -> ((s: SparkSession, d: String) => Training.lengthBuckets(s, d)),
    "pipeline_dsir"      -> Training.dsir _,
    "text_bpe_pairs"     -> ((s: SparkSession, d: String) => TextAnalysis.bpePairs(s, d)),
    "text_bpe_train"     -> TextAnalysis.bpeTrain _,
    "text_bpe_apply"     -> TextAnalysis.bpeApply _,
    "sim_hamming_ann"    -> Similarity.hammingAnn _,
    "q53_skyline"        -> Relational.q53Skyline _,
    "ts_interp_linear"   -> TimeSeries.interpLinear _,
    "ts_merge_intervals" -> TimeSeries.mergeIntervals _,
    "ts_seasonality"     -> TimeSeries.seasonality _,
    "ts_cum_distinct"    -> TimeSeries.cumDistinct _,
    "ts_active_users"    -> TimeSeries.activeUsers _,
    "q55_attribution"    -> TimeSeries.attribution _,
    "ts_rolling_median"  -> TimeSeries.rollingMedian _,
    "ts_rolling_median_wide" -> TimeSeries.rollingMedianWide _,
    "ts_trend"           -> TimeSeries.trend _,
    "ts_theil_sen"       -> TimeSeries.theilSen _,
    "ts_changepoint"     -> TimeSeries.changepoint _,
    "ts_autocorr"        -> TimeSeries.autocorr _,
    "ts_acf"             -> TimeSeries.acf _,
    "dedup_minhash_eval" -> Dedup.minhashEval _,
    "ts_out_of_order"    -> TimeSeries.outOfOrder _,
    "stream_watermark_size" -> TimeSeries.watermarkRecommend _,
    "q58_entry_paths"    -> TimeSeries.entryPaths _,
    "text_bigram_surprise" -> TextAnalysis.bigramSurprise _,
    "q57_ab_test"        -> Relational.q57AbTest _,
    "q67_sole_blame"     -> Relational.q67SoleBlame _,
    "q56_kcore"          -> Affinity.kcore _,
    "dq_profile_drift"   -> Quality.dqProfileDrift _,
    "dq_freshness"       -> Quality.dqFreshness _,
    "dq_volume_anomaly"  -> Quality.dqVolumeAnomaly _,
    "dq_skew_profile"    -> Quality.dqSkewProfile _,
    "dq_completeness"    -> Quality.dqCompleteness _,
    "embed_mrl_eval"      -> Similarity.mrlEval _,
    "sim_recall_eval"    -> Similarity.recallEval _,
    "dedup_threshold_sweep" -> Similarity.thresholdSweep _,
    "sim_mips_ann"       -> Similarity.mipsAnn _,
    "sim_range_search"   -> Similarity.rangeSearch _,
    "dq_mad_outliers"    -> Quality.dqMadOutliers _,
    "dq_benford"         -> Quality.dqBenford _,
    "q54_khop"           -> Affinity.khop _,
    "embed_quantize"     -> Similarity.quantize _,
    "embed_dim_stats"    -> Similarity.dimStats _,
    "dedup_bag"          -> Dedup.bag _,
    "pipeline_quality_mix" -> Training.qualityMix _,
    "pipeline_mix_temp"  -> Training.mixTemp _,
    "embed_kmeans"       -> Similarity.kmeans _,
    "embed_rq"           -> Similarity.rq _,
    "embed_pq"           -> Similarity.pq _,
    "embed_pca"          -> Similarity.pca _,
    "embed_opq"          -> Similarity.opq _,
    "sim_pq_adc"         -> Similarity.pqAdc _,
    "text_langid_eval"   -> TextAnalysis.langidEval _,
    "q43_triangles"      -> Affinity.triangles _,
    "q39_array_funcs"    -> Relational.q39ArrayFuncs _,
    "q40_range_frame"    -> Relational.q40RangeFrame _,
    "pipeline_stratified" -> ((s: SparkSession, d: String) => Curate.stratified(s, d)),
    "pipeline_reservoir" -> Curate.reservoir _,
    "asof_join"          -> AsOf.clicksToPurchases _,
    "asof_join_forward"  -> AsOf.purchasesToNextClick _,
    "asof_join_nearest"  -> AsOf.clicksToNearestPurchase _,
    "range_join_bucketed" -> Ranges.eventBands _,
    // §2.C LLM-data-pipeline operators
    "dedup_exact"         -> Dedup.exact _,
    "dedup_containment"   -> Dedup.containment _,
    "text_novelty"        -> TextAnalysis.novelty _,
    "fuzzy_join"          -> Dedup.fuzzyJoin _,
    "fuzzy_rerank_lev"    -> Dedup.levRerank _,
    "pipeline_epoch_order" -> ((s: SparkSession, d: String) => Training.epochOrder(s, d)),
    "dedup_ngram_jaccard" -> Dedup.ngramJaccard _,
    "dedup_minhash_weighted" -> Dedup.weightedMinhash _,
    "dedup_minhash"       -> Dedup.minhashLsh _,
    "dedup_simhash"       -> Dedup.simhashPairs _,
    "dedup_cluster"       -> Dedup.cluster _,
    "dedup_cluster_pd"    -> Dedup.clusterPd _,
    "text_langid"         -> TextAnalysis.langid _,
    "text_quality"        -> TextAnalysis.quality _,
    "text_tokens"         -> TextAnalysis.tokens _,
    "text_fingerprint"    -> TextAnalysis.fingerprint _,
    "text_tfidf"          -> TextAnalysis.tfidf _,
    "text_heavy_hitters"  -> ((s: SparkSession, d: String) => TextAnalysis.heavyHitters(s, d)),
    "text_scrub"          -> TextAnalysis.scrub _,
    "text_winnow"         -> TextAnalysis.winnow _,
    "text_vocab_coverage" -> ((s: SparkSession, d: String) => TextAnalysis.vocabCoverage(s, d)),
    "text_length_profile" -> TextAnalysis.lengthProfile _,
    "dedup_keep_best"     -> Curate.keepBest _,
    "sim_bruteforce_topk" -> Similarity.bruteforceTopk _,
    "sim_lsh_ann"         -> Similarity.lshAnn _,
    "sim_lsh_multiprobe"  -> Similarity.lshMultiprobe _,
    "sim_lsh_multitable"  -> Similarity.lshMultitable _,
    "sim_filtered_ann"    -> Similarity.filteredAnn _,
    "sim_ivf_ann"         -> Similarity.ivfAnn _,
    "sim_ivf_refine"      -> Similarity.ivfRefine _,
    "sim_ivf_health"      -> Similarity.ivfHealth _,
    "sim_ivfpq"           -> Similarity.ivfPq _,
    "sim_knn_graph"       -> Similarity.knnGraph _,
    "sim_knn_insert"      -> Similarity.knnInsert _,
    "sim_knn_delete"      -> Similarity.knnDelete _,
    "sim_graph_beam"      -> Similarity.graphBeam _,
    "sim_hnsw"            -> Similarity.hnsw _,
    "sim_hnsw_build"      -> Similarity.hnswBuildStats _,
    "sim_mmr"             -> Similarity.mmr _,
    "sim_hard_negatives"  -> Similarity.hardNegatives _,
    "sim_kcenter"         -> Similarity.kcenter _,
    "embed_knn_join"      -> Similarity.knnJoin _,
    "dedup_embed_cosine"  -> Similarity.embedCosineDedup _,
    "dedup_semantic"      -> Similarity.semanticDedup _,
    "mm_meta"             -> Multimodal.meta _,
    "mm_audio_fp"         -> Multimodal.audioFp _,
    "mm_video_scenes"     -> Multimodal.videoScenes _,
    "mm_image_phash"      -> Multimodal.imagePhashPairs _,
    "pipeline_curate"     -> Curate.curate _,
    "contamination_check" -> Training.contamination _,
    "contamination_bloom" -> Training.contaminationBloom _,
    "contamination_spans" -> Training.contaminationSpans _,
    "pipeline_pack"       -> Training.pack _,
    "pipeline_mix"        -> Training.mix _,
    "dedup_cross_corpus"  -> Training.crossCorpus _,
    "source_minhash_sim"  -> Training.sourceMinhashSim _,
    "tx_merge"            -> graft.sources.TxTable.mergeQuery _,
    "tx_merge_part"       -> graft.sources.TxTable.mergePartitionedQuery _,
    "tx_merge_clauses"    -> graft.sources.TxTable.mergeClausesQuery _,
    "tx_time_travel"      -> graft.sources.TxTable.timeTravelQuery _,
    "tx_sql_read"         -> graft.sources.TxTable.sqlReadQuery _,
    "tx_sql_time_travel"  -> graft.sources.TxTable.sqlTimeTravelQuery _,
    "tx_convert"          -> graft.sources.TxTable.convertQuery _,
    "tx_bloom_lookup"     -> graft.sources.TxTable.bloomLookupQuery _,
    "tx_clone"            -> graft.sources.TxTable.cloneQuery _,
    "tx_maintenance"      -> graft.sources.TxTable.maintenanceQuery _,
    "tx_cdc_replica"      -> graft.sources.TxTable.cdcReplicaQuery _,
    "tx_catalog_read"     -> graft.sources.TxTable.catalogReadQuery _,
    "tx_sql_dml"          -> graft.sources.TxTable.sqlDmlQuery _,
    "tx_delete"           -> graft.sources.TxTable.deleteQuery _,
    "tx_delete_pred"      -> graft.sources.TxTable.deletePredQuery _,
    "tx_dv_delete"        -> graft.sources.TxTable.dvDeleteQuery _,
    "tx_cdf_stream"       -> graft.sources.TxTable.cdfStreamQuery _,
    "tx_table_changes"    -> graft.sources.TxTable.tableChangesQuery _,
    "tx_update"           -> graft.sources.TxTable.updateQuery _,
    "text_diversity"      -> Training.diversity _,
    "embed_class_centroid" -> Similarity.classCentroid _,
    "embed_outliers"      -> Similarity.embedOutliers _,
    // §2.D streaming (batch-equivalent forms; streaming impls spec-tested)
    "stream_window_agg"   -> EventStreams.windowAgg _,
    "stream_sessionize"   -> EventStreams.sessionize _,
    "stream_session_native" -> EventStreams.sessionNative _,
    "q61_session_conversion" -> EventStreams.sessionConversion _,
    "stream_dedup"        -> EventStreams.dedupBatch _,
    "stream_topk"         -> EventStreams.topkBatch _,
    "stream_interval_join" -> EventStreams.intervalJoinBatch _,
  )

  /** Full-data SCD1 customer rebuild — also the oracle for the
    * INCREMENTAL merge (merge(history, delta) must equal rebuild(all)).
    */
  private val scd1CustomersSql =
    """WITH latest AS (
      | SELECT o_custkey, CAST(o_orderdate AS DATE) AS last_order_date, o_orderstatus AS last_status,
      |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      | FROM orders)
      |SELECT c_custkey AS customer_id, c_name AS name, c_mktsegment AS segment, last_order_date, last_status
      |FROM customer JOIN latest ON c_custkey = o_custkey WHERE rn = 1 ORDER BY customer_id""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "etl_scd1_merge" -> scd1CustomersSql,
    "etl_fk_audit" ->
      """SELECT
        | (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |   (SELECT 1 FROM orders o WHERE l.l_orderkey = o.o_orderkey)) AS orphan_lineitems,
        | (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |   (SELECT 1 FROM customer c WHERE o.o_custkey = c.c_custkey)) AS orphan_orders,
        | (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |   (SELECT 1 FROM part p WHERE l.l_partkey = p.p_partkey)) AS orphan_part_refs,
        | (SELECT count(*) FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)) AS dup_orderkeys""".stripMargin,
    "etl_clean" ->
      """SELECT event_id AS invoice_id, coalesce(user_id, 0) AS customer_id, event_type,
        | value AS unit_price, CAST(strftime(ts, '%Y%m%d') AS INTEGER) AS date_dim_id
        |FROM events WHERE value > 0 AND regexp_matches(event_type, '^[a-z_]+$')
        |ORDER BY invoice_id""".stripMargin,
    "etl_scd1_customers" -> scd1CustomersSql,
    "etl_scd1_products" ->
      """WITH latest AS (
        | SELECT l_partkey, CAST(l_shipdate AS DATE) AS last_ship_date,
        |  floor((l_extendedprice / l_quantity) * 100.0 + 0.5) / 100.0 AS last_unit_price,
        |  row_number() OVER (PARTITION BY l_partkey ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn
        | FROM lineitem)
        |SELECT p_partkey AS stock_code, p_name AS description, p_brand AS brand, last_ship_date, last_unit_price
        |FROM part JOIN latest ON p_partkey = l_partkey WHERE rn = 1 ORDER BY stock_code""".stripMargin,
    "etl_dim_dates" ->
      """SELECT CAST(strftime(d, '%Y%m%d') AS INTEGER) AS date_dim_id, CAST(d AS DATE) AS date,
        | CAST(year(d) AS INTEGER) AS year, CAST(month(d) AS INTEGER) AS month,
        | CAST(day(d) AS INTEGER) AS day, CAST(isodow(d) AS INTEGER) AS day_of_week,
        | CAST(week(d) AS INTEGER) AS week
        |FROM generate_series(DATE '2008-01-01', DATE '2012-01-01', INTERVAL 1 DAY) AS t(d)
        |ORDER BY date_dim_id""".stripMargin,
    "etl_fact_build" ->
      """WITH dimc AS (SELECT c_custkey, c_custkey + 1000000 AS customer_dim_id FROM customer WHERE c_acctbal > 0.0),
        | dimp AS (SELECT p_partkey, p_partkey + 2000000 AS product_dim_id FROM part WHERE p_size >= 5)
        |SELECT l_orderkey AS invoice_id, l_linenumber AS line_no,
        | CAST(strftime(l_shipdate, '%Y%m%d') AS INTEGER) AS date_dim_id,
        | coalesce(customer_dim_id, 0) AS customer_dim_id,
        | coalesce(product_dim_id, 0) AS product_dim_id,
        | floor((l_extendedprice / l_quantity) * 100.0 + 0.5) / 100.0 AS unit_price,
        | l_quantity AS quantity
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | LEFT JOIN dimc ON o_custkey = c_custkey
        | LEFT JOIN dimp ON l_partkey = dimp.p_partkey
        |ORDER BY invoice_id, line_no""".stripMargin,
    "etl_star_revenue" ->
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS yr, CAST(month(l_shipdate) AS INTEGER) AS mo,
        | c_mktsegment AS segment,
        | floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS revenue, count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "etl_star_topn" ->
      """WITH agg AS (
        | SELECT p_brand, p_partkey, p_name, floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS revenue
        | FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2, 3),
        |ranked AS (
        | SELECT *, CAST(row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS INTEGER) AS rk
        | FROM agg)
        |SELECT p_brand, p_partkey, p_name, revenue, rk FROM ranked WHERE rk <= 5 ORDER BY p_brand, rk""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty,
        | floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS sum_base_price,
        | floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS sum_disc_price,
        | floor((avg(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
        | floor((avg(l_discount)) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q2_filter_project" ->
      """SELECT p_partkey, p_brand, floor((p_retailprice * 0.9) * 100.0 + 0.5) / 100.0 AS discounted
        |FROM part WHERE p_size >= 10 AND p_retailprice > 950.0 ORDER BY p_partkey""".stripMargin,
    "q3_join_agg" ->
      """SELECT l_orderkey, floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS revenue, count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1 HAVING floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 > 100000.0
        |ORDER BY revenue DESC, l_orderkey""".stripMargin,
    "q4_broadcast_join" ->
      """SELECT r_name, n_name, count(*) AS n_customers, floor((sum(c_acctbal)) * 100.0 + 0.5) / 100.0 AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q5_semi_anti" ->
      """SELECT c_custkey, c_name, 'has_high_value' AS bucket FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)
        |UNION ALL
        |SELECT c_custkey, c_name, 'no_orders' AS bucket FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY bucket, c_custkey""".stripMargin,
    "q6_window_topn" ->
      """SELECT o_custkey, o_orderkey, floor((o_totalprice) * 100.0 + 0.5) / 100.0 AS price, CAST(rk AS INTEGER) AS rk FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        | FROM orders)
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q7_running_window" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | floor((sum(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100.0 + 0.5) / 100.0 AS running_qty
        |FROM lineitem WHERE l_suppkey <= 3 ORDER BY 1, 2, 3""".stripMargin,
    "q8_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_sort_limit" ->
      """SELECT o_orderkey, o_custkey, floor((o_totalprice) * 100.0 + 0.5) / 100.0 AS price
        |FROM orders ORDER BY price DESC, o_orderkey LIMIT 20""".stripMargin,
    "q10_setops" ->
      """WITH hi AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0),
        | urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        | both_t AS (SELECT o_custkey FROM hi INTERSECT SELECT o_custkey FROM urgent),
        | hi_only AS (SELECT o_custkey FROM hi EXCEPT SELECT o_custkey FROM urgent)
        |SELECT tag, count(*) AS n_customers FROM (
        | SELECT 'hi_and_urgent' AS tag, o_custkey FROM both_t
        | UNION ALL SELECT 'hi_only' AS tag, o_custkey FROM hi_only)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q11_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers, floor((sum(c_acctbal)) * 100.0 + 0.5) / 100.0 AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q12_case_pivot" ->
      """SELECT o_orderstatus,
        | CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
        | CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        | CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS n_other,
        | floor((sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END)) * 100.0 + 0.5) / 100.0 AS urgent_value
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_date_funcs" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, CAST(hour(ts) AS INTEGER) AS hr,
        | count(*) AS n_events, floor((sum(value)) * 100.0 + 0.5) / 100.0 AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q14_string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_upper, substring(p_name, 1, 8) AS name_prefix,
        | regexp_extract(p_type, '^(\w+)', 1) AS type_head,
        | CAST(len(string_split(p_name, ' ')) AS INTEGER) AS name_words
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q15_json" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q16_subquery_avg" ->
      """WITH a AS (SELECT l_partkey AS ap_partkey, avg(l_quantity) * 0.5 AS half_avg FROM lineitem GROUP BY 1)
        |SELECT floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS below_avg_revenue, count(*) AS n_lines
        |FROM lineitem JOIN a ON l_partkey = ap_partkey WHERE l_quantity < half_avg""".stripMargin,
    "q17_having" ->
      """SELECT o_custkey, count(*) AS n_orders, floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS total_spent
        |FROM orders GROUP BY 1 HAVING count(*) >= 3 ORDER BY 1""".stripMargin,
    "q18_null_handling" ->
      """SELECT event_type, count(*) AS n, count(v) AS n_high,
        | floor((sum(coalesce(v, 0.0))) * 100.0 + 0.5) / 100.0 AS sum_high, floor((avg(coalesce(v, 0.0))) * 10000.0 + 0.5) / 10000.0 AS avg_filled
        |FROM (SELECT event_type, CASE WHEN value > 150.0 THEN value END AS v FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q20_salted_agg" ->
      """SELECT event_type, count(*) AS n_events,
        | floor(sum(value) * 100.0 + 0.5) / 100.0 AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q22_outer_join" ->
      """WITH spend AS (SELECT o_custkey AS custkey, floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0 AS big_spend
        |               FROM orders WHERE o_totalprice > 250000.0 GROUP BY 1),
        |urgent AS (SELECT o_custkey AS custkey, count(*) AS n_urgent
        |           FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1)
        |SELECT coalesce(s.custkey, u.custkey) AS custkey,
        | coalesce(big_spend, 0.0) AS big_spend, coalesce(n_urgent, 0) AS n_urgent,
        | CASE WHEN big_spend IS NULL THEN 'urgent_only'
        |      WHEN n_urgent IS NULL THEN 'spend_only' ELSE 'both' END AS bucket
        |FROM spend s FULL OUTER JOIN urgent u ON s.custkey = u.custkey
        |ORDER BY custkey""".stripMargin,
    "q23_window_nav" ->
      """SELECT o_custkey, o_orderkey,
        | floor(o_totalprice * 100.0 + 0.5) / 100.0 AS price,
        | floor(lag(o_totalprice) OVER w * 100.0 + 0.5) / 100.0 AS prev_price,
        | floor(lead(o_totalprice) OVER w * 100.0 + 0.5) / 100.0 AS next_price,
        | CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM orders WHERE o_custkey <= 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q24_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        | floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0 AS total,
        | CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS INTEGER) AS gset
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q40_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS day_num,
        | floor(sum(o_totalprice) OVER w * 100.0 + 0.5) / 100.0 AS trailing_30d_spend,
        | count(*) OVER w AS n_orders_30d
        |FROM orders WHERE o_custkey <= 200
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
        |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, day_num, o_orderkey""".stripMargin,
    "q39_array_funcs" ->
      """SELECT p_partkey,
        | CAST(len(list_distinct(string_split(p_name, ' '))) AS INTEGER) AS n_distinct_words,
        | list_sort(list_distinct(string_split(p_name, ' ')))[1] AS first_word,
        | array_to_string(list_sort(list_distinct(string_split(p_name, ' ')))[1:2], '-') AS first_two,
        | list_contains(string_split(p_name, ' '), 'green') AS has_green
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q37_incr_agg" ->
      """SELECT CAST(year(CAST(l_shipdate AS DATE)) AS INTEGER) AS yr,
        | CAST(month(CAST(l_shipdate AS DATE)) AS INTEGER) AS mo,
        | floor(sum(l_quantity) * 100.0 + 0.5) / 100.0 AS qty,
        | count(*) AS n_rows,
        | floor(min(l_extendedprice) * 100.0 + 0.5) / 100.0 AS min_price,
        | floor(max(l_extendedprice) * 100.0 + 0.5) / 100.0 AS max_price
        |FROM lineitem GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin,
    "q35_histogram" ->
      """SELECT CAST(least(floor(o_totalprice / 60000.0), 9.0) AS INTEGER) AS bin,
        | count(*) AS n,
        | floor(min(o_totalprice) * 100.0 + 0.5) / 100.0 AS lo,
        | floor(max(o_totalprice) * 100.0 + 0.5) / 100.0 AS hi
        |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin,
    "pipeline_stratified" -> graft.operators.Curate.stratifiedSql,
    "pipeline_reservoir"  -> graft.operators.Curate.reservoirSql,
    "q33_lateral" ->
      """SELECT n_name, c_custkey,
        |  CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS acctbal_cents
        |FROM nation, LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2)
        |ORDER BY n_name, acctbal_cents DESC, c_custkey""".stripMargin,
    "q34_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |fv AS (SELECT user_id, min(us) AS v_ts FROM e WHERE event_type = 'view' GROUP BY 1),
        |fc AS (SELECT e.user_id, min(us) AS c_ts FROM e JOIN fv ON e.user_id = fv.user_id
        |       WHERE event_type = 'click' AND us > v_ts GROUP BY 1),
        |fp AS (SELECT e.user_id, min(us) AS p_ts FROM e JOIN fc ON e.user_id = fc.user_id
        |       WHERE event_type = 'purchase' AND us > c_ts GROUP BY 1)
        |SELECT (SELECT count(*) FROM fv) AS n_viewers,
        | (SELECT count(*) FROM fc) AS n_clickers,
        | (SELECT count(*) FROM fp) AS n_buyers,
        | floor(CAST((SELECT count(*) FROM fc) AS DOUBLE) / (SELECT count(*) FROM fv) * 1000000.0 + 0.5) / 1000000.0 AS click_rate,
        | floor(CAST((SELECT count(*) FROM fp) AS DOUBLE) / (SELECT count(*) FROM fc) * 1000000.0 + 0.5) / 1000000.0 AS buy_rate""".stripMargin,
    "q32_window_pct" ->
      """SELECT o_orderstatus, o_orderkey,
        | floor(o_totalprice * 100.0 + 0.5) / 100.0 AS price,
        | floor(percent_rank() OVER w * 1000000.0 + 0.5) / 1000000.0 AS pct_rank,
        | floor(cume_dist() OVER w * 1000000.0 + 0.5) / 1000000.0 AS cume,
        | first_value(o_orderkey) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cheapest_order
        |FROM orders WHERE o_custkey <= 50
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin,
    "q30_date_arith" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
        | CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_date,
        | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INTEGER) AS age_days,
        | last_day(CAST(o_orderdate AS DATE)) AS month_end,
        | CAST(dayofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS doy
        |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin,
    "q31_unpivot" ->
      """WITH wide AS (
        | SELECT o_orderstatus,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
        |  CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS other
        | FROM orders GROUP BY 1)
        |SELECT o_orderstatus, priority_class, n FROM (
        | SELECT o_orderstatus, 'urgent' AS priority_class, urgent AS n FROM wide
        | UNION ALL SELECT o_orderstatus, 'high', high FROM wide
        | UNION ALL SELECT o_orderstatus, 'other', other FROM wide)
        |ORDER BY o_orderstatus, priority_class""".stripMargin,
    "q29_not_in_null" ->
      """SELECT
        | (SELECT count(*) FROM events
        |  WHERE user_id NOT IN (SELECT CASE WHEN value > 260.0 THEN user_id END FROM events)) AS n_not_in_with_null,
        | (SELECT count(*) FROM events e
        |  WHERE NOT EXISTS (SELECT 1 FROM events i
        |                    WHERE i.value > 260.0 AND i.user_id = e.user_id)) AS n_not_exists,
        | (SELECT count(*) FROM events
        |  WHERE user_id NOT IN (SELECT user_id FROM events WHERE value > 260.0)) AS n_not_in_clean""".stripMargin,
    "q27_explode" ->
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
        |WHERE word <> '' GROUP BY 1 HAVING count(*) >= 100
        |ORDER BY n DESC, word""".stripMargin,
    "q26_collect" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
        | count(DISTINCT n_name) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q25_sample_hash" ->
      """SELECT event_type, count(*) AS n_sampled,
        | floor(sum(value) * 100.0 + 0.5) / 100.0 AS sampled_value
        |FROM events WHERE (event_id * 1000003 + 12289) % 2147483647 % 100 < 10
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "asof_join"           -> AsOf.clicksToPurchasesSql,
    "asof_join_forward"   -> AsOf.purchasesToNextClickSql,
    "asof_join_nearest"   -> AsOf.clicksToNearestPurchaseSql,
    "range_join_bucketed" -> Ranges.eventBandsSql,
    "q21_stats_agg" ->
      """SELECT l_returnflag,
        | floor(corr(l_quantity, l_extendedprice) * 1000000.0 + 0.5) / 1000000.0 AS corr_qty_price,
        | floor(stddev_samp(l_quantity) * 1000000.0 + 0.5) / 1000000.0 AS sd_qty,
        | floor(quantile_cont(l_quantity, 0.5) * 10000.0 + 0.5) / 10000.0 AS median_qty,
        | floor(quantile_cont(l_extendedprice, 0.9) * 100.0 + 0.5) / 100.0 AS p90_price,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_winnow"         -> TextAnalysis.winnowSql,
    "text_vocab_coverage" -> TextAnalysis.vocabCoverageSql,
    "text_length_profile" -> TextAnalysis.lengthProfileSql,
    "contamination_check" -> Training.contaminationSql,
    "contamination_bloom" -> Training.contaminationBloomSql,
    "contamination_spans" -> Training.contaminationSpansSql,
    "pipeline_pack"       -> Training.packSql,
    "pipeline_mix"        -> Training.mixSql,
    "dedup_cross_corpus"  -> Training.crossCorpusSql,
    "source_minhash_sim"  -> Training.sourceMinhashSimSql,
    "tx_merge"            -> graft.sources.TxTable.mergeQuerySql,
    "tx_merge_part"       -> graft.sources.TxTable.mergePartitionedQuerySql,
    "tx_merge_clauses"    -> graft.sources.TxTable.mergeClausesQuerySql,
    "tx_time_travel"      -> graft.sources.TxTable.timeTravelQuerySql,
    "tx_sql_read"         -> graft.sources.TxTable.sqlReadQuerySql,
    "tx_sql_time_travel"  -> graft.sources.TxTable.sqlTimeTravelQuerySql,
    "tx_convert"          -> graft.sources.TxTable.convertQuerySql,
    "tx_bloom_lookup"     -> graft.sources.TxTable.bloomLookupQuerySql,
    "tx_clone"            -> graft.sources.TxTable.cloneQuerySql,
    "tx_maintenance"      -> graft.sources.TxTable.maintenanceQuerySql,
    "tx_cdc_replica"      -> graft.sources.TxTable.cdcReplicaQuerySql,
    "tx_catalog_read"     -> graft.sources.TxTable.catalogReadQuerySql,
    "tx_sql_dml"          -> graft.sources.TxTable.sqlDmlQuerySql,
    "tx_delete"           -> graft.sources.TxTable.deleteQuerySql,
    "tx_delete_pred"      -> graft.sources.TxTable.deletePredQuerySql,
    "tx_dv_delete"        -> graft.sources.TxTable.dvDeleteQuerySql,
    "tx_cdf_stream"       -> graft.sources.TxTable.cdfStreamQuerySql,
    "tx_table_changes"    -> graft.sources.TxTable.tableChangesQuerySql,
    "tx_update"           -> graft.sources.TxTable.updateQuerySql,
    "dq_constraints"      -> Quality.dqConstraintsSql,
    "dq_outliers"         -> Quality.dqOutliersSql,
    "ts_gapfill"          -> TimeSeries.gapfillSql,
    "ts_concurrency"      -> TimeSeries.concurrencySql,
    "ts_islands"          -> TimeSeries.islandsSql,
    "ts_ohlc"             -> TimeSeries.ohlcSql,
    "q49_cohort_retention" -> TimeSeries.cohortRetentionSql,
    "q50_mode"            -> Relational.q50ModeSql,
    "etl_rfm"             -> RetailEtl.rfmSql,
    "etl_late_dim"        -> RetailEtl.lateDimSql,
    "etl_fact_accumulating" -> RetailEtl.factAccumulatingSql,
    "etl_scd2"            -> RetailEtl.scd2CustomersSql,
    "etl_cdc_diff"        -> RetailEtl.cdcDiffSql,
    "etl_pit_lookup"      -> RetailEtl.pitLookupSql,
    "etl_dim_serial"      -> RetailEtl.dimSerialSql,
    "q51_assoc_rules"     -> Affinity.assocRulesSql,
    "q52_pagerank"        -> Affinity.pagerankSql,
    "q71_percentile_exact" -> Relational.q71PercentileExactSql,
    "q72_mode_exact"      -> Relational.q72ModeExactSql,
    "q73_trimmed_mean"    -> Relational.q73TrimmedMeanSql,
    "q70_ppr"             -> Affinity.pprSql,
    "q59_coreness"        -> Affinity.corenessSql,
    "text_bm25"           -> TextAnalysis.bm25Sql,
    "dedup_spans"         -> Dedup.spanDedupSql,
    "dedup_exact_spans"   -> Dedup.exactSpansSql,
    "text_repetition"     -> TextAnalysis.repetitionSql,
    "text_keyphrases"     -> TextAnalysis.keyphrasesSql,
    "text_gopher_rules"   -> TextAnalysis.gopherRulesSql,
    "text_entropy"        -> TextAnalysis.entropySql,
    "text_perplexity"     -> TextAnalysis.perplexitySql,
    "text_zipf"           -> TextAnalysis.zipfSql,
    "ts_ewma"             -> TimeSeries.ewmaSql,
    "pipeline_split"      -> Training.splitSql,
    "pipeline_token_budget" -> Training.tokenBudgetSql,
    "pipeline_shard_assign" -> Training.shardAssignSql,
    "pipeline_length_buckets" -> Training.lengthBucketsSql,
    "pipeline_dsir"       -> Training.dsirSql,
    "text_bpe_pairs"      -> TextAnalysis.bpePairsSql,
    "text_bpe_train"      -> TextAnalysis.bpeTrainSql,
    "text_bpe_apply"      -> TextAnalysis.bpeApplySql,
    "sim_hamming_ann"     -> Similarity.hammingAnnSql,
    "q53_skyline"         -> Relational.q53SkylineSql,
    "ts_interp_linear"    -> TimeSeries.interpLinearSql,
    "ts_merge_intervals"  -> TimeSeries.mergeIntervalsSql,
    "ts_seasonality"      -> TimeSeries.seasonalitySql,
    "ts_cum_distinct"     -> TimeSeries.cumDistinctSql,
    "ts_active_users"     -> TimeSeries.activeUsersSql,
    "q55_attribution"     -> TimeSeries.attributionSql,
    "ts_rolling_median"   -> TimeSeries.rollingMedianSql,
    "ts_rolling_median_wide" -> TimeSeries.rollingMedianWideSql,
    "ts_trend"            -> TimeSeries.trendSql,
    "ts_theil_sen"        -> TimeSeries.theilSenSql,
    "ts_changepoint"      -> TimeSeries.changepointSql,
    "ts_autocorr"         -> TimeSeries.autocorrSql,
    "ts_acf"              -> TimeSeries.acfSql,
    "dedup_minhash_eval"  -> Dedup.minhashEvalSql,
    "ts_out_of_order"     -> TimeSeries.outOfOrderSql,
    "stream_watermark_size" -> TimeSeries.watermarkRecommendSql,
    "q58_entry_paths"     -> TimeSeries.entryPathsSql,
    "text_bigram_surprise" -> TextAnalysis.bigramSurpriseSql,
    "q57_ab_test"         -> Relational.q57AbTestSql,
    "q67_sole_blame"      -> Relational.q67SoleBlameSql,
    "q56_kcore"           -> Affinity.kcoreSql,
    "dq_profile_drift"    -> Quality.dqProfileDriftSql,
    "dq_freshness"        -> Quality.dqFreshnessSql,
    "dq_volume_anomaly"   -> Quality.dqVolumeAnomalySql,
    "dq_skew_profile"     -> Quality.dqSkewProfileSql,
    "dq_completeness"     -> Quality.dqCompletenessSql,
    "sim_recall_eval"     -> Similarity.recallEvalSql,
    "embed_mrl_eval"      -> Similarity.mrlEvalSql,
    "dedup_threshold_sweep" -> Similarity.thresholdSweepSql,
    "sim_mips_ann"        -> Similarity.mipsAnnSql,
    "sim_range_search"    -> Similarity.rangeSearchSql,
    "text_surprise"       -> TextAnalysis.surpriseSql,
    "dq_mad_outliers"     -> Quality.dqMadOutliersSql,
    "dq_benford"          -> Quality.dqBenfordSql,
    "q54_khop"            -> Affinity.khopSql,
    "embed_quantize"      -> Similarity.quantizeSql,
    "embed_dim_stats"     -> Similarity.dimStatsSql,
    "dedup_bag"           -> Dedup.bagSql,
    "pipeline_quality_mix" -> Training.qualityMixSql,
    "pipeline_mix_temp"   -> Training.mixTempSql,
    "embed_kmeans"        -> Similarity.kmeansSql,
    "embed_rq"            -> Similarity.rqSql,
    "embed_pq"            -> Similarity.pqSql,
    "embed_pca"           -> Similarity.pcaSql,
    "embed_opq"           -> Similarity.opqSql,
    "sim_pq_adc"          -> Similarity.pqAdcSql,
    "q63_sketch_audit"    -> Relational.q63SketchAuditSql,
    "q64_community_lp"    -> Affinity.communityLpSql,
    "q65_bfs"             -> Affinity.bfsSql,
    "q66_sssp"            -> Affinity.ssspSql,
    "q68_link_pred"       -> Affinity.linkPredSql,
    "q69_assortativity"   -> Affinity.assortativitySql,
    "q47_grouping_sets" ->
      """SELECT o_orderstatus AS status, o_orderpriority AS prio,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_cents
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderstatus, year(o_orderdate)), ())
        |ORDER BY status NULLS FIRST, prio NULLS FIRST, yr NULLS FIRST""".stripMargin,
    "q48_setops_all" ->
      """WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |o AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT 'intersect_all' AS op, count(*) AS n FROM (
        |  SELECT o_custkey FROM f INTERSECT ALL SELECT o_custkey FROM o)
        |UNION ALL
        |SELECT 'except_all', count(*) FROM (
        |  SELECT o_custkey FROM f EXCEPT ALL SELECT o_custkey FROM o)
        |ORDER BY op""".stripMargin,
    "q46_topk_agg" ->
      """SELECT o_orderstatus AS status, CAST(rk AS INTEGER) AS rk, cents FROM (
        | SELECT o_orderstatus, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |  row_number() OVER (PARTITION BY o_orderstatus
        |    ORDER BY floor(o_totalprice * 100 + 0.5) DESC) AS rk
        | FROM orders)
        |WHERE rk <= 5 ORDER BY status, rk""".stripMargin,
    "text_diversity"      -> Training.diversitySql,
    "embed_class_centroid" -> Similarity.classCentroidSql,
    "embed_outliers"      -> Similarity.embedOutliersSql,
    "q42_copurchase"      -> Affinity.copurchaseSql,
    "q60_bipartite_proj"  -> Affinity.bipartiteProjSql,
    "text_langid_eval"    -> TextAnalysis.langidEvalSql,
    "q45_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |p AS (SELECT user_id, event_type,
        |       lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_type
        |      FROM e),
        |c AS (SELECT prev_type, event_type AS next_type, count(*) AS n
        |      FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
        |SELECT c.prev_type AS prev_type, next_type, n,
        | floor(CAST(n AS DOUBLE) / tot * 1000000.0 + 0.5) / 1000000.0 AS p
        |FROM c JOIN t ON c.prev_type = t.prev_type
        |ORDER BY c.prev_type, next_type""".stripMargin,
    "q44_map_funcs" ->
      """WITH r AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, o_orderstatus AS st,
        |            floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0 AS rev
        |           FROM orders GROUP BY 1, 2)
        |SELECT yr, CAST(count(*) AS INTEGER) AS n_statuses,
        | string_agg(st, ',' ORDER BY st) AS statuses,
        | max(CASE WHEN st = 'F' THEN rev END) AS rev_f,
        | max(CASE WHEN st = 'O' THEN rev END) AS rev_o,
        | floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(rev ORDER BY st)),
        |   (a, b) -> a + b) * 100.0 + 0.5) / 100.0 AS rev_total
        |FROM r GROUP BY yr ORDER BY yr""".stripMargin,
    "q43_triangles"       -> Affinity.trianglesSql,
    "q41_salted_join" ->
      """WITH e AS (SELECT event_id, event_type, value FROM events),
        |dim AS (SELECT event_type, count(DISTINCT event_id) AS n_type_events FROM e GROUP BY 1)
        |SELECT e.event_type, count(*) AS n_events,
        | floor(sum(value) * 100.0 + 0.5) / 100.0 AS total_value,
        | max(n_type_events) AS n_type_events
        |FROM e JOIN dim ON e.event_type = dim.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q38_pivot_native" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        | floor(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) * 100.0 + 0.5) / 100.0 AS F,
        | floor(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) * 100.0 + 0.5) / 100.0 AS O,
        | floor(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END) * 100.0 + 0.5) / 100.0 AS P
        |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin,
    "dedup_exact"         -> Dedup.exactSql,
    "dedup_containment"   -> Dedup.containmentSql,
    "text_novelty"        -> TextAnalysis.noveltySql,
    "fuzzy_join"          -> Dedup.fuzzyJoinSql,
    "fuzzy_rerank_lev"    -> Dedup.levRerankSql,
    "pipeline_epoch_order" -> Training.epochOrderSql,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardSql,
    "dedup_minhash"       -> Dedup.minhashLshSql,
    "dedup_minhash_weighted" -> Dedup.weightedMinhashSql,
    "dedup_simhash"       -> Dedup.simhashPairsSql,
    "dedup_cluster"       -> Dedup.clusterSql,
    "dedup_cluster_pd"    -> Dedup.clusterSql,
    "text_langid"         -> TextAnalysis.langidSql,
    "text_quality"        -> TextAnalysis.qualitySql,
    "text_tokens"         -> TextAnalysis.tokensSql,
    "text_fingerprint"    -> TextAnalysis.fingerprintSql,
    "text_tfidf"          -> TextAnalysis.tfidfSql,
    "text_scrub"          -> TextAnalysis.scrubSql,
    "dedup_keep_best"     -> Curate.keepBestSql,
    "sim_bruteforce_topk" -> Similarity.bruteforceTopkSql,
    "sim_lsh_ann"         -> Similarity.lshAnnSql,
    "sim_lsh_multiprobe"  -> Similarity.lshMultiprobeSql,
    "sim_lsh_multitable"  -> Similarity.lshMultitableSql,
    "sim_filtered_ann"    -> Similarity.filteredAnnSql,
    "sim_ivf_ann"         -> Similarity.ivfAnnSql,
    "sim_ivf_refine"      -> Similarity.ivfRefineSql,
    "sim_ivf_health"      -> Similarity.ivfHealthSql,
    "sim_ivfpq"           -> Similarity.ivfPqSql,
    "sim_knn_graph"       -> Similarity.knnGraphSql,
    "sim_knn_insert"      -> Similarity.knnInsertSql,
    "sim_knn_delete"      -> Similarity.knnDeleteSql,
    "sim_graph_beam"      -> Similarity.graphBeamSql,
    "sim_hnsw"            -> Similarity.hnswSql,
    "sim_hnsw_build"      -> Similarity.hnswBuildStatsSql,
    "sim_mmr"             -> Similarity.mmrSql,
    "sim_hard_negatives"  -> Similarity.hardNegativesSql,
    "sim_kcenter"         -> Similarity.kcenterSql,
    "embed_knn_join"      -> Similarity.knnJoinSql,
    "dedup_embed_cosine"  -> Similarity.embedCosineDedupSql,
    "dedup_semantic"      -> Similarity.semanticDedupSql,
    "mm_meta"             -> Multimodal.metaSql,
    "mm_audio_fp"         -> Multimodal.audioFpSql,
    "mm_video_scenes"     -> Multimodal.videoScenesSql,
    "mm_image_phash"      -> Multimodal.imagePhashPairsSql,
    "pipeline_curate"     -> Curate.curateSql,
    "stream_window_agg"   -> EventStreams.windowAggSql,
    "stream_sessionize"   -> EventStreams.sessionizeSql,
    "stream_session_native" -> EventStreams.sessionNativeSql,
    "q61_session_conversion" -> EventStreams.sessionConversionSql,
    "stream_dedup"        -> EventStreams.dedupBatchSql,
    "stream_topk"         -> EventStreams.topkBatchSql,
    "stream_interval_join" -> EventStreams.intervalJoinBatchSql,
  )
}
