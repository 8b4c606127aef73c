package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in `queries` is a SURVEY.md §2 qkey; every oracle-checkable
  * query also appears in `oracleSql` (Oracle.scala) with the exact same
  * output column names — the driver sorts columns by name and
  * hash-compares values, so names/types/order are all part of the
  * contract.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-style pricing summary: scan → pushed filter → project →
    * partial+final hash agg → sort (the whole lifecycle in one plan). */
  def entry(spark: SparkSession): DataFrame =
    Relational.aggGroupBy(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 scans
    "q_scan_parquet" -> Relational.scanParquet _,
    "q_scan_pruned" -> Relational.scanPruned _,
    "q_scan_partition" -> Relational.scanPartition _,
    "q_scan_csv" -> Relational.scanCsv _,
    "q_scan_jsonl" -> Relational.scanJsonl _,
    "q_source_dsv2" -> graft.sources.DocsSource.dsv2Query _,
    "q_source_dsv2_agg" -> graft.sources.DocsSource.dsv2AggQuery _,
    "q_sink_jdbc" -> graft.sources.Jdbc.sinkRoundtrip _,
    "q_source_log" -> graft.sources.LogStream.sourceLogQuery _,
    // §2.2 projection / filter
    "q_project_expr" -> Relational.projectExpr _,
    "q_filter_pred" -> Relational.filterPred _,
    "q_filter_like" -> Relational.filterLike _,
    // §2.3 joins
    "q_join_inner" -> Relational.joinInner _,
    "q_join_left" -> Relational.joinLeft _,
    "q_join_full" -> Relational.joinFull _,
    "q_join_semi" -> Relational.joinSemi _,
    "q_join_anti" -> Relational.joinAnti _,
    "q_join_broadcast" -> Relational.joinBroadcast _,
    "q_join_theta" -> Relational.joinTheta _,
    "q_join_theta_auto" -> Relational.joinThetaAuto _,
    "q_join_asof" -> Relational.joinAsof _,
    "q_join_self" -> Relational.joinSelf _,
    "q_join_interval" -> Relational.joinInterval _,
    "q_join_fuzzy" -> Relational.joinFuzzy _,
    // §2.4 aggregations
    "q_agg_groupby" -> Relational.aggGroupBy _,
    "q_agg_distinct" -> Relational.aggDistinct _,
    "q_agg_approx_distinct" -> Relational.aggApproxDistinct _,
    "q_agg_rollup" -> Relational.aggRollup _,
    "q_agg_cube" -> Relational.aggCube _,
    "q_agg_having" -> Relational.aggHaving _,
    "q_agg_stats" -> Relational.aggStats _,
    "q_agg_percentile" -> Relational.aggPercentile _,
    "q_agg_collect" -> Relational.aggCollect _,
    "q_agg_argmax" -> Relational.aggArgmax _,
    "q_agg_hist" -> Relational.aggHist _,
    "q_typed_agg" -> Relational.typedAgg _,
    "q_scd2_asof" -> Relational.scd2Asof _,
    "q_merge_upsert" -> Relational.mergeUpsert _,
    "q_events_transitions" -> Relational.eventsTransitions _,
    "q_ids_global" -> Relational.idsGlobal _,
    "q_ab_ztest" -> Relational.abZtest _,
    "q_join_dpp" -> Relational.joinDpp _,
    // §2.5 windows
    "q_win_rank" -> Relational.winRank _,
    "q_win_running" -> Relational.winRunning _,
    "q_win_frame" -> Relational.winFrame _,
    "q_win_range_frame" -> Relational.winRangeFrame _,
    "q_win_analytic" -> Relational.winAnalytic _,
    // §2.6 sort / set ops
    "q_sort_limit" -> Relational.sortLimit _,
    "q_topk_per_key" -> Relational.topKPerKey _,
    "q_set_union" -> Relational.setUnion _,
    "q_set_intersect" -> Relational.setIntersect _,
    "q_set_except" -> Relational.setExcept _,
    "q_set_except_all" -> Relational.setExceptAll _,
    "q_set_intersect_all" -> Relational.setIntersectAll _,
    // §2.7 scalar function families
    "q_fn_string" -> Relational.fnString _,
    "q_fn_date" -> Relational.fnDate _,
    "q_fn_date2" -> Relational.fnDate2 _,
    "q_fn_math" -> Relational.fnMath _,
    "q_fn_array" -> Relational.fnArray _,
    "q_fn_json" -> Relational.fnJson _,
    "q_fn_cond" -> Relational.fnCond _,
    "q_fn_nullsafe" -> Relational.fnNullsafe _,
    // §2.9 batch twins of streaming
    "q_stream_tumbling_batch" -> Relational.streamTumblingBatch _,
    "q_stream_sliding_batch" -> Relational.streamSlidingBatch _,
    "q_sessionize_batch" -> Relational.sessionizeBatch _,
    "q_events_funnel" -> Relational.eventsFunnel _,
    "q_win_islands" -> Relational.winIslands _,
    "q_stream_funnel_state" -> Streaming.funnelBatch _,
    "q_funnel_tws" -> Streaming.funnelBatchTws _,
    "q_stream_simhash_dedup" -> Streaming.simhashDedupBatchTws _,
    "q_split_leakage_safe" -> Text.splitLeakageSafe _,
    "q_cohort_retention" -> Relational.cohortRetention _,
    "q_basket_pairs" -> Relational.basketPairs _,
    "q_rfm_segments" -> Relational.rfmSegments _,
    "q_rfm_approx" -> Relational.rfmSegmentsApprox _,
    "q_win_ignore_nulls" -> Relational.winIgnoreNulls _,
    "q_fn_variant" -> Relational.fnVariant _,
    "q_anomaly_zscore" -> Relational.anomalyZscore _,
    "q_agg_corr" -> Relational.aggCorr _,
    "q_session_window" -> Relational.sessionWindow _,
    "q_agg_incremental" -> Relational.aggIncremental _,
    "q_ts_resample" -> Relational.tsResample _,
    // §2.8 text analysis / dedup
    "q_text_stats" -> Text.textStats _,
    "q_text_tokens" -> Text.textTokens _,
    "q_text_quality" -> Text.textQuality _,
    "q_text_langid" -> Text.textLangId _,
    "q_text_fingerprint" -> Text.textFingerprint _,
    "q_text_editdist" -> Text.textEditDist _,
    "q_text_tokens_bpe" -> Text.textTokensBpe _,
    "q_text_tfidf" -> Text.textTfidf _,
    "q_text_bm25" -> Text.textBm25 _,
    "q_text_bigram_ll" -> Text.textBigramLL _,
    "q_text_rrf" -> Text.textRrf _,
    "q_text_pmi" -> Text.textPmi _,
    "q_text_zipf" -> Text.textZipf _,
    "q_sample_weighted" -> Text.sampleWeighted _,
    "q_text_gopher" -> Text.textGopher _,
    "q_text_quality_adaptive" -> Text.qualityAdaptive _,
    "q_text_quality_model" -> Text.qualityModel _,
    "q_text_longest_dup_span" -> Text.textLongestDupSpan _,
    "q_text_dedup_trim" -> Text.textDedupTrim _,
    "q_text_dedup_para" -> Text.textDedupPara _,
    "q_text_trim_para" -> Text.textTrimPara _,
    "q_text_para_keep_best" -> Text.textParaKeepBest _,
    "q_text_decontam_para" -> Text.textDecontamPara _,
    "q_text_quality_para" -> Text.textQualityPara _,
    "q_text_quality_para_adaptive" -> Text.textQualityParaAdaptive _,
    "q_text_dedup_para_sep" -> Text.textDedupParaSep _,
    "q_text_dedup_para_near" -> Text.textDedupParaNear _,
    "q_text_decontam_para_ngram" -> Text.textDecontamParaNgram _,
    "q_text_bpe_train" -> Text.textBpeTrain _,
    "q_text_bpe_tokens" -> Text.textBpeTokens _,
    "q_text_bpe_fertility" -> Text.textBpeFertility _,
    "q_pack_chunks_bpe" -> Text.packChunksBpe _,
    "q_text_unigram_ll" -> Text.textUnigramLL _,
    "q_text_redact" -> Text.textRedact _,
    "q_gen_outer" -> Text.genOuter _,
    "q_text_decontaminate" -> Text.textDecontaminate _,
    "q_text_decontam_ngram" -> Text.textDecontaminateNgram _,
    "q_text_chunks_overlap" -> Text.textChunksOverlap _,
    "q_sample_stratified" -> Text.sampleStratified _,
    "q_sample_mixture" -> Text.sampleMixture _,
    "q_pack_chunks" -> Text.packChunks _,
    "q_pipeline_curate" -> Text.pipelineCurate _,
    "q_dedup_exact" -> Text.dedupExact _,
    "q_dedup_ngram" -> Text.dedupNgram _,
    "q_dedup_minhash" -> Text.dedupMinhash _,
    "q_dedup_spans" -> Text.dedupSpans _,
    "q_dedup_cluster" -> Text.dedupCluster _,
    "q_dedup_keep_best" -> Text.dedupKeepBest _,
    "q_dedup_crosscorpus" -> Text.dedupCrossCorpus _,
    "q_dedup_simhash" -> Text.dedupSimhash _,
    // §2.8 similarity search / vectors
    "q_sim_knn" -> Vector.simKnn _,
    "q_sim_mmr" -> Vector.simMmr _,
    "q_sim_pairs" -> Vector.simPairs _,
    "q_udaf_centroid" -> Vector.udafCentroid _,
    "q_ann_lsh" -> Vector.annLsh _,
    "q_ann_multiprobe" -> Vector.annMultiProbe _,
    "q_dedup_embed" -> Vector.dedupEmbed _,
    "q_dedup_semantic" -> Vector.dedupSemantic _,
    "q_vec_quantize" -> Vector.vecQuantize _,
    "q_vec_kmeans" -> Vector.vecKmeans _,
    "q_ann_ivf" -> Vector.annIvf _,
    "q_ann_ivfpq" -> Vector.annIvfPq _,
    // §2.8 multimodal
    "q_multimodal_join" -> Multimodal.multimodalJoin _,
    "q_multimodal_decode" -> Multimodal.multimodalDecode _,
    "q_multimodal_frames" -> Multimodal.multimodalFrames _,
    // SQL-text surface: subqueries (decorrelated by Catalyst) + TPC-H Q3
    "q_sql_scalar_subquery" -> Sql.scalarSubquery _,
    "q_sql_in_subquery" -> Sql.inSubquery _,
    "q_sql_exists_corr" -> Sql.existsCorrelated _,
    "q_sql_tpch_q3" -> Sql.tpchQ3 _,
    "q_sql_grouping_sets" -> Sql.groupingSets _,
    "q_sql_tpch_q4" -> Sql.tpchQ4 _,
    "q_sql_tpch_q5" -> Sql.tpchQ5 _,
    "q_sql_tpch_q6" -> Sql.tpchQ6 _,
    "q_sql_tpch_q10" -> Sql.tpchQ10 _,
    "q_sql_lateral" -> Sql.lateralTopN _,
    "q_sql_recursive" -> Sql.recursiveCte _,
    "q_fn_try" -> Relational.fnTry _,
    "q_fn_try_guarded" -> Relational.fnTryGuarded _,
    // pivot / extra windows / bitwise / skew-salted join
    "q_agg_pivot" -> Relational.aggPivot _,
    "q_agg_unpivot" -> Relational.aggUnpivot _,
    "q_agg_bool" -> Relational.aggBool _,
    "q_agg_multi_distinct" -> Relational.aggMultiDistinct _,
    "q_fn_map" -> Relational.fnMap _,
    "q_fn_struct" -> Relational.fnStruct _,
    "q_win_percent" -> Relational.winPercent _,
    "q_fn_bitwise" -> Relational.fnBitwise _,
    "q_join_skew_salted" -> Relational.joinSkewSalted _,
    "q_join_bucketed" -> Relational.joinBucketed _,
    // warehouse operations
    "q_quality_audit" -> Quality.qualityAudit _,
    "q_profile_table" -> Quality.profileTable _,
    // iterative graph analytics
    "q_graph_pagerank" -> Graph.pageRank _,
    "q_zorder_profile" -> Quality.zorderProfile _,
    "q_graph_triangles" -> Graph.triangleCount _,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (approx_count_distinct, …) get
    * the driver's weaker rows-only check; their exact semantics are
    * asserted in ScalaTest instead. */
  def oracleSql: Map[String, String] =
    Oracle.sql.filter { case (k, _) => queries.contains(k) }
}
