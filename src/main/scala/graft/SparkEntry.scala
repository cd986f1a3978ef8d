package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{GokaQueries, PipelineQueries, Relational, StreamingQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query naming: `g*` = the reference's own capability surface (SURVEY
  * §2.1-2.3) replayed through the engine; `q*` = relational surface
  * (SURVEY §2.5); `d*`/`s*`/`t*`/`m*` = training-data pipeline operators
  * (dedup / similarity / text analysis / multimodal).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's canonical count-per-key processor (SURVEY §7.3). */
  def entry(spark: SparkSession): DataFrame =
    GokaQueries.countPerKey(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g01_count_per_key" -> (GokaQueries.countPerKey _),
    "g02_sum_state" -> (GokaQueries.sumState _),
    "g03_multi_input" -> (GokaQueries.multiInput _),
    "g04_join_table" -> (GokaQueries.joinTable _),
    "g05_lookup_table" -> (GokaQueries.lookupTable _),
    "g06_loopback" -> (GokaQueries.loopback _),
    "g07_tombstones" -> (GokaQueries.tombstones _),
    "g08_emit_headers" -> (GokaQueries.emitHeaders _),
    "g09_stateless_filter" -> (GokaQueries.statelessFilter _),
    "g10_visitor" -> (GokaQueries.visitor _),
    "g11_last_n" -> (GokaQueries.lastN _),
    "g12_view_point" -> (GokaQueries.viewPoint _),
    "g13_view_range" -> (GokaQueries.viewRange _),
    "g14_view_prefix" -> (GokaQueries.viewPrefix _),
    "g15_json_state" -> (GokaQueries.jsonState _),
    "g16_chained" -> (GokaQueries.chained _),
    "g17_json_relational" -> (GokaQueries.jsonRelational _),
    "g18_compact_changelog" -> (GokaQueries.compactChangelog _),
    "g19_messaging_app" -> (GokaQueries.messagingApp _),
    "q01_pricing_summary" -> (Relational.pricingSummary _),
    "q02_revenue_forecast" -> (Relational.revenueForecast _),
    "q03_join_topk" -> (Relational.joinTopK _),
    "q04_semi_join" -> (Relational.semiJoin _),
    "q05_anti_join" -> (Relational.antiJoin _),
    "q06_outer_join" -> (Relational.outerJoin _),
    "q07_multi_join" -> (Relational.multiJoin _),
    "q08_window_topk" -> (Relational.windowTopK _),
    "q09_window_running" -> (Relational.windowRunning _),
    "q10_event_tumble" -> (Relational.eventTumble _),
    "q11_set_ops" -> (Relational.setOps _),
    "q12_scalar_funcs" -> (Relational.scalarFuncs _),
    "q13_asof_join" -> (Relational.asofJoin _),
    "q14_rollup" -> (Relational.rollupAgg _),
    "q15_distinct_agg" -> (Relational.distinctAgg _),
    "q16_json_extract" -> (Relational.jsonExtract _),
    "q17_session_window" -> (Relational.sessionWindow _),
    "q18_salted_join" -> (Relational.saltedJoin _),
    "q19_cube" -> (Relational.cubeAgg _),
    "q20_grouping_sets" -> (Relational.groupingSetsAgg _),
    "q21_percentiles" -> (Relational.percentiles _),
    "q29_approx_percentiles" -> (Relational.approxPercentiles _),
    "q30_hll_distinct" -> (Relational.hllAudit _),
    "q31_sliding_distinct" -> (Relational.slidingDistinct _),
    "q32_scd2" -> (Relational.scd2 _),
    "q33_mv_merge" -> (Relational.mvMerge _),
    "q34_profile" -> (Relational.profileTable _),
    "q35_kmv_setops" -> (Relational.kmvSetAlgebra _),
    "q36_heavy_hitters" -> (Relational.heavyHitters _),
    "q37_cep_match" -> (Relational.cepMatch _),
    "q38_histogram" -> (Relational.histogram _),
    "q39_capped_session" -> (Relational.cappedSession _),
    "q40_ohlc_bars" -> (Relational.ohlcBars _),
    "q41_daily_anomaly" -> (Relational.dailyAnomaly _),
    "q22_pivot" -> (Relational.pivotAgg _),
    "q23_unpivot" -> (Relational.unpivotAgg _),
    "q24_bucketed_join" -> (Relational.bucketedJoin _),
    "q25_range_join" -> (Relational.rangeJoinActivity _),
    "q26_funnel" -> (Relational.funnel _),
    "q27_retention" -> (Relational.retentionCohorts _),
    "q28_sliding_window" -> (Relational.slidingActivity _),
    "t18_vocab_stats" -> (PipelineQueries.vocabStats _),
    "t19_temperature_mix" -> (PipelineQueries.temperatureSample _),
    "t20_ccnet_buckets" -> (PipelineQueries.ccnetBuckets _),
    "t21_novelty" -> (PipelineQueries.noveltyRatio _),
    "t22_bm25" -> (PipelineQueries.bm25 _),
    "t23_bool_search" -> (PipelineQueries.boolSearch _),
    "t24_chunk" -> (PipelineQueries.chunkDocs _),
    "st20_stream_interval_join" -> (StreamingQueries.streamIntervalJoin _),
    "st21_stream_dedup_ttl" -> (StreamingQueries.streamDedupWatermark _),
    "st22_stream_scd2" -> (StreamingQueries.streamScd2 _),
    "st23_stream_mv" -> (StreamingQueries.streamMv _),
    "st24_stream_ann_serve" -> (StreamingQueries.streamAnnServe _),
    "st25_stream_ann_index_add" -> (StreamingQueries.streamAnnIndexAdd _),
    "st26_stream_lm_gate" -> (StreamingQueries.streamLmGate _),
    "st27_stream_profile" -> (StreamingQueries.streamProfile _),
    "st28_stream_quarantine" -> (StreamingQueries.streamQuarantine _),
    "st29_stream_heavy_hitters" -> (StreamingQueries.streamHeavyHitters _),
    "st30_stream_cep" -> (StreamingQueries.streamCep _),
    "st31_stream_neardup_probe" -> (StreamingQueries.streamNearDupProbe _),
    "st32_stream_capped_session" -> (StreamingQueries.streamCappedSession _),
    "st33_stream_admission" -> (StreamingQueries.streamAdmission _),
    "st34_stream_ohlc" -> (StreamingQueries.streamOhlc _),
    "st35_stream_outer_join" -> (StreamingQueries.streamOuterJoin _),
    "d01_dedup_exact" -> (PipelineQueries.dedupExact _),
    "d02_minhash_lsh" -> (PipelineQueries.minhashLsh _),
    "d03_simhash" -> (PipelineQueries.simhash _),
    "d04_ngram_jaccard" -> (PipelineQueries.ngramJaccard _),
    "d05_embed_neardup" -> (PipelineQueries.embedNearDup _),
    "d06_simhash_pairs" -> (PipelineQueries.simhashPairs _),
    "d07_dedup_clusters" -> (PipelineQueries.dedupClusters _),
    "d08_embed_neardup_lsh" -> (PipelineQueries.embedNearDupLsh _),
    "d09_decontaminate" -> (PipelineQueries.decontaminate _),
    "d10_window_dedup" -> (PipelineQueries.windowDup _),
    "d11_lsh_verify" -> (PipelineQueries.lshVerify _),
    "d27_band_tuning" -> (PipelineQueries.bandTuning _),
    "d28_prefix_join" -> (PipelineQueries.prefixJoin _),
    "d15_dup_spans" -> (PipelineQueries.dupSpans _),
    "d19_span_removal" -> (PipelineQueries.removeDupSpans _),
    "s01_ann_topk" -> (PipelineQueries.annTopK _),
    "s02_ann_lsh" -> (PipelineQueries.annLsh _),
    "s03_ann_ivf" -> (PipelineQueries.annIvf _),
    "s04_quantize" -> (PipelineQueries.quantize _),
    "s05_embed_stats" -> (PipelineQueries.embedDimStats _),
    "s06_pq_codes" -> (PipelineQueries.pqCodes _),
    "s07_ann_pq_adc" -> (PipelineQueries.pqAdc _),
    "s08_kmeans" -> (PipelineQueries.kmeans _),
    "s09_ann_recall" -> (PipelineQueries.annRecall _),
    "s10_ann_ivf_trained" -> (PipelineQueries.annIvfTrained _),
    "s11_mips" -> (PipelineQueries.mips _),
    "t15_gopher_gates" -> (PipelineQueries.gopher _),
    "t16_pii_redact" -> (PipelineQueries.piiRedact _),
    "t17_dsir_weights" -> (PipelineQueries.dsirWeights _),
    "s12_mips_lsh" -> (PipelineQueries.mipsLsh _),
    "s13_ann_ivf_probe" -> (PipelineQueries.annIvfProbed _),
    "s14_ivfadc" -> (PipelineQueries.ivfAdc _),
    "s15_ann_sq8" -> (PipelineQueries.annSq8 _),
    "s16_ann_hamming" -> (PipelineQueries.annHamming _),
    "s17_knn_graph" -> (PipelineQueries.knnGraph _),
    "s18_quant_recall" -> (PipelineQueries.quantRecall _),
    "s19_knn_refine" -> (PipelineQueries.knnRefine _),
    "s20_ivfadc_rerank" -> (PipelineQueries.ivfAdcRerank _),
    "s21_range_search" -> (PipelineQueries.rangeSearch _),
    "s22_filtered_ann" -> (PipelineQueries.annFiltered _),
    "s23_maxsim" -> (PipelineQueries.maxSim _),
    "s24_hybrid_rrf" -> (PipelineQueries.hybridRrf _),
    "s25_ann_index_store" -> (PipelineQueries.annIvfPersisted _),
    "s26_ann_index_add" -> (PipelineQueries.annIndexAdd _),
    "s31_ann_index_delete" -> (PipelineQueries.annIndexDelete _),
    "s32_hard_negatives" -> (PipelineQueries.hardNegatives _),
    "s33_index_drift" -> (PipelineQueries.indexDrift _),
    "s34_retrain_response" -> (PipelineQueries.retrainResponse _),
    "s35_matryoshka_recall" -> (PipelineQueries.matryoshkaRecall _),
    "s37_probe_recall" -> (PipelineQueries.probeRecallCurve _),
    "s38_cell_imbalance" -> (PipelineQueries.cellImbalance _),
    "st47_stream_coverage" ->
      (StreamingQueries.streamIntervalCoverage _),
    "s36_opq_lite" -> (PipelineQueries.opqLite _),
    "s27_graph_ann" -> (PipelineQueries.graphAnn _),
    "s28_knn_classify" -> (PipelineQueries.knnClassify _),
    "s29_retrieval_mrr" -> (PipelineQueries.retrievalMrr _),
    "s30_graph_pagerank" -> (PipelineQueries.graphPageRank _),
    "d16_bloom_decontam" -> (PipelineQueries.bloomDecontaminate _),
    "d20_fuzzy_decontam" -> (PipelineQueries.fuzzyDecontaminate _),
    "d21_snapshot_diff" -> (PipelineQueries.snapshotDiff _),
    "d22_medoid_keep" -> (PipelineQueries.medoidKeep _),
    "d23_incremental_neardup" -> (PipelineQueries.incrementalNearDup _),
    "d24_boilerplate" -> (PipelineQueries.boilerplate _),
    "d25_source_overlap" -> (PipelineQueries.sourceOverlap _),
    "d17_dedup_agreement" -> (PipelineQueries.dedupAgreement _),
    "d18_keep_best" -> (PipelineQueries.clusterKeepBest _),
    "d12_semdedup" -> (PipelineQueries.semDedup _),
    "d13_minhash_est" -> (PipelineQueries.minhashEstimate _),
    "d14_semdedup_trained" -> (PipelineQueries.semDedupTrained _),
    "c01_curate_pipeline" -> (PipelineQueries.curate _),
    "c02_train_mix" -> (PipelineQueries.trainMix _),
    "c03_leakage_audit" -> (PipelineQueries.leakageAudit _),
    "c04_dataset_card" -> (PipelineQueries.datasetCard _),
    "c05_incremental_curate" -> (PipelineQueries.incrementalCurate _),
    "c06_profile_drift" -> (PipelineQueries.profileDrift _),
    "c07_dataset_seal" -> (PipelineQueries.datasetSeal _),
    "c08_schema_merge" -> (PipelineQueries.schemaMergeReport _),
    "c09_corrupt_ingest" -> (PipelineQueries.corruptIngest _),
    "c10_curriculum" -> (PipelineQueries.curriculum _),
    "c11_kanon_report" -> (PipelineQueries.kanonReport _),
    "c12_mix_alloc" -> (PipelineQueries.mixAlloc _),
    "c13_partitioned_lake" -> (PipelineQueries.partitionedLake _),
    "c14_forget_user" -> (PipelineQueries.forgetUser _),
    "c15_compact_lake" -> (PipelineQueries.compactLake _),
    "c16_idempotent_ingest" -> (PipelineQueries.idempotentIngest _),
    "c17_retention_sweep" -> (PipelineQueries.retentionSweep _),
    "c18_clustered_lake" -> (PipelineQueries.clusteredLake _),
    "c26_zorder_lake" -> (PipelineQueries.zorderLake _),
    "c27_branch_merge" -> (PipelineQueries.lakeBranchMerge _),
    "c19_lake_merge" -> (PipelineQueries.lakeMerge _),
    "c20_time_travel" -> (PipelineQueries.timeTravel _),
    "c21_lake_vacuum" -> (PipelineQueries.lakeVacuum _),
    "c22_expectations" -> (PipelineQueries.expectations _),
    "m08_media_integrity" -> (PipelineQueries.mediaIntegrity _),
    "c23_media_card" -> (PipelineQueries.mediaCard _),
    "c24_ref_integrity" -> (PipelineQueries.refIntegrity _),
    "q42_correlated_subquery" -> (Relational.correlatedSubquery _),
    "q43_not_in_null_aware" -> (Relational.notInNullAware _),
    "q44_forward_fill" -> (Relational.forwardFill _),
    "q45_peak_concurrency" -> (Relational.peakConcurrency _),
    "q46_hierarchy_flatten" -> (Relational.hierarchyFlatten _),
    "q47_longest_gap" -> (Relational.longestGap _),
    "q48_ewma" -> (Relational.ewmaDaily _),
    "q49_time_weighted_avg" -> (Relational.timeWeightedAvg _),
    "q51_frequent_sequences" -> (Relational.frequentSequences _),
    "q52_basket_lift" -> (Relational.basketLift _),
    "q53_funnel_latency" -> (Relational.funnelLatency _),
    "q54_session_paths" -> (Relational.sessionPaths _),
    "q55_spatial_join" -> (Relational.spatialJoin _),
    "q56_copurchase" -> (Relational.copurchase _),
    "q57_bom_rollup" -> (Relational.bomRollup _),
    "q58_mad_outliers" -> (Relational.madOutliers _),
    "q59_interval_coverage" -> (Relational.intervalCoverage _),
    "q60_windowed_funnel" -> (Relational.windowedFunnel _),
    "q61_gini" -> (Relational.giniConcentration _),
    "q62_abc" -> (Relational.abcAnalysis _),
    "q63_triangles" -> (Relational.triangleCount _),
    "q64_cusum" -> (Relational.cusumChangepoint _),
    "q65_benford" -> (Relational.benfordAudit _),
    "q66_ab_test" -> (Relational.abTestReadout _),
    "st49_stream_cusum" -> (StreamingQueries.streamCusum _),
    "st50_stream_ab_test" -> (StreamingQueries.streamAbTest _),
    "t36_heaps_law" -> (PipelineQueries.heapsLaw _),
    "t37_pmi" -> (PipelineQueries.pmiCollocations _),
    "s39_sq_ladder" -> (PipelineQueries.sqLadder _),
    "m10_ar_buckets" -> (PipelineQueries.arBuckets _),
    "c28_bloom_index" -> (PipelineQueries.bloomIndexedLake _),
    "q67_exact_quantiles" -> (Relational.exactQuantiles _),
    "t38_weighted_sample" -> (PipelineQueries.weightedSample _),
    "st51_stream_bloom_index" -> (StreamingQueries.streamBloomIndex _),
    "q68_skyline" -> (Relational.skyline _),
    "q69_grouped_quantiles" -> (Relational.groupedQuantiles _),
    "q70_type_correlation" -> (Relational.typeCorrelation _),
    "q71_equidepth_hist" -> (Relational.equidepthHistogram _),
    "t39_zipf_slope" -> (PipelineQueries.zipfSlope _),
    "s40_mips_norm_prune" -> (PipelineQueries.mipsNormPrune _),
    "c29_lake_version_diff" -> (PipelineQueries.lakeVersionDiff _),
    "t40_tfidf_keywords" -> (PipelineQueries.tfidfKeywords _),
    "st52_stream_incremental_cdc" ->
      (StreamingQueries.streamIncrementalCdc _),
    "q72_chi2_independence" -> (Relational.chi2Independence _),
    "q73_weighted_quantiles" -> (Relational.weightedQuantiles _),
    "t41_lexical_diversity" -> (PipelineQueries.lexicalDiversity _),
    "t42_token_entropy" -> (PipelineQueries.tokenEntropy _),
    "d29_containment_join" -> (PipelineQueries.containmentJoin _),
    "d30_edit_distance_join" -> (PipelineQueries.editDistanceJoin _),
    "d31_dedup_pressure" -> (PipelineQueries.dedupPressure _),
    "d32_minhash_fidelity" -> (PipelineQueries.minhashFidelity _),
    "d33_cluster_sizes" -> (PipelineQueries.clusterSizeHistogram _),
    "c36_typo_canonical" -> (PipelineQueries.typoCanonical _),
    "c37_rag_context" -> (PipelineQueries.ragContext _),
    "c38_fk_audit" -> (PipelineQueries.fkAudit _),
    "c39_consistent_snapshot" ->
      (PipelineQueries.consistentSnapshot _),
    "c40_provenance_chain" -> (PipelineQueries.provenanceChain _),
    "c30_zonemap_lake" -> (PipelineQueries.zoneMapLake _),
    "st53_stream_zonemap" -> (StreamingQueries.streamZoneMap _),
    "s41_ood_scan" -> (PipelineQueries.oodScan _),
    "q74_group_trend" -> (Relational.groupTrend _),
    "t43_code_detect" -> (PipelineQueries.codeDetect _),
    "c31_repartition_migrate" -> (PipelineQueries.repartitionMigrate _),
    "st54_stream_group_trend" -> (StreamingQueries.streamGroupTrend _),
    "q75_grouped_mode" -> (Relational.groupedMode _),
    "st55_stream_ood_gate" -> (StreamingQueries.streamOodGate _),
    "c32_composite_prune" -> (PipelineQueries.compositePrune _),
    "m11_clip_dedup" -> (PipelineQueries.clipDedup _),
    "t44_effective_tokens" -> (PipelineQueries.effectiveTokens _),
    "st56_stream_leaderboard" -> (StreamingQueries.streamLeaderboard _),
    "c33_csv_ingest" -> (PipelineQueries.csvIngest _),
    "c34_orc_roundtrip" -> (PipelineQueries.orcRoundtrip _),
    "q76_lateral_topk" -> (Relational.lateralTopK _),
    "t45_skipgram_cooc" -> (PipelineQueries.skipgramCooc _),
    "c35_dp_counts" -> (PipelineQueries.dpNoisyCounts _),
    "q77_recursive_cte" -> (Relational.recursiveCte _),
    "q78_variant_extract" -> (Relational.variantExtract _),
    "t46_kmv_native" -> (PipelineQueries.kmvTokensNative _),
    "t47_vocab_coverage" -> (PipelineQueries.vocabCoverage _),
    "t48_bpe_fertility" -> (PipelineQueries.bpeFertility _),
    "t49_length_histogram" -> (PipelineQueries.lengthHistogram _),
    "q79_attribution" -> (Relational.attribution _),
    "st57_stream_attribution" -> (StreamingQueries.streamAttribution _),
    "q80_transition_matrix" -> (Relational.transitionMatrix _),
    "q81_mann_whitney" -> (Relational.mannWhitney _),
    "q82_skew_audit" -> (Relational.skewAudit _),
    "q83_floored_balance" -> (Relational.flooredBalance _),
    "q84_gains_table" -> (Relational.gainsTable _),
    "q85_interpolate" -> (Relational.interpolateDaily _),
    "q86_kruskal_wallis" -> (Relational.kruskalWallis _),
    "q87_wilson_rank" -> (Relational.wilsonRank _),
    "q88_rolling_slope" -> (Relational.rollingSlope _),
    "q89_weekday_index" -> (Relational.weekdayIndex _),
    "q90_order_inversions" -> (Relational.orderInversions _),
    "q91_ks_test" -> (Relational.ksTest _),
    "q92_spearman" -> (Relational.spearman _),
    "q93_autocorr" -> (Relational.autocorrLag1 _),
    "q94_trimmed_mean" -> (Relational.trimmedMean _),
    "q95_gini" -> (Relational.gini _),
    "q96_chi_squared" -> (Relational.chiSquared _),
    "q97_benford" -> (Relational.benford _),
    "t50_ngram_novelty" -> (PipelineQueries.ngramNovelty _),
    "d34_soft_dedup" -> (PipelineQueries.softDedup _),
    "c42_legacy_manifest" -> (PipelineQueries.legacyManifestMerge _),
    "st64_stream_chisq" -> (StreamingQueries.streamChiSquared _),
    "q98_salted_join" -> (Relational.saltedSkewJoin _),
    "st65_stream_benford" -> (StreamingQueries.streamBenford _),
    "m15_transcript_align" -> (PipelineQueries.transcriptAlign _),
    "q99_weighted_median" -> (Relational.weightedMedian _),
    "t51_repetition_gate" -> (PipelineQueries.repetitionGate _),
    "d35_cluster_keeper" -> (PipelineQueries.clusterKeeper _),
    "st66_stream_median" -> (StreamingQueries.streamMedian _),
    "c43_source_inequality" -> (PipelineQueries.sourceInequality _),
    "st67_stream_gini" -> (StreamingQueries.streamGini _),
    "st68_stream_trimmed_mean" -> (StreamingQueries.streamTrimmedMean _),
    "d36_containment_fidelity" -> (PipelineQueries.containmentFidelity _),
    "q101_mad" -> (Relational.madExact _),
    "st69_stream_mad" -> (StreamingQueries.streamMad _),
    "q102_iqr_outliers" -> (Relational.iqrOutliers _),
    "st70_stream_iqr" -> (StreamingQueries.streamIqrOutliers _),
    "q103_psi" -> (Relational.psi _),
    "st73_stream_psi" -> (StreamingQueries.streamPsi _),
    "t52_gate_kappa" -> (PipelineQueries.gateKappa _),
    "t53_ece" -> (PipelineQueries.eceReliability _),
    "st74_stream_ece" -> (StreamingQueries.streamEce _),
    "c44_compaction_plan" -> (PipelineQueries.compactionPlan _),
    "q108_pagerank" -> (Relational.pagerank _),
    "q109_hodges_lehmann" -> (Relational.hodgesLehmann _),
    "c45_preference_pairs" -> (PipelineQueries.preferencePairs _),
    "st75_stream_pagerank" -> (StreamingQueries.streamPagerank _),
    "t54_encoding_audit" -> (PipelineQueries.encodingAudit _),
    "t55_score_quantiles" -> (PipelineQueries.scoreQuantiles _),
    "q110_mann_kendall" -> (Relational.mannKendall _),
    "st76_stream_quantiles" -> (StreamingQueries.streamScoreQuantiles _),
    "d37_block_dedup" -> (PipelineQueries.blockDedup _),
    "q111_seasonal_anomaly" -> (Relational.seasonalAnomaly _),
    "m16_phash_clusters" -> (PipelineQueries.phashClusters _),
    "st77_stream_block_keepers" ->
      (StreamingQueries.streamBlockKeepers _),
    "st78_stream_mann_kendall" ->
      (StreamingQueries.streamMannKendall _),
    "st79_stream_theil_sen" -> (StreamingQueries.streamTheilSen _),
    "st80_stream_kendall" -> (StreamingQueries.streamKendallTau _),
    "c46_ablation_ladder" -> (PipelineQueries.ablationLadder _),
    "q112_runs_test" -> (Relational.runsTest _),
    "c47_jsonl_roundtrip" -> (PipelineQueries.jsonlRoundtrip _),
    "d38_simhash_fidelity" -> (PipelineQueries.simhashFidelity _),
    "st81_stream_hodges_lehmann" ->
      (StreamingQueries.streamHodgesLehmann _),
    // (count: 411 registered queries as of the round-14 continuation)
    "q104_winsorized_mean" -> (Relational.winsorizedMean _),
    "st71_stream_winsorized" -> (StreamingQueries.streamWinsorizedMean _),
    "q105_cramers_v" -> (Relational.cramersV _),
    "st72_stream_cramers_v" -> (StreamingQueries.streamCramersV _),
    "q106_theil_sen" -> (Relational.theilSen _),
    "q107_kendall_tau" -> (Relational.kendallTau _),
    "c41_split_balance" -> (PipelineQueries.splitBalance _),
    "m14_keyframes" -> (PipelineQueries.keyframes _),
    "st63_stream_ks" -> (StreamingQueries.streamKs _),
    "st60_stream_floored_balance" ->
      (StreamingQueries.streamFlooredBalance _),
    "st59_stream_mann_whitney" ->
      (StreamingQueries.streamMannWhitney _),
    "st61_stream_seal" -> (StreamingQueries.streamContentSeal _),
    "st62_stream_lateness" -> (StreamingQueries.streamLateness _),
    "st58_stream_transitions" -> (StreamingQueries.streamTransitions _),
    "s42_mmr_rerank" -> (PipelineQueries.mmrRerank _),
    "s43_jl_recall" -> (PipelineQueries.jlRecall _),
    "s44_rrf_fusion" -> (PipelineQueries.rrfFusion _),
    "s45_metric_agreement" -> (PipelineQueries.metricAgreement _),
    "st48_stream_windowed_funnel" ->
      (StreamingQueries.streamWindowedFunnel _),
    "c25_subject_access" -> (PipelineQueries.subjectAccessReport _),
    "q50_point_in_time_join" -> (Relational.pointInTimeJoin _),
    "st40_stream_ewma" -> (StreamingQueries.streamEwma _),
    "st41_stream_metering" -> (StreamingQueries.streamMetering _),
    "st42_stream_sequences" ->
      (StreamingQueries.streamFrequentSequences _),
    "st43_stream_basket_lift" -> (StreamingQueries.streamBasketLift _),
    "st44_stream_session_paths" ->
      (StreamingQueries.streamSessionPaths _),
    "st45_stream_anomaly" -> (StreamingQueries.streamAnomaly _),
    "st46_stream_spatial" -> (StreamingQueries.streamSpatialJoin _),
    "t32_cluster_split" -> (PipelineQueries.clusterSplit _),
    "t33_readability" -> (PipelineQueries.readabilityGrades _),
    "t34_perplexity" -> (PipelineQueries.perplexityGate _),
    "t35_js_drift" -> (PipelineQueries.jsDrift _),
    "d26_cdc_chunks" -> (PipelineQueries.cdcChunks _),
    "st36_stream_forget" -> (StreamingQueries.streamForget _),
    "st37_stream_lake_ingest" -> (StreamingQueries.streamLakeIngest _),
    "st38_stream_forward_fill" -> (StreamingQueries.streamForwardFill _),
    "st39_stream_peak_concurrency" ->
      (StreamingQueries.streamPeakConcurrency _),
    "t25_mask_corrupt" -> (PipelineQueries.maskCorrupt _),
    "t26_quota_mix" -> (PipelineQueries.quotaMix _),
    "t27_pps_sample" -> (PipelineQueries.ppsSample _),
    "t28_bpe_merges" -> (PipelineQueries.bpeMerges _),
    "t30_langid_confusion" -> (PipelineQueries.langIdConfusion _),
    "t31_bpe_apply" -> (PipelineQueries.bpeApply _),
    "t01_langid" -> (PipelineQueries.langId _),
    "t02_quality" -> (PipelineQueries.quality _),
    "t03_token_stats" -> (PipelineQueries.tokenStats _),
    "t04_fingerprint" -> (PipelineQueries.fingerprint _),
    "t05_rolling_fp" -> (PipelineQueries.rollingFingerprint _),
    "t06_top_terms" -> (PipelineQueries.topTerms _),
    "t07_hash_split" -> (PipelineQueries.hashSplit _),
    "t08_repetition" -> (PipelineQueries.repetition _),
    "t09_stratified" -> (PipelineQueries.stratified _),
    "t10_rarity" -> (PipelineQueries.rarity _),
    "t11_shuffle_shard" -> (PipelineQueries.shuffleShard _),
    "t12_pack_sequences" -> (PipelineQueries.packSequences _),
    "t13_bigram_lm" -> (PipelineQueries.bigramLm _),
    "t14_kmv_distinct" -> (PipelineQueries.kmvTokens _),
    "m01_multimodal" -> (PipelineQueries.multimodal _),
    "m02_media_resize" -> (PipelineQueries.mediaResize _),
    "m03_frame_sample" -> (PipelineQueries.frameSample _),
    "m04_phash_pairs" -> (PipelineQueries.phashPairs _),
    "m05_clip_filter" -> (PipelineQueries.clipFilter _),
    "m06_audio_segments" -> (PipelineQueries.audioSegments _),
    "m12_loudness_gain" -> (PipelineQueries.loudnessGain _),
    "m13_sample_coverage" -> (PipelineQueries.sampleCoverage _),
    "m07_shot_boundaries" -> (PipelineQueries.shotBoundaries _),
    "m09_container_dedup" -> (PipelineQueries.containerDedup _),
    "st01_stream_count" -> (StreamingQueries.streamCount _),
    "st02_stream_tumble" -> (StreamingQueries.streamTumble _),
    "st03_stream_loopback" -> (StreamingQueries.streamLoopback _),
    "st04_stream_join_refresh" -> (StreamingQueries.streamJoinRefresh _),
    "st05_stream_lookup_refresh" -> (StreamingQueries.streamLookupRefresh _),
    "st06_stream_session" -> (StreamingQueries.streamSession _),
    "st07_stream_chained" -> (StreamingQueries.streamChained _),
    "st08_stream_dedup" -> (StreamingQueries.streamDedup _),
    "st09_stream_visitor" -> (StreamingQueries.streamVisitor _),
    "st10_stream_neardup" -> (StreamingQueries.streamNearDup _),
    "st11_stream_decontam" -> (StreamingQueries.streamDecontaminate _),
    "st12_stream_curate" -> (StreamingQueries.streamCurate _),
    "st13_stream_funnel" -> (StreamingQueries.streamFunnel _),
    "st14_stream_retention" -> (StreamingQueries.streamRetention _),
    "st15_stream_sliding" -> (StreamingQueries.streamSlidingWindow _),
    "st16_stream_recover" -> (StreamingQueries.streamRecover _),
    "st17_stream_funnel_ooo" -> (StreamingQueries.streamFunnelUnordered _),
    "st18_stream_kmv" -> (StreamingQueries.streamKmv _),
    "st19_stream_card" -> (StreamingQueries.streamCard _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "g01_count_per_key" ->
      """SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS cnt
         FROM events GROUP BY user_id""",
    "g02_sum_state" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
                CAST(sum(event_id) AS BIGINT) AS sum_id
         FROM events GROUP BY user_id""",
    "g03_multi_input" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
                count(*) FILTER (WHERE event_type IN ('click','view')) AS cnt_a,
                count(*) FILTER (WHERE event_type NOT IN ('click','view')) AS cnt_b
         FROM events GROUP BY user_id""",
    "g04_join_table" ->
      """SELECT CAST(e.user_id AS VARCHAR) AS key,
                coalesce(max(c.c_mktsegment), '') AS segment,
                count(*) AS cnt
         FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
         GROUP BY e.user_id""",
    "g05_lookup_table" ->
      """SELECT CAST(e.user_id AS VARCHAR) AS key, max(n.n_name) AS nation
         FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
         GROUP BY e.user_id""",
    "g06_loopback" ->
      """SELECT CAST(user_id % 10 AS VARCHAR) AS key, count(*) AS cnt
         FROM events GROUP BY user_id % 10""",
    "g07_tombstones" ->
      """WITH ordered AS (
           SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events),
         lastp AS (
           SELECT user_id, max(rn) AS mrn FROM ordered
           WHERE event_type = 'purchase' GROUP BY user_id)
         SELECT CAST(o.user_id AS VARCHAR) AS key, count(*) AS cnt
         FROM ordered o LEFT JOIN lastp p ON o.user_id = p.user_id
         WHERE o.event_type <> 'purchase' AND (p.mrn IS NULL OR o.rn > p.mrn)
         GROUP BY o.user_id""",
    // Log compaction: last write per key by (ts, event_id); a final
    // 'purchase' is a tombstone that drops the key.
    "g18_compact_changelog" ->
      """WITH ordered AS (
           SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
           FROM events)
         SELECT CAST(user_id AS VARCHAR) AS key, event_type AS last_event
         FROM ordered WHERE rn = 1 AND event_type <> 'purchase'""",
    // g19: the whole 3-messaging app end to end — blocked = senders
    // with >= 60 messages (the monotone replay rule), kept messages
    // word-translated, last-5 feed per receiver in (ts, event_id)
    // order.
    "g19_messaging_app" ->
      """WITH m AS (SELECT CAST(user_id AS VARCHAR) AS f,
             CAST((user_id + 1 + event_id % 7) % 1000 AS VARCHAR) AS t,
             event_type AS c, epoch_us(ts) AS us, event_id
           FROM events),
         blocked AS (SELECT f FROM m GROUP BY f HAVING count(*) >= 60),
         kept AS (SELECT m.* FROM m
                  LEFT JOIN blocked b ON b.f = m.f WHERE b.f IS NULL),
         tr AS (SELECT f, t,
                  CASE c WHEN 'view' THEN 'seen' WHEN 'click' THEN 'tap'
                       WHEN 'purchase' THEN 'buy' ELSE c END AS c,
                  us, event_id
                FROM kept),
         feed AS (SELECT t AS user,
                    list(f || ':' || c ORDER BY us, event_id) AS l
                  FROM tr GROUP BY t)
         SELECT user, CAST(least(len(l), 5) AS BIGINT) AS n_feed,
           array_to_string(l[greatest(len(l) - 4, 1):], '|') AS feed
         FROM feed""",
    "g08_emit_headers" ->
      """SELECT CAST(user_id AS VARCHAR) AS key, event_id,
                event_type AS val, 'events' AS hdr_src
         FROM events""",
    "g09_stateless_filter" ->
      """SELECT CAST(user_id AS VARCHAR) AS key, event_id,
                upper(event_type) AS payload
         FROM events WHERE event_type = 'click' AND value > 100""",
    "g10_visitor" ->
      """SELECT CAST(user_id AS VARCHAR) AS key, count(*) * 2 AS cnt
         FROM events GROUP BY user_id""",
    "g11_last_n" ->
      """WITH ordered AS (
           SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events)
         SELECT CAST(user_id AS VARCHAR) AS key,
                string_agg(event_type, ',' ORDER BY rn DESC) AS last5
         FROM ordered WHERE rn <= 5 GROUP BY user_id""",
    "g12_view_point" ->
      """SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS cnt
         FROM events GROUP BY user_id
         HAVING CAST(user_id AS VARCHAR) IN ('1','12','123')""",
    "g13_view_range" ->
      """SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS cnt
         FROM events GROUP BY user_id
         HAVING CAST(user_id AS VARCHAR) >= '1' AND CAST(user_id AS VARCHAR) < '3'""",
    "g14_view_prefix" ->
      """SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS cnt
         FROM events GROUP BY user_id
         HAVING CAST(user_id AS VARCHAR) LIKE '1%'""",
    "g15_json_state" ->
      """WITH ordered AS (
           SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                  count(*) OVER (PARTITION BY user_id) AS cnt
           FROM events)
         SELECT CAST(user_id AS VARCHAR) AS key, cnt, event_type AS last_type
         FROM ordered WHERE rn = cnt""",
    // Same oracle as g15: the from_json columnar read must equal the
    // jackson per-row decode.
    "g17_json_relational" ->
      """WITH ordered AS (
           SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                  count(*) OVER (PARTITION BY user_id) AS cnt
           FROM events)
         SELECT CAST(user_id AS VARCHAR) AS key, cnt, event_type AS last_type
         FROM ordered WHERE rn = cnt""",
    // Chained processors: blocker table = one row per user with >= 10
    // events, counting the detector's every-10th-event block commands.
    "g16_chained" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
                count(*) // 10 AS n_blocks
         FROM events GROUP BY user_id HAVING count(*) >= 10""",
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "q02_revenue_forecast" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                          CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""",
    "q03_join_topk" ->
      """SELECT o_orderkey, o_orderpriority,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY o_orderkey, o_orderpriority
         ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "q04_semi_join" ->
      """SELECT o_orderpriority, count(*) AS cnt FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
         GROUP BY o_orderpriority""",
    "q05_anti_join" ->
      """SELECT s_nationkey, count(*) AS cnt FROM supplier
         WHERE NOT EXISTS (SELECT 1 FROM lineitem
                           WHERE l_suppkey = s_suppkey
                             AND l_quantity >= 49 AND l_discount >= 0.08
                             AND l_shipdate >= TIMESTAMP '2000-01-01')
         GROUP BY s_nationkey""",
    "q06_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey""",
    "q07_multi_join" ->
      """SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
         GROUP BY n_name""",
    "q08_window_topk" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders) WHERE rk <= 3""",
    "q09_window_running" ->
      """SELECT o_orderkey, o_custkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total
         FROM orders""",
    "q10_event_tumble" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
           count(*) AS cnt, count(DISTINCT user_id) AS users,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2""",
    "q11_set_ops" ->
      """SELECT k, 'both' AS tag FROM (
           SELECT DISTINCT o_custkey AS k FROM orders
           INTERSECT
           SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING')
         UNION ALL
         SELECT k, 'no_orders' AS tag FROM (
           SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
           EXCEPT
           SELECT DISTINCT o_custkey AS k FROM orders)""",
    "q12_scalar_funcs" ->
      """SELECT p_partkey, upper(p_name) AS uname, substring(p_type, 1, 5) AS type5,
           length(p_name) AS name_len, p_brand || '#' || p_type AS brand_type,
           p_size % 7 AS size_mod,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           CASE WHEN p_size > 25 THEN 'L' ELSE 'S' END AS size_class
         FROM part""",
    "q13_asof_join" ->
      """SELECT a.l_orderkey, a.l_linenumber,
           strftime(b.l_shipdate, '%Y-%m-%d') AS prev_ship
         FROM lineitem a ASOF LEFT JOIN lineitem b
           ON a.l_suppkey = b.l_suppkey AND a.l_shipdate > b.l_shipdate""",
    "q14_rollup" ->
      """SELECT c_mktsegment, n_name, count(*) AS cnt,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY ROLLUP (c_mktsegment, n_name)""",
    "q15_distinct_agg" ->
      """SELECT event_type, count(DISTINCT user_id) AS distinct_users,
           count(*) AS cnt
         FROM events GROUP BY event_type""",
    "q16_json_extract" ->
      """SELECT event_type,
           CAST(sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
           max(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS max_k,
           count(*) AS cnt
         FROM events GROUP BY event_type""",
    // Gap-based sessionization: new session at gap >= 1h (mirrors
    // Spark's strict-overlap merge rule for [ts, ts+gap) intervals).
    "q17_session_window" ->
      """WITH marked AS (
           SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 1 HOUR THEN 1 ELSE 0 END AS new_s
           FROM events),
         sess AS (
           SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
           FROM marked)
         SELECT CAST(user_id AS VARCHAR) AS key,
           epoch_us(min(ts)) AS session_start, count(*) AS cnt
         FROM sess GROUP BY user_id, sid""",
    // Pivot = conditional aggregation with an explicit value list;
    // absent cells are 0 (count FILTER), matching the coalesce.
    "q22_pivot" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'error') AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS signup,
           count(*) FILTER (WHERE event_type = 'view') AS view
         FROM events GROUP BY 1""",
    // The granule bucketing is semantics-preserving, so the oracle is
    // the PLAIN interval join — a stronger check than mirroring the
    // granule construction would be. Anchors with an empty ±60 s window
    // survive with zero counts via the left join.
    "q25_range_join" ->
      """WITH a AS (SELECT event_id, epoch_us(ts) AS ats FROM events
                    WHERE event_type = 'purchase'),
         b AS (SELECT event_id, epoch_us(ts) AS bts, value FROM events)
         SELECT a.event_id,
           CAST(count(b.event_id) AS BIGINT) AS n_nearby,
           coalesce(CAST(sum(CAST(b.value AS DECIMAL(18,6))) AS DOUBLE), 0.0)
             AS sum_value
         FROM a LEFT JOIN b
           ON b.bts >= a.ats - 60000000 AND b.bts <= a.ats + 60000000
              AND b.event_id <> a.event_id
         GROUP BY a.event_id""",
    // Step k+1 counts users with an event of that type STRICTLY after
    // the earliest completion of step k — the oracle expresses the same
    // min-chaining as explicit per-step CTEs (a stronger check than
    // mirroring the window-chain construction would be).
    "q26_funnel" -> funnelOracleSql,
    // The streaming state machine must land on the identical funnel —
    // same oracle as q26.
    "st13_stream_funnel" -> funnelOracleSql,
    // Same oracle again under HASH-split (out-of-order) delivery —
    // the buffering state machine must resolve the identical chain.
    "st17_stream_funnel_ooo" -> funnelOracleSql,
    // Equal-ts events are RANGE-frame peers in both engines, so the
    // frame contents are order-independent; decimal summation makes
    // the sum exact before the one double cast.
    "q28_sliding_window" -> slidingOracleSql,
    // The streaming deque must emit the identical frame row per event
    // — same oracle as q28.
    "st15_stream_sliding" -> slidingOracleSql,
    // Deliberately st01's oracle: the stop/cold-restart cycle must
    // reconstruct exactly the table an uninterrupted run produces.
    "st16_stream_recover" ->
      """SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS cnt
         FROM events GROUP BY user_id""",
    // Rates from exact counts + IEEE sqrt (correctly rounded — same
    // doubles in both engines); selection = md5 fraction < rate.
    "t19_temperature_mix" ->
      """WITH c AS (SELECT source, count(*) AS n FROM documents
                    GROUP BY 1),
         w AS (SELECT source, n, sqrt(CAST(n AS DOUBLE)) AS w FROM c),
         r AS (SELECT source,
                 least(1.0, 200.0 * w
                   / ((SELECT sum(w) FROM w) * CAST(n AS DOUBLE)))
                   AS rate
               FROM w)
         SELECT d.source, d.doc_id
         FROM documents d JOIN r ON d.source = r.source
         WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)),1,8))::BIGINT
                 AS DOUBLE) / 4294967296.0 < r.rate""",
    // Tokenizer identical to t06 (split on ' ', drop empties); counts
    // exact integers, ties in the Zipf head broken by binary term
    // order in both engines; sums cast back from HUGEINT.
    "t18_vocab_stats" ->
      """WITH tok AS (SELECT source,
                        unnest(string_split(text, ' ')) AS term
                      FROM documents),
         c AS (SELECT source, term, count(*) AS cnt FROM tok
               WHERE len(term) > 0 GROUP BY 1, 2),
         tot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS total_tokens,
                   CAST(count(*) AS BIGINT) AS vocab,
                   CAST(count(*) FILTER (WHERE cnt = 1) AS BIGINT)
                     AS hapax
                 FROM c GROUP BY 1),
         top AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS topk FROM (
                   SELECT source, cnt,
                     row_number() OVER (PARTITION BY source
                       ORDER BY cnt DESC, term) AS rn
                   FROM c) WHERE rn <= 10 GROUP BY 1)
         SELECT tot.source, total_tokens, vocab, hapax,
           CAST(topk AS DOUBLE) / CAST(total_tokens AS DOUBLE)
             AS topk_mass
         FROM tot JOIN top USING (source)""",
    // Both engines truncate weeks to Monday; the day-diff of two
    // week-truncated dates is a multiple of 7, so // 7 is exact.
    "q27_retention" -> retentionOracleSql,
    // The streaming bitmask state machine must land on the identical
    // cohort table — same oracle as q27.
    "st14_stream_retention" -> retentionOracleSql,
    // The bucketing is invisible to the result: the plain join is the
    // oracle (sum through DECIMAL like q01, cast to double at the end).
    "q24_bucketed_join" ->
      """SELECT l_returnflag, count(*) AS cnt,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderstatus = 'F'
         GROUP BY l_returnflag""",
    // q22's wide matrix melted back to long — UNION ALL arm per value
    // column, the engine-portable spelling of UNPIVOT.
    "q23_unpivot" ->
      """WITH wide AS (
           SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             count(*) FILTER (WHERE event_type = 'click') AS click,
             count(*) FILTER (WHERE event_type = 'error') AS error,
             count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             count(*) FILTER (WHERE event_type = 'signup') AS signup,
             count(*) FILTER (WHERE event_type = 'view') AS view
           FROM events GROUP BY 1)
         SELECT day, 'click' AS event_type, click AS cnt FROM wide
         UNION ALL
         SELECT day, 'error', error FROM wide
         UNION ALL
         SELECT day, 'purchase', purchase FROM wide
         UNION ALL
         SELECT day, 'signup', signup FROM wide
         UNION ALL
         SELECT day, 'view', view FROM wide""",
    // Mirrors TextAnalysis.kmvDistinct: k=16 minimum distinct 32-bit
    // md5 hashes per language; estimate (k-1)*2^32/x_k, exact below
    // capacity; the true distinct count rides along as the audit.
    "t14_kmv_distinct" -> kmvOracleSql,
    // t46: the native sketch aggregate must land on t14's exact table
    "t46_kmv_native" -> kmvOracleSql,
    // t49: bucket = integer bit-length − 1 (Spark bin ≡ DuckDB bin),
    // no float log.
    "t49_length_histogram" ->
      """SELECT CAST(length(bin(n_chars)) - 1 AS BIGINT)
             AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT)
             AS n_tokens
         FROM documents WHERE n_chars > 0
         GROUP BY 1""",
    // t48: t31's trained segmentation rolled up per language; the
    // fertility ratio is one exact milli division.
    "t48_bpe_fertility" ->
      s"""${bpeChainSql(4)}
         SELECT d.lang, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(len(v.syms)) AS BIGINT) AS n_tokens,
           CAST((1000 * sum(len(v.syms))) // count(*) AS BIGINT)
             AS fertility_milli
         FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
               FROM documents) d
         JOIN v4 v ON v.w = d.w
         WHERE length(d.w) > 0
         GROUP BY d.lang""",
    // t47: one (cnt DESC, word) rank with count-weighted cumsum; each
    // budget reads its boundary row, ranks past n clamp to n.
    "t47_vocab_coverage" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
                    FROM documents),
         c AS (SELECT word, count(*) AS cnt FROM w GROUP BY word),
         r AS (SELECT *,
             row_number() OVER (ORDER BY cnt DESC, word) AS rank,
             sum(cnt) OVER (ORDER BY cnt DESC, word
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM c),
         t AS (SELECT count(*) AS n, sum(cnt) AS tot FROM c),
         ks AS (SELECT unnest([100, 1000, 10000]) AS k)
         SELECT CAST(k AS BIGINT) AS k,
           CAST(least(k, t.n) AS BIGINT) AS vocab_size,
           CAST((SELECT r.cum FROM r WHERE r.rank = least(k, t.n))
             AS BIGINT) AS covered_tokens,
           CAST(t.tot AS BIGINT) AS total_tokens,
           CAST((SELECT r.cum FROM r WHERE r.rank = least(k, t.n))
             AS DOUBLE) / CAST(t.tot AS DOUBLE) AS coverage
         FROM ks, t""",
    // q79/st57: one window computation, one state machine — same
    // per-user attribution rollup, exact microsecond lags.
    "q79_attribution" -> attributionOracleSql,
    "st57_stream_attribution" -> attributionOracleSql,
    // q80 computes transitions by a per-user lead window; st58
    // maintains the same counts in per-user keyed state — one oracle
    // proves batch ≡ streaming ≡ the declarative SQL.
    "q80_transition_matrix" -> transitionOracleSql,
    "st58_stream_transitions" -> transitionOracleSql,
    // q81: doubled midranks over the tie-collapsed (type, value)
    // frame; the z>=1.96 decision cross-multiplied in exact integers
    // (DECIMAL(38,0) on Spark, HUGEINT in DuckDB). st59 maintains the
    // collapsed counts as streaming keyed state and runs the SAME
    // statistic fold — one oracle proves both.
    "q81_mann_whitney" -> mannWhitneyOracleSql,
    "st59_stream_mann_whitney" -> mannWhitneyOracleSql,
    // st62: late iff below the strict-prefix running max in arrival
    // (event_id) order — the watermark's own test, replayed by one
    // window in the oracle.
    "st62_stream_lateness" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t
                    FROM events),
         r AS (SELECT user_id, event_id, t,
                 max(t) OVER (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS pmax
               FROM e)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN pmax IS NOT NULL AND t < pmax
             THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(coalesce(max(CASE WHEN pmax IS NOT NULL AND t < pmax
             THEN pmax - t END), 0) AS BIGINT) AS max_late_us
         FROM r GROUP BY user_id""",
    // q90: per-user discordant (arrival, event-time) pairs; integer
    // division n(n-1)/2 is exact (consecutive integers).
    "q90_order_inversions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t
                    FROM events),
         inv AS (SELECT a.user_id, count(*) AS inversions,
                   max(a.t - b.t) AS max_late_us
                 FROM e a JOIN e b ON b.user_id = a.user_id
                   AND a.event_id < b.event_id AND a.t > b.t
                 GROUP BY a.user_id),
         n AS (SELECT user_id, count(*) AS n_events FROM e
               GROUP BY user_id)
         SELECT n.user_id, CAST(n.n_events AS BIGINT) AS n_events,
           CAST(n.n_events * (n.n_events - 1) / 2 AS BIGINT) AS n_pairs,
           CAST(coalesce(inv.inversions, 0) AS BIGINT) AS inversions,
           CAST(coalesce(inv.max_late_us, 0) AS BIGINT) AS max_late_us,
           CASE WHEN n.n_events > 1 THEN
             CAST(coalesce(inv.inversions, 0) AS DOUBLE)
               / CAST(n.n_events * (n.n_events - 1) / 2 AS DOUBLE)
             ELSE 0.0 END AS disorder
         FROM n LEFT JOIN inv ON inv.user_id = n.user_id""",
    // q91/st63: KS D as the exact integer d_num = max|cumA·n_b −
    // cumB·n_a|; rejection cross-multiplied with c=1.36 (18496/10⁴).
    "q91_ks_test" -> ksOracleSql,
    "st63_stream_ks" -> ksOracleSql,
    // q96/st64: weekday is pure day-arithmetic from a fixed epoch;
    // every cell contribution is one HUGEINT floor-division at micro
    // grain, so the per-type statistic is an exact integer sum.
    "q96_chi_squared" -> chisqOracleSql,
    "st64_stream_chisq" -> chisqOracleSql,
    // q97/st65: shared Benford derivation (the st63/st64 discipline —
    // streamed sufficient statistic, literal batch fold, one oracle).
    "q97_benford" -> benfordOracleSql,
    "st65_stream_benford" -> benfordOracleSql,
    // q99: lower weighted median on the tie-collapsed frame — pure
    // order statistic, integer comparisons end to end.
    "q99_weighted_median" ->
      """WITH g AS (SELECT l_returnflag AS flag,
                CAST(floor(l_extendedprice * 100) AS BIGINT) AS x,
                CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
                  AS wv
              FROM lineitem GROUP BY 1, 2),
         c AS (SELECT flag, x, wv,
                 sum(wv) OVER (PARTITION BY flag ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
                 sum(wv) OVER (PARTITION BY flag) AS total
               FROM g)
         SELECT flag, CAST(max(total) AS BIGINT) AS total_w,
           CAST(min(x) AS BIGINT) AS median_centi,
           CAST(CAST(min(x) AS BIGINT) AS DOUBLE) / 100.0 AS median
         FROM c WHERE cum * 2 >= total GROUP BY flag""",
    // t51: NON-distinct 3-gram occurrences; dup/top fractions per doc.
    "t51_repetition_gate" ->
      """WITH sh AS (SELECT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w
                 FROM documents)),
         g AS (SELECT doc_id, s, count(*) AS c FROM sh
               GROUP BY doc_id, s)
         SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_occ,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(max(c) AS BIGINT) AS top_c,
           CAST(CAST(sum(c) - count(*) AS BIGINT) AS DOUBLE)
             / CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) AS dup_frac,
           CAST(CAST(max(c) AS BIGINT) AS DOUBLE)
             / CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) AS top_frac,
           (sum(c) - count(*)) * 1000 <= sum(c) * 200 AS keep
         FROM g GROUP BY doc_id""",
    // d35: d07's cluster chain + longest-wins representative.
    "d35_cluster_keeper" ->
      s"""$clusterChainSql,
         clus AS (SELECT id AS doc_id, min(lbl) AS cluster
                  FROM walk GROUP BY id),
         j AS (SELECT c.cluster, c.doc_id, d.n_chars
               FROM clus c JOIN documents d ON d.doc_id = c.doc_id),
         r AS (SELECT cluster, doc_id, n_chars,
                 row_number() OVER (PARTITION BY cluster
                   ORDER BY n_chars DESC, doc_id ASC) AS rn,
                 sum(n_chars) OVER (PARTITION BY cluster) AS tot,
                 count(*) OVER (PARTITION BY cluster) AS nm
               FROM j)
         SELECT cluster, CAST(nm AS BIGINT) AS n_members,
           doc_id AS keep_id, CAST(n_chars AS BIGINT) AS chars_kept,
           CAST(tot - n_chars AS BIGINT) AS chars_dropped
         FROM r WHERE rn = 1""",
    // c43: per-source token shares + corpus Gini/Theil; Theil's ln
    // rides the FMA-proof fixed-point log2 (t42's machinery), so
    // theil_num is an exact integer both engines agree on.
    "c43_source_inequality" -> {
      import graft.functions.PortableMath
      s"""WITH d AS (SELECT source,
             len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS toks
           FROM documents),
         ps AS (SELECT source, count(*) AS n_docs,
                  CAST(sum(toks) AS BIGINT) AS tokens
                FROM d GROUP BY source),
         t AS (SELECT CAST(sum(tokens) AS BIGINT) AS s, count(*) AS n
               FROM ps),
         gi AS (SELECT tokens AS x,
                  row_number() OVER (ORDER BY tokens) AS rn FROM ps),
         gm AS (SELECT count(*) AS gn,
                  sum(CAST(rn AS HUGEINT) * x) AS six,
                  sum(CAST(x AS HUGEINT)) AS sx FROM gi),
         g AS (SELECT CAST(2 * six - (gn + 1) * sx AS BIGINT)
                   AS gini_num,
                 CAST(gn * sx AS BIGINT) AS gini_den,
                 CAST(CAST(2 * six - (gn + 1) * sx AS BIGINT) AS DOUBLE)
                   / CAST(CAST(gn * sx AS BIGINT) AS DOUBLE) AS gini
               FROM gm),
         wr AS (SELECT ps.tokens,
                  CAST(ps.tokens * t.n AS DOUBLE) / CAST(t.s AS DOUBLE)
                    AS r,
                  t.s AS s
                FROM ps, t),
         ${PortableMath.log2FixedSqlStages("wr", "r", "l2", "lg")},
         th AS (SELECT
                  CAST(sum(CAST(tokens AS HUGEINT) * l2) AS BIGINT)
                    AS theil_num,
                  s
                FROM lgout GROUP BY s),
         th2 AS (SELECT theil_num,
                   CAST(theil_num AS DOUBLE) * 0.6931471805599453
                     / (65536.0 * CAST(s AS DOUBLE)) AS theil
                 FROM th)
         SELECT ps.source, ps.n_docs, ps.tokens,
           (ps.tokens * 1000000) // t.s AS share_ppm,
           g.gini_num, g.gini_den, g.gini, th2.theil_num, th2.theil
         FROM ps, t, g, th2"""
    },
    // st66: exact online median — same collapsed order statistic
    // recomputed from raw events (weight = per-value count).
    "st66_stream_median" ->
      """WITH g AS (SELECT event_type,
                CAST(floor(value * 100) AS BIGINT) AS x,
                count(*) AS wv
              FROM events GROUP BY 1, 2),
         c AS (SELECT event_type, x, wv,
                 sum(wv) OVER (PARTITION BY event_type ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
                 sum(wv) OVER (PARTITION BY event_type) AS total
               FROM g)
         SELECT event_type, CAST(max(total) AS BIGINT) AS total_w,
           CAST(min(x) AS BIGINT) AS median_centi,
           CAST(CAST(min(x) AS BIGINT) AS DOUBLE) / 100.0 AS median
         FROM c WHERE cum * 2 >= total GROUP BY event_type""",
    // q98: the oracle runs the PLAIN join — hash match proves the
    // salted scatter/replicate join is row-for-row identical.
    "q98_salted_join" ->
      """WITH e AS (SELECT CASE WHEN user_id % 10 < 5 THEN 1
                  ELSE user_id % 1000 + 2 END AS k,
                CAST(floor(value * 100) AS BIGINT) AS cents
              FROM events),
         d AS (SELECT CASE WHEN o_custkey % 10 < 5 THEN 1
                  ELSE o_custkey % 1000 + 2 END AS k,
                 count(*) AS n_orders,
                 CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                   AS BIGINT) AS price_cents
               FROM orders GROUP BY 1)
         SELECT CAST(e.k % 7 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(e.cents) AS BIGINT) AS cents_sum,
           CAST(sum(d.n_orders) AS BIGINT) AS orders_sum
         FROM e JOIN d ON e.k = d.k
         GROUP BY e.k % 7""",
    // m15: word start offsets are exact prefix sums of len+1; frame =
    // start div 64 on the framed() grid.
    "m15_transcript_align" ->
      """WITH base AS (SELECT doc_id, string_split(text, ' ') AS ws
              FROM documents),
         w AS (SELECT doc_id,
                 unnest(generate_series(1, len(ws))) AS i,
                 unnest(list_transform(generate_series(1, len(ws)),
                   j -> len(ws[j]))) AS wl
               FROM base),
         st AS (SELECT doc_id, i - 1 AS pos,
                 coalesce(sum(wl + 1) OVER (PARTITION BY doc_id
                   ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS strt
               FROM w)
         SELECT doc_id, CAST(strt // 64 AS BIGINT) AS frame,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(min(pos) AS BIGINT) AS first_word_pos
         FROM st GROUP BY doc_id, strt // 64""",
    // q95: row-wise sorted-index Gini at centi fixed point; the Spark
    // side computes the same sum on the tie-collapsed frame, so the
    // hash proves tie-order invariance.
    "q95_gini" ->
      """WITH r AS (SELECT l_returnflag AS flag,
                CAST(floor(l_extendedprice * 100) AS BIGINT) AS x
              FROM lineitem),
         i AS (SELECT flag, x,
                 row_number() OVER (PARTITION BY flag ORDER BY x) AS rn
               FROM r),
         m AS (SELECT flag, count(*) AS n,
                 sum(CAST(rn AS HUGEINT) * x) AS six,
                 sum(CAST(x AS HUGEINT)) AS sx
               FROM i GROUP BY flag)
         SELECT flag, CAST(n AS BIGINT) AS n,
           CAST(2 * six - (n + 1) * sx AS BIGINT) AS gini_num,
           CAST(n * sx AS BIGINT) AS gini_den,
           CAST(CAST(2 * six - (n + 1) * sx AS BIGINT) AS DOUBLE)
             / CAST(CAST(n * sx AS BIGINT) AS DOUBLE) AS gini
         FROM m""",
    // t50: first-owner novelty over the d28 shingle derivation.
    "t50_ngram_novelty" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w
                 FROM documents)),
         f AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s)
         SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0
             END) AS BIGINT) AS n_novel,
           CAST(CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1
               ELSE 0 END) AS BIGINT) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS novelty_rate
         FROM sh JOIN f ON sh.s = f.s
         GROUP BY sh.doc_id""",
    // d34: exact-fingerprint multiplicity, micro-grain floor weight.
    "d34_soft_dedup" ->
      """WITH fp AS (SELECT doc_id, md5(text) AS fp FROM documents),
         c AS (SELECT fp, count(*) AS n_copies FROM fp GROUP BY fp)
         SELECT fp.doc_id, fp.fp, CAST(c.n_copies AS BIGINT) AS n_copies,
           CAST(1000000 // c.n_copies AS BIGINT) AS weight_micro
         FROM fp JOIN c ON fp.fp = c.fp""",
    // c42: merge-over-legacy-manifest final state recomputed from raw
    // events; the inferred shard count is the committed literal.
    "c42_legacy_manifest" ->
      """WITH p AS (SELECT user_id, count(*) AS n_events,
                CAST(sum(CAST(floor(value * 100) AS BIGINT))
                  AS BIGINT) AS val_cents
              FROM events GROUP BY user_id)
         SELECT user_id,
           CAST(CASE WHEN user_id % 9 = 5 THEN n_events + 1000
             ELSE n_events END AS BIGINT) AS n_events,
           val_cents, CAST(8 AS BIGINT) AS nshards_inferred
         FROM p WHERE user_id % 9 <> 4""",
    // q92: Pearson on doubled midranks, centered by the exact mean
    // n+1; moments < 2⁵³ so the BIGINT→DOUBLE casts are exact.
    "q92_spearman" ->
      """WITH base AS (SELECT l_returnflag AS flag, l_quantity AS x,
                l_extendedprice AS y FROM lineitem),
         gx AS (SELECT flag, x, count(*) AS cnt FROM base GROUP BY 1, 2),
         rx AS (SELECT flag, x,
                  2 * sum(cnt) OVER (PARTITION BY flag ORDER BY x
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - cnt + 1 AS rx2
                FROM gx),
         gy AS (SELECT flag, y, count(*) AS cnt FROM base GROUP BY 1, 2),
         ry AS (SELECT flag, y,
                  2 * sum(cnt) OVER (PARTITION BY flag ORDER BY y
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - cnt + 1 AS ry2
                FROM gy),
         nn AS (SELECT flag, count(*) AS n FROM base GROUP BY flag),
         u AS (SELECT b.flag, nn.n,
                 rx.rx2 - nn.n - 1 AS ux, ry.ry2 - nn.n - 1 AS uy
               FROM base b
               JOIN rx ON rx.flag = b.flag AND rx.x = b.x
               JOIN ry ON ry.flag = b.flag AND ry.y = b.y
               JOIN nn ON nn.flag = b.flag),
         m AS (SELECT flag, n, sum(ux * uy) AS suv,
                 sum(ux * ux) AS suu, sum(uy * uy) AS svv
               FROM u GROUP BY flag, n)
         SELECT flag, CAST(n AS BIGINT) AS n,
           CAST(suv AS BIGINT) AS suv, CAST(suu AS BIGINT) AS suu,
           CAST(svv AS BIGINT) AS svv,
           CAST(CAST(suv AS BIGINT) AS DOUBLE) /
             (sqrt(CAST(CAST(suu AS BIGINT) AS DOUBLE)) *
              sqrt(CAST(CAST(svv AS BIGINT) AS DOUBLE))) AS rho
         FROM m""",
    // q93: lag-1 pairs within (type, day) timelines; centi fixed
    // point; moment products routed through BIGINT so the DOUBLE
    // casts are the exact hardware conversion on both engines.
    "q93_autocorr" ->
      """WITH e AS (SELECT event_type, ts, event_id,
                date_trunc('day', ts) AS day,
                CAST(floor(value * 100) AS BIGINT) AS a FROM events),
         p AS (SELECT event_type, a,
                 lead(a) OVER (PARTITION BY event_type, day
                   ORDER BY ts, event_id) AS b
               FROM e),
         m AS (SELECT event_type, count(*) AS n_pairs,
                 sum(a) AS sa, sum(b) AS sb, sum(a * a) AS saa,
                 sum(b * b) AS sbb, sum(a * b) AS sab
               FROM p WHERE b IS NOT NULL GROUP BY event_type)
         SELECT event_type, n_pairs, CAST(sab AS BIGINT) AS sab,
           CAST(CAST(n_pairs * sab - sa * sb AS BIGINT) AS DOUBLE) /
             (sqrt(CAST(CAST(n_pairs * saa - sa * sa AS BIGINT)
                AS DOUBLE)) *
              sqrt(CAST(CAST(n_pairs * sbb - sb * sb AS BIGINT)
                AS DOUBLE))) AS r1
         FROM m""",
    // q94: k = n div 10 trimmed per side, ranks by (value, event_id),
    // survivors summed at exact milli fixed point.
    "q94_trimmed_mean" -> trimmedMeanOracleSql,
    // q101/st69: nested lower medians on tie-collapsed frames — the
    // same shared-definition collapse as q99/st66.
    "q101_mad" -> madOracleSql,
    "st69_stream_mad" -> madOracleSql,
    // q102/st70: discrete-rank quartiles + doubled-value Tukey fences,
    // integers end to end.
    "q102_iqr_outliers" -> iqrOracleSql,
    "st70_stream_iqr" -> iqrOracleSql,
    // q110: Mann-Kendall S and tie-corrected Var*18 as exact
    // integers; z is two correctly-rounded double ops.
    "q110_mann_kendall" -> mannKendallOracleSql,
    // q111: weekday baselines and residuals as single-division
    // doubles; robust flag via the collapsed MAD pick.
    "q111_seasonal_anomaly" -> seasonalOracleSql,
    // st78/st79: the trend family folded over ONE streamed
    // per-(type, day) aggregate state — each shares its batch oracle.
    "st78_stream_mann_kendall" -> mannKendallOracleSql,
    "st79_stream_theil_sen" -> theilSenOracleSql,
    "st80_stream_kendall" -> kendallOracleSql,
    // q112: integer run/sign counts over the per-type day sequence;
    // z composed of correctly-rounded ops only.
    "q112_runs_test" -> runsOracleSql,
    // c47: identical invariants to c34 — the digest doesn't care
    // which container carried the rows, which is the point.
    "c47_jsonl_roundtrip" -> roundtripOracleSql,
    // d38: d06's simhash chain banded wider (6 bands, dist <= 5
    // pigeonhole-exact), exact token-set Jaccard pooled per distance.
    "d38_simhash_fidelity" -> simhashFidelityOracleSql,
    "st81_stream_hodges_lehmann" -> hodgesLehmannOracleSql,
    // c46: tiers keep whole tie-bands of the t55 quantile frame;
    // integer cuts, integer sums.
    "c46_ablation_ladder" -> ablationOracleSql,
    // m16: m04's banded pHash pairs closed transitively by the
    // recursive walk; multi-member clusters only.
    "m16_phash_clusters" -> phashClustersOracleSql,
    // st77: d37's rewrite against the online keeper registry — the
    // min-fold is commutative, so one oracle serves both.
    "st77_stream_block_keepers" -> blockDedupOracleSql,
    // st76: t55's harmonization folded over streamed per-(source,
    // score) counts — one oracle for both.
    "st76_stream_quantiles" -> quantilesOracleSql,
    // d37: block keeper = min packed (doc, idx); kept text
    // fingerprint via ordered string_agg.
    "d37_block_dedup" -> blockDedupOracleSql,
    // t54: exact regexp counts of seeded mojibake (digraphs planted
    // on doc_id % 7, a replacement char on % 11).
    "t54_encoding_audit" -> encodingOracleSql,
    // t55: within-source empirical-CDF rank in ppm over the
    // tie-collapsed score frame — integers end to end.
    "t55_score_quantiles" -> quantilesOracleSql,
    // q108: 3 unrolled integer power iterations — every op an integer
    // join/sum/div, bit-identical in any engine and summation order.
    "q108_pagerank" -> pagerankOracleSql,
    // st75: the same iterations over an ONLINE-maintained edge set —
    // q108's oracle proves streamed graph state ≡ the batch graph.
    "st75_stream_pagerank" -> pagerankOracleSql,
    // q109: lower median of exact-rational Walsh averages over the
    // bounded daily frame; one double division per pair.
    "q109_hodges_lehmann" -> hodgesLehmannOracleSql,
    // c45: deterministic argmax/argmin per stratum via packed
    // (score, doc_id) ordering keys.
    "c45_preference_pairs" -> preferencePairsOracleSql,
    // t52: Cohen's kappa between the Gopher gate (t15's flags) and
    // the t08 repetition gate — exact 2x2 integers, one division.
    "t52_gate_kappa" -> kappaOracleSql,
    // t53/st74: reliability diagram + ECE of the length prior vs the
    // Gopher label; the streaming twin folds the same readout over
    // keyed state, one oracle for both.
    "t53_ece" -> eceOracleSql,
    "st74_stream_ece" -> eceOracleSql,
    // c44: next-fit-decreasing compaction plan over the md5-sharded
    // synthetic file inventory — integers end to end.
    "c44_compaction_plan" -> compactionOracleSql,
    // q103/st73: population stability index — reference-decile bins,
    // add-one smoothing, fixed-point log2 integer numerator; the
    // streaming twin's micro-batch boundary IS the batch query's
    // window split, so one oracle serves both.
    "q103_psi" -> psiOracleSql,
    "st73_stream_psi" -> psiOracleSql,
    // q104/st71: winsorized mean — the oracle keeps the row-wise
    // clamp-at-rank form (like q94's oracle), the engine the collapsed
    // kept-band + edge-pick form; the hash proves equivalence.
    "q104_winsorized_mean" -> winsorOracleSql,
    "st71_stream_winsorized" -> winsorOracleSql,
    // q105/st72: Cramér's V from q96's exact integer χ² micro-sums;
    // the only doubles are one division and one sqrt.
    "q105_cramers_v" -> cramersOracleSql,
    "st72_stream_cramers_v" -> cramersOracleSql,
    "q106_theil_sen" -> theilSenOracleSql,
    "q107_kendall_tau" -> kendallOracleSql,
    "st68_stream_trimmed_mean" -> trimmedMeanOracleSql,
    // st67: q95's sorted-index Gini over event values (milli grain),
    // recomputed row-wise from raw events.
    "st67_stream_gini" ->
      """WITH r AS (SELECT event_type,
                CAST(floor(value * 1000) AS BIGINT) AS x FROM events),
         i AS (SELECT event_type, x,
                 row_number() OVER (PARTITION BY event_type ORDER BY x)
                   AS rn
               FROM r),
         m AS (SELECT event_type, count(*) AS n,
                 sum(CAST(rn AS HUGEINT) * x) AS six,
                 sum(CAST(x AS HUGEINT)) AS sx
               FROM i GROUP BY event_type)
         SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(2 * six - (n + 1) * sx AS BIGINT) AS gini_num,
           CAST(n * sx AS BIGINT) AS gini_den,
           CAST(CAST(2 * six - (n + 1) * sx AS BIGINT) AS DOUBLE)
             / CAST(CAST(n * sx AS BIGINT) AS DOUBLE) AS gini
         FROM m""",
    // c41: t07's md5 split buckets; ±1% relative source-share
    // deviation cross-multiplied in HUGEINT.
    "c41_split_balance" ->
      """WITH b AS (SELECT
                CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                    1, 4))::BIGINT % 100 < 90 THEN 'train'
                  WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                    1, 4))::BIGINT % 100 < 95 THEN 'val'
                  ELSE 'test' END AS split,
                source, len(string_split(text, ' ')) AS toks
              FROM documents),
         g AS (SELECT split, source, count(*) AS n_docs,
                 sum(toks) AS n_tokens
               FROM b GROUP BY split, source),
         sp AS (SELECT split, sum(n_docs) AS n_split FROM g
                GROUP BY split),
         sr AS (SELECT source, sum(n_docs) AS n_src FROM g
                GROUP BY source),
         tt AS (SELECT sum(n_docs) AS n_all FROM g)
         SELECT g.split, g.source, CAST(g.n_docs AS BIGINT) AS n_docs,
           CAST(g.n_tokens AS BIGINT) AS n_tokens,
           CAST(CASE WHEN 100 * abs(g.n_docs * tt.n_all -
               sp.n_split * sr.n_src) > sp.n_split * sr.n_src
             THEN 1 ELSE 0 END AS BIGINT) AS skewed
         FROM g, tt
         JOIN sp ON sp.split = g.split
         JOIN sr ON sr.source = g.source""",
    // m14: per-video argmax of the frame-size-weighted cross-
    // multiplied mean delta; ties to the earliest frame.
    "m14_keyframes" ->
      """WITH base AS (SELECT doc_id, text, length(text) AS n
                       FROM documents WHERE length(text) > 0),
         t AS (SELECT doc_id, (i - 1) // 64 AS f,
                 ascii(substr(text, CAST(i AS INT), 1)) AS v
               FROM (SELECT doc_id, text,
                       unnest(generate_series(1, n)) AS i
                     FROM base)),
         fr AS (SELECT doc_id, f, CAST(sum(v) AS BIGINT) AS e,
                  CAST(count(*) AS BIGINT) AS c
                FROM t GROUP BY doc_id, f),
         d AS (SELECT doc_id, f, e, c,
                 lag(e) OVER (PARTITION BY doc_id ORDER BY f) AS pe,
                 lag(c) OVER (PARTITION BY doc_id ORDER BY f) AS pc
               FROM fr),
         s AS (SELECT doc_id, f, abs(e * pc - pe * c) AS score
               FROM d WHERE pe IS NOT NULL)
         SELECT doc_id AS id, CAST(f AS BIGINT) AS keyframe_idx,
           CAST(score AS BIGINT) AS score
         FROM s
         QUALIFY row_number() OVER (PARTITION BY doc_id
           ORDER BY score DESC, f) = 1""",
    // q89: weekday = epoch-day mod 7 (locale-free both engines);
    // index = one cross-multiplied HUGEINT division in millis.
    "q89_weekday_index" ->
      """WITH e AS (SELECT event_type,
             (epoch_us(ts) // 86400000000) % 7 AS weekday,
             CAST(floor(value * 100) AS BIGINT) AS cents
           FROM events),
         wd AS (SELECT event_type, weekday,
                  CAST(count(*) AS BIGINT) AS n_wd,
                  CAST(sum(cents) AS BIGINT) AS cents_wd
                FROM e GROUP BY 1, 2),
         tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t,
                   CAST(sum(cents) AS BIGINT) AS cents_t
                 FROM e GROUP BY 1)
         SELECT wd.event_type, wd.weekday, wd.n_wd, wd.cents_wd,
           CAST((1000 * wd.cents_wd * tot.n_t)
             // (wd.n_wd * tot.cents_t) AS BIGINT) AS index_milli
         FROM wd JOIN tot ON tot.event_type = wd.event_type""",
    // q88: exact rolling moments over the per-type daily frame; the
    // null slope on a zero denominator (single-observation window of
    // a constant x) matches Spark's when-otherwise null.
    "q88_rolling_slope" ->
      """WITH daily AS (
           SELECT event_type,
             epoch_us(date_trunc('day', ts)) // 86400000000 AS day,
             sum(CAST(floor(value * 100) AS BIGINT)) AS cents
           FROM events GROUP BY 1, 2),
         r AS (SELECT event_type, day, cents,
             count(*) OVER w AS n,
             sum(day) OVER w AS sx, sum(cents) OVER w AS sy,
             sum(day * cents) OVER w AS sxy,
             sum(day * day) OVER w AS sxx
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
         SELECT event_type, day, CAST(cents AS BIGINT) AS cents,
           CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
           CASE WHEN n * sxx - sx * sx <> 0 THEN
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope
         FROM r""",
    // q87: identical n-scaled Wilson expression tree over exact
    // counts; top-20 by (lb DESC, partkey).
    "q87_wilson_rank" ->
      """WITH per AS (
           SELECT l_partkey, count(*) AS n,
             sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS pos
           FROM lineitem GROUP BY l_partkey)
         SELECT l_partkey, CAST(n AS BIGINT) AS n,
           CAST(pos AS BIGINT) AS pos,
           CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS naive_rate,
           (CAST(pos AS DOUBLE) + 1.9208 - 1.96 * sqrt(
              CAST(pos * (n - pos) AS DOUBLE) / CAST(n AS DOUBLE)
                + 0.9604))
             / (CAST(n AS DOUBLE) + 3.8416) AS wilson_lb
         FROM per
         ORDER BY wilson_lb DESC, l_partkey
         LIMIT 20""",
    // q86: q81's midrank machinery at 4 arms; S and Π are plain
    // expressions over pivoted arm columns (no float summation
    // order), decision cross-multiplied in HUGEINT.
    "q86_kruskal_wallis" ->
      """WITH g AS (
           SELECT event_type, value,
             sum(CASE WHEN user_id % 4 = 0 THEN 1 ELSE 0 END) AS c0,
             sum(CASE WHEN user_id % 4 = 1 THEN 1 ELSE 0 END) AS c1,
             sum(CASE WHEN user_id % 4 = 2 THEN 1 ELSE 0 END) AS c2,
             sum(CASE WHEN user_id % 4 = 3 THEN 1 ELSE 0 END) AS c3,
             count(*) AS cnt
           FROM events GROUP BY event_type, value),
         r AS (SELECT *, sum(cnt) OVER (PARTITION BY event_type
                 ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS cum FROM g),
         m AS (SELECT *, 2 * cum - cnt + 1 AS tmid FROM r),
         s AS (SELECT event_type,
                 sum(c0) AS n0, sum(c1) AS n1,
                 sum(c2) AS n2, sum(c3) AS n3,
                 sum(c0 * tmid) AS r2_0, sum(c1 * tmid) AS r2_1,
                 sum(c2 * tmid) AS r2_2, sum(c3 * tmid) AS r2_3,
                 sum(cnt * cnt * cnt - cnt) AS t
               FROM m GROUP BY event_type),
         x AS (SELECT event_type, n0, n1, n2, n3, t,
                 n0 + n1 + n2 + n3 AS nn,
                 n0 * n1 * n2 * n3 AS pi,
                 r2_0 * r2_0 * n1 * n2 * n3
                   + r2_1 * r2_1 * n0 * n2 * n3
                   + r2_2 * r2_2 * n0 * n1 * n3
                   + r2_3 * r2_3 * n0 * n1 * n2 AS s_big
               FROM s),
         y AS (SELECT *,
                 s_big - (nn + 1) * (nn + 1) * nn * pi AS lhs_core,
                 pi * (nn * nn * nn - nn - t) AS denom
               FROM x)
         SELECT event_type,
           CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           CAST(n2 AS BIGINT) AS n2, CAST(n3 AS BIGINT) AS n3,
           CAST(t AS BIGINT) AS tie_cubes,
           CAST(3 * (nn - 1) * lhs_core AS DOUBLE)
             / CAST(denom AS DOUBLE) AS h_prime,
           CAST(CASE WHEN 3000 * (nn - 1) * lhs_core >= 7815 * denom
             THEN 1 ELSE 0 END AS BIGINT) AS significant
         FROM y""",
    // q85: dense per-type day grid; missing days = exact integer
    // linear interpolation (both engines truncate toward zero).
    "q85_interpolate" ->
      """WITH daily AS (
           SELECT event_type, user_id,
             epoch_us(date_trunc('day', ts)) // 86400000000 AS day,
             sum(CAST(floor(value * 100) AS BIGINT)) AS cents
           FROM events WHERE user_id < 40 GROUP BY 1, 2, 3),
         grid AS (
           SELECT event_type, user_id,
             unnest(generate_series(d0 - 2, d1 + 2)) AS day
           FROM (SELECT event_type, user_id,
                   min(day) AS d0, max(day) AS d1
                 FROM daily GROUP BY event_type, user_id)),
         j AS (
           SELECT g.event_type, g.user_id, g.day, d.cents,
             last_value(d.cents IGNORE NULLS) OVER
               (PARTITION BY g.event_type, g.user_id ORDER BY g.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN d.cents IS NOT NULL THEN g.day END
               IGNORE NULLS) OVER
               (PARTITION BY g.event_type, g.user_id ORDER BY g.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             first_value(d.cents IGNORE NULLS) OVER
               (PARTITION BY g.event_type, g.user_id ORDER BY g.day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN d.cents IS NOT NULL THEN g.day END
               IGNORE NULLS) OVER
               (PARTITION BY g.event_type, g.user_id ORDER BY g.day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
           FROM grid g LEFT JOIN daily d
             ON d.event_type = g.event_type AND d.user_id = g.user_id
             AND d.day = g.day)
         SELECT event_type, user_id, day,
           CAST(CASE WHEN cents IS NOT NULL THEN cents
             WHEN pv IS NOT NULL AND nv IS NOT NULL
               THEN pv + (nv - pv) * (day - pd) // (nd - pd)
             ELSE coalesce(pv, nv) END AS BIGINT) AS cents,
           CASE WHEN cents IS NOT NULL THEN 'actual'
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
             ELSE 'edge' END AS src
         FROM j""",
    // q84: one global (score DESC, event_id) rank + running positive
    // count; decile cut and both counters exact integers.
    "q84_gains_table" ->
      """WITH e AS (SELECT event_id, value AS score,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS lbl
           FROM events),
         r AS (SELECT *,
             row_number() OVER (ORDER BY score DESC, event_id) AS rank,
             sum(lbl) OVER (ORDER BY score DESC, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM e),
         t AS (SELECT count(*) AS n, sum(lbl) AS tot FROM e)
         SELECT ((rank - 1) * 10) // t.n AS decile,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(lbl) AS BIGINT) AS n_pos,
           CAST(sum(lbl) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             AS pos_rate,
           CAST(max(cum) AS BIGINT) AS cum_pos,
           CAST(max(cum) AS DOUBLE) / CAST(max(t.tot) AS DOUBLE)
             AS gain
         FROM r, t GROUP BY 1""",
    // q83/st60: one oracle for the closed form and the state fold.
    "q83_floored_balance" -> flooredBalanceOracleSql,
    "st60_stream_floored_balance" -> flooredBalanceOracleSql,
    // q82: per-key count distributions over three join keys; exact
    // nearest-rank p99 (cum >= ceil(.99n) cross-multiplied), ceil-div
    // salt, 4x-mean skew flag — all integers.
    "q82_skew_audit" ->
      """WITH k AS (
           SELECT 'events.user_id' AS rel, user_id AS key,
             count(*) AS cnt FROM events GROUP BY 1, 2
           UNION ALL
           SELECT 'lineitem.l_orderkey', l_orderkey, count(*)
           FROM lineitem GROUP BY 1, 2
           UNION ALL
           SELECT 'orders.o_custkey', o_custkey, count(*)
           FROM orders GROUP BY 1, 2),
         s AS (SELECT rel, count(*) AS n_keys, sum(cnt) AS n_rows,
                 max(cnt) AS max_cnt
               FROM k GROUP BY rel),
         hot AS (SELECT rel, key AS hot_key FROM (
             SELECT rel, key,
               row_number() OVER (PARTITION BY rel
                 ORDER BY cnt DESC, key) AS rn
             FROM k) WHERE rn = 1),
         cf AS (SELECT rel, cnt, count(*) AS freq FROM k
                GROUP BY rel, cnt),
         cum AS (SELECT rel, cnt, sum(freq) OVER (PARTITION BY rel
                   ORDER BY cnt ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS cum FROM cf),
         p99 AS (SELECT c.rel, min(c.cnt) AS p99_cnt
                 FROM cum c JOIN s ON s.rel = c.rel
                 WHERE 100 * c.cum >= 99 * s.n_keys GROUP BY c.rel)
         SELECT s.rel, CAST(n_keys AS BIGINT) AS n_keys,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(max_cnt AS BIGINT) AS max_cnt,
           CAST(hot_key AS BIGINT) AS hot_key,
           CAST(p99_cnt AS BIGINT) AS p99_cnt,
           CAST((max_cnt * n_keys + n_rows - 1) // n_rows AS BIGINT)
             AS salt,
           CAST(CASE WHEN max_cnt * n_keys > 4 * n_rows
             THEN 1 ELSE 0 END AS BIGINT) AS skewed
         FROM s JOIN hot ON hot.rel = s.rel
                JOIN p99 ON p99.rel = s.rel""",
    // s42: the greedy MMR rounds unrolled as CTEs — identical
    // relevance/sim cosines, identical 0.7/0.3 literals, identical
    // (score DESC, nid) argmax per round.
    "s42_mmr_rerank" -> mmrOracleSql,
    // c37: the s42 MMR chain nested as a CTE, then token counts and
    // the windowed 150-token cutoff in pick order.
    "c37_rag_context" ->
      s"""WITH sel AS ($mmrOracleSql),
         tok AS (SELECT doc_id AS nid,
                   CAST(len(string_split(text, ' ')) AS BIGINT)
                     AS n_tokens
                 FROM documents),
         j AS (SELECT s.qid, s.pick, s.nid, t.n_tokens,
                 sum(t.n_tokens) OVER (PARTITION BY s.qid
                   ORDER BY s.pick ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS cum_tokens
               FROM sel s JOIN tok t ON t.nid = s.nid)
         SELECT qid, pick, nid AS doc_id, n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
         FROM j WHERE cum_tokens <= 150""",
    // s45: three exact-int rankings, integer overlap sums, one
    // division per metric pair.
    "s45_metric_agreement" ->
      s"""WITH pre AS ($embPreSql),
         sc AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
             (SELECT sum(x*y) FROM (SELECT unnest(q.v) x, unnest(c.v) y))
               AS dot,
             (SELECT sum((x-y)*(x-y))
                FROM (SELECT unnest(q.v) x, unnest(c.v) y)) AS d2,
             q.n2 AS qn2, c.n2 AS cn2
           FROM pre q JOIN pre c ON c.vec_id <> q.vec_id
           WHERE q.vec_id < 10),
         cosr AS (SELECT qid, nid FROM (
             SELECT qid, nid, row_number() OVER (PARTITION BY qid
               ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(qn2 AS DOUBLE))
                 * sqrt(CAST(cn2 AS DOUBLE))) DESC, nid) AS r
             FROM sc) WHERE r <= 10),
         dotr AS (SELECT qid, nid FROM (
             SELECT qid, nid, row_number() OVER (PARTITION BY qid
               ORDER BY dot DESC, nid) AS r FROM sc) WHERE r <= 10),
         l2r AS (SELECT qid, nid FROM (
             SELECT qid, nid, row_number() OVER (PARTITION BY qid
               ORDER BY d2, nid) AS r FROM sc) WHERE r <= 10),
         nq AS (SELECT count(*) AS n FROM pre WHERE vec_id < 10)
         SELECT 'cos_vs_dot' AS metric_pair,
           CAST(nq.n AS BIGINT) AS n_queries, CAST(10 AS BIGINT) AS k,
           CAST((SELECT count(*) FROM cosr a JOIN dotr b
             ON b.qid = a.qid AND b.nid = a.nid) AS BIGINT)
             AS overlap_sum,
           CAST((SELECT count(*) FROM cosr a JOIN dotr b
             ON b.qid = a.qid AND b.nid = a.nid) AS DOUBLE)
             / CAST(nq.n * 10 AS DOUBLE) AS mean_overlap
         FROM nq
         UNION ALL
         SELECT 'cos_vs_l2', CAST(nq.n AS BIGINT), CAST(10 AS BIGINT),
           CAST((SELECT count(*) FROM cosr a JOIN l2r b
             ON b.qid = a.qid AND b.nid = a.nid) AS BIGINT),
           CAST((SELECT count(*) FROM cosr a JOIN l2r b
             ON b.qid = a.qid AND b.nid = a.nid) AS DOUBLE)
             / CAST(nq.n * 10 AS DOUBLE)
         FROM nq
         UNION ALL
         SELECT 'dot_vs_l2', CAST(nq.n AS BIGINT), CAST(10 AS BIGINT),
           CAST((SELECT count(*) FROM dotr a JOIN l2r b
             ON b.qid = a.qid AND b.nid = a.nid) AS BIGINT),
           CAST((SELECT count(*) FROM dotr a JOIN l2r b
             ON b.qid = a.qid AND b.nid = a.nid) AS DOUBLE)
             / CAST(nq.n * 10 AS DOUBLE)
         FROM nq""",
    // s44: t22's BM25 list (nested verbatim) fused with the exact
    // cosine top-10 of each query's paired embedding; RRF score is
    // the same two-term double sum on both engines.
    "s44_rrf_fusion" ->
      s"""WITH bm AS ($bm25OracleSql),
         lex AS (SELECT qid, doc_id, rank AS ra FROM bm),
         pre AS ($embPreSql),
         sem0 AS (SELECT qv, nid, rank FROM (
             SELECT q.vec_id AS qv, c.vec_id AS nid,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 CAST((SELECT sum(x*y) FROM (SELECT unnest(q.v) x, unnest(c.v) y)) AS DOUBLE)
                   / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) DESC,
                 c.vec_id) AS rank
             FROM pre q JOIN pre c ON c.vec_id <> q.vec_id
             WHERE q.vec_id IN (1, 2, 3)) WHERE rank <= 10),
         qmap(qid, qv) AS (VALUES ('b1', 1), ('b2', 2), ('b3', 3)),
         sem AS (SELECT m.qid, s.nid AS doc_id, s.rank AS rb
                 FROM sem0 s JOIN qmap m ON m.qv = s.qv),
         u AS (SELECT coalesce(l.qid, s.qid) AS qid,
                 coalesce(l.doc_id, s.doc_id) AS doc_id, l.ra, s.rb
               FROM lex l FULL OUTER JOIN sem s
                 ON l.qid = s.qid AND l.doc_id = s.doc_id),
         sc AS (SELECT qid, doc_id,
                 CAST(coalesce(ra, 0) AS BIGINT) AS ra,
                 CAST(coalesce(rb, 0) AS BIGINT) AS rb,
                 coalesce(CAST(1 AS DOUBLE) / CAST(60 + ra AS DOUBLE),
                     CAST(0 AS DOUBLE))
                   + coalesce(CAST(1 AS DOUBLE) / CAST(60 + rb AS DOUBLE),
                     CAST(0 AS DOUBLE)) AS score
               FROM u)
         SELECT qid, doc_id, ra, rb, score,
           CAST(fr AS BIGINT) AS fused_rank
         FROM (SELECT *, row_number() OVER (PARTITION BY qid
                 ORDER BY score DESC, doc_id) AS fr FROM sc)
         WHERE fr <= 5""",
    // s43: identical md5 sign planes, one 32-dim projection, each
    // rung reads its j < m prefix; all coordinates exact int64.
    "s43_jl_recall" -> jlRecallOracleSql,
    // st18 maintains the SAME sketch online (first-seen word / hash
    // folds + an O(k) minima array) — one oracle for both.
    "st18_stream_kmv" -> kmvOracleSql,
    // Bipartite d02 bands (train×bench collisions only) + d11's exact
    // Jaccard verify + a per-train-doc left-join rollup.
    "d20_fuzzy_decontam" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         h AS (SELECT doc_id, ('0x' || substr(md5(s),1,8))::BIGINT AS hw FROM sh),
         mh AS (SELECT doc_id, j, min(((2*j+1)*hw + j*12345) % 4294967311) AS mv
                FROM h, generate_series(0,15) t(j) GROUP BY doc_id, j),
         bands AS (SELECT doc_id, j//4 AS band,
                     string_agg(mv, ',' ORDER BY j) AS sig
                   FROM mh GROUP BY doc_id, j//4),
         lbl AS (SELECT doc_id, source = 'src0' AS is_bench FROM documents),
         cand AS (SELECT DISTINCT a.doc_id AS tid, b.doc_id AS bid
                  FROM bands a
                  JOIN lbl la ON la.doc_id = a.doc_id AND NOT la.is_bench
                  JOIN bands b ON a.band = b.band AND a.sig = b.sig
                  JOIN lbl lb ON lb.doc_id = b.doc_id AND lb.is_bench),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT c.tid, c.bid, count(*) AS c
                   FROM cand c
                   JOIN sh x ON x.doc_id = c.tid
                   JOIN sh y ON y.doc_id = c.bid AND y.s = x.s
                   GROUP BY c.tid, c.bid),
         ver AS (SELECT c.tid,
                   CAST(coalesce(i.c, 0) AS DOUBLE)
                     / (sa.n + sb.n - coalesce(i.c, 0)) AS j
                 FROM cand c
                 LEFT JOIN inter i ON i.tid = c.tid AND i.bid = c.bid
                 JOIN sizes sa ON sa.doc_id = c.tid
                 JOIN sizes sb ON sb.doc_id = c.bid),
         agg AS (SELECT tid, CAST(count(*) AS BIGINT) AS n_matches,
                   max(j) AS max_jaccard
                 FROM ver WHERE j >= 0.5 GROUP BY tid)
         SELECT d.doc_id,
           coalesce(a.n_matches, 0) AS n_matches,
           a.max_jaccard,
           coalesce(a.n_matches, 0) > 0 AS fuzzy_contaminated
         FROM (SELECT DISTINCT s.doc_id FROM sh s
               JOIN lbl l ON l.doc_id = s.doc_id AND NOT l.is_bench) d
         LEFT JOIN agg a ON a.tid = d.doc_id""",
    // d23: d20's bipartite band collisions with the arrivals/base
    // carving where its train/bench labels were — the stored index
    // holds exactly the base side's bands, so probing it equals this
    // from-scratch bipartite banding.
    "d23_incremental_neardup" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         h AS (SELECT doc_id, ('0x' || substr(md5(s),1,8))::BIGINT AS hw FROM sh),
         mh AS (SELECT doc_id, j, min(((2*j+1)*hw + j*12345) % 4294967311) AS mv
                FROM h, generate_series(0,15) t(j) GROUP BY doc_id, j),
         bands AS (SELECT doc_id, j//4 AS band,
                     string_agg(mv, ',' ORDER BY j) AS sig
                   FROM mh GROUP BY doc_id, j//4),
         cand AS (SELECT DISTINCT a.doc_id AS aid, b.doc_id AS bid
                  FROM bands a
                  JOIN bands b ON a.band = b.band AND a.sig = b.sig
                  WHERE a.doc_id % 10 = 7 AND b.doc_id % 10 <> 7),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT c.aid, c.bid, count(*) AS c
                   FROM cand c
                   JOIN sh x ON x.doc_id = c.aid
                   JOIN sh y ON y.doc_id = c.bid AND y.s = x.s
                   GROUP BY c.aid, c.bid),
         ver AS (SELECT c.aid,
                   CAST(coalesce(i.c, 0) AS DOUBLE)
                     / (sa.n + sb.n - coalesce(i.c, 0)) AS j
                 FROM cand c
                 LEFT JOIN inter i ON i.aid = c.aid AND i.bid = c.bid
                 JOIN sizes sa ON sa.doc_id = c.aid
                 JOIN sizes sb ON sb.doc_id = c.bid),
         agg AS (SELECT aid, CAST(count(*) AS BIGINT) AS n_matches,
                   max(j) AS max_jaccard
                 FROM ver WHERE j >= 0.5 GROUP BY aid)
         SELECT d.doc_id,
           coalesce(a.n_matches, 0) AS n_matches,
           a.max_jaccard,
           coalesce(a.n_matches, 0) > 0 AS is_dup
         FROM (SELECT DISTINCT doc_id FROM sh WHERE doc_id % 10 = 7) d
         LEFT JOIN agg a ON a.aid = d.doc_id""",
    // d24: fixed 10-word segments; a segment appearing in >= 2 distinct
    // docs is boilerplate, excised everywhere; survivors reassemble in
    // seg_id order (string_agg skips the removed-NULL arm).
    "d24_boilerplate" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM documents),
         t AS (SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos,
                 unnest(toks) AS w
               FROM w),
         seg AS (SELECT doc_id, pos // 10 AS seg_id,
                   string_agg(w, ' ' ORDER BY pos) AS seg
                 FROM t GROUP BY doc_id, pos // 10),
         dfq AS (SELECT seg, count(DISTINCT doc_id) AS docfreq
                 FROM seg GROUP BY seg)
         SELECT s.doc_id, count(*) AS n_segs,
           count(CASE WHEN d.docfreq >= 2 THEN 1 END) AS n_removed,
           coalesce(string_agg(CASE WHEN d.docfreq < 2 THEN s.seg END,
             ' ' ORDER BY s.seg_id), '') AS clean_text
         FROM seg s JOIN dfq d ON d.seg = s.seg
         GROUP BY s.doc_id""",
    // c10: docs ordered (n_chars, doc_id); phase = starting token
    // offset // ceil(total/4) — integer end-to-end.
    "c10_curriculum" ->
      """WITH d AS (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             n_chars
           FROM documents),
         w AS (SELECT doc_id, n_tokens,
             CAST(row_number() OVER (ORDER BY n_chars, doc_id)
               AS BIGINT) AS seq,
             CAST(sum(n_tokens) OVER (ORDER BY n_chars, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
           FROM d),
         t AS (SELECT (CAST(sum(n_tokens) AS BIGINT) + 3) // 4 AS budget
               FROM d)
         SELECT doc_id, seq, n_tokens, (cum - n_tokens) // budget AS phase
         FROM w, t""",
    // s30: integer fixed-point PageRank over the exact kNN graph.
    "s30_graph_pagerank" -> pageRankOracleSql,
    // s29: rank of the first same-label item under (cos desc, id asc)
    // via a full window rank; rr = exact 1/rank.
    "s29_retrieval_mrr" ->
      s"""WITH pre AS ($embPreSql),
         lab AS (SELECT vec_id, CAST(label AS BIGINT) AS lbl
                 FROM embeddings),
         s AS (SELECT q.vec_id AS qid, ql.lbl AS qlbl, c.vec_id AS nid,
                 cl.lbl AS nlbl,
                 CAST((SELECT sum(x*y)
                       FROM (SELECT unnest(q.v) x, unnest(c.v) y)) AS DOUBLE)
                   / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE)))
                   AS cos
               FROM pre q
               JOIN lab ql ON ql.vec_id = q.vec_id
               JOIN pre c ON c.vec_id <> q.vec_id
               JOIN lab cl ON cl.vec_id = c.vec_id
               WHERE q.vec_id < 50),
         r AS (SELECT qid, qlbl, nlbl,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY cos DESC, nid) AS rk
               FROM s)
         SELECT qid AS vec_id, qlbl AS label,
           CAST(min(CASE WHEN nlbl = qlbl THEN rk END) AS BIGINT)
             AS first_rel_rank,
           1.0 / min(CASE WHEN nlbl = qlbl THEN rk END) AS rr
         FROM r GROUP BY qid, qlbl""",
    // c11: QI equivalence classes (source, n_chars div 200) rolled up
    // per language; risky = class size < 3.
    "c11_kanon_report" ->
      """WITH c AS (SELECT lang, source, n_chars // 200 AS b,
             CAST(count(*) AS BIGINT) AS sz
           FROM documents GROUP BY 1, 2, 3)
         SELECT lang AS unit, CAST(sum(sz) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(sz) AS BIGINT) AS min_k,
           CAST(count(CASE WHEN sz < 3 THEN 1 END) AS BIGINT)
             AS risky_classes,
           CAST(coalesce(sum(CASE WHEN sz < 3 THEN sz END), 0) AS BIGINT)
             AS risky_rows
         FROM c GROUP BY lang""",
    // c13: the partitioned-lake serving aggregate over the raw fixture
    // — layout must never change answers.
    "c13_partitioned_lake" -> lakeServeOracleSql,
    // st37: the SAME serving aggregate over the stream-ingested lake —
    // the streaming landing path must produce identical layout+content.
    "st37_stream_lake_ingest" -> lakeServeOracleSql,
    // c14: the RTBF audit — before/after/erased per artifact, shards
    // touched = distinct shard of erased keys, residual pinned 0.
    "c14_forget_user" ->
      """WITH er AS (SELECT DISTINCT user_id FROM events
                     WHERE user_id % 7 = 3),
         sh AS (SELECT CAST(count(DISTINCT user_id % 8) AS BIGINT) AS s
                FROM er),
         e AS (SELECT CAST(count(*) AS BIGINT) AS b FROM events),
         ea AS (SELECT CAST(count(*) AS BIGINT) AS a FROM events
                WHERE user_id % 7 <> 3),
         p AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS b
               FROM events),
         pa AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS a
                FROM events WHERE user_id % 7 <> 3)
         SELECT 'events' AS artifact, e.b AS rows_before,
           ea.a AS rows_after, e.b - ea.a AS rows_erased,
           sh.s AS shards_rewritten, CAST(0 AS BIGINT) AS residual
         FROM e, ea, sh
         UNION ALL
         SELECT 'user_profile', p.b, pa.a, p.b - pa.a, sh.s,
           CAST(0 AS BIGINT)
         FROM p, pa, sh""",
    // c15: compaction is pure layout — both phases must equal the
    // fixture's row count and order-independent content digest.
    "c15_compact_lake" ->
      """WITH s AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS chars,
             bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS digest
           FROM documents)
         SELECT 'before' AS phase, n_docs, chars, digest FROM s
         UNION ALL
         SELECT 'after', n_docs, chars, digest FROM s""",
    // c16: apply 1 lands everything, apply 2 lands nothing — the
    // oracle-checkable definition of idempotent ingest.
    "c16_idempotent_ingest" ->
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS c
                    FROM documents WHERE doc_id % 4 = 1)
         SELECT CAST(1 AS BIGINT) AS apply_no, c AS n_arrivals,
           c AS n_new, c AS n_total FROM n
         UNION ALL
         SELECT CAST(2 AS BIGINT), c, CAST(0 AS BIGINT), c FROM n""",
    // c17: surviving content after the directory-level sweep + the
    // sweep's shape (30 daily partitions, 14 expired before the 15th).
    "c17_retention_sweep" ->
      """SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(event_id) AS BIGINT) AS id_sum,
           strftime(min(CAST(ts AS DATE)), '%Y-%m-%d') AS first_date,
           (SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT)
            FROM events) AS parts_before,
           (SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT)
            FROM events
            WHERE CAST(ts AS DATE) < DATE '2024-01-15') AS parts_dropped
         FROM events
         WHERE CAST(ts AS DATE) >= DATE '2024-01-15'
         GROUP BY event_type""",
    // c18: clustering is pure layout — the point-user aggregate over
    // the raw fixture must match the clustered lake's.
    "c18_clustered_lake" ->
      """SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(event_id) AS BIGINT) AS id_sum,
           epoch_us(min(ts)) AS first_us,
           epoch_us(max(ts)) AS last_us
         FROM events WHERE user_id = 7
         GROUP BY event_type""",
    // c26: z-ordering is pure layout — both serving slices over the
    // raw fixture must match the z-ordered lake's.
    "c26_zorder_lake" ->
      """SELECT 'user_7' AS slice, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(event_id) AS BIGINT) AS id_sum
         FROM events WHERE user_id = 7 GROUP BY event_type
         UNION ALL
         SELECT 'day_2024-01-20', event_type,
           CAST(count(*) AS BIGINT), CAST(sum(event_id) AS BIGINT)
         FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-20'
         GROUP BY event_type""",
    // c27: branch states derived relationally (branches only touch
    // base keys, so the full-outer merge reduces to left joins);
    // identical null-safe three-way CASE, ours-wins, c07-style digest.
    "c27_branch_merge" ->
      """WITH d AS (SELECT doc_id AS k, text FROM documents),
         a AS (SELECT k, CASE WHEN k % 7 = 1 THEN 'A:' || text
                              ELSE text END AS v
               FROM d WHERE NOT (k % 13 = 2 AND k % 7 <> 1)),
         b AS (SELECT k, CASE WHEN k % 7 = 3 THEN 'B:' || text
                              WHEN k % 7 = 1 AND k % 5 = 0
                                THEN 'B2:' || text
                              ELSE text END AS v
               FROM d WHERE NOT (k % 11 = 5 AND k % 7 <> 3
                 AND NOT (k % 7 = 1 AND k % 5 = 0))),
         j AS (SELECT d.k, d.text AS vb, a.v AS va, b.v AS vv
               FROM d LEFT JOIN a ON a.k = d.k LEFT JOIN b ON b.k = d.k),
         m AS (SELECT k, vb, va, vv,
                 (va IS DISTINCT FROM vb) AS ca,
                 (vv IS DISTINCT FROM vb) AS cb,
                 ((va IS DISTINCT FROM vb) AND (vv IS DISTINCT FROM vb)
                   AND (va IS DISTINCT FROM vv)) AS conflict,
                 CASE WHEN va IS NOT DISTINCT FROM vb
                       AND vv IS NOT DISTINCT FROM vb THEN vb
                      WHEN va IS DISTINCT FROM vb
                       AND vv IS NOT DISTINCT FROM vb THEN va
                      WHEN vv IS DISTINCT FROM vb
                       AND va IS NOT DISTINCT FROM vb THEN vv
                      ELSE va END AS merged
               FROM j)
         SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN merged IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_merged,
           CAST(sum(CASE WHEN ca THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed_a,
           CAST(sum(CASE WHEN cb THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed_b,
           CAST(sum(CASE WHEN conflict THEN 1 ELSE 0 END) AS BIGINT)
             AS n_conflicts,
           CAST(bit_xor(CASE WHEN merged IS NOT NULL THEN
             ('0x' || substr(md5(CAST(k AS VARCHAR) || ':' || merged),
               1, 15))::BIGINT ELSE 0 END) AS BIGINT) AS digest
         FROM m""",
    // q43: identical SQL text both engines; the fixture set is
    // null-free so the result is the witnessed complement (the
    // any-NULL -> empty arm is spec-forced).
    "q43_not_in_null_aware" ->
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust
         FROM customer
         WHERE c_nationkey NOT IN
           (SELECT s_nationkey FROM supplier WHERE s_nationkey < 10)
         GROUP BY c_nationkey""",
    // q42: the correlated form decorrelates to the same aggregate —
    // DuckDB runs the identical SQL text.
    "q42_correlated_subquery" ->
      """SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_small,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
         FROM lineitem l1
         WHERE 5 * CAST(l_quantity AS BIGINT)
               * (SELECT count(*) FROM lineitem l2
                  WHERE l2.l_partkey = l1.l_partkey)
             < (SELECT sum(CAST(l_quantity AS BIGINT)) FROM lineitem l2
                WHERE l2.l_partkey = l1.l_partkey)
         GROUP BY l_partkey""",
    // d26: identical chunking replicated — low-md5-byte boundaries,
    // running-sum chunk ids, scalar (doc, idx) ordinal ownership.
    "d26_cdc_chunks" ->
      """WITH words AS (
           SELECT doc_id, u.pos AS pos, u.w AS w FROM (
             SELECT doc_id, unnest(list_transform(generate_series(1, len(ws)),
               i -> struct_pack(pos := i, w := ws[i]))) AS u
             FROM (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM documents))
           WHERE u.w <> ''),
         idx AS (
           SELECT doc_id, pos, w,
             COALESCE(SUM(CASE WHEN CAST('0x' || substr(md5(w),1,2) AS BIGINT)
                               % 8 = 0 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS chunk_idx
           FROM words),
         chunks AS (
           SELECT doc_id, chunk_idx,
                  md5(string_agg(w, ' ' ORDER BY pos)) AS fp
           FROM idx GROUP BY doc_id, chunk_idx),
         owned AS (
           SELECT doc_id, chunk_idx,
             min(doc_id * 1000000 + chunk_idx) OVER (PARTITION BY fp) AS own
           FROM chunks)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN own < doc_id * 1000000 + chunk_idx
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
         FROM owned GROUP BY doc_id""",
    // t33: cross-multiplied integer Flesch — no division anywhere,
    // so both engines grade identically.
    "t33_readability" ->
      """WITH c AS (SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
               AS n_words,
             CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT)
               AS n_syllables
           FROM documents),
         s AS (SELECT *, GREATEST(1, (n_words + 19) // 20) AS n_sentences
               FROM c)
         SELECT doc_id, n_words, n_syllables, n_sentences,
           CASE WHEN 206835*n_sentences*n_words - 1015*n_words*n_words
                     - 84600*n_sentences*n_syllables
                     >= 70000*n_sentences*n_words THEN 'easy'
                WHEN 206835*n_sentences*n_words - 1015*n_words*n_words
                     - 84600*n_sentences*n_syllables
                     >= 50000*n_sentences*n_words THEN 'standard'
                ELSE 'hard' END AS grade
         FROM s""",
    // c19: merge ≡ recompute — post-cutoff-active users carry
    // full-range totals (erasure-requested ones deleted), everyone
    // else keeps the pre-cutoff snapshot row.
    "c19_lake_merge" ->
      """WITH pre AS (SELECT user_id, count(*) AS n_events,
                sum(CAST(value AS DECIMAL(12,2))) AS vs
              FROM events WHERE ts < TIMESTAMP '2024-01-16'
              GROUP BY user_id),
         tot AS (SELECT user_id, count(*) AS n_events,
                sum(CAST(value AS DECIMAL(12,2))) AS vs
              FROM events GROUP BY user_id),
         post AS (SELECT DISTINCT user_id FROM events
              WHERE ts >= TIMESTAMP '2024-01-16')
         SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
                CAST(vs AS DOUBLE) AS val_sum
         FROM (SELECT p.* FROM pre p
                 WHERE p.user_id NOT IN (SELECT user_id FROM post)
               UNION ALL
               SELECT t.* FROM tot t
                 JOIN post po ON t.user_id = po.user_id
                 WHERE t.user_id % 7 <> 3)""",
    // c24: each edge recomputed as two NOT-IN/anti counts.
    "c24_ref_integrity" ->
      """SELECT 'orders.o_custkey->customer' AS fk_edge,
           CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_child_rows,
           CAST((SELECT count(*) FROM orders o WHERE NOT EXISTS
             (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
             AS BIGINT) AS n_orphans,
           CAST((SELECT count(*) FROM customer c WHERE NOT EXISTS
             (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))
             AS BIGINT) AS n_unreferenced
         UNION ALL
         SELECT 'lineitem.l_orderkey->orders',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l WHERE NOT EXISTS
             (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
             AS BIGINT),
           CAST((SELECT count(*) FROM orders o WHERE NOT EXISTS
             (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey))
             AS BIGINT)
         UNION ALL
         SELECT 'lineitem.l_partkey->part',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l WHERE NOT EXISTS
             (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
             AS BIGINT),
           CAST((SELECT count(*) FROM part p WHERE NOT EXISTS
             (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey))
             AS BIGINT)
         UNION ALL
         SELECT 'lineitem.l_suppkey->supplier',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l WHERE NOT EXISTS
             (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
             AS BIGINT),
           CAST((SELECT count(*) FROM supplier s WHERE NOT EXISTS
             (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey))
             AS BIGINT)""",
    // c23: m08's triage + the m01 stub-dimension formula rolled into
    // the per-source ingest card.
    "c23_media_card" ->
      """WITH d AS (SELECT doc_id, source, text,
               length(text) AS dl, md5(text) AS dm FROM documents),
         p AS (SELECT doc_id, source, dl, dm,
               CASE WHEN doc_id % 13 = 4 THEN substr(text, 1, dl // 2)
                    WHEN doc_id % 17 = 5
                      THEN 'X' || substr(text, 2, dl)
                    ELSE text END AS payload
               FROM d),
         s AS (SELECT source, length(payload) AS al,
               CASE WHEN length(payload) < dl THEN 'truncated'
                    WHEN md5(payload) <> dm THEN 'corrupted'
                    ELSE 'ok' END AS status
               FROM p)
         SELECT source, CAST(count(*) AS BIGINT) AS n_blobs,
           CAST(sum(CASE WHEN status = 'ok' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ok,
           CAST(sum(CASE WHEN status = 'truncated' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_truncated,
           CAST(sum(CASE WHEN status = 'corrupted' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_corrupted,
           CAST(sum(CASE WHEN status = 'ok' THEN al ELSE 0 END) AS BIGINT)
             AS ok_chars,
           CAST(sum(CASE WHEN status = 'ok'
                    THEN (al % 640) * (al % 480) ELSE 0 END) AS BIGINT)
             AS ok_stub_px
         FROM s GROUP BY source""",
    // m08: the same synthesized damage replayed — truncation takes
    // precedence over checksum, as in the engine's when-chain.
    "m08_media_integrity" ->
      """WITH d AS (SELECT doc_id, source, text,
               length(text) AS dl, md5(text) AS dm FROM documents),
         p AS (SELECT doc_id, source, dl, dm,
               CASE WHEN doc_id % 13 = 4 THEN substr(text, 1, dl // 2)
                    WHEN doc_id % 17 = 5
                      THEN 'X' || substr(text, 2, dl)
                    ELSE text END AS payload
               FROM d),
         s AS (SELECT source,
               CASE WHEN length(payload) < dl THEN 'truncated'
                    WHEN md5(payload) <> dm THEN 'corrupted'
                    ELSE 'ok' END AS status,
               dl - length(payload) AS lost
               FROM p)
         SELECT source, status, CAST(count(*) AS BIGINT) AS n_blobs,
                CAST(sum(lost) AS BIGINT) AS chars_lost
         FROM s GROUP BY source, status""",
    // c22: each rule recomputed as a filtered count; pass = 0.
    "c22_expectations" ->
      """SELECT 'price_le_400k' AS rule,
           CAST(count(*) FILTER (o_totalprice > 400000.0) AS BIGINT)
             AS violations,
           count(*) FILTER (o_totalprice > 400000.0) = 0 AS pass
         FROM orders
         UNION ALL
         SELECT 'status_known',
           CAST(count(*) FILTER (o_orderstatus NOT IN ('O','F')) AS BIGINT),
           count(*) FILTER (o_orderstatus NOT IN ('O','F')) = 0
         FROM orders
         UNION ALL
         SELECT 'date_before_2000',
           CAST(count(*) FILTER (o_orderdate >= TIMESTAMP '2000-01-01')
                AS BIGINT),
           count(*) FILTER (o_orderdate >= TIMESTAMP '2000-01-01') = 0
         FROM orders
         UNION ALL
         SELECT 'custkey_not_null',
           CAST(count(*) FILTER (o_custkey IS NULL) AS BIGINT),
           count(*) FILTER (o_custkey IS NULL) = 0
         FROM orders
         UNION ALL
         SELECT 'orderkey_unique',
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
           count(*) = count(DISTINCT o_orderkey)
         FROM orders""",
    // c21: vacuum never changes the surviving snapshot — c19's oracle.
    "c21_lake_vacuum" ->
      """WITH pre AS (SELECT user_id, count(*) AS n_events,
                sum(CAST(value AS DECIMAL(12,2))) AS vs
              FROM events WHERE ts < TIMESTAMP '2024-01-16'
              GROUP BY user_id),
         tot AS (SELECT user_id, count(*) AS n_events,
                sum(CAST(value AS DECIMAL(12,2))) AS vs
              FROM events GROUP BY user_id),
         post AS (SELECT DISTINCT user_id FROM events
              WHERE ts >= TIMESTAMP '2024-01-16')
         SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
                CAST(vs AS DOUBLE) AS val_sum
         FROM (SELECT p.* FROM pre p
                 WHERE p.user_id NOT IN (SELECT user_id FROM post)
               UNION ALL
               SELECT t.* FROM tot t
                 JOIN post po ON t.user_id = po.user_id
                 WHERE t.user_id % 7 <> 3)""",
    // c20: time travel — v1 read back AFTER v2 committed must equal
    // the pre-cutoff recompute.
    "c20_time_travel" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS val_sum
         FROM events WHERE ts < TIMESTAMP '2024-01-16'
         GROUP BY user_id""",
    // q44: last_value IGNORE NULLS — the fill value is one row's
    // untouched parquet double, bit-exact cross-engine.
    "q44_forward_fill" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value
         FROM events WHERE user_id % 5 = 2""",
    // st38: q44's fill maintained online — shared oracle; the state
    // update precedes the emit, matching the CURRENT ROW bound.
    "st38_stream_forward_fill" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value
         FROM events WHERE user_id % 5 = 2""",
    // q45: sweep-line peak concurrency — same +1/-1 boundary-point
    // construction (midnight-crossing intervals clipped per day),
    // all-integer us math; -1 sorts before +1 at a tie instant
    // (half-open intervals).
    "q45_peak_concurrency" ->
      """WITH iv AS (SELECT epoch_us(ts) AS s,
                            epoch_us(ts) + 1800000000 AS e FROM events),
         points AS (
           SELECT s // 86400000000 AS day, s AS t, 1 AS delta FROM iv
           UNION ALL
           SELECT s // 86400000000,
                  LEAST(e, (s // 86400000000 + 1) * 86400000000), -1 FROM iv
           UNION ALL
           SELECT e // 86400000000, (e // 86400000000) * 86400000000, 1
             FROM iv
             WHERE e // 86400000000 > s // 86400000000
               AND e % 86400000000 > 0
           UNION ALL
           SELECT e // 86400000000, e, -1 FROM iv
             WHERE e // 86400000000 > s // 86400000000
               AND e % 86400000000 > 0)
         SELECT strftime(DATE '1970-01-01' + CAST(day AS INTEGER),
                         '%Y-%m-%d') AS day,
                CAST(max(run) AS BIGINT) AS peak_concurrent
         FROM (SELECT day, sum(delta) OVER (PARTITION BY day
                 ORDER BY t, delta ROWS UNBOUNDED PRECEDING) AS run
               FROM points)
         GROUP BY day""",
    // q48/st40: the fixed-point recurrence as a recursive CTE — both
    // engines floor non-negative division (>> 3 vs // 8), so the fold
    // is bit-identical.
    "q48_ewma" ->
      """WITH RECURSIVE daily AS (
           SELECT user_id, epoch_us(ts) // 86400000000 AS d, count(*) AS x
           FROM events GROUP BY 1, 2),
         b AS (SELECT user_id, x,
                 row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
               FROM daily),
         ew AS (
           SELECT user_id, rn, x * 64 AS s FROM b WHERE rn = 1
           UNION ALL
           SELECT b2.user_id, b2.rn, (b2.x * 64 + 7 * ew.s) // 8
           FROM b b2 JOIN ew ON b2.user_id = ew.user_id
                            AND b2.rn = ew.rn + 1)
         SELECT user_id, CAST(max(rn) AS BIGINT) AS n_days,
                CAST(arg_max(s, rn) AS BIGINT) AS ewma_x64
         FROM ew GROUP BY user_id""",
    "st40_stream_ewma" ->
      """WITH RECURSIVE daily AS (
           SELECT user_id, epoch_us(ts) // 86400000000 AS d, count(*) AS x
           FROM events GROUP BY 1, 2),
         b AS (SELECT user_id, x,
                 row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
               FROM daily),
         ew AS (
           SELECT user_id, rn, x * 64 AS s FROM b WHERE rn = 1
           UNION ALL
           SELECT b2.user_id, b2.rn, (b2.x * 64 + 7 * ew.s) // 8
           FROM b b2 JOIN ew ON b2.user_id = ew.user_id
                            AND b2.rn = ew.rn + 1)
         SELECT user_id, CAST(max(rn) AS BIGINT) AS n_days,
                CAST(arg_max(s, rn) AS BIGINT) AS ewma_x64
         FROM ew GROUP BY user_id""",
    // q55: the same lossless grid construction — 3x3 neighbor
    // explosion, home-cell equi-join, exact integer verify.
    "q55_spatial_join" ->
      """WITH pts AS (SELECT event_id,
               CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
                    AS BIGINT) % 100000 AS x,
               CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 9, 8)
                    AS BIGINT) % 100000 AS y
             FROM events),
         c AS (SELECT event_id, x, y, x // 1000 AS cx, y // 1000 AS cy
               FROM pts),
         probe AS (SELECT event_id AS a_id, x AS ax, y AS ay,
                 cx + dx.g AS cx, cy + dy.g AS cy
               FROM c, generate_series(-1, 1) dx(g),
                    generate_series(-1, 1) dy(g)),
         pairs AS (SELECT (p.ax - b.x) * (p.ax - b.x)
                        + (p.ay - b.y) * (p.ay - b.y) AS d2
               FROM probe p JOIN c b
                 ON p.cx = b.cx AND p.cy = b.cy AND p.a_id < b.event_id
               WHERE (p.ax - b.x) * (p.ax - b.x)
                   + (p.ay - b.y) * (p.ay - b.y) < 1000000)
         SELECT CAST(count(*) AS BIGINT) AS n_close_pairs,
                CAST(min(d2) AS BIGINT) AS min_d2,
                CAST(sum(d2) AS BIGINT) AS d2_sum
         FROM pairs""",
    // q56: the same basket-local self-join — DISTINCT brand set per
    // order, canonical a<b pairs, full tie-break on the top-20.
    "q56_copurchase" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS b
             FROM lineitem JOIN part ON l_partkey = p_partkey)
         SELECT a.b AS b1, b.b AS b2,
                CAST(count(*) AS BIGINT) AS n_orders
         FROM ob a JOIN ob b ON a.ok = b.ok AND a.b < b.b
         GROUP BY 1, 2
         ORDER BY n_orders DESC, b1, b2 LIMIT 20""",
    // q57: the oracle IS the canonical level-by-level BOM explosion —
    // per-edge qty = key mod 3 + 1 multiplied down the path; the
    // engine reaches the same closure in log-rounds.
    "q57_bom_rollup" ->
      """WITH RECURSIVE bom(node, root, depth, qty) AS (
           SELECT p_partkey, p_partkey, CAST(0 AS BIGINT),
                  CAST(1 AS BIGINT)
             FROM part WHERE p_partkey < 16
           UNION ALL
           SELECT p.p_partkey, b.root, b.depth + 1,
                  b.qty * (p.p_partkey % 3 + 1)
             FROM part p JOIN bom b
               ON p.p_partkey // 2 = b.node AND p.p_partkey >= 16)
         SELECT root, CAST(count(*) AS BIGINT) AS n_parts,
                CAST(sum(qty) AS BIGINT) AS total_units,
                CAST(max(depth) AS BIGINT) AS max_depth
         FROM bom GROUP BY root""",
    // q59: identical running-max sweep — union length and block count
    // from one ordered window pass, exact integers.
    "q59_interval_coverage" -> intervalCoverageOracleSql,
    // st47: q59's sweep maintained online as 4 longs of keyed state;
    // shared oracle.
    "st47_stream_coverage" -> intervalCoverageOracleSql,
    // q60: q26's chain with attribution bounds — identical stepped
    // mins, extra window predicates, exact us integers.
    "q60_windowed_funnel" -> windowedFunnelOracleSql,
    // q61: the ranked-sum Gini identity over cents longs; the oracle's
    // single-partition row_number is exactly what Ranks.rankedCumsum
    // replaces at scale — the hash match proves the bucketed rank.
    "q61_gini" ->
      """WITH r AS (SELECT o_custkey,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS cents
             FROM orders GROUP BY 1),
         k AS (SELECT cents,
                 row_number() OVER (ORDER BY cents, o_custkey) AS rnk
               FROM r),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n_customers,
                 CAST(sum(cents) AS BIGINT) AS total_cents,
                 CAST(2 * sum(CAST(rnk AS HUGEINT) * cents)
                   - (count(*) + 1) * sum(cents) AS BIGINT) AS gini_num,
                 CAST(count(*) * sum(cents) AS BIGINT) AS gini_den
               FROM k)
         SELECT *, CAST(gini_num AS DOUBLE) / CAST(gini_den AS DOUBLE)
           AS gini FROM a""",
    // q62: descending rank + running share, integer cross-multiplied
    // class thresholds — identical tie-break (cents DESC, partkey).
    "q62_abc" ->
      """WITH r AS (SELECT l_partkey,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
                 AS BIGINT) AS cents
             FROM lineitem GROUP BY 1),
         k AS (SELECT cents,
                 row_number() OVER (ORDER BY cents DESC, l_partkey)
                   AS rnk,
                 sum(cents) OVER (ORDER BY cents DESC, l_partkey
                   ROWS UNBOUNDED PRECEDING) AS cum,
                 (SELECT sum(cents) FROM r) AS tot
               FROM r)
         SELECT CASE WHEN cum * 5 <= tot * 4 THEN 'A'
                     WHEN cum * 20 <= tot * 19 THEN 'B'
                     ELSE 'C' END AS cls,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(cents) AS BIGINT) AS class_cents,
           CAST(min(rnk) AS BIGINT) AS first_rank,
           CAST(max(rnk) AS BIGINT) AS last_rank
         FROM k GROUP BY 1""",
    // q63: the canonical a<b<c triple self-join — the degree-ordered
    // orientation must find exactly these triangles.
    "q63_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
               FROM lineitem),
         e AS (SELECT DISTINCT x.pk AS a, y.pk AS b
               FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
         n AS (SELECT count(DISTINCT node) AS n_nodes FROM
                 (SELECT a AS node FROM e
                  UNION ALL SELECT b AS node FROM e)),
         t AS (SELECT count(*) AS n_tri
               FROM e e1 JOIN e e2 ON e2.a = e1.b
                    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
         SELECT CAST(n.n_nodes AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST(t.n_tri AS BIGINT) AS n_triangles
         FROM n, t""",
    // q64: the same closed form — running sum + running min replace
    // the sequential recurrence; all-integer slack/threshold units.
    "q64_cusum" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
               CAST(count(*) AS BIGINT) AS x
             FROM events GROUP BY 1, 2),
         tot AS (SELECT event_type, sum(x) AS s, count(*) AS nd
                 FROM daily GROUP BY 1),
         d AS (SELECT daily.event_type, daily.day, tot.s,
                 20 * tot.nd * daily.x - 21 * tot.s AS dd
               FROM daily JOIN tot USING (event_type)),
         c AS (SELECT *, sum(dd) OVER (PARTITION BY event_type
                 ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum
               FROM d),
         s2 AS (SELECT *, cum - least(CAST(0 AS BIGINT),
                 min(cum) OVER (PARTITION BY event_type ORDER BY day
                   ROWS UNBOUNDED PRECEDING)) AS cusum
               FROM c)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           CAST(max(cusum) AS BIGINT) AS max_cusum,
           CAST(sum(CASE WHEN cusum > 10 * s THEN 1 ELSE 0 END)
             AS BIGINT) AS n_flagged,
           min(CASE WHEN cusum > 10 * s THEN day END) AS first_flag_day
         FROM s2 GROUP BY 1""",
    // q65: identical integer leading-digit extraction and floored ppm
    // division; Benford shares are shared pinned literals.
    "q65_benford" ->
      """WITH v AS (SELECT CAST(substr(CAST(CAST(floor(value * 100)
                 AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
             FROM events WHERE CAST(floor(value * 100) AS BIGINT) > 0),
         t AS (SELECT count(*) AS tot FROM v),
         g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
               FROM v GROUP BY 1)
         SELECT digit, n, obs_ppm, benford_ppm,
           CAST(abs(obs_ppm - benford_ppm) AS BIGINT) AS dev_ppm
         FROM (SELECT g.digit, g.n,
                 CAST(g.n * 1000000 // t.tot AS BIGINT) AS obs_ppm,
                 CAST(CASE g.digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
                   WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181
                   WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153
                   ELSE 45757 END AS BIGINT) AS benford_ppm
               FROM g, t)""",
    // q66: the cross-multiplied two-proportion z-test in HUGEINT —
    // flag parity is exact; truncating integer division matches
    // Spark's long division for signed lift.
    "q66_ab_test" -> abTestOracleSql,
    // st50: q66's distinct-user counts maintained as first-seen keyed
    // state — set semantics, so the live fold shares q66's oracle.
    "st50_stream_ab_test" -> abTestOracleSql,
    // st49: prefix-trained CUSUM — the oracle computes the closed form
    // (running sum − running min) over monitoring days; the stream
    // runs the literal recurrence, proven equal in GraphStatsSpec.
    "st49_stream_cusum" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
               CAST(count(*) AS BIGINT) AS x
             FROM events GROUP BY 1, 2),
         r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                 ORDER BY day) AS rn FROM daily),
         t AS (SELECT event_type,
                 CAST(sum(CASE WHEN rn <= 7 THEN x ELSE 0 END)
                   AS BIGINT) AS tt
               FROM r GROUP BY 1),
         m AS (SELECT r.event_type, r.day, t.tt,
                 140 * r.x - 21 * t.tt AS dd
               FROM r JOIN t USING (event_type) WHERE r.rn > 7),
         c AS (SELECT *, sum(dd) OVER (PARTITION BY event_type
                 ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum FROM m),
         s2 AS (SELECT *, cum - least(CAST(0 AS BIGINT),
                 min(cum) OVER (PARTITION BY event_type ORDER BY day
                   ROWS UNBOUNDED PRECEDING)) AS cusum FROM c)
         SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_monitor_days,
           CAST(max(tt) AS BIGINT) AS t_train,
           CAST(max(cusum) AS BIGINT) AS max_cusum,
           CAST(sum(CASE WHEN cusum > 10 * tt THEN 1 ELSE 0 END)
             AS BIGINT) AS n_flagged,
           min(CASE WHEN cusum > 10 * tt THEN day END) AS first_flag_day
         FROM s2 GROUP BY 1""",
    // t36: first-occurrence identity — vocab(D) = tokens whose first
    // doc position <= D; identical ceil-division checkpoint grid.
    "t36_heaps_law" ->
      """WITH w AS (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
             FROM documents),
         pd AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS ntok FROM w),
         r AS (SELECT doc_id, ntok,
                 row_number() OVER (ORDER BY doc_id) AS rnk,
                 sum(ntok) OVER (ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
               FROM pd),
         n AS (SELECT count(*) AS n FROM pd),
         cp AS (SELECT CAST(f.g AS BIGINT) AS checkpoint,
                  (f.g * n.n + 9) // 10 AS d
                FROM generate_series(1, 10) f(g), n),
         tok AS (SELECT doc_id, unnest(ws) AS w FROM w),
         fd AS (SELECT w, min(doc_id) AS did FROM tok GROUP BY 1),
         fr AS (SELECT fd.w, r.rnk AS fr FROM fd
                JOIN r ON fd.did = r.doc_id),
         v AS (SELECT cp.checkpoint, CAST(count(*) AS BIGINT)
                 AS vocab_cum
               FROM fr, cp WHERE fr.fr <= cp.d GROUP BY 1)
         SELECT cp.checkpoint, CAST(cp.d AS BIGINT) AS n_docs_cum,
           CAST(r.cum AS BIGINT) AS tokens_cum, v.vocab_cum
         FROM cp JOIN r ON r.rnk = cp.d JOIN v USING (checkpoint)""",
    // t37: identical integer-valued-double odds and the generated
    // fixed-point log2 stages; deterministic (pmi_fp, bigram) top-20.
    "t37_pmi" -> {
      import graft.functions.PortableMath
      s"""WITH w AS (SELECT list_filter(string_split(text, ' '),
               x -> x <> '') AS ws FROM documents),
         tok AS (SELECT unnest(ws) AS w FROM w),
         uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cu
                 FROM tok GROUP BY 1),
         nt AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM tok),
         bi AS (SELECT unnest(list_transform(
                  generate_series(1, greatest(len(ws) - 1, 0)),
                  i -> ws[i] || ' ' || ws[i + 1])) AS g FROM w),
         nb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM bi),
         p0 AS (SELECT g, CAST(count(*) AS BIGINT) AS cb FROM bi
                GROUP BY 1 HAVING count(*) >= 5),
         p1 AS (SELECT p0.g, p0.cb, u1.cu AS c1, u2.cu AS c2,
                  CAST(CAST(p0.cb AS HUGEINT) * nt.nt * nt.nt AS DOUBLE)
                    / CAST(CAST(nb.nb AS HUGEINT) * u1.cu * u2.cu
                        AS DOUBLE) AS odds
                FROM p0 JOIN uni u1 ON split_part(p0.g, ' ', 1) = u1.w
                        JOIN uni u2 ON split_part(p0.g, ' ', 2) = u2.w,
                     nt, nb),
         ${PortableMath.log2FixedSqlStages("p1", "odds", "pmi_fp", "l2c")}
         SELECT g AS bigram, cb AS n_pair, c1 AS n_w1, c2 AS n_w2,
           pmi_fp, CAST(pmi_fp AS DOUBLE) / 65536.0 AS pmi_bits
         FROM l2cout ORDER BY pmi_fp DESC, bigram LIMIT 20"""
    },
    // s39: generated per-width CTEs — identical code construction,
    // pre-scaled integer error sums, global recall join.
    "s39_sq_ladder" -> sqLadderOracleSql,
    // q67: global row_number + the same explicit integer milli
    // interpolation — the oracle spells the interpolation out rather
    // than calling quantile_cont, so there is no float percentile
    // semantics to match.
    "q67_exact_quantiles" ->
      """WITH c AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT)
               AS v FROM lineitem),
         r AS (SELECT v, row_number() OVER (ORDER BY v) AS rnk FROM c),
         n AS (SELECT count(*) AS n FROM c),
         qs AS (SELECT unnest([250, 500, 750, 900, 990]) AS qm),
         hf AS (SELECT CAST(qm AS BIGINT) AS quantile_milli,
                  (1000 + qm * (n.n - 1)) // 1000 AS h,
                  (1000 + qm * (n.n - 1)) % 1000 AS f,
                  n.n AS n_rows
                FROM qs, n),
         lo AS (SELECT hf.quantile_milli, hf.f, hf.n_rows, r.v AS v_lo
                FROM hf JOIN r ON r.rnk = hf.h),
         hi AS (SELECT hf.quantile_milli, r.v AS v_hi
                FROM hf JOIN r ON r.rnk =
                  hf.h + CASE WHEN hf.f > 0 THEN 1 ELSE 0 END)
         SELECT lo.quantile_milli, CAST(lo.n_rows AS BIGINT) AS n_rows,
           lo.v_lo, hi.v_hi,
           CAST(lo.v_lo * (1000 - lo.f) + hi.v_hi * lo.f AS BIGINT)
             AS value_milli_cents
         FROM lo JOIN hi USING (quantile_milli)""",
    // t38: identical md5 uniform grid, generated fixed-point log2
    // stages, identical truncating integer division — the sample set
    // itself hash-matches.
    "t38_weighted_sample" -> {
      import graft.functions.PortableMath
      s"""WITH b AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
               CAST((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                 1, 15) AS BIGINT) % 1048576 + 1) AS DOUBLE) / 1048576.0
                 AS u
             FROM documents WHERE n_chars > 0),
         ${PortableMath.log2FixedSqlStages("b", "u", "lfx", "l2w")}
         SELECT doc_id, w, lfx, (lfx * 1024) // w AS s_fp
         FROM l2wout
         ORDER BY s_fp DESC, doc_id LIMIT 50"""
    },
    // q70: identical integer moments; the only floats are correctly-
    // rounded sqrt/divide, so even the double corr hash-matches.
    "q70_type_correlation" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS day, event_type,
               CAST(count(*) AS BIGINT) AS x
             FROM events GROUP BY 1, 2),
         grid AS (SELECT d.day, t.event_type,
                 coalesce(daily.x, 0) AS x
               FROM (SELECT DISTINCT day FROM daily) d
               CROSS JOIN (SELECT DISTINCT event_type FROM daily) t
               LEFT JOIN daily ON daily.day = d.day
                 AND daily.event_type = t.event_type),
         pairs AS (SELECT a.event_type AS type_a,
                 b.event_type AS type_b, a.x AS xa, b.x AS xb
               FROM grid a JOIN grid b ON a.day = b.day
                 AND a.event_type < b.event_type),
         m AS (SELECT type_a, type_b,
                 CAST(count(*) AS BIGINT) AS n_days,
                 CAST(sum(xa) AS BIGINT) AS sx,
                 CAST(sum(xb) AS BIGINT) AS sy,
                 CAST(sum(xa * xa) AS BIGINT) AS sxx,
                 CAST(sum(xb * xb) AS BIGINT) AS syy,
                 CAST(sum(xa * xb) AS BIGINT) AS sxy
               FROM pairs GROUP BY 1, 2)
         SELECT type_a, type_b, n_days,
           CAST(n_days * sxy - sx * sy AS BIGINT) AS cov_num,
           CAST(n_days * sxx - sx * sx AS BIGINT) AS var_a_num,
           CAST(n_days * syy - sy * sy AS BIGINT) AS var_b_num,
           CAST(n_days * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE))
               * sqrt(CAST(n_days * syy - sy * sy AS DOUBLE))) AS corr
         FROM m""",
    // q71: global row_number + identical integer bucket arithmetic;
    // count/lo/hi/NDV depend only on rank RANGES, so tied values
    // straddling a boundary cannot desync the engines.
    "q71_equidepth_hist" ->
      """WITH c AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT)
               AS v FROM lineitem),
         n AS (SELECT count(*) AS n FROM c),
         r AS (SELECT v, row_number() OVER (ORDER BY v) AS rnk FROM c),
         b AS (SELECT v, ((rnk - 1) * 16) // greatest(n.n, 1) AS bucket
               FROM r, n)
         SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
           min(v) AS lo, max(v) AS hi,
           CAST(count(DISTINCT v) AS BIGINT) AS ndv
         FROM b GROUP BY 1""",
    // q72: identical contingency integers; dev and N·r·c are exact
    // INT128/DECIMAL(38,0) on both sides, then the same two
    // correctly-rounded double conversions, one multiply, one divide.
    // No cross-row double sum is emitted, so hash order is moot.
    "q72_chi2_independence" ->
      """WITH cells AS (SELECT o_orderstatus AS status,
               o_orderpriority AS priority,
               CAST(count(*) AS BIGINT) AS o
             FROM orders GROUP BY 1, 2),
         r AS (SELECT status, CAST(sum(o) AS BIGINT) AS r
               FROM cells GROUP BY 1),
         c AS (SELECT priority, CAST(sum(o) AS BIGINT) AS c
               FROM cells GROUP BY 1),
         n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
         SELECT cells.status, cells.priority, cells.o, r.r, c.c, n.n,
           CAST(CAST(n.n AS HUGEINT) * cells.o
               - CAST(r.r AS HUGEINT) * c.c AS DOUBLE)
             * CAST(CAST(n.n AS HUGEINT) * cells.o
               - CAST(r.r AS HUGEINT) * c.c AS DOUBLE)
             / CAST(CAST(n.n AS HUGEINT) * r.r * c.c AS DOUBLE)
             AS contrib
         FROM cells JOIN r ON r.status = cells.status
           JOIN c ON c.priority = cells.priority, n""",
    // q73: same tie-collapsed (flag, v) pre-aggregate, same integer
    // cross-multiplied threshold (k·cum vs p·W) — the selected v is
    // invariant to tie order because ties were collapsed first.
    "q73_weighted_quantiles" ->
      """WITH bv AS (SELECT l_returnflag AS flag,
               CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
               CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
                 AS wv,
               CAST(count(*) AS BIGINT) AS nv
             FROM lineitem GROUP BY 1, 2),
         cw AS (SELECT flag, v, wv, nv,
             CAST(sum(wv) OVER (PARTITION BY flag ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum,
             CAST(sum(wv) OVER (PARTITION BY flag) AS BIGINT) AS tw,
             CAST(sum(nv) OVER (PARTITION BY flag) AS BIGINT) AS n
           FROM bv)
         SELECT flag, max(n) AS n_rows, max(tw) AS total_w,
           min(CASE WHEN cum * 4 >= tw THEN v END) AS p25_cents,
           min(CASE WHEN cum * 2 >= tw THEN v END) AS median_cents,
           min(CASE WHEN cum * 4 >= tw * 3 THEN v END) AS p75_cents
         FROM cw GROUP BY 1""",
    // t41: identical tokenization, all-integer counts and ppm
    // divisions (Spark div == DuckDB // — both truncate toward zero).
    "t41_lexical_diversity" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '),
               x -> x <> '') AS ws FROM documents),
         tok AS (SELECT doc_id, unnest(ws) AS w FROM w),
         tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
                FROM tok GROUP BY 1, 2)
         SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hapax,
           CAST(count(*) AS BIGINT) * 1000000 // CAST(sum(tf) AS BIGINT)
             AS ttr_ppm,
           CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
             * 1000000 // CAST(count(*) AS BIGINT) AS hapax_ppm
         FROM tf GROUP BY 1""",
    // t42: the same two fixed-point log2 chains (per-tf, then per-n);
    // the entropy numerator is an exact BIGINT on both sides and the
    // one closing divide is correctly-rounded IEEE.
    "t42_token_entropy" -> {
      import graft.functions.PortableMath
      s"""WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '),
               x -> x <> '') AS ws FROM documents),
         tok AS (SELECT doc_id, unnest(ws) AS w FROM w),
         tf0 AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
                 FROM tok GROUP BY 1, 2),
         tfd AS (SELECT doc_id, tf, CAST(tf AS DOUBLE) AS tfx FROM tf0),
         ${PortableMath.log2FixedSqlStages("tfd", "tfx", "l2tf", "ea")},
         agg AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(tf * l2tf) AS BIGINT) AS sum_tlog_fp,
             CAST(CAST(sum(tf) AS BIGINT) AS DOUBLE) AS nx
           FROM eaout GROUP BY doc_id),
         ${PortableMath.log2FixedSqlStages("agg", "nx", "log2n_fp", "eb")}
         SELECT doc_id, n_tokens, n_types, sum_tlog_fp, log2n_fp,
           CAST(log2n_fp * n_tokens - sum_tlog_fp AS DOUBLE)
             / (CAST(n_tokens AS DOUBLE) * 65536.0) AS entropy
         FROM ebout"""
    },
    // d29: the oracle is the NAIVE inverted-list containment join over
    // the same df<=100 vocabulary — the hash match proves the
    // prefix-vs-full candidate generation lossless. The threshold is
    // the integer cross-multiplication on both sides.
    "d29_containment_join" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         df AS (SELECT s, count(*) AS c FROM sh GROUP BY s),
         shf AS (SELECT sh.doc_id, sh.s FROM sh
                 JOIN df ON sh.s = df.s WHERE df.c <= 100),
         sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
                   FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY a.doc_id, b.doc_id)
         SELECT da, db,
           CAST(c AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE)
             AS overlap
         FROM inter JOIN sizes sa ON da = sa.doc_id
                    JOIN sizes sb ON db = sb.doc_id
         WHERE c * 5 >= least(sa.n, sb.n) * 4""",
    // d33: d07's recursive-CTE components rolled to a size histogram.
    "d33_cluster_sizes" ->
      s"""$clusterChainSql,
         clus AS (SELECT id AS doc_id, min(lbl) AS cluster
                  FROM walk GROUP BY id),
         sz AS (SELECT cluster, count(*) AS csize FROM clus
                GROUP BY cluster)
         SELECT CAST(csize AS BIGINT) AS csize,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(csize * count(*) AS BIGINT) AS n_docs,
           CAST((csize - 1) * count(*) AS BIGINT) AS n_removed
         FROM sz GROUP BY csize""",
    // d32: same md5 minhash perms and banding as st10/d02; per-group
    // Jaccard is the ratio of integer sums (micro-average), never a
    // float mean.
    // d36: d32's calibration for the asymmetric containment measure —
    // pooled exact Sum-inter/Sum-min next to the signature-implied
    // g*Sum(na+nb) / ((16+g)*Sum-min), integer sums only.
    "d36_containment_fidelity" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w
                 FROM documents)),
         h AS (SELECT doc_id, ('0x' || substr(md5(s),1,8))::BIGINT AS hw
               FROM sh),
         mh AS (SELECT doc_id, j,
                  min(((2*j+1)*hw + j*12345) % 4294967311) AS mv
                FROM h, generate_series(0,15) t(j) GROUP BY doc_id, j),
         bands AS (SELECT doc_id, j//4 AS band,
                     string_agg(mv, ',' ORDER BY j) AS sig
                   FROM mh GROUP BY doc_id, j//4),
         pairs AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
                   FROM bands a JOIN bands b
                     ON a.band = b.band AND a.sig = b.sig
                     AND a.doc_id < b.doc_id),
         mm AS (SELECT p.da, p.db,
                  sum(CASE WHEN a.mv = b.mv THEN 1 ELSE 0 END)
                    AS mh_matches
                FROM pairs p JOIN mh a ON a.doc_id = p.da
                  JOIN mh b ON b.doc_id = p.db AND b.j = a.j
                GROUP BY p.da, p.db),
         dfq AS (SELECT s FROM (SELECT s, count(*) AS c FROM sh
                  GROUP BY s) WHERE c <= 100),
         shf AS (SELECT sh.doc_id, sh.s FROM sh JOIN dfq USING (s)),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh
                   GROUP BY doc_id),
         inter AS (SELECT p.da, p.db, count(*) AS c
                   FROM pairs p JOIN shf a ON a.doc_id = p.da
                     JOIN shf b ON b.doc_id = p.db AND b.s = a.s
                   GROUP BY p.da, p.db)
         SELECT CAST(mm.mh_matches AS BIGINT) AS mh_matches,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(coalesce(i.c, 0)) AS BIGINT) AS inter_sum,
           CAST(sum(least(sa.n, sb.n)) AS BIGINT) AS min_sum,
           CAST(sum(coalesce(i.c, 0)) AS DOUBLE)
             / CAST(sum(least(sa.n, sb.n)) AS DOUBLE)
             AS exact_containment,
           CAST(mm.mh_matches * sum(sa.n + sb.n) AS BIGINT) AS est_num,
           CAST((mm.mh_matches + 16) * sum(least(sa.n, sb.n))
             AS BIGINT) AS est_den,
           CAST(CAST(mm.mh_matches * sum(sa.n + sb.n) AS BIGINT)
               AS DOUBLE)
             / CAST(CAST((mm.mh_matches + 16) * sum(least(sa.n, sb.n))
               AS BIGINT) AS DOUBLE) AS est_containment
         FROM mm LEFT JOIN inter i ON i.da = mm.da AND i.db = mm.db
           JOIN sizes sa ON sa.doc_id = mm.da
           JOIN sizes sb ON sb.doc_id = mm.db
         GROUP BY mm.mh_matches""",
    "d32_minhash_fidelity" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w
                 FROM documents)),
         h AS (SELECT doc_id, ('0x' || substr(md5(s),1,8))::BIGINT AS hw
               FROM sh),
         mh AS (SELECT doc_id, j,
                  min(((2*j+1)*hw + j*12345) % 4294967311) AS mv
                FROM h, generate_series(0,15) t(j) GROUP BY doc_id, j),
         bands AS (SELECT doc_id, j//4 AS band,
                     string_agg(mv, ',' ORDER BY j) AS sig
                   FROM mh GROUP BY doc_id, j//4),
         pairs AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
                   FROM bands a JOIN bands b
                     ON a.band = b.band AND a.sig = b.sig
                     AND a.doc_id < b.doc_id),
         mm AS (SELECT p.da, p.db,
                  sum(CASE WHEN a.mv = b.mv THEN 1 ELSE 0 END)
                    AS mh_matches
                FROM pairs p JOIN mh a ON a.doc_id = p.da
                  JOIN mh b ON b.doc_id = p.db AND b.j = a.j
                GROUP BY p.da, p.db),
         dfq AS (SELECT s FROM (SELECT s, count(*) AS c FROM sh
                  GROUP BY s) WHERE c <= 100),
         shf AS (SELECT sh.doc_id, sh.s FROM sh JOIN dfq USING (s)),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh
                   GROUP BY doc_id),
         inter AS (SELECT p.da, p.db, count(*) AS c
                   FROM pairs p JOIN shf a ON a.doc_id = p.da
                     JOIN shf b ON b.doc_id = p.db AND b.s = a.s
                   GROUP BY p.da, p.db)
         SELECT CAST(mm.mh_matches AS BIGINT) AS mh_matches,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(coalesce(i.c, 0)) AS BIGINT) AS inter_sum,
           CAST(sum(sa.n + sb.n - coalesce(i.c, 0)) AS BIGINT)
             AS union_sum,
           CAST(sum(coalesce(i.c, 0)) AS DOUBLE)
             / CAST(sum(sa.n + sb.n - coalesce(i.c, 0)) AS DOUBLE)
             AS micro_jaccard
         FROM mm LEFT JOIN inter i ON i.da = mm.da AND i.db = mm.db
           JOIN sizes sa ON sa.doc_id = mm.da
           JOIN sizes sb ON sb.doc_id = mm.db
         GROUP BY mm.mh_matches""",
    // d31: d04's exact inverted-list pairs held pre-division, rungs
    // assigned by integer cross-multiplication, first-seen-wins
    // removal = distinct later ids.
    "d31_dedup_pressure" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w
                 FROM documents)),
         df AS (SELECT s, count(*) AS c FROM sh GROUP BY s),
         shf AS (SELECT sh.doc_id, sh.s FROM sh
                 JOIN df ON sh.s = df.s WHERE df.c <= 100),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
                   FROM shf a JOIN shf b
                     ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY a.doc_id, b.doc_id),
         p AS (SELECT da, db, c, sa.n AS na, sb.n AS nb
               FROM inter JOIN sizes sa ON da = sa.doc_id
                          JOIN sizes sb ON db = sb.doc_id),
         th AS (SELECT unnest([500, 600, 700, 800]) AS theta_milli),
         hit AS (SELECT t.theta_milli, p.da, p.db FROM p, th t
                 WHERE 1000 * p.c >= t.theta_milli * (p.na + p.nb - p.c)),
         agg AS (SELECT theta_milli, count(*) AS n_pairs,
                   count(DISTINCT db) AS n_removed
                 FROM hit GROUP BY theta_milli),
         nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
         SELECT CAST(t.theta_milli AS BIGINT) AS theta_milli,
           CAST(coalesce(agg.n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(coalesce(agg.n_removed, 0) AS BIGINT) AS n_removed,
           CAST(nd.n - coalesce(agg.n_removed, 0) AS BIGINT) AS n_kept,
           CAST(nd.n - coalesce(agg.n_removed, 0) AS DOUBLE)
             / CAST(nd.n AS DOUBLE) AS kept_share
         FROM th t LEFT JOIN agg ON agg.theta_milli = t.theta_milli, nd""",
    // d30: the oracle is the NAIVE within-language all-pairs
    // Levenshtein on the same 32-char key — the hash match proves the
    // Ed-Join q-gram prefix filter lossless (one edit kills ≤ q grams,
    // so ed ≤ k pairs must share one of their k·q+1 rarest grams).
    // The Δlen predicate is implied by ed ≤ k; it is in the oracle
    // only to keep the naive join cheap.
    "d30_edit_distance_join" ->
      """WITH s AS (SELECT doc_id, lang, substr(text, 1, 32) AS t
                    FROM documents WHERE length(text) >= 12)
         SELECT a.doc_id AS da, b.doc_id AS db,
           CAST(levenshtein(a.t, b.t) AS BIGINT) AS ed
         FROM s a JOIN s b
           ON a.lang = b.lang AND a.doc_id < b.doc_id
         WHERE abs(length(a.t) - length(b.t)) <= 2
           AND levenshtein(a.t, b.t) <= 2""",
    // st61: the same gate-stage seal maintained online per shard;
    // xor's commutativity makes the online and batch seals equal.
    "st61_stream_seal" ->
      """SELECT '1_gate' AS stage, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(('0x' || substr(md5(doc_id::VARCHAR || ':' ||
             md5(text)), 1, 15))::BIGINT) AS BIGINT) AS content_hash
         FROM documents WHERE n_chars >= 50""",
    // c40: each stage's (n, xor-of-row-hashes) recomputed from the
    // raw table — hash equality IS the provenance verification.
    "c40_provenance_chain" ->
      """WITH s1 AS (
           SELECT doc_id, text,
             ('0x' || substr(md5(doc_id::VARCHAR || ':' || md5(text)),
               1, 15))::BIGINT AS h
           FROM documents WHERE n_chars >= 50),
         keep AS (SELECT min(doc_id) AS doc_id FROM s1
                  GROUP BY md5(text)),
         s2 AS (SELECT s1.* FROM s1 JOIN keep USING (doc_id)),
         s3 AS (SELECT * FROM s2 WHERE
           ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10
             < 8)
         SELECT '1_gate' AS stage, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(h) AS BIGINT) AS content_hash FROM s1
         UNION ALL
         SELECT '2_dedup', CAST(count(*) AS BIGINT),
           CAST(bit_xor(h) AS BIGINT) FROM s2
         UNION ALL
         SELECT '3_train', CAST(count(*) AS BIGINT),
           CAST(bit_xor(h) AS BIGINT) FROM s3""",
    // c39: each snapshot's logical content reconstructed from the
    // base tables; the hash proves lake version isolation per table,
    // per version, and jointly under the aligned/torn joins.
    "c39_consistent_snapshot" ->
      """WITH reads(rd, vo, vc) AS (VALUES
           ('aligned', 1, 1), ('aligned', 2, 2), ('aligned', 3, 3),
           ('torn', 1, 3)),
         o AS (SELECT r.rd, r.vo, r.vc, x.o_orderkey, x.o_custkey
               FROM reads r JOIN orders x ON
                 CASE r.vo
                   WHEN 1 THEN x.o_orderkey % 3 = 0
                   WHEN 2 THEN x.o_orderkey % 3 <= 1
                     AND x.o_custkey % 10 <> 0
                   ELSE x.o_custkey % 10 NOT IN (0, 1) END),
         c AS (SELECT r.rd, r.vo, r.vc, x.c_custkey
               FROM reads r JOIN customer x ON
                 CASE r.vc
                   WHEN 1 THEN TRUE
                   WHEN 2 THEN x.c_custkey % 10 <> 0
                   ELSE x.c_custkey % 10 NOT IN (0, 1) END),
         j AS (SELECT o.rd, o.vo, o.vc, count(*) AS n_join
               FROM o JOIN c ON c.rd = o.rd AND c.vo = o.vo
                 AND c.vc = o.vc AND c.c_custkey = o.o_custkey
               GROUP BY o.rd, o.vo, o.vc),
         oc AS (SELECT rd, vo, vc, count(*) AS n_orders FROM o
                GROUP BY rd, vo, vc),
         cc AS (SELECT rd, vo, vc, count(*) AS n_cust FROM c
                GROUP BY rd, vo, vc)
         SELECT oc.rd AS read, CAST(oc.vo AS BIGINT) AS v_orders,
           CAST(oc.vc AS BIGINT) AS v_cust,
           CAST(oc.n_orders AS BIGINT) AS n_orders,
           CAST(cc.n_cust AS BIGINT) AS n_cust,
           CAST(j.n_join AS BIGINT) AS n_join,
           CAST(oc.n_orders - j.n_join AS BIGINT) AS n_orphans
         FROM oc JOIN cc ON cc.rd = oc.rd AND cc.vo = oc.vo
             AND cc.vc = oc.vc
           JOIN j ON j.rd = oc.rd AND j.vo = oc.vo AND j.vc = oc.vc""",
    // c38: one distinct-project + one anti-join per FK edge; missing
    // parents surface as (count, smallest orphan key).
    "c38_fk_audit" -> fkAuditOracleSql,
    // c36: d30's pair graph transitively closed by a recursive CTE,
    // canonical = (n_chars DESC, doc_id) argmax per cluster; the hash
    // proves the whole Ed-Join -> CC -> keep-policy chain.
    "c36_typo_canonical" ->
      """WITH RECURSIVE s AS (
           SELECT doc_id, lang, substr(text, 1, 32) AS t, n_chars
           FROM documents WHERE length(text) >= 12),
         pairs AS (
           SELECT a.doc_id AS da, b.doc_id AS db
           FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
           WHERE abs(length(a.t) - length(b.t)) <= 2
             AND levenshtein(a.t, b.t) <= 2),
         edges AS (SELECT da AS src, db AS dst FROM pairs
                   UNION ALL SELECT db, da FROM pairs),
         walk(id, lbl) AS (
           SELECT doc_id, doc_id FROM s
           UNION
           SELECT e.dst, w.lbl FROM walk w JOIN edges e ON w.id = e.src),
         clus AS (SELECT id AS doc_id, min(lbl) AS cluster
                  FROM walk GROUP BY id),
         canon AS (SELECT cluster, csize, doc_id AS canonical_id FROM (
             SELECT c.cluster, c.doc_id, d.n_chars,
               count(*) OVER (PARTITION BY c.cluster) AS csize,
               row_number() OVER (PARTITION BY c.cluster
                 ORDER BY d.n_chars DESC, c.doc_id) AS rn
             FROM clus c JOIN s d USING (doc_id)) WHERE rn = 1)
         SELECT c.doc_id, k.canonical_id, c.cluster,
           CAST(k.csize AS BIGINT) AS csize
         FROM clus c JOIN canon k ON k.cluster = c.cluster
         WHERE k.csize >= 2""",
    // c30/st53: the oracle is the UNPRUNED range aggregate — the hash
    // match proves the zone-map file prune lossless (c30 batch-built,
    // st53 maintained per streaming micro-batch).
    "c30_zonemap_lake" -> zoneRangeOracleSql,
    "st53_stream_zonemap" -> zoneRangeOracleSql,
    // s41: the s08/s33 Lloyd chain (train on everything, assign vs
    // the final model), exact int64 L2^2 to the assigned centroid,
    // global top-50 by (d2 DESC, vec_id).
    "s41_ood_scan" ->
      s"""${ivfAssignChainSql("TRUE")},
         sqd AS (
           SELECT a.cid, a.vec_id,
             CAST((SELECT sum((x - y) * (x - y))
                   FROM (SELECT unnest(p.v) x, unnest(c.cv) y)) AS BIGINT)
               AS d2
           FROM assignT a JOIN pre p ON p.vec_id = a.vec_id
                          JOIN cents2 c ON c.cid = a.cid)
         SELECT vec_id, cell, d2, rank FROM (
           SELECT vec_id, cid AS cell, d2,
             row_number() OVER (ORDER BY d2 DESC, vec_id) AS rank
           FROM sqd)
         WHERE rank <= 50""",
    // q74/st54: identical day-grain counts and exact long OLS
    // moments; the slope is one correctly-rounded divide. The
    // streaming variant must land on the same aggregate (counts are
    // additive across micro-batches).
    "q74_group_trend" -> groupTrendOracleSql,
    "st54_stream_group_trend" -> groupTrendOracleSql,
    // t43: the same length-difference punctuation count, the same
    // non-overlapping keyword regex, all-integer ppm score.
    "t43_code_detect" ->
      """SELECT doc_id, n_chars, code_punct, n_keywords,
           (code_punct * 10 + n_keywords * 200) * 1000000 // n_chars
             AS score_ppm,
           (code_punct * 10 + n_keywords * 200) * 1000000 // n_chars
             >= 30000 AS is_code
         FROM (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
             CAST(length(text) - length(regexp_replace(text,
               '[{}\[\]();=<>]', '', 'g')) AS BIGINT) AS code_punct,
             CAST(len(regexp_extract_all(text,
               '\b(def|return|import|class|const|void|int|function|var)\b'))
               AS BIGINT) AS n_keywords
           FROM documents)
         WHERE n_chars > 0""",
    // c31: the seal (count, exact cents sum, commutative bit_xor
    // digest) computed ONCE from the raw table and stated for both
    // layouts — each side of the migration is checked against the
    // source of truth.
    "c31_repartition_migrate" ->
      """WITH base AS (SELECT event_id, user_id, event_type,
             epoch_us(ts) AS ts_us,
             CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
         s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS cents,
             bit_xor(('0x' || substr(md5(event_id || '|' || user_id ||
               '|' || event_type || '|' || ts_us || '|' || cents),
               1, 15))::BIGINT) AS digest
           FROM base)
         SELECT n AS n_old, cents AS cents_old, digest AS digest_old,
           n AS n_new, cents AS cents_new, digest AS digest_new
         FROM s""",
    // q75: identical value-grain counts; the tie rule (max count,
    // then smallest value) is stated as the window order on both
    // sides, so the mode is bit-deterministic.
    "q75_grouped_mode" ->
      """WITH bv AS (SELECT event_type,
             CAST(floor(value * 100) AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         r AS (SELECT event_type, v, c,
             row_number() OVER (PARTITION BY event_type
               ORDER BY c DESC, v) AS rn
           FROM bv)
         SELECT r.event_type, r.v AS mode_cents, r.c AS n_mode,
           t.n_distinct, t.n_rows
         FROM r JOIN (SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(sum(c) AS BIGINT) AS n_rows
           FROM bv GROUP BY 1) t ON t.event_type = r.event_type
         WHERE r.rn = 1""",
    // st55: the s33 frozen-model chain; the threshold is the exact
    // p95 of base distances (min d2 with 20*rank >= 19*n, ranked by
    // (d2, vec_id)); arrivals flagged strictly-greater.
    "st55_stream_ood_gate" ->
      s"""${ivfAssignChainSql("vec_id % 10 <> 7")},
         sqd AS (
           SELECT a.vec_id, a.cid,
             CAST((SELECT sum((x - y) * (x - y))
                   FROM (SELECT unnest(p.v) x, unnest(c.cv) y)) AS BIGINT)
               AS d2
           FROM assignT a JOIN pre p ON p.vec_id = a.vec_id
                          JOIN cents2 c ON c.cid = a.cid),
         basek AS (SELECT d2,
             row_number() OVER (ORDER BY d2, vec_id) AS rn,
             count(*) OVER () AS n
           FROM sqd WHERE vec_id % 10 <> 7),
         th AS (SELECT min(d2) AS th FROM basek WHERE 20 * rn >= 19 * n)
         SELECT vec_id, cid AS cell, d2, d2 > th.th AS is_ood
         FROM sqd, th WHERE vec_id % 10 = 7""",
    // c32: the oracle is the UNPRUNED two-predicate query — the hash
    // match proves the intersected Bloom+zone-map prune lossless.
    "c32_composite_prune" ->
      """WITH b AS (SELECT max(user_id) * 10 // 100 AS lo,
           max(user_id) * 25 // 100 AS hi FROM events)
         SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
           CAST(floor(value * 100) AS BIGINT) AS cents
         FROM events, b
         WHERE event_id % 97 = 0 AND user_id BETWEEN b.lo AND b.hi""",
    // m11: identical re-broadcast derivation (2-frame slate + donor
    // payload), identical frame fingerprints (the m03 hex-substr
    // construction), the same distinct match points and
    // gaps-and-islands run arithmetic.
    "m11_clip_dedup" ->
      """WITH d AS (SELECT doc_id, text FROM documents),
         w AS (SELECT doc_id,
                 CASE WHEN doc_id % 7 = 2 THEN doc_id - 2
                      ELSE doc_id END AS src_id
               FROM d),
         p AS (SELECT w.doc_id,
                 CASE WHEN w.doc_id % 7 = 2 THEN repeat('X', 128) || s.text
                      ELSE s.text END AS blob
               FROM w JOIN d s ON s.doc_id = w.src_id),
         base AS (SELECT doc_id, hex(encode(blob)) AS hx,
                    octet_length(encode(blob)) AS nb FROM p),
         fr AS (SELECT doc_id AS id, frame_idx,
                  md5(substr(hx, CAST(frame_idx*128+1 AS INT), 128))
                    AS frame_fp
                FROM (SELECT doc_id, hx,
                        unnest(range(0, nb//64, 2)) AS frame_idx
                      FROM base WHERE nb >= 64)),
         m AS (SELECT DISTINCT a.id AS da, b.id AS db,
                 a.frame_idx AS ia, b.frame_idx AS ib
               FROM fr a JOIN fr b
                 ON a.frame_fp = b.frame_fp AND a.id < b.id),
         runs AS (SELECT da, db, off, isl,
                    CAST(count(*) AS BIGINT) AS run
                  FROM (SELECT da, db, ia - ib AS off, ia,
                          ia // 2 - row_number() OVER (
                            PARTITION BY da, db, ia - ib ORDER BY ia)
                            AS isl
                        FROM m)
                  GROUP BY 1, 2, 3, 4)
         SELECT da, db, CAST(sum(run) AS BIGINT) AS n_matches,
           CAST(max(run) AS BIGINT) AS longest_run
         FROM runs GROUP BY 1, 2 HAVING max(run) >= 3""",
    // t44: t04's normalized content fingerprint, t03's whitespace
    // token count, all-integer micro-token division.
    "t44_effective_tokens" ->
      """WITH base AS (SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
             md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
           FROM documents),
         dup AS (SELECT fp, CAST(count(*) AS BIGINT) AS c
                 FROM base GROUP BY 1)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS raw_tokens,
           CAST(sum(toks * 1000000 // c) AS BIGINT) AS eff_tokens_micro,
           CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs
         FROM base JOIN dup USING (fp) GROUP BY 1""",
    // st56: the exact per-(type, user) cents sums are additive across
    // micro-batches; rank (cents DESC, user_id) top-10 per type.
    "st56_stream_leaderboard" ->
      """WITH s AS (SELECT event_type, user_id,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
           FROM events GROUP BY 1, 2)
         SELECT event_type, user_id, cents, rank FROM (
           SELECT event_type, user_id, cents,
             row_number() OVER (PARTITION BY event_type
               ORDER BY cents DESC, user_id) AS rank
           FROM s) WHERE rank <= 10""",
    // c33: the clean-row accounting derived from the canonical table;
    // the reject count is the deterministic inject (2 malformed
    // lines). A parser that silently drops or mangles a clean row
    // breaks n_clean/cents_sum; one that admits a malformed row
    // breaks n_rejected.
    "c33_csv_ingest" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_clean,
           CAST(2 AS BIGINT) AS n_rejected,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             AS cents_sum
         FROM events""",
    // c34: c31's seal discipline — the count/cents/digest triple
    // computed once from the raw table, stated for both the parquet
    // source and the ORC copy.
    "c34_orc_roundtrip" -> roundtripOracleSql,
    // q76: the LATERAL correlation restated as the equivalent
    // partitioned rank — same top-3, same (bal DESC, custkey) ties.
    "q76_lateral_topk" ->
      """SELECT nation, custkey, bal_cents FROM (
           SELECT n.n_name AS nation, c.c_custkey AS custkey,
             CAST(floor(c.c_acctbal * 100) AS BIGINT) AS bal_cents,
             row_number() OVER (PARTITION BY n.n_nationkey
               ORDER BY c.c_acctbal DESC, c.c_custkey) AS rn
           FROM nation n JOIN customer c
             ON c.c_nationkey = n.n_nationkey)
         WHERE rn <= 3""",
    // t45: identical positions (only distances matter, so 0- vs
    // 1-based indexing cancels), canonicalized pairs, integer counts.
    "t45_skipgram_cooc" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '),
               x -> x <> '') AS ws FROM documents),
         pos AS (SELECT doc_id, i, ws[i] AS w FROM w,
                 LATERAL (SELECT unnest(generate_series(1, len(ws)))
                          AS i) t),
         pr AS (SELECT least(a.w, b.w) AS w1, greatest(a.w, b.w) AS w2
                FROM pos a JOIN pos b ON a.doc_id = b.doc_id
                  AND b.i > a.i AND b.i <= a.i + 2),
         cc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
                FROM pr GROUP BY 1, 2 HAVING count(*) >= 5)
         SELECT w1, w2, c, rank FROM (
           SELECT w1, w2, c,
             row_number() OVER (ORDER BY c DESC, w1, w2) AS rank
           FROM cc)
         WHERE rank <= 20""",
    // c35: the same md5-seeded u, the same fixed-point base-2 log
    // chain, the same truncating integer division — the released
    // milli-count is an exact integer on both engines.
    "c35_dp_counts" -> {
      import graft.functions.PortableMath
      s"""WITH g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c
             FROM events GROUP BY 1),
         s AS (SELECT event_type, c,
             ('0x' || substr(md5('dp_' || event_type), 1, 15))::BIGINT
               % 1000000 AS u0
           FROM g),
         s2 AS (SELECT event_type, c,
             greatest(1000000 - abs(u0 * 2 - 1000000), 1) AS t_ppm,
             CASE WHEN u0 >= 500000 THEN 1 ELSE -1 END AS sgn
           FROM s),
         s3 AS (SELECT *, CAST(t_ppm AS DOUBLE) AS tx FROM s2),
         ${PortableMath.log2FixedSqlStages("s3", "tx", "l2t", "ca")},
         s4 AS (SELECT *, CAST(1000000.0 AS DOUBLE) AS ex FROM caout),
         ${PortableMath.log2FixedSqlStages("s4", "ex", "l2e6", "cb")}
         SELECT event_type, CAST(2000 AS BIGINT) AS b_milli,
           c * 1000 + (sgn * (2000 * (l2e6 - l2t))) // 65536
             AS noisy_count_milli
         FROM cbout"""
    },
    // q77: the identical WITH RECURSIVE walk — DuckDB runs the same
    // declarative recursion Spark's UnionLoop executes.
    "q77_recursive_cte" ->
      """WITH RECURSIVE walk(node, root, depth) AS (
           SELECT p_partkey, p_partkey, CAST(0 AS BIGINT)
             FROM part WHERE p_partkey < 16
           UNION ALL
           SELECT p.p_partkey, w.root, w.depth + 1
             FROM part p JOIN walk w
               ON p.p_partkey // 2 = w.node AND p.p_partkey >= 16)
         SELECT node, root, depth FROM walk""",
    // q78: the same typed path extraction over the JSON props.
    "q78_variant_extract" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
             AS BIGINT) AS k_sum,
           CAST(min(CAST(json_extract(props, '$.k') AS BIGINT))
             AS BIGINT) AS k_min,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT))
             AS BIGINT) AS k_max,
           CAST(count(DISTINCT CAST(json_extract(props, '$.k')
             AS BIGINT)) AS BIGINT) AS k_ndv
         FROM events GROUP BY 1""",
    // t39: identical rank order (freq DESC, word), two generated
    // fixed-point log2 chains, HUGEINT sums mirroring DECIMAL(38,0),
    // the same two decimal->double conversions and one division.
    "t39_zipf_slope" -> {
      import graft.functions.PortableMath
      s"""WITH w AS (SELECT list_filter(string_split(text, ' '),
               x -> x <> '') AS ws FROM documents),
         tok AS (SELECT unnest(ws) AS w FROM w),
         uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cu
                 FROM tok GROUP BY 1),
         rk AS (SELECT cu, CAST(cu AS DOUBLE) AS cud,
                  CAST(row_number() OVER (ORDER BY cu DESC, w)
                    AS DOUBLE) AS rd
                FROM uni),
         ${PortableMath.log2FixedSqlStages("rk", "rd", "xfx", "l2x")},
         ${PortableMath.log2FixedSqlStages("l2xout", "cud", "yfx", "l2y")},
         a AS (SELECT CAST(count(*) AS BIGINT) AS n_vocab,
                 sum(CAST(xfx AS HUGEINT)) AS sx,
                 sum(CAST(yfx AS HUGEINT)) AS sy,
                 sum(CAST(xfx AS HUGEINT) * yfx) AS sxy,
                 sum(CAST(xfx AS HUGEINT) * xfx) AS sxx
               FROM l2yout)
         SELECT n_vocab,
           CAST(n_vocab * sxy - sx * sy AS DOUBLE) AS num,
           CAST(n_vocab * sxx - sx * sx AS DOUBLE) AS den,
           CAST(n_vocab * sxy - sx * sy AS DOUBLE)
             / CAST(n_vocab * sxx - sx * sx AS DOUBLE) AS slope
         FROM a"""
    },
    // s40: the oracle is BRUTE-FORCE MIPS — the hash match proves the
    // norm-bound prune lossless (returned the exact top-k).
    "s40_mips_norm_prune" ->
      s"""WITH pre AS ($embPreSql),
         sims AS (
           SELECT q.vec_id AS qid, c.vec_id AS nid,
             CAST((SELECT sum(x*y)
               FROM (SELECT unnest(q.v) x, unnest(c.v) y)) AS BIGINT)
               AS dot
           FROM pre q JOIN pre c ON c.vec_id <> q.vec_id
           WHERE q.vec_id < 8)
         SELECT qid, nid, dot, rank FROM (
           SELECT qid, nid, dot,
             row_number() OVER (PARTITION BY qid
               ORDER BY dot DESC, nid) AS rank
           FROM sims)
         WHERE rank <= 10""",
    // c29: the delta reconstructed from raw events — pre-cutoff state
    // vs final state per user. Updates always differ (the user has
    // post-cutoff events, so n_events strictly grows), deletes only
    // hit pre-existing keys, inserts are post-only users; unchanged
    // keys (even when their shard was rewritten) must NOT appear.
    "c29_lake_version_diff" -> lakeCdcOracleSql,
    // st52: the same NET delta — the parity-split commit chain must
    // land on the single-merge state, and diffing across the chain
    // (v1 -> v3) must report exactly the one-merge change feed.
    "st52_stream_incremental_cdc" -> lakeCdcOracleSql,
    // t40: identical tf/df longs, one correctly-rounded N/df double
    // division, the generated fixed-point log2 chain, identical
    // (score DESC, term) per-doc top-3.
    "t40_tfidf_keywords" -> {
      import graft.functions.PortableMath
      s"""WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '),
               x -> x <> '') AS ws FROM documents),
         tok AS (SELECT doc_id, unnest(ws) AS w FROM w),
         tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
                FROM tok GROUP BY 1, 2),
         dfq AS (SELECT w, CAST(count(*) AS BIGINT) AS df
                 FROM tf GROUP BY 1),
         n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n
               FROM tok),
         sc AS (SELECT tf.doc_id, tf.w, tf.tf, dfq.df,
                  CAST(n.n AS DOUBLE) / CAST(dfq.df AS DOUBLE) AS ratio
                FROM tf JOIN dfq ON dfq.w = tf.w, n),
         ${PortableMath.log2FixedSqlStages("sc", "ratio", "idf_fp",
            "l2t")},
         r AS (SELECT doc_id, w, tf, df, tf * idf_fp AS score_fp,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY tf * idf_fp DESC, w) AS rank
               FROM l2tout)
         SELECT doc_id, rank, w AS term, tf, df, score_fp
         FROM r WHERE rank <= 3"""
    },
    // q68: the oracle is the QUADRATIC canon — NOT EXISTS dominance
    // self-join; the hash match proves the prefix-min sweep rewrite.
    "q68_skyline" ->
      """WITH p AS (SELECT p_partkey,
               CAST(floor(p_retailprice * 100) AS BIGINT) AS pc,
               CAST(p_size AS BIGINT) AS sz
             FROM part)
         SELECT a.p_partkey, a.pc AS price_cents, a.sz AS size
         FROM p a WHERE NOT EXISTS (
           SELECT 1 FROM p b
           WHERE b.pc <= a.pc AND b.sz <= a.sz
             AND (b.pc < a.pc OR b.sz < a.sz))""",
    // q69: group-partitioned row_number/count + the same explicit
    // integer milli interpolation as q67.
    "q69_grouped_quantiles" ->
      """WITH e AS (SELECT event_type,
               CAST(floor(value * 100) AS BIGINT) AS v FROM events),
         r AS (SELECT event_type, v,
                 CAST(row_number() OVER (PARTITION BY event_type
                   ORDER BY v) AS BIGINT) AS rnk,
                 CAST(count(*) OVER (PARTITION BY event_type)
                   AS BIGINT) AS n
               FROM e),
         qs AS (SELECT CAST(unnest([500, 900]) AS BIGINT) AS qm),
         g AS (SELECT r.*, qs.qm, 1000 + qs.qm * (r.n - 1) AS pm
               FROM r, qs),
         h AS (SELECT *, pm // 1000 AS h,
                 pm % 1000 AS f,
                 CASE WHEN pm % 1000 > 0 THEN pm // 1000 + 1
                      ELSE pm // 1000 END AS h2
               FROM g)
         SELECT event_type, qm AS quantile_milli,
           CAST(max(n) AS BIGINT) AS n_rows,
           max(CASE WHEN rnk = h THEN v END) AS v_lo,
           max(CASE WHEN rnk = h2 THEN v END) AS v_hi,
           CAST(max(CASE WHEN rnk = h THEN v END) * (1000 - max(f))
             + max(CASE WHEN rnk = h2 THEN v END) * max(f) AS BIGINT)
             AS value_milli_cents
         FROM h GROUP BY 1, 2""",
    // st51: the incrementally-maintained sidecar must serve the same
    // full-scan answer — shared c28-style oracle.
    "st51_stream_bloom_index" ->
      """SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
           CAST(floor(value * 100) AS BIGINT) AS cents
         FROM events WHERE event_id % 997 = 0""",
    // c28: the oracle is the FULL-SCAN answer — the hash match proves
    // the bloom-pruned read lost nothing (no false negatives);
    // file-level skipping is pinned in LakeSpec.
    "c28_bloom_index" ->
      """SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
           CAST(floor(value * 100) AS BIGINT) AS cents
         FROM events WHERE event_id % 997 = 0""",
    // m10: identical stub dims, nearest-ladder snap (ties to the
    // smaller ratio), id-ordered `div 8` packing.
    "m10_ar_buckets" ->
      """WITH m AS (SELECT doc_id AS id,
               CAST(octet_length(encode(text)) % 640 AS INT) AS width,
               CAST(octet_length(encode(text)) % 480 AS INT) AS height
             FROM documents),
         d AS (SELECT id, CAST((width * 1000) // height AS BIGINT) AS ar
               FROM m WHERE width > 0 AND height > 0),
         lad AS (SELECT unnest([250, 500, 750, 1000, 1333, 1500,
                  2000, 3000]) AS b),
         pick AS (SELECT id, ar, b, row_number() OVER (PARTITION BY id
                  ORDER BY abs(ar - b), b) AS rk FROM d, lad),
         bkt AS (SELECT id, ar, CAST(b AS BIGINT) AS bucket_milli
                 FROM pick WHERE rk = 1),
         pack AS (SELECT *, (row_number() OVER (PARTITION BY
                  bucket_milli ORDER BY id) - 1) // 8 AS batch_id
                  FROM bkt)
         SELECT bucket_milli, CAST(batch_id AS BIGINT) AS batch_id,
           CAST(count(*) AS BIGINT) AS n_in_batch,
           CAST(min(ar) AS BIGINT) AS ar_min,
           CAST(max(ar) AS BIGINT) AS ar_max
         FROM pack GROUP BY 1, 2""",
    // st48: q60's bounded chain as live keyed state (first qualifying
    // arrival == the batch conditional min); shared oracle.
    "st48_stream_windowed_funnel" -> windowedFunnelOracleSql,
    // q58: cents longs, quantile_cont == percentile interpolation
    // (q21 parity), deviations and 3*MAD as identically-rounded doubles.
    "q58_mad_outliers" ->
      """WITH e AS (SELECT event_type,
               CAST(floor(value * 100) AS BIGINT) AS v FROM events),
         m AS (SELECT event_type, quantile_cont(v, 0.5) AS median_c
               FROM e GROUP BY 1),
         d AS (SELECT e.event_type, v, median_c,
                 abs(CAST(v AS DOUBLE) - median_c) AS dev
               FROM e JOIN m USING (event_type)),
         md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad_c
                FROM d GROUP BY 1)
         SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
           max(d.median_c) AS median_c, max(md.mad_c) AS mad_c,
           CAST(sum(CASE WHEN dev > mad_c * 3.0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_outliers
         FROM d JOIN md USING (event_type)
         GROUP BY d.event_type""",
    // st46: q55's grid protocol over the every-10th-event subsample —
    // the streaming state find the identical pair set.
    "st46_stream_spatial" ->
      """WITH pts AS (SELECT event_id,
               CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
                    AS BIGINT) % 100000 AS x,
               CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 9, 8)
                    AS BIGINT) % 100000 AS y
             FROM events WHERE event_id % 20 = 0),
         c AS (SELECT event_id, x, y, x // 1000 AS cx, y // 1000 AS cy
               FROM pts),
         probe AS (SELECT event_id AS a_id, x AS ax, y AS ay,
                 cx + dx.g AS cx, cy + dy.g AS cy
               FROM c, generate_series(-1, 1) dx(g),
                    generate_series(-1, 1) dy(g)),
         pairs AS (SELECT (p.ax - b.x) * (p.ax - b.x)
                        + (p.ay - b.y) * (p.ay - b.y) AS d2
               FROM probe p JOIN c b
                 ON p.cx = b.cx AND p.cy = b.cy AND p.a_id < b.event_id
               WHERE (p.ax - b.x) * (p.ax - b.x)
                   + (p.ay - b.y) * (p.ay - b.y) < 1000000)
         SELECT CAST(count(*) AS BIGINT) AS n_close_pairs,
                CAST(min(d2) AS BIGINT) AS min_d2,
                CAST(sum(d2) AS BIGINT) AS d2_sum
         FROM pairs""",
    // q54: gaps-and-islands sessionization in the oracle (DuckDB has
    // no session_window) — identical 30-min-gap semantics.
    "q54_session_paths" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id,
               event_type FROM events),
         g AS (SELECT *, CASE WHEN t - lag(t) OVER
                 (PARTITION BY user_id ORDER BY t, event_id)
                 > 1800000000 THEN 1 ELSE 0 END AS brk
               FROM e),
         s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                 ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS sid
               FROM g),
         p AS (SELECT user_id, sid,
                 array_to_string(list_slice(
                   list(event_type ORDER BY t, event_id), 1, 5), '>')
                   AS path
               FROM s GROUP BY user_id, sid)
         SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
         FROM p GROUP BY path
         ORDER BY n_sessions DESC, path LIMIT 10""",
    // c25: one pushdown-filtered scan + rollup per requesting user.
    "c25_subject_access" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           epoch_us(min(ts)) AS first_us, epoch_us(max(ts)) AS last_us,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_kinds,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS val_sum
         FROM events WHERE user_id % 7 = 3
         GROUP BY user_id""",
    // q53: q26's stepped chain + q21's quantile_cont parity.
    "q53_funnel_latency" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
             FROM events),
         s1 AS (SELECT user_id, min(ts_us) AS t1 FROM e
                WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id, min(e.ts_us) AS t2 FROM e
                JOIN s1 USING (user_id)
                WHERE e.event_type = 'click' AND e.ts_us > s1.t1
                GROUP BY 1),
         s3 AS (SELECT e.user_id, min(e.ts_us) AS t3 FROM e
                JOIN s2 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts_us > s2.t2
                GROUP BY 1),
         conv AS (SELECT s3.t3 - s1.t1 AS dur
                  FROM s3 JOIN s1 USING (user_id))
         SELECT CAST(count(*) AS BIGINT) AS n_converted,
                quantile_cont(dur, 0.25) AS p25_us,
                quantile_cont(dur, 0.5) AS p50_us,
                quantile_cont(dur, 0.75) AS p75_us
         FROM conv""",
    // q52: raw association-rule integers — lift/confidence are the
    // caller's ratios, the engine result stays exact.
    "q52_basket_lift" ->
      """WITH baskets AS (SELECT DISTINCT user_id,
               epoch_us(ts) // 86400000000 AS day, event_type
             FROM events),
         pairs AS (SELECT a.event_type AS ta, b.event_type AS tb,
               CAST(count(*) AS BIGINT) AS n_ab
             FROM baskets a JOIN baskets b
               ON a.user_id = b.user_id AND a.day = b.day
              AND a.event_type < b.event_type
             GROUP BY 1, 2),
         sup AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
                 FROM baskets GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n_baskets
                 FROM (SELECT DISTINCT user_id, day FROM baskets))
         SELECT p.ta, p.tb, sa.n AS n_a, sb.n AS n_b, p.n_ab,
                t.n_baskets
         FROM pairs p JOIN sup sa ON sa.event_type = p.ta
                      JOIN sup sb ON sb.event_type = p.tb
                      CROSS JOIN tot t""",
    // q51: identical lag construction; top-10 with full tie-break.
    "q51_frequent_sequences" ->
      """WITH t AS (SELECT user_id, event_type AS e3,
               lag(event_type, 1) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS e2,
               lag(event_type, 2) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS e1
             FROM events)
         SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
         FROM t WHERE e1 IS NOT NULL
         GROUP BY e1, e2, e3
         ORDER BY n DESC, e1, e2, e3 LIMIT 10""",
    // q49: holding durations from lead(); numerator/denominator as
    // exact integers, the division is the caller's.
    "q49_time_weighted_avg" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id,
               CAST(floor(value * 100) AS BIGINT) AS vc,
               epoch_us(ts) // 86400000000 AS day FROM events),
         w AS (SELECT user_id, day, vc, t,
                 COALESCE(lead(t) OVER (PARTITION BY user_id, day
                     ORDER BY t, event_id),
                   (day + 1) * 86400000000) AS tnext
               FROM e)
         SELECT user_id,
           strftime(DATE '1970-01-01' + CAST(day AS INTEGER),
                    '%Y-%m-%d') AS day,
           CAST(sum(vc * (tnext - t)) AS BIGINT) AS weighted_sum,
           CAST(sum(tnext - t) AS BIGINT) AS dur_us,
           CAST(count(*) AS BIGINT) AS n_obs
         FROM w GROUP BY user_id, day""",
    // st44: q54's journeys maintained online — gap-close emission +
    // open sessions from final state; shared sessionization oracle.
    "st44_stream_session_paths" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id,
               event_type FROM events),
         g AS (SELECT *, CASE WHEN t - lag(t) OVER
                 (PARTITION BY user_id ORDER BY t, event_id)
                 > 1800000000 THEN 1 ELSE 0 END AS brk
               FROM e),
         s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                 ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS sid
               FROM g),
         p AS (SELECT user_id, sid,
                 array_to_string(list_slice(
                   list(event_type ORDER BY t, event_id), 1, 5), '>')
                   AS path
               FROM s GROUP BY user_id, sid)
         SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
         FROM p GROUP BY path
         ORDER BY n_sessions DESC, path LIMIT 10""",
    // st43: q52's association table maintained online — shared
    // oracle; first-arrival-only emission reproduces the distinct
    // basket semantics exactly.
    "st43_stream_basket_lift" ->
      """WITH baskets AS (SELECT DISTINCT user_id,
               epoch_us(ts) // 86400000000 AS day, event_type
             FROM events),
         pairs AS (SELECT a.event_type AS ta, b.event_type AS tb,
               CAST(count(*) AS BIGINT) AS n_ab
             FROM baskets a JOIN baskets b
               ON a.user_id = b.user_id AND a.day = b.day
              AND a.event_type < b.event_type
             GROUP BY 1, 2),
         sup AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
                 FROM baskets GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n_baskets
                 FROM (SELECT DISTINCT user_id, day FROM baskets))
         SELECT p.ta, p.tb, sa.n AS n_a, sb.n AS n_b, p.n_ab,
                t.n_baskets
         FROM pairs p JOIN sup sa ON sa.event_type = p.ta
                      JOIN sup sb ON sb.event_type = p.tb
                      CROSS JOIN tot t""",
    // st42: q51's mining maintained online — shared oracle; per-user
    // order makes each arrival emit exactly the batch window's trigram.
    "st42_stream_sequences" ->
      """WITH t AS (SELECT user_id, event_type AS e3,
               lag(event_type, 1) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS e2,
               lag(event_type, 2) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS e1
             FROM events)
         SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
         FROM t WHERE e1 IS NOT NULL
         GROUP BY e1, e2, e3
         ORDER BY n DESC, e1, e2, e3 LIMIT 10""",
    // st41: q49's meter maintained online — shared oracle; the open
    // tail (last value to midnight) folds at read time.
    "st41_stream_metering" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id,
               CAST(floor(value * 100) AS BIGINT) AS vc,
               epoch_us(ts) // 86400000000 AS day FROM events),
         w AS (SELECT user_id, day, vc, t,
                 COALESCE(lead(t) OVER (PARTITION BY user_id, day
                     ORDER BY t, event_id),
                   (day + 1) * 86400000000) AS tnext
               FROM e)
         SELECT user_id,
           strftime(DATE '1970-01-01' + CAST(day AS INTEGER),
                    '%Y-%m-%d') AS day,
           CAST(sum(vc * (tnext - t)) AS BIGINT) AS weighted_sum,
           CAST(sum(tnext - t) AS BIGINT) AS dur_us,
           CAST(count(*) AS BIGINT) AS n_obs
         FROM w GROUP BY user_id, day""",
    // q50: the oracle runs the INTERVAL-join form the engine avoids —
    // equality proves union+forward-fill ≡ point-in-time join.
    "q50_point_in_time_join" ->
      """WITH dim AS (SELECT user_id, epoch_us(ts) AS t, event_id,
               CAST(floor(value / 100) AS BIGINT) AS tier
             FROM events WHERE event_type = 'purchase'),
         f AS (SELECT user_id, epoch_us(ts) AS t, event_id
               FROM events WHERE event_type = 'click'),
         j AS (SELECT f.user_id, f.event_id,
                 (SELECT d.tier FROM dim d
                  WHERE d.user_id = f.user_id AND d.t <= f.t
                  ORDER BY d.t DESC, d.event_id DESC LIMIT 1) AS tier
               FROM f)
         SELECT COALESCE(tier, -1) AS tier,
           CAST(count(*) AS BIGINT) AS n_clicks,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         FROM j GROUP BY 1""",
    // q47: gaps-and-islands lag form; single-day users report 0.
    "q47_longest_gap" ->
      """WITH active AS (SELECT DISTINCT user_id,
                epoch_us(ts) // 86400000000 AS d FROM events),
         gaps AS (SELECT user_id, d - lag(d) OVER (PARTITION BY user_id
                ORDER BY d) AS gap FROM active)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_active_days,
                CAST(coalesce(max(gap), 0) AS BIGINT) AS longest_gap_days
         FROM gaps GROUP BY user_id""",
    // q46: the oracle IS the declarative recursive form — top-down
    // from the roots (keys < 16), one level per iteration; the engine
    // side reaches the same closure by pointer jumping.
    "q46_hierarchy_flatten" ->
      """WITH RECURSIVE walk(node, root, depth) AS (
           SELECT p_partkey, p_partkey, CAST(0 AS BIGINT)
             FROM part WHERE p_partkey < 16
           UNION ALL
           SELECT p.p_partkey, w.root, w.depth + 1
             FROM part p JOIN walk w
               ON p.p_partkey // 2 = w.node AND p.p_partkey >= 16)
         SELECT root, CAST(count(*) AS BIGINT) AS n_parts,
                CAST(max(depth) AS BIGINT) AS max_depth,
                CAST(sum(node) AS BIGINT) AS key_sum
         FROM walk GROUP BY root""",
    // st39: q45's sweep maintained online — shared construction and
    // oracle; the staged stream is the boundary-point stream.
    "st39_stream_peak_concurrency" ->
      """WITH iv AS (SELECT epoch_us(ts) AS s,
                            epoch_us(ts) + 1800000000 AS e FROM events),
         points AS (
           SELECT s // 86400000000 AS day, s AS t, 1 AS delta FROM iv
           UNION ALL
           SELECT s // 86400000000,
                  LEAST(e, (s // 86400000000 + 1) * 86400000000), -1 FROM iv
           UNION ALL
           SELECT e // 86400000000, (e // 86400000000) * 86400000000, 1
             FROM iv
             WHERE e // 86400000000 > s // 86400000000
               AND e % 86400000000 > 0
           UNION ALL
           SELECT e // 86400000000, e, -1 FROM iv
             WHERE e // 86400000000 > s // 86400000000
               AND e % 86400000000 > 0)
         SELECT strftime(DATE '1970-01-01' + CAST(day AS INTEGER),
                         '%Y-%m-%d') AS day,
                CAST(max(run) AS BIGINT) AS peak_concurrent
         FROM (SELECT day, sum(delta) OVER (PARTITION BY day
                 ORDER BY t, delta ROWS UNBOUNDED PRECEDING) AS run
               FROM points)
         GROUP BY day""",
    // st36: erasure control at 2024-01-16T00; erased users end at
    // count 0 with post-erasure arrivals audited as dropped.
    "st36_stream_forget" ->
      """SELECT user_id,
           CAST(CASE WHEN user_id % 7 = 3 THEN 0
                     ELSE count(*) END AS BIGINT) AS n_events,
           (user_id % 7 = 3) AS erased,
           CAST(CASE WHEN user_id % 7 = 3 THEN
               count(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                          THEN 1 END)
             ELSE 0 END AS BIGINT) AS n_dropped
         FROM events GROUP BY user_id""",
    // c12: Hamilton apportionment — integer quotas + one unit each to
    // the largest remainders; sum(alloc) == budget exactly.
    "c12_mix_alloc" ->
      """WITH s AS (SELECT source AS domain,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS w
           FROM documents GROUP BY source),
         t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM s),
         q AS (SELECT domain, w, (10000 * w) // tw AS quota,
                 (10000 * w) % tw AS rem
               FROM s, t),
         l AS (SELECT 10000 - CAST(sum(quota) AS BIGINT) AS d FROM q)
         SELECT domain, w AS supply,
           CAST(quota + CASE WHEN row_number()
               OVER (ORDER BY rem DESC, domain) <= d
             THEN 1 ELSE 0 END AS BIGINT) AS alloc
         FROM q, l""",
    // s28: majority label of the 10 exact cosine neighbors (votes
    // desc, label asc tie-break) vs the query's own label.
    "s28_knn_classify" ->
      s"""WITH pre AS ($embPreSql),
         lab AS (SELECT vec_id, CAST(label AS BIGINT) AS lbl
                 FROM embeddings),
         s AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
                 CAST((SELECT sum(x*y)
                       FROM (SELECT unnest(q.v) x, unnest(c.v) y)) AS DOUBLE)
                   / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE)))
                   AS cos
               FROM pre q JOIN pre c ON c.vec_id <> q.vec_id
               WHERE q.vec_id < 50),
         r AS (SELECT qid, nid,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY cos DESC, nid) AS rk
               FROM s),
         v AS (SELECT r.qid, l.lbl, CAST(count(*) AS BIGINT) AS votes
               FROM r JOIN lab l ON l.vec_id = r.nid
               WHERE r.rk <= 10 GROUP BY 1, 2),
         p AS (SELECT qid, lbl AS pred FROM (
                 SELECT qid, lbl,
                   row_number() OVER (PARTITION BY qid
                     ORDER BY votes DESC, lbl) AS rr
                 FROM v) WHERE rr = 1)
         SELECT p.qid AS vec_id, lq.lbl AS label, p.pred,
           lq.lbl = p.pred AS correct
         FROM p JOIN lab lq ON lq.vec_id = p.qid""",
    // s32: one scored pass, two argmax windows — hard negative =
    // max-cos different-label, hard positive = min-cos same-label.
    "s32_hard_negatives" ->
      s"""WITH pre AS ($embPreSql),
         lab AS (SELECT vec_id, CAST(label AS BIGINT) AS lbl
                 FROM embeddings),
         s AS (SELECT q.vec_id AS qid, ql.lbl, c.vec_id AS nid,
                 cl.lbl AS nlbl,
                 CAST((SELECT sum(x*y)
                       FROM (SELECT unnest(q.v) x, unnest(c.v) y)) AS DOUBLE)
                   / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE)))
                   AS cos
               FROM pre q JOIN lab ql ON ql.vec_id = q.vec_id
                 JOIN pre c ON c.vec_id <> q.vec_id
                 JOIN lab cl ON cl.vec_id = c.vec_id
               WHERE q.vec_id < 50),
         neg AS (SELECT qid, nid, cos FROM (
                   SELECT qid, nid, cos, row_number() OVER (
                     PARTITION BY qid ORDER BY cos DESC, nid) AS r
                   FROM s WHERE nlbl <> lbl) WHERE r = 1),
         pos AS (SELECT qid, nid, cos FROM (
                   SELECT qid, nid, cos, row_number() OVER (
                     PARTITION BY qid ORDER BY cos ASC, nid) AS r
                   FROM s WHERE nlbl = lbl) WHERE r = 1)
         SELECT n.qid, n.nid AS hard_neg, n.cos AS neg_cos,
           p.nid AS hard_pos, p.cos AS pos_cos,
           p.cos - n.cos AS margin
         FROM neg n JOIN pos p ON p.qid = n.qid""",
    // d25: distinct (source, 3-gram) sets; pair counts from the
    // shared-shingle equi-join, Jaccard from the two set sizes.
    "d25_source_overlap" ->
      """WITH sh AS (SELECT DISTINCT source,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT source, string_split(text, ' ') AS w
                 FROM documents)),
         sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n
                   FROM sh GROUP BY source),
         p AS (SELECT a.source AS src_a, b.source AS src_b,
                 CAST(count(*) AS BIGINT) AS shared_shingles
               FROM sh a JOIN sh b
                 ON b.s = a.s AND a.source < b.source
               GROUP BY 1, 2)
         SELECT p.src_a, p.src_b, p.shared_shingles,
           CAST(p.shared_shingles AS DOUBLE)
             / (sa.n + sb.n - p.shared_shingles) AS jaccard
         FROM p
         JOIN sizes sa ON sa.source = p.src_a
         JOIN sizes sb ON sb.source = p.src_b""",
    // st31: probe-then-append ingest — a doc matches everything
    // strictly BEFORE it (base=0, batch1=1, batch2=2; ord_b < ord_a),
    // never its own batch.
    "st31_stream_neardup_probe" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         h AS (SELECT doc_id, ('0x' || substr(md5(s),1,8))::BIGINT AS hw FROM sh),
         mh AS (SELECT doc_id, j, min(((2*j+1)*hw + j*12345) % 4294967311) AS mv
                FROM h, generate_series(0,15) t(j) GROUP BY doc_id, j),
         bands AS (SELECT doc_id, j//4 AS band,
                     string_agg(mv, ',' ORDER BY j) AS sig
                   FROM mh GROUP BY doc_id, j//4),
         ord AS (SELECT doc_id,
                   CASE WHEN doc_id % 10 <> 7 THEN 0
                        WHEN doc_id % 20 = 7 THEN 1 ELSE 2 END AS o
                 FROM documents),
         cand AS (SELECT DISTINCT a.doc_id AS aid, b.doc_id AS bid
                  FROM bands a
                  JOIN ord oa ON oa.doc_id = a.doc_id AND oa.o > 0
                  JOIN bands b ON b.band = a.band AND b.sig = a.sig
                  JOIN ord ob ON ob.doc_id = b.doc_id AND ob.o < oa.o),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT c.aid, c.bid, count(*) AS c
                   FROM cand c
                   JOIN sh x ON x.doc_id = c.aid
                   JOIN sh y ON y.doc_id = c.bid AND y.s = x.s
                   GROUP BY c.aid, c.bid),
         ver AS (SELECT c.aid,
                   CAST(coalesce(i.c, 0) AS DOUBLE)
                     / (sa.n + sb.n - coalesce(i.c, 0)) AS j
                 FROM cand c
                 LEFT JOIN inter i ON i.aid = c.aid AND i.bid = c.bid
                 JOIN sizes sa ON sa.doc_id = c.aid
                 JOIN sizes sb ON sb.doc_id = c.bid),
         agg AS (SELECT aid, CAST(count(*) AS BIGINT) AS n_matches,
                   max(j) AS max_jaccard
                 FROM ver WHERE j >= 0.5 GROUP BY aid)
         SELECT d.doc_id,
           coalesce(a.n_matches, 0) AS n_matches,
           a.max_jaccard,
           coalesce(a.n_matches, 0) > 0 AS is_dup
         FROM (SELECT DISTINCT doc_id FROM sh WHERE doc_id % 10 = 7) d
         LEFT JOIN agg a ON a.aid = d.doc_id""",
    // Novel-ngram ratio: d02's distinct-shingle shape, ownership =
    // min(doc_id) over the shingle partition (d15's owner window).
    "t21_novelty" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
                    FROM documents),
         g AS (SELECT DISTINCT doc_id,
                 unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
               FROM d),
         m AS (SELECT doc_id, s, min(doc_id) OVER (PARTITION BY s) AS owner
               FROM g)
         SELECT doc_id, count(*) AS n_grams,
           CAST(sum(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS novel_grams,
           CAST(sum(CASE WHEN owner = doc_id THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS novelty_ratio
         FROM m GROUP BY doc_id""",
    // t22: same literal expression tree as Retrieval.bm25 — integer
    // tf/df/dl, exactly-representable k1=1.5 b=0.75, and the
    // portable-ln idf rendered by the SAME PortableMath constants the
    // Spark plan uses (see bm25OracleSql).
    "t22_bm25" -> bm25OracleSql,
    // st20: the streaming symmetric-hash interval join must equal the
    // batch self-join on (user, 1-hour window) bit-for-bit.
    "st20_stream_interval_join" ->
      """WITH v AS (SELECT user_id, event_id, epoch_us(ts) AS t
                    FROM events WHERE event_type = 'view'),
         p AS (SELECT user_id, event_id, epoch_us(ts) AS t
               FROM events WHERE event_type = 'purchase')
         SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
           p.t - v.t AS lag_us
         FROM v JOIN p ON v.user_id = p.user_id
          AND p.t > v.t AND p.t <= v.t + 3600000000""",
    // st23: the MV maintained by native streaming aggregation — the
    // oracle is the batch view over the whole topic.
    "st23_stream_mv" ->
      """SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           CAST(min(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS min_value,
           CAST(max(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS max_value,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS avg_value
         FROM events GROUP BY event_type""",
    // st21: native TTL'd streaming dedup — emitted columns ARE the
    // dedup key, so first-arrival-wins equals batch DISTINCT.
    "st21_stream_dedup_ttl" ->
      """SELECT DISTINCT user_id, event_type,
           epoch_us(date_trunc('hour', ts)) AS hour_us
         FROM events""",
    // t23: conjunctive boolean search — a doc matches iff its count of
    // distinct matched terms equals the query's term count.
    "t23_bool_search" ->
      """WITH qt(qid, term) AS (VALUES
           ('s1','spark'),('s1','join'),('s1','window'),
           ('s2','dup'),('s2','batch'),
           ('s3','the'),('s3','fast'),('s3','key'),('s3','sort')),
         nq AS (SELECT qid, count(DISTINCT term) AS q_n_terms
                FROM qt GROUP BY 1),
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                 FROM documents),
         tf AS (SELECT doc_id, w, count(*) AS tf FROM tok
                WHERE w != '' AND w IN ('spark','join','window','dup',
                                        'batch','the','fast','key','sort')
                GROUP BY 1, 2),
         m AS (SELECT qt.qid, tf.doc_id, count(*) AS n_matched,
                 sum(tf.tf) AS tf_sum
               FROM tf JOIN qt ON tf.w = qt.term GROUP BY 1, 2)
         SELECT m.qid, m.doc_id, m.n_matched,
           CAST(m.tf_sum AS BIGINT) AS tf_sum
         FROM m JOIN nq ON m.qid = nq.qid
         WHERE m.n_matched = nq.q_n_terms""",
    // t24: overlapping 64-token windows every 48 tokens; DuckDB's
    // 1-based inclusive list slice toks[s+1 : s+64] = Spark's
    // slice(toks, s+1, 64); range(0, n, 48) = sequence(0, n-1, 48).
    "t24_chunk" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM documents),
           s AS (SELECT doc_id, toks,
                   unnest(range(0, len(toks), 48)) AS start FROM d)
         SELECT doc_id,
           CAST(start // 48 AS BIGINT) AS chunk_id,
           CAST(len(toks[start + 1 : start + 64]) AS BIGINT) AS n_tokens,
           array_to_string(toks[start + 1 : start + 64], ' ') AS chunk_text
         FROM s""",
    // q34: ANALYZE-class profile; min/max canonicalized to VARCHAR on
    // both engines so every column type shares one output schema.
    "q34_profile" ->
      """WITH p AS (SELECT count(*) AS n_rows FROM lineitem),
         v AS (
           SELECT 'l_orderkey' AS col_name, count(l_orderkey) AS n_nonnull,
             count(DISTINCT l_orderkey) AS ndv,
             CAST(min(l_orderkey) AS VARCHAR) AS min_val,
             CAST(max(l_orderkey) AS VARCHAR) AS max_val FROM lineitem
           UNION ALL
           SELECT 'l_quantity', count(l_quantity),
             count(DISTINCT l_quantity),
             CAST(min(l_quantity) AS VARCHAR),
             CAST(max(l_quantity) AS VARCHAR) FROM lineitem
           UNION ALL
           SELECT 'l_extendedprice', count(l_extendedprice),
             count(DISTINCT l_extendedprice),
             CAST(min(l_extendedprice) AS VARCHAR),
             CAST(max(l_extendedprice) AS VARCHAR) FROM lineitem
           UNION ALL
           SELECT 'l_returnflag', count(l_returnflag),
             count(DISTINCT l_returnflag),
             CAST(min(l_returnflag) AS VARCHAR),
             CAST(max(l_returnflag) AS VARCHAR) FROM lineitem
           UNION ALL
           SELECT 'l_linestatus', count(l_linestatus),
             count(DISTINCT l_linestatus),
             CAST(min(l_linestatus) AS VARCHAR),
             CAST(max(l_linestatus) AS VARCHAR) FROM lineitem)
         SELECT v.col_name, v.n_nonnull, v.ndv, v.min_val, v.max_val,
           p.n_rows
         FROM v, p""",
    // q35: theta/KMV set algebra — the oracle rebuilds the identical
    // md5-hash sketches, takes theta = min of the pair's thresholds,
    // and computes every estimate as sample-count * 2^32 / theta, so
    // hash-equality proves the sketch REGISTERS and the set-algebra
    // arithmetic, not just the exact ride-along counts.
    "q35_kmv_setops" ->
      """WITH el AS (SELECT DISTINCT event_type AS s,
                       CAST(user_id AS VARCHAR) AS e FROM events),
         hs AS (SELECT DISTINCT s,
                  ('0x' || substr(md5(e),1,8))::BIGINT AS hw FROM el),
         nh AS (SELECT s, count(*) AS n_hashes FROM hs GROUP BY s),
         ranked AS (SELECT s, hw,
                      row_number() OVER (PARTITION BY s ORDER BY hw) AS rn
                    FROM hs),
         mins AS (SELECT s, hw FROM ranked WHERE rn <= 64),
         meta AS (SELECT k.s,
                    CASE WHEN n.n_hashes >= 64 THEN k.kth
                         ELSE 4294967296 END AS theta
                  FROM (SELECT s, max(hw) AS kth FROM mins GROUP BY s) k
                  JOIN nh n ON n.s = k.s),
         ex AS (SELECT s, count(*) AS n_exact FROM el GROUP BY s),
         pairs AS (SELECT a.s AS sa, b.s AS sb,
                     least(a.theta, b.theta) AS theta
                   FROM meta a JOIN meta b ON a.s < b.s),
         asamp AS (SELECT p.sa, p.sb, count(*) AS a_sample
                   FROM pairs p JOIN mins m
                     ON m.s = p.sa AND m.hw < p.theta GROUP BY 1, 2),
         bsamp AS (SELECT p.sa, p.sb, count(*) AS b_sample
                   FROM pairs p JOIN mins m
                     ON m.s = p.sb AND m.hw < p.theta GROUP BY 1, 2),
         isamp AS (SELECT p.sa, p.sb, count(*) AS inter_sample
                   FROM pairs p
                   JOIN mins x ON x.s = p.sa AND x.hw < p.theta
                   JOIN mins y ON y.s = p.sb AND y.hw = x.hw
                   GROUP BY 1, 2),
         iex AS (SELECT a.s AS sa, b.s AS sb, count(*) AS inter_exact
                 FROM el a JOIN el b ON b.e = a.e AND a.s < b.s
                 GROUP BY 1, 2)
         SELECT p.sa AS type_a, p.sb AS type_b,
           ea.n_exact AS n_a_exact, eb.n_exact AS n_b_exact,
           COALESCE(ie.inter_exact, 0) AS inter_exact, p.theta,
           a.a_sample, b.b_sample,
           COALESCE(i.inter_sample, 0) AS inter_sample,
           CAST(a.a_sample AS DOUBLE) * 4294967296.0
             / CAST(p.theta AS DOUBLE) AS est_a,
           CAST(b.b_sample AS DOUBLE) * 4294967296.0
             / CAST(p.theta AS DOUBLE) AS est_b,
           CAST(COALESCE(i.inter_sample, 0) AS DOUBLE) * 4294967296.0
             / CAST(p.theta AS DOUBLE) AS est_inter,
           CAST(a.a_sample + b.b_sample - COALESCE(i.inter_sample, 0)
             AS DOUBLE) * 4294967296.0
             / CAST(p.theta AS DOUBLE) AS est_union,
           CAST(a.a_sample - COALESCE(i.inter_sample, 0) AS DOUBLE)
             * 4294967296.0 / CAST(p.theta AS DOUBLE) AS est_diff_ab
         FROM pairs p
         JOIN ex ea ON ea.s = p.sa
         JOIN ex eb ON eb.s = p.sb
         LEFT JOIN iex ie ON ie.sa = p.sa AND ie.sb = p.sb
         JOIN asamp a ON a.sa = p.sa AND a.sb = p.sb
         JOIN bsamp b ON b.sa = p.sa AND b.sb = p.sb
         LEFT JOIN isamp i ON i.sa = p.sa AND i.sb = p.sb""",
    "q19_cube" ->
      """SELECT c_mktsegment, n_regionkey, count(*) AS cnt,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY CUBE (c_mktsegment, n_regionkey)""",
    "q20_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           count(*) AS cnt
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                 (l_returnflag), ())""",
    // Exact interpolated quartiles: quantities are integer-valued doubles
    // and the 2^-k fractions keep lo + (hi-lo)*frac exact IEEE in both
    // engines (same type-7 linear interpolation definition).
    "q21_percentiles" ->
      """SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.5) AS p50,
           quantile_cont(l_quantity, 0.75) AS p75,
           count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag""",
    // The exact columns are DISCRETE (rank-selected elements — the
    // value at rank ceil(q·n) is tie-order-independent); the booleans
    // restate the sketch's guarantee, which Spark's side MEASURES
    // against its actual approx_percentile output.
    "q29_approx_percentiles" ->
      """WITH ranked AS (
           SELECT l_returnflag, l_extendedprice AS x,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice) AS rk,
             count(*) OVER (PARTITION BY l_returnflag) AS n
           FROM lineitem)
         SELECT l_returnflag, CAST(max(n) AS BIGINT) AS cnt,
           max(CASE WHEN rk = CAST(ceil(0.5 * n) AS BIGINT) THEN x END)
             AS exact_p50,
           max(CASE WHEN rk = CAST(ceil(0.95 * n) AS BIGINT) THEN x END)
             AS exact_p95,
           TRUE AS p50_ok, TRUE AS p95_ok
         FROM ranked GROUP BY l_returnflag""",
    // Sketch registers aren't cross-engine comparable; the oracle pins
    // the exact count, the merged-partial count, and the accuracy
    // contract Spark measures (q29's estimator-audit shape).
    "q30_hll_distinct" ->
      """SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           CAST(count(DISTINCT user_id % 8) AS BIGINT) AS n_partials,
           TRUE AS hll_ok
         FROM events GROUP BY event_type""",
    // The oracle spells the range join whose bounded fan-out form the
    // Spark plan deliberately uses instead.
    "q31_sliding_distinct" ->
      """WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id
                     FROM events),
         dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
                 FROM du GROUP BY day),
         w AS (SELECT DISTINCT d.day AS day, u.user_id
               FROM (SELECT DISTINCT day FROM du) d
               JOIN du u ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day),
         wau AS (SELECT day, CAST(count(*) AS BIGINT) AS wau7
                 FROM w GROUP BY day)
         SELECT strftime(a.day, '%Y-%m-%d') AS day, a.dau, w.wau7,
           CAST(a.dau AS DOUBLE) / CAST(w.wau7 AS DOUBLE) AS stickiness
         FROM dau a JOIN wau w ON a.day = w.day""",
    // q32: gaps-and-islands SCD2 — lag flags tier changes, a running
    // sum numbers runs, runs roll up to validity intervals. st22 is
    // the keyed-state CDC-apply twin and shares the oracle verbatim.
    "q32_scd2" -> scd2OracleSql,
    "st22_stream_scd2" -> scd2OracleSql,
    // q33: the oracle is the FULL recompute — hash-equality proves the
    // partial-aggregate merge is exactly refresh-from-delta ≡ rescan.
    "q33_mv_merge" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
             AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             AS sum_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS avg_price,
           min(l_shipdate) AS min_ship,
           max(l_shipdate) AS max_ship,
           count(*) AS count_order
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus""",
    // The plain join — salting on the Spark side must be invisible.
    "q18_salted_join" ->
      """SELECT n_name, count(*) AS cnt
         FROM events JOIN nation ON user_id % 3 = n_nationkey
         GROUP BY n_name""",
    "d01_dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS cnt
         FROM documents GROUP BY md5(text)""",
    // d21: snapshot CDF — same deterministic old/new carving as the
    // Spark side; status from the fingerprint full outer join.
    "d21_snapshot_diff" ->
      """WITH old AS (
           SELECT doc_id, md5(text) AS fp
           FROM documents WHERE doc_id % 5 <> 0),
         nw AS (
           SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN md5(text || ' v2')
                  ELSE md5(text) END AS fp
           FROM documents WHERE doc_id % 7 <> 0)
         SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.fp IS NULL THEN 'added'
                WHEN n.fp IS NULL THEN 'removed'
                WHEN o.fp <> n.fp THEN 'changed'
                ELSE 'unchanged' END AS status
         FROM old o FULL OUTER JOIN nw n ON n.doc_id = o.doc_id""",
    // Streaming twin of d01: first-seen == min(doc_id) because messages
    // are timestamped by doc_id and applied in timestamp order.
    "st08_stream_dedup" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS cnt
         FROM documents GROUP BY md5(text)""",
    "d02_minhash_lsh" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         h AS (SELECT doc_id, ('0x' || substr(md5(s),1,8))::BIGINT AS hw FROM sh),
         mh AS (SELECT doc_id, j, min(((2*j+1)*hw + j*12345) % 4294967311) AS mv
                FROM h, generate_series(0,15) t(j) GROUP BY doc_id, j),
         bands AS (SELECT doc_id, j//4 AS band,
                     string_agg(mv, ',' ORDER BY j) AS sig
                   FROM mh GROUP BY doc_id, j//4)
         SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id""",
    // Keep policy over d07's clusters: longest member wins, ties to
    // the smaller doc_id — d07's recursive CTE + an arg-max window.
    "d18_keep_best" ->
      """WITH RECURSIVE sh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         h AS (SELECT doc_id, ('0x' || substr(md5(s),1,8))::BIGINT AS hw FROM sh),
         mh AS (SELECT doc_id, j, min(((2*j+1)*hw + j*12345) % 4294967311) AS mv
                FROM h, generate_series(0,15) t(j) GROUP BY doc_id, j),
         bands AS (SELECT doc_id, j//4 AS band,
                     string_agg(mv, ',' ORDER BY j) AS sig
                   FROM mh GROUP BY doc_id, j//4),
         pairs AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
                   FROM bands a JOIN bands b
                     ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         edges AS (SELECT da AS src, db AS dst FROM pairs
                   UNION ALL SELECT db, da FROM pairs),
         walk(id, lbl) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.dst, w.lbl FROM walk w JOIN edges e ON w.id = e.src),
         cl AS (SELECT id AS doc_id, min(lbl) AS cluster FROM walk GROUP BY id),
         j AS (SELECT cl.cluster, cl.doc_id, d.n_chars
               FROM cl JOIN documents d USING (doc_id))
         SELECT cluster, CAST(n_members AS BIGINT) AS n_members,
           doc_id AS keep_id, n_chars AS keep_chars FROM (
           SELECT cluster, doc_id, n_chars,
             count(*) OVER (PARTITION BY cluster) AS n_members,
             row_number() OVER (PARTITION BY cluster
               ORDER BY n_chars DESC, doc_id) AS rn
           FROM j) WHERE rn = 1""",
    // Pair-set overlap of the two independent near-dup detectors; the
    // MinHash branch is d02's oracle, the SimHash branch d06's.
    "d17_dedup_agreement" ->
      s"""WITH mpairs AS (
           WITH sh AS (
             SELECT DISTINCT doc_id,
               unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
           h AS (SELECT doc_id, ('0x' || substr(md5(s),1,8))::BIGINT AS hw FROM sh),
           mh AS (SELECT doc_id, j, min(((2*j+1)*hw + j*12345) % 4294967311) AS mv
                  FROM h, generate_series(0,15) t(j) GROUP BY doc_id, j),
           bands AS (SELECT doc_id, j//4 AS band,
                       string_agg(mv, ',' ORDER BY j) AS sig
                     FROM mh GROUP BY doc_id, j//4)
           SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         spairs AS (SELECT da, db FROM ($simhashPairsOracleSql)),
         j AS (SELECT
             CASE WHEN m.da IS NOT NULL THEN 1 ELSE 0 END AS mh,
             CASE WHEN s.da IS NOT NULL THEN 1 ELSE 0 END AS sh
           FROM mpairs m FULL JOIN spairs s
             ON m.da = s.da AND m.db = s.db)
         SELECT CAST(sum(mh) AS BIGINT) AS n_minhash,
           CAST(sum(sh) AS BIGINT) AS n_simhash,
           CAST(sum(mh*sh) AS BIGINT) AS n_both,
           CAST(sum(mh*sh) AS DOUBLE)
             / CAST(sum(mh) + sum(sh) - sum(mh*sh) AS DOUBLE)
             AS pair_jaccard
         FROM j""",
    // Connected components over d02's candidate pairs via transitive
    // closure: walk(x, l) = "l reaches x"; cluster = min reachable id.
    // Docs in no pair keep their own id (singleton clusters).
    "d07_dedup_clusters" ->
      s"""$clusterChainSql
         SELECT id AS doc_id, min(lbl) AS cluster FROM walk GROUP BY id""",
    // t32: d07's cluster table rolled up by split = cluster % 10 —
    // near-dups can never straddle a split by construction.
    "t32_cluster_split" ->
      s"""$clusterChainSql,
         clus AS (SELECT id AS doc_id, min(lbl) AS cluster
                  FROM walk GROUP BY id)
         SELECT cluster % 10 AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
         FROM clus GROUP BY 1""",
    // Streaming twin of the LSH bucket-membership verdict: owner of a
    // bucket = min(doc_id) (first-seen in doc_id-timestamped order);
    // a doc is a near-dup candidate iff any of its 4 band buckets has
    // an earlier owner, dup_of = the smallest such owner.
    "st10_stream_neardup" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         h AS (SELECT doc_id, ('0x' || substr(md5(s),1,8))::BIGINT AS hw FROM sh),
         mh AS (SELECT doc_id, j, min(((2*j+1)*hw + j*12345) % 4294967311) AS mv
                FROM h, generate_series(0,15) t(j) GROUP BY doc_id, j),
         bands AS (SELECT doc_id, j//4 AS band,
                     string_agg(mv, ',' ORDER BY j) AS sig
                   FROM mh GROUP BY doc_id, j//4),
         own AS (SELECT band, sig, min(doc_id) AS owner
                 FROM bands GROUP BY band, sig),
         mo AS (SELECT b.doc_id, min(o.owner) AS own
                FROM bands b JOIN own o
                  ON b.band = o.band AND b.sig = o.sig
                GROUP BY b.doc_id)
         SELECT doc_id,
           CASE WHEN own < doc_id THEN own END AS dup_of,
           own < doc_id AS dup
         FROM mo""",
    // Streaming twin of d09: identical decontamination arithmetic —
    // the stream folds per-doc (n, hits) against the replicated bench
    // shingle set, so the final state equals the batch join's counts.
    "st12_stream_curate" ->
      """WITH gated AS (
           SELECT doc_id, text FROM documents
           WHERE source <> 'src0'
             AND len(string_split(text, ' ')) >= 50
             AND len(string_split(text, ' ')) <= 100000
             AND CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 3.0
             AND CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE) <= 10.0
             AND CAST(len(list_filter(string_split(text, ' '),
                 w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
               >= CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.8
             AND len(list_distinct(list_filter(string_split(lower(text), ' '),
                 w -> w IN ('the','be','to','of','and','that','have','with'))))
               >= 1),
         kept AS (
           SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)),
         sh AS (
           SELECT DISTINCT doc_id, source,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, source, string_split(text, ' ') AS w
                 FROM documents)),
         bench AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),
         tr AS (SELECT sh.doc_id, s FROM sh
                JOIN kept k ON sh.doc_id = k.doc_id),
         sizes AS (SELECT doc_id, count(*) AS n FROM tr GROUP BY doc_id),
         hits AS (SELECT tr.doc_id, count(*) AS c FROM tr
                  JOIN bench ON tr.s = bench.s GROUP BY tr.doc_id)
         SELECT sz.doc_id, CAST(sz.n AS BIGINT) AS n_shingles,
           CAST(coalesce(h.c, 0) AS BIGINT) AS n_shared,
           CAST(coalesce(h.c, 0) AS DOUBLE) / CAST(sz.n AS DOUBLE)
             AS contam_ratio,
           CAST(coalesce(h.c, 0) AS DOUBLE) / CAST(sz.n AS DOUBLE) >= 0.5
             AS contaminated
         FROM sizes sz LEFT JOIN hits h ON sz.doc_id = h.doc_id""",
    "st11_stream_decontam" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id, source,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, source, string_split(text, ' ') AS w
                 FROM documents)),
         bench AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),
         tr AS (SELECT doc_id, s FROM sh WHERE source <> 'src0'),
         sizes AS (SELECT doc_id, count(*) AS n FROM tr GROUP BY doc_id),
         hits AS (SELECT tr.doc_id, count(*) AS c FROM tr
                  JOIN bench ON tr.s = bench.s GROUP BY tr.doc_id)
         SELECT sz.doc_id, CAST(sz.n AS BIGINT) AS n_shingles,
           CAST(coalesce(h.c, 0) AS BIGINT) AS n_shared,
           CAST(coalesce(h.c, 0) AS DOUBLE) / CAST(sz.n AS DOUBLE)
             AS contam_ratio,
           CAST(coalesce(h.c, 0) AS DOUBLE) / CAST(sz.n AS DOUBLE) >= 0.5
             AS contaminated
         FROM sizes sz LEFT JOIN hits h ON sz.doc_id = h.doc_id""",
    "d03_simhash" -> simhashOracleSql,
    "d06_simhash_pairs" -> simhashPairsOracleSql,
    // Mirrors Dedup.jaccardPairs incl. the skew cap: shingles in > 100
    // docs are dropped before pairing; sizes stay uncapped.
    "d04_ngram_jaccard" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         df AS (SELECT s, count(*) AS c FROM sh GROUP BY s),
         shf AS (SELECT sh.doc_id, sh.s FROM sh
                 JOIN df ON sh.s = df.s WHERE df.c <= 100),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
                   FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY a.doc_id, b.doc_id)
         SELECT da, db, jaccard FROM (
           SELECT da, db, CAST(c AS DOUBLE)/(sa.n + sb.n - c) AS jaccard
           FROM inter JOIN sizes sa ON da = sa.doc_id
                      JOIN sizes sb ON db = sb.doc_id)
         WHERE jaccard >= 0.8""",
    "d05_embed_neardup" ->
      s"""WITH pre AS ($embPreSql)
         SELECT va, vb, cos FROM (
           SELECT a.vec_id AS va, b.vec_id AS vb,
             CAST((SELECT sum(x*y) FROM (SELECT unnest(a.v) x, unnest(b.v) y)) AS DOUBLE)
               / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos
           FROM pre a JOIN pre b ON a.vec_id < b.vec_id)
         WHERE cos >= 0.45""",
    // d05 pruned to same-LSH-bucket pairs (4 md5 hyperplanes): the
    // bucketing is the recall/cost dial and is itself deterministic.
    "d08_embed_neardup_lsh" ->
      s"""WITH pre AS ($embPreSql),
         planes AS (
           SELECT p, d,
             ('0x' || substr(md5(p::VARCHAR || '_' || d::VARCHAR),1,8))::BIGINT
               - 2147483648 AS coef
           FROM generate_series(0,3) tp(p), generate_series(0,63) td(d)),
         buckets AS (
           SELECT vec_id,
             sum(CASE WHEN dot >= 0 THEN (1::BIGINT << p) ELSE 0 END) AS bucket
           FROM (SELECT pr.vec_id, pl.p, sum(pr.v[pl.d+1] * pl.coef) AS dot
                 FROM pre pr, planes pl GROUP BY pr.vec_id, pl.p)
           GROUP BY vec_id)
         SELECT va, vb, cos FROM (
           SELECT a.vec_id AS va, b.vec_id AS vb,
             CAST((SELECT sum(x*y) FROM (SELECT unnest(ap.v) x, unnest(bp.v) y)) AS DOUBLE)
               / (sqrt(CAST(ap.n2 AS DOUBLE)) * sqrt(CAST(bp.n2 AS DOUBLE))) AS cos
           FROM buckets a JOIN buckets b
             ON a.bucket = b.bucket AND a.vec_id < b.vec_id
             JOIN pre ap ON ap.vec_id = a.vec_id
             JOIN pre bp ON bp.vec_id = b.vec_id)
         WHERE cos >= 0.45""",
    "s01_ann_topk" ->
      s"""WITH pre AS ($embPreSql),
         sims AS (
           SELECT q.vec_id AS qid, c.vec_id AS nid,
             CAST((SELECT sum(x*y) FROM (SELECT unnest(q.v) x, unnest(c.v) y)) AS DOUBLE)
               / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) AS cos
           FROM pre q JOIN pre c ON c.vec_id <> q.vec_id
           WHERE q.vec_id < 10)
         SELECT qid, nid, cos, rank FROM (
           SELECT qid, nid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
           FROM sims)
         WHERE rank <= 10""",
    // s22: s01 restricted to neighbors sharing the query's label — the
    // filtered-search mode; equality on label joins pre to itself.
    "s22_filtered_ann" ->
      """WITH pre AS (
           SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS v,
             (SELECT sum(e*e) FROM unnest(
               list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT))) t(e))
               AS n2
           FROM embeddings),
         sims AS (
           SELECT q.vec_id AS qid, q.label AS lbl, c.vec_id AS nid,
             CAST((SELECT sum(x*y) FROM (SELECT unnest(q.v) x, unnest(c.v) y)) AS DOUBLE)
               / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) AS cos
           FROM pre q JOIN pre c
             ON c.label = q.label AND c.vec_id <> q.vec_id
           WHERE q.vec_id < 10)
         SELECT qid, lbl, nid, cos, rank FROM (
           SELECT qid, lbl, nid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
           FROM sims)
         WHERE rank <= 10""",
    // s24: RRF hybrid — t22's BM25 list (nested CTE, verbatim) full-
    // outer-joined with the pinned-vector MIPS list; fixed-order
    // two-term reciprocal sum, re-ranked.
    "s24_hybrid_rrf" ->
      s"""WITH sparse AS (${bm25OracleSql}),
         pre AS ($embPreSql),
         qmap(bqid, vid) AS (VALUES ('b1', 1), ('b2', 2), ('b3', 3)),
         dd AS (
           SELECT qmap.bqid AS qid, c.vec_id AS doc_id,
             CAST((SELECT sum(x*y)
               FROM (SELECT unnest(q.v) x, unnest(c.v) y)) AS BIGINT)
               AS dot
           FROM qmap JOIN pre q ON q.vec_id = qmap.vid, pre c
           WHERE c.vec_id <> qmap.vid),
         dense AS (
           SELECT qid, doc_id, rank FROM (
             SELECT qid, doc_id,
               row_number() OVER (PARTITION BY qid
                 ORDER BY dot DESC, doc_id) AS rank
             FROM dd)
           WHERE rank <= 10),
         fused AS (
           SELECT coalesce(s.qid, d.qid) AS qid,
             coalesce(s.doc_id, d.doc_id) AS doc_id,
             coalesce(1.0/(60.0 + CAST(s.rank AS DOUBLE)), 0.0)
               + coalesce(1.0/(60.0 + CAST(d.rank AS DOUBLE)), 0.0)
               AS rrf
           FROM (SELECT qid, doc_id, rank FROM sparse) s
           FULL OUTER JOIN dense d
             ON d.qid = s.qid AND d.doc_id = s.doc_id)
         SELECT qid, doc_id, rrf, rank FROM (
           SELECT qid, doc_id, rrf,
             row_number() OVER (PARTITION BY qid
               ORDER BY rrf DESC, doc_id) AS rank
           FROM fused)
         WHERE rank <= 10""",
    // s23: integer MaxSim — per (doc-bag, query-vector) best inner
    // product, summed per bag; all int64, so ranking is exact.
    "s23_maxsim" ->
      """WITH pre AS (
           SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS v
           FROM embeddings),
         q AS (SELECT vec_id, v FROM pre WHERE vec_id < 5),
         best AS (
           SELECT c.label AS lbl, q.vec_id AS qid,
             max(CAST((SELECT sum(x*y)
               FROM (SELECT unnest(q.v) x, unnest(c.v) y)) AS BIGINT))
               AS best
           FROM q, pre c GROUP BY 1, 2),
         scores AS (
           SELECT lbl, CAST(sum(best) AS BIGINT) AS score
           FROM best GROUP BY lbl)
         SELECT lbl, score, rank FROM (
           SELECT lbl, score,
             row_number() OVER (ORDER BY score DESC, lbl) AS rank
           FROM scores)
         WHERE rank <= 5""",
    // Recall of the quantized paths vs exact top-10: the three branch
    // CTEs are s01's, s15's and s16's pair sets verbatim.
    "s18_quant_recall" ->
      s"""WITH pre AS ($embPreSql),
         exd AS (
           SELECT q.vec_id AS qid, c.vec_id AS nid,
             CAST((SELECT sum(x*y) FROM (SELECT unnest(q.v) x, unnest(c.v) y)) AS DOUBLE)
               / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) AS cos
           FROM pre q JOIN pre c ON c.vec_id <> q.vec_id
           WHERE q.vec_id < 10),
         ex AS (SELECT qid, nid FROM (
             SELECT qid, nid,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rk
             FROM exd) WHERE rk <= 10),
         qt AS (SELECT vec_id, v,
                  (SELECT max(abs(e)) FROM unnest(v) t(e)) AS amax
                FROM pre),
         qq AS (SELECT vec_id,
                  CASE WHEN amax > 0 THEN list_transform(v,
                      x -> CAST(floor(CAST(x*127 AS DOUBLE)
                             / CAST(amax AS DOUBLE)) AS BIGINT))
                    ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
                FROM qt),
         qn AS (SELECT vec_id, q,
                  CAST((SELECT sum(e*e) FROM unnest(q) t(e)) AS BIGINT)
                    AS qn2
                FROM qq),
         sqd AS (
           SELECT a.vec_id AS qid, b.vec_id AS nid,
             CAST((SELECT sum(x*y)
                   FROM (SELECT unnest(a.q) x, unnest(b.q) y)) AS DOUBLE)
               / (sqrt(CAST(a.qn2 AS DOUBLE)) * sqrt(CAST(b.qn2 AS DOUBLE)))
               AS cos
           FROM qn a JOIN qn b ON b.vec_id <> a.vec_id
           WHERE a.vec_id < 10),
         sq AS (SELECT qid, nid FROM (
             SELECT qid, nid,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rk
             FROM sqd) WHERE rk <= 10),
         planes AS (
           SELECT p, d,
             ('0x' || substr(md5(p::VARCHAR || '_' || d::VARCHAR),1,8))::BIGINT
               - 2147483648 AS coef
           FROM generate_series(0,47) tp(p), generate_series(0,63) td(d)),
         sigs AS (
           SELECT vec_id,
             sum(CASE WHEN dot >= 0 THEN (1::BIGINT << p) ELSE 0 END) AS sig
           FROM (SELECT pr.vec_id, pl.p, sum(pr.v[pl.d+1] * pl.coef) AS dot
                 FROM pre pr, planes pl GROUP BY pr.vec_id, pl.p)
           GROUP BY vec_id),
         hmd AS (
           SELECT q.vec_id AS qid, c.vec_id AS nid,
             bit_count(xor(q.sig, c.sig)) AS dist
           FROM sigs q JOIN sigs c ON c.vec_id <> q.vec_id
           WHERE q.vec_id < 10),
         hm AS (SELECT qid, nid FROM (
             SELECT qid, nid,
               row_number() OVER (PARTITION BY qid ORDER BY dist, nid) AS rk
             FROM hmd) WHERE rk <= 10)
         SELECT ex.qid, CAST(count(*) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN sq.nid IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS sq8_hits,
           CAST(sum(CASE WHEN hm.nid IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS ham_hits,
           CAST(sum(CASE WHEN sq.nid IS NOT NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / 10.0 AS sq8_recall,
           CAST(sum(CASE WHEN hm.nid IS NOT NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / 10.0 AS ham_recall
         FROM ex LEFT JOIN sq ON ex.qid = sq.qid AND ex.nid = sq.nid
                 LEFT JOIN hm ON ex.qid = hm.qid AND ex.nid = hm.nid
         GROUP BY ex.qid""",
    // The k-NN graph: s02's bucket construction + 1-bit probe set,
    // every vector a query, 5 best-effort edges per node.
    "s17_knn_graph" ->
      s"""WITH pre AS ($embPreSql),
         planes AS (
           SELECT p, d,
             ('0x' || substr(md5(p::VARCHAR || '_' || d::VARCHAR),1,8))::BIGINT
               - 2147483648 AS coef
           FROM generate_series(0,7) tp(p), generate_series(0,63) td(d)),
         buckets AS (
           SELECT vec_id,
             sum(CASE WHEN dot >= 0 THEN (1::BIGINT << p) ELSE 0 END) AS bucket
           FROM (SELECT pr.vec_id, pl.p, sum(pr.v[pl.d+1] * pl.coef) AS dot
                 FROM pre pr, planes pl GROUP BY pr.vec_id, pl.p)
           GROUP BY vec_id),
         sims AS (
           SELECT q.vec_id AS qid, c.vec_id AS nid,
             CAST((SELECT sum(x*y) FROM (SELECT unnest(qp.v) x, unnest(cp.v) y)) AS DOUBLE)
               / (sqrt(CAST(qp.n2 AS DOUBLE)) * sqrt(CAST(cp.n2 AS DOUBLE))) AS cos
           FROM buckets q JOIN buckets c
             ON bit_count(xor(q.bucket, c.bucket)) <= 1
               AND c.vec_id <> q.vec_id
             JOIN pre qp ON qp.vec_id = q.vec_id
             JOIN pre cp ON cp.vec_id = c.vec_id)
         SELECT qid, nid, cos, rank FROM (
           SELECT qid, nid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
           FROM sims)
         WHERE rank <= 5""",
    // NN-descent round over s17's graph: symmetrize (forward+reverse
    // lists), neighbor-of-neighbor expansion, exact rerank to top-5;
    // recall of raw vs refined against the exact top-5 on 25 sampled
    // query nodes. UNION (not UNION ALL) mirrors Spark's distinct().
    "s19_knn_refine" ->
      s"""WITH pre AS ($embPreSql),
         planes AS (
           SELECT p, d,
             ('0x' || substr(md5(p::VARCHAR || '_' || d::VARCHAR),1,8))::BIGINT
               - 2147483648 AS coef
           FROM generate_series(0,7) tp(p), generate_series(0,63) td(d)),
         buckets AS (
           SELECT vec_id,
             sum(CASE WHEN dot >= 0 THEN (1::BIGINT << p) ELSE 0 END) AS bucket
           FROM (SELECT pr.vec_id, pl.p, sum(pr.v[pl.d+1] * pl.coef) AS dot
                 FROM pre pr, planes pl GROUP BY pr.vec_id, pl.p)
           GROUP BY vec_id),
         sims AS (
           SELECT q.vec_id AS qid, c.vec_id AS nid,
             CAST((SELECT sum(x*y) FROM (SELECT unnest(qp.v) x, unnest(cp.v) y)) AS DOUBLE)
               / (sqrt(CAST(qp.n2 AS DOUBLE)) * sqrt(CAST(cp.n2 AS DOUBLE))) AS cos
           FROM buckets q JOIN buckets c
             ON bit_count(xor(q.bucket, c.bucket)) <= 1
               AND c.vec_id <> q.vec_id
             JOIN pre qp ON qp.vec_id = q.vec_id
             JOIN pre cp ON cp.vec_id = c.vec_id),
         raw AS (
           SELECT qid, nid FROM (
             SELECT qid, nid,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
             FROM sims)
           WHERE rank <= 5),
         sym AS (
           SELECT qid, nid FROM raw
           UNION
           SELECT nid AS qid, qid AS nid FROM raw),
         cand AS (
           SELECT qid, nid FROM sym
           UNION
           SELECT a.qid AS qid, b.nid AS nid
           FROM sym a JOIN sym b ON a.nid = b.qid
           WHERE a.qid <> b.nid),
         scored AS (
           SELECT c.qid, c.nid,
             CAST((SELECT sum(x*y) FROM (SELECT unnest(qp.v) x, unnest(np.v) y)) AS DOUBLE)
               / (sqrt(CAST(qp.n2 AS DOUBLE)) * sqrt(CAST(np.n2 AS DOUBLE))) AS cos
           FROM cand c JOIN pre qp ON qp.vec_id = c.qid
             JOIN pre np ON np.vec_id = c.nid),
         refined AS (
           SELECT qid, nid FROM (
             SELECT qid, nid,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
             FROM scored)
           WHERE rank <= 5),
         exd AS (
           SELECT q.vec_id AS qid, c.vec_id AS nid,
             CAST((SELECT sum(x*y) FROM (SELECT unnest(q.v) x, unnest(c.v) y)) AS DOUBLE)
               / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) AS cos
           FROM pre q JOIN pre c ON c.vec_id <> q.vec_id
           WHERE q.vec_id < 25),
         ex AS (
           SELECT qid, nid FROM (
             SELECT qid, nid,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
             FROM exd)
           WHERE rank <= 5)
         SELECT ex.qid, CAST(count(*) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN r.nid IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS raw_hits,
           CAST(sum(CASE WHEN f.nid IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS refined_hits,
           CAST(sum(CASE WHEN r.nid IS NOT NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / 5.0 AS raw_recall,
           CAST(sum(CASE WHEN f.nid IS NOT NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / 5.0 AS refined_recall
         FROM ex LEFT JOIN raw r ON ex.qid = r.qid AND ex.nid = r.nid
                 LEFT JOIN refined f ON ex.qid = f.qid AND ex.nid = f.nid
         GROUP BY ex.qid""",
    // Binary signatures: s02's 48-plane sign construction packed into
    // one BIGINT; ranking by bit_count(xor), ties (dist, nid) asc.
    "s16_ann_hamming" ->
      s"""WITH pre AS ($embPreSql),
         planes AS (
           SELECT p, d,
             ('0x' || substr(md5(p::VARCHAR || '_' || d::VARCHAR),1,8))::BIGINT
               - 2147483648 AS coef
           FROM generate_series(0,47) tp(p), generate_series(0,63) td(d)),
         sigs AS (
           SELECT vec_id,
             sum(CASE WHEN dot >= 0 THEN (1::BIGINT << p) ELSE 0 END) AS sig
           FROM (SELECT pr.vec_id, pl.p, sum(pr.v[pl.d+1] * pl.coef) AS dot
                 FROM pre pr, planes pl GROUP BY pr.vec_id, pl.p)
           GROUP BY vec_id),
         dists AS (
           SELECT q.vec_id AS qid, c.vec_id AS nid,
             CAST(bit_count(xor(q.sig, c.sig)) AS INTEGER) AS dist
           FROM sigs q JOIN sigs c ON c.vec_id <> q.vec_id
           WHERE q.vec_id < 10)
         SELECT qid, nid, dist, rank FROM (
           SELECT qid, nid, dist,
             row_number() OVER (PARTITION BY qid ORDER BY dist, nid) AS rank
           FROM dists)
         WHERE rank <= 10""",
    // Bloom semantics: a probe shingle hits iff ALL k=3 md5-position
    // bits are set in the benchmark's 4096-bit filter; the exact join
    // runs alongside so n_false_pos is the measured FP count.
    "d16_bloom_decontam" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id, source,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, source, string_split(text, ' ') AS w
                 FROM documents)),
         bench AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),
         bpos AS (SELECT DISTINCT
             ('0x' || substr(md5(j::VARCHAR || '_' || s),1,8))::BIGINT % 4096
               AS pos
           FROM bench, generate_series(0,2) tj(j)),
         tr AS (SELECT doc_id, s FROM sh WHERE source <> 'src0'),
         ps AS (SELECT tr.doc_id, tr.s,
             CASE WHEN EXISTS (SELECT 1 FROM bench b WHERE b.s = tr.s)
               THEN 1 ELSE 0 END AS exact_hit,
             CASE WHEN (SELECT count(*)
                 FROM generate_series(0,2) tj(j)
                 WHERE ('0x' || substr(md5(j::VARCHAR || '_' || tr.s),1,8))::BIGINT
                         % 4096 IN (SELECT pos FROM bpos)) = 3
               THEN 1 ELSE 0 END AS bloom_hit
           FROM tr)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(exact_hit) AS BIGINT) AS n_exact,
           CAST(sum(bloom_hit) AS BIGINT) AS n_bloom,
           CAST(sum(bloom_hit) - sum(exact_hit) AS BIGINT) AS n_false_pos
         FROM ps GROUP BY doc_id""",
    // SQ8 search: codes per s04's construction; amax cancels in the
    // reconstructed cosine so the score is the code dot over the code
    // norms — integer folds + one IEEE divide, like s01 over q not v.
    "s15_ann_sq8" ->
      s"""WITH pre AS ($embPreSql),
         qt AS (SELECT vec_id, v,
                  (SELECT max(abs(e)) FROM unnest(v) t(e)) AS amax
                FROM pre),
         qq AS (SELECT vec_id,
                  CASE WHEN amax > 0 THEN list_transform(v,
                      x -> CAST(floor(CAST(x*127 AS DOUBLE)
                             / CAST(amax AS DOUBLE)) AS BIGINT))
                    ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
                FROM qt),
         qn AS (SELECT vec_id, q,
                  CAST((SELECT sum(e*e) FROM unnest(q) t(e)) AS BIGINT)
                    AS qn2
                FROM qq),
         sims AS (
           SELECT a.vec_id AS qid, b.vec_id AS nid,
             CAST((SELECT sum(x*y)
                   FROM (SELECT unnest(a.q) x, unnest(b.q) y)) AS DOUBLE)
               / (sqrt(CAST(a.qn2 AS DOUBLE)) * sqrt(CAST(b.qn2 AS DOUBLE)))
               AS cos
           FROM qn a JOIN qn b ON b.vec_id <> a.vec_id
           WHERE a.vec_id < 10)
         SELECT qid, nid, cos, rank FROM (
           SELECT qid, nid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid)
               AS rank
           FROM sims)
         WHERE rank <= 10""",
    "s11_mips" ->
      s"""WITH pre AS ($embPreSql),
         sims AS (
           SELECT q.vec_id AS qid, c.vec_id AS nid,
             CAST((SELECT sum(x*y) FROM (SELECT unnest(q.v) x, unnest(c.v) y)) AS BIGINT) AS dot
           FROM pre q JOIN pre c ON c.vec_id <> q.vec_id
           WHERE q.vec_id < 10)
         SELECT qid, nid, dot, rank FROM (
           SELECT qid, nid, dot,
             row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS rank
           FROM sims)
         WHERE rank <= 10""",
    "s12_mips_lsh" ->
      s"""WITH pre AS ($embPreSql),
         m AS (SELECT max(n2) AS m2 FROM pre),
         caug AS (
           SELECT vec_id, v,
             list_append(v, CAST(floor(sqrt(CAST(m2 - n2 AS DOUBLE))) AS BIGINT)) AS av
           FROM pre, m),
         qaug AS (
           SELECT vec_id, v, list_append(v, 0::BIGINT) AS av
           FROM pre WHERE vec_id < 10),
         planes AS (
           SELECT p, d,
             ('0x' || substr(md5(p::VARCHAR || '_' || d::VARCHAR),1,8))::BIGINT
               - 2147483648 AS coef
           FROM generate_series(0,7) tp(p), generate_series(0,64) td(d)),
         cbuckets AS (
           SELECT vec_id,
             sum(CASE WHEN dot >= 0 THEN (1::BIGINT << p) ELSE 0 END) AS bucket
           FROM (SELECT ca.vec_id, pl.p, sum(ca.av[pl.d+1] * pl.coef) AS dot
                 FROM caug ca, planes pl GROUP BY ca.vec_id, pl.p)
           GROUP BY vec_id),
         qbuckets AS (
           SELECT vec_id,
             sum(CASE WHEN dot >= 0 THEN (1::BIGINT << p) ELSE 0 END) AS bucket
           FROM (SELECT qa.vec_id, pl.p, sum(qa.av[pl.d+1] * pl.coef) AS dot
                 FROM qaug qa, planes pl GROUP BY qa.vec_id, pl.p)
           GROUP BY vec_id),
         sims AS (
           -- multi-probe: own bucket plus all 1-bit neighbors; rerank
           -- on the EXACT original inner product
           SELECT q.vec_id AS qid, c.vec_id AS nid,
             CAST((SELECT sum(x*y) FROM (SELECT unnest(qp.v) x, unnest(cp.v) y)) AS BIGINT) AS dot
           FROM qbuckets q JOIN cbuckets c
             ON bit_count(xor(q.bucket, c.bucket)) <= 1
               AND c.vec_id <> q.vec_id
             JOIN pre qp ON qp.vec_id = q.vec_id
             JOIN pre cp ON cp.vec_id = c.vec_id)
         SELECT qid, nid, dot, rank FROM (
           SELECT qid, nid, dot,
             row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS rank
           FROM sims)
         WHERE rank <= 10""",
    // s37: the same s13 probe chain replayed per probe width against
    // the s09 exact baseline; branches generated from one probes list.
    "s37_probe_recall" -> probeRecallOracleSql,
    // s38: the s13 assignment chain + a k-sized rollup into FAISS's
    // imbalance factor, exact integer numerator/denominator.
    "s38_cell_imbalance" ->
      s"""WITH pre AS ($embPreSql),
         cents AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2
                   FROM pre ORDER BY vec_id LIMIT 16),
         scored AS (
           SELECT p.vec_id, c.cid,
             row_number() OVER (PARTITION BY p.vec_id ORDER BY
               CAST((SELECT sum(x*y) FROM (SELECT unnest(p.v) x, unnest(c.cv) y)) AS DOUBLE)
                 / (sqrt(CAST(p.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC,
               c.cid) AS rn
           FROM pre p, cents c),
         assign AS (SELECT vec_id, cid FROM scored WHERE rn = 1),
         sz AS (SELECT cid, CAST(count(*) AS BIGINT) AS sz
                FROM assign GROUP BY 1)
         SELECT CAST(count(*) AS BIGINT) AS n_cells_occupied,
           CAST((SELECT count(*) FROM cents) AS BIGINT) AS n_cells_total,
           CAST(sum(sz) AS BIGINT) AS n_vectors,
           CAST(min(sz) AS BIGINT) AS min_cell,
           CAST(max(sz) AS BIGINT) AS max_cell,
           CAST((SELECT count(*) FROM cents) * sum(sz * sz) AS BIGINT)
             AS imb_num,
           CAST(sum(sz) * sum(sz) AS BIGINT) AS imb_den,
           CAST((SELECT count(*) FROM cents) * sum(sz * sz) AS DOUBLE)
             / CAST(sum(sz) * sum(sz) AS DOUBLE) AS imbalance
         FROM sz""",
    "s13_ann_ivf_probe" ->
      s"""WITH pre AS ($embPreSql),
         cents AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2
                   FROM pre ORDER BY vec_id LIMIT 16),
         scored AS (
           SELECT p.vec_id, c.cid,
             row_number() OVER (PARTITION BY p.vec_id ORDER BY
               CAST((SELECT sum(x*y) FROM (SELECT unnest(p.v) x, unnest(c.cv) y)) AS DOUBLE)
                 / (sqrt(CAST(p.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC,
               c.cid) AS rn
           FROM pre p, cents c),
         assign AS (SELECT vec_id, cid FROM scored WHERE rn = 1),
         qprobe AS (SELECT vec_id, cid FROM scored
                    WHERE rn <= 2 AND vec_id < 10),
         sims AS (
           SELECT qa.vec_id AS qid, ca.vec_id AS nid,
             CAST((SELECT sum(x*y) FROM (SELECT unnest(qp.v) x, unnest(cp.v) y)) AS DOUBLE)
               / (sqrt(CAST(qp.n2 AS DOUBLE)) * sqrt(CAST(cp.n2 AS DOUBLE))) AS cos
           FROM qprobe qa JOIN assign ca
             ON qa.cid = ca.cid AND ca.vec_id <> qa.vec_id
             JOIN pre qp ON qp.vec_id = qa.vec_id
             JOIN pre cp ON cp.vec_id = ca.vec_id)
         SELECT qid, nid, cos, rank FROM (
           SELECT qid, nid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
           FROM sims)
         WHERE rank <= 10""",
    "t15_gopher_gates" ->
      s"""WITH m AS (
           SELECT doc_id,
             len(string_split(text, ' ')) AS nw,
             length(text) AS nc,
             len(list_filter(string_split(text, ' '),
               w -> regexp_matches(w, '[A-Za-z]'))) AS aw,
             len(list_distinct(list_filter(string_split(lower(text), ' '),
               w -> w IN ('the','be','to','of','and','that','have','with'))))
               AS sh
           FROM documents)
         SELECT doc_id,
           CAST(nw AS BIGINT) AS n_words,
           CAST(nc - nw + 1 AS DOUBLE) / CAST(nw AS DOUBLE) AS mean_word_len,
           CAST(aw AS DOUBLE) / CAST(nw AS DOUBLE) AS alpha_ratio,
           CAST(sh AS BIGINT) AS stop_hits,
           (nw >= 50 AND nw <= 100000) AS pass_words,
           (CAST(nc - nw + 1 AS DOUBLE) / CAST(nw AS DOUBLE) >= 3.0
             AND CAST(nc - nw + 1 AS DOUBLE) / CAST(nw AS DOUBLE) <= 10.0)
             AS pass_mean_len,
           (CAST(aw AS DOUBLE) >= CAST(nw AS DOUBLE) * 0.8) AS pass_alpha,
           (sh >= 1) AS pass_stops,
           ((nw >= 50 AND nw <= 100000)
             AND (CAST(nc - nw + 1 AS DOUBLE) / CAST(nw AS DOUBLE) >= 3.0
               AND CAST(nc - nw + 1 AS DOUBLE) / CAST(nw AS DOUBLE) <= 10.0)
             AND (CAST(aw AS DOUBLE) >= CAST(nw AS DOUBLE) * 0.8)
             AND (sh >= 1)) AS keep
         FROM m""",
    // Mirrors PipelineQueries.piiRedact: the same deterministic contact
    // line planted in 2-of-3 docs, counts on the raw text, redaction
    // email → IPv4 → phone. Patterns are RE2/Java-regex-identical (no
    // backrefs/lookaround); DuckDB needs the explicit 'g' flag where
    // Spark's regexp_replace is global by default.
    "t16_pii_redact" ->
      """WITH seeded AS (
           SELECT doc_id,
             CASE WHEN doc_id % 3 <> 0 THEN
               text || ' contact u' || CAST(doc_id AS VARCHAR)
                 || '@mail.example node 10.'
                 || CAST(doc_id % 250 AS VARCHAR) || '.'
                 || CAST((doc_id * 7) % 250 AS VARCHAR) || '.'
                 || CAST(doc_id % 10 AS VARCHAR) || ' tel 555-'
                 || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0199'
             ELSE text END AS t
           FROM documents),
         c AS (SELECT doc_id, t,
             len(regexp_extract_all(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS ne,
             len(regexp_extract_all(t,
               '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS ni,
             len(regexp_extract_all(t, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS np
           FROM seeded)
         SELECT doc_id,
           CAST(ne AS BIGINT) AS n_emails,
           CAST(ni AS BIGINT) AS n_ips,
           CAST(np AS BIGINT) AS n_phones,
           substr(md5(regexp_replace(regexp_replace(regexp_replace(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
             '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')), 1, 16)
             AS redacted_fp,
           (ne + ni + np > 0) AS has_pii
         FROM c""",
    // Mirrors TextAnalysis.dsirWeights: md5-bucketed bigrams, add-one
    // smoothed target/raw ratio as one divide of two exact integer
    // products, per-doc fold in sorted bucket order (t13's discipline).
    "t17_dsir_weights" ->
      """WITH g AS (
           SELECT doc_id, lang = 'en' AS tgt,
             unnest(list_transform(generate_series(1, greatest(len(w)-1, 0)),
               i -> w[i] || ' ' || w[i+1])) AS g
           FROM (SELECT doc_id, lang, string_split(text, ' ') AS w
                 FROM documents)),
         bk AS (SELECT doc_id, tgt,
                  ('0x' || substr(md5(g),1,8))::BIGINT % 64 AS b
                FROM g),
         m AS (SELECT b, sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
                 count(*) AS cr
               FROM bk GROUP BY b),
         t AS (SELECT sum(ct) AS st, sum(cr) AS sr FROM m),
         r AS (SELECT doc_id, bk.b AS b,
                 CAST((m.ct + 1) * (t.sr + 64) AS DOUBLE)
                   / CAST((m.cr + 1) * (t.st + 64) AS DOUBLE) AS r
               FROM bk JOIN m ON bk.b = m.b, t),
         lst AS (SELECT doc_id, list(r ORDER BY b, r) AS l FROM r
                 GROUP BY doc_id)
         SELECT doc_id, CAST(len(l) AS BIGINT) AS n_bigrams,
           list_reduce(list_prepend(0.0, l), (acc, x) -> acc + x)
             / CAST(len(l) AS DOUBLE) AS dsir_weight
         FROM lst""",
    "t01_langid" ->
      s"""SELECT doc_id, lang, CASE
           WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
           WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
           WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
           WHEN s_fr >= s_zh THEN 'fr'
           ELSE 'zh' END AS pred
         FROM (SELECT doc_id, lang,
           ${langScoreSql("en")} AS s_en, ${langScoreSql("es")} AS s_es,
           ${langScoreSql("de")} AS s_de, ${langScoreSql("fr")} AS s_fr,
           ${langScoreSql("zh")} AS s_zh
           FROM (SELECT doc_id, lang, string_split(lower(text),' ') AS w
                 FROM documents))""",
    // t30: t01's detector grouped into the declared × predicted
    // confusion matrix.
    "t30_langid_confusion" ->
      s"""SELECT lang, pred, CAST(count(*) AS BIGINT) AS cnt FROM (
           SELECT lang, CASE
             WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr
               AND s_en >= s_zh THEN 'en'
             WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
             WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
             WHEN s_fr >= s_zh THEN 'fr'
             ELSE 'zh' END AS pred
           FROM (SELECT lang,
             ${langScoreSql("en")} AS s_en, ${langScoreSql("es")} AS s_es,
             ${langScoreSql("de")} AS s_de, ${langScoreSql("fr")} AS s_fr,
             ${langScoreSql("zh")} AS s_zh
             FROM (SELECT lang, string_split(lower(text),' ') AS w
                   FROM documents)))
         GROUP BY lang, pred""",
    "t02_quality" ->
      s"""SELECT doc_id, n_chars, n_words, avg_word_len, stopword_ratio,
           digit_ratio, punct_ratio,
           stopword_ratio*2.0 + avg_word_len*0.1 - digit_ratio*1.0
             - punct_ratio*1.0 AS quality
         FROM (SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
           CAST(length(text) - len(string_split(text,' ')) + 1 AS DOUBLE)
             / len(string_split(text,' ')) AS avg_word_len,
           CAST(${langScoreSql("en", "string_split(lower(text),' ')")} AS DOUBLE)
             / len(string_split(text,' ')) AS stopword_ratio,
           CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
             / length(text) AS digit_ratio,
           CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
             / length(text) AS punct_ratio
           FROM documents)""",
    "t03_token_stats" ->
      """SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT)
             AS bpeish_tokens
         FROM documents""",
    "t04_fingerprint" ->
      """SELECT doc_id,
           substr(md5(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 16) AS fp
         FROM documents""",
    // Byte-exact polynomial rolling hash (h = h*1000003 + byte, mod 2^64):
    // DuckDB has no byte indexing on BLOBs, so bytes are recovered from
    // hex(encode(...)) 2-char pairs and folded under HUGEINT arithmetic,
    // with the final value re-interpreted as a signed int64.
    "t05_rolling_fp" ->
      """WITH norm AS (
           SELECT doc_id,
             hex(encode(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS hx
           FROM documents),
         folded AS (
           SELECT doc_id,
             list_reduce(
               list_prepend(0::HUGEINT,
                 list_transform(generate_series(1, length(hx)//2),
                   i -> ('0x' || substr(hx, 2*i-1, 2))::BIGINT)),
               (acc, b) -> (acc * 1000003 + b) % 18446744073709551616::HUGEINT) AS h
           FROM norm)
         SELECT doc_id,
           CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
                THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT) AS rfp
         FROM folded""",
    "m01_multimodal" ->
      """SELECT doc_id AS id, 'raw' AS format,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 AS INT) AS width,
           CAST(octet_length(encode(text)) % 480 AS INT) AS height,
           CAST(ascii(text) AS BIGINT) AS feat0
         FROM documents""",
    // Aspect-preserving integer resize of the stub-decoded dimensions.
    "m02_media_resize" ->
      """SELECT id, width, height,
           CAST(CASE WHEN width <= 0 OR height <= 0 THEN 0
                WHEN width*224 <= height*224 THEN (width*224)//height
                ELSE 224 END AS INT) AS out_w,
           CAST(CASE WHEN width <= 0 OR height <= 0 THEN 0
                WHEN width*224 <= height*224 THEN 224
                ELSE (height*224)//width END AS INT) AS out_h
         FROM (SELECT doc_id AS id,
                 CAST(octet_length(encode(text)) % 640 AS INT) AS width,
                 CAST(octet_length(encode(text)) % 480 AS INT) AS height
               FROM documents)""",
    // Frame sampling: 64-byte frames, every 2nd sampled; fingerprint =
    // md5 of the frame's hex image (blobs are not sliceable in DuckDB,
    // hex substrings are engine-portable).
    "m03_frame_sample" ->
      """WITH base AS (SELECT doc_id, hex(encode(text)) AS hx,
                              octet_length(encode(text)) AS nb
                       FROM documents)
         SELECT doc_id AS id, frame_idx,
           md5(substr(hx, CAST(frame_idx*128+1 AS INT), 128)) AS frame_fp
         FROM (SELECT doc_id, hx, unnest(range(0, nb//64, 2)) AS frame_idx
               FROM base WHERE nb >= 64)""",
    // Block-mean perceptual hash: 48 equal codepoint blocks, bit =
    // exact integer cross-multiplied mean compare; 8x6-bit bands give
    // pigeonhole-exact candidates for hamming <= 7, then xor+popcount.
    // m05: the oracle re-derives the deterministic stub vision vector
    // (64 md5-derived centered int16s from the blob fingerprint) and
    // the exact int64-dot cosine against the caption embedding.
    "m05_clip_filter" ->
      s"""WITH pre AS ($embPreSql),
         m AS (SELECT doc_id, md5(text) AS fp FROM documents),
         mv AS (SELECT doc_id,
                  list_transform(generate_series(0, 63), d ->
                    ('0x' || substr(md5(fp || '_' || CAST(d AS VARCHAR)),
                       1, 4))::BIGINT - 32768) AS v
                FROM m),
         mn AS (SELECT doc_id, v,
                  (SELECT sum(x*x) FROM unnest(v) t(x)) AS n2 FROM mv)
         SELECT mn.doc_id,
           CAST((SELECT sum(x*y)
                 FROM (SELECT unnest(mn.v) x, unnest(c.v) y)) AS DOUBLE)
             / (sqrt(CAST(mn.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE)))
             AS clip_score,
           CAST((SELECT sum(x*y)
                 FROM (SELECT unnest(mn.v) x, unnest(c.v) y)) AS DOUBLE)
             / (sqrt(CAST(mn.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE)))
             >= 0.0 AS keep
         FROM mn JOIN pre c ON c.vec_id = mn.doc_id""",
    // m07: cut at frame f iff |mean_f - mean_{f-1}| > 1/16 of the blob
    // mean — the identical cross-multiplied integer compare.
    "m07_shot_boundaries" ->
      """WITH base AS (SELECT doc_id, text, length(text) AS n
                       FROM documents WHERE length(text) > 0),
         t AS (SELECT doc_id, (i - 1) // 64 AS f,
                 ascii(substr(text, CAST(i AS INT), 1)) AS v
               FROM (SELECT doc_id, text, unnest(generate_series(1, n)) AS i
                     FROM base)),
         fr AS (SELECT doc_id, f, CAST(sum(v) AS BIGINT) AS e,
                  CAST(count(*) AS BIGINT) AS c
                FROM t GROUP BY doc_id, f),
         tot AS (SELECT doc_id, CAST(sum(e) AS BIGINT) AS ts,
                   CAST(sum(c) AS BIGINT) AS tn
                 FROM fr GROUP BY doc_id),
         d AS (SELECT fr.doc_id, fr.f, fr.e, fr.c,
                 lag(fr.e) OVER (PARTITION BY fr.doc_id ORDER BY fr.f)
                   AS pe,
                 lag(fr.c) OVER (PARTITION BY fr.doc_id ORDER BY fr.f)
                   AS pc
               FROM fr)
         SELECT d.doc_id AS id, CAST(d.f AS BIGINT) AS frame_idx
         FROM d JOIN tot ON tot.doc_id = d.doc_id
         WHERE pe IS NOT NULL
           AND abs(d.e*pc - pe*d.c) * tn * 16 > ts * d.c * pc""",
    // m06: 64-codepoint frames, energy = codepoint sum, voiced iff
    // frame mean >= blob mean (integer cross-multiply), segments =
    // runs of >= 2 voiced frames (lag-flag islands).
    // m13: m07's cuts -> shots via one lead window; coverage of
    // [a,b] under stride s is the integer test b//s >= ceil(a/s).
    "m13_sample_coverage" ->
      """WITH base AS (SELECT doc_id, text, length(text) AS n
                       FROM documents WHERE length(text) > 0),
         t AS (SELECT doc_id, (i - 1) // 64 AS f,
                 ascii(substr(text, CAST(i AS INT), 1)) AS v
               FROM (SELECT doc_id, text,
                       unnest(generate_series(1, n)) AS i
                     FROM base)),
         fr AS (SELECT doc_id, f, CAST(sum(v) AS BIGINT) AS e,
                  CAST(count(*) AS BIGINT) AS c
                FROM t GROUP BY doc_id, f),
         tot AS (SELECT doc_id, CAST(sum(e) AS BIGINT) AS ts,
                   CAST(sum(c) AS BIGINT) AS tn
                 FROM fr GROUP BY doc_id),
         d AS (SELECT fr.doc_id, fr.f, fr.e, fr.c,
                 lag(fr.e) OVER (PARTITION BY fr.doc_id ORDER BY fr.f)
                   AS pe,
                 lag(fr.c) OVER (PARTITION BY fr.doc_id ORDER BY fr.f)
                   AS pc
               FROM fr),
         cuts AS (SELECT d.doc_id, d.f
                  FROM d JOIN tot ON tot.doc_id = d.doc_id
                  WHERE pe IS NOT NULL
                    AND abs(d.e*pc - pe*d.c) * tn * 16
                      > ts * d.c * pc),
         nf AS (SELECT doc_id, (n - 1) // 64 + 1 AS nf FROM base),
         starts AS (SELECT doc_id, CAST(0 AS BIGINT) AS a FROM base
                    UNION ALL SELECT doc_id, f FROM cuts),
         shots AS (SELECT s.doc_id, s.a,
                     coalesce(lead(s.a) OVER (PARTITION BY s.doc_id
                       ORDER BY s.a) - 1, nf.nf - 1) AS b
                   FROM starts s JOIN nf ON nf.doc_id = s.doc_id),
         th AS (SELECT unnest([2, 4, 8]) AS stride)
         SELECT CAST(stride AS BIGINT) AS stride,
           CAST(count(*) AS BIGINT) AS n_shots,
           CAST(sum(CASE WHEN (b // stride)
               >= ((a + stride - 1) // stride) THEN 1 ELSE 0 END)
             AS BIGINT) AS covered,
           CAST(sum(CASE WHEN (b // stride)
               >= ((a + stride - 1) // stride) THEN 1 ELSE 0 END)
             AS DOUBLE) / CAST(count(*) AS DOUBLE) AS coverage
         FROM shots, th GROUP BY stride""",
    // m12: codepoint-sum energies, corpus-mean target, one
    // cross-multiplied integer division per clip.
    "m12_loudness_gain" ->
      """WITH t AS (SELECT doc_id, ascii(substr(text, CAST(i AS INT), 1)) AS v
               FROM (SELECT doc_id, text,
                       unnest(generate_series(1, length(text))) AS i
                     FROM documents WHERE length(text) > 0)),
         per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_cp,
                   CAST(sum(v) AS BIGINT) AS energy
                 FROM t GROUP BY doc_id),
         tot AS (SELECT CAST(sum(n_cp) AS BIGINT) AS nn,
                   CAST(sum(energy) AS BIGINT) AS ee FROM per)
         SELECT doc_id, n_cp, energy,
           CAST((ee * n_cp * 1000) // (nn * energy) AS BIGINT)
             AS gain_milli
         FROM per, tot""",
    "m06_audio_segments" ->
      """WITH base AS (SELECT doc_id, text, length(text) AS n
                       FROM documents WHERE length(text) > 0),
         t AS (SELECT doc_id, (i - 1) // 64 AS f,
                 ascii(substr(text, CAST(i AS INT), 1)) AS v
               FROM (SELECT doc_id, text, unnest(generate_series(1, n)) AS i
                     FROM base)),
         fr AS (SELECT doc_id, f, CAST(sum(v) AS BIGINT) AS e,
                  CAST(count(*) AS BIGINT) AS c
                FROM t GROUP BY doc_id, f),
         tot AS (SELECT doc_id, CAST(sum(e) AS BIGINT) AS ts,
                   CAST(sum(c) AS BIGINT) AS tn
                 FROM fr GROUP BY doc_id),
         vo AS (SELECT fr.doc_id, fr.f,
                  (fr.e * tot.tn >= tot.ts * fr.c) AS voiced
                FROM fr JOIN tot ON tot.doc_id = fr.doc_id),
         fl AS (SELECT doc_id, f, voiced,
                  CASE WHEN voiced AND NOT coalesce(lag(voiced)
                    OVER (PARTITION BY doc_id ORDER BY f), FALSE)
                  THEN 1 ELSE 0 END AS st
                FROM vo),
         gr AS (SELECT doc_id, f, voiced,
                  sum(st) OVER (PARTITION BY doc_id ORDER BY f) AS g
                FROM fl),
         seg AS (SELECT doc_id, g, min(f) AS start_frame,
                   max(f) AS end_frame, count(*) AS n_frames
                 FROM gr WHERE voiced GROUP BY doc_id, g
                 HAVING count(*) >= 2)
         SELECT doc_id AS id,
           CAST(row_number() OVER (PARTITION BY doc_id
             ORDER BY start_frame) AS BIGINT) AS seg_id,
           CAST(start_frame AS BIGINT) AS start_frame,
           CAST(end_frame AS BIGINT) AS end_frame,
           CAST(n_frames AS BIGINT) AS n_frames
         FROM seg""",
    "m04_phash_pairs" ->
      """WITH cp AS (SELECT doc_id AS mid, length(text) AS n,
             unnest(generate_series(1, length(text))) - 1 AS p0,
             unnest(list_transform(generate_series(1, length(text)),
               i -> ascii(substr(text, i, 1)))) AS c
           FROM documents),
         bs AS (SELECT mid, (p0 * 48) // n AS b,
                  count(*) AS cnt, CAST(sum(c) AS BIGINT) AS s
                FROM cp GROUP BY mid, (p0 * 48) // n),
         tot AS (SELECT mid, CAST(sum(s) AS BIGINT) AS ts,
                   CAST(sum(cnt) AS BIGINT) AS tn
                 FROM bs GROUP BY mid),
         ph AS (SELECT bs.mid,
             CAST(sum(CASE WHEN bs.s * tot.tn >= tot.ts * bs.cnt
               THEN (1::BIGINT << CAST(bs.b AS INT)) ELSE 0 END) AS BIGINT)
               AS h
           FROM bs JOIN tot ON bs.mid = tot.mid GROUP BY bs.mid),
         banded AS (SELECT mid, h, band,
             (h >> CAST(band * 6 AS INT)) & 63 AS bv
           FROM ph, (SELECT unnest(generate_series(0, 7)) AS band)),
         cand AS (SELECT DISTINCT a.mid AS da, b.mid AS db,
             a.h AS ha, b.h AS hb
           FROM banded a JOIN banded b
             ON a.band = b.band AND a.bv = b.bv AND a.mid < b.mid)
         SELECT da, db, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
         FROM cand WHERE bit_count(xor(ha, hb)) <= 7""",
    "s02_ann_lsh" ->
      s"""WITH pre AS ($embPreSql),
         planes AS (
           SELECT p, d,
             ('0x' || substr(md5(p::VARCHAR || '_' || d::VARCHAR),1,8))::BIGINT
               - 2147483648 AS coef
           FROM generate_series(0,7) tp(p), generate_series(0,63) td(d)),
         buckets AS (
           SELECT vec_id,
             sum(CASE WHEN dot >= 0 THEN (1::BIGINT << p) ELSE 0 END) AS bucket
           FROM (SELECT pr.vec_id, pl.p, sum(pr.v[pl.d+1] * pl.coef) AS dot
                 FROM pre pr, planes pl GROUP BY pr.vec_id, pl.p)
           GROUP BY vec_id),
         sims AS (
           -- multi-probe: own bucket plus all 1-bit neighbors
           SELECT q.vec_id AS qid, c.vec_id AS nid,
             CAST((SELECT sum(x*y) FROM (SELECT unnest(qp.v) x, unnest(cp.v) y)) AS DOUBLE)
               / (sqrt(CAST(qp.n2 AS DOUBLE)) * sqrt(CAST(cp.n2 AS DOUBLE))) AS cos
           FROM buckets q JOIN buckets c
             ON bit_count(xor(q.bucket, c.bucket)) <= 1
               AND c.vec_id <> q.vec_id
             JOIN pre qp ON qp.vec_id = q.vec_id
             JOIN pre cp ON cp.vec_id = c.vec_id
           WHERE q.vec_id < 10)
         SELECT qid, nid, cos, rank FROM (
           SELECT qid, nid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
           FROM sims)
         WHERE rank <= 10""",
    // IVF: centroids = 16 lowest-id vectors; cell = argmax cosine
    // (ties -> smaller centroid id); probe own cell, exact rerank.
    "s03_ann_ivf" ->
      s"""WITH pre AS ($embPreSql),
         cents AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2
                   FROM pre ORDER BY vec_id LIMIT 16),
         assign AS (
           SELECT vec_id, cid FROM (
             SELECT p.vec_id, c.cid,
               row_number() OVER (PARTITION BY p.vec_id ORDER BY
                 CAST((SELECT sum(x*y) FROM (SELECT unnest(p.v) x, unnest(c.cv) y)) AS DOUBLE)
                   / (sqrt(CAST(p.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC,
                 c.cid) AS rn
             FROM pre p, cents c) WHERE rn = 1),
         sims AS (
           SELECT qa.vec_id AS qid, ca.vec_id AS nid,
             CAST((SELECT sum(x*y) FROM (SELECT unnest(qp.v) x, unnest(cp.v) y)) AS DOUBLE)
               / (sqrt(CAST(qp.n2 AS DOUBLE)) * sqrt(CAST(cp.n2 AS DOUBLE))) AS cos
           FROM assign qa JOIN assign ca
             ON qa.cid = ca.cid AND ca.vec_id <> qa.vec_id
             JOIN pre qp ON qp.vec_id = qa.vec_id
             JOIN pre cp ON cp.vec_id = ca.vec_id
           WHERE qa.vec_id < 10)
         SELECT qid, nid, cos, rank FROM (
           SELECT qid, nid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
           FROM sims)
         WHERE rank <= 10""",
    // Int8 quantization: q_i = floor((iv_i*127)/amax) — one exact int64
    // product + one IEEE divide + floor, reproduced code-for-code. Sums
    // cast back to BIGINT (DuckDB sums BIGINT into HUGEINT).
    "s04_quantize" ->
      s"""WITH pre AS ($embPreSql),
         qt AS (
           SELECT vec_id, v, n2,
             (SELECT max(abs(e)) FROM unnest(v) t(e)) AS amax
           FROM pre),
         qq AS (
           SELECT vec_id, v, n2, amax,
             CASE WHEN amax > 0 THEN list_transform(v,
                 x -> CAST(floor(CAST(x*127 AS DOUBLE)/CAST(amax AS DOUBLE)) AS BIGINT))
               ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
           FROM qt),
         agg AS (
           SELECT vec_id, amax, n2,
             CAST((SELECT sum(e) FROM unnest(q) t(e)) AS BIGINT) AS qsum,
             CAST((SELECT sum(e*e) FROM unnest(q) t(e)) AS BIGINT) AS qnorm2,
             CAST((SELECT sum((x*127 - y*amax)*(x*127 - y*amax))
                   FROM (SELECT unnest(v) x, unnest(q) y)) AS BIGINT) AS err2,
             CAST((SELECT sum(x*y)
                   FROM (SELECT unnest(q) x, unnest(v) y)) AS BIGINT) AS qdot
           FROM qq)
         SELECT vec_id, amax, qsum, qnorm2, err2,
           CASE WHEN qnorm2 > 0 AND n2 > 0
             THEN CAST(qdot AS DOUBLE)
               / (sqrt(CAST(qnorm2 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE)))
             ELSE NULL END AS cos_qf
         FROM agg""",
    // Mirrors Vectors.ivfAdcTopK: 8 coarse cells (squared-L2 argmin,
    // ties to smaller id), exact integer residuals, residual codebook
    // from the 16 lowest-id residuals, ADC restricted to the query's
    // cell. The query LUT rows are exactly the d rows of the query
    // vectors, so one distance CTE serves both codes and LUT.
    "s14_ivfadc" ->
      """WITH iv AS (SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS iv
           FROM embeddings),
         cc AS (SELECT vec_id AS ccid, iv AS cciv FROM iv
                ORDER BY vec_id LIMIT 8),
         asg AS (SELECT vec_id, ccid, cciv, iv FROM (
             SELECT i.vec_id, c.ccid, c.cciv, i.iv,
               row_number() OVER (PARTITION BY i.vec_id ORDER BY
                 (SELECT sum((x-y)*(x-y))
                  FROM (SELECT unnest(i.iv) x, unnest(c.cciv) y)),
                 c.ccid) AS rn
             FROM iv i, cc c) WHERE rn = 1),
         res AS (SELECT vec_id, ccid AS cell,
                   list_transform(generate_series(1, len(iv)),
                     j -> iv[j] - cciv[j]) AS rv
                 FROM asg),
         rcb AS (SELECT s.s AS sub, r.vec_id AS cid,
                   r.rv[s.s*16+1 : s.s*16+16] AS civ
                 FROM (SELECT * FROM res ORDER BY vec_id LIMIT 16) r,
                   generate_series(0,3) s(s)),
         rsub AS (SELECT vec_id, cell, s.s AS sub,
                    rv[s.s*16+1 : s.s*16+16] AS sv
                  FROM res, generate_series(0,3) s(s)),
         d AS (SELECT vec_id, cell, v.sub, cid,
                 (SELECT sum((x-y)*(x-y))
                  FROM (SELECT unnest(sv) x, unnest(civ) y)) AS dist
               FROM rsub v JOIN rcb c ON v.sub = c.sub),
         codes AS (SELECT vec_id, cell, sub, cid AS code FROM
                     (SELECT vec_id, cell, sub, cid,
                        row_number() OVER (PARTITION BY vec_id, sub
                                           ORDER BY dist, cid) AS rn
                      FROM d)
                   WHERE rn = 1),
         lut AS (SELECT vec_id AS qid, cell AS qcell, sub, cid,
                   dist AS qdist
                 FROM d WHERE vec_id < 10),
         adc AS (SELECT l.qid, c.vec_id AS nid,
                   CAST(sum(l.qdist) AS BIGINT) AS adc
                 FROM codes c JOIN lut l
                   ON l.sub = c.sub AND l.cid = c.code AND l.qcell = c.cell
                 GROUP BY l.qid, c.vec_id)
         SELECT qid, nid, adc, rank FROM
           (SELECT qid, nid, adc,
              row_number() OVER (PARTITION BY qid ORDER BY adc, nid) AS rank
            FROM adc WHERE qid <> nid)
         WHERE rank <= 10""",
    // Radius search is EXACT (the cell pruning is lossless by
    // construction), so the oracle is the brute-force distance filter
    // — a wrongly pruned pair would surface as a missing row.
    "s21_range_search" ->
      s"""WITH pre AS ($embPreSql),
         d AS (
           SELECT q.vec_id AS qid, c.vec_id AS nid,
             CAST((SELECT sum((x-y)*(x-y))
                   FROM (SELECT unnest(q.v) x, unnest(c.v) y)) AS BIGINT)
               AS d2
           FROM pre q JOIN pre c ON c.vec_id <> q.vec_id
           WHERE q.vec_id < 10)
         SELECT qid, nid, d2 FROM d WHERE d2 <= 1400000000000""",
    // s14's ADC chain widened to a 50-candidate shortlist, then the
    // exact int64-cosine rerank over ONLY those candidates — the
    // two-stage serving arrangement.
    "s20_ivfadc_rerank" ->
      s"""WITH iv AS (SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS iv
           FROM embeddings),
         cc AS (SELECT vec_id AS ccid, iv AS cciv FROM iv
                ORDER BY vec_id LIMIT 8),
         asg AS (SELECT vec_id, ccid, cciv, iv FROM (
             SELECT i.vec_id, c.ccid, c.cciv, i.iv,
               row_number() OVER (PARTITION BY i.vec_id ORDER BY
                 (SELECT sum((x-y)*(x-y))
                  FROM (SELECT unnest(i.iv) x, unnest(c.cciv) y)),
                 c.ccid) AS rn
             FROM iv i, cc c) WHERE rn = 1),
         res AS (SELECT vec_id, ccid AS cell,
                   list_transform(generate_series(1, len(iv)),
                     j -> iv[j] - cciv[j]) AS rv
                 FROM asg),
         rcb AS (SELECT s.s AS sub, r.vec_id AS cid,
                   r.rv[s.s*16+1 : s.s*16+16] AS civ
                 FROM (SELECT * FROM res ORDER BY vec_id LIMIT 16) r,
                   generate_series(0,3) s(s)),
         rsub AS (SELECT vec_id, cell, s.s AS sub,
                    rv[s.s*16+1 : s.s*16+16] AS sv
                  FROM res, generate_series(0,3) s(s)),
         d AS (SELECT vec_id, cell, v.sub, cid,
                 (SELECT sum((x-y)*(x-y))
                  FROM (SELECT unnest(sv) x, unnest(civ) y)) AS dist
               FROM rsub v JOIN rcb c ON v.sub = c.sub),
         codes AS (SELECT vec_id, cell, sub, cid AS code FROM
                     (SELECT vec_id, cell, sub, cid,
                        row_number() OVER (PARTITION BY vec_id, sub
                                           ORDER BY dist, cid) AS rn
                      FROM d)
                   WHERE rn = 1),
         lut AS (SELECT vec_id AS qid, cell AS qcell, sub, cid,
                   dist AS qdist
                 FROM d WHERE vec_id < 10),
         adc AS (SELECT l.qid, c.vec_id AS nid,
                   CAST(sum(l.qdist) AS BIGINT) AS adc
                 FROM codes c JOIN lut l
                   ON l.sub = c.sub AND l.cid = c.code AND l.qcell = c.cell
                 GROUP BY l.qid, c.vec_id),
         short AS (SELECT qid, nid FROM
             (SELECT qid, nid,
                row_number() OVER (PARTITION BY qid ORDER BY adc, nid) AS rank
              FROM adc WHERE qid <> nid)
           WHERE rank <= 50),
         pre AS ($embPreSql),
         rr AS (SELECT s.qid, s.nid,
             CAST((SELECT sum(x*y) FROM (SELECT unnest(qp.v) x, unnest(np.v) y)) AS DOUBLE)
               / (sqrt(CAST(qp.n2 AS DOUBLE)) * sqrt(CAST(np.n2 AS DOUBLE))) AS cos
           FROM short s JOIN pre qp ON qp.vec_id = s.qid
             JOIN pre np ON np.vec_id = s.nid)
         SELECT qid, nid, cos, rank FROM (
           SELECT qid, nid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
           FROM rr)
         WHERE rank <= 10""",
    // Per-dimension min/max carry no arithmetic — float bits match.
    "s05_embed_stats" ->
      """SELECT CAST(i - 1 AS BIGINT) AS dim, count(*) AS cnt,
           min(embedding[i]) AS mn, max(embedding[i]) AS mx
         FROM embeddings,
           LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) t
         GROUP BY i""",
    // Mirrors Vectors.pqEncode: 4 subspaces x 16 lowest-id centroids,
    // exact int64 squared-L2 argmin (ties to smaller cid) on the
    // 10^6-scaled vectors; err2 = sum of the 4 chosen distances.
    "s06_pq_codes" ->
      s"""WITH $pqPreSql
         SELECT vec_id,
           max(CASE WHEN sub = 0 THEN cid END) AS code0,
           max(CASE WHEN sub = 1 THEN cid END) AS code1,
           max(CASE WHEN sub = 2 THEN cid END) AS code2,
           max(CASE WHEN sub = 3 THEN cid END) AS code3,
           CAST(sum(dist) AS BIGINT) AS err2
         FROM (SELECT vec_id, sub, cid, dist,
                 row_number() OVER (PARTITION BY vec_id, sub
                                    ORDER BY dist, cid) AS rn
               FROM d)
         WHERE rn = 1 GROUP BY vec_id""",
    // Mirrors Vectors.pqAdcTopK: per-query LUT of exact centroid
    // distances, doc distance = sum of 4 LUT lookups via its codes,
    // integer ranking with ties to the smaller nid.
    "s07_ann_pq_adc" ->
      s"""WITH $pqPreSql,
         codes AS (SELECT vec_id, sub, cid AS code FROM
                     (SELECT vec_id, sub, cid,
                        row_number() OVER (PARTITION BY vec_id, sub
                                           ORDER BY dist, cid) AS rn
                      FROM d)
                   WHERE rn = 1),
         lut AS (SELECT v.vec_id AS qid, v.sub, c.cid,
                   (SELECT sum((x-y)*(x-y))
                    FROM (SELECT unnest(v.sv) AS x, unnest(c.civ) AS y))
                     AS qdist
                 FROM vsub v JOIN csub c ON v.sub = c.sub
                 WHERE v.vec_id < 10),
         adc AS (SELECT l.qid, c.vec_id AS nid,
                   CAST(sum(l.qdist) AS BIGINT) AS adc
                 FROM codes c JOIN lut l ON l.sub = c.sub AND l.cid = c.code
                 GROUP BY l.qid, c.vec_id)
         SELECT qid, nid, adc, rank FROM
           (SELECT qid, nid, adc,
              row_number() OVER (PARTITION BY qid ORDER BY adc, nid) AS rank
            FROM adc WHERE qid <> nid)
         WHERE rank <= 10""",
    // Composite of the d01/d09/t03/t07 oracles: survivors of exact dedup
    // among non-bench docs, gated at >=10 ws tokens, minus contaminated
    // docs (>=0.5 3-gram overlap vs src0), with the md5 split assignment.
    "c01_curate_pipeline" ->
      """WITH train AS (SELECT doc_id, text FROM documents
                        WHERE source <> 'src0'),
         keep AS (SELECT min(doc_id) AS doc_id FROM train
                  GROUP BY md5(text)),
         sh AS (
           SELECT DISTINCT doc_id, source,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, source, string_split(text, ' ') AS w
                 FROM documents)),
         bench AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),
         tr AS (SELECT doc_id, s FROM sh WHERE source <> 'src0'),
         sizes AS (SELECT doc_id, count(*) AS n FROM tr GROUP BY doc_id),
         hits AS (SELECT tr.doc_id, count(*) AS c FROM tr
                  JOIN bench ON tr.s = bench.s GROUP BY tr.doc_id),
         contaminated AS (
           SELECT sz.doc_id FROM sizes sz LEFT JOIN hits h
             ON sz.doc_id = h.doc_id
           WHERE CAST(coalesce(h.c, 0) AS DOUBLE)
                 / CAST(sz.n AS DOUBLE) >= 0.5)
         SELECT t.doc_id,
           CAST(len(string_split(t.text, ' ')) AS BIGINT) AS ws_tokens,
           ('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)),1,4))::BIGINT % 100
             AS bucket,
           CASE WHEN ('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)),1,4))::BIGINT % 100 < 90 THEN 'train'
                WHEN ('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)),1,4))::BIGINT % 100 < 95 THEN 'val'
                ELSE 'test' END AS split
         FROM train t
         JOIN keep k ON t.doc_id = k.doc_id
         WHERE len(string_split(t.text, ' ')) >= 10
           AND t.doc_id NOT IN (SELECT doc_id FROM contaminated)""",
    // Recall@10 audit: the s01 (exact), s02 (LSH multi-probe) and s03
    // (IVF) result sets as CTEs, hit counts by (qid, nid) equi-join.
    "s09_ann_recall" ->
      s"""WITH pre AS ($embPreSql),
         exact AS (
           SELECT qid, nid FROM (
             SELECT qid, nid,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
             FROM (
               SELECT q.vec_id AS qid, c.vec_id AS nid,
                 CAST((SELECT sum(x*y) FROM (SELECT unnest(q.v) x, unnest(c.v) y)) AS DOUBLE)
                   / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) AS cos
               FROM pre q JOIN pre c ON c.vec_id <> q.vec_id
               WHERE q.vec_id < 10))
           WHERE rank <= 10),
         planes AS (
           SELECT p, d,
             ('0x' || substr(md5(p::VARCHAR || '_' || d::VARCHAR),1,8))::BIGINT
               - 2147483648 AS coef
           FROM generate_series(0,7) tp(p), generate_series(0,63) td(d)),
         buckets AS (
           SELECT vec_id,
             sum(CASE WHEN dot >= 0 THEN (1::BIGINT << p) ELSE 0 END) AS bucket
           FROM (SELECT pr.vec_id, pl.p, sum(pr.v[pl.d+1] * pl.coef) AS dot
                 FROM pre pr, planes pl GROUP BY pr.vec_id, pl.p)
           GROUP BY vec_id),
         lshk AS (
           SELECT qid, nid FROM (
             SELECT qid, nid,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
             FROM (
               SELECT q.vec_id AS qid, c.vec_id AS nid,
                 CAST((SELECT sum(x*y) FROM (SELECT unnest(qp.v) x, unnest(cp.v) y)) AS DOUBLE)
                   / (sqrt(CAST(qp.n2 AS DOUBLE)) * sqrt(CAST(cp.n2 AS DOUBLE))) AS cos
               FROM buckets q JOIN buckets c
                 ON bit_count(xor(q.bucket, c.bucket)) <= 1
                   AND c.vec_id <> q.vec_id
                 JOIN pre qp ON qp.vec_id = q.vec_id
                 JOIN pre cp ON cp.vec_id = c.vec_id
               WHERE q.vec_id < 10))
           WHERE rank <= 10),
         cents AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2
                   FROM pre ORDER BY vec_id LIMIT 16),
         assign AS (
           SELECT vec_id, cid FROM (
             SELECT p.vec_id, c.cid,
               row_number() OVER (PARTITION BY p.vec_id ORDER BY
                 CAST((SELECT sum(x*y) FROM (SELECT unnest(p.v) x, unnest(c.cv) y)) AS DOUBLE)
                   / (sqrt(CAST(p.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC,
                 c.cid) AS rn
             FROM pre p, cents c) WHERE rn = 1),
         ivfk AS (
           SELECT qid, nid FROM (
             SELECT qid, nid,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
             FROM (
               SELECT qa.vec_id AS qid, ca.vec_id AS nid,
                 CAST((SELECT sum(x*y) FROM (SELECT unnest(qp.v) x, unnest(cp.v) y)) AS DOUBLE)
                   / (sqrt(CAST(qp.n2 AS DOUBLE)) * sqrt(CAST(cp.n2 AS DOUBLE))) AS cos
               FROM assign qa JOIN assign ca
                 ON qa.cid = ca.cid AND ca.vec_id <> qa.vec_id
                 JOIN pre qp ON qp.vec_id = qa.vec_id
                 JOIN pre cp ON cp.vec_id = ca.vec_id
               WHERE qa.vec_id < 10))
           WHERE rank <= 10)
         SELECT e.qid, count(*) AS n_exact,
           CAST(sum(CASE WHEN l.nid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS lsh_hits,
           CAST(sum(CASE WHEN i.nid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS ivf_hits,
           CAST(sum(CASE WHEN l.nid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / 10.0 AS lsh_recall,
           CAST(sum(CASE WHEN i.nid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / 10.0 AS ivf_recall
         FROM exact e
         LEFT JOIN lshk l ON l.qid = e.qid AND l.nid = e.nid
         LEFT JOIN ivfk i ON i.qid = e.qid AND i.nid = e.nid
         GROUP BY e.qid""",
    // s08's trained centroids (cents2) consumed by s03's IVF search:
    // assign corpus + queries to argmax-cosine cells of the TRAINED
    // model, probe own cell, exact rerank.
    "s10_ann_ivf_trained" -> ivfTrainedOracleSql,
    // st24: streaming serving from the stored IVF index — per-micro-batch
    // stream-static top-k must union to exactly the batch answer.
    "st24_stream_ann_serve" -> ivfTrainedOracleSql,
    // s25: search FROM THE STORED index artifact — must equal s10.
    "s25_ann_index_store" -> ivfTrainedOracleSql,
    // s26: append ≡ rebuild — training restricted to the base slice,
    // serving assignment over the full corpus with the frozen model.
    "s26_ann_index_add" -> ivfTrainedOracleSqlOver("vec_id % 10 <> 7"),
    // s31: delete ≡ rebuild — full-corpus training, tombstoned ids
    // (≡ 3 mod 10) excluded from the returnable candidates only.
    "s31_ann_index_delete" ->
      ivfTrainedOracleSqlOver("TRUE", "ca.vec_id % 10 <> 3"),
    // s33: exact per-cell quantization error, base members vs adds,
    // under the base-trained frozen model.
    "s33_index_drift" -> indexDriftOracleSql,
    "s34_retrain_response" -> retrainResponseOracleSql,
    "s36_opq_lite" -> opqLiteOracleSql,
    // s35: per-dim brute force over list_slice prefixes, intersected
    // with the full-dim exact top-10.
    "s35_matryoshka_recall" ->
      """WITH pre AS (SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS v
           FROM embeddings),
         pv AS (SELECT vec_id, v,
             (SELECT sum(e*e) FROM unnest(v) t(e)) AS n2 FROM pre),
         exact AS (SELECT qid, nid FROM (
           SELECT q.vec_id AS qid, c.vec_id AS nid,
             row_number() OVER (PARTITION BY q.vec_id ORDER BY
               CAST((SELECT sum(x*y)
                     FROM (SELECT unnest(q.v) x, unnest(c.v) y)) AS DOUBLE)
                 / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE)))
                 DESC, c.vec_id) AS rn
           FROM pv q, pv c
           WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id) WHERE rn <= 10),
         dims AS (SELECT unnest([8, 16, 32]) AS kd),
         tvn AS (SELECT d.kd, p.vec_id, list_slice(p.v, 1, d.kd) AS v,
             (SELECT sum(e*e)
              FROM unnest(list_slice(p.v, 1, d.kd)) t(e)) AS n2
           FROM pv p, dims d),
         tk AS (SELECT kd, qid, nid FROM (
           SELECT q.kd, q.vec_id AS qid, c.vec_id AS nid,
             row_number() OVER (PARTITION BY q.kd, q.vec_id ORDER BY
               CAST((SELECT sum(x*y)
                     FROM (SELECT unnest(q.v) x, unnest(c.v) y)) AS DOUBLE)
                 / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE)))
                 DESC, c.vec_id) AS rn
           FROM tvn q JOIN tvn c ON c.kd = q.kd AND c.vec_id <> q.vec_id
           WHERE q.vec_id < 10) WHERE rn <= 10),
         qs AS (SELECT kd, vec_id AS qid FROM dims,
                (SELECT DISTINCT vec_id FROM pv WHERE vec_id < 10)),
         hits AS (SELECT t.kd, t.qid, count(*) AS nh
                  FROM tk t JOIN exact e
                    ON e.qid = t.qid AND e.nid = t.nid
                  GROUP BY 1, 2)
         SELECT CAST(q.kd AS BIGINT) AS dim, q.qid,
                CAST(COALESCE(h.nh, 0) AS BIGINT) AS n_hits
         FROM qs q LEFT JOIN hits h ON h.kd = q.kd AND h.qid = q.qid""",
    // s27: fixed-depth beam search over the exact degree-8 kNN graph —
    // entry = min corpus id, hop 1 = its adjacency, beam-4 by exact
    // cosine (ties by node id), hop 2 = the beam's adjacency, exact
    // rerank of the visited set. The oracle replays the identical
    // deterministic traversal, so hash-equality proves the graph build
    // AND the walk, not just the rerank.
    "s27_graph_ann" ->
      s"""WITH pre AS ($embPreSql),
         sims AS (
           SELECT a.vec_id AS src, b.vec_id AS dst,
             CAST((SELECT sum(x*y) FROM (SELECT unnest(a.v) x, unnest(b.v) y)) AS DOUBLE)
               / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos
           FROM pre a JOIN pre b ON a.vec_id <> b.vec_id),
         graph AS (
           SELECT src, dst FROM (
             SELECT src, dst,
               row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS r
             FROM sims) WHERE r <= 8),
         entry AS (SELECT min(vec_id) AS e FROM pre),
         qs AS (SELECT vec_id AS qid FROM pre WHERE vec_id < 10),
         hop1 AS (SELECT q.qid, g.dst AS nid
                  FROM qs q, entry, graph g WHERE g.src = entry.e),
         beam1 AS (
           SELECT qid, nid FROM (
             SELECT h.qid, h.nid,
               row_number() OVER (PARTITION BY h.qid
                 ORDER BY s.cos DESC, h.nid) AS r
             FROM hop1 h
             JOIN sims s ON s.src = h.qid AND s.dst = h.nid) WHERE r <= 4),
         hop2 AS (SELECT b.qid, g.dst AS nid
                  FROM beam1 b JOIN graph g ON g.src = b.nid),
         visited AS (
           SELECT qid, e AS nid FROM qs, entry
           UNION SELECT qid, nid FROM hop1
           UNION SELECT qid, nid FROM hop2),
         rer AS (
           SELECT v.qid, v.nid, s.cos
           FROM (SELECT DISTINCT qid, nid FROM visited) v
           JOIN sims s ON s.src = v.qid AND s.dst = v.nid)
         SELECT qid, nid, cos, rank FROM (
           SELECT qid, nid, cos,
             row_number() OVER (PARTITION BY qid
               ORDER BY cos DESC, nid) AS rank
           FROM rer) WHERE rank <= 5""",
    // st25: the arrivals feed applied per-micro-batch must land on the
    // same rebuilt-index answer as s26's one-shot append.
    "st25_stream_ann_index_add" ->
      ivfTrainedOracleSqlOver("vec_id % 10 <> 7"),
    // Mirrors Vectors.kmeansCells: 2 Lloyd rounds, seeds = 16 lowest-id
    // vectors, assignment = argmax int64-cosine (ties -> smaller cid),
    // update = per-dim floor(sum/count) back onto the integer grid.
    // csum/cnorm2 digest the final centroids; dotsum is the exact
    // integer cohesion sum.
    "s08_kmeans" ->
      s"""WITH pre AS ($embPreSql),
         cents0 AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2
                    FROM pre ORDER BY vec_id LIMIT 16),
         asg1 AS (
           SELECT vec_id, cid FROM (
             SELECT p.vec_id, c.cid,
               row_number() OVER (PARTITION BY p.vec_id ORDER BY
                 CAST((SELECT sum(x*y) FROM (SELECT unnest(p.v) x, unnest(c.cv) y)) AS DOUBLE)
                   / (sqrt(CAST(p.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC,
                 c.cid) AS rn
             FROM pre p, cents0 c) WHERE rn = 1),
         cd1 AS (
           SELECT a.cid, t.i AS d,
             CAST(floor(CAST(sum(p.v[t.i]) AS DOUBLE) / count(*)) AS BIGINT) AS cval
           FROM asg1 a JOIN pre p ON p.vec_id = a.vec_id,
             LATERAL (SELECT unnest(generate_series(1, len(p.v))) AS i) t
           GROUP BY a.cid, t.i),
         cents1 AS (
           SELECT cid, cv,
             CAST((SELECT sum(e*e) FROM unnest(cv) t(e)) AS BIGINT) AS cn2
           FROM (SELECT cid, list(cval ORDER BY d) AS cv FROM cd1 GROUP BY cid)),
         asg2 AS (
           SELECT vec_id, cid FROM (
             SELECT p.vec_id, c.cid,
               row_number() OVER (PARTITION BY p.vec_id ORDER BY
                 CAST((SELECT sum(x*y) FROM (SELECT unnest(p.v) x, unnest(c.cv) y)) AS DOUBLE)
                   / (sqrt(CAST(p.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC,
                 c.cid) AS rn
             FROM pre p, cents1 c) WHERE rn = 1),
         cd2 AS (
           SELECT a.cid, t.i AS d,
             CAST(floor(CAST(sum(p.v[t.i]) AS DOUBLE) / count(*)) AS BIGINT) AS cval
           FROM asg2 a JOIN pre p ON p.vec_id = a.vec_id,
             LATERAL (SELECT unnest(generate_series(1, len(p.v))) AS i) t
           GROUP BY a.cid, t.i),
         cents2 AS (
           SELECT cid, cv,
             CAST((SELECT sum(e) FROM unnest(cv) t(e)) AS BIGINT) AS csum,
             CAST((SELECT sum(e*e) FROM unnest(cv) t(e)) AS BIGINT) AS cnorm2
           FROM (SELECT cid, list(cval ORDER BY d) AS cv FROM cd2 GROUP BY cid)),
         md AS (
           SELECT a.cid,
             CAST((SELECT sum(x*y) FROM (SELECT unnest(p.v) x, unnest(c.cv) y)) AS BIGINT) AS dot
           FROM asg2 a JOIN pre p ON p.vec_id = a.vec_id
                       JOIN cents2 c ON c.cid = a.cid)
         SELECT m.cid AS cell_id, count(*) AS n_members,
           max(c.csum) AS csum, max(c.cnorm2) AS cnorm2,
           CAST(sum(m.dot) AS BIGINT) AS dotsum
         FROM md m JOIN cents2 c ON c.cid = m.cid
         GROUP BY m.cid""",
    // d12's verdict machinery over s10's TRAINED cells: the two-round
    // Lloyd chain, assignment against cents2, then within-cell
    // cosine >= 0.3 vs a smaller vec_id => dropped.
    // d22: the same trained-cell assignment, then the integer medoid —
    // per cell, argmin over members of Σ‖a−b‖² on the scaled vectors
    // (integer sums: order-independent, bit-deterministic), ties to
    // the smaller id; singleton cells keep their member at total 0.
    "d22_medoid_keep" ->
      s"""WITH pre AS ($embPreSql),
         $lloydAssignSql,
         sums AS (
           SELECT a.cid, a.vec_id AS avid,
             CAST(sum((SELECT sum((x - y) * (x - y))
                       FROM (SELECT unnest(pa.v) x, unnest(pb.v) y)))
               AS BIGINT) AS total_d2
           FROM assignT a
           JOIN assignT b ON b.cid = a.cid AND b.vec_id <> a.vec_id
           JOIN pre pa ON pa.vec_id = a.vec_id
           JOIN pre pb ON pb.vec_id = b.vec_id
           GROUP BY 1, 2),
         mem AS (SELECT cid, count(*) AS n_members FROM assignT
                 GROUP BY cid),
         ranked AS (
           SELECT t.cid, t.vec_id, COALESCE(s.total_d2, 0) AS total_d2,
             row_number() OVER (PARTITION BY t.cid
               ORDER BY COALESCE(s.total_d2, 0), t.vec_id) AS rn
           FROM assignT t
           LEFT JOIN sums s ON s.cid = t.cid AND s.avid = t.vec_id)
         SELECT r.cid AS cell, r.vec_id AS medoid_id, m.n_members,
           r.total_d2
         FROM ranked r JOIN mem m ON m.cid = r.cid
         WHERE r.rn = 1""",
    "d14_semdedup_trained" ->
      s"""WITH pre AS ($embPreSql),
         $lloydAssignSql,
         dups AS (
           SELECT a.vec_id, min(b.vec_id) AS dup_of
           FROM assignT a JOIN assignT b
             ON a.cid = b.cid AND b.vec_id < a.vec_id
             JOIN pre pa ON pa.vec_id = a.vec_id
             JOIN pre pb ON pb.vec_id = b.vec_id
           WHERE CAST((SELECT sum(x*y) FROM (SELECT unnest(pa.v) x, unnest(pb.v) y)) AS DOUBLE)
               / (sqrt(CAST(pa.n2 AS DOUBLE)) * sqrt(CAST(pb.n2 AS DOUBLE))) >= 0.3
           GROUP BY a.vec_id)
         SELECT a.vec_id, a.cid AS cell, d.dup_of,
           d.dup_of IS NOT NULL AS dropped
         FROM assignT a LEFT JOIN dups d ON d.vec_id = a.vec_id""",
    // Mirrors Vectors.semDedup: sampled-centroid cell assignment (the
    // s03 coarse quantizer), then within-cell cosine >= 0.3 against a
    // smaller vec_id => dropped, dup_of = smallest such neighbor.
    "d12_semdedup" ->
      s"""WITH pre AS ($embPreSql),
         cents AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2
                   FROM pre ORDER BY vec_id LIMIT 16),
         asg AS (
           SELECT vec_id, cid FROM (
             SELECT p.vec_id, c.cid,
               row_number() OVER (PARTITION BY p.vec_id ORDER BY
                 CAST((SELECT sum(x*y) FROM (SELECT unnest(p.v) x, unnest(c.cv) y)) AS DOUBLE)
                   / (sqrt(CAST(p.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC,
                 c.cid) AS rn
             FROM pre p, cents c) WHERE rn = 1),
         dups AS (
           SELECT a.vec_id, min(b.vec_id) AS dup_of
           FROM asg a JOIN asg b ON a.cid = b.cid AND b.vec_id < a.vec_id
             JOIN pre pa ON pa.vec_id = a.vec_id
             JOIN pre pb ON pb.vec_id = b.vec_id
           WHERE CAST((SELECT sum(x*y) FROM (SELECT unnest(pa.v) x, unnest(pb.v) y)) AS DOUBLE)
               / (sqrt(CAST(pa.n2 AS DOUBLE)) * sqrt(CAST(pb.n2 AS DOUBLE))) >= 0.3
           GROUP BY a.vec_id)
         SELECT a.vec_id, a.cid AS cell, d.dup_of,
           d.dup_of IS NOT NULL AS dropped
         FROM asg a LEFT JOIN dups d ON d.vec_id = a.vec_id""",
    // d11's candidate + exact-Jaccard CTEs, plus the signature-agreement
    // MinHash estimate (n_eq of 16 permutations) for each pair.
    "d13_minhash_est" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         h AS (SELECT doc_id, ('0x' || substr(md5(s),1,8))::BIGINT AS hw FROM sh),
         mh AS (SELECT doc_id, j, min(((2*j+1)*hw + j*12345) % 4294967311) AS mv
                FROM h, generate_series(0,15) t(j) GROUP BY doc_id, j),
         bands AS (SELECT doc_id, j//4 AS band,
                     string_agg(mv, ',' ORDER BY j) AS sig
                   FROM mh GROUP BY doc_id, j//4),
         cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.sig = b.sig
                       AND a.doc_id < b.doc_id),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT c.da, c.db, count(*) AS c
                   FROM cand c JOIN sh a ON a.doc_id = c.da
                               JOIN sh b ON b.doc_id = c.db AND b.s = a.s
                   GROUP BY c.da, c.db),
         neq AS (SELECT c.da, c.db, count(*) AS n_eq
                 FROM cand c JOIN mh ma ON ma.doc_id = c.da
                             JOIN mh mb ON mb.doc_id = c.db
                               AND mb.j = ma.j AND mb.mv = ma.mv
                 GROUP BY c.da, c.db)
         SELECT c.da, c.db,
           CAST(coalesce(n.n_eq, 0) AS BIGINT) AS n_eq,
           CAST(coalesce(n.n_eq, 0) AS DOUBLE) / 16.0 AS est_jaccard,
           CAST(coalesce(i.c, 0) AS DOUBLE)
             / (sa.n + sb.n - coalesce(i.c, 0)) AS jaccard
         FROM cand c
         LEFT JOIN inter i ON i.da = c.da AND i.db = c.db
         LEFT JOIN neq n ON n.da = c.da AND n.db = c.db
         JOIN sizes sa ON sa.doc_id = c.da
         JOIN sizes sb ON sb.doc_id = c.db""",
    // t09's stratified keep-set feeding t12's greedy packing walk — the
    // Spark side runs both stages as one plan.
    "c02_train_mix" ->
      """WITH RECURSIVE kept AS (
           SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents
           WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,4))::BIGINT % 10000
                 < CASE lang WHEN 'en' THEN 5000 WHEN 'es' THEN 7500
                             WHEN 'fr' THEN 7500 ELSE 10000 END),
         t AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,4))::BIGINT % 8
                   AS shard,
                 n_tokens
               FROM kept),
         seq AS (SELECT shard, doc_id, n_tokens,
                   row_number() OVER (PARTITION BY shard ORDER BY hx) AS pos
                 FROM t),
         walk(shard, pos, doc_id, n_tokens, bin, fill) AS (
           SELECT shard, pos, doc_id, n_tokens, CAST(0 AS BIGINT),
             n_tokens FROM seq WHERE pos = 1
           UNION ALL
           SELECT s.shard, s.pos, s.doc_id, s.n_tokens,
             CASE WHEN w.fill + s.n_tokens > 256 THEN w.bin + 1
                  ELSE w.bin END,
             CASE WHEN w.fill + s.n_tokens > 256 THEN s.n_tokens
                  ELSE w.fill + s.n_tokens END
           FROM walk w JOIN seq s
             ON s.shard = w.shard AND s.pos = w.pos + 1)
         SELECT doc_id, shard, n_tokens, bin FROM walk""",
    "st01_stream_count" ->
      """SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS cnt
         FROM events GROUP BY user_id""",
    "st02_stream_tumble" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2""",
    // Same oracle as batch g06 — the feedback-topic path must preserve
    // the fixpoint semantics.
    "st03_stream_loopback" ->
      """SELECT CAST(user_id % 10 AS VARCHAR) AS key, count(*) AS cnt
         FROM events GROUP BY user_id % 10""",
    // As-of semantics of the continuously-updated join table: an event
    // counts iff the key's flag (set at its first purchase) was on at
    // the event's timestamp; table rows sort before stream rows at equal
    // ts, hence >=.
    "st04_stream_join_refresh" ->
      """WITH p AS (SELECT user_id, min(ts) AS t0 FROM events
                    WHERE event_type = 'purchase' GROUP BY user_id)
         SELECT CAST(e.user_id AS VARCHAR) AS key, count(*) AS cnt
         FROM events e JOIN p ON e.user_id = p.user_id
         WHERE e.ts >= p.t0
         GROUP BY e.user_id""",
    // Integer-exact TF-IDF ordering: df ascending replaces the idf log
    // (log is monotone in df) so the rank is float-free.
    "t06_top_terms" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
                WHERE len(term) > 0 GROUP BY doc_id, term),
         dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
         SELECT doc_id, term, tf, df, rank FROM (
           SELECT t.doc_id, t.term, t.tf, d.df,
             row_number() OVER (PARTITION BY t.doc_id
               ORDER BY t.tf DESC, d.df ASC, t.term ASC) AS rank
           FROM tf t JOIN dfreq d ON t.term = d.term)
         WHERE rank <= 3""",
    "t07_hash_split" ->
      """SELECT doc_id,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,4))::BIGINT % 100
             AS bucket,
           CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,4))::BIGINT % 100 < 90 THEN 'train'
                WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,4))::BIGINT % 100 < 95 THEN 'val'
                ELSE 'test' END AS split
         FROM documents""",
    // The card composes t03 tokens + d01 fingerprints + t15's Gopher
    // keep (minStopHits=1, the fixture calibration documented there);
    // dup attribution via a window count over the content hash.
    "c04_dataset_card" -> cardOracleSql,
    // c05: incremental refresh must equal the FULL recompute on the new
    // snapshot (new = %7 filter with ' v2' appended to %3 ids; bench =
    // all src0 docs, fixed across snapshots).
    // t25: the oracle replays the identical content-free hash mask
    // (DuckDB's single-arg lambdas index via generate_series; position
    // i-1 aligns with Spark's 0-based transform index).
    "t25_mask_corrupt" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
                    FROM documents),
         f AS (SELECT doc_id, w,
                 list_filter(generate_series(1, len(w)), i ->
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_'
                      || CAST(i - 1 AS VARCHAR)), 1, 8))::BIGINT % 7 = 0)
                   AS m
               FROM d)
         SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
           CAST(len(m) AS BIGINT) AS n_masked,
           array_to_string(list_transform(generate_series(1, len(w)), i ->
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_'
                    || CAST(i - 1 AS VARCHAR)), 1, 8))::BIGINT % 7 = 0
                  THEN '<mask>' ELSE w[i] END), ' ') AS input_text,
           COALESCE(array_to_string(list_transform(m, i -> w[i]), ' '), '')
             AS target_text
         FROM f""",
    // t26: fair-share quota mix — per-source rank (n_chars desc, id)
    // capped at 15, survivors re-ranked round-robin (srank first) under
    // the global budget of 200.
    "t26_quota_mix" ->
      """WITH s AS (SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
               ORDER BY n_chars DESC, doc_id) AS srank
           FROM documents),
         g AS (SELECT doc_id, source, CAST(srank AS BIGINT) AS srank,
             row_number() OVER (ORDER BY srank, n_chars DESC, doc_id)
               AS grank
           FROM s WHERE srank <= 15)
         SELECT doc_id, source, srank, CAST(grank AS BIGINT) AS grank
         FROM g WHERE grank <= 200""",
    // t27: Madow systematic PPS — doc drawn iff its cumulative-weight
    // interval contains a multiple of step = total // 50; pure integer
    // arithmetic on both engines.
    "t27_pps_sample" ->
      """WITH c AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
             CAST(sum(n_chars) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
           FROM documents),
         t AS (SELECT CAST(sum(n_chars) AS BIGINT) // 50 AS step
               FROM documents)
         SELECT doc_id, w AS weight, cum
         FROM c, t WHERE cum // step > (cum - w) // step""",
    // t28: distributed BPE merge induction — the corpus word-frequency
    // stage plus 4 argmax+merge rounds, unrolled in SQL.
    "t28_bpe_merges" -> bpeOracleSql,
    // t31: the same chain's final vocabulary applied to every word
    // occurrence — tokenization as a broadcast lookup.
    "t31_bpe_apply" -> bpeApplyOracleSql,
    // c07: per-split counts + the commutative bit_xor digest — any
    // engine, any partitioning, same three numbers per split.
    "c07_dataset_seal" ->
      """SELECT CASE WHEN b < 90 THEN 'train'
                     WHEN b < 95 THEN 'val'
                     ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS digest
         FROM (SELECT text,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                   % 100 AS b
               FROM documents)
         GROUP BY 1""",
    // c09: the corruption rule is deterministic (ids ≡ 0 mod 13
    // truncated), so the salvage accounting is stated directly.
    "c09_corrupt_ingest" ->
      """SELECT
           count(CASE WHEN doc_id % 13 <> 0 THEN 1 END) AS n_good,
           count(CASE WHEN doc_id % 13 = 0 THEN 1 END) AS n_quarantined,
           CAST(coalesce(sum(CASE WHEN doc_id % 13 <> 0
             THEN len(string_split(text, ' ')) END), 0) AS BIGINT)
             AS tokens_salvaged
         FROM documents""",
    // c08: mergeSchema null-fills the pre-migration drop's missing
    // column; the oracle states that contract directly.
    "c08_schema_merge" ->
      """SELECT CAST(1 AS BIGINT) AS ver, count(*) AS n_rows,
           CAST(0 AS BIGINT) AS lang_nonnull,
           CAST(0 AS BIGINT) AS lang_ndv
         FROM documents WHERE doc_id % 5 <> 0
         UNION ALL
         SELECT CAST(2 AS BIGINT), count(*), count(lang),
           count(DISTINCT lang)
         FROM documents WHERE doc_id % 7 <> 0""",
    // c06: per-column profile of the d21-carved old vs new snapshot,
    // joined with ratio + min/max-identity drift signals. min/max are
    // compared as their VARCHAR canonical forms (q34's convention).
    "c06_profile_drift" ->
      s"""WITH old_t AS (
           SELECT doc_id, text, lang, source, n_chars FROM documents
           WHERE doc_id % 5 <> 0),
         new_t AS (
           SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END AS text,
             lang, source, n_chars FROM documents
           WHERE doc_id % 7 <> 0),
         po AS (${profileSqlOver("old_t")}),
         pn AS (${profileSqlOver("new_t")})
         SELECT po.col_name,
           po.n_rows AS n_rows_old, pn.n_rows AS n_rows_new,
           po.n_nonnull AS n_nonnull_old, pn.n_nonnull AS n_nonnull_new,
           po.ndv AS ndv_old, pn.ndv AS ndv_new,
           CAST(pn.ndv AS DOUBLE) / CAST(po.ndv AS DOUBLE) AS ndv_ratio,
           CAST(pn.n_rows AS DOUBLE) / CAST(po.n_rows AS DOUBLE)
             AS rowcount_ratio,
           po.min_val <> pn.min_val AS min_changed,
           po.max_val <> pn.max_val AS max_changed
         FROM po JOIN pn ON pn.col_name = po.col_name""",
    "c05_incremental_curate" ->
      """WITH newtrain AS (
           SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END AS text
           FROM documents WHERE source <> 'src0' AND doc_id % 7 <> 0),
         keep AS (SELECT min(doc_id) AS doc_id FROM newtrain
                  GROUP BY md5(text)),
         bsh AS (
           SELECT DISTINCT
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT string_split(text, ' ') AS w FROM documents
                 WHERE source = 'src0')),
         tsh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM newtrain)),
         sizes AS (SELECT doc_id, count(*) AS n FROM tsh GROUP BY doc_id),
         hits AS (SELECT tsh.doc_id, count(*) AS c FROM tsh
                  JOIN bsh ON tsh.s = bsh.s GROUP BY tsh.doc_id),
         contaminated AS (
           SELECT sz.doc_id FROM sizes sz LEFT JOIN hits h
             ON sz.doc_id = h.doc_id
           WHERE CAST(coalesce(h.c, 0) AS DOUBLE)
                 / CAST(sz.n AS DOUBLE) >= 0.5)
         SELECT t.doc_id,
           CAST(len(string_split(t.text, ' ')) AS BIGINT) AS ws_tokens,
           ('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)),1,4))::BIGINT % 100
             AS bucket,
           CASE WHEN ('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)),1,4))::BIGINT % 100 < 90 THEN 'train'
                WHEN ('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)),1,4))::BIGINT % 100 < 95 THEN 'val'
                ELSE 'test' END AS split
         FROM newtrain t
         JOIN keep k ON t.doc_id = k.doc_id
         WHERE len(string_split(t.text, ' ')) >= 10
           AND t.doc_id NOT IN (SELECT doc_id FROM contaminated)""",
    // st19 maintains the SAME card online (fingerprint stage with
    // retroactive dup credits + per-cell counters) — one oracle.
    "st19_stream_card" -> cardOracleSql,
    // An eval doc leaks iff its exact md5(text) fingerprint also
    // appears somewhere in train; split per t07's content-free hash.
    "c03_leakage_audit" ->
      """WITH d AS (SELECT doc_id, md5(text) AS fp,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,4))::BIGINT % 100 < 90 THEN 'train'
                  WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,4))::BIGINT % 100 < 95 THEN 'val'
                  ELSE 'test' END AS split
           FROM documents),
         t AS (SELECT DISTINCT fp FROM d WHERE split = 'train')
         SELECT d.split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(t.fp) AS BIGINT) AS n_leaked,
           CAST(count(t.fp) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             AS leak_ratio
         FROM d LEFT JOIN t ON d.fp = t.fp
         WHERE d.split <> 'train'
         GROUP BY 1""",
    // Gopher-style repetition filters: exact integer counts per doc,
    // each ratio a single IEEE divide — bit-identical across engines.
    "t08_repetition" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                    FROM documents),
         wc AS (SELECT doc_id, t, count(*) AS c FROM w
                WHERE len(t) > 0 GROUP BY doc_id, t),
         wagg AS (SELECT doc_id, sum(c) AS n_words,
                         count(*) AS n_distinct, max(c) AS top_word
                  FROM wc GROUP BY doc_id),
         d AS (SELECT doc_id, list_filter(string_split(text, ' '),
                 x -> len(x) > 0) AS ws FROM documents),
         bg AS (SELECT doc_id,
                  unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))])
                    AS b
                FROM d WHERE len(ws) >= 2),
         bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
         bagg AS (SELECT doc_id, sum(c) AS n_bg, count(*) AS n_dist,
                         max(c) AS top_bg FROM bc GROUP BY doc_id)
         SELECT w.doc_id,
           CAST(w.n_words AS BIGINT) AS n_words,
           CAST(w.n_distinct AS DOUBLE) / CAST(w.n_words AS DOUBLE)
             AS distinct_word_ratio,
           CAST(w.top_word AS DOUBLE) / CAST(w.n_words AS DOUBLE)
             AS top_word_frac,
           CASE WHEN b.n_bg IS NULL THEN 0.0
                ELSE CAST(b.top_bg AS DOUBLE) / CAST(b.n_bg AS DOUBLE) END
             AS top_bigram_frac,
           CASE WHEN b.n_bg IS NULL THEN 0.0
                ELSE CAST(b.n_bg - b.n_dist AS DOUBLE) / CAST(b.n_bg AS DOUBLE) END
             AS dup_bigram_frac,
           (CAST(w.top_word AS DOUBLE) / CAST(w.n_words AS DOUBLE) <= 0.12
            AND CAST(w.n_distinct AS DOUBLE) / CAST(w.n_words AS DOUBLE) >= 0.35
            AND (CASE WHEN b.n_bg IS NULL THEN 0.0
                 ELSE CAST(b.n_bg - b.n_dist AS DOUBLE) / CAST(b.n_bg AS DOUBLE) END)
                <= 0.05) AS keep
         FROM wagg w LEFT JOIN bagg b ON w.doc_id = b.doc_id""",
    // Same content-free md5 bucket as t07, integer basis-point compare —
    // no RNG, so the sample is identical across engines and runs.
    "t09_stratified" ->
      """SELECT doc_id, lang AS stratum, bucket, rate_bp FROM (
           SELECT doc_id, lang,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,4))::BIGINT % 10000
               AS bucket,
             CASE lang WHEN 'en' THEN 5000 WHEN 'es' THEN 7500
                       WHEN 'fr' THEN 7500 ELSE 10000 END AS rate_bp
           FROM documents)
         WHERE bucket < rate_bp""",
    // Mirrors Dedup.decontaminate: distinct 3-gram shingles, docs from
    // source 'src0' are the held-out benchmark; counts are exact ints,
    // the ratio one IEEE divide.
    "d09_decontaminate" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id, source,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, source, string_split(text, ' ') AS w
                 FROM documents)),
         bench AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),
         tr AS (SELECT doc_id, s FROM sh WHERE source <> 'src0'),
         sizes AS (SELECT doc_id, count(*) AS n FROM tr GROUP BY doc_id),
         hits AS (SELECT tr.doc_id, count(*) AS c FROM tr
                  JOIN bench ON tr.s = bench.s GROUP BY tr.doc_id)
         SELECT sz.doc_id, CAST(sz.n AS BIGINT) AS n_shingles,
           CAST(coalesce(h.c, 0) AS BIGINT) AS n_shared,
           CAST(coalesce(h.c, 0) AS DOUBLE) / CAST(sz.n AS DOUBLE)
             AS contam_ratio,
           CAST(coalesce(h.c, 0) AS DOUBLE) / CAST(sz.n AS DOUBLE) >= 0.5
             AS contaminated
         FROM sizes sz LEFT JOIN hits h ON sz.doc_id = h.doc_id""",
    // Mirrors Dedup.windowDupStats: positional (non-distinct) 8-word
    // windows, duplicated iff the same gram occurs in a smaller doc_id.
    "d10_window_dedup" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
                    FROM documents),
         g AS (SELECT doc_id,
                 unnest(list_transform(generate_series(1, greatest(len(w)-7, 0)),
                   i -> array_to_string(list_slice(w, i, i+7), ' '))) AS g
               FROM d),
         m AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY g) AS owner
               FROM g)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN owner < doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_windows,
           CAST(sum(CASE WHEN owner < doc_id THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS dup_frac
         FROM m GROUP BY doc_id""",
    // Mirrors Dedup.dupSpans: d10's positional windows with their word
    // offsets (zipped unnests), first-writer ownership, then the
    // pos - row_number() islands merge into maximal spans.
    "d15_dup_spans" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
                    FROM documents),
         g AS (SELECT doc_id,
                 unnest(generate_series(1, greatest(len(w)-7, 0))) - 1 AS pos,
                 unnest(list_transform(generate_series(1, greatest(len(w)-7, 0)),
                   i -> array_to_string(list_slice(w, i, i+7), ' '))) AS g
               FROM d),
         m AS (SELECT doc_id, pos, min(doc_id) OVER (PARTITION BY g) AS owner
               FROM g),
         dup AS (SELECT doc_id, pos FROM m WHERE owner < doc_id),
         isl AS (SELECT doc_id, pos,
                   pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                     AS island
                 FROM dup)
         SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) - min(pos) + 8 AS BIGINT) AS span_words,
           CAST(count(*) AS BIGINT) AS n_windows
         FROM isl GROUP BY doc_id, island HAVING count(*) >= 2""",
    // d15's span chain + the excision: span word positions (distinct —
    // islands closer than the window width overlap in coverage) are
    // anti-joined from the doc's words, survivors re-join in position
    // order; fully-excised docs keep an empty clean_text.
    "d19_span_removal" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
                    FROM documents),
         g AS (SELECT doc_id,
                 unnest(generate_series(1, greatest(len(w)-7, 0))) - 1 AS pos,
                 unnest(list_transform(generate_series(1, greatest(len(w)-7, 0)),
                   i -> array_to_string(list_slice(w, i, i+7), ' '))) AS g
               FROM d),
         m AS (SELECT doc_id, pos, min(doc_id) OVER (PARTITION BY g) AS owner
               FROM g),
         dup AS (SELECT doc_id, pos FROM m WHERE owner < doc_id),
         isl AS (SELECT doc_id, pos,
                   pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                     AS island
                 FROM dup),
         spans AS (SELECT doc_id, min(pos) AS span_start,
                     max(pos) - min(pos) + 8 AS span_words
                   FROM isl GROUP BY doc_id, island HAVING count(*) >= 2),
         rm AS (SELECT DISTINCT doc_id,
                  unnest(generate_series(span_start,
                    span_start + span_words - 1)) AS pos
                FROM spans),
         words AS (SELECT doc_id,
                     unnest(generate_series(1, len(w))) - 1 AS pos,
                     unnest(w) AS wd
                   FROM d),
         kept AS (SELECT wo.doc_id, count(*) AS n_kept,
                    array_to_string(list(wo.wd ORDER BY wo.pos), ' ')
                      AS clean_text
                  FROM words wo LEFT JOIN rm
                    ON wo.doc_id = rm.doc_id AND wo.pos = rm.pos
                  WHERE rm.doc_id IS NULL GROUP BY wo.doc_id)
         SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS n_words,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(len(d.w) - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed,
           coalesce(k.clean_text, '') AS clean_text
         FROM d LEFT JOIN kept k ON d.doc_id = k.doc_id""",
    // Mirrors Dedup.lshVerifiedPairs: d02's candidate CTEs verbatim,
    // then exact Jaccard for candidate pairs ONLY via a shared-shingle
    // count. LEFT JOIN keeps a (theoretical) zero-intersection h32
    // collision pair as jaccard 0 / dup false, matching the Spark
    // array_intersect path.
    // d27: per-banding precision/recall, truth = exact Jaccard >= 0.5
    // inside the finest banding's candidate universe.
    "d27_band_tuning" -> bandTuningOracleSql,
    // d28: the oracle is the NAIVE capped inverted-list join at the
    // same theta — the hash match proves prefix filtering lossless.
    // Capped-set Jaccard (sizes from the df<=100-filtered sets).
    "d28_prefix_join" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         df AS (SELECT s, count(*) AS c FROM sh GROUP BY s),
         shf AS (SELECT sh.doc_id, sh.s FROM sh
                 JOIN df ON sh.s = df.s WHERE df.c <= 100),
         sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
                   FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY a.doc_id, b.doc_id)
         SELECT da, db, jaccard FROM (
           SELECT da, db, CAST(c AS DOUBLE)/(sa.n + sb.n - c) AS jaccard
           FROM inter JOIN sizes sa ON da = sa.doc_id
                      JOIN sizes sb ON db = sb.doc_id)
         WHERE jaccard >= 0.5""",
    // m09: identical synthetic re-encode derivation; payload hashed
    // past the 4-byte container header, groups with >= 2 copies.
    "m09_container_dedup" ->
      """WITH d AS (SELECT doc_id, text FROM documents),
         w AS (SELECT doc_id,
                 CASE WHEN doc_id % 7 = 2 THEN doc_id - 2
                      ELSE doc_id END AS src_id
               FROM d),
         p AS (SELECT w.doc_id, s.text AS payload
               FROM w JOIN d s ON s.doc_id = w.src_id),
         b AS (SELECT doc_id,
                 (CASE doc_id % 3 WHEN 0 THEN 'RIFF' WHEN 1 THEN 'FTYP'
                       ELSE 'MKV$' END) || payload AS blob
               FROM p),
         f AS (SELECT doc_id, md5(blob) AS file_fp,
                 md5(substr(blob, 5)) AS payload_fp,
                 substr(blob, 1, 4) AS hdr
               FROM b)
         SELECT payload_fp, CAST(count(*) AS BIGINT) AS n_copies,
           CAST(count(DISTINCT file_fp) AS BIGINT) AS n_distinct_files,
           CAST(count(DISTINCT hdr) AS BIGINT) AS n_containers,
           CAST(min(doc_id) AS BIGINT) AS keep_id
         FROM f GROUP BY payload_fp HAVING count(*) >= 2""",
    "d11_lsh_verify" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         h AS (SELECT doc_id, ('0x' || substr(md5(s),1,8))::BIGINT AS hw FROM sh),
         mh AS (SELECT doc_id, j, min(((2*j+1)*hw + j*12345) % 4294967311) AS mv
                FROM h, generate_series(0,15) t(j) GROUP BY doc_id, j),
         bands AS (SELECT doc_id, j//4 AS band,
                     string_agg(mv, ',' ORDER BY j) AS sig
                   FROM mh GROUP BY doc_id, j//4),
         cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.sig = b.sig
                       AND a.doc_id < b.doc_id),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT c.da, c.db, count(*) AS c
                   FROM cand c JOIN sh a ON a.doc_id = c.da
                               JOIN sh b ON b.doc_id = c.db AND b.s = a.s
                   GROUP BY c.da, c.db),
         sel AS (SELECT c.da, c.db, coalesce(i.c, 0) AS c,
                   sa.n AS na, sb.n AS nb
                 FROM cand c
                 LEFT JOIN inter i ON i.da = c.da AND i.db = c.db
                 JOIN sizes sa ON sa.doc_id = c.da
                 JOIN sizes sb ON sb.doc_id = c.db)
         SELECT da, db, CAST(c AS DOUBLE) / (na + nb - c) AS jaccard,
           (CAST(c AS DOUBLE) / (na + nb - c)) >= 0.8 AS dup
         FROM sel""",
    // Mirrors TextAnalysis.rarityScore: the float fold runs in sorted
    // word order on BOTH engines (list(... ORDER BY w) + list_reduce ≡
    // sort_array(collect_list) + aggregate), so the double sum is
    // bit-identical — no ln/log anywhere (libm ulp risk).
    "t10_rarity" ->
      """WITH tok AS (
           SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
           FROM documents),
         tok2 AS (SELECT doc_id, w FROM tok WHERE w <> ''),
         dfc AS (SELECT doc_id, w,
                   count(*) OVER (PARTITION BY w) AS df FROM tok2),
         lst AS (SELECT doc_id, list(df ORDER BY w) AS l FROM dfc
                 GROUP BY doc_id)
         SELECT doc_id, CAST(len(l) AS BIGINT) AS n_terms,
           list_reduce(
             list_prepend(0.0, list_transform(l, x -> 1.0 / CAST(x AS DOUBLE))),
             (acc, v) -> acc + v) / CAST(len(l) AS DOUBLE) AS rarity
         FROM lst""",
    // Mirrors TextAnalysis.packSequences: the greedy walk (sequential by
    // construction) is a recursive CTE stepping through each shard's
    // md5-ordered docs; budget 256. First doc of a shard opens bin 0
    // whatever its size — same rule as the Spark fold.
    "t12_pack_sequences" ->
      """WITH RECURSIVE t AS (
           SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,4))::BIGINT % 8
               AS shard,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         seq AS (SELECT shard, doc_id, n_tokens,
                   row_number() OVER (PARTITION BY shard ORDER BY hx) AS pos
                 FROM t),
         walk(shard, pos, doc_id, n_tokens, bin, fill) AS (
           SELECT shard, pos, doc_id, n_tokens, CAST(0 AS BIGINT),
             n_tokens FROM seq WHERE pos = 1
           UNION ALL
           SELECT s.shard, s.pos, s.doc_id, s.n_tokens,
             CASE WHEN w.fill + s.n_tokens > 256 THEN w.bin + 1
                  ELSE w.bin END,
             CASE WHEN w.fill + s.n_tokens > 256 THEN s.n_tokens
                  ELSE w.fill + s.n_tokens END
           FROM walk w JOIN seq s
             ON s.shard = w.shard AND s.pos = w.pos + 1)
         SELECT doc_id, shard, n_tokens, bin FROM walk""",
    // Mirrors TextAnalysis.bigramLmScore: corpus-fitted add-one bigram
    // LM, per-doc mean conditional probability. No ln/log (libm ulp
    // risk) — every count is exact int64, each p is one IEEE divide,
    // and the per-doc sum folds in sorted bigram order on BOTH engines
    // (list(... ORDER BY g) + list_reduce ≡ sort_array(collect_list) +
    // aggregate), so the double is bit-identical.
    "t13_bigram_lm" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
                    FROM documents),
         g AS (SELECT doc_id,
                 unnest(list_transform(generate_series(1, greatest(len(w)-1, 0)),
                   i -> w[i] || ' ' || w[i+1])) AS g
               FROM w),
         cb AS (SELECT g, count(*) AS cb FROM g GROUP BY g),
         c1 AS (SELECT split_part(g, ' ', 1) AS w1, sum(cb) AS c1
                FROM cb GROUP BY 1),
         v AS (SELECT count(*) AS v FROM c1),
         p AS (SELECT doc_id, g.g AS g,
                 CAST(cb.cb + 1 AS DOUBLE) / CAST(c1.c1 + v.v AS DOUBLE) AS p
               FROM g JOIN cb ON g.g = cb.g
                      JOIN c1 ON split_part(g.g, ' ', 1) = c1.w1, v),
         lst AS (SELECT doc_id, list(p ORDER BY g) AS l FROM p
                 GROUP BY doc_id)
         SELECT doc_id, CAST(len(l) AS BIGINT) AS n_bigrams,
           list_reduce(list_prepend(0.0, l), (acc, x) -> acc + x)
             / CAST(len(l) AS DOUBLE) AS lm_score
         FROM lst""",
    // t34: t13's model chain, scored as cross-entropy in exact
    // 16-fraction-bit integer log2 — the identical ladder + squaring
    // stages the Spark plan evaluates (PortableMath generates both),
    // then plain integer SUM / integer compare: no double fold at all.
    "t34_perplexity" -> {
      import graft.functions.PortableMath
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
                    FROM documents),
         g AS (SELECT doc_id,
                 unnest(list_transform(generate_series(1, greatest(len(w)-1, 0)),
                   i -> w[i] || ' ' || w[i+1])) AS g
               FROM w),
         cb AS (SELECT g, count(*) AS cb FROM g GROUP BY g),
         c1 AS (SELECT split_part(g, ' ', 1) AS w1, sum(cb) AS c1
                FROM cb GROUP BY 1),
         v AS (SELECT count(*) AS v FROM c1),
         mdl AS (SELECT cb.g AS g,
                 CAST(c1.c1 + v.v AS DOUBLE) / CAST(cb.cb + 1 AS DOUBLE)
                   AS odds
               FROM cb JOIN c1 ON split_part(cb.g, ' ', 1) = c1.w1, v),
         ${PortableMath.log2FixedSqlStages("mdl", "odds", "lfx", "l2s")},
         agg AS (SELECT g.doc_id AS doc_id,
                   CAST(count(*) AS BIGINT) AS n_bigrams,
                   CAST(sum(s.lfx) AS BIGINT) AS score_fx
                 FROM g JOIN l2sout s ON g.g = s.g
                 GROUP BY g.doc_id)
         SELECT doc_id, n_bigrams, score_fx,
                CAST(score_fx AS DOUBLE)
                  / CAST(n_bigrams * 65536 AS DOUBLE) AS h_bits,
                score_fx < ${PipelineQueries.perplexityKeepBitsFx}
                  * n_bigrams AS keep
         FROM agg"""
    },
    // t35: identical integer-product odds per (source, word), the same
    // generated fixed-point log2 stages, integer KL sums, one final
    // double expression.
    "t35_js_drift" -> {
      import graft.functions.PortableMath
      s"""WITH tok AS (SELECT source AS src, unnest(string_split(text, ' ')) AS w
                    FROM documents),
         tok2 AS (SELECT src, w FROM tok WHERE w <> ''),
         c AS (SELECT src, w, CAST(count(*) AS BIGINT) AS cp
               FROM tok2 GROUP BY 1, 2),
         g AS (SELECT w, sum(cp) AS gw FROM c GROUP BY 1),
         tpf AS (SELECT src, sum(cp) AS tp FROM c GROUP BY 1),
         grid AS (SELECT tpf.src, tpf.tp, g.w, g.gw,
                    coalesce(c.cp, 0) AS cp,
                    g.gw - coalesce(c.cp, 0) AS cq,
                    (SELECT sum(gw) FROM g) - tpf.tp AS tq
                  FROM tpf CROSS JOIN g
                  LEFT JOIN c ON c.src = tpf.src AND c.w = g.w),
         pin AS (SELECT src, cp,
                   CAST(2 * cp * tq AS DOUBLE)
                     / CAST(cp * tq + cq * tp AS DOUBLE) AS odds
                 FROM grid WHERE cp > 0),
         ${PortableMath.log2FixedSqlStages("pin", "odds", "lfx", "l2p")},
         psum AS (SELECT src,
                    CAST(sum(CAST(cp AS HUGEINT) * lfx) AS BIGINT) AS sp_fx,
                    CAST(count(*) AS BIGINT) AS n_words_p
                  FROM l2pout GROUP BY 1),
         qin AS (SELECT src, cq,
                   CAST(2 * cq * tp AS DOUBLE)
                     / CAST(cp * tq + cq * tp AS DOUBLE) AS odds
                 FROM grid WHERE cq > 0),
         ${PortableMath.log2FixedSqlStages("qin", "odds", "lfx", "l2q")},
         qsum AS (SELECT src,
                    CAST(sum(CAST(cq AS HUGEINT) * lfx) AS BIGINT) AS sq_fx,
                    CAST(count(*) AS BIGINT) AS n_words_q
                  FROM l2qout GROUP BY 1),
         base AS (SELECT src, tp, (SELECT sum(gw) FROM g) - tp AS tq
                  FROM tpf)
         SELECT base.src AS source, CAST(base.tp AS BIGINT) AS tp,
           CAST(base.tq AS BIGINT) AS tq,
           psum.n_words_p, qsum.n_words_q, psum.sp_fx, qsum.sq_fx,
           0.5 * (CAST(psum.sp_fx AS DOUBLE)
                    / CAST(base.tp * 65536 AS DOUBLE)
                + CAST(qsum.sq_fx AS DOUBLE)
                    / CAST(base.tq * 65536 AS DOUBLE)) AS js_bits
         FROM base JOIN psum ON psum.src = base.src
                   JOIN qsum ON qsum.src = base.src"""
    },
    // t13's LM score chain + per-language discrete terciles
    // (rank-selected boundary values, q29's machinery) + map-side
    // CASE bucketing. head = top tercile (lm_score rises with
    // fluency, CCNet's low-perplexity side).
    "t20_ccnet_buckets" -> ccnetOracleSql,
    // st26 scores each arriving micro-batch against the STORED bigram
    // model + tercile boundaries; the frozen-model slice-union property
    // makes it land on t20's whole-corpus answer exactly.
    "st26_stream_lm_gate" -> ccnetOracleSql,
    // st27: the per-micro-batch partial profiles merged on read must
    // equal the whole-feed sketch profile — counts add, typed min/max
    // combine, global k-minima survive per-batch truncation. The
    // oracle computes the same KMV profile from scratch per column.
    "st27_stream_profile" ->
      Seq(("event_id", true), ("user_id", true),
        ("event_type", false), ("props", false))
        .map { case (c, isLong) => kmvProfileOracleBranch(c, isLong) }
        .mkString(" UNION ALL "),
    // q37: the identical integer-encoded greedy state machine —
    // acc = 10*completed + stage — replayed over the (ts, event_id)-
    // sorted type codes. NOT list_reduce: DuckDB 1.0.0's list_reduce
    // mis-folds when evaluated over many grouped rows at once (correct
    // on a single row — a vectorization bug, reproduced in-session);
    // the recursive CTE steps the same machine, and since every
    // transition is non-decreasing, max(acc) is the final state.
    "q37_cep_match" -> cepOracleSql,
    // q39: the identical capped-session recurrence — (anchor, prev,
    // nsess, ncap) stepped over each user's sorted event micros; both
    // counters are monotone, so max() reads the final state.
    "q39_capped_session" -> cappedSessionOracleSql,
    // q40: open/close via rank-1 selection under the same composite
    // (ts, event_id) order the min_by/max_by keys use; raw doubles
    // pass through both engines bit-identically.
    "q40_ohlc_bars" -> ohlcOracleSql,
    // st34 maintains the same bars in keyed state at ingest; per-key
    // event-time order makes open/close well-defined, so the batch
    // oracle is shared verbatim.
    "st34_stream_ohlc" -> ohlcOracleSql,
    // q41: the identical cross-multiplied z-test over the trailing
    // 7-day (n, Σx, Σx²) excluding the current day.
    "q41_daily_anomaly" -> dailyAnomalyOracleSql,
    // st45: q41's flags maintained online — ring state + gap-close
    // emission; shared oracle.
    "st45_stream_anomaly" -> dailyAnomalyOracleSql,
    // q38: discrete rank-selected quartile boundaries + exact
    // value-range bucket populations — tie-order-independent.
    "q38_histogram" ->
      """WITH r AS (SELECT l_returnflag AS g, l_extendedprice AS x
                    FROM lineitem),
         ranked AS (SELECT g, x,
                      row_number() OVER (PARTITION BY g ORDER BY x) AS rk,
                      count(*) OVER (PARTITION BY g) AS n
                    FROM r),
         b AS (SELECT g,
                 max(CASE WHEN rk = CAST(ceil(1 * n / 4.0) AS BIGINT)
                     THEN x END) AS b1,
                 max(CASE WHEN rk = CAST(ceil(2 * n / 4.0) AS BIGINT)
                     THEN x END) AS b2,
                 max(CASE WHEN rk = CAST(ceil(3 * n / 4.0) AS BIGINT)
                     THEN x END) AS b3,
                 max(CASE WHEN rk = CAST(ceil(4 * n / 4.0) AS BIGINT)
                     THEN x END) AS b4
               FROM ranked GROUP BY g)
         SELECT r.g AS l_returnflag,
           CASE WHEN r.x <= b.b1 THEN 1 WHEN r.x <= b.b2 THEN 2
                WHEN r.x <= b.b3 THEN 3 ELSE 4 END AS bucket,
           CAST(CASE WHEN r.x <= b.b1 THEN b.b1 WHEN r.x <= b.b2 THEN b.b2
                WHEN r.x <= b.b3 THEN b.b3 ELSE b.b4 END AS DOUBLE) AS hi,
           count(*) AS cnt
         FROM r JOIN b ON b.g = r.g
         GROUP BY 1, 2, 3""",
    // st30 runs the same machine in keyed state at ingest; monotone acc
    // + time-split replay land it on the identical batch answer.
    "st30_stream_cep" -> cepOracleSql,
    // st32 runs q39's capped-session recurrence in keyed state at
    // ingest; time-split replay preserves per-user order and both
    // counters are monotone, so the batch oracle is shared verbatim.
    "st32_stream_capped_session" -> cappedSessionOracleSql,
    // st35: every view row survives the left join; unmatched side
    // coalesced to -1 on both engines.
    "st35_stream_outer_join" ->
      """SELECT v.user_id, v.event_id AS view_id,
           coalesce(p.event_id, -1) AS purchase_id,
           coalesce(epoch_us(p.ts) - epoch_us(v.ts), -1) AS lag_us
         FROM (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'view') v
         LEFT JOIN (SELECT user_id, event_id, ts FROM events
                    WHERE event_type = 'purchase') p
           ON p.user_id = v.user_id AND p.ts > v.ts
             AND p.ts <= v.ts + INTERVAL 1 HOUR""",
    // st33: first-300-per-type admission in (ts, event_id) arrival
    // order; the boundary event id pins the ORDER, not just counts.
    "st33_stream_admission" ->
      """WITH r AS (SELECT event_type, event_id,
             row_number() OVER (PARTITION BY event_type
               ORDER BY ts, event_id) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM events)
         SELECT event_type,
           CAST(count(CASE WHEN rk <= 300 THEN 1 END) AS BIGINT)
             AS admitted,
           CAST(count(CASE WHEN rk > 300 THEN 1 END) AS BIGINT)
             AS rejected,
           CAST(max(CASE WHEN rk = least(n, 300) THEN event_id END)
             AS BIGINT) AS last_admitted
         FROM r GROUP BY event_type""",
    // q36/st29: in the Misra-Gries exact regime (capacity never
    // exceeded — the exact flag pins it) the summary merge IS the
    // exact count map, batch and online alike: one oracle for both.
    "q36_heavy_hitters" -> heavyHittersOracleSql,
    "st29_stream_heavy_hitters" -> heavyHittersOracleSql,
    // st28: the oracle replays the deterministic two-batch split and
    // the explicit watermark rule (wm for batch 2 = max b1 event time
    // minus 30 min): per hour window, on-time count + quarantined
    // late count.
    "st28_stream_quarantine" ->
      """WITH e AS (SELECT event_id, ts, epoch_us(ts) AS us FROM events),
         b1 AS (SELECT * FROM e WHERE event_id % 5 <> 0),
         b2 AS (SELECT * FROM e WHERE event_id % 5 = 0),
         wm AS (SELECT max(us) - 1800000000 AS w FROM b1),
         lt AS (SELECT b2.ts FROM b2, wm WHERE b2.us < wm.w),
         ot AS (SELECT ts FROM b1
                UNION ALL SELECT b2.ts FROM b2, wm WHERE b2.us >= wm.w),
         oc AS (SELECT date_trunc('hour', ts) AS window_start,
                  count(*) AS ontime_cnt FROM ot GROUP BY 1),
         lc AS (SELECT date_trunc('hour', ts) AS window_start,
                  count(*) AS late_cnt FROM lt GROUP BY 1)
         SELECT COALESCE(oc.window_start, lc.window_start) AS window_start,
           COALESCE(ontime_cnt, 0) AS ontime_cnt,
           COALESCE(late_cnt, 0) AS late_cnt
         FROM oc FULL OUTER JOIN lc ON lc.window_start = oc.window_start""",
    // Mirrors TextAnalysis.shuffleShard: md5-bucket shard, position =
    // rank of the full md5 hex within the shard.
    "t11_shuffle_shard" ->
      """SELECT doc_id,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,4))::BIGINT % 8
             AS shard,
           CAST(row_number() OVER (
             PARTITION BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,4))::BIGINT % 8
             ORDER BY md5(CAST(doc_id AS VARCHAR))) AS BIGINT) AS pos
         FROM documents""",
    // The lookup table mutates between the two micro-batches: rate 1
    // while ts <= mid (batch 1), rate 2 after (batch 2). mid is the
    // integer midpoint of min/max event time in micros — exactly
    // StreamingQueries.stageTwoBatches' split point. The SUM is cast:
    // DuckDB SUM(INTEGER) returns HUGEINT (int128), which the driver's
    // pandas bridge renders as float64 — hashing 150.0 against Spark's
    // int64 150 fails every row even though the values are equal (the
    // r03/r04 "st05 flake" was exactly this, never a timing race).
    "st05_stream_lookup_refresh" ->
      """WITH m AS (SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid
                    FROM events)
         SELECT CAST(user_id AS VARCHAR) AS key,
           CAST(SUM(CASE WHEN epoch_us(ts) <= mid THEN 1 ELSE 2 END) AS BIGINT) AS cnt
         FROM events, m GROUP BY user_id""",
    // Live visitor doubles every key present after the early half, then
    // the late half increments on the visited state: 2*early + late.
    "st09_stream_visitor" ->
      """WITH m AS (SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid
                    FROM events)
         SELECT CAST(user_id AS VARCHAR) AS key,
           CAST(2 * count(*) FILTER (WHERE epoch_us(ts) <= mid)
              + count(*) FILTER (WHERE epoch_us(ts) > mid) AS BIGINT) AS cnt
         FROM events, m GROUP BY user_id""",
    // Same oracle as batch q17 — append-mode watermark close-out must
    // preserve session semantics across the micro-batch split.
    "st06_stream_session" ->
      """WITH marked AS (
           SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 1 HOUR THEN 1 ELSE 0 END AS new_s
           FROM events),
         sess AS (
           SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
           FROM marked)
         SELECT CAST(user_id AS VARCHAR) AS key,
           epoch_us(min(ts)) AS session_start, count(*) AS cnt
         FROM sess GROUP BY user_id, sid""",
    // Same oracle as batch g16 — the stream-to-stream topic hop
    // (detector's blocks output feeding the live blocker query) must
    // preserve the chained-topology semantics.
    "st07_stream_chained" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
                count(*) // 10 AS n_blocks
         FROM events GROUP BY user_id HAVING count(*) >= 10""",
  )

  /** 60-term SimHash oracle, generated to mirror Dedup.simhash exactly. */
  private def simhashOracleSql: String = {
    val bitSums = (0 until 60)
      .map(i => s"sum((hw >> $i) & 1) AS c$i").mkString(", ")
    val simTerms = (0 until 60)
      .map(i => s"CASE WHEN 2*c$i > n THEN ${1L << i} ELSE 0 END")
      .mkString(" + ")
    s"""WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(text,' ')) AS w
                     FROM documents),
       h AS (SELECT doc_id, ('0x' || substr(md5(w),1,15))::BIGINT AS hw FROM tok),
       agg AS (SELECT doc_id, count(*) AS n, $bitSums FROM h GROUP BY doc_id)
       SELECT doc_id, CAST($simTerms AS BIGINT) AS simhash FROM agg"""
  }

  /** Banded SimHash pairing oracle: 4 bands of 15 bits, exact for
    * hamming ≤ 3 by pigeonhole — mirrors Dedup.simhashPairs. */
  private def simhashFidelityOracleSql: String = {
    val bitSums = (0 until 60)
      .map(i => s"sum((hw >> $i) & 1) AS c$i").mkString(", ")
    val simTerms = (0 until 60)
      .map(i => s"CASE WHEN 2*c$i > n THEN ${1L << i} ELSE 0 END")
      .mkString(" + ")
    s"""WITH tok AS (SELECT DISTINCT doc_id,
             unnest(string_split(text,' ')) AS w
           FROM documents),
       h AS (SELECT doc_id, ('0x' || substr(md5(w),1,15))::BIGINT AS hw
             FROM tok),
       agg AS (SELECT doc_id, count(*) AS n, $bitSums FROM h
               GROUP BY doc_id),
       sims AS (SELECT doc_id, CAST($simTerms AS BIGINT) AS simhash
                FROM agg),
       banded AS (
         SELECT doc_id, simhash, b AS band,
           (simhash >> (b*10)) & 1023 AS chunk
         FROM sims, generate_series(0,5) t(b)),
       pairs AS (
         SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS dist
         FROM banded a JOIN banded b
           ON a.band = b.band AND a.chunk = b.chunk
             AND a.doc_id < b.doc_id),
       p2 AS (SELECT da, db, dist FROM pairs WHERE dist <= 5),
       sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
       i AS (SELECT p2.da, p2.db, count(*) AS inter
             FROM p2 JOIN tok a ON a.doc_id = p2.da
               JOIN tok b ON b.doc_id = p2.db AND b.w = a.w
             GROUP BY p2.da, p2.db)
       SELECT p2.dist, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(coalesce(i.inter, 0)) AS BIGINT) AS inter_sum,
         CAST(sum(sa.n + sb.n - coalesce(i.inter, 0)) AS BIGINT)
           AS union_sum,
         CAST(sum(coalesce(i.inter, 0)) AS DOUBLE)
           / CAST(sum(sa.n + sb.n - coalesce(i.inter, 0)) AS DOUBLE)
           AS pooled_jaccard
       FROM p2 LEFT JOIN i ON p2.da = i.da AND p2.db = i.db
       JOIN sz sa ON sa.doc_id = p2.da
       JOIN sz sb ON sb.doc_id = p2.db
       GROUP BY p2.dist"""
  }

  private def simhashPairsOracleSql: String = {
    val bitSums = (0 until 60)
      .map(i => s"sum((hw >> $i) & 1) AS c$i").mkString(", ")
    val simTerms = (0 until 60)
      .map(i => s"CASE WHEN 2*c$i > n THEN ${1L << i} ELSE 0 END")
      .mkString(" + ")
    s"""WITH sims AS (
         WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(text,' ')) AS w
                      FROM documents),
         h AS (SELECT doc_id, ('0x' || substr(md5(w),1,15))::BIGINT AS hw FROM tok),
         agg AS (SELECT doc_id, count(*) AS n, $bitSums FROM h GROUP BY doc_id)
         SELECT doc_id, CAST($simTerms AS BIGINT) AS simhash FROM agg),
       banded AS (
         SELECT doc_id, simhash, b AS band, (simhash >> (b*15)) & 32767 AS chunk
         FROM sims, generate_series(0,3) t(b)),
       pairs AS (
         SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS dist
         FROM banded a JOIN banded b
           ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
       SELECT da, db, dist FROM pairs WHERE dist <= 3"""
  }

  /** Shared PQ oracle CTEs (no leading WITH): int-scaled vectors, the
    * 16-lowest-id centroid codebook cut into 4 subspaces (1-based
    * inclusive list slices = Spark's slice()), and the exact int64
    * squared-L2 distance of every (vector, subspace, centroid). */
  private def pqPreSql: String =
    """iv AS (SELECT vec_id,
           list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS iv
         FROM embeddings),
       cents AS (SELECT vec_id AS cid, iv FROM iv ORDER BY vec_id LIMIT 16),
       csub AS (SELECT s.s AS sub, cid, iv[s.s*16+1 : s.s*16+16] AS civ
                FROM cents, generate_series(0,3) s(s)),
       vsub AS (SELECT vec_id, s.s AS sub, iv[s.s*16+1 : s.s*16+16] AS sv
                FROM iv, generate_series(0,3) s(s)),
       d AS (SELECT vec_id, v.sub, cid,
               (SELECT sum((x-y)*(x-y))
                FROM (SELECT unnest(sv) AS x, unnest(civ) AS y)) AS dist
             FROM vsub v JOIN csub c ON v.sub = c.sub)"""

  /** Int-scaled embedding preprocessing shared by the vector oracles. */
  /** d27's oracle: d02's minhash chain banded once per configuration,
    * exact-Jaccard truth on the finest config's candidate universe
    * (coarser configs are subsets — contiguous banding), counts as
    * exact integers. Branches generated from the same configs list
    * the Spark plan uses. */
  private def bandTuningOracleSql: String = {
    val k = 16
    val configs = Seq(8, 4, 2)
    val finest = configs.max
    val perCfg = configs.map { b =>
      val rows = k / b
      s"""bands_$b AS (SELECT doc_id, j // $rows AS band,
             string_agg(mv, ',' ORDER BY j) AS sig
           FROM mh GROUP BY doc_id, j // $rows),
         cand_$b AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
           FROM bands_$b a JOIN bands_$b b
             ON a.band = b.band AND a.sig = b.sig
               AND a.doc_id < b.doc_id)"""
    }.mkString(",\n")
    val branches = configs.map { b =>
      s"""SELECT CAST($b AS BIGINT) AS bands,
           CAST(${k / b} AS BIGINT) AS rows_per_band,
           nc.n_candidates, nt.n_true, nh.n_hits,
           CASE WHEN nc.n_candidates > 0 THEN
             CAST(nh.n_hits AS DOUBLE) / CAST(nc.n_candidates AS DOUBLE)
             ELSE NULL END AS precision,
           CASE WHEN nt.n_true > 0 THEN
             CAST(nh.n_hits AS DOUBLE) / CAST(nt.n_true AS DOUBLE)
             ELSE NULL END AS recall
         FROM (SELECT CAST(count(*) AS BIGINT) AS n_candidates
               FROM cand_$b) nc,
              (SELECT CAST(count(*) AS BIGINT) AS n_true FROM truth) nt,
              (SELECT CAST(count(*) AS BIGINT) AS n_hits FROM cand_$b c
               JOIN truth u ON c.da = u.da AND c.db = u.db) nh"""
    }.mkString("\nUNION ALL\n")
    s"""WITH sh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
       h AS (SELECT doc_id, ('0x' || substr(md5(s),1,8))::BIGINT AS hw FROM sh),
       mh AS (SELECT doc_id, j, min(((2*j+1)*hw + j*12345) % 4294967311) AS mv
              FROM h, generate_series(0,${k - 1}) t(j) GROUP BY doc_id, j),
       $perCfg,
       sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       inter AS (SELECT c.da, c.db, count(*) AS c
                 FROM cand_$finest c JOIN sh a ON a.doc_id = c.da
                             JOIN sh b ON b.doc_id = c.db AND b.s = a.s
                 GROUP BY c.da, c.db),
       truth AS (SELECT c.da, c.db
                 FROM cand_$finest c
                 LEFT JOIN inter i ON i.da = c.da AND i.db = c.db
                 JOIN sizes sa ON sa.doc_id = c.da
                 JOIN sizes sb ON sb.doc_id = c.db
                 WHERE CAST(coalesce(i.c, 0) AS DOUBLE)
                   / (sa.n + sb.n - coalesce(i.c, 0)) >= 0.5)
       $branches"""
  }

  /** s37's oracle: the s13 IVF probe chain replayed once per probe
    * width against the s09 exact baseline, hit counts as exact
    * integers — all branches generated from the same probes list the
    * Spark plan uses. */
  private def probeRecallOracleSql: String = {
    val probes = Seq(1, 2, 4, 8)
    val perProbe = probes.map { p =>
      s"""qprobe_$p AS (SELECT vec_id, cid FROM scored
                    WHERE rn <= $p AND vec_id < 10),
         sims_$p AS (
           SELECT qa.vec_id AS qid, ca.vec_id AS nid,
             CAST((SELECT sum(x*y) FROM (SELECT unnest(qp.v) x, unnest(cp.v) y)) AS DOUBLE)
               / (sqrt(CAST(qp.n2 AS DOUBLE)) * sqrt(CAST(cp.n2 AS DOUBLE))) AS cos
           FROM qprobe_$p qa JOIN assign ca
             ON qa.cid = ca.cid AND ca.vec_id <> qa.vec_id
             JOIN pre qp ON qp.vec_id = qa.vec_id
             JOIN pre cp ON cp.vec_id = ca.vec_id),
         topk_$p AS (SELECT qid, nid FROM (
             SELECT qid, nid,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
             FROM sims_$p) WHERE rank <= 10)"""
    }.mkString(",\n")
    val branches = probes.map { p =>
      s"""SELECT CAST($p AS BIGINT) AS n_probe,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(t.nid) AS BIGINT) AS n_hits,
           CAST(count(t.nid) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             AS recall
         FROM exact e LEFT JOIN topk_$p t
           ON e.qid = t.qid AND e.nid = t.nid"""
    }.mkString("\nUNION ALL\n")
    s"""WITH pre AS ($embPreSql),
       cents AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2
                 FROM pre ORDER BY vec_id LIMIT 16),
       scored AS (
         SELECT p.vec_id, c.cid,
           row_number() OVER (PARTITION BY p.vec_id ORDER BY
             CAST((SELECT sum(x*y) FROM (SELECT unnest(p.v) x, unnest(c.cv) y)) AS DOUBLE)
               / (sqrt(CAST(p.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC,
             c.cid) AS rn
         FROM pre p, cents c),
       assign AS (SELECT vec_id, cid FROM scored WHERE rn = 1),
       exact AS (SELECT qid, nid FROM (
           SELECT qid, nid,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
           FROM (
             SELECT q.vec_id AS qid, c.vec_id AS nid,
               CAST((SELECT sum(x*y) FROM (SELECT unnest(q.v) x, unnest(c.v) y)) AS DOUBLE)
                 / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) AS cos
             FROM pre q JOIN pre c ON c.vec_id <> q.vec_id
             WHERE q.vec_id < 10))
         WHERE rank <= 10),
       $perProbe
       $branches"""
  }

  /** Shared by q60 (batch conditional mins) and st48 (streaming
    * first-qualifying-arrival state): both must produce the identical
    * bounded-funnel counts. */
  /** q66/st50 shared oracle: distinct-user conversion per arm + the
    * cross-multiplied two-proportion z-test in HUGEINT; `//` truncates
    * toward zero exactly like Spark's `div` for the signed lift. */
  private def abTestOracleSql: String =
    """WITH e AS (SELECT event_type, user_id, user_id % 2 AS arm
           FROM events),
       u AS (SELECT DISTINCT user_id, arm FROM e),
       a AS (SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS na,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS nb FROM u),
       cv AS (SELECT event_type,
               CAST(count(DISTINCT CASE WHEN arm = 0 THEN user_id END)
                 AS BIGINT) AS ca,
               CAST(count(DISTINCT CASE WHEN arm = 1 THEN user_id END)
                 AS BIGINT) AS cb
             FROM e GROUP BY 1)
       SELECT cv.event_type, a.na, a.nb, cv.ca, cv.cb,
         CAST(CASE WHEN cv.ca * a.nb = 0 THEN NULL ELSE
           (cv.cb * a.na - cv.ca * a.nb) * 1000000 // (cv.ca * a.nb)
           END AS BIGINT) AS lift_ppm,
         CAST(cv.ca * a.nb - cv.cb * a.na AS HUGEINT)
           * CAST(cv.ca * a.nb - cv.cb * a.na AS HUGEINT)
           * (a.na + a.nb)
           > 4 * CAST(cv.ca + cv.cb AS HUGEINT)
             * ((a.na + a.nb) - (cv.ca + cv.cb)) * a.na * a.nb
           AS significant
       FROM cv, a"""

  private def windowedFunnelOracleSql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
           FROM events),
       s1 AS (SELECT user_id, min(us) AS t1 FROM e
              WHERE event_type = 'view' GROUP BY 1),
       s2 AS (SELECT e.user_id, min(us) AS t2 FROM e
              JOIN s1 USING (user_id)
              WHERE event_type = 'click' AND us > t1
                AND us <= t1 + 86400000000 GROUP BY 1),
       s3 AS (SELECT e.user_id, min(us) AS t3 FROM e
              JOIN s2 USING (user_id)
              WHERE event_type = 'purchase' AND us > t2
                AND us <= t2 + 259200000000 GROUP BY 1)
       SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_viewed,
         (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_clicked_1d,
         (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchased_3d"""

  /** Shared by q59 (batch running-max window) and st47 (streaming
    * 4-long keyed state): both must produce the identical per-user
    * coverage row. */
  private def intervalCoverageOracleSql: String =
    """WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
             epoch_us(ts) + 1800000000 AS e, event_id FROM events),
       x AS (SELECT user_id, s, e,
               max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS pm
             FROM iv)
       SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN pm IS NULL THEN 1800000000
                   ELSE greatest(0, e - greatest(s, pm)) END)
           AS BIGINT) AS covered_us,
         CAST(sum(CASE WHEN pm IS NULL OR pm < s THEN 1 ELSE 0 END)
           AS BIGINT) AS n_blocks
       FROM x GROUP BY user_id"""

  /** Shared by q41 (batch trailing-7-row window) and st45 (streaming
    * ring state): both must produce the identical per-day flag row. */
  private def dailyAnomalyOracleSql: String =
    """WITH dcount AS (SELECT date_trunc('day', ts) AS day, event_type,
           CAST(count(*) AS BIGINT) AS cnt
         FROM events GROUP BY 1, 2),
       w AS (SELECT day, event_type, cnt,
           CAST(count(cnt) OVER wd AS BIGINT) AS n,
           CAST(coalesce(sum(cnt) OVER wd, 0) AS BIGINT) AS s,
           CAST(coalesce(sum(cnt*cnt) OVER wd, 0) AS BIGINT) AS q
         FROM dcount
         WINDOW wd AS (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
       SELECT day, event_type, cnt,
         n >= 3 AND (n*cnt - s)*(n*cnt - s) > 4*(n*q - s*s)
           AS is_anomaly
       FROM w"""

  /** Shared by q28 (batch RANGE frame) and st15 (streaming deque):
    * both must produce the identical per-event trailing-hour row. */
  private def slidingOracleSql: String =
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                    value
                  FROM events)
       SELECT event_id,
         CAST(count(*) OVER w AS BIGINT) AS n_hour,
         CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
           AS sum_hour
       FROM e
       WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                    RANGE BETWEEN 3600000000 PRECEDING
                          AND CURRENT ROW)"""

  /** t22's oracle: the BM25 pipeline with the idf's `ln` rendered by
    * the SAME PortableMath ladder/series constants the Spark plan
    * evaluates — the two expression trees are generated from one
    * source and cannot drift. Flat CTE stages name each intermediate
    * once (k, m, z, z2), mirroring withLn's single-use projections. */
  private def bm25OracleSql: String = {
    import graft.functions.PortableMath
    s"""WITH qt(qid, term) AS (VALUES
       |     ('b1','spark'),('b1','join'),
       |     ('b2','dup'),('b2','scan'),('b2','merge'),
       |     ('b3','vector')),
       |   d AS (SELECT doc_id,
       |           list_filter(string_split(text, ' '), x -> x != '') AS ws
       |         FROM documents),
       |   dz AS (SELECT doc_id, len(ws) AS dl, ws FROM d),
       |   st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dz),
       |   tok AS (SELECT doc_id, dl, unnest(ws) AS w FROM dz),
       |   tf AS (SELECT doc_id, dl, w, count(*) AS tf FROM tok
       |          WHERE w IN ('spark','join','dup','scan','merge','vector')
       |          GROUP BY 1, 2, 3),
       |   dft AS (SELECT w, count(*) AS dft FROM tf GROUP BY 1),
       |   odds AS (SELECT w,
       |       (CAST(st.n_docs AS DOUBLE) - CAST(dft.dft AS DOUBLE) + 0.5)
       |         / (CAST(dft.dft AS DOUBLE) + 0.5) AS odds
       |     FROM dft, st),
       |   lkm AS (SELECT w, odds,
       |       ${PortableMath.kLadderSql("odds")} AS k,
       |       ${PortableMath.mLadderSql("odds")} AS m
       |     FROM odds),
       |   lz AS (SELECT w, k, (m - 1.0) / (m + 1.0) AS z FROM lkm),
       |   lz2 AS (SELECT w, k, z, z * z AS z2 FROM lz),
       |   idf AS (SELECT w,
       |       ${PortableMath.recombineSql("k", "z", "z2")} AS idf
       |     FROM lz2),
       |   contrib AS (SELECT qt.qid, tf.doc_id, tf.w,
       |       idf.idf
       |       * ((CAST(tf.tf AS DOUBLE) * (1.5 + 1.0))
       |          / (CAST(tf.tf AS DOUBLE) + 1.5 * (1.0 - 0.75 + 0.75 *
       |              (CAST(tf.dl AS DOUBLE)
       |               / (CAST(st.sum_dl AS DOUBLE)
       |                  / CAST(st.n_docs AS DOUBLE)))))) AS c
       |     FROM tf JOIN idf ON tf.w = idf.w
       |             JOIN qt ON tf.w = qt.term, st),
       |   agg AS (SELECT qid, doc_id, count(*) AS n_hit_terms,
       |             list(c ORDER BY w) AS l
       |           FROM contrib GROUP BY 1, 2),
       |   scored AS (SELECT qid, doc_id, n_hit_terms,
       |                list_reduce(list_prepend(0.0, l), (a, x) -> a + x)
       |                  AS bm25
       |              FROM agg),
       |   ranked AS (SELECT *, row_number() OVER
       |                (PARTITION BY qid
       |                 ORDER BY bm25 DESC, doc_id) AS rank
       |              FROM scored)
       |   SELECT qid, doc_id, n_hit_terms, bm25, rank
       |   FROM ranked WHERE rank <= 10""".stripMargin
  }

  /** Shared by s10 (train-then-search in one plan) and s25 (search
    * from the persisted index artifact): both must produce the same
    * trained-IVF result table. */
  private def ivfTrainedOracleSql: String = ivfTrainedOracleSqlOver("TRUE")

  /** The two-round-Lloyd training + full-corpus assignment chain
    * (`pre` … `cents2` … `assignT`), TRAINING restricted to
    * `baseWhere`. Shared by the IVF serving oracles and s33's
    * quantization-error rollup. */
  private def ivfAssignChainSql(baseWhere: String): String =
    s"""WITH pre AS ($embPreSql),
         cents0 AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2
                    FROM pre WHERE $baseWhere ORDER BY vec_id LIMIT 16),
         asg1 AS (
           SELECT vec_id, cid FROM (
             SELECT p.vec_id, c.cid,
               row_number() OVER (PARTITION BY p.vec_id ORDER BY
                 CAST((SELECT sum(x*y) FROM (SELECT unnest(p.v) x, unnest(c.cv) y)) AS DOUBLE)
                   / (sqrt(CAST(p.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC,
                 c.cid) AS rn
             FROM (SELECT * FROM pre WHERE $baseWhere) p, cents0 c) WHERE rn = 1),
         cd1 AS (
           SELECT a.cid, t.i AS d,
             CAST(floor(CAST(sum(p.v[t.i]) AS DOUBLE) / count(*)) AS BIGINT) AS cval
           FROM asg1 a JOIN pre p ON p.vec_id = a.vec_id,
             LATERAL (SELECT unnest(generate_series(1, len(p.v))) AS i) t
           GROUP BY a.cid, t.i),
         cents1 AS (
           SELECT cid, cv,
             CAST((SELECT sum(e*e) FROM unnest(cv) t(e)) AS BIGINT) AS cn2
           FROM (SELECT cid, list(cval ORDER BY d) AS cv FROM cd1 GROUP BY cid)),
         asg2 AS (
           SELECT vec_id, cid FROM (
             SELECT p.vec_id, c.cid,
               row_number() OVER (PARTITION BY p.vec_id ORDER BY
                 CAST((SELECT sum(x*y) FROM (SELECT unnest(p.v) x, unnest(c.cv) y)) AS DOUBLE)
                   / (sqrt(CAST(p.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC,
                 c.cid) AS rn
             FROM (SELECT * FROM pre WHERE $baseWhere) p, cents1 c) WHERE rn = 1),
         cd2 AS (
           SELECT a.cid, t.i AS d,
             CAST(floor(CAST(sum(p.v[t.i]) AS DOUBLE) / count(*)) AS BIGINT) AS cval
           FROM asg2 a JOIN pre p ON p.vec_id = a.vec_id,
             LATERAL (SELECT unnest(generate_series(1, len(p.v))) AS i) t
           GROUP BY a.cid, t.i),
         cents2 AS (
           SELECT cid, cv,
             CAST((SELECT sum(e*e) FROM unnest(cv) t(e)) AS BIGINT) AS cn2
           FROM (SELECT cid, list(cval ORDER BY d) AS cv FROM cd2 GROUP BY cid)),
         assignT AS (
           SELECT vec_id, cid FROM (
             SELECT p.vec_id, c.cid,
               row_number() OVER (PARTITION BY p.vec_id ORDER BY
                 CAST((SELECT sum(x*y) FROM (SELECT unnest(p.v) x, unnest(c.cv) y)) AS DOUBLE)
                   / (sqrt(CAST(p.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC,
                 c.cid) AS rn
             FROM pre p, cents2 c) WHERE rn = 1)"""

  /** The chain + cell-probe top-k serving select. `TRUE` =
    * s10/s25/st24's everything-trains form; s26 trains on the base
    * slice only. `candWhere` (over `ca.vec_id`) additionally restricts
    * the RETURNABLE candidates — s31's tombstone-delete serving, where
    * deleted vectors may query but never appear as neighbors. */
  private def ivfTrainedOracleSqlOver(baseWhere: String,
      candWhere: String = "TRUE"): String =
    s"""${ivfAssignChainSql(baseWhere)},
         sims AS (
           SELECT qa.vec_id AS qid, ca.vec_id AS nid,
             CAST((SELECT sum(x*y) FROM (SELECT unnest(qp.v) x, unnest(cp.v) y)) AS DOUBLE)
               / (sqrt(CAST(qp.n2 AS DOUBLE)) * sqrt(CAST(cp.n2 AS DOUBLE))) AS cos
           FROM assignT qa JOIN assignT ca
             ON qa.cid = ca.cid AND ca.vec_id <> qa.vec_id
             JOIN pre qp ON qp.vec_id = qa.vec_id
             JOIN pre cp ON cp.vec_id = ca.vec_id
           WHERE qa.vec_id < 10 AND ($candWhere))
         SELECT qid, nid, cos, rank FROM (
           SELECT qid, nid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
           FROM sims)
         WHERE rank <= 10"""

  /** s33: per-(cell, scope) exact quantization error under the
    * base-trained model — d22's integer Σ‖v−c‖² arithmetic against the
    * ASSIGNED centroid. */
  private def indexDriftOracleSql: String =
    s"""${ivfAssignChainSql("vec_id % 10 <> 7")},
         sqd AS (
           SELECT a.cid, a.vec_id,
             CAST((SELECT sum((x - y) * (x - y))
                   FROM (SELECT unnest(p.v) x, unnest(c.cv) y)) AS BIGINT)
               AS d2
           FROM assignT a JOIN pre p ON p.vec_id = a.vec_id
                          JOIN cents2 c ON c.cid = a.cid)
         SELECT cid AS cell,
           CASE WHEN vec_id % 10 = 7 THEN 'add' ELSE 'base' END AS scope,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(sum(d2) AS BIGINT) AS sum_sqd
         FROM sqd GROUP BY 1, 2"""

  /** s34: the Lloyd chain replayed TWICE — frozen (base-trained) and
    * retrained (all-trained) — with the chain's CTE names suffixed so
    * both live in one WITH; per (cell, model) exact error rollup. */
  private def retrainResponseOracleSql: String = {
    val names = Seq("pre", "cents0", "asg1", "cd1", "cents1", "asg2",
      "cd2", "cents2", "assignT")
    def chain(baseWhere: String, sfx: String): String =
      names.foldLeft(ivfAssignChainSql(baseWhere).stripPrefix("WITH "))(
        (s, n) => s.replaceAll("\\b" + n + "\\b", n + sfx))
    def err(sfx: String, label: String): String =
      s"""sqd$sfx AS (
           SELECT a.cid, a.vec_id,
             CAST((SELECT sum((x - y) * (x - y))
                   FROM (SELECT unnest(p.v) x, unnest(c.cv) y)) AS BIGINT)
               AS d2
           FROM assignT$sfx a JOIN pre$sfx p ON p.vec_id = a.vec_id
                          JOIN cents2$sfx c ON c.cid = a.cid),
         err$sfx AS (
           SELECT cid AS cell, '$label' AS scope,
             CAST(count(*) AS BIGINT) AS n_vectors,
             CAST(sum(d2) AS BIGINT) AS sum_sqd
           FROM sqd$sfx GROUP BY 1, 2)"""
    s"""WITH ${chain("vec_id % 10 <> 7", "_f")},
         ${chain("TRUE", "_r")},
         ${err("_f", "frozen")},
         ${err("_r", "retrained")}
         SELECT * FROM err_f UNION ALL SELECT * FROM err_r"""
  }

  /** s36: the s06 codebook recipe run twice — natural dims and the
    * balanced-energy permutation (1-based list indexing here, 0-based
    * in the engine; same ordering, same permutation). */
  private def opqLiteOracleSql: String = {
    def chain(src: String, sfx: String): String =
      s"""cents$sfx AS (SELECT vec_id AS cid, iv FROM $src
             ORDER BY vec_id LIMIT 16),
         csub$sfx AS (SELECT s.s AS sub, cid,
               iv[s.s*16+1 : s.s*16+16] AS civ
             FROM cents$sfx, generate_series(0,3) s(s)),
         vsub$sfx AS (SELECT vec_id, s.s AS sub,
               iv[s.s*16+1 : s.s*16+16] AS sv
             FROM $src, generate_series(0,3) s(s)),
         d$sfx AS (SELECT vec_id, v.sub,
               (SELECT sum((x-y)*(x-y))
                FROM (SELECT unnest(sv) AS x, unnest(civ) AS y)) AS dist
             FROM vsub$sfx v JOIN csub$sfx c ON v.sub = c.sub),
         err$sfx AS (SELECT CAST(sum(md) AS BIGINT) AS err2_total FROM
             (SELECT vec_id, sub, min(dist) AS md FROM d$sfx
              GROUP BY 1, 2))"""
    s"""WITH iv AS (SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS iv
           FROM embeddings),
         en AS (SELECT d.d AS d, sum(iv[d.d] * iv[d.d]) AS en
                FROM iv, generate_series(1, 64) d(d) GROUP BY 1),
         rk AS (SELECT d, row_number() OVER (ORDER BY en DESC, d) - 1
                  AS i FROM en),
         perm AS (SELECT list(d ORDER BY i % 4, i // 4) AS p FROM rk),
         pv AS (SELECT vec_id, list_transform(generate_series(1, 64),
                  j -> iv[p[j]]) AS iv FROM iv, perm),
         n AS (SELECT CAST(count(*) AS BIGINT) AS n_vectors FROM iv),
         ${chain("iv", "N")},
         ${chain("pv", "P")}
         SELECT 'natural' AS variant, n.n_vectors, errN.err2_total
           FROM n, errN
         UNION ALL
         SELECT 'opq', n.n_vectors, errP.err2_total FROM n, errP"""
  }

  /** Shared by q32 (batch gaps-and-islands) and st22 (streaming keyed
    * CDC apply): both must land on this SCD2 version table. */
  private def scd2OracleSql: String =
    """WITH t AS (
         SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           CAST(floor(value/100) AS BIGINT) AS tier
         FROM events),
       f AS (
         SELECT user_id, ts_us, event_id, tier,
           CASE WHEN lag(tier) OVER w IS NULL
                  OR lag(tier) OVER w <> tier
             THEN 1 ELSE 0 END AS chg
         FROM t
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       v AS (
         SELECT user_id, tier, ts_us,
           CAST(sum(chg) OVER (PARTITION BY user_id
             ORDER BY ts_us, event_id) AS BIGINT) AS version
         FROM f),
       runs AS (
         SELECT user_id, version, min(tier) AS tier,
           min(ts_us) AS valid_from
         FROM v GROUP BY user_id, version)
       SELECT user_id, version, tier, valid_from,
         lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
           AS valid_to
       FROM runs"""

  /** Shared by q27 (batch window + distinct) and st14 (streaming
    * variable-length offset-array state machine): both must land on
    * this cohort table. */
  private def retentionOracleSql: String =
    """WITH e AS (SELECT user_id,
                    CAST(date_trunc('week', ts) AS DATE) AS wk
                  FROM events),
       u AS (SELECT user_id, wk,
               min(wk) OVER (PARTITION BY user_id) AS cohort
             FROM e),
       d AS (SELECT DISTINCT user_id, cohort, wk FROM u)
       SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
         CAST(date_diff('day', cohort, wk) // 7 AS BIGINT)
           AS week_offset,
         CAST(count(*) AS BIGINT) AS active_users
       FROM d GROUP BY 1, 2"""

  /** Shared by c04 (batch fp-window card) and st19 (streaming
    * fingerprint stage + per-cell counters): one card, two execution
    * models, one oracle. */
  private def cardOracleSql: String =
    """WITH m AS (
         SELECT lang, source,
           len(string_split(text, ' ')) AS nw,
           length(text) AS nc,
           count(*) OVER (PARTITION BY md5(text)) AS fp_cnt,
           ((len(string_split(text, ' ')) >= 50
               AND len(string_split(text, ' ')) <= 100000)
             AND (CAST(length(text) - len(string_split(text, ' ')) + 1
                    AS DOUBLE) / CAST(len(string_split(text, ' '))
                    AS DOUBLE) >= 3.0
               AND CAST(length(text) - len(string_split(text, ' ')) + 1
                    AS DOUBLE) / CAST(len(string_split(text, ' '))
                    AS DOUBLE) <= 10.0)
             AND (CAST(len(list_filter(string_split(text, ' '),
                    w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
               >= CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.8)
             AND (len(list_distinct(list_filter(
                    string_split(lower(text), ' '),
                    w -> w IN ('the','be','to','of','and','that',
                               'have','with')))) >= 1)) AS keep
         FROM documents)
       SELECT lang, source,
         count(*) AS n_docs,
         CAST(sum(nw) AS BIGINT) AS total_tokens,
         CAST(sum(nc) AS BIGINT) AS total_chars,
         CAST(sum(CASE WHEN fp_cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS dup_docs,
         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
           AS gate_pass,
         CAST(sum(CASE WHEN fp_cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS dup_rate,
         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS pass_rate
       FROM m GROUP BY lang, source"""

  /** Shared by t14 (two-level batch k-min) and st18 (streaming
    * first-seen folds + O(k) minima state): one KMV sketch, two
    * execution models, one oracle. */
  private def kmvOracleSql: String =
    """WITH tok AS (
         SELECT DISTINCT lang AS stratum, unnest(string_split(text, ' ')) AS w
         FROM documents),
       tok2 AS (SELECT stratum, w FROM tok WHERE w <> ''),
       hs AS (SELECT DISTINCT stratum,
                ('0x' || substr(md5(w),1,8))::BIGINT AS hw
              FROM tok2),
       ranked AS (SELECT stratum, hw,
                    row_number() OVER (PARTITION BY stratum ORDER BY hw) AS rn
                  FROM hs),
       agg AS (SELECT stratum, count(*) AS n_hashes,
                 max(CASE WHEN rn <= 16 THEN hw END) AS kth
               FROM ranked GROUP BY stratum),
       ex AS (SELECT stratum, count(*) AS n_exact FROM tok2
              GROUP BY stratum)
       SELECT e.stratum, e.n_exact, a.n_hashes,
         CASE WHEN a.n_hashes >= 16 THEN a.kth END AS kth_hash,
         CASE WHEN a.n_hashes >= 16
           THEN CAST(64424509440 AS DOUBLE) / CAST(a.kth AS DOUBLE)
           ELSE CAST(e.n_exact AS DOUBLE) END AS est_distinct
       FROM ex e JOIN agg a ON a.stratum = e.stratum"""

  /** Shared by q26 (batch window chain) and st13 (streaming state
    * machine): both must land on this exact funnel. */
  private def funnelOracleSql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
                  FROM events),
       s1 AS (SELECT user_id, min(ts_us) AS t1 FROM e
              WHERE event_type = 'view' GROUP BY 1),
       s2 AS (SELECT e.user_id, min(e.ts_us) AS t2 FROM e
              JOIN s1 USING (user_id)
              WHERE e.event_type = 'click' AND e.ts_us > s1.t1
              GROUP BY 1),
       s3 AS (SELECT e.user_id, min(e.ts_us) AS t3 FROM e
              JOIN s2 USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts_us > s2.t2
              GROUP BY 1)
       SELECT 'step1_view' AS step,
              (SELECT count(*) FROM s1) AS users
       UNION ALL SELECT 'step2_click', (SELECT count(*) FROM s2)
       UNION ALL SELECT 'step3_purchase', (SELECT count(*) FROM s3)"""

  /** Shared by t20 (batch CCNet gate) and st26 (the same gate applied
    * per micro-batch against the stored model + boundaries): the
    * frozen-model slice-union property means both must land on exactly
    * this whole-corpus answer. */
  private def ccnetOracleSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
                    FROM documents),
         g AS (SELECT doc_id,
                 unnest(list_transform(generate_series(1, greatest(len(w)-1, 0)),
                   i -> w[i] || ' ' || w[i+1])) AS g
               FROM w),
         cb AS (SELECT g, count(*) AS cb FROM g GROUP BY g),
         c1 AS (SELECT split_part(g, ' ', 1) AS w1, sum(cb) AS c1
                FROM cb GROUP BY 1),
         v AS (SELECT count(*) AS v FROM c1),
         p AS (SELECT doc_id, g.g AS g,
                 CAST(cb.cb + 1 AS DOUBLE) / CAST(c1.c1 + v.v AS DOUBLE) AS p
               FROM g JOIN cb ON g.g = cb.g
                      JOIN c1 ON split_part(g.g, ' ', 1) = c1.w1, v),
         lst AS (SELECT doc_id, list(p ORDER BY g) AS l FROM p
                 GROUP BY doc_id),
         sc AS (SELECT lst.doc_id, d.lang,
                  list_reduce(list_prepend(0.0, l), (acc, x) -> acc + x)
                    / CAST(len(l) AS DOUBLE) AS lm_score
                FROM lst JOIN documents d ON lst.doc_id = d.doc_id),
         ranked AS (SELECT doc_id, lang, lm_score,
                  row_number() OVER (PARTITION BY lang
                                     ORDER BY lm_score, doc_id) AS rk,
                  count(*) OVER (PARTITION BY lang) AS n
                FROM sc),
         bounds AS (SELECT lang,
                  max(CASE WHEN rk = CAST(ceil(n / 3.0) AS BIGINT)
                      THEN lm_score END) AS b1,
                  max(CASE WHEN rk = CAST(ceil(2 * n / 3.0) AS BIGINT)
                      THEN lm_score END) AS b2
                FROM ranked GROUP BY lang)
         SELECT sc.doc_id, sc.lang, sc.lm_score,
           CASE WHEN sc.lm_score <= b.b1 THEN 'tail'
                WHEN sc.lm_score <= b.b2 THEN 'middle'
                ELSE 'head' END AS bucket
         FROM sc JOIN bounds b ON sc.lang = b.lang"""

  /** c13 + st37: the 7-day partition-pruned serving aggregate, stated
    * over the unpartitioned fixture — layout (and the batch-vs-stream
    * ingest path that produced it) must never change answers. */
  private def lakeServeOracleSql: String =
    """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(event_id) AS BIGINT) AS id_sum,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         FROM events
         WHERE CAST(ts AS DATE)
           BETWEEN DATE '2024-01-10' AND DATE '2024-01-16'
         GROUP BY 1, 2"""

  /** d02's MinHash-LSH candidate pairs closed transitively into
    * components: walk(x, l) = "l reaches x"; cluster = min reachable
    * id, singletons keep their own id. Shared by d07 (the cluster
    * table itself) and t32 (the leakage-free split keyed on it). */
  private def clusterChainSql: String =
    """WITH RECURSIVE sh AS (
           SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         h AS (SELECT doc_id, ('0x' || substr(md5(s),1,8))::BIGINT AS hw FROM sh),
         mh AS (SELECT doc_id, j, min(((2*j+1)*hw + j*12345) % 4294967311) AS mv
                FROM h, generate_series(0,15) t(j) GROUP BY doc_id, j),
         bands AS (SELECT doc_id, j//4 AS band,
                     string_agg(mv, ',' ORDER BY j) AS sig
                   FROM mh GROUP BY doc_id, j//4),
         pairs AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
                   FROM bands a JOIN bands b
                     ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         edges AS (SELECT da AS src, db AS dst FROM pairs
                   UNION ALL SELECT db, da FROM pairs),
         walk(id, lbl) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.dst, w.lbl FROM walk w JOIN edges e ON w.id = e.src)"""

  /** The d14 two-round Lloyd chain: sampled seeds → assign → exact
    * floor-mean update ×2 → final assignment `assignT (vec_id, cid)`.
    * Shared by d14 (semantic dedup over trained cells) and d22 (medoid
    * per trained cell). Expects a `pre` CTE in scope. */
  private def lloydAssignSql: String =
    """cents0 AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2
                    FROM pre ORDER BY vec_id LIMIT 16),
         asg1 AS (
           SELECT vec_id, cid FROM (
             SELECT p.vec_id, c.cid,
               row_number() OVER (PARTITION BY p.vec_id ORDER BY
                 CAST((SELECT sum(x*y) FROM (SELECT unnest(p.v) x, unnest(c.cv) y)) AS DOUBLE)
                   / (sqrt(CAST(p.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC,
                 c.cid) AS rn
             FROM pre p, cents0 c) WHERE rn = 1),
         cd1 AS (
           SELECT a.cid, t.i AS d,
             CAST(floor(CAST(sum(p.v[t.i]) AS DOUBLE) / count(*)) AS BIGINT) AS cval
           FROM asg1 a JOIN pre p ON p.vec_id = a.vec_id,
             LATERAL (SELECT unnest(generate_series(1, len(p.v))) AS i) t
           GROUP BY a.cid, t.i),
         cents1 AS (
           SELECT cid, cv,
             CAST((SELECT sum(e*e) FROM unnest(cv) t(e)) AS BIGINT) AS cn2
           FROM (SELECT cid, list(cval ORDER BY d) AS cv FROM cd1 GROUP BY cid)),
         asg2 AS (
           SELECT vec_id, cid FROM (
             SELECT p.vec_id, c.cid,
               row_number() OVER (PARTITION BY p.vec_id ORDER BY
                 CAST((SELECT sum(x*y) FROM (SELECT unnest(p.v) x, unnest(c.cv) y)) AS DOUBLE)
                   / (sqrt(CAST(p.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC,
                 c.cid) AS rn
             FROM pre p, cents1 c) WHERE rn = 1),
         cd2 AS (
           SELECT a.cid, t.i AS d,
             CAST(floor(CAST(sum(p.v[t.i]) AS DOUBLE) / count(*)) AS BIGINT) AS cval
           FROM asg2 a JOIN pre p ON p.vec_id = a.vec_id,
             LATERAL (SELECT unnest(generate_series(1, len(p.v))) AS i) t
           GROUP BY a.cid, t.i),
         cents2 AS (
           SELECT cid, cv,
             CAST((SELECT sum(e*e) FROM unnest(cv) t(e)) AS BIGINT) AS cn2
           FROM (SELECT cid, list(cval ORDER BY d) AS cv FROM cd2 GROUP BY cid)),
         assignT AS (
           SELECT vec_id, cid FROM (
             SELECT p.vec_id, c.cid,
               row_number() OVER (PARTITION BY p.vec_id ORDER BY
                 CAST((SELECT sum(x*y) FROM (SELECT unnest(p.v) x, unnest(c.cv) y)) AS DOUBLE)
                   / (sqrt(CAST(p.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC,
                 c.cid) AS rn
             FROM pre p, cents2 c) WHERE rn = 1)"""

  /** q37 + st30: the integer-encoded greedy state machine
    * (acc = 10·completed + stage) stepped by a recursive CTE — NOT
    * list_reduce: DuckDB 1.0.0 mis-folds list_reduce evaluated over
    * many grouped rows at once (correct on a single row — a
    * vectorization bug, reproduced in-session). Every transition is
    * non-decreasing, so max(acc) is the final state. */
  private def cepOracleSql: String =
    """WITH RECURSIVE e AS (SELECT user_id, epoch_us(ts) AS us, event_id,
             CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                  WHEN 'purchase' THEN 3 ELSE 0 END AS c
           FROM events),
         l AS (SELECT user_id,
                 list(CAST(c AS BIGINT) ORDER BY us, event_id) AS codes
               FROM e GROUP BY user_id),
         r AS (
           SELECT user_id, 0 AS i, CAST(0 AS BIGINT) AS acc FROM l
           UNION ALL
           SELECT r.user_id, r.i + 1,
             CASE WHEN r.acc % 10 = 0 AND l.codes[r.i + 1] = 1
                    THEN r.acc + 1
                  WHEN r.acc % 10 = 1 AND l.codes[r.i + 1] = 2
                    THEN r.acc + 1
                  WHEN r.acc % 10 = 2 AND l.codes[r.i + 1] = 3
                    THEN r.acc + 8
                  ELSE r.acc END
           FROM r JOIN l ON l.user_id = r.user_id
           WHERE r.i < len(l.codes))
         SELECT user_id, max(acc) // 10 AS n_matches
         FROM r GROUP BY user_id"""

  /** q39 + st32: the duration-capped sessionization recurrence — an
    * event OPENS a session when it is the user's first or follows a
    * > 24 h gap; otherwise it CAP-SPLITS when it sits > 48 h past the
    * running session's anchor; otherwise it extends. The recursive CTE
    * steps the same 4-long state the Spark fold carries; nsess/ncap
    * only grow, so max() is the final state. */
  private def cappedSessionOracleSql: String =
    """WITH RECURSIVE e AS (SELECT user_id, epoch_us(ts) AS us, event_id
           FROM events),
         l AS (SELECT user_id, list(us ORDER BY us, event_id) AS tl
               FROM e GROUP BY user_id),
         r AS (
           SELECT user_id, 0 AS i, CAST(0 AS BIGINT) AS anchor,
             CAST(0 AS BIGINT) AS prev, CAST(0 AS BIGINT) AS nsess,
             CAST(0 AS BIGINT) AS ncap
           FROM l
           UNION ALL
           SELECT r.user_id, r.i + 1,
             CASE WHEN r.nsess = 0 OR l.tl[r.i + 1] - r.prev > 86400000000
                    OR l.tl[r.i + 1] - r.anchor > 172800000000
                  THEN l.tl[r.i + 1] ELSE r.anchor END,
             l.tl[r.i + 1],
             CASE WHEN r.nsess = 0 OR l.tl[r.i + 1] - r.prev > 86400000000
                    OR l.tl[r.i + 1] - r.anchor > 172800000000
                  THEN r.nsess + 1 ELSE r.nsess END,
             CASE WHEN r.nsess > 0
                    AND l.tl[r.i + 1] - r.prev <= 86400000000
                    AND l.tl[r.i + 1] - r.anchor > 172800000000
                  THEN r.ncap + 1 ELSE r.ncap END
           FROM r JOIN l ON l.user_id = r.user_id
           WHERE r.i < len(l.tl))
         SELECT user_id, max(nsess) AS n_sessions, max(ncap) AS n_cap_splits
         FROM r GROUP BY user_id"""

  /** t28: the identical BPE induction unrolled — per round, a pair
    * count over the running vocabulary, the same (count desc, lhs,
    * rhs) argmax, and the left-to-right greedy merge replayed as a
    * recursive CTE whose state is the output symbol list (the q37/q39
    * recurrence discipline applied to a list accumulator). */
  /** The shared k-round BPE chain (v0..vk carry the word through, so
    * the apply oracle can join the final segmentation back to docs). */
  private def bpeChainSql(k: Int): String = {
    val rounds = (1 to k).map { n =>
      val prev = s"v${n - 1}"
      s"""p$n AS (SELECT syms[i] AS lhs, syms[i + 1] AS rhs,
             CAST(sum(cnt) AS BIGINT) AS c
           FROM $prev, unnest(generate_series(1, len(syms) - 1)) t(i)
           GROUP BY syms[i], syms[i + 1]),
         m$n AS (SELECT lhs, rhs, c FROM p$n
                 ORDER BY c DESC, lhs, rhs LIMIT 1),
         r$n AS (
           SELECT w, syms, cnt, 0 AS i, CAST([] AS VARCHAR[]) AS out
           FROM $prev
           UNION ALL
           SELECT s.w, s.syms, s.cnt, s.i + 1,
             CASE WHEN len(s.out) > 0 AND s.out[-1] = m.lhs
                    AND s.syms[s.i + 1] = m.rhs
                  THEN list_append(s.out[1:len(s.out) - 1], m.lhs || m.rhs)
                  ELSE list_append(s.out, s.syms[s.i + 1]) END
           FROM r$n s, m$n m WHERE s.i < len(s.syms)),
         v$n AS (SELECT w, out AS syms, cnt FROM r$n
                 WHERE i = len(syms))"""
    }.mkString(",\n")
    s"""WITH RECURSIVE v0 AS (
         SELECT w, list_transform(generate_series(1, length(w)),
             i -> substr(w, i, 1)) AS syms,
           CAST(count(*) AS BIGINT) AS cnt
         FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         WHERE length(w) > 0 GROUP BY w),
       $rounds"""
  }

  private def bpeOracleSql: String = {
    val k = 4
    val finalSel = (1 to k).map(n =>
      s"SELECT CAST($n AS BIGINT) AS step, lhs, rhs, lhs || rhs AS merged, c AS cnt FROM m$n")
      .mkString(" UNION ALL ")
    s"""${bpeChainSql(k)}
       $finalSel"""
  }

  /** t31: the final segmentation joined back to every word occurrence;
    * n_tokens = Σ symbols per word after the k merges. */
  private def bpeApplyOracleSql: String =
    s"""${bpeChainSql(4)}
       SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(len(v.syms)) AS BIGINT) AS n_tokens
       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
             FROM documents) d
       JOIN v4 v ON v.w = d.w
       WHERE length(d.w) > 0
       GROUP BY d.doc_id"""

  /** s30: the identical graph build (exact degree-8 kNN) and 5 unrolled
    * integer PageRank rounds — r'(v) = 150000 + 85·(Σ r(u) div 8) div
    * 100 over incoming edges. */
  private def pageRankOracleSql: String = {
    val iters = 5
    val rounds = (1 to iters).map { n =>
      s"""r$n AS (
         SELECT nd.v,
           150000 + (85 * coalesce(s.inr, 0)) // 100 AS r
         FROM nd
         LEFT JOIN (SELECT g.dst AS v, CAST(sum(p.r // 8) AS BIGINT) AS inr
                    FROM graph g JOIN r${n - 1} p ON p.v = g.src
                    GROUP BY g.dst) s ON s.v = nd.v)"""
    }.mkString(",\n")
    s"""WITH pre AS ($embPreSql),
       sims AS (
         SELECT a.vec_id AS src, b.vec_id AS dst,
           CAST((SELECT sum(x*y)
                 FROM (SELECT unnest(a.v) x, unnest(b.v) y)) AS DOUBLE)
             / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE)))
             AS cos
         FROM pre a JOIN pre b ON a.vec_id <> b.vec_id),
       graph AS (
         SELECT src, dst FROM (
           SELECT src, dst,
             row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst)
               AS rr
           FROM sims) WHERE rr <= 8),
       nd AS (SELECT vec_id AS v FROM embeddings),
       r0 AS (SELECT vec_id AS v, CAST(1000000 AS BIGINT) AS r
              FROM embeddings),
       $rounds
       SELECT v AS vec_id, CAST(r AS BIGINT) AS "rank" FROM r$iters"""
  }

  /** q40 + st34: OHLC bars — open/close selected at rank 1 under the
    * composite (ts, event_id) order, high/low/count plain aggregates. */
  private def ohlcOracleSql: String =
    """WITH e AS (SELECT date_trunc('day', ts) AS day, event_type,
           value, ts, event_id FROM events),
       r AS (SELECT day, event_type, value,
           row_number() OVER (PARTITION BY day, event_type
             ORDER BY ts, event_id) AS rk_a,
           row_number() OVER (PARTITION BY day, event_type
             ORDER BY ts DESC, event_id DESC) AS rk_d
         FROM e)
       SELECT day, event_type,
         max(CASE WHEN rk_a = 1 THEN value END) AS open,
         max(value) AS high, min(value) AS low,
         max(CASE WHEN rk_d = 1 THEN value END) AS close,
         count(*) AS n_events
       FROM r GROUP BY day, event_type"""

  /** q36 + st29: exact top-20 users by event count, (cnt desc, key)
    * tiebreak; `exact` TRUE because m = 2^17 keeps every partition's
    * distinct-user count below Misra-Gries capacity. */
  private def heavyHittersOracleSql: String =
    """SELECT k, cnt, TRUE AS exact, rank FROM (
         SELECT CAST(user_id AS VARCHAR) AS k, count(*) AS cnt,
           row_number() OVER (ORDER BY count(*) DESC,
             CAST(user_id AS VARCHAR)) AS rank
         FROM events GROUP BY user_id)
       WHERE rank <= 20"""

  /** One st27 oracle branch: the KMV sketch profile of one events
    * column — counts, VARCHAR-canonical min/max, k-minima count and
    * the t14 estimator ((k-1)·2^32 / kth when saturated, the minima
    * count itself below capacity; k = 512). */
  private def kmvProfileOracleBranch(c: String, isLong: Boolean): String = {
    val asStr = if (isLong) s"CAST($c AS VARCHAR)" else c
    s"""SELECT col_name, n_rows, n_nonnull, min_val, max_val, n_mins,
         CASE WHEN n_mins >= 512
              THEN CAST(2194728288256 AS DOUBLE) / CAST(kth AS DOUBLE)
              ELSE CAST(n_mins AS DOUBLE) END AS est_ndv
       FROM (
         SELECT '$c' AS col_name,
           (SELECT count(*) FROM events) AS n_rows,
           (SELECT count($c) FROM events) AS n_nonnull,
           (SELECT CAST(min($c) AS VARCHAR) FROM events) AS min_val,
           (SELECT CAST(max($c) AS VARCHAR) FROM events) AS max_val,
           count(*) AS n_mins, max(hw) AS kth
         FROM (
           SELECT hw FROM (
             SELECT DISTINCT ('0x' || substr(md5($asStr),1,8))::BIGINT AS hw
             FROM events WHERE $c IS NOT NULL)
           ORDER BY hw LIMIT 512))"""
  }

  /** q34-shape profile SQL over a CTE-bound relation — one branch per
    * documents column, min/max canonicalized to VARCHAR. Shared by the
    * c06 drift compare's two sides. */
  private def profileSqlOver(rel: String): String = {
    val branches = Seq("doc_id", "text", "lang", "source", "n_chars")
      .map(c =>
        s"""SELECT '$c' AS col_name, count($c) AS n_nonnull,
           count(DISTINCT $c) AS ndv,
           CAST(min($c) AS VARCHAR) AS min_val,
           CAST(max($c) AS VARCHAR) AS max_val FROM $rel""")
      .mkString(" UNION ALL ")
    s"""SELECT v.col_name, v.n_nonnull, v.ndv, v.min_val, v.max_val,
       p.n_rows FROM ($branches) v,
       (SELECT count(*) AS n_rows FROM $rel) p"""
  }

  /** s39 oracle: the exact baseline once, then per bit-width the s15
    * code construction, the pre-scaled integer error sums, and the
    * global recall join — generated per width so the four CTis cannot
    * drift from each other. */
  private def sqLadderOracleSql: String = {
    val ex =
      s"""WITH pre AS ($embPreSql),
         exd AS (
           SELECT q.vec_id AS qid, c.vec_id AS nid,
             CAST((SELECT sum(x*y) FROM (SELECT unnest(q.v) x, unnest(c.v) y)) AS DOUBLE)
               / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) AS cos
           FROM pre q JOIN pre c ON c.vec_id <> q.vec_id
           WHERE q.vec_id < 10),
         ex AS (SELECT qid, nid FROM (
             SELECT qid, nid,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rk
             FROM exd) WHERE rk <= 10)"""
    val widths = Seq((2, 1L), (4, 7L), (6, 31L), (8, 127L))
    val per = widths.map { case (b, l) =>
      s"""qt$b AS (SELECT vec_id, v, n2,
               (SELECT max(abs(e)) FROM unnest(v) t(e)) AS amax
             FROM pre),
         qq$b AS (SELECT vec_id, v, n2, amax,
               CASE WHEN amax > 0 THEN list_transform(v,
                   x -> CAST(floor(CAST(x*$l AS DOUBLE)
                          / CAST(amax AS DOUBLE)) AS BIGINT))
                 ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
             FROM qt$b),
         qn$b AS (SELECT vec_id, v, n2, amax, q,
               CAST((SELECT sum(e*e) FROM unnest(q) t(e)) AS BIGINT) AS qn2
             FROM qq$b),
         er$b AS (SELECT CAST(count(*) AS BIGINT) AS nv,
               CAST(sum(e2 // 1000) AS BIGINT) AS enk,
               CAST(sum(($l * $l * n2) // 1000000) AS BIGINT) AS edm
             FROM (SELECT n2,
                 (SELECT sum((x*$l - y*amax)*(x*$l - y*amax))
                  FROM (SELECT unnest(v) x, unnest(q) y)) AS e2
               FROM qn$b)),
         sd$b AS (
           SELECT a.vec_id AS qid, b.vec_id AS nid,
             CAST((SELECT sum(x*y)
                   FROM (SELECT unnest(a.q) x, unnest(b.q) y)) AS DOUBLE)
               / (sqrt(CAST(a.qn2 AS DOUBLE)) * sqrt(CAST(b.qn2 AS DOUBLE)))
               AS cos
           FROM qn$b a JOIN qn$b b ON b.vec_id <> a.vec_id
           WHERE a.vec_id < 10),
         sk$b AS (SELECT qid, nid FROM (
             SELECT qid, nid,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rk
             FROM sd$b) WHERE rk <= 10),
         rc$b AS (SELECT CAST(count(*) AS BIGINT) AS n_exact,
               CAST(sum(CASE WHEN s.nid IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS hits
             FROM ex LEFT JOIN sk$b s
               ON ex.qid = s.qid AND ex.nid = s.nid),
         row$b AS (SELECT CAST($b AS BIGINT) AS bits,
               CAST($l AS BIGINT) AS level, e.nv AS n_vectors,
               e.enk AS err_num_k, e.edm AS err_den_m,
               (CAST(e.enk AS DOUBLE) / CAST(e.edm AS DOUBLE)) / 1000.0
                 AS rel_err,
               r.n_exact, r.hits,
               CAST(r.hits AS DOUBLE) / CAST(r.n_exact AS DOUBLE)
                 AS recall
             FROM er$b e, rc$b r)"""
    }
    val union = widths.map { case (b, _) => s"SELECT * FROM row$b" }
      .mkString(" UNION ALL ")
    (ex +: per).mkString(",\n") + "\n" + union
  }

  /** s42: MMR re-ranking unrolled — round r scores the not-yet-picked
    * candidates against the union of rounds 1..r−1. */
  private def mmrOracleSql: String = {
    val rounds = (2 to 5).map { r =>
      val prev = (1 until r).map(i => s"SELECT qid, nid FROM s$i")
        .mkString(" UNION ALL ")
      s"""sel${r - 1} AS ($prev),
         r$r AS (
           SELECT c.qid, c.nid, c.rel, max(p.sim) AS msim
           FROM cand c
           JOIN pair p ON p.qid = c.qid AND p.ca = c.nid
           JOIN sel${r - 1} s ON s.qid = p.qid AND s.nid = p.cb
           WHERE NOT EXISTS (SELECT 1 FROM sel${r - 1} s2
             WHERE s2.qid = c.qid AND s2.nid = c.nid)
           GROUP BY c.qid, c.nid, c.rel),
         s$r AS (SELECT qid, nid, CAST($r AS INT) AS pick FROM (
             SELECT qid, nid,
               row_number() OVER (PARTITION BY qid
                 ORDER BY 0.7 * rel - 0.3 * msim DESC, nid) AS rn
             FROM r$r) WHERE rn = 1)"""
    }.mkString(",\n")
    s"""WITH pre AS ($embPreSql),
       sims AS (
         SELECT q.vec_id AS qid, c.vec_id AS nid,
           CAST((SELECT sum(x*y) FROM (SELECT unnest(q.v) x, unnest(c.v) y)) AS DOUBLE)
             / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE)))
             AS cos
         FROM pre q JOIN pre c ON c.vec_id <> q.vec_id
         WHERE q.vec_id < 5),
       cand AS (SELECT qid, nid, cos AS rel FROM (
           SELECT qid, nid, cos,
             row_number() OVER (PARTITION BY qid
               ORDER BY cos DESC, nid) AS rank
           FROM sims) WHERE rank <= 10),
       pair AS (SELECT a.qid, a.nid AS ca, b.nid AS cb,
           CAST((SELECT sum(x*y) FROM (SELECT unnest(pa.v) x, unnest(pb.v) y)) AS DOUBLE)
             / (sqrt(CAST(pa.n2 AS DOUBLE)) * sqrt(CAST(pb.n2 AS DOUBLE)))
             AS sim
         FROM cand a JOIN cand b ON a.qid = b.qid AND a.nid <> b.nid
         JOIN pre pa ON pa.vec_id = a.nid
         JOIN pre pb ON pb.vec_id = b.nid),
       s1 AS (SELECT qid, nid, CAST(1 AS INT) AS pick FROM (
           SELECT qid, nid,
             row_number() OVER (PARTITION BY qid
               ORDER BY rel DESC, nid) AS rn
           FROM cand) WHERE rn = 1),
       $rounds
       SELECT u.qid, u.nid, u.pick, c.rel
       FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
             UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
             UNION ALL SELECT * FROM s5) u
       JOIN cand c ON c.qid = u.qid AND c.nid = u.nid"""
  }

  /** s43: the JL ladder unrolled — one 32-plane ±1 sign projection
    * (same md5 scheme as the LSH planes), per-rung prefix j < m,
    * exact-int64 projected cosine ranks vs the exact baseline. */
  private def jlRecallOracleSql: String = {
    val ms = Seq(4, 8, 16, 32)
    val perM = ms.map { m =>
      s"""n2_$m AS (SELECT vec_id, sum(pj * pj) AS n2 FROM proj
                 WHERE j < $m GROUP BY vec_id),
         sims_$m AS (
           SELECT qa.vec_id AS qid, ca.vec_id AS nid,
             CAST(sum(qa.pj * ca.pj) AS DOUBLE)
               / (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(cn.n2 AS DOUBLE)))
               AS cos
           FROM proj qa JOIN proj ca
             ON ca.j = qa.j AND qa.j < $m AND ca.vec_id <> qa.vec_id
           JOIN n2_$m qn ON qn.vec_id = qa.vec_id
           JOIN n2_$m cn ON cn.vec_id = ca.vec_id
           WHERE qa.vec_id < 10
           GROUP BY qa.vec_id, ca.vec_id, qn.n2, cn.n2),
         topk_$m AS (SELECT qid, nid FROM (
             SELECT qid, nid,
               row_number() OVER (PARTITION BY qid
                 ORDER BY cos DESC, nid) AS rank
             FROM sims_$m) WHERE rank <= 10)"""
    }.mkString(",\n")
    val branches = ms.map { m =>
      s"""SELECT CAST($m AS BIGINT) AS m_dims,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(t.nid) AS BIGINT) AS n_hits,
           CAST(count(t.nid) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             AS recall
         FROM exact e LEFT JOIN topk_$m t
           ON e.qid = t.qid AND e.nid = t.nid"""
    }.mkString("\nUNION ALL\n")
    s"""WITH pre AS ($embPreSql),
       signsq AS (
         SELECT j, d,
           CASE WHEN ('0x' || substr(md5(j::VARCHAR || '_' || d::VARCHAR),1,8))::BIGINT
                  - 2147483648 >= 0 THEN 1 ELSE -1 END AS sg
         FROM generate_series(0,31) tj(j), generate_series(0,63) td(d)),
       proj AS (
         SELECT p.vec_id, s.j, sum(s.sg * p.v[s.d + 1]) AS pj
         FROM pre p, signsq s GROUP BY p.vec_id, s.j),
       exact AS (SELECT qid, nid FROM (
           SELECT qid, nid,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
           FROM (
             SELECT q.vec_id AS qid, c.vec_id AS nid,
               CAST((SELECT sum(x*y) FROM (SELECT unnest(q.v) x, unnest(c.v) y)) AS DOUBLE)
                 / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) AS cos
             FROM pre q JOIN pre c ON c.vec_id <> q.vec_id
             WHERE q.vec_id < 10))
         WHERE rank <= 10),
       $perM
       $branches"""
  }

  /** c38: per-FK-edge orphan audit; each branch is the same
    * distinct + anti-join the Spark side runs. */
  private def fkAuditOracleSql: String = {
    val edges = Seq(
      ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      ("lineitem.l_partkey->part", "lineitem", "l_partkey",
        "part", "p_partkey"),
      ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      ("orders.o_custkey->customer", "orders", "o_custkey",
        "customer", "c_custkey"),
      ("customer.c_nationkey->nation", "customer", "c_nationkey",
        "nation", "n_nationkey"),
      ("events.user_id->customer", "events", "user_id",
        "customer", "c_custkey"))
    edges.map { case (edge, child, ck, parent, pk) =>
      s"""SELECT '$edge' AS edge,
           (SELECT CAST(count(*) AS BIGINT) FROM $child) AS n_rows,
           (SELECT CAST(count(DISTINCT $ck) AS BIGINT) FROM $child)
             AS n_keys,
           (SELECT CAST(count(*) AS BIGINT) FROM
             (SELECT DISTINCT CAST($ck AS BIGINT) AS k FROM $child)
             WHERE k NOT IN (SELECT CAST($pk AS BIGINT) FROM $parent))
             AS n_orphans,
           coalesce((SELECT CAST(min(k) AS BIGINT) FROM
             (SELECT DISTINCT CAST($ck AS BIGINT) AS k FROM $child)
             WHERE k NOT IN (SELECT CAST($pk AS BIGINT) FROM $parent)),
             -1) AS min_orphan"""
    }.mkString("\nUNION ALL\n")
  }

  /** q83/st60: reflected running balance — the batch side computes
    * the Lindley closed form (S_t − min(0, min prefix S)), the
    * streaming side folds h ← max(0, h + Δ) directly; this oracle
    * replays the closed form so the shared hash proves the rewrite. */
  private def flooredBalanceOracleSql: String =
    """WITH e AS (
         SELECT user_id, ts, event_id,
           CASE WHEN event_type = 'purchase'
             THEN CAST(floor(value * 100) AS BIGINT)
             ELSE -CAST(floor(value * 100) AS BIGINT) END AS delta
         FROM events),
       r AS (SELECT user_id, ts, event_id,
               sum(delta) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
             FROM e),
       r2 AS (SELECT user_id, ts, event_id, s,
                least(0, min(s) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                  AS m
              FROM r),
       h AS (SELECT user_id, ts, event_id, s - m AS h FROM r2),
       o AS (SELECT *, row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn FROM h)
       SELECT user_id,
         CAST(max(CASE WHEN rn = 1 THEN h END) AS BIGINT) AS final_cents,
         CAST(max(h) AS BIGINT) AS peak_cents
       FROM o GROUP BY user_id"""

  /** q91/st63: two-sample Kolmogorov–Smirnov, all in exact integers:
    * d_num = max|cumA·n_b − cumB·n_a| over the tie-collapsed value
    * frame, rejection cross-multiplied with c = 1.36 (18496/10⁴). */
  private def iqrOracleSql: String =
    """WITH g AS (SELECT event_type,
             CAST(floor(value * 1000) AS BIGINT) AS v, count(*) AS c
           FROM events GROUP BY 1, 2),
       c1 AS (SELECT *, sum(c) OVER (PARTITION BY event_type ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS cum,
              sum(c) OVER (PARTITION BY event_type) AS total
            FROM g),
       q AS (SELECT event_type, CAST(max(total) AS BIGINT) AS n,
               CAST(min(CASE WHEN cum * 4 >= total THEN v END)
                 AS BIGINT) AS q1_milli,
               CAST(min(CASE WHEN cum * 4 >= total * 3 THEN v END)
                 AS BIGINT) AS q3_milli
             FROM c1 GROUP BY event_type),
       q2 AS (SELECT *, q3_milli - q1_milli AS iqr_milli FROM q),
       o AS (SELECT g.event_type,
               CAST(sum(CASE WHEN g.v * 2 < q2.q1_milli * 2
                     - q2.iqr_milli * 3
                   OR g.v * 2 > q2.q3_milli * 2 + q2.iqr_milli * 3
                   THEN g.c ELSE 0 END) AS BIGINT) AS n_outliers
             FROM g JOIN q2 USING (event_type) GROUP BY g.event_type)
       SELECT q2.event_type, q2.n, q2.q1_milli, q2.q3_milli,
         q2.iqr_milli, o.n_outliers,
         (o.n_outliers * 1000000) // q2.n AS outlier_ppm
       FROM q2 JOIN o ON q2.event_type = o.event_type"""

  private def madOracleSql: String =
    """WITH g AS (SELECT event_type,
             CAST(floor(value * 1000) AS BIGINT) AS v, count(*) AS c
           FROM events GROUP BY 1, 2),
       c1 AS (SELECT *, sum(c) OVER (PARTITION BY event_type ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS cum,
              sum(c) OVER (PARTITION BY event_type) AS total
            FROM g),
       med AS (SELECT event_type, CAST(min(v) AS BIGINT)
                 AS median_milli,
               CAST(max(total) AS BIGINT) AS n
             FROM c1 WHERE cum * 2 >= total GROUP BY event_type),
       d AS (SELECT g.event_type, abs(g.v - med.median_milli) AS dev,
               sum(g.c) AS c
             FROM g JOIN med USING (event_type) GROUP BY 1, 2),
       c2 AS (SELECT *, sum(c) OVER (PARTITION BY event_type
                ORDER BY dev
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS cum,
              sum(c) OVER (PARTITION BY event_type) AS total
            FROM d),
       mad AS (SELECT event_type, CAST(min(dev) AS BIGINT)
                 AS mad_milli
             FROM c2 WHERE cum * 2 >= total GROUP BY event_type)
       SELECT med.event_type, med.n, med.median_milli, mad.mad_milli,
         CAST(med.median_milli AS DOUBLE) / 1000.0 AS median,
         CAST(mad.mad_milli AS DOUBLE) / 1000.0 AS mad
       FROM med JOIN mad ON med.event_type = mad.event_type"""

  private def trimmedMeanOracleSql: String =
    """WITH r AS (SELECT event_type, value,
                CAST(floor(value * 1000) AS BIGINT) AS vfx,
                row_number() OVER (PARTITION BY event_type
                  ORDER BY value, event_id) AS rnk,
                count(*) OVER (PARTITION BY event_type) AS n
              FROM events)
         SELECT event_type, CAST(max(n) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS kept,
           CAST(sum(vfx) AS BIGINT) AS sum_milli,
           CAST(CAST(sum(vfx) AS BIGINT) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) / 1000.0 AS trimmed_mean
         FROM r
         WHERE rnk > n // 10 AND rnk <= n - n // 10
         GROUP BY event_type"""

  private def roundtripOracleSql: String =
    """WITH base AS (SELECT event_id, user_id, event_type,
             epoch_us(ts) AS ts_us,
             CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
         s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS cents,
             bit_xor(('0x' || substr(md5(event_id || '|' || user_id ||
               '|' || event_type || '|' || ts_us || '|' || cents),
               1, 15))::BIGINT) AS digest
           FROM base)
         SELECT n AS n_old, cents AS cents_old, digest AS digest_old,
           n AS n_new, cents AS cents_new, digest AS digest_new
         FROM s"""

  private def runsOracleSql: String =
    s"""WITH $dailySeriesOracleCte,
       mm AS (SELECT event_type, d AS dd,
               CAST(y AS DOUBLE) / CAST(x AS DOUBLE) AS m
             FROM d),
       g AS (SELECT event_type, m, count(*) AS cnt FROM mm
             GROUP BY event_type, m),
       c1 AS (SELECT *, sum(cnt) OVER (PARTITION BY event_type
                ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cum,
              sum(cnt) OVER (PARTITION BY event_type) AS total
            FROM g),
       md AS (SELECT event_type,
               min(CASE WHEN cum * 2 >= total THEN m END) AS med
             FROM c1 GROUP BY event_type),
       sg AS (SELECT mm.event_type, mm.dd,
               CASE WHEN mm.m > md.med THEN 1 ELSE -1 END AS s
             FROM mm JOIN md ON mm.event_type = md.event_type
             WHERE mm.m <> md.med),
       ch AS (SELECT event_type, s,
               CASE WHEN lag(s) OVER (PARTITION BY event_type
                   ORDER BY dd) IS NULL THEN 1
                 WHEN lag(s) OVER (PARTITION BY event_type
                   ORDER BY dd) <> s THEN 1
                 ELSE 0 END AS chg
             FROM sg),
       r AS (SELECT event_type,
               CAST(sum(chg) AS BIGINT) AS r_runs,
               CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_above,
               CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_below
             FROM ch GROUP BY event_type)
       SELECT event_type, n_above, n_below, r_runs,
         CAST(r_runs * (n_above + n_below) - 2 * n_above * n_below
             - (n_above + n_below) AS DOUBLE)
           / (CAST(n_above + n_below AS DOUBLE)
             * sqrt(CAST(2 * n_above * n_below
                 * (2 * n_above * n_below - (n_above + n_below))
                 AS DOUBLE)
               / CAST((n_above + n_below) * (n_above + n_below)
                 * (n_above + n_below - 1) AS DOUBLE))) AS z
       FROM r"""

  private def ablationOracleSql: String =
    """WITH m AS (SELECT source,
             CAST(len(list_distinct(list_filter(
                 string_split(lower(text), ' '),
                 w -> w IN ('the','be','to','of','and','that','have',
                   'with')))) AS BIGINT) * 1000
               + least(1000, len(string_split(text, ' ')) * 2) AS score,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
           FROM documents),
       g AS (SELECT source, score, count(*) AS cnt,
               CAST(sum(toks) AS BIGINT) AS toks
             FROM m GROUP BY source, score),
       c1 AS (SELECT *, sum(cnt) OVER (PARTITION BY source
                ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cum,
              sum(cnt) OVER (PARTITION BY source) AS n_source
            FROM g),
       q AS (SELECT source, score, cnt, toks,
               (CAST(cum AS BIGINT) * 1000000)
                 // CAST(n_source AS BIGINT) AS q_ppm
             FROM c1),
       tiers AS (SELECT unnest([25, 50, 75, 100]) AS top_pct)
       SELECT q.source, CAST(t.top_pct AS BIGINT) AS top_pct,
         CAST(sum(q.cnt) AS BIGINT) AS n_docs,
         CAST(sum(q.toks) AS BIGINT) AS n_tokens
       FROM q CROSS JOIN tiers t
       WHERE q.q_ppm > 1000000 - t.top_pct * 10000 OR t.top_pct = 100
       GROUP BY q.source, t.top_pct"""

  private def seasonalOracleSql: String =
    s"""WITH $dailySeriesOracleCte,
       w AS (SELECT event_type, d AS dd, x, y,
               CAST(d % 7 AS BIGINT) AS wd
             FROM d),
       bs AS (SELECT event_type, wd, CAST(sum(y) AS BIGINT) AS yw,
               CAST(sum(x) AS BIGINT) AS xw
             FROM w GROUP BY event_type, wd),
       r AS (SELECT w.event_type, w.dd AS d, w.wd,
               CAST(w.y AS DOUBLE) / CAST(w.x AS DOUBLE) AS m,
               CAST(bs.yw AS DOUBLE) / CAST(bs.xw AS DOUBLE)
                 AS baseline,
               CAST(w.y AS DOUBLE) / CAST(w.x AS DOUBLE)
                 - CAST(bs.yw AS DOUBLE) / CAST(bs.xw AS DOUBLE)
                 AS residual
             FROM w JOIN bs ON w.event_type = bs.event_type
               AND w.wd = bs.wd),
       g AS (SELECT event_type, abs(residual) AS ar, count(*) AS cnt
             FROM r GROUP BY event_type, ar),
       c1 AS (SELECT *, sum(cnt) OVER (PARTITION BY event_type
                ORDER BY ar ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cum,
              sum(cnt) OVER (PARTITION BY event_type) AS total
            FROM g),
       md AS (SELECT event_type,
               min(CASE WHEN cum * 2 >= total THEN ar END) AS res_mad
             FROM c1 GROUP BY event_type)
       SELECT r.event_type, r.d, r.wd, r.m, r.baseline, r.residual,
         md.res_mad,
         (abs(r.residual) > md.res_mad * 3.0) AS is_anomaly
       FROM r JOIN md ON r.event_type = md.event_type"""

  private def phashClustersOracleSql: String =
    """WITH RECURSIVE cp AS (SELECT doc_id AS mid, length(text) AS n,
             unnest(generate_series(1, length(text))) - 1 AS p0,
             unnest(list_transform(generate_series(1, length(text)),
               i -> ascii(substr(text, i, 1)))) AS c
           FROM documents),
         bs AS (SELECT mid, (p0 * 48) // n AS b,
                  count(*) AS cnt, CAST(sum(c) AS BIGINT) AS s
                FROM cp GROUP BY mid, (p0 * 48) // n),
         tot AS (SELECT mid, CAST(sum(s) AS BIGINT) AS ts,
                   CAST(sum(cnt) AS BIGINT) AS tn
                 FROM bs GROUP BY mid),
         ph AS (SELECT bs.mid,
             CAST(sum(CASE WHEN bs.s * tot.tn >= tot.ts * bs.cnt
               THEN (1::BIGINT << CAST(bs.b AS INT)) ELSE 0 END) AS BIGINT)
               AS h
           FROM bs JOIN tot ON bs.mid = tot.mid GROUP BY bs.mid),
         banded AS (SELECT mid, h, band,
             (h >> CAST(band * 6 AS INT)) & 63 AS bv
           FROM ph, (SELECT unnest(generate_series(0, 7)) AS band)),
         cand AS (SELECT DISTINCT a.mid AS da, b.mid AS db,
             a.h AS ha, b.h AS hb
           FROM banded a JOIN banded b
             ON a.band = b.band AND a.bv = b.bv AND a.mid < b.mid),
         p2 AS (SELECT da, db FROM cand
                WHERE bit_count(xor(ha, hb)) <= 7),
         edges AS (SELECT da AS src, db AS dst FROM p2
                   UNION ALL SELECT db AS src, da AS dst FROM p2),
         walk(id, lbl) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.dst, w.lbl FROM walk w JOIN edges e ON w.id = e.src),
         clus AS (SELECT id, min(lbl) AS cluster FROM walk GROUP BY id),
         sz AS (SELECT cluster, count(*) AS n_members FROM clus
                GROUP BY cluster)
       SELECT CAST(cluster AS BIGINT) AS keeper_id,
         CAST(n_members AS BIGINT) AS n_members,
         CAST(n_members - 1 AS BIGINT) AS n_removed
       FROM sz WHERE n_members >= 2"""

  private def mannKendallOracleSql: String =
    s"""WITH $dailySeriesOracleCte,
       s AS (SELECT a.event_type,
               CAST(sum(CASE WHEN b.y * a.x > a.y * b.x THEN 1
                 ELSE 0 END)
               - sum(CASE WHEN b.y * a.x < a.y * b.x THEN 1
                 ELSE 0 END) AS BIGINT) AS s_stat
             FROM d a JOIN d b
               ON a.event_type = b.event_type AND a.d < b.d
             GROUP BY a.event_type),
       tg AS (SELECT event_type,
               CAST(y AS DOUBLE) / CAST(x AS DOUBLE) AS m,
               count(*) AS t
             FROM d GROUP BY event_type, m),
       tt AS (SELECT event_type,
               CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                 AS tie_term,
               CAST(sum(t) AS BIGINT) AS n_days
             FROM tg GROUP BY event_type),
       v AS (SELECT s.event_type, tt.n_days, s.s_stat, tt.tie_term,
               tt.n_days * (tt.n_days - 1) * (2 * tt.n_days + 5)
                 - tt.tie_term AS var18
             FROM s JOIN tt ON s.event_type = tt.event_type)
       SELECT event_type, n_days, s_stat, tie_term, var18,
         (CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
               WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
               ELSE 0.0 END)
           / sqrt(CAST(var18 AS DOUBLE) / 18.0) AS z
       FROM v"""

  private def blockDedupOracleSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
           FROM documents),
       b AS (SELECT doc_id, unnest([{bid: (i - 1) // 20,
               block: array_to_string(ws[i:least(i + 19, len(ws))],
                 ' ')}
             for i in range(1, len(ws) + 1, 20)],
             recursive := true)
           FROM d),
       f AS (SELECT block,
               min(doc_id * 1048576 + bid) AS keeper
             FROM b GROUP BY block),
       j AS (SELECT b.doc_id, b.bid, b.block,
               (b.doc_id * 1048576 + b.bid = f.keeper) AS keep
             FROM b JOIN f USING (block))
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
         CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
           AS n_removed,
         md5(coalesce(string_agg(CASE WHEN keep THEN block END, ' '
           ORDER BY bid), '')) AS kept_fp
       FROM j GROUP BY doc_id"""

  private def encodingOracleSql: String =
    """WITH seeded AS (SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' cafÃ© rÃ©sumÃ©'
                  WHEN doc_id % 11 = 0 THEN text || ' bad�byte'
                  ELSE text END AS t
           FROM documents),
       c AS (SELECT doc_id, length(t) AS nc,
               len(regexp_extract_all(t, '\x{FFFD}')) AS nr,
               len(regexp_extract_all(t,
                 '[\x{C3}\x{C2}][\x{A0}-\x{FF}]')) AS nd,
               len(regexp_extract_all(t,
                 '[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}]')) AS nx
             FROM seeded)
       SELECT doc_id, CAST(nc AS BIGINT) AS n_chars,
         CAST(nr AS BIGINT) AS n_replacement,
         CAST(nd AS BIGINT) AS n_digraphs,
         CAST(nx AS BIGINT) AS n_controls,
         (nr = 0 AND nx = 0 AND nd * 1000 <= nc * 2) AS keep
       FROM c"""

  private def quantilesOracleSql: String =
    """WITH m AS (SELECT source,
             CAST(len(list_distinct(list_filter(
                 string_split(lower(text), ' '),
                 w -> w IN ('the','be','to','of','and','that','have',
                   'with')))) AS BIGINT) * 1000
               + least(1000, len(string_split(text, ' ')) * 2) AS score
           FROM documents),
       g AS (SELECT source, score, count(*) AS cnt FROM m
             GROUP BY source, score),
       c1 AS (SELECT *, sum(cnt) OVER (PARTITION BY source
                ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cum,
              sum(cnt) OVER (PARTITION BY source) AS n_source
            FROM g)
       SELECT source, CAST(score AS BIGINT) AS score,
         CAST(cnt AS BIGINT) AS cnt, CAST(cum AS BIGINT) AS cum,
         CAST(n_source AS BIGINT) AS n_source,
         (CAST(cum AS BIGINT) * 1000000) // CAST(n_source AS BIGINT)
           AS q_ppm
       FROM c1"""

  private def pagerankOracleSql: String =
    """WITH e1 AS (SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS u,
             't:' || event_type AS t
           FROM events),
       e AS (SELECT u AS src, t AS dst FROM e1
             UNION ALL SELECT t AS src, u AS dst FROM e1),
       dg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
       p0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr
              FROM dg),
       i1 AS (SELECT e.dst AS node,
               CAST(150000 + (85 * sum(p0.pr // dg.deg)) // 100
                 AS BIGINT) AS pr
             FROM e JOIN dg ON e.src = dg.src
             JOIN p0 ON p0.node = e.src
             GROUP BY e.dst),
       i2 AS (SELECT e.dst AS node,
               CAST(150000 + (85 * sum(i1.pr // dg.deg)) // 100
                 AS BIGINT) AS pr
             FROM e JOIN dg ON e.src = dg.src
             JOIN i1 ON i1.node = e.src
             GROUP BY e.dst),
       i3 AS (SELECT e.dst AS node,
               CAST(150000 + (85 * sum(i2.pr // dg.deg)) // 100
                 AS BIGINT) AS pr
             FROM e JOIN dg ON e.src = dg.src
             JOIN i2 ON i2.node = e.src
             GROUP BY e.dst)
       SELECT node, pr FROM i3"""

  private def hodgesLehmannOracleSql: String =
    s"""WITH $dailySeriesOracleCte,
       wv AS (SELECT a.event_type,
               CAST(a.y * b.x + b.y * a.x AS DOUBLE)
                 / CAST(a.x * b.x * 2 AS DOUBLE) AS w
             FROM d a JOIN d b
               ON a.event_type = b.event_type AND a.d <= b.d),
       g AS (SELECT event_type, w, count(*) AS cnt FROM wv
             GROUP BY event_type, w),
       c1 AS (SELECT *, sum(cnt) OVER (PARTITION BY event_type
                ORDER BY w ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cum,
              sum(cnt) OVER (PARTITION BY event_type) AS total
            FROM g)
       SELECT event_type,
         min(CASE WHEN cum * 2 >= total THEN w END) AS hl_milli,
         CAST(max(total) AS BIGINT) AS n_pairs
       FROM c1 GROUP BY event_type"""

  private def preferencePairsOracleSql: String =
    """WITH m AS (SELECT source, lang, doc_id,
             CAST(len(list_distinct(list_filter(
                 string_split(lower(text), ' '),
                 w -> w IN ('the','be','to','of','and','that','have',
                   'with')))) AS BIGINT) * 1000
               + least(1000, len(string_split(text, ' ')) * 2) AS s
           FROM documents),
       k AS (SELECT source, lang, doc_id, s,
               s * 1099511627776 - doc_id AS kmax,
               s * 1099511627776 + doc_id AS kmin
             FROM m),
       g AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
               max_by(doc_id, kmax) AS chosen_id,
               CAST(max(s) AS BIGINT) AS chosen_score,
               min_by(doc_id, kmin) AS rejected_id,
               CAST(min(s) AS BIGINT) AS rejected_score
             FROM k GROUP BY source, lang)
       SELECT source, lang, n_docs,
         CAST(chosen_id AS BIGINT) AS chosen_id, chosen_score,
         CAST(rejected_id AS BIGINT) AS rejected_id, rejected_score,
         chosen_score - rejected_score AS margin
       FROM g WHERE chosen_score - rejected_score >= 500"""

  private def kappaOracleSql: String =
    """WITH gm AS (SELECT doc_id, source,
             len(string_split(text, ' ')) AS nw,
             length(text) AS nc,
             len(list_filter(string_split(text, ' '),
               w -> regexp_matches(w, '[A-Za-z]'))) AS aw,
             len(list_distinct(list_filter(string_split(lower(text), ' '),
               w -> w IN ('the','be','to','of','and','that','have','with'))))
               AS sh
           FROM documents),
       ga AS (SELECT doc_id, source,
               ((nw >= 50 AND nw <= 100000)
                AND (CAST(nc - nw + 1 AS DOUBLE) / CAST(nw AS DOUBLE) >= 3.0
                  AND CAST(nc - nw + 1 AS DOUBLE) / CAST(nw AS DOUBLE) <= 10.0)
                AND (CAST(aw AS DOUBLE) >= CAST(nw AS DOUBLE) * 0.8)
                AND (sh >= 1)) AS a_keep
             FROM gm),
       w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
             FROM documents),
       wc AS (SELECT doc_id, t, count(*) AS c FROM w
              WHERE len(t) > 0 GROUP BY doc_id, t),
       wagg AS (SELECT doc_id, sum(c) AS n_words,
                  count(*) AS n_distinct, max(c) AS top_word
                FROM wc GROUP BY doc_id),
       dd AS (SELECT doc_id, list_filter(string_split(text, ' '),
                x -> len(x) > 0) AS ws FROM documents),
       bg AS (SELECT doc_id,
                unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))])
                  AS b
              FROM dd WHERE len(ws) >= 2),
       bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
       bagg AS (SELECT doc_id, sum(c) AS n_bg, count(*) AS n_dist,
                  max(c) AS top_bg FROM bc GROUP BY doc_id),
       rb AS (SELECT w.doc_id,
               (CAST(w.top_word AS DOUBLE) / CAST(w.n_words AS DOUBLE)
                  <= 0.12
                AND CAST(w.n_distinct AS DOUBLE) / CAST(w.n_words AS DOUBLE)
                  >= 0.35
                AND (CASE WHEN b.n_bg IS NULL THEN 0.0
                     ELSE CAST(b.n_bg - b.n_dist AS DOUBLE)
                       / CAST(b.n_bg AS DOUBLE) END) <= 0.05) AS b_keep
             FROM wagg w LEFT JOIN bagg b ON w.doc_id = b.doc_id),
       cf AS (SELECT ga.source, count(*) AS n,
               CAST(sum(CASE WHEN ga.a_keep AND rb.b_keep
                 THEN 1 ELSE 0 END) AS BIGINT) AS both_keep,
               CAST(sum(CASE WHEN ga.a_keep AND NOT rb.b_keep
                 THEN 1 ELSE 0 END) AS BIGINT) AS a_only,
               CAST(sum(CASE WHEN NOT ga.a_keep AND rb.b_keep
                 THEN 1 ELSE 0 END) AS BIGINT) AS b_only,
               CAST(sum(CASE WHEN NOT ga.a_keep AND NOT rb.b_keep
                 THEN 1 ELSE 0 END) AS BIGINT) AS neither
             FROM ga JOIN rb ON ga.doc_id = rb.doc_id
             GROUP BY ga.source),
       k AS (SELECT *,
               (both_keep + a_only) * (both_keep + b_only)
                 + (b_only + neither) * (a_only + neither) AS pe_num
             FROM cf)
       SELECT source, CAST(n AS BIGINT) AS n, both_keep, a_only, b_only,
         neither, pe_num,
         n * (both_keep + neither) - pe_num AS kappa_num,
         n * n - pe_num AS kappa_den,
         CAST(n * (both_keep + neither) - pe_num AS DOUBLE)
           / CAST(n * n - pe_num AS DOUBLE) AS kappa
       FROM k"""

  private def eceOracleSql: String =
    """WITH m AS (SELECT source,
             len(string_split(text, ' ')) AS nw,
             length(text) AS nc,
             len(list_filter(string_split(text, ' '),
               w -> regexp_matches(w, '[A-Za-z]'))) AS aw,
             len(list_distinct(list_filter(string_split(lower(text), ' '),
               w -> w IN ('the','be','to','of','and','that','have','with'))))
               AS sh
           FROM documents),
       s AS (SELECT source,
               least(9, least(1000, nw * 2) // 100) AS bin,
               CASE WHEN ((nw >= 50 AND nw <= 100000)
                 AND (CAST(nc - nw + 1 AS DOUBLE) / CAST(nw AS DOUBLE)
                     >= 3.0
                   AND CAST(nc - nw + 1 AS DOUBLE) / CAST(nw AS DOUBLE)
                     <= 10.0)
                 AND (CAST(aw AS DOUBLE) >= CAST(nw AS DOUBLE) * 0.8)
                 AND (sh >= 1)) THEN 1 ELSE 0 END AS pos,
               least(1000, nw * 2) AS sm
             FROM m),
       bins AS (SELECT source, CAST(bin AS BIGINT) AS bin,
                 CAST(count(*) AS BIGINT) AS n_b,
                 CAST(sum(pos) AS BIGINT) AS pos,
                 CAST(sum(sm) AS BIGINT) AS sum_milli
               FROM s GROUP BY 1, 2),
       per AS (SELECT source, CAST(sum(n_b) AS BIGINT) AS n,
                 CAST(sum(abs(pos * 1000 - sum_milli)) AS BIGINT)
                   AS ece_num
               FROM bins GROUP BY source)
       SELECT b.source, b.bin, b.n_b, b.pos, b.sum_milli,
         CAST(b.pos AS DOUBLE) / CAST(b.n_b AS DOUBLE) AS accuracy,
         CAST(b.sum_milli AS DOUBLE) / CAST(b.n_b * 1000 AS DOUBLE)
           AS confidence,
         per.n, per.ece_num, per.n * 1000 AS ece_den,
         CAST(per.ece_num AS DOUBLE) / CAST(per.n * 1000 AS DOUBLE)
           AS ece
       FROM bins b JOIN per USING (source)"""

  private def compactionOracleSql: String =
    """WITH f AS (SELECT source,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 32 AS file_id,
             length(text) AS b
           FROM documents),
       fs AS (SELECT source, file_id, count(*) AS n_docs,
               CAST(sum(b) AS BIGINT) AS bytes
             FROM f GROUP BY 1, 2),
       c1 AS (SELECT *, sum(bytes) OVER (PARTITION BY source
                ORDER BY bytes DESC, file_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM fs),
       p AS (SELECT source, (cum - bytes) // 65536 AS bin, n_docs, bytes
             FROM c1)
       SELECT source, CAST(bin AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS n_files,
         CAST(sum(n_docs) AS BIGINT) AS n_docs,
         CAST(sum(bytes) AS BIGINT) AS bin_bytes,
         CAST(65536 AS BIGINT) AS target_bytes,
         (CAST(sum(bytes) AS BIGINT) > 65536) AS over_target
       FROM p GROUP BY 1, 2"""

  private def psiOracleSql: String = {
    import graft.functions.PortableMath
    s"""WITH raw AS (SELECT event_type, epoch_us(ts) AS tsu,
             CAST(floor(value * 1000) AS BIGINT) AS v
           FROM events),
       mm AS (SELECT (min(tsu) + max(tsu)) // 2 AS mid FROM raw),
       g AS (SELECT event_type,
               CASE WHEN tsu <= mm.mid THEN 0 ELSE 1 END AS half,
               v, count(*) AS cnt
             FROM raw, mm GROUP BY 1, 2, 3),
       rc AS (SELECT event_type, v, cnt,
                sum(cnt) OVER (PARTITION BY event_type ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS cum,
                sum(cnt) OVER (PARTITION BY event_type) AS total
              FROM g WHERE half = 0),
       e AS (SELECT event_type, CAST(max(total) AS BIGINT) AS n_ref,
               min(CASE WHEN cum * 10 >= total * 1 THEN v END) AS e1,
               min(CASE WHEN cum * 10 >= total * 2 THEN v END) AS e2,
               min(CASE WHEN cum * 10 >= total * 3 THEN v END) AS e3,
               min(CASE WHEN cum * 10 >= total * 4 THEN v END) AS e4,
               min(CASE WHEN cum * 10 >= total * 5 THEN v END) AS e5,
               min(CASE WHEN cum * 10 >= total * 6 THEN v END) AS e6,
               min(CASE WHEN cum * 10 >= total * 7 THEN v END) AS e7,
               min(CASE WHEN cum * 10 >= total * 8 THEN v END) AS e8,
               min(CASE WHEN cum * 10 >= total * 9 THEN v END) AS e9
             FROM rc GROUP BY event_type),
       b AS (SELECT g.event_type, g.half, g.cnt,
               (CASE WHEN g.v >= e.e1 THEN 1 ELSE 0 END)
               + (CASE WHEN g.v >= e.e2 THEN 1 ELSE 0 END)
               + (CASE WHEN g.v >= e.e3 THEN 1 ELSE 0 END)
               + (CASE WHEN g.v >= e.e4 THEN 1 ELSE 0 END)
               + (CASE WHEN g.v >= e.e5 THEN 1 ELSE 0 END)
               + (CASE WHEN g.v >= e.e6 THEN 1 ELSE 0 END)
               + (CASE WHEN g.v >= e.e7 THEN 1 ELSE 0 END)
               + (CASE WHEN g.v >= e.e8 THEN 1 ELSE 0 END)
               + (CASE WHEN g.v >= e.e9 THEN 1 ELSE 0 END) AS bin
             FROM g JOIN e USING (event_type)),
       cnts AS (SELECT event_type, CAST(bin AS BIGINT) AS bin,
                 CAST(sum(CASE WHEN half = 0 THEN cnt ELSE 0 END)
                   AS BIGINT) AS r,
                 CAST(sum(CASE WHEN half = 1 THEN cnt ELSE 0 END)
                   AS BIGINT) AS c
               FROM b GROUP BY 1, 2),
       sc AS (SELECT e.event_type, e.n_ref,
                CAST(bins.range AS BIGINT) AS bin
              FROM e CROSS JOIN range(0, 10) bins),
       nc AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n_cur
              FROM cnts GROUP BY event_type),
       f AS (SELECT sc.event_type, sc.bin,
               coalesce(cnts.r, 0) AS r, coalesce(cnts.c, 0) AS c,
               sc.n_ref, nc.n_cur,
               (coalesce(cnts.c, 0) + 1) * (sc.n_ref + 10) AS cn,
               (coalesce(cnts.r, 0) + 1) * (nc.n_cur + 10) AS rn,
               CAST((coalesce(cnts.c, 0) + 1) * (sc.n_ref + 10)
                   AS DOUBLE)
                 / CAST((coalesce(cnts.r, 0) + 1) * (nc.n_cur + 10)
                   AS DOUBLE) AS ratio
             FROM sc
             LEFT JOIN cnts ON sc.event_type = cnts.event_type
               AND sc.bin = cnts.bin
             JOIN nc ON sc.event_type = nc.event_type),
       ${PortableMath.log2FixedSqlStages("f", "ratio", "l2_fx", "ps")},
       p AS (SELECT event_type,
               CAST(sum(CAST(cn - rn AS HUGEINT) * l2_fx) AS BIGINT)
                 AS psi_fx,
               (max(n_ref) + 10) * (max(n_cur) + 10) AS den
             FROM psout GROUP BY event_type),
       p2 AS (SELECT event_type, psi_fx,
                CAST(psi_fx AS DOUBLE) * 0.6931471805599453
                  / (65536.0 * CAST(den AS DOUBLE)) AS psi
              FROM p)
       SELECT o.event_type, o.bin, o.r AS ref_cnt, o.c AS cur_cnt,
         o.l2_fx, o.n_ref, o.n_cur, p2.psi_fx, p2.psi
       FROM psout o JOIN p2 USING (event_type)"""
  }

  private def winsorOracleSql: String =
    """WITH r AS (SELECT event_type,
                CAST(floor(value * 1000) AS BIGINT) AS vfx,
                row_number() OVER (PARTITION BY event_type
                  ORDER BY value, event_id) AS rnk,
                count(*) OVER (PARTITION BY event_type) AS n
              FROM events),
         k AS (SELECT event_type, max(n) AS n, max(n) // 10 AS k
               FROM r GROUP BY event_type),
         e AS (SELECT r.event_type,
                 min(CASE WHEN rnk = k.k + 1 THEN vfx END) AS lo_milli,
                 min(CASE WHEN rnk = k.n - k.k THEN vfx END) AS hi_milli
               FROM r JOIN k USING (event_type) GROUP BY r.event_type),
         s AS (SELECT r.event_type,
                 CAST(sum(CASE WHEN rnk > k.k AND rnk <= k.n - k.k
                   THEN vfx ELSE 0 END) AS BIGINT) AS kept_sum_milli
               FROM r JOIN k USING (event_type) GROUP BY r.event_type)
         SELECT k.event_type, CAST(k.n AS BIGINT) AS n,
           CAST(k.k AS BIGINT) AS k, e.lo_milli, e.hi_milli,
           s.kept_sum_milli,
           s.kept_sum_milli + k.k * (e.lo_milli + e.hi_milli)
             AS winsor_sum_milli,
           CAST(s.kept_sum_milli + k.k * (e.lo_milli + e.hi_milli)
               AS DOUBLE)
             / CAST(k.n AS DOUBLE) / 1000.0 AS winsorized_mean
         FROM k JOIN e USING (event_type) JOIN s USING (event_type)"""

  private def cramersOracleSql: String =
    """WITH e AS (SELECT event_type,
             ((CAST(ts AS DATE) - DATE '2024-01-01') % 7 + 7) % 7
               AS weekday
           FROM events),
       cells AS (SELECT event_type, CAST(weekday AS BIGINT) AS weekday,
               count(*) AS o
             FROM e GROUP BY event_type, weekday),
       r AS (SELECT event_type, sum(o) AS r FROM cells
             GROUP BY event_type),
       c AS (SELECT weekday, sum(o) AS c FROM cells GROUP BY weekday),
       t AS (SELECT sum(o) AS nn,
               count(DISTINCT event_type) AS rl,
               count(DISTINCT weekday) AS cl,
               (count(DISTINCT event_type) - 1)
                 * (count(DISTINCT weekday) - 1) AS dof
             FROM cells),
       k AS (SELECT cells.event_type, cells.weekday, cells.o,
               CAST(((CAST(cells.o AS HUGEINT) * t.nn
                   - CAST(r.r AS HUGEINT) * c.c)
                 * (CAST(cells.o AS HUGEINT) * t.nn
                   - CAST(r.r AS HUGEINT) * c.c)
                 * 1000000) // (CAST(t.nn AS HUGEINT) * r.r * c.c)
                 AS BIGINT) AS contrib_micro
             FROM cells
             JOIN r ON cells.event_type = r.event_type
             JOIN c ON cells.weekday = c.weekday
             CROSS JOIN t)
       SELECT CAST(t.nn AS BIGINT) AS n,
         CAST(t.rl AS BIGINT) AS r_levels,
         CAST(t.cl AS BIGINT) AS c_levels,
         CAST(t.dof AS BIGINT) AS dof,
         CAST(sum(k.contrib_micro) AS BIGINT) AS chi2_micro,
         sqrt(CAST(CAST(sum(k.contrib_micro) AS BIGINT) AS DOUBLE)
           / CAST(CAST(t.nn * least(t.rl - 1, t.cl - 1) * 1000000
               AS BIGINT) AS DOUBLE)) AS cramers_v
       FROM k CROSS JOIN t
       GROUP BY t.nn, t.rl, t.cl, t.dof"""

  private def dailySeriesOracleCte: String =
    """d AS (SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             count(*) AS x,
             CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
               AS y
           FROM events GROUP BY event_type, 2),
       nd AS (SELECT event_type, count(*) AS n_days FROM d
              GROUP BY event_type)"""

  private def theilSenOracleSql: String =
    s"""WITH $dailySeriesOracleCte,
       s AS (SELECT a.event_type,
               CAST(b.y * a.x - a.y * b.x AS DOUBLE)
                 / CAST(a.x * b.x * (b.d - a.d) AS DOUBLE) AS slope
             FROM d a JOIN d b
               ON a.event_type = b.event_type AND a.d < b.d),
       g AS (SELECT event_type, slope, count(*) AS cnt FROM s
             GROUP BY event_type, slope),
       c1 AS (SELECT *, sum(cnt) OVER (PARTITION BY event_type
                ORDER BY slope ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cum,
              sum(cnt) OVER (PARTITION BY event_type) AS total
            FROM g),
       m AS (SELECT event_type,
               min(CASE WHEN cum * 2 >= total THEN slope END)
                 AS ts_slope_milli_per_day,
               CAST(max(total) AS BIGINT) AS n_pairs
             FROM c1 GROUP BY event_type)
       SELECT m.event_type, CAST(nd.n_days AS BIGINT) AS n_days,
         m.n_pairs, m.ts_slope_milli_per_day
       FROM m JOIN nd USING (event_type)"""

  private def kendallOracleSql: String =
    s"""WITH $dailySeriesOracleCte,
       p AS (SELECT a.event_type,
               count(*) AS n0,
               sum(CASE WHEN (b.x > a.x AND b.y > a.y)
                     OR (b.x < a.x AND b.y < a.y)
                   THEN 1 ELSE 0 END) AS concordant,
               sum(CASE WHEN (b.x > a.x AND b.y < a.y)
                     OR (b.x < a.x AND b.y > a.y)
                   THEN 1 ELSE 0 END) AS discordant,
               sum(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) AS ties_x,
               sum(CASE WHEN b.y = a.y THEN 1 ELSE 0 END) AS ties_y
             FROM d a JOIN d b
               ON a.event_type = b.event_type AND a.d < b.d
             GROUP BY a.event_type)
       SELECT p.event_type, CAST(nd.n_days AS BIGINT) AS n_days,
         CAST(n0 AS BIGINT) AS n0,
         CAST(concordant AS BIGINT) AS concordant,
         CAST(discordant AS BIGINT) AS discordant,
         CAST(ties_x AS BIGINT) AS ties_x,
         CAST(ties_y AS BIGINT) AS ties_y,
         CAST(CAST(concordant AS BIGINT) - CAST(discordant AS BIGINT)
             AS DOUBLE)
           / sqrt(CAST(CAST((n0 - ties_x) * (n0 - ties_y) AS BIGINT)
               AS DOUBLE)) AS tau_b
       FROM p JOIN nd USING (event_type)"""

  private def benfordOracleSql: String =
    """WITH v AS (SELECT event_type,
                CAST(substr(CAST(CAST(floor(value * 1000) AS BIGINT)
                  AS VARCHAR), 1, 1) AS BIGINT) AS digit
              FROM events WHERE value > 0),
         v2 AS (SELECT * FROM v WHERE digit >= 1),
         n AS (SELECT event_type, count(*) AS n FROM v2
               GROUP BY event_type),
         em AS (SELECT * FROM (VALUES (1, 301029), (2, 176091),
                 (3, 124938), (4, 96910), (5, 79181), (6, 66946),
                 (7, 57991), (8, 51152), (9, 45757))
                 AS t(digit, e_micro)),
         o AS (SELECT event_type, digit, count(*) AS o FROM v2
               GROUP BY event_type, digit),
         f AS (SELECT n.event_type, em.digit, n.n,
                 coalesce(o.o, 0) AS o, em.e_micro
               FROM n CROSS JOIN em
               LEFT JOIN o ON o.event_type = n.event_type
                 AND o.digit = em.digit),
         k AS (SELECT event_type, CAST(digit AS BIGINT) AS digit, n,
                 CAST(o AS BIGINT) AS o,
                 CAST((CAST(n AS HUGEINT) * e_micro) // 1000
                   AS BIGINT) AS exp_milli,
                 CAST(((CAST(o AS HUGEINT) * 1000000
                     - CAST(n AS HUGEINT) * e_micro)
                   * (CAST(o AS HUGEINT) * 1000000
                     - CAST(n AS HUGEINT) * e_micro))
                   // (CAST(n AS HUGEINT) * e_micro) AS BIGINT)
                   AS contrib_micro
               FROM f),
         st AS (SELECT event_type, sum(contrib_micro) AS b FROM k
                GROUP BY event_type)
         SELECT k.event_type, k.digit, k.n, k.o, k.exp_milli,
           k.contrib_micro, CAST(st.b AS BIGINT) AS benford_micro_type
         FROM k JOIN st ON k.event_type = st.event_type"""

  private def chisqOracleSql: String =
    """WITH e AS (SELECT event_type,
             ((CAST(ts AS DATE) - DATE '2024-01-01') % 7 + 7) % 7
               AS weekday
           FROM events),
       cells AS (SELECT event_type, CAST(weekday AS BIGINT) AS weekday,
               count(*) AS o
             FROM e GROUP BY event_type, weekday),
       r AS (SELECT event_type, sum(o) AS r FROM cells
             GROUP BY event_type),
       c AS (SELECT weekday, sum(o) AS c FROM cells GROUP BY weekday),
       t AS (SELECT sum(o) AS nn,
               (count(DISTINCT event_type) - 1)
                 * (count(DISTINCT weekday) - 1) AS dof
             FROM cells),
       k AS (SELECT cells.event_type, cells.weekday, cells.o,
               CAST((CAST(r.r AS HUGEINT) * c.c * 1000) // t.nn
                 AS BIGINT) AS e_milli,
               CAST(((CAST(cells.o AS HUGEINT) * t.nn
                   - CAST(r.r AS HUGEINT) * c.c)
                 * (CAST(cells.o AS HUGEINT) * t.nn
                   - CAST(r.r AS HUGEINT) * c.c)
                 * 1000000) // (CAST(t.nn AS HUGEINT) * r.r * c.c)
                 AS BIGINT) AS contrib_micro,
               CAST(t.dof AS BIGINT) AS dof
             FROM cells
             JOIN r ON cells.event_type = r.event_type
             JOIN c ON cells.weekday = c.weekday
             CROSS JOIN t),
       s AS (SELECT event_type, sum(contrib_micro) AS chi2 FROM k
             GROUP BY event_type)
       SELECT k.event_type, k.weekday, CAST(k.o AS BIGINT) AS o,
         k.e_milli, k.contrib_micro,
         CAST(s.chi2 AS BIGINT) AS chi2_micro_type, k.dof
       FROM k JOIN s ON k.event_type = s.event_type"""

  private def ksOracleSql: String =
    """WITH g AS (
         SELECT event_type, value,
           sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS ca,
           sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS cb
         FROM events GROUP BY event_type, value),
       r AS (SELECT event_type,
               sum(ca) OVER (PARTITION BY event_type ORDER BY value
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cuma,
               sum(cb) OVER (PARTITION BY event_type ORDER BY value
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cumb,
               sum(ca) OVER (PARTITION BY event_type) AS n_a,
               sum(cb) OVER (PARTITION BY event_type) AS n_b
             FROM g),
       s AS (SELECT event_type, n_a, n_b,
               max(abs(cuma * n_b - cumb * n_a)) AS d_num
             FROM r GROUP BY event_type, n_a, n_b)
       SELECT event_type, CAST(n_a AS BIGINT) AS n_a,
         CAST(n_b AS BIGINT) AS n_b,
         CAST(d_num AS BIGINT) AS d_num,
         CAST(CASE WHEN 10000 * d_num * d_num >=
             18496 * (n_a + n_b) * n_a * n_b
           THEN 1 ELSE 0 END AS BIGINT) AS significant
       FROM s"""

  /** q81/st59: Mann–Whitney U with tie-corrected z decision, all in
    * exact integers (HUGEINT here, DECIMAL(38,0) on the Spark side). */
  private def mannWhitneyOracleSql: String =
    """WITH g AS (
         SELECT event_type, value,
           sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS ca,
           sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS cb,
           count(*) AS cnt
         FROM events GROUP BY event_type, value),
       r AS (SELECT *, sum(cnt) OVER (PARTITION BY event_type
               ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum FROM g),
       s AS (SELECT event_type,
               sum(ca) AS n_a, sum(cb) AS n_b,
               sum(ca * (2 * cum - cnt + 1)) AS r2_a,
               sum(cnt * cnt * cnt - cnt) AS tie_cubes
             FROM r GROUP BY event_type),
       t AS (SELECT event_type, n_a, n_b, tie_cubes,
               r2_a - n_a * (n_a + 1) AS u2_a,
               n_a + n_b AS nn
             FROM s)
       SELECT event_type, CAST(n_a AS BIGINT) AS n_a,
         CAST(n_b AS BIGINT) AS n_b,
         CAST(u2_a AS BIGINT) AS u2_a,
         CAST(tie_cubes AS BIGINT) AS tie_cubes,
         CAST(CASE WHEN
             30000 * (u2_a - n_a * n_b) * (u2_a - n_a * n_b)
               * nn * (nn - 1)
             >= 38416 * n_a * n_b
               * ((nn + 1) * nn * (nn - 1) - tie_cubes)
           THEN 1 ELSE 0 END AS BIGINT) AS significant
       FROM t"""

  /** q80/st58: first-order Markov transition matrix over per-user
    * (ts, event_id)-ordered timelines; p = one double division of two
    * exact longs on both engines. */
  private def transitionOracleSql: String =
    """WITH seq AS (
         SELECT event_type AS src,
           lead(event_type) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS dst
         FROM events),
       tr AS (SELECT src, dst, count(*) AS cnt FROM seq
              WHERE dst IS NOT NULL GROUP BY src, dst)
       SELECT src, dst, cnt,
         CAST(cnt AS DOUBLE)
           / CAST(sum(cnt) OVER (PARTITION BY src) AS DOUBLE) AS p
       FROM tr"""

  /** q79/st57: per-user first/last-touch attribution with exact
    * microsecond last-touch lags; strictly-preceding (ts, event_id)
    * frame on both engines. */
  private def attributionOracleSql: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
           epoch_us(ts) AS ts_us FROM events),
       x AS (SELECT user_id, event_type, ts_us,
           min(CASE WHEN event_type = 'click' THEN ts_us END)
             OVER (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS first_click,
           max(CASE WHEN event_type = 'click' THEN ts_us END)
             OVER (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS last_click
         FROM e)
       SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
         CAST(sum(CASE WHEN first_click IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS n_attributed,
         CAST(sum(CASE WHEN last_click IS NOT NULL
           THEN ts_us - last_click ELSE 0 END) AS BIGINT)
           AS last_touch_lag_us
       FROM x WHERE event_type = 'purchase' GROUP BY 1"""

  /** q74/st54: per-type daily-volume OLS trend from exact integer
    * moments over the observed-day grain. */
  private def groupTrendOracleSql: String =
    """WITH daily AS (SELECT event_type,
           CAST(date_diff('day', DATE '2024-01-01',
             CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
           CAST(count(*) AS BIGINT) AS y
         FROM events GROUP BY 1, 2),
       m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx
         FROM daily GROUP BY 1)
       SELECT event_type, n_days,
         n_days * sxy - sx * sy AS num,
         n_days * sxx - sx * sx AS den,
         CASE WHEN n_days * sxx - sx * sx <> 0 THEN
           CAST(n_days * sxy - sx * sy AS DOUBLE)
             / CAST(n_days * sxx - sx * sx AS DOUBLE) END
           AS slope_per_day
       FROM m"""

  /** c30/st53: the unpruned user-range aggregate the zone-map-pruned
    * read must reproduce exactly. */
  private def zoneRangeOracleSql: String =
    """WITH b AS (SELECT max(user_id) * 10 // 100 AS lo,
           max(user_id) * 25 // 100 AS hi FROM events)
       SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
           AS cents_sum
       FROM events, b WHERE user_id BETWEEN b.lo AND b.hi
       GROUP BY 1"""

  /** c29/st52: the versioned-profile lake's net change feed,
    * reconstructed from raw events (pre-cutoff state vs final state
    * per user). Shared by the single-merge diff (c29) and the
    * streaming commit-chain diff (st52) — key-disjoint batches with
    * full-payload upserts compose to the same final state. */
  private def lakeCdcOracleSql: String =
    """WITH pre AS (SELECT user_id, count(*) AS n,
           sum(CAST(value AS DECIMAL(12,2))) AS vs
         FROM events WHERE ts < TIMESTAMP '2024-01-16'
         GROUP BY user_id),
       tot AS (SELECT user_id, count(*) AS n,
           sum(CAST(value AS DECIMAL(12,2))) AS vs
         FROM events GROUP BY user_id),
       post AS (SELECT DISTINCT user_id FROM events
           WHERE ts >= TIMESTAMP '2024-01-16')
       SELECT p.user_id, 'delete' AS change,
         CAST(p.n AS BIGINT) AS n_events_old,
         CAST(NULL AS BIGINT) AS n_events_new,
         CAST(p.vs AS DOUBLE) AS val_sum_old,
         CAST(NULL AS DOUBLE) AS val_sum_new
       FROM pre p JOIN post po ON po.user_id = p.user_id
       WHERE p.user_id % 7 = 3
       UNION ALL
       SELECT t.user_id, 'update',
         CAST(p.n AS BIGINT), CAST(t.n AS BIGINT),
         CAST(p.vs AS DOUBLE), CAST(t.vs AS DOUBLE)
       FROM tot t JOIN post po ON po.user_id = t.user_id
            JOIN pre p ON p.user_id = t.user_id
       WHERE t.user_id % 7 <> 3
       UNION ALL
       SELECT t.user_id, 'insert',
         CAST(NULL AS BIGINT), CAST(t.n AS BIGINT),
         CAST(NULL AS DOUBLE), CAST(t.vs AS DOUBLE)
       FROM tot t JOIN post po ON po.user_id = t.user_id
            LEFT JOIN pre p ON p.user_id = t.user_id
       WHERE t.user_id % 7 <> 3 AND p.user_id IS NULL"""

  private def embPreSql: String =
    """SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS v,
         (SELECT sum(e*e) FROM unnest(
           list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT))) t(e)) AS n2
       FROM embeddings"""

  private def langScoreSql(lang: String, wordsExpr: String = "w"): String = {
    val words = graft.ops.TextAnalysis.stopwords(lang)
      .map(w => s"'$w'").mkString(",")
    s"len(list_filter($wordsExpr, x -> x IN ($words)))"
  }
}
