package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ext.{Dedup, Graph, Layout, Multimodal, PipelineOps, Privacy, Relational, Similarity, TextAnalysis, TimeSeries, TpchMore}
import graft.ops.CoreQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (present + extension) registers
  * here: a Spark implementation in `queries` and, when
  * ANSI-SQL-expressible, a DuckDB oracle in `oracleSql` with matching
  * column aliases (the driver hash-compares column-name-sorted
  * values). Queries without an oracle get a rows-only check and are
  * covered by ScalaTest instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.docChunkStats(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Core pipeline (reference semantics, SURVEY §2.1-2.5/§7.2)
    "doc_chunk_stats" -> (CoreQueries.docChunkStats(_, _)),
    // S3 end-to-end: synthesized .pdf files -> binaryFile -> codec ->
    // splitter -> stats, closed-form oracle (round 9)
    "pdf_chunk_stats" -> (graft.ops.PdfCorpus.pdfChunkStats(_, _)),
    // S3 charset tier (round 10): Type0/no-ToUnicode PDFs under the
    // legacy GBK-EUC-H / ETen-B5-V / 90ms-RKSJ-H / KSC-EUC-V CMaps,
    // real 2-byte DBCS shown bytes, closed-form translate() oracle
    "pdf_cjk_stats" -> (graft.ops.PdfCorpus.pdfCjkStats(_, _)),
    "doc_chunks" -> (CoreQueries.docChunks(_, _)),
    "doc_chunks_overlap" -> (CoreQueries.docChunksOverlap(_, _)),
    "chunk_fixed" -> (CoreQueries.chunkFixed(_, _)),
    "chunk_multipage" -> (CoreQueries.chunkMultipage(_, _)),
    "doc_stats_fixed" -> (CoreQueries.docStatsFixed(_, _)),
    "doc_normalize" -> (CoreQueries.docNormalize(_, _)),
    "multi_root" -> (CoreQueries.multiRoot(_, _)),
    // interchange-format roundtrips (sources/SourceFormats.scala)
    "source_jsonl" -> (graft.sources.SourceFormats.sourceJsonl(_, _)),
    "source_csv" -> (graft.sources.SourceFormats.sourceCsv(_, _)),
    "source_orc" -> (graft.sources.SourceFormats.sourceOrc(_, _)),
    "doc_report" -> (CoreQueries.docReport(_, _)),
    "sql_chunk_split" -> (CoreQueries.sqlChunkSplit(_, _)),
    // Aggregations (§2.5)
    "q1_agg" -> (Relational.q1Agg(_, _)),
    "q3_shipping" -> (Relational.q3Shipping(_, _)),
    "q5_local_supplier" -> (Relational.q5LocalSupplier(_, _)),
    "q6_forecast" -> (Relational.q6Forecast(_, _)),
    "q18_large_orders" -> (Relational.q18LargeOrders(_, _)),
    "q21_waiting_suppliers" -> (Relational.q21WaitingSuppliers(_, _)),
    "q22_global_sales" -> (Relational.q22GlobalSales(_, _)),
    "q2_min_cost_supplier" -> (TpchMore.q2MinCostSupplier(_, _)),
    "q4_order_priority" -> (TpchMore.q4OrderPriority(_, _)),
    "q7_volume_shipping" -> (TpchMore.q7VolumeShipping(_, _)),
    "q11_important_stock" -> (TpchMore.q11ImportantStock(_, _)),
    "q16_parts_suppliers" -> (TpchMore.q16PartsSuppliers(_, _)),
    "q20_dominant_suppliers" -> (TpchMore.q20DominantSuppliers(_, _)),
    "q8_market_share" -> (TpchMore.q8MarketShare(_, _)),
    "q9_product_profit" -> (TpchMore.q9ProductProfit(_, _)),
    "q10_returned_items" -> (TpchMore.q10ReturnedItems(_, _)),
    "q12_ship_priority" -> (TpchMore.q12ShipPriority(_, _)),
    "q13_customer_dist" -> (TpchMore.q13CustomerDist(_, _)),
    "q14_promo_share" -> (TpchMore.q14PromoShare(_, _)),
    "q15_top_supplier" -> (TpchMore.q15TopSupplier(_, _)),
    "q17_small_quantity" -> (TpchMore.q17SmallQuantity(_, _)),
    "q19_discounted" -> (TpchMore.q19Discounted(_, _)),
    "agg_rollup" -> (Relational.aggRollup(_, _)),
    "agg_cube" -> (Relational.aggCube(_, _)),
    "agg_distinct" -> (Relational.aggDistinct(_, _)),
    // Spark's built-in HLL++ (approx_count_distinct): the raw sketch
    // estimate is engine-specific, so the gate is a BOUNDED check
    // (round 11) — exact count + a within-±2% flag the oracle demands
    // true, converting the former `no_oracle` into a falsifiable
    // assertion of the published HLL++ error bound. Its portable twin
    // `agg_hll` carries the full value-for-value hash gate.
    "agg_approx_distinct" -> (Relational.aggApproxDistinct(_, _)),
    "agg_kmv_distinct" -> (Relational.aggKmvDistinct(_, _)),
    "agg_hll" -> (Relational.aggHll(_, _)),
    "agg_cms_freq" -> (Relational.aggCmsFreq(_, _)),
    "agg_histogram_quantile" -> (Relational.aggHistogramQuantile(_, _)),
    "agg_percentile" -> (Relational.aggPercentile(_, _)),
    "agg_variance" -> (Relational.aggVariance(_, _)),
    "agg_moments" -> (Relational.aggMoments(_, _)),
    "agg_pivot" -> (Relational.aggPivot(_, _)),
    "agg_unpivot" -> (Relational.aggUnpivot(_, _)),
    "agg_mode" -> (Relational.aggMode(_, _)),
    "agg_grouping_sets" -> (Relational.aggGroupingSets(_, _)),
    "scalar_subquery" -> (Relational.scalarSubquery(_, _)),
    "agg_typed_ratio" -> (TextAnalysis.aggTypedRatio(_, _)),
    "array_ops" -> (TextAnalysis.arrayOps(_, _)),
    // Joins (§2.6)
    "join_broadcast" -> (Relational.joinBroadcast(_, _)),
    "join_sortmerge" -> (Relational.joinSortMerge(_, _)),
    "join_semi" -> (Relational.joinSemi(_, _)),
    "join_anti" -> (Relational.joinAnti(_, _)),
    "join_range" -> (Relational.joinRange(_, _)),
    "join_salted" -> (Relational.joinSalted(_, _)),
    "join_bloom" -> (Relational.joinBloom(_, _)),
    "layout_zorder" -> (Layout.layoutZorder(_, _)),
    "layout_hilbert" -> (Layout.layoutHilbert(_, _)),
    "cdc_diff" -> (Relational.cdcDiff(_, _)),
    "join_division" -> (Relational.joinDivision(_, _)),
    "dq_checks" -> (Relational.dqChecks(_, _)),
    "dq_profile" -> (Relational.dqProfile(_, _)),
    "dq_referential" -> (Relational.dqReferential(_, _)),
    "dq_freshness" -> (Relational.dqFreshness(_, _)),
    "dq_uniqueness" -> (Relational.dqUniqueness(_, _)),
    "diag_skew" -> (Relational.diagSkew(_, _)),
    "agg_weighted_median" -> (Relational.aggWeightedMedian(_, _)),
    "window_growth" -> (Relational.windowGrowth(_, _)),
    "sql_kmv" -> (Relational.sqlKmv(_, _)),
    "sketch_setops" -> (Relational.sketchSetops(_, _)),
    "sketch_bloom" -> (TextAnalysis.sketchBloom(_, _)),
    // Windows (§2.7)
    "window_lag" -> (Relational.windowLag(_, _)),
    "window_topk" -> (Relational.windowTopk(_, _)),
    "topk_custom" -> (Relational.topkCustom(_, _)),
    "window_running" -> (Relational.windowRunning(_, _)),
    "window_rank_family" -> (Relational.windowRankFamily(_, _)),
    "window_range_frame" -> (Relational.windowRangeFrame(_, _)),
    // Set ops (§2.8)
    "set_ops" -> (Relational.setOps(_, _)),
    "set_ops_all" -> (Relational.setOpsAll(_, _)),
    // JSON / date scalars (§2.2)
    "json_extract" -> (Relational.jsonExtract(_, _)),
    "json_struct" -> (Relational.jsonStruct(_, _)),
    "date_trunc" -> (Relational.dateTrunc(_, _)),
    "date_arith" -> (Relational.dateArith(_, _)),
    // Event-time: as-of join, sessionization, tumbling window
    "asof_join" -> (Relational.asofJoin(_, _)),
    "asof_tolerance" -> (Relational.asofTolerance(_, _)),
    "sessionize" -> (Relational.sessionize(_, _)),
    "event_tumbling" -> (Relational.eventTumbling(_, _)),
    "event_hopping" -> (Relational.eventHopping(_, _)),
    "event_funnel" -> (Relational.eventFunnel(_, _)),
    "event_sequences" -> (Relational.eventSequences(_, _)),
    "event_retention" -> (Relational.eventRetention(_, _)),
    "event_anomaly" -> (Relational.eventAnomaly(_, _)),
    "event_markov" -> (Relational.eventMarkov(_, _)),
    "ts_gapfill" -> (TimeSeries.tsGapfill(_, _)),
    "scd2_build" -> (TimeSeries.scd2Build(_, _)),
    "scd2_lookup" -> (TimeSeries.scd2Lookup(_, _)),
    "ts_interp" -> (TimeSeries.tsInterp(_, _)),
    "interval_merge" -> (TimeSeries.intervalMerge(_, _)),
    "cdc_apply" -> (TimeSeries.cdcApply(_, _)),
    "agg_decay" -> (TimeSeries.aggDecay(_, _)),
    "event_attribution" -> (Relational.eventAttribution(_, _)),
    "event_rfm" -> (Relational.eventRfm(_, _)),
    "window_islands" -> (Relational.windowIslands(_, _)),
    "agg_regression" -> (Relational.aggRegression(_, _)),
    "graph_pagerank" -> (Graph.graphPagerank(_, _)),
    "graph_triangles" -> (Graph.graphTriangles(_, _)),
    "graph_jaccard" -> (Graph.graphJaccard(_, _)),
    "graph_bfs" -> (Graph.graphBfs(_, _)),
    "graph_components" -> (Graph.graphComponents(_, _)),
    "graph_kcore" -> (Graph.graphKcore(_, _)),
    "graph_ktruss" -> (Graph.graphKtruss(_, _)),
    "graph_assortativity" -> (Graph.graphAssortativity(_, _)),
    "graph_clustcoeff" -> (Graph.graphClustcoeff(_, _)),
    "graph_motifs" -> (Graph.graphMotifs(_, _)),
    "graph_hits" -> (Graph.graphHits(_, _)),
    "graph_walks" -> (Graph.graphWalks(_, _)),
    // Structured Streaming under the hard gate: micro-batch replay of
    // the events table, watermarked aggs, memory sink (§2.10)
    "stream_tumbling" -> (graft.streaming.EventStreams.streamTumbling(_, _)),
    "stream_topk" -> (graft.streaming.EventStreams.streamTopk(_, _)),
    "stream_kmv_distinct" -> (graft.streaming.EventStreams.streamKmvDistinct(_, _)),
    "stream_sessionize" -> (graft.streaming.EventStreams.streamSessionize(_, _)),
    "stream_dedup" -> (graft.streaming.EventStreams.streamDedup(_, _)),
    "stream_enrich" -> (graft.streaming.EventStreams.streamEnrich(_, _)),
    "stream_hopping" -> (graft.streaming.EventStreams.streamHopping(_, _)),
    "stream_join" -> (graft.streaming.EventStreams.streamJoin(_, _)),
    "stream_anomaly" -> (graft.streaming.EventStreams.streamAnomaly(_, _)),
    "stream_ohlc" -> (graft.streaming.EventStreams.streamOhlc(_, _)),
    "stream_session_stats" -> (graft.streaming.EventStreams.streamSessionStats(_, _)),
    // Text analysis (north star)
    "text_quality" -> (TextAnalysis.textQuality(_, _)),
    "text_langid" -> (TextAnalysis.textLangid(_, _)),
    "text_langid_eval" -> (TextAnalysis.textLangidEval(_, _)),
    "text_simpson" -> (TextAnalysis.textSimpson(_, _)),
    "text_hapax" -> (TextAnalysis.textHapax(_, _)),
    "text_jsd" -> (TextAnalysis.textJsd(_, _)),
    "text_tokens" -> (TextAnalysis.textTokens(_, _)),
    "text_fingerprint" -> (TextAnalysis.textFingerprint(_, _)),
    "text_edit_distance" -> (TextAnalysis.textEditDistance(_, _)),
    "text_tfidf" -> (TextAnalysis.textTfidf(_, _)),
    "text_pii_scrub" -> (TextAnalysis.textPiiScrub(_, _)),
    "text_bm25" -> (TextAnalysis.textBm25(_, _)),
    "text_bm25_multi" -> (TextAnalysis.textBm25Multi(_, _)),
    "text_repetition" -> (TextAnalysis.textRepetition(_, _)),
    "text_vocab" -> (TextAnalysis.textVocab(_, _)),
    "quality_normalize" -> (TextAnalysis.qualityNormalize(_, _)),
    "quality_logreg" -> (TextAnalysis.qualityLogreg(_, _)),
    "quality_cascade" -> (TextAnalysis.qualityCascade(_, _)),
    "quality_gopher" -> (TextAnalysis.qualityGopher(_, _)),
    "text_lm_score" -> (TextAnalysis.textLmScore(_, _)),
    "text_entropy" -> (TextAnalysis.textEntropy(_, _)),
    "text_gini" -> (TextAnalysis.textGini(_, _)),
    "text_pmi" -> (TextAnalysis.textPmi(_, _)),
    "text_rank" -> (TextAnalysis.textRank(_, _)),
    "text_rake" -> (TextAnalysis.textRake(_, _)),
    "text_winnow" -> (TextAnalysis.textWinnow(_, _)),
    "text_cdc" -> (TextAnalysis.textCdc(_, _)),
    "text_zipf" -> (TextAnalysis.textZipf(_, _)),
    "text_readability" -> (TextAnalysis.textReadability(_, _)),
    "text_burstiness" -> (TextAnalysis.textBurstiness(_, _)),
    "text_bpe" -> (TextAnalysis.textBpe(_, _)),
    "text_bpe_encode" -> (TextAnalysis.textBpeEncode(_, _)),
    "text_fertility" -> (TextAnalysis.textFertility(_, _)),
    "chunk_token_budget" -> (TextAnalysis.chunkTokenBudget(_, _)),
    "text_logodds" -> (TextAnalysis.textLogodds(_, _)),
    "privacy_kanon" -> (Privacy.privacyKanon(_, _)),
    "privacy_risk" -> (Privacy.privacyRisk(_, _)),
    "privacy_ldiv" -> (Privacy.privacyLdiv(_, _)),
    "privacy_tclose" -> (Privacy.privacyTclose(_, _)),
    "layout_zonemap" -> (Layout.layoutZonemap(_, _)),
    "layout_bucket" -> (Layout.layoutBucket(_, _)),
    "layout_partition" -> (Layout.layoutPartition(_, _)),
    "dedup_substring" -> (Dedup.dedupSubstring(_, _)),
    "ts_ewma" -> (TimeSeries.tsEwma(_, _)),
    "ts_changepoint" -> (TimeSeries.tsChangepoint(_, _)),
    "ts_holt" -> (TimeSeries.tsHolt(_, _)),
    "ts_holtwinters" -> (TimeSeries.tsHoltWinters(_, _)),
    "ts_theilsen" -> (TimeSeries.tsTheilSen(_, _)),
    "ts_ohlc" -> (TimeSeries.tsOhlc(_, _)),
    "ts_seasonal" -> (TimeSeries.tsSeasonal(_, _)),
    "interval_sweep" -> (TimeSeries.intervalSweep(_, _)),
    "interval_allen" -> (TimeSeries.intervalAllen(_, _)),
    "ts_mad" -> (TimeSeries.tsMad(_, _)),
    "ts_acf" -> (TimeSeries.tsAcf(_, _)),
    "ts_crosscorr" -> (TimeSeries.tsCrosscorr(_, _)),
    "ts_rsi" -> (TimeSeries.tsRsi(_, _)),
    "interval_gaps" -> (TimeSeries.intervalGaps(_, _)),
    "text_ttr" -> (TextAnalysis.textTtr(_, _)),
    "text_predictability" -> (TextAnalysis.textPredictability(_, _)),
    "graph_degree_dist" -> (Graph.graphDegreeDist(_, _)),
    "graph_community" -> (Graph.graphCommunity(_, _)),
    "graph_foaf" -> (Graph.graphFoaf(_, _)),
    "event_lag_dist" -> (Relational.eventLagDist(_, _)),
    "privacy_dp_hist" -> (Privacy.privacyDpHist(_, _)),
    "dq_iqr" -> (Relational.dqIqr(_, _)),
    "pipeline_epoch_order" -> (PipelineOps.pipelineEpochOrder(_, _)),
    // round 14
    "retrieval_mrr" -> (Similarity.retrievalMrr(_, _)),
    "privacy_dp_mean" -> (Privacy.privacyDpMean(_, _)),
    "privacy_dp_topk" -> (Privacy.privacyDpTopk(_, _)),
    "privacy_dp_quantile" -> (Privacy.privacyDpQuantile(_, _)),
    "privacy_generalize" -> (Privacy.privacyGeneralize(_, _)),
    "agg_corr" -> (Relational.aggCorr(_, _)),
    "window_ntile" -> (Relational.windowNtile(_, _)),
    "event_paths" -> (Relational.eventPaths(_, _)),
    "event_stickiness" -> (Relational.eventStickiness(_, _)),
    "event_stickiness_kmv" -> (Relational.eventStickinessKmv(_, _)),
    "event_cohort_ltv" -> (Relational.eventCohortLtv(_, _)),
    "event_churn" -> (Relational.eventChurn(_, _)),
    "event_pareto" -> (Relational.eventPareto(_, _)),
    "event_overlap" -> (Relational.eventOverlap(_, _)),
    "event_new_users" -> (Relational.eventNewUsers(_, _)),
    "ts_winsorize" -> (TimeSeries.tsWinsorize(_, _)),
    "ts_bollinger" -> (TimeSeries.tsBollinger(_, _)),
    "event_gini" -> (Relational.eventGini(_, _)),
    "agg_theil" -> (Relational.aggTheil(_, _)),
    "agg_hhi" -> (Relational.aggHhi(_, _)),
    "ts_drawdown" -> (TimeSeries.tsDrawdown(_, _)),
    "event_funnel_time" -> (Relational.eventFunnelTime(_, _)),
    "source_xml" -> (graft.sources.SourceFormats.sourceXml(_, _)),
    "source_xml_attrs" -> (graft.sources.SourceFormats.sourceXmlAttrs(_, _)),
    "dq_benford" -> (Relational.dqBenford(_, _)),
    "event_abtest" -> (Relational.eventAbtest(_, _)),
    "dq_psi" -> (TextAnalysis.dqPsi(_, _)),
    // Dedup (north star)
    "dedup_exact" -> (Dedup.dedupExact(_, _)),
    "dedup_minhash" -> (Dedup.dedupMinhash(_, _)),
    "dedup_ngram" -> (Dedup.dedupNgram(_, _)),
    "dedup_containment" -> (Dedup.dedupContainment(_, _)),
    "text_novelty" -> (Dedup.textNovelty(_, _)),
    "dedup_embedding" -> (Dedup.dedupEmbedding(_, _)),
    "dedup_embedding_ann" -> (Dedup.dedupEmbeddingAnn(_, _)),
    "dedup_embedding_ann_hi" -> (Dedup.dedupEmbeddingAnnHi(_, _)),
    "dedup_simhash" -> (Dedup.dedupSimhash(_, _)),
    "dedup_cluster" -> (Dedup.dedupCluster(_, _)),
    "dedup_contamination" -> (Dedup.dedupContamination(_, _)),
    "dedup_spans" -> (Dedup.dedupSpans(_, _)),
    "dedup_lines" -> (Dedup.dedupLines(_, _)),
    "dedup_incremental" -> (Dedup.dedupIncremental(_, _)),
    "dedup_editdist" -> (Dedup.dedupEditDistance(_, _)),
    "corpus_overlap" -> (Dedup.corpusOverlap(_, _)),
    "dedup_sorted_nbhd" -> (Dedup.dedupSortedNeighborhood(_, _)),
    "dedup_semantic" -> (Dedup.dedupSemantic(_, _)),
    // Similarity search (north star)
    "sim_topk" -> (Similarity.simTopk(_, _)),
    "sim_mips" -> (Similarity.simMips(_, _)),
    "sim_range" -> (Similarity.simRange(_, _)),
    "sim_lsh" -> (Similarity.simLsh(_, _)),
    "sim_ivf" -> (Similarity.simIvf(_, _)),
    "sim_recall" -> (Similarity.simRecall(_, _)),
    "embed_outlier" -> (Similarity.embedOutlier(_, _)),
    "embed_norm_audit" -> (Similarity.embedNormAudit(_, _)),
    "embed_pca" -> (Similarity.embedPca(_, _)),
    "embed_class_sep" -> (Similarity.embedClassSep(_, _)),
    "sim_pq" -> (Similarity.simPq(_, _)),
    "sim_ivfpq" -> (Similarity.simIvfPq(_, _)),
    "sim_knn" -> (Similarity.simKnn(_, _)),
    "sim_sparse" -> (Similarity.simSparse(_, _)),
    // sign-bit signatures: popcount ranking over 32x-compressed vectors
    "sim_hamming" -> (Similarity.simHamming(_, _)),
    "sim_bq_rerank" -> (Similarity.simBqRerank(_, _)),
    // MMR diversified rerank: distributed pool, per-probe greedy
    "sim_mmr" -> (Similarity.simMmr(_, _)),
    // int8 scalar quantization: integer-exact ranking over 4x-
    // compressed codes (round 11)
    "sim_sq8" -> (Similarity.simSq8(_, _)),
    // prefix-dim coarse scan + full-dim exact rerank (round 11)
    "sim_matryoshka" -> (Similarity.simMatryoshka(_, _)),
    "retrieval_rrf" -> (Similarity.retrievalRrf(_, _)),
    "retrieval_ndcg" -> (Similarity.retrievalNdcg(_, _)),
    // greedy farthest-point coreset selection over the embeddings
    "sample_kcenter" -> (Similarity.sampleKcenter(_, _)),
    // metadata-filtered top-k: the predicate joins BEFORE ranking
    "sim_filtered" -> (Similarity.simFiltered(_, _)),
    // Pipeline compositions (north star): reproducible split
    // assignment and the quality->dedup->canonicalize prep chain
    "split_assign" -> (PipelineOps.splitAssign(_, _)),
    "sample_stratified" -> (PipelineOps.sampleStratified(_, _)),
    "sample_neyman" -> (PipelineOps.sampleNeyman(_, _)),
    "sample_token_budget" -> (PipelineOps.sampleTokenBudget(_, _)),
    "sample_weighted" -> (PipelineOps.sampleWeighted(_, _)),
    "sample_per_key" -> (PipelineOps.samplePerKey(_, _)),
    "sample_balanced" -> (PipelineOps.sampleBalanced(_, _)),
    "pipeline_shard" -> (PipelineOps.pipelineShard(_, _)),
    "pipeline_survivor" -> (PipelineOps.pipelineSurvivor(_, _)),
    "pipeline_pack" -> (PipelineOps.pipelinePack(_, _)),
    "pipeline_mixture" -> (PipelineOps.pipelineMixture(_, _)),
    // stride-scheduled training order: the mixture's shares as an
    // actual interleave (round 11)
    "pipeline_interleave" -> (PipelineOps.pipelineInterleave(_, _)),
    "pipeline_dsir" -> (PipelineOps.pipelineDsir(_, _)),
    "pipeline_prep" -> (PipelineOps.pipelinePrep(_, _)),
    "pipeline_holdout" -> (PipelineOps.pipelineHoldout(_, _)),
    "pipeline_datacard" -> (PipelineOps.pipelineDatacard(_, _)),
    "pipeline_curriculum" -> (PipelineOps.pipelineCurriculum(_, _)),
    // Multimodal columns (north star; decode step stubbed, SURVEY §7.4)
    "mm_features" -> (Multimodal.mmFeatures(_, _)),
    "mm_frames" -> (Multimodal.mmFrames(_, _)),
    "mm_audio" -> (Multimodal.mmAudio(_, _)),
    "mm_image" -> (Multimodal.mmImage(_, _)),
    "mm_image_meta" -> (Multimodal.mmImageMeta(_, _)),
    "mm_image_phash" -> (Multimodal.mmImagePhash(_, _)),
    "mm_audio_meta" -> (Multimodal.mmAudioMeta(_, _)),
    "mm_video_meta" -> (Multimodal.mmVideoMeta(_, _)),
    "mm_image_jpeg" -> (Multimodal.mmImageJpeg(_, _)),
    "mm_video" -> (Multimodal.mmVideo(_, _)),
    "mm_audio_mp3" -> (Multimodal.mmAudioMp3(_, _)),
    "mm_image_prog" -> (Multimodal.mmImageProg(_, _)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "doc_chunks" -> CoreQueries.docChunksSql,
    "doc_chunks_overlap" -> CoreQueries.docChunksOverlapSql,
    "doc_chunk_stats" -> CoreQueries.docChunkStatsSql,
    "pdf_chunk_stats" -> graft.ops.PdfCorpus.pdfChunkStatsSql,
    "pdf_cjk_stats" -> graft.ops.PdfCorpus.pdfCjkStatsSql,
    "doc_report" -> CoreQueries.docReportSql,
    "sql_chunk_split" -> CoreQueries.sqlChunkSplitSql,
    "chunk_fixed" -> CoreQueries.chunkFixedSql,
    "chunk_multipage" -> CoreQueries.chunkMultipageSql,
    "doc_stats_fixed" -> CoreQueries.docStatsFixedSql,
    "doc_normalize" -> CoreQueries.docNormalizeSql,
    "multi_root" -> CoreQueries.multiRootSql,
    // the oracle reads the ORIGINAL parquet: hash equality proves the
    // write→read roundtrip lossless for each interchange format
    "source_jsonl" -> graft.sources.SourceFormats.sourceRoundtripSql,
    "source_csv" -> graft.sources.SourceFormats.sourceRoundtripSql,
    "source_orc" -> graft.sources.SourceFormats.sourceRoundtripSql,
    "q1_agg" -> Relational.q1AggSql,
    "q3_shipping" -> Relational.q3ShippingSql,
    "q5_local_supplier" -> Relational.q5LocalSupplierSql,
    "q6_forecast" -> Relational.q6ForecastSql,
    "q18_large_orders" -> Relational.q18LargeOrdersSql,
    "q21_waiting_suppliers" -> Relational.q21WaitingSuppliersSql,
    "q22_global_sales" -> Relational.q22GlobalSalesSql,
    "q2_min_cost_supplier" -> TpchMore.q2MinCostSupplierSql,
    "q4_order_priority" -> TpchMore.q4OrderPrioritySql,
    "q7_volume_shipping" -> TpchMore.q7VolumeShippingSql,
    "q11_important_stock" -> TpchMore.q11ImportantStockSql,
    "q16_parts_suppliers" -> TpchMore.q16PartsSuppliersSql,
    "q20_dominant_suppliers" -> TpchMore.q20DominantSuppliersSql,
    "q8_market_share" -> TpchMore.q8MarketShareSql,
    "q9_product_profit" -> TpchMore.q9ProductProfitSql,
    "q10_returned_items" -> TpchMore.q10ReturnedItemsSql,
    "q12_ship_priority" -> TpchMore.q12ShipPrioritySql,
    "q13_customer_dist" -> TpchMore.q13CustomerDistSql,
    "q14_promo_share" -> TpchMore.q14PromoShareSql,
    "q15_top_supplier" -> TpchMore.q15TopSupplierSql,
    "q17_small_quantity" -> TpchMore.q17SmallQuantitySql,
    "q19_discounted" -> TpchMore.q19DiscountedSql,
    "agg_rollup" -> Relational.aggRollupSql,
    "agg_cube" -> Relational.aggCubeSql,
    "agg_distinct" -> Relational.aggDistinctSql,
    "join_broadcast" -> Relational.joinBroadcastSql,
    "join_sortmerge" -> Relational.joinSortMergeSql,
    "join_semi" -> Relational.joinSemiSql,
    "join_anti" -> Relational.joinAntiSql,
    "join_range" -> Relational.joinRangeSql,
    "join_salted" -> Relational.joinSaltedSql,
    // the bloom prune is exact-join-verified ⟹ transparent to the oracle
    "join_bloom" -> Relational.joinBloomSql,
    // Morton interleave is pure integer arithmetic: cells replay exactly
    "layout_zorder" -> Layout.layoutZorderSql,
    // per-level CTE chain generated from the same Hilbert recurrence
    "layout_hilbert" -> Layout.layoutHilbertSql,
    // snapshot history is hash-derived ⟹ the oracle replays it exactly
    "cdc_diff" -> Relational.cdcDiffSql,
    // count-matching reduction == Codd division when pairs ⊆ divisor
    "join_division" -> Relational.joinDivisionSql,
    "dq_checks" -> Relational.dqChecksSql,
    // one-scan column profile; BIGINT/VARCHAR casts render identically
    "dq_profile" -> Relational.dqProfileSql,
    "dq_referential" -> Relational.dqReferentialSql,
    "dq_freshness" -> Relational.dqFreshnessSql,
    "dq_uniqueness" -> Relational.dqUniquenessSql,
    // integer ppm shares and ×mean ratios: no float percentages
    "diag_skew" -> Relational.diagSkewSql,
    // exact DECIMAL cumulative-coverage selection: no interpolation
    "agg_weighted_median" -> Relational.aggWeightedMedianSql,
    // BIGINT cents deltas + ppm floor division over the weekly grain
    "window_growth" -> Relational.windowGrowthSql,
    // the SQL-called UDAF must match the typed path bit-for-bit
    "sql_kmv" -> Relational.aggKmvDistinctSql,
    // merged bottom-k + integer estimate algebra replayed in HUGEINT
    "sketch_setops" -> Relational.sketchSetopsSql,
    // portable double-hash positions; the oracle pins the
    // no-false-negative invariant at exactly 1e6 ppm
    "sketch_bloom" -> TextAnalysis.sketchBloomSql,
    "agg_percentile" -> Relational.aggPercentileSql,
    "agg_variance" -> Relational.aggVarianceSql,
    "agg_moments" -> Relational.aggMomentsSql,
    "agg_pivot" -> Relational.aggPivotSql,
    "agg_unpivot" -> Relational.aggUnpivotSql,
    "agg_mode" -> Relational.aggModeSql,
    "agg_grouping_sets" -> Relational.aggGroupingSetsSql,
    "agg_kmv_distinct" -> Relational.aggKmvDistinctSql,
    "agg_hll" -> Relational.aggHllSql,
    // bounded_check: the oracle pins the exact counts and demands the
    // within_band flag (|HLL++ est − exact| ≤ 2% · exact) be true for
    // every group — see Relational.aggApproxDistinct
    "agg_approx_distinct" -> Relational.aggApproxDistinctSql,
    "agg_cms_freq" -> Relational.aggCmsFreqSql,
    // integer bin counts + deterministic edge arithmetic: the
    // histogram sketch replays exactly, unlike approx_percentile
    "agg_histogram_quantile" -> Relational.aggHistogramQuantileSql,
    "event_funnel" -> Relational.eventFunnelSql,
    "event_sequences" -> Relational.eventSequencesSql,
    "event_retention" -> Relational.eventRetentionSql,
    // BIGINT-exact z² inequality: no float stddev to drift between engines
    "event_anomaly" -> Relational.eventAnomalySql,
    "window_islands" -> Relational.windowIslandsSql,
    // (ts_ns, event_id)-pinned successor order; ppm floor divisions
    "event_markov" -> Relational.eventMarkovSql,
    // calendar-scale resample: zero-fill + LOCF replay identically
    "ts_gapfill" -> TimeSeries.tsGapfillSql,
    // (ts_ns, event_id)-pinned run collapse -> versioned intervals
    "scd2_build" -> TimeSeries.scd2BuildSql,
    // PIT probe: user equi-join + interval residual, never cartesian
    "scd2_lookup" -> TimeSeries.scd2LookupSql,
    // BIGINT floor interpolation; both engines truncate toward zero
    "ts_interp" -> TimeSeries.tsInterpSql,
    // cummax islands over ranges; explicit floor() for the one
    // double->long cast-semantics divergence between the engines
    "interval_merge" -> TimeSeries.intervalMergeSql,
    "cdc_apply" -> TimeSeries.cdcApplySql,
    "agg_decay" -> TimeSeries.aggDecaySql,
    // -1-preceding frame picks the touch; DECIMAL cents revenue
    "event_attribution" -> Relational.eventAttributionSql,
    // BIGINT inputs scored against exact shared-rule quantile bounds
    "event_rfm" -> Relational.eventRfmSql,
    // integer moment sums + one IEEE division: REGR_* without the
    // engines' incremental-float drift
    "agg_regression" -> Relational.aggRegressionSql,
    "graph_pagerank" -> Graph.graphPagerankSql,
    "graph_triangles" -> Graph.graphTrianglesSql,
    // one IEEE division of integer counts: bit-deterministic ranking
    "graph_jaccard" -> Graph.graphJaccardSql,
    "graph_bfs" -> Graph.graphBfsSql,
    // the shared min-label CC kernel == the transitive-closure CTE
    "graph_components" -> Graph.graphComponentsSql,
    // the peel loop unrolled as chained CTEs; rounds past the
    // fixpoint are no-ops, Spark REQUIREs convergence inside the bound
    "graph_kcore" -> Graph.graphKcoreSql,
    // edge-level peel: same unrolled-fixpoint contract, triangle
    // support recomputed per round
    "graph_ktruss" -> Graph.graphKtrussSql,
    // symmetric marginals kill the sqrt: exact integer Pearson ppm
    "graph_assortativity" -> Graph.graphAssortativitySql,
    // 3·triangles over Σ deg(deg−1)/2 wedges: two integer counts
    "graph_clustcoeff" -> Graph.graphClustcoeffSql,
    "graph_motifs" -> Graph.graphMotifsSql,
    "graph_hits" -> Graph.graphHitsSql,
    "graph_walks" -> Graph.graphWalksSql,
    "scalar_subquery" -> Relational.scalarSubquerySql,
    "agg_typed_ratio" -> TextAnalysis.aggTypedRatioSql,
    "array_ops" -> TextAnalysis.arrayOpsSql,
    "window_lag" -> Relational.windowLagSql,
    "window_topk" -> Relational.windowTopkSql,
    "topk_custom" -> Relational.topkCustomSql,
    "window_running" -> Relational.windowRunningSql,
    "window_rank_family" -> Relational.windowRankFamilySql,
    "window_range_frame" -> Relational.windowRangeFrameSql,
    "set_ops" -> Relational.setOpsSql,
    "set_ops_all" -> Relational.setOpsAllSql,
    "json_extract" -> Relational.jsonExtractSql,
    "json_struct" -> Relational.jsonStructSql,
    "date_trunc" -> Relational.dateTruncSql,
    "date_arith" -> Relational.dateArithSql,
    "asof_join" -> Relational.asofJoinSql,
    "asof_tolerance" -> Relational.asofToleranceSql,
    "sessionize" -> Relational.sessionizeSql,
    "event_tumbling" -> Relational.eventTumblingSql,
    "event_hopping" -> Relational.eventHoppingSql,
    // converged streaming results == the batch twins' relations
    "stream_tumbling" -> Relational.eventTumblingSql,
    "stream_topk" -> graft.streaming.EventStreams.streamTopkSql,
    "stream_kmv_distinct" -> graft.streaming.EventStreams.streamKmvDistinctSql,
    "stream_hopping" -> Relational.eventHoppingSql,
    "stream_sessionize" -> Relational.sessionizeSql,
    // unique ids ⟹ batching-independent appended rows == the batch projection
    "stream_dedup" -> graft.streaming.EventStreams.streamDedupSql,
    "text_quality" -> TextAnalysis.textQualitySql,
    "text_langid" -> TextAnalysis.textLangidSql,
    "text_langid_eval" -> TextAnalysis.textLangidEvalSql,
    "text_simpson" -> TextAnalysis.textSimpsonSql,
    "text_hapax" -> TextAnalysis.textHapaxSql,
    "text_jsd" -> TextAnalysis.textJsdSql,
    "text_tokens" -> TextAnalysis.textTokensSql,
    "text_fingerprint" -> TextAnalysis.textFingerprintSql,
    "text_edit_distance" -> TextAnalysis.textEditDistanceSql,
    "text_tfidf" -> TextAnalysis.textTfidfSql,
    "text_pii_scrub" -> TextAnalysis.textPiiScrubSql,
    "text_bm25" -> TextAnalysis.textBm25Sql,
    "text_bm25_multi" -> TextAnalysis.textBm25MultiSql,
    "stream_enrich" -> graft.streaming.EventStreams.streamEnrichSql,
    // inner stream-stream join pairs are batching-independent under
    // the single-batch staged replay == the batch interval join
    "stream_join" -> graft.streaming.EventStreams.streamJoinSql,
    // converged streaming daily state + batch z² finisher == the
    // batch twin's relation
    "stream_anomaly" -> Relational.eventAnomalySql,
    // (ts_ns, event_id)-pinned min/max(struct) state converges to the
    // batch bar relation
    "stream_ohlc" -> TimeSeries.tsOhlcSql,
    // flatMapGroupsWithState sessionization: closed sessions emit on
    // gap proof, the final open session on event-time TIMEOUT (flush
    // sentinel advances the watermark) == batch gap-sessionization
    "stream_session_stats" -> graft.streaming.EventStreams.streamSessionStatsSql,
    "text_repetition" -> TextAnalysis.textRepetitionSql,
    "text_vocab" -> TextAnalysis.textVocabSql,
    "quality_normalize" -> TextAnalysis.qualityNormalizeSql,
    "quality_logreg" -> TextAnalysis.qualityLogregSql,
    // first-failing-rule attribution over the registered signals'
    // own relations; 6dp-rounded doubles make branches bit-identical
    "quality_cascade" -> TextAnalysis.qualityCascadeSql,
    // the published Gopher rule set, each rule an integer column
    "quality_gopher" -> TextAnalysis.qualityGopherSql,
    // order-pinned folds + the BM25 ln/round discipline: the trained
    // bigram LM and its scores replay exactly
    "text_lm_score" -> TextAnalysis.textLmScoreSql,
    // p·ln p from identical integer counts, order-pinned fold
    "text_entropy" -> TextAnalysis.textEntropySql,
    // BIGINT rank-weighted sums, tie-insensitive; one output division
    "text_gini" -> TextAnalysis.textGiniSql,
    // one double ratio through one 6dp-rounded ln; (w1,w2) tie-breaks
    "text_pmi" -> TextAnalysis.textPmiSql,
    // graph_pagerank's fixed-point rounds applied to word adjacency
    "text_rank" -> TextAnalysis.textRankSql,
    "text_rake" -> TextAnalysis.textRakeSql,
    // one encoded integer key carries min hash + rightmost tie: the
    // window-min winnowing selection replays as a plain min-fold
    "text_winnow" -> TextAnalysis.textWinnowSql,
    "text_cdc" -> TextAnalysis.textCdcSql,
    "text_zipf" -> TextAnalysis.textZipfSql,
    // all-integer counts + ppm/milli floor divisions: zero floats
    "text_readability" -> TextAnalysis.textReadabilitySql,
    // sqrt-free integer variance-to-mean; zero-docs folded closed-form
    "text_burstiness" -> TextAnalysis.textBurstinessSql,
    // integral pair counts, (cnt, left, right)-pinned argmax, one
    // shared greedy fold: all 8 BPE merges replay as generated CTEs
    "text_bpe" -> TextAnalysis.textBpeSql,
    // the encode replays train + apply end-to-end: same fold, same
    // merge table, integer compression ratio
    "text_bpe_encode" -> TextAnalysis.textBpeEncodeSql,
    // the encode pass regrouped by language: same train + fold CTEs,
    // integer ppm fertility ratios
    "text_fertility" -> TextAnalysis.textFertilitySql,
    // greedy word-atomic token packing: one packed-BIGINT fold
    // (nc*2^42 + mx*2^21 + cur) identical in both engines
    "chunk_token_budget" -> TextAnalysis.chunkTokenBudgetSql,
    // one QI hash agg; flag is a projection over integral counts
    "privacy_kanon" -> Privacy.privacyKanonSql,
    // class-size bands over the same QI agg; integer ppm shares and
    // 1e6/min-k prosecutor risk, one-row total broadcast
    "privacy_risk" -> Privacy.privacyRiskSql,
    // two chained hash aggs; ppm shares and the distinct-l flag are
    // projections over integral counts
    "privacy_ldiv" -> Privacy.privacyLdivSql,
    // exact integer TVD (closed-form absent-source term): no
    // class × domain cross join, everything class-cardinality
    "privacy_tclose" -> Privacy.privacyTcloseSql,
    // two one-shot lns over identical integer ratios, 6dp-rounded
    // before ranking, term tie-break
    "text_logodds" -> TextAnalysis.textLogoddsSql,
    // integer zone bounds + exact fused match counts: pruning
    // arithmetic has no float to drift
    "layout_zonemap" -> Layout.layoutZonemapSql,
    // layout-independent result: a plain join+agg oracles the bucketed plan
    "layout_bucket" -> Layout.layoutBucketSql,
    // layout-independent result oracles the pruned partitioned scan
    "layout_partition" -> Layout.layoutPartitionSql,
    // seed-gram islands per diagonal = suffix-array maximal spans
    "dedup_substring" -> Dedup.dedupSubstringSql,
    // α=1/2 smoothing is add + floor-halve on cents: the sequential
    // fold replays exactly as a recursive CTE
    "ts_ewma" -> TimeSeries.tsEwmaSql,
    // n-scaled integer CUSUM over BIGINT cents; argmax tie pinned on
    // (ts_ns, event_id) inside a max(struct) key
    "ts_changepoint" -> TimeSeries.tsChangepointSql,
    // two-state integer fold (adds + truncating halves on cents);
    // recursive-CTE replay keeps each key's last row
    "ts_holt" -> TimeSeries.tsHoltSql,
    "ts_holtwinters" -> TimeSeries.tsHoltWintersSql,
    "ts_theilsen" -> TimeSeries.tsTheilSenSql,
    // open/close pinned on (ts_ns, event_id) inside min/max(struct)
    "ts_ohlc" -> TimeSeries.tsOhlcSql,
    // one cross-multiplied BIGINT division; dow = (day_idx + 3) % 7
    "ts_seasonal" -> TimeSeries.tsSeasonalSql,
    // ±1 endpoint sweep: integer running sums, ties (t, k, user)-pinned
    "interval_sweep" -> TimeSeries.intervalSweepSql,
    "interval_allen" -> TimeSeries.intervalAllenSql,
    // discrete lower medians picked by row position: BIGINT-exact
    "ts_mad" -> TimeSeries.tsMadSql,
    // n-scaled integer deviations over floor-dollars; one ppm division
    "ts_acf" -> TimeSeries.tsAcfSql,
    // the two-series extension: argmax-|ccf| lag per pair, ties
    // pinned inside a max(struct) key == the QUALIFY ordering
    "ts_crosscorr" -> TimeSeries.tsCrosscorrSql,
    // Cutler RSI: rolling integer gain/loss sums, neutral-500000 pin
    "ts_rsi" -> TimeSeries.tsRsiSql,
    // lag-window idle spans; argmax pinned (gap DESC, day ASC)
    "interval_gaps" -> TimeSeries.intervalGapsSql,
    // per-row set ops in codegen: distinct/hapax counts, ppm ratio
    "text_ttr" -> TextAnalysis.textTtrSql,
    // corpus bigram model: per-bigram floor-div ppm, per-doc mean
    "text_predictability" -> TextAnalysis.textPredictabilitySql,
    // integer log2 buckets via length(bin(deg)) on both engines
    "graph_degree_dist" -> Graph.graphDegreeDistSql,
    // 4 unrolled sync LP rounds; mode ties -> smallest label
    "graph_community" -> Graph.graphCommunitySql,
    // wedge endpoints distinct, anti-join strips 1-hop, exact counts
    "graph_foaf" -> Graph.graphFoafSql,
    // per-(user,type) lag gaps into integer log2 buckets
    "event_lag_dist" -> Relational.eventLagDistSql,
    // hash-seeded discrete Laplace (alpha=1/2): exact inverse CDF
    "privacy_dp_hist" -> Privacy.privacyDpHistSql,
    // discrete type-1 quartiles at price-domain scale; integer fences
    "dq_iqr" -> Relational.dqIqrSql,
    // round 14: integer micro reciprocal of the first exact-top-k hit
    "retrieval_mrr" -> Similarity.retrievalMrrSql,
    // clamped noisy-sum/noisy-count mean, two hash-seeded eps=ln2 draws
    "privacy_dp_mean" -> Privacy.privacyDpMeanSql,
    "privacy_dp_topk" -> Privacy.privacyDpTopkSql,
    "privacy_dp_quantile" -> Privacy.privacyDpQuantileSql,
    "privacy_generalize" -> Privacy.privacyGeneralizeSql,
    // day-grain integer moments in DECIMAL(38)/HUGEINT; r^2 ppm + sign
    "agg_corr" -> Relational.aggCorrSql,
    // ANSI ntile(4), custkey tie pin, per-bucket cents rollup
    "window_ntile" -> Relational.windowNtileSql,
    // two leads per user, |types|^3 hash agg, 1-row share denominator
    "event_paths" -> Relational.eventPathsSql,
    // distinct (day,user) pairs; 7-day trailing join vs broadcast grid
    "event_stickiness" -> Relational.eventStickinessSql,
    "event_stickiness_kmv" -> Relational.eventStickinessKmvSql,
    "event_cohort_ltv" -> Relational.eventCohortLtvSql,
    "event_churn" -> Relational.eventChurnSql,
    "event_pareto" -> Relational.eventParetoSql,
    "event_overlap" -> Relational.eventOverlapSql,
    // first-seen split: new vs returning users per day, ppm share
    "event_new_users" -> Relational.eventNewUsersSql,
    // discrete type-1 p05/p95 picks; clamped + raw BIGINT means
    "ts_winsorize" -> TimeSeries.tsWinsorizeSql,
    "ts_bollinger" -> TimeSeries.tsBollingerSql,
    // count-domain rank-sum Gini, closed-form block rank mass
    "event_gini" -> Relational.eventGiniSql,
    "agg_theil" -> Relational.aggTheilSql,
    // sum-of-squared-shares in ppm, one exact outer integral divide
    "agg_hhi" -> Relational.aggHhiSql,
    // cum/running-peak windows at day grain; earliest-trough tie pin
    "ts_drawdown" -> TimeSeries.tsDrawdownSql,
    // funnel-composed deltas; count-domain discrete median
    "event_funnel_time" -> Relational.eventFunnelTimeSql,
    // native Spark 4 XML source; xor-fingerprint lossless proof
    "source_xml" -> graft.sources.SourceFormats.sourceRoundtripSql,
    "source_xml_attrs" -> graft.sources.SourceFormats.sourceRoundtripSql,
    // polyHash order keys; endpoint picks via min/max(struct(h, doc))
    "pipeline_epoch_order" -> PipelineOps.pipelineEpochOrderSql,
    // string-extracted first digit vs pinned log10 ppm literals
    "dq_benford" -> Relational.dqBenfordSql,
    // cross-multiplied DECIMAL(38) z² inequality: no float proportion
    "event_abtest" -> Relational.eventAbtestSql,
    // Laplace-smoothed bins; order-pinned fold; identical term exprs
    "dq_psi" -> TextAnalysis.dqPsiSql,
    "dedup_exact" -> Dedup.dedupExactSql,
    "dedup_minhash" -> Dedup.dedupMinhashSql,
    // exact postings-join Jaccard computes the same relation the
    // brute-force minhash oracle does
    "dedup_ngram" -> Dedup.dedupMinhashSql,
    // SSJoin containment prefix filter (probe prefix vs FULL index)
    // == the brute-force directed containment relation
    "dedup_containment" -> Dedup.dedupContainmentSql,
    // df=1 share per doc, served from the postings index
    "text_novelty" -> Dedup.textNoveltySql,
    "dedup_embedding" -> Dedup.dedupEmbeddingSql,
    // the banded-LSH candidates -> exact-verify composition computes
    // the same relation as the all-pairs contract (deterministic
    // planes: exact recall on the gate corpora)
    "dedup_embedding_ann" -> Dedup.dedupEmbeddingSql,
    // production-threshold (0.8) variant: pruning-sized banding whose
    // deterministic planes find every qualifying gate-corpus pair
    "dedup_embedding_ann_hi" -> Dedup.dedupEmbeddingAnnHiSql,
    "dedup_simhash" -> Dedup.dedupSimhashSql,
    // iterative min-label propagation == the recursive-CTE components
    "dedup_cluster" -> Dedup.dedupClusterSql,
    "dedup_contamination" -> Dedup.dedupContaminationSql,
    "dedup_spans" -> Dedup.dedupSpansSql,
    "dedup_lines" -> Dedup.dedupLinesSql,
    // batch-vs-corpus banding finds the same pairs the brute-force
    // cross-split Jaccard oracle computes
    "dedup_incremental" -> Dedup.dedupIncrementalSql,
    // deletion-neighborhood candidates ⊇ all lev≤1 pairs (SymSpell
    // completeness), exact verify == the brute-force oracle
    "dedup_editdist" -> Dedup.dedupEditDistanceSql,
    // every MinHash min replayed bit-for-bit in HUGEINT; integer ppm
    "corpus_overlap" -> Dedup.corpusOverlapSql,
    // window-bounded candidates replayed by rank-distance in SQL
    "dedup_sorted_nbhd" -> Dedup.dedupSortedNeighborhoodSql,
    "dedup_semantic" -> Dedup.dedupSemanticSql,
    "sim_topk" -> Similarity.simTopkSql,
    "sim_mips" -> Similarity.simMipsSql,
    // 6dp rounding BEFORE the threshold: ball membership can't flip
    "sim_range" -> Similarity.simRangeSql,
    // deterministic hash-derived planes make the ANN query exact-reproducible
    "sim_lsh" -> Similarity.simLshSql,
    // fixed-point Lloyd sums + strided seeds make the whole IVF train
    // + probe + top-k replayable in DuckDB (three unrolled iterations)
    "sim_ivf" -> Similarity.simIvfSql,
    // the recall/cost trade curve per probe width, one shared model
    // replay + the exact baseline joined relationally
    "sim_recall" -> Similarity.simRecallSql,
    // rank-only fusion: integer RRF over two 6dp-rounded rankings
    "retrieval_rrf" -> Similarity.retrievalRrfSql,
    // literal micro-discounts (no runtime log2); shared IVF chain
    "retrieval_ndcg" -> Similarity.retrievalNdcgSql,
    // greedy argmax over 2^20 fixed-point L2: the unrolled CTE rounds
    // replay the selection order bit-for-bit
    "sample_kcenter" -> Similarity.sampleKcenterSql,
    // pre-filter equi-join + the shared 6dp cosine: exact within the
    // filtered set
    "sim_filtered" -> Similarity.simFilteredSql,
    // integer fixed-point centroid + distances: bit-exact replay
    "embed_outlier" -> Similarity.embedOutlierSql,
    "embed_norm_audit" -> Similarity.embedNormAuditSql,
    // integer Gram matrix + unrolled ordered-fold power iteration
    "embed_pca" -> Similarity.embedPcaSql,
    // fixed-point centroids/distances + (dist, label)-pinned argmin:
    // the separation audit replays bit-for-bit
    "embed_class_sep" -> Similarity.embedClassSepSql,
    // per-subspace fixed-point Lloyd + m-ordered ADC folds: the PQ
    // train/encode/rank replays exactly like sim_ivf
    "sim_pq" -> Similarity.simPqSql,
    // the two proven replay chains composed by one candidate CTE
    "sim_ivfpq" -> Similarity.simIvfPqSql,
    // cell-local bounded top-k merges exactly: 6-dp rounding before
    // selection keeps the tie order portable
    "sim_knn" -> Similarity.simKnnSql,
    // BIGINT dots/norms; one division through two sqrts, 6dp-rounded
    "sim_sparse" -> Similarity.simSparseSql,
    // integer Hamming distances: sign-mismatch count replays the
    // packed popcount definitionally, zero FP anywhere
    "sim_hamming" -> Similarity.simHammingSql,
    "sim_bq_rerank" -> Similarity.simBqRerankSql,
    // the greedy unrolled as chained CTEs; scores are IEEE doubles
    // from shared 6dp-rounded rel/sim inputs -> bit-identical argmax
    "sim_mmr" -> Similarity.simMmrSql,
    // post-quantization ranking is all-integer; the shared affine
    // model is the identical double expression on both engines
    "sim_sq8" -> Similarity.simSq8Sql,
    "sim_matryoshka" -> Similarity.simMatryoshkaSql,
    "split_assign" -> PipelineOps.splitAssignSql,
    "sample_stratified" -> PipelineOps.sampleStratifiedSql,
    "sample_neyman" -> PipelineOps.sampleNeymanSql,
    "sample_token_budget" -> PipelineOps.sampleTokenBudgetSql,
    "sample_weighted" -> PipelineOps.sampleWeightedSql,
    // portable-hash ranks drawn by the TopKPerKey bounded heap
    "sample_per_key" -> PipelineOps.samplePerKeySql,
    // k = min class size (one-row statistic broadcast); same portable
    // hash rank
    "sample_balanced" -> PipelineOps.sampleBalancedSql,
    "pipeline_shard" -> PipelineOps.pipelineShardSql,
    "pipeline_interleave" -> PipelineOps.pipelineInterleaveSql,
    "pipeline_dsir" -> PipelineOps.pipelineDsirSql,
    // argmax-quality survivor per near-dup family on packed BIGINT
    // keys; cluster + logreg oracles ride as subqueries
    "pipeline_survivor" -> PipelineOps.pipelineSurvivorSql,
    // BIGINT prefix-sum placement: seq ids/offsets replay exactly
    "pipeline_pack" -> PipelineOps.pipelinePackSql,
    "pipeline_mixture" -> PipelineOps.pipelineMixtureSql,
    "pipeline_prep" -> PipelineOps.pipelinePrepSql,
    // family-canonical hash: near-dups can never straddle splits
    "pipeline_holdout" -> PipelineOps.pipelineHoldoutSql,
    // every card column reuses its operator's own code path
    "pipeline_datacard" -> PipelineOps.pipelineDatacardSql,
    "pipeline_curriculum" -> PipelineOps.pipelineCurriculumSql,
    "mm_features" -> Multimodal.mmFeaturesSql,
    "mm_frames" -> Multimodal.mmFramesSql,
    // oracle recomputes from row attributes: equality proves the
    // WAV encode→RIFF-walk→decode loop exact per asset
    "mm_audio" -> Multimodal.mmAudioSql,
    "mm_image" -> Multimodal.mmImageSql,
    "mm_image_meta" -> Multimodal.mmImageMetaSql,
    "mm_image_phash" -> Multimodal.mmImagePhashSql,
    "mm_audio_meta" -> Multimodal.mmAudioMetaSql,
    "mm_video_meta" -> Multimodal.mmVideoMetaSql,
    "mm_image_jpeg" -> Multimodal.mmImageJpegSql,
    "mm_video" -> Multimodal.mmVideoSql,
    "mm_audio_mp3" -> Multimodal.mmAudioMp3Sql,
    "mm_image_prog" -> Multimodal.mmImageProgSql,
  )
}
