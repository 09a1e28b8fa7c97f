package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.report.{Incremental, Report, Windows}
import graft.parse.{Style5, WebLog}
import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator family from SURVEY.md §2 (plus the training-data
  * pipeline extensions) is exposed as a named query over the driver
  * test tables, with a DuckDB-equivalent oracle where the semantics
  * are ANSI-expressible. Column names are aliased identically on both
  * sides and every query carries a total ORDER BY (SURVEY.md §7.5.6).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Report.reportMetrics(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- report family (pull_report.pl parity: J1-J4, A1-A4, F3-F7) --
    "report_metrics"        -> (Report.reportMetrics _),
    "report_chain"          -> (Report.reportChain _),
    "q1_pricing_summary"    -> (Report.q1PricingSummary _),
    "q3_shipping"           -> (graft.report.Tpch.q3Shipping _),
    "q4_order_priority"     -> (graft.report.Tpch.q4OrderPriority _),
    "cube_revenue"          -> (graft.report.Tpch.cubeRevenue _),
    "pivot_events"          -> (graft.report.Tpch.pivotEvents _),
    "q5_local_supplier"     -> (graft.report.Tpch.q5LocalSupplier _),
    "q6_forecast"           -> (graft.report.Tpch.q6Forecast _),
    "topk_assets"           -> (Report.topkAssets _),
    "watermark_incremental" -> (Report.watermarkIncremental _),
    "incremental_antijoin"  -> (Incremental.incrementalAntijoin _),
    "dedup_boundary"        -> (Incremental.dedupBoundary _),
    "salted_agg"            -> (Incremental.saltedAgg _),
    "asof_join_rates"       -> (graft.report.AsOf.asofJoinRates _),
    "format_time"           -> (Report.formatTimeQuery _),
    "customer_report"       -> (Report.customerReport _),
    "name_match"            -> (Report.nameMatch _),
    "dedup_embedding"       -> (graft.ext.Similarity.dedupEmbedding _),
    // -- parse family (real_parse.pl / web_parse.pl parity: P1-P17, F2, F10) --
    "render_style5"         -> (Style5.renderQuery _),
    "parse_access"          -> (Style5.parseAccess _),
    "parse_file"            -> (Style5.parseFile _),
    "parse_client"          -> (Style5.parseClient _),
    "parse_stats"           -> (Style5.parseStats _),
    "parse_fastpath"        -> (Style5.parseFastpath _),
    "parse_rejects"         -> (Style5.parseRejects _),
    "parse_weblog"          -> (WebLog.parseWeb _),
    "media_formats"         -> (WebLog.mediaFormats _),
    "star_etl_summary"      -> (graft.etl.StarEtl.starSummary _),
    // -- window / session / set-op / JSON extensions (SURVEY §2.6-2.7) --
    "session_rank"          -> (Windows.sessionRank _),
    "sessionize"            -> (Windows.sessionize _),
    "hourly_window_agg"     -> (Windows.hourlyWindowAgg _),
    "sliding_window_agg"    -> (Windows.slidingWindowAgg _),
    "customer_order_counts" -> (Windows.customerOrderCounts _),
    "session_window_agg"    -> (Windows.sessionWindowAgg _),
    "union_rotated"         -> (Windows.unionRotated _),
    "user_churn"            -> (Windows.userChurn _),
    "json_props"            -> (Windows.jsonProps _),
    "rollup_revenue"        -> (Windows.rollupRevenue _),
    // -- training-data pipeline extensions (north-star ops) --
    "text_stats"            -> (TextAnalysis.textStats _),
    "lang_id"               -> (TextAnalysis.langId _),
    "token_count"           -> (TextAnalysis.tokenCount _),
    "doc_fingerprint"       -> (TextAnalysis.docFingerprint _),
    "pii_redact"            -> (TextAnalysis.piiRedact _),
    "dedup_exact"           -> (Dedup.dedupExact _),
    "minhash_signatures"    -> (Dedup.minhashSignatures _),
    "dedup_minhash_lsh"     -> (Dedup.dedupMinhashLsh _),
    "simhash"               -> (Dedup.simhash _),
    "simhash_pairs"         -> (Dedup.simhashPairs _),
    "ngram_jaccard"         -> (Dedup.ngramJaccard _),
    "knn_bruteforce"        -> (Similarity.knnBruteforce _),
    "knn_lsh"               -> (Similarity.knnLsh _),
    "knn_ivf"               -> (Similarity.knnIvf _),
    "dedup_groups"          -> (Dedup.dedupGroups _),
    "training_corpus"       -> (graft.ext.Corpus.trainingCorpus _),
    "sample_stratified"     -> (graft.ext.Corpus.sampleStratified _),
    "vocab_topk"            -> (graft.ext.Corpus.vocabTopk _),
    "bigram_lm_score"       -> (graft.ext.Corpus.bigramLmScore _),
    "dedup_incremental"     -> (Dedup.dedupIncremental _),
    "chunk_documents"       -> (graft.ext.Corpus.chunkDocuments _),
    "pack_sequences"        -> (graft.ext.Corpus.packSequences _),
    "decontaminate"         -> (graft.ext.Corpus.decontaminate _),
    "media_features"        -> (Multimodal.mediaFeatures _),
    "repetition_stats"      -> (graft.ext.Quality.repetitionStats _),
    "source_overlap"        -> (graft.ext.Quality.sourceOverlap _),
    "bm25_topk"             -> (graft.ext.Retrieval.bm25Topk _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "report_metrics"        -> Report.reportMetricsSql,
    "report_chain"          -> Report.reportChainSql,
    "q1_pricing_summary"    -> Report.q1PricingSummarySql,
    "q3_shipping"           -> graft.report.Tpch.q3ShippingSql,
    "q4_order_priority"     -> graft.report.Tpch.q4OrderPrioritySql,
    "cube_revenue"          -> graft.report.Tpch.cubeRevenueSql,
    "pivot_events"          -> graft.report.Tpch.pivotEventsSql,
    "q5_local_supplier"     -> graft.report.Tpch.q5LocalSupplierSql,
    "q6_forecast"           -> graft.report.Tpch.q6ForecastSql,
    "topk_assets"           -> Report.topkAssetsSql,
    "watermark_incremental" -> Report.watermarkIncrementalSql,
    "incremental_antijoin"  -> Incremental.incrementalAntijoinSql,
    "dedup_boundary"        -> Incremental.dedupBoundarySql,
    "salted_agg"            -> Incremental.saltedAggSql,
    "asof_join_rates"       -> graft.report.AsOf.asofJoinRatesSql,
    "format_time"           -> Report.formatTimeSql,
    "customer_report"       -> Report.customerReportSql,
    "name_match"            -> Report.nameMatchSql,
    "dedup_embedding"       -> graft.ext.Similarity.dedupEmbeddingSql,
    "render_style5"         -> Style5.renderSql,
    "parse_access"          -> Style5.parseAccessSql,
    "parse_file"            -> Style5.parseFileSql,
    "parse_client"          -> Style5.parseClientSql,
    "parse_stats"           -> Style5.parseStatsSql,
    "parse_fastpath"        -> Style5.parseFastpathSql,
    "parse_rejects"         -> Style5.parseRejectsSql,
    "parse_weblog"          -> WebLog.parseWebSql,
    "media_formats"         -> WebLog.mediaFormatsSql,
    "star_etl_summary"      -> graft.etl.StarEtl.starSummarySql,
    "session_rank"          -> Windows.sessionRankSql,
    "sessionize"            -> Windows.sessionizeSql,
    "hourly_window_agg"     -> Windows.hourlyWindowAggSql,
    "sliding_window_agg"    -> Windows.slidingWindowAggSql,
    "customer_order_counts" -> Windows.customerOrderCountsSql,
    "session_window_agg"    -> Windows.sessionWindowAggSql,
    "union_rotated"         -> Windows.unionRotatedSql,
    "user_churn"            -> Windows.userChurnSql,
    "json_props"            -> Windows.jsonPropsSql,
    "rollup_revenue"        -> Windows.rollupRevenueSql,
    "text_stats"            -> TextAnalysis.textStatsSql,
    "lang_id"               -> TextAnalysis.langIdSql,
    "token_count"           -> TextAnalysis.tokenCountSql,
    "doc_fingerprint"       -> TextAnalysis.docFingerprintSql,
    "pii_redact"            -> TextAnalysis.piiRedactSql,
    "dedup_exact"           -> Dedup.dedupExactSql,
    "minhash_signatures"    -> Dedup.minhashSignaturesSql,
    "dedup_minhash_lsh"     -> Dedup.dedupMinhashLshSql,
    "simhash"               -> Dedup.simhashSql,
    "simhash_pairs"         -> Dedup.simhashPairsSql,
    "ngram_jaccard"         -> Dedup.ngramJaccardSql,
    "knn_bruteforce"        -> Similarity.knnBruteforceSql,
    "knn_lsh"               -> Similarity.knnLshSql,
    "knn_ivf"               -> Similarity.knnIvfSql,
    "dedup_groups"          -> Dedup.dedupGroupsSql,
    "training_corpus"       -> graft.ext.Corpus.trainingCorpusSql,
    "sample_stratified"     -> graft.ext.Corpus.sampleStratifiedSql,
    "vocab_topk"            -> graft.ext.Corpus.vocabTopkSql,
    "bigram_lm_score"       -> graft.ext.Corpus.bigramLmScoreSql,
    "dedup_incremental"     -> Dedup.dedupIncrementalSql,
    "chunk_documents"       -> graft.ext.Corpus.chunkDocumentsSql,
    "pack_sequences"        -> graft.ext.Corpus.packSequencesSql,
    "decontaminate"         -> graft.ext.Corpus.decontaminateSql,
    "media_features"        -> Multimodal.mediaFeaturesSql,
    "repetition_stats"      -> graft.ext.Quality.repetitionStatsSql,
    "source_overlap"        -> graft.ext.Quality.sourceOverlapSql,
    "bm25_topk"             -> graft.ext.Retrieval.bm25TopkSql,
  )
}
