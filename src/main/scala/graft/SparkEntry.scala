package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 (coverage checklist)
  * and §7 (build plan). Every entry in [[queries]] has an ANSI-SQL
  * oracle in [[oracleSql]] that DuckDB runs on the same parquet tables;
  * column names/arithmetic are mirrored exactly (SURVEY.md §6).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks
    * rows>0): the reference's signature flow — encode the corpus as
    * hashing-TF vectors and retrieve cosine top-k via an inverted-index
    * join (SURVEY.md §2, pipeline_hashing_search). */
  def entry(spark: SparkSession): DataFrame =
    Encoders.hashingSearch(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Relational/analytics surface
    "q1_agg" -> ((s, d) => Relational.q1Agg(s, d)),
    "q3_join_agg" -> ((s, d) => Relational.q3JoinAgg(s, d)),
    "q_window_topn" -> ((s, d) => Relational.windowTopN(s, d)),
    "q_distinct_count" -> ((s, d) => Relational.distinctCounts(s, d)),
    "q_latest_by_key" -> ((s, d) => Relational.latestByKey(s, d)),
    "q_asof_join" -> ((s, d) => Relational.asofJoin(s, d)),
    "q_range_join" -> ((s, d) => Relational.rangeJoin(s, d)),
    "q_semi_anti_join" -> ((s, d) => Relational.semiAntiJoin(s, d)),
    "pivot_daily" -> ((s, d) => Relational.pivotDaily(s, d)),
    // Vector core
    "v_dot_product" -> ((s, d) => VectorCore.dotProduct(s, d)),
    "v_cosine_similarity" -> ((s, d) => VectorCore.cosineSim(s, d)),
    "v_l2_norm" -> ((s, d) => VectorCore.l2NormQ(s, d)),
    "v_l2_normalize" -> ((s, d) => VectorCore.l2NormalizeQ(s, d)),
    "v_euclidean_dist" -> ((s, d) => VectorCore.euclidDist(s, d)),
    // Search
    "knn_bruteforce" -> ((s, d) => Knn.bruteForce(s, d)),
    "knn_cosine_topk" -> ((s, d) => Knn.cosineTopK(s, d)),
    "knn_metadata_filter" -> ((s, d) => Knn.metadataFilter(s, d)),
    "knn_range_search" -> ((s, d) => Knn.rangeSearch(s, d)),
    "ann_lsh_hyperplane" -> ((s, d) => Ann.lshHyperplane(s, d)),
    "ann_ivf" -> ((s, d) => Ann.ivf(s, d)),
    "ann_pq_encode" -> ((s, d) => Ann.pqEncode(s, d)),
    "ann_pq_search" -> ((s, d) => Ann.pqSearch(s, d)),
    "ann_lsh_filtered" -> ((s, d) => Ann.lshFiltered(s, d)),
    "ann_ivf_filtered" -> ((s, d) => Ann.ivfFiltered(s, d)),
    "ann_ivf_pq" -> ((s, d) => Ann.ivfPq(s, d)),
    // Retrieval evaluation
    "eval_precision_at_k" -> ((s, d) => Eval.precisionAtK(s, d)),
    "eval_recall_at_k" -> ((s, d) => Eval.recallAtK(s, d)),
    "eval_map" -> ((s, d) => Eval.meanAveragePrecision(s, d)),
    "eval_ann_recall_lsh" -> ((s, d) => Eval.annRecallLsh(s, d)),
    "eval_ann_recall_ivf" -> ((s, d) => Eval.annRecallIvf(s, d)),
    "eval_ann_recall_pq" -> ((s, d) => Eval.annRecallPq(s, d)),
    "eval_ndcg_at_k" -> ((s, d) => Eval.ndcgAtK(s, d)),
    "eval_mrr" -> ((s, d) => Eval.mrr(s, d)),
    // Encoders
    "enc_hashing_tf" -> ((s, d) => Encoders.hashingTf(s, d)),
    "enc_tfidf" -> ((s, d) => Encoders.tfIdf(s, d)),
    "enc_mean_pooling" -> ((s, d) => Encoders.meanPooling(s, d)),
    "pipeline_hashing_search" -> ((s, d) => Encoders.hashingSearch(s, d)),
    "pipeline_experiment_summary" -> ((s, d) => Experiment.summary(s, d)),
    "pipeline_tfidf_search" -> ((s, d) => Encoders.tfIdfSearch(s, d)),
    // Deduplication
    "dedup_exact" -> ((s, d) => Dedup.exact(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "dedup_minhash_lsh" -> ((s, d) => Dedup.minhashLsh(s, d)),
    "dedup_simhash" -> ((s, d) => Dedup.simhash(s, d)),
    "dedup_simhash_pairs" -> ((s, d) => Dedup.simhashPairs(s, d)),
    "dedup_embedding_cosine" -> ((s, d) => Dedup.embeddingCosine(s, d)),
    "dedup_embedding_lsh" -> ((s, d) => Dedup.embeddingLsh(s, d)),
    "dedup_cross_corpus" -> ((s, d) => Dedup.crossCorpus(s, d)),
    "dedup_cluster_labels" -> ((s, d) => Dedup.clusterLabels(s, d)),
    // Text analysis
    "text_token_count" -> ((s, d) => TextAnalysis.tokenCount(s, d)),
    "text_lang_id" -> ((s, d) => TextAnalysis.langId(s, d)),
    "text_quality_score" -> ((s, d) => TextAnalysis.qualityScore(s, d)),
    "text_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(s, d)),
    "text_normalize" -> ((s, d) => TextAnalysis.normalize(s, d)),
    "text_ngram_freq" -> ((s, d) => TextAnalysis.ngramFreq(s, d)),
    "text_pii_scrub" -> ((s, d) => TextAnalysis.piiScrub(s, d)),
    "text_vocab_coverage" -> ((s, d) => TextAnalysis.vocabCoverage(s, d)),
    "text_repetition" -> ((s, d) => TextAnalysis.repetitionStats(s, d)),
    // Corpus shaping
    "sample_stratified" -> ((s, d) => Shaping.stratifiedSample(s, d)),
    "pack_sequences" -> ((s, d) => Shaping.packSequences(s, d)),
    "pipeline_quality_filter" -> ((s, d) => Shaping.qualityFilterPipeline(s, d)),
    "corpus_source_stats" -> ((s, d) => Shaping.sourceStats(s, d)),
    "audit_corpus_integrity" -> ((s, d) => Shaping.corpusIntegrity(s, d)),
    // Perf/ops analytics
    "latency_percentiles" -> ((s, d) => PerfStats.latencyPercentiles(s, d)),
    "ingest_throughput" -> ((s, d) => PerfStats.ingestThroughput(s, d)),
    "run_summary_groupby" -> ((s, d) => PerfStats.runSummary(s, d)),
    "run_summary_rollup" -> ((s, d) => PerfStats.runSummaryRollup(s, d)),
    "stats_paired_tests" -> ((s, d) => PerfStats.pairedTests(s, d)),
    "events_salted_sum" -> ((s, d) => PerfStats.saltedSum(s, d)),
    // Multimodal plumbing
    "mm_binary_meta" -> ((s, d) => Multimodal.binaryMeta(s, d)),
    "mm_frame_features" -> ((s, d) => Multimodal.frameFeaturesQ(s, d)),
    "mm_embed_search" -> ((s, d) => Multimodal.embedSearch(s, d)),
    // Streaming (batch-equivalent verified forms)
    "stream_windowed_agg" -> ((s, d) => graft.streaming.StreamOps.windowedAggBatch(s, d)),
    "stream_sliding_agg" -> ((s, d) => graft.streaming.StreamOps.slidingAggBatch(s, d)),
    "stream_sessionize" -> ((s, d) => graft.streaming.StreamOps.sessionizeBatch(s, d)),
    "stream_topk_trending" -> ((s, d) => graft.streaming.StreamOps.trendingTopKBatch(s, d)),
    // Source round-trips (CSV / JSONL wired through verified plans)
    "source_roundtrip_events_csv" -> ((s, d) => graft.sources.Sources.roundTripEventsCsv(s, d)),
    "source_roundtrip_docs_jsonl" -> ((s, d) => graft.sources.Sources.roundTripDocsJsonl(s, d)),
  )

  /** DuckDB oracle SQL per query key (same column names, same math). */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.SqlOracle.q1Agg,
    "q3_join_agg" -> Relational.SqlOracle.q3JoinAgg,
    "q_window_topn" -> Relational.SqlOracle.windowTopN,
    "q_distinct_count" -> Relational.SqlOracle.distinctCounts,
    "q_latest_by_key" -> Relational.SqlOracle.latestByKey,
    "q_asof_join" -> Relational.SqlOracle.asofJoin(),
    "q_range_join" -> Relational.SqlOracle.rangeJoin(),
    "q_semi_anti_join" -> Relational.SqlOracle.semiAntiJoin,
    "pivot_daily" -> Relational.SqlOracle.pivotDaily,
    "v_dot_product" -> VectorCore.SqlOracle.dotProduct,
    "v_cosine_similarity" -> VectorCore.SqlOracle.cosineSim,
    "v_l2_norm" -> VectorCore.SqlOracle.l2Norm,
    "v_l2_normalize" -> VectorCore.SqlOracle.l2Normalize,
    "v_euclidean_dist" -> VectorCore.SqlOracle.euclidDist,
    "knn_bruteforce" -> Knn.SqlOracle.bruteForce,
    "knn_cosine_topk" -> Knn.SqlOracle.cosineTopK,
    "knn_metadata_filter" -> Knn.SqlOracle.metadataFilter,
    "knn_range_search" -> Knn.SqlOracle.rangeSearch(),
    "ann_lsh_hyperplane" -> Ann.SqlOracle.lshHyperplane,
    "ann_ivf" -> Ann.SqlOracle.ivf,
    "ann_pq_encode" -> Ann.SqlOracle.pqEncode,
    "ann_pq_search" -> Ann.SqlOracle.pqSearch,
    "ann_lsh_filtered" -> Ann.SqlOracle.lshFiltered,
    "ann_ivf_filtered" -> Ann.SqlOracle.ivfFiltered,
    "eval_precision_at_k" -> Eval.SqlOracle.precisionAtK,
    "eval_recall_at_k" -> Eval.SqlOracle.recallAtK,
    "eval_map" -> Eval.SqlOracle.meanAveragePrecision,
    "eval_ann_recall_lsh" -> Eval.SqlOracle.annRecall(Ann.SqlOracle.lshHyperplane),
    "eval_ann_recall_ivf" -> Eval.SqlOracle.annRecall(Ann.SqlOracle.ivf),
    "eval_ann_recall_pq" -> Eval.SqlOracle.annRecall(Ann.SqlOracle.pqSearch),
    "eval_ndcg_at_k" -> Eval.SqlOracle.ndcgAtK,
    "eval_mrr" -> Eval.SqlOracle.mrr,
    "ann_ivf_pq" -> Ann.SqlOracle.ivfPq,
    "enc_hashing_tf" -> Encoders.SqlOracle.hashingTf(),
    "enc_tfidf" -> Encoders.SqlOracle.tfIdf(),
    "enc_mean_pooling" -> Encoders.SqlOracle.meanPooling,
    "pipeline_hashing_search" -> Encoders.SqlOracle.hashingSearch(),
    "pipeline_experiment_summary" -> Experiment.SqlOracle.summary(),
    "pipeline_tfidf_search" -> Encoders.SqlOracle.tfIdfSearch(),
    "dedup_exact" -> Dedup.SqlOracle.exact,
    "dedup_ngram_jaccard" -> Dedup.SqlOracle.ngramJaccard(),
    "dedup_minhash_lsh" -> Dedup.SqlOracle.minhashLsh(),
    "dedup_simhash" -> Dedup.SqlOracle.simhash,
    "dedup_simhash_pairs" -> Dedup.SqlOracle.simhashPairs(),
    "dedup_embedding_cosine" -> Dedup.SqlOracle.embeddingCosine(),
    "dedup_embedding_lsh" -> Dedup.SqlOracle.embeddingLsh(),
    "dedup_cross_corpus" -> Dedup.SqlOracle.crossCorpus(),
    "dedup_cluster_labels" -> Dedup.SqlOracle.clusterLabels(),
    "text_token_count" -> TextAnalysis.SqlOracle.tokenCount,
    "text_lang_id" -> TextAnalysis.SqlOracle.langId,
    "text_quality_score" -> TextAnalysis.SqlOracle.qualityScore,
    "text_fingerprint" -> TextAnalysis.SqlOracle.fingerprint,
    "text_normalize" -> TextAnalysis.SqlOracle.normalize,
    "text_ngram_freq" -> TextAnalysis.SqlOracle.ngramFreq(),
    "text_pii_scrub" -> TextAnalysis.SqlOracle.piiScrub,
    "text_vocab_coverage" -> TextAnalysis.SqlOracle.vocabCoverage(),
    "text_repetition" -> TextAnalysis.SqlOracle.repetitionStats,
    "sample_stratified" -> Shaping.SqlOracle.stratifiedSample,
    "pack_sequences" -> Shaping.SqlOracle.packSequences,
    "pipeline_quality_filter" -> Shaping.SqlOracle.qualityFilterPipeline(),
    "corpus_source_stats" -> Shaping.SqlOracle.sourceStats,
    "audit_corpus_integrity" -> Shaping.SqlOracle.corpusIntegrity,
    "latency_percentiles" -> PerfStats.SqlOracle.latencyPercentiles,
    "ingest_throughput" -> PerfStats.SqlOracle.ingestThroughput,
    "run_summary_groupby" -> PerfStats.SqlOracle.runSummary,
    "run_summary_rollup" -> PerfStats.SqlOracle.runSummaryRollup,
    "stats_paired_tests" -> PerfStats.SqlOracle.pairedTests(),
    "events_salted_sum" -> PerfStats.SqlOracle.saltedSum,
    "mm_binary_meta" -> Multimodal.SqlOracle.binaryMeta,
    "mm_frame_features" -> Multimodal.SqlOracle.frameFeatures,
    "mm_embed_search" -> Multimodal.SqlOracle.embedSearch,
    "stream_windowed_agg" -> graft.streaming.StreamOps.SqlOracle.windowedAgg,
    "stream_sliding_agg" -> graft.streaming.StreamOps.SqlOracle.slidingAgg,
    "stream_sessionize" -> graft.streaming.StreamOps.SqlOracle.sessionize,
    "stream_topk_trending" -> graft.streaming.StreamOps.SqlOracle.trendingTopK,
    "source_roundtrip_events_csv" -> graft.sources.Sources.SqlOracle.roundTripEventsCsv,
    "source_roundtrip_docs_jsonl" -> graft.sources.Sources.SqlOracle.roundTripDocsJsonl,
  )
}
