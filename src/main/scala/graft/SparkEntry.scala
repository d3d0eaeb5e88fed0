package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 (coverage checklist)
  * and §7 (build plan). Every entry in [[queries]] has an ANSI-SQL
  * oracle in [[oracleSql]] that DuckDB runs on the same parquet tables;
  * column names/arithmetic are mirrored exactly (SURVEY.md §6).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Relational/analytics surface
    "q1_agg" -> ((s, d) => Relational.q1Agg(s, d)),
    "q3_join_agg" -> ((s, d) => Relational.q3JoinAgg(s, d)),
    "q_window_topn" -> ((s, d) => Relational.windowTopN(s, d)),
    "q_distinct_count" -> ((s, d) => Relational.distinctCounts(s, d)),
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
    // Retrieval evaluation
    "eval_precision_at_k" -> ((s, d) => Eval.precisionAtK(s, d)),
    "eval_recall_at_k" -> ((s, d) => Eval.recallAtK(s, d)),
    "eval_map" -> ((s, d) => Eval.meanAveragePrecision(s, d)),
  )

  /** DuckDB oracle SQL per query key (same column names, same math). */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.SqlOracle.q1Agg,
    "q3_join_agg" -> Relational.SqlOracle.q3JoinAgg,
    "q_window_topn" -> Relational.SqlOracle.windowTopN,
    "q_distinct_count" -> Relational.SqlOracle.distinctCounts,
    "v_dot_product" -> VectorCore.SqlOracle.dotProduct,
    "v_cosine_similarity" -> VectorCore.SqlOracle.cosineSim,
    "v_l2_norm" -> VectorCore.SqlOracle.l2Norm,
    "v_l2_normalize" -> VectorCore.SqlOracle.l2Normalize,
    "v_euclidean_dist" -> VectorCore.SqlOracle.euclidDist,
    "knn_bruteforce" -> Knn.SqlOracle.bruteForce,
    "knn_cosine_topk" -> Knn.SqlOracle.cosineTopK,
    "knn_metadata_filter" -> Knn.SqlOracle.metadataFilter,
    "eval_precision_at_k" -> Eval.SqlOracle.precisionAtK,
    "eval_recall_at_k" -> Eval.SqlOracle.recallAtK,
    "eval_map" -> Eval.SqlOracle.meanAveragePrecision,
  )
}
