package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location (SURVEY.md §4/§5). At 100 TB the
  * dominant cost of a repeated big-big equi-join is the shuffle; both
  * sides written `bucketBy(n, key)` share a partitioning, so every
  * subsequent join on the key is planned WITHOUT an Exchange on either
  * side — one write amortized over every later run. `sortBy` inside
  * the bucket additionally removes the join's Sort when each bucket is
  * a single file.
  */
object Bucketing {

  /** Writes `df` as a parquet table bucketed (and sorted) on `key`.
    * Bucket counts must match across join sides (Spark can coalesce
    * differing counts only when one divides the other). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, key).sortBy(key)
      .saveAsTable(table)

  /** Equi-join of two tables bucketed on `key` — shuffle-free by
    * construction (asserted in PlanSpec, not assumed). */
  def join(spark: SparkSession, left: String, right: String,
           key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
