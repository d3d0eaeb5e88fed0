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

  /** Day-partitioned layout for append-only logs: a time-range query
    * against this layout prunes whole day directories at PLANNING time
    * (PartitionFilters) — zero IO for out-of-range days, the first
    * thing a 100 TB event store needs. */
  def writePartitionedByDay(events: DataFrame, path: String,
                            tsCol: String = "ts"): Unit =
    events
      .withColumn("day", org.apache.spark.sql.functions.date_format(
        org.apache.spark.sql.functions.col(tsCol), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day").parquet(path)

  /** Inclusive day-range read; the range predicate is a partition
    * filter, never a data filter. */
  def readDayRange(spark: SparkSession, path: String,
                   fromDay: String, toDay: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet(path)
      .filter(col("day") >= fromDay && col("day") <= toDay)
  }
}
