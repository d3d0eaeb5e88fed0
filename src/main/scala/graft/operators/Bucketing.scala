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

  /** In-place compaction of a bucketed table — the maintenance twin of
    * [[graft.operators.Ann.compactIvfIndex]] for the OTHER serving
    * layout: every `mode("append").bucketBy(...)` batch (e.g.
    * [[graft.operators.KnnGraph.appendToGraphIndex]]) adds one sorted
    * file per touched bucket, and once a bucket spans multiple files
    * the "single sorted file per bucket" property that elides the
    * join-side Sort is gone and scan listing cost grows per append.
    * The rewrite snapshots the table (localCheckpoint detaches it from
    * the files being replaced), then re-writes it with the same
    * (key, nBuckets) layout — one sorted file per bucket again,
    * contents unchanged. Same exclusive-maintenance-window contract
    * as compactIvfIndex: pause appends while it runs. This is the
    * single-snapshot local form; a 100 TB deployment re-runs
    * [[writeBucketed]] from the source-of-truth corpus instead of
    * snapshotting the table. */
  def compactBucketed(spark: SparkSession, table: String, key: String,
                      nBuckets: Int): Unit = {
    // localCheckpoint is EAGER: the snapshot lives in storage blocks
    // before the drop below removes the table's files. The explicit
    // drop (not overwrite-CTAS) is required because Spark validates a
    // managed CTAS target's location before the overwrite drop would
    // clear it (LOCATION_ALREADY_EXISTS otherwise).
    val snapshot = spark.table(table).localCheckpoint()
    val location = spark.sql(s"DESCRIBE EXTENDED $table").collect()
      .find(_.getString(0) == "Location").map(_.getString(1))
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a crashed prior maintenance run can leave the location dir
    // behind with no table over it — clear it so the CTAS location
    // validation passes (through the location's own filesystem)
    location.foreach { loc =>
      val p = new org.apache.hadoop.fs.Path(loc)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    // align write tasks 1:1 with bucket ids (both are murmur3-pmod on
    // the key), so each bucket comes out as exactly one sorted file
    writeBucketed(snapshot.repartition(nBuckets,
      org.apache.spark.sql.functions.col(key)), table, key, nBuckets)
  }

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
