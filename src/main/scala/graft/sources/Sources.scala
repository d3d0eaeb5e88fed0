package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers/writers for the reference's on-disk data shapes (ref:
  * data layout in PROJECT_DOCUMENTATION.txt §2 — `documents_{n}.jsonl`,
  * `queries.jsonl`, `qrels.json`, CSV/JSON result summaries under
  * experiments/results/).
  *
  * All readers hand Spark an explicit schema so the scan never pays a
  * sampling pass, and all are plain `spark.read` plans — partitioned,
  * predicate-pushable, streamable via `readStream` with the same
  * schemas.
  */
object Sources {

  /** {"id": ..., "text": ..., "category": ..., "timestamp": ...,
    * "source": ...} per line (ref weaviate/client.py:28-35 schema). */
  val documentSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("text", StringType),
    StructField("category", StringType),
    StructField("timestamp", StringType),
    StructField("source", StringType)))

  val querySchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("query", StringType)))

  def readDocumentsJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(documentSchema).json(path)

  def readQueriesJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(querySchema).json(path)

  /** qrels.json is one object {qid: [docid, ...]} (ref
    * auto_run_tests.py:509-510); exploded to (q_id, doc_id) rows.
    * A whole-file JSON object is driver-light but single-record, so it
    * is read in wholeText mode and exploded distributively. */
  def readQrelsJson(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("wholetext", "true").text(path)
    raw.select(explode(
        from_json(col("value"), MapType(StringType, ArrayType(StringType)))).as(Seq("q_id", "docs")))
      .select(col("q_id"), explode(col("docs")).as("doc_id"))
  }

  /** Writes a documents frame in the ref's JSONL corpus layout
    * (one {"id","text","category","timestamp","source"} object per
    * line) — the inverse of [[readDocumentsJsonl]], so the engine can
    * hand corpora back to reference tooling. */
  def writeDocumentsJsonl(df: DataFrame, path: String): Unit =
    df.select(col("id"), col("text"), col("category"),
        col("timestamp"), col("source"))
      .write.mode("overwrite").json(path)

  /** Events-log CSV layout (interchange with the ref's timing-log CSV
    * exports): microsecond timestamp format on both sides so a
    * round-trip is lossless against the µs-pinned parquet reader. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  def writeEventsCsv(df: DataFrame, path: String): Unit =
    df.select(eventSchema.fieldNames.map(col): _*)
      .write.mode("overwrite").option("header", "true")
      .option("timestampFormat", TsFmt).csv(path)

  def readEventsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(eventSchema).option("header", "true")
      .option("timestampFormat", TsFmt).csv(path)

  /** Result summaries as CSV with header (the shape of the ref's
    * experiments/results/h3_summary_by_n_docs.csv). */
  def writeSummaryCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  def readSummaryCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)
}
