package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, processed in per-partition batches. The decode step
  * is a clearly-marked deterministic STUB (no image/audio libs ship in
  * this container — SURVEY.md §2); the Spark-side plumbing (schema,
  * batching, partition-local processing) is real.
  */
object Multimodal {

  /** A media row: payload plus typed metadata. */
  case class MediaRow(media_id: Long, payload: Array[Byte], mime: String, n_bytes: Long)

  /** Extracted feature row. */
  case class MediaFeature(media_id: Long, n_bytes: Long, checksum: Long, feat0: Double)

  /** Builds a media frame from the documents table (text bytes standing
    * in for image/audio payloads). */
  def mediaFrame(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        lit("text/plain").as("mime"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .as[MediaRow]
  }

  /** STUB decode: stands in for an image/audio decoder. Deterministic:
    * byte-sum checksum + a fake first feature. A real deployment swaps
    * this single function for the actual codec; the batched
    * `mapPartitions` plumbing around it is unchanged. */
  def stubDecode(payload: Array[Byte]): (Long, Double) = {
    var s = 0L
    var i = 0
    while (i < payload.length) { s += payload(i) & 0xff; i += 1 }
    (s, (s % 997).toDouble / 997.0)
  }

  /** Partition-local batched feature extraction — the shape a Pandas-UDF
    * / Arrow batch pipeline takes, expressed as typed mapPartitions so
    * each task amortizes decoder setup across its whole partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (once per task)
      rows.map { r =>
        val (checksum, feat0) = stubDecode(r.payload)
        MediaFeature(r.media_id, r.n_bytes, checksum, feat0)
      }
    }
  }

  /** Verified projection: scalar metadata + stub features; the byte-sum
    * checksum is mirrored in SQL over the utf8 payload. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaFrame(spark, dir)).toDF()
      .select(col("media_id"), col("n_bytes"), col("checksum"),
        rnd(col("feat0"), 4).as("feat0"))
      .orderBy("media_id")

  object SqlOracle {
    /** ASCII corpus: byte-sum == codepoint-sum of chars. */
    val binaryMeta: String =
      """WITH f AS (
        |  SELECT doc_id AS media_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(unicode(c) AS BIGINT) for c in string_split(text, '')]),
        |      (a, x) -> a + x) AS BIGINT) AS checksum
        |  FROM documents)
        |SELECT media_id, n_bytes, checksum,
        |  (floor((CAST(checksum % 997 AS DOUBLE) / 997.0) * 1e4 + 0.5e0) / 1e4) AS feat0
        |FROM f ORDER BY media_id""".stripMargin
  }
}
