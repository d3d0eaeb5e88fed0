package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftExtensions

/** Demo main: the engine driven purely through SQL (functions
  * registered via GraftExtensions). */
object SqlDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    spark.sql(s"CREATE OR REPLACE TEMP VIEW embeddings AS SELECT * FROM parquet.`$dir/embeddings.parquet`")
    spark.sql(s"CREATE OR REPLACE TEMP VIEW documents AS SELECT * FROM parquet.`$dir/documents.parquet`")
    println("-- top-3 self-similar vectors per label via graft_topk_by --")
    spark.sql(
      """SELECT label, graft_topk_by(graft_dot(embedding, embedding), vec_id, 3) AS tk
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin)
      .show(3, truncate = 60)
    println("-- shingle hashes of the first document via graft_shingle_hashes --")
    spark.sql(
      """SELECT doc_id, slice(graft_shingle_hashes(split(text, ' ')), 1, 4) AS first_shingles,
        |       graft_polyhash(text) AS fp
        |FROM documents ORDER BY doc_id LIMIT 3""".stripMargin)
      .show(3, truncate = 60)
    spark.stop()
  }
}
