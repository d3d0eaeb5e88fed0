package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Shaping

/** Dev-only: stage timing of pipeline_quality_filter on a 50k generated
  * corpus (GenRun measured 124s — ~400x the expected cost). */
object QfProbe {
  def t[T](n: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[qf] $n%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("graft-qf")
    val dir = base.toString
    graft.sources.DataGen.writeDataset(spark, dir, 50000L, 1000L)
    val wq = Shaping.withQualityColumns(
      graft.Tables.documents(spark, dir).select(col("doc_id"), col("lang"), col("text")))
      .drop("text")
    t("withQuality count")(wq.count())
    t("withQuality again")(wq.count())
    val gated = wq.filter(col("n_toks") >= 20 && col("quality") >= 0.6)
    t("gated count")(gated.count())
    val survivors = gated.groupBy("norm_hash")
      .agg(min_by(struct(col("doc_id"), col("lang"), col("n_toks"), col("quality")),
        col("doc_id")).as("r"))
      .select(col("r.doc_id"), col("r.lang"), col("r.n_toks"), col("r.quality"))
    t("survivors count")(survivors.count())
    t("full pipeline")(Shaping.qualityFilterPipeline(spark, dir).count())
    t("full again")(Shaping.qualityFilterPipeline(spark, dir).count())
    t("pack_sequences")(Shaping.packSequences(spark, dir).count())
    t("pack again")(Shaping.packSequences(spark, dir).count())
    import java.nio.file.{Files, Path}
    Files.walk(base).sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(p => Files.deleteIfExists(p))
    spark.stop()
  }
}
