package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Encoders

/** Dev-only stage profiler for the tfidf search pipeline. */
object TfidfProbe {
  def t[T](n: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[tfidf] $n%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm
    t("warm full")(Encoders.tfIdfSearch(spark, dir).count())
    t("weights")(Encoders.tfIdf(spark, dir).count())
    t("weights again")(Encoders.tfIdf(spark, dir).count())
    t("full")(Encoders.tfIdfSearch(spark, dir).count())
    t("full again")(Encoders.tfIdfSearch(spark, dir).count())
    t("enc_tfidf")(Encoders.tfIdf(spark, dir).count())
    spark.stop()
  }
}
