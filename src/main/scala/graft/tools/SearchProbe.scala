package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.{Encoders, Knn}

/** Dev-only profiler for the two search pipelines (min-of-3 warm). */
object SearchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }
    def mins(n: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $n%-24s min=${ts.min}%6.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    mins("knn_bruteforce")(Knn.bruteForce(spark, dir).count())
    mins("tfidf_search")(Encoders.tfIdfSearch(spark, dir).count())
    mins("hashing_search")(Encoders.hashingSearch(spark, dir).count())
    mins("enc_tfidf")(Encoders.tfIdf(spark, dir).count())
    mins("enc_hashing_tf")(Encoders.hashingTf(spark, dir).count())
    mins("knn_again")(Knn.bruteForce(spark, dir).count())
    spark.stop()
  }
}
