package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only probe: where does dedup_cluster_labels spend its time —
  * the LSH pair generation or the CC rounds (and how many rounds)? */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val pairs = Dedup.minhashLsh(spark, dir).select("id_a", "id_b")
      val n = pairs.count()
      val t1 = System.nanoTime()
      val labels = Dedup.connectedComponents(pairs, verbose = true)
      val m = labels.count()
      val t2 = System.nanoTime()
      println(f"[ccprobe] pass=$pass pairs=$n%d lshTime=${(t1 - t0) / 1e9}%.2f ccNodes=$m%d ccTime=${(t2 - t1) / 1e9}%.2f")
    }
    spark.stop()
  }
}
