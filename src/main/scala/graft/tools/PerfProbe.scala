package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators._
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime(); val n = f
        println(f"$name pass$i rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f")
      }
    }
    time("minhash_pairs") { Dedup.minhashLsh(spark, dir).count() }
    time("cluster_labels") { Dedup.clusterLabels(spark, dir).count() }
    println("-- cc verbose round count --")
    Dedup.connectedComponents(Dedup.minhashLsh(spark, dir).select("id_a","id_b"), verbose = true).count()
    time("tfidf_search") { Encoders.tfIdfSearch(spark, dir).count() }
    time("tfidf_weights_only") { Encoders.tfIdf(spark, dir).count() }
    spark.stop()
  }
}
