package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only probe: distribution of simhash 9-bit chunk blocks (the
  * Manku-style pigeonhole candidate scheme) vs the single 16-bit band. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("graft-probe").toString
    graft.sources.DataGen.writeDataset(spark, s"$base/x10", 50000L, 2000L)
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1", s"$base/x10")) {
      val fp = Dedup.simhashFingerprints(spark, dir).cache()
      val n = fp.count()
      val chunks = fp.select(col("doc_id"), explode(array(
        (0 until 7).map(i => struct(lit(i).as("ci"),
          shiftright(col("fp"), 9 * i).bitwiseAND(511).as("cv"))): _*)).as("c"))
        .select(col("doc_id"), col("c.ci"), col("c.cv"))
      val hist = chunks.groupBy("ci", "cv").agg(count(lit(1)).as("b"))
      val stats = hist.agg(
        max("b").as("max_b"),
        sum(col("b") * (col("b") - 1) / 2).as("pairs"),
        count(lit(1)).as("n_buckets")).collect()(0)
      println(s"[probe] $dir n=$n chunk7x9: max_block=${stats.get(0)} " +
        s"cand_pairs(before distinct)=${stats.get(1)} buckets=${stats.get(2)}")
      // current band16 for comparison
      val bh = fp.select(shiftright(col("fp"), 46).as("band"))
        .groupBy("band").agg(count(lit(1)).as("b"))
      val bs = bh.agg(max("b"), sum(col("b") * (col("b") - 1) / 2)).collect()(0)
      println(s"[probe] $dir band16: max_block=${bs.get(0)} pairs=${bs.get(1)}")
      fp.unpersist()
    }
    spark.stop()
  }
}
