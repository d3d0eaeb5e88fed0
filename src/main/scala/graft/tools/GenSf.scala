package graft.tools

import org.apache.spark.sql.SparkSession

/** Generates a COMPLETE driver-dir-shaped dataset (all 10 tables) at a
  * given scale factor — the input for the decade-up oracle crosscheck
  * (VERDICT r15 §next-3): sf=1.0 is 10x the largest driver dir
  * (lineitem ~6M, events 1M, documents 50k, embeddings 20k), a corpus
  * mass where the fixed-point 1e2/1e4-scaled sums, histogram buckets,
  * and 62-bit SimHash edges carry 10x the load the shipped gates apply.
  * The crosscheck itself is generator-agnostic — Spark and DuckDB read
  * the SAME parquet — so hash-derived data exercises the oracles
  * exactly as the driver tables do.
  *
  * args: <dir> [sf]   (default sf 1.0)
  */
object GenSf {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GenSf <dir> [sf]")
    val dir = args(0)
    val sf = if (args.length > 1) args(1).toDouble else 1.0
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    graft.sources.DataGen.writeSfDataset(spark, dir, sf)
    println(f"[gensf] wrote sf=$sf dir=$dir in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      println(s"[gensf] $t rows=" +
        spark.read.parquet(s"$dir/$t.parquet").count())
    }
    spark.stop()
  }
}
