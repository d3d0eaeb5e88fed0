package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only probe for the round-3 driver bench anomalies:
  * ann_ivf t1=15.7s > t10=3.98s, dedup_simhash_pairs t10=43.9s
  * (both min-of-2 after warmup, so not single-shot noise).
  */
object R4Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("graft-r4probe").toString
    val d1 = s"$base/x1"; val d10 = s"$base/x10"
    graft.sources.DataGen.writeDataset(spark, d1, 5000L, 2000L)
    graft.sources.DataGen.writeDataset(spark, d10, 50000L, 20000L)

    def timed(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    // simhash band histogram at both sizes
    for (dir <- Seq(d1, d10)) {
      val bands = Dedup.simhashFingerprints(spark, dir)
        .select(shiftright(col("fp"), 46).as("band"))
        .groupBy("band").agg(count(lit(1)).as("b"))
      val st = bands
        .agg(max("b"), count(lit(1)),
          sum(when(col("b") <= Dedup.MaxBlock, col("b") * (col("b") - 1) / 2)
            .otherwise(0L)),
          sum(when(col("b") > Dedup.MaxBlock, 1).otherwise(0))).collect()(0)
      println(s"[r4] $dir simhash bands: max=${st.get(0)} nbands=${st.get(1)} " +
        s"pairs_under_cap=${st.get(2)} bands_over_cap=${st.get(3)}")
      val top = bands.orderBy(col("b").desc).limit(8).collect()
        .map(r => s"${r.get(0)}:${r.get(1)}").mkString(" ")
      println(s"[r4] $dir top bands: $top")
    }
    // timings, 3 runs each
    for (n <- Seq("ann_ivf", "dedup_simhash_pairs");
         dir <- Seq(d1, d10);
         i <- 0 until 3)
      println(s"[r4] $n ${if (dir == d1) "x1" else "x10"} run$i: ${timed(n, dir)}%n".format())
    import java.nio.file.{Files, Path, Paths}
    import java.util.Comparator
    Files.walk(Paths.get(base)).sorted(Comparator.reverseOrder[Path]())
      .forEach(p => Files.deleteIfExists(p))
    spark.stop()
  }
}
