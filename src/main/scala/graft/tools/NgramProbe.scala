package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only diagnosis of dedup_ngram_jaccard's 10×→100× exponent
  * (+1.12 in the r6 GenRun decade validation): at 1×/10×/30×/100×
  * corpus sizes, measure wall time alongside the quantities that
  * explain it — (lang, t0) block occupancy, candidate pairs after the
  * MaxBlock cap, pairs surviving the PPJoin length filter, and output
  * rows. Distinguishes "candidate growth while blocks are under the
  * cap" (a quadratic-to-linear regime transition that self-limits at
  * the cap, like the LSH buckets in r5) from a genuine per-pair cost
  * drift. Corpora persist under /tmp/graft-expprobe; the x100 leg
  * (500 k docs) is generated on first use. */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = "/tmp/graft-expprobe"
    val dirs = Seq(
      ("x1", s"$base/x1", 5000L, 2000L),
      ("x10", s"$base/x10", 50000L, 20000L),
      ("x30", s"$base/x30", 150000L, 60000L),
      ("x100", s"$base/x100", 500000L, 200000L))
    // nEvents scales with docs (20 events/doc, the ExpProbe ratio) so a
    // corpus seeded here also serves events-based queries via
    // ExpProbe/TimeQuery. The check keys on events.parquet — the LAST
    // table writeDataset emits — so a dir seeded by an older probe
    // without events self-heals (generation is seed-deterministic, so
    // re-writing docs/embeddings reproduces identical tables).
    dirs.foreach { case (_, d, nd, nv) =>
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d/events.parquet")))
        graft.sources.DataGen.writeDataset(spark, d, nd, nv, nEvents = nd * 20)
    }
    import graft.operators.Dedup
    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    dirs.foreach { case (label, d, nd, _) =>
      timed(Dedup.ngramJaccard(spark, d).count()) // warm
      val (runs, rows) = (0 until 2).map(_ =>
        timed(Dedup.ngramJaccard(spark, d).count())).unzip
      // block occupancy on the (lang, t0) blocking key
      val blocks = Dedup.hashedShingles(spark, d)
        .groupBy("lang", "t0").agg(count(lit(1)).as("c"))
        .agg(
          count(lit(1)).as("n_blocks"),
          max("c").as("max_c"),
          sum((col("c") * (col("c") - 1) / 2).cast("long")).as("raw_pairs"),
          sum((least(col("c"), lit(Dedup.MaxBlock.toLong)) *
            (least(col("c"), lit(Dedup.MaxBlock.toLong)) - 1) / 2).cast("long")).as("capped_pairs"),
          sum(when(col("c") > Dedup.MaxBlock, 1L).otherwise(0L)).as("n_capped"))
        .collect()(0)
      // candidates that pay the per-pair sorted-intersect cost (the
      // prefix-filtered join; compare against capped_pairs = what the
      // pre-r6 within-block cross join would have expanded)
      val cands = Dedup.ngramJaccardCandidates(spark, d).count()
      println(f"[ngram] $label%-4s nd=$nd%-7d t=${runs.min}%7.2f s out=${rows.head}%-8d " +
        f"cands=$cands%-10d raw_pairs=${blocks.getLong(2)}%-12d " +
        f"capped_pairs=${blocks.getLong(3)}%-12d blocks=${blocks.getLong(0)}%-6d " +
        f"max_c=${blocks.getLong(1)}%-7d capped=${blocks.getLong(4)}")
      System.out.flush()
    }
    spark.stop()
  }
}
