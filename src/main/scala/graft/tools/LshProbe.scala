package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only diagnosis of dedup_embedding_lsh's scaling exponent
  * (VERDICT r5 item 5): at 1×/10×/30× embedding-table sizes, measure
  * wall time alongside the quantities that explain it — bucket
  * occupancy (Σ pairs per banded bucket, pre/post cap), capped-bucket
  * count, candidate-pair count after distinct, and final output rows.
  * Distinguishes "pair-output growth" (output ∝ time: fine, document)
  * from "bucket saturation" (candidates rail against MaxBucket caps:
  * re-band). Corpora persist under /tmp/graft-expprobe (x1/x10) and
  * /tmp/graft-expprobe/x30. */
object LshProbe {
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
      ("x30", s"$base/x30", 150000L, 60000L))
    // nEvents + events-keyed existence check as in NgramProbe: keep
    // seeded corpora complete and self-healing for the other probes
    dirs.foreach { case (_, d, nd, nv) =>
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d/events.parquet")))
        graft.sources.DataGen.writeDataset(spark, d, nd, nv, nEvents = nd * 20)
    }
    import graft.operators.{Ann, Dedup}
    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    dirs.foreach { case (label, d, _, nv) =>
      // warm + min-of-2 on the full query
      timed(Dedup.embeddingLsh(spark, d).count())
      val (runs, rows) = (0 until 2).map(_ =>
        timed(Dedup.embeddingLsh(spark, d).count())).unzip
      // occupancy diagnostics on the banded frame
      val e = graft.Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
      val banded = e.withColumn("_sig", Ann.signature(col("embedding")))
        .select(col("vec_id"), explode(array(
          (0 until Ann.NBands).map(bb => struct(
            lit(bb).as("band"),
            shiftright(col("_sig"), Ann.BandBits * bb)
              .bitwiseAND((1 << Ann.BandBits) - 1).as("bkt"))): _*)).as("bk"))
        .select(col("vec_id"), col("bk.band"), col("bk.bkt"))
      val occ = banded.groupBy("band", "bkt").agg(count(lit(1)).as("c"))
        .agg(
          count(lit(1)).as("n_buckets"),
          max("c").as("max_c"),
          sum((col("c") * (col("c") - 1) / 2).cast("long")).as("raw_pairs"),
          sum((least(col("c"), lit(Dedup.MaxBucket.toLong)) *
            (least(col("c"), lit(Dedup.MaxBucket.toLong)) - 1) / 2).cast("long")).as("capped_pairs"),
          sum(when(col("c") > Dedup.MaxBucket, 1L).otherwise(0L)).as("n_capped"))
        .collect()(0)
      val cands = Dedup.embeddingLshCandidates(spark, d).count()
      println(f"[lsh] $label%-4s nv=$nv%-6d t=${runs.min}%7.2f s out=${rows.head}%-8d " +
        f"cands=$cands%-9d raw_pairs=${occ.getLong(2)}%-11d capped_pairs=${occ.getLong(3)}%-11d " +
        f"buckets=${occ.getLong(0)}%-4d max_c=${occ.getLong(1)}%-7d capped=${occ.getLong(4)}")
      System.out.flush()
    }
    spark.stop()
  }
}
