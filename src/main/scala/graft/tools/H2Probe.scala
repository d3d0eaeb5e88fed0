package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** One-off probe for the H2 serving-leg storage strategy (round 11):
  * times the 30-query dense scan at a given corpus size under
  * (a) the r10 shape — gather persisted MEMORY_AND_DISK,
  * (b) a plain parquet scan of a pre-written gathered layout,
  * (c) the r9 sparse postings join, for reference.
  * Args: <corpusDir> (documents.parquet inside). */
object H2Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Encoders
    val dir = args(0)
    // per-run scratch, swept at JVM exit (ADVICE r11: fixed /tmp paths
    // clobber under concurrent runs and leak after exit)
    val base = graft.Cleanup.onExit(
      java.nio.file.Files.createTempDirectory("graft-h2probe"))
    val idx = s"$base/idx"
    val gat = s"$base/gat"
    def timed(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    timed("encode")(Encoders.writeHashingIndex(spark, dir, idx, 512))
    timed("gather_write")(
      Encoders.gatherPostings(spark.read.parquet(idx))
        .orderBy("doc_id")
        .write.mode("overwrite").parquet(gat))
    // (b) parquet scan, three passes (first cold-ish, rest page-cache warm)
    for (i <- 1 to 3)
      timed(s"q30_parquet_$i")(
        Encoders.hashingSearchDense(spark.read.parquet(gat), 10, 30, 512).count())
    // (a) persisted gather
    val p = Encoders.gatherPostings(spark.read.parquet(idx))
      .persist(StorageLevel.MEMORY_AND_DISK)
    for (i <- 1 to 3)
      timed(s"q30_persist_$i")(
        Encoders.hashingSearchDense(p, 10, 30, 512).count())
    p.unpersist()
    // (c) sparse postings join (r9 shape)
    for (i <- 1 to 3)
      timed(s"q30_sparse_$i")(
        Encoders.hashingSearchIndexed(spark, idx, 10, 30).count())
    spark.stop()
  }
}
