package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only probe: 10× scaling exponent for the queries named in args
  * (default: dedup_simhash_pairs), over DataGen corpora persisted under
  * /tmp/graft-expprobe so repeated runs skip generation. Run in a fresh
  * JVM per invocation (sbt runMain) — same isolation rule as
  * [[ScaleRun]], which this mirrors (warmup, interleaved min-of-2). */
object ExpProbe {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("dedup_simhash_pairs")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = "/tmp/graft-expprobe"
    val d1 = s"$base/x1"; val d10 = s"$base/x10"
    // keyed on events.parquet (the last table written) so a partial
    // seed from another probe self-heals — see NgramProbe
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d10/events.parquet"))) {
      graft.sources.DataGen.writeDataset(spark, d1, 5000L, 2000L, nEvents = 100000L)
      graft.sources.DataGen.writeDataset(spark, d10, 50000L, 20000L, nEvents = 1000000L)
    }
    def timed(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try { graft.SparkEntry.queries(name)(spark, dir).count() }
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      timed(n, d1); timed(n, d10)
      var t1 = Double.MaxValue; var t10 = Double.MaxValue
      for (_ <- 0 until 2) {
        t1 = math.min(t1, timed(n, d1))
        t10 = math.min(t10, timed(n, d10))
      }
      val exp = math.log(t10 / t1) / math.log(10.0)
      println(f"[exp] $n%-26s t1=$t1%8.2f t10=$t10%8.2f exp=$exp%.2f")
    }
    spark.stop()
  }
}
