package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: one JSON line on stdout with per-query wall
  * times at the driver's sf dir, plus (unless SPARK_GRAFT_SCALE_CHECK=0)
  * a scale-regression section: a representative operator subset timed
  * on generated corpora at 1× and 10× size, reporting the empirical
  * scaling exponent log10(t10/t1) — a quadratic pair-expansion or skew
  * blowup shows up here as exp→2 at bench time instead of at 100 TB.
  * Fixed per-job overhead inflates t1, so exponents read *low*; the
  * signal watched is "well below 2", not "exactly 1".
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet-reader paths once so per-query times
    // measure the operators, not first-query initialization.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    def timed(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, dir).count() } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.keys.map(n => n -> timed(n, sfDir)).toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0

    val scaleJson =
      if (sys.env.getOrElse("SPARK_GRAFT_SCALE_CHECK", "1") != "1") ""
      else {
        val base = java.nio.file.Files.createTempDirectory("graft-scale").toString
        val d1 = s"$base/x1"; val d10 = s"$base/x10"
        sources.DataGen.writeDataset(spark, d1, 5000L, 2000L)
        sources.DataGen.writeDataset(spark, d10, 50000L, 20000L)
        val subset = Seq(
          "enc_hashing_tf", "pipeline_hashing_search", "knn_bruteforce",
          "ann_lsh_hyperplane", "ann_ivf", "ann_pq_encode",
          "dedup_exact", "dedup_minhash_lsh", "dedup_simhash_pairs",
          "text_quality_score")
        // min of two runs per point: single-run wall times on the dense
        // generated corpus carry multi-second GC/AQE noise that could
        // fake a super-linear exponent
        def timed2(n: String, dir: String): Double =
          math.min(timed(n, dir), timed(n, dir))
        val entries = subset.map { n =>
          val t1 = timed2(n, d1)
          val t10 = timed2(n, d10)
          val exp =
            if (t1 > 0 && t10 > 0) (math.log(t10 / t1) / math.log(10.0)).toString
            else "null"
          s""""$n":{"t1":$t1,"t10":$t10,"exp":$exp}"""
        }
        s""","scale":{${entries.mkString(",")}}"""
      }

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$scaleJson}""")
    spark.stop()
  }
}
