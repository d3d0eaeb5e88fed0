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
    // Two passes: the first run of a query pays its one-time whole-stage
    // codegen (janino) cost — real, but paid once per query shape in a
    // long-lived engine; the second run measures steady-state execution.
    // "queries"/"value" report the warm (steady-state) numbers, the
    // cold first-run numbers ride along under *_cold for comparison.
    val names = SparkEntry.queries.keys.toSeq
    val cold = names.map(n => n -> timed(n, sfDir)).toMap
    val warm = names.map(n => n -> timed(n, sfDir)).toMap
    def js(m: Map[String, Double]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // The caller keeps only the LAST ~2000 chars of stdout and parses
    // the JSON line from that window — full-precision times for 60+
    // queries blow past it and the line never parses (BENCH_r01-r03 all
    // recorded parsed:null). The final line therefore carries 2-decimal
    // times only; full precision + cold breakdown + the scale section
    // go to BENCH_DETAIL.json and an earlier (scrolled-off) stdout line.
    def r2(v: Double): String = {
      val s = "%.2f".format(v)
      if (s.endsWith("0")) s.dropRight(1) else s
    }
    def jsShort(m: Map[String, Double]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + r2(v) }.mkString("{", ",", "}")
    val total = if (warm.nonEmpty) warm.values.sum else 0.0
    val totalCold = if (cold.nonEmpty) cold.values.sum else 0.0

    val scaleJson =
      if (sys.env.getOrElse("SPARK_GRAFT_SCALE_CHECK", "1") != "1") ""
      else {
        val basePath = java.nio.file.Files.createTempDirectory("graft-scale")
        val base = basePath.toString
        val d1 = s"$base/x1"; val d10 = s"$base/x10"
        sources.DataGen.writeDataset(spark, d1, 5000L, 2000L)
        sources.DataGen.writeDataset(spark, d10, 50000L, 20000L)
        val subset = Seq(
          "enc_hashing_tf", "pipeline_hashing_search", "knn_bruteforce",
          "ann_lsh_hyperplane", "ann_ivf", "ann_pq_encode",
          "dedup_exact", "dedup_minhash_lsh", "dedup_simhash_pairs",
          "text_quality_score")
        // Warmup both sizes, then interleave x1/x10 timings and take the
        // min per size: single-run wall times on a long-lived bench JVM
        // carry multi-second GC/AQE/codegen outliers (BENCH_r02 recorded
        // 34.6s for dedup_simhash_pairs that measured 1.1s reproduced in
        // isolation), and sequential x1-then-x10 timing lets secular JVM
        // drift masquerade as a scaling exponent; interleaving spreads
        // drift across both sizes.
        val entries = subset.map { n =>
          timed(n, d1); timed(n, d10)
          var t1 = Double.MaxValue
          var t10 = Double.MaxValue
          for (_ <- 0 until 2) {
            t1 = math.min(t1, timed(n, d1))
            t10 = math.min(t10, timed(n, d10))
          }
          val exp =
            if (t1 > 0 && t10 > 0) (math.log(t10 / t1) / math.log(10.0)).toString
            else "null"
          s""""$n":{"t1":$t1,"t10":$t10,"exp":$exp}"""
        }
        // the generated corpora are bench-local scratch — remove them so
        // repeated runs don't accumulate parquet under /tmp
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        Files.walk(basePath).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
        s""","scale":{${entries.mkString(",")}}"""
      }

    val detail =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${js(warm)},"total_cold":$totalCold,"queries_cold":${js(cold)},"sf":"$sfDir"$scaleJson}"""
    // Full-precision record for the repo (and for later rounds' diffing);
    // also printed on an earlier stdout line, which scrolls out of the
    // caller's tail window but survives in a full log.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/BENCH_DETAIL.json"), detail + "\n")
    catch { case _: Throwable => }
    println(detail)
    println(s"""{"metric":"total","value":${r2(total)},"unit":"sec","queries":${jsShort(warm)},"total_cold":${r2(totalCold)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
