package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-regression runner, executed in a FRESH JVM spawned by
  * [[graft.Bench]] (args: x1Dir x10Dir).
  *
  * Why a child process: after the 60+-query × 2-pass bench marathon,
  * the long-lived JVM's GC/metaspace/codegen-cache churn makes wall
  * times meaningless — BENCH_r02/r03 recorded 34-44 s (min-of-2, after
  * warmup!) for queries that measure 0.7-1.0 s in a fresh JVM on the
  * byte-identical generated corpus. A sustained 60× degradation can't
  * be retried away in-process; isolation is the fix. The scaling
  * exponent log10(t10/t1) is the quadratic-blowup detector, so its
  * inputs must measure the PLAN, not the host JVM's decay.
  */
object ScaleRun {
  /** Representative operator subset: at least one per family with a
    * nontrivial scale shape (pair expansion, bucketed ANN, top-k agg,
    * pure map). */
  val Subset: Seq[String] = Seq(
    "enc_hashing_tf", "pipeline_hashing_search", "knn_bruteforce",
    "ann_lsh_hyperplane", "ann_ivf", "ann_pq_encode",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash_pairs",
    "text_quality_score",
    // events family (generated log): sequential-join funnel, distinct+
    // join retention, stats-broadcast anomaly sweep
    "events_funnel", "events_retention", "events_anomaly",
    // round-4 additions: per-user window (moving average), global
    // top-k through the bounded heap, fit+broadcast+topk keyword
    // extraction
    "events_moving_avg", "events_top_users", "text_keyword_extract",
    "text_bigram_lm")

  def scaleJson(spark: SparkSession, d1: String, d10: String): String = {
    def timed(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try { graft.SparkEntry.queries(name)(spark, dir).count() }
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    val entries = Subset.map { n =>
      // warm up both sizes (one-time codegen), then interleave x1/x10
      // timings and take the min per size so residual drift spreads
      // across both sizes instead of reading as an exponent
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
    s"""{"scale":{${entries.mkString(",")}}}"""
  }

  def main(args: Array[String]): Unit = {
    val Array(d1, d10) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(scaleJson(spark, d1, d10))
    spark.stop()
  }
}
