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
    "text_bigram_lm",
    // round-5 additions (affordable now that the parent batches the
    // subset across fresh child JVMs): the remaining pair-expansion /
    // blocking shapes — PPJoin-verified shingle LSH, hyperplane-bucket
    // embedding near-dup, broadcast-shingle decontamination — plus the
    // end-to-end TF-IDF search pipeline (vocab fit + inverted index)
    "dedup_ngram_jaccard", "dedup_embedding_lsh", "dedup_cross_corpus",
    "pipeline_tfidf_search",
    // round-6 addition: the paired-test p-value pipeline — its t-CDF
    // fold is O(df) in the paired-user count (was O(df²) before r6),
    // and this is the probe that keeps it honest
    "stats_paired_tests",
    // round-6 retrieval additions: BM25's windowed doc-length +
    // broadcast-postings shape, and the two-arm RRF fusion plan
    "text_bm25_topk", "pipeline_hybrid_search",
    // round-12: the fused multi-cap grid (two corpus passes for the
    // whole |caps|x|models| sweep) — the probe that keeps the fusion's
    // one-scan-per-family property honest as corpora grow
    "pipeline_experiment_sizes",
    // round-6: the quality-filter pipeline — normalization is the
    // codegen'd byte loop now; this keeps the regex from creeping back
    "pipeline_quality_filter",
    // round-8: NN-Descent build + beam search — per-round candidate
    // volume is O(N·R²) so the exponent should read linear-ish; a
    // super-linear reading here means the neighborhood caps regressed
    "ann_graph_search",
    // round-9: query-from-stored-postings (the memoized build runs in
    // the warm-up pass, so the measured exponent is the QUERY leg:
    // postings scan + broadcast join + top-k, expected ~linear)
    "pipeline_indexed_search",
    // round-9: span-level exact substring dedup — explode + dup-hash
    // groupBy + 1:1 hash join + per-doc island window; the one dedup
    // shape with NO pair expansion, so the exponent should read the
    // token count's, ~linear (super-linear = the join degenerated)
    "dedup_span_coverage",
    // round-9: SQ8 ADC — Dim rows per (doc, query) through the fixed-
    // point sum; linear in corpus, the probe keeps the broadcast side
    // honest (a shuffled qparts join would read super-linear)
    "ann_sq8_search",
    // round-13: the √N-centroid IVF deployment path (VERDICT r12
    // §next-5), serving split: the memoized trained layout builds in
    // the warm-up pass (like pipeline_indexed_search), so the
    // measured exponent is the stored-grid PROBE leg — expected
    // sub-linear (probed rows ≈ nprobe·N/nlist ≈ N^(3/4))
    "ann_ivf_sqrtn",
    // round-14 (VERDICT r13 §next-4): the SAME configuration with the
    // Lloyd fit IN the measured plan — the honest build+probe cost
    // (expected ≈N^1.5: the fit's assignment pass is N·√N per
    // iteration). The two entries together keep the fit cost from
    // ever being mistaken for the serving path (or vice versa); the
    // deployment amortizes the fit via writeTrainedIvfIndex.
    "ann_ivf_sqrtn_fit")

  /** Bench-only measurement aliases — plan shapes the scale section
    * times beside their registered twins without adding redundant
    * entries to the verified-query inventory (the fit-inclusive form
    * shares ann_ivf_sqrtn's declared rows-only semantics and
    * Round13Spec pins them bit-identical). */
  val Extra: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map("ann_ivf_sqrtn_fit" -> ((s, d) => graft.operators.Ann.ivfSqrtN(s, d)))

  private def queryFn(name: String): (SparkSession, String) => org.apache.spark.sql.DataFrame =
    Extra.getOrElse(name, graft.SparkEntry.queries(name))

  /** Warm-up + interleaved min-of-2 (t1, t10) per query — the
    * measurement kernel shared by the child main (line protocol) and
    * the parent's in-process fallback. Interleaving x1/x10 spreads
    * residual drift across both sizes instead of reading as an
    * exponent. */
  def measure(spark: SparkSession, d1: String, d10: String,
              subset: Seq[String] = Subset): Seq[(String, Double, Double)] = {
    def timed(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try { queryFn(name)(spark, dir).count() }
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    subset.map { n =>
      timed(n, d1); timed(n, d10)
      var t1 = Double.MaxValue
      var t10 = Double.MaxValue
      for (_ <- 0 until 2) {
        t1 = math.min(t1, timed(n, d1))
        t10 = math.min(t10, timed(n, d10))
      }
      (n, t1, t10)
    }
  }

  def entryJson(n: String, t1: Double, t10: Double): String = {
    val exp =
      if (t1 > 0 && t10 > 0) (math.log(t10 / t1) / math.log(10.0)).toString
      else "null"
    s""""$n":{"t1":$t1,"t10":$t10,"exp":$exp}"""
  }

  def scaleJson(spark: SparkSession, d1: String, d10: String,
                subset: Seq[String] = Subset): String =
    s"""{"scale":{${measure(spark, d1, d10, subset)
      .map { case (n, t1, t10) => entryJson(n, t1, t10) }.mkString(",")}}}"""

  def main(args: Array[String]): Unit = {
    // args: x1Dir x10Dir [queryName...] — no names = the full Subset
    // (the parent batches names across children to bound JVM churn)
    val d1 = args(0); val d10 = args(1)
    val subset = if (args.length > 2) args.drop(2).toSeq else Subset
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // line protocol (like BenchRun): one SCALEQ line per query so the
    // parent can merge minima across redundant children; the JSON form
    // rides along for a human reading the log
    measure(spark, d1, d10, subset).foreach { case (n, t1, t10) =>
      println(s"SCALEQ $n $t1 $t10")
      System.out.flush()
    }
    spark.stop()
  }
}
