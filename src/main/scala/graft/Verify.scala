package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** The oracle map actually dumped to oracle_sql.json: the static
    * [[SparkEntry.oracleSql]] contract plus per-SF literal overlays for
    * the queries whose oracles embed driver-computed quantized idf
    * values (the NDCG-discount-table technique, parameterized by the
    * corpus's (N, df) integer stats at dump time — see
    * [[operators.Encoders.idfLiterals]]). Every key still comes from
    * the static map; overlays only swap the idf *computation* for the
    * fitted values, leaving vocabulary selection derived in SQL. */
  def oracleSqlFor(spark: SparkSession, sfDir: String): Map[String, String] = {
    val overlays =
      try {
        // one fit job feeds both idf tables (they differ only in the
        // driver-side idf formula over the same (nDocs, df) rows)
        val (idfT, idfB) = operators.Encoders.idfLiteralsBoth(spark, sfDir)
        val qlp = operators.TextAnalysis.bigramQlpLiterals(spark, sfDir)
        Map(
          "text_keyword_extract" ->
            operators.Encoders.SqlOracle.keywordExtract(idf = Some(idfT)),
          "text_bigram_lm" ->
            operators.TextAnalysis.SqlOracle.bigramLmScore(Some(qlp)),
          "text_bm25_topk" ->
            operators.Encoders.SqlOracle.bm25TopK(idf = Some(idfB)),
          "pipeline_hybrid_search" ->
            operators.Encoders.SqlOracle.hybridSearch(idf = Some(idfB)),
          "pipeline_bm25_text_search" ->
            operators.Encoders.SqlOracle.bm25TextTopK(idf = Some(idfB)),
          "pipeline_hybrid_text_search" ->
            operators.Encoders.SqlOracle.hybridTextSearch(idf = Some(idfB)),
          "pipeline_experiment_matrix" ->
            operators.Experiment.SqlOracle.matrix(idf = Some(idfB)),
          "report_mode_lift" ->
            operators.Report.SqlOracle.modeLift(idf = Some(idfB)))
      } catch { case e: Throwable =>
        // overlay literals come from small fit jobs; if one fails, the
        // static self-contained oracles are still a complete contract
        System.err.println(s"[verify] literal overlay failed (static oracles kept): ${e.getMessage}")
        Map.empty[String, String]
      }
    // the OPQ eval's oracle exists ONLY as an overlay: the Jacobi
    // eigenfit has no SQL form, but its output is a constant matrix,
    // so the FROZEN rotation rides into the oracle as literals (the
    // idf technique) and the rest is plain PQ SQL. Its own try block:
    // a rotation-fit failure must not take the 8 idf overlays with it,
    // and vice versa — on failure this query degrades to the driver's
    // rows-only check instead of losing its verdict entirely.
    val opqOverlay =
      try Map("eval_ann_recall_opq" -> operators.Eval.SqlOracle.annRecall(
        operators.Opq.SqlOracle.opqSearch(
          operators.Opq.rotation(spark, sfDir))))
      catch { case e: Throwable =>
        System.err.println(s"[verify] opq overlay failed (rows-only): ${e.getMessage}")
        Map.empty[String, String]
      }
    // trained-PQ oracles: same frozen-fit-as-literals technique — the
    // memoized driver-side codebook rows ARE both the Spark plan's
    // codebook and the oracle's literal table. Own try block, same
    // rows-only degradation contract as the opq overlay.
    val pqTrainedOverlay =
      try {
        val rows = operators.Ann.trainedPqRows(spark, sfDir)
        if (rows.isEmpty) Map.empty[String, String]
        else {
          val searchSql = operators.Ann.SqlOracle.pqSearchTrainedSql(rows)
          Map("ann_pq_trained" -> searchSql,
            "eval_ann_recall_pq_trained" ->
              operators.Eval.SqlOracle.annRecall(searchSql))
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] pq-trained overlay failed (rows-only): ${e.getMessage}")
        Map.empty[String, String]
      }
    // full OPQ: both frozen fits composed (rotation matrix + rotated-
    // space codebook literals)
    val opqTrainedOverlay =
      try {
        val rows = operators.Opq.trainedOpqRows(spark, sfDir)
        if (rows.isEmpty) Map.empty[String, String]
        else Map("eval_ann_recall_opq_trained" ->
          operators.Eval.SqlOracle.annRecall(
            operators.Opq.SqlOracle.opqTrainedSearch(
              operators.Opq.rotation(spark, sfDir), rows)))
      } catch { case e: Throwable =>
        System.err.println(s"[verify] opq-trained overlay failed (rows-only): ${e.getMessage}")
        Map.empty[String, String]
      }
    // refined OPQ (one non-parametric alternation): the SAME composed
    // overlay shape as opq_trained, parameterized by the refined pair
    val opqRefinedOverlay =
      try {
        val (r1, rows) = operators.Opq.refinedFit(spark, sfDir)
        if (rows.isEmpty) Map.empty[String, String]
        else Map("eval_ann_recall_opq_refined" ->
          operators.Eval.SqlOracle.annRecall(
            operators.Opq.SqlOracle.opqTrainedSearch(r1, rows)))
      } catch { case e: Throwable =>
        System.err.println(s"[verify] opq-refined overlay failed (rows-only): ${e.getMessage}")
        Map.empty[String, String]
      }
    SparkEntry.oracleSql ++ overlays ++ opqOverlay ++ pqTrainedOverlay ++
      opqTrainedOverlay ++ opqRefinedOverlay
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A thrown query must be LOUD in the artifact: r7 proved that
    // stderr-only reporting lets 6 broken queries silently vanish from
    // the correctness inventory (101 green entries looked complete
    // against 107 registered). Every failure lands in _errors.json.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // Most dedup oracles are UNCAPPED SQL while the Spark operators cap
    // pathological blocks — oracle equality therefore requires every
    // observed block at this sf to be under its operator's cap. Check
    // it explicitly so a data refresh shows up as this line, not as a
    // confusing row-count diff (ADVICE r2). The simhash band cap is
    // MIRRORED in its oracle (approximate-by-cap), so that entry
    // (cap = -1) is informational and can never be violated.
    try operators.Dedup.maxBlockSizes(spark, sfDir).foreach { case (k, v, cap) =>
      val verdict =
        if (cap < 0) "mirrored-in-oracle" else if (v > cap) "VIOLATED" else "ok"
      System.err.println(s"[verify] block-cap $verdict: $k max=$v cap=$cap")
    } catch { case e: Throwable =>
      System.err.println(s"[verify] block-cap check failed: ${e.getMessage}")
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = oracleSqlFor(spark, sfDir)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Written even when empty so "no file" can never be confused with
    // "no errors" by a consumer of the out dir.
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    // No non-zero exit: the driver must still DuckDB-compare the
    // queries that DID dump; the artifact (not the rc) carries failure.
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
