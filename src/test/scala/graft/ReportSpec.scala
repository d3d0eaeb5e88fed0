package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.{Experiment, Report}

/** The report/analysis layer (ref: experiments/produce_h3_model_comparison.py,
  * produce_h2_summary_and_plots.py, generate_h1_report.py). */
class ReportLayerSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("modelBySize ranks every model per corpus size with gap-to-best") {
    val grid = Report.modelBySize(spark, sfDir).collect()
    val caps = Experiment.SizeCaps
    grid.length shouldBe caps.length * 2 // two models per cap
    caps.foreach { c =>
      val rows = grid.filter(_.getAs[Long]("corpus_cap") == c)
      rows.map(_.getAs[Long]("model_rank")).sorted shouldBe
        (1L to rows.length.toLong).toArray
      // rank 1 is the per-cap best: zero gap; others have the exact
      // rounded delta to that best MAP
      val best = rows.find(_.getAs[Long]("model_rank") == 1L).get
      best.getAs[Double]("map_gap") shouldBe 0.0
      rows.foreach { r =>
        r.getAs[Double]("map_gap") shouldBe
          (math.floor((best.getAs[Double]("map") - r.getAs[Double]("map")) * 1e4 + 0.5) / 1e4)
      }
      // ties (possible when both caps exceed the corpus) must break by
      // model name so the ranking stays deterministic
      val sorted = rows.sortBy(_.getAs[Long]("model_rank"))
        .map(r => (-r.getAs[Double]("map"), r.getAs[String]("model")))
      sorted shouldBe sorted.sorted
    }
  }

  test("modeLift folds the matrix legs into hybrid-vs-vector deltas per model") {
    val matrix = Experiment.matrix(spark, sfDir).collect()
      .map(r => (r.getAs[String]("model"), r.getAs[String]("search_mode")) ->
        (r.getAs[Double]("map"), r.getAs[Double]("mean_p_at_5"))).toMap
    val lift = Report.modeLift(spark, sfDir).collect()
    lift.map(_.getAs[String]("model")).sorted shouldBe Array("hashing_tf", "tfidf")
    lift.foreach { r =>
      val m = r.getAs[String]("model")
      r.getAs[Double]("vector_map") shouldBe matrix((m, "vector"))._1
      r.getAs[Double]("hybrid_map") shouldBe matrix((m, "hybrid"))._1
      r.getAs[Double]("map_lift") shouldBe
        (math.floor((matrix((m, "hybrid"))._1 - matrix((m, "vector"))._1) * 1e4 + 0.5) / 1e4)
      r.getAs[Double]("p5_lift") shouldBe
        (math.floor((matrix((m, "hybrid"))._2 - matrix((m, "vector"))._2) * 1e4 + 0.5) / 1e4)
    }
  }

  test("textReport renders all sections and writes the artifact") {
    val txt = Report.textReport(spark, sfDir)
    txt should include("SUMMARY:")
    txt should include("Corpus filter funnel")
    txt should include("5_lang_quota: docs=")
    txt should include("H1 (ingest) summary:")
    txt should include("QUERY LATENCY by event type:")
    txt should include("H2 (relevance) - hybrid vs vector per model:")
    txt should include("H3 (by corpus size) - model ranking:")
    // the latency section carries one formatted line per event type
    val latLines = txt.linesIterator.filter(_.contains("mean_s=")).toSeq
    latLines.size shouldBe
      operators.PerfStats.latencyPercentiles(spark, sfDir).count()
    latLines.foreach(l => l should fullyMatch regex
      """\S+: mean_s=\S+ p50=\S+ p90=\S+ p99=\S+ qps=\S+""")
    // detail truncation is bounded by MaxDetail regardless of batch count
    txt.linesIterator.count(_.startsWith("batch: ")) should be <= Report.MaxDetail

    val out = new java.io.File(tempDir("graft-report"), "h_report.txt")
    Report.writeTextReport(spark, sfDir, out.toString)
    java.nio.file.Files.readString(out.toPath) shouldBe txt
  }

  test("filterFunnel stages are monotone and agree with the quality pipeline") {
    val funnel = Report.filterFunnel(spark, sfDir).collect()
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Double]("docs_kept_pct"))).toMap
    funnel.keySet shouldBe Set("1_raw", "2_token_gate", "3_quality_gate",
      "4_dedup", "5_lang_quota")
    // each stage keeps a subset of the previous one
    val ordered = funnel.toSeq.sortBy(_._1).map(_._2)
    ordered.zip(ordered.tail).foreach { case ((d1, t1, _), (d2, t2, _)) =>
      d2 should be <= d1
      t2 should be <= t1
    }
    funnel("1_raw")._3 shouldBe 1.0
    // the funnel's last stage IS the verified pipeline's survivor set
    funnel("5_lang_quota")._1 shouldBe
      operators.Shaping.qualityFilterPipeline(spark, sfDir).count()
    // raw row covers the whole corpus
    funnel("1_raw")._1 shouldBe Tables.documents(spark, sfDir).count()
  }

  test("writePlotSeries emits every plot-input CSV with headers") {
    val dir = tempDir("graft-plotseries")
    Report.writePlotSeries(spark, sfDir, dir)
    Seq("model_by_size", "mode_lift", "latency_by_type", "ingest_throughput")
      .foreach { name =>
        val back = spark.read.option("header", "true").csv(s"$dir/$name")
        back.count() should be > 0L
      }
    // round-trip keeps the grid's shape
    spark.read.option("header", "true").csv(s"$dir/model_by_size")
      .columns should contain allOf ("corpus_cap", "model", "map", "model_rank")
  }

  test("writePlots renders the ref's three chart families as well-formed SVG") {
    import graft.operators.Plotting
    val dir = tempDir("graft-plots")
    val paths = Plotting.writePlots(spark, sfDir, dir)
    paths.map(p => new java.io.File(p).getName) shouldBe Seq(
      "h1_ingest_throughput.svg", "h2_precision_vs_n_docs.svg",
      "h3_model_map_vs_n_docs.svg", "metrics_by_model.svg")
    // every artifact is well-formed XML (parse, don't eyeball)
    val parsed = paths.map { p =>
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      f.newDocumentBuilder().parse(new java.io.File(p))
    }
    parsed.foreach(_.getDocumentElement.getTagName shouldBe "svg")
    // the H3 chart carries one series (polyline) per model in the grid
    val nModels = Report.modelBySize(spark, sfDir)
      .select("model").distinct().count()
    parsed(2).getElementsByTagName("polyline").getLength shouldBe nModels
    // H2 carries the p@5 and MAP series
    parsed(1).getElementsByTagName("polyline").getLength shouldBe 2
    // the metric-by-model bar chart: 3 metric groups × models bars
    // (+ one legend swatch rect per model, + the background rect)
    val nBars = parsed(3).getElementsByTagName("rect").getLength
    nBars shouldBe (1 + nModels * 3 + nModels)
    // deterministic: a second render is byte-identical
    val again = Plotting.writePlots(spark, sfDir, tempDir("graft-plots2"))
    paths.zip(again).foreach { case (a, b) =>
      java.nio.file.Files.readString(java.nio.file.Paths.get(a)) shouldBe
        java.nio.file.Files.readString(java.nio.file.Paths.get(b))
    }
  }

  test("writePlots over an empty corpus produces valid empty-series SVGs") {
    import graft.operators.Plotting
    // a 0-row corpus with the real schemas: every chart degenerates to
    // an empty series, which must render as a valid (axis-less) SVG,
    // not throw NoSuchElement (VERDICT r11 item 8)
    val empty = tempDir("graft-empty-corpus")
    Tables.documents(spark, sfDir).limit(0)
      .write.mode("overwrite").parquet(s"$empty/documents.parquet")
    Tables.events(spark, sfDir).limit(0)
      .write.mode("overwrite").parquet(s"$empty/events.parquet")
    spark.read.parquet(s"$sfDir/embeddings.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$empty/embeddings.parquet")
    val paths = Plotting.writePlots(spark, empty, tempDir("graft-plots-empty"))
    paths should have size 4
    paths.foreach { p =>
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      val doc = f.newDocumentBuilder().parse(new java.io.File(p))
      doc.getDocumentElement.getTagName shouldBe "svg"
    }
  }
}
