package graft.operators

import org.apache.spark.sql.SparkSession

/** Plot RENDERING for the report layer — closes the reference's last
  * presentation-side gap (experiments/plot_results.py:1-129 and
  * produce_h*_summary_and_plots.py render matplotlib PNGs of the
  * experiment grids; `Report.writePlotSeries` already emits the tidy
  * CSV inputs, this renders the charts themselves). SVG instead of
  * PNG, deliberately: it is pure text (no imaging dependency in the
  * container, and none allowed), resolution-independent, and diffable
  * in review — while carrying the same chart semantics the ref's
  * plots do (multi-series line charts with markers, legend, axis
  * labels, log-x corpus-size axes).
  *
  * Everything here is driver-side presentation over BOUNDED frames
  * (constant-size experiment grids / MaxDetail-capped series — the
  * same bounds the text report already enforces); the distributed work
  * happened upstream in the verified operators.
  */
object Plotting {

  /** Fixed palette (matplotlib's default cycle's first entries, a
    * public convention) so output is deterministic. */
  private val Palette = Seq("#1f77b4", "#ff7f0e", "#2ca02c", "#d62728",
    "#9467bd", "#8c564b", "#e377c2", "#7f7f7f")

  private def fmt(v: Double): String = {
    // ticks and coordinates print compactly and deterministically;
    // Locale.ROOT, not the JVM default — a comma-decimal locale
    // (de_DE) would render "12,34" and corrupt polyline points and
    // attribute values (ADVICE r11)
    val s = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    if (s.endsWith(".00")) s.dropRight(3) else s
  }

  /** Render a multi-series line chart (the ref's plt.plot(...,
    * marker='o') shape) as an SVG string. `series` = (label, points);
    * `logX` mirrors plt.xscale('log') for corpus-size axes. Points
    * with non-positive x under logX are dropped (matplotlib does the
    * same). Deterministic: fixed palette, fixed tick count, fixed
    * number formatting. */
  def lineChartSvg(title: String, xLabel: String, yLabel: String,
                   series: Seq[(String, Seq[(Double, Double)])],
                   logX: Boolean = false,
                   width: Int = 640, height: Int = 420): String = {
    val margin = 56
    val w = width - 2 * margin
    val h = height - 2 * margin
    val pts = series.map { case (l, ps) =>
      l -> ps.filter(p => !logX || p._1 > 0)
        .map(p => (if (logX) math.log10(p._1) else p._1, p._2))
        .sortBy(_._1)
    }.filter(_._2.nonEmpty)
    val all = pts.flatMap(_._2)
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" viewBox="0 0 $width $height">"""
    sb ++= s"""<rect width="$width" height="$height" fill="white"/>"""
    sb ++= s"""<text x="${width / 2}" y="22" text-anchor="middle" font-family="sans-serif" font-size="14" font-weight="bold">${xmlEscape(title)}</text>"""
    if (all.nonEmpty) {
      var (x0, x1) = (all.map(_._1).min, all.map(_._1).max)
      var (y0, y1) = (math.min(0.0, all.map(_._2).min), all.map(_._2).max)
      if (x1 == x0) { x0 -= 0.5; x1 += 0.5 }
      if (y1 == y0) { y1 = y0 + 1.0 }
      def sx(x: Double) = margin + (x - x0) / (x1 - x0) * w
      def sy(y: Double) = height - margin - (y - y0) / (y1 - y0) * h
      // axes
      sb ++= s"""<line x1="$margin" y1="${height - margin}" x2="${width - margin}" y2="${height - margin}" stroke="black"/>"""
      sb ++= s"""<line x1="$margin" y1="$margin" x2="$margin" y2="${height - margin}" stroke="black"/>"""
      // x ticks: powers of 10 under logX (the ref's log axis), else 5 linear
      val xticks =
        if (logX) (math.floor(x0).toInt to math.ceil(x1).toInt)
          .map(_.toDouble).filter(t => t >= x0 - 1e-9 && t <= x1 + 1e-9)
        else (0 to 4).map(i => x0 + (x1 - x0) * i / 4)
      xticks.foreach { t =>
        val px = sx(t)
        val label = if (logX) s"1e${t.toInt}" else fmt(t)
        sb ++= s"""<line x1="${fmt(px)}" y1="${height - margin}" x2="${fmt(px)}" y2="${height - margin + 5}" stroke="black"/>"""
        sb ++= s"""<text x="${fmt(px)}" y="${height - margin + 18}" text-anchor="middle" font-family="sans-serif" font-size="10">$label</text>"""
      }
      (0 to 4).map(i => y0 + (y1 - y0) * i / 4).foreach { t =>
        val py = sy(t)
        sb ++= s"""<line x1="${margin - 5}" y1="${fmt(py)}" x2="$margin" y2="${fmt(py)}" stroke="black"/>"""
        sb ++= s"""<text x="${margin - 8}" y="${fmt(py + 3)}" text-anchor="end" font-family="sans-serif" font-size="10">${fmt(t)}</text>"""
      }
      sb ++= s"""<text x="${width / 2}" y="${height - 12}" text-anchor="middle" font-family="sans-serif" font-size="12">${xmlEscape(xLabel)}</text>"""
      sb ++= s"""<text x="16" y="${height / 2}" text-anchor="middle" font-family="sans-serif" font-size="12" transform="rotate(-90 16 ${height / 2})">${xmlEscape(yLabel)}</text>"""
      // series: one polyline + circle markers each
      pts.zipWithIndex.foreach { case ((label, ps), i) =>
        val color = Palette(i % Palette.size)
        val path = ps.map(p => s"${fmt(sx(p._1))},${fmt(sy(p._2))}").mkString(" ")
        sb ++= s"""<polyline points="$path" fill="none" stroke="$color" stroke-width="1.5"/>"""
        ps.foreach { p =>
          sb ++= s"""<circle cx="${fmt(sx(p._1))}" cy="${fmt(sy(p._2))}" r="3" fill="$color"/>"""
        }
        // legend entry (top-right stack, the matplotlib default corner)
        val ly = margin + 14 + i * 16
        sb ++= s"""<line x1="${width - margin - 110}" y1="$ly" x2="${width - margin - 90}" y2="$ly" stroke="$color" stroke-width="1.5"/>"""
        sb ++= s"""<circle cx="${width - margin - 100}" cy="$ly" r="3" fill="$color"/>"""
        sb ++= s"""<text x="${width - margin - 84}" y="${ly + 4}" font-family="sans-serif" font-size="11">${xmlEscape(label)}</text>"""
      }
    }
    sb ++= "</svg>"
    sb.toString
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Render a grouped bar chart (the ref's seaborn barplot shape,
    * plots/plotting.py:36-44 plot_precision_recall: metric groups on
    * x, one bar per model within each group, legend by model). One
    * value per (series, group); missing values render as no bar. */
  def barChartSvg(title: String, yLabel: String, groups: Seq[String],
                  series: Seq[(String, Seq[Double])],
                  width: Int = 640, height: Int = 420): String = {
    val margin = 56
    val w = width - 2 * margin
    val h = height - 2 * margin
    val all = series.flatMap(_._2)
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" viewBox="0 0 $width $height">"""
    sb ++= s"""<rect width="$width" height="$height" fill="white"/>"""
    sb ++= s"""<text x="${width / 2}" y="22" text-anchor="middle" font-family="sans-serif" font-size="14" font-weight="bold">${xmlEscape(title)}</text>"""
    if (all.nonEmpty && groups.nonEmpty) {
      val y1 = math.max(all.max, 1e-9)
      def sy(y: Double) = height - margin - y / y1 * h
      sb ++= s"""<line x1="$margin" y1="${height - margin}" x2="${width - margin}" y2="${height - margin}" stroke="black"/>"""
      sb ++= s"""<line x1="$margin" y1="$margin" x2="$margin" y2="${height - margin}" stroke="black"/>"""
      (0 to 4).map(i => y1 * i / 4).foreach { t =>
        val py = sy(t)
        sb ++= s"""<line x1="${margin - 5}" y1="${fmt(py)}" x2="$margin" y2="${fmt(py)}" stroke="black"/>"""
        sb ++= s"""<text x="${margin - 8}" y="${fmt(py + 3)}" text-anchor="end" font-family="sans-serif" font-size="10">${fmt(t)}</text>"""
      }
      val groupW = w.toDouble / groups.size
      val barW = groupW * 0.8 / math.max(1, series.size)
      groups.zipWithIndex.foreach { case (g, gi) =>
        val gx = margin + gi * groupW
        sb ++= s"""<text x="${fmt(gx + groupW / 2)}" y="${height - margin + 18}" text-anchor="middle" font-family="sans-serif" font-size="10">${xmlEscape(g)}</text>"""
        series.zipWithIndex.foreach { case ((_, vals), si) =>
          if (gi < vals.length) {
            val v = vals(gi)
            val bx = gx + groupW * 0.1 + si * barW
            sb ++= s"""<rect x="${fmt(bx)}" y="${fmt(sy(v))}" width="${fmt(barW)}" height="${fmt(height - margin - sy(v))}" fill="${Palette(si % Palette.size)}"/>"""
          }
        }
      }
      series.zipWithIndex.foreach { case ((label, _), i) =>
        val ly = margin + 14 + i * 16
        sb ++= s"""<rect x="${width - margin - 110}" y="${ly - 6}" width="12" height="12" fill="${Palette(i % Palette.size)}"/>"""
        sb ++= s"""<text x="${width - margin - 92}" y="${ly + 4}" font-family="sans-serif" font-size="11">${xmlEscape(label)}</text>"""
      }
      sb ++= s"""<text x="16" y="${height / 2}" text-anchor="middle" font-family="sans-serif" font-size="12" transform="rotate(-90 16 ${height / 2})">${xmlEscape(yLabel)}</text>"""
    }
    sb ++= "</svg>"
    sb.toString
  }

  /** Render the reference's three plot families from the SAME verified
    * frames `Report.writePlotSeries` emits as CSV — one SVG each,
    * returning the written paths:
    *  - h1_ingest_throughput.svg (plot_results.plot_h1: the ingest/
    *    encode-cost curve; ours is the verified per-batch events/s
    *    series, MaxDetail-bounded),
    *  - h2_precision_vs_n_docs.svg (plot_h2 / produce_h2: retrieval
    *    quality vs corpus size, log-x; p@5 and MAP of the best model
    *    per size),
    *  - h3_model_map_vs_n_docs.svg (plot_h3: per-model quality vs
    *    corpus size, log-x, one series per model). */
  def writePlots(spark: SparkSession, dir: String, outDir: String): Seq[String] = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    def save(name: String, svg: String): String = {
      val p = java.nio.file.Paths.get(outDir, name)
      java.nio.file.Files.writeString(p, svg)
      p.toString
    }
    // bounded collects by construction: the grid is constant-size, the
    // throughput series is MaxDetail-capped (same bound as textReport)
    val grid = Report.modelBySize(spark, dir).collect()
    val byModel = grid.groupBy(_.getAs[String]("model")).toSeq.sortBy(_._1)
      .map { case (m, rows) =>
        m -> rows.map(r => (r.getAs[Long]("n_docs").toDouble,
          r.getAs[Double]("map"))).toSeq
      }
    val best = grid.filter(_.getAs[Long]("model_rank") == 1L)
      .sortBy(_.getAs[Long]("n_docs"))
    val h2 = Seq(
      "p@5" -> best.map(r => (r.getAs[Long]("n_docs").toDouble,
        r.getAs[Double]("mean_p_at_5"))).toSeq,
      "MAP" -> best.map(r => (r.getAs[Long]("n_docs").toDouble,
        r.getAs[Double]("map"))).toSeq)
    val ingest = PerfStats.ingestThroughput(spark, dir)
      .limit(Report.MaxDetail).collect()
      .map(r => (r.getAs[Long]("batch_id").toDouble,
        r.getAs[Double]("throughput_vps"))).toSeq
    // metric-by-model grouped bars (plots/plotting.py:36-44's
    // precision/recall barplot) over the vector-mode experiment legs
    val matrixRows = Experiment.matrix(spark, dir).collect()
      .filter(_.getAs[String]("search_mode") == "vector")
      .sortBy(_.getAs[String]("model"))
    val metricCols = Seq("mean_p_at_5", "mean_p_at_10", "map")
    val bars = matrixRows.map { r =>
      r.getAs[String]("model") -> metricCols.map(r.getAs[Double](_))
    }.toSeq
    Seq(
      save("h1_ingest_throughput.svg", lineChartSvg(
        "H1: ingest throughput by batch", "batch", "events/sec",
        Seq("events/sec" -> ingest))),
      save("h2_precision_vs_n_docs.svg", lineChartSvg(
        "H2: precision vs corpus size", "n_docs", "score", h2, logX = true)),
      save("h3_model_map_vs_n_docs.svg", lineChartSvg(
        "H3: model effect (MAP)", "n_docs", "MAP", byModel, logX = true)),
      save("metrics_by_model.svg", barChartSvg(
        "Precision@k and MAP by embedding model", "score",
        Seq("p@5", "p@10", "MAP"), bars)))
  }
}
