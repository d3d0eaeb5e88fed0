package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Decade-recall regression artifact (VERDICT r15 §next-2): one
  * runnable main that builds (or reuses) the persistent 200k clustered
  * corpus, measures every decade-scale recall figure the round reports
  * — the composed IVF-PQ re-rank-pool ladder, the trained-√N IVF
  * serving layout, and the kNN-graph (hops × beam-growth) sweep
  * (§next-6) — and emits them as ONE committed JSON file
  * (`DECADE.json`, beside BENCH_DETAIL.json), so the decade recall
  * numbers are regression-gated per round the way correctness already
  * is. The recall figures are DETERMINISTIC (hash-derived corpus,
  * sample-capped deterministic Lloyd fits, hash-seeded graph builds):
  * re-running on unchanged HEAD reproduces them exactly; the wall
  * fields are informative only.
  *
  * args: [corpusDir] [outJson]
  *   (defaults: /tmp/graft-r14/d200k — the persistent decade corpus,
  *   regenerated via DataGen if missing — and /root/repo/DECADE.json)
  */
object DecadeRun {
  val NVecs = 200000L

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft-r14/d200k"
    val out = if (args.length > 1) args(1) else "/root/repo/DECADE.json"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // AQE off so executed plans stay traversable for the DPP
      // files-read metric (IvfPqProbe's discipline); DPP itself is
      // AQE-independent
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Ann, Knn, KnnGraph}

    if (!new java.io.File(s"$dir/embeddings.parquet").exists())
      graft.sources.DataGen.writeDataset(spark, dir, NVecs, NVecs)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val v = f
      (v, (System.nanoTime() - t0) / 1e9)
    }
    def r(v: Double, d: Int = 4): String =
      String.format(java.util.Locale.ROOT, s"%.${d}f", Double.box(v))

    // Metric-matched ground truths: the Ann family serves by DOT
    // (Ann.scala:113), the graph walk scores by COSINE
    // (KnnGraph.scala:420) — on unnormalized vectors the two exact
    // top-10 sets barely overlap, so each leg must be recalled
    // against its own metric's exact set.
    val exactDot = Knn.bruteForce(spark, dir, Knn.K)
      .select(col("q_id"), col("doc_id")).cache()
    val exactCos = Knn.cosineTopK(spark, dir, Knn.K)
      .select(col("q_id"), col("doc_id")).cache()
    def recallAgainst(exact: DataFrame)(df: DataFrame): Double =
      df.select(col("q_id"), col("doc_id"))
        .join(exact, Seq("q_id", "doc_id")).count().toDouble / exact.count()
    val recallOf = recallAgainst(exactDot) _
    val recallCos = recallAgainst(exactCos) _

    val emb = graft.Tables.embeddings(spark, dir)
      .filter(col("vec_id") >= Knn.NQueries)
    val n = emb.count()
    val kCent = Ann.sqrtCentroidCount(n)
    val np = Ann.sqrtProbeCount(kCent)
    println(s"[decade] corpus=$dir n=$n kCent=$kCent nprobe=$np")

    def filesRead(df: DataFrame, path: String): Long = {
      import org.apache.spark.sql.execution.FileSourceScanExec
      df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains(
            new java.io.File(path).getName)) =>
          f.metrics.get("numFiles").map(_.value).getOrElse(-1L)
      }.sum
    }
    def filesTotal(path: String): Long = {
      val hPath = new org.apache.hadoop.fs.Path(path)
      val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(hPath, true)
      var c = 0L
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet") &&
          f.getParent.getName.startsWith("c_id=")) c += 1
      }
      c
    }
    // mean per-query scanned-doc fraction of a c_id-partitioned layout
    // at probe width `nprobe` under the layout's stored grid
    def scanFrac(idx: String, nprobe: Int): Double = {
      val cellSizes = spark.read.parquet(idx)
        .groupBy("c_id").agg(countDistinct("doc_id").as("sz"))
        .localCheckpoint(true)
      val storedCent = spark.read.parquet(s"$idx/_cent")
      Knn.querySet(spark, dir).crossJoin(broadcast(storedCent))
        .groupBy("q_id")
        .agg(graft.functions.TopKAgg.topKBy(
          graft.functions.dot(col("q_vec"), col("c_vec")), col("c_id"),
          nprobe).as("tk"))
        .select(col("q_id"), explode(col("tk")).as("e"))
        .select(col("q_id"), col("e.id").as("c_id"))
        .join(cellSizes, Seq("c_id"))
        .groupBy("q_id").agg(sum("sz").as("scanned"))
        .agg(avg(col("scanned") / n.toDouble)).head.getDouble(0)
    }

    val base = graft.Cleanup.onExit(
      java.nio.file.Files.createTempDirectory("graft-decade")).toString

    // ---- composed IVF-PQ: the re-rank-pool ladder (SURVEY §5 r15;
    // production fits: √N spherical centroids + trained 8×256 codebook)
    val ivfPqIdx = s"$base/ivfpq"
    val cent = Ann.fitCentroids(emb, kCent, iters = 2, spherical = true)
      .select(col("c_id"),
        transform(col("c_vec"), x => x.cast("float")).as("c_vec"))
    val cb256 = Ann.fitPqCodebook(emb, iters = 2, nCodes = 256)
      .localCheckpoint(true)
    val (_, buildS) = timed(Ann.writeIvfPqIndex(spark, dir, ivfPqIdx,
      centroids = Some(cent), codebook = Some(cb256)))
    println(f"[decade] ivfpq build $buildS%.1f s")
    val sqrtNk = math.sqrt(n.toDouble).toInt * Knn.K
    val pools = Seq(3 * Knn.K, sqrtNk, 2 * sqrtNk, 4 * sqrtNk)
    val ipScan = scanFrac(ivfPqIdx, np)
    val ivfPqRows = pools.map { pool =>
      var wall = Double.MaxValue
      var df: DataFrame = null
      for (_ <- 0 until 2) {
        df = Ann.ivfPqIndexed(spark, dir, ivfPqIdx, Knn.K,
          nProbe = np, rerank = pool)
        val (_, w) = timed(df.collect())
        wall = math.min(wall, w)
      }
      val rec = recallOf(df)
      val fr = filesRead(df, ivfPqIdx); val ft = filesTotal(ivfPqIdx)
      println(f"[decade] ivfpq nprobe=$np rerank=$pool recall=$rec%.3f " +
        f"scan=$ipScan%.4f files=$fr/$ft wall=$wall%.2f")
      s"""{"nprobe":$np,"rerank":$pool,"recall_at_${Knn.K}":${r(rec, 3)},""" +
        s""""scan_frac":${r(ipScan)},"files_read":$fr,"files_total":$ft,""" +
        s""""wall_s":${r(wall, 2)}}"""
    }

    // ---- trained-√N IVF serving layout (r13's 1.000 @ 4.9% scan)
    val ivfIdx = s"$base/ivf"
    val (_, ivfBuildS) = timed(
      Ann.writeIvfIndex(spark, dir, ivfIdx, centroids = Some(cent)))
    val ivScan = scanFrac(ivfIdx, np)
    val ivfRows = {
      var wall = Double.MaxValue
      var df: DataFrame = null
      for (_ <- 0 until 2) {
        df = Ann.ivfIndexed(spark, dir, ivfIdx, Knn.K, nProbe = np)
        val (_, w) = timed(df.collect())
        wall = math.min(wall, w)
      }
      val rec = recallOf(df)
      val fr = filesRead(df, ivfIdx); val ft = filesTotal(ivfIdx)
      println(f"[decade] ivf_sqrtn nprobe=$np recall=$rec%.3f " +
        f"scan=$ivScan%.4f files=$fr/$ft wall=$wall%.2f build=$ivfBuildS%.1f")
      Seq(s"""{"k_cent":$kCent,"nprobe":$np,"recall_at_${Knn.K}":${r(rec, 3)},""" +
        s""""scan_frac":${r(ivScan)},"files_read":$fr,"files_total":$ft,""" +
        s""""wall_s":${r(wall, 2)},"build_s":${r(ivfBuildS, 1)}}""")
    }

    // ---- kNN graph: (hops × beam-growth) sweep (VERDICT r15 §next-6)
    val docs = Knn.docSet(spark, dir)
      .select(col("doc_id").as("id"), col("doc_vec").as("vec"))
    val (g0, gBuildS) = timed(
      KnnGraph.buildGraph(docs).localCheckpoint(true))
    println(f"[decade] graph build $gBuildS%.1f s edges=${g0.count()}")
    val q = Knn.querySet(spark, dir).select(col("q_id"), col("q_vec"))
    val autoBeam = KnnGraph.resolveBeam(KnnGraph.AutoBeam, n)
    val graphCfgs = Seq((KnnGraph.Hops, 1.0), (12, 1.0),
      (KnnGraph.Hops, 1.25), (12, 1.15), (12, 1.25))
    val graphRows = graphCfgs.map { case (hops, growth) =>
      val (res, wall) = timed {
        val df = KnnGraph.graphSearch(q, docs, g0, Knn.K,
          hops = hops, beamGrowth = growth, nHint = n)
          .select(col("q_id"), col("id").as("doc_id"))
        df.localCheckpoint(true)
      }
      val rec = recallCos(res)
      // total frontier width over the walk — the per-query expansion
      // cost lever the sweep is trading against recall
      val widthSum = (1 to hops).map(h =>
        math.ceil(autoBeam * math.pow(growth, h - 1.0)).toInt).sum
      println(f"[decade] graph hops=$hops growth=$growth recall=$rec%.3f " +
        f"widthSum=$widthSum wall=$wall%.1f s")
      s"""{"hops":$hops,"beam_growth":$growth,"beam0":$autoBeam,""" +
        s""""frontier_width_sum":$widthSum,"recall_at_${Knn.K}":${r(rec, 3)},""" +
        s""""wall_s":${r(wall, 1)}}"""
    }

    val json =
      s"""{"corpus":{"dir":"$dir","n_docs":$n,"n_queries":${Knn.NQueries},""" +
        s""""k":${Knn.K},"k_cent":$kCent,"nprobe":$np,""" +
        s""""ann_metric":"dot","graph_metric":"cosine"},""" +
        s""""ivf_pq":[${ivfPqRows.mkString(",")}],""" +
        s""""ivf_sqrtn":[${ivfRows.mkString(",")}],""" +
        s""""graph":[${graphRows.mkString(",")}],""" +
        s""""graph_build_s":${r(gBuildS, 1)},"ivfpq_build_s":${r(buildS, 1)}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    println(s"[decade] wrote $out")
    println(json)
    spark.stop()
  }
}
