package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Decade-scale probe for the COMPOSED IVF-PQ persisted layout
  * (VERDICT r14 §next-3): PqProbe localized flat PQ's 200k saturation
  * to the fixed 30-candidate re-rank pool; this measures whether the
  * composed layout — √N trained spherical centroids + the production
  * 8×256 trained codebook, codes cell-partitioned on disk, DPP-pruned
  * probe, ADC on stored codes, scaled exact re-rank — clears the
  * ~0.9 recall bar (the HNSW ef regime, ref weaviate/client.py:47-57)
  * at a single-digit scan fraction, beside IVF √N's 1.000@4.9% and
  * the graph's 0.910.
  *
  * Prints per (nprobe, rerank) leg: recall@10, DPP files read/total,
  * mean per-query SCANNED-DOC fraction (probed-cell sizes / corpus),
  * and warm serve wall.
  *
  * args: dir [nprobeList] [rerankList]
  *   (defaults: √nlist and 2·√nlist; 3k and √N·k)
  */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft-r14/d200k"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // AQE off so the executed plan tree is directly traversable for
      // the scan metrics; DPP is independent of AQE
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Ann, Knn}

    val exact = Knn.bruteForce(spark, dir, Knn.K)
      .select(col("q_id"), col("doc_id")).cache()
    val total = exact.count()
    def recallOf(df: DataFrame): Double =
      df.select(col("q_id"), col("doc_id"))
        .join(exact, Seq("q_id", "doc_id")).count().toDouble / total

    def filesTotal(path: String): Long = {
      val hPath = new org.apache.hadoop.fs.Path(path)
      val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(hPath, true)
      var n = 0L
      while (it.hasNext) {
        val f = it.next().getPath
        // count only the cell-partition data files, not _cent/_fit
        if (f.getName.endsWith(".parquet") &&
          f.getParent.getName.startsWith("c_id=")) n += 1
      }
      n
    }
    def filesRead(df: DataFrame, path: String): Long = {
      import org.apache.spark.sql.execution.FileSourceScanExec
      df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains(
            new java.io.File(path).getName)) =>
          f.metrics.get("numFiles").map(_.value).getOrElse(-1L)
      }.sum
    }

    val emb = graft.Tables.embeddings(spark, dir)
      .filter(col("vec_id") >= Knn.NQueries)
    val n = emb.count()
    val kCent = Ann.sqrtCentroidCount(n)
    val nprobes =
      if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(Ann.sqrtProbeCount(kCent), 2 * Ann.sqrtProbeCount(kCent))
    val reranks =
      if (args.length > 2) args(2).split(",").map(_.toInt).toSeq
      else Seq(3 * Knn.K,
        math.max(3 * Knn.K, math.sqrt(n.toDouble).toInt * Knn.K))
    println(s"[ivfpq] n=$n kCent=$kCent nprobes=$nprobes reranks=$reranks")

    val base = graft.Cleanup.onExit(
      java.nio.file.Files.createTempDirectory("graft-ivfpqprobe")).toString
    val idx = s"$base/ivfpq"
    var t0 = System.nanoTime()
    val cent = Ann.fitCentroids(emb, kCent, iters = 2, spherical = true)
      .select(col("c_id"),
        transform(col("c_vec"), x => x.cast("float")).as("c_vec"))
    println(f"[ivfpq] centroid fit ${(System.nanoTime() - t0) / 1e9}%.1f s")
    t0 = System.nanoTime()
    val cb256 = Ann.fitPqCodebook(emb, iters = 2, nCodes = 256)
      .localCheckpoint(true)
    println(f"[ivfpq] 8x256 codebook fit ${(System.nanoTime() - t0) / 1e9}%.1f s")
    t0 = System.nanoTime()
    Ann.writeIvfPqIndex(spark, dir, idx,
      centroids = Some(cent), codebook = Some(cb256))
    println(f"[ivfpq] layout build ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // per-query scanned-doc fraction: probed-cell populations over N
    val cellSizes = spark.read.parquet(idx)
      .groupBy("c_id").agg(countDistinct("doc_id").as("sz"))
      .localCheckpoint(true)

    for (np <- nprobes; rr <- reranks) {
      var wall = Double.MaxValue
      var df: DataFrame = null
      for (_ <- 0 until 2) {
        df = Ann.ivfPqIndexed(spark, dir, idx, Knn.K, nProbe = np, rerank = rr)
        val t1 = System.nanoTime()
        df.collect()
        wall = math.min(wall, (System.nanoTime() - t1) / 1e9)
      }
      val storedCent = spark.read.parquet(s"$idx/_cent")
      val probed = Knn.querySet(spark, dir).crossJoin(broadcast(storedCent))
        .groupBy("q_id")
        .agg(graft.functions.TopKAgg.topKBy(
          graft.functions.dot(col("q_vec"), col("c_vec")), col("c_id"), np).as("tk"))
        .select(col("q_id"), explode(col("tk")).as("e"))
        .select(col("q_id"), col("e.id").as("c_id"))
      val scanFrac = probed.join(cellSizes, Seq("c_id"))
        .groupBy("q_id").agg(sum("sz").as("scanned"))
        .agg(avg(col("scanned") / n.toDouble)).head.getDouble(0)
      val fr = filesRead(df, idx)
      val ft = filesTotal(idx)
      println(f"[ivfpq] nprobe=$np%4d rerank=$rr%5d recall@${Knn.K}=" +
        f"${recallOf(df)}%.3f scan_frac=$scanFrac%.4f files_read=$fr/$ft " +
        f"wall=$wall%.2f s")
    }
    spark.stop()
  }
}
