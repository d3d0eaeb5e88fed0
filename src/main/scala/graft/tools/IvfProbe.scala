package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Decade-scale probe for the √N-centroid IVF deployment lever
  * (VERDICT r12 §next-5): fit ⌈√N⌉ centroids, build the partitioned
  * [[graft.operators.Ann.writeIvfIndex]] layout from them, and measure
  * recall@10, scan pruning (parquet files read / total, from the scan
  * node's own metrics), and warm wall vs the fixed-16-centroid layout.
  *
  * args: dir [itersList] [nprobeList]  (defaults: 2,3 and 4,22)
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft-g200k"
    val iterss = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq else Seq(2)
    val nprobes = if (args.length > 2) args(2).split(",").map(_.toInt).toSeq else Seq(4, 22)
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
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    // numFiles metric of the index-side scan AFTER execution — the
    // measured DPP pruning, not an inference from probe lists
    def filesRead(df: DataFrame, path: String): Long = {
      import org.apache.spark.sql.execution.FileSourceScanExec
      df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains(
            new java.io.File(path).getName)) =>
          if (sys.env.contains("IVFPROBE_DEBUG"))
            println(s"[probe] scan metrics: " + f.metrics.map {
              case (k2, m) => s"$k2=${m.value}" }.mkString(" "))
          f.metrics.get("numFiles").map(_.value).getOrElse(-1L)
      }.sum
    }

    val emb = graft.Tables.embeddings(spark, dir)
      .filter(col("vec_id") >= Knn.NQueries)
    val n = emb.count()
    println(s"[probe] n=$n exact_rows=$total")
    val base = graft.Cleanup.onExit(
      java.nio.file.Files.createTempDirectory("graft-ivfprobe")).toString

    def leg(tag: String, out: String, cent: Option[DataFrame], np: Int): Unit = {
      val t0 = System.nanoTime()
      Ann.writeIvfIndex(spark, dir, out, centroids = cent)
      val tBuild = (System.nanoTime() - t0) / 1e9
      var wall = Double.MaxValue
      var df: DataFrame = null
      for (_ <- 0 until 2) {
        df = Ann.ivfIndexed(spark, dir, out, Knn.K, centroids = cent, nProbe = np)
        val t1 = System.nanoTime()
        df.collect()
        wall = math.min(wall, (System.nanoTime() - t1) / 1e9)
      }
      val fr = filesRead(df, out)
      val ft = filesTotal(out)
      println(f"[probe] $tag nprobe=$np build=$tBuild%.1f s query_wall=$wall%.2f s " +
        f"recall@${Knn.K}=${recallOf(df)}%.3f files_read=$fr/$ft")
    }

    // baseline: the verified fixed-16-centroid layout at NProbe
    leg("fixed16", s"$base/ivf16", None, Ann.NProbe)
    for (iters <- iterss) {
      val kCent = Ann.sqrtCentroidCount(n)
      val t0 = System.nanoTime()
      val cent = Ann.fitCentroids(emb, kCent, iters, spherical = true)
        .select(col("c_id"),
          transform(col("c_vec"), x => x.cast("float")).as("c_vec"))
      println(f"[probe] fit kCent=$kCent iters=$iters ${(System.nanoTime() - t0) / 1e9}%.1f s")
      for (np <- nprobes)
        leg(s"sqrtN(iters=$iters)", s"$base/ivf$kCent-$iters", Some(cent), np)
    }
    spark.stop()
  }
}
