package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev probe for the r14 incremental-pool walk: same graph, same
  * queries — time the pooled walk vs the cumulative-state walk
  * (2 passes each, interleaved) and report recall@K of both (must be
  * identical; bit-equality is spec'd separately in Round14Spec).
  * Args: dir [hops] [beam]. */
object R14Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Knn, KnnGraph}
    val hops = if (args.length >= 2) args(1).toInt else KnnGraph.Hops
    val beam = if (args.length >= 3) args(2).toInt else KnnGraph.AutoBeam
    val nodes = Knn.docSet(spark, dir)
      .select(col("doc_id").as("id"), col("doc_vec").as("vec"))
    val queries = Knn.querySet(spark, dir).select(col("q_id"), col("q_vec"))
    println(s"[r14] nodes=${nodes.count()} hops=$hops beam=$beam")
    val t0 = System.nanoTime()
    val g = KnnGraph.buildGraph(nodes).localCheckpoint(true)
    println(f"[r14] build ${(System.nanoTime() - t0) / 1e9}%.2f s edges=${g.count()}")
    def timed(f: => Long): Double = {
      val t = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t) / 1e9
      if (n < 0) -1 else s
    }
    val exact = Knn.cosineTopK(spark, dir, Knn.K)
      .select(col("q_id"), col("doc_id")).localCheckpoint(true)
    def recall(res: org.apache.spark.sql.DataFrame): Double =
      res.select(col("q_id"), col("id").as("doc_id"))
        .join(exact, Seq("q_id", "doc_id")).count().toDouble / exact.count()
    // warm both once, then interleave timed passes
    def pooled() = KnnGraph.graphSearch(queries, nodes, g, Knn.K, beam, hops)
    def cumul() = KnnGraph.graphSearchCumulative(queries, nodes, g, Knn.K, beam, hops)
    pooled().count(); cumul().count()
    for (pass <- 1 to 2) {
      val tp = timed(pooled().count())
      val tc = timed(cumul().count())
      println(f"[r14] pass$pass pooled $tp%.2f s  cumulative $tc%.2f s")
    }
    println(f"[r14] recall pooled ${recall(pooled())}%.4f cumulative ${recall(cumul())}%.4f")
    spark.stop()
  }
}
