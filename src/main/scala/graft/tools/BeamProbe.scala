package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 12): auto-beam vs fixed-beam recall on a clustered
  * generated corpus sized so ⌈√N⌉ exceeds the minimum beam — picks the
  * constants the CI recall pin (KnnGraphSpec) freezes.
  * Args: [nClusters perCluster dim noise seed]. */
object BeamProbe {
  def main(args: Array[String]): Unit = {
    val nClusters = if (args.length > 0) args(0).toInt else 40
    val perCluster = if (args.length > 1) args(1).toInt else 200
    val dim = if (args.length > 2) args(2).toInt else 32
    val noise = if (args.length > 3) args(3).toDouble else 0.15
    val seed = if (args.length > 4) args(4).toInt else 7
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark; import s.implicits._
    import graft.operators.{Knn, KnnGraph}
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian()))
    val n = nClusters * perCluster
    val rows = (0 until n).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, c.map(x => (x + noise * rnd.nextGaussian()).toFloat))
    }
    val nodes = rows.toDF("id", "vec").repartition(4).cache()
    nodes.count()
    val queries = (0 until 30).map { q =>
      val c = centers(rnd.nextInt(nClusters))
      (100000L + q, c.map(x => (x + noise * rnd.nextGaussian()).toFloat))
    }.toDF("q_id", "q_vec")
    var t0 = System.nanoTime()
    val edges = KnnGraph.buildGraph(nodes).localCheckpoint(true)
    println(f"BEAM n=$n build=${(System.nanoTime() - t0) / 1e9}%.1f s")
    val exact = Knn.topKPerQuery(
      queries.crossJoin(nodes)
        .select(col("q_id"), col("id").as("doc_id"),
          graft.functions.cosine(col("q_vec"), col("vec")).as("score")),
      Knn.K).select("q_id", "doc_id").cache()
    val total = exact.count()
    for (b <- Seq(16, KnnGraph.Beam, KnnGraph.AutoBeam, 256)) {
      t0 = System.nanoTime()
      val res = KnnGraph.graphSearch(queries, nodes, edges, Knn.K, beam = b)
        .select(col("q_id"), col("id").as("doc_id"))
      val hits = res.join(exact, Seq("q_id", "doc_id")).count()
      println(f"BEAM beam=$b recall=${hits.toDouble / total}%.3f t=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
