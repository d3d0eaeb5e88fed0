package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (round 12): file layout of the gathered serving artifact
  * per corpus size, and per-batch query walls against it — decomposes
  * the small-corpus H2 floor (task count vs scan vs schedule).
  * Args: <h2devBase> (d10000/d100000/d1000000 inside). */
object GatProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Encoders
    val base = graft.Cleanup.onExit(
      java.nio.file.Files.createTempDirectory("graft-gatprobe"))
    for (n <- Seq("d10000", "d100000", "d1000000")) {
      val out = s"$base/$n"
      val t0 = System.nanoTime()
      Encoders.writeGatheredDirect(spark, s"${args(0)}/$n", out, 512)
      val enc = (System.nanoTime() - t0) / 1e9
      val files = new java.io.File(out).listFiles
        .filter(_.getName.endsWith(".parquet"))
      println(f"GAT $n enc=$enc%.2f files=${files.length} mb=${files.map(_.length).sum / 1e6}%.1f")
      val gat = spark.read.parquet(out)
      val q = Encoders.denseQueries(gat, 30, 512)
      val rows = q.collect().sortBy(_.getLong(0))
      val ds = {
        val qb = spark.createDataFrame(
          java.util.Arrays.asList(rows.take(10): _*), q.schema)
        Encoders.hashingSearchDenseOver(gat, qb, 10, 30)
      }
      ds.collect() // plan+codegen+broadcast
      for (i <- 1 to 5) {
        val t1 = System.nanoTime(); ds.collect()
        println(f"GAT $n pass$i ${(System.nanoTime() - t1) / 1e6}%.1f ms")
      }
    }
    spark.stop()
  }
}
