package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scale sanity: run every documents/embeddings/events-backed
  * query of the inventory against a generated corpus 10× the sf0.1
  * size (50k docs / 20k vectors / 1M events) — no oracle, just
  * "completes, returns rows, in bounded time". Catches latent blowups
  * the 10-query bench scale subset misses. Only TPC-H-table queries
  * are skipped (the generated dir has no such tables). */
object GenRun {
  private val SkipPrefixes = Seq(
    "q1_", "q3_", "q_window_topn", "q_distinct_count", "q_semi_anti_join",
    "q_small_qty_revenue", "q_top_supplier")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("graft-genrun")
    val dir = base.toString
    graft.sources.DataGen.writeDataset(spark, dir, 50000L, 20000L,
      nEvents = 1000000L)
    var failed = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (SkipPrefixes.exists(name.startsWith)) ()
      else {
        val t0 = System.nanoTime()
        try {
          val n = fn(spark, dir).count()
          println(f"[genrun] $name%-28s rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        } catch { case e: Throwable =>
          failed += 1
          println(s"[genrun] $name FAILED: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
      }
    }
    import java.nio.file.{Files, Path}
    Files.walk(base).sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(p => Files.deleteIfExists(p))
    println(s"[genrun] done, failures=$failed")
    spark.stop()
  }
}
