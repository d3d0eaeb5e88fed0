package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only probe: text_bigram_lm's executed x10 plan + 3 timed runs —
  * chasing the 3-78 s t10 variance seen across bench runs. */
object BigramProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d10 = "/tmp/graft-expprobe/x10"
    val df = graft.operators.TextAnalysis.bigramLmScore(spark, d10)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      df.count()
      println(f"run$i t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Aggregate") || l.contains("Scan") || l.contains("Broadcast"))
      .mkString("\n"))
    spark.stop()
  }
}
