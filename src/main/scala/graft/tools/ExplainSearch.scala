package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainSearch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.operators.Encoders.hashingSearch(spark, "/root/testdata/sf0.001")
    df.count()
    val s = df.queryExecution.executedPlan.toString
    println("REUSED: " + "ReusedExchange".r.findAllIn(s).length +
      "  bcast: " + "BroadcastExchange".r.findAllIn(s).length +
      "  shuffles: " + "Exchange hashpartitioning".r.findAllIn(s).length +
      "  scans: " + "FileScan parquet".r.findAllIn(s).length +
      "  windows: " + "Window ".r.findAllIn(s).length)
    println(s.linesIterator.filter(l => l.contains("FileScan") || l.contains("Window") || l.contains("Filter (")).map(_.take(150)).mkString("\n"))
    spark.stop()
  }
}
