package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only: compare the physical-plan scan counts of the report-layer
  * wrappers against their underlying experiment grids. */
object ReportProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def stats(name: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
      mk().count() // warm
      val t0 = System.nanoTime()
      val df = mk()
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      mk().collect()
      val t3 = System.nanoTime()
      val s = df.queryExecution.executedPlan.toString
      println(f"$name%-22s construct=${(t1 - t0) / 1e9}%6.2f s exec=${(t2 - t1) / 1e9}%6.2f s " +
        f"collect=${(t3 - t2) / 1e9}%6.2f s " +
        f"scans=${"FileScan parquet".r.findAllIn(s).length}%3d " +
        f"shuffles=${"Exchange hashpartitioning".r.findAllIn(s).length}%3d " +
        f"windows=${"Window".r.findAllIn(s).length}%3d")
    }
    stats("sizes", () => graft.operators.Experiment.sizes(spark, dir))
    stats("report_model_by_size", () => graft.operators.Report.modelBySize(spark, dir))
    stats("matrix", () => graft.operators.Experiment.matrix(spark, dir))
    stats("report_mode_lift", () => graft.operators.Report.modeLift(spark, dir))
    spark.stop()
  }
}
