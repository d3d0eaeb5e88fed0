package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (round 12): per-leg decomposition of Experiment.sizes —
  * is report_model_by_size leg-count × per-leg floor, or one dominant
  * leg? Args: [sfDir]. */
object SizesProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Encoders, Experiment, Report}
    def t(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.collect() // warm
      val t0 = System.nanoTime(); val df = mk
      val t1 = System.nanoTime(); df.collect()
      val t2 = System.nanoTime()
      println(f"SIZES $tag%-28s construct=${(t1 - t0) / 1e9}%5.2f exec=${(t2 - t1) / 1e9}%5.2f")
    }
    for (c <- Experiment.SizeCaps) {
      t(s"hash_cap$c")(Experiment.summaryLeg(spark, dir, "hashing_tf", Some(c)))
      t(s"tfidf_cap$c")(Experiment.summaryLeg(spark, dir, "tfidf", Some(c)))
    }
    t("sizes_full")(Experiment.sizes(spark, dir))
    t("model_by_size")(Report.modelBySize(spark, dir))
    spark.stop()
  }
}
