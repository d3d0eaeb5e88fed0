package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: materialize DataGen corpora at explicit paths for
  * ad-hoc scale probes (`ScaleRun` / `TimeQuery` take dirs; Bench and
  * GenRun generate their own scratch and delete it — this writes
  * PERSISTENT dirs the caller owns). Args: repeated
  * `dir:nDocs:nVecs:nEvents` groups. */
object GenDirs {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { spec =>
      val Array(dir, nd, nv, ne) = spec.split(":")
      graft.sources.DataGen.writeDataset(spark, dir, nd.toLong, nv.toLong,
        nEvents = ne.toLong)
      println(s"[gendirs] wrote $dir docs=$nd vecs=$nv events=$ne")
    }
    spark.stop()
  }
}
