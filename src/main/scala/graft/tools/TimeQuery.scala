package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: warm min-of-2 wall time for named queries against an
  * arbitrary data dir (args: dir query [query...]). Complements
  * ExpProbe (fixed 1×/10× corpora) for spot timings on the persistent
  * probe corpora or any testdata SF. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQuery <dir> <query> [query...]")
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      def run(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, dir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      run() // warm
      val (ts, ns) = (0 until 2).map(_ => run()).unzip
      println(f"[timeq] $name%-28s t=${ts.min}%7.2f s rows=${ns.head}")
      System.out.flush()
    }
    spark.stop()
  }
}
