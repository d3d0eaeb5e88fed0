package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only: stage-level decomposition of dedup_cluster_labels' hot
  * stage (the 32-task / 23.9 s-CPU stage JobProbe surfaced). Times
  * each phase of connectedComponents(minhashLsh(...)) separately and
  * reports per-phase task time so the blowup is attributable. */
object CcProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        taskMs.addAndGet(e.stageInfo.taskMetrics.executorRunTime)
    })
    def time(name: String)(f: => Any): Unit = {
      taskMs.set(0)
      val t0 = System.nanoTime()
      val r = f
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[cc2] $name%-34s wall=$w%7.3f s taskTime=${taskMs.get / 1000.0}%8.3f s  ($r)")
      System.out.flush()
    }
    // warm engine + codegen
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }
    val pairs = Dedup.minhashLsh(spark, dir).select("id_a", "id_b")
    time("minhashLsh pairs count")(pairs.count())
    time("minhashLsh pairs count again")(pairs.count())
    val edges = pairs.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    time("edges count (no persist)")(edges.count())
    val ep = edges.persist()
    time("edges persist+count (cache mat)")(ep.count())
    time("edges cached count")(ep.count())
    val labels = ep.groupBy("src").agg(min(col("dst")).as("m"))
      .select(col("src").as("node"), least(col("src"), col("m")).as("label"))
    time("init labels from cached")(labels.localCheckpoint())
    ep.unpersist()
    val ec = edges.localCheckpoint(true)
    time("edges localCheckpoint variant")(ec.count())
    val labels2 = ec.groupBy("src").agg(min(col("dst")).as("m"))
      .select(col("src").as("node"), least(col("src"), col("m")).as("label"))
    time("init labels from checkpoint")(labels2.localCheckpoint())
    time("full clusterLabels")(Dedup.clusterLabels(spark, dir).count())
    spark.stop()
  }
}
