package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Decomposes the H2 serving floor (VERDICT r15 §next-5): the per-query
  * cost of the pre-planned dense-scan batch collect was a flat
  * ~2.5 ms from 10k to 1M docs — pure per-job overhead, invariant in
  * corpus size. This probe counts what one warm `collect()` actually
  * schedules (jobs / stages / tasks, via listener) and times the
  * candidate levers one at a time:
  *
  *   base      — H2Run's exact shape (shuffle.partitions = cpus)
  *   sp1       — shuffle.partitions = 1 at plan time: the post-agg
  *               data is ≤ nq·k rows, so every post-shuffle stage
  *               collapses to ONE task, and RangePartitioner(1) skips
  *               its per-collect SAMPLING JOB entirely (partitions<=1
  *               branch) — one conf, two jobs saved, no plan change
  *   nosort    — upper bound: drop the final ORDER BY (how much of the
  *               floor is the sort subtree at all)
  *   aqeoff    — adaptive off at plan time (isolates AQE bookkeeping)
  *   jobfloor  — sc.runJob over a cached 1-partition RDD (the
  *               scheduler's irreducible per-job cost)
  *   localfloor— LocalTableScan executeCollect (no job at all)
  *
  * args: [baseDir] (default /tmp/graft-floor; 10k + 1M corpora built
  * or reused under it)
  */
object FloorProbe {
  final class Counts extends SparkListener {
    @volatile var jobs = 0L
    @volatile var stages = 0L
    @volatile var tasks = 0L
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages += 1
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks += 1
    def snap(): (Long, Long, Long) = (jobs, stages, tasks)
  }

  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0) else "/tmp/graft-floor"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val counts = new Counts
    spark.sparkContext.addSparkListener(counts)
    import graft.operators.Encoders

    val sizes = Seq(10000L, 1000000L)
    val dirs = sizes.map { n =>
      val d = s"$base/d$n"
      if (!new java.io.File(s"$d/documents.parquet").exists())
        graft.sources.DataGen.writeDataset(spark, d, n, 64L)
      n -> d
    }
    val gat = dirs.map { case (n, d) =>
      val g = s"$base/gat$n"
      if (!new java.io.File(g).exists())
        Encoders.writeGatheredDirect(spark, d, g, H2Run.Dim)
      n -> spark.read.parquet(g)
    }.toMap

    def timedLoop(passes: Int)(f: => Unit): Double = {
      val walls = (1 to passes).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      walls.sorted.apply(passes / 2) // p50 ms
    }

    def planBatch(n: Long, conf: Map[String, String]): DataFrame = {
      val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val q = Encoders.denseQueries(gat(n), H2Run.BatchQ, H2Run.Dim)
        val rows = q.collect().sortBy(_.getLong(0))
        val qb = spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), q.schema)
        Encoders.hashingSearchDenseOver(gat(n), qb, H2Run.K, H2Run.NQ)
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    def probe(tag: String, n: Long, conf: Map[String, String],
              strip: DataFrame => DataFrame = identity): Unit = {
      val ds = strip(planBatch(n, conf))
      ds.collect(); ds.collect() // warm: AQE final plan + shuffle reuse
      val (j0, s0, t0) = counts.snap()
      val p50 = timedLoop(21)(ds.collect())
      val (j1, s1, t1) = counts.snap()
      println(f"[floor] $tag%-10s n=$n%-8d p50=${p50}%7.3f ms/batch " +
        f"perq=${p50 / H2Run.BatchQ}%6.3f ms " +
        f"jobs=${(j1 - j0) / 21.0}%4.1f stages=${(s1 - s0) / 21.0}%4.1f " +
        f"tasks=${(t1 - t0) / 21.0}%5.1f")
    }

    for (n <- sizes) {
      probe("base", n, Map.empty)
      probe("sp1", n, Map("spark.sql.shuffle.partitions" -> "1"))
      probe("aqeoff", n, Map("spark.sql.adaptive.enabled" -> "false"))
      probe("sp1+aqeoff", n, Map("spark.sql.shuffle.partitions" -> "1",
        "spark.sql.adaptive.enabled" -> "false"))
      // upper bound: how much of the floor is the sort subtree — strip
      // the final global sort (NOT a candidate serving shape; the
      // contract includes the ordered output)
      probe("nosort", n, Map.empty,
        df => df.sortWithinPartitions("q_id", "rank"))
    }

    // irreducible scheduler floor: one job over a cached 1-partition RDD
    val rdd = spark.sparkContext.parallelize(Seq(1), 1).cache()
    rdd.count()
    val jf = timedLoop(21)(
      spark.sparkContext.runJob(rdd, (it: Iterator[Int]) => it.size))
    println(f"[floor] jobfloor   1 job, 1 task: $jf%7.3f ms")
    // no-job floor: LocalTableScan executeCollect
    val local = spark.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.LongType))))
    local.collect()
    val lf = timedLoop(21)(local.collect())
    println(f"[floor] localfloor no job:        $lf%7.3f ms")
    spark.stop()
  }
}
