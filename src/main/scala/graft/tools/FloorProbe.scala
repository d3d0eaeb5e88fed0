package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Decomposes the H2 serving floor (VERDICT r15 §next-5): the per-query
  * cost of the pre-planned dense-scan batch collect read a flat
  * ~2.5 ms from 10k to 1M docs. The probe's first finding is that the
  * flatness was an artifact: re-collecting ONE pre-planned Dataset
  * reuses its materialized shuffle stages (1 job / 1 stage / 1 task —
  * the result-stage merge; the corpus scan never re-runs), so the
  * pre-r16 H2 query passes measured merge-only cost. `reuse/` rows
  * keep that exhibit; `fresh/` rows build a NEW Dataset per timed
  * collect (new shuffle IDs → the scan genuinely re-executes, like
  * the ref re-dotting its memmap every query) with planning forced
  * untimed, and sweep the levers:
  *
  *   sp1       — shuffle.partitions = 1: post-agg data is ≤ nq·k rows,
  *               so every post-shuffle stage collapses to ONE task and
  *               RangePartitioner(1) skips its per-collect sampling job
  *   aqeoff    — adaptive off (isolates AQE re-planning bookkeeping)
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

    val qRows = sizes.map { n =>
      val q = Encoders.denseQueries(gat(n), H2Run.BatchQ, H2Run.Dim)
      n -> (q.collect().sortBy(_.getLong(0)), q.schema)
    }.toMap

    // CRITICAL conf-window discipline: SQLConf is read when the LAZY
    // executedPlan materializes, not when the Dataset is built — a
    // conf restored before the first action silently never applies
    // (the first FloorProbe draft had exactly that bug: all variants
    // ran identical 1-job/1-stage plans). Everything up to the warm
    // collect happens INSIDE withConf.
    def withConf[T](conf: Map[String, String])(f: => T): T = {
      val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    def freshBatch(n: Long): DataFrame = {
      val (rows, schema) = qRows(n)
      val qb = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), schema)
      val ds = Encoders.hashingSearchDenseOver(gat(n), qb, H2Run.K, H2Run.NQ)
      ds.queryExecution.executedPlan // untimed: analysis+optimize+plan
      ds
    }

    // reuse mode: re-collect ONE pre-planned Dataset — materialized
    // shuffle stages are reused (ShuffleExchangeExec caches its RDD;
    // AQE caches final query stages), so the timed job is the result
    // stage only and the SCAN NEVER RE-RUNS. This is what the
    // pre-r16 H2 query passes measured — kept here as the exhibit.
    def probeReuse(tag: String, n: Long, conf: Map[String, String]): Unit =
      withConf(conf) {
        val ds = freshBatch(n)
        ds.collect(); ds.collect()
        val (j0, s0, t0) = counts.snap()
        val p50 = timedLoop(21)(ds.collect())
        val (j1, s1, t1) = counts.snap()
        println(f"[floor] reuse/$tag%-10s n=$n%-8d p50=${p50}%7.3f ms/batch " +
          f"perq=${p50 / H2Run.BatchQ}%6.3f ms " +
          f"jobs=${(j1 - j0) / 21.0}%4.1f stages=${(s1 - s0) / 21.0}%4.1f " +
          f"tasks=${(t1 - t0) / 21.0}%5.1f")
      }

    // fresh mode: a NEW Dataset per timed collect (same logical plan,
    // new shuffle IDs) — the scan genuinely re-executes, which is the
    // honest serving measurement (the ref re-dots the whole memmap
    // every query). Planning is forced untimed (the serving engine's
    // per-template cost); codegen is janino-cache-warm after the first.
    def probeFresh(tag: String, n: Long, conf: Map[String, String]): Unit =
      withConf(conf) {
        freshBatch(n).collect() // warm codegen + file index untimed
        // plan cost alone (analysis + optimize + physical plan of the
        // fresh template — the engine's per-request dispatch cost,
        // kept OUT of the timed collect like the ref's pre-t0 prep)
        val planMs = timedLoop(11) { freshBatch(n) }
        val (j0, s0, t0) = counts.snap()
        val walls = (1 to 21).map { _ =>
          val ds = freshBatch(n) // untimed prep
          val w0 = System.nanoTime()
          ds.collect()
          (System.nanoTime() - w0) / 1e6
        }
        val p50 = walls.sorted.apply(walls.size / 2)
        val (j1, s1, t1) = counts.snap()
        println(f"[floor] fresh/$tag%-10s n=$n%-8d p50=${p50}%7.3f ms/batch " +
          f"perq=${p50 / H2Run.BatchQ}%6.3f ms plan=${planMs}%6.1f ms " +
          f"jobs=${(j1 - j0) / 21.0}%4.1f stages=${(s1 - s0) / 21.0}%4.1f " +
          f"tasks=${(t1 - t0) / 21.0}%5.1f")
      }

    val sp1aqe = Map("spark.sql.shuffle.partitions" -> "1",
      "spark.sql.adaptive.enabled" -> "false")
    for (n <- sizes) {
      probeReuse("base", n, Map.empty)
      probeFresh("base", n, Map.empty)
      probeFresh("sp1", n, Map("spark.sql.shuffle.partitions" -> "1"))
      probeFresh("aqeoff", n, Map("spark.sql.adaptive.enabled" -> "false"))
      probeFresh("sp1+aqeoff", n, sp1aqe)
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
