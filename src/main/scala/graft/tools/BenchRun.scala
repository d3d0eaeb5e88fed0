package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query bench timings, executed in a FRESH JVM spawned by
  * [[graft.Bench]] (args: sfDir name1 name2 ...).
  *
  * Why a child process: BENCH_r04's in-process 103-query × 2-pass
  * marathon decayed its host JVM so badly the recorded numbers were
  * physically impossible — warm total 798 s over a 396 s cold total,
  * with identical plans reading 4.5 s cold / 77 s "warm". The same
  * GC/metaspace/codegen-cache churn that forced the scale section into
  * [[ScaleRun]] children invalidates the headline passes too; batching
  * the inventory across fresh JVMs bounds the churn so the numbers
  * measure plans, not host decay.
  *
  * SELF-ADJUDICATION (r14, VERDICT r13 §next-1; sharpened r15,
  * VERDICT r14 §next-1): every timed run is BRACKETED by
  * [[H2Run.sample]] — the fixed CPU spin plus the fixed IO probe
  * (write+fsync+direct-read), the two-component sentinel whose
  * inflation measures host descheduling and IO contention
  * respectively. Three samples bracket the two timed runs (before
  * cold, between, after warm), so each run is classified on the
  * component-wise max of its surrounding pair — the r14 defect was a
  * single pre-run sample certifying work it didn't cover, and a
  * CPU-only sentinel blind to the IO contention that made three r14
  * artifacts disagree 20-40% while all self-certifying quiet. The
  * parent classifies each timing against the run's sentinel floors
  * and retries loaded queries in fresh children (bounded), so the
  * artifact itself records whether a slow reading was the engine or
  * the host.
  *
  * PAGE-CACHE PRE-TOUCH (VERDICT r15 §next-1): 9 of the 11
  * committed-vs-driver r15 movers were persisted-index readers —
  * the signature of cache-warm vs cache-cold input artifacts, a
  * host-state component the contention sentinels cannot see (both
  * runs were genuinely quiet; they differed in what the page cache
  * already held). The protocol now PINS cache state: the sf inputs
  * are sequentially read once at child start, and after each query's
  * cold run (which builds any memoized scratch index) the sf inputs
  * PLUS every registered scratch root are read again — twice — so
  * the timed warm pass always starts fully cache-warm, on every
  * host. The two touch walls ride in the protocol line as a cache
  * MARKER: touch1 >> touch2 means the first read did real disk work
  * (the cache was cold before the touch — exactly the state that
  * made the r15 artifacts diverge), so any residual mover carries
  * the evidence to explain itself.
  *
  * Protocol: one `BENCHQ <name> <cold_s> <warm_s> <s1_cpu> <s1_io>
  * <s2_cpu> <s2_io> <s3_cpu> <s3_io> <touch1_ms> <touch2_ms>` line
  * per query on stdout — line-based so the parent needs no JSON
  * parsing and a mid-batch crash still yields the completed prefix.
  * Cold = first run (pays the query's one-time whole-stage-codegen),
  * warm = second run (steady state); s1/s2/s3 are the bracketing
  * sentinel samples in ms (cold is covered by s1+s2, warm by s2+s3);
  * touch1/touch2 are the pre-warm cache-touch walls above. A
  * one-time engine warmup runs first so the first query's cold time
  * measures its plan, not Spark/parquet init.
  */
object BenchRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfRoot = java.nio.file.Paths.get(sfDir)
    // child-start touch: the engine warmup and every cold run read
    // the sf inputs from a warm cache regardless of host history
    H2Run.preTouch(Seq(sfRoot))
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }
    def timed(name: String): Double = {
      val t0 = System.nanoTime()
      try { graft.SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val s1 = H2Run.sample()
      val cold = timed(n)
      // pre-touch AFTER cold (which built any memoized scratch index)
      // and BEFORE the warm pass's bracketing sentinel: the warm run
      // starts with sf inputs + scratch artifacts fully cache-warm,
      // and the touch walls record what state the host was in
      val roots = sfRoot +: graft.Cleanup.registeredPaths
      val touch1 = H2Run.preTouch(roots)
      val touch2 = H2Run.preTouch(roots)
      val s2 = H2Run.sample()
      val warm = timed(n)
      val s3 = H2Run.sample()
      println(s"BENCHQ $n $cold $warm ${s1.cpu} ${s1.io} " +
        s"${s2.cpu} ${s2.io} ${s3.cpu} ${s3.io} $touch1 $touch2")
      System.out.flush()
    }
    spark.stop()
  }
}
