package graft.tools

import org.apache.spark.sql.SparkSession

/** Reference-anchored H2 measurement, executed in a FRESH JVM spawned
  * by [[graft.Bench]] (args: d10k d100k d1m — pre-generated DataGen
  * corpora of 10k / 100k / 1M documents, the ref H2 grid's sizes,
  * auto_run_tests.py:623).
  *
  * Measures, per size, the two legs the ref's local H2 run records in
  * auto_test_H2_local_summary_*.csv (experiments/results/):
  *  - encode wall-time over the full corpus, ending durable on disk
  *    (ref: encode_total_s — encode_to_memmap WRITES the memmap,
  *    auto_run_tests.py:52-108 → ours: hashing-TF postings index at
  *    dim 512, [[graft.operators.Encoders.writeHashingIndex]]), and
  *  - the 30-query top-10 retrieval against that prebuilt artifact
  *    (ref: measure_offline_query_latency scans ONLY the memmap,
  *    :109-160, sample_queries=30 → ours: ONE 30-query
  *    inverted-index plan over the stored postings,
  *    [[graft.operators.Encoders.hashingSearchIndexed]]; the parent
  *    reports wall/30 as the per-query figure).
  * Line protocol: `H2Q <n_docs> <encode_sec> <q30_sec>` per size,
  * min-of-2 after a warm-up pass, interleaved across sizes like
  * [[ScaleRun.measure]] so residual JVM drift doesn't read as scaling.
  */
object H2Run {
  val Dim = 512
  val NQ = 30
  val K = 10

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // one arg = standalone mode: generate the three corpora under it
    // (dev iteration); three args = pre-generated dirs (Bench's child)
    val dirs =
      if (args.length == 1)
        Seq(10000L, 100000L, 1000000L).map { n =>
          val d = s"${args(0)}/d$n"
          if (!new java.io.File(s"$d/documents.parquet").exists())
            graft.sources.DataGen.writeDataset(spark, d, n, 64L)
          n -> d
        }
      else Seq(10000L -> args(0), 100000L -> args(1), 1000000L -> args(2))
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // The ref's two legs, faithfully: encode ENDS with the corpus
    // durable on disk (encode_to_memmap writes the memmap,
    // auto_run_tests.py:52-108), and the timed query loop reads ONLY
    // that artifact (measure_offline_query_latency, :109-160) — it
    // never re-encodes. Same here: enc() builds the postings index,
    // q30() searches it.
    // registered for JVM-exit sweep (not an inline delete at the end:
    // a thrown bench leg must not leak the 1 M-doc scratch index)
    val idxBase = graft.Cleanup.onExit(
      java.nio.file.Files.createTempDirectory("graft-h2idx"))
    def idxPath(dir: String): String =
      s"$idxBase/${new java.io.File(dir).getName}"
    def enc(dir: String): Double =
      timed(graft.operators.Encoders.writeHashingIndex(spark, dir, idxPath(dir), Dim))
    // The gathered per-doc layout persists in Spark storage memory
    // across query passes — the ref's measured loop opens its memmap
    // ONCE and every query re-scans it page-cache-warm
    // (auto_run_tests.py:150-160); gather+persist is the same load
    // step. The first q30 pass pays the cache build, min-of-2 measures
    // the warm serving shape (the ref's steady state), and the scoring
    // plan is the join-free dense scan (hashingSearchDense) — the same
    // chunked mmap.dot(q) shape the ref times, bit-identical to the
    // sparse postings join. */
    val idxFrames = scala.collection.mutable.Map[String, org.apache.spark.sql.DataFrame]()
    def q30(dir: String): Double = {
      val f = idxFrames.getOrElseUpdate(dir,
        graft.operators.Encoders.gatherPostings(spark.read.parquet(idxPath(dir)))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      timed(graft.operators.Encoders.hashingSearchDense(f, K, NQ, Dim).count())
    }
    // warm-up pass on the smallest corpus only (parquet/codegen init)
    enc(dirs.head._2); q30(dirs.head._2)
    val m = scala.collection.mutable.Map[Long, (Double, Double)]()
    for (_ <- 0 until 2; (n, d) <- dirs) {
      val e = enc(d); val q = q30(d)
      val cur = m.getOrElse(n, (Double.MaxValue, Double.MaxValue))
      m(n) = (math.min(cur._1, e), math.min(cur._2, q))
    }
    dirs.foreach { case (n, _) =>
      val (e, q) = m(n)
      println(s"H2Q $n $e $q")
      System.out.flush()
    }
    spark.stop()
  }
}
