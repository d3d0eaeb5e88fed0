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
  *    auto_run_tests.py:52-108 → ours: the hashing-TF postings index
  *    at dim 512 PLUS its gathered per-doc serving layout,
  *    [[graft.operators.Encoders.writeHashingIndex]] +
  *    [[graft.operators.Encoders.writeGatheredIndex]] — both artifacts
  *    are the encode leg's durable output, as the memmap is the ref's),
  *    and
  *  - the 30-query top-10 retrieval against that prebuilt artifact
  *    (ref: measure_offline_query_latency scans ONLY the memmap,
  *    :109-160, sample_queries=30 → ours: ONE 30-query join-free dense
  *    scan of the gathered parquet,
  *    [[graft.operators.Encoders.hashingSearchDenseOver]]; the parent
  *    reports wall/30 as the per-query figure).
  *
  * The query vectors are prepared OUTSIDE the timed region, exactly as
  * the ref does (auto_run_tests.py:172-194: `q_emb` is in hand before
  * `t0 = time.time()`): [[graft.operators.Encoders.denseQueriesLocal]]
  * collects the 30 dense query rows once per size, so each timed pass
  * broadcasts 30 local rows and scans ONLY the gathered artifact —
  * no Spark block-manager caching anywhere (the r10 MEMORY_AND_DISK
  * persist collapsed to disk-deser speed under the driver's memory
  * pressure: 0.70× → 8.1× at 1 M docs; a parquet scan is page-cache
  * fast and storage-memory independent).
  *
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
    // registered for JVM-exit sweep (not an inline delete at the end:
    // a thrown bench leg must not leak the 1 M-doc scratch index)
    val idxBase = graft.Cleanup.onExit(
      java.nio.file.Files.createTempDirectory("graft-h2idx"))
    def idxPath(dir: String): String =
      s"$idxBase/${new java.io.File(dir).getName}"
    def gatPath(dir: String): String = s"${idxPath(dir)}-gathered"
    // encode ENDS with the corpus durable on disk in BOTH layouts
    // (postings + gathered) — the ref's encode leg ends with the
    // memmap written; the timed query loop reads ONLY that artifact
    // and never re-encodes.
    def enc(dir: String): Double = timed {
      graft.operators.Encoders.writeHashingIndex(spark, dir, idxPath(dir), Dim)
      graft.operators.Encoders.writeGatheredIndex(spark, idxPath(dir), gatPath(dir))
    }
    // query prep (the ref's pre-t0 q_emb encode): 30 local dense rows
    // per size, collected once from the first build — enc() rewrites
    // the same deterministic content, so re-collection is pointless
    val qLocal = scala.collection.mutable.Map[String, org.apache.spark.sql.DataFrame]()
    def q30(dir: String): Double = {
      val q = qLocal.getOrElseUpdate(dir,
        graft.operators.Encoders.denseQueriesLocal(
          spark.read.parquet(gatPath(dir)), NQ, Dim))
      timed(graft.operators.Encoders.hashingSearchDenseOver(
        spark.read.parquet(gatPath(dir)), q, K, NQ).count())
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
