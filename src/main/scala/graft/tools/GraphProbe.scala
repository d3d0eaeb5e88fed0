package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev probe for KnnGraph convergence: per-round recall, and for the
  * missed true edges, whether the endpoint was even reachable (2-hop)
  * in the final graph — separates "needs more rounds" from
  * "structurally unreachable" from "scoring/merge bug". */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_PROBE_AQE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Knn, KnnGraph}
    // timing mode: wall-clock build + search at one dir, no exact oracle
    if (args.length >= 2 && args(1) == "time") {
      val buildIters = if (args.length >= 3) args(2).toInt else KnnGraph.Iters
      val hops = if (args.length >= 4) args(3).toInt else KnnGraph.Hops
      val beam = if (args.length >= 5) args(4).toInt else KnnGraph.Beam
      val docs0 = Knn.docSet(spark, dir)
        .select(col("doc_id").as("id"), col("doc_vec").as("vec"))
      println(s"[probe] nodes=${docs0.count()} iters=$buildIters hops=$hops beam=$beam")
      for (pass <- 1 to 2) {
        var t0 = System.nanoTime()
        val g = KnnGraph.buildGraph(docs0, iters = buildIters)
        println(f"[probe] pass$pass build ${(System.nanoTime() - t0) / 1e9}%.2f s (edges=${g.count()})")
        t0 = System.nanoTime()
        val res = KnnGraph.graphSearch(
            Knn.querySet(spark, dir).select(col("q_id"), col("q_vec")),
            docs0, g, Knn.K, beam = beam, hops = hops)
          .select(col("q_id"), col("id").as("doc_id"))
        val searchSec = (System.nanoTime() - t0) / 1e9
        val exact = Knn.cosineTopK(spark, dir, Knn.K).select(col("q_id"), col("doc_id"))
        val hits = res.join(exact, Seq("q_id", "doc_id")).count()
        println(f"[probe] pass$pass search $searchSec%.2f s recall@${Knn.K}=${hits.toDouble / exact.count()}%.3f")
      }
      spark.stop(); return
    }
    // jobs mode: count Spark jobs/stages/tasks and their wall during
    // ONE warm search — separates scheduling floor from real work
    if (args.length >= 2 && args(1) == "jobs") {
      val docs0 = Knn.docSet(spark, dir)
        .select(col("doc_id").as("id"), col("doc_vec").as("vec"))
      val g = KnnGraph.buildGraph(docs0).localCheckpoint(true)
      g.count()
      val q = Knn.querySet(spark, dir).select(col("q_id"), col("q_vec"))
      def runOnce(): Unit =
        KnnGraph.graphSearch(q, docs0, g, Knn.K).count()
      runOnce() // warm codegen
      import org.apache.spark.scheduler._
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val stages = new java.util.concurrent.atomic.AtomicInteger
      val tasks = new java.util.concurrent.atomic.AtomicInteger
      val jobNanos = new java.util.concurrent.atomic.AtomicLong
      val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
      val l = new SparkListener {
        override def onJobStart(e: SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); starts(e.jobId) = System.nanoTime()
        }
        override def onJobEnd(e: SparkListenerJobEnd): Unit =
          starts.remove(e.jobId).foreach(t0 =>
            jobNanos.addAndGet(System.nanoTime() - t0))
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(e.stageInfo.numTasks)
        }
      }
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      runOnce()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // let the listener bus drain
      println(f"[probe] warm search wall $wall%.2f s: jobs=${jobs.get} " +
        f"stages=${stages.get} tasks=${tasks.get} jobWall=${jobNanos.get / 1e9}%.2f s")
      // representative ad-hoc hop join: does the edge side exchange?
      val fr = spark.range(100).select(col("id"))
      val hopPlan = fr.join(g.withColumnRenamed("src", "id"), Seq("id"))
        .queryExecution.executedPlan.toString
      println("[probe] ad-hoc hop join: exchanges=" +
        "Exchange hashpartitioning".r.findAllIn(hopPlan).length +
        " bcast=" + "BroadcastExchange".r.findAllIn(hopPlan).length)
      println(hopPlan.linesIterator.take(12).map(_.take(120)).mkString("\n"))
      // same counters for the persisted serving path (searchIndexed)
      Seq("edges", "nodes", "meta", "bands").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS gprobe_$s"))
      KnnGraph.writeGraphIndex(spark, dir, name = "gprobe")
      KnnGraph.searchIndexed(spark, dir, "gprobe").count() // warm
      jobs.set(0); stages.set(0); tasks.set(0); jobNanos.set(0)
      val t1 = System.nanoTime()
      KnnGraph.searchIndexed(spark, dir, "gprobe").count()
      val wallI = (System.nanoTime() - t1) / 1e9
      Thread.sleep(1000)
      println(f"[probe] warm INDEXED search wall $wallI%.2f s: jobs=${jobs.get} " +
        f"stages=${stages.get} tasks=${tasks.get} jobWall=${jobNanos.get / 1e9}%.2f s")
      Seq("edges", "nodes", "meta", "bands").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS gprobe_$s"))
      spark.stop(); return
    }
    // sweep mode: build ONCE, then measure recall for a list of
    // hops:beam configs (args like 8:256 8:512 12:512)
    if (args.length >= 2 && args(1) == "sweep") {
      val docs0 = Knn.docSet(spark, dir)
        .select(col("doc_id").as("id"), col("doc_vec").as("vec"))
      val t0 = System.nanoTime()
      val g = KnnGraph.buildGraph(docs0).localCheckpoint(true)
      println(f"[probe] build ${(System.nanoTime() - t0) / 1e9}%.2f s (edges=${g.count()})")
      val exact = Knn.cosineTopK(spark, dir, Knn.K)
        .select(col("q_id"), col("doc_id")).cache()
      val total = exact.count()
      for (cfg <- args.drop(2)) {
        val Array(h, b) = cfg.split(":").map(_.toInt)
        val t1 = System.nanoTime()
        val res = KnnGraph.graphSearch(
            Knn.querySet(spark, dir).select(col("q_id"), col("q_vec")),
            docs0, g, Knn.K, beam = b, hops = h)
          .select(col("q_id"), col("id").as("doc_id"))
        val hits = res.join(exact, Seq("q_id", "doc_id")).count()
        println(f"[probe] hops=$h beam=$b search ${(System.nanoTime() - t1) / 1e9}%.2f s recall@${Knn.K}=${hits.toDouble / total}%.3f")
      }
      spark.stop(); return
    }
    // sweep2 mode: the round-13 recall-lever sweep — configs are
    // alpha:divRounds:seedGroup:hops:beam (beam -1 = auto); builds are
    // cached per (alpha, divRounds) so search-side levers reuse them
    if (args.length >= 2 && args(1) == "sweep2") {
      val docs0 = Knn.docSet(spark, dir)
        .select(col("doc_id").as("id"), col("doc_vec").as("vec"))
      val n = docs0.count()
      val exact = Knn.cosineTopK(spark, dir, Knn.K)
        .select(col("q_id"), col("doc_id")).cache()
      val total = exact.count()
      println(s"[probe] nodes=$n exact_rows=$total")
      val builds = scala.collection.mutable.Map[(Double, Int), org.apache.spark.sql.DataFrame]()
      for (cfg <- args.drop(2)) {
        val p = cfg.split(":")
        val (al, dr, sg, h, b) =
          (p(0).toDouble, p(1).toInt, p(2).toInt, p(3).toInt, p(4).toInt)
        val g = builds.getOrElseUpdate((al, dr), {
          val t0 = System.nanoTime()
          val built = KnnGraph.buildGraph(docs0, alpha = al, diversifyRounds = dr)
            .localCheckpoint(true)
          println(f"[probe] build alpha=$al dr=$dr ${(System.nanoTime() - t0) / 1e9}%.1f s")
          built
        })
        val t1 = System.nanoTime()
        val res = KnnGraph.graphSearch(
            Knn.querySet(spark, dir).select(col("q_id"), col("q_vec")),
            docs0, g, Knn.K, beam = b, seedGroup = sg, hops = h, nHint = n)
          .select(col("q_id"), col("id").as("doc_id"))
        val hits = res.join(exact, Seq("q_id", "doc_id")).count()
        println(f"[probe] cfg=$cfg search ${(System.nanoTime() - t1) / 1e9}%.1f s recall@${Knn.K}=${hits.toDouble / total}%.3f")
      }
      spark.stop(); return
    }
    // diag mode: at one dir, classify the misses — within 1 undirected
    // hop of a FOUND doc (final-coverage problem: the walk was there,
    // the beam didn't keep/expand it) vs farther (navigation problem:
    // the walk never reached the region)
    if (args.length >= 2 && args(1) == "diag") {
      val hops = if (args.length >= 3) args(2).toInt else KnnGraph.Hops
      val beam = if (args.length >= 4) args(3).toInt else KnnGraph.Beam
      val docs0 = Knn.docSet(spark, dir)
        .select(col("doc_id").as("id"), col("doc_vec").as("vec"))
      val g = KnnGraph.buildGraph(docs0).cache()
      val res = KnnGraph.graphSearch(
          Knn.querySet(spark, dir).select(col("q_id"), col("q_vec")),
          docs0, g, Knn.K, beam = beam, hops = hops)
        .select(col("q_id"), col("id").as("doc_id"), col("score")).cache()
      val exact = Knn.cosineTopK(spark, dir, Knn.K)
        .select(col("q_id"), col("doc_id"), col("score")).cache()
      val total = exact.count()
      val found = res.select("q_id", "doc_id")
        .join(exact.select("q_id", "doc_id"), Seq("q_id", "doc_id")).cache()
      println(f"[probe] recall@${Knn.K}=${found.count().toDouble / total}%.3f")
      val missed = exact.select("q_id", "doc_id")
        .exceptAll(res.select("q_id", "doc_id")).cache()
      val und = g.select("src", "dst")
        .union(g.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      val near1 = missed
        .join(res.select(col("q_id"), col("doc_id").as("src")), Seq("q_id"))
        .join(und, Seq("src"))
        .filter(col("dst") === col("doc_id"))
        .select("q_id", "doc_id").distinct().count()
      println(s"[probe] missed=${missed.count()} of $total; within 1 undirected hop of a found doc: $near1")
      // score profile: how bad are the substitutes the search returned?
      val gap = res.groupBy("q_id").agg(min("score").as("f_min"))
        .join(exact.groupBy("q_id").agg(min("score").as("e_min")), Seq("q_id"))
        .select(avg(col("e_min") - col("f_min")).as("mean_gap"),
          sum(when(col("f_min") >= col("e_min") - 1e-9, 1).otherwise(0)).as("q_at_floor"))
        .head
      println(f"[probe] mean(exact10th - found10th)=${gap.getDouble(0)}%.4f; queries already at exact floor: ${gap.getLong(1)}")
      spark.stop(); return
    }
    val maxIt = if (args.length >= 2) args(1).toInt else 4
    val docs = Knn.docSet(spark, dir)
      .select(col("doc_id").as("id"), col("doc_vec").as("vec"))
    val a = docs.select(col("id").as("src"), col("vec").as("va"))
    val b = docs.select(col("id").as("dst"), col("vec").as("vb"))
    val exact = Knn.topKPerQuery(
      a.crossJoin(b).filter(col("src") =!= col("dst"))
        .select(col("src").as("q_id"), col("dst").as("doc_id"),
          graft.functions.cosine(col("va"), col("vb")).as("score")),
      KnnGraph.K)
      .select(col("q_id").as("src"), col("doc_id").as("dst"), col("score"))
      .cache()
    val total = exact.count()
    def recallOf(g: org.apache.spark.sql.DataFrame): Double =
      g.select("src", "dst")
        .join(exact.select("src", "dst"), Seq("src", "dst")).count().toDouble / total
    for (it <- 0 to maxIt) {
      val g = KnnGraph.buildGraph(docs, iters = it)
      println(f"[probe] iters=$it recall=${recallOf(g)}%.4f")
    }
    val g = KnnGraph.buildGraph(docs).cache()
    // 2-hop closure of the final graph (undirected)
    val und = g.select("src", "dst").union(
      g.select(col("dst").as("src"), col("src").as("dst"))).distinct().cache()
    val twoHop = und.union(
        und.as("x").join(und.as("y"), col("x.dst") === col("y.src"))
          .select(col("x.src").as("src"), col("y.dst").as("dst")))
      .distinct()
    val missed = exact.select("src", "dst")
      .exceptAll(g.select("src", "dst")).cache()
    val reachable = missed.join(twoHop, Seq("src", "dst")).count()
    println(s"[probe] missed=${missed.count()} of $total; of those within 2 undirected hops: $reachable")
    // per-node score floor: found 8th-best vs exact 8th-best
    val found8 = g.groupBy("src").agg(min("score").as("f8"))
    val exact8 = exact.groupBy("src").agg(min("score").as("e8"))
    val cmp = found8.join(exact8, Seq("src"))
      .select(avg(col("f8") - col("e8")).as("mean_gap"),
        sum(when(col("f8") < col("e8") - 1e-9, 1).otherwise(0)).as("nodes_below"))
      .head
    println(s"[probe] mean(found8 - exact8)=${cmp.getDouble(0)}; nodes with found8 < exact8: ${cmp.getLong(1)}")
    spark.stop()
  }
}
