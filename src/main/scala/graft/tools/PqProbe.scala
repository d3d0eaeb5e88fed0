package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev probe for the PQ recall 2×2 ({seed, trained} × {identity,
  * rotation}) at an arbitrary corpus — the decade-scale evidence
  * behind the verified sf0.01 numbers. Args: dir. Prints mean
  * recall@K and wall per configuration. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Ann, Eval, Knn, Opq}
    println(s"[pq] corpus=${Knn.docSet(spark, dir).count()} dir=$dir")
    def leg(name: String)(search: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val recall = Eval.annRecall(spark, dir, search)
        .agg(avg(col("recall"))).head.getDouble(0)
      println(f"[pq] $name%-14s recall@${Knn.K}=$recall%.4f " +
        f"${(System.nanoTime() - t0) / 1e9}%6.1f s")
    }
    leg("seeds")(Ann.pqSearch(spark, dir))
    leg("opq")(Opq.opqSearch(spark, dir))
    leg("trained")(Ann.pqSearchTrained(spark, dir))
    leg("opq_trained")(Opq.opqTrainedSearch(spark, dir))
    // fifth cell (r15): one non-parametric rotation↔codebook
    // alternation (Ge et al. Alg. 1) on top of opq_trained — print
    // how far the Procrustes step moved the rotation, then its recall
    val r0 = Opq.rotation(spark, dir)
    val (r1, _) = Opq.refinedFit(spark, dir)
    val dMax = (for (i <- r0.indices; j <- r0.indices)
      yield math.abs(r1(i)(j) - r0(i)(j))).max
    println(f"[pq] refined rotation max|R1-R0|=$dMax%.4f")
    leg("opq_refined")(Opq.opqRefinedSearch(spark, dir))
    // the production budget: 8-bit codes (FAISS's default m×256) —
    // the same generic encode/ADC pipeline, wider codebook; answers
    // whether the 16-codeword saturation is the BUDGET's wall or the
    // engine's
    val cb256 = Ann.fitPqCodebook(
      graft.Tables.embeddings(spark, dir), iters = 2, nCodes = 256)
      .localCheckpoint(true)
    leg("trained_256")(Ann.pqSearch(spark, dir, codebook = Some(cb256)))
    spark.stop()
  }
}
