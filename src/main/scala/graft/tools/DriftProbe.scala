package graft.tools

import org.apache.spark.sql.SparkSession

/** Calibration probe for the planted-drift generators (VERDICT r14
  * §next-5): prints [[graft.operators.Drift.indexDriftStats]] for an
  * iid DataGen corpus and for drifted twins at the given
  * (shift, scale) embedding perturbations — the measured basis for
  * the Round15Spec alarm margins.
  *
  * args: [nDocs] [nVecs] [shift,scale ...]
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 2000L
    val nVecs = if (args.length > 1) args(1).toLong else 2000L
    val params =
      if (args.length > 2) args.drop(2).toSeq.map { s =>
        val Array(a, b) = s.split(","); (a.toDouble, b.toDouble)
      }
      else Seq((0.8, 1.4), (2.0, 2.0))
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Drift
    import graft.sources.DataGen
    val base = graft.Cleanup.onExit(
      java.nio.file.Files.createTempDirectory("graft-driftprobe")).toString
    def show(tag: String, dir: String): Unit = {
      println(s"[drift] $tag")
      for (vd <- Seq(graft.operators.Encoders.Dim, 4096)) {
        Drift.indexDriftStats(spark, dir, vocabDim = vd).collect().foreach { r =>
          if (vd == graft.operators.Encoders.Dim || r.getString(0) == "tfidf_vocab") {
            val ratio = if (r.isNullAt(3)) "null" else f"${r.getDouble(3)}%.4f"
            val nm = if (r.getString(0) == "tfidf_vocab") s"tfidf_vocab/$vd"
              else r.getString(0)
            println(f"[drift]   $nm%-16s build=${r.getDouble(1)}%.6f " +
              f"batch=${r.getDouble(2)}%.6f ratio=$ratio")
          }
        }
      }
    }
    val iid = s"$base/iid"
    DataGen.writeDataset(spark, iid, nDocs, nVecs)
    show(s"iid nDocs=$nDocs nVecs=$nVecs", iid)
    params.foreach { case (shift, scale) =>
      val d = s"$base/drift-$shift-$scale"
      DataGen.driftedDocuments(spark, nDocs).write.mode("overwrite")
        .parquet(s"$d/documents.parquet")
      DataGen.driftedEmbeddings(spark, nVecs, shift = shift, scale = scale)
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
      show(s"drifted shift=$shift scale=$scale", d)
    }
    spark.stop()
  }
}
