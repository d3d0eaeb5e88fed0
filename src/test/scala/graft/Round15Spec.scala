package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.{Ann, Drift, Knn, Opq}
import graft.sources.DataGen

/** Round-15 pins: the IVF-PQ layout's compaction closure (VERDICT r14
  * §next-6), the drift alarm FIRING under planted drift (§next-5), and
  * the non-parametric OPQ refinement's rotation staying orthonormal
  * (§next-4). */
class Round15Spec extends AnyFunSuite with Matchers with SharedSpark {

  test("ivf-pq layout: compaction folds append debt; results, fits and DPP unchanged") {
    val idx = s"${tempDir("graft-ivfpqc")}/idx"
    val docs = Knn.docSet(spark, sfDir)
    // build from a quarter, append the rest in 3 batches — streaming-
    // style debt: each append lands ≥1 new file in every touched cell
    Ann.writeIvfPqIndex(spark, sfDir, idx,
      docs = Some(docs.filter(col("doc_id") % 4 === 0)))
    (1 to 3).foreach(i =>
      Ann.appendToIvfPqIndex(spark,
        docs.filter(col("doc_id") % 4 === i), idx))
    def cellFiles(): Map[String, Int] =
      new java.io.File(idx).listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("c_id="))
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    // the fits must survive byte-identically: hash every data file
    // under the underscore dirs (the compactor must never touch them)
    def fitHash(sub: String): Seq[(String, String)] =
      new java.io.File(s"$idx/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        .map { f =>
          val md = java.security.MessageDigest.getInstance("SHA-256")
          f.getName -> md.digest(
            java.nio.file.Files.readAllBytes(f.toPath))
            .map("%02x".format(_)).mkString
        }.toSeq
    val before = cellFiles()
    before.values.max should be > 1 // debt exists
    val centBefore = fitHash("_cent")
    val fitBefore = fitHash("_fit")
    val resultsBefore = Ann.ivfPqIndexed(spark, sfDir, idx)
      .collect().map(_.toString).sorted
    // append ≡ rebuild still holds with the quarter-wise debt
    resultsBefore shouldBe
      Ann.ivfPq(spark, sfDir).collect().map(_.toString).sorted

    val hot = Ann.compactIvfIndex(spark, idx, maxFilesPerPartition = 1)
    hot should not be empty

    val after = cellFiles()
    hot.foreach(c => after(s"c_id=$c") shouldBe 1)
    before.filter { case (k, _) =>
      !hot.contains(k.stripPrefix("c_id=").toLong)
    }.foreach { case (k, n) => after(k) shouldBe n }
    // fits byte-identical, served results identical, probe still
    // carries the runtime pruning subquery
    fitHash("_cent") shouldBe centBefore
    fitHash("_fit") shouldBe fitBefore
    val served = Ann.ivfPqIndexed(spark, sfDir, idx)
    served.collect().map(_.toString).sorted shouldBe resultsBefore
    served.queryExecution.executedPlan.toString
      .toLowerCase should include("dynamicpruning")
    // idempotent: nothing left over threshold
    Ann.compactIvfIndex(spark, idx, maxFilesPerPartition = 1) shouldBe empty
  }

  test("drift alarm fires under planted drift and stays quiet on iid") {
    val iid = tempDir("graft-drift-iid")
    val drifted = tempDir("graft-drift-pl")
    DataGen.writeDataset(spark, iid, nDocs = 2000L, nVecs = 2000L)
    DataGen.writeDriftedDataset(spark, drifted, nDocs = 2000L, nVecs = 2000L)
    // vocabDim 4096 ≈ the generator's tail-vocabulary size: at the
    // verified default (64) the fit is ~69% OOV on IID data — a
    // saturated denominator that moves only 0.69→0.74 under injection
    // (measured, DriftProbe); the vocab alarm needs a fit with
    // capacity, so the tfidf leg is pinned on ABSOLUTE OOV mass at a
    // realistic vocab size
    def stats(dir: String): Map[String, (Double, Double, Option[Double])] =
      Drift.indexDriftStats(spark, dir, vocabDim = 4096).collect().map { r =>
        r.getString(0) -> ((r.getDouble(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      }.toMap
    val s0 = stats(iid)
    val s1 = stats(drifted)
    // iid: ratios ≈ 1, out-of-grid / out-of-vocab mass negligible —
    // the no-alarm baseline (measured: 0.9855 / 1.0428 / 0.0023 /
    // 0.0075 at 2000 docs+vecs)
    s0("ivf_cent")._3.get shouldBe 1.0 +- 0.1
    s0("pq_fit")._3.get shouldBe 1.0 +- 0.1
    s0("sq8_fit")._2 should be < 0.02
    s0("tfidf_vocab")._2 should be < 0.02
    // planted drift: each layout's own metric MOVES (scale+shift on
    // odd-id vectors; disjoint-vocabulary injection into odd-id docs —
    // measured: 1.4545 / 3.5144 / 0.2967 / 0.1445)
    math.abs(s1("ivf_cent")._3.get - 1.0) should be > 0.2
    s1("pq_fit")._3.get should be > 1.5
    s1("sq8_fit")._2 should be > 0.1
    s1("tfidf_vocab")._2 should be > 0.1
    // the even (build) half is byte-identical across the twins, so the
    // alarm moves on the BATCH side only — the fit froze, the data
    // drifted
    s1("ivf_cent")._1 shouldBe s0("ivf_cent")._1
    s1("pq_fit")._1 shouldBe s0("pq_fit")._1
  }

  test("refined OPQ rotation is orthonormal and its fit is deterministic") {
    val (r1, cb1) = Opq.refinedFit(spark, sfDir)
    val d = r1.length
    // R·Rᵀ ≈ I (the polar factor of a nonsingular M is orthogonal)
    for (i <- 0 until d; j <- 0 until d) {
      var s = 0.0
      var k = 0
      while (k < d) { s += r1(i)(k) * r1(j)(k); k += 1 }
      s shouldBe (if (i == j) 1.0 else 0.0) +- 1e-9
    }
    cb1 should have size (Ann.PqM * Ann.PqCodes).toLong
    // memoized fit: the literals-are-the-fit contract needs one frozen
    // pair per (app, dir)
    val (r1b, cb1b) = Opq.refinedFit(spark, sfDir)
    (r1b eq r1) shouldBe true
    (cb1b eq cb1) shouldBe true
  }
}
