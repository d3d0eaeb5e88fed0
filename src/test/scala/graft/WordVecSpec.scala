package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.{Encoders, WordVectors}
import graft.operators.WordVectors.WordVecModel

/** EXTERNAL-weights path through the batched-inference seam (VERDICT
  * r11 §next-4): weights come from a FILE in the public word2vec/.vec
  * text format, not from in-process training — the loader, the
  * broadcast shipping, the per-partition construction, the batch
  * geometry and the search sanity are exactly what a downloaded
  * GloVe/fastText distribution would exercise. The container ships no
  * real blob (zero egress), so the default fixture is a
  * deterministically generated .vec file; set SPARK_GRAFT_WORDVEC_FILE
  * to a real one to run the same assertions against it. */
class WordVecSpec extends AnyFunSuite with Matchers with SharedSpark {

  /** Deterministic fixture model: corpus vocabulary, seeded vectors. */
  private def fixtureModel(dim: Int = 16): WordVecModel = {
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .select("tok").distinct().collect().map(_.getString(0)).sorted
    val rnd = new scala.util.Random(42)
    WordVecModel(dim,
      toks.map(t => t -> Array.fill(dim)(rnd.nextFloat() * 2f - 1f)).toMap)
  }

  private def externalOrFixture(tmp: String): (WordVecModel, String) =
    sys.env.get("SPARK_GRAFT_WORDVEC_FILE") match {
      case Some(p) => (WordVectors.load(p), p)
      case None =>
        val m = fixtureModel()
        val p = s"$tmp/fixture.vec"
        WordVectors.save(m, p)
        (m, p)
    }

  test(".vec save/load round-trips exactly; header and malformed lines are validated") {
    val tmp = tempDir("graft-wordvec")
    val m = fixtureModel(dim = 8)
    val p = s"$tmp/rt.vec"
    WordVectors.save(m, p)
    val back = WordVectors.load(p)
    back.dim shouldBe m.dim
    back.vocab.keySet shouldBe m.vocab.keySet
    m.vocab.foreach { case (t, v) => back.vocab(t) shouldBe v }
    // headerless GloVe form parses too
    val glove = s"$tmp/glove.vec"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(glove),
      "alpha 0.5 -0.25 1.0\nbeta -1.5 0.75 0.125\n")
    val g = WordVectors.load(glove)
    g.dim shouldBe 3
    g.vocab("alpha") shouldBe Array(0.5f, -0.25f, 1.0f)
    g.vocab("beta") shouldBe Array(-1.5f, 0.75f, 0.125f)
    // a ragged row fails loudly — a weights file must not half-load
    val bad = s"$tmp/bad.vec"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(bad),
      "2 3\nalpha 0.5 -0.25 1.0\nbeta -1.5 0.75\n")
    an[IllegalArgumentException] should be thrownBy WordVectors.load(bad)
    // a header contradicting the row count fails loudly
    val short = s"$tmp/short.vec"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(short),
      "3 2\nalpha 0.5 1.0\nbeta 0.25 0.75\n")
    an[IllegalArgumentException] should be thrownBy WordVectors.load(short)
    // a headerless dim-1 file is DATA (a header needs two integers)
    val dim1 = s"$tmp/dim1.vec"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dim1),
      "hello 0.5\nworld -1.0\n")
    val d1 = WordVectors.load(dim1)
    d1.dim shouldBe 1
    d1.vocab("hello") shouldBe Array(0.5f)
    // whitespace-only lines are blank, not dim-poisoning ragged rows
    val blanky = s"$tmp/blanky.vec"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(blanky),
      "   \nalpha 0.5 1.0\n\nbeta 0.25 0.75\n")
    WordVectors.load(blanky).vocab.keySet shouldBe Set("alpha", "beta")
    // duplicate tokens fail loudly instead of silently shadowing rows
    val dup = s"$tmp/dup.vec"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dup),
      "2 2\nalpha 0.5 1.0\nalpha 0.25 0.75\n")
    an[IllegalArgumentException] should be thrownBy WordVectors.load(dup)
  }

  test("file-loaded weights encode distributed == driver, plan shape unchanged, own-query rank-1") {
    val tmp = tempDir("graft-wordvec-seam")
    val (model, path) = externalOrFixture(tmp)
    // the weights demonstrably came from the FILE: reload and use that
    val loaded = WordVectors.load(path)
    val enc = Encoders.encodeBatchedModel(spark, sfDir, loaded, batchSize = 7)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val got = enc.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    // distributed batch application == driver-side application of the
    // same loaded weights (the plumbing adds or loses nothing)
    got.size shouldBe docs.length
    docs.foreach { case (id, text) =>
      got(id) shouldBe loaded.encode(Seq(text)).head
    }
    // plan shape identical to the stub path: same mapPartitions seam,
    // no extra exchange/join from carrying file-loaded weights
    def shape(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collect { case n => n.nodeName }
    shape(enc) shouldBe shape(Encoders.encodeBatched(spark, sfDir, batchSize = 7))
    // search sanity: a document used as its own query is the top
    // cosine hit (score ~1); vectors are non-degenerate
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var ip = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { ip += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) -2.0 else ip / math.sqrt(na * nb)
    }
    val (qid, qtext) = docs.maxBy(_._2.length) // most distinctive text
    val qv = loaded.encode(Seq(qtext)).head
    qv.exists(_ != 0.0) shouldBe true
    val ranked = got.toSeq.map { case (id, v) => id -> cos(qv, v) }
      .sortBy { case (id, s) => (-s, id) }
    ranked.head._2 shouldBe 1.0 +- 1e-9
    ranked.takeWhile(_._2 >= ranked.head._2 - 1e-9).map(_._1) should contain(qid)
  }
}
