package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-native synthetic corpus/embedding/qrels generation (ref:
  * main.py:22 `prepare_dataset` + experiments/create_qs.py sample
  * queries from the docs; auto_run_tests.py:260-268 regenerates
  * queries+qrels from the corpus), so the engine can run experiments
  * end-to-end standalone, without pre-generated files.
  *
  * Scale design: every generator is `spark.range(n)` plus pure
  * codegen'd expressions — fully distributed, no driver-side data, no
  * UDFs, O(n/partitions) per task, any target size. Determinism: all
  * randomness derives from xxhash64(seed, id, position), so the same
  * (seed, n) always produces byte-identical tables on any cluster
  * layout — the property task retries and oracle comparison need
  * (`rand()` is NOT retry-stable; never use it for data).
  */
object DataGen {

  /** 30 common (stopword-like) words, drawn ~30% of the time; the other
    * ~70% of tokens come from a synthetic 4096-word tail ("w0".."w4095",
    * derived arithmetically — no 4k-literal array in the plan). A
    * too-small vocabulary makes every doc near-similar to every other:
    * with the original 130-word vocab, corpus-homogeneity bias drove
    * EVERY generated doc into the same 16-bit SimHash band (measured),
    * so dedup scale checks exercised nothing but the skew cap. */
  val Vocab: Seq[String] = Seq(
    "spark", "data", "table", "row", "column", "value", "key", "join",
    "scan", "filter", "agg", "window", "batch", "stream", "part",
    "order", "fast", "slow", "small", "large", "hash", "sort", "index",
    "query", "plan", "node", "shard", "block", "cache", "merge")
  val TailVocab = 4096

  val Langs: Seq[String] = Seq("en", "en", "en", "fr", "de", "es")

  /** Uniform double in [0, 1) from a salted hash of the given columns. */
  private def u01(seed: Long, cols: Column*): Column =
    (pmod(xxhash64(lit(seed) +: cols: _*), lit(1L << 40)).cast("double")
      / lit((1L << 40).toDouble))

  /** documents(doc_id, text, lang, source, n_chars) — the driver-table
    * shape. ~1/10 docs are exact duplicates and ~1/10 near-duplicates
    * (same base text ± one token) of an earlier doc, so the dedup
    * family has real positives to find. */
  def documents(spark: SparkSession, nDocs: Long, seed: Long = 42L): DataFrame = {
    val ids = spark.range(nDocs).select(col("id").as("doc_id"))
    // exact dup: copy text of doc_id-1; near dup: base of doc_id-1 with
    // one appended token; else fresh content from the doc's own id
    val baseId = when(col("doc_id") % 10 === 9, col("doc_id") - 1)
      .when(col("doc_id") % 10 === 5, col("doc_id") - 1)
      .otherwise(col("doc_id"))
    val nToks = (pmod(xxhash64(lit(seed), baseId), lit(60)) + lit(20)).cast("int")
    val words = transform(sequence(lit(1), nToks), i => {
      val h = pmod(xxhash64(lit(seed), baseId, i), lit(10L * TailVocab))
      when(h < lit(3L * TailVocab), // ~30% common words
        element_at(array(Vocab.map(lit): _*),
          (pmod(h, lit(Vocab.size)) + 1).cast("int")))
        .otherwise(concat(lit("w"), pmod(h, lit(TailVocab))))
    })
    val bodyOf = concat_ws(" ", words)
    val text = when(col("doc_id") % 10 === 5, concat(bodyOf, lit(" extra")))
      .otherwise(bodyOf)
    ids.select(
      col("doc_id"),
      text.as("text"),
      element_at(array(Langs.map(lit): _*),
        (pmod(xxhash64(lit(seed + 1), baseId), lit(Langs.size)) + 1).cast("int")).as("lang"),
      concat(lit("src"), pmod(xxhash64(lit(seed + 2), col("doc_id")), lit(5))).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** embeddings(vec_id, embedding array<float>, label int) — clustered
    * unit-ish vectors: each label has a hash-derived center, each
    * vector is its label's center plus small per-(id, dim) noise, so
    * cosine similarity within a label is high (the generative-label
    * ground truth the eval operators assume). */
  def embeddings(spark: SparkSession, nVecs: Long, dim: Int = 64,
                 nLabels: Int = 10, seed: Long = 42L): DataFrame = {
    val ids = spark.range(nVecs).select(col("id").as("vec_id"))
    val label = pmod(xxhash64(lit(seed + 3), col("vec_id")), lit(nLabels)).cast("int")
    val emb = transform(sequence(lit(0), lit(dim - 1)), j =>
      ((u01(seed + 4, label, j) * 2.0 - 1.0) +
        (u01(seed + 5, col("vec_id"), j) * 2.0 - 1.0) * 0.3).cast("float"))
    ids.select(col("vec_id"), emb.as("embedding"), label.as("label"))
  }

  /** events(event_id, ts, user_id, event_type, value, props) — the
    * driver ops-log shape: 30 days of timestamps at µs resolution,
    * the five standard event types (so the pivot/funnel operators see
    * their fixed type lists), hash-derived users and values. */
  def events(spark: SparkSession, nEvents: Long, nUsers: Long,
             seed: Long = 42L): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val baseUs = 1704067200000000L // 2024-01-01T00:00:00Z
    val spanUs = 30L * 86400L * 1000000L
    spark.range(nEvents).select(col("id").as("event_id"))
      .select(
        col("event_id"),
        timestamp_micros(lit(baseUs) +
          pmod(xxhash64(lit(seed + 6), col("event_id")), lit(spanUs))).as("ts"),
        pmod(xxhash64(lit(seed + 7), col("event_id")), lit(nUsers)).as("user_id"),
        element_at(array(types.map(lit): _*),
          (pmod(xxhash64(lit(seed + 8), col("event_id")), lit(types.size)) + 1).cast("int"))
          .as("event_type"),
        (floor(u01(seed + 9, col("event_id")) * 500.0 * 100.0 + 0.5) / 100.0).as("value"),
        // real JSON payloads mirroring the driver tables' shape
        // ({"k": <int>}), so the props-extraction path is actually
        // exercised at generated scale, never NULL-vacuous
        concat(lit("{\"k\": "),
          pmod(xxhash64(lit(seed + 10), col("event_id")), lit(100)),
          lit("}")).as("props"))
  }

  /** (q_id, doc_id) relevance pairs for the first `nQueries` docs:
    * a doc is relevant iff it shares the query doc's lang (the ref's
    * synthetic qrels shape, auto_run_tests.py:509-510). The query side
    * is broadcast; output is linear in matches. */
  def qrels(docs: DataFrame, nQueries: Int): DataFrame = {
    val q = docs.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("q_id"), col("lang"))
    docs.select(col("doc_id"), col("lang"))
      .filter(col("doc_id") >= nQueries)
      .join(broadcast(q), Seq("lang"))
      .select(col("q_id"), col("doc_id"))
  }

  /** Writes a full generated dataset in the driver-table layout, so any
    * operator runs on it unchanged by pointing its `dir` here. */
  def writeDataset(spark: SparkSession, dir: String, nDocs: Long,
                   nVecs: Long, seed: Long = 42L, nEvents: Long = 0L): Unit = {
    documents(spark, nDocs, seed).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    embeddings(spark, nVecs, seed = seed).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    if (nEvents > 0)
      events(spark, nEvents, math.max(nEvents / 66, 1), seed).write
        .mode("overwrite").parquet(s"$dir/events.parquet")
  }

  /** DRIFTED-BATCH variants (VERDICT r14 §next-5): the standard
    * generators with planted distribution shift on ODD ids — exactly
    * the batch half of [[graft.operators.Drift.indexDriftStats]]'
    * even/odd split — so the drift alarm can be shown to FIRE, not
    * just to stay ≈1.0 on iid data. Even ids are byte-identical to the
    * standard generators (same expressions, same seeds), making the
    * drifted corpus a controlled A/B against its iid twin.
    *
    * Odd-id embeddings are scaled by `scale` and shifted by a
    * hash-derived per-(label, dim) offset of magnitude `shift`: the
    * scale pushes values outside any build-half min/max grid (the
    * sq8_fit out-of-range mass), and the mean shift moves vectors away
    * from build-derived centroids and codebooks (ivf_cent assigned-dot
    * down, pq_fit quantization error up). Odd-id documents get
    * `newToks` tokens appended from a vocabulary DISJOINT from
    * [[Vocab]]/the `w<k>` tail (`zz<k>`), injecting out-of-vocabulary
    * occurrence mass no build-half top-N fit can represent
    * (tfidf_vocab OOV up). */
  def driftedEmbeddings(spark: SparkSession, nVecs: Long, dim: Int = 64,
                        nLabels: Int = 10, seed: Long = 42L,
                        shift: Double = 0.8, scale: Double = 1.4): DataFrame = {
    val ids = spark.range(nVecs).select(col("id").as("vec_id"))
    val label = pmod(xxhash64(lit(seed + 3), col("vec_id")), lit(nLabels)).cast("int")
    val emb = transform(sequence(lit(0), lit(dim - 1)), j => {
      // the standard per-(label, dim) center + per-(id, dim) noise
      val std = ((u01(seed + 4, label, j) * 2.0 - 1.0) +
        (u01(seed + 5, col("vec_id"), j) * 2.0 - 1.0) * 0.3)
      val drifted = std * scale + (u01(seed + 11, label, j) * 2.0 - 1.0) * shift
      when(col("vec_id") % 2 === 1, drifted).otherwise(std).cast("float")
    })
    ids.select(col("vec_id"), emb.as("embedding"), label.as("label"))
  }

  def driftedDocuments(spark: SparkSession, nDocs: Long, seed: Long = 42L,
                       newToks: Int = 8): DataFrame = {
    val injected = concat_ws(" ", transform(sequence(lit(1), lit(newToks)),
      i => concat(lit("zz"), pmod(xxhash64(lit(seed + 12), col("doc_id"), i),
        lit(TailVocab.toLong)))))
    documents(spark, nDocs, seed)
      .withColumn("text",
        when(col("doc_id") % 2 === 1, concat(col("text"), lit(" "), injected))
          .otherwise(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** [[writeDataset]]'s drifted twin — same layout, planted drift. */
  def writeDriftedDataset(spark: SparkSession, dir: String, nDocs: Long,
                          nVecs: Long, seed: Long = 42L): Unit = {
    driftedDocuments(spark, nDocs, seed).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    driftedEmbeddings(spark, nVecs, seed = seed).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
  }
}
