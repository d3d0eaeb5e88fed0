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

  // ---------------------------------------------------------------------
  // TPC-H-ish star schema (VERDICT r15 §next-3): the driver tables'
  // exact schemas and value sets (column names, types, low-cardinality
  // domains, numeric ranges probed from /root/testdata/sf0.1), scaled
  // by `sf` with sf=1.0 one decade above the largest driver dir — so
  // the FULL oracle crosscheck can run at a corpus mass the driver
  // never ships. The data is hash-derived (not the driver's seed-42
  // stream), which is sufficient: the crosscheck compares Spark vs
  // DuckDB over the SAME parquet, so the gate is generator-agnostic;
  // what matters is that every query's predicates select real rows
  // (BUILDING segment present, quantity/discount/date domains populated)
  // and that the fixed-point 1e2/1e4-scaled sums see 10x the mass.
  // ---------------------------------------------------------------------

  private val RegionNames =
    Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
  private val Segments = Seq(
    "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val Priorities = Seq(
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val PartAdjs = Seq(
    "blue", "cold", "hot", "large", "new", "old", "red", "small")
  private val PartNouns = Seq(
    "anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget")
  private val PartTypes = Seq(
    "ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")

  private def pick(opts: Seq[String], seed: Long, cols: Column*): Column =
    element_at(array(opts.map(lit): _*),
      (pmod(xxhash64(lit(seed) +: cols: _*), lit(opts.size)) + 1).cast("int"))

  /** Uniform 2-decimal double in [lo, hi). */
  private def money(lo: Double, hi: Double, seed: Long, cols: Column*): Column =
    floor(u01(seed, cols: _*) * ((hi - lo) * 100.0)) / 100.0 + lit(lo)

  /** Day-resolution timestamp uniform in [epochDay0, epochDay0 + span). */
  private def day(epochDay0: Long, spanDays: Long, seed: Long,
                  cols: Column*): Column =
    timestamp_seconds((lit(epochDay0) +
      pmod(xxhash64(lit(seed) +: cols: _*), lit(spanDays))) * 86400L)

  private val OrderEpochDay0 = 9131L  // 1995-01-01
  private val OrderSpanDays = 2405L   // .. 2001-08-01
  private val ShipEpochDay0 = 9132L   // 1995-01-02
  private val ShipSpanDays = 2499L    // .. 2001-11-04

  def region(spark: SparkSession): DataFrame =
    spark.range(5).select(col("id").cast("int").as("r_regionkey"),
      element_at(array(RegionNames.map(lit): _*),
        col("id").cast("int") + 1).as("r_name"))

  def nation(spark: SparkSession): DataFrame =
    spark.range(25).select(col("id").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      (col("id") % 5).cast("int").as("n_regionkey"))

  def customer(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame =
    spark.range(n).select(col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      pmod(xxhash64(lit(seed + 20), col("id")), lit(25)).cast("int")
        .as("c_nationkey"),
      money(-1000.0, 10000.0, seed + 21, col("id")).as("c_acctbal"),
      pick(Segments, seed + 22, col("id")).as("c_mktsegment"))

  def supplier(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame =
    spark.range(n).select(col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      pmod(xxhash64(lit(seed + 23), col("id")), lit(25)).cast("int")
        .as("s_nationkey"),
      money(-1000.0, 10000.0, seed + 24, col("id")).as("s_acctbal"))

  def part(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame =
    spark.range(n).select(col("id").as("p_partkey"),
      concat(pick(PartAdjs, seed + 25, col("id")), lit(" "),
        pick(PartNouns, seed + 26, col("id"))).as("p_name"),
      concat(lit("Brand#"),
        pmod(xxhash64(lit(seed + 27), col("id")), lit(25)) + 1).as("p_brand"),
      pick(PartTypes, seed + 28, col("id")).as("p_type"),
      (pmod(xxhash64(lit(seed + 29), col("id")), lit(50)) + 1).cast("int")
        .as("p_size"),
      (floor(u01(seed + 30, col("id")) * 999.0) / 10.0 + 900.0)
        .as("p_retailprice"))

  def orders(spark: SparkSession, n: Long, nCust: Long,
             seed: Long = 42L): DataFrame =
    spark.range(n).select(col("id").as("o_orderkey"),
      pmod(xxhash64(lit(seed + 31), col("id")), lit(nCust)).as("o_custkey"),
      pick(Seq("F", "O", "P"), seed + 32, col("id")).as("o_orderstatus"),
      money(1000.0, 500000.0, seed + 33, col("id")).as("o_totalprice"),
      day(OrderEpochDay0, OrderSpanDays, seed + 34, col("id"))
        .as("o_orderdate"),
      pick(Priorities, seed + 35, col("id")).as("o_orderpriority"))

  /** ~4 lines per order (1..7 hash-derived), line attributes derived
    * from (orderkey, linenumber) — fully distributed, no join back to
    * orders (ship dates are independent of order dates in the driver
    * tables too: probed lag spans [-2399, +2496] days). */
  def lineitem(spark: SparkSession, nOrders: Long, nPart: Long, nSupp: Long,
               seed: Long = 42L): DataFrame = {
    val nLines = (pmod(xxhash64(lit(seed + 36), col("id")), lit(7)) + 1)
      .cast("int")
    val base = spark.range(nOrders)
      .select(col("id").as("l_orderkey"),
        explode(sequence(lit(1), nLines)).as("l_linenumber"))
    val k = Seq(col("l_orderkey"), col("l_linenumber"))
    val qty = (pmod(xxhash64(lit(seed + 39) +: k: _*), lit(50)) + 1)
      .cast("double")
    val unitPrice = money(900.0, 2100.0, seed + 40, k: _*)
    base.select(col("l_orderkey"),
      pmod(xxhash64(lit(seed + 37) +: k: _*), lit(nPart)).as("l_partkey"),
      pmod(xxhash64(lit(seed + 38) +: k: _*), lit(nSupp)).as("l_suppkey"),
      col("l_linenumber"),
      qty.as("l_quantity"),
      (floor(qty * unitPrice * 100.0 + 0.5) / 100.0).as("l_extendedprice"),
      (pmod(xxhash64(lit(seed + 41) +: k: _*), lit(11)).cast("double") / 100.0)
        .as("l_discount"),
      (pmod(xxhash64(lit(seed + 42) +: k: _*), lit(9)).cast("double") / 100.0)
        .as("l_tax"),
      pick(Seq("A", "N", "R"), seed + 43, k: _*).as("l_returnflag"),
      pick(Seq("F", "O"), seed + 44, k: _*).as("l_linestatus"),
      day(ShipEpochDay0, ShipSpanDays, seed + 45, k: _*).as("l_shipdate"))
  }

  /** Writes the COMPLETE driver-dir layout (all 10 tables) at scale
    * factor `sf`, with sf=1.0 exactly one decade above the largest
    * driver dir (sf0.1): lineitem ~6M, orders 1.5M, customer 150k,
    * part 200k, supplier 10k, events 1M, documents 50k, embeddings
    * 20k. Any query — relational, events, text, ANN — runs on the
    * result unchanged. */
  def writeSfDataset(spark: SparkSession, dir: String, sf: Double,
                     seed: Long = 42L): Unit = {
    def n(base: Long): Long = math.max(1L, (base * sf).toLong)
    region(spark).write.mode("overwrite").parquet(s"$dir/region.parquet")
    nation(spark).write.mode("overwrite").parquet(s"$dir/nation.parquet")
    customer(spark, n(150000L), seed).write.mode("overwrite")
      .parquet(s"$dir/customer.parquet")
    supplier(spark, n(10000L), seed).write.mode("overwrite")
      .parquet(s"$dir/supplier.parquet")
    part(spark, n(200000L), seed).write.mode("overwrite")
      .parquet(s"$dir/part.parquet")
    orders(spark, n(1500000L), n(150000L), seed).write.mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    lineitem(spark, n(1500000L), n(200000L), n(10000L), seed).write
      .mode("overwrite").parquet(s"$dir/lineitem.parquet")
    writeDataset(spark, dir, nDocs = n(50000L), nVecs = n(20000L),
      seed = seed, nEvents = n(1000000L))
  }
}
