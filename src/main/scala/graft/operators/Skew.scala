package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-hardening utilities (SURVEY.md §5). AQE's skew-join handling
  * covers sort-merge joins; these helpers cover the remaining cases —
  * skewed aggregations and skewed bucket keys (e.g. a pathological LSH
  * bucket) — via deterministic salting.
  */
object Skew {

  /** Deterministic salt in [0, n) derived from an id column (not
    * rand(): results must be reproducible across retries/stages —
    * a nondeterministic salt breaks task retry semantics). */
  def saltOf(id: Column, n: Int): Column = pmod(hash(id), lit(n))

  /** Two-phase skew-safe aggregation: groupBy (key, salt) partial →
    * groupBy key final. `partial` and `merge` must form a semigroup
    * (e.g. sum/sum, count/sum, min/min). */
  def saltedAgg(df: DataFrame, key: Column, id: Column, n: Int,
                value: Column, partial: Column => Column,
                merge: Column => Column): DataFrame =
    df.groupBy(key.as("_k"), saltOf(id, n).as("_salt"))
      .agg(partial(value).as("_pv"))
      .groupBy(col("_k"))
      .agg(merge(col("_pv")).as("value"))

  /** Skew-safe equi-join of a big frame (skewed key distribution)
    * against a small-but-not-broadcastable frame: the big side gets a
    * deterministic salt from its row id, the small side is replicated
    * once per salt value, and the join key becomes (key, salt) — a hot
    * key's rows spread over `n` reducers instead of one straggler.
    * Use when AQE's skew-join split doesn't apply (e.g. the join is
    * feeding an aggregation that must stay co-partitioned). Cost: the
    * small side is shuffled n×. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 bigId: Column, n: Int): DataFrame = {
    val salted = big.withColumn("_salt", saltOf(bigId, n))
    val replicated = small.withColumn("_salt",
      explode(array((0 until n).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Caps pathological buckets for pair-expansion operators: buckets
    * larger than `maxBucket` are dropped (a bucket shared by a huge
    * fraction of the corpus carries no discriminating signal for
    * dedup/LSH — standard practice is to skip it, not to expand b²
    * pairs). Input: (bucketKeyCols..., ids array) as produced by a
    * collect_list groupBy. */
  def capBuckets(buckets: DataFrame, idsCol: String, maxBucket: Int): DataFrame =
    buckets.filter(size(col(idsCol)) <= maxBucket)

  /** Same bound for *join-based* pair expansion, applied before the
    * self-join: rows whose blocking key is shared by more than
    * `maxBlock` rows are dropped. The oversized keys are found with one
    * map-side-combined count and anti-joined back as a broadcast (the
    * pathological-key set is tiny by construction — at most
    * |input|/maxBlock keys can exceed the cap), so the hot block never
    * materializes anywhere: not as b² join pairs and not as a giant
    * collect_list row. */
  def capBlocks(df: DataFrame, keys: Seq[String], maxBlock: Int): DataFrame = {
    val hot = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_bsz"))
      .filter(col("_bsz") > maxBlock)
      .select(keys.map(col): _*)
    df.join(broadcast(hot), keys, "left_anti")
  }
}
