package graft.functions

/** DuckDB-SQL mirrors of the primitives in [[graft.functions]]. The
  * oracle SQL strings in SparkEntry are assembled from these so the
  * DuckDB side performs the *same arithmetic in the same order* as the
  * Spark side (sequential double folds, explicit polynomial hashes).
  */
object Sql {
  val P: Long = HashP

  /** Mirror of functions.rnd — deterministic cross-engine rounding. */
  def rnd(e: String, scale: Int = 4): String =
    s"(floor(($e) * 1e$scale + 0.5e0) / 1e$scale)"

  /** Mirror of functions.fxSum — order-free fixed-point sum (DuckDB
    * sum(BIGINT) returns HUGEINT, hence the cast back). */
  def fxSum(e: String, scale: Int = 4): String =
    s"(CAST(sum(CAST(floor(($e) * 1e$scale + 0.5e0) AS BIGINT)) AS BIGINT) / 1e$scale)"

  /** Mirror of functions.fxAvg. */
  def fxAvg(e: String, scale: Int = 4): String =
    s"(CAST(sum(CAST(floor(($e) * 1e$scale + 0.5e0) AS BIGINT)) AS BIGINT) / count(*) / 1e$scale)"

  /** The events table with ts pinned to µs precision — the parquet
    * stores TIMESTAMP(NANOS) but Spark reads it truncated to µs
    * (Tables.events), so any oracle that orders/lags/diffs on ts must
    * truncate identically or sub-µs data would flip tie-breaks. */
  val eventsUs: String =
    "(SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)"

  /** Whitespace tokenization, empties dropped. */
  def tokens(e: String): String =
    s"list_filter(string_split($e, ' '), t -> len(t) > 0)"

  /** Left-fold polynomial string hash, identical to functions.polyHash. */
  def polyHash(e: String, base: Long = 31L, p: Long = P): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"[CAST(unicode(c) AS BIGINT) for c in string_split($e, '')]), " +
      s"(h, c) -> (h * $base + c) % $p)"

  /** Sequential left-fold dot product in double over 1..dim. */
  def dot(a: String, b: String, dim: Int): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"[CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) for i in range(1, ${dim + 1})]), " +
      s"(x, y) -> x + y)"

  def l2Norm(a: String, dim: Int): String = s"sqrt(${dot(a, a, dim)})"

  def cosine(a: String, b: String, dim: Int): String =
    s"(${dot(a, b, dim)} / (${l2Norm(a, dim)} * ${l2Norm(b, dim)}))"

  def euclid(a: String, b: String, dim: Int): String =
    s"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"[(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) for i in range(1, ${dim + 1})]), " +
      s"(x, y) -> x + y))"
}
