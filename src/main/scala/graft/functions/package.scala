package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/** Deterministic primitives shared by operators AND mirrored verbatim in
  * the generated DuckDB oracle SQL (see the `*Sql` objects). Every hash
  * is an explicit polynomial hash — never an engine built-in — so the
  * Spark plan and the oracle compute bit-identical values.
  *
  * Ref: embeddings/encoder.py:93-103 (`_hash_vectorize` hashes tokens
  * with Python's `hash`); we substitute an explicitly-specified
  * polynomial hash to make results portable and verifiable.
  */
package object functions {
  /** Modulus for polynomial hashing; small enough that `h * 131 + c`
    * never overflows Int64. */
  val HashP: Long = 1000000007L

  /** Deterministic cross-engine rounding: floor(x·10^s + 0.5)/10^s in
    * double. Spark's `round` (exact BigDecimal HALF_UP) and DuckDB's
    * `round` (scaled-double) disagree on exact half-boundaries (e.g.
    * 0.59625 @ scale 4); this formula is the same IEEE ops on both
    * engines, so results are bit-identical. Mirrored by Sql.rnd. */
  def rnd(c: Column, scale: Int = 4): Column = {
    val f = math.pow(10, scale)
    F.floor(c * f + 0.5) / f
  }

  /** Order-free sum of a double column: each row is fixed-point rounded
    * to `scale` decimals and summed as a long — integer addition is
    * associative, so the result is independent of partitioning and
    * accumulation order, unlike a raw double sum (ULP-level
    * reassociation error that can flip a value across a rounding
    * half-boundary). Headroom: |sum·10^scale| must stay below 2⁶³
    * (~9.2e18/10^scale rows×magnitude). Mirrored by Sql.fxSum. */
  def fxSum(c: Column, scale: Int = 4): Column = {
    val f = math.pow(10, scale)
    F.sum(F.floor(c * f + 0.5).cast("long")) / f
  }

  /** Order-free mean via [[fxSum]]: sum of per-row fixed-point longs,
    * divided by the group count then descaled. Mirrored by Sql.fxAvg. */
  def fxAvg(c: Column, scale: Int = 4): Column = {
    val f = math.pow(10, scale)
    F.sum(F.floor(c * f + 0.5).cast("long")) / F.count(F.lit(1)) / f
  }

  /** Whitespace tokenization, empty tokens dropped (Python `str.split`
    * semantics on single-space text; ref encoder.py:96). */
  def tokens(text: Column): Column =
    F.filter(F.split(text, " "), t => F.length(t) > 0)

  /** Left-fold polynomial string hash: h <- (h*base + codepoint) % p.
    * Computed by the codegen'd [[PolyHashExpr]]; [[polyHashHof]] is the
    * declarative spec it must equal (asserted in FunctionsSpec). */
  def polyHash(s: Column, base: Long = 31L, p: Long = HashP): Column =
    native.polyHash(s, base, p)

  /** HOF formulation of [[polyHash]] — the semantic spec the DuckDB
    * oracle mirrors. */
  def polyHashHof(s: Column, base: Long = 31L, p: Long = HashP): Column =
    F.aggregate(
      F.filter(F.split(s, ""), ch => F.length(ch) === 1),
      F.lit(0L),
      (h, ch) => (h * base + F.ascii(ch)) % p)

  /** Elementwise double view of a float vector (all arithmetic is done
    * in double, in index order, on both engines). */
  def vecD(v: Column): Column = F.transform(v, x => x.cast("double"))

  /** Sequential left-fold dot product in double precision over
    * array&lt;float&gt; columns (codegen'd kernel; [[dotHof]] is the
    * equivalent declarative spec). */
  def dot(a: Column, b: Column): Column = native.dotF(a, b)

  /** HOF formulation of [[dot]] (any numeric array type). */
  def dotHof(a: Column, b: Column): Column =
    F.aggregate(
      F.zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      F.lit(0.0),
      (acc, v) => acc + v)

  def l2Norm(a: Column): Column = F.sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Sequential left-fold squared-L2 distance, then sqrt
    * (array&lt;float&gt; inputs, codegen'd kernel). */
  def euclid(a: Column, b: Column): Column = F.sqrt(native.dist2F(a, b))

  /** Unit-normalize (zero vectors pass through unchanged, like
    * ref encoder.py:100-102). */
  def l2Normalize(v: Column): Column = {
    val n = l2Norm(v)
    F.when(n > 0.0, F.transform(v, x => x.cast("double") / n))
      .otherwise(vecD(v))
  }
}
