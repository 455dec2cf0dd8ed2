package graft.ops

/** Parameterized random-hyperplane LSH for embedding columns — the scale
  * path for embedding near-dup and ANN candidate generation.
  *
  * Geometry: bit (t,b) of a vector's bucket in hash table t is the sign of
  * its dot product with a fixed random hyperplane r_{t,b} (classic SimHash
  * for vectors, Charikar '02). `tables` independent hash tables of `bits`
  * hyperplanes each give the banded trade-off: P[candidate] =
  * 1-(1-p^bits)^tables for per-bit agreement p = 1-θ/π, so bucket occupancy
  * is ~n/2^bits per table and the within-bucket self-join stays bounded —
  * raise `bits` as the corpus grows, raise `tables` to buy recall back.
  * The fixed 4-sign-bit predecessor of this scheme (16 buckets, O(n²/16)
  * self-join) is exactly the `tables=1, bits=4` corner with axis-aligned
  * hyperplanes; the default here is 4×8 (256 buckets per table).
  *
  * Engine-exact by construction: hyperplane coefficients are small
  * *integers* from a splitmix64 stream, inlined as identical literal
  * arrays into the Spark expression and the DuckDB oracle SQL, and the
  * vector is quantized to integer micro-units (floor(x·1e6) as BIGINT —
  * one correctly-rounded double multiply + floor, bit-identical across
  * IEEE-754 engines) before the dot product. The sign test is then pure
  * 64-bit integer arithmetic: no summation-order or rounding drift can
  * flip a bucket bit between engines, unlike a floating dot product whose
  * near-zero signs would depend on accumulation order.
  *
  * The coefficient stream is indexed by (table, bit, dim) only — not by
  * the `bits` setting — so a (tables, bits) bucket is a string prefix of
  * the (tables, bits') bucket for bits < bits': raising `bits` only ever
  * *shrinks* candidate sets (monotone precision knob, pinned by spec).
  */
object HyperplaneLsh {

  /** Default geometry: 4 tables × 8 bits over the 64-dim test embeddings. */
  val DefaultTables = 4
  val DefaultBits = 8
  val DefaultDim = 64

  /** Hyperplane-bit index cap in the coefficient stream (see scaladoc:
    * keeping the stream independent of the `bits` setting makes buckets
    * prefix-monotone in `bits`). Effective `bits` must stay below it.
    */
  private val MaxBits = 64

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Integer coefficient of hyperplane (t, b) at dimension i, in
    * [-99, 99] — wide enough for direction diversity, small enough that
    * |Σ c·q| < 2^63 for any realistic dim and |x| (99 · dim · |x|·1e6).
    */
  def coef(t: Int, b: Int, i: Int): Long =
    ((mix((t.toLong * MaxBits + b) * 4099L + i) >>> 13) % 199L) - 99L

  def coefArray(t: Int, b: Int, dim: Int): IndexedSeq[Long] =
    (0 until dim).map(i => coef(t, b, i))

  /** Quantizer: embedding → integer micro-units, as a SQL expression over
    * a column named `embedding`. Identical value stream on both engines.
    */
  def quantSql(duck: Boolean): String =
    if (duck)
      "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * CAST(1000000 AS DOUBLE)) AS BIGINT))"
    else
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * CAST(1000000 AS DOUBLE)) AS BIGINT))"

  private def coefArraySql(t: Int, b: Int, dim: Int, duck: Boolean): String =
    coefArray(t, b, dim)
      .mkString(if (duck) "[" else "array(", ",", if (duck) "]" else ")")

  /** '1'/'0' character for sign bit (t, b), over a quantized column `qv`. */
  private def bitSql(t: Int, b: Int, dim: Int, duck: Boolean): String =
    if (duck)
      s"CASE WHEN list_sum(list_transform(list_zip(qv, ${coefArraySql(t, b, dim, duck = true)}), " +
        "p -> p[1] * p[2])) > 0 THEN '1' ELSE '0' END"
    else
      s"CASE WHEN aggregate(zip_with(qv, ${coefArraySql(t, b, dim, duck = false)}, " +
        "(a, c) -> a * CAST(c AS BIGINT)), CAST(0 AS BIGINT), (acc, v) -> acc + v) > 0 " +
        "THEN '1' ELSE '0' END"

  /** Bucket id of hash table t: `bits` sign chars concatenated. */
  def bucketSql(t: Int, bits: Int, dim: Int, duck: Boolean): String = {
    require(bits <= MaxBits, s"bits=$bits exceeds stream cap $MaxBits")
    (0 until bits).map(b => bitSql(t, b, dim, duck))
      .mkString("concat(", ", ", ")")
  }

  /** Spark: array of (t, bucket) structs to explode — one row per table. */
  def bucketStructsSparkSql(tables: Int, bits: Int, dim: Int): String =
    (0 until tables)
      .map(t => s"struct($t AS t, ${bucketSql(t, bits, dim, duck = false)} AS bucket)")
      .mkString("array(", ", ", ")")

  /** DuckDB: the `q` (quantized) and `b` (per-table buckets) CTE bodies
    * mirroring [[bucketStructsSparkSql]] over the `embeddings` table.
    */
  def duckBucketCtes(tables: Int, bits: Int, dim: Int): String = {
    val perTable = (0 until tables)
      .map(t => s"  SELECT vec_id, $t AS t, ${bucketSql(t, bits, dim, duck = true)} AS bucket FROM q")
      .mkString("\n  UNION ALL\n")
    s"""q AS (SELECT vec_id, embedding, ${quantSql(duck = true)} AS qv FROM embeddings),
       |b AS (
       |$perTable)""".stripMargin
  }
}
