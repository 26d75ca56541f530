package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic primitives.
  *
  * Every dedup / similarity operator is verified against a DuckDB oracle
  * that recomputes the same result independently, so all hashing and
  * quantization must produce bit-identical values in both engines. The
  * common denominator is MD5 (identical everywhere) and 64-bit integer
  * arithmetic (exact everywhere):
  *
  *   - token hash  = first 8 hex chars of md5 as unsigned 32-bit int
  *   - embeddings  = quantized to `round(x * 10000)` longs; float*10^4 is
  *     exact in double (24-bit mantissa * 14 bits < 53), and (k+0.5)/10^4
  *     is not binary-representable, so the round is never on a .5 boundary
  *     => identical integers in Spark and DuckDB
  *   - derived doubles (ratios, cosines) are computed from identical
  *     integers with single IEEE ops (div/sqrt are correctly rounded), so
  *     they are bit-identical too
  */
object Portable {

  /** Unsigned 32-bit hash of a string, identical in Spark and DuckDB:
    * Spark `conv(substr(md5(s),1,8),16,10)`, DuckDB
    * `CAST('0x'||substr(md5(s),1,8) AS BIGINT)`.
    */
  def tokenHash(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Same hash computed driver-side (for embedding constants into plans). */
  def tokenHashLocal(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  /** Whitespace tokens of trimmed, lower-cased text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Distinct word n-gram shingles of a token array (1-based slice).
    * Guarded for < n tokens: Spark's `sequence(1, 0)` would count DOWN,
    * so short docs explicitly get an empty shingle set.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Embedding quantization: array<float> -> array<long> at 1e4 scale. */
  def quantize(arr: Column): Column =
    transform(arr, x => round(x.cast("double") * 10000).cast("long"))

  /** Squared L2 norm of a quantized (long) vector. */
  def qNormSq(q: Column): Column =
    aggregate(transform(q, x => x * x), lit(0L), (acc, x) => acc + x)

  /** Dot product of two equal-length quantized vectors. */
  def qDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Cosine from integer dot + squared norms (bit-deterministic). */
  def qCosine(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / sqrt(na.cast("double") * nb.cast("double"))

  // ---------------------------------------------------------------------
  // Deterministic constant families (embedded as literals into BOTH the
  // Spark plan and the generated oracle SQL, so no cross-engine hashing
  // of the constants themselves is ever needed).
  // ---------------------------------------------------------------------

  /** MinHash universal-hash family h_i(x) = (a_i*x + b_i) mod P with
    * P prime > 2^32; a_i odd, bounded so a_i*x < 2^62.
    */
  val MinHashP: Long = 4294967311L
  def minHashA(i: Int): Long = 2 * (tokenHashLocal(s"mh-a:$i") % 536870912L) + 1
  def minHashB(i: Int): Long = tokenHashLocal(s"mh-b:$i")

  /** Random-hyperplane component r(plane j, dim i) in [-1000, 1000]. */
  def hyperplane(j: Int, i: Int): Long = tokenHashLocal(s"hp:$j:$i") % 2001L - 1000L

  /** Sign-bit of <q, hyperplane j> for a quantized vector of `dim` dims. */
  def hyperplaneBit(q: Column, j: Int, dim: Int): Column = {
    val r = array((0 until dim).map(i => lit(hyperplane(j, i))): _*)
    (aggregate(zip_with(q, r, (x, y) => x * y), lit(0L),
      (acc, x) => acc + x) >= 0L).cast("int")
  }
}
