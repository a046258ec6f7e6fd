package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text / document primitives for the training-data pipeline operators:
  * tokenization, cross-engine 64-bit hashing, shingling, MinHash signatures,
  * SimHash, and weighted fingerprints.
  *
  * Everything here is a native column expression (codegen'd, no UDFs), and
  * every hash is defined via md5 so a SQL oracle (DuckDB) reproduces the
  * exact integers: Spark's murmur `hash()` is engine-specific, md5 is not.
  */
object TextFunctions {

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** Deterministic cross-engine 60-bit hash: first 15 hex digits of md5.
    * Positive, fits a long; identical in any engine with md5 + hex parse. */
  def hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Base hashes for a string array, computed ONCE. Seeded families and
    * SimHash bits derive from these by cheap integer arithmetic — inlining
    * md5 into every per-seed/per-bit aggregate multiplies the digest work
    * k× and pushes the projection past codegen method limits (measured: a
    * 32-bit SimHash went from minutes to seconds with this split). */
  def hashArray(strings: Column): Column = transform(strings, s => hash64(s))

  /** Universal-hash family over a base hash, mod the Mersenne prime 2³¹−1:
    * h_i(x) = ((x mod p)·(2i+3) + (i·12345+67891)) mod p. All intermediates
    * stay below 2⁶³ (DuckDB BIGINT overflow is an error, not a wrap). */
  val HashP = 2147483647L

  def seededFromBase(seed: Int, baseHash: Column): Column =
    pmod(pmod(baseHash, lit(HashP)) * lit(2L * seed + 3) + lit(seed * 12345L + 67891L), lit(HashP))

  /** Word n-gram shingles of a token array (empty if fewer than n tokens). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j + 1))): _*)))
      .otherwise(array().cast("array<string>"))

  /** MinHash signature (k components) over a PRE-HASHED element array:
    * element i is the minimum of the i-th universal hash. One codegen'd
    * pass per seed over longs — no digest work, no explode, no shuffle. */
  def minhashSignatureFromHashes(hashes: Column, k: Int): Column =
    array((0 until k).map(i =>
      array_min(transform(hashes, h => seededFromBase(i, h)))): _*)

  /** Convenience: hash + sign in one call (tests / small inputs). */
  def minhashSignature(toks: Column, k: Int): Column =
    minhashSignatureFromHashes(hashArray(toks), k)

  /** LSH band keys for a MinHash signature: `bands` strings, each encoding
    * the band index and `rowsPerBand` consecutive signature components.
    * Docs sharing any band key are near-dup candidates. */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r =>
        element_at(sig, b * rowsPerBand + r + 1).cast("string"))
      concat_ws("_", lit(b.toString) +: parts: _*)
    }: _*)

  /** `bits`-bit SimHash over a PRE-HASHED element array (with multiplicity):
    * bit b is set when the sum of ±1 votes (bit b of each hash) is positive. */
  def simhashFromHashes(hashes: Column, bits: Int): Column = {
    val terms = (0 until bits).map { b =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, b) % 2) * 2 - 1)
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }
    terms.reduce(_ + _)
  }

  /** Convenience: hash + SimHash in one call (tests / small inputs). */
  def simhash(toks: Column, bits: Int): Column =
    simhashFromHashes(hashArray(toks), bits)

  /** Position-weighted checksum fingerprint: Σ hash64(tok)·(pos%7+1) mod 2⁴⁰.
    * Order-sensitive (unlike a bag fingerprint) yet purely relational, so it
    * distributes as a plain aggregate. Used with posexplode at call sites. */
  val FingerprintMod = 1L << 40

  /** Fraction of equal components between two equal-length signatures. */
  def signatureMatchFraction(a: Column, b: Column, k: Int): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), p => p)).cast("double") / k
}
