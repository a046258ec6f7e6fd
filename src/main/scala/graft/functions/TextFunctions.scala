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

  /** Seeded hash family for MinHash: h_i(t) = hash64(i || ':' || t). */
  def seededHash(seed: Int, c: Column): Column =
    hash64(concat(lit(seed.toString), lit(":"), c))

  /** Word n-gram shingles of a token array (empty if fewer than n tokens). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j + 1))): _*)))
      .otherwise(array().cast("array<string>"))

  /** MinHash signature (k components) over a token array: element i is the
    * minimum of the i-th seeded hash over the tokens. One pass per seed,
    * all inside codegen — no explode, no shuffle. */
  def minhashSignature(toks: Column, k: Int): Column =
    array((0 until k).map(i =>
      array_min(transform(toks, t => seededHash(i, t)))): _*)

  /** LSH band keys for a MinHash signature: `bands` strings, each encoding
    * the band index and `rowsPerBand` consecutive signature components.
    * Docs sharing any band key are near-dup candidates. */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r =>
        element_at(sig, b * rowsPerBand + r + 1).cast("string"))
      concat_ws("_", lit(b.toString) +: parts: _*)
    }: _*)

  /** `bits`-bit SimHash over a token array (with multiplicity): bit b is set
    * when the sum of ±1 votes (bit b of each token hash) is positive. */
  def simhash(toks: Column, bits: Int): Column = {
    val terms = (0 until bits).map { b =>
      val votes = aggregate(toks, lit(0L),
        (acc, t) => acc + (shiftright(hash64(t), b) % 2) * 2 - 1)
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }
    terms.reduce(_ + _)
  }

  /** Position-weighted checksum fingerprint: Σ hash64(tok)·(pos%7+1) mod 2⁴⁰.
    * Order-sensitive (unlike a bag fingerprint) yet purely relational, so it
    * distributes as a plain aggregate. Used with posexplode at call sites. */
  val FingerprintMod = 1L << 40

  /** Fraction of equal components between two equal-length signatures. */
  def signatureMatchFraction(a: Column, b: Column, k: Int): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), p => p)).cast("double") / k
}
