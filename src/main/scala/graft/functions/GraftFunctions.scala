package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{Bridge, CosineSimilarity, HammingDistance64}

/**
 * Column-function library for the engine. The reference has **no** scalar-function
 * library (users call plain Scala in MR lambdas, SURVEY §2.5); here every function
 * is a Catalyst expression tree built from `org.apache.spark.sql.functions._`
 * built-ins (codegen'd, pushdown-friendly) or the native expressions in
 * [[graft.functions]] — never a Scala UDF in a hot path.
 *
 * ANSI note: Spark 4 enables ANSI mode by default; all arithmetic here is written
 * to be overflow-free under ANSI (bitwise ops for signature assembly, modular
 * arithmetic for rolling hashes) so the library works in either mode.
 */
object GraftFunctions {

  /** Cosine similarity of two vector columns (native codegen expression).
    * Inputs are normalized to `array<float>` (no-op when already float). */
  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(
      Bridge.expression(a.cast("array<float>")), Bridge.expression(b.cast("array<float>"))))

  /** Hamming distance of two 64-bit signatures (native codegen expression). */
  def hamming64(a: Column, b: Column): Column =
    Bridge.column(HammingDistance64(Bridge.expression(a), Bridge.expression(b)))

  // ---- Tokenization (DuckDB-parity definitions; see SparkEntry.oracleSql) ----

  /** Whitespace tokens, empty strings removed. Matches DuckDB
    * `list_filter(string_split(text, ' '), t -> t <> '')`. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  /** Token count over [[tokens]]. */
  def token_count(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword split: lowercase word pieces of max `n` chars — the
    * deterministic regex stand-in for a real tokenizer vocabulary. */
  def subword_tokens(text: Column, n: Int = 4): Column =
    flatten(transform(tokens(lower(text)), t =>
      transform(sequence(lit(0), floor((length(t) - 1) / lit(n)).cast("int")), i =>
        t.substr(i * n + 1, lit(n)))))

  /** Word n-gram shingles: ["a b c", "b c d", ...]; short docs yield one shingle. */
  def shingles(text: Column, n: Int): Column = {
    val ts = tokens(text)
    when(size(ts) < n, array(concat_ws(" ", ts)))
      .otherwise(transform(sequence(lit(0), size(ts) - n),
        i => concat_ws(" ", slice(ts, i + 1, lit(n)))))
  }

  // ---- Hash signatures (dedup/similarity primitives) ----

  /**
   * MinHash signature: `numHashes` minima of per-token 64-bit hashes under
   * independent hash functions h_i(t) = xxhash64(i ⊕ t). Entirely built-ins →
   * codegen'd, shuffle-free, O(numHashes · tokens) per row.
   */
  def minhash_signature(tokenArr: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      array_min(transform(tokenArr, t => xxhash64(concat(i.cast("string"), lit(""), t)))))

  /** LSH band keys from a MinHash signature: one 64-bit hash per band of
    * `rowsPerBand` signature slots. Docs sharing any band key become candidates. */
  def minhash_bands(sig: Column, rowsPerBand: Int): Column =
    transform(sequence(lit(0), floor(size(sig) / lit(rowsPerBand)).cast("int") - 1), b =>
      struct(b.as("band"),
        xxhash64(concat_ws(",", transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
          v => v.cast("string")))).as("sig")))

  /**
   * 64-bit SimHash over a token array: bit b of the result is set iff the sum of
   * ±1 votes (bit b of each token's xxhash64) is positive. Assembled with
   * bitwise OR of shifted bits — no ANSI overflow. One `aggregate` per bit keeps
   * everything in whole-stage codegen.
   */
  def simhash64(tokenArr: Column): Column =
    (0 until 64).foldLeft(lit(0L)) { (acc, b) =>
      val vote = aggregate(tokenArr, lit(0L),
        (s, t) => s + (shiftright(xxhash64(t), b).bitwiseAND(lit(1L)) * 2 - 1))
      acc.bitwiseOR(when(vote > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
    }

  /** The 16-bit chunks of a 64-bit SimHash — pigeonhole banding: two signatures
    * within Hamming distance 3 share at least one of the 4 chunks. */
  def simhash_chunks(sig: Column): Column =
    array((0 until 4).map(c =>
      struct(lit(c).as("band"),
        shiftrightunsigned(sig, c * 16).bitwiseAND(lit(0xFFFFL)).as("sig"))): _*)

  /** Exact Jaccard similarity of two token-array columns (distinct semantics). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(1.0)).otherwise(inter / uni)
  }

  /**
   * Signed-random-projection (hyperplane) LSH bucket for a float vector:
   * `nBits` sign bits of dot products with pseudo-random hyperplanes derived
   * deterministically from xxhash64(bit:dim) — no stored model, identical on
   * every executor. Returns a long bucket id of `nBits` bits.
   */
  def hyperplane_bucket(vec: Column, nBits: Int): Column =
    (0 until nBits).foldLeft(lit(0L)) { (acc, b) =>
      val dot = aggregate(
        zip_with(vec, transform(sequence(lit(0), size(vec) - 1), d =>
          // deterministic pseudo-uniform weight in [-1, 1)
          (pmod(xxhash64(concat(lit(s"$b:"), d.cast("string"))), lit(1000000L))
            .cast("double") / 500000.0) - 1.0),
          (x, w) => x.cast("double") * w),
        lit(0.0), (s, p) => s + p)
      acc.bitwiseOR(when(dot > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
    }

  /** Karp–Rabin rolling fingerprint of a string: base-31 polynomial over chars,
    * modulo 2^31-1 (Mersenne prime) — overflow-free under ANSI. */
  def rolling_hash(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (acc, ch) => pmod(acc * 31 + ascii(ch).cast("long"), lit(2147483647L)))

  /** Hex MD5 content fingerprint (cross-engine stable — DuckDB `md5()` matches). */
  def fingerprint_md5(text: Column): Column = md5(text.cast("binary"))
}
