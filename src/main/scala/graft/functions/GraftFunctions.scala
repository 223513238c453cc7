package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft._

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

  /** Cosine of an int8-quantized vector against a float query (native
    * codegen expression; scale-invariant, so the quantization scale never
    * loads — the quantized-ANN hot loop). */
  def cosine_sim_int8(qvec: Column, query: Column): Column =
    Bridge.column(CosineSimilarityInt8(
      Bridge.expression(qvec), Bridge.expression(query.cast("array<float>"))))

  /** Cosine of TWO int8-quantized vectors (native; bit-identical to
    * [[cosine_sim_int8]] over a float-cast side but without the per-pair
    * array materialization — the all-pairs semantic-dedup inner loop). */
  def cosine_sim_int8_pair(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarityInt8Pair(
      Bridge.expression(a), Bridge.expression(b)))

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

  /** Hashed shingles in one compiled pass (`array<string>` raw split →
    * `array<long>`): byte-identical to `token_hashes(shingles(text, n))` but
    * ~15× faster — the shingling HOF chain is CodegenFallback. Feed it
    * `split(text, " ")` directly; empties are skipped inside the loop. */
  def shingle_hashes(rawTokens: Column, n: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(rawTokens), n))

  /** One 64-bit xxhash per token (`array<string>` -> `array<long>`): the single
    * string-touching pass of the signature pipelines. Native expression — the
    * HOF (`transform`) formulation is CodegenFallback and ~1000x slower. */
  def token_hashes(tokenArr: Column): Column =
    Bridge.column(TokenHashes(Bridge.expression(tokenArr)))

  /** Top 60 md5 bits of a string column in one expression (no hex-string /
    * substring / conv allocations per row). DuckDB twin:
    * `('0x' || substr(md5(x),1,15))::BIGINT`. */
  def md5_prefix60(s: Column): Column =
    Bridge.column(Md5Prefix60(Bridge.expression(s)))

  /** Max element multiplicity of an `array<long>` — per-row repetition
    * statistic; keeps repetition profiling shuffle-free (see q66). */
  def max_multiplicity(arr: Column): Column =
    Bridge.column(MaxMultiplicity(Bridge.expression(arr)))

  /** Cross-engine-stable token hashing: top 60 bits of each token's MD5 —
    * DuckDB twin `('0x' || substr(md5(t),1,15))::BIGINT`. Use for signature
    * pipelines that must be replayable as an exact SQL oracle. */
  def md5_token_hashes(tokenArr: Column): Column =
    Bridge.column(Md5TokenHashes(Bridge.expression(tokenArr)))

  /** MinHash signature over pre-hashed tokens: slot i = min over tokens of
    * XXH64(h, seed=i). Tight primitive loop, no boxing. */
  def minhash_signature_from_hashes(hashArr: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(hashArr), numHashes))

  /** MinHash signature from raw tokens (convenience: [[token_hashes]] then
    * [[minhash_signature_from_hashes]]). */
  def minhash_signature(tokenArr: Column, numHashes: Int): Column =
    minhash_signature_from_hashes(token_hashes(tokenArr), numHashes)

  /** LSH band keys from a MinHash signature: one XXH64 chain per band of
    * `rowsPerBand` slots, seeded by the band index. Docs sharing any band key
    * become candidate pairs. Output explodes to (band, sig). */
  def minhash_bands(sig: Column, rowsPerBand: Int): Column =
    Bridge.column(MinHashBands(Bridge.expression(sig), rowsPerBand))

  /** 64-bit SimHash over pre-hashed tokens: bit b set iff the +-1 votes from
    * bit b of each token hash sum positive. One pass, 64 counters. */
  def simhash64_from_hashes(hashArr: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(hashArr)))

  /** SimHash from raw tokens (convenience; hot pipelines materialize
    * [[token_hashes]] once — Dedup.simHash does). */
  def simhash64(tokenArr: Column): Column =
    simhash64_from_hashes(token_hashes(tokenArr))

  /** The 16-bit chunks of a 64-bit SimHash — pigeonhole banding: two signatures
    * within Hamming distance 3 share at least one of the 4 chunks. */
  def simhash_chunks(sig: Column): Column =
    array((0 until 4).map(c =>
      struct(lit(c).as("band"),
        shiftrightunsigned(sig, c * 16).bitwiseAND(lit(0xFFFFL)).as("sig"))): _*)

  /** All `id_a < id_b` pairs from one posting list of `struct<id, n>` entries
    * (native; see `OrderedPairs`) — the join-free inverted-index pair stream. */
  def ordered_pairs(docs: Column): Column =
    Bridge.column(OrderedPairs(Bridge.expression(docs)))

  /** Count of array elements in a constant set, with multiplicity (native —
    * one hash probe per token; the `filter`+`isin` HOF form is interpreted). */
  def count_in_set(arr: Column, set: Seq[String]): Column =
    Bridge.column(CountInSet(Bridge.expression(arr), set))

  /** Exact Jaccard similarity of two token-array columns (distinct semantics). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(1.0)).otherwise(inter / uni)
  }

  /** Signed-random-projection (hyperplane) LSH bucket: `nBits` sign bits of
    * dot products with XXH64-derived pseudo-random hyperplanes (native
    * expression; driver-side twin: `HyperplaneBucket.compute`). */
  def hyperplane_bucket(vec: Column, nBits: Int): Column =
    Bridge.column(org.apache.spark.sql.graft.HyperplaneBucket(
      Bridge.expression(vec.cast("array<float>")), nBits))

  /** Cross-engine-stable SRP bucket (md5 integer weights + floor-quantized
    * integer dot product — exactly replayable in DuckDB SQL; see
    * `Md5HyperplaneBucket`). Driver-side twin: `Md5HyperplaneBucket.compute`. */
  def md5_hyperplane_bucket(vec: Column, nBits: Int): Column =
    Bridge.column(org.apache.spark.sql.graft.Md5HyperplaneBucket(
      Bridge.expression(vec.cast("array<float>")), nBits))

  /** Johnson-Lindenstrauss signed random projection to `outDim` integer
    * coordinates — the same md5 planes as [[md5_hyperplane_bucket]] kept as
    * full dot products instead of sign bits, so every coordinate replays
    * exactly in SQL (see `Md5RandomProjection`). Driver-side twin:
    * `Md5RandomProjection.compute`. */
  def md5_random_projection(vec: Column, outDim: Int): Column =
    Bridge.column(org.apache.spark.sql.graft.Md5RandomProjection(
      Bridge.expression(vec.cast("array<float>")), outDim))

  /** Distributed bloom-filter build over a LONG column (Spark's own
    * `BloomFilterAggregate`, the engine's runtime-join-filter sketch): each
    * partition fills a local filter, buffers merge to ONE binary blob.
    * Duplicate inputs are free (putLong is idempotent), so no pre-distinct
    * pass is needed. `numBits` must stay within
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (64M default). */
  def bloom_filter_agg(c: Column, expectedItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.{aggregate => cae, Literal}
    Bridge.column(new cae.BloomFilterAggregate(Bridge.expression(c),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
  }

  /** Codegen'd bloom probe of a LONG column against a serialized filter built
    * by [[bloom_filter_agg]] (Spark's `BloomFilterMightContain`; the blob
    * rides along as a binary literal in the task binary). False positives at
    * the filter's design rate; never false negatives. */
  def bloom_might_contain(bloom: Array[Byte], c: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    Bridge.column(BloomFilterMightContain(
      Literal(bloom, org.apache.spark.sql.types.BinaryType), Bridge.expression(c)))
  }

  /** Count of `array<long>` elements that might be in a serialized bloom
    * filter built by [[bloom_filter_agg]] (native — one long-probe per
    * element, blob deserialized once per task; the
    * `size(filter(arr, s => bloom_might_contain(...)))` HOF form walks an
    * interpreted lambda per element). Overcounts by the filter's
    * false-positive rate; never undercounts. */
  def count_in_bloom(arr: Column, bloom: Array[Byte]): Column =
    Bridge.column(CountInBloom(Bridge.expression(arr), bloom))

  /** Karp–Rabin rolling fingerprint of a string: base-31 polynomial over chars,
    * modulo 2^31-1 (Mersenne prime) — overflow-free under ANSI. */
  def rolling_hash(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (acc, ch) => pmod(acc * 31 + ascii(ch).cast("long"), lit(2147483647L)))

  /** Hex MD5 content fingerprint (cross-engine stable — DuckDB `md5()` matches). */
  def fingerprint_md5(text: Column): Column = md5(text.cast("binary"))
}
