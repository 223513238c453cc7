/*
 * Native signature expressions for graft's dedup/LSH operators.
 *
 * Why native: Spark's higher-order functions (transform/aggregate lambdas) are
 * CodegenFallback — every element evaluation is an interpreted tree walk with
 * boxing. A MinHash signature is numHashes × tokens lambda invocations per row;
 * measured ~40 ms/row interpreted vs ~40 µs/row as a primitive loop (1000×).
 * These expressions keep the per-row tight loop in compiled Scala over
 * primitive arrays (no per-element boxing), using Spark's own XXH64.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * MinHash signature over pre-hashed tokens (`array<long>`): slot i is
 * min over tokens of XXH64(tokenHash, seed = i). Empty input yields
 * Long.MaxValue slots (so disjoint empty docs still "collide" — callers filter
 * empty docs upstream if that matters).
 */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      var min = Long.MaxValue
      var j = 0
      while (j < n) {
        val h = XXH64.hashLong(hs.getLong(j), i)
        if (h < min) min = h
        j += 1
      }
      out(i) = min
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * SimHash-64 over pre-hashed tokens: bit b of the result is set iff the sum of
 * ±1 votes (bit b of each token hash) is positive. One pass over the tokens,
 * 64 counters, no allocation beyond the counter array.
 */
case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var b = 0
      while (b < 64) {
        votes(b) += (((h >>> b) & 1L).toInt << 1) - 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * LSH band keys from a MinHash signature: band b is the XXH64 chain over its
 * `rowsPerBand` slots (seeded by b so identical slot values in different bands
 * do not collide). Output: `array<struct<band:int, sig:long>>` ready to explode.
 */
case class MinHashBands(child: Expression, rowsPerBand: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("band", IntegerType, nullable = false),
      StructField("sig", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    val nBands = sig.numElements() / rowsPerBand
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      var acc = b.toLong
      var j = 0
      while (j < rowsPerBand) {
        acc = XXH64.hashLong(sig.getLong(b * rowsPerBand + j), acc)
        j += 1
      }
      out(b) = org.apache.spark.sql.catalyst.InternalRow(b, acc)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Cross-engine-stable token hashing: `array<string>` → `array<long>` where each
 * hash is the top 60 bits of the token's MD5 (= the first 15 hex digits of the
 * digest parsed as an integer). DuckDB computes the identical value with
 * `('0x' || substr(md5(t), 1, 15))::BIGINT`, which makes every signature built
 * on these hashes (SimHash votes, Jaccard over hashed sets) replayable as an
 * exact SQL oracle. Use [[TokenHashes]] (XXH64) when oracle parity is not
 * needed — it is ~4× faster per token.
 */
case class Md5TokenHashes(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_token_hashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    val md = Md5TokenHashes.digest.get()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      out(i) =
        if (s == null) 0L
        else {
          md.reset()
          val d = md.digest(s.getBytes)
          // first 8 digest bytes big-endian = first 16 hex digits; >>> 4 keeps
          // the leading 15 (60 bits, safely inside a signed long under ANSI)
          var v = 0L
          var b = 0
          while (b < 8) { v = (v << 8) | (d(b) & 0xFFL); b += 1 }
          v >>> 4
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5TokenHashes {
  private[graft] val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

/**
 * Hashed word-n-gram shingles straight from a whitespace-split array:
 * `array<string>` → `array<long>` where slot i is XXH64("tok_i tok_i+1 …",
 * seed 42) — byte-identical to `token_hashes(shingles(text, n))`, but one
 * compiled pass. The HOF formulation (`transform` + `slice` + `concat_ws`)
 * is CodegenFallback: measured 3.0 s for sf0.1's 15k documents vs ~0.2 s here.
 * Empty strings in the input (split artifacts) are skipped; fewer than `n`
 * surviving tokens yield the single shingle of all tokens (matching
 * `GraftFunctions.shingles`).
 */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val arr = input.asInstanceOf[ArrayData]
    val total = arr.numElements()
    val toks = new Array[UTF8String](total)
    var m = 0
    var i = 0
    while (i < total) {
      val t = arr.getUTF8String(i)
      if (t != null && t.numBytes() > 0) { toks(m) = t; m += 1 }
      i += 1
    }
    val sep = ShingleHashes.space
    def hashRange(from: Int, until: Int): Long = {
      val joined = UTF8String.concatWs(sep,
        java.util.Arrays.copyOfRange(toks, from, until): _*)
      XXH64.hashUnsafeBytes(joined.getBaseObject, joined.getBaseOffset,
        joined.numBytes(), 42L)
    }
    val out =
      if (m < n) Array(hashRange(0, m))
      else {
        val o = new Array[Long](m - n + 1)
        var s = 0
        while (s <= m - n) { o(s) = hashRange(s, s + n); s += 1 }
        o
      }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  private val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
}

/**
 * Top 60 bits of the md5 of a string — the engine-portable register/bucket
 * hash, as one expression. Identical to
 * `conv(substring(md5(cast(x as binary)), 1, 15), 16, 10)` (and to DuckDB's
 * `('0x' || substr(md5(x), 1, 15))::BIGINT`) but without materializing the
 * 32-char hex string, the substring, and the base-conversion parse per row —
 * the digest's first 8 bytes are consumed directly. Used by the relational
 * HyperLogLog (q37) and the deterministic hash split (q43) on every row of
 * the fact table, where the per-row allocation chain is what shows up at
 * 100 TB row counts.
 */
case class Md5Prefix60(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val md = Md5TokenHashes.digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var b = 0
    while (b < 8) { v = (v << 8) | (d(b) & 0xFFL); b += 1 }
    v >>> 4
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix60 {
  /** Driver-side twin of the expression (same bytes, same shift) — lets a
    * probe compute its bucket locally so the scan filter is a literal. */
  def compute(s: String): Long = {
    val md = Md5TokenHashes.digest.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var b = 0
    while (b < 8) { v = (v << 8) | (d(b) & 0xFFL); b += 1 }
    v >>> 4
  }
}

/**
 * All ordered pairs from one inverted-index posting list:
 * `array<struct<id:long, n:int>>` → `array<struct<id_a, n_a, id_b, n_b>>`
 * with `id_a < id_b`. Entries are sorted by id internally, so output pairs are
 * canonical regardless of `collect_list` accumulation order. Replaces the
 * inverted-index SELF-JOIN in similarity pipelines: `groupBy(shingle) →
 * collect_list → explode(ordered_pairs)` produces the same pair stream with
 * one shuffle instead of two join-side exchanges, and carrying `n` (the doc's
 * set size) through the pair removes the two post-join size lookups entirely.
 */
case class OrderedPairs(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(
    StructType(Seq(StructField("id", LongType), StructField("n", IntegerType)))))
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id_a", LongType, nullable = false),
      StructField("n_a", IntegerType, nullable = false),
      StructField("id_b", LongType, nullable = false),
      StructField("n_b", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "ordered_pairs"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = arr.numElements()
    // pair count computed in Long: a hot shingle shared by >=65536 docs would
    // overflow k*(k-1)/2 in Int arithmetic and crash with a wrapped array size
    val nPairs = k.toLong * (k - 1) / 2
    if (nPairs > Int.MaxValue)
      throw new IllegalStateException(
        s"ordered_pairs: posting list of $k entries would emit $nPairs pairs — " +
          "cap hot shingles with maxDf before exploding pairs")
    val ids = new Array[Long](k)
    val ns = new Array[Int](k)
    var i = 0
    while (i < k) {
      val row = arr.getStruct(i, 2)
      ids(i) = row.getLong(0)
      ns(i) = row.getInt(1)
      i += 1
    }
    // insertion sort by id (posting lists are short in deduplicated corpora)
    i = 1
    while (i < k) {
      val id = ids(i); val n = ns(i)
      var j = i - 1
      while (j >= 0 && ids(j) > id) { ids(j + 1) = ids(j); ns(j + 1) = ns(j); j -= 1 }
      ids(j + 1) = id; ns(j + 1) = n
      i += 1
    }
    val out = new Array[Any](nPairs.toInt)
    var o = 0
    var a = 0
    while (a < k) {
      var b = a + 1
      while (b < k) {
        out(o) = org.apache.spark.sql.catalyst.InternalRow(ids(a), ns(a), ids(b), ns(b))
        o += 1
        b += 1
      }
      a += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Count of array elements contained in a constant string set (with
 * multiplicity) — the marker-hit primitive of language-ID and quality scoring.
 * The HOF formulation `size(filter(arr, t => t.isin(...)))` is CodegenFallback:
 * every token walks an interpreted In-expression tree. Here it is one hash-set
 * probe per token.
 */
case class CountInSet(child: Expression, set: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in_set"

  @transient private lazy val utf8Set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](set.size * 2)
    set.foreach(v => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(v)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null && utf8Set.contains(t)) hits += 1
      i += 1
    }
    hits
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Token hashing: `array<string>` → `array<long>` of XXH64(utf8 bytes), the
  * single string-touching pass the signature pipeline runs. */
case class TokenHashes(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_hashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      out(i) =
        if (s == null) 0L
        else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Maximum multiplicity of any element in an `array<long>` — the per-document
 * "most repeated n-gram count" statistic of repetition-quality filtering.
 * Sorts a copy and counts the longest run: O(k log k) inside the row. This is
 * what makes repetition profiling (q66) SHUFFLE-FREE: the classic
 * explode → groupBy(doc, gram) → max formulation pushes every n-gram
 * occurrence of the corpus through an exchange, while this computes the same
 * number per row and only the per-document scalars move.
 */
case class MaxMultiplicity(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "max_multiplicity"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = arr.numElements()
    // copy skipping nulls — null grams carry no repetition signal
    val a = new Array[Long](k)
    var m = 0
    var i = 0
    while (i < k) {
      if (!arr.isNullAt(i)) { a(m) = arr.getLong(i); m += 1 }
      i += 1
    }
    if (m == 0) 0
    else {
      java.util.Arrays.sort(a, 0, m)
      var best = 1
      var run = 1
      i = 1
      while (i < m) {
        if (a(i) == a(i - 1)) { run += 1; if (run > best) best = run }
        else run = 1
        i += 1
      }
      best
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Count of `array<long>` elements that might be in a serialized bloom filter
 * (built by `bloom_filter_agg`) — the per-row probe of ingest-time
 * decontamination. The HOF formulation
 * `size(filter(arr, s => bloom_might_contain(blob, s)))` walks an interpreted
 * lambda per element in the ONE operator whose contract is "runs at ingest
 * bandwidth"; here it is a tight loop over the filter's long-probe, with the
 * blob deserialized once per task (not per row). Like the filter itself the
 * count OVERCOUNTS by the false-positive rate and never undercounts.
 */
case class CountInBloom(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in_bloom"

  // Array[Byte] compares by reference in case-class equality, which would make
  // two probes of byte-identical filters semantically unequal — defeating
  // canonicalization/common-subexpression elimination every other expression
  // here supports. Compare (and hash) the blob by content.
  override def equals(other: Any): Boolean = other match {
    case CountInBloom(c, b) =>
      c == child && java.util.Arrays.equals(b, bloomBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)

  @transient private lazy val filter: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val f = filter
    var hits = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && f.mightContainLong(arr.getLong(i))) hits += 1
      i += 1
    }
    hits
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
