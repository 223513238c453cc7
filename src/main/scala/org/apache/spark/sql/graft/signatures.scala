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
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
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
