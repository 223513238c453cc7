package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Signed-random-projection (hyperplane) LSH bucket for a float vector: bit b of
 * the result is the sign of the dot product with pseudo-random hyperplane b,
 * whose weights derive deterministically from XXH64 — no stored model, identical
 * on every executor AND on the driver (see [[HyperplaneBucket.compute]], which
 * lets query-side code compute its probe bucket as a plain literal instead of
 * re-evaluating an expression per row).
 */
case class HyperplaneBucket(child: Expression, nBits: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val v = new Array[Float](arr.numElements())
    var i = 0
    while (i < v.length) { v(i) = arr.getFloat(i); i += 1 }
    HyperplaneBucket.compute(v, nBits)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Cross-engine-stable SRP bucket: the same signed-random-projection idea as
 * [[HyperplaneBucket]], but every quantity is exactly replayable in DuckDB SQL:
 * weights come from md5 ("plane:dim" → top 60 md5 bits % 1000001 − 500000) and
 * the vector is quantized to integers with floor(v·10⁶), so the dot product is
 * pure bigint arithmetic — no float summation order to drift. This is the
 * bucket scheme to use when the ANN pipeline must be oracle-checked end to end;
 * [[HyperplaneBucket]] (XXH64 + double dot) is the faster default.
 */
case class Md5HyperplaneBucket(child: Expression, nBits: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hyperplane_bucket"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val v = new Array[Float](arr.numElements())
    var i = 0
    while (i < v.length) { v(i) = arr.getFloat(i); i += 1 }
    Md5HyperplaneBucket.compute(v, nBits)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5HyperplaneBucket {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Long]]]()

  /** Integer weight for (plane b, dim d): top 60 bits of md5("b:d"), mapped to
    * [-500000, 500000]. DuckDB twin:
    * `(('0x' || substr(md5(b || ':' || d), 1, 15))::BIGINT % 1000001) - 500000`.
    * Shared with [[Md5RandomProjection]] — the projection IS these planes'
    * dot products, before the sign-bit reduction. */
  private[graft] def weights(nBits: Int, dim: Int): Array[Array[Long]] =
    cache.computeIfAbsent((nBits, dim), { _ =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(nBits, dim) { (b, d) =>
        md.reset()
        val dg = md.digest(s"$b:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var v = 0L
        var i = 0
        while (i < 8) { v = (v << 8) | (dg(i) & 0xFFL); i += 1 }
        ((v >>> 4) % 1000001L) - 500000L
      }
    })

  /** The bucket id — shared by the expression eval and driver-side callers.
    * floor-quantization (not round) so no half-way tie rule can diverge. */
  def compute(v: Array[Float], nBits: Int): Long = {
    val w = weights(nBits, v.length)
    var sig = 0L
    var b = 0
    while (b < nBits) {
      var dot = 0L
      var d = 0
      while (d < v.length) {
        dot += math.floor(v(d).toDouble * 1000000.0).toLong * w(b)(d)
        d += 1
      }
      if (dot > 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}

object HyperplaneBucket {
  /** Deterministic pseudo-uniform weight in [-1, 1) for (plane b, dim d). */
  @inline def weight(b: Int, d: Int): Double = {
    val h = XXH64.hashLong((b.toLong << 32) | (d.toLong & 0xFFFFFFFFL), 9001L)
    val m = ((h % 1000000L) + 1000000L) % 1000000L
    m.toDouble / 500000.0 - 1.0
  }

  /** The bucket id — shared by the expression eval and driver-side callers. */
  def compute(v: Array[Float], nBits: Int): Long = {
    var sig = 0L
    var b = 0
    while (b < nBits) {
      var dot = 0.0
      var d = 0
      while (d < v.length) { dot += v(d).toDouble * weight(b, d); d += 1 }
      if (dot > 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}

/**
 * Cross-engine-stable signed random projection to `outDim` integer
 * coordinates — Johnson-Lindenstrauss dimensionality reduction with the SAME
 * md5 integer weights and floor-quantized vector as [[Md5HyperplaneBucket]]
 * (which is exactly this projection reduced to its sign bits). Each output
 * coordinate is pure bigint arithmetic, so a SQL oracle replays every value
 * EXACTLY — no float accumulation order to drift. Bounds: |coord| ≤
 * dim · 5·10⁵ · max|v|·10⁶ (≈ 3.2·10¹³ for unit 64-dim vectors) — far inside
 * bigint for any realistic embedding width.
 */
case class Md5RandomProjection(child: Expression, outDim: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  require(outDim >= 1, s"outDim must be >= 1, got $outDim")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_random_projection"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val v = new Array[Float](arr.numElements())
    var i = 0
    while (i < v.length) { v(i) = arr.getFloat(i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Md5RandomProjection.compute(v, outDim))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5RandomProjection {
  /** The projected coordinates — shared by the expression eval and
    * driver-side callers (query vectors project as plain literals). */
  def compute(v: Array[Float], outDim: Int): Array[Long] = {
    val w = Md5HyperplaneBucket.weights(outDim, v.length)
    val out = new Array[Long](outDim)
    var b = 0
    while (b < outDim) {
      var dot = 0L
      var d = 0
      while (d < v.length) {
        dot += math.floor(v(d).toDouble * 1000000.0).toLong * w(b)(d)
        d += 1
      }
      out(b) = dot
      b += 1
    }
    out
  }
}
