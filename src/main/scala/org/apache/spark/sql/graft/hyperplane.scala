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
