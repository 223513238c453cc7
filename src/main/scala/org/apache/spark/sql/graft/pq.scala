/*
 * Native expressions for product-quantization ANN (graft.ops.Similarity's
 * pqTrain/pqEncode/pqTopK). The codebook rides as a plain constructor
 * constant (the [[Md5RandomProjection]] pattern): a Column-arithmetic
 * formulation of the same math builds an m·ksub·subDim-term literal tree
 * (~5,600 nodes at defaults) whose janino compilation alone cost tens of
 * seconds per stage — SF-independent, measured on q110 — while these tight
 * primitive loops evaluate the identical IEEE arithmetic (left-fold double
 * sums, first-minimum tie-breaks) at a few thousand flops per row.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * PQ encoding: `array<float>` vector → `array<int>` of length m, entry j =
 * the L2-argmin centroid index of subspace j (first-listed centroid wins
 * ties — the strict-`<` loop, matching `array_position(array_min)`
 * semantics). Distances accumulate left-to-right in double precision over
 * the float→double-promoted elements, so the SAME function evaluated on a
 * query (see [[PqDistTable]]) produces bit-equal values — an exact copy of a
 * query provably encodes to the query's per-subspace argmin code. Vectors
 * shorter than the codebook's dimension yield NULL.
 */
case class PqEncode(child: Expression, cents: Array[Array[Array[Double]]])
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  require(cents.nonEmpty && cents(0).nonEmpty && cents(0)(0).nonEmpty,
    "codebook must be non-empty")

  private val m = cents.length
  private val subDim = cents(0)(0).length

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < m * subDim) return null
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cs = cents(j)
      val off = j * subDim
      var best = 0; var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cs.length) {
        val cent = cs(c)
        var d = 0.0; var i = 0
        while (i < subDim) {
          val t = v.getFloat(off + i).toDouble - cent(i)
          d += t * t; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best; j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * The query side of asymmetric-distance scoring: `array<float>` query →
 * `array<double>` of length m·ksub, entry `j·ksub + c` = squared L2 distance
 * of the query's subspace-j slice to centroid c — the SAME loop and fold
 * order as [[PqEncode]] (evaluated on a one-row frame, the anti-divergence
 * discipline of `ivfProbeCells`). NULL for short vectors.
 */
case class PqDistTable(child: Expression, cents: Array[Array[Array[Double]]])
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  require(cents.nonEmpty && cents(0).nonEmpty && cents(0)(0).nonEmpty,
    "codebook must be non-empty")

  private val m = cents.length
  private val ksub = cents(0).length
  private val subDim = cents(0)(0).length

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_dist_table"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < m * subDim) return null
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      val cs = cents(j)
      val off = j * subDim
      var c = 0
      while (c < cs.length) {
        val cent = cs(c)
        var d = 0.0; var i = 0
        while (i < subDim) {
          val t = v.getFloat(off + i).toDouble - cent(i)
          d += t * t; i += 1
        }
        out(j * ksub + c) = d; c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * ADC score of one PQ code against a [[PqDistTable]] result collected to the
 * driver: Σ_j tables[j·ksub + code(j)], accumulated left-to-right — m array
 * lookups and adds per corpus row, the whole scan-side cost of a PQ probe.
 * NULL when the code's length disagrees with the table's m.
 */
case class PqAdc(child: Expression, tables: Array[Double], ksub: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  require(ksub > 0 && tables.nonEmpty && tables.length % ksub == 0,
    "tables length must be a positive multiple of ksub")

  private val m = tables.length / ksub

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(input: Any): Any = {
    val code = input.asInstanceOf[ArrayData]
    if (code.numElements() != m) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      acc += tables(j * ksub + code.getInt(j))
      j += 1
    }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
