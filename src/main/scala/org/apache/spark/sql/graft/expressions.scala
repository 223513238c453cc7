/*
 * Native Catalyst expressions for graft's similarity/dedup hot paths, plus the
 * Column <-> Expression bridge. Lives under org.apache.spark.sql because the
 * pieces a performance-minded extension needs (`ExpressionUtils`,
 * `AbstractDataType` for ExpectsInputTypes) are private[sql] — this is the
 * standard pattern used by public Spark extension libraries.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Column <-> catalyst Expression bridge for graft code outside this package. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/**
 * Cosine similarity between two `array<float>` columns, computed in double
 * precision, fully inside whole-stage codegen (no boxing, no UDF — a Scala UDF
 * here would box every float, which matters when scoring 10^11 vectors).
 * Zero-norm inputs yield 0.0; unequal lengths compare over the common prefix.
 */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Cosine similarity between an int8-quantized vector (`array<tinyint>`, the
 * [[graft.ops.Similarity.quantizeInt8]] storage form) and a float query —
 * the hot loop of brute-force ANN over a quantized corpus. Cosine is
 * scale-invariant, so the per-vector quantization scale never loads; the
 * scan reads a quarter of the float32 bytes and the loop stays inside
 * whole-stage codegen (a HOF cast here would interpret per element).
 * Zero-norm inputs yield 0.0; unequal lengths compare the common prefix.
 */
case class CosineSimilarityInt8(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ByteType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim_int8"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getByte(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getByte($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Cosine similarity between TWO int8-quantized vectors — the all-pairs
 * inner loop of semantic dedup, where both sides of the pair join are the
 * stored `array<tinyint>` form. Arithmetic is bit-identical to
 * [[CosineSimilarityInt8]] over a float-cast right side (byte → double is
 * exact either way), but skips the per-PAIR array materialization the cast
 * would pay: an O(cell²) pair pass evaluates this expression millions of
 * times per cell, so the avoided allocation is the difference between a
 * byte-read loop and a GC storm. Zero-norm inputs yield 0.0; unequal
 * lengths compare the common prefix.
 */
case class CosineSimilarityInt8Pair(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ByteType), ArrayType(ByteType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim_int8_pair"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getByte(i).toDouble
      val y = b.getByte(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getByte($i);
         |  double $y = (double) $b.getByte($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Hamming distance between two 64-bit SimHash signatures: `popcount(a ^ b)`.
 * One XOR + one POPCNT instruction under codegen — the inner loop of SimHash
 * near-dup join verification.
 */
case class HammingDistance64(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming64"

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Long.bitCount(l.asInstanceOf[Long] ^ r.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * The key→file router of `graft.store.KeyedStore.mergeIndexed`: index of the
 * unique sorted range `[los(i), his(i)]` containing the child key, or -1
 * (null keys route to -1, never null — callers filter on `>= 0`). Replaces
 * the round-13 Scala UDF (a per-row `BigDecimal(string)` parse with boxed
 * comparisons that blocked whole-stage codegen — the serialization wall on a
 * billion-row mutation batch). Typed variants keep the comparison exact in
 * the key's own value space; bounds are ascending and non-overlapping (the
 * writeIndexed layout invariant), so the binary search routes exactly —
 * exactness is load-bearing here: a boundary mis-route would upsert a key
 * into a file that does not hold its current row, leaving a duplicate.
 */
abstract class RangeBucketSearch extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
}

case class RangeBucketSearchLong(child: Expression,
    los: Array[Long], his: Array[Long]) extends RangeBucketSearch {
  override def prettyName: String = "range_bucket_long"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) -1
    else {
      val k = v.asInstanceOf[Long]
      var lo = 0; var hi = los.length - 1; var found = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (los(mid) <= k) { found = mid; lo = mid + 1 } else hi = mid - 1
      }
      if (found >= 0 && k <= his(found)) found else -1
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val losRef = ctx.addReferenceObj("los", los, "long[]")
    val hisRef = ctx.addReferenceObj("his", his, "long[]")
    val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid"); val found = ctx.freshName("found")
    val k = ctx.freshName("k")
    ev.copy(code = code"""
      ${c.code}
      int ${ev.value} = -1;
      if (!${c.isNull}) {
        long $k = ${c.value};
        int $lo = 0; int $hi = $losRef.length - 1; int $found = -1;
        while ($lo <= $hi) {
          int $mid = ($lo + $hi) >>> 1;
          if ($losRef[$mid] <= $k) { $found = $mid; $lo = $mid + 1; }
          else $hi = $mid - 1;
        }
        if ($found >= 0 && $k <= $hisRef[$found]) ${ev.value} = $found;
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class RangeBucketSearchDouble(child: Expression,
    los: Array[Double], his: Array[Double]) extends RangeBucketSearch {
  override def prettyName: String = "range_bucket_double"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) -1
    else {
      val k = v.asInstanceOf[Double]
      var lo = 0; var hi = los.length - 1; var found = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (los(mid) <= k) { found = mid; lo = mid + 1 } else hi = mid - 1
      }
      if (found >= 0 && k <= his(found)) found else -1
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val losRef = ctx.addReferenceObj("los", los, "double[]")
    val hisRef = ctx.addReferenceObj("his", his, "double[]")
    val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid"); val found = ctx.freshName("found")
    val k = ctx.freshName("k")
    ev.copy(code = code"""
      ${c.code}
      int ${ev.value} = -1;
      if (!${c.isNull}) {
        double $k = ${c.value};
        int $lo = 0; int $hi = $losRef.length - 1; int $found = -1;
        while ($lo <= $hi) {
          int $mid = ($lo + $hi) >>> 1;
          if ($losRef[$mid] <= $k) { $found = $mid; $lo = $mid + 1; }
          else $hi = $mid - 1;
        }
        if ($found >= 0 && $k <= $hisRef[$found]) ${ev.value} = $found;
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class RangeBucketSearchString(child: Expression,
    los: Array[UTF8String], his: Array[UTF8String]) extends RangeBucketSearch {
  override def prettyName: String = "range_bucket_string"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) -1
    else {
      val k = v.asInstanceOf[UTF8String]
      var lo = 0; var hi = los.length - 1; var found = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (los(mid).compareTo(k) <= 0) { found = mid; lo = mid + 1 } else hi = mid - 1
      }
      if (found >= 0 && k.compareTo(his(found)) <= 0) found else -1
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val cls = "org.apache.spark.unsafe.types.UTF8String[]"
    val losRef = ctx.addReferenceObj("los", los, cls)
    val hisRef = ctx.addReferenceObj("his", his, cls)
    val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid"); val found = ctx.freshName("found")
    val k = ctx.freshName("k")
    ev.copy(code = code"""
      ${c.code}
      int ${ev.value} = -1;
      if (!${c.isNull}) {
        org.apache.spark.unsafe.types.UTF8String $k = ${c.value};
        int $lo = 0; int $hi = $losRef.length - 1; int $found = -1;
        while ($lo <= $hi) {
          int $mid = ($lo + $hi) >>> 1;
          if ($losRef[$mid].compareTo($k) <= 0) { $found = $mid; $lo = $mid + 1; }
          else $hi = $mid - 1;
        }
        if ($found >= 0 && $k.compareTo($hisRef[$found]) <= 0) ${ev.value} = $found;
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Decimal-keyed router (round 15 — the last key type off the Scala-UDF
  * fallback): bounds are [[Decimal]]s carrying the index's exact unscaled
  * values; comparison is `Decimal.compareTo` (BigDecimal-exact across
  * scales), in the key's own value space like every sibling variant. */
case class RangeBucketSearchDecimal(child: Expression,
    los: Array[Decimal], his: Array[Decimal]) extends RangeBucketSearch {
  override def prettyName: String = "range_bucket_decimal"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) -1
    else {
      val k = v.asInstanceOf[Decimal]
      var lo = 0; var hi = los.length - 1; var found = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (los(mid).compareTo(k) <= 0) { found = mid; lo = mid + 1 } else hi = mid - 1
      }
      if (found >= 0 && k.compareTo(his(found)) <= 0) found else -1
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val cls = "org.apache.spark.sql.types.Decimal[]"
    val losRef = ctx.addReferenceObj("los", los, cls)
    val hisRef = ctx.addReferenceObj("his", his, cls)
    val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid"); val found = ctx.freshName("found")
    val k = ctx.freshName("k")
    ev.copy(code = code"""
      ${c.code}
      int ${ev.value} = -1;
      if (!${c.isNull}) {
        org.apache.spark.sql.types.Decimal $k = ${c.value};
        int $lo = 0; int $hi = $losRef.length - 1; int $found = -1;
        while ($lo <= $hi) {
          int $mid = ($lo + $hi) >>> 1;
          if ($losRef[$mid].compareTo($k) <= 0) { $found = $mid; $lo = $mid + 1; }
          else $hi = $mid - 1;
        }
        if ($found >= 0 && $k.compareTo($hisRef[$found]) <= 0) ${ev.value} = $found;
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
