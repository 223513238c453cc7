package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) storage layout — multi-dimensional pruning for box
 * queries over two correlated access dimensions (the lakehouse OPTIMIZE
 * ZORDER BY discipline, built from plain parquet + directory partitioning):
 * interleave the bits of two bucketized key columns into one `zb` partition
 * value, so a rectangle in (a, b) space touches only the partitions whose
 * decoded bucket rectangle intersects it — pruned BEFORE any row is read,
 * by a literal IN-list on the partition column (the
 * [[Similarity.ivfTopKFromPartitioned]] / BM25-index probe discipline).
 *
 * Bucketization is power-of-two (`a >> aShift`, masked to `bits`), so the
 * z-value is a pure codegen'd shift/or chain and every bucket decodes to an
 * exact half-open rectangle on the driver — probe enumeration can never
 * false-prune. The writer validates that both columns fit their bucket
 * range (one aggregate over data it is already scanning); out-of-range
 * values would alias buckets and silently break pruning correctness.
 */
object Layout {

  /** Interleave the low `bits` of two non-negative bucket ids: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. Codegen'd shift/AND/OR
    * chain — no UDF, no loop at runtime. */
  def interleaveBits(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, "bits must be in [1, 16]")
    (0 until bits).map { i =>
      val ab = shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
      val bb = shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
      ab.bitwiseOR(bb)
    }.reduce(_.bitwiseOR(_))
  }

  /** Decode z-value `z` back to its (aBucket, bBucket) pair (driver-side
    * twin of [[interleaveBits]] — used to enumerate probe partitions). */
  def deinterleave(z: Long, bits: Int): (Long, Long) = {
    var a = 0L; var b = 0L; var i = 0
    while (i < bits) {
      a |= ((z >> (2 * i)) & 1L) << i
      b |= ((z >> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (a, b)
  }

  /**
   * Write `df` partitioned by the z-bucket of (`aCol` >> aShift,
   * `bCol` >> bShift), each masked to `bits`: 4^bits directories, rows
   * z-clustered. Fails fast if any value exceeds its bucket range
   * (`2^(shift+bits) - 1`) or is negative — aliasing would corrupt pruning.
   * One extra tiny aggregate over a scan the write performs anyway.
   */
  def writeZOrdered(df: DataFrame, path: String, aCol: String, bCol: String,
      aShift: Int, bShift: Int, bits: Int): Unit = {
    val mm = df.agg(min(col(aCol)).cast("long"), max(col(aCol)).cast("long"),
      min(col(bCol)).cast("long"), max(col(bCol)).cast("long")).head()
    val (aMax, bMax) = ((1L << (aShift + bits)) - 1, (1L << (bShift + bits)) - 1)
    require(mm.getLong(0) >= 0 && mm.getLong(1) <= aMax,
      s"$aCol range [${mm.getLong(0)}, ${mm.getLong(1)}] outside [0, $aMax]")
    require(mm.getLong(2) >= 0 && mm.getLong(3) <= bMax,
      s"$bCol range [${mm.getLong(2)}, ${mm.getLong(3)}] outside [0, $bMax]")
    df.withColumn("zb", interleaveBits(
        shiftright(col(aCol).cast("long"), aShift),
        shiftright(col(bCol).cast("long"), bShift), bits))
      .write.mode("overwrite").partitionBy("zb").parquet(path)
  }

  /**
   * Box query over a [[writeZOrdered]] layout: rows with `aCol` ∈ [aLo, aHi]
   * and `bCol` ∈ [bLo, bHi]. The probe z-bucket set is enumerated on the
   * DRIVER (4^bits decode iterations — bits ≤ 8 keeps that ≤ 65k, trivial)
   * by rectangle intersection, so the scan carries a literal `zb IN (...)`
   * on the partition column — directory pruning before any file opens —
   * with the exact row predicate behind it for the partial edge buckets.
   */
  def zBoxQuery(spark: SparkSession, path: String, aCol: String, bCol: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      aShift: Int, bShift: Int, bits: Int): DataFrame = {
    require(aLo <= aHi && bLo <= bHi, "empty box")
    val probes = (0L until (1L << (2 * bits))).filter { z =>
      val (za, zb) = deinterleave(z, bits)
      val (a0, a1) = (za << aShift, ((za + 1) << aShift) - 1)
      val (b0, b1) = (zb << bShift, ((zb + 1) << bShift) - 1)
      a1 >= aLo && a0 <= aHi && b1 >= bLo && b0 <= bHi
    }
    spark.read.parquet(path)
      .where(col("zb").isin(probes: _*) &&
        col(aCol) >= aLo && col(aCol) <= aHi &&
        col(bCol) >= bLo && col(bCol) <= bHi)
      .drop("zb")
  }

  /**
   * Deterministic GLOBAL 1-based rank over an arbitrary total order, without
   * the single-partition degeneration of a bare `Window.orderBy` (which pulls
   * the whole dataset through ONE task — the thing that breaks first at
   * 100 TB). Range-partition on the sort key, sort within each partition,
   * then stitch partitions together with per-partition row-count offsets:
   * a count pass over the persisted sorted intermediate yields a
   * numPartitions-length offset array on the driver (KBs), and a second
   * pass assigns `offset(partition) + positionWithinPartition`. ONE data
   * shuffle total; the offset pass moves only (partitionId, count) pairs.
   *
   * `sortCols` must define a total order (append a unique id column as the
   * final tie-break) or ranks are nondeterministic. Rank semantics are
   * exactly SQL's `row_number() OVER (ORDER BY sortCols)`.
   */
  def globalRank(df: DataFrame, sortCols: Seq[Column],
      rankCol: String = "rn", numPartitions: Int = 0): DataFrame = {
    require(sortCols.nonEmpty, "globalRank needs at least one sort column")
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    graft.Eager.withPersisted(sorted) { p =>
      val counts = p.rdd
        .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
        .collect().toMap
      val offsets = (0 until n).scanLeft(0L)((acc, i) =>
        acc + counts.getOrElse(i, 0L)).toArray
      val schema = p.schema.add(rankCol, org.apache.spark.sql.types.LongType,
        nullable = false)
      val ranked = p.rdd.mapPartitionsWithIndex { (i, it) =>
        var k = offsets(i)
        it.map { r => k += 1
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ k) }
      }
      spark.createDataFrame(ranked, schema)
    }
  }

  /**
   * Exact GLOBAL prefix sums over a total order — [[globalRank]]'s two-pass
   * discipline extended with per-partition value offsets: the count pass
   * also sums `valueCol` per partition, so the second pass can assign every
   * row its global rank AND its inclusive running sum with pure local
   * arithmetic. The cumulative-weight primitive behind quantile splits,
   * systematic resampling, and budget cutoffs — none of which tolerate the
   * single-partition window a bare `sum().over(Window.orderBy(...))`
   * degenerates to. `valueCol` must be a LONG column (integer weights —
   * exact, order-independent); `sortCols` must be a total order.
   * Returns the input plus (`rankCol`, `cumCol`).
   */
  def globalScan(df: DataFrame, sortCols: Seq[Column], valueCol: String,
      rankCol: String = "rn", cumCol: String = "cum",
      numPartitions: Int = 0): DataFrame = {
    require(sortCols.nonEmpty, "globalScan needs at least one sort column")
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    graft.Eager.withPersisted(sorted) { p =>
      val vIdx = p.schema.fieldIndex(valueCol)
      require(p.schema(vIdx).dataType ==
        org.apache.spark.sql.types.LongType,
        s"globalScan needs a LONG $valueCol (cast integer weights first)")
      val stats = p.rdd.mapPartitionsWithIndex { (i, it) =>
        var c = 0L; var s = 0L
        it.foreach { r => c += 1; s += r.getLong(vIdx) }
        Iterator((i, (c, s)))
      }.collect().toMap
      def offsets(of: ((Long, Long)) => Long) = (0 until n)
        .scanLeft(0L)((acc, i) => acc + stats.get(i).map(of).getOrElse(0L))
        .toArray
      val cOff = offsets(_._1)
      val sOff = offsets(_._2)
      val schema = p.schema
        .add(rankCol, org.apache.spark.sql.types.LongType, nullable = false)
        .add(cumCol, org.apache.spark.sql.types.LongType, nullable = false)
      val out = p.rdd.mapPartitionsWithIndex { (i, it) =>
        var k = cOff(i); var s = sOff(i)
        it.map { r => k += 1; s += r.getLong(vIdx)
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ k :+ s) }
      }
      spark.createDataFrame(out, schema)
    }
  }

  /**
   * Exact GLOBAL running maximum over a total order — the [[globalScan]]
   * two-pass discipline with max instead of sum (max is associative too:
   * per-partition maxes prefix-fold into partition offsets). The
   * "high-water mark so far" primitive behind event-lateness audits and
   * monotonicity checks. `valueCol` must be LONG and non-null. Returns the
   * input plus `outCol` = max of `valueCol` over all rows at-or-before this
   * one in sort order (inclusive).
   */
  /**
   * Exact global EXCLUSIVE "last non-null value so far" over a total
   * order — the [[globalScan]] two-pass discipline for an arbitrary-typed
   * carry: per partition the last non-null of `valueCol` is collected
   * (numPartitions values on the driver — structs stay tiny), prefix-folded
   * into per-partition seeds, and the second pass threads the running
   * value locally. EXCLUSIVE semantics: each row sees the last non-null
   * STRICTLY BEFORE it (the first row of the order sees the seed, null at
   * the front) — exactly `last(value, ignoreNulls) OVER (ORDER BY …
   * ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)` without the
   * single-partition window. Sort descending to get "first non-null
   * strictly after". The carry primitive behind partition-parallel
   * as-of/nearest-neighbor matching on one axis.
   */
  def globalRunningLast(df: DataFrame, sortCols: Seq[Column],
      valueCol: String, outCol: String = "run_last",
      numPartitions: Int = 0): DataFrame = {
    require(sortCols.nonEmpty, "globalRunningLast needs a sort order")
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    graft.Eager.withPersisted(sorted) { p =>
      val vIdx = p.schema.fieldIndex(valueCol)
      val lasts = p.rdd.mapPartitionsWithIndex { (i, it) =>
        var last: Any = null
        it.foreach { r => val v = r.get(vIdx); if (v != null) last = v }
        Iterator((i, last))
      }.collect().toMap
      val seeds = (0 until n).scanLeft(null: Any) { (acc, i) =>
        lasts.get(i).filter(_ != null).getOrElse(acc)
      }.toArray
      val schema = p.schema.add(outCol, p.schema(vIdx).dataType,
        nullable = true)
      val out = p.rdd.mapPartitionsWithIndex { (i, it) =>
        var run: Any = seeds(i)
        it.map { r =>
          val row = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ run)
          val v = r.get(vIdx)
          if (v != null) run = v
          row
        }
      }
      spark.createDataFrame(out, schema)
    }
  }

  def globalRunningMax(df: DataFrame, sortCols: Seq[Column], valueCol: String,
      outCol: String = "run_max", numPartitions: Int = 0): DataFrame = {
    require(sortCols.nonEmpty, "globalRunningMax needs a sort order")
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    graft.Eager.withPersisted(sorted) { p =>
      val vIdx = p.schema.fieldIndex(valueCol)
      require(p.schema(vIdx).dataType ==
        org.apache.spark.sql.types.LongType,
        s"globalRunningMax needs a LONG $valueCol")
      val maxes = p.rdd.mapPartitionsWithIndex { (i, it) =>
        var m = Long.MinValue
        it.foreach { r => m = math.max(m, r.getLong(vIdx)) }
        Iterator((i, m))
      }.collect().toMap
      val offsets = (0 until n).scanLeft(Long.MinValue)((acc, i) =>
        math.max(acc, maxes.getOrElse(i, Long.MinValue))).toArray
      val schema = p.schema
        .add(outCol, org.apache.spark.sql.types.LongType, nullable = false)
      val out = p.rdd.mapPartitionsWithIndex { (i, it) =>
        var m = offsets(i)
        it.map { r => m = math.max(m, r.getLong(vIdx))
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ m) }
      }
      spark.createDataFrame(out, schema)
    }
  }
}
