package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Leaf-count scaling probe for layout-wide MINOR compaction
 * ([[graft.store.Compaction.minorCompactPartitions]]): constant total debris
 * (200k rows across 2 append batches) spread over 64 → 256 → 1024 leaves,
 * timing the layout-wide merge. The data cost is constant by construction,
 * so wall-time growth across steps is pure orchestration: a per-leaf Spark
 * job submission scales linearly in leaf count (the driver-bottleneck
 * pattern the 100 TB rule bans — 1024 leaves = 1024 tiny jobs), while a
 * batched merge (one job stages every leaf's debris, per-leaf work reduced
 * to fs metadata on a pool) should hold roughly flat. Also times
 * [[graft.store.Compaction.autoMaintain]] on the already-tight layout — the
 * no-op decision pass must cost one pooled listing, nothing else.
 * Run: `sbt "runMain graft.MaintainScaleProbe"`; numbers recorded in PERF.md.
 */
object MaintainScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-maintain-scale-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val totalRows = 100000L
      val results = Seq(64, 256, 1024).map { leaves =>
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_mntscale_$leaves").toString + "/layout"
        def batch(shift: Long) = spark.range(totalRows)
          .select((col("id") + shift).as("id"),
            (col("id") % leaves).cast("string").as("leaf"),
            md5(col("id").cast("string")).as("payload"))
        graft.store.Compaction.appendPartitions(batch(0), root, "leaf"): Unit
        graft.store.Compaction.appendPartitions(
          batch(10000000L), root, "leaf"): Unit
        val t0 = System.nanoTime()
        val merged = graft.store.Compaction.minorCompactPartitions(
          spark, root, smallBytes = 1L << 30)
        val sec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        graft.store.Compaction.autoMaintain(spark, root,
          smallBytes = 1L << 30, minorAt = 4): Unit // tight: pure decision
        val noop = (System.nanoTime() - t1) / 1e9
        (leaves, math.rint(sec * 1000) / 1000, merged,
          math.rint(noop * 1000) / 1000)
      }
      // escaped-leaf case: 1024 leaves whose values need URI encoding (a
      // space) — the decode chain in minorCompactLeaves must keep them on
      // the BATCHED path, so this should land within ~1.5× of the numeric
      // 1024-leaf time (the pre-round-13 code fell back to per-leaf jobs
      // here, re-creating the O(leaves) pattern)
      val escSec = {
        val leaves = 1024
        val root = java.nio.file.Files
          .createTempDirectory("graft_mntscale_esc").toString + "/layout"
        def batch(shift: Long) = spark.range(totalRows)
          .select((col("id") + shift).as("id"),
            concat(lit("v "), (col("id") % leaves).cast("string")).as("leaf"),
            md5(col("id").cast("string")).as("payload"))
        graft.store.Compaction.appendPartitions(batch(0), root, "leaf"): Unit
        graft.store.Compaction.appendPartitions(
          batch(10000000L), root, "leaf"): Unit
        val t0 = System.nanoTime()
        val merged = graft.store.Compaction.minorCompactPartitions(
          spark, root, smallBytes = 1L << 30)
        val sec = (System.nanoTime() - t0) / 1e9
        require(merged == 2 * leaves, s"escaped case merged $merged files")
        val rows = graft.store.Compaction.readPartitioned(spark, root, "leaf")
          .get.count()
        require(rows == 2 * totalRows, s"escaped case lost rows: $rows")
        // the BATCHED every-leaf rewrite (takedown/retention shape) over the
        // same 1024 leaves: one job + pooled per-leaf commits — the number
        // that was O(leaves) Spark jobs before round 13
        val t1 = System.nanoTime()
        val rewritten = graft.store.Compaction.rewritePartitions(
          spark, root, targetFiles = 1, identity)
        val rwSec = (System.nanoTime() - t1) / 1e9
        require(rewritten == leaves, s"escaped case rewrote $rewritten leaves")
        val rows2 = graft.store.Compaction.readPartitioned(spark, root, "leaf")
          .get.count()
        require(rows2 == 2 * totalRows, s"rewrite lost rows: $rows2")
        (math.rint(sec * 1000) / 1000, math.rint(rwSec * 1000) / 1000)
      }
      val qs = results.map { case (l, s, m, n) =>
        s""""leaves_$l":$s,"merged_$l":$m,"noop_$l":$n""" }.mkString(",")
      println(s"""{"metric":"minor_compact_wall_sec","unit":"sec",""" +
        s""""rows":$totalRows,$qs,"escaped_1024":${escSec._1},""" +
        s""""rewrite_1024":${escSec._2}}""")
    } finally spark.stop()
  }
}
