package org.apache.spark.sql.graft

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration

/**
 * Executor-parallel file copy — the scale path for the clone/export verbs
 * ([[graft.store.ManifestTable.cloneSnapshot]] /
 * [[graft.store.Compaction.cloneLayout]]). The driver-pooled copy those
 * verbs default to for small snapshots funnels every byte through ONE
 * host's NIC; at backup scale (terabytes) the copy must be a Spark job
 * over the file list so bandwidth scales with the executor count —
 * the same reason HBase ships ExportSnapshot as an MR job (reference
 * lifecycle analogue: the snapshot/export pipeline around
 * `HbaseTable.scala`'s tables).
 *
 * Pure byte movement, no decode: each task opens source and dest through
 * the Hadoop fs API (cross-scheme capable) with the session's Hadoop conf
 * shipped via broadcast. Tasks are independent and idempotent (overwrite
 * semantics on retry), so Spark's task retry handles transient copy
 * failures; a failed JOB leaves a partial dest with no committed manifest —
 * exactly the crash contract of the driver path.
 */
object DistCopy {

  /** Copy each (source, dest) pair on the executors. One slice per a few
    * files up to 2× default parallelism — copy tasks are I/O-bound, and
    * file sizes are uneven, so over-slicing gives the scheduler room to
    * balance. */
  def copy(spark: SparkSession, pairs: Seq[(String, String)],
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    if (pairs.isEmpty) return
    val sc = spark.sparkContext
    val bc = sc.broadcast(new SerializableConfiguration(conf))
    val slices = math.max(1, math.min(pairs.length, sc.defaultParallelism * 2))
    try sc.parallelize(pairs, slices).foreach { case (s, d) =>
      val sp = new Path(s); val dp = new Path(d)
      val hconf = bc.value.value
      val srcFs = sp.getFileSystem(hconf)
      val dstFs = dp.getFileSystem(hconf)
      val want = srcFs.getFileStatus(sp).getLen
      if (!FileUtil.copy(srcFs, sp, dstFs, dp, false, hconf))
        throw new java.io.IOException(s"DistCopy: cannot copy $s into $d")
      // backup integrity: a silently truncated copy fails its task (and
      // the job, and the clone) before any manifest commit publishes it
      val got = dstFs.getFileStatus(dp).getLen
      if (got != want)
        throw new java.io.IOException(
          s"DistCopy: size mismatch after copy $s -> $d ($got != $want)")
    } finally bc.destroy()
  }
}
