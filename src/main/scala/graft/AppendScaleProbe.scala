package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Leaf-count scaling probe for [[graft.store.Compaction.appendPartitions]]:
 * append the SAME total row count into layouts of 64 → 256 → 1024 leaves and
 * report wall-time per step. The append's driver side is per-leaf fs
 * metadata (resolve live generation, move staged files); serialized it
 * scales linearly in leaf count — the driver-bottleneck pattern the 100 TB
 * rule bans — while the pooled implementation should hold roughly flat
 * (bounded by fs parallelism, not leaf count). The DATA cost is constant
 * across steps by construction, so any wall-time growth is the metadata
 * path. Run: `sbt "runMain graft.AppendScaleProbe"`; numbers recorded in
 * PERF.md.
 */
object AppendScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-append-scale-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val totalRows = 200000L
      val results = Seq(64, 256, 1024).map { leaves =>
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_appscale_$leaves").toString + "/layout"
        val df = spark.range(totalRows)
          .select(col("id"), (col("id") % leaves).cast("string").as("leaf"),
            md5(col("id").cast("string")).as("payload"))
        // base layout: every leaf exists and is manifest-shaped before the
        // timed append (steady-state ingest, not first-write)
        graft.store.Compaction.appendPartitions(df, root, "leaf"): Unit
        val t0 = System.nanoTime()
        graft.store.Compaction.appendPartitions(df, root, "leaf"): Unit
        val sec = (System.nanoTime() - t0) / 1e9
        (leaves, math.rint(sec * 1000) / 1000)
      }
      val qs = results.map { case (l, s) => s""""leaves_$l":$s""" }.mkString(",")
      println(s"""{"metric":"append_partitions_wall_sec","unit":"sec",""" +
        s""""rows":200000,$qs}""")
    } finally spark.stop()
  }
}
