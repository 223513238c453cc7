package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Leaf-count scaling probe for the READ side of partitioned manifest
 * layouts — the twin of [[AppendScaleProbe]]. Constant data (200k rows)
 * spread over 64 → 256 → 1024 leaves, timing:
 *
 *  - `full`: [[graft.store.Compaction.readPartitioned]] + count — the
 *    maintenance/fsck/equivalence full-layout scan. Driver cost at stake:
 *    per-leaf MANIFEST resolution and the size of the scan plan itself
 *    (a per-leaf union pays schema-inference footer reads and an N-child
 *    plan; a single multi-path relation pays one distributed listing).
 *  - `probe`: resolve 8 leaves via `resolveLeafDirs` + read — the index
 *    probe shape; must stay flat in TOTAL leaf count (path-selection
 *    prune: cost follows the probe, not the layout).
 *
 * Run: `sbt "runMain graft.ReadScaleProbe"`; numbers recorded in PERF.md.
 */
object ReadScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-read-scale-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val totalRows = 200000L
      val results = Seq(64, 256, 1024).map { leaves =>
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_readscale_$leaves").toString + "/layout"
        val df = spark.range(totalRows)
          .select(col("id"), (col("id") % leaves).cast("string").as("leaf"),
            md5(col("id").cast("string")).as("payload"))
        graft.store.Compaction.appendPartitions(df, root, "leaf"): Unit

        def time(body: => Unit): Double = {
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }
        val full = time {
          val got = graft.store.Compaction.readPartitioned(spark, root, "leaf")
            .get.count()
          require(got == totalRows, s"full read saw $got of $totalRows")
        }
        val probe = time {
          val dirs = graft.store.Compaction.resolveLeafDirs(
            spark, root, "leaf", (0 until 8).map(_.toString))
          val got = spark.read.parquet(dirs: _*).count()
          require(got > 0, "probe read empty")
        }
        (leaves, math.rint(full * 1000) / 1000, math.rint(probe * 1000) / 1000)
      }
      val qs = results.map { case (l, f, p) =>
        s""""full_$l":$f,"probe_$l":$p""" }.mkString(",")
      println(s"""{"metric":"read_partitioned_wall_sec","unit":"sec",""" +
        s""""rows":200000,$qs}""")
    } finally spark.stop()
  }
}
