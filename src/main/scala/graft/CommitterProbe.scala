package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Staged-write committer probe on a simulated object store
 * ([[SlowRenameFileSystem]]: every rename pays a fixed latency, the
 * object-store copy surrogate) — turning PERF.md's "revisit the v2
 * committer on an object store" note into a measured decision. For each
 * committer algorithm (v1 = driver-side mergePaths at job commit, v2 =
 * task-side commit; the `graft.committer.algorithm` session knob) it runs
 * the two staged-write verbs on a 64-leaf layout over `slowfs:` and checks
 * row counts survive:
 *
 *  - `append_v{1,2}`: [[graft.store.Compaction.appendPartitions]] of a
 *    100k-row batch;
 *  - `minor_v{1,2}`: [[graft.store.Compaction.minorCompactPartitions]]
 *    over the appended debris.
 *
 * Run: `sbt "runMain graft.CommitterProbe"`; numbers recorded in PERF.md.
 * Expectation from the protocol shapes: v1's job-commit rename count grows
 * with task outputs (driver-serial), v2 commits in the tasks, so v1−v2 gap
 * widens with rename latency — whichever measures faster here is the
 * object-store recommendation, with local-fs defaults unchanged.
 */
object CommitterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-committer-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.slowfs.impl",
        classOf[graft.SlowRenameFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      SlowRenameFileSystem.renameDelayMs =
        sys.env.getOrElse("GRAFT_SLOWFS_RENAME_MS", "25").toLong
      val leaves = 64
      val rows = 100000L
      def batch(shift: Long) = spark.range(rows)
        .select((col("id") + shift).as("id"),
          (col("id") % leaves).cast("string").as("leaf"),
          md5(col("id").cast("string")).as("payload"))
      val results = Seq("1", "2").map { alg =>
        spark.conf.set("graft.committer.algorithm", alg)
        val root = "slowfs:" + java.nio.file.Files
          .createTempDirectory(s"graft_committer_$alg").toString + "/layout"
        val t0 = System.nanoTime()
        graft.store.Compaction.appendPartitions(batch(0), root, "leaf"): Unit
        graft.store.Compaction.appendPartitions(
          batch(10000000L), root, "leaf"): Unit
        val appendSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val merged = graft.store.Compaction.minorCompactPartitions(
          spark, root, smallBytes = 1L << 30)
        val minorSec = (System.nanoTime() - t1) / 1e9
        require(merged == 2 * leaves, s"alg $alg merged $merged")
        val n = graft.store.Compaction.readPartitioned(spark, root, "leaf")
          .get.count()
        require(n == 2 * rows, s"alg $alg lost rows: $n")
        (alg, math.rint(appendSec * 1000) / 1000,
          math.rint(minorSec * 1000) / 1000)
      }
      // the measured decision, wired: with no override, slow-rename schemes
      // default to v2 and local paths to v1
      spark.conf.unset("graft.committer.algorithm")
      require(graft.store.Compaction.committerFor(spark, "slowfs:/t") == "2",
        "slow-rename scheme must default to the task-side v2 committer")
      require(graft.store.Compaction.committerFor(spark, "/local/t") == "1",
        "local paths must default to the v1 committer")
      val qs = results.map { case (a, ap, mi) =>
        s""""append_v$a":$ap,"minor_v$a":$mi""" }.mkString(",")
      println(s"""{"metric":"committer_probe_wall_sec","unit":"sec",""" +
        s""""rename_ms":${SlowRenameFileSystem.renameDelayMs},""" +
        s""""leaves":$leaves,$qs}""")
    } finally spark.stop()
  }
}
