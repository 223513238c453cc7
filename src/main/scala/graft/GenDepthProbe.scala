package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Generation-depth probe for the manifest layouts: after N append + minor-
 * compaction cycles a table's live snapshot spans `_RETAINS` references into
 * up to N older generation directories (each cycle's merged output outgrows
 * the small-file threshold and carries forward by reference). The worry at
 * 100 TB is that resolution cost creeps with HISTORY depth; the design says
 * it cannot — [[graft.store.ManifestTable.resolvePaths]] is exactly one
 * MANIFEST read plus one `_RETAINS` read no matter how many cycles produced
 * the snapshot (retain lists are carried VERBATIM, never chained). This
 * probe measures, at N = 16 / 64 / 256 cycles:
 *
 *  - `resolve_ms_N`: wall time of resolvePaths on the N-cycle table —
 *    should stay flat (two fs reads);
 *  - `read_sec_N`: a full count() over the snapshot — grows with the FILE
 *    count (inherent: N retained files, bounded in production by
 *    autoMaintain's majorAt fold), not with generation depth;
 *  - `post_major_read_sec`: the same read after one major compaction folds
 *    the references — the production steady state.
 *
 * Run: `sbt "runMain graft.GenDepthProbe"`; numbers recorded in PERF.md.
 */
object GenDepthProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-gen-depth-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.store.ManifestTable
    try {
      val perCycle = 10000L
      val results = Seq(16, 64, 256).map { n =>
        val table = java.nio.file.Files
          .createTempDirectory(s"graft_gendepth_$n").toString + "/t"
        def appendBatch(i: Long): Unit = ManifestTable.append(
          spark.range(i * perCycle, (i + 1) * perCycle).toDF("id")
            .withColumn("payload", md5(col("id").cast("string")))
            .coalesce(1),
          table)
        // cycle 0 sizes the threshold: 1.5× one append file — each cycle's
        // TWO appends merge (both under it) into one output (~2× > it)
        // that is RETAINED by reference forever after, so every cycle
        // leaves one more retained file in one more old generation:
        // generation depth ≈ N by construction
        appendBatch(0)
        val oneFile = new java.io.File(ManifestTable.resolve(spark, table))
          .listFiles().filter(_.getName.endsWith(".parquet")).map(_.length).max
        val smallBytes = oneFile * 3 / 2
        appendBatch(1)
        ManifestTable.minorCompact(spark, table, smallBytes): Unit
        (1 until n).foreach { i =>
          appendBatch(2L * i); appendBatch(2L * i + 1)
          ManifestTable.minorCompact(spark, table, smallBytes): Unit
        }
        val gens = ManifestTable.generations(spark, table).length
        val t0 = System.nanoTime()
        val paths = ManifestTable.resolvePaths(spark, table)
        val resolveMs = (System.nanoTime() - t0) / 1e6
        val t1 = System.nanoTime()
        val rows = ManifestTable.read(spark, table).count()
        val readSec = (System.nanoTime() - t1) / 1e9
        require(rows == 2L * n * perCycle,
          s"lost rows: $rows != ${2L * n * perCycle}")
        (n, gens, paths.length, math.rint(resolveMs * 100) / 100,
          math.rint(readSec * 1000) / 1000, table)
      }
      // production steady state: one major fold, then the same read
      val (_, _, _, _, _, biggest) = results.last
      ManifestTable.compact(spark, biggest, targetFiles = 8)
      val t2 = System.nanoTime()
      ManifestTable.read(spark, biggest).count(): Unit
      val postMajor = (System.nanoTime() - t2) / 1e9
      val qs = results.map { case (n, g, p, rm, rs, _) =>
        s""""gens_$n":$g,"paths_$n":$p,"resolve_ms_$n":$rm,"read_sec_$n":$rs"""
      }.mkString(",")
      println(s"""{"metric":"gen_depth_probe","unit":"mixed",$qs,""" +
        s""""post_major_read_sec":${math.rint(postMajor * 1000) / 1000}}""")
    } finally spark.stop()
  }
}
