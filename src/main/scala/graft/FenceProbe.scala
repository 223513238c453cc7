package graft

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.graft.GraftIndex

/**
 * Measures the fenced index-commit's driver-side cost against index size —
 * the round-14 question "what does create-exclusive + seal + torn-check +
 * basedOn cost at 100k files?" answered with numbers instead of assertion.
 * Per table size: median-of-5 of a full `writeRanges` commit (serialize +
 * fence checks + create-exclusive + prune) and of the `readAllVersioned`
 * head parse a mutation pays at plan time. A 100 TB table at 1 GiB/file is
 * ~100k index entries — the top size here.
 *
 * Run: `sbt "runMain graft.FenceProbe"`; numbers recorded in PERF.md.
 */
object FenceProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .appName("graft-fence-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val sizes = Seq(1000, 10000, 100000)
      val cells = sizes.map { n =>
        val dir = java.nio.file.Files.createTempDirectory(s"graft_fence_$n").toString
        val ranges: Map[String, (Any, Any, Long)] = (0 until n).map { i =>
          f"part-$i%06d.parquet" ->
            ((BigDecimal(i * 1000), BigDecimal(i * 1000 + 999), 1000L): (Any, Any, Long))
        }.toMap
        var base = GraftIndex.writeRanges(spark, dir, "key", "num", ranges,
          manifest = true)
        def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
        val commitMs = med((1 to 5).map { _ =>
          val t0 = System.nanoTime()
          base = GraftIndex.writeRanges(spark, dir, "key", "num", ranges,
            manifest = true, basedOn = Some(base))
          (System.nanoTime() - t0) / 1e6
        })
        // object-store dialect: the same commit with the verify-after-write
        // read engaged (graft.commit.verify=always) — what a PUT store pays.
        // The knob lives on the CACHED FileSystem instance's conf (that is
        // what verifyAfterWrite consults), so set it there.
        val conf = spark.sessionState.newHadoopConf()
        val fs = new Path(dir).getFileSystem(conf)
        // the knob lives on the JVM-cached FileSystem's conf — restore it in
        // a finally so a thrown commit can't leave later cells (plan_ms,
        // larger n) silently paying the verify read (round-15 advisory)
        fs.getConf.set("graft.commit.verify", "always")
        val commitVerifiedMs =
          try med((1 to 5).map { _ =>
            val t0 = System.nanoTime()
            base = GraftIndex.writeRanges(spark, dir, "key", "num", ranges,
              manifest = true, basedOn = Some(base))
            (System.nanoTime() - t0) / 1e6
          })
          finally fs.getConf.set("graft.commit.verify", "auto")
        // conditional-PUT dialect: the same commit through the S3-shape
        // arbiter (org.apache.spark.sql.graft.ConditionalPut over its
        // JVM-local reference store) — exists-check + exclusive create
        // under a per-object lock, the cost shape of an If-None-Match PUT
        // minus the store's own round-trip
        org.apache.spark.sql.graft.ConditionalPut.registerJvmLocal("file")
        val commitArbiterMs =
          try med((1 to 5).map { _ =>
            val t0 = System.nanoTime()
            base = GraftIndex.writeRanges(spark, dir, "key", "num", ranges,
              manifest = true, basedOn = Some(base))
            (System.nanoTime() - t0) / 1e6
          })
          finally GraftIndex.unregisterArbiter("file")
        val planMs = med((1 to 5).map { _ =>
          val t0 = System.nanoTime()
          require(GraftIndex.readAllVersioned(new Path(dir), conf)
            .head._2.ranges.size == n)
          (System.nanoTime() - t0) / 1e6
        })
        f""""commit_ms_$n":${math.rint(commitMs * 10) / 10},"commit_verified_ms_$n":${math.rint(commitVerifiedMs * 10) / 10},"commit_arbiter_ms_$n":${math.rint(commitArbiterMs * 10) / 10},"plan_ms_$n":${math.rint(planMs * 10) / 10}"""
      }
      println(s"""{"metric":"fence_probe","unit":"ms",${cells.mkString(",")}}""")
    } finally spark.stop()
  }
}
