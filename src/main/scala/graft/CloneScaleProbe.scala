package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Copy-engine probe for the clone/export verbs
 * ([[graft.store.ManifestTable.cloneSnapshot]] /
 * [[graft.store.Compaction.cloneLayout]], reference lifecycle analogue:
 * HBase ExportSnapshot). The round-18 scale fix gives the verbs two
 * engines — the driver-pooled byte copy (bounded 16-thread JVM-wide pool)
 * and the executor-parallel Spark job ([[org.apache.spark.sql.graft
 * .DistCopy]]), selected by `graft.clone.mode` (auto switches past
 * `graft.clone.distributedMinBytes`). On one host the two engines share
 * one disk and one NIC, so this probe CANNOT show the distributed win
 * (bandwidth × executors — that is structural); what it pins down is the
 * thing a single box can measure: the Spark engine's job overhead at the
 * auto threshold, i.e. what the default `distributedMinBytes` trades
 * away when it escalates. Measures, per size tier:
 *
 *  - `driver_sec`: cloneSnapshot wall time with `graft.clone.mode=driver`;
 *  - `spark_sec`:  same snapshot with `graft.clone.mode=spark`;
 *  - file count and total bytes (the tier's shape).
 *
 * Run: `sbt "runMain graft.CloneScaleProbe"`; numbers recorded in PERF.md.
 */
object CloneScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-clone-scale-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.store.ManifestTable
    try {
      // ~55 B/row parquet after md5 payloads; tiers ≈ 60 MB / 600 MB
      val results = Seq(1000000L, 10000000L).map { rows =>
        val table = java.nio.file.Files
          .createTempDirectory(s"graft_clonescale_$rows").toString + "/t"
        ManifestTable.write(
          spark.range(rows).toDF("id")
            .withColumn("p1", md5(col("id").cast("string")))
            .withColumn("p2", md5(concat(lit("x"), col("id").cast("string"))))
            .repartition(32),
          table)
        val (fs, dir) = (new org.apache.hadoop.fs.Path(table))
          .getFileSystem(spark.sessionState.newHadoopConf()) ->
          new org.apache.hadoop.fs.Path(table)
        val gen = ManifestTable.liveGen(spark, table).get
        val stats = fs.listStatus(
          new org.apache.hadoop.fs.Path(dir, gen))
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        val bytes = stats.map(_.getLen).sum
        def time(mode: String, dest: String): Double = {
          spark.conf.set("graft.clone.mode", mode)
          val t0 = System.nanoTime()
          ManifestTable.cloneSnapshot(spark, table, dest): Unit
          (System.nanoTime() - t0) / 1e9
        }
        val base = table.stripSuffix("/t")
        val dSec = time("driver", s"$base/drv")
        val sSec = time("spark", s"$base/spk")
        spark.conf.unset("graft.clone.mode")
        // the INCREMENTAL path: a constant-size delta lands, and the
        // re-sync must cost O(delta) — unchanged files carry by _RETAINS
        // reference — while a fresh full clone re-pays O(table)
        ManifestTable.append(
          spark.range(rows, rows + 1000).toDF("id")
            .withColumn("p1", md5(col("id").cast("string")))
            .withColumn("p2", md5(concat(lit("x"), col("id").cast("string"))))
            .coalesce(1),
          table)
        val t1 = System.nanoTime()
        val deltaFiles = ManifestTable.syncSnapshot(spark, table, s"$base/drv")
        val syncSec = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        ManifestTable.cloneSnapshot(spark, table, s"$base/full2"): Unit
        val fullSec = (System.nanoTime() - t2) / 1e9
        (rows, stats.length, bytes, dSec, sSec, deltaFiles, syncSec, fullSec)
      }
      val js = results.map { case (rows, nf, by, d, s, df, ds, fs) =>
        f"""{"rows":$rows,"files":$nf,"bytes":$by,""" +
          f""""driver_sec":$d%.2f,"spark_sec":$s%.2f,""" +
          f""""delta_files":$df,"sync_delta_sec":$ds%.2f,""" +
          f""""full_reclone_sec":$fs%.2f}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"clone_scale","tiers":$js}""")
      // ---- LEAF scaling of the layout verbs: a 100 TB layout has
      // hundreds-to-thousands of leaves, and the nightly cycle is
      // syncLayout + verifyBackupLayout. Constant per-leaf content,
      // growing leaf count — the no-delta sync and the audit must scale
      // with fs metadata (pooled listings), never with data volume, and
      // a constant-size delta must keep costing O(delta).
      val leafTiers = Seq(64, 256, 1024).map { leaves =>
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_synclay_$leaves").toString + "/layout"
        val bak = root.stripSuffix("/layout") + "/backup"
        graft.store.Compaction.appendPartitions(
          spark.range(leaves.toLong * 20)
            .select(col("id"), (col("id") % leaves).as("leaf"))
            .withColumn("p", md5(col("id").cast("string")))
            .repartition(col("leaf")),
          root, "leaf"): Unit
        val t0 = System.nanoTime()
        graft.store.Compaction.syncLayout(spark, root, bak): Unit
        val fullSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val noopCopied = graft.store.Compaction.syncLayout(spark, root, bak)
        val noopSec = (System.nanoTime() - t1) / 1e9
        // constant-size delta: 3 leaves take one appended file each
        graft.store.Compaction.appendPartitions(
          spark.range(3).select(
            (col("id") + leaves.toLong * 20).as("id"),
            (col("id") % 3).as("leaf"),
            md5(col("id").cast("string")).as("p")).repartition(1),
          root, "leaf"): Unit
        val t2 = System.nanoTime()
        val deltaCopied = graft.store.Compaction.syncLayout(spark, root, bak)
        val deltaSec = (System.nanoTime() - t2) / 1e9
        val t3 = System.nanoTime()
        val audit = graft.store.Compaction.verifyBackupLayout(spark, root, bak)
        val auditSec = (System.nanoTime() - t3) / 1e9
        require(audit.ok && noopCopied == 0,
          s"probe invariant: $audit, noop=$noopCopied")
        (leaves, fullSec, noopSec, deltaCopied, deltaSec, auditSec)
      }
      val lj = leafTiers.map { case (l, f, n, dc, d, a) =>
        f"""{"leaves":$l,"full_sec":$f%.2f,"noop_sec":$n%.2f,""" +
          f""""delta_files":$dc,"delta_sec":$d%.2f,"audit_sec":$a%.2f}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"sync_leaf_scale","tiers":$lj}""")
    } finally spark.stop()
  }
}
