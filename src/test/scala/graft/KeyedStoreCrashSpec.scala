package graft

import org.apache.spark.sql.functions._
import graft.store.KeyedStore

/**
 * Crash-injection proof of the indexed keyed store's swap contract
 * (KeyedStore.mergeIndexed / compact): every mutation renames staged files
 * IN first (invisible — manifest-dialect readers resolve the file set from
 * the versioned `_graft_index`), COMMITS by atomically publishing a new
 * index version, and leaves replaced originals as keep-one-back strays.
 * Each test manufactures one crash window's exact on-disk state and checks
 * the two invariants the design promises:
 *
 *   1. a reader is ALWAYS exact — the crash state reads as exactly the pre-
 *      or post-mutation snapshot, never partial, never double-counted;
 *   2. recovery is mechanical — a blind retry converges to the clean-run
 *      result, and [[KeyedStore.fsckIndexed]] heals/sweeps what a retry
 *      doesn't (rolling an interrupted dir swap forward or back).
 */
class KeyedStoreCrashSpec extends SparkSpec {
  import spark.implicits._
  _quiet

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def copyDir(src: String, dst: String): Unit = {
    val s = java.nio.file.Paths.get(src)
    val d = java.nio.file.Paths.get(dst)
    java.nio.file.Files.walk(s).forEach { p =>
      val t = d.resolve(s.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }: Unit
  }

  private def snapshot(dir: String, keyCol: String = "key"): Map[String, Long] =
    KeyedStore.readKeyed(spark, dir, keyCol)
      .collect().map(r => r.getLong(0).toString -> r.getLong(1)).toMap

  private def base() = spark.range(0, 500).toDF("key").withColumn("v", $"key" * 3)

  private def puts() = spark.range(100, 110).toDF("key").withColumn("v", lit(-1L))
    .unionByName(spark.range(9000, 9005).toDF("key").withColumn("v", lit(7L)))

  test("crash AFTER staged renames, BEFORE the index commit: reader sees the " +
      "old snapshot exactly; blind retry converges; fsck sweeps the debris") {
    val root = tmp("graft_ksc_precommit")
    val a = s"$root/a"
    val b = s"$root/b"
    KeyedStore.writeIndexed(base(), a, numRanges = 4)
    val before = snapshot(a)
    copyDir(a, b)
    // clean run on the twin: its post-state is the retry's target, and its
    // freshly-renamed m-files are EXACTLY what a crash between the staged
    // renames and the index commit strands in the live dir
    KeyedStore.upsertIndexed(spark, b, puts())
    val expected = snapshot(b)
    val mFiles = new java.io.File(b).listFiles()
      .filter(f => f.getName.startsWith("m") && f.getName.endsWith(".parquet"))
    assert(mFiles.nonEmpty, "the clean run should have renamed m-files in")
    mFiles.foreach(f => java.nio.file.Files.copy(f.toPath,
      java.nio.file.Paths.get(a, f.getName)))
    // invariant 1: the strays are invisible — the old snapshot, exactly
    assert(snapshot(a) == before, "pre-commit crash state must read as the old snapshot")
    // fsck sweeps the debris and finds nothing unhealable
    val stat = KeyedStore.fsckIndexed(spark, a)
    assert(stat.ok && stat.sweptStrays == mFiles.length, stat.toString)
    assert(snapshot(a) == before)
    // invariant 2: the blind retry lands the clean-run state
    KeyedStore.upsertIndexed(spark, a, puts())
    assert(snapshot(a) == expected, "retry after a pre-commit crash must converge")
  }

  test("crash AFTER the index commit: reader sees the new snapshot exactly; " +
      "replaced originals are keep-one-back strays until vacuum") {
    val dir = tmp("graft_ksc_postcommit") + "/t"
    KeyedStore.writeIndexed(base(), dir, numRanges = 4)
    val liveBefore = new java.io.File(dir).listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getName).toSet
    KeyedStore.upsertIndexed(spark, dir, puts())
    val expected = KeyedStore.upsert(base(), puts())
      .collect().map(r => r.getLong(0).toString -> r.getLong(1)).toMap
    assert(snapshot(dir) == expected)
    // the rewritten originals are still on disk (funded by the previous
    // index version, for readers that planned against it) yet invisible
    val onDisk = new java.io.File(dir).listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getName).toSet
    assert(liveBefore.exists(onDisk.contains),
      "replaced originals should survive as keep-one-back strays")
    // vacuum past the window leaves exactly the live files
    assert(KeyedStore.vacuumIndexed(spark, dir, keepPrevious = false) > 0)
    assert(snapshot(dir) == expected)
  }

  test("interrupted full-rewrite dir swap: fsck rolls FORWARD when the " +
      "staging carries the completion marker") {
    val root = tmp("graft_ksc_fwd")
    val t = s"$root/t"
    val twin = s"$root/twin"
    base().write.mode("overwrite").parquet(t) // plain, unindexed: fallback path
    copyDir(t, twin)
    KeyedStore.upsertIndexed(spark, twin, puts()) // clean run = the target
    val expected = snapshot(twin)
    // manufacture the crash: staging complete (marker present), live dir
    // already renamed to the backup, swap-in never happened
    copyDir(twin, s"${t}__staging")
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.create(new org.apache.hadoop.fs.Path(s"${t}__staging",
      KeyedStore.CommittedMarker), true).close()
    assert(fs.rename(new org.apache.hadoop.fs.Path(t),
      new org.apache.hadoop.fs.Path(t + KeyedStore.BackupSuffix + "123")))
    // the table is LOUDLY missing (not silently wrong) until fsck heals it
    val stat = KeyedStore.fsckIndexed(spark, t)
    assert(stat.healedSwap && stat.ok, stat.toString)
    assert(snapshot(t) == expected, "roll-forward must land the rewrite's result")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(t + KeyedStore.BackupSuffix + "123")),
      "the backup is debris once the swap completed")
  }

  test("interrupted full-rewrite dir swap: fsck rolls BACK to the backup " +
      "when the staging never finished") {
    val root = tmp("graft_ksc_back")
    val t = s"$root/t"
    base().write.mode("overwrite").parquet(t)
    val before = spark.read.parquet(t)
      .collect().map(r => r.getLong(0).toString -> r.getLong(1)).toMap
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // crash between the backup rename and the swap-in, with an INCOMPLETE
    // staging (no marker): the pre-rewrite table must come back
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"${t}__staging")): Unit
    assert(fs.rename(new org.apache.hadoop.fs.Path(t),
      new org.apache.hadoop.fs.Path(t + KeyedStore.BackupSuffix + "456")))
    val stat = KeyedStore.fsckIndexed(spark, t)
    assert(stat.healedSwap && stat.ok, stat.toString)
    val got = spark.read.parquet(t)
      .collect().map(r => r.getLong(0).toString -> r.getLong(1)).toMap
    assert(got == before, "roll-back must restore the pre-rewrite table")
  }

  test("torn index commit: a stranded tmp file is invisible to readers and " +
      "swept by fsck; the previous version stays live") {
    val dir = tmp("graft_ksc_torn") + "/t"
    KeyedStore.writeIndexed(base(), dir, numRanges = 4)
    val before = snapshot(dir)
    // a crash INSIDE writeRanges leaves only a hidden tmp file — the
    // rename-to-fresh-name commit never happened
    val garbage = java.nio.file.Paths.get(dir,
      "._graft_index.tmp-deadbeef")
    java.nio.file.Files.write(garbage, "graft-index\tv2\ttruncated".getBytes): Unit
    assert(snapshot(dir) == before, "a torn commit must not change what readers see")
    val stat = KeyedStore.fsckIndexed(spark, dir)
    assert(stat.ok && stat.sweptTmpFiles == 1, stat.toString)
    assert(!java.nio.file.Files.exists(garbage))
  }

  test("a manifest-named data file that is GONE fails reads loudly and is " +
      "reported (not healed) by fsck") {
    val dir = tmp("graft_ksc_missing") + "/t"
    KeyedStore.writeIndexed(base(), dir, numRanges = 4)
    // mutate once so the table is manifest-dialect with m-files
    KeyedStore.upsertIndexed(spark, dir, puts())
    val live = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("m") && f.getName.endsWith(".parquet"))
    assert(live.nonEmpty)
    assert(live.head.delete())
    val ex = intercept[Exception] { snapshot(dir) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("missing data file")), ex.toString)
    val stat = KeyedStore.fsckIndexed(spark, dir)
    assert(!stat.ok && stat.missingFiles == 1, stat.toString)
  }

  test("readKeyedPrevious: the exact pre-mutation snapshot, funded by " +
      "keep-one-back; None before any mutation and after a full vacuum") {
    val dir = tmp("graft_ksc_undo") + "/t"
    KeyedStore.writeIndexed(base(), dir, numRanges = 4)
    assert(KeyedStore.readKeyedPrevious(spark, dir).isEmpty,
      "a never-mutated table has no 'before'")
    val before = snapshot(dir)
    KeyedStore.upsertIndexed(spark, dir, puts())
    val after = snapshot(dir)
    assert(after != before)
    val prev = KeyedStore.readKeyedPrevious(spark, dir)
    assert(prev.isDefined, "one mutation back must be readable")
    assert(prev.get.collect().map(r => r.getLong(0).toString -> r.getLong(1)).toMap
      == before, "the undo window must be the exact pre-mutation snapshot")
    // draining the window (vacuum past keep-one-back) retires it; the live
    // snapshot is untouched
    KeyedStore.vacuumIndexed(spark, dir, keepPrevious = false): Unit
    assert(KeyedStore.readKeyedPrevious(spark, dir).isEmpty)
    assert(snapshot(dir) == after)
  }

  test("wrong-key and re-index guards fail LOUDLY on a manifest table " +
      "instead of reading keep-one-back strays as live rows") {
    val dir = tmp("graft_ksc_guards") + "/t"
    KeyedStore.writeIndexed(base(), dir, numRanges = 4)
    KeyedStore.upsertIndexed(spark, dir, puts()) // leaves protected strays
    val expected = snapshot(dir)
    // a mutation addressed by the wrong key column would fall back to a
    // PLAIN directory listing — which now contains the replaced originals —
    // and bake duplicates into a rebuilt layout; it must refuse instead
    val e1 = intercept[IllegalArgumentException] {
      KeyedStore.upsertIndexed(spark, dir,
        spark.range(3).toDF("v").withColumn("key", lit(1L)), keyCol = "v")
    }
    assert(e1.getMessage.contains("none usable for key"), e1.getMessage)
    // the bootstrap indexer would make EVERY listed file live — stray
    // resurrection on a manifest table; it must refuse
    val e2 = intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.GraftIndex.write(spark, dir, "key")
    }
    assert(e2.getMessage.contains("manifest index"), e2.getMessage)
    // vacuum under a mismatched key is a mistyped path, not a no-op
    intercept[IllegalArgumentException] {
      KeyedStore.vacuumIndexed(spark, dir, keyCol = "v")
    }
    // fsck under a mismatched key would otherwise filter the index to None
    // and report a spotless table it never checked (missingFiles=0, ok) —
    // it must refuse like vacuum does
    intercept[IllegalArgumentException] {
      KeyedStore.fsckIndexed(spark, dir, keyCol = "v")
    }
    assert(snapshot(dir) == expected, "every refused op must leave the table untouched")
  }

  test("a READ whose key option mismatches the manifest index still filters " +
      "strays (file resolution is key-agnostic; only pruning is key-gated)") {
    val dir = tmp("graft_ksc_keyless_read") + "/t"
    KeyedStore.writeIndexed(base(), dir, numRanges = 4)
    KeyedStore.upsertIndexed(spark, dir, puts()) // strays now on disk
    val expected = snapshot(dir)
    // wrong key option: must read the SAME rows as the correct-key read —
    // pre-fix this fell back to a directory listing and double-counted the
    // keep-one-back strays
    val wrongKey = spark.read.format("graft").option("key", "v").load(dir)
    assert(wrongKey.count() == expected.size.toLong)
    val viaWrong = wrongKey.collect().map(r => r.getLong(0).toString -> r.getLong(1)).toMap
    assert(viaWrong == expected)
    // missing key option entirely (defaults to "key" — here correct); use a
    // nonexistent column to force the mismatch path as well
    val noSuchCol = spark.read.format("graft").option("key", "nope").load(dir)
    assert(noSuchCol.count() == expected.size.toLong)
  }

  test("torn index VERSION (a fenced commit that died mid-write): readers " +
      "unaffected, mutation verbs refuse loudly having applied nothing, " +
      "fsck sweeps, a blind retry converges") {
    import org.apache.spark.sql.graft.{GraftConcurrentCommitException, GraftIndex}
    val dir = tmp("graft_ksc_tornfence") + "/t"
    KeyedStore.writeIndexed(base(), dir, numRanges = 4)
    val before = snapshot(dir)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sessionState.newHadoopConf())
    val next = GraftIndex.versionFiles(fs, dirPath).last._1 + 1
    // the torn commit: sealed header, no #commit trailer, newest on disk
    val out = fs.create(new org.apache.hadoop.fs.Path(dirPath,
      GraftIndex.FileName + s".v$next"), true)
    out.write("graft-index\tv2\tkey\tnum\tsealed\nghost.parquet\t1\t2\t3\n"
      .getBytes("UTF-8"))
    out.close()
    assert(snapshot(dir) == before, "a torn version must be invisible to readers")
    // the verb cannot tell crash debris from a live mid-commit writer:
    // it must refuse, and must have applied nothing
    intercept[GraftConcurrentCommitException] {
      KeyedStore.upsertIndexed(spark, dir, puts())
    }
    assert(snapshot(dir) == before, "a fenced-off mutation must apply nothing")
    val st = KeyedStore.fsckIndexed(spark, dir)
    assert(st.ok && st.sweptTmpFiles >= 1, st.toString)
    // blind retry after the heal converges to the clean-run result
    KeyedStore.upsertIndexed(spark, dir, puts())
    val twin = tmp("graft_ksc_tornfence_twin") + "/t"
    KeyedStore.writeIndexed(base(), twin, numRanges = 4)
    KeyedStore.upsertIndexed(spark, twin, puts())
    assert(snapshot(dir) == snapshot(twin))
  }

  test("compact crash before its index commit: staged c-files are invisible; " +
      "retry compacts cleanly") {
    val root = tmp("graft_ksc_compact")
    val a = s"$root/a"
    val b = s"$root/b"
    KeyedStore.writeIndexed(base().coalesce(1), a, "key", numRanges = 1)
    (0 until 3).foreach { g =>
      Thread.sleep(5)
      spark.range(1000 + g * 10, 1010 + g * 10).toDF("key")
        .withColumn("v", $"key" * 3)
        .coalesce(1).sortWithinPartitions("key")
        .write.format("graft").option("key", "key").mode("append").save(a)
    }
    val before = snapshot(a)
    copyDir(a, b)
    assert(KeyedStore.compact(spark, b, "key", smallFileBytes = 16384L) == 1)
    val cFiles = new java.io.File(b).listFiles()
      .filter(f => f.getName.startsWith("c") && f.getName.endsWith(".parquet"))
    assert(cFiles.nonEmpty)
    // crash state: merged output renamed in, index commit never happened
    cFiles.foreach(f => java.nio.file.Files.copy(f.toPath,
      java.nio.file.Paths.get(a, f.getName)))
    assert(snapshot(a) == before, "pre-commit compact debris must be invisible")
    assert(KeyedStore.compact(spark, a, "key", smallFileBytes = 16384L) == 1)
    assert(snapshot(a) == before, "compaction must preserve the row multiset")
  }
}
