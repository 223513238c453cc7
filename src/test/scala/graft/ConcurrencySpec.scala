package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.sql.functions._
import graft.store.{Compaction, ManifestTable}

/** LIVE-thread proof of the reader-concurrency contract that LifecycleSpec
  * only drives deterministically (resolve → swap → collect): here real
  * reader threads probe in a loop WHILE a maintainer thread runs a rewrite
  * storm, under deliberate scheduler contention (the rewrite jobs and the
  * reader jobs share local[4]). Two properties:
  *
  *  1. A read is either exact or loudly stale — never partial, never
  *     double-counted. Maintenance preserves each table's row multiset, so
  *     every successful observation must EQUAL the baseline.
  *  2. A reader delayed past its keep-one-back budget (queued behind the
  *     compactor's own jobs — this storm manufactures exactly that) heals
  *     through [[Compaction.retryingStaleScan]], the documented slow-reader
  *     recovery: re-resolve, re-run, result again exact.
  */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._
  _quiet

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def cntSum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val r = df.agg(count(lit(1)), sum("v")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Run each `(name, readOnce, baseline)` on its own thread until the
    * maintainer finishes; readers heal stale scans through
    * retryingStaleScan. Asserts: zero failures, zero wrong observations,
    * and at least one observation per reader. Returns retries healed. */
  private def storm(maintainer: Thread,
      readerDefs: Seq[(String, () => (Long, Long), (Long, Long))]): Int = {
    val done = new AtomicBoolean(false)
    val wrong = new ConcurrentLinkedQueue[String]()
    val failures = new ConcurrentLinkedQueue[Throwable]()
    val retries = new AtomicInteger(0)
    val reads = new AtomicInteger(0)
    val readers = readerDefs.map { case (name, readOnce, base) =>
      new Thread(() => {
        while (!done.get()) {
          try {
            var attempts = 0
            val got = Compaction.retryingStaleScan(attempts = 4) {
              attempts += 1; readOnce()
            }
            reads.incrementAndGet()
            retries.addAndGet(attempts - 1)
            if (got != base) wrong.add(s"$name saw $got expected $base")
          } catch { case t: Throwable => failures.add(t); done.set(true) }
        }
      })
    }
    maintainer.start(); readers.foreach(_.start())
    maintainer.join(120000); done.set(true); readers.foreach(_.join(120000))
    assert(failures.isEmpty,
      s"concurrent read failed even with retry: ${Option(failures.peek())}")
    assert(wrong.isEmpty, s"inexact read mid-maintenance: ${Option(wrong.peek())}")
    assert(reads.get() >= readerDefs.length,
      s"storm produced only ${reads.get()} observations")
    retries.get()
  }

  test("manifest table: live reader threads see the exact multiset through a rewrite storm") {
    val table = tmp("graft_conc_mt") + "/t"
    val df = spark.range(2000).select($"id", ($"id" * 7 % 101).as("v"))
    ManifestTable.write(df, table)
    def readOnce() = cntSum(ManifestTable.read(spark, table))
    val baseline = readOnce()
    readOnce(): Unit // warm the read path before the clock starts

    val maintainer = new Thread(() => {
      // alternate target sizes so every cycle really rewrites + swaps;
      // identity transform keeps the multiset fixed
      (0 until 6).foreach { i =>
        ManifestTable.compact(spark, table, targetFiles = 1 + (i % 2) * 2)
        Thread.sleep(250)
      }
    })
    storm(maintainer, Seq(
      ("reader-a", () => readOnce(), baseline),
      ("reader-b", () => readOnce(), baseline))): Unit
    // the storm really swapped generations past the warmup state
    assert(ManifestTable.liveGen(spark, table).exists(_ >= f"gen-${6}%09d"))
  }

  test("partitioned layout: live probe threads stay exact through rewritePartitions") {
    val root = tmp("graft_conc_part") + "/layout"
    spark.range(4000)
      .select($"id", ($"id" % 8).as("bucket"), ($"id" * 3 % 97).as("v"))
      .write.partitionBy("bucket").parquet(root)
    Compaction.migrateLeaves(spark, root) // reader-concurrent from birth
    def fullRead() = cntSum(Compaction.readPartitioned(spark, root, "bucket").get)
    def probeRead() = { // the index-probe shape: path-selected leaf subset
      val dirs = Compaction.resolveLeafDirs(spark, root, "bucket", Seq(1, 3, 5))
      cntSum(spark.read.parquet(dirs: _*))
    }
    val fullBase = fullRead()
    val probeBase = probeRead()
    fullRead(); probeRead() // warm

    val maintainer = new Thread(() => {
      // 8 leaves rewritten on an 8-thread pool over local[4]: the rewrite
      // jobs saturate the scheduler, so reader jobs queue behind them —
      // the exact delay that exhausts keep-one-back and exercises the
      // retryingStaleScan recovery path. Every other cycle runs the
      // BATCHED layout-wide minor compaction instead (one merge job +
      // per-leaf manifest swaps) so its swap discipline faces the same
      // storm as the per-leaf rewrites.
      (0 until 4).foreach { i =>
        if (i % 2 == 0) // fan each leaf to 2 files so the minor has work
          Compaction.rewritePartitions(spark, root, targetFiles = 2,
            identity, onlyIfOverTarget = false): Unit
        else
          Compaction.minorCompactPartitions(spark, root,
            smallBytes = 1L << 30): Unit
        Thread.sleep(250)
      }
    })
    storm(maintainer, Seq(
      ("full", () => fullRead(), fullBase),
      ("probe", () => probeRead(), probeBase))): Unit
  }

  test("indexed keyed store: live readKeyed threads stay exact through an " +
      "upsertIndexed + compact storm") {
    import graft.store.KeyedStore
    val dir = tmp("graft_conc_keyed") + "/t"
    val base = spark.range(0, 4000).toDF("key").withColumn("v", ($"key" * 7) % 101)
    KeyedStore.writeIndexed(base, dir, numRanges = 8)
    // readers aggregate the STABLE key range only: the maintainer re-puts
    // existing rows with IDENTICAL values (multiset-invariant) and inserts
    // fresh keys >= 10^6, so every exact observation equals the baseline
    def readOnce() = cntSum(KeyedStore.readKeyed(spark, dir)
      .where($"key" < 1000000L))
    val baseline = readOnce()
    readOnce(): Unit // warm the read path before the clock starts
    val inserted = new AtomicInteger(0)
    val maintainer = new Thread(() => {
      (0 until 6).foreach { i =>
        val reput = base.where($"key" % 8 === i % 8)
        val fresh = spark.range(1000000L + i * 10, 1000000L + i * 10 + 5)
          .toDF("key").withColumn("v", lit(0L))
        KeyedStore.upsertIndexed(spark, dir, reput.unionByName(fresh))
        inserted.addAndGet(5)
        if (i == 3) KeyedStore.compact(spark, dir, smallFileBytes = 1L << 20): Unit
        Thread.sleep(150)
      }
    })
    storm(maintainer, Seq(
      ("keyed-a", () => readOnce(), baseline),
      ("keyed-b", () => readOnce(), baseline))): Unit
    // post-storm: the full snapshot is base + every inserted row, exactly
    val (n, _) = cntSum(KeyedStore.readKeyed(spark, dir))
    assert(n == 4000L + inserted.get(), s"post-storm count $n")
    // and the structural fsck finds nothing unhealable
    assert(KeyedStore.fsckIndexed(spark, dir).ok)
  }

  test("ingest loop under live readers: appends + minor compactions + a " +
      "major fold; filtered reads over the stable subset stay exact") {
    val table = tmp("graft_conc_minor") + "/t"
    val base = spark.range(20000).select($"id", ($"id" * 7 % 101).as("v"))
    ManifestTable.write(base.coalesce(1), table)
    val bigLen = {
      val gen = new java.io.File(ManifestTable.resolve(spark, table))
      gen.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length).max
    }
    // readers aggregate the STABLE id range only, so the observation is
    // invariant under the maintainer's appends (ids >= 10^6) — this storm
    // races reads against APPEND + MINOR COMPACT + MAJOR FOLD all at once
    def readOnce() = cntSum(ManifestTable.read(spark, table)
      .where($"id" < 1000000L))
    val baseline = readOnce()
    readOnce(): Unit // warm
    val sawRetains = new AtomicBoolean(false)
    val appended = new AtomicInteger(0)
    val maintainer = new Thread(() => {
      (0 until 6).foreach { i =>
        ManifestTable.append(
          Seq.tabulate(5)(j => (1000000L + i * 10 + j, 0L)).toDF("id", "v"),
          table)
        appended.addAndGet(5)
        // debris (appends + last merged file) merges; the base file is
        // retained by reference every cycle
        ManifestTable.minorCompact(spark, table, smallBytes = bigLen)
        if (new java.io.File(
            ManifestTable.resolve(spark, table), "_RETAINS").exists())
          sawRetains.set(true)
        if (i == 3) ManifestTable.compact(spark, table, targetFiles = 2)
        Thread.sleep(150)
      }
    })
    storm(maintainer, Seq(
      ("stable-a", () => readOnce(), baseline),
      ("stable-b", () => readOnce(), baseline))): Unit
    assert(sawRetains.get(), "the storm never exercised a retained reference")
    // post-storm: the full snapshot is base + every appended row, exactly
    val (n, _) = cntSum(ManifestTable.read(spark, table))
    assert(n == 20000L + appended.get(),
      s"post-storm count $n != ${20000 + appended.get()}")
  }
}
