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

  // -------------------------------------------- writer-fencing race proofs
  // The single-maintainer contract used to be an honor system: two racing
  // maintainers both computed the same next index-version name and POSIX
  // rename silently replaced the loser's commit — the acked rows became
  // unreferenced strays swept by the next maintenance pass. The fenced
  // commit (create-exclusive + basedOn OCC, GraftIndex.writeRanges) turns
  // that into a LOUD loser: exactly the guarantee HBase gets from region-
  // server write serialization (reference HbaseTable.scala:373-423).

  /** Run `a` and `b` barrier-aligned on two threads; returns each one's
    * failure (None = committed). */
  private def race(a: () => Unit, b: () => Unit): Seq[Option[Throwable]] = {
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val out = new Array[Option[Throwable]](2)
    val ts = Seq(a, b).zipWithIndex.map { case (body, i) =>
      new Thread(() => {
        barrier.await()
        out(i) = try { body(); None } catch { case t: Throwable => Some(t) }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join(300000))
    out.toSeq
  }

  test("two racing upsertIndexed maintainers: every loser throws " +
      "GraftConcurrentCommitException, no acked write is ever lost, " +
      "and fsck afterwards finds nothing unhealable") {
    import graft.store.KeyedStore
    import org.apache.spark.sql.graft.GraftConcurrentCommitException
    val dir = tmp("graft_race_keyed") + "/t"
    val base = spark.range(0, 4000).toDF("key").withColumn("v", $"key" % 97)
    KeyedStore.writeIndexed(base, dir, numRanges = 8)
    val putsA = spark.range(100, 140).toDF("key").withColumn("v", lit(-1L))
    val putsB = spark.range(2100, 2140).toDF("key").withColumn("v", lit(-2L))
    val outcomes = race(
      () => KeyedStore.upsertIndexed(spark, dir, putsA),
      () => KeyedStore.upsertIndexed(spark, dir, putsB))
    // every failure must be the fence speaking — never an IO mess from
    // trampled staging dirs or replaced data files
    outcomes.flatten.foreach(t =>
      assert(t.isInstanceOf[GraftConcurrentCommitException],
        s"loser failed with the wrong class: $t"))
    assert(outcomes.exists(_.isEmpty), "at least one maintainer must commit")
    // acked-write safety: the table state is EXACTLY base upserted with
    // the batches whose calls returned success (in either serial order —
    // the key ranges are disjoint, so order does not matter)
    def kv(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.collect().toSeq.map(r => r.getLong(0) -> r.getLong(1))
    val expected = kv(base).toMap ++
      (if (outcomes(0).isEmpty) kv(putsA) else Nil) ++
      (if (outcomes(1).isEmpty) kv(putsB) else Nil)
    def state() = KeyedStore.readKeyed(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(state() == expected, "acked commits must all be visible, lost none")
    // the loser's renamed-in m-files are strays; fsck sweeps them and finds
    // no damage; the state is unchanged by the heal
    val st = KeyedStore.fsckIndexed(spark, dir)
    assert(st.ok, st.toString)
    assert(state() == expected, "fsck must not change the committed state")
    // a blind retry of the loser (the documented recovery) converges
    outcomes.zip(Seq(putsA, putsB)).foreach { case (o, puts) =>
      if (o.isDefined) KeyedStore.upsertIndexed(spark, dir, puts)
    }
    val full = kv(base).toMap ++ kv(putsA) ++ kv(putsB)
    assert(state() == full, "loser retry must converge to both batches applied")
  }

  test("two racing ManifestTable rewrites: the loser is fenced off loudly " +
      "(GraftConcurrentCommitException), the winner's snapshot is exact, " +
      "and fsck sweeps the loser's stranded generation") {
    import org.apache.spark.sql.graft.GraftConcurrentCommitException
    val table = tmp("graft_race_mani") + "/t"
    ManifestTable.write(
      spark.range(5000).select($"id", ($"id" % 7).as("v")), table)
    // two maintainers compact the SAME base concurrently with different
    // transforms, so which one wins is observable in the surviving rows
    val outcomes = race(
      () => ManifestTable.compact(spark, table, targetFiles = 2,
        df => df.where($"v" =!= 0)),
      () => ManifestTable.compact(spark, table, targetFiles = 2,
        df => df.where($"v" =!= 1)))
    outcomes.flatten.foreach(t =>
      assert(t.isInstanceOf[GraftConcurrentCommitException],
        s"loser failed with the wrong class: $t"))
    assert(outcomes.exists(_.isEmpty), "at least one rewrite must commit")
    val n = ManifestTable.read(spark, table).count()
    val survivors = Set(
      5000L - 715L, // v != 0 won  (ids ≡ 0 mod 7 dropped: 715 of 5000)
      5000L - 715L, // v != 1 won  (ids ≡ 1 mod 7 dropped: 715 of 5000)
      5000L - 715L - 714L) // both committed serially (no overlap this run)
    assert(survivors.contains(n), s"post-race count $n is not any serial outcome")
    // consistency of content with the reported outcomes when one lost
    if (outcomes.count(_.isEmpty) == 1) {
      val winnerDrops = if (outcomes(0).isEmpty) 0L else 1L
      val remaining = ManifestTable.read(spark, table)
        .where($"v" === winnerDrops).count()
      assert(remaining == 0L, "the winner's transform must be the applied one")
    }
    val st = ManifestTable.fsck(spark, table)
    assert(st.ok, st.toString)
    assert(ManifestTable.read(spark, table).count() == n,
      "fsck must not change the committed snapshot")
  }

  test("as-of reads race retention: readKeyedPrevious(back=1) in a loop " +
      "while a maintainer mutates at keepVersions=2 — every observation is " +
      "exact or loudly stale (healed by retryingStaleScan), never wrong") {
    import graft.store.KeyedStore
    val dir = tmp("graft_conc_asof") + "/t"
    val base = spark.range(0, 4000).toDF("key").withColumn("v", ($"key" * 7) % 101)
    spark.conf.set("graft.keepVersions", "2") // the DEFAULT funding: live + 1
    try {
      KeyedStore.writeIndexed(base, dir, numRanges = 8)
      // fund the first undo step so back=1 resolves from the storm's start
      KeyedStore.upsertIndexed(spark, dir,
        spark.range(1000000L, 1000005L).toDF("key").withColumn("v", lit(0L)))
      // the maintainer re-puts base rows with IDENTICAL values and inserts
      // fresh keys >= 10^6 only, so EVERY retained snapshot filtered to the
      // stable range equals the baseline — any other observation is a torn
      // read, exactly what the funding rule forbids
      def readOnce() = {
        val prev = KeyedStore.readKeyedPrevious(spark, dir, back = 1)
          .getOrElse(sys.error("undo window vanished at keepVersions=2"))
        cntSum(prev.where($"key" < 1000000L))
      }
      val baseline = cntSum(base)
      assert(readOnce() == baseline)
      val maintainer = new Thread(() => {
        (0 until 8).foreach { i =>
          val reput = base.where($"key" % 8 === i % 8)
          val fresh = spark.range(1000010L + i * 10, 1000010L + i * 10 + 5)
            .toDF("key").withColumn("v", lit(0L))
          // each mutation prunes the version the CONCURRENT as-of reader
          // may have just resolved, and sweeps its unique files as strays —
          // manufacturing the race the funding rule is stated over
          KeyedStore.upsertIndexed(spark, dir, reput.unionByName(fresh))
          Thread.sleep(100)
        }
      })
      val healed = storm(maintainer, Seq(
        ("asof-a", () => readOnce(), baseline),
        ("asof-b", () => readOnce(), baseline)))
      info(s"as-of retention storm healed $healed stale scans")
      // post-storm: the window is still exactly one step deep and exact
      assert(readOnce() == baseline)
      assert(KeyedStore.fsckIndexed(spark, dir).ok)
    } finally spark.conf.unset("graft.keepVersions")
  }

  test("object-store PUT semantics: two commits that BOTH pass the " +
      "non-atomic create check are split by verify-after-write — exactly " +
      "one winner, the loser throws, the survivor is byte-exact") {
    import org.apache.spark.sql.graft.{GraftConcurrentCommitException, GraftIndex}
    import org.apache.hadoop.fs.Path
    val dir = "natomic:" + tmp("graft_race_put") + "/t"
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(conf)
    assert(GraftIndex.verifyAfterWrite(fs),
      "the natomic scheme must engage the verify-after-write read")
    def entry(i: Int) =
      Map(s"f$i.parquet" -> ((BigDecimal(i), BigDecimal(i * 10), i.toLong)))
    val isCommit = (p: Path) => p.getName.startsWith(GraftIndex.FileName)
    // barrier 1: both racers pass the exists-check before either PUT lands
    // (the exact interleaving an atomic create-exclusive forbids);
    // barrier 2: both PUTs land before either runs its verify read — the
    // ordering where a bare create-exclusive fence silently loses a commit
    val checkGate = new java.util.concurrent.CyclicBarrier(2)
    val putGate = new java.util.concurrent.CyclicBarrier(2)
    NonAtomicCreateFileSystem.afterCreateCheck =
      p => if (isCommit(p)) { checkGate.await(60, java.util.concurrent.TimeUnit.SECONDS): Unit }
    NonAtomicCreateFileSystem.afterPut =
      p => if (isCommit(p)) { putGate.await(60, java.util.concurrent.TimeUnit.SECONDS): Unit }
    try {
      val outcomes = race(
        () => { GraftIndex.writeRanges(spark, dir, "key", "num", entry(1),
          manifest = true, basedOn = Some(0L)): Unit },
        () => { GraftIndex.writeRanges(spark, dir, "key", "num", entry(2),
          manifest = true, basedOn = Some(0L)): Unit })
      assert(outcomes.count(_.isEmpty) == 1,
        s"exactly one racer must win, got $outcomes")
      outcomes.flatten.foreach(t =>
        assert(t.isInstanceOf[GraftConcurrentCommitException],
          s"the loser must lose LOUDLY with the fence class: $t"))
      // acked-write safety: the surviving index is EXACTLY the winner's
      val winner = if (outcomes(0).isEmpty) "f1.parquet" else "f2.parquet"
      val live = GraftIndex.read(new Path(dir), conf).get
      assert(live.files == Set(winner),
        s"survivor must be the winner's commit: ${live.files}")
      // the loser's documented recovery — a blind retry from fresh state —
      // converges without disturbing the winner's commit
      NonAtomicCreateFileSystem.reset()
      val loserEntry = if (outcomes(0).isEmpty) entry(2) else entry(1)
      GraftIndex.writeRanges(spark, dir, "key", "num",
        live.ranges ++ loserEntry.map { case (k, v) => k -> v }, manifest = true,
        basedOn = Some(1L)): Unit
      assert(GraftIndex.read(new Path(dir), conf).get.files.size == 2)
    } finally NonAtomicCreateFileSystem.reset()
  }

  test("object-store PUT semantics: full ManifestTable rewrite race on the " +
      "non-atomic fs — never a silent mixed state, fsck finds no damage") {
    NonAtomicCreateFileSystem.reset()
    val table = "natomic:" + tmp("graft_race_putm") + "/t"
    ManifestTable.write(
      spark.range(2000).select($"id", ($"id" % 7).as("v")), table)
    // no barriers: every interleaving of claim PUT / claim verify / staging
    // / pointer PUT is legal. On a PUT store two near-simultaneous claims
    // can both pass their μs verify window and share a staging dir — the
    // contract is then only that NOTHING silent happens: losers throw
    // (fence class at a commit point, or an IO error from the trampled
    // shared staging), and the surviving table is exactly a serial prefix
    // of the successful calls — never a mix, never a torn generation.
    val outcomes = race(
      () => ManifestTable.compact(spark, table, targetFiles = 2,
        df => df.where($"v" =!= 0)),
      () => ManifestTable.compact(spark, table, targetFiles = 2,
        df => df.where($"v" =!= 1)))
    val n = ManifestTable.read(spark, table).count()
    val dropped = 2000L / 7 + 1 // ids ≡ 0 (or ≡ 1) mod 7 in [0, 2000): 286
    val legal = Set(2000L, 2000L - dropped, 2000L - 2 * dropped)
    assert(legal.contains(n), s"post-race count $n is not any serial outcome")
    assert(outcomes.count(_.isEmpty) >= (if (n == 2000L) 0 else 1),
      "a changed table requires a successful commit")
    // an acked (returned-success) rewrite must be visible
    if (outcomes.forall(_.isEmpty)) assert(n == 2000L - 2 * dropped)
    val st = ManifestTable.fsck(spark, table)
    assert(st.ok, st.toString)
    assert(ManifestTable.read(spark, table).count() == n,
      "fsck must not change the committed snapshot")
  }

  test("two racing full-rewrite maintainers on an UNINDEXED dir: the swap " +
      "claim fences the rename-pair — losers loud, no acked write lost, " +
      "and a crashed claim is swept by fsckIndexed") {
    import graft.store.KeyedStore
    import org.apache.spark.sql.graft.GraftConcurrentCommitException
    val dir = tmp("graft_race_swap") + "/t"
    val base = spark.range(0, 2000).toDF("key").withColumn("v", $"key" % 13)
    base.write.parquet(dir) // PLAIN parquet: no index → the full-rewrite path
    val putsA = spark.range(100, 120).toDF("key").withColumn("v", lit(-1L))
    val putsB = spark.range(1100, 1120).toDF("key").withColumn("v", lit(-2L))
    val outcomes = race(
      () => KeyedStore.upsertIndexed(spark, dir, putsA),
      () => KeyedStore.upsertIndexed(spark, dir, putsB))
    outcomes.flatten.foreach(t =>
      assert(t.isInstanceOf[GraftConcurrentCommitException],
        s"loser failed with the wrong class: $t"))
    assert(outcomes.exists(_.isEmpty), "at least one rewrite must commit")
    def kv(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = kv(base) ++
      (if (outcomes(0).isEmpty) kv(putsA) else Map.empty[Long, Long]) ++
      (if (outcomes(1).isEmpty) kv(putsB) else Map.empty[Long, Long])
    assert(kv(KeyedStore.readKeyed(spark, dir)) == expected,
      "every acked rewrite must be visible, none lost")
    assert(!new java.io.File(dir + "__swapclaim").exists,
      "a successful rewrite must release its swap claim")
    assert(KeyedStore.fsckIndexed(spark, dir).ok)
    // crashed-claim debris fences the NEXT full-rewrite loudly until fsck
    val dir2 = tmp("graft_race_swap2") + "/t"
    base.write.parquet(dir2)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir2 + "__swapclaim"), "dead".getBytes): Unit
    val e = intercept[GraftConcurrentCommitException] {
      KeyedStore.upsertIndexed(spark, dir2, putsA)
    }
    assert(e.getMessage.contains("swap claim"), e.getMessage)
    assert(kv(KeyedStore.readKeyed(spark, dir2)) == kv(base),
      "the fenced rewrite must have applied nothing")
    KeyedStore.fsckIndexed(spark, dir2): Unit // sweeps the dead claim
    assert(!new java.io.File(dir2 + "__swapclaim").exists)
    KeyedStore.upsertIndexed(spark, dir2, putsA) // the blind retry converges
    assert(kv(KeyedStore.readKeyed(spark, dir2)) == kv(base) ++ kv(putsA))
  }

  test("stolen-AND-COMMITTED claim on a PUT store: a missing claim despite " +
      "a recorded nonce means the racer already published — the victim is " +
      "fenced and deletes NOTHING (the gen dir may be the racer's live " +
      "generation)") {
    import org.apache.spark.sql.graft.GraftConcurrentCommitException
    NonAtomicCreateFileSystem.reset()
    val local = tmp("graft_claimgone") + "/t"
    val table = "natomic:" + local
    ManifestTable.write(
      spark.range(500).select($"id", ($"id" % 5).as("v")), table)
    val before = ManifestTable.read(spark, table).count()
    def claims() = Option(new java.io.File(local).listFiles()).getOrElse(Array())
      .filter(_.getName.startsWith(".genclaim-"))
    def gens() = Option(new java.io.File(local).listFiles()).getOrElse(Array())
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
    // simulate the racer's full win landing mid-staging: its commit DELETED
    // the (stolen) claim — the victim's view is simply "my claim is gone"
    val stole = new java.util.concurrent.atomic.AtomicBoolean(false)
    NonAtomicCreateFileSystem.afterPut = p =>
      if (p.getName.endsWith(".parquet") && p.toString.contains("/gen-") &&
          stole.compareAndSet(false, true))
        claims().foreach(f => f.delete(): Unit)
    try {
      val nGensBefore = gens().length
      val e = intercept[GraftConcurrentCommitException] {
        ManifestTable.compact(spark, table, targetFiles = 1)
      }
      assert(e.getMessage.contains("claim"), e.getMessage)
      assert(stole.get(), "the delete hook must have fired")
      assert(ManifestTable.read(spark, table).count() == before,
        "the fenced commit must have applied nothing")
      // the victim must NOT have deleted the staged gen dir — in the real
      // race it may be the racer's just-published live generation
      assert(gens().length > nGensBefore,
        "victim deleted the possibly-published staging dir")
      // fsck (no writer in flight) sweeps the orphan; reads stay exact
      assert(ManifestTable.fsck(spark, table).ok)
      assert(ManifestTable.read(spark, table).count() == before)
      ManifestTable.compact(spark, table, targetFiles = 1) // retry converges
      assert(ManifestTable.read(spark, table).count() == before)
    } finally NonAtomicCreateFileSystem.reset()
  }

  test("stolen claim on a PUT store: the commit-time ownership re-check " +
      "fences the victim LOUDLY, the victim leaves the (possibly shared) " +
      "staging untouched, and fsck sweeps the debris") {
    import org.apache.spark.sql.graft.GraftConcurrentCommitException
    NonAtomicCreateFileSystem.reset()
    val local = tmp("graft_claimsteal") + "/t"
    val table = "natomic:" + local
    ManifestTable.write(
      spark.range(1000).select($"id", ($"id" % 5).as("v")), table)
    val before = ManifestTable.read(spark, table).count()
    def claims() = Option(new java.io.File(local).listFiles()).getOrElse(Array())
      .filter(_.getName.startsWith(".genclaim-"))
    // simulate a racer whose claim PUT lands just AFTER our claim-verify
    // read (inside the window a plain PUT store leaves open): on the first
    // data-file PUT into the staged generation, replace the claim body
    val stole = new java.util.concurrent.atomic.AtomicBoolean(false)
    NonAtomicCreateFileSystem.afterPut = p =>
      if (p.getName.endsWith(".parquet") && p.toString.contains("/gen-") &&
          stole.compareAndSet(false, true))
        claims().foreach(f =>
          java.nio.file.Files.write(f.toPath, "stolen-by-racer".getBytes): Unit)
    try {
      val e = intercept[GraftConcurrentCommitException] {
        ManifestTable.compact(spark, table, targetFiles = 1)
      }
      assert(e.getMessage.contains("claim"), e.getMessage)
      assert(stole.get(), "the steal hook must have fired")
      assert(ManifestTable.read(spark, table).count() == before,
        "the fenced commit must have applied nothing")
      // the victim must NOT have swept the staging: the gen dir and claim
      // may belong to the racer that stole the number
      assert(claims().nonEmpty, "victim deleted the stolen claim")
      val gens = new java.io.File(local).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
      assert(gens.length > 1, "victim deleted the possibly-shared staging dir")
      // fsck (no-writer-in-flight contract) sweeps claim + orphan; exact
      val st = ManifestTable.fsck(spark, table)
      assert(st.ok, st.toString)
      assert(claims().isEmpty, "fsck must sweep the dead claim")
      assert(ManifestTable.read(spark, table).count() == before)
      // and the healed table accepts the retried rewrite
      ManifestTable.compact(spark, table, targetFiles = 1)
      assert(ManifestTable.read(spark, table).count() == before)
    } finally NonAtomicCreateFileSystem.reset()
  }

  test("commit arbiter closes the verify-after-write residual window: the " +
      "racer-PUT-after-verify interleaving silently replaces an acked " +
      "commit in the default dialect, and CANNOT exist through a " +
      "conditional-PUT arbiter") {
    import org.apache.spark.sql.graft.{CommitArbiter, GraftConcurrentCommitException, GraftIndex}
    import org.apache.hadoop.fs.Path
    NonAtomicCreateFileSystem.reset()
    val dir = "natomic:" + tmp("graft_arbiter") + "/t"
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(conf)
    fs.mkdirs(new Path(dir)): Unit
    def bytesOf(p: Path): String = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    // --- DEFAULT dialect, the one interleaving verify-after-write cannot
    // kill: both racers pass the create check; A PUTs, verifies (sees its
    // own bytes), RETURNS SUCCESS; only then does B's late PUT land — and
    // B's own verify sees B's bytes, so BOTH report success and A's acked
    // commit is silently gone. This is the documented bounded residual.
    val t1 = new Path(dir, "commit-1")
    val checkGate = new java.util.concurrent.CyclicBarrier(2)
    val aReturned = new java.util.concurrent.CountDownLatch(1)
    NonAtomicCreateFileSystem.afterCreateCheck = p =>
      if (p.getName == "commit-1") {
        checkGate.await(60, java.util.concurrent.TimeUnit.SECONDS): Unit
        if (Thread.currentThread().getName == "late-racer")
          aReturned.await(60, java.util.concurrent.TimeUnit.SECONDS): Unit
      }
    val outcomes = new Array[Option[Throwable]](2)
    val a = new Thread(() => {
      outcomes(0) =
        try { GraftIndex.writeCommitFile(fs, t1, "A".getBytes("UTF-8")); None }
        catch { case t: Throwable => Some(t) }
      aReturned.countDown() // A has been ACKED before B's PUT lands
    })
    val b = new Thread(() => {
      outcomes(1) =
        try { GraftIndex.writeCommitFile(fs, t1, "B".getBytes("UTF-8")); None }
        catch { case t: Throwable => Some(t) }
    }, "late-racer")
    a.start(); b.start(); a.join(120000); b.join(120000)
    NonAtomicCreateFileSystem.reset()
    assert(outcomes(0).isEmpty && outcomes(1).isEmpty,
      s"the documented residual: both commits report success: ${outcomes.toSeq}")
    assert(bytesOf(t1) == "B",
      "A's acked commit silently replaced — the window the arbiter closes")
    // --- ARBITER dialect on the same store: publication is a conditional
    // PUT (the MAIN S3-shape dialect, org.apache.spark.sql.graft
    // .ConditionalPut — If-None-Match semantics over the JVM-local
    // reference store), so a late racer is rejected BY THE STORE no matter
    // when it lands — killed by the precondition, not by a verify read
    org.apache.spark.sql.graft.ConditionalPut.registerJvmLocal("natomic")
    try {
      val t2 = new Path(dir, "commit-2")
      GraftIndex.writeCommitFile(fs, t2, "A".getBytes("UTF-8")) // acked
      val lost = intercept[GraftConcurrentCommitException] {
        GraftIndex.writeCommitFile(fs, t2, "B".getBytes("UTF-8")) // late racer
      }
      assert(lost.getMessage.contains("precondition"))
      assert(bytesOf(t2) == "A", "the acked winner's bytes survive the racer")
      // under a free-running concurrent schedule: exactly one winner,
      // every loser loud, winner's bytes intact
      val t3 = new Path(dir, "commit-3")
      val oc = race(
        () => GraftIndex.writeCommitFile(fs, t3, "A".getBytes("UTF-8")),
        () => GraftIndex.writeCommitFile(fs, t3, "B".getBytes("UTF-8")))
      assert(oc.count(_.isEmpty) == 1, s"exactly one winner: $oc")
      oc.flatten.foreach(t =>
        assert(t.isInstanceOf[GraftConcurrentCommitException], t.toString))
      assert(bytesOf(t3) == (if (oc(0).isEmpty) "A" else "B"))
    } finally GraftIndex.unregisterArbiter("natomic")
  }

  test("full ManifestTable rewrite race THROUGH a conditional-PUT " +
      "arbiter: claims and pointers are store-serialized, so losers fence " +
      "at claim time, staging is never shared, and the table stays exact") {
    import org.apache.spark.sql.graft.{GraftConcurrentCommitException, GraftIndex}
    NonAtomicCreateFileSystem.reset()
    org.apache.spark.sql.graft.ConditionalPut.registerJvmLocal("natomic")
    try {
      val table = "natomic:" + tmp("graft_race_arb") + "/t"
      ManifestTable.write(
        spark.range(2000).select($"id", ($"id" % 7).as("v")), table)
      val before = ManifestTable.read(spark, table).count()
      (1 to 3).foreach { _ =>
        val outcomes = race(
          () => ManifestTable.compact(spark, table, targetFiles = 2),
          () => ManifestTable.compact(spark, table, targetFiles = 3))
        // every loser is LOUD with the fence class (claim or pointer —
        // both are arbiter-serialized commit files on this store); a
        // lucky serial interleaving may have no loser at all
        outcomes.flatten.foreach { t =>
          def fence(c: Throwable): Boolean = c != null &&
            (c.isInstanceOf[GraftConcurrentCommitException] || fence(c.getCause))
          assert(fence(t), s"loser must carry the fence class: $t")
        }
        assert(ManifestTable.read(spark, table).count() == before,
          "row multiset exact after every race round")
      }
      val st = ManifestTable.fsck(spark, table)
      assert(st.ok, st.toString)
      assert(ManifestTable.read(spark, table).count() == before)
    } finally GraftIndex.unregisterArbiter("natomic")
  }

  test("shared staged-generation fence: a commit whose staged dir was " +
      "re-staged by a rival attempt (_ATTEMPT stamp differs) is fenced " +
      "off before publishing; re-staging and retrying converges") {
    import org.apache.spark.sql.graft.GraftConcurrentCommitException
    import org.apache.hadoop.fs.Path
    NonAtomicCreateFileSystem.reset()
    val table = "natomic:" + tmp("graft_attempt") + "/t"
    ManifestTable.write(
      spark.range(100).select($"id", ($"id" % 5).as("v")), table)
    val conf = spark.sessionState.newHadoopConf()
    val dirPath = new Path(table)
    val fs = dirPath.getFileSystem(conf)
    val claim = ManifestTable.claimNextGen(fs, dirPath)
    val gen = claim.gen
    def stage(): Unit = {
      spark.range(50).select($"id", lit(9L).as("v"))
        .write.mode("overwrite").parquet(s"$table/$gen")
      val out = fs.create(new Path(s"$table/$gen/_PARENT"), true)
      try out.write("gen-000000000\n".getBytes("UTF-8")) finally out.close()
      ManifestTable.stampStaged(fs, dirPath, claim)
    }
    stage()
    // rival attempt re-staged the SAME gen dir: its last staging write
    // replaced the _ATTEMPT stamp (simulated directly — the real rival is
    // a racer whose claim PUT landed inside our claim-verify window)
    val rogue = fs.create(new Path(s"$table/$gen/_ATTEMPT"), true)
    try rogue.write("rival-nonce".getBytes("UTF-8")) finally rogue.close()
    val ex = intercept[GraftConcurrentCommitException] {
      ManifestTable.commit(fs, dirPath, gen, Some("gen-000000000"), Some(claim))
    }
    assert(ex.getMessage.contains("rival"), ex.getMessage)
    assert(ManifestTable.read(spark, table).count() == 100,
      "the fenced commit must not have moved the pointer")
    // recovery: re-stage our own bytes (stamp included), retry, converge
    stage()
    ManifestTable.commit(fs, dirPath, gen, Some("gen-000000000"), Some(claim))
    val healed = ManifestTable.read(spark, table)
    assert(healed.count() == 50 &&
      healed.agg(sum($"v")).head().getLong(0) == 450L)
  }

  test("claim/commit attempt identity travels with the claim token: a gen " +
      "claimed on one thread commits on another with stolen-claim " +
      "detection still ARMED (the batched leaf-rewrite thread split), and " +
      "a stolen claim still fences across the thread hop") {
    import org.apache.spark.sql.graft.GraftConcurrentCommitException
    import org.apache.hadoop.fs.Path
    NonAtomicCreateFileSystem.reset()
    val table = "natomic:" + tmp("graft_xthread") + "/t"
    ManifestTable.write(
      spark.range(10).select($"id", ($"id" % 2).as("v")), table)
    val dirPath = new Path(table)
    val fs = dirPath.getFileSystem(spark.sessionState.newHadoopConf())
    // claim on a helper thread (the plan pool), stage+commit on this one
    // (the commit pool) — the exact split Compaction's batched verbs use
    @volatile var claim: ManifestTable.GenClaim = null
    val t = new Thread(() => { claim = ManifestTable.claimNextGen(fs, dirPath) })
    t.start(); t.join(60000)
    assert(claim != null)
    spark.range(5).select($"id", lit(1L).as("v"))
      .write.mode("overwrite").parquet(s"$table/${claim.gen}")
    val out = fs.create(new Path(s"$table/${claim.gen}/_PARENT"), true)
    try out.write("gen-000000000\n".getBytes("UTF-8")) finally out.close()
    ManifestTable.stampStaged(fs, dirPath, claim)
    ManifestTable.commit(fs, dirPath, claim.gen, Some("gen-000000000"),
      Some(claim))
    assert(ManifestTable.read(spark, table).count() == 5,
      "cross-thread commit with the claim token succeeds")
    // and detection is ARMED across the hop: a rival that replaces the
    // claim file mid-staging still fences the cross-thread commit
    @volatile var claim2: ManifestTable.GenClaim = null
    val t2 = new Thread(() => { claim2 = ManifestTable.claimNextGen(fs, dirPath) })
    t2.start(); t2.join(60000)
    assert(claim2 != null)
    spark.range(3).select($"id", lit(2L).as("v"))
      .write.mode("overwrite").parquet(s"$table/${claim2.gen}")
    val out2 = fs.create(new Path(s"$table/${claim2.gen}/_PARENT"), true)
    try out2.write(s"${claim.gen}\n".getBytes("UTF-8")) finally out2.close()
    ManifestTable.stampStaged(fs, dirPath, claim2)
    val rogue = fs.create(new Path(s"$table/.genclaim-${claim2.gen}"), true)
    try rogue.write("rival-nonce".getBytes("UTF-8")) finally rogue.close()
    val ex = intercept[GraftConcurrentCommitException] {
      ManifestTable.commit(fs, dirPath, claim2.gen, Some(claim.gen),
        Some(claim2))
    }
    assert(ex.getMessage.contains("overwritten"), ex.getMessage)
    assert(ManifestTable.read(spark, table).count() == 5,
      "the fenced cross-thread commit must not have moved the pointer")
  }

  test("batched >8-leaf rewrite AND minor compaction on a verify-after-" +
      "write store: the claim token crosses the plan-pool → commit-pool " +
      "thread split (round-16 advisory — the thread-keyed nonce map made " +
      "every leaf commit throw IllegalStateException here)") {
    NonAtomicCreateFileSystem.reset()
    val root = "natomic:" + tmp("graft_batchleaf") + "/ivf"
    spark.range(240).select($"id", ($"id" % 12).as("cell"))
      .repartition($"cell")
      .write.partitionBy("cell").mode("overwrite").parquet(root)
    Compaction.migrateLeaves(spark, root)
    // 12 leaves > the pooledMap serial threshold (8): nextGen claims run on
    // plan-pool threads, commitStagedGen on commit-pool threads
    val n = Compaction.rewritePartitions(spark, root, 2,
      p => p.where(col("id") % 2 === 1))
    assert(n == 12, s"all 12 leaves must rewrite, got $n")
    def readBack() = spark.read.parquet(
      Compaction.resolveLeaves(spark, root).map(_._2): _*)
    assert(readBack().count() == 120 &&
      readBack().where(col("id") % 2 === 0).count() == 0,
      "the takedown-shaped rewrite must be exact across every leaf")
    // the batched MINOR path claims in its own plan pool too: manufacture
    // small-file debris in every leaf, then merge it across the same split
    Compaction.appendPartitions(
      spark.range(240, 480).select($"id", ($"id" % 12).as("cell"))
        .repartition($"cell"),
      root, "cell", None): Unit
    val merged = Compaction.minorCompactPartitions(spark, root,
      smallBytes = 1L << 30, targetBytes = 1L << 30)
    assert(merged > 0, "debris must merge")
    assert(readBack().count() == 360,
      "minor compaction across the thread split must keep every row")
  }

  test("batched >8-leaf rewrites drive every pooled claim/stamp/commit " +
      "through a REGISTERED conditional-PUT dialect end-to-end: " +
      "compactIvfCorpus drains a lazy takedown over 12 arbitered cells and " +
      "removeFromBm25Index rewrites 12 arbitered buckets, both " +
      "survivor-exact (round 18: the claim-token refactor proven on the " +
      "store shape it was written for)") {
    import org.apache.spark.sql.graft.{ConditionalPut, GraftIndex}
    import graft.ops.{Similarity, TextOps}
    NonAtomicCreateFileSystem.reset()
    // a counting wrapper over the JVM-local reference store proves the
    // pooled commits actually flow through the dialect (a silently-default
    // create-exclusive path would pass the data asserts but count zero)
    val puts = new AtomicInteger(0)
    GraftIndex.registerArbiter("natomic", new ConditionalPut.Arbiter(
      new ConditionalPut.ConditionalStore {
        def putIfAbsent(fs: org.apache.hadoop.fs.FileSystem,
            target: org.apache.hadoop.fs.Path,
            payload: Array[Byte]): Boolean = {
          puts.incrementAndGet()
          ConditionalPut.JvmLocalStore.putIfAbsent(fs, target, payload)
        }
      }))
    try {
      // --- IVF: 12 ring centroids pin one vector family per cell, so the
      // layout has 12 leaves — past the pooledMap serial threshold (8), the
      // compaction drain takes rewriteLeavesBatched: plan-pool claims,
      // commit-pool commitStagedGen, every commit file store-arbitrated
      val ivf = "natomic:" + tmp("graft_arb_ivf") + "/ivf"
      val cents = (0 until 12).map(j =>
        Array(math.cos(j * math.Pi / 6), math.sin(j * math.Pi / 6))).toArray
      val vecs = (0 until 48).map { i =>
        val a = (i % 12) * math.Pi / 6
        (i.toLong, Seq(math.cos(a).toFloat, math.sin(a).toFloat))
      }.toDF("id", "vec")
      Similarity.writeIvfCorpus(vecs, "id", "vec", ivf, cents)
      Similarity.tombstoneIvfCorpus(spark, ivf,
        Seq(3L, 17L, 31L).toDF("id")): Unit
      val putsBefore = puts.get()
      val n = Similarity.compactIvfCorpus(spark, ivf, targetFiles = 1)
      assert(n == 12, s"all 12 cell leaves must rewrite in one batch, got $n")
      assert(puts.get() - putsBefore >= 24,
        "each leaf's claim and pointer commits must be store-arbitrated " +
          s"(>=2 conditional PUTs x 12 leaves), saw ${puts.get() - putsBefore}")
      val got = Similarity.ivfTopKFromPartitioned(spark, ivf, "id", "vec",
          Seq(1f, 0f), 48, cents, nProbe = 12)
        .collect().map(_.getLong(0)).toSet
      assert(got == ((0L until 48L).toSet -- Set(3L, 17L, 31L)),
        s"survivor-exact probe after the arbitered physical drain: $got")

      // --- BM25: 12 postings buckets (unique per-doc terms spread the md5
      // routing), then the takedown verb's batched bucket rewrite + docs +
      // stats swaps — all through the same registered dialect
      val bm = "natomic:" + tmp("graft_arb_bm25") + "/bm"
      val docs = (0 until 60).map(i =>
        (i.toLong, s"common t${i} u${i} v${i % 7}")).toDF("id", "text")
      TextOps.writeBm25Index(docs, "id", "text", bm, nBuckets = 12)
      val bucketLeaves = graft.store.Compaction
        .resolveLeaves(spark, bm + "/postings").length
      assert(bucketLeaves > 8,
        s"the batched path needs >8 bucket leaves, got $bucketLeaves")
      val putsBm = puts.get()
      TextOps.removeFromBm25Index(spark, bm,
        Seq(7L, 20L, 41L).toDF("id"), targetFiles = 1)
      assert(puts.get() - putsBm >= 2 * bucketLeaves,
        "each bucket's claim and pointer commits must be store-arbitrated, " +
          s"saw ${puts.get() - putsBm} for $bucketLeaves leaves")
      // the probe equals a from-scratch build of the survivors (score
      // arithmetic already rounds to the 1e-6 grid)
      val fresh = tmp("graft_arb_bm25_fresh") + "/bm"
      TextOps.writeBm25Index(docs.where(!col("id").isin(7L, 20L, 41L)),
        "id", "text", fresh, nBuckets = 12)
      val q = Seq("common", "v3", "t9")
      def rows(p: String) = TextOps.bm25TopKFromIndex(spark, p, q, 60,
        nBuckets = 12).collect().map(_.toSeq).toSet
      assert(rows(bm) == rows(fresh),
        "arbitered takedown must equal the from-scratch survivor index")
      assert(!rows(bm).exists(r => Set(7L, 20L, 41L)(
        r.head.asInstanceOf[Long])), "removed docs must not surface")
    } finally GraftIndex.unregisterArbiter("natomic")
  }

  test("the incremental backup cycle runs end-to-end through a REGISTERED " +
      "conditional-PUT dialect (round 18): sync claims/commits are " +
      "store-arbitrated on both source and backup, the delta carries, the " +
      "ledger mirrors, and the audit reads clean") {
    import org.apache.spark.sql.graft.GraftIndex
    NonAtomicCreateFileSystem.reset()
    org.apache.spark.sql.graft.ConditionalPut.registerJvmLocal("natomic")
    try {
      val base = tmp("graft_arb_sync")
      val src = "natomic:" + base + "/t"
      val bak = "natomic:" + base + "/backup"
      ManifestTable.write(
        spark.range(40).select($"id", ($"id" % 5).as("v")).repartition(2), src)
      assert(ManifestTable.appendTagged(
        spark.range(40, 50).select($"id", ($"id" % 5).as("v")).coalesce(1),
        src, "arb-ep-0"))
      val full = ManifestTable.syncSnapshot(spark, src, bak)
      assert(full >= 3, s"first sync is the full clone: $full")
      ManifestTable.append(
        spark.range(50, 55).select($"id", ($"id" % 5).as("v")).coalesce(1), src)
      val delta = ManifestTable.syncSnapshot(spark, src, bak)
      assert(delta == 1, s"only the appended file may move: $delta")
      val v = ManifestTable.verifyBackup(spark, src, bak)
      assert(v.ok && v.tagDrift == 0, v.toString)
      assert(ManifestTable.hasTag(spark, bak, "arb-ep-0"),
        "the ledger must mirror through the dialect")
      assert(!ManifestTable.appendTagged(
        spark.range(40, 50).select($"id", ($"id" % 5).as("v")).coalesce(1),
        bak, "arb-ep-0"), "the cutover replay must no-op on this store too")
      assert(ManifestTable.read(spark, bak).count() ==
        ManifestTable.read(spark, src).count())
      assert(ManifestTable.fsck(spark, bak).ok)
    } finally GraftIndex.unregisterArbiter("natomic")
  }
}
