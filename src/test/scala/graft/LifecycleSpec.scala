package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Sampling, Similarity, TextOps}
import graft.store.{Compaction, ManifestTable}

/** Round-11 lifecycle hardening: manifest-pointer tables (reader-concurrent
  * compaction), near-dup index compaction + deletion, partitioned-layout
  * compaction (IVF / BM25), pair-table retention, and the matchedControls
  * routing-probe cache. Every compaction/deletion test asserts the REPORT
  * is oblivious to the maintenance op — same rows before and after. */
class LifecycleSpec extends SparkSpec {
  import spark.implicits._
  _quiet

  /** Delete every manifest pointer version (MANIFEST and MANIFEST.v*) —
    * the "crash lost the pointer" manufacture for heal tests. */
  private def dropPointer(t: String): Unit = {
    val fs = new java.io.File(t)
    val victims = fs.listFiles().filter(f =>
      f.isFile && (f.getName == "MANIFEST" || f.getName.startsWith("MANIFEST.v")))
    assert(victims.nonEmpty, s"no MANIFEST pointer to lose under $t")
    victims.foreach(f => assert(f.delete()))
  }

  private def pointerExists(t: String): Boolean =
    new java.io.File(t).listFiles().exists(f =>
      f.isFile && (f.getName == "MANIFEST" || f.getName.startsWith("MANIFEST.v")))

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def canon(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.toVector: Seq[Any]).toSet

  private def multiset(df: DataFrame): Map[Seq[Any], Int] =
    df.collect().map(_.toSeq.toVector: Seq[Any]).groupBy(identity)
      .map { case (k, v) => (k: Seq[Any]) -> v.length }

  private def parquetFiles(dir: String): Int = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
  }

  /** Live data files of a manifest-shaped leaf (the post-round-12 layout
    * truth: files live in the leaf's live generation, not the leaf root). */
  private def liveFiles(leafDir: String): Int =
    ManifestTable.dataFileCount(spark, leafDir)

  /** Layout-aware full read of a partition-directory layout (root scans
    * double-count once a leaf holds two generations). Partition col comes
    * back as a string — fine for multiset comparisons between layouts. */
  private def readLayout(root: String, partitionCol: String): DataFrame =
    Compaction.readPartitioned(spark, root, partitionCol)
      .getOrElse(sys.error(s"no leaves at $root"))

  /** Simulate a lost commit-tag marker set (crash between file moves and
    * the tag commit): _TAGS is a marker DIRECTORY since round 12. */
  private def rmTags(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, "_TAGS")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(p, true), s"no _TAGS at $dir")
  }

  /** Recursively collect files under `dir` whose name passes `pred` —
    * tagged append files live inside per-leaf generation dirs now. */
  private def filesUnder(dir: java.io.File,
      pred: String => Boolean): Seq[java.io.File] = {
    val kids = Option(dir.listFiles()).getOrElse(Array.empty).toSeq
    kids.filter(f => f.isFile && pred(f.getName)) ++
      kids.filter(_.isDirectory).flatMap(filesUnder(_, pred))
  }

  // ---------------------------------------------------------------- manifest

  test("ManifestTable: write/append/read roundtrip, compact preserves the " +
      "row multiset and bounds the file count") {
    val t = tmp("graft_mani") + "/t"
    ManifestTable.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    assert(canon(ManifestTable.read(spark, t)) ==
      Set(Seq(1L, "a"), Seq(2L, "b")))
    (1 to 5).foreach { i =>
      ManifestTable.append(Seq((10L + i, s"x$i")).toDF("id", "v"), t)
    }
    val before = multiset(ManifestTable.read(spark, t))
    assert(before.size == 7)
    assert(ManifestTable.dataFileCount(spark, t) > 2,
      "appends should have accumulated files")
    ManifestTable.compact(spark, t, targetFiles = 2)
    assert(multiset(ManifestTable.read(spark, t)) == before,
      "compaction changed the row multiset")
    assert(ManifestTable.dataFileCount(spark, t) <= 2,
      "compaction did not bound the live file count")
  }

  test("append schema guard: drifted batches are rejected loudly before " +
      "anything is written; benign variations (order, case, nullability) pass") {
    val t = tmp("graft_schemaguard") + "/t"
    ManifestTable.write(Seq((1L, "a", 10)).toDF("id", "v", "n"), t)
    val before = multiset(ManifestTable.read(spark, t))
    def rejects(df: org.apache.spark.sql.DataFrame): Unit = {
      val e = intercept[IllegalArgumentException](ManifestTable.append(df, t))
      assert(e.getMessage.contains("schema drift"), e.getMessage)
    }
    rejects(Seq((2L, "b", 11, true)).toDF("id", "v", "n", "extra"))
    rejects(Seq((2L, "b")).toDF("id", "v"))
    rejects(Seq((2L, "b", 11L)).toDF("id", "v", "n")) // n: int -> bigint
    assert(multiset(ManifestTable.read(spark, t)) == before,
      "a rejected append wrote data")
    // tagged twin: rejected before the stage write, tag NOT committed
    intercept[IllegalArgumentException](ManifestTable.appendTagged(
      Seq((2L, "b", 11, true)).toDF("id", "v", "n", "extra"), t, "batch-x"))
    assert(!ManifestTable.hasTag(spark, t, "batch-x"),
      "a rejected tagged append committed its tag")
    // benign: different column order, different name case — same columns
    ManifestTable.append(Seq((9, "z", 2L)).toDF("N", "v", "ID")
      .select($"ID", $"v", $"N"), t)
    assert(multiset(ManifestTable.read(spark, t)).values.sum == 2)

    // partitioned layout twin: one leaf's live schema stands for all
    val root = tmp("graft_schemaguard_part") + "/layout"
    val part = Seq((1L, "0", "p"), (2L, "1", "p")).toDF("id", "leaf", "w")
    Compaction.appendPartitions(part, root, "leaf"): Unit
    val e = intercept[IllegalArgumentException](Compaction.appendPartitions(
      Seq((3L, "0", "p", 1.0)).toDF("id", "leaf", "w", "score"), root, "leaf"))
    assert(e.getMessage.contains("schema drift"), e.getMessage)
    assert(multiset(readLayout(root, "leaf").select("id", "leaf", "w")) ==
      multiset(part), "a rejected partitioned append wrote data")
    Compaction.appendPartitions( // same columns again: accepted
      Seq((3L, "2", "q")).toDF("id", "leaf", "w"), root, "leaf"): Unit
    assert(multiset(readLayout(root, "leaf")).values.sum == 3)
  }

  test("ManifestTable: a reader that planned before a compaction swap keeps " +
      "its files (previous generation retained through one cycle)") {
    val t = tmp("graft_mani_rc") + "/t"
    ManifestTable.write(spark.range(100).select(col("id")), t)
    (1 to 3).foreach(_ =>
      ManifestTable.append(spark.range(100, 110).select(col("id")), t))
    // plan NOW against the current generation (file listing resolved here)…
    val planned = ManifestTable.read(spark, t)
    val genBefore = ManifestTable.resolve(spark, t)
    // …compact underneath it…
    ManifestTable.compact(spark, t, targetFiles = 1)
    assert(ManifestTable.resolve(spark, t) != genBefore,
      "compaction should have advanced the live generation")
    assert(new java.io.File(genBefore).exists,
      "the reader's generation must survive one compaction (keep-one-back)")
    // …and the pre-swap plan still scans every file it listed
    assert(planned.count() == 130)
    // the NEXT rewrite retires it — the documented one-cycle contract
    ManifestTable.compact(spark, t, targetFiles = 1)
    assert(!new java.io.File(genBefore).exists,
      "a second rewrite should retire the two-generations-old dir")
  }

  test("undo window: readPrevious serves the pre-rewrite snapshot until the " +
      "next rewrite retires it; appends since the rewrite are excluded") {
    val t = tmp("graft_undo") + "/t"
    ManifestTable.write(spark.range(10).selectExpr("id", "id * 2 AS v"), t)
    assert(ManifestTable.previousGen(spark, t).isEmpty,
      "no rewrite yet, but an undo window exists")
    val original = multiset(ManifestTable.read(spark, t))
    // rewrite 1: a retention-style transform drops half the rows
    ManifestTable.compact(spark, t, targetFiles = 1, _.where($"id" % 2 === 0))
    val pruned = multiset(ManifestTable.read(spark, t))
    assert(pruned.size == 5)
    assert(multiset(ManifestTable.readPrevious(spark, t).get) == original,
      "undo window is not the pre-prune snapshot")
    // an append lands in the LIVE generation only: the undo window is a
    // genuine point-in-time snapshot
    ManifestTable.append(spark.range(100, 102).selectExpr("id", "id * 2 AS v"), t)
    assert(multiset(ManifestTable.readPrevious(spark, t).get) == original)
    // rewrite 2 retires the original: the window now holds rewrite 1's
    // result plus the append that followed it
    ManifestTable.compact(spark, t, targetFiles = 1)
    val window2 = multiset(ManifestTable.readPrevious(spark, t).get)
    assert(window2 != original && window2.size == 7)
    // vacuum(keepPrevious = false) closes the window explicitly
    assert(ManifestTable.vacuum(spark, t, keepPrevious = false) >= 1)
    assert(ManifestTable.previousGen(spark, t).isEmpty)

    // the pairs-table verb: prune, then audit the pre-prune view
    val root = tmp("graft_undo_pairs")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),
      (3L, "alpha beta gamma eta theta"),
      (4L, "iota kappa lambda mu nu")).toDF("doc_id", "text")
    Dedup.writePairs(docs, "doc_id", "text", root, shingleSize = 3,
      minJaccard = 0.1, maxDf = None)
    val preAll = multiset(Dedup.readPairs(spark, root, threshold = 0.1))
    Dedup.prunePairs(spark, root, newMinJaccard = 0.5)
    assert(multiset(Dedup.readPairs(spark, root, threshold = 0.1)) != preAll,
      "prune dropped nothing — test data too coarse")
    assert(multiset(Dedup.readPairsPrevious(spark, root, threshold = 0.1).get)
      == preAll, "pairs undo window is not the pre-prune table")

    // the ANN-layout twin: a takedown's removals resurface through the
    // previous-generation probe, and only until the next layout-wide
    // rewrite retires the window
    val ivf = tmp("graft_undo_ivf") + "/layout"
    val vecs = (0 until 24).map(i =>
      (i.toLong, Seq(math.cos(i % 4).toFloat, math.sin(i % 4).toFloat)))
      .toDF("id", "vec")
    val cents = Similarity.ivfCentroids(vecs, "id", "vec", k = 3)
    Similarity.writeIvfCorpus(vecs, "id", "vec", ivf, cents)
    val q = Seq(math.cos(1).toFloat, math.sin(1).toFloat)
    def probe(f: => DataFrame): Set[Long] =
      f.collect().map(_.getLong(0)).toSet
    val preIds = probe(Similarity.ivfTopKFromPartitioned(
      spark, ivf, "id", "vec", q, 24, cents, nProbe = 3))
    // fresh layout: no rewrite yet, so no undo window — probes empty
    assert(probe(Similarity.ivfTopKFromPartitionedPrevious(
      spark, ivf, "id", "vec", q, 24, cents, nProbe = 3)).isEmpty)
    Similarity.removeFromIvfCorpus(spark, ivf,
      Seq(1L, 5L, 9L).toDF("id"))
    val postIds = probe(Similarity.ivfTopKFromPartitioned(
      spark, ivf, "id", "vec", q, 24, cents, nProbe = 3))
    assert(!postIds.contains(1L) && postIds != preIds)
    assert(probe(Similarity.ivfTopKFromPartitionedPrevious(
      spark, ivf, "id", "vec", q, 24, cents, nProbe = 3)) == preIds,
      "undo probe must see the pre-takedown neighborhood")
    // next layout-wide rewrite advances the window to the post-delete state
    Similarity.removeFromIvfCorpus(spark, ivf, spark.emptyDataset[Long].toDF("id"))
    assert(probe(Similarity.ivfTopKFromPartitionedPrevious(
      spark, ivf, "id", "vec", q, 24, cents, nProbe = 3)) == postIds,
      "second rewrite must retire the original window")
  }

  test("ManifestTable: a missing MANIFEST heals to the newest complete " +
      "generation (crash inside the commit swap)") {
    val t = tmp("graft_mani_crash") + "/t"
    ManifestTable.write(Seq((1L, "a")).toDF("id", "v"), t)
    ManifestTable.append(Seq((2L, "b")).toDF("id", "v"), t)
    ManifestTable.compact(spark, t, targetFiles = 1)
    val rows = canon(ManifestTable.read(spark, t))
    // simulate the crash window: pointer versions deleted, nothing else
    dropPointer(t)
    assert(canon(ManifestTable.read(spark, t)) == rows,
      "fallback resolution must pick the newest complete generation")
    // the next rewrite re-establishes the pointer
    ManifestTable.compact(spark, t, targetFiles = 1)
    assert(pointerExists(t))
    assert(canon(ManifestTable.read(spark, t)) == rows)
  }

  test("vacuum: standalone GC retires funded-out generations, dead stage " +
      "dirs and tmp files without a rewrite; reads and probes unchanged") {
    val t = tmp("graft_vac") + "/t"
    ManifestTable.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    (1 to 3).foreach(i =>
      ManifestTable.append(Seq((10L + i, s"x$i")).toDF("id", "v"), t))
    ManifestTable.compact(spark, t, targetFiles = 1)
    val rows = multiset(ManifestTable.read(spark, t))
    def gens: Seq[String] = new java.io.File(t).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("gen-"))
      .map(_.getName).toSeq.sorted
    assert(gens.size == 2, s"keep-one-back after one compaction: $gens")
    // strand debris an interrupted maintenance op would leave
    val orphanGen = new java.io.File(t, "gen-000000099"); orphanGen.mkdirs()
    val stage = new java.io.File(t, ".stage-deadbeef"); stage.mkdirs()
    val tmpMf = new java.io.File(t, "MANIFEST.tmp-x")
    assert(tmpMf.createNewFile())
    // keepPrevious vacuum: debris gone, live + previous retained
    assert(ManifestTable.vacuum(spark, t) == 2) // orphan gen + stage dir
    assert(!orphanGen.exists && !stage.exists && !tmpMf.exists)
    assert(gens.size == 2 && multiset(ManifestTable.read(spark, t)) == rows)
    // drain-rule vacuum: only the live generation survives
    assert(ManifestTable.vacuum(spark, t, keepPrevious = false) == 1)
    assert(gens.size == 1 && multiset(ManifestTable.read(spark, t)) == rows)
    // idempotent
    assert(ManifestTable.vacuum(spark, t, keepPrevious = false) == 0)

    // claim-shield: vacuum must NEVER sweep generation-claim files, even
    // with a number at/below live — a racer that claimed before the winner
    // committed is shielded by exactly that claim (claimNextGen skips
    // claimed numbers). Claim cleanup belongs to the owner and to fsck.
    val liveNum = gens.head.stripPrefix("gen-").toInt
    val staleClaim = new java.io.File(t, f".genclaim-gen-${liveNum - 1}%09d")
    assert(staleClaim.createNewFile())
    assert(ManifestTable.vacuum(spark, t, keepPrevious = false) == 0)
    assert(staleClaim.exists,
      "vacuum swept a claim file — claim-shield violated")
    assert(multiset(ManifestTable.read(spark, t)) == rows)
    // fsck (whose contract asserts no writer in flight) is the sweeper
    ManifestTable.fsck(spark, t): Unit
    assert(!staleClaim.exists, "fsck must sweep dead claims")

    // partitioned layout: per-leaf vacuum + root stage sweep, probe oblivious
    val docs = Seq(
      (1L, "spark window merge spark"), (2L, "window table scan"),
      (3L, "merge join spark"), (4L, "filter scan batch window"))
      .toDF("id", "text")
    val path = tmp("graft_vacp") + "/bm25"
    TextOps.writeBm25Index(docs.where(col("id") <= 2), "id", "text", path,
      nBuckets = 4)
    (3L to 4L).foreach(i => TextOps.appendBm25Index(
      docs.where(col("id") === i), "id", "text", path, nBuckets = 4))
    TextOps.compactBm25Index(spark, path, targetFiles = 1): Unit
    val q = Seq("spark", "window", "merge")
    val before = canon(TextOps.bm25TopKFromIndex(spark, path, q, 10,
      nBuckets = 4))
    val rootStage = new java.io.File(path + "/postings", ".stage-dead")
    rootStage.mkdirs()
    val swept = Compaction.vacuumPartitions(spark, path + "/postings",
      keepPrevious = false)
    assert(swept > 1, s"compacted leaves must shed a generation each: $swept")
    assert(!rootStage.exists)
    new java.io.File(path + "/postings").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("bucket="))
      .foreach { d =>
        val n = d.listFiles().count(g =>
          g.isDirectory && g.getName.startsWith("gen-"))
        assert(n == 1, s"${d.getName}: $n generations after drain vacuum")
      }
    assert(canon(TextOps.bm25TopKFromIndex(spark, path, q, 10,
      nBuckets = 4)) == before, "probe must be oblivious to the vacuum")
  }

  // ------------------------------------------------- near-dup index lifecycle

  private def docsDF: DataFrame = Seq(
    (1L, "w1 w2 w3 w4 w5 w6"),            // corpus
    (2L, "a1 a2 a3 a4 a5 a6"),            // corpus
    (3L, "k1 k2 k3 k4 k5 k6"),            // corpus
    (11L, "w1 w2 w3 w4 w5 w6"),           // batch: copy of 1
    (12L, "a1 a2 a3 a4 a5 a6"),           // batch: copy of 2
    (13L, "z1 z2 z3 z4 z5 z6"))           // batch: novel
    .toDF("id", "text")

  test("compactNearDupIndex: probe results oblivious to compaction; band " +
      "file count shrinks after N ingest rounds") {
    val docs = docsDF
    val corpus = docs.where(col("id") <= 3)
    val batchA = docs.where(col("id") === 13) // novel -> survives, appends
    val probe = docs.where(col("id") === 11 || col("id") === 12)
    def run(compact: Boolean): Set[Seq[Any]] = {
      val path = tmp("graft_ndc") + "/idx"
      Dedup.writeNearDupIndex(corpus, "id", "text", path, shingleSize = 2)
      (1 to 3).foreach { i =>
        // same novel content under fresh ids each day: survives day 1,
        // drops on later days (near-dups the day-1 survivor) — either way
        // each round appends files
        val b = batchA.select((col("id") + lit(i * 100)).as("id"), col("text"))
        Dedup.ingestBatch(spark, b, path, "id", "text", shingleSize = 2): Unit
      }
      if (compact) {
        val nBefore = ManifestTable.dataFileCount(spark, path + "/bands")
        Dedup.compactNearDupIndex(spark, path, targetFiles = 2)
        val nAfter = ManifestTable.dataFileCount(spark, path + "/bands")
        assert(nBefore > 2 && nAfter <= 2,
          s"bands files $nBefore -> $nAfter: compaction must bound the count")
      }
      canon(Dedup.dedupeAgainstIndex(spark, probe, path, "id", "text",
        shingleSize = 2))
    }
    val plain = run(compact = false)
    val compacted = run(compact = true)
    assert(plain == compacted, "probe must be oblivious to compaction")
    assert(plain.isEmpty, "both probe docs are copies of corpus docs")
  }

  test("removeFromNearDupIndex: a deleted doc stops vetoing its future " +
      "near-copies; non-deleted dups still drop; compaction purges the " +
      "tombstoned band rows and clears the tombstones") {
    val docs = docsDF
    val path = tmp("graft_nddel") + "/idx"
    Dedup.writeNearDupIndex(docs.where(col("id") <= 3), "id", "text", path,
      shingleSize = 2)
    // takedown: doc 1 removed from the index
    Dedup.removeFromNearDupIndex(spark, path, Seq(1L).toDF("id"))
    val probe = docs.where(col("id") >= 11)
    val surv = canon(Dedup.dedupeAgainstIndex(spark, probe, path, "id", "text",
      shingleSize = 2).select(col("id")))
    // 11 (copy of deleted 1) survives; 12 (copy of live 2) drops; 13 novel
    assert(surv == Set(Seq(11L), Seq(13L)), s"got $surv")
    // physical purge at compaction: band rows for id 1 disappear,
    // tombstones clear, probe verdicts unchanged
    Dedup.compactNearDupIndex(spark, path, targetFiles = 1)
    assert(!ManifestTable.read(spark, path + "/bands")
      .where(col("id") === 1L).head(1).nonEmpty,
      "compaction must purge tombstoned band rows")
    assert(ManifestTable.read(spark, path + "/tombstones").isEmpty,
      "applied tombstones must clear at compaction")
    val surv2 = canon(Dedup.dedupeAgainstIndex(spark, probe, path, "id",
      "text", shingleSize = 2).select(col("id")))
    assert(surv2 == surv, "probe verdicts must not change across compaction")
    // the same id can re-enter the index after the compaction cleared it
    Dedup.appendNearDupIndex(docs.where(col("id") === 1), "id", "text", path,
      shingleSize = 2)
    val surv3 = canon(Dedup.dedupeAgainstIndex(spark, probe, path, "id",
      "text", shingleSize = 2).select(col("id")))
    assert(surv3 == Set(Seq(13L)), s"re-added doc must veto again: $surv3")
  }

  // ------------------------------------------------- tagged appends / retry

  test("ManifestTable.appendTagged: committed tags no-op; a lost TAGS marker " +
      "heals by sweep-and-rewrite; write() starts a fresh incarnation") {
    val t = tmp("graft_tag") + "/t"
    ManifestTable.write(Seq((1L, "base")).toDF("id", "v"), t)
    assert(ManifestTable.appendTagged(Seq((2L, "b1")).toDF("id", "v"), t, "b1"))
    val after1 = multiset(ManifestTable.read(spark, t))
    assert(after1 == Map(Seq(1L, "base") -> 1, Seq(2L, "b1") -> 1))
    // blind retry: the committed tag makes it an exact no-op
    assert(!ManifestTable.appendTagged(Seq((2L, "b1")).toDF("id", "v"), t, "b1"))
    assert(multiset(ManifestTable.read(spark, t)) == after1)
    // crash between the file moves and the TAGS commit: marker lost, files
    // present — the retry's sweep removes them before re-appending
    rmTags(t)
    assert(ManifestTable.appendTagged(Seq((2L, "b1")).toDF("id", "v"), t, "b1"))
    assert(multiset(ManifestTable.read(spark, t)) == after1,
      "sweep-and-rewrite must not duplicate the batch")
    // a second tag appends independently
    assert(ManifestTable.appendTagged(Seq((3L, "b2")).toDF("id", "v"), t, "b2"))
    assert(multiset(ManifestTable.read(spark, t)).size == 3)
    // tags survive a compaction (history is part of the table)…
    ManifestTable.compact(spark, t, targetFiles = 1)
    assert(!ManifestTable.appendTagged(Seq((9L, "x")).toDF("id", "v"), t, "b2"))
    // …but an overwrite clears them: a new incarnation re-accepts the tag
    ManifestTable.write(Seq((1L, "base")).toDF("id", "v"), t)
    assert(ManifestTable.appendTagged(Seq((3L, "b2")).toDF("id", "v"), t, "b2"))
  }

  test("ingestBatch with a batchId: a blind retry after full completion is " +
      "an exact no-op (same survivors, same band multiset, same docs)") {
    val docs = docsDF
    val path = tmp("graft_ing_idem") + "/idx"
    Dedup.writeNearDupIndex(docs.where(col("id") <= 3), "id", "text", path,
      shingleSize = 2)
    val batch = docs.where(col("id") >= 11)
    val r1 = canon(Dedup.ingestBatch(spark, batch, path, "id", "text",
      shingleSize = 2, batchId = Some("day-1")))
    val bandsAfter = multiset(ManifestTable.read(spark, path + "/bands"))
    val docsAfter = multiset(
      graft.store.KeyedStore.readKeyed(spark, path + "/docs"))
    val r2 = canon(Dedup.ingestBatch(spark, batch, path, "id", "text",
      shingleSize = 2, batchId = Some("day-1")))
    assert(r2 == r1, "replayed survivors must equal the original return")
    assert(r1.map(_.head) == Set(13L), "only the novel doc survives")
    assert(multiset(ManifestTable.read(spark, path + "/bands")) == bandsAfter,
      "retry must not append a single band row")
    assert(multiset(graft.store.KeyedStore.readKeyed(spark, path + "/docs")) ==
      docsAfter, "retry must not touch the docs store")
  }

  test("ingestBatch retry from the docs-first crash window (docs upserted, " +
      "bands never landed) converges to the clean-run state") {
    val docs = docsDF
    def freshIndex(): String = {
      val p = tmp("graft_ing_crash") + "/idx"
      Dedup.writeNearDupIndex(docs.where(col("id") <= 3), "id", "text", p,
        shingleSize = 2)
      p
    }
    val batch = docs.where(col("id") >= 11)
    // clean run for reference
    val clean = freshIndex()
    val rClean = canon(Dedup.ingestBatch(spark, batch, clean, "id", "text",
      shingleSize = 2, batchId = Some("day-1")))
    // crashed run: the survivor's shingle set landed in docs, bands did not
    val crashed = freshIndex()
    graft.store.KeyedStore.upsertIndexed(spark, crashed + "/docs",
      Dedup.hashedShingles(docs.where(col("id") === 13), "id", "text", 2)
        .select(col("id").as("key"), col("th")))
    val rRetry = canon(Dedup.ingestBatch(spark, batch, crashed, "id", "text",
      shingleSize = 2, batchId = Some("day-1")))
    assert(rRetry == rClean,
      "retry must return the same survivors as a never-crashed run")
    assert(multiset(ManifestTable.read(spark, crashed + "/bands")) ==
      multiset(ManifestTable.read(spark, clean + "/bands")),
      "band tables must converge")
    assert(multiset(graft.store.KeyedStore.readKeyed(spark, crashed + "/docs")) ==
      multiset(graft.store.KeyedStore.readKeyed(spark, clean + "/docs")),
      "docs stores must converge")
    // a copy of the survivor now drops against either index
    val probe = Seq((113L, "z1 z2 z3 z4 z5 z6")).toDF("id", "text")
    assert(canon(Dedup.dedupeAgainstIndex(spark, probe, crashed, "id", "text",
      shingleSize = 2)).isEmpty)
  }

  test("appendPairs with a batchId: blind retry exact; the pairs-committed/" +
      "postings-missing crash window heals; the inverse state rejects loudly") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5"), (2L, "w1 w2 w3 w4 w5"),
      (3L, "a b c d e f"), (4L, "w1 w2 w3 w4 zz"), (5L, "a b c d e zz"))
      .toDF("id", "text")
    val path = tmp("graft_pair_idem") + "/p"
    Dedup.writePairs(docs.where(col("id") <= 3), "id", "text", path,
      shingleSize = 2, minJaccard = 0.2, maxDf = None)
    val batch = docs.where(col("id") >= 4)
    def append(): Unit = Dedup.appendPairs(batch, "id", "text", path,
      shingleSize = 2, minJaccard = 0.2, maxDf = None, batchId = Some("b1"))
    append()
    val pairsAfter = multiset(ManifestTable.read(spark, path + "/pairs"))
    val postsAfter = multiset(ManifestTable.read(spark, path + "/postings"))
    append() // blind retry after full completion
    assert(multiset(ManifestTable.read(spark, path + "/pairs")) == pairsAfter)
    assert(multiset(ManifestTable.read(spark, path + "/postings")) == postsAfter)
    // crash window: pairs committed, postings never landed — delete the
    // tagged postings files AND the marker, exactly what a crash between
    // the two appends leaves behind
    val tok = java.security.MessageDigest.getInstance("MD5")
      .digest("b1".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val postGen = new java.io.File(ManifestTable.resolve(spark,
      path + "/postings"))
    val tagged = postGen.listFiles.filter(_.getName.startsWith(s"tag-$tok-"))
    assert(tagged.nonEmpty, "the tagged postings files must be identifiable")
    tagged.foreach(f => assert(f.delete()))
    rmTags(path + "/postings")
    append() // retry lands ONLY the missing postings (pairs tag short-circuits)
    assert(multiset(ManifestTable.read(spark, path + "/pairs")) == pairsAfter,
      "the mine must not re-run")
    assert(multiset(ManifestTable.read(spark, path + "/postings")) == postsAfter,
      "the missing postings must land exactly once")
    // the inverse state (postings committed, pairs not) is impossible for
    // this writer and must reject rather than silently double-count
    rmTags(path + "/pairs")
    intercept[IllegalStateException] { append() }
  }

  test("repairNearDupIndex: rebuilds bands from the authoritative docs " +
      "store — orphans purged, missing regenerated, duplicates collapsed — " +
      "and reports exact counts; a second repair is a zero-delta no-op") {
    val docs = docsDF
    val path = tmp("graft_ndfsck") + "/idx"
    Dedup.writeNearDupIndex(docs.where(col("id") <= 3), "id", "text", path,
      shingleSize = 2)
    Dedup.appendNearDupIndex(docs.where(col("id") === 13), "id", "text", path,
      shingleSize = 2)
    // orphan: docs entry for 3 deleted outside the takedown verb
    graft.store.KeyedStore.deleteIndexed(spark, path + "/docs",
      Seq(3L).toDF("key"))
    // duplicates: a blind untagged re-append of 13
    Dedup.appendNearDupIndex(docs.where(col("id") === 13), "id", "text", path,
      shingleSize = 2)
    // missing: doc 14's shingle set upserted, bands never written
    graft.store.KeyedStore.upsertIndexed(spark, path + "/docs",
      Dedup.hashedShingles(Seq((14L, "m1 m2 m3 m4 m5 m6")).toDF("id", "text"),
        "id", "text", 2).select(col("id").as("key"), col("th")))
    val rep = Dedup.repairNearDupIndex(spark, path).collect().head
    assert(rep.getAs[Long]("duplicate_rows") == 32L, s"got $rep")
    assert(rep.getAs[Long]("orphan_rows") == 32L, s"got $rep")
    assert(rep.getAs[Long]("regenerated_docs") == 1L, s"got $rep")
    assert(rep.getAs[Long]("band_rows") == 4 * 32L, s"got $rep")
    // the rebuilt band table equals a from-scratch index of the members
    val fresh = tmp("graft_ndfsck") + "/fresh"
    Dedup.writeNearDupIndex(
      docs.where(col("id").isin(1L, 2L, 13L))
        .union(Seq((14L, "m1 m2 m3 m4 m5 m6")).toDF("id", "text")),
      "id", "text", fresh, shingleSize = 2)
    assert(multiset(ManifestTable.read(spark, path + "/bands")) ==
      multiset(ManifestTable.read(spark, fresh + "/bands")),
      "rebuilt bands must equal the from-scratch derivation")
    // probe visibility: a copy of the REGENERATED doc now drops; a copy of
    // the orphaned doc survives (its evidence is gone)
    val probe = Seq((114L, "m1 m2 m3 m4 m5 m6"), (103L, "k1 k2 k3 k4 k5 k6"))
      .toDF("id", "text")
    assert(canon(Dedup.dedupeAgainstIndex(spark, probe, path, "id", "text",
      shingleSize = 2).select(col("id"))) == Set(Seq(103L)))
    // idempotent: nothing left to fix
    val rep2 = Dedup.repairNearDupIndex(spark, path).collect().head
    assert(rep2.getAs[Long]("duplicate_rows") == 0L)
    assert(rep2.getAs[Long]("orphan_rows") == 0L)
    assert(rep2.getAs[Long]("regenerated_docs") == 0L)
    assert(rep2.getAs[Long]("band_rows") == 4 * 32L)
  }

  // ---------------------------------------------- partitioned-layout compaction

  test("compactIvfCorpus: per-cell file counts shrink; partition-pruned " +
      "probe results identical") {
    val vecs = (0 until 40).map(i =>
      (i.toLong, Seq(math.cos(i % 4).toFloat, math.sin(i % 4).toFloat,
        (i % 7).toFloat / 7f)))
      .toDF("id", "vec")
    val cents = Similarity.ivfCentroids(vecs, "id", "vec", k = 3)
    val path = tmp("graft_ivfc") + "/ivf"
    Similarity.writeIvfCorpus(vecs.where(col("id") < 20), "id", "vec", path, cents)
    (0 until 3).foreach(b =>
      Similarity.appendIvfCorpus(
        vecs.where(col("id") >= 20 && col("id") % 3 === b),
        "id", "vec", path, cents))
    val q = Seq(math.cos(1).toFloat, math.sin(1).toFloat, 0.3f)
    val before = canon(Similarity.ivfTopKFromPartitioned(spark, path, "id",
      "vec", q, 5, cents).select(col("id"), round(col("cos"), 5)))
    val cellDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    val filesBefore = cellDirs.map(d => liveFiles(d.toString)).sum
    val rewritten = Similarity.compactIvfCorpus(spark, path, targetFiles = 1)
    assert(rewritten > 0, "at least one appended cell should need compaction")
    val filesAfter = cellDirs.map(d => liveFiles(d.toString)).sum
    assert(filesAfter < filesBefore,
      s"file count must shrink: $filesBefore -> $filesAfter")
    cellDirs.foreach(d => assert(liveFiles(d.toString) <= 1,
      s"${d.getName} still has ${liveFiles(d.toString)} live files"))
    val after = canon(Similarity.ivfTopKFromPartitioned(spark, path, "id",
      "vec", q, 5, cents).select(col("id"), round(col("cos"), 5)))
    assert(after == before, "probe must be oblivious to compaction")
  }

  test("compactBm25Index: per-bucket file counts shrink; staged stats " +
      "sidecar swap keeps scores identical to the from-scratch build") {
    val docs = Seq(
      (1L, "spark window merge spark"), (2L, "window table scan"),
      (3L, "merge join spark"), (4L, "filter scan batch window"),
      (5L, "spark spark spark merge window"), (6L, "unrelated words only"))
      .toDF("id", "text")
    val path = tmp("graft_bm25c") + "/bm25"
    TextOps.writeBm25Index(docs.where(col("id") <= 2), "id", "text", path,
      nBuckets = 4)
    (3L to 6L).foreach(i =>
      TextOps.appendBm25Index(docs.where(col("id") === i), "id", "text", path,
        nBuckets = 4))
    val q = Seq("spark", "window", "merge")
    val direct = canon(TextOps.bm25TopK(docs, "id", "text", q, 10))
    val appended = canon(TextOps.bm25TopKFromIndex(spark, path, q, 10,
      nBuckets = 4))
    assert(appended == direct, "append path must equal the direct scan")
    val rewritten = TextOps.compactBm25Index(spark, path, targetFiles = 1)
    assert(rewritten > 0, "appends should have left compactable buckets")
    val bucketDirs = new java.io.File(path, "postings").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
    bucketDirs.foreach(d => assert(liveFiles(d.toString) <= 1,
      s"${d.getName} still has ${liveFiles(d.toString)} live files"))
    val compacted = canon(TextOps.bm25TopKFromIndex(spark, path, q, 10,
      nBuckets = 4))
    assert(compacted == direct, "scores must be oblivious to compaction")
  }

  test("compactBm25Index twice: keep-one-back leaves TWO generations live " +
      "in a leaf — the probe resolves one and never double-counts") {
    val docs = Seq(
      (1L, "spark window merge spark"), (2L, "window table scan"),
      (3L, "merge join spark"), (4L, "filter scan batch window"),
      (5L, "spark spark spark merge window"), (6L, "merge window scan"))
      .toDF("id", "text")
    val path = tmp("graft_bm25g2") + "/bm25"
    val q = Seq("spark", "window", "merge")
    def fromScratch(upTo: Long): Set[Seq[Any]] = {
      val fresh = tmp("graft_bm25g2") + s"/fresh$upTo"
      TextOps.writeBm25Index(docs.where(col("id") <= upTo), "id", "text",
        fresh, nBuckets = 4)
      canon(TextOps.bm25TopKFromIndex(spark, fresh, q, 10, nBuckets = 4))
    }
    TextOps.writeBm25Index(docs.where(col("id") <= 2), "id", "text", path,
      nBuckets = 4)
    (3L to 4L).foreach(i => TextOps.appendBm25Index(
      docs.where(col("id") === i), "id", "text", path, nBuckets = 4))
    TextOps.compactBm25Index(spark, path, targetFiles = 1): Unit
    // keep-one-back: a rewritten leaf now holds BOTH generations on disk —
    // the state in which a root scan double-counts every posting
    def genCounts: Seq[Int] = new java.io.File(path, "postings").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("bucket="))
      .map(_.listFiles().count(g => g.isDirectory && g.getName.startsWith("gen-")))
      .toSeq
    assert(genCounts.exists(_ >= 2),
      s"expected a double-generation leaf after the compaction: $genCounts")
    assert(canon(TextOps.bm25TopKFromIndex(spark, path, q, 10, nBuckets = 4)) ==
      fromScratch(4L), "double-generation probe must not double-count")
    // the daily loop's SECOND rewrite (append + compact again) — the case
    // round-11's root-scan reader broke on
    (5L to 6L).foreach(i => TextOps.appendBm25Index(
      docs.where(col("id") === i), "id", "text", path, nBuckets = 4))
    TextOps.compactBm25Index(spark, path, targetFiles = 1): Unit
    assert(genCounts.exists(_ >= 2), s"still double-generation: $genCounts")
    assert(canon(TextOps.bm25TopKFromIndex(spark, path, q, 10, nBuckets = 4)) ==
      fromScratch(6L), "second rewrite must stay exact")
  }

  test("annTopKFromBucketed survives compactBucketedCorpus: the SRP layout " +
      "is manifest-backed like IVF — probe and row multiset oblivious") {
    val base = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(6)(d => ((i * 6 + d) % 5 + 1).toFloat).toSeq))
      .toDF("id", "v")
    val query = Array.tabulate(6)(d => (d + 1).toFloat).toSeq
    val path = tmp("graft_srpc") + "/srp"
    Similarity.writeBucketedCorpus(base, "id", "v", path, nBits = 4)
    (0 until 3).foreach { b =>
      val batch = Seq((100L + b, query)).toDF("id", "v")
      Similarity.appendBucketedCorpus(batch, "id", "v", path, nBits = 4)
    }
    val before = canon(Similarity.annTopKFromBucketed(spark, path, "id", "v",
      query, 3, nBits = 4).select(col("id"), round(col("cos"), 5)))
    val rows = multiset(readLayout(path, "bucket"))
    val rewritten = Similarity.compactBucketedCorpus(spark, path, targetFiles = 1)
    assert(rewritten > 0, "appends should have left compactable buckets")
    assert(canon(Similarity.annTopKFromBucketed(spark, path, "id", "v",
      query, 3, nBits = 4).select(col("id"), round(col("cos"), 5))) == before,
      "probe must be oblivious to compaction")
    assert(multiset(readLayout(path, "bucket")) == rows,
      "compaction must preserve the row multiset")
  }

  test("appendIvfCorpus with a batchId: blind retry exact; a crash that " +
      "lost the tag marker heals by sweep (partitioned-layout tags)") {
    val vecs = (0 until 30).map(i =>
      (i.toLong, Seq(math.cos(i % 3).toFloat, math.sin(i % 3).toFloat)))
      .toDF("id", "vec")
    val cents = Similarity.ivfCentroids(vecs.where(col("id") < 20),
      "id", "vec", k = 3)
    val path = tmp("graft_ivf_idem") + "/ivf"
    Similarity.writeIvfCorpus(vecs.where(col("id") < 20), "id", "vec", path,
      cents)
    val batch = vecs.where(col("id") >= 20)
    Similarity.appendIvfCorpus(batch, "id", "vec", path, cents,
      batchId = Some("b1"))
    val after = multiset(readLayout(path, "cell"))
    Similarity.appendIvfCorpus(batch, "id", "vec", path, cents,
      batchId = Some("b1")) // blind retry
    assert(multiset(readLayout(path, "cell")) == after,
      "retry must not append a single row")
    // lost marker: the tagged files are still identified by prefix and
    // swept before the rewrite — rows stay exact
    rmTags(path)
    Similarity.appendIvfCorpus(batch, "id", "vec", path, cents,
      batchId = Some("b1"))
    assert(multiset(readLayout(path, "cell")) == after,
      "sweep-and-rewrite must not duplicate the batch")
  }

  test("appendBm25Index with a batchId: blind retry exact across postings, " +
      "docs membership, and the derived stats sidecar") {
    val docs = Seq(
      (1L, "spark window merge spark"), (2L, "window table scan"),
      (3L, "merge join spark"), (4L, "filter scan batch window"))
      .toDF("id", "text")
    val path = tmp("graft_bm25_idem") + "/bm25"
    TextOps.writeBm25Index(docs.where(col("id") <= 2), "id", "text", path,
      nBuckets = 4)
    val batch = docs.where(col("id") >= 3)
    def append(): Unit = TextOps.appendBm25Index(batch, "id", "text", path,
      nBuckets = 4, batchId = Some("b1"))
    append()
    val posts = multiset(readLayout(path + "/postings", "bucket"))
    val stats = multiset(graft.store.ManifestTable.read(spark, path + "/stats"))
    val members = multiset(ManifestTable.read(spark, path + "/docs"))
    append() // blind retry: both tags committed, stats re-derive to the same row
    assert(multiset(readLayout(path + "/postings", "bucket")) == posts)
    assert(multiset(graft.store.ManifestTable.read(spark, path + "/stats")) == stats)
    assert(multiset(ManifestTable.read(spark, path + "/docs")) == members)
    // crash window: docs committed, postings never landed — delete the
    // tagged posting files and the marker, then retry
    val tok = java.security.MessageDigest.getInstance("MD5")
      .digest("b1".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val tagged = filesUnder(new java.io.File(path + "/postings"),
      _.startsWith(s"tag-$tok-"))
    assert(tagged.nonEmpty, "tagged posting files must be identifiable")
    tagged.foreach(f => assert(f.delete()))
    rmTags(path + "/postings")
    append() // docs tag short-circuits; only the postings land
    assert(multiset(readLayout(path + "/postings", "bucket")) == posts,
      "the missing postings must land exactly once")
    assert(multiset(ManifestTable.read(spark, path + "/docs")) == members,
      "the docs membership must not double-append")
    assert(multiset(graft.store.ManifestTable.read(spark, path + "/stats")) == stats)
    // the probe equals a from-scratch build of the same corpus
    val fresh = tmp("graft_bm25_idem") + "/fresh"
    TextOps.writeBm25Index(docs, "id", "text", fresh, nBuckets = 4)
    val q = Seq("spark", "window", "merge")
    assert(canon(TextOps.bm25TopKFromIndex(spark, path, q, 10, nBuckets = 4)) ==
      canon(TextOps.bm25TopKFromIndex(spark, fresh, q, 10, nBuckets = 4)))
  }

  test("appendBm25Index additive stats (round-18): every append leaves " +
      "stats == aggregate(docs) exactly, including null-text members, " +
      "and an out-of-sync sidecar falls back to the full re-derive") {
    val docs = Seq(
      (1L, "spark window merge spark"), (2L, "window table scan"),
      (3L, null.asInstanceOf[String]), (4L, "filter scan batch window"),
      (5L, "merge join spark"), (6L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val path = tmp("graft_bm25_addstats") + "/bm25"
    TextOps.writeBm25Index(docs.where(col("id") <= 2), "id", "text", path,
      nBuckets = 4)
    def scratchAgg() = multiset(
      ManifestTable.read(spark, path + "/docs")
        .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")))
    def stats() = multiset(ManifestTable.read(spark, path + "/stats"))
    // additive path: synced sidecar + fresh batch (null-text dl rides as
    // null — counted in n_docs, skipped by the sum, exactly like scratch)
    TextOps.appendBm25Index(docs.where(col("id") === 3L || col("id") === 4L),
      "id", "text", path, nBuckets = 4, batchId = Some("add-1"))
    assert(stats() == scratchAgg(), "additive stats must equal aggregate(docs)")
    // second additive hop composes
    TextOps.appendBm25Index(docs.where(col("id") === 5L || col("id") === 6L),
      "id", "text", path, nBuckets = 4, batchId = Some("add-2"))
    assert(stats() == scratchAgg(), "two additive hops must still be exact")
    // out-of-sync sidecar (simulate a pre-round-18 generation / crash
    // residue: stale stats with no usable fingerprint) — the next append
    // must fall back to the full re-derive and still converge
    import spark.implicits._
    ManifestTable.write(Seq((999L, Some(999L))).toDF("n_docs", "sum_dl"),
      path + "/stats") // no fingerprint stamp rides this write
    TextOps.appendBm25Index(Seq((7L, "spark again")).toDF("id", "text"),
      "id", "text", path, nBuckets = 4, batchId = Some("add-3"))
    assert(stats() == scratchAgg(),
      "an unsynced sidecar must re-derive from the docs membership")
  }

  test("appendBm25Index drift guard (round-19): an observation that " +
      "disagrees with the committed row count falls back to the full " +
      "re-derive instead of stamping a wrong additive sidecar") {
    val path = tmp("graft_bm25_drift") + "/bm25"
    TextOps.writeBm25Index(Seq((1L, "spark window"), (2L, "merge scan"))
      .toDF("id", "text"), "id", "text", path, nBuckets = 4)
    def scratchAgg() = multiset(
      ManifestTable.read(spark, path + "/docs")
        .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")))
    def stats() = multiset(ManifestTable.read(spark, path + "/stats"))
    // positive control: a clean synced append passes the footer cross-check
    // and takes the ADDITIVE path (the check must not be trivially false)
    val before = TextOps.statsAdditiveRuns.get()
    TextOps.appendBm25Index(Seq((3L, "window join")).toDF("id", "text"),
      "id", "text", path, nBuckets = 4, batchId = Some("ok-1"))
    assert(TextOps.statsAdditiveRuns.get() - before == 1L,
      "a clean synced append must take the additive path")
    assert(stats() == scratchAgg())
    // drift injection: the observed count disagrees with what the commit
    // actually added (the stage-retry / speculative double-count class) —
    // the guard must SKIP the additive fold and re-derive exactly
    TextOps.statsObservationSkew.set(1L)
    try {
      val b2 = TextOps.statsAdditiveRuns.get()
      TextOps.appendBm25Index(Seq((4L, "batch filter")).toDF("id", "text"),
        "id", "text", path, nBuckets = 4, batchId = Some("skew-1"))
      assert(TextOps.statsAdditiveRuns.get() - b2 == 0L,
        "a drifted observation must not take the additive path")
      assert(stats() == scratchAgg(),
        "the fallback re-derive must leave stats == aggregate(docs)")
    } finally TextOps.statsObservationSkew.set(0L)
    // and the layout has CONVERGED: the next clean append is additive again
    val b3 = TextOps.statsAdditiveRuns.get()
    TextOps.appendBm25Index(Seq((5L, "spark merge")).toDF("id", "text"),
      "id", "text", path, nBuckets = 4, batchId = Some("ok-2"))
    assert(TextOps.statsAdditiveRuns.get() - b3 == 1L && stats() == scratchAgg(),
      "the guard must not wedge the additive path after one drift event")
  }

  test("layout writers are born at the compaction target: every leaf holds " +
      "at most filesPerLeaf live files, not tasks x leaves small ones") {
    def leafCounts(root: String, prefix: String): Seq[Int] =
      new java.io.File(root).listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith(prefix))
        .map(d => liveFiles(d.toString)).toSeq
    // BM25: 200 docs spread over 32 input partitions would fan out dozens
    // of files per bucket without the salted repartition
    val docs = spark.range(200).select(col("id"),
      concat_ws(" ", lit("w"), col("id") % 7, lit("x"), col("id") % 11)
        .as("text"))
    val bm = tmp("graft_born") + "/bm25"
    TextOps.writeBm25Index(docs.repartition(32), "id", "text", bm,
      nBuckets = 4, filesPerLeaf = 2)
    val bmCounts = leafCounts(bm + "/postings", "bucket=")
    assert(bmCounts.nonEmpty && bmCounts.forall(_ <= 2), s"bm25: $bmCounts")
    // IVF
    val vecs = (0 until 120).map(i =>
      (i.toLong, Seq(math.cos(i % 3).toFloat, math.sin(i % 3).toFloat)))
      .toDF("id", "vec")
    val cents = Similarity.ivfCentroids(vecs, "id", "vec", k = 3)
    val ivf = tmp("graft_born") + "/ivf"
    Similarity.writeIvfCorpus(vecs.repartition(32), "id", "vec", ivf, cents,
      filesPerLeaf = 2)
    val ivfCounts = leafCounts(ivf, "cell=")
    assert(ivfCounts.nonEmpty && ivfCounts.forall(_ <= 2), s"ivf: $ivfCounts")
    // SRP
    val srp = tmp("graft_born") + "/srp"
    Similarity.writeBucketedCorpus(vecs.repartition(32), "id", "vec", srp,
      nBits = 3, filesPerLeaf = 1)
    val srpCounts = leafCounts(srp, "bucket=")
    assert(srpCounts.nonEmpty && srpCounts.forall(_ <= 1), s"srp: $srpCounts")
  }

  test("CommitTags: a legacy single-file _TAGS migrates to the per-token " +
      "marker directory on the first add, preserving committed tags") {
    val t = tmp("graft_tagmig") + "/t"
    ManifestTable.write(Seq((1L, "a")).toDF("id", "v"), t)
    assert(ManifestTable.appendTagged(Seq((2L, "b")).toDF("id", "v"), t, "b1"))
    // rewrite the marker set in the pre-round-12 single-file shape
    val tok1 = java.security.MessageDigest.getInstance("MD5")
      .digest("b1".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val f = new java.io.File(t, "_TAGS")
    val fs = new org.apache.hadoop.fs.Path(t, "_TAGS")
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(t, "_TAGS"), true): Unit
    java.nio.file.Files.write(f.toPath, (tok1 + "\n").getBytes("UTF-8")): Unit
    assert(f.isFile)
    // the legacy file still short-circuits its tag…
    assert(!ManifestTable.appendTagged(Seq((2L, "b")).toDF("id", "v"), t, "b1"))
    // …and a NEW tag migrates the set to the directory shape, keeping b1
    assert(ManifestTable.appendTagged(Seq((3L, "c")).toDF("id", "v"), t, "b2"))
    assert(f.isDirectory, "_TAGS must be a marker directory after the add")
    assert(!ManifestTable.appendTagged(Seq((2L, "b")).toDF("id", "v"), t, "b1"),
      "migrated tags must survive")
    assert(!ManifestTable.appendTagged(Seq((3L, "c")).toDF("id", "v"), t, "b2"))
    assert(multiset(ManifestTable.read(spark, t)).keySet.map(_.head) ==
      Set(1L, 2L, 3L))
  }

  test("retrainIvfCorpus: blue/green rebuild preserves the row multiset, " +
      "re-balances a drift-skewed layout, and the old layout still serves") {
    val base = (0 until 30).map(i =>
      (i.toLong, Seq(math.cos(i % 3).toFloat, math.sin(i % 3).toFloat)))
      .toDF("id", "vec")
    val cents = Similarity.ivfCentroids(base, "id", "vec", k = 3)
    val root = tmp("graft_retrain")
    val path = root + "/ivf"
    Similarity.writeIvfCorpus(base, "id", "vec", path, cents)
    // drifted batch: a new direction the pinned centroids never saw — every
    // vector crowds into whichever old cell wins the argmax
    val drift = (100 until 130).map(i =>
      (i.toLong, Seq((-math.cos(0.2 * (i % 5))).toFloat,
        (-math.sin(0.2 * (i % 5))).toFloat)))
      .toDF("id", "vec")
    Similarity.appendIvfCorpus(drift, "id", "vec", path, cents)
    val skewed = Similarity.ivfLayoutHealth(spark, path, 3)
      .agg(max(col("permille"))).head().getLong(0)
    val newPath = root + "/ivf_v2"
    val cents2 = Similarity.retrainIvfCorpus(spark, path, newPath,
      "id", "vec", k = 4)
    assert(cents2.length == 4)
    // row multiset preserved (ids + vectors; cell assignment changes)
    def rows(p: String) = canon(Compaction.readPartitioned(spark, p, "cell")
      .get.select(col("id")))
    assert(rows(newPath) == rows(path),
      "retrain must carry every surviving row")
    // the retrained layout is less skewed than the drifted one
    val rebal = Similarity.ivfLayoutHealth(spark, newPath, 4)
      .agg(max(col("permille"))).head().getLong(0)
    assert(rebal < skewed, s"occupancy must re-balance: $skewed -> $rebal")
    // a drifted vector surfaces through the NEW pinned centroids...
    val q = Seq((-math.cos(0.2)).toFloat, (-math.sin(0.2)).toFloat)
    val top = Similarity.ivfTopKFromPartitioned(spark, newPath, "id", "vec",
      q, 3, cents2).collect().map(_.getLong(0)).toSet
    assert(top.forall(_ >= 100L), s"drifted vectors must dominate: $top")
    // ...and the OLD layout still serves probes untouched (blue/green)
    assert(Similarity.ivfTopKFromPartitioned(spark, path, "id", "vec",
      q, 3, cents).count() == 3)
  }

  // -------------------------------------------------------- pair retention

  test("prunePairs: the pruned table is row-identical to a fresh mine at " +
      "the raised floor, and higher-threshold reads are unchanged") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5"), (2L, "w1 w2 w3 w4 w5"),
      (3L, "w1 w2 w3 w4 zz"), (4L, "a b c d e f"), (5L, "a b c d e zz"),
      (6L, "totally different text here now"))
      .toDF("id", "text")
    val full = tmp("graft_prune") + "/full"
    val fresh = tmp("graft_prune") + "/fresh"
    Dedup.writePairs(docs, "id", "text", full, shingleSize = 2, minJaccard = 0.2)
    val at08Before = multiset(Dedup.readPairs(spark, full, threshold = 0.8))
    Dedup.prunePairs(spark, full, newMinJaccard = 0.5)
    Dedup.writePairs(docs, "id", "text", fresh, shingleSize = 2, minJaccard = 0.5)
    assert(multiset(ManifestTable.read(spark, full + "/pairs")) ==
      multiset(ManifestTable.read(spark, fresh + "/pairs")),
      "pruned table must equal a fresh mine at the new floor")
    assert(multiset(Dedup.readPairs(spark, full, threshold = 0.8)) ==
      at08Before, "reads above the raised floor must be unchanged")
  }

  // --------------------------------------------------- routing-probe cache

  test("matchedControls: the routing probe runs once per (plan, cap) — " +
      "repeated calls hit the cache; pinned calls never probe") {
    val df = (1 to 200).map(i =>
      (i.toLong, s"g${i % 3}", (i * 7 % 50).toLong, i % 4 == 0))
      .toDF("id", "grp", "v", "t")
    val probesBefore = Sampling.routeProbeRuns.get()
    val r1 = canon(Sampling.matchedControls(df, "id", "grp", "v", "t"))
    val afterFirst = Sampling.routeProbeRuns.get()
    assert(afterFirst == probesBefore + 1, "first call must probe once")
    val r2 = canon(Sampling.matchedControls(df, "id", "grp", "v", "t"))
    assert(Sampling.routeProbeRuns.get() == afterFirst,
      "second call on the same frame must not re-probe")
    assert(r1 == r2)
    // a REBUILT identical frame canonicalizes to the same plan -> cache hit
    val rebuilt = (1 to 200).map(i =>
      (i.toLong, s"g${i % 3}", (i * 7 % 50).toLong, i % 4 == 0))
      .toDF("id", "grp", "v", "t")
    canon(Sampling.matchedControls(rebuilt, "id", "grp", "v", "t")): Unit
    // pinned routing skips the probe entirely
    val pinnedBefore = Sampling.routeProbeRuns.get()
    val r3 = canon(Sampling.matchedControls(df, "id", "grp", "v", "t",
      global = Some(true)))
    assert(Sampling.routeProbeRuns.get() == pinnedBefore)
    assert(r3 == r1, "routing must not change results")
  }

  test("plan pins: the tombstone veto is a BROADCAST anti-join on the " +
      "candidate side (never a shuffle), and a pruned readPairs keeps its " +
      "parquet filter pushdown through the manifest indirection") {
    val docs = docsDF
    val path = tmp("graft_ndplan") + "/idx"
    Dedup.writeNearDupIndex(docs.where(col("id") <= 3), "id", "text", path,
      shingleSize = 2)
    Dedup.removeFromNearDupIndex(spark, path, Seq(1L).toDF("id"))
    // the veto join lives inside the drop-rule plan (the public operator
    // materializes it eagerly — Eager contract — so inspect the rule
    // frame itself, pre-materialization)
    val hb = Dedup.hashedShingles(docs.where(col("id") >= 11), "id", "text", 2)
    val plan = Dedup.indexDropIds(spark, hb, path, 128, 4, 0.8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.replaceAll("(?s)\\n", " ").matches(".*BroadcastHashJoin \\[corpus_id.*LeftAnti.*"),
      s"tombstone veto must be a broadcast anti-join on corpus_id:\n$plan")
    // the pairs table reads through a generation dir; the threshold filter
    // must still reach the parquet scan as a pushed predicate on `inter`
    val ppath = tmp("graft_prplan") + "/p"
    Dedup.writePairs(docs, "id", "text", ppath, shingleSize = 2,
      minJaccard = 0.2)
    val rplan = Dedup.readPairs(spark, ppath, threshold = 0.8)
      .where(col("id_a") === 1L)
      .queryExecution.executedPlan.toString
    assert(rplan.contains("EqualTo(id_a,1)") &&
      "PushedFilters: \\[[^\\]]*EqualTo\\(id_a,1\\)".r.findFirstIn(rplan).nonEmpty,
      s"id filter must push through the manifest read:\n$rplan")
    assert(rplan.contains("/pairs/gen-"),
      s"the scan must resolve through a generation dir:\n$rplan")
  }

  test("plan pins (round 17): every lazy-takedown probe mask — SRP, IVF, " +
      "BM25 — is a BROADCAST anti-join on the tiny tombstone sidecar, " +
      "never a shuffle of the probed corpus") {
    val vecs = (0 until 30).map(i =>
      (i.toLong, Seq(math.cos(i % 3).toFloat, math.sin(i % 3).toFloat)))
      .toDF("id", "vec")
    val q = Seq(1f, 0f)
    val root = tmp("graft_tsplan")
    def assertMask(plan: String, what: String): Unit =
      assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
        s"$what's tombstone mask must be a broadcast anti-join:\n$plan")
    val spath = root + "/srp"
    Similarity.writeBucketedCorpus(vecs, "id", "vec", spath, nBits = 4)
    Similarity.tombstoneBucketedCorpus(spark, spath, Seq(1L).toDF("id")): Unit
    assertMask(Similarity.annTopKFromBucketed(spark, spath, "id", "vec",
      q, 5, nBits = 4).queryExecution.executedPlan.toString, "SRP probe")
    val cents = Similarity.ivfCentroids(vecs, "id", "vec", 3)
    val ipath = root + "/ivf"
    Similarity.writeIvfCorpus(vecs, "id", "vec", ipath, cents)
    Similarity.tombstoneIvfCorpus(spark, ipath, Seq(1L).toDF("id")): Unit
    assertMask(Similarity.ivfTopKFromPartitioned(spark, ipath, "id", "vec",
      q, 5, cents).queryExecution.executedPlan.toString, "IVF probe")
    val bpath = root + "/bm25"
    TextOps.writeBm25Index(Seq((1L, "a b"), (2L, "a c"), (3L, "b c"))
      .toDF("id", "text"), "id", "text", bpath, nBuckets = 2)
    TextOps.tombstoneBm25Index(spark, bpath, Seq(1L).toDF("id")): Unit
    assertMask(TextOps.bm25TopKFromIndex(spark, bpath, Seq("a", "b"), 5,
      nBuckets = 2).queryExecution.executedPlan.toString, "BM25 probe")
  }

  // ------------------------------------------- takedown across every layout

  test("removeFromBm25Index: probe equals a from-scratch index of the " +
      "survivors — postings purged, stats exact (incl. token-less docs)") {
    val docs = Seq(
      (1L, "spark window merge spark"), (2L, "window table scan"),
      (3L, "merge join spark"), (4L, "filter scan batch window"),
      (5L, "spark spark spark merge window"), (6L, ""))
      .toDF("id", "text")
    val full = tmp("graft_bmrm") + "/full"
    val fresh = tmp("graft_bmrm") + "/fresh"
    TextOps.writeBm25Index(docs, "id", "text", full, nBuckets = 4)
    // remove a ranking doc (5) AND the token-less doc (6: counts in N,
    // no postings — only the docs sidecar can decrement it)
    TextOps.removeFromBm25Index(spark, full, Seq(5L, 6L).toDF("id"))
    TextOps.writeBm25Index(docs.where(col("id") <= 4), "id", "text", fresh,
      nBuckets = 4)
    val q = Seq("spark", "window", "merge")
    assert(canon(TextOps.bm25TopKFromIndex(spark, full, q, 10, nBuckets = 4)) ==
      canon(TextOps.bm25TopKFromIndex(spark, fresh, q, 10, nBuckets = 4)),
      "post-delete probe must equal the from-scratch survivor index")
    assert(multiset(graft.store.ManifestTable.read(spark, full + "/stats")) ==
      multiset(graft.store.ManifestTable.read(spark, fresh + "/stats")),
      "stats must decrement exactly, including the token-less doc")
    // a further append still works on the rewritten layout
    TextOps.appendBm25Index(Seq((7L, "spark merge")).toDF("id", "text"),
      "id", "text", full, nBuckets = 4)
    TextOps.appendBm25Index(Seq((7L, "spark merge")).toDF("id", "text"),
      "id", "text", fresh, nBuckets = 4)
    assert(canon(TextOps.bm25TopKFromIndex(spark, full, q, 10, nBuckets = 4)) ==
      canon(TextOps.bm25TopKFromIndex(spark, fresh, q, 10, nBuckets = 4)))
  }

  test("tombstoneBm25Index: lazy search takedown is query-complete " +
      "immediately (masked postings + one stats generation, zero bucket " +
      "rewrites), refuses re-ingest, audits via the previous view, and " +
      "the next compaction applies + drains") {
    val docs = Seq(
      (1L, "spark window merge spark"), (2L, "window table scan"),
      (3L, "merge join spark"), (4L, "filter scan batch window"),
      (5L, "spark spark spark merge window"), (6L, ""))
      .toDF("id", "text")
    val full = tmp("graft_bmts") + "/full"
    val fresh = tmp("graft_bmts") + "/fresh"
    TextOps.writeBm25Index(docs, "id", "text", full, nBuckets = 4)
    val q = Seq("spark", "window", "merge")
    val preTakedown = canon(
      TextOps.bm25TopKFromIndex(spark, full, q, 10, nBuckets = 4))
    // tombstone a ranking doc (5) AND the token-less doc (6): O(|ids|) +
    // one stats generation — no postings bucket and no docs row rewrites
    assert(TextOps.tombstoneBm25Index(spark, full,
      Seq(5L, 6L).toDF("id")) == 2L)
    TextOps.writeBm25Index(docs.where(col("id") <= 4), "id", "text", fresh,
      nBuckets = 4)
    def probe(p: String) = canon(
      TextOps.bm25TopKFromIndex(spark, p, q, 10, nBuckets = 4))
    assert(probe(full) == probe(fresh),
      "masked probe must equal the from-scratch survivor index (df, idf, " +
        "stats all survivor-exact)")
    assert(graft.store.ManifestTable.read(spark, full + "/docs")
      .count() == 6L, "membership masked, not rewritten")
    assert(multiset(graft.store.ManifestTable.read(spark, full + "/stats")) ==
      multiset(graft.store.ManifestTable.read(spark, fresh + "/stats")),
      "the tombstone-time stats generation decrements exactly, " +
        "token-less doc included")
    // the audit view: previous postings + the PRE-takedown stats
    // generation reproduce the pre-takedown ranking... after a rewrite
    // funds the postings undo window; here stats alone moved, so the
    // previous-stats read must be the pre-takedown aggregate
    val prevStats = graft.store.ManifestTable
      .readPrevious(spark, full + "/stats").get.collect().head
    assert(prevStats.getLong(0) == 6L,
      s"previous stats generation = pre-takedown N: $prevStats")
    // re-ingesting a pending id is refused loudly
    val ex = intercept[IllegalStateException] {
      TextOps.appendBm25Index(Seq((5L, "spark again")).toDF("id", "text"),
        "id", "text", full, nBuckets = 4)
    }
    assert(ex.getMessage.contains("tombstone"), ex.getMessage)
    // compaction applies the takedown physically and drains
    TextOps.compactBm25Index(spark, full, targetFiles = 4): Unit
    assert(TextOps.bm25Tombstones(spark, full).isEmpty, "drained")
    assert(graft.store.ManifestTable.read(spark, full + "/docs")
      .count() == 4L, "docs rows physically gone")
    assert(multiset(readLayout(full + "/postings", "bucket")) ==
      multiset(readLayout(fresh + "/postings", "bucket")),
      "postings physically equal the survivor scratch index")
    assert(probe(full) == probe(fresh))
    assert(probe(full) != preTakedown,
      "the takedown must have changed the ranking for this corpus")
    // post-drain the ids may re-ingest; both layouts stay in lockstep
    TextOps.appendBm25Index(Seq((5L, "spark merge")).toDF("id", "text"),
      "id", "text", full, nBuckets = 4)
    TextOps.appendBm25Index(Seq((5L, "spark merge")).toDF("id", "text"),
      "id", "text", fresh, nBuckets = 4)
    assert(probe(full) == probe(fresh))
  }

  test("removeFromIvfCorpus: every cell rewritten; probe equals a " +
      "from-scratch layout of the survivors") {
    val vecs = (0 until 30).map(i =>
      (i.toLong, Seq(math.cos(i % 3).toFloat, math.sin(i % 3).toFloat)))
      .toDF("id", "vec")
    val cents = Similarity.ivfCentroids(vecs, "id", "vec", k = 3)
    val full = tmp("graft_ivfrm") + "/full"
    val fresh = tmp("graft_ivfrm") + "/fresh"
    Similarity.writeIvfCorpus(vecs, "id", "vec", full, cents)
    Similarity.removeFromIvfCorpus(spark, full,
      Seq(0L, 1L, 2L, 15L).toDF("id"))
    Similarity.writeIvfCorpus(
      vecs.where(!col("id").isin(0L, 1L, 2L, 15L)), "id", "vec", fresh, cents)
    val q = Seq(math.cos(1).toFloat, math.sin(1).toFloat)
    assert(canon(Similarity.ivfTopKFromPartitioned(spark, full, "id", "vec",
        q, 6, cents).select(col("id"), round(col("cos"), 5))) ==
      canon(Similarity.ivfTopKFromPartitioned(spark, fresh, "id", "vec",
        q, 6, cents).select(col("id"), round(col("cos"), 5))))
    assert(multiset(readLayout(full, "cell")) ==
      multiset(readLayout(fresh, "cell")),
      "surviving rows and cell assignment must be untouched")
  }

  test("tombstoneIvfCorpus: lazy ANN takedown is probe-complete " +
      "immediately with zero rewrites, refuses re-ingest of a pending id, " +
      "retrains born-clean, and the next compaction applies + drains") {
    val vecs = (0 until 30).map(i =>
      (i.toLong, Seq(math.cos(i % 3).toFloat, math.sin(i % 3).toFloat)))
      .toDF("id", "vec")
    val cents = Similarity.ivfCentroids(vecs, "id", "vec", k = 3)
    val root = tmp("graft_ivfts")
    val full = root + "/full"
    val fresh = root + "/fresh"
    val rm = Seq(0L, 1L, 2L, 15L)
    Similarity.writeIvfCorpus(vecs, "id", "vec", full, cents)
    // one layout-wide rewrite funds the undo window for the audit probe
    graft.store.Compaction.rewritePartitions(spark, full, 4, p => p): Unit
    assert(Similarity.tombstoneIvfCorpus(spark, full,
      rm.toDF("id")) == 4L)
    Similarity.writeIvfCorpus(vecs.where(!col("id").isin(rm: _*)),
      "id", "vec", fresh, cents)
    val q = Seq(math.cos(0).toFloat, math.sin(0).toFloat)
    def probe(p: String) = canon(Similarity.ivfTopKFromPartitioned(spark, p,
      "id", "vec", q, 8, cents).select(col("id"), round(col("cos"), 5)))
    // probe-complete IMMEDIATELY: equals the survivor scratch layout while
    // every physical row is still on disk (zero cell rewrites paid)
    assert(probe(full) == probe(fresh))
    assert(readLayout(full, "cell").count() == 30, "masked, not rewritten")
    // the undo/audit probe deliberately still shows the pre-takedown
    // neighborhood (ids 0/1/2 sit at cos 1.0 of this query)
    val audit = Similarity.ivfTopKFromPartitionedPrevious(spark, full,
      "id", "vec", q, 8, cents).collect().map(_.getLong(0)).toSet
    assert(rm.toSet.intersect(audit).nonEmpty,
      s"audit view must keep the pre-takedown neighborhood: $audit")
    // re-ingesting a pending id is refused loudly
    val ex = intercept[IllegalStateException] {
      Similarity.appendIvfCorpus(Seq((15L, Seq(1f, 0f))).toDF("id", "vec"),
        "id", "vec", full, cents)
    }
    assert(ex.getMessage.contains("tombstone"), ex.getMessage)
    // blue/green retrain reads through the mask: the new layout is BORN
    // without the tombstoned rows (and without a sidecar)
    val retrained = root + "/retrained"
    Similarity.retrainIvfCorpus(spark, full, retrained, "id", "vec", k = 3)
    assert(readLayout(retrained, "cell").select(col("id")).collect()
      .map(_.getLong(0)).toSet == (0 until 30).map(_.toLong).toSet -- rm,
      "retrain must exclude tombstoned rows")
    assert(Similarity.ivfTombstones(spark, retrained).isEmpty)
    // compaction applies the takedown physically and drains the sidecar
    Similarity.compactIvfCorpus(spark, full, targetFiles = 4): Unit
    assert(Similarity.ivfTombstones(spark, full).isEmpty, "drained")
    assert(multiset(readLayout(full, "cell")) ==
      multiset(readLayout(fresh, "cell")),
      "physical rows equal the survivor scratch layout after the drain")
    assert(probe(full) == probe(fresh))
    // post-drain the id may re-ingest
    Similarity.appendIvfCorpus(Seq((15L, Seq(1f, 0f))).toDF("id", "vec"),
      "id", "vec", full, cents)
    assert(readLayout(full, "cell").where(col("id") === 15L).count() == 1L)
  }

  test("tombstoneBucketedCorpus: lazy SRP takedown is probe-complete " +
      "immediately with zero bucket rewrites, refuses re-ingest of a " +
      "pending id, audits via the previous view, the next compaction " +
      "applies + drains, and a rebuild clears the sidecar drain-LAST") {
    val vecs = (0 until 30).map(i =>
      (i.toLong, Seq(math.cos(i % 3).toFloat, math.sin(i % 3).toFloat)))
      .toDF("id", "vec")
    val root = tmp("graft_srpts")
    val full = root + "/full"
    val fresh = root + "/fresh"
    val rm = Seq(0L, 1L, 2L, 15L)
    Similarity.writeBucketedCorpus(vecs, "id", "vec", full, nBits = 4)
    // one layout-wide rewrite funds the undo window for the audit probe
    graft.store.Compaction.rewritePartitions(spark, full, 4, p => p): Unit
    assert(Similarity.tombstoneBucketedCorpus(spark, full,
      rm.toDF("id")) == 4L)
    Similarity.writeBucketedCorpus(vecs.where(!col("id").isin(rm: _*)),
      "id", "vec", fresh, nBits = 4)
    val q = Seq(math.cos(0).toFloat, math.sin(0).toFloat)
    def probe(p: String) = canon(Similarity.annTopKFromBucketed(spark, p,
      "id", "vec", q, 8, nBits = 4).select(col("id"), round(col("cos"), 5)))
    // probe-complete IMMEDIATELY: equals the survivor scratch layout while
    // every physical row is still on disk (zero bucket rewrites paid)
    assert(probe(full) == probe(fresh))
    assert(readLayout(full, "bucket").count() == 30, "masked, not rewritten")
    // the undo/audit probe deliberately still shows the pre-takedown
    // neighborhood (ids 0/1/2 sit at cos 1.0 of this query)
    val audit = Similarity.annTopKFromBucketedPrevious(spark, full,
      "id", "vec", q, 8, nBits = 4).collect().map(_.getLong(0)).toSet
    assert(rm.toSet.intersect(audit).nonEmpty,
      s"audit view must keep the pre-takedown neighborhood: $audit")
    // re-ingesting a pending id is refused loudly
    val ex = intercept[IllegalStateException] {
      Similarity.appendBucketedCorpus(Seq((15L, Seq(1f, 0f))).toDF("id", "vec"),
        "id", "vec", full, nBits = 4)
    }
    assert(ex.getMessage.contains("tombstone"), ex.getMessage)
    // compaction applies the takedown physically and drains the sidecar
    Similarity.compactBucketedCorpus(spark, full, targetFiles = 4): Unit
    assert(Similarity.srpTombstones(spark, full).isEmpty, "drained")
    assert(multiset(readLayout(full, "bucket")) ==
      multiset(readLayout(fresh, "bucket")),
      "physical rows equal the survivor scratch layout after the drain")
    assert(probe(full) == probe(fresh))
    // post-drain the id may re-ingest
    Similarity.appendBucketedCorpus(Seq((15L, Seq(1f, 0f))).toDF("id", "vec"),
      "id", "vec", full, nBits = 4)
    assert(readLayout(full, "bucket").where(col("id") === 15L).count() == 1L)
    // rebuild clears a pending sidecar — but only after the fresh layout
    // lands (drain-LAST): the new incarnation is unmasked
    assert(Similarity.tombstoneBucketedCorpus(spark, full,
      Seq(3L).toDF("id")) == 1L)
    Similarity.writeBucketedCorpus(vecs, "id", "vec", full, nBits = 4)
    assert(Similarity.srpTombstones(spark, full).isEmpty, "rebuild drains")
    assert(probe(full).nonEmpty &&
      readLayout(full, "bucket").where(col("id") === 3L).count() == 1L,
      "the fresh corpus is unmasked")
  }

  test("removeFromPairs: uncapped rewritten table row-identical to a " +
      "from-scratch mine of the survivors; reports stop naming ghosts") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5"), (2L, "w1 w2 w3 w4 w5"),
      (3L, "w1 w2 w3 w4 zz"), (4L, "a b c d e f"), (5L, "a b c d e zz"),
      (6L, "totally different text here now"))
      .toDF("id", "text")
    val full = tmp("graft_prm") + "/full"
    val fresh = tmp("graft_prm") + "/fresh"
    Dedup.writePairs(docs, "id", "text", full, shingleSize = 2,
      minJaccard = 0.2, maxDf = None)
    // remove doc 1: its exact-dup partner 2 must stop being dropped by
    // keep-first reports, and no pair may name id 1 again
    Dedup.removeFromPairs(spark, full, Seq(1L).toDF("id"))
    Dedup.writePairs(docs.where(col("id") =!= 1), "id", "text", fresh,
      shingleSize = 2, minJaccard = 0.2, maxDf = None)
    assert(multiset(ManifestTable.read(spark, full + "/pairs")) ==
      multiset(ManifestTable.read(spark, fresh + "/pairs")),
      "rewritten pairs must equal the survivor scratch mine (uncapped)")
    assert(multiset(ManifestTable.read(spark, full + "/postings")) ==
      multiset(ManifestTable.read(spark, fresh + "/postings")),
      "ghost postings must purge")
    // appends against the rewritten postings mine survivor pairs only
    Dedup.appendPairs(Seq((7L, "w1 w2 w3 w4 w5")).toDF("id", "text"),
      "id", "text", full, shingleSize = 2, minJaccard = 0.2, maxDf = None)
    Dedup.appendPairs(Seq((7L, "w1 w2 w3 w4 w5")).toDF("id", "text"),
      "id", "text", fresh, shingleSize = 2, minJaccard = 0.2, maxDf = None)
    assert(multiset(Dedup.readPairs(spark, full, threshold = 0.2)) ==
      multiset(Dedup.readPairs(spark, fresh, threshold = 0.2)),
      "post-delete append must equal the survivor-corpus append")
  }

  test("untombstone: a withdrawn takedown stops masking immediately on " +
      "all four lazy layouts — partial withdrawal keeps the rest pending, " +
      "full withdrawal removes the sidecar, BM25 stats re-expand exactly") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5"), (2L, "w1 w2 w3 w4 w5"),
      (3L, "a b c d e"), (4L, "a b c d zz")).toDF("id", "text")
    val root = tmp("graft_unts")
    // --- pairs
    val pp = root + "/pairs"
    Dedup.writePairs(docs, "id", "text", pp, shingleSize = 2,
      minJaccard = 0.2, maxDf = None)
    val unmasked = multiset(Dedup.readPairs(spark, pp, threshold = 0.2))
    assert(Dedup.tombstonePairs(spark, pp, Seq(1L, 3L).toDF("id")) == 2L)
    def ghost(id: Long) = Dedup.readPairs(spark, pp, threshold = 0.2)
      .where(col("id_a") === id || col("id_b") === id).count()
    assert(ghost(1L) == 0 && ghost(3L) == 0)
    // partial withdrawal; a never-pending id is a no-op
    assert(Dedup.untombstonePairs(spark, pp, Seq(1L, 99L).toDF("id")) == 1L)
    assert(ghost(1L) > 0 && ghost(3L) == 0,
      "1 unmasks immediately, 3 stays pending")
    assert(Dedup.pairTombstones(spark, pp).isDefined)
    assert(Dedup.untombstonePairs(spark, pp, Seq(3L).toDF("id")) == 1L)
    assert(Dedup.pairTombstones(spark, pp).isEmpty,
      "an emptied sidecar is removed (readers fast-path on absence)")
    assert(multiset(Dedup.readPairs(spark, pp, threshold = 0.2)) == unmasked,
      "full withdrawal restores the unmasked reads exactly")
    // --- IVF + SRP
    val vecs = (0 until 12).map(i =>
      (i.toLong, Seq(math.cos(i % 3).toFloat, math.sin(i % 3).toFloat)))
      .toDF("id", "vec")
    val q = Seq(1f, 0f)
    val cents = Similarity.ivfCentroids(vecs, "id", "vec", 3)
    val ip = root + "/ivf"
    Similarity.writeIvfCorpus(vecs, "id", "vec", ip, cents)
    Similarity.tombstoneIvfCorpus(spark, ip, Seq(0L).toDF("id")): Unit
    assert(!Similarity.ivfTopKFromPartitioned(spark, ip, "id", "vec", q, 12,
      cents, nProbe = 3).collect().map(_.getLong(0)).contains(0L))
    assert(Similarity.untombstoneIvfCorpus(spark, ip, Seq(0L).toDF("id")) == 1L)
    assert(Similarity.ivfTombstones(spark, ip).isEmpty &&
      Similarity.ivfTopKFromPartitioned(spark, ip, "id", "vec", q, 12,
        cents, nProbe = 3).collect().map(_.getLong(0)).contains(0L))
    val sp = root + "/srp"
    Similarity.writeBucketedCorpus(vecs, "id", "vec", sp, nBits = 4)
    Similarity.tombstoneBucketedCorpus(spark, sp, Seq(0L).toDF("id")): Unit
    assert(Similarity.untombstoneBucketedCorpus(spark, sp,
      Seq(0L).toDF("id")) == 1L)
    assert(Similarity.srpTombstones(spark, sp).isEmpty &&
      Similarity.annTopKFromBucketed(spark, sp, "id", "vec", q, 12,
        nBits = 4).collect().map(_.getLong(0)).contains(0L))
    // --- BM25: stats must re-expand to the full aggregate
    val bdocs = Seq(
      (1L, "spark window merge spark"), (2L, "window table scan"),
      (3L, "merge join spark"), (4L, ""), (5L, "spark merge"))
      .toDF("id", "text")
    val bp = root + "/bm25"
    val bfresh = root + "/bm25_fresh"
    TextOps.writeBm25Index(bdocs, "id", "text", bp, nBuckets = 2)
    TextOps.writeBm25Index(bdocs, "id", "text", bfresh, nBuckets = 2)
    val qterms = Seq("spark", "merge")
    val before = canon(TextOps.bm25TopKFromIndex(spark, bp, qterms, 10,
      nBuckets = 2))
    TextOps.tombstoneBm25Index(spark, bp, Seq(1L, 4L).toDF("id")): Unit
    assert(TextOps.untombstoneBm25Index(spark, bp,
      Seq(1L, 4L).toDF("id")) == 2L)
    assert(TextOps.bm25Tombstones(spark, bp).isEmpty)
    assert(canon(TextOps.bm25TopKFromIndex(spark, bp, qterms, 10,
      nBuckets = 2)) == before, "the ranking is restored exactly")
    assert(multiset(graft.store.ManifestTable.read(spark, bp + "/stats")) ==
      multiset(graft.store.ManifestTable.read(spark, bfresh + "/stats")),
      "stats re-expand to the untouched twin's aggregate — token-less " +
        "doc 4 included")
  }

  test("rollback: the undo window promoted to an actual restore at " +
      "fs-metadata cost — rollback, redo, append-into-restored, idempotent " +
      "re-roll, unknown gen refused, and the next rewrite retires the " +
      "abandoned future") {
    val table = tmp("graft_rollback") + "/t"
    ManifestTable.write(spark.range(0L, 100L).toDF("id"), table) // v1
    val v1 = ManifestTable.liveGen(spark, table).get
    ManifestTable.write(spark.range(200L, 250L).toDF("id"), table) // v2
    val v2 = ManifestTable.liveGen(spark, table).get
    assert(ManifestTable.rollback(spark, table) == v1)
    assert(ManifestTable.read(spark, table).count() == 100,
      "restore is the v1 content, zero data movement")
    // redo: the rolled-back-from generation is still on disk
    assert(ManifestTable.rollbackTo(spark, table, v2) == v2)
    assert(ManifestTable.read(spark, table).count() == 50)
    // back again; appends land in the restored live generation
    ManifestTable.rollbackTo(spark, table, v1): Unit
    ManifestTable.append(spark.range(100L, 110L).toDF("id"), table)
    assert(ManifestTable.read(spark, table).count() == 110)
    assert(ManifestTable.rollbackTo(spark, table, v1) == v1, "idempotent")
    intercept[IllegalArgumentException] {
      ManifestTable.rollbackTo(spark, table, "gen-000000099")
    }
    // the next rewrite retires the abandoned future (v2) and makes the
    // restored generation the new undo window
    ManifestTable.write(spark.range(0L, 5L).toDF("id"), table)
    assert(!ManifestTable.generations(spark, table).contains(v2),
      "the abandoned future generation retires at the next rewrite")
    assert(ManifestTable.previousGen(spark, table).contains(v1))
    assert(ManifestTable.readPrevious(spark, table).get.count() == 110,
      "the undo window is the restored state, appends included")
  }

  test("rollbackPartitions: a mistaken layout-wide takedown undone at " +
      "fs-metadata cost; a retained plan retries a crashed application " +
      "idempotently; a fresh layout refuses (no consistent window)") {
    val vecs = (0 until 40).map(i =>
      (i.toLong, Seq(math.cos(i % 5).toFloat, math.sin(i % 5).toFloat)))
      .toDF("id", "vec")
    val cents = Similarity.ivfCentroids(vecs, "id", "vec", 4)
    val path = tmp("graft_rbparts") + "/ivf"
    Similarity.writeIvfCorpus(vecs, "id", "vec", path, cents)
    intercept[IllegalArgumentException] {
      graft.store.Compaction.rollbackPlanPartitions(spark, path)
    }
    val q = Seq(1f, 0f)
    def probe() = canon(Similarity.ivfTopKFromPartitioned(spark, path, "id",
      "vec", q, 10, cents, nProbe = 4)
      .select(col("id"), round(col("cos"), 5)))
    val before = probe()
    Similarity.removeFromIvfCorpus(spark, path,
      Seq(0L, 5L, 10L).toDF("id")): Unit // the mistaken layout-wide rewrite
    assert(probe() != before)
    val plan = graft.store.Compaction.rollbackPlanPartitions(spark, path)
    // crash simulation: half the plan already applied, then the SAME
    // retained plan re-applied — converges, no double-undo
    plan.take(plan.length / 2).foreach { case (l, g) =>
      ManifestTable.rollbackTo(spark, l, g): Unit
    }
    val moved = graft.store.Compaction.rollbackPartitions(spark, path,
      Some(plan))
    assert(moved == plan.length - plan.length / 2,
      s"only the not-yet-rolled leaves move: $moved of ${plan.length}")
    assert(probe() == before, "the takedown is undone exactly")
    assert(graft.store.Compaction.rollbackPartitions(spark, path,
      Some(plan)) == 0, "re-applying the same plan is a no-op")
  }

  test("cloneSnapshot: file-level export of live and as-of snapshots to an " +
      "independent table — content exact with retained refs flattened in, " +
      "the clone immune to later source rewrites, non-empty dest refused") {
    val root = tmp("graft_clone")
    val table = root + "/src"
    ManifestTable.write(spark.range(0L, 500L).toDF("id").coalesce(1), table)
    val baseLen = new java.io.File(ManifestTable.resolve(spark, table))
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.length).max
    ManifestTable.append(spark.range(500L, 520L).toDF("id").coalesce(1), table)
    ManifestTable.append(spark.range(520L, 540L).toDF("id").coalesce(1), table)
    // merge the two small appends; the big base file is RETAINED by
    // reference — the clone must flatten it in
    assert(ManifestTable.minorCompact(spark, table, smallBytes = baseLen) == 2)
    val dest = root + "/backup"
    val n = ManifestTable.cloneSnapshot(spark, table, dest)
    assert(n >= 2, s"merged output + retained base must both copy, got $n")
    assert(ManifestTable.read(spark, dest).collect().map(_.getLong(0)).toSet
      == (0L until 540L).toSet, "clone content exact incl. retained refs")
    assert(ManifestTable.generations(spark, dest).length == 1,
      "the clone is a self-contained single-generation table")
    // as-of export: the generation live before the compaction
    val prev = ManifestTable.previousGen(spark, table).get
    val destPrev = root + "/backup_asof"
    ManifestTable.cloneSnapshot(spark, table, destPrev, Some(prev)): Unit
    assert(ManifestTable.read(spark, destPrev).count() == 540L,
      "the as-of clone exports the pre-compaction snapshot")
    // the source moves on; the backup must not
    ManifestTable.write(spark.range(9000L, 9010L).toDF("id"), table)
    assert(ManifestTable.read(spark, dest).count() == 540L &&
      ManifestTable.read(spark, table).count() == 10L,
      "clone immune to later source rewrites")
    // backups never merge
    val ex = intercept[IllegalArgumentException] {
      ManifestTable.cloneSnapshot(spark, table, dest)
    }
    assert(ex.getMessage.contains("not empty"), ex.getMessage)
    // and the clone is a first-class table: append + compact independently
    ManifestTable.append(spark.range(540L, 550L).toDF("id"), dest)
    ManifestTable.compact(spark, dest, targetFiles = 1)
    assert(ManifestTable.read(spark, dest).count() == 550L)
  }

  test("cloneLayout: whole-layout snapshot export (leaves + every sidecar) " +
      "— the clone probes identically to the source INCLUDING pending " +
      "tombstone masks, survives source maintenance, and drains " +
      "independently") {
    val docs = Seq(
      (1L, "spark window merge spark"), (2L, "window table scan"),
      (3L, "merge join spark"), (4L, "filter scan batch window"),
      (5L, "spark spark spark merge window"), (6L, ""))
      .toDF("id", "text")
    val root = tmp("graft_clonelayout")
    val src = root + "/src"
    val dst = root + "/backup"
    TextOps.writeBm25Index(docs, "id", "text", src, nBuckets = 4)
    // a pending GDPR takedown must survive its own backup
    assert(TextOps.tombstoneBm25Index(spark, src, Seq(5L).toDF("id")) == 1L)
    val q = Seq("spark", "window", "merge")
    def probe(p: String) = canon(TextOps.bm25TopKFromIndex(spark, p, q, 10,
      nBuckets = 4))
    val preClone = probe(src)
    val n = graft.store.Compaction.cloneLayout(spark, src, dst)
    assert(n > 0, "postings leaves + docs + stats + tombstones must copy")
    assert(TextOps.bm25Tombstones(spark, dst).isDefined,
      "the tombstone sidecar rides the backup")
    assert(probe(dst) == preClone,
      "the clone must probe exactly like the source — masks included")
    // source maintenance cannot touch the backup
    TextOps.compactBm25Index(spark, src): Unit // applies + drains on SOURCE
    assert(TextOps.bm25Tombstones(spark, src).isEmpty)
    assert(TextOps.bm25Tombstones(spark, dst).isDefined &&
      probe(dst) == preClone,
      "the backup keeps its own pending tombstones and its ranking")
    // and the clone is a first-class layout: it drains independently
    TextOps.compactBm25Index(spark, dst): Unit
    assert(TextOps.bm25Tombstones(spark, dst).isEmpty)
    assert(probe(dst) == preClone && probe(src) == preClone,
      "after both drains the two indexes still agree (survivor-exact)")
    // backups never merge
    val ex = intercept[IllegalArgumentException] {
      graft.store.Compaction.cloneLayout(spark, src, dst)
    }
    assert(ex.getMessage.contains("not empty"), ex.getMessage)
  }

  test("cloneLayout on the near-dup index: the keyed indexed docs store " +
      "clones VERBATIM (index versions + data-file names preserved), the " +
      "cloned index vetoes exactly like the source, and source takedowns " +
      "cannot reach the backup") {
    val docs = docsDF
    val root = tmp("graft_ndclone")
    val src = root + "/idx"
    val dst = root + "/backup"
    Dedup.writeNearDupIndex(docs.where(col("id") <= 3), "id", "text", src,
      shingleSize = 2)
    val n = graft.store.Compaction.cloneLayout(spark, src, dst)
    assert(n > 0)
    def names(p: String) = Option(new java.io.File(p).listFiles())
      .getOrElse(Array.empty).filter(_.isFile).map(_.getName)
      .filterNot(_.startsWith(".")).toSet
    assert(names(src + "/docs") == names(dst + "/docs") &&
      names(dst + "/docs").exists(_.startsWith("_graft_index")),
      "the keyed store must clone verbatim — index versions included")
    val probe = docs.where(col("id") >= 11)
    def veto(p: String) = canon(Dedup.dedupeAgainstIndex(spark, probe, p,
      "id", "text", shingleSize = 2))
    val b = veto(dst)
    assert(b == veto(src) && b.map(_.head) == Set(13L),
      "the cloned index drops exactly the planted copies (11, 12)")
    // source takedown cannot reach the backup
    Dedup.removeFromNearDupIndex(spark, src, Seq(1L).toDF("id"))
    assert(veto(src).map(_.head) == Set(11L, 13L),
      "the source stops vetoing 1's copy after the takedown")
    assert(veto(dst) == b, "the backup keeps the pre-takedown veto")
  }

  test("keep-N bounds the generation chain under a LONG maintenance loop " +
      "(50 epochs): on-disk generations never exceed the funded depth, the " +
      "manifest prunes to two version files, the table dir stays O(1) " +
      "entries (resolve never lists history), and the undo horizon is the " +
      "funded depth — not the loop length") {
    val table = tmp("graft_chain") + "/t"
    (0 until 50).foreach { i =>
      ManifestTable.write(
        spark.range(i.toLong, i.toLong + 100).toDF("id"), table)
      ManifestTable.append(
        spark.range(1000L + i, 1010L + i).toDF("id"), table)
    }
    val entries = new java.io.File(table).listFiles().map(_.getName)
    val gens = ManifestTable.generations(spark, table)
    assert(gens.length <= 2, s"keep-one-back must cap the chain: $gens")
    assert(entries.count(_.startsWith("MANIFEST")) <= 2,
      s"pointer history must prune: ${entries.filter(_.startsWith("MANIFEST")).toSeq}")
    assert(entries.length <= 6,
      s"the table dir is what resolve lists — it must stay O(1) after 50 " +
        s"epochs, got ${entries.length}: ${entries.sorted.toSeq}")
    assert(ManifestTable.read(spark, table).count() == 110,
      "epoch 49's write + its append")
    // deeper funding keeps a DEEPER chain — still the conf, never the loop
    spark.conf.set("graft.keepVersions", "4")
    try {
      (50 until 60).foreach(i => ManifestTable.write(
        spark.range(i.toLong, i.toLong + 100).toDF("id"), table))
      val deep = ManifestTable.generations(spark, table)
      assert(deep.length <= 4, s"keepVersions=4 must cap at 4: $deep")
      assert(ManifestTable.genBack(spark, table, 3).isDefined,
        "the funded undo horizon reaches 3 rewrites back")
      assert(ManifestTable.genBack(spark, table, 4).isEmpty,
        "past the funded depth the chain is retired, not accumulated")
    } finally spark.conf.unset("graft.keepVersions")
    // the hottest tombstone-loop sidecar: every takedown epoch commits one
    // fresh stats generation — 12 epochs must leave ≤ keep-one-back
    // generations on the stats table, never 12
    val docs = (1L to 40L).map(i => (i, s"w$i common spark text")).toDF("id", "text")
    val bpath = tmp("graft_chain") + "/bm25"
    TextOps.writeBm25Index(docs, "id", "text", bpath, nBuckets = 4)
    (1 to 12).foreach { e =>
      assert(TextOps.tombstoneBm25Index(spark, bpath,
        Seq(e.toLong).toDF("id")) == 1L)
    }
    val statsGens = ManifestTable.generations(spark, bpath + "/stats")
    assert(statsGens.length <= 2,
      s"12 takedown epochs must leave ≤2 stats generations: $statsGens")
    assert(ManifestTable.read(spark, bpath + "/stats").head().getLong(0) == 28L,
      "stats generation = the 28 survivors")
  }

  test("rebuild drain-LAST (round-16 advisory): a writePairs/writeBm25Index " +
      "rebuild that fails BEFORE its new generations commit leaves the OLD " +
      "corpus readable with its GDPR tombstones still masking — taken-down " +
      "rows never resurface through a crashed rebuild") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5"), (2L, "w1 w2 w3 w4 w5"),
      (3L, "a b c d e"), (4L, "a b c d zz")).toDF("id", "text")
    // --- pairs layout: poison fails at RUNTIME, mid-mine (job submitted,
    // old generations still live)
    val ppath = tmp("graft_drainlast") + "/pairs"
    Dedup.writePairs(docs, "id", "text", ppath, shingleSize = 2,
      minJaccard = 0.2, maxDf = None)
    assert(Dedup.tombstonePairs(spark, ppath, Seq(1L).toDF("id")) == 1L)
    def ghostRows() = Dedup.readPairs(spark, ppath, threshold = 0.2)
      .where(col("id_a") === 1L || col("id_b") === 1L).count()
    assert(ghostRows() == 0L, "takedown masks before the crash")
    val poison = docs.select(col("id"),
      when(expr("assert_true(id < 0)").isNull, col("text")).as("text"))
    intercept[Exception] {
      Dedup.writePairs(poison, "id", "text", ppath, shingleSize = 2,
        minJaccard = 0.2, maxDf = None)
    }
    assert(Dedup.pairTombstones(spark, ppath).isDefined,
      "the crashed rebuild must NOT have drained the sidecar")
    assert(ghostRows() == 0L,
      "the old corpus stays readable with the takedown still masking")
    // --- bm25 layout: poison fails at ANALYSIS (before any write) — with
    // the old drain-first ordering the sidecar was already erased here
    val bpath = tmp("graft_drainlast") + "/bm25"
    TextOps.writeBm25Index(docs, "id", "text", bpath, nBuckets = 4)
    assert(TextOps.tombstoneBm25Index(spark, bpath, Seq(1L).toDF("id")) == 1L)
    def topIds() = TextOps.bm25TopKFromIndex(spark, bpath,
      Seq("w1", "w2"), 10, nBuckets = 4).select("id").collect()
      .map(_.getLong(0)).toSet
    assert(!topIds().contains(1L), "takedown masks before the crash")
    intercept[Exception] {
      TextOps.writeBm25Index(docs.drop("text"), "id", "text", bpath,
        nBuckets = 4)
    }
    assert(TextOps.bm25Tombstones(spark, bpath).isDefined,
      "the crashed rebuild must NOT have drained the sidecar")
    assert(!topIds().contains(1L),
      "the old index stays probe-able with the takedown still masking")
    // a successful rebuild then drains: fresh incarnation, no stale masks
    TextOps.writeBm25Index(docs, "id", "text", bpath, nBuckets = 4)
    assert(TextOps.bm25Tombstones(spark, bpath).isEmpty, "rebuild drains")
    assert(topIds().contains(1L), "the fresh corpus is unmasked")
    Dedup.writePairs(docs, "id", "text", ppath, shingleSize = 2,
      minJaccard = 0.2, maxDf = None)
    assert(Dedup.pairTombstones(spark, ppath).isEmpty, "rebuild drains")
    assert(ghostRows() > 0L, "the fresh mine is unmasked")
  }

  // ------------------------------------------------------------ tmp hygiene

  test("TmpHygiene: a stale-looking top-level dir with a RECENT nested file " +
      "is not swept (append-only layouts never bump the parent mtime)") {
    val tmpRoot = new java.io.File(sys.props("java.io.tmpdir"))
    val live = new java.io.File(tmpRoot, "graft_q_spec_live_" +
      java.util.UUID.randomUUID().toString.replace("-", ""))
    val stale = new java.io.File(tmpRoot, "graft_q_spec_stale_" +
      java.util.UUID.randomUUID().toString.replace("-", ""))
    try {
      val old = System.currentTimeMillis() - 10L * 3600 * 1000
      // live: old parent dir, fresh file deep inside (the append shape)
      val sub = new java.io.File(live, "bands/gen-000000000")
      assert(sub.mkdirs())
      val freshFile = new java.io.File(sub, "part-0.parquet")
      assert(freshFile.createNewFile())
      assert(live.setLastModified(old))
      assert(new java.io.File(live, "bands").setLastModified(old))
      // stale: everything old
      assert(stale.mkdirs())
      val staleFile = new java.io.File(stale, "f.parquet")
      assert(staleFile.createNewFile())
      assert(staleFile.setLastModified(old))
      assert(stale.setLastModified(old))
      TmpHygiene.sweep(maxAgeMillis = 6L * 3600 * 1000)
      assert(live.exists, "dir with a recent nested file must survive")
      assert(!stale.exists, "fully stale dir must be swept")
    } finally {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(del)
        f.delete(): Unit
      }
      del(live); del(stale)
    }
  }

  // ------------------------------------------------------ minor compaction

  /** The single parquet data file in `dir` (asserts there is exactly one). */
  private def onlyParquet(dir: String): java.io.File = {
    val fs = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(fs.length == 1, s"expected one parquet file in $dir, got ${fs.length}")
    fs.head
  }

  test("minorCompact: merges only small-file debris, large files carry by " +
      "reference (same path, never rewritten), snapshots and undo window " +
      "stay exact, major compact folds references back") {
    val t = tmp("graft_minor") + "/t"
    val big = spark.range(200000)
      .select($"id", md5($"id".cast("string")).as("v"))
    ManifestTable.write(big.coalesce(1), t)
    val gen0 = ManifestTable.resolve(spark, t)
    val bigFile = onlyParquet(gen0)
    val (bigPath, bigLen, bigMtime) =
      (bigFile.getAbsolutePath, bigFile.length, bigFile.lastModified)
    (1 to 6).foreach { i =>
      ManifestTable.append(Seq((1000000L + i, s"x$i")).toDF("id", "v"), t)
    }
    val before = multiset(ManifestTable.read(spark, t))
    assert(ManifestTable.dataFileCount(spark, t) == 7)

    // ---- first minor compact: 6 tiny files merge, the big one is retained
    val merged = ManifestTable.minorCompact(spark, t, smallBytes = bigLen)
    assert(merged == 6, s"expected 6 small files merged, got $merged")
    assert(multiset(ManifestTable.read(spark, t)) == before,
      "minor compaction changed the row multiset")
    assert(ManifestTable.dataFileCount(spark, t) == 2,
      "live snapshot should be one merged file + one retained big file")
    val bigNow = new java.io.File(bigPath)
    assert(bigNow.exists && bigNow.lastModified == bigMtime,
      "the large file must stay at its original path, untouched")
    // undo window: the pre-compact generation (big + debris), exact
    assert(multiset(ManifestTable.readPrevious(spark, t).get) == before)

    // ---- second minor compact: reference carries FORWARD, still no copy
    (1 to 5).foreach { i =>
      ManifestTable.append(Seq((2000000L + i, s"y$i")).toDF("id", "v"), t)
    }
    val before2 = multiset(ManifestTable.read(spark, t))
    assert(ManifestTable.minorCompact(spark, t, smallBytes = bigLen) == 6,
      "merged file + 5 new tiny files should merge")
    assert(multiset(ManifestTable.read(spark, t)) == before2)
    assert(ManifestTable.dataFileCount(spark, t) == 2)
    assert(new java.io.File(bigPath).lastModified == bigMtime,
      "second minor compact copied or rewrote the retained file")
    assert(ManifestTable.generations(spark, t).size == 3,
      "gen0 (referenced) + previous + live should all survive retire")

    // ---- vacuum(keepPrevious = false): referenced gen survives, undo
    // window honestly reports None (no positional misreport to gen0)
    assert(ManifestTable.vacuum(spark, t, keepPrevious = false) == 1)
    assert(multiset(ManifestTable.read(spark, t)) == before2)
    assert(new java.io.File(bigPath).exists,
      "vacuum deleted a generation the live snapshot references")
    assert(ManifestTable.previousGen(spark, t).isEmpty,
      "undo window must be None after its generation is vacuumed, even " +
        "though an older retained generation is still on disk")

    // ---- major compact folds the reference back into one generation;
    // the referenced gen survives exactly one more cycle (prev points at it)
    ManifestTable.compact(spark, t, targetFiles = 1)
    assert(multiset(ManifestTable.read(spark, t)) == before2)
    assert(ManifestTable.dataFileCount(spark, t) == 1)
    assert(new java.io.File(bigPath).exists,
      "undo window still references the retained generation")
    ManifestTable.compact(spark, t, targetFiles = 1)
    assert(!new java.io.File(bigPath).exists,
      "once nothing references gen0 it must retire (disk reclaimed)")
    assert(multiset(ManifestTable.read(spark, t)) == before2)
  }

  test("minorCompact: no-op below two small files; crash-heal fallback " +
      "(lost MANIFEST) recovers the full snapshot including retained files") {
    val t = tmp("graft_minor_heal") + "/t"
    val big = spark.range(100000)
      .select($"id", md5($"id".cast("string")).as("v"))
    ManifestTable.write(big.coalesce(1), t)
    val bigLen = onlyParquet(ManifestTable.resolve(spark, t)).length
    // one small file only -> nothing to merge, nothing changes
    ManifestTable.append(Seq((9999999L, "z")).toDF("id", "v"), t)
    val gen = ManifestTable.resolve(spark, t)
    assert(ManifestTable.minorCompact(spark, t, smallBytes = bigLen) == 0)
    assert(ManifestTable.resolve(spark, t) == gen, "a no-op wrote a generation")
    // two small files -> merge; then simulate a lost MANIFEST (the crash
    // window inside commit): newest-generation fallback + in-generation
    // _RETAINS must reassemble the identical snapshot
    ManifestTable.append(Seq((9999998L, "w")).toDF("id", "v"), t)
    val before = multiset(ManifestTable.read(spark, t))
    assert(ManifestTable.minorCompact(spark, t, smallBytes = bigLen) == 2)
    dropPointer(t)
    assert(multiset(ManifestTable.read(spark, t)) == before,
      "crash-heal read lost retained files")
  }

  test("minorCompactPartitions: per-leaf small-file merge across a layout; " +
      "probes and full reads exact, large leaf files never rewritten, " +
      "committed append tags survive") {
    val root = tmp("graft_minor_part") + "/layout"
    val base = spark.range(40000)
      .select($"id", ($"id" % 4).cast("string").as("bucket"),
        md5($"id".cast("string")).as("v"))
    base.repartition(col("bucket")).write.partitionBy("bucket").parquet(root)
    Compaction.migrateLeaves(spark, root)
    // record each leaf's big file identity and the small-file threshold
    val bigFiles = (0 to 3).map { b =>
      val f = onlyParquet(Compaction.resolveLeafDirs(
        spark, root, "bucket", Seq(b)).head)
      (f.getAbsolutePath, f.lastModified)
    }
    val thresh = bigFiles.map(p => new java.io.File(p._1).length).min
    def batch(tag: Int) = (1 to 8).map(i =>
      (1000000L * tag + i, (i % 4).toString, s"t$tag-$i"))
      .toDF("id", "bucket", "v")
    assert(Compaction.appendPartitions(batch(1), root, "bucket", Some("b1")))
    assert(Compaction.appendPartitions(batch(2), root, "bucket", None))
    val before = multiset(readLayout(root, "bucket"))
    val probeBefore = multiset(spark.read.parquet(
      Compaction.resolveLeafDirs(spark, root, "bucket", Seq(2)): _*))

    // a crashed earlier batched pass leaves a dead stage dir at the root —
    // the next pass must sweep it and still merge exactly the debris
    assert(new java.io.File(root, ".stage-minor-deadbeef/bucket=0").mkdirs())
    val nMerged = Compaction.minorCompactPartitions(spark, root,
      smallBytes = thresh)
    assert(nMerged == 8, s"2 small files x 4 leaves should merge, got $nMerged")
    assert(!new java.io.File(root, ".stage-minor-deadbeef").exists,
      "dead stage dir from a crashed pass must be swept")
    assert(multiset(readLayout(root, "bucket")) == before,
      "layout minor compaction changed the full-read multiset")
    assert(multiset(spark.read.parquet(
      Compaction.resolveLeafDirs(spark, root, "bucket", Seq(2)): _*)) ==
      probeBefore, "leaf probe drifted after minor compaction")
    bigFiles.foreach { case (p, m) =>
      val f = new java.io.File(p)
      assert(f.exists && f.lastModified == m,
        s"large leaf file rewritten or moved: $p")
    }
    (0 to 3).foreach { b =>
      assert(ManifestTable.dataFileCount(spark, s"$root/bucket=$b") == 2,
        s"leaf $b should hold one merged + one retained file")
    }
    // the committed tag is table-root state: a blind retry still no-ops
    assert(!Compaction.appendPartitions(batch(1), root, "bucket", Some("b1")),
      "a committed tag must survive minor compaction")
    assert(multiset(readLayout(root, "bucket")) == before)
  }

  test("NON-CANONICAL leaf names (external lowercase-hex escapes) take the " +
      "exact per-leaf path in the batched verbs — no silent row loss") {
    // partitionBy always writes canonical names; an external tool can
    // create `leaf=x%3dy` (lowercase hex). The batched recover->partitionBy
    // round trip would stage that leaf under `leaf=x%3Dy` — never matching
    // — and commit an empty/reference-only generation: silent loss. Such
    // leaves must be detected and rewritten per-leaf, exactly.
    val root = tmp("graft_noncanon") + "/layout"
    val base = spark.range(2000)
      .select($"id", when($"id" % 2 === 0, "x=y").otherwise("plain").as("leaf"),
        md5($"id".cast("string")).as("v"))
    base.repartition(col("leaf")).write.partitionBy("leaf").parquet(root)
    Compaction.migrateLeaves(spark, root)
    // de-canonicalize the escaped leaf: x%3Dy -> x%3dy (same decoded value)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(root, "leaf=x%3Dy"),
      new org.apache.hadoop.fs.Path(root, "leaf=x%3dy")))
    def batch(tag: Int) = (1 to 6).map(i =>
      (100000L * tag + i, if (i % 2 == 0) "x=y" else "plain", s"t$tag-$i"))
      .toDF("id", "leaf", "v")
    // appends go through partitionBy -> land in the CANONICAL dir name; the
    // non-canonical dir now coexists as its own leaf holding the base rows
    assert(Compaction.appendPartitions(batch(1), root, "leaf", None))
    assert(Compaction.appendPartitions(batch(2), root, "leaf", None))
    val before = multiset(readLayout(root, "leaf"))
    // batched minor: the non-canonical leaf merges per-leaf, the rest batch
    assert(Compaction.minorCompactPartitions(spark, root,
      smallBytes = 1L << 30) > 0)
    assert(multiset(readLayout(root, "leaf")) == before,
      "minor compaction with a non-canonical leaf changed the multiset")
    // batched every-leaf rewrite (identity): nothing may disappear
    assert(Compaction.rewritePartitions(spark, root, 2, identity) > 0)
    assert(multiset(readLayout(root, "leaf")) == before,
      "batched rewrite with a non-canonical leaf changed the multiset")
  }

  test("a transform that REWRITES partition values is refused before any " +
      "commit — rerouted rows must never read as 'leaf emptied'") {
    // only the partition column's PRESENCE was require-checked; a transform
    // that maps leaf values reroutes rows into staged leaves outside the
    // planned set, which the stage cleanup used to delete silently while
    // the drained source leaves committed as empty generations
    val root = tmp("graft_reroute_guard") + "/layout"
    val base = spark.range(1200)
      .select($"id", ($"id" % 3).cast("string").as("leaf"),
        md5($"id".cast("string")).as("v"))
    base.repartition(col("leaf")).write.partitionBy("leaf").parquet(root)
    Compaction.migrateLeaves(spark, root)
    val before = multiset(readLayout(root, "leaf"))
    val e = intercept[IllegalArgumentException] {
      Compaction.rewritePartitions(spark, root, 2,
        df => df.withColumn("leaf", concat(lit("moved-"), col("leaf"))))
    }
    assert(e.getMessage.contains("unplanned"), e.getMessage)
    assert(multiset(readLayout(root, "leaf")) == before,
      "refused rewrite must leave the layout byte-equivalent")
  }

  test("torn MANIFEST version (a fenced pointer commit that died mid-write): " +
      "readers unaffected, rewrites refuse loudly and clean up their own " +
      "staging, fsck sweeps the debris, a retry converges") {
    import org.apache.spark.sql.graft.GraftConcurrentCommitException
    val t = tmp("graft_torn_pointer") + "/t"
    ManifestTable.write(spark.range(900).select($"id", ($"id" % 5).as("v")), t)
    val before = multiset(ManifestTable.read(spark, t))
    // the torn pointer commit: first line only, no #commit seal
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(new org.apache.hadoop.fs.Path(t, "MANIFEST.v99"), true)
    out.write("gen-000000077\n".getBytes("UTF-8")); out.close()
    assert(multiset(ManifestTable.read(spark, t)) == before,
      "a torn pointer version must be invisible to readers")
    intercept[GraftConcurrentCommitException] {
      ManifestTable.compact(spark, t, 1, df => df.where($"v" =!= 0))
    }
    assert(multiset(ManifestTable.read(spark, t)) == before,
      "a fenced-off rewrite must apply nothing")
    // the loser cleaned up its own staged generation and claim
    assert(!new java.io.File(t).listFiles().exists(f =>
      f.getName.startsWith(".genclaim-")), "loser must drop its claim")
    val st = ManifestTable.fsck(spark, t)
    assert(st.ok && st.sweptTmpFiles >= 1, st.toString)
    ManifestTable.compact(spark, t, 1, df => df.where($"v" =!= 0))
    assert(ManifestTable.read(spark, t).count() == 720,
      "post-heal retry must apply the rewrite")

    // debris LEASE (round 15): torn debris OLDER than the lease self-heals
    // inline at the next rewrite — the crashed daily loop needs no fsck
    val stale = new org.apache.hadoop.fs.Path(t, "MANIFEST.v98")
    val out2 = fs.create(stale, true)
    out2.write("gen-000000078\n".getBytes("UTF-8")); out2.close()
    fs.setTimes(stale, System.currentTimeMillis() - 16L * 60 * 1000, -1)
    ManifestTable.compact(spark, t, 2) // succeeds: sweeps the stale debris
    assert(!fs.exists(stale), "the stale torn version must be swept inline")
    assert(ManifestTable.read(spark, t).count() == 720)
  }

  test("committer auto-selection: object-store schemes default to v2, " +
      "local to v1, and the session conf overrides both") {
    import graft.store.Compaction
    spark.conf.unset("graft.committer.algorithm")
    assert(Compaction.committerFor(spark, "/tmp/x") == "1")
    assert(Compaction.committerFor(spark, "file:/tmp/x") == "1")
    Seq("s3a://b/t", "gs://b/t", "abfs://c@a/t", "slowfs:/t").foreach(p =>
      assert(Compaction.committerFor(spark, p) == "2", p))
    spark.conf.set("graft.committer.algorithm", "1")
    try assert(Compaction.committerFor(spark, "s3a://b/t") == "1",
      "the conf must override the scheme default")
    finally spark.conf.unset("graft.committer.algorithm")
  }

  test("staged writes are exact under the v2 task-side committer " +
      "(graft.committer.algorithm = 2, the object-store knob)") {
    val root = tmp("graft_committer_v2") + "/layout"
    spark.conf.set("graft.committer.algorithm", "2")
    try {
      val base = spark.range(8000)
        .select($"id", ($"id" % 8).cast("string").as("bucket"),
          md5($"id".cast("string")).as("v"))
      assert(Compaction.appendPartitions(base, root, "bucket", Some("b0")))
      assert(Compaction.appendPartitions(
        base.withColumn("id", $"id" + 1000000L), root, "bucket", Some("b1")))
      val before = multiset(readLayout(root, "bucket"))
      assert(Compaction.minorCompactPartitions(spark, root,
        smallBytes = 1L << 30) == 16)
      assert(multiset(readLayout(root, "bucket")) == before,
        "v2-committer minor compaction changed the multiset")
      assert(Compaction.compactPartitions(spark, root, targetFiles = 1) >= 0)
      assert(multiset(readLayout(root, "bucket")) == before,
        "v2-committer major compaction changed the multiset")
    } finally spark.conf.unset("graft.committer.algorithm")
  }

  test("batched minor compaction is exact for URI-encodable and partition-" +
      "escaped leaf values (space, percent, plus, equals), retained big " +
      "files included") {
    // the round-13 ADVICE scenario: input_file_name() returns the percent-
    // ENCODED path, so a naive value recovery stages 'a%20b' for leaf
    // 'a b' — never matching — and with retained big files present the
    // reference-only commit silently dropped every debris row. The decode
    // chain (URI layer + Spark partition-escape layer) must round-trip ALL
    // of these exactly.
    val root = tmp("graft_minor_esc") + "/layout"
    val values = Seq("a b", "a%b", "a+b", "x=y", "100% do ne")
    val base = spark.range(5000)
      .select($"id", element_at(lit(values.toArray), ($"id" % 5 + 1).cast("int"))
        .as("leaf"), md5($"id".cast("string")).as("v"))
    base.repartition(col("leaf")).write.partitionBy("leaf").parquet(root)
    Compaction.migrateLeaves(spark, root)
    val thresh = values.map(v =>
      onlyParquet(Compaction.resolveLeafDirs(spark, root, "leaf", Seq(v)).head)
        .length).min
    def batch(tag: Int) = (1 to 10).map(i =>
      (1000000L * tag + i, values(i % 5), s"t$tag-$i")).toDF("id", "leaf", "v")
    assert(Compaction.appendPartitions(batch(1), root, "leaf", None))
    assert(Compaction.appendPartitions(batch(2), root, "leaf", None))
    val before = multiset(readLayout(root, "leaf"))
    // every leaf: 2 debris files merge, the big base file carries by
    // reference — the exact shape whose debris the old code dropped
    val nMerged = Compaction.minorCompactPartitions(spark, root,
      smallBytes = thresh)
    assert(nMerged == 10, s"2 debris files x 5 leaves should merge, got $nMerged")
    assert(multiset(readLayout(root, "leaf")) == before,
      "escaped-value minor compaction changed the full-read multiset")
    values.foreach { v =>
      assert(ManifestTable.dataFileCount(spark,
        s"$root/${org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .escapePathName("leaf")}=${org.apache.spark.sql.catalyst.catalog
          .ExternalCatalogUtils.escapePathName(v)}") == 2,
        s"leaf '$v' should hold one merged + one retained file")
    }
  }

  test("fsck: makes the lost-MANIFEST heal durable, sweeps orphaned " +
      "generations/stages/tmp debris, reports missing retained files " +
      "unhealed; idempotent; partitioned twin heals a damaged layout") {
    val t = tmp("graft_fsck") + "/t"
    val big = spark.range(50000)
      .select($"id", md5($"id".cast("string")).as("v"))
    ManifestTable.write(big.coalesce(1), t)
    val bigLen = onlyParquet(ManifestTable.resolve(spark, t)).length
    ManifestTable.append(Seq((9000001L, "a")).toDF("id", "v"), t)
    ManifestTable.append(Seq((9000002L, "b")).toDF("id", "v"), t)
    assert(ManifestTable.minorCompact(spark, t, smallBytes = bigLen) == 2)
    val baseline = multiset(ManifestTable.read(spark, t))

    // case A: lost MANIFEST (the crash window inside commit). The runtime
    // fallback already reads correctly; fsck makes it DURABLE again.
    dropPointer(t)
    val a = ManifestTable.fsck(spark, t)
    assert(a.healedManifest && a.ok && !a.legacyFlat, a.toString)
    assert(pointerExists(t), "heal must rewrite the pointer")
    assert(multiset(ManifestTable.read(spark, t)) == baseline)

    // case B: crash debris with an intact MANIFEST — a committed-but-
    // orphaned newer generation, a half-written one (_temporary inside),
    // a dead stage dir, a commit tmp file. All swept, reads unchanged.
    val dir = new java.io.File(t)
    assert(new java.io.File(dir, "gen-000000099").mkdirs())
    assert(new java.io.File(dir, "gen-000000098/_temporary").mkdirs())
    assert(new java.io.File(dir, ".stage-dead").mkdirs())
    assert(new java.io.File(dir, "MANIFEST.tmp-x").createNewFile())
    val b = ManifestTable.fsck(spark, t)
    assert(!b.healedManifest && b.sweptOrphans == 2 && b.sweptStages == 1 &&
      b.sweptTmpFiles == 1 && b.ok, b.toString)
    assert(multiset(ManifestTable.read(spark, t)) == baseline)
    val c = ManifestTable.fsck(spark, t) // idempotent: nothing left to do
    assert(!c.healedManifest && c.sweptOrphans == 0 && c.sweptStages == 0 &&
      c.sweptTmpFiles == 0 && c.ok, c.toString)

    // case C: a retained data file is GONE — unhealable, reported loudly
    val retainedRel = {
      val src = scala.io.Source.fromFile(
        new java.io.File(ManifestTable.resolve(spark, t), "_RETAINS"))
      try src.getLines().next().trim finally src.close()
    }
    assert(new java.io.File(t, retainedRel).delete())
    val d = ManifestTable.fsck(spark, t)
    assert(d.missingRetained == 1 && !d.ok,
      s"missing retained file must be reported: $d")

    // partitioned twin: damage two leaves of a layout, fsck the root,
    // probes and full reads come back exact
    val root = tmp("graft_fsck_part") + "/layout"
    spark.range(4000)
      .select($"id", ($"id" % 4).cast("string").as("bucket"),
        ($"id" * 3 % 97).as("w"))
      .repartition(col("bucket")).write.partitionBy("bucket").parquet(root)
    Compaction.migrateLeaves(spark, root)
    val before = multiset(readLayout(root, "bucket"))
    dropPointer(root + "/bucket=1")
    assert(new java.io.File(root + "/bucket=2", "gen-000000077").mkdirs())
    assert(new java.io.File(root, ".stage-dead").mkdirs())
    val stats = Compaction.fsckPartitions(spark, root)
    assert(stats.length == 4 && stats.forall(_.ok))
    assert(stats.count(_.healedManifest) == 1 &&
      stats.map(_.sweptOrphans).sum == 1, stats.mkString("; "))
    assert(!new java.io.File(root, ".stage-dead").exists)
    assert(multiset(readLayout(root, "bucket")) == before)
  }

  test("minor compaction cost law: across a 12-cycle append+maintain loop, " +
      "bytes REWRITTEN per cycle track the debris (bounded), not the table " +
      "(growing) — the O(debris) economics, measured in actual bytes") {
    val t = tmp("graft_minor_cost") + "/t"
    val base = spark.range(120000)
      .select($"id", md5($"id".cast("string")).as("v"))
    ManifestTable.write(base.coalesce(1), t)
    val baseLen = onlyParquet(ManifestTable.resolve(spark, t)).length
    def genBytes(gen: String): Long = {
      val d = new java.io.File(t, gen)
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(_.length).sum
    }
    var written = Vector.empty[Long]
    var expected = 120000L
    // seed one debris file so every cycle merges (merged-history + batch)
    ManifestTable.append(spark.range(200)
      .select(($"id" + 999000000L).as("id"),
        md5($"id".cast("string")).as("v")).coalesce(1), t)
    expected += 200
    (1 to 12).foreach { i =>
      val batch = spark.range(200).select(($"id" + i * 1000000L).as("id"),
        md5($"id".cast("string")).as("v"))
      ManifestTable.append(batch.coalesce(1), t)
      expected += 200
      assert(ManifestTable.minorCompact(spark, t, smallBytes = baseLen) == 2,
        s"cycle $i: merged file + new batch file should merge")
      // bytes rewritten this cycle = the new generation's own files
      // (retained files are references, zero bytes copied)
      written :+= genBytes(ManifestTable.liveGen(spark, t).get)
      ManifestTable.vacuum(spark, t, keepPrevious = false): Unit
    }
    assert(ManifestTable.read(spark, t).count() == expected)
    // the rewrite bill grows with accumulated DEBRIS (200 rows/cycle since
    // the base never merges), never jumps to the table's scale: the final
    // cycle rewrote 12 batches' worth, a small fraction of the base file
    assert(written.last < baseLen / 10,
      s"cycle-12 rewrite ${written.last}B should be << base $baseLen" +
        "B — minor compaction must never rewrite the retained base")
    // monotone-ish debris growth sanity: later cycles rewrite more than the
    // first (they carry more merged history) but stay in debris territory
    assert(written.last >= written.head,
      s"debris accounting broken: $written")
    // and the base file was never rewritten across all 12 cycles
    assert(ManifestTable.dataFileCount(spark, t) == 2,
      "live snapshot must stay merged-file + retained base")
  }

  test("repairBm25Index: purges orphan postings, quarantines under-posted " +
      "members into the re-ingest worklist, rederives stats; repaired probe " +
      "equals the from-scratch survivor index; second repair is a no-op") {
    import org.apache.spark.sql.functions.pmod
    val docs = Seq(
      (1L, "spark window merge spark"), (2L, "window table scan"),
      (3L, "merge join spark window"), (4L, "filter scan batch window"),
      (5L, "")) // token-less: legally has no postings, must survive repair
      .toDF("id", "text")
    val root = tmp("graft_bm25fsck")
    val path = root + "/bm25"
    TextOps.writeBm25Index(docs, "id", "text", path, nBuckets = 4)
    // damage A (crash inside removeFromBm25Index after the postings
    // rewrite): doc 3's postings vanish while it stays a member
    Compaction.rewritePartitions(spark, path + "/postings", 4,
      p => p.where(col("id") =!= 3L), onlyIfOverTarget = false): Unit
    // damage B (crashed overwrite against old docs): ghost postings for an
    // id that is no member
    val ghost = Seq((99L, 2L, "spark", 1L), (99L, 2L, "window", 1L))
      .toDF("id", "dl", "term", "tf")
      .withColumn("bucket", pmod(
        graft.functions.GraftFunctions.md5_prefix60(col("term")), lit(4L)))
    assert(Compaction.appendPartitions(ghost, path + "/postings", "bucket"))

    val report = TextOps.repairBm25Index(spark, path).collect().head
    assert(report.getLong(0) == 2L,
      s"two ghost posting rows must be purged, got ${report.getLong(0)}")
    assert(report.getLong(1) == 1L,
      s"doc 3 must be quarantined, got ${report.getLong(1)}")
    // the quarantine table is the re-ingest worklist
    assert(ManifestTable.read(spark, path + "/quarantine")
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(3L))
    // repaired index ≡ from-scratch index of the survivors (3 gone, 5 kept)
    val fresh = root + "/fresh"
    TextOps.writeBm25Index(docs.where(col("id") =!= 3L), "id", "text",
      fresh, nBuckets = 4)
    val q = Seq("spark", "window", "merge")
    assert(TextOps.bm25TopKFromIndex(spark, path, q, 10, nBuckets = 4)
        .collect().toSeq ==
      TextOps.bm25TopKFromIndex(spark, fresh, q, 10, nBuckets = 4)
        .collect().toSeq,
      "repaired probe must equal the from-scratch survivor index")
    assert(graft.store.ManifestTable.read(spark, path + "/stats").collect().map(_.toSeq).toSet ==
      graft.store.ManifestTable.read(spark, fresh + "/stats").collect().map(_.toSeq).toSet,
      "stats must rederive from the repaired membership")
    // idempotent: a healthy index repairs to (0, 0) and changes nothing
    val again = TextOps.repairBm25Index(spark, path).collect().head
    assert(again.getLong(0) == 0L && again.getLong(1) == 0L)
  }

  test("repairIvfCorpus: re-routes rows appended through the wrong " +
      "centroids; repaired layout row-identical to a from-scratch write; " +
      "probes surface the repaired vectors; second repair is (0, 0)") {
    import org.apache.spark.sql.Row
    val vecs = (0 until 24).map { i =>
      val a = i * math.Pi / 12
      (i.toLong, Seq(math.cos(a).toFloat, math.sin(a).toFloat))
    }.toDF("id", "vec")
    val cents = Similarity.ivfCentroids(vecs, "id", "vec", k = 3)
    val path = tmp("graft_ivffsck") + "/ivf"
    Similarity.writeIvfCorpus(vecs.where($"id" < 16), "id", "vec", path, cents)
    // contract violation: the append routes through PERMUTED centroids —
    // every appended row lands in a wrong cell (distinct distances)
    val wrongCents = cents.tail :+ cents.head
    Similarity.appendIvfCorpus(vecs.where($"id" >= 16), "id", "vec",
      path, wrongCents)
    val misrouted = Compaction.readPartitioned(spark, path, "cell").get
      .withColumn("__c", Similarity.cellOf(col("vec"), cents))
      .where(col("cell").cast("int") =!= col("__c")).count()
    assert(misrouted > 0, "the permuted centroids must misroute something")

    val rep = Similarity.repairIvfCorpus(spark, path, cents).collect().head
    assert(rep.getLong(0) == misrouted, s"report $rep vs $misrouted")
    // layout now row-identical to a from-scratch write of the union
    val fresh = tmp("graft_ivffsck_f") + "/ivf"
    Similarity.writeIvfCorpus(vecs, "id", "vec", fresh, cents)
    def rows(p: String) = Compaction.readPartitioned(spark, p, "cell").get
      .collect().map(_.toSeq).toSet
    assert(rows(path) == rows(fresh),
      "repaired layout must equal the from-scratch write (same cells)")
    // a probe for a repaired vector now surfaces it
    val q = vecs.where($"id" === 20L).select($"vec").head.getSeq[Float](0)
    val top = Similarity.ivfTopKFromPartitioned(spark, path, "id", "vec",
      q, 1, cents, nProbe = 1).collect()
    assert(top.nonEmpty && top.head.getLong(0) == 20L,
      s"repaired vector must be probeable: ${top.mkString(",")}")
    val again = Similarity.repairIvfCorpus(spark, path, cents).collect().head
    assert(again.getLong(0) == 0L && again.getLong(1) == 0L)
  }

  test("layoutReport + autoMaintain: the maintenance scheduler — minor when " +
      "debris accumulates, major when the tier degenerates, no-op when " +
      "tight; reads exact throughout") {
    val root = tmp("graft_automaint") + "/layout"
    val base = spark.range(40000)
      .select($"id", ($"id" % 4).cast("string").as("bucket"),
        md5($"id".cast("string")).as("v"))
    base.repartition(col("bucket")).write.partitionBy("bucket").parquet(root)
    Compaction.migrateLeaves(spark, root)
    val thresh = (0 to 3).map { b =>
      onlyParquet(Compaction.resolveLeafDirs(
        spark, root, "bucket", Seq(b)).head).length
    }.min
    (1 to 4).foreach { t =>
      Compaction.appendPartitions((1 to 8).map(i =>
        (1000000L * t + i, (i % 4).toString, s"t$t-$i"))
        .toDF("id", "bucket", "v"), root, "bucket", None)
    }
    val before = multiset(readLayout(root, "bucket"))

    // report: 1 big + 4 debris per leaf, nothing retained yet
    val rep = Compaction.layoutReport(spark, root, smallBytes = thresh)
    assert(rep.length == 4)
    rep.foreach { r =>
      assert(r.liveFiles == 5 && r.debrisFiles == 4 && r.retainedFiles == 0,
        s"unexpected pre-maintenance stat: $r")
    }

    // policy pass 1: every leaf has >= 4 debris files -> MINOR everywhere
    assert(Compaction.autoMaintain(spark, root, smallBytes = thresh,
      minorAt = 4, majorAt = 16) == (4, 0))
    assert(multiset(readLayout(root, "bucket")) == before)
    Compaction.layoutReport(spark, root, smallBytes = thresh).foreach { r =>
      assert(r.liveFiles == 2 && r.retainedFiles == 1,
        s"post-minor stat: $r")
    }

    // policy pass 2: tight layout -> NOTHING to do (idempotent, cheap)
    assert(Compaction.autoMaintain(spark, root, smallBytes = thresh,
      minorAt = 4, majorAt = 16) == (0, 0))

    // policy pass 3: force the degenerate tier -> MAJOR fold everywhere
    Compaction.appendPartitions((1 to 8).map(i =>
      (9000000L + i, (i % 4).toString, s"z$i")).toDF("id", "bucket", "v"),
      root, "bucket", None)
    val before2 = multiset(readLayout(root, "bucket"))
    assert(Compaction.autoMaintain(spark, root, smallBytes = thresh,
      minorAt = 9, majorAt = 2, targetFiles = 1) == (0, 4))
    assert(multiset(readLayout(root, "bucket")) == before2)
    Compaction.layoutReport(spark, root, smallBytes = thresh).foreach { r =>
      assert(r.liveFiles == 1 && r.retainedFiles == 0,
        s"post-major stat: $r — references must fold back")
    }
  }

  // ------------------- round 18: incarnation-stamped tags + redo windows

  test("appendTagged × rollback straddle (round 18): a tagged retry across " +
      "a write boundary no-ops after rolling back into the batch's own " +
      "incarnation — even when a compaction folded the batch — and " +
      "re-appends exactly once in a foreign incarnation") {
    val t = tmp("graft_straddle") + "/t"
    ManifestTable.write(Seq((1L, "base")).toDF("id", "v"), t)
    assert(ManifestTable.appendTagged(Seq((2L, "b1")).toDF("id", "v"), t, "b1"))
    // fold the tagged files into anonymous rows: after this the retry sweep
    // can no longer identify the batch by file prefix — only the
    // incarnation stamp protects it
    ManifestTable.compact(spark, t, targetFiles = 1)
    val incXContent = multiset(ManifestTable.read(spark, t))
    val genX = ManifestTable.liveGen(spark, t).get
    // the bad overwrite: a NEW incarnation, with its own tagged batch
    ManifestTable.write(Seq((9L, "other")).toDF("id", "v"), t)
    assert(ManifestTable.appendTagged(Seq((8L, "b2")).toDF("id", "v"), t, "b2"))
    // roll back ACROSS the write boundary, into b1's incarnation
    ManifestTable.rollbackTo(spark, t, genX): Unit
    // THE round-17 window: the blind retry of b1 must no-op (its rows are
    // in genX, compaction-folded), never re-append
    assert(!ManifestTable.appendTagged(Seq((2L, "b1")).toDF("id", "v"), t, "b1"),
      "retry of a batch committed in THIS incarnation must no-op")
    assert(multiset(ManifestTable.read(spark, t)) == incXContent,
      "the straddled retry must not duplicate the folded batch")
    assert(ManifestTable.hasTag(spark, t, "b1"))
    // b2 committed in the OTHER incarnation: here it reads uncommitted and
    // re-appends — exactly once; the second retry no-ops
    assert(!ManifestTable.hasTag(spark, t, "b2"))
    assert(ManifestTable.appendTagged(Seq((8L, "b2")).toDF("id", "v"), t, "b2"))
    assert(!ManifestTable.appendTagged(Seq((8L, "b2")).toDF("id", "v"), t, "b2"))
    assert(multiset(ManifestTable.read(spark, t)) ==
      incXContent + ((Seq(8L, "b2"): Seq[Any]) -> 1))
    // ledger GC: the next rewrite retires the rolled-back-from generation,
    // and with it every marker stamped with its (now unreachable)
    // incarnation — b2's foreign-incarnation marker prunes, its local one
    // and b1's stay committed
    ManifestTable.compact(spark, t, targetFiles = 1)
    val markers = Option(new java.io.File(t, "_TAGS").listFiles())
      .getOrElse(Array.empty).filter(_.isFile).map(_.getName)
      .filterNot(_.startsWith(".")) // local-fs .crc sidecars are not markers
    assert(markers.length == 2,
      s"stale-incarnation markers must prune: ${markers.mkString(",")}")
    assert(ManifestTable.hasTag(spark, t, "b1") &&
      ManifestTable.hasTag(spark, t, "b2"))
  }

  test("fsck and vacuum retain a rollback's redo window (round 18): " +
      "_COMMITTED marks once-live generations, genuine never-committed " +
      "debris still sweeps, and the next rewrite ends the window") {
    val t = tmp("graft_redo") + "/t"
    ManifestTable.write(Seq((1L, "a")).toDF("id", "v"), t) // gen A
    ManifestTable.write(Seq((2L, "b")).toDF("id", "v"), t) // gen B
    val vB = ManifestTable.liveGen(spark, t).get
    val vA = ManifestTable.rollback(spark, t) // back to A; B = redo window
    // genuine crash debris: a generation dir that never committed
    val debris = new java.io.File(t, "gen-000000777")
    assert(debris.mkdirs())
    val st = ManifestTable.fsck(spark, t)
    assert(st.keptRedo == 1, s"redo window must be retained: $st")
    assert(st.sweptOrphans == 1, s"debris must still sweep: $st")
    assert(new java.io.File(t, vB).exists, "redo gen must survive fsck")
    assert(!debris.exists, "never-committed debris must not survive fsck")
    // the redo verb still works AFTER the fsck — the round-17 gap
    assert(ManifestTable.rollbackTo(spark, t, vB) == vB)
    assert(canon(ManifestTable.read(spark, t)) == Set(Seq(2L, "b")))
    // vacuum retains the window too
    ManifestTable.rollbackTo(spark, t, vA): Unit
    ManifestTable.vacuum(spark, t): Unit
    assert(new java.io.File(t, vB).exists,
      "vacuum must not sweep the redo window")
    assert(canon(ManifestTable.readAsOf(spark, t, vB).get) == Set(Seq(2L, "b")))
    // the next rewrite retires it — the documented end of the window
    ManifestTable.compact(spark, t, targetFiles = 1)
    assert(!new java.io.File(t, vB).exists,
      "the next rewrite ends the redo window")
    assert(canon(ManifestTable.read(spark, t)) == Set(Seq(1L, "a")))
  }

  test("syncSnapshot (round 18): the incremental backup copies only the " +
      "delta, carries unchanged files by _RETAINS reference, keeps the " +
      "previous backup readable as the undo window, and no-ops (no new " +
      "generation) when the backup is already current") {
    val base = tmp("graft_sync")
    val src = base + "/t"
    val dst = base + "/backup"
    ManifestTable.write(
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
        .repartition(4), src)
    val full = ManifestTable.syncSnapshot(spark, src, dst)
    assert(full >= 2, s"first sync is a full clone: $full")
    assert(multiset(ManifestTable.read(spark, dst)) ==
      multiset(ManifestTable.read(spark, src)))
    // a delta lands; the next sync moves ONLY it
    ManifestTable.append(Seq((5L, "e")).toDF("id", "v").coalesce(1), src)
    val delta = ManifestTable.syncSnapshot(spark, src, dst)
    assert(delta == 1, s"only the appended file may copy, got $delta")
    assert(multiset(ManifestTable.read(spark, dst)) ==
      multiset(ManifestTable.read(spark, src)))
    // carried-by-reference, not copied: the new backup generation holds
    // exactly the one delta file; the rest ride as _RETAINS refs
    val liveDir = new java.io.File(dst,
      ManifestTable.liveGen(spark, dst).get)
    assert(liveDir.listFiles().count(_.getName.endsWith(".parquet")) == 1,
      "unchanged files must not re-copy into the new generation")
    // the PREVIOUS backup is the undo window
    assert(multiset(ManifestTable.readPrevious(spark, dst).get) ==
      Map((Seq(1L, "a"): Seq[Any]) -> 1, (Seq(2L, "b"): Seq[Any]) -> 1,
        (Seq(3L, "c"): Seq[Any]) -> 1, (Seq(4L, "d"): Seq[Any]) -> 1))
    // already current: a true no-op — zero copies, NO new generation
    val gensBefore = ManifestTable.generations(spark, dst)
    assert(ManifestTable.syncSnapshot(spark, src, dst) == 0)
    assert(ManifestTable.generations(spark, dst) == gensBefore,
      "a current backup must not commit a new generation")
    // a source overwrite replaces everything: full recopy, backup exact
    ManifestTable.write(Seq((9L, "z")).toDF("id", "v").coalesce(1), src)
    assert(ManifestTable.syncSnapshot(spark, src, dst) == 1)
    assert(canon(ManifestTable.read(spark, dst)) == Set(Seq(9L, "z")))
    assert(ManifestTable.fsck(spark, dst).ok)
  }

  test("round-18 review fixes: a crashed FIRST export's residue (claimed " +
      "generation + mirrored ledger, no manifest) no longer deadlocks the " +
      "clone retry — while real content still refuses; and a LEGACY " +
      "single-file _TAGS ledger at a layout root mirrors and audits") {
    val base = tmp("graft_rfix")
    val src = base + "/t"
    ManifestTable.write(Seq((1L, "a")).toDF("id", "v"), src)
    // manufacture exactly a crashed first clone's residue at dest: a gen
    // dir, its claim file, a mirrored _TAGS — and NO committed MANIFEST
    val dst = base + "/backup"
    assert(new java.io.File(dst, "gen-000000000").mkdirs())
    assert(new java.io.File(dst, ".genclaim-gen-000000000").createNewFile())
    assert(new java.io.File(dst, "_TAGS").mkdirs())
    assert(new java.io.File(dst + "/_TAGS", "deadbeef").createNewFile())
    assert(ManifestTable.syncSnapshot(spark, src, dst) > 0,
      "the retry must sweep its own debris and converge")
    assert(canon(ManifestTable.read(spark, dst)) == Set(Seq(1L, "a")))
    // anything that is NOT engine debris still refuses, nothing deleted
    val dst2 = base + "/notbackup"
    assert(new java.io.File(dst2).mkdirs())
    val precious = new java.io.File(dst2, "precious.txt")
    assert(precious.createNewFile())
    intercept[IllegalArgumentException] {
      ManifestTable.cloneSnapshot(spark, src, dst2)
    }
    assert(precious.exists)
    // legacy single-FILE ledger (pre round-12) at a layout root: the
    // backup verbs must mirror and audit it, not skip it silently
    val lay = base + "/lay"
    val lbak = base + "/lbak"
    Compaction.appendPartitions(
      Seq((1L, "a", "x")).toDF("id", "bucket", "v"), lay, "bucket", None): Unit
    val tok = java.security.MessageDigest.getInstance("MD5")
      .digest("ep-0".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val out = new java.io.FileOutputStream(new java.io.File(lay, "_TAGS"))
    out.write((tok + "\n").getBytes("UTF-8")); out.close()
    Compaction.syncLayout(spark, lay, lbak): Unit
    assert(Compaction.verifyBackupLayout(spark, lay, lbak).tagDrift == 0,
      "the mirrored legacy ledger must audit in sync")
    assert(!Compaction.appendTaggedPartitions(
      Seq((2L, "a", "y")).toDF("id", "bucket", "v"), lbak, "bucket", "ep-0"),
      "the legacy-ledger epoch must no-op at the cutover target")
  }

  test("backups carry the exactly-once ledger (round 18): live clone/sync " +
      "mirror the incarnation-stamped commit tags, a DR cutover's blind " +
      "epoch replay no-ops what the backup holds and lands what it lacks, " +
      "verifyBackup reports ledger drift, and as-of exports carry none") {
    val base = tmp("graft_ledger")
    val src = base + "/t"
    val bak = base + "/backup"
    ManifestTable.write(Seq((1L, "base")).toDF("id", "v"), src)
    assert(ManifestTable.appendTagged(Seq((2L, "e1")).toDF("id", "v"), src, "e1"))
    ManifestTable.compact(spark, src, targetFiles = 1) // fold the tagged files
    ManifestTable.syncSnapshot(spark, src, bak): Unit
    // the ledger traveled: the FOLDED epoch reads committed at the backup
    assert(ManifestTable.hasTag(spark, bak, "e1"))
    assert(ManifestTable.verifyBackup(spark, src, bak).tagDrift == 0)
    // DR cutover: the blind ingest loop replays against the backup
    assert(!ManifestTable.appendTagged(Seq((2L, "e1")).toDF("id", "v"), bak, "e1"),
      "a committed epoch must no-op at the cutover target")
    assert(ManifestTable.appendTagged(Seq((3L, "e2")).toDF("id", "v"), bak, "e2"),
      "a new epoch must land at the cutover target")
    assert(multiset(ManifestTable.read(spark, bak)) ==
      multiset(ManifestTable.read(spark, src)) + ((Seq(3L, "e2"): Seq[Any]) -> 1))
    // between syncs the drift is visible; the next sync re-aligns BOTH
    // content and ledger (the cutover-target divergence drops with its
    // marker — the backup mirrors the source, as always)
    assert(ManifestTable.appendTagged(Seq((4L, "e3")).toDF("id", "v"), src, "e3"))
    assert(ManifestTable.verifyBackup(spark, src, bak).tagDrift >= 2)
    ManifestTable.syncSnapshot(spark, src, bak): Unit
    assert(ManifestTable.verifyBackup(spark, src, bak).tagDrift == 0)
    assert(multiset(ManifestTable.read(spark, bak)) ==
      multiset(ManifestTable.read(spark, src)))
    assert(ManifestTable.hasTag(spark, bak, "e3") &&
      !ManifestTable.hasTag(spark, bak, "e2"))
    // as-of exports deliberately carry no ledger (current tags would claim
    // epochs the past content lacks)
    val asof = base + "/asof"
    val g = ManifestTable.liveGen(spark, src).get
    ManifestTable.cloneSnapshot(spark, src, asof, gen = Some(g)): Unit
    assert(!ManifestTable.hasTag(spark, asof, "e1"))
    // the layout-root ledger (appendTaggedPartitions) mirrors too
    val lay = base + "/lay"
    val lbak = base + "/lbak"
    Compaction.appendTaggedPartitions(
      Seq((1L, "a", "x")).toDF("id", "bucket", "v"), lay, "bucket", "ep-0"): Unit
    Compaction.syncLayout(spark, lay, lbak): Unit
    assert(!Compaction.appendTaggedPartitions(
      Seq((1L, "a", "x")).toDF("id", "bucket", "v"), lbak, "bucket", "ep-0"),
      "the layout cutover replay must no-op")
    assert(Compaction.verifyBackupLayout(spark, lay, lbak).tagDrift == 0)
    Compaction.appendTaggedPartitions(
      Seq((2L, "a", "y")).toDF("id", "bucket", "v"), lay, "bucket", "ep-1"): Unit
    assert(Compaction.verifyBackupLayout(spark, lay, lbak).tagDrift >= 1,
      "layout-root ledger drift must be auditable between syncs")
  }

  test("verifyBackup + heal-by-resync + incremental restore (round 18): " +
      "a synced backup audits ok; truncation and loss are reported " +
      "(missing/sizeMismatch) not crashed on; the next sync re-copies " +
      "exactly the damage; and syncSnapshot(backup, table) restores a " +
      "diverged table at O(drift) with the divergence kept as undo") {
    val base = tmp("graft_vbak")
    val src = base + "/t"
    val dst = base + "/backup"
    ManifestTable.write(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").repartition(3),
      src)
    val full = ManifestTable.syncSnapshot(spark, src, dst)
    val v0 = ManifestTable.verifyBackup(spark, src, dst)
    assert(v0.ok && v0.files == full && v0.missing == 0 && v0.extra == 0, v0.toString)
    // damage the backup: one file truncated, one lost
    val genDir = new java.io.File(dst, ManifestTable.liveGen(spark, dst).get)
    val parqs = genDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    assert(parqs.length >= 2, "need two files to damage")
    val out = new java.io.FileOutputStream(parqs(0)); out.write(1); out.close()
    assert(parqs(1).delete())
    val v1 = ManifestTable.verifyBackup(spark, src, dst)
    assert(!v1.ok && v1.sizeMismatch == 1 && v1.missing == 1, v1.toString)
    // heal: the next sync re-copies exactly the damaged two
    assert(ManifestTable.syncSnapshot(spark, src, dst) == 2,
      "resync must move exactly the truncated + lost files")
    assert(ManifestTable.verifyBackup(spark, src, dst).ok)
    assert(multiset(ManifestTable.read(spark, dst)) ==
      multiset(ManifestTable.read(spark, src)))
    // restore: the table diverges; syncing FROM the backup carries every
    // still-shared file by reference and drops the divergence, which
    // stays readable as the undo window
    ManifestTable.append(Seq((99L, "junk")).toDF("id", "v").coalesce(1), src)
    val divergent = multiset(ManifestTable.read(spark, src))
    val restored = ManifestTable.syncSnapshot(spark, dst, src)
    assert(restored == 0,
      s"restore of un-drifted files must move zero bytes, copied $restored")
    assert(multiset(ManifestTable.read(spark, src)) ==
      multiset(ManifestTable.read(spark, dst)))
    assert(multiset(ManifestTable.readPrevious(spark, src).get) == divergent,
      "the pre-restore state must stay as the undo window")
    // layout level: audit ok after sync; loss reported; resync heals
    val bm = base + "/bm"
    val bak = base + "/bmbak"
    TextOps.writeBm25Index(docsDF, "id", "text", bm, nBuckets = 4)
    graft.store.Compaction.syncLayout(spark, bm, bak): Unit
    assert(graft.store.Compaction.verifyBackupLayout(spark, bm, bak).ok)
    val bucketDirs = new java.io.File(bak + "/postings").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("bucket="))
    val victimGen = bucketDirs.head.listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("gen-"))
      .maxBy(_.getName)
    val victim = victimGen.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(victim.nonEmpty && victim.head.delete())
    val vl = graft.store.Compaction.verifyBackupLayout(spark, bm, bak)
    assert(!vl.ok && vl.missing >= 1, vl.toString)
    assert(graft.store.Compaction.syncLayout(spark, bm, bak) >= 1)
    assert(graft.store.Compaction.verifyBackupLayout(spark, bm, bak).ok)
  }

  test("syncLayout (round 18): the incremental whole-layout backup moves " +
      "only the delta, prunes source-dropped leaves from the backup, " +
      "refuses a non-empty unmarked dest, and the synced index probes " +
      "exactly like the source") {
    val docs = docsDF
    val root = tmp("graft_synclay")
    val src = root + "/bm"
    val dst = root + "/backup"
    TextOps.writeBm25Index(docs.where(col("id") <= 3), "id", "text", src,
      nBuckets = 4)
    val q = Seq("w1", "a2", "z3")
    def probe(p: String) = canon(
      TextOps.bm25TopKFromIndex(spark, p, q, 10, nBuckets = 4))
    val full = graft.store.Compaction.syncLayout(spark, src, dst)
    assert(full > 0, "first sync is the full clone")
    assert(probe(dst) == probe(src))
    // a small delta lands; the re-sync moves strictly less than the clone
    TextOps.appendBm25Index(docs.where(col("id") === 13L), "id", "text",
      src, nBuckets = 4)
    val delta = graft.store.Compaction.syncLayout(spark, src, dst)
    assert(delta > 0 && delta < full,
      s"only the appended postings/docs/stats delta may move: $delta vs $full")
    assert(probe(dst) == probe(src),
      "the synced backup must rank exactly like the source")
    // already current: a true no-op
    assert(graft.store.Compaction.syncLayout(spark, src, dst) == 0)
    // the source drops a leaf (an externally-retired bucket): the mirror
    // prunes it from the backup — a restore must not resurrect it
    val buckets = new java.io.File(src + "/postings").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("bucket="))
    def del(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(del); f.delete(): Unit
    }
    del(buckets.head)
    graft.store.Compaction.syncLayout(spark, src, dst): Unit
    assert(!new java.io.File(dst + "/postings", buckets.head.getName).exists,
      "the dropped bucket must prune from the backup")
    // mirror-prune needs the consent marker: a non-empty dest that is not
    // a graft backup root refuses loudly, nothing deleted
    val other = root + "/not_backup"
    assert(new java.io.File(other).mkdirs())
    val bystander = new java.io.File(other, "precious.txt")
    assert(bystander.createNewFile())
    intercept[IllegalArgumentException] {
      graft.store.Compaction.syncLayout(spark, src, other)
    }
    assert(bystander.exists, "refusal must not delete anything")
  }

  test("cloneSnapshot/cloneLayout through the executor-parallel copy " +
      "engine (graft.clone.mode=spark) equals the driver-pooled path; " +
      "auto mode escalates past the byte threshold") {
    val t = tmp("graft_dclone") + "/t"
    ManifestTable.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .repartition(3), t)
    ManifestTable.append(Seq((3L, "c")).toDF("id", "v"), t)
    val base = tmp("graft_dclone")
    spark.conf.set("graft.clone.mode", "driver")
    try {
      val n1 = ManifestTable.cloneSnapshot(spark, t, s"$base/drv")
      spark.conf.set("graft.clone.mode", "spark")
      val n2 = ManifestTable.cloneSnapshot(spark, t, s"$base/spk")
      assert(n1 == n2, s"same file set either engine: $n1 vs $n2")
      assert(multiset(ManifestTable.read(spark, s"$base/spk")) ==
        multiset(ManifestTable.read(spark, s"$base/drv")))
      assert(multiset(ManifestTable.read(spark, s"$base/spk")) ==
        multiset(ManifestTable.read(spark, t)))
      // auto mode: a 1-byte threshold forces the distributed engine; the
      // clone is byte-identical either way
      spark.conf.set("graft.clone.mode", "auto")
      spark.conf.set("graft.clone.distributedMinBytes", "1")
      val n3 = ManifestTable.cloneSnapshot(spark, t, s"$base/auto")
      assert(n3 == n1)
      assert(multiset(ManifestTable.read(spark, s"$base/auto")) ==
        multiset(ManifestTable.read(spark, t)))
      // layout-wide: a partitioned layout clones leaf-by-leaf through the
      // same engine selection
      val root = tmp("graft_dclone_l") + "/layout"
      Compaction.appendPartitions((1 to 12).map(i =>
        (i.toLong, (i % 3).toString, s"v$i")).toDF("id", "bucket", "v"),
        root, "bucket", None)
      spark.conf.set("graft.clone.mode", "spark")
      val copied = Compaction.cloneLayout(spark, root, s"$base/layout_spk")
      assert(copied > 0)
      assert(multiset(readLayout(s"$base/layout_spk", "bucket")) ==
        multiset(readLayout(root, "bucket")))
    } finally {
      spark.conf.unset("graft.clone.mode")
      spark.conf.unset("graft.clone.distributedMinBytes")
    }
  }
}
