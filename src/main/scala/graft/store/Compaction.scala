package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.hadoop.fs.Path

/**
 * Lifecycle machinery for PARTITION-directory parquet layouts — the IVF
 * `cell=`, BM25 `bucket=`, and SRP `bucket=` layouts behind
 * [[graft.ops.Similarity.writeIvfCorpus]] /
 * [[graft.ops.TextOps.writeBm25Index]] /
 * [[graft.ops.Similarity.writeBucketedCorpus]].
 *
 * Each `name=value` leaf directory is its own [[ManifestTable]]: the leaf's
 * live files sit in a generation dir behind the leaf's MANIFEST pointer, so
 * every maintenance rewrite (compaction, deletion, retention) is
 * READER-CONCURRENT per leaf — a probe that resolved its paths just before
 * a swap keeps every file it listed (the keep-one-back discipline), and a
 * probe spanning a multi-leaf rewrite sees each leaf either pre- or
 * post-rewrite, which is row-identical because rewrites preserve each
 * leaf's row multiset and leaves are row-disjoint by construction.
 *
 * Readers therefore must NOT `spark.read.parquet(root)` these layouts:
 * resolve each leaf's live dir through [[resolveLeaves]] /
 * [[resolveLeafDirs]] (probes: explicit paths — pruning becomes path
 * selection at planning time, strictly before any partition discovery) or
 * read the whole layout through [[readPartitioned]].
 *
 * Layout writers migrate their leaves to the manifest shape at WRITE time
 * ([[ManifestTable.migrateFlatDir]] — pure fs metadata), so a fresh layout
 * is reader-concurrent from birth. A legacy flat leaf (pre-manifest
 * rounds) still reads fine (resolve falls back to the leaf dir itself) and
 * migrates on its first rewrite — that one migration rewrites data with
 * the old maintenance-window contract; everything after is concurrent.
 *
 * Single maintainer: like every layout write verb, maintenance ops are
 * externally serialized; concurrent PROBES are the protected party. A probe
 * delayed past its one-cycle keep-one-back budget (e.g. queued behind the
 * compactor's own jobs) heals by re-planning — wrap the resolve-and-act
 * closure in [[retryingStaleScan]].
 */
object Compaction {

  /** Has an [[appendPartitions]] with this tag fully committed against
    * `root`? (Overwriting the layout wipes the root dir and with it the
    * marker file — a new incarnation re-accepts all tags.) */
  def hasTag(spark: SparkSession, root: String, tag: String): Boolean = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    CommitTags.read(fs, rootPath).contains(CommitTags.token(tag))
  }

  private def leafDirs(fs: org.apache.hadoop.fs.FileSystem,
      rootPath: Path): Seq[Path] =
    if (!fs.exists(rootPath)) Nil
    else fs.listStatus(rootPath).filter(_.isDirectory).map(_.getPath)
      .filter(p => p.getName.contains("=") && !p.getName.startsWith(".") &&
        // crash-stranded twins from the pre-manifest two-rename compactor
        // are NOT partitions
        !p.getName.endsWith("__old") && !p.getName.endsWith("__compact"))
      .toSeq

  /** Each `name=value` leaf with its LIVE data directory (the leaf's
    * manifest generation, or the leaf dir itself for a legacy flat leaf).
    * Resolution is one small MANIFEST read per leaf — pooled past a
    * handful of leaves, because at layout scale (thousands of leaves on an
    * object store with ~50 ms round trips) a serial loop is a driver-side
    * bottleneck. Leaf order is preserved. */
  def resolveLeaves(spark: SparkSession, root: String): Seq[(String, String)] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    pooledMap(leafDirs(fs, rootPath))(p =>
      ManifestTable.resolvePaths(spark, p.toString).map((p.getName, _))).flatten
  }

  /** Order-preserving map over leaves on a bounded pool — every per-leaf
    * fs-metadata loop (resolve / migrate / vacuum) goes through this so no
    * maintenance or read path is serial in leaf count (the driver-side
    * bottleneck pattern at object-store latencies). Serial below a handful
    * of leaves to spare the pool churn. */
  private def pooledMap[A, B](items: Seq[A])(f: A => B): Seq[B] =
    if (items.length <= 8) items.map(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
      try items.map { a =>
        pool.submit(new java.util.concurrent.Callable[B] { def call(): B = f(a) })
      }.map(_.get())
      finally pool.shutdown()
    }

  /** The live data dirs of the `partitionCol=v` leaves for the given probe
    * values, skipping absent leaves — the probe-side path prune: pruning
    * happens by PATH SELECTION at planning time, before any listing of the
    * unprobed leaves. */
  def resolveLeafDirs(spark: SparkSession, root: String, partitionCol: String,
      values: Seq[Any]): Seq[String] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    values.map(v => new Path(rootPath, s"$partitionCol=$v"))
      .filter(fs.exists)
      .flatMap(p => ManifestTable.resolvePaths(spark, p.toString))
  }

  /** Layout-aware full read: every leaf's live rows with the partition
    * value injected back as a STRING column `partitionCol` (cast at the
    * call site when a numeric view is needed). Returns None for an absent
    * or leafless root.
    *
    * The plan is ONE multi-path parquet relation over the resolved live
    * dirs — one file listing (distributed past the parallel-discovery
    * threshold) and one footer's schema inference — with the partition
    * value recovered from each row's file path. The per-leaf union this
    * replaced re-read a footer per leaf on the driver and built an N-child
    * plan: measured 5.9 / 16.2 / 74.8 s at 64 / 256 / 1024 leaves on
    * constant 200k rows (ReadScaleProbe) — superlinear in leaves, data
    * constant. This is the full-layout maintenance scan; leaf-pruned reads
    * go through [[resolveLeafDirs]] (path selection), not a filter on the
    * recovered column. */
  def readPartitioned(spark: SparkSession, root: String,
      partitionCol: String): Option[DataFrame] = {
    val leaves = resolveLeaves(spark, root)
    if (leaves.isEmpty) None
    else {
      val dirs = leaves.map(_._2)
      val re = "/" + java.util.regex.Pattern.quote(partitionCol) + "=([^/]+)/"
      Some(spark.read.parquet(dirs: _*).withColumn(partitionCol,
        org.apache.spark.sql.functions.regexp_extract(
          org.apache.spark.sql.functions.input_file_name(), re, 1)))
    }
  }

  /**
   * Append a partitioned batch into the layout — staged write, then each
   * staged file MOVES into its leaf's live generation (fs metadata; the
   * data is written once). New partition values create their leaf in the
   * manifest shape directly. With `tag = Some(batchId)` this is the
   * idempotent tagged append ([[ManifestTable.appendTagged]]'s twin — see
   * [[CommitTags]]): committed tags no-op (returns false having written
   * NOTHING), partial attempts sweep by the `tag-<md5(tag)>-` file prefix
   * before the re-append, and the tag commits last. Untagged appends are
   * the plain fast path (a blind retry double-appends — prefer a tag in
   * any retrying loop). Same reader visibility as a plain append (a probe
   * planning mid-move sees a prefix of the batch); the retry must precede
   * any other maintenance op (a rewrite folds tagged files into anonymous
   * generation rows, after which the sweep cannot identify a partial
   * attempt).
   */
  def appendPartitions(df: DataFrame, root: String, partitionCol: String,
      tag: Option[String] = None): Boolean = {
    val spark = df.sparkSession
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val tok = tag.map(CommitTags.token)
    if (tok.exists(CommitTags.read(fs, rootPath).contains)) return false
    // schema guard: the batch (minus the partition column, which lives in
    // the directory structure, not the files) must match the layout — one
    // existing leaf's live generation stands for all (leaves are uniform
    // by this very invariant)
    leafDirs(fs, rootPath).headOption.foreach { p =>
      ManifestTable.assertAppendSchema(df.drop(partitionCol),
        ManifestTable.resolve(spark, p.toString), root)
    }
    val prefix = tok.map(t => s"tag-$t-")
    prefix.foreach { pre =>
      resolveLeaves(spark, root).foreach { case (_, dir) =>
        val d = new Path(dir)
        if (fs.exists(d))
          fs.listStatus(d).map(_.getPath)
            .filter(_.getName.startsWith(pre))
            .foreach(fs.delete(_, false))
      }
    }
    val stage = new Path(root + "/.stage-" + tok.getOrElse(
      java.util.UUID.randomUUID().toString))
    fs.delete(stage, true)
    // hash-partition the batch by the layout's partition column BEFORE the
    // partitioned write: without it every task writes one small file into
    // every leaf it touches (tasks × leaves files — measured 65 s to append
    // 200k rows across 1024 leaves, linear in leaf count), with it each
    // leaf's rows land in exactly one task → one staged file per leaf per
    // batch, which is also the file-count shape the manifest append wants
    df.repartition(col(partitionCol))
      .write.partitionBy(partitionCol).mode("overwrite").parquet(stage.toString)
    // the per-leaf file moves are INDEPENDENT driver-side fs metadata ops;
    // serialized they are the classic driver bottleneck at thousands of
    // leaves, so submit them to a bounded pool (the rewritePartitions
    // discipline) and drain every future before the tag commits
    val staged = fs.listStatus(stage).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.contains("=")).toSeq
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(16, staged.length)))
    val futures = staged.map { sp =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          val leaf = new Path(rootPath, sp.getName)
          val target =
            if (fs.exists(leaf)) new Path(ManifestTable.resolve(spark, leaf.toString))
            else { // new leaf: born in the manifest shape
              val gen = new Path(leaf, "gen-000000000")
              fs.mkdirs(gen): Unit
              gen
            }
          fs.mkdirs(target): Unit
          fs.listStatus(sp).map(_.getPath).filter(_.getName.endsWith(".parquet"))
            .foreach { p =>
              val name = prefix.getOrElse("") + p.getName
              if (!fs.rename(p, new Path(target, name)))
                throw new java.io.IOException(
                  s"appendPartitions: cannot move $p into $target")
            }
        }
      })
    }
    val outcomes = futures.map(f => scala.util.Try(f.get()))
    pool.shutdown()
    pool.awaitTermination(1, java.util.concurrent.TimeUnit.HOURS): Unit
    outcomes.collectFirst { case scala.util.Failure(e) => e }.foreach(throw _)
    fs.delete(stage, true)
    tok.foreach(CommitTags.add(fs, rootPath, _))
    true
  }

  /** Back-compat alias for tagged [[appendPartitions]]. */
  def appendTaggedPartitions(df: DataFrame, root: String,
      partitionCol: String, tag: String): Boolean =
    appendPartitions(df, root, partitionCol, Some(tag))

  /** Compact every leaf holding more than `targetFiles` live parquet files;
    * returns leaves rewritten. READER-CONCURRENT per leaf (each leaf is a
    * [[ManifestTable]] — any probe concurrent with one rewrite keeps its
    * files); a legacy flat leaf migrates on this first rewrite under the
    * old maintenance-window contract. The per-leaf rewrites are INDEPENDENT
    * tiny jobs submitted concurrently (sequential submission made a
    * 64-bucket compaction pay 64 job round-trips — measured 4.9 s → 2.6 s
    * on q217's lifecycle at sf0.1). */
  def compactPartitions(spark: SparkSession, root: String, targetFiles: Int = 4): Int =
    rewritePartitions(spark, root, targetFiles, identity, onlyIfOverTarget = true)

  /** [[ManifestTable.minorCompact]] over every leaf — the size-tiered
    * small-file merge: each leaf's append debris (files under `smallBytes`)
    * merges into ~`targetBytes` outputs while large files carry by
    * REFERENCE, so the layout-wide maintenance bill is O(debris since the
    * last pass), not O(layout). The steady-state daily verb; promote to
    * [[compactPartitions]] (major) when retained-file chains should fold
    * back into one generation. Same bounded per-leaf concurrency and
    * drain-before-rethrow discipline as [[rewritePartitions]]. Returns
    * total small files merged across leaves. */
  def minorCompactPartitions(spark: SparkSession, root: String,
      smallBytes: Long = 32L << 20, targetBytes: Long = 128L << 20): Int = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rootPath)) return 0
    fs.listStatus(rootPath).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith(".stage-"))
      .foreach(fs.delete(_, true))
    val dirs = leafDirs(fs, rootPath)
    if (dirs.isEmpty) return 0
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, dirs.length))
    val futures = dirs.map { p =>
      pool.submit(new java.util.concurrent.Callable[Int] {
        def call(): Int =
          ManifestTable.minorCompact(spark, p.toString, smallBytes, targetBytes)
      })
    }
    val outcomes = futures.map(f => scala.util.Try(f.get()))
    pool.shutdown()
    pool.awaitTermination(1, java.util.concurrent.TimeUnit.HOURS): Unit
    outcomes.collectFirst { case scala.util.Failure(e) => e }.foreach(throw _)
    outcomes.map(_.getOrElse(0)).sum
  }

  /** Rewrite EVERY leaf through `transform` (row-level rewrites: deletion,
    * retention) — unlike [[compactPartitions]] no leaf is skipped for being
    * small, since the rows to drop can live anywhere. Same concurrent
    * per-leaf manifest swaps, same reader-concurrency contract. Returns
    * leaves rewritten. */
  def rewritePartitions(spark: SparkSession, root: String, targetFiles: Int,
      transform: DataFrame => DataFrame,
      onlyIfOverTarget: Boolean = false): Int = {
    require(targetFiles > 0, "targetFiles must be positive")
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rootPath)) return 0
    // sweep stage dirs from interrupted appendPartitions attempts:
    // maintenance ops are externally serialized, so any stage dir visible
    // here is dead (its batch's retry will re-stage from scratch)
    fs.listStatus(rootPath).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith(".stage-"))
      .foreach(fs.delete(_, true))
    val dirs = leafDirs(fs, rootPath)
    if (dirs.isEmpty) return 0
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, dirs.length))
    val futures = dirs.map { p =>
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean = {
          val n = ManifestTable.dataFileCount(spark, p.toString)
          if (n == 0 || (onlyIfOverTarget && n <= targetFiles)) false
          else {
            ManifestTable.compact(spark, p.toString, targetFiles, transform)
            true
          }
        }
      })
    }
    // drain EVERY future before reporting or rethrowing: a caller reacting
    // to one leaf's failure (recovery, next maintenance step) must not race
    // rewrites still running in the background
    val outcomes = futures.map(f => scala.util.Try(f.get()))
    pool.shutdown()
    pool.awaitTermination(1, java.util.concurrent.TimeUnit.HOURS): Unit
    outcomes.collectFirst { case scala.util.Failure(e) => e }.foreach(throw _)
    outcomes.count(_.getOrElse(false))
  }

  /** One leaf's maintenance statistics — the planner row behind
    * [[layoutReport]] / [[autoMaintain]]. `liveFiles` counts every file the
    * live snapshot opens (dir + retained); `debrisFiles`/`debrisBytes` are
    * the subset under the small-file threshold (what a minor compaction
    * would merge); `retainedFiles` is the by-reference carry from earlier
    * minor compactions; `generations` counts on-disk generation dirs
    * (live + undo window + referenced + orphans awaiting sweep). */
  final case class LeafStat(leaf: String, liveFiles: Int, retainedFiles: Int,
      debrisFiles: Int, debrisBytes: Long, generations: Int)

  /** Per-leaf maintenance statistics for the whole layout — driver-side fs
    * metadata only (pooled, no data read): the input a maintenance
    * scheduler needs to decide which leaves to touch and how. */
  def layoutReport(spark: SparkSession, root: String,
      smallBytes: Long = 32L << 20): Seq[LeafStat] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    pooledMap(leafDirs(fs, rootPath))(p =>
      layoutReportLeaf(spark, fs, p, smallBytes))
  }

  /**
   * Policy-driven maintenance — the scheduler HBase runs server-side
   * (minor compactions continuously, majors when a store's file tiers
   * degenerate), expressed as one idempotent verb a daily loop calls:
   * per leaf, MAJOR compact (full rewrite to `targetFiles`, folds retained
   * references back) when the live snapshot opens more than `majorAt`
   * files; else MINOR compact (merge debris only, O(debris) cost) when at
   * least `minorAt` files sit under `smallBytes`; else leave the leaf
   * alone — an already-tight layout costs one fs listing, nothing more.
   * Same single-maintainer contract and bounded per-leaf concurrency as
   * the other layout verbs. Returns (minor, major) leaf counts.
   */
  def autoMaintain(spark: SparkSession, root: String,
      smallBytes: Long = 32L << 20, targetBytes: Long = 128L << 20,
      minorAt: Int = 4, majorAt: Int = 32, targetFiles: Int = 4): (Int, Int) = {
    require(minorAt >= 2, "minorAt under 2 would re-merge a lone file forever")
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rootPath)) return (0, 0)
    val decisions = pooledMap(leafDirs(fs, rootPath)) { p =>
      val t = p.toString
      val stat = layoutReportLeaf(spark, fs, p, smallBytes)
      if (stat.liveFiles > majorAt) {
        ManifestTable.compact(spark, t, targetFiles); (0, 1)
      } else if (stat.debrisFiles >= minorAt) {
        ManifestTable.minorCompact(spark, t, smallBytes, targetBytes); (1, 0)
      } else (0, 0)
    }
    (decisions.map(_._1).sum, decisions.map(_._2).sum)
  }

  private def layoutReportLeaf(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, p: Path,
      smallBytes: Long): LeafStat =
    ManifestTable.liveGen(spark, p.toString) match {
      case Some(live) =>
        val files = ManifestTable.snapshotFiles(fs, p, live)
        val debris = files.filter(_._2 < smallBytes)
        LeafStat(p.getName, files.length,
          ManifestTable.retainedRel(spark, p.toString, live).length,
          debris.length, debris.map(_._2).sum,
          ManifestTable.generations(spark, p.toString).length)
      case None =>
        val files = fs.listStatus(p)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(s => (s.getPath.getName, s.getLen)).toSeq
        val debris = files.filter(_._2 < smallBytes)
        LeafStat(p.getName, files.length, 0, debris.length,
          debris.map(_._2).sum, 0)
    }

  /** [[ManifestTable.fsck]] over every leaf plus the root-level stage-dir
    * sweep — run after any suspected crash to make the crash-heal fallback
    * durable, sweep orphaned generations/stages/tmp files, and surface
    * unhealable damage (missing retained files) across the layout in one
    * report. Single-maintainer op. */
  def fsckPartitions(spark: SparkSession, root: String)
      : Seq[ManifestTable.FsckStat] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rootPath)) return Nil
    fs.listStatus(rootPath).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith(".stage-"))
      .foreach(fs.delete(_, true))
    pooledMap(leafDirs(fs, rootPath))(p =>
      ManifestTable.fsck(spark, p.toString))
  }

  /** Migrate every flat leaf of a freshly-written layout to the manifest
    * shape — pure fs metadata ([[ManifestTable.migrateFlatDir]]), called by
    * the layout writers right after their partitioned overwrite so the
    * layout is reader-concurrent from birth. */
  def migrateLeaves(spark: SparkSession, root: String): Unit = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    pooledMap(leafDirs(fs, rootPath))(p =>
      ManifestTable.migrateFlatDir(spark, p.toString)): Unit
  }

  /** [[ManifestTable.vacuum]] over every leaf of a partitioned layout,
    * plus a sweep of dead root-level stage dirs from interrupted
    * [[appendPartitions]] attempts — the layout-wide standalone GC (the
    * next rewrite would sweep the same debris; vacuum is for reclaiming
    * disk between rewrites). Same `keepPrevious` drain rule per leaf.
    * Returns directories deleted. */
  def vacuumPartitions(spark: SparkSession, root: String,
      keepPrevious: Boolean = true): Int = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rootPath)) return 0
    val stages = fs.listStatus(rootPath).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith(".stage-"))
    stages.foreach(fs.delete(_, true))
    stages.length +
      pooledMap(leafDirs(fs, rootPath))(p =>
        ManifestTable.vacuum(spark, p.toString, keepPrevious)).sum
  }

  /** Previous-generation twin of [[resolveLeafDirs]] — the UNDO WINDOW on
    * a partitioned layout: each probed leaf's
    * [[ManifestTable.previousGen]], the state before that leaf's last
    * rewrite, retained through one cycle. Leaves with no undo window
    * (absent, or never rewritten since creation/vacuum) are SKIPPED. The
    * assembled view is a consistent pre-op snapshot exactly when the last
    * maintenance op was LAYOUT-WIDE ([[rewritePartitions]] with
    * `onlyIfOverTarget = false` — deletion/retention rewrites every leaf);
    * after per-leaf ops it is per-leaf "before", not one point in time. */
  def resolveLeafDirsPrevious(spark: SparkSession, root: String,
      partitionCol: String, values: Seq[Any]): Seq[String] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    values.map(v => new Path(rootPath, s"$partitionCol=$v"))
      .filter(fs.exists)
      .flatMap(p => ManifestTable.previousGen(spark, p.toString).toSeq
        .flatMap(g => ManifestTable.pathsFor(spark, p.toString, g)))
  }

  /**
   * The slow-reader recovery verb. Keep-one-back funds any scan that
   * completes within ONE maintenance cycle of its resolve; a scan delayed
   * past that (scheduler queueing behind the compactor's own jobs is the
   * common cause) can lose its files mid-flight and dies with
   * `FAILED_READ_FILE.FILE_NOT_EXIST`. The documented recovery is to
   * RE-PLAN — resolve the now-live generations and run again; because every
   * maintenance rewrite preserves each leaf's row multiset, the retried
   * result is identical, never partial and never double-counted.
   *
   * `body` must be the WHOLE resolve-and-act closure (e.g.
   * `retryingStaleScan() { bm25TopKFromIndex(...).collect() }`): retrying
   * an action on a DataFrame planned before the failure would reuse the
   * dead paths. Non-stale failures propagate immediately; stale failures
   * propagate once `attempts` is exhausted (a layout rewritten faster than
   * it can be scanned is a pacing bug, not a retry case).
   */
  def retryingStaleScan[T](attempts: Int = 3)(body: => T): T = {
    def stale(t: Throwable, depth: Int = 0): Boolean = t match {
      case null => false
      case _ if depth > 16 => false
      case _: java.io.FileNotFoundException => true
      case e: org.apache.spark.SparkException
          if Option(e.getMessage).exists(_.contains(
            "FAILED_READ_FILE.FILE_NOT_EXIST")) => true
      case _ => stale(t.getCause, depth + 1)
    }
    var left = math.max(1, attempts)
    while (true) {
      try return body
      catch { case t: Throwable if stale(t) && left > 1 => left -= 1 }
    }
    throw new IllegalStateException("unreachable")
  }
}
