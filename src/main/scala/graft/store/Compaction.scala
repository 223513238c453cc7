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
 * externally serialized; concurrent PROBES are the protected party.
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
    * manifest generation, or the leaf dir itself for a legacy flat leaf). */
  def resolveLeaves(spark: SparkSession, root: String): Seq[(String, String)] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    leafDirs(fs, rootPath).map(p =>
      (p.getName, ManifestTable.resolve(spark, p.toString)))
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
      .map(p => ManifestTable.resolve(spark, p.toString))
  }

  /** Layout-aware full read: every leaf's live rows with the partition
    * value injected back as a STRING column `partitionCol` (cast at the
    * call site when a numeric view is needed). Returns None for an absent
    * or leafless root. The plan is a union of per-leaf scans — same bytes
    * as the old partition-discovery read, resolved through each leaf's
    * manifest. */
  def readPartitioned(spark: SparkSession, root: String,
      partitionCol: String): Option[DataFrame] = {
    val leaves = resolveLeaves(spark, root)
    if (leaves.isEmpty) None
    else Some(leaves.map { case (name, dir) =>
      spark.read.parquet(dir)
        .withColumn(partitionCol, lit(name.substring(name.indexOf('=') + 1)))
    }.reduce(_.unionByName(_)))
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

  /** Migrate every flat leaf of a freshly-written layout to the manifest
    * shape — pure fs metadata ([[ManifestTable.migrateFlatDir]]), called by
    * the layout writers right after their partitioned overwrite so the
    * layout is reader-concurrent from birth. */
  def migrateLeaves(spark: SparkSession, root: String): Unit = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    leafDirs(fs, rootPath).foreach(p =>
      ManifestTable.migrateFlatDir(spark, p.toString))
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
      leafDirs(fs, rootPath)
        .map(p => ManifestTable.vacuum(spark, p.toString, keepPrevious)).sum
  }
}
