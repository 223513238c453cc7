package graft.store

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.Path

/**
 * File-count compaction for PARTITION-directory parquet layouts — the
 * lifecycle step [[graft.ops.Similarity.appendIvfCorpus]] and
 * [[graft.ops.TextOps.appendBm25Index]] were missing: every append lands one
 * more small file set inside each touched `cell=`/`bucket=` directory, and a
 * year of daily ingest turns each probe's partition-pruned scan into an
 * open storm over hundreds of tiny files.
 *
 * Each leaf directory compacts INDEPENDENTLY (read → coalesce → staged dir →
 * two-rename swap), so at cluster scale the per-directory jobs parallelize
 * and a failure strands at most one directory — recoverable from its
 * `__old` twin. Rows are untouched; partition values live in the directory
 * NAME, so rewriting a leaf's files never changes what a partitioned read
 * reconstructs (spec-asserted).
 *
 * NOT reader-concurrent (unlike [[ManifestTable]]): a query planning against
 * the partitioned root between a leaf's two renames sees that directory
 * missing, and one that listed files before the swap can hit deleted files
 * mid-scan. Run it in the ingest maintenance window. (The manifest trick
 * doesn't transplant directly: the partition-pruning reader is
 * `spark.read.parquet(root)` with directory-name discovery, which has no
 * indirection hook short of a DSv2 connector — the keyed store's
 * `_graft_index` path — so the partitioned layouts keep the
 * maintenance-window contract and the plain layouts graduate to manifests.)
 */
object Compaction {

  /** Has an [[appendTaggedPartitions]] with this tag fully committed against
    * `root`? (Overwriting the layout wipes the root dir and with it the
    * marker file — a new incarnation re-accepts all tags.) */
  def hasTag(spark: SparkSession, root: String, tag: String): Boolean = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    CommitTags.read(fs, rootPath).contains(CommitTags.token(tag))
  }

  /**
   * Idempotent tagged append into a `name=value` partition-directory layout
   * — [[ManifestTable.appendTagged]]'s twin for the IVF `cell=` and BM25
   * `bucket=` layouts (same commit-marker discipline, see
   * [[CommitTags]]): the batch stages as a partitioned write, each staged
   * file moves into its live partition directory under a `tag-<md5(tag)>-`
   * prefix, and the tag commits last. Returns false — having written
   * NOTHING — when the tag already committed, so a blind retry of a
   * crashed caller is exact: partial attempts are identified by the file
   * prefix and swept before the re-append. New partition values create
   * their directories (the routed-append contract: a batch may land in
   * cells/buckets the base write never touched). Same reader visibility
   * as a plain `mode("append")` write — a probe planning mid-move sees a
   * prefix of the batch — and the same single-maintainer contract as every
   * layout write verb here; the retry must precede any other maintenance
   * op (a compaction folds tagged files into anonymous rewritten files,
   * after which the sweep cannot identify a partial attempt).
   */
  def appendTaggedPartitions(df: org.apache.spark.sql.DataFrame, root: String,
      partitionCol: String, tag: String): Boolean = {
    val spark = df.sparkSession
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val tok = CommitTags.token(tag)
    if (CommitTags.read(fs, rootPath).contains(tok)) return false
    val prefix = s"tag-$tok-"
    if (fs.exists(rootPath))
      fs.listStatus(rootPath).filter(_.isDirectory).map(_.getPath)
        .filter(p => p.getName.contains("=") && !p.getName.startsWith("."))
        .foreach { d =>
          fs.listStatus(d).map(_.getPath)
            .filter(_.getName.startsWith(prefix))
            .foreach(fs.delete(_, false))
        }
    val stage = new Path(root + "/.stage-" + tok)
    fs.delete(stage, true)
    df.write.partitionBy(partitionCol).mode("overwrite").parquet(stage.toString)
    fs.listStatus(stage).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.contains("="))
      .foreach { sp =>
        val target = new Path(rootPath, sp.getName)
        fs.mkdirs(target): Unit
        fs.listStatus(sp).map(_.getPath).filter(_.getName.endsWith(".parquet"))
          .foreach { p =>
            if (!fs.rename(p, new Path(target, prefix + p.getName)))
              throw new java.io.IOException(
                s"appendTaggedPartitions: cannot move $p into $target")
          }
      }
    fs.delete(stage, true)
    CommitTags.add(fs, rootPath, tok)
    true
  }

  /** Compact ONE parquet leaf directory to `targetFiles` files if it holds
    * more than that; returns whether a rewrite ran. Crash between the two
    * renames leaves the original intact under `<dir>__old` — recover by
    * renaming it back. */
  def compactLeafDir(spark: SparkSession, dir: String, targetFiles: Int): Boolean =
    rewriteLeafDir(spark, dir, targetFiles, identity, onlyIfOverTarget = true)

  /** The shared leaf-dir rewrite: read → `transform` → coalesce →
    * staged dir → two-rename swap with rollback. `onlyIfOverTarget`
    * distinguishes compaction (skip dirs already within the file budget)
    * from content rewrites like deletion (every dir must pass through the
    * transform regardless of size). */
  private def rewriteLeafDir(spark: SparkSession, dir: String, targetFiles: Int,
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      onlyIfOverTarget: Boolean): Boolean = {
    require(targetFiles > 0, "targetFiles must be positive")
    val live = new Path(dir)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val nFiles = fs.listStatus(live)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    if (nFiles == 0 || (onlyIfOverTarget && nFiles <= targetFiles)) return false
    val staged = new Path(dir + "__compact")
    val trash = new Path(dir + "__old")
    transform(spark.read.parquet(dir)).coalesce(targetFiles)
      .write.mode("overwrite").parquet(staged.toString)
    fs.delete(trash, true)
    if (!fs.rename(live, trash))
      throw new java.io.IOException(s"compactLeafDir: cannot retire $live")
    if (!fs.rename(staged, live)) {
      fs.rename(trash, live) // roll back: the old directory stays live
      fs.delete(staged, true)
      throw new java.io.IOException(s"compactLeafDir: cannot swap in $staged")
    }
    fs.delete(trash, true)
    true
  }

  /** Compact every `name=value` partition directory under `root` that holds
    * more than `targetFiles` parquet files; returns how many directories
    * were rewritten. Single-level partitioning (the IVF `cell=` and BM25
    * `bucket=` layouts). The per-directory rewrites are INDEPENDENT tiny
    * jobs, so they run concurrently (Spark's scheduler interleaves jobs
    * submitted from multiple threads) — sequential submission would make a
    * 64-bucket compaction pay 64 job-scheduling round-trips end to end,
    * the dominant cost when each directory holds a handful of small files
    * (measured 4.9 s → 2.6 s on q217's full build+append+compact+probe
    * lifecycle at sf0.1 — the compact step itself ~4× faster). */
  def compactPartitions(spark: SparkSession, root: String, targetFiles: Int = 4): Int =
    rewritePartitions(spark, root, targetFiles, identity, onlyIfOverTarget = true)

  /** Rewrite EVERY `name=value` partition directory under `root` through
    * `transform` (row-level rewrites: deletion, retention) — unlike
    * [[compactPartitions]] no directory is skipped for being small, since
    * the rows to drop can live anywhere. Same independent per-directory
    * stage-and-swap, same concurrent submission, same
    * maintenance-window/`__old`-recovery contract. Returns directories
    * rewritten. */
  def rewritePartitions(spark: SparkSession, root: String, targetFiles: Int,
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      onlyIfOverTarget: Boolean = false): Int = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rootPath)) return 0
    // sweep stage dirs from interrupted appendTaggedPartitions attempts:
    // maintenance ops are externally serialized, so any stage dir visible
    // here is dead (its batch's retry will re-stage from scratch)
    fs.listStatus(rootPath).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith(".stage-"))
      .foreach(fs.delete(_, true))
    val dirs = fs.listStatus(rootPath).filter(_.isDirectory).map(_.getPath)
      .filter(p => p.getName.contains("=") && !p.getName.startsWith(".") &&
        // crash-stranded twins from an interrupted rewrite are NOT
        // partitions: rewriting `cell=3__old` as data (while its live twin's
        // rewrite concurrently deletes it) would compound the crash instead
        // of leaving it for `__old`-rename recovery
        !p.getName.endsWith("__old") && !p.getName.endsWith("__compact"))
    if (dirs.isEmpty) return 0
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, dirs.length))
    val futures = dirs.map { p =>
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean =
          rewriteLeafDir(spark, p.toString, targetFiles, transform, onlyIfOverTarget)
      })
    }
    // drain EVERY future before reporting or rethrowing: a caller reacting
    // to one directory's failure (recovery renames, next maintenance step)
    // must not race rewrites still running in the background
    val outcomes = futures.map(f => scala.util.Try(f.get()))
    pool.shutdown()
    pool.awaitTermination(1, java.util.concurrent.TimeUnit.HOURS): Unit
    outcomes.collectFirst { case scala.util.Failure(e) => e }.foreach(throw _)
    outcomes.count(_.getOrElse(false))
  }
}
