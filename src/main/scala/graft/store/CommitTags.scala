package graft.store

import org.apache.hadoop.fs.Path

/**
 * The commit-marker half of idempotent tagged appends — shared by
 * [[ManifestTable.appendTagged]] (plain manifest tables) and
 * [[Compaction.appendTaggedPartitions]] (partition-directory layouts).
 * One `_TAGS` file per table root lists the md5 tokens of every batch tag
 * whose append fully committed; the batch-log pattern Spark's own
 * file-stream sink uses, reduced to a single sorted text file.
 *
 * The name is underscore-prefixed because partitioned layouts are
 * read with `spark.read.parquet(root)` — Spark's file index skips `_`/`.`
 * entries, so the markers can never be scanned as data.
 *
 * Crash safety: `_TAGS` is a DIRECTORY holding one empty marker file per
 * committed token, so committing tag B touches nothing of tag A — there is
 * no rewrite of shared state and therefore no crash window in which
 * already-committed tags can vanish (the single-file + delete&rename
 * predecessor had one: a crash between the delete and the rename lost the
 * whole tag set, and a blind retry of e.g. `Dedup.ingestBatch` would then
 * re-run its drop rule against an index that already held the batch).
 * A crash mid-[[add]] leaves either no marker or the complete (empty)
 * marker — both exact. Legacy single-file `_TAGS` tables migrate to the
 * directory shape on their first [[add]].
 *
 * INCARNATION stamps (round 18): a marker may carry the table incarnation
 * the batch committed under as a name suffix — `<tok>.<inc>` — written by
 * [[ManifestTable.appendTagged]] ([[ManifestTable]] overwrites mint a new
 * incarnation). A PLAIN `<tok>` marker (layout roots, pre-round-18 tables)
 * carries no incarnation and reads as committed in ANY incarnation. The
 * name is the whole record (content stays empty), so stamping keeps the
 * per-marker crash-atomicity above: tokens are 32 lowercase hex chars, so
 * the first `.` splits token from incarnation unambiguously.
 */
private[store] object CommitTags {
  val TagsName = "_TAGS"

  def token(tag: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(tag.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Committed tokens, incarnation-insensitive — the layout-root check
    * ([[Compaction.appendPartitions]] stamps plain markers only). */
  def read(fs: org.apache.hadoop.fs.FileSystem, dir: Path): Set[String] =
    readStamped(fs, dir).keySet

  /** Committed tokens with the incarnation set each committed under; ""
    * marks a plain (incarnation-unknown) marker, honored in any
    * incarnation. */
  def readStamped(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Map[String, Set[String]] = {
    val f = new Path(dir, TagsName)
    if (!fs.exists(f)) Map.empty
    else if (fs.getFileStatus(f).isDirectory)
      fs.listStatus(f).filter(_.isFile).map(_.getPath.getName).toSeq
        .map { n =>
          val i = n.indexOf('.')
          if (i < 0) (n, "") else (n.substring(0, i), n.substring(i + 1))
        }
        .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).toSet }
    else { // legacy single-file layout (pre round-12)
      val in = fs.open(f)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).map(_ -> Set("")).toMap
      finally in.close()
    }
  }

  def add(fs: org.apache.hadoop.fs.FileSystem, dir: Path, tok: String,
      inc: String = ""): Unit = {
    val f = new Path(dir, TagsName)
    if (fs.exists(f) && fs.getFileStatus(f).isFile) {
      // migrate a legacy single-file tag set to per-token markers through a
      // fully-populated temp directory, so the only loss window is the
      // single delete+rename pair — a crash there hides the tags for one
      // retry round (re-appends after the sweep, exact for unfolded
      // batches), instead of the old per-marker re-create loop whose crash
      // could lose tags whose files a later compaction had already FOLDED
      // into anonymous rows (that retry would double-append)
      val legacy = read(fs, dir)
      val tmp = new Path(dir, TagsName + ".tmp-" + java.util.UUID.randomUUID())
      fs.mkdirs(tmp): Unit
      legacy.foreach(t => fs.create(new Path(tmp, t), true).close())
      fs.delete(f, false)
      if (!fs.rename(tmp, f))
        throw new java.io.IOException(s"CommitTags: cannot migrate $f")
    } else fs.mkdirs(f): Unit
    fs.create(new Path(f, if (inc.isEmpty) tok else s"$tok.$inc"), true).close()
  }

  /** Raw marker names (`tok` or `tok.inc`) — the ledger as a mirrorable
    * value for the backup verbs; a legacy single-file set reads as plain
    * names. */
  def markerNames(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Set[String] = {
    val f = new Path(dir, TagsName)
    if (!fs.exists(f)) Set.empty
    else if (fs.getFileStatus(f).isDirectory)
      fs.listStatus(f).filter(_.isFile).map(_.getPath.getName)
        .filterNot(_.startsWith(".")).toSet
    else {
      val in = fs.open(f)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).toSet
      finally in.close()
    }
  }

  /** Make `destDir`'s ledger exactly `want`: add missing markers, drop
    * extras; an empty set removes the ledger dir. Idempotent, and each
    * marker keeps its individual crash-atomicity — the backup verbs'
    * ledger mirror. */
  def mirror(destFs: org.apache.hadoop.fs.FileSystem, destDir: Path,
      want: Set[String]): Unit = {
    val f = new Path(destDir, TagsName)
    if (want.isEmpty) { destFs.delete(f, true): Unit; return }
    if (destFs.exists(f) && destFs.getFileStatus(f).isFile)
      destFs.delete(f, false): Unit
    destFs.mkdirs(f): Unit
    val have = destFs.listStatus(f).filter(_.isFile).map(_.getPath.getName)
      .filterNot(_.startsWith(".")).toSet
    (want -- have).foreach(n => destFs.create(new Path(f, n), true).close())
    (have -- want).foreach(n => destFs.delete(new Path(f, n), false))
  }
}
