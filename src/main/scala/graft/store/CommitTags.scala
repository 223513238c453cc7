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
 * The file name is underscore-prefixed because partitioned layouts are
 * read with `spark.read.parquet(root)` — Spark's file index skips `_`/`.`
 * files, so the marker can never be scanned as data.
 *
 * Crash windows: the tag commits via tmp + delete + rename (the
 * [[ManifestTable]] MANIFEST discipline). A crash that loses the file (or
 * one tag) only downgrades idempotence to sweep-and-rewrite — the tagged
 * FILES carry the token in their names, so a retry removes the previous
 * attempt's files before re-appending and the result is still exact.
 */
private[store] object CommitTags {
  val TagsName = "_TAGS"

  def token(tag: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(tag.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def read(fs: org.apache.hadoop.fs.FileSystem, dir: Path): Set[String] = {
    val f = new Path(dir, TagsName)
    if (!fs.exists(f)) Set.empty
    else {
      val in = fs.open(f)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).toSet
      finally in.close()
    }
  }

  def add(fs: org.apache.hadoop.fs.FileSystem, dir: Path, tok: String): Unit = {
    val all = (read(fs, dir) + tok).toSeq.sorted
    val tmp = new Path(dir, TagsName + ".tmp-" + java.util.UUID.randomUUID())
    val out = fs.create(tmp, true)
    try out.write(all.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    val f = new Path(dir, TagsName)
    fs.delete(f, false)
    if (!fs.rename(tmp, f))
      throw new java.io.IOException(s"CommitTags: cannot commit $f")
  }
}
