package graft

import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/**
 * A local filesystem with OBJECT-STORE PUT semantics for file creation —
 * the faithful surrogate for S3-style stores where
 * `create(overwrite = false)` is CHECK-THEN-CREATE, not atomic:
 *
 *  - the exists-check happens at `create()` time, but the object only
 *    materializes at `close()` (a whole-object PUT), so two racers can
 *    both pass the check and both "succeed";
 *  - the PUT itself is atomic and last-writer-wins: the file always holds
 *    exactly one writer's complete payload, never an interleaving.
 *
 * This is the regime where a bare create-exclusive fence degrades to a
 * silent last-committer-wins race — the gap the verify-after-write line of
 * [[org.apache.spark.sql.graft.GraftIndex.writeCommitFile]] closes (the
 * reference never had the problem: HBase region servers serialize writes,
 * reference HbaseTable.scala:373-423). Used by `ConcurrencySpec`'s
 * two-maintainer races; test-tree only — the process-global hooks are a
 * race-spec instrument, not a production filesystem. (`FenceProbe` prices
 * the verify read separately, on the local fs via
 * `graft.commit.verify=always`.)
 *
 * Register with `fs.natomic.impl = graft.NonAtomicCreateFileSystem` and
 * address paths as `natomic:/...` (mapped 1:1 onto the local fs). The
 * hooks are process-global so a race spec can barrier-align its writers.
 */
class NonAtomicCreateFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  import NonAtomicCreateFileSystem._

  override def getScheme: String = "natomic"
  override def getUri: URI = URI.create("natomic:///")

  // RawLocalFileSystem's permission and non-permission create overloads do
  // NOT route through each other — override both so every producer
  // (commit files via FileSystem.create(path, overwrite) AND parquet task
  // files via the non-permission chain) gets PUT semantics
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    create(f, FsPermission.getFileDefault, overwrite, bufferSize,
      replication, blockSize, progress)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    // check-then-create: all the exclusivity a plain PUT-based store gives
    if (!overwrite && exists(f))
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
    afterCreateCheck(f)
    val buf = new java.io.ByteArrayOutputStream()
    val fs = this
    new FSDataOutputStream(new java.io.FilterOutputStream(buf) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
      override def close(): Unit = {
        // the PUT: atomic whole-object replace, last close wins
        putLock.synchronized {
          val out = fs.rawCreate(f, permission, bufferSize, replication,
            blockSize, progress)
          try out.write(buf.toByteArray) finally out.close()
        }
        puts.incrementAndGet()
        afterPut(f)
      }
    }, null)
  }

  private def rawCreate(f: Path, permission: FsPermission, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    super.create(f, permission, true, bufferSize, replication, blockSize,
      progress)
}

object NonAtomicCreateFileSystem {
  /** Fired (with the target path) between the exists-check and the
    * deferred PUT — a race spec parks both writers here so both pass the
    * check. Path-keyed so data-file creates riding the same fs don't trip
    * a commit-file barrier. */
  @volatile var afterCreateCheck: Path => Unit = _ => ()
  /** Fired (with the target path) after a PUT materializes, before
    * `close()` returns — a race spec parks both writers here so both PUTs
    * land before either runs its verify read. */
  @volatile var afterPut: Path => Unit = _ => ()
  val puts = new java.util.concurrent.atomic.AtomicLong(0L)
  private val putLock = new Object
  def reset(): Unit = {
    afterCreateCheck = _ => (); afterPut = _ => (); puts.set(0L)
  }
}
