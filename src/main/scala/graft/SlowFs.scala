package graft

import java.net.URI

/**
 * A local filesystem whose RENAMES cost a fixed latency — the cheapest
 * faithful surrogate for an object store, where "rename" is a server-side
 * copy + delete (tens of ms to seconds per object) while reads/writes
 * stream at full speed. Used by [[CommitterProbe]] to measure what the
 * staged-write commit protocols actually cost in the rename-is-expensive
 * regime the 100 TB target runs on, without needing a real bucket.
 *
 * Register on a SparkSession with
 * `spark.hadoop.fs.slowfs.impl = graft.SlowRenameFileSystem` and address
 * paths as `slowfs:/...` (they map 1:1 onto the local fs). The delay is a
 * process-global knob so the probe can tune it per scenario.
 */
class SlowRenameFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "slowfs"
  override def getUri: URI = URI.create("slowfs:///")

  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean = {
    val d = SlowRenameFileSystem.renameDelayMs
    if (d > 0) Thread.sleep(d)
    SlowRenameFileSystem.renames.incrementAndGet()
    super.rename(src, dst)
  }
}

object SlowRenameFileSystem {
  /** Per-rename latency (ms) — object-store copy surrogate. */
  @volatile var renameDelayMs: Long = 25L
  val renames = new java.util.concurrent.atomic.AtomicLong(0L)
}
