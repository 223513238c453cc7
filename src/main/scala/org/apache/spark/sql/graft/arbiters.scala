package org.apache.spark.sql.graft

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * The S3-style conditional-PUT commit dialect — a concrete [[CommitArbiter]]
 * for [[GraftIndex.registerArbiter]], closing the verify-after-write
 * residual window with a STORE-ARBITRATED precondition instead of a
 * read-back.
 *
 * Every commit file in the engine (index versions, manifest pointers,
 * generation claims) is created exactly once and never replaced, so the
 * whole commit protocol reduces to one store primitive: *atomically create
 * this object iff absent*. Real object stores expose exactly that shape —
 * S3 `PUT` with `If-None-Match: *` (412 Precondition Failed on existence),
 * GCS `x-goog-if-generation-match: 0`, Azure Blob `If-None-Match: *` — and
 * a deployment plugs its store in by implementing [[ConditionalStore]]
 * over its SDK and registering `new ConditionalPut.Arbiter(store)` for the
 * scheme. A failed precondition MUST map to `putIfAbsent = false`; any
 * transport error propagates as its own exception (the commit outcome is
 * then UNKNOWN and the caller's retry discipline applies).
 *
 * Reference lifecycle analogue: the check-and-put commit shape of
 * `HbaseTable.scala`'s atomic ops — the store arbitrates, the loser is
 * told loudly.
 */
object ConditionalPut {

  /** The store-side primitive: atomically publish `payload` at `target`
    * iff no object exists there. Returns false on a failed precondition
    * (an object exists — the caller lost the race); true after the bytes
    * are durably published. Implementations map 1:1 onto the store's
    * conditional-write API and must be atomic AT THE STORE: the existence
    * check and the write are one operation, with no window for a racer's
    * PUT between them. */
  trait ConditionalStore {
    def putIfAbsent(fs: FileSystem, target: Path,
        payload: Array[Byte]): Boolean
  }

  /** The dialect: publication IS the conditional create; a failed
    * precondition throws the engine's fence class, exactly like a lost
    * create-exclusive race — callers already handle it (fenced losers
    * clean their own staging and retry from fresh state). */
  final class Arbiter(store: ConditionalStore) extends CommitArbiter {
    def commit(fs: FileSystem, target: Path, payload: Array[Byte]): Unit =
      if (!store.putIfAbsent(fs, target, payload))
        throw new GraftConcurrentCommitException(
          s"graft: conditional PUT precondition failed (If-None-Match: *) " +
            s"for $target — an object already exists: this commit lost the " +
            "race and was NOT applied (the surviving bytes are the " +
            "winner's; retry from fresh state)")
  }

  /**
   * JVM-local reference store — honors the If-None-Match contract exactly
   * for maintainers within one process (the test-cluster shape, and the
   * proof harness for the dialect): the existence check and the exclusive
   * create run under one per-object lock keyed by the object's canonical
   * URI, so no racer's PUT can land between them — the atomicity a real
   * store provides server-side, provided in-process here. Deleted objects
   * (fsck's torn-commit sweeps) free their precondition naturally: the
   * check consults the live filesystem, not a memory of past PUTs.
   * Cross-JVM maintainers need a real store dialect — this one cannot see
   * another process's lock.
   */
  object JvmLocalStore extends ConditionalStore {
    // a FIXED stripe array, not a per-URI map: per-path lock identity is not
    // required (only mutual exclusion), and one Object per committed target
    // URI would leak for the JVM's life on long-lived drivers (commit files
    // are one-per-generation per table). Two URIs sharing a stripe merely
    // serialize — never miss — each other's check-and-create.
    private val stripes = Array.fill(64)(new Object)
    def putIfAbsent(fs: FileSystem, target: Path,
        payload: Array[Byte]): Boolean = {
      val uri = s"${fs.getUri}${target.toUri.getPath}"
      val lock = stripes((uri.hashCode & 0x7fffffff) % stripes.length)
      lock.synchronized {
        if (fs.exists(target)) false
        else {
          val out = fs.create(target, false)
          try out.write(payload) finally out.close()
          true
        }
      }
    }
  }

  /** Register the JVM-local reference dialect for `scheme` — single-JVM
    * deployments (local mode, the test cluster) get zero-window commits
    * with one call; [[GraftIndex.unregisterArbiter]] restores the default
    * create-exclusive + verify-after-write dialect. */
  def registerJvmLocal(scheme: String): Unit =
    GraftIndex.registerArbiter(scheme, new Arbiter(JvmLocalStore))
}
