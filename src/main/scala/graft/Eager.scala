package graft

import org.apache.spark.sql.DataFrame

/**
 * Cache-lifecycle helper for operators that persist an intermediate frame
 * reused by several branches of their plan (MinHash signatures, bigram
 * tables, …). The naive `intermediate.persist()` inside a lazily-returned
 * DataFrame pins executor storage in the CacheManager for the life of the
 * session — every call leaks one cached table (round-4 advisory).
 *
 * The pattern here instead: persist the intermediate, materialize the
 * RESULT eagerly (`localCheckpoint`), then unpersist the intermediate
 * before returning. The returned frame's blocks are owned by its
 * checkpointed RDD, which the ContextCleaner releases once the frame is
 * garbage-collected — unlike CacheManager entries, which survive until an
 * explicit `unpersist()` that a lazily-composed caller can never safely
 * issue. Results of these operators are small relative to their inputs
 * (candidate pairs, per-doc scores), so eager materialization costs what
 * the first action would have anyway.
 *
 * Cluster note: `localCheckpoint` trades fault-tolerance for speed (blocks
 * are not replicated; losing an executor loses the partition). For
 * multi-hour 100 TB jobs, set a reliable checkpoint dir and swap
 * `localCheckpoint()` for `checkpoint()` — the lifecycle contract is the
 * same.
 */
private[graft] object Eager {

  /** Persist `df`, build the result from the persisted copy, materialize it,
    * release the intermediate. See object scaladoc for the contract. */
  def withPersisted(df: DataFrame)(body: DataFrame => DataFrame): DataFrame = {
    val p = df.persist()
    try body(p).localCheckpoint()
    finally p.unpersist(blocking = false)
  }

  /** Eagerly checkpoint `df` and return it with a release handle that frees
    * the checkpoint's blocks deterministically — for iterative loops where
    * waiting on the GC-driven ContextCleaner would accumulate one copy per
    * round (round-4 advisory on clusterDuplicates).
    *
    * CONTRACT (round-6 advisory): the handle releases the checkpointed RDD's
    * blocks WITHOUT unlinking the frame — any action on the frame after
    * `release()` fails with a "checkpoint block not found"-style exception
    * rather than recomputing (localCheckpoint truncates lineage; there is
    * nothing left to recompute from). Call `release()` only once every
    * consumer of the frame has materialized what it needs. The release is
    * idempotent; double-release is safe.
    *
    * The handle is derived by matching the checkpointed plan's `LogicalRDD`
    * root. If a Spark upgrade changes that plan shape, the match would fail
    * and a silent no-op handle would reintroduce the storage leak this
    * pattern exists to prevent — so match failure logs a loud warning
    * instead of passing silently. */
  def checkpointed(df: DataFrame): (DataFrame, () => Unit) = {
    val cp = df.localCheckpoint()
    val release: () => Unit = cp.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        () => { l.rdd.unpersist(blocking = false); () }
      case other =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"Eager.checkpointed: expected LogicalRDD root after localCheckpoint " +
            s"but found ${other.getClass.getName}; release handle is a NO-OP and " +
            s"checkpoint blocks will only be freed by the GC-driven ContextCleaner " +
            s"(storage-leak hazard — plan shape changed under a Spark upgrade?)")
        () => ()
    }
    (cp, release)
  }
}
