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
 * are not replicated; losing ONE executor kills a multi-hour job whose loop
 * state lived there). For such jobs set the session conf
 * `graft.checkpointDir` to a reliable (HDFS/object-store) directory: every
 * materialization below then uses `Dataset.checkpoint()` — files survive
 * executor loss — with the SAME lifecycle contract (release deletes the
 * round's checkpoint files instead of its blocks). The caller owns the
 * directory's final lifecycle: delete it when the job ends (frames returned
 * to the caller, e.g. an operator's final result, keep their files until
 * then — that persistence is the point of the reliable mode).
 */
private[graft] object Eager {

  /** The reliable-checkpoint directory, if the session opted in. */
  private def reliableDir(df: DataFrame): Option[String] =
    df.sparkSession.conf.getOption("graft.checkpointDir").filter(_.nonEmpty)

  /** `SparkContext.setCheckpointDir` appends a fresh UUID subdir per call —
    * calling it per-materialization would scatter one round per directory,
    * so re-latch only when the CONF value changes (a caller repointing
    * `graft.checkpointDir` mid-session must not keep writing into the old
    * directory they may be about to delete). */
  @volatile private var appliedDir: Option[String] = None
  private def ensureCheckpointDir(df: DataFrame, dir: String): Unit = synchronized {
    val sc = df.sparkSession.sparkContext
    if (!appliedDir.contains(dir) || sc.getCheckpointDir.isEmpty) {
      sc.setCheckpointDir(dir)
      appliedDir = Some(dir)
    }
  }

  /** Materialize `df` eagerly: `localCheckpoint` (default; fast, blocks
    * unreplicated) or a reliable `checkpoint` under `graft.checkpointDir`
    * when the session set one. Reliable path: the plan is persisted across
    * the two jobs `Dataset.checkpoint()` runs (the eager materialization and
    * the checkpoint-file write) — without it the write job would RECOMPUTE
    * the full lineage, doubling every CC-loop round's cost on exactly the
    * multi-hour jobs the knob exists for. */
  def materialize(df: DataFrame): DataFrame = reliableDir(df) match {
    case Some(dir) =>
      ensureCheckpointDir(df, dir)
      val p = df.persist()
      try p.checkpoint()
      finally p.unpersist(blocking = false)
    case None => df.localCheckpoint()
  }

  /** Persist `df`, build the result from the persisted copy, materialize it,
    * release the intermediate. See object scaladoc for the contract. */
  def withPersisted(df: DataFrame)(body: DataFrame => DataFrame): DataFrame = {
    val p = df.persist()
    try materialize(body(p))
    finally p.unpersist(blocking = false)
  }

  /** Eagerly checkpoint `df` and return it with a release handle that frees
    * the checkpoint's blocks deterministically — for iterative loops where
    * waiting on the GC-driven ContextCleaner would accumulate one copy per
    * round (round-4 advisory on clusterDuplicates).
    *
    * CONTRACT (round-6 advisory): the handle releases the checkpointed RDD's
    * state WITHOUT unlinking the frame — any action on the frame after
    * `release()` fails with a "checkpoint block not found" (default mode) or
    * missing-file (reliable `graft.checkpointDir` mode) exception rather
    * than recomputing (checkpointing truncates lineage; there is
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
    val cp = materialize(df)
    val hadoopConf = df.sparkSession.sparkContext.hadoopConfiguration
    val release: () => Unit = cp.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        () => {
          l.rdd.unpersist(blocking = false)
          // reliable mode: the round's state is files, not blocks —
          // getCheckpointFile is Some(path) only for a reliable checkpoint
          // (localCheckpoint keeps no file), so one handle covers both modes
          l.rdd.getCheckpointFile.foreach { f =>
            val p = new org.apache.hadoop.fs.Path(f)
            try p.getFileSystem(hadoopConf).delete(p, true)
            catch { case _: java.io.IOException => () } // already gone / racing cleaner
          }
        }
      case other =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"Eager.checkpointed: expected LogicalRDD root after checkpoint " +
            s"but found ${other.getClass.getName}; release handle is a NO-OP and " +
            s"checkpoint blocks will only be freed by the GC-driven ContextCleaner " +
            s"(storage-leak hazard — plan shape changed under a Spark upgrade?)")
        () => ()
    }
    (cp, release)
  }
}
