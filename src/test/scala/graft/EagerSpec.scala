package graft

import org.apache.spark.sql.functions._

/** Lifecycle contract of [[Eager.checkpointed]] (round-6 advisory): release
  * must actually free the blocks (no leak), double-release must be safe, and
  * use-after-release must fail loudly rather than silently recompute. */
class EagerSpec extends SparkSpec {
  _quiet
  import spark.implicits._

  test("checkpointed: release unregisters the RDD; double-release is safe") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (df, release) = Eager.checkpointed(Seq(1, 2, 3).toDF("x"))
    assert(df.count() == 3)
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "localCheckpoint did not register a persistent RDD")
    release()
    // registry removal is synchronous even with blocking=false (only the
    // remote block drop is async) — a fresh frame does not leak an entry
    assert((spark.sparkContext.getPersistentRDDs.keySet & added).isEmpty,
      "release left the checkpointed RDD registered (storage leak)")
    release() // idempotent
  }

  test("checkpointed: use-after-release fails loudly, never recomputes") {
    val (df, release) = Eager.checkpointed(Seq(1, 2, 3).toDF("x"))
    assert(df.count() == 3)
    release()
    // block removal is async under blocking=false: poll until the action
    // throws (checkpoint block not found) — it must NEVER return a silently
    // recomputed result, because localCheckpoint truncated the lineage
    val deadline = System.currentTimeMillis() + 30000
    var failed = false
    while (!failed && System.currentTimeMillis() < deadline) {
      // catch Throwable, not just SparkException: if a Spark upgrade rewraps
      // the missing-block failure, the loop must still terminate on the first
      // throw (diagnostic) instead of burning the 30 s deadline (flaky-slow)
      try { assert(df.count() == 3); Thread.sleep(50) }
      catch {
        case t: Throwable =>
          failed = true
          val chain = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
            .map(e => e.getClass.getName + ": " + Option(e.getMessage).getOrElse(""))
            .mkString(" <- ").toLowerCase
          assert(chain.contains("checkpoint") || chain.contains("block"),
            s"released frame failed with something other than a missing checkpoint block: $chain")
      }
    }
    assert(failed, "action on a released checkpointed frame kept succeeding")
  }
}
