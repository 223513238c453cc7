package graft

import org.apache.spark.sql.functions._

/** The `graft.checkpointDir` reliable-checkpoint knob (round-7 verdict #2):
  * with the session conf set, every Eager materialization — including each
  * round of the clusterDuplicates CC loop — goes through a RELIABLE
  * `Dataset.checkpoint()` (files survive executor loss) instead of
  * `localCheckpoint()` (blocks die with their executor). The contract this
  * suite pins: results are IDENTICAL under both modes, intermediate rounds'
  * state is released deterministically in both (files deleted / blocks
  * freed), and use-after-release still fails loudly in reliable mode. */
class CheckpointModeSpec extends SparkSpec {
  _quiet
  import spark.implicits._

  private def withReliableDir[A](body: java.io.File => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toFile
    spark.conf.set("graft.checkpointDir", dir.toString)
    try body(dir)
    finally {
      spark.conf.unset("graft.checkpointDir")
      // do NOT unset the SparkContext checkpoint dir — other suites share the
      // context and an unset conf already routes them back to localCheckpoint
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  /** rdd-N checkpoint directories currently on disk under the context's
    * resolved checkpoint dir (setCheckpointDir appends a UUID subdir). */
  private def rddDirs(): Set[String] = {
    spark.sparkContext.getCheckpointDir.toSet[String].flatMap { base =>
      val d = new java.io.File(new java.net.URI(base).getPath)
      Option(d.listFiles()).toSeq.flatten.filter(_.getName.startsWith("rdd-"))
        .map(_.getName).toSet
    }
  }

  // planted graph: two chains {1-2-3-4} and {10-11}, a singleton pair {20,21}
  private def pairDf = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L)
  ).toDF("id_a", "id_b")

  test("clusterDuplicates: reliable mode matches local mode exactly") {
    val expect = ops.Dedup.clusterDuplicates(pairDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(expect.nonEmpty)
    val got = withReliableDir { _ =>
      ops.Dedup.clusterDuplicates(pairDf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(got == expect)
    assert(got((1L, 1L, 4L)) && got((11L, 10L, 2L)) && got((21L, 20L, 2L)))
  }

  test("reliable mode: intermediate rounds' checkpoint files are deleted") {
    withReliableDir { _ =>
      val before = rddDirs()
      val res = ops.Dedup.clusterDuplicates(pairDf)
      assert(res.count() == 8)
      val leftover = rddDirs() -- before
      // the CC loop checkpoints labels once per round plus the seed; every
      // one must be deleted by its release handle. Only the RESULT frame's
      // checkpoint may remain (the caller owns its lifecycle — that file
      // surviving executor loss is the feature).
      assert(leftover.size <= 1,
        s"CC loop leaked reliable-checkpoint dirs: $leftover")
    }
  }

  test("checkpointed: reliable release deletes files; use-after-release fails loudly") {
    withReliableDir { _ =>
      val before = rddDirs()
      val (df, release) = Eager.checkpointed(Seq(1, 2, 3).toDF("x"))
      assert(df.count() == 3)
      val added = rddDirs() -- before
      assert(added.size == 1, s"expected one new rdd checkpoint dir, got $added")
      release()
      assert((rddDirs() & added).isEmpty, "release left reliable checkpoint files")
      release() // idempotent
      // file deletion is synchronous — the very next action must fail, and
      // must fail because the checkpoint files are gone, never recompute
      val t = intercept[Throwable] { df.count() }
      val chain = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => e.getClass.getName + ": " + Option(e.getMessage).getOrElse(""))
        .mkString(" <- ").toLowerCase
      assert(chain.contains("checkpoint") || chain.contains("exist") ||
        chain.contains("not found"), s"unexpected failure: $chain")
    }
  }
}
