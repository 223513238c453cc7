package graft

import org.apache.spark.sql.functions._
import graft.store.ManifestTable

/**
 * Randomized property drive of the incremental-backup family
 * ([[ManifestTable.syncSnapshot]] / [[ManifestTable.verifyBackup]]): the
 * unit specs pin each verb's contract on hand-picked states; this spec
 * walks RANDOM op sequences (append / overwrite / compaction tiers /
 * rollback / tagged appends), interleaves syncs at random points, injects
 * random backup damage (lost and truncated data files), and asserts the
 * one invariant the whole family promises — after a final heal cycle the
 * backup equals the source exactly, audits clean, and carries the
 * source's exactly-once ledger. Deterministic seed: a failure replays.
 */
class BackupPropSpec extends SparkSpec {
  import spark.implicits._
  _quiet

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def multiset(df: org.apache.spark.sql.DataFrame): Map[Seq[Any], Int] =
    df.collect().toSeq.map(_.toSeq).groupBy(identity)
      .map { case (r, v) => r -> v.length }

  private def batch(from: Long, n: Long) =
    spark.range(from, from + n).select($"id", md5($"id".cast("string")).as("v"))

  test("randomized backup lifecycle: any op sequence + any data-file " +
      "damage heals through sync, and the backup ends content- and " +
      "ledger-identical to the source (seeded, replayable)") {
    val rnd = new scala.util.Random(20260817L)
    for (round <- 1 to 4) {
      val base = tmp(s"graft_bprop_$round")
      val src = base + "/t"
      val bak = base + "/backup"
      var nextId = 0L
      def freshBatch(n: Long) = { val b = batch(nextId, n); nextId += n; b }
      ManifestTable.write(freshBatch(20).repartition(2), src)
      ManifestTable.syncSnapshot(spark, src, bak): Unit
      var taggedEpoch = 0
      val ops = 10
      for (step <- 1 to ops) {
        rnd.nextInt(7) match {
          case 0 =>
            ManifestTable.append(freshBatch(10).coalesce(1), src)
          case 1 =>
            ManifestTable.write(freshBatch(15).repartition(2), src)
          case 2 =>
            ManifestTable.minorCompact(spark, src): Unit
          case 3 =>
            ManifestTable.compact(spark, src, targetFiles = 2)
          case 4 =>
            // rollback when an undo window exists (ignore when not)
            if (ManifestTable.genBack(spark, src, 1).isDefined)
              ManifestTable.rollback(spark, src): Unit
          case 5 =>
            taggedEpoch += 1
            ManifestTable.appendTagged(freshBatch(5).coalesce(1), src,
              s"ep-$round-$taggedEpoch"): Unit
          case 6 =>
            ManifestTable.syncSnapshot(spark, src, bak): Unit
        }
        if (rnd.nextInt(100) < 40)
          ManifestTable.syncSnapshot(spark, src, bak): Unit
        if (rnd.nextInt(100) < 30) {
          // random backup damage: lose or truncate one live data file
          val gen = ManifestTable.liveGen(spark, bak).get
          val files = Option(new java.io.File(bak, gen).listFiles())
            .getOrElse(Array.empty).filter(_.getName.endsWith(".parquet"))
          if (files.nonEmpty) {
            val victim = files(rnd.nextInt(files.length))
            if (rnd.nextBoolean()) victim.delete(): Unit
            else {
              val out = new java.io.FileOutputStream(victim)
              out.write(7); out.close()
            }
          }
        }
      }
      // the promise: one heal cycle converges (the first sync may itself
      // be the heal; a second is the idempotence check)
      ManifestTable.syncSnapshot(spark, src, bak): Unit
      val v = ManifestTable.verifyBackup(spark, src, bak)
      assert(v.ok && v.tagDrift == 0, s"round $round: $v")
      assert(multiset(ManifestTable.read(spark, bak)) ==
        multiset(ManifestTable.read(spark, src)),
        s"round $round: backup content must equal the source")
      assert(ManifestTable.syncSnapshot(spark, src, bak) == 0,
        s"round $round: a current backup must sync as a no-op")
      // the ledger traveled: every tag committed at the source reads
      // committed at the backup (in the live incarnation)
      (1 to taggedEpoch).foreach { e =>
        val tag = s"ep-$round-$e"
        assert(ManifestTable.hasTag(spark, src, tag) ==
          ManifestTable.hasTag(spark, bak, tag),
          s"round $round: ledger must agree on $tag")
      }
      assert(ManifestTable.fsck(spark, bak).ok)
    }
  }
}
