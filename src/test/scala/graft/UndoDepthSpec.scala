package graft

import org.apache.spark.sql.functions._
import graft.store.{KeyedStore, ManifestTable}

/**
 * Keep-N undo windows + as-of reads — the arbitrary-depth generalization of
 * keep-one-back (reference analogue: HBase time-range reads give as-of at
 * any retained depth, Query2.scala:345-359). `graft.keepVersions` funds N-1
 * undo steps on BOTH persisted layouts; vacuum drains the window; as-of
 * reads on the keyed store route THROUGH the graft connector so a past
 * snapshot keeps key pruning (never an explicit-file-list parquet relation).
 */
class UndoDepthSpec extends SparkSpec {
  import spark.implicits._
  _quiet

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def withKeep[T](n: Int)(body: => T): T = {
    val prev = spark.conf.getOption("graft.keepVersions")
    spark.conf.set("graft.keepVersions", n.toString)
    try body finally prev match {
      case Some(v) => spark.conf.set("graft.keepVersions", v)
      case None => spark.conf.unset("graft.keepVersions")
    }
  }

  private def snap(dir: String): Map[Long, Long] =
    KeyedStore.readKeyed(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("keyed store: graft.keepVersions=4 funds THREE undo steps; each " +
      "readKeyedPrevious(back=n) is the exact historical snapshot, served " +
      "through the connector with key pruning; vacuum drains to N") {
    withKeep(4) {
      val dir = tmp("graft_undo_keyed") + "/t"
      val base = spark.range(0, 600).toDF("key").withColumn("v", $"key" * 3)
      KeyedStore.writeIndexed(base, dir, numRanges = 4)
      val s0 = snap(dir)
      def mutate(mod: Int, v: Long): Unit = KeyedStore.upsertIndexed(spark, dir,
        spark.range(0, 600).toDF("key").where(pmod($"key", lit(mod)) === 0)
          .withColumn("v", lit(v)))
      mutate(7, -1L); val s1 = snap(dir)
      mutate(11, -2L); val s2 = snap(dir)
      mutate(13, -3L); val s3 = snap(dir)
      def prev(back: Int): Map[Long, Long] =
        KeyedStore.readKeyedPrevious(spark, dir, back = back).get
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(snap(dir) == s3)
      assert(prev(1) == s2, "back=1 must be the pre-last-mutation snapshot")
      assert(prev(2) == s1)
      assert(prev(3) == s0, "keepVersions=4 funds exactly three steps back")
      assert(KeyedStore.readKeyedPrevious(spark, dir, back = 4).isEmpty,
        "past the retained window there is no view")
      // retainedVersions: 4 snapshots, newest first, row counts exact
      val retained = KeyedStore.retainedVersions(spark, dir)
      assert(retained.length == 4)
      assert(retained.forall(_._2 == 600L))
      // as-of by explicit version seq == the positional read
      val v2 = retained(2)._1
      val asOf = KeyedStore.readKeyedAsOf(spark, dir, v2).get
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(asOf == s1)
      // the as-of read is a CONNECTOR scan (pruned), not a parquet file list
      val plan = KeyedStore.readKeyedPrevious(spark, dir, back = 2).get
        .where($"key" === 42L).queryExecution.executedPlan.toString()
      assert(plan.contains("GraftScan"),
        s"as-of reads must route through the graft connector:\n$plan")
      // a key predicate on the as-of read prunes to ONE of the snapshot's
      // four range files, against the sidecar index
      assert(plan.contains("files=1/4") && plan.contains("index=sidecar"), plan)
      // drain rule: vacuum to 2 retained versions — one undo step survives,
      // deeper history is gone, the live snapshot is untouched
      KeyedStore.vacuumIndexed(spark, dir, keepVersions = 2): Unit
      assert(snap(dir) == s3)
      assert(prev(1) == s2)
      assert(KeyedStore.readKeyedPrevious(spark, dir, back = 2).isEmpty)
      assert(KeyedStore.retainedVersions(spark, dir).length == 2)
    }
  }

  test("index-only COUNT on an as-of read answers from the PINNED snapshot's " +
      "index, not the live one — still zero data I/O") {
    withKeep(3) {
      val dir = tmp("graft_undo_aggpush") + "/t"
      KeyedStore.writeIndexed(
        spark.range(0, 500).toDF("key").withColumn("v", $"key"), dir, numRanges = 4)
      KeyedStore.deleteIndexed(spark, dir,
        spark.range(0, 100).toDF("key"))
      assert(KeyedStore.readKeyed(spark, dir).count() == 400L)
      val prev = KeyedStore.readKeyedPrevious(spark, dir).get
      assert(prev.count() == 500L,
        "the as-of COUNT must be the snapshot's, not the live table's")
      val plan = prev.groupBy().count().queryExecution.executedPlan.toString()
      assert(plan.contains("GraftAggScan"),
        s"the as-of COUNT must still answer from the index sidecar:\n$plan")
    }
  }

  test("keep-N x minor compaction: _RETAINS-referenced files pin their " +
      "generations beyond the keep window, and deep undo reads stay exact") {
    withKeep(3) {
      val t = tmp("graft_undo_minor") + "/t"
      val base = spark.range(60000).select($"id", md5($"id".cast("string")).as("v"))
      ManifestTable.write(base.coalesce(1), t)
      val bigLen = new java.io.File(ManifestTable.resolve(spark, t))
        .listFiles().filter(_.getName.endsWith(".parquet")).map(_.length).max
      def addSmall(i: Long): Unit = ManifestTable.append(
        Seq((900000L + i, s"s$i")).toDF("id", "v"), t)
      addSmall(1); addSmall(2)
      assert(ManifestTable.minorCompact(spark, t, smallBytes = bigLen) == 2)
      addSmall(3); addSmall(4)
      assert(ManifestTable.minorCompact(spark, t, smallBytes = bigLen) >= 2)
      val full = ManifestTable.read(spark, t).count()
      assert(full == 60004L)
      // back=1: the pre-second-minor generation — same multiset (minors
      // only merge), INCLUDING the appends that landed while it was live
      assert(ManifestTable.readPrevious(spark, t).get.count() == 60004L)
      // back=2: the first incarnation's generation — the original write
      // PLUS the two appends that landed in it before the first minor
      // (appends go to the live generation; rewrites freeze it)
      assert(ManifestTable.readPrevious(spark, t, back = 2).get.count() == 60002L)
      // draining the conf does NOT break the snapshots a live _RETAINS
      // still pins: the big file's generation survives vacuum even past
      // the keep window, so the deep undo stays readable
      spark.conf.set("graft.keepVersions", "2")
      ManifestTable.vacuum(spark, t): Unit
      assert(ManifestTable.read(spark, t).count() == 60004L)
      assert(ManifestTable.readPrevious(spark, t, back = 2).get.count() == 60002L,
        "a retains-pinned generation must stay readable past the keep window")
    }
  }

  test("legacy single-file MANIFEST (pre-fencing layout) reads through the " +
      "versioned resolver and upgrades on the next rewrite") {
    val t = tmp("graft_legacy_pointer") + "/t"
    ManifestTable.write(spark.range(500).select($"id", ($"id" % 3).as("v")), t)
    val live = ManifestTable.liveGen(spark, t).get
    // devolve to the round-13 layout: one un-suffixed MANIFEST, no versions
    val dir = new java.io.File(t)
    dir.listFiles().filter(f => f.getName.startsWith("MANIFEST"))
      .foreach(f => assert(f.delete()))
    java.nio.file.Files.write(java.nio.file.Paths.get(t, "MANIFEST"),
      (live + "\n").getBytes("UTF-8")): Unit
    assert(ManifestTable.read(spark, t).count() == 500,
      "the legacy pointer must resolve as version 0")
    // next rewrite commits a sealed version; the legacy file survives ONE
    // cycle as the keep-one-back predecessor, then prunes
    ManifestTable.compact(spark, t, 1, df => df.where($"v" =!= 0))
    assert(ManifestTable.read(spark, t).count() == 333)
    val names1 = dir.listFiles().map(_.getName).filter(_.startsWith("MANIFEST"))
    assert(names1.exists(_.startsWith("MANIFEST.v")), names1.mkString(","))
    ManifestTable.compact(spark, t, 1, df => df.where($"v" =!= 1))
    assert(ManifestTable.read(spark, t).count() == 166)
    val names2 = dir.listFiles().map(_.getName).filter(_.startsWith("MANIFEST"))
    assert(!names2.contains("MANIFEST"),
      "the legacy pointer prunes once out of the keep-one-back window")
  }

  test("manifest table: keepVersions=4 retains the _PARENT chain through " +
      "rewrites; readPrevious(back)/readAsOf(gen) are exact; vacuum keeps " +
      "the funded chain and drains past it") {
    withKeep(4) {
      val t = tmp("graft_undo_mani") + "/t"
      val base = spark.range(1, 1001).select($"id", ($"id" % 9).as("v"))
      ManifestTable.write(base, t)
      val n0 = ManifestTable.read(spark, t).count()
      ManifestTable.compact(spark, t, 2, df => df.where($"v" =!= 0))
      val n1 = ManifestTable.read(spark, t).count()
      ManifestTable.compact(spark, t, 2, df => df.where($"v" =!= 1))
      val n2 = ManifestTable.read(spark, t).count()
      ManifestTable.compact(spark, t, 2, df => df.where($"v" =!= 2))
      assert(ManifestTable.readPrevious(spark, t).get.count() == n2)
      assert(ManifestTable.readPrevious(spark, t, back = 2).get.count() == n1)
      assert(ManifestTable.readPrevious(spark, t, back = 3).get.count() == n0,
        "keepVersions=4 funds three steps back")
      assert(ManifestTable.readPrevious(spark, t, back = 4).isEmpty)
      // readAsOf by generation name == the positional view
      val gen1 = ManifestTable.genBack(spark, t, 2).get
      assert(ManifestTable.readAsOf(spark, t, gen1).get.count() == n1)
      assert(ManifestTable.readAsOf(spark, t, "gen-000000099").isEmpty)
      // vacuum with keepPrevious keeps the whole funded chain ...
      ManifestTable.vacuum(spark, t): Unit
      assert(ManifestTable.readPrevious(spark, t, back = 3).get.count() == n0)
      // ... and draining = lowering the conf, then vacuuming
      spark.conf.set("graft.keepVersions", "2")
      ManifestTable.vacuum(spark, t): Unit
      assert(ManifestTable.readPrevious(spark, t).get.count() == n2)
      assert(ManifestTable.readPrevious(spark, t, back = 2).isEmpty,
        "vacuum must drain history past the (lowered) keep window")
    }
  }
}
