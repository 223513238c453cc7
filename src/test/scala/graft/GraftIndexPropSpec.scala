package graft

import org.scalacheck.{Gen, Prop}
import org.apache.spark.sql.graft.GraftIndex
import org.apache.hadoop.fs.Path

/**
 * Serialization laws for the versioned manifest index — the commit artifact
 * every keyed-store crash guarantee hangs off. Property-checked because the
 * TSV encoding has three collision surfaces a unit test would undersample:
 * URL-encoded file names and key bounds (tabs/newlines/unicode/'#'), the
 * unranged-entry marker ('#', never produced by URLEncoder), and version
 * selection (newest parseable wins; the legacy un-suffixed file reads as
 * version 0).
 */
class GraftIndexPropSpec extends SparkSpec {
  _quiet

  private def check(p: Prop, n: Int): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val nameGen: Gen[String] = Gen.nonEmptyListOf(Gen.oneOf(
    Gen.alphaNumChar,
    Gen.oneOf('\t', '\n', '#', '%', ' ', '=', 'π', '/', '+')))
    .map(_.mkString.take(40))

  private val rowsGen: Gen[Long] = Gen.chooseNum(0L, 1L << 40)

  test("writeRanges -> read is the identity for ranged + unranged entries, " +
      "both dialects, any encodable name/bound (150 cases)") {
    val conf = spark.sessionState.newHadoopConf()
    val gen = for {
      rangedRaw <- Gen.mapOf(Gen.zip(nameGen,
        Gen.zip(nameGen, nameGen, rowsGen)))
      unrangedRaw <- Gen.mapOf(Gen.zip(Gen.resize(8, nameGen), rowsGen))
      manifest <- Gen.oneOf(true, false)
    } yield (rangedRaw, unrangedRaw, manifest)
    check(Prop.forAll(gen) { case (rangedRaw, unrangedRaw, manifest) =>
      // ranged lo <= hi by construction (the writer's invariant), names
      // disjoint between the two maps (a file is ranged XOR unranged)
      val ranged: Map[String, (Any, Any, Long)] = rangedRaw.map {
        case (n, (a, b, r)) =>
          n -> ((if (a <= b) a else b, if (a <= b) b else a, r))
      }
      val unranged = unrangedRaw.view
        .filterKeys(k => !ranged.contains(k)).toMap
      val dir = java.nio.file.Files.createTempDirectory("graft_ixprop").toString
      GraftIndex.writeRanges(spark, dir, "key", "str", ranged,
        unranged, manifest)
      val back = GraftIndex.read(new Path(dir), conf)
      back.isDefined &&
        back.get.keyCol == "key" && back.get.keyTag == "str" &&
        back.get.manifest == manifest &&
        back.get.ranges == ranged &&
        back.get.unranged == unranged &&
        back.get.files == ranged.keySet ++ unranged.keySet
    }, 150)
  }

  test("the newest version wins and KeepVersions bounds the on-disk set; " +
      "a legacy un-suffixed sidecar reads as version 0 and is superseded") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ixver").toString
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(conf)
    // legacy file (version 0), hand-written in the v1 dialect
    val legacy = new Path(dir, GraftIndex.FileName)
    val out = fs.create(legacy, true)
    out.write("graft-index\tv1\tkey\tnum\nold.parquet\t1\t9\t100\n".getBytes("UTF-8"))
    out.close()
    val r0 = GraftIndex.read(new Path(dir), conf).get
    assert(!r0.manifest && r0.ranges.keySet == Set("old.parquet"))
    // three successive commits: each newest wins; retained versions bounded
    (1 to 3).foreach { i =>
      GraftIndex.writeRanges(spark, dir, "key", "num",
        Map(s"f$i.parquet" -> ((BigDecimal(i), BigDecimal(i * 10), i.toLong))),
        manifest = true)
      val r = GraftIndex.read(new Path(dir), conf).get
      assert(r.manifest && r.ranges.keySet == Set(s"f$i.parquet"),
        s"commit $i must be the live index")
    }
    val versions = GraftIndex.versionFiles(fs, new Path(dir))
    assert(versions.length == GraftIndex.KeepVersions,
      s"retained versions must be bounded: ${versions.map(_._2.getName)}")
    assert(!fs.exists(legacy), "the superseded legacy sidecar is pruned")
    // readAll: newest first — head is live, tail funds in-flight readers
    val all = GraftIndex.readAll(new Path(dir), conf)
    assert(all.head.ranges.keySet == Set("f3.parquet"))
    assert(all.last.ranges.keySet == Set("f2.parquet"))
  }

  test("commit fencing: a stale basedOn is refused before touching disk; a " +
      "racer's already-created version name loses loudly; torn versions " +
      "read as absent, block commits, and sweep clean") {
    import org.apache.spark.sql.graft.GraftConcurrentCommitException
    val dir = java.nio.file.Files.createTempDirectory("graft_ixfence").toString
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(conf)
    def entry(i: Int) =
      Map(s"f$i.parquet" -> ((BigDecimal(i), BigDecimal(i * 10), i.toLong)))
    val v1 = GraftIndex.writeRanges(spark, dir, "key", "num", entry(1),
      manifest = true, basedOn = Some(0L))
    assert(v1 == 1L)
    val v2 = GraftIndex.writeRanges(spark, dir, "key", "num", entry(2),
      manifest = true, basedOn = Some(v1))
    assert(v2 == 2L)
    // OCC fence: a commit planned from v1 arrives after v2 — fenced off,
    // nothing on disk changes
    val before = GraftIndex.readAll(new Path(dir), conf)
    intercept[GraftConcurrentCommitException] {
      GraftIndex.writeRanges(spark, dir, "key", "num", entry(9),
        manifest = true, basedOn = Some(v1))
    }
    assert(GraftIndex.readAll(new Path(dir), conf) == before)
    // same-seq race: the other maintainer already created v3 — the loser's
    // create-exclusive fails loudly instead of replacing the winner's bytes
    GraftIndex.writeRanges(spark, dir, "key", "num", entry(3),
      manifest = true): Unit // the "winner" (v3)
    intercept[GraftConcurrentCommitException] {
      // manufacture the exact same-name collision createExclusive guards:
      // basedOn says v2 is current, but v3 exists
      GraftIndex.writeRanges(spark, dir, "key", "num", entry(8),
        manifest = true, basedOn = Some(v2))
    }
    assert(GraftIndex.read(new Path(dir), conf).get.ranges.keySet
      == Set("f3.parquet"), "the winner's commit must survive the race")
    // torn version: a fenced commit that died mid-write — sealed header,
    // no trailer. Readers fall back to the previous version; commits refuse
    // until fsck sweeps it.
    val torn = new Path(dir, GraftIndex.FileName + ".v4")
    val out = fs.create(torn, true)
    out.write("graft-index\tv2\tkey\tnum\tsealed\nf4.parquet\t4\t40\t4\n".getBytes("UTF-8"))
    out.close()
    assert(GraftIndex.read(new Path(dir), conf).get.ranges.keySet
      == Set("f3.parquet"), "a torn version must read as absent")
    intercept[GraftConcurrentCommitException] {
      GraftIndex.writeRanges(spark, dir, "key", "num", entry(5), manifest = true)
    }
    assert(GraftIndex.sweepTornVersions(spark, dir) == 1)
    val v5 = GraftIndex.writeRanges(spark, dir, "key", "num", entry(5),
      manifest = true)
    assert(v5 == 4L, "the swept debris frees its seq — create-exclusive " +
      "re-claims the name safely")
    assert(GraftIndex.read(new Path(dir), conf).get.ranges.keySet == Set("f5.parquet"))
    // the primitive itself: second create-exclusive on the same name loses
    // loudly (O_EXCL on local fs — not check-then-create)
    val claim = new Path(dir, GraftIndex.FileName + ".v99")
    GraftIndex.createExclusive(fs, claim).close()
    intercept[GraftConcurrentCommitException] {
      GraftIndex.createExclusive(fs, claim).close()
    }
    fs.delete(claim, false)
  }

  test("the seal is unforgeable by truncation: EVERY byte-prefix of a " +
      "committed version reads as absent (never as a valid empty legacy " +
      "index) and trips the unsealed-newest commit fence") {
    import org.apache.spark.sql.graft.GraftConcurrentCommitException
    val dir = java.nio.file.Files.createTempDirectory("graft_ixtorn").toString
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(conf)
    val v1 = GraftIndex.writeRanges(spark, dir, "key", "num",
      Map("f1.parquet" -> ((BigDecimal(1), BigDecimal(10), 100L))),
      manifest = true)
    val committed = new Path(dir, GraftIndex.FileName + s".v$v1")
    val in = fs.open(committed)
    val bytes = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false); buf.toByteArray
    } finally in.close()
    // the pre-r15 hole: a cut inside the header line before the dialect
    // marker parsed as a legacy index with ZERO files — readers silently
    // saw an empty table. With the sealed magic in field 0, no prefix of
    // the payload can match either accepted magic without its trailer.
    (1 until bytes.length).foreach { cut =>
      val torn = new Path(dir, GraftIndex.FileName + s".v${v1 + 1}")
      val out = fs.create(torn, true)
      out.write(bytes, 0, cut); out.close()
      val got = GraftIndex.read(new Path(dir), conf)
      assert(got.exists(_.files == Set("f1.parquet")),
        s"prefix cut at $cut must read as absent (fall back to v$v1), got " +
          s"${got.map(_.files)}")
      fs.delete(torn, false)
    }
    // and the commit fence still trips on a mid-header cut
    val torn = new Path(dir, GraftIndex.FileName + s".v${v1 + 1}")
    val out = fs.create(torn, true)
    out.write(bytes, 0, "graft-index-se".length); out.close()
    intercept[GraftConcurrentCommitException] {
      GraftIndex.writeRanges(spark, dir, "key", "num",
        Map("f2.parquet" -> ((BigDecimal(2), BigDecimal(20), 2L))),
        manifest = true)
    }
    assert(GraftIndex.sweepTornVersions(spark, dir) == 1)
    // interop: a pre-r15 sealed file (dialect in header field 4) with a
    // valid trailer still parses...
    val legacySealed = new Path(dir, GraftIndex.FileName + s".v${v1 + 1}")
    val out2 = fs.create(legacySealed, true)
    out2.write(("graft-index\tv2\tkey\tnum\tsealed\n" +
      "f9.parquet\t9\t90\t9\n#commit\t1\n").getBytes("UTF-8"))
    out2.close()
    assert(GraftIndex.read(new Path(dir), conf).get.files == Set("f9.parquet"),
      "pre-r15 sealed files with trailers must keep parsing")
  }

  test("torn-debris lease: a STALE torn newest version self-heals inline at " +
      "the next commit (no operator fsck); a FRESH one still fences loudly") {
    import org.apache.spark.sql.graft.GraftConcurrentCommitException
    val dir = java.nio.file.Files.createTempDirectory("graft_ixlease").toString
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(conf)
    def entry(i: Int) =
      Map(s"f$i.parquet" -> ((BigDecimal(i), BigDecimal(i * 10), i.toLong)))
    val v1 = GraftIndex.writeRanges(spark, dir, "key", "num", entry(1),
      manifest = true)
    def plantTorn(seq: Long, ageMs: Long): Path = {
      val p = new Path(dir, GraftIndex.FileName + s".v$seq")
      val out = fs.create(p, true)
      out.write("graft-index-se".getBytes("UTF-8")); out.close()
      fs.setTimes(p, System.currentTimeMillis() - ageMs, -1)
      p
    }
    // stale debris (older than the 15-minute default lease): the next
    // commit sweeps it inline and proceeds — the crashed daily ingest loop
    // heals itself on its own retry
    plantTorn(v1 + 1, ageMs = 16L * 60 * 1000)
    val v2 = GraftIndex.writeRanges(spark, dir, "key", "num", entry(2),
      manifest = true, basedOn = Some(v1))
    assert(v2 == v1 + 1, "the swept stale debris frees its seq")
    assert(GraftIndex.read(new Path(dir), conf).get.files == Set("f2.parquet"))
    // fresh torn newest: could be a maintainer mid-commit — still fenced
    plantTorn(v2 + 1, ageMs = 0L)
    intercept[GraftConcurrentCommitException] {
      GraftIndex.writeRanges(spark, dir, "key", "num", entry(3), manifest = true)
    }
    assert(GraftIndex.sweepTornVersions(spark, dir) == 1)
  }
}
