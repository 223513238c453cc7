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
}
