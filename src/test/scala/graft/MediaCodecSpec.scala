package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{MediaCodec, Multimodal}

/** The real-codec contract: PNG (ImageIO) and WAV (RIFF parser) round-trip
  * EXACTLY — decoded statistics equal the synthesis formulas bit for bit.
  * This is the local half of the q63/q64 cross-engine oracle. */
class MediaCodecSpec extends AnyFunSuite {

  private def pngSum(id: Long): (Int, Int, Long) = {
    val w = (8 + id % 9).toInt
    val h = (8 + id % 7).toInt
    var s = 0L
    for (y <- 0 until h; x <- 0 until w) s += (id * 31 + x * 7 + y * 13) % 256
    (w, h, s)
  }

  test("PNG encode/decode round-trips pixel-exactly (real DEFLATE codec)") {
    for (id <- Seq(0L, 1L, 7L, 42L, 255L, 4095L)) {
      val bytes = Multimodal.synthImageBytes(id)
      assert(MediaCodec.sniffFormat(bytes) == "png")
      // real PNG magic + IHDR chunk present
      assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P')
      assert(new String(bytes.slice(12, 16), "US-ASCII") == "IHDR")
      val info = MediaCodec.decodeImage(bytes).get
      val (w, h, s) = pngSum(id)
      assert(info.format == "png" && info.width == w && info.height == h)
      assert(info.pixelSum == s, s"pixel sum mismatch for id=$id")
    }
  }

  test("WAV PCM16 encode/decode round-trips sample-exactly") {
    for (id <- Seq(0L, 3L, 63L, 1000L)) {
      val bytes = Multimodal.synthAudioBytes(id)
      assert(MediaCodec.sniffFormat(bytes) == "wav")
      val info = MediaCodec.decodeWav(bytes).get
      val n = 64 + id % 64
      val expSum = (0L until n).map(i => math.abs((id * 7919 + i * 104729) % 20001 - 10000)).sum
      assert(info.sampleRate == 8000 && info.channels == 1)
      assert(info.nSamples == n && info.sumAbs == expSum)
    }
  }

  test("WAV parser walks chunks (extra chunk before data) and rejects non-PCM16") {
    val base = MediaCodec.encodeWavPcm16(8000, Array[Short](100, -200, 300))
    // splice a LIST chunk between fmt and data
    val fmtEnd = 12 + 8 + 16
    val list = Array[Byte]('L', 'I', 'S', 'T', 4, 0, 0, 0, 'I', 'N', 'F', 'O')
    val spliced = base.slice(0, fmtEnd) ++ list ++ base.drop(fmtEnd)
    // fix RIFF length field
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val info = MediaCodec.decodeWav(spliced).get
    assert(info.nSamples == 3 && info.sumAbs == 600)
    // corrupt bits-per-sample → rejected, not misparsed
    val bad = base.clone()
    java.nio.ByteBuffer.wrap(bad).order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(34, 8)
    assert(MediaCodec.decodeWav(bad).isEmpty)
  }

  test("nearest-neighbor resize matches the closed-form resample") {
    val id = 42L
    val bytes = Multimodal.synthImageBytes(id)
    val (w, h, _) = pngSum(id)
    val resized = MediaCodec.resizeNearestPng(bytes, 5, 4).get
    val info = MediaCodec.decodeImage(resized).get
    var exp = 0L
    for (y <- 0 until 4; x <- 0 until 5)
      exp += (id * 31 + (x * w / 5) * 7 + (y * h / 4) * 13) % 256
    assert(info.width == 5 && info.height == 4 && info.pixelSum == exp)
  }

  test("aHash64: closed-form exact, stable under edit, None for garbage") {
    for (id <- Seq(0L, 5L, 42L, 63L)) {
      val bytes = Multimodal.synthImageBytes(id)
      val got = MediaCodec.aHash64(bytes).get
      // closed-form twin: sample the synthesis formula on the 8x8 grid
      val (w, h) = (8 + (id % 9).toInt, 8 + (id % 7).toInt)
      val p = (0 until 64).map { j =>
        val (sx, sy) = ((j % 8) * w / 8, (j / 8) * h / 8)
        ((id * 31 + sx * 7 + sy * 13) % 256).toInt
      }
      val sum = p.map(_.toLong).sum
      val want = (0 until 64).foldLeft(0L) { (acc, j) =>
        if (p(j) * 64L > sum) acc | (1L << j) else acc
      }
      assert(got == want, s"id=$id")
      // a one-pixel edit moves the hash by only a few bits
      val edited = MediaCodec.editPixelPng(bytes, 0, 0, 100).get
      val eh = MediaCodec.aHash64(edited).get
      assert(java.lang.Long.bitCount(got ^ eh) <= 6,
        s"id=$id edit moved ${java.lang.Long.bitCount(got ^ eh)} bits")
    }
    assert(MediaCodec.aHash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(MediaCodec.aHash64(null).isEmpty)
    // edit coordinates wrap modulo the image size
    val b = Multimodal.synthImageBytes(9L) // w=8+0=8? id=9 → w=8, h=10
    val e1 = MediaCodec.editPixelPng(b, 0, 0, 50).get
    val e2 = MediaCodec.editPixelPng(b, 8, 10, 50).get // (8 mod 8, 10 mod 10) = (0,0)
    assert(java.util.Arrays.equals(e1, e2))
  }

  test("sniff + decode reject garbage and truncated payloads") {
    assert(MediaCodec.sniffFormat(Array[Byte](1, 2, 3)) == "unknown")
    assert(MediaCodec.decodeImage("not an image".getBytes).isEmpty)
    assert(MediaCodec.decodeWav("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(MediaCodec.decodeImage(null).isEmpty)
    val png = Multimodal.synthImageBytes(1L)
    assert(MediaCodec.decodeImage(png.slice(0, 20)).isEmpty) // truncated
  }

  test("GVID container: frame round-trip byte-exact, odd lengths pad, " +
      "garbage and truncation rejected") {
    // odd-length frames force the RIFF 2-byte alignment path
    val raw = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6, 7), Array[Byte](9))
    val enc = MediaCodec.encodeGvid(raw)
    assert(MediaCodec.sniffFormat(enc) == "gvid")
    val dec = MediaCodec.decodeGvidFrames(enc).get
    assert(dec.map(_.toSeq) == raw.map(_.toSeq))
    // real PNG frames survive the container untouched and still decode
    val pngs = Seq.tabulate(3)(f =>
      MediaCodec.encodeGrayPng(4, 3, (x, y) => f * 50 + x + y))
    val vdec = MediaCodec.decodeGvidFrames(MediaCodec.encodeGvid(pngs)).get
    assert(vdec.map(_.toSeq) == pngs.map(_.toSeq))
    assert(MediaCodec.decodeImage(vdec(1)).get.pixelSum ==
      MediaCodec.decodeImage(pngs(1)).get.pixelSum)
    // rejection: wrong magic, truncated chunk, WAV is not GVID
    assert(MediaCodec.decodeGvidFrames(Array.fill(40)(0x41.toByte)).isEmpty)
    assert(MediaCodec.decodeGvidFrames(enc.take(17)).isEmpty)
    assert(MediaCodec.decodeGvidFrames(Multimodal.synthAudioBytes(1L)).isEmpty)
    assert(MediaCodec.decodeGvidFrames(null).isEmpty)
  }
}

/** Spark-side plumbing over the real codecs. */
class MultimodalDecodeSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private lazy val ids = {
    _quiet
    spark.range(0, 32).toDF("doc_id")
  }

  test("synthesizeMedia → decodeImageStats: distributed decode is exact") {
    val media = Multimodal.synthesizeMedia(ids, "doc_id")
    val stats = Multimodal.decodeImageStats(media, "doc_id", "image")
      .orderBy(col("doc_id")).collect()
    stats.foreach { case Row(id: Long, fmt: String, w: Int, h: Int, s: Long) =>
      assert(fmt == "png")
      assert(w == 8 + id % 9 && h == 8 + id % 7)
      var exp = 0L
      for (y <- 0 until h; x <- 0 until w) exp += (id * 31 + x * 7 + y * 13) % 256
      assert(s == exp)
    }
  }

  test("decodeAudioStats: duration from real header, null row for bad blob") {
    val media = Multimodal.synthesizeMedia(ids, "doc_id")
      .withColumn("audio",
        when(col("doc_id") === 5, lit("garbage".getBytes)).otherwise(col("audio")))
    val stats = Multimodal.decodeAudioStats(media, "doc_id", "audio")
    val bad = stats.where(col("doc_id") === 5).head()
    assert(bad.isNullAt(1) && bad.isNullAt(4)) // quarantined, not crashed
    val good = stats.where(col("doc_id") === 6).head()
    assert(good.getInt(1) == 8000)
    assert(good.getLong(4) == good.getLong(2) * 1000000L / 8000)
  }

  test("audioVadStats: frame energies, partial tail frame, voiced-run " +
      "segmentation, null row for bad blob") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // 40 samples: 16×0 (silent), 16×1000 (voiced), 8×1000 (voiced tail)
    val a = graft.ops.MediaCodec.encodeWavPcm16(8000,
      Array.fill(16)(0.toShort) ++ Array.fill(24)(1000.toShort))
    // alternating frames: 16×1000, 16×0, 16×1000 → two separate segments
    val b = graft.ops.MediaCodec.encodeWavPcm16(8000,
      Array.fill(16)(1000.toShort) ++ Array.fill(16)(0.toShort) ++
        Array.fill(16)(1000.toShort))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("audio", BinaryType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, a), Row(2L, b),
        Row(3L, "junk".getBytes)), schema)
    val out = Multimodal.audioVadStats(df, "id", "audio",
        frameLen = 16, energyThreshold = 1000000L)
      .collect().map(r => r.getLong(0) -> r).toMap
    // a: frames [0, 16e6, 8e6] → 3 frames, 2 voiced, ONE run, energy 24e6
    assert(out(1L).getLong(1) == 3 && out(1L).getLong(2) == 2 &&
      out(1L).getLong(3) == 1 && out(1L).getLong(4) == 24000000L)
    // b: voiced-silent-voiced → TWO runs
    assert(out(2L).getLong(1) == 3 && out(2L).getLong(2) == 2 &&
      out(2L).getLong(3) == 2 && out(2L).getLong(4) == 32000000L)
    assert(out(3L).isNullAt(1) && out(3L).isNullAt(4))
  }

  test("audioVadStats: multi-channel frames span frameLen sample PERIODS " +
      "(frameLen*channels interleaved positions), energy sums channels") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // STEREO, 24 sample periods (48 interleaved values): periods 0-15
    // have L=1000/R=500, periods 16-23 silent. frameLen=16 periods →
    // 2 frames: [0,16) energy = 16·(1000²+500²) = 20e6 voiced;
    // [16,24) energy 0. Mono framing (16 array positions per frame)
    // would wrongly see 3 frames with the middle one mixing the
    // loud/silent boundary.
    val stereo = graft.ops.MediaCodec.encodeWavPcm16(8000,
      (0 until 16).flatMap(_ => Seq(1000.toShort, 500.toShort)).toArray ++
        Array.fill(16)(0.toShort), channels = 2)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("audio", BinaryType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, stereo)), schema)
    val r = Multimodal.audioVadStats(df, "id", "audio",
      frameLen = 16, energyThreshold = 1000000L).head()
    assert(r.getLong(1) == 2, s"2 frames of 16 periods each: $r")
    assert(r.getLong(2) == 1 && r.getLong(3) == 1)
    assert(r.getLong(4) == 16L * (1000L * 1000 + 500L * 500), s"$r")
    // and decodeWav agrees on the period count for the same blob
    val info = graft.ops.MediaCodec.decodeWav(stereo).get
    assert(info.channels == 2 && info.nSamples == 24)
  }

  test("videoSceneCuts: exact adjacent-frame L1 diffs, short/garbage clips " +
      "emit nothing") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def flat(w: Int, h: Int, v: Int) =
      graft.ops.MediaCodec.encodeGrayPng(w, h, (_, _) => v)
    // 4×4 frames: 0 → 10 (diff 160, cut at ≥100) → 12 (diff 32, no cut)
    val a = graft.ops.MediaCodec.encodeGvid(Seq(flat(4, 4, 0),
      flat(4, 4, 10), flat(4, 4, 12)))
    val single = graft.ops.MediaCodec.encodeGvid(Seq(flat(4, 4, 7)))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("video", BinaryType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, a), Row(2L, single),
        Row(3L, "junk".getBytes)), schema)
    val out = Multimodal.videoSceneCuts(df, "id", "video", threshold = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq((1L, 1L, 160L, true), (1L, 2L, 32L, false)))
  }

  test("sampleVideoFrames: every stride-th frame decoded exactly; " +
      "bad container quarantines to one null row") {
    val media = Multimodal.synthesizeVideo(ids, "doc_id")
      .withColumn("video",
        when(col("doc_id") === 3, lit("not riff".getBytes))
          .otherwise(col("video")))
    val out = Multimodal.sampleVideoFrames(media, "doc_id", "video", stride = 2)
      .collect()
    val bad = out.filter(_.getLong(0) == 3L)
    assert(bad.length == 1 && bad.head.isNullAt(1) && bad.head.isNullAt(5))
    for (r <- out.filter(_.getLong(0) != 3L)) {
      val (id, fi, nf, w, h) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(nf == 3 + id % 4 && fi % 2 == 0 && fi < nf)
      assert(w == 8 + id % 5 && h == 8 + id % 3)
      var exp = 0L
      for (y <- 0 until h; x <- 0 until w)
        exp += (id * 31 + fi * 17 + x * 7 + y * 13) % 256
      assert(r.getLong(5) == exp)
    }
    // sampled frames per good doc: ceil(nf / 2)
    val counts = out.filter(_.getLong(0) != 3L).groupBy(_.getLong(0))
    for ((id, rows) <- counts)
      assert(rows.length == (3 + id % 4 + 1) / 2, s"doc $id")
  }

  test("resizeMedia resizes PNG in place; decodeFeatures dispatches by format") {
    val media = Multimodal.synthesizeMedia(ids.limit(4), "doc_id")
    val resized = Multimodal.resizeMedia(media, "image", 6, 6)
    Multimodal.decodeImageStats(resized, "doc_id", "image").collect().foreach { r =>
      assert(r.getInt(2) == 6 && r.getInt(3) == 6)
    }
    // image features = first pixels/255 — all in [0,1]
    val f = Multimodal.decodeFeatures(media, "doc_id", "image", dim = 4)
      .collect().map(_.getSeq[Float](1))
    assert(f.forall(v => v.size == 4 && v.forall(x => x >= 0f && x <= 1f)))
    // audio features = first samples/32768 — in [-1,1], some negative
    val fa = Multimodal.decodeFeatures(media, "doc_id", "audio", dim = 8)
      .collect().map(_.getSeq[Float](1))
    assert(fa.forall(v => v.forall(x => x >= -1f && x <= 1f)))
  }

  test("imageAHash + hammingPairs: every planted watermark pair recalled; nulls never pair") {
    val media = Multimodal.synthesizeMedia(ids.limit(32), "doc_id")
      .select(col("doc_id"), col("image"))
    val edited = Multimodal.editImage(media, "image", 0, 0, 100)
      .select((col("doc_id") + 5000L).as("doc_id"), col("image"))
    // one quarantined payload: must hash to null and form no pairs
    val junk = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(9999L, Array[Byte](1, 2))),
      new org.apache.spark.sql.types.StructType()
        .add("doc_id", "long").add("image", "binary"))
    val hashes = Multimodal.imageAHash(
      media.unionByName(edited).unionByName(junk), "doc_id", "image")
    assert(hashes.where(col("doc_id") === 9999L).head().isNullAt(1))
    val pairs = graft.ops.Dedup.hammingPairs(hashes, "doc_id", "ahash", 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 32L).foreach { i =>
      assert(pairs.contains((i, i + 5000L)), s"planted pair $i missed")
    }
    assert(!pairs.exists(p => p._1 == 9999L || p._2 == 9999L))
  }
}
