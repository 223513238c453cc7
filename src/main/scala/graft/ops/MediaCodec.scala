package graft.ops

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import javax.imageio.ImageIO

/**
 * Real pure-JVM media codecs for the multimodal column path (north-star
 * extension, BASELINE.json) — no external libraries:
 *
 *  - '''PNG''' encode/decode through `javax.imageio` (java.desktop ships a
 *    complete PNG codec: DEFLATE, scanline filters, chunk CRCs). 8-bit
 *    grayscale round-trips losslessly, so decoded pixel statistics are exact.
 *  - '''WAV/PCM16''' encode/decode via a hand-rolled RIFF parser (the format
 *    is a 44-byte little-endian header + raw samples).
 *
 * Format dispatch is by magic bytes, the way a real ingest pipeline sniffs
 * payloads it did not write. Everything here is deterministic: the same bytes
 * decode to the same statistics on any JVM, which is what lets the DuckDB
 * oracle verify the full encode→decode round trip in closed form (see
 * SparkEntry q63/q64).
 *
 * Scale note: these run partition-local inside `Dataset.mapPartitions`
 * (Multimodal.scala) — the blob never shuffles, and decode cost is linear in
 * payload bytes with zero driver involvement.
 */
object MediaCodec {

  /** Decoded image facts: exact because gray-8 PNG is lossless. */
  final case class ImageInfo(format: String, width: Int, height: Int, pixelSum: Long)

  /** Decoded audio facts for PCM16 WAV. */
  final case class WavInfo(sampleRate: Int, channels: Int, nSamples: Long, sumAbs: Long)

  /** Magic-byte sniff — dispatch the way file(1) does, not by trusting metadata. */
  def sniffFormat(b: Array[Byte]): String =
    if (b == null || b.length < 12) "unknown"
    else if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if (b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "wav"
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'G' && b(9) == 'V' && b(10) == 'I' && b(11) == 'D') "gvid"
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpeg"
    else "unknown"

  // ------------------------------- images --------------------------------

  /** Encode an 8-bit grayscale image to real PNG bytes via ImageIO. */
  def encodeGrayPng(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, pixel(x, y) & 0xff); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream(width * height / 2 + 64)
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Decode any ImageIO-supported payload (PNG/BMP/GIF/JPEG) to exact pixel
    * facts. Luminance sum uses the first band — exact for grayscale sources.
    * Returns None for undecodable bytes (a real pipeline quarantines those). */
  def decodeImage(bytes: Array[Byte]): Option[ImageInfo] = {
    if (bytes == null) return None
    val fmt = sniffFormat(bytes)
    if (fmt != "png" && fmt != "bmp" && fmt != "jpeg") return None
    val img =
      try ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return None
    val raster = img.getRaster
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) { sum += raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    Some(ImageInfo(fmt, img.getWidth, img.getHeight, sum))
  }

  /** Decode an image payload to its raw first-band pixel grid (row-major) —
    * for frame-difference analysis where [[decodeImage]]'s aggregate sum
    * is not enough. */
  def decodeGrayPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes == null) return None
    val fmt = sniffFormat(bytes)
    if (fmt != "png" && fmt != "bmp" && fmt != "jpeg") return None
    val img =
      try ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return None
    val raster = img.getRaster
    val (w, h) = (img.getWidth, img.getHeight)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    Some((w, h, px))
  }

  /** Real nearest-neighbor resize: decode → resample → re-encode PNG.
    * src(x·wIn/wOut, y·hIn/hOut) with floor division — deterministic, so the
    * resized image's statistics stay closed-form checkable. */
  def resizeNearestPng(bytes: Array[Byte], wOut: Int, hOut: Int): Option[Array[Byte]] = {
    if (bytes == null || sniffFormat(bytes) != "png") return None
    val img =
      try ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return None
    val raster = img.getRaster
    val (wIn, hIn) = (img.getWidth, img.getHeight)
    Some(encodeGrayPng(wOut, hOut,
      (x, y) => raster.getSample(x * wIn / wOut, y * hIn / hOut, 0)))
  }

  /** Perceptual average-hash (aHash) of an image: nearest-neighbor sample an
    * 8×8 grid (src(x·w/8, y·h/8), [[resizeNearestPng]]'s floor rule), then
    * bit j = y·8+x is set iff `p_j · 64 > Σp` over the 64 SAMPLED pixels —
    * a strict integer comparison, no floating-point mean, so the hash is
    * exactly recomputable in closed form from the pixel function. Small
    * edits (a watermark, a stamp) move few sampled pixels and shift the sum
    * slightly → few bits flip; unrelated images disagree on ~half the bits.
    * Returns None for undecodable payloads (quarantine semantics). */
  def aHash64(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null) return None
    val fmt = sniffFormat(bytes)
    if (fmt != "png" && fmt != "bmp" && fmt != "jpeg") return None
    val img =
      try ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return None
    val raster = img.getRaster
    val (w, h) = (img.getWidth, img.getHeight)
    val p = new Array[Int](64)
    var sum = 0L
    var j = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val v = raster.getSample(x * w / 8, y * h / 8, 0)
        p(j) = v; sum += v; j += 1; x += 1
      }
      y += 1
    }
    var bits = 0L
    j = 0
    while (j < 64) { if (p(j) * 64L > sum) bits |= (1L << j); j += 1 }
    Some(bits)
  }

  /** Single-pixel edit: decode, add `delta` (mod 256) to the gray value at
    * (x mod w, y mod h), re-encode — the deterministic micro-edit used to
    * plant perceptual near-duplicates (a one-pixel watermark). */
  def editPixelPng(bytes: Array[Byte], x: Int, y: Int, delta: Int): Option[Array[Byte]] = {
    if (bytes == null || sniffFormat(bytes) != "png") return None
    val img =
      try ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return None
    val raster = img.getRaster
    val (w, h) = (img.getWidth, img.getHeight)
    val (ex, ey) = (((x % w) + w) % w, ((y % h) + h) % h)
    Some(encodeGrayPng(w, h, (a, b) =>
      if (a == ex && b == ey) (raster.getSample(a, b, 0) + delta) & 0xff
      else raster.getSample(a, b, 0)))
  }

  // ------------------------------- video ---------------------------------

  /** Encode a frame sequence as a RIFF/GVID container: `RIFF<len>GVID`, then
    * one `frm ` chunk per frame whose payload is that frame's complete PNG
    * bytes, 2-byte aligned like every RIFF chunk. The shape a real AV
    * container has (AVI is RIFF with `movi` chunks) at toy complexity —
    * frame extraction is a genuine chunk walk, not an array slice. */
  def encodeGvid(frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "a GVID container needs at least one frame")
    val payload = frames.map(f => 8 + f.length + (f.length & 1)).sum
    val buf = ByteBuffer.allocate(12 + payload).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + payload)
    buf.put("GVID".getBytes("US-ASCII"))
    frames.foreach { f =>
      buf.put("frm ".getBytes("US-ASCII")).putInt(f.length)
      buf.put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte)
    }
    buf.array()
  }

  /** Walk a GVID container's chunks and return the frame payloads in order;
    * None on anything malformed (wrong magic, truncated chunk, no frames) —
    * quarantine semantics, the [[decodeWav]] discipline. Unknown chunk ids
    * are skipped, the way a forward-compatible RIFF reader must. */
  def decodeGvidFrames(bytes: Array[Byte]): Option[IndexedSeq[Array[Byte]]] = {
    if (bytes == null || sniffFormat(bytes) != "gvid") return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(12) // past RIFF<len>GVID
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    while (buf.remaining() >= 8) {
      val id = new String(Array(buf.get(), buf.get(), buf.get(), buf.get()), "US-ASCII")
      val len = buf.getInt
      if (len < 0 || len > buf.remaining()) return None
      val next = buf.position() + len + (len & 1) // chunks are 2-byte aligned
      if (id == "frm ") {
        val f = new Array[Byte](len)
        buf.get(f)
        frames += f
      }
      buf.position(math.min(next, bytes.length))
    }
    if (frames.nonEmpty) Some(frames.toIndexedSeq) else None
  }

  // ------------------------------- audio ---------------------------------

  /** Encode PCM16 samples (channel-interleaved when `channels` > 1) as a
    * canonical 44-byte-header WAV file. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short],
      channels: Int = 1): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0,
      "samples must interleave a whole number of frames")
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * 2 * channels) // byte rate
      .putShort((2 * channels).toShort) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse a PCM16 WAV: walk RIFF chunks (not a fixed 44-byte assumption —
    * real files carry LIST/fact chunks), then fold the samples. */
  def decodeWav(bytes: Array[Byte]): Option[WavInfo] = {
    if (bytes == null || sniffFormat(bytes) != "wav") return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(12) // past RIFF<len>WAVE
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var nSamples = 0L
    var sumAbs = 0L
    var sawData = false
    while (buf.remaining() >= 8) {
      val id = new String(Array(buf.get(), buf.get(), buf.get(), buf.get()), "US-ASCII")
      val len = buf.getInt
      if (len < 0 || len > buf.remaining()) return None
      val next = buf.position() + len + (len & 1) // chunks are 2-byte aligned
      id match {
        case "fmt " =>
          val audioFormat = buf.getShort
          channels = buf.getShort
          sampleRate = buf.getInt
          buf.getInt; buf.getShort
          bits = buf.getShort
          if (audioFormat != 1 || bits != 16) return None // PCM16 only
        case "data" =>
          if (channels == 0) return None // fmt must precede data
          sawData = true
          var i = 0
          val n = len / 2
          while (i < n) { sumAbs += math.abs(buf.getShort.toLong); i += 1 }
          nSamples += n / channels
        case _ => // skip LIST/fact/etc.
      }
      buf.position(math.min(next, bytes.length))
    }
    if (sawData) Some(WavInfo(sampleRate, channels, nSamples, sumAbs)) else None
  }

  /** Parse a PCM16 WAV to its raw interleaved samples (same RIFF walk as
    * [[decodeWav]]) — for frame-level analysis (VAD, energy segmentation)
    * that aggregate stats can't serve. Returns (sampleRate, channels,
    * interleaved samples): the channel count must ride along or a
    * frame-level consumer cannot convert sample PERIODS to array
    * positions for multi-channel audio. */
  def decodeWavSamples(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    if (bytes == null || sniffFormat(bytes) != "wav") return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(12)
    var sampleRate = 0
    var channels = 0
    val out = scala.collection.mutable.ArrayBuilder.make[Short]
    var sawData = false
    while (buf.remaining() >= 8) {
      val id = new String(Array(buf.get(), buf.get(), buf.get(), buf.get()), "US-ASCII")
      val len = buf.getInt
      if (len < 0 || len > buf.remaining()) return None
      val next = buf.position() + len + (len & 1)
      id match {
        case "fmt " =>
          val audioFormat = buf.getShort
          channels = buf.getShort
          sampleRate = buf.getInt
          buf.getInt; buf.getShort
          val bits = buf.getShort
          if (audioFormat != 1 || bits != 16) return None
        case "data" =>
          if (channels == 0) return None
          sawData = true
          var i = 0
          val n = len / 2
          while (i < n) { out += buf.getShort; i += 1 }
        case _ =>
      }
      buf.position(math.min(next, bytes.length))
    }
    if (sawData) Some((sampleRate, channels, out.result())) else None
  }
}
