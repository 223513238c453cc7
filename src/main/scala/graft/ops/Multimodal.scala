package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column operators (north-star extension, BASELINE.json): treat
 * image/audio/video payloads as opaque `binary` columns with a typed metadata
 * struct, and run decode / feature-extraction as **batched partition-local**
 * transforms.
 *
 * Decode is REAL here — [[MediaCodec]] carries a complete PNG codec
 * (`javax.imageio`, pure JDK) and a hand-rolled RIFF/PCM16 WAV parser, so
 * [[decodeImageStats]]/[[decodeAudioStats]]/[[resizeMedia]] operate on genuine
 * format bytes and their outputs are oracle-checked end to end (SparkEntry
 * q63/q64: the DuckDB oracle recomputes the decoded statistics in closed form
 * from the synthesis formulas — a single corrupted pixel or sample would break
 * the hash match). Formats the JDK cannot decode (proprietary video codecs)
 * would slot into the same `mapPartitions` shape via JNI/FFI.
 *
 * Scale design: media blobs dominate row size, so operators here
 * (a) never shuffle the blob — metadata-only projections are separate columns
 *     the optimizer can prune the blob away from;
 * (b) repartition by target byte size, not row count (`repartitionForBlobs`);
 * (c) use `mapPartitions` for batch-amortized decoder calls (the Scala
 *     analogue of `mapInPandas` batches), keeping rows in Tungsten format.
 */
object Multimodal {

  /** Metadata carried with every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("bytes", LongType)))

  /**
   * Wrap a table with a media payload: `media: binary` + `media_meta: struct`.
   * In tests the payload is synthesized deterministically from a text column
   * (UTF-8 bytes); in production it would come from the storage layer as-is.
   */
  def attachPayload(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("media", encode(col(srcCol), "UTF-8").cast(BinaryType))
      .withColumn("media_meta", struct(
        lit("fake/raw").as("format"),
        (octet_length(col("media")) % 640).cast("int").as("width"),
        (octet_length(col("media")) % 480).cast("int").as("height"),
        (octet_length(col("media")) % 30 + 1).cast("int").as("n_frames"),
        octet_length(col("media")).cast("long").as("bytes")))

  // ------------------------ deterministic synthesis ------------------------
  // Real format bytes derived from an id — the encode half of the round trip
  // the q63/q64 oracles verify. Formulas are chosen to be exactly replayable
  // in ANSI SQL (small positive integers, no float math).

  /** Real PNG: w=8+id%9, h=8+id%7, pixel(x,y) = (id·31 + x·7 + y·13) mod 256. */
  def synthImageBytes(id: Long): Array[Byte] = {
    val w = (8 + id % 9).toInt
    val h = (8 + id % 7).toInt
    MediaCodec.encodeGrayPng(w, h, (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
  }

  /** Real WAV: 8 kHz mono PCM16, n=64+id%64 samples,
    * sample(i) = (id·7919 + i·104729) mod 20001 − 10000. */
  def synthAudioBytes(id: Long): Array[Byte] = {
    val n = (64 + id % 64).toInt
    MediaCodec.encodeWavPcm16(8000,
      Array.tabulate(n)(i => ((id * 7919 + i.toLong * 104729) % 20001 - 10000).toShort))
  }

  /** Attach real PNG + WAV payload columns (`image`, `audio`) synthesized from
    * a numeric id column. Partition-local encode; nothing shuffles. */
  def synthesizeMedia(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(df.schema(idCol) +:
      Seq(StructField("image", BinaryType), StructField("audio", BinaryType)))
    df.select(col(idCol))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          Row(id, synthImageBytes(id), synthAudioBytes(id))
        }
      }(Encoders.row(outSchema))
      .toDF()
  }

  // ------------------------------ real decode ------------------------------

  /** Decode an image blob column to exact facts: (id, format, width, height,
    * pixel_sum). Undecodable payloads yield nulls (quarantine semantics). */
  def decodeImageStats(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixel_sum", LongType)))
    df.select(col(idCol), col(blobCol))
      .mapPartitions { it =>
        it.map { r =>
          MediaCodec.decodeImage(r.getAs[Array[Byte]](1)) match {
            case Some(i) => Row(r.get(0), i.format, i.width, i.height, i.pixelSum)
            case None => Row(r.get(0), null, null, null, null)
          }
        }
      }(Encoders.row(outSchema))
      .toDF()
  }

  /** Decode a WAV blob column: (id, sample_rate, n_samples, sum_abs,
    * duration_us). Exact integer facts — PCM needs no float math. */
  def decodeAudioStats(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("sample_rate", IntegerType),
      StructField("n_samples", LongType),
      StructField("sum_abs", LongType),
      StructField("duration_us", LongType)))
    df.select(col(idCol), col(blobCol))
      .mapPartitions { it =>
        it.map { r =>
          MediaCodec.decodeWav(r.getAs[Array[Byte]](1)) match {
            case Some(w) => Row(r.get(0), w.sampleRate, w.nSamples, w.sumAbs,
              w.nSamples * 1000000L / w.sampleRate)
            case None => Row(r.get(0), null, null, null, null)
          }
        }
      }(Encoders.row(outSchema))
      .toDF()
  }

  /** Frame-energy voice-activity detection over a WAV blob column — the
    * speech-data triage op (keep clips with enough voiced content, measure
    * how fragmented the speech is) run BEFORE any model touches the audio.
    * The blob parses once per row; frames of `frameLen` sample PERIODS
    * (final partial frame included) score `energy = Σ sample²` summed over
    * ALL channels' samples in the frame — for an n-channel clip a frame
    * covers `frameLen·n` interleaved array positions, so frames always
    * span the same wall-clock duration regardless of channel count (and
    * `energyThreshold` should scale with channels if per-channel loudness
    * is the target). Exact longs, no float window functions; a frame is
    * voiced iff `energy ≥ energyThreshold`. Per clip: total/voiced frame counts,
    * voiced-segment count (maximal voiced runs — the fragmentation
    * signal), and the summed voiced energy. Undecodable blobs yield null
    * stats (kept, not dropped: the caller decides).
    *
    * Scale shape: one mapPartitions pass — genuine per-row imperative
    * decode, [[decodeAudioStats]]'s discipline — emitting five scalars per
    * clip; blobs never shuffle, frames never materialize as rows. */
  def audioVadStats(df: DataFrame, idCol: String, blobCol: String,
      frameLen: Int, energyThreshold: Long): DataFrame = {
    require(frameLen > 0, "frameLen must be positive")
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("n_frames", LongType),
      StructField("n_voiced", LongType),
      StructField("n_segments", LongType),
      StructField("voiced_energy", LongType)))
    df.select(col(idCol), col(blobCol))
      .mapPartitions { it =>
        it.map { r =>
          MediaCodec.decodeWavSamples(r.getAs[Array[Byte]](1)) match {
            case Some((_, channels, samples)) =>
              // frameLen is sample PERIODS: a frame spans frameLen*channels
              // interleaved positions so multi-channel frames keep the same
              // wall-clock length as mono ones
              val step = frameLen * channels
              var f = 0; var nFrames = 0L; var nVoiced = 0L
              var nSegments = 0L; var voicedEnergy = 0L
              var prevVoiced = false
              while (f < samples.length) {
                val end = math.min(f + step, samples.length)
                var e = 0L
                var i = f
                while (i < end) { e += samples(i).toLong * samples(i); i += 1 }
                nFrames += 1
                val voiced = e >= energyThreshold
                if (voiced) {
                  nVoiced += 1
                  voicedEnergy += e
                  if (!prevVoiced) nSegments += 1
                }
                prevVoiced = voiced
                f = end
              }
              Row(r.get(0), nFrames, nVoiced, nSegments, voicedEnergy)
            case None => Row(r.get(0), null, null, null, null)
          }
        }
      }(Encoders.row(outSchema))
      .toDF()
  }

  /** Real RIFF/GVID video: `3 + id%4` PNG frames of `w = 8 + id%5`,
    * `h = 8 + id%3`; frame f's pixel (x,y) =
    * (id·31 + f·17 + x·7 + y·13) mod 256 — closed-form, so the DuckDB
    * oracle recomputes every sampled frame's statistics exactly. */
  def synthVideoBytes(id: Long): Array[Byte] = {
    val w = (8 + id % 5).toInt
    val h = (8 + id % 3).toInt
    val nf = (3 + id % 4).toInt
    MediaCodec.encodeGvid((0 until nf).map(f =>
      MediaCodec.encodeGrayPng(w, h,
        (x, y) => ((id * 31 + f * 17 + x * 7 + y * 13) % 256).toInt)))
  }

  /** Scene-change detection over a GVID blob column — the video-curation
    * triage (find the cut points, count shots, drop static clips) run on
    * raw pixels, no model: each adjacent frame pair scores
    * `diff = Σ |p_f+1 − p_f|` over the gray pixel grid (exact integer; a
    * codec or resample drift anywhere breaks it) and a pair is a CUT iff
    * `diff ≥ threshold`. Emits one row per adjacent pair:
    * (id, frame [the later index, 1-based], diff_sum, is_cut); clips that
    * fail to decode or have fewer than two frames emit nothing (a
    * single-frame clip has no pairs — quarantine undecodables upstream
    * via [[decodeImageStats]] semantics if they must be visible).
    *
    * Scale shape: one mapPartitions decode pass, frames held only two at
    * a time per clip; blobs never shuffle; output is (#frames−1) rows of
    * four scalars per clip. */
  def videoSceneCuts(df: DataFrame, idCol: String, blobCol: String,
      threshold: Long): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame", LongType, nullable = false),
      StructField("diff_sum", LongType, nullable = false),
      StructField("is_cut", BooleanType, nullable = false)))
    df.select(col(idCol), col(blobCol))
      .mapPartitions { it =>
        it.flatMap { r =>
          MediaCodec.decodeGvidFrames(r.getAs[Array[Byte]](1)) match {
            case Some(frames) if frames.length >= 2 =>
              frames.iterator.map(MediaCodec.decodeGrayPixels)
                .sliding(2).zipWithIndex.flatMap {
                  case (Seq(Some((w1, h1, p1)), Some((w2, h2, p2))), i)
                      if w1 == w2 && h1 == h2 =>
                    var d = 0L
                    var j = 0
                    while (j < p1.length) {
                      d += math.abs(p2(j).toLong - p1(j)); j += 1
                    }
                    Iterator.single(
                      Row(r.get(0), (i + 1).toLong, d, d >= threshold))
                  case _ => Iterator.empty
                }
            case _ => Iterator.empty
          }
        }
      }(Encoders.row(outSchema))
      .toDF()
  }

  /** Attach a real GVID payload column (`video`) synthesized from a numeric
    * id column. Partition-local encode; nothing shuffles. */
  def synthesizeVideo(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(df.schema(idCol) +:
      Seq(StructField("video", BinaryType)))
    df.select(col(idCol))
      .mapPartitions { it =>
        it.map { r => Row(r.getLong(0), synthVideoBytes(r.getLong(0))) }
      }(Encoders.row(outSchema))
      .toDF()
  }

  /**
   * Frame sampling + per-frame decode — the video stage of a multimodal
   * ingest pipeline (a training pipeline never decodes every frame; it
   * samples every `stride`-th one and featurizes those): walk the GVID
   * container, keep frames with index ≡ 0 (mod stride), PNG-decode each
   * kept frame to exact facts. One output row per SAMPLED frame:
   * (id, frame_idx, n_frames, width, height, pixel_sum); an undecodable
   * container yields a single all-null quarantine row.
   *
   * Scale shape: the container blob never shuffles — the chunk walk and
   * frame decode run `mapPartitions`-local and only scalar facts leave the
   * scan; un-sampled frames are skipped at the CHUNK level (no PNG decode
   * paid for them).
   */
  def sampleVideoFrames(df: DataFrame, idCol: String, blobCol: String,
      stride: Int): DataFrame = {
    require(stride > 0, "stride must be positive")
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_idx", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixel_sum", LongType)))
    df.select(col(idCol), col(blobCol))
      .mapPartitions { it =>
        it.flatMap { r =>
          MediaCodec.decodeGvidFrames(r.getAs[Array[Byte]](1)) match {
            case Some(fs) =>
              (0 until fs.length by stride).iterator.map { i =>
                MediaCodec.decodeImage(fs(i)) match {
                  case Some(info) =>
                    Row(r.get(0), i, fs.length, info.width, info.height,
                      info.pixelSum)
                  case None => Row(r.get(0), i, fs.length, null, null, null)
                }
              }
            case None => Iterator(Row(r.get(0), null, null, null, null, null))
          }
        }
      }(Encoders.row(outSchema))
      .toDF()
  }

  /** REAL resize: decode → nearest-neighbor resample → re-encode PNG, in
    * place. Non-PNG payloads pass through unchanged. */
  def resizeMedia(df: DataFrame, blobCol: String, w: Int, h: Int): DataFrame = {
    val schema = StructType(df.schema.map {
      case f if f.name == blobCol => f.copy(dataType = BinaryType)
      case f => f
    })
    val blobIdx = df.schema.fieldIndex(blobCol)
    df.mapPartitions { it =>
      it.map { r =>
        val vals = r.toSeq.toArray
        val blob = r.getAs[Array[Byte]](blobIdx)
        vals(blobIdx) = MediaCodec.resizeNearestPng(blob, w, h).getOrElse(blob)
        Row(vals: _*)
      }
    }(Encoders.row(schema)).toDF()
  }

  /** Perceptual hash column: (id, ahash) via [[MediaCodec.aHash64]] — the
    * image analogue of a MinHash signature. Undecodable payloads hash to
    * null (quarantine). Partition-local; blobs never shuffle — only the
    * 8-byte hash rides into the downstream band join. */
  def imageAHash(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol), StructField("ahash", LongType)))
    df.select(col(idCol), col(blobCol))
      .mapPartitions { it =>
        it.map { r =>
          MediaCodec.aHash64(r.getAs[Array[Byte]](1)) match {
            case Some(hv) => Row(r.get(0), hv)
            case None => Row(r.get(0), null)
          }
        }
      }(Encoders.row(outSchema))
      .toDF()
  }

  /** Deterministic single-pixel edit, in place ([[MediaCodec.editPixelPng]]):
    * the planted-near-dup / watermark stamp. Non-PNG payloads pass through. */
  def editImage(df: DataFrame, blobCol: String, x: Int, y: Int,
      delta: Int): DataFrame = {
    val schema = StructType(df.schema.map {
      case f if f.name == blobCol => f.copy(dataType = BinaryType)
      case f => f
    })
    val blobIdx = df.schema.fieldIndex(blobCol)
    df.mapPartitions { it =>
      it.map { r =>
        val vals = r.toSeq.toArray
        val blob = r.getAs[Array[Byte]](blobIdx)
        vals(blobIdx) = MediaCodec.editPixelPng(blob, x, y, delta).getOrElse(blob)
        Row(vals: _*)
      }
    }(Encoders.row(schema)).toDF()
  }

  /**
   * Repartition so each partition holds ≈ `targetBytes` of payload — the blob
   * analogue of `spark.sql.files.maxPartitionBytes`. Prevents 2 GB partition
   * blowups when blobs are MBs each.
   */
  def repartitionForBlobs(df: DataFrame, blobCol: String, targetBytes: Long): DataFrame = {
    val stats = df.agg(sum(octet_length(col(blobCol)).cast("long"))).head()
    val total = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val parts = math.max(1, (total / math.max(1L, targetBytes)).toInt)
    df.repartition(parts)
  }

  /**
   * Generic feature extraction with real-codec dispatch: PNG blobs decode to
   * pixel features, WAV blobs to sample features, anything else falls back to
   * raw-byte features (the honest treatment for formats the JDK can't decode).
   * Batched per-partition; decoder state initializes once per partition — the
   * amortized call shape a JNI/FFI codec needs.
   */
  def decodeFeatures(df: DataFrame, idCol: String, blobCol: String, dim: Int = 8,
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, df.schema(idCol).dataType),
      StructField("features", ArrayType(FloatType))))
    df.select(col(idCol), col(blobCol))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { rows =>
          rows.iterator.map { r =>
            Row(r.get(0), featuresOf(r.getAs[Array[Byte]](1), dim))
          }
        }
      }(Encoders.row(outSchema))
      .toDF()
  }

  private def featuresOf(blob: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    MediaCodec.sniffFormat(blob) match {
      case "png" =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
        if (img != null) {
          val raster = img.getRaster
          val (w, h) = (img.getWidth, img.getHeight)
          var i = 0
          while (i < dim && i < w * h) {
            out(i) = raster.getSample(i % w, i / w, 0) / 255f
            i += 1
          }
        }
      case "wav" =>
        MediaCodec.decodeWav(blob) match {
          case Some(_) =>
            val buf = java.nio.ByteBuffer.wrap(blob)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            buf.position(44) // canonical data offset for our writer
            var i = 0
            while (i < dim && buf.remaining() >= 2) {
              out(i) = buf.getShort / 32768f
              i += 1
            }
          case None => ()
        }
      case _ => // raw-byte fallback: byte n → byte/128 − 1
        var i = 0
        while (i < dim) {
          out(i) = if (blob != null && i < blob.length) blob(i).toFloat / 128f - 1f else 0f
          i += 1
        }
    }
    out
  }

  /**
   * Metadata-contract resize for NON-decodable payloads: rewrite the metadata
   * to the target geometry and truncate the payload to ≤ w·h bytes. Kept for
   * opaque formats; decodable payloads should use [[resizeMedia]], the real
   * resample. Pure per-row expressions: the blob never shuffles.
   */
  def resizeStub(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("media",
        substring(col("media"), 1, w * h))
      .withColumn("media_meta", struct(
        col("media_meta.format"),
        lit(w).as("width"),
        lit(h).as("height"),
        col("media_meta.n_frames"),
        octet_length(col("media")).cast("long").as("bytes")))

  /**
   * Frame sampling plumbing: pick every `stride`-th frame index up to
   * `media_meta.n_frames`. Pure expression — prunes to metadata, never
   * touches the blob.
   */
  def sampleFrameIndexes(df: DataFrame, stride: Int): DataFrame =
    df.withColumn("frame_idx",
      sequence(lit(0), greatest(col("media_meta.n_frames") - 1, lit(0)), lit(stride)))
}
