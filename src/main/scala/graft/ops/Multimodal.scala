package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing (north-star extension, BASELINE.json): treat
 * image/audio/video payloads as opaque `binary` columns with a typed metadata
 * struct, and run decode / feature-extraction as **batched partition-local**
 * transforms. The Spark-side mechanics — schema, partition sizing, batch shape,
 * null handling — are real and tested; the actual media codecs are STUBBED with a
 * deterministic fake (no image/audio libraries exist in this environment), each
 * clearly marked `STUB`.
 *
 * Scale design: media blobs dominate row size, so operators here
 * (a) never shuffle the blob — metadata-only projections are separate columns
 *     the optimizer can prune the blob away from;
 * (b) repartition by target byte size, not row count (`repartitionForBlobs`);
 * (c) use `mapPartitions` for batch-amortized native-decoder calls (the Scala
 *     analogue of `mapInPandas` batches).
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
   * STUB decode: batched per-partition "decode" producing a deterministic
   * feature vector per blob (first 8 bytes as floats, normalized). A real
   * deployment replaces `decodeBatch` with a JNI/FFI call into an image/audio
   * codec — the batching, schema, and null contract stay identical.
   */
  def decodeFeatures(df: DataFrame, idCol: String, blobCol: String, dim: Int = 8,
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, df.schema(idCol).dataType),
      StructField("features", ArrayType(FloatType))))
    // Dataset.mapPartitions (not df.rdd): rows stay in Tungsten format across
    // the boundary and Catalyst keeps pruning/planning through the operator.
    // The decoder initializes ONCE per partition and consumes fixed-size blob
    // batches — the amortized call shape a JNI/FFI codec needs (per-blob
    // native calls would pay the boundary crossing per row).
    df.select(col(idCol), col(blobCol))
      .mapPartitions { it =>
        val decoder = new StubDecoder(dim) // real codec: open once, close via task listener
        it.grouped(batchSize).flatMap { rows =>
          val feats = decoder.decodeBatch(rows.map(_.getAs[Array[Byte]](1)).toArray)
          rows.iterator.zipWithIndex.map { case (r, i) => Row(r.get(0), feats(i)) }
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF()
  }

  /** STUB decoder — deterministic fake with a real batched interface: byte n →
    * float (byte/128 - 1), padded. A production build swaps the body for a
    * native batch call; signature and lifecycle stay identical. */
  private final class StubDecoder(dim: Int) extends Serializable {
    def decodeBatch(blobs: Array[Array[Byte]]): Array[Array[Float]] =
      blobs.map { blob =>
        val out = new Array[Float](dim)
        var i = 0
        while (i < dim) {
          out(i) = if (blob != null && i < blob.length) blob(i).toFloat / 128f - 1f else 0f
          i += 1
        }
        out
      }
  }

  /**
   * STUB resize: rewrite the metadata to the target geometry and (stub)
   * truncate the payload to ≤ w·h bytes — a real deployment swaps the payload
   * expression for a codec call; the schema contract (same columns, blob stays
   * binary, metadata reflects the target geometry) is the tested part. Pure
   * per-row expressions: the blob never shuffles and nulls pass through.
   */
  def resizeStub(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("media",
        substring(col("media"), 1, w * h)) // STUB: codec call goes here
      .withColumn("media_meta", struct(
        col("media_meta.format"),
        lit(w).as("width"),
        lit(h).as("height"),
        col("media_meta.n_frames"),
        octet_length(col("media")).cast("long").as("bytes")))

  /**
   * Frame sampling plumbing: pick every `stride`-th frame index up to
   * `media_meta.n_frames` (the decode of those frames is the STUB above).
   * Pure expression — prunes to metadata, never touches the blob.
   */
  def sampleFrameIndexes(df: DataFrame, stride: Int): DataFrame =
    df.withColumn("frame_idx",
      sequence(lit(0), greatest(col("media_meta.n_frames") - 1, lit(0)), lit(stride)))
}
