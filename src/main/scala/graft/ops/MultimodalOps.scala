package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `BinaryType` columns with a typed metadata struct, processed by
  * partition-batched decoders.
  *
  * The DECODE KERNELS ARE STUBS — this container ships no image/audio
  * codecs, so `StubDecoders` computes deterministic fakes from the bytes.
  * Everything around them is the real Spark plumbing a production decoder
  * drops into: schema contract, mapPartitions batching (one decoder init
  * per partition, not per row — the same shape as mapInPandas batches),
  * and partition sizing so a 100 TB binary column streams through
  * fixed-size executor batches instead of materializing.
  */
object MultimodalOps {

  /** Typed metadata carried beside every media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("byte_len", LongType),
    StructField("content_hash", StringType)))

  /** Decoded-image feature row: the contract a real decoder must fill. */
  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("mean_luma", DoubleType)))

  /** ====== STUB DECODERS ======
    * Deterministic fakes standing in for real codecs (no image/audio libs
    * in this container). Each consumes the payload bytes and produces
    * plausible, reproducible values; swap the body for an actual decoder
    * (e.g. TwelveMonkeys/JavaCV) without touching the plumbing.
    */
  object StubDecoders {
    /** STUB: pretend-decode an image header from raw bytes. */
    def imageFeatures(payload: Array[Byte]): (Int, Int, Int, Double) = {
      val h = java.util.Arrays.hashCode(payload)
      val width = 64 + math.abs(h % 1024)
      val height = 64 + math.abs((h >> 10) % 1024)
      val channels = 1 + math.abs(h % 3)
      val luma = (math.abs(h) % 256) / 255.0
      (width, height, channels, luma)
    }

    /** STUB: pretend-resample audio → fixed-rate frame count. */
    def audioFrameCount(payload: Array[Byte], targetRate: Int): Long =
      payload.length.toLong * targetRate / 44100L

    /** STUB: pretend-sample every nth video frame → frame byte offsets. */
    def videoFrameOffsets(payload: Array[Byte], everyN: Int): Seq[Long] =
      payload.indices.by(math.max(everyN, 1) * 1024).map(_.toLong).take(32).toSeq
  }

  /** Wrap a raw binary column with the typed metadata struct — the ingest
    * boundary for any media table. Pure plan rewrite, no shuffle.
    */
  def withMediaMeta(df: DataFrame, payloadCol: String, mediaType: String): DataFrame =
    df.withColumn("meta", struct(
      lit(mediaType).as("media_type"),
      length(col(payloadCol)).cast(LongType).as("byte_len"),
      md5(col(payloadCol)).as("content_hash")))

  /** Partition-batched image feature extraction. mapPartitions (not a
    * per-row UDF) so a real decoder initializes once per partition and
    * processes a streaming iterator — the JVM analog of a mapInPandas
    * batch loop, and the right shape for heavyweight codec state.
    */
  def extractImageFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ imageFeatureSchema.fields)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // real decoder init would happen HERE, once per partition
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val (w, h, c, luma) =
          if (payload == null) (0, 0, 0, 0.0)
          else StubDecoders.imageFeatures(payload)
        // Seq[Any], not Seq(...): Scala would numerically widen the Ints
        // to Double alongside luma and break the row encoder.
        Row.fromSeq(r.toSeq ++ Seq[Any](w, h, c, luma))
      }
    }(enc)
  }

  /** Audio resample metadata over the payload column (stub kernel, real
    * plumbing): narrow, codegen-adjacent, shuffle-free.
    */
  def audioFrames(df: DataFrame, payloadCol: String, targetRate: Int = 16000): DataFrame = {
    val outSchema = df.schema.add("frame_count", LongType)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val n = if (payload == null) 0L
                else StubDecoders.audioFrameCount(payload, targetRate)
        Row.fromSeq(r.toSeq :+ n)
      }
    }(enc)
  }

  /** Video frame sampling → exploded (id, frame_offset) rows. Explode AFTER
    * the narrow decode so the big binary payload never joins or shuffles;
    * only the small offsets table fans out.
    */
  def sampleVideoFrames(df: DataFrame, idCol: String, payloadCol: String,
                        everyN: Int = 30): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_offset", ArrayType(LongType))))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val offs = if (payload == null) Seq.empty[Long]
                   else StubDecoders.videoFrameOffsets(payload, everyN)
        Row(r.get(idIdx), offs)
      }
    }(enc)
      .withColumn("frame_offset", explode(col("frame_offset")))
  }
}
