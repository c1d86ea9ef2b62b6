package graft.ops

import graft.SparkSpec

/** Multimodal plumbing specs: schema contract, determinism, batching shape.
  * The decode kernels are stubs (no codecs in this container); what's under
  * test is the real Spark-side plumbing around them.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Seq(
    (1L, Array.tabulate[Byte](2048)(_.toByte)),
    (2L, Array.tabulate[Byte](4096)(i => (i * 7).toByte)),
    (3L, null: Array[Byte])
  ).toDF("media_id", "payload")

  test("withMediaMeta attaches the typed metadata struct") {
    val out = MultimodalOps.withMediaMeta(media, "payload", "image")
    assert(out.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq ==
      MultimodalOps.mediaMetaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val m = out.filter($"media_id" === 1L)
      .selectExpr("meta.media_type", "meta.byte_len", "meta.content_hash")
      .as[(String, Long, String)].head()
    assert(m._1 == "image" && m._2 == 2048L && m._3.length == 32)
    // null payload → null byte_len/hash, media_type still set
    val n = MultimodalOps.withMediaMeta(media, "payload", "image")
      .filter($"media_id" === 3L).select("meta.byte_len").head()
    assert(n.isNullAt(0))
  }

  test("extractImageFeatures appends the feature contract, deterministic") {
    def features(df: org.apache.spark.sql.DataFrame) =
      MultimodalOps.extractImageFeatures(df, "payload")
        .select("media_id", "width", "height", "n_channels", "mean_luma")
        .as[(Long, Int, Int, Int, Double)].collect().sortBy(_._1).toSeq
    val a = features(media)
    assert(MultimodalOps.extractImageFeatures(media, "payload")
      .schema.fieldNames.takeRight(4).toSeq ==
      Seq("width", "height", "n_channels", "mean_luma"))
    assert(a == features(media)) // deterministic
    val r = a.head
    assert(r._2 >= 64 && r._4 >= 1)
    assert(a.last == ((3L, 0, 0, 0, 0.0))) // null payload → zeros
  }

  test("audioFrames scales with payload length") {
    val out = MultimodalOps.audioFrames(media, "payload", targetRate = 16000)
      .select("media_id", "frame_count").as[(Long, Long)].collect().toMap
    assert(out(2L) == 4096L * 16000 / 44100)
    assert(out(3L) == 0L)
  }

  test("sampleVideoFrames explodes offsets only for non-null payloads") {
    val out = MultimodalOps.sampleVideoFrames(media, "media_id", "payload",
        everyN = 1)
      .select("media_id", "frame_offset").as[(Long, Long)].collect()
    assert(out.forall(_._2 % 1024 == 0))
    assert(!out.exists(_._1 == 3L))
    assert(out.count(_._1 == 1L) == 2) // 2048 bytes / 1024 stride
  }
}
