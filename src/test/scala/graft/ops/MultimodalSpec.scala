package graft.ops

import graft.SparkSpec

/** Multimodal plumbing specs: schema contract, determinism, batching shape.
  * The image kernel is a REAL javax.imageio decode (PNG exercised below);
  * audio/video kernels are stubs (no codecs in this container) and what's
  * under test there is the Spark-side plumbing around them.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def pngPixels(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

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

  test("extractImageFeatures really decodes a PNG via javax.imageio") {
    val imgs = Seq(
      (1L, pngBytes(10, 6, 0xffffff)),          // solid white 10×6
      (2L, pngBytes(8, 8, 0x000000)),           // solid black 8×8
      (3L, Array[Byte](1, 2, 3)),               // not an image
      (4L, null: Array[Byte])
    ).toDF("media_id", "payload")
    val out = MultimodalOps.extractImageFeatures(imgs, "payload")
    assert(out.schema.fieldNames.takeRight(4).toSeq ==
      Seq("width", "height", "n_channels", "mean_luma"))
    val rows = out.select("media_id", "width", "height", "n_channels", "mean_luma")
      .collect().map(r => r.getLong(0) -> r).toMap
    val white = rows(1L)
    assert(white.getInt(1) == 10 && white.getInt(2) == 6 && white.getInt(3) == 3)
    assert(math.abs(white.getDouble(4) - 1.0) < 1e-9)
    val black = rows(2L)
    assert(black.getInt(1) == 8 && black.getDouble(4) == 0.0)
    // undecodable / null payloads → null features, rows kept
    assert(rows(3L).isNullAt(1) && rows(4L).isNullAt(1))
  }

  private def wavBytes(frames: Int, sampleRate: Float): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val pcm = new Array[Byte](frames * 2) // 16-bit mono
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audioFrames really parses WAV headers via javax.sound.sampled") {
    val audio = Seq(
      (1L, wavBytes(44100, 44100f)),   // 1 second @ 44.1 kHz
      (2L, wavBytes(8000, 8000f)),     // 1 second @ 8 kHz
      (3L, Array[Byte](9, 9, 9)),      // not audio
      (4L, null: Array[Byte])
    ).toDF("media_id", "payload")
    val out = MultimodalOps.audioFrames(audio, "payload", targetRate = 16000)
      .select("media_id", "frame_count").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    // resampled length = frames * target/source = 16000 for both 1s clips
    assert(out(1L) == Some(16000L) && out(2L) == Some(16000L))
    // undecodable / null payloads → null frame_count, rows kept
    assert(out(3L) == None && out(4L) == None)
  }

  private def u32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def mp4Box(tpe: String, payload: Array[Byte]): Array[Byte] =
    u32(payload.length + 8L) ++ tpe.getBytes("US-ASCII") ++ payload

  test("videoMeta really parses MP4 moov/mvhd duration") {
    // minimal ISO-BMFF: ftyp + moov[mvhd v0 timescale=600 duration=1200]
    val mvhd = mp4Box("mvhd",
      Array[Byte](0, 0, 0, 0) ++ u32(0) ++ u32(0) ++
        u32(600) ++ u32(1200) ++ new Array[Byte](80))
    val mp4 = mp4Box("ftyp", "isom".getBytes ++ u32(512)) ++ mp4Box("moov", mvhd)
    val vids = Seq(
      (1L, mp4),
      (2L, Array[Byte](0, 0, 0, 1)),   // garbage
      (3L, null: Array[Byte])
    ).toDF("media_id", "payload")
    val out = MultimodalOps.videoMeta(vids, "payload")
      .select("media_id", "duration_ms").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out(1L) == Some(2000L)) // 1200 / 600 ticks-per-sec = 2 s
    assert(out(2L) == None && out(3L) == None)
  }

  test("videoMeta handles largesize (size=1) and box-to-EOF (size=0) " +
      "encodings — the standard non-faststart layout") {
    def u64b(v: Long): Array[Byte] = u32(v >> 32) ++ u32(v & 0xffffffffL)
    val mvhd = mp4Box("mvhd",
      Array[Byte](0, 0, 0, 0) ++ u32(0) ++ u32(0) ++
        u32(600) ++ u32(1200) ++ new Array[Byte](80))
    val moov = mp4Box("moov", mvhd)
    // mdat written in LARGESIZE mode (size=1, 64-bit size follows the
    // type) sitting BEFORE moov — the layout a >4 GB clip always has
    val mdatData = new Array[Byte](32)
    val mdatLarge = u32(1L) ++ "mdat".getBytes("US-ASCII") ++
      u64b(16L + mdatData.length) ++ mdatData
    val largeFirst = mp4Box("ftyp", "isom".getBytes ++ u32(512)) ++
      mdatLarge ++ moov
    // moov as the LAST box written with size=0 (extends to EOF)
    val moovToEof = u32(0L) ++ "moov".getBytes("US-ASCII") ++ mvhd
    val eofLast = mp4Box("ftyp", "isom".getBytes ++ u32(512)) ++ moovToEof
    val out = MultimodalOps.videoMeta(
        Seq((1L, largeFirst), (2L, eofLast)).toDF("media_id", "payload"),
        "payload")
      .select("media_id", "duration_ms").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out(1L) == Some(2000L),
      "largesize mdat before moov must not block the moov walk")
    assert(out(2L) == Some(2000L), "size=0 trailing moov must parse")
  }

  test("sampleVideoFrames explodes offsets only for non-null payloads") {
    val out = MultimodalOps.sampleVideoFrames(media, "media_id", "payload",
        everyN = 1)
      .select("media_id", "frame_offset").as[(Long, Long)].collect()
    assert(out.forall(_._2 % 1024 == 0))
    assert(!out.exists(_._1 == 3L))
    assert(out.count(_._1 == 1L) == 2) // 2048 bytes / 1024 stride
  }

  /** Animated GIF with `lumas.size` solid-gray frames (one luma level per
    * frame), written by the stock-JDK GIF ImageWriter via writeToSequence.
    */
  private def animatedGif(w: Int, h: Int, lumas: Seq[Int]): Array[Byte] = {
    import javax.imageio.{ImageIO, ImageTypeSpecifier}
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    writer.prepareWriteSequence(null)
    lumas.foreach { l =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (l << 16) | (l << 8) | l
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val meta = writer.getDefaultImageMetadata(
        ImageTypeSpecifier.createFromRenderedImage(img), param)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), param)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  test("imageDHash is scale-invariant; imageNearDupPairs finds near dups") {
    // a 9×8 block pattern where each pixel IS one dHash cell: the gradient
    // direction per cell pair is fully controlled
    def lum(v: Int) = (v << 16) | (v << 8) | v
    def base(x: Int, y: Int): Int = lum((x * 28) % 256)   // rises along x
    val img9x8 = pngPixels(9, 8)(base)
    // 2× upscale with every cell an exact 2×2 pixel block: area averaging
    // reproduces the identical 9×8 grid → identical hash
    val img18x16 = pngPixels(18, 16)((x, y) => base(x / 2, y / 2))
    // one corner cell brightened: flips ≤2 horizontal comparisons
    val tweaked = pngPixels(9, 8)((x, y) =>
      if (x == 8 && y == 0) lum(0) else base(x, y))
    // reversed gradient: every comparison flips → far away in Hamming
    val reversed = pngPixels(9, 8)((x, y) => base(8 - x, y))
    val imgs = Seq(
      (1L, img9x8), (2L, img18x16), (3L, tweaked), (4L, reversed),
      (5L, Array[Byte](9, 9)), (6L, null: Array[Byte])
    ).toDF("media_id", "payload")

    val hashes = MultimodalOps.imageDHash(imgs, "media_id", "payload")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(hashes(1L).isDefined && hashes(1L) == hashes(2L),
      "2x upscale must hash identically (deterministic area averaging)")
    assert(hashes(5L).isEmpty && hashes(6L).isEmpty, "undecodable → null, row kept")
    val d13 = java.lang.Long.bitCount(hashes(1L).get ^ hashes(3L).get)
    assert(d13 >= 1 && d13 <= 2, s"tweak should flip 1-2 bits, got $d13")
    assert(java.lang.Long.bitCount(hashes(1L).get ^ hashes(4L).get) > 3)

    val pairs = DedupOps.imageNearDupPairs(imgs, "media_id", "payload",
        maxHamming = 2)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "exact perceptual dup missed")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)),
      "near dup within hamming 2 missed")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "reversed gradient is not a near dup")
  }

  private def wavBytes(samples: Array[Short], rate: Float): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val data = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audioEnergyHash is gain/rate-invariant; audioNearDupPairs pairs dups") {
    val n = 6500
    // rising envelope, even amplitudes so halving is exact
    val ramp = Array.tabulate[Short](n)(i => (2 * (i * 14000L / n)).toShort)
    val half = ramp.map(s => (s / 2).toShort)
    val double = Array.tabulate[Short](2 * n)(i => ramp(i / 2)) // 2× rate
    val dipped = ramp.clone()
    // zero one interior window (windows are n/65 samples) → ≤2 bit flips
    val w = n / 65
    for (i <- 30 * w until 31 * w) dipped(i) = 0
    val reversed = ramp.reverse
    val rows = Seq(
      (1L, wavBytes(ramp, 16000f)),
      (2L, wavBytes(half, 16000f)),
      (3L, wavBytes(double, 32000f)),
      (4L, wavBytes(dipped, 16000f)),
      (5L, wavBytes(reversed, 16000f)),
      (6L, Array[Byte](1, 2, 3)),
      (7L, null: Array[Byte])
    ).toDF("media_id", "payload")
    val hashes = MultimodalOps.audioEnergyHash(rows, "media_id", "payload")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(hashes(1L).isDefined)
    assert(hashes(1L) == hashes(2L), "half gain must hash identically")
    assert(hashes(1L) == hashes(3L), "2x sample rate (same waveform) must hash identically")
    assert(hashes(6L).isEmpty && hashes(7L).isEmpty, "undecodable → null, row kept")
    val dDip = java.lang.Long.bitCount(hashes(1L).get ^ hashes(4L).get)
    assert(dDip >= 1 && dDip <= 2, s"one-window dip should flip 1-2 bits, got $dDip")
    assert(java.lang.Long.bitCount(hashes(1L).get ^ hashes(5L).get) > 3)

    val pairs = DedupOps.audioNearDupPairs(rows, "media_id", "payload",
        maxHamming = 2)
      .select("i", "j").as[(Long, Long)].collect().toSet
    for (p <- Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)))
      assert(pairs.contains(p), s"expected near-dup pair $p")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L),
      "reversed envelope is not a near dup")
  }

  test("extractGifFrames really decodes animated-GIF frames via the JDK reader") {
    // 4 frames at distinct gray levels: black, dark, light, white
    val gif = animatedGif(12, 7, Seq(0, 64, 192, 255))
    val vids = Seq(
      (1L, gif),
      (2L, pngBytes(5, 5, 0xffffff)),  // single-frame format → 1 frame
      (3L, Array[Byte](9, 9, 9)),      // undecodable → row kept, null frame
      (4L, null: Array[Byte])          // null → row kept, null frame
    ).toDF("media_id", "payload")
    val out = MultimodalOps.extractGifFrames(vids, "media_id", "payload")
      .select("media_id", "frame_index", "frame_width", "frame_height", "frame_luma")
      .collect()
    val gifFrames = out.filter(_.getLong(0) == 1L).sortBy(_.getInt(1))
    assert(gifFrames.length == 4, s"expected 4 real frames, got ${gifFrames.length}")
    assert(gifFrames.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    assert(gifFrames.forall(r => r.getInt(2) == 12 && r.getInt(3) == 7))
    // luma strictly increases frame to frame (black → white): the DECODED
    // PIXELS are real, not header metadata (GIF palettes quantize, so
    // compare ordering and endpoints, not exact values)
    val lumas = gifFrames.map(_.getDouble(4)).toSeq
    assert(lumas.zip(lumas.tail).forall { case (a, b) => a < b }, lumas.toString)
    assert(lumas.head < 0.05 && lumas.last > 0.95, lumas.toString)
    assert(out.count(_.getLong(0) == 2L) == 1)
    // undecodable/null payloads SURVIVE as one row with null frame columns
    // ("row kept, never a fabricated value") — explode would drop them
    for (id <- Seq(3L, 4L)) {
      val kept = out.filter(_.getLong(0) == id)
      assert(kept.length == 1, s"id $id should survive with null frames")
      assert(kept.head.isNullAt(1) && kept.head.isNullAt(4))
    }
  }

  test("extractGifFrames everyN/maxFrames sample the frame sequence") {
    val gif = animatedGif(6, 6, Seq(0, 32, 64, 96, 128, 160))
    val vids = Seq((1L, gif)).toDF("media_id", "payload")
    val every2 = MultimodalOps.extractGifFrames(vids, "media_id", "payload",
        everyN = 2)
      .select("frame_index").as[Int].collect().sorted
    assert(every2.toSeq == Seq(0, 2, 4))
    val capped = MultimodalOps.extractGifFrames(vids, "media_id", "payload",
        everyN = 1, maxFrames = 2)
      .select("frame_index").as[Int].collect().sorted
    assert(capped.toSeq == Seq(0, 1))
  }
}
