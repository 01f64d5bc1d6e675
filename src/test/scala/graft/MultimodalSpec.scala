package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.{ImageIoCodec, Multimodal}

/** Multimodal plumbing: schema, batching, frame explosion, binary dedup.
  * Codec outputs are the documented deterministic stubs.
  */
class MultimodalSpec extends SparkTestBase {

  private def media = Multimodal.syntheticMedia(spark, 30)

  test("synthetic media matches the declared schema") {
    assert(media.schema == Multimodal.mediaSchema)
    assert(media.count() == 30)
    assert(media.select("kind").distinct().count() == 3)
  }

  test("feature extraction appends unit-norm vectors, null-safe") {
    val out = Multimodal.extractFeatures(media, dim = 16)
    assert(out.schema.fieldNames.last == "features")
    val feats = out.select("features").collect().map(_.getSeq[Float](0))
    assert(feats.forall(_.length == 16))
    val norms = feats.map(f => math.sqrt(f.map(x => x.toDouble * x).sum))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-5))
    // determinism: same payload -> same features
    val again = Multimodal.extractFeatures(media, dim = 16)
      .select("features").collect().map(_.getSeq[Float](0))
    assert(feats.zip(again).forall { case (a, b) => a == b })
  }

  test("resize touches only images and rewrites metadata") {
    val out = Multimodal.resizeImages(media, 224, 224).collect()
    out.foreach { r =>
      val meta = r.getStruct(r.fieldIndex("meta"))
      if (r.getString(1) == "image") {
        assert(meta.getInt(0) == 224 && meta.getInt(1) == 224)
      } else if (r.getString(1) == "audio") {
        assert(meta.isNullAt(0)) // untouched
      }
    }
  }

  test("frame sampling explodes one row per sampled timestamp") {
    val out = Multimodal.sampleFrames(media, everyMs = 2500)
    // videos have duration 10000ms -> frames at 0,2500,5000,7500,10000 = 5
    val counts = out.groupBy("media_id").count().collect()
    assert(counts.nonEmpty)
    assert(counts.forall(_.getLong(1) == 5L))
    assert(out.columns.contains("frame"))
  }

  test("ImageIoCodec: PNG roundtrip returns the exact formula pixels") {
    val sp = spark
    import sp.implicits._
    val f = Multimodal.DefaultFormula
    val media = Multimodal.syntheticImagesFor(
      Seq(0L, 1L, 7L).toDF("id"), "id", 8, 6, f)
    val rows = media.collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (w, h, px) = ImageIoCodec.decodeRgb(r.getAs[Array[Byte]]("bytes"))
      assert(w == 8 && h == 6)
      for (y <- 0 until h; x <- 0 until w)
        assert(px(y * w + x) == f.rgb(id, x, y), s"pixel ($x,$y) of image $id")
    }
  }

  test("ImageIoCodec: nearest-neighbor resize uses the floor mapping") {
    val sp = spark
    import sp.implicits._
    val f = Multimodal.DefaultFormula
    val media = Multimodal.syntheticImagesFor(Seq(3L).toDF("id"), "id", 12, 12, f)
    val bytes = media.head().getAs[Array[Byte]]("bytes")
    val (w, h, px) = ImageIoCodec.decodeRgb(ImageIoCodec.resize(bytes, 4, 6))
    assert(w == 4 && h == 6)
    for (y <- 0 until h; x <- 0 until w)
      assert(px(y * w + x) == f.rgb(3L, (x * 12) / 4, (y * 12) / 6))
  }

  test("ImageIoCodec: gridChannelStats matches directly-computed cell sums") {
    val sp = spark
    import sp.implicits._
    val f = Multimodal.DefaultFormula
    val media = Multimodal.syntheticImagesFor(Seq(2L, 5L).toDF("id"), "id", 6, 6, f)
    val out = Multimodal.gridChannelStats(media, grid = 3)
      .orderBy("media_id", "cell_id").collect()
    assert(out.length == 2 * 9)
    val expected = for (id <- Seq(2L, 5L); cy <- 0 until 3; cx <- 0 until 3) yield {
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- cy * 2 until cy * 2 + 2; x <- cx * 2 until cx * 2 + 2) {
        val p = f.rgb(id, x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
      }
      (id, (cy * 3 + cx).toLong, sr, sg, sb)
    }
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))).toSeq == expected)
  }

  test("ImageIoCodec: features are per-strip luminance means in [0,1], deterministic") {
    val sp = spark
    import sp.implicits._
    val media = Multimodal.syntheticImagesFor(Seq(4L).toDF("id"), "id", 16, 8)
    val bytes = media.head().getAs[Array[Byte]]("bytes")
    val v1 = ImageIoCodec.features(bytes, 4)
    val v2 = ImageIoCodec.features(bytes, 4)
    assert(v1.length == 4 && v1.sameElements(v2))
    assert(v1.forall(x => x >= 0.0f && x <= 1.0f))
    assert(ImageIoCodec.features(null, 4).forall(_ == 0.0f))
    // hand-check strip 0: x in [0,4), all rows
    val (w, h, px) = ImageIoCodec.decodeRgb(bytes)
    var sum = 0L
    for (y <- 0 until h; x <- 0 until 4) {
      val p = px(y * w + x)
      sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
    }
    assert(math.abs(v1(0) - sum.toDouble / (4 * h * 3 * 255.0)) < 1e-6)
  }

  test("dhash64: matches driver recomputation; stable under mild brightness shift") {
    val sp = spark
    import sp.implicits._
    val media = Multimodal.syntheticImagesFor(Seq(11L, 12L).toDF("id"), "id", 24, 24)
    val got = Multimodal.dhash64(media).orderBy("media_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver-side recomputation from the decoded pixels
    media.collect().foreach { r =>
      val id = r.getLong(0)
      val (w, h, px) = ImageIoCodec.decodeRgb(r.getAs[Array[Byte]]("bytes"))
      def lum(x: Int, y: Int): Int = {
        val p = px(((y * h) / 8) * w + (x * w) / 9)
        ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
      }
      var want = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        if (lum(x + 1, y) > lum(x, y)) want |= 1L << (y * 8 + x)
      assert(got(id) == want, s"image $id")
    }
    // perceptual stability: +10 on every channel (clamped) barely moves the
    // gradient signs -> tiny hamming distance; a different image is far
    def brighten(bytes: Array[Byte]): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val out = new java.awt.image.BufferedImage(img.getWidth, img.getHeight,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val p = img.getRGB(x, y)
        def c(sh: Int) = math.min(((p >> sh) & 0xff) + 10, 255)
        out.setRGB(x, y, (c(16) << 16) | (c(8) << 8) | c(0))
      }
      ImageIoCodec.encodePng(out)
    }
    val bright = media.where(col("media_id") === 11L).collect().map { r =>
      Row(r.getLong(0), r.getString(1), brighten(r.getAs[Array[Byte]]("bytes")), r.getStruct(3))
    }
    val brightDf = spark.createDataFrame(
      spark.sparkContext.parallelize(bright.toSeq, 1), Multimodal.mediaSchema)
    val hb = Multimodal.dhash64(brightDf).head().getLong(1)
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(got(11L), hb) <= 8, s"brightness shift moved ${hamming(got(11L), hb)} bits")
    assert(hamming(got(11L), got(12L)) > 8) // distinct images stay apart
  }

  test("ImageIoCodec: frameAt is unsupported (JDK has no video codec)") {
    intercept[UnsupportedOperationException] {
      ImageIoCodec.frameAt(Array[Byte](1, 2, 3), 0L)
    }
  }

  test("binary content dedup keeps one copy of identical payloads") {
    val dup = media.limit(5).union(media.limit(5).withColumn("media_id", col("media_id") + 1000))
    val out = Multimodal.dedupByContent(dup)
    assert(out.count() == 5)
    assert(out.agg(max("media_id")).head().getLong(0) < 1000L) // kept lowest ids
  }

  test("WavCodec: PCM16 encode -> javax.sound decode roundtrips exactly") {
    import graft.ops.WavCodec
    val samples = Array.tabulate(500)(i =>
      Multimodal.DefaultSampleFormula.sample(3L, i).toShort)
    val (rate, back) = WavCodec.decodePcm16(WavCodec.encodePcm16(samples, 8000))
    assert(rate == 8000)
    assert(back.toSeq == samples.toSeq)
    // stereo / non-PCM16 inputs are rejected, not silently resampled
    intercept[IllegalArgumentException] {
      val bb = java.nio.ByteBuffer.allocate(44 + 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(40).put("WAVE".getBytes).put("fmt ".getBytes)
        .putInt(16).putShort(1).putShort(2) // 2 channels
        .putInt(8000).putInt(32000).putShort(4).putShort(16)
        .put("data".getBytes).putInt(4)
      WavCodec.decodePcm16(bb.array())
    }
  }

  test("WavCodec: fast chunk-walk decode is bit-identical to javax.sound") {
    import graft.ops.WavCodec
    for (id <- 0L until 5L; n <- Seq(1, 159, 500)) {
      val samples = Array.tabulate(n)(i =>
        Multimodal.DefaultSampleFormula.sample(id, i).toShort)
      val wav = WavCodec.encodePcm16(samples, 8000)
      assert(WavCodec.decodePcm16Fast(wav)._1 == WavCodec.decodePcm16(wav)._1)
      assert(WavCodec.decodePcm16Fast(wav)._2.toSeq ==
        WavCodec.decodePcm16(wav)._2.toSeq)
    }
  }

  test("WavCodec: fast decode walks extra + odd-sized chunks like the JDK") {
    import graft.ops.WavCodec
    val samples = Array.tabulate(64)(i => (i * 31 - 990).toShort)
    // hand-build RIFF with a 3-byte (odd, so padded) junk chunk BEFORE fmt,
    // and a LIST chunk between fmt and data — both must be skipped
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(12 + (8 + 4) + (8 + 16) + (8 + 6) + (8 + dataLen))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(bb.capacity - 8).put("WAVE".getBytes)
    bb.put("junk".getBytes).putInt(3).put(Array[Byte](1, 2, 3, 0)) // odd + pad
    bb.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("LIST".getBytes).putInt(6).put(Array[Byte](73, 78, 70, 79, 0, 0))
    bb.put("data".getBytes).putInt(dataLen)
    samples.foreach(bb.putShort)
    val wav = bb.array()
    val (rate, fast) = WavCodec.decodePcm16Fast(wav)
    assert(rate == 8000 && fast.toSeq == samples.toSeq)
    val (jRate, jdk) = WavCodec.decodePcm16(wav)
    assert(jRate == 8000 && jdk.toSeq == samples.toSeq)
    // rejection parity: stereo fmt fails fast too
    intercept[IllegalArgumentException] {
      val st = WavCodec.encodePcm16(samples, 8000).clone()
      st(22) = 2 // channels := 2
      WavCodec.decodePcm16Fast(st)
    }
  }

  test("audioFrameStats: decoded per-frame stats match a direct recompute") {
    val ids = spark.range(0, 7).toDF("media_id")
    val f = Multimodal.DefaultSampleFormula
    val clips = Multimodal.syntheticAudioFor(ids, "media_id", 800)
    val got = Multimodal.audioFrameStats(clips, f.frameSize, 64)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
      .toMap
    assert(got.size == 7 * (800 / f.frameSize))
    for (id <- 0L until 7L; fr <- 0 until 800 / f.frameSize) {
      val s = (fr * f.frameSize until (fr + 1) * f.frameSize)
        .map(i => f.sample(id, i).toLong)
      val peak = s.map(math.abs).max
      val zc = s.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
      val want = (f.frameSize.toLong, peak, s.map(v => v * v).sum, zc.toLong,
        peak < 64)
      assert(got((id, fr.toLong)) == want, s"clip $id frame $fr")
    }
    // the attenuated frames actually exercise the silence flag both ways
    val flags = got.values.map(_._5).toSet
    assert(flags == Set(true, false))
  }

  test("audioFrameStats: tail partial frame carries its true sample count") {
    val ids = spark.range(0, 2).toDF("media_id")
    val clips = Multimodal.syntheticAudioFor(ids, "media_id", 250)
    val rows = Multimodal.audioFrameStats(clips, 160, 64)
      .where(col("media_id") === 0L).orderBy("frame_id").collect()
    assert(rows.map(_.getLong(2)).toSeq == Seq(160L, 90L))
  }

  private def codecFixtureMlp: graft.search.MlpEmbedder = {
    // tiny integer-weight 2-layer chain: 4 grid cells -> 3 hidden -> 2 out
    graft.search.MlpEmbedder(Seq(
      graft.search.MlpLayer(3, 4,
        Array(1f, -1f, 0f, 1f, 0f, 1f, 1f, -1f, -1f, 1f, 1f, 0f),
        Array(5f, -3f, 0f)),
      graft.search.MlpLayer(2, 3,
        Array(2f, -1f, 1f, -2f, 1f, 2f), Array(7f, -7f))))
  }

  test("OnnxMediaCodec: ONNX artifact write -> parse -> execute matches a driver-side forward, distributed") {
    val mlp = codecFixtureMlp
    // the REAL artifact path: protobuf bytes through a file round-trip
    val dir = graft.util.TempDirs.create("onnx_codec_spec")
    val f = java.nio.file.Paths.get(dir, "codec.onnx")
    java.nio.file.Files.write(f, graft.search.OnnxLinearModel.toMlpBytes(mlp))
    val codec = new graft.ops.OnnxMediaCodec(
      java.nio.file.Files.readAllBytes(f), grid = 2)
    val ids = spark.range(0, 40).toDF("media_id")
    val media = Multimodal.syntheticImagesFor(ids, "media_id", 8, 8)
    val got = Multimodal.extractFeatures(media, codec, dim = 2)
      .select(col("media_id"), col("features")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    // driver-side expectation over the same decoded pixels
    media.select(col("media_id"), col("bytes")).collect().foreach { r =>
      val (w, h, px) = graft.ops.ImageIoCodec
        .decodeRgb(r.get(1).asInstanceOf[Array[Byte]])
      val want = mlp.forward(graft.ops.ImageIoCodec.gridInput(w, h, px, 2)).toSeq
      assert(got(r.getLong(0)) == want, s"media ${r.getLong(0)}")
    }
    // the exactness contract: integer inputs x integer weights stay
    // integer-valued through the float forward
    assert(got.values.flatten.forall(v => v == math.rint(v)))
    // null payload -> zero vector (the MediaCodec contract)
    assert(codec.features(null, 2).toSeq == Seq(0f, 0f))
  }
}
