package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for the LLM-data-pipeline surface: image/audio/video
  * as opaque `binary` columns with typed metadata, plus the decode /
  * feature-extract / resize / frame-sample operators a training pipeline
  * runs over them.
  *
  * The Spark-side plumbing — schema, per-partition batching, operator
  * signatures, frame explosion — is real and tested. The codec layer is a
  * deliberate, clearly-marked STUB (`FakeCodec`): this container ships no
  * image/audio libraries, so "decode" derives deterministic pseudo-features
  * from the bytes. Swap [[MediaCodec]] for a JNI/ONNX-backed implementation
  * in production; everything around it (the expensive part to get right on
  * a cluster: batch shape, partitioning, schema evolution) is unchanged.
  * In PySpark the same operators would be `mapInPandas` pandas UDFs; the
  * Scala analogue used here is `mapPartitions` over batched rows.
  */
object Multimodal {

  /** Media table schema: opaque payload + typed metadata (never decode to
    * inspect width/duration — that's what the metadata struct is for).
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true))), nullable = true)))

  /** Feature extraction: binary -> fixed-dim float vector, one codec call
    * per row, batched per partition (model/codec state initialized once per
    * partition — the executor-singleton pattern).
    */
  def extractFeatures(media: DataFrame, codec: MediaCodec = FakeCodec,
      dim: Int = 16): DataFrame = {
    val c = codec
    val outSchema = StructType(media.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    // positional access, indices resolved driver-side: rows inside chained
    // mapPartitions can be schema-less (EliminateSerialization drops the
    // encoder round-trip between adjacent typed operators)
    val bytesIdx = media.schema.fieldIndex("bytes")
    // per-row codec/model work must not inherit a narrow scan's layout
    // (the shared widenNarrowScan rationale; no-op on multi-split inputs)
    graft.util.Partitions.widenNarrowScan(media).mapPartitions { rows =>
      // per-partition init happens here (real codecs load native state once)
      rows.map { r =>
        val bytes = if (r.isNullAt(bytesIdx)) null
          else r.get(bytesIdx).asInstanceOf[Array[Byte]]
        Row.fromSeq(r.toSeq :+ c.features(bytes, dim).toSeq)
      }
    }(encoder)
  }

  /** Image resize: metadata-validated transform of the payload. Non-images
    * pass through untouched; the codec does the pixel work (STUB here).
    */
  def resizeImages(media: DataFrame, width: Int, height: Int,
      codec: MediaCodec = FakeCodec): DataFrame = {
    val c = codec
    val encoder = org.apache.spark.sql.Encoders.row(media.schema.asInstanceOf[StructType])
    // indices resolved driver-side — see extractFeatures
    val kindIdx = media.schema.fieldIndex("kind")
    val bytesIdx = media.schema.fieldIndex("bytes")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.get(kindIdx) != "image" || r.isNullAt(bytesIdx)) r
        else {
          val resized = c.resize(r.get(bytesIdx).asInstanceOf[Array[Byte]], width, height)
          val meta = r.get(metaIdx).asInstanceOf[Row] // nullable in mediaSchema
          val newMeta =
            if (meta == null) Row(Integer.valueOf(width), Integer.valueOf(height), null, null, null)
            else Row(Integer.valueOf(width), Integer.valueOf(height),
              meta.get(2), meta.get(3), meta.get(4))
          val vals = r.toSeq.toArray
          vals(bytesIdx) = resized
          vals(metaIdx) = newMeta
          Row.fromSeq(vals.toSeq)
        }
      }
    }(encoder)
  }

  /** Video frame sampling: one output row per sampled timestamp — the frame
    * *positions* come from metadata (pure Spark: sequence + explode, no
    * decode), the frame *bytes* from the codec (STUB).
    */
  def sampleFrames(media: DataFrame, everyMs: Long,
      codec: MediaCodec = FakeCodec): DataFrame = {
    val videos = media.where(col("kind") === "video" && col("bytes").isNotNull)
      .withColumn("frame_ms",
        explode(sequence(lit(0L), coalesce(col("meta.duration_ms"), lit(0L)),
          lit(everyMs))))
    val c = codec
    val outSchema = StructType(videos.schema.fields :+
      StructField("frame", BinaryType, nullable = true))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val bytesIdx = videos.schema.fieldIndex("bytes")
    val msIdx = videos.schema.fieldIndex("frame_ms")
    videos.mapPartitions { rows =>
      rows.map { r =>
        val frame = c.frameAt(r.get(bytesIdx).asInstanceOf[Array[Byte]], r.getLong(msIdx))
        Row.fromSeq(r.toSeq :+ frame)
      }
    }(encoder)
  }

  /** Exact duplicate media by payload hash (binary-safe dedup). Null
    * payloads are NOT duplicates of each other — sha2(null) is null, which
    * would otherwise collapse every null-bytes row into one; they get a
    * per-row sentinel key instead.
    */
  def dedupByContent(media: DataFrame): DataFrame =
    Dedup.exact(
      media.withColumn("__content_hash",
        coalesce(sha2(col("bytes"), 256),
          concat(lit("__graft_null_"), col("media_id")))),
      Seq("__content_hash"), "media_id").drop("__content_hash")

  /** Deterministic pixel formula for synthetic images: each channel is a
    * linear function of (image id, x, y) mod 256. Pure integer arithmetic,
    * so a SQL oracle can recompute the exact pixel values the PNG decoder
    * returns — PNG is lossless — without an image library in the loop.
    */
  final case class PixelFormula(
      r: (Long, Long, Long), g: (Long, Long, Long), b: (Long, Long, Long)) {
    private def ch(c: (Long, Long, Long), id: Long, x: Int, y: Int): Int =
      ((id * c._1 + x * c._2 + y * c._3) % 256L).toInt
    /** Packed 0xRRGGBB value for (id, x, y). */
    def rgb(id: Long, x: Int, y: Int): Int =
      (ch(r, id, x, y) << 16) | (ch(g, id, x, y) << 8) | ch(b, id, x, y)
    /** `(id*a + x*b + y*c) % 256` as SQL text, for oracle generation. */
    def channelSql(c: (Long, Long, Long), idSql: String, xSql: String,
        ySql: String): String =
      s"($idSql*${c._1} + ($xSql)*${c._2} + ($ySql)*${c._3}) % 256"
  }

  val DefaultFormula: PixelFormula =
    PixelFormula((7L, 3L, 5L), (11L, 5L, 7L), (13L, 9L, 2L))

  /** One REAL PNG per input id: pixels from [[PixelFormula]], encoded with
    * `javax.imageio` in the executors (mapPartitions — the encoder is
    * per-JVM static state, no driver round-trip). Output follows
    * [[mediaSchema]] with kind = "image".
    */
  def syntheticImagesFor(ids: DataFrame, idCol: String, w: Int, h: Int,
      formula: PixelFormula = DefaultFormula): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(mediaSchema)
    val f = formula
    // the media pipeline HEAD: a narrow ids scan would otherwise encode
    // every PNG in one task and leave the whole downstream chain narrow
    graft.util.Partitions.widenNarrowScan(
      ids.select(col(idCol).cast("long"))).mapPartitions { rows =>
      rows.map { row =>
        val id = row.getLong(0)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, f.rgb(id, x, y)); x += 1 }
          y += 1
        }
        Row(id, "image", ImageIoCodec.encodePng(img),
          Row(Integer.valueOf(w), Integer.valueOf(h), null, null, "png"))
      }
    }(encoder)
  }

  /** Per-grid-cell integer channel sums over DECODED image pixels: the
    * feature-extraction shape of a vision-data pipeline (decode -> pool),
    * with exact integer outputs so the whole pipeline is oracle-checkable.
    * One output row per (image, cell): (idCol, cell_id, sum_r, sum_g,
    * sum_b); image width/height must be divisible by `grid`. Non-image and
    * null-payload rows are skipped. Scan-parallel flatMap — no shuffle.
    */
  def gridChannelStats(media: DataFrame, grid: Int,
      decoder: ImageDecoder = ImageIoCodec, idCol: String = "media_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("cell_id", LongType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val d = decoder
    graft.util.Partitions.widenNarrowScan(
      media.where(col("kind") === "image" && col("bytes").isNotNull)
        .select(col(idCol).cast("long"), col("bytes")))
      .mapPartitions { rows =>
        rows.flatMap { row =>
          val id = row.getLong(0)
          val (w, h, px) = d.decodeRgb(row.get(1).asInstanceOf[Array[Byte]])
          require(w % grid == 0 && h % grid == 0,
            s"gridChannelStats: image ${w}x$h not divisible by grid $grid")
          val cw = w / grid; val chh = h / grid
          val sums = Array.ofDim[Long](grid * grid, 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = px(y * w + x)
              val cell = (y / chh) * grid + (x / cw)
              sums(cell)(0) += (p >> 16) & 0xff
              sums(cell)(1) += (p >> 8) & 0xff
              sums(cell)(2) += p & 0xff
              x += 1
            }
            y += 1
          }
          (0 until grid * grid).iterator.map { c =>
            Row(id, c.toLong, sums(c)(0), sums(c)(1), sums(c)(2))
          }
        }
      }(encoder)
  }

  /** 64-bit difference hash (dHash) over DECODED pixels — the standard
    * perceptual near-dup fingerprint for images: resize to 9x8 (the same
    * floor nearest-neighbor mapping as [[ImageIoCodec.resize]], inlined
    * over the decoded pixels — no PNG re-encode), take the luminance
    * channel-sum per cell, and set bit y*8+x iff lum(x+1, y) > lum(x, y).
    * Re-encodings and mild brightness shifts preserve the hash; band it
    * 4x16 bits for LSH pair generation exactly like SimHash (hamming <= 3
    * pigeonhole recall). Pure integer arithmetic end to end, so a SQL
    * oracle recomputes it from the pixel formula. Output: (idCol, dhash).
    */
  def dhash64(media: DataFrame, decoder: ImageDecoder = ImageIoCodec,
      idCol: String = "media_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val d = decoder
    graft.util.Partitions.widenNarrowScan(
      media.where(col("kind") === "image" && col("bytes").isNotNull)
        .select(col(idCol).cast("long"), col("bytes")))
      .mapPartitions { rows =>
        rows.map { row =>
          val (w, h, px) = d.decodeRgb(row.get(1).asInstanceOf[Array[Byte]])
          def lum(x: Int, y: Int): Int = {
            val p = px(((y * h) / 8 * w) + (x * w) / 9)
            ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
          }
          var hash = 0L
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              if (lum(x + 1, y) > lum(x, y)) hash |= 1L << (y * 8 + x)
              x += 1
            }
            y += 1
          }
          Row(row.getLong(0), hash)
        }
      }(encoder)
  }

  /** Deterministic PCM16 sample formula for synthetic audio — the audio
    * twin of [[PixelFormula]]: positive-operand integer arithmetic only
    * (both engines agree on `%` and `//` for non-negative operands), every
    * third frame (per id) attenuated to |s| <= span/2 so the silence
    * detector exercises both outcomes. PCM16 WAV is lossless, so a SQL
    * oracle recomputes the exact samples the real decoder returns.
    */
  final case class SampleFormula(a: Long, b: Long, span: Int, amp: Int,
      frameSize: Int) {
    def sample(id: Long, i: Int): Int = {
      val base = ((id * a + i.toLong * b) % span).toInt - span / 2
      val loud = ((i / frameSize + id) % 3) != 0
      base * (if (loud) amp else 1)
    }
    /** The same sample as SQL text (`//` = DuckDB integer division). */
    def sampleSql(idSql: String, iSql: String): String =
      s"((($idSql)*$a + ($iSql)*$b) % $span - ${span / 2})" +
        s" * (CASE WHEN ((($iSql) // $frameSize) + ($idSql)) % 3 = 0" +
        s" THEN 1 ELSE $amp END)"
  }

  val DefaultSampleFormula: SampleFormula = SampleFormula(37L, 113L, 81, 50, 160)

  /** One REAL RIFF/WAV clip per input id: samples from [[SampleFormula]],
    * encoded per executor partition. Output follows [[mediaSchema]] with
    * kind = "audio".
    */
  def syntheticAudioFor(ids: DataFrame, idCol: String, nSamples: Int,
      sampleRate: Int = 8000,
      formula: SampleFormula = DefaultSampleFormula): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(mediaSchema)
    val f = formula
    // the audio pipeline HEAD — same widen rationale as syntheticImagesFor
    graft.util.Partitions.widenNarrowScan(
      ids.select(col(idCol).cast("long"))).mapPartitions { rows =>
      rows.map { row =>
        val id = row.getLong(0)
        val samples = Array.tabulate(nSamples)(i => f.sample(id, i).toShort)
        Row(id, "audio", WavCodec.encodePcm16(samples, sampleRate),
          Row(null, null, Integer.valueOf(sampleRate),
            java.lang.Long.valueOf(nSamples.toLong * 1000L / sampleRate), "wav"))
      }
    }(encoder)
  }

  /** Per-frame integer stats over REAL decoded PCM samples — the
    * feature-extraction shape of an audio-data pipeline (decode -> frame ->
    * aggregate): per (clip, frame) sample count, peak |s|, energy as the
    * exact sum of squares (a float RMS would break cross-engine exactness;
    * callers can sqrt/divide downstream), zero crossings, and a silence
    * flag (peak < `silenceThreshold`). Scan-parallel flatMap, no shuffle.
    * The tail partial frame (fewer than `frameSize` samples) is emitted
    * with its true `n_samples`.
    */
  def audioFrameStats(media: DataFrame, frameSize: Int,
      silenceThreshold: Int = 64, idCol: String = "media_id"): DataFrame = {
    require(frameSize > 0, s"frameSize must be positive: $frameSize")
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("frame_id", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("peak", LongType, nullable = false),
      StructField("sum_sq", LongType, nullable = false),
      StructField("zero_crossings", LongType, nullable = false),
      StructField("silent", BooleanType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    graft.util.Partitions.widenNarrowScan(
      media.where(col("kind") === "audio" && col("bytes").isNotNull)
        .select(col(idCol).cast("long"), col("bytes")))
      .mapPartitions { rows =>
        rows.flatMap { row =>
          val id = row.getLong(0)
          val bytes = row.get(1).asInstanceOf[Array[Byte]]
          // fast chunk-walk parser; JDK AudioSystem only for layouts the
          // walker rejects (keeps the hot path free of per-row SPI probes)
          val (_, s) =
            try WavCodec.decodePcm16Fast(bytes)
            catch { case _: IllegalArgumentException =>
              WavCodec.decodePcm16(bytes) }
          val nFrames = (s.length + frameSize - 1) / frameSize
          (0 until nFrames).iterator.map { f =>
            val start = f * frameSize
            val end = math.min(start + frameSize, s.length)
            var peak = 0L; var sumSq = 0L; var zc = 0L
            var i = start
            while (i < end) {
              val v = s(i).toLong
              val a = math.abs(v)
              if (a > peak) peak = a
              sumSq += v * v
              if (i > start && (s(i - 1) < 0) != (s(i) < 0)) zc += 1
              i += 1
            }
            Row(id, f.toLong, (end - start).toLong, peak, sumSq, zc,
              java.lang.Boolean.valueOf(peak < silenceThreshold))
          }
        }
      }(encoder)
  }

  /** Deterministic synthetic media table for tests (bytes = seeded digest
    * stream; metadata consistent with kind).
    */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val bytes = {
        val md = MessageDigest.getInstance("MD5")
        md.digest(s"media|$i".getBytes(StandardCharsets.UTF_8))
      }
      val meta = kind match {
        case "image" => Row(Integer.valueOf(640), Integer.valueOf(480), null, null, "png")
        case "audio" => Row(null, null, Integer.valueOf(16000), java.lang.Long.valueOf(30000L), "wav")
        case _ => Row(Integer.valueOf(1280), Integer.valueOf(720), null, java.lang.Long.valueOf(10000L), "h264")
      }
      Row(i.toLong, kind, bytes, meta)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), mediaSchema)
  }
}

/** Codec contract: the only piece that would touch native image/audio
  * libraries. Implementations must be Serializable and cheap to construct;
  * heavy native state belongs in a lazy per-JVM singleton.
  */
trait MediaCodec extends Serializable {
  def features(bytes: Array[Byte], dim: Int): Array[Float]
  def resize(bytes: Array[Byte], width: Int, height: Int): Array[Byte]
  def frameAt(bytes: Array[Byte], ms: Long): Array[Byte]
}

/** STUB codec — deterministic byte-level fakes (no codecs in this
  * container). `features` hashes the payload into a unit vector (equal
  * payloads -> equal features, so dedup/similarity semantics are real);
  * `resize`/`frameAt` derive tagged digests of (payload, params).
  */
object FakeCodec extends MediaCodec {
  private def digest(parts: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance("MD5")
    parts.foreach(md.update)
    md.digest()
  }

  override def features(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (bytes == null) return Array.fill(dim)(0.0f)
    var d = digest(bytes)
    val v = new Array[Float](dim)
    var norm = 0.0
    var i = 0
    while (i < dim) {
      if (i % 16 == 0 && i > 0) d = digest(d)
      val x = ((d(i % 16) & 0xff) - 127.5) / 127.5
      v(i) = x.toFloat
      norm += x * x
      i += 1
    }
    val inv = if (norm == 0.0) 0.0f else (1.0 / math.sqrt(norm)).toFloat
    i = 0
    while (i < dim) { v(i) *= inv; i += 1 }
    v
  }

  override def resize(bytes: Array[Byte], width: Int, height: Int): Array[Byte] =
    digest(bytes, s"resize|$width|$height".getBytes(StandardCharsets.UTF_8))

  override def frameAt(bytes: Array[Byte], ms: Long): Array[Byte] =
    digest(bytes, s"frame|$ms".getBytes(StandardCharsets.UTF_8))
}

/** Pixel-level decode contract for operators that need real pixels (grid
  * pooling, perceptual hashing). Separate from [[MediaCodec]] so stub codecs
  * don't have to fake a decoder.
  */
trait ImageDecoder extends Serializable {
  /** (width, height, row-major packed 0xRRGGBB pixels). */
  def decodeRgb(bytes: Array[Byte]): (Int, Int, Array[Int])
}

/** REAL image codec on `javax.imageio` (ships with the JDK — zero deps).
  * Decode and resize operate on actual pixels; PNG round-trips losslessly,
  * which is what makes the media pipeline oracle-exact. Video (`frameAt`)
  * stays unsupported: the JDK has no video codec — that one call needs a
  * JNI-backed implementation in production.
  */
object ImageIoCodec extends MediaCodec with ImageDecoder {

  // ImageIO's default scratch-file cache would hit executor-local disk on
  // every encode/decode; images here are in-memory byte arrays
  javax.imageio.ImageIO.setUseCache(false)

  def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def read(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "ImageIoCodec: undecodable image payload")
    img
  }

  override def decodeRgb(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = read(bytes)
    val w = img.getWidth; val h = img.getHeight
    // getRGB normalizes any source layout (indexed, 3BYTE_BGR, ...) to sRGB
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var i = 0
    while (i < px.length) { px(i) &= 0xffffff; i += 1 }
    (w, h, px)
  }

  /** Nearest-neighbor resize with explicit floor mapping
    * `src = (dst * srcDim) / dstDim` — deterministic across JVMs (AWT's
    * Graphics2D scaling depends on rendering-hint defaults; an explicit
    * pixel loop does not) and exactly replicable in SQL integer division.
    */
  override def resize(bytes: Array[Byte], width: Int, height: Int): Array[Byte] = {
    val src = read(bytes)
    val sw = src.getWidth; val sh = src.getHeight
    val dst = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      val sy = (y * sh) / height
      var x = 0
      while (x < width) {
        dst.setRGB(x, y, src.getRGB((x * sw) / width, sy))
        x += 1
      }
      y += 1
    }
    encodePng(dst)
  }

  /** Per-grid-cell channel sums over decoded pixels as an MLP input
    * vector, row-major cell order — integer-valued floats, EXACT while
    * cell sums stay below 2^24 (a 256×256 cell of white pixels is still
    * only 5·10⁷... guard anyway). Shared by [[OnnxMediaCodec]] and its
    * oracle derivation: SQL replays it as `sum(r+g+b) GROUP BY cell`.
    */
  def gridInput(w: Int, h: Int, px: Array[Int], grid: Int): Array[Float] = {
    require(w % grid == 0 && h % grid == 0,
      s"gridInput: image ${w}x$h not divisible by grid $grid")
    val cw = w / grid; val ch = h / grid
    val sums = new Array[Long](grid * grid)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = px(y * w + x)
        sums((y / ch) * grid + (x / cw)) +=
          ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        x += 1
      }
      y += 1
    }
    Array.tabulate(grid * grid) { c =>
      require(sums(c) < (1L << 24),
        s"gridInput: cell sum ${sums(c)} exceeds float-exact range")
      sums(c).toFloat
    }
  }

  /** Mean-luminance features over `dim` vertical strips, scaled to [0, 1].
    * Strip s covers x in [s*w/dim, (s+1)*w/dim); a strip never lands empty
    * because strips <= width is required.
    */
  override def features(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (bytes == null) return Array.fill(dim)(0.0f)
    val (w, h, px) = decodeRgb(bytes)
    require(dim <= w, s"features: $dim strips over width $w would leave empty strips")
    val sums = new Array[Long](dim)
    val counts = new Array[Long](dim)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = px(y * w + x)
        val s = (x * dim) / w
        sums(s) += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        counts(s) += 3
        x += 1
      }
      y += 1
    }
    Array.tabulate(dim)(s => (sums(s).toDouble / (counts(s) * 255.0)).toFloat)
  }

  override def frameAt(bytes: Array[Byte], ms: Long): Array[Byte] =
    throw new UnsupportedOperationException(
      "ImageIoCodec: the JDK ships no video codec — frameAt needs a JNI-backed MediaCodec")
}

/** ONNX-BACKED media codec (r19) — realizes the documented codec seam with
  * the in-repo ONNX executor: `features` = decode real pixels
  * ([[ImageIoCodec.decodeRgb]]) → grid-pool to integer channel sums
  * ([[ImageIoCodec.gridInput]]) → run a REAL ONNX protobuf graph (a
  * MatMul→Add→Relu→MatMul→Add chain parsed by
  * [[graft.search.OnnxLinearModel.parseMlp]] — the same executable subset
  * the encoder-search tier runs). This is exactly where a production
  * vision tower slots in: swap the artifact bytes, keep the operator
  * plumbing ([[Multimodal.extractFeatures]]' mapPartitions batching,
  * schema, partition-once model init) untouched.
  *
  * Exactness contract: with INTEGER-valued inputs (grid sums) and
  * integer-valued weights, every float op in the forward is exact while
  * intermediate magnitudes stay below 2^24 — so outputs are integers a
  * SQL oracle replays with BIGINT arithmetic (the `media_onnx_features`
  * gate does exactly that from the synthetic pixel formula). A real
  * trained tower gives up the hash gate, not the seam.
  *
  * Holds the protobuf BYTES (serializable, broadcast-friendly); the
  * parsed model materializes lazily once per executor instance, the
  * ModelRegistry pattern.
  */
final class OnnxMediaCodec(onnxBytes: Array[Byte], grid: Int)
    extends MediaCodec {
  @transient private lazy val mlp = graft.search.OnnxLinearModel.parseMlp(onnxBytes)

  override def features(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (bytes == null) return Array.fill(dim)(0.0f)
    require(dim == mlp.dim,
      s"OnnxMediaCodec: requested dim $dim != model output dim ${mlp.dim}")
    val (w, h, px) = ImageIoCodec.decodeRgb(bytes)
    mlp.forward(ImageIoCodec.gridInput(w, h, px, grid))
  }

  // pixel transforms stay with the real JDK codec — the ONNX graph is the
  // feature tower, not an image transcoder
  override def resize(bytes: Array[Byte], width: Int, height: Int): Array[Byte] =
    ImageIoCodec.resize(bytes, width, height)
  override def frameAt(bytes: Array[Byte], ms: Long): Array[Byte] =
    ImageIoCodec.frameAt(bytes, ms)
}

/** REAL audio codec on the pure JDK: RIFF/WAV PCM16 mono. Encode is a
  * hand-rolled 44-byte RIFF header + little-endian samples; decode goes
  * through `javax.sound.sampled.AudioSystem` (the JDK's actual WAV parser —
  * header validation, format negotiation), so the decode path is a genuine
  * codec, not a byte-level fake. PCM is lossless: decode(encode(s)) == s
  * exactly, which is what lets SQL oracles recompute sample-level stats.
  * Like [[ImageIoCodec]], this covers what the JDK can: compressed audio
  * (mp3/opus) needs a JNI-backed codec behind the same interface.
  */
object WavCodec {

  def encodePcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataLen)
      .put("WAVE".getBytes(StandardCharsets.US_ASCII))
      .put("fmt ".getBytes(StandardCharsets.US_ASCII))
      .putInt(16).putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits per sample
      .put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Fast decode: direct RIFF chunk walk over the in-memory byte array — no
    * stream, no SPI lookup (`AudioSystem.getAudioInputStream` re-probes the
    * provider registry on EVERY call, which dominated per-clip decode cost at
    * scan scale — audio_frame_stats measured 2.5x the oracle on exactly
    * that). Walks chunks (word-aligned per RIFF), validates the same
    * invariants as the JDK path (RIFF/WAVE magic, PCM16 mono LE `fmt `), and
    * returns bit-identical samples — MultimodalSpec asserts equivalence
    * against [[decodePcm16]], which stays as the reference parser for
    * layouts this walker rejects (e.g. WAVE_FORMAT_EXTENSIBLE).
    */
  def decodePcm16Fast(bytes: Array[Byte]): (Int, Array[Short]) = {
    def le32(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def tag(o: Int): String =
      new String(bytes, o, 4, StandardCharsets.US_ASCII)
    require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      "WavCodec: not a RIFF/WAVE stream")
    var pos = 12
    var sampleRate = -1
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = tag(pos)
      val size = le32(pos + 4)
      require(size >= 0 && pos + 8 + size <= bytes.length,
        s"WavCodec: truncated chunk $id")
      id match {
        case "fmt " =>
          require(size >= 16, "WavCodec: short fmt chunk")
          require(le16(pos + 8) == 1 && le16(pos + 10) == 1 &&
            le16(pos + 22) == 16,
            "WavCodec: unsupported format (need PCM16 mono)")
          sampleRate = le32(pos + 12)
        case "data" =>
          dataOff = pos + 8
          dataLen = size
        case _ => () // skip LIST/fact/etc
      }
      pos += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    require(sampleRate > 0 && dataOff >= 0,
      "WavCodec: missing fmt or data chunk")
    val out = new Array[Short](dataLen / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((bytes(dataOff + 2 * i) & 0xff) |
        (bytes(dataOff + 2 * i + 1) << 8)).toShort
      i += 1
    }
    (sampleRate, out)
  }

  /** (sampleRate, samples). Throws on non-PCM16-mono-LE input — this codec
    * does not resample or downmix.
    */
  def decodePcm16(bytes: Array[Byte]): (Int, Array[Short]) = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        !fmt.isBigEndian, s"WavCodec: unsupported format $fmt")
      val raw = in.readAllBytes()
      val out = new Array[Short](raw.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
        i += 1
      }
      (fmt.getSampleRate.toInt, out)
    } finally in.close()
  }
}
