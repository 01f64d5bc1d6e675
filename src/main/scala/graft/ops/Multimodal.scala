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
    val spark = media.sparkSession
    val c = codec
    val outSchema = StructType(media.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { rows =>
      // per-partition init happens here (real codecs load native state once)
      rows.map { r =>
        val bytes = if (r.isNullAt(r.fieldIndex("bytes"))) null
          else r.getAs[Array[Byte]]("bytes")
        Row.fromSeq(r.toSeq :+ c.features(bytes, dim).toSeq)
      }
    }(encoder)
  }

  /** Image resize: metadata-validated transform of the payload. Non-images
    * pass through untouched; the codec does the pixel work (STUB here).
    */
  def resizeImages(media: DataFrame, width: Int, height: Int,
      codec: MediaCodec = FakeCodec): DataFrame = {
    val spark = media.sparkSession
    val c = codec
    val encoder = org.apache.spark.sql.Encoders.row(media.schema.asInstanceOf[StructType])
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.getAs[String]("kind") != "image" || r.isNullAt(r.fieldIndex("bytes"))) r
        else {
          val resized = c.resize(r.getAs[Array[Byte]]("bytes"), width, height)
          val metaIdx = r.fieldIndex("meta")
          val meta = r.getStruct(metaIdx) // nullable in mediaSchema
          val newMeta =
            if (meta == null) Row(Integer.valueOf(width), Integer.valueOf(height), null, null, null)
            else Row(Integer.valueOf(width), Integer.valueOf(height),
              meta.get(2), meta.get(3), meta.get(4))
          val vals = r.toSeq.toArray
          vals(r.fieldIndex("bytes")) = resized
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
    val spark = media.sparkSession
    val c = codec
    val outSchema = StructType(videos.schema.fields :+
      StructField("frame", BinaryType, nullable = true))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    videos.mapPartitions { rows =>
      rows.map { r =>
        val frame = c.frameAt(r.getAs[Array[Byte]]("bytes"), r.getAs[Long]("frame_ms"))
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
