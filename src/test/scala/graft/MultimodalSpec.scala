package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

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

  test("binary content dedup keeps one copy of identical payloads") {
    val dup = media.limit(5).union(media.limit(5).withColumn("media_id", col("media_id") + 1000))
    val out = Multimodal.dedupByContent(dup)
    assert(out.count() == 5)
    assert(out.agg(max("media_id")).head().getLong(0) < 1000L) // kept lowest ids
  }
}
