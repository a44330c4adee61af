package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

class MediaOpsSpec extends AnyFunSuite with SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def media = MediaOps.syntheticFromDocuments(
    Tables.load(spark, dir, "documents"))

  test("synthetic media matches the schema contract with real binary payloads") {
    val m = media
    // compare names + types; nullability is inherited from the source
    assert(m.schema.map(f => (f.name, f.dataType.simpleString)) ===
      MediaOps.mediaSchema.map(f => (f.name, f.dataType.simpleString)))
    val row = m.filter(col("kind") === "image").head()
    assert(row.getAs[Array[Byte]]("bytes").length === 64)
    assert(row.getStruct(3).getString(0) === "fake-image")
  }

  test("extractFeatures adds a fixed-dim vector, preserves rows and partitioning") {
    val m = media.repartition(7)
    val out = MediaOps.extractFeatures(m, new MediaOps.FakeDecoder(16), batchSize = 32)
    assert(out.schema.fieldNames.last === "features")
    assert(out.count() === m.count())
    assert(out.rdd.getNumPartitions === 7)
    val feats = out.select("features").head().getSeq[Float](0)
    assert(feats.length === 16)
    // deterministic: same input → same features
    val again = MediaOps.extractFeatures(m, new MediaOps.FakeDecoder(16))
      .select("media_id", "features").orderBy("media_id").collect()
    val first = out.select("media_id", "features").orderBy("media_id").collect()
    assert(again.toSeq === first.toSeq)
  }

  test("resizeImages rewrites bytes + meta for images only, schema unchanged") {
    val m = media
    val out = MediaOps.resizeImages(m, new MediaOps.FakeDecoder(16), 128, 96)
    assert(out.schema === m.schema)
    assert(out.count() === m.count())
    val img = out.filter(col("kind") === "image").head()
    assert(img.getStruct(3).getInt(1) === 128 && img.getStruct(3).getInt(2) === 96)
    assert(img.getAs[Array[Byte]]("bytes").length < 64) // re-encoded
    // non-images byte-identical to the source
    val srcAudio = m.filter(col("kind") === "audio")
      .select("media_id", "bytes").orderBy("media_id").collect()
    val outAudio = out.filter(col("kind") === "audio")
      .select("media_id", "bytes").orderBy("media_id").collect()
    assert(srcAudio.map(_.getAs[Array[Byte]](1).toSeq).toSeq ===
      outAudio.map(_.getAs[Array[Byte]](1).toSeq).toSeq)
  }

  test("sampleFrames explodes video rows at the requested cadence, passes others through") {
    val m = media
    val sampled = MediaOps.sampleFrames(m, everyMs = 5000)
    val videos = m.filter(col("kind") === "video")
      .select(col("media_id"), col("meta.duration_ms")).collect()
    val expectedVideoFrames = videos.map(r => (r.getInt(1) + 4999) / 5000).sum
    val nonVideo = m.filter(col("kind") =!= "video").count()
    assert(sampled.count() === expectedVideoFrames + nonVideo)
    // non-video rows keep a single frame_ms = 0
    assert(sampled.filter(col("kind") =!= "video" && col("frame_ms") =!= 0).count() === 0)
  }
}
