package graft.multimodal

import graft.SparkSpec
import graft.embed.DeterministicEmbedder
import graft.model.Tables
import graft.vec.VectorOps
import MultimodalOps._
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  lazy val media = mediaTable(Tables.documents(spark, sf))

  test("readBlobTable sizes partitions by on-disk bytes, not row count") {
    val dir = java.nio.file.Files.createTempDirectory("graft-blob-rd").toString
    media.toDF().coalesce(1).write.parquet(s"$dir/t")
    // total must match getContentSummary: every file, incl. _SUCCESS/.crc
    val onDisk = new java.io.File(s"$dir/t").listFiles()
      .filter(_.isFile).map(_.length).sum
    val target = math.max(1L, onDisk / 4)
    val df = MultimodalOps.readBlobTable(spark, s"$dir/t", target)
    val expected = ((onDisk + target - 1) / target).toInt
    assert(df.rdd.getNumPartitions == expected,
      s"onDisk=$onDisk target=$target")
    assert(df.count() == media.count())
  }

  test("media table: binary content + typed metadata schema") {
    val row = media.filter(col("media_id") === 3).head()
    assert(row.kind == "image" || row.kind == "audio" || row.kind == "video")
    assert(row.content.nonEmpty)
    assert(row.meta.mime.contains("/"))
    val kinds = media.groupBy(col("kind")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet == Set("image", "audio", "video"))
  }

  test("decodeAndExtract: batched mapPartitions with per-partition decoder") {
    val acc = spark.sparkContext.longAccumulator("batches")
    val feats = decodeAndExtract(media.repartition(4), FakeMediaDecoder,
      batchSize = 32, batchCounter = Some(acc))
    val n = feats.count()
    assert(n == 500)
    // 500 rows over 4 partitions in batches of 32 → ~16 batches, NOT 500:
    // proves records were processed in groups, not one-by-one
    assert(acc.value >= 16 && acc.value <= 24, s"batches=${acc.value}")
    val f = feats.head()
    assert(f.brightness >= 0.0 && f.brightness <= 1.0)
    assert(f.histogram.length == 8 && f.histogram.sum == 256)
  }

  test("decode is deterministic (stub is a pure function of content)") {
    val a = decodeAndExtract(media, FakeMediaDecoder).orderBy("media_id")
      .collect().map(_.brightness)
    val b = decodeAndExtract(media, FakeMediaDecoder).orderBy("media_id")
      .collect().map(_.brightness)
    assert(a.sameElements(b))
  }

  test("resize updates content and meta dimensions") {
    val resized = resizeAll(media, FakeMediaDecoder, 8, 8)
    val r = resized.head()
    assert(r.meta.width == 8 && r.meta.height == 8)
    assert(r.content.length <= 64)
  }

  test("frame sampling multiplies video rows deterministically") {
    val frames = sampleFrames(media, FakeMediaDecoder, maxFrames = 4)
    val byKind = frames.toDF().join(media.toDF().select(col("media_id"), col("kind")), "media_id")
    val videoFrames = byKind.filter(col("kind") === "video")
      .groupBy(col("media_id")).count().collect().map(_.getLong(1))
    assert(videoFrames.forall(n => n >= 1 && n <= 4))
    assert(videoFrames.exists(_ > 1)) // long durations sample multiple frames
    val nonVideo = byKind.filter(col("kind") =!= "video")
      .groupBy(col("media_id")).count().collect().map(_.getLong(1))
    assert(nonVideo.forall(_ == 1))
  }

  test("embedMedia: media rows land as unit vectors ready for ANN") {
    val emb = embedMedia(media.limit(20), new DeterministicEmbedder(64))
    val vecs = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    assert(vecs.length == 20)
    assert(vecs.forall(v => math.abs(VectorOps.l2norm(v) - 1.0) < 1e-5))
  }
}
