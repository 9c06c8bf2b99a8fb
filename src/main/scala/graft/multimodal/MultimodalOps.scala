package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.embed.Embedder

/** Multimodal columns for a training-data pipeline (builder prompt):
  * image/audio/video as opaque `BINARY` columns plus typed metadata, with
  * decode / feature-extract / resize / frame-sample as batched
  * `mapPartitions` stages.
  *
  * The actual codec work is STUBBED — this container has no image/audio
  * libraries — behind [[MediaDecoder]], with [[FakeMediaDecoder]] as a
  * deterministic stand-in. The Spark-side plumbing is real and tested:
  * schema, partition sizing for large blobs, batched iteration shape
  * (decoder init once per partition, records processed in fixed-size
  * batches — the JVM analog of a vectorized-batch UDF), and the media →
  * embedding → ANN hand-off.
  *
  * Scale notes: blob tables are read through [[readBlobTable]], which
  * repartitions by on-disk size so a partition of blobs fits executor
  * memory (file-split planning can't see row widths — decoded media
  * balloons far past the default 128 MB split); decode stages are narrow
  * (no shuffle); frame-sampling multiplies rows and is followed by a
  * repartition to re-balance.
  */
object MultimodalOps {

  final case class MediaMeta(
      width: Int, height: Int, sampleRate: Int, durationMs: Long, mime: String)
  final case class MediaRow(
      media_id: Long, kind: String, content: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      media_id: Long, kind: String, brightness: Double, histogram: Array[Long])
  final case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Codec port. Real deployments plug imageio/ffmpeg here. */
  trait MediaDecoder extends Serializable {
    def decode(kind: String, content: Array[Byte]): Array[Byte] // raw samples
    def resize(content: Array[Byte], w: Int, h: Int): Array[Byte]
  }

  /** Deterministic stub decoder: "decoding" hashes bytes into a stable
    * pseudo-sample buffer; "resizing" truncates/tiles. Marked clearly as
    * the offline stand-in — the pipeline shape is what is under test. */
  object FakeMediaDecoder extends MediaDecoder {
    def decode(kind: String, content: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](256)
      var h = 1125899906842597L
      var i = 0
      while (i < content.length) { h = 31 * h + content(i); i += 1 }
      i = 0
      while (i < out.length) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(i) = (h >>> 56).toByte
        i += 1
      }
      out
    }
    def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val n = math.max(1, math.min(w * h, content.length))
      java.util.Arrays.copyOf(content, n)
    }
  }

  /** Build a deterministic media table over the documents corpus (content
    * = UTF-8 bytes; kind/meta derived from doc_id) — the offline stand-in
    * for a real blob store. */
  def mediaTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.selectExpr(
      "doc_id AS media_id",
      "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind",
      "encode(text, 'UTF-8') AS content",
      """named_struct(
        |  'width',  CAST(16 + doc_id % 64 AS INT),
        |  'height', CAST(16 + doc_id % 48 AS INT),
        |  'sampleRate', CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS INT),
        |  'durationMs', CAST(CASE WHEN doc_id % 3 = 2 THEN 1000 + doc_id * 10 ELSE 0 END AS BIGINT),
        |  'mime', CASE CAST(doc_id % 3 AS INT)
        |    WHEN 0 THEN 'image/jpeg' WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END
        |) AS meta""".stripMargin)
      .as[MediaRow]
  }

  /** Decode + feature-extract in batches. The iterator is consumed in
    * `batchSize` groups with the decoder initialized once per partition —
    * the exact shape a vectorized/batched UDF needs (model loaded once,
    * inputs batched). `batchCounter` (optional accumulator) proves the
    * batching in tests. */
  def decodeAndExtract(
      media: Dataset[MediaRow],
      decoder: MediaDecoder,
      batchSize: Int = 32,
      batchCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val dec = decoder // per-partition init point (e.g. load model here)
      it.grouped(batchSize).flatMap { batch =>
        batchCounter.foreach(_.add(1))
        batch.map { row =>
          val samples = dec.decode(row.kind, row.content)
          val hist = new Array[Long](8)
          var sum = 0.0
          var i = 0
          while (i < samples.length) {
            val v = samples(i) & 0xff
            hist(v >>> 5) += 1
            sum += v
            i += 1
          }
          MediaFeatures(row.media_id, row.kind,
            if (samples.isEmpty) 0.0 else sum / samples.length / 255.0, hist)
        }
      }
    }
  }

  /** Read a blob-column parquet table with partitions sized by on-disk
    * bytes: `ceil(total / targetPartitionBytes)` partitions right after
    * the scan. A per-read knob beats the session-wide
    * `spark.sql.files.maxPartitionBytes` (which is read at plan time and
    * applies to every scan in the query): blob rows decode to many times
    * their stored size, so media tables want much smaller partitions
    * than relational ones in the same job.
    *
    * Total size comes from ONE getContentSummary call on the table root
    * (not a per-file getFileStatus loop — O(files) driver RPCs on an
    * object store). The bound is on the AVERAGE partition: round-robin
    * spreads rows by count, and a partition can never be smaller than
    * its largest single row, so a corpus mixing MB images with GB videos
    * should split by kind first (the one-row floor is a property of any
    * row-based engine, not of this helper). */
  def readBlobTable(spark: SparkSession, path: String,
      targetPartitionBytes: Long = 32L << 20): DataFrame = {
    val df = spark.read.parquet(path)
    val parts = graft.model.FsUtil.sizedCount(
      graft.model.FsUtil.dirBytes(spark, path), targetPartitionBytes)
    df.repartition(parts)
  }

  /** Resize stage: binary→binary with meta update, batched the same way. */
  def resizeAll(media: Dataset[MediaRow], decoder: MediaDecoder,
      w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        r.copy(content = decoder.resize(r.content, w, h),
          meta = r.meta.copy(width = w, height = h))
      }
    }
  }

  /** Frame sampling: one row per sampled frame for video rows (1 fps on
    * the stubbed duration), others pass through untouched as frame 0.
    * Row-multiplying → caller repartitions after. */
  def sampleFrames(media: Dataset[MediaRow], decoder: MediaDecoder,
      maxFrames: Int = 8): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      if (r.kind != "video") Seq(Frame(r.media_id, 0, decoder.decode(r.kind, r.content)))
      else {
        val n = math.max(1, math.min(maxFrames, (r.meta.durationMs / 1000).toInt))
        val samples = decoder.decode(r.kind, r.content)
        (0 until n).map { f =>
          // deterministic per-frame slice of the sample buffer
          val off = (f * 31) % math.max(1, samples.length)
          Frame(r.media_id, f,
            samples.drop(off) ++ samples.take(off))
        }
      }
    }
  }

  /** Media → embedding hand-off: rows become (id, vector) ready for the
    * ANN/dedup operators — the multimodal analog of the reference's
    * image-encode ingest stage (`index_wikimedia.py:145-150`). */
  def embedMedia(media: Dataset[MediaRow], embedder: Embedder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val emb = embedder
      it.map(r => (r.media_id, emb.embedImage(r.content)))
    }.toDF("media_id", "embedding")
  }
}
