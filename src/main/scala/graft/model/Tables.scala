package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical schemas + loaders for the driver's testdata star schema
  * (TESTDATA.md) and for the reference's two logical tables (SURVEY §1).
  *
  * In the reference, `images(id, deleted, filepath, modified_at, size,
  * vector, ...)` and `words(word, vector)` live in SQLite
  * (`index_wikimedia.py:56-68`, `rclip_server.py:292-308`); here the
  * equivalents are Parquet snapshots. `embeddings.parquet` plays `images`
  * (vec_id ↔ id, embedding ↔ vector) and a per-label centroid table plays
  * `words` (SURVEY §7.5).
  */
/** Shared filesystem sizing helpers (one driver RPC, never a per-file
  * getFileStatus loop — O(files) RPCs on an object store). Used by
  * [[graft.multimodal.MultimodalOps.readBlobTable]] and
  * [[graft.ingest.Compaction]] so the sizing logic cannot drift. */
object FsUtil {
  def dirBytes(spark: org.apache.spark.sql.SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getContentSummary(p).getLength
  }

  /** ceil(bytes / target), floored at 1. */
  def sizedCount(bytes: Long, targetBytes: Long): Int =
    math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
}

object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events loader normalizes `ts` to TimestampType whatever parquet
    * encoding a testdata generation used — downstream operators assume a
    * tz-aware timestamp (they `cast("double")` for epoch seconds, set
    * watermarks, call `unix_micros`; all illegal or rejected on NTZ):
    *
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; Sessions
    *    set `spark.sql.legacy.parquet.nanosAsLong=true`, the nanos arrive
    *    as LongType, and integer `div` restores micros (a double division
    *    would lose precision above 2^53 nanos; sub-µs truncation is
    *    accepted — Spark timestamps are micros).
    *  - timestamp[us] with no tz: Spark 4 reads TIMESTAMP_NTZ; the cast
    *    to TimestampType re-interprets the wall-clock in the session tz,
    *    which [[graft.Sessions]] pins to UTC — the exact epoch DuckDB's
    *    naive-timestamp read assigns, so oracle parity is unchanged. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    import org.apache.spark.sql.functions.{col, expr}
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

/** Reference `images` row (SURVEY §1.3). */
case class ImageRow(
    id: Long,
    deleted: Option[Boolean],
    filepath: String,
    size: Option[Long],
    vector: Array[Float],
    wikimedia_descr_url: Option[String],
    wikimedia_thumb_url: Option[String])

/** Reference `words` row. */
case class WordRow(word: String, vector: Array[Float])

/** Search result (reference `ImageInfo` + score, `rclip_server.py:40-46`). */
case class ScoredId(id: Long, score: Double)
