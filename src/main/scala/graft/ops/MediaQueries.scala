package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Oracle-checkable slice of the multimodal layer: the binary-column
  * catalog (kind/mime dispatch, blob sizes) and the shard-packing
  * manifest — the codec stages themselves are stubbed and covered by
  * MultimodalSpec. */
object MediaQueries {

  type Q = (SparkSession, String) => DataFrame

  /** m01: media catalog over binary content — BINARY column length and
    * typed-metadata derivation agree with the DuckDB BLOB semantics. */
  val m01_media_catalog: Q = (s, d) => {
    Tables.documents(s, d)
      .selectExpr(
        "doc_id AS media_id",
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind",
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/jpeg' WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime",
        "CAST(length(encode(text, 'UTF-8')) AS BIGINT) AS n_bytes")
      .orderBy(col("media_id"))
  }

  /** m02: SHARD-PACKING manifest — the WebDataset-style layout step a
    * multimodal training pipeline runs before the dataloader ever sees a
    * blob: blobs of each kind are packed in id order into fixed-size
    * shard archives, and the manifest records (shard_id, offset_bytes)
    * for every blob — the random-access index sequential tar-style
    * shards need. A blob is assigned to the shard its FIRST byte lands
    * in (prefix-sum div [[SHARD_BYTES]]) — the same deterministic
    * arithmetic on both engines, all BIGINT.
    *
    * Scale shape: one kind-partitioned running-sum window (map-side
    * nothing to combine, but the shuffle carries only (kind, id, bytes)
    * — never the blob body; the actual bytes are written by a later
    * stage that joins this thin manifest back by id). Like p04, a
    * single giant kind would hot-spot its window partition — sub-shard
    * the stream key (kind, id-range) at 100 TB; the manifest arithmetic
    * is associative over the ranges given per-range byte offsets. */
  val SHARD_BYTES = 4096L
  val m02_shard_pack: Q = (s, d) => {
    val w = Window.partitionBy(col("kind")).orderBy(col("media_id"))
    m01_media_catalog(s, d)
      .withColumn("cum", sum(col("n_bytes")).over(w))
      .selectExpr("kind", "media_id", "n_bytes",
        s"CAST((cum - n_bytes) div $SHARD_BYTES AS BIGINT) AS shard_id",
        s"CAST(cum - n_bytes - ((cum - n_bytes) div $SHARD_BYTES) * $SHARD_BYTES AS BIGINT) AS offset_bytes")
      .orderBy(col("kind"), col("media_id"))
  }

  def queries: Map[String, Q] = Map(
    "m01_media_catalog" -> m01_media_catalog,
    "m02_shard_pack" -> m02_shard_pack)

  private val catalogSelect: String =
    """SELECT doc_id AS media_id,
      |       CASE (doc_id % 3)::INT WHEN 0 THEN 'image'
      |         WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |       CASE (doc_id % 3)::INT WHEN 0 THEN 'image/jpeg'
      |         WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
      |       octet_length(encode(text))::BIGINT AS n_bytes
      |FROM documents""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "m01_media_catalog" ->
      s"""$catalogSelect ORDER BY media_id""".stripMargin,
    // m02: DuckDB's window sum widens to HUGEINT — the // arithmetic is
    // exact there too; both outputs cast back to BIGINT
    "m02_shard_pack" ->
      s"""WITH c AS (
         |  SELECT kind, media_id, n_bytes,
         |         sum(n_bytes) OVER (PARTITION BY kind ORDER BY media_id) AS cum
         |  FROM ($catalogSelect))
         |SELECT kind, media_id, n_bytes,
         |       ((cum - n_bytes) // $SHARD_BYTES)::BIGINT AS shard_id,
         |       (cum - n_bytes
         |        - ((cum - n_bytes) // $SHARD_BYTES) * $SHARD_BYTES)::BIGINT AS offset_bytes
         |FROM c ORDER BY kind, media_id""".stripMargin)
}
