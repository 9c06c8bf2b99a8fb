package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Oracle-checkable slice of the multimodal layer: the binary-column
  * catalog (kind/mime dispatch, blob sizes) — the codec stages themselves
  * are stubbed and covered by MultimodalSpec. */
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

  def queries: Map[String, Q] = Map("m01_media_catalog" -> m01_media_catalog)

  def oracleSql: Map[String, String] = Map(
    "m01_media_catalog" ->
      """SELECT doc_id AS media_id,
        |       CASE (doc_id % 3)::INT WHEN 0 THEN 'image'
        |         WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |       CASE (doc_id % 3)::INT WHEN 0 THEN 'image/jpeg'
        |         WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
        |       octet_length(encode(text))::BIGINT AS n_bytes
        |FROM documents ORDER BY media_id""".stripMargin)
}
