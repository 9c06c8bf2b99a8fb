package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Oracle-checkable slices of the ingest pipeline (SURVEY §2.9 I3/I4 —
  * the URL-shaped stages; the IO stages are covered by IngestSpec). URLs
  * are derived deterministically from `documents` so the operators have
  * inputs at every sf. */
object IngestQueries {

  type Q = (SparkSession, String) => DataFrame

  /** i01: extension whitelist + thumbnail-URL derivation
    * (`index_wikimedia.py:118-134`): build a synthetic image URL per doc,
    * keep whitelisted raster extensions, rewrite to the 600px variant. */
  val i01_url_pipeline: Q = (s, d) => {
    Tables.documents(s, d)
      .selectExpr("doc_id", "source",
        """concat(source, '/img_', doc_id,
          |  CASE CAST(doc_id % 4 AS INT)
          |    WHEN 0 THEN '.jpg' WHEN 1 THEN '.PNG'
          |    WHEN 2 THEN '.gif' ELSE '.txt' END) AS url""".stripMargin)
      .withColumn("ext",
        lower(regexp_extract(col("url"), "\\.([A-Za-z0-9]+)$", 1)))
      .filter(col("ext").isin("jpg", "jpeg", "png", "gif"))
      .withColumn("thumb_url",
        regexp_replace(col("url"), "/([^/]+)$", "/600px-$1"))
      .select(col("doc_id"), col("url"), col("ext"), col("thumb_url"))
      .orderBy(col("doc_id"))
  }

  def queries: Map[String, Q] = Map("i01_url_pipeline" -> i01_url_pipeline)

  def oracleSql: Map[String, String] = Map(
    "i01_url_pipeline" ->
      """WITH urls AS (
        |  SELECT doc_id,
        |         source || '/img_' || doc_id ||
        |           (CASE (doc_id % 4)::INT
        |              WHEN 0 THEN '.jpg' WHEN 1 THEN '.PNG'
        |              WHEN 2 THEN '.gif' ELSE '.txt' END) AS url
        |  FROM documents),
        |tagged AS (
        |  SELECT doc_id, url,
        |         lower(regexp_extract(url, '\.([A-Za-z0-9]+)$', 1)) AS ext
        |  FROM urls)
        |SELECT doc_id, url, ext,
        |       regexp_replace(url, '/([^/]+)$', '/600px-\1') AS thumb_url
        |FROM tagged WHERE ext IN ('jpg', 'jpeg', 'png', 'gif')
        |ORDER BY doc_id""".stripMargin)
}
