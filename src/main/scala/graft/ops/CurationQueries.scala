package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables

/** The composed training-data curation pipeline (builder prompt): the
  * individual operators (quality scoring t02, exact dedup d01, budgeted
  * selection) chained the way a real corpus-curation job runs them —
  * score → dedup → floor-filter → per-language budget.
  *
  * Scale shape: one narrow scoring pass over the scan, then exactly two
  * shuffles — the dedup window, keyed by a 256-bit content digest so the
  * shuffle carries 32 bytes/row instead of the document body (collisions
  * are cryptographically negligible; the oracle partitions by the raw
  * text and must agree), and the per-language ranking window. The
  * per-language budget is a top-N, so the final stage emits at most
  * langs × N rows however large the input is.
  */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  private val PER_LANG_BUDGET = 40

  /** c01: score → exact-dedup (keep min id) → quality floor → top-40 per
    * language by (quality DESC, doc_id). Quality is t02's formula
    * (integer half-up division — engine-divergence-safe). */
  val c01_curation_pipeline: Q = (s, d) => {
    val base = Tables.documents(s, d)
      .selectExpr(
        "doc_id", "lang", "text",
        "size(split(text, ' ')) AS n_words",
        s"${TextQueries.hitExpr(TextQueries.markers.head._2)} AS sw_hits",
        "size(array_distinct(split(text, ' '))) AS n_distinct")
      .selectExpr("doc_id", "lang", "text", "n_words",
        s"${TextQueries.qualityExpr} AS quality")
    val dedupW = Window.partitionBy(col("digest")).orderBy(col("doc_id").asc)
    val deduped = base
      .withColumn("digest", sha2(col("text"), 256))
      .drop("text") // the shuffle below carries the digest, not the body
      .withColumn("rn", row_number().over(dedupW))
      .filter(col("rn") === 1)
      .drop("rn", "digest")
    val kept = deduped.filter(col("quality") >= expr(TextQueries.QUALITY_FLOOR + "D"))
    val budgetW = Window.partitionBy(col("lang"))
      .orderBy(col("quality").desc, col("doc_id").asc)
    kept
      .withColumn("rk", row_number().over(budgetW))
      .filter(col("rk") <= PER_LANG_BUDGET)
      .select(col("doc_id"), col("lang"), col("rk"),
        col("quality"), col("n_words"))
      .orderBy(col("lang"), col("rk"))
  }

  def queries: Map[String, Q] = Map(
    "c01_curation_pipeline" -> c01_curation_pipeline)

  def oracleSql: Map[String, String] = Map(
    "c01_curation_pipeline" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang, text,
         |         len(string_split(text, ' ')) AS n_words,
         |         ${TextQueries.duckHitExpr(TextQueries.markers.head._2)} AS sw_hits,
         |         len(list_distinct(string_split(text, ' '))) AS n_distinct
         |  FROM documents),
         |quality AS (
         |  SELECT doc_id, lang, text, n_words,
         |         ${TextQueries.qualityExprDuck} AS quality
         |  FROM scored),
         |deduped AS (
         |  SELECT * FROM (
         |    SELECT doc_id, lang, n_words, quality,
         |           row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
         |    FROM quality)
         |  WHERE rn = 1),
         |ranked AS (
         |  SELECT doc_id, lang, n_words, quality,
         |         row_number() OVER (PARTITION BY lang
         |                            ORDER BY quality DESC, doc_id ASC) AS rk
         |  FROM deduped WHERE quality >= ${TextQueries.QUALITY_FLOOR})
         |SELECT doc_id, lang, rk::INT AS rk, quality, n_words::INT AS n_words
         |FROM ranked WHERE rk <= $PER_LANG_BUDGET
         |ORDER BY lang, rk""".stripMargin)
}
