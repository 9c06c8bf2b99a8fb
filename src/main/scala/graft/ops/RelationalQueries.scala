package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Relational operator coverage (SURVEY §2.1–§2.5): scans, filters,
  * projections, aggregations. Each query has a DuckDB oracle twin in
  * [[oracleSql]]; column names and ORDER BY are kept identical on both
  * sides, and float aggregates are rounded so the driver's hash compare is
  * stable (SURVEY §7.4).
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-shaped pricing summary: wide scan → hash aggregate with
    * map-side partial aggregation (Catalyst plans partial_sum/partial_avg
    * before the single shuffle on the 4-value grouping key — the plan that
    * survives 100 TB because the shuffle carries only group rows). */
  /** Averages of exact quantities use integer half-up division
    * (`(2·10⁴·p + q) div (2q)` then /10⁴): `round(p/q, 4)` on a rational
    * is engine-divergent at shortest-repr ties — Spark rounds the decimal
    * repr, DuckDB the binary value (found at sf0.1, SURVEY §7.4). */
  val q01_pricing_summary: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .withColumn("disc4", expr("CAST(round(l_discount * 10000.0D) AS BIGINT)"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        expr("((20000 * CAST(sum(l_quantity) AS BIGINT) + count(1)) div (2 * count(1))) / 10000.0D")
          .as("avg_qty"),
        expr("((2 * sum(disc4) + count(1)) div (2 * count(1))) / 10000.0D")
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Global top-k by a scan expression — Catalyst plans
    * TakeOrderedAndProject (per-partition bounded heap + k-bounded driver
    * merge; never a full sort). The reference's full-sort-then-slice
    * (`rclip_server.py:197,391`) improved for free. */
  val q02_topk_orders: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_orderkey", $"o_custkey", round($"o_totalprice", 2).as("price"))
      .orderBy($"price".desc, $"o_orderkey".asc)
      .limit(25)
  }

  /** LIKE-predicate scan + projection (reference S1/P1,
    * `rclip_server.py:206-211`): prefix-anchored pattern pushes to the
    * Parquet reader as StringStartsWith. */
  val q04_scan_filter_like: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .filter($"source".like("src1%") && $"lang" === "en")
      .select($"doc_id", $"source", $"lang", $"n_chars")
      .orderBy($"doc_id")
  }

  /** Null-tolerant boolean predicate with exact SQL 3-value logic —
    * the reference's `deleted IS NULL OR deleted = false`
    * (`rclip_server.py:210`, P2). The testdata has no nullable boolean, so
    * one is derived deterministically from doc_id before filtering. */
  val q05_null_bool_filter: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .withColumn("deleted",
        when($"doc_id" % 3 === 0, lit(null).cast("boolean"))
          .when($"doc_id" % 3 === 1, lit(true))
          .otherwise(lit(false)))
      .filter($"deleted".isNull || $"deleted" === false)
      .select($"doc_id", $"lang", $"n_chars")
      .orderBy($"doc_id")
  }

  /** DISTINCT on a projection (reference A7 `already_done` set,
    * `index_wikimedia.py:73-77`). */
  val q08_distinct_sources: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d).select($"source").distinct().orderBy($"source")
  }

  def queries: Map[String, Q] = Map(
    "q01_pricing_summary" -> q01_pricing_summary,
    "q02_topk_orders" -> q02_topk_orders,
    "q04_scan_filter_like" -> q04_scan_filter_like,
    "q05_null_bool_filter" -> q05_null_bool_filter,
    "q08_distinct_sources" -> q08_distinct_sources)

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
        | ((20000 * sum(l_quantity)::BIGINT + count(*)) // (2 * count(*))) / 10000.0 AS avg_qty,
        | ((2 * sum(CAST(round(l_discount * 10000.0) AS BIGINT)) + count(*)) // (2 * count(*))) / 10000.0 AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_topk_orders" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice,2) AS price
        |FROM orders ORDER BY price DESC, o_orderkey ASC LIMIT 25""".stripMargin,
    "q04_scan_filter_like" ->
      """SELECT doc_id, source, lang, n_chars FROM documents
        |WHERE source LIKE 'src1%' AND lang = 'en' ORDER BY doc_id""".stripMargin,
    "q05_null_bool_filter" ->
      """WITH flagged AS (
        | SELECT doc_id, lang, n_chars,
        |  CASE WHEN doc_id % 3 = 0 THEN NULL
        |       WHEN doc_id % 3 = 1 THEN true ELSE false END AS deleted
        | FROM documents)
        |SELECT doc_id, lang, n_chars FROM flagged
        |WHERE deleted IS NULL OR deleted = false ORDER BY doc_id""".stripMargin,
    "q08_distinct_sources" ->
      "SELECT DISTINCT source FROM documents ORDER BY source")
}
