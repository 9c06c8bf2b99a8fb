package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Per-group top-N (every analytics engine's "best k per key"): ranking
    * window + rank filter. Catalyst inserts WindowGroupLimit, so each
    * map task keeps only N rows per group BEFORE the shuffle — the
    * per-group analog of q02's TakeOrderedAndProject. */
  val q03_group_topn: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"price".desc, $"o_orderkey".asc)
    Tables.orders(s, d)
      .select($"o_orderkey", $"o_orderpriority",
        round($"o_totalprice", 2).as("price"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .orderBy($"o_orderpriority", $"rk")
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

  /** Aggregate + HAVING (post-aggregation predicate): the filter runs on
    * the aggregated rows after the single group-key shuffle — never on
    * the scan — and partial aggregation still applies map-side.
    *
    * Money is accumulated as integer cents (prices are exact 2-dp
    * values): `round(sum(DOUBLE), 2)` is engine-divergent at
    * shortest-repr ties (Spark rounds the decimal repr, DuckDB the
    * binary value), and a 100 TB double sum exceeds 2⁵³ where every
    * cent is drift; BIGINT cents stay exact to 9.2×10¹⁶ dollars. */
  val q06_having: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .withColumn("cents", expr("CAST(round(o_totalprice * 100.0D) AS BIGINT)"))
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        expr("sum(cents) / 100.0D").as("total_spend"))
      .filter($"n_orders" >= 8)
      .orderBy($"o_custkey")
  }

  /** Conditional-aggregation pivot (CASE-in-SUM): one pass, one shuffle,
    * wide output — the hand-rolled form of `pivot()` that keeps the plan
    * a plain partial+final HashAggregate. Quantities accumulate as
    * BIGINT centi-units (same exact-integer discipline as q06). */
  val q07_case_pivot: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .withColumn("q100", expr("CAST(round(l_quantity * 100.0D) AS BIGINT)"))
      .groupBy($"l_returnflag")
      .agg(
        expr("sum(CASE WHEN l_linestatus = 'F' THEN q100 ELSE 0 END) / 100.0D").as("qty_f"),
        expr("sum(CASE WHEN l_linestatus = 'O' THEN q100 ELSE 0 END) / 100.0D").as("qty_o"),
        count(when($"l_linestatus" === "F", lit(1))).as("n_f"),
        count(when($"l_linestatus" === "O", lit(1))).as("n_o"))
      .orderBy($"l_returnflag")
  }

  /** DISTINCT on a projection (reference A7 `already_done` set,
    * `index_wikimedia.py:73-77`). */
  val q08_distinct_sources: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d).select($"source").distinct().orderBy($"source")
  }

  /** q09: SMALL-QUANTITY REVENUE (TPC-H Q17 shape) — lineitems below
    * 20% of their part's average quantity, the correlated-aggregate
    * shape ("compare each row to its group's statistic"). The
    * correlation is decorrelated by hand the way Catalyst itself would:
    * one per-part aggregate joined back to the fact table. The
    * comparison is cross-multiplied integer cents (5·q_c·cnt < sum_c),
    * so the 0.2·avg threshold never exists as a float.
    *
    * Scale shape: the per-part aggregate is partkey-sized (too big to
    * broadcast at 100 TB) — a SHUFFLE_HASH equi-join on l_partkey
    * co-partitions fact and statistic; output is ONE row. */
  val q09_small_qty_revenue: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .selectExpr("l_partkey", "l_extendedprice",
        "CAST(round(l_quantity * 100.0D) AS BIGINT) AS q_c")
    val stats = li.groupBy(col("l_partkey"))
      .agg(sum(col("q_c")).as("sum_c"), count(lit(1)).as("cnt"))
    li.join(stats.hint("SHUFFLE_HASH"), "l_partkey")
      .filter(col("q_c") * 5 * col("cnt") < col("sum_c"))
      .agg(count(lit(1)).as("n_lineitems"),
        expr("CAST(round(sum(l_extendedprice) * 100.0D) AS BIGINT)")
          .as("rev_cents"))
  }

  /** q10: ORDER-COUNT DISTRIBUTION (TPC-H Q13 shape) — how many
    * customers placed k orders, INCLUDING the zero-order customers an
    * inner join would silently drop (the left-outer + count(non-null)
    * idiom). Two aggregates: per-customer order counts (shuffle-hash
    * join of two key-sized sides), then the k-sized distribution.
    *
    * Scale shape: the order→customer aggregate collapses before the
    * join; the distribution aggregate runs over customer-count rows;
    * the final table is k-sized. */
  val q10_custorder_dist: Q = (s, d) => {
    val perCust = Tables.orders(s, d)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("k"))
    Tables.customer(s, d).select(col("c_custkey"))
      .join(perCust.hint("SHUFFLE_HASH"),
        col("c_custkey") === col("o_custkey"), "left")
      .selectExpr("coalesce(k, 0L) AS c_count")
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** q11: CUSTOMER REVENUE DECILES — the "top 10% drive X%" report:
    * customers ranked by exact order-revenue cents into 10 ntile
    * buckets; per decile n_customers, revenue share and CUMULATIVE
    * share in permille (exact integer division over the cents totals).
    * Cents discipline of r01 (per-value round, BIGINT sums — never a
    * float total at any scale).
    *
    * Scale shape: the corpus collapses to one (custkey, cents) row per
    * customer in a map-side-combinable aggregate BEFORE any window;
    * the ntile/cumulative windows then run over the customer-count
    * table, not the order log — the aggregate-then-rank order that
    * keeps a 100 TB fact table out of every sort. */
  val q11_revenue_deciles: Q = (s, d) => {
    val perCust = Tables.orders(s, d)
      .withColumn("cents",
        expr("CAST(round(o_totalprice * 100.0D) AS BIGINT)"))
      .groupBy(col("o_custkey")).agg(sum(col("cents")).as("cents"))
    val ranked = perCust.withColumn("decile",
      ntile(10).over(Window.orderBy(col("cents").desc,
        col("o_custkey").asc)))
    ranked.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("cents")).as("dc"))
      .withColumn("total", sum(col("dc")).over(Window.partitionBy()))
      .withColumn("cum", sum(col("dc")).over(
        Window.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .selectExpr("CAST(decile AS BIGINT) AS decile", "n_customers",
        "dc AS revenue_cents",
        "CAST(dc * 1000 div total AS BIGINT) AS share_permille",
        "CAST(cum * 1000 div total AS BIGINT) AS cum_permille")
      .orderBy(col("decile"))
  }

  /** q12: SHIPPING-PRIORITY report (the TPC-H Q3 shape) — unshipped
    * revenue per order for one market segment at a cutoff date: the
    * classic dim-filter → fact-join → group → top-k chain. The segment
    * filter prunes customers ~5× and that side BROADCASTS; orders and
    * lineitem carry their date filters down to the parquet scan;
    * the orderkey join is shuffle-hash (both sides filtered
    * fact-sized); revenue is exact cents·percent BIGINT
    * (Σ cents(extprice)·(100 − disc_pct)), so the top-10 ranking has no
    * float ties to diverge on (id tiebreak regardless). */
  val q12_shipping_priority: Q = (s, d) => {
    val cutoff = "1998-07-01"
    val cust = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit(cutoff))
      .selectExpr("o_orderkey", "o_custkey",
        "CAST(year(o_orderdate) * 10000 + month(o_orderdate) * 100 " +
          "+ day(o_orderdate) AS BIGINT) AS odate",
        "o_orderpriority")
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit(cutoff))
      .selectExpr("l_orderkey",
        "CAST(round(l_extendedprice * 100.0D) AS BIGINT) " +
          "* (100 - CAST(round(l_discount * 100.0D) AS BIGINT)) AS rev")
    ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(li.hint("shuffle_hash"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("odate"), col("o_orderpriority"))
      .agg(sum(col("rev")).as("revenue_cp"))
      .orderBy(col("revenue_cp").desc, col("o_orderkey").asc)
      .limit(10)
  }

  def queries: Map[String, Q] = Map(
    "q12_shipping_priority" -> q12_shipping_priority,
    "q11_revenue_deciles" -> q11_revenue_deciles,
    "q09_small_qty_revenue" -> q09_small_qty_revenue,
    "q10_custorder_dist" -> q10_custorder_dist,
    "q01_pricing_summary" -> q01_pricing_summary,
    "q02_topk_orders" -> q02_topk_orders,
    "q03_group_topn" -> q03_group_topn,
    "q04_scan_filter_like" -> q04_scan_filter_like,
    "q05_null_bool_filter" -> q05_null_bool_filter,
    "q06_having" -> q06_having,
    "q07_case_pivot" -> q07_case_pivot,
    "q08_distinct_sources" -> q08_distinct_sources)

  def oracleSql: Map[String, String] = Map(
    // q12: identical segment/date filters and cents·percent arithmetic
    "q12_shipping_priority" ->
      """SELECT o.o_orderkey,
        |       (year(o.o_orderdate) * 10000 + month(o.o_orderdate) * 100
        |        + day(o.o_orderdate))::BIGINT AS odate,
        |       o.o_orderpriority,
        |       sum(CAST(round(l.l_extendedprice * 100.0) AS BIGINT)
        |           * (100 - CAST(round(l.l_discount * 100.0) AS BIGINT))
        |          )::BIGINT AS revenue_cp
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l.l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_cp DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    // q11: identical cents aggregate → ntile → census/cumulative
    "q11_revenue_deciles" ->
      """WITH pc AS (
        |  SELECT o_custkey,
        |         sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents
        |  FROM orders GROUP BY o_custkey),
        |rk AS (
        |  SELECT cents, ntile(10) OVER (ORDER BY cents DESC, o_custkey)
        |           AS decile
        |  FROM pc),
        |dec AS (
        |  SELECT decile, count(*)::BIGINT AS n_customers,
        |         sum(cents)::BIGINT AS dc
        |  FROM rk GROUP BY decile)
        |SELECT decile::BIGINT AS decile, n_customers,
        |       dc AS revenue_cents,
        |       (dc * 1000 // (SELECT sum(dc) FROM dec))::BIGINT
        |         AS share_permille,
        |       (sum(dc) OVER (ORDER BY decile
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        * 1000 // (SELECT sum(dc) FROM dec))::BIGINT
        |         AS cum_permille
        |FROM dec ORDER BY decile""".stripMargin,
    // q09: same decorrelated per-part statistic, same cross-multiplied
    // integer-cents threshold
    "q09_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT l_partkey, l_extendedprice,
        |         CAST(round(l_quantity * 100.0) AS BIGINT) AS q_c
        |  FROM lineitem),
        |stats AS (
        |  SELECT l_partkey, sum(q_c)::BIGINT AS sum_c, count(*) AS cnt
        |  FROM li GROUP BY l_partkey)
        |SELECT count(*)::BIGINT AS n_lineitems,
        |       CAST(round(sum(l_extendedprice) * 100.0) AS BIGINT) AS rev_cents
        |FROM li JOIN stats USING (l_partkey)
        |WHERE q_c * 5 * cnt < sum_c""".stripMargin,
    // q10: same left-outer zero-preserving count distribution
    "q10_custorder_dist" ->
      """WITH pc AS (
        |  SELECT o_custkey, count(*)::BIGINT AS k FROM orders GROUP BY 1)
        |SELECT coalesce(k, 0)::BIGINT AS c_count, count(*)::BIGINT AS custdist
        |FROM customer c LEFT JOIN pc ON pc.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
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
    "q03_group_topn" ->
      """WITH priced AS (
        | SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS price
        | FROM orders),
        |ranked AS (
        | SELECT o_orderkey, o_orderpriority, price,
        |        row_number() OVER (PARTITION BY o_orderpriority
        |                           ORDER BY price DESC, o_orderkey ASC) AS rk
        | FROM priced)
        |SELECT o_orderkey, o_orderpriority, price, rk::INT AS rk
        |FROM ranked WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin,
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
    "q06_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |       sum(CAST(round(o_totalprice * 100.0) AS BIGINT))::BIGINT / 100.0 AS total_spend
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 8
        |ORDER BY o_custkey""".stripMargin,
    "q07_case_pivot" ->
      """SELECT l_returnflag,
        | sum(CASE WHEN l_linestatus = 'F' THEN CAST(round(l_quantity * 100.0) AS BIGINT) ELSE 0 END)::BIGINT / 100.0 AS qty_f,
        | sum(CASE WHEN l_linestatus = 'O' THEN CAST(round(l_quantity * 100.0) AS BIGINT) ELSE 0 END)::BIGINT / 100.0 AS qty_o,
        | count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS n_f,
        | count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS n_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q08_distinct_sources" ->
      "SELECT DISTINCT source FROM documents ORDER BY source")
}
