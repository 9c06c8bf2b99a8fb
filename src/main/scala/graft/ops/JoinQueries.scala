package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.vec.VectorOps

/** Join coverage (SURVEY §2.3 J1–J4): every join shape the reference
  * implies, in its Spark-native form, plus the shuffle-join aggregate the
  * engine needs at scale.
  *
  * Broadcast discipline: dimension tables (region/nation/customer, the
  * top-k result) are broadcast — the probe side streams, zero shuffle.
  * Fact⋈fact (lineitem⋈orders) shuffles on the join key with AQE free to
  * re-plan; at 100 TB that is the intended sort-merge shape.
  */
object JoinQueries {

  type Q = (SparkSession, String) => DataFrame

  /** J1: score→metadata join. The reference maps top-k (idx,score) back to
    * image metadata positionally (`rclip_server.py:392`); relationally
    * that is top-k ⋈ metadata by id. The k-row side is broadcast — the
    * metadata scan streams past it with no shuffle. */
  val j01_score_metadata_join: Q = (s, d) => {
    val topk = Tables.embeddings(s, d)
      .select(col("vec_id"),
        round(VectorOps.dotQueryNative(col("embedding"), VectorQueries.flagshipVec), 4)
          .as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(50)
    Tables.documents(s, d)
      .join(broadcast(topk), col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("score"), col("lang"), col("source"))
      .orderBy(col("score").desc, col("doc_id").asc)
  }

  /** Star-schema join: orders ⋈ customer ⋈ nation ⋈ region, revenue per
    * region. All three dims broadcast; one shuffle for the final group. */
  val j02_star_join_agg: Q = (s, d) => {
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"))
  }

  /** J4/I2: ingest dedup anti-join — rows whose key is NOT already
    * indexed (`index_wikimedia.py:73-77,190-195`): orders that have no
    * lineitem. NOT EXISTS semantics exactly (null-safe, unlike NOT IN). */
  val j03_anti_join: Q = (s, d) => {
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d).select(col("l_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("o_orderkey"))
  }

  /** Semi join: orders that have at least one near-max-quantity line —
    * existence test without multiplying rows. */
  val j04_semi_join: Q = (s, d) => {
    val bigLines = Tables.lineitem(s, d).filter(col("l_quantity") >= 49)
    Tables.orders(s, d)
      .join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("o_orderkey"))
  }

  /** Fact⋈fact shuffle join + aggregate (TPC-H Q3 shape): lineitem ⋈
    * orders on orderkey, revenue per order priority. At scale this is the
    * sort-merge join AQE owns; at sf0.01 AQE folds it to broadcast. */
  val j05_shuffle_join_agg: Q = (s, d) => {
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** j06: RANGE (band) join, expressed the scalable way. The natural SQL
    * — `orders JOIN bands ON price >= lo AND price < hi` (the half-open
    * form the oracle runs; inclusive BETWEEN would double-count exact
    * boundary prices) — plans as a nested-loop probe of every band per row
    * (BroadcastNestedLoopJoin: O(|fact|·|bands|) comparisons, and a
    * full cartesian explosion if the dim outgrows broadcast). Because
    * the bands are uniform, the band id is COMPUTABLE:
    * `least(floor(price/width), maxBand)` turns the range predicate
    * into a plain broadcast equi-join — O(|fact|) work, codegen'd,
    * AQE-friendly. (Non-uniform bands get the same shape from a
    * broadcast sorted-bounds binary-search expression.) The last band
    * is open-ended on both engines so the rewrite is exactly the
    * BETWEEN semantics. */
  val j06_band_join: Q = (s, d) => {
    import s.implicits._
    val bands = (0L until 10L).map(b => (b, b * 50000.0))
      .toDF("band", "lo")
    Tables.orders(s, d)
      .withColumn("cents", expr("CAST(round(o_totalprice * 100.0D) AS BIGINT)"))
      .withColumn("band",
        expr("least(CAST(floor(o_totalprice / 50000.0D) AS BIGINT), 9L)"))
      .join(broadcast(bands), "band")
      .groupBy(col("band"), col("lo"))
      .agg(count(lit(1)).as("n"), expr("sum(cents) / 100.0D").as("revenue"))
      .orderBy(col("band"))
  }

  def queries: Map[String, Q] = Map(
    "j01_score_metadata_join" -> j01_score_metadata_join,
    "j02_star_join_agg" -> j02_star_join_agg,
    "j03_anti_join" -> j03_anti_join,
    "j04_semi_join" -> j04_semi_join,
    "j05_shuffle_join_agg" -> j05_shuffle_join_agg,
    "j06_band_join" -> j06_band_join)

  def oracleSql: Map[String, String] = Map(
    "j01_score_metadata_join" ->
      s"""WITH topk AS (
         |  SELECT vec_id,
         |         round(list_dot_product(embedding::DOUBLE[],
         |           ${VectorOps.sqlDoubleArray(VectorQueries.flagshipVec)}), 4) AS score
         |  FROM embeddings ORDER BY score DESC, vec_id ASC LIMIT 50)
         |SELECT d.doc_id, t.score, d.lang, d.source
         |FROM documents d JOIN topk t ON d.doc_id = t.vec_id
         |ORDER BY t.score DESC, d.doc_id ASC""".stripMargin,
    "j02_star_join_agg" ->
      """SELECT r_name, round(sum(o_totalprice), 2) AS revenue,
        |       count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "j03_anti_join" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "j04_semi_join" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,
    "j05_shuffle_join_agg" ->
      """SELECT o_orderpriority,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |       count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // the genuine range-predicate form — what j06's equi-join rewrite is
    // proven equivalent to (last band open-ended on both engines)
    "j06_band_join" ->
      """WITH bands AS (
        |  SELECT b AS band, b * 50000.0 AS lo, (b + 1) * 50000.0 AS hi
        |  FROM (SELECT unnest(range(0, 10)) AS b))
        |SELECT band, lo, count(*) AS n,
        |       sum(CAST(round(o_totalprice * 100.0) AS BIGINT))::BIGINT / 100.0 AS revenue
        |FROM orders JOIN bands
        |  ON o_totalprice >= lo AND (o_totalprice < hi OR band = 9)
        |GROUP BY band, lo ORDER BY band""".stripMargin)
}
