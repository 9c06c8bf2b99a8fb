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

  /** c02: near-dup CLUSTER resolution — connected components over d02's
    * pair output, labeling every involved doc with the min doc_id of its
    * component. Pair lists aren't actionable by themselves: a curation
    * job keeps one canonical doc per transitive cluster, and transitivity
    * is exactly what the pairwise output lacks.
    *
    * Iterative min-label propagation with POINTER DOUBLING: each round a
    * node takes the min of its own label, its neighbors' labels, and its
    * label's label (the doubling join) — converging in O(log diameter)
    * rounds instead of O(diameter). Every round is two hash joins + one
    * min-aggregate on thin (node, lbl) rows; the driver loop only
    * compares the (monotonically decreasing) label-sum fixpoint, so this
    * is a distributed iterative algorithm, not a driver-side data loop.
    * Measured on this corpus: largest component 156 nodes / diameter ≈14
    * at sf0.1 → 5-6 rounds. The oracle computes the same fixpoint as a
    * recursive min-reachability CTE over the identical d02 CTE chain. */
  val c02_dedup_clusters: Q = (s, d) => {
    val pairs = DedupQueries.d02_minhash_lsh(s, d)
      .select(col("doc_a"), col("doc_b"))
    // localCheckpoint (eager) TRUNCATES LINEAGE — mandatory in iterative
    // plans: without it every round embeds the previous round's logical
    // plan (×3: self ∪ neighbor ∪ jump), so the tree Catalyst re-analyzes
    // per action grows as 3^rounds — observed minutes of pure planning by
    // round ~8. With it, each round's plan starts from a materialized RDD.
    val edges = pairs
      .unionByName(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .toDF("src", "dst")
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint(true)
    // no pairs → no clusters: skip the loop rather than aggregating
    // sum(lbl) over zero rows (NULL → getLong NPE)
    if (!labels.isEmpty) {
      var prevSum = labels.agg(sum(col("lbl"))).head().getLong(0)
      var converged = false
      var iter = 0
      while (!converged && iter < 40) {
        val nbr = edges.join(labels, edges("dst") === labels("node"))
          .select(edges("src").as("node"), col("lbl"))
        val jump = labels.as("a")
          .join(labels.as("b"), col("a.lbl") === col("b.node"))
          .select(col("a.node").as("node"), col("b.lbl").as("lbl"))
        val next = labels.unionByName(nbr).unionByName(jump)
          .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
          .localCheckpoint(true)
        val nextSum = next.agg(sum(col("lbl"))).head().getLong(0)
        labels = next
        converged = nextSum == prevSum // labels only ever decrease
        prevSum = nextSum
        iter += 1
      }
      require(converged, s"label propagation did not converge in $iter rounds")
    }
    labels.select(col("node").as("doc_id"), col("lbl").as("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** c03: rule-gauntlet quality filter — the C4/Gopher-style hard-rule
    * pass a corpus runs BEFORE model-based scoring: word-count bounds,
    * mean-word-length bounds, a stopword-presence requirement (English
    * only — the classic C4 rule), and a duplicate-word-fraction cap.
    * Emits every document with one 0/1 flag per rule plus the conjunction,
    * so downstream jobs can audit WHICH rule dropped a document (the
    * operational requirement that separates a curation pipeline from a
    * filter). All comparisons are integer cross-multiplications — no
    * ratio arithmetic to diverge between engines. Pure narrow projection:
    * zero shuffle at any scale. */
  val c03_quality_filter: Q = (s, d) => {
    Tables.documents(s, d)
      .selectExpr(
        "doc_id", "lang",
        "CAST(size(split(text, ' ')) AS BIGINT) AS n_words",
        // chars in words = total minus separators (single-space joined)
        "CAST(length(replace(text, ' ', '')) AS BIGINT) AS wchars",
        s"CAST(${TextQueries.hitExpr(TextQueries.markers.head._2)} AS BIGINT) AS sw_hits",
        "CAST(size(array_distinct(split(text, ' '))) AS BIGINT) AS n_distinct")
      .selectExpr(
        "doc_id", "lang", "CAST(n_words AS INT) AS n_words",
        "CAST(n_words BETWEEN 30 AND 100000 AS INT) AS len_ok",
        // mean word length in [4.0, 5.2]: 10·wchars ⋚ {40,52}·n_words
        "CAST(10 * wchars >= 40 * n_words AND 10 * wchars <= 52 * n_words AS INT) AS mwl_ok",
        "CAST(lang <> 'en' OR sw_hits >= 2 AS INT) AS sw_ok",
        // duplicate-word fraction ≤ 0.5: 2·(n_words − n_distinct) ≤ n_words
        "CAST(2 * (n_words - n_distinct) <= n_words AS INT) AS rep_ok")
      .selectExpr("doc_id", "lang", "n_words",
        "len_ok", "mwl_ok", "sw_ok", "rep_ok",
        "len_ok * mwl_ok * sw_ok * rep_ok AS kept")
      .orderBy(col("doc_id"))
  }

  def queries: Map[String, Q] = Map(
    "c01_curation_pipeline" -> c01_curation_pipeline,
    "c02_dedup_clusters" -> c02_dedup_clusters,
    "c03_quality_filter" -> c03_quality_filter)

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
         |ORDER BY lang, rk""".stripMargin,
    "c03_quality_filter" ->
      s"""WITH base AS (
         |  SELECT doc_id, lang,
         |         len(string_split(text, ' ')) AS n_words,
         |         length(replace(text, ' ', '')) AS wchars,
         |         ${TextQueries.duckHitExpr(TextQueries.markers.head._2)} AS sw_hits,
         |         len(list_distinct(string_split(text, ' '))) AS n_distinct
         |  FROM documents),
         |flags AS (
         |  SELECT doc_id, lang, n_words::INT AS n_words,
         |         CAST(n_words BETWEEN 30 AND 100000 AS INT) AS len_ok,
         |         CAST(10 * wchars >= 40 * n_words AND 10 * wchars <= 52 * n_words AS INT) AS mwl_ok,
         |         CAST(lang <> 'en' OR sw_hits >= 2 AS INT) AS sw_ok,
         |         CAST(2 * (n_words - n_distinct) <= n_words AS INT) AS rep_ok
         |  FROM base)
         |SELECT doc_id, lang, n_words, len_ok, mwl_ok, sw_ok, rep_ok,
         |       len_ok * mwl_ok * sw_ok * rep_ok AS kept
         |FROM flags ORDER BY doc_id""".stripMargin,
    // min-reachability fixpoint over the IDENTICAL d02 CTE chain: the
    // recursive CTE enumerates (node, reachable-node) pairs and min()
    // collapses them to the component's canonical id
    "c02_dedup_clusters" ->
      s"""WITH RECURSIVE ${DedupQueries.d02OracleCtes},
         |near AS (${DedupQueries.d02OraclePairSelect}),
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM near
         |  UNION
         |  SELECT doc_b, doc_a FROM near),
         |reach(node, r) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.a, rc.r FROM edges e JOIN reach rc ON rc.node = e.b)
         |SELECT node AS doc_id, min(r)::BIGINT AS cluster_id
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin)
}
