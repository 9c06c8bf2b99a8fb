package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.agg.VectorAggregators
import graft.model.Tables
import graft.vec.VectorOps

/** Word-table and vector-aggregate operators (SURVEY §2.4 K2, §2.5
  * A1/A2/A5/A6): per-label centroid words, element-wise vector aggregates,
  * and the dedup-by-embedding window — each with a DuckDB oracle that
  * replays the identical Double arithmetic via list lambdas.
  *
  * Numeric discipline: these queries keep the whole chain in Double
  * (vector sum → normalize → dot) with no Float truncation, so Spark and
  * DuckDB agree to ~1e-13 and the 4-decimal round is safely away from the
  * noise floor.
  */
object WordQueries {

  type Q = (SparkSession, String) => DataFrame

  /** K2/W1: words = per-label centroids (normalize ∘ element-wise sum, one
    * map-side-combining Aggregator pass), scored against the flagship
    * query vector, top-50 by (score DESC, word ASC) — the reference's
    * `best_words` (`rclip_server.py:310-312`) over its derived word table. */
  val w01_words_topk: Q = (s, d) => {
    Tables.embeddings(s, d)
      .groupBy(col("label"))
      .agg(VectorAggregators.vecSum(col("embedding")).as("vsum"))
      .select(
        concat(lit("label"), col("label").cast("string")).as("word"),
        round(VectorOps.ndotQueryNative(col("vsum"), VectorQueries.flagshipVec), 4)
          .as("score"))
      .orderBy(col("score").desc, col("word").asc)
      .limit(50)
  }

  /** w03 candidate generation: seed + draws per phrase length. The
    * reference samples 1000 combos per length from its top-200 word pool
    * (`rclip_server.py:331-336`); the table-derived pool here is the 10
    * label words, so [[W03_PER_LEN]] seeded draws per length saturate the
    * small pool's variety without degenerating to the full cross
    * product. */
  val W03_SEED = 7L
  val W03_PER_LEN = 60

  /** The seeded 2/3/4-word candidate phrases, generated ONCE and shared
    * VERBATIM by the Spark query and the DuckDB oracle (SURVEY §5.2(1):
    * candidate sampling is engine-OUTSIDE randomness — the reference's
    * `random.sample` at `rclip_server.py:333` — so it enters both engines
    * as the same literal list; everything downstream is relational and
    * hash-compared). Same LinkedHashSet distinct-index draw as the engine
    * façade's `similarPhrases`. */
  private[ops] lazy val w03Candidates: Seq[String] = {
    val pool = (0 to 9).map(i => s"label$i")
    val rnd = new java.util.Random(W03_SEED)
    def pick(n: Int): Seq[String] = {
      val idx = scala.collection.mutable.LinkedHashSet.empty[Int]
      while (idx.size < n) idx += rnd.nextInt(pool.length)
      idx.toSeq.map(pool)
    }
    (2 to 4).flatMap { len =>
      (1 to W03_PER_LEN).map(_ => pick(len).mkString(" "))
    }.distinct
  }

  /** W3: PHRASE SUGGESTION — the reference's `/similar_words` phrase
    * stage (`rclip_server.py:330-342,399-400`): random multi-word
    * candidates from the word pool, each scored by the W1 ESTIMATE
    * (normalized Σ of member-word vectors, `:314-318` — word vector =
    * the label centroid, w01's convention: the raw element-wise sum,
    * normalized at scoring) against the flagship query, top-50 by
    * (score DESC, phrase ASC) — the endpoint's serving cut (`:400`).
    *
    * Scale shape: the candidate→word map (≤ a few hundred thin rows)
    * BROADCASTS onto one corpus pass; the only shuffle is the
    * phrase-keyed vecSum aggregate (map-side combining, one 64-dim
    * Double buffer per phrase per partition); the top-50 is a
    * TakeOrderedAndProject. Phrase estimates are Σ of float-widened
    * Doubles — exactly representable at any row count that fits 29
    * spare mantissa bits, so the aggregate is addition-order-proof and
    * the hash compare holds at 10×. */
  val w03_phrase_suggest: Q = (s, d) => {
    import s.implicits._
    val cw = w03Candidates.toDF("phrase")
      .select(col("phrase"), explode(split(col("phrase"), " ")).as("word"))
    Tables.embeddings(s, d)
      .select(concat(lit("label"), col("label").cast("string")).as("word"),
        col("embedding"))
      .join(broadcast(cw), "word") // J3: word→embedding, candidate side tiny
      .groupBy(col("phrase"))
      .agg(VectorAggregators.vecSum(col("embedding")).as("vsum")) // W1
      .select(col("phrase"),
        (round(VectorOps.ndotQueryNative(col("vsum"), VectorQueries.flagshipVec), 4)
          + lit(0.0)).as("score")) // W2 approx score; +0.0 drops IEEE -0.0
      .orderBy(col("score").desc, col("phrase").asc)
      .limit(50)
  }

  /** A5: element-wise vector SUM per group via the typed Aggregator,
    * exploded to scalars for the oracle compare. The shuffle carries one
    * 64-dim Double buffer per (partition × label), not N×64 rows. */
  val a05_label_vecsum: Q = (s, d) => {
    Tables.embeddings(s, d)
      .groupBy(col("label"))
      .agg(VectorAggregators.vecSum(col("embedding")).as("vsum"))
      .select(col("label").cast("long").as("label"),
        posexplode(col("vsum")).as(Seq("pos", "x")))
      .select(col("label"), col("pos").cast("long").as("dim"),
        round(col("x"), 4).as("component"))
      .orderBy(col("label"), col("dim"))
  }

  /** A6/M2: dedup-by-embedding — the reference's intended (dead-code)
    * semantics (`rclip_server.py:237-245`): among rows with an identical
    * vector keep MIN(id), mark the rest. Input is doubled with shifted ids
    * so duplicates exist at any sf. One shuffle on the vector; ArrayType
    * is grouping-comparable in Spark (SURVEY §7.4). */
  val a06_dedup_window: Q = (s, d) => {
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val doubled = emb.unionByName(
      emb.withColumn("vec_id", col("vec_id") + 100000L))
    val w = Window.partitionBy(col("embedding")).orderBy(col("vec_id").asc)
    doubled
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .select(col("vec_id"))
      .orderBy(col("vec_id"))
  }

  /** A1/A2 via the typed Aggregators (the one-pass, no-explode alternative
    * to v04 — preferred at scale, SURVEY §2.5). Same oracle shape. */
  val v05_vector_stats_agg: Q = (s, d) => {
    Tables.embeddings(s, d)
      .agg(VectorAggregators.vecMin(col("embedding")).as("lo"),
           VectorAggregators.vecMax(col("embedding")).as("hi"))
      .select(posexplode(arrays_zip(col("lo"), col("hi"))).as(Seq("pos", "z")))
      .select(col("pos").cast("long").as("dim"),
        round(col("z.lo"), 4).as("lo"),
        round(col("z.hi"), 4).as("hi"))
      .orderBy(col("dim"))
  }

  /** w02 minimum bigram support — the classic PMI small-count guard
    * (PMI of a hapax pair is pure noise). */
  val PMI_MIN_SUP = 5L

  /** w02: PMI COLLOCATIONS — top adjacent-bigram pointwise mutual
    * information over whitespace tokens, the classic collocation
    * extractor (Church & Hanks 1990) a phrase-aware tokenizer or
    * boilerplate miner runs corpus-wide. PMI is computed ENTIRELY in
    * [[FixedLog]] centibits (t14/t18's discipline): pmi_cb =
    * log2cb(c_ab) + 2·log2cb(N_uni) − log2cb(N_bi) − log2cb(c_a) −
    * log2cb(c_b), all BIGINT — the only float log ever taken is
    * FixedLog's code-time table. Support-filtered at [[PMI_MIN_SUP]].
    *
    * Scale shape: the canonical word-count shape — one narrow exploded
    * pass per census (bigrams, unigrams), both map-side combinable;
    * the unigram side joins back BROADCAST (vocab-sized); corpus
    * totals are two driver scalars folded to centibit literals; top-50
    * plans TakeOrderedAndProject. Nothing corpus-sized shuffles twice. */
  val w02_pmi_collocations: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .selectExpr("split(text, ' ') AS t")
      .cache()
    val uni = toks.selectExpr("explode(t) AS w")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .cache()
    // both corpus totals in ONE narrow aggregate over the token cache
    // (p09's one-agg discipline): Σc over the unigram census is exactly
    // Σ size(t), and Σc_ab over the bigram census is exactly
    // Σ max(size(t)−1, 0) — same integers, without forcing each census
    // through its own driver action first
    val totRow = toks.agg(
      sum(expr("size(t)")).as("nu"),
      sum(expr("greatest(size(t) - 1, 0)")).as("nb")).head()
    val (totals, nBi) = (totRow.getLong(0), totRow.getLong(1))
    val bi = toks.filter(expr("size(t) >= 2"))
      .selectExpr("explode(transform(sequence(1, size(t) - 1), " +
        "i -> struct(element_at(t, i) AS a, element_at(t, i + 1) AS b)))" +
        " AS p")
      .select(col("p.a"), col("p.b"))
    val biCounts = bi.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("c_ab"))
    val nuCb = FixedLog.log2Cb(totals)
    val nbCb = FixedLog.log2Cb(nBi)
    biCounts.filter(col("c_ab") >= PMI_MIN_SUP)
      .join(broadcast(uni.selectExpr("w AS a", "c AS c_a")), "a")
      .join(broadcast(uni.selectExpr("w AS b", "c AS c_b")), "b")
      .selectExpr("a", "b", "c_ab",
        s"CAST(${FixedLog.sparkLog2Cb("c_ab")} + ${2 * nuCb}L - ${nbCb}L" +
          s" - ${FixedLog.sparkLog2Cb("c_a")}" +
          s" - ${FixedLog.sparkLog2Cb("c_b")} AS BIGINT) AS pmi_cb")
      .orderBy(col("pmi_cb").desc, col("a").asc, col("b").asc)
      .limit(50)
  }

  def queries: Map[String, Q] = Map(
    "w02_pmi_collocations" -> w02_pmi_collocations,
    "w01_words_topk" -> w01_words_topk,
    "w03_phrase_suggest" -> w03_phrase_suggest,
    "a05_label_vecsum" -> a05_label_vecsum,
    "a06_dedup_window" -> a06_dedup_window,
    "v05_vector_stats_agg" -> v05_vector_stats_agg)

  def oracleSql: Map[String, String] = Map(
    // w02: identical censuses + FixedLog centibit PMI (totals live as
    // one-row CTEs where the engine folds driver-scalar literals)
    "w02_pmi_collocations" ->
      s"""WITH toks AS (SELECT string_split(text, ' ') AS t
         |             FROM documents),
         |uni AS (SELECT w, count(*)::BIGINT AS c
         |        FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
         |tot AS (SELECT sum(c)::BIGINT AS nu FROM uni),
         |bi AS (
         |  SELECT u.p[1] AS a, u.p[2] AS b
         |  FROM (SELECT t FROM toks WHERE len(t) >= 2) x,
         |       unnest(list_transform(range(1, len(t)),
         |         i -> [t[i], t[i + 1]])) AS u(p)),
         |bc AS (SELECT a, b, count(*)::BIGINT AS c_ab
         |       FROM bi GROUP BY a, b),
         |nbt AS (SELECT sum(c_ab)::BIGINT AS nb FROM bc),
         |sc AS (
         |  SELECT bc.a, bc.b, c_ab, ua.c AS c_a, ub.c AS c_b, nu, nb
         |  FROM bc
         |  JOIN uni ua ON ua.w = bc.a
         |  JOIN uni ub ON ub.w = bc.b, tot, nbt
         |  WHERE c_ab >= $PMI_MIN_SUP)
         |SELECT a, b, c_ab,
         |       (${FixedLog.duckLog2Cb("c_ab")}
         |        + 2 * ${FixedLog.duckLog2Cb("nu")}
         |        - ${FixedLog.duckLog2Cb("nb")}
         |        - ${FixedLog.duckLog2Cb("c_a")}
         |        - ${FixedLog.duckLog2Cb("c_b")})::BIGINT AS pmi_cb
         |FROM sc ORDER BY pmi_cb DESC, a, b LIMIT 50""".stripMargin,
    // w03: the identical candidate literals + per-(phrase, dim) Double
    // sum + index-order normalize∘dot — w01's oracle pattern with the
    // phrase→word map as a VALUES CTE
    "w03_phrase_suggest" -> {
      val values = w03Candidates.map(p => s"('$p')").mkString(", ")
      s"""WITH cand(phrase) AS (VALUES $values),
         |cw AS (SELECT phrase, unnest(string_split(phrase, ' ')) AS word
         |       FROM cand),
         |e AS (SELECT 'label' || label::VARCHAR AS word,
         |             unnest(embedding::DOUBLE[]) AS x,
         |             unnest(range(1, len(embedding)+1)) AS i
         |      FROM embeddings),
         |sums AS (SELECT phrase, i, sum(x) AS sx
         |         FROM cw JOIN e USING (word) GROUP BY phrase, i),
         |vecs AS (SELECT phrase, list(sx ORDER BY i) AS v
         |         FROM sums GROUP BY phrase)
         |SELECT phrase,
         |       round(list_dot_product(
         |         list_transform(v, x -> x / sqrt(list_sum(list_transform(v, y -> y*y)))),
         |         ${VectorOps.sqlDoubleArray(VectorQueries.flagshipVec)}), 4) + 0.0 AS score
         |FROM vecs ORDER BY score DESC, phrase ASC LIMIT 50""".stripMargin
    },
    "w01_words_topk" ->
      s"""WITH sums AS (
         |  SELECT label, i, sum(x) AS sx
         |  FROM (SELECT label, unnest(embedding::DOUBLE[]) AS x,
         |               unnest(range(1, len(embedding)+1)) AS i
         |        FROM embeddings)
         |  GROUP BY label, i),
         |vecs AS (SELECT label, list(sx ORDER BY i) AS v FROM sums GROUP BY label)
         |SELECT 'label' || label::VARCHAR AS word,
         |       round(list_dot_product(
         |         list_transform(v, x -> x / sqrt(list_sum(list_transform(v, y -> y*y)))),
         |         ${VectorOps.sqlDoubleArray(VectorQueries.flagshipVec)}), 4) AS score
         |FROM vecs ORDER BY score DESC, word ASC LIMIT 50""".stripMargin,
    "a05_label_vecsum" ->
      """SELECT label::BIGINT AS label, i - 1 AS dim, round(sum(x), 4) AS component
        |FROM (SELECT label, unnest(embedding::DOUBLE[]) AS x,
        |             unnest(range(1, len(embedding)+1)) AS i
        |      FROM embeddings)
        |GROUP BY label, dim ORDER BY label, dim""".stripMargin,
    "a06_dedup_window" ->
      """WITH doubled AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000, embedding FROM embeddings),
        |marked AS (
        |  SELECT vec_id,
        |         row_number() OVER (PARTITION BY embedding ORDER BY vec_id) AS rn
        |  FROM doubled)
        |SELECT vec_id FROM marked WHERE rn > 1 ORDER BY vec_id""".stripMargin,
    "v05_vector_stats_agg" ->
      """SELECT i - 1 AS dim,
        | round(min(x)::DOUBLE, 4) AS lo,
        | round(max(x)::DOUBLE, 4) AS hi
        |FROM (SELECT unnest(embedding) AS x,
        |             unnest(range(1, len(embedding)+1)) AS i
        |      FROM embeddings)
        |GROUP BY dim ORDER BY dim""".stripMargin)
}
