package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Scale-pattern operators: the shapes that only matter when the data is
  * big — hierarchical aggregation and skew-safe two-stage (salted)
  * aggregation — each verified against an oracle computing the same
  * result the direct way, plus an approximate-distinct sketch (rows-only
  * check: approximation has no exact oracle).
  */
object ScaleQueries {

  type Q = (SparkSession, String) => DataFrame

  /** r01: ROLLUP hierarchy — revenue at (returnflag, linestatus), per
    * returnflag subtotal, and grand total in one pass (Expand + single
    * shuffle). */
  val r01_rollup: Q = (s, d) => {
    // integer-cents accumulation (prices are exact 2-dp): round(sum(DOUBLE))
    // is engine-divergent at repr ties and drifts past 2^53 at 100 TB
    Tables.lineitem(s, d)
      .withColumn("cents", expr("CAST(round(l_extendedprice * 100.0D) AS BIGINT)"))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(expr("sum(cents) / 100.0D").as("revenue"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  /** r02: CUBE lattice — revenue and counts at EVERY subset of
    * (returnflag, linestatus): both one-dimension margins, the joint
    * cells, and the grand total, one Expand + one shuffle (r01 covers
    * the ROLLUP chain; the full lattice is the other grouping-sets
    * shape an OLAP surface owes). The grouping_id bitmask rides along
    * as g (2·grouping(rf) + grouping(ls)) so consumers can tell a NULL
    * group value from a margin row. Cents discipline as r01. */
  val r02_cube: Q = (s, d) => {
    Tables.lineitem(s, d)
      .withColumn("cents", expr("CAST(round(l_extendedprice * 100.0D) AS BIGINT)"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(expr("sum(cents) / 100.0D").as("revenue"),
        count(lit(1)).as("n"),
        (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
          .cast("long").as("g"))
      .orderBy(col("g").asc, col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  /** r03: GROUPING SETS — the irregular-lattice member of the r01/r02
    * family: revenue at the (returnflag, linestatus) joint cells, at
    * per-ship-year margins (a DERIVED time dimension that is neither a
    * rollup prefix nor a cube subset of the flag pair), and the grand
    * total — declared as an explicit set list, still ONE Expand + ONE
    * shuffle. This is the shape real report suites compile to: a
    * handful of hand-picked cross-sections, not the full 2^k cube,
    * so the Expand factor is |sets| (3 here) instead of 2^k. The
    * grouping_id bitmask rides along as g (r02's discipline) so a NULL
    * group value is distinguishable from a margin row; cents
    * discipline as r01. */
  val r03_grouping_sets: Q = (s, d) => {
    Tables.lineitem(s, d)
      .withColumn("cents", expr("CAST(round(l_extendedprice * 100.0D) AS BIGINT)"))
      .withColumn("ship_year", expr("CAST(year(l_shipdate) AS BIGINT)"))
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("ship_year")), Seq.empty[org.apache.spark.sql.Column]),
        col("l_returnflag"), col("l_linestatus"), col("ship_year"))
      .agg(expr("sum(cents) / 100.0D").as("revenue"),
        count(lit(1)).as("n"),
        (grouping(col("l_returnflag")) * 4 + grouping(col("l_linestatus")) * 2
          + grouping(col("ship_year"))).cast("long").as("g"))
      .orderBy(col("g").asc, col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first, col("ship_year").asc_nulls_first)
  }

  /** p14 rendezvous geometry: the doc→shard map under S and S+1 shards.
    * SHARDS must stay ≤ 16 for the w·16+(15−shard) argmax encoding. */
  val HRW_SHARDS = 8

  /** p14: RENDEZVOUS (HRW) SHARD STABILITY — highest-random-weight
    * assignment of documents to output shards, and the movement audit
    * for growing the shard count by one: the property a 100 TB corpus
    * store picks HRW/consistent hashing FOR is that adding a shard
    * moves only ≈ 1/(S+1) of the keys (vs ~all keys under mod-S), and
    * this report measures exactly that, per losing shard. Weights MUST
    * be non-affine in the shard index: any chain of the
    * ((doc·A + shard·B) mod M)·C mod M family is affine in shard, so
    * every doc sees the SAME cross-shard weight offsets and the argmax
    * degenerates (measured: 3 shards hogging 70% of docs, movement
    * concentrated on one shard). The weight here is the classic
    * MID-SQUARE mix — h₁ = (doc·2654435761 + (shard+1)·2246822519)
    * mod (2³¹−1), w = h₁² mod (2³¹−1) — whose squaring breaks the
    * affinity (measured: ±5% shard balance, 10.4% moved ≈ 1/(S+1));
    * the per-doc argmax is encoded as max(w·16 + (15 − shard)) — a pure
    * BIGINT reduction with the min-shard tie-break built into the
    * encoding, so there is no struct/argmax surface for the engines to
    * disagree on.
    *
    * Scale shape: one narrow pass explodes each doc_id into S+1 thin
    * (doc, shard, w) rows, ONE map-side-combinable (doc)-aggregate
    * computes both assignments, one shard-sized census follows. No
    * joins, no windows, no state. */
  val p14_rendezvous: Q = (s, d) => {
    val S = HRW_SHARDS
    Tables.documents(s, d)
      .select(col("doc_id"), explode(expr(s"sequence(0, $S)")).as("shard"))
      .selectExpr("doc_id", "shard",
        """pmod(pmod(doc_id * 2654435761 + (shard + 1) * 2246822519, 2147483647)
          |     * pmod(doc_id * 2654435761 + (shard + 1) * 2246822519, 2147483647),
          |     2147483647) AS w""".stripMargin)
      .groupBy(col("doc_id"))
      .agg(
        max(when(col("shard") < S, col("w") * 16 + (lit(15) - col("shard"))))
          .as("k8"),
        max(col("w") * 16 + (lit(15) - col("shard"))).as("k9"))
      .selectExpr("doc_id",
        "CAST(15 - pmod(k8, 16) AS BIGINT) AS shard_s",
        "CAST(15 - pmod(k9, 16) AS BIGINT) AS shard_s1")
      .groupBy(col("shard_s"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("shard_s1") =!= col("shard_s"), 1L).otherwise(0L))
          .as("n_moved"))
      .selectExpr("shard_s", "n_docs", "n_moved",
        "CAST(n_moved * 1000 div n_docs AS BIGINT) AS moved_permille")
      .orderBy(col("shard_s"))
  }

  /** s01: salted two-stage aggregation — the skew-join/agg pattern: a hot
    * grouping key is sharded across `salt` sub-keys (stage 1 partial agg
    * on (key, salt)), then the shards combine (stage 2 on key). Result is
    * EXACTLY the plain groupBy (the oracle computes it directly) but no
    * single reducer ever sees a whole hot key — the shape that survives a
    * key owning 30% of 100 TB. */
  val s01_salted_agg: Q = (s, d) => {
    // partials carry integer cents: exact at any scale AND immune to the
    // round(sum(DOUBLE)) repr-tie divergence between engines
    val salted = Tables.events(s, d)
      .withColumn("cents", expr("CAST(round(value * 100.0D) AS BIGINT)"))
      .withColumn("salt", pmod(col("event_id"), lit(8)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("cents")).as("pv"))
    salted
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"), expr("sum(pv) / 100.0D").as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** h01: approximate distinct users per event type (HLL++). Emits ONLY
    * the sketch column — approximate by construction, so rows-only check
    * here; its 5%-accuracy bound is asserted in ScalaTest and the exact
    * value is oracle-checked by its twin h02 (VERDICT r02 #5: don't let
    * an exact column ride in a no_oracle row). */
  val h01_approx_distinct: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
      .orderBy(col("event_type"))
  }

  /** h02: exact distinct users per event type — h01's oracle-checked twin
    * (two-phase partial-distinct aggregation; at scale the HLL sketch in
    * h01 is the cheap first pass, this is the exact answer when it must
    * be exact). */
  val h02_exact_distinct: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
      .orderBy(col("event_type"))
  }

  /** h03: exact discrete quantiles (p25/p50/p75) of the value column per
    * event type — the exact companion to the sketch surface (at 100 TB
    * you run `approx_percentile`'s mergeable sketch first and this
    * single-sort exact pass only where it must be exact; same pairing as
    * h01/h02). Formulated as row_number-over-sorted-cents element picks
    * (the q-th discrete quantile is the cents value at row ⌈q·n⌉), all in
    * BIGINT — no engine-divergent percentile interpolation arithmetic. */
  val h03_exact_quantiles: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("cents").asc, col("event_id").asc)
    val wAll = Window.partitionBy(col("event_type"))
    def pick(q: String, out: String) =
      expr(s"max(CASE WHEN rn = greatest(1, CAST(ceil(n * $q) AS BIGINT)) " +
        s"THEN cents END) / 100.0D").as(out)
    Tables.events(s, d)
      .withColumn("cents", expr("CAST(round(value * 100.0D) AS BIGINT)"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy(col("event_type"))
      .agg(pick("0.25D", "p25"), pick("0.5D", "p50"), pick("0.75D", "p75"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
  }

  /** p01: reproducible stratified sampling — per-language rates applied
    * via a deterministic id hash (`(id·φ) mod 1000 < rate‰`), NOT
    * Bernoulli RNG: the same rows are kept on every run, on every engine,
    * at any partitioning — the property training-data pipelines need for
    * auditable subsets. (Spark's `sampleBy` is seed-stable only within
    * one partitioning; this is stable, full stop.) Caveat: multiplicative
    * hashing is linear, so tiny strata can alias a few points off their
    * target rate (measured ±5pp at n≈64); swap in a xor-shift mixer
    * (expressible in both engines) where exact small-stratum rates
    * matter. */
  val p01_stratified_sample: Q = (s, d) => {
    // per-mille keep-rates per language stratum
    val rates = Seq("en" -> 500, "de" -> 250, "es" -> 250, "fr" -> 100, "zh" -> 100)
    val rateExpr = rates.map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
      .mkString("CASE ", " ", " ELSE 0 END")
    Tables.documents(s, d)
      .selectExpr("doc_id", "lang",
        "pmod(doc_id * 2654435761, 1000) AS bucket",
        s"$rateExpr AS keep_rate")
      .filter(col("bucket") < col("keep_rate"))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** p02: deterministic train/val/test split — the assignment every
    * training pipeline needs to be reproducible and engine-independent:
    * bucket = (id·φ) mod 1000 (same multiplicative hash as p01), split
    * by fixed per-mille cut points 800/100/100. A row's split never
    * changes with partitioning, cluster size, or engine — unlike
    * randomSplit, which is seed-stable only per partitioning. Pure
    * narrow projection: zero shuffle at any scale. */
  val p02_train_val_test: Q = (s, d) => {
    Tables.documents(s, d)
      .selectExpr("doc_id", "lang",
        "pmod(doc_id * 2654435761, 1000) AS bucket")
      .selectExpr("doc_id", "lang",
        """CASE WHEN bucket < 800 THEN 'train'
          |     WHEN bucket < 900 THEN 'val'
          |     ELSE 'test' END AS split""".stripMargin)
      .orderBy(col("doc_id"))
  }

  /** h04: corpus-wide heavy hitters — the exact top-20 terms by total
    * occurrence count with their document frequency, tiebreak (tf DESC,
    * term ASC). Shape at scale: explode → ONE (term)-keyed aggregation
    * whose map-side partial combine collapses each partition to its
    * distinct terms before the shuffle (vocabulary ≪ corpus), then df
    * via a second partial-distinct agg on thin (term, doc_id) rows;
    * final top-20 is TakeOrdered. At 100 TB the first pass you'd run is
    * a count-min/space-saving sketch (mergeable, fixed memory) — this is
    * the exact twin you run when the answer must be exact, the same
    * pairing as h01/h02. */
  val h04_heavy_hitters: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .selectExpr("doc_id", "explode(split(text, ' ')) AS term")
    toks.groupBy(col("term"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("term").asc)
      .limit(20)
  }

  /** p03: domain balancing (mixture re-weighting) — downsample
    * over-represented domains (here: languages — the skewed axis of this
    * corpus; `source` is uniform by construction) so each contributes
    * ≈ its fair share of the output corpus: keep-rate‰ per domain =
    * min(1000, (total/n_domains)·1000 / n_domain), applied with the same
    * deterministic id hash as p01/p02 (auditable, partitioning- and
    * engine-independent — a training mixture must be reproducible).
    * All-integer rate arithmetic. Shape at scale: the per-source count
    * is one tiny agg (20 rows here; thousands of domains at 100 TB —
    * still broadcast-size), the rate table joins back as a broadcast
    * hash join, and the filter is narrow: no shuffle of the corpus
    * itself, ever. */
  val p03_domain_mix: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(s, d)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_s"))
    // window over the tiny per-domain counts table, NOT the corpus
    val all = Window.partitionBy()
    val rates = counts
      .withColumn("total", sum(col("n_s")).over(all))
      .withColumn("n_dom", count(lit(1)).over(all))
      .selectExpr("lang",
        "least(CAST(1000 AS BIGINT), ((total div n_dom) * 1000) div n_s) AS keep_rate")
    Tables.documents(s, d).select(col("doc_id"), col("lang"))
      .join(broadcast(rates), Seq("lang"))
      .filter(expr("pmod(doc_id * 2654435761, 1000)") < col("keep_rate"))
      .select(col("doc_id"), col("lang"), col("keep_rate"))
      .orderBy(col("doc_id"))
  }

  /** p04: sequence packing (concat-and-chunk) — assign every document a
    * (bin, offset) in the fixed CONTEXT_TOKENS-token training windows its
    * source's token stream fills, the standard pretraining layout
    * (documents concatenated in a deterministic order, then cut every
    * CONTEXT_TOKENS tokens). offset = running token count before the doc
    * (per-source prefix sum); bin = offset div CONTEXT_TOKENS. One
    * window shuffle keyed by source; at 100 TB you sub-partition the
    * stream key (source, shard) so no single reducer owns a whole
    * source's prefix sum — same salting discipline as s01. */
  val p04_sequence_pack: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        expr("size(split(text, ' '))").as("tokens"))
      .withColumn("off",
        coalesce(sum(col("tokens").cast("long")).over(w), lit(0L)))
      .selectExpr("doc_id", "source", "tokens",
        s"off div $CONTEXT_TOKENS AS bin",
        s"pmod(off, $CONTEXT_TOKENS) AS pos")
      .orderBy(col("doc_id"))
  }

  private val CONTEXT_TOKENS = 2048

  /** p16: PACKING-EFFICIENCY AUDIT — the numbers that decide between
    * the two standard sequence-packing strategies before a training
    * run: p04's CONCAT-AND-SLICE (zero padding inside the stream, but
    * documents straddling a context boundary get split — an attention
    * -quality cost) vs NAIVE one-doc-per-sequence (no splits, but every
    * short doc pads its sequence tail and every long doc truncates).
    * Per source: sequence counts, padded/wasted tokens, split-doc and
    * truncated-doc counts, and both strategies' fill rates in permille
    * — all exact BIGINT arithmetic over p04's own running-offset
    * window, so the audit prices exactly the plan p04 ships.
    *
    * Scale shape: one source-keyed window (p04's shuffle, reused
    * shape) + one source-keyed aggregate; output is |sources|-sized. */
  val p16_packing_efficiency: Q = (s, d) => {
    val C = CONTEXT_TOKENS
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        expr("CAST(size(split(text, ' ')) AS BIGINT)").as("tokens"))
      .withColumn("off", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("total_tokens"),
        sum(expr(s"CASE WHEN off div $C != (off + tokens - 1) div $C " +
          "THEN 1 ELSE 0 END")).as("n_split_docs"),
        sum(expr(s"least(tokens, $C)")).as("used_naive"),
        sum(expr(s"CASE WHEN tokens > $C THEN 1 ELSE 0 END"))
          .as("n_trunc_docs"))
      .selectExpr("source", "n_docs", "total_tokens", "n_split_docs",
        "n_trunc_docs",
        s"CAST((total_tokens + ${C - 1}) div $C AS BIGINT) AS packed_seqs",
        s"CAST(((total_tokens + ${C - 1}) div $C) * $C - total_tokens " +
          "AS BIGINT) AS packed_pad",
        "n_docs AS naive_seqs",
        s"CAST(n_docs * $C - used_naive AS BIGINT) AS naive_pad",
        s"CAST(total_tokens * 1000 div (((total_tokens + ${C - 1}) " +
          s"div $C) * $C) AS BIGINT) AS packed_fill_pm",
        s"CAST(used_naive * 1000 div (n_docs * $C) AS BIGINT) " +
          "AS naive_fill_pm")
      .orderBy(col("source"))
  }

  /** s02: skew-safe SALTED JOIN — s01's companion for the other half of
    * the skew problem: a fact⋈dim join where a few hot keys own an
    * outsized share of the fact side, so one reducer would receive a
    * whole hot key's rows. Two-path plan: (1) detect hot keys with a
    * thin (key, count) aggregate (at 100 TB you'd sample or read AQE's
    * shuffle stats instead — the split logic is identical); (2) HOT path:
    * replicate each hot dim row ×SALT and spray the hot fact rows across
    * the salts, so a hot key occupies SALT reducers; (3) COLD path: plain
    * equi-join. Result is EXACTLY the plain join+aggregate (the oracle
    * computes it directly). The hot-key set is tiny by construction
    * (count > threshold bounds it at n_rows/threshold) → both hot-path
    * joins broadcast it. */
  val s02_skew_join: Q = (s, d) => {
    val SALT = 8
    val HOT = 10L // keys with more fact rows than this take the salted path
    val li = Tables.lineitem(s, d)
      .withColumn("cents", expr("CAST(round(l_extendedprice * 100.0D) AS BIGINT)"))
      .select(col("l_orderkey"), col("l_linenumber"), col("cents"))
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val hotKeys = li.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("nl")).filter(col("nl") > HOT)
      .select(col("l_orderkey").as("hk"))
    val hotOrd = ord
      .join(broadcast(hotKeys), ord("o_orderkey") === hotKeys("hk"))
      .select(col("o_orderkey"), col("o_orderpriority"))
      .withColumn("salt", explode(sequence(lit(0), lit(SALT - 1))))
    val hotLi = li
      .join(broadcast(hotKeys), li("l_orderkey") === hotKeys("hk"), "left_semi")
      .withColumn("salt", pmod(col("l_linenumber"), lit(SALT)))
    val hotSide = hotLi.join(hotOrd,
      hotLi("l_orderkey") === hotOrd("o_orderkey")
        && hotLi("salt") === hotOrd("salt"))
    val coldSide = li
      .join(broadcast(hotKeys), li("l_orderkey") === hotKeys("hk"), "left_anti")
      .join(ord, col("l_orderkey") === ord("o_orderkey"))
    hotSide.select(col("o_orderpriority"), col("cents"))
      .unionByName(coldSide.select(col("o_orderpriority"), col("cents")))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        expr("sum(cents) / 100.0D").as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** p05: quality-weighted EPOCH sampling — the mixture-weights-to-
    * physical-rows step of a pretraining pipeline: high-quality documents
    * are repeated (multiple training epochs), mid-quality seen once, and
    * low-quality documents deterministically downsampled — the
    * DoReMi/DataComp-style "good data is worth more passes" strategy
    * materialized as an explicit (doc, epoch) stream a packing job
    * (p04) can consume. Quality is t02's shared integer formula; the
    * downsample uses the same id-hash discipline as p01/p02 (auditable,
    * engine- and partitioning-independent). Narrow projection + explode:
    * zero shuffle at any scale, output ≤ 2× input rows by construction. */
  val p05_quality_epochs: Q = (s, d) => {
    Tables.documents(s, d)
      .selectExpr("doc_id", "lang", "text",
        "size(split(text, ' ')) AS n_words",
        s"${TextQueries.hitExpr(TextQueries.markers.head._2)} AS sw_hits",
        "size(array_distinct(split(text, ' '))) AS n_distinct")
      .selectExpr("doc_id", "lang",
        s"${TextQueries.qualityExpr} AS quality",
        "pmod(doc_id * 2654435761, 1000) AS bucket")
      .selectExpr("doc_id", "lang", "quality",
        s"""CASE WHEN quality >= 0.7D THEN 2
           |     WHEN quality >= ${TextQueries.QUALITY_FLOOR}D THEN 1
           |     WHEN bucket < 250 THEN 1 ELSE 0 END AS n_epochs""".stripMargin)
      .filter(col("n_epochs") > 0)
      .withColumn("epoch", explode(sequence(lit(1), col("n_epochs"))))
      .select(col("doc_id"), col("lang"), col("quality"),
        col("n_epochs"), col("epoch"))
      .orderBy(col("doc_id"), col("epoch"))
  }

  /** s03: broadcast BLOOM-FILTER pre-join — the runtime-filter pattern
    * for a selective fact⋈dim join when the dim key set is too big to
    * broadcast as a hash table but its Bloom sketch is not (~1.2
    * bytes/key at 1% FPP vs 8+ bytes/key + object overhead for a set:
    * roughly an order of magnitude, the regime where Spark's own
    * InjectRuntimeFilter picks a bloom over a semi-join subquery). The
    * fact side is pre-filtered by the broadcast bloom BEFORE its shuffle,
    * so ~96% of the 100 TB side (1/5 of keys survive + 1% FP) never
    * enters the exchange; the exact SHUFFLE_HASH semi-join afterwards
    * removes the false positives, making the result EXACTLY the plain
    * semi-join the oracle computes — a bloom is a performance hint here,
    * never a correctness surface. Driver-side build cost is ONE tiny agg
    * over dim keys (mergeable sketch, same shape as h01's HLL): the
    * sketch is sized from a fixed capacity constant, not a count() —
    * a counting pre-pass would double the build cost, and overestimating
    * only buys a lower FPP (in production, size from catalog/table
    * stats, never a scan). */
  val s03_bloom_prejoin: Q = (s, d) => {
    val dimKeys = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    // 4M capacity ≈ 4.7 MB at 1% FPP — broadcast-cheap, and ≥ the urgent
    // key count up to sf ≈ 13 (≈ 300k urgent keys per sf unit). Past
    // capacity a bloom SATURATES silently: correctness is untouched (the
    // exact join removes FPs) but every fact row passes and the
    // pre-filter is a pure cost. expectedFpp() reads the observed bit
    // saturation, making the degradation loud instead of silent — on
    // saturation, raise the capacity (size from catalog stats).
    val bloom = dimKeys.stat.bloomFilter("o_orderkey",
      expectedNumItems = 4L * 1024 * 1024, fpp = 0.01)
    require(bloom.expectedFpp() < 0.1,
      f"s03 bloom saturated (observed FPP ${bloom.expectedFpp()}%.2f): " +
        "capacity is undersized for this dim key count")
    val bc = s.sparkContext.broadcast(bloom)
    val mightContain = udf { (k: java.lang.Long) =>
      k != null && bc.value.mightContain(k.longValue)
    }
    Tables.lineitem(s, d)
      .withColumn("cents", expr("CAST(round(l_extendedprice * 100.0D) AS BIGINT)"))
      .select(col("l_orderkey"), col("l_returnflag"), col("cents"))
      .filter(mightContain(col("l_orderkey")))
      .join(dimKeys.hint("SHUFFLE_HASH"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        expr("sum(cents) / 100.0D").as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  /** p06: reproducible GLOBAL SHUFFLE ORDER — the deterministic "random"
    * training order a data loader consumes: every (doc, epoch) gets a
    * pseudo-random sort key from a two-round multiply-mix of (doc_id,
    * epoch), and the corpus is emitted in key order. Unlike
    * `orderBy(rand(seed))`, the key is a pure function of the row — the
    * order survives partitioning changes, retries, engines, and resume-
    * from-step-N. Shape at scale: ONE range-partitioned sort; because the
    * key is uniform the ranges balance perfectly, and a loader can
    * instead SORT WITHIN partitions after hash-distributing on the key
    * (zero global sort) when only per-shard order matters. All
    * arithmetic stays < 2⁶³ by construction: the inner residue is
    * < 2³¹ (mod 2³¹−1), so the second product is < 2³¹·2246822519
    * ≈ 4.8·10¹⁸ — inside signed BIGINT on both engines at ANY id
    * range (DuckDB would raise on overflow, Spark would wrap
    * silently; the bound makes both moot). */
  val p06_shuffle_order: Q = (s, d) => {
    val keyExpr =
      """pmod(pmod(doc_id * 2654435761 + epoch * 40503, 2147483647)
        |     * 2246822519 + 1013904223, 2147483647)""".stripMargin
    Tables.documents(s, d)
      .select(col("doc_id"))
      .withColumn("epoch", explode(sequence(lit(1), lit(2))))
      .selectExpr("doc_id", "epoch", s"$keyExpr AS shuffle_key")
      .orderBy(col("shuffle_key"), col("doc_id"))
  }

  /** p07: TEMPERATURE-resampled domain mixture — the multilingual
    * sampling rule (τ = 0.5) multilingual-corpus pipelines use to lift
    * low-resource domains: post-sample shares go as n_i^τ = √n_i, so an
    * over-represented domain is downsampled ∝ 1/√n_i instead of p03's
    * hard fair-share cap (which flattens ALL skew; temperature keeps a
    * graded preference). Keep rule for a doc in domain i with corpus
    * count n_i: p_i = min(1, K/√n_i), K = [[TEMP_K]].
    *
    * The float trap and its exact escape: √n and p·M are irrational, and
    * a float threshold can round differently per engine at the boundary.
    * Both sides instead compare SQUARES — keep iff h/M < K/√n_i ⟺
    * h²·n_i < K²·M² — pure BIGINT arithmetic (h < 1000 ⇒ h²·n_i < 2⁶³
    * for any n_i ≤ 9·10¹²), bit-identical everywhere, and domains with
    * n_i ≤ K² are kept whole automatically (h² n < K²M² always), the
    * keep-low-resource-whole property p03 needed a `least()` for.
    *
    * Scale shape: the per-domain census is a tiny partial-agg shuffle
    * (domain cardinality rows); it broadcasts back onto one narrow
    * corpus filter — the corpus body never shuffles. The doc hash is a
    * different odd multiplier than p02/p03's so the three samplers are
    * decorrelated. */
  val TEMP_K = 6L
  val p07_temperature_mix: Q = (s, d) => {
    val counts = Tables.documents(s, d)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_s"))
    Tables.documents(s, d).select(col("doc_id"), col("lang"))
      .join(broadcast(counts), Seq("lang"))
      .withColumn("h", expr("pmod(doc_id * 2246822519, 1000)"))
      .filter(col("h") * col("h") * col("n_s") < lit(TEMP_K * TEMP_K * 1000L * 1000L))
      .select(col("doc_id"), col("lang"), col("n_s"))
      .orderBy(col("doc_id"))
  }

  /** p08: progressive quality-tier CURRICULUM order — the "easy/clean
    * first" schedule curriculum-training runs consume: tier 2 (longest,
    * cleanest proxy) trains in every epoch, tier 1 joins from epoch 2,
    * tier 0 only in the final epoch, and WITHIN an epoch the admitted
    * docs are shuffled by a p06-style deterministic mix (different odd
    * multipliers, so the two samplers are decorrelated). The consumer
    * reads in (epoch, ord_key) order — the order is a pure function of
    * the row, so it survives partitioning, retries, and engines, and
    * there is deliberately NO global row_number: a rank column would
    * force a single-partition window at scale, while the sort key
    * needs only one balanced range sort (p06's shape). Tier arithmetic
    * is integer CASE on n_chars; admission is `tier ≥ 3 − epoch` —
    * all-BIGINT, no float surface. */
  val p08_curriculum: Q = (s, d) => {
    val keyExpr =
      """pmod(pmod(doc_id * 2654435761 + epoch * 48271, 2147483647)
        |     * 69621, 2147483647)""".stripMargin
    Tables.documents(s, d)
      .selectExpr("doc_id",
        "CASE WHEN n_chars >= 300 THEN 2 WHEN n_chars >= 150 THEN 1 ELSE 0 END AS tier")
      .withColumn("epoch", explode(sequence(lit(1), lit(3))))
      .filter(col("tier") >= lit(3) - col("epoch"))
      .selectExpr("epoch", "doc_id", "CAST(tier AS INT) AS tier",
        s"$keyExpr AS ord_key")
      .orderBy(col("epoch"), col("ord_key"), col("doc_id"))
  }

  /** h05: COUNT-MIN sketch with its exact twin in one query — the
    * approximate counter structure streaming/feature pipelines use for
    * term frequencies, built and evaluated distributed: depth 2 × width
    * [[CMS_W]] counters (portable polynomial hashes, bases 31/37 over
    * the first 8 chars — all arithmetic < 2⁵³ so both engines compute
    * it exactly), estimate = min over rows of the term's bucket sum.
    * Unlike h01's HLL (engine-internal sketch → rows-only check), every
    * CMS counter here is plain SUM/MIN arithmetic, so the WHOLE sketch
    * is hash-exact across engines, and the output exhibits the CMS
    * contract inline: est ≥ tf always (overcount column), equality when
    * no collision. Scale shape: the corpus collapses to its VOCABULARY
    * in the first aggregate (t10's property); everything after —
    * bucket census (2·W rows), the two broadcast joins, the top-20 —
    * is vocab-sized or constant-sized. */
  val CMS_W = 64
  private def cmsHashExpr(base: Int): String =
    s"""aggregate(transform(sequence(1, length(t8)),
       |  i -> CAST(ascii(substring(t8, i, 1)) AS BIGINT)),
       |  CAST(0 AS BIGINT), (acc, x) -> acc * $base + x)""".stripMargin
  val h05_countmin: Q = (s, d) => {
    val tf = Tables.documents(s, d)
      .selectExpr("explode(split(text, ' ')) AS term")
      .groupBy(col("term")).agg(count(lit(1)).as("tf"))
      .withColumn("t8", expr("substring(term, 1, 8)"))
      .selectExpr("term", "tf",
        s"pmod(${cmsHashExpr(31)}, $CMS_W) AS b0",
        s"pmod(${cmsHashExpr(37)}, $CMS_W) AS b1")
      .cache() // vocab-sized; read by the census and the estimate join
    val counters = tf
      .selectExpr("tf", "stack(2, 0, b0, 1, b1) AS (r, bucket)")
      .groupBy(col("r"), col("bucket")).agg(sum(col("tf")).as("cnt"))
    val c0 = counters.filter(col("r") === 0)
      .select(col("bucket").as("b0"), col("cnt").as("c0"))
    val c1 = counters.filter(col("r") === 1)
      .select(col("bucket").as("b1"), col("cnt").as("c1"))
    tf.join(broadcast(c0), "b0").join(broadcast(c1), "b1")
      .selectExpr("term", "tf", "least(c0, c1) AS est",
        "least(c0, c1) - tf AS overcount")
      .orderBy(col("tf").desc, col("term").asc)
      .limit(20)
  }

  /** h07 sketch size: estimates use the k-th smallest hash, so error
    * ~ 1/√k ≈ 12.5%; the audit column shows the realized error. */
  val KMV_K = 64

  /** h07: KMV (k-minimum-values / bottom-k) DISTINCT SKETCH — the
    * mergeable distinct-count sketch that, unlike HLL (h01), is fully
    * DETERMINISTIC given the hash function and therefore
    * oracle-checkable hash-exact: hash every user to a fixed
    * 31-bit multiplicative value, keep each event_type's K smallest
    * distinct hashes, and estimate distinct users as
    * (K−1)·M div h_K (Bar-Yossef et al. 2002); below K distinct
    * values the sketch IS the exact set. The realized signed error
    * vs the exact count rides along in permille — h02's exact twin
    * built into the same row, the audit a pipeline runs before
    * trusting sketched cardinalities at 100 TB.
    *
    * Scale shape: the PRODUCTION sketch form — ONE map-side-combining
    * typed aggregate ([[graft.agg.SketchAggregators.BottomK]]) whose
    * state is the K smallest distinct hashes per group (K bounded longs,
    * merged by keeping the K smallest of each union). No distinct
    * census, no rank window, no per-group sort anywhere: the shuffle
    * carries ≤ K longs per group per partition, and the estimator reads
    * size(sk) and element_at(sk, K). `sk_size` = |sketch| =
    * min(distinct, K) — below K the sketch IS the exact distinct set. */
  val h07_kmv_distinct: Q = (s, d) => {
    val P = 2147483647L
    val sk = Tables.events(s, d)
      .selectExpr("event_type",
        s"(user_id * 2654435761) % $P AS h")
      .groupBy(col("event_type"))
      .agg(graft.agg.SketchAggregators.bottomK(KMV_K)(col("h")).as("sk"))
      .selectExpr("event_type",
        "CAST(size(sk) AS BIGINT) AS sk_size",
        s"""CASE WHEN size(sk) < $KMV_K THEN CAST(size(sk) AS BIGINT)
           |     ELSE ${(KMV_K - 1) * P}L div element_at(sk, $KMV_K)
           |END AS est_users""".stripMargin)
    val exact = Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    sk.join(exact, "event_type")
      .selectExpr("event_type", "sk_size", "est_users", "exact_users",
        """CAST(CASE WHEN est_users >= exact_users
          |  THEN (est_users - exact_users) * 1000 div exact_users
          |  ELSE -((exact_users - est_users) * 1000 div exact_users)
          |END AS BIGINT) AS err_pm""".stripMargin)
      .orderBy(col("event_type"))
  }

  /** p09: DSIR-style IMPORTANCE WEIGHTS (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling",
    * unigram-feature form): every document's mean per-token log-ratio
    * between a TARGET unigram distribution (here the `lang = 'en'`
    * slice, standing in for the curated target corpus DSIR samples
    * toward) and the RAW corpus distribution, in signed CENTIBITS —
    * positive = more target-like than the corpus average, the
    * resampling key DSIR feeds its Gumbel top-k. The logs run in
    * [[FixedLog]]'s exact fixed-point arithmetic (w(term) =
    * (log2cb tf_t − log2cb T_t) − (log2cb tf_r − log2cb T_r); four
    * separate log terms, so nothing is ever multiplied toward 2⁶³),
    * making the weights hash-exact cross-engine. Terms outside the
    * target vocabulary contribute ZERO (back-off to the raw
    * distribution) — the documented simplification vs DSIR's smoothed
    * hashed-n-gram features; they still count in n_tokens.
    *
    * Rounding: half-AWAY-FROM-ZERO via an explicit sign CASE — Spark
    * `div` and DuckDB `//` both truncate toward zero, so the positive
    * half-up formula alone would bias negative means.
    *
    * Scale shape: one corpus-sized doc-term aggregate (text never
    * shuffles); both vocab censuses and the weight table are
    * vocab-sized; the weight join is term-keyed (broadcast at benchmark
    * scale); the per-doc aggregate reuses the doc-term partitioning. */
  val p09_dsir_weights: Q = (s, d) => {
    val docTerm = Tables.documents(s, d)
      .selectExpr("doc_id", "lang", "explode(split(text, ' ')) AS term")
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"), col("lang"), col("term"))
      .agg(count(lit(1)).as("k"))
      .cache() // totals collect + both censuses + the final join reuse it
    val rawV = docTerm.groupBy(col("term")).agg(sum(col("k")).as("tf_r"))
    val tgtV = docTerm.filter(col("lang") === "en")
      .groupBy(col("term")).agg(sum(col("k")).as("tf_t"))
    // both corpus totals in ONE aggregate, materialized as TWO driver
    // scalars (the scalar-subquery shape; bounded like the PQ codebook
    // collect) and folded to literal centibits via the same FixedLog
    // table the SQL fragments splice — integer adds are associative, so
    // the folded constant equals the oracle's four-term sum exactly. A
    // broadcast cross join of the 1-row totals would plan the
    // BroadcastNestedLoopJoin shape the global plan audit forbids.
    val totRow = docTerm.agg(
      sum(col("k")).as("tot_r"),
      sum(when(col("lang") === "en", col("k"))).as("tot_t")).head()
    val cCb = FixedLog.log2Cb(totRow.getLong(0)) - FixedLog.log2Cb(totRow.getLong(1))
    val weights = tgtV.join(rawV, "term")
      .selectExpr("term",
        s"""CAST((${FixedLog.sparkLog2Cb("tf_t")} - ${FixedLog.sparkLog2Cb("tf_r")})
           |   + (${cCb}L)
           | AS BIGINT) AS w_cb""".stripMargin)
    docTerm.join(weights, Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("k") * coalesce(col("w_cb"), lit(0L))).as("sum_cb"),
        sum(col("k")).as("n_tokens"))
      .selectExpr("doc_id", "n_tokens",
        """CASE WHEN sum_cb >= 0
          |  THEN CAST((2 * sum_cb + n_tokens) div (2 * n_tokens) AS BIGINT)
          |  ELSE -CAST((2 * -sum_cb + n_tokens) div (2 * n_tokens) AS BIGINT)
          |END AS avg_w_cb""".stripMargin)
      .selectExpr("doc_id", "n_tokens", "avg_w_cb",
        "CAST(avg_w_cb > 0 AS INT) AS keep")
      .orderBy(col("doc_id"))
  }

  /** Global sampling budget p10 allocates (rows of training data). */
  val ALLOC_BUDGET = 1000L

  /** p10: LARGEST-REMAINDER BUDGET ALLOCATION — split a global sampling
    * budget across sources exactly proportionally: quotaᵢ =
    * ⌊B·nᵢ/N⌋ plus one extra for the top-r remainders (r = B − Σ⌊·⌋;
    * tie → source asc), the Hamilton apportionment every mixture
    * sampler needs before it can draw ("sample 1000 docs matching the
    * corpus mix" — naive rounding over- or under-spends the budget;
    * largest-remainder is the unique exact-sum proportional rule).
    * Σ quota = B by construction, all BIGINT.
    *
    * Scale shape: the corpus collapses to the source census in one
    * map-side aggregate; every window (total, leftover, remainder rank)
    * runs over census rows — sources are countable, the corpus is not.
    * The quota table then broadcasts back onto p01's deterministic
    * per-stratum sampler to actually draw. */
  val p10_budget_alloc: Q = (s, d) => {
    val wAll = Window.partitionBy()
    Tables.documents(s, d)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("total", sum(col("n_docs")).over(wAll))
      .selectExpr("source", "n_docs",
        s"CAST($ALLOC_BUDGET * n_docs div total AS BIGINT) AS fl",
        s"CAST(($ALLOC_BUDGET * n_docs) % total AS BIGINT) AS rem")
      .withColumn("leftover", lit(ALLOC_BUDGET) - sum(col("fl")).over(wAll))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("source").asc)))
      .selectExpr("source", "n_docs",
        "CAST(fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota")
      .orderBy(col("source"))
  }

  /** p11: SPLIT LEAKAGE AUDIT — how many of d02's near-dup pairs CROSS
    * p02's train/val/test boundaries: the audit that catches benchmark
    * leakage at its source (a near-dup pair straddling train/test means
    * the test answer is in the training set — exactly what d07/d09
    * remove; THIS measures how much there is to remove and whether the
    * split function leaks systematically). Split labels come from p02's
    * own hash rule applied to the pair's ids — a pure projection, no
    * join against a split table; pairs are classified as unordered
    * (least/greatest) so (train,test) and (test,train) are one class.
    *
    * Scale shape: d02's pair set is the expensive artifact (computed
    * once, capped by BUCKET_CAP); the audit itself is a narrow
    * projection + a ≤ 6-row aggregate. */
  /** p13: SPLIT-LEAKAGE REPAIR — the fix to the condition p11 measures:
    * every near-dup CLUSTER (c02's transitive components over d02's pair
    * artifact) is reassigned wholesale to its representative's split
    * (the component label = min doc_id — deterministic, and the member
    * whose hash-split the cluster inherits), so no d02 near-dup pair can
    * cross a train/val/test boundary afterwards. Emits only the MOVED
    * docs (doc, cluster, old → new split) — the delta a pipeline applies
    * and logs, not a full re-listing.
    *
    * Scale shape: consumes the memoized label artifact (ArtifactCache —
    * zero marginal near-dup cost after c02); the repair itself is one
    * left join of corpus ids against the thin label table + a narrow
    * hash projection. Unclustered docs keep their split by construction
    * (coalesce to own id), so the output is O(docs-in-clusters), never
    * corpus-sized. */
  val p13_split_repair: Q = (s, d) => {
    def splitOf(c: String): String =
      s"""CASE WHEN pmod($c * 2654435761, 1000) < 800 THEN 'train'
         |     WHEN pmod($c * 2654435761, 1000) < 900 THEN 'val'
         |     ELSE 'test' END""".stripMargin
    val base = Tables.documents(s, d).select(col("doc_id"))
    val corpus = base.unionByName(base.select(
      (col("doc_id") + lit(DedupQueries.copyShift(s, d))).as("doc_id")))
    // the label artifact is a stats-less LogicalRDD — dispatch the join
    // by hash explicitly (the repo's no-SortMergeJoin discipline; labels
    // are thin, so the hash build side is cheap at any corpus size)
    corpus
      .join(CurationQueries.d02Labels(s, d).hint("SHUFFLE_HASH"),
        Seq("doc_id"), "left")
      .selectExpr("doc_id", "coalesce(cluster_id, doc_id) AS cluster_id")
      .selectExpr("doc_id", "cluster_id",
        s"${splitOf("doc_id")} AS old_split",
        s"${splitOf("cluster_id")} AS new_split")
      .filter(col("old_split") =!= col("new_split"))
      .orderBy(col("doc_id"))
  }

  val p11_split_leakage: Q = (s, d) => {
    def splitOf(c: String): String =
      s"""CASE WHEN pmod($c * 2654435761, 1000) < 800 THEN 'train'
         |     WHEN pmod($c * 2654435761, 1000) < 900 THEN 'val'
         |     ELSE 'test' END""".stripMargin
    DedupQueries.d02Pairs(s, d)
      .selectExpr(
        s"least(${splitOf("doc_a")}, ${splitOf("doc_b")}) AS split_a",
        s"greatest(${splitOf("doc_a")}, ${splitOf("doc_b")}) AS split_b")
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .selectExpr("split_a", "split_b", "n_pairs",
        "CAST(split_a <> split_b AS INT) AS leak")
      .orderBy(col("split_a"), col("split_b"))
  }

  /** h06: MERGEABLE LOG₂ HISTOGRAM — per-type event-value histogram in
    * power-of-two cent buckets (bucket = bit length of the cents
    * value), the h01/h02-family trade made explicit for DISTRIBUTIONS:
    * h03's exact quantiles need a per-group sort, while this histogram
    * is one partial aggregate whose buckets merge by addition — the
    * shape you stream, checkpoint (IncrementalAgg), and union across
    * 100 TB partitions for the price of a count. Buckets are exact
    * integer arithmetic (`length(bin(cents))` — no float log), and the
    * per-bucket count + exact cent total let a reader reconstruct
    * coarse quantiles and means without touching rows again.
    *
    * Scale shape: one narrow scan, one (type, bucket) partial agg —
    * ≤ types·64 rows ever shuffle. */
  val h06_log_histogram: Q = (s, d) => {
    Tables.events(s, d)
      .selectExpr("event_type",
        "CAST(round(value * 100.0D) AS BIGINT) AS cents")
      .selectExpr("event_type", "cents",
        "CAST(CASE WHEN cents <= 0 THEN 0 ELSE length(bin(cents)) END AS BIGINT) AS bucket")
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("total_cents"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** p12: DETERMINISTIC SOURCE INTERLEAVE — a total training order in
    * which every prefix holds each source in proportion to its corpus
    * share, with NO randomness: doc at per-source rank r gets the
    * Bresenham key (r−1)·N div n_s, and sorting by (key, source,
    * doc_id) interleaves sources the way a proportional round-robin
    * scheduler would (any prefix's per-source count deviates from
    * exact proportionality by ≤ ~1 — the spec pins ≤ 2 with ties). This
    * is the mixture SCHEDULER to p03/p07's mixture SELECTORS: they
    * decide what's in the mix, this decides the order the trainer
    * consumes it — and unlike orderBy(rand(seed)) it is stable across
    * engines, partitionings and retries (p06's contract, with
    * proportionality added).
    *
    * Scale shape: one source-keyed rank window (sub-shard a giant
    * source like p04 at need), census broadcast for n_s, and the final
    * sort is the one balanced range sort every total order costs —
    * deliberately NO global rank column (p08's single-partition-window
    * avoidance). */
  val p12_interleave_order: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val census = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    val wAll = Window.partitionBy()
    val sized = census.withColumn("n_total", sum(col("n_s")).over(wAll))
    val wSrc = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    docs
      .withColumn("r", row_number().over(wSrc).cast("long"))
      .join(broadcast(sized), "source")
      .selectExpr("doc_id", "source",
        "CAST((r - 1) * n_total div n_s AS BIGINT) AS pos_key")
      .orderBy(col("pos_key"), col("source"), col("doc_id"))
  }

  /** p15 probe rectangles over the 256×256 (xb, yb) bucket grid —
    * fixed literals shared by both engines and the spec. Shapes chosen
    * to exercise the trade: wide-x/narrow-y (a 1-D x-sort cannot prune
    * at all), narrow-x/wide-y (the x-sort's home turf), squares at the
    * corners/center, and two mid slabs. */
  private[ops] val ZQ: Seq[(Int, Int, Int, Int)] = Seq(
    (0, 255, 0, 31), (0, 255, 224, 255), (0, 31, 0, 255),
    (96, 159, 96, 159), (0, 63, 0, 63), (192, 255, 192, 255),
    (112, 143, 0, 255), (64, 191, 64, 95))

  /** p15 file count per layout. */
  private[ops] val ZF = 64

  /** p15: Z-ORDER LAYOUT SKIPPING AUDIT — the lakehouse data-layout
    * decision, measured: orders are bucketed onto a 256×256 equi-width
    * grid over (o_custkey, price-cents), laid out into [[ZF]] equal
    * files two ways — 1-D sorted by custkey bucket vs sorted by the
    * 16-bit Morton (bit-interleaved) z-value — and each of the [[ZQ]]
    * probe rectangles reports how many files each layout's per-file
    * (min,max) zone maps fail to prune. This is exactly the min/max
    * skipping a parquet reader applies from PushedFilters, so the
    * report IS the scan-cost model for choosing a layout at 100 TB.
    *
    * Scale shape: bucket bounds are two scalar aggregates; the bucket
    * and z columns are one narrow compiled pass. The file assignment
    * uses ntile over the global order — the oracle-deterministic
    * stand-in for the production writer's
    * `repartitionByRange(F, z).sortWithinPartitions(z)` (sampled range
    * boundaries; no global sort). Zone-map stats are one
    * map-side-combinable groupBy per layout (ZF rows each); the probe
    * evaluation stacks fixed literals — no joins, so the audit itself
    * is shuffle-light at any corpus size. */
  val p15_zorder_skipping: Q = (s, d) => {
    val base = Tables.orders(s, d).selectExpr("o_orderkey",
      "o_custkey AS xv",
      "CAST(round(o_totalprice * 100.0D) AS BIGINT) AS yv")
    val r = base.agg(min(col("xv")), max(col("xv")),
      min(col("yv")), max(col("yv"))).head()
    val (xmin, xmax, ymin, ymax) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val zExpr = (0 until 8).map(b =>
      s"((xb div ${1L << b}) % 2) * ${1L << (2 * b)} + " +
        s"((yb div ${1L << b}) % 2) * ${1L << (2 * b + 1)}").mkString(" + ")
    val bz = base.selectExpr("o_orderkey",
        s"((xv - $xmin) * 256) div ${xmax - xmin + 1} AS xb",
        s"((yv - $ymin) * 256) div ${ymax - ymin + 1} AS yb")
      .selectExpr("o_orderkey", "xb", "yb", s"CAST($zExpr AS BIGINT) AS z")
      .cache()
    def fileFlags(orderCol: String, tag: String): DataFrame = bz
      .withColumn("fid", ntile(ZF).over(
        Window.orderBy(col(orderCol), col("o_orderkey"))))
      .groupBy(col("fid"))
      .agg(min(col("xb")).as("mnx"), max(col("xb")).as("mxx"),
        min(col("yb")).as("mny"), max(col("yb")).as("mxy"))
      .selectExpr(s"'$tag' AS kind", s"stack(${ZQ.size}, " +
        ZQ.zipWithIndex.map { case ((xl, xh, yl, yh), i) =>
          s"$i, CASE WHEN mnx <= $xh AND mxx >= $xl AND mny <= $yh " +
            s"AND mxy >= $yl THEN 1 ELSE 0 END"
        }.mkString(", ") + ") AS (qid, hit)")
    val rowFlags = bz.selectExpr("'row' AS kind", s"stack(${ZQ.size}, " +
      ZQ.zipWithIndex.map { case ((xl, xh, yl, yh), i) =>
        s"$i, CASE WHEN xb BETWEEN $xl AND $xh AND yb BETWEEN $yl " +
          s"AND $yh THEN 1 ELSE 0 END"
      }.mkString(", ") + ") AS (qid, hit)")
    fileFlags("xb", "lin").unionByName(fileFlags("z", "zor"))
      .unionByName(rowFlags)
      .groupBy(col("qid"))
      .agg(
        sum(when(col("kind") === "row", col("hit")).otherwise(0))
          .cast("long").as("rows_sel"),
        sum(when(col("kind") === "lin", col("hit")).otherwise(0))
          .cast("long").as("files_linear"),
        sum(when(col("kind") === "zor", col("hit")).otherwise(0))
          .cast("long").as("files_zorder"))
      .selectExpr("CAST(qid AS BIGINT) AS query_id", "rows_sel",
        "files_linear", "files_zorder")
      .orderBy(col("query_id"))
  }

  def queries: Map[String, Q] = Map(
    "p15_zorder_skipping" -> p15_zorder_skipping,
    "p12_interleave_order" -> p12_interleave_order,
    "h06_log_histogram" -> h06_log_histogram,
    "p11_split_leakage" -> p11_split_leakage,
    "p13_split_repair" -> p13_split_repair,
    "p10_budget_alloc" -> p10_budget_alloc,
    "p09_dsir_weights" -> p09_dsir_weights,
    "p08_curriculum" -> p08_curriculum,
    "h05_countmin" -> h05_countmin,
    "p07_temperature_mix" -> p07_temperature_mix,
    "r01_rollup" -> r01_rollup,
    "r02_cube" -> r02_cube,
    "r03_grouping_sets" -> r03_grouping_sets,
    "h07_kmv_distinct" -> h07_kmv_distinct,
    "p16_packing_efficiency" -> p16_packing_efficiency,
    "p14_rendezvous" -> p14_rendezvous,
    "s01_salted_agg" -> s01_salted_agg,
    "h01_approx_distinct" -> h01_approx_distinct,
    "h02_exact_distinct" -> h02_exact_distinct,
    "h03_exact_quantiles" -> h03_exact_quantiles,
    "h04_heavy_hitters" -> h04_heavy_hitters,
    "p01_stratified_sample" -> p01_stratified_sample,
    "p02_train_val_test" -> p02_train_val_test,
    "p03_domain_mix" -> p03_domain_mix,
    "p04_sequence_pack" -> p04_sequence_pack,
    "p05_quality_epochs" -> p05_quality_epochs,
    "s02_skew_join" -> s02_skew_join,
    "s03_bloom_prejoin" -> s03_bloom_prejoin,
    "p06_shuffle_order" -> p06_shuffle_order)

  def oracleSql: Map[String, String] = Map(
    // p15: same grid/Morton/ntile arithmetic; per-query scalar probes
    "p15_zorder_skipping" -> {
      val zDuck = (0 until 8).map(b =>
        s"((xb // ${1L << b}) % 2) * ${1L << (2 * b)} + " +
          s"((yb // ${1L << b}) % 2) * ${1L << (2 * b + 1)}").mkString(" + ")
      val probes = ZQ.zipWithIndex.map { case ((xl, xh, yl, yh), i) =>
        s"""SELECT $i::BIGINT AS query_id,
           |  (SELECT count(*) FROM bz
           |   WHERE xb BETWEEN $xl AND $xh
           |     AND yb BETWEEN $yl AND $yh)::BIGINT AS rows_sel,
           |  (SELECT count(*) FROM lstat WHERE mnx <= $xh AND mxx >= $xl
           |     AND mny <= $yh AND mxy >= $yl)::BIGINT AS files_linear,
           |  (SELECT count(*) FROM zstat WHERE mnx <= $xh AND mxx >= $xl
           |     AND mny <= $yh AND mxy >= $yl)::BIGINT AS files_zorder"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH base AS (
         |  SELECT o_orderkey, o_custkey AS xv,
         |         round(o_totalprice * 100)::BIGINT AS yv FROM orders),
         |bnd AS (SELECT min(xv) AS mnx, max(xv) AS mxx,
         |               min(yv) AS mny, max(yv) AS mxy FROM base),
         |bz AS MATERIALIZED (
         |  SELECT o_orderkey, xb, yb, ($zDuck) AS z FROM (
         |    SELECT o_orderkey,
         |      ((xv - (SELECT mnx FROM bnd)) * 256)
         |        // ((SELECT mxx FROM bnd) - (SELECT mnx FROM bnd) + 1)
         |        AS xb,
         |      ((yv - (SELECT mny FROM bnd)) * 256)
         |        // ((SELECT mxy FROM bnd) - (SELECT mny FROM bnd) + 1)
         |        AS yb
         |    FROM base)),
         |lin AS (SELECT xb, yb,
         |          ntile($ZF) OVER (ORDER BY xb, o_orderkey) AS fid FROM bz),
         |zor AS (SELECT xb, yb,
         |          ntile($ZF) OVER (ORDER BY z, o_orderkey) AS fid FROM bz),
         |lstat AS (SELECT fid, min(xb) AS mnx, max(xb) AS mxx,
         |                 min(yb) AS mny, max(yb) AS mxy
         |          FROM lin GROUP BY fid),
         |zstat AS (SELECT fid, min(xb) AS mnx, max(xb) AS mxx,
         |                 min(yb) AS mny, max(yb) AS mxy
         |          FROM zor GROUP BY fid)
         |$probes
         |ORDER BY query_id""".stripMargin
    },
    // p12: same per-source ranks, census and Bresenham key
    "p12_interleave_order" ->
      """WITH census AS (
        |  SELECT source, count(*)::BIGINT AS n_s FROM documents GROUP BY 1),
        |sized AS (
        |  SELECT source, n_s, sum(n_s) OVER ()::BIGINT AS n_total FROM census),
        |ranked AS (
        |  SELECT doc_id, source,
        |         (row_number() OVER (PARTITION BY source ORDER BY doc_id))::BIGINT AS r
        |  FROM documents)
        |SELECT doc_id, ranked.source,
        |       ((r - 1) * n_total // n_s)::BIGINT AS pos_key
        |FROM ranked JOIN sized ON sized.source = ranked.source
        |ORDER BY pos_key, ranked.source, doc_id""".stripMargin,
    // h06: same integer cents, same bit-length buckets (DuckDB bin()
    // prints the same minimal binary string for positive BIGINTs)
    "h06_log_histogram" ->
      """SELECT event_type,
        |       CASE WHEN cents <= 0 THEN 0
        |            ELSE length(bin(cents)) END AS bucket,
        |       count(*)::BIGINT AS n_events,
        |       sum(cents)::BIGINT AS total_cents
        |FROM (SELECT event_type,
        |             CAST(round(value * 100.0) AS BIGINT) AS cents
        |      FROM events)
        |GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""".stripMargin,
    // p13: d02's pair CTEs + c02's unrolled closure + p02's split rule;
    // the repair target is the closure's min-id label
    "p13_split_repair" -> {
      def splitDuck(c: String): String =
        s"""CASE WHEN ($c * 2654435761) % 1000 < 800 THEN 'train'
           |     WHEN ($c * 2654435761) % 1000 < 900 THEN 'val'
           |     ELSE 'test' END""".stripMargin
      s"""WITH ${DedupQueries.d02OracleCtes},
         |near AS (${DedupQueries.d02OraclePairSelect}),
         |${CurationQueries.duckClosureCtes},
         |corpus_ids AS (
         |  SELECT doc_id FROM documents
         |  UNION ALL
         |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents)
         |  FROM documents),
         |assigned AS (
         |  SELECT c.doc_id, coalesce(cl.lbl, c.doc_id) AS cluster_id
         |  FROM corpus_ids c LEFT JOIN clusters cl ON cl.doc_id = c.doc_id)
         |SELECT doc_id, cluster_id,
         |       ${splitDuck("doc_id")} AS old_split,
         |       ${splitDuck("cluster_id")} AS new_split
         |FROM assigned
         |WHERE ${splitDuck("doc_id")} <> ${splitDuck("cluster_id")}
         |ORDER BY doc_id""".stripMargin
    },
    // p11: d02's shared pair CTEs + p02's split rule as a projection
    "p11_split_leakage" ->
      s"""WITH ${DedupQueries.d02OracleCtes},
         |near AS (${DedupQueries.d02OraclePairSelect}),
         |cls AS (
         |  SELECT least(
         |           CASE WHEN (doc_a * 2654435761) % 1000 < 800 THEN 'train'
         |                WHEN (doc_a * 2654435761) % 1000 < 900 THEN 'val'
         |                ELSE 'test' END,
         |           CASE WHEN (doc_b * 2654435761) % 1000 < 800 THEN 'train'
         |                WHEN (doc_b * 2654435761) % 1000 < 900 THEN 'val'
         |                ELSE 'test' END) AS split_a,
         |         greatest(
         |           CASE WHEN (doc_a * 2654435761) % 1000 < 800 THEN 'train'
         |                WHEN (doc_a * 2654435761) % 1000 < 900 THEN 'val'
         |                ELSE 'test' END,
         |           CASE WHEN (doc_b * 2654435761) % 1000 < 800 THEN 'train'
         |                WHEN (doc_b * 2654435761) % 1000 < 900 THEN 'val'
         |                ELSE 'test' END) AS split_b
         |  FROM near)
         |SELECT split_a, split_b, count(*)::BIGINT AS n_pairs,
         |       CAST(split_a <> split_b AS INT) AS leak
         |FROM cls GROUP BY split_a, split_b
         |ORDER BY split_a, split_b""".stripMargin,
    // p10: same census, same floor/remainder arithmetic, same
    // (rem DESC, source ASC) extra-seat ranking
    "p10_budget_alloc" ->
      s"""WITH census AS (
         |  SELECT source, count(*)::BIGINT AS n_docs
         |  FROM documents GROUP BY source),
         |t AS (
         |  SELECT source, n_docs, sum(n_docs) OVER () AS total FROM census),
         |f AS (
         |  SELECT source, n_docs,
         |         ($ALLOC_BUDGET * n_docs // total)::BIGINT AS fl,
         |         (($ALLOC_BUDGET * n_docs) % total)::BIGINT AS rem
         |  FROM t),
         |g AS (
         |  SELECT source, n_docs, fl, rem,
         |         $ALLOC_BUDGET - sum(fl) OVER () AS leftover,
         |         row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
         |  FROM f)
         |SELECT source, n_docs,
         |       (fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)::BIGINT AS quota
         |FROM g ORDER BY source""".stripMargin,
    // p09: the same four FixedLog terms and the same sign-CASE rounding;
    // terms absent from the target vocab coalesce to weight 0
    "p09_dsir_weights" ->
      s"""WITH dt AS (
         |  SELECT doc_id, lang, term, count(*)::BIGINT AS k
         |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
         |        FROM documents)
         |  WHERE term <> ''
         |  GROUP BY doc_id, lang, term),
         |rawv AS (SELECT term, sum(k)::BIGINT AS tf_r FROM dt GROUP BY term),
         |tgtv AS (SELECT term, sum(k)::BIGINT AS tf_t FROM dt
         |         WHERE lang = 'en' GROUP BY term),
         |tot AS (SELECT (SELECT sum(tf_r)::BIGINT FROM rawv) AS tot_r,
         |               (SELECT sum(tf_t)::BIGINT FROM tgtv) AS tot_t),
         |w AS (
         |  SELECT term,
         |         ((${FixedLog.duckLog2Cb("tf_t")} - ${FixedLog.duckLog2Cb("tot_t")})
         |          - (${FixedLog.duckLog2Cb("tf_r")} - ${FixedLog.duckLog2Cb("tot_r")}))::BIGINT AS w_cb
         |  FROM tgtv JOIN rawv USING (term), tot),
         |agg AS (
         |  SELECT doc_id,
         |         sum(k * coalesce(w_cb, 0))::BIGINT AS sum_cb,
         |         sum(k)::BIGINT AS n_tokens
         |  FROM dt LEFT JOIN w USING (term)
         |  GROUP BY doc_id)
         |SELECT doc_id, n_tokens,
         |       avg_w_cb, (avg_w_cb > 0)::INT AS keep
         |FROM (SELECT doc_id, n_tokens,
         |        CASE WHEN sum_cb >= 0
         |          THEN ((2 * sum_cb + n_tokens) // (2 * n_tokens))::BIGINT
         |          ELSE -((2 * -sum_cb + n_tokens) // (2 * n_tokens))::BIGINT
         |        END AS avg_w_cb
         |      FROM agg)
         |ORDER BY doc_id""".stripMargin,
    // p08: integer tier CASE + the p06-style multiply-mix key; DuckDB's
    // % on positive BIGINTs equals Spark's pmod here
    "p08_curriculum" ->
      """SELECT e.epoch::INT AS epoch, d.doc_id,
        |       (CASE WHEN d.n_chars >= 300 THEN 2
        |             WHEN d.n_chars >= 150 THEN 1 ELSE 0 END)::INT AS tier,
        |       ((d.doc_id * 2654435761 + e.epoch * 48271) % 2147483647)
        |         * 69621 % 2147483647 AS ord_key
        |FROM documents d, LATERAL (SELECT unnest([1, 2, 3]) AS epoch) e
        |WHERE (CASE WHEN d.n_chars >= 300 THEN 2
        |            WHEN d.n_chars >= 150 THEN 1 ELSE 0 END) >= 3 - e.epoch
        |ORDER BY epoch, ord_key, doc_id""".stripMargin,
    // h05: the polynomial hash as an explicit power sum — identical to
    // the Spark side's Horner recurrence (Σ c_j·B^(L−j)); every term is
    // < 2⁵³ so the double-typed ** is exact before the BIGINT cast.
    // coalesce guards the (absent in this corpus) empty-token edge where
    // DuckDB's list_sum of an empty list is NULL but Spark's aggregate
    // returns the 0 seed.
    "h05_countmin" -> {
      def h(base: Int) =
        s"""coalesce(list_sum(list_transform(range(1, len(t8) + 1),
           |  j -> (unicode(t8[j]) * ($base ** (len(t8) - j)))::BIGINT)), 0)""".stripMargin
      s"""WITH tf AS (
         |  SELECT term, count(*) AS tf
         |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
         |  GROUP BY term),
         |hashed AS (
         |  SELECT term, tf,
         |         ${h(31)} % $CMS_W AS b0,
         |         ${h(37)} % $CMS_W AS b1
         |  FROM (SELECT term, tf, substr(term, 1, 8) AS t8 FROM tf)),
         |counters AS (
         |  SELECT r, bucket, sum(tf) AS cnt
         |  FROM (SELECT tf, 0 AS r, b0 AS bucket FROM hashed
         |        UNION ALL
         |        SELECT tf, 1 AS r, b1 AS bucket FROM hashed)
         |  GROUP BY r, bucket)
         |SELECT h.term, h.tf::BIGINT AS tf,
         |       least(c0.cnt, c1.cnt)::BIGINT AS est,
         |       (least(c0.cnt, c1.cnt) - h.tf)::BIGINT AS overcount
         |FROM hashed h
         |JOIN counters c0 ON c0.r = 0 AND c0.bucket = h.b0
         |JOIN counters c1 ON c1.r = 1 AND c1.bucket = h.b1
         |ORDER BY tf DESC, term ASC LIMIT 20""".stripMargin
    },
    // p07: the squared-threshold comparison keeps the τ=0.5 sampling
    // rule in pure BIGINT on both engines (see the Spark-side scaladoc)
    "p07_temperature_mix" ->
      s"""WITH counts AS (
         |  SELECT lang, count(*) AS n_s FROM documents GROUP BY lang)
         |SELECT d.doc_id, d.lang, c.n_s
         |FROM documents d JOIN counts c USING (lang)
         |WHERE ((d.doc_id * 2246822519) % 1000)
         |    * ((d.doc_id * 2246822519) % 1000) * c.n_s
         |    < ${TEMP_K * TEMP_K * 1000L * 1000L}
         |ORDER BY d.doc_id""".stripMargin,
    // p16: p04's running-offset window verbatim; identical boundary,
    // truncation and fill arithmetic
    "p16_packing_efficiency" -> {
      val C = CONTEXT_TOKENS
      s"""WITH b AS (
         |  SELECT doc_id, source,
         |         len(string_split(text, ' '))::BIGINT AS tokens
         |  FROM documents),
         |p AS (
         |  SELECT source, tokens,
         |         coalesce(sum(tokens) OVER (PARTITION BY source
         |           ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |           0) AS off
         |  FROM b),
         |a AS (
         |  SELECT source, count(*)::BIGINT AS n_docs,
         |         sum(tokens)::BIGINT AS total_tokens,
         |         sum(CASE WHEN off // $C != (off + tokens - 1) // $C
         |                  THEN 1 ELSE 0 END)::BIGINT AS n_split_docs,
         |         sum(least(tokens, $C))::BIGINT AS used_naive,
         |         sum(CASE WHEN tokens > $C THEN 1 ELSE 0 END)::BIGINT
         |           AS n_trunc_docs
         |  FROM p GROUP BY source)
         |SELECT source, n_docs, total_tokens, n_split_docs, n_trunc_docs,
         |       ((total_tokens + ${C - 1}) // $C)::BIGINT AS packed_seqs,
         |       (((total_tokens + ${C - 1}) // $C) * $C - total_tokens
         |         )::BIGINT AS packed_pad,
         |       n_docs AS naive_seqs,
         |       (n_docs * $C - used_naive)::BIGINT AS naive_pad,
         |       (total_tokens * 1000 //
         |        (((total_tokens + ${C - 1}) // $C) * $C))::BIGINT
         |         AS packed_fill_pm,
         |       (used_naive * 1000 // (n_docs * $C))::BIGINT
         |         AS naive_fill_pm
         |FROM a ORDER BY source""".stripMargin
    },
    // h07: identical multiplicative hash, bottom-k rank and estimator;
    // every divide is on non-negative values (sign CASE for err_pm).
    // sk_size = least(distinct, K) = |the Spark side's bounded sketch|
    "h07_kmv_distinct" ->
      s"""WITH h AS (
         |  SELECT DISTINCT event_type,
         |         (user_id * 2654435761) % 2147483647 AS h
         |  FROM events),
         |r AS (
         |  SELECT event_type, h,
         |         row_number() OVER (PARTITION BY event_type
         |           ORDER BY h ASC) AS rn
         |  FROM h),
         |sk AS (
         |  SELECT event_type,
         |         least(count(*), $KMV_K)::BIGINT AS sk_size,
         |         CASE WHEN count(*) < $KMV_K THEN count(*)
         |              ELSE ${(KMV_K - 1) * 2147483647L}
         |                   // max(CASE WHEN rn = $KMV_K THEN h END)
         |         END::BIGINT AS est_users
         |  FROM r GROUP BY event_type),
         |ex AS (
         |  SELECT event_type, count(DISTINCT user_id)::BIGINT
         |           AS exact_users
         |  FROM events GROUP BY event_type)
         |SELECT sk.event_type, sk_size, est_users, exact_users,
         |       (CASE WHEN est_users >= exact_users
         |         THEN (est_users - exact_users) * 1000 // exact_users
         |         ELSE -((exact_users - est_users) * 1000 // exact_users)
         |        END)::BIGINT AS err_pm
         |FROM sk JOIN ex USING (event_type)
         |ORDER BY event_type""".stripMargin,
    // r03: same cents + GROUPING() bitmask discipline as r02; the set
    // list is spelled identically in both engines
    "r03_grouping_sets" ->
      """WITH li AS (
        |  SELECT CAST(round(l_extendedprice * 100.0) AS BIGINT) AS cents,
        |         l_returnflag, l_linestatus,
        |         year(l_shipdate)::BIGINT AS ship_year
        |  FROM lineitem)
        |SELECT l_returnflag, l_linestatus, ship_year,
        |       sum(cents)::BIGINT / 100.0 AS revenue, count(*) AS n,
        |       (GROUPING(l_returnflag) * 4 + GROUPING(l_linestatus) * 2
        |        + GROUPING(ship_year))::BIGINT AS g
        |FROM li
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (ship_year), ())
        |ORDER BY g ASC, l_returnflag ASC NULLS FIRST,
        |         l_linestatus ASC NULLS FIRST, ship_year ASC NULLS FIRST""".stripMargin,
    // r02: same cents discipline; DuckDB GROUPING() returns the same
    // 0/1 per column, so g is the identical bitmask
    "r02_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))::BIGINT / 100.0 AS revenue,
        |       count(*) AS n,
        |       (GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus))::BIGINT AS g
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY g ASC, l_returnflag ASC NULLS FIRST,
        |         l_linestatus ASC NULLS FIRST""".stripMargin,
    // p14: identical weight chain and argmax encoding; the census
    // re-derives both assignments in one aggregate
    "p14_rendezvous" ->
      s"""WITH h AS (
         |  SELECT doc_id, s.shard AS shard,
         |         (doc_id * 2654435761 + (s.shard + 1) * 2246822519)
         |           % 2147483647 AS h1
         |  FROM documents,
         |       LATERAL (SELECT unnest(range(0, ${HRW_SHARDS + 1})) AS shard) s),
         |w AS (
         |  SELECT doc_id, shard, (h1 * h1) % 2147483647 AS w FROM h),
         |a AS (
         |  SELECT doc_id,
         |         15 - (max(CASE WHEN shard < $HRW_SHARDS
         |                        THEN w * 16 + (15 - shard) END) % 16)
         |           AS shard_s,
         |         15 - (max(w * 16 + (15 - shard)) % 16) AS shard_s1
         |  FROM w GROUP BY doc_id)
         |SELECT shard_s::BIGINT AS shard_s, count(*)::BIGINT AS n_docs,
         |       sum(CASE WHEN shard_s1 <> shard_s THEN 1 ELSE 0 END)::BIGINT
         |         AS n_moved,
         |       (sum(CASE WHEN shard_s1 <> shard_s THEN 1 ELSE 0 END) * 1000
         |        // count(*))::BIGINT AS moved_permille
         |FROM a GROUP BY shard_s ORDER BY shard_s""".stripMargin,
    "r01_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))::BIGINT / 100.0 AS revenue,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "s01_salted_agg" ->
      """SELECT event_type, count(*) AS n,
        |       sum(CAST(round(value * 100.0) AS BIGINT))::BIGINT / 100.0 AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // h01 intentionally has no oracle (approximate by construction) →
    // rows-only check; h02 is its exact oracle-checked twin
    "h02_exact_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "h03_exact_quantiles" ->
      """WITH r AS (
        |  SELECT event_type,
        |         CAST(round(value * 100.0) AS BIGINT) AS cents,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY CAST(round(value * 100.0) AS BIGINT), event_id) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT event_type,
        |  max(CASE WHEN rn = greatest(1, ceil(n * 0.25)::BIGINT) THEN cents END)::BIGINT / 100.0 AS p25,
        |  max(CASE WHEN rn = greatest(1, ceil(n * 0.5)::BIGINT) THEN cents END)::BIGINT / 100.0 AS p50,
        |  max(CASE WHEN rn = greatest(1, ceil(n * 0.75)::BIGINT) THEN cents END)::BIGINT / 100.0 AS p75,
        |  count(*) AS n_events
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    "h04_heavy_hitters" ->
      """SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |      FROM documents)
        |GROUP BY term ORDER BY tf DESC, term ASC LIMIT 20""".stripMargin,
    "p02_train_val_test" ->
      """SELECT doc_id, lang,
        |       CASE WHEN (doc_id * 2654435761) % 1000 < 800 THEN 'train'
        |            WHEN (doc_id * 2654435761) % 1000 < 900 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "p03_domain_mix" ->
      """WITH c AS (
        |  SELECT lang, count(*) AS n_s FROM documents GROUP BY lang),
        |r AS (
        |  SELECT lang,
        |         least(1000,
        |           (((SELECT sum(n_s) FROM c)::BIGINT // (SELECT count(*) FROM c)) * 1000)
        |             // n_s)::BIGINT AS keep_rate
        |  FROM c)
        |SELECT d.doc_id, d.lang, r.keep_rate
        |FROM documents d JOIN r USING (lang)
        |WHERE (d.doc_id * 2654435761) % 1000 < r.keep_rate
        |ORDER BY d.doc_id""".stripMargin,
    "p04_sequence_pack" ->
      """SELECT doc_id, source, tokens::INT AS tokens,
        |       (off // 2048)::BIGINT AS bin,
        |       (off % 2048)::BIGINT AS pos
        |FROM (
        |  SELECT doc_id, source, tokens,
        |         coalesce(sum(tokens) OVER (PARTITION BY source ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS off
        |  FROM (SELECT doc_id, source,
        |               len(string_split(text, ' ')) AS tokens
        |        FROM documents))
        |ORDER BY doc_id""".stripMargin,
    "s02_skew_join" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |       sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))::BIGINT / 100.0 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "p06_shuffle_order" ->
      """SELECT doc_id, epoch,
        |       ((doc_id * 2654435761 + epoch * 40503) % 2147483647
        |        * 2246822519 + 1013904223) % 2147483647 AS shuffle_key
        |FROM documents, LATERAL (SELECT unnest([1, 2]) AS epoch)
        |ORDER BY shuffle_key, doc_id""".stripMargin,
    "s03_bloom_prejoin" ->
      """SELECT l_returnflag, count(*) AS n_lines,
        |       sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))::BIGINT / 100.0 AS revenue
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "p05_quality_epochs" ->
      s"""WITH base AS (
         |  SELECT doc_id, lang,
         |         len(string_split(text, ' ')) AS n_words,
         |         ${TextQueries.duckHitExpr(TextQueries.markers.head._2)} AS sw_hits,
         |         len(list_distinct(string_split(text, ' '))) AS n_distinct
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, lang,
         |         ${TextQueries.qualityExprDuck} AS quality,
         |         (doc_id * 2654435761) % 1000 AS bucket
         |  FROM base),
         |e AS (
         |  SELECT doc_id, lang, quality,
         |         CASE WHEN quality >= 0.7 THEN 2
         |              WHEN quality >= ${TextQueries.QUALITY_FLOOR} THEN 1
         |              WHEN bucket < 250 THEN 1 ELSE 0 END AS n_epochs
         |  FROM q WHERE n_epochs > 0)
         |SELECT doc_id, lang, quality, n_epochs::INT AS n_epochs, epoch::INT AS epoch
         |FROM (SELECT doc_id, lang, quality, n_epochs,
         |             unnest(range(1, n_epochs + 1)) AS epoch
         |      FROM e)
         |ORDER BY doc_id, epoch""".stripMargin,
    "p01_stratified_sample" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |         (doc_id * 2654435761) % 1000 AS bucket,
        |         CASE WHEN lang = 'en' THEN 500 WHEN lang = 'de' THEN 250
        |              WHEN lang = 'es' THEN 250 WHEN lang = 'fr' THEN 100
        |              WHEN lang = 'zh' THEN 100 ELSE 0 END AS keep_rate
        |  FROM documents)
        |WHERE bucket < keep_rate ORDER BY doc_id""".stripMargin)
}
