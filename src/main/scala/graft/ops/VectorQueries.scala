package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.embed.DeterministicEmbedder
import graft.model.Tables
import graft.vec.VectorOps

/** Vector similarity operators (SURVEY §2.4 K1/K2 — the reference's
  * flagship): brute-force cosine top-k over the embeddings table, scored by
  * a query vector resolved on the driver and shipped inside the scoring
  * expression.
  *
  * Plan shape at scale: scored scan is embarrassingly parallel (no
  * shuffle); `orderBy(score).limit(k)` plans TakeOrderedAndProject — a
  * per-partition k-heap plus a k-bounded driver merge. On a 1000-executor
  * cluster only k rows per partition ever leave the scan.
  *
  * Tie-break is explicit `(score DESC, id ASC)` — the reference relies on
  * Python's stable sort (`rclip_server.py:197`); we make determinism
  * structural.
  */
object VectorQueries {

  type Q = (SparkSession, String) => DataFrame

  val embedder = new DeterministicEmbedder(64)

  /** Resolved flagship query vector — the `zebra -stripes +spots` shape
    * from README.md:15 mapped onto the testdata labels (SURVEY §7.5):
    * +⟨label5⟩ −⟨label6⟩, combined and renormalized per
    * `rclip_server.py:136-141`. A pure function of the query text, so the
    * identical literal can be embedded in the DuckDB oracle. */
  val flagshipVec: Array[Float] = VectorOps.combine(Seq(
    1.0f -> embedder.embedText("label5"),
    -1.0f -> embedder.embedText("label6"))).get

  private def topK(s: SparkSession, d: String, q: Array[Float], k: Int): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d)
      .select($"vec_id",
        round(VectorOps.dotQueryNative($"embedding", q), 4).as("score"))
      .orderBy($"score".desc, $"vec_id".asc)
      .limit(k)
  }

  /** K1: flagship brute-force cosine top-k (UI always asks num=1000;
    * server default 12 — `rclip_server.py:391`, html:226). */
  val v01_search_topk: Q = (s, d) => topK(s, d, flagshipVec, 12)

  /** K1 at UI fan-out (num=1000) with a single positive term. */
  val v02_search_top1000: Q = (s, d) =>
    topK(s, d, embedder.embedText("label3"), 1000)

  /** S1 BLOB variant: encode every embedding into the reference's on-disk
    * format (BLOB of little-endian float32, `index_wikimedia.py:64`),
    * decode it back at scan (`rclip_server.py:215`), and emit scalars of
    * the decoded vector. The oracle computes the same scalars from the
    * original parquet array — a hash match proves vec_decode ∘ vec_encode is the
    * identity on every row (endianness itself is pinned byte-for-byte in
    * VectorExpressionsSpec). Both codec hops are codegen static calls, so
    * the whole query is one WholeStageCodegen scan. */
  val v03_blob_roundtrip: Q = (s, d) => {
    VectorOps.ensureRegistered(s)
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        VectorOps.decodeVec(VectorOps.encodeVec(col("embedding"))).as("dec"))
      .select(col("vec_id"),
        expr("size(dec)").as("dim"),
        // + 0.0 normalizes IEEE -0.0 → 0.0 (DuckDB round keeps the sign
        // of a negative value that rounds to zero; Spark's drops it)
        (round(expr("CAST(element_at(dec, 1) AS DOUBLE)"), 4) + lit(0.0)).as("x0"),
        round(VectorOps.normColNative(col("dec")), 4).as("nrm"))
      .orderBy(col("vec_id"))
  }

  /** A1/A2: element-wise min/max over all embeddings — the reference's
    * startup statistics (`rclip_server.py:63-65`). Emitted as (dim, lo,
    * hi) rows so the oracle compares scalars, not arrays. posexplode →
    * groupBy(pos) is one narrow shuffle of N×d rows; at 100 TB the
    * per-partition partial min/max (map-side combine) keeps the shuffle at
    * 32×d rows. */
  val v04_vector_stats: Q = (s, d) => {
    import s.implicits._
    Tables.embeddings(s, d)
      .select(posexplode($"embedding").as(Seq("pos", "x")))
      .groupBy($"pos".cast("long").as("dim"))
      .agg(round(min($"x").cast("double"), 4).as("lo"),
           round(max($"x").cast("double"), 4).as("hi"))
      .orderBy($"dim")
  }

  /** Symmetric per-vector int8 quantization: scale = max|xᵢ|/127,
    * qᵢ = floor(xᵢ·127/max + 0.5) ∈ [−127, 127]. Shared by the v06 row
    * UDF and the driver-side query quantization so both sides of the dot
    * product use the identical arithmetic. floor, not round: floor reads
    * the binary double identically on every engine, while round() half-up
    * behavior differs between Spark (decimal repr) and DuckDB (binary) at
    * repr ties. */
  private[ops] def quantize(v: Array[Float]): Array[Long] = {
    var m = 0.0
    v.foreach(x => m = math.max(m, math.abs(x.toDouble)))
    if (m == 0.0) Array.fill(v.length)(0L)
    else v.map(x => math.floor(x.toDouble * 127.0 / m + 0.5).toLong)
  }

  /** v06: top-k by int8-QUANTIZED dot product — the memory-compression
    * path real ANN deployments run (4 bytes → 1 byte per dim; at 100 TB
    * of fp32 embeddings that is 75 TB less scan). Scoring is all-integer
    * (BIGINT products of int8 codes), so the query has zero float
    * rounding surface; the spec asserts ranking fidelity vs the exact
    * fp32 top-k. */
  /** Quantized-dot scoring column against a pre-quantized query — shared
    * by v06 and the n05 coarse pass, now the native codegen `vec_qdot`
    * (the row-side quantization is fused into the generated loop with
    * arithmetic bit-identical to quantize(), so the oracle literal, the
    * query codes, and the row kernel cannot desynchronize — the
    * VectorExpressionsSpec pins expression == quantize()-dot). */
  private[ops] def quantizedDot(qq: Array[Long])(v: org.apache.spark.sql.Column) =
    VectorOps.qdotQueryNative(v, qq)

  /** The v06/n05 coarse-scoring SQL (DuckDB): per-row int8 quantization +
    * all-integer dot against the quantized query literal. */
  private[ops] def quantizedDotDuck(qq: Array[Long]): String =
    s"""WITH m AS (
       |  SELECT vec_id, embedding,
       |         list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS m
       |  FROM embeddings)
       |SELECT vec_id,
       |  (CASE WHEN m = 0 THEN 0
       |        ELSE list_sum(list_transform(range(1, len(embedding) + 1),
       |               i -> floor(embedding[i]::DOUBLE * 127.0 / m + 0.5)::BIGINT
       |                    * (${qq.mkString("[", ",", "]")}::BIGINT[])[i]))
       |   END)::BIGINT AS qdot
       |FROM m""".stripMargin

  val v06_quantized_topk: Q = (s, d) => {
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        quantizedDot(quantize(flagshipVec))(col("embedding")).as("qdot"))
      .orderBy(col("qdot").desc, col("vec_id").asc)
      .limit(10)
  }

  /** v07: per-DIMENSION calibration statistics — mean, std, range, and
    * the per-channel int8 scale (absmax/127) for every embedding
    * dimension. v06 quantizes per-vector; production int8 deployments
    * calibrate per-channel from exactly these statistics, and mean/std
    * also feed whitening and drift monitoring. Determinism discipline:
    * values are fixed to integer MICRO-units via floor(x·10⁶ + 0.5)
    * (floor, not round — v06's repr-tie rationale), summed exactly in
    * BIGINT (|mi| ≤ 2·10⁶, mi² ≤ 4·10¹²: safe past 10⁶ rows/dim; at
    * 100 TB widen to DECIMAL(38) partials), and only then divided as
    * doubles — both engines perform the IDENTICAL IEEE operations on
    * identical integers, so no rounding surface exists at all. Shape:
    * posexplode → one (dim)-keyed agg with map-side partial combine
    * (shuffle ≤ 32·d rows), same as v04. */
  val v07_dim_calibration: Q = (s, d) => {
    import s.implicits._
    val meanExpr = "sum(mi) / (count(1) * 1000000.0D)"
    Tables.embeddings(s, d)
      .select(posexplode($"embedding").as(Seq("pos", "x")))
      .selectExpr("pos",
        "CAST(floor(CAST(x AS DOUBLE) * 1000000.0D + 0.5D) AS BIGINT) AS mi",
        "CAST(x AS DOUBLE) AS xd")
      .groupBy($"pos".cast("long").as("dim"))
      .agg(
        count(lit(1)).as("n"),
        expr(meanExpr).as("mean"),
        expr(s"sqrt(greatest(sum(mi * mi) / (count(1) * 1000000000000.0D) " +
          s"- ($meanExpr) * ($meanExpr), 0.0D))").as("std"),
        (round(min($"xd"), 4) + lit(0.0)).as("lo"),
        (round(max($"xd"), 4) + lit(0.0)).as("hi"),
        expr("greatest(abs(min(xd)), abs(max(xd))) / 127.0D").as("scale"))
      .orderBy($"dim")
  }

  /** v08: LABEL-CENTROID GEOMETRY — inter-class separation audit: the 20
    * closest pairs of per-label centroids by squared cosine, the check an
    * embedding-space curator runs to find confusable / collapsing classes
    * before training. All arithmetic is exact: centroids are sign-safe
    * half-up micro-unit means (BIGINT), dots and norms are BIGINT sums of
    * micro products (|cm| ≤ 10⁶ ⇒ per-dim product ≤ 10¹², 64-dim sums ≤
    * 6.4·10¹³), and the squared cosine is a DECIMAL(38) rational —
    * dot²·10⁹ ≤ 4.2·10³⁶ and nrm·nrm ≤ 4.1·10²⁷ both fit DECIMAL(38)/
    * HUGEINT, so signed cos²·10⁹ div's to the same BIGINT everywhere
    * (sqrt would be float; squaring the ranking key avoids it, the p07
    * compare-squares discipline).
    *
    * Scale shape: one (label, dim) partial aggregate collapses the
    * corpus to |labels|·dim thin rows; the pairwise stage is dim-keyed
    * over centroid rows only — quadratic in CLASS COUNT (thousands at
    * most), never in corpus size. */
  /** Sign-safe half-up micro-unit centroid mean over (smi = Σmi, n) —
    * ONE definition shared by v08 and v10 (and mirrored in both
    * oracles), so the centroid arithmetic cannot drift between the
    * geometry audit and the drift audit. */
  private val microMeanCm: String =
    """CASE WHEN smi >= 0
      |  THEN CAST((2 * smi + n) div (2 * n) AS BIGINT)
      |  ELSE -CAST((2 * -smi + n) div (2 * n) AS BIGINT)
      |END AS cm""".stripMargin

  val v08_centroid_geometry: Q = (s, d) => {
    import s.implicits._
    val cent = Tables.embeddings(s, d)
      .select(col("label").cast("long").as("label"),
        posexplode($"embedding").as(Seq("pos", "x")))
      .selectExpr("label", "pos",
        "CAST(floor(CAST(x AS DOUBLE) * 1000000.0D + 0.5D) AS BIGINT) AS mi")
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("mi")).as("smi"), count(lit(1)).as("n"))
      .selectExpr("label", "pos", microMeanCm)
    val norms = cent.groupBy(col("label"))
      .agg(sum(col("cm") * col("cm")).as("nrm"))
      .filter(col("nrm") > 0)
    val dots = cent.toDF("label_a", "pos", "cm_a")
      .join(cent.toDF("label_b", "pos", "cm_b"), "pos")
      .filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum(col("cm_a") * col("cm_b")).as("dot"))
    dots
      .join(norms.toDF("label_a", "nrm_a"), "label_a")
      .join(norms.toDF("label_b", "nrm_b"), "label_b")
      .selectExpr("label_a", "label_b",
        """CASE WHEN dot >= 0
          |  THEN CAST((CAST(dot AS DECIMAL(38,0)) * dot * 1000000000)
          |            div (CAST(nrm_a AS DECIMAL(38,0)) * nrm_b) AS BIGINT)
          |  ELSE -CAST((CAST(dot AS DECIMAL(38,0)) * dot * 1000000000)
          |             div (CAST(nrm_a AS DECIMAL(38,0)) * nrm_b) AS BIGINT)
          |END AS cos2_ppb""".stripMargin)
      .orderBy(col("cos2_ppb").desc, col("label_a").asc, col("label_b").asc)
      .limit(20)
  }

  /** v09: EMBEDDING-NORM OUTLIER AUDIT — the top-20 vectors by distance
    * from the corpus' norm distribution center, each flagged against the
    * Tukey IQR fence (lo/hi/in): the curation check that catches broken
    * encoder output (zero vectors, exploding activations) before
    * training. Everything is exact integer arithmetic: norms are BIGINT
    * micro² via the native codegen `vec_nrm2_micro` (no sqrt —
    * comparisons are monotone in the square, the v08 compare-squares
    * discipline; a higher-order lambda here would be interpreted per
    * element, the documented #1 per-row cost), quantiles are h03's
    * discrete order statistic (value at rank ceil(p·n), type-1), and
    * the 1.5·IQR fence is cross-multiplied (2·nrm2 < 5·q1 − 3·q3 /
    * > 5·q3 − 3·q1) so no fraction ever materializes.
    *
    * Scale shape: the norm pass is one narrow zero-shuffle codegen scan;
    * quantile runs over the norm CENSUS (distinct nrm2 → count, one
    * thin aggregate) with a census-sized cumulative window; q1/q3 come
    * back as two bounded driver scalars (p09's scalar-subquery shape)
    * and fold into the flagging scan as literals. At 100 TB the census
    * window's single partition bounds by DISTINCT norm values — if that
    * degenerates, swap the pick for a 2-round distributed binary search;
    * the fence arithmetic is unchanged. */
  val v09_norm_outliers: Q = (s, d) => {
    VectorOps.ensureRegistered(s)
    val norms = Tables.embeddings(s, d)
      .select(col("vec_id"),
        VectorOps.nrm2MicroNative(col("embedding")).as("nrm2")).cache()
    val n = norms.count()
    val census = norms.groupBy(col("nrm2")).agg(count(lit(1)).as("c"))
    val cum = census
      .withColumn("cum", sum(col("c")).over(
        Window.orderBy(col("nrm2"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    def pick(p: String): Long = cum
      .filter(col("cum") >= expr(s"greatest(CAST(1 AS BIGINT), CAST(ceil($n * $p) AS BIGINT))"))
      .agg(min(col("nrm2"))).head().getLong(0)
    val (q1, q3) = (pick("0.25D"), pick("0.75D"))
    norms.selectExpr("vec_id", "nrm2",
        s"abs(2 * nrm2 - ${q1 + q3}L) AS dev",
        s"""CASE WHEN 2 * nrm2 < ${5 * q1 - 3 * q3}L THEN 'lo'
           |     WHEN 2 * nrm2 > ${5 * q3 - 3 * q1}L THEN 'hi'
           |     ELSE 'in' END AS flag""".stripMargin)
      .orderBy(col("dev").desc, col("vec_id").asc)
      .limit(20)
  }

  /** v10: EMBEDDING DRIFT AUDIT — per-label centroid movement between
    * two corpus snapshots (the check run before swapping in a
    * re-trained/upgraded encoder: labels whose centroid moved most are
    * where retrieval and dedup behavior will change). Snapshots are
    * deterministic views (i03's CDC discipline): OLD drops vec_id ≡ 5
    * (mod 13), NEW drops ≡ 3 (mod 11) and rescales ≡ 0 (mod 7) vectors
    * ×1.25 (modelling encoder-drift norm shift; the ×5/4 double product
    * rounds identically on both engines). Drift is the exact squared L2
    * between micro-unit centroids ([[microMeanCm]], v08's shared
    * formula) — BIGINT end to end, no sqrt.
    *
    * Scale shape: two (label, dim) partial aggregates collapse both
    * snapshots to |labels|·dim thin rows; every join after that is
    * label- or (label, dim)-sized. */
  val v10_centroid_drift: Q = (s, d) => {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val old = emb.filter(col("vec_id") % 13 =!= 5)
      .select(col("label"), col("embedding"))
    val neu = emb.filter(col("vec_id") % 11 =!= 3)
      .selectExpr("label",
        """CASE WHEN vec_id % 7 = 0
          |  THEN transform(embedding,
          |         x -> CAST(CAST(x AS DOUBLE) * 1.25D AS FLOAT))
          |  ELSE embedding END AS embedding""".stripMargin)
    def cents(v: DataFrame) = v
      .select(col("label").cast("long").as("label"),
        posexplode($"embedding").as(Seq("pos", "x")))
      .selectExpr("label", "pos",
        "CAST(floor(CAST(x AS DOUBLE) * 1000000.0D + 0.5D) AS BIGINT) AS mi")
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("mi")).as("smi"), count(lit(1)).as("n"))
      .selectExpr("label", "pos", microMeanCm)
    val drift = cents(old).withColumnRenamed("cm", "cm_o")
      .join(cents(neu).withColumnRenamed("cm", "cm_n"), Seq("label", "pos"))
      .groupBy(col("label"))
      .agg(sum((col("cm_n") - col("cm_o")) * (col("cm_n") - col("cm_o")))
        .as("drift_mic2"))
    val nO = old.groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n_old"))
    val nN = neu.groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n_new"))
    drift.join(nO, "label").join(nN, "label")
      .select(col("label"), col("n_old"), col("n_new"), col("drift_mic2"))
      .orderBy(col("label"))
  }

  /** Power-iteration budget for v11. The operator is DEFINED as the
    * 8-round integer iterate (c11's fixed-budget discipline), so
    * hash-exactness never depends on a convergence test. Alignment with
    * the asymptotic PC1 is DATA-dependent — error decays as (λ2/λ1)^r,
    * so a decaying spectrum (real text/image embeddings: top component
    * is the anisotropy direction, ratios ≈ 0.3-0.7) converges in a few
    * rounds, while the near-isotropic synthetic fixture (λ2/λ1 ≈ 0.93)
    * would need ~50; production tunes the budget to the measured gap.
    * The spec therefore pins the iterate against its FLOAT TWIN at the
    * same budget (arithmetic fidelity) plus strict Rayleigh ascent. */
  val PCA_ROUNDS = 8

  /** v11 fixed-point scales: eigenvector components live in
    * [−VSCALE, VSCALE]; the per-vector projection u is truncated by
    * USCALE before the second matrix touch so y = Xᵀ(Xv) stays under
    * 2⁶³ at any realistic corpus size (N·1.16·10⁶·1.5·10⁶ ≈ N·1.7·10¹²
    * — safe past 10⁶ rows; at true 100 TB widen y to DECIMAL(38)). */
  val PCA_VSCALE = 1000000L
  val PCA_USCALE = 100000000L

  /** v11: PRINCIPAL COMPONENT via fixed-point power iteration — the
    * top PCA direction of the (centered) embedding cloud, the
    * embedding-space health audit behind whitening, anisotropy checks
    * ("is the space collapsing to one axis?") and drift dashboards.
    * Everything is BIGINT: micro-unit quantization (v07's half-up
    * floor), integer-mean centering, and per-round
    * u = Xv (per-vector window sum) → truncate → y = Xᵀu → L∞
    * renormalize. Signed truncation is ALWAYS written
    * sign(x)·(abs(x) div k): Spark `div` truncates toward zero while
    * DuckDB `//` floors, so the sign/abs factoring is what keeps the
    * two engines on one arithmetic (the negative-domain divergence
    * trap). The normalizer k = max(1, max|y| div VSCALE) keeps every
    * division non-negative and the iterate's scale pinned.
    *
    * The matrix never materializes: the centered table is grouped ONCE
    * into per-vector qc arrays; each round is then a single narrow pass
    * (a closure UDF computes u = qc·v, truncates, emits qc·u′) folded
    * by the map-side-combining [[graft.agg.VectorAggregators.VecSumLong]]
    * aggregator, then a 64-value driver fold (t12's driver-held-table
    * discipline; the collect is dims-bounded). At 100 TB each round is
    * one map-side-combinable pass over the per-vector array table — the
    * textbook distributed power iteration with zero per-round
    * exchanges. */
  val v11_principal_component: Q = (s, d) => {
    import s.implicits._
    val tq0 = Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode($"embedding").as(Seq("pos", "x")))
      .selectExpr("vec_id", "CAST(pos + 1 AS BIGINT) AS dim",
        "CAST(floor(CAST(x AS DOUBLE) * 1000000.0D + 0.5D) AS BIGINT) AS q")
    val m = tq0.groupBy(col("dim"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
      .selectExpr("dim", "CAST(sign(sq) AS BIGINT) * (abs(sq) div n) AS md")
    val tq = tq0.join(m, "dim").selectExpr("vec_id", "dim", "q - md AS qc")
    // per-vector centered arrays in dim order: each round is then ONE
    // narrow map + map-side-combining VecSumLong pass (no per-vector
    // window shuffle, no dim-keyed exchange — the old shape paid both
    // per round), and the iterate rides a UDF CLOSURE instead of a
    // 64-literal array, so generated code is identical across rounds
    // (the literal form recompiled every round). Long arithmetic is
    // exact and order-free, so y is value-identical to the windowed
    // form and the oracle is untouched.
    val vecRows = tq
      .groupBy(col("vec_id"))
      .agg(sort_array(collect_list(struct(col("dim"), col("qc")))).as("ps"))
      .selectExpr("transform(ps, p -> p.qc) AS qc")
      .localCheckpoint(true)
    // max dim == the longest qc array (posexplode emits one row per
    // component), read off the checkpointed per-vector table instead of
    // re-deriving the exploded join
    val dims = vecRows.agg(max(size(col("qc")))).head().getInt(0)
    var v = Array.fill(dims)(PCA_VSCALE)
    for (_ <- 1 to PCA_ROUNDS) {
      val vCur = v // stable capture for the closure
      val contrib = udf { (qc: Seq[Long]) =>
        var u = 0L
        var i = 0
        val n = math.min(qc.length, vCur.length)
        while (i < n) { u += qc(i) * vCur(i); i += 1 }
        val t = math.signum(u) * (math.abs(u) / PCA_USCALE)
        val out = new Array[Long](qc.length)
        i = 0
        while (i < qc.length) { out(i) = qc(i) * t; i += 1 }
        out
      }
      val ys = graft.agg.VectorAggregators.vecSumLong(contrib(col("qc")))
      val yArr = vecRows.agg(ys.as("y")).head().getSeq[Long](0)
      val k = math.max(1L, yArr.map(math.abs).max / PCA_VSCALE)
      v = yArr.map(yv => math.signum(yv) * (math.abs(yv) / k)).toArray
    }
    (1 to dims).map(i => (i.toLong, v(i - 1))).toDF("dim", "pc1_fp")
      .orderBy(col("dim"))
  }

  /** v12 seeded ±1 Rademacher projection matrix (16 output dims × 64
    * input dims) — generated once, embedded as literal sign patterns in
    * BOTH dialects, replicated by the spec. */
  private[ops] val jlSigns: Array[Array[Int]] = {
    val rnd = new java.util.Random(11)
    Array.fill(16, 64)(if (rnd.nextBoolean()) 1 else -1)
  }

  /** v12 pair stride: pair (v, v + 17) over vec_id — a deterministic,
    * structure-free sample of the pair space on both engines. */
  private[ops] val JL_STRIDE = 17

  /** v12: JOHNSON–LINDENSTRAUSS PROJECTION AUDIT — the distance-
    * preservation certificate for the cheap-prefilter trick a 100 TB
    * similarity pipeline leans on: project 64-dim embeddings to 16 dims
    * with a seeded ±1 (Rademacher) matrix and report, over a
    * deterministic stride-[[JL_STRIDE]] pair sample, the census of
    * dproj²/(16·dorig²) in permille (E[·] = 1 under JL; the band spread
    * IS the ε you must budget when pre-filtering at 16 dims before
    * exact 64-dim rerank). All arithmetic is exact BIGINT after a
    * 1e4 quantization (micro-discipline of v06/v11): components ≤ 2.0
    * ⇒ |p_k| ≤ 1.28e6 ⇒ dproj·1000 ≤ ~1e17 < 2⁶³ by construction.
    *
    * Scale shape: projection is one narrow compiled pass per vector
    * (computed BEFORE the pair join, so each vector is projected once);
    * the pair join is a thin equi-join on a shifted id; the census is
    * band-sized. No windows, no state. */
  val v12_jl_projection: Q = (s, d) => {
    // projection as ONE compiled loop over the closure-held sign matrix:
    // the expression form was a 1024-term (16×64 element_at) tree that
    // Catalyst re-analyzed on every run and codegen'd as a monster
    // method; Long adds are exact and order-free, so p is value-identical
    // and the oracle (which splices the sign literals itself) unchanged.
    val signs = jlSigns
    val projUdf = udf { (q: Seq[Long]) =>
      val out = new Array[Long](signs.length)
      var k = 0
      while (k < signs.length) {
        val row = signs(k)
        var acc = 0L
        var j = 0
        val n = math.min(row.length, q.length)
        while (j < n) { acc += row(j) * q(j); j += 1 }
        out(k) = acc
        k += 1
      }
      out
    }
    val proj = Tables.embeddings(s, d)
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) " +
          "* 10000.0D + 0.5D) AS BIGINT)) AS q")
      .select(col("vec_id"), col("q"), projUdf(col("q")).as("p"))
    val b = proj.selectExpr(s"vec_id - $JL_STRIDE AS vec_id",
      "q AS qb", "p AS pb")
    proj.selectExpr("vec_id", "q AS qa", "p AS pa")
      .join(b.hint("shuffle_hash"), "vec_id")
      .selectExpr(
        "aggregate(zip_with(qa, qb, (x, y) -> (x - y) * (x - y)), " +
          "CAST(0 AS BIGINT), (acc, v) -> acc + v) AS dorig",
        "aggregate(zip_with(pa, pb, (x, y) -> (x - y) * (x - y)), " +
          "CAST(0 AS BIGINT), (acc, v) -> acc + v) AS dproj")
      .selectExpr("CASE WHEN dorig = 0 THEN CAST(1000 AS BIGINT) " +
        "ELSE dproj * 1000 div (16 * dorig) END AS ratio_pm")
      .groupBy(expr("ratio_pm div 250").as("band"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("ratio_pm")).as("sr"),
        min(col("ratio_pm")).as("min_ratio_pm"),
        max(col("ratio_pm")).as("max_ratio_pm"))
      .selectExpr("CAST(band AS BIGINT) AS band", "n_pairs",
        "CAST((2 * sr + n_pairs) div (2 * n_pairs) AS BIGINT) " +
          "AS mean_ratio_pm",
        "min_ratio_pm", "max_ratio_pm")
      .orderBy(col("band"))
  }

  /** v13: DIMENSION-CORRELATION AUDIT — the top-20 most-correlated
    * embedding dimension pairs by squared Pearson correlation (plus the
    * sign), computed from ONE distributed gramian pass
    * ([[graft.agg.GramianAggregator]]): each task folds its vectors
    * into a d(d+3)/2-entry integer buffer (n, Σqᵢ, Σqᵢ², Σqᵢqⱼ over
    * tenth-milli-quantized values), partials merge map-side, and the
    * driver receives ONE bounded row — the embeddings never shuffle and
    * nothing scales with N. Redundant (highly correlated) axes are what
    * whitening, PCA truncation (v11/v12) and product-quantization
    * subspace splits (n06/n07) all key off, so this is the audit run
    * before committing to any of them.
    *
    * The pair expansion and correlation arithmetic happen on the driver
    * over the d²-bounded gramian (exact BigInt — v09's bounded-scalar
    * discipline): cov = n·Σqᵢqⱼ − Σqᵢ·Σqⱼ, var likewise, and
    * corr²_ppb = (|cov| div 10⁴)²·10⁹ div ((varᵢ div 10⁴)·(varⱼ div
    * 10⁴)) — every divide is on non-negative integers so Spark's
    * truncating `div`, BigInt `/` and DuckDB's flooring `//` agree, and
    * the 10⁴ pre-scale keeps the oracle's HUGEINT under 2¹²⁷ up to
    * ~10⁵ rows beyond the 30× stress corpus. */
  val GRAM_DIM = 64

  val v13_dim_correlation: Q = (s, d) => {
    import s.implicits._
    val D = GRAM_DIM
    val g = Tables.embeddings(s, d)
      .agg(graft.agg.GramianAggregator.gramian(D)(col("embedding")).as("g"))
      .head().getSeq[Long](0)
    val n = BigInt(g(0))
    def si(i: Int) = BigInt(g(1 + i))
    def pii(i: Int) = BigInt(g(1 + D + i))
    val pairs = for {
      i <- 0 until D
      j <- (i + 1) until D
    } yield {
      val pij = BigInt(g(graft.agg.GramianAggregator.pairIndex(D, i, j)))
      val cov = n * pij - si(i) * si(j)
      val vik = (n * pii(i) - si(i) * si(i)) / 10000
      val vjk = (n * pii(j) - si(j) * si(j)) / 10000
      val ak = cov.abs / 10000
      val sgn = if (cov >= 0) 1L else -1L
      val c2 =
        if (vik > 0 && vjk > 0)
          ((ak * ak * BigInt(1000000000L)) / (vik * vjk)).toLong
        else -1L
      (i.toLong, j.toLong, sgn, c2)
    }
    pairs.filter(_._4 >= 0).toDF("dim_i", "dim_j", "sgn", "corr2_ppb")
      .orderBy(col("corr2_ppb").desc, col("dim_i").asc, col("dim_j").asc)
      .limit(20)
  }

  /** v14: ANISOTROPY / EMBEDDING-COLLAPSE AUDIT — the mean pairwise dot
    * product of the corpus relative to the mean self dot, in ppb:
    * isotropic (healthy) embedding clouds sit near 0, a collapsing
    * encoder (all outputs drifting toward one direction — the classic
    * contrastive-training failure) drives it toward 10⁹. Both moments
    * fall out of the SAME one-pass gramian v13 uses (Σᵢ(Σqᵢ)² counts
    * every pairwise dot once via (Σq)·(Σq); Σᵢ Σqᵢ² is the self mass),
    * so at 100 TB one persisted gramian artifact serves both audits —
    * no pair sampling, no second corpus pass. Exact BigInt throughout
    * (v13's discipline): aniso_ppb = sign·(|Σsᵢ² − ssq|·10⁹ div
    * ((n−1)·ssq)), every divide non-negative. */
  val v14_anisotropy: Q = (s, d) => {
    import s.implicits._
    val D = GRAM_DIM
    val g = Tables.embeddings(s, d)
      .agg(graft.agg.GramianAggregator.gramian(D)(col("embedding")).as("g"))
      .head().getSeq[Long](0)
    val n = BigInt(g(0))
    val ssq = (0 until D).map(i => BigInt(g(1 + D + i))).sum
    val normS = (0 until D).map(i => BigInt(g(1 + i)) * BigInt(g(1 + i))).sum
    val dif = normS - ssq
    val sgn = if (dif >= 0) 1L else -1L
    // raw Σsᵢ² exceeds 2⁶³ on large corpora — emit only n-normalized
    // moments (all ratios of BigInts, bounded by construction)
    val aniso =
      if (n > 1 && ssq > 0) (dif.abs * BigInt(1000000000L) / ((n - 1) * ssq)).toLong
      else 0L
    val meanSelf = if (n > 0) (ssq / n).toLong else 0L
    Seq((n.toLong, meanSelf, sgn, aniso))
      .toDF("n_vecs", "mean_self_q2", "sgn", "aniso_ppb")
  }

  def queries: Map[String, Q] = Map(
    "v14_anisotropy" -> v14_anisotropy,
    "v13_dim_correlation" -> v13_dim_correlation,
    "v12_jl_projection" -> v12_jl_projection,
    "v11_principal_component" -> v11_principal_component,
    "v10_centroid_drift" -> v10_centroid_drift,
    "v09_norm_outliers" -> v09_norm_outliers,
    "v08_centroid_geometry" -> v08_centroid_geometry,
    "v01_search_topk" -> v01_search_topk,
    "v02_search_top1000" -> v02_search_top1000,
    "v03_blob_roundtrip" -> v03_blob_roundtrip,
    "v04_vector_stats" -> v04_vector_stats,
    "v06_quantized_topk" -> v06_quantized_topk,
    "v07_dim_calibration" -> v07_dim_calibration)

  def oracleSql: Map[String, String] = Map(
    // v14: same quantization; Σsᵢ² and ssq combined in HUGEINT, output
    // only the bounded n-normalized moments
    "v14_anisotropy" ->
      """WITH m AS (
        |  SELECT vec_id, i,
        |         CAST(floor(x::DOUBLE * 10000.0 + 0.5) AS BIGINT) AS q
        |  FROM (SELECT vec_id, unnest(embedding) AS x,
        |               unnest(range(1, len(embedding)+1)) AS i
        |        FROM embeddings)),
        |s AS (
        |  SELECT i, sum(q)::HUGEINT AS si, sum(q * q)::HUGEINT AS pii
        |  FROM m GROUP BY i),
        |t AS (
        |  SELECT (SELECT count(*) FROM embeddings)::HUGEINT AS n,
        |         sum(pii) AS ssq, sum(si * si) AS norm_s
        |  FROM s)
        |SELECT n::BIGINT AS n_vecs, (ssq // n)::BIGINT AS mean_self_q2,
        |       (CASE WHEN norm_s >= ssq THEN 1 ELSE -1 END)::BIGINT AS sgn,
        |       (CASE WHEN n > 1 AND ssq > 0
        |         THEN abs(norm_s - ssq) * 1000000000 // ((n - 1) * ssq)
        |         ELSE 0 END)::BIGINT AS aniso_ppb
        |FROM t""".stripMargin,
    // v13: same tenth-milli quantization and gramian sums; HUGEINT for
    // the n·P − S·S combinations, all divides on non-negative values
    "v13_dim_correlation" ->
      """WITH m AS (
        |  SELECT vec_id, i,
        |         CAST(floor(x::DOUBLE * 10000.0 + 0.5) AS BIGINT) AS q
        |  FROM (SELECT vec_id, unnest(embedding) AS x,
        |               unnest(range(1, len(embedding)+1)) AS i
        |        FROM embeddings)),
        |s AS (
        |  SELECT i, count(*)::BIGINT AS n, sum(q)::BIGINT AS si,
        |         sum(q * q)::BIGINT AS pii
        |  FROM m GROUP BY i),
        |p AS (
        |  SELECT a.i AS ia, b.i AS ib, sum(a.q * b.q)::BIGINT AS pij
        |  FROM m a JOIN m b ON a.vec_id = b.vec_id AND a.i < b.i
        |  GROUP BY 1, 2),
        |c AS (
        |  SELECT ia, ib,
        |         sa.n::HUGEINT * pij - sa.si::HUGEINT * sb.si AS cov,
        |         (sa.n::HUGEINT * sa.pii - sa.si::HUGEINT * sa.si)
        |           // 10000 AS vik,
        |         (sb.n::HUGEINT * sb.pii - sb.si::HUGEINT * sb.si)
        |           // 10000 AS vjk
        |  FROM p JOIN s sa ON sa.i = p.ia JOIN s sb ON sb.i = p.ib)
        |SELECT (ia - 1)::BIGINT AS dim_i, (ib - 1)::BIGINT AS dim_j,
        |       (CASE WHEN cov >= 0 THEN 1 ELSE -1 END)::BIGINT AS sgn,
        |       ((abs(cov) // 10000) * (abs(cov) // 10000) * 1000000000
        |        // (vik * vjk))::BIGINT AS corr2_ppb
        |FROM c WHERE vik > 0 AND vjk > 0
        |ORDER BY corr2_ppb DESC, dim_i ASC, dim_j ASC LIMIT 20""".stripMargin,
    // v12: identical quantization, sign patterns and integer census
    "v12_jl_projection" -> {
      val pDuck = jlSigns.map(row => row.zipWithIndex.map { case (sg, j) =>
        (if (sg > 0) " + " else " - ") + s"q[${j + 1}]"
      }.mkString.stripPrefix(" + ")).map(e => s"($e)")
        .mkString("[", ", ", "]")
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id,
         |         list_transform(embedding,
         |           x -> floor(x::DOUBLE * 10000.0 + 0.5)::BIGINT) AS q
         |  FROM embeddings),
         |p AS MATERIALIZED (SELECT vec_id, q, $pDuck AS p FROM q),
         |pr AS (
         |  SELECT a.q AS qa, b.q AS qb, a.p AS pa, b.p AS pb
         |  FROM p a JOIN p b ON b.vec_id = a.vec_id + $JL_STRIDE),
         |m AS (
         |  SELECT
         |    list_sum(list_transform(range(1, len(qa) + 1),
         |      i -> (qa[i] - qb[i]) * (qa[i] - qb[i])))::BIGINT AS dorig,
         |    list_sum(list_transform(range(1, 17),
         |      i -> (pa[i] - pb[i]) * (pa[i] - pb[i])))::BIGINT AS dproj
         |  FROM pr),
         |r AS (
         |  SELECT CASE WHEN dorig = 0 THEN 1000::BIGINT
         |         ELSE dproj * 1000 // (16 * dorig) END AS ratio_pm
         |  FROM m)
         |SELECT (ratio_pm // 250)::BIGINT AS band, count(*)::BIGINT
         |         AS n_pairs,
         |       ((2 * sum(ratio_pm) + count(*)) // (2 * count(*)))::BIGINT
         |         AS mean_ratio_pm,
         |       min(ratio_pm)::BIGINT AS min_ratio_pm,
         |       max(ratio_pm)::BIGINT AS max_ratio_pm
         |FROM r GROUP BY band ORDER BY band""".stripMargin
    },
    // v11: the identical integer recurrence, rounds unrolled as
    // MATERIALIZED CTEs (c11's discipline); v lives as a dims-row CTE
    // joined per round where the engine interpolates a driver literal
    "v11_principal_component" -> {
      val rounds = (1 to PCA_ROUNDS).map { r =>
        s"""u$r AS MATERIALIZED (
           |  SELECT vec_id, sum(qc * v.r)::BIGINT AS u
           |  FROM tq JOIN v${r - 1} v ON tq.dim = v.dim GROUP BY vec_id),
           |y$r AS MATERIALIZED (
           |  SELECT tq.dim,
           |         sum(qc * (sign(u)::BIGINT * (abs(u) // $PCA_USCALE)))::BIGINT AS y
           |  FROM tq JOIN u$r USING (vec_id) GROUP BY tq.dim),
           |k$r AS (SELECT greatest(1, max(abs(y)) // $PCA_VSCALE) AS k FROM y$r),
           |v$r AS MATERIALIZED (
           |  SELECT dim, sign(y)::BIGINT * (abs(y) // (SELECT k FROM k$r)) AS r
           |  FROM y$r)""".stripMargin
      }.mkString(",\n")
      s"""WITH tq0 AS MATERIALIZED (
         |  SELECT vec_id, i AS dim, floor(x * 1000000 + 0.5)::BIGINT AS q
         |  FROM (SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
         |               unnest(range(1, len(embedding) + 1)) AS i
         |        FROM embeddings)),
         |m AS (
         |  SELECT dim, sign(sum(q))::BIGINT * (abs(sum(q)) // count(*)) AS md
         |  FROM tq0 GROUP BY dim),
         |tq AS MATERIALIZED (
         |  SELECT vec_id, tq0.dim AS dim, q - md AS qc
         |  FROM tq0 JOIN m ON tq0.dim = m.dim),
         |v0 AS (SELECT dim, $PCA_VSCALE::BIGINT AS r FROM m),
         |$rounds
         |SELECT dim, r::BIGINT AS pc1_fp FROM v$PCA_ROUNDS ORDER BY dim"""
        .stripMargin
    },
    // v10: same snapshot views, same micro-mean centroids (v08's
    // formula), same BIGINT squared-L2 drift
    "v10_centroid_drift" ->
      """WITH oldv AS (
        |  SELECT label::BIGINT AS label, embedding FROM embeddings
        |  WHERE vec_id % 13 <> 5),
        |newv AS (
        |  SELECT label::BIGINT AS label,
        |         CASE WHEN vec_id % 7 = 0
        |           THEN list_transform(embedding,
        |                  x -> (x::DOUBLE * 1.25)::FLOAT)
        |           ELSE embedding END AS embedding
        |  FROM embeddings WHERE vec_id % 11 <> 3),
        |eo AS (
        |  SELECT label, i - 1 AS pos,
        |         CAST(floor(x::DOUBLE * 1000000.0 + 0.5) AS BIGINT) AS mi
        |  FROM (SELECT label, unnest(embedding) AS x,
        |               unnest(range(1, len(embedding)+1)) AS i FROM oldv)),
        |co AS (
        |  SELECT label, pos,
        |         CASE WHEN sum(mi) >= 0
        |           THEN ((2 * sum(mi) + count(*)) // (2 * count(*)))::BIGINT
        |           ELSE -((2 * -sum(mi) + count(*)) // (2 * count(*)))::BIGINT
        |         END AS cm
        |  FROM eo GROUP BY label, pos),
        |en AS (
        |  SELECT label, i - 1 AS pos,
        |         CAST(floor(x::DOUBLE * 1000000.0 + 0.5) AS BIGINT) AS mi
        |  FROM (SELECT label, unnest(embedding) AS x,
        |               unnest(range(1, len(embedding)+1)) AS i FROM newv)),
        |cn AS (
        |  SELECT label, pos,
        |         CASE WHEN sum(mi) >= 0
        |           THEN ((2 * sum(mi) + count(*)) // (2 * count(*)))::BIGINT
        |           ELSE -((2 * -sum(mi) + count(*)) // (2 * count(*)))::BIGINT
        |         END AS cm
        |  FROM en GROUP BY label, pos),
        |no AS (SELECT label, count(*)::BIGINT AS n_old FROM oldv GROUP BY 1),
        |nn AS (SELECT label, count(*)::BIGINT AS n_new FROM newv GROUP BY 1)
        |SELECT c.label, n_old, n_new,
        |       sum((n2.cm - c.cm) * (n2.cm - c.cm))::BIGINT AS drift_mic2
        |FROM co c JOIN cn n2 ON n2.label = c.label AND n2.pos = c.pos
        |JOIN no ON no.label = c.label
        |JOIN nn ON nn.label = c.label
        |GROUP BY c.label, n_old, n_new ORDER BY c.label""".stripMargin,
    // v09: same micro² norms, same type-1 discrete quantiles (h03's
    // rank formula), same cross-multiplied Tukey fences — DuckDB
    // computes q1/q3 in-query where Spark folds the two driver scalars
    "v09_norm_outliers" ->
      """WITH nv AS (
        |  SELECT vec_id,
        |         list_sum(list_transform(embedding,
        |           x -> floor(x::DOUBLE * 1000000.0 + 0.5)::BIGINT
        |                * floor(x::DOUBLE * 1000000.0 + 0.5)::BIGINT))::BIGINT AS nrm2
        |  FROM embeddings),
        |stats AS (SELECT count(*) AS n FROM nv),
        |census AS (SELECT nrm2, count(*) AS c FROM nv GROUP BY 1),
        |cum AS (SELECT nrm2, sum(c) OVER (ORDER BY nrm2) AS cum FROM census),
        |qs AS (
        |  SELECT
        |    min(CASE WHEN cum >= greatest(1, ceil(0.25 * (SELECT n FROM stats)))
        |             THEN nrm2 END)::BIGINT AS q1,
        |    min(CASE WHEN cum >= greatest(1, ceil(0.75 * (SELECT n FROM stats)))
        |             THEN nrm2 END)::BIGINT AS q3
        |  FROM cum)
        |SELECT vec_id, nrm2,
        |       abs(2 * nrm2 - (q1 + q3))::BIGINT AS dev,
        |       CASE WHEN 2 * nrm2 < 5 * q1 - 3 * q3 THEN 'lo'
        |            WHEN 2 * nrm2 > 5 * q3 - 3 * q1 THEN 'hi'
        |            ELSE 'in' END AS flag
        |FROM nv, qs
        |ORDER BY dev DESC, vec_id ASC LIMIT 20""".stripMargin,
    // v08: same micro-mean centroids and compare-squares cosine; DuckDB
    // sums widen to HUGEINT which holds every bound above
    "v08_centroid_geometry" ->
      """WITH e AS (
        |  SELECT label::BIGINT AS label, i - 1 AS pos,
        |         CAST(floor(x::DOUBLE * 1000000.0 + 0.5) AS BIGINT) AS mi
        |  FROM (SELECT label, unnest(embedding) AS x,
        |               unnest(range(1, len(embedding)+1)) AS i
        |        FROM embeddings)),
        |cent AS (
        |  SELECT label, pos,
        |         CASE WHEN sum(mi) >= 0
        |           THEN ((2 * sum(mi) + count(*)) // (2 * count(*)))::BIGINT
        |           ELSE -((2 * -sum(mi) + count(*)) // (2 * count(*)))::BIGINT
        |         END AS cm
        |  FROM e GROUP BY label, pos),
        |norms AS (
        |  SELECT label, sum(cm * cm)::BIGINT AS nrm FROM cent
        |  GROUP BY label HAVING sum(cm * cm) > 0),
        |dots AS (
        |  SELECT a.label AS label_a, b.label AS label_b,
        |         sum(a.cm * b.cm)::BIGINT AS dot
        |  FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
        |  GROUP BY 1, 2)
        |SELECT label_a, label_b,
        |       CASE WHEN dot >= 0
        |         THEN ((dot::HUGEINT * dot * 1000000000)
        |               // (na.nrm::HUGEINT * nb.nrm))::BIGINT
        |         ELSE -((dot::HUGEINT * dot * 1000000000)
        |                // (na.nrm::HUGEINT * nb.nrm))::BIGINT
        |       END AS cos2_ppb
        |FROM dots
        |JOIN norms na ON na.label = dots.label_a
        |JOIN norms nb ON nb.label = dots.label_b
        |ORDER BY cos2_ppb DESC, label_a ASC, label_b ASC LIMIT 20""".stripMargin,
    "v01_search_topk" ->
      s"""SELECT vec_id,
         | round(list_dot_product(embedding::DOUBLE[], ${VectorOps.sqlDoubleArray(flagshipVec)}),4) AS score
         |FROM embeddings ORDER BY score DESC, vec_id ASC LIMIT 12""".stripMargin,
    "v02_search_top1000" ->
      s"""SELECT vec_id,
         | round(list_dot_product(embedding::DOUBLE[], ${VectorOps.sqlDoubleArray(embedder.embedText("label3"))}),4) AS score
         |FROM embeddings ORDER BY score DESC, vec_id ASC LIMIT 1000""".stripMargin,
    "v03_blob_roundtrip" ->
      """SELECT vec_id,
        | len(embedding)::INT AS dim,
        | round(embedding[1]::DOUBLE, 4) + 0.0 AS x0,
        | round(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))), 4) AS nrm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "v04_vector_stats" ->
      """SELECT i - 1 AS dim,
        | round(min(x)::DOUBLE, 4) AS lo,
        | round(max(x)::DOUBLE, 4) AS hi
        |FROM (SELECT unnest(embedding) AS x,
        |             unnest(range(1, len(embedding)+1)) AS i
        |      FROM embeddings)
        |GROUP BY dim ORDER BY dim""".stripMargin,
    "v06_quantized_topk" ->
      s"""${quantizedDotDuck(quantize(flagshipVec))}
         |ORDER BY qdot DESC, vec_id ASC LIMIT 10""".stripMargin,
    "v07_dim_calibration" ->
      """WITH e AS (
        |  SELECT i - 1 AS dim,
        |         CAST(floor(x::DOUBLE * 1000000.0 + 0.5) AS BIGINT) AS mi,
        |         x::DOUBLE AS xd
        |  FROM (SELECT unnest(embedding) AS x,
        |               unnest(range(1, len(embedding)+1)) AS i
        |        FROM embeddings))
        |SELECT dim, count(*) AS n,
        |  sum(mi)::BIGINT / (count(*) * 1000000.0) AS mean,
        |  sqrt(greatest(sum(mi * mi)::BIGINT / (count(*) * 1000000000000.0)
        |    - (sum(mi)::BIGINT / (count(*) * 1000000.0))
        |      * (sum(mi)::BIGINT / (count(*) * 1000000.0)), 0.0)) AS std,
        |  round(min(xd), 4) + 0.0 AS lo,
        |  round(max(xd), 4) + 0.0 AS hi,
        |  greatest(abs(min(xd)), abs(max(xd))) / 127.0 AS scale
        |FROM e GROUP BY dim ORDER BY dim""".stripMargin)
}
