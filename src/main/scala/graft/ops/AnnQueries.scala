package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.agg.VectorAggregators
import graft.model.Tables
import graft.vec.{Lsh, VectorOps}

/** Approximate-nearest-neighbor search over the embedding column
  * (builder prompt): the brute-force cosine top-k baseline lives in
  * VectorQueries (v01/v02); here are the two standard scale paths plus the
  * batched form:
  *
  *  - IVF (n01): coarse quantizer → probe the nprobe closest cells → exact
  *    scan inside them. Scan cost drops from N to N·nprobe/cells; at
  *    100 TB the cells are partition-pruned parquet (cluster by cell id).
  *  - Bucketed LSH top-k (n02): candidates = rows sharing any of the
  *    query's 6 table buckets — a pushed-down scan predicate, then the
  *    same TakeOrderedAndProject as the exact path.
  *  - Batched ANN (n03): k neighbors for EACH of a set of query vectors —
  *    score join + per-query ranking window (the shape embedding joins
  *    between tables take at scale).
  */
object AnnQueries {

  type Q = (SparkSession, String) => DataFrame

  /** n01: IVF probe search. Coarse quantizer = per-label centroids (the
    * offline analog of a trained k-means codebook); nprobe=2; exact
    * top-10 inside the probed cells. The 2-row probe list broadcasts.
    * Measured on the sf0.01 corpus: recall@10 ≈ 0.3 at 20% scan cost —
    * bounded by the weak cluster structure (intra-label cos ≈ 0.4), not
    * by the mechanics; nprobe is the knob. (LSH path: 0.7, see n02.) */
  val n01_ann_ivf: Q = (s, d) => {
    val q = VectorQueries.flagshipVec
    val emb = Tables.embeddings(s, d)
    val probes = emb
      .groupBy(col("label"))
      .agg(VectorAggregators.vecSum(col("embedding")).as("vsum"))
      .select(col("label"), VectorOps.ndotQueryNative(col("vsum"), q).as("cscore"))
      .orderBy(col("cscore").desc, col("label").asc)
      .limit(2)
      .select(col("label"))
    emb.join(broadcast(probes), "label")
      .select(col("vec_id"),
        round(VectorOps.dotQueryNative(col("embedding"), q), 4).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10)
  }

  /** n02: LSH-bucketed top-k. The query's bucket per table is computed on
    * the driver and lands in the plan as literals; the candidate filter is
    * a pure scan predicate (no shuffle, no explode). */
  val n02_ann_lsh_topk: Q = (s, d) => {
    val q = VectorQueries.flagshipVec
    val cond = (0 until Lsh.NUM_TABLES)
      .map(t => Lsh.bucketCol(col("embedding"), t) === Lsh.bucketOf(q, t))
      .reduce(_ || _)
    Tables.embeddings(s, d)
      .filter(cond)
      .select(col("vec_id"),
        round(VectorOps.dotQueryNative(col("embedding"), q), 4).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10)
  }

  /** The label-centroid query block shared by n03 and n10 — the Spark
    * twin of the oracle's `qsCte`, factored so a centroid-derivation
    * tweak can never desync the two queries that reference the single
    * shared oracle text. Mirrors the CTE's arithmetic ORDER exactly:
    * normalize the double sums in DOUBLE, then cast each component to
    * FLOAT (`x::FLOAT::DOUBLE`). The previous shape (cast to float,
    * then normalize) agreed with the oracle only to ~1 ulp — absorbed
    * by round(dot, 4) consumers like n03, but n10 feeds qvec into an
    * LSH bucket SIGN test where a 1-ulp drift near a hyperplane flips
    * the bucket and diverges the whole candidate set. */
  private def qsDf(s: SparkSession, d: String): DataFrame = {
    val centroids = Tables.embeddings(s, d)
      .groupBy(col("label").as("qlabel"))
      .agg(VectorAggregators.vecSum(col("embedding")).as("vsum"))
    val toUnitF = udf { (v: Array[Double]) =>
      if (v == null) null
      else {
        var ss = 0.0; var i = 0
        while (i < v.length) { ss += v(i) * v(i); i += 1 }
        val n = math.sqrt(ss)
        if (n == 0.0) v.map(_.toFloat) else v.map(x => (x / n).toFloat)
      }
    }
    broadcast(centroids.select(col("qlabel"), toUnitF(col("vsum")).as("qvec")))
  }

  /** n03: batched ANN — top-3 corpus neighbors for each label centroid.
    * Centroids (10 rows) broadcast against the corpus scan; ranking
    * window partitioned per query. At 100 TB: block the query side and
    * reuse one corpus pass per block. */
  val n03_ann_batch: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val scored = emb.crossJoin(qsDf(s, d))
      .select(col("qlabel"), col("vec_id"),
        round(VectorOps.dotColsNative(col("embedding"), col("qvec")), 4).as("score"))
    val w = Window.partitionBy(col("qlabel"))
      .orderBy(col("score").desc, col("vec_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qlabel").cast("long").as("qlabel"), col("rn"), col("vec_id"), col("score"))
      .orderBy(col("qlabel"), col("rn"))
  }

  /** n04: the PRODUCTION IvfIndex artifact path under the oracle
    * (VERDICT r02 #5) — build → save (cell-partitioned parquet +
    * codebook sidecar) → load in a fresh reader → probe. The search runs
    * against the RELOADED artifact, so partition pruning, the codebook
    * round-trip, and the probe predicate are all on the verified path.
    *
    * `iters = 0` keeps the oracle sf-agnostic: the codebook is then
    * exactly the first `cells` embeddings in id order, which DuckDB
    * derives from the same table (a 5-iteration Lloyd codebook would
    * need data-dependent literals; k-means refinement quality is covered
    * by AnnIndexSpec's recall curve instead). `+ 0.0` normalizes a
    * possible rounded -0.0 on both engines. */
  /** n14: k-NN GRAPH DEGREE AUDIT — the in-degree spectrum of n09's
    * directed top-3 graph with per-class reciprocity permille. Hubness
    * (a few vectors appearing in EVERYONE's neighbor list) is the
    * canonical pathology of high-dimensional k-NN graphs — hubs poison
    * label propagation (c08 floods their label) and semantic dedup
    * (c07 fuses unrelated clusters through them), and the hub signature
    * is exactly what this audit surfaces: high-in-degree classes with
    * LOW reciprocity (everyone points at the hub; the hub points back
    * at almost no one). Node universe = nodes present in the graph
    * (src ∪ nbr); isolated vectors have no graph to audit.
    *
    * Scale shape: edges are ≤ 3·N thin rows; degree censuses are
    * map-side-combinable aggregates; the reciprocity join is an
    * equi-join of the edge set against its own reversal (distinct pairs
    * ⇒ multiplicity 1); the final histogram is degree-class-sized. */
  val n14_knn_degree_audit: Q = (s, d) => {
    val edges = n09Graph(s, d)
    val nodes = edges.select(col("src").as("vec_id"))
      .union(edges.select(col("nbr").as("vec_id"))).distinct()
    val outd = edges.groupBy(col("src").as("vec_id"))
      .agg(count(lit(1)).as("outdeg"))
    val ind = edges.groupBy(col("nbr").as("vec_id"))
      .agg(count(lit(1)).as("indeg"))
    val rec = edges
      .join(edges.select(col("nbr").as("src"), col("src").as("nbr"))
        .hint("SHUFFLE_HASH"), Seq("src", "nbr"))
      .groupBy(col("src").as("vec_id")).agg(count(lit(1)).as("rec_out"))
    // SHUFFLE_HASH: the degree tables are node-sized (too big to
    // broadcast at corpus scale) but thin — hashing beats sort-merge
    nodes
      .join(outd.hint("SHUFFLE_HASH"), Seq("vec_id"), "left")
      .join(ind.hint("SHUFFLE_HASH"), Seq("vec_id"), "left")
      .join(rec.hint("SHUFFLE_HASH"), Seq("vec_id"), "left")
      .na.fill(0L, Seq("outdeg", "indeg", "rec_out"))
      .groupBy(col("indeg"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("outdeg")).as("out_edges"),
        sum(col("rec_out")).as("rec_edges"))
      .selectExpr("indeg", "n_nodes", "out_edges", "rec_edges",
        """CASE WHEN out_edges = 0 THEN CAST(0 AS BIGINT)
          |     ELSE CAST(rec_edges * 1000 div out_edges AS BIGINT)
          |END AS recip_permille""".stripMargin)
      .orderBy(col("indeg"))
  }

  /** n13: IVF CELL-BALANCE AUDIT — per-cell row counts with share and
    * skew permille (1000 = perfectly balanced), over the SAVED artifact
    * (n04's build→save→load discipline: the artifact, not a rebuild, is
    * the source of truth). This is the index-health check an ANN
    * deployment runs on every build: a hot cell means probes that hit
    * it scan disproportionately (the latency tail), and an empty cell
    * wastes a probe — the audit is what triggers a re-train or a cell
    * split. n10 monitors recall drift; n13 monitors the OTHER failure
    * axis, partition skew.
    *
    * Scale shape: one count aggregate over the cell-partitioned codes
    * (map-side combine; the scan reads no vectors — column pruning to
    * the partition key), then window arithmetic over ≤ cells rows. */
  val n13_ivf_balance: Q = (s, d) => {
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val idx = graft.ann.IvfIndex.build(emb, cells = 8, iters = 0)
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft-n13-ivf-" +
      d.replaceAll("[^A-Za-z0-9.]", "_") + s"-${ProcessHandle.current().pid()}"
    idx.save(tmp)
    idx.indexed.unpersist()
    val loaded = graft.ann.IvfIndex.load(s, tmp)
    val census = loaded.indexed
      .groupBy(col("cell").cast("long").as("cell"))
      .agg(count(lit(1)).as("n_vecs"))
    census
      .withColumn("total", sum(col("n_vecs")).over(Window.partitionBy()))
      .selectExpr("cell", "n_vecs",
        "CAST(n_vecs * 1000 div total AS BIGINT) AS share_permille",
        "CAST(n_vecs * 8000 div total AS BIGINT) AS skew_permille")
      .orderBy(col("cell"))
  }

  val n04_ivf_artifact: Q = (s, d) => {
    val q = VectorQueries.flagshipVec
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val idx = graft.ann.IvfIndex.build(emb, cells = 8, iters = 0)
    // stable per-(dataset, JVM) path + overwrite save: repeated runs
    // WITHIN a process (bench warms + times n04 three times) reuse one
    // artifact directory instead of accumulating an embeddings copy per
    // invocation, while the pid component keeps concurrent/orphaned JVMs
    // from overwriting an artifact another process is lazily reading
    // (and the sanitized dir name, unlike a bare hashCode, cannot alias
    // two different corpora)
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft-n04-ivf-" +
      d.replaceAll("[^A-Za-z0-9.]", "_") + s"-${ProcessHandle.current().pid()}"
    idx.save(tmp)
    idx.indexed.unpersist()
    val loaded = graft.ann.IvfIndex.load(s, tmp)
    loaded.search(q, k = 10, nprobe = 2)
      .select(col("vec_id"), (col("score") + lit(0.0)).as("score"))
  }

  /** n05: two-stage retrieve-then-rerank — the deployment shape that
    * makes v06's compression usable without its ranking error: a coarse
    * pass scores EVERY row with the all-integer int8-quantized dot
    * (v06's exact kernel — at 100 TB this pass scans 1-byte codes, 4×
    * less IO than fp32, and is TakeOrderedAndProject: only
    * COARSE_K·partitions rows leave the scan), then only the 100
    * survivors are re-scored exact fp32 for the final top-10. The
    * candidate list is a 100-row broadcast, so the rerank join never
    * shuffles the corpus; at scale the second stage is 100 point reads
    * against the id-sorted store. Quantization error only costs recall
    * if a true top-10 vector falls below coarse rank 100 — the spec
    * pins coarse-to-exact agreement on this corpus. */
  val n05_quantized_rerank: Q = (s, d) => {
    val q = VectorQueries.flagshipVec
    val coarse = Tables.embeddings(s, d)
      .select(col("vec_id"),
        VectorQueries.quantizedDot(VectorQueries.quantize(q))(col("embedding"))
          .as("qdot"))
      .orderBy(col("qdot").desc, col("vec_id").asc)
      .limit(100)
      .select(col("vec_id"))
    Tables.embeddings(s, d)
      .join(broadcast(coarse), "vec_id")
      .select(col("vec_id"),
        round(VectorOps.dotQueryNative(col("embedding"), q), 4).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10)
  }

  /** n06: product-quantization ADC search — the MEMORY-bound scale path
    * v06's scalar int8 can't reach: each embedding is compressed to
    * M=8 per-subspace centroid codes (256 B → 8 codes, 32×) by the
    * codegen `vec_pq_encode` kernel, and scoring is `vec_pq_adc` — M
    * lookups into the query's exact dot-product table — so the scan
    * never touches raw vectors. Codebook = sub-vectors of the first 16
    * embeddings in id order (n04's iters=0 discipline: data-derivable,
    * so the DuckDB oracle re-derives codes, LUT, and scores bit-exactly
    * via unrolled left-associated arithmetic; Lloyd-refined codebooks
    * and the persisted-artifact path are AnnPqSpec's PqIndex surface).
    * Plan: one narrow projection over the scan + TakeOrderedAndProject,
    * zero shuffle. */
  /** Shared n06/n07 PQ setup. M=8 subspaces, K=16 centroids — constants
    * mirrored in [[pqOracleCtes]]. ONE driver collect fetches the
    * first-16-rows prefix; n07 slices its 8 IVF centroids from the same
    * array rather than launching a second prefix job (each bench
    * invocation would otherwise pay a redundant job launch). */
  private val PQ_M = 8
  private val PQ_K = 16
  private def firstRows(s: SparkSession, d: String, n: Int): Array[Array[Float]] = {
    import s.implicits._
    val rows: Array[Array[Float]] = Tables.embeddings(s, d)
      .orderBy(col("vec_id")).limit(n)
      .select(col("embedding")).as[Array[Float]].collect()
    require(rows.length >= n,
      s"PQ/IVF setup needs $n embedding rows, table has ${rows.length}")
    rows
  }
  private def pqSetup(cbRows: Array[Array[Float]]): (Array[Float], Array[Double]) = {
    val sub = cbRows(0).length / PQ_M
    val flatCb = new Array[Float](PQ_M * PQ_K * sub)
    for (mm <- 0 until PQ_M; j <- 0 until PQ_K; dd <- 0 until sub)
      flatCb((mm * PQ_K + j) * sub + dd) = cbRows(j)(mm * sub + dd)
    (flatCb, graft.ann.PqIndex.lut(flatCb, PQ_M, PQ_K, VectorQueries.flagshipVec))
  }

  /** n15: PQ RECONSTRUCTION-ERROR AUDIT — the top-20 worst-quantized
    * vectors by exact squared reconstruction error ‖v − decode(encode
    * (v))‖², completing the ANN monitoring triad: n10 watches recall,
    * n13 watches cell balance, THIS watches the quantization loss that
    * silently degrades both (codebooks trained on yesterday's
    * distribution reconstruct today's outliers badly — the worst-k list
    * is exactly the retrain trigger). The error is computed WITHOUT a
    * decode kernel: per subspace it is the chosen centroid's squared
    * distance, the very quantity the encoder minimizes, so the audit
    * reuses the encode arithmetic (codes from the codegen
    * `vec_pq_encode`; distances as left-assoc Double chains matching
    * the oracle's term order exactly).
    *
    * Scale shape: one narrow codes+error scan (16-row codebook rides as
    * a literal), TakeOrdered top-20 — no shuffle, no join. */
  val n15_pq_recon_error: Q = (s, d) => {
    val (flatCb, _) = pqSetup(firstRows(s, d, PQ_K))
    VectorOps.ensureRegistered(s)
    val cbD = typedlit(flatCb.map(_.toDouble))
    val withCodes = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        VectorOps.pqEncode(col("embedding"), flatCb, PQ_M, PQ_K).as("codes"))
    val err2 = (0 until PQ_M).map { mm =>
      val code = expr(s"CAST(element_at(codes, ${mm + 1}) AS INT)")
      (1 to 8).map { dd =>
        val e = expr(s"CAST(element_at(embedding, ${mm * 8 + dd}) AS DOUBLE)")
        val c = element_at(cbD, (lit(mm * PQ_K) + code) * lit(8) + lit(dd))
        (e - c) * (e - c)
      }.reduceLeft(_ + _)
    }.reduceLeft(_ + _)
    withCodes
      .select(col("vec_id"), (round(err2, 4) + lit(0.0)).as("err2"))
      .orderBy(col("err2").desc, col("vec_id").asc)
      .limit(20)
  }

  val n06_pq_adc: Q = (s, d) => {
    val (flatCb, lut) = pqSetup(firstRows(s, d, PQ_K))
    VectorOps.ensureRegistered(s)
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        (round(VectorOps.pqAdc(
          VectorOps.pqEncode(col("embedding"), flatCb, PQ_M, PQ_K), lut, PQ_K), 4)
          + lit(0.0)).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10)
  }

  /** n07: the FAISS-style IVF-PQ composition end-to-end — coarse cells
    * prune the scan (n04's first-8 centroids; 2 of 8 probed), the
    * survivors are scored by the PQ ADC kernel over codes (n06's
    * codebook), and only the ADC top-50 get exact fp32 reranking via a
    * broadcast re-join. At 100 TB each stage cuts the next one's input:
    * cell pruning reads nprobe/cells of the corpus, the ADC pass reads
    * 8-byte codes instead of raw vectors, and the rerank touches 50
    * rows. Cell assignment is an argmax CASE chain over codegen
    * vec_dot scores (ties → lowest cell, matching IvfIndex's strict->
    * loop and the oracle's ORDER BY); every stage's arithmetic is
    * bit-identical across engines, so the oracle reproduces the exact
    * candidate sets, not just the final ranking. */
  val n07_ivf_pq: Q = (s, d) => {
    val q = VectorQueries.flagshipVec
    val CELLS = 8; val NPROBE = 2; val COARSE = 50
    val emb = Tables.embeddings(s, d)
    val prefix = firstRows(s, d, PQ_K) // one collect serves both codebooks
    val cents = prefix.take(CELLS)
    val probed = cents.indices
      .sortBy(c => (-VectorOps.dot(cents(c), q), c)).take(NPROBE)
    val (flatCb, lut) = pqSetup(prefix)
    VectorOps.ensureRegistered(s)
    val withScores = emb.select(
      col("vec_id") +: col("embedding") +:
        cents.zipWithIndex.map { case (cvec, i) =>
          VectorOps.dotQueryNative(col("embedding"), cvec).as(s"cs_$i")
        }.toSeq: _*)
    val cellCase = (0 until CELLS).map { i =>
      val ge = (0 until CELLS).filter(_ != i)
        .map(o => s"cs_$i >= cs_$o").mkString(" AND ")
      s"WHEN $ge THEN $i"
    }.mkString("CASE ", " ", " END")
    val coarse = withScores
      .withColumn("cell", expr(cellCase))
      .filter(col("cell").isin(probed: _*))
      .select(col("vec_id"),
        VectorOps.pqAdc(
          VectorOps.pqEncode(col("embedding"), flatCb, PQ_M, PQ_K), lut, PQ_K)
          .as("adc"))
      .orderBy(col("adc").desc, col("vec_id").asc)
      .limit(COARSE)
      .select(col("vec_id"))
    emb.join(broadcast(coarse), "vec_id")
      .select(col("vec_id"),
        (round(VectorOps.dotQueryNative(col("embedding"), q), 4) + lit(0.0))
          .as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10)
  }

  /** n08: the composed [[graft.ann.IvfPqIndex]] ARTIFACT on the verified
    * path (n04's discipline applied to the IVF-PQ composition): build →
    * save (cell-partitioned packed codes + both codebooks) → load in a
    * fresh reader → partition-pruned packed-ADC probe → exact rerank
    * against the raw store. With ivfIters=0 / pqIters=0 the codebooks
    * are the first-8 / first-16 rows in id order — the identical setup
    * n07 derives in-query — so the oracle is n07's SQL verbatim: one
    * answer, proven twice (in-query math and persisted artifact). */
  val n08_ivfpq_artifact: Q = (s, d) => {
    val q = VectorQueries.flagshipVec
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val idx = graft.ann.IvfPqIndex.build(emb,
      cells = 8, ivfIters = 0, m = PQ_M, k = PQ_K, pqIters = 0)
    // same stable per-(dataset, JVM) overwrite path as n04 (see comment
    // there): within-process reuse, no cross-process aliasing
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft-n08-ivfpq-" +
      d.replaceAll("[^A-Za-z0-9.]", "_") + s"-${ProcessHandle.current().pid()}"
    idx.save(tmp)
    idx.codes.unpersist()
    val loaded = graft.ann.IvfPqIndex.load(s, tmp)
    loaded.search(q, topk = 10, nprobe = 2, coarseK = 50, raw = emb)
  }

  /** n11: FILTERED ANN — the reference's flagship shape (predicate +
    * top-k fused in one scan, rclip_server.py:206-211) applied to the
    * production IVF-PQ artifact: a metadata predicate (`label` parity
    * here — the stand-in for license/language/source filters a training
    * pipeline actually runs) evaluated INSIDE the cell-pruned packed-ADC
    * scan, before the coarse TakeOrdered, then the exact fp32 rerank.
    * Post-filtering the unfiltered top-k would instead return fewer
    * than k eligible rows whenever the predicate is selective; fusing
    * keeps both the guarantee and the IO win (the artifact's code rows
    * carry the metadata, so on the loaded parquet the predicate is a
    * pushed row-group filter next to the partition-pruning cell
    * predicate — no corpus join per query). Build discipline is n08's:
    * iters=0 codebooks, save → load → probe on the verified path. */
  val n11_filtered_ann: Q = (s, d) => {
    val q = VectorQueries.flagshipVec
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), col("label"))
    val idx = graft.ann.IvfPqIndex.build(emb,
      cells = 8, ivfIters = 0, m = PQ_M, k = PQ_K, pqIters = 0,
      metaCols = Seq("label"))
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft-n11-fivfpq-" +
      d.replaceAll("[^A-Za-z0-9.]", "_") + s"-${ProcessHandle.current().pid()}"
    idx.save(tmp)
    idx.codes.unpersist()
    val loaded = graft.ann.IvfPqIndex.load(s, tmp)
    loaded.search(q, topk = 10, nprobe = 2, coarseK = 50, raw = emb,
      predicate = Some(col("label") % 2 === 0))
  }

  /** n09: k-NN GRAPH construction — every vector's top-3 approximate
    * neighbors, the building block embedding pipelines actually persist
    * (semantic-dedup clustering, diversity sampling, graph-based label
    * propagation all start from a k-NN graph, not from single-query
    * search). Candidates come from d06's corpus-sized tiered LSH buckets
    * ([[graft.vec.Lsh.tieredBucketStructs]]: 6 tables, bits from the
    * bitsForCount ladder), then ONE ranking window per source id —
    * never an all-pairs score. Ranking is on the ROUNDED cosine with an
    * id tiebreak, so rank boundaries are engine-exact even for the
    * identical-embedding twins the stress corpus plants.
    *
    * Scale shape: cost is the d06 candidate join (O(n·bucket), cap-
    * bounded) plus a (src)-keyed window over ~n·bucket thin rows; the
    * 256-byte embedding never rides a shuffle (id-only candidate pairs,
    * embeddings re-joined by id). A vector with no bucket-mate simply
    * has no rows — isolated nodes are the caller's outer-join. */
  val n09_knn_graph: Q = (s, d) => {
    n09GraphImpl(s, d)
  }

  /** The thin (src, nbr) edge artifact of [[n09_knn_graph]], memoized per
    * (session, dir): the graph build (LSH buckets → scored candidates →
    * per-src top-k) is the expensive stage, and its consumers (c08 label
    * propagation, n14 degree audit) read only the edge list. Same
    * persist-the-artifact contract as [[graft.engine.ArtifactCache]]'s
    * other entries. */
  private[graft] def n09Graph(s: SparkSession, d: String): DataFrame =
    graft.engine.ArtifactCache.memoize(s, d, "n09_edges") {
      n09GraphImpl(s, d).select(col("src"), col("nbr"))
    }

  /** CLONE-COLLAPSED build (VERDICT r08 next-#2): every LSH/candidate/
    * scoring stage runs over DISTINCT embeddings; exact clones (byte-
    * identical vectors — crawl corpora are full of them) are grouped
    * first and expanded back only at the final ranked stage. The result
    * is row-for-row identical to the naive clone-expanded build because
    * every boundary is clone-invariant:
    *  - `bits` still sizes from the MEMBER count (same ladder rung);
    *  - the hot-bucket cap censuses SUM(clone count), so the dropped
    *    (tbl, bucket) set is exactly the clone-expanded census's
    *    ([[Lsh.capTieredBucketsWeighted]]);
    *  - member pairs (x, y) are candidates iff their groups share a
    *    surviving bucket (clones occupy identical bucket sets), and a
    *    clone pair inside one group is a candidate iff the group has a
    *    surviving bucket and ≥2 members — the group-level join encodes
    *    both;
    *  - cos(x, y) is a function of the embedding ARRAYS, so one score
    *    per group pair (computed through the same rounded kernel) is
    *    the score of every member pair;
    *  - per-src ranking is (cos DESC, nbr ASC): within one neighbor
    *    group all members tie on cos and rank by id, so only the 4
    *    smallest member ids of any group can ever reach a top-3 (4, not
    *    3, covers self-exclusion inside the src's own group).
    * Scale shape: candidate-join mass is O(distinct·bucket), not
    * O(members·bucket) — a 100×-cloned corpus costs what its distinct
    * corpus costs until the final explode, which is output-proportional
    * (≤ 4·groupDegree rows per member, then rn ≤ 3). The grouping
    * itself is one embedding-keyed window shuffle (no join, no
    * collect_list of full member sets — the first-4 cut rides the same
    * window). */
  private def n09GraphImpl(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val embC = emb.cache()
    val n = embC.count()
    val bits = Lsh.bitsForCount(n)
    val byEmb = Window.partitionBy(col("embedding"))
    val mm = embC
      .withColumn("gid", min(col("vec_id")).over(byEmb))
      .withColumn("cnt", count(lit(1)).over(byEmb))
      .withColumn("mrk", row_number().over(byEmb.orderBy(col("vec_id"))))
      .cache()
    mm.count()
    // one rep row per distinct embedding, carrying the clone count
    val reps = mm.filter(col("vec_id") === col("gid"))
      .select(col("gid"), col("embedding"), col("cnt"))
    val rawBucketed = reps
      .withColumn("tb", explode(array(Lsh.tieredBucketStructs(col("embedding"), bits): _*)))
      .select(col("gid"), col("cnt"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      .cache()
    rawBucketed.count() // thin (gid, cnt, tbl, bucket) rows; both sides reuse
    // d06's hot-bucket cap (VERDICT r04 #1), weighted so the boundary is
    // the clone-expanded one; oracle twin = duckTieredCappedCtes
    val bucketed = Lsh.capTieredBucketsWeighted(rawBucketed, col("cnt"))
    // COUNTED join dispatch on every node-sized build side below (the
    // d15/d16 size-adaptive lesson, extended per d06): below the bound
    // the bucket/rep/member sides BROADCAST, so the candidate stream —
    // the big side, O(distinct·bucket) rows — never exchanges (the
    // pre-r9 shape shuffled it once per hinted SHUFFLE_HASH join: by
    // bucket key, by gsrc, by gnbr, and by gnbr again for the member
    // cut). Above the bound the builds stay SHUFFLE_HASH — thin
    // per-partition hash tables at any corpus size, never the
    // SortMergeJoin the planner's stats flipped to at 100× whose
    // candidate-mass sorts spilled the disk to death (STRESS_r09).
    def small(df: DataFrame): DataFrame =
      if (n <= Lsh.NODE_BCAST_MAX_ROWS) broadcast(df)
      else df.hint("SHUFFLE_HASH")
    val candG = bucketed.as("x").join(small(bucketed).as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bucket") === col("y.bucket") &&
          (col("x.gid") =!= col("y.gid") ||
            (col("x.gid") === col("y.gid") && col("x.cnt") >= 2)))
      .select(col("x.gid").as("gsrc"), col("y.gid").as("gnbr"))
      .distinct()
    val scoredG = candG
      .join(small(reps.select(col("gid").as("gsrc"), col("embedding").as("ea"))),
        "gsrc")
      .join(small(reps.select(col("gid").as("gnbr"), col("embedding").as("eb"))),
        "gnbr")
      .select(col("gsrc"), col("gnbr"),
        (round(VectorOps.cosineColsNative(col("ea"), col("eb")), 4) + lit(0.0))
          .as("cos"))
    // the 4 smallest member ids per neighbor group (self-exclusion slack)
    val first4 = mm.filter(col("mrk") <= 4)
      .select(col("gid").as("gnbr"), col("vec_id").as("nbr"))
    val contrib = scoredG.join(small(first4), "gnbr")
      .select(col("gsrc"), col("nbr"), col("cos"))
    // member expansion with a COUNTED singleton fast path: on a corpus
    // with no (or few) exact clones every group is its own member, so the
    // candidate-mass join against the member map is pure overhead — a
    // broadcast anti/semi split sends singleton contribs through a
    // map-side rename and only clone-group contribs pay the join. Past
    // the broadcast bound (corpus-shaped clone population) the full
    // co-partitioned join is the right plan and the fast path steps aside.
    val multi = mm.filter(col("vec_id") === col("gid") && col("cnt") >= 2)
      .select(col("gid").as("gsrc")).cache()
    val nMulti = multi.count()
    val memberSrc = mm.select(col("gid").as("gsrc"), col("vec_id").as("src"))
    val expanded =
      if (nMulti == 0)
        contrib.select(col("gsrc").as("src"), col("nbr"), col("cos"))
      else if (nMulti <= 500000) {
        val single = contrib.join(broadcast(multi), Seq("gsrc"), "left_anti")
          .select(col("gsrc").as("src"), col("nbr"), col("cos"))
        val cloned = contrib.join(broadcast(multi), Seq("gsrc"), "left_semi")
          .join(small(memberSrc), "gsrc")
          .select(col("src"), col("nbr"), col("cos"))
        single.unionByName(cloned)
      } else
        contrib.join(memberSrc.hint("SHUFFLE_HASH"), "gsrc")
          .select(col("src"), col("nbr"), col("cos"))
    val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("nbr").asc)
    expanded.filter(col("src") =!= col("nbr"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("src"), col("rn"), col("nbr"), col("cos"))
      .orderBy(col("src"), col("rn"))
  }

  /** n10: ANN RECALL evaluation — recall@10 of the LSH-bucketed
    * candidate search (n02's scan-predicate shape) against the exact
    * fp32 top-10, per label-centroid query (n03's query block). This is
    * the measurement loop an ANN deployment runs continuously: approx
    * indexes silently lose recall as the corpus drifts, and the check
    * is itself a distributed query (exact side = one corpus pass, never
    * a per-query rescan). Both rankings use the ROUNDED score with an
    * id tiebreak, so the compared top-10 SETS are engine-exact; recall
    * lands as hits (0-10) and exact permille.
    *
    * Scale shape: ONE broadcast of the 10-centroid query block scores
    * the corpus a single time; both the exact and candidate rankings
    * are windows over that same scored pass; hit counting joins two
    * 10-row-per-query sets. Evaluation cost ≈ one n03. */
  val n10_ann_recall: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val qs = qsDf(s, d)
    val scored = emb.crossJoin(qs)
      .select(col("qlabel"), col("vec_id"), col("embedding"), col("qvec"),
        round(VectorOps.dotColsNative(col("embedding"), col("qvec")), 4).as("score"))
    val w = Window.partitionBy(col("qlabel"))
      .orderBy(col("score").desc, col("vec_id").asc)
    val exact = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10).select(col("qlabel"), col("vec_id"))
    val bucketMatch = (0 until Lsh.NUM_TABLES)
      .map(t => Lsh.bucketCol(col("embedding"), t) === Lsh.bucketCol(col("qvec"), t))
      .reduce(_ || _)
    val approx = scored.filter(bucketMatch)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10).select(col("qlabel"), col("vec_id"))
    // both sides are k-per-query sets (≤ 10·|queries| rows): broadcast
    val hits = exact.join(broadcast(approx), Seq("qlabel", "vec_id"), "leftsemi")
      .groupBy(col("qlabel")).agg(count(lit(1)).as("h"))
    qs.select(col("qlabel")).join(broadcast(hits), Seq("qlabel"), "left")
      .selectExpr("CAST(qlabel AS BIGINT) AS qlabel",
        "CAST(coalesce(h, 0) AS BIGINT) AS hits",
        "CAST(coalesce(h, 0) * 100 AS BIGINT) AS recall_permille")
      .orderBy(col("qlabel"))
  }

  /** n12: HYBRID retrieval — a keyword ranking and a vector ranking
    * fused by reciprocal-rank fusion, the production shape of
    * "semantic + lexical" search (RRF is the fusion rule ElasticSearch/
    * Vespa-class engines default to because it needs no score
    * calibration between modalities). Keyword side: docs ranked by term
    * frequency of the query term; vector side: cosine ranking against
    * the query embedding (v02's kernel). Fusion: for a doc at rank r in
    * list i, RRF adds 1/(K+r), K=60; both contributions here are the
    * INTEGER 10⁶ div (K+r) — rank arithmetic, not float addition, so
    * the fused ordering is bit-identical on both engines.
    *
    * Scale shape: each side is a k-bounded TakeOrderedAndProject over
    * its own narrow scan (the keyword scan's tf filter pushes into the
    * corpus pass; the vector scan is v02's zero-shuffle top-k); the
    * fusion join touches ≤ 2·[[HYBRID_DEPTH]] rows — driver-trivial at
    * any corpus size. The ranking windows run AFTER the limits, over
    * k-bounded sets, so the unpartitioned window is not a scale hazard. */
  val RRF_K = 60
  val HYBRID_DEPTH = 50
  val n12_hybrid_rrf: Q = (s, d) => {
    val kwTerm = "vector"
    val qv = VectorQueries.embedder.embedText("label3")
    val byTf = Seq(col("tf").desc, col("doc_id").asc)
    val kwTop = Tables.documents(s, d)
      .selectExpr("doc_id",
        s"CAST(size(filter(split(text, ' '), t -> t = '$kwTerm')) AS BIGINT) AS tf")
      .filter(col("tf") > 0)
      .orderBy(byTf: _*).limit(HYBRID_DEPTH)
      .withColumn("rk", row_number().over(Window.orderBy(byTf: _*)))
    val byScore = Seq(col("score").desc, col("doc_id").asc)
    val vecTop = Tables.embeddings(s, d)
      .select(col("vec_id").as("doc_id"),
        round(VectorOps.dotQueryNative(col("embedding"), qv), 4).as("score"))
      .orderBy(byScore: _*).limit(HYBRID_DEPTH)
      .withColumn("rv", row_number().over(Window.orderBy(byScore: _*)))
    kwTop.select(col("doc_id"), col("rk"))
      // full-outer can't broadcast; hint the hash dispatch so the fusion
      // of two k-row sets never plans a SortMergeJoin (plan-audit rule)
      .join(vecTop.select(col("doc_id"), col("rv")).hint("shuffle_hash"),
        Seq("doc_id"), "full_outer")
      .selectExpr("doc_id",
        "CAST(coalesce(rk, 0) AS BIGINT) AS kw_rank",
        "CAST(coalesce(rv, 0) AS BIGINT) AS vec_rank",
        s"CAST(coalesce(1000000 div ($RRF_K + rk), 0)" +
          s" + coalesce(1000000 div ($RRF_K + rv), 0) AS BIGINT) AS rrf")
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(10)
  }

  /** n16: K-MEANS LLOYD-STEP INERTIA AUDIT — the training-loop metric the
    * ANN monitoring set still lacked (n10 watches recall, n13 cell
    * balance, n15 quantization loss; THIS is the number the trainer
    * itself descends): assign every vector to its nearest codebook
    * centroid in EXACT integer arithmetic and emit per-cell population +
    * inertia (Σ squared L2). The codebook is the iters=0 convention
    * (first 16 embeddings in id order — n04's sf-agnostic trick), so
    * DuckDB derives the identical centroids from the same table.
    *
    * Arithmetic: micro-unit BIGINT per dimension (v08's floor(x·10⁶+0.5)
    * recipe) — per-pair squared L2 of unit-norm vectors ≤ 4·10¹² and the
    * 64-dim sum < 2⁶³ with room for ~10⁶-vector cells; beyond that the
    * inertia sum widens to DECIMAL(38) (v08's discipline), noted here so
    * the 100 TB reader knows the one line to change. Ties break to the
    * lower cell id on both engines.
    *
    * Scale shape: the codebook (16 rows) broadcasts; the distance table
    * is corpus × 16 thin (vec, cell, dist) rows aggregated map-side from
    * the exploded micro view; the argmin is one vec-keyed window; output
    * is cell-sized. One corpus pass, no self-join. */
  val n16_kmeans_inertia: Q = (s, d) => {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    def micro(df: org.apache.spark.sql.DataFrame, idAs: String) = df
      .select(col("vec_id"), posexplode($"embedding").as(Seq("pos", "x")))
      .selectExpr(s"vec_id AS $idAs", "pos",
        "CAST(floor(CAST(x AS DOUBLE) * 1000000.0D + 0.5D) AS BIGINT) AS mi")
    val cb = micro(emb.orderBy(col("vec_id")).limit(16), "cell")
      .withColumnRenamed("mi", "cmi")
    val dist = micro(emb, "vec_id")
      .join(broadcast(cb), "pos")
      .groupBy(col("vec_id"), col("cell"))
      .agg(sum((col("mi") - col("cmi")) * (col("mi") - col("cmi"))).as("dist"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("dist").asc, col("cell").asc)
    dist
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_assigned"), sum(col("dist")).as("inertia"))
      .orderBy(col("cell"))
  }

  /** n17 beam-search geometry: width-10 beam, 4 expansion steps, 5
    * smallest-id entry points. Fixed budget (c11's discipline): the
    * operator is DEFINED as this walk, so both engines run the same
    * deterministic frontier whatever the graph looks like. */
  val BEAM_WIDTH = 10
  val BEAM_STEPS = 4
  val BEAM_ENTRIES = 5

  /** n17: GRAPH BEAM SEARCH — greedy best-first ANN over the persisted
    * n09 k-NN graph, the NSW/HNSW-family serving path (Malkov &
    * Yashunin 2018) re-expressed as bounded artifact lookups: start
    * from [[BEAM_ENTRIES]] fixed entry nodes, repeatedly score the
    * frontier ∪ its out-neighbors against the flagship query (n02's
    * rounded dot, id tiebreak) and keep the best [[BEAM_WIDTH]], for
    * [[BEAM_STEPS]] steps. The frontier is driver-held (t12's
    * bounded-driver-state discipline — ≤ width·(k+1) ids per step);
    * every score and neighbor expansion is an engine-side lookup
    * against the memoized edge artifact and the vector table.
    *
    * Scale shape: this is the SERVING-path operator, and since r07 the
    * whole walk is ONE LAZY PLAN — the [[BEAM_STEPS]] expansions unroll
    * as plan stages (exactly the oracle's unrolled CTE chain), each a
    * broadcast of the ≤ width-row frontier onto an id-pruned edge probe
    * plus a k-bounded TakeOrdered rescore; ZERO driver round-trips
    * (VERDICT r06 wrong-#2: the previous form collected the frontier 4×
    * per query, unusable for batch serving). Every frontier/candidate
    * set is ≤ width·(k+1) rows, so every join broadcasts; nothing
    * corpus-sized moves after the graph build. At 100 TB the edge
    * artifact is id-bucketed parquet and each probe is a
    * partition-pruned point read; batched query sets add query_id as
    * one more key to the same unrolled plan (n03's shape). */
  val n17_beam_search: Q = (s, d) => {
    val q = VectorQueries.flagshipVec
    val edges = n09Graph(s, d)
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    // score a (tiny) candidate-id frame — the id side broadcasts into the
    // id-pruned corpus join; all lazy, nothing collects. Since r10 the
    // beam CARRIES its scores between steps (the score is a pure function
    // of vec_id under the fixed query, so rescoring the kept beam every
    // step — and once more at the end — recomputed identical values):
    // only NEW neighbor ids hit the corpus join, the per-step dedup is a
    // max-aggregate over equal values (value-identical to
    // distinct-then-score), and the final rescore pass is gone.
    def scored(ids: DataFrame): DataFrame = emb
      .join(broadcast(ids.distinct()), "vec_id")
      .select(col("vec_id"),
        (round(VectorOps.dotQueryNative(col("embedding"), q), 4) + lit(0.0))
          .as("score"))
    val entries = emb.select(col("vec_id"))
      .orderBy(col("vec_id").asc).limit(BEAM_ENTRIES)
    var beam: DataFrame = null
    for (step <- 1 to BEAM_STEPS) {
      val frontier = if (step == 1) entries else beam.select(col("vec_id"))
      val nbrs = edges
        .join(broadcast(frontier.select(col("vec_id").as("src"))), "src")
        .select(col("nbr").as("vec_id"))
      val cand =
        if (step == 1) scored(frontier.unionByName(nbrs))
        else beam.unionByName(scored(nbrs))
          .groupBy(col("vec_id")).agg(max(col("score")).as("score"))
      beam = cand.orderBy(col("score").desc, col("vec_id").asc)
        .limit(BEAM_WIDTH)
    }
    beam.orderBy(col("score").desc, col("vec_id").asc)
  }

  /** n20: BATCHED graph beam search — n17's fixed-budget walk with
    * query_id as ONE MORE KEY, the serving shape n17's scaladoc
    * promises: all queries (here the 10 label centroids, n03's query
    * block) walk the persisted n09 graph in ONE unrolled plan. Each
    * step broadcasts the |queries|·width frontier onto an id-pruned
    * edge probe, rescores the candidates against each query's own
    * vector (one qlabel-keyed window per step replaces n17's global
    * TakeOrdered — same rounded score, same (score DESC, vec_id ASC)
    * tiebreak per query), and keeps the per-query best
    * [[BEAM_WIDTH]]. Entry points are the same [[BEAM_ENTRIES]]
    * smallest ids for every query, fanned out by an exploded literal
    * label array (a Generate — never a cartesian join).
    *
    * Scale shape: identical to n17 per query — candidate sets are
    * ≤ |queries|·width·(k+1) thin rows at every stage, so every join
    * broadcasts and every window sorts a bounded set; one corpus-wide
    * structure (the memoized edge artifact) is probed, never built,
    * per batch. Batch-serving cost is one plan regardless of |queries|. */
  val n20_beam_batch: Q = (s, d) => {
    val qs = qsDf(s, d) // (qlabel, qvec), broadcast
    val edges = n09Graph(s, d)
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    // n17's r10 score-carrying shape with qlabel as one more key: the
    // per-query score is a pure function of (qlabel, vec_id), so the kept
    // beam rides its scores between steps — only NEW (qlabel, nbr) pairs
    // hit the corpus join, the dedup max-aggregate folds equal values,
    // and the final rescore pass is gone.
    def scored(cand: DataFrame): DataFrame = emb
      .join(broadcast(cand.distinct()), "vec_id")
      .join(qs, "qlabel")
      .select(col("qlabel"), col("vec_id"),
        (round(VectorOps.dotColsNative(col("embedding"), col("qvec")), 4)
          + lit(0.0)).as("score"))
    def topPerQuery(cand: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("qlabel"))
        .orderBy(col("score").desc, col("vec_id").asc)
      cand.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= BEAM_WIDTH)
        .select(col("qlabel"), col("vec_id"), col("score"))
    }
    val entries = emb.select(col("vec_id"))
      .orderBy(col("vec_id").asc).limit(BEAM_ENTRIES)
      .select(explode(typedlit((0 to 9).toArray)).as("qlabel"), col("vec_id"))
    var beam: DataFrame = null
    for (step <- 1 to BEAM_STEPS) {
      val frontier =
        if (step == 1) entries else beam.select(col("qlabel"), col("vec_id"))
      val nbrs = edges
        .join(broadcast(frontier.select(col("qlabel"), col("vec_id").as("src"))),
          "src")
        .select(col("qlabel"), col("nbr").as("vec_id"))
      val cand =
        if (step == 1) scored(frontier.unionByName(nbrs))
        else beam.unionByName(scored(nbrs))
          .groupBy(col("qlabel"), col("vec_id"))
          .agg(max(col("score")).as("score"))
      beam = topPerQuery(cand)
    }
    beam
      .selectExpr("CAST(qlabel AS BIGINT) AS qlabel", "vec_id", "score")
      .orderBy(col("qlabel"), col("score").desc, col("vec_id").asc)
  }

  /** n21: k-NN GRAPH ARTIFACT round-trip — n17's walk over a SAVED
    * [[graft.ann.KnnGraph]] (build → save id-bucketed → load → probe),
    * the n04/n08 artifact contract applied to the graph: the edge list
    * persists as `src mod numBuckets` directory partitions (the count
    * is SIZE-DERIVED from the edge rows and pinned in a `_graft_buckets`
    * sidecar — [[graft.ann.KnnGraph.bucketsFor]]) and every expansion
    * step probes the loaded table through a (bucket, src) broadcast
    * join, so the scan planner prunes to the frontier's buckets
    * (dynamic partition pruning) instead of reading the edge table.
    * Same walk, same oracle as n17 — what's under test is that the
    * STORAGE round-trip and the pruned probe path change nothing. */
  val n21_graph_artifact: Q = (s, d) => {
    val q = VectorQueries.flagshipVec
    // stable per-dataset path + overwrite save (n04's rationale; no pid
    // suffix — repeated runs overwrite ONE directory instead of
    // accumulating an orphan per JVM, VERDICT r07 wrong-#4)
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft-n21-knn-" +
      d.replaceAll("[^A-Za-z0-9.]", "_")
    graft.ann.KnnGraph.save(n09Graph(s, d), tmp)
    val g = graft.ann.KnnGraph.load(s, tmp)
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    // n17's r10 score-carrying walk over the loaded artifact (same
    // rationale: scores are a pure function of vec_id, so the kept beam
    // rides them between steps and the final rescore pass is gone)
    def scored(ids: DataFrame): DataFrame = emb
      .join(broadcast(ids.distinct()), "vec_id")
      .select(col("vec_id"),
        (round(VectorOps.dotQueryNative(col("embedding"), q), 4) + lit(0.0))
          .as("score"))
    val entries = emb.select(col("vec_id"))
      .orderBy(col("vec_id").asc).limit(BEAM_ENTRIES)
    var beam: DataFrame = null
    for (step <- 1 to BEAM_STEPS) {
      val frontier = if (step == 1) entries else beam.select(col("vec_id"))
      val nbrs = g.neighbors(frontier).select(col("nbr").as("vec_id"))
      val cand =
        if (step == 1) scored(frontier.unionByName(nbrs))
        else beam.unionByName(scored(nbrs))
          .groupBy(col("vec_id")).agg(max(col("score")).as("score"))
      beam = cand.orderBy(col("score").desc, col("vec_id").asc)
        .limit(BEAM_WIDTH)
    }
    beam.orderBy(col("score").desc, col("vec_id").asc)
  }

  /** n18: MULTIPROBE LSH top-k — n02's bucketed scan widened to the
    * Hamming-1 neighborhood of the query's bucket in every table
    * (Lv et al. 2007): the standard recall lever when re-hashing with
    * more tables is too expensive — at BITS=3 each table probes 4 of
    * its 8 buckets, roughly doubling candidate mass for strictly
    * better recall than n02 (its probe set is a superset — the spec
    * pins both dominances). The probe lists are driver literals (the
    * query's bucket ids), so the scan is still ONE narrow predicate
    * pass: per-row bucket arithmetic against IN-lists, codegen'd, no
    * join, no index build.
    *
    * Scale shape: identical to n02 — a predicate+top-k fused scan
    * (TakeOrderedAndProject over the filtered projection); candidate
    * count is (probes/2^BITS)·N per table, tunable by dropping probes. */
  val n18_multiprobe: Q = (s, d) => {
    val q = VectorQueries.flagshipVec
    val cond = (0 until Lsh.NUM_TABLES).map { t =>
      val b = Lsh.bucketOf(q, t)
      val probes = b +: (0 until Lsh.BITS).map(i => b ^ (1 << i))
      Lsh.bucketCol(col("embedding"), t).isin(probes.map(Int.box): _*)
    }.reduce(_ || _)
    Tables.embeddings(s, d)
      .filter(cond)
      .select(col("vec_id"),
        round(VectorOps.dotQueryNative(col("embedding"), q), 4).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10)
  }

  /** n19 nprobe sweep menu. */
  val NPROBE_MENU: Seq[Int] = Seq(1, 2, 4, 8)

  /** n19: NPROBE TUNING CURVE — recall@10 vs scan cost for the IVF
    * probe knob, the standard ANN deployment trade measured in one
    * query: cells ranked once by centroid score (n01's coarse
    * quantizer), the corpus scored ONCE (cached) with its cell rank
    * attached, then each nprobe in [[NPROBE_MENU]] reads its top-10
    * from the rank-filtered scan and is judged against the brute-force
    * top-10. Output per nprobe: cells probed, rows scanned, hits@10,
    * scan permille — the curve that says what recall another probed
    * cell actually buys.
    *
    * Scale shape: the cell ranking is centroid-table-sized; the scored
    * corpus pass happens once and every probe variant is a k-bounded
    * TakeOrdered over the cached scan; the census is one conditional
    * aggregate. On the n04 cell-partitioned artifact the crank filter
    * becomes partition pruning — nothing else changes. */
  val n19_nprobe_curve: Q = (s, d) => {
    val q = VectorQueries.flagshipVec
    val emb = Tables.embeddings(s, d)
    val cellRank = emb.groupBy(col("label"))
      .agg(VectorAggregators.vecSum(col("embedding")).as("vsum"))
      .select(col("label"), VectorOps.ndotQueryNative(col("vsum"), q).as("cscore"))
      .withColumn("crank", row_number().over(
        Window.orderBy(col("cscore").desc, col("label").asc)))
      .select(col("label"), col("crank"))
    val scored = emb.join(broadcast(cellRank), "label")
      .select(col("vec_id"),
        round(VectorOps.dotQueryNative(col("embedding"), q), 4).as("score"),
        col("crank"))
      .cache()
    scored.count()
    val brute = scored.orderBy(col("score").desc, col("vec_id").asc)
      .limit(10).select(col("vec_id"))
    val hits = NPROBE_MENU.map { p =>
      scored.filter(col("crank") <= p)
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(10)
        .select(col("vec_id"), lit(p).as("nprobe"))
    }.reduce(_ unionByName _)
      .join(broadcast(brute), Seq("vec_id"), "left_semi")
      .groupBy(col("nprobe")).agg(count(lit(1)).as("hits10"))
    val counts = scored.agg(
        count(lit(1)).as("n_total"),
        NPROBE_MENU.map(p => sum(when(col("crank") <= p, 1L).otherwise(0L))
          .as(s"n_$p")): _*)
      .selectExpr(s"stack(${NPROBE_MENU.size}, " + NPROBE_MENU.map(p =>
        s"$p, n_$p, n_total").mkString(", ") +
        ") AS (nprobe, n_scanned, n_total)")
    counts.join(broadcast(hits), Seq("nprobe"), "left")
      .na.fill(0L, Seq("hits10"))
      .selectExpr("CAST(nprobe AS BIGINT) AS nprobe",
        "CAST(least(nprobe, 10) AS BIGINT) AS n_cells",
        "n_scanned", "hits10",
        "CAST(n_scanned * 1000 div n_total AS BIGINT) AS scan_permille")
      .orderBy(col("nprobe"))
  }

  def queries: Map[String, Q] = Map(
    "n19_nprobe_curve" -> n19_nprobe_curve,
    "n18_multiprobe" -> n18_multiprobe,
    "n17_beam_search" -> n17_beam_search,
    "n20_beam_batch" -> n20_beam_batch,
    "n21_graph_artifact" -> n21_graph_artifact,
    "n16_kmeans_inertia" -> n16_kmeans_inertia,
    "n01_ann_ivf" -> n01_ann_ivf,
    "n02_ann_lsh_topk" -> n02_ann_lsh_topk,
    "n03_ann_batch" -> n03_ann_batch,
    "n14_knn_degree_audit" -> n14_knn_degree_audit,
    "n15_pq_recon_error" -> n15_pq_recon_error,
    "n13_ivf_balance" -> n13_ivf_balance,
    "n04_ivf_artifact" -> n04_ivf_artifact,
    "n05_quantized_rerank" -> n05_quantized_rerank,
    "n06_pq_adc" -> n06_pq_adc,
    "n07_ivf_pq" -> n07_ivf_pq,
    "n08_ivfpq_artifact" -> n08_ivfpq_artifact,
    "n09_knn_graph" -> n09_knn_graph,
    "n10_ann_recall" -> n10_ann_recall,
    "n11_filtered_ann" -> n11_filtered_ann,
    "n12_hybrid_rrf" -> n12_hybrid_rrf)

  /** n09's full candidate-edge CTE chain (no leading WITH) — ends at
    * `ranked(src, nbr, cos, rn)`; the top-3 edge set is
    * `SELECT src, nbr FROM ranked WHERE rn <= 3`. ONE definition shared
    * by the n09 oracle and c08's label-propagation oracle so the graph
    * the propagation runs over cannot diverge from the graph n09
    * hash-checks. */
  private[ops] def knnOracleCtes: String =
    s"""nrows AS (SELECT count(*) AS n FROM embeddings),
       |${Lsh.duckBitselCte},
       |${Lsh.duckTieredCappedCtes},
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS src, y.vec_id AS nbr
       |  FROM bucketed x JOIN bucketed y
       |    ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id <> y.vec_id),
       |scored AS (
       |  SELECT src, nbr,
       |         round(list_cosine_similarity(a.embedding::DOUBLE[],
       |                                      b.embedding::DOUBLE[]), 4) + 0.0 AS cos
       |  FROM cand JOIN embeddings a ON a.vec_id = cand.src
       |            JOIN embeddings b ON b.vec_id = cand.nbr),
       |ranked AS (
       |  SELECT src, nbr, cos,
       |         row_number() OVER (PARTITION BY src
       |                            ORDER BY cos DESC, nbr ASC) AS rn
       |  FROM scored)""".stripMargin

  /** The single-query beam-walk oracle (n17's unrolled CTE chain),
    * shared verbatim by n17 and the artifact round-trip n21. */
  private def beamWalkOracle(qLit: String): String = {
    val steps = (1 to BEAM_STEPS).map { r =>
      s"""c$r AS (
         |  SELECT vec_id FROM b${r - 1}
         |  UNION
         |  SELECT e.nbr FROM gs_edges e JOIN b${r - 1} b ON e.src = b.vec_id),
         |b$r AS MATERIALIZED (
         |  SELECT c.vec_id FROM c$r c JOIN sc ON sc.vec_id = c.vec_id
         |  ORDER BY sc.score DESC, c.vec_id ASC LIMIT $BEAM_WIDTH)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH $knnOracleCtes,
       |gs_edges AS MATERIALIZED (
       |  SELECT src, nbr FROM ranked WHERE rn <= 3),
       |sc AS MATERIALIZED (
       |  SELECT vec_id,
       |         round(list_dot_product(embedding::DOUBLE[], $qLit), 4)
       |           + 0.0 AS score
       |  FROM embeddings),
       |b0 AS (SELECT vec_id FROM embeddings
       |       ORDER BY vec_id ASC LIMIT $BEAM_ENTRIES),
       |$steps
       |SELECT b.vec_id, sc.score FROM b$BEAM_STEPS b
       |JOIN sc ON sc.vec_id = b.vec_id
       |ORDER BY sc.score DESC, b.vec_id ASC""".stripMargin
  }

  def oracleSql: Map[String, String] = {
    val qLit = VectorOps.sqlDoubleArray(VectorQueries.flagshipVec)
    val centroidCte =
      """sums AS (
        |  SELECT label, i, sum(x) AS sx
        |  FROM (SELECT label, unnest(embedding::DOUBLE[]) AS x,
        |               unnest(range(1, len(embedding)+1)) AS i
        |        FROM embeddings)
        |  GROUP BY label, i),
        |vecs AS (SELECT label, list(sx ORDER BY i) AS v FROM sums GROUP BY label)""".stripMargin
    val lshCond = (0 until Lsh.NUM_TABLES)
      .map(t => s"(${Lsh.duckBucketExpr(t)}) = ${Lsh.bucketOf(VectorQueries.flagshipVec, t)}")
      .mkString("(", "\n   OR ", ")")
    val qsCte =
      """qs AS (
        |  SELECT label AS qlabel,
        |         list_transform(
        |           list_transform(v, x -> x / sqrt(list_sum(list_transform(v, y -> y*y)))),
        |           x -> x::FLOAT::DOUBLE) AS qvec
        |  FROM vecs)""".stripMargin
    // n10: the row bucket vs the DERIVED query-vector bucket, per table
    val recallCond = (0 until Lsh.NUM_TABLES)
      .map(t => s"(${Lsh.duckBucketExpr(t)}) = (${Lsh.duckBucketExpr(t, "qvec")})")
      .mkString("(", "\n       OR ", ")")
    Map(
      // n18: n02's scan predicate widened to the same driver-literal
      // Hamming-1 probe lists per table
      "n18_multiprobe" -> {
        val cond = (0 until Lsh.NUM_TABLES).map { t =>
          val b = Lsh.bucketOf(VectorQueries.flagshipVec, t)
          val probes = b +: (0 until Lsh.BITS).map(i => b ^ (1 << i))
          s"(${Lsh.duckBucketExpr(t)}) IN (${probes.mkString(", ")})"
        }.mkString("(", "\n   OR ", ")")
        s"""SELECT vec_id,
           |       round(list_dot_product(embedding::DOUBLE[], $qLit), 4) AS score
           |FROM embeddings
           |WHERE $cond
           |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin
      },
      // n20: n17's unrolled walk with qlabel as one more key — the
      // per-query beam cut is a qlabel-partitioned rank, everything
      // else (edges, UNION dedup, rounded score, tiebreak) identical
      "n20_beam_batch" -> {
        val steps = (1 to BEAM_STEPS).map { r =>
          s"""c$r AS (
             |  SELECT qlabel, vec_id FROM b${r - 1}
             |  UNION
             |  SELECT b.qlabel, e.nbr
             |  FROM gs_edges e JOIN b${r - 1} b ON e.src = b.vec_id),
             |b$r AS MATERIALIZED (
             |  SELECT qlabel, vec_id FROM (
             |    SELECT c.qlabel, c.vec_id,
             |           row_number() OVER (PARTITION BY c.qlabel
             |             ORDER BY sc.score DESC, c.vec_id ASC) AS rn
             |    FROM c$r c
             |    JOIN sc ON sc.qlabel = c.qlabel AND sc.vec_id = c.vec_id)
             |  WHERE rn <= $BEAM_WIDTH)""".stripMargin
        }.mkString(",\n")
        s"""WITH $knnOracleCtes,
           |gs_edges AS MATERIALIZED (
           |  SELECT src, nbr FROM ranked WHERE rn <= 3),
           |$centroidCte,
           |$qsCte,
           |sc AS MATERIALIZED (
           |  SELECT q.qlabel, e.vec_id,
           |         round(list_dot_product(e.embedding::DOUBLE[], q.qvec), 4)
           |           + 0.0 AS score
           |  FROM embeddings e, qs q),
           |b0 AS (
           |  SELECT q.qlabel, v.vec_id
           |  FROM qs q, (SELECT vec_id FROM embeddings
           |              ORDER BY vec_id ASC LIMIT $BEAM_ENTRIES) v),
           |$steps
           |SELECT b.qlabel::BIGINT AS qlabel, b.vec_id, sc.score
           |FROM b$BEAM_STEPS b
           |JOIN sc ON sc.qlabel = b.qlabel AND sc.vec_id = b.vec_id
           |ORDER BY qlabel, sc.score DESC, b.vec_id ASC""".stripMargin
      },
      // n17: n09's edge CTEs + BEAM_STEPS unrolled frontier expansions;
      // UNION dedups candidates, every beam cut is the same rounded
      // (score DESC, vec_id ASC) LIMIT. n21 (the saved-artifact
      // round-trip) is DEFINED as the identical walk, so it shares this
      // oracle text verbatim — any storage-layer divergence fails the
      // hash compare.
      "n17_beam_search" -> beamWalkOracle(qLit),
      "n21_graph_artifact" -> beamWalkOracle(qLit),
      // n16: same iters=0 codebook (first 16 rows in id order), same
      // micro-unit floor(x·10⁶+0.5) BIGINT squared-L2, same (dist, cell)
      // tie-break
      "n16_kmeans_inertia" ->
        """WITH mic AS (
          |  SELECT vec_id, i - 1 AS pos,
          |         CAST(floor(x::DOUBLE * 1000000.0 + 0.5) AS BIGINT) AS mi
          |  FROM (SELECT vec_id, unnest(embedding) AS x,
          |               unnest(range(1, len(embedding)+1)) AS i
          |        FROM embeddings)),
          |cb AS (
          |  SELECT vec_id AS cell, pos, mi AS cmi FROM mic
          |  WHERE vec_id IN (SELECT vec_id FROM embeddings
          |                   ORDER BY vec_id LIMIT 16)),
          |dist AS (
          |  SELECT m.vec_id, c.cell,
          |         sum((m.mi - c.cmi) * (m.mi - c.cmi))::BIGINT AS dist
          |  FROM mic m JOIN cb c ON c.pos = m.pos
          |  GROUP BY m.vec_id, c.cell),
          |assigned AS (
          |  SELECT vec_id, cell, dist FROM dist
          |  QUALIFY row_number() OVER (PARTITION BY vec_id
          |                             ORDER BY dist ASC, cell ASC) = 1)
          |SELECT cell, count(*)::BIGINT AS n_assigned,
          |       sum(dist)::BIGINT AS inertia
          |FROM assigned GROUP BY cell ORDER BY cell""".stripMargin,
      // n19: n01's centroid ranking extended to a full rank + the
      // per-nprobe scalar probes over one shared scored CTE
      "n19_nprobe_curve" -> {
        val perP = NPROBE_MENU.map { p =>
          s"""SELECT $p::BIGINT AS nprobe, least($p, 10)::BIGINT AS n_cells,
             |  (SELECT count(*) FROM scored WHERE crank <= $p)::BIGINT
             |    AS n_scanned,
             |  (SELECT count(*) FROM (
             |     SELECT vec_id FROM scored WHERE crank <= $p
             |     ORDER BY score DESC, vec_id LIMIT 10) t
             |   JOIN brute USING (vec_id))::BIGINT AS hits10,
             |  ((SELECT count(*) FROM scored WHERE crank <= $p) * 1000
             |    // (SELECT count(*) FROM scored))::BIGINT
             |    AS scan_permille""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH $centroidCte,
           |cells AS (
           |  SELECT label, row_number() OVER (ORDER BY list_dot_product(
           |    list_transform(v, x -> x / sqrt(list_sum(list_transform(v, y -> y*y)))),
           |    $qLit) DESC, label ASC) AS crank
           |  FROM vecs),
           |scored AS MATERIALIZED (
           |  SELECT e.vec_id,
           |         round(list_dot_product(e.embedding::DOUBLE[], $qLit), 4)
           |           AS score,
           |         c.crank
           |  FROM embeddings e JOIN cells c USING (label)),
           |brute AS (SELECT vec_id FROM scored
           |          ORDER BY score DESC, vec_id LIMIT 10)
           |$perP
           |ORDER BY nprobe""".stripMargin
      },
      "n01_ann_ivf" ->
        s"""WITH $centroidCte,
           |probes AS (
           |  SELECT label FROM vecs
           |  ORDER BY list_dot_product(
           |    list_transform(v, x -> x / sqrt(list_sum(list_transform(v, y -> y*y)))),
           |    $qLit) DESC, label ASC
           |  LIMIT 2)
           |SELECT vec_id,
           |       round(list_dot_product(embedding::DOUBLE[], $qLit), 4) AS score
           |FROM embeddings JOIN probes USING (label)
           |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,
      "n02_ann_lsh_topk" ->
        s"""SELECT vec_id,
           |       round(list_dot_product(embedding::DOUBLE[], $qLit), 4) AS score
           |FROM embeddings
           |WHERE $lshCond
           |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,
      // n14: n09's edge CTEs + reversal equi-join reciprocity + the
      // per-in-degree histogram
      "n14_knn_degree_audit" ->
        s"""WITH $knnOracleCtes,
           |ed AS MATERIALIZED (SELECT src, nbr FROM ranked WHERE rn <= 3),
           |nodes AS (
           |  SELECT DISTINCT vec_id FROM (
           |    SELECT src AS vec_id FROM ed
           |    UNION ALL SELECT nbr FROM ed)),
           |outd AS (SELECT src AS vec_id, count(*) AS outdeg FROM ed GROUP BY 1),
           |ind AS (SELECT nbr AS vec_id, count(*) AS indeg FROM ed GROUP BY 1),
           |rec AS (
           |  SELECT e.src AS vec_id, count(*) AS rec_out
           |  FROM ed e JOIN ed r ON r.src = e.nbr AND r.nbr = e.src
           |  GROUP BY 1),
           |node AS (
           |  SELECT n.vec_id, coalesce(outdeg, 0) AS outdeg,
           |         coalesce(indeg, 0) AS indeg, coalesce(rec_out, 0) AS rec_out
           |  FROM nodes n LEFT JOIN outd USING (vec_id)
           |       LEFT JOIN ind USING (vec_id) LEFT JOIN rec USING (vec_id))
           |SELECT indeg::BIGINT AS indeg, count(*)::BIGINT AS n_nodes,
           |       sum(outdeg)::BIGINT AS out_edges,
           |       sum(rec_out)::BIGINT AS rec_edges,
           |       CASE WHEN sum(outdeg) = 0 THEN 0
           |            ELSE (sum(rec_out) * 1000 // sum(outdeg))::BIGINT
           |       END AS recip_permille
           |FROM node GROUP BY 1 ORDER BY indeg""".stripMargin,
      // n13: the shared IVF assignment CTEs (probe unused), then the
      // same census + permille window arithmetic
      "n13_ivf_balance" ->
        s"""WITH ${ivfOracleCtes(qLit)},
           |census AS (
           |  SELECT cell::BIGINT AS cell, count(*)::BIGINT AS n_vecs
           |  FROM assigned GROUP BY 1),
           |tot AS (SELECT sum(n_vecs)::BIGINT AS total FROM census)
           |SELECT cell, n_vecs,
           |       (n_vecs * 1000 // total)::BIGINT AS share_permille,
           |       (n_vecs * 8000 // total)::BIGINT AS skew_permille
           |FROM census, tot ORDER BY cell""".stripMargin,
      "n04_ivf_artifact" ->
        s"""WITH ${ivfOracleCtes(qLit)}
           |SELECT vec_id,
           |       round(list_dot_product(embedding::DOUBLE[], $qLit), 4) + 0.0 AS score
           |FROM assigned
           |WHERE cell IN (SELECT cell FROM probed)
           |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,
      "n03_ann_batch" ->
        s"""WITH $centroidCte,
           |$qsCte,
           |scored AS (
           |  SELECT qlabel, vec_id,
           |         round(list_dot_product(embedding::DOUBLE[], qvec), 4) AS score
           |  FROM embeddings CROSS JOIN qs),
           |ranked AS (
           |  SELECT qlabel, vec_id, score,
           |         row_number() OVER (PARTITION BY qlabel
           |                            ORDER BY score DESC, vec_id ASC) AS rn
           |  FROM scored)
           |SELECT qlabel::BIGINT AS qlabel, rn::INT AS rn, vec_id, score
           |FROM ranked WHERE rn <= 3 ORDER BY qlabel, rn""".stripMargin,
      "n05_quantized_rerank" ->
        s"""WITH coarse AS (
           |  ${VectorQueries.quantizedDotDuck(
                 VectorQueries.quantize(VectorQueries.flagshipVec))
                 .replace("\n", "\n  ")}
           |  ORDER BY qdot DESC, vec_id ASC LIMIT 100)
           |SELECT e.vec_id,
           |       round(list_dot_product(e.embedding::DOUBLE[], $qLit), 4) AS score
           |FROM embeddings e JOIN coarse c ON e.vec_id = c.vec_id
           |ORDER BY score DESC, e.vec_id ASC LIMIT 10""".stripMargin,
      // n06: every Double sum is an UNROLLED left-associated `+` chain in
      // the exact order the codegen kernels accumulate, so subspace
      // distances (hence every argmin CODE), the LUT, and the ADC score
      // are bit-identical across engines.
      "n06_pq_adc" ->
        s"""WITH ${pqOracleCtes(qLit, corpus = "embeddings")}
           |SELECT vec_id, round(score0, 4) + 0.0 AS score
           |FROM adc ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,
      // n15: the shared PQ CTEs — the chosen code's subspace distance
      // IS the reconstruction error; per-vector total via the adcSum
      // left-assoc max-CASE chain so Double addition order matches the
      // engine's mm-ordered chain
      "n15_pq_recon_error" ->
        s"""WITH ${pqOracleCtes(qLit, corpus = "embeddings")},
           |err AS (
           |  SELECT co.vec_id,
           |       ${(0 until 8).map(mm =>
                    s"max(CASE WHEN d.mm = $mm THEN d.dist END)")
                    .mkString("\n       + ")} AS err2
           |  FROM codes co JOIN dists d
           |    ON d.vec_id = co.vec_id AND d.mm = co.mm AND d.j = co.code
           |  GROUP BY co.vec_id)
           |SELECT vec_id, round(err2, 4) + 0.0 AS err2
           |FROM err ORDER BY err2 DESC, vec_id ASC LIMIT 20""".stripMargin,
      // n07: n04's cell-probe CTEs feeding n06's PQ CTEs (the pruned
      // corpus replaces the full table), then an exact fp32 rerank of
      // the ADC top-50 — the FAISS-style IVF-PQ composition end-to-end
      // under the oracle.
      "n07_ivf_pq" -> ivfPqOracle(qLit),
      // n11: n07's IVF-PQ math with the metadata predicate applied in
      // the SAME place the engine applies it — inside the pruned corpus
      // BEFORE the ADC coarse top-50 — so the candidate sets (not just
      // the final ranking) stay engine-exact under filtering.
      "n11_filtered_ann" -> ivfPqFilteredOracle(qLit, "em.label % 2 = 0"),
      // n12: rank arithmetic only — both per-list ranks are deterministic
      // row_numbers (tf/score DESC, id ASC; the vector score is v02's
      // proven round-to-4 surface), and the fused score is integer
      // 10⁶ // (K + r), so no float addition can reorder the fusion.
      "n12_hybrid_rrf" ->
        s"""WITH kwtop AS (
           |  SELECT doc_id, row_number() OVER (ORDER BY tf DESC, doc_id ASC) AS rk
           |  FROM (SELECT doc_id,
           |               len(list_filter(string_split(text, ' '),
           |                               t -> t = 'vector'))::BIGINT AS tf
           |        FROM documents)
           |  WHERE tf > 0 ORDER BY tf DESC, doc_id ASC LIMIT $HYBRID_DEPTH),
           |vectop AS (
           |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rv
           |  FROM (SELECT vec_id AS doc_id,
           |               round(list_dot_product(embedding::DOUBLE[],
           |                 ${VectorOps.sqlDoubleArray(VectorQueries.embedder.embedText("label3"))}), 4) AS score
           |        FROM embeddings)
           |  ORDER BY score DESC, doc_id ASC LIMIT $HYBRID_DEPTH)
           |SELECT coalesce(k.doc_id, v.doc_id) AS doc_id,
           |       coalesce(k.rk, 0)::BIGINT AS kw_rank,
           |       coalesce(v.rv, 0)::BIGINT AS vec_rank,
           |       (coalesce(1000000 // ($RRF_K + k.rk), 0)
           |        + coalesce(1000000 // ($RRF_K + v.rv), 0))::BIGINT AS rrf
           |FROM kwtop k FULL OUTER JOIN vectop v ON k.doc_id = v.doc_id
           |ORDER BY rrf DESC, doc_id ASC LIMIT 10""".stripMargin,
      // n08: the persisted IvfPqIndex artifact computes the SAME answer
      // as n07's in-query math (iters=0 codebooks on both sides), so
      // the oracle is shared verbatim — any drift between the artifact
      // path and the in-query path shows up as an n08 hash mismatch.
      "n08_ivfpq_artifact" -> ivfPqOracle(qLit),
      // n10: one scored corpus pass (rowq) feeds BOTH rankings; the
      // candidate filter compares the row bucket against the bucket of
      // the in-SQL-derived centroid qvec — same plane literals, same
      // float-widening arithmetic as the Spark side.
      "n10_ann_recall" ->
        s"""WITH $centroidCte,
           |$qsCte,
           |rowq AS (
           |  SELECT qlabel, vec_id, embedding, qvec,
           |         round(list_dot_product(embedding::DOUBLE[], qvec), 4) AS score
           |  FROM embeddings CROSS JOIN qs),
           |exact AS (
           |  SELECT qlabel, vec_id FROM (
           |    SELECT qlabel, vec_id,
           |           row_number() OVER (PARTITION BY qlabel
           |                              ORDER BY score DESC, vec_id ASC) AS rn
           |    FROM rowq) WHERE rn <= 10),
           |approx AS (
           |  SELECT qlabel, vec_id FROM (
           |    SELECT qlabel, vec_id,
           |           row_number() OVER (PARTITION BY qlabel
           |                              ORDER BY score DESC, vec_id ASC) AS rn
           |    FROM rowq
           |    WHERE $recallCond) WHERE rn <= 10),
           |inter AS (
           |  SELECT e.qlabel, e.vec_id
           |  FROM exact e JOIN approx a ON a.qlabel = e.qlabel AND a.vec_id = e.vec_id)
           |SELECT q.qlabel::BIGINT AS qlabel,
           |       count(i.vec_id)::BIGINT AS hits,
           |       (count(i.vec_id) * 100)::BIGINT AS recall_permille
           |FROM qs q LEFT JOIN inter i ON i.qlabel = q.qlabel
           |GROUP BY q.qlabel ORDER BY qlabel""".stripMargin,
      // n09: d06's tiered-bucket CTEs (same bitsel ladder + planesMax
      // literals + the shared hot-bucket cap QUALIFY), then a per-source
      // ranking window over the DISTINCT directed candidate pairs —
      // ranked on the ROUNDED cosine so rank boundaries agree across
      // engines.
      "n09_knn_graph" ->
        s"""WITH $knnOracleCtes
           |SELECT src, rn::INT AS rn, nbr, cos
           |FROM ranked WHERE rn <= 3 ORDER BY src, rn""".stripMargin)
  }

  /** The IVF-PQ oracle (n07 ∧ n08): probe → prune → PQ ADC → exact
    * rerank, every Double in kernel accumulation order. */
  private def ivfPqOracle(qLit: String): String =
    s"""WITH ${ivfOracleCtes(qLit)},
       |pruned AS (
       |  SELECT vec_id, embedding FROM assigned
       |  WHERE cell IN (SELECT cell FROM probed)),
       |${pqOracleCtes(qLit, corpus = "pruned")},
       |coarse AS (
       |  SELECT vec_id FROM adc ORDER BY score0 DESC, vec_id ASC LIMIT 50)
       |SELECT e.vec_id,
       |       round(list_dot_product(e.embedding::DOUBLE[], $qLit), 4) + 0.0 AS score
       |FROM embeddings e JOIN coarse USING (vec_id)
       |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin

  /** n11's oracle: [[ivfPqOracle]] with the metadata predicate fused
    * into the pruned corpus (joined back to `embeddings` for the
    * metadata column, aliased `em` for the predicate text), upstream of
    * the PQ/ADC CTEs — the exact stage the engine's
    * `IvfPqIndex.searchAdc(predicate)` filters at. */
  private def ivfPqFilteredOracle(qLit: String, predSql: String): String =
    s"""WITH ${ivfOracleCtes(qLit)},
       |pruned AS (
       |  SELECT a.vec_id, a.embedding
       |  FROM assigned a JOIN embeddings em USING (vec_id)
       |  WHERE a.cell IN (SELECT cell FROM probed) AND ($predSql)),
       |${pqOracleCtes(qLit, corpus = "pruned")},
       |coarse AS (
       |  SELECT vec_id FROM adc ORDER BY score0 DESC, vec_id ASC LIMIT 50)
       |SELECT e.vec_id,
       |       round(list_dot_product(e.embedding::DOUBLE[], $qLit), 4) + 0.0 AS score
       |FROM embeddings e JOIN coarse USING (vec_id)
       |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin

  /** The n04/n07 shared IVF-probe CTEs (no WITH): first-8 centroids in
    * id order, 2 probed, every row assigned — ends at `probed(cell)` +
    * `assigned(vec_id, embedding, cell)`. One definition so a tie-break
    * or cast fix cannot desynchronize the two oracles' candidate sets. */
  private def ivfOracleCtes(qLit: String): String =
    s"""ivfcb AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
       |         embedding AS cent
       |  FROM (SELECT vec_id, embedding FROM embeddings
       |        ORDER BY vec_id LIMIT 8)),
       |probed AS (
       |  SELECT cell FROM ivfcb
       |  ORDER BY list_dot_product(cent::DOUBLE[], $qLit) DESC, cell ASC
       |  LIMIT 2),
       |assigned AS (
       |  SELECT e.vec_id, e.embedding,
       |         (SELECT c.cell FROM ivfcb c
       |          ORDER BY list_dot_product(c.cent::DOUBLE[],
       |                                    e.embedding::DOUBLE[]) DESC,
       |                   c.cell ASC
       |          LIMIT 1) AS cell
       |  FROM embeddings e)""".stripMargin

  /** The n06 PQ pipeline as reusable DuckDB CTEs (no WITH, ends at the
    * `adc(vec_id, score0)` table) over `corpus` — shared verbatim by the
    * n06 and n07 oracles so the PQ arithmetic cannot drift between them.
    * The PQ codebook stays the first 16 rows of the FULL embeddings
    * table in both uses (an artifact is trained once, not per-probe). */
  private def pqOracleCtes(qLit: String, corpus: String): String = {
    val pqDist = (1 to 8).map(dd =>
      s"""(e.embedding[s.mm*8+$dd]::DOUBLE - c.embedding[s.mm*8+$dd]::DOUBLE)
         | * (e.embedding[s.mm*8+$dd]::DOUBLE - c.embedding[s.mm*8+$dd]::DOUBLE)"""
        .stripMargin.replace("\n", "")).mkString("\n       + ")
    val pqPdot = (1 to 8).map(dd =>
      s"($qLit)[s.mm*8+$dd] * c.embedding[s.mm*8+$dd]::DOUBLE")
      .mkString("\n       + ")
    val adcSum = (0 until 8).map(mm =>
      s"max(CASE WHEN l.mm = $mm THEN l.pdot END)").mkString("\n       + ")
    s"""cb AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, embedding
       |  FROM (SELECT vec_id, embedding FROM embeddings
       |        ORDER BY vec_id LIMIT 16)),
       |subsp AS (SELECT unnest(range(0, 8)) AS mm),
       |dists AS (
       |  SELECT e.vec_id, s.mm, c.j,
       |       $pqDist AS dist
       |  FROM $corpus e, subsp s, cb c),
       |codes AS (
       |  SELECT vec_id, mm, j AS code FROM dists
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, mm
       |                             ORDER BY dist ASC, j ASC) = 1),
       |lut AS (
       |  SELECT s.mm, c.j,
       |       $pqPdot AS pdot
       |  FROM subsp s, cb c),
       |adc AS (
       |  SELECT co.vec_id,
       |       $adcSum AS score0
       |  FROM codes co JOIN lut l ON l.mm = co.mm AND l.j = co.code
       |  GROUP BY co.vec_id)""".stripMargin
  }
}
