package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.agg.VectorAggregators
import graft.embed.Embedder
import graft.vec.VectorOps

/** Per-dimension visualization cell (reference heat-map,
  * `rclip_server.py:253-273`). */
final case class DimCell(dim: Int, value: Float, norm01: Double, color: String)

/** `/thm/{id}` outcome, minus HTTP (`rclip_server.py:448-479`): the id −1
  * placeholder, a size-rewritten CDN redirect, or locally resized bytes. */
sealed trait Thumb
final case class SvgPlaceholder(svg: String) extends Thumb
final case class RedirectUrl(url: String) extends Thumb
final case class ResizedBytes(bytes: Array[Byte]) extends Thumb

/** The engine façade — one method per reference endpoint (SURVEY §2.11):
  * search (K1), similarWords (K2), similarPhrases (W1–W3),
  * resolveEmbedding / textEmbedding, visualize, censor (M1), dedup (M2/A6),
  * upsert (S7), reload (M3), stats (A1–A4).
  *
  * State model: the images table lives in a [[SnapshotStore]]; the active
  * view (deleted rows filtered out) is cached in memory after first
  * action — the Spark analog of the reference's startup scan + dense
  * matrix (`rclip_server.py:59-66`). Mutations write a new snapshot and
  * refresh the cache (the reference's unreachable re-init at `:235` done
  * right).
  *
  * Scale: the scored scan is embarrassingly parallel over cached
  * partitions; top-k is TakeOrderedAndProject (per-partition heap,
  * k-bounded driver merge); the only driver-side vectors are the query
  * vector and the word table's centroids.
  */
final class RClipEngine(
    spark: SparkSession,
    store: SnapshotStore,
    val embedder: Embedder,
    wordsSource: Option[DataFrame] = None,
    idCol: String = "vec_id",
    vecCol: String = "embedding",
    censorKey: Option[String] = None,
    seed: Long = 42L,
    pathLike: Option[String] = None,
    wordMapMax: Long = RClipEngine.WordMapMax,
    fastPathMaxRows: Long = RClipEngine.FastPathMaxRows,
    annServing: Option[RClipEngine.AnnServing] = None) extends StoredVectors {

  import spark.implicits._

  // all scoring below uses the codegen vec_dot expression (same plan shape
  // the oracle queries are PlanSpec-locked to); register for foreign
  // sessions that didn't come through graft.Sessions
  VectorOps.ensureRegistered(spark)

  // ---------------------------------------------------------------- state

  @volatile private var activeDf: DataFrame = loadActive()
  @volatile private var statsCache: Option[(Array[Double], Array[Double])] = None
  // serving-index state machines (VERDICT r08 next-#3): builds run OUTSIDE
  // the engine monitor and CAS their result in, so a corpus-sized index
  // build never head-of-line blocks censor/reload or other callers — a
  // request arriving mid-build serves the fallback regime instead of
  // waiting. Each in-flight build holds a UNIQUE Building token; reload()
  // resetting the state to Unbuilt makes the stale builder's final CAS
  // fail, so an index built from a superseded snapshot can never install.
  private val fastCache =
    new java.util.concurrent.atomic.AtomicReference[RClipEngine.FastState](
      RClipEngine.FastUnbuilt)
  private val annCache =
    new java.util.concurrent.atomic.AtomicReference[RClipEngine.AnnState](
      RClipEngine.AnnUnbuilt)
  private val buildTokens = new java.util.concurrent.atomic.AtomicLong(0L)

  private def hasDeleted = store.read(spark).columns.contains("deleted")

  /** Scan + soft-delete filter (S1/P2): `deleted IS NULL OR NOT deleted`,
    * exact three-valued logic, plus the reference's optional parameterized
    * `filepath LIKE` scan restriction (`rclip_server.py:206-212`) — a
    * plain Catalyst predicate, so prefix patterns push down to the scan as
    * StringStartsWith. Requires a `filepath` column when set. */
  private def loadActive(): DataFrame = {
    val raw = store.read(spark)
    // S1 BLOB variant: the reference stores vectors as BLOBs of
    // little-endian float32 and decodes at scan (`rclip_server.py:215`);
    // a BinaryType vector column gets the same treatment via the codegen
    // vec_decode, so reference-format snapshots work unmodified.
    val df =
      if (raw.schema(vecCol).dataType == org.apache.spark.sql.types.BinaryType)
        raw.withColumn(vecCol, VectorOps.decodeVec(col(vecCol)))
      else raw
    val live =
      if (df.columns.contains("deleted"))
        df.filter(col("deleted").isNull || col("deleted") === false)
      else df
    val scoped = pathLike.fold(live)(p => live.filter(col("filepath").like(p)))
    scoped.cache()
  }

  /** Live (non-deleted) rows, cached. */
  def images: DataFrame = activeDf

  def count(): Long = activeDf.count()

  /** M3: drop caches, re-read the newest snapshot, invalidate stats.
    * Setting the serving states to Unbuilt also dooms any IN-FLIGHT
    * index build: its completion CAS (Building(token) → Built) can no
    * longer match, so a pre-mutation index never installs. */
  def reload(): Unit = synchronized {
    activeDf.unpersist()
    activeDf = loadActive()
    statsCache = None
    fastCache.set(RClipEngine.FastUnbuilt)
    annCache.set(RClipEngine.AnnUnbuilt)
  }

  // ---------------------------------------------------------------- words

  /** Words table (S3): supplied, or derived per-label centroids. */
  lazy val words: DataFrame = WordTable.lowercaseOnly(
    wordsSource.getOrElse(
      WordTable.labelCentroids(activeDf, vecCol = vecCol))).cache()

  /** Bounded driver word map (VERDICT r03 #3): the reference keeps its
    * whole word matrix in RAM (`rclip_server.py:306-308`) and a
    * vocabulary-sized table fits a driver Map fine — but "vocabulary-
    * sized" is an assumption, not a law, so the collect is capped like
    * every other driver-side materialization here (c05's SPAN_HOT_MAX,
    * d05's require). Over the cap: `None`, and [[lookupWordVectors]]
    * switches to a per-query filtered lookup against the cached words
    * table — bounded by the query's token count, never the vocabulary —
    * so `tableEmbedder` (and the TermResolver LRU above it) survive a
    * 100× words table instead of OOMing the driver. */
  private lazy val wordVectors: Option[Map[String, Array[Float]]] =
    if (words.count() <= wordMapMax)
      Some(words.select(col("word"), col("vector"))
        .as[(String, Array[Float])].collect().toMap)
    else {
      org.slf4j.LoggerFactory.getLogger(classOf[RClipEngine]).warn(
        s"words table exceeds wordMapMax=$wordMapMax rows — " +
          "falling back to per-query word lookups instead of a driver map")
      None
    }

  /** Token → vector lookups, multiplicity- and order-preserving on both
    * paths (duplicate query tokens contribute their vector twice, exactly
    * like the driver-map path — the phrase estimate depends on it). */
  private def lookupWordVectors(toks: Array[String]): Array[Array[Float]] =
    wordVectors match {
      case Some(m) => toks.flatMap(m.get)
      case None =>
        val found = words
          .filter(col("word").isin(toks.distinct.toSeq: _*))
          .select(col("word"), col("vector"))
          .as[(String, Array[Float])].collect().toMap
        toks.flatMap(found.get)
    }

  /** Embedder that resolves via the word table first (the reference's own
    * precomputed-words mode), falling back to the base embedder. */
  private lazy val tableEmbedder: Embedder = new Embedder {
    val dim: Int = embedder.dim
    def embedText(text: String): Array[Float] = {
      val toks = text.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
      val known = lookupWordVectors(toks)
      if (known.isEmpty) embedder.embedText(text)
      else VectorOps.normalize(known.reduce(VectorOps.add))
    }
    def embedImage(bytes: Array[Byte]): Array[Float] = embedder.embedImage(bytes)
  }

  lazy val resolver = new TermResolver(tableEmbedder, this)

  // ------------------------------------------------- StoredVectors (J2/Q7)

  override def byId(id: Long): Option[Array[Float]] =
    activeDf.filter(col(idCol) === id).select(col(vecCol))
      .as[Array[Float]].collect().headOption

  override def random(): Option[Array[Float]] =
    activeDf.select(col(vecCol)).orderBy(rand(seed)).limit(1)
      .as[Array[Float]].collect().headOption

  // ---------------------------------------------------------------- reads

  /** K1 — the flagship: resolve the query, score every live row by dot
    * product (== cosine, both sides unit), return top-`num` by
    * (score DESC, id ASC). Empty parse → empty result (Q11).
    *
    * Serving latency: the distributed scored scan is one Spark job, and
    * even fully warm a local job dispatch costs ~0.1 s (Bench's own
    * empty-job calibration) — fine for batch, visible to an interactive
    * `/search_api` caller. Below [[fastPathMaxRows]] live rows the
    * engine therefore serves from a DRIVER-RESIDENT (id, vector) matrix
    * — exactly the reference's own design (its whole corpus is one RAM
    * ndarray scored with a dense matmul, `rclip_server.py:228,194-198`)
    * — with BIT-IDENTICAL results (same index-order Double dot, same
    * HALF_UP 4-dp round, same (score DESC, id ASC) cut; EngineSpec pins
    * fast == distributed on the real corpus). Above the cap: the
    * distributed path, unchanged. Mutations invalidate the matrix via
    * [[reload]] like every other engine cache. */
  def search(q: String, num: Int = 12): DataFrame =
    resolver.resolve(q) match {
      case None => spark.emptyDataFrame
          .withColumn("id", lit(null).cast("long"))
          .withColumn("score", lit(null).cast("double"))
          .limit(0)
      case Some(v) => fastIndex() match {
        case Some(idx) => fastTopK(idx, v, num)
        case None => annIndex() match {
          case Some(ix) => annTopK(ix, v, num)
          case None => scoreTopK(activeDf, v, num)
        }
      }
    }

  /** Typed serving twin of [[search]]: the same resolve → score → top-k,
    * returned as driver rows with NO DataFrame wrap — on the fast path
    * this never touches the query planner, so a warm interactive request
    * is pure arithmetic (sub-millisecond; `search()`'s 12-row local
    * DataFrame still pays ~15 ms of per-request planning). The HTTP
    * layer serves `/search_api` from this. Distributed fallback collects
    * the same k-bounded [[scoreTopK]], so results are identical to
    * `search()` in both regimes. */
  def searchRows(q: String, num: Int = 12): Seq[(Long, Double)] =
    resolver.resolve(q) match {
      case None => Seq.empty
      case Some(v) => fastIndex() match {
        case Some(idx) => fastScore(idx, v, num).toSeq
        case None => annIndex() match {
          case Some(ix) => annTopK(ix, v, num)
            .as[(Long, Double)].collect().toSeq
          case None => scoreTopK(activeDf, v, num)
            .as[(Long, Double)].collect().toSeq
        }
      }
    }

  /** EXACT search regardless of regime: the distributed brute scored
    * scan, the fallback an above-cap ANN caller uses to trade latency
    * back for guaranteed-exact results (and the ground truth the ANN
    * path's recall is measured against). Below the cap this equals
    * `search()` bit-for-bit (EngineSpec pins fast ≡ distributed). */
  def searchExact(q: String, num: Int = 12): DataFrame =
    resolver.resolve(q) match {
      case None => spark.emptyDataFrame
          .withColumn("id", lit(null).cast("long"))
          .withColumn("score", lit(null).cast("double"))
          .limit(0)
      case Some(v) => scoreTopK(activeDf, v, num)
    }

  private def scoreTopK(df: DataFrame, v: Array[Float], k: Int): DataFrame =
    df.select(col(idCol).as("id"),
        round(VectorOps.dotQueryNative(col(vecCol), v), 4).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)

  /** Build (or reuse) the driver-resident matrix; None = corpus over the
    * cap, serve distributed. One collect of n·(8 + 4·dim) bytes — the
    * same RAM envelope the reference pays up front at startup.
    *
    * Lock scope (ADVICE r07 → VERDICT r08 next-#3): the build runs
    * OUTSIDE the engine monitor. The builder claims the state with a
    * unique Building token and CASes the result in; a concurrent caller
    * seeing Building serves the distributed path (bit-identical results,
    * EngineSpec-pinned) instead of waiting, and a reload() during the
    * build resets the state so the stale matrix never installs. */
  private def fastIndex(): Option[RClipEngine.FastIndex] = fastCache.get() match {
    case RClipEngine.FastBuilt(idx) => Some(idx)
    case RClipEngine.FastDisabled => None
    case _: RClipEngine.FastBuilding => None // in-flight build: serve distributed
    case RClipEngine.FastUnbuilt =>
      val token = RClipEngine.FastBuilding(buildTokens.incrementAndGet())
      if (!fastCache.compareAndSet(RClipEngine.FastUnbuilt, token))
        fastIndex() // someone else moved the state; re-read it
      else {
        val result =
          try {
            if (count() > fastPathMaxRows) RClipEngine.FastDisabled
            else {
              val rows = activeDf.select(col(idCol), col(vecCol))
                .as[(Long, Array[Float])].collect()
              RClipEngine.FastBuilt(
                RClipEngine.FastIndex(rows.map(_._1), rows.map(_._2)))
            }
          } catch {
            case t: Throwable =>
              fastCache.compareAndSet(token, RClipEngine.FastUnbuilt)
              throw t
          }
        // install only if no reload() superseded this build
        fastCache.compareAndSet(token, result)
        fastCache.get() match {
          case RClipEngine.FastBuilt(idx) => Some(idx)
          case _ => None
        }
      }
  }

  /** Driver-side twin of [[scoreTopK]]: identical arithmetic (index-order
    * Double dot over min-length = vec_dot; HALF_UP round at 4 dp =
    * Spark's `round`) and identical (score DESC, id ASC) tie order, so
    * the two paths are indistinguishable to a caller. */
  private def fastScore(idx: RClipEngine.FastIndex,
      v: Array[Float], k: Int): Array[(Long, Double)] = {
    val n = idx.ids.length
    val scored = new Array[(Long, Double)](n)
    var r = 0
    while (r < n) {
      val e = idx.vecs(r)
      val m = math.min(e.length, v.length)
      var s = 0.0
      var i = 0
      while (i < m) { s += e(i).toDouble * v(i).toDouble; i += 1 }
      scored(r) = (idx.ids(r), java.math.BigDecimal.valueOf(s)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())
      r += 1
    }
    scored.sortBy { case (id, sc) => (-sc, id) }.take(k)
  }

  private def fastTopK(idx: RClipEngine.FastIndex,
      v: Array[Float], k: Int): DataFrame =
    fastScore(idx, v, k).toSeq.toDF("id", "score")

  /** The ABOVE-CAP ANN serving regime (VERDICT r07 next-#2): opt-in via
    * [[RClipEngine.AnnServing]]. The reference brute-forces every search
    * against its whole RAM matrix (`rclip_server.py:194-198,228`) — fine
    * at its corpus size, and mirrored here below [[fastPathMaxRows]];
    * above the cap a full distributed scan per interactive request is
    * the first thing a user feels at 100× corpus. This regime serves it
    * from an [[graft.ann.IvfPqIndex]] over the LIVE rows instead:
    * partition-pruned packed-code ADC scan (nprobe/cells of the corpus
    * at 8 B/row) → exact fp32 rerank of `coarseK` candidates through the
    * SAME [[scoreTopK]] expression as the brute path — so every returned
    * id carries its exact brute-path score by construction; only the
    * candidate CUT is approximate (EngineSpec pins a recall floor, and
    * [[searchExact]] stays available as the exact fallback).
    *
    * Built by [[warm]] (or lazily on first above-cap search when
    * `buildOnFirstSearch` is set) from the active snapshot; mutations
    * invalidate it via [[reload]] like every other engine cache — and
    * the on-disk artifact's `_graft_built_from` marker stops matching
    * the new store version — so a censored row can never be served from
    * a stale index. With `artifactPath` set, the built index is SAVED
    * and re-LOADED so the probe path is the persisted cell-partitioned
    * parquet layout — the shape a 1000-executor deployment serves from
    * (build once per snapshot, every search a pruned point read).
    *
    * Regime POLICY (VERDICT r08 next-#3): by default a search request
    * never triggers the minutes-long corpus build — it serves ANN when a
    * TRUSTED artifact exists (saved from this store version + config,
    * attested by the `_graft_built_from` marker; a cheap load), and brute
    * otherwise. Builds happen through [[warm]] (startup / post-reload) or,
    * opt-in, on first search via `buildOnFirstSearch`. Like [[fastIndex]],
    * any build/load runs OUTSIDE the engine monitor with a unique Building
    * token: concurrent censor/reload/search never block on it, and a
    * reload() mid-build dooms the stale index's installing CAS. */
  private def annIndex(forceBuild: Boolean = false): Option[RClipEngine.AnnBuilt] =
    annCache.get() match {
      case b: RClipEngine.AnnBuilt => Some(b)
      case RClipEngine.AnnDisabled => None
      case _: RClipEngine.AnnBuilding => None // in-flight: serve brute
      case RClipEngine.AnnUnbuilt => annServing match {
        case None =>
          annCache.compareAndSet(RClipEngine.AnnUnbuilt, RClipEngine.AnnDisabled)
          None
        case Some(p) =>
          val trusted = annArtifactTrusted(p)
          if (!trusted && !forceBuild && !p.buildOnFirstSearch) None // brute
          else {
            val token = RClipEngine.AnnBuilding(buildTokens.incrementAndGet())
            if (!annCache.compareAndSet(RClipEngine.AnnUnbuilt, token))
              annIndex(forceBuild) // state moved under us; re-read
            else {
              val result =
                try {
                  val ix =
                    if (trusted) graft.ann.IvfPqIndex.load(spark, p.artifactPath.get)
                    else {
                      // real Lloyd iterations on BOTH codebooks: the
                      // query-time operators keep iters=0 for bitwise-
                      // reproducible oracles, but a SERVING index's recall
                      // depends on cells that follow the data geometry —
                      // nprobe/cells is only a meaningful pruning ratio
                      // when near-neighbors share cells
                      val built = graft.ann.IvfPqIndex.build(
                        activeDf.select(col(idCol), col(vecCol)),
                        idCol = idCol, vecCol = vecCol,
                        cells = p.cells, ivfIters = p.ivfIters,
                        m = p.m, k = p.k, pqIters = p.pqIters)
                      p.artifactPath match {
                        case Some(path) =>
                          built.save(path)
                          writeAnnMarker(p, path)
                          built.codes.unpersist()
                          graft.ann.IvfPqIndex.load(spark, path)
                        case None => built
                      }
                    }
                  // RAM-COARSE regime: below driverCodesMaxRows also hold
                  // the 20 B/row packed-code table driver-resident — the
                  // coarse cut then costs no Spark dispatch at all (the
                  // 8 B codes fit the driver 32× past the point the fp32
                  // matrix cannot)
                  val codeIdx =
                    if (count() > p.driverCodesMaxRows) None
                    else {
                      val rows = ix.codes
                        .select(col(idCol), col("cell"), col("code"))
                        .as[(Long, Int, Long)].collect()
                      Some(RClipEngine.CodeIndex(rows.map(_._1),
                        rows.map(_._2), rows.map(_._3)))
                    }
                  RClipEngine.AnnBuilt(ix, codeIdx)
                } catch {
                  case t: Throwable =>
                    annCache.compareAndSet(token, RClipEngine.AnnUnbuilt)
                    throw t
                }
              // install only if no reload() superseded this build
              annCache.compareAndSet(token, result)
              annCache.get() match {
                case b: RClipEngine.AnnBuilt => Some(b)
                case _ => None
              }
            }
          }
      }
    }

  /** The `_graft_built_from` marker ties a saved serving artifact to the
    * snapshot VERSION and index config it was built from: a mutation
    * commits a new store version, the marker stops matching, and the
    * stale artifact is ignored (brute serves until the next [[warm]])
    * rather than serving censored rows. */
  private def annMarkerExpected(p: RClipEngine.AnnServing): String =
    s"v=${store.latestVersion.getOrElse(-1)};path=${pathLike.getOrElse("")};" +
      s"id=$idCol;vec=$vecCol;cells=${p.cells};m=${p.m};k=${p.k};" +
      s"ivf=${p.ivfIters};pq=${p.pqIters}"

  private def writeAnnMarker(p: RClipEngine.AnnServing, path: String): Unit = {
    java.nio.file.Files.writeString(
      new java.io.File(path, "_graft_built_from").toPath, annMarkerExpected(p))
    ()
  }

  private def annArtifactTrusted(p: RClipEngine.AnnServing): Boolean =
    p.artifactPath.exists { path =>
      val mk = new java.io.File(path, "_graft_built_from")
      mk.isFile && {
        try java.nio.file.Files.readString(mk.toPath) == annMarkerExpected(p)
        catch { case _: java.io.IOException => false }
      }
    }

  /** Pre-build the serving indexes for the CURRENT snapshot (VERDICT r08
    * next-#3): call at startup and after mutations/reload so no request
    * ever pays (or waits behind) an index build. Runs outside the engine
    * monitor — concurrent censor/search during the warm proceed normally
    * (they serve the fallback regime until the CAS lands). Below the fast
    * cap this warms the RAM matrix; above it, the ANN regime when
    * configured (building and persisting the artifact if absent or
    * untrusted). A reload() racing the warm simply wins: the half-built
    * index is discarded and the next warm() rebuilds from the new
    * snapshot. */
  def warm(): Unit = {
    if (fastIndex().isEmpty) { annIndex(forceBuild = true); () }
  }

  /** Serving-state probe for specs and monitoring. */
  private[engine] def annState: RClipEngine.AnnState = annCache.get()
  private[engine] def fastState: RClipEngine.FastState = fastCache.get()

  /** DRIFT MONITORING against the LIVE serving index (VERDICT r08
    * next-#4): one health row measuring what a deployment alarms on
    * between rebuilds — n10's recall@k of the serving ANN path vs the
    * exact brute ranking over the CURRENT live rows, and n13's cell
    * balance of the serving code table. `None` when no ANN index is
    * serving (brute and RAM-matrix regimes have nothing to drift).
    * Cost: |panel| reranked searches + |panel| exact scans + one
    * code-table aggregate — the measurement loop n10/n13 run as corpus
    * queries, pointed at the serving artifact. */
  def annHealth(panel: Seq[String], k: Int = 10): Option[RClipEngine.AnnHealth] =
    annCache.get() match {
      case b: RClipEngine.AnnBuilt if panel.nonEmpty =>
        val p = annServing.get
        val recalls = panel.flatMap { q =>
          resolver.resolve(q).map { v =>
            val truth = scoreTopK(activeDf, v, k)
              .select(col("id")).as[Long].collect().toSet
            val got = annTopK(b, v, k)
              .select(col("id")).as[Long].collect().toSet
            if (truth.isEmpty) 1000L
            else (got & truth).size * 1000L / truth.size
          }
        }
        if (recalls.isEmpty) None
        else {
          val sizes = b.ix.codes.groupBy(col("cell"))
            .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
            .select(col("cell"), col("n")).as[(Int, Long)].collect()
          val rows = sizes.map(_._2).sum
          val nCells = b.ix.centroids.length
          val meanSz = rows.toDouble / math.max(1, nCells)
          val skew = if (rows == 0L) 0.0 else sizes.map(_._2).max / meanSz
          val health = RClipEngine.AnnHealth(
            recallPermille = recalls.sum / recalls.size,
            worstPermille = recalls.min,
            cellSkew = skew,
            emptyCells = nCells.toLong - sizes.length,
            rows = rows,
            alarm = recalls.sum / recalls.size < p.healthRecallFloorPermille ||
              skew > p.healthCellSkewMax)
          Some(health)
        }
      case _ => None
    }

  /** ANN top-k: pruned ADC candidates, then the exact rerank reuses
    * [[scoreTopK]] over the candidate-restricted live rows — identical
    * scoring expression, rounding, and (score DESC, id ASC) tie order
    * to the brute path, so the regimes differ only in which rows
    * survive the coarse cut. And the coarse cut itself is identical in
    * BOTH coarse modes: the RAM path runs [[graft.ann.PqIndex
    * .adcPacked]] (the expression's bit-exact driver twin) over the
    * same codes with the same (adc DESC, id ASC) order, so RAM-coarse,
    * distributed-coarse, and their reranks are indistinguishable to a
    * caller (EngineSpec pins all three equalities). */
  private def annTopK(b: RClipEngine.AnnBuilt, v: Array[Float],
      k: Int): DataFrame = {
    val p = annServing.get
    b.codeIdx match {
      case Some(ci) =>
        val lut = graft.ann.PqIndex.lut(b.ix.flatCodebook, b.ix.m, b.ix.k, v)
        val cand = RClipEngine.ramCoarseCut(ci, lut, b.ix.m, b.ix.k,
          b.ix.probeCells(v, p.nprobe), p.coarseK)
        scoreTopK(activeDf.filter(col(idCol).isin(cand: _*)), v, k)
      case None =>
        val cand = b.ix.searchAdc(v, topk = p.coarseK, nprobe = p.nprobe)
          .select(col(idCol))
        scoreTopK(activeDf.join(broadcast(cand), idCol), v, k)
    }
  }

  /** `/clip_embedding` — the resolved query vector. */
  def resolveEmbedding(q: String): Option[Array[Float]] = resolver.resolve(q)

  /** `/clip_text_embedding` — raw text-encoder output, no query algebra. */
  def textEmbedding(q: String): Array[Float] = tableEmbedder.embedText(q)

  /** K2 — top-`num` most similar words (`rclip_server.py:310-312,399`). */
  def similarWords(q: String, num: Int = 50): DataFrame =
    resolver.resolve(q) match {
      case None => spark.emptyDataFrame.limit(0)
      case Some(v) =>
        words.select(col("word"),
            round(VectorOps.dotQueryNative(col("vector"), v), 4).as("score"))
          .orderBy(col("score").desc, col("word").asc)
          .limit(num)
    }

  /** Typed serving twin of [[similarWords]] (the `/similar_words` word
    * half, `rclip_server.py:395-402`): when the vocabulary-sized word
    * map is driver-resident (the [[wordMapMax]] regime — the reference's
    * own RAM word matrix, `rclip_server.py:306-308`), score it directly
    * with the same index-order Double dot + HALF_UP 4-dp round and the
    * same (score DESC, word ASC) cut; over the cap, collect the
    * distributed ranking. EngineSpec pins map ≡ distributed. */
  def similarWordsRows(q: String, num: Int = 50): Seq[(String, Double)] =
    resolver.resolve(q) match {
      case None => Seq.empty
      case Some(v) => wordVectors match {
        case Some(m) =>
          m.toSeq.map { case (w, vec) =>
            val n = math.min(vec.length, v.length)
            var s = 0.0
            var i = 0
            while (i < n) { s += vec(i).toDouble * v(i).toDouble; i += 1 }
            (w, java.math.BigDecimal.valueOf(s)
              .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())
          }.sorted(RClipEngine.byScoreDescUtf8Asc).take(num)
        case None =>
          similarWords(q, num).as[(String, Double)].collect().toSeq
      }
    }

  /** Typed serving twin of [[similarPhrases]] (estimate variant — the
    * endpoint's serving path; the `exact = true` re-encode trade stays
    * on the DataFrame API): pool ranking, seeded candidate draw, W1
    * vector-sum estimate, normalize, dot and the (score DESC, phrase
    * ASC) cut all run on the driver word map with arithmetic identical
    * to the distributed pipeline — the element-wise Double sums are
    * sums of float-widened values, exactly representable, so the
    * aggregate is addition-order-proof and the two paths agree bitwise
    * (EngineSpec pins it). Over [[wordMapMax]]: distributed fallback. */
  def similarPhrasesRows(q: String, num: Int = 50,
      combosPerLen: Int = 1000, topWords: Int = 200): Seq[(String, Double)] =
    resolver.resolve(q) match {
      case None => Seq.empty
      case Some(v) => wordVectors match {
        case None =>
          similarPhrases(q, num, combosPerLen, topWords)
            .as[(String, Double)].collect().toSeq
        case Some(m) =>
          def dot(e: Array[Float]): Double = {
            val n = math.min(e.length, v.length)
            var s = 0.0
            var i = 0
            while (i < n) { s += e(i).toDouble * v(i).toDouble; i += 1 }
            s
          }
          // pool: same raw (un-rounded) score ordering as the DataFrame
          val pool = m.toSeq.map { case (w, vec) => (w, dot(vec)) }
            .sorted(RClipEngine.byScoreDescUtf8Asc).take(topWords).map(_._1)
          val rnd = new java.util.Random(seed)
          def pick(n: Int): Seq[String] = {
            val idx = scala.collection.mutable.LinkedHashSet.empty[Int]
            while (idx.size < n && idx.size < pool.length)
              idx += rnd.nextInt(pool.length)
            idx.toSeq.map(pool)
          }
          val candidates = (2 to 4).flatMap { len =>
            (1 to combosPerLen).map(_ => pick(len).mkString(" "))
          }.distinct
          candidates.flatMap { phrase =>
            val vecs = phrase.split(" ").flatMap(m.get)
            if (vecs.isEmpty) None // no known word: the join drops it too
            else {
              val sum = new Array[Double](vecs.head.length)
              vecs.foreach { e =>
                var i = 0
                while (i < sum.length && i < e.length) {
                  sum(i) += e(i).toDouble; i += 1
                }
              }
              val unit = VectorOps.normalize(sum.map(_.toFloat))
              Some((phrase, java.math.BigDecimal.valueOf(dot(unit))
                .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()))
            }
          }.sorted(RClipEngine.byScoreDescUtf8Asc).take(num)
      }
    }

  /** W1–W3 — random multi-word phrase candidates scored by the normalized
    * word-vector-sum estimate, or (`exact = true`) by re-encoding each
    * phrase with the base encoder — the reference keeps both variants as
    * an explicit accuracy/speed trade (`rclip_server.py:314-342`; the
    * exact CLIP-encode at `:320-328`). Distributed shape (estimate):
    * candidates → explode → broadcast-join words → vector-sum aggregate →
    * normalize → dot → top-k; (exact): candidates → encoder UDF → top-k.
    * Deterministic via seed. */
  def similarPhrases(q: String, num: Int = 50,
      combosPerLen: Int = 1000, topWords: Int = 200,
      exact: Boolean = false): DataFrame =
    resolver.resolve(q) match {
      case None => spark.emptyDataFrame.limit(0)
      case Some(v) =>
        // top-`topWords` words for this query (reference :331)
        val pool = words
          .select(col("word"), col("vector"),
            VectorOps.dotQueryNative(col("vector"), v).as("wscore"))
          .orderBy(col("wscore").desc, col("word").asc)
          .limit(topWords)
          .select("word").as[String].collect()
        val rnd = new java.util.Random(seed)
        def pick(n: Int): Seq[String] = {
          // sample n distinct indices (reference uses random.sample :333)
          val idx = scala.collection.mutable.LinkedHashSet.empty[Int]
          while (idx.size < n && idx.size < pool.length) idx += rnd.nextInt(pool.length)
          idx.toSeq.map(pool)
        }
        val candidates = (2 to 4).flatMap { len =>
          (1 to combosPerLen).map(_ => pick(len).mkString(" "))
        }.distinct
        if (exact) {
          // W2 exact: per-candidate re-encode in a distributed UDF (the
          // encoder port is Serializable — ship the base embedder, never
          // the engine). No driver loop; the candidate set stays on
          // executors until the k-bounded top-k merge.
          val enc = embedder
          val exactScore = udf { (phrase: String) =>
            java.lang.Double.valueOf(VectorOps.dot(enc.embedText(phrase), v))
          }
          candidates.toDF("phrase")
            .select(col("phrase"), round(exactScore(col("phrase")), 4).as("score"))
            .orderBy(col("score").desc, col("phrase").asc)
            .limit(num)
        } else {
          val candDf = candidates.toDF("phrase")
            .withColumn("word", explode(split(col("phrase"), " ")))
          val toUnitFloat = udf { (a: Array[Double]) =>
            if (a == null) null
            else VectorOps.normalize(a.map(_.toFloat))
          }
          candDf
            .join(broadcast(words), "word") // J3; words is tiny → broadcast
            .groupBy("phrase")
            .agg(VectorAggregators.vecSum(col("vector")).as("vsum")) // W1
            .select(col("phrase"),
              round(VectorOps.dotQueryNative(toUnitFloat(col("vsum")), v), 4).as("score"))
            .orderBy(col("score").desc, col("phrase").asc)
            .limit(num)
        }
    }

  // ---------------------------------------------------------------- stats

  /** A1/A2: element-wise (min, max) over all live embeddings — one
    * map-side-combining aggregation (`rclip_server.py:63-65`). */
  def stats(): (Array[Double], Array[Double]) = statsCache.getOrElse {
    val row = activeDf.agg(
      VectorAggregators.vecMin(col(vecCol)).as("lo"),
      VectorAggregators.vecMax(col(vecCol)).as("hi")).head()
    val s = (row.getSeq[Double](0).toArray, row.getSeq[Double](1).toArray)
    statsCache = Some(s)
    s
  }

  /** `/visualize_clip_embedding` — per-dimension cells normalized by the
    * corpus min/max (`rclip_server.py:253-273`). */
  def visualize(q: String): Seq[DimCell] =
    resolver.resolve(q) match {
      case None => Nil
      case Some(v) =>
        val (lo, hi) = stats()
        v.toSeq.zipWithIndex.map { case (x, i) =>
          val range = hi(i) - lo(i)
          val t = if (range == 0) 0.5 else ((x - lo(i)) / range).max(0.0).min(1.0)
          DimCell(i, x, t, Colormap.hex(t))
        }
    }

  /** `/img/{id}` thumbnail-size rewrite: the stored 600px CDN variant
    * rewritten to the requested size (`rclip_server.py:461-463`). Returns
    * None for unknown ids or rows without a thumb URL. */
  def thumbnailUrl(id: Long, size: Int = 600): Option[String] = {
    val cols = activeDf.columns
    if (!cols.contains("thumb_url")) None
    else activeDf.filter(col(idCol) === id).select(col("thumb_url"))
      .as[Option[String]].collect().headOption.flatten
      .map(_.replaceFirst("/600px-", s"/${size}px-"))
  }

  /** The id −1 placeholder thumbnail (`rclip_server.py:451-458`): a 4:3
    * SVG with a centered dark circle. */
  def placeholderSvg(size: Int = 400): String =
    s"""<svg version="1.1" width="$size" height="${size * 3 / 4}" xmlns="http://www.w3.org/2000/svg">
       |<circle cx="50%" cy="50%" r="25%" fill="#222"/>
       |</svg>""".stripMargin

  /** Full `/thm/{id}` semantics minus HTTP (`rclip_server.py:448-479`):
    * id −1 → placeholder SVG; stored CDN thumb → size-rewritten redirect
    * URL; otherwise the stored `filepath` is fetched and resized through
    * the media-decoder port (EXIF transpose / JPEG re-encode are codec
    * concerns inside [[graft.multimodal.MultimodalOps.MediaDecoder]] —
    * stubbed offline, like the rest of the codec surface). */
  def thumbnail(id: Long, size: Int = 400,
      fetcher: ImageFetcher = FakeImageFetcher,
      decoder: graft.multimodal.MultimodalOps.MediaDecoder =
        graft.multimodal.MultimodalOps.FakeMediaDecoder): Option[Thumb] =
    if (id == -1L) Some(SvgPlaceholder(placeholderSvg(size)))
    else thumbnailUrl(id, size).map(RedirectUrl(_)).orElse {
      if (!activeDf.columns.contains("filepath")) None
      else activeDf.filter(col(idCol) === id).select(col("filepath"))
        .as[String].collect().headOption
        .map(p => ResizedBytes(decoder.resize(fetcher.fetch(p), size, size * 3 / 4)))
    }

  /** `/info/{id}` — metadata + stored embedding for one row. The
    * reference's handler calls a nonexistent method and would throw
    * (`rclip_server.py:483`, SURVEY §7.4); implemented as intended. */
  def info(id: Long): Option[(Long, Array[Float])] =
    activeDf.filter(col(idCol) === id)
      .select(col(idCol), col(vecCol))
      .as[(Long, Array[Float])].collect().headOption

  /** `/copyright_message` — derived from the store location, mirroring
    * the reference's regex-on-db-name contract (`rclip_server.py:276,
    * 489-492`). */
  def copyrightMessage: String =
    if (store.root.toLowerCase.contains("wikimedia"))
      "Images are from Wikimedia Commons; see each image's description page for its license."
    else s"Corpus at ${store.root}; licensing unknown."

  // ------------------------------------------------------------ mutations

  /** M1 — censor: soft-delete by id, gated by key (`rclip_server.py:
    * 423-428`). Snapshot rewrite + cache refresh. */
  def censor(id: Long, key: String): Boolean =
    if (!censorKey.contains(key)) false
    else {
      val base = store.read(spark)
      val withDel =
        if (base.columns.contains("deleted")) base
        else base.withColumn("deleted", lit(null).cast("boolean"))
      store.write(withDel.withColumn("deleted",
        when(col(idCol) === id, lit(true)).otherwise(col("deleted"))))
      reload()
      true
    }

  /** M2/A6 — dedup-by-embedding: among rows sharing an identical vector,
    * keep the smallest id, soft-delete the rest. The reference's intended
    * (dead-code) semantics (`rclip_server.py:237-245`) as a window:
    * one shuffle on the vector, no driver data. */
  def dedupByEmbedding(): Long = {
    val base = store.read(spark)
    val withDel =
      if (base.columns.contains("deleted")) base
      else base.withColumn("deleted", lit(null).cast("boolean"))
    val w = Window.partitionBy(col(vecCol)).orderBy(col(idCol).asc)
    val marked = withDel
      .withColumn("rn", row_number().over(w))
      .withColumn("deleted",
        when(col("rn") > 1, lit(true)).otherwise(col("deleted")))
      .drop("rn")
    val removed = marked.filter(col("deleted") === true).count()
    store.write(marked)
    reload()
    removed
  }

  /** S7 — upsert: incoming rows replace same-key rows, others survive.
    * The reference's `ON CONFLICT(filepath) DO UPDATE`
    * (`index_wikimedia.py:86-103`) as a left-anti + union snapshot. */
  def upsert(incoming: DataFrame, key: String): Unit = {
    val base = store.read(spark)
    val merged = incoming.unionByName(
      base.join(incoming, Seq(key), "left_anti"), allowMissingColumns = true)
    store.write(merged)
    reload()
  }
}

object RClipEngine {

  /** Spark's string ordering is a binary compare over UTF-8 BYTES;
    * Scala's `String` ordering compares UTF-16 code units. The two
    * diverge for supplementary-plane characters (a surrogate pair's
    * first unit 0xD800-0xDBFF sorts below 0xE000+ in UTF-16 but its
    * UTF-8 encoding 0xF0… sorts above), so the driver serving twins
    * must break score ties with THIS comparator to stay bit-identical
    * to the DataFrame paths on a non-ASCII vocabulary (ADVICE r07). */
  private[engine] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** (score DESC, text ASC-in-UTF-8-bytes) — the exact total order of
    * the distributed `orderBy(col(score).desc, col(text).asc)`. */
  private[engine] def byScoreDescUtf8Asc[A]: Ordering[(String, Double)] =
    new Ordering[(String, Double)] {
      def compare(p: (String, Double), q: (String, Double)): Int = {
        val c = java.lang.Double.compare(q._2, p._2)
        if (c != 0) c else utf8Compare(p._1, q._1)
      }
    }

  /** Default driver word-map bound: 2²⁰ words ≈ 300 MB of 64-dim fp32
    * entries as JVM map state — comfortably vocabulary-sized (the
    * reference's word list is ~10⁴–10⁵), loudly past it a words table
    * is corpus-shaped data and gets per-query lookups instead. */
  val WordMapMax: Long = 1L << 20

  /** Default driver fast-path bound: 2²⁰ rows ≈ 256 MB of 64-dim fp32
    * matrix (dim-dependent — 2 GB at the reference's 512 dims; size the
    * cap to the driver heap). Below it interactive `search()` serves
    * from RAM at sub-millisecond latency, the reference's own RAM-matrix
    * regime (`rclip_server.py:228`); above it the corpus is
    * cluster-shaped data and the distributed scored scan takes over. */
  val FastPathMaxRows: Long = 1L << 20

  /** Driver-resident scoring matrix for the serving fast path. */
  final case class FastIndex(ids: Array[Long], vecs: Array[Array[Float]])

  sealed trait FastState
  case object FastUnbuilt extends FastState
  case object FastDisabled extends FastState
  final case class FastBuilt(idx: FastIndex) extends FastState
  /** In-flight build claim; the token is unique per build so a builder's
    * installing CAS can only replace its OWN claim — a reload() that
    * reset the state (or a newer build's claim) makes it fail, which is
    * what keeps a stale index from ever installing. */
  final case class FastBuilding(token: Long) extends FastState

  /** Opt-in above-cap ANN serving parameters: `cells`/`nprobe` set the
    * coarse pruning ratio (nprobe/cells of the corpus ADC-scanned per
    * search), `m`/`k` the PQ code geometry, `coarseK` the exact-rerank
    * candidate budget (recall rises with all of nprobe and coarseK; a
    * returned id's SCORE is always exact regardless). `artifactPath`
    * persists the index and serves from the loaded cell-partitioned
    * layout — the cluster deployment shape. Defaults size for a
    * corpus just past the RAM cap; retune cells ≈ √N per deployment. */
  final case class AnnServing(
      cells: Int = 64,
      nprobe: Int = 8,
      m: Int = 8,
      k: Int = 16,
      coarseK: Int = 128,
      ivfIters: Int = 5,
      pqIters: Int = 3,
      artifactPath: Option[String] = None,
      driverCodesMaxRows: Long = RClipEngine.DriverCodesMaxRows,
      buildOnFirstSearch: Boolean = false,
      healthRecallFloorPermille: Long = 800L,
      healthCellSkewMax: Double = 8.0) {
    require(cells > 0, s"cells must be positive, got $cells")
    require(healthRecallFloorPermille >= 0 && healthRecallFloorPermille <= 1000,
      s"healthRecallFloorPermille must be in [0, 1000], got $healthRecallFloorPermille")
    require(healthCellSkewMax > 0,
      s"healthCellSkewMax must be positive, got $healthCellSkewMax")
    require(nprobe > 0 && nprobe <= cells,
      s"nprobe must be in [1, cells=$cells], got $nprobe")
    require(m > 0, s"m (PQ subvectors) must be positive, got $m")
    require(k > 1 && k <= 256,
      s"k (codebook size) must be in [2, 256], got $k")
    require(coarseK > 0, s"coarseK must be positive, got $coarseK")
    require(ivfIters >= 0 && pqIters >= 0,
      s"iteration counts must be non-negative, got ivf=$ivfIters pq=$pqIters")
    require(driverCodesMaxRows >= 0,
      s"driverCodesMaxRows must be non-negative, got $driverCodesMaxRows")
  }

  /** Default bound for the RAM-COARSE serving regime: up to 2²⁴ rows
    * the engine also holds the PACKED code table driver-resident —
    * 20 B/row (8 B code + 8 B id + 4 B cell) ≈ 335 MB at the cap,
    * where the fp32 matrix the fast path needs would be 16 GB. The
    * coarse ADC cut then costs zero Spark dispatches and only the
    * exact rerank is a job — per-request latency halves, and the
    * candidate cut is BIT-IDENTICAL to the distributed ADC scan
    * ([[graft.ann.PqIndex.adcPacked]] is the kernel's driver twin). */
  val DriverCodesMaxRows: Long = 1L << 24

  /** Driver-resident packed-code table (parallel arrays, index-aligned)
    * for the RAM-coarse serving regime. */
  final case class CodeIndex(ids: Array[Long], cells: Array[Int],
      codes: Array[Long])

  /** The RAM coarse cut: scan the probed cells' codes, keep the top
    * `coarseK` by (adc DESC, id ASC). Primitive arrays + a k-bounded
    * binary MIN-heap (root = currently-worst kept row), so a request at
    * the 2²⁴-row cap allocates O(coarseK) — no boxed tuples, no full
    * sort of the scanned rows. Ordering is EXACTLY `searchAdc`'s
    * (adc DESC, id ASC) including ties, so the cut stays bit-identical
    * to the distributed coarse stage (EngineSpec pins it). Returns ids
    * sorted ascending (set semantics feed an isin; order irrelevant,
    * but determinism keeps plans stable). */
  private[engine] def ramCoarseCut(ci: CodeIndex, lut: Array[Double],
      m: Int, k: Int, probe: Seq[Int], coarseK: Int): Seq[Long] = {
    require(coarseK > 0, s"coarseK must be positive, got $coarseK")
    val maxCell = ci.cells.foldLeft(0)(math.max)
    val probedMask = new Array[Boolean](maxCell + 1)
    probe.foreach(c => if (c >= 0 && c <= maxCell) probedMask(c) = true)
    val hS = new Array[Double](coarseK) // min-heap on (score ASC, id DESC)
    val hI = new Array[Long](coarseK)
    var size = 0
    // `a` loses to `b` (a is WORSE-kept) iff a.s < b.s, or tie and a.id > b.id
    def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
      sa < sb || (sa == sb && ia > ib)
    def siftDown(at: Int): Unit = {
      var i = at
      var continue = true
      while (continue) {
        val l = 2 * i + 1; val r = l + 1
        var worst = i
        if (l < size && worse(hS(l), hI(l), hS(worst), hI(worst))) worst = l
        if (r < size && worse(hS(r), hI(r), hS(worst), hI(worst))) worst = r
        if (worst == i) continue = false
        else {
          val ts = hS(i); val ti = hI(i)
          hS(i) = hS(worst); hI(i) = hI(worst)
          hS(worst) = ts; hI(worst) = ti
          i = worst
        }
      }
    }
    var row = 0
    while (row < ci.ids.length) {
      val cell = ci.cells(row)
      if (cell <= maxCell && probedMask(cell)) {
        val s = graft.ann.PqIndex.adcPacked(ci.codes(row), lut, m, k)
        val id = ci.ids(row)
        if (size < coarseK) {
          // insert + sift up
          var i = size
          hS(i) = s; hI(i) = id; size += 1
          while (i > 0 && worse(hS(i), hI(i), hS((i - 1) / 2), hI((i - 1) / 2))) {
            val parent = (i - 1) / 2
            val ts = hS(i); val ti = hI(i)
            hS(i) = hS(parent); hI(i) = hI(parent)
            hS(parent) = ts; hI(parent) = ti
            i = parent
          }
        } else if (worse(hS(0), hI(0), s, id)) {
          hS(0) = s; hI(0) = id
          siftDown(0)
        }
      }
      row += 1
    }
    hI.take(size).sorted.toSeq
  }

  sealed trait AnnState
  case object AnnUnbuilt extends AnnState
  case object AnnDisabled extends AnnState
  final case class AnnBuilt(ix: graft.ann.IvfPqIndex,
      codeIdx: Option[CodeIndex]) extends AnnState
  /** See [[FastBuilding]]. */
  final case class AnnBuilding(token: Long) extends AnnState

  /** One drift-monitoring row for the live serving index (VERDICT r08
    * next-#4): recall of the serving ANN path vs exact brute over the
    * current live rows (mean/worst, permille), the serving code table's
    * cell skew (max cell / mean cell, n13's audit) and empty-cell count,
    * and the alarm bit a deployment pages on. */
  final case class AnnHealth(
      recallPermille: Long,
      worstPermille: Long,
      cellSkew: Double,
      emptyCells: Long,
      rows: Long,
      alarm: Boolean)
}

/** Monotone colormap: normalized [0,1] → hex color. The reference uses
  * seaborn `icefire` (`rclip_server.py:257-262`); the contract is "monotone
  * palette over normalized value", here a blue→white→red diverging ramp. */
object Colormap {
  private val stops = Seq(
    0.0 -> (33, 102, 172), 0.5 -> (247, 247, 247), 1.0 -> (178, 24, 43))
  def hex(t: Double): String = {
    val x = t.max(0.0).min(1.0)
    val ((t0, c0), (t1, c1)) =
      if (x <= 0.5) (stops(0), stops(1)) else (stops(1), stops(2))
    val f = if (t1 == t0) 0.0 else (x - t0) / (t1 - t0)
    def lerp(a: Int, b: Int) = math.round(a + (b - a) * f).toInt
    f"#${lerp(c0._1, c1._1)}%02x${lerp(c0._2, c1._2)}%02x${lerp(c0._3, c1._3)}%02x"
  }
}
