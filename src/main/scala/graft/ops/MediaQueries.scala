package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Oracle-checkable slice of the multimodal layer: the binary-column
  * catalog (kind/mime dispatch, blob sizes) and the shard-packing
  * manifest — the codec stages themselves are stubbed and covered by
  * MultimodalSpec. */
object MediaQueries {

  type Q = (SparkSession, String) => DataFrame

  /** m01: media catalog over binary content — BINARY column length and
    * typed-metadata derivation agree with the DuckDB BLOB semantics. */
  val m01_media_catalog: Q = (s, d) => {
    Tables.documents(s, d)
      .selectExpr(
        "doc_id AS media_id",
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind",
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/jpeg' WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime",
        "CAST(length(encode(text, 'UTF-8')) AS BIGINT) AS n_bytes")
      .orderBy(col("media_id"))
  }

  /** m02: SHARD-PACKING manifest — the WebDataset-style layout step a
    * multimodal training pipeline runs before the dataloader ever sees a
    * blob: blobs of each kind are packed in id order into fixed-size
    * shard archives, and the manifest records (shard_id, offset_bytes)
    * for every blob — the random-access index sequential tar-style
    * shards need. A blob is assigned to the shard its FIRST byte lands
    * in (prefix-sum div [[SHARD_BYTES]]) — the same deterministic
    * arithmetic on both engines, all BIGINT.
    *
    * Scale shape: one kind-partitioned running-sum window (map-side
    * nothing to combine, but the shuffle carries only (kind, id, bytes)
    * — never the blob body; the actual bytes are written by a later
    * stage that joins this thin manifest back by id). Like p04, a
    * single giant kind would hot-spot its window partition — sub-shard
    * the stream key (kind, id-range) at 100 TB; the manifest arithmetic
    * is associative over the ranges given per-range byte offsets. */
  val SHARD_BYTES = 4096L
  val m02_shard_pack: Q = (s, d) => {
    val w = Window.partitionBy(col("kind")).orderBy(col("media_id"))
    m01_media_catalog(s, d)
      .withColumn("cum", sum(col("n_bytes")).over(w))
      .selectExpr("kind", "media_id", "n_bytes",
        s"CAST((cum - n_bytes) div $SHARD_BYTES AS BIGINT) AS shard_id",
        s"CAST(cum - n_bytes - ((cum - n_bytes) div $SHARD_BYTES) * $SHARD_BYTES AS BIGINT) AS offset_bytes")
      .orderBy(col("kind"), col("media_id"))
  }

  /** m03: SHARD INTEGRITY MANIFEST — the per-shard summary a dataloader
    * validates before streaming a tar-style archive: member count, total
    * payload bytes, and an ORDER-SENSITIVE checksum over the members in
    * offset order (rank-weighted, so a permuted or substituted member
    * list is detected, which a plain sum would miss). The checksum is
    * modular BIGINT arithmetic bounded by construction — member hash
    * `(id % M)·A + (bytes % M)·B (mod M)` with A, B < 2²⁰ keeps every
    * product < 2⁵¹, and the rank weight stays < M·members — so both
    * engines compute it exactly (Verify gotcha: DuckDB raises on BIGINT
    * overflow, Spark wraps; nothing here can reach 2⁶³).
    *
    * Scale shape: m02's one thin kind-keyed window shuffle, then a
    * (kind, shard) partial aggregate — blob bodies never move; at
    * deployment the writer that streams actual bytes re-computes the
    * same checksum incrementally and compares against this manifest. */
  val CK_M = 2147483647L // 2^31 − 1
  val m03_shard_checksum: Q = (s, d) => {
    val w = Window.partitionBy(col("kind"), col("shard_id"))
      .orderBy(col("offset_bytes"), col("media_id"))
    m02_shard_pack(s, d)
      .withColumn("rk", row_number().over(w))
      .selectExpr("kind", "shard_id", "n_bytes",
        s"pmod(rk * pmod((media_id % $CK_M) * 1000003 + (n_bytes % $CK_M) * 999983, $CK_M), $CK_M) AS term")
      .groupBy(col("kind"), col("shard_id"))
      .agg(count(lit(1)).as("n_blobs"), sum(col("n_bytes")).as("total_bytes"),
        sum(col("term")).as("tsum"))
      .selectExpr("kind", "shard_id", "n_blobs", "total_bytes",
        s"CAST(tsum % $CK_M AS BIGINT) AS checksum")
      .orderBy(col("kind"), col("shard_id"))
  }

  /** m05 grid geometry: 6 rows × 11 columns of "pixels" (code points of
    * the rpad'd blob head) → 10 horizontal-gradient bits per row =
    * 60 fingerprint bits — 60, not 64, for d03's reason: every shift
    * and term sum stays inside a signed BIGINT on both engines. */
  private val PH_ROWS = 6
  private val PH_COLS = 11
  private[ops] val PH_CAP = 50

  /** The dHash bit terms over a padded-text column `pt`, per dialect
    * (`cp(pos)` renders "code point at 1-based pos"). Bit r·10+c is set
    * iff pixel (r, c+1) > pixel (r, c) — the classic difference hash. */
  private def phashExpr(cp: Int => String): String =
    (0 until PH_ROWS).flatMap { r =>
      (0 until PH_COLS - 1).map { c =>
        val pos = r * PH_COLS + c + 1
        s"(CASE WHEN ${cp(pos + 1)} > ${cp(pos)} " +
          s"THEN ${1L << (r * (PH_COLS - 1) + c)} ELSE 0 END)"
      }
    }.mkString(" + ")

  /** m05: PERCEPTUAL NEAR-DUP (dHash) over the media blobs — the image
    * dedup a multimodal corpus runs BEFORE training: decode to a tiny
    * grayscale grid, fingerprint the horizontal gradients (difference
    * hash — robust to brightness/scale, unlike byte checksums), and
    * find pairs within hamming ≤ 3 via d03's 4×15-bit pigeonhole block
    * tables. The decode here is the `MediaDecoder` stub's deterministic
    * stand-in (m04's discipline): the [[PH_ROWS]]×[[PH_COLS]] grid is
    * the code points of the blob's rpad'd 66-char head; a production
    * decoder swaps in real pixels and every downstream shape is
    * unchanged. Near-dup copies are planted (docs with id%4=1 get a
    * one-char-edit copy ⇒ hamming ≤ 2) so the operator has real work
    * at every sf. The fingerprint is one compiled CASE-term pass — no
    * UDF, no HOF (d03's 39 s lesson). Hot buckets (padded short blobs,
    * boilerplate heads) are capped at [[PH_CAP]] by anti-join — d02's
    * quadratic-bucket guard, mirrored in the oracle.
    *
    * Scale shape: fingerprints are a narrow projection of the catalog
    * (blob bodies never move — the grid head is all a real decoder
    * would emit per blob anyway); the self-join runs inside 2¹⁵-bucket
    * block tables with the cap bounding any bucket's pair count. */
  val m05_perceptual_dedup: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val shift = DedupQueries.copyShift(s, d)
    val grid = PH_ROWS * PH_COLS
    val corpus = docs.select(col("doc_id").as("media_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 4 === 1)
        .select((col("doc_id") + lit(shift)).as("media_id"),
          expr(s"concat(substring(rpad(text, $grid, '_'), 1, 29), '~', " +
            s"substring(rpad(text, $grid, '_'), 31))").as("text")))
    val fps = corpus
      .selectExpr("media_id", s"rpad(text, $grid, '_') AS pt")
      .selectExpr("media_id",
        s"CAST(${phashExpr(p => s"ascii(substring(pt, $p, 1))")} " +
          "AS BIGINT) AS fp")
      .cache()
    fps.count() // materialize before the self-join (d03's build race)
    val blocked = fps.withColumn("tb", explode(array((0 until 4).map { t =>
        struct(lit(t).as("tbl"),
          expr(s"shiftright(fp, ${15 * t}) & 32767").as("bucket"))
      }: _*)))
      .select(col("media_id"), col("fp"), col("tb.tbl"), col("tb.bucket"))
    val hot = blocked.groupBy(col("tbl"), col("bucket"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > PH_CAP)
      .select(col("tbl"), col("bucket"))
    val capped = blocked.join(hot, Seq("tbl", "bucket"), "left_anti")
      .cache()
    capped.count()
    capped.as("x").join(capped.as("y"),
        col("x.tbl") === col("y.tbl") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.media_id") < col("y.media_id"))
      .selectExpr("x.media_id AS media_a", "y.media_id AS media_b",
        "CAST(bit_count(x.fp ^ y.fp) AS INT) AS hamming")
      .distinct() // a pair can share several blocks
      .filter(col("hamming") <= 3)
      .orderBy(col("media_a"), col("media_b"))
  }

  /** m06 cut rule: a token position opens a new chunk when its W-token
    * rolling hash ≡ 0 (mod CDC_MOD) — expected chunk ≈ CDC_MOD tokens. */
  val CDC_MOD = 16L

  /** m06: CONTENT-DEFINED CHUNKING dedup report — the rsync/LBFS/backup
    * -store primitive a 100 TB blob store rests on: split every blob at
    * positions where a ROLLING hash of the local content hits a
    * deterministic pattern (d12's W-token shingle hash, cut when
    * h % [[CDC_MOD]] = 0), fingerprint each chunk, and report per media
    * kind how many bytes chunk-level dedup saves. Because boundaries
    * are content-defined, an EDIT ONLY RESHAPES THE CHUNKS IT TOUCHES —
    * the corpus here is d02's originals ∪ tail-mutated copies, where
    * exact blob dedup (d01) saves NOTHING yet every copy's chunks
    * before the tail dedup against its original (the spec pins ≈ half
    * the corpus reclaimed); fixed-size blocks would lose that on any
    * insertion shifting offsets. Short blobs (< W tokens, no rolling
    * window) are excluded on both engines.
    *
    * Scale shape: chunking is one narrow compiled pass per blob
    * (spanShingleUdf reused verbatim) + a bounded in-row explode; the
    * only shuffle carries (kind, fp, n_chars) — chunk fingerprints,
    * never chunk bodies; the report is kind-sized. The production knobs
    * (min/max chunk bounds making cut eligibility sequential per blob)
    * drop into the same compiled pass without changing any downstream
    * shape. */
  val m06_cdc_chunks: Q = (s, d) => {
    val chunks = DedupQueries.d02Corpus(s, d)
      .select(col("doc_id"), col("text"),
        DedupQueries.spanShingleUdf(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .selectExpr("doc_id", "split(text, ' ') AS ws",
        s"concat(array(1), filter(sequence(1, size(sh)), " +
          s"i -> i >= 2 AND element_at(sh, i) % $CDC_MOD = 0)) AS starts")
      .selectExpr("doc_id", "ws",
        "explode(transform(starts, (st, ci) -> struct(st AS st, " +
          "CASE WHEN ci = size(starts) - 1 THEN size(ws) " +
          "ELSE element_at(starts, ci + 2) - 1 END AS en))) AS c")
      .selectExpr(
        // kind keys on the ORIGINAL id (a copy of an image IS an image)
        // so copy chunks dedup against their original's group
        "CASE CAST((doc_id % " +
          s"${DedupQueries.copyShift(s, d)}L) % 3 AS INT) " +
          "WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind",
        "concat_ws(' ', slice(ws, c.st, c.en - c.st + 1)) AS body")
      .selectExpr("kind", "md5(body) AS fp",
        "CAST(length(body) AS BIGINT) AS n_chars")
    chunks.groupBy(col("kind"), col("fp"))
      .agg(count(lit(1)).as("c"), min(col("n_chars")).as("nc"))
      .groupBy(col("kind"))
      .agg(sum(col("c")).as("n_chunks"), count(lit(1)).as("uniq_chunks"),
        sum(col("c") * col("nc")).as("total_chars"),
        sum(col("nc")).as("uniq_chars"))
      .selectExpr("kind", "n_chunks", "uniq_chunks", "total_chars",
        "uniq_chars",
        "CAST((total_chars - uniq_chars) * 1000 div total_chars AS BIGINT)" +
          " AS savings_permille")
      .orderBy(col("kind"))
  }

  def queries: Map[String, Q] = Map(
    "m06_cdc_chunks" -> m06_cdc_chunks,
    "m05_perceptual_dedup" -> m05_perceptual_dedup,
    "m03_shard_checksum" -> m03_shard_checksum,
    "m01_media_catalog" -> m01_media_catalog,
    "m02_shard_pack" -> m02_shard_pack,
    "m04_frame_sample" -> m04_frame_sample)

  /** Max sampled frames per video — the dataloader's per-clip budget. */
  val FRAME_SAMPLES = 8L

  /** m04: FRAME-SAMPLE PLAN — the deterministic (media_id, frame_no,
    * ts_micro) schedule a video training pipeline materializes BEFORE
    * any decoder runs: uniform-stride sampling capped at
    * [[FRAME_SAMPLES]] frames per clip, all BIGINT arithmetic
    * (stride = ceil(frames/budget), timestamps as frame·10⁶ div fps).
    * The decode of the planned frames is the `MediaDecoder` port's job
    * (MultimodalOps — stubbed offline, like the reference's PIL hop);
    * THIS operator is the Spark-side plumbing that decides which bytes
    * to touch, which is what keeps a 100 TB video corpus affordable:
    * the plan is metadata-only (catalog rows, never blobs), ≤ 8 rows
    * per clip out of a narrow scan, zero shuffle before the
    * presentation sort. fps/frame-count are derived from catalog
    * metadata here (synthetic stand-ins off doc_id/n_bytes, m01's kind
    * dispatch discipline); a production catalog carries them as real
    * columns and the plan arithmetic is unchanged. */
  val m04_frame_sample: Q = (s, d) => {
    m01_media_catalog(s, d)
      .filter(col("kind") === "video")
      .selectExpr("media_id",
        "CAST(24 + (media_id % 2) * 6 AS BIGINT) AS fps",
        "CAST(n_bytes % 1000 + 24 + (media_id % 2) * 6 AS BIGINT) AS n_frames")
      .selectExpr("media_id", "fps", "n_frames",
        s"CAST((n_frames + ${FRAME_SAMPLES - 1}) div $FRAME_SAMPLES AS BIGINT) AS stride")
      .selectExpr("media_id", "fps", "stride",
        "explode(sequence(CAST(0 AS BIGINT), (n_frames - 1) div stride)) AS sample_idx")
      .selectExpr("media_id", "sample_idx",
        "CAST(sample_idx * stride AS BIGINT) AS frame_no",
        "CAST(sample_idx * stride * 1000000 div fps AS BIGINT) AS ts_micro")
      .orderBy(col("media_id"), col("sample_idx"))
  }

  private val catalogSelect: String =
    """SELECT doc_id AS media_id,
      |       CASE (doc_id % 3)::INT WHEN 0 THEN 'image'
      |         WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |       CASE (doc_id % 3)::INT WHEN 0 THEN 'image/jpeg'
      |         WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
      |       octet_length(encode(text))::BIGINT AS n_bytes
      |FROM documents""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // m06: d12's token-polynomial and W-window fold verbatim; identical
    // cut rule, chunk ranges, md5 fingerprints and savings arithmetic
    "m06_cdc_chunks" -> {
      import DedupQueries.{SPAN_W, tokPolyDuck, spanFold}
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents),
         |         text || ' mutated tail' FROM documents),
         |th AS (
         |  SELECT doc_id, text,
         |         list_transform(string_split(text, ' '),
         |           t -> ($tokPolyDuck)) AS th
         |  FROM corpus),
         |sh AS (
         |  SELECT doc_id, text,
         |         list_transform(range(1, len(th) - ${SPAN_W - 2}),
         |           i -> ${spanFold(j => s"th[i + $j]")}) AS sh
         |  FROM th WHERE len(th) >= $SPAN_W),
         |st AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws,
         |         list_concat([1], list_filter(range(2, len(sh) + 1),
         |           i -> sh[i] % $CDC_MOD = 0)) AS starts
         |  FROM sh),
         |ch AS (
         |  SELECT doc_id, ws, starts[i] AS st,
         |         CASE WHEN i = len(starts) THEN len(ws)
         |              ELSE starts[i + 1] - 1 END AS en
         |  FROM st, unnest(range(1, len(starts) + 1)) AS u(i)),
         |cf AS (
         |  SELECT CASE ((doc_id %
         |               (SELECT max(doc_id) + 1 FROM documents)) % 3)::INT
         |              WHEN 0 THEN 'image'
         |              WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |         md5(array_to_string(ws[st:en], ' ')) AS fp,
         |         length(array_to_string(ws[st:en], ' '))::BIGINT
         |           AS n_chars
         |  FROM ch),
         |pf AS (
         |  SELECT kind, fp, count(*)::BIGINT AS c, min(n_chars) AS nc
         |  FROM cf GROUP BY kind, fp)
         |SELECT kind, sum(c)::BIGINT AS n_chunks,
         |       count(*)::BIGINT AS uniq_chunks,
         |       sum(c * nc)::BIGINT AS total_chars,
         |       sum(nc)::BIGINT AS uniq_chars,
         |       ((sum(c * nc) - sum(nc)) * 1000 // sum(c * nc))::BIGINT
         |         AS savings_permille
         |FROM pf GROUP BY kind ORDER BY kind""".stripMargin
    },
    // m05: same grid/dHash/block/cap arithmetic (unicode == ascii on
    // the rpad'd non-empty head)
    "m05_perceptual_dedup" -> {
      val grid = PH_ROWS * PH_COLS
      s"""WITH corpus AS (
         |  SELECT doc_id AS media_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents),
         |         substr(rpad(text, $grid, '_'), 1, 29) || '~' ||
         |           substr(rpad(text, $grid, '_'), 31)
         |  FROM documents WHERE doc_id % 4 = 1),
         |fps AS MATERIALIZED (
         |  SELECT media_id,
         |         (${phashExpr(p => s"unicode(substr(pt, $p, 1))")}) AS fp
         |  FROM (SELECT media_id, rpad(text, $grid, '_') AS pt
         |        FROM corpus)),
         |blocked AS (
         |  SELECT media_id, fp, t.s AS tbl,
         |         (fp >> (15 * t.s)) & 32767 AS bucket
         |  FROM fps, (SELECT unnest([0, 1, 2, 3]) AS s) t),
         |capped AS (
         |  SELECT media_id, fp, tbl, bucket FROM blocked
         |  QUALIFY count(*) OVER (PARTITION BY tbl, bucket) <= $PH_CAP)
         |SELECT DISTINCT x.media_id AS media_a, y.media_id AS media_b,
         |       bit_count(xor(x.fp, y.fp))::INT AS hamming
         |FROM capped x JOIN capped y
         |  ON x.tbl = y.tbl AND x.bucket = y.bucket
         |  AND x.media_id < y.media_id
         |WHERE bit_count(xor(x.fp, y.fp)) <= 3
         |ORDER BY media_a, media_b""".stripMargin
    },
    // m03: m02's manifest CTE + the same rank-weighted modular checksum
    // (all operands positive, so % == pmod)
    "m03_shard_checksum" ->
      s"""WITH c AS (
         |  SELECT kind, media_id, n_bytes,
         |         sum(n_bytes) OVER (PARTITION BY kind ORDER BY media_id) AS cum
         |  FROM ($catalogSelect)),
         |manifest AS (
         |  SELECT kind, media_id, n_bytes,
         |         ((cum - n_bytes) // $SHARD_BYTES)::BIGINT AS shard_id,
         |         (cum - n_bytes
         |          - ((cum - n_bytes) // $SHARD_BYTES) * $SHARD_BYTES)::BIGINT AS offset_bytes
         |  FROM c),
         |ranked AS (
         |  SELECT kind, shard_id, n_bytes,
         |         row_number() OVER (PARTITION BY kind, shard_id
         |                            ORDER BY offset_bytes, media_id) AS rk,
         |         ((media_id % $CK_M) * 1000003
         |          + (n_bytes % $CK_M) * 999983) % $CK_M AS h
         |  FROM manifest)
         |SELECT kind, shard_id, count(*)::BIGINT AS n_blobs,
         |       sum(n_bytes)::BIGINT AS total_bytes,
         |       (sum((rk * h) % $CK_M) % $CK_M)::BIGINT AS checksum
         |FROM ranked GROUP BY kind, shard_id
         |ORDER BY kind, shard_id""".stripMargin,
    "m01_media_catalog" ->
      s"""$catalogSelect ORDER BY media_id""".stripMargin,
    // m04: same synthetic fps/frame-count derivation, same ceil-stride
    // and integer-micro timestamps; generate_series inclusive both ends
    // like Spark's sequence
    "m04_frame_sample" ->
      s"""WITH cat AS ($catalogSelect),
         |v AS (
         |  SELECT media_id,
         |         (24 + (media_id % 2) * 6)::BIGINT AS fps,
         |         (n_bytes % 1000 + 24 + (media_id % 2) * 6)::BIGINT AS n_frames
         |  FROM cat WHERE kind = 'video'),
         |sg AS (
         |  SELECT media_id, fps, n_frames,
         |         ((n_frames + ${FRAME_SAMPLES - 1}) // $FRAME_SAMPLES)::BIGINT AS stride
         |  FROM v)
         |SELECT media_id, sample_idx,
         |       (sample_idx * stride)::BIGINT AS frame_no,
         |       (sample_idx * stride * 1000000 // fps)::BIGINT AS ts_micro
         |FROM (SELECT media_id, fps, stride,
         |             unnest(generate_series(0, (n_frames - 1) // stride)) AS sample_idx
         |      FROM sg)
         |ORDER BY media_id, sample_idx""".stripMargin,
    // m02: DuckDB's window sum widens to HUGEINT — the // arithmetic is
    // exact there too; both outputs cast back to BIGINT
    "m02_shard_pack" ->
      s"""WITH c AS (
         |  SELECT kind, media_id, n_bytes,
         |         sum(n_bytes) OVER (PARTITION BY kind ORDER BY media_id) AS cum
         |  FROM ($catalogSelect))
         |SELECT kind, media_id, n_bytes,
         |       ((cum - n_bytes) // $SHARD_BYTES)::BIGINT AS shard_id,
         |       (cum - n_bytes
         |        - ((cum - n_bytes) // $SHARD_BYTES) * $SHARD_BYTES)::BIGINT AS offset_bytes
         |FROM c ORDER BY kind, media_id""".stripMargin)
}
