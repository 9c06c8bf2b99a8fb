package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Oracle-checkable slices of the ingest pipeline (SURVEY §2.9 I3/I4 —
  * the URL-shaped stages; the IO stages are covered by IngestSpec). URLs
  * are derived deterministically from `documents` so the operators have
  * inputs at every sf. */
object IngestQueries {

  type Q = (SparkSession, String) => DataFrame

  /** i01: extension whitelist + thumbnail-URL derivation
    * (`index_wikimedia.py:118-134`): build a synthetic image URL per doc,
    * keep whitelisted raster extensions, rewrite to the 600px variant. */
  val i01_url_pipeline: Q = (s, d) => {
    Tables.documents(s, d)
      .selectExpr("doc_id", "source",
        """concat(source, '/img_', doc_id,
          |  CASE CAST(doc_id % 4 AS INT)
          |    WHEN 0 THEN '.jpg' WHEN 1 THEN '.PNG'
          |    WHEN 2 THEN '.gif' ELSE '.txt' END) AS url""".stripMargin)
      .withColumn("ext",
        lower(regexp_extract(col("url"), "\\.([A-Za-z0-9]+)$", 1)))
      .filter(col("ext").isin("jpg", "jpeg", "png", "gif"))
      .withColumn("thumb_url",
        regexp_replace(col("url"), "/([^/]+)$", "/600px-$1"))
      .select(col("doc_id"), col("url"), col("ext"), col("thumb_url"))
      .orderBy(col("doc_id"))
  }

  /** i02: URL CANONICALIZATION + dedup — the CommonCrawl-style ingest
    * stage that collapses scheme/www/query-string/fragment/trailing-slash
    * variants of one page before any content is fetched (fetch-once is
    * the cheapest dedup there is). URLs are derived deterministically
    * from doc_id so every 5-id block plants 4 colliding variants plus
    * one unique URL. Canonicalization = lowercase → strip fragment →
    * strip query → strip scheme → strip leading www. → strip trailing
    * slash; lowercasing comes FIRST so the case-sensitive scheme/www
    * anchors match 'HTTP://…' and 'WWW.…' variants too (review pass:
    * stripping before lowering silently left uppercase-scheme URLs
    * uncollapsed). Every regex is RE2-safe (t09's discipline) and shared
    * verbatim with the oracle. Simplifications vs production are
    * documented in place: the whole query string is dropped (production
    * keeps a param allowlist) and the full URL is lowercased (production
    * lowercases only the authority; the synthetic paths are lowercase).
    *
    * Scale shape: a narrow per-row derive, then ONE canon-keyed window
    * shuffle carrying (doc_id, canon, url) — the keep decision is
    * rn=1 by doc_id inside each canonical group, d08's
    * globally-first-occurrence semantics applied to URLs. */
  val i02_url_canonical_dedup: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val urls = Tables.documents(s, d)
      .selectExpr("doc_id",
        """CASE CAST(doc_id % 5 AS INT)
          |  WHEN 0 THEN concat('http://Example.com/page_', doc_id div 5)
          |  WHEN 1 THEN concat('https://example.com/page_', doc_id div 5, '/')
          |  WHEN 2 THEN concat('https://www.example.com/page_', doc_id div 5,
          |                     '?utm_source=x&utm_medium=y')
          |  WHEN 3 THEN concat('http://EXAMPLE.com/page_', doc_id div 5, '#frag')
          |  ELSE concat('https://example.com/other_', doc_id)
          |END AS url""".stripMargin)
    urls
      .withColumn("canon",
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          lower(col("url")), "#.*$", ""), "\\?.*$", ""), "^https?://", ""),
          "^www\\.", ""), "/$", ""))
      .withColumn("keep",
        (row_number().over(
          Window.partitionBy(col("canon")).orderBy(col("doc_id"))) === 1)
          .cast("int"))
      .select(col("doc_id"), col("url"), col("canon"), col("keep"))
      .orderBy(col("doc_id"))
  }

  /** i03: SNAPSHOT DIFF (CDC) — classify every doc_id across two corpus
    * snapshots as added / deleted / changed / unchanged, the change-data
    * step an incremental ingest runs between crawls to avoid reprocessing
    * the unchanged bulk (the reference's ingest does the `added` third of
    * this as its anti-join, `index_wikimedia.py:101-112`; a production
    * recrawl needs all four classes). The two snapshots are deterministic
    * views of `documents`: the OLD snapshot lacks ids ≡ 5 (mod 13)
    * ("added later"), the NEW lacks ids ≡ 3 (mod 11) ("since deleted")
    * and revises text where id ≡ 0 (mod 7); both sides reduce to
    * (doc_id, md5) BEFORE the join, so the full-outer shuffle carries
    * 16-byte digests, never text — the discipline that makes a 100 TB
    * diff an id-keyed thin join. `changed` compares digests, exactly as
    * a production diff must (text equality would force text onto the
    * shuffle). */
  val i03_snapshot_diff: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val old = docs.filter(expr("doc_id % 13 <> 5"))
      .selectExpr("doc_id", "md5(text) AS old_digest")
    val neu = docs.filter(expr("doc_id % 11 <> 3"))
      .selectExpr("doc_id",
        "md5(CASE WHEN doc_id % 7 = 0 THEN concat(text, ' rev2') ELSE text END) AS new_digest")
    // SHUFFLE_HASH: full-outer over two corpus-sized digest sides must
    // shuffle, but the rows are thin (id + 16-byte digest) — hashing
    // beats sort-merge (skips both sorts), and keeps the global
    // no-SMJ plan audit meaningful.
    old.join(neu.hint("SHUFFLE_HASH"), Seq("doc_id"), "full_outer")
      .selectExpr("doc_id",
        """CASE WHEN old_digest IS NULL THEN 'added'
          |     WHEN new_digest IS NULL THEN 'deleted'
          |     WHEN old_digest <> new_digest THEN 'changed'
          |     ELSE 'unchanged' END AS status""".stripMargin)
      .orderBy(col("doc_id"))
  }

  /** Per-host byte budget per politeness tick (i04). */
  val HOST_TICK_BYTES = 8192L

  /** i04: CRAWL POLITENESS SCHEDULE — assign every fetch a per-host
    * sequence number and a byte-budgeted politeness tick: a host serves
    * at most [[HOST_TICK_BYTES]] bytes per tick, and a fetch runs in
    * the tick its FIRST byte falls in (m02's prefix-sum shard
    * arithmetic applied to crawl scheduling — the same first-byte rule,
    * a time axis instead of a shard axis). This is the pre-fetch plan a
    * polite crawler materializes so no origin is hammered regardless of
    * how many workers drain the frontier: workers pull (tick, host)
    * groups in order. Hosts stand in as `source` (the catalog
    * discipline); bytes as n_chars.
    *
    * Scale shape: ONE host-keyed window shuffle carrying (host, doc_id,
    * bytes) — the frontier is thin; a pathologically giant host
    * sub-shards the stream key like p04/m02 (prefix sums are
    * associative given per-range offsets). */
  val i04_fetch_schedule: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("host")).orderBy(col("doc_id"))
    Tables.documents(s, d)
      .selectExpr("source AS host", "doc_id",
        "CAST(n_chars AS BIGINT) AS bytes")
      .withColumn("fetch_seq", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("bytes")).over(w))
      .selectExpr("host", "doc_id", "bytes", "fetch_seq",
        s"CAST((cum - bytes) div $HOST_TICK_BYTES AS BIGINT) AS tick")
      .orderBy(col("host"), col("doc_id"))
  }

  /** Embed-batch size for i05 (rows per encoder invocation). */
  val EMBED_BATCH = 64L

  /** i05: INCREMENTAL RE-EMBED PLAN — turn i03's snapshot diff into the
    * work order the embedding/ANN layer executes: added+changed docs
    * need (re-)embedding (batched for the encoder, [[EMBED_BATCH]]
    * rows per batch in doc_id order), deleted docs become index
    * tombstones (`IvfPqIndex.remove`'s input), unchanged docs generate
    * NO work — which is the whole point of CDC: at 100 TB the recrawl
    * delta is a few percent, and this plan is what keeps the encoder
    * (the most expensive stage in the pipeline) off the other 95+%.
    * Fresh embeddings then enter the index via `IvfPqIndex.add`
    * (frozen-codebook append) — the add/remove lifecycle this plan
    * feeds is itself spec-covered in IvfPqSpec.
    *
    * Scale shape: i03's thin digest diff, a narrow action projection,
    * and ONE action-keyed window for batch numbering over the
    * embed-side rows only (the delta, not the corpus). */
  val i05_reembed_plan: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val diff = i03_snapshot_diff(s, d)
      .filter(col("status") =!= "unchanged")
      .selectExpr("doc_id",
        "CASE WHEN status = 'deleted' THEN 'tombstone' ELSE 'embed' END AS action")
    diff
      .withColumn("batch_id", expr(
        s"CASE WHEN action = 'embed' " +
          s"THEN CAST((row_number() OVER (PARTITION BY action ORDER BY doc_id) - 1) " +
          s"div $EMBED_BATCH AS BIGINT) ELSE CAST(-1 AS BIGINT) END"))
      .select(col("doc_id"), col("action"), col("batch_id"))
      .orderBy(col("doc_id"))
  }

  def queries: Map[String, Q] = Map(
    "i05_reembed_plan" -> i05_reembed_plan,
    "i04_fetch_schedule" -> i04_fetch_schedule,
    "i03_snapshot_diff" -> i03_snapshot_diff,
    "i01_url_pipeline" -> i01_url_pipeline,
    "i02_url_canonical_dedup" -> i02_url_canonical_dedup)

  /** i03's snapshot-diff classification as a CTE chain (no leading
    * WITH; ends at `diff(doc_id, status)`) — ONE definition shared by
    * the i03 and i05 oracles. */
  private def duckDiffCtes: String =
    """old AS (
      |  SELECT doc_id, md5(text) AS old_digest FROM documents
      |  WHERE doc_id % 13 <> 5),
      |neu AS (
      |  SELECT doc_id,
      |         md5(CASE WHEN doc_id % 7 = 0 THEN text || ' rev2'
      |                  ELSE text END) AS new_digest
      |  FROM documents WHERE doc_id % 11 <> 3),
      |diff AS (
      |  SELECT coalesce(old.doc_id, neu.doc_id) AS doc_id,
      |         CASE WHEN old_digest IS NULL THEN 'added'
      |              WHEN new_digest IS NULL THEN 'deleted'
      |              WHEN old_digest <> new_digest THEN 'changed'
      |              ELSE 'unchanged' END AS status
      |  FROM old FULL OUTER JOIN neu USING (doc_id))""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // i05: the shared diff CTEs + the same action projection and
    // per-action batch window
    "i05_reembed_plan" ->
      s"""WITH $duckDiffCtes,
         |work AS (
         |  SELECT doc_id,
         |         CASE WHEN status = 'deleted' THEN 'tombstone'
         |              ELSE 'embed' END AS action
         |  FROM diff WHERE status <> 'unchanged')
         |SELECT doc_id, action,
         |       CASE WHEN action = 'embed'
         |         THEN ((row_number() OVER (PARTITION BY action
         |                                   ORDER BY doc_id) - 1)
         |               // $EMBED_BATCH)::BIGINT
         |         ELSE -1 END AS batch_id
         |FROM work ORDER BY doc_id""".stripMargin,
    // i04: same host window, same first-byte tick arithmetic
    "i04_fetch_schedule" ->
      s"""WITH f AS (
         |  SELECT source AS host, doc_id, n_chars::BIGINT AS bytes,
         |         (row_number() OVER w)::BIGINT AS fetch_seq,
         |         sum(n_chars) OVER w AS cum
         |  FROM documents
         |  WINDOW w AS (PARTITION BY source ORDER BY doc_id))
         |SELECT host, doc_id, bytes, fetch_seq,
         |       ((cum - bytes) // $HOST_TICK_BYTES)::BIGINT AS tick
         |FROM f ORDER BY host, doc_id""".stripMargin,
    // i03: the shared diff CTEs (same snapshot views, same digest
    // compare)
    "i03_snapshot_diff" ->
      s"""WITH $duckDiffCtes
         |SELECT doc_id, status FROM diff ORDER BY doc_id""".stripMargin,
    "i02_url_canonical_dedup" ->
      """WITH urls AS (
        |  SELECT doc_id,
        |         CASE (doc_id % 5)::INT
        |           WHEN 0 THEN 'http://Example.com/page_' || (doc_id // 5)
        |           WHEN 1 THEN 'https://example.com/page_' || (doc_id // 5) || '/'
        |           WHEN 2 THEN 'https://www.example.com/page_' || (doc_id // 5)
        |                       || '?utm_source=x&utm_medium=y'
        |           WHEN 3 THEN 'http://EXAMPLE.com/page_' || (doc_id // 5) || '#frag'
        |           ELSE 'https://example.com/other_' || doc_id
        |         END AS url
        |  FROM documents),
        |canon AS (
        |  SELECT doc_id, url,
        |         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |           regexp_replace(lower(url), '#.*$', ''), '\?.*$', ''),
        |           '^https?://', ''), '^www\.', ''), '/$', '') AS canon
        |  FROM urls)
        |SELECT doc_id, url, canon,
        |       (row_number() OVER (PARTITION BY canon ORDER BY doc_id) = 1)::INT
        |         AS keep
        |FROM canon ORDER BY doc_id""".stripMargin,
    "i01_url_pipeline" ->
      """WITH urls AS (
        |  SELECT doc_id,
        |         source || '/img_' || doc_id ||
        |           (CASE (doc_id % 4)::INT
        |              WHEN 0 THEN '.jpg' WHEN 1 THEN '.PNG'
        |              WHEN 2 THEN '.gif' ELSE '.txt' END) AS url
        |  FROM documents),
        |tagged AS (
        |  SELECT doc_id, url,
        |         lower(regexp_extract(url, '\.([A-Za-z0-9]+)$', 1)) AS ext
        |  FROM urls)
        |SELECT doc_id, url, ext,
        |       regexp_replace(url, '/([^/]+)$', '/600px-\1') AS thumb_url
        |FROM tagged WHERE ext IN ('jpg', 'jpeg', 'png', 'gif')
        |ORDER BY doc_id""".stripMargin)
}
