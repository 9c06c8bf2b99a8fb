package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One image member of a MediaWiki category listing — the unit the
  * reference's indexer iterates (`index_wikimedia.py:105-109`:
  * `category.members()` filtered to image pages). */
final case class CategoryMember(descr_url: String, url: String, size: Option[Long])

/** S6 port: a pageable category-member listing source.
  *
  * The reference walks `mwclient.Site('commons.wikimedia.org')
  * .Categories[name].members()` — an HTTP-paged, driver-side iterator.
  * That shape is inherently sequential (each page's `continue` token
  * gates the next request), so the Spark design keeps the ITERATION on
  * the driver and moves everything after it (I2 dedup → I5 fetch+embed →
  * I6 upsert) onto executors via [[CategorySources.listingDf]]. A
  * category listing is metadata (~100 bytes/member); even a
  * million-member category is ~100 MB on the driver — the heavy work is
  * the fetch+embed, which stays distributed.
  */
trait CategorySource {
  def members(category: String): Iterator[CategoryMember]
}

/** Deterministic stand-in for offline builds/tests: `n` members with
  * reference-shaped Wikimedia URLs. */
final class FakeCategorySource(n: Int = 8) extends CategorySource {
  def members(category: String): Iterator[CategoryMember] =
    (1 to n).iterator.map { i =>
      CategoryMember(
        s"https://commons.wikimedia.org/wiki/File:${category}_$i.jpg",
        s"https://upload.wikimedia.org/wikipedia/commons/${category}_$i.jpg",
        Some(1000L + i))
    }
}

/** Production source: pages `categorymembers` through the public MediaWiki
  * API (the JSON twin of the reference's mwclient walk), following
  * `continue` tokens, with the polite-UA convention the reference follows
  * (`index_wikimedia.py:114-116`). Not exercised in the offline build
  * (zero egress) — tests use [[FakeCategorySource]]. */
final class HttpCategorySource(
    apiBase: String = "https://commons.wikimedia.org/w/api.php",
    userAgent: String = "graft/0.1 (batch embedding indexer)",
    pageSize: Int = 500,
    timeoutMs: Int = 30000) extends CategorySource {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def get(url: String): com.fasterxml.jackson.databind.JsonNode = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestProperty("User-Agent", userAgent)
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    val in = conn.getInputStream
    try mapper.readTree(in.readAllBytes())
    finally { in.close(); conn.disconnect() }
  }

  def members(category: String): Iterator[CategoryMember] = {
    val enc = java.net.URLEncoder.encode(s"Category:$category", "UTF-8")
    val baseParams = "action=query&format=json&generator=categorymembers" +
      s"&gcmtitle=$enc&gcmtype=file&gcmlimit=$pageSize" +
      "&prop=imageinfo&iiprop=url%7Csize"
    val out = scala.collection.mutable.ArrayBuffer.empty[CategoryMember]
    // MediaWiki continuation contract: with a generator + prop, a
    // generator batch's imageinfo can arrive spread over SEVERAL
    // continuation responses; entries are complete only at a
    // `batchcomplete` boundary, and every key of the `continue` object
    // must be echoed verbatim (not just gcmcontinue). Merge per pageid
    // until the batch completes.
    val pending = scala.collection.mutable.LinkedHashMap.empty[Long, CategoryMember]
    var cont: Map[String, String] = Map.empty
    var done = false
    while (!done) {
      val contQs = cont.map { case (k, v) =>
        s"&${java.net.URLEncoder.encode(k, "UTF-8")}=${java.net.URLEncoder.encode(v, "UTF-8")}"
      }.mkString
      val root = get(s"$apiBase?$baseParams$contQs")
      val pages = root.path("query").path("pages")
      if (pages.isObject) pages.elements().forEachRemaining { p =>
        val ii = p.path("imageinfo")
        if (ii.isArray && ii.size() > 0) {
          val info = ii.get(0)
          pending(p.path("pageid").asLong()) = CategoryMember(
            info.path("descriptionurl").asText(),
            info.path("url").asText(),
            if (info.has("size")) Some(info.path("size").asLong()) else None)
        }
      }
      if (root.has("batchcomplete")) {
        out ++= pending.values
        pending.clear()
      }
      val c = root.path("continue")
      if (c.isObject) {
        val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
        c.fields().forEachRemaining(e => m(e.getKey) = e.getValue.asText())
        cont = m.toMap
      } else done = true
    }
    out ++= pending.values // defensive: final response without batchcomplete
    out.iterator
  }
}

object CategorySources {
  /** The driver-iterator → DataFrame shim (S6): materialize the category
    * listing in the I1 listing schema so the whole batch pipeline I2–I6
    * ([[graft.ingest.Ingest.runOnListing]]) runs on it unchanged and
    * distributed. */
  def listingDf(spark: SparkSession, src: CategorySource, category: String): DataFrame = {
    import spark.implicits._
    src.members(category).toSeq
      .toDF("descr_url", "url", "size")
  }
}
