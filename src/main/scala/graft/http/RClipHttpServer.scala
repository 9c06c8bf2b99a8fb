package graft.http

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import com.fasterxml.jackson.databind.ObjectMapper
import graft.engine.{RClipEngine, RedirectUrl, ResizedBytes, SvgPlaceholder}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** The reference's HTTP surface (`rclip_server.py:376-492`) over the
  * engine façade — every endpoint, same paths, same response shapes —
  * on the JDK's built-in `com.sun.net.httpserver` (zero dependencies;
  * the server is a deployment veneer, ALL query semantics live in
  * [[RClipEngine]], which is what the correctness gates exercise).
  *
  * Endpoints: `/` + `/search` (HTML shell), `/search_api` ([[id, score]]
  * pairs), `/similar_words` ({similar_words, similar_phrases}),
  * `/clip_embedding`, `/clip_text_embedding`, `/visualize_clip_embedding`
  * (HTML fragment), `/censor/{id}` (key-gated), `/reload` (redirect `/`),
  * `/img/{id}` (redirect), `/thm/{id}` (placeholder SVG / redirect /
  * resized bytes), `/info/{id}`, `/copyright_message`, and S9 static
  * assets (`/js/...`, served from an optional assets dir — the
  * reference's `FileResponse('./assets/...')`).
  */
final class RClipHttpServer(
    engine: RClipEngine,
    port: Int = 0,
    assetsDir: Option[String] = None,
    // the /thm local-resize ports — deployments plug HttpImageFetcher and
    // a real codec here; the defaults are the offline stubs
    fetcher: graft.engine.ImageFetcher = graft.engine.FakeImageFetcher,
    decoder: graft.multimodal.MultimodalOps.MediaDecoder =
      graft.multimodal.MultimodalOps.FakeMediaDecoder) {

  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  /** Bound port (useful when constructed with port 0). */
  def boundPort: Int = server.getAddress.getPort

  // ------------------------------------------------------------ plumbing

  private def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
      .filter(_.contains("="))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") ->
          java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  private def send(ex: HttpExchange, code: Int, body: Array[Byte],
      contentType: String, extra: Map[String, String] = Map.empty): Unit = {
    ex.getResponseHeaders.set("Content-Type", contentType)
    extra.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    ex.sendResponseHeaders(code, body.length)
    val os = ex.getResponseBody
    try os.write(body) finally os.close()
  }

  private def json(ex: HttpExchange, value: Any): Unit =
    send(ex, 200, mapper.writeValueAsBytes(value), "application/json")

  private def html(ex: HttpExchange, body: String): Unit =
    send(ex, 200, body.getBytes(UTF_8), "text/html",
      Map("Cache-Control" -> "public, max-age=3600"))

  private def redirect(ex: HttpExchange, to: String): Unit =
    send(ex, 307, Array.emptyByteArray, "text/plain",
      Map("Location" -> to))

  private def notFound(ex: HttpExchange): Unit =
    send(ex, 404, "not found".getBytes(UTF_8), "text/plain")

  private def handle(path: String)(f: HttpExchange => Unit): Unit =
    server.createContext(path, (ex: HttpExchange) =>
      try f(ex)
      catch {
        // NonFatal only: a VM error (OOM, stack overflow) must propagate,
        // not masquerade as a 500. The body is generic — exception
        // messages carry internal paths/SQL and belong in the server log.
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[http] $path failed: $e")
          send(ex, 500, "internal error".getBytes(UTF_8), "text/plain")
      })

  /** Trailing path segment as a long id (`/thm/{id}` style). */
  private def pathId(ex: HttpExchange): Option[Long] =
    ex.getRequestURI.getPath.split("/").lastOption
      .flatMap(s => scala.util.Try(s.toLong).toOption)

  // ------------------------------------------------------------ payloads

  /** [[id, score]] pairs — the reference's `search_api` shape
    * (`rclip_server.py:386-393`). Served from the typed `searchRows`
    * path: identical rows to `search()`, but an interactive request on
    * the RAM-matrix regime never touches the query planner. */
  private def searchPairs(q: String, num: Int): java.util.List[Any] = {
    val out = new java.util.ArrayList[Any]()
    engine.searchRows(q, num).foreach { case (id, score) =>
      val pair = new java.util.ArrayList[Any]()
      pair.add(id); pair.add(score)
      out.add(pair)
    }
    out
  }

  private def scoredPairs(df: org.apache.spark.sql.DataFrame): java.util.List[Any] = {
    val out = new java.util.ArrayList[Any]()
    df.collect().foreach { r =>
      val pair = new java.util.ArrayList[Any]()
      pair.add(r.getString(0)); pair.add(r.getDouble(1))
      out.add(pair)
    }
    out
  }

  private def floatList(v: Array[Float]): java.util.List[java.lang.Double] = {
    val l = new java.util.ArrayList[java.lang.Double]()
    v.foreach(x => l.add(java.lang.Double.valueOf(x.toDouble)))
    l
  }

  /** The visualize fragment: one colored cell per dimension (the
    * reference renders seaborn colors into an HTML strip, `:253-273`). */
  private def visualizeHtml(q: String): String =
    engine.visualize(q).map { c =>
      f"""<span class="dim" style="background:${c.color}" title="dim ${c.dim}: ${c.value}%.4f"></span>"""
    }.mkString("""<div class="embedding-viz">""", "", "</div>")

  /** Minimal embedded HTML shell (the reference ships a Vue app from
    * `./assets`; an assetsDir overrides this stub the same way). */
  private val shell: String =
    """<!doctype html><html><head><title>graft</title></head>
      |<body><h1>graft</h1>
      |<form action="/search"><input name="q"><button>search</button></form>
      |<p>API: /search_api?q=, /similar_words?q=, /clip_embedding?q=,
      |/visualize_clip_embedding?q=, /thm/{id}, /info/{id}</p>
      |</body></html>""".stripMargin

  // ------------------------------------------------------------ routes

  handle("/") { ex =>
    val p = ex.getRequestURI.getPath
    if (p == "/" || p == "/index.html") html(ex, shellBody())
    else assetsDir match {
      // S9: static assets (the reference's ./assets + /js/vue...)
      case Some(dir) =>
        val f = java.nio.file.Paths.get(dir, p).normalize()
        if (f.startsWith(java.nio.file.Paths.get(dir)) &&
            java.nio.file.Files.isRegularFile(f))
          send(ex, 200, java.nio.file.Files.readAllBytes(f),
            contentTypeOf(p), Map("Cache-Control" -> "public, max-age=172800"))
        else notFound(ex)
      case None => notFound(ex)
    }
  }

  private def shellBody(): String = assetsDir
    .map(d => java.nio.file.Paths.get(d, "rclip_server.html"))
    .filter(java.nio.file.Files.isRegularFile(_))
    .map(p => new String(java.nio.file.Files.readAllBytes(p), UTF_8))
    .getOrElse(shell)

  private def contentTypeOf(p: String): String =
    if (p.endsWith(".js")) "application/javascript"
    else if (p.endsWith(".html")) "text/html"
    else if (p.endsWith(".css")) "text/css"
    else if (p.endsWith(".svg")) "image/svg+xml"
    else "application/octet-stream"

  handle("/search") { ex => html(ex, shellBody()) }

  handle("/search_api") { ex =>
    val ps = params(ex)
    json(ex, searchPairs(ps.getOrElse("q", ""),
      ps.get("num").flatMap(n => scala.util.Try(n.toInt).toOption).getOrElse(12)))
  }

  handle("/similar_words") { ex =>
    val ps = params(ex)
    val q = ps.getOrElse("q", "")
    val m = new java.util.LinkedHashMap[String, Any]()
    // words half from the typed RAM-map path (identical rows, no planner)
    val sw = new java.util.ArrayList[Any]()
    engine.similarWordsRows(q, 50).foreach { case (w, s) =>
      val pair = new java.util.ArrayList[Any]()
      pair.add(w); pair.add(s)
      sw.add(pair)
    }
    m.put("similar_words", sw)
    val sp = new java.util.ArrayList[Any]()
    engine.similarPhrasesRows(q, 50).foreach { case (p, s) =>
      val pair = new java.util.ArrayList[Any]()
      pair.add(p); pair.add(s)
      sp.add(pair)
    }
    m.put("similar_phrases", sp)
    json(ex, m)
  }

  handle("/clip_embedding") { ex =>
    val q = params(ex).getOrElse("q", "")
    val m = new java.util.LinkedHashMap[String, Any]()
    m.put("clip_embedding",
      engine.resolveEmbedding(q).map(floatList).orNull)
    json(ex, m)
  }

  handle("/clip_text_embedding") { ex =>
    val q = params(ex).getOrElse("q", "")
    val m = new java.util.LinkedHashMap[String, Any]()
    m.put("clip_text_embedding", floatList(engine.textEmbedding(q)))
    json(ex, m)
  }

  handle("/visualize_clip_embedding") { ex =>
    val q = params(ex).getOrElse("q", "")
    val m = new java.util.LinkedHashMap[String, Any]()
    m.put("clip_embedding", visualizeHtml(q))
    json(ex, m)
  }

  handle("/censor/") { ex =>
    val key = params(ex).getOrElse("censorship_key", "")
    val m = new java.util.LinkedHashMap[String, Any]()
    pathId(ex) match {
      case Some(id) if engine.censor(id, key) =>
        m.put("msg", s"Ok. $id is now censored")
      case _ =>
        m.put("error", "censorship key didn't match")
    }
    json(ex, m)
  }

  handle("/reload") { ex => engine.reload(); redirect(ex, "/") }

  handle("/img/") { ex =>
    pathId(ex).flatMap(id => engine.thumbnailUrl(id, 600)) match {
      case Some(url) => redirect(ex, url)
      case None      => notFound(ex)
    }
  }

  handle("/thm/") { ex =>
    val size = params(ex).get("size")
      .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(400)
    pathId(ex).flatMap(id => engine.thumbnail(id, size, fetcher, decoder)) match {
      case Some(SvgPlaceholder(svg)) =>
        send(ex, 200, svg.getBytes(UTF_8), "image/svg+xml",
          Map("Cache-Control" -> "public, max-age=172800"))
      case Some(RedirectUrl(url)) => redirect(ex, url)
      case Some(ResizedBytes(bytes)) =>
        send(ex, 200, bytes, "image/jpeg",
          Map("Cache-Control" -> "public, max-age=172800"))
      case None => notFound(ex)
    }
  }

  handle("/info/") { ex =>
    pathId(ex).flatMap(engine.info) match {
      case Some((id, vec)) =>
        val m = new java.util.LinkedHashMap[String, Any]()
        m.put("image_id", id)
        m.put("clip_embedding", floatList(vec))
        json(ex, m)
      case None => notFound(ex)
    }
  }

  handle("/copyright_message") { ex => json(ex, engine.copyrightMessage) }

  // ------------------------------------------------------------ lifecycle

  def start(): RClipHttpServer = { server.start(); this }
  def stop(): Unit = server.stop(0)
}
