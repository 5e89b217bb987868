package graft.sources

import java.io.IOException
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import java.util.concurrent.{Executors, TimeUnit}

/** Gazette (DOU) detail fetch — the HTTP half of the reference's
  * diario_oficial_uniao extraction (reference:
  * pipelines/datalake/extract_load/diario_oficial_uniao/utils.py:10-62
  * `extract_decree_details`, tasks.py:88-103 the bounded-pool fan-out).
  * The LISTING page is driven by a JS browser (Selenium — out of sandbox
  * scope with S18); each decree's DETAIL page is a plain GET parsed by
  * CSS class, which this speaks live:
  *
  *  - bounded retries with backoff on 500/502/503/504 (the reference's
  *    urllib3 Retry(total=3, status_forcelist=...));
  *  - the reference's field set, each a find-by-class over the page
  *    (title, texto-dou body text AND raw html, joined `identifica`
  *    titles, `;`-joined `assina` signatures, date/edition/section/page/
  *    agency stamps), absent elements landing as empty strings;
  *  - a bounded thread pool over the link list where ANY decree
  *    exhausting its retries aborts the whole extraction (the
  *    reference's return [[], False]).
  */
object DouFetcher {

  final case class Decree(title: String, textTitle: String, signatures: String,
      publishedAt: String, edition: String, section: String, agency: String,
      page: String, text: String, html: String, url: String)

  private lazy val http: HttpClient = HttpClient.newHttpClient()

  private val RetryStatuses = Set(500, 502, 503, 504)

  /** GET with the reference's retry discipline: up to `maxRetries`
    * additional attempts on retryable statuses, `backoff` between them
    * (injectable so specs run fast).
    */
  private[sources] def getWithRetry(url: String, maxRetries: Int = 3,
      timeoutMs: Int = 90000, backoff: Int => Unit = _ => ()): String = {
    var attempt = 0
    while (true) {
      val resp = http.send(
        HttpRequest.newBuilder(URI.create(url))
          .timeout(Duration.ofMillis(timeoutMs.toLong)).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      val code = resp.statusCode()
      if (code < 400) return resp.body()
      if (!RetryStatuses.contains(code) || attempt >= maxRetries)
        throw new IOException(s"GET $url failed: HTTP $code after ${attempt + 1} attempts")
      attempt += 1
      backoff(attempt)
    }
    throw new IllegalStateException("unreachable")
  }

  /** All elements whose class attribute contains `cls` as a whole token,
    * returned as (innerHtml). A tiny depth-tracking scanner — enough for
    * the DOU's regular markup, no HTML library in the container.
    */
  private[sources] def elementsByClass(html: String, cls: String): Seq[String] = {
    val open = s"""(?is)<([a-z0-9]+)\\b[^>]*\\bclass\\s*=\\s*["']([^"']*)["'][^>]*>""".r
    open.findAllMatchIn(html).toSeq.collect {
      case m if m.group(2).split("\\s+").contains(cls) ||
          m.group(2).trim == cls =>
        val tag = m.group(1).toLowerCase
        val from = m.end
        // scan forward tracking nesting of the SAME tag name
        val tokens = s"(?is)<(/?)$tag\\b[^>]*>".r
        var depth = 1
        var end = html.length
        val it = tokens.findAllMatchIn(html.substring(from))
        while (depth > 0 && it.hasNext) {
          val t = it.next()
          if (t.group(1) == "/") { depth -= 1; if (depth == 0) end = from + t.start }
          else depth += 1
        }
        html.substring(from, end)
    }
  }

  private[sources] def innerText(innerHtml: String): String =
    innerHtml.replaceAll("(?is)<[^>]*>", "").replaceAll("\\s+", " ").trim

  private def firstText(html: String, cls: String): String =
    elementsByClass(html, cls).headOption.map(innerText).getOrElse("")

  /** Parse one detail page into the reference's field set
    * (utils.py:30-57).
    */
  def parseDecree(html: String, url: String): Decree = Decree(
    title = firstText(html, "portlet-title-text"),
    textTitle = elementsByClass(html, "identifica").map(innerText).mkString(" "),
    signatures = elementsByClass(html, "assina").map(innerText).mkString(";"),
    publishedAt = firstText(html, "publicado-dou-data"),
    edition = firstText(html, "edicao-dou-data"),
    section = firstText(html, "secao-dou"),
    agency = firstText(html, "orgao-dou-data"),
    page = firstText(html, "secao-dou-data"),
    text = firstText(html, "texto-dou"),
    html = elementsByClass(html, "texto-dou").headOption.getOrElse(""),
    url = url)

  /** Fetch + parse one decree (utils.py:10-62). */
  def extractDecreeDetails(url: String, maxRetries: Int = 3,
      backoff: Int => Unit = _ => ()): Decree =
    parseDecree(getWithRetry(url, maxRetries, backoff = backoff), url)

  /** The bounded-pool fan-out over the listing's links (tasks.py:88-103):
    * `maxWorkers` concurrent detail fetches; ANY link exhausting its
    * retries aborts the whole extraction — the reference treats a partial
    * gazette as a failed day, not a short one. Returns the decrees in
    * completion order (the reference's as_completed).
    */
  def extractAll(links: Seq[String], maxWorkers: Int, maxRetries: Int = 3,
      backoff: Int => Unit = _ => ()): Seq[Decree] = {
    require(maxWorkers > 0, "need at least one worker")
    val pool = Executors.newFixedThreadPool(maxWorkers)
    try {
      val futures = links.map(l =>
        pool.submit(() => extractDecreeDetails(l, maxRetries, backoff)))
      futures.map { f =>
        try f.get()
        catch { case e: java.util.concurrent.ExecutionException =>
          throw new IOException("decree fetch exhausted retries; aborting the extraction",
            e.getCause)
        }
      }
    } finally { pool.shutdown(); pool.awaitTermination(1, TimeUnit.MINUTES) }
  }
}
