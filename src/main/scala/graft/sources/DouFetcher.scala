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

  // follows redirects like the reference's requests session — the JDK
  // default (NEVER) would hand a 301 stub body to the parser, landing an
  // all-empty decree with no error
  private lazy val http: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL).build()

  private val RetryStatuses = Set(500, 502, 503, 504)

  /** GET with the reference's retry discipline (urllib3 Retry(total=3)):
    * up to `maxRetries` additional attempts on retryable statuses AND on
    * connection-level IOExceptions (resets/timeouts retry there too),
    * `backoff` between them (injectable so specs run fast).
    */
  private[sources] def getWithRetry(url: String, maxRetries: Int = 3,
      timeoutMs: Int = 90000,
      backoff: Int => Unit = DorjFetcher.defaultBackoff): String = {
    var attempt = 0
    while (true) {
      val codeOrErr: Either[IOException, (Int, String)] =
        try {
          val resp = http.send(
            HttpRequest.newBuilder(URI.create(url))
              .timeout(Duration.ofMillis(timeoutMs.toLong)).GET().build(),
            HttpResponse.BodyHandlers.ofString())
          Right((resp.statusCode(), resp.body()))
        } catch { case e: IOException => Left(e) }
      codeOrErr match {
        case Right((code, body)) if code < 400 => return body
        case Right((code, _)) if !RetryStatuses.contains(code) =>
          throw new IOException(
            s"GET $url failed: HTTP $code after ${attempt + 1} attempts (not retryable)")
        case Right((code, _)) if attempt >= maxRetries =>
          throw new IOException(s"GET $url failed: HTTP $code after ${attempt + 1} attempts")
        case Left(e) if attempt >= maxRetries =>
          throw new IOException(
            s"GET $url failed after ${attempt + 1} attempts: ${e.getMessage}", e)
        case _ => ()
      }
      attempt += 1
      backoff(attempt)
    }
    throw new IllegalStateException("unreachable")
  }

  /** Tags whose end tag is optional in HTML (the subset the DOU emits):
    * a new sibling open implicitly closes the previous one, and they
    * never legally nest — `<p class="assina">A<p class="assina">B</p>`
    * must yield TWO elements, not one swallowing the document tail.
    */
  private val OptionalEndTags = Set("p", "li", "td", "tr", "option")

  /** Void elements: never carry content, never affect nesting depth. */
  private val VoidTags =
    Set("br", "img", "hr", "input", "meta", "link", "area", "col", "wbr")

  /** All elements whose class attribute contains `cls` as a whole token,
    * returned as inner HTML. A tiny depth-tracking scanner — enough for
    * the DOU's markup, no HTML library in the container — that treats
    * self-closing (`.../>`) and void tags as depth-neutral and honors
    * optional end tags. Region-based matching: no document-tail copies,
    * one precompiled token pattern per element's tag.
    */
  private[sources] def elementsByClass(html: String, cls: String): Seq[String] = {
    val open = s"""(?is)<([a-z0-9]+)\\b[^>]*\\bclass\\s*=\\s*["']([^"']*)["'][^>]*>""".r
    open.findAllMatchIn(html).toSeq.collect {
      case m if m.group(2).split("\\s+").contains(cls) =>
        val tag = m.group(1).toLowerCase
        val from = m.end
        val tokens = java.util.regex.Pattern.compile(
          s"(?is)<(/?)$tag\\b[^>]*?(/?)>")
        val it = tokens.matcher(html)
        it.region(from, html.length)
        var depth = 1
        var end = html.length
        while (depth > 0 && it.find()) {
          val isClose = it.group(1) == "/"
          val selfClosing = it.group(2) == "/" || VoidTags.contains(tag)
          if (isClose) { depth -= 1; if (depth == 0) end = it.start }
          else if (selfClosing) () // depth-neutral
          else if (OptionalEndTags.contains(tag)) {
            // a sibling open of an optional-end tag closes this element
            depth -= 1; if (depth == 0) end = it.start
          }
          else depth += 1
        }
        html.substring(from, end)
    }
  }

  /** The entity subset [[graft.functions.HtmlFunctions.cleanText]]
    * decodes, plus numeric/accent entities the DOU emits — BeautifulSoup's
    * `.text` decodes entities, so skipping this would land literal
    * `&Eacute;` strings in the fields q30-q32 analyze.
    */
  private val Entities = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&aacute;" -> "á", "&eacute;" -> "é", "&iacute;" -> "í",
    "&oacute;" -> "ó", "&uacute;" -> "ú", "&atilde;" -> "ã", "&otilde;" -> "õ",
    "&ccedil;" -> "ç", "&acirc;" -> "â", "&ecirc;" -> "ê", "&ocirc;" -> "ô",
    "&agrave;" -> "à", "&Aacute;" -> "Á", "&Eacute;" -> "É", "&Iacute;" -> "Í",
    "&Oacute;" -> "Ó", "&Uacute;" -> "Ú", "&Atilde;" -> "Ã", "&Otilde;" -> "Õ",
    "&Acirc;" -> "Â", "&Ecirc;" -> "Ê", "&Ocirc;" -> "Ô", "&Agrave;" -> "À",
    "&Ccedil;" -> "Ç", "&ordm;" -> "º", "&ordf;" -> "ª", "&sect;" -> "§",
    "&amp;" -> "&") // LAST so &amp;nbsp; does not double-decode

  private[sources] def innerText(innerHtml: String): String = {
    val stripped = innerHtml.replaceAll("(?is)<[^>]*>", "")
    val numeric = "&#(\\d+);".r.replaceAllIn(stripped,
      m => java.util.regex.Matcher.quoteReplacement(
        new String(Character.toChars(m.group(1).toInt))))
    Entities.foldLeft(numeric) { case (acc, (from, to)) =>
      acc.replace(from, to)
    }.replaceAll("\\s+", " ").trim
  }

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
      backoff: Int => Unit = DorjFetcher.defaultBackoff): Decree =
    parseDecree(getWithRetry(url, maxRetries, backoff = backoff), url)

  /** The bounded-pool fan-out over the listing's links (tasks.py:88-103):
    * `maxWorkers` concurrent detail fetches; ANY link failing (retries
    * exhausted, non-retryable status, bad URL) aborts the whole
    * extraction — the reference treats a partial gazette as a failed day,
    * not a short one — and the abort CANCELS queued/in-flight fetches
    * instead of letting them hammer a down server. Returns the decrees in
    * LINK order (stable for oracle diffs; the reference's as_completed
    * order is scheduler-dependent).
    */
  def extractAll(links: Seq[String], maxWorkers: Int, maxRetries: Int = 3,
      backoff: Int => Unit = DorjFetcher.defaultBackoff): Seq[Decree] = {
    require(maxWorkers > 0, "need at least one worker")
    val pool = Executors.newFixedThreadPool(maxWorkers)
    try {
      val futures = links.map(l =>
        pool.submit(() => extractDecreeDetails(l, maxRetries, backoff)))
      try futures.map(_.get())
      catch { case e: java.util.concurrent.ExecutionException =>
        futures.foreach(_.cancel(true))
        throw new IOException(
          s"decree fetch failed (${String.valueOf(e.getCause.getMessage).take(200)}); " +
            "aborting the extraction", e.getCause)
      }
    } finally {
      pool.shutdownNow()
      pool.awaitTermination(1, TimeUnit.MINUTES)
    }
  }
}
