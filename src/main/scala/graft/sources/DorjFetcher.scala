package graft.sources

import java.io.IOException
import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Municipal gazette (DO-RJ) listing + article fetch — the acquisition
  * half of the reference's diario_oficial_rj extraction (reference:
  * pipelines/datalake/extract_load/diario_oficial_rj/tasks.py:25-67
  * `get_current_DO_identifiers`, :70-147 `get_article_names_ids`,
  * :150-210 `get_article_contents`; utils.py:48-93 `send_get_request`,
  * :96-151 the folder-tree walk). Unlike the federal DOU listing (a JS
  * page needing a browser), the DO-RJ surface is plain JSON+HTML over
  * HTTP:
  *
  *  1. a search API (`busca/busca/buscar/query/0/di:{d}/df:{d}/?q="rio"`)
  *     whose `aggregations.Edicoes.buckets[].key` values are the day's
  *     distinct edition ids — zero editions is a loud failure (the
  *     reference raises and retries the task);
  *  2. each edition's `view_html_diario/{id}` page: a folder tree of
  *     `<li><span class="folder">NAME</span><ul>…` nodes with
  *     `<a class="linkMateria" identificador=… data-materia-id=…>` leaves;
  *     ten hard-coded section paths select the health-relevant folders,
  *     each link keyed by (folder path, title, first non-empty id attr);
  *  3. each article's `publicacoes_ver_conteudo/{id}` body, fetched with
  *     the reference's content-type guard — a PDF attachment yields None,
  *     not a parse error.
  *
  * Everything here is driver-side acquisition (bounded by a day's gazette
  * size); the fetched bodies land distributed via
  * [[graft.flows.Ingest.landJsonPayload]] and are parsed by the codegen'd
  * [[graft.functions.HtmlFunctions]] exactly like the q52 path.
  */
object DorjFetcher {

  /** The reference's ten section paths (tasks.py:93-114), matched by
    * exact lowercase-trimmed folder text at each level.
    */
  val DefaultPaths: Seq[Seq[String]] = Seq(
    Seq("atos do prefeito", "decretos n"),
    Seq("secretaria municipal de saúde", "resoluções", "resolução n"),
    Seq("controladoria geral do município do rio de janeiro", "resoluções",
      "resolução n"),
    Seq("controladoria geral do município do rio de janeiro",
      "comissão de qualificação de organizações sociais"),
    Seq("tribunal de contas do município", "resoluções", "resolução n"),
    Seq("tribunal de contas do município", "outros"),
    Seq("avisos editais e termos de contratos",
      "secretaria municipal de saúde", "avisos"),
    Seq("avisos editais e termos de contratos",
      "secretaria municipal de saúde", "outros"),
    Seq("avisos editais e termos de contratos",
      "controladoria geral do município do rio de janeiro", "outros"),
    Seq("avisos editais e termos de contratos",
      "tribunal de contas do município", "outros"))

  private lazy val http: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL).build()

  private val RetryStatuses = Set(500, 502, 503, 504)

  /** The reference's urllib3 backoff discipline (factor 15): sleep
    * 15·2^(attempt−1) s before retry `attempt`, capped at 2 min. The
    * DEFAULT for every public fetch — an immediate-retry default would
    * hammer an already-overloaded gazette server three times within
    * milliseconds. Specs inject a no-op to run fast.
    */
  private[sources] def defaultBackoff(attempt: Int): Unit =
    Thread.sleep(math.min(15000L * (1L << math.max(0, attempt - 1)), 120000L))

  /** GET returning (body, content-type sans charset) with the reference's
    * retry discipline (urllib3 Retry(total=3, status_forcelist, backoff
    * factor 15)).
    */
  private[sources] def getWithCt(url: String, maxRetries: Int = 3,
      timeoutMs: Int = 90000,
      backoff: Int => Unit = defaultBackoff): (String, String) = {
    var attempt = 0
    while (true) {
      val res: Either[IOException, (Int, String, String)] =
        try {
          val resp = http.send(
            HttpRequest.newBuilder(URI.create(url))
              .timeout(Duration.ofMillis(timeoutMs.toLong)).GET().build(),
            HttpResponse.BodyHandlers.ofString())
          val ct = resp.headers().firstValue("Content-Type").orElse("")
            .split(";")(0).trim.toLowerCase
          Right((resp.statusCode(), resp.body(), ct))
        } catch { case e: IOException => Left(e) }
      res match {
        case Right((code, body, ct)) if code < 400 => return (body, ct)
        case Right((code, _, _)) if !RetryStatuses.contains(code) =>
          throw new IOException(s"GET $url failed: HTTP $code (not retryable)")
        case Right((code, _, _)) if attempt >= maxRetries =>
          throw new IOException(
            s"GET $url failed: HTTP $code after ${attempt + 1} attempts")
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

  /** The search-API URL for one day (tasks.py:33-37): both interval ends
    * pinned to `date`, query text `"rio"` URL-encoded with quotes.
    */
  def searchUrl(base: String, date: String): String =
    s"$base/busca/busca/buscar/query/0/di:$date/df:$date/?q=" +
      URLEncoder.encode("\"rio\"", StandardCharsets.UTF_8)

  /** The day's distinct edition ids from the search aggregation
    * (tasks.py:25-67). Zero editions raises — the reference treats an
    * empty day as an extraction failure to retry, not a result.
    */
  def currentDoIdentifiers(base: String, date: String,
      backoff: Int => Unit = defaultBackoff): Seq[(String, String)] = {
    val (body, _) = getWithCt(searchUrl(base, date), backoff = backoff)
    val buckets = JsonMethods.parse(body) \ "aggregations" \ "Edicoes" \ "buckets"
    val ids = (buckets match {
      case JArray(bs) => bs.map(_ \ "key").collect {
        case JString(s) => s
        case JInt(i) => i.toString
        case JLong(l) => l.toString
      }
      case _ => Nil
    }).distinct
    if (ids.isEmpty)
      throw new IOException(s"Found no DO for specified date $date")
    ids.map(_ -> date)
  }

  // ------------------------------------------------------ folder-tree walk

  /** A leaf link placed in the tree: ancestor folder names root-first. */
  final case class PlacedLink(path: Seq[String], title: String,
      identificador: Option[String], dataMateriaId: Option[String]) {
    /** First non-empty id attribute (tasks.py:112-121). */
    def articleId: Option[String] =
      Seq(identificador, dataMateriaId).flatten.map(_.trim).find(_.nonEmpty)
  }

  /** A folder node: name, full path, DIRECT subfolders, and the links
    * directly in this folder (not inside a nested folder). `subtreeLinks`
    * is every link under the folder's `<li>` — what the reference's
    * `get_all_links_in_folder` collects from `folder.parent`.
    */
  final case class FolderNode(name: String, path: Seq[String],
      subfolders: Seq[FolderNode], ownLinks: Seq[PlacedLink]) {
    lazy val subtreeLinks: Seq[PlacedLink] =
      ownLinks ++ subfolders.flatMap(_.subtreeLinks)
  }

  private val TagToken =
    "(?is)<(/?)(ul|li|span|a)\\b([^>]*)>".r

  private def attr(attrs: String, name: String): Option[String] =
    s"""(?is)\\b$name\\s*=\\s*["']([^"']*)["']""".r
      .findFirstMatchIn(attrs).map(_.group(1))

  private def classTokens(attrs: String): Set[String] =
    attr(attrs, "class").map(_.split("\\s+").toSet).getOrElse(Set.empty)

  /** Parse the `view_html_diario` page into its folder forest. A
    * purpose-built stack parser over the four tags the tree uses — the
    * spans and anchors of this page hold plain text, so inner text runs to
    * the next close tag of the same name. `</li>` is OPTIONAL in HTML and
    * real gazette markup omits it: a sibling `<li>` (with no intervening
    * `<ul>`), a parent `</ul>`, and end-of-input all imply the close —
    * without the implied closes an unterminated tree would silently parse
    * to zero folders and the day's extraction would "succeed" empty.
    */
  /** Case-insensitive close-tag scan: the tokenizer matches open tags with
    * (?is), so an uppercase `</SPAN>`/`</A>` must close the capture too —
    * a case-sensitive indexOf would return -1 and silently DROP the folder
    * name or link, shrinking the day's extraction without error.
    */
  // precompiled per tag: closeTagIndex runs once per folder span and per
  // candidate anchor — recompiling the pattern each call would cost
  // thousands of Pattern.compile per large gazette page
  private val ClosePatterns: Map[String, java.util.regex.Pattern] =
    Seq("span", "a").map(t =>
      t -> java.util.regex.Pattern.compile("(?i)</" + t + "\\s*>")).toMap

  private def closeTagIndex(html: String, tag: String, from: Int): Int = {
    val m = ClosePatterns.getOrElse(tag,
      java.util.regex.Pattern.compile("(?i)</" + tag + "\\s*>")).matcher(html)
    if (m.find(from)) m.start else -1
  }

  private[sources] def parseFolderTree(html: String): Seq[FolderNode] = {
    import scala.collection.mutable.ListBuffer
    final class Ctx {
      var folderName: Option[String] = None
      val links = ListBuffer.empty[PlacedLink]
      val folders = ListBuffer.empty[FolderNode] // paths filled later
    }
    sealed trait Frame
    final case class LiFrame(ctx: Ctx) extends Frame
    case object UlFrame extends Frame
    val root = new Ctx
    var stack = List[Frame](LiFrame(root))
    def mergeTarget: Ctx = stack.collectFirst { case LiFrame(c) => c }.get
    def closeLi(): Unit = stack.head match {
      case LiFrame(c) if stack.tail.nonEmpty =>
        stack = stack.tail
        val parent = mergeTarget
        c.folderName match {
          case Some(name) => // paths are placed in the second pass
            parent.folders += FolderNode(name, Nil, c.folders.toSeq,
              c.links.toSeq)
          case None => // transparent li (e.g. a file leaf): propagate up
            parent.links ++= c.links
            parent.folders ++= c.folders
        }
      case _ => ()
    }
    def topIsLi: Boolean =
      stack.headOption.exists(_.isInstanceOf[LiFrame]) && stack.tail.nonEmpty
    val matches = TagToken.findAllMatchIn(html).toSeq
    var skipUntil = -1 // consume tokens inside a captured span/a text scan
    for (m <- matches if m.start >= skipUntil) {
      val close = m.group(1) == "/"
      val tag = m.group(2).toLowerCase
      val attrs = m.group(3)
      tag match {
        case "li" if !close =>
          // implied close: a sibling li with no intervening ul
          if (topIsLi) closeLi()
          stack = LiFrame(new Ctx) :: stack
        case "li" if close => closeLi()
        case "ul" if !close => stack = UlFrame :: stack
        case "ul" if close =>
          // implied close of any open li inside this ul, then pop the ul
          while (topIsLi) closeLi()
          if (stack.headOption.contains(UlFrame)) stack = stack.tail
        case "span" if !close && classTokens(attrs).contains("folder") =>
          val end = closeTagIndex(html, "span", m.end)
          if (end >= 0) {
            // findChild(recursive=False): only the FIRST direct folder span
            val ctx = mergeTarget
            if (ctx.folderName.isEmpty)
              ctx.folderName =
                Some(DouFetcher.innerText(html.substring(m.end, end)))
            skipUntil = end
          }
        case "a" if !close =>
          // the reference collects anchors whose id attribute CONTAINS a
          // digit run (find_all with re.compile(r"[0-9]+") is a search)
          def numeric(v: Option[String]) = v.exists(_.exists(_.isDigit))
          val ident = attr(attrs, "identificador")
          val materiaId = attr(attrs, "data-materia-id")
          if (numeric(ident) || numeric(materiaId)) {
            val end = closeTagIndex(html, "a", m.end)
            if (end >= 0) {
              mergeTarget.links += PlacedLink(Nil,
                DouFetcher.innerText(html.substring(m.end, end)),
                ident, materiaId)
              skipUntil = end
            }
          }
        case _ => () // span/a closes carry no structure
      }
    }
    // end-of-input implies closing everything still open
    while (stack.tail.nonEmpty) stack.head match {
      case LiFrame(_) => closeLi()
      case UlFrame => stack = stack.tail
    }
    // second pass: assign each folder its root-first path and stamp it on
    // the folder's DIRECT links (a link's path = nearest enclosing folder)
    def placePaths(f: FolderNode, parentPath: Seq[String]): FolderNode = {
      val path = parentPath :+ f.name
      FolderNode(f.name, path, f.subfolders.map(placePaths(_, path)),
        f.ownLinks.map(_.copy(path = path)))
    }
    root.folders.toSeq.map(placePaths(_, Nil))
  }

  /** Pre-order flatten — the document-order folder list the reference's
    * `find_all("span", class="folder")` search starts from.
    */
  private def flatten(fs: Seq[FolderNode]): Seq[FolderNode] =
    fs.flatMap(f => f +: flatten(f.subfolders))

  /** The reference's recursive path walk (utils.py:117-151): at each level
    * the FIRST folder whose lowercase-trimmed text equals the path head is
    * taken; candidates for the next level are that folder itself plus its
    * direct subfolders; an exhausted path collects every link under each
    * candidate folder's subtree.
    */
  private[sources] def linksForPath(candidates: Seq[FolderNode],
      path: Seq[String]): Seq[PlacedLink] =
    if (path.isEmpty)
      candidates.flatMap(_.subtreeLinks)
        .distinctBy(l => (l.path, l.title, l.identificador, l.dataMateriaId))
    else candidates.find(_.name.toLowerCase.trim == path.head) match {
      case Some(f) => linksForPath(f +: f.subfolders, path.tail)
      case None => Nil
    }

  /** One edition's relevant articles (tasks.py:70-147): fetch the tree
    * page, walk the section paths, key each link by
    * (folder path joined "/", title, first non-empty id attr), distinct.
    */
  def articleNamesIds(base: String, doId: String,
      paths: Seq[Seq[String]] = DefaultPaths,
      backoff: Int => Unit = defaultBackoff): Seq[(String, String, Option[String])] = {
    val (body, _) = getWithCt(
      s"$base/portal/visualizacoes/view_html_diario/$doId", backoff = backoff)
    val all = flatten(parseFolderTree(body))
    paths.flatMap(p => linksForPath(all, p))
      .map(l => (l.path.mkString("/"), l.title, l.articleId))
      .distinct
  }

  /** One article's HTML body (tasks.py:150-170): the content endpoint with
    * the reference's content-type guard — `text/html` (or JSON) passes,
    * anything else (PDF attachments) is None, not an error.
    */
  def articleContent(base: String, articleId: String,
      backoff: Int => Unit = defaultBackoff): Option[String] = {
    val (body, ct) = getWithCt(
      s"$base/apifront/portal/edicoes/publicacoes_ver_conteudo/$articleId",
      backoff = backoff)
    if (ct == "text/html" || ct == "application/json") Some(body) else None
  }
}
