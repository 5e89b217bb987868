package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** LIVE-protocol DO-RJ listing→detail fetch: an in-JVM server plays the
  * gazette's search API (JSON aggregation buckets), the edition folder-tree
  * page, and the article content endpoint (with a PDF to exercise the
  * content-type guard); the fetcher drives the whole chain end-to-end.
  */
class DorjFetchLiveSpec extends AnyFunSuite {

  private val treeHtml =
    """<html><body>
      |<ul id="tree">
      | <li><span class="folder">Atos do Prefeito</span>
      |  <ul>
      |   <li><span class="folder">DECRETOS N</span>
      |    <ul>
      |     <li><span class="file"><a class="linkMateria" identificador="9001" pagina="" data-materia-id="9001">DECRETO RIO N&ordm; 1</a></span></li>
      |     <li><span class="file"><a class="linkMateria" identificador="" data-materia-id="9002">DECRETO RIO N 2</a></span></li>
      |    </ul>
      |   </li>
      |   <li><span class="folder">PORTARIAS</span>
      |    <ul><li><span class="file"><a class="linkMateria" identificador="9099">PORTARIA IRRELEVANTE</a></span></li></ul>
      |   </li>
      |  </ul>
      | </li>
      | <li><span class="folder">Avisos Editais e Termos de Contratos</span>
      |  <ul>
      |   <li><span class="folder">Secretaria Municipal de Sa&uacute;de</span>
      |    <ul>
      |     <li><span class="folder">Avisos</span>
      |      <ul><li><span class="file"><a class="linkMateria" identificador="9003">AVISO SMS</a></span></li></ul>
      |     </li>
      |     <li><span class="folder">Outros</span>
      |      <ul><li><span class="file"><a class="linkMateria" identificador="9004">TERMO SMS</a></span></li></ul>
      |     </li>
      |    </ul>
      |   </li>
      |  </ul>
      | </li>
      |</ul>
      |</body></html>""".stripMargin

  private final class FakeDorj {
    val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)
    val searchHits = new AtomicInteger(0)

    private def reply(ex: HttpExchange, code: Int, body: String,
        ct: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", ct)
      ex.sendResponseHeaders(code, b.length)
      val os = ex.getResponseBody
      try os.write(b) finally os.close()
      ex.close()
    }

    server.createContext("/busca/busca/buscar/query/0/", { ex =>
      val path = ex.getRequestURI.getPath
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      assert(q == "q=%22rio%22", s"unexpected query: $q")
      if (path.contains("di:2026-08-14/df:2026-08-14")) {
        // flaky: two 503s before the JSON — the retry discipline must ride
        // them out; duplicate bucket key exercises the distinct
        if (searchHits.incrementAndGet() <= 2)
          reply(ex, 503, "overloaded", "text/html")
        else reply(ex, 200,
          """{"took":5,"aggregations":{"Edicoes":{"buckets":[
            |{"key":7123,"doc_count":10},{"key":7124,"doc_count":3},
            |{"key":7123,"doc_count":2}]}}}""".stripMargin,
          "application/json; charset=UTF-8")
      } else reply(ex, 200,
        """{"aggregations":{"Edicoes":{"buckets":[]}}}""", "application/json")
    })

    server.createContext("/portal/visualizacoes/view_html_diario/", { ex =>
      val id = ex.getRequestURI.getPath.split("/").last
      if (id == "7123" || id == "7124") reply(ex, 200, treeHtml, "text/html")
      else reply(ex, 404, "no such edition", "text/html")
    })

    server.createContext("/apifront/portal/edicoes/publicacoes_ver_conteudo/", { ex =>
      val id = ex.getRequestURI.getPath.split("/").last
      id match {
        case "9001" => reply(ex, 200,
          "<html><body><p>DECRETO RIO N 1 conteudo</p></body></html>",
          "text/html; charset=UTF-8")
        case "9002" => reply(ex, 200, "%PDF-1.4 fake", "application/pdf")
        case _ => reply(ex, 404, "no such article", "text/html")
      }
    })

    server.start()
    def url = s"http://localhost:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("listing→detail end-to-end over live HTTP: search JSON → distinct " +
    "edition ids → folder-tree walk → content with PDF guard") {
    val s = new FakeDorj
    try {
      // 1. search API: retried through two 503s, duplicate bucket distinct'd
      val ids = DorjFetcher.currentDoIdentifiers(s.url, "2026-08-14", backoff = _ => ())
      assert(ids == Seq("7123" -> "2026-08-14", "7124" -> "2026-08-14"))
      assert(s.searchHits.get == 3)

      // 2. folder-tree walk: only the configured section paths collect
      val articles = DorjFetcher.articleNamesIds(s.url, ids.head._1, backoff = _ => ())
      assert(articles.toSet == Set(
        ("Atos do Prefeito/DECRETOS N", "DECRETO RIO Nº 1", Some("9001")),
        // empty identificador falls through to data-materia-id
        ("Atos do Prefeito/DECRETOS N", "DECRETO RIO N 2", Some("9002")),
        ("Avisos Editais e Termos de Contratos/Secretaria Municipal de Saúde/Avisos",
          "AVISO SMS", Some("9003")),
        ("Avisos Editais e Termos de Contratos/Secretaria Municipal de Saúde/Outros",
          "TERMO SMS", Some("9004"))))
      // PORTARIAS is not on any configured path
      assert(!articles.exists(_._2.contains("IRRELEVANTE")))

      // 3. article content: HTML passes, a PDF attachment is None not error
      val html = DorjFetcher.articleContent(s.url, "9001", backoff = _ => ())
      assert(html.exists(_.contains("DECRETO RIO N 1 conteudo")))
      assert(DorjFetcher.articleContent(s.url, "9002", backoff = _ => ()).isEmpty)
    } finally s.stop()
  }

  test("an empty day is a LOUD failure (the reference raises and retries)") {
    val s = new FakeDorj
    try {
      val e = intercept[java.io.IOException](
        DorjFetcher.currentDoIdentifiers(s.url, "2026-08-15", backoff = _ => ()))
      assert(e.getMessage.contains("no DO"))
    } finally s.stop()
  }

  test("folder-tree parse: paths, transparent li propagation, first-match walk") {
    val tree = DorjFetcher.parseFolderTree(treeHtml)
    assert(tree.map(_.name) ==
      Seq("Atos do Prefeito", "Avisos Editais e Termos de Contratos"))
    val atos = tree.head
    assert(atos.subfolders.map(_.name) == Seq("DECRETOS N", "PORTARIAS"))
    assert(atos.subfolders.head.path == Seq("Atos do Prefeito", "DECRETOS N"))
    // subtree links bubble up through the transparent file <li>s
    assert(atos.subtreeLinks.size == 3)
    // a missing path element yields no links, not an error
    assert(DorjFetcher.linksForPath(tree, Seq("atos do prefeito", "nope")) == Nil)
  }

  test("folder-tree parse: UPPERCASE close tags (</SPAN>, </A>) parse identically") {
    // the tokenizer matches open tags case-insensitively; a case-sensitive
    // inner-text scan would miss </SPAN>/</A> and silently DROP the folder
    // name or link, shrinking the day's extraction without error
    val upper = treeHtml.replace("</span>", "</SPAN>").replace("</a>", "</A>")
    assert(!upper.contains("</span>") && !upper.contains("</a>"))
    val tree = DorjFetcher.parseFolderTree(upper)
    assert(tree.map(_.name) ==
      Seq("Atos do Prefeito", "Avisos Editais e Termos de Contratos"))
    assert(tree.head.subfolders.map(_.name) == Seq("DECRETOS N", "PORTARIAS"))
    assert(tree.head.subtreeLinks.size == 3)
  }

  test("folder-tree parse: OMITTED </li> tags (implied closes) parse identically") {
    // </li> is optional in HTML and real gazette markup omits it: a
    // sibling <li>, a parent </ul>, or end-of-input implies the close —
    // a parser needing explicit closes would silently return ZERO folders
    val implied = treeHtml.replace("</li>", "")
    assert(!implied.contains("</li>"))
    val tree = DorjFetcher.parseFolderTree(implied)
    assert(tree.map(_.name) ==
      Seq("Atos do Prefeito", "Avisos Editais e Termos de Contratos"))
    assert(tree.head.subfolders.map(_.name) == Seq("DECRETOS N", "PORTARIAS"))
    assert(tree.head.subtreeLinks.size == 3)
    // the full path walk yields the same articles either way
    val a = DorjFetcher.DefaultPaths.flatMap(p =>
      DorjFetcher.linksForPath(
        {
          def flat(fs: Seq[DorjFetcher.FolderNode]): Seq[DorjFetcher.FolderNode] =
            fs.flatMap(f => f +: flat(f.subfolders))
          flat(tree)
        }, p))
      .map(l => (l.path.mkString("/"), l.title, l.articleId)).distinct
    assert(a.size == 4 && a.forall(_._3.isDefined))
  }
}
