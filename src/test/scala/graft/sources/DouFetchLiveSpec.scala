package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** LIVE-protocol gazette detail fetch: an in-JVM server serves DOU-shaped
  * decree pages (the real CSS classes, nested markup, a flaky 503 page,
  * a permanently-broken page) and the fetcher drives the retrying,
  * bounded-pool extraction against it.
  */
class DouFetchLiveSpec extends AnyFunSuite {

  private def decreePage(n: Int): String =
    s"""<html><body>
       |<h1 class="portlet-title-text border-bottom-0">PORTARIA N $n</h1>
       |<div class="texto-dou"><p class="identifica">PORTARIA N $n, DE 1 DE AGOSTO DE 2026</p>
       |<p>Art. 1 <b>Fica</b> estabelecido o protocolo $n.</p>
       |<div><p>Art. 2 Esta portaria entra em vigor.</p></div>
       |<p class="assina">SECRETARIO A</p><p class="assina">DIRETOR B</p></div>
       |<span class="publicado-dou-data">01/08/2026</span>
       |<span class="edicao-dou-data">146</span>
       |<span class="secao-dou">Secao 1</span>
       |<span class="secao-dou-data">$n</span>
       |<span class="orgao-dou-data">Ministerio da Saude</span>
       |</body></html>""".stripMargin

  private final class FakeDou {
    val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)
    val flakyHits = new AtomicInteger(0)

    private def reply(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "text/html")
      ex.sendResponseHeaders(code, b.length)
      val os = ex.getResponseBody
      try os.write(b) finally os.close()
      ex.close()
    }

    server.createContext("/web/dou/", { ex =>
      val path = ex.getRequestURI.getPath.stripPrefix("/web/dou/")
      path match {
        case "flaky" =>
          if (flakyHits.incrementAndGet() <= 2) reply(ex, 503, "overloaded")
          else reply(ex, 200, decreePage(99))
        case "broken" => reply(ex, 503, "always down")
        case "moved" =>
          ex.getResponseHeaders.set("Location", s"$url/5")
          ex.sendResponseHeaders(302, -1)
          ex.close()
        case n if n.forall(_.isDigit) => reply(ex, 200, decreePage(n.toInt))
        case _ => reply(ex, 404, "no such decree")
      }
    })

    server.start()
    def url = s"http://localhost:${server.getAddress.getPort}/web/dou"
    def stop(): Unit = server.stop(0)
  }

  test("detail parse: every reference field from the real CSS classes, nested texto-dou intact") {
    val d = DouFetcher.parseDecree(decreePage(7), "u")
    assert(d.title == "PORTARIA N 7")
    assert(d.textTitle == "PORTARIA N 7, DE 1 DE AGOSTO DE 2026")
    assert(d.signatures == "SECRETARIO A;DIRETOR B")
    assert(d.publishedAt == "01/08/2026" && d.edition == "146")
    assert(d.section == "Secao 1" && d.page == "7")
    assert(d.agency == "Ministerio da Saude")
    // the body text spans the NESTED divs and strips inline markup
    assert(d.text.contains("Fica estabelecido o protocolo 7") &&
      d.text.contains("entra em vigor"))
    // the raw html of texto-dou is preserved for the landing table
    assert(d.html.contains("<b>Fica</b>"))
  }

  test("bounded-pool extraction over live HTTP: flaky 503 retried, all decrees land") {
    val dou = new FakeDou
    try {
      val links = Seq(s"${dou.url}/1", s"${dou.url}/2", s"${dou.url}/flaky",
        s"${dou.url}/3")
      val decrees = DouFetcher.extractAll(links, maxWorkers = 3, backoff = _ => ())
      assert(decrees.size == 4)
      assert(dou.flakyHits.get() == 3) // two 503s then the 200
      assert(decrees.map(_.url).toSet == links.toSet)
    } finally dou.stop()
  }

  test("a decree exhausting retries aborts the whole extraction (partial gazette = failed day)") {
    val dou = new FakeDou
    try {
      val e = intercept[java.io.IOException] {
        DouFetcher.extractAll(Seq(s"${dou.url}/1", s"${dou.url}/broken"), backoff = _ => (),
          maxWorkers = 2)
      }
      assert(e.getMessage.contains("aborting"))
      // non-retryable statuses are immediate
      val e2 = intercept[java.io.IOException] {
        DouFetcher.extractDecreeDetails(s"${dou.url}/missing-decree", backoff = _ => ())
      }
      assert(e2.getMessage.contains("404") && e2.getMessage.contains("1 attempts"))
    } finally dou.stop()
  }

  test("absent elements land as empty strings, not errors") {
    val d = DouFetcher.parseDecree("<html><body><p>bare page</p></body></html>", "u")
    assert(d.title == "" && d.text == "" && d.signatures == "" && d.html == "")
  }

  test("redirected decree URLs are followed, not parsed as the stub body") {
    val dou = new FakeDou
    try {
      val d = DouFetcher.extractDecreeDetails(s"${dou.url}/moved", backoff = _ => ())
      assert(d.title == "PORTARIA N 5") // the target page, not an empty parse
    } finally dou.stop()
  }

  test("optional-end tags and entities: omitted </p> closes at the sibling; entities decode like bs4 .text") {
    val sloppy =
      """<div><p class="assina">FULANO DE TAL<p class="assina">BELTRANO</p>
        |<span class="orgao-dou-data">MINIST&Eacute;RIO DA SA&Uacute;DE&nbsp;&#167; 2</span></div>""".stripMargin
    val d = DouFetcher.parseDecree(sloppy, "u")
    // the first unclosed <p> must NOT swallow the rest of the document
    assert(d.signatures == "FULANO DE TAL;BELTRANO")
    // named accented + numeric entities decode like bs4's .text
    assert(d.agency == "MINISTÉRIO DA SAÚDE § 2")
  }
}
