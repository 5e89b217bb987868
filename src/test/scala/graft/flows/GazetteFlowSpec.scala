package graft.flows

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.HtmlFunctions
import graft.sources.DorjFetcher

/** END-TO-END gazette flow: the reference's diario_oficial_rj pipeline
  * shape run whole — live listing fetch (search JSON → edition ids →
  * folder-tree walk) → per-article content fetch over HTTP → the
  * codegen'd HTML block parse → `Ingest.landJsonPayload` distributed
  * landing → Spark reading the landed table back and querying it. Each
  * stage is spec'd in isolation elsewhere; this pins that they COMPOSE:
  * acquisition hands the engine exactly what the landing expects, and the
  * landed shape is queryable by the q52-class analysis.
  */
class GazetteFlowSpec extends SparkSpec {

  private val treeHtml =
    """<ul id="tree">
      | <li><span class="folder">Atos do Prefeito</span>
      |  <ul>
      |   <li><span class="folder">DECRETOS N</span>
      |    <ul>
      |     <li><span class="file"><a class="linkMateria" identificador="9001">DECRETO RIO N 100</a></span>
      |     <li><span class="file"><a class="linkMateria" identificador="9002">DECRETO RIO N 101</a></span>
      |    </ul>
      |   </li>
      |  </ul>
      | </li>
      |</ul>""".stripMargin // note: file <li>s use IMPLIED closes

  private def articleHtml(id: String): String =
    s"""<html><body>
       |<p>DECRETO RIO N $id</p>
       |<p>Art. 1 Fica criado o programa $id.</p>
       |<p>Art. 2 Esta norma entra em vigor.</p>
       |</body></html>""".stripMargin

  private final class FakeGazette {
    val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)
    private def reply(ex: HttpExchange, body: String, ct: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", ct)
      ex.sendResponseHeaders(200, b.length)
      val os = ex.getResponseBody
      try os.write(b) finally os.close()
      ex.close()
    }
    server.createContext("/busca/", { ex =>
      reply(ex, """{"aggregations":{"Edicoes":{"buckets":[{"key":7001}]}}}""",
        "application/json")
    })
    server.createContext("/portal/visualizacoes/view_html_diario/", { ex =>
      reply(ex, treeHtml, "text/html")
    })
    server.createContext("/apifront/portal/edicoes/publicacoes_ver_conteudo/", { ex =>
      reply(ex, articleHtml(ex.getRequestURI.getPath.split("/").last),
        "text/html")
    })
    server.start()
    def url = s"http://localhost:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("listing → content → HTML parse → distributed landing → query, whole chain") {
    val srv = new FakeGazette
    val dir = java.nio.file.Files.createTempDirectory("gazette").toString + "/t"
    try {
      // 1. acquisition (driver-side, bounded by a day's gazette)
      val ids = DorjFetcher.currentDoIdentifiers(srv.url, "2026-08-14",
        backoff = _ => ())
      val articles = ids.flatMap { case (doId, date) =>
        DorjFetcher.articleNamesIds(srv.url, doId, backoff = _ => ())
          .flatMap { case (secao, titulo, articleId) =>
            articleId.flatMap(aid =>
              DorjFetcher.articleContent(srv.url, aid, backoff = _ => ())
                .map(html => (doId, date, secao, titulo, aid, html)))
          }
      }
      assert(articles.size == 2)

      // 2. distributed landing: raw payload packed beside source metadata
      import spark.implicits._
      val src = articles.toDF("do_id", "do_data", "secao", "titulo",
        "materia_id", "html")
      Ingest.landJsonPayload(src,
        payloadCols = Seq("secao", "titulo", "html"),
        metadata = Map("_source" -> lit("dorj")),
        targetDate = "2026-08-14",
        stamp = Ingest.RunStamp("run-gz",
          Timestamp.valueOf("2026-08-14 06:00:00")),
        path = dir)

      // 3. the landed table reads back partition-pruned and the payload
      // parses with the same codegen'd block pipeline as q52
      val landed = spark.read.parquet(dir)
        .filter(col("data_particao") === "2026-08-14")
      assert(landed.count() == 2)
      val parsed = landed
        .withColumn("html", get_json_object(col("data"), "$.html"))
        .withColumn("titulo", get_json_object(col("data"), "$.titulo"))
        .select(col("titulo"),
          HtmlFunctions.htmlBlocks(col("html")).as("blocks"))
      val rows = parsed.collect().map(r =>
        r.getString(0) -> r.getSeq[String](1)).toMap
      assert(rows.keySet == Set("DECRETO RIO N 100", "DECRETO RIO N 101"))
      // three <p> blocks per article, inner text intact through the
      // JSON-pack round trip
      assert(rows("DECRETO RIO N 100").size == 3)
      assert(rows("DECRETO RIO N 100")
        .exists(_.contains("Fica criado o programa 9001")))
    } finally srv.stop()
  }
}
