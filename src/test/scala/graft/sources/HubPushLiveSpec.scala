package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.SparkSpec

/** LIVE-protocol datalake-hub push: the fake API speaks the reference's
  * two endpoints (form-encoded auth/token, bearer-gated write/{asset})
  * and the spec asserts the all-string records-orient payload.
  */
class HubPushLiveSpec extends SparkSpec {
  import spark.implicits._

  private final class FakeHub {
    val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)
    @volatile var written: Map[String, JValue] = Map.empty
    @volatile var badAuthCalls = 0
    private val token = "hub-tok-1"

    private def reply(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, b.length)
      val os = ex.getResponseBody
      try os.write(b) finally os.close()
      ex.close()
    }

    server.createContext("/auth/token", { ex =>
      val form = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      if (form.contains("username=svc") && form.contains("password=p%26w"))
        reply(ex, 200, s"""{"access_token":"$token","token_type":"bearer"}""")
      else reply(ex, 401, """{"detail":"bad credentials"}""")
    })

    server.createContext("/write/", { ex =>
      if (ex.getRequestHeaders.getFirst("Authorization") != s"Bearer $token") {
        badAuthCalls += 1
        reply(ex, 401, """{"detail":"unauthorized"}""")
      } else {
        val asset = ex.getRequestURI.getPath.stripPrefix("/write/")
        written += asset -> JsonMethods.parse(new String(
          ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
        reply(ex, 201, """{"status":"loaded","rows":2}""")
      }
    })

    server.start()
    def url = s"http://localhost:${server.getAddress.getPort}/"
    def stop(): Unit = server.stop(0)
  }

  test("auth + records push over live HTTP: all-string records-orient payload, 201-only success") {
    val hub = new FakeHub
    try {
      // & in the password exercises the form encoding
      val token = HubPushWriter.authenticate(hub.url, "svc", "p&w")
      val df = Seq((1, "Ana", 3.5), (2, "Bia", 4.0)).toDF("id", "nome", "score")
      val report = HubPushWriter.loadAsset(hub.url, token, "asset-17", df)
      assert(report.contains("loaded"))
      val recs = hub.written("asset-17").asInstanceOf[JArray].arr
      assert(recs.size == 2)
      // astype(str) semantics: every value serialized as a STRING
      assert((recs.head \ "id") == JString("1"))
      assert((recs.head \ "score") == JString("3.5"))
      assert((recs(1) \ "nome") == JString("Bia"))
    } finally hub.stop()
  }

  test("bad credentials and bad token fail loudly; non-201 write raises with the report") {
    val hub = new FakeHub
    try {
      val e1 = intercept[java.io.IOException](
        HubPushWriter.authenticate(hub.url, "svc", "wrong"))
      assert(e1.getMessage.contains("401"))
      val df = Seq((1, "x")).toDF("id", "v")
      val e2 = intercept[java.io.IOException](
        HubPushWriter.loadAsset(hub.url, "stale", "asset-17", df))
      assert(e2.getMessage.contains("Datalake Hub") && hub.badAuthCalls == 1)
    } finally hub.stop()
  }
}
