package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.SparkSpec

/** LIVE-protocol proxy-API test: an in-JVM HTTP server plays the
  * cloud-function proxy (bearer auth, JSON payload envelope, the GCS-style
  * large-body hand-off served from a second context on the same server)
  * and the per-CNES extraction loop runs against it end-to-end, including
  * the fault-isolation paths.
  */
class ProxyApiHttpSpec extends SparkSpec {

  private final class FakeProxy {
    val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)
    @volatile var sawPayloads: List[JValue] = Nil
    @volatile var handOffFetches = 0
    private val token = "id-token-xyz"

    private def reply(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, b.length)
      val os = ex.getResponseBody
      try os.write(b) finally os.close()
      ex.close()
    }

    // the "GCS" side of the hand-off: parked large bodies
    server.createContext("/gcs/big-batch.json", { ex =>
      handOffFetches += 1
      reply(ex, 200,
        """[{"id":201,"v":"g1"},{"id":202,"v":"g2"},{"id":203,"v":"g3"}]""")
    })

    server.createContext("/proxy", { ex =>
      if (ex.getRequestHeaders.getFirst("Authorization") != s"Bearer $token")
        reply(ex, 403, """{"error":"bad token"}""")
      else {
        val payload = JsonMethods.parse(new String(
          ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
        sawPayloads = sawPayloads :+ payload
        val cnes = (payload \ "query_params" \ "cnes") match {
          case JString(s) => s; case _ => ""
        }
        cnes match {
          case "111" => reply(ex, 200,
            """{"status_code":200,"body":[{"id":1,"v":"a"},{"id":2,"v":"b"}]}""")
          case "222" => reply(ex, 200,
            s"""{"status_code":200,"gcs_url":"$url/gcs/big-batch.json"}""")
          case "503" => reply(ex, 200,
            """{"status_code":503,"body":"upstream maintenance"}""")
          case "boom" => reply(ex, 500, """{"error":"proxy crashed"}""")
          case _ => reply(ex, 200, """{"status_code":404,"body":"no such cnes"}""")
        }
      }
    })

    server.start()
    def url: String = s"http://localhost:${server.getAddress.getPort}"
    def bearer: String = token
    def stop(): Unit = server.stop(0)
  }

  private def callFor(p: FakeProxy, targetDate: String)(cnes: String) =
    ProxyApiReader.proxyRequest(s"${p.url}/proxy", p.bearer,
      ProxyApiReader.proxyPayload(
        "https://apto.example/api/pacientes", "GET",
        Map("date" -> targetDate, "cnes" -> cnes), Map.empty, None,
        Some(JObject("username" -> JString("svc"), "password" -> JString("pw"))),
        endpointForFilename = Some("pacientes")))

  test("payload carries the reference's envelope fields and the filename descriptor") {
    val j = JsonMethods.parse(ProxyApiReader.proxyPayload(
      "https://x/api", "GET", Map("cnes" -> "111"), Map("h" -> "1"),
      Some(JObject("a" -> JInt(1))), Some(JString("cred")),
      endpointForFilename = Some("pacientes")))
    assert((j \ "tipo_api") == JString("json"))
    assert((j \ "request_type") == JString("GET"))
    assert((j \ "query_params" \ "_endpoint_for_filename") == JString("pacientes"))
    // dict body pre-serializes to a STRING under api_type json
    assert((j \ "body_params") == JString("""{"a":1}"""))
  }

  test("per-entity loop over live HTTP: inline body, GCS hand-off, fault isolation") {
    val p = new FakeProxy
    try {
      val (data, logs) = ProxyApiReader.extractPerEntity(
        Seq("111", "222", "503", "boom"), callFor(p, "2026-08-01"))
      // 111 inline (2 rows) and 222 via hand-off (3 rows) succeeded
      assert(data.map(_._1) == Seq("111", "222"))
      assert(data.toMap.apply("111").size == 2)
      assert(data.toMap.apply("222") ==
        Seq("""{"id":201,"v":"g1"}""", """{"id":202,"v":"g2"}""", """{"id":203,"v":"g3"}"""))
      assert(p.handOffFetches == 1)
      // 503 = envelope failure, boom = proxy failure — both logged, loop continued
      val byEntity = logs.map(l => l.entity -> l).toMap
      assert(byEntity("111").success && byEntity("222").success)
      assert(!byEntity("503").success && byEntity("503").result.contains("503"))
      assert(!byEntity("boom").success && byEntity("boom").result.contains("IOException"))
      // every proxied payload carried the target url + credential
      assert(p.sawPayloads.size == 4)
      assert(p.sawPayloads.forall(pl =>
        (pl \ "url") == JString("https://apto.example/api/pacientes") &&
          (pl \ "credential" \ "username") == JString("svc")))
      // landing: the reference's column set, payload distributed + parseable
      val df = ProxyApiReader.toLandingFrame(spark, data, ap = "AP32",
        targetDate = "2026-08-01", endpointName = "pacientes",
        loadedAt = java.sql.Timestamp.valueOf("2026-08-01 12:00:00"))
      assert(df.columns.toSeq == Seq("data", "_source_cnes", "_source_ap",
        "_target_date", "_endpoint", "_loaded_at"))
      assert(df.count() == 5)
      val parsed = spark.read.json(
        df.select("data").as(org.apache.spark.sql.Encoders.STRING))
      assert(parsed.agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0)
        == (1 + 2 + 201 + 202 + 203))
    } finally p.stop()
  }

  test("a bad bearer token is a proxy-level failure") {
    val p = new FakeProxy
    try {
      intercept[java.io.IOException] {
        ProxyApiReader.proxyRequest(s"${p.url}/proxy", "wrong-token",
          ProxyApiReader.proxyPayload("https://x", "GET",
            Map("cnes" -> "111"), Map.empty, None, None))
      }
    } finally p.stop()
  }

  test("non-HTTP hand-off URLs demand a storage-client lambda") {
    intercept[IllegalArgumentException] {
      ProxyApiReader.httpFetch("gs://bucket/blob.json")
    }
  }
}
