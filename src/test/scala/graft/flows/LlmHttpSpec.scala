package graft.flows

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.SparkSpec
import graft.operators.LlmTransform

/** LIVE-protocol LLM transform: EXECUTORS call an in-JVM fake Gemini over
  * real HTTP from inside `classify`'s mapPartitions — the full
  * generateContent request/response cycle (key auth, contents/parts/text
  * body, candidates envelope), the bounded retry against a flaky row, and
  * the reference's flag/motivo parse on the answers.
  */
class LlmHttpSpec extends SparkSpec {
  import spark.implicits._

  private final class FakeGemini {
    val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)
    val attempts = new ConcurrentHashMap[String, Integer]()

    private def reply(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, b.length)
      val os = ex.getResponseBody
      try os.write(b) finally os.close()
      ex.close()
    }

    server.createContext("/v1beta/models/gemini-pro:generateContent", { ex =>
      val query = Option(ex.getRequestURI.getQuery).getOrElse("")
      if (!query.contains("key=k-test")) reply(ex, 403, """{"error":"bad key"}""")
      else {
        val j = JsonMethods.parse(new String(
          ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
        val text = (j \ "contents")(0) \ "parts" match {
          case JArray(JObject(f) :: _) =>
            f.collectFirst { case ("text", JString(t)) => t }.getOrElse("")
          case _ => ""
        }
        val n = attempts.merge(text, 1, (a, b) => a + b)
        // the doc mentioning "flaky" fails twice before answering
        if (text.contains("flaky") && n <= 2) reply(ex, 500, """{"error":"overloaded"}""")
        else {
          val verdict =
            if (text.contains("confirmado")) """{"flag": "1", "motivo": "Diagnóstico confirmado no relato"}"""
            else if (text.contains("descartado")) """{"flag": "0", "motivo": "Hipótese descartada"}"""
            else "resposta livre sem o formato pedido"
          val payload = JsonMethods.compact(JsonMethods.render(JObject(
            "candidates" -> JArray(List(JObject("content" -> JObject(
              "parts" -> JArray(List(JObject("text" -> JString(verdict)))))))))))
          reply(ex, 200, payload)
        }
      }
    })

    server.start()
    def url: String = s"http://localhost:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("executors classify over live HTTP; retry absorbs a flaky row; flag/motivo parse matches the reference") {
    val g = new FakeGemini
    try {
      val docs = Seq(
        (1L, "relato: diagnóstico confirmado em consulta"),
        (2L, "relato: quadro descartado após exame"),
        (3L, "relato flaky com instabilidade — confirmado depois"),
        (4L, "texto aleatório")).toDF("id", "text").repartition(4)
      val client = LlmTransform.GeminiClient(
        g.url, "gemini-pro", "k-test", prompt = "Classifique: ")
      val results = LlmTransform.classify(docs, "id", "text", client,
        maxRetries = 3).toDF()
      val parsed = LlmTransform.parseFlagMotivo(results, "raw")
        .select("id", "flag", "motivo", "attempts")
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getString(2), r.getInt(3)))).toMap
      assert(parsed(1L) == (("1", "Diagnóstico confirmado no relato", 1)))
      assert(parsed(2L) == (("0", "Hipótese descartada", 1)))
      // the flaky doc needed the full retry budget, then classified
      assert(parsed(3L)._1 == "1" && parsed(3L)._3 == 3)
      // free-text answer degrades to (empty flag, whole text) per the
      // reference's parse_result_row fallback
      assert(parsed(4L) == (("", "resposta livre sem o formato pedido", 1)))
    } finally g.stop()
  }

  test("parseFlagMotivo crosses CRLF answers like the Python reference") {
    val raw = Seq((1L, "{\"flag\": \"1\",\r\n \"motivo\": \"Conf.\"}"))
      .toDF("id", "raw")
    val row = LlmTransform.parseFlagMotivo(raw, "raw")
      .select("flag", "motivo").head()
    assert(row.getString(0) == "1" && row.getString(1) == "Conf.")
  }

  test("a wrong API key exhausts retries into an empty result, not a task failure") {
    val g = new FakeGemini
    try {
      val docs = Seq((9L, "qualquer")).toDF("id", "text")
      val bad = LlmTransform.GeminiClient(g.url, "gemini-pro", "k-wrong", "p: ")
      val out = LlmTransform.classify(docs, "id", "text", bad, maxRetries = 2)
        .collect()
      assert(out.length == 1 && out.head.raw == "" && out.head.attempts == 2)
    } finally g.stop()
  }
}
