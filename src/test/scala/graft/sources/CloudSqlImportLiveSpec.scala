package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** LIVE-protocol CloudSQL-style import orchestration: an in-JVM admin API
  * with the real constraints — one operation at a time (409 on overlap),
  * operations that poll RUNNING before DONE, imports that must follow a
  * database delete — driven end-to-end by the sequential import loop.
  */
class CloudSqlImportLiveSpec extends AnyFunSuite {

  private final class FakeAdminApi(conflictOnFirstImport: Boolean = false) {
    val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)
    // each mutating call enqueues an operation that reports RUNNING for
    // one poll, then DONE
    @volatile var opPollsRemaining = 0
    @volatile var calls: List[String] = Nil
    @volatile var importedDbs: List[String] = Nil
    @volatile var patched = false
    private val importAttempts = new AtomicInteger(0)

    private def reply(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, b.length)
      val os = ex.getResponseBody
      try os.write(b) finally os.close()
      ex.close()
    }

    server.createContext("/", { ex: HttpExchange =>
      val path = ex.getRequestURI.toString
      val method = ex.getRequestMethod
      if (ex.getRequestHeaders.getFirst("Authorization") != "Bearer adm-tok")
        reply(ex, 401, """{"error":"unauthorized"}""")
      else if (path.startsWith("/operations")) {
        if (opPollsRemaining > 0) {
          opPollsRemaining -= 1
          reply(ex, 200, """{"items":[{"name":"op-1","status":"RUNNING"}]}""")
        } else reply(ex, 200, """{"items":[{"name":"op-1","status":"DONE"}]}""")
      } else {
        calls = calls :+ s"$method $path"
        if (method == "PATCH" && path.startsWith("/instances/")) {
          patched = true; opPollsRemaining = 1
          reply(ex, 200, """{"name":"op-patch"}""")
        } else if (method == "DELETE" && path.contains("/databases/")) {
          opPollsRemaining = 1
          reply(ex, 200, """{"name":"op-del"}""")
        } else if (method == "POST" && path.endsWith("/import")) {
          if (conflictOnFirstImport && importAttempts.incrementAndGet() == 1)
            reply(ex, 409, """{"error":"operationInProgress"}""")
          else {
            val body = JsonMethods.parse(new String(
              ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
            (body \ "importContext" \ "database") match {
              case JString(db) => importedDbs = importedDbs :+ db
              case _ => ()
            }
            opPollsRemaining = 1
            reply(ex, 200, """{"name":"op-imp"}""")
          }
        } else reply(ex, 404, """{"error":"no such endpoint"}""")
      }
    })

    server.start()
    def cfg: CloudSqlImporter.Config = CloudSqlImporter.Config(
      apiBase = s"http://localhost:${server.getAddress.getPort}",
      token = "adm-tok", pollIntervalMs = 1, settleMs = 1,
      sleeper = _ => ())
    def stop(): Unit = server.stop(0)
  }

  private val files = Seq(
    "HISTORICO_PEPVITA_RJ/AP10/vitacare_historic_2269953_20250301_034009.bak",
    "HISTORICO_PEPVITA_RJ/AP21/vitacare_historic_1112223_20250302_010101_old.bak",
    "rnds_vaccine_historic_20250303_020202.bak")

  test("full sequential run over live HTTP: instance forced on, delete-then-import per file, RUNNING polled to DONE") {
    val api = new FakeAdminApi
    try {
      val done = CloudSqlImporter.sendSequentialImports(api.cfg, files,
        bucketName = "backups", instanceName = "inst-1")
      assert(api.patched)
      // ASCII sort of the full paths: the two HISTORICO/ paths precede the
      // bare rnds file (uppercase H < lowercase r)
      assert(done.map(_._2) == Seq("vitacare_historic_2269953",
        "vitacare_historic_1112223", "rnds_historic"))
      assert(api.importedDbs == done.map(_._2).toList)
      // every import was preceded by its database's DELETE
      val seq = api.calls.filterNot(_.startsWith("PATCH"))
      assert(seq.grouped(2).forall {
        case List(del, imp) => del.startsWith("DELETE") && imp.endsWith("/import")
        case _ => false
      })
    } finally api.stop()
  }

  test("resume window and limit clamp like the reference") {
    assert(CloudSqlImporter.windowFiles(files, startFrom = 2, limitFiles = 0).size == 2)
    assert(CloudSqlImporter.windowFiles(files, startFrom = 0, limitFiles = 2).size == 2)
    // out-of-range resume ignores-and-warns back to the full list
    assert(CloudSqlImporter.windowFiles(files, startFrom = 99, limitFiles = 0).size == 3)
  }

  test("a 409 Conflict retries on the timer and then succeeds") {
    val api = new FakeAdminApi(conflictOnFirstImport = true)
    try {
      val done = CloudSqlImporter.sendSequentialImports(api.cfg,
        files.take(1), "backups", "inst-1")
      assert(done.size == 1 && api.importedDbs.size == 1)
    } finally api.stop()
  }

  test("guards: reserved/odd database names and unparseable filenames are loud") {
    intercept[IllegalArgumentException](CloudSqlImporter.checkDbName("master"))
    intercept[IllegalArgumentException](CloudSqlImporter.checkDbName("bad*name"))
    intercept[IllegalArgumentException](
      CloudSqlImporter.filenameInfo("weird/path/not_a_backup.txt"))
    assert(CloudSqlImporter.filenameInfo(files.head) ==
      (("vitacare_historic", Some("2269953"))))
    assert(CloudSqlImporter.filenameInfo(files(2)) == (("rnds_historic", None)))
  }
}
