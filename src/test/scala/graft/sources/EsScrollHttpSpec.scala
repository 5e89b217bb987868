package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.SparkSpec

/** LIVE-protocol Elasticsearch scroll test: a canned scroll API served from
  * an in-JVM HTTP endpoint (the embedded-Derby move applied to ES — fake
  * SERVER, real WIRE). The client under test speaks real HTTP and real ES
  * response JSON; the fake honors the bool+range query, paginates via
  * scroll_id, injects one transient timed_out page, can fail a shard
  * mid-scroll, and records clear_scroll calls.
  */
class EsScrollHttpSpec extends SparkSpec {

  // ---- the canned corpus: 23 docs, dates interleaved across the range
  private case class Doc(id: Int, cnes: String, date: String)
  private val docs = (0 until 23).map { i =>
    Doc(i, if (i % 3 == 0) "111" else "222", f"2026-07-${(i % 28) + 1}%02d")
  }

  /** One fake server instance = one scenario. `failShardAtPage` injects a
    * `_shards.failed=1` response at that scroll page; `overstateTotal`
    * reports an inflated hits.total to trip reconciliation.
    */
  private final class FakeEs(pageSize: Int = 5,
      failShardAtPage: Int = -1, overstateTotal: Boolean = false) {
    val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)
    @volatile var matched: Seq[Doc] = Nil
    @volatile var timedOutServed = false
    @volatile var pagesServed = 0
    @volatile var clearCalls = 0
    @volatile var clearedIds: Seq[String] = Nil
    @volatile var attemptsPerCursor = Map.empty[String, Int]

    private def reply(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, b.length)
      val os = ex.getResponseBody
      try os.write(b) finally os.close()
      ex.close()
    }

    private def readBody(ex: HttpExchange): String =
      new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

    private def pageJson(page: Int): String = {
      val total = if (overstateTotal) matched.size * 2 else matched.size
      val slice = matched.slice(page * pageSize, (page + 1) * pageSize)
      val hits = slice.map(d =>
        s"""{"_index":"sisreg","_id":"${d.id}","_source":{"id":${d.id},"cnes":"${d.cnes}","data_solicitacao":"${d.date}"}}""")
      val failed = if (page == failShardAtPage) 1 else 0
      s"""{"_scroll_id":"cur-${page + 1}","took":3,"timed_out":false,
         |"_shards":{"total":5,"successful":${5 - failed},"skipped":0,"failed":$failed},
         |"hits":{"total":{"value":$total,"relation":"eq"},
         |"hits":[${hits.mkString(",")}]}}""".stripMargin
    }

    @volatile var initialAttempts = 0
    @volatile var sawTrackTotalHits = false

    server.createContext("/sisreg/_search", { ex =>
      val body = JsonMethods.parse(readBody(ex))
      sawTrackTotalHits = (body \ "track_total_hits") == JBool(true)
      // one transient timeout on the INITIAL search, first attempt: a
      // fresh search consumes nothing, so the client must re-issue it
      initialAttempts += 1
      if (initialAttempts == 1 && failShardAtPage < 0) {
        timedOutServed = true
        reply(ex, 200,
          """{"_scroll_id":"cur-0","timed_out":true,
            |"_shards":{"total":5,"successful":5,"skipped":0,"failed":0},
            |"hits":{"total":{"value":0,"relation":"eq"},"hits":[]}}""".stripMargin)
      } else {
      // honor the query: every must clause filters the canned corpus
      val musts = (body \ "query" \ "bool" \ "must") match {
        case JArray(ms) => ms
        case _ => Nil
      }
      var selected = docs
      musts.foreach { m =>
        (m \ "match") match {
          case JObject(fields) => fields.foreach {
            case ("cnes", JString(v)) => selected = selected.filter(_.cnes == v)
            case _ => ()
          }
          case _ => ()
        }
        (m \ "range" \ "data_solicitacao") match {
          case JObject(_) =>
            val gte = (m \ "range" \ "data_solicitacao" \ "gte") match {
              case JString(s) => s; case _ => "0000"
            }
            val lte = (m \ "range" \ "data_solicitacao" \ "lte") match {
              case JString(s) => s; case _ => "9999"
            }
            selected = selected.filter(d => d.date >= gte && d.date <= lte)
          case _ => ()
        }
      }
      matched = selected
      pagesServed += 1
      reply(ex, 200, pageJson(0))
      }
    })

    server.createContext("/_search/scroll", { ex =>
      if (ex.getRequestMethod == "DELETE") {
        clearCalls += 1
        clearedIds = (JsonMethods.parse(readBody(ex)) \ "scroll_id") match {
          case JArray(ids) => ids.collect { case JString(s) => s }
          case _ => Nil
        }
        reply(ex, 200, """{"succeeded":true}""")
      } else {
        val id = (JsonMethods.parse(readBody(ex)) \ "scroll_id") match {
          case JString(s) => s; case _ => ""
        }
        val n = attemptsPerCursor.getOrElse(id, 0) + 1
        attemptsPerCursor += (id -> n)
        val page = id.stripPrefix("cur-").toInt
        // scroll calls are FORWARD-ONLY like real ES: each one serves the
        // next batch regardless of retries. Page 2 carries timed_out=true
        // WITH its hits — the client must accept them, not re-fetch (a
        // re-fetch would consume page 3 and lose this page's rows).
        pagesServed += 1
        val base = pageJson(page)
        val served = if (page == 2 && failShardAtPage < 0)
          base.replace("\"timed_out\":false", "\"timed_out\":true")
        else base
        reply(ex, 200, served)
      }
    })

    server.start()
    def url: String = s"http://localhost:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("buildQuery emits the reference's bool(match+range) body") {
    val q = JsonMethods.parse(EsScrollReader.buildQuery(1000,
      Map("cnes" -> "111"), "data_solicitacao", "2026-07-01", "2026-07-31"))
    assert((q \ "size") == JInt(1000))
    val musts = (q \ "query" \ "bool" \ "must").asInstanceOf[JArray].arr
    assert(musts.exists(m => (m \ "match" \ "cnes") == JString("111")))
    assert(musts.exists(m =>
      (m \ "range" \ "data_solicitacao" \ "gte") == JString("2026-07-01") &&
        (m \ "range" \ "data_solicitacao" \ "time_zone") == JString("-03:00")))
  }

  test("full paginate+reconcile loop over live HTTP: initial timeout re-issued, timed-out scroll page's hits ACCEPTED") {
    val es = new FakeEs(pageSize = 5)
    try {
      val q = EsScrollReader.buildQuery(5, Map.empty,
        "data_solicitacao", "2026-07-01", "2026-07-28")
      val Some(ext) = EsScrollReader.fullExtract(es.url, "sisreg", q)
      // 23 rows even though scroll page 2 carried timed_out=true — its
      // hits were accepted (a same-cursor re-fetch on a forward-only
      // scroll would have consumed page 3 and LOST these rows)
      assert(ext.rows.size == 23 && ext.total == 23)
      // 23 docs at page size 5 = initial + 4 full/partial scrolls + the
      // empty terminator page
      assert(ext.pages == 6)
      // the timed-out INITIAL search was re-issued (fresh search, nothing
      // consumed); every scroll cursor was fetched exactly once
      assert(es.timedOutServed && es.initialAttempts == 2)
      assert(es.attemptsPerCursor.values.forall(_ == 1))
      // the query asked ES for the exact total (reconciliation depends on
      // relation=eq past 10k hits)
      assert(es.sawTrackTotalHits)
      // cursor cleanup happened with the ids the server issued
      assert(es.clearCalls == 1 && es.clearedIds.nonEmpty)
      // drained rows land distributed as a real DataFrame
      import spark.implicits._
      val df = spark.read.json(spark.createDataset(ext.rows))
      assert(df.count() == 23)
      assert(df.where("cnes = '111'").count() == 8)
    } finally es.stop()
  }

  test("match filter reaches the server and restricts the drained set") {
    val es = new FakeEs(pageSize = 4)
    try {
      val q = EsScrollReader.buildQuery(4, Map("cnes" -> "111"),
        "data_solicitacao", "2026-07-01", "2026-07-10")
      val Some(ext) = EsScrollReader.fullExtract(es.url, "sisreg", q)
      // docs with cnes=111 (i%3==0) and date in 07-01..07-10:
      // i=0,3,6,9 -> dates 01,04,07,10
      assert(ext.rows.size == 4 && ext.total == 4)
    } finally es.stop()
  }

  test("a shard failure mid-scroll is FATAL: no retry, loud error") {
    val es = new FakeEs(pageSize = 5, failShardAtPage = 2)
    try {
      val q = EsScrollReader.buildQuery(5, Map.empty,
        "data_solicitacao", "2026-07-01", "2026-07-28")
      val e = intercept[EsScrollReader.ShardFailureException] {
        EsScrollReader.fullExtract(es.url, "sisreg", q)
      }
      assert(e.getMessage.contains("failed=1"))
      // fatal short-circuit: the failing cursor was fetched exactly once
      assert(es.attemptsPerCursor("cur-2") == 1)
      // cleanup runs on the FAILURE path too — no leaked scroll context
      assert(es.clearCalls == 1 && es.clearedIds.nonEmpty)
    } finally es.stop()
  }

  test("±5% count reconciliation trips when the server total disagrees") {
    val es = new FakeEs(pageSize = 5, overstateTotal = true)
    try {
      val q = EsScrollReader.buildQuery(5, Map.empty,
        "data_solicitacao", "2026-07-01", "2026-07-28")
      val e = intercept[IllegalArgumentException] {
        EsScrollReader.fullExtract(es.url, "sisreg", q)
      }
      assert(e.getMessage.contains("count reconciliation failed"))
    } finally es.stop()
  }

  test("an empty range returns None (the reference's SKIP), not an error") {
    val es = new FakeEs(pageSize = 5)
    try {
      val q = EsScrollReader.buildQuery(5, Map.empty,
        "data_solicitacao", "2031-01-01", "2031-01-02")
      assert(EsScrollReader.fullExtract(es.url, "sisreg", q).isEmpty)
    } finally es.stop()
  }
}
