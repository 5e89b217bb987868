package graft.sources

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.SparkSpec

/** LIVE-protocol Metabase MBQL test: a canned Metabase API served from an
  * in-JVM HTTP endpoint. The fake authenticates sessions, decodes the
  * form-encoded MBQL body, evaluates min/max/count aggregations and
  * half-open slice filters over an in-memory table, and answers CSV —
  * the wire surface the reference flow consumes.
  */
class MetabaseHttpSpec extends SparkSpec {

  // canned table: 347 rows, ids 100..446, NON-unique variant repeats each
  // id 3 times
  private case class Row(id: Long, nome: String)
  private val rows = (0 until 347).map(i => Row(100L + i, s"n$i"))

  private final class FakeMetabase(table: Seq[Row], rowCap: Long = 1000000L) {
    val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)
    @volatile var sliceQueries = 0
    @volatile var badAuth = 0
    private val token = "tok-abc123"

    private def reply(ex: HttpExchange, code: Int, body: String,
        ct: String = "text/csv"): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", ct)
      ex.sendResponseHeaders(code, b.length)
      val os = ex.getResponseBody
      try os.write(b) finally os.close()
      ex.close()
    }

    server.createContext("/api/session", { ex =>
      val body = JsonMethods.parse(
        new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
      if ((body \ "username") == JString("svc") &&
          (body \ "password") == JString("pw"))
        reply(ex, 200, s"""{"id":"$token"}""", "application/json")
      else reply(ex, 401, """{"error":"bad credentials"}""", "application/json")
    })

    server.createContext("/api/dataset/csv", { ex =>
      if (ex.getRequestHeaders.getFirst("X-Metabase-Session") != token) {
        badAuth += 1
        reply(ex, 401, "Unauthenticated", "text/plain")
      } else {
        val form = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        val mbql = JsonMethods.parse(URLDecoder.decode(
          form.stripPrefix("query="), StandardCharsets.UTF_8))
        val q = mbql \ "query"
        val agg = (q \ "aggregation") match {
          case JArray(List(JArray(JString(kind) :: _))) => Some(kind)
          case _ => None
        }
        agg match {
          case Some(_) if table.isEmpty =>
            reply(ex, 200, "agg\n") // empty aggregate: header, no data row
          case Some("min") => reply(ex, 200, s"min\n${table.map(_.id).min}")
          case Some("max") => reply(ex, 200, s"max\n${table.map(_.id).max}")
          case Some("count") => reply(ex, 200, s"count\n${table.size}")
          case _ =>
            // half-open slice filter ["and", [">=", f, lo], ["<", f, hi]]
            val bounds = (q \ "filter") match {
              case JArray(JString("and") :: cs) => cs.map {
                case JArray(List(JString(op), _, v)) =>
                  val n = v match {
                    case JInt(x) => x.toLong; case JString(s) => s.toLong
                    case other => fail(s"bad bound $other")
                  }
                  (op, n)
                case other => fail(s"bad clause $other")
              }
              case other => fail(s"fake needs an and-filter, got $other")
            }
            val lo = bounds.collectFirst { case (">=", n) => n }.get
            val hi = bounds.collectFirst { case ("<", n) => n }.get
            sliceQueries += 1
            val hit = table.filter(r => r.id >= lo && r.id < hi).take(rowCap.toInt)
            reply(ex, 200,
              ("id,nome" +: hit.map(r => s"${r.id},${r.nome}")).mkString("\n"))
        }
      }
    })

    server.start()
    def url: String = s"http://localhost:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("session auth: good credentials yield a token, bad ones fail loudly") {
    val mb = new FakeMetabase(rows)
    try {
      assert(MetabaseReader.sessionToken(mb.url, "svc", "pw") == "tok-abc123")
      intercept[java.io.IOException](
        MetabaseReader.sessionToken(mb.url, "svc", "wrong"))
    } finally mb.stop()
  }

  test("an expired token is rejected by the dataset endpoint") {
    val mb = new FakeMetabase(rows)
    try {
      intercept[java.io.IOException] {
        MetabaseReader.datasetCsv(mb.url, "stale-token",
          MetabaseReader.countQuery(3, 7))
      }
      assert(mb.badAuth == 1)
    } finally mb.stop()
  }

  test("slice-union ≡ table over live HTTP: min/max probe, half-open slices, no boundary dupes") {
    val mb = new FakeMetabase(rows)
    try {
      val token = MetabaseReader.sessionToken(mb.url, "svc", "pw")
      val csvs = MetabaseReader.extractAll(mb.url, token, databaseId = 3,
        tableId = 7, columnId = BigInt(42), columnType = "Integer",
        sliceSize = 100, sliceColumnUnique = true)
      // 347 ids spanning [100, 447) at size 100 -> 4 slices
      assert(csvs.size == 4 && mb.sliceQueries == 4)
      // land distributed: one CSV body per slice, header-stripped via Spark
      import spark.implicits._
      val all = csvs.flatMap(_.split("\n").drop(1)).toDS()
      val df = spark.read.schema("id BIGINT, nome STRING").csv(all)
      assert(df.count() == 347) // half-open slices: every row exactly once
      assert(df.select("id").distinct().count() == 347)
      assert(df.agg(org.apache.spark.sql.functions.min("id"),
        org.apache.spark.sql.functions.max("id")).head() ==
        org.apache.spark.sql.Row(100L, 446L))
    } finally mb.stop()
  }

  test("non-unique slice column shrinks the slice size by lines-per-id") {
    // reference-parity form (divisor = slice size):
    assert(MetabaseReader.adjustSliceSize(900, 300) == 100)
    assert(MetabaseReader.adjustSliceSize(250, 300) == 300)
    assert(MetabaseReader.adjustSliceSize(1000000, 7) == 1)
    // exact form (divisor = id span): 100k ids x 1000 rows each, slice
    // 1M rows -> 1000 ids per slice, NOT the reference's 10k
    assert(MetabaseReader.adjustSliceSizeBySpan(100000000L, 100000L, 1000000) == 1000)
    assert(MetabaseReader.adjustSliceSizeBySpan(250, 1000, 300) == 300)
  }

  test("quote-aware CSV row count: embedded newlines are content, not rows") {
    val csv = "id,nome\n1,\"multi\nline\nvalue\"\n2,plain\n"
    assert(MetabaseReader.csvRowCount(csv) == 2)
    assert(MetabaseReader.csvRowCount("id,nome\n") == 0)
    assert(MetabaseReader.csvRowCount("id,nome") == 0)
    // escaped quotes toggle twice and cancel
    assert(MetabaseReader.csvRowCount("id,n\n1,\"say \"\"hi\"\"\"\n2,x") == 2)
  }

  test("scalar parse: header-only is None, an unparseable data row is LOUD") {
    // truly empty aggregate cell → no slices (the reference's empty window)
    assert(MetabaseReader.firstDataValueOpt("min\n") == None)
    assert(MetabaseReader.firstDataValueOpt("min") == None)
    assert(MetabaseReader.firstDataValueOpt("min\n42\n") == Some(42L))
    // a PRESENT data row the \n(\d+) regex cannot parse must throw, not
    // silently collapse the extraction to zero slices — the reference's
    // .group(1) on a failed search fails loudly too
    intercept[IllegalArgumentException](
      MetabaseReader.firstDataValueOpt("min\n-5\n"))
    intercept[IllegalArgumentException](
      MetabaseReader.firstDataValueOpt("min\nabc\n"))
  }

  test("an empty window is a result, not an error") {
    val mb = new FakeMetabase(Nil)
    try {
      val token = MetabaseReader.sessionToken(mb.url, "svc", "pw")
      assert(MetabaseReader.extractAll(mb.url, token, databaseId = 3,
        tableId = 7, columnId = BigInt(42), columnType = "Integer",
        sliceSize = 100, sliceColumnUnique = true) == Nil)
      assert(mb.sliceQueries == 0)
    } finally mb.stop()
  }

  test("a slice at the row cap fails the truncation guard") {
    val mb = new FakeMetabase(rows, rowCap = 100)
    try {
      val token = MetabaseReader.sessionToken(mb.url, "svc", "pw")
      val e = intercept[IllegalArgumentException] {
        MetabaseReader.extractAll(mb.url, token, databaseId = 3, tableId = 7,
          columnId = BigInt(42), columnType = "Integer", sliceSize = 100,
          sliceColumnUnique = true, rowCap = 100)
      }
      assert(e.getMessage.contains("truncated"))
    } finally mb.stop()
  }

  test("MBQL bodies carry the reference's shapes") {
    val mm = JsonMethods.parse(MetabaseReader.minMaxQuery(3, 7, "min", BigInt(42)))
    assert((mm \ "query" \ "aggregation") == JsonMethods.parse(
      """[["min",["+",["-",["field",42,{"base-type":"type/Text"}],1],1]]]"""))
    val sf = JsonMethods.parse(
      MetabaseReader.sliceQuery(3, 7, BigInt(42), "Integer", 10, 20))
    assert((sf \ "query" \ "filter") == JsonMethods.parse(
      """["and",[">=",["field",42,{"base-type":"type/Integer"}],10],
        |["<",["field",42,{"base-type":"type/Integer"}],20]]""".stripMargin))
    // date window: and-combined >= start, < end
    val f = MetabaseReader.dateFilter(BigInt(5), Some("2026-01-01"), Some("2026-02-01"))
    assert(f == JsonMethods.parse(
      """["and",[">=",["field",5,{"base-type":"type/DateTime"}],"2026-01-01"],
        |["<",["field",5,{"base-type":"type/DateTime"}],"2026-02-01"]]""".stripMargin))
    assert(MetabaseReader.dateFilter(BigInt(5), None, None) == JNothing)
  }
}
