package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.SparkSpec
import graft.flows.Ingest

/** End-to-end ES flow: acquisition → landing → query, the same whole-chain
  * treatment `MongoFlowSpec` and `GazetteFlowSpec` give their source
  * families. An in-JVM fake serves the REAL scroll protocol (initial
  * search honoring the bool+range query, forward-only scroll pagination,
  * one transient initial timeout, clear-scroll accounting); the engine
  * side runs the REAL chain: `EsScrollReader.fullExtract` (scrollAll +
  * reconciliation) → `Ingest.landJsonPayload` → partition-pruned parquet
  * read-back that must equal the fake's corpus row-for-row.
  */
class EsFlowSpec extends SparkSpec {

  private case class Doc(id: Int, cnes: String, date: String, value: Long)
  private val corpus = (0 until 57).map { i =>
    Doc(i, if (i % 3 == 0) "111" else "222",
      f"2026-07-${(i % 28) + 1}%02d", i.toLong * 10)
  }

  /** Minimal live-protocol ES fake: query-honoring initial search, one
    * transient initial `timed_out` (a fresh search consumes nothing — the
    * client must re-issue), forward-only scroll pages, DELETE clear-scroll.
    */
  private final class FakeEs(pageSize: Int) {
    val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)
    @volatile var matched: Seq[Doc] = Nil
    @volatile var initialAttempts = 0
    @volatile var clearCalls = 0

    private def reply(ex: HttpExchange, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, b.length)
      val os = ex.getResponseBody
      try os.write(b) finally os.close()
      ex.close()
    }

    private def pageJson(page: Int): String = {
      val slice = matched.slice(page * pageSize, (page + 1) * pageSize)
      val hits = slice.map(d =>
        s"""{"_index":"sisreg","_id":"${d.id}","_source":{"id":${d.id},"cnes":"${d.cnes}","data_solicitacao":"${d.date}","value":${d.value}}}""")
      s"""{"_scroll_id":"cur-${page + 1}","took":2,"timed_out":false,
         |"_shards":{"total":3,"successful":3,"skipped":0,"failed":0},
         |"hits":{"total":{"value":${matched.size},"relation":"eq"},
         |"hits":[${hits.mkString(",")}]}}""".stripMargin
    }

    server.createContext("/sisreg/_search", { ex =>
      val body = JsonMethods.parse(
        new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
      initialAttempts += 1
      if (initialAttempts == 1) {
        reply(ex,
          """{"_scroll_id":"cur-0","timed_out":true,
            |"_shards":{"total":3,"successful":3,"skipped":0,"failed":0},
            |"hits":{"total":{"value":0,"relation":"eq"},"hits":[]}}""".stripMargin)
      } else {
        var selected = corpus
        (body \ "query" \ "bool" \ "must") match {
          case JArray(ms) => ms.foreach { m =>
            (m \ "match" \ "cnes") match {
              case JString(v) => selected = selected.filter(_.cnes == v)
              case _ => ()
            }
            (m \ "range" \ "data_solicitacao" \ "gte") match {
              case JString(gte) => selected = selected.filter(_.date >= gte)
              case _ => ()
            }
            (m \ "range" \ "data_solicitacao" \ "lte") match {
              case JString(lte) => selected = selected.filter(_.date <= lte)
              case _ => ()
            }
          }
          case _ => ()
        }
        matched = selected
        reply(ex, pageJson(0))
      }
    })

    server.createContext("/_search/scroll", { ex =>
      if (ex.getRequestMethod == "DELETE") {
        clearCalls += 1
        reply(ex, """{"succeeded":true}""")
      } else {
        val id = (JsonMethods.parse(new String(
          ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
          \ "scroll_id") match {
          case JString(s) => s; case _ => ""
        }
        reply(ex, pageJson(id.stripPrefix("cur-").toInt))
      }
    })

    server.start()
    def url: String = s"http://localhost:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("acquisition → landJsonPayload → partition-pruned read-back ≡ the " +
    "fake's corpus, whole chain") {
    val es = new FakeEs(pageSize = 7)
    val dir = java.nio.file.Files.createTempDirectory("esflow").toString + "/t"
    try {
      // 1. live-protocol acquisition: scroll to exhaustion through the
      // transient initial timeout, ±5% reconciliation against hits.total
      val q = EsScrollReader.buildQuery(7, Map.empty,
        "data_solicitacao", "2026-07-01", "2026-07-28")
      val Some(ext) = EsScrollReader.fullExtract(es.url, "sisreg", q)
      assert(ext.rows.size == corpus.size && ext.total == corpus.size)
      assert(es.initialAttempts == 2) // timed-out initial search re-issued
      assert(es.clearCalls == 1)      // cursor cleanup happened

      // 2. distributed landing: the drained _source strings pack into a
      // JSON `data` column beside source metadata, under the target date
      import spark.implicits._
      Ingest.landJsonPayload(
        spark.read.json(spark.createDataset(ext.rows)),
        payloadCols = Seq("id", "cnes", "data_solicitacao", "value"),
        metadata = Map("_source" -> lit("sisreg_api")),
        targetDate = "2026-08-14",
        stamp = Ingest.RunStamp("run-es",
          Timestamp.valueOf("2026-08-14 06:00:00")),
        path = dir)

      // 3. partition-pruned read-back: the date filter must prune at the
      // SCAN (PartitionFilters), not post-filter a full read
      val landed = spark.read.parquet(dir)
        .filter(col("data_particao") === "2026-08-14")
      val plan = landed.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [") &&
        plan.contains("data_particao"), plan)

      // 4. the flattened payload is EXACTLY the fake's corpus
      val flat = landed.select(
          get_json_object(col("data"), "$.id").cast("int").as("id"),
          get_json_object(col("data"), "$.cnes").as("cnes"),
          get_json_object(col("data"), "$.data_solicitacao").as("date"),
          get_json_object(col("data"), "$.value").cast("long").as("value"))
        .collect()
        .map(r => Doc(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(_.id).toSeq
      assert(flat == corpus)
      // metadata and audit stamps landed beside the payload
      assert(landed.select("_source").distinct().collect()
        .map(_.getString(0)).toSeq == Seq("sisreg_api"))
      assert(landed.select("run_id").distinct().collect()
        .map(_.getString(0)).toSeq == Seq("run-es"))
    } finally es.stop()
  }

  test("a filtered acquisition lands only the matching slice") {
    val es = new FakeEs(pageSize = 5)
    val dir = java.nio.file.Files.createTempDirectory("esflow2").toString + "/t"
    try {
      val q = EsScrollReader.buildQuery(5, Map("cnes" -> "111"),
        "data_solicitacao", "2026-07-01", "2026-07-28")
      val Some(ext) = EsScrollReader.fullExtract(es.url, "sisreg", q)
      val want = corpus.filter(_.cnes == "111")
      assert(ext.rows.size == want.size)
      import spark.implicits._
      Ingest.landJsonPayload(
        spark.read.json(spark.createDataset(ext.rows)),
        payloadCols = Seq("id", "cnes", "data_solicitacao", "value"),
        metadata = Map("_source" -> lit("sisreg_api")),
        targetDate = "2026-08-15",
        stamp = Ingest.RunStamp("run-es2",
          Timestamp.valueOf("2026-08-15 06:00:00")),
        path = dir)
      val landed = spark.read.parquet(dir)
        .filter(col("data_particao") === "2026-08-15")
      assert(landed.count() == want.size)
      assert(landed.select(get_json_object(col("data"), "$.cnes").as("c"))
        .filter(col("c") =!= "111").count() == 0)
    } finally es.stop()
  }
}
