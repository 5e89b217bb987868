package graft.sources

import java.io.IOException
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.flows.Ingest
import graft.operators.Relational

/** Elasticsearch scroll extraction over LIVE HTTP — the engine half of the
  * reference's sisreg scroll loop (reference:
  * pipelines/datalake/extract_load/sisreg_api/tasks.py:47-199), speaking
  * the ES REST protocol with the JDK's own HTTP stack (no ES client jar —
  * zero-dependency, and the protocol surface the loop needs is three
  * endpoints):
  *
  *  - `POST /<index>/_search?scroll=<keep>` — bool(match+range) query,
  *    first page + `_scroll_id` + `hits.total` (tasks.py:47-67,70-87);
  *  - `POST /_search/scroll` — subsequent pages until `hits` is empty
  *    (tasks.py:108-133);
  *  - `DELETE /_search/scroll` — cursor cleanup, 404 tolerated
  *    (tasks.py:136-138).
  *
  * Semantics mirrored from the reference: `timed_out` responses retry the
  * same cursor (up to the retry cap — tasks.py:71-80 and the client's
  * retry_on_timeout); a response with `_shards.failed > 0` or
  * `skipped > 0` is FATAL, never retried (tasks.py:82-85,117-119); the
  * drained row count must reconcile with `hits.total` within ±5%
  * (tasks.py:141-148, via [[Relational.reconcileCount]]).
  *
  * Driver-side by design, like every acquisition transport in this engine:
  * each page is bounded by the remote's page size, and the result lands
  * via `Ingest.landJsonPayload`/`spark.read.json` which ARE distributed.
  */
object EsScrollReader {

  /** Shard-level failure in a search/scroll response — not retryable (a
    * retry would silently under-read the failed shard's rows).
    */
  final class ShardFailureException(msg: String) extends IOException(msg)

  /** The reference's query body (tasks.py:47-67): bool must = one `match`
    * per filter + one `range` on `rangeField` with the fixed -03:00 zone.
    */
  def buildQuery(pageSize: Int, filters: Map[String, String],
      rangeField: String, gte: String, lte: String,
      timeZone: String = "-03:00"): String = {
    val matches: List[JValue] =
      filters.toList.sortBy(_._1).map { case (k, v) =>
        JObject("match" -> JObject(k -> JString(v)))
      }
    val range: JValue = JObject("range" -> JObject(rangeField -> JObject(
      "gte" -> JString(gte), "lte" -> JString(lte),
      "time_zone" -> JString(timeZone))))
    JsonMethods.compact(JsonMethods.render(JObject(
      "size" -> JInt(pageSize),
      // without this, ES 7+ caps hits.total at 10k with relation "gte",
      // totalEq comes back None, and the ±5% reconciliation silently
      // skips — precisely on the extractions large enough to need it
      "track_total_hits" -> JBool(true),
      "query" -> JObject("bool" -> JObject(
        "must" -> JArray(matches :+ range))))))
  }

  /** One parsed search/scroll response page. */
  final case class Page(scrollId: Option[String], timedOut: Boolean,
      shardsFailed: Long, shardsSkipped: Long, totalEq: Option[Long],
      sources: Seq[String])

  private def str(v: JValue): Option[String] =
    v match { case JString(s) => Some(s); case _ => None }

  private def long(v: JValue): Long =
    v match { case JInt(n) => n.toLong; case JLong(n) => n; case _ => 0L }

  /** Parse the response fields the loop depends on; each hit's `_source`
    * comes back as a compact JSON string, ready for a JSON-string `data`
    * column (the reference flattens `_source` the same way,
    * tasks.py:24-26).
    */
  def parsePage(body: String): Page = {
    val j = JsonMethods.parse(body)
    val totalObj = j \ "hits" \ "total"
    val totalEq = str(totalObj \ "relation") match {
      case Some("eq") => Some(long(totalObj \ "value"))
      case _ => None
    }
    val hits = (j \ "hits" \ "hits") match {
      case JArray(hs) => hs.map(h => JsonMethods.compact(
        JsonMethods.render(h \ "_source")))
      case _ => Nil
    }
    Page(
      scrollId = str(j \ "_scroll_id"),
      timedOut = (j \ "timed_out") == JBool(true),
      shardsFailed = long(j \ "_shards" \ "failed"),
      shardsSkipped = long(j \ "_shards" \ "skipped"),
      totalEq = totalEq, sources = hits)
  }

  // one shared client — connection pooling across pages, like the
  // reference's single Elasticsearch client instance
  private lazy val client: HttpClient = HttpClient.newHttpClient()

  private def http(method: String, url: String, body: Option[String],
      timeoutMs: Int): (Int, String) = {
    val publisher = body match {
      case Some(b) => HttpRequest.BodyPublishers.ofString(b)
      case None => HttpRequest.BodyPublishers.noBody()
    }
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(timeoutMs.toLong))
      .header("Content-Type", "application/json")
      .method(method, publisher)
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  /** Drained extraction result: every hit's `_source` as a JSON string,
    * the server-reported total, and the page count.
    */
  final case class Extraction(rows: Seq[String], total: Long, pages: Int)

  /** The full reference loop over live HTTP: initial search → scroll to
    * exhaustion ([[Ingest.scrollAll]] owns termination/retry/caps) →
    * clear-scroll → ±`tolerance` reconciliation. Returns None when the
    * range holds no rows (the reference raises SKIP — "nothing to do" is
    * a result, not an error, tasks.py:96-99).
    */
  def fullExtract(baseUrl: String, index: String, queryJson: String,
      scrollKeep: String = "2m", timeoutMs: Int = 600000,
      maxRetries: Int = 5, tolerance: Double = 0.05): Option[Extraction] = {
    var total = -1L
    val scrollIds = scala.collection.mutable.LinkedHashSet.empty[String]
    def page(cursor: Option[String]): (Seq[String], Option[String]) = {
      val (code, body) = cursor match {
        case None => http("POST",
          s"$baseUrl/$index/_search?scroll=$scrollKeep", Some(queryJson),
          timeoutMs)
        case Some(id) => http("POST", s"$baseUrl/_search/scroll",
          Some(JsonMethods.compact(JsonMethods.render(JObject(
            "scroll" -> JString(scrollKeep), "scroll_id" -> JString(id))))),
          timeoutMs)
      }
      if (code >= 400)
        throw new IOException(s"ES returned HTTP $code: ${body.take(200)}")
      val p = parsePage(body)
      // record the scroll id BEFORE any throw below: a timed-out (or
      // shard-failed) initial search still created a server-side scroll
      // context, and each retried attempt creates another — capturing here
      // lets the finally-block clear-scroll release all of them instead of
      // leaking up to maxRetries contexts per extraction.
      p.scrollId.foreach(scrollIds += _)
      if (p.shardsFailed > 0 || p.shardsSkipped > 0)
        throw new ShardFailureException(
          s"search with shard failures: failed=${p.shardsFailed} " +
            s"skipped=${p.shardsSkipped}")
      // timed_out retry is safe ONLY on the initial search (a fresh search
      // consumes nothing, reference tasks.py:71-80). A scroll call is
      // FORWARD-ONLY: re-posting the same scroll_id would fetch the NEXT
      // batch, silently dropping this page's hits — so scroll pages accept
      // whatever arrived, exactly like the reference's _scroll_paginate
      // (which never checks timed_out on scroll responses).
      if (p.timedOut && cursor.isEmpty)
        throw new IOException("ES initial search timed_out — retrying")
      if (cursor.isEmpty) total = p.totalEq.getOrElse(-1L)
      // termination: an empty page ends the scroll; the initial page keeps
      // going even when the first batch is short of the total
      val next = if (p.sources.isEmpty) None
        else p.scrollId.orElse(cursor)
      (p.sources, next)
    }
    val (rows, pages) =
      // retrySafe = initial search only: the scroll cursor is FORWARD-ONLY,
      // so a lost-response scroll POST must fail the extraction, not be
      // re-sent (the re-send would fetch the NEXT batch and drop a page)
      try Ingest.scrollAll(page _, maxRetries = maxRetries,
        fatal = _.isInstanceOf[ShardFailureException],
        retrySafe = _.isEmpty)
      finally
        // cursor cleanup runs on failure too — a leaked scroll context
        // pins server-side segments until the keep-alive expires, and
        // repeated failing runs can exhaust the open-scroll limit.
        // 404 tolerated (the server may have expired it already).
        if (scrollIds.nonEmpty) {
          val (code, _) = http("DELETE", s"$baseUrl/_search/scroll",
            Some(JsonMethods.compact(JsonMethods.render(JObject(
              "scroll_id" -> JArray(scrollIds.toList.map(JString(_))))))),
            timeoutMs)
          if (code >= 400 && code != 404)
            System.err.println(s"[es-scroll] clear_scroll returned HTTP $code")
        }
    if (rows.isEmpty && total <= 0) None
    else {
      if (total >= 0) Relational.reconcileCount(rows.size.toLong, total, tolerance)
      Some(Extraction(rows, total, pages))
    }
  }
}
