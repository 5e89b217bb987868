package graft.sources

import java.io.IOException
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.sql.Timestamp
import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** REST/JSON API extraction through a fixed-IP proxy — the engine half of
  * the reference's cloud-function request + per-entity API loop (reference:
  * pipelines/utils/tasks.py:440-569 `cloud_function_request`,
  * pipelines/datalake/extract_load/vitacare_api_v2/tasks.py:70-196
  * `extract_data`):
  *
  *  - one POST to the proxy carries the TARGET request as a JSON payload
  *    (`tipo_api`/`url`/`request_type`/`body_params`/`query_params`/
  *    `header_params`/`credential`, bearer-token auth; dict body params
  *    pre-serialized when `api_type == "json"` — tasks.py:503-508);
  *  - the proxy answers an ENVELOPE `{status_code, body[, gcs_url]}`; when
  *    `gcs_url` is present the real body parked in object storage is
  *    fetched and spliced back into `body` (large-response hand-off,
  *    tasks.py:523-550);
  *  - a non-200 PROXY response is an error; a non-200 ENVELOPE status is a
  *    RESULT the caller records (tasks.py:552-563 — the reference logs and
  *    continues);
  *  - the per-entity loop fault-ISOLATES: one CNES timing out or erroring
  *    records a failed log row and the loop continues
  *    (vitacare tasks.py:108-165);
  *  - success rows land as one JSON STRING per body element beside typed
  *    metadata columns (tasks.py:179-189).
  *
  * Driver-side by design like every acquisition transport here; the landed
  * frame is distributed.
  */
object ProxyApiReader {

  /** The proxy's response envelope, body already GCS-resolved. */
  final case class Envelope(statusCode: Int, body: JValue)

  /** One per-entity extraction-log row (vitacare tasks.py:110-176). */
  final case class ExtractLog(entity: String, success: Boolean, result: String)

  private lazy val client: HttpClient = HttpClient.newHttpClient()

  /** Default hand-off fetch: plain HTTP(S) GET. A real deployment passes a
    * storage-client lambda for `gs://` URLs; this engine has no cloud SDK
    * by instruction, so unqualified schemes fail loudly.
    */
  def httpFetch(url: String, timeoutMs: Int = 90000): String = {
    require(url.startsWith("http://") || url.startsWith("https://"),
      s"hand-off URL needs a storage-client fetch lambda: $url")
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMillis(timeoutMs.toLong)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() >= 400)
      throw new IOException(s"hand-off fetch failed: HTTP ${resp.statusCode()}")
    resp.body()
  }

  /** The reference's proxy payload, field for field (tasks.py:497-508). */
  def proxyPayload(targetUrl: String, requestType: String,
      queryParams: Map[String, String], headerParams: Map[String, String],
      bodyParams: Option[JValue], credential: Option[JValue],
      apiType: String = "json", endpointForFilename: Option[String] = None): String = {
    val qp = queryParams ++
      endpointForFilename.map("_endpoint_for_filename" -> _)
    val body: JValue = bodyParams match {
      // dict bodies pre-serialize to a STRING when the api speaks json
      case Some(o: JObject) if apiType == "json" =>
        JString(JsonMethods.compact(JsonMethods.render(o)))
      case Some(v) => v
      case None => JNull
    }
    JsonMethods.compact(JsonMethods.render(JObject(
      "tipo_api" -> JString(apiType),
      "url" -> JString(targetUrl),
      "request_type" -> JString(requestType),
      "body_params" -> body,
      "query_params" -> JObject(qp.toList.sortBy(_._1)
        .map { case (k, v) => k -> (JString(v): JValue) }),
      "header_params" -> JObject(headerParams.toList.sortBy(_._1)
        .map { case (k, v) => k -> (JString(v): JValue) }),
      "credential" -> credential.getOrElse(JNull))))
  }

  /** POST the payload to the proxy and resolve the envelope: non-200 proxy
    * HTTP → IOException; `gcs_url` in the envelope → fetch + splice the
    * parked body (JSON-parsed when `apiType == "json"`). The envelope's own
    * `status_code` comes back AS DATA for the caller's log.
    */
  def proxyRequest(proxyUrl: String, bearerToken: String, payload: String,
      apiType: String = "json", timeoutMs: Int = 90000,
      fetchHandOff: String => String = httpFetch(_)): Envelope = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(proxyUrl))
        .timeout(Duration.ofMillis(timeoutMs.toLong))
        .header("Content-Type", "application/json")
        .header("Authorization", s"Bearer $bearerToken")
        .POST(HttpRequest.BodyPublishers.ofString(payload))
        .build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new IOException(s"proxy request failed: HTTP ${resp.statusCode()}")
    val j = JsonMethods.parse(resp.body())
    val status = (j \ "status_code") match {
      case JInt(n) => n.toInt
      case other => throw new IOException(s"envelope without status_code: $other")
    }
    val body = (j \ "gcs_url") match {
      case JString(url) =>
        val parked = fetchHandOff(url)
        if (apiType == "json") JsonMethods.parse(parked) else JString(parked)
      case _ => j \ "body"
    }
    Envelope(status, body)
  }

  /** The per-entity loop with the reference's fault isolation: `call` one
    * entity at a time; an exception or a non-200 envelope records a failed
    * log row and the loop CONTINUES; a 200 envelope contributes one JSON
    * string per body array element. Returns (entity → rows, logs).
    */
  def extractPerEntity(entities: Seq[String],
      call: String => Envelope): (Seq[(String, Seq[String])], Seq[ExtractLog]) = {
    val data = Seq.newBuilder[(String, Seq[String])]
    val logs = Seq.newBuilder[ExtractLog]
    entities.foreach { e =>
      try {
        val env = call(e)
        if (env.statusCode != 200) {
          logs += ExtractLog(e, success = false,
            s"Status Code ${env.statusCode}: ${JsonMethods.compact(JsonMethods.render(env.body)).take(200)}")
        } else {
          val rows = env.body match {
            case JArray(items) => items.map(i =>
              JsonMethods.compact(JsonMethods.render(i)))
            case JNothing | JNull => Nil
            case single => Seq(JsonMethods.compact(JsonMethods.render(single)))
          }
          data += (e -> rows)
          logs += ExtractLog(e, success = true, "Status Code 200")
        }
      } catch {
        case ex: Exception =>
          logs += ExtractLog(e, success = false,
            s"${ex.getClass.getSimpleName}: ${String.valueOf(ex.getMessage).take(200)}")
      }
    }
    (data.result(), logs.result())
  }

  /** Land extracted rows as the reference's column set — one JSON-string
    * `data` column beside the source metadata stamps
    * (vitacare tasks.py:179-189).
    */
  def toLandingFrame(spark: SparkSession, extracted: Seq[(String, Seq[String])],
      ap: String, targetDate: String, endpointName: String,
      loadedAt: Timestamp): DataFrame = {
    import spark.implicits._
    extracted.flatMap { case (cnes, rows) => rows.map(cnes -> _) }
      .toDF("_source_cnes", "data")
      .select(col("data"), col("_source_cnes"),
        lit(ap).as("_source_ap"), lit(targetDate).as("_target_date"),
        lit(endpointName).as("_endpoint"), lit(loadedAt).as("_loaded_at"))
  }
}
