package graft.sources

import java.io.IOException
import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import org.apache.spark.sql.DataFrame
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Datalake-hub REST push — the reference's reverse-ETL "load asset"
  * (reference: pipelines/utils/datalake_hub.py:13-77): form-encoded
  * credential POST to `auth/token` for a bearer token, then the frame —
  * all columns cast to STRING, records-orient JSON — POSTed to
  * `write/{asset_id}`, with 201 the only success.
  *
  * Driver-side by design and small-data by contract (the reference
  * serializes the whole frame into one request body); the all-string cast
  * is [[LakeWriter.allString]], the same landing convention every
  * reference upload applies.
  */
object HubPushWriter {

  private lazy val http: HttpClient = HttpClient.newHttpClient()

  /** `POST {apiUrl}auth/token` (form-encoded) → access_token
    * (datalake_hub.py:30-46).
    */
  def authenticate(apiUrl: String, username: String, password: String,
      timeoutMs: Int = 180000): String = {
    def enc(s: String) = URLEncoder.encode(s, StandardCharsets.UTF_8)
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(s"${apiUrl}auth/token"))
        .timeout(Duration.ofMillis(timeoutMs.toLong))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(
          s"username=${enc(username)}&password=${enc(password)}"))
        .build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new IOException(
        s"Error getting API token (${resp.statusCode()}) - ${resp.body().take(200)}")
    (JsonMethods.parse(resp.body()) \ "access_token") match {
      case JString(t) => t
      case other => throw new IOException(s"no access_token in $other")
    }
  }

  /** The records-orient payload: every column cast to string (the
    * reference's `astype(str)`), one JSON object per row
    * (datalake_hub.py:57-61). Nulls become the literal "None" — that IS
    * what `astype(str)` does, and it keeps every key present on every
    * record (Spark's toJSON would OMIT null fields, handing the hub
    * ragged records). Driver-side collect — small data by the task's own
    * contract.
    */
  def recordsJson(df: DataFrame): String = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    LakeWriter.allString(df)
      .select(df.columns.map(c => coalesce(col(c), lit("None")).as(c)): _*)
      .toJSON.collect().mkString("[", ",", "]")
  }

  /** `POST {apiUrl}write/{assetId}` with the bearer token; 201 is the only
    * success, anything else raises with the server's report
    * (datalake_hub.py:63-77). Returns the report body.
    */
  def loadAsset(apiUrl: String, token: String, assetId: String,
      df: DataFrame, timeoutMs: Int = 500000): String = {
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(s"${apiUrl}write/$assetId"))
        .timeout(Duration.ofMillis(timeoutMs.toLong))
        .header("Authorization", s"Bearer $token")
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(recordsJson(df)))
        .build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 201)
      throw new IOException(
        s"Error loading asset to Datalake Hub (${resp.statusCode()}) - ${resp.body().take(200)}")
    resp.body()
  }
}
