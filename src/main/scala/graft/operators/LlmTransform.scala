package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** LLM-in-the-loop row transform (reference:
  * pipelines/datalake/transform/gemini/pacientes_restritos/tasks.py:44-117 —
  * per-row Gemini classification with retry, then regex parsing of the
  * model's free-text answer).
  *
  * Spark-first shape: `mapPartitions` with one rate-limited client per
  * partition (one HTTP session per task, never per row), bounded retries,
  * and the parse step as ordinary codegen'd column expressions AFTER the
  * boundary — only the irreducible network call lives inside the lambda.
  * The client is an injected serializable function so tests (and offline
  * runs) use a deterministic stub.
  */
object LlmTransform {

  final case class LlmResult(id: Long, raw: String, attempts: Int)

  /** Classify every row's text with `client`, retrying up to `maxRetries`
    * and pacing calls to `minIntervalMs` per partition (the reference's
    * rate-limit sleep).
    */
  def classify(
      df: DataFrame, idCol: String, textCol: String,
      client: String => String,
      maxRetries: Int = 3, minIntervalMs: Long = 0): Dataset[LlmResult] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { rows =>
        var lastCall = 0L
        rows.map { case (id, text) =>
          var attempt = 0
          var out: Option[String] = None
          while (out.isEmpty && attempt < maxRetries) {
            attempt += 1
            val wait = minIntervalMs - (System.currentTimeMillis() - lastCall)
            if (wait > 0) Thread.sleep(wait)
            lastCall = System.currentTimeMillis()
            // the FINAL attempt must also be caught: a persistently failing
            // row degrades to an empty result instead of killing the task
            // (and with it the partition's completed work)
            out = try Some(client(text)) catch { case _: Exception => None }
          }
          LlmResult(id, out.getOrElse(""), attempt)
        }
      }
  }

  /** Parse the model's free text into (label, confidence) with the
    * reference's regex-extraction style — pure built-ins, runs codegen'd
    * outside the mapPartitions boundary.
    */
  def parseVerdict(results: DataFrame, rawCol: String): DataFrame =
    results
      .withColumn("label",
        lower(regexp_extract(col(rawCol), "(?i)\\b(sim|nao|yes|no)\\b", 1)))
      .withColumn("confidence",
        regexp_extract(col(rawCol), "(\\d+(?:\\.\\d+)?)\\s*%", 1).cast("double") / 100.0)

  /** The reference's exact verdict shape — `{"flag": ..., "motivo": ...}`
    * regex-extracted from the model's free text, newlines stripped first,
    * quotes scrubbed, and an unparseable answer degrading to (empty flag,
    * whole text as motivo) instead of an error (reference
    * tasks.py:88-117 `parse_result_row`). Codegen'd column expressions,
    * after the network boundary.
    */
  def parseFlagMotivo(results: DataFrame, rawCol: String): DataFrame = {
    // strip \r too: Java regex '.' crosses neither \n nor \r, so a CRLF
    // answer would silently fall through to the unparseable branch where
    // the Python reference (whose '.' matches \r) extracts the flag
    val flat = regexp_replace(col(rawCol), "[\r\n]", "")
    val flag = regexp_extract(flat, "\\{\"flag\": ?(.*), \"motivo\": ?(.*)\\}", 1)
    val motivo = regexp_extract(flat, "\\{\"flag\": ?(.*), \"motivo\": ?(.*)\\}", 2)
    val matched = flat.rlike("\\{\"flag\": ?.*, \"motivo\": ?.*\\}")
    results
      .withColumn("flag",
        when(matched, regexp_replace(flag, "\"", "")).otherwise(lit("")))
      .withColumn("motivo",
        when(matched, regexp_replace(motivo, "\"", "")).otherwise(flat))
  }

  /** A REAL wire client for the reference's Gemini call
    * (tasks.py:44-75 `get_result_gemini`): POST
    * `<base>/v1beta/models/<model>:generateContent?key=<key>` with
    * `{"contents":[{"parts":[{"text": prompt + text}]}]}`, answer text at
    * `candidates[0].content.parts[0].text`, non-200 → error (which
    * [[classify]]'s bounded retry absorbs). Serializable — executors build
    * their own HTTP client lazily; only strings ship with the closure.
    */
  final case class GeminiClient(baseUrl: String, model: String, key: String,
      prompt: String, timeoutMs: Int = 90000)
      extends (String => String) with Serializable {
    @transient private lazy val http =
      java.net.http.HttpClient.newHttpClient()
    override def apply(text: String): String = {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val body = JsonMethods.compact(JsonMethods.render(JObject(
        "contents" -> JArray(List(JObject("parts" -> JArray(List(
          JObject("text" -> JString(prompt + text))))))))))
      val resp = http.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(
            s"$baseUrl/v1beta/models/$model:generateContent?key=$key"))
          .timeout(java.time.Duration.ofMillis(timeoutMs.toLong))
          .header("Content-type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200)
        throw new java.io.IOException(
          s"API call failed, error: ${resp.statusCode()}")
      (JsonMethods.parse(resp.body()) \ "candidates")(0) \ "content" \
        "parts" match {
        case JArray(JObject(fields) :: _) =>
          fields.collectFirst { case ("text", JString(t)) => t }
            .getOrElse(throw new java.io.IOException("no text part"))
        case other => throw new java.io.IOException(s"malformed answer: $other")
      }
    }
  }
}
