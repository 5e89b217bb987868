package graft.sources

import java.io.IOException
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Managed-SQL import orchestration — the engine half of the reference's
  * GCS→CloudSQL migrate flow (reference:
  * pipelines/datalake/migrate/gcs_to_cloudsql/tasks.py:66-278 +
  * utils.py:25-238). The admin API allows ONE operation per instance at a
  * time (409 Conflict otherwise) and an import into an existing database
  * is a silent NO-OP, which dictates the whole shape:
  *
  *  - `callApi`: bearer-authed request; 409 retries on a timer up to the
  *    cap (then errors loudly — utils.py:205-218), any other ≥400 is
  *    immediate;
  *  - `waitForOperations`: poll the newest operation (`maxResults=1`)
  *    until DONE with bounded attempts; a response without `items` skips
  *    the check; a settle pause after DONE (the API lies a little —
  *    utils.py:163-168);
  *  - `filenameInfo` / `checkDbName`: the two filename regexes (CNES and
  *    rnds forms) and the reserved-name/charset guards (utils.py:25-71);
  *  - `sendSequentialImports`: sort, clamp the resume window, force the
  *    instance on (PATCH activationPolicy ALWAYS), then per file:
  *    DELETE the target database → wait → POST /import → wait
  *    (tasks.py:75-278). Sequential BY DESIGN — parallel imports 409.
  *
  * `sleeper` is injectable so specs poll fast; production uses real time.
  */
object CloudSqlImporter {

  final case class Config(apiBase: String, token: String,
      pollIntervalMs: Long = 15000, maxPollAttempts: Int = 40,
      maxConflictRetries: Int = 25, settleMs: Long = 10000,
      sleeper: Long => Unit = Thread.sleep)

  private lazy val http: HttpClient = HttpClient.newHttpClient()

  private def request(cfg: Config, method: String, path: String,
      body: Option[String]): (Int, String) = {
    val publisher = body match {
      case Some(b) => HttpRequest.BodyPublishers.ofString(b)
      case None => HttpRequest.BodyPublishers.noBody()
    }
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(s"${cfg.apiBase}$path"))
        .timeout(Duration.ofMillis(180000L))
        .header("Authorization", s"Bearer ${cfg.token}")
        .header("Content-Type", "application/json")
        .method(method, publisher)
        .build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  /** One admin-API call with the reference's 409-retry discipline
    * (utils.py:171-218): <400 succeeds, 409 retries on the timer, any
    * other ≥400 raises at once, and exhausting the retries on 409s raises
    * loudly rather than silently giving up.
    */
  def callApi(cfg: Config, method: String, path: String,
      json: Option[String] = None): Unit = {
    var attempt = 0
    while (attempt < cfg.maxConflictRetries) {
      val (status, body) = request(cfg, method, path, json)
      if (status < 400) return
      if (status != 409)
        throw new IOException(s"API $method $path failed: $status ${body.take(200)}")
      attempt += 1
      if (attempt < cfg.maxConflictRetries) cfg.sleeper(cfg.pollIntervalMs)
    }
    throw new IOException(
      s"Failed to call API successfully; too many '409 Conflict's ($method $path)")
  }

  /** Poll the instance's newest operation until DONE (utils.py:73-168):
    * bounded attempts, items-less responses skip the check, missing
    * status logs-and-keeps-polling, and a settle pause follows DONE.
    */
  def waitForOperations(cfg: Config, instanceName: String): Unit = {
    val path = s"/operations?instance=$instanceName&maxResults=1"
    var attempt = 0
    while (attempt < cfg.maxPollAttempts) {
      val (status, body) = request(cfg, "GET", path, None)
      if (status >= 400)
        throw new IOException(s"operations poll failed: $status ${body.take(200)}")
      val items = JsonMethods.parse(body) \ "items"
      items match {
        case JNothing => return // no operations listed: nothing to wait on
        case JArray(Nil) => return
        case _ =>
          ((items: JValue)(0) \ "status") match {
            case JString("DONE") =>
              cfg.sleeper(cfg.settleMs) // post-DONE settle (utils.py:163-168)
              return
            case _ => () // RUNNING/PENDING/absent: keep polling
          }
      }
      attempt += 1
      if (attempt < cfg.maxPollAttempts) cfg.sleeper(cfg.pollIntervalMs)
    }
    throw new IOException(
      s"operation on '$instanceName' not DONE after ${cfg.maxPollAttempts} polls")
  }

  private val WithCnes =
    "^([a-z_]+)_([0-9]+)_([0-9]{8})_([0-9]{6})(_old)?\\.[a-z]+$".r
  private val Rnds =
    "^rnds_vaccine_historic_([0-9]{8})_([0-9]{6})\\.bak$".r

  /** The reference's two filename shapes (utils.py:25-58): a CNES-stamped
    * backup or the rnds vaccine form; anything else errors.
    */
  def filenameInfo(filename: String): (String, Option[String]) = {
    val file = filename.strip().split("/").last.toLowerCase
    file match {
      case WithCnes(name, cnes, _, _, _) => (name, Some(cnes))
      case Rnds(_, _) => ("rnds_historic", None)
      case _ => throw new IllegalArgumentException(
        s"Filename '$file' does not match expected patterns")
    }
  }

  /** Reserved-name and charset guards (utils.py:61-71). */
  def checkDbName(name: String): Unit = {
    require(!Set("master", "model", "msdb", "tempdb").contains(name),
      s"Database name '$name' is reserved!")
    require(!"[^A-Za-z0-9_\\-]".r.findFirstIn(name).isDefined,
      s"Database name '$name' contains characters not in [A-Za-z0-9_\\-]!")
  }

  /** The resume/limit window over the SORTED file list (tasks.py:75-110):
    * out-of-range `startFrom` clamps to 1 with the reference's
    * ignore-and-warn, `limitFiles` ≤ 0 means no limit.
    */
  def windowFiles(files: Seq[String], startFrom: Int, limitFiles: Int): Seq[String] = {
    // nulls/empties drop BEFORE the sort — Ordering[String] NPEs on null,
    // which would defeat the per-file empty-name skip downstream
    val sorted = files.filter(f => f != null && f.nonEmpty).sorted
    val s0 = if (startFrom < 1 || startFrom > sorted.size) 1 else startFrom
    val windowed = sorted.drop(s0 - 1)
    if (limitFiles > 0) windowed.take(limitFiles) else windowed
  }

  /** The sequential delete-then-import loop (tasks.py:110-278): force the
    * instance ON (activationPolicy ALWAYS — imports 412 against a stopped
    * instance), then per file resolve the target database
    * (`name[_cnes]`), guard the name, DELETE it (absent databases warn but
    * 200 on the real API), wait, POST the BAK import, wait. Returns the
    * (file, database) pairs imported, in order.
    */
  def sendSequentialImports(cfg: Config, files: Seq[String],
      bucketName: String, instanceName: String,
      startFrom: Int = 1, limitFiles: Int = 0): Seq[(String, String)] = {
    val selected = windowFiles(files, startFrom, limitFiles)
    waitForOperations(cfg, instanceName) // pre-import drain
    callApi(cfg, "PATCH", s"/instances/$instanceName",
      Some("""{"settings":{"activationPolicy":"ALWAYS"}}"""))
    waitForOperations(cfg, instanceName)
    val done = Seq.newBuilder[(String, String)]
    selected.foreach { file => // windowFiles already dropped null/empty names
      val (name, cnes) = filenameInfo(file)
      val databaseName = cnes.fold(name)(c => s"${name}_$c")
      checkDbName(databaseName)
      // imports into an existing database are silent no-ops, so the prior
      // backup must die first — sequencing is what makes this safe-ish
      callApi(cfg, "DELETE",
        s"/instances/$instanceName/databases/$databaseName")
      waitForOperations(cfg, instanceName)
      callApi(cfg, "POST", s"/instances/$instanceName/import",
        Some(JsonMethods.compact(JsonMethods.render(JObject(
          "importContext" -> JObject(
            "fileType" -> JString("BAK"),
            "uri" -> JString(s"gs://$bucketName/$file"),
            "database" -> JString(databaseName)))))))
      waitForOperations(cfg, instanceName)
      done += (file -> databaseName)
    }
    done.result()
  }
}
