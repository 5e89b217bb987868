package graft.sources

import java.io.IOException
import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Cloud object-store and spreadsheet fetches over their REST surfaces —
  * the engine half of the reference's GCS/Azure/Sheets acquisition
  * (reference: pipelines/utils/tasks.py:1018-1047 `load_file_from_gcs_bucket`,
  * :1212-1245 `load_files_from_gcs_bucket`, :246-296 `download_azure_blob`,
  * :359-438 `download_from_url`). The SDKs those tasks wrap all reduce to
  * plain authenticated HTTP:
  *
  *  - GCS: the JSON API — `storage/v1/b/{bucket}/o?prefix=` listing with
  *    `updated`/`timeCreated` metadata, `download/.../o/{name}?alt=media`
  *    content; the reference's suffix filter and STRICT updated-window
  *    (`>` after, `<` before) applied to the listing;
  *  - Azure: a blob GET under `{account}/{container}/{path}` saved to
  *    `{folder}/{file}[_{load_date}].csv` (the reference's dated-filename
  *    switch);
  *  - Sheets: `v4/spreadsheets/{id}/values/{range}` — the values grid
  *    padded to the header width and written as delimiter-joined CSV
  *    (what gspread's `get_all_values` + the csv writer produce), with
  *    the docs-URL prefix validation and worksheet-by-name selection.
  */
object CloudStoreReader {

  private lazy val http: HttpClient = HttpClient.newHttpClient()

  private def get(url: String, bearer: Option[String],
      timeoutMs: Int): (Int, Array[Byte]) = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs.toLong)).GET()
    bearer.foreach(t => b.header("Authorization", s"Bearer $t"))
    val resp = http.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
    (resp.statusCode(), resp.body())
  }

  private def getOk(url: String, bearer: Option[String], what: String,
      timeoutMs: Int = 90000): Array[Byte] = {
    val (code, body) = get(url, bearer, timeoutMs)
    if (code >= 400) throw new IOException(
      s"$what failed: HTTP $code ${new String(body.take(200), StandardCharsets.UTF_8)}")
    body
  }

  private def enc(s: String) = URLEncoder.encode(s, StandardCharsets.UTF_8)

  // URLEncoder emits FORM encoding ('+' for space) — correct in a query
  // string, wrong in a PATH segment (GCS reads '+' literally → 404;
  // Sheets fails to parse the range). Percent-encode paths.
  private def encPath(s: String) = enc(s).replace("+", "%20")

  // ------------------------------------------------------------------ GCS

  final case class GcsObject(name: String, updated: Instant, created: Instant)

  /** List a bucket's objects (JSON API `o?prefix=`): name + updated +
    * timeCreated, the metadata the reference's window filter reads.
    * Follows `nextPageToken` to exhaustion — the API pages at 1000
    * objects, and a single-page read would silently truncate the listing
    * (the staleness the SDK-paginated reference never sees).
    */
  def gcsList(apiBase: String, bucket: String, prefix: String,
      token: Option[String] = None): Seq[GcsObject] = {
    val out = Seq.newBuilder[GcsObject]
    var pageToken: Option[String] = None
    var more = true
    while (more) {
      val pt = pageToken.map(t => s"&pageToken=${enc(t)}").getOrElse("")
      val body = getOk(
        s"$apiBase/storage/v1/b/${encPath(bucket)}/o?prefix=${enc(prefix)}$pt",
        token, "GCS list")
      val j = JsonMethods.parse(new String(body, StandardCharsets.UTF_8))
      (j \ "items") match {
        case JArray(items) => items.foreach { it =>
          def s(f: String) = (it \ f) match {
            case JString(v) => v
            case other => throw new IOException(s"GCS item without $f: $other")
          }
          out += GcsObject(s("name"), Instant.parse(s("updated")),
            Instant.parse(s("timeCreated")))
        }
        case _ => ()
      }
      pageToken = (j \ "nextPageToken") match {
        case JString(t) => Some(t)
        case _ => None
      }
      more = pageToken.isDefined
    }
    out.result()
  }

  /** Download one object's content (`alt=media`). */
  def gcsDownload(apiBase: String, bucket: String, name: String,
      token: Option[String] = None): Array[Byte] =
    getOk(
      s"$apiBase/download/storage/v1/b/${encPath(bucket)}/o/${encPath(name)}?alt=media",
      token, s"GCS download $name")

  /** Split CSV text into one string per RECORD, honoring "" quoting —
    * a naive newline split would tear quoted fields with embedded line
    * breaks in half. Each record element is then parsed individually by
    * Spark's CSV parser, which handles in-record newlines fine.
    *
    * Quote semantics match pandas' C parser (the reference): a quote is
    * special only at FIELD START; a stray mid-field quote (`1,6" nail`) is
    * literal content — a toggle-anywhere state machine would swallow the
    * next newline and merge two records. Inside a quoted field `""` is an
    * escaped quote and the closing quote ends the quoted run.
    */
  private[sources] def splitCsvRecords(text: String,
      delimiter: Char = ','): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new java.lang.StringBuilder
    var inQuotes = false
    var fieldStart = true
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') {
            cur.append("\"\""); i += 1 // escaped quote, stay quoted
          } else { inQuotes = false; cur.append(c) }
        } else cur.append(c)
      } else if (c == '"' && fieldStart) {
        inQuotes = true; fieldStart = false; cur.append(c)
      } else if (c == delimiter) {
        cur.append(c); fieldStart = true
      } else if (c == '\n' || c == '\r') {
        if (c == '\r' && i + 1 < text.length && text.charAt(i + 1) == '\n') i += 1
        if (cur.length > 0) { out += cur.toString; cur.setLength(0) }
        fieldStart = true
      } else { cur.append(c); fieldStart = false }
      i += 1
    }
    if (cur.length > 0) out += cur.toString
    out.result()
  }

  /** The reference's single-file load (tasks.py:1018-1047): CSV content →
    * an ALL-STRING DataFrame (`dtype=str`), non-CSV types unimplemented.
    * The bytes never touch the driver's local filesystem: a driver-local
    * temp path is invisible to executors on a real cluster, so the records
    * go through `spark.read.csv(Dataset[String])` instead — the quote-aware
    * record split above keeps embedded line breaks intact.
    */
  def loadFileFromGcs(spark: SparkSession, apiBase: String, bucket: String,
      fileName: String, fileType: String = "csv", csvSep: String = ",",
      token: Option[String] = None): DataFrame = {
    if (fileType != "csv")
      throw new UnsupportedOperationException(s"File type $fileType not implemented")
    val bytes = gcsDownload(apiBase, bucket, fileName, token)
    // blank-record skipping in splitCsvRecords matches pandas'
    // skip_blank_lines=True default, the reference's read path
    val records = splitCsvRecords(new String(bytes, StandardCharsets.UTF_8),
      csvSep.headOption.getOrElse(','))
    require(records.nonEmpty, s"GCS file $bucket/$fileName has no CSV records")
    import spark.implicits._
    // Strip ONLY the first record as header: header=true over a
    // Dataset[String] makes Spark drop every data row byte-identical to
    // the header in ALL partitions (it cannot know which line was first),
    // silently losing legitimate rows pandas keeps. Parse the header line
    // alone for column names, then read the rest schema-first.
    val headerSchema = spark.read.option("header", "true")
      .option("sep", csvSep).csv(spark.createDataset(records.take(1))).schema
    // no inference = every column StringType, pandas dtype=str
    spark.read.option("header", "false").option("sep", csvSep)
      .schema(headerSchema)
      .csv(spark.createDataset(records.drop(1)))
  }

  /** The reference's bulk load (tasks.py:1212-1245): prefix listing,
    * suffix filter, STRICT updated-window (`updated > after`,
    * `updated < before`), content + (name, updated, created) metadata.
    * Contents stream LAZILY (one object in memory at a time) — the
    * reference materializes the whole batch, which OOMs the moment a
    * prefix matches many large files; callers that want the eager list
    * call `.toSeq`.
    */
  def loadFilesFromGcs(apiBase: String, bucket: String, filePrefix: String,
      fileSuffix: String, updatedAfter: Option[Instant],
      updatedBefore: Option[Instant],
      token: Option[String] = None): Iterator[(GcsObject, Array[Byte])] =
    gcsList(apiBase, bucket, filePrefix, token).iterator
      .filter(_.name.endsWith(fileSuffix))
      .filter(o => updatedAfter.forall(a => o.updated.isAfter(a)))
      .filter(o => updatedBefore.forall(b => o.updated.isBefore(b)))
      .map(o => o -> gcsDownload(apiBase, bucket, o.name, token))

  // ---------------------------------------------------------------- Azure

  /** The reference's blob download (tasks.py:246-296): GET the blob, save
    * to `{folder}/{file}[_{load_date}].csv` — the load-date suffix keyed
    * exactly as the reference switches it. Returns the local path.
    */
  def downloadAzureBlob(accountUrl: String, containerName: String,
      blobPath: String, fileFolder: String, fileName: String,
      credential: Option[String] = None,
      addLoadDateToFilename: Boolean = false,
      loadDate: Option[String] = None,
      today: () => String = () => java.time.LocalDate.now().toString): String = {
    val dest =
      if (addLoadDateToFilename)
        s"$fileFolder/${fileName}_${loadDate.getOrElse(today())}.csv"
      else s"$fileFolder/$fileName.csv"
    val sas = credential.map(c => s"?$c").getOrElse("")
    val bytes = getOk(s"$accountUrl$containerName/$blobPath$sas", None,
      s"Azure blob $blobPath")
    Files.createDirectories(Paths.get(fileFolder))
    Files.write(Paths.get(dest), bytes)
    dest
  }

  // --------------------------------------------------------------- Sheets

  val SheetsUrlPrefix = "https://docs.google.com/spreadsheets/d/"

  /** The reference's docs-URL validation + id extraction
    * (tasks.py:405-410).
    */
  def spreadsheetIdFromUrl(url: String): String = {
    require(url.startsWith(SheetsUrlPrefix),
      s"URL must start with $SheetsUrlPrefix. Invalid URL: $url")
    url.stripPrefix(SheetsUrlPrefix).split("/").head
  }

  /** The values grid as delimiter-joined CSV text: every row padded to the
    * WIDEST row's width — gspread's `get_all_values` rectangularizes to the
    * widest row before the csv write (tasks.py:414-438), so a data row
    * longer than the header widens the grid instead of silently losing its
    * trailing cells. Cells containing the delimiter, quotes, or line breaks
    * are quoted with "" doubling, like Python's csv.writer — a raw join
    * would shift columns on the first free-text cell carrying the delimiter.
    */
  def valuesToCsv(values: Seq[Seq[String]], delimiter: String): String = {
    require(values.nonEmpty, "empty sheet")
    def cell(s: String): String =
      if (s.contains(delimiter) || s.contains("\"") ||
          s.contains("\n") || s.contains("\r"))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    val width = values.map(_.size).max
    values.map(r => r.padTo(width, "").map(cell).mkString(delimiter))
      .mkString("\n")
  }

  /** Fetch a worksheet's values (`v4/spreadsheets/{id}/values/{range}`)
    * and write them as CSV to `{filePath}/{fileName}[.csv]`. Returns the
    * local path.
    */
  def downloadSheetAsCsv(apiBase: String, url: String, sheetName: String,
      filePath: String, fileName: String, csvDelimiter: String = ";",
      token: Option[String] = None): String = {
    val id = spreadsheetIdFromUrl(url)
    val body = getOk(
      s"$apiBase/v4/spreadsheets/${encPath(id)}/values/${encPath(sheetName)}",
      token, s"Sheets values $sheetName")
    val values = (JsonMethods.parse(
        new String(body, StandardCharsets.UTF_8)) \ "values") match {
      case JArray(rows) => rows.map {
        case JArray(cells) => cells.map {
          case JString(s) => s
          case other => JsonMethods.compact(JsonMethods.render(other))
        }
        case other => throw new IOException(s"malformed values row: $other")
      }
      case _ => throw new IOException("no values in Sheets response")
    }
    val name = if (fileName.contains(".csv")) fileName else s"$fileName.csv"
    val dest = Paths.get(filePath, name)
    Files.createDirectories(dest.getParent)
    Files.write(dest, valuesToCsv(values, csvDelimiter)
      .getBytes(StandardCharsets.UTF_8))
    dest.toString
  }
}
