package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets
import java.time.Duration

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Metabase MBQL sliced extraction over LIVE HTTP — the engine half of the
  * reference's ser_metabase flow (reference:
  * pipelines/datalake/extract_load/ser_metabase/tasks.py:24-213), speaking
  * the Metabase REST protocol with the JDK HTTP stack:
  *
  *  - `POST /api/session` (JSON) → session token (tasks.py:24-36);
  *  - `POST /api/dataset/csv` (form-encoded `query=<MBQL JSON>`, the
  *    `X-Metabase-Session` header) → CSV text (tasks.py:52-90);
  *  - min/max of the slice column via the reference's MBQL aggregation
  *    quirk `[which, ["+", ["-", field, 1], 1]]` — the ±1 arithmetic
  *    coerces a text-typed column numeric (tasks.py:69-76);
  *  - non-unique slice columns shrink the slice size by the measured
  *    lines-per-id ratio before slicing (tasks.py:104-151);
  *  - slices are HALF-OPEN `[lo, lo+size)` from `range(min, max, size)`
  *    (tasks.py:153-157), so no boundary value lands twice;
  *  - a slice returning the 1M-row cap is treated as truncated and fails
  *    loudly (tasks.py:211-213, via [[SlicePlanner.assertNotTruncated]]).
  */
object MetabaseReader {

  /** The reference's hard per-query cap (tasks.py:211). */
  val RowCap: Long = 1000000L

  private lazy val client: HttpClient = HttpClient.newHttpClient()

  private def post(url: String, headers: Seq[(String, String)], body: String,
      timeoutMs: Int): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(timeoutMs.toLong))
      .POST(HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  /** Authenticate and return the session token (tasks.py:24-36). */
  def sessionToken(baseUrl: String, user: String, password: String,
      timeoutMs: Int = 60000): String = {
    val (code, body) = post(s"$baseUrl/api/session",
      Seq("Content-Type" -> "application/json"),
      JsonMethods.compact(JsonMethods.render(JObject(
        "username" -> JString(user), "password" -> JString(password)))),
      timeoutMs)
    if (code >= 400)
      throw new java.io.IOException(s"Metabase auth failed: HTTP $code")
    (JsonMethods.parse(body) \ "id") match {
      case JString(t) => t
      case other => throw new java.io.IOException(s"no session id in $other")
    }
  }

  /** The reference's date-window MBQL filter: `>=` start and/or `<` end on
    * the DateTime column, `and`-combined when both bounds are present
    * (tasks.py:56-66); `JNothing` when unbounded.
    */
  def dateFilter(dateColumn: BigInt, dateStart: Option[String],
      dateEnd: Option[String]): JValue = {
    def field: JValue = JArray(List(JString("field"), JInt(dateColumn),
      JObject("base-type" -> JString("type/DateTime"))))
    def ge(s: String): JValue = JArray(List(JString(">="), field, JString(s)))
    def lt(s: String): JValue = JArray(List(JString("<"), field, JString(s)))
    (dateStart, dateEnd) match {
      case (Some(a), Some(b)) => JArray(List(JString("and"), ge(a), lt(b)))
      case (Some(a), None) => ge(a)
      case (None, Some(b)) => lt(b)
      case (None, None) => JNothing
    }
  }

  private def datasetQuery(databaseId: Int, tableId: Int,
      query: List[(String, JValue)]): String = {
    val inner = query.filter(_._2 != JNothing)
    JsonMethods.compact(JsonMethods.render(JObject(
      "type" -> JString("query"),
      "database" -> JInt(databaseId),
      "query" -> JObject(("source-table" -> (JInt(tableId): JValue)) :: inner),
      "parameters" -> JArray(Nil))))
  }

  /** MBQL body for min/max of the slice column — the reference's ±1
    * coercion included verbatim (tasks.py:69-76).
    */
  def minMaxQuery(databaseId: Int, tableId: Int, which: String,
      columnId: BigInt, filter: JValue = JNothing): String = {
    require(which == "min" || which == "max", s"which must be min/max, got $which")
    val field: JValue = JArray(List(JString("field"), JInt(columnId),
      JObject("base-type" -> JString("type/Text"))))
    val plusMinus: JValue = JArray(List(JString("+"),
      JArray(List(JString("-"), field, JInt(1))), JInt(1)))
    datasetQuery(databaseId, tableId, List(
      "aggregation" -> JArray(List(JArray(List(JString(which), plusMinus)))),
      "filter" -> filter))
  }

  /** MBQL body for a row count (tasks.py:131-139). */
  def countQuery(databaseId: Int, tableId: Int,
      filter: JValue = JNothing): String =
    datasetQuery(databaseId, tableId, List(
      "aggregation" -> JArray(List(JArray(List(JString("count"))))),
      "filter" -> filter))

  /** MBQL body for one half-open slice `[lo, hi)` of the slice column
    * (tasks.py:181-204); integer columns pass numeric bounds, other types
    * stringified — the reference's `column_type == "Integer"` switch.
    */
  def sliceQuery(databaseId: Int, tableId: Int, columnId: BigInt,
      columnType: String, lo: Long, hi: Long): String = {
    val field: JValue = JArray(List(JString("field"), JInt(columnId),
      JObject("base-type" -> JString(s"type/$columnType"))))
    def bound(v: Long): JValue =
      if (columnType == "Integer") JInt(v) else JString(v.toString)
    datasetQuery(databaseId, tableId, List(
      "filter" -> JArray(List(JString("and"),
        JArray(List(JString(">="), field, bound(lo))),
        JArray(List(JString("<"), field, bound(hi)))))))
  }

  /** POST an MBQL body to `/api/dataset/csv` and return the CSV text. */
  def datasetCsv(baseUrl: String, token: String, mbqlJson: String,
      timeoutMs: Int = 600000): String = {
    val form = "query=" + URLEncoder.encode(mbqlJson, StandardCharsets.UTF_8)
    val (code, body) = post(s"$baseUrl/api/dataset/csv",
      Seq("X-Metabase-Session" -> token,
        "Content-Type" -> "application/x-www-form-urlencoded"),
      form, timeoutMs)
    if (code >= 400)
      throw new java.io.IOException(s"Metabase query failed: HTTP $code ${body.take(200)}")
    body
  }

  /** The reference's scalar-CSV parse: first integer on the line after the
    * header (tasks.py:87-88, `re.search(r"\n(\d+)")`). None = the window
    * selected no rows (the CSV is header-only). A PRESENT data row that the
    * regex cannot parse (negative, non-numeric) throws instead of returning
    * None — conflating the two would silently return zero slices and drop
    * the whole extraction, where the reference (`.group(1)` on a failed
    * search) fails loudly.
    */
  def firstDataValueOpt(csv: String): Option[Long] = {
    val parsed = "\\n(\\d+)".r.findFirstMatchIn(csv).map(_.group(1).toLong)
    if (parsed.isEmpty && csvRowCount(csv) > 0)
      throw new IllegalArgumentException(
        s"unparseable scalar data row (not a non-negative integer): ${csv.take(100)}")
    parsed
  }

  def firstDataValue(csv: String): Long =
    firstDataValueOpt(csv).getOrElse(throw new IllegalArgumentException(
      s"no numeric data row in CSV: ${csv.take(100)}"))

  /** Data-row count of a CSV body, quote-aware: newlines inside quoted
    * fields are field CONTENT, not row breaks (Metabase quotes free-text
    * columns, so embedded newlines are routine — a raw split("\n") count
    * would spuriously trip the truncation guard). Escaped quotes ("")
    * toggle the state twice, which cancels out.
    */
  def csvRowCount(csv: String): Long = {
    var rows = 0L
    var inQuote = false
    var lineHasContent = false
    var i = 0
    while (i < csv.length) {
      csv.charAt(i) match {
        case '"' => inQuote = !inQuote; lineHasContent = true
        case '\n' if !inQuote =>
          if (lineHasContent) rows += 1
          lineHasContent = false
        case '\r' => ()
        case _ => lineHasContent = true
      }
      i += 1
    }
    if (lineHasContent) rows += 1
    math.max(0L, rows - 1) // minus the header
  }

  /** Non-unique slice columns: shrink the slice size by the measured
    * lines-per-id ratio so a slice still bounds ROWS, not ids
    * (tasks.py:141-151, integer semantics preserved). A ratio below 1
    * leaves the size unchanged.
    *
    * NOTE the reference divides the count by `slice_size` — an estimate
    * that is only the true lines-per-id when the id SPAN happens to equal
    * the slice size. [[extractAll]] knows the actual span and uses
    * [[adjustSliceSizeBySpan]]; this form is kept for reference parity.
    */
  def adjustSliceSize(totalRows: Long, sliceSize: Int): Int = {
    require(sliceSize > 0, "sliceSize must be positive")
    val linesPerId = totalRows / sliceSize
    if (linesPerId <= 1) sliceSize else (sliceSize / linesPerId).toInt.max(1)
  }

  /** The exact form: lines-per-id = total rows / id span, so a slice of
    * `adjusted` ids holds ≈ `sliceSize` rows whatever the span is. With
    * the reference's divisor a wide-span table under-shrinks (slices blow
    * past the 1M cap and the truncation guard aborts) and a narrow-span
    * table over-shrinks (queries multiply).
    */
  def adjustSliceSizeBySpan(totalRows: Long, idSpan: Long, sliceSize: Int): Int = {
    require(sliceSize > 0, "sliceSize must be positive")
    require(idSpan > 0, "idSpan must be positive")
    val linesPerId = totalRows / idSpan
    if (linesPerId <= 1) sliceSize else (sliceSize / linesPerId).toInt.max(1)
  }

  /** Half-open slice bounds from `range(min, max, size)` (tasks.py:153-157):
    * each slice is `[lo, lo + size)`; the last may overshoot `max`, which
    * the `<` filter renders harmless.
    */
  def halfOpenSlices(min: Long, max: Long, sliceSize: Int): Seq[(Long, Long)] = {
    require(sliceSize > 0, "sliceSize must be positive")
    require(min <= max, s"min $min > max $max")
    (min until max by sliceSize.toLong).map(lo => (lo, lo + sliceSize))
  }

  /** Drain every slice of a table: token → min/max → (optional count-based
    * size adjustment for non-unique slice columns) → per-slice CSV with the
    * truncation guard. Returns the per-slice CSV texts, ready to land via
    * `spark.read.csv` over a Dataset[String].
    */
  def extractAll(baseUrl: String, token: String, databaseId: Int,
      tableId: Int, columnId: BigInt, columnType: String, sliceSize: Int,
      sliceColumnUnique: Boolean, filter: JValue = JNothing,
      rowCap: Long = RowCap): Seq[String] = {
    // an empty window is a RESULT, not an error (the sibling readers'
    // convention: EsScrollReader returns None, MongoSliceReader validates
    // trivially at zero) — min/max aggregates come back with no data row
    val loOpt = firstDataValueOpt(datasetCsv(baseUrl, token,
      minMaxQuery(databaseId, tableId, "min", columnId, filter)))
    val hiOpt = firstDataValueOpt(datasetCsv(baseUrl, token,
      minMaxQuery(databaseId, tableId, "max", columnId, filter)))
    (loOpt, hiOpt) match {
      case (Some(lo), Some(hi)) =>
        val size = if (sliceColumnUnique) sliceSize else adjustSliceSizeBySpan(
          firstDataValue(datasetCsv(baseUrl, token,
            countQuery(databaseId, tableId, filter))), hi - lo + 1, sliceSize)
        halfOpenSlices(lo, hi + 1, size).map { case (a, b) =>
          val csv = datasetCsv(baseUrl, token,
            sliceQuery(databaseId, tableId, columnId, columnType, a, b))
          // quote-aware count: embedded newlines in quoted fields must not
          // inflate the row count into a spurious truncation abort
          // (the reference treats EXACTLY the cap as truncation, tasks.py:211)
          SlicePlanner.assertNotTruncated(csvRowCount(csv), rowCap)
          csv
        }
      case _ => Nil
    }
  }
}
