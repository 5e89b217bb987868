package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.time.Instant

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec

/** LIVE-protocol cloud-store fetches: one in-JVM HTTP server plays the
  * GCS JSON API (listing with metadata + alt=media download), an Azure
  * blob account (SAS-gated GET), and the Sheets values API; the readers
  * drive them end-to-end including the window/suffix filters and the
  * all-string landing.
  */
class CloudStoreLiveSpec extends SparkSpec {

  private val objects = Seq(
    ("reports/daily_0601.csv", "2026-06-01T10:00:00Z", "id,v\n1,a\n2,b\n"),
    ("reports/daily_0615.csv", "2026-06-15T10:00:00Z", "id,v\n3,c\n"),
    ("reports/daily_0630.csv", "2026-06-30T10:00:00Z", "id,v\n4,d\n5,e\n"),
    ("reports/readme.txt", "2026-06-20T10:00:00Z", "not a csv"),
    ("reports/notes.csv", "2026-06-20T11:00:00Z",
      "id,note\n1,\"line one\nline two\"\n2,plain\n"),
    // a data row BYTE-IDENTICAL to the header: pandas dtype=str keeps it
    ("reports/echo.csv", "2026-06-21T11:00:00Z", "id,v\nid,v\n7,z\n"))

  private final class FakeCloud {
    val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)

    private def reply(ex: HttpExchange, code: Int, body: Array[Byte],
        ct: String = "application/json"): Unit = {
      ex.getResponseHeaders.set("Content-Type", ct)
      ex.sendResponseHeaders(code, body.length)
      val os = ex.getResponseBody
      try os.write(body) finally os.close()
      ex.close()
    }
    private def replyS(ex: HttpExchange, code: Int, body: String): Unit =
      reply(ex, code, body.getBytes(StandardCharsets.UTF_8))

    // GCS listing + media download — PAGINATED at 2 items per page like
    // the real API pages at 1000: a single-page client would silently
    // truncate the listing
    server.createContext("/storage/v1/b/lake-bucket/o", { ex =>
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      def param(k: String) = q.split("&").collectFirst {
        case p if p.startsWith(s"$k=") =>
          java.net.URLDecoder.decode(p.drop(k.length + 1), StandardCharsets.UTF_8)
      }
      val prefix = param("prefix").getOrElse("")
      val offset = param("pageToken").map(_.toInt).getOrElse(0)
      val matching = objects.filter(_._1.startsWith(prefix))
      val page = matching.slice(offset, offset + 2).map { case (n, u, _) =>
        s"""{"name":"$n","updated":"$u","timeCreated":"$u"}"""
      }
      val next = if (offset + 2 < matching.size)
        s""","nextPageToken":"${offset + 2}"""" else ""
      replyS(ex, 200, s"""{"items":[${page.mkString(",")}]$next}""")
    })
    server.createContext("/download/storage/v1/b/lake-bucket/o/", { ex =>
      val name = java.net.URLDecoder.decode(
        ex.getRequestURI.getPath.stripPrefix("/download/storage/v1/b/lake-bucket/o/"),
        StandardCharsets.UTF_8)
      objects.find(_._1 == name) match {
        case Some((_, _, content)) =>
          reply(ex, 200, content.getBytes(StandardCharsets.UTF_8), "text/csv")
        case None => replyS(ex, 404, """{"error":"no such object"}""")
      }
    })

    // Azure blob: SAS-token-gated GET
    server.createContext("/medicines-container/", { ex =>
      if (Option(ex.getRequestURI.getQuery).forall(!_.contains("sig=abc")))
        replyS(ex, 403, "missing or bad SAS")
      else reply(ex, 200, "col1;col2\nx;y\n".getBytes(StandardCharsets.UTF_8),
        "application/octet-stream")
    })

    // Sheets values API
    server.createContext("/v4/spreadsheets/SHEET123/values/", { ex =>
      val range = ex.getRequestURI.getPath.split("/").last
      if (range != "Plan1") replyS(ex, 404, """{"error":"no such sheet"}""")
      else replyS(ex, 200,
        """{"range":"Plan1!A1:D3","values":[["cnes","nome","ap"],["111","UPA Centro"],["222","Clinica Sul","AP52","extra"]]}""")
    })

    server.start()
    def url = s"http://localhost:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("GCS single-file load over live HTTP lands all-string (dtype=str)") {
    val c = new FakeCloud
    try {
      val df = CloudStoreReader.loadFileFromGcs(spark, c.url, "lake-bucket",
        "reports/daily_0601.csv")
      assert(df.columns.toSeq == Seq("id", "v") && df.count() == 2)
      assert(df.schema.forall(_.dataType.typeName == "string"))
      intercept[UnsupportedOperationException] {
        CloudStoreReader.loadFileFromGcs(spark, c.url, "lake-bucket",
          "reports/readme.txt", fileType = "txt")
      }
      // no driver-local temp file in the read path: the quote-aware record
      // split keeps a quoted embedded newline as ONE record
      val notes = CloudStoreReader.loadFileFromGcs(spark, c.url, "lake-bucket",
        "reports/notes.csv")
      assert(notes.count() == 2)
      assert(notes.collect().map(_.getString(1)).toSet ==
        Set("line one\nline two", "plain"))
      // a data row byte-identical to the header survives: Spark's
      // header=true over a Dataset[String] would drop it in EVERY
      // partition, diverging from pandas dtype=str
      val echo = CloudStoreReader.loadFileFromGcs(spark, c.url, "lake-bucket",
        "reports/echo.csv")
      assert(echo.columns.toSeq == Seq("id", "v"))
      assert(echo.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
        Set(("id", "v"), ("7", "z")))
    } finally c.stop()
  }

  test("splitCsvRecords: quoted newlines stay in-record, CRLF and trailing newline handled") {
    assert(CloudStoreReader.splitCsvRecords("a,b\r\n1,\"x\ny\"\r\n2,z\n") ==
      Seq("a,b", "1,\"x\ny\"", "2,z"))
    assert(CloudStoreReader.splitCsvRecords("only") == Seq("only"))
    // a stray MID-FIELD quote is literal (pandas C-parser semantics): it
    // must not open a quoted run and swallow the next record's newline
    assert(CloudStoreReader.splitCsvRecords("id,desc\n1,6\" nail\n2,x\n") ==
      Seq("id,desc", "1,6\" nail", "2,x"))
    // escaped quotes inside a quoted field stay in-record
    assert(CloudStoreReader.splitCsvRecords("a\n\"say \"\"hi\"\"\nthere\"\nb") ==
      Seq("a", "\"say \"\"hi\"\"\nthere\"", "b"))
  }

  test("GCS bulk load: paginated listing followed to exhaustion; suffix + STRICT updated-window filters") {
    val c = new FakeCloud
    try {
      // the 6-object listing spans 3 pages of the fake's 2-per-page API —
      // a client ignoring nextPageToken would never see the later pages
      assert(CloudStoreReader.gcsList(c.url, "lake-bucket", "reports/")
        .size == 6)
      val got = CloudStoreReader.loadFilesFromGcs(c.url, "lake-bucket",
        "reports/", ".csv",
        updatedAfter = Some(Instant.parse("2026-06-01T10:00:00Z")), // strict >
        updatedBefore = Some(Instant.parse("2026-06-30T10:00:00Z"))) // strict <
        .toSeq // the reader itself streams one object at a time
      // 0601 excluded (not strictly after), 0630 excluded (not strictly
      // before), readme.txt excluded by suffix
      assert(got.map(_._1.name) ==
        Seq("reports/daily_0615.csv", "reports/notes.csv",
          "reports/echo.csv"))
      assert(new String(got.head._2, StandardCharsets.UTF_8).startsWith("id,v"))
    } finally c.stop()
  }

  test("Azure blob download over live HTTP: SAS enforced, dated filename switch") {
    val c = new FakeCloud
    val dir = java.nio.file.Files.createTempDirectory("az").toString
    try {
      val path = CloudStoreReader.downloadAzureBlob(s"${c.url}/",
        "medicines-container", "estoque/latest.csv", dir, "estoque",
        credential = Some("sig=abc"), addLoadDateToFilename = true,
        loadDate = Some("2026-08-13"))
      assert(path == s"$dir/estoque_2026-08-13.csv")
      assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), StandardCharsets.UTF_8)
        .startsWith("col1;col2"))
      // bad SAS is loud
      intercept[java.io.IOException] {
        CloudStoreReader.downloadAzureBlob(s"${c.url}/", "medicines-container",
          "estoque/latest.csv", dir, "x", credential = Some("sig=WRONG"))
      }
    } finally c.stop()
  }

  test("Sheets worksheet lands as delimiter CSV rectangularized to the WIDEST row") {
    val c = new FakeCloud
    val dir = java.nio.file.Files.createTempDirectory("gs").toString
    try {
      val path = CloudStoreReader.downloadSheetAsCsv(c.url,
        "https://docs.google.com/spreadsheets/d/SHEET123/edit", "Plan1",
        dir, "unidades", csvDelimiter = ";")
      val text = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), StandardCharsets.UTF_8)
      // gspread rectangularizes to the WIDEST row: the 4-cell data row
      // widens the grid — header and short rows pad, nothing truncates
      assert(text ==
        "cnes;nome;ap;\n111;UPA Centro;;\n222;Clinica Sul;AP52;extra")
      // the landing is readable by the standard CSV path (the widened 4th
      // column has an empty header cell → Spark's placeholder name)
      val df = spark.read.option("header", "true").option("sep", ";").csv(path)
      assert(df.count() == 2 &&
        df.columns.toSeq.take(3) == Seq("cnes", "nome", "ap") &&
        df.columns.size == 4)
      // URL validation mirrors the reference
      intercept[IllegalArgumentException] {
        CloudStoreReader.spreadsheetIdFromUrl("https://example.com/nope")
      }
    } finally c.stop()
  }
}
