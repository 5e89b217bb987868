package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.DataFrame

/** Minimal XLSX writer with no external dependency — the engine half of the
  * reference's spreadsheet-attachment sink (reference:
  * pipelines/reports/monitoramento_leitos/tasks.py report attachments;
  * SURVEY §2.2 K8): a presentation artifact built from a small, ALREADY
  * AGGREGATED result. Deliberately driver-side and bounded — `maxRows`
  * guards against pointing it at a fact table (a spreadsheet is not a lake
  * sink; LakeWriter is). Mirror of [[XlsxReader]]: one sheet, header row,
  * every value an inline string (`t="inlineStr"`), nulls as absent cells —
  * so `XlsxReader.read(XlsxWriter.write(df))` round-trips all-string
  * results exactly.
  */
object XlsxWriter {

  private def esc(s: String): String = {
    val b = new StringBuilder(s.length + 16)
    s.foreach {
      case '&' => b.append("&amp;")
      case '<' => b.append("&lt;")
      case '>' => b.append("&gt;")
      case '"' => b.append("&quot;")
      case c if c >= ' ' || c == '\t' || c == '\n' || c == '\r' => b.append(c)
      case _ => // strip control chars XML 1.0 cannot carry
    }
    b.toString
  }

  /** 0-based column index → A1-style letters (2 → "C", 26 → "AA"). */
  private[sources] def colLetters(i: Int): String = {
    var n = i + 1
    val b = new StringBuilder
    while (n > 0) {
      val rem = (n - 1) % 26
      b.insert(0, ('A' + rem).toChar)
      n = (n - 1) / 26
    }
    b.toString
  }

  private def sheetXml(header: Seq[String], rows: Seq[Seq[String]]): String = {
    val b = new StringBuilder
    b.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    b.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def writeRow(rowIdx: Int, cells: Seq[String]): Unit = {
      b.append(s"""<row r="$rowIdx">""")
      cells.zipWithIndex.foreach { case (v, c) =>
        if (v != null)
          b.append(s"""<c r="${colLetters(c)}$rowIdx" t="inlineStr"><is><t>${esc(v)}</t></is></c>""")
      }
      b.append("</row>")
    }
    writeRow(1, header)
    rows.zipWithIndex.foreach { case (r, i) => writeRow(i + 2, r) }
    b.append("</sheetData></worksheet>")
    b.toString
  }

  private def workbookXml(sheetName: String): String =
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
      """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
      s"""<sheets><sheet name="${esc(sheetName)}" sheetId="1" r:id="rId1"/></sheets></workbook>"""

  private val workbookRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
      """</Relationships>"""

  private val rootRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
      """</Relationships>"""

  private val contentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
      """</Types>"""

  /** Collect `df` (cast to strings, nulls kept) and write one .xlsx file at
    * the LOCAL `path`. Fails loudly past `maxRows` — this sink is for
    * report-sized results only.
    */
  def write(df: DataFrame, path: String, sheetName: String = "Sheet1",
      maxRows: Int = 100000): Unit = {
    val strings = LakeWriter.allString(df)
    val collected = strings.limit(maxRows + 1).collect()
    require(collected.length <= maxRows,
      s"XlsxWriter is a presentation sink: result exceeds maxRows=$maxRows " +
        "(aggregate first, or raise maxRows deliberately)")
    val header = strings.columns.toSeq
    val rows = collected.toSeq.map(r =>
      header.indices.map(i => r.getAs[String](i)))
    val zos = new ZipOutputStream(
      new BufferedOutputStream(new FileOutputStream(path)))
    try {
      def put(name: String, content: String): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        zos.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", workbookXml(sheetName))
      put("xl/_rels/workbook.xml.rels", workbookRels)
      put("xl/worksheets/sheet1.xml", sheetXml(header, rows))
    } finally zos.close()
  }
}
