package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}
import graft.SparkSpec

/** Fixture builder: hand-assembled minimal .xlsx (ZIP + XML), independent
  * of the reader's parsing path.
  */
object TestXlsx {
  private def zip(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  /** Two sheets, shared strings (one with rich-text runs), inline string,
    * numeric + sparse cells.
    */
  def sample: Array[Byte] = zip(
    "xl/workbook.xml" ->
      """<?xml version="1.0"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |  <sheets>
        |    <sheet name="Dados" sheetId="1" r:id="rId1"/>
        |    <sheet name="Outra" sheetId="2" r:id="rId2"/>
        |  </sheets>
        |</workbook>""".stripMargin,
    "xl/_rels/workbook.xml.rels" ->
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |  <Relationship Id="rId1" Type="ws" Target="worksheets/sheet1.xml"/>
        |  <Relationship Id="rId2" Type="ws" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin,
    "xl/sharedStrings.xml" ->
      """<?xml version="1.0"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
        |  <si><t>Nome Completo</t></si>
        |  <si><t>Valor Total</t></si>
        |  <si><r><t>Ma</t></r><r><t>ria</t></r></si>
        |</sst>""".stripMargin,
    "xl/worksheets/sheet1.xml" ->
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheetData>
        |    <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |    <row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>12.5</v></c></row>
        |    <row r="3"><c r="A3" t="inlineStr"><is><t>João</t></is></c></row>
        |    <row r="4"><c r="B4"><v>7</v></c></row>
        |  </sheetData>
        |</worksheet>""".stripMargin,
    "xl/worksheets/sheet2.xml" ->
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheetData>
        |    <row r="1"><c r="A1" t="inlineStr"><is><t>k</t></is></c></row>
        |    <row r="2"><c r="A2"><v>42</v></c></row>
        |  </sheetData>
        |</worksheet>""".stripMargin)
}

class XlsxReaderSpec extends SparkSpec {

  test("colIndex decodes A1-style references") {
    assert(XlsxReader.colIndex("A1") == 0)
    assert(XlsxReader.colIndex("C7") == 2)
    assert(XlsxReader.colIndex("Z9") == 25)
    assert(XlsxReader.colIndex("AA12") == 26)
    assert(XlsxReader.colIndex("AZ3") == 51)
  }

  test("decode: shared strings, rich runs, inline, numeric, sparse cells") {
    val rows = XlsxReader.decode(TestXlsx.sample)
    assert(rows == Seq(
      Seq(Some("Nome Completo"), Some("Valor Total")),
      Seq(Some("Maria"), Some("12.5")),
      Seq(Some("João")),
      Seq(None, Some("7"))))
  }

  test("decode: sheet selection by name via workbook rels") {
    val rows = XlsxReader.decode(TestXlsx.sample, Some("Outra"))
    assert(rows == Seq(Seq(Some("k")), Seq(Some("42"))))
    intercept[IllegalArgumentException](
      XlsxReader.decode(TestXlsx.sample, Some("Nope")))
  }

  test("read: all-string DataFrame with conformed header, nulls for gaps") {
    val dir = Files.createTempDirectory("xlsx").toString
    Files.write(Path.of(dir, "a.xlsx"), TestXlsx.sample)
    val df = XlsxReader.read(spark, s"$dir/a.xlsx")
    assert(df.columns.toSeq == Seq("nome_completo", "valor_total"))
    val rows = df.collect().map(r => (Option(r.getString(0)), Option(r.getString(1)))).toSet
    assert(rows == Set(
      (Some("Maria"), Some("12.5")),
      (Some("João"), None),
      (None, Some("7"))))
  }

  test("writer round-trip: write(df) then read back, nulls and escapes intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("xlsxw").toString
    val df = Seq(
      ("a & <b>", Some(1), Some("x\"y")),
      ("linha2", None, None),
      ("acentuação çãé", Some(3), Some("ok"))
    ).toDF("nome", "valor", "obs")
    XlsxWriter.write(df, s"$dir/out.xlsx", sheetName = "Relatório")
    val back = XlsxReader.read(spark, s"$dir/out.xlsx", sheet = Some("Relatório"))
    assert(back.columns.toSeq == Seq("nome", "valor", "obs"))
    val rows = back.collect()
      .map(r => (r.getString(0), Option(r.getString(1)), Option(r.getString(2)))).toSet
    assert(rows == Set(
      ("a & <b>", Some("1"), Some("x\"y")),
      ("linha2", None, None),
      ("acentuação çãé", Some("3"), Some("ok"))))
  }

  test("writer colLetters and maxRows guard") {
    assert(XlsxWriter.colLetters(0) == "A")
    assert(XlsxWriter.colLetters(25) == "Z")
    assert(XlsxWriter.colLetters(26) == "AA")
    assert(XlsxWriter.colLetters(51) == "AZ")
    import spark.implicits._
    val big = (1 to 20).toDF("n")
    val dir = Files.createTempDirectory("xlsxg").toString
    intercept[IllegalArgumentException](
      XlsxWriter.write(big, s"$dir/big.xlsx", maxRows = 10))
  }
}
