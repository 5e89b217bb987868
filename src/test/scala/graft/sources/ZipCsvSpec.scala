package graft.sources

import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}
import graft.SparkSpec

class ZipCsvSpec extends SparkSpec {

  private def makeZip(entries: (String, String)*): String = {
    val f = java.nio.file.Files.createTempFile("gdb-export", ".zip").toFile
    val zos = new ZipOutputStream(new java.io.FileOutputStream(f))
    try entries.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    } finally zos.close()
    f.getAbsolutePath
  }

  test("table-name sanitization matches the reference's rules") {
    assert(ZipCsv.sanitizeTableName("Estabelecimentos (2024).csv") ==
      "Estabelecimentos__2024_")
    assert(ZipCsv.sanitizeTableName("a - b - c.csv") == "a__b__c")
    assert(ZipCsv.sanitizeTableName("plain_name.csv") == "plain_name")
  }

  test("zip of exported-GDB CSVs lands as conformed, JSON-packed tables") {
    val zip = makeZip(
      "layers/Estabelecimentos (2024).csv" ->
        "Código;Região\n1;Norte\n2;Sul\n".replace(";", ","),
      "layers/Logradouros.csv" -> "ID,Nome Rua\n10,Rua A\n")
    val dest = java.nio.file.Files.createTempDirectory("gdb-dest").toString
    val tables = ZipCsv.readAll(spark, zip, dest).toMap
    assert(tables.keySet == Set("Estabelecimentos__2024_", "Logradouros"))
    val est = tables("Estabelecimentos__2024_")
    // header conformance: accents stripped, lowered
    assert(est.columns.toSeq == Seq("codigo", "regiao"))
    assert(est.count() == 2)
    // all string-typed (the reference's landing contract)
    assert(est.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.StringType))
    // full landing shape: one JSON payload column + source audit column
    val landed = ZipCsv.landed(est, "gs://bucket/export.zip")
    assert(landed.columns.toSeq == Seq("json", "_source_file"))
    val js = landed.select("json").collect().map(_.getString(0)).sorted.toSeq
    assert(js == Seq("""{"codigo":"1","regiao":"Norte"}""",
      """{"codigo":"2","regiao":"Sul"}"""))
  }

  test("duplicate names after sanitization suffix instead of overwriting") {
    val zip = makeZip(
      "a-b.csv" -> "x\n1\n",
      "a b.csv" -> "x\n2\n",
      "notes.txt" -> "ignored")
    val dest = java.nio.file.Files.createTempDirectory("gdb-dup").toString
    val tables = ZipCsv.readAll(spark, zip, dest)
    assert(tables.map(_._1).sorted == Seq("a_b", "a_b_2"))
  }

  test("same base name in different zip directories extracts to distinct files") {
    // layerA/points.csv and layerB/points.csv must NOT overwrite each other
    // on disk after basename flattening
    val zip = makeZip(
      "layerA/points.csv" -> "x\nA\n",
      "layerB/points.csv" -> "x\nB\n")
    val dest = java.nio.file.Files.createTempDirectory("gdb-flatten").toString
    val tables = ZipCsv.readAll(spark, zip, dest).toMap
    assert(tables.keySet == Set("points", "points_2"))
    import spark.implicits._
    assert(tables("points").as[String].collect().toSeq == Seq("A"))
    assert(tables("points_2").as[String].collect().toSeq == Seq("B"))
  }

  test("suffixing is collision-aware against a naturally-occurring _2 name") {
    val zip = makeZip(
      "d1/a.csv" -> "x\n1\n",
      "d2/a.csv" -> "x\n2\n",
      "a_2.csv" -> "x\n3\n")
    val dest = java.nio.file.Files.createTempDirectory("gdb-nat2").toString
    val names = ZipCsv.readAll(spark, zip, dest).map(_._1)
    // second 'a' takes a_2; the real a_2 then probes to a_2_2 — all distinct
    assert(names == Seq("a", "a_2", "a_2_2"))
  }

  test("zip-slip entry names are flattened inside the dest dir") {
    val zip = makeZip("../../escape.csv" -> "x\n1\n")
    val dest = java.nio.file.Files.createTempDirectory("gdb-slip").toString
    val entries = ZipCsv.extractCsvEntries(zip, dest)
    assert(entries.map(_._1) == Seq("escape"))
    assert(entries.head._2.startsWith(dest))
  }
}
