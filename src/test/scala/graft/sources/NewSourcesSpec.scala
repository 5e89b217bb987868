package graft.sources

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class SqlDumpReaderSpec extends SparkSpec {

  test("parseTuples: quotes, escapes, NULLs, nested parens (pure)") {
    val tuples = SqlDumpReader.parseTuples(
      "(1, 'ab''c', NULL, 'x,(y)'), (2, '', NULL, 'z')")
    assert(tuples == Seq(
      Seq(Some("1"), Some("ab'c"), None, Some("x,(y)")),
      Seq(Some("2"), Some(""), None, Some("z"))))
  }

  test("read: extracts only the target table across multi-line INSERTs") {
    val dir = Files.createTempDirectory("dump").toString
    Files.writeString(Path.of(dir, "dump.sql"),
      """CREATE TABLE public.pacientes (id int, nome text);
        |INSERT INTO public.pacientes (id, nome) VALUES
        |(1, 'Maria'),
        |(2, 'Jo''ao');
        |INSERT INTO public.outros (id) VALUES (9);
        |INSERT INTO public.pacientes (id, nome) VALUES (3, NULL);
        |""".stripMargin)
    val df = SqlDumpReader.read(spark, s"$dir/dump.sql", "pacientes", 2)
    val rows = df.collect().map(r => (r.getString(0), Option(r.getString(1))))
      .sortBy(_._1).toSeq
    assert(rows == Seq(("1", Some("Maria")), ("2", Some("Jo'ao")), ("3", None)))
  }
}

class DbfReaderSpec extends SparkSpec {

  /** Hand-build a dBase III file: 2 fields (ID len 3, NOME len 8), 3 records
    * (one flagged deleted).
    */
  private def tinyDbf: Array[Byte] = {
    val fields = Seq(("ID", 3), ("NOME", 8))
    val recordLen = 1 + fields.map(_._2).sum
    val headerLen = 32 + 32 * fields.size + 1
    val records = Seq((" 1", "Maria"), (" 2", "Joao"), (" 3", "Deleted"))
    val buf = java.nio.ByteBuffer.allocate(headerLen + recordLen * 3 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(0x03.toByte).put(24.toByte).put(1.toByte).put(1.toByte) // version, date
    buf.putInt(3)                        // record count
    buf.putShort(headerLen.toShort)      // header length
    buf.putShort(recordLen.toShort)      // record length
    buf.position(32)
    fields.foreach { case (name, len) =>
      val start = buf.position()
      buf.put(name.getBytes("ASCII"))
      buf.position(start + 11)
      buf.put('C'.toByte)                // type char
      buf.position(start + 16)
      buf.put(len.toByte)
      buf.position(start + 32)
    }
    buf.put(0x0D.toByte)
    records.zipWithIndex.foreach { case ((id, nome), i) =>
      buf.put(if (i == 2) '*'.toByte else ' '.toByte)
      buf.put(id.padTo(3, ' ').getBytes("ASCII"))
      buf.put(nome.padTo(8, ' ').getBytes("ASCII"))
    }
    buf.put(0x1A.toByte)
    buf.array()
  }

  test("decode parses header, fields, records; skips deleted (pure)") {
    val dbf = DbfReader.decode(tinyDbf)
    assert(dbf.fields == Seq(DbfReader.FieldDesc("ID", 3), DbfReader.FieldDesc("NOME", 8)))
    assert(dbf.records == Seq(Seq("1", "Maria"), Seq("2", "Joao")))
  }

  test("read lands a conformed all-string DataFrame") {
    val dir = Files.createTempDirectory("dbf").toString
    Files.write(Path.of(dir, "t.dbf"), tinyDbf)
    val df = DbfReader.read(spark, s"$dir/t.dbf")
    assert(df.columns.toSeq == Seq("id", "nome"))
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq ==
      Seq(("1", "Maria"), ("2", "Joao")))
  }

  /** Wrap the DBF fixture as a DATASUS-style .dbc: uncompressed header,
    * 4 CRC bytes, imploded record block.
    */
  private def tinyDbc: Array[Byte] = {
    val dbf = tinyDbf
    val headerLen = (dbf(8) & 0xFF) | ((dbf(9) & 0xFF) << 8)
    val body = java.util.Arrays.copyOfRange(dbf, headerLen, dbf.length)
    val imploded = TestImplodeEncoder.compress(body, lit = 0, dict = 4)
    val out = java.nio.ByteBuffer.allocate(headerLen + 4 + imploded.length)
    out.put(dbf, 0, headerLen)
    out.putInt(0xDEADBEEF) // CRC bytes — ignored by the reader, as in dbc2dbf
    out.put(imploded)
    out.array()
  }

  test("dbcToDbf reconstructs the exact original DBF bytes") {
    val back = Implode.dbcToDbf(tinyDbc)
    assert(back.toSeq == tinyDbf.toSeq)
  }

  test("read decodes .dbc files transparently, mixed with .dbf") {
    val dir = Files.createTempDirectory("dbc").toString
    Files.write(Path.of(dir, "a.dbc"), tinyDbc)
    Files.write(Path.of(dir, "b.dbf"), tinyDbf)
    val df = DbfReader.read(spark, dir)
    assert(df.columns.toSeq == Seq("id", "nome"))
    assert(df.count() == 4) // 2 live records per file
  }
}

class JdbcUpsertWriterSpec extends AnyFunSuite {
  test("upsertSql emits MySQL ON DUPLICATE KEY UPDATE for non-key cols") {
    val sql = JdbcUpsertWriter.upsertSql("t", Seq("id", "a", "b"), Seq("id"))
    assert(sql ==
      "INSERT INTO `t` (`id`, `a`, `b`) VALUES (?, ?, ?) " +
        "ON DUPLICATE KEY UPDATE `a` = VALUES(`a`), `b` = VALUES(`b`)")
  }
  test("all-key tables degrade to a no-op update") {
    val sql = JdbcUpsertWriter.upsertSql("t", Seq("id"), Seq("id"))
    assert(sql.endsWith("ON DUPLICATE KEY UPDATE `id` = `id`"))
  }
  test("ansiMergeSql emits typed-VALUES MERGE with update and insert branches") {
    val sql = JdbcUpsertWriter.ansiMergeSql("t", Seq("id", "a"), Seq("id"),
      Seq("INT", "VARCHAR(32672)"))
    assert(sql ==
      "MERGE INTO t t USING (VALUES (CAST(? AS INT), CAST(? AS VARCHAR(32672)))) " +
        "AS v(id, a) ON t.id = v.id" +
        " WHEN MATCHED THEN UPDATE SET a = v.a" +
        " WHEN NOT MATCHED THEN INSERT (id, a) VALUES (v.id, v.a)")
  }
  test("retry classifier: deadlock retries, constraint violation fails fast") {
    import java.sql.SQLException
    assert(JdbcUpsertWriter.isRetryable(new SQLException("Deadlock found", "40001", 1213)))
    assert(JdbcUpsertWriter.isRetryable(new SQLException("Lock wait timeout exceeded", "HY000", 1205)))
    assert(!JdbcUpsertWriter.isRetryable(new SQLException("Duplicate entry", "23000", 1062)))
  }
  test("withRetries retries then succeeds") {
    var calls = 0
    val r = JdbcUpsertWriter.withRetries(3, 1) {
      calls += 1
      if (calls < 3) throw new java.sql.SQLException("Deadlock found", "40001", 1213)
      42
    }
    assert(r == 42 && calls == 3)
  }
}

class SlicePlannerSpec extends AnyFunSuite {
  test("longRanges covers the space exactly once with near-equal widths") {
    val rs = SlicePlanner.longRanges(1, 10, 3)
    assert(rs == Seq((1L, 4L), (5L, 7L), (8L, 10L)))
    // exhaustive cover, no overlap
    assert(rs.flatMap { case (a, b) => a to b } == (1L to 10L))
    // more slices than values degrades gracefully
    assert(SlicePlanner.longRanges(5, 6, 10).size == 2)
    assert(SlicePlanner.longRanges(5, 5, 3) == Seq((5L, 5L)))
  }
  test("pageCount ceil-divides; truncation guard fires at the cap") {
    assert(SlicePlanner.pageCount(0, 100) == 0)
    assert(SlicePlanner.pageCount(101, 100) == 2)
    SlicePlanner.assertNotTruncated(999999, 1000000)
    assertThrows[IllegalArgumentException](
      SlicePlanner.assertNotTruncated(1000000, 1000000))
  }
}

class XmlReaderSpec extends SparkSpec {
  test("reads row-tagged XML with conformed columns") {
    import java.nio.file.{Files, Path}
    val dir = Files.createTempDirectory("xml").toString
    Files.writeString(Path.of(dir, "t.xml"),
      """<artigos>
        |  <artigo><Título>A</Título><Texto>corpo um</Texto></artigo>
        |  <artigo><Título>B</Título><Texto>corpo dois</Texto></artigo>
        |</artigos>""".stripMargin)
    val df = XmlReader.read(spark, s"$dir/t.xml", rowTag = "artigo")
    assert(df.columns.sorted.toSeq == Seq("texto", "titulo"))
    assert(df.count() == 2)
  }
}

class SqlDumpEdgeSpec extends SparkSpec {
  test("split mode fails loudly on ';' inside values; wholeFile parses them") {
    val dir = Files.createTempDirectory("dump2").toString
    Files.writeString(Path.of(dir, "d.sql"),
      "INSERT INTO t (a, b) VALUES (1, 'x;y');\nINSERT INTO t (a, b) VALUES (2, 'z');\n")
    val ex = intercept[org.apache.spark.SparkException] {
      SqlDumpReader.read(spark, s"$dir/d.sql", "t", 2).collect()
    }
    assert(ex.getMessage.contains("wholeFile") ||
      Option(ex.getCause).exists(_.getMessage.contains("wholeFile")))
    val rows = SqlDumpReader.read(spark, s"$dir/d.sql", "t", 2, wholeFile = true)
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(rows == Seq(("1", "x;y"), ("2", "z")))
  }
  test("splitStatements is quote-aware (pure)") {
    assert(SqlDumpReader.splitStatements("a 'x;y' b; c ''';' d; e") ==
      Seq("a 'x;y' b", " c ''';' d", " e"))
  }
}
