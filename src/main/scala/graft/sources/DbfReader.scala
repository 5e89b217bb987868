package graft.sources

import java.nio.charset.Charset
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal dBase III (.dbf) decoder — the reference converts DATASUS
  * DBF/DBC files with pyreaddbc + Dbf5 before upload (reference:
  * datalake/utils/data_transformations.py:95-139). Spark has no builtin, so
  * this is the small fixed-format parser ported as a decoder over the
  * `binaryFile` source: header carries record size and per-field
  * (name, length) descriptors; records are fixed-width text rows.
  *
  * All fields land as trimmed strings (the reference's all-string staging).
  * Deleted records (flag '*') are skipped. One task per file — DBF files
  * are small; corpus-level parallelism comes from the file listing. `.dbc`
  * files (the same payload behind a PKWare-imploded block) are detected by
  * extension and routed through [[Implode.dbcToDbf]] before decoding.
  */
object DbfReader {

  final case class FieldDesc(name: String, length: Int)

  final case class DbfFile(fields: Seq[FieldDesc], records: Seq[Seq[String]])

  /** Decode a whole .dbf payload. Pure function — unit-testable. */
  def decode(bytes: Array[Byte], charset: String = "ISO-8859-1"): DbfFile = {
    require(bytes.length >= 32, "truncated DBF header")
    def u8(i: Int): Int = bytes(i) & 0xFF
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int): Long = u16(i).toLong | (u16(i + 2).toLong << 16)
    val nRecords = u32(4)
    val headerLen = u16(8)
    val recordLen = u16(10)
    val cs = Charset.forName(charset)
    // field descriptors: 32 bytes each from offset 32 until 0x0D terminator
    val fields = Iterator.from(0)
      .map(i => 32 + 32 * i)
      .takeWhile(off => off + 32 <= headerLen && u8(off) != 0x0D)
      .map { off =>
        val nameEnd = (off until off + 11).find(j => bytes(j) == 0).getOrElse(off + 11)
        FieldDesc(new String(bytes, off, nameEnd - off, cs).trim, u8(off + 16))
      }.toSeq
    require(fields.map(_.length).sum + 1 == recordLen,
      s"field lengths ${fields.map(_.length).sum}+1 != record length $recordLen")
    val records = (0L until nRecords).flatMap { r =>
      val off = headerLen + r.toInt * recordLen
      if (off + recordLen > bytes.length || u8(off) == '*') None // deleted/truncated
      else {
        var p = off + 1
        Some(fields.map { f =>
          val v = new String(bytes, p, f.length, cs).trim
          p += f.length
          v
        })
      }
    }
    DbfFile(fields, records)
  }

  /** Read one or more .dbf files into a DataFrame of trimmed strings.
    * Every file must carry the SAME field layout as the reference file the
    * schema was taken from — a mismatching file fails loudly with both
    * layouts named instead of zipping values against the wrong columns
    * (DATASUS layouts drift between monthly drops).
    */
  /** `.dbc` → decompress to DBF bytes first; `.dbf` → as-is. */
  private def toDbfBytes(path: String, content: Array[Byte]): Array[Byte] =
    if (path.toLowerCase.endsWith(".dbc")) Implode.dbcToDbf(content) else content

  def read(spark: SparkSession, path: String, charset: String = "ISO-8859-1"): DataFrame = {
    val files = spark.read.format("binaryFile").load(path)
      .select("path", "content")
    val first = files.limit(1).collect().headOption
      .getOrElse(throw new IllegalArgumentException(s"no files at $path"))
    val firstBytes = toDbfBytes(first.getAs[String]("path"), first.getAs[Array[Byte]]("content"))
    val expectedFields = decode(firstBytes, charset).fields
    val expected = spark.sparkContext.broadcast(expectedFields)
    val decoded = files.rdd.flatMap { row =>
      val p = row.getAs[String]("path")
      val dbf = decode(toDbfBytes(p, row.getAs[Array[Byte]]("content")), charset)
      require(dbf.fields == expected.value,
        s"DBF layout mismatch in $p: " +
          s"${dbf.fields.map(_.name).mkString(",")} vs expected " +
          expected.value.map(_.name).mkString(","))
      dbf.records.map(vals => Row.fromSeq(vals))
    }
    val schema = StructType(expectedFields
      .map(f => StructField(graft.functions.SchemaConform.conformName(f.name), StringType)))
    spark.createDataFrame(decoded, schema)
  }
}
