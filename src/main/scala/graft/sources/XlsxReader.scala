package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal XLSX reader with no external dependency: an .xlsx is a ZIP
  * (java.util.zip) of XML parts (javax.xml.stream — both in the JDK). The
  * reference converts uploaded spreadsheets to all-string staging tables
  * (datalake/utils/data_transformations.py:69-139); this covers that use
  * without POI, which the dependency budget excludes.
  *
  * Supported: shared strings (incl. rich-text runs), inline strings,
  * numeric/boolean/formula-cached cells (landed as their raw stored text —
  * date cells therefore surface as Excel serial numbers, faithful to the
  * file's storage), sparse rows (missing cells → null), sheet selection by
  * name via workbook.xml + its rels. One task per file via `binaryFile`,
  * like [[DbfReader]] — spreadsheet corpora parallelize by file count.
  */
object XlsxReader {

  private val xif = {
    val f = XMLInputFactory.newInstance()
    // no DTDs/external entities — spreadsheet XML needs neither
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** All ZIP entries we care about, as name → bytes. */
  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var e = zis.getNextEntry
    while (e != null) {
      val name = e.getName
      if (name == "xl/workbook.xml" || name == "xl/_rels/workbook.xml.rels" ||
          name == "xl/sharedStrings.xml" || name.startsWith("xl/worksheets/"))
        out += name -> zis.readAllBytes()
      zis.closeEntry()
      e = zis.getNextEntry
    }
    out.result()
  }

  /** sharedStrings.xml → indexed strings; rich-text runs concatenate. */
  private def sharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val r = xif.createXMLStreamReader(new ByteArrayInputStream(bytes))
    val out = IndexedSeq.newBuilder[String]
    var current: StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => current = new StringBuilder
            case "t" => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT && current != null =>
          current.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => out += current.toString; current = null
            case _ =>
          }
        case _ =>
      }
    }
    out.result()
  }

  /** A1-style reference → 0-based column index ("C7" → 2). */
  private[sources] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  /** Sheet name → worksheet part path, via workbook.xml + its rels. */
  private def sheetPath(entries: Map[String, Array[Byte]], name: String): Option[String] = {
    for {
      wb <- entries.get("xl/workbook.xml")
      rels <- entries.get("xl/_rels/workbook.xml.rels")
      rid <- {
        val r = xif.createXMLStreamReader(new ByteArrayInputStream(wb))
        var found: Option[String] = None
        while (r.hasNext && found.isEmpty) {
          if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet" &&
              r.getAttributeValue(null, "name") == name)
            found = (0 until r.getAttributeCount)
              .find(i => r.getAttributeLocalName(i) == "id")
              .map(r.getAttributeValue)
        }
        found
      }
      target <- {
        val r = xif.createXMLStreamReader(new ByteArrayInputStream(rels))
        var found: Option[String] = None
        while (r.hasNext && found.isEmpty) {
          if (r.next() == XMLStreamConstants.START_ELEMENT &&
              r.getLocalName == "Relationship" &&
              r.getAttributeValue(null, "Id") == rid)
            found = Option(r.getAttributeValue(null, "Target"))
        }
        found.map(t => if (t.startsWith("/")) t.drop(1)
                       else if (t.startsWith("xl/")) t else s"xl/$t")
      }
    } yield target
  }

  /** Decode one sheet to rows of Option[String] (None = absent cell). */
  def decode(bytes: Array[Byte], sheet: Option[String] = None): Seq[Seq[Option[String]]] = {
    val entries = zipEntries(bytes)
    val shared = entries.get("xl/sharedStrings.xml").map(sharedStrings)
      .getOrElse(IndexedSeq.empty)
    val path = sheet match {
      case Some(s) => sheetPath(entries, s).getOrElse(
        throw new IllegalArgumentException(s"sheet '$s' not found"))
      case None => entries.keys.filter(_.startsWith("xl/worksheets/")).toSeq
        .sorted.headOption.getOrElse(
          throw new IllegalArgumentException("xlsx has no worksheets"))
    }
    val r = xif.createXMLStreamReader(new ByteArrayInputStream(entries(path)))
    val rows = Seq.newBuilder[Seq[Option[String]]]
    var row: scala.collection.mutable.ArrayBuffer[Option[String]] = null
    var cellCol = 0
    var cellType = ""
    var text: StringBuilder = null
    var capture = false
    def pad(to: Int): Unit = while (row.size < to) row += None
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => row = scala.collection.mutable.ArrayBuffer.empty; cellCol = 0
          case "c" if row != null =>
            cellCol = Option(r.getAttributeValue(null, "r")).map(colIndex)
              .getOrElse(row.size)
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
          case "v" | "t" if row != null => capture = true; text = new StringBuilder
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS if capture => text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" | "t" if capture =>
            capture = false
            val v = cellType match {
              case "s" =>
                val i = text.toString.trim.toInt
                if (i >= 0 && i < shared.size) shared(i) else ""
              case _ => text.toString
            }
            pad(cellCol)
            if (row.size == cellCol) row += Some(v) else row(cellCol) = Some(v)
          case "row" => rows += row.toSeq; row = null
          case _ =>
        }
        case _ =>
      }
    }
    rows.result()
  }

  /** Read .xlsx files into an all-string DataFrame: first row = header
    * (conformed names), every file must share the first file's header.
    */
  def read(spark: SparkSession, path: String, sheet: Option[String] = None): DataFrame = {
    val files = spark.read.format("binaryFile").load(path).select("path", "content")
    val first = files.limit(1).collect().headOption
      .getOrElse(throw new IllegalArgumentException(s"no files at $path"))
    val firstRows = decode(first.getAs[Array[Byte]]("content"), sheet)
    require(firstRows.nonEmpty, s"empty sheet in ${first.getAs[String]("path")}")
    val header = firstRows.head.map(_.getOrElse("").trim)
    val width = header.size
    val headerB = spark.sparkContext.broadcast(header)
    val sheetB = spark.sparkContext.broadcast(sheet)
    val rows = files.rdd.flatMap { r =>
      val all = decode(r.getAs[Array[Byte]]("content"), sheetB.value)
      require(all.nonEmpty && all.head.map(_.getOrElse("").trim) == headerB.value,
        s"XLSX header mismatch in ${r.getAs[String]("path")}")
      all.drop(1).map { cells =>
        Row.fromSeq(cells.padTo(width, None).take(width).map(_.orNull))
      }
    }
    val schema = StructType(header.map(h =>
      StructField(graft.functions.SchemaConform.conformName(h), StringType)))
    spark.createDataFrame(rows, schema)
  }
}
