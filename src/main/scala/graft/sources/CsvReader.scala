package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.SchemaConform

/** CSV landing reader with the reference's robustness options: explicit
  * separator, encoding with CP1252 fallback, header promotion, all-string
  * typing, conformed column names (reference:
  * datalake/utils/data_transformations.py:69-139 and the chunked
  * encoding-fallback reader at vitacare_gdrive/tasks.py:98-242).
  *
  * Spark streams splits natively, so the reference's 200k-line chunking
  * disappears; encoding fallback is a retry at the reader level (malformed
  * byte sequences under the wrong charset surface as parse errors or
  * replacement chars — we sniff via a small driver-side sample).
  */
object CsvReader {

  final case class Options(
      sep: String = ",",
      encoding: String = "UTF-8",
      header: Boolean = true,
      quote: String = "\"",
      multiLine: Boolean = false)

  def read(spark: SparkSession, path: String, opts: Options = Options()): DataFrame = {
    val df = spark.read
      .option("sep", opts.sep)
      .option("encoding", opts.encoding)
      .option("header", opts.header.toString)
      .option("quote", opts.quote)
      .option("multiLine", opts.multiLine.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)
    SchemaConform.conform(df)
  }

  /** UTF-8 → CP1252 fallback: if the UTF-8 read produced replacement
    * characters ANYWHERE in the file, re-read as windows-1252 (the
    * reference's chardet-sniff + fallback).
    *
    * The check is a distributed short-circuit scan, not a head sample: a
    * CP1252 file whose first non-ASCII byte appears late would otherwise be
    * silently kept as mojibake. `filter(any col contains U+FFFD).isEmpty`
    * stops at the first matching row, so the common all-ASCII/valid-UTF-8
    * case still reads each split once.
    */
  def readWithEncodingFallback(spark: SparkSession, path: String,
      opts: Options = Options()): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.StringType
    val utf8 = read(spark, path, opts.copy(encoding = "UTF-8"))
    val strCols = utf8.schema.fields.collect {
      case f if f.dataType == StringType => col(f.name)
    }
    val hasReplacement = strCols.nonEmpty && {
      val pred = strCols.map(_.contains("�")).reduce(_ || _)
      !utf8.filter(pred).isEmpty
    }
    if (hasReplacement) read(spark, path, opts.copy(encoding = "windows-1252"))
    else utf8
  }

  /** Detect the more plausible of `;` vs `,` separators from the first line
    * (driver-side sniff over one small read — not a full scan).
    */
  def sniffSep(spark: SparkSession, path: String): String = {
    val first = spark.read.text(path).limit(1).collect()
      .headOption.map(_.getString(0)).getOrElse("")
    if (first.count(_ == ';') > first.count(_ == ',')) ";" else ","
  }
}
