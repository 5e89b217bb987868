package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** SQL-dump scan: streams a Postgres/MySQL `.sql` dump and extracts the row
  * tuples of `INSERT INTO <table> (...) VALUES (...), (...);` statements for
  * a target table (reference: the prontuario extractor reassembles
  * multi-line INSERTs by hand, prontuario_gcs/tasks.py:95-228).
  *
  * Spark-first: statements are split at the SOURCE level with
  * `lineSep = ";"` on the text reader — the dump stays splittable and
  * streamed (no whole-file read, no driver chunking), each task parses only
  * its statements. Tuple parsing is a small per-row state machine (quote
  * aware, `''` escapes) in a flatMap — per-partition imperative logic, the
  * legitimate mapPartitions/flatMap case.
  */
object SqlDumpReader {

  /** Split one `VALUES (...),(...)` payload into per-tuple field lists.
    * Handles quoted strings with doubled-quote escapes, NULL, and nested
    * parens inside quotes. Pure function — unit-testable without Spark.
    */
  def parseTuples(values: String): Seq[Seq[Option[String]]] = {
    val out = Seq.newBuilder[Seq[Option[String]]]
    var i = 0
    val n = values.length
    while (i < n) {
      // seek tuple start
      while (i < n && values.charAt(i) != '(') i += 1
      if (i < n) {
        i += 1
        val fields = Seq.newBuilder[Option[String]]
        val cur = new StringBuilder
        var inQuote = false
        var isNull = false
        var depth = 1
        var done = false
        while (i < n && !done) {
          val c = values.charAt(i)
          if (inQuote) {
            if (c == '\'') {
              if (i + 1 < n && values.charAt(i + 1) == '\'') { cur.append('\''); i += 1 }
              else inQuote = false
            } else cur.append(c)
          } else c match {
            case '\'' => inQuote = true
            case '(' => depth += 1; cur.append(c)
            case ')' if depth == 1 =>
              fields += (if (isNull && cur.isEmpty) None else Some(cur.toString.trim))
              done = true
            case ')' => depth -= 1; cur.append(c)
            case ',' if depth == 1 =>
              fields += (if (isNull && cur.isEmpty) None else Some(cur.toString.trim))
              cur.clear(); isNull = false
            case _ =>
              if (!isNull && cur.isEmpty && c == 'N' &&
                  values.regionMatches(i, "NULL", 0, 4)) {
                isNull = true; i += 3
              } else if (!c.isWhitespace || cur.nonEmpty) cur.append(c)
          }
          i += 1
        }
        out += fields.result()
      }
    }
    out.result()
  }

  private val insertRe =
    """(?is)^\s*INSERT\s+INTO\s+[`"]?([\w.]+)[`"]?\s*(?:\([^)]*\))?\s*VALUES\s*(.*)$""".r

  /** Read the dump and emit one row per inserted tuple of `targetTable`,
    * with columns `c0..c{n-1}` (all strings; dumps are untyped text — the
    * reference lands everything string-typed too).
    *
    * Fast path splits statements at `;` in the SOURCE (splittable), which is
    * only sound when no string value contains a semicolon — fragments with
    * unbalanced quotes fail LOUDLY rather than emitting truncated rows.
    * `wholeFile = true` reads one file per task and splits statements with
    * the quote-aware scanner instead (correct for arbitrary values; a file
    * is no longer splittable).
    */
  def read(spark: SparkSession, path: String, targetTable: String,
      numFields: Int, wholeFile: Boolean = false): DataFrame = {
    import spark.implicits._
    val statements: Dataset[String] =
      if (wholeFile)
        spark.read.option("wholetext", "true").text(path).as[String]
          .flatMap(splitStatements)
      else
        spark.read.option("lineSep", ";").text(path).as[String]
          .map { frag =>
            if (frag.count(_ == '\'') % 2 != 0)
              throw new IllegalArgumentException(
                "dump statement was split inside a quoted value (a string " +
                  "contains ';') — re-read with wholeFile = true")
            frag
          }
    val rows = statements.flatMap { stmt =>
      val compact = stmt.replace("\n", " ").replace("\r", " ")
      compact match {
        case insertRe(table, values)
            if table.equalsIgnoreCase(targetTable) ||
              table.toLowerCase.endsWith("." + targetTable.toLowerCase) =>
          parseTuples(values).map(t =>
            (t ++ Seq.fill(math.max(0, numFields - t.size))(None)).take(numFields)
              .map(_.orNull))
        case _ => Nil
      }
    }
    rows.select((0 until numFields).map(i => col("value")(i).as(s"c$i")): _*)
  }

  /** Quote-aware statement split: `;` inside '…' (with '' escapes) does not
    * terminate a statement. Pure function — unit-testable.
    */
  def splitStatements(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQuote) {
        cur.append(c)
        if (c == '\'') {
          if (i + 1 < text.length && text.charAt(i + 1) == '\'') {
            cur.append('\''); i += 1
          } else inQuote = false
        }
      } else if (c == '\'') { inQuote = true; cur.append(c) }
      else if (c == ';') { out += cur.toString; cur.clear() }
      else cur.append(c)
      i += 1
    }
    if (cur.nonEmpty) out += cur.toString
    out.result()
  }
}
