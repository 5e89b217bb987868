package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Zip-of-CSVs ingestion — the actual wire format of the reference's "GDB"
  * flow: the ESRI geodatabase is exported UPSTREAM (outside the reference
  * codebase too); what the flow consumes is a zip whose entries are one CSV
  * per GDB layer, read string-typed in chunks, column-conformed, jsonified
  * and landed (reference: extract_gdb/tasks.py:100-214,
  * extract_gdb/utils.py:167-232). This closes the extract_gdb gap at the
  * same layer the reference operates: no binary FileGDB decode exists there
  * either.
  *
  * The unzip is a driver-side staging step (same as the reference's
  * single-node tempdir extract); each extracted CSV is then read by the
  * distributed [[CsvReader]], so table size is bounded by the cluster, not
  * the driver — only the archive staging is single-node, exactly once.
  */
object ZipCsv {

  /** Table name from a CSV entry name, the reference's sanitization
    * (extract_gdb/tasks.py:150-156): keep `[A-Za-z0-9_]`, everything else
    * → `_`, runs of 3+ underscores collapse to `__`.
    */
  def sanitizeTableName(name: String): String =
    name.stripSuffix(".csv").trim
      .replaceAll("[^A-Za-z0-9_]", "_")
      .replaceAll("_{3,}", "__")

  /** Extract every `.csv` entry of `zipPath` into `destDir`, returning
    * (table name → extracted file path) in entry order. Entry paths are
    * FLATTENED to their base name (also forecloses zip-slip traversal —
    * an entry named `../../x.csv` lands as `x.csv` inside `destDir`).
    */
  def extractCsvEntries(zipPath: String, destDir: String): Seq[(String, String)] = {
    val zf = new java.util.zip.ZipFile(zipPath)
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(destDir))
      zf.entries().asScala.toSeq
        .filter(e => !e.isDirectory && e.getName.toLowerCase.endsWith(".csv"))
        .map { e =>
          val base = new java.io.File(e.getName).getName
          val out = new java.io.File(destDir, base)
          val in = zf.getInputStream(e)
          try java.nio.file.Files.copy(in, out.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
          sanitizeTableName(base) -> out.getAbsolutePath
        }
    } finally zf.close()
  }

  /** Read every CSV layer of an exported-GDB zip as a string-typed,
    * column-conformed DataFrame (the reference's landing shape). Duplicate
    * table names after sanitization get `_2`, `_3`, … suffixes — silent
    * overwrites of a layer would be data loss.
    */
  def readAll(spark: SparkSession, zipPath: String,
      destDir: String): Seq[(String, DataFrame)] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    extractCsvEntries(zipPath, destDir).map { case (table, path) =>
      val n = seen.updateWith(table)(c => Some(c.getOrElse(0) + 1)).get
      val unique = if (n == 1) table else s"${table}_$n"
      unique -> graft.functions.SchemaConform.conform(
        CsvReader.read(spark, path))
    }
  }

  /** The reference's full landing shape for one layer: payload columns
    * packed into a single JSON column plus audit metadata
    * (`jsonify_dataframe` + `_source_file`, extract_gdb/tasks.py:199-214).
    */
  def landed(df: DataFrame, sourceFile: String): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.operators.JsonNormalize.pack(df, df.columns.toSeq, as = "json")
      .withColumn("_source_file", lit(sourceFile))
  }
}
