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
    * Table names are made UNIQUE here, collision-aware (`a`, `a_2`, …, and
    * a clash with a naturally-occurring `a_2` keeps probing to `a_2_2`),
    * and each entry extracts to `<table>.csv` — two entries in different
    * zip directories with the same base name (layerA/points.csv,
    * layerB/points.csv) land as distinct files instead of silently
    * overwriting each other.
    */
  def extractCsvEntries(zipPath: String, destDir: String): Seq[(String, String)] = {
    val zf = new java.util.zip.ZipFile(zipPath)
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(destDir))
      val taken = scala.collection.mutable.Set.empty[String]
      zf.entries().asScala.toSeq
        .filter(e => !e.isDirectory && e.getName.toLowerCase.endsWith(".csv"))
        .map { e =>
          val base = new java.io.File(e.getName).getName
          val sanitized = sanitizeTableName(base.replaceAll("(?i)\\.csv$", ""))
          var table = sanitized
          var n = 1
          while (!taken.add(table)) { n += 1; table = s"${sanitized}_$n" }
          val out = new java.io.File(destDir, s"$table.csv")
          val in = zf.getInputStream(e)
          try java.nio.file.Files.copy(in, out.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
          table -> out.getAbsolutePath
        }
    } finally zf.close()
  }

  /** Read every CSV layer of an exported-GDB zip as a string-typed,
    * column-conformed DataFrame (the reference's landing shape). Table
    * names come back already-unique from [[extractCsvEntries]] — silent
    * overwrites of a layer would be data loss.
    */
  def readAll(spark: SparkSession, zipPath: String,
      destDir: String): Seq[(String, DataFrame)] = {
    extractCsvEntries(zipPath, destDir).map { case (table, path) =>
      table -> graft.functions.SchemaConform.conform(
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
