package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** XML batch reader over Spark 4's built-in XML source (the reference
  * parses DOU gazette XML files element-by-element on the driver,
  * diario_oficial_uniao_api/tasks.py:165-233 — here the parse is
  * distributed and schema-inferred, one task per split).
  */
object XmlReader {

  def read(spark: SparkSession, path: String, rowTag: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    var reader = spark.read.format("xml").option("rowTag", rowTag)
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    graft.functions.SchemaConform.conform(reader.load(path))
  }
}
