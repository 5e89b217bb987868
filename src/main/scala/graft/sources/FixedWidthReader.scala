package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-width record reader — the reference's OpenBase extractor reads a
  * data dictionary of (field, offset, length) and slices each fixed-length
  * record (prontuario_gcs/tasks.py:231-323 + utils.py). Spark-first: read
  * lines with the text source (splittable, streamed) and project
  * `substring` slices — a pure codegen'd projection, no per-row parser
  * object, so the scan is IO-bound even at lake scale.
  */
object FixedWidthReader {

  /** Field spec: 1-based char offset + length, all landing as string (the
    * reference lands everything string-typed; typing is a later view).
    */
  final case class Field(name: String, offset: Int, length: Int)

  /** Derive cumulative offsets from a (name, length) dictionary. */
  def dictionary(fields: Seq[(String, Int)]): Seq[Field] =
    fields.scanLeft(Field("", 1, 0)) { case (prev, (n, len)) =>
      Field(n, prev.offset + prev.length, len)
    }.tail

  def read(spark: SparkSession, path: String, fields: Seq[Field]): DataFrame = {
    val lines = spark.read.text(path)
    lines.select(fields.map(f =>
      trim(substring(col("value"), f.offset, f.length)).as(f.name)): _*)
  }

  /** Same projection over an existing single string column (e.g. after a
    * custom decode of binary records).
    */
  def project(df: DataFrame, valueCol: String, fields: Seq[Field]): DataFrame =
    df.select(fields.map(f =>
      trim(substring(col(valueCol), f.offset, f.length)).as(f.name)): _*)
}
