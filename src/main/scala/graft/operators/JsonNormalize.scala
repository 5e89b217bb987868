package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Semi-structured payload handling: the reference stores raw API rows as a
  * JSON-string column beside metadata (vitacare_api_v2/tasks.py:179-189)
  * and normalizes nested JSON either flat (pd.json_normalize,
  * minhasaude_mongodb/tasks.py:125) or into parent/child tables with
  * deterministic surrogate keys (cientificalab_api/tasks.py:100-200).
  *
  * Spark-first: `from_json` with an explicit schema (inferable once via
  * `schema_of_json` on a sample), `explode`/`inline` for arrays — all
  * native generators, no custom UDTF needed.
  */
object JsonNormalize {

  /** Infer a schema for a JSON-string column from a driver-side sample
    * (the reference infers nested RECORD/REPEATED schemas from the data,
    * pipelines/utils/googleutils.py:14-53). Sampled inference keeps the
    * scan bounded; pass the result to [[unpack]] for the full read.
    */
  def inferSchema(df: DataFrame, jsonCol: String, sampleRows: Int = 1000): StructType = {
    val spark = df.sparkSession
    import spark.implicits._
    val sample = df.select(col(jsonCol)).filter(col(jsonCol).isNotNull)
      .limit(sampleRows).as[String]
    spark.read.json(sample).schema
  }

  /** Pack selected columns into a JSON-string payload column (the lake
    * landing format for raw API rows).
    */
  def pack(df: DataFrame, payloadCols: Seq[String], as: String = "data"): DataFrame = {
    val keep = df.columns.filterNot(payloadCols.contains)
    df.select((to_json(struct(payloadCols.map(col): _*)).as(as) +:
      keep.map(col)): _*)
  }

  /** Unpack a JSON-string column into typed top-level columns. */
  def unpack(df: DataFrame, jsonCol: String, schema: StructType): DataFrame =
    df.withColumn("__parsed", from_json(col(jsonCol), schema))
      .select((df.columns.filterNot(_ == jsonCol).map(col) :+
        col("__parsed.*")): _*)

  /** Flatten one level: every struct column becomes `parent_child` columns,
    * the `pd.json_normalize` analog (separator `_`).
    */
  def flattenStructs(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case s: StructType =>
          s.fieldNames.toSeq.map(n => col(s"`${f.name}`.`$n`").as(s"${f.name}_$n"))
        case _ => Seq(col(s"`${f.name}`"))
      }
    }
    df.select(cols: _*)
  }

  /** Explode an array-of-struct child out of a parent row, attaching a
    * deterministic child surrogate key (parent key + position) — the
    * reference's uuid5-over-natural-keys parent/child normalization.
    * Single `posexplode`: one generator, no join, preserves the parent's
    * partitioning.
    */
  def explodeChild(df: DataFrame, arrayCol: String, parentKey: Column,
      childKeyName: String = "child_key"): DataFrame = {
    val kept = df.columns.filterNot(_ == arrayCol).map(col)
    df.select((kept :+ posexplode(col(arrayCol)).as(Seq("__pos", "child"))): _*)
      .withColumn(childKeyName,
        Relational.surrogateKey(Seq(parentKey, col("__pos"))))
      .drop("__pos")
  }
}
