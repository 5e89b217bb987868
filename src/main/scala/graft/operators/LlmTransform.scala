package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** LLM-in-the-loop row transform (reference:
  * pipelines/datalake/transform/gemini/pacientes_restritos/tasks.py:44-117 —
  * per-row Gemini classification with retry, then regex parsing of the
  * model's free-text answer).
  *
  * Spark-first shape: `mapPartitions` with one rate-limited client per
  * partition (one HTTP session per task, never per row), bounded retries,
  * and the parse step as ordinary codegen'd column expressions AFTER the
  * boundary — only the irreducible network call lives inside the lambda.
  * The client is an injected serializable function so tests (and offline
  * runs) use a deterministic stub.
  */
object LlmTransform {

  final case class LlmResult(id: Long, raw: String, attempts: Int)

  /** Classify every row's text with `client`, retrying up to `maxRetries`
    * and pacing calls to `minIntervalMs` per partition (the reference's
    * rate-limit sleep).
    */
  def classify(
      df: DataFrame, idCol: String, textCol: String,
      client: String => String,
      maxRetries: Int = 3, minIntervalMs: Long = 0): Dataset[LlmResult] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { rows =>
        var lastCall = 0L
        rows.map { case (id, text) =>
          var attempt = 0
          var out: Option[String] = None
          while (out.isEmpty && attempt < maxRetries) {
            attempt += 1
            val wait = minIntervalMs - (System.currentTimeMillis() - lastCall)
            if (wait > 0) Thread.sleep(wait)
            lastCall = System.currentTimeMillis()
            // the FINAL attempt must also be caught: a persistently failing
            // row degrades to an empty result instead of killing the task
            // (and with it the partition's completed work)
            out = try Some(client(text)) catch { case _: Exception => None }
          }
          LlmResult(id, out.getOrElse(""), attempt)
        }
      }
  }

  /** Parse the model's free text into (label, confidence) with the
    * reference's regex-extraction style — pure built-ins, runs codegen'd
    * outside the mapPartitions boundary.
    */
  def parseVerdict(results: DataFrame, rawCol: String): DataFrame =
    results
      .withColumn("label",
        lower(regexp_extract(col(rawCol), "(?i)\\b(sim|nao|yes|no)\\b", 1)))
      .withColumn("confidence",
        regexp_extract(col(rawCol), "(\\d+(?:\\.\\d+)?)\\s*%", 1).cast("double") / 100.0)
}
