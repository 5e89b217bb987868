package graft.state

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Resume ledger for idempotent re-runs across jobs (reference:
  * pipelines/utils/progress.py:22-140 — a BigQuery table of completed
  * operator keys; remaining work = candidates minus ledger via an
  * outer-merge anti join).
  *
  * Spark-native: a small parquet table of (operator_key, run_id, done_at);
  * `remaining` is a broadcast-able left_anti join. Appends are idempotent in
  * effect because resume always re-derives the pending set from the distinct
  * keys — duplicate marks are harmless and never read back except through
  * the anti join.
  */
final case class ProgressLedger(spark: SparkSession, path: String) {

  def exists: Boolean =
    new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration).exists(new org.apache.hadoop.fs.Path(path))

  /** All recorded keys (empty DataFrame when no ledger has been written). */
  def done: Option[DataFrame] =
    if (exists) Some(spark.read.parquet(path)) else None

  /** Mark a batch of keys complete. `doneAt` is an explicit parameter so
    * runs stay deterministic (the reference stamps now() internally).
    */
  def markDone(keys: DataFrame, keyCol: String, runId: String,
      doneAt: java.sql.Timestamp): Unit =
    keys.select(col(keyCol).cast("string").as("operator_key"))
      .distinct()
      .withColumn("run_id", lit(runId))
      .withColumn("done_at", lit(doneAt))
      .write.mode("append").parquet(path)

  /** Work remaining = candidates − ledger (left_anti on the key). */
  def remaining(candidates: DataFrame, keyCol: String): DataFrame = {
    val ledgerKeys = done.map(_.select(col("operator_key").as(keyCol)))
    Relational.remaining(
      candidates.withColumn(keyCol, col(keyCol).cast("string")),
      ledgerKeys, Seq(keyCol))
  }
}
