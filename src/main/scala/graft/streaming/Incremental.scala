package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming mappings for the reference's batch-simulated
  * incremental semantics (SURVEY §2.9): the datetime-window parameter flows
  * become watermarked tumbling windows; the progress-ledger resume becomes
  * checkpointing; per-window idempotent re-runs become foreachBatch upserts
  * into date partitions.
  *
  * The reference has no true streams (no Kafka), so these operate on any
  * streaming DataFrame (file source, rate source, or test MemoryStream) —
  * batch parity remains the correctness target, streaming is the
  * continuous-ingestion path a lake at scale eventually needs.
  */
object Incremental {

  /** Tumbling-window aggregation with a watermark: the streaming analog of
    * the reference's per-window extraction totals (vitai_db year→window
    * split, reference: pipelines/datalake/extract_load/vitai_db/tasks.py:32-56).
    * State is bounded by the watermark — late rows beyond `lateness` are
    * dropped instead of growing state forever (the property that keeps a
    * continuous job alive at scale).
    */
  def windowedAgg(
      stream: DataFrame, tsCol: String, windowLen: String, lateness: String,
      aggs: Seq[Column], extraKeys: Seq[Column] = Nil): DataFrame =
    stream.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen) +: extraKeys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Streaming dedup by key within the watermark horizon — the streaming
    * form of the Mongo `_id` keep-last idempotency (reference:
    * minhasaude_mongodb/tasks.py:128-130). State expires with the
    * watermark, so memory is bounded by (keys arriving within `lateness`).
    */
  def dedupWithinWatermark(
      stream: DataFrame, tsCol: String, lateness: String,
      keys: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keys)

  /** Idempotent micro-batch sink: each batch lands via dynamic partition
    * overwrite keyed by the batch's dates — re-processing a batch replaces
    * exactly the partitions it owns (the reference's staged-delete reload,
    * pipelines/utils/tasks.py:812-933, as a foreachBatch).
    */
  def toPartitionedLake(
      stream: DataFrame, dateCol: Column, path: String,
      checkpoint: String): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.LakeWriter.overwritePartitions(
          graft.sources.LakeWriter.withDatePartitions(batch, dateCol), path)
      }
}
