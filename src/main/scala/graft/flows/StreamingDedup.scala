package graft.flows

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.Dedup
import graft.sources.VersionedLake

/** STREAMING near-dup dedup — the arrival-path MinHash pipeline
  * (`Dedup.minHashIncrementalPairsPortable`, q81) as a continuously
  * running stream with EXACTLY-ONCE output, the ingestion shape a 100 TB
  * corpus actually runs: documents arrive, each micro-batch is LSH-joined
  * against the stored index only (never corpus²), survivors and the
  * batch's index rows land together.
  *
  * Drop rule (keep-lowest-id among ARRIVED docs — the engine's standard
  * order-free survivor rule, restricted to what has actually arrived):
  * a batch doc is dropped iff some LOWER-id doc with estimated Jaccard ≥
  * `jaccardThreshold` has arrived in an earlier batch or in the same
  * batch. A higher-id near-dup mate arriving EARLIER does not retract —
  * it was already emitted (append-only output, the streaming reality);
  * the late lower-id doc still survives on its own merits. Deterministic
  * given the batch assignment, and replayable in SQL (q116's oracle).
  *
  * Exactly-once: each micro-batch commits `hashed`/`banded` (append),
  * `survivors` (append), and `applied` (overwrite, the batch id) as ONE
  * [[VersionedLake]] group version — atomically visible or not at all. A
  * batch replayed after a crash (committed but not yet checkpointed)
  * short-circuits on the `applied` marker, so a kill at ANY point
  * between micro-batches re-lands the identical final state (q116b runs
  * the kill-and-resume proof against the same oracle).
  *
  * Scale shape per batch: one shingle+signature pass over the BATCH
  * (never the corpus), one bucket equi-join of the batch's band rows
  * against the stored band table, one anti join. The stored-index read
  * is the latest committed group version; at 100 TB the band table is
  * the thing a deployment would additionally bucket by (band, bucket) so
  * the per-batch join prunes to touched buckets — same layout note as
  * DedupIndex.
  *
  * Retention: each micro-batch publishes one group version (append mode
  * is a metadata union — no data rewrite), so a long-running stream
  * accrues manifests, not data copies. Reclaim old manifests with
  * [[VersionedLake.vacuumGroup]] on whatever cadence the deployment
  * keeps for time travel; the applied-marker only ever needs the LATEST
  * version, so any `keepFrom ≤ latest` is safe for the dedup itself.
  */
object StreamingDedup {

  /** Build the writer (caller starts it; AvailableNow trigger). `docs`
    * must be a STREAMING frame carrying `idCol` (integral) + `textCol`.
    */
  def writer(docs: DataFrame, idCol: String, textCol: String,
      root: String, checkpoint: String, jaccardThreshold: Double,
      shingleN: Int = 3, numHashes: Int = 16,
      bands: Int = 4): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, idCol, textCol, root,
          jaccardThreshold, shingleN, numHashes, bands)
      }

  /** One micro-batch: idempotence check → index read → LSH pairs →
    * survivors → atomic group commit. Public for spec-level direct
    * driving; the streaming writer is a thin shell over this.
    */
  def applyBatch(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, root: String, jaccardThreshold: Double,
      shingleN: Int, numHashes: Int, bands: Int): Unit = {
    val spark = batch.sparkSession
    val versions = VersionedLake.versions(spark, root)
    // replay short-circuit: the marker committed ATOMICALLY with the data,
    // so "applied says done" ⟺ "this batch's rows are fully visible"
    val lastApplied =
      if (versions.isEmpty) -1L
      else VersionedLake.readTable(spark, root, "applied")
        .head().getLong(0)
    if (batchId <= lastApplied) return
    val docs = batch.select(col(idCol).cast("long").as("__doc_id"),
      col(textCol).as("__text"))
    val (nh, nb) = Dedup.minHashIndexPortable(docs, "__doc_id", "__text",
      shingleN, numHashes, bands)
    try {
      val (oldHashed, oldBanded) =
        if (versions.isEmpty) (nh.limit(0), nb.limit(0))
        else (VersionedLake.readTable(spark, root, "hashed"),
          VersionedLake.readTable(spark, root, "banded"))
      val dropped = Dedup.minHashIncrementalPairsFromIndexes(
          oldHashed, oldBanded, nh, nb)
        .filter(col("jaccard") >= jaccardThreshold)
        .select(col("id_b")).distinct()
      val survivors = docs.select(col("__doc_id"))
        .join(dropped, col("__doc_id") === col("id_b"), "left_anti")
        .select(col("__doc_id").as(idCol), lit(batchId).as("batch_id"))
      val gc = VersionedLake.beginGroupCommit(spark, root)
      gc.write("hashed", nh, mode = "append")
      gc.write("banded", nb, mode = "append")
      gc.write("survivors", survivors, mode = "append")
      gc.write("applied",
        spark.createDataFrame(java.util.List.of(Row(batchId)),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("batch_id",
              org.apache.spark.sql.types.LongType, nullable = false)))),
        mode = "overwrite")
      gc.publish()
      ()
    } finally { nh.unpersist(); nb.unpersist(); () }
  }

  /** The deduped output after the stream drains: (idCol, batch_id) per
    * surviving document, read from the latest committed group version.
    */
  def survivors(spark: org.apache.spark.sql.SparkSession,
      root: String): DataFrame =
    VersionedLake.readTable(spark, root, "survivors")
}
