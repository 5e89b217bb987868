package graft.flows

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.VersionedLake

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = (1 to 80).map(i => s"tok$i").mkString(" ")

  test("applyBatch: arrival-order drop rule across batches; a replayed " +
    "batch id is a no-op (the exactly-once marker)") {
    val root = Files.createTempDirectory("sdedup").toString + "/state"
    // batch 0: doc 10 (base text), doc 11 (distinct)
    val b0 = Seq((10L, base), (11L, "completely different words entirely"))
      .toDF("doc_id", "text")
    StreamingDedup.applyBatch(b0, 0L, "doc_id", "text", root,
      jaccardThreshold = 0.5, shingleN = 3, numHashes = 16, bands = 4)
    // batch 1: doc 20 near-dups doc 10 (higher id, arrived later → drop);
    // doc 5 near-dups doc 10 TOO but has the LOWER id → survives (its
    // mate was merely emitted first; append-only output never retracts)
    val b1 = Seq((20L, base + " extra"), (5L, base + " tail"))
      .toDF("doc_id", "text")
    StreamingDedup.applyBatch(b1, 1L, "doc_id", "text", root,
      jaccardThreshold = 0.5, shingleN = 3, numHashes = 16, bands = 4)
    def got() = StreamingDedup.survivors(spark, root)
      .select("doc_id", "batch_id").as[(Long, Long)].collect().toSet
    assert(got() == Set((10L, 0L), (11L, 0L), (5L, 1L)))
    val vAfter = VersionedLake.versions(spark, root).last
    // replaying EITHER batch id changes nothing — not the survivors, not
    // the index, not the version count (the crash-replay path of q116b)
    StreamingDedup.applyBatch(b1, 1L, "doc_id", "text", root,
      jaccardThreshold = 0.5, shingleN = 3, numHashes = 16, bands = 4)
    StreamingDedup.applyBatch(b0, 0L, "doc_id", "text", root,
      jaccardThreshold = 0.5, shingleN = 3, numHashes = 16, bands = 4)
    assert(got() == Set((10L, 0L), (11L, 0L), (5L, 1L)))
    assert(VersionedLake.versions(spark, root).last == vAfter)
    // a genuinely NEW batch still applies after the replays
    val b2 = Seq((30L, base + " more extra")).toDF("doc_id", "text")
    StreamingDedup.applyBatch(b2, 2L, "doc_id", "text", root,
      jaccardThreshold = 0.5, shingleN = 3, numHashes = 16, bands = 4)
    assert(got() == Set((10L, 0L), (11L, 0L), (5L, 1L))) // 30 ≈ 10 → dropped
    // the index accrued every batch's rows exactly once
    val idxIds = VersionedLake.readTable(spark, root, "hashed")
      .select("id").as[Long].collect().toSet
    assert(idxIds == Set(10L, 11L, 20L, 5L, 30L))
  }

  test("short docs (< shingleN tokens) pass through as survivors without " +
    "entering the index") {
    val root = Files.createTempDirectory("sdedup_short").toString + "/state"
    val b0 = Seq((1L, "just two"), (2L, base)).toDF("doc_id", "text")
    StreamingDedup.applyBatch(b0, 0L, "doc_id", "text", root,
      jaccardThreshold = 0.5, shingleN = 3, numHashes = 16, bands = 4)
    assert(StreamingDedup.survivors(spark, root)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    assert(VersionedLake.readTable(spark, root, "hashed")
      .select("id").as[Long].collect().toSet == Set(2L))
  }
}
