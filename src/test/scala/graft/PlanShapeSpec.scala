package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Physical-plan shape assertions: these encode the scale contracts — a
  * filter that doesn't reach the parquet scan or a dim join that doesn't
  * broadcast is a perf regression even while results stay correct.
  */
class PlanShapeSpec extends SparkSpec {

  private def planOf(df: DataFrame): String = {
    df.count() // force AQE to finalize
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  private def q(name: String): DataFrame =
    Queries.queries(name)(spark, sfDir)

  test("q01 filter+projection push into the parquet scan") {
    val plan = planOf(q("q01_filter_project"))
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("l_shipdate"), plan)
    // column pruning: scanned schema must not include unused columns
    assert(!plan.contains("l_comment"))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_quantity"), readSchema)
  }

  test("q08 star join broadcasts both dimension tables") {
    val plan = planOf(q("q08_star_join"))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q09 anti join stays an anti join (no cartesian fallback)") {
    val plan = planOf(q("q09_anti_join"))
    assert(plan.contains("LeftAnti"), plan)
  }

  test("q11 band join is BroadcastNestedLoop over the interval side only") {
    val plan = planOf(q("q11_band_join"))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q14 top-k compiles to TakeOrderedAndProject (no global sort)") {
    val plan = planOf(q("q14_topk"))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q119c IVFADC-R re-rank broadcasts the c-row short-list into the " +
    "quant join and keeps the final top-n a TakeOrderedAndProject") {
    val plan = planOf(q("q119c_ivfpq_rerank"))
    // the corpus-side quant frame must be PROBED by the broadcast c-row
    // candidate list — a shuffle of the corpus here defeats the point of
    // the code-pruned short-list at 100 TB
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q119e stored-index search is PARTITION-PRUNED to the nprobe " +
    "cells, broadcasts the short-list into the quant re-rank, and tops " +
    "out in TakeOrderedAndProject") {
    val plan = planOf(q("q119e_ann_index"))
    // the encoded codes live cell-partitioned in the lake; the search's
    // cell.isin(probed) must land as PartitionFilters (directory reads),
    // not a post-scan filter over the whole corpus — the same 100 TB
    // contract as q111's pruned assignments read
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q119j tombstoned search keeps the clean search's scan shape: the " +
    "cell partition pruning pushes through the retirement anti-join, the " +
    "tombstone set rides a BROADCAST anti-join (the corpus side never " +
    "shuffles for a delete), and the top-n stays TakeOrderedAndProject") {
    val plan = planOf(q("q119j_ann_delete"))
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      plan)
    // merge-on-read cost model: the retired minority broadcasts; a
    // shuffle (SortMergeJoin) here would re-price every search by the
    // corpus size the moment one document is retired
    assert("BroadcastHashJoin.*LeftAnti".r.findFirstIn(plan).isDefined, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q119l batch search prunes the stored scan to the UNION of " +
    "probed cells (PartitionFilters from the isin literal) and keeps " +
    "every join a hash join — no sort-merge of the corpus, no cartesian") {
    val plan = planOf(q("q119l_ann_batch"))
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("ANN arrival encode (the append/applyBatch path) never shuffles " +
    "the batch: one scan, one broadcast of the model-sized local residual " +
    "table — per-batch ingest cost structurally cannot scale with the " +
    "stored corpus") {
    val emb = graft.sources.Lake.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val (coarse, books, _) = graft.operators.Similarity.ivfPqIndex(emb,
      "vec_id", "embedding", dims = 64, coarseK = 4, coarseIters = 2,
      m = 4, k = 4, iters = 2)
    val plan = planOf(graft.operators.Similarity.ivfPqEncode(emb,
      "vec_id", "embedding", coarse, books))
    // the only exchange is the broadcast of the collected residual
    // centroids (a LocalTableScan — model-sized, never the batch); the
    // batch side must not move
    assert(!plan.replace("BroadcastExchange", "").contains("Exchange"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("LocalTableScan"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q101 SemDeDup pairwise work is a hash equi-join on the cluster id") {
    // the id_a < id_b and cosine predicates must ride a cid equi-join —
    // a nested-loop here would be corpus² at scale
    val plan = planOf(q("q101_semdedup"))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("q108 incremental SemDeDup pairs ride a hash equi-join on the cluster id") {
    val plan = planOf(q("q108_incremental_semdedup"))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("q111 stored-state incremental SemDeDup quantizes ONLY the batch") {
    // the per-batch plan must carry no corpus-wide fit/assign: the corpus
    // side is a slim stored-assignments read, so strictly fewer
    // quantize_floor kernels (and fewer raw-embedding scans) than q108's
    // inline form, which re-quantizes the corpus per call
    val p111 = planOf(q("q111_incremental_semdedup_stored"))
    assert(p111.contains("graft_q111"), p111) // corpus side reads stored tables
    // "no corpus-wide assign" — and since round 9, "no REPEATED batch
    // assign" either: the assigned batch is materialized once
    // (localCheckpoint inside incrementalSemDeDupStored), so the arrival
    // plan must contain NO raw-embeddings scan and NO quantize/assign
    // kernel at all — the batch subtree is an ExistingRDD scan of the
    // one-shot assignment, and the corpus side is the pruned stored read.
    assert(!p111.contains("embeddings.parquet"), p111)
    assert(!p111.contains("quantize_floor"), p111)
    assert(!p111.contains("sq_dist_lit"), p111)
    assert(p111.contains("ExistingRDD"), p111)
    assert(!p111.contains("CartesianProduct"), p111)
    assert(p111.contains("HashJoin") || p111.contains("SortMergeJoin"), p111)
    // the corpus-assignments read must be PARTITION-PRUNED to the batch's
    // cids (cid-partitioned layout + the ≤k IN-filter) — a full-corpus
    // scan here is the 100 TB regression this shape exists to avoid
    assert("PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(p111).isDefined, p111)
  }

  test("q106b bounded curate: the occupancy probe rides a BROADCAST join " +
    "(never a window over cid), the pair step stays a hash equi-join") {
    // the refinement exists to tame skew — funneling rows through a
    // cid-window (≤ k partitions, hot cluster in ONE task) would
    // reintroduce exactly the skew it bounds; the ≤k-row occupancy
    // aggregate must come back as a broadcast
    val plan = planOf(q("q106b_semantic_curate_bounded"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
    // the DEDUP stage alone (no cume_dist gate, which is a window by
    // design) must be window-free: occupancy is an aggregate+broadcast,
    // never a count-over-cid window
    val dedupOnly = planOf(graft.operators.Cluster.semDeDup(
      graft.sources.Lake.table(spark, sfDir, "embeddings"),
      "vec_id", "embedding", k = 4, iters = 1, tau = 0.45,
      maxClusterSize = 100))
    assert(!dedupOnly.contains("Window"), dedupOnly)
    assert(dedupOnly.contains("BroadcastHashJoin"), dedupOnly)
    assert(!dedupOnly.contains("CartesianProduct"), dedupOnly)
  }

  test("q108b bounded arrival path: broadcast occupancy + hash equi-join " +
    "pair step, no cartesian") {
    val plan = planOf(q("q108b_incremental_semdedup_bounded"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("q105 stored-model assignment is one map-only scan (no shuffle, no join)") {
    val df = q("q105_kmeans_assign_stored")
    // drop the final orderBy the driver compare needs; the assignment
    // itself must plan without any exchange
    val assignOnly = graft.operators.Cluster.assignStored(
      graft.sources.Lake.table(spark, sfDir, "embeddings"),
      "vec_id", "embedding",
      spark.read.parquet(System.getProperty("java.io.tmpdir") + "/graft_q105_centroids"))
    val plan = planOf(assignOnly)
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    df.count() // keep the full query exercised too
  }

  test("q03 aggregation has a map-side partial phase") {
    val plan = planOf(q("q03_agg_q1"))
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("q33 LSH band join carries slim rows (no shingle arrays through it)") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    // the public wrapper materializes eagerly and releases its caches, so
    // its returned plan is an opaque block scan — pin the LAZY plan builder
    // (the exact plan the wrapper executes)
    val df = graft.operators.Dedup.minHashCandidatePairsPortablePlan(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
    // the band/bucket self-join inputs must be (id, band, bucket) only — a
    // shingle array here would make the shuffle width scale with doc size
    val bandJoins = df.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.exists(_.references.exists(_.name == "bucket")) => j
    }
    assert(bandJoins.nonEmpty)
    for (j <- bandJoins; side <- j.children)
      assert(side.output.map(_.name).forall(n => !n.contains("sh")),
        side.output.map(_.name).mkString(","))
  }

  test("q46 cosine dedup joins on the bucket key (no cartesian product); " +
    "the DEFAULT bounded path rides a broadcast occupancy probe") {
    // lazy plan builder for the same reason as the q33 pin above; since
    // round 12 this builds the bounded-occupancy DEFAULT, so these pins
    // cover what callers actually execute
    val plan = planOf(graft.operators.Dedup.cosineNearDupPairsPlan(
      spark.read.parquet(s"$sfDir/embeddings.parquet"),
      "vec_id", "embedding", dim = 64, threshold = 0.30))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("lsh_bucket"), plan)
    // the ≤2^numPlanes-row occupancy map must BROADCAST back onto the
    // rows — a shuffle join here would re-partition the whole corpus on
    // lsh_bucket (at most 2^numPlanes partitions: the exact skew funnel
    // the occupancy scheme exists to avoid)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the unbounded special case keeps the old slim single-join shape
    val unbounded = planOf(graft.operators.Dedup.cosineNearDupPairsPlan(
      spark.read.parquet(s"$sfDir/embeddings.parquet"),
      "vec_id", "embedding", dim = 64, threshold = 0.30,
      maxBucketSize = Int.MaxValue))
    assert(!unbounded.contains("CartesianProduct"), unbounded)
  }

  test("q45 custom operator: no Sort/Window, survivors-only exchange") {
    val plan = planOf(q("q45_topk_per_key"))
    assert(plan.contains("TopKPerKeyPartial"), plan)
    assert(plan.contains("TopKPerKeyFinal"), plan)
    assert(!plan.contains("WindowExec"), plan)
  }

  test("q53 KMV sketch aggregates with a map-side partial phase") {
    val plan = planOf(q("q53_kmv_distinct"))
    // the typed imperative aggregate must run as ObjectHashAggregate with
    // partial merge — the bounded-buffer/partial-combine contract that
    // keeps shuffle at O(groups × k) at scale
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_kmv_distinct"), plan)
  }

  test("q56 profiler runs as one scan (no per-column unions)") {
    val plan = planOf(q("q56_profile"))
    assert(!plan.contains("Union"), plan)
    // formatted explain prints each node twice (tree + detail section):
    // exactly one scan node = exactly two textual occurrences
    assert("Scan parquet".r.findAllIn(plan).size == 2, plan)
  }

  test("q66 bloom pre-filter survives to the physical plan before the join") {
    val plan = planOf(q("q66_bloom_join"))
    assert(plan.contains("might_contain"), plan)
  }

  // formatted explain prints each Exchange's partitioning on an
  // "Arguments:" detail line — count those, not the tree header
  private def hashExchanges(plan: String): Int =
    plan.linesIterator.count(l =>
      l.contains("Arguments: hashpartitioning"))

  test("q77 funnel: session window and both groupBys share ONE data exchange") {
    val plan = planOf(q("q77_funnel"))
    // 1 hashpartitioning(user_id) feeds the session window AND both
    // aggregations (subset rule); the only other exchange is the final
    // presentation sort's rangepartitioning
    val n = hashExchanges(plan)
    assert(n == 1, s"expected 1 hash exchange, got $n\n$plan")
  }

  test("q79 mode: count and rank share the user_id exchange") {
    val plan = planOf(q("q79_mode"))
    val n = hashExchanges(plan)
    assert(n == 1, s"expected 1 hash exchange, got $n\n$plan")
  }

  test("no query in the suite plans a CartesianProduct") {
    // suite-wide guard: an accidental unkeyed join anywhere in the query
    // inventory would scale quadratically. Plans are inspected WITHOUT
    // executing (q64/q65/q80 have write side effects; skipping count()
    // leaves AQE unfinalized, which is fine for join-node inspection).
    Queries.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian:\n$plan")
    }
  }

  // ---- landing-write pins: the wire readers (ES/Mongo/proxy/FTP/...) all
  // land through Ingest.conformForLanding/landJsonPayload + LakeWriter.
  // The contract at 100 TB: the whole conform→stamp→partition frame is
  // NARROW (zero exchanges), and the write path's ONLY shuffle is the
  // deliberate partition-col repartition that prevents the small-files
  // problem. A second exchange sneaking into this path would tax every
  // single acquisition flow. The frames below reconstruct exactly what
  // overwritePartitions executes before the write.

  private val landPartCols =
    Seq(col("ano_particao"), col("mes_particao"), col("data_particao"))

  // every Exchange node exactly once (the formatted detail section), of
  // ANY partitioning: when the run stamp makes the partition columns
  // constant, Catalyst folds the hash repartition to SinglePartition —
  // still the one deliberate shuffle
  private def exchangeNodes(plan: String): Int =
    plan.linesIterator.count(_.matches("\\(\\d+\\) Exchange"))

  test("landByLoadDate frame: conform+allString+audit+stamps are narrow; one deliberate shuffle") {
    val stamp = graft.flows.Ingest.RunStamp("run-1",
      java.sql.Timestamp.valueOf("2026-08-12 09:00:00"))
    val src = graft.sources.Lake.table(spark, sfDir, "orders")
    val frame = graft.sources.LakeWriter.withDatePartitions(
      graft.flows.Ingest.conformForLanding(src, stamp), col("loaded_at"))
    // the landing transforms themselves must plan with NO exchange
    val narrow = planOf(frame)
    assert(hashExchanges(narrow) == 0 && !narrow.contains("Exchange"), narrow)
    // the pre-write frame (what overwritePartitions executes) carries
    // exactly the one partition-col shuffle
    val preWrite = planOf(frame.repartition(landPartCols: _*))
    assert(exchangeNodes(preWrite) == 1, preWrite)
  }

  test("landJsonPayload frame: JSON pack + metadata + stamps are narrow; one deliberate shuffle") {
    val stamp = graft.flows.Ingest.RunStamp("run-1",
      java.sql.Timestamp.valueOf("2026-08-12 09:00:00"))
    val src = graft.sources.Lake.table(spark, sfDir, "customer")
    val packed = graft.operators.JsonNormalize.pack(src,
      Seq("c_name", "c_acctbal", "c_mktsegment"), "data")
      .withColumn("_source", lit("wire"))
    val stamped = graft.sources.LakeWriter
      .withAudit(packed, stamp.runId, stamp.loadedAt)
      .withColumn("_target_date", lit("2026-08-12"))
    val frame = graft.sources.LakeWriter.withDatePartitions(stamped,
      to_date(lit("2026-08-12")))
    val narrow = planOf(frame)
    assert(hashExchanges(narrow) == 0 && !narrow.contains("Exchange"), narrow)
    val preWrite = planOf(frame.repartition(landPartCols: _*))
    assert(exchangeNodes(preWrite) == 1, preWrite)
  }

  test("scrollAll landing via Dataset[String] JSON parse is narrow end-to-end") {
    // the ES/Mongo cursor rows land as a Dataset[String] of JSON docs →
    // from_json projection → conform: still zero exchanges before the
    // deliberate write shuffle
    import spark.implicits._
    val docs = (1 to 100).map(i =>
      s"""{"id":$i,"nome":"N$i","valor":${i * 2}}""").toDS()
    val parsed = spark.read.json(docs)
    val stamp = graft.flows.Ingest.RunStamp("run-2",
      java.sql.Timestamp.valueOf("2026-08-12 10:00:00"))
    val frame = graft.sources.LakeWriter.withDatePartitions(
      graft.flows.Ingest.conformForLanding(parsed, stamp), col("loaded_at"))
    val narrow = planOf(frame)
    assert(hashExchanges(narrow) == 0 && !narrow.contains("Exchange"), narrow)
  }

  test("pruned lexical dedup arrival: the stored banded read prunes to " +
    "the batch's layout partitions (PartitionFilters on pb, bucket probe " +
    "pushed to parquet) and the fat hashed read prunes the same way " +
    "(PartitionFilters on ph, In(id) pushed) — per-batch state I/O " +
    "follows the batch's footprint, not the corpus") {
    import spark.implicits._
    import graft.operators.Dedup
    val root = java.nio.file.Files.createTempDirectory("plan_sdedup")
      .toString + "/state"
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    graft.flows.StreamingDedup.applyBatch(
      (1L to 40L).map(i => (i, s"$base tail$i")).toDF("doc_id", "text"),
      0L, "doc_id", "text", root, jaccardThreshold = 0.5, shingleN = 3,
      numHashes = 16, bands = 4)
    val storedHashed = graft.sources.VersionedLake.readTable(spark, root,
      "hashed", schemaDDL = "id BIGINT, hs ARRAY<BIGINT>, ph BIGINT")
    val storedBanded = graft.sources.VersionedLake.readTable(spark, root,
      "banded", schemaDDL = "id BIGINT, band INT, bucket BIGINT, pb BIGINT")
    val batch = Seq((100L, s"$base fresh"), (101L, "wholly different words"))
      .toDF("doc_id", "text")
    val (nh, nb) = Dedup.minHashIndexPortable(batch, "doc_id", "text",
      shingleN = 3, numHashes = 16, bands = 4)
    val (pairs, cands) = Dedup.minHashIncrementalPairsPrunedLazy(
      storedHashed, storedBanded, nh, nb)
    try {
      val plan = planOf(pairs)
      // stored banded: directory pruning on the layout prefix + the
      // bucket probe pushed into the parquet scan (row-group skipping
      // over the in-directory bucket sort)
      assert("PartitionFilters: \\[[^\\]]*pb".r.findFirstIn(plan).isDefined,
        plan)
      assert(plan.contains("In(bucket"), plan)
      // stored hashed (the fat table): same shape on ph/id before the
      // Jaccard join
      assert("PartitionFilters: \\[[^\\]]*ph".r.findFirstIn(plan).isDefined,
        plan)
      assert(plan.contains("In(id"), plan)
    } finally {
      cands.unpersist(); nh.unpersist(); nb.unpersist(); ()
    }
  }

  test("q65 month filter resolves as PartitionFilters (directory pruning)") {
    val plan = planOf(q("q65_partition_pruned"))
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters:")).mkString
    // the ano/mes predicates must prune at PLANNING time against the
    // directory listing — not run as data filters over a full scan
    assert(pf.contains("ano_particao") && pf.contains("mes_particao"), plan)
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters:")).mkString
    assert(!pushed.contains("ano_particao"), plan)
  }
}
