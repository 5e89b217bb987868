package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("quantizeFloor floors exactly (power-of-two multiply, negatives included)") {
    val df = Seq(Seq(0.5f, -0.5f, 0.0f, 1.25f)).toDF("v")
      .select(Cluster.quantizeFloor(col("v"), 4).as("q"))
    assert(df.as[Seq[Long]].head() == Seq(2L, -2L, 0L, 5L))
    // -0.3f * 4 = -1.2000000476837158 in double → floor -2 (not truncate -1)
    val neg = Seq(Seq(-0.3f)).toDF("v")
      .select(Cluster.quantizeFloor(col("v"), 4).as("q"))
    assert(neg.as[Seq[Long]].head() == Seq(-2L))
  }

  test("kmeansQuantized separates two obvious clusters and converges") {
    val df = emb(
      0L -> Seq(0.0f, 0.0f), 1L -> Seq(10.0f, 10.0f),
      2L -> Seq(0.1f, 0.1f), 3L -> Seq(9.9f, 10.1f), 4L -> Seq(0.2f, 0.0f))
    val got = Cluster.kmeansQuantized(df, "vec_id", "embedding", k = 2, iters = 3)
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    assert(got(0L) == 0 && got(2L) == 0 && got(4L) == 0)
    assert(got(1L) == 1 && got(3L) == 1)
  }

  test("assignment ties break to the lowest centroid id") {
    // point (1,0) is exactly equidistant from init centroids (0,0) and (2,0)
    val df = emb(0L -> Seq(0.0f, 0.0f), 1L -> Seq(2.0f, 0.0f), 2L -> Seq(1.0f, 0.0f))
    val got = Cluster.kmeansQuantized(df, "vec_id", "embedding", k = 2, iters = 1)
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    assert(got(2L) == 0)
  }

  test("an emptied cluster keeps its previous centroid (no crash, all rows assigned)") {
    // ids 0 and 1 share a location → init centroids 0 and 1 coincide; every
    // point ties to cid 0, cluster 1 goes empty on the first update. Cluster
    // 1 then KEEPS the stale (1,1) centroid, and once cluster 0's centroid
    // moves to the 3-point mean, the two (1,1) points are closer to the
    // stale centroid and flip back to cid 1 — deterministic, and exactly
    // what the oracle's COALESCE carry-over replays.
    val df = emb(0L -> Seq(1.0f, 1.0f), 1L -> Seq(1.0f, 1.0f), 2L -> Seq(1.1f, 0.9f))
    val got = Cluster.kmeansQuantized(df, "vec_id", "embedding", k = 2, iters = 3)
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 0L))
  }

  test("semDeDup drops the higher id of a within-cluster near-dup pair only") {
    val df = emb(
      0L -> Seq(1.0f, 0.0f), 1L -> Seq(0.0f, 1.0f),
      2L -> Seq(1.0f, 0.001f),  // near-dup of 0, same cluster → dropped
      3L -> Seq(0.001f, 1.0f))  // near-dup of 1, same cluster → dropped
    val kept = Cluster.semDeDup(df, "vec_id", "embedding",
        k = 2, iters = 2, tau = 0.9)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 1L))
  }

  test("semDeDupBounded: identical to semDeDup when no cluster is " +
    "oversized; a hot cluster splits, exact-dup recall holds, no cartesian") {
    val rng = new scala.util.Random(11)
    // one HOT direction: 60 near-identical vectors plus their exact
    // duplicates land in one cluster; 20 scattered vectors elsewhere
    val dom = Array.fill(8)(1.0 + rng.nextGaussian() * 0.01)
    val hot = (0 until 60).flatMap { i =>
      val v = dom.map(x => (x + rng.nextGaussian() * 0.001).toFloat).toSeq
      Seq((i.toLong * 2, v), (i.toLong * 2 + 1, v)) // exact dup mate
    }
    val cold = (1000 until 1020).map(i =>
      (i.toLong, Seq.fill(8)(rng.nextGaussian().toFloat)))
    val df = (hot ++ cold).toDF("vec_id", "embedding")
    def kept(got: org.apache.spark.sql.DataFrame): Set[Long] =
      got.select("vec_id").as[Long].collect().toSet
    val plain = kept(Cluster.semDeDup(df, "vec_id", "embedding",
      k = 3, iters = 2, tau = 0.95))
    // cap above every cluster: EXACTLY the unbounded result
    val unsplit = kept(Cluster.semDeDupBounded(df, "vec_id", "embedding",
      dims = 8, k = 3, iters = 2, tau = 0.95, maxClusterSize = 100000))
    assert(unsplit == plain)
    // cap of 30 forces the hot cluster to split: every exact-dup pair
    // still resolves (identical vectors share every plane sign), so each
    // mate's higher id is still dropped
    val bounded = Cluster.semDeDupBounded(df, "vec_id", "embedding",
      dims = 8, k = 3, iters = 2, tau = 0.95, maxClusterSize = 30)
    val keptB = kept(bounded)
    for (i <- 0 until 60)
      assert(!keptB.contains(i.toLong * 2 + 1) || !keptB.contains(i.toLong * 2),
        s"exact-dup pair $i survived whole through the split")
    // the split can only RETAIN more (pairs across sub-buckets are not
    // compared), never drop more
    assert(plain.subsetOf(keptB))
    // pair step stays a hash equi-join
    val plan = bounded.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("occupancy probe past the driver-collect cap falls back to the " +
    "IN-PLAN aggregate join: same survivors, same splits metric, no " +
    "per-cid driver collect") {
    val rng = new scala.util.Random(31)
    val dom = Array.fill(8)(1.0 + rng.nextGaussian() * 0.01)
    val hot = (0 until 40).flatMap { i =>
      val v = dom.map(x => (x + rng.nextGaussian() * 0.001).toFloat).toSeq
      Seq((i.toLong * 2, v), (i.toLong * 2 + 1, v))
    }
    val cold = (1000 until 1015).map(i =>
      (i.toLong, Seq.fill(8)(rng.nextGaussian().toFloat)))
    val df = (hot ++ cold).toDF("vec_id", "embedding")
    def run() = Cluster.semDeDupBounded(df, "vec_id", "embedding",
      dims = 8, k = 3, iters = 2, tau = 0.95, maxClusterSize = 20)
      .select("vec_id").as[Long].collect().toSet
    val viaBroadcast = run()
    val splitsBroadcast = Cluster.lastOversizedClusterSplits
    assert(splitsBroadcast >= 1L)
    val saved = Cluster.OccupancyCollectCap
    Cluster.OccupancyCollectCap = 1 // 3 cids > cap -> in-plan fallback
    try {
      assert(run() == viaBroadcast)
      assert(Cluster.lastOversizedClusterSplits == splitsBroadcast)
    } finally Cluster.OccupancyCollectCap = saved
  }

  test("semanticCurate: bounded DEFAULT ≡ explicit unbounded when no " +
    "cluster exceeds the cap; a forced split never drops more and still " +
    "resolves exact dups") {
    val rng = new scala.util.Random(23)
    val dom = Array.fill(8)(1.0 + rng.nextGaussian() * 0.01)
    val hot = (0 until 40).flatMap { i =>
      val v = dom.map(x => (x + rng.nextGaussian() * 0.001).toFloat).toSeq
      Seq((i.toLong * 2, v), (i.toLong * 2 + 1, v)) // exact dup mate
    }
    val cold = (1000 until 1015).map(i =>
      (i.toLong, Seq.fill(8)(rng.nextGaussian().toFloat)))
    val df = (hot ++ cold).toDF("vec_id", "embedding")
    def kept(got: org.apache.spark.sql.DataFrame): Set[Long] =
      got.select("vec_id").as[Long].collect().toSet
    // DEFAULT (cap 4096, inferred dims) vs explicit unbounded opt-in:
    // no cluster here reaches the cap, so the results must be IDENTICAL
    val dflt = kept(Cluster.semanticCurate(df, "vec_id", "embedding",
      k = 3, iters = 2, tau = 0.95, dropFrac = 0.2))
    // the split metric is observable: nothing split under the 4096 default
    assert(Cluster.lastOversizedClusterSplits == 0L)
    val unbounded = kept(Cluster.semanticCurate(df, "vec_id", "embedding",
      k = 3, iters = 2, tau = 0.95, dropFrac = 0.2,
      maxClusterSize = Int.MaxValue))
    assert(dflt == unbounded)
    // forced split (cap 20): exact-dup mates still resolve through the
    // split (identical vectors share every plane sign). The DEDUP stage
    // can only retain more survivors; the downstream cume_dist gate sees
    // a (possibly) different survivor set, so compare the dedup stage
    // alone via semDeDup
    val plainDedup = kept(Cluster.semDeDup(df, "vec_id", "embedding",
      k = 3, iters = 2, tau = 0.95, maxClusterSize = Int.MaxValue))
    val splitDedup = kept(Cluster.semDeDup(df, "vec_id", "embedding",
      k = 3, iters = 2, tau = 0.95, maxClusterSize = 20))
    // ...and the forced split is REPORTED, never silent
    assert(Cluster.lastOversizedClusterSplits >= 1L)
    for (i <- 0 until 40)
      assert(!splitDedup.contains(i.toLong * 2 + 1) ||
        !splitDedup.contains(i.toLong * 2),
        s"exact-dup pair $i survived whole through the split")
    assert(plainDedup.subsetOf(splitDedup))
  }

  test("incrementalSemDeDupStored: bounded DEFAULT ≡ explicit unbounded " +
    "under the cap; a forced split still drops batch docs identical to " +
    "corpus members") {
    val rng = new scala.util.Random(31)
    val dom = Array.fill(8)(1.0 + rng.nextGaussian() * 0.01)
    val corpusRows = (0 until 50).map { i =>
      (i.toLong, dom.map(x => (x + rng.nextGaussian() * 0.001).toFloat).toSeq)
    }
    val corpus = corpusRows.toDF("vec_id", "embedding")
    // batch: EXACT copies of corpus 0..9 (must drop under any split) plus
    // ten scattered new directions (must survive)
    val batch = ((0 until 10).map(i => (100L + i, corpusRows(i)._2)) ++
      (0 until 10).map(i =>
        (200L + i, Seq.tabulate(8)(j =>
          (if (j == i % 8) -1.0f else 0.01f * i))))).toDF("vec_id", "embedding")
    def run(cap: Int): Set[Long] =
      Cluster.incrementalSemDeDup(corpus, batch, "vec_id", "embedding",
        k = 2, iters = 2, tau = 0.95, maxClusterSize = cap)
        .select("vec_id").as[Long].collect().toSet
    // default cap vs explicit unbounded: nothing splits at 60 rows
    val dflt = Cluster.incrementalSemDeDup(corpus, batch, "vec_id",
        "embedding", k = 2, iters = 2, tau = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(dflt == run(Int.MaxValue))
    // forced split (cap 8, hot cluster ~60 members): the exact-copy batch
    // docs share every plane sign with their corpus twin → still dropped
    val split = run(8)
    for (i <- 0 until 10)
      assert(!split.contains(100L + i), s"exact corpus copy ${100 + i} survived")
    // unbounded drops are a superset: the split only retains more
    assert(run(Int.MaxValue).subsetOf(split))
  }

  test("bounded semDeDup on a single-row corpus: dims inference finds no " +
    "pairs to build, result is the row itself") {
    // exercises resolveDims' head(1) path (and the k=1 degenerate case)
    // through the bounded DEFAULT — an empty/tiny corpus must not crash
    // on plane construction
    val df = emb(7L -> Seq(1.0f, 0.5f))
    val kept = Cluster.semDeDup(df, "vec_id", "embedding",
        k = 1, iters = 1, tau = 0.9)
      .select("vec_id").as[Long].collect().toSeq
    assert(kept == Seq(7L))
  }

  test("semanticPrune drops the farthest fraction per cluster") {
    // one cluster around (0,0) with an outlier at (0.5,0.5); k=1, drop 25%
    // of 4 points → exactly the single farthest point goes
    val df = emb(0L -> Seq(0.0f, 0.0f), 1L -> Seq(0.1f, 0.0f),
      2L -> Seq(0.0f, 0.1f), 3L -> Seq(0.5f, 0.5f))
    val kept = Cluster.semanticPrune(df, "vec_id", "embedding",
        k = 1, iters = 1, dropFrac = 0.25)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 1L, 2L))
  }

  test("fitCentroids + assignStored reproduces kmeansQuantized exactly") {
    val df = emb(
      0L -> Seq(0.0f, 0.0f), 1L -> Seq(10.0f, 10.0f),
      2L -> Seq(0.1f, 0.1f), 3L -> Seq(9.9f, 10.1f), 4L -> Seq(0.2f, 0.0f))
    val direct = Cluster.kmeansQuantized(df, "vec_id", "embedding", k = 2, iters = 3)
      .select("vec_id", "cid", "dist").as[(Long, Long, Long)].collect().toSet
    val model = Cluster.fitCentroids(df, "vec_id", "embedding", k = 2, iters = 3)
    assert(model.count() == 2)
    val stored = Cluster.assignStored(df, "vec_id", "embedding", model)
      .select("vec_id", "cid", "dist").as[(Long, Long, Long)].collect().toSet
    assert(stored == direct)
  }

  test("assignStored rejects non-contiguous centroid ids") {
    val df = emb(0L -> Seq(1.0f, 1.0f))
    val badModel = Seq((0L, Seq(1L, 1L)), (2L, Seq(5L, 5L))).toDF("cid", "q")
    intercept[IllegalArgumentException] {
      Cluster.assignStored(df, "vec_id", "embedding", badModel)
    }
  }

  test("semanticCurate = dedup drop, then outlier gate over the survivors") {
    // cluster of four around (1,0): id 1 duplicates id 0 (cos ≈ 1 → the
    // dedup stage drops it), then the gate drops the farthest 34% of the
    // THREE survivors (cume_dist 1/3, 2/3, 1 → exactly one drop) — the
    // outlier id 3, farthest from the 4-point centroid — keeping 0 and 2
    val df = emb(
      0L -> Seq(1.0f, 0.0f), 1L -> Seq(1.0f, 0.001f),
      2L -> Seq(0.95f, 0.31f), 3L -> Seq(0.8f, 0.35f))
    val kept = Cluster.semanticCurate(df, "vec_id", "embedding",
        k = 1, iters = 2, tau = 0.999, dropFrac = 0.34)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 2L))
  }

  test("assignStored runs unchanged on a STREAM (stateless map-only plan)") {
    // the fit/assign split's payoff: the assignment is a pure projection,
    // so the same operator classifies a live embedding stream against the
    // frozen stored model — no state store, no watermark needed
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batch = emb(0L -> Seq(0.0f, 0.0f), 1L -> Seq(10.0f, 10.0f))
    val model = Cluster.fitCentroids(batch, "vec_id", "embedding", k = 2, iters = 1)
    val input = MemoryStream[(Long, Seq[Float])]
    val q = Cluster.assignStored(input.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding", model)
      .writeStream.format("memory").queryName("stream_assign")
      .outputMode("append").start()
    try {
      input.addData((10L, Seq(0.3f, 0.1f)), (11L, Seq(9.0f, 9.5f)))
      q.processAllAvailable()
      val got = spark.table("stream_assign")
        .select("vec_id", "cid").as[(Long, Long)].collect().toMap
      assert(got == Map(10L -> 0L, 11L -> 1L))
    } finally q.stop()
  }

  test("incrementalSemDeDup: batch docs drop vs corpus OR lower-id batch mates only") {
    // corpus defines two clusters; batch brings: a near-dup of a corpus
    // doc (dropped), two near-dups of each other (higher id dropped,
    // lower survives — no corpus neighbor), and a genuinely new doc
    val corpus = emb(0L -> Seq(1.0f, 0.0f), 1L -> Seq(0.0f, 1.0f))
    val batch = emb(
      10L -> Seq(1.0f, 0.001f),   // ≈ corpus 0 → dropped
      11L -> Seq(0.0f, -1.0f),    // new direction → survives
      12L -> Seq(-1.0f, 0.004f),  // ≈ 13 but no corpus match → survives
      13L -> Seq(-1.0f, 0.005f))  // ≈ 12, higher id → dropped
    val kept = Cluster.incrementalSemDeDup(corpus, batch, "vec_id", "embedding",
        k = 2, iters = 2, tau = 0.9)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(11L, 12L))
  }

  test("semDeDup keeps dissimilar cluster-mates") {
    // same cluster, cosine ~0.707 < 0.9 → both survive
    val df = emb(0L -> Seq(1.0f, 0.0f), 1L -> Seq(1.0f, 1.0f))
    val kept = Cluster.semDeDup(df, "vec_id", "embedding",
        k = 1, iters = 1, tau = 0.9)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 1L))
  }

  test("incrementalSemDeDupStored from stored tables ≡ the inline form") {
    val corpus = emb(0L -> Seq(1.0f, 0.0f), 1L -> Seq(0.0f, 1.0f),
      2L -> Seq(0.9f, 0.1f))
    val batch = emb(
      10L -> Seq(1.0f, 0.001f), 11L -> Seq(0.0f, -1.0f),
      12L -> Seq(-1.0f, 0.004f), 13L -> Seq(-1.0f, 0.005f))
    val inline = Cluster.incrementalSemDeDup(corpus, batch,
        "vec_id", "embedding", k = 2, iters = 2, tau = 0.9)
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    // production path: model + assignments round-trip through parquet
    val root = java.nio.file.Files.createTempDirectory("graft_semdedup_stored")
      .toString
    val model = Cluster.fitCentroids(corpus, "vec_id", "embedding",
      k = 2, iters = 2)
    model.write.parquet(s"$root/centroids")
    val storedModel = spark.read.parquet(s"$root/centroids")
    Cluster.assignStored(corpus, "vec_id", "embedding", storedModel)
      .write.parquet(s"$root/assignments")
    val stored = Cluster.incrementalSemDeDupStored(
        spark.read.parquet(s"$root/assignments"), batch,
        "vec_id", "embedding", storedModel, tau = 0.9)
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    assert(stored == inline)
  }

  test("malformed embeddings fail loudly instead of skewing the model") {
    // length mismatch with the centroid dims → raise_error, not an
    // arbitrary cid with a silently-skipped centroid contribution
    val model = Cluster.fitCentroids(
      emb(0L -> Seq(0.0f, 0.0f), 1L -> Seq(10.0f, 10.0f)),
      "vec_id", "embedding", k = 2, iters = 1)
    def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse(""))
      .mkString("|")
    val short = emb(5L -> Seq(1.0f)) // dims 1 ≠ model dims 2
    val e = intercept[Exception] {
      Cluster.assignStored(short, "vec_id", "embedding", model).collect()
    }
    assert(chain(e).contains("malformed embedding"), chain(e))
    // a null element inside the vector is equally malformed
    val withNull = Seq((6L, Seq(Some(1.0f), None))).toDF("vec_id", "embedding")
    val e2 = intercept[Exception] {
      Cluster.assignStored(withNull, "vec_id", "embedding", model).collect()
    }
    assert(chain(e2).contains("malformed embedding"), chain(e2))
  }
}
