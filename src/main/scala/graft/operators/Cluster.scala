package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic clustering over an embedding column (`array<float>`):
  * deterministic quantized k-means and SemDeDup-style within-cluster
  * semantic deduplication (Abbas et al. 2023, "SemDeDup: Data-efficient
  * learning at web-scale through semantic deduplication" — cluster first,
  * then compare pairs ONLY inside a cluster, so the pairwise cost is
  * bounded by cluster size instead of corpus²).
  *
  * Determinism (the property that lets an external engine replay the run
  * bit-for-bit, and two cluster runs agree):
  *  - vectors quantize to `floor(x * 2^20)` longs — a power-of-two multiply
  *    is EXACT in IEEE-754 (no rounding step, unlike `round(x*scale)` whose
  *    half-way ties depend on the engine's rounding mode), so the quantized
  *    grid is engine-independent;
  *  - squared-L2 distances are exact integer sums (≤ dims·(2·2^20)² ≈ 2^46,
  *    inside both long and double-53 exactness);
  *  - assignment ties break by lowest centroid id (struct-min);
  *  - centroid update is `floor(sum/count)` evaluated in double — sums stay
  *    < 2^53 so the division inputs are exact, and both engines floor the
  *    same IEEE quotient; summation order is irrelevant (integer adds);
  *  - init = the k lowest-id vectors (a total order, not a seeded sample).
  *
  * Scale shape: per iteration one scan + one map-side-combinable aggregate
  * of k·(dims+1) cells; centroids travel as broadcast literals (k·dims
  * longs). This is the classic broadcast-k-means shape (Spark MLlib's
  * KMeans does the same collect-update loop); driver state is k·dims longs
  * per iteration, corpus-size-independent.
  */
object Cluster {

  /** Quantization scale: 2^20 (exact power-of-two multiply, see above). */
  val QuantScale: Int = 1 << 20

  /** `floor(x * scale)` per element as `array<bigint>` — the tie-free
    * engine-portable quantizer (contrast [[graft.functions.VectorFunctions.quantize]],
    * which rounds and is kept for callers that match a round-based oracle).
    * Codegen'd ([[graft.functions.QuantizeFloorLong]]) — identical values
    * to `transform(a, x => floor(x.cast("double") * scale).cast("long"))`.
    */
  def quantizeFloor(a: Column, scale: Int = QuantScale): Column =
    graft.functions.VectorFunctions.quantizeFloor(a, scale)

  /** Nearest centroid for a quantized vector against literal centroids as a
    * struct(d, cid); ties break to the lowest cid. `d` is the exact integer
    * squared distance. Shared with the PQ tier ([[Similarity.pqEncode]]) —
    * ONE definition of the argmin kernel, so a tie-break or null-contract
    * change applies everywhere. Since round 16 this is the fused
    * [[graft.functions.NearestCentroid]] expression (one plan node, the
    * matrix plan-referenced like any literal) instead of a k-literal
    * `least(struct(sq_dist_lit…))` chain — value-identical (same integer
    * math, same tie-break, malformed vector → null struct → the branded
    * raise), but O(1) plan size in k: at IVF-practice coarseK (~√N ⇒
    * 10⁴–10⁶ cells at 100 TB) the literal chain blows past Janino's
    * 64 KB method limit (silent interpreted fallback) and the plan
    * serialization budget.
    */
  /** RECORDED crossover for the plan-referenced argmin/probe kernels
    * (`nearest_centroid`/`nearest_cells`): the flat centroid matrix is
    * O(1) in PLAN size (one reference object), but the array itself
    * ships with every stage binary that evaluates the kernel —
    * coarseK·dims·8 bytes per stage. This advisory (2^23 longs = 64 MiB)
    * marks where that shipment stops being the right trade: at coarseK
    * 10⁵ × dims 64 the matrix is ~51 MiB (still under), at 10⁶ it is
    * ~512 MiB per stage — above the advisory a deployment should switch
    * the probe/assign step to the broadcast-join shape the engine
    * already ships (broadcast the k-row coarse FRAME against the corpus
    * and rank with [[graft.plans.TopKPerKey]](nprobe) — exactly the
    * exact-side shape of `AnnIndex.recallProbe`), which streams the
    * centroids once per executor through the broadcast machinery instead
    * of once per task binary. Kernel correctness itself does NOT degrade
    * above the line (spec-pinned at coarseK 2^17 under CODEGEN_ONLY);
    * the constant is the measured-shape decision, enforced as a loud
    * log, not a refusal — a 10⁵-class coarseK with small dims is still
    * firmly kernel territory.
    */
  val KernelMatrixAdvisoryMaxLongs: Long = 1L << 23

  private[operators] def assignStruct(q: Column, centroids: Array[Array[Long]]): Column =
    graft.functions.VectorFunctions.nearestCentroid(q, centroids)

  /** Extract a field of the assignment struct, raising on a null distance.
    * A null `d` means a malformed vector (null embedding, null element, or
    * length ≠ the centroid dims): struct-least would hand such a row an
    * arbitrary cid and the centroid sums would silently skip it, skewing
    * the model — fail loudly instead (both fields are guarded so a plan
    * that prunes `dist` still trips the check through `cid`).
    */
  private def checkedField(a: Column, field: String): Column =
    when(a.getField("d").isNull, raise_error(lit(
      "Cluster: malformed embedding (null, null element, or length mismatch " +
        "with the centroid dims)")))
      .otherwise(a.getField(field))

  private[operators] def assignExpr(q: Column, centroids: Array[Array[Long]]): Column =
    checkedField(assignStruct(q, centroids), "cid")

  /** One-shot cache lifecycle — shared with [[Dedup.materializeAndRelease]]:
    * materialize the bounded result eagerly, then release the fat
    * intermediate so a long bench session never accumulates index caches.
    */
  private def materializeAndRelease(result: DataFrame, cached: DataFrame*): DataFrame =
    Dedup.materializeAndRelease(result, cached: _*)

  /** The iteration loop on an already-quantized, persisted frame: lowest-k
    * init, `iters − 1` floor(sum/count) updates. Returns the FINAL
    * centroids (the model — k·dims longs of driver state). Shared with
    * [[Similarity.ivfPqIndex]], whose coarse quantizer fits on the SAME
    * persisted quant frame its residuals then read — one quantize pass
    * for the whole index build.
    */
  private[operators] def fitOnQuantized(quant: DataFrame, idCol: String,
      k: Int, iters: Int): Array[Array[Long]] = {
    val dims = quant.select(size(col("q"))).limit(1).collect() match {
      case Array(r) => r.getInt(0)
      case _ => throw new IllegalArgumentException("empty corpus")
    }
    // init: the k lowest-id vectors (deterministic total order); a NULL
    // among them gets the branded malformed-embedding error instead of a
    // raw driver NPE (executor-side rows hit checkedField's guard)
    val initRows = quant.orderBy(col(idCol).asc).limit(k).collect()
    require(initRows.length == k,
      s"need at least $k vectors, got ${initRows.length}")
    var centroids: Array[Array[Long]] = initRows.map { r =>
      require(!r.isNullAt(1), "Cluster: malformed embedding (null) among " +
        "the k lowest-id init vectors")
      r.getSeq[Long](1).toArray
    }
    for (it <- 1 until iters) {
      // one k-row aggregate: count + per-dimension long sums (map-side
      // combinable; k·(dims+1) cells reach the driver)
      val aggs = count(lit(1)).as("n") +:
        (0 until dims).map(d => sum(col("q").getItem(d)).as(s"s$d"))
      val byCid = quant.withColumn("cid", assignExpr(col("q"), centroids))
        .groupBy(col("cid"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
        .map { r =>
          val n = r.getLong(1)
          r.getLong(0) -> Array.tabulate(dims)(d =>
            math.floor(r.getLong(d + 2).toDouble / n).toLong)
        }.toMap
      // empty cluster → keep previous centroid
      centroids = Array.tabulate(k)(j => byCid.getOrElse(j.toLong, centroids(j)))
    }
    centroids
  }

  /** Deterministic k-means over `embCol`: returns (idCol, q, cid, dist)
    * where `q` is the quantized vector (kept so downstream within-cluster
    * math — [[semDeDup]], [[semanticPrune]] — reuses it without re-reading
    * floats) and `dist` the exact integer squared distance to the assigned
    * centroid (the outlier signal). `iters` assignment/update rounds after
    * the lowest-k-ids init; a cluster that goes empty keeps its previous
    * centroid. The result comes back MATERIALIZED (localCheckpoint — one
    * row per vector, dims longs wide) and the quantization cache is
    * released before returning.
    */
  def kmeansQuantized(df: DataFrame, idCol: String, embCol: String,
      k: Int, iters: Int, scale: Int = QuantScale): DataFrame = {
    require(k > 0 && iters > 0, s"k and iters must be positive, got $k/$iters")
    // persisted: every iteration scans it (assign + update agg), and the
    // final assignment reads it once more
    val quant = df.select(col(idCol), quantizeFloor(col(embCol), scale).as("q"))
      .persist()
    val centroids =
      try fitOnQuantized(quant, idCol, k, iters)
      catch { case e: Throwable => quant.unpersist(blocking = false); throw e }
    materializeAndRelease(
      quant.withColumn("__a", assignStruct(col("q"), centroids))
        .select(col(idCol), col("q"),
          checkedField(col("__a"), "cid").as("cid"),
          checkedField(col("__a"), "d").as("dist")),
      quant)
  }

  /** Fit-only: the k-means model as a (cid, q) frame — k rows, ready to
    * land in the lake. The fit/assign split is the production shape: at
    * 100 TB you fit on a (deterministic) sample, persist the centroids, and
    * every downstream job — including incremental batches that arrive
    * later — assigns with [[assignStored]]'s map-only scan instead of
    * re-running iterations over the full corpus.
    */
  def fitCentroids(df: DataFrame, idCol: String, embCol: String,
      k: Int, iters: Int, scale: Int = QuantScale): DataFrame = {
    require(k > 0 && iters > 0, s"k and iters must be positive, got $k/$iters")
    val quant = df.select(col(idCol), quantizeFloor(col(embCol), scale).as("q"))
      .persist()
    try {
      val centroids = fitOnQuantized(quant, idCol, k, iters)
      val spark = df.sparkSession
      import spark.implicits._
      centroids.zipWithIndex
        .map { case (c, j) => (j.toLong, c.toSeq) }.toSeq
        .toDF("cid", "q")
    } finally quant.unpersist(blocking = false)
  }

  /** Assign-only against a stored centroid table (`(cid, q)` as written by
    * [[fitCentroids]]): the model collects to k·dims literals (a bounded
    * model read, same shape as a broadcast) and the assignment is ONE
    * stateless map-only scan — no iterations, no shuffle. Returns
    * (idCol, q, cid, dist) — same shape as [[kmeansQuantized]], so every
    * downstream consumer ([[semDeDup]]-style pair math, [[semanticPrune]]
    * gates, [[incrementalSemDeDup]]) reads either interchangeably.
    */
  def assignStored(df: DataFrame, idCol: String, embCol: String,
      centroidsDf: DataFrame, scale: Int = QuantScale): DataFrame = {
    val rows = centroidsDf.select(col("cid"), col("q")).collect()
      .sortBy(_.getLong(0))
    require(rows.nonEmpty, "empty centroid table")
    require(rows.zipWithIndex.forall { case (r, j) => r.getLong(0) == j },
      "centroid cids must be contiguous 0..k-1 (assignStruct indexes by position)")
    val centroids = rows.map(_.getSeq[Long](1).toArray)
    if (centroids.length.toLong * centroids(0).length >
        KernelMatrixAdvisoryMaxLongs)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"assignStored: centroid matrix ${centroids.length}x" +
          s"${centroids(0).length} exceeds the kernel advisory " +
          s"($KernelMatrixAdvisoryMaxLongs longs) — see " +
          "Cluster.KernelMatrixAdvisoryMaxLongs for the crossover to the " +
          "broadcast-join probe shape")
    df.select(col(idCol), quantizeFloor(col(embCol), scale).as("q"))
      .withColumn("__a", assignStruct(col("q"), centroids))
      .select(col(idCol), col("q"),
        checkedField(col("__a"), "cid").as("cid"),
        checkedField(col("__a"), "d").as("dist"))
  }

  /** SemDeDup: k-means, then inside each cluster drop every vector that has
    * a LOWER-id cluster-mate with cosine ≥ `tau` (keep-lowest-id survivor
    * rule — deterministic, order-free). Returns surviving (idCol, cid).
    *
    * The pairwise join is an equi-join on the pair key — never a cartesian
    * across clusters — so the candidate count is Σ|cluster|² bounded by
    * `maxClusterSize` (BOUNDED occupancy by default since round 13, see
    * [[semanticCurate]]; `maxClusterSize = Int.MaxValue` opts into the
    * classic unbounded candidates). Norms are computed once per row, not
    * per pair.
    */
  def semDeDup(df: DataFrame, idCol: String, embCol: String,
      k: Int, iters: Int, tau: Double, scale: Int = QuantScale,
      maxClusterSize: Int = DefaultSemClusterCap, extraBits: Int = 3,
      splitSeed: Long = 101L, dims: Int = 0): DataFrame =
    semanticCurate(df, idCol, embCol, k, iters, tau, dropFrac = 0.0, scale,
      maxClusterSize, extraBits, splitSeed, dims)
      .select(col(idCol), col("cid"))

  /** Quantized seeded hyperplanes on the SAME integer grid as the vectors
    * (`round(plane·scale)`): the split key ingredient for
    * [[semDeDupBounded]], computed once in Scala so the engine expression
    * and a replaying oracle embed IDENTICAL literals — no cross-engine
    * float rounding anywhere.
    */
  def quantizedPlanes(n: Int, dims: Int, seed: Long,
      scale: Int = QuantScale): Seq[Seq[Long]] =
    graft.functions.VectorFunctions.seededPlanes(n, dims, seed)
      .map(_.map(x => math.round(x * scale)))

  /** Default occupancy cap for the SemDeDup family's within-cluster pair
    * step: pair work per pair-key is occupancy², so 4096 bounds any single
    * key's candidates at ~16M — one healthy task, never a straggler. At
    * 100 TB density hot-spots (boilerplate embeddings, template docs) are
    * guaranteed, so BOUNDED is the default across [[semanticCurate]],
    * [[semDeDup]], and the incremental variants; unbounded (the exact
    * classic SemDeDup candidates) is the `maxClusterSize = Int.MaxValue`
    * opt-in. Mirrors [[Dedup.DefaultCosineBucketCap]].
    */
  val DefaultSemClusterCap = 4096

  /** Over-cap clusters split on the most recent bounded SemDeDup-family
    * run in this JVM (−1 before any run) — the same observability the
    * advisor asked of the cosine LSH default ([[Dedup.lastOversizedBucketSplits]]):
    * bounded occupancy trades dense-cluster recall for bounded pair work,
    * and a caller (or spec) can now see whether any cluster actually
    * split instead of silently getting the trade. Also logged per run.
    * The probe is one aggregate over the already-materialized assignment
    * (≤ k rows) — driver cost is k counters.
    *
    * CONTRACT: JVM-global last-write-wins (same as
    * [[Dedup.lastOversizedBucketSplits]]) — read right after the run it
    * should describe, from the same thread; under concurrent runs the
    * per-run log line is the attributable record.
    */
  private val oversizedSplits = new java.util.concurrent.atomic.AtomicLong(-1L)
  def lastOversizedClusterSplits: Long = oversizedSplits.get()

  /** ONE occupancy pass serving both consumers: the ≤ k-row per-cid
    * aggregate is collected (k is centroid-scale — the same bound the
    * k-means driver state already carries), the split metric and its log
    * line derive from the collected rows, and the SAME rows come back as
    * a broadcast local relation for the refinement join. Before round 13
    * the probe and the plan each ran their own aggregate — on the arrival
    * path that re-evaluated the un-persisted neighbors union (pruned
    * corpus + batch) a whole extra time per batch.
    */
  /** Hard bound on the per-cid rows the occupancy probe may pull to the
    * driver: k scales with corpus (k ≈ N/1000 per the round-10 sizing
    * note), so at extreme k the collected aggregate is no longer a
    * "bounded model read". Same order as the union-find edge cap — a few
    * hundred MB of driver rows is where collect-and-rebroadcast stops
    * being the cheap plan anyway.
    */
  private[graft] var OccupancyCollectCap = 4 * 1000 * 1000

  private def occupancyBroadcast(assignedOrNeighbors: DataFrame,
      maxClusterSize: Int, extraBits: Int): DataFrame = {
    val agg = assignedOrNeighbors.groupBy("cid")
      .agg(count(lit(1)).as("__occ"))
    // cap + 1: detects overflow without ever collecting an unbounded set.
    // Priced precisely: the probe ships ≤ cap+1 rows in ONE evaluation —
    // the cheapest plan for the common under-cap case (which must not pay
    // a second evaluation; re-running the un-persisted neighbors union
    // was the round-13 regression this function exists to avoid). In the
    // extreme-k OVER-cap regime the probe's shipped rows are discarded
    // and the source evaluates twice more (metric aggregate + in-plan
    // join) — ~3 evaluations total, acceptable where a broadcast of the
    // per-cid relation would be the real mistake.
    val rows = agg.limit(OccupancyCollectCap + 1).collect()
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    if (rows.length > OccupancyCollectCap) {
      // EXTREME-k fallback (priced, same discipline as the union-find
      // pointer-jumping fallback): never collect per-cid rows — the split
      // metric comes from a two-scalar aggregate and the occupancy joins
      // in-plan, which re-evaluates the source once more and lets AQE
      // pick the join strategy at a k where a driver broadcast is wrong
      val splits = agg.agg(
        sum(when(col("__occ") > maxClusterSize.toLong, 1L).otherwise(0L)))
        .head.getLong(0)
      oversizedSplits.set(splits)
      log.info(s"semDeDup: occupancy probe over $OccupancyCollectCap cids " +
        s"— using the in-plan aggregate join (splits = $splits)")
      return agg
    }
    val occIdx = agg.schema.fieldIndex("__occ")
    val splits = rows.count(_.getLong(occIdx) > maxClusterSize.toLong)
    oversizedSplits.set(splits.toLong)
    if (splits > 0)
      log.info(
        s"semDeDup: $splits cluster(s) over occupancy cap $maxClusterSize " +
          s"re-bucketed $extraBits plane bit(s) deeper (reduced near-dup " +
          "recall inside those clusters; maxClusterSize = Int.MaxValue " +
          "opts out)")
    broadcast(assignedOrNeighbors.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), agg.schema))
  }

  /** The `extraBits` sign bits of exact integer plane dots for one
    * quantized vector — the split signature ingredient shared by every
    * bounded SemDeDup path (ONE definition, so each path and its oracle
    * replay the identical key). Products ≤ 2^47, sums ≤ 2^53: exact long
    * arithmetic end-to-end.
    */
  private def splitSig(qCol: Column, dims: Int, extraBits: Int, seed: Long,
      scale: Int): Column = {
    val pq = quantizedPlanes(extraBits, dims, seed, scale)
    def dot(p: Seq[Long]): Column =
      aggregate(zip_with(qCol, typedLit(p), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x)
    (0 until extraBits).map(j =>
      when(dot(pq(j)) >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** The refined pair key: `cid·2^(extraBits+1) + isSplit·2^extraBits +
    * sig`, so split and unsplit keyspaces never collide and the pair step
    * stays ONE hash equi-join.
    */
  private def refinedCid(cidCol: Column, occCol: Column, sig: Column,
      maxClusterSize: Int, extraBits: Int): Column = {
    val shiftMul = 1L << (extraBits + 1)
    val half = 1L << extraBits
    when(occCol <= maxClusterSize, cidCol * shiftMul)
      .otherwise(cidCol * shiftMul + half + sig)
  }

  /** Embedding dimensionality for the split planes: the caller's explicit
    * value, or (dims = 0) one bounded `head(1)` over the already-
    * materialized quantized frame — never a corpus scan. An empty frame
    * yields 1: with no rows there are no pairs, so any plane set is
    * vacuously correct.
    */
  private def resolveDims(quantized: DataFrame, qColName: String,
      dims: Int): Int =
    if (dims > 0) dims
    else quantized.select(size(col(qColName)).cast("int"))
      .head(1).headOption.map(_.getInt(0)).getOrElse(1)

  /** [[semDeDup]] with an EXPLICIT occupancy cap — the q46b answer applied
    * to SemDeDup's Σ|cluster|² pair work, the sf3 density gate's one
    * watch-item: a cluster whose occupancy exceeds `maxClusterSize`
    * re-buckets ONE level deeper by the sign bits of `extraBits` integer
    * dot products between the QUANTIZED vector and [[quantizedPlanes]]
    * (exact long arithmetic end-to-end — products ≤ 2^47, sums ≤ 2^53 —
    * so any engine replays the split bit-for-bit). Pair work in a split
    * cluster shrinks up to ~4^extraBits-fold. Recall inside a split
    * cluster: a near-dup pair survives iff it also agrees on every extra
    * plane — the standard (1 − θ/π) per-plane LSH acceptance; exact
    * duplicates always survive (identical vectors share every sign).
    * Under-cap clusters keep EXACTLY the classic candidates. Output
    * cluster ids are the ORIGINAL cids — the split key exists only inside
    * the pair step.
    *
    * Since round 13 this is a thin delegate: [[semanticCurate]] (and so
    * [[semDeDup]]) run the SAME bounded pair step by default; this entry
    * point remains for callers pinning an explicit cap (q101b).
    */
  def semDeDupBounded(df: DataFrame, idCol: String, embCol: String,
      dims: Int, k: Int, iters: Int, tau: Double, maxClusterSize: Int,
      extraBits: Int = 3, seed: Long = 101L,
      scale: Int = QuantScale): DataFrame =
    semanticCurate(df, idCol, embCol, k, iters, tau, dropFrac = 0.0,
      scale, maxClusterSize, extraBits, seed, dims)
      .select(col(idCol), col("cid"))

  /** The combined semantic curation pass — ONE k-means, then SemDeDup's
    * within-cluster near-dup drop, then the SSL-prototypes outlier gate
    * over the SURVIVORS (cume_dist per cluster on the exact integer
    * distance). Running the stages through one shared assignment halves
    * the corpus scans versus chaining [[semDeDup]] + [[semanticPrune]].
    * Returns surviving (idCol, cid, dist).
    *
    * BOUNDED occupancy by default (round 13 — the sf3 density gate's
    * answer made the default, same lifecycle as the cosine LSH cap): a
    * cluster past `maxClusterSize` re-buckets one level deeper by
    * [[splitSig]]'s exact integer plane signs before the pair join, so
    * pair work per key is capped at maxClusterSize² instead of growing
    * with the hottest cluster's density². Under-cap clusters keep EXACTLY
    * the classic candidates, and `maxClusterSize = Int.MaxValue` opts out
    * entirely (that path builds the PLAIN cid pair key — no occupancy
    * probe, no planes, the pre-round-13 plan verbatim). `dims` (needed
    * only for the split planes) defaults to a bounded head(1) inference
    * over the materialized quantized frame.
    */
  def semanticCurate(df: DataFrame, idCol: String, embCol: String,
      k: Int, iters: Int, tau: Double, dropFrac: Double,
      scale: Int = QuantScale,
      maxClusterSize: Int = DefaultSemClusterCap, extraBits: Int = 3,
      splitSeed: Long = 101L, dims: Int = 0): DataFrame = {
    require(maxClusterSize > 0 && extraBits > 0 && extraBits < 20)
    // already materialized, so the three reads below (two join sides + the
    // survivor base) re-serve its blocks instead of re-running k-means
    val assigned = kmeansQuantized(df, idCol, embCol, k, iters, scale)
    val keyed =
      if (maxClusterSize == Int.MaxValue) {
        oversizedSplits.set(0L)
        assigned.withColumn("__rcid", col("cid"))
      } else {
        val d = resolveDims(assigned, "q", dims)
        // ONE occupancy pass, collected then re-broadcast (≤ k tiny
        // rows) — same non-window discipline as the LSH occupancy probe
        val occ = occupancyBroadcast(assigned, maxClusterSize, extraBits)
        assigned.join(occ, Seq("cid"))
          .withColumn("__rcid", refinedCid(col("cid"), col("__occ"),
            splitSig(col("q"), d, extraBits, splitSeed, scale),
            maxClusterSize, extraBits))
          .drop("__occ")
      }
    val a = keyed.select(col(idCol).as("id_a"), col("q").as("qa"), col("__rcid"))
    val b = keyed.select(col(idCol).as("id_b"), col("q").as("qb"), col("__rcid"))
    // fused codegen'd dot+norms per pair (CosineLongQuantized) — the HOF
    // form here was the whole suite's hottest loop (~Σ|cluster|² pairs ×
    // dims interpreted evals); numerics identical, zero-norm → 0.0 < tau
    val dropped = a.join(b, Seq("__rcid"))
      .filter(col("id_a") < col("id_b"))
      .filter(graft.functions.VectorFunctions.cosineOfQuantized(
        col("qa"), col("qb")) >= tau)
      .select(col("id_b")).distinct()
    val deduped = assigned.select(col(idCol), col("cid"), col("dist"))
      .join(dropped, col(idCol) === col("id_b"), "left_anti")
    if (dropFrac > 0)
      Corpus.qualityGate(deduped, idCol, "cid", -col("dist"), dropFrac)
        .select(col(idCol), col("cid"), col("dist"))
    else deduped
  }

  /** Incremental SemDeDup — the demo/one-shot form: fits the model and
    * assigns the corpus INLINE, then delegates to
    * [[incrementalSemDeDupStored]]. For repeated arrivals this re-fits
    * and re-assigns the full corpus every call — production flows write
    * [[fitCentroids]] + [[assignStored]] to the lake once and call the
    * stored variant directly, making each batch corpus-size-independent.
    * Returns surviving batch (idCol, cid).
    */
  def incrementalSemDeDup(corpus: DataFrame, batch: DataFrame,
      idCol: String, embCol: String, k: Int, iters: Int, tau: Double,
      scale: Int = QuantScale,
      maxClusterSize: Int = DefaultSemClusterCap, extraBits: Int = 3,
      splitSeed: Long = 101L, dims: Int = 0): DataFrame = {
    val model = fitCentroids(corpus, idCol, embCol, k, iters, scale)
    incrementalSemDeDupStored(
      assignStored(corpus, idCol, embCol, model, scale),
      batch, idCol, embCol, model, tau, scale,
      maxClusterSize, extraBits, splitSeed, dims)
  }

  /** Incremental SemDeDup from STORED state — the production arrival path
    * (the semantic analog of the stored MinHash index feeding
    * `Dedup.minHashIncrementalPairsPortable`): `centroidsDf` is the k-row
    * (cid, q) model written once by [[fitCentroids]], and `assignments`
    * the (idCol, q, cid[, dist]) corpus-assignment lake table written once
    * by [[assignStored]]. Per batch the plan is exactly:
    *
    *  1. ONE map-only quantize+assign scan of the BATCH (k `sq_dist_lit`
    *     kernels per row, centroids as broadcast-sized literals); and
    *  2. ONE co-cluster equi-join of the slim stored assignment rows
    *     against the (typically broadcast) batch — candidate pairs bounded
    *     by Σ|cluster ∩ batch-relevant|, never corpus².
    *
    * No corpus-wide fit, quantization, or assignment appears in the
    * per-batch plan (plan-pinned in PlanShapeSpec); the corpus side is a
    * slim stored-table read, so per-batch compute is O(batch) — and the
    * read is PRUNED to the batch's clusters: the batch's distinct cids
    * (≤ k values, one bounded map-only job over the batch) become an
    * `IN`-filter on the assignment read, which a cid-PARTITIONED
    * assignment table (the layout q111 writes) turns into partition
    * pruning — the per-batch corpus I/O is Σ|touched clusters|, not the
    * corpus (plan-pinned: PartitionFilters on the assignments scan). A
    * batch doc is dropped when any co-clustered corpus member or lower-id
    * co-clustered batch mate sits at cosine ≥ `tau`. Returns surviving
    * batch (idCol, cid).
    *
    * BOUNDED occupancy by default (round 13): the arrival path has the
    * same Σ|cluster ∩ relevant|² exposure as the one-shot form — a dense
    * cluster that keeps receiving near-template arrivals would otherwise
    * grow the per-batch join superlinearly. Occupancy is counted over the
    * NEIGHBOR side (pruned corpus + batch — exactly the rows entering the
    * pair join); over-cap clusters re-bucket both sides by [[splitSig]]'s
    * plane signs, so a batch doc still meets every co-bucketed neighbor.
    * `maxClusterSize = Int.MaxValue` opts into the classic plan verbatim.
    */
  def incrementalSemDeDupStored(assignments: DataFrame, batch: DataFrame,
      idCol: String, embCol: String, centroidsDf: DataFrame, tau: Double,
      scale: Int = QuantScale,
      maxClusterSize: Int = DefaultSemClusterCap, extraBits: Int = 3,
      splitSeed: Long = 101L, dims: Int = 0): DataFrame = {
    // materialize the assigned batch ONCE: it feeds three consumers (the
    // cid-collect action, the neighbors union, the join probe side), and
    // without this each consumer re-reads and re-quantizes the batch —
    // k `sq_dist_lit` kernels per row ×3, the dominant per-batch compute
    // at production batch sizes. After this the arrival plan carries no
    // raw-embedding scan and no quantize kernel at all (plan-pinned).
    val batchA = materializeAndRelease(
      assignStored(batch, idCol, embCol, centroidsDf, scale))
    incrementalSemDeDupAssigned(assignments, batchA, idCol, tau, scale,
      maxClusterSize, extraBits, splitSeed, dims)
  }

  /** [[incrementalSemDeDupStored]] over a batch that is ALREADY assigned
    * (`(idCol, q, cid, dist)` as produced by [[assignStored]]) and
    * MATERIALIZED (checkpointed/persisted) by the caller. Split out so a
    * per-arrival flow ([[graft.flows.StreamingSemDeDup.applyBatch]]) that
    * must also APPEND the batch's assignment rows assigns exactly once —
    * one quantize+argmin kernel pass and one checkpoint serve both the
    * survivor rule and the index write, instead of re-running the kernel
    * (and re-planning its lineage) per consumer.
    */
  def incrementalSemDeDupAssigned(assignments: DataFrame, batchA: DataFrame,
      idCol: String, tau: Double, scale: Int = QuantScale,
      maxClusterSize: Int = DefaultSemClusterCap, extraBits: Int = 3,
      splitSeed: Long = 101L, dims: Int = 0): DataFrame = {
    require(maxClusterSize > 0 && extraBits > 0 && extraBits < 20)
    // ≤ k rows reach the driver (cid ∈ 0..k-1 by assignStored's contract)
    val batchCids = batchA.select(col("cid")).distinct()
      .collect().map(_.getLong(0)).sorted
    val pruned =
      if (batchCids.isEmpty) assignments.filter(lit(false))
      else assignments.filter(col("cid").isin(batchCids: _*))
    // neighbor side: every stored corpus assignment, plus batch members
    // (the id_a < id_b filter below makes the batch-internal rule
    // keep-lowest-id; corpus neighbors drop a batch doc regardless of id
    // order)
    val neighbors = pruned
      .select(col(idCol).as("id_a"), col("q").as("qa"), col("cid"),
        lit(true).as("is_corpus"))
      .unionByName(batchA.select(col(idCol).as("id_a"), col("q").as("qa"),
        col("cid"), lit(false).as("is_corpus")))
    val batchB = batchA.select(col(idCol).as("id_b"), col("q").as("qb"),
      col("cid"))
    val (aSide, bSide, pairKey) =
      if (maxClusterSize == Int.MaxValue) {
        oversizedSplits.set(0L)
        (neighbors, batchB, "cid")
      } else {
        val d = resolveDims(batchA, "q", dims)
        // occupancy over the NEIGHBOR side — the rows that actually enter
        // the pair join (pruned corpus + batch); every batch cid appears
        // there by construction, so both inner joins below are total.
        // ONE pass: collected then re-broadcast, so the un-persisted
        // neighbors union isn't aggregated a second time per batch
        val occ = occupancyBroadcast(neighbors, maxClusterSize, extraBits)
        def keyed(side: DataFrame, qName: String) =
          side.join(occ, Seq("cid"))
            .withColumn("__rcid", refinedCid(col("cid"), col("__occ"),
              splitSig(col(qName), d, extraBits, splitSeed, scale),
              maxClusterSize, extraBits))
            .drop("__occ", "cid")
        (keyed(neighbors, "qa"), keyed(batchB, "qb"), "__rcid")
      }
    val dropped = aSide.join(bSide, Seq(pairKey))
      .filter(col("is_corpus") || col("id_a") < col("id_b"))
      .filter(graft.functions.VectorFunctions.cosineOfQuantized(
        col("qa"), col("qb")) >= tau)
      .select(col("id_b")).distinct()
    batchA.select(col(idCol), col("cid"))
      .join(dropped, col(idCol) === col("id_b"), "left_anti")
  }

  /** Semantic outlier pruning (the SSL-prototypes companion to SemDeDup:
    * Sorscher et al. 2022 keep EASY examples by pruning far-from-prototype
    * points): k-means, then drop the `dropFrac` of each cluster FARTHEST
    * from its centroid. Delegates the per-cluster cut to
    * [[Corpus.qualityGate]] with score = −dist — the identical
    * cume_dist-over-total-order machinery, so the survivor set is
    * deterministic. Returns surviving (idCol, cid, dist).
    */
  def semanticPrune(df: DataFrame, idCol: String, embCol: String,
      k: Int, iters: Int, dropFrac: Double, scale: Int = QuantScale): DataFrame = {
    val assigned = kmeansQuantized(df, idCol, embCol, k, iters, scale)
    Corpus.qualityGate(assigned, idCol, "cid", -col("dist"), dropFrac)
      .select(col(idCol), col("cid"), col("dist"))
  }
}
