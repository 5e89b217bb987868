package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers:
  *  - brute-force cosine top-k: exact, one scan, TakeOrderedAndProject —
  *    the correctness baseline and fine whenever the query set is small;
  *  - LSH-bucketed ANN: random-hyperplane signatures bucket the corpus so a
  *    batch of queries joins only its buckets (equi-join on signature →
  *    shuffle/broadcast hash join instead of a cartesian product). At 100 TB
  *    the bucket join is the only shape that survives; multi-probe (probe
  *    neighboring signatures within 1 bit) recovers recall.
  */
object Similarity {

  /** Exact top-k by cosine against one literal query vector. Spark compiles
    * orderBy+limit into TakeOrderedAndProject: each partition keeps a k-heap
    * and only k rows per partition reach the driver — no full sort.
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(lit(_)): _*)
    corpus.select(col(idCol),
      VectorFunctions.cosine(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** All-pairs exact top-k per query row against a (small, broadcastable)
    * query table: crossJoin(broadcast(queries)) + per-query top-k via the
    * engine's TopKPerKey operator — per-partition bounded heaps, so the
    * post-join shuffle carries at most k rows per (query, partition)
    * instead of every scored pair (the window formulation shuffles and
    * sorts ALL corpus×queries rows).
    */
  def topKPerQuery(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      k: Int): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .select(col(qIdCol), col(idCol),
        VectorFunctions.cosine(col(vecCol), col(qVecCol)).as("cosine"))
    graft.plans.TopKPerKey(joined, Seq(col(qIdCol)),
      Seq(col("cosine").desc, col(idCol).asc), k)
  }

  /** Attach a random-hyperplane LSH bucket signature (`numPlanes` bits,
    * seeded → deterministic). Write-once as a corpus column; the ANN query
    * path then equi-joins on it.
    */
  def withLshBucket(corpus: DataFrame, vecCol: String, numPlanes: Int,
      dim: Int, seed: Long = 42L): DataFrame = {
    val planes = VectorFunctions.seededPlanes(numPlanes, dim, seed)
    corpus.withColumn("lsh_bucket",
      VectorFunctions.lshSignature(col(vecCol), planes))
  }

  /** ANN top-k: restrict to the query vector's LSH bucket (plus all buckets
    * within `probeBits` Hamming bits for recall), then exact cosine top-k
    * inside the candidate set.
    *
    * Recall floor: only numPlanes+1 (probeBits=1) of 2^numPlanes buckets are
    * probed, so as numPlanes grows relative to corpus size the candidate set
    * can fall below k. With `ensureK = true` (default) we escalate — widen to
    * 2-bit probes, then fall back to exact [[bruteForceTopK]] — so the caller
    * always gets min(k, corpus) rows.
    *
    * EAGER when `ensureK = true`: escalation is data-dependent, so this path
    * runs Spark jobs at call time and returns the ≤k result rows as a local
    * relation. To keep that bounded, the signature column is computed ONCE
    * into a cached frame; the tier decision is a single aggregation over the
    * cache (not one count per tier), and the cache is released before
    * returning. Callers composing lazy plans — or running at a scale where
    * `lsh_bucket` should be a stored partition/bucket column written by
    * [[withLshBucket]] at ingest — should pass `ensureK = false`, which
    * returns the plan-lazy candidate top-k with no driver-side actions (and
    * no row-count guarantee).
    */
  def annTopK(corpus: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, numPlanes: Int, seed: Long = 42L,
      probeBits: Int = 1, ensureK: Boolean = true): DataFrame = {
    val planes = VectorFunctions.seededPlanes(numPlanes, query.length, seed)
    // query signature computed driver-side with the same IEEE math
    val qSig = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (w, x) => w * x.toDouble }.sum
      if (d >= 0) 1L << i else 0L
    }.reduce(_ | _)
    require(probeBits >= 0 && probeBits <= 2,
      s"probeBits $probeBits unsupported — enumeration implemented for 0..2")
    val oneBit = (0 until numPlanes).map(b => qSig ^ (1L << b))
    val twoBit = for {
      b1 <- 0 until numPlanes; b2 <- (b1 + 1) until numPlanes
    } yield qSig ^ (1L << b1) ^ (1L << b2)
    val narrow: Seq[Long] = probeBits match {
      case 0 => Seq(qSig)
      case 1 => qSig +: oneBit
      case _ => (qSig +: oneBit) ++ twoBit
    }
    val wide: Seq[Long] = (qSig +: oneBit) ++ twoBit
    val bucketed = withLshBucket(corpus, vecCol, numPlanes, query.length, seed)
    val q = array(query.map(lit(_)): _*)
    def topK(cands: DataFrame): DataFrame =
      cands.select(col(idCol),
        VectorFunctions.cosine(col(vecCol), q).as("cosine"))
        .orderBy(col("cosine").desc, col(idCol).asc)
        .limit(k)

    if (!ensureK) return topK(bucketed.filter(col("lsh_bucket").isin(narrow: _*)))

    bucketed.persist()
    try {
      // one job decides the tier: candidate counts for both probe widths
      val row = bucketed.agg(
        sum(when(col("lsh_bucket").isin(narrow: _*), 1L).otherwise(0L)),
        sum(when(col("lsh_bucket").isin(wide: _*), 1L).otherwise(0L))).head()
      def cnt(i: Int) = if (row.isNullAt(i)) 0L else row.getLong(i)
      val chosen =
        if (cnt(0) >= k) topK(bucketed.filter(col("lsh_bucket").isin(narrow: _*)))
        else if (cnt(1) >= k) topK(bucketed.filter(col("lsh_bucket").isin(wide: _*)))
        else topK(bucketed)  // exact over the cached frame — still one scan
      val spark = corpus.sparkSession
      val rows = java.util.Arrays.asList(chosen.collect(): _*)
      spark.createDataFrame(rows, chosen.schema)
    } finally bucketed.unpersist()
  }

  /** IVF-style coarse quantization: assign every vector to the nearest of
    * `centroids` (broadcast literal array of centroid vectors); queries then
    * scan only their cell(s). This is the scale path when LSH recall is not
    * enough: `nprobe` cells bound the candidate set independently of corpus
    * size.
    */
  def withIvfCell(corpus: DataFrame, vecCol: String,
      centroids: Seq[Seq[Double]]): DataFrame = {
    val sims = centroids.zipWithIndex.map { case (c, i) =>
      struct(VectorFunctions.cosine(col(vecCol),
        array(c.map(lit(_)): _*)).as("sim"), lit(i).as("cell"))
    }
    corpus.withColumn("ivf_cell",
      greatest(sims: _*).getField("cell"))
  }

  // ---- product quantization (PQ + ADC search) ---------------------------
  //
  // The third ANN tier (Jégou/Douze/Schmid 2011, "Product Quantization for
  // Nearest Neighbor Search", IEEE TPAMI 33(1)): split each vector into m
  // subspaces, k-means each subspace into k sub-centroids, store every
  // vector as m small codes (m bytes for k ≤ 256 — a 64-dim float vector
  // compresses 256 B → 4 B at m = 4). Search is ADC: one m×k lookup table
  // of exact query→sub-centroid distances, then each candidate costs m
  // table lookups + adds instead of a dims-length scan. At 100 TB this is
  // the tier where the CODES fit in cluster memory when the vectors never
  // could; compose with [[withIvfCell]] for IVF-PQ (coarse cell prune,
  // PQ-coded residual scan). All math runs on the engine's integer
  // quantization grid (floor(x·2^20), [[Cluster.quantizeFloor]]) so fit,
  // codes, and ADC distances are exact integers any engine replays.

  /** Sub-centroid argmin cid with the loud malformed-vector contract:
    * the argmin kernel is [[Cluster.assignStruct]] (ONE definition of the
    * tie-break and distance math engine-wide); a null distance (null
    * vector/element, slice shorter than sd) OR a total length ≠ dims
    * raises instead of coding arbitrarily. The explicit size check
    * matters because slices FORGIVE overlong vectors — a 65-dim vector
    * sliced into 4×16 would silently drop its tail otherwise.
    */
  private def pqCheckedCid(q: Column, s: Int, sd: Int, dims: Int,
      book: Array[Array[Long]]): Column = {
    val a = Cluster.assignStruct(subVec(q, s, sd), book)
    when(a.getField("d").isNull || size(q) =!= lit(dims),
      raise_error(lit(
        "Similarity.pq: malformed embedding (null, null element, or " +
          s"length != $dims dims)")))
      .otherwise(a.getField("cid"))
  }

  /** The 0-based sub-vector of subspace `s` (sd dims each) as a slice of
    * the quantized array — evaluated where it's used; never materialized.
    */
  private def subVec(q: Column, s: Int, sd: Int): Column =
    slice(q, s * sd + 1, sd)

  /** The fused PQ fit loop on an already-quantized, persisted frame:
    * lowest-k-ids init (each init vector contributes ALL its sub-vectors —
    * deterministic total order, same convention as `Cluster.fitOnQuantized`),
    * then `iters − 1` floor(sum/count) updates. ONE aggregate per
    * iteration covers every subspace — m·k·(dims/m + 1) conditional cells
    * = k·(dims + m) driver longs, the same order as a single full-vector
    * k-means iteration — so PQ training never pays m passes over the
    * corpus. Empty sub-cluster keeps its previous sub-centroid.
    */
  private def pqFitOnQuantized(quant: DataFrame, idCol: String, dims: Int,
      m: Int, k: Int, iters: Int): Array[Array[Array[Long]]] = {
    val sd = dims / m
    val initRows = quant.orderBy(col(idCol).asc).limit(k).collect()
    require(initRows.length == k,
      s"need at least $k vectors, got ${initRows.length}")
    val init = initRows.map { r =>
      // brand the error here too: a NULL among the k lowest-id vectors
      // would otherwise surface as a raw driver NPE instead of the
      // malformed-embedding contract every executor-side path raises
      require(!r.isNullAt(1), "Similarity.pq: malformed embedding (null) " +
        "among the k lowest-id init vectors")
      r.getSeq[Long](1).toArray
    }
    require(init.forall(_.length == dims),
      s"init vectors must have $dims dims")
    var books: Array[Array[Array[Long]]] =
      Array.tabulate(m)(s => init.map(_.slice(s * sd, (s + 1) * sd)))
    for (_ <- 1 until iters) {
      val withCids = quant.select(col("q") +: (0 until m).map(s =>
        pqCheckedCid(col("q"), s, sd, dims, books(s)).as(s"__c$s")): _*)
      val aggs = for {
        s <- 0 until m; j <- 0 until k; cell <- -1 until sd
      } yield {
        val hit = col(s"__c$s") === lit(j.toLong)
        if (cell < 0) sum(when(hit, 1L).otherwise(0L)).as(s"n_${s}_$j")
        else sum(when(hit, col("q").getItem(s * sd + cell)))
          .as(s"v_${s}_${j}_$cell")
      }
      val row = withCids.agg(aggs.head, aggs.tail: _*).collect()(0)
      val w = sd + 1 // cells per (s, j): count + sd sums
      books = Array.tabulate(m) { s =>
        Array.tabulate(k) { j =>
          val base = (s * k + j) * w
          val n = row.getLong(base)
          if (n == 0L) books(s)(j) // empty: keep previous
          else Array.tabulate(sd)(d =>
            math.floor(row.getLong(base + 1 + d).toDouble / n).toLong)
        }
      }
    }
    books
  }

  private def collectBooks(codebooks: DataFrame): Array[Array[Array[Long]]] = {
    val rows = codebooks.select(col("sub"), col("cid"), col("q")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray))
    require(rows.nonEmpty, "empty codebook table")
    val m = rows.map(_._1).max.toInt + 1
    val k = rows.map(_._2).max.toInt + 1
    val byKey = rows.map(r => (r._1, r._2) -> r._3).toMap
    // distinct-key check (NOT raw row count, which a duplicate row could
    // balance against a missing one): every (sub, cid) pair exactly once
    require(byKey.size == m * k && rows.length == m * k,
      s"codebooks must be dense over sub 0..${m - 1} × cid 0..${k - 1}, " +
        s"each (sub, cid) exactly once")
    // uniform sub-vector length: the driver-side LUT build (sqLong's zip)
    // would silently TRUNCATE a short centroid to the common prefix —
    // wrong distances with no error — where the encode path raises
    require(rows.forall(_._3.length == rows.head._3.length),
      "codebook sub-centroids must all have the same length")
    Array.tabulate(m)(s => Array.tabulate(k)(j => byKey((s.toLong, j.toLong))))
  }

  /** PQ codebooks as a lake-ready frame: (sub, cid, q) — m·k rows, q of
    * dims/m longs. The fit/encode split is the production shape (mirror of
    * `Cluster.fitCentroids`): fit on a sample, store the codebooks, then
    * [[pqEncode]] any corpus or arrival batch with a map-only scan.
    */
  def pqFitCodebooks(df: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int, k: Int, iters: Int,
      scale: Int = Cluster.QuantScale): DataFrame = {
    require(m > 0 && dims % m == 0, s"m=$m must divide dims=$dims")
    require(k > 0 && iters > 0, s"k and iters must be positive, got $k/$iters")
    val quant = df.select(col(idCol),
      Cluster.quantizeFloor(col(vecCol), scale).as("q")).persist()
    try {
      booksToDf(df.sparkSession,
        pqFitOnQuantized(quant, idCol, dims, m, k, iters))
    } finally quant.unpersist(blocking = false)
  }

  /** The lake shape of a codebook set — ONE definition (shared by
    * [[pqFitCodebooks]] and [[ivfPqIndex]]) so the schema can never
    * desync between the two build paths.
    */
  private def booksToDf(spark: org.apache.spark.sql.SparkSession,
      books: Array[Array[Array[Long]]]): DataFrame = {
    import spark.implicits._
    (for { s <- books.indices; j <- books(s).indices }
      yield (s.toLong, j.toLong, books(s)(j).toSeq))
      .toDF("sub", "cid", "q")
  }

  /** Encode every vector as its m sub-centroid codes: (idCol, codes
    * array<bigint> of length m). Map-only — the codebooks collect to
    * m·k·(dims/m) literals (bounded model read, broadcast-shaped) and each
    * row evaluates m exact-integer argmins; no shuffle, no iteration. The
    * codes column is what a 100 TB deployment stores and scans: dims/m
    * compression per code, exact ADC replay forever after.
    */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, scale: Int = Cluster.QuantScale): DataFrame = {
    val books = collectBooks(codebooks)
    df.select(col(idCol),
      pqCodesExpr(Cluster.quantizeFloor(col(vecCol), scale), books,
        books.length * books(0)(0).length).as("codes"))
  }

  /** The m-code array for an already-quantized vector column against
    * collected codebooks — the shared encode kernel of [[pqEncode]]
    * (grid-quantized floats) and [[ivfPqIndex]] (integer residuals).
    */
  private def pqCodesExpr(q: Column, books: Array[Array[Array[Long]]],
      dims: Int): Column = {
    val sd = books(0)(0).length
    array(books.indices.map(s => pqCheckedCid(q, s, sd, dims, books(s))): _*)
  }

  /** ADC top-n over PQ codes: the query's m×k lookup table of exact
    * integer sub-distances is computed driver-side from the collected
    * codebooks (m·k longs), and each candidate's approximate distance is
    * m array-literal lookups + adds — never a dims-length scan, never a
    * join. orderBy+limit compiles to TakeOrderedAndProject (per-partition
    * n-heaps). `queryQuant` is the query vector on the same quantization
    * grid as the codebooks (e.g. `Cluster.quantizeFloor` of its floats).
    */
  def pqAdcTopK(encoded: DataFrame, idCol: String, codebooks: DataFrame,
      queryQuant: Array[Long], n: Int): DataFrame = {
    val books = collectBooks(codebooks)
    val m = books.length
    val sd = books(0)(0).length
    require(queryQuant.length == m * sd,
      s"query has ${queryQuant.length} dims, codebooks expect ${m * sd}")
    encoded.select(col(idCol),
        adcDistExpr(adcLut(queryQuant, books), col("codes")).as("adc_dist"))
      // nulls LAST (defensive: adcDistExpr raises on every null today;
      // should a future path soften that, a null distance must never
      // occupy a top slot — the batch path's null policy)
      .orderBy(col("adc_dist").asc_nulls_last, col(idCol).asc)
      .limit(n)
  }

  /** Exact integer squared distance between two grid vectors —
    * driver-side mirror of `SqDistToLit`, shared by every PQ/IVF-PQ
    * lookup-table build.
    */
  private def sqLong(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => val d = x - y; d * d }.sum

  /** The query's m×k ADC lookup table against one codebook set. */
  private def adcLut(query: Array[Long],
      books: Array[Array[Array[Long]]]): Array[Array[Long]] = {
    val sd = books(0)(0).length
    Array.tabulate(books.length) { s =>
      val qs = query.slice(s * sd, (s + 1) * sd)
      books(s).map(c => sqLong(qs, c))
    }
  }

  /** The per-candidate ADC distance: m array-literal lookups + adds —
    * ONE definition shared by [[pqAdcTopK]] and [[ivfPqTopK]]. A code
    * outside the codebook range (stale or mismatched codebooks) must
    * FAIL LOUDLY with the engine's own message in EVERY session config:
    * under ANSI (Spark 4's default) a bare `element_at` throws a generic
    * index error, but with ANSI off it returns null — which sorts FIRST
    * ascending and would silently top the result. `try_element_at`
    * normalizes both worlds to null, and the guard raises.
    */
  private def adcDistExpr(lut: Array[Array[Long]], codes: Column): Column = {
    val raw = lut.indices.map { s =>
      try_element_at(array(lut(s).map(lit(_)): _*),
        codes.getItem(s).cast("int") + 1)
    }.reduce(_ + _)
    // negative codes must be guarded EXPLICITLY: try_element_at reads a
    // negative index from the END of the array, so a corrupted code ≤ −2
    // would score against an arbitrary LUT entry without ever going null
    val negative = lut.indices.map(s => codes.getItem(s) < 0)
      .reduce(_ || _)
    when(raw.isNull || negative, raise_error(lit(
      "Similarity.pq: code outside the codebook range (stale or " +
        "mismatched codebooks?)")))
      .otherwise(raw)
  }

  // ---- IVF-PQ: cell-pruned, residual-encoded ADC -------------------------

  /** IVF-PQ index build (Jégou et al. 2011 §IV, IVFADC): coarse-quantize
    * with stored k-means centroids ([[Cluster.fitCentroids]] /
    * [[Cluster.assignStored]] — the engine's exact integer grid), then
    * PQ-encode each vector's RESIDUAL (q − its coarse centroid) so the
    * codebooks model what the coarse quantizer missed. Returns
    * (coarseCentroids (cid, q), codebooks (sub, cid, q), encoded
    * (idCol, cell, codes)) — all three lake-ready. At 100 TB the encoded
    * frame IS the index: partition it by cell and a query reads nprobe
    * partitions of m-byte codes — scan size independent of vector dims
    * and of the unprobed cells.
    */
  def ivfPqIndex(df: DataFrame, idCol: String, vecCol: String, dims: Int,
      coarseK: Int, coarseIters: Int, m: Int, k: Int, iters: Int,
      scale: Int = Cluster.QuantScale): (DataFrame, DataFrame, DataFrame) = {
    require(m > 0 && dims % m == 0, s"m=$m must divide dims=$dims")
    require(coarseK > 0 && coarseIters > 0 && k > 0 && iters > 0,
      s"coarseK/coarseIters/k/iters must be positive, " +
        s"got $coarseK/$coarseIters/$k/$iters")
    val spark = df.sparkSession
    import spark.implicits._
    // ONE quantize pass for the whole build: the coarse fit iterates on
    // this persisted frame and the residual derivation reads it once
    // more — fitCentroids + assignStored would each quantize and scan
    // the corpus again, doubling the dominant cost at the 100 TB target
    val quant = df.select(col(idCol),
      Cluster.quantizeFloor(col(vecCol), scale).as("q")).persist()
    val residuals =
      try {
        val cents = Cluster.fitOnQuantized(quant, idCol, coarseK,
          coarseIters)
        val coarse = cents.zipWithIndex
          .map { case (c, j) => (j.toLong, c.toSeq) }.toSeq.toDF("cid", "q")
        // residual per row via ONE broadcast join with the k-row model —
        // zip_with is an interpreted HOF, but it's one integer subtract
        // per dim per row; the alternative (coarseK chained whens over
        // literal arrays) grows the plan with k for no gain. Persisted:
        // the PQ fit iterates over it and the encode reads it once more.
        val r = quant
          .withColumn("cell", Cluster.assignExpr(col("q"), cents))
          .join(broadcast(coarse.select(col("cid").as("cell"),
            col("q").as("__cq"))), Seq("cell"))
          .select(col(idCol), col("cell"),
            zip_with(col("q"), col("__cq"), (a, b) => a - b).as("q"))
          .persist()
        (coarse, r)
      } catch {
        case e: Throwable => quant.unpersist(blocking = false); throw e
      }
    val (coarse, res) = residuals
    try {
      val books = pqFitOnQuantized(
        res.select(col(idCol), col("q")), idCol, dims, m, k, iters)
      val codebooks = booksToDf(spark, books)
      val encoded = Dedup.materializeAndRelease(
        res.select(col(idCol), col("cell"),
          pqCodesExpr(col("q"), books, dims).as("codes")),
        res, quant)
      (coarse, codebooks, encoded)
    } catch {
      case e: Throwable =>
        res.unpersist(blocking = false)
        quant.unpersist(blocking = false)
        throw e
    }
  }

  /** Encode a batch against a STORED IVF-PQ model — the arrival path of a
    * persistent index ([[graft.flows.AnnIndex]]): `coarseCentroids` and
    * `codebooks` are the lake frames [[ivfPqIndex]] built; the batch is
    * quantized, assigned to its coarse cell, residual-encoded, and
    * PQ-coded in ONE map-only pass (both models collect to bounded driver
    * literals — k·dims + m·k·(dims/m) longs — and the residual join
    * broadcasts the k-row model), so per-batch cost is independent of the
    * stored corpus size. Bit-identical to the codes [[ivfPqIndex]] itself
    * would emit for the same rows against the same model — the append
    * path never refits, so stored and arriving codes share one geometry.
    * Returns (idCol, cell, codes).
    */
  /** Coarse centroids collected + validated for a map-only consumer:
    * contiguous cids 0..coarseK−1, uniform `dims`. ONE definition shared
    * by [[ivfPqEncode]] and [[ivfPqBatchTopKRerank]], so a validation
    * fix can never land in one path and not the other.
    */
  private def collectContiguousCentroids(coarseCentroids: DataFrame,
      dims: Int): Array[Array[Long]] = {
    val rows = coarseCentroids.select(col("cid"), col("q")).collect()
      .sortBy(_.getLong(0))
    require(rows.nonEmpty, "empty coarse centroid table")
    require(rows.zipWithIndex.forall { case (r, j) => r.getLong(0) == j },
      "coarse centroid cids must be contiguous 0..coarseK-1")
    val cents = rows.map(_.getSeq[Long](1).toArray)
    require(cents.forall(_.length == dims),
      s"coarse centroids must have $dims dims")
    cents
  }

  def ivfPqEncode(df: DataFrame, idCol: String, vecCol: String,
      coarseCentroids: DataFrame, codebooks: DataFrame,
      scale: Int = Cluster.QuantScale): DataFrame = {
    val books = collectBooks(codebooks)
    val dims = books.length * books(0)(0).length
    val cents = collectContiguousCentroids(coarseCentroids, dims)
    val spark = df.sparkSession
    import spark.implicits._
    val coarseLit = cents.zipWithIndex.toSeq
      .map { case (c, j) => (j.toLong, c.toSeq) }.toDF("cell", "__cq")
    df.select(col(idCol),
        Cluster.quantizeFloor(col(vecCol), scale).as("q"))
      .withColumn("cell", Cluster.assignExpr(col("q"), cents))
      .join(broadcast(coarseLit), Seq("cell"))
      .select(col(idCol), col("cell"),
        pqCodesExpr(zip_with(col("q"), col("__cq"), (a, b) => a - b),
          books, dims).as("codes"))
  }

  /** IVF-PQ ADC search: rank the coarse centroids by exact distance to the
    * query (coarseK driver-side integer ops), keep `nprobe` cells, and
    * scan ONLY those cells' codes — each probed cell gets its own lookup
    * table built from the query's residual against THAT cell, so the
    * scored distance is exactly ‖(query − cell) − codebook[codes]‖² on the
    * grid. The scan applies as one `isin` filter (partition-prunable when
    * the encoded frame is stored cell-partitioned) + a chained per-cell
    * ADC expression, compiled to TakeOrderedAndProject.
    */
  def ivfPqTopK(encoded: DataFrame, idCol: String, coarseCentroids: DataFrame,
      codebooks: DataFrame, queryQuant: Array[Long], nprobe: Int,
      n: Int): DataFrame = {
    require(nprobe > 0, s"nprobe must be positive, got $nprobe")
    val books = collectBooks(codebooks)
    val m = books.length
    val sd = books(0)(0).length
    require(queryQuant.length == m * sd,
      s"query has ${queryQuant.length} dims, codebooks expect ${m * sd}")
    val rows = coarseCentroids.select(col("cid"), col("q")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    require(rows.nonEmpty, "empty coarse centroid table")
    // duplicate cids (e.g. two model snapshots appended into one table)
    // would silently resolve to an arbitrary row per cid — refuse
    require(rows.map(_._1).distinct.length == rows.length,
      "coarse centroid table has duplicate cids (two model snapshots?)")
    val cents = rows.toMap
    require(cents.values.forall(_.length == m * sd),
      s"coarse centroids must have ${m * sd} dims")
    val probed = cents.toSeq
      .map { case (cid, c) => (sqLong(queryQuant, c), cid) }
      .sorted.take(math.min(nprobe, cents.size)).map(_._2)
    // per probed cell: the query residual's m×k exact lookup table
    val luts: Seq[(Long, Array[Array[Long]])] = probed.map { cell =>
      val res = queryQuant.zip(cents(cell)).map { case (x, c) => x - c }
      cell -> adcLut(res, books)
    }
    val adc = luts.tail.foldLeft(
      when(col("cell") === lit(luts.head._1),
        adcDistExpr(luts.head._2, col("codes")))) {
      case (acc, (cell, lut)) =>
        acc.when(col("cell") === lit(cell), adcDistExpr(lut, col("codes")))
    }
    encoded.filter(col("cell").isin(probed: _*))
      .select(col(idCol), col("cell"), adc.as("adc_dist"))
      // nulls LAST, same rationale as pqAdcTopK: one null policy with
      // the batch path ([[ivfPqBatchTopKRerank]] filters null distances)
      .orderBy(col("adc_dist").asc_nulls_last, col(idCol).asc)
      .limit(n)
  }

  /** IVF-PQ with exact re-ranking (IVFADC-R, Jégou et al. 2011 §V-A):
    * [[ivfPqTopK]] returns ADC-APPROXIMATE distances — fine for recall,
    * but production ANN short-lists the top-`c` ADC candidates and
    * re-ranks them by EXACT distance against the stored quantized
    * vectors, buying back the quantization error for the price of
    * reading c full vectors (c ≪ corpus — the codes already pruned the
    * rest). `quant` is the (idCol, `q` array<bigint>) frame on the same
    * grid as `queryQuant` (the column a deployment stores beside the
    * codes; [[graft.operators.Cluster.quantizeFloor]] builds it).
    *
    * Scale shape: the c-row ADC short-list BROADCASTS into the quant
    * join (the corpus side never shuffles — one scan, hash-probed by c
    * ids), the exact distance is the codegen'd SqDistToLit kernel, and
    * the final top-n compiles to TakeOrderedAndProject. Integer-exact
    * end to end, so the DuckDB oracle replays short-list AND re-rank
    * bit-for-bit (q119c).
    */
  def ivfPqTopKRerank(encoded: DataFrame, quant: DataFrame, idCol: String,
      coarseCentroids: DataFrame, codebooks: DataFrame,
      queryQuant: Array[Long], nprobe: Int, c: Int, n: Int): DataFrame = {
    require(c >= n, s"re-rank short-list c=$c must be >= n=$n")
    val adcTop = ivfPqTopK(encoded, idCol, coarseCentroids, codebooks,
      queryQuant, nprobe, c)
    quant.join(broadcast(adcTop), Seq(idCol))
      .select(col(idCol), col("cell"), col("adc_dist"),
        graft.functions.VectorFunctions.sqDistToLit(col("q"),
          queryQuant.toSeq).as("exact_dist"))
      // ONE null policy with the batch path: a stored quant row whose
      // length mismatches the query grid scores a null exact distance —
      // EXCLUDED from the ranking ([[ivfPqBatchTopKRerank]] filters the
      // same way), never sorted into the top slots (the default ASC
      // NULLS FIRST would hand malformed rows the result head)
      .filter(col("exact_dist").isNotNull)
      .orderBy(col("exact_dist").asc, col(idCol).asc)
      .limit(n)
  }

  /** Table-driven IVFADC-R: ONE job searches a whole QUERY FRAME against
    * the encoded corpus — the arrival-dedup / offline-kNN shape
    * ([[ivfPqTopKRerank]] is the single-vector online form; a driver
    * loop over per-query plans stops scaling the moment "queries" means
    * an arrival batch, not a literal). Per query the semantics are
    * IDENTICAL to the single-vector path — same (distance, cid) probe
    * ranking, same (adc_dist, id) top-`c` short-list, same exact
    * re-ranked top-`n` — so a batch row hash-matches the corresponding
    * single search (q119l's oracle replays each query's chain).
    *
    * Scale shape, stage by stage:
    *  - probe assignment is MAP-ONLY on the query frame (k codegen'd
    *    [[graft.functions.SqDistToLit]] distances per row, array_sort,
    *    slice nprobe) + a broadcast join with the k-row centroid table
    *    for the per-cell query residual;
    *  - the probed-cell UNION (≤ coarseK values, collected from the
    *    query side — one extra small job over `queries`, the cheap side
    *    by definition) lands as an `isin` literal on the corpus scan, so
    *    a stored cell no query probes is never read (PartitionFilters on
    *    a cell-partitioned layout);
    *  - candidates decode ONCE per stored row
    *    ([[graft.functions.PqReconstruct]], codegen'd) BEFORE the pair
    *    join — decode cost is O(corpus scanned), not O(pairs);
    *  - pair scoring is an equi-join on `cell` followed by the codegen'd
    *    [[graft.functions.SqDistCols]] kernel; parallelism is the
    *    number of probed cells (production IVF sizes coarseK ~ √N, so
    *    cells ≫ cores; AQE's skew split handles a hot cell);
    *  - both top-k reductions shuffle SLIM rows only (query id,
    *    candidate id, cell, one distance — the query/residual/
    *    reconstructed arrays never enter an exchange; the full query
    *    vector re-joins from the query frame only for the c-row
    *    short-list).
    *
    * Contracts: `queryIdCol` must be unique and non-null per query row
    * (it keys the per-query windows) — ENFORCED, piggybacked on the
    * probe aggregate, because a duplicate id would silently interleave
    * two queries' candidates in one window. A malformed QUERY vector
    * (wrong dims) scores null against every candidate and yields ZERO
    * rows for that id — visible, never garbage ranks — and is dropped
    * from the probed-cell union so it cannot widen the corpus scan.
    * Corrupt STORED codes (outside the codebook range) RAISE, exactly
    * like the single-query ADC path ([[graft.functions.PqReconstruct]]);
    * a stored row whose codes cell is NULL, or whose quant row length
    * mismatches the query grid, is excluded from rankings by the
    * null-distance filters. Returns (queryIdCol, idCol, cell, adc_dist,
    * exact_dist), `n` rows per query.
    */
  def ivfPqBatchTopKRerank(encoded: DataFrame, quant: DataFrame,
      idCol: String, coarseCentroids: DataFrame, codebooks: DataFrame,
      queries: DataFrame, queryIdCol: String, queryQuantCol: String,
      nprobe: Int, c: Int, n: Int): DataFrame = {
    require(nprobe > 0, s"nprobe must be positive, got $nprobe")
    require(c >= n, s"re-rank short-list c=$c must be >= n=$n")
    val books = collectBooks(codebooks)
    val m = books.length
    val k = books(0).length
    val sd = books(0)(0).length
    val dims = m * sd
    val cents = collectContiguousCentroids(coarseCentroids, dims)
    val spark = encoded.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.Bridge
    val q0 = queries.select(col(queryIdCol), col(queryQuantCol).as("__qq"))
    // probe ranking: same lexicographic (distance, cid) order as the
    // single-query path's driver-side sort, as ONE fused
    // [[graft.functions.NearestCells]] expression per query row — O(1)
    // plan size in coarseK (the k-literal struct array it replaced
    // broke codegen and plan serialization at IVF-practice cell
    // counts); a malformed query yields a NULL cell array — exploded to
    // zero rows HERE, so it cannot smuggle arbitrary cells into the
    // scan-pruning union below
    val probes = q0
      .select(col(queryIdCol), col("__qq"),
        explode(VectorFunctions.nearestCells(col("__qq"), cents, nprobe))
          .as("cell"))
      .join(broadcast(cents.zipWithIndex.toSeq
        .map { case (ct, j) => (j.toLong, ct.toSeq) }.toDF("cell", "__cq")),
        Seq("cell"))
      .select(col(queryIdCol), col("cell"),
        zip_with(col("__qq"), col("__cq"), (a, b) => a - b).as("__qres"))
    // ONE small job over the query frame answers two questions: the
    // probed-cell union (bounded by coarseK — buys corpus-scan pruning)
    // and the uniqueness contract on queryIdCol (each well-formed query
    // contributes exactly min(nprobe, coarseK) probe rows, so a
    // duplicate id is visible as row count > distinct ids × that) —
    // without it, duplicate ids would silently interleave two queries'
    // candidates in one window and return garbage ranks
    val probeAgg = probes.agg(collect_set(col("cell")),
      count(lit(1)), count_distinct(col(queryIdCol))).head()
    val probedCells = probeAgg.getSeq[Long](0)
    require(probeAgg.getLong(1) ==
      probeAgg.getLong(2) * math.min(nprobe, cents.length),
      s"queryIdCol '$queryIdCol' must be unique (and non-null) per " +
        s"query row — ${probeAgg.getLong(1)} probe rows from " +
        s"${probeAgg.getLong(2)} distinct ids")
    val recon = Bridge.column(graft.functions.PqReconstruct(
      Bridge.expression(col("codes")),
      books.flatMap(_.flatMap(_.toSeq)).toSeq, m, k, sd))
    val cand = encoded.filter(col("cell").isin(probedCells: _*))
      .select(col(idCol), col("cell"), recon.as("__recon"))
    val scored = probes.join(cand, Seq("cell"))
      .select(col(queryIdCol), col(idCol), col("cell"),
        VectorFunctions.sqDistQ(col("__qres"), col("__recon"))
          .as("adc_dist"))
      .filter(col("adc_dist").isNotNull)
    val wAdc = Window.partitionBy(col(queryIdCol))
      .orderBy(col("adc_dist").asc, col(idCol).asc)
    val short = scored.withColumn("__rn", row_number().over(wAdc))
      .filter(col("__rn") <= c).drop("__rn")
    val rr = short
      .join(q0, Seq(queryIdCol))
      .join(quant.select(col(idCol), col("q").as("__candq")), Seq(idCol))
      .select(col(queryIdCol), col(idCol), col("cell"), col("adc_dist"),
        VectorFunctions.sqDistQ(col("__qq"), col("__candq"))
          .as("exact_dist"))
      .filter(col("exact_dist").isNotNull)
    val wEx = Window.partitionBy(col(queryIdCol))
      .orderBy(col("exact_dist").asc, col(idCol).asc)
    rr.withColumn("__rn", row_number().over(wEx))
      .filter(col("__rn") <= n).drop("__rn")
  }

  /** Recall@k of an ANN result against the exact top-k — THE number an
    * ANN deployment tunes `nprobe`/`c` by ("measure, don't guess": a
    * probe setting is not "good enough" until its recall says so).
    * Both inputs are id-carrying top-k frames in their own rank order;
    * returns ONE row (k, hits, recall) where hits = |approx ∩ exact|
    * and recall = hits / k. Each side is re-limited to k IN-PLAN (no
    * extra job), so an over-long input can never manufacture recall >
    * 1.0 — only its first k rows (its own ranking) are measured. The
    * join is k×k — driver-trivial at any corpus scale, because both
    * sides were already reduced by their top-k plans. Integer-exact
    * inputs make the whole measurement oracle-replayable (q119d).
    */
  def annRecallAtK(approx: DataFrame, exact: DataFrame, idCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    approx.limit(k).select(col(idCol))
      .join(exact.limit(k).select(col(idCol)), Seq(idCol))
      .agg(count(lit(1)).as("hits"))
      .select(lit(k.toLong).as("k"), col("hits"),
        (col("hits").cast("double") / lit(k.toDouble)).as("recall"))
  }

  /** Mean recall@k over a QUERY SET — [[annRecallAtK]] grouped by
    * `queryCol`: the number a deployment actually tunes `nprobe`/`c` by
    * (one query's recall is an anecdote; the mean over hundreds is the
    * dial). Both inputs carry (queryCol, idCol) rows — per query, its
    * own top-k ids in its own ranking (each side is already ≤ k
    * rows/query by construction of the per-query top-k plans, so the
    * join is |queries|·k² at worst — driver-trivial at any corpus
    * scale). Returns one row per query in `exact` — (queryCol, k, hits,
    * recall), a query with no approx overlap scoring 0 via the left
    * join — plus ONE summary row (queryCol NULL, k, total hits, MEAN of
    * per-query recalls). `hits` clamps at k in-plan, so an over-long or
    * duplicated input can never manufacture recall > 1 — same guard
    * discipline as the single-query form. Integer-exact inputs make the
    * whole measurement oracle-replayable (q119f).
    */
  def meanRecallAtK(approx: DataFrame, exact: DataFrame, idCol: String,
      queryCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val hitsPerQ = approx.select(col(queryCol), col(idCol)).distinct()
      .join(exact.select(col(queryCol), col(idCol)).distinct(),
        Seq(queryCol, idCol))
      .groupBy(col(queryCol)).agg(count(lit(1)).as("__h"))
    val per = exact.select(col(queryCol)).distinct()
      .join(hitsPerQ, Seq(queryCol), "left")
      .select(col(queryCol), lit(k.toLong).as("k"),
        least(coalesce(col("__h"), lit(0L)), lit(k.toLong)).as("hits"))
      .withColumn("recall", col("hits").cast("double") / lit(k.toDouble))
    val mean = per.agg(sum(col("hits")).as("hits"),
        avg(col("recall")).as("recall"))
      .select(lit(null).cast(per.schema(queryCol).dataType).as(queryCol),
        lit(k.toLong).as("k"), col("hits"), col("recall"))
      // an EMPTY query set must return zero rows, not one all-NULL
      // summary row (an aggregate over an empty frame still emits a row
      // with NULL sum/avg — a caller reading the NULL-key row as "the
      // dial" would silently propagate NULL recall downstream)
      .filter(col("hits").isNotNull)
    per.unionByName(mean)
  }
}
