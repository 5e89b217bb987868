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
}
