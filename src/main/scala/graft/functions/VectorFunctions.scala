package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns, expressed with
  * higher-order functions (`zip_with`/`aggregate`/`transform`) so the whole
  * similarity computation stays columnar — no UDF, no row-object
  * materialization per comparison. For a 100 TB ANN sweep the LSH-bucketed
  * path (`Similarity.lshBuckets`) bounds the candidate set; these kernels
  * are the inner loop.
  */
object VectorFunctions {

  /** Dot product of two equal-length vectors, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Euclidean norm, accumulated in double. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity in double precision; null/zero-norm safe (0.0).
    * Backed by the codegen'd [[CosineSimilarity]] expression (identical
    * numerics to the HOF composition — see [[VectorKernels.cosine]]); the
    * HOF [[dot]]/[[norm]] remain for callers composing custom formulas.
    */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
  }

  /** Quantize a float vector to `array<bigint>` of round(x * scale).
    * Integer-exact across engines — this is the cross-engine-reproducible
    * form used when a result must hash-match an external oracle (float
    * summation order is not associative; integer summation is).
    */
  def quantize(a: Column, scale: Int): Column =
    transform(a, x => round(x.cast("double") * scale).cast("long"))

  /** Dot product over quantized vectors — exact integer math. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Cosine over quantized vectors: integer dot / sqrt(int)·sqrt(int).
    * Deterministic bit-for-bit on any IEEE-754 engine given the same ints.
    */
  def cosineQ(a: Column, b: Column, scale: Int): Column = {
    val qa = quantize(a, scale)
    val qb = quantize(b, scale)
    val d = dotQ(qa, qb).cast("double")
    val nn = sqrt(dotQ(qa, qa).cast("double")) * sqrt(dotQ(qb, qb).cast("double"))
    when(nn > 0, d / nn).otherwise(lit(0.0))
  }

  /** Cosine over two ALREADY-QUANTIZED long vectors — fused codegen'd
    * dot+norms loop ([[CosineLongQuantized]]); numerics identical to the
    * HOF `dotQ/sqrt·sqrt` composition. The SemDeDup pair-filter kernel.
    */
  def cosineOfQuantized(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(CosineLongQuantized(Bridge.expression(a), Bridge.expression(b)))
  }

  /** Exact integer squared L2 distance to a literal centroid
    * ([[SqDistToLit]], codegen'd) — the k-means assignment inner loop.
    */
  def sqDistToLit(v: Column, cent: Seq[Long]): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(SqDistToLit(Bridge.expression(v), cent))
  }

  /** Argmin cell of a quantized vector against a centroid MATRIX as
    * struct(d, cid) ([[NearestCentroid]], codegen'd): one expression
    * node whatever the centroid count — the k-means/IVF assignment
    * kernel that survives IVF-practice coarseK (a k-literal
    * least-of-structs chain breaks codegen and plan size at ~√N cells).
    */
  def nearestCentroid(v: Column, centroids: Array[Array[Long]]): Column = {
    require(centroids.nonEmpty &&
      centroids.forall(_.length == centroids(0).length),
      "centroid matrix must be non-empty with uniform dims")
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(NearestCentroid(Bridge.expression(v),
      centroids.flatten.toSeq, centroids.length, centroids(0).length))
  }

  /** The min(nprobe, k) nearest centroid ids in (distance, cid) rank
    * order as array<bigint> ([[NearestCells]], codegen'd) — the IVF
    * probe ranking with O(1) plan size in coarseK; a malformed vector
    * yields null (exploded: zero probe rows).
    */
  def nearestCells(v: Column, centroids: Array[Array[Long]],
      nprobe: Int): Column = {
    require(centroids.nonEmpty &&
      centroids.forall(_.length == centroids(0).length),
      "centroid matrix must be non-empty with uniform dims")
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(NearestCells(Bridge.expression(v),
      centroids.flatten.toSeq, centroids.length, centroids(0).length,
      nprobe))
  }

  /** Exact integer squared L2 distance between two quantized vector
    * COLUMNS ([[SqDistCols]], codegen'd) — the batch-ANN pair kernel,
    * where neither side is a plan-time literal.
    */
  def sqDistQ(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(SqDistCols(Bridge.expression(a), Bridge.expression(b)))
  }

  /** floor(x·scale) per element as array<bigint> ([[QuantizeFloorLong]],
    * codegen'd) — the tie-free engine-portable quantizer.
    */
  def quantizeFloor(a: Column, scale: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(QuantizeFloorLong(Bridge.expression(a), scale))
  }

  /** Sign bit of the dot product against a fixed hyperplane given as a
    * literal Seq — one bit of a random-hyperplane LSH signature.
    */
  def hyperplaneBit(v: Column, plane: Seq[Double]): Column = {
    val planeCol = array(plane.map(lit(_)): _*)
    when(dot(v, planeCol) >= 0, lit(1L)).otherwise(lit(0L))
  }

  /** Random-hyperplane LSH signature packed into a long: `planes` is a
    * deterministic (seeded) list of hyperplanes, bit i = sign(v·plane_i).
    * Vectors with equal signatures are cosine-close with high probability.
    * One fused codegen'd loop ([[LshSignature]]) — numPlanes × dim
    * multiply-adds per row, no per-bit array allocation.
    */
  def lshSignature(v: Column, planes: Seq[Seq[Double]]): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(LshSignature(Bridge.expression(v), planes))
  }

  /** xxhash64 (seed 42) of every element of a string array — the
    * shingle-hashing kernel ([[ArrayXxHash64]], codegen'd single pass;
    * values identical to `transform(arr, s => xxhash64(s))`).
    */
  def stringArrayHashes(arr: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(ArrayXxHash64(Bridge.expression(arr)))
  }

  /** Portable 60-bit md5 prefix of every string element ([[ArrayMd5H60]],
    * codegen'd; value-identical to `conv(substring(md5(s),1,15),16,10)` per
    * element) — the cross-engine-replayable sibling of
    * [[stringArrayHashes]].
    */
  def stringArrayMd5H60(arr: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(ArrayMd5H60(Bridge.expression(arr)))
  }

  /** SimHash signature from a pre-hashed token array in one fused per-row
    * vote loop ([[SimHashFromHashes]]) — no explode, no aggregation, no
    * shuffle.
    */
  def simHashFromHashes(hashes: Column, bits: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(SimHashFromHashes(Bridge.expression(hashes), bits))
  }

  /** Deterministic pseudo-random hyperplanes (fixed seed → reproducible
    * plans and signatures across runs and engines).
    */
  def seededPlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }
}
