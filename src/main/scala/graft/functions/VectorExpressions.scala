package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd kernels for the vector/hash hot paths.
  *
  * WHY NOT higher-order functions: `zip_with`/`aggregate`/`transform` are
  * CodegenFallback — every element evaluation goes through interpreted
  * `Expression.eval` with per-element boxing and virtual dispatch. Besides
  * the steady-state cost, the interpreted tree is hostile to the JIT: under
  * a long-lived session the shared eval call sites go megamorphic and can
  * deoptimize to raw-bytecode-interpreter speed (observed in this repo's
  * bench as nondeterministic 100× stalls — a 1 s cosine sweep taking 150 s
  * inside `ZipWith.eval`/`ArrayAggregate.eval`). A real `Expression` with
  * `doGenCode` emits a tight primitive loop inside whole-stage codegen:
  * no allocation per element, no dispatch, JIT-stable — the kernel a
  * 100 TB ANN/dedup sweep actually needs.
  *
  * All kernels preserve the exact IEEE semantics (accumulation order,
  * float→double widening, null behavior) of the HOF compositions they
  * replace, so results — and the DuckDB oracle hashes — are unchanged.
  */
object VectorKernels {

  /** Cosine in double precision, left-to-right accumulation.
    * Parity with `when(norm(a)*norm(b) > 0, dot/(norm*norm)).otherwise(0.0)`
    * over HOF dot/norm: any null element → 0.0; length mismatch → null
    * (boxed null); zero norm → 0.0.
    */
  def cosine(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): java.lang.Double = {
    val la = a.numElements(); val lb = b.numElements()
    var i = 0
    while (i < la) { if (a.isNullAt(i)) return java.lang.Double.valueOf(0.0); i += 1 }
    i = 0
    while (i < lb) { if (b.isNullAt(i)) return java.lang.Double.valueOf(0.0); i += 1 }
    if (la != lb) return null
    var d = 0.0; var na = 0.0; var nb = 0.0
    i = 0
    while (i < la) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    val nn = math.sqrt(na) * math.sqrt(nb)
    java.lang.Double.valueOf(if (nn > 0) d / nn else 0.0)
  }

  /** Packed random-hyperplane signature. Parity with the HOF form (bit i =
    * `when(dot(v, plane_i) >= 0, 1L << i)`, OR-reduced): a null vector, any
    * null element, or a length mismatch yields dot=null → bit 0, hence
    * signature 0.
    */
  def lshSignature(v: ArrayData, flatPlanes: Array[Double], numPlanes: Int,
      dim: Int, vF: Boolean): Long = {
    if (v == null || v.numElements() != dim) return 0L
    var i = 0
    while (i < dim) { if (v.isNullAt(i)) return 0L; i += 1 }
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      var d = 0.0
      var j = 0
      val off = p * dim
      while (j < dim) {
        val x = if (vF) v.getFloat(j).toDouble else v.getDouble(j)
        d += x * flatPlanes(off + j)
        j += 1
      }
      if (d >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  /** MinHash signature from pre-hashed shingles. Parity with
    * `array((0 until k).map(i => array_min(transform(h, x => xxhash64(x, lit(i))))))`:
    * family-i remix of hash x = XXH64.hashInt(i, XXH64.hashLong(x, 42L))
    * (xxhash64's child fold with default seed 42); null input array or empty
    * array → k null entries; a null element remixes as hashInt(i, 42L)
    * (xxhash64 skips null children, leaving the seed).
    */
  def minHash(h: ArrayData, k: Int): ArrayData = {
    val out = new Array[Any](k)
    if (h == null || h.numElements() == 0) return new GenericArrayData(out)
    val n = h.numElements()
    var i = 0
    while (i < k) {
      var min = Long.MaxValue
      var j = 0
      while (j < n) {
        val base = if (h.isNullAt(j)) 42L else XXH64.hashLong(h.getLong(j), 42L)
        val r = XXH64.hashInt(i, base)
        if (r < min) min = r
        j += 1
      }
      out(i) = min
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-element xxhash64 (seed 42) of a string array. Parity with
    * `transform(arr, s => xxhash64(s))`: null element hashes to the seed.
    */
  def arrayHash64(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Portable 60-bit md5 hash of every string element: first 60 bits of the
    * digest as a non-negative long — value-identical to
    * `conv(substring(md5(s),1,15),16,10)` (15 hex chars = first 7.5 bytes =
    * big-endian first-8-bytes >>> 4). One MessageDigest per CALL, reused
    * across elements. Null element → null hash.
    */
  def arrayMd5H60(arr: ArrayData): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val d = md.digest(arr.getUTF8String(i).getBytes)
        var h = 0L
        var j = 0
        while (j < 8) { h = (h << 8) | (d(j) & 0xFFL); j += 1 }
        out(i) = h >>> 4
      }
      md.reset()
      i += 1
    }
    new GenericArrayData(out)
  }

  /** SimHash from pre-hashed tokens: per bit b in [0, bits), sum ±1 votes of
    * (h >> b) & 1 across the array, then set bit b iff the sum is positive.
    * Parity with the explode + per-bit conditional-sum aggregation shape
    * (null hash votes −1 on every bit, exactly like `when(bit===1,1)
    * .otherwise(-1)` under a null hash); empty array → 0 signature — callers
    * drop empty docs to match the explode path, where they vanish.
    */
  def simHashFromHashes(h: ArrayData, bits: Int): Long = {
    if (h == null) return 0L
    val n = h.numElements()
    val votes = new Array[Int](bits)
    var j = 0
    while (j < n) {
      val hv = if (h.isNullAt(j)) 0L else h.getLong(j)
      var b = 0
      while (b < bits) {
        if (((hv >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  private[functions] def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private[functions] def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  private[functions] def isFractionalArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Cosine over two QUANTIZED (long) vectors in one fused loop: exact
    * integer dot/norms (all < 2^53), then the same
    * `dot / (sqrt(na) · sqrt(nb))` double formula as the HOF composition in
    * the SemDeDup pair filter — bit-identical results. Null element or
    * length mismatch → null (the HOF aggregate-over-zip_with result);
    * zero norm → 0.0.
    */
  def cosineLong(a: ArrayData, b: ArrayData): java.lang.Double = {
    val la = a.numElements(); val lb = b.numElements()
    if (la != lb) return null
    var i = 0
    while (i < la) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      i += 1
    }
    var d = 0L; var na = 0L; var nb = 0L
    i = 0
    while (i < la) {
      val x = a.getLong(i); val y = b.getLong(i)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    val nn = math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)
    java.lang.Double.valueOf(if (nn > 0) d.toDouble / nn else 0.0)
  }

  /** Exact integer squared L2 distance from a quantized vector to a literal
    * centroid — the k-means assignment inner loop. Null element or length
    * mismatch → null (parity with `aggregate(zip_with((x−y)²))`).
    */
  def sqDistLong(v: ArrayData, cent: Array[Long]): java.lang.Long = {
    val n = cent.length
    if (v.numElements() != n) return null
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return null; i += 1 }
    var s = 0L
    i = 0
    while (i < n) {
      val dx = v.getLong(i) - cent(i)
      s += dx * dx
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  /** Column-column analog of [[sqDistLong]] for table-driven (batch) ANN
    * scoring, where neither vector is a plan-time literal. Length
    * mismatch or any null element → null.
    */
  def sqDistLongCols(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var i = 0
    while (i < n) { if (a.isNullAt(i) || b.isNullAt(i)) return null; i += 1 }
    var s = 0L
    i = 0
    while (i < n) {
      val dx = a.getLong(i) - b.getLong(i)
      s += dx * dx
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  /** Nearest centroid of a quantized vector against a flat centroid
    * matrix (`flat(j·dims + i)`) — the k-means/IVF argmin as ONE fused
    * loop, O(1) plan size in k. The k-literal alternative (k chained
    * [[sqDistLong]] expressions under a struct-`least`) grows the PLAN
    * with k: at IVF-practice coarseK (~√N ⇒ 10⁴–10⁶ cells at 100 TB) it
    * blows past Janino's 64 KB method limit (silent interpreted
    * fallback) and the task-serialization budget. Returns
    * (d, cid) with the exact integer squared distance and the
    * lowest-cid tie-break (strict `<` over ascending j); a malformed
    * vector — length ≠ dims or any null element — returns null, which
    * callers convert to the branded raise (`Cluster.checkedField`).
    */
  def nearestCentroid(v: ArrayData, flat: Array[Long], k: Int,
      dims: Int): InternalRow = {
    if (v.numElements() != dims) return null
    var i = 0
    while (i < dims) { if (v.isNullAt(i)) return null; i += 1 }
    val vs = new Array[Long](dims)
    i = 0
    while (i < dims) { vs(i) = v.getLong(i); i += 1 }
    var bestD = Long.MaxValue
    var bestJ = 0
    var j = 0
    while (j < k) {
      val off = j * dims
      var s = 0L
      var d = 0
      while (d < dims) {
        val dx = vs(d) - flat(off + d)
        s += dx * dx
        d += 1
      }
      if (s < bestD) { bestD = s; bestJ = j }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD, bestJ.toLong))
  }

  /** The `min(nprobe, k)` nearest centroid ids in (distance, cid)
    * lexicographic rank order — the IVF probe ranking as one fused loop
    * (the batch-search analog of [[nearestCentroid]], same O(1)-plan-
    * size rationale). Bounded insertion keeps the running top list (
    * nprobe is small; k can be √N-large), ascending-j iteration with a
    * strictly-greater displacement test preserves the lowest-cid
    * tie-break. Malformed vector → null (callers explode the array, so
    * a malformed query contributes zero probe rows — visible, never
    * arbitrary cells smuggled into the scan-pruning union).
    */
  def nearestCells(v: ArrayData, flat: Array[Long], k: Int, dims: Int,
      nprobe: Int): ArrayData = {
    if (v.numElements() != dims) return null
    var i = 0
    while (i < dims) { if (v.isNullAt(i)) return null; i += 1 }
    val vs = new Array[Long](dims)
    i = 0
    while (i < dims) { vs(i) = v.getLong(i); i += 1 }
    val n = math.min(nprobe, k)
    val topD = new Array[Long](n)
    val topC = new Array[Long](n)
    var filled = 0
    var j = 0
    while (j < k) {
      val off = j * dims
      var s = 0L
      var d = 0
      while (d < dims) {
        val dx = vs(d) - flat(off + d)
        s += dx * dx
        d += 1
      }
      // insert position: after every kept entry with d ≤ s (equal-d
      // entries have lower cid — j ascends), before the first with d > s
      if (filled < n || s < topD(filled - 1)) {
        var pos = if (filled < n) filled else filled - 1
        while (pos > 0 && topD(pos - 1) > s) {
          topD(pos) = topD(pos - 1); topC(pos) = topC(pos - 1); pos -= 1
        }
        topD(pos) = s
        topC(pos) = j.toLong
        if (filled < n) filled += 1
      }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(topC, filled))
  }

  /** Decode PQ codes to the codebook-reconstructed residual vector —
    * concat of codebook[s][code_s] as one primitive loop over the flat
    * codebook array (layout `[(s·k + cid)·sd + j]`). The per-CANDIDATE
    * half of batch ADC scoring: computed once per stored row, however
    * many queries probe its cell. Miscounted/null-element codes or a
    * code outside [0, k) RAISE with the same branded message as the
    * single-query ADC path (`adcDistExpr`): stored-side corruption —
    * stale or foreign codebooks against this code table — must fail
    * loudly, never be silently dropped or decoded to garbage distances.
    */
  def pqReconstruct(codes: ArrayData, flatBooks: Array[Long], m: Int,
      k: Int, sd: Int): ArrayData = {
    if (codes == null) return null
    def corrupt(): Nothing = throw new IllegalStateException(
      "Similarity.pq: code outside the codebook range (stale or " +
        "mismatched codebooks?)")
    if (codes.numElements() != m) corrupt()
    var s = 0
    while (s < m) { if (codes.isNullAt(s)) corrupt(); s += 1 }
    val out = new Array[Long](m * sd)
    s = 0
    while (s < m) {
      val c = codes.getLong(s)
      if (c < 0 || c >= k) corrupt()
      val off = (s * k + c.toInt) * sd
      var j = 0
      while (j < sd) { out(s * sd + j) = flatBooks(off + j); j += 1 }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** `floor(x · scale)` per element — the tie-free portable quantizer as
    * one primitive loop (the `transform` HOF it replaces is interpreted).
    * Null elements stay null.
    */
  def quantizeFloorLong(v: ArrayData, scale: Int, vF: Boolean): ArrayData = {
    val n = v.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val x = if (vF) v.getFloat(i).toDouble else v.getDouble(i)
        out(i) = math.floor(x * scale).toLong
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `cosine_sim(a, b)` — exact cosine over two numeric arrays (float or
  * double elements), codegen'd. Null input → 0.0 (matching the HOF
  * composition it replaces), length mismatch → null.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  private lazy val lf = VectorKernels.isFloatArray(left)
  private lazy val rf = VectorKernels.isFloatArray(right)

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) 0.0
    else {
      val r = VectorKernels.cosine(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lf, rf)
      if (r == null) null else r.doubleValue()
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGen = left.genCode(ctx)
    val bGen = right.genCode(ctx)
    val boxed = ctx.freshName("cosRes")
    ev.copy(code = code"""
      ${aGen.code}
      ${bGen.code}
      boolean ${ev.isNull} = false;
      double ${ev.value} = 0.0;
      if (!${aGen.isNull} && !${bGen.isNull}) {
        java.lang.Double $boxed = graft.functions.VectorKernels.cosine(
          ${aGen.value}, ${bGen.value}, $lf, $rf);
        if ($boxed == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $boxed.doubleValue(); }
      }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarity = copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_sim"
}

/** `lsh_signature(v)` — numPlanes-bit random-hyperplane signature packed in
  * a long; planes are plan-time constants (seeded), so the whole signature
  * is one fused primitive loop per row.
  */
case class LshSignature(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  @transient private lazy val flat: Array[Double] = planes.flatten.toArray
  private def numPlanes: Int = planes.size
  private def dim: Int = planes.head.size
  private lazy val vf = VectorKernels.isFloatArray(child)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    VectorKernels.lshSignature(
      v.asInstanceOf[ArrayData], flat, numPlanes, dim, vf)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vGen = child.genCode(ctx)
    val planesRef = ctx.addReferenceObj("flatPlanes", flat, "double[]")
    ev.copy(code = code"""
      ${vGen.code}
      boolean ${ev.isNull} = false;
      long ${ev.value} = graft.functions.VectorKernels.lshSignature(
        ${vGen.isNull} ? null : ${vGen.value}, $planesRef, $numPlanes, $dim, $vf);""")
  }

  override protected def withNewChildInternal(newChild: Expression): LshSignature =
    copy(child = newChild)
  override def prettyName: String = "lsh_signature"
}

/** `minhash(hashes, k)` — k-family MinHash signature from pre-hashed
  * shingles, one fused loop (k × n integer hashes, no per-family array).
  */
case class MinHashFromHashes(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val h = child.eval(input)
    VectorKernels.minHash(h.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${hGen.code}
      boolean ${ev.isNull} = false;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.VectorKernels.minHash(
          ${hGen.isNull} ? null : ${hGen.value}, $k);""")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashFromHashes =
    copy(child = newChild)
  override def prettyName: String = "minhash"
}

/** `array_md5h60(arr)` — portable 60-bit md5 prefix of every string element
  * (see [[VectorKernels.arrayMd5H60]]); the hash any md5-capable engine
  * replays, feeding the portable SimHash/MinHash paths.
  */
case class ArrayMd5H60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullSafeEval(input: Any): Any =
    VectorKernels.arrayMd5H60(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorKernels.arrayMd5H60($c)")

  override protected def withNewChildInternal(newChild: Expression): ArrayMd5H60 =
    copy(child = newChild)
  override def prettyName: String = "array_md5h60"
}

/** `simhash(hashes, bits)` — SimHash signature from pre-hashed tokens in one
  * fused vote loop per row: replaces the explode + bits-wide conditional-sum
  * aggregation (and its shuffle) with a narrow per-row computation.
  */
case class SimHashFromHashes(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val h = child.eval(input)
    VectorKernels.simHashFromHashes(h.asInstanceOf[ArrayData], bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${hGen.code}
      boolean ${ev.isNull} = false;
      long ${ev.value} = graft.functions.VectorKernels.simHashFromHashes(
        ${hGen.isNull} ? null : ${hGen.value}, $bits);""")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashFromHashes =
    copy(child = newChild)
  override def prettyName: String = "simhash"
}

/** `array_xxhash64(arr)` — xxhash64 (seed 42) of every string element. */
case class ArrayXxHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    VectorKernels.arrayHash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorKernels.arrayHash64($c)")

  override protected def withNewChildInternal(newChild: Expression): ArrayXxHash64 =
    copy(child = newChild)
  override def prettyName: String = "array_xxhash64"
}

/** `cosine_q(a, b)` — cosine over two quantized long vectors, fused
  * dot+norms loop. Null array, null element, or length mismatch → null.
  */
case class CosineLongQuantized(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  // Quantized-only: on a raw float/double embedding ArrayData.getLong would
  // reinterpret the IEEE bits and return a garbage cosine; fail at analysis.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (VectorKernels.isLongArray(left) && VectorKernels.isLongArray(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<bigint> quantized vectors " +
        s"(use quantize_floor first), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosineLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGen = left.genCode(ctx)
    val bGen = right.genCode(ctx)
    val boxed = ctx.freshName("cosQ")
    ev.copy(code = code"""
      ${aGen.code}
      ${bGen.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${aGen.isNull} && !${bGen.isNull}) {
        java.lang.Double $boxed = graft.functions.VectorKernels.cosineLong(
          ${aGen.value}, ${bGen.value});
        if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
      }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineLongQuantized = copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_q"
}

/** `sq_dist_lit(v)` — exact integer squared L2 distance to a plan-time
  * literal centroid (k-means assignment inner loop: k of these per row,
  * each a tight primitive loop over the shared quantized array).
  */
case class SqDistToLit(child: Expression, cent: Seq[Long]) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  @transient private lazy val flat: Array[Long] = cent.toArray

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (VectorKernels.isLongArray(child))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<bigint> quantized vector " +
        s"(use quantize_floor first), got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    VectorKernels.sqDistLong(v.asInstanceOf[ArrayData], flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vGen = child.genCode(ctx)
    val centRef = ctx.addReferenceObj("cent", flat, "long[]")
    val boxed = ctx.freshName("sqd")
    ev.copy(code = code"""
      ${vGen.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${vGen.isNull}) {
        java.lang.Long $boxed = graft.functions.VectorKernels.sqDistLong(
          ${vGen.value}, $centRef);
        if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.longValue(); }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): SqDistToLit =
    copy(child = newChild)
  override def prettyName: String = "sq_dist_lit"
}

/** `sq_dist(a, b)` — exact integer squared L2 distance between two
  * quantized vector COLUMNS. The batch-ANN pair kernel: unlike
  * [[SqDistToLit]] neither side is a plan-time literal, so one codegen'd
  * primitive loop scores a (query-residual, reconstructed-candidate)
  * pair inside whole-stage codegen.
  */
case class SqDistCols(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (VectorKernels.isLongArray(left) && VectorKernels.isLongArray(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<bigint> quantized vectors " +
        s"(use quantize_floor first), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.sqDistLongCols(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGen = left.genCode(ctx)
    val bGen = right.genCode(ctx)
    val boxed = ctx.freshName("sqdc")
    ev.copy(code = code"""
      ${aGen.code}
      ${bGen.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${aGen.isNull} && !${bGen.isNull}) {
        java.lang.Long $boxed = graft.functions.VectorKernels.sqDistLongCols(
          ${aGen.value}, ${bGen.value});
        if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.longValue(); }
      }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SqDistCols = copy(left = newLeft, right = newRight)
  override def prettyName: String = "sq_dist"
}

/** `pq_reconstruct(codes)` — decode a row's m PQ codes to the
  * codebook-reconstructed residual vector, one primitive loop over a
  * plan-referenced flat codebook (m·k·sd longs — model-sized, shipped
  * once per task like any referenced literal). Computed per CANDIDATE
  * row BEFORE the batch probe join, so decode cost is O(corpus scanned),
  * not O(query × candidate pairs). Corrupt codes raise (see the kernel).
  * The codebook is held as a Seq so case-class equality is by VALUE
  * (an Array field compares by reference and would defeat Catalyst
  * common-subexpression/exchange reuse — [[SqDistToLit]] makes the same
  * choice); the eval/codegen path reads the flattened array.
  */
case class PqReconstruct(child: Expression, books: Seq[Long],
    m: Int, k: Int, sd: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  @transient private lazy val flatBooks: Array[Long] = books.toArray

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (VectorKernels.isLongArray(child))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<bigint> code vector, got " +
        s"${child.dataType.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    VectorKernels.pqReconstruct(v.asInstanceOf[ArrayData], flatBooks, m, k, sd)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vGen = child.genCode(ctx)
    val booksRef = ctx.addReferenceObj("flatBooks", flatBooks, "long[]")
    val out = ctx.freshName("recon")
    ev.copy(code = code"""
      ${vGen.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${vGen.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $out =
          graft.functions.VectorKernels.pqReconstruct(
            ${vGen.value}, $booksRef, $m, $k, $sd);
        if ($out != null) { ${ev.isNull} = false; ${ev.value} = $out; }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): PqReconstruct =
    copy(child = newChild)
  override def prettyName: String = "pq_reconstruct"
}

/** `nearest_centroid(v)` — argmin cell of a quantized vector against a
  * plan-referenced flat centroid matrix, as struct(d, cid)
  * ([[VectorKernels.nearestCentroid]]). ONE expression node whatever the
  * centroid count — the scale-safe form of the k-literal
  * `least(struct(sq_dist_lit…))` chain, which breaks whole-stage codegen
  * (Janino 64 KB) and plan serialization at IVF-practice coarseK. The
  * centroids are held as a Seq so case-class equality is by VALUE (the
  * [[PqReconstruct]]/[[SqDistToLit]] convention — an Array field would
  * defeat Catalyst subexpression/exchange reuse); eval reads the
  * flattened array. Null/malformed vector → null struct (callers raise
  * the branded malformed-embedding error on it).
  */
case class NearestCentroid(child: Expression, cents: Seq[Long],
    k: Int, dims: Int) extends UnaryExpression {
  require(k > 0 && dims > 0 && cents.length == k * dims,
    s"flat centroid matrix must be k*dims = ${k * dims} longs, " +
      s"got ${cents.length}")
  override def dataType: DataType = StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("cid", LongType, nullable = false)))
  override def nullable: Boolean = true
  @transient private lazy val flat: Array[Long] = cents.toArray

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (VectorKernels.isLongArray(child))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<bigint> quantized vector " +
        s"(use quantize_floor first), got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    VectorKernels.nearestCentroid(v.asInstanceOf[ArrayData], flat, k, dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vGen = child.genCode(ctx)
    val centsRef = ctx.addReferenceObj("flatCents", flat, "long[]")
    val out = ctx.freshName("nearest")
    ev.copy(code = code"""
      ${vGen.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
      if (!${vGen.isNull}) {
        org.apache.spark.sql.catalyst.InternalRow $out =
          graft.functions.VectorKernels.nearestCentroid(
            ${vGen.value}, $centsRef, $k, $dims);
        if ($out != null) { ${ev.isNull} = false; ${ev.value} = $out; }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
  override def prettyName: String = "nearest_centroid"
}

/** `nearest_cells(v)` — the min(nprobe, k) nearest centroid ids of a
  * quantized vector in (distance, cid) rank order, as array<bigint>
  * ([[VectorKernels.nearestCells]]) — the IVF probe ranking with O(1)
  * plan size in coarseK (same rationale and conventions as
  * [[NearestCentroid]]). Malformed vector → null array.
  */
case class NearestCells(child: Expression, cents: Seq[Long],
    k: Int, dims: Int, nprobe: Int) extends UnaryExpression {
  require(k > 0 && dims > 0 && nprobe > 0 && cents.length == k * dims,
    s"flat centroid matrix must be k*dims = ${k * dims} longs, " +
      s"got ${cents.length} (nprobe $nprobe)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  @transient private lazy val flat: Array[Long] = cents.toArray

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (VectorKernels.isLongArray(child))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<bigint> quantized vector " +
        s"(use quantize_floor first), got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    VectorKernels.nearestCells(v.asInstanceOf[ArrayData], flat, k, dims,
      nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vGen = child.genCode(ctx)
    val centsRef = ctx.addReferenceObj("flatCents", flat, "long[]")
    val out = ctx.freshName("cellsOut")
    ev.copy(code = code"""
      ${vGen.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${vGen.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $out =
          graft.functions.VectorKernels.nearestCells(
            ${vGen.value}, $centsRef, $k, $dims, $nprobe);
        if ($out != null) { ${ev.isNull} = false; ${ev.value} = $out; }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
  override def prettyName: String = "nearest_cells"
}

/** `quantize_floor(v, scale)` — floor(x·scale) per element as array<bigint>,
  * one primitive loop.
  */
case class QuantizeFloorLong(child: Expression, scale: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  private lazy val vf = VectorKernels.isFloatArray(child)

  // Fractional-only: on array<int>/array<bigint> ArrayData.getDouble would
  // misread the element bytes; fail at analysis instead.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (VectorKernels.isFractionalArray(child))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float> or array<double>, " +
        s"got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    VectorKernels.quantizeFloorLong(v.asInstanceOf[ArrayData], scale, vf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorKernels.quantizeFloorLong($c, $scale, $vf)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeFloorLong =
    copy(child = newChild)
  override def prettyName: String = "quantize_floor"
}
