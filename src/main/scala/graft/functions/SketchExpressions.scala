package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType,
  StructField, StructType}

/** K-Minimum-Values distinct-count sketch (Bar-Yossef et al. 2002) as a
  * native typed aggregate.
  *
  * WHY a sketch: the reference's row-count / distinct-count checks (e.g.
  * reconciliation counts, `COUNT(DISTINCT …)` validation queries) are exact,
  * which at 100 TB means shuffling EVERY distinct value of the counted
  * column. KMV keeps only the k smallest hash values per group — the
  * aggregation buffer is a bounded k-entry set regardless of input size,
  * map-side partials are k longs per (partition, group), and merge is a
  * bounded set-union. Shuffle volume drops from O(distinct values) to
  * O(groups × k) with a relative error of ~1/sqrt(k-2) (k=128 → ~9 %,
  * k=1024 → ~3 %).
  *
  * DETERMINISM / ORACLE REPLAY: the input is a pre-computed PORTABLE 60-bit
  * hash ([[SketchFunctions.md5h60]] — first 15 md5 hex chars as an integer),
  * not an engine-internal hash, so any engine with md5 replays the exact
  * estimate: sort the distinct hashes, take the k-th smallest h_k, estimate
  * `floor((k-1) * 2^60 / h_k)` (exact distinct count when fewer than k
  * distinct hashes exist). All arithmetic is IEEE double with values exactly
  * representable at the multiply, so Spark and DuckDB agree bit-for-bit.
  *
  * Buffer = `java.util.TreeSet[Long]` capped at k entries (duplicates —
  * repeated values — collapse for free, which is exactly KMV's distinctness
  * semantics). Serialized form: k × 8 bytes.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv_distinct needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct needs a BIGINT hash input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last() && buf.add(h)) { buf.pollLast(); () }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next().longValue())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else {
      // h_k = largest retained hash; hashes are 60-bit non-negative and
      // distinct, so with k >= 2 the k-th smallest is > 0
      val hk = buf.last().longValue().toDouble
      math.floor((k - 1).toDouble * SketchFunctions.TwoPow60 / hk).toLong
    }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream(4 + 8 * buf.size)
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}

/** Misra–Gries heavy-hitters sketch: k bounded counters per aggregation
  * buffer, so finding frequent items over a 100 TB column costs O(groups × k)
  * shuffle instead of an exact count per distinct value (vocabulary-sized).
  *
  * Guarantees (asserted in `SketchSpec`, the classic MG bounds):
  *  - SUPERSET: every item with true count > n/(k+1) is present in the
  *    output (no false negatives above the threshold);
  *  - each reported estimate undercounts by at most n/(k+1).
  *
  * NOT oracle-replayable by design: counter evictions depend on encounter
  * order, so estimates vary with partitioning (the superset/bound
  * guarantees do not). Exact follow-up counts for the surviving candidates
  * are one cheap semi-join away — the standard two-pass pattern.
  *
  * Output: `array<struct<item, est_count>>` sorted by est_count desc then
  * item, truncated to the k live counters.
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"heavy_hitters needs k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters needs a STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est_count", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(
      buf: java.util.HashMap[String, Long], input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      val cur = buf.getOrDefault(item, 0L)
      if (cur > 0L) buf.put(item, cur + 1L)
      else if (buf.size < k) buf.put(item, 1L)
      else {
        // classic MG step: decrement every counter, discard the newcomer;
        // each such event consumes k+1 units of mass, bounding total
        // decrement by n/(k+1)
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(
      b1: java.util.HashMap[String, Long],
      b2: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    // proven-bound MG merge (Agarwal et al., "Mergeable Summaries"): add
    // counters exactly, then subtract the (k+1)-th largest and drop <= 0
    val it2 = b2.entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next()
      b1.put(e.getKey, b1.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (b1.size > k) {
      val counts = new Array[Long](b1.size)
      val vs = b1.values().iterator()
      var i = 0
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val s = counts(b1.size - k - 1) // (k+1)-th largest
      val it = b1.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= s) it.remove() else e.setValue(e.getValue - s)
      }
    }
    b1
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortBy { case (item, c) => (-c, item) }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      sorted.map { case (item, c) =>
        InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(item), c)
      }.toIndexedSeq)
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    // Length-prefixed bytes, not writeUTF: items come from stringified arbitrary
    // columns, and writeUTF throws past 65535 encoded bytes.
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      buf.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHitters =
    copy(child = newChild)
}

/** User-facing Column surface for the sketch aggregates. */
object SketchFunctions {

  /** 2^60 — exactly representable as a double. */
  val TwoPow60: Double = 1152921504606846976.0

  /** Portable 60-bit hash (first 15 md5 hex chars as an integer) — the same
    * primitive as the portable MinHash/SimHash pipelines, reproducible
    * bit-for-bit in DuckDB as `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`.
    */
  def md5h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Approximate COUNT(DISTINCT value) with bounded O(k) state per group.
    * `value` is stringified and hashed with [[md5h60]] internally.
    */
  def kmvDistinct(value: Column, k: Int): Column =
    kmvDistinctFromHash(md5h60(value.cast("string")), k)

  /** Same, over an already-computed 60-bit non-negative hash column. */
  def kmvDistinctFromHash(hash: Column, k: Int): Column =
    Bridge.column(KmvDistinct(Bridge.expression(hash), k).toAggregateExpression())

  /** Approximate frequent items with k bounded counters (Misra–Gries).
    * Returns `array<struct<item, est_count>>`; see [[HeavyHitters]] for the
    * superset/error guarantees and the exact-recount follow-up pattern.
    */
  def heavyHitters(value: Column, k: Int): Column =
    Bridge.column(
      HeavyHitters(Bridge.expression(value.cast("string")), k).toAggregateExpression())
}
