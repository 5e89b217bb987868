package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd kernels for the text hot paths (companion to
  * [[VectorKernels]] — same rationale: the `transform`/`aggregate` HOF
  * compositions these replace are CodegenFallback, i.e. interpreted
  * per-element eval with boxing and megamorphic dispatch, the exact
  * failure mode VectorExpressions documents for the cosine sweep. A
  * per-token interpreted loop is the wrong throughput tier for a 100 TB
  * text scan, and is visibly jitter-prone under a long-lived JIT.)
  *
  * Bit parity: every kernel reproduces its HOF composition's values
  * exactly (null propagation, `array_join` null-skipping, md5-60bit
  * arithmetic), proven by `TextExpressionsSpec`'s side-by-side runs.
  */
object TextKernels {

  private val Space = UTF8String.fromString(" ")

  /** First 60 bits of md5 as a non-negative long — value-identical to
    * `conv(substring(md5(s),1,15),16,10)` (see [[VectorKernels.arrayMd5H60]]).
    */
  private def md5h60(md: MessageDigest, s: UTF8String): Long = {
    val d = md.digest(s.getBytes)
    md.reset()
    var h = 0L
    var j = 0
    while (j < 8) { h = (h << 8) | (d(j) & 0xFFL); j += 1 }
    h >>> 4
  }

  /** Content-defined chunking over a token array in ONE fused pass —
    * parity with the HOF form in `TextFunctions.cdcBlocksFromTokensHof`:
    *
    *  - window i (0-based, covering tokens [i, i+w)) cuts BEFORE token
    *    i+w when the 60-bit md5 of its space-joined tokens has `maskBits`
    *    low zero bits; a window containing a null token never cuts (the
    *    HOF's `concat` gram is null → the `when` falls through);
    *  - a cut at position n is dropped (it would only create an empty
    *    tail block);
    *  - blocks span consecutive cut points (plus 0 and n); each block's
    *    hash is the md5h60 of its tokens joined by " " with null elements
    *    SKIPPED (exactly `array_join`'s null behavior);
    *  - empty token array → empty block array; null handled by the
    *    expression's null-safe wrapper.
    */
  def cdcBlocks(toks: ArrayData, w: Int, maskBits: Int): ArrayData = {
    val mask = (1L << maskBits) - 1
    val n = toks.numElements()
    val md = MessageDigest.getInstance("MD5")
    val strs = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) strs(i) = toks.getUTF8String(i)
      i += 1
    }
    val cuts = new scala.collection.mutable.ArrayBuffer[Int]()
    val numWindows = n - w + 1
    var wi = 0
    while (wi < numWindows) {
      var ok = true
      var j = wi
      while (ok && j < wi + w) { if (strs(j) == null) ok = false; j += 1 }
      if (ok) {
        val gram =
          if (w == 1) strs(wi)
          else UTF8String.concatWs(Space,
            java.util.Arrays.copyOfRange(strs, wi, wi + w): _*)
        if ((md5h60(md, gram) & mask) == 0L) {
          val cut = wi + w
          if (cut < n) cuts += cut
        }
      }
      wi += 1
    }
    val m = cuts.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](m + 1)
    var bi = 0
    var s = 0
    while (bi <= m) {
      val e = if (bi < m) cuts(bi) else n
      if (e - s > 0) {
        val joined = UTF8String.concatWs(Space,
          java.util.Arrays.copyOfRange(strs, s, e): _*)
        out += new GenericInternalRow(
          Array[Any](s.toLong, (e - s).toLong, md5h60(md, joined)))
      }
      s = e
      bi += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `cdc_blocks(toks, w, maskBits)` — content-defined chunking of a token
  * array as `array<struct<start, n_tokens, block_hash>>`, one codegen'd
  * pass per row (see [[TextKernels.cdcBlocks]] for the exact semantics).
  */
case class CdcBlocksFromTokens(child: Expression, w: Int, maskBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("block_hash", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> tokens, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.cdcBlocks(input.asInstanceOf[ArrayData], w, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.cdcBlocks($c, $w, $maskBits)")

  override protected def withNewChildInternal(newChild: Expression): CdcBlocksFromTokens =
    copy(child = newChild)
  override def prettyName: String = "cdc_blocks"
}
