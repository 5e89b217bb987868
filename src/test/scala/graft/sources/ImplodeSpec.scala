package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Test-side DCL implode ENCODER — written independently of the decoder
  * (its own canonical-code construction from the same published tables) so
  * round-trips actually cross-check two implementations of the format.
  */
object TestImplodeEncoder {

  private class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var bitbuf = 0
    private var bitcnt = 0
    def put(v: Int, n: Int): Unit = { // LSB-first
      bitbuf |= (v & ((1 << n) - 1)) << bitcnt
      bitcnt += n
      while (bitcnt >= 8) {
        out.write(bitbuf & 0xFF)
        bitbuf >>>= 8
        bitcnt -= 8
      }
    }
    def bytes(): Array[Byte] = {
      if (bitcnt > 0) { out.write(bitbuf & 0xFF); bitbuf = 0; bitcnt = 0 }
      out.toByteArray
    }
  }

  /** (code, len) per symbol via independent canonical assignment. */
  private def codes(rep: Array[Int], symbols: Int): Array[(Int, Int)] = {
    val length = new Array[Int](symbols)
    var s = 0
    rep.foreach { r =>
      var left = (r >> 4) + 1
      while (left > 0) { length(s) = r & 15; s += 1; left -= 1 }
    }
    val res = new Array[(Int, Int)](symbols)
    var code = 0
    (1 to 13).foreach { len =>
      (0 until symbols).filter(length(_) == len).foreach { sym =>
        res(sym) = (code, len)
        code += 1
      }
      code <<= 1
    }
    res
  }

  private val lenCodes = codes(Array(2, 35, 36, 53, 38, 23), 16)
  private val distCodes = codes(Array(2, 20, 53, 230, 247, 151, 248), 64)
  // ASCII-mode literal table (public-domain blast.c constant), expanded by
  // THIS encoder's own canonical construction — independent of the decoder's
  private val litCodes = codes(Array(
    11, 124, 8, 7, 28, 7, 188, 13, 76, 4, 10, 8, 12, 10, 12, 10, 8, 23, 8,
    9, 7, 6, 7, 8, 7, 6, 55, 8, 23, 24, 12, 11, 7, 9, 11, 12, 6, 7, 22, 5,
    7, 24, 6, 11, 9, 6, 7, 22, 7, 11, 38, 7, 9, 8, 25, 11, 8, 11, 9, 12,
    8, 12, 5, 38, 5, 38, 5, 11, 7, 5, 6, 21, 6, 10, 53, 8, 7, 24, 10, 27,
    44, 253, 253, 253, 252, 252, 252, 13, 12, 45, 12, 45, 12, 61, 12, 45,
    44, 173), 256)
  private val lenBase = Array(3, 2, 4, 5, 6, 7, 8, 9, 10, 12, 16, 24, 40, 72, 136, 264)
  private val lenExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8)

  private def putCode(w: BitWriter, ce: (Int, Int)): Unit = {
    val (code, len) = ce
    var i = len - 1
    while (i >= 0) { w.put(((code >> i) & 1) ^ 1, 1); i -= 1 } // MSB-first, inverted
  }

  sealed trait Item
  final case class Lit(b: Byte) extends Item
  final case class Match(len: Int, dist: Int) extends Item

  def encode(items: Seq[Item], lit: Int, dict: Int): Array[Byte] = {
    val w = new BitWriter
    w.put(lit, 8)
    w.put(dict, 8)
    items.foreach {
      case Lit(b) =>
        w.put(0, 1)
        if (lit == 1) putCode(w, litCodes(b & 0xFF))
        else w.put(b & 0xFF, 8)
      case Match(len, dist) =>
        w.put(1, 1)
        val sym = lenBase.zipWithIndex
          .filter { case (base, i) => len >= base && len < base + (1 << lenExtra(i)) &&
            !(i == 0 && len == 2) }
          .minBy { case (_, i) => lenExtra(i) }._2
        putCode(w, lenCodes(sym))
        w.put(len - lenBase(sym), lenExtra(sym))
        val lowBits = if (len == 2) 2 else dict
        val d = dist - 1
        putCode(w, distCodes(d >>> lowBits))
        w.put(d & ((1 << lowBits) - 1), lowBits)
    }
    // end marker: length 519 = symbol 15 + 255 extra
    w.put(1, 1)
    putCode(w, lenCodes(15))
    w.put(255, 8)
    w.bytes()
  }

  /** Naive greedy LZ77 over a byte array → items (for realistic streams). */
  def compress(data: Array[Byte], lit: Int, dict: Int): Array[Byte] = {
    val window = 1 << (dict + 6)
    val items = scala.collection.mutable.ListBuffer.empty[Item]
    var i = 0
    while (i < data.length) {
      var bestLen = 0; var bestDist = 0
      val lo = math.max(0, i - window)
      var j = i - 1
      while (j >= lo) {
        var l = 0
        while (i + l < data.length && l < 516 && data(j + (l % (i - j))) == data(i + l)) l += 1
        if (l > bestLen) { bestLen = l; bestDist = i - j }
        j -= 1
      }
      if (bestLen >= 3) { items += Match(bestLen, bestDist); i += bestLen }
      else { items += Lit(data(i)); i += 1 }
    }
    encode(items.toSeq, lit, dict)
  }
}

class ImplodeSpec extends AnyFunSuite {
  import TestImplodeEncoder._

  test("uncoded-literal stream round-trips") {
    val data = "hello implode world, hello again".getBytes("UTF-8")
    val enc = encode(data.map(Lit(_)).toSeq, lit = 0, dict = 4)
    assert(Implode.decompress(enc).toSeq == data.toSeq)
  }

  test("all byte values round-trip uncoded") {
    val data = (0 until 256).map(_.toByte).toArray
    val enc = encode(data.map(Lit(_)).toSeq, lit = 0, dict = 5)
    assert(Implode.decompress(enc).toSeq == data.toSeq)
  }

  test("ASCII-mode: all 256 Huffman-coded literal values round-trip") {
    val data = (0 until 256).map(_.toByte).toArray
    val enc = encode(data.map(Lit(_)).toSeq, lit = 1, dict = 5)
    assert(Implode.decompress(enc).toSeq == data.toSeq)
    // text compresses tighter under coded literals than raw 8-bit ones —
    // the point of ASCII mode (common letters get ≤7-bit codes)
    val text = ("select nome, idade from pacientes where cnes is not null " * 8)
      .getBytes("UTF-8")
    val coded = encode(text.map(Lit(_)).toSeq, lit = 1, dict = 4)
    val raw = encode(text.map(Lit(_)).toSeq, lit = 0, dict = 4)
    assert(Implode.decompress(coded).toSeq == text.toSeq)
    assert(coded.length < raw.length)
  }

  test("ASCII-mode: greedy-compressed mixed stream with matches round-trips") {
    val rnd = new Random(11)
    val rep = Array.fill(300)((rnd.nextInt(26) + 'a').toByte)
    val mixed = rep ++ "cid10 a00 colera; cid10 a01 febre tifoide".getBytes ++ rep
    for (dict <- 4 to 6) {
      val enc = compress(mixed, 1, dict)
      assert(Implode.decompress(enc).toSeq == mixed.toSeq, s"ascii dict=$dict")
    }
  }

  test("decoder and encoder literal tables agree (expansion covers 256 symbols)") {
    val lens = Implode.literalLengths
    assert(lens.length == 256)
    // Kraft equality: the published table is a COMPLETE prefix code —
    // a transcription error in either table would break this sum
    val kraft = lens.map(l => BigDecimal(1) / BigDecimal(2).pow(l)).sum
    assert(kraft == BigDecimal(1))
  }

  test("length/distance pairs incl. overlapping copy and len-2 special case") {
    // "abcabcabc…" via dist-3 overlap; then a len-2 match (2-bit distance)
    val items = Seq[Item](Lit('a'), Lit('b'), Lit('c'), Match(9, 3),
      Lit('X'), Match(2, 1))
    val enc = encode(items, lit = 0, dict = 6)
    assert(new String(Implode.decompress(enc), "UTF-8") == "abcabcabcabcXXX")
  }

  test("greedy-compressed random + repetitive data round-trips at every dict size") {
    val rnd = new Random(7)
    val rep = Array.fill(400)((rnd.nextInt(4) + 'a').toByte)
    val mixed = rep ++ Array.fill(100)(rnd.nextInt(256).toByte) ++ rep
    for (dict <- 4 to 6) {
      val enc = compress(mixed, 0, dict)
      assert(Implode.decompress(enc).toSeq == mixed.toSeq, s"dict=$dict")
    }
  }

  test("truncated stream and bad header fail loudly") {
    val enc = encode(Seq(Lit('x')), 0, 4)
    intercept[IllegalArgumentException](Implode.decompress(enc.dropRight(2)))
    intercept[IllegalArgumentException](Implode.decompress(Array[Byte](9, 4, 0)))
    intercept[IllegalArgumentException](Implode.decompress(Array[Byte](0, 9, 0)))
  }
}
