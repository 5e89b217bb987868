package graft.sources

/** PKWare DCL "implode" decompressor — the stream format inside DATASUS
  * `.dbc` files (the reference ingests those via pyreaddbc before staging:
  * datalake/utils/data_transformations.py:95-139). Independently
  * implemented in Scala from the published bit-stream specification (the
  * public-domain `blast` format description): LSB-first bit stream, two
  * header bytes (literal coding mode, dictionary size log2−6), then a
  * sequence of <literal> / <length,distance> items under three fixed
  * canonical Huffman tables whose codes are transmitted inverted, ended by
  * length symbol 519.
  *
  * Scale note: decompression is inherently sequential per file (LZ77 back
  * references), so the parallel unit is the FILE — `DbfReader` maps one
  * task per .dbc via `binaryFile`, which is exactly how a 100 TB DATASUS
  * drop (tens of thousands of monthly state files) spreads over a cluster.
  */
object Implode {

  /** Maximum Huffman code length in the DCL format. */
  private val MaxBits = 13

  private final class BitReader(data: Array[Byte], var pos: Int, val end: Int) {
    private var bitbuf = 0
    private var bitcnt = 0
    def bits(n: Int): Int = {
      var v = bitbuf
      while (bitcnt < n) {
        if (pos >= end) throw new IllegalArgumentException("implode: truncated input")
        v |= (data(pos) & 0xFF) << bitcnt
        pos += 1
        bitcnt += 8
      }
      bitbuf = v >>> n
      bitcnt -= n
      v & ((1 << n) - 1)
    }
  }

  /** Canonical Huffman table from the format's compact (count−1 | length)
    * nibble pairs; decode walks code lengths shortest-first, codes arrive
    * one inverted bit at a time, MSB-first.
    */
  private final class Huffman(rep: Array[Int], symbols: Int) {
    val count = new Array[Int](MaxBits + 1)
    val symbol = new Array[Int](symbols)
    locally {
      val length = new Array[Int](symbols)
      var s = 0
      rep.foreach { r =>
        var left = (r >> 4) + 1
        val len = r & 15
        while (left > 0) { length(s) = len; s += 1; left -= 1 }
      }
      require(s == symbols, s"implode: table expands to $s, expected $symbols")
      length.foreach(l => count(l) += 1)
      val offs = new Array[Int](MaxBits + 2)
      var l = 1
      while (l <= MaxBits) { offs(l + 1) = offs(l) + count(l); l += 1 }
      var i = 0
      while (i < symbols) {
        if (length(i) != 0) { symbol(offs(length(i))) = i; offs(length(i)) += 1 }
        i += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = 0; var first = 0; var index = 0; var len = 1
      while (len <= MaxBits) {
        code |= br.bits(1) ^ 1 // codes are transmitted inverted
        val cnt = count(len)
        if (code - first < cnt) return symbol(index + (code - first))
        index += cnt
        first = (first + cnt) << 1
        code <<= 1
        len += 1
      }
      throw new IllegalArgumentException("implode: invalid code")
    }
  }

  // fixed format tables (spec constants)
  /** ASCII-mode literal code lengths, compact (count−1)<<4 | length form —
    * a fixed constant of the DCL format, published in the public-domain
    * `blast` reference decoder (blast.c, Mark Adler, zlib/contrib). The
    * nibble expansion must cover exactly 256 byte values (checked by the
    * Huffman constructor).
    */
  private val litLen = Array(
    11, 124, 8, 7, 28, 7, 188, 13, 76, 4, 10, 8, 12, 10, 12, 10, 8, 23, 8,
    9, 7, 6, 7, 8, 7, 6, 55, 8, 23, 24, 12, 11, 7, 9, 11, 12, 6, 7, 22, 5,
    7, 24, 6, 11, 9, 6, 7, 22, 7, 11, 38, 7, 9, 8, 25, 11, 8, 11, 9, 12,
    8, 12, 5, 38, 5, 38, 5, 11, 7, 5, 6, 21, 6, 10, 53, 8, 7, 24, 10, 27,
    44, 253, 253, 253, 252, 252, 252, 13, 12, 45, 12, 45, 12, 61, 12, 45,
    44, 173)
  private val litCode = new Huffman(litLen, 256)
  /** Expanded per-symbol literal code lengths — exposed for the spec's
    * test-side encoder (canonical codes derive from these).
    */
  private[graft] def literalLengths: Array[Int] = {
    val out = new Array[Int](256)
    var s = 0
    litLen.foreach { r =>
      var left = (r >> 4) + 1
      while (left > 0) { out(s) = r & 15; s += 1; left -= 1 }
    }
    out
  }
  private val lenCode = new Huffman(Array(2, 35, 36, 53, 38, 23), 16)
  private val distCode = new Huffman(Array(2, 20, 53, 230, 247, 151, 248), 64)
  private val lenBase = Array(3, 2, 4, 5, 6, 7, 8, 9, 10, 12, 16, 24, 40, 72, 136, 264)
  private val lenExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8)
  /** End-of-stream marker: length symbol 15 maxed out (264 + 255). */
  private val EndLength = 519

  /** Decompress an imploded stream starting at `offset`. `sizeHint` presizes
    * the output (e.g. DBF record-count × record-size when known).
    */
  def decompress(data: Array[Byte], offset: Int = 0, sizeHint: Int = 1 << 16,
      end: Int = -1): Array[Byte] = {
    val br = new BitReader(data, offset, if (end < 0) data.length else end)
    val lit = br.bits(8)
    require(lit <= 1, s"implode: bad literal-mode byte $lit")
    val dict = br.bits(8)
    require(dict >= 4 && dict <= 6, s"implode: bad dictionary byte $dict")
    var buf = new Array[Byte](math.max(sizeHint, 64)) // window = whole output
    var n = 0
    def ensure(extra: Int): Unit =
      if (n + extra > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, n + extra))
    var done = false
    while (!done) {
      if (br.bits(1) == 1) {
        val sym = lenCode.decode(br)
        val len = lenBase(sym) + br.bits(lenExtra(sym))
        if (len == EndLength) done = true
        else {
          val lowBits = if (len == 2) 2 else dict
          val dist = (distCode.decode(br) << lowBits) + br.bits(lowBits) + 1
          require(dist <= n, s"implode: distance $dist beyond output $n")
          ensure(len)
          var i = 0
          while (i < len) { buf(n) = buf(n - dist); n += 1; i += 1 }
        }
      } else {
        ensure(1)
        // binary mode: raw 8 bits; ASCII mode: Huffman-coded literal under
        // the fixed 256-symbol table (text-heavy payloads get short codes)
        buf(n) = (if (lit == 1) litCode.decode(br) else br.bits(8)).toByte
        n += 1
      }
    }
    java.util.Arrays.copyOf(buf, n)
  }

  /** DATASUS `.dbc` → `.dbf`: the first `headerSize` bytes (little-endian
    * u16 at offset 8, same field as DBF) are the uncompressed DBF header;
    * 4 bytes of CRC follow; the imploded record block is the remainder.
    */
  def dbcToDbf(bytes: Array[Byte]): Array[Byte] = {
    require(bytes.length > 14, "truncated .dbc")
    val headerLen = (bytes(8) & 0xFF) | ((bytes(9) & 0xFF) << 8)
    require(headerLen > 0 && headerLen + 4 < bytes.length,
      s"implausible .dbc header size $headerLen for ${bytes.length}-byte file")
    val nRecords = (bytes(4) & 0xFF).toLong | ((bytes(5) & 0xFF).toLong << 8) |
      ((bytes(6) & 0xFF).toLong << 16) | ((bytes(7) & 0xFF).toLong << 24)
    val recordLen = (bytes(10) & 0xFF) | ((bytes(11) & 0xFF) << 8)
    val hint = math.min(nRecords * recordLen + 1, Int.MaxValue.toLong / 2).toInt
    val header = java.util.Arrays.copyOfRange(bytes, 0, headerLen)
    val body = decompress(bytes, headerLen + 4, sizeHint = math.max(hint, 64))
    val outBytes = new Array[Byte](header.length + body.length)
    System.arraycopy(header, 0, outBytes, 0, header.length)
    System.arraycopy(body, 0, outBytes, header.length, body.length)
    outBytes
  }
}
