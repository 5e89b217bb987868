package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.json4s._

/** Minimal BSON codec for the OP_MSG wire client ([[MongoWireClient]]) —
  * the subset a find/getMore/killCursors/count conversation uses, mapped
  * onto json4s values so the rest of the reader keeps speaking JSON:
  *
  *  - encode: string, int32 (JInt within range), int64, double, bool,
  *    null, nested document, array;
  *  - decode: the above plus the server-emitted extras — ObjectId (as the
  *    24-char hex string pymongo shows), UTC datetime (as the typed
  *    `{"$date": ms}` sentinel so filters re-encode it as type 0x09 —
  *    see [[date]]), timestamp (as epoch-millis JLong), binary (as base64
  *    JString), with unknown types failing loudly rather than
  *    desynchronizing the stream.
  *
  * BSON is little-endian throughout; documents are `int32 length, elements,
  * 0x00` with the length INCLUDING itself and the terminator (the framing
  * the decoder trusts to skip value bytes it does not interpret).
  */
object Bson {

  // ------------------------------------------------------------- encoding

  /** Mark a value as BSON binary (subtype 0): `JObject("$binary" ->
    * JString(base64))` encodes as type 0x05 — the shape SASL payloads
    * travel as. (json4s has no native binary node; the sentinel keeps the
    * public surface JValue-only.) The single-field `$binary` document
    * shape is RESERVED by this codec: a caller-supplied subdocument with
    * exactly that shape would be encoded as binData, and non-base64
    * content fails loudly below rather than silently changing type.
    */
  def binary(bytes: Array[Byte]): JObject =
    JObject("$binary" -> (JString(
      java.util.Base64.getEncoder.encodeToString(bytes)): JValue))

  /** Mark a value as BSON UTC datetime (type 0x09): `JObject("$date" ->
    * JLong(epochMillis))` — MongoDB Extended JSON's canonical shape.
    * Decoding 0x09 produces exactly this sentinel, so datetime values
    * ROUND-TRIP with their type: a filter bound built from a decoded
    * extreme goes back onto the wire as a Date, which matters because
    * MongoDB's type bracketing never matches Date fields against int64
    * bounds (a `$gte: 1723600000000` drains ZERO docs from a Date-keyed
    * collection). Like `$binary`, the single-field `$date` document shape
    * is reserved by this codec.
    */
  def date(epochMillis: Long): JObject =
    JObject("$date" -> (JLong(epochMillis): JValue))

  def encodeDoc(doc: JObject): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeDoc(out, doc)
    out.toByteArray
  }

  private def writeDoc(out: java.io.ByteArrayOutputStream, doc: JObject): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    doc.obj.foreach { case (k, v) => writeElement(body, k, v) }
    val total = 4 + body.size() + 1
    out.write(le32(total))
    body.writeTo(out)
    out.write(0)
  }

  private def writeElement(out: java.io.ByteArrayOutputStream, key: String,
      v: JValue): Unit = {
    def cstring(s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      require(!b.contains(0.toByte), s"BSON key/cstring cannot contain NUL: $s")
      out.write(b); out.write(0)
    }
    v match {
      case JString(s) =>
        out.write(0x02); cstring(key)
        val b = s.getBytes(StandardCharsets.UTF_8)
        out.write(le32(b.length + 1)); out.write(b); out.write(0)
      case JInt(i) if i.isValidInt =>
        out.write(0x10); cstring(key); out.write(le32(i.toInt))
      case JInt(i) =>
        // BigInt.toLong silently truncates past 64 bits — a filter bound
        // that wide would query WRONG ranges instead of failing
        require(i.isValidLong,
          s"BSON int64 cannot represent $i (key $key): out of 64-bit range")
        out.write(0x12); cstring(key); out.write(le64(i.toLong))
      case JLong(l) =>
        out.write(0x12); cstring(key); out.write(le64(l))
      case JDouble(d) =>
        out.write(0x01); cstring(key)
        out.write(le64(java.lang.Double.doubleToLongBits(d)))
      case JDecimal(d) =>
        // only exactly-double-representable decimals encode (compared
        // against the double's EXACT binary expansion — scala's
        // BigDecimal(Double) shortest-decimal constructor would wave
        // 0.1 through); a lossy narrowing would send wrong bounds
        // instead of failing loudly
        val dd = d.toDouble
        require(!dd.isInfinite && !dd.isNaN &&
            new java.math.BigDecimal(dd).compareTo(d.underlying) == 0,
          s"BSON double cannot exactly represent decimal $d (key $key); " +
            "pass a double-safe value or pre-round explicitly")
        out.write(0x01); cstring(key)
        out.write(le64(java.lang.Double.doubleToLongBits(dd)))
      case JBool(b) =>
        out.write(0x08); cstring(key); out.write(if (b) 1 else 0)
      case JNull | JNothing =>
        out.write(0x0A); cstring(key)
      case JObject(("$binary", JString(b64)) :: Nil) =>
        out.write(0x05); cstring(key)
        val b =
          try java.util.Base64.getDecoder.decode(b64)
          catch { case e: IllegalArgumentException =>
            throw new IllegalArgumentException(
              "single-field {\"$binary\": ...} documents are reserved for " +
                "binData and must hold base64 (see Bson.binary)", e)
          }
        out.write(le32(b.length)); out.write(0x00); out.write(b)
      case JObject(("$date", ms) :: Nil) =>
        val epochMillis = ms match {
          case JLong(l) => l
          case JInt(i) if i.isValidLong => i.toLong
          case other => throw new IllegalArgumentException(
            "single-field {\"$date\": ...} documents are reserved for UTC " +
              s"datetime and must hold epoch millis (see Bson.date), got $other")
        }
        out.write(0x09); cstring(key); out.write(le64(epochMillis))
      case o: JObject =>
        out.write(0x03); cstring(key); writeDoc(out, o)
      case JArray(items) =>
        out.write(0x04); cstring(key)
        writeDoc(out, JObject(items.zipWithIndex.map {
          case (it, i) => i.toString -> it
        }))
      case other =>
        throw new IllegalArgumentException(s"cannot BSON-encode $other")
    }
  }

  private def le32(i: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i).array()
  private def le64(l: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(l).array()

  // ------------------------------------------------------------- decoding

  /** Decode one document starting at `buf.position()`; advances past it. */
  def decodeDoc(buf: ByteBuffer): JObject = {
    buf.order(ByteOrder.LITTLE_ENDIAN)
    val start = buf.position()
    val len = buf.getInt()
    val end = start + len
    val fields = List.newBuilder[(String, JValue)]
    while (buf.position() < end - 1) {
      val tpe = buf.get() & 0xff
      val key = readCString(buf)
      fields += key -> readValue(buf, tpe)
    }
    require((buf.get() & 0xff) == 0, "BSON document missing terminator")
    JObject(fields.result())
  }

  private def readCString(buf: ByteBuffer): String = {
    val sb = new java.io.ByteArrayOutputStream()
    var b = buf.get()
    while (b != 0) { sb.write(b); b = buf.get() }
    new String(sb.toByteArray, StandardCharsets.UTF_8)
  }

  private def readValue(buf: ByteBuffer, tpe: Int): JValue = tpe match {
    case 0x01 => JDouble(java.lang.Double.longBitsToDouble(buf.getLong()))
    case 0x02 =>
      val len = buf.getInt()
      val b = new Array[Byte](len - 1)
      buf.get(b); buf.get() // NUL
      JString(new String(b, StandardCharsets.UTF_8))
    case 0x03 => decodeDoc(buf)
    case 0x04 => // array travels as a doc with "0","1",… keys
      JArray(decodeDoc(buf).obj.map(_._2))
    case 0x05 => // binary: int32 len, subtype byte, bytes → base64
      val len = buf.getInt(); buf.get()
      val b = new Array[Byte](len); buf.get(b)
      JString(java.util.Base64.getEncoder.encodeToString(b))
    case 0x07 => // ObjectId: 12 bytes → hex, like pymongo's str(ObjectId)
      val b = new Array[Byte](12); buf.get(b)
      JString(b.map(x => f"$x%02x").mkString)
    case 0x08 => JBool(buf.get() != 0)
    case 0x09 => date(buf.getLong()) // UTC datetime: typed {$date: ms} sentinel
    case 0x0A => JNull
    case 0x10 => JInt(BigInt(buf.getInt()))
    case 0x11 => JLong(buf.getLong()) // timestamp
    case 0x12 => JLong(buf.getLong())
    case other =>
      // decoding an unknown type blind would desynchronize every element
      // after it — fail loudly instead
      throw new IllegalArgumentException(
        f"unsupported BSON type 0x$other%02x")
  }
}
