package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, IOException}
import java.net.{InetSocketAddress, Socket}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.concurrent.atomic.AtomicInteger

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Socket-level MongoDB client speaking OP_MSG (opcode 2013) — the wire
  * transport under [[MongoSliceReader]], replacing the injected find
  * lambda with the real protocol the reference's MongoClient speaks
  * (reference: pipelines/datalake/extract_load/minhasaude_mongodb/
  * tasks.py:161-256 — `find(filtro).batch_size(n).max_time_ms(m)` drained
  * through getMore, `count_documents`, sort+limit extremes). Scope is the
  * modern no-auth conversation:
  *
  *  - `hello` handshake (MongoDB ≥5.1 accepts it over OP_MSG directly);
  *  - `find` with filter/sort/limit/batchSize/maxTimeMS/noCursorTimeout;
  *  - `getMore` until the server returns cursor id 0;
  *  - `killCursors` for early-abandoned cursors (close() mid-batch);
  *  - `count` for the reconciliation total.
  *
  * Framing: every message is `int32 len, int32 requestID, int32 responseTo,
  * int32 opCode(2013), uint32 flags(0), kind-0 section (0x00 + one BSON
  * doc)`. Replies with `ok != 1` throw with the server's errmsg. One
  * socket, serial request/response — the reader drains slices
  * sequentially, so no pipelining is needed.
  */
final class MongoWireClient(host: String, port: Int, timeoutMs: Int = 120000)
    extends AutoCloseable {

  private val socket = new Socket()
  socket.connect(new InetSocketAddress(host, port), timeoutMs)
  socket.setSoTimeout(timeoutMs)
  private val in = new DataInputStream(
    new BufferedInputStream(socket.getInputStream))
  private val out = new BufferedOutputStream(socket.getOutputStream)
  private val requestIds = new AtomicInteger(1)

  override def close(): Unit = socket.close()

  /** True after [[hello]] negotiated zlib message compression. */
  @volatile private var zlibNegotiated = false

  // the driver spec exempts the handshake/auth conversation from
  // compression (it may run before negotiation completes)
  private val NeverCompress =
    Set("hello", "isMaster", "saslStart", "saslContinue")

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte], expectedLen: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expectedLen)
    var off = 0
    try {
      while (off < expectedLen && !inf.finished()) {
        val n = inf.inflate(out, off, expectedLen - off)
        // a TRUNCATED/corrupt payload makes inflate() return 0 wanting
        // more input that will never come — that's an error, not a
        // spin-forever condition
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          throw new IOException(
            s"OP_COMPRESSED payload truncated at $off/$expectedLen bytes")
        off += n
      }
    } finally inf.end()
    if (off != expectedLen)
      throw new IOException(
        s"OP_COMPRESSED inflated to $off bytes, header said $expectedLen")
    out
  }

  /** Run one command against `db`; returns the reply document. After zlib
    * negotiation, commands (except the handshake/auth set) travel as
    * OP_COMPRESSED (opcode 2012): originalOpcode + uncompressedSize +
    * compressorId(2) + deflated OP_MSG body.
    */
  def runCommand(db: String, cmd: JObject): JObject = {
    val body = Bson.encodeDoc(JObject(cmd.obj :+ ("$db" -> (JString(db): JValue))))
    val reqId = requestIds.getAndIncrement()
    // the OP_MSG body after the 16-byte header: flags + kind-0 section
    val inner = ByteBuffer.allocate(4 + 1 + body.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    inner.putInt(0)      // flagBits: no checksum, no moreToCome
    inner.put(0.toByte)  // section kind 0
    inner.put(body)
    val innerBytes = inner.array()
    if (zlibNegotiated && !NeverCompress.contains(cmd.obj.head._1)) {
      val compressed = deflate(innerBytes)
      val msg = ByteBuffer.allocate(16 + 9 + compressed.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      msg.putInt(16 + 9 + compressed.length)
      msg.putInt(reqId)
      msg.putInt(0)
      msg.putInt(2012)          // OP_COMPRESSED
      msg.putInt(2013)          // originalOpcode = OP_MSG
      msg.putInt(innerBytes.length)
      msg.put(2.toByte)         // compressorId 2 = zlib
      msg.put(compressed)
      out.write(msg.array())
    } else {
      val msg = ByteBuffer.allocate(16 + innerBytes.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      msg.putInt(16 + innerBytes.length)
      msg.putInt(reqId)
      msg.putInt(0)
      msg.putInt(2013) // OP_MSG
      msg.put(innerBytes)
      out.write(msg.array())
    }
    out.flush()
    val reply = readReply(reqId)
    if (okIsOne(reply)) reply
    else {
      val errmsg = reply \ "errmsg" match {
        case JString(m) => m
        case _ => JsonMethods.compact(JsonMethods.render(reply))
      }
      throw new IOException(s"Mongo command failed: $errmsg")
    }
  }

  private def okIsOne(reply: JObject): Boolean = reply \ "ok" match {
    case JDouble(d) => d == 1.0
    case JInt(i) => i == 1
    case JLong(l) => l == 1L
    case _ => false
  }

  private def readReply(expectResponseTo: Int): JObject = {
    val lenBytes = new Array[Byte](4)
    in.readFully(lenBytes)
    val len = ByteBuffer.wrap(lenBytes).order(ByteOrder.LITTLE_ENDIAN).getInt()
    if (len < 16 + 4 + 1 + 5 || len > 48 * 1024 * 1024)
      throw new IOException(s"implausible OP_MSG length $len")
    val rest = new Array[Byte](len - 4)
    in.readFully(rest)
    var buf = ByteBuffer.wrap(rest).order(ByteOrder.LITTLE_ENDIAN)
    buf.getInt() // requestID (server's)
    val responseTo = buf.getInt()
    if (responseTo != expectResponseTo)
      throw new IOException(
        s"out-of-order reply: responseTo=$responseTo expected $expectResponseTo")
    val opCode = buf.getInt()
    if (opCode == 2012) { // OP_COMPRESSED: unwrap to the original OP_MSG body
      val originalOp = buf.getInt()
      if (originalOp != 2013)
        throw new IOException(s"compressed reply wraps opcode $originalOp")
      val uncompressedSize = buf.getInt()
      // the plain path bounds messageLength; the DECOMPRESSED size must be
      // bounded too — an unchecked header value means a negative-size
      // crash or a zlib-bomb allocation
      if (uncompressedSize < 5 || uncompressedSize > 48 * 1024 * 1024)
        throw new IOException(
          s"implausible OP_COMPRESSED uncompressedSize $uncompressedSize")
      val compressorId = buf.get() & 0xff
      val payload = new Array[Byte](buf.remaining())
      buf.get(payload)
      val body = compressorId match {
        case 2 => inflate(payload, uncompressedSize) // zlib
        case 0 => payload                            // noop
        case other =>
          throw new IOException(s"unsupported compressorId $other")
      }
      buf = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
    } else if (opCode != 2013)
      throw new IOException(s"unexpected opCode $opCode (want OP_MSG 2013)")
    val flags = buf.getInt()
    if ((flags & 0x1) != 0)
      throw new IOException("checksumPresent replies not supported")
    val kind = buf.get() & 0xff
    if (kind != 0)
      throw new IOException(s"unexpected section kind $kind in reply")
    Bson.decodeDoc(buf)
  }

  /** Handshake. With `requestCompression` the hello advertises zlib
    * (`compression: ["zlib"]`); if the server echoes it back, every later
    * non-handshake command travels as OP_COMPRESSED both ways.
    */
  def hello(requestCompression: Boolean = false): JObject = {
    val cmd =
      if (requestCompression) JObject(List(
        "hello" -> (JInt(1): JValue),
        "compression" -> JArray(List(JString("zlib")))))
      else JObject("hello" -> (JInt(1): JValue))
    val reply = runCommand("admin", cmd)
    if (requestCompression)
      zlibNegotiated = reply \ "compression" match {
        case JArray(cs) => cs.contains(JString("zlib"))
        case _ => false
      }
    reply
  }

  private def payloadString(reply: JObject): String = reply \ "payload" match {
    // the Bson decoder surfaces binData as its base64 text
    case JString(b64) => new String(java.util.Base64.getDecoder.decode(b64),
      java.nio.charset.StandardCharsets.UTF_8)
    case other => throw new IOException(s"SASL reply without payload: $other")
  }

  /** SCRAM-SHA-256 authentication (RFC 7677 over MongoDB's
    * saslStart/saslContinue commands) against `authSource` — the auth half
    * of the reference's `_build_conn_string(user, password, authsource)`.
    * Verifies the SERVER's signature too: a server that cannot derive the
    * server key from the stored credentials (a man-in-the-middle replaying
    * a conversation) fails the final check even after our proof is sent.
    * `clientNonce` is injectable for deterministic specs.
    */
  def authenticate(user: String, password: String,
      authSource: String = "admin",
      clientNonce: Option[String] = None): Unit = {
    val cnonce = clientNonce.getOrElse {
      val b = new Array[Byte](18)
      new java.security.SecureRandom().nextBytes(b)
      java.util.Base64.getEncoder.encodeToString(b)
    }
    val bare = Scram.clientFirstBare(user, cnonce)
    val first = runCommand(authSource, JObject(List(
      "saslStart" -> (JInt(1): JValue),
      "mechanism" -> JString("SCRAM-SHA-256"),
      "payload" -> Bson.binary(
        ("n,," + bare).getBytes(java.nio.charset.StandardCharsets.UTF_8)))))
    val conversationId = first \ "conversationId"
    val serverFirst = payloadString(first)
    val sf = Scram.parseServerFirst(serverFirst)
    if (!sf.nonce.startsWith(cnonce))
      throw new IOException("SCRAM server nonce does not extend ours")
    if (sf.iterations < 4096)
      throw new IOException(
        s"SCRAM iteration count ${sf.iterations} below the RFC 7677 minimum")
    val keys = Scram.Keys(Scram.hi(password, sf.salt, sf.iterations))
    val withoutProof = s"c=biws,r=${sf.nonce}"
    val authMessage = s"$bare,$serverFirst,$withoutProof"
    val clientFinal =
      s"$withoutProof,p=${Scram.b64(keys.clientProof(authMessage))}"
    val second = runCommand(authSource, JObject(List(
      "saslContinue" -> (JInt(1): JValue),
      "conversationId" -> conversationId,
      "payload" -> Bson.binary(
        clientFinal.getBytes(java.nio.charset.StandardCharsets.UTF_8)))))
    val expected = s"v=${Scram.b64(keys.serverSignature(authMessage))}"
    val got = payloadString(second)
    if (got != expected)
      throw new IOException(
        "SCRAM server signature mismatch — peer does not hold the credentials")
    // some servers need one empty saslContinue round before done:true
    var done = (second \ "done") == JBool(true)
    var rounds = 0
    while (!done) {
      rounds += 1
      if (rounds > 3) throw new IOException("SASL conversation did not finish")
      val r = runCommand(authSource, JObject(List(
        "saslContinue" -> (JInt(1): JValue),
        "conversationId" -> conversationId,
        "payload" -> Bson.binary(Array.emptyByteArray))))
      done = (r \ "done") == JBool(true)
    }
  }

  def count(db: String, coll: String, filter: JValue): Long = {
    val reply = runCommand(db, JObject(List(
      "count" -> (JString(coll): JValue),
      "query" -> filter)))
    reply \ "n" match {
      case JInt(i) => i.toLong
      case JLong(l) => l
      case JDouble(d) => d.toLong
      case other => throw new IOException(s"count reply without n: $other")
    }
  }

  /** A live server-side cursor: iterate to exhaustion, or `close()` early
    * to killCursors the server-side state (pymongo's `cursor.close()` in
    * the reference's finally-block, tasks.py:252-253).
    */
  final class Cursor private[MongoWireClient] (db: String, coll: String,
      firstReply: JObject, batchSize: Int)
      extends Iterator[String] with AutoCloseable {
    private var cursorId: Long = 0L
    private var batch: Iterator[JValue] = Iterator.empty
    absorb(firstReply, "firstBatch")

    private def absorb(reply: JObject, batchField: String): Unit = {
      val cursor = reply \ "cursor"
      cursorId = cursor \ "id" match {
        case JLong(l) => l
        case JInt(i) => i.toLong
        case other => throw new IOException(s"cursor without id: $other")
      }
      batch = cursor \ batchField match {
        case JArray(docs) => docs.iterator
        case _ => Iterator.empty
      }
    }

    override def hasNext: Boolean = {
      while (!batch.hasNext && cursorId != 0L)
        absorb(runCommand(db, JObject(List(
          "getMore" -> (JLong(cursorId): JValue),
          "collection" -> JString(coll),
          "batchSize" -> JInt(batchSize)))), "nextBatch")
      batch.hasNext
    }

    override def next(): String = {
      if (!hasNext) throw new NoSuchElementException("cursor exhausted")
      JsonMethods.compact(JsonMethods.render(batch.next()))
    }

    /** Abandoning a live cursor releases it server-side. Exhausted
      * cursors (id 0) need nothing.
      */
    override def close(): Unit = if (cursorId != 0L) {
      runCommand(db, JObject(List(
        "killCursors" -> (JString(coll): JValue),
        "cursors" -> JArray(List(JLong(cursorId))))))
      cursorId = 0L
      batch = Iterator.empty
    }
  }

  /** The reference's find shape (tasks.py:241-243): filter + optional
    * single-field sort + optional limit, `batch_size(n)`,
    * `max_time_ms(m)`, `no_cursor_timeout=True`.
    */
  def find(db: String, coll: String, filter: JValue,
      sort: Option[(String, Int)] = None, limit: Option[Long] = None,
      batchSize: Int = 1000, maxTimeMs: Int = 120000,
      noCursorTimeout: Boolean = true): Cursor = {
    val cmd = List(
      "find" -> (JString(coll): JValue),
      "filter" -> filter,
      "batchSize" -> JInt(batchSize),
      "maxTimeMS" -> JInt(maxTimeMs),
      "noCursorTimeout" -> JBool(noCursorTimeout)) ++
      sort.map { case (f, dir) => "sort" -> (JObject(f -> (JInt(dir): JValue)): JValue) } ++
      limit.map(l => "limit" -> (JLong(l): JValue))
    new Cursor(db, coll, runCommand(db, JObject(cmd)), batchSize)
  }
}

/** Replica-set topology discovery — the half of the reference's
  * `_build_conn_string` (minhasaude_mongodb/tasks.py) beyond auth: a
  * conn-string names a SEED LIST, and the driver must find the primary by
  * `hello` (each member reports `isWritablePrimary`, who it believes the
  * `primary` is, and the set's `hosts`), retrying through elections.
  */
object MongoWireClient {

  private[sources] def defaultBackoff(attempt: Int): Unit =
    Thread.sleep(math.min(200L << (attempt - 1), 2000L))

  private def parseHostPort(s: String): Option[(String, Int)] =
    s.lastIndexOf(':') match {
      case -1 => None
      case i => s.substring(i + 1).toIntOption
        // a corrupt hosts/primary entry with an out-of-range port would
        // throw IllegalArgumentException from the socket constructor and
        // abort the whole discovery — drop it here instead
        .filter(p => p > 0 && p <= 65535)
        .map { p =>
          val host = s.substring(0, i)
          // IPv6 members advertise the bracket form "[::1]:27017" — the
          // socket layer wants the bare address, brackets stripped
          val bare =
            if (host.startsWith("[") && host.endsWith("]"))
              host.substring(1, host.length - 1)
            else host
          (bare, p)
        }
    }

  /** Connect to the replica set's PRIMARY: walk the seed list, `hello`
    * each reachable member, follow a secondary's `primary` pointer and
    * learn the set's `hosts` as extra candidates within the same pass;
    * when a pass finds no primary (election in progress, seeds all
    * secondaries/down), back off and retry up to `maxAttempts` passes,
    * then fail LOUDLY listing every member tried. Returns a connected,
    * hello-shaken client pointed at the primary — the connection every
    * write and the reference's extraction reads require.
    */
  def connectPrimary(seeds: Seq[(String, Int)], timeoutMs: Int = 120000,
      maxAttempts: Int = 3, backoff: Int => Unit = defaultBackoff,
      requestCompression: Boolean = false): MongoWireClient = {
    require(seeds.nonEmpty, "empty seed list")
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for (attempt <- 1 to maxAttempts) {
      // per-pass frontier: seeds first, then members discovered via
      // `primary`/`hosts` — a seed list naming only secondaries still
      // reaches the primary in ONE pass
      val seen = scala.collection.mutable.LinkedHashSet.empty[(String, Int)]
      val frontier = scala.collection.mutable.Queue.empty[(String, Int)]
      seeds.foreach { s => if (seen.add(s)) frontier.enqueue(s) }
      while (frontier.nonEmpty) {
        val (h, p) = frontier.dequeue()
        val cli =
          try new MongoWireClient(h, p, timeoutMs)
          catch {
            // IllegalArgumentException: unresolvable/odd host strings the
            // socket layer rejects before IO — a bad member must not
            // abort discovery of the good ones
            case e @ (_: IOException | _: IllegalArgumentException) =>
              failures.update(s"$h:$p", s"connect: ${e.getMessage}")
              null
          }
        if (cli != null) {
          val reply =
            try cli.hello(requestCompression)
            catch {
              // IllegalArgumentException: the BSON codec throws it for
              // reply types it doesn't speak (e.g. a newer server's
              // Decimal128 field) — one odd member must not abort the
              // discovery or leak its socket
              case e @ (_: IOException | _: IllegalArgumentException) =>
                failures.update(s"$h:$p", s"hello: ${e.getMessage}")
                cli.close(); null
            }
          if (reply != null) {
            if ((reply \ "isWritablePrimary") == JBool(true)) return cli
            failures.update(s"$h:$p", "secondary")
            cli.close()
            // who the member believes is primary goes FIRST, then the
            // rest of the set's hosts
            val hinted = (reply \ "primary") match {
              case JString(hp) => parseHostPort(hp).toSeq
              case _ => Nil
            }
            val members = (reply \ "hosts") match {
              case JArray(hs) => hs.collect { case JString(hp) => hp }
                .flatMap(parseHostPort)
              case _ => Nil
            }
            (hinted ++ members).foreach { m =>
              if (seen.add(m)) frontier.enqueue(m)
            }
          }
        }
      }
      if (attempt < maxAttempts) backoff(attempt)
    }
    throw new IOException(
      s"no primary found after $maxAttempts passes; members tried: " +
        failures.map { case (m, why) => s"$m ($why)" }.mkString(", "))
  }
}
