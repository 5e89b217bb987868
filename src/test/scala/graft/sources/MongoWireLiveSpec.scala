package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException}
import java.net.ServerSocket
import java.nio.{ByteBuffer, ByteOrder}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.json4s._
import org.scalatest.funsuite.AnyFunSuite

/** LIVE wire-protocol Mongo extraction: an in-JVM socket server speaks
  * real OP_MSG frames (BSON bodies, request/response ids, cursor state
  * with getMore/killCursors) and the [[MongoWireClient]] +
  * [[MongoSliceReader.extractAll]] stack drives the reference's whole
  * slice/flush/reconcile flow against it — slice-union ≡ collection over
  * actual OP_MSG bytes.
  */
class MongoWireLiveSpec extends AnyFunSuite {


  private def doc(id: Int, v: Long): JObject = JObject(List(
    "_id" -> JString(f"doc$id%05d"), "val" -> JLong(v),
    "payload" -> JObject(List("n" -> JInt(id)))))

  // 260 docs with val 0..square-wave so slice boundaries land ON values
  private val store: Seq[JObject] =
    (0 until 260).map(i => doc(i, (i / 2).toLong))

  test("hello handshake + count over real OP_MSG bytes") {
    val srv = new FakeMongo(store)
    val cli = new MongoWireClient("localhost", srv.port)
    try {
      val h = cli.hello()
      assert((h \ "maxWireVersion") == JInt(17))
      assert(cli.count("db", "coll", JObject()) == 260L)
      assert(cli.count("db", "coll",
        JObject("val" -> (JObject("$lte" -> (JLong(9L): JValue)): JValue))) == 20L)
    } finally { cli.close(); srv.stop() }
  }

  test("slice-union ≡ collection over the wire: extremes, slices, getMore " +
    "paging, flush dedup, ±5% reconciliation") {
    val srv = new FakeMongo(store)
    val cli = new MongoWireClient("localhost", srv.port)
    try {
      val landed = scala.collection.mutable.ArrayBuffer.empty[String]
      val results = MongoSliceReader.extractAll(cli, "db", "coll",
        baseQuery = None, sliceVar = "val", sliceSize = 40,
        flush = batch => landed ++= batch, batchSize = 16,
        flushThreshold = 50)
      // every doc landed exactly once after cross-slice _id dedup
      val ids = landed.map(d =>
        (org.json4s.jackson.JsonMethods.parse(d) \ "_id") match {
          case JString(s) => s
          case other => fail(s"no _id in $other")
        })
      assert(ids.distinct.size == 260)
      // boundary values intentionally land in two slices: sent > 260 but
      // within the ±5% reconciliation (which extractAll already enforced)
      assert(results.map(_.sent).sum >= 260)
      // batchSize 16 over 80+-doc slices forces REAL getMore paging
      assert(srv.getMores.get() > 0)
      // every cursor was drained or killed — no server-side leaks
      assert(srv.openCursors == 0)
    } finally { cli.close(); srv.stop() }
  }

  test("sort+limit extremes over the wire match the store") {
    val srv = new FakeMongo(store)
    val cli = new MongoWireClient("localhost", srv.port)
    try {
      assert(MongoSliceReader.extremeValue(cli, "db", "coll", None, "val", 1)
        .contains(0L))
      assert(MongoSliceReader.extremeValue(cli, "db", "coll", None, "val", -1)
        .contains(129L))
      // with a base query the extremes narrow
      val base = Some("""{"val":{"$gte":50,"$lte":60}}""")
      assert(MongoSliceReader.extremeValue(cli, "db", "coll", base, "val", 1)
        .contains(50L))
    } finally { cli.close(); srv.stop() }
  }

  test("early close kills the live cursor server-side") {
    val srv = new FakeMongo(store)
    val cli = new MongoWireClient("localhost", srv.port)
    try {
      val cursor = cli.find("db", "coll", JObject(), batchSize = 10)
      assert(cursor.hasNext)
      cursor.next()
      assert(srv.openCursors == 1)
      cursor.close()
      assert(srv.killCursors.get() == 1 && srv.openCursors == 0)
      // closing an exhausted cursor is a no-op
      val small = cli.find("db", "coll",
        JObject("_id" -> (JString("doc00001"): JValue)), batchSize = 10)
      assert(small.size == 1)
      small.close()
      assert(srv.killCursors.get() == 1)
    } finally { cli.close(); srv.stop() }
  }

  test("datetime slice variable: bounds travel as BSON type 0x09 and the " +
    "type-bracketing server matches them; sliceSize is in days") {
    // 120 docs across 6 days, Date-typed ts field — the reference's
    // primary minhasaude shape (tasks.py slices datetimes by timedelta)
    val day0 = 1723600000000L - (1723600000000L % 86400000L)
    val dateStore = (0 until 120).map { i =>
      JObject(List("_id" -> JString(f"d$i%05d"),
        "ts" -> Bson.date(day0 + (i / 20).toLong * 86400000L + i * 1000L),
        "v" -> JInt(i)))
    }
    val srv = new FakeMongo(dateStore)
    val cli = new MongoWireClient("localhost", srv.port)
    try {
      // extremes come back typed
      val lo = MongoSliceReader.typedExtreme(cli, "db", "coll", None, "ts", 1)
      assert(lo.contains(MongoSliceReader.Extreme(day0, isDate = true)))
      // sliceSize = 2 DAYS over a 5-day span → 3 slices, every doc landed
      val landed = scala.collection.mutable.ArrayBuffer.empty[String]
      val results = MongoSliceReader.extractAll(cli, "db", "coll", None,
        "ts", sliceSize = 2, batch => landed ++= batch, batchSize = 16)
      assert(results.size == 3)
      val ids = landed.map(d =>
        (org.json4s.jackson.JsonMethods.parse(d) \ "_id")).distinct
      assert(ids.size == 120)
      // the doc JSON keeps the typed sentinel, so downstream re-encoding
      // of any landed value stays a Date
      assert(landed.head.contains("\"$date\""))
    } finally { cli.close(); srv.stop() }
  }

  test("DATE-ONLY datetime collection (all docs at midnight): day slices " +
    "are half-open, so boundary cohorts extract exactly ONCE and the ±5% " +
    "reconciliation holds") {
    // the reference's common shape: a 'data' field holding pure dates —
    // every doc sits exactly ON a slice boundary when stepping by days
    val day0 = 1723600000000L - (1723600000000L % 86400000L)
    val dateStore = (0 until 150).map { i =>
      JObject(List("_id" -> JString(f"m$i%05d"),
        "d" -> Bson.date(day0 + (i % 5).toLong * 86400000L)))
    }
    val srv = new FakeMongo(dateStore)
    val cli = new MongoWireClient("localhost", srv.port)
    try {
      val landed = scala.collection.mutable.ArrayBuffer.empty[String]
      // inclusive-both-ends day slices would send ~2x here and trip the
      // reconciliation; the half-open datetime path sends each doc once
      val results = MongoSliceReader.extractAll(cli, "db", "coll", None,
        "d", sliceSize = 1, batch => landed ++= batch, batchSize = 16)
      assert(results.map(_.sent).sum == 150)
      assert(landed.map(d =>
        (org.json4s.jackson.JsonMethods.parse(d) \ "_id")).distinct.size == 150)
    } finally { cli.close(); srv.stop() }
  }

  test("numeric bounds against a Date-keyed collection drain zero docs " +
    "(type bracketing) — the failure mode the typed sentinel prevents") {
    val day0 = 1723600000000L
    val dateStore = (0 until 10).map(i => JObject(List(
      "_id" -> JString(s"d$i"), "ts" -> Bson.date(day0 + i))))
    val srv = new FakeMongo(dateStore)
    val cli = new MongoWireClient("localhost", srv.port)
    try {
      val numericFilter = JObject("ts" -> (JObject(
        "$gte" -> (JLong(0L): JValue),
        "$lte" -> (JLong(Long.MaxValue / 2): JValue)): JValue))
      assert(cli.count("db", "coll", numericFilter) == 0L)
      val dateFilter = JObject("ts" -> (JObject(
        "$gte" -> (Bson.date(day0): JValue),
        "$lte" -> (Bson.date(day0 + 9): JValue)): JValue))
      assert(cli.count("db", "coll", dateFilter) == 10L)
    } finally { cli.close(); srv.stop() }
  }

  test("Bson encode guards: oversized JInt and lossy JDecimal fail loudly; " +
    "$date round-trips as type 0x09") {
    intercept[IllegalArgumentException](Bson.encodeDoc(
      JObject("x" -> (JInt(BigInt(2).pow(80)): JValue))))
    intercept[IllegalArgumentException](Bson.encodeDoc(
      JObject("x" -> (JDecimal(BigDecimal("0.1")): JValue))))
    // exactly-representable decimals still encode
    val ok = Bson.decodeDoc(ByteBuffer.wrap(Bson.encodeDoc(
      JObject("x" -> (JDecimal(BigDecimal("1.5")): JValue)))))
    assert((ok \ "x") == JDouble(1.5))
    val rt = Bson.decodeDoc(ByteBuffer.wrap(Bson.encodeDoc(
      JObject("ts" -> (Bson.date(1723600000000L): JValue)))))
    assert((rt \ "ts") == Bson.date(1723600000000L))
    // the encoded type byte IS 0x09, not a nested document
    val bytes = Bson.encodeDoc(JObject("t" -> (Bson.date(1L): JValue)))
    assert((bytes(4) & 0xff) == 0x09)
  }

  test("SASLprep: composed and decomposed accented passwords derive the " +
    "same key and authenticate over the wire") {
    val composed = "pen\u00e7il"        // precomposed c-cedilla
    val decomposed = "pen\u0063\u0327il" // c + combining cedilla
    assert(composed != decomposed)
    assert(Scram.saslPrep(composed) == Scram.saslPrep(decomposed))
    assert(Scram.hi(composed, "salt0123".getBytes, 256)
      .sameElements(Scram.hi(decomposed, "salt0123".getBytes, 256)))
    // non-ASCII space maps to SPACE; zero-width chars drop out
    assert(Scram.saslPrep("a\u00a0b") == "a b")
    assert(Scram.saslPrep("a\u200bb") == "ab")
    intercept[IllegalArgumentException](Scram.saslPrep("a\u0007b"))
    // RFC 4013 prohibits more than ISO controls: bidi overrides and
    // line separators must fail LOUDLY, not silently mis-derive the key
    intercept[IllegalArgumentException](Scram.saslPrep("a\u202eb"))
    intercept[IllegalArgumentException](Scram.saslPrep("a\u2028b"))
    intercept[IllegalArgumentException](Scram.saslPrep("a\ue000b"))
    // RFC 4013 C.5 prohibits only UNPAIRED surrogates: a valid non-BMP
    // password (emoji U+1F600, CJK Ext B U+20021) that a conforming server
    // accepted at account creation must pass the client-side prep too
    assert(Scram.saslPrep("a\ud83d\ude00b") == "a\ud83d\ude00b") // \ud83d\ude00
    assert(Scram.saslPrep("a\ud840\udc21b") == "a\ud840\udc21b")
    // an unpaired surrogate half still fails loudly
    intercept[IllegalArgumentException](Scram.saslPrep("a\ud83db"))
    // supplementary-plane private use (plane 15/16) stays prohibited
    intercept[IllegalArgumentException](Scram.saslPrep(
      "a" + new String(Character.toChars(0xF0000)) + "b"))
    // over the wire: server stored the composed form, client types the
    // decomposed form — auth still succeeds
    val srv = new FakeMongo(store, credentials = Some("svc" -> composed))
    val cli = new MongoWireClient("localhost", srv.port)
    try {
      cli.authenticate("svc", decomposed, clientNonce = Some("CNONCE123"))
      assert(cli.count("db", "coll", JObject()) == 260L)
    } finally { cli.close(); srv.stop() }
  }

  private def deadPort(): Int = {
    val ss = new ServerSocket(0)
    val p = ss.getLocalPort
    ss.close()
    p
  }

  test("primary discovery: a seed list of [dead, secondary] follows the " +
    "secondary's primary pointer to the writable member") {
    val pri = new FakeMongo(store)
    val sec = new FakeMongo(store, role0 = "secondary",
      primaryHint = () => Some(s"localhost:${pri.port}"))
    try {
      val cli = MongoWireClient.connectPrimary(
        Seq(("localhost", deadPort()), ("localhost", sec.port)),
        backoff = _ => ())
      try {
        // the returned client IS the primary connection: data flows
        assert(cli.count("db", "coll", JObject()) == 260L)
        assert((cli.hello() \ "isWritablePrimary") == JBool(true))
      } finally cli.close()
    } finally { pri.stop(); sec.stop() }
  }

  test("primary discovery: no primary pointer, but the set's hosts list " +
    "reaches it in the same pass") {
    val pri = new FakeMongo(store)
    lazy val members: Seq[String] =
      Seq(s"localhost:${sec.port}", s"localhost:${pri.port}")
    lazy val sec: FakeMongo = new FakeMongo(store, role0 = "secondary",
      hostsList = () => members)
    try {
      val cli = MongoWireClient.connectPrimary(
        Seq(("localhost", sec.port)), backoff = _ => ())
      try assert(cli.count("db", "coll", JObject()) == 260L)
      finally cli.close()
    } finally { pri.stop(); sec.stop() }
  }

  test("failover: an election in progress (no primary on pass 1) resolves " +
    "after backoff when a member is promoted") {
    val a = new FakeMongo(store, role0 = "secondary")
    val b = new FakeMongo(store, role0 = "secondary")
    val backoffs = new AtomicInteger(0)
    try {
      val cli = MongoWireClient.connectPrimary(
        Seq(("localhost", a.port), ("localhost", b.port)),
        maxAttempts = 3,
        backoff = { _ => backoffs.incrementAndGet(); b.role = "primary" })
      try {
        assert(backoffs.get() == 1, "one failed pass, then the promotion")
        assert(cli.count("db", "coll", JObject()) == 260L)
      } finally cli.close()
    } finally { a.stop(); b.stop() }
  }

  test("no primary anywhere is a LOUD failure naming every member tried") {
    val a = new FakeMongo(store, role0 = "secondary")
    try {
      val e = intercept[java.io.IOException](
        MongoWireClient.connectPrimary(
          Seq(("localhost", a.port), ("localhost", deadPort())),
          maxAttempts = 2, backoff = _ => ()))
      assert(e.getMessage.contains("no primary found"))
      assert(e.getMessage.contains(s"localhost:${a.port} (secondary)"))
      assert(e.getMessage.contains("connect:"))
    } finally a.stop()
  }

  test("SCRAM-SHA-256 Keys math reproduces the RFC 7677 test vector") {
    // RFC 7677 §3: user "user", password "pencil"
    val cnonce = "rOprNGfwEbeRWgbNEkqO"
    val bare = Scram.clientFirstBare("user", cnonce)
    assert(bare == "n=user,r=rOprNGfwEbeRWgbNEkqO")
    val serverFirst = "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
      "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
    val sf = Scram.parseServerFirst(serverFirst)
    assert(sf.iterations == 4096)
    val keys = Scram.Keys(Scram.hi("pencil", sf.salt, sf.iterations))
    val withoutProof = s"c=biws,r=${sf.nonce}"
    val authMessage = s"$bare,$serverFirst,$withoutProof"
    assert(Scram.b64(keys.clientProof(authMessage)) ==
      "dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
    assert(Scram.b64(keys.serverSignature(authMessage)) ==
      "6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
    // server-side half verifies the same proof
    assert(Scram.verifyClientProof(keys.storedKey, authMessage,
      keys.clientProof(authMessage)))
  }

  test("SCRAM auth over the wire: data commands gated, unlock after authenticate") {
    val srv = new FakeMongo(store, credentials = Some("svc" -> "s3cr3t"))
    val cli = new MongoWireClient("localhost", srv.port)
    try {
      // unauthenticated data commands are rejected by the server
      val denied = intercept[java.io.IOException](
        cli.count("db", "coll", JObject()))
      assert(denied.getMessage.contains("requires authentication"))
      // the full SCRAM conversation over real OP_MSG bytes
      cli.authenticate("svc", "s3cr3t", clientNonce = Some("CNONCE123"))
      assert(cli.count("db", "coll", JObject()) == 260L)
      // the whole sliced extraction now runs on the authed connection
      val landed = scala.collection.mutable.ArrayBuffer.empty[String]
      MongoSliceReader.extractAll(cli, "db", "coll", None, "val", 64,
        batch => landed ++= batch, batchSize = 32)
      assert(landed.nonEmpty)
    } finally { cli.close(); srv.stop() }
  }

  test("SCRAM: wrong password and wrong user fail loudly") {
    val srv = new FakeMongo(store, credentials = Some("svc" -> "s3cr3t"))
    val cli = new MongoWireClient("localhost", srv.port)
    try {
      val badPw = intercept[java.io.IOException](
        cli.authenticate("svc", "WRONG", clientNonce = Some("CNONCE123")))
      assert(badPw.getMessage.contains("Authentication failed"))
      val badUser = intercept[java.io.IOException](
        cli.authenticate("nobody", "s3cr3t", clientNonce = Some("CNONCE123")))
      assert(badUser.getMessage.contains("Authentication failed"))
    } finally { cli.close(); srv.stop() }
  }

  test("SCRAM: a peer that cannot prove credential possession is rejected " +
    "even after accepting our proof") {
    val srv = new FakeMongo(store, credentials = Some("svc" -> "s3cr3t"),
      corruptServerSignature = true)
    val cli = new MongoWireClient("localhost", srv.port)
    try {
      val e = intercept[java.io.IOException](
        cli.authenticate("svc", "s3cr3t", clientNonce = Some("CNONCE123")))
      assert(e.getMessage.contains("server signature mismatch"))
    } finally { cli.close(); srv.stop() }
  }

  test("OP_COMPRESSED: zlib negotiated via hello, whole extraction rides " +
    "compressed frames both ways") {
    val srv = new FakeMongo(store)
    val cli = new MongoWireClient("localhost", srv.port)
    try {
      val h = cli.hello(requestCompression = true)
      assert((h \ "compression") == JArray(List(JString("zlib"))))
      // post-negotiation data commands travel compressed BOTH ways
      assert(cli.count("db", "coll", JObject()) == 260L)
      assert(srv.compressedIn.get() >= 1 && srv.compressedOut.get() >= 1)
      val before = srv.compressedIn.get()
      val landed = scala.collection.mutable.ArrayBuffer.empty[String]
      MongoSliceReader.extractAll(cli, "db", "coll", None, "val", 40,
        batch => landed ++= batch, batchSize = 16, flushThreshold = 50)
      assert(landed.map(d =>
        (org.json4s.jackson.JsonMethods.parse(d) \ "_id")).distinct.size == 260)
      // finds + getMores all rode OP_COMPRESSED
      assert(srv.compressedIn.get() > before)
    } finally { cli.close(); srv.stop() }
  }

  test("OP_COMPRESSED: a server that declines zlib gets plain OP_MSG only") {
    val srv = new FakeMongo(store)
    val cli = new MongoWireClient("localhost", srv.port)
    try {
      val h = cli.hello() // no compression requested -> server echoes none
      assert((h \ "compression") == JNothing)
      assert(cli.count("db", "coll", JObject()) == 260L)
      assert(srv.compressedIn.get() == 0 && srv.compressedOut.get() == 0)
    } finally { cli.close(); srv.stop() }
  }

  test("a command failure (ok:0) surfaces the server errmsg") {
    val srv = new FakeMongo(store)
    val cli = new MongoWireClient("localhost", srv.port)
    try {
      val e = intercept[java.io.IOException](
        cli.runCommand("db", JObject("frobnicate" -> (JInt(1): JValue))))
      assert(e.getMessage.contains("no such command"))
    } finally { cli.close(); srv.stop() }
  }

  test("BSON codec round-trip (property): arbitrary nested documents of " +
    "the command subset survive encode/decode bit-exactly") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genKey = Gen.choose(1, 8)
      .flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    def genValue(depth: Int): Gen[JValue] = {
      val scalars = Gen.oneOf[JValue](
        Gen.chooseNum(Int.MinValue, Int.MaxValue).map(i => JInt(BigInt(i))),
        Gen.chooseNum(Long.MinValue, Long.MaxValue).map(JLong(_)),
        Gen.chooseNum(-1e9, 1e9).map(JDouble(_)),
        Gen.asciiPrintableStr.map(JString(_)),
        Gen.oneOf(JBool(true), JBool(false), JNull))
      if (depth <= 0) scalars
      else Gen.frequency(
        6 -> scalars,
        1 -> Gen.listOfN(2, genValue(depth - 1)).map(JArray(_)),
        1 -> genDoc(depth - 1).map(d => d: JValue))
    }
    def genDoc(depth: Int): Gen[JObject] =
      Gen.listOfN(3, Gen.zip(genKey, genValue(depth)))
        .map(fs => JObject(fs.distinctBy(_._1)))
    val prop = Prop.forAll(genDoc(3)) { doc =>
      Bson.decodeDoc(ByteBuffer.wrap(Bson.encodeDoc(doc))
        .order(ByteOrder.LITTLE_ENDIAN)) == doc
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("BSON codec round-trips the command subset; decodes server extras") {
    val nested = JObject(List(
      "a" -> JInt(1), "big" -> JLong(1L << 40), "s" -> JString("héllo—ç"),
      "d" -> JDouble(1.5), "f" -> JBool(false), "n" -> JNull,
      "o" -> JObject(List("x" -> JArray(List(JInt(1), JString("y")))))))
    val buf = ByteBuffer.wrap(Bson.encodeDoc(nested))
    assert(Bson.decodeDoc(buf) == nested)
    // handcrafted ObjectId (0x07) + UTC datetime (0x09) elements
    val body = new java.io.ByteArrayOutputStream()
    body.write(0x07); body.write("oid".getBytes); body.write(0)
    body.write((1 to 12).map(_.toByte).toArray)
    body.write(0x09); body.write("ts".getBytes); body.write(0)
    body.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(1723600000000L).array())
    val full = new java.io.ByteArrayOutputStream()
    full.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(4 + body.size() + 1).array())
    body.writeTo(full); full.write(0)
    val decoded = Bson.decodeDoc(ByteBuffer.wrap(full.toByteArray))
    assert((decoded \ "oid") == JString("0102030405060708090a0b0c"))
    assert((decoded \ "ts") == Bson.date(1723600000000L))
  }
}


/** Minimal OP_MSG server over a doc store: find (equality + $gte/$lte
  * ranges, single-field sort, limit, batchSize), getMore, killCursors,
  * count, hello; with `credentials`, a real SCRAM-SHA-256 verifier
  * (salted-key math via the server-side half of [[Scram]]) gating every
  * data command per connection. Thread-per-connection; counters for
  * assertions.
  */
private[sources] final class FakeMongo(docs: Seq[JObject],
    credentials: Option[(String, String)] = None,
    corruptServerSignature: Boolean = false,
    role0: String = "primary",
    primaryHint: () => Option[String] = () => None,
    hostsList: () => Seq[String] = () => Nil) {
  // mutable so a failover spec can promote a secondary between passes
  @volatile var role: String = role0
  val server = new ServerSocket(0)
  val finds = new AtomicInteger(0)
  val getMores = new AtomicInteger(0)
  val killCursors = new AtomicInteger(0)
  private val cursorIds = new AtomicLong(1000L)
  // remaining docs per live cursor (Seq + splitAt: a Vector ITERATOR
  // truncates itself under take, silently losing the tail)
  private val cursors = new ConcurrentHashMap[Long, Seq[JObject]]()
  def openCursors: Int = cursors.size()

  private def num(v: JValue): Option[Double] = typed(v).map(_._1)

  // (value, isDate): like real MongoDB, comparisons TYPE-BRACKET — a Date
  // field never compares against an int64 bound, so a client that sends
  // numeric bounds for a datetime slice var drains zero docs (the bug
  // class the ADVICE flagged; a purely numeric fake could not catch it)
  private def typed(v: JValue): Option[(Double, Boolean)] = v match {
    case JInt(i) => Some((i.toDouble, false))
    case JLong(l) => Some((l.toDouble, false))
    case JDouble(d) => Some((d, false))
    case JObject(("$date", JLong(ms)) :: Nil) => Some((ms.toDouble, true))
    case JObject(("$date", JInt(ms)) :: Nil) => Some((ms.toDouble, true))
    case _ => None
  }

  private def matches(doc: JObject, filter: JObject): Boolean =
    filter.obj.forall { case (k, cond) =>
      val v = doc \ k
      cond match {
        case o: JObject if o.obj.exists(f => f._1.startsWith("$")) =>
          o.obj.forall {
            case ("$gte", bound) => (typed(v), typed(bound)) match {
              case (Some((a, at)), Some((b, bt))) => at == bt && a >= b
              case _ => false
            }
            case ("$lte", bound) => (typed(v), typed(bound)) match {
              case (Some((a, at)), Some((b, bt))) => at == bt && a <= b
              case _ => false
            }
            case ("$lt", bound) => (typed(v), typed(bound)) match {
              case (Some((a, at)), Some((b, bt))) => at == bt && a < b
              case _ => false
            }
            case (op, _) => sys.error(s"fake server: unsupported operator $op")
          }
        case other => v == other
      }
    }

  private val scramSalt = "0123456789abcdef".getBytes("US-ASCII")
  private val scramIters = 4096

  private final class ConnState {
    var authenticated: Boolean = credentials.isEmpty
    var convo: Option[(String, String)] = None // (clientFirstBare, serverFirst)
    var zlib: Boolean = false
  }

  val compressedIn = new AtomicInteger(0)
  val compressedOut = new AtomicInteger(0)

  // independent zlib helpers (not the client's): the spec cross-checks
  // two implementations interoperating over the wire
  private def zDeflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }
  private def zInflate(data: Array[Byte], n: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new Array[Byte](n)
    var off = 0
    while (off < n && !inf.finished()) {
      val k = inf.inflate(out, off, n - off)
      assert(k > 0 || !inf.needsInput(), "truncated zlib payload")
      off += k
    }
    inf.end(); out
  }

  private def b64d(s: String) = java.util.Base64.getDecoder.decode(s)
  private def payloadText(cmd: JObject): String = cmd \ "payload" match {
    case JString(b64) => new String(b64d(b64), "UTF-8")
    case other => sys.error(s"SASL command without payload: $other")
  }

  private def authError(msg: String) = JObject(List(
    "ok" -> JDouble(0.0), "errmsg" -> JString(msg), "code" -> JInt(18)))

  private def handle(cmd: JObject, conn: ConnState): JObject = cmd.obj.head._1 match {
    case "hello" =>
      // echo zlib back iff the client advertised it — the negotiation
      val negotiated = cmd \ "compression" match {
        case JArray(cs) if cs.contains(JString("zlib")) =>
          conn.zlib = true
          List("compression" -> (JArray(List(JString("zlib"))): JValue))
        case _ => Nil
      }
      val roleFields: List[(String, JValue)] =
        if (role == "primary") List("isWritablePrimary" -> JBool(true))
        else List[(String, JValue)]("isWritablePrimary" -> JBool(false),
          "secondary" -> JBool(true)) ++
          primaryHint().map(h => "primary" -> (JString(h): JValue)).toList
      val hostFields: List[(String, JValue)] = hostsList() match {
        case Nil => Nil
        case hs => List("hosts" -> JArray(hs.map(JString(_): JValue).toList))
      }
      JObject(roleFields ++ hostFields ++
        List[(String, JValue)]("maxWireVersion" -> JInt(17)) ++
        negotiated :+ ("ok" -> (JDouble(1.0): JValue)))
    case "saslStart" =>
      val (user, password) = credentials.getOrElse(
        sys.error("saslStart against a no-auth fake"))
      assert((cmd \ "mechanism") == JString("SCRAM-SHA-256"))
      val clientFirst = payloadText(cmd)
      assert(clientFirst.startsWith("n,,"), clientFirst)
      val bare = clientFirst.drop(3)
      if (!bare.startsWith(s"n=${Scram.saslName(user)},"))
        authError("Authentication failed.")
      else {
        val cnonce = bare.split(",").collectFirst {
          case kv if kv.startsWith("r=") => kv.drop(2) }.get
        val serverFirst = s"r=${cnonce}SNONCE99," +
          s"s=${Scram.b64(scramSalt)},i=$scramIters"
        conn.convo = Some((bare, serverFirst))
        val _ = password
        JObject(List("conversationId" -> JInt(1), "done" -> JBool(false),
          "payload" -> Bson.binary(serverFirst.getBytes("UTF-8")),
          "ok" -> JDouble(1.0)))
      }
    case "saslContinue" =>
      val (_, password) = credentials.getOrElse(
        sys.error("saslContinue against a no-auth fake"))
      val text = payloadText(cmd)
      if (text.isEmpty) // final empty round after done
        JObject(List("conversationId" -> JInt(1), "done" -> JBool(true),
          "payload" -> Bson.binary(Array.emptyByteArray),
          "ok" -> JDouble(1.0)))
      else conn.convo match {
        case None => authError("No SASL conversation in progress")
        case Some((bare, serverFirst)) =>
          val attrs = text.split(",").collect {
            case kv if kv.length >= 2 && kv.charAt(1) == '=' =>
              kv.charAt(0) -> kv.substring(2)
          }.toMap
          val withoutProof = s"c=${attrs('c')},r=${attrs('r')}"
          val authMessage = s"$bare,$serverFirst,$withoutProof"
          // server-side verification: recover ClientKey from the proof,
          // hash, compare to the stored key — real SCRAM math
          val keys = Scram.Keys(Scram.hi(password, scramSalt, scramIters))
          if (!Scram.verifyClientProof(keys.storedKey, authMessage,
              b64d(attrs('p'))))
            authError("Authentication failed.")
          else {
            conn.authenticated = true
            val sig = if (corruptServerSignature) "Zm9yZ2VkIHNpZw=="
              else Scram.b64(keys.serverSignature(authMessage))
            JObject(List("conversationId" -> JInt(1),
              "done" -> JBool(true),
              "payload" -> Bson.binary(s"v=$sig".getBytes("UTF-8")),
              "ok" -> JDouble(1.0)))
          }
      }
    case c @ ("find" | "getMore" | "count" | "killCursors")
        if !conn.authenticated =>
      JObject(List("ok" -> JDouble(0.0),
        "errmsg" -> JString(s"command $c requires authentication"),
        "code" -> JInt(13)))
    case "count" =>
      val filter = cmd \ "query" match { case o: JObject => o; case _ => JObject() }
      JObject(List("n" -> JInt(docs.count(matches(_, filter))),
        "ok" -> JDouble(1.0)))
    case "find" =>
      finds.incrementAndGet()
      val filter = cmd \ "filter" match { case o: JObject => o; case _ => JObject() }
      val batchSize = num(cmd \ "batchSize").map(_.toInt).getOrElse(101)
      var selected = docs.filter(matches(_, filter))
      cmd \ "sort" match {
        case JObject((field, dir) :: Nil) =>
          val d = num(dir).getOrElse(1.0)
          selected = selected.sortBy(doc =>
            num(doc \ field).getOrElse(Double.NaN))
          if (d < 0) selected = selected.reverse
        case _ => ()
      }
      num(cmd \ "limit").map(_.toLong).filter(_ > 0)
        .foreach(l => selected = selected.take(l.toInt))
      val (first, rest) = selected.splitAt(batchSize)
      val id = if (rest.nonEmpty) {
        val cid = cursorIds.incrementAndGet()
        cursors.put(cid, rest)
        cid
      } else 0L
      JObject(List("cursor" -> JObject(List(
        "id" -> JLong(id), "ns" -> JString("db.coll"),
        "firstBatch" -> JArray(first.toList.map(d => d: JValue)))),
        "ok" -> JDouble(1.0)))
    case "getMore" =>
      getMores.incrementAndGet()
      val cid = num(cmd \ "getMore").map(_.toLong).getOrElse(0L)
      val batchSize = num(cmd \ "batchSize").map(_.toInt).getOrElse(101)
      Option(cursors.get(cid)) match {
        case None => JObject(List("ok" -> JDouble(0.0),
          "errmsg" -> JString(s"cursor id $cid not found"),
          "code" -> JInt(43)))
        case Some(remaining) =>
          val (batch, rest) = remaining.splitAt(batchSize)
          val id = if (rest.nonEmpty) { cursors.put(cid, rest); cid }
            else { cursors.remove(cid); 0L }
          JObject(List("cursor" -> JObject(List(
            "id" -> JLong(id), "ns" -> JString("db.coll"),
            "nextBatch" -> JArray(batch.toList.map(d => d: JValue)))),
            "ok" -> JDouble(1.0)))
      }
    case "killCursors" =>
      killCursors.incrementAndGet()
      val killed = cmd \ "cursors" match {
        case JArray(ids) => ids.flatMap(num).map(_.toLong)
          .filter(id => cursors.remove(id) != null)
        case _ => Nil
      }
      JObject(List("cursorsKilled" -> JArray(killed.map(JLong(_): JValue)),
        "ok" -> JDouble(1.0)))
    case other => JObject(List("ok" -> JDouble(0.0),
      "errmsg" -> JString(s"no such command: '$other'"), "code" -> JInt(59)))
  }

  private val thread = new Thread(() => {
    try while (!server.isClosed) {
      val sock = server.accept()
      new Thread(() => {
        val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
        val out = new BufferedOutputStream(sock.getOutputStream)
        val conn = new ConnState
        try while (true) {
          val lenB = new Array[Byte](4)
          in.readFully(lenB)
          val len = ByteBuffer.wrap(lenB).order(ByteOrder.LITTLE_ENDIAN).getInt()
          val rest = new Array[Byte](len - 4)
          in.readFully(rest)
          var buf = ByteBuffer.wrap(rest).order(ByteOrder.LITTLE_ENDIAN)
          val requestId = buf.getInt()
          buf.getInt() // responseTo
          val opCode = buf.getInt()
          var wasCompressed = false
          if (opCode == 2012) { // OP_COMPRESSED: unwrap
            wasCompressed = true
            compressedIn.incrementAndGet()
            assert(buf.getInt() == 2013, "compressed frame must wrap OP_MSG")
            val uncompressed = buf.getInt()
            assert((buf.get() & 0xff) == 2, "client negotiated zlib")
            val payload = new Array[Byte](buf.remaining())
            buf.get(payload)
            buf = ByteBuffer.wrap(zInflate(payload, uncompressed))
              .order(ByteOrder.LITTLE_ENDIAN)
          } else assert(opCode == 2013, "client must speak OP_MSG")
          assert(buf.getInt() == 0, "client must not set flag bits")
          assert((buf.get() & 0xff) == 0, "client must send a kind-0 section")
          val cmd = Bson.decodeDoc(buf)
          val reply = Bson.encodeDoc(handle(cmd, conn))
          // reply compressed iff the request came compressed (the
          // server-side mirror of the negotiation)
          if (wasCompressed && conn.zlib) {
            compressedOut.incrementAndGet()
            val inner = ByteBuffer.allocate(4 + 1 + reply.length)
              .order(ByteOrder.LITTLE_ENDIAN)
            inner.putInt(0); inner.put(0.toByte); inner.put(reply)
            val z = zDeflate(inner.array())
            val hdr = ByteBuffer.allocate(16 + 9 + z.length)
              .order(ByteOrder.LITTLE_ENDIAN)
            hdr.putInt(16 + 9 + z.length)
            hdr.putInt(requestId + 100000)
            hdr.putInt(requestId)
            hdr.putInt(2012)
            hdr.putInt(2013)
            hdr.putInt(inner.array().length)
            hdr.put(2.toByte)
            hdr.put(z)
            out.write(hdr.array()); out.flush()
          } else {
            val hdr = ByteBuffer.allocate(16 + 4 + 1).order(ByteOrder.LITTLE_ENDIAN)
            hdr.putInt(16 + 4 + 1 + reply.length)
            hdr.putInt(requestId + 100000) // server's own id
            hdr.putInt(requestId)          // responseTo = client's request
            hdr.putInt(2013)
            hdr.putInt(0)
            hdr.put(0.toByte)
            out.write(hdr.array()); out.write(reply); out.flush()
          }
        } catch { case _: EOFException | _: java.net.SocketException => () }
        finally sock.close()
      }).start()
    } catch { case _: java.net.SocketException => () }
  })
  thread.setDaemon(true)
  thread.start()
  def port: Int = server.getLocalPort
  def stop(): Unit = server.close()
}
