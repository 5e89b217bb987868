package graft.sources

import java.nio.charset.StandardCharsets

/** SCRAM-SHA-256 primitives (RFC 5802/7677) — the auth mechanism MongoDB
  * requires when the reference's connection string carries user/password/
  * authSource (reference: minhasaude_mongodb/tasks.py `_build_conn_string`).
  * Pure JDK crypto (PBKDF2WithHmacSHA256, HmacSHA256, SHA-256), pure
  * functions — the client side lives in [[MongoWireClient.authenticate]],
  * and the spec's in-JVM server verifies proofs with the server-side half
  * of the same math, so the round-trip cross-checks both derivations.
  */
object Scram {

  def sha256(data: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(data)

  def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }

  /** RFC 3454 table B.1 (map-to-nothing): soft hyphen, combining grapheme
    * joiner, Mongolian vowel separator + FVS1-3, zero-width space/joiners,
    * word joiner, variation selectors, BOM. Dropped before normalization.
    */
  private def mapToNothing(c: Char): Boolean = (c: Int) match {
    case 0x00AD | 0x034F | 0x1806 | 0x200B | 0x200C | 0x200D |
         0x2060 | 0xFEFF => true
    case i if i >= 0x180B && i <= 0x180D => true // Mongolian FVS1-3
    case i if i >= 0xFE00 && i <= 0xFE0F => true // variation selectors
    case _ => false
  }

  /** SASLprep (RFC 4013) for passwords: map non-ASCII spaces to SPACE
    * (table C.1.2), drop map-to-nothing characters (B.1), NFKC-normalize,
    * then prohibit control characters (C.2) — the subset a pt-BR
    * deployment's accented passwords need, with the dangerous leftovers
    * (controls) failing loudly instead of silently mis-deriving the key.
    * Accented passwords in composed and decomposed forms derive the SAME
    * salted key, matching what a conforming server stored at account
    * creation.
    */
  def saslPrep(s: String): String = {
    val mapped = s.filterNot(mapToNothing).map { c =>
      if (c != ' ' && Character.getType(c) == Character.SPACE_SEPARATOR) ' '
      else c
    }
    val norm = java.text.Normalizer.normalize(
      mapped, java.text.Normalizer.Form.NFKC)
    // RFC 4013 prohibited output (loud, not silently mis-derived): C.2
    // controls incl. the non-ISO line/paragraph separators, C.3 private
    // use, C.5 surrogates, C.6 inappropriate-for-plain-text, C.8 bidi
    // and deprecated formatting controls, C.9 tagging characters.
    // Evaluated per CODE POINT, not per UTF-16 unit: a paired surrogate is
    // consumed by codePoints() into its supplementary code point, so only a
    // genuinely UNPAIRED surrogate surfaces with type SURROGATE here —
    // valid non-BMP passwords (emoji, CJK Ext B) pass, as RFC 4013 C.5
    // intends.
    def prohibited(cp: Int): Boolean = {
      val t = Character.getType(cp)
      Character.isISOControl(cp) ||
        t == Character.PRIVATE_USE || t == Character.SURROGATE ||
        cp == 0x2028 || cp == 0x2029 ||              // line/para separators
        cp == 0x200E || cp == 0x200F ||              // LRM/RLM
        (cp >= 0x202A && cp <= 0x202E) ||            // bidi embeddings
        (cp >= 0x2066 && cp <= 0x2069) ||            // bidi isolates
        (cp >= 0x206A && cp <= 0x206F) ||            // deprecated format ctl
        (cp >= 0xFFF9 && cp <= 0xFFFD) ||            // interlinear + repl.
        (cp >= 0xE0001 && cp <= 0xE007F)             // C.9 tag characters
    }
    require(!norm.codePoints.anyMatch(cp => prohibited(cp)),
      "SASLprep prohibits control/bidi/private-use characters in " +
        "passwords (RFC 4013 C.2/C.3/C.5/C.6/C.8/C.9)")
    norm
  }

  /** Hi(password, salt, i) = PBKDF2-HMAC-SHA256, 32-byte output. MongoDB
    * applies SASLprep to the password first ([[saslPrep]]), so accented
    * passwords (plausible for a pt-BR deployment) authenticate regardless
    * of the client's composed/decomposed input form.
    */
  def hi(password: String, salt: Array[Byte], iterations: Int): Array[Byte] = {
    val spec = new javax.crypto.spec.PBEKeySpec(
      saslPrep(password).toCharArray, salt, iterations, 256)
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length)
    a.zip(b).map { case (x, y) => (x ^ y).toByte }
  }

  def b64(bytes: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(bytes)

  /** RFC 5802 username escaping: '=' and ',' cannot travel raw. */
  def saslName(user: String): String =
    user.replace("=", "=3D").replace(",", "=2C")

  def clientFirstBare(user: String, clientNonce: String): String =
    s"n=${saslName(user)},r=$clientNonce"

  final case class ServerFirst(nonce: String, salt: Array[Byte],
      iterations: Int)

  /** Parse `r=...,s=...,i=...`; loud on missing/malformed attributes. */
  def parseServerFirst(msg: String): ServerFirst = {
    val attrs = msg.split(",").collect {
      case kv if kv.length >= 2 && kv.charAt(1) == '=' =>
        kv.charAt(0) -> kv.substring(2)
    }.toMap
    ServerFirst(
      attrs.getOrElse('r', throw new IllegalArgumentException(
        s"server-first without r=: $msg")),
      java.util.Base64.getDecoder.decode(attrs.getOrElse('s',
        throw new IllegalArgumentException(s"server-first without s=: $msg"))),
      attrs.getOrElse('i', throw new IllegalArgumentException(
        s"server-first without i=: $msg")).toInt)
  }

  /** Everything derived from the salted password in one place. */
  final case class Keys(saltedPassword: Array[Byte]) {
    val clientKey: Array[Byte] = hmac(saltedPassword, "Client Key")
    val storedKey: Array[Byte] = sha256(clientKey)
    val serverKey: Array[Byte] = hmac(saltedPassword, "Server Key")
    def clientProof(authMessage: String): Array[Byte] =
      xor(clientKey, hmac(storedKey, authMessage))
    def serverSignature(authMessage: String): Array[Byte] =
      hmac(serverKey, authMessage)
  }

  /** SERVER-side proof check (used by the spec's in-JVM server): recover
    * ClientKey = proof XOR ClientSignature and compare H(ClientKey) to the
    * stored key — the server never needs the cleartext client key.
    */
  def verifyClientProof(storedKey: Array[Byte], authMessage: String,
      proof: Array[Byte]): Boolean = {
    val clientKey = xor(proof, hmac(storedKey, authMessage))
    java.security.MessageDigest.isEqual(sha256(clientKey), storedKey)
  }
}
