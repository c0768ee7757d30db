package graft.sources.cdc

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** MySQL connection-phase authentication — the public handshake from
  * the MySQL manual's "Connection Phase" protocol internals, reduced
  * to the pieces a binlog replica needs:
  *
  *  - [[parseHandshakeV10]]: the server greeting (protocol version
  *    10, server version, 20-byte auth nonce split across two fields
  *    with a trailing NUL, capability flags, auth plugin name);
  *  - [[scrambleNative]]: `mysql_native_password` token —
  *    `SHA1(pwd) XOR SHA1(nonce + SHA1(SHA1(pwd)))`;
  *  - [[scrambleCachingSha2]]: `caching_sha2_password` FAST-PATH
  *    token — `SHA256(pwd) XOR SHA256(SHA256(SHA256(pwd)) + nonce)`
  *    (the full-auth fallback needs TLS or the server's RSA key —
  *    the one remaining declared boundary);
  *  - [[handshakeResponse41]]: the client's HandshakeResponse41
  *    payload (CLIENT_PROTOCOL_41 | CLIENT_PLUGIN_AUTH |
  *    CLIENT_SECURE_CONNECTION, utf8 charset, 23-byte filler,
  *    username, length-prefixed auth token, plugin name).
  *
  * Pure byte functions — the feed drives them over its packet framing
  * and the stub server validates the tokens byte-for-byte.
  */
object MySqlAuth {

  final case class HandshakeV10(serverVersion: String, threadId: Int,
                                nonce: Array[Byte], authPlugin: String,
                                capabilities: Int = 0) {
    /** Server offers TLS (CLIENT_SSL capability). */
    def supportsSsl: Boolean = (capabilities & ClientSsl) != 0
  }

  /** Parse a HandshakeV10 greeting payload (not including the packet
    * header). Fails loudly on any other protocol version. */
  def parseHandshakeV10(p: Array[Byte]): HandshakeV10 = {
    require((p(0) & 0xff) == 10, s"unsupported MySQL protocol version ${p(0) & 0xff}")
    var i = 1
    val v0 = i; while (p(i) != 0) i += 1
    val serverVersion = new String(p, v0, i - v0, StandardCharsets.UTF_8)
    i += 1
    val threadId = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
      ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)
    i += 4
    val noncePart1 = java.util.Arrays.copyOfRange(p, i, i + 8)
    i += 8
    i += 1 // filler
    val capsLo = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    i += 2 // capability flags (lower, LE)
    i += 1 // charset
    i += 2 // status flags
    val capsHi = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    i += 2 // capability flags (upper, LE)
    val authDataLen = p(i) & 0xff
    i += 1
    i += 10 // reserved
    // auth-plugin-data-part-2: max(13, authDataLen - 8) bytes, the
    // 20-byte nonce's remainder plus a trailing NUL
    val part2Len = math.max(13, authDataLen - 8)
    val noncePart2 = java.util.Arrays.copyOfRange(p, i, i + math.max(authDataLen - 8 - 1, 12))
    i += part2Len
    val p0 = i; while (i < p.length && p(i) != 0) i += 1
    val plugin = new String(p, p0, i - p0, StandardCharsets.UTF_8)
    HandshakeV10(serverVersion, threadId, noncePart1 ++ noncePart2, plugin,
      capsLo | (capsHi << 16))
  }

  private def sha1(parts: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance("SHA-1"); parts.foreach(md.update); md.digest()
  }
  private def sha256(parts: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance("SHA-256"); parts.foreach(md.update); md.digest()
  }
  private def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    Array.tabulate(a.length)(i => (a(i) ^ b(i)).toByte)

  /** mysql_native_password: SHA1(pwd) XOR SHA1(nonce ++ SHA1(SHA1(pwd))). */
  def scrambleNative(password: String, nonce: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.emptyByteArray
    val pwd1 = sha1(password.getBytes(StandardCharsets.UTF_8))
    xor(pwd1, sha1(nonce, sha1(pwd1)))
  }

  /** caching_sha2_password fast path:
    * SHA256(pwd) XOR SHA256(SHA256(SHA256(pwd)) ++ nonce). */
  def scrambleCachingSha2(password: String, nonce: Array[Byte]): Array[Byte] = {
    if (password.isEmpty) return Array.emptyByteArray
    val pwd1 = sha256(password.getBytes(StandardCharsets.UTF_8))
    xor(pwd1, sha256(sha256(pwd1), nonce))
  }

  /** The token for `plugin` over a 20-byte nonce; unknown plugins fail
    * loudly (silently sending the wrong scramble reads as a bad
    * password server-side — a miserable diagnosis). */
  def scrambleFor(plugin: String, password: String, nonce: Array[Byte]): Array[Byte] =
    plugin match {
      case "mysql_native_password" => scrambleNative(password, nonce.take(20))
      case "caching_sha2_password" => scrambleCachingSha2(password, nonce.take(20))
      case other => throw new IllegalArgumentException(
        s"unsupported MySQL auth plugin '$other' (mysql_native_password / " +
        "caching_sha2_password fast path)")
    }

  // capability bits the replica announces
  private val ClientProtocol41 = 0x00000200
  private val ClientPluginAuth = 0x00080000
  private val ClientSecureConnection = 0x00008000
  /** CLIENT_SSL — the TLS-upgrade capability bit. */
  val ClientSsl = 0x00000800

  private def clientCaps(ssl: Boolean): Int =
    ClientProtocol41 | ClientPluginAuth | ClientSecureConnection |
      (if (ssl) ClientSsl else 0)

  /** HandshakeResponse41 payload: capabilities, max packet, charset,
    * 23-byte filler, user, length-prefixed auth token, plugin name.
    * `ssl` keeps CLIENT_SSL asserted in the post-upgrade response —
    * the full response repeats the SSLRequest's capability word. */
  def handshakeResponse41(user: String, authToken: Array[Byte],
                          plugin: String, ssl: Boolean = false): Array[Byte] = {
    val u = user.getBytes(StandardCharsets.UTF_8)
    val pl = plugin.getBytes(StandardCharsets.UTF_8)
    val b = java.nio.ByteBuffer.allocate(4 + 4 + 1 + 23 + u.length + 1 +
        1 + authToken.length + pl.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(clientCaps(ssl))
    b.putInt(1 << 24) // max packet size
    b.put(45.toByte)  // utf8mb4
    b.put(new Array[Byte](23))
    b.put(u); b.put(0.toByte)
    b.put(authToken.length.toByte); b.put(authToken)
    b.put(pl); b.put(0.toByte)
    b.array()
  }

  /** SSLRequest payload — the 32-byte HandshakeResponse prefix
    * (capabilities with CLIENT_SSL, max packet, charset, 23-byte
    * filler) sent BEFORE the TLS upgrade; the server switches the
    * socket to a handshake on receipt. */
  def sslRequest(): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(32)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(clientCaps(ssl = true))
    b.putInt(1 << 24)
    b.put(45.toByte)
    b.put(new Array[Byte](23))
    b.array()
  }

  /** caching_sha2 full-auth marker bytes (sent/received inside
    * AuthMoreData exchanges). */
  val RequestPublicKey: Byte = 0x02

  /** Parse a PEM `-----BEGIN PUBLIC KEY-----` block into an RSA public
    * key (X.509 SubjectPublicKeyInfo — what the server hands back on a
    * public-key request). */
  def parseRsaPublicKeyPem(pem: String): java.security.PublicKey = {
    val der = java.util.Base64.getMimeDecoder.decode(
      pem.replace("-----BEGIN PUBLIC KEY-----", "")
         .replace("-----END PUBLIC KEY-----", "").trim)
    java.security.KeyFactory.getInstance("RSA")
      .generatePublic(new java.security.spec.X509EncodedKeySpec(der))
  }

  /** caching_sha2 full-auth over a PLAINTEXT channel: the NUL-terminated
    * password XOR'd with the cycling 20-byte nonce, RSA-OAEP(SHA-1)
    * encrypted under the server's public key — the sha2_password
    * sanctioned alternative to sending the plaintext over TLS. */
  def rsaEncryptPassword(password: String, nonce: Array[Byte],
                         publicKeyPem: String): Array[Byte] = {
    val pw = password.getBytes(StandardCharsets.UTF_8)
    val plain = java.util.Arrays.copyOf(pw, pw.length + 1) // trailing NUL
    val n = nonce.take(20)
    val obf = Array.tabulate(plain.length)(i => (plain(i) ^ n(i % n.length)).toByte)
    val c = javax.crypto.Cipher.getInstance("RSA/ECB/OAEPWithSHA-1AndMGF1Padding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE, parseRsaPublicKeyPem(publicKeyPem))
    c.doFinal(obf)
  }

  /** Server-side inverse (the stub's verification half): decrypt and
    * un-XOR back to the NUL-terminated password. */
  def rsaDecryptPassword(encrypted: Array[Byte], nonce: Array[Byte],
                         privateKey: java.security.PrivateKey): String = {
    val c = javax.crypto.Cipher.getInstance("RSA/ECB/OAEPWithSHA-1AndMGF1Padding")
    c.init(javax.crypto.Cipher.DECRYPT_MODE, privateKey)
    val obf = c.doFinal(encrypted)
    val n = nonce.take(20)
    val plain = Array.tabulate(obf.length)(i => (obf(i) ^ n(i % n.length)).toByte)
    require(plain.nonEmpty && plain.last == 0, "rsa full-auth: missing NUL terminator")
    new String(plain, 0, plain.length - 1, StandardCharsets.UTF_8)
  }
}
