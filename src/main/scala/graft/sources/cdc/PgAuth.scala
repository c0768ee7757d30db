package graft.sources.cdc

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** PostgreSQL connection-phase authentication — the public password
  * protocols from the frontend/backend protocol docs (reference
  * connector matrix: debezium-server-dist/pom.xml:359-389), reduced to
  * what a logical-replication client needs:
  *
  *  - [[md5Password]]: the `AuthenticationMD5Password` response —
  *    `"md5" + hex(md5(hex(md5(password ++ user)) ++ salt))`;
  *  - [[ScramSession]]: the SCRAM-SHA-256 / SCRAM-SHA-256-PLUS SASL
  *    exchange (RFC 5802/7677 with PostgreSQL's conventions: empty
  *    `n=` username — the startup user wins). Channel binding is
  *    `tls-server-end-point` (RFC 5929): the binding data is the hash
  *    of the server's end-entity TLS certificate
  *    ([[tlsServerEndPoint]]), carried in the client-final `c=`
  *    attribute — a TLS-terminating MITM presents a different
  *    certificate, computes a different binding, and fails the proof.
  *    The gs2 flag follows libpq: `p=` when binding, `y` when the
  *    client COULD bind but the server offered no -PLUS (so a server
  *    that did advertise it detects the downgrade), `n` off TLS. The
  *    client also VERIFIES the server signature from
  *    `AuthenticationSASLFinal`, so a spoofed server that never knew
  *    the password is detected.
  *
  * Passwords are SASLprep'd (RFC 4013 via [[SaslPrep]]) inside
  * [[saltedPassword]], with PostgreSQL's documented fallback: input
  * that fails the profile is used raw, so credentials derived from
  * the raw bytes keep matching.
  *
  * Pure functions over bytes/strings: [[PgWalSenderFeed]] drives them
  * over the v3 message framing, and the test stub re-derives the same
  * values server-side to validate proofs byte-for-byte.
  */
object PgAuth {

  private def hex(bs: Array[Byte]): String = bs.map(b => f"$b%02x").mkString

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance("MD5"); parts.foreach(md.update); md.digest()
  }

  /** `AuthenticationMD5Password` (type 5) response string. */
  def md5Password(user: String, password: String, salt: Array[Byte]): String = {
    val inner = hex(md5(password.getBytes(StandardCharsets.UTF_8),
      user.getBytes(StandardCharsets.UTF_8)))
    "md5" + hex(md5(inner.getBytes(StandardCharsets.UTF_8), salt))
  }

  // ---- SCRAM-SHA-256 primitives (shared with the verifying stub) ----

  def hmacSha256(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256")); mac.doFinal(data)
  }
  def sha256(data: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(data)

  /** `Hi(Normalize(password), salt, i)` = PBKDF2-HMAC-SHA256 over the
    * SASLprep'd password (RFC 5802 §3; [[SaslPrep.prepareOrRaw]] keeps
    * PostgreSQL's prohibited-input fallback). Identity for ASCII. */
  def saltedPassword(password: String, salt: Array[Byte], iterations: Int): Array[Byte] = {
    val spec = new PBEKeySpec(SaslPrep.prepareOrRaw(password).toCharArray,
      salt, iterations, 256)
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  private def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    Array.tabulate(a.length)(i => (a(i) ^ b(i)).toByte)

  private def utf8(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  /** Parse `k=v,k=v` SCRAM attribute lists (values may contain '='
    * past the first — base64 padding). */
  def attrs(msg: String): Map[Char, String] =
    msg.split(",").iterator.filter(_.length >= 2).map(kv => kv(0) -> kv.drop(2)).toMap

  /** RFC 5929 `tls-server-end-point` channel-binding data: the hash of
    * the server's end-entity certificate, using the certificate's own
    * signature hash with MD5/SHA-1 upgraded to SHA-256 (§4.1). */
  def tlsServerEndPoint(cert: java.security.cert.X509Certificate): Array[Byte] = {
    val sig = cert.getSigAlgName.toUpperCase
    val alg =
      if (sig.contains("RSASSA-PSS")) pssDigest(cert)
      else if (sig.contains("SHA384")) "SHA-384"
      else if (sig.contains("SHA512")) "SHA-512"
      else "SHA-256" // incl. the mandated MD5/SHA-1 upgrade
    MessageDigest.getInstance(alg).digest(cert.getEncoded)
  }

  /** RSASSA-PSS certificates report a bare "RSASSA-PSS" sig alg name —
    * the digest lives in the signature AlgorithmParameters
    * (PSSParameterSpec). An RFC 5929-conformant peer (OpenSSL/libpq)
    * hashes with THAT digest, so defaulting to SHA-256 would break
    * -PLUS channel binding against a SHA-384-PSS chain. Falls back to
    * SHA-256 only when the params are absent/unreadable (which for PSS
    * means the encoder defaulted every field — and the PSS defaults
    * are SHA-1, upgraded to SHA-256 by RFC 5929 §4.1 anyway). */
  private def pssDigest(cert: java.security.cert.X509Certificate): String =
    try {
      val der = cert.getSigAlgParams
      if (der == null) "SHA-256"
      else {
        val ap = java.security.AlgorithmParameters.getInstance("RSASSA-PSS")
        ap.init(der)
        val spec = ap.getParameterSpec(classOf[java.security.spec.PSSParameterSpec])
        spec.getDigestAlgorithm.toUpperCase match {
          case d if d.contains("384") => "SHA-384"
          case d if d.contains("512") => "SHA-512"
          case _ => "SHA-256" // SHA-256 itself, or the SHA-1 default upgraded
        }
      }
    } catch { case scala.util.control.NonFatal(_) => "SHA-256" }

  /** One SCRAM client exchange. `clientNonce` is caller-chosen (the
    * feed uses SecureRandom; specs pass a fixed one).
    * `channelBinding` = the tls-server-end-point data → the -PLUS
    * exchange; `supportsBinding` marks a TLS client that COULD bind
    * but whose server offered no -PLUS (gs2 flag `y`). */
  final case class ScramSession(clientNonce: String,
                                channelBinding: Option[Array[Byte]] = None,
                                supportsBinding: Boolean = false) {
    /** gs2 header: `p=` binding in use / `y` could-but-server-didn't /
      * `n` cannot bind. */
    val gs2Header: String = channelBinding match {
      case Some(_) => "p=tls-server-end-point,,"
      case None => if (supportsBinding) "y,," else "n,,"
    }
    val clientFirstBare: String = s"n=,r=$clientNonce"
    /** `SASLInitialResponse` payload: gs2 header + bare. */
    def clientFirstMessage: String = gs2Header + clientFirstBare

    /** client-final `c=`: base64(gs2 header ++ binding data) — "biws"
      * is literally base64("n,,"), the no-binding degenerate case. */
    private def cAttr: String = Base64.getEncoder.encodeToString(
      utf8(gs2Header) ++ channelBinding.getOrElse(Array.emptyByteArray))

    /** Compute the `SASLResponse` for the server-first-message and the
      * server signature the `AuthenticationSASLFinal` MUST carry.
      * Fails loudly if the server nonce does not extend ours (a replay
      * splice) or the iteration count is non-positive. */
    def clientFinal(password: String, serverFirst: String): (String, String) = {
      val a = attrs(serverFirst)
      val nonce = a.getOrElse('r', throw new IllegalArgumentException(
        s"scram: server-first lacks r=: $serverFirst"))
      require(nonce.startsWith(clientNonce),
        "scram: server nonce does not extend the client nonce (splice?)")
      val salt = Base64.getDecoder.decode(a('s'))
      val iters = a('i').toInt
      require(iters > 0, s"scram: non-positive iteration count $iters")
      val salted = saltedPassword(password, salt, iters)
      val clientKey = hmacSha256(salted, utf8("Client Key"))
      val storedKey = sha256(clientKey)
      val withoutProof = s"c=$cAttr,r=$nonce"
      val authMessage = s"$clientFirstBare,$serverFirst,$withoutProof"
      val proof = xor(clientKey, hmacSha256(storedKey, utf8(authMessage)))
      val serverKey = hmacSha256(salted, utf8("Server Key"))
      val serverSig = Base64.getEncoder.encodeToString(
        hmacSha256(serverKey, utf8(authMessage)))
      (s"$withoutProof,p=${Base64.getEncoder.encodeToString(proof)}", serverSig)
    }
  }

  /** Server-side proof check (what a real server does with its stored
    * `StoredKey`; the stub derives it from the known password). Returns
    * true iff `SHA256(proof XOR HMAC(StoredKey, authMessage)) ==
    * StoredKey`. */
  def verifyClientProof(storedKey: Array[Byte], authMessage: String,
                        proof: Array[Byte]): Boolean = {
    val clientSig = hmacSha256(storedKey, utf8(authMessage))
    java.util.Arrays.equals(sha256(xor(proof, clientSig)), storedKey)
  }
}
