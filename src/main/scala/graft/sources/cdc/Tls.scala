package graft.sources.cdc

import java.io.IOException
import java.net.Socket
import java.nio.file.{Files, Path}
import java.security.KeyStore
import java.security.cert.{CertificateFactory, X509Certificate}
import javax.net.ssl.{SSLContext, SSLParameters, SSLSocket, TrustManager, TrustManagerFactory, X509TrustManager}

/** TLS channel upgrade for the live replication wire feeds — the
  * client half of `sslmode` (PostgreSQL) / `ssl-mode` (MySQL)
  * semantics, built on JSSE only. The reference gets TLS from its
  * JDBC driver stack (debezium-server-dist/pom.xml:359-389 connector
  * matrix); here the feeds speak the wire protocols themselves, so
  * they upgrade their own sockets:
  *
  *  - [[Mode.Require]] — encrypt, do NOT authenticate the server
  *    (PostgreSQL `sslmode=require`: protects against passive
  *    snooping only; the documented posture default);
  *  - [[Mode.VerifyCa]] — verify the server certificate chains to
  *    `rootCert` (`sslmode=verify-ca`);
  *  - [[Mode.VerifyFull]] — verify-ca + hostname endpoint
  *    identification (`sslmode=verify-full`, RFC 6125 rules via
  *    JSSE's HTTPS algorithm).
  *
  * `rootCert` accepts a PEM or DER X.509 file (one or more certs —
  * `CertificateFactory` consumes both encodings); it becomes the ONLY
  * trust anchor, so a server presenting any other chain is refused
  * loudly at handshake. The JVM default trust store backs verify
  * modes when no `rootCert` is given.
  */
object Tls {

  sealed trait Mode
  object Mode {
    case object Disable extends Mode
    case object Require extends Mode
    case object VerifyCa extends Mode
    case object VerifyFull extends Mode

    /** Parse the libpq-style config string, plus the MySQL connector's
      * spellings (`disabled`/`required`/`verify_ca`/`verify_identity`).
      * `prefer`/`allow` are connection-retry policies that make no
      * sense for a replication slot and fail loudly. */
    def parse(s: String): Mode = s.trim.toLowerCase match {
      case "disable" | "disabled" | "" => Disable
      case "require" | "required" => Require
      case "verify-ca" | "verify_ca" => VerifyCa
      case "verify-full" | "verify_identity" => VerifyFull
      case other => throw new IllegalArgumentException(
        s"unsupported sslmode '$other' (disable/require/verify-ca/verify-full)")
    }
  }

  final case class Config(mode: Mode = Mode.Disable,
                          rootCert: Option[Path] = None) {
    def enabled: Boolean = mode != Mode.Disable
  }

  /** Load X.509 certificate(s) from a PEM or DER file. */
  def loadCerts(path: Path): Seq[X509Certificate] = {
    val in = Files.newInputStream(path)
    try {
      val cf = CertificateFactory.getInstance("X.509")
      import scala.jdk.CollectionConverters._
      val certs = cf.generateCertificates(in).asScala.toSeq
        .map(_.asInstanceOf[X509Certificate])
      if (certs.isEmpty) throw new IOException(s"tls: no certificates in $path")
      certs
    } finally in.close()
  }

  /** Trust manager accepting any server chain — ONLY for
    * [[Mode.Require]], which by definition skips authentication. */
  private def trustAll: Array[TrustManager] = Array(new X509TrustManager {
    override def checkClientTrusted(c: Array[X509Certificate], a: String): Unit = ()
    override def checkServerTrusted(c: Array[X509Certificate], a: String): Unit = ()
    override def getAcceptedIssuers: Array[X509Certificate] = Array.empty
  })

  private def trustManagersFor(cfg: Config): Array[TrustManager] = cfg.mode match {
    // libpq semantics: `require` WITH a root cert configured behaves
    // like verify-ca (the pin is honored, not silently dead config) —
    // encrypt-only trust applies only when no CA was pinned.
    case Mode.Require if cfg.rootCert.isEmpty => trustAll
    case _ =>
      cfg.rootCert match {
        case None => null // JVM default trust store
        case Some(p) =>
          val ks = KeyStore.getInstance(KeyStore.getDefaultType)
          ks.load(null, null)
          loadCerts(p).zipWithIndex.foreach { case (c, i) =>
            ks.setCertificateEntry(s"root$i", c)
          }
          val tmf = TrustManagerFactory.getInstance(
            TrustManagerFactory.getDefaultAlgorithm)
          tmf.init(ks)
          tmf.getTrustManagers
      }
  }

  /** Client SSLContext for `cfg` (mode must not be Disable). */
  def clientContext(cfg: Config): SSLContext = {
    require(cfg.enabled, "tls: clientContext on mode=disable")
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, trustManagersFor(cfg), null)
    ctx
  }

  /** Upgrade an already-connected plaintext socket to TLS client-side
    * and complete the handshake; certificate / hostname failures
    * surface as IOException subclasses (SSLHandshakeException). */
  def upgradeClient(socket: Socket, host: String, port: Int,
                    cfg: Config): SSLSocket = {
    val ssl = clientContext(cfg).getSocketFactory
      .createSocket(socket, host, port, true).asInstanceOf[SSLSocket]
    ssl.setUseClientMode(true)
    if (cfg.mode == Mode.VerifyFull) {
      val p = new SSLParameters()
      p.setEndpointIdentificationAlgorithm("HTTPS")
      ssl.setSSLParameters(p)
    }
    ssl.startHandshake()
    ssl
  }

  /** Server SSLContext from a PKCS12 keystore — for in-process stub
    * servers (specs) and any library-hosted TLS endpoint. */
  def serverContext(keystore: Path, storePassword: String): SSLContext = {
    val ks = KeyStore.getInstance("PKCS12")
    val in = Files.newInputStream(keystore)
    try ks.load(in, storePassword.toCharArray) finally in.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, storePassword.toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }
}
