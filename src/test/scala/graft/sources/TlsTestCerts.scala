package graft.sources

import java.nio.file.{Files, Path}
import javax.net.ssl.SSLContext

import graft.sources.cdc.Tls

/** Self-signed localhost certificates for the wire-feed TLS specs,
  * generated once per test JVM with the JDK's keytool (CN=localhost +
  * SAN dns:localhost,ip:127.0.0.1 so `verify-full` hostname checks
  * pass). Two independent identities: a client trusting [[primary]]
  * must REFUSE a server presenting [[other]]. */
object TlsTestCerts {

  final case class ServerIdentity(keystore: Path, certPem: Path) {
    lazy val context: SSLContext = Tls.serverContext(keystore, StorePass)
  }

  private val StorePass = "changeit"
  private lazy val dir: Path = Files.createTempDirectory("graft-tls-certs")

  lazy val primary: ServerIdentity = gen("primary")
  lazy val other: ServerIdentity = gen("other")

  private def gen(name: String): ServerIdentity = {
    val ks = dir.resolve(s"$name.p12")
    val pem = dir.resolve(s"$name.pem")
    exec("keytool", "-genkeypair", "-alias", name, "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "7", "-dname", "CN=localhost",
      "-ext", "SAN=dns:localhost,ip:127.0.0.1",
      "-storetype", "PKCS12", "-keystore", ks.toString,
      "-storepass", StorePass)
    exec("keytool", "-exportcert", "-alias", name, "-keystore", ks.toString,
      "-storepass", StorePass, "-rfc", "-file", pem.toString)
    ServerIdentity(ks, pem)
  }

  private def exec(cmd: String*): Unit = {
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val outBytes = p.getInputStream.readAllBytes()
    val rc = p.waitFor()
    require(rc == 0,
      s"${cmd.head} failed ($rc): ${new String(outBytes).take(500)}")
  }
}
