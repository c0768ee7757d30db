package graft.sources

import graft.SparkSpec
import graft.sources.cdc.{CaptureFactory, PgOutputDecoder, PgWalSenderFeed, ReplicationTailer}
import java.io.IOException
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Live PostgreSQL walsender session over a real localhost socket:
  * v3 startup, all three password protocols (validated byte-for-byte
  * by the stub's real derivations), `START_REPLICATION` with resume
  * from the persisted flush LSN, XLogData → [[PgOutputDecoder]] →
  * the cdc layout, keepalive replies, standby-status-update acks, and
  * the client-side server-signature check that detects a spoofed
  * server. */
class PgWalSenderFeedSpec extends SparkSpec {

  // ---- minimal pgoutput message builders (the PgOutputSpec shapes) ----
  private def msg(f: ByteBuffer => Unit): Array[Byte] = {
    val b = ByteBuffer.allocate(8192); f(b)
    val out = new Array[Byte](b.position()); b.flip(); b.get(out); out
  }
  private def cstr(b: ByteBuffer, s: String): Unit = {
    b.put(s.getBytes(StandardCharsets.UTF_8)); b.put(0.toByte)
  }
  private def tup(b: ByteBuffer, vals: Seq[String]): Unit = {
    b.putShort(vals.size.toShort)
    vals.foreach { v =>
      b.put('t'.toByte)
      val by = v.getBytes(StandardCharsets.UTF_8); b.putInt(by.length); b.put(by)
    }
  }
  private def begin: Array[Byte] = msg { b =>
    b.put('B'.toByte); b.putLong(100L); b.putLong(820454400000000L); b.putInt(9)
  }
  private def rel: Array[Byte] = msg { b =>
    b.put('R'.toByte); b.putInt(55); cstr(b, "inventory"); cstr(b, "customers")
    b.put('d'.toByte); b.putShort(2.toShort)
    b.put(1.toByte); cstr(b, "id"); b.putInt(23); b.putInt(-1)
    b.put(0.toByte); cstr(b, "email"); b.putInt(25); b.putInt(-1)
  }
  private def ins(id: String, email: String): Array[Byte] = msg { b =>
    b.put('I'.toByte); b.putInt(55); b.put('N'.toByte); tup(b, Seq(id, email))
  }
  private def commit: Array[Byte] = msg { b =>
    b.put('C'.toByte); b.put(0.toByte)
    b.putLong(100L); b.putLong(108L); b.putLong(820454400000000L)
  }

  private def newDb() = {
    val db = Files.createTempDirectory("graft-pgwire")
    Files.createDirectories(db.resolve("snapshot"))
    Files.writeString(db.resolve("snapshot/_lsn"), "0")
    db
  }
  private def walLines(db: java.nio.file.Path): Seq[String] = {
    val wal = db.resolve("wal")
    if (!Files.exists(wal)) Nil
    else graft.Fs.children(wal).filter(p => !p.getFileName.toString.startsWith("."))
      .sortBy(_.getFileName.toString)
      .flatMap(p => Files.readAllLines(p).toArray(Array.empty[String]).toSeq)
  }

  test("walsender session: SCRAM auth, stream into the layout, restart resumes from the flushed LSN") {
    val srv = new StubPgWalSenderServer
    srv.authMode = Some(("scram-sha-256", "replica", "s3cret"))
    val db = newDb()
    try {
      srv.enqueue(begin, rel, ins("1", "a@x.com"), commit) // LSNs 1..4
      val posFile = db.resolve("_pg_flushed")
      val feed1 = new PgWalSenderFeed("localhost", srv.port, "inventory", "replica",
        password = Some("s3cret"), slot = "graft", publication = "pub",
        positionFile = Some(posFile))
      val dec1 = new PgOutputDecoder(startLsn = 0)
      val tailer1 = new ReplicationTailer(feed1, dec1.decode, db)
      val deadline = System.nanoTime() + 30e9.toLong
      while (walLines(db).isEmpty && System.nanoTime() < deadline) {
        tailer1.drainOnce(); Thread.sleep(20)
      }
      val lines1 = walLines(db)
      assert(lines1.size == 1, lines1.mkString("\n"))
      assert(lines1.head.contains(""""email":"a@x.com""""))
      assert(srv.lastAuthUser.get == "replica")
      assert(srv.lastStartLsn.get == 0L)
      assert(srv.lastStartCommand.get.contains("""START_REPLICATION SLOT "graft" LOGICAL 0/0"""))
      assert(srv.lastStartCommand.get.contains("""publication_names '"pub"'"""))
      // the commit flushed LSN 4 durably and acked it server-side
      val ackDeadline = System.nanoTime() + 10e9.toLong
      while (srv.confirmedFlush.get < 4 && System.nanoTime() < ackDeadline) Thread.sleep(10)
      assert(srv.confirmedFlush.get == 4L)
      assert(Files.readString(posFile).trim == "4")
      tailer1.close()

      // restart: a NEW feed announces 4 — the server streams only past it
      srv.enqueue(begin, rel, ins("2", "b@x.com"), commit) // LSNs 5..8
      val feed2 = new PgWalSenderFeed("localhost", srv.port, "inventory", "replica",
        password = Some("s3cret"), slot = "graft", publication = "pub",
        positionFile = Some(posFile))
      // resume the decoder past the first envelope's LSN (CdcLayout is
      // package-private; 1 envelope landed → maxLsn is 1)
      val dec2 = new PgOutputDecoder(startLsn = 1L)
      val tailer2 = new ReplicationTailer(feed2, dec2.decode, db)
      val deadline2 = System.nanoTime() + 30e9.toLong
      while (walLines(db).size < 2 && System.nanoTime() < deadline2) {
        tailer2.drainOnce(); Thread.sleep(20)
      }
      val lines2 = walLines(db)
      assert(lines2.size == 2, s"no duplicate of the first insert:\n${lines2.mkString("\n")}")
      assert(lines2.last.contains(""""email":"b@x.com""""))
      assert(srv.lastStartLsn.get == 4L)
      tailer2.close()
    } finally srv.close()
  }

  test("cleartext and md5 password protocols authenticate; a wrong password surfaces ERR 28P01") {
    for (method <- Seq("cleartext", "md5")) {
      val srv = new StubPgWalSenderServer
      srv.authMode = Some((method, "replica", "s3cret"))
      try {
        val good = new PgWalSenderFeed("localhost", srv.port, "db", "replica",
          password = Some("s3cret"))
        assert(good.poll().isEmpty) // session established, nothing queued
        assert(srv.lastStartCommand.get.startsWith("START_REPLICATION"), method)
        good.close()

        val bad = new PgWalSenderFeed("localhost", srv.port, "db", "replica",
          password = Some("wrong"))
        val e = intercept[IOException] { bad.poll() }
        assert(e.getMessage.contains("28P01") &&
          e.getMessage.contains("password authentication failed"), s"$method: ${e.getMessage}")
        bad.close()

        // server demands a password but none is configured
        val none = new PgWalSenderFeed("localhost", srv.port, "db", "replica")
        val e2 = intercept[IOException] { none.poll() }
        assert(e2.getMessage.contains("no password configured"), s"$method: ${e2.getMessage}")
        none.close()
      } finally srv.close()
    }
  }

  test("a spoofed server (bad SASLFinal signature) is refused by the client") {
    val srv = new StubPgWalSenderServer
    srv.authMode = Some(("scram-sha-256", "replica", "s3cret"))
    srv.tamperServerSig = true
    try {
      val feed = new PgWalSenderFeed("localhost", srv.port, "db", "replica",
        password = Some("s3cret"))
      val e = intercept[IOException] { feed.poll() }
      assert(e.getMessage.contains("SERVER signature mismatch"), e.getMessage)
      feed.close()
    } finally srv.close()
  }

  test("START_REPLICATION errors (missing slot) surface with their SQLSTATE") {
    val srv = new StubPgWalSenderServer
    srv.errOnStart = Some(("42704", """replication slot "graft" does not exist"""))
    try {
      val feed = new PgWalSenderFeed("localhost", srv.port, "db", "replica")
      val e = intercept[IOException] { feed.poll() }
      assert(e.getMessage.contains("42704") && e.getMessage.contains("does not exist"),
        e.getMessage)
      feed.close()
    } finally srv.close()
  }

  test("a reply-requested keepalive is answered with a standby status update") {
    val srv = new StubPgWalSenderServer
    srv.keepaliveEvery = 1
    try {
      val feed = new PgWalSenderFeed("localhost", srv.port, "db", "replica")
      val deadline = System.nanoTime() + 10e9.toLong
      while (srv.statusUpdates.get < 1 && System.nanoTime() < deadline) {
        feed.poll(); Thread.sleep(10)
      }
      assert(srv.statusUpdates.get >= 1, "keepalive reply never arrived")
      feed.close()
    } finally srv.close()
  }

  test("TLS: verify-full negotiates and streams encrypted; wrong trust anchor and TLS-less servers are refused loudly") {
    import graft.sources.cdc.Tls
    val srv = new StubPgWalSenderServer
    srv.tlsContext = Some(TlsTestCerts.primary.context)
    srv.authMode = Some(("scram-sha-256", "replica", "s3cret"))
    try {
      srv.enqueue(begin, rel, ins("1", "a@x.com"), commit)
      // verify-full: chain to the pinned root + hostname check, then
      // the whole v3 session (SCRAM included) rides the TLS channel
      val feed = new PgWalSenderFeed("localhost", srv.port, "db", "replica",
        password = Some("s3cret"),
        tls = Tls.Config(Tls.Mode.VerifyFull, Some(TlsTestCerts.primary.certPem)))
      val deadline = System.nanoTime() + 30e9.toLong
      var got: Seq[Array[Byte]] = Nil
      while (got.size < 4 && System.nanoTime() < deadline) {
        got = feed.poll(); Thread.sleep(10)
      }
      assert(got.size == 4, "pgoutput stream over TLS")
      assert(srv.lastSessionTls.get == true, "session must have upgraded")
      // over TLS with -PLUS advertised, the client binds the channel
      assert(srv.lastSaslMech.get == "SCRAM-SHA-256-PLUS",
        s"expected channel-bound SCRAM, got ${srv.lastSaslMech.get}")
      feed.close()

      // a TLS-terminating MITM presents a different certificate, so
      // the honest client's tls-server-end-point binding fails auth
      srv.tamperChannelBinding = true
      val mitm = new PgWalSenderFeed("localhost", srv.port, "db", "replica",
        password = Some("s3cret"),
        tls = Tls.Config(Tls.Mode.Require))
      val eMitm = intercept[IOException] { mitm.poll() }
      assert(eMitm.getMessage.contains("28P01"), eMitm.getMessage)
      mitm.close()
      srv.tamperChannelBinding = false

      // require: encrypt without authentication — works with no root cert
      val req = new PgWalSenderFeed("localhost", srv.port, "db", "replica",
        password = Some("s3cret"), tls = Tls.Config(Tls.Mode.Require))
      val deadline2 = System.nanoTime() + 30e9.toLong
      var got2: Seq[Array[Byte]] = Nil
      while (got2.size < 4 && System.nanoTime() < deadline2) {
        got2 = req.poll(); Thread.sleep(10)
      }
      assert(got2.size == 4)
      req.close()

      // a server presenting a cert outside the pinned trust anchor is
      // refused at handshake — never reaches authentication
      val badTrust = new PgWalSenderFeed("localhost", srv.port, "db", "replica",
        password = Some("s3cret"),
        tls = Tls.Config(Tls.Mode.VerifyCa, Some(TlsTestCerts.other.certPem)))
      val e = intercept[IOException] { badTrust.poll() }
      assert(e.getMessage.contains("pg tls: handshake refused"), e.getMessage)
      badTrust.close()

      // libpq semantics: require WITH a pinned root cert is verify-ca,
      // not dead configuration — the wrong anchor still refuses
      val reqPinned = new PgWalSenderFeed("localhost", srv.port, "db", "replica",
        password = Some("s3cret"),
        tls = Tls.Config(Tls.Mode.Require, Some(TlsTestCerts.other.certPem)))
      val eReq = intercept[IOException] { reqPinned.poll() }
      assert(eReq.getMessage.contains("pg tls: handshake refused"), eReq.getMessage)
      reqPinned.close()
    } finally srv.close()

    // sslmode=require against a TLS-less server: loud refusal, never a
    // silent plaintext downgrade
    val plainSrv = new StubPgWalSenderServer
    try {
      val feed = new PgWalSenderFeed("localhost", plainSrv.port, "db", "replica",
        tls = Tls.Config(Tls.Mode.Require))
      val e = intercept[IOException] { feed.poll() }
      assert(e.getMessage.contains("declined SSLRequest"), e.getMessage)
      feed.close()
    } finally plainSrv.close()
  }

  test("CaptureFactory dispatches protocol.pgwire to a live walsender session end-to-end (over sslmode=verify-full)") {
    val srv = new StubPgWalSenderServer
    srv.authMode = Some(("scram-sha-256", "replica", "s3cret"))
    srv.tlsContext = Some(TlsTestCerts.primary.context)
    val db = newDb()
    try {
      srv.enqueue(begin, rel, ins("7", "z@x.com"), commit)
      val c = CaptureFactory.fromProperties(Map(
        "debezium.source.connector.class" -> "io.debezium.connector.postgresql.PostgresConnector",
        "debezium.source.path" -> db.toString,
        "debezium.source.topic.prefix" -> "testc",
        "debezium.source.protocol.pgwire" -> s"localhost:${srv.port}",
        "debezium.source.database.dbname" -> "inventory",
        "debezium.source.database.user" -> "replica",
        "debezium.source.database.password" -> "s3cret",
        "debezium.source.database.sslmode" -> "verify-full",
        "debezium.source.database.sslrootcert" -> TlsTestCerts.primary.certPem.toString,
        "debezium.source.slot.name" -> "graft",
        "debezium.source.publication.name" -> "pub"))
      val CaptureFactory.ProtocolCapture(tailer) = c: @unchecked
      val deadline = System.nanoTime() + 30e9.toLong
      while (walLines(db).isEmpty && System.nanoTime() < deadline) {
        tailer.drainOnce(); Thread.sleep(20)
      }
      val lines = walLines(db)
      assert(lines.size == 1, lines.mkString("\n"))
      assert(lines.head.contains(""""destination":"testc.inventory.customers""""))
      assert(lines.head.contains(""""email":"z@x.com""""))
      tailer.close()
    } finally srv.close()
  }
}
