package graft.sources

import graft.SparkSpec
import graft.sources.cdc.{BinlogDecoder, CaptureFactory}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** The MySQL COM_BINLOG_DUMP session over a live localhost socket:
  * real packet framing both ways (request validated byte-for-byte by
  * the stub server), binlog fixtures streamed through BinlogDecoder
  * into the cdc layout, and resume from the persisted replica
  * position across restarts — shrinking the declared MySQL handshake
  * boundary to connection-phase auth only. */
class MySqlDumpFeedSpec extends SparkSpec {

  /** Binlog v4 event with a REAL log_pos header field (the resume
    * contract rides on it; BinlogSpec's fixtures leave it 0). */
  private def event(eventType: Int, logPos: Int)(body: ByteBuffer => Unit): Array[Byte] = {
    val b = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(1767139200); b.put(eventType.toByte); b.putInt(1) // ts, type, server_id
    b.putInt(0); b.putInt(logPos); b.putShort(0) // event_size, log_pos, flags
    body(b)
    val out = new Array[Byte](b.position()); b.flip(); b.get(out); out
  }
  private def uint48(b: ByteBuffer, v: Long): Unit =
    (0 until 6).foreach(i => b.put(((v >> (8 * i)) & 0xff).toByte))
  private def lpStr(b: ByteBuffer, s: String): Unit = {
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    b.put(bytes.length.toByte); b.put(bytes); b.put(0.toByte)
  }
  private val TableId = 0x42L
  // app.items: id LONG (key), v VARCHAR(64)
  private def fde = event(BinlogDecoder.FormatDescription, 0) { b =>
    b.putShort(4); b.put(new Array[Byte](50)); b.putInt(0); b.put(19.toByte)
  }
  private def tableMap(logPos: Int) = event(BinlogDecoder.TableMapEvent, logPos) { b =>
    uint48(b, TableId); b.putShort(0)
    lpStr(b, "app"); lpStr(b, "items")
    b.put(2.toByte)
    b.put(BinlogDecoder.Long_.toByte); b.put(BinlogDecoder.Varchar.toByte)
    b.put(2.toByte); b.putShort(64.toShort)
    b.put(((1 << 2) - 1).toByte) // can-be-null bitmap, 2 cols
  }
  private def insert(logPos: Int, id: Int, v: String) =
    event(BinlogDecoder.WriteRows, logPos) { b =>
      uint48(b, TableId); b.putShort(0)
      b.putShort(2) // v2 extra_data_length
      b.put(2.toByte)
      b.put(((1 << 2) - 1).toByte) // columns present
      b.put(0.toByte) // null bitmap
      b.putInt(id)
      val bytes = v.getBytes(StandardCharsets.UTF_8)
      b.put(bytes.length.toByte); b.put(bytes)
    }

  private def props(db: java.nio.file.Path, srv: StubMySqlBinlogServer) = Map(
    "debezium.source.connector.class" -> "io.debezium.connector.mysql.MySqlConnector",
    "debezium.source.path" -> db.toString,
    "debezium.source.protocol.socket" -> s"localhost:${srv.port}",
    "debezium.source.mysql.binlog.filename" -> "binlog.000007",
    "debezium.source.mysql.server.id" -> "12345",
    "debezium.source.binlog.columns.app.items" -> "id,v",
    "debezium.source.binlog.keys.app.items" -> "id")

  private def drainUntil(t: graft.sources.cdc.ReplicationTailer, n: Int): Int = {
    val deadline = System.nanoTime() + 30e9.toLong
    var written = 0
    while (written < n && System.nanoTime() < deadline) {
      written += t.drainOnce(); Thread.sleep(10)
    }
    written
  }

  test("COM_BINLOG_DUMP session: request framing validated, events decode into the layout, restart resumes by position") {
    val srv = new StubMySqlBinlogServer
    val db = Files.createTempDirectory("graft-mysqldump")
    Files.createDirectories(db.resolve("snapshot"))
    Files.writeString(db.resolve("snapshot/_lsn"), "0")
    try {
      srv.enqueue(fde, tableMap(150), insert(200, 1, "one"),
        tableMap(250), insert(300, 2, "two"))
      val cap = CaptureFactory.fromProperties(props(db, srv))
      val tailer = cap match {
        case CaptureFactory.ProtocolCapture(t) => t
        case other => fail(s"expected ProtocolCapture, got $other")
      }
      assert(drainUntil(tailer, 2) == 2)
      // the stub validated 0x12 + LE fields; a fresh replica starts at 4
      val (pos1, flags1, sid1, fname1) = srv.lastRequest.get
      assert(pos1 == 4L && flags1 == 0 && sid1 == 12345 && fname1 == "binlog.000007")
      tailer.close()

      // restart: a NEW capture resumes from the persisted position
      // (300 = log_pos of the last committed event) — the server
      // re-serves only the position-less FDE, nothing re-decodes
      assert(Files.readString(db.resolve("_binlog_pos")).trim == "300")
      srv.enqueue(tableMap(350), insert(400, 3, "three"))
      val cap2 = CaptureFactory.fromProperties(props(db, srv))
      val tailer2 = cap2 match { case CaptureFactory.ProtocolCapture(t) => t; case o => fail(s"$o") }
      assert(drainUntil(tailer2, 1) == 1)
      val (pos2, _, _, _) = srv.lastRequest.get
      assert(pos2 == 300L, "restart must announce the persisted replica position")
      tailer2.close()

      val batch = spark.read.format("graft-cdc")
        .option("path", db.toString)
        .option("keySchema", "id INT").option("rowSchema", "id INT, v STRING")
        .load()
      import org.apache.spark.sql.functions._
      val rows = batch.filter(col("value.op") === "c").orderBy(col("key.id"))
      assert(rows.count() == 3)
      assert(rows.select(col("value.after.v")).collect().map(_.getString(0)).toSeq
        == Seq("one", "two", "three"))
    } finally srv.close()
  }

  test("connection phase: mysql_native_password and caching_sha2 fast path authenticate; bad password is ERR 1045") {
    // the scramble math itself, against the documented formulas
    val nonce = Array.tabulate(20)(i => (i * 7 + 3).toByte)
    val nat = graft.sources.cdc.MySqlAuth.scrambleNative("s3cret", nonce)
    assert(nat.length == 20) // SHA-1 digest
    val sha2 = graft.sources.cdc.MySqlAuth.scrambleCachingSha2("s3cret", nonce)
    assert(sha2.length == 32) // SHA-256 digest
    assert(!nat.sameElements(graft.sources.cdc.MySqlAuth.scrambleNative("other", nonce)))
    intercept[IllegalArgumentException] {
      graft.sources.cdc.MySqlAuth.scrambleFor("sha256_password", "x", nonce)
    }

    for (plugin <- Seq("mysql_native_password", "caching_sha2_password")) {
      val srv = new StubMySqlBinlogServer
      srv.authMode = Some((plugin, "replica", "s3cret"))
      val db = Files.createTempDirectory(s"graft-mysqlauth-$plugin")
      Files.createDirectories(db.resolve("snapshot"))
      Files.writeString(db.resolve("snapshot/_lsn"), "0")
      try {
        srv.enqueue(fde, tableMap(150), insert(200, 1, "one"))
        // full session: greeting → scrambled response → OK → dump → events
        val feed = new graft.sources.cdc.MySqlBinlogDumpFeed("localhost", srv.port,
          credentials = Some(("replica", "s3cret")))
        val deadline = System.nanoTime() + 30e9.toLong
        var got: Seq[Array[Byte]] = Nil
        while (got.size < 3 && System.nanoTime() < deadline) {
          got = feed.poll(); Thread.sleep(10)
        }
        assert(got.size == 3, s"$plugin: expected 3 events after auth")
        assert(srv.lastAuthUser.get == "replica")
        feed.close()

        // wrong password: the server's ERR 1045 surfaces
        val bad = new graft.sources.cdc.MySqlBinlogDumpFeed("localhost", srv.port,
          credentials = Some(("replica", "wrong")))
        val e = intercept[java.io.IOException] { bad.poll() }
        assert(e.getMessage.contains("1045") && e.getMessage.contains("Access denied"),
          s"$plugin: ${e.getMessage}")
        bad.close()
      } finally srv.close()
    }
  }

  test("TLS: CLIENT_SSL upgrade, caching_sha2 full auth over the channel; downgrades and wrong certs refused") {
    import graft.sources.cdc.{MySqlBinlogDumpFeed, Tls}
    def drain(feed: MySqlBinlogDumpFeed, n: Int): Seq[Array[Byte]] = {
      val deadline = System.nanoTime() + 30e9.toLong
      var got: Seq[Array[Byte]] = Nil
      while (got.size < n && System.nanoTime() < deadline) {
        got = feed.poll(); Thread.sleep(10)
      }
      got
    }
    val srv = new StubMySqlBinlogServer
    srv.tlsContext = Some(TlsTestCerts.primary.context)
    srv.authMode = Some(("caching_sha2_password", "replica", "s3cret"))
    try {
      srv.enqueue(fde, tableMap(150), insert(200, 1, "one"))
      // fast path over TLS: SSLRequest → handshake → HandshakeResponse41
      val fast = new MySqlBinlogDumpFeed("localhost", srv.port,
        credentials = Some(("replica", "s3cret")),
        tls = Tls.Config(Tls.Mode.VerifyFull, Some(TlsTestCerts.primary.certPem)))
      assert(drain(fast, 3).size == 3, "dump stream over TLS (fast path)")
      assert(srv.lastSessionTls.get == true, "session must have upgraded")
      fast.close()

      // cache miss → AuthMoreData 0x04 → plaintext password over TLS → OK
      srv.forceFullAuth = true
      val full = new MySqlBinlogDumpFeed("localhost", srv.port,
        credentials = Some(("replica", "s3cret")),
        tls = Tls.Config(Tls.Mode.VerifyFull, Some(TlsTestCerts.primary.certPem)))
      assert(drain(full, 3).size == 3, "dump stream after FULL auth")
      full.close()

      // full auth with the wrong password: the server's ERR surfaces
      val bad = new MySqlBinlogDumpFeed("localhost", srv.port,
        credentials = Some(("replica", "wrong")),
        tls = Tls.Config(Tls.Mode.Require))
      val e1 = intercept[java.io.IOException] { bad.poll() }
      assert(e1.getMessage.contains("1045"), e1.getMessage)
      bad.close()

      // full auth demanded but the client is NOT on TLS and has not
      // opted into key retrieval: loud refusal (never send a plaintext
      // password over a plaintext socket)
      val plain = new MySqlBinlogDumpFeed("localhost", srv.port,
        credentials = Some(("replica", "s3cret")))
      val e2 = intercept[java.io.IOException] { plain.poll() }
      assert(e2.getMessage.contains("FULL auth"), e2.getMessage)
      plain.close()

      // the RSA key exchange completes full auth over PLAINTEXT when
      // opted in: 0x02 → PEM public key → OAEP(XOR(password, nonce))
      val rsa = new MySqlBinlogDumpFeed("localhost", srv.port,
        credentials = Some(("replica", "s3cret")),
        allowPublicKeyRetrieval = true)
      assert(drain(rsa, 3).size == 3, "dump stream after RSA full auth")
      rsa.close()

      // RSA full auth with the wrong password: server decrypts,
      // compares, rejects
      val rsaBad = new MySqlBinlogDumpFeed("localhost", srv.port,
        credentials = Some(("replica", "wrong")),
        allowPublicKeyRetrieval = true)
      val eRsa = intercept[java.io.IOException] { rsaBad.poll() }
      assert(eRsa.getMessage.contains("1045"), eRsa.getMessage)
      rsaBad.close()

      // a server cert outside the pinned trust anchor is refused
      val badTrust = new MySqlBinlogDumpFeed("localhost", srv.port,
        credentials = Some(("replica", "s3cret")),
        tls = Tls.Config(Tls.Mode.VerifyCa, Some(TlsTestCerts.other.certPem)))
      val e3 = intercept[java.io.IOException] { badTrust.poll() }
      assert(e3.getMessage.contains("mysql tls: handshake refused"), e3.getMessage)
      badTrust.close()
    } finally srv.close()

    // TLS required but the server never advertised CLIENT_SSL: refuse
    // the plaintext downgrade before any credential leaves the client
    val noSsl = new StubMySqlBinlogServer
    noSsl.authMode = Some(("mysql_native_password", "replica", "s3cret"))
    try {
      val feed = new MySqlBinlogDumpFeed("localhost", noSsl.port,
        credentials = Some(("replica", "s3cret")),
        tls = Tls.Config(Tls.Mode.Require))
      val e = intercept[java.io.IOException] { feed.poll() }
      assert(e.getMessage.contains("lacks CLIENT_SSL"), e.getMessage)
      feed.close()
    } finally noSsl.close()
  }

  test("COM_BINLOG_DUMP session: a server ERR packet surfaces with its code and message") {
    val srv = new StubMySqlBinlogServer
    srv.errOnConnect = Some((1236, "Could not find first log file name"))
    try {
      val feed = new graft.sources.cdc.MySqlBinlogDumpFeed("localhost", srv.port)
      val deadline = System.nanoTime() + 30e9.toLong
      var err: Option[java.io.IOException] = None
      while (err.isEmpty && System.nanoTime() < deadline) {
        try { feed.poll(); Thread.sleep(10) }
        catch { case e: java.io.IOException => err = Some(e) }
      }
      assert(err.exists(e => e.getMessage.contains("1236") &&
        e.getMessage.contains("Could not find first log file name")), err.toString)
      feed.close()
    } finally srv.close()
  }
}
