package graft.sources

import java.io.{DataInputStream, DataOutputStream, IOException}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.CopyOnWriteArrayList
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong, AtomicReference}

/** In-process MySQL binlog-dump server speaking the REAL client/server
  * packet framing ([int24 LE length][int8 seq][payload]) — the
  * loopback stand-in for a mysqld a
  * [[graft.sources.cdc.MySqlBinlogDumpFeed]] session connects to.
  * Validates the COM_BINLOG_DUMP request byte-for-byte (command 0x12,
  * position int32 LE, flags int16 LE, server-id int32 LE, filename to
  * EOF), records it, then serves queued binlog events as OK-prefixed
  * packets — a real server's dump stream. Events whose `log_pos`
  * header field is 0 (format descriptors, fake rotates) are served to
  * every session; positioned events serve only past the requested
  * offset — the server-side half of the resume contract. */
final class StubMySqlBinlogServer extends AutoCloseable {
  private val server = new ServerSocket(0)
  private val queue = new CopyOnWriteArrayList[Array[Byte]]()
  private val stopped = new AtomicBoolean(false)
  /** (requested position, flags, server id, filename) of the last dump request. */
  val lastRequest = new AtomicReference[(Long, Int, Int, String)]((-1L, -1, -1, ""))
  val sessionsServed = new AtomicLong(0L)
  /** When set, every new session answers the dump request with an ERR
    * packet (code, message) instead of a stream. */
  @volatile var errOnConnect: Option[(Int, String)] = None
  /** When set to (plugin, user, password), every session runs the
    * connection phase first: HandshakeV10 greeting with a fixed
    * 20-byte nonce, then the client's HandshakeResponse41 is parsed
    * and its auth token validated byte-for-byte against the plugin's
    * scramble of `password` — OK on match, ERR 1045 otherwise. */
  @volatile var authMode: Option[(String, String, String)] = None
  /** When set, the greeting advertises CLIENT_SSL and a 32-byte
    * SSLRequest response upgrades the session to TLS server-side. */
  @volatile var tlsContext: Option[javax.net.ssl.SSLContext] = None
  /** Emulate a caching_sha2 cache MISS: ignore the scrambled token,
    * demand FULL auth (AuthMoreData 0x04) and validate what the client
    * sends — the plaintext password over TLS, or the RSA-OAEP
    * encrypted password after a public-key request (0x02) over
    * plaintext. */
  @volatile var forceFullAuth: Boolean = false
  /** Server RSA keypair for the plaintext full-auth key exchange. */
  private[sources] lazy val rsaKeys: java.security.KeyPair = {
    val g = java.security.KeyPairGenerator.getInstance("RSA")
    g.initialize(2048); g.generateKeyPair()
  }
  private def publicKeyPem: String =
    "-----BEGIN PUBLIC KEY-----\n" +
      java.util.Base64.getMimeEncoder(64, "\n".getBytes)
        .encodeToString(rsaKeys.getPublic.getEncoded) +
      "\n-----END PUBLIC KEY-----\n"
  val lastAuthUser = new AtomicReference[String]("")
  /** Whether the last session's connection phase ran over TLS. */
  val lastSessionTls = new AtomicReference[java.lang.Boolean](false)
  private[sources] val nonce: Array[Byte] = Array.tabulate(20)(i => (i * 7 + 3).toByte)

  def port: Int = server.getLocalPort
  def enqueue(events: Array[Byte]*): Unit = events.foreach(queue.add)

  private def logPos(e: Array[Byte]): Long =
    if (e.length < 17) 0L
    else (e(13) & 0xffL) | ((e(14) & 0xffL) << 8) | ((e(15) & 0xffL) << 16) |
      ((e(16) & 0xffL) << 24)

  private val acceptThread = new Thread(() => {
    while (!stopped.get()) {
      try {
        val s = server.accept()
        sessionsServed.incrementAndGet()
        val t = new Thread(() => serve(s), "stub-mysql-session")
        t.setDaemon(true); t.start()
      } catch { case _: IOException => () }
    }
  }, "stub-mysql-accept")
  acceptThread.setDaemon(true)
  acceptThread.start()

  private def serve(s0: Socket): Unit = {
    var s = s0
    try {
      s.setTcpNoDelay(true)
      var in = new DataInputStream(s.getInputStream)
      var out = new DataOutputStream(s.getOutputStream)
      def writePacket(seq: Int, payload: Array[Byte]): Unit = {
        out.write(payload.length & 0xff); out.write((payload.length >> 8) & 0xff)
        out.write((payload.length >> 16) & 0xff); out.write(seq & 0xff)
        out.write(payload); out.flush()
      }
      def readPacket(): Array[Byte] = {
        val len = in.read() | (in.read() << 8) | (in.read() << 16)
        in.read() // seq
        val p = new Array[Byte](len); in.readFully(p)
        p
      }
      def errPacket(seq: Int, code: Int, msg: String): Unit = {
        val m = msg.getBytes(StandardCharsets.UTF_8)
        val err = java.nio.ByteBuffer.allocate(3 + m.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        err.put(0xFF.toByte); err.putShort(code.toShort); err.put(m)
        writePacket(seq, err.array())
      }
      lastSessionTls.set(false)
      // connection phase (when configured): greet, validate the
      // client's scrambled token, OK or ERR-and-close
      val authed = authMode match {
        case None => true
        case Some((plugin, user, password)) =>
          // HandshakeV10: proto 10, version, thread id, nonce[0..7], 0,
          // caps, charset, status, caps hi, auth-len, 10 reserved,
          // nonce[8..19] + NUL, plugin name
          val g = java.nio.ByteBuffer.allocate(128)
          g.put(10.toByte)
          g.put("8.0.0-stub".getBytes(StandardCharsets.UTF_8)); g.put(0.toByte)
          g.putInt(Integer.reverseBytes(7)) // thread id (LE)
          g.put(nonce, 0, 8); g.put(0.toByte)
          // caps lower (LE): CLIENT_SSL 0x0800 when TLS is offered
          if (tlsContext.isDefined) { g.put(0x00.toByte); g.put(0x08.toByte) }
          else g.putShort(0)
          g.put(45.toByte); g.putShort(0); g.putShort(0)
          g.put(21.toByte) // auth data len: 20 + NUL
          g.put(new Array[Byte](10))
          g.put(nonce, 8, 12); g.put(0.toByte)
          g.put(plugin.getBytes(StandardCharsets.UTF_8)); g.put(0.toByte)
          writePacket(0, java.util.Arrays.copyOf(g.array(), g.position()))
          // HandshakeResponse41: caps(4) maxpkt(4) charset(1) filler(23)
          // user NUL, token len + token, plugin NUL — OR, first, the
          // 32-byte SSLRequest prefix (caps with CLIENT_SSL) → upgrade
          var r = readPacket()
          val clientCaps = (r(0) & 0xff) | ((r(1) & 0xff) << 8) |
            ((r(2) & 0xff) << 16) | ((r(3) & 0xff) << 24)
          if (r.length == 32 && (clientCaps & 0x0800) != 0) {
            val ctx = tlsContext.getOrElse(
              throw new IOException("stub: client sent SSLRequest but no tlsContext"))
            val ssl = ctx.getSocketFactory
              .createSocket(s, null, s.getPort, true)
              .asInstanceOf[javax.net.ssl.SSLSocket]
            ssl.setUseClientMode(false)
            ssl.startHandshake()
            s = ssl
            in = new DataInputStream(ssl.getInputStream)
            out = new DataOutputStream(ssl.getOutputStream)
            lastSessionTls.set(true)
            r = readPacket() // the real HandshakeResponse41, over TLS
          }
          var i = 4 + 4 + 1 + 23
          val u0 = i; while (r(i) != 0) i += 1
          lastAuthUser.set(new String(r, u0, i - u0, StandardCharsets.UTF_8))
          i += 1
          val tlen = r(i) & 0xff; i += 1
          val token = java.util.Arrays.copyOfRange(r, i, i + tlen)
          if (plugin == "caching_sha2_password" && forceFullAuth) {
            // cache miss: the scramble is unverifiable server-side —
            // demand the plaintext over the encrypted channel, or run
            // the RSA exchange when the client asks for the key
            writePacket(2, Array(0x01.toByte, 0x04.toByte)) // full auth required
            val first = readPacket()
            val plain =
              if (first.length == 1 && first(0) == 0x02) {
                // public-key request → AuthMoreData(0x01) + PEM, then
                // the OAEP-encrypted XOR'd password
                val pem = publicKeyPem.getBytes(StandardCharsets.UTF_8)
                val pkt = new Array[Byte](1 + pem.length)
                pkt(0) = 0x01
                System.arraycopy(pem, 0, pkt, 1, pem.length)
                writePacket(4, pkt)
                val enc = readPacket()
                try graft.sources.cdc.MySqlAuth.rsaDecryptPassword(
                  enc, nonce, rsaKeys.getPrivate)
                catch { case _: Exception => " <decrypt-failed>" }
              } else
                new String(first, 0, math.max(first.length - 1, 0),
                  StandardCharsets.UTF_8)
            if (lastAuthUser.get == user && plain == password) {
              writePacket(6, Array(0x00.toByte, 0x00.toByte, 0x00.toByte)); true
            } else { errPacket(6, 1045, "Access denied"); false }
          } else {
            val expected = graft.sources.cdc.MySqlAuth.scrambleFor(plugin, password, nonce)
            if (lastAuthUser.get != user || !java.util.Arrays.equals(token, expected)) {
              errPacket(2, 1045, "Access denied")
              false
            } else {
              if (plugin == "caching_sha2_password") // AuthMoreData(0x01) wrapping
                writePacket(2, Array(0x01.toByte, 0x03.toByte)) // fast-auth success
              writePacket(if (plugin == "caching_sha2_password") 3 else 2,
                Array(0x00.toByte, 0x00.toByte, 0x00.toByte)) // OK
              true
            }
          }
      }
      if (!authed) { s.close(); return }
      // the dump request
      val len = in.read() | (in.read() << 8) | (in.read() << 16)
      in.read() // seq
      val p = new Array[Byte](len); in.readFully(p)
      require((p(0) & 0xff) == 0x12, f"expected COM_BINLOG_DUMP 0x12, got 0x${p(0) & 0xff}%02x")
      val bb = java.nio.ByteBuffer.wrap(p, 1, len - 1)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val pos = bb.getInt & 0xffffffffL
      val flags = bb.getShort & 0xffff
      val serverId = bb.getInt
      val fname = new String(p, 11, len - 11, StandardCharsets.UTF_8)
      lastRequest.set((pos, flags, serverId, fname))
      errOnConnect match {
        case Some((code, msg)) =>
          val m = msg.getBytes(StandardCharsets.UTF_8)
          val err = java.nio.ByteBuffer.allocate(3 + m.length)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          err.put(0xFF.toByte); err.putShort(code.toShort); err.put(m)
          writePacket(1, err.array())
        case None =>
          var sent = 0
          var seq = 1
          while (!stopped.get() && !s.isClosed) {
            if (sent < queue.size()) {
              val e = queue.get(sent)
              val lp = logPos(e)
              if (lp == 0L || lp > pos) {
                val payload = new Array[Byte](1 + e.length)
                payload(0) = 0 // OK marker before each event
                System.arraycopy(e, 0, payload, 1, e.length)
                writePacket(seq, payload)
                seq += 1
              }
              sent += 1
            } else Thread.sleep(5)
          }
      }
    } catch { case _: IOException => () }
    finally { try s.close() catch { case _: IOException => () } }
  }

  override def close(): Unit = {
    stopped.set(true)
    try server.close() catch { case _: IOException => () }
  }
}
