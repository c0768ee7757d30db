package graft.sources.cdc

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, IOException}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}

/** [[ReplicationFeed]] speaking the real MySQL client/server wire
  * protocol for a binlog dump session — connection phase AND command
  * phase. With `credentials` set, the session authenticates first:
  * HandshakeV10 greeting → HandshakeResponse41 carrying the plugin's
  * scrambled token ([[MySqlAuth]] — `mysql_native_password` and
  * `caching_sha2_password`) → OK/ERR.
  *
  * TLS ([[Tls.Config]]): the greeting is always plaintext; when the
  * server's capability word carries CLIENT_SSL and `tls` is enabled,
  * the client answers with the 32-byte SSLRequest packet
  * ([[MySqlAuth.sslRequest]]) and upgrades the socket before sending
  * the full HandshakeResponse41 over the encrypted channel. A server
  * WITHOUT the capability under an enabled `tls` mode is refused
  * loudly (no silent plaintext downgrade). caching_sha2's FULL-auth
  * fallback (AuthMoreData 0x04 — every cache-miss first connection to
  * a MySQL 8 account) answers with the plaintext password over the
  * TLS channel; over a PLAINTEXT channel it performs the RSA
  * public-key exchange when `allowPublicKeyRetrieval` opts in
  * (request key → PEM → OAEP-encrypted XOR'd password — JDBC's flag
  * of the same name and caveat), and fails loudly otherwise.
  * Everything here is the public protocol from
  * the MySQL manual's "Connection Phase" / "Replication Protocol"
  * internals:
  *
  *  - every packet is `[int24 LE payload-length][int8 sequence-id]
  *    [payload]`;
  *  - the dump request payload is `0x12` (COM_BINLOG_DUMP), binlog
  *    position int32 LE, flags int16 LE (0 = block at log end),
  *    server-id int32 LE (this client's replica id), then the binlog
  *    filename to EOF;
  *  - the server answers with a packet per binlog event: payload =
  *    `0x00` (OK) + the raw event bytes (v4 header + body — fed to
  *    [[BinlogDecoder]] unchanged); `0xFF` is an ERR packet (code
  *    int16 LE + message — raised to the caller); `0xFE` (EOF, short
  *    packet) ends a non-blocking dump and is skipped.
  *
  * Resume: MySQL has no server-held client position (unlike a
  * replication slot) — the replica announces its own binlog position
  * in the dump request. [[commit]] therefore records the `log_pos`
  * header field (bytes 13-16 LE, the event's END offset) of the last
  * delivered event, persists it to `positionFile` (restart-safe), and
  * a reconnect requests exactly from there. Position 4 = start of the
  * binlog (after the 4-byte magic). At-least-once: un-committed
  * events re-serve after reconnect; events with `log_pos` 0
  * (synthetic/fake events — real servers send a fake ROTATE the same
  * way) never advance the position.
  *
  * Bounded memory mirrors [[SocketReplicationFeed]]: past `maxPending`
  * un-acked events the drain stops and the TCP window back-pressures
  * the server; draining resumes after commit. (16 MB packet splitting
  * is not implemented — row events larger than one packet are out of
  * fixture scope and fail loudly on the frame-length guard.)
  */
final class MySqlBinlogDumpFeed(host: String, port: Int,
                                binlogFilename: String = "binlog.000001",
                                serverId: Int = 65535,
                                connectTimeoutMs: Int = 5000,
                                maxPending: Int = 65536,
                                positionFile: Option[Path] = None,
                                /** Connection-phase credentials. None
                                  * = skip the handshake (a pre-auth'd
                                  * or auth-less session — what the
                                  * dump-only stub serves). */
                                credentials: Option[(String, String)] = None,
                                tls: Tls.Config = Tls.Config(),
                                /** caching_sha2 full auth WITHOUT TLS:
                                  * fetch the server's RSA public key
                                  * and send the OAEP-encrypted
                                  * password (JDBC's
                                  * allowPublicKeyRetrieval). Off by
                                  * default — key retrieval over
                                  * plaintext trusts the network for
                                  * the key's authenticity. */
                                allowPublicKeyRetrieval: Boolean = false)
    extends ReplicationFeed {
  require(maxPending > 0, "maxPending must be positive")
  require(!tls.enabled || credentials.nonEmpty,
    "mysql tls: the SSLRequest rides the connection phase — configure credentials")

  private var socket: Socket = _
  private var in: DataInputStream = _
  private var out: DataOutputStream = _
  private var pending = Vector.empty[Array[Byte]]
  private var pendingEndPos = 0L
  /** Committed binlog position — what the next dump request announces. */
  private var pos: Long =
    positionFile.filter(Files.exists(_))
      .map(f => Files.readString(f).trim.toLong).getOrElse(4L)

  /** The committed binlog position (resume point). */
  def committedPosition: Long = pos

  private def ensureConnected(): Unit = if (socket == null) {
    val s = new Socket()
    s.connect(new InetSocketAddress(host, port), connectTimeoutMs)
    s.setTcpNoDelay(true)
    in = new DataInputStream(new BufferedInputStream(s.getInputStream))
    out = new DataOutputStream(new BufferedOutputStream(s.getOutputStream))
    socket = s
    pending = Vector.empty; pendingEndPos = pos
    // connection phase: HandshakeV10 greeting → HandshakeResponse41
    // with the plugin's scrambled token → OK/ERR (MySqlAuth; the
    // remaining boundary is TLS / caching_sha2 full re-auth)
    credentials.foreach { case (user, password) =>
      val (greetSeq, greeting) = readPacket()
      val hs = MySqlAuth.parseHandshakeV10(greeting)
      val token = MySqlAuth.scrambleFor(hs.authPlugin, password, hs.nonce)
      var respSeq = greetSeq + 1
      if (tls.enabled) {
        if (!hs.supportsSsl) {
          teardown()
          throw new IOException(
            "mysql tls: server lacks CLIENT_SSL but ssl mode requires TLS " +
            "(refusing the plaintext downgrade)")
        }
        writePacket(respSeq, MySqlAuth.sslRequest())
        respSeq += 1
        // NonFatal, not just IOException: a malformed sslrootcert
        // throws CertificateException from context construction — the
        // socket must still tear down with the mysql-tls context
        val ssl = try Tls.upgradeClient(s, host, port, tls)
          catch { case scala.util.control.NonFatal(e) =>
            teardown()
            throw new IOException(s"mysql tls: handshake refused (${e.getMessage})", e)
          }
        socket = ssl
        in = new DataInputStream(new BufferedInputStream(ssl.getInputStream))
        out = new DataOutputStream(new BufferedOutputStream(ssl.getOutputStream))
      }
      writePacket(respSeq,
        MySqlAuth.handshakeResponse41(user, token, hs.authPlugin, ssl = tls.enabled))
      val (replySeq, reply) = readPacket()
      (reply(0) & 0xff) match {
        case 0x00 => () // OK — authenticated
        case 0x01 => // AuthMoreData — caching_sha2's status wrapper:
          // second byte 0x03 = fast-auth success (OK packet follows),
          // 0x04 = full auth required
          (reply(1) & 0xff) match {
            case 0x03 =>
              val (_, ok) = readPacket()
              if ((ok(0) & 0xff) != 0x00) throw new IOException(
                "mysql auth: expected OK after fast-auth success")
            case 0x04 =>
              def expectOk(): Unit = {
                val (_, fin) = readPacket()
                (fin(0) & 0xff) match {
                  case 0x00 => () // OK — full auth accepted
                  case 0xFF =>
                    val code = (fin(1) & 0xff) | ((fin(2) & 0xff) << 8)
                    val msg = new String(fin, 3, fin.length - 3, StandardCharsets.UTF_8)
                    teardown()
                    throw new IOException(s"mysql auth: full-auth ERR $code: $msg")
                  case other => teardown(); throw new IOException(
                    f"mysql auth: unexpected full-auth reply marker 0x$other%02x")
                }
              }
              if (tls.enabled) {
                // full auth: plaintext password + NUL over the TLS channel
                val pw = password.getBytes(StandardCharsets.UTF_8)
                writePacket(replySeq + 1, java.util.Arrays.copyOf(pw, pw.length + 1))
                expectOk()
              } else if (allowPublicKeyRetrieval) {
                // full auth over plaintext: request the server's RSA
                // public key, send OAEP(XOR(password+NUL, nonce))
                writePacket(replySeq + 1, Array(MySqlAuth.RequestPublicKey))
                val (keySeq, keyPkt) = readPacket()
                if ((keyPkt(0) & 0xff) != 0x01) {
                  teardown()
                  throw new IOException(
                    f"mysql auth: expected AuthMoreData public key, got 0x${keyPkt(0) & 0xff}%02x")
                }
                val pem = new String(keyPkt, 1, keyPkt.length - 1, StandardCharsets.UTF_8)
                writePacket(keySeq + 1,
                  MySqlAuth.rsaEncryptPassword(password, hs.nonce, pem))
                expectOk()
              } else {
                teardown()
                throw new IOException(
                  "mysql auth: server requested caching_sha2 FULL auth — configure " +
                  "TLS (Tls.Config), or allowPublicKeyRetrieval for the RSA key " +
                  "exchange, or use a cached-credentials account")
              }
            case other => teardown(); throw new IOException(
              f"mysql auth: unexpected AuthMoreData status 0x$other%02x")
          }
        case 0xFF =>
          val code = (reply(1) & 0xff) | ((reply(2) & 0xff) << 8)
          val msg = new String(reply, 3, reply.length - 3, StandardCharsets.UTF_8)
          teardown()
          throw new IOException(s"mysql auth: server ERR $code: $msg")
        case other => teardown(); throw new IOException(
          f"mysql auth: unexpected reply marker 0x$other%02x")
      }
    }
    // COM_BINLOG_DUMP at the committed position
    val fname = binlogFilename.getBytes(StandardCharsets.UTF_8)
    val payload = java.nio.ByteBuffer.allocate(11 + fname.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    payload.put(0x12.toByte)
    payload.putInt(pos.toInt)
    payload.putShort(0) // flags: 0 = block at end of log
    payload.putInt(serverId)
    payload.put(fname)
    writePacket(0, payload.array())
  }

  private def writePacket(seq: Int, payload: Array[Byte]): Unit = {
    out.write(payload.length & 0xff)
    out.write((payload.length >> 8) & 0xff)
    out.write((payload.length >> 16) & 0xff)
    out.write(seq & 0xff)
    out.write(payload)
    out.flush()
  }

  /** Blocking read of one whole packet → (sequence id, payload). Used
    * by the connection phase, where the protocol is strictly
    * request/response (the dump stream uses the non-blocking drain). */
  private def readPacket(): (Int, Array[Byte]) = {
    val len = in.read() | (in.read() << 8) | (in.read() << 16)
    val seq = in.read()
    require(len >= 1 && len <= MaxPacketBytes, s"mysql: insane packet length $len")
    val payload = new Array[Byte](len)
    in.readFully(payload)
    (seq, payload)
  }

  /** Non-blocking packet probe: a timed 1-byte read under SO_TIMEOUT
    * (reset before the packet body). `available()` is useless on an
    * SSLSocket (reports only already-decrypted bytes), so the drain
    * probes instead. */
  private def packetReady(): Boolean = {
    in.mark(1)
    socket.setSoTimeout(PollProbeMs)
    val first = try in.read()
      catch { case _: java.net.SocketTimeoutException => -2 }
    if (first == -1) throw new IOException("mysql: connection closed")
    if (first < 0) false
    else { in.reset(); socket.setSoTimeout(FrameTimeoutMs); true }
  }

  override def poll(): Seq[Array[Byte]] = {
    try {
      ensureConnected()
      while (pending.size < maxPending && packetReady()) {
        val len = in.read() | (in.read() << 8) | (in.read() << 16)
        in.read() // sequence id — informational on this path
        require(len >= 1 && len <= MaxPacketBytes,
          s"mysql dump: insane packet length $len — stream desynced")
        val payload = new Array[Byte](len)
        in.readFully(payload)
        (payload(0) & 0xff) match {
          case 0x00 =>
            val event = java.util.Arrays.copyOfRange(payload, 1, len)
            pending :+= event
            // log_pos: bytes 13-16 LE of the v4 header = event end offset
            if (event.length >= 17) {
              val lp = (event(13) & 0xffL) | ((event(14) & 0xffL) << 8) |
                ((event(15) & 0xffL) << 16) | ((event(16) & 0xffL) << 24)
              if (lp > pendingEndPos) pendingEndPos = lp
            }
          case 0xFF =>
            val code = (payload(1) & 0xff) | ((payload(2) & 0xff) << 8)
            val msg = new String(payload, 3, len - 3, StandardCharsets.UTF_8)
            teardown()
            throw new IOException(s"mysql dump: server ERR $code: $msg")
          case 0xFE => () // EOF of a non-blocking dump — skip
          case other => throw new IOException(
            f"mysql dump: unexpected packet marker 0x$other%02x")
        }
      }
      pending
    } catch {
      case e: IOException => teardown(); throw e
    }
  }

  override def commit(): Unit = if (pending.nonEmpty) {
    pos = pendingEndPos
    pending = Vector.empty
    // durable BEFORE continuing: a crash after this point resumes at
    // the new position; a crash before re-serves (at-least-once)
    positionFile.foreach { f =>
      val tmp = f.resolveSibling("." + f.getFileName.toString + ".tmp")
      Files.writeString(tmp, pos.toString)
      Files.move(tmp, f, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def teardown(): Unit = if (socket != null) {
    try socket.close() catch { case _: IOException => () }
    socket = null; in = null; out = null
  }

  override def close(): Unit = teardown()

  private val MaxPacketBytes = 16 * 1024 * 1024
  private val PollProbeMs = 10
  private val FrameTimeoutMs = 30000
}
