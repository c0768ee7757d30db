package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, IOException}
import java.net.{ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util.Base64
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import graft.sources.cdc.PgAuth

/** In-process PostgreSQL walsender double for [[PgWalSenderFeedSpec]]:
  * speaks the v3 protocol server-side — startup parse (requires
  * `replication=database`), the configured auth exchange (cleartext /
  * md5 / scram-sha-256, tokens VALIDATED against the real derivations,
  * ERR 28P01 on mismatch), `START_REPLICATION` parse (requested LSN
  * recorded + honored), XLogData streaming of enqueued pgoutput
  * messages at LSNs 1..n, keepalives, and standby-status-update
  * bookkeeping (`confirmedFlush`). One session at a time, serially —
  * a closed client socket loops back to accept. */
final class StubPgWalSenderServer extends AutoCloseable {
  private val server = new ServerSocket(0)
  private val queue = new ConcurrentLinkedQueue[Array[Byte]]()
  @volatile private var closed = false

  /** (method, user, password); method ∈ cleartext | md5 | scram-sha-256.
    * None = trust (AuthenticationOk immediately). */
  @volatile var authMode: Option[(String, String, String)] = None
  /** When set, the START_REPLICATION command errors with this
    * (sqlstate, message) — e.g. a missing slot. */
  @volatile var errOnStart: Option[(String, String)] = None
  /** Ask the client to reply to the first keepalive of each session. */
  @volatile var keepaliveEvery: Int = 0
  /** Corrupt the SASLFinal server signature — a server that never knew
    * the password; the client must refuse the session. */
  @volatile var tamperServerSig: Boolean = false
  /** Verify the -PLUS channel binding against a DIFFERENT cert's data
    * — the view a TLS-terminating MITM has; the honest client's
    * binding must then fail auth. */
  @volatile var tamperChannelBinding: Boolean = false
  /** When set, an SSLRequest probe is answered 'S' and the session
    * upgrades to TLS server-side with this context; when None the
    * probe is answered 'N' (a TLS-less server). */
  @volatile var tlsContext: Option[javax.net.ssl.SSLContext] = None
  /** Whether the last completed session ran over TLS. */
  val lastSessionTls = new AtomicReference[java.lang.Boolean](false)

  val lastStartLsn = new AtomicLong(-1L)
  val lastStartCommand = new AtomicReference[String]("")
  val confirmedFlush = new AtomicLong(0L)
  val statusUpdates = new AtomicLong(0L)
  val lastAuthUser = new AtomicReference[String]("")
  /** SASL mechanism the last session selected (SCRAM vs SCRAM-PLUS). */
  val lastSaslMech = new AtomicReference[String]("")
  private[sources] val md5Salt = Array[Byte](1, 2, 3, 4)
  private[sources] val scramSalt: Array[Byte] = Array.tabulate(16)(i => (i * 5 + 1).toByte)
  private[sources] val scramIters = 4096

  def port: Int = server.getLocalPort
  /** Messages are assigned LSNs 1..n in enqueue order. */
  def enqueue(msgs: Array[Byte]*): Unit = msgs.foreach(queue.add)

  private val thread = new Thread(() => {
    while (!closed) {
      try {
        val s = server.accept()
        try session(s) catch { case _: IOException => () }
        finally { try s.close() catch { case _: IOException => () } }
      } catch { case _: IOException => () } // accept after close
    }
  }, "stub-pg-walsender")
  thread.setDaemon(true)
  thread.start()

  private def session(s0: Socket): Unit = {
    var s = s0
    var in = new DataInputStream(new BufferedInputStream(s.getInputStream))
    var out = new DataOutputStream(new BufferedOutputStream(s.getOutputStream))
    def writeMsg(tag: Char, payload: Array[Byte]): Unit = {
      out.writeByte(tag); out.writeInt(4 + payload.length); out.write(payload)
      out.flush()
    }
    def err(sqlstate: String, msg: String): Unit = {
      val b = ByteBuffer.allocate(64 + msg.length)
      def f(c: Char, v: String): Unit = {
        b.put(c.toByte); b.put(v.getBytes(StandardCharsets.UTF_8)); b.put(0.toByte)
      }
      f('S', "ERROR"); f('C', sqlstate); f('M', msg); b.put(0.toByte)
      writeMsg('E', java.util.Arrays.copyOf(b.array(), b.position()))
    }
    def readMsg(): (Char, Array[Byte]) = {
      val tag = in.read()
      if (tag < 0) throw new IOException("client gone")
      val len = in.readInt()
      val p = new Array[Byte](len - 4); in.readFully(p)
      (tag.toChar, p)
    }
    // ---- optional SSLRequest probe (int32 8, int32 80877103) ----
    lastSessionTls.set(false)
    var slen = in.readInt()
    if (slen == 8) {
      val code = in.readInt()
      require(code == 80877103, s"stub: unknown 8-byte startup code $code")
      tlsContext match {
        case Some(ctx) =>
          out.writeByte('S'); out.flush()
          val ssl = ctx.getSocketFactory
            .createSocket(s, null, s.getPort, true)
            .asInstanceOf[javax.net.ssl.SSLSocket]
          ssl.setUseClientMode(false)
          ssl.startHandshake()
          s = ssl
          in = new DataInputStream(new BufferedInputStream(ssl.getInputStream))
          out = new DataOutputStream(new BufferedOutputStream(ssl.getOutputStream))
          lastSessionTls.set(true)
        case None =>
          out.writeByte('N'); out.flush()
      }
      slen = in.readInt() // the real StartupMessage follows
    }
    // ---- startup (no tag byte) ----
    val sp = new Array[Byte](slen - 4); in.readFully(sp)
    require(ByteBuffer.wrap(sp, 0, 4).getInt == 196608, "protocol 3.0 expected")
    val params = new String(sp, 4, sp.length - 4, StandardCharsets.UTF_8)
      .split("\u0000").grouped(2).collect { case Array(k, v) => k -> v }.toMap
    require(params.get("replication").contains("database"),
      "stub: replication=database required")
    val startupUser = params.getOrElse("user", "")
    lastAuthUser.set(startupUser)

    // ---- authentication ----
    val ok = authMode match {
      case None =>
        writeMsg('R', ByteBuffer.allocate(4).putInt(0).array()); true
      case Some((method, wantUser, wantPassword)) =>
        def authOk(pass: Boolean): Boolean = {
          if (pass && startupUser == wantUser) {
            writeMsg('R', ByteBuffer.allocate(4).putInt(0).array()); true
          } else { err("28P01", s"""password authentication failed for user "$startupUser""""); false }
        }
        method match {
          case "cleartext" =>
            writeMsg('R', ByteBuffer.allocate(4).putInt(3).array())
            val (_, p) = readMsg()
            authOk(new String(p, 0, p.length - 1, StandardCharsets.UTF_8) == wantPassword)
          case "md5" =>
            writeMsg('R', ByteBuffer.allocate(8).putInt(5).put(md5Salt).array())
            val (_, p) = readMsg()
            val got = new String(p, 0, p.length - 1, StandardCharsets.UTF_8)
            authOk(got == PgAuth.md5Password(wantUser, wantPassword, md5Salt))
          case "scram-sha-256" =>
            // server-side TLS cert (when upgraded): enables the -PLUS
            // advertisement and the channel-binding verification
            val localCert = s match {
              case ssl: javax.net.ssl.SSLSocket =>
                ssl.getSession.getLocalCertificates.headOption.collect {
                  case c: java.security.cert.X509Certificate => c
                }
              case _ => None
            }
            val mechList = (if (localCert.isDefined) "SCRAM-SHA-256-PLUS\u0000"
                            else "") + "SCRAM-SHA-256\u0000"
            val mechs = mechList.getBytes(StandardCharsets.UTF_8)
            writeMsg('R', ByteBuffer.allocate(4 + mechs.length).putInt(10).put(mechs).array())
            // SASLInitialResponse: mech cstring, int32 len, client-first
            val (_, ir) = readMsg()
            var i = 0; while (ir(i) != 0) i += 1
            val mech = new String(ir, 0, i, StandardCharsets.UTF_8); i += 1
            require(mech == "SCRAM-SHA-256" ||
              (mech == "SCRAM-SHA-256-PLUS" && localCert.isDefined),
              s"unexpected mechanism $mech")
            lastSaslMech.set(mech)
            val ilen = ByteBuffer.wrap(ir, i, 4).getInt; i += 4
            val clientFirst = new String(ir, i, ilen, StandardCharsets.UTF_8)
            // gs2 header = through the second comma (cb-flag, authzid)
            val gs2End = clientFirst.indexOf(',', clientFirst.indexOf(',') + 1) + 1
            val gs2 = clientFirst.substring(0, gs2End)
            if (mech == "SCRAM-SHA-256-PLUS")
              require(gs2 == "p=tls-server-end-point,,", s"bad -PLUS gs2: $gs2")
            else require(gs2 == "n,," || gs2 == "y,,", s"bad gs2: $gs2")
            val clientFirstBare = clientFirst.substring(gs2End)
            val clientNonce = PgAuth.attrs(clientFirstBare)('r')
            val serverNonce = clientNonce + "SRVNONCE"
            val serverFirst = s"r=$serverNonce," +
              s"s=${Base64.getEncoder.encodeToString(scramSalt)},i=$scramIters"
            val sf = serverFirst.getBytes(StandardCharsets.UTF_8)
            writeMsg('R', ByteBuffer.allocate(4 + sf.length).putInt(11).put(sf).array())
            // SASLResponse: client-final — verify the proof against the
            // REAL password's StoredKey (what a server keeps on disk)
            val (_, cf) = readMsg()
            val clientFinal = new String(cf, StandardCharsets.UTF_8)
            val a = PgAuth.attrs(clientFinal)
            val withoutProof = clientFinal.substring(0, clientFinal.lastIndexOf(",p="))
            val authMessage = s"$clientFirstBare,$serverFirst,$withoutProof"
            val salted = PgAuth.saltedPassword(wantPassword, scramSalt, scramIters)
            val storedKey = PgAuth.sha256(PgAuth.hmacSha256(salted,
              "Client Key".getBytes(StandardCharsets.UTF_8)))
            // channel binding: c= must equal base64(gs2 ++ cb-data) for
            // the server's OWN certificate — what defeats a
            // TLS-terminating MITM. tamperChannelBinding verifies
            // against a different cert's binding (the MITM view).
            val cbData =
              if (mech == "SCRAM-SHA-256-PLUS")
                localCert.map(PgAuth.tlsServerEndPoint)
                  .map(d => if (tamperChannelBinding) d.reverse else d)
                  .getOrElse(Array.emptyByteArray)
              else Array.emptyByteArray
            val expectC = Base64.getEncoder.encodeToString(
              gs2.getBytes(StandardCharsets.UTF_8) ++ cbData)
            val proofOk = a.get('r').contains(serverNonce) &&
              a.get('c').contains(expectC) &&
              PgAuth.verifyClientProof(storedKey, authMessage,
                Base64.getDecoder.decode(a('p')))
            if (!proofOk) authOk(false)
            else {
              val serverKey = PgAuth.hmacSha256(salted,
                "Server Key".getBytes(StandardCharsets.UTF_8))
              val sig0 = Base64.getEncoder.encodeToString(
                PgAuth.hmacSha256(serverKey,
                  authMessage.getBytes(StandardCharsets.UTF_8)))
              val sig = if (tamperServerSig) sig0.reverse else sig0
              val fin = s"v=$sig".getBytes(StandardCharsets.UTF_8)
              writeMsg('R', ByteBuffer.allocate(4 + fin.length).putInt(12).put(fin).array())
              authOk(pass = true)
            }
        }
    }
    if (!ok) return
    writeMsg('Z', Array('I'.toByte)) // ReadyForQuery

    // ---- START_REPLICATION ----
    val (qtag, qp) = readMsg()
    require(qtag == 'Q', s"expected Query, got $qtag")
    val cmd = new String(qp, 0, qp.length - 1, StandardCharsets.UTF_8)
    lastStartCommand.set(cmd)
    require(cmd.startsWith("START_REPLICATION"), s"unexpected command: $cmd")
    errOnStart match {
      case Some((code, msg)) => err(code, msg); return
      case None => ()
    }
    val lsnRe = """LOGICAL ([0-9A-Fa-f]+)/([0-9A-Fa-f]+)""".r.unanchored
    val requested = cmd match {
      case lsnRe(hi, lo) => (java.lang.Long.parseLong(hi, 16) << 32) |
        java.lang.Long.parseLong(lo, 16)
      case _ => throw new IOException(s"no LSN in: $cmd")
    }
    lastStartLsn.set(requested)
    writeMsg('W', Array[Byte](0, 0, 0)) // CopyBothResponse: text, 0 cols

    // ---- stream: enqueued messages at LSNs 1..n past `requested` ----
    var sent = 0L
    var keepalivesSent = 0
    val snapshot = new java.util.ArrayList[Array[Byte]]()
    queue.forEach(m => { snapshot.add(m); () })
    s.setSoTimeout(20) // idle reads poll for client frames / EOF
    while (!s.isClosed && !closed) {
      // re-snapshot: enqueues after session start are picked up
      if (snapshot.size < queue.size) {
        snapshot.clear(); queue.forEach(m => { snapshot.add(m); () })
      }
      var lsn = 1L
      val it = snapshot.iterator()
      var emitted = false
      while (it.hasNext) {
        val m = it.next()
        if (lsn > requested && lsn > sent) {
          val b = ByteBuffer.allocate(25 + m.length)
          b.put('w'.toByte); b.putLong(lsn - 1); b.putLong(lsn); b.putLong(0L); b.put(m)
          writeMsg('d', b.array())
          sent = lsn; emitted = true
        }
        lsn += 1
      }
      if (!emitted) {
        if (keepaliveEvery > 0 && keepalivesSent == 0) {
          val b = ByteBuffer.allocate(18)
          b.put('k'.toByte); b.putLong(sent.max(requested)); b.putLong(0L); b.put(1.toByte)
          writeMsg('d', b.array())
          keepalivesSent += 1
        }
        // drain client frames (status updates) AND notice disconnects:
        // a marked 1-byte read under SO_TIMEOUT — -1 ends the session
        // (so the accept loop serves the next client), timeout idles
        in.mark(1)
        val first = try in.read()
          catch { case _: java.net.SocketTimeoutException => -2 }
        if (first == -1) throw new IOException("client disconnected")
        if (first >= 0) {
          in.reset()
          val (t, p) = readMsg() // whole frames arrive together (localhost)
          if (t == 'd' && p.nonEmpty && p(0) == 'r') {
            confirmedFlush.set(ByteBuffer.wrap(p, 9, 8).getLong)
            statusUpdates.incrementAndGet()
          }
        }
      }
    }
  }

  override def close(): Unit = {
    closed = true
    try server.close() catch { case _: IOException => () }
  }
}
