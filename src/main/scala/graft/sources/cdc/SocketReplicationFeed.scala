package graft.sources.cdc

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, IOException}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}

/** Socket implementation of [[ReplicationFeed]] — the live replication
  * session transport that was the declared boundary of the
  * file-based feed (COVERAGE.md; reference connector matrix:
  * debezium-server-dist/pom.xml:359-389). Speaks a length-framed
  * protocol modeled on the PostgreSQL walsender session (and MySQL's
  * binlog dump, which is likewise length-framed):
  *
  *  - every frame is `[int32 BE length][tag byte][payload]` — the
  *    CopyData framing of a `START_REPLICATION` session reduced to its
  *    essentials;
  *  - client→server on connect: tag `'S'` + the start command text +
  *    an int64 resume position (messages already acknowledged) — the
  *    `START_REPLICATION SLOT … LOGICAL <restart_lsn>` analog. The
  *    client announces the position, so it must SURVIVE a process
  *    restart: `positionFile` persists the acked count atomically on
  *    every commit (the same convention as [[FileReplicationFeed]]'s
  *    offset file) and seeds `acked` on construction — without it a
  *    restarted client would announce 0 and replay the full history;
  *  - server→client: tag `'d'` carries one raw protocol message (fed
  *    to [[PgOutputDecoder]]/[[BinlogDecoder]] unchanged); tag `'k'`
  *    is a keepalive (transport chatter, skipped); unknown tags are
  *    ignored for forward compatibility;
  *  - client→server on [[commit]]: tag `'a'` + int64 cumulative
  *    acknowledged count — the standby-status-update analog that lets
  *    the server advance its retained position.
  *
  * At-least-once delivery mirrors [[FileReplicationFeed]]: every
  * [[poll]] returns ALL messages delivered since the last [[commit]]
  * (a failed decode re-polls the same batch); a dropped connection
  * tears the session down, and the next poll reconnects announcing the
  * last ACKED position, so the server re-serves everything un-acked —
  * messages can re-deliver, never vanish.
  *
  * Bounded memory: the un-acked buffer is capped at `maxPending`
  * messages. A consumer stuck in a decode-fail loop re-polls while the
  * server keeps streaming — without the cap the buffer grows without
  * limit in exactly the long-running daemon this feed exists for. Past
  * the cap, poll stops DRAINING the socket (frames stay in the kernel
  * buffer, the TCP window closes, the server back-pressures — the same
  * flow control a real walsender session gets) and draining resumes
  * after the next successful commit. */
final class SocketReplicationFeed(host: String, port: Int,
                                  startCommand: String = "START_REPLICATION",
                                  connectTimeoutMs: Int = 5000,
                                  maxPending: Int = 65536,
                                  positionFile: Option[Path] = None)
    extends ReplicationFeed {
  require(maxPending > 0, "maxPending must be positive")

  private var socket: Socket = _
  private var in: DataInputStream = _
  private var out: DataOutputStream = _
  private var pending = Vector.empty[Array[Byte]]
  private var acked: Long =
    positionFile.filter(Files.exists(_))
      .map(f => Files.readString(f).trim.toLong).getOrElse(0L)

  private def ensureConnected(): Unit = if (socket == null) {
    val s = new Socket()
    s.connect(new InetSocketAddress(host, port), connectTimeoutMs)
    s.setTcpNoDelay(true)
    in = new DataInputStream(new BufferedInputStream(s.getInputStream))
    out = new DataOutputStream(new BufferedOutputStream(s.getOutputStream))
    socket = s
    // a NEW session re-serves everything past `acked` — drop the local
    // un-acked buffer or the overlap would double-deliver within this
    // process (across processes the layout is LSN-converged anyway)
    pending = Vector.empty
    val cmd = startCommand.getBytes(StandardCharsets.UTF_8)
    out.writeInt(1 + cmd.length + 8)
    out.writeByte('S'); out.write(cmd); out.writeLong(acked)
    out.flush()
  }

  override def poll(): Seq[Array[Byte]] = {
    try {
      ensureConnected()
      // Frame-aligned drain: only begin a frame once its length prefix
      // is fully buffered, then block for the remainder (the server
      // writes whole frames) — a poll can never strand a partial
      // header in the stream.
      while (pending.size < maxPending && in.available() >= 4) {
        val len = in.readInt()
        require(len >= 1 && len <= MaxFrameBytes,
          s"replication socket: insane frame length $len — stream desynced")
        val frame = new Array[Byte](len)
        in.readFully(frame)
        if (frame(0) == 'd') pending :+= java.util.Arrays.copyOfRange(frame, 1, len)
      }
      pending
    } catch {
      case e: IOException =>
        // session is gone: tear down so the next poll reconnects at the
        // acked position; surface the error (the tailer daemon counts
        // it and retries next tick)
        teardown()
        throw e
    }
  }

  override def commit(): Unit = if (pending.nonEmpty && out != null) {
    acked += pending.size
    pending = Vector.empty
    // durable BEFORE the ack goes out: if the write fails, the server
    // still re-serves from the old position (re-delivery, never loss)
    positionFile.foreach { f =>
      val tmp = f.resolveSibling("." + f.getFileName.toString + ".tmp")
      Files.writeString(tmp, acked.toString)
      Files.move(tmp, f, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    out.writeInt(9)
    out.writeByte('a'); out.writeLong(acked)
    out.flush()
  }

  /** Cumulative messages acknowledged — the session resume position. */
  def ackedCount: Long = acked

  private def teardown(): Unit = if (socket != null) {
    try socket.close() catch { case _: IOException => () }
    socket = null; in = null; out = null
  }

  override def close(): Unit = teardown()

  private val MaxFrameBytes = 64 * 1024 * 1024
}
