package graft.sources

import java.io.{DataInputStream, DataOutputStream, IOException}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.CopyOnWriteArrayList
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong, AtomicReference}

/** In-process replication server speaking
  * [[graft.sources.cdc.SocketReplicationFeed]]'s length-framed
  * transport — the loopback stand-in for a walsender/binlog-dump
  * session (real DBs are sandbox-blocked; the framing layer is what
  * this exercises). Holds a queue of protocol messages; each accepted
  * session reads the start frame, resumes serving from the announced
  * acked position ('d' frames, after one 'k' keepalive to prove
  * chatter is skipped), and records incoming 'a' acks. */
final class StubReplicationServer extends AutoCloseable {
  private val server = new ServerSocket(0) // loopback, ephemeral port
  private val queue = new CopyOnWriteArrayList[Array[Byte]]()
  private val stopped = new AtomicBoolean(false)
  val lastAck = new AtomicLong(-1L)
  val lastStartCommand = new AtomicReference[String]("")
  val sessionsServed = new AtomicLong(0L)

  def port: Int = server.getLocalPort
  def enqueue(msgs: Array[Byte]*): Unit = msgs.foreach(queue.add)

  private val acceptThread = new Thread(() => {
    while (!stopped.get()) {
      try {
        val s = server.accept()
        sessionsServed.incrementAndGet()
        val t = new Thread(() => serve(s), "stub-repl-session")
        t.setDaemon(true); t.start()
      } catch { case _: IOException => () } // closed
    }
  }, "stub-repl-accept")
  acceptThread.setDaemon(true)
  acceptThread.start()

  private def serve(s: Socket): Unit = {
    try {
      s.setTcpNoDelay(true)
      val in = new DataInputStream(s.getInputStream)
      val out = new DataOutputStream(s.getOutputStream)
      // start frame: 'S' + command text + int64 resume position
      val len = in.readInt()
      val frame = new Array[Byte](len); in.readFully(frame)
      require(frame(0) == 'S', s"expected start frame, got '${frame(0).toChar}'")
      lastStartCommand.set(new String(frame, 1, len - 9, StandardCharsets.UTF_8))
      var sent = java.nio.ByteBuffer.wrap(frame, len - 8, 8).getLong.toInt
      // ack reader rides its own thread (acks interleave with serving)
      val ackReader = new Thread(() => {
        try {
          while (!stopped.get()) {
            val alen = in.readInt()
            val af = new Array[Byte](alen); in.readFully(af)
            if (af(0) == 'a')
              lastAck.set(java.nio.ByteBuffer.wrap(af, 1, 8).getLong)
          }
        } catch { case _: IOException => () }
      }, "stub-repl-acks")
      ackReader.setDaemon(true); ackReader.start()
      // one keepalive first — clients must skip transport chatter
      out.writeInt(1); out.writeByte('k'); out.flush()
      while (!stopped.get() && !s.isClosed) {
        if (sent < queue.size()) {
          val m = queue.get(sent)
          out.writeInt(1 + m.length); out.writeByte('d'); out.write(m)
          out.flush()
          sent += 1
        } else Thread.sleep(5)
      }
    } catch { case _: IOException => () }
    finally { try s.close() catch { case _: IOException => () } }
  }

  override def close(): Unit = {
    stopped.set(true)
    try server.close() catch { case _: IOException => () }
  }
}
