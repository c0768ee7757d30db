package graft.sources

import graft.sources.cdc.CaptureFactory
import graft.sources.cdc.CaptureFactory.{PollingCapture, ProtocolCapture}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** `debezium.source.connector.class` capture dispatch — the
  * reference's connector-selection mechanism mapped onto the capture
  * implementations (no Spark session needed: selection is pure
  * config). */
class CaptureFactorySpec extends AnyFunSuite {

  private def base(extra: (String, String)*): Map[String, String] = Map(
    "debezium.source.path" -> Files.createTempDirectory("graft-capture").toString,
    "debezium.source.topic.prefix" -> "testc") ++ extra

  test("PostgresConnector class selects the pgoutput protocol capture") {
    val c = CaptureFactory.fromProperties(base(
      "debezium.source.connector.class" -> "io.debezium.connector.postgresql.PostgresConnector",
      "debezium.source.protocol.dir" -> Files.createTempDirectory("graft-pgfeed").toString))
    assert(c.isInstanceOf[ProtocolCapture])
  }

  test("PostgresConnector without a protocol dir fails fast") {
    intercept[IllegalArgumentException] {
      CaptureFactory.fromProperties(base(
        "debezium.source.connector.class" -> "io.debezium.connector.postgresql.PostgresConnector"))
    }
  }

  test("MySqlConnector selects the binlog capture and requires column registration") {
    val feedDir = Files.createTempDirectory("graft-myfeed").toString
    val c = CaptureFactory.fromProperties(base(
      "debezium.source.connector.class" -> "io.debezium.connector.mysql.MySqlConnector",
      "debezium.source.protocol.dir" -> feedDir,
      "debezium.source.binlog.columns.inventory.customers" -> "id, email, score",
      "debezium.source.binlog.keys.inventory.customers" -> "id"))
    assert(c.isInstanceOf[ProtocolCapture])
    // the wire format carries no column names — missing registration fails fast
    intercept[IllegalArgumentException] {
      CaptureFactory.fromProperties(base(
        "debezium.source.connector.class" -> "io.debezium.connector.mysql.MySqlConnector",
        "debezium.source.protocol.dir" -> feedDir))
    }
    // keys are required too: a silent first-column default would mis-key
    // envelopes whenever column order ≠ primary key
    val e = intercept[IllegalArgumentException] {
      CaptureFactory.fromProperties(base(
        "debezium.source.connector.class" -> "io.debezium.connector.mysql.MySqlConnector",
        "debezium.source.protocol.dir" -> feedDir,
        "debezium.source.binlog.columns.inventory.customers" -> "email, id, score"))
    }
    assert(e.getMessage.contains("binlog.keys.inventory.customers"), e.getMessage)
  }

  test("MariaDbConnector routes to the same binlog capture (identical wire surface)") {
    val feedDir = Files.createTempDirectory("graft-mariafeed").toString
    val c = CaptureFactory.fromProperties(base(
      "debezium.source.connector.class" -> "io.debezium.connector.mariadb.MariaDbConnector",
      "debezium.source.protocol.dir" -> feedDir,
      "debezium.source.binlog.columns.inventory.customers" -> "id, email, score",
      "debezium.source.binlog.keys.inventory.customers" -> "id"))
    assert(c.isInstanceOf[ProtocolCapture])
    // the column-registration requirement names the actual connector
    val e = intercept[IllegalArgumentException] {
      CaptureFactory.fromProperties(base(
        "debezium.source.connector.class" -> "io.debezium.connector.mariadb.MariaDbConnector",
        "debezium.source.protocol.dir" -> feedDir))
    }
    assert(e.getMessage.contains("MariaDbConnector"), e.getMessage)
  }

  // pgoutput wire builders (big-endian, per the protocol docs)
  private def pgMsg(f: java.nio.ByteBuffer => Unit): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(1024)
    f(b)
    val out = new Array[Byte](b.position()); b.flip(); b.get(out); out
  }
  private def cstr(b: java.nio.ByteBuffer, s: String): Unit = {
    b.put(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)); b.put(0.toByte)
  }
  private def ins(oid: Int, vals: String*): Array[Byte] = pgMsg { b =>
    b.put('I'.toByte); b.putInt(oid); b.put('N'.toByte)
    b.putShort(vals.size.toShort)
    vals.foreach { v =>
      b.put('t'.toByte)
      val by = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      b.putInt(by.length); b.put(by)
    }
  }

  test("protocol.socket streams pgoutput over a live localhost session into the cdc layout") {
    val srv = new StubReplicationServer
    try {
      val rel = pgMsg { b =>
        b.put('R'.toByte); b.putInt(55); cstr(b, "inventory"); cstr(b, "customers")
        b.put('d'.toByte); b.putShort(2)
        b.put(1.toByte); cstr(b, "id"); b.putInt(23); b.putInt(-1)
        b.put(0.toByte); cstr(b, "email"); b.putInt(25); b.putInt(-1)
      }
      srv.enqueue(rel, ins(55, "1", "a@x.com"), ins(55, "2", "b@x.com"))

      val dbDir = Files.createTempDirectory("graft-sockcap")
      val c = CaptureFactory.fromProperties(Map(
        "debezium.source.path" -> dbDir.toString,
        "debezium.source.topic.prefix" -> "testc",
        "debezium.source.connector.class" -> "io.debezium.connector.postgresql.PostgresConnector",
        "debezium.source.protocol.socket" -> s"localhost:${srv.port}",
        "debezium.source.protocol.start.command" ->
          "START_REPLICATION SLOT graft LOGICAL 0/0"))
      val ProtocolCapture(tailer) = c: @unchecked

      def walLines(): Seq[String] = {
        val wal = dbDir.resolve("wal")
        if (!Files.exists(wal)) Nil
        else graft.Fs.children(wal).filter(p => !p.getFileName.toString.startsWith("."))
          .sortBy(_.getFileName.toString)
          .flatMap(p => Files.readAllLines(p).toArray(Array.empty[String]).toSeq)
      }
      // messages travel an actual TCP session — drain until both rows land
      val deadline = System.nanoTime() + 30e9.toLong
      while (walLines().size < 2 && System.nanoTime() < deadline) {
        tailer.drainOnce(); Thread.sleep(20)
      }
      val lines = walLines()
      assert(lines.size == 2, lines.mkString("\n"))
      assert(lines.head.contains(""""destination":"testc.inventory.customers""""))
      assert(lines.head.contains(""""email":"a@x.com""""))
      assert(srv.lastStartCommand.get == "START_REPLICATION SLOT graft LOGICAL 0/0")
      // the commit acked all three protocol messages (R + 2×I) server-side
      val ackDeadline = System.nanoTime() + 10e9.toLong
      while (srv.lastAck.get < 3 && System.nanoTime() < ackDeadline) Thread.sleep(10)
      assert(srv.lastAck.get == 3)

      // a LATE message on the same session is picked up by later drains
      srv.enqueue(ins(55, "3", "c@x.com"))
      val deadline2 = System.nanoTime() + 30e9.toLong
      while (walLines().size < 3 && System.nanoTime() < deadline2) {
        tailer.drainOnce(); Thread.sleep(20)
      }
      assert(walLines().size == 3)
      tailer.close() // closes the socket feed
    } finally srv.close()
  }

  test("socket feed: reconnect resumes from the server-side acked position, un-acked re-delivers") {
    import graft.sources.cdc.SocketReplicationFeed
    val srv = new StubReplicationServer
    try {
      srv.enqueue(Array[Byte](1), Array[Byte](2))
      val feed = new SocketReplicationFeed("localhost", srv.port, "START")
      def pollUntil(n: Int): Seq[Array[Byte]] = {
        val deadline = System.nanoTime() + 30e9.toLong
        var got: Seq[Array[Byte]] = Nil
        while (got.size < n && System.nanoTime() < deadline) {
          got = feed.poll(); Thread.sleep(10)
        }
        got
      }
      // at-least-once WITHIN a session: an un-committed poll re-delivers
      assert(pollUntil(2).map(_.head).toSeq == Seq(1.toByte, 2.toByte))
      assert(feed.poll().map(_.head).toSeq == Seq(1.toByte, 2.toByte))
      feed.commit()
      assert(feed.ackedCount == 2)
      // session dies (here: clean close); the position survives SERVER-side
      // — the replication-slot model — so a fresh session resumes past
      // everything acked and serves only what arrives next
      feed.close()
      srv.enqueue(Array[Byte](3))
      assert(pollUntil(1).map(_.head).toSeq == Seq(3.toByte))
      assert(srv.sessionsServed.get == 2)
      assert(srv.lastStartCommand.get == "START")
      feed.commit()
      val deadline = System.nanoTime() + 10e9.toLong
      while (srv.lastAck.get < 3 && System.nanoTime() < deadline) Thread.sleep(10)
      assert(srv.lastAck.get == 3)
      feed.close()
    } finally srv.close()
  }

  test("socket feed: pending buffer is capped — a flooding server back-pressures, commit resumes, nothing lost") {
    import graft.sources.cdc.SocketReplicationFeed
    val srv = new StubReplicationServer
    try {
      // flood: 25 messages against a cap of 10 — a consumer stuck
      // re-polling must NOT buffer all 25 (the unbounded-growth failure
      // mode of a decode-fail loop in the long-running daemon)
      srv.enqueue((1 to 25).map(i => Array[Byte](i.toByte)): _*)
      val feed = new SocketReplicationFeed("localhost", srv.port, "START",
        maxPending = 10)
      def pollUntil(n: Int): Seq[Array[Byte]] = {
        val deadline = System.nanoTime() + 30e9.toLong
        var got: Seq[Array[Byte]] = feed.poll()
        while (got.size < n && System.nanoTime() < deadline) {
          Thread.sleep(10); got = feed.poll()
        }
        got
      }
      val first = pollUntil(10)
      assert(first.size == 10, s"poll must stop at the cap, got ${first.size}")
      // stuck consumer: repeated polls stay AT the cap, never past it
      Thread.sleep(50)
      assert(feed.poll().size == 10)
      assert(first.map(_.head) == (1 to 10).map(_.toByte))
      // commit drains the buffer; draining resumes — nothing was lost
      feed.commit()
      val second = pollUntil(10)
      assert(second.map(_.head) == (11 to 20).map(_.toByte))
      feed.commit()
      assert(pollUntil(5).map(_.head) == (21 to 25).map(_.toByte))
      feed.commit()
      assert(feed.ackedCount == 25)
      feed.close()
    } finally srv.close()
  }

  test("socket feed: acked position persists to the position file — a RESTARTED client does not replay history") {
    import graft.sources.cdc.SocketReplicationFeed
    val srv = new StubReplicationServer
    val dir = java.nio.file.Files.createTempDirectory("graft-sockpos")
    val posFile = dir.resolve("_feed_acked")
    try {
      srv.enqueue(Array[Byte](1), Array[Byte](2), Array[Byte](3))
      def pollUntil(feed: SocketReplicationFeed, n: Int): Seq[Array[Byte]] = {
        val deadline = System.nanoTime() + 30e9.toLong
        var got: Seq[Array[Byte]] = feed.poll()
        while (got.size < n && System.nanoTime() < deadline) {
          Thread.sleep(10); got = feed.poll()
        }
        got
      }
      val feed1 = new SocketReplicationFeed("localhost", srv.port, "START",
        positionFile = Some(posFile))
      assert(pollUntil(feed1, 3).map(_.head) == Seq(1.toByte, 2.toByte, 3.toByte))
      feed1.commit()
      feed1.close() // process dies
      // a NEW feed instance (fresh JVM analog) reads the persisted
      // position and announces it on connect — the server serves only
      // what arrived since, instead of replaying all three
      assert(java.nio.file.Files.readString(posFile).trim == "3")
      srv.enqueue(Array[Byte](4))
      val feed2 = new SocketReplicationFeed("localhost", srv.port, "START",
        positionFile = Some(posFile))
      assert(feed2.ackedCount == 3)
      assert(pollUntil(feed2, 1).map(_.head) == Seq(4.toByte))
      feed2.commit()
      assert(java.nio.file.Files.readString(posFile).trim == "4")
      feed2.close()
    } finally { srv.close(); graft.Fs.deleteRecursively(dir) }
  }

  test("protocol.socket rejects malformed host:port") {
    intercept[IllegalArgumentException] {
      CaptureFactory.fromProperties(base(
        "debezium.source.connector.class" -> "io.debezium.connector.postgresql.PostgresConnector",
        "debezium.source.protocol.socket" -> "nonsense"))
    }
  }

  test("anything else falls back to the JDBC polling tailer") {
    val c = CaptureFactory.fromProperties(base(
      "debezium.source.connector.class" -> "graft.jdbc.PollingConnector",
      "debezium.source.jdbc.url" -> "jdbc:derby:memory:capsel;create=true",
      "debezium.source.jdbc.tables" -> "inventory.customers:id:id"))
    assert(c.isInstanceOf[PollingCapture])
  }
}
