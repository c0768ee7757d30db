package graft.services

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Notification channels (the upstream `notification.enabled.channels`
  * surface): fan-out dispatch, the durable file-backed `sink` channel,
  * and config-driven channel selection with loud failures. */
class NotificationsSpec extends AnyFunSuite {
  import Notifications._

  test("memory channel: dispatcher fans out ordered notifications with ids") {
    val mem = new MemoryChannel
    val d = new Dispatcher(Seq(mem))
    d.emit(AggregateIncrementalSnapshot, "STARTED", Map("data_collections" -> "a.b"))
    d.emit(AggregateIncrementalSnapshot, "COMPLETED")
    val got = mem.all
    assert(got.map(_.`type`) == Seq("STARTED", "COMPLETED"))
    assert(got.map(_.id).distinct.size == 2)
    assert(got.head.aggregateType == AggregateIncrementalSnapshot)
    assert(got.head.additionalData == Map("data_collections" -> "a.b"))
    assert(got.forall(_.timestamp > 0))
  }

  test("sink channel: durable file-per-notification, poll consumes oldest-first") {
    val dir = Files.createTempDirectory("graft-ntf")
    val ch = new SinkChannel(dir)
    val d = new Dispatcher(Seq(ch))
    d.emit("Incremental Snapshot", "STARTED", Map("data_collections" -> "s.t1,s.t2"))
    d.emit("Incremental Snapshot", "TABLE_SCAN_COMPLETED",
      Map("data_collection" -> "s.t1", "scanned_rows" -> "42"))
    d.emit("Incremental Snapshot", "COMPLETED",
      Map("note" -> "line1\nline2 \"quoted\"")) // escaping survives the round-trip

    val got = ch.poll()
    assert(got.map(_.`type`) == Seq("STARTED", "TABLE_SCAN_COMPLETED", "COMPLETED"))
    assert(got(1).additionalData == Map("data_collection" -> "s.t1", "scanned_rows" -> "42"))
    assert(got(2).additionalData("note") == "line1\nline2 \"quoted\"")
    assert(ch.poll().isEmpty, "poll consumed everything")
  }

  test("fromProperties: channel list parses; sink needs a directory; unknown fails") {
    val dir = Files.createTempDirectory("graft-ntf-cfg")
    val mem = new MemoryChannel
    val d = fromProperties(Map(
      "debezium.source.notification.enabled.channels" -> "log, sink, memory",
      "debezium.source.notification.sink.topic.name" -> dir.toString),
      memory = Some(mem))
    d.emit("Test", "PING")
    assert(mem.all.map(_.`type`) == Seq("PING"))
    assert(new SinkChannel(dir).poll().map(_.`type`) == Seq("PING"))

    // default: no channels, emits drop silently
    fromProperties(Map.empty).emit("Test", "DROPPED")

    intercept[RuntimeException](fromProperties(Map(
      "debezium.source.notification.enabled.channels" -> "sink")))
    intercept[RuntimeException](fromProperties(Map(
      "debezium.source.notification.enabled.channels" -> "jmx-nope")))
  }

  test("capture factory wires notification channels into native tailers") {
    val url = s"jdbc:derby:memory:ntfcap${java.util.UUID.randomUUID().toString.take(8)};create=true"
    val st = java.sql.DriverManager.getConnection(url).createStatement()
    st.execute("CREATE SCHEMA inv")
    st.execute("CREATE TABLE inv.accounts (id INT PRIMARY KEY, name VARCHAR(64), email VARCHAR(64))")
    st.execute("CREATE SCHEMA asn")
    st.execute("""CREATE TABLE asn."inv_accounts_CD" (""" +
      "ibmsnap_commitseq BIGINT, ibmsnap_intentseq BIGINT, " +
      "ibmsnap_operation CHAR(1), " +
      "id INT, name VARCHAR(64), email VARCHAR(64), " +
      "xid INT, xname VARCHAR(64), xemail VARCHAR(64))")
    st.execute("INSERT INTO inv.accounts VALUES (1, 'A', 'a@x.com')")

    val ntfDir = Files.createTempDirectory("graft-ntf-cap")
    val cap = graft.sources.cdc.CaptureFactory.fromProperties(Map(
      "debezium.source.connector.class" -> "io.debezium.connector.db2.Db2Connector",
      "debezium.source.path" -> Files.createTempDirectory("graft-ntf-db").toString,
      "debezium.source.jdbc.url" -> url,
      "debezium.source.db2.tables" -> "inv.accounts:id",
      "debezium.source.db2.emulated" -> "true",
      "debezium.source.notification.enabled.channels" -> "sink",
      "debezium.source.notification.sink.topic.name" -> ntfDir.toString))
    val tailer = cap.asInstanceOf[graft.sources.cdc.CaptureFactory.NativeCapture].tailer
    tailer.snapshotSchemaOnly()
    assert(tailer.incrementalSnapshot() == 1)
    val got = new SinkChannel(ntfDir).poll()
    assert(got.map(_.`type`) == Seq("STARTED", "TABLE_SCAN_COMPLETED", "COMPLETED"))
  }
}
