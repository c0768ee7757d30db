package graft.sources

import graft.SparkSpec
import graft.sources.cdc.Db2CdTailer
import graft.sources.cdc.Db2CdTailer.{EmulatedDialect, TableSpec}
import org.apache.spark.sql.functions._
import java.nio.file.Files
import scala.collection.mutable

/** Source-table signal channel (`signal.data.collection`): a table in
  * the source database whose inserts are control messages, riding the
  * same change feed as data tables but never reaching the WAL. */
class SignalTableSpec extends SparkSpec {

  private val keyDdl = "id INT"
  private val rowDdl = "id INT, name STRING, email STRING"

  private def fixtureDb(): (String, java.sql.Statement) = {
    val url = s"jdbc:derby:memory:sigtab${java.util.UUID.randomUUID().toString.take(8)};create=true"
    val st = java.sql.DriverManager.getConnection(url).createStatement()
    st.execute("CREATE SCHEMA inv")
    st.execute("CREATE TABLE inv.accounts (id INT PRIMARY KEY, " +
      "name VARCHAR(64), email VARCHAR(64))")
    st.execute("CREATE SCHEMA asn")
    st.execute("""CREATE TABLE asn."inv_accounts_CD" (""" +
      "ibmsnap_commitseq BIGINT, ibmsnap_intentseq BIGINT, " +
      "ibmsnap_operation CHAR(1), " +
      "id INT, name VARCHAR(64), email VARCHAR(64), " +
      "xid INT, xname VARCHAR(64), xemail VARCHAR(64))")
    // the signal collection + its CD table ("TYPE" is reserved in Derby)
    st.execute("""CREATE TABLE inv.graft_signal ("ID" VARCHAR(64), """ +
      """"TYPE" VARCHAR(64), "DATA" VARCHAR(512))""")
    st.execute("""CREATE TABLE asn."inv_graft_signal_CD" (""" +
      "ibmsnap_commitseq BIGINT, ibmsnap_intentseq BIGINT, " +
      "ibmsnap_operation CHAR(1), " +
      """"ID" VARCHAR(64), "TYPE" VARCHAR(64), "DATA" VARCHAR(512), """ +
      """"XID" VARCHAR(64), "XTYPE" VARCHAR(64), "XDATA" VARCHAR(512))""")
    (url, st)
  }

  private def signalCd(st: java.sql.Statement, seq: Long, op: String,
                       id: String, typ: String, data: String): Unit =
    st.execute(s"""INSERT INTO asn."inv_graft_signal_CD" VALUES """ +
      s"($seq, 1, '$op', '$id', '$typ', '$data', NULL, NULL, NULL)")

  private def dataCd(st: java.sql.Statement, seq: Long, id: Int, email: String): Unit =
    st.execute(s"""INSERT INTO asn."inv_accounts_CD" VALUES """ +
      s"($seq, 1, 'I', $id, 'N$id', '$email', NULL, NULL, NULL)")

  test("signal-table inserts decode to signals; nothing reaches the WAL; no redelivery") {
    val (url, st) = fixtureDb()
    st.execute("INSERT INTO inv.accounts VALUES (1, 'N1', 'u1@x.com')")
    // a signal inserted BEFORE the snapshot is history, not pending
    signalCd(st, 5, "I", "old", "log", "pre-snapshot")

    val db = Files.createTempDirectory("graft-sigtab")
    val got = mutable.ArrayBuffer.empty[graft.services.Signals.Signal]
    val tailer = new Db2CdTailer(url, db,
        Seq(TableSpec("inv", "accounts", Seq("id"))), dialect = EmulatedDialect)
      .withSignalTable(TableSpec("inv", "graft_signal", Seq("id")), got += _)
    tailer.snapshot()

    dataCd(st, 10, 2, "u2@x.com")
    signalCd(st, 11, "I", "s1", "execute-snapshot", "inv.accounts")
    signalCd(st, 12, "U", "sx", "ignored", "updates are not signals")

    assert(tailer.poll() == 1, "only the data change reaches the WAL")
    assert(got.toSeq ==
      Seq(graft.services.Signals.Signal("s1", "execute-snapshot", "inv.accounts")))

    // position persisted even though the WAL saw nothing new
    signalCd(st, 13, "I", "s2", "log", "second")
    assert(tailer.poll() == 0)
    assert(got.map(_.id).toSeq == Seq("s1", "s2"), "no redelivery, new signal arrives")
    assert(tailer.poll() == 0)
    assert(got.size == 2, "stable across polls")

    // the stream only carries the data table
    val batch = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", keyDdl).option("rowSchema", rowDdl)
      .load()
    assert(batch.filter(col("value.source.table") === "graft_signal").count() == 0)
    assert(batch.filter(col("value.op") === "c").count() == 1)
  }

  test("factory wires signal.data.collection onto the durable channel; processSignals acts") {
    val (url, st) = fixtureDb()
    (1 to 4).foreach(i =>
      st.execute(s"INSERT INTO inv.accounts VALUES ($i, 'N$i', 'u$i@x.com')"))

    val db = Files.createTempDirectory("graft-sigtabf")
    val chDir = Files.createTempDirectory("graft-sigtabch")
    val cap = graft.sources.cdc.CaptureFactory.fromProperties(Map(
      "debezium.source.connector.class" -> "io.debezium.connector.db2.Db2Connector",
      "debezium.source.path" -> db.toString,
      "debezium.source.jdbc.url" -> url,
      "debezium.source.db2.tables" -> "inv.accounts:id",
      "debezium.source.db2.emulated" -> "true",
      "debezium.source.signal.data.collection" -> "inv.graft_signal:id",
      "debezium.source.signal.channel.dir" -> chDir.toString))
    val tailer = cap.asInstanceOf[graft.sources.cdc.CaptureFactory.NativeCapture].tailer
    tailer.snapshotSchemaOnly()

    // an in-band execute-snapshot flows: source insert → poll → file
    // channel → processSignals → incremental snapshot
    signalCd(st, 20, "I", "sig-1", "execute-snapshot", "inv.accounts")
    tailer.poll()
    val channel = new graft.services.Signals.Channel(chDir)
    assert(graft.pipeline.CdcPipeline.processSignals(
      spark, channel, queries = Map.empty, native = Some(tailer)).isEmpty)

    val batch = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", keyDdl).option("rowSchema", rowDdl)
      .load()
    assert(batch.filter(col("value.source.snapshot") === "incremental").count() == 4)

    // missing channel dir fails at startup, not first signal
    intercept[RuntimeException](graft.sources.cdc.CaptureFactory.fromProperties(Map(
      "debezium.source.connector.class" -> "io.debezium.connector.db2.Db2Connector",
      "debezium.source.path" -> db.toString,
      "debezium.source.jdbc.url" -> url,
      "debezium.source.db2.tables" -> "inv.accounts:id",
      "debezium.source.db2.emulated" -> "true",
      "debezium.source.signal.data.collection" -> "inv.graft_signal:id")))
  }
}
