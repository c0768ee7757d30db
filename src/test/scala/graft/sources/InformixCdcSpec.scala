package graft.sources

import graft.SparkSpec
import graft.sources.cdc.InformixCdcTailer
import graft.sources.cdc.InformixCdcTailer.{EmulatedDialect, TableSpec}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Informix Change-Streams capture: Derby hosts a CDC-record table of
  * the session's public record shape (typed records streaming in LOG
  * order, before commit), and the tailer carries the family's
  * distinctive machinery — per-transaction buffering with COMMTX
  * emit / RBTX discard, UPDBEF→UPDAFT pairing, commit-ordered
  * (commit seqnum, index) positions, TRUNCATE skipped-and-counted —
  * into the same cdc07 layout as every other capture. */
class InformixCdcSpec extends SparkSpec {

  private val keyDdl = "id INT"
  private val rowDdl = "id INT, name STRING, qty BIGINT"

  private def fixtureDb(): (String, java.sql.Connection) = {
    val url = s"jdbc:derby:memory:ifx${java.util.UUID.randomUUID().toString.take(8)};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE SCHEMA stock")
    st.execute("CREATE TABLE stock.items (id INT PRIMARY KEY, " +
      "name VARCHAR(64), qty BIGINT)")
    st.execute("CREATE SCHEMA ifx")
    st.execute("""CREATE TABLE ifx."stock_items_CDCRECORDS" (""" +
      "seqnum BIGINT, txid BIGINT, rectype VARCHAR(12), data VARCHAR(4000))")
    st.close()
    (url, conn)
  }

  private def rec(conn: java.sql.Connection, seq: Long, tx: Long,
                  recType: String, data: String): Unit = {
    val ps = conn.prepareStatement(
      """INSERT INTO ifx."stock_items_CDCRECORDS" VALUES (?, ?, ?, ?)""")
    try { ps.setLong(1, seq); ps.setLong(2, tx); ps.setString(3, recType)
          ps.setString(4, data); ps.executeUpdate(); () }
    finally ps.close()
  }

  test("informix: committed transactions emit in commit order; rollbacks discard; UPDBEF pairs") {
    val (url, conn) = fixtureDb()
    val st = conn.createStatement()
    st.execute("INSERT INTO stock.items VALUES (1, 'bolt', 100)")

    val db = Files.createTempDirectory("graft-ifx")
    val tailer = new InformixCdcTailer(url, db,
      Seq(TableSpec("stock", "items", Seq("id"))))
    tailer.snapshot()

    // tx 7: insert + paired update, committed
    rec(conn, 10, 7, "BEGINTX", null)
    rec(conn, 11, 7, "INSERT", """{"id":2,"name":"nut","qty":50}""")
    rec(conn, 12, 7, "UPDBEF", """{"id":1,"name":"bolt","qty":100}""")
    rec(conn, 13, 7, "UPDAFT", """{"id":1,"name":"bolt","qty":90}""")
    rec(conn, 14, 7, "COMMTX", null)
    // tx 8: delete... ROLLED BACK — must never surface
    rec(conn, 15, 8, "BEGINTX", null)
    rec(conn, 16, 8, "DELETE", """{"id":2,"name":"nut","qty":50}""")
    rec(conn, 17, 8, "RBTX", null)
    // tx 9: a real delete + a TRUNCATE record (skipped-and-counted)
    rec(conn, 18, 9, "BEGINTX", null)
    rec(conn, 19, 9, "TRUNCATE", """{}""")
    rec(conn, 20, 9, "DELETE", """{"id":1,"name":"bolt","qty":90}""")
    rec(conn, 21, 9, "COMMTX", null)

    assert(tailer.poll() == 4) // c + u + d + tombstone; never the rolled-back delete
    assert(tailer.discardedTransactions == 1)
    assert(tailer.skippedTruncates == 1)
    assert(tailer.poll() == 0)
    assert(tailer.discardedTransactions == 1, "re-polls must not re-count rollbacks")
    assert(tailer.skippedTruncates == 1)

    val batch = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", keyDdl).option("rowSchema", rowDdl)
      .load()
    assert(batch.filter(col("value.op") === "r").count() == 1)
    val ins = batch.filter(col("value.op") === "c").head()
      .getAs[org.apache.spark.sql.Row]("value")
    assert(ins.getAs[org.apache.spark.sql.Row]("after").getAs[Long]("qty") == 50L)
    val upd = batch.filter(col("value.op") === "u").head()
      .getAs[org.apache.spark.sql.Row]("value")
    assert(upd.getAs[org.apache.spark.sql.Row]("before").getAs[Long]("qty") == 100L)
    assert(upd.getAs[org.apache.spark.sql.Row]("after").getAs[Long]("qty") == 90L)
    val del = batch.filter(col("value.op") === "d").head()
      .getAs[org.apache.spark.sql.Row]("value")
    assert(del.getAs[org.apache.spark.sql.Row]("before").getAs[Int]("id") == 1)
    // the rolled-back tx's delete of id 2 never reached the layout
    assert(batch.filter(col("value.op") === "d").count() == 1)
    assert(batch.filter(col("value.source.connector") === "informix").count() == 3)
  }

  test("informix: an open transaction at batch end emits nothing and re-reads whole next poll") {
    val (url, conn) = fixtureDb()
    val db = Files.createTempDirectory("graft-ifxb")
    val spec = TableSpec("stock", "items", Seq("id"))
    val tailer = new InformixCdcTailer(url, db, Seq(spec))
    tailer.snapshot()

    rec(conn, 10, 5, "BEGINTX", null)
    rec(conn, 11, 5, "INSERT", """{"id":3,"name":"pin","qty":7}""")
    assert(tailer.poll() == 0, "uncommitted work must not emit")
    // the commit arrives: the WHOLE transaction re-reads and emits once
    rec(conn, 12, 5, "COMMTX", null)
    assert(tailer.poll() == 1)
    assert(tailer.poll() == 0)

    // restart resumes past the commit position
    val tailer2 = new InformixCdcTailer(url, db, Seq(spec))
    rec(conn, 13, 6, "BEGINTX", null)
    rec(conn, 14, 6, "INSERT", """{"id":4,"name":"rod","qty":8}""")
    rec(conn, 15, 6, "COMMTX", null)
    assert(tailer2.poll() == 1)
  }

  test("informix: a mid-transaction flushed position resumes exactly — the committed tail re-reads, nothing is lost") {
    val (url, conn) = fixtureDb()
    val db = Files.createTempDirectory("graft-ifxr")
    val spec = TableSpec("stock", "items", Seq("id"))
    val tailer = new InformixCdcTailer(url, db, Seq(spec))
    tailer.snapshot()

    rec(conn, 10, 5, "BEGINTX", null)
    rec(conn, 11, 5, "INSERT", """{"id":1,"name":"a","qty":1}""")
    rec(conn, 12, 5, "INSERT", """{"id":2,"name":"b","qty":2}""")
    rec(conn, 13, 5, "INSERT", """{"id":3,"name":"c","qty":3}""")
    rec(conn, 14, 5, "COMMTX", null)
    assert(tailer.poll() == 3)

    // simulate a crash right after the durable flush of the FIRST
    // emitted record: positions persist per flush, so the state file
    // legitimately holds (11, 0) mid-transaction
    val state = db.resolve("_informix_state")
    Files.writeString(state, "lsn 1\npos stock_items b:0\n") // 0xb = seq 11
    val tailer2 = new InformixCdcTailer(url, db, Seq(spec))
    // the headless tail (records 12, 13 + the COMMTX) re-reads and
    // emits EXACTLY the unflushed remainder
    assert(tailer2.poll() == 2)
    assert(tailer2.poll() == 0)
  }

  test("informix: snapshot during an open transaction anchors at the last terminator; the open tx replays whole") {
    val (url, conn) = fixtureDb()
    // a COMMITTED tx before the snapshot: in the snapshot image,
    // must never re-deliver
    rec(conn, 1, 1, "BEGINTX", null)
    rec(conn, 2, 1, "INSERT", """{"id":9,"name":"pre","qty":9}""")
    rec(conn, 3, 1, "COMMTX", null)
    // an OPEN tx while the snapshot runs: invisible to the snapshot
    // read, must replay WHOLE once its commit arrives
    rec(conn, 10, 2, "BEGINTX", null)
    rec(conn, 11, 2, "INSERT", """{"id":1,"name":"mid","qty":1}""")

    val db = Files.createTempDirectory("graft-ifxs")
    val tailer = new InformixCdcTailer(url, db,
      Seq(TableSpec("stock", "items", Seq("id"))))
    tailer.snapshot()
    assert(tailer.poll() == 0, "nothing committed past the snapshot anchor yet")
    rec(conn, 12, 2, "COMMTX", null)
    assert(tailer.poll() == 1, "the straddling transaction must deliver after its commit")
    assert(tailer.poll() == 0)
  }

  test("informix: a truncate inside a rolled-back transaction never counts as skipped work") {
    val (url, conn) = fixtureDb()
    val db = Files.createTempDirectory("graft-ifxt")
    val tailer = new InformixCdcTailer(url, db,
      Seq(TableSpec("stock", "items", Seq("id"))))
    tailer.snapshot()
    rec(conn, 10, 3, "BEGINTX", null)
    rec(conn, 11, 3, "TRUNCATE", """{}""")
    rec(conn, 12, 3, "RBTX", null)
    assert(tailer.poll() == 0)
    assert(tailer.skippedTruncates == 0, "rolled-back truncates never happened")
    assert(tailer.discardedTransactions == 1)
  }

  test("informix: interleaved transactions, orphan records, and unknown types fail loudly") {
    val (url, conn) = fixtureDb()
    val db = Files.createTempDirectory("graft-ifxc")
    val spec = TableSpec("stock", "items", Seq("id"))
    val tailer = new InformixCdcTailer(url, db, Seq(spec))
    tailer.snapshot()

    // a data record with no BEGINTX
    rec(conn, 10, 1, "INSERT", """{"id":5,"name":"x","qty":1}""")
    val e1 = intercept[IllegalArgumentException](tailer.poll())
    assert(e1.getMessage.contains("outside a transaction"), e1.getMessage)
    rec(conn, 9, 1, "BEGINTX", null) // heal: BEGINTX precedes in seq order
    rec(conn, 11, 2, "BEGINTX", null)
    val e2 = intercept[IllegalArgumentException](tailer.poll())
    assert(e2.getMessage.contains("interleaved"), e2.getMessage)
  }

  test("informix: session-call artifact and factory dispatch") {
    val t = TableSpec("stock", "items", Seq("id"))
    val calls = InformixCdcTailer.sessionSetupCalls(t)
    assert(calls.head.contains("cdc_opensess('syscdcv1'"), calls.head)
    assert(calls.exists(_.contains("cdc_set_fullrowlogging('stock.items', 1)")))
    assert(calls.exists(_.contains("cdc_startcapture")))
    assert(calls.last.contains("cdc_activatesess"))

    val db = Files.createTempDirectory("graft-ifxd")
    val cap = graft.sources.cdc.CaptureFactory.fromProperties(Map(
      "debezium.source.connector.class" -> "io.debezium.connector.informix.InformixConnector",
      "debezium.source.path" -> db.toString,
      "debezium.source.jdbc.url" -> "jdbc:derby:memory:ifxdisp;create=true",
      "debezium.source.informix.tables" -> "stock.items:id"))
    cap match {
      case graft.sources.cdc.CaptureFactory.NativeCapture(tl: InformixCdcTailer) =>
        assert(tl.tableSpecs == Seq(t))
        assert(tl.changesSqlFor(t) == EmulatedDialect.changesSql(t))
      case other => fail(s"expected NativeCapture(InformixCdcTailer), got $other")
    }
    // DataStax Enterprise dispatches onto the Cassandra commitlog family
    val db2 = Files.createTempDirectory("graft-dsed")
    graft.sources.cdc.CaptureFactory.fromProperties(Map(
      "debezium.source.connector.class" -> "io.debezium.connector.dse.DseConnector",
      "debezium.source.path" -> db2.toString,
      "debezium.source.jdbc.url" -> "jdbc:derby:memory:dsedisp;create=true",
      "debezium.source.cassandra.tables" -> "iot.readings:sensor_id")) match {
      case graft.sources.cdc.CaptureFactory.NativeCapture(
        _: graft.sources.cdc.CassandraCommitlogTailer) => ()
      case other => fail(s"expected NativeCapture(CassandraCommitlogTailer), got $other")
    }
  }
}
