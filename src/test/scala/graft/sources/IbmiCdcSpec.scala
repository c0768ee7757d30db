package graft.sources

import graft.SparkSpec
import graft.sources.cdc.IbmiJournalTailer
import graft.sources.cdc.IbmiJournalTailer.{EmulatedDialect, IbmiDialect, TableSpec}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** IBM i journal capture: Derby hosts a journal-entry table of the
  * documented DISPLAY_JOURNAL shape (`SEQUENCE_NUMBER` /
  * `JOURNAL_CODE` 'R' / `JOURNAL_ENTRY_TYPE` PT,PX,UB,UP,DL /
  * `ENTRY_DATA`), and the tailer decodes entries into c/u/d
  * envelopes — pairing each UB before image with its following UP —
  * streaming into the same cdc07 layout as every other capture. */
class IbmiCdcSpec extends SparkSpec {

  private val keyDdl = "id INT"
  private val rowDdl = "id INT, name STRING, email STRING"

  private def fixtureDb(): (String, java.sql.Connection) = {
    val url = s"jdbc:derby:memory:ibmi${java.util.UUID.randomUUID().toString.take(8)};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE SCHEMA inv")
    st.execute("CREATE TABLE inv.staff (id INT PRIMARY KEY, " +
      "name VARCHAR(64), email VARCHAR(64))")
    st.execute("CREATE SCHEMA jrn")
    st.execute("""CREATE TABLE jrn."inv_staff_JOURNAL" (""" +
      "sequence_number BIGINT, journal_code CHAR(1), " +
      "journal_entry_type CHAR(2), entry_data VARCHAR(4000))")
    st.close()
    (url, conn)
  }

  private def entry(conn: java.sql.Connection, seq: Long, entryType: String,
                    data: String, code: String = "R"): Unit = {
    val ps = conn.prepareStatement(
      """INSERT INTO jrn."inv_staff_JOURNAL" VALUES (?, ?, ?, ?)""")
    try { ps.setLong(1, seq); ps.setString(2, code); ps.setString(3, entryType)
          ps.setString(4, data); ps.executeUpdate(); () }
    finally ps.close()
  }

  test("ibmi journal: PT/UB+UP/DL decode to c/u/d with paired before images") {
    val (url, conn) = fixtureDb()
    val st = conn.createStatement()
    st.execute("INSERT INTO inv.staff VALUES (1, 'Sally', 'sally@acme.com')")
    st.execute("INSERT INTO inv.staff VALUES (2, 'George', 'george@old.com')")

    val db = Files.createTempDirectory("graft-ibmi")
    val tailer = new IbmiJournalTailer(url, db,
      Seq(TableSpec("inv", "staff", Seq("id"))), dialect = EmulatedDialect)
    tailer.snapshot()

    entry(conn, 10, "PT", """{"id":3,"name":"Jon","email":"jon@got.com"}""")
    // IMAGES(*BOTH): UB carries the before image, the following UP the after
    entry(conn, 11, "UB", """{"id":2,"name":"George","email":"george@old.com"}""")
    entry(conn, 12, "UP", """{"id":2,"name":"George","email":"george@new.com"}""")
    entry(conn, 13, "DL", """{"id":1,"name":"Sally","email":"sally@acme.com"}""")
    assert(tailer.poll() == 4) // c + u + d + tombstone (UB emits nothing itself)
    assert(tailer.poll() == 0)

    val batch = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", keyDdl).option("rowSchema", rowDdl)
      .load()
    assert(batch.filter(col("value.op") === "r").count() == 2)
    val ins = batch.filter(col("value.op") === "c").head()
    assert(ins.getAs[org.apache.spark.sql.Row]("value")
      .getAs[org.apache.spark.sql.Row]("after").getAs[Int]("id") == 3)
    val upd = batch.filter(col("value.op") === "u").head()
    val uval = upd.getAs[org.apache.spark.sql.Row]("value")
    assert(uval.getAs[org.apache.spark.sql.Row]("before").getAs[String]("email")
      == "george@old.com")
    assert(uval.getAs[org.apache.spark.sql.Row]("after").getAs[String]("email")
      == "george@new.com")
    val del = batch.filter(col("value.op") === "d").head()
    assert(del.getAs[org.apache.spark.sql.Row]("value")
      .getAs[org.apache.spark.sql.Row]("before").getAs[String]("email")
      == "sally@acme.com")
    assert(batch.filter(col("value").isNull && col("key").isNotNull).count() == 1)
    assert(batch.filter(col("value.source.connector") === "ibmi").count() == 3)
  }

  test("ibmi journal: UP without UB is an after-only update; unpaired UB refuses to advance") {
    val (url, conn) = fixtureDb()
    val db = Files.createTempDirectory("graft-ibmib")
    val spec = TableSpec("inv", "staff", Seq("id"))
    val tailer = new IbmiJournalTailer(url, db, Seq(spec), dialect = EmulatedDialect)
    tailer.snapshot()

    // IMAGES(*AFTER) shape: lone UP decodes with a null before image
    entry(conn, 20, "UP", """{"id":7,"name":"Ada","email":"ada@x.com"}""")
    assert(tailer.poll() == 1)

    // a batch ending in UB must not advance past half an update
    entry(conn, 21, "UB", """{"id":7,"name":"Ada","email":"ada@x.com"}""")
    val e = intercept[IllegalArgumentException](tailer.poll())
    assert(e.getMessage.contains("unpaired UB"), e.getMessage)
    // once the UP lands, the retry delivers the whole pair
    entry(conn, 22, "UP", """{"id":7,"name":"Ada","email":"ada@new.com"}""")
    assert(tailer.poll() == 1)

    // non-record journal codes are filtered by the dialect's query
    entry(conn, 23, "CM", """{}""", code = "C") // commit bookkeeping
    assert(tailer.poll() == 0)
  }

  test("ibmi journal: live dialect emits DISPLAY_JOURNAL; factory dispatches; unknown type fails") {
    val t = TableSpec("inv", "staff", Seq("id"), captureInstance = Some("invlib_jrnstaff"))
    val sql = IbmiDialect.changesSql(t)
    assert(sql.contains("QSYS2.DISPLAY_JOURNAL('INVLIB', 'JRNSTAFF'"), sql)
    assert(sql.contains("OBJECT_LIBRARY => 'INV'"), sql)
    assert(sql.contains("OBJECT_NAME => 'STAFF'"), sql)
    assert(sql.contains("JOURNAL_CODES => 'R'"), sql)
    assert(sql.contains("SEQUENCE_NUMBER > ?"), sql)

    val db = Files.createTempDirectory("graft-ibmic")
    val cap = graft.sources.cdc.CaptureFactory.fromProperties(Map(
      "debezium.source.connector.class" -> "io.debezium.connector.db2as400.As400RpcConnector",
      "debezium.source.path" -> db.toString,
      "debezium.source.jdbc.url" -> "jdbc:derby:memory:ibmidisp;create=true",
      "debezium.source.ibmi.tables" -> "inv.staff:id",
      "debezium.source.ibmi.emulated" -> "true"))
    cap match {
      case graft.sources.cdc.CaptureFactory.NativeCapture(tl: IbmiJournalTailer) =>
        assert(tl.tableSpecs == Seq(TableSpec("inv", "staff", Seq("id"))))
      case other => fail(s"expected NativeCapture(IbmiJournalTailer), got $other")
    }

    val (url, conn) = fixtureDb()
    val db2 = Files.createTempDirectory("graft-ibmid")
    val tailer = new IbmiJournalTailer(url, db2,
      Seq(TableSpec("inv", "staff", Seq("id"))), dialect = EmulatedDialect)
    tailer.snapshot()
    entry(conn, 40, "ZZ", """{"id":9}""")
    assertThrows[IllegalArgumentException](tailer.poll())
  }
}
