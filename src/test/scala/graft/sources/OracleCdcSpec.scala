package graft.sources

import graft.SparkSpec
import graft.sinks.ParquetUpsertSink
import graft.sources.cdc.OracleLogMinerTailer
import graft.sources.cdc.OracleLogMinerTailer.{EmulatedDialect, LogMinerDialect, Position, TableSpec}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Oracle LogMiner capture: Derby hosts a mined-contents table of the
  * documented public shape (`SCN`/`SSN`/`OPERATION`/`SQL_REDO`), and
  * the tailer decodes each redo statement via [[graft.sources.cdc.OracleRedoParser]]
  * into d/c/u envelopes — including the two shapes the watermark
  * poller can never see: HARD deletes (the WHERE image) and UPDATE
  * BEFORE images (WHERE = before, SET over it = after) — streaming
  * into the same cdc07 layout as every other capture. */
class OracleCdcSpec extends SparkSpec {

  private val keyDdl = "id INT"
  private val rowDdl = "id INT, first_name STRING, last_name STRING, email STRING"

  /** Derby emulation of a mined redo stream: source table
    * inv.customers + mined-contents table logmnr."inv_customers_CONTENTS"
    * (quoted to keep the capture-instance naming verbatim). */
  private def fixtureDb(): (String, java.sql.Connection) = {
    val url = s"jdbc:derby:memory:oracle${System.nanoTime()};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE SCHEMA inv")
    st.execute("CREATE TABLE inv.customers (id INT PRIMARY KEY, " +
      "first_name VARCHAR(64), last_name VARCHAR(64), email VARCHAR(64))")
    st.execute("CREATE SCHEMA logmnr")
    st.execute("""CREATE TABLE logmnr."inv_customers_CONTENTS" (""" +
      "scn BIGINT, ssn BIGINT, operation VARCHAR(16), sql_redo VARCHAR(4000))")
    st.close()
    (url, conn)
  }

  /** One mined row — SQL_REDO carries embedded quotes, so bind it. */
  private def mined(conn: java.sql.Connection, scn: Long, ssn: Long,
                    op: String, redo: String): Unit = {
    val ps = conn.prepareStatement(
      """INSERT INTO logmnr."inv_customers_CONTENTS" VALUES (?, ?, ?, ?)""")
    try { ps.setLong(1, scn); ps.setLong(2, ssn); ps.setString(3, op)
          ps.setString(4, redo); ps.executeUpdate(); () }
    finally ps.close()
  }

  test("oracle logminer: redo SQL decodes to d/c/u with before images and hard deletes") {
    val (url, conn) = fixtureDb()
    val st = conn.createStatement()
    st.execute("INSERT INTO inv.customers VALUES (1001, 'Sally', 'Thomas', 'sally.thomas@acme.com')")
    st.execute("INSERT INTO inv.customers VALUES (1002, 'George', 'Bailey', 'gbailey@foobar.com')")

    val db = Files.createTempDirectory("graft-oracle")
    val tailer = new OracleLogMinerTailer(url, db,
      Seq(TableSpec("inv", "customers", Seq("id"))), dialect = EmulatedDialect)
    tailer.snapshot()

    // SCN 10: insert 1005
    mined(conn, 10, 1, "INSERT",
      """insert into "INV"."CUSTOMERS"("ID","FIRST_NAME","LAST_NAME","EMAIL") """ +
      """values (1005,'Jon','Snow','jon@got.com');""")
    // SCN 11: update 1002 — ALL-column supplemental logging puts the
    // complete before image in the WHERE clause (plus ROWID, skipped)
    mined(conn, 11, 1, "UPDATE",
      """update "INV"."CUSTOMERS" set "EMAIL" = 'george@example.com' where """ +
      """"ID" = 1002 and "FIRST_NAME" = 'George' and "LAST_NAME" = 'Bailey' and """ +
      """"EMAIL" = 'gbailey@foobar.com' and ROWID = 'AAAV/NAAEAAAACnAAB';""")
    // SCN 12: HARD delete 1001 (the WHERE image is the deleted row)
    mined(conn, 12, 1, "DELETE",
      """delete from "INV"."CUSTOMERS" where "ID" = 1001 and "FIRST_NAME" = 'Sally' """ +
      """and "LAST_NAME" = 'Thomas' and "EMAIL" = 'sally.thomas@acme.com';""")
    assert(tailer.poll() == 4) // c + u + d + tombstone
    assert(tailer.poll() == 0) // position advanced: nothing re-delivers

    val batch = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", keyDdl).option("rowSchema", rowDdl)
      .load()
    assert(batch.filter(col("value.op") === "r").count() == 2) // snapshot rows
    val ins = batch.filter(col("value.op") === "c").head()
    assert(ins.getAs[org.apache.spark.sql.Row]("value")
      .getAs[org.apache.spark.sql.Row]("after").getAs[Int]("id") == 1005)
    // the update carries its BEFORE image — what polling can't see
    val upd = batch.filter(col("value.op") === "u").head()
    val uval = upd.getAs[org.apache.spark.sql.Row]("value")
    assert(uval.getAs[org.apache.spark.sql.Row]("before").getAs[String]("email")
      == "gbailey@foobar.com")
    assert(uval.getAs[org.apache.spark.sql.Row]("after").getAs[String]("email")
      == "george@example.com")
    // the SET overlay keeps un-touched columns from the before image
    assert(uval.getAs[org.apache.spark.sql.Row]("after").getAs[String]("first_name")
      == "George")
    val del = batch.filter(col("value.op") === "d").head()
    assert(del.getAs[org.apache.spark.sql.Row]("value")
      .getAs[org.apache.spark.sql.Row]("before").getAs[String]("email")
      == "sally.thomas@acme.com")
    assert(batch.filter(col("value").isNull && col("key").isNotNull).count() == 1)
    assert(batch.filter(col("value.source.connector") === "oracle").count() == 3)

    // end-to-end into the upsert sink: final state = live-table algebra
    val out = Files.createTempDirectory("graft-oracle-sink").toString
    val ckpt = Files.createTempDirectory("graft-oracle-ckpt").toString
    val sink = new ParquetUpsertSink(out, keyFields = Seq("id"))
    val q = spark.readStream.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", keyDdl).option("rowSchema", rowDdl)
      .load()
      .writeStream.foreachBatch(sink.foreachBatchFn)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val state = sink.readTable(spark, "testc.inv.customers").orderBy("id").collect()
    assert(state.map(_.getAs[Int]("id")).toSeq == Seq(1002, 1005))
    assert(state.head.getAs[String]("email") == "george@example.com")
  }

  test("oracle logminer: position survives restart; pre-snapshot redo excluded; mid-SCN resume") {
    val (url, conn) = fixtureDb()
    conn.createStatement().execute("INSERT INTO inv.customers VALUES (1, 'A', 'A', 'a@x.com')")
    def ins(scn: Long, ssn: Long, id: Int, n: String): Unit =
      mined(conn, scn, ssn, "INSERT",
        s"""insert into "INV"."CUSTOMERS"("ID","FIRST_NAME","LAST_NAME","EMAIL") """ +
        s"""values ($id,'$n','$n','$n@x.com');""")
    // redo that PRE-DATES the snapshot: already in the snapshot image
    ins(5, 1, 1, "A")

    val db = Files.createTempDirectory("graft-oracle2")
    val spec = TableSpec("inv", "customers", Seq("id"))
    val tailer = new OracleLogMinerTailer(url, db, Seq(spec), dialect = EmulatedDialect)
    tailer.snapshot()
    assert(tailer.poll() == 0, "pre-snapshot redo must not re-deliver")

    // two statements in ONE SCN (ssn 1 and 2)
    ins(20, 1, 2, "B"); ins(20, 2, 3, "C")
    assert(tailer.poll() == 2)

    // a NEW tailer (restart) resumes from the persisted position —
    // including the SSN within SCN 20
    val tailer2 = new OracleLogMinerTailer(url, db, Seq(spec), dialect = EmulatedDialect)
    ins(20, 3, 4, "D") // late statement in the same SCN
    ins(21, 1, 5, "E")
    assert(tailer2.poll() == 2)
    assert(tailer2.poll() == 0)

    val batch = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", keyDdl).option("rowSchema", rowDdl)
      .load()
    assert(batch.filter(col("value.op") === "c").count() == 4)
  }

  test("oracle logminer: corrupt mines fail loudly — op mismatch and wrong-table redo") {
    val (url, conn) = fixtureDb()
    val db = Files.createTempDirectory("graft-oracle3")
    val spec = TableSpec("inv", "customers", Seq("id"))
    val tailer = new OracleLogMinerTailer(url, db, Seq(spec), dialect = EmulatedDialect)
    tailer.snapshot()
    // OPERATION says DELETE but the redo is an insert
    mined(conn, 30, 1, "DELETE",
      """insert into "INV"."CUSTOMERS"("ID") values (9);""")
    assertThrows[IllegalArgumentException](tailer.poll())
    conn.createStatement().execute(
      """DELETE FROM logmnr."inv_customers_CONTENTS"""")
    // redo for a table that is not this capture's
    mined(conn, 31, 1, "INSERT",
      """insert into "INV"."ORDERS"("ID") values (9);""")
    assertThrows[IllegalArgumentException](tailer.poll())
  }

  test("oracle logminer: live dialect emits the documented V$LOGMNR_CONTENTS SQL; factory dispatches") {
    val t = TableSpec("inv", "customers", Seq("id"))
    // the deployable artifact for a real Oracle: the mining-session
    // block + the mined-contents poll with SCN binds
    val setup = LogMinerDialect.sessionSetupSql(Position(BigInt(100), BigInt(0))).get
    assert(setup.contains("DBMS_LOGMNR.START_LOGMNR"), setup)
    assert(setup.contains("STARTSCN => 100"), setup)
    assert(setup.contains("DICT_FROM_ONLINE_CATALOG"), setup)
    assert(setup.contains("COMMITTED_DATA_ONLY"), setup)
    val sql = LogMinerDialect.changesSql(t)
    assert(sql.contains("FROM V$LOGMNR_CONTENTS"), sql)
    assert(sql.contains("SEG_OWNER = 'INV'"), sql)
    assert(sql.contains("TABLE_NAME = 'CUSTOMERS'"), sql)
    assert(sql.contains("OPERATION IN ('INSERT','UPDATE','DELETE')"), sql)
    assert(sql.contains("ORDER BY SCN, SSN"), sql)
    assert(EmulatedDialect.sessionSetupSql(Position.Min).isEmpty)

    // connector-class dispatch
    val db = Files.createTempDirectory("graft-oracle4")
    val cap = graft.sources.cdc.CaptureFactory.fromProperties(Map(
      "debezium.source.connector.class" -> "io.debezium.connector.oracle.OracleConnector",
      "debezium.source.path" -> db.toString,
      "debezium.source.jdbc.url" -> "jdbc:derby:memory:oradisp;create=true",
      "debezium.source.oracle.tables" -> "inv.customers:id",
      "debezium.source.oracle.emulated" -> "true"))
    cap match {
      case graft.sources.cdc.CaptureFactory.NativeCapture(tl: OracleLogMinerTailer) =>
        assert(tl.tableSpecs == Seq(t))
        assert(tl.changesSqlFor(t) == EmulatedDialect.changesSql(t))
        assert(tl.sessionSetupFor(Position.Min).isEmpty)
      case other => fail(s"expected NativeCapture(OracleLogMinerTailer), got $other")
    }
  }
}
