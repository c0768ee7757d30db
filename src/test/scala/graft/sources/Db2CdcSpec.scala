package graft.sources

import graft.SparkSpec
import graft.sources.cdc.Db2CdTailer
import graft.sources.cdc.Db2CdTailer.{Db2Dialect, EmulatedDialect, Position, TableSpec}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** DB2 SQL-Replication CD-table capture: Derby hosts a change-data
  * table of the documented public shape (`IBMSNAP_COMMITSEQ` /
  * `IBMSNAP_INTENTSEQ` / `IBMSNAP_OPERATION` + row image + X-prefixed
  * before-image columns), and the tailer decodes I/U/D into d/c/u
  * envelopes — hard deletes and update before images — streaming into
  * the same cdc07 layout as every other capture. */
class Db2CdcSpec extends SparkSpec {

  private val keyDdl = "id INT"
  private val rowDdl = "id INT, name STRING, email STRING"

  /** Derby emulation of a replication-registered database: source
    * table inv.accounts + CD table asn."inv_accounts_CD" with the
    * IBMSNAP metadata columns and X-prefixed before images. */
  private def fixtureDb(): (String, java.sql.Statement) = {
    val url = s"jdbc:derby:memory:db2${java.util.UUID.randomUUID().toString.take(8)};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE SCHEMA inv")
    st.execute("CREATE TABLE inv.accounts (id INT PRIMARY KEY, " +
      "name VARCHAR(64), email VARCHAR(64))")
    st.execute("CREATE SCHEMA asn")
    st.execute("""CREATE TABLE asn."inv_accounts_CD" (""" +
      "ibmsnap_commitseq BIGINT, ibmsnap_intentseq BIGINT, " +
      "ibmsnap_operation CHAR(1), " +
      "id INT, name VARCHAR(64), email VARCHAR(64), " +
      "xid INT, xname VARCHAR(64), xemail VARCHAR(64))")
    (url, st)
  }

  /** One CD row: after image always, before image only on 'U'. */
  private def cd(st: java.sql.Statement, commit: Long, intent: Long, op: String,
                 id: Int, n: String, e: String,
                 before: Option[(Int, String, String)] = None): Unit = {
    val (xi, xn, xe) = before.map { case (a, b, c) => (a.toString, s"'$b'", s"'$c'") }
      .getOrElse(("NULL", "NULL", "NULL"))
    st.execute(s"""INSERT INTO asn."inv_accounts_CD" VALUES """ +
      s"($commit, $intent, '$op', $id, '$n', '$e', $xi, $xn, $xe)")
  }

  test("db2 cd: I/U/D decode to c/u/d with X-prefixed before images and hard deletes") {
    val (url, st) = fixtureDb()
    st.execute("INSERT INTO inv.accounts VALUES (1, 'Sally', 'sally@acme.com')")
    st.execute("INSERT INTO inv.accounts VALUES (2, 'George', 'george@old.com')")

    val db = Files.createTempDirectory("graft-db2")
    val tailer = new Db2CdTailer(url, db,
      Seq(TableSpec("inv", "accounts", Seq("id"))), dialect = EmulatedDialect)
    tailer.snapshot()

    cd(st, 10, 1, "I", 3, "Jon", "jon@got.com")
    cd(st, 11, 1, "U", 2, "George", "george@new.com",
      before = Some((2, "George", "george@old.com")))
    cd(st, 12, 1, "D", 1, "Sally", "sally@acme.com")
    assert(tailer.poll() == 4) // c + u + d + tombstone
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
    assert(batch.filter(col("value.source.connector") === "db2").count() == 3)
  }

  test("db2 cd: column drift in the change feed records schema history once, survives restart") {
    val (url, st) = fixtureDb()
    val db = Files.createTempDirectory("graft-db2sh")
    val histDir = Files.createTempDirectory("graft-db2shlog")
    val hist = new graft.services.SchemaHistory(histDir)
    val spec = TableSpec("inv", "accounts", Seq("id"))
    val tailer = new Db2CdTailer(url, db, Seq(spec), dialect = EmulatedDialect)
      .withSchemaHistory(hist)
    tailer.snapshot()

    cd(st, 10, 1, "I", 1, "A", "a@x.com")
    tailer.poll()
    assert(hist.replay().size == 1) // first observation announces the set
    assert(hist.replay().head.destination == "testc.inv.accounts.schema-changes")
    assert(hist.replay().head.ddl.contains("\"columns\":\"email,id,name\""))

    cd(st, 11, 1, "I", 2, "B", "b@x.com")
    tailer.poll()
    assert(hist.replay().size == 1, "an unchanged column set must not re-announce")

    // ALTER adds a column — the next change row carries it
    st.execute("""ALTER TABLE asn."inv_accounts_CD" ADD COLUMN phone VARCHAR(32)""")
    st.execute("""INSERT INTO asn."inv_accounts_CD" VALUES """ +
      "(12, 1, 'I', 3, 'C', 'c@x.com', NULL, NULL, NULL, '555-1234')")
    tailer.poll()
    assert(hist.replay().size == 2)
    assert(hist.currentSchemas()("testc.inv.accounts.schema-changes")
      .contains("email,id,name,phone"))

    // a restarted tailer reloads the known set — no re-announcement
    val tailer2 = new Db2CdTailer(url, db, Seq(spec), dialect = EmulatedDialect)
      .withSchemaHistory(hist)
    st.execute("""INSERT INTO asn."inv_accounts_CD" VALUES """ +
      "(13, 1, 'I', 4, 'D', 'd@x.com', NULL, NULL, NULL, NULL)")
    tailer2.poll()
    assert(hist.replay().size == 2)
  }

  test("db2 cd: position survives restart; pre-snapshot CD rows excluded; intra-commit resume") {
    val (url, st) = fixtureDb()
    st.execute("INSERT INTO inv.accounts VALUES (1, 'A', 'a@x.com')")
    cd(st, 5, 1, "I", 1, "A", "a@x.com") // pre-dates the snapshot

    val db = Files.createTempDirectory("graft-db2b")
    val spec = TableSpec("inv", "accounts", Seq("id"))
    val tailer = new Db2CdTailer(url, db, Seq(spec), dialect = EmulatedDialect)
    tailer.snapshot()
    assert(tailer.poll() == 0, "pre-snapshot CD rows must not re-deliver")

    cd(st, 20, 1, "I", 2, "B", "b@x.com")
    cd(st, 20, 2, "I", 3, "C", "c@x.com")
    assert(tailer.poll() == 2)

    val tailer2 = new Db2CdTailer(url, db, Seq(spec), dialect = EmulatedDialect)
    cd(st, 20, 3, "I", 4, "D", "d@x.com") // late row in the same commit
    cd(st, 21, 1, "I", 5, "E", "e@x.com")
    assert(tailer2.poll() == 2)
    assert(tailer2.poll() == 0)
  }

  test("db2 cd: live dialect emits the documented ASN SQL; factory dispatches; unknown op fails loudly") {
    val t = TableSpec("inv", "accounts", Seq("id"))
    val sql = Db2Dialect.changesSql(t)
    assert(sql.contains("""FROM ASN."inv_accounts_CD""""), sql)
    assert(sql.contains("IBMSNAP_COMMITSEQ > ? OR (IBMSNAP_COMMITSEQ = ? AND IBMSNAP_INTENTSEQ > ?)"), sql)
    assert(sql.contains("ORDER BY IBMSNAP_COMMITSEQ, IBMSNAP_INTENTSEQ"), sql)
    // char(10) for-bit-data sequence bytes round-trip
    val enc = Db2Dialect.seqBytes(BigInt("00002fa80000116e", 16))
    assert(enc.length == 10 && Db2CdTailer.bigIntOf(enc) == BigInt("00002fa80000116e", 16))

    val db = Files.createTempDirectory("graft-db2c")
    val cap = graft.sources.cdc.CaptureFactory.fromProperties(Map(
      "debezium.source.connector.class" -> "io.debezium.connector.db2.Db2Connector",
      "debezium.source.path" -> db.toString,
      "debezium.source.jdbc.url" -> "jdbc:derby:memory:db2disp;create=true",
      "debezium.source.db2.tables" -> "inv.accounts:id",
      "debezium.source.db2.emulated" -> "true"))
    cap match {
      case graft.sources.cdc.CaptureFactory.NativeCapture(tl: Db2CdTailer) =>
        assert(tl.tableSpecs == Seq(t))
        assert(tl.changesSqlFor(t) == EmulatedDialect.changesSql(t))
      case other => fail(s"expected NativeCapture(Db2CdTailer), got $other")
    }

    // unknown op code fails loudly, never silently drops a change
    val (url, st) = fixtureDb()
    val db2 = Files.createTempDirectory("graft-db2d")
    val tailer = new Db2CdTailer(url, db2, Seq(t), dialect = EmulatedDialect)
    tailer.snapshot()
    cd(st, 40, 1, "X", 9, "Bad", "bad@x.com")
    assertThrows[IllegalArgumentException](tailer.poll())
  }
}
