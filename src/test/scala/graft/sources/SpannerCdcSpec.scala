package graft.sources

import graft.SparkSpec
import graft.sources.cdc.SpannerChangeStreamTailer
import graft.sources.cdc.SpannerChangeStreamTailer.{EmulatedDialect, Position, SpannerDialect, TableSpec}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Cloud Spanner change-stream capture: Derby hosts a change-record
  * table of the documented public shape (`commit_timestamp` micros /
  * `record_sequence` / `mod_type` / `mods[]` with keys + new_values +
  * old_values JSON), and the tailer decodes INSERT/UPDATE/DELETE mods
  * into c/u/d envelopes — hard deletes and update before images —
  * streaming into the same cdc07 layout as every other capture. */
class SpannerCdcSpec extends SparkSpec {

  private val keyDdl = "id INT"
  private val rowDdl = "id INT, name STRING, email STRING"

  /** Derby emulation of a change-stream-covered database: source
    * table inv.users + change-record table
    * cs."inv_users_CHANGE_RECORDS" of the DataChangeRecord shape. */
  private def fixtureDb(): (String, java.sql.Connection) = {
    val url = s"jdbc:derby:memory:spanner${java.util.UUID.randomUUID().toString.take(8)};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE SCHEMA inv")
    st.execute("CREATE TABLE inv.users (id INT PRIMARY KEY, " +
      "name VARCHAR(64), email VARCHAR(64))")
    st.execute("CREATE SCHEMA cs")
    st.execute("""CREATE TABLE cs."inv_users_CHANGE_RECORDS" (""" +
      "commit_micros BIGINT, record_sequence BIGINT, " +
      "mod_type VARCHAR(16), mods VARCHAR(4000))")
    st.close()
    (url, conn)
  }

  /** One change record — mods is a JSON array, bound to keep quoting
    * out of the SQL text. */
  private def rec(conn: java.sql.Connection, commit: Long, seq: Long,
                  modType: String, mods: String): Unit = {
    val ps = conn.prepareStatement(
      """INSERT INTO cs."inv_users_CHANGE_RECORDS" VALUES (?, ?, ?, ?)""")
    try { ps.setLong(1, commit); ps.setLong(2, seq); ps.setString(3, modType)
          ps.setString(4, mods); ps.executeUpdate(); () }
    finally ps.close()
  }

  test("spanner: mods decode to c/u/d with old_values before images and hard deletes") {
    val (url, conn) = fixtureDb()
    val st = conn.createStatement()
    st.execute("INSERT INTO inv.users VALUES (1, 'Sally', 'sally@acme.com')")
    st.execute("INSERT INTO inv.users VALUES (2, 'George', 'george@old.com')")

    val db = Files.createTempDirectory("graft-spanner")
    val tailer = new SpannerChangeStreamTailer(url, db,
      Seq(TableSpec("inv", "users", Seq("id"))), dialect = EmulatedDialect)
    tailer.snapshot()

    rec(conn, 10, 1, "INSERT",
      """[{"keys":{"id":3},"new_values":{"name":"Jon","email":"jon@got.com"},"old_values":{}}]""")
    // NEW_ROW_AND_OLD_VALUES: new_values = full non-key after image,
    // old_values = pre-change values of the modified columns only
    rec(conn, 11, 1, "UPDATE",
      """[{"keys":{"id":2},"new_values":{"name":"George","email":"george@new.com"},""" +
      """"old_values":{"email":"george@old.com"}}]""")
    rec(conn, 12, 1, "DELETE",
      """[{"keys":{"id":1},"new_values":{},""" +
      """"old_values":{"name":"Sally","email":"sally@acme.com"}}]""")
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
    // untouched columns in the before image come from the after image
    assert(uval.getAs[org.apache.spark.sql.Row]("before").getAs[String]("name")
      == "George")
    assert(uval.getAs[org.apache.spark.sql.Row]("after").getAs[String]("email")
      == "george@new.com")
    val del = batch.filter(col("value.op") === "d").head()
    assert(del.getAs[org.apache.spark.sql.Row]("value")
      .getAs[org.apache.spark.sql.Row]("before").getAs[String]("email")
      == "sally@acme.com")
    assert(batch.filter(col("value").isNull && col("key").isNotNull).count() == 1)
    assert(batch.filter(col("value.source.connector") === "spanner").count() == 3)
  }

  test("spanner: multi-mod records fan out; position survives restart; pre-snapshot excluded") {
    val (url, conn) = fixtureDb()
    val st = conn.createStatement()
    st.execute("INSERT INTO inv.users VALUES (1, 'A', 'a@x.com')")
    rec(conn, 5, 1, "INSERT",
      """[{"keys":{"id":1},"new_values":{"name":"A","email":"a@x.com"},"old_values":{}}]""")

    val db = Files.createTempDirectory("graft-spannerb")
    val spec = TableSpec("inv", "users", Seq("id"))
    val tailer = new SpannerChangeStreamTailer(url, db, Seq(spec), dialect = EmulatedDialect)
    tailer.snapshot()
    assert(tailer.poll() == 0, "pre-snapshot change records must not re-deliver")

    // one transaction touching two rows = one record, two mods
    rec(conn, 20, 1, "INSERT",
      """[{"keys":{"id":2},"new_values":{"name":"B","email":"b@x.com"},"old_values":{}},""" +
      """{"keys":{"id":3},"new_values":{"name":"C","email":"c@x.com"},"old_values":{}}]""")
    assert(tailer.poll() == 2)

    val tailer2 = new SpannerChangeStreamTailer(url, db, Seq(spec), dialect = EmulatedDialect)
    rec(conn, 20, 2, "INSERT",
      """[{"keys":{"id":4},"new_values":{"name":"D","email":"d@x.com"},"old_values":{}}]""")
    rec(conn, 21, 1, "INSERT",
      """[{"keys":{"id":5},"new_values":{"name":"E","email":"e@x.com"},"old_values":{}}]""")
    assert(tailer2.poll() == 2)
    assert(tailer2.poll() == 0)
  }

  test("spanner: live dialect emits the READ_ TVF; factory dispatches; malformed mods fail loudly") {
    val t = TableSpec("inv", "users", Seq("id"))
    val sql = SpannerDialect.changesSql(t)
    assert(sql.contains("FROM READ_inv_users("), sql)
    assert(sql.contains("start_timestamp => TIMESTAMP_MICROS(?)"), sql)
    assert(sql.contains("heartbeat_milliseconds => 10000"), sql)

    val db = Files.createTempDirectory("graft-spannerc")
    val cap = graft.sources.cdc.CaptureFactory.fromProperties(Map(
      "debezium.source.connector.class" -> "io.debezium.connector.spanner.SpannerConnector",
      "debezium.source.path" -> db.toString,
      "debezium.source.jdbc.url" -> "jdbc:derby:memory:spannerdisp;create=true",
      "debezium.source.spanner.tables" -> "inv.users:id",
      "debezium.source.spanner.emulated" -> "true"))
    cap match {
      case graft.sources.cdc.CaptureFactory.NativeCapture(tl: SpannerChangeStreamTailer) =>
        assert(tl.tableSpecs == Seq(t))
        assert(tl.changesSqlFor(t) == EmulatedDialect.changesSql(t))
      case other => fail(s"expected NativeCapture(SpannerChangeStreamTailer), got $other")
    }

    // non-array mods and unknown mod_type fail loudly, never drop
    val (url, conn) = fixtureDb()
    val db2 = Files.createTempDirectory("graft-spannerd")
    val tailer = new SpannerChangeStreamTailer(url, db2, Seq(t), dialect = EmulatedDialect)
    tailer.snapshot()
    rec(conn, 40, 1, "INSERT", """{"keys":{"id":9}}""")
    assertThrows[IllegalArgumentException](tailer.poll())
    val db3 = Files.createTempDirectory("graft-spannere")
    val (url2, conn2) = fixtureDb()
    val tailer2 = new SpannerChangeStreamTailer(url2, db3, Seq(t), dialect = EmulatedDialect)
    tailer2.snapshot()
    rec(conn2, 41, 1, "UPSERT",
      """[{"keys":{"id":9},"new_values":{},"old_values":{}}]""")
    assertThrows[IllegalArgumentException](tailer2.poll())
  }
}
