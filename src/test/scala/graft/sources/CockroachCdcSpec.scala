package graft.sources

import graft.SparkSpec
import graft.sources.cdc.CockroachChangefeedTailer
import graft.sources.cdc.CockroachChangefeedTailer.{CockroachDialect, EmulatedDialect, TableSpec}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** CockroachDB changefeed capture: Derby hosts a changefeed-record
  * table of the documented public shape (HLC `updated` timestamp,
  * JSON-array `key`, wrapped `{"after","before"}` value envelope),
  * and the tailer decodes records into c/u/d envelopes — hard
  * deletes and diff before images — streaming into the same cdc07
  * layout as every other capture. */
class CockroachCdcSpec extends SparkSpec {

  private val keyDdl = "id INT"
  private val rowDdl = "id INT, name STRING, email STRING"

  private def fixtureDb(): (String, java.sql.Connection) = {
    val url = s"jdbc:derby:memory:crdb${java.util.UUID.randomUUID().toString.take(8)};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE SCHEMA inv")
    st.execute("CREATE TABLE inv.vendors (id INT PRIMARY KEY, " +
      "name VARCHAR(64), email VARCHAR(64))")
    st.execute("CREATE SCHEMA cf")
    st.execute("""CREATE TABLE cf."inv_vendors_CHANGEFEED" (""" +
      "updated_wall BIGINT, updated_logical BIGINT, " +
      """"key" VARCHAR(256), "value" VARCHAR(4000))""")
    st.close()
    (url, conn)
  }

  private def rec(conn: java.sql.Connection, wall: Long, logical: Long,
                  key: String, value: String): Unit = {
    val ps = conn.prepareStatement(
      """INSERT INTO cf."inv_vendors_CHANGEFEED" VALUES (?, ?, ?, ?)""")
    try { ps.setLong(1, wall); ps.setLong(2, logical); ps.setString(3, key)
          ps.setString(4, value); ps.executeUpdate(); () }
    finally ps.close()
  }

  test("cockroachdb: wrapped envelopes decode to c/u/d with diff before images") {
    val (url, conn) = fixtureDb()
    val st = conn.createStatement()
    st.execute("INSERT INTO inv.vendors VALUES (1, 'Sally', 'sally@acme.com')")
    st.execute("INSERT INTO inv.vendors VALUES (2, 'George', 'george@old.com')")

    val db = Files.createTempDirectory("graft-crdb")
    val tailer = new CockroachChangefeedTailer(url, db,
      Seq(TableSpec("inv", "vendors", Seq("id"))), dialect = EmulatedDialect)
    tailer.snapshot()

    rec(conn, 10, 1, "[3]",
      """{"after":{"id":3,"name":"Jon","email":"jon@got.com"},"before":null}""")
    rec(conn, 11, 1, "[2]",
      """{"after":{"id":2,"name":"George","email":"george@new.com"},""" +
      """"before":{"id":2,"name":"George","email":"george@old.com"}}""")
    rec(conn, 12, 1, "[1]",
      """{"after":null,"before":{"id":1,"name":"Sally","email":"sally@acme.com"}}""")
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
    assert(batch.filter(col("value.source.connector") === "cockroachdb").count() == 3)
  }

  test("cockroachdb: HLC position resumes mid-wall; malformed keys fail loudly") {
    val (url, conn) = fixtureDb()
    val db = Files.createTempDirectory("graft-crdbb")
    val spec = TableSpec("inv", "vendors", Seq("id"))
    val tailer = new CockroachChangefeedTailer(url, db, Seq(spec), dialect = EmulatedDialect)
    tailer.snapshot()

    rec(conn, 20, 1, "[4]", """{"after":{"id":4,"name":"A","email":"a@x.com"},"before":null}""")
    rec(conn, 20, 2, "[5]", """{"after":{"id":5,"name":"B","email":"b@x.com"},"before":null}""")
    assert(tailer.poll() == 2)
    // same wall, later logical: only the new record delivers
    val tailer2 = new CockroachChangefeedTailer(url, db, Seq(spec), dialect = EmulatedDialect)
    rec(conn, 20, 3, "[6]", """{"after":{"id":6,"name":"C","email":"c@x.com"},"before":null}""")
    assert(tailer2.poll() == 1)

    // a non-array key (or wrong arity) must not silently mis-key
    rec(conn, 21, 1, """{"id":7}""",
      """{"after":{"id":7,"name":"D","email":"d@x.com"},"before":null}""")
    val e = intercept[IllegalArgumentException](tailer2.poll())
    assert(e.getMessage.contains("JSON array"), e.getMessage)
  }

  test("cockroachdb: live dialect emits the CHANGEFEED statement; factory dispatches") {
    val t = TableSpec("inv", "vendors", Seq("id"))
    val sql = CockroachDialect.changesSql(t)
    assert(sql.contains("EXPERIMENTAL CHANGEFEED FOR TABLE inv.vendors"), sql)
    assert(sql.contains("WITH updated, diff, cursor = $1"), sql)

    val db = Files.createTempDirectory("graft-crdbc")
    val cap = graft.sources.cdc.CaptureFactory.fromProperties(Map(
      "debezium.source.connector.class" -> "io.debezium.connector.cockroachdb.CockroachDbConnector",
      "debezium.source.path" -> db.toString,
      "debezium.source.jdbc.url" -> "jdbc:derby:memory:crdbdisp;create=true",
      "debezium.source.cockroachdb.tables" -> "inv.vendors:id",
      "debezium.source.cockroachdb.emulated" -> "true"))
    cap match {
      case graft.sources.cdc.CaptureFactory.NativeCapture(tl: CockroachChangefeedTailer) =>
        assert(tl.tableSpecs == Seq(t))
        assert(tl.changesSqlFor(t) == EmulatedDialect.changesSql(t))
      case other => fail(s"expected NativeCapture(CockroachChangefeedTailer), got $other")
    }
  }
}
