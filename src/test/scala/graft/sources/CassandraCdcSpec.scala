package graft.sources

import graft.SparkSpec
import graft.sources.cdc.CassandraCommitlogTailer
import graft.sources.cdc.CassandraCommitlogTailer.{EmulatedDialect, TableSpec}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Cassandra commitlog-CDC capture: Derby hosts a mutation table of
  * the connector's public event shape (kind, named-key JSON object,
  * mutated-cell JSON, segment/position), and the tailer decodes
  * mutations into the family's DISTINCT semantics — no before images
  * ever, partial UPDATE after images, partition deletes with null
  * clustering columns, range tombstones skipped-but-counted —
  * streaming into the same cdc07 layout as every other capture. */
class CassandraCdcSpec extends SparkSpec {

  private val keyDdl = "sensor_id INT, reading_ts BIGINT"
  private val rowDdl = "sensor_id INT, reading_ts BIGINT, temp DOUBLE, status STRING"

  private def fixtureDb(): (String, java.sql.Connection) = {
    val url = s"jdbc:derby:memory:cass${java.util.UUID.randomUUID().toString.take(8)};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE SCHEMA iot")
    st.execute("CREATE TABLE iot.readings (sensor_id INT, reading_ts BIGINT, " +
      "temp DOUBLE, status VARCHAR(32))")
    st.execute("CREATE SCHEMA cl")
    st.execute("""CREATE TABLE cl."iot_readings_COMMITLOG" (""" +
      """segment_id BIGINT, "pos" BIGINT, kind VARCHAR(20), """ +
      """"mkey" VARCHAR(256), cells VARCHAR(4000))""")
    st.close()
    (url, conn)
  }

  private def mut(conn: java.sql.Connection, seg: Long, pos: Long, kind: String,
                  key: String, cells: String): Unit = {
    val ps = conn.prepareStatement(
      """INSERT INTO cl."iot_readings_COMMITLOG" VALUES (?, ?, ?, ?, ?)""")
    try { ps.setLong(1, seg); ps.setLong(2, pos); ps.setString(3, kind)
          ps.setString(4, key); ps.setString(5, cells); ps.executeUpdate(); () }
    finally ps.close()
  }

  test("cassandra: mutations decode with no before images, partial updates, null-clustering partition deletes") {
    val (url, conn) = fixtureDb()
    val st = conn.createStatement()
    st.execute("INSERT INTO iot.readings VALUES (1, 100, 20.5, 'ok')")

    val db = Files.createTempDirectory("graft-cass")
    val tailer = new CassandraCommitlogTailer(url, db,
      Seq(TableSpec("iot", "readings", Seq("sensor_id", "reading_ts"))))
    tailer.snapshot()

    // INSERT mutation: full row liveness → op c
    mut(conn, 5, 1, "INSERT", """{"sensor_id":2,"reading_ts":200}""",
      """{"temp":21.0,"status":"ok"}""")
    // UPDATE mutation: ONLY the mutated cell rides (partial after)
    mut(conn, 5, 2, "UPDATE", """{"sensor_id":1,"reading_ts":100}""",
      """{"status":"alarm"}""")
    // row delete: key only, NO before image (commitlogs have none)
    mut(conn, 5, 3, "ROW_DELETE", """{"sensor_id":2,"reading_ts":200}""", null)
    // partition delete: clustering column absent → null in the key
    mut(conn, 6, 1, "PARTITION_DELETE", """{"sensor_id":1}""", null)
    // range tombstone: skipped, counted
    mut(conn, 6, 2, "RANGE_TOMBSTONE", """{"sensor_id":1}""", null)
    assert(tailer.poll() == 6) // c + u + 2×(d + tombstone)
    assert(tailer.skippedRangeTombstones == 1)
    assert(tailer.poll() == 0)
    assert(tailer.skippedRangeTombstones == 1, "re-polls must not re-count")

    val batch = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", keyDdl).option("rowSchema", rowDdl)
      .load()
    assert(batch.filter(col("value.op") === "r").count() == 1)
    val ins = batch.filter(col("value.op") === "c").head()
      .getAs[org.apache.spark.sql.Row]("value")
    assert(ins.getAs[org.apache.spark.sql.Row]("after").getAs[Double]("temp") == 21.0)
    assert(ins.getAs[org.apache.spark.sql.Row]("before") == null, "no before images ever")
    // partial update: mutated cell present, unmutated cell null-absent
    val upd = batch.filter(col("value.op") === "u").head()
      .getAs[org.apache.spark.sql.Row]("value")
    assert(upd.getAs[org.apache.spark.sql.Row]("before") == null)
    val uAfter = upd.getAs[org.apache.spark.sql.Row]("after")
    assert(uAfter.getAs[String]("status") == "alarm")
    assert(uAfter.isNullAt(uAfter.fieldIndex("temp")), "partial image: temp was not written")
    // both deletes: no image at all, key carries; the partition delete's
    // clustering column is null
    val dels = batch.filter(col("value.op") === "d")
      .orderBy(col("value.source.lsn")).collect()
    assert(dels.length == 2)
    dels.foreach { d =>
      val v = d.getAs[org.apache.spark.sql.Row]("value")
      assert(v.getAs[org.apache.spark.sql.Row]("before") == null)
      assert(v.getAs[org.apache.spark.sql.Row]("after") == null)
    }
    val pdKey = dels(1).getAs[org.apache.spark.sql.Row]("key")
    assert(pdKey.getAs[Int]("sensor_id") == 1)
    assert(pdKey.isNullAt(pdKey.fieldIndex("reading_ts")))
    assert(batch.filter(col("value").isNull && col("key").isNotNull).count() == 2)
    assert(batch.filter(col("value.source.connector") === "cassandra").count() == 4)
  }

  test("cassandra: (segment, position) order resumes across restarts; unknown kinds fail loudly") {
    val (url, conn) = fixtureDb()
    val db = Files.createTempDirectory("graft-cassb")
    val spec = TableSpec("iot", "readings", Seq("sensor_id", "reading_ts"))
    val tailer = new CassandraCommitlogTailer(url, db, Seq(spec))
    tailer.snapshot()

    mut(conn, 10, 1, "INSERT", """{"sensor_id":3,"reading_ts":1}""", """{"temp":1.0}""")
    mut(conn, 10, 2, "INSERT", """{"sensor_id":3,"reading_ts":2}""", """{"temp":2.0}""")
    assert(tailer.poll() == 2)
    // restart: resume strictly past (10, 2) — same segment, later pos
    val tailer2 = new CassandraCommitlogTailer(url, db, Seq(spec))
    mut(conn, 10, 3, "INSERT", """{"sensor_id":3,"reading_ts":3}""", """{"temp":3.0}""")
    mut(conn, 11, 1, "INSERT", """{"sensor_id":3,"reading_ts":4}""", """{"temp":4.0}""")
    assert(tailer2.poll() == 2)
    assert(tailer2.poll() == 0)

    mut(conn, 12, 1, "CELL_EXPIRY", """{"sensor_id":3,"reading_ts":5}""", null)
    val e = intercept[IllegalArgumentException](tailer2.poll())
    assert(e.getMessage.contains("unknown mutation kind"), e.getMessage)
  }

  test("cassandra: factory dispatches every server-major connector class; snapshot excludes pre-existing mutations") {
    val t = TableSpec("iot", "readings", Seq("sensor_id", "reading_ts"))
    for (major <- Seq("3", "4", "5")) {
      val db = Files.createTempDirectory(s"graft-cassd$major")
      val cap = graft.sources.cdc.CaptureFactory.fromProperties(Map(
        "debezium.source.connector.class" ->
          s"io.debezium.connector.cassandra.Cassandra${major}Connector",
        "debezium.source.path" -> db.toString,
        "debezium.source.jdbc.url" -> s"jdbc:derby:memory:cassdisp$major;create=true",
        "debezium.source.cassandra.tables" -> "iot.readings:sensor_id+reading_ts"))
      cap match {
        case graft.sources.cdc.CaptureFactory.NativeCapture(tl: CassandraCommitlogTailer) =>
          assert(tl.tableSpecs == Seq(t))
          assert(tl.changesSqlFor(t) == EmulatedDialect.changesSql(t))
        case other => fail(s"expected NativeCapture(CassandraCommitlogTailer), got $other")
      }
    }

    // mutations that PRE-DATE the snapshot are already in its image
    val (url, conn) = fixtureDb()
    mut(conn, 1, 1, "INSERT", """{"sensor_id":9,"reading_ts":9}""", """{"temp":9.0}""")
    val db = Files.createTempDirectory("graft-cassc")
    val tailer = new CassandraCommitlogTailer(url, db, Seq(t))
    tailer.snapshot()
    assert(tailer.poll() == 0, "pre-snapshot mutations must not re-deliver")
  }
}
