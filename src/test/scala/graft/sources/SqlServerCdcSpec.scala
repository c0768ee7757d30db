package graft.sources

import graft.SparkSpec
import graft.sinks.ParquetUpsertSink
import graft.sources.cdc.SqlServerCdcTailer
import graft.sources.cdc.SqlServerCdcTailer.{EmulatedDialect, Position, SqlServerDialect, TableSpec}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SQL Server native-CDC change-table capture: Derby hosts a change
  * table of the documented public shape (`cdc.<ci>_CT` with
  * `__$start_lsn`/`__$seqval`/`__$operation` + row image), and the
  * tailer decodes op codes 1/2/3/4 into d/c/u envelopes — including
  * the two shapes the watermark poller can never see: HARD deletes
  * and UPDATE BEFORE images — streaming into the same cdc07 layout. */
class SqlServerCdcSpec extends SparkSpec {

  private val keyDdl = "id INT"
  private val rowDdl = "id INT, first_name STRING, last_name STRING, email STRING"

  /** Derby emulation of a CDC-enabled database: source table
    * dbo.customers + change table cdc."dbo_customers_CT" (quoted to
    * keep SQL Server's exact metadata column names). */
  private def fixtureDb(): (String, java.sql.Statement) = {
    val url = s"jdbc:derby:memory:sqlserver${System.nanoTime()};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE SCHEMA dbo")
    st.execute("CREATE TABLE dbo.customers (id INT PRIMARY KEY, " +
      "first_name VARCHAR(64), last_name VARCHAR(64), email VARCHAR(64))")
    st.execute("CREATE SCHEMA cdc")
    st.execute("""CREATE TABLE cdc."dbo_customers_CT" (""" +
      """"__$start_lsn" BIGINT, "__$seqval" BIGINT, "__$operation" INT, """ +
      """"__$update_mask" VARCHAR(32), """ +
      "id INT, first_name VARCHAR(64), last_name VARCHAR(64), email VARCHAR(64))")
    (url, st)
  }

  private def change(st: java.sql.Statement, lsn: Long, seq: Long, op: Int,
                     id: Int, fn: String, ln: String, em: String): Unit =
    st.execute(s"""INSERT INTO cdc."dbo_customers_CT" VALUES """ +
      s"($lsn, $seq, $op, 'm', $id, '$fn', '$ln', '$em')")

  test("sqlserver cdc: op codes 1/2/3/4 decode to d/c/u with before images and hard deletes") {
    val (url, st) = fixtureDb()
    st.execute("INSERT INTO dbo.customers VALUES (1001, 'Sally', 'Thomas', 'sally.thomas@acme.com')")
    st.execute("INSERT INTO dbo.customers VALUES (1002, 'George', 'Bailey', 'gbailey@foobar.com')")

    val db = Files.createTempDirectory("graft-sqlserver")
    val tailer = new SqlServerCdcTailer(url, db,
      Seq(TableSpec("dbo", "customers", Seq("id"))), dialect = EmulatedDialect)
    tailer.snapshot()

    // transaction 1 (lsn 10): insert 1005
    change(st, 10, 1, 2, 1005, "Jon", "Snow", "jon@got.com")
    // transaction 2 (lsn 11): update 1002 — BEFORE (op 3) + AFTER (op 4)
    // at the same (__$start_lsn, __$seqval), the documented pairing
    change(st, 11, 1, 3, 1002, "George", "Bailey", "gbailey@foobar.com")
    change(st, 11, 1, 4, 1002, "George", "Bailey", "george@example.com")
    // transaction 3 (lsn 12): HARD delete 1001 (op 1 carries the image)
    change(st, 12, 1, 1, 1001, "Sally", "Thomas", "sally.thomas@acme.com")
    assert(tailer.poll() == 4) // c + u + d + tombstone
    assert(tailer.poll() == 0) // position advanced: nothing re-delivers

    val batch = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", keyDdl).option("rowSchema", rowDdl)
      .load()
    // snapshot rows surface as op='r'
    assert(batch.filter(col("value.op") === "r").count() == 2)
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
    // the hard delete carries the deleted row + a compaction tombstone
    val del = batch.filter(col("value.op") === "d").head()
    assert(del.getAs[org.apache.spark.sql.Row]("value")
      .getAs[org.apache.spark.sql.Row]("before").getAs[String]("email")
      == "sally.thomas@acme.com")
    assert(batch.filter(col("value").isNull && col("key").isNotNull).count() == 1)
    assert(batch.agg(max(col("value.source.lsn"))).head().getLong(0) == 3L)
    assert(batch.filter(col("value.source.connector") === "sqlserver").count() == 3)

    // end-to-end into the upsert sink: final state = live-table algebra
    // (1001 deleted, 1002 updated, 1005 inserted)
    val out = Files.createTempDirectory("graft-sqlserver-sink").toString
    val ckpt = Files.createTempDirectory("graft-sqlserver-ckpt").toString
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
    val state = sink.readTable(spark, "testc.dbo.customers").orderBy("id").collect()
    assert(state.map(_.getAs[Int]("id")).toSeq == Seq(1002, 1005))
    assert(state.head.getAs[String]("email") == "george@example.com")
  }

  test("sqlserver cdc: position survives restart; snapshot excludes pre-existing change rows; mid-lsn resume") {
    val (url, st) = fixtureDb()
    st.execute("INSERT INTO dbo.customers VALUES (1, 'A', 'A', 'a@x.com')")
    // change rows that PRE-DATE the snapshot: already reflected in the
    // snapshot image, must NOT re-deliver
    change(st, 5, 1, 2, 1, "A", "A", "a@x.com")

    val db = Files.createTempDirectory("graft-sqlserver2")
    val spec = TableSpec("dbo", "customers", Seq("id"))
    val tailer = new SqlServerCdcTailer(url, db, Seq(spec), dialect = EmulatedDialect)
    tailer.snapshot()
    assert(tailer.poll() == 0, "pre-snapshot change rows must not re-deliver")

    // two changes in ONE transaction (same lsn, seqval 1 and 2)
    change(st, 20, 1, 2, 2, "B", "B", "b@x.com")
    change(st, 20, 2, 2, 3, "C", "C", "c@x.com")
    assert(tailer.poll() == 2)

    // a NEW tailer instance (restart) resumes from the persisted
    // position — including the seqval WITHIN lsn 20
    val tailer2 = new SqlServerCdcTailer(url, db, Seq(spec), dialect = EmulatedDialect)
    change(st, 20, 3, 2, 4, "D", "D", "d@x.com") // late row in the same lsn
    change(st, 21, 1, 2, 5, "E", "E", "e@x.com")
    assert(tailer2.poll() == 2)
    assert(tailer2.poll() == 0)

    val batch = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", keyDdl).option("rowSchema", rowDdl)
      .load()
    assert(batch.filter(col("value.op") === "c").count() == 4)
  }

  test("sqlserver cdc: live pipeline — change-table rows flow through the daemon into the sink") {
    val (url, st) = fixtureDb()
    st.execute("INSERT INTO dbo.customers VALUES (1, 'Sally', 'Thomas', 's@x.com')")
    val db = Files.createTempDirectory("graft-sqlserver-live")
    val cap = graft.sources.cdc.CaptureFactory.fromProperties(Map(
      "debezium.source.connector.class" -> "io.debezium.connector.sqlserver.SqlServerConnector",
      "debezium.source.path" -> db.toString,
      "debezium.source.jdbc.url" -> url,
      "debezium.source.sqlserver.tables" -> "dbo.customers:id",
      "debezium.source.sqlserver.emulated" -> "true"))
    val sink = new graft.sinks.KvSink
    val spec = graft.pipeline.PipelineSpec(sourcePath = db.toString,
      keySchema = org.apache.spark.sql.types.StructType.fromDDL(keyDdl),
      rowSchema = org.apache.spark.sql.types.StructType.fromDDL(rowDdl),
      sink = sink, sourceType = "graft-cdc")
    val q = graft.pipeline.CdcPipeline.startCapture(spark, spec, cap,
      intervalMs = 100L,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100L))
    try {
      def waitFor(pred: => Boolean): Unit = {
        var ms = 0
        while (!pred && ms < 60000) { Thread.sleep(100); ms += 100 }
        assert(pred)
      }
      waitFor(sink.size("testc.dbo.customers") >= 1) // snapshot row
      // LIVE change-table rows are captured by the daemon and streamed
      change(st, 30, 1, 2, 2, "Jon", "Snow", "j@x.com")
      waitFor(sink.get("testc.dbo.customers", """{"id":2}""").exists(_.contains("Jon")))
      // hard delete: op-1 row + tombstone drop the key from the KV view
      change(st, 31, 1, 1, 2, "Jon", "Snow", "j@x.com")
      waitFor(sink.get("testc.dbo.customers", """{"id":2}""").isEmpty)
    } finally q.stop()
  }

  test("sqlserver cdc: documented COVERAGE example — config-driven capture into the parquet upsert sink") {
    // exercises the COVERAGE.md §2.1 native-CDC example verbatim:
    // properties select the connector, the tables, the layout path and
    // the sink; startCapture wires snapshot → change tables → DSv2
    // stream → upsert MERGE
    val (url, st) = fixtureDb()
    st.execute("INSERT INTO dbo.customers VALUES (1, 'Sally', 'Thomas', 's@x.com')")
    val db = Files.createTempDirectory("graft-ss-example")
    val tables = Files.createTempDirectory("graft-ss-example-tables").toString
    val props = Map(
      "debezium.source.connector.class" -> "io.debezium.connector.sqlserver.SqlServerConnector",
      "debezium.source.jdbc.url" -> url,
      "debezium.source.sqlserver.tables" -> "dbo.customers:id",
      "debezium.source.sqlserver.emulated" -> "true", // Derby-hosted change table
      "debezium.source.path" -> db.toString,
      "debezium.source.type" -> "graft-cdc",
      "debezium.sink.type" -> "parquet-upsert")
    val sink = new ParquetUpsertSink(tables, keyFields = Seq("id"))
    val spec = graft.pipeline.PipelineSpec.fromProperties(props,
      keySchema = org.apache.spark.sql.types.StructType.fromDDL(keyDdl),
      rowSchema = org.apache.spark.sql.types.StructType.fromDDL(rowDdl),
      registry = new graft.sinks.SinkRegistry(Seq(sink)))
    val q = graft.pipeline.CdcPipeline.startCapture(spark, spec,
      graft.sources.cdc.CaptureFactory.fromProperties(props),
      intervalMs = 100L,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100L))
    try {
      def waitFor(pred: => Boolean): Unit = {
        var ms = 0
        while (!pred && ms < 60000) { Thread.sleep(100); ms += 100 }
        assert(pred)
      }
      // before the first epoch commits there is no table state yet
      def stateCount(): Long =
        scala.util.Try(sink.readTable(spark, "testc.dbo.customers").count())
          .getOrElse(-1L)
      // snapshot row lands, then a live insert + hard delete flow
      waitFor(stateCount() == 1)
      change(st, 40, 1, 2, 2, "Jon", "Snow", "j@x.com")
      waitFor(stateCount() == 2)
      change(st, 41, 1, 1, 1, "Sally", "Thomas", "s@x.com")
      waitFor(stateCount() == 1)
      assert(sink.readTable(spark, "testc.dbo.customers").head()
        .getAs[String]("first_name") == "Jon")
    } finally q.stop()
  }

  test("sqlserver cdc: live dialect emits the documented fn_cdc_get_all_changes T-SQL; factory dispatches; positions order") {
    // the deployable artifact for a real SQL Server: the TVF call with
    // the 'all update old' row filter (op-3 before images) bounded by
    // the log high-water, ordered for op pairing
    val t = TableSpec("dbo", "customers", Seq("id"))
    val sql = SqlServerDialect.changesSql(t)
    assert(sql.contains("cdc.fn_cdc_get_all_changes_dbo_customers(?"), sql)
    assert(sql.contains("sys.fn_cdc_get_max_lsn()"), sql)
    assert(sql.contains("N'all update old'"), sql)
    assert(sql.contains("ORDER BY __$start_lsn, __$seqval, __$operation"), sql)
    assert(TableSpec("s", "t", Seq("id"), Some("custom_ci")).ci == "custom_ci")

    // binary(10) LSN bytes round-trip through the position codec
    val enc = SqlServerDialect.lsnBytes(BigInt("00002fa80000116e", 16))
    assert(enc.length == 10 && SqlServerCdcTailer.bigIntOf(enc) == BigInt("00002fa80000116e", 16))
    // hex state render/parse round-trip
    val p = Position(BigInt("2fa8", 16), BigInt(3))
    assert(Position.parse(p.render) == p)
    assert(Position(BigInt(11), BigInt(1)) > Position(BigInt(10), BigInt(9)))
    assert(Position(BigInt(10), BigInt(2)) > Position(BigInt(10), BigInt(1)))

    // connector-class dispatch
    val db = Files.createTempDirectory("graft-sqlserver3")
    val cap = graft.sources.cdc.CaptureFactory.fromProperties(Map(
      "debezium.source.connector.class" -> "io.debezium.connector.sqlserver.SqlServerConnector",
      "debezium.source.path" -> db.toString,
      "debezium.source.jdbc.url" -> "jdbc:derby:memory:ssdisp;create=true",
      "debezium.source.sqlserver.tables" -> "dbo.customers:id",
      "debezium.source.sqlserver.emulated" -> "true"))
    cap match {
      case graft.sources.cdc.CaptureFactory.NativeCapture(tl: graft.sources.cdc.SqlServerCdcTailer) =>
        assert(tl.tableSpecs == Seq(t))
        assert(tl.changesSqlFor(t) == EmulatedDialect.changesSql(t))
      case other => fail(s"expected NativeCapture(SqlServerCdcTailer), got $other")
    }
  }
}
