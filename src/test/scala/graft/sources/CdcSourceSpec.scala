package graft.sources

import graft.SparkSpec
import graft.sinks.ParquetUpsertSink
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}

/** The DSv2 `graft-cdc` source: snapshot phase (op='r' rows at the
  * snapshot LSN) then WAL streaming through LSN-range offsets, driven
  * to the reference's golden inventory.customers state
  * (DebeziumServerPostgresIT.java:72-75,92-96 semantics). */
class CdcSourceSpec extends SparkSpec {

  private val keyDdl = "id INT"
  private val rowDdl = "id INT, first_name STRING, last_name STRING, email STRING"

  private def wal(id: Int, op: String, fn: String, ln: String, em: String, lsn: Long,
                  dest: String = "testc.inventory.customers"): String = {
    val row = s"""{"id":$id,"first_name":"$fn","last_name":"$ln","email":"$em"}"""
    val before = if (op == "d") row else "null"
    val after = if (op == "d") "null" else row
    s"""{"destination":"$dest","key":{"id":$id},"value":{"op":"$op","before":$before,"after":$after,"source":{"connector":"postgresql","db":"db","schema":"inventory","table":"customers","lsn":$lsn,"snapshot":"false","ts_ms":0},"ts_ms":0},"headers":{}}"""
  }

  /** snapshot: the 4 golden rows at LSN 4; WAL: insert/update/delete +
    * another table + a heartbeat and a tombstone (no LSN). */
  private def fixtureDb(): Path = {
    val db = Files.createTempDirectory("graft-cdcdb")
    val snap = Files.createDirectories(db.resolve("snapshot"))
    Files.writeString(snap.resolve("_lsn"), "4")
    Files.writeString(snap.resolve("inventory.customers.jsonl"), Seq(
      """{"id":1001,"first_name":"Sally","last_name":"Thomas","email":"sally.thomas@acme.com"}""",
      """{"id":1002,"first_name":"George","last_name":"Bailey","email":"gbailey@foobar.com"}""",
      """{"id":1003,"first_name":"Edward","last_name":"Walker","email":"ed@walker.com"}""",
      """{"id":1004,"first_name":"Anne","last_name":"Kretchmar","email":"annek@noanswer.org"}"""
    ).mkString("\n") + "\n")
    val walDir = Files.createDirectories(db.resolve("wal"))
    Files.writeString(walDir.resolve("wal-000.jsonl"), Seq(
      wal(1005, "c", "Jon", "Snow", "jon_snow@gameofthrones.com", 5),
      wal(1002, "u", "George", "Bailey", "george.bailey@example.com", 6),
      wal(1003, "d", "Edward", "Walker", "ed@walker.com", 7),
      wal(9, "c", "x", "y", "z", 8, dest = "testc.other.t"),
      """{"destination":"__debezium-heartbeat.testc","key":null,"value":null,"headers":{}}""",
      """{"destination":"testc.inventory.customers","key":{"id":1004},"value":null,"headers":{}}"""
    ).mkString("\n") + "\n")
    db
  }

  private def readerFor(db: Path) =
    spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", keyDdl).option("rowSchema", rowDdl)

  test("batch read: snapshot rows surface as op='r' at the snapshot LSN, WAL follows") {
    val db = fixtureDb()
    val df = readerFor(db).load()
    assert(df.count() == 10) // 4 snapshot + 4 wal + heartbeat + tombstone
    val snap = df.filter(col("value.op") === "r")
    assert(snap.count() == 4)
    assert(snap.select("value.source.snapshot").distinct().head().getString(0) == "true")
    assert(snap.select("value.source.lsn").distinct().head().getLong(0) == 4L)
    val dests = df.select("destination").distinct().collect().map(_.getString(0)).toSet
    assert(dests.contains("testc.other.t") && dests.contains("__debezium-heartbeat.testc"))
  }

  test("ending.lsn bounds the batch read at a log position (point-in-time replay)") {
    val db = fixtureDb()
    // bound at 6: snapshot (4) + insert (5) + update (6); the delete at
    // 7 and later records never surface
    val bounded = readerFor(db).option("ending.lsn", "6").load()
    assert(bounded.filter(col("value.op") === "r").count() == 4)
    val ops = bounded.filter(col("value.op") =!= "r")
      .select("value.op", "value.source.lsn").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ops == Set(("c", 5L), ("u", 6L)))
    // bound at the snapshot position: base state only
    assert(readerFor(db).option("ending.lsn", "4").load().count() == 4)
    // a bound BEFORE the snapshot has no consistent answer
    val err = intercept[Exception] {
      readerFor(db).option("ending.lsn", "3").load().count()
    }
    assert(err.getMessage.contains("predates the snapshot") ||
      Option(err.getCause).exists(_.getMessage.contains("predates the snapshot")))
  }

  test("ending.lsn bounds the STREAM: AvailableNow drains to the bound and stops") {
    val db = fixtureDb()
    val out = Files.createTempDirectory("graft-cdc-bounded").toString
    val q = spark.readStream.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", keyDdl).option("rowSchema", rowDdl)
      .option("ending.lsn", "6")
      .load()
      .writeStream.format("memory").queryName("bounded_stream")
      .option("checkpointLocation", s"$out/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val rows = spark.table("bounded_stream")
    assert(rows.filter(col("value.op") === "r").count() == 4)
    val tail = rows.filter(col("value.op").isin("c", "u", "d"))
      .select("value.source.lsn").collect().map(_.getLong(0)).toSet
    assert(tail == Set(5L, 6L), s"stream must stop at the bound, got $tail")
  }

  test("starting.lsn resumes the batch read after a position: no snapshot, no earlier WAL") {
    val db = fixtureDb()
    // resume after 5: only the update (6), delete (7), other-table row
    // (8) and the position-less heartbeat/tombstone remain
    val resumed = readerFor(db).option("starting.lsn", "5").load()
    assert(resumed.filter(col("value.op") === "r").count() == 0,
      "resume must not re-deliver the snapshot")
    val ops = resumed.filter(col("value.op").isin("c", "u", "d"))
      .select("value.op", "value.source.lsn").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ops == Set(("u", 6L), ("d", 7L), ("c", 8L)))
    // backfill(<=X) + resume(>X) partitions the log exactly: no gap, no overlap
    val backfill = readerFor(db).option("ending.lsn", "5").load()
    val full = readerFor(db).load()
    assert(backfill.count() + resumed.count() == full.count())
    // resuming below the snapshot position fails loudly
    val err = intercept[Exception] {
      readerFor(db).option("starting.lsn", "3").load().count()
    }
    assert(err.getMessage.contains("predates the snapshot") ||
      Option(err.getCause).exists(_.getMessage.contains("predates the snapshot")))
    // inverted range fails loudly
    val inv = intercept[Exception] {
      readerFor(db).option("starting.lsn", "6").option("ending.lsn", "5").load().count()
    }
    assert(inv.getMessage.contains("inverted") ||
      Option(inv.getCause).exists(_.getMessage.contains("inverted")))
  }

  test("starting.lsn resumes the STREAM after a position: snapshot phase skipped") {
    val db = fixtureDb()
    val out = Files.createTempDirectory("graft-cdc-resume").toString
    val q = spark.readStream.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", keyDdl).option("rowSchema", rowDdl)
      .option("starting.lsn", "6")
      .load()
      .writeStream.format("memory").queryName("resumed_stream")
      .option("checkpointLocation", s"$out/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val rows = spark.table("resumed_stream")
    assert(rows.filter(col("value.op") === "r").count() == 0)
    val tail = rows.filter(col("value.op").isin("c", "u", "d"))
      .select("value.source.lsn").collect().map(_.getLong(0)).toSet
    assert(tail == Set(7L, 8L), s"stream must start strictly after 6, got $tail")
  }

  test("include list prunes tables inside the scan; heartbeats pass") {
    val db = fixtureDb()
    val df = readerFor(db).option("table.include.list", "inventory.customers").load()
    val dests = df.select("destination").distinct().collect().map(_.getString(0)).toSet
    assert(dests == Set("testc.inventory.customers", "__debezium-heartbeat.testc"))
  }

  test("destination filters push into the source scan") {
    val db = fixtureDb()
    val df = readerFor(db).load().filter(col("destination") === "testc.inventory.customers")
    assert(df.count() == 8) // 4 snapshot + 3 wal changes + 1 tombstone
    // the pushed filter appears in the scan description, and the scan
    // itself (not a post-filter) did the pruning
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-cdc") || plan.contains("GraftCdcScan") || plan.contains("BatchScan"))
    val scanDesc = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scanDesc.contains("destination"), s"expected pushed destination filter in: $scanDesc")
  }

  test("maxLsnsPerTrigger drains the WAL in bounded micro-batches") {
    val db = fixtureDb()
    val stream = spark.readStream.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", keyDdl).option("rowSchema", rowDdl)
      .option("maxLsnsPerTrigger", "1")
      .load()
    val q = stream.writeStream.format("memory").queryName("rate_limited")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    // all rows arrive…
    assert(spark.table("rate_limited").count() == 10)
    // …but over multiple micro-batches: snapshot batch + 1 LSN per batch
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 4, s"expected bounded batches, got ${batches.length}")
  }

  test("source reports LSN position metrics in query progress") {
    val db = fixtureDb()
    val stream = spark.readStream.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", keyDdl).option("rowSchema", rowDdl)
      .load()
    val q = stream.writeStream.format("noop")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val progress = q.asInstanceOf[org.apache.spark.sql.streaming.StreamingQuery]
      .recentProgress.lastOption
    assert(progress.isDefined)
    val m = progress.get.sources.head.metrics
    assert(m.get("maxLsn") == "8")
    assert(m.get("snapshotLsn") == "4")
    assert(m.get("pendingLsns") == "0") // drained by AvailableNow
  }

  test("JDBC polling tailer: snapshot → poll → stream reaches the live table state") {
    import graft.sources.cdc.JdbcPollingTailer
    import JdbcPollingTailer.TableSpec
    // a REAL JDBC database (embedded Derby, in-memory)
    val url = s"jdbc:derby:memory:tailer${System.nanoTime()};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE SCHEMA inventory")
    st.execute("CREATE TABLE inventory.customers (id INT PRIMARY KEY, " +
      "first_name VARCHAR(64), last_name VARCHAR(64), email VARCHAR(64))")
    def ins(id: Int, fn: String, ln: String, em: String): Unit =
      st.execute(s"INSERT INTO inventory.customers VALUES ($id, '$fn', '$ln', '$em')")
    ins(1001, "Sally", "Thomas", "sally.thomas@acme.com")
    ins(1002, "George", "Bailey", "gbailey@foobar.com")

    val db = Files.createTempDirectory("graft-tailer")
    val tailer = new JdbcPollingTailer(url, db,
      Seq(TableSpec("inventory", "customers", Seq("id"), "id")))
    tailer.snapshot()

    ins(1003, "Edward", "Walker", "ed@walker.com")
    ins(1004, "Anne", "Kretchmar", "annek@noanswer.org")
    assert(tailer.poll() == 2)
    assert(tailer.poll() == 0) // nothing new: no segment written
    ins(1005, "Jon", "Snow", "jon@got.com")
    assert(tailer.poll() == 1)

    // the tailer's layout IS the graft-cdc contract: snapshot rows
    // surface as op='r', polled rows as 'c' at increasing LSNs
    val batch = readerFor(db).load()
    assert(batch.filter(col("value.op") === "r").count() == 2)
    assert(batch.filter(col("value.op") === "c").count() == 3)
    assert(batch.agg(max(col("value.source.lsn"))).head().getLong(0) == 3L)

    // stream through the DSv2 source into the upsert sink → the final
    // state equals the live JDBC table
    val out = Files.createTempDirectory("graft-tailer-sink").toString
    val ckpt = Files.createTempDirectory("graft-tailer-ckpt").toString
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
    val state = sink.readTable(spark, "testc.inventory.customers").orderBy("id").collect()
    assert(state.map(_.getAs[Int]("id")).toSeq == Seq(1001, 1002, 1003, 1004, 1005))
    assert(state.find(_.getAs[Int]("id") == 1005).get.getAs[String]("email") == "jon@got.com")
    conn.close()
  }

  test("tailer C/U/D capture: version watermark takes updates, soft-delete column takes deletes") {
    import graft.sources.cdc.JdbcPollingTailer
    import JdbcPollingTailer.TableSpec
    val url = s"jdbc:derby:memory:cud${System.nanoTime()};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    // "app" is Derby's default (auto-created) schema for the default user
    st.execute("CREATE TABLE app.items (id INT PRIMARY KEY, v VARCHAR(32), " +
      "version BIGINT, deleted BOOLEAN)")
    st.execute("INSERT INTO app.items VALUES (1, 'one', 1, false)")
    st.execute("INSERT INTO app.items VALUES (2, 'two', 2, false)")

    val db = Files.createTempDirectory("graft-cud")
    // watermark = version column (monotonic across inserts AND updates)
    val tailer = new JdbcPollingTailer(url, db,
      Seq(TableSpec("app", "items", Seq("id"), "version", softDeleteCol = Some("deleted"), serialKeyOps = true)))
    tailer.snapshot()

    // UPDATE: bump the version past the stored watermark
    st.execute("UPDATE app.items SET v = 'one-v2', version = 3 WHERE id = 1")
    // DELETE: soft-delete flag + version bump
    st.execute("UPDATE app.items SET deleted = true, version = 4 WHERE id = 2")
    assert(tailer.poll() == 2)

    val records = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", "id INT")
      .option("rowSchema", "id INT, v STRING, version BIGINT, deleted BOOLEAN")
      .load()
    val ops = records.select("value.op").collect().map(_.getString(0)).sorted.toSeq
    // snapshot pair + UPDATE (key 1 is below the snapshot key
    // high-water → op='u', before=null) + soft DELETE
    assert(ops == Seq("d", "r", "r", "u"))
    // final state: id 1 updated, id 2 gone
    val state = graft.operators.ApplyChanges.latestState(records,
        keyCols = Seq(col("key.id")),
        orderCols = Seq(coalesce(col("value.source.lsn"), lit(-1L))),
        opCol = col("value.op"))
      .select(col("key.id").as("id"), col("value.after.v").as("v"))
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(state == Seq((1, "one-v2")))
    conn.close()
  }

  test("tailer op fidelity + chunked backlog: c/u/d sequence, bounded segments") {
    import graft.sources.cdc.JdbcPollingTailer
    import JdbcPollingTailer.TableSpec
    val url = s"jdbc:derby:memory:opfid${System.nanoTime()};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE app.items (id INT PRIMARY KEY, v VARCHAR(32), " +
      "version BIGINT, deleted BOOLEAN)")
    st.execute("INSERT INTO app.items VALUES (1, 'seed', 1, false)")

    val db = Files.createTempDirectory("graft-opfid")
    val tailer = new JdbcPollingTailer(url, db,
      Seq(TableSpec("app", "items", Seq("id"), "version", softDeleteCol = Some("deleted"), serialKeyOps = true)))
    tailer.snapshot()

    // lifecycle of one row: INSERT → UPDATE → soft DELETE, one poll each
    st.execute("INSERT INTO app.items VALUES (2, 'born', 2, false)")
    assert(tailer.poll() == 1)
    st.execute("UPDATE app.items SET v = 'changed', version = 3 WHERE id = 2")
    assert(tailer.poll() == 1)
    st.execute("UPDATE app.items SET deleted = true, version = 4 WHERE id = 2")
    assert(tailer.poll() == 1)

    val records = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", "id INT")
      .option("rowSchema", "id INT, v STRING, version BIGINT, deleted BOOLEAN")
      .load()
    val life = records.filter(col("key.id") === 2)
      .orderBy(coalesce(col("value.source.lsn"), lit(-1L)))
      .select("value.op").collect().map(_.getString(0)).toSeq
    assert(life == Seq("c", "u", "d"), s"expected c/u/d lifecycle, got $life")

    // a big backlog streams into BOUNDED segments, not one buffer:
    // 120 new rows at maxSegmentRecords=50 → 3 new segments
    val before = Files.list(db.resolve("wal")).count()
    (10 to 129).foreach(i =>
      st.execute(s"INSERT INTO app.items VALUES ($i, 'r$i', ${100 + i}, false)"))
    assert(tailer.poll(maxSegmentRecords = 50) == 120)
    val after = Files.list(db.resolve("wal")).count()
    assert(after - before == 3, s"expected 3 bounded segments, got ${after - before}")
    // the chunked backlog is still one contiguous LSN range
    val all = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", "id INT")
      .option("rowSchema", "id INT, v STRING, version BIGINT, deleted BOOLEAN")
      .load()
    assert(all.filter(col("value.op") === "c").count() == 121) // id=2 + 120 backlog
    conn.close()
  }

  test("serial-key discriminator is opt-in: default spec emits 'c' even below the key high-water") {
    import graft.sources.cdc.JdbcPollingTailer
    import JdbcPollingTailer.TableSpec
    val url = s"jdbc:derby:memory:optin${System.nanoTime()};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE app.items (id INT PRIMARY KEY, v VARCHAR(32), " +
      "version BIGINT, deleted BOOLEAN)")
    st.execute("INSERT INTO app.items VALUES (10, 'seed', 1, false)")
    val db = Files.createTempDirectory("graft-optin")
    // serialKeyOps left at the default (false): keys are NOT serial here
    val tailer = new JdbcPollingTailer(url, db,
      Seq(TableSpec("app", "items", Seq("id"), "version", softDeleteCol = Some("deleted"))))
    tailer.snapshot()
    // an explicit insert BELOW the recorded key high-water (10) — with
    // the discriminator on this would be silently mislabeled 'u'
    st.execute("INSERT INTO app.items VALUES (3, 'low-key insert', 2, false)")
    assert(tailer.poll() == 1)
    val records = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", "id INT")
      .option("rowSchema", "id INT, v STRING, version BIGINT, deleted BOOLEAN")
      .load()
    val op = records.filter(col("key.id") === 3)
      .select("value.op").collect().map(_.getString(0)).toSeq
    assert(op == Seq("c"), s"non-serial table must emit 'c' for a genuinely new row, got $op")
    conn.close()
  }

  test("table-spec parser: trailing 'serial' token opts into the discriminator") {
    import graft.sources.cdc.JdbcPollingTailer
    val t = JdbcPollingTailer.fromProperties(Map(
      "debezium.source.jdbc.url" -> "jdbc:derby:memory:parse;create=true",
      "debezium.source.jdbc.tables" ->
        ("a.t1:id:version,a.t2:id:version:deleted,a.t3:id:version:serial," +
          "a.t4:id:version:deleted:serial,a.t5:id:version:serial:serial"),
      "debezium.source.path" -> Files.createTempDirectory("graft-parse").toString))
    val specs = t.tableSpecs
    assert(specs.map(s => (s.qualified, s.softDeleteCol, s.serialKeyOps)) == Seq(
      ("a.t1", None, false), ("a.t2", Some("deleted"), false),
      ("a.t3", None, true), ("a.t4", Some("deleted"), true),
      // a soft-delete column literally named `serial` is expressible
      ("a.t5", Some("serial"), true)))
    // segment order is enforced: the flag token must come LAST
    intercept[IllegalArgumentException] {
      JdbcPollingTailer.fromProperties(Map(
        "debezium.source.jdbc.url" -> "jdbc:derby:memory:parse;create=true",
        "debezium.source.jdbc.tables" -> "a.tx:id:version:serial:deleted",
        "debezium.source.path" -> Files.createTempDirectory("graft-parse2").toString))
    }
  }

  test("snapshot.select.statement.overrides: per-table snapshot SQL filters/projects the dump") {
    import graft.sources.cdc.JdbcPollingTailer
    val url = s"jdbc:derby:memory:ovr${System.nanoTime()};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE SCHEMA shop")
    st.execute("CREATE TABLE shop.items (id INT PRIMARY KEY, name VARCHAR(64), secret VARCHAR(64))")
    (1 to 4).foreach(i => st.execute(
      s"INSERT INTO shop.items VALUES ($i, 'item$i', 'classified$i')"))

    val db = Files.createTempDirectory("graft-ovr")
    // the reference's per-table snapshot override
    // (DebeziumServerTest.java:77-79): filtered AND projected — the
    // `secret` column never leaves the source database
    val tailer = JdbcPollingTailer.fromProperties(Map(
      "debezium.source.jdbc.url" -> url,
      "debezium.source.jdbc.tables" -> "shop.items:id:id",
      "debezium.source.snapshot.select.statement.overrides.shop.items" ->
        "SELECT id, name FROM shop.items WHERE id <= 2",
      "debezium.source.path" -> db.toString))
    assert(tailer.tableSpecs.head.snapshotOverride.exists(_.contains("id <= 2")))
    tailer.snapshot()

    val dump = Files.readAllLines(db.resolve("snapshot/shop.items.jsonl"))
    assert(dump.size == 2, s"override must snapshot only the filtered slice: $dump")
    assert(dump.get(0).contains("\"name\":\"item1\"") && !dump.get(0).contains("secret"),
      s"override must project away unselected columns: ${dump.get(0)}")

    // streaming still covers the full table: rows 3 & 4 sit past the
    // override slice's watermark high-water → the first poll takes them
    assert(tailer.poll() == 2)
    assert(tailer.poll() == 0)
    conn.close()
  }

  test("distributed snapshot: partitioned JDBC read writes a multi-part dump the source scans") {
    import graft.sources.cdc.JdbcPollingTailer
    import JdbcPollingTailer.TableSpec
    import scala.jdk.CollectionConverters._
    val url = s"jdbc:derby:memory:dist${System.nanoTime()};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE SCHEMA inventory")
    st.execute("CREATE TABLE inventory.customers (id INT PRIMARY KEY, " +
      "first_name VARCHAR(64), last_name VARCHAR(64), email VARCHAR(64))")
    (1 to 20).foreach(i =>
      st.execute(s"INSERT INTO inventory.customers VALUES ($i, 'fn$i', 'ln$i', 'e$i@x.com')"))

    val db = Files.createTempDirectory("graft-dist")
    val tailer = new JdbcPollingTailer(url, db,
      Seq(TableSpec("inventory", "customers", Seq("id"), "id")))
    tailer.snapshotDistributed(spark, numPartitions = 3)

    // the dump is a DIRECTORY of part files (parallel snapshot scan)
    val dump = db.resolve("snapshot").resolve("inventory.customers.jsonl")
    assert(Files.isDirectory(dump))
    val parts = Files.list(dump).iterator().asScala
      .count(f => !f.getFileName.toString.startsWith("_") &&
                  !f.getFileName.toString.startsWith("."))
    assert(parts > 1, s"expected a multi-part dump, got $parts part(s)")

    // polling picks up exactly where the watermark bound left off
    st.execute("INSERT INTO inventory.customers VALUES (21, 'Jon', 'Snow', 'j@x.com')")
    assert(tailer.poll() == 1)

    val records = readerFor(db).load()
    assert(records.filter(col("value.op") === "r").count() == 20)
    assert(records.filter(col("value.op") === "c").count() == 1)
    val ids = records.select("key.id").collect().map(_.getInt(0)).sorted.toSeq
    assert(ids == (1 to 21).toSeq)
    conn.close()
  }

  test("live pipeline: JDBC inserts flow through the tailer daemon into the sink") {
    import graft.sources.cdc.JdbcPollingTailer
    val url = s"jdbc:derby:memory:live${System.nanoTime()};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE SCHEMA inventory")
    st.execute("CREATE TABLE inventory.customers (id INT PRIMARY KEY, " +
      "first_name VARCHAR(64), last_name VARCHAR(64), email VARCHAR(64))")
    st.execute("INSERT INTO inventory.customers VALUES (1, 'Sally', 'Thomas', 's@x.com')")

    val db = Files.createTempDirectory("graft-live")
    // config-driven construction: the debezium.source.* namespace
    val tailer = JdbcPollingTailer.fromProperties(Map(
      "debezium.source.jdbc.url" -> url,
      "debezium.source.jdbc.tables" -> "inventory.customers:id:id",
      "debezium.source.path" -> db.toString))
    val sink = new graft.sinks.KvSink
    val spec = graft.pipeline.PipelineSpec(sourcePath = db.toString,
      keySchema = org.apache.spark.sql.types.StructType.fromDDL(keyDdl),
      rowSchema = org.apache.spark.sql.types.StructType.fromDDL(rowDdl),
      sink = sink, sourceType = "graft-cdc")
    val q = graft.pipeline.CdcPipeline.startLive(spark, spec, tailer,
      pollIntervalMs = 100L,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100L))
    try {
      def waitFor(n: Int): Unit = {
        var ms = 0
        while (sink.size("testc.inventory.customers") < n && ms < 60000) {
          Thread.sleep(100); ms += 100
        }
        assert(sink.size("testc.inventory.customers") >= n,
          s"sink has ${sink.size("testc.inventory.customers")} keys, wanted $n")
      }
      waitFor(1) // the snapshot row arrives
      // a LIVE insert is captured by the polling daemon and streamed
      st.execute("INSERT INTO inventory.customers VALUES (2, 'Jon', 'Snow', 'j@x.com')")
      waitFor(2)
      assert(sink.get("testc.inventory.customers", """{"id":2}""").get.contains("Jon"))
    } finally { q.stop(); conn.close() }
  }

  test("snapshot modes: no_data never delivers existing rows; initial_only runs no polling daemon") {
    import graft.sources.cdc.JdbcPollingTailer
    def freshDb(tag: String): (java.sql.Statement, String) = {
      val url = s"jdbc:derby:memory:$tag${System.nanoTime()};create=true"
      val st = java.sql.DriverManager.getConnection(url).createStatement()
      st.execute("CREATE SCHEMA inventory")
      st.execute("CREATE TABLE inventory.customers (id INT PRIMARY KEY, " +
        "first_name VARCHAR(64), last_name VARCHAR(64), email VARCHAR(64))")
      st.execute("INSERT INTO inventory.customers VALUES (1, 'Sally', 'Thomas', 's@x.com')")
      st.execute("INSERT INTO inventory.customers VALUES (2, 'George', 'Bailey', 'g@x.com')")
      (st, url)
    }
    def specFor(db: java.nio.file.Path, sink: graft.sinks.KvSink, mode: String) =
      graft.pipeline.PipelineSpec(sourcePath = db.toString,
        keySchema = org.apache.spark.sql.types.StructType.fromDDL(keyDdl),
        rowSchema = org.apache.spark.sql.types.StructType.fromDDL(rowDdl),
        sink = sink, sourceType = "graft-cdc", snapshotMode = mode)

    // --- no_data: the start point is recorded, the 2 existing rows are
    // never delivered, a post-start insert flows through the daemon
    locally {
      val (st, url) = freshDb("nodata")
      val db = Files.createTempDirectory("graft-nodata")
      val tailer = JdbcPollingTailer.fromProperties(Map(
        "debezium.source.jdbc.url" -> url,
        "debezium.source.jdbc.tables" -> "inventory.customers:id:id",
        "debezium.source.path" -> db.toString))
      val sink = new graft.sinks.KvSink
      val q = graft.pipeline.CdcPipeline.startLive(spark, specFor(db, sink, "no_data"),
        tailer, pollIntervalMs = 100L,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100L))
      try {
        st.execute("INSERT INTO inventory.customers VALUES (3, 'Jon', 'Snow', 'j@x.com')")
        var ms = 0
        while (sink.size("testc.inventory.customers") < 1 && ms < 60000) {
          Thread.sleep(100); ms += 100
        }
        assert(sink.get("testc.inventory.customers", """{"id":3}""").get.contains("Jon"))
        // the pre-existing rows were skipped, not just delayed
        assert(sink.get("testc.inventory.customers", """{"id":1}""").isEmpty)
        assert(sink.size("testc.inventory.customers") == 1)
      } finally q.stop()
    }

    // --- initial_only: the snapshot is delivered, then NO daemon — a
    // later insert is never captured into the layout
    locally {
      val (st, url) = freshDb("initonly")
      val db = Files.createTempDirectory("graft-initonly")
      val tailer = JdbcPollingTailer.fromProperties(Map(
        "debezium.source.jdbc.url" -> url,
        "debezium.source.jdbc.tables" -> "inventory.customers:id:id",
        "debezium.source.path" -> db.toString))
      val sink = new graft.sinks.KvSink
      val q = graft.pipeline.CdcPipeline.startLive(spark, specFor(db, sink, "initial_only"),
        tailer, pollIntervalMs = 100L,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination(120000)
      assert(sink.size("testc.inventory.customers") == 2)
      st.execute("INSERT INTO inventory.customers VALUES (4, 'Anne', 'K', 'a@x.com')")
      Thread.sleep(800)
      val wal = db.resolve("wal")
      val segs = if (Files.exists(wal)) {
        val s = Files.list(wal)
        try s.filter(p => !p.getFileName.toString.startsWith(".")).count()
        finally s.close()
      } else 0L
      assert(segs == 0L, s"initial_only must not poll, found $segs wal segments")
    }

    // unknown modes fail fast
    val err = intercept[IllegalArgumentException] {
      val (_, url) = freshDb("badmode")
      val db = Files.createTempDirectory("graft-badmode")
      val tailer = JdbcPollingTailer.fromProperties(Map(
        "debezium.source.jdbc.url" -> url,
        "debezium.source.jdbc.tables" -> "inventory.customers:id:id",
        "debezium.source.path" -> db.toString))
      graft.pipeline.CdcPipeline.startLive(spark,
        specFor(db, new graft.sinks.KvSink, "sometimes"), tailer)
    }
    assert(err.getMessage.contains("snapshot.mode"))
  }

  test("streaming: snapshot phase then WAL drives the upsert sink to the golden state") {
    val db = fixtureDb()
    val out = Files.createTempDirectory("graft-cdc-sink").toString
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt").toString
    val sink = new ParquetUpsertSink(out, keyFields = Seq("id"))

    def runOnce(): Unit = {
      val stream = spark.readStream.format("graft-cdc")
        .option("path", db.toString)
        .option("keySchema", keyDdl).option("rowSchema", rowDdl)
        .option("table.include.list", "inventory.customers")
        .load()
      val shaped = graft.operators.EventShaping.dropHeartbeats(stream)
      val q = shaped.writeStream.foreachBatch(sink.foreachBatchFn)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    runOnce()
    val state = sink.readTable(spark, "testc.inventory.customers")
      .orderBy("id").collect()
    assert(state.map(_.getAs[Int]("id")).toSeq == Seq(1001, 1002, 1004, 1005))
    assert(state.find(_.getAs[Int]("id") == 1002).get.getAs[String]("email")
      == "george.bailey@example.com")

    // append a new WAL segment; a restarted query resumes FROM THE
    // CHECKPOINTED LSN and applies only the new change
    Files.writeString(db.resolve("wal").resolve("wal-001.jsonl"),
      wal(1006, "c", "Arya", "Stark", "arya@winterfell.org", 9) + "\n")
    runOnce()
    val ids2 = sink.readTable(spark, "testc.inventory.customers")
      .orderBy("id").collect().map(_.getAs[Int]("id")).toSeq
    assert(ids2 == Seq(1001, 1002, 1004, 1005, 1006))
  }
}
