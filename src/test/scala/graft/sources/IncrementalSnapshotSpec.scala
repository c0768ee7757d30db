package graft.sources

import graft.SparkSpec
import graft.sources.cdc.Db2CdTailer
import graft.sources.cdc.Db2CdTailer.{EmulatedDialect, TableSpec}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** DBLog-style incremental snapshot over a native capture: the table
  * reads in key-ordered chunks while the change feed keeps flowing;
  * a chunk row whose key changed inside its watermark window drops
  * (the change event wins), survivors land as op='r'
  * snapshot="incremental" envelopes AFTER the window's changes, and
  * latest-state replay converges to the live table. */
class IncrementalSnapshotSpec extends SparkSpec {

  private val keyDdl = "id INT"
  private val rowDdl = "id INT, name STRING, email STRING"

  private def fixtureDb(): (String, java.sql.Statement) = {
    val url = s"jdbc:derby:memory:incsnap${java.util.UUID.randomUUID().toString.take(8)};create=true"
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

  test("incremental snapshot: chunked reads, concurrent change supersedes its chunk row") {
    val (url, st) = fixtureDb()
    (1 to 10).foreach(i =>
      st.execute(s"INSERT INTO inv.accounts VALUES ($i, 'N$i', 'u$i@x.com')"))

    val db = Files.createTempDirectory("graft-incsnap")
    val tailer = new Db2CdTailer(url, db,
      Seq(TableSpec("inv", "accounts", Seq("id"))), dialect = EmulatedDialect)
    // schema-only start: no initial rows delivered — the incremental
    // snapshot is how existing state reaches the stream
    tailer.snapshotSchemaOnly()

    // a change lands BEFORE the snapshot runs: id=2 updated (CD row
    // past the start position) and the base row updated to match
    st.execute("UPDATE inv.accounts SET email = 'u2@new.com' WHERE id = 2")
    st.execute("""INSERT INTO asn."inv_accounts_CD" VALUES """ +
      "(10, 1, 'U', 2, 'N2', 'u2@new.com', 2, 'N2', 'u2@x.com')")

    // chunkSize 3 → 4 chunks over 10 rows; id=2's chunk drops it
    val emitted = tailer.incrementalSnapshot(chunkSize = 3)
    assert(emitted == 9, s"9 of 10 rows survive (id=2 superseded), got $emitted")

    val batch = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", keyDdl).option("rowSchema", rowDdl)
      .load()
    // window changes precede the chunk rows; every row exactly once
    assert(batch.filter(col("value.op") === "u").count() == 1)
    val reads = batch.filter(col("value.op") === "r")
    assert(reads.count() == 9)
    assert(reads.filter(col("value.source.snapshot") === "incremental").count() == 9)
    assert(reads.filter(col("key.id") === 2).count() == 0, "superseded row must not re-read")

    // latest-state replay converges to the live table
    val state = graft.operators.ApplyChanges.latestState(
        batch.filter(col("value").isNotNull),
        keyCols = Seq(col("key.id")),
        orderCols = Seq(col("value.source.lsn")),
        opCol = col("value.op"))
      .select(col("key.id").as("id"), col("value.after.email").as("email"))
      .orderBy("id").collect()
    assert(state.length == 10)
    assert(state.map(_.getAs[Int]("id")).toSeq == (1 to 10))
    assert(state(1).getAs[String]("email") == "u2@new.com") // the change won
    assert(state(4).getAs[String]("email") == "u5@x.com")

    // a second run re-reads everything (idempotent downstream), still
    // draining nothing new
    assert(tailer.incrementalSnapshot(chunkSize = 100) == 10)
  }

  test("execute-snapshot signal routes to the native incremental snapshot") {
    val (url, st) = fixtureDb()
    (1 to 4).foreach(i =>
      st.execute(s"INSERT INTO inv.accounts VALUES ($i, 'N$i', 'u$i@x.com')"))
    val db = Files.createTempDirectory("graft-incsnapsig")
    val tailer = new Db2CdTailer(url, db,
      Seq(TableSpec("inv", "accounts", Seq("id"))), dialect = EmulatedDialect)
    tailer.snapshotSchemaOnly()

    val channel = new graft.services.Signals.Channel(
      Files.createTempDirectory("graft-sigch"))
    channel.send(graft.services.Signals.Signal("s1", "execute-snapshot", "inv.accounts"))
    channel.send(graft.services.Signals.Signal("s2", "custom-type", "x"))
    val leftover = graft.pipeline.CdcPipeline.processSignals(
      spark, channel, queries = Map.empty, native = Some(tailer))
    assert(leftover.map(_.`type`) == Seq("custom-type")) // unknown passes through

    val batch = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", keyDdl).option("rowSchema", rowDdl)
      .load()
    assert(batch.filter(col("value.source.snapshot") === "incremental").count() == 4)

    // a signal naming an uncaptured table falls through to no handler
    // (no spec either) and surfaces to the caller instead of silently
    // snapshotting the wrong table
    channel.send(graft.services.Signals.Signal("s3", "execute-snapshot", "inv.unknown"))
    val left2 = graft.pipeline.CdcPipeline.processSignals(
      spark, channel, queries = Map.empty, native = Some(tailer))
    assert(left2.map(_.id) == Seq("s3"))
  }

  test("execute-snapshot accepts the reference's JSON payload form") {
    val (url, st) = fixtureDb()
    (1 to 3).foreach(i =>
      st.execute(s"INSERT INTO inv.accounts VALUES ($i, 'N$i', 'u$i@x.com')"))
    val db = Files.createTempDirectory("graft-incsnapjson")
    val tailer = new Db2CdTailer(url, db,
      Seq(TableSpec("inv", "accounts", Seq("id"))), dialect = EmulatedDialect)
    tailer.snapshotSchemaOnly()

    val channel = new graft.services.Signals.Channel(
      Files.createTempDirectory("graft-sigjson"))
    // JSON payload, explicit incremental type → native DBLog path
    channel.send(graft.services.Signals.Signal("j1", "execute-snapshot",
      """{"data-collections": ["inv.accounts"], "type": "incremental"}"""))
    // blocking type: NOT the native path; with no spec it surfaces back
    channel.send(graft.services.Signals.Signal("j2", "execute-snapshot",
      """{"data-collections": ["inv.accounts"], "type": "blocking"}"""))
    // empty collections: nothing to snapshot — surfaces back
    channel.send(graft.services.Signals.Signal("j3", "execute-snapshot",
      """{"data-collections": []}"""))
    val leftover = graft.pipeline.CdcPipeline.processSignals(
      spark, channel, queries = Map.empty, native = Some(tailer))
    assert(leftover.map(_.id) == Seq("j2", "j3"))

    val batch = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", keyDdl).option("rowSchema", rowDdl)
      .load()
    assert(batch.filter(col("value.source.snapshot") === "incremental").count() == 3)
  }

  test("incremental snapshot races a live poll daemon: no segment lost, state converges") {
    val (url, st) = fixtureDb()
    (1 to 200).foreach(i =>
      st.execute(s"INSERT INTO inv.accounts VALUES ($i, 'N$i', 'u$i@x.com')"))
    val db = Files.createTempDirectory("graft-incsnaprace")
    val tailer = new Db2CdTailer(url, db,
      Seq(TableSpec("inv", "accounts", Seq("id"))), dialect = EmulatedDialect)
    tailer.snapshotSchemaOnly()

    // a writer thread keeps updating rows (CD entries) while a poll
    // loop drains them — both racing the chunked snapshot's watermark
    // drains and WAL seq allocation
    val conn2 = java.sql.DriverManager.getConnection(url)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val updated = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val writer = new Thread(() => {
      var seq = 100L
      var i = 1
      while (!stop.get() && i <= 50) {
        val id = i * 4 // spread across chunks
        val ps = conn2.prepareStatement(
          """INSERT INTO asn."inv_accounts_CD" VALUES (?, 1, 'U', ?, ?, ?, ?, ?, ?)""")
        ps.setLong(1, seq); ps.setInt(2, id); ps.setString(3, s"N$id")
        ps.setString(4, s"u$id@new.com"); ps.setInt(5, id)
        ps.setString(6, s"N$id"); ps.setString(7, s"u$id@x.com")
        ps.executeUpdate(); ps.close()
        conn2.createStatement().execute(
          s"UPDATE inv.accounts SET email = 'u$id@new.com' WHERE id = $id")
        updated.add(id)
        tailer.poll()
        seq += 1; i += 1
      }
    })
    writer.start()
    val emitted = tailer.incrementalSnapshot(chunkSize = 7)
    writer.join(60000)
    stop.set(true)
    tailer.poll() // drain any tail changes past the last snapshot window

    val batch = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", keyDdl).option("rowSchema", rowDdl)
      .load()
    // every envelope written exactly once: lsn values are unique (a
    // lost/overwritten WAL segment would drop a whole lsn run)
    val lsns = batch.filter(col("value").isNotNull).select("value.source.lsn")
      .collect().map(_.getLong(0)).toSeq
    assert(lsns.size == lsns.distinct.size, "duplicate lsn = overwritten segment")
    assert(batch.filter(col("value.op") === "u").count() == 50)
    assert(emitted <= 200)

    // convergence: latest state by lsn equals the live table
    val state = graft.operators.ApplyChanges.latestState(
        batch.filter(col("value").isNotNull),
        keyCols = Seq(col("key.id")),
        orderCols = Seq(col("value.source.lsn")),
        opCol = col("value.op"))
      .select(col("key.id").as("id"), col("value.after.email").as("email"))
      .collect().map(r => r.getAs[Int]("id") -> r.getAs[String]("email")).toMap
    assert(state.size == 200)
    (1 to 200).foreach { id =>
      val want = if (updated.contains(id)) s"u$id@new.com" else s"u$id@x.com"
      assert(state(id) == want, s"id=$id: ${state(id)} != $want")
    }
    conn2.close()
  }

  test("incremental snapshot: requires a prior start point; empty table emits nothing") {
    val (url, _) = fixtureDb()
    val db = Files.createTempDirectory("graft-incsnapb")
    val tailer = new Db2CdTailer(url, db,
      Seq(TableSpec("inv", "accounts", Seq("id"))), dialect = EmulatedDialect)
    intercept[IllegalArgumentException](tailer.incrementalSnapshot())
    tailer.snapshotSchemaOnly()
    assert(tailer.incrementalSnapshot() == 0)
  }

  private def waitFor(what: String)(cond: => Boolean): Unit = {
    val deadline = System.nanoTime() + 30e9.toLong
    while (!cond) {
      assert(System.nanoTime() < deadline, s"timed out waiting for $what")
      Thread.sleep(5)
    }
  }

  test("snapshot notifications: STARTED / TABLE_SCAN_COMPLETED / COMPLETED") {
    val (url, st) = fixtureDb()
    (1 to 7).foreach(i =>
      st.execute(s"INSERT INTO inv.accounts VALUES ($i, 'N$i', 'u$i@x.com')"))
    val db = Files.createTempDirectory("graft-incsnapntf")
    val mem = new graft.services.Notifications.MemoryChannel
    val tailer = new Db2CdTailer(url, db,
        Seq(TableSpec("inv", "accounts", Seq("id"))), dialect = EmulatedDialect)
      .withNotifications(new graft.services.Notifications.Dispatcher(Seq(mem)))
    tailer.snapshotSchemaOnly()
    assert(tailer.incrementalSnapshot(chunkSize = 3) == 7)

    val got = mem.all
    assert(got.map(_.`type`) == Seq("STARTED", "TABLE_SCAN_COMPLETED", "COMPLETED"))
    assert(got.forall(_.aggregateType ==
      graft.services.Notifications.AggregateIncrementalSnapshot))
    assert(got(0).additionalData("data_collections") == "inv.accounts")
    assert(got(1).additionalData("data_collection") == "inv.accounts")
    assert(got(1).additionalData("scanned_rows") == "7")
    assert(got(2).additionalData("emitted_rows") == "7")
  }

  test("pause-snapshot parks the chunk loop; resume-snapshot releases it") {
    val (url, st) = fixtureDb()
    (1 to 20).foreach(i =>
      st.execute(s"INSERT INTO inv.accounts VALUES ($i, 'N$i', 'u$i@x.com')"))
    val db = Files.createTempDirectory("graft-incsnappause")
    val mem = new graft.services.Notifications.MemoryChannel
    val tailer = new Db2CdTailer(url, db,
        Seq(TableSpec("inv", "accounts", Seq("id"))), dialect = EmulatedDialect)
      .withNotifications(new graft.services.Notifications.Dispatcher(Seq(mem)))
    tailer.snapshotSchemaOnly()

    // a standing pause holds across snapshot entry: the loop parks
    // BEFORE its first chunk, so nothing emits until resume
    tailer.pauseIncrementalSnapshot()
    val result = new java.util.concurrent.atomic.AtomicInteger(-1)
    val t = new Thread(() => result.set(tailer.incrementalSnapshot(chunkSize = 4)))
    t.start()
    waitFor("STARTED")(mem.all.exists(_.`type` == "STARTED"))
    Thread.sleep(100) // paused: the loop must not progress
    assert(!mem.all.exists(_.`type` == "COMPLETED"))
    assert(result.get() == -1)

    tailer.resumeIncrementalSnapshot()
    t.join(30000)
    assert(result.get() == 20)
    val types = mem.all.map(_.`type`)
    assert(types == Seq("PAUSED", "STARTED", "RESUMED",
      "TABLE_SCAN_COMPLETED", "COMPLETED"))
  }

  test("stop-snapshot aborts the run; a named collection only excludes that table") {
    val (url, st) = fixtureDb()
    (1 to 10).foreach(i =>
      st.execute(s"INSERT INTO inv.accounts VALUES ($i, 'N$i', 'u$i@x.com')"))
    st.execute("CREATE TABLE inv.orders (id INT PRIMARY KEY, " +
      "name VARCHAR(64), email VARCHAR(64))")
    st.execute("""CREATE TABLE asn."inv_orders_CD" (""" +
      "ibmsnap_commitseq BIGINT, ibmsnap_intentseq BIGINT, " +
      "ibmsnap_operation CHAR(1), " +
      "id INT, name VARCHAR(64), email VARCHAR(64), " +
      "xid INT, xname VARCHAR(64), xemail VARCHAR(64))")
    (1 to 5).foreach(i =>
      st.execute(s"INSERT INTO inv.orders VALUES ($i, 'O$i', 'o$i@x.com')"))

    val db = Files.createTempDirectory("graft-incsnapstop")
    val mem = new graft.services.Notifications.MemoryChannel
    val tailer = new Db2CdTailer(url, db,
        Seq(TableSpec("inv", "accounts", Seq("id")),
            TableSpec("inv", "orders", Seq("id"))), dialect = EmulatedDialect)
      .withNotifications(new graft.services.Notifications.Dispatcher(Seq(mem)))
    tailer.snapshotSchemaOnly()

    // stop-snapshot naming inv.accounts: only orders scans — routed
    // through the signal channel like the reference's control path
    val channel = new graft.services.Signals.Channel(
      Files.createTempDirectory("graft-sigstop"))
    tailer.pauseIncrementalSnapshot()
    val result = new java.util.concurrent.atomic.AtomicInteger(-1)
    val t = new Thread(() => result.set(tailer.incrementalSnapshot(chunkSize = 4)))
    t.start()
    waitFor("STARTED")(mem.all.exists(_.`type` == "STARTED"))
    channel.send(graft.services.Signals.Signal("s1", "stop-snapshot", "inv.accounts"))
    channel.send(graft.services.Signals.Signal("s2", "resume-snapshot", ""))
    assert(graft.pipeline.CdcPipeline.processSignals(
      spark, channel, queries = Map.empty, native = Some(tailer)).isEmpty)
    t.join(30000)
    assert(result.get() == 5, "only inv.orders scanned")
    val scans = mem.all.filter(_.`type` == "TABLE_SCAN_COMPLETED")
    assert(scans.map(_.additionalData("data_collection")) == Seq("inv.orders"))
    assert(mem.all.map(_.`type`).last == "COMPLETED", "named stop is not an abort")

    // bare stop-snapshot: the whole run aborts before its first chunk
    val mem2 = new graft.services.Notifications.MemoryChannel
    val tailer2 = new Db2CdTailer(url, db,
        Seq(TableSpec("inv", "accounts", Seq("id"))), dialect = EmulatedDialect)
      .withNotifications(new graft.services.Notifications.Dispatcher(Seq(mem2)))
    tailer2.pauseIncrementalSnapshot()
    val result2 = new java.util.concurrent.atomic.AtomicInteger(-1)
    val t2 = new Thread(() => result2.set(tailer2.incrementalSnapshot(chunkSize = 4)))
    t2.start()
    waitFor("STARTED (2)")(mem2.all.exists(_.`type` == "STARTED"))
    channel.send(graft.services.Signals.Signal("s3", "stop-snapshot", ""))
    assert(graft.pipeline.CdcPipeline.processSignals(
      spark, channel, queries = Map.empty, native = Some(tailer2)).isEmpty)
    t2.join(30000)
    assert(result2.get() == 0, "aborted before any chunk")
    assert(mem2.all.map(_.`type`).last == "ABORTED")

    // a later run recovers from the stopped state
    assert(tailer2.incrementalSnapshot(chunkSize = 100) == 10)
    assert(mem2.all.map(_.`type`).last == "COMPLETED")
  }
}
