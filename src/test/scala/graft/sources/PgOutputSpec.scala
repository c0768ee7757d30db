package graft.sources

import graft.SparkSpec
import graft.sources.cdc.PgOutputDecoder
import org.apache.spark.sql.functions._
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Fixture-driven pgoutput protocol decoding: binary replication
  * messages (built here byte-for-byte per the PostgreSQL "Logical
  * Replication Message Formats" wire spec) decode into the same
  * CdcLayout the DSv2 source reads — including the two change shapes
  * watermark polling can NEVER capture: hard deletes and before
  * images. */
class PgOutputSpec extends SparkSpec {

  private def msg(f: ByteBuffer => Unit): Array[Byte] = {
    val b = ByteBuffer.allocate(8192) // big-endian, pgoutput's byte order
    f(b)
    val out = new Array[Byte](b.position()); b.flip(); b.get(out); out
  }
  private def cstr(b: ByteBuffer, s: String): Unit = {
    b.put(s.getBytes(StandardCharsets.UTF_8)); b.put(0.toByte)
  }
  /** TupleData: ncols then 'n' (null) / 't' (text, len-prefixed). */
  private def tup(b: ByteBuffer, vals: Seq[Option[String]]): Unit = {
    b.putShort(vals.size.toShort)
    vals.foreach {
      case None => b.put('n'.toByte)
      case Some(v) =>
        b.put('t'.toByte)
        val by = v.getBytes(StandardCharsets.UTF_8)
        b.putInt(by.length); b.put(by)
    }
  }
  private def relationMsg(oid: Int, ns: String, name: String, identity: Char,
                          cols: Seq[(String, Int, Boolean)]): Array[Byte] = msg { b =>
    b.put('R'.toByte); b.putInt(oid); cstr(b, ns); cstr(b, name)
    b.put(identity.toByte); b.putShort(cols.size.toShort)
    cols.foreach { case (n, oidT, key) =>
      b.put((if (key) 1 else 0).toByte); cstr(b, n); b.putInt(oidT); b.putInt(-1)
    }
  }

  test("pgoutput: hard deletes + before images decode into the cdc layout the source reads") {
    val dec = new PgOutputDecoder(startLsn = 4)
    // one transaction: B, R(full identity), I, U(with old tuple), D(with
    // old tuple), R(default identity), D(key-only), C
    val begin = msg { b =>
      b.put('B'.toByte); b.putLong(0x16B6E50L)
      b.putLong(820454400000000L) // pg micros → 2025-12-31T00:00:00Z
      b.putInt(777)
    }
    val relFull = relationMsg(55, "inventory", "customers", 'f', Seq(
      ("id", 23, true), ("first_name", 25, false), ("last_name", 25, false), ("email", 25, false)))
    val ins = msg { b =>
      b.put('I'.toByte); b.putInt(55); b.put('N'.toByte)
      tup(b, Seq(Some("1005"), Some("Jon"), Some("Snow"), Some("jon@got.com")))
    }
    val upd = msg { b =>
      b.put('U'.toByte); b.putInt(55)
      b.put('O'.toByte) // REPLICA IDENTITY FULL: complete old tuple
      tup(b, Seq(Some("1002"), Some("George"), Some("Bailey"), Some("gbailey@foobar.com")))
      b.put('N'.toByte)
      tup(b, Seq(Some("1002"), Some("George"), Some("Bailey"), Some("george@example.com")))
    }
    val del = msg { b =>
      b.put('D'.toByte); b.putInt(55)
      b.put('O'.toByte) // hard delete WITH before image
      tup(b, Seq(Some("1003"), Some("Edward"), Some("Walker"), Some("ed@walker.com")))
    }
    val relDefault = relationMsg(56, "inventory", "orders", 'd', Seq(
      ("id", 23, true), ("first_name", 25, false), ("last_name", 25, false), ("email", 25, false)))
    val delKeyOnly = msg { b =>
      b.put('D'.toByte); b.putInt(56)
      b.put('K'.toByte) // default identity: key-only old tuple
      tup(b, Seq(Some("42")))
    }
    val commit = msg { b =>
      b.put('C'.toByte); b.put(0.toByte)
      b.putLong(0x16B6E50L); b.putLong(0x16B6E58L); b.putLong(820454400000000L)
    }

    val lines = dec.decodeAll(
      Seq(begin, relFull, ins, upd, del, relDefault, delKeyOnly, commit))
    // 4 DML envelopes + 2 compaction tombstones (one per delete)
    assert(lines.size == 6, s"4 DML + 2 tombstones expected:\n${lines.mkString("\n")}")
    assert(lines.count(_.contains("\"value\":null")) == 2)
    assert(dec.currentLsn == 8) // seeded at 4, one per DML; tombstones take none

    // into the layout, read back through the DSv2 source
    val db = Files.createTempDirectory("graft-pgout")
    Files.createDirectories(db.resolve("snapshot"))
    Files.writeString(db.resolve("snapshot/_lsn"), "4")
    PgOutputDecoder.appendSegment(db, lines)
    val batch = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", "id INT")
      .option("rowSchema", "id INT, first_name STRING, last_name STRING, email STRING")
      .load()

    val byOpLsn = batch.filter(col("value").isNotNull)
      .select("value.op", "value.source.lsn").collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._2)
    assert(byOpLsn.toSeq == Seq("c" -> 5L, "u" -> 6L, "d" -> 7L, "d" -> 8L))
    assert(batch.filter(col("value").isNull).count() == 2) // the tombstones

    // the UPDATE carries the full before image (old email), after has the new
    val u = batch.filter(col("value.op") === "u").head()
    assert(u.getAs[org.apache.spark.sql.Row]("value")
      .getAs[org.apache.spark.sql.Row]("before").getAs[String]("email") == "gbailey@foobar.com")
    assert(u.getAs[org.apache.spark.sql.Row]("value")
      .getAs[org.apache.spark.sql.Row]("after").getAs[String]("email") == "george@example.com")

    // the HARD delete: before image present, after null, key extracted
    val d = batch.filter(col("value.op") === "d" && col("value.source.table") === "customers").head()
    val dv = d.getAs[org.apache.spark.sql.Row]("value")
    assert(dv.getAs[org.apache.spark.sql.Row]("before").getAs[String]("email") == "ed@walker.com")
    assert(dv.isNullAt(dv.fieldIndex("after")))
    assert(d.getAs[org.apache.spark.sql.Row]("key").getAs[Int]("id") == 1003)

    // default-identity delete: key-only before image — id set, rest null
    val dk = batch.filter(col("value.op") === "d" && col("value.source.table") === "orders").head()
    val dkv = dk.getAs[org.apache.spark.sql.Row]("value")
    val dkb = dkv.getAs[org.apache.spark.sql.Row]("before")
    assert(dkb.getAs[Int]("id") == 42 && dkb.isNullAt(dkb.fieldIndex("email")))

    // commit timestamp stamped through (pg epoch conversion)
    assert(dv.getAs[Long]("ts_ms") == 820454400000L + 946684800000L)
  }

  test("replication tailer: feed → decoder → layout → stream → upsert sink end-to-end") {
    import graft.sources.cdc.{ReplicationFeed, ReplicationTailer}
    // snapshot: 2 rows; live feed: one txn inserting 1003, updating
    // 1001's email, hard-deleting 1002
    val db = Files.createTempDirectory("graft-repl")
    val snap = Files.createDirectories(db.resolve("snapshot"))
    Files.writeString(snap.resolve("_lsn"), "2")
    Files.writeString(snap.resolve("inventory.customers.jsonl"),
      """{"id":1001,"first_name":"Sally","last_name":"Thomas","email":"sally@acme.com"}""" + "\n" +
      """{"id":1002,"first_name":"George","last_name":"Bailey","email":"gb@foobar.com"}""" + "\n")

    val rel = relationMsg(55, "inventory", "customers", 'f', Seq(
      ("id", 23, true), ("first_name", 25, false), ("last_name", 25, false), ("email", 25, false)))
    val txn = Seq(
      msg { b => b.put('B'.toByte); b.putLong(1L); b.putLong(0L); b.putInt(1) },
      rel,
      msg { b =>
        b.put('I'.toByte); b.putInt(55); b.put('N'.toByte)
        tup(b, Seq(Some("1003"), Some("Edward"), Some("Walker"), Some("ed@walker.com")))
      },
      msg { b =>
        b.put('U'.toByte); b.putInt(55); b.put('N'.toByte)
        tup(b, Seq(Some("1001"), Some("Sally"), Some("Thomas"), Some("sally@example.org")))
      },
      msg { b =>
        b.put('D'.toByte); b.putInt(55); b.put('K'.toByte); tup(b, Seq(Some("1002")))
      },
      msg { b => b.put('C'.toByte); b.put(0.toByte); b.putLong(1L); b.putLong(2L); b.putLong(0L) })

    // a feed that delivers the transaction across two polls then dries up
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Array[Byte]]]()
    batches.add(txn.take(3)); batches.add(txn.drop(3))
    val feed = new ReplicationFeed {
      override def poll(): Seq[Array[Byte]] = Option(batches.poll()).getOrElse(Nil)
    }
    val dec = new graft.sources.cdc.PgOutputDecoder(startLsn = 2)
    val tailer = new ReplicationTailer(feed, dec.decode, db, maxSegmentRecords = 2)
    val daemon = tailer.daemon(intervalMs = 50).start()
    def walCount: Long = Files.list(db.resolve("wal")).filter(p =>
      !p.getFileName.toString.startsWith(".")).count()
    try {
      val deadline = System.nanoTime() + 30e9.toLong
      // batch 1 (B,R,I) → 1 line; batch 2 (U,D,C) → 3 lines (update,
      // delete, tombstone) at 2 lines/segment: 3 segments total
      while (walCount < 3 && System.nanoTime() < deadline) Thread.sleep(50)
    } finally daemon.close()
    assert(daemon.errorCount == 0)

    // stream the layout into the upsert sink: final state = live table
    val out = Files.createTempDirectory("graft-repl-sink").toString
    val ckpt = Files.createTempDirectory("graft-repl-ckpt").toString
    val sink = new graft.sinks.ParquetUpsertSink(out, keyFields = Seq("id"))
    val q = spark.readStream.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", "id INT")
      .option("rowSchema", "id INT, first_name STRING, last_name STRING, email STRING")
      .load()
      .writeStream.foreachBatch(sink.foreachBatchFn)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val state = sink.readTable(spark, "testc.inventory.customers").orderBy("id").collect()
    assert(state.map(_.getAs[Int]("id")).toSeq == Seq(1001, 1003)) // 1002 hard-deleted
    assert(state.head.getAs[String]("email") == "sally@example.org")
  }

  test("config-shape live pipeline: file feed → pgoutput decoder → stream → kv sink, live appends + hard delete") {
    import graft.sources.cdc.{FileReplicationFeed, PgOutputDecoder, ReplicationTailer}
    val db = Files.createTempDirectory("graft-replpipe")
    val snap = Files.createDirectories(db.resolve("snapshot"))
    Files.writeString(snap.resolve("_lsn"), "1")
    Files.writeString(snap.resolve("inventory.customers.jsonl"),
      """{"id":1,"first_name":"Sally","last_name":"Thomas","email":"s@x.com"}""" + "\n")

    val feedDir = Files.createTempDirectory("graft-feed")
    def put(name: String, bytes: Array[Byte]): Unit = {
      val tmp = feedDir.resolve("." + name + ".tmp")
      Files.write(tmp, bytes)
      Files.move(tmp, feedDir.resolve(name), java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    val rel = relationMsg(55, "inventory", "customers", 'f', Seq(
      ("id", 23, true), ("first_name", 25, false), ("last_name", 25, false), ("email", 25, false)))
    put("000001.msg", msg { b => b.put('B'.toByte); b.putLong(1L); b.putLong(0L); b.putInt(1) })
    put("000002.msg", rel)
    put("000003.msg", msg { b =>
      b.put('I'.toByte); b.putInt(55); b.put('N'.toByte)
      tup(b, Seq(Some("2"), Some("Jon"), Some("Snow"), Some("j@x.com")))
    })

    val tailer = new ReplicationTailer(
      new FileReplicationFeed(feedDir, offsetFile = Some(db.resolve("_feed_offset"))),
      new PgOutputDecoder(startLsn = 1).decode, db)
    val sink = new graft.sinks.KvSink
    val spec = graft.pipeline.PipelineSpec(sourcePath = db.toString,
      keySchema = org.apache.spark.sql.types.StructType.fromDDL("id INT"),
      rowSchema = org.apache.spark.sql.types.StructType.fromDDL(
        "id INT, first_name STRING, last_name STRING, email STRING"),
      sink = sink, sourceType = "graft-cdc")
    val q = graft.pipeline.CdcPipeline.startReplication(spark, spec, tailer,
      drainIntervalMs = 100L,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100L))
    try {
      def waitUntil(cond: => Boolean, what: String): Unit = {
        var ms = 0
        while (!cond && ms < 60000) { Thread.sleep(100); ms += 100 }
        assert(cond, s"timed out waiting for $what")
      }
      waitUntil(sink.size("testc.inventory.customers") >= 2, "snapshot + decoded insert")
      assert(sink.get("testc.inventory.customers", """{"id":2}""").get.contains("Jon"))
      // a LIVE protocol message appears in the feed dir: hard delete of
      // the snapshot row — the shape polling could never capture
      put("000004.msg", msg { b =>
        b.put('D'.toByte); b.putInt(55); b.put('K'.toByte); tup(b, Seq(Some("1")))
      })
      waitUntil(sink.get("testc.inventory.customers", """{"id":1}""").isEmpty,
        "hard delete applied to the kv sink")
      assert(sink.get("testc.inventory.customers", """{"id":2}""").isDefined)
    } finally q.stop()
  }

  test("file replication feed: name order, at-least-once commit, offset restart, late files") {
    import graft.sources.cdc.FileReplicationFeed
    val dir = Files.createTempDirectory("graft-feedoff")
    val off = dir.resolve("_offsets")
    Files.write(dir.resolve("b.msg"), Array[Byte](2))
    Files.write(dir.resolve("a.msg"), Array[Byte](1))
    val feed = new FileReplicationFeed(dir, Some(off))
    assert(feed.poll().map(_.head).toSeq == Seq(1.toByte, 2.toByte)) // name order
    // an UN-COMMITTED poll re-delivers (the decode failed downstream) —
    // messages are never lost to a failed drain
    assert(feed.poll().map(_.head).toSeq == Seq(1.toByte, 2.toByte))
    feed.commit()
    assert(feed.poll().isEmpty)
    // restart: committed names persisted, nothing re-delivered
    val feed2 = new FileReplicationFeed(dir, Some(off))
    assert(feed2.poll().isEmpty)
    Files.write(dir.resolve("c.msg"), Array[Byte](3))
    assert(feed2.poll().map(_.head).toSeq == Seq(3.toByte)) // late arrival
    // crash BEFORE commit: a fresh feed re-delivers the unacked file
    val feed3 = new FileReplicationFeed(dir, Some(off))
    assert(feed3.poll().map(_.head).toSeq == Seq(3.toByte))
    feed3.commit()
    assert(new FileReplicationFeed(dir, Some(off)).poll().isEmpty)
  }

  test("file replication feed: polling does not leak directory file descriptors") {
    import graft.sources.cdc.FileReplicationFeed
    val dir = Files.createTempDirectory("graft-feedfd")
    (1 to 5).foreach(i => Files.write(dir.resolve(f"m$i%03d.msg"), Array[Byte](i.toByte)))
    val feed = new FileReplicationFeed(dir)
    // no GC between measurements: a leaked stream's handle is only
    // reclaimed by finalization, so the count must stay flat WITHOUT it
    def fdCount(): Int =
      Files.list(java.nio.file.Paths.get("/proc/self/fd")).count().toInt
    feed.poll() // warm any lazily-initialized machinery
    val before = fdCount()
    // the daemon polls at 1 Hz forever — 500 polls models ~8 minutes of
    // uptime; an unclosed Files.list would leak one FD per poll
    (1 to 500).foreach(_ => feed.poll())
    val after = fdCount()
    assert(after - before < 20, s"FD count grew $before -> $after over 500 polls")
  }

  test("replication tailer: a failed decode leaves no segment and the next drain re-delivers") {
    import graft.sources.cdc.{ReplicationFeed, ReplicationTailer, PgOutputDecoder}
    val db = Files.createTempDirectory("graft-redeliver")
    val rel = relationMsg(55, "s", "t", 'd', Seq(("id", 23, true)))
    val good = msg { b =>
      b.put('I'.toByte); b.putInt(55); b.put('N'.toByte); tup(b, Seq(Some("1")))
    }
    val bad = java.util.Arrays.copyOfRange(good, 0, good.length - 2) // truncated
    var healed = false
    val feed = new ReplicationFeed {
      override def poll(): Seq[Array[Byte]] =
        if (healed) Seq(rel, good) else Seq(rel, good, bad)
    }
    val tailer = new ReplicationTailer(feed, new PgOutputDecoder().decode, db)
    intercept[IllegalArgumentException] { tailer.drainOnce() }
    // nothing landed: the failed batch produced NO partial segment
    assert(Files.list(db.resolve("wal")).count() == 0)
    healed = true // upstream fixed the frame; the feed re-delivers
    assert(tailer.drainOnce() == 1)
    assert(Files.list(db.resolve("wal")).count() == 1)
  }

  test("pgoutput: PK update retires the old key (delete+tombstone+create); UTF-8 identifiers; non-finite floats") {
    val dec = new PgOutputDecoder(startLsn = 0)
    // UTF-8 table and column names — PostgreSQL sends identifiers UTF-8
    val rel = relationMsg(60, "inventory", "bücher", 'f', Seq(
      ("id", 23, true), ("prix", 701, false), ("título", 25, false)))
    assert(dec.decode(rel).isEmpty)

    // NaN float4/8: bare it would poison the JSON line — must be quoted
    val ins = msg { b =>
      b.put('I'.toByte); b.putInt(60); b.put('N'.toByte)
      tup(b, Seq(Some("1"), Some("NaN"), Some("Gödel, Escher, Bach")))
    }
    val Seq(insLine) = dec.decode(ins)
    assert(insLine.contains(""""prix":"NaN""""), insLine)
    assert(insLine.contains("inventory.bücher"), insLine)

    // same-key update: a single 'u' (Infinity also quoted)
    val updSame = msg { b =>
      b.put('U'.toByte); b.putInt(60)
      b.put('O'.toByte); tup(b, Seq(Some("1"), Some("NaN"), Some("Gödel, Escher, Bach")))
      b.put('N'.toByte); tup(b, Seq(Some("1"), Some("-Infinity"), Some("Gödel, Escher, Bach")))
    }
    val uLines = dec.decode(updSame)
    assert(uLines.size == 1 && uLines.head.contains(""""op":"u""""), uLines.mkString("\n"))
    assert(uLines.head.contains(""""prix":"-Infinity""""), uLines.head)

    // PRIMARY-KEY update (old tuple on the wire, key columns differ):
    // Debezium semantics — delete under the old key + tombstone + create
    // under the new key, so compacted/upsert sinks drop the stale row
    val updPk = msg { b =>
      b.put('U'.toByte); b.putInt(60)
      b.put('O'.toByte); tup(b, Seq(Some("1"), Some("3.5"), Some("x")))
      b.put('N'.toByte); tup(b, Seq(Some("2"), Some("3.5"), Some("x")))
    }
    val pk = dec.decode(updPk)
    assert(pk.size == 3, pk.mkString("\n"))
    assert(pk(0).contains(""""op":"d"""") && pk(0).contains(""""key":{"id":1}"""), pk(0))
    assert(pk(1).contains(""""value":null""") && pk(1).contains(""""key":{"id":1}"""), pk(1))
    assert(pk(2).contains(""""op":"c"""") && pk(2).contains(""""key":{"id":2}"""), pk(2))

    // every line is valid JSON the DSv2 source parses: UTF-8 names and
    // quoted NaN/-Infinity round-trip (Spark's JSON reader maps the
    // quoted forms back to the IEEE values for DOUBLE columns)
    val db = Files.createTempDirectory("graft-pgutf8")
    Files.createDirectories(db.resolve("snapshot"))
    Files.writeString(db.resolve("snapshot/_lsn"), "0")
    PgOutputDecoder.appendSegment(db, Seq(insLine) ++ uLines ++ pk)
    val batch = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", "id INT")
      .option("rowSchema", "id INT, prix DOUBLE, `título` STRING")
      .load()
    val rows = batch.filter(col("value").isNotNull)
    assert(rows.count() == 4)
    assert(rows.filter(col("value.source.table") === "bücher").count() == 4)
    val after = rows.filter(col("value.op") === "c" && col("key.id") === 1).head()
      .getAs[org.apache.spark.sql.Row]("value").getAs[org.apache.spark.sql.Row]("after")
    assert(after.getAs[Double]("prix").isNaN)
    assert(after.getAs[String]("título") == "Gödel, Escher, Bach")
  }

  test("pgoutput: binary-format tuples render the same envelope JSON as text mode") {
    val dec = new PgOutputDecoder(startLsn = 0)
    val rel = relationMsg(70, "s", "typed", 'd', Seq(
      ("id", 23, true), ("big", 20, false), ("ok", 16, false), ("score", 701, false),
      ("price", 1700, false), ("note", 25, false), ("raw", 17, false),
      ("ts", 1114, false), ("tsz", 1184, false), ("d", 1082, false), ("u", 2950, false)))
    assert(dec.decode(rel).isEmpty)

    def bval(b: ByteBuffer)(f: ByteBuffer => Unit): Unit = {
      val v = ByteBuffer.allocate(64); f(v)
      b.put('b'.toByte); b.putInt(v.position())
      v.flip(); b.put(v)
    }
    val ins = msg { b =>
      b.put('I'.toByte); b.putInt(70); b.put('N'.toByte)
      b.putShort(11)
      bval(b)(_.putInt(7))                     // id int4
      bval(b)(_.putLong(1234567890123L))       // big int8
      bval(b)(_.put(1.toByte))                 // ok bool
      bval(b)(_.putLong(java.lang.Double.doubleToLongBits(Double.NaN))) // score float8
      // numeric 12345.678: base-10000 digits [1, 2345, 6780], weight 1, dscale 3
      bval(b) { v => v.putShort(3); v.putShort(1); v.putShort(0); v.putShort(3)
        v.putShort(1); v.putShort(2345); v.putShort(6780) }
      bval(b)(_.put("héllo".getBytes(StandardCharsets.UTF_8))) // note text
      bval(b)(_.put(Array[Byte](0xDE.toByte, 0xAD.toByte)))    // raw bytea
      bval(b)(_.putLong(820454400123456L))     // ts: micros since 2000 → 2025-12-31
      bval(b)(_.putLong(820454400500000L))     // tsz
      bval(b)(_.putInt(9721))                  // date: 2000-01-01 + 9721 d = 2026-08-13
      bval(b) { v => v.putLong(0x0123456789abcdefL); v.putLong(0x0fedcba987654321L) }
    }
    val Seq(line) = dec.decode(ins)
    assert(line.contains(""""id":7"""), line)
    assert(line.contains(""""big":1234567890123"""), line)
    assert(line.contains(""""ok":true"""), line)
    assert(line.contains(""""score":"NaN""""), line) // non-finite stays quoted
    assert(line.contains(""""price":12345.678"""), line)
    assert(line.contains(""""note":"héllo""""), line)
    assert(line.contains(""""raw":"\\xdead""""), line)
    assert(line.contains(""""ts":"2025-12-31 00:00:00.123456""""), line)
    assert(line.contains(""""tsz":"2025-12-31 00:00:00.5+00""""), line)
    assert(line.contains(""""d":"2026-08-13""""), line)
    assert(line.contains(""""u":"01234567-89ab-cdef-0fed-cba987654321""""), line)

    // negative numeric with leading zero integer part: -0.0420
    val negNum = msg { b =>
      b.put('I'.toByte); b.putInt(70); b.put('N'.toByte)
      b.putShort(11)
      bval(b)(_.putInt(8))
      (0 until 3).foreach(_ => b.put('n'.toByte)) // big, ok, score
      // digits [420] at weight -1 (first group is 1e-4 scale), sign neg, dscale 4
      bval(b) { v => v.putShort(1); v.putShort(-1); v.putShort(0x4000); v.putShort(4)
        v.putShort(420) }
      (0 until 6).foreach(_ => b.put('n'.toByte))
    }
    val Seq(line2) = dec.decode(negNum)
    assert(line2.contains(""""price":-0.0420"""), line2)

    // unsupported binary OID fails loudly, not silently wrong
    val relBad = relationMsg(71, "s", "bad", 'd', Seq(("id", 23, true), ("poly", 604, false)))
    dec.decode(relBad)
    val insBad = msg { b =>
      b.put('I'.toByte); b.putInt(71); b.put('N'.toByte)
      b.putShort(2); bval(b)(_.putInt(1)); bval(b)(_.putInt(0))
    }
    val e = intercept[IllegalArgumentException] { dec.decode(insBad) }
    assert(e.getMessage.contains("OID 604"), e.getMessage)
  }

  test("pgoutput v2: streamed transactions buffer per xid; abort drops a subtransaction; commit emits in order") {
    val dec = new PgOutputDecoder(startLsn = 0)
    val rel = relationMsg(55, "inventory", "customers", 'd', Seq(
      ("id", 23, true), ("email", 25, false)))
    assert(dec.decode(rel).isEmpty)

    def streamStart(xid: Int, first: Boolean) = msg { b =>
      b.put('S'.toByte); b.putInt(xid); b.put((if (first) 1 else 0).toByte)
    }
    val streamStop = msg(b => b.put('E'.toByte))
    // DML inside a stream block: xid prefix right after the type byte
    def insX(xid: Int, id: String, email: String) = msg { b =>
      b.put('I'.toByte); b.putInt(xid); b.putInt(55); b.put('N'.toByte)
      tup(b, Seq(Some(id), Some(email)))
    }
    val abortSub = msg { b => b.put('A'.toByte); b.putInt(99); b.putInt(100) }
    val streamCommit = msg { b =>
      b.put('c'.toByte); b.putInt(99); b.put(0.toByte)
      b.putLong(10L); b.putLong(11L); b.putLong(820454400000000L)
    }

    // block 1: toplevel change + subxact 100 change; subxact aborts;
    // block 2: another toplevel change; then stream commit
    assert(dec.decode(streamStart(99, first = true)).isEmpty)
    assert(dec.decode(insX(99, "1", "a@x.com")).isEmpty) // buffered, not emitted
    assert(dec.decode(insX(100, "2", "sub@x.com")).isEmpty)
    assert(dec.decode(streamStop).isEmpty)
    assert(dec.decode(abortSub).isEmpty)
    assert(dec.decode(streamStart(99, first = false)).isEmpty)
    assert(dec.decode(insX(99, "3", "c@x.com")).isEmpty)
    assert(dec.decode(streamStop).isEmpty)
    val lines = dec.decode(streamCommit)
    // the aborted subtransaction's row is GONE; order preserved; the
    // commit timestamp stamps every replayed envelope
    assert(lines.size == 2, lines.mkString("\n"))
    assert(lines(0).contains(""""key":{"id":1}""") && lines(1).contains(""""key":{"id":3}"""))
    assert(lines.forall(_.contains(s""""ts_ms":${820454400000L + 946684800000L}""")))
    assert(dec.currentLsn == 2)

    // a NON-streamed transaction decodes unchanged after streaming
    val plain = msg { b =>
      b.put('I'.toByte); b.putInt(55); b.put('N'.toByte)
      tup(b, Seq(Some("9"), Some("plain@x.com")))
    }
    assert(dec.decode(plain).size == 1)

    // toplevel abort drops everything buffered under the xid
    assert(dec.decode(streamStart(77, first = true)).isEmpty)
    assert(dec.decode(insX(77, "4", "gone@x.com")).isEmpty)
    assert(dec.decode(streamStop).isEmpty)
    assert(dec.decode(msg { b => b.put('A'.toByte); b.putInt(77); b.putInt(77) }).isEmpty)
    val commit77 = msg { b =>
      b.put('c'.toByte); b.putInt(77); b.put(0.toByte)
      b.putLong(20L); b.putLong(21L); b.putLong(0L)
    }
    assert(dec.decode(commit77).isEmpty)
  }

  test("pgoutput: logical decoding messages land on <prefix>.message; transactional ones ride the stream buffer") {
    val dec = new PgOutputDecoder(startLsn = 0)
    def msgM(xid: Option[Int], transactional: Boolean, prefix: String, content: String) = msg { b =>
      b.put('M'.toByte); xid.foreach(b.putInt)
      b.put((if (transactional) 1 else 0).toByte)
      b.putLong(0x99L) // server byte LSN — positional bookkeeping only
      cstr(b, prefix)
      val by = content.getBytes(StandardCharsets.UTF_8)
      b.putInt(by.length); b.put(by)
    }

    // non-transactional: emits immediately
    val out = dec.decode(msgM(None, transactional = false, "audit", "hello"))
    assert(out.size == 1, out.mkString("\n"))
    val b64 = java.util.Base64.getEncoder.encodeToString("hello".getBytes(StandardCharsets.UTF_8))
    assert(out.head.contains(""""destination":"testc.message""""))
    assert(out.head.contains(""""op":"m"""") && out.head.contains(s""""content":"$b64""""))
    assert(out.head.contains(""""prefix":"audit""""))
    assert(dec.currentLsn == 1)

    // transactional inside a v2 stream: buffered; aborted stream never surfaces it
    assert(dec.decode(msg { b => b.put('S'.toByte); b.putInt(50); b.put(1.toByte) }).isEmpty)
    assert(dec.decode(msgM(Some(50), transactional = true, "audit", "rolled-back")).isEmpty)
    assert(dec.decode(msg(b => b.put('E'.toByte))).isEmpty)
    assert(dec.decode(msg { b => b.put('A'.toByte); b.putInt(50); b.putInt(50) }).isEmpty)
    assert(dec.currentLsn == 1) // nothing emitted

    // committed stream replays the message in order with the commit ts
    assert(dec.decode(msg { b => b.put('S'.toByte); b.putInt(60); b.put(1.toByte) }).isEmpty)
    assert(dec.decode(msgM(Some(60), transactional = true, "audit", "committed")).isEmpty)
    assert(dec.decode(msg(b => b.put('E'.toByte))).isEmpty)
    val committed = dec.decode(msg { b =>
      b.put('c'.toByte); b.putInt(60); b.put(0.toByte)
      b.putLong(10L); b.putLong(11L); b.putLong(820454400000000L)
    })
    assert(committed.size == 1)
    val b64c = java.util.Base64.getEncoder.encodeToString("committed".getBytes(StandardCharsets.UTF_8))
    assert(committed.head.contains(s""""content":"$b64c""""))
    assert(committed.head.contains(s""""ts_ms":${820454400000L + 946684800000L}"""))

    // the message stream reads back through the DSv2 source on its own layout
    val db = Files.createTempDirectory("graft-pgmsg")
    Files.createDirectories(db.resolve("snapshot"))
    Files.writeString(db.resolve("snapshot/_lsn"), "0")
    PgOutputDecoder.appendSegment(db, out ++ committed)
    val batch = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", "prefix STRING")
      .option("rowSchema", "prefix STRING, content STRING")
      .load()
    val rows = batch.select("value.op", "value.after.content").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("m", b64), ("m", b64c)))
  }

  test("pgoutput: null columns, toast sentinel, numeric/bool typing, unknown relation throws") {
    val dec = new PgOutputDecoder(startLsn = 0)
    // DML before its Relation message is a protocol error
    val orphan = msg { b =>
      b.put('I'.toByte); b.putInt(99); b.put('N'.toByte); tup(b, Seq(Some("1")))
    }
    intercept[IllegalStateException] { dec.decode(orphan) }

    val rel = relationMsg(7, "s", "t", 'd', Seq(
      ("id", 20, true), ("ok", 16, false), ("score", 701, false), ("note", 25, false)))
    assert(dec.decode(rel).isEmpty) // control message: registers, emits nothing
    val insNulls = msg { b =>
      b.put('I'.toByte); b.putInt(7); b.put('N'.toByte)
      b.putShort(4)
      b.put('t'.toByte); b.putInt(1); b.put("9".getBytes(StandardCharsets.UTF_8))
      b.put('t'.toByte); b.putInt(1); b.put("t".getBytes(StandardCharsets.UTF_8))
      b.put('n'.toByte)           // SQL NULL
      b.put('u'.toByte)           // unchanged TOAST
    }
    val Seq(line) = dec.decode(insNulls)
    assert(line.contains(""""after":{"id":9,"note":"__graft_unavailable_value","ok":true,"score":null}"""),
      s"typed tuple rendering: $line")
    assert(line.contains(""""key":{"id":9}"""))

    // a TRUNCATED frame fails with message context (not a raw buffer
    // underflow), emits nothing, and the decoder stays usable
    val whole = msg { b =>
      b.put('I'.toByte); b.putInt(7); b.put('N'.toByte)
      tup(b, Seq(Some("10"), Some("t"), Some("1.0"), Some("x")))
    }
    val e = intercept[IllegalArgumentException] {
      dec.decode(java.util.Arrays.copyOfRange(whole, 0, whole.length - 3))
    }
    assert(e.getMessage.contains("truncated 'I'"), e.getMessage)
    assert(dec.decode(whole).size == 1) // intact frame still decodes
  }

  test("pgoutput: fractional float4 renders identically from binary and text slots") {
    // 0.1f widened to double before rendering would print
    // 0.10000000149011612 while the text slot prints 0.1 — binary must
    // render FROM THE FLOAT so both slot modes yield identical envelopes
    val decB = new PgOutputDecoder(startLsn = 0)
    val decT = new PgOutputDecoder(startLsn = 0)
    val rel = relationMsg(80, "s", "f4", 'd', Seq(("id", 23, true), ("r", 700, false)))
    decB.decode(rel); decT.decode(rel)

    def binIns(id: Int, f: Float) = msg { b =>
      b.put('I'.toByte); b.putInt(80); b.put('N'.toByte)
      b.putShort(2)
      b.put('b'.toByte); b.putInt(4); b.putInt(id)
      b.put('b'.toByte); b.putInt(4); b.putInt(java.lang.Float.floatToIntBits(f))
    }
    def txtIns(id: Int, text: String) = msg { b =>
      b.put('I'.toByte); b.putInt(80); b.put('N'.toByte)
      tup(b, Seq(Some(id.toString), Some(text)))
    }
    // (value, PostgreSQL text rendering): fractional, integral, negative,
    // non-finite — every float4Text branch
    val cases = Seq(0.1f -> "0.1", 3f -> "3", -2.5f -> "-2.5",
      Float.NaN -> "NaN", Float.PositiveInfinity -> "Infinity")
    cases.zipWithIndex.foreach { case ((f, text), i) =>
      val Seq(bl) = decB.decode(binIns(i, f))
      val Seq(tl) = decT.decode(txtIns(i, text))
      assert(bl == tl, s"float4 $f: binary-slot line differs from text-slot line\n$bl\n$tl")
    }
  }

  test("pgoutput v2: streamed-change buffer is capped — fails fast naming the knob, never OOMs") {
    val dec = new PgOutputDecoder(startLsn = 0, maxStreamedChanges = 5)
    val rel = relationMsg(90, "s", "big", 'd', Seq(("id", 23, true)))
    assert(dec.decode(rel).isEmpty)
    assert(dec.decode(msg { b => b.put('S'.toByte); b.putInt(900); b.put(1.toByte) }).isEmpty)
    def insX(id: Int) = msg { b =>
      b.put('I'.toByte); b.putInt(900) // stream block: xid prefix
      b.putInt(90); b.put('N'.toByte); tup(b, Seq(Some(id.toString)))
    }
    (1 to 5).foreach(i => assert(dec.decode(insX(i)).isEmpty))
    val e = intercept[IllegalStateException] { dec.decode(insX(6)) }
    assert(e.getMessage.contains("maxStreamedChanges=5"), e.getMessage)
    assert(e.getMessage.contains("900"), e.getMessage)
    // an abort releases the budget: buffering works again afterwards
    assert(dec.decode(msg { b => b.put('E'.toByte) }).isEmpty)
    assert(dec.decode(msg { b => b.put('A'.toByte); b.putInt(900); b.putInt(900) }).isEmpty)
    assert(dec.decode(msg { b => b.put('S'.toByte); b.putInt(901); b.put(1.toByte) }).isEmpty)
    def insY(id: Int) = msg { b =>
      b.put('I'.toByte); b.putInt(901)
      b.putInt(90); b.put('N'.toByte); tup(b, Seq(Some(id.toString)))
    }
    (1 to 3).foreach(i => assert(dec.decode(insY(i)).isEmpty))
    assert(dec.decode(msg { b => b.put('E'.toByte) }).isEmpty)
    val commit = msg { b =>
      b.put('c'.toByte); b.putInt(901); b.put(0.toByte)
      b.putLong(1L); b.putLong(2L); b.putLong(820454400000000L)
    }
    assert(dec.decode(commit).size == 3) // capped buffer drains cleanly
  }
}
