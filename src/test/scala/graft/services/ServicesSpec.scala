package graft.services

import graft.SparkSpec
import graft.pipeline.{CdcPipeline, PipelineSpec}
import graft.sinks.KvSink
import org.apache.spark.sql.types._
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

class ServicesSpec extends SparkSpec {

  test("signals: REST endpoint appends to the channel; poll consumes; disabled by default") {
    val dir = Files.createTempDirectory("graft-signals")
    val channel = new Signals.Channel(dir)

    intercept[IllegalArgumentException](new Signals.Server(channel).start()) // gated off

    val server = new Signals.Server(channel, enabled = true)
    val port = server.start()
    try {
      val resp = HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:$port/api/signals"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"id":"sig-1","type":"ad-hoc-snapshot","data":"inventory.customers"}"""))
          .build(),
        HttpResponse.BodyHandlers.discarding())
      assert(resp.statusCode() == 202)
      val sigs = channel.poll()
      assert(sigs == Seq(Signals.Signal("sig-1", "ad-hoc-snapshot", "inventory.customers")))
      assert(channel.poll().isEmpty) // consumed
    } finally server.stop()
  }

  test("processSignals: stop signal stops the query, unknown types surface") {
    val dir = Files.createTempDirectory("graft-signals2")
    val channel = new Signals.Channel(dir)
    channel.send(Signals.Signal("1", "custom-thing", "payload"))
    val leftover = CdcPipeline.processSignals(spark, channel, Map.empty)
    assert(leftover.map(_.`type`) == Seq("custom-thing"))
  }

  test("execute-snapshot signal re-delivers the table's current rows exactly once") {
    val keySchema = StructType(Seq(StructField("id", IntegerType)))
    val rowSchema = StructType(Seq(StructField("id", IntegerType), StructField("v", StringType)))
    val logDir = Files.createTempDirectory("graft-adhoc")
    def line(id: Int, op: String, v: String, lsn: Long): String = {
      val row = s"""{"id":$id,"v":"$v"}"""
      val after = if (op == "d") "null" else row
      s"""{"destination":"testc.inventory.customers","key":{"id":$id},"value":{"op":"$op","before":null,"after":$after,"source":{"connector":"pg","db":"d","schema":"inventory","table":"customers","lsn":$lsn,"snapshot":"false","ts_ms":0},"ts_ms":0},"headers":{}}"""
    }
    // live state after the log: 1 (updated), 3 (created); 2 deleted
    Files.writeString(logDir.resolve("log.jsonl"), Seq(
      line(1, "c", "a1", 1), line(2, "c", "a2", 2),
      line(1, "u", "a1-new", 3), line(2, "d", "a2", 4), line(3, "c", "a3", 5)
    ).mkString("\n") + "\n")

    val sink = new KvSink
    val spec = PipelineSpec(sourcePath = logDir.toString,
      keySchema = keySchema, rowSchema = rowSchema, sink = sink)
    val dir = Files.createTempDirectory("graft-signals3")
    val channel = new Signals.Channel(dir)
    channel.send(Signals.Signal("snap-1", "execute-snapshot", "inventory.customers"))

    val leftover = CdcPipeline.processSignals(spark, channel, Map.empty, Some(spec))
    assert(leftover.isEmpty)
    // the sink received exactly the table's LIVE state as op='r'
    // incremental-snapshot envelopes: deleted key 2 is absent
    assert(sink.size("testc.inventory.customers") == 2)
    val v1 = sink.get("testc.inventory.customers", """{"id":1}""").get
    assert(v1.contains(""""op":"r"""") && v1.contains("a1-new")
      && v1.contains(""""snapshot":"incremental""""))
    assert(sink.get("testc.inventory.customers", """{"id":2}""").isEmpty)

    // the signal was consumed: a second processing pass delivers nothing
    assert(CdcPipeline.processSignals(spark, channel, Map.empty, Some(spec)).isEmpty)
    assert(sink.size("testc.inventory.customers") == 2)
  }

  test("schema history: control-stream DDL events append, survive restart, fold to latest") {
    val keySchema = StructType(Seq(StructField("id", IntegerType)))
    val rowSchema = StructType(Seq(StructField("id", IntegerType), StructField("v", StringType)))
    val schema = graft.model.Envelope.recordSchema(keySchema, rowSchema)
    import org.apache.spark.sql.Row
    def ddl(dest: String, lsn: Long, v: String) =
      Row(dest, Row(1), Row("c", null, Row(1, v),
        Row("pg", "d", "s", "t", lsn, "false", 0L), 0L), Map.empty[String, String])
    val batch = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      ddl("testc.s.t1.schema-changes", 1L, "CREATE-t1-v1"),
      ddl("testc.s.t2.schema-changes", 2L, "CREATE-t2-v1"),
      ddl("testc.s.t1.schema-changes", 3L, "ALTER-t1-v2"),
      ddl("testc.s.t1", 4L, "data-row-not-ddl"))), schema)

    val dir = Files.createTempDirectory("graft-schemahist")
    val hist = new SchemaHistory(dir)
    // only the control slice is recorded — the data slice flows to sinks
    val (_, ddlStream) = graft.operators.EventShaping.splitSchemaChanges(batch)
    hist.record(ddlStream)

    // a "restarted" pipeline replays from disk
    val recovered = new SchemaHistory(dir)
    assert(recovered.replay().map(_.lsn) == Seq(1L, 2L, 3L))
    val current = recovered.currentSchemas()
    assert(current.keySet == Set("testc.s.t1.schema-changes", "testc.s.t2.schema-changes"))
    assert(current("testc.s.t1.schema-changes").contains("ALTER-t1-v2"))
    // appends accumulate (append-only log, never rewritten)
    recovered.record(ddlStream.filter(
      org.apache.spark.sql.functions.col("value.source.lsn") === 1L))
    assert(new SchemaHistory(dir).replay().size == 4)

    // ORDERING: collect() returns partition order, not lsn order — two
    // DDLs for the same table deliberately placed in different
    // partitions in REVERSED lsn order must still append lsn-sorted,
    // or the latest-wins fold resurrects the stale schema
    val shuffled = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        ddl("testc.s.t9.schema-changes", 20L, "ALTER-t9-NEW"),
        ddl("testc.s.t9.schema-changes", 10L, "CREATE-t9-OLD")), numSlices = 2),
      schema)
    val dir2 = Files.createTempDirectory("graft-schemahist2")
    val hist2 = new SchemaHistory(dir2)
    hist2.record(graft.operators.EventShaping.splitSchemaChanges(shuffled)._2)
    assert(hist2.replay().map(_.lsn) == Seq(10L, 20L))
    assert(hist2.currentSchemas()("testc.s.t9.schema-changes").contains("ALTER-t9-NEW"))
  }

  test("pipeline observes lag + snapshot phase; sink close fires on termination") {
    val keySchema = StructType(Seq(StructField("id", IntegerType)))
    val rowSchema = StructType(Seq(StructField("id", IntegerType), StructField("v", StringType)))
    val logDir = Files.createTempDirectory("graft-obs")
    val nowMs = 1700000000000L
    def line(id: Int, lsn: Long, snapshot: String): String =
      s"""{"destination":"testc.s.t","key":{"id":$id},"value":{"op":"c","before":null,"after":{"id":$id,"v":"x"},"source":{"connector":"pg","db":"d","schema":"s","table":"t","lsn":$lsn,"snapshot":"$snapshot","ts_ms":${nowMs - 5000}},"ts_ms":${nowMs - 5000}},"headers":{}}"""
    Files.writeString(logDir.resolve("log.jsonl"),
      (1 to 3).map(i => line(i, i.toLong, if (i <= 2) "true" else "false")).mkString("\n") + "\n")

    val listener = new GraftMetricsListener(clock = () => nowMs)
    spark.streams.addListener(listener)
    @volatile var closed = false
    val inner = new KvSink
    val sink = new graft.sinks.SinkConnector {
      override def name: String = "kv-closing"
      override def write(batch: org.apache.spark.sql.DataFrame, epochId: Long): Unit =
        inner.write(batch, epochId)
      override def close(): Unit = closed = true
    }
    try {
      val spec = PipelineSpec(sourcePath = logDir.toString,
        keySchema = keySchema, rowSchema = rowSchema, sink = sink)
      val q = CdcPipeline.start(spark, spec)
      q.awaitTermination(60000)
      // lag = clock - max source ts_ms = 5000; snapshot rows were in the batch.
      // Listener dispatch is async — awaitTermination can return before the
      // progress event is processed, so poll like the close() check below.
      def captured = listener.snapshot.values.find(_.numInputRows == 3)
      var waitedM = 0
      while (captured.isEmpty && waitedM < 10000) { Thread.sleep(100); waitedM += 100 }
      val m = captured
      assert(m.isDefined, s"no progress captured: ${listener.snapshot}")
      assert(m.get.msBehindSource == 5000L)
      assert(m.get.snapshotRunning) // single batch contained snapshot rows
      // close hook ran after termination (listener dispatch is async)
      var waited = 0
      while (!closed && waited < 10000) { Thread.sleep(100); waited += 100 }
      assert(closed, "sink close() not invoked on query termination")
    } finally spark.streams.removeListener(listener)
  }
}
