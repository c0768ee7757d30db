package graft.pipeline

import graft.SparkSpec
import graft.sinks.{EnvelopeLogSink, KvSink, ParquetUpsertSink, SinkRegistry}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** End-to-end replay of the reference's golden scenario
  * (FIXTURES.md §1 / DebeziumServerPostgresIT.java:72-75,92-96):
  * 4 snapshot rows + 1 streamed insert, then update + delete CRUD
  * (MilvusIT.java:124,145), into upsert and KV sinks.
  */
class CdcPipelineSpec extends SparkSpec {

  private val keySchema = StructType(Seq(StructField("id", IntegerType)))
  private val rowSchema = StructType(Seq(
    StructField("id", IntegerType), StructField("first_name", StringType),
    StructField("last_name", StringType), StructField("email", StringType)))

  private def envelopeLine(id: Int, op: String, fn: String, ln: String, em: String,
                           lsn: Long, dest: String = "testc.inventory.customers"): String = {
    val row = s"""{"id":$id,"first_name":"$fn","last_name":"$ln","email":"$em"}"""
    val before = if (op == "d") row else "null"
    val after = if (op == "d") "null" else row
    s"""{"destination":"$dest","key":{"id":$id},"value":{"op":"$op","before":$before,"after":$after,"source":{"connector":"postgresql","db":"db","schema":"inventory","table":"customers","lsn":$lsn,"snapshot":"false","ts_ms":0},"ts_ms":0},"headers":{}}"""
  }

  private def writeLog(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-cdclog")
    Files.writeString(dir.resolve("log-000.jsonl"), lines.mkString("\n") + "\n")
    dir.toString
  }

  private val goldenLog = Seq(
    envelopeLine(1001, "r", "Sally", "Thomas", "sally.thomas@acme.com", 1),
    envelopeLine(1002, "r", "George", "Bailey", "gbailey@foobar.com", 2),
    envelopeLine(1003, "r", "Edward", "Walker", "ed@walker.com", 3),
    envelopeLine(1004, "r", "Anne", "Kretchmar", "annek@noanswer.org", 4),
    envelopeLine(1005, "c", "Jon", "Snow", "jon_snow@gameofthrones.com", 5),
    // CRUD tail: update 1002, delete 1003
    envelopeLine(1002, "u", "George", "Bailey", "george.bailey@example.com", 6),
    envelopeLine(1003, "d", "Edward", "Walker", "ed@walker.com", 7),
    // a record for a non-included table + a heartbeat
    envelopeLine(9, "c", "x", "y", "z", 8, dest = "testc.other.t"),
    """{"destination":"__debezium-heartbeat.testc","key":null,"value":null,"headers":{}}""")

  test("batch replay into parquet upsert sink yields the golden final state") {
    val out = Files.createTempDirectory("graft-upsert").toString
    val sink = new ParquetUpsertSink(out, keyFields = Seq("id"))
    val spec = PipelineSpec(
      sourcePath = writeLog(goldenLog),
      keySchema = keySchema, rowSchema = rowSchema, sink = sink,
      tableIncludeList = Seq("inventory.customers"))
    CdcPipeline.runBatch(spark, spec)

    val state = sink.readTable(spark, "testc.inventory.customers")
      .orderBy("id").collect()
    assert(state.map(_.getAs[Int]("id")).toSeq == Seq(1001, 1002, 1004, 1005))
    assert(state.find(_.getAs[Int]("id") == 1002).get.getAs[String]("email")
      == "george.bailey@example.com")
    assert(state.find(_.getAs[Int]("id") == 1005).get.getAs[String]("first_name") == "Jon")
  }

  test("CDC-delivered table feeds the LLM curation operators directly (end-to-end glue)") {
    def doc(id: Long, op: String, text: String, lsn: Long): String = {
      val row = s"""{"doc_id":$id,"text":"$text"}"""
      val before = if (op == "d") row else "null"
      val after = if (op == "d") "null" else row
      s"""{"destination":"testc.corpus.documents","key":{"doc_id":$id},""" +
        s""""value":{"op":"$op","before":$before,"after":$after,""" +
        s""""source":{"connector":"postgresql","db":"db","schema":"corpus","table":"documents",""" +
        s""""lsn":$lsn,"snapshot":"false","ts_ms":0},"ts_ms":0},"headers":{}}"""
    }
    val log = Seq(
      doc(1, "r", "The quick brown fox", 1),
      doc(2, "c", "the QUICK brown fox!!", 2), // normalized dup of 1
      doc(3, "c", "something else entirely", 3),
      doc(3, "u", "something else entirely v2", 4),
      doc(4, "c", "to be deleted", 5),
      doc(4, "d", "to be deleted", 6))
    val out = Files.createTempDirectory("graft-upsert-docs").toString
    val sink = new ParquetUpsertSink(out, keyFields = Seq("doc_id"))
    val ks = StructType(Seq(StructField("doc_id", LongType)))
    val rs = StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType)))
    CdcPipeline.runBatch(spark, PipelineSpec(writeLog(log),
      keySchema = ks, rowSchema = rs, sink = sink,
      tableIncludeList = Seq("corpus.documents")))
    // the delivered latest state (1, 2, 3-v2; 4 hard-deleted) is a plain
    // DataFrame — the curation operators run on it unchanged
    val docsDf = sink.readTable(spark, "testc.corpus.documents")
    assert(docsDf.count() == 3)
    val dedup = graft.llm.Dedup.normalizedExact(docsDf, col("text"), col("doc_id"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted
    assert(dedup.toSeq == Seq((1L, 2L), (3L, 1L))) // 1 and 2 collapse; v2 text survives
    val funnel = graft.llm.Curation.filterFunnel(docsDf,
      Seq("min2" -> (graft.llm.TextAnalysis.tokenCount(col("text")) >= 2))).head()
    assert(funnel.getAs[Long]("n_docs") == 3L && funnel.getAs[Long]("survive_min2") == 3L)
  }

  test("streaming replay with checkpoint reaches the same state and is idempotent") {
    val out = Files.createTempDirectory("graft-upsert-s").toString
    val sink = new ParquetUpsertSink(out, keyFields = Seq("id"))
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val logDir = writeLog(goldenLog)
    val spec = PipelineSpec(
      sourcePath = logDir, keySchema = keySchema, rowSchema = rowSchema,
      sink = sink, tableIncludeList = Seq("inventory.customers"),
      checkpointDir = Some(ckpt))

    val q = CdcPipeline.start(spark, spec)
    q.awaitTermination(60000)
    val ids = sink.readTable(spark, "testc.inventory.customers")
      .orderBy("id").collect().map(_.getAs[Int]("id")).toSeq
    assert(ids == Seq(1001, 1002, 1004, 1005))

    // restart on the same checkpoint: no new data → no change
    val q2 = CdcPipeline.start(spark, spec)
    q2.awaitTermination(60000)
    val ids2 = sink.readTable(spark, "testc.inventory.customers")
      .orderBy("id").collect().map(_.getAs[Int]("id")).toSeq
    assert(ids2 == ids)
  }

  test("kv sink honors tombstones and delete envelopes stay as values") {
    val sink = new KvSink
    val log = Seq(
      envelopeLine(1, "c", "A", "B", "a@b", 1),
      envelopeLine(2, "c", "C", "D", "c@d", 2),
      // tombstone for id 1 → removed from the store
      """{"destination":"testc.inventory.customers","key":{"id":1},"value":null,"headers":{}}""")
    val spec = PipelineSpec(sourcePath = writeLog(log),
      keySchema = keySchema, rowSchema = rowSchema, sink = sink)
    CdcPipeline.runBatch(spark, spec)
    assert(sink.size("testc.inventory.customers") == 1)
    assert(sink.get("testc.inventory.customers", """{"id":2}""").isDefined)
    assert(sink.get("testc.inventory.customers", """{"id":1}""").isEmpty)
  }

  test("pipeline boots from a provider-resolved spec; the secret never reaches the printable view") {
    val sink = new KvSink
    val logDir = writeLog(goldenLog)
    // the secrets file carries the LOAD-BEARING value (the source
    // path): if provider resolution didn't happen, the boot fails on a
    // literal `${file:…}` path — resolution is proven by the pipeline
    // actually running, not by inspecting strings
    val secretsDir = Files.createTempDirectory("graft-boot-secrets")
    val secrets = secretsDir.resolve("pipeline.properties")
    Files.writeString(secrets, s"path=$logDir\npassword=kv-secret-pw\n")
    val explicit = Map(
      "debezium.source.config.providers" -> "file",
      "debezium.source.config.providers.file.class" ->
        "org.apache.kafka.common.config.provider.FileConfigProvider",
      "debezium.sink.type" -> "kv",
      "debezium.sink.kv.password" -> ("${file:" + secrets + ":password}"),
      "debezium.source.path" -> ("${file:" + secrets + ":path}"),
      "debezium.source.table.include.list" -> "inventory.customers")
    val r = PipelineConfig.load(env = Map.empty, explicit = explicit)
    val spec = PipelineSpec.fromResolved(r, keySchema, rowSchema,
      new SinkRegistry(Seq(sink)))
    CdcPipeline.runBatch(spark, spec)
    // golden final state flowed through the RESOLVED source path (the
    // KV sink keeps delete ENVELOPES as values — only tombstones
    // remove — so all five keyed records land, non-included excluded)
    assert(sink.size("testc.inventory.customers") == 5)
    assert(sink.get("testc.inventory.customers", """{"id":1005}""").isDefined)
    assert(sink.size("testc.other.t") == 0) // include list applied
    // the printable view masks every provider-resolved value and the
    // secrets appear nowhere in it
    assert(r.masked("debezium.source.path") == PipelineConfig.SecretMask)
    assert(r.masked("debezium.sink.kv.password") == PipelineConfig.SecretMask)
    assert(!r.masked.values.exists(v => v.contains("kv-secret-pw") || v.contains(logDir)))
    // WITHOUT the provider pass the same property map cannot boot —
    // the placeholder is not a path
    intercept[Exception] {
      CdcPipeline.runBatch(spark, PipelineSpec.fromProperties(
        explicit, keySchema, rowSchema, new SinkRegistry(Seq(new KvSink))))
    }
  }

  test("sink registry resolves by name and rejects unknowns") {
    val reg = new SinkRegistry(Seq(new KvSink))
    assert(reg.resolve("kv").name == "kv")
    val e = intercept[IllegalArgumentException](reg.resolve("nope"))
    assert(e.getMessage.contains("kv"))
  }

  test("config-driven SMT chain: unwrap + predicated router + filter from properties") {
    val props = Map(
      "debezium.transforms" -> "rt,flt",
      "debezium.transforms.rt.type" -> "ContentBasedRouter",
      "debezium.transforms.rt.expression" -> "concat(destination, '.routed')",
      "debezium.transforms.rt.predicate" -> "isc",
      "debezium.predicates.isc.expr" -> "value.op = 'c'",
      "debezium.transforms.flt.type" -> "Filter",
      "debezium.transforms.flt.condition" -> "key.id < 1004")
    val chain = graft.operators.SmtFactory.fromProperties(props)
    assert(chain.map(_.name) == Seq("rt", "flt"))
    val schema = graft.model.Envelope.recordSchema(keySchema, rowSchema)
    val rows = Seq(
      org.apache.spark.sql.Row("t.a", org.apache.spark.sql.Row(1001),
        org.apache.spark.sql.Row("c", null, org.apache.spark.sql.Row(1001, "a", "b", "c"),
          org.apache.spark.sql.Row("pg", "d", "s", "t", 1L, "false", 0L), 0L), Map.empty[String, String]),
      org.apache.spark.sql.Row("t.a", org.apache.spark.sql.Row(1002),
        org.apache.spark.sql.Row("u", null, org.apache.spark.sql.Row(1002, "a", "b", "c"),
          org.apache.spark.sql.Row("pg", "d", "s", "t", 2L, "false", 0L), 0L), Map.empty[String, String]),
      org.apache.spark.sql.Row("t.a", org.apache.spark.sql.Row(1005),
        org.apache.spark.sql.Row("c", null, org.apache.spark.sql.Row(1005, "a", "b", "c"),
          org.apache.spark.sql.Row("pg", "d", "s", "t", 3L, "false", 0L), 0L), Map.empty[String, String]))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val out = graft.operators.EventShaping.applyChain(df, chain)
    val dests = out.select("destination", "key.id").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    // 1001: create → routed; 1002: update → unrouted; 1005: filtered out
    assert(dests == Set(("t.a.routed", 1001), ("t.a", 1002)))

    intercept[IllegalArgumentException] {
      graft.operators.SmtFactory.fromProperties(Map(
        "debezium.transforms" -> "x", "debezium.transforms.x.type" -> "Exotic"))
    }
  }

  test("upstream SMT staples from config: mask, replace, value-to-key, header-to-value, insert") {
    import org.apache.spark.sql.Row
    val props = Map(
      "debezium.transforms" -> "mask,v2k,h2v,ins,repl",
      "debezium.transforms.mask.type" -> "MaskField",
      "debezium.transforms.mask.fields" -> "email",
      "debezium.transforms.mask.replacement" -> "***",
      "debezium.transforms.v2k.type" -> "ValueToKey",
      "debezium.transforms.v2k.fields" -> "email",
      "debezium.transforms.h2v.type" -> "HeaderToValue",
      "debezium.transforms.h2v.headers" -> "tenant",
      "debezium.transforms.h2v.fields" -> "last_name",
      "debezium.transforms.ins.type" -> "InsertField",
      "debezium.transforms.ins.static.field" -> "first_name",
      "debezium.transforms.ins.static.value" -> "redacted",
      "debezium.transforms.repl.type" -> "ReplaceField",
      "debezium.transforms.repl.exclude" -> "id")
    val chain = graft.operators.SmtFactory.fromProperties(props)
    val schema = graft.model.Envelope.recordSchema(keySchema, rowSchema)
    val rows = Seq(Row("t.a", Row(7),
      Row("c", null, Row(7, "Ann", "K", "ann@x.com"),
        Row("pg", "d", "s", "t", 1L, "false", 0L), 0L),
      Map("tenant" -> "acme")))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val out = graft.operators.EventShaping.applyChain(df, chain).head()
    val value = out.getAs[Row]("value")
    val after = value.getAs[Row]("after")
    // MaskField ran BEFORE ValueToKey in chain order → key gets the mask
    assert(out.getAs[Row]("key").getAs[String]("email") == "***")
    assert(after.getAs[String]("email") == "***")          // masked
    assert(after.getAs[String]("last_name") == "acme")     // header copied
    assert(after.getAs[String]("first_name") == "redacted") // inserted
    assert(!after.schema.fieldNames.contains("id"))         // dropped
  }

  test("reference-matrix SMTs: insert-header, header-from, regex router, partition routing, hoist") {
    import org.apache.spark.sql.Row
    val props = Map(
      "debezium.transforms" -> "ih,hf,rr,pr",
      // the RocketMq test profile's pair (RocketMqTestConfigSource.java:29-35)
      "debezium.transforms.ih.type" -> "org.apache.kafka.connect.transforms.InsertHeader",
      "debezium.transforms.ih.header" -> "headerKey",
      "debezium.transforms.ih.value.literal" -> "headerValue",
      "debezium.transforms.rr.type" -> "io.debezium.transforms.ByLogicalTableRouter",
      "debezium.transforms.rr.topic.regex" -> "t\\.(.*)",
      "debezium.transforms.rr.topic.replacement" -> "all.$1",
      // the InstructLab profile's value→header copies
      "debezium.transforms.hf.type" -> "org.apache.kafka.connect.transforms.HeaderFrom$Value",
      "debezium.transforms.hf.fields" -> "email",
      "debezium.transforms.hf.headers" -> "question",
      "debezium.transforms.hf.operation" -> "copy",
      // the EventHubs partition-router profile
      "debezium.transforms.pr.type" -> "io.debezium.transforms.partitions.PartitionRouting",
      "debezium.transforms.pr.partition.payload.fields" -> "source.db",
      "debezium.transforms.pr.partition.topic.num" -> "5")
    val chain = graft.operators.SmtFactory.fromProperties(props)
    val schema = graft.model.Envelope.recordSchema(keySchema, rowSchema)
    val rows = Seq(Row("t.a", Row(7),
      Row("c", null, Row(7, "Ann", "K", "ann@x.com"),
        Row("pg", "d", "s", "t", 1L, "false", 0L), 0L),
      Map("question" -> "stale")))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val out = graft.operators.EventShaping.applyChain(df, chain).head()
    val hdrs = out.getAs[Map[String, String]]("headers")
    assert(hdrs("headerKey") == "headerValue")              // inserted
    assert(hdrs("question") == "ann@x.com")                 // copied, last-wins
    assert(out.getAs[String]("destination") == "all.a")     // regex-routed
    val part = out.getAs[Int]("partition")
    assert(part >= 0 && part < 5)
    // HoistField wraps the whole value under one field
    val hoisted = graft.operators.EventShaping.applyChain(df,
      graft.operators.SmtFactory.fromProperties(Map(
        "debezium.transforms" -> "h",
        "debezium.transforms.h.type" -> "org.apache.kafka.connect.transforms.HoistField$Value",
        "debezium.transforms.h.field" -> "line"))).head()
    assert(hoisted.getAs[Row]("value").schema.fieldNames.toSeq == Seq("line"))
    // TopicNameMatches predicate gates by anchored destination regex
    val gated = graft.operators.SmtFactory.fromProperties(Map(
      "debezium.transforms" -> "rt",
      "debezium.transforms.rt.type" -> "ContentBasedRouter",
      "debezium.transforms.rt.expression" -> "concat(destination, '.x')",
      "debezium.transforms.rt.predicate" -> "tm",
      "debezium.predicates.tm.type" ->
        "org.apache.kafka.connect.transforms.predicates.TopicNameMatches",
      "debezium.predicates.tm.pattern" -> "t\\..*"))
    val outs = graft.operators.EventShaping.applyChain(df, gated)
      .select("destination").head().getString(0)
    assert(outs == "t.a.x")
  }

  test("TimezoneConverter re-renders zoned-timestamp strings at the same instant, DST-correct") {
    import org.apache.spark.sql.Row
    val chain = graft.operators.SmtFactory.fromProperties(Map(
      "debezium.transforms" -> "tzc",
      "debezium.transforms.tzc.type" -> "io.debezium.transforms.TimezoneConverter",
      "debezium.transforms.tzc.converted.timezone" -> "America/New_York",
      "debezium.transforms.tzc.include.fields" -> "email")) // reuse the string field
    val schema = graft.model.Envelope.recordSchema(keySchema, rowSchema)
    def rec(ts: String) = Row("t.a", Row(1),
      Row("c", null, Row(1, "A", "B", ts),
        Row("pg", "d", "s", "t", 1L, "false", 0L), 0L),
      Map.empty[String, String])
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      rec("2024-01-15T12:00:00Z"),   // EST: UTC-5
      rec("2024-07-15T12:00:00Z"))), // EDT: UTC-4 (DST)
      schema)
    val out = graft.operators.EventShaping.applyChain(df, chain)
      .select("value.after.email").collect().map(_.getString(0)).sorted.toSeq
    assert(out == Seq("2024-01-15T07:00:00-05:00", "2024-07-15T08:00:00-04:00"))
  }

  test("pipeline reads through the graft-cdc source when configured") {
    import java.nio.file.Files
    val db = Files.createTempDirectory("graft-cdcdb-pipe")
    val snap = Files.createDirectories(db.resolve("snapshot"))
    Files.writeString(snap.resolve("_lsn"), "2")
    Files.writeString(snap.resolve("inventory.customers.jsonl"),
      """{"id":1,"first_name":"A","last_name":"B","email":"a@b"}""" + "\n" +
      """{"id":2,"first_name":"C","last_name":"D","email":"c@d"}""" + "\n")
    Files.createDirectories(db.resolve("wal"))
    Files.writeString(db.resolve("wal").resolve("wal-0.jsonl"),
      envelopeLine(3, "c", "E", "F", "e@f", 3) + "\n")

    val out = Files.createTempDirectory("graft-cdc-pipe-sink").toString
    val sink = new ParquetUpsertSink(out, keyFields = Seq("id"))
    val reg = new SinkRegistry(Seq(sink))
    val spec = PipelineSpec.fromProperties(Map(
      "debezium.sink.type" -> "parquet-upsert",
      "debezium.source.type" -> "graft-cdc",
      "debezium.source.path" -> db.toString,
      "debezium.source.table.include.list" -> "inventory.customers"),
      keySchema, rowSchema, reg)
    CdcPipeline.runBatch(spark, spec)
    val ids = sink.readTable(spark, "testc.inventory.customers")
      .orderBy("id").collect().map(_.getAs[Int]("id")).toSeq
    assert(ids == Seq(1, 2, 3)) // 2 snapshot rows + 1 wal insert
  }

  test("envelope-log sink round-trips: captured log replays to the same state") {
    val logOut = Files.createTempDirectory("graft-logsink").toString
    val logSink = new EnvelopeLogSink(logOut)
    val spec1 = PipelineSpec(sourcePath = writeLog(goldenLog),
      keySchema = keySchema, rowSchema = rowSchema, sink = logSink,
      tableIncludeList = Seq("inventory.customers"))
    CdcPipeline.runBatch(spark, spec1)

    // replay the captured log into an upsert sink → golden final state
    val out = Files.createTempDirectory("graft-logsink-upsert").toString
    val upsert = new ParquetUpsertSink(out, keyFields = Seq("id"))
    val spec2 = PipelineSpec(sourcePath = s"$logOut/epoch=0",
      keySchema = keySchema, rowSchema = rowSchema, sink = upsert)
    CdcPipeline.runBatch(spark, spec2)
    val ids = upsert.readTable(spark, "testc.inventory.customers")
      .orderBy("id").collect().map(_.getAs[Int]("id")).toSeq
    assert(ids == Seq(1001, 1002, 1004, 1005))
  }

  test("schema-change events split onto the control stream") {
    val log = Seq(
      envelopeLine(1, "c", "A", "B", "a@b", 1),
      envelopeLine(0, "c", "ddl", "ddl", "-", 2, dest = "testc.inventory.customers.schema-changes"))
    val records = graft.sources.EnvelopeLogSource.read(spark, writeLog(log), keySchema, rowSchema)
    val (data, ddl) = graft.operators.EventShaping.splitSchemaChanges(records)
    assert(data.count() == 1 && ddl.count() == 1)
    assert(ddl.head().getAs[String]("destination").endsWith(".schema-changes"))
  }

  test("spec fromProperties mirrors debezium.* config") {
    val reg = new SinkRegistry(Seq(new KvSink))
    val spec = PipelineSpec.fromProperties(Map(
      "debezium.sink.type" -> "kv",
      "debezium.source.path" -> "/tmp/x",
      "debezium.source.table.include.list" -> "inventory.customers, inventory.orders"),
      keySchema, rowSchema, reg)
    assert(spec.sink.name == "kv")
    assert(spec.tableIncludeList == Seq("inventory.customers", "inventory.orders"))
    intercept[IllegalArgumentException] {
      PipelineSpec.fromProperties(Map("debezium.source.path" -> "x"), keySchema, rowSchema, reg)
    }
  }
}
