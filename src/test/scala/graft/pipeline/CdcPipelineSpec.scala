package graft.pipeline

import graft.SparkSpec
import graft.sinks.{KvSink, ParquetUpsertSink, SinkRegistry}
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

  test("sink registry resolves by name and rejects unknowns") {
    val reg = new SinkRegistry(Seq(new KvSink))
    assert(reg.resolve("kv").name == "kv")
    val e = intercept[IllegalArgumentException](reg.resolve("nope"))
    assert(e.getMessage.contains("kv"))
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
