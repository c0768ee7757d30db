package graft.pipeline

import graft.SparkSpec
import graft.services.LineageListener
import graft.operators.Routing
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ConfigLineageSpec extends SparkSpec {

  test("env vars normalize to debezium.* properties; sentinel decodes; explicit wins") {
    val props = PipelineConfig.fromEnvironment(
      env = Map(
        "DEBEZIUM_SINK_TYPE" -> "kv",
        "DEBEZIUM_SOURCE_TABLE_INCLUDE_LIST" -> "inventory.customers",
        "DEBEZIUM_FORMAT_VALUE" -> "__DBZ_EMPTY__",
        "PATH" -> "/usr/bin"), // non-debezium env ignored
      explicit = Map("debezium.sink.type" -> "http"))
    assert(props("debezium.sink.type") == "http") // explicit wins
    assert(props("debezium.source.table.include.list") == "inventory.customers")
    assert(props("debezium.format.value") == "") // sentinel decoded
    assert(!props.contains("path"))
  }

  test("sink config mirrors into offset-storage namespace when the sink backs it") {
    val props = PipelineConfig.reuseSinkConfig(Map(
      "debezium.sink.type" -> "redis",
      "debezium.sink.redis.address" -> "localhost:6379",
      "debezium.sink.redis.password" -> "s3cret",
      "debezium.source.offset.storage" -> "io.debezium.storage.redis.offset.RedisOffsetBackingStore"))
    assert(props("debezium.source.offset.storage.redis.address") == "localhost:6379")
    assert(props("debezium.source.offset.storage.redis.password") == "s3cret")
    // no schema-history declaration → no mirror there
    assert(!props.keys.exists(_.startsWith("debezium.source.schema.history.internal.redis.")))
  }

  test("routing helpers compute exchange/subject/queue") {
    import spark.implicits._
    val df = Seq(("testc.inventory.customers", 42L)).toDF("destination", "k")
    val r = df.select(
      Routing.rabbitExchange(None).as("ex"),
      Routing.rabbitExchange(Some("cdc-exchange")).as("ex_static"),
      Routing.rabbitRoutingKey(None).as("rk"),
      Routing.natsSubject.as("subj"),
      Routing.queueFor(col("k"), 8).as("q")).head()
    assert(r.getString(0) == "testc.inventory.customers")
    assert(r.getString(1) == "cdc-exchange")
    assert(r.getString(2) == "testc.inventory.customers")
    assert(r.getString(3) == "testc.inventory.customers")
    assert(r.getLong(4) >= 0 && r.getLong(4) < 8)
  }

  test("lineage listener spools START/RUNNING/COMPLETE events with datasets") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-lineage")
    val listener = new LineageListener(dir, clock = () => 1700000000000L)
    spark.streams.addListener(listener)
    try {
      val input = MemoryStream[Int]
      val q = input.toDF().writeStream.format("noop").start()
      input.addData(1, 2, 3)
      q.processAllAvailable()
      q.stop()
      q.awaitTermination(30000)
      var waited = 0
      def content() = {
        val f = dir.resolve("lineage.jsonl")
        if (Files.exists(f)) Files.readString(f) else ""
      }
      while (!content().contains("COMPLETE") && waited < 10000) { Thread.sleep(100); waited += 100 }
      val lines = content().linesIterator.toSeq
      assert(lines.exists(_.contains(""""eventType":"START"""")))
      assert(lines.exists(l => l.contains(""""eventType":"RUNNING"""") && l.contains("MemoryStream")))
      assert(lines.exists(_.contains(""""eventType":"COMPLETE"""")))
    } finally spark.streams.removeListener(listener)
  }
}
