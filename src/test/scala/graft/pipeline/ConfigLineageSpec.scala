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

  test("config-only expression-routed pipeline: expr() router + predicate + filter") {
    import spark.implicits._
    // the scripting-SMT parity path: the entire chain — router
    // expression, gating predicate, filter condition — comes from
    // debezium.* config STRINGS (the reference's Groovy router/filter,
    // debezium-server-dist/pom.xml:389-393), parsed by Spark expr()
    val props = Map(
      "debezium.transforms" -> "rt,keep",
      "debezium.transforms.rt.type" -> "ContentBasedRouter",
      "debezium.transforms.rt.expression" -> "concat(destination, '.big')",
      "debezium.transforms.rt.predicate" -> "isbig",
      "debezium.transforms.keep.type" -> "Filter",
      "debezium.transforms.keep.condition" -> "amount >= 10",
      "debezium.predicates.isbig.expr" -> "amount > 100")
    val chain = graft.operators.SmtFactory.fromProperties(props)
    val df = Seq(("testc.t", 5L), ("testc.t", 50L), ("testc.t", 500L))
      .toDF("destination", "amount")
    val out = graft.operators.EventShaping.applyChain(df, chain)
      .orderBy("amount").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // amount 5 filtered out; 50 keeps its destination; 500 routed
    assert(out == Seq(("testc.t", 50L), ("testc.t.big", 500L)))
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

  test("partition routing strategies: key hash variants, explicit id, range check") {
    import spark.implicits._
    import graft.functions.Portable
    val df = Seq(("k1", 2), ("k2", 7)).toDF("k", "pid")
    val r = df.select(
      Routing.partitionRouting(Routing.KeyRouting("md5"), col("k"), 8).as("md5p"),
      Routing.partitionRouting(Routing.KeyRouting("sha256"), col("k"), 8).as("shap"),
      Routing.partitionRouting(Routing.PartitionIdRouting(col("pid")), col("k"), 8).as("explicit"),
      Routing.partitionRouting(Routing.DefaultRouting, col("k"), 8).as("default"))
      .collect()
    assert(r.forall(row => (0 until 4).forall(i => row.getLong(i) >= 0 && row.getLong(i) < 8)))
    assert(r.map(_.getLong(2)).toSeq == Seq(2L, 7L)) // explicit ids pass through
    // out-of-range explicit id fails the task
    intercept[Exception] {
      Seq(("k", 9)).toDF("k", "pid")
        .select(Routing.partitionRouting(Routing.PartitionIdRouting(col("pid")), col("k"), 8))
        .collect()
    }
    // digest variants are all deterministic and (generally) distinct routings
    val h = Seq("x").toDF("k").select(
      Portable.hash64(col("k"), "md5").as("a"),
      Portable.hash64(col("k"), "sha1").as("b"),
      Portable.hash64(col("k"), "sha256").as("c"),
      Portable.hash64(col("k"), "java").as("d")).head()
    assert(Set(h.getLong(0), h.getLong(1), h.getLong(2), h.getLong(3)).size == 4)
    intercept[IllegalArgumentException](Portable.hash64(col("k"), "crc32"))
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
