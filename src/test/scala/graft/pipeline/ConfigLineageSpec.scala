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

  test("config.providers: ${file:path:key} resolves a live secrets file like the reference IT") {
    // the exact shape of DebeziumServerFileConfigProviderProfile:
    // a properties secrets file, the provider declaration + class key,
    // and the Quarkus-profile `$\$` guard wrapping the placeholder
    val dir = Files.createTempDirectory("graft-secrets")
    val secretFile = dir.resolve("secrets_test.txt")
    Files.writeString(secretFile, "user=postgres\npassword=Sup3r!Secret=x\n")
    val r = PipelineConfig.resolveProviders(Map(
      "debezium.source.config.providers" -> "file",
      "debezium.source.config.providers.file.class" ->
        "org.apache.kafka.common.config.provider.FileConfigProvider",
      "debezium.source.database.user" -> ("$\\$${file:" + secretFile + ":user}"),
      "debezium.source.database.password" -> ("${file:" + secretFile + ":password}"),
      "debezium.sink.type" -> "http"))
    assert(r.props("debezium.source.database.user") == "postgres") // byte-for-byte
    // '=' inside the secret survives (Properties splits on the FIRST =)
    assert(r.props("debezium.source.database.password") == "Sup3r!Secret=x")
    assert(r.props("debezium.sink.type") == "http") // untouched values pass through
    // the masked view is what lineage/logs may print: secrets never appear
    assert(r.masked("debezium.source.database.user") == PipelineConfig.SecretMask)
    assert(r.masked("debezium.source.database.password") == PipelineConfig.SecretMask)
    assert(r.masked("debezium.sink.type") == "http")
    assert(!r.masked.values.exists(v => v.contains("postgres") || v.contains("Sup3r")))
  }

  test("config.providers: wrong path and missing key fail loudly; undeclared providers pass through") {
    val dir = Files.createTempDirectory("graft-secrets2")
    Files.writeString(dir.resolve("s.properties"), "k=v\n")
    val base = Map(
      "debezium.source.config.providers" -> "file",
      "debezium.source.config.providers.file.class" ->
        "org.apache.kafka.common.config.provider.FileConfigProvider")
    val badPath = intercept[IllegalArgumentException] {
      PipelineConfig.resolveProviders(base +
        ("debezium.source.database.user" -> ("${file:" + dir + "/nope.properties:user}")))
    }
    assert(badPath.getMessage.contains("nope.properties"))
    val badKey = intercept[IllegalArgumentException] {
      PipelineConfig.resolveProviders(base +
        ("debezium.source.database.user" -> ("${file:" + dir + "/s.properties:user}")))
    }
    assert(badKey.getMessage.contains("'user'"))
    // an undeclared provider's placeholder is someone else's syntax —
    // Kafka leaves it untouched and so do we, INCLUDING a Quarkus
    // guard wrapping it (the guard is consumed only on resolution)
    val r = PipelineConfig.resolveProviders(base +
      ("debezium.source.custom" -> "${vault:pki/issue:cert}") +
      ("debezium.source.custom2" -> "$\\$${vault:pki/issue:cert}"))
    assert(r.props("debezium.source.custom") == "${vault:pki/issue:cert}")
    assert(r.masked("debezium.source.custom") == "${vault:pki/issue:cert}")
    assert(r.props("debezium.source.custom2") == "$\\$${vault:pki/issue:cert}")
    // no providers declared at all → identity (zero-cost fast path)
    val plain = Map("debezium.source.database.user" -> "${file:/x:user}")
    assert(PipelineConfig.resolveProviders(plain).props == plain)
    // a DECLARED but unsupported class fails loudly
    intercept[IllegalArgumentException] {
      PipelineConfig.resolveProviders(Map(
        "debezium.source.config.providers" -> "w",
        "debezium.source.config.providers.w.class" -> "com.example.WeirdProvider",
        "debezium.source.x" -> "${w:a:b}"))
    }
  }

  test("config.providers: env + directory providers; class key defaults from the name") {
    val dir = Files.createTempDirectory("graft-secrets3")
    Files.writeString(dir.resolve("api_token"), "tok-123")
    val r = PipelineConfig.resolveProviders(
      props = Map(
        "debezium.source.config.providers" -> "env, directory",
        // no .class keys: short names bind their upstream semantics
        "debezium.sink.http.jwt" -> "${env:GRAFT_TEST_JWT}",
        "debezium.sink.http.token" -> ("${directory:" + dir + ":api_token}"),
        // composite value: prefix/suffix around the placeholder survive
        "debezium.sink.http.auth" -> "Bearer ${env:GRAFT_TEST_JWT}/v1"),
      env = Map("GRAFT_TEST_JWT" -> "jwt-abc"))
    assert(r.props("debezium.sink.http.jwt") == "jwt-abc")
    assert(r.props("debezium.sink.http.token") == "tok-123")
    assert(r.props("debezium.sink.http.auth") == "Bearer jwt-abc/v1")
    assert(r.masked("debezium.sink.http.auth") == PipelineConfig.SecretMask)
    intercept[IllegalArgumentException] {
      PipelineConfig.resolveProviders(
        Map("debezium.source.config.providers" -> "env",
            "debezium.source.x" -> "${env:GRAFT_NO_SUCH_VAR}"),
        env = Map.empty)
    }
  }

  test("load(): secrets resolve before namespace remapping and stay masked in the mirror") {
    val dir = Files.createTempDirectory("graft-secrets4")
    val f = dir.resolve("redis.properties")
    Files.writeString(f, "password=redis-pw\n")
    val r = PipelineConfig.load(
      env = Map("DEBEZIUM_SINK_REDIS_ADDRESS" -> "localhost:6379"),
      explicit = Map(
        "debezium.source.config.providers" -> "file",
        "debezium.source.config.providers.file.class" ->
          "org.apache.kafka.common.config.provider.FileConfigProvider",
        "debezium.sink.type" -> "redis",
        "debezium.sink.redis.password" -> ("${file:" + f + ":password}"),
        "debezium.source.offset.storage" ->
          "io.debezium.storage.redis.offset.RedisOffsetBackingStore"))
    // the sink secret resolved, then the reuse mirror copied the
    // RESOLVED value into the offset-storage namespace…
    assert(r.props("debezium.sink.redis.password") == "redis-pw")
    assert(r.props("debezium.source.offset.storage.redis.password") == "redis-pw")
    assert(r.props("debezium.source.offset.storage.redis.address") == "localhost:6379")
    // …and the masked view masks BOTH copies — the mirror cannot leak
    assert(r.masked("debezium.sink.redis.password") == PipelineConfig.SecretMask)
    assert(r.masked("debezium.source.offset.storage.redis.password") == PipelineConfig.SecretMask)
    assert(!r.masked.values.exists(_.contains("redis-pw")))
    // a pipeline spec boots from the RESOLVED map while the password
    // never appears in the printable view
    assert(r.props("debezium.sink.type") == "redis")
  }

  test("sink config mirrors into BOTH storage namespaces when they are unconfigured") {
    // the reference's current default (DebeziumServerConfigSourceFactoryTest:28):
    // sink.type alone triggers the mirror — no storage-backend declaration needed
    val props = PipelineConfig.reuseSinkConfig(Map(
      "debezium.sink.type" -> "redis",
      "debezium.sink.redis.address" -> "localhost:6379",
      "debezium.sink.redis.password" -> "s3cret"))
    assert(props("debezium.source.offset.storage.redis.address") == "localhost:6379")
    assert(props("debezium.source.offset.storage.redis.password") == "s3cret")
    assert(props("debezium.source.schema.history.internal.redis.address") == "localhost:6379")
  }

  test("explicit storage config suppresses the mirror for THAT namespace only") {
    // DebeziumServerConfigSourceFactoryTest:38-53 — an explicit
    // schema-history key blocks the whole schema-history mirror (the
    // copied props could override it or leak beside it), while offset
    // storage still reuses; and symmetrically (:70-82)
    val p1 = PipelineConfig.reuseSinkConfig(Map(
      "debezium.sink.type" -> "redis",
      "debezium.sink.redis.connection.url" -> "sink-host:6379",
      "debezium.sink.redis.batch.size" -> "1000",
      "debezium.source.schema.history.internal.redis.url" -> "history-host:6379"))
    assert(p1("debezium.source.schema.history.internal.redis.url") == "history-host:6379")
    assert(!p1.contains("debezium.source.schema.history.internal.redis.connection.url"))
    assert(!p1.contains("debezium.source.schema.history.internal.redis.batch.size"))
    assert(p1("debezium.source.offset.storage.redis.connection.url") == "sink-host:6379")
    val p2 = PipelineConfig.reuseSinkConfig(Map(
      "debezium.sink.type" -> "redis",
      "debezium.sink.redis.address" -> "sink-host:6379",
      "debezium.sink.redis.batch.size" -> "1000",
      "debezium.source.offset.storage.redis.address" -> "offset-host:6379"))
    assert(p2("debezium.source.offset.storage.redis.address") == "offset-host:6379")
    assert(!p2.contains("debezium.source.offset.storage.redis.batch.size"))
    assert(p2("debezium.source.schema.history.internal.redis.address") == "sink-host:6379")
    // a DIFFERENT technology's explicit storage keys do not suppress
    val p3 = PipelineConfig.reuseSinkConfig(Map(
      "debezium.sink.type" -> "redis",
      "debezium.sink.redis.address" -> "sink-host:6379",
      "debezium.source.offset.storage.file.filename" -> "/tmp/offsets.dat"))
    assert(p3("debezium.source.offset.storage.redis.address") == "sink-host:6379")
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
