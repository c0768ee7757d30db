package graft.formats

import graft.SparkSpec
import graft.model.LogicalTypes
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private val rowSchema = StructType(Seq(
    StructField("id", IntegerType), StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("tags", ArrayType(StringType)),
    StructField("attrs", MapType(StringType, StringType)),
    StructField("nested", StructType(Seq(StructField("x", LongType))))))

  private def frame() = {
    val rows = Seq(
      Row(1, "alice", 1.5, Seq("a", "b"), Map("k" -> "v"), Row(7L)),
      Row(2, null, null, null, null, null))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), rowSchema)
  }

  test("format registry resolves every supported name; schema-less/unknown fail at startup") {
    assert(Formats.forName("json").name == "json")
    assert(Formats.forName("jsonbytearray").name == "jsonbytearray")
    assert(Formats.forName("simplestring").name == "simplestring")
    assert(Formats.forName("connect").name == "connect")
    assert(Formats.forName("binary").name == "binary")
    assert(Formats.forName("cloudevents").name == "cloudevents")
    assert(Formats.forName("avro", Some(rowSchema)).name == "avro")
    assert(Formats.forName("protobuf", Some(rowSchema)).name == "protobuf")
    intercept[IllegalArgumentException](Formats.forName("protobuf")) // schema required
    intercept[IllegalArgumentException](Formats.forName("avro")) // schema required
    intercept[IllegalArgumentException](Formats.forName("nope"))
  }

  test("protobuf encodes the documented wire format and round-trips") {
    // golden check against hand-computed wire bytes:
    // message {int32 a=1; string b=2;} with a=150, b="testing"
    // → 08 96 01 12 07 74 65 73 74 69 6e 67 (protobuf docs example)
    val mini = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    val bytes = ProtobufFormat.encodeRow(Row(150, "testing"), mini)
    assert(bytes.map(b => f"${b & 0xff}%02x").mkString(" ") ==
      "08 96 01 12 07 74 65 73 74 69 6e 67")

    // full shape round-trip through the Spark column encoder
    val df = frame()
    val wire = df.filter(col("id") === 1)
      .select(Formats.Protobuf(rowSchema)
        .serialize(struct(df.columns.map(col).toIndexedSeq: _*)).as("b"))
      .head().getAs[Array[Byte]]("b")
    val dec = ProtobufFormat.decode(wire, rowSchema)
    assert(dec("id") == 1)
    assert(dec("name") == "alice")
    assert(dec("score") == 1.5)
    assert(dec("tags") == Seq("a", "b"))
    assert(dec("attrs") == Map("k" -> "v"))
    assert(dec("nested").asInstanceOf[Map[String, Any]]("x") == 7L)
    // null-heavy row: absent fields stay absent (proto3 semantics)
    val wire2 = df.filter(col("id") === 2)
      .select(Formats.Protobuf(rowSchema)
        .serialize(struct(df.columns.map(col).toIndexedSeq: _*)).as("b"))
      .head().getAs[Array[Byte]]("b")
    val dec2 = ProtobufFormat.decode(wire2, rowSchema)
    assert(dec2("id") == 2 && !dec2.contains("name"))
  }

  test("json round-trips through from_json including explicit nulls") {
    val df = frame()
    val back = df.select(from_json(Formats.Json.serialize(struct(df.columns.map(col).toIndexedSeq: _*)),
      rowSchema).as("r")).select("r.*")
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("avro encodes and decodes every field shape") {
    val df = frame()
    val bytes = df.filter(col("id") === 1)
      .select(Formats.Avro(rowSchema).serialize(struct(df.columns.map(col).toIndexedSeq: _*)).as("b"))
      .head().getAs[Array[Byte]]("b")
    val rec = AvroFormat.decode(bytes, rowSchema)
    assert(rec.get("id") == 1)
    assert(rec.get("name").toString == "alice")
    assert(rec.get("score") == 1.5)
    assert(rec.get("tags").toString == "[a, b]")
    assert(rec.get("nested").asInstanceOf[org.apache.avro.generic.GenericRecord].get("x") == 7L)
    // null-heavy row also encodes
    val bytes2 = df.filter(col("id") === 2)
      .select(Formats.Avro(rowSchema).serialize(struct(df.columns.map(col).toIndexedSeq: _*)).as("b"))
      .head().getAs[Array[Byte]]("b")
    val rec2 = AvroFormat.decode(bytes2, rowSchema)
    assert(rec2.get("id") == 2 && rec2.get("name") == null)
  }

  test("registry-framed avro: magic byte + schema id header round-trips") {
    val registry = new AvroFormat.InMemorySchemaRegistry
    val df = frame()
    val bytes = df.filter(col("id") === 1)
      .select(Formats.Avro(rowSchema, Some(registry), "t-value")
        .serialize(struct(df.columns.map(col).toIndexedSeq: _*)).as("b"))
      .head().getAs[Array[Byte]]("b")
    // Confluent wire format: 0x00 magic + 4-byte big-endian schema id
    assert(bytes(0) == 0x00)
    val id = java.nio.ByteBuffer.wrap(bytes, 1, 4).getInt
    assert(id == registry.register("t-value", AvroFormat.avroSchema(rowSchema))) // idempotent
    val rec = AvroFormat.decodeFramed(bytes, registry)
    assert(rec.get("id") == 1 && rec.get("name").toString == "alice")
    // unframed bytes are rejected by the framed decoder
    val raw = df.filter(col("id") === 1)
      .select(Formats.Avro(rowSchema).serialize(struct(df.columns.map(col).toIndexedSeq: _*)).as("b"))
      .head().getAs[Array[Byte]]("b")
    assert(raw.length == bytes.length - 5) // header is exactly 5 bytes
    // a different subject/schema gets a different id
    val id2 = registry.register("other-value",
      AvroFormat.avroSchema(StructType(Seq(StructField("z", LongType)))))
    assert(id2 != id)
  }

  test("distributed decoders: framedDecoder and protobuf decoder round-trip every field shape") {
    val df = frame()
    val envCol = struct(df.columns.map(col).toIndexedSeq: _*)
    // avro: encode framed, decode framed, both as executor-side column
    // functions — the distributed pair cdc36 rides
    val registry = new AvroFormat.InMemorySchemaRegistry
    val aEnc = AvroFormat.framedEncoder(rowSchema, registry, "t-value")
    val aDec = AvroFormat.framedDecoder(rowSchema, registry, "t-value")
    val aRows = df.select(aDec(aEnc(envCol)).as("env"))
      .select("env.*").orderBy("id").collect()
    assert(aRows(0) == Row(1, "alice", 1.5, Seq("a", "b"), Map("k" -> "v"), Row(7L)))
    assert(aRows(1) == Row(2, null, null, null, null, null)) // nulls survive
    // a frame with a DIFFERENT schema id than the consumer registered fails
    val otherReg = new AvroFormat.InMemorySchemaRegistry
    otherReg.register("pad-1", AvroFormat.avroSchema(
      StructType(Seq(StructField("z", LongType))))) // shifts the next id
    val mismatchDec = AvroFormat.framedDecoder(rowSchema, otherReg, "t-value")
    val e = intercept[Exception] {
      df.select(mismatchDec(aEnc(envCol))).collect()
    }
    assert(e.getMessage != null)
    // protobuf: distributed encode→decode; absent wire fields are null
    val pEnc = ProtobufFormat.encoder(rowSchema)
    val pDec = ProtobufFormat.decoder(rowSchema)
    val pRows = df.select(pDec(pEnc(envCol)).as("env"))
      .select("env.*").orderBy("id").collect()
    assert(pRows(0) == Row(1, "alice", 1.5, Seq("a", "b"), Map("k" -> "v"), Row(7L)))
    assert(pRows(1) == Row(2, null, null, null, null, null))
  }

  test("http registry client speaks the Confluent wire protocol end-to-end") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    // a live HTTP registry backed by the in-memory store: the two
    // Confluent REST endpoints the client uses
    val store = new AvroFormat.InMemorySchemaRegistry
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    def reply(x: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      x.sendResponseHeaders(code, b.length)
      x.getResponseBody.write(b); x.close()
    }
    server.createContext("/", new HttpHandler {
      private val post = "/subjects/([^/]+)/versions".r
      private val get = "/schemas/ids/(\\d+)".r
      override def handle(x: HttpExchange): Unit = x.getRequestURI.getPath match {
        case post(subject) =>
          val req = graft.sources.cdc.JsonRows.parse(
            new String(x.getRequestBody.readAllBytes(), "UTF-8"))
          val schema = new org.apache.avro.Schema.Parser().parse(req.get("schema").asText())
          val id = store.register(java.net.URLDecoder.decode(subject, "UTF-8"), schema)
          reply(x, 200, s"""{"id":$id}""")
        case get(id) =>
          try {
            val s = store.byId(id.toInt).toString
            reply(x, 200, s"""{"schema":${com.fasterxml.jackson.databind.node.TextNode.valueOf(s).toString}}""")
          } catch { case _: IllegalArgumentException =>
            reply(x, 404, """{"error_code":40403,"message":"Schema not found"}""") }
        case _ => reply(x, 404, "{}")
      }
    })
    server.start()
    try {
      val client = new HttpSchemaRegistryClient(
        s"http://localhost:${server.getAddress.getPort}")
      val df = frame()
      val bytes = df.filter(col("id") === 1)
        .select(Formats.Avro(rowSchema, Some(client), "t-value")
          .serialize(struct(df.columns.map(col).toIndexedSeq: _*)).as("b"))
        .head().getAs[Array[Byte]]("b")
      assert(bytes(0) == 0x00)
      // registration is idempotent across clients (same schema → same id)
      assert(client.register("t-value", AvroFormat.avroSchema(rowSchema)) ==
        java.nio.ByteBuffer.wrap(bytes, 1, 4).getInt)
      // consumer side resolves the id over HTTP and decodes the body
      val rec = AvroFormat.decodeFramed(bytes, client)
      assert(rec.get("id") == 1 && rec.get("name").toString == "alice")
      // unknown id surfaces the server error
      val err = intercept[IllegalStateException](client.byId(999999))
      assert(err.getMessage.contains("404"))
    } finally server.stop(0)
  }

  test("apicurio registry client speaks the v2 REST dialect; both framings round-trip") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    // a live Apicurio v2 stub: raw schema bodies (no Confluent
    // {"schema":...} wrapper), contentId metadata keyed by canonical
    // CONTENT alone (Apicurio's semantics — the same schema under two
    // subjects shares one contentId), X-Registry-ArtifactId routing
    val contentIds = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val contentById = new java.util.concurrent.ConcurrentHashMap[Integer, String]()
    val nextId = new java.util.concurrent.atomic.AtomicInteger(1)
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    def reply(x: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      x.sendResponseHeaders(code, b.length)
      x.getResponseBody.write(b); x.close()
    }
    val lastGroup = new java.util.concurrent.atomic.AtomicReference[String]("")
    server.createContext("/", new HttpHandler {
      private val post = "/groups/([^/]+)/artifacts".r
      private val get = "/ids/contentIds/(\\d+)".r
      override def handle(x: HttpExchange): Unit = x.getRequestURI.getPath match {
        case post(group) =>
          lastGroup.set(java.net.URLDecoder.decode(group, "UTF-8"))
          val subject = x.getRequestHeaders.getFirst("X-Registry-ArtifactId")
          val raw = new String(x.getRequestBody.readAllBytes(), "UTF-8")
          val canonical = new org.apache.avro.Schema.Parser().parse(raw).toString
          val id = contentIds.computeIfAbsent(canonical,
            _ => Integer.valueOf(nextId.getAndIncrement()))
          contentById.putIfAbsent(id, canonical)
          reply(x, 200,
            s"""{"id":"$subject","contentId":$id,"globalId":$id,"type":"AVRO"}""")
        case get(id) =>
          Option(contentById.get(Integer.valueOf(id.toInt))) match {
            case Some(c) => reply(x, 200, c)
            case None =>
              reply(x, 404, """{"error_code":404,"message":"No content with id"}""")
          }
        case _ => reply(x, 404, "{}")
      }
    })
    server.start()
    try {
      val client = new ApicurioRegistryClient(
        s"http://localhost:${server.getAddress.getPort}", group = "graft")
      val df = frame()
      val row = struct(df.columns.map(col).toIndexedSeq: _*)

      // Confluent-compat 4-byte framing over the Apicurio dialect
      val enc4 = AvroFormat.framedEncoder(rowSchema, client, "t-value")
      val b4 = df.filter(col("id") === 1).select(enc4(row).as("b"))
        .head().getAs[Array[Byte]]("b")
      assert(b4(0) == 0x00)
      val rec4 = AvroFormat.decodeFramed(b4, client)
      assert(rec4.get("id") == 1 && rec4.get("name").toString == "alice")
      assert(lastGroup.get == "graft")

      // Apicurio-legacy 8-byte framing, same registry
      val enc8 = AvroFormat.framedEncoderApicurioLegacy(rowSchema, client, "t-value")
      val b8 = df.filter(col("id") === 1).select(enc8(row).as("b"))
        .head().getAs[Array[Byte]]("b")
      assert(b8(0) == 0x00 && b8.length == b4.length + 4)
      assert(java.nio.ByteBuffer.wrap(b8, 1, 8).getLong ==
        java.nio.ByteBuffer.wrap(b4, 1, 4).getInt.toLong)
      val rec8 = AvroFormat.decodeFramedApicurioLegacy(b8, client)
      assert(rec8.get("id") == 1 && rec8.get("name").toString == "alice")

      // content-id semantics: the SAME canonical schema under another
      // subject resolves to the SAME content id (the dedup contract)
      assert(client.register("other-value", AvroFormat.avroSchema(rowSchema)) ==
        java.nio.ByteBuffer.wrap(b4, 1, 4).getInt)

      // unknown id surfaces the server error
      val err = intercept[IllegalStateException](client.byId(999999))
      assert(err.getMessage.contains("404"))

      // config-selected dialect: forName("avro") with the apicurio
      // knobs produces byte-identical framed output
      val viaConfig = Formats.forName("avro", Some(rowSchema), Map(
        "apicurio.registry.url" -> s"http://localhost:${server.getAddress.getPort}",
        "apicurio.registry.group" -> "graft",
        "schema.registry.subject" -> "t-value"))
      val bc = df.filter(col("id") === 1).select(viaConfig.serialize(row).as("b"))
        .head().getAs[Array[Byte]]("b")
      assert(java.util.Arrays.equals(bc, b4))
    } finally server.stop(0)
  }

  test("cloudevents carries the CE 1.0 attributes and the envelope as data") {
    val keySchema = StructType(Seq(StructField("id", IntegerType)))
    val schema = graft.model.Envelope.recordSchema(keySchema, StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType))))
    val rows = Seq(Row("testc.s.t", Row(1),
      Row("c", null, Row(1, "x"), Row("pg", "db", "s", "t", 42L, "false", 0L), 0L),
      Map.empty[String, String]))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val ce = Formats.forName("cloudevents", props = Map("cloudevents.source" -> "/graft/test"))
      .serialize(struct(col("destination"), col("value")))
    val json = df.select(ce.as("ce")).head().getString(0)
    assert(json.contains(""""specversion":"1.0""""))
    assert(json.contains(""""id":"testc.s.t-42""""))
    assert(json.contains(""""source":"/graft/test""""))
    assert(json.contains(""""data":{"""))
  }

  test("logical types map wire values to typed columns") {
    val df = Seq((19723, 1700000000123L, 1700000000123456L, "2023-11-14T22:13:20.123456+02:00"))
      .toDF("epoch_days", "epoch_ms", "epoch_us", "zoned")
    val out = df.select(
      LogicalTypes.date(col("epoch_days")).as("d"),
      LogicalTypes.timestampMillis(col("epoch_ms")).as("ts_ms"),
      LogicalTypes.timestampMicros(col("epoch_us")).as("ts_us"),
      LogicalTypes.zonedTimestamp(col("zoned")).as("ts_z")).head()
    assert(out.getAs[java.sql.Date]("d").toString == "2024-01-01")
    assert(out.getAs[java.sql.Timestamp]("ts_ms").toInstant.toEpochMilli == 1700000000123L)
    assert(out.getAs[java.sql.Timestamp]("ts_z").toInstant.getEpochSecond == 1700000000L - 2 * 3600)

    // VariableScaleDecimal: unscaled bytes + scale → exact decimal string
    val vsd = Seq((Array[Byte](0x07, 0x5B.toByte, 0xCD.toByte, 0x15), 4)).toDF("unscaled", "scale")
    val s = vsd.select(LogicalTypes.variableScaleDecimal(col("scale"), col("unscaled")).as("v"))
      .head().getString(0)
    assert(s == "12345.6789")

    // vectors: float wire → double math side
    val vec = Seq(Seq(1.5f, 2.5f)).toDF("v")
    val dv = vec.select(LogicalTypes.floatVectorToDouble(col("v")).as("d"))
      .head().getAs[scala.collection.Seq[Double]]("d").toList
    assert(dv == List(1.5, 2.5))

    assert(LogicalTypes.sparkTypeFor(LogicalTypes.DateName) == DateType)
    assert(LogicalTypes.sparkTypeFor(LogicalTypes.FloatVectorName) == ArrayType(FloatType))
    assert(LogicalTypes.sparkTypeFor(LogicalTypes.DecimalName,
      Map("connect.decimal.precision" -> "18", "scale" -> "2")) == DecimalType(18, 2))
  }
}
