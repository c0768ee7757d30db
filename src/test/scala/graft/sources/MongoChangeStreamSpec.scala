package graft.sources

import graft.SparkSpec
import graft.sources.cdc.{Bson, CaptureFactory, MongoChangeStreamDecoder, PgOutputDecoder}
import org.apache.spark.sql.functions._
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Fixture-driven MongoDB change-stream decoding: BSON change events
  * (built here byte-for-byte per the public BSON spec — little-endian
  * framing) decode into the same CdcLayout the DSv2 source reads; the
  * schemaless document projects through the reader's declared
  * rowSchema at scan time. */
class MongoChangeStreamSpec extends SparkSpec {

  // ---- little-endian BSON fixture writer ----------------------------
  private case class Oid(hex: String)
  private case class Dt(ms: Long)
  private case class Ts(t: Int, i: Int)
  private case class Doc(bytes: Array[Byte])
  private case class Arr(items: Any*)
  private case class Bin(bytes: Array[Byte])
  private case class Unsupported()

  private def bdoc(fields: (String, Any)*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    fields.foreach { case (k, v) => elem(out, k, v) }
    out.write(0)
    val body = out.toByteArray
    val buf = ByteBuffer.allocate(4 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(4 + body.length); buf.put(body)
    buf.array()
  }
  private def le(n: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(n).array()
  private def le(n: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(n).array()
  private def cstr(out: ByteArrayOutputStream, s: String): Unit = {
    out.write(s.getBytes(StandardCharsets.UTF_8)); out.write(0)
  }
  private def elem(out: ByteArrayOutputStream, name: String, v: Any): Unit = v match {
    case s: String =>
      out.write(0x02); cstr(out, name)
      val b = s.getBytes(StandardCharsets.UTF_8)
      out.write(le(b.length + 1)); out.write(b); out.write(0)
    case d: Double => out.write(0x01); cstr(out, name)
      out.write(le(java.lang.Double.doubleToLongBits(d)))
    case i: Int => out.write(0x10); cstr(out, name); out.write(le(i))
    case l: Long => out.write(0x12); cstr(out, name); out.write(le(l))
    case b: Boolean => out.write(0x08); cstr(out, name); out.write(if (b) 1 else 0)
    case null => out.write(0x0A); cstr(out, name)
    case Oid(hex) => out.write(0x07); cstr(out, name)
      out.write(hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
    case Dt(ms) => out.write(0x09); cstr(out, name); out.write(le(ms))
    case Ts(t, i) => out.write(0x11); cstr(out, name)
      out.write(le((t.toLong << 32) | (i & 0xffffffffL)))
    case Doc(bytes) => out.write(0x03); cstr(out, name); out.write(bytes)
    case Arr(items @ _*) => out.write(0x04); cstr(out, name)
      out.write(bdoc(items.zipWithIndex.map { case (x, i) => i.toString -> x }: _*))
    case Bin(bytes) => out.write(0x05); cstr(out, name)
      out.write(le(bytes.length)); out.write(0); out.write(bytes)
    case Unsupported() => out.write(0x0B); cstr(out, name) // regex — not supported
      cstr(out, "pat"); cstr(out, "i")
  }

  private val oidA = "65f1a2b3c4d5e6f708192a3b"
  private val oidB = "65f1a2b3c4d5e6f708192a3c"

  private def event(opType: String, id: Any, fullDoc: Option[Array[Byte]] = None,
                    preDoc: Option[Array[Byte]] = None,
                    db: String = "shop", coll: String = "users"): Array[Byte] = {
    val base = Seq[(String, Any)](
      "_id" -> Doc(bdoc("_data" -> "resume-token-bytes")),
      "operationType" -> opType,
      "clusterTime" -> Ts(1767139200, 7),
      "wallTime" -> Dt(1767139200123L),
      "ns" -> Doc(bdoc("db" -> db, "coll" -> coll)),
      "documentKey" -> Doc(bdoc("_id" -> id)))
    val withFull = fullDoc.fold(base)(d => base :+ ("fullDocument" -> (Doc(d): Any)))
    val withPre = preDoc.fold(withFull)(d => withFull :+ ("fullDocumentBeforeChange" -> (Doc(d): Any)))
    bdoc(withPre: _*)
  }

  test("bson: every supported type renders to the expected JSON; unsupported fails loudly") {
    val d = Bson.parse(bdoc(
      "s" -> "héllo\n\"q\"", "f" -> 2.5, "fi" -> 3.0, "nan" -> Double.NaN,
      "i" -> 42, "l" -> 9999999999L, "b" -> true, "z" -> null,
      "oid" -> Oid(oidA), "dt" -> Dt(1767139200000L), "ts" -> Ts(5, 2),
      "arr" -> Arr(1, "two", 3.5), "sub" -> Doc(bdoc("k" -> "v")),
      "bin" -> Bin(Array[Byte](1, 2, 3))))
    assert(d.get("s").get.json == "\"héllo\\n\\\"q\\\"\"")
    assert(d.get("f").get.json == "2.5")
    assert(d.get("fi").get.json == "3")         // integral double → no trailing .0
    assert(d.get("nan").get.json == "\"NaN\"")  // quoted, never bare
    assert(d.get("i").get.json == "42" && d.get("l").get.json == "9999999999")
    assert(d.get("b").get.json == "true" && d.get("z").get.json == "null")
    assert(d.get("oid").get.json == s""""$oidA"""")
    assert(d.get("dt").get.json == "\"2025-12-31T00:00:00Z\"") // Instant keeps :00 seconds
    assert(d.get("ts").get.json == """{"t":5,"i":2}""")
    assert(d.get("arr").get.json == """[1,"two",3.5]""")
    assert(d.get("sub").get.json == """{"k":"v"}""")
    assert(d.get("bin").get.json == s""""${java.util.Base64.getEncoder.encodeToString(Array[Byte](1, 2, 3))}"""")

    val e = intercept[IllegalArgumentException](Bson.parse(bdoc("rx" -> Unsupported())))
    assert(e.getMessage.contains("0x0b") && e.getMessage.contains("rx"))
  }

  test("change stream: insert/update/delete decode into the layout; rowSchema projects the schemaless doc") {
    val dec = new MongoChangeStreamDecoder(startLsn = 0)
    val ins = event("insert", Oid(oidA), fullDoc = Some(bdoc(
      "_id" -> Oid(oidA), "name" -> "Ada", "score" -> 3.5,
      "tags" -> Arr("x", "y"), "extra_field" -> 42)))
    // update with post-image (fullDocument=updateLookup) AND a 6.0 pre-image
    val upd = event("update", Oid(oidA),
      fullDoc = Some(bdoc("_id" -> Oid(oidA), "name" -> "Ada L.", "score" -> 4.0)),
      preDoc = Some(bdoc("_id" -> Oid(oidA), "name" -> "Ada", "score" -> 3.5)))
    val del = event("delete", Oid(oidB)) // no pre-image → key-only before
    val drop = bdoc("_id" -> Doc(bdoc("_data" -> "t")), "operationType" -> "drop",
      "ns" -> Doc(bdoc("db" -> "shop", "coll" -> "users")))

    val lines = dec.decodeAll(Seq(ins, upd, del, drop))
    assert(lines.size == 4, s"c,u,d + tombstone expected:\n${lines.mkString("\n")}")
    assert(dec.currentLsn == 3)
    assert(lines(3).contains("\"value\":null")) // tombstone trails the delete

    val db = Files.createTempDirectory("graft-mongo")
    Files.createDirectories(db.resolve("snapshot"))
    Files.writeString(db.resolve("snapshot/_lsn"), "0")
    PgOutputDecoder.appendSegment(db, lines)
    val batch = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", "id STRING")
      .option("rowSchema", "_id STRING, name STRING, score DOUBLE")
      .load()

    val c = batch.filter(col("value.op") === "c").head()
    val cv = c.getAs[org.apache.spark.sql.Row]("value")
    val ca = cv.getAs[org.apache.spark.sql.Row]("after")
    // declared fields projected; tags/extra_field dropped by the schema
    assert(ca.getAs[String]("_id") == oidA && ca.getAs[String]("name") == "Ada"
      && ca.getAs[Double]("score") == 3.5)
    assert(c.getAs[org.apache.spark.sql.Row]("key").getAs[String]("id") == oidA)
    assert(cv.getAs[org.apache.spark.sql.Row]("source").getAs[String]("connector") == "mongodb")
    assert(cv.getAs[Long]("ts_ms") == 1767139200123L) // wallTime preferred

    val u = batch.filter(col("value.op") === "u").head()
      .getAs[org.apache.spark.sql.Row]("value")
    assert(u.getAs[org.apache.spark.sql.Row]("before").getAs[Double]("score") == 3.5)
    assert(u.getAs[org.apache.spark.sql.Row]("after").getAs[Double]("score") == 4.0)

    // delete without pre-image: before carries the documentKey only
    val d = batch.filter(col("value.op") === "d").head()
      .getAs[org.apache.spark.sql.Row]("value")
    val dbf = d.getAs[org.apache.spark.sql.Row]("before")
    assert(dbf.getAs[String]("_id") == oidB && dbf.isNullAt(dbf.fieldIndex("name")))
    assert(d.isNullAt(d.fieldIndex("after")))
  }

  test("capture factory dispatches MongoDbConnector to the protocol tailer") {
    val dbDir = Files.createTempDirectory("graft-mongo-cap")
    val feedDir = Files.createTempDirectory("graft-mongo-feed")
    CaptureFactory.fromProperties(Map(
      "debezium.source.connector.class" -> "io.debezium.connector.mongodb.MongoDbConnector",
      "debezium.source.path" -> dbDir.toString,
      "debezium.source.protocol.dir" -> feedDir.toString)) match {
      case CaptureFactory.ProtocolCapture(_) => ()
      case other => fail(s"expected ProtocolCapture, got $other")
    }
  }
}
