package graft.sources

import graft.SparkSpec
import graft.sources.cdc.{CaptureFactory, ReplicationTailer, VStreamDecoder}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Fixture-driven Vitess VStream decoding: VStreamResponse messages
  * built byte-for-byte per the protobuf wire format (binlogdata.proto
  * VEvent/FieldEvent/RowEvent, query.Row's packed-sint64 lengths +
  * concatenated values) decode into the CdcLayout the DSv2 source
  * reads — FIELD announcements, inserts, updates with FULL before
  * images, hard deletes, NULLs, and bookkeeping events skipped. */
class VStreamSpec extends SparkSpec {

  // wire builders shared with the cdc21 driver fixture — one copy of
  // the encoding, so unit fixtures and the oracle replay cannot
  // silently diverge
  import graft.sources.cdc.VStreamProto._

  private val custFields = fieldEvent("commerce.customers",
    field("id", isKey = true), field("name", isKey = false), field("email", isKey = false))

  test("vstream: FIELD then ROW decodes c/u/d with before images, NULLs, tombstones") {
    val dec = new VStreamDecoder()
    // BEGIN(2)/VGTID(15)/HEARTBEAT(14) are consumed silently
    assert(dec.decode(response(bookkeeping(2), custFields, bookkeeping(15),
      bookkeeping(14))).isEmpty)

    val ins = dec.decode(response(rowEvent("commerce.customers",
      change(None, Some(row(Seq(Some("1001"), Some("Sally"), None)))))))
    assert(ins.size == 1)
    assert(ins.head.contains(""""op":"c""""))
    assert(ins.head.contains(""""after":{"id":"1001","name":"Sally","email":null}"""))
    assert(ins.head.contains(""""key":{"id":"1001"}"""))
    assert(ins.head.contains(""""connector":"vitess""""))
    assert(ins.head.contains(""""destination":"testc.commerce.customers""""))

    // update with FULL before image (unpacked lengths variant decodes too)
    val upd = dec.decode(response(rowEvent("commerce.customers",
      change(Some(row(Seq(Some("1001"), Some("Sally"), None), packed = false)),
             Some(row(Seq(Some("1001"), Some("Sally"), Some("s@acme.com"))))))))
    assert(upd.size == 1)
    assert(upd.head.contains(""""op":"u""""))
    assert(upd.head.contains(""""before":{"id":"1001","name":"Sally","email":null}"""))
    assert(upd.head.contains(""""email":"s@acme.com""""))

    // hard delete: before image + compaction tombstone
    val del = dec.decode(response(rowEvent("commerce.customers",
      change(Some(row(Seq(Some("1001"), Some("Sally"), Some("s@acme.com")))), None))))
    assert(del.size == 2)
    assert(del.head.contains(""""op":"d""""))
    assert(del.last.contains(""""value":null"""))
    assert(dec.currentLsn == 3)
  }

  test("vstream: multi-change events fan out; ROW before FIELD and key-less tables fail loudly") {
    val dec = new VStreamDecoder()
    val e = intercept[IllegalArgumentException](dec.decode(response(
      rowEvent("commerce.orders", change(None, Some(row(Seq(Some("1")))))))))
    assert(e.getMessage.contains("before its FIELD event"))

    // no PRI_KEY flag anywhere and no override = loud failure
    intercept[IllegalArgumentException](dec.decode(response(
      fieldEvent("commerce.logs", field("line", isKey = false)))))
    // ...but registerKeys unblocks the same shape
    val dec2 = new VStreamDecoder()
    dec2.registerKeys("commerce.logs", Seq("line"))
    dec2.decode(response(fieldEvent("commerce.logs", field("line", isKey = false))))
    val two = dec2.decode(response(rowEvent("commerce.logs",
      change(None, Some(row(Seq(Some("a"))))),
      change(None, Some(row(Seq(Some("b"))))))))
    assert(two.size == 2)

    // truncated frame: context, not a bare index error
    val t = intercept[IllegalArgumentException](dec2.decode(
      response(custFields).dropRight(3)))
    assert(t.getMessage.contains("vstream"))
  }

  test("vstream: factory dispatches VitessConnector; feed replays into the cdc layout end-to-end") {
    val feedDir = Files.createTempDirectory("graft-vstream-feed")
    val db = Files.createTempDirectory("graft-vstream-db")
    Files.write(feedDir.resolve("m-000001"), response(bookkeeping(2), custFields))
    Files.write(feedDir.resolve("m-000002"), response(
      rowEvent("commerce.customers",
        change(None, Some(row(Seq(Some("1"), Some("A"), Some("a@x.com"))))),
        change(None, Some(row(Seq(Some("2"), Some("B"), Some("b@x.com")))))),
      rowEvent("commerce.customers",
        change(Some(row(Seq(Some("2"), Some("B"), Some("b@x.com")))),
               Some(row(Seq(Some("2"), Some("B"), Some("b@new.com"))))))))

    val cap = CaptureFactory.fromProperties(Map(
      "debezium.source.connector.class" -> "io.debezium.connector.vitess.VitessConnector",
      "debezium.source.path" -> db.toString,
      "debezium.source.protocol.dir" -> feedDir.toString))
    cap match {
      case CaptureFactory.ProtocolCapture(tailer: ReplicationTailer) =>
        Files.createDirectories(db.resolve("snapshot"))
        Files.writeString(db.resolve("snapshot").resolve("_lsn"), "0")
        Files.createDirectories(db.resolve("wal"))
        assert(tailer.drainOnce() == 3)
      case other => fail(s"expected ProtocolCapture(ReplicationTailer), got $other")
    }

    val batch = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", "id STRING")
      .option("rowSchema", "id STRING, name STRING, email STRING")
      .load()
    assert(batch.filter(col("value.op") === "c").count() == 2)
    val upd = batch.filter(col("value.op") === "u").head()
    val uval = upd.getAs[org.apache.spark.sql.Row]("value")
    assert(uval.getAs[org.apache.spark.sql.Row]("before").getAs[String]("email") == "b@x.com")
    assert(uval.getAs[org.apache.spark.sql.Row]("after").getAs[String]("email") == "b@new.com")
    assert(batch.filter(col("value.source.connector") === "vitess").count() === 3)
  }
}
