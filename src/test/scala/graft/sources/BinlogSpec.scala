package graft.sources

import graft.SparkSpec
import graft.sources.cdc.{BinlogDecoder, PgOutputDecoder}
import org.apache.spark.sql.functions._
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Fixture-driven MySQL binlog ROW-event decoding: events built
  * byte-for-byte per the binlog v4 wire format (little-endian headers,
  * TABLE_MAP metadata, present/null bitmaps) decode into the CdcLayout
  * the DSv2 source reads — including UPDATEs with FULL before images
  * (binlog_row_image=FULL, the MySQL default) and hard DELETEs. */
class BinlogSpec extends SparkSpec {

  private def event(eventType: Int, ts: Int = 1767139200)(body: ByteBuffer => Unit): Array[Byte] = {
    val b = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(ts); b.put(eventType.toByte); b.putInt(1) // server_id
    b.putInt(0); b.putInt(0); b.putShort(0) // event_size, log_pos, flags (informational)
    body(b)
    val out = new Array[Byte](b.position()); b.flip(); b.get(out); out
  }
  private def uint48(b: ByteBuffer, v: Long): Unit =
    (0 until 6).foreach(i => b.put(((v >> (8 * i)) & 0xff).toByte))
  private def lpStr(b: ByteBuffer, s: String): Unit = {
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    b.put(bytes.length.toByte); b.put(bytes); b.put(0.toByte)
  }
  private def varchar(b: ByteBuffer, s: String, meta: Int): Unit = {
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    if (meta > 255) b.putShort(bytes.length.toShort) else b.put(bytes.length.toByte)
    b.put(bytes)
  }
  /** bitmap over n slots, bits set where pred. */
  private def bm(b: ByteBuffer, n: Int, pred: Int => Boolean): Unit = {
    val bytes = new Array[Byte]((n + 7) / 8)
    (0 until n).filter(pred).foreach(i => bytes(i / 8) = (bytes(i / 8) | (1 << (i % 8))).toByte)
    b.put(bytes)
  }

  // inventory.customers: id LONG (key), email VARCHAR(128), score DOUBLE
  private val TableId = 0x70L
  private def tableMap(crc: Boolean = false) = event(BinlogDecoder.TableMapEvent) { b =>
    uint48(b, TableId); b.putShort(0)
    lpStr(b, "inventory"); lpStr(b, "customers")
    b.put(3.toByte) // column count (lenenc < 0xfb)
    b.put(BinlogDecoder.Long_.toByte); b.put(BinlogDecoder.Varchar.toByte)
    b.put(BinlogDecoder.Double_.toByte)
    b.put(3.toByte) // metadata length: varchar 2 + double 1
    b.putShort(128.toShort) // varchar max length (1-byte length encoding)
    b.put(8.toByte) // double pack length
    bm(b, 3, _ => true) // "can be null" bitmap (unused by the decoder)
    if (crc) b.putInt(0) // dummy CRC32 trailer on checksummed streams
  }
  private def rowsPreamble(b: ByteBuffer, eventType: Int): Unit = {
    uint48(b, TableId); b.putShort(0)
    b.putShort(2) // extra_data_length (v2): just the length field itself
    b.put(3.toByte) // column count
    bm(b, 3, _ => true) // columns present (before/all)
    if (eventType == BinlogDecoder.UpdateRows) bm(b, 3, _ => true) // after image
  }
  private def row(b: ByteBuffer, id: Int, email: Option[String], score: Double): Unit = {
    bm(b, 3, i => i == 1 && email.isEmpty) // null bitmap over present cols
    b.putInt(id)
    email.foreach(varchar(b, _, 128))
    b.putLong(java.lang.Double.doubleToLongBits(score))
  }

  test("binlog: write/update(full before image)/delete rows decode into the cdc layout") {
    val dec = new BinlogDecoder(startLsn = 4)
    dec.registerTable("inventory.customers", Seq("id", "email", "score"), Seq("id"))

    val fde = event(BinlogDecoder.FormatDescription) { b =>
      b.putShort(4); b.put(new Array[Byte](50)); b.putInt(0); b.put(19.toByte)
      // post-header length table omitted; no checksum byte → NONE
    }
    val ins = event(BinlogDecoder.WriteRows) { b =>
      rowsPreamble(b, BinlogDecoder.WriteRows)
      row(b, 1001, Some("sally@acme.com"), 1.5)
      row(b, 1002, None, 2.5) // NULL email exercises the null bitmap
    }
    val upd = event(BinlogDecoder.UpdateRows) { b =>
      rowsPreamble(b, BinlogDecoder.UpdateRows)
      row(b, 1001, Some("sally@acme.com"), 1.5)    // FULL before image
      row(b, 1001, Some("sally@example.org"), 9.0) // after
    }
    val del = event(BinlogDecoder.DeleteRows) { b =>
      rowsPreamble(b, BinlogDecoder.DeleteRows)
      row(b, 1002, None, 2.5) // hard delete with before image
    }
    val xid = event(BinlogDecoder.Xid)(b => b.putLong(77))

    val lines = dec.decodeAll(Seq(fde, tableMap(), ins, upd, del, xid))
    assert(lines.size == 5,
      s"2 writes + 1 update + 1 delete + 1 tombstone:\n${lines.mkString("\n")}")
    assert(lines.count(_.contains("\"value\":null")) == 1)
    assert(dec.currentLsn == 8) // tombstones take no LSN

    val db = Files.createTempDirectory("graft-binlog")
    Files.createDirectories(db.resolve("snapshot"))
    Files.writeString(db.resolve("snapshot/_lsn"), "4")
    PgOutputDecoder.appendSegment(db, lines)
    val batch = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", "id INT")
      .option("rowSchema", "id INT, email STRING, score DOUBLE")
      .load()

    assert(batch.filter(col("value").isNotNull)
      .select("value.op").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("c", "c", "d", "u"))
    assert(batch.filter(col("value").isNull).count() == 1) // the tombstone

    // NULL column decoded through the null bitmap
    val c1002 = batch.filter(col("value.op") === "c" && col("key.id") === 1002).head()
    val c1002v = c1002.getAs[org.apache.spark.sql.Row]("value").getAs[org.apache.spark.sql.Row]("after")
    assert(c1002v.isNullAt(c1002v.fieldIndex("email")) && c1002v.getAs[Double]("score") == 2.5)

    // UPDATE: full before image (MySQL binlog_row_image=FULL)
    val u = batch.filter(col("value.op") === "u").head().getAs[org.apache.spark.sql.Row]("value")
    assert(u.getAs[org.apache.spark.sql.Row]("before").getAs[String]("email") == "sally@acme.com")
    assert(u.getAs[org.apache.spark.sql.Row]("before").getAs[Double]("score") == 1.5)
    assert(u.getAs[org.apache.spark.sql.Row]("after").getAs[String]("email") == "sally@example.org")

    // hard DELETE: before image present, after null
    val d = batch.filter(col("value.op") === "d").head().getAs[org.apache.spark.sql.Row]("value")
    assert(d.getAs[org.apache.spark.sql.Row]("before").getAs[Int]("id") == 1002)
    assert(d.isNullAt(d.fieldIndex("after")))

    // header timestamp (epoch seconds) stamps ts_ms
    assert(d.getAs[Long]("ts_ms") == 1767139200000L)
  }

  test("binlog: primary-key UPDATE retires the old key (delete+tombstone) and creates under the new") {
    val dec = new BinlogDecoder()
    dec.registerTable("inventory.customers", Seq("id", "email", "score"), Seq("id"))
    val fde = event(BinlogDecoder.FormatDescription) { b =>
      b.putShort(4); b.put(new Array[Byte](50)); b.putInt(0); b.put(19.toByte)
    }
    val updPk = event(BinlogDecoder.UpdateRows) { b =>
      rowsPreamble(b, BinlogDecoder.UpdateRows)
      row(b, 1001, Some("s@x.com"), 1.0)
      row(b, 2001, Some("s@x.com"), 1.0) // id — the PK — changed
    }
    val lines = dec.decodeAll(Seq(fde, tableMap(), updPk))
    assert(lines.size == 3, lines.mkString("\n"))
    assert(lines(0).contains(""""op":"d"""") && lines(0).contains(""""key":{"id":1001}"""), lines(0))
    assert(lines(1).contains(""""value":null""") && lines(1).contains(""""key":{"id":1001}"""), lines(1))
    assert(lines(2).contains(""""op":"c"""") && lines(2).contains(""""key":{"id":2001}"""), lines(2))

    // a same-key update still emits a single 'u'
    val upd = event(BinlogDecoder.UpdateRows) { b =>
      rowsPreamble(b, BinlogDecoder.UpdateRows)
      row(b, 2001, Some("s@x.com"), 1.0)
      row(b, 2001, Some("t@x.com"), 2.0)
    }
    val u = dec.decode(upd)
    assert(u.size == 1 && u.head.contains(""""op":"u""""), u.mkString("\n"))
  }

  test("binlog: CRC32 checksum declared by FDE is trimmed; unregistered table throws") {
    val dec = new BinlogDecoder()
    dec.registerTable("inventory.customers", Seq("id", "email", "score"), Seq("id"))
    // FDE declaring CRC32: checksum alg byte (1) + its own CRC (4) at the tail
    val fdeCrc = event(BinlogDecoder.FormatDescription) { b =>
      b.putShort(4); b.put(new Array[Byte](50)); b.putInt(0); b.put(19.toByte)
      b.put(1.toByte); b.putInt(0) // alg=CRC32, dummy crc
    }
    assert(dec.decode(fdeCrc).isEmpty)
    assert(dec.decode(tableMap(crc = true)).isEmpty)
    val insCrc = event(BinlogDecoder.WriteRows) { b =>
      rowsPreamble(b, BinlogDecoder.WriteRows)
      row(b, 7, Some("x@y.z"), 0.25)
      b.putInt(0xDEAD) // CRC32 trailer — must be trimmed, not parsed as a row
    }
    val Seq(line) = dec.decode(insCrc)
    assert(line.contains(""""after":{"email":"x@y.z","id":7,"score":0.25}"""), line)

    val dec2 = new BinlogDecoder()
    intercept[IllegalStateException] { dec2.decode(tableMap()) }

    // truncated event → contextual error, decoder stays usable
    val whole = event(BinlogDecoder.WriteRows) { b =>
      rowsPreamble(b, BinlogDecoder.WriteRows)
      row(b, 8, Some("a@b.c"), 1.0)
      b.putInt(0) // CRC32 trailer (dec has checksums on)
    }
    val e = intercept[IllegalArgumentException] {
      dec.decode(java.util.Arrays.copyOfRange(whole, 0, whole.length - 9))
    }
    assert(e.getMessage.contains("truncated event") ||
      e.getMessage.contains("CRC32 trailer"), e.getMessage)
    assert(dec.decode(whole).size == 1)
  }
}
