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

  test("binlog: logical types NEWDECIMAL/DATE/YEAR/DATETIME2/TIMESTAMP2/TIME2/BLOB/JSON decode end-to-end") {
    import BinlogDecoder._
    val dec = new BinlogDecoder(startLsn = 0)
    dec.registerTable("inventory.typed",
      Seq("id", "price", "born", "y", "created", "updated", "dur", "payload", "doc"), Seq("id"))

    // TABLE_MAP with per-type metadata: decimal(10,3), datetime2(3),
    // timestamp2(6), time2(2), blob len-width 2, json len-width 4
    val TypedId = 0x71L
    val tmap = event(TableMapEvent) { b =>
      uint48(b, TypedId); b.putShort(0)
      lpStr(b, "inventory"); lpStr(b, "typed")
      b.put(9.toByte)
      b.put(Long_.toByte); b.put(NewDecimal.toByte); b.put(Date.toByte)
      b.put(Year.toByte); b.put(DateTime2.toByte); b.put(Timestamp2.toByte)
      b.put(Time2.toByte); b.put(Blob.toByte); b.put(Json.toByte)
      b.put(7.toByte) // metadata bytes: decimal 2 + dt2 1 + ts2 1 + time2 1 + blob 1 + json 1
      b.put(10.toByte); b.put(3.toByte) // NEWDECIMAL precision, scale
      b.put(3.toByte)  // DATETIME2 fsp
      b.put(6.toByte)  // TIMESTAMP2 fsp
      b.put(2.toByte)  // TIME2 fsp
      b.put(2.toByte)  // BLOB length-prefix width
      b.put(4.toByte)  // JSON length-prefix width
      bm(b, 9, _ => true)
    }

    // packed decimal magnitude writer: decimal(10,3) → 4-byte int group
    // (7 digits) + 2-byte frac group (3 digits), invert for negative,
    // then flip the first byte's sign bit (MySQL decimal2bin order)
    def dec103(b: ByteBuffer, intPart: Int, fracPart: Int, neg: Boolean): Unit = {
      val bytes = ByteBuffer.allocate(6)
      bytes.putInt(intPart); bytes.putShort(fracPart.toShort)
      val arr = bytes.array()
      if (neg) (0 until 6).foreach(i => arr(i) = (~arr(i)).toByte)
      arr(0) = (arr(0) ^ 0x80).toByte
      b.put(arr)
    }
    def beN(b: ByteBuffer, v: Long, n: Int): Unit =
      ((n - 1) to 0 by -1).foreach(i => b.put(((v >> (8 * i)) & 0xff).toByte))

    // {"a":1,"b":"x","c":[true,null]} in MySQL binary-JSON small-object
    // format (offsets relative to the byte after the type tag)
    val binJson: Array[Byte] = {
      val b = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0x00.toByte)            // small object
      b.putShort(3); b.putShort(40) // count, total size
      b.putShort(25); b.putShort(1) // key "a"
      b.putShort(26); b.putShort(1) // key "b"
      b.putShort(27); b.putShort(1) // key "c"
      b.put(0x05.toByte); b.putShort(1)  // a → inlined int16 1
      b.put(0x0c.toByte); b.putShort(28) // b → string at 28
      b.put(0x02.toByte); b.putShort(30) // c → small array at 30
      b.put('a'.toByte); b.put('b'.toByte); b.put('c'.toByte)
      b.put(1.toByte); b.put('x'.toByte) // string: varint len 1, "x"
      b.putShort(2); b.putShort(10)      // array: count, size
      b.put(0x04.toByte); b.putShort(1)  // inlined literal true
      b.put(0x04.toByte); b.putShort(0)  // inlined literal null
      val out = new Array[Byte](b.position()); b.flip(); b.get(out); out
    }

    val born = java.time.LocalDate.of(2026, 8, 13)
    val created = java.time.LocalDateTime.of(2026, 3, 15, 12, 34, 56)
    val ins = event(WriteRows) { b =>
      uint48(b, TypedId); b.putShort(0)
      b.putShort(2)
      b.put(9.toByte)
      bm(b, 9, _ => true) // all columns present
      // row 1: the happy path
      bm(b, 9, _ => false) // no nulls
      b.putInt(7)                                    // id
      dec103(b, 1234, 567, neg = false)              // price 1234.567
      // DATE: 3 bytes LE, day | month<<5 | year<<9
      val dv = born.getDayOfMonth | (born.getMonthValue << 5) | (born.getYear << 9)
      b.put((dv & 0xff).toByte); b.put(((dv >> 8) & 0xff).toByte); b.put(((dv >> 16) & 0xff).toByte)
      b.put(126.toByte)                              // YEAR 2026
      // DATETIME2(3): 5-byte BE biased pack + 2-byte frac (2n digits)
      val ym = created.getYear * 13 + created.getMonthValue
      val packed = (1L << 39) | (ym.toLong << 22) | (created.getDayOfMonth.toLong << 17) |
        (created.getHour.toLong << 12) | (created.getMinute.toLong << 6) | created.getSecond
      beN(b, packed, 5); beN(b, 7890, 2)             // .789 s → 7890 (4 digits)
      // TIMESTAMP2(6): 4-byte BE epoch sec + 3-byte frac (micros)
      beN(b, 1767139200L, 4); beN(b, 123456, 3)
      // TIME2(2): biased word over 4 bytes, -10.5 s
      beN(b, (0x800000L << 8) - ((10L << 8) | 50L), 4)
      // BLOB: 2-byte LE length + bytes
      b.putShort(4); b.put(Array[Byte](0xDE.toByte, 0xAD.toByte, 0xBE.toByte, 0xEF.toByte))
      // JSON: 4-byte LE length + binary-json doc
      b.putInt(binJson.length); b.put(binJson)
      // row 2: negative decimal, zero-frac timestamp, scalar JSON
      bm(b, 9, i => i == 7) // payload NULL
      b.putInt(8)
      dec103(b, 0, 12, neg = true)                   // -0.012
      val dv2 = 1 | (1 << 5) | (2000 << 9)
      b.put((dv2 & 0xff).toByte); b.put(((dv2 >> 8) & 0xff).toByte); b.put(((dv2 >> 16) & 0xff).toByte)
      b.put(0.toByte)                                // YEAR stored 0 = sentinel 0000
      val packed2 = (1L << 39) | ((1999 * 13 + 12).toLong << 22) | (31L << 17) |
        (23L << 12) | (59L << 6) | 59L
      beN(b, packed2, 5); beN(b, 9990, 2)            // .999 s
      beN(b, 1L, 4); beN(b, 0, 3)                    // 1970-01-01T00:00:01Z
      beN(b, (0x800000L << 8) + ((((838L << 12) | (59L << 6) | 58L) << 8) | 0L), 4) // 838:59:58
      // payload is NULL — nothing on the wire
      val scalar = Array[Byte](0x0c, 5, 'h', 'e', 'l', 'l', 'o')
      b.putInt(scalar.length); b.put(scalar)
    }

    val lines = dec.decodeAll(Seq(tmap, ins))
    assert(lines.size == 2, lines.mkString("\n"))
    val l1 = lines.head
    assert(l1.contains(""""price":1234.567"""), l1)
    assert(l1.contains(s""""born":${born.toEpochDay}"""), l1)
    assert(l1.contains(""""y":2026"""), l1)
    val expectMicros = created.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + 789000L
    assert(l1.contains(s""""created":$expectMicros"""), l1)
    assert(l1.contains(""""updated":"2025-12-31T00:00:00.123456Z""""), l1)
    assert(l1.contains(""""dur":-10500000"""), l1)
    assert(l1.contains(""""payload":"3q2+7w=="""), l1)
    assert(l1.contains(""""doc":"{\"a\":1,\"b\":\"x\",\"c\":[true,null]}""""), l1)
    val l2 = lines(1)
    assert(l2.contains(""""price":-0.012"""), l2)
    assert(l2.contains(""""born":10957"""), l2) // 2000-01-01
    // stored 0 is MySQL's zero-year sentinel: surfaces as 0 (matching
    // Debezium/MySQL 0000 semantics), NOT as a real-looking 1900
    assert(l2.contains(""""y":0"""), l2)
    val expectMicros2 = java.time.LocalDateTime.of(1999, 12, 31, 23, 59, 59)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + 999000L
    assert(l2.contains(s""""created":$expectMicros2"""), l2)
    assert(l2.contains(""""updated":"1970-01-01T00:00:01Z""""), l2)
    assert(l2.contains(s""""dur":${(838L * 3600 + 59 * 60 + 58) * 1000000L}"""), l2)
    assert(l2.contains(""""payload":null"""), l2)
    assert(l2.contains(""""doc":"\"hello\""""), l2)

    // the lines are valid JSON the DSv2 source parses with typed schema
    val db = Files.createTempDirectory("graft-binlog-typed")
    Files.createDirectories(db.resolve("snapshot"))
    Files.writeString(db.resolve("snapshot/_lsn"), "0")
    PgOutputDecoder.appendSegment(db, lines)
    val batch = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", "id INT")
      .option("rowSchema", "id INT, price DECIMAL(10,3), born DATE, y INT, " +
        "created BIGINT, updated TIMESTAMP, dur BIGINT, payload STRING, doc STRING")
      .load()
    val r7 = batch.filter(col("key.id") === 7).head()
      .getAs[org.apache.spark.sql.Row]("value").getAs[org.apache.spark.sql.Row]("after")
    assert(r7.getAs[java.math.BigDecimal]("price") ==
      new java.math.BigDecimal("1234.567"))
    assert(r7.getAs[java.sql.Date]("born").toLocalDate == born)
    assert(r7.getAs[java.sql.Timestamp]("updated").toInstant ==
      java.time.Instant.ofEpochSecond(1767139200L, 123456000L))
    assert(r7.getAs[Long]("created") == expectMicros)
    assert(r7.getAs[String]("doc") == """{"a":1,"b":"x","c":[true,null]}""")
    val r8 = batch.filter(col("key.id") === 8).head()
      .getAs[org.apache.spark.sql.Row]("value").getAs[org.apache.spark.sql.Row]("after")
    assert(r8.getAs[java.math.BigDecimal]("price") ==
      new java.math.BigDecimal("-0.012"))
    assert(r8.isNullAt(r8.fieldIndex("payload")))
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
