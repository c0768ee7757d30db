package graft.sources.cdc

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Decoder for MySQL binary-log ROW events (binlog format v4, the wire
  * format documented in the MySQL manual's "Binary Log" / replication
  * protocol internals), emitting change envelopes into the same
  * [[CdcLayout]] contract as [[PgOutputDecoder]] and the polling
  * tailer.
  *
  * This is the MySQL half of the log-protocol seam (the reference
  * ships one connector per database —
  * debezium-server-dist/pom.xml:359-389): row-based replication events
  * carry the change shapes polling cannot observe — hard DELETEs, and
  * UPDATEs with FULL before images (`binlog_row_image=FULL`, the MySQL
  * default, puts the complete old row on the wire — richer than
  * Postgres' default replica identity).
  *
  * Supported events (type codes): FORMAT_DESCRIPTION 0x0f, QUERY 0x02,
  * XID 0x10, TABLE_MAP 0x13, WRITE_ROWS_v2 0x1e, UPDATE_ROWS_v2 0x1f,
  * DELETE_ROWS_v2 0x20; ROTATE/GTID/others are ignored bookkeeping.
  * Column types: TINY/SHORT/INT24/LONG/LONGLONG (1/2/9/3/8),
  * FLOAT/DOUBLE (4/5), VARCHAR/VAR_STRING (15/253, 1- or 2-byte
  * length per the TABLE_MAP metadata), and the logical-type surface
  * the reference maps per-sink (FlussTypeConverter.java:112-237):
  * DATE (10), YEAR (13), DATETIME2 (18), TIMESTAMP2 (17), TIME2 (19),
  * NEWDECIMAL (246), BLOB family (252, covers TINY/MEDIUM/LONG BLOB
  * and TEXT — the binlog collapses them all to 252 with a length-size
  * metadata byte), JSON (245, MySQL binary-JSON format). Envelope
  * renderings follow the reference's semantic types: DATE → epoch-days
  * number (io.debezium.time.Date), DATETIME2 → epoch-micros number
  * (MicroTimestamp — DATETIME is wall-clock, rendered as-if-UTC),
  * TIMESTAMP2 → ISO-8601 UTC string (ZonedTimestamp — TIMESTAMP is a
  * point in time), TIME2 → micros-of-day number (MicroTime),
  * NEWDECIMAL → bare decimal text (exact; same convention as
  * pgoutput's numeric pass-through), BLOB → base64 string (Connect
  * bytes), JSON → the serialized JSON text as a string
  * (io.debezium.data.Json). Checksums: the FORMAT_DESCRIPTION
  * checksum-algorithm byte is honored — when it declares CRC32, every
  * later event's 4-byte trailer is trimmed before parsing (contents
  * are not re-verified).
  *
  * The binlog carries NO column names (a live connector reads them
  * from information_schema at connect time, as the reference does via
  * its schema snapshot) — register each table's column names and key
  * columns with [[registerTable]] before feeding DML.
  *
  * LSN assignment mirrors [[PgOutputDecoder]]: a monotonic counter
  * seeded at construction, one step per ROW (one multi-row event emits
  * several envelopes). Event-header timestamps (epoch seconds) stamp
  * `ts_ms`.
  */
final class BinlogDecoder(startLsn: Long = 0L,
                          topicPrefix: String = "testc",
                          dbName: String = "db",
                          /** Emit a compaction tombstone (value=null)
                            * after every deleted row — the reference's
                            * `tombstones.on.delete` default. */
                          emitTombstones: Boolean = true) {
  import BinlogDecoder._

  private val tableMaps = mutable.Map.empty[Long, TableMap]
  private val columnRegistry = mutable.Map.empty[String, (Seq[String], Set[String])]
  private var lsn = startLsn
  private var checksummed = false

  def currentLsn: Long = lsn

  /** Register the column names (binlog order) and key columns for
    * `schema.table` — the information_schema lookup a live connector
    * performs. Must precede the first DML for the table. */
  def registerTable(qualified: String, columns: Seq[String], keyCols: Seq[String]): Unit =
    columnRegistry(qualified) = (columns, keyCols.toSet)

  /** Decode one binlog event (header + body, no magic prefix). Control
    * events update decoder state and return no envelopes; each ROW of
    * a DML event returns one envelope line. A truncated or malformed
    * event fails with the event type and length in the error (never a
    * bare buffer underflow) and emits nothing — the feed re-delivers
    * after the caller recovers. */
  def decode(event: Array[Byte]): Seq[String] =
    try decodeUnsafe(event)
    catch {
      case e: java.nio.BufferUnderflowException =>
        val t = if (event.length > 4) f"0x${event(4) & 0xff}%02x" else "?"
        throw new IllegalArgumentException(
          s"binlog: truncated event (type $t, ${event.length} bytes) — " +
          "frame boundary corrupted upstream", e)
      case e: IllegalArgumentException if e.getMessage != null &&
          e.getMessage.contains("newLimit") =>
        throw new IllegalArgumentException(
          s"binlog: event shorter than its declared CRC32 trailer (${event.length} bytes)", e)
    }

  private def decodeUnsafe(event: Array[Byte]): Seq[String] = {
    val buf = ByteBuffer.wrap(event).order(ByteOrder.LITTLE_ENDIAN)
    val tsMs = (buf.getInt.toLong & 0xffffffffL) * 1000L
    val eventType = buf.get() & 0xff
    buf.getInt // server_id
    buf.getInt // event_size
    buf.getInt // log_pos
    buf.getShort // flags
    // CRC32 trailer: declared by FORMAT_DESCRIPTION, present on every
    // later event — trim it so value parsing never reads into it
    if (checksummed && eventType != FormatDescription)
      buf.limit(buf.limit() - 4)
    eventType match {
      case FormatDescription =>
        // binlog_version(2) + server_version(50) + create_ts(4) +
        // header_len(1) + post-header lens (one per event type) +
        // [checksum_alg(1) + checksum(4)] since 5.6.1
        buf.position(buf.position() + 2 + 50 + 4 + 1)
        // remaining = per-event post-header lengths + checksum alg + crc
        if (buf.remaining() >= 5) {
          val alg = buf.get(buf.limit() - 5) & 0xff
          checksummed = alg == 1 // CRC32
        }
        Nil
      case Query | Xid | Rotate | Gtid | AnonymousGtid | PreviousGtids | Stop | Heartbeat =>
        Nil
      case TableMapEvent =>
        val tableId = uint48(buf)
        buf.getShort // flags
        val schema = lpString1(buf); buf.get() // NUL
        val table = lpString1(buf); buf.get() // NUL
        val ncols = lenenc(buf).toInt
        val types = Array.fill(ncols)(buf.get() & 0xff)
        val metaLen = lenenc(buf).toInt
        val metaEnd = buf.position() + metaLen
        val meta = types.map {
          case Varchar | VarString => buf.getShort.toInt & 0xffff // max length
          case Float_ | Double_ => buf.get() & 0xff // pack length
          case NewDecimal => // precision byte then scale byte, packed
            ((buf.get() & 0xff) << 8) | (buf.get() & 0xff)
          case DateTime2 | Timestamp2 | Time2 => buf.get() & 0xff // fsp
          case Blob | Json => buf.get() & 0xff // length-prefix width (1..4)
          case _ => 0
        }
        buf.position(metaEnd)
        val qualified = s"$schema.$table"
        val (names, keys) = columnRegistry.getOrElse(qualified,
          throw new IllegalStateException(
            s"binlog: TABLE_MAP for unregistered table $qualified — call registerTable " +
            "first (the binlog wire format carries no column names)"))
        require(names.size == ncols,
          s"binlog: $qualified registered ${names.size} columns, TABLE_MAP declares $ncols")
        tableMaps(tableId) = TableMap(schema, table, types, meta, names, keys)
        Nil
      case WriteRows | UpdateRows | DeleteRows =>
        val tableId = uint48(buf)
        buf.getShort // flags
        val extraLen = buf.getShort.toInt & 0xffff
        buf.position(buf.position() + math.max(extraLen - 2, 0))
        val tm = tableMaps.getOrElse(tableId, throw new IllegalStateException(
          s"binlog: ROWS event for unknown table id $tableId — TABLE_MAP not seen"))
        val ncols = lenenc(buf).toInt
        val present1 = bitmap(buf, ncols)
        val present2 = if (eventType == UpdateRows) bitmap(buf, ncols) else present1
        val out = mutable.ArrayBuffer.empty[String]
        while (buf.remaining() > 0) {
          eventType match {
            case WriteRows =>
              val row = readRow(buf, tm, present1)
              out += envelope(tm, "c", tsMs, before = None, after = Some(row), keyFrom = row)
            case DeleteRows =>
              val row = readRow(buf, tm, present1)
              out += envelope(tm, "d", tsMs, before = Some(row), after = None, keyFrom = row)
              if (emitTombstones) out += tombstone(tm, row)
            case UpdateRows =>
              val before = readRow(buf, tm, present1)
              val after = readRow(buf, tm, present2)
              def keyImage(t: Seq[(String, String)]) =
                t.filter { case (n, _) => tm.keyCols.contains(n) }.sortBy(_._1)
              if (keyImage(before).nonEmpty && keyImage(before) != keyImage(after)) {
                // primary-key UPDATE: Debezium semantics — retire the old
                // key (delete + tombstone) and create under the new key,
                // so compacted/upsert sinks never keep a stale row
                out += envelope(tm, "d", tsMs, before = Some(before), after = None,
                  keyFrom = before)
                if (emitTombstones) out += tombstone(tm, before)
                out += envelope(tm, "c", tsMs, before = None, after = Some(after),
                  keyFrom = after)
              } else
                out += envelope(tm, "u", tsMs, before = Some(before), after = Some(after),
                  keyFrom = after)
          }
        }
        out.toSeq
      case other => Nil // unknown bookkeeping events pass through silently
    }
  }

  /** Decode a whole event batch into envelope lines (order preserved). */
  def decodeAll(events: Seq[Array[Byte]]): Seq[String] = events.flatMap(decode)

  /** One row image: (column name → JSON literal) for columns present in
    * the bitmap; null-bitmap bits index PRESENT columns only. */
  private def readRow(buf: ByteBuffer, tm: TableMap, present: Array[Boolean]): Seq[(String, String)] = {
    val presentIdx = (0 until tm.types.length).filter(present)
    val nulls = bitmap(buf, presentIdx.size)
    presentIdx.zipWithIndex.map { case (col, pi) =>
      val name = tm.names(col)
      if (nulls(pi)) name -> "null"
      else name -> readValue(buf, tm.types(col), tm.meta(col))
    }
  }

  private def readValue(buf: ByteBuffer, typeCode: Int, meta: Int): String = typeCode match {
    case Tiny => (buf.get().toInt).toString
    case Short_ => buf.getShort.toInt.toString
    case Int24 =>
      val v = (buf.get() & 0xff) | ((buf.get() & 0xff) << 8) | (buf.get().toInt << 16)
      v.toString
    case Long_ => buf.getInt.toString
    case LongLong => buf.getLong.toString
    case Float_ => java.lang.Float.intBitsToFloat(buf.getInt).toString
    case Double_ => java.lang.Double.longBitsToDouble(buf.getLong).toString
    case Varchar | VarString =>
      val len = if (meta > 255) buf.getShort.toInt & 0xffff else buf.get() & 0xff
      val bytes = new Array[Byte](len); buf.get(bytes)
      jsonString(new String(bytes, StandardCharsets.UTF_8))
    case Date =>
      // 3 bytes LE packed: day(5) | month(4)<<5 | year<<9 → epoch days
      val v = leUint(buf, 3).toInt
      val (y, m, d) = (v >> 9, (v >> 5) & 0xf, v & 0x1f)
      if (v == 0) "null" // MySQL zero-date has no epoch rendering
      else java.time.LocalDate.of(y, m, d).toEpochDay.toString
    case Year => // stored 0 is MySQL's zero-year sentinel 0000, NOT 1900
      val y = buf.get() & 0xff
      (if (y == 0) 0 else 1900 + y).toString
    case DateTime2 =>
      // 5 bytes BE packed: sign(1) ym(17) day(5) hour(5) min(6) sec(6),
      // ym = year*13+month; fractional seconds follow per fsp
      val p = beUint(buf, 5)
      val micros = fracMicros(buf, meta)
      val ym = ((p >> 22) & 0x1ffff).toInt
      val dt = java.time.LocalDateTime.of(ym / 13, ym % 13, ((p >> 17) & 0x1f).toInt,
        ((p >> 12) & 0x1f).toInt, ((p >> 6) & 0x3f).toInt, (p & 0x3f).toInt)
      (dt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + micros).toString
    case Timestamp2 =>
      // 4 bytes BE epoch seconds + fractional per fsp → ISO-8601 UTC
      val sec = beUint(buf, 4)
      val micros = fracMicros(buf, meta)
      // Instant.toString always renders full seconds ("…T00:00:00Z"),
      // unlike OffsetDateTime which drops a zero seconds field
      jsonString(java.time.Instant.ofEpochSecond(sec, micros * 1000L).toString)
    case Time2 =>
      // One big-endian word over all 3+frac bytes, biased at
      // 0x800000<<8n (so negative times are a plain subtraction, frac
      // borrow included): top 24 bits pack hour(10) min(6) sec(6), the
      // low 8n bits the fractional value → signed micros of day
      val n = (meta + 1) / 2
      val signed = beUint(buf, 3 + n) - (0x800000L << (8 * n))
      val m = math.abs(signed)
      val fm = if (n == 0) 0L else (m & ((1L << (8 * n)) - 1)) * Array(1L, 10000L, 100L, 1L)(n)
      val tp = m >> (8 * n)
      val base = (((tp >> 12) & 0x3ff) * 3600L + ((tp >> 6) & 0x3f) * 60L + (tp & 0x3f)) * 1000000L
      (if (signed < 0) -(base + fm) else base + fm).toString
    case NewDecimal => decodeDecimal(buf, precision = meta >> 8, scale = meta & 0xff)
    case Blob =>
      val len = leUint(buf, meta).toInt
      val bytes = new Array[Byte](len); buf.get(bytes)
      jsonString(java.util.Base64.getEncoder.encodeToString(bytes))
    case Json =>
      val len = leUint(buf, meta).toInt
      val bytes = new Array[Byte](len); buf.get(bytes)
      jsonString(decodeBinaryJson(bytes))
    case other => throw new IllegalArgumentException(
      s"binlog: unsupported column type $other (supported: TINY/SHORT/INT24/LONG/" +
      "LONGLONG/FLOAT/DOUBLE/VARCHAR/VAR_STRING/DATE/YEAR/DATETIME2/TIMESTAMP2/" +
      "TIME2/NEWDECIMAL/BLOB/JSON)")
  }

  private def tombstone(tm: TableMap, keyFrom: Seq[(String, String)]): String = {
    val key = jsonObj(keyFrom.filter { case (n, _) => tm.keyCols.contains(n) })
    s"""{"destination":"$topicPrefix.${tm.schema}.${tm.table}","key":$key,""" +
      s""""value":null,"headers":{}}"""
  }

  private def envelope(tm: TableMap, op: String, tsMs: Long,
                       before: Option[Seq[(String, String)]],
                       after: Option[Seq[(String, String)]],
                       keyFrom: Seq[(String, String)]): String = {
    lsn += 1
    val key = jsonObj(keyFrom.filter { case (n, _) => tm.keyCols.contains(n) })
    s"""{"destination":"$topicPrefix.${tm.schema}.${tm.table}","key":$key,""" +
      s""""value":{"op":"$op","before":${before.fold("null")(jsonObj)},""" +
      s""""after":${after.fold("null")(jsonObj)},""" +
      s""""source":{"connector":"mysql","db":"$dbName","schema":"${tm.schema}",""" +
      s""""table":"${tm.table}","lsn":$lsn,"snapshot":"false","ts_ms":$tsMs},""" +
      s""""ts_ms":$tsMs},"headers":{}}"""
  }
}

object BinlogDecoder {
  // event type codes (binlog v4)
  val Query = 0x02; val Stop = 0x03; val Rotate = 0x04
  val FormatDescription = 0x0f; val Xid = 0x10; val Heartbeat = 0x1b
  val TableMapEvent = 0x13
  val WriteRows = 0x1e; val UpdateRows = 0x1f; val DeleteRows = 0x20
  val Gtid = 0x21; val AnonymousGtid = 0x22; val PreviousGtids = 0x23

  // column type codes
  val Tiny = 1; val Short_ = 2; val Long_ = 3; val Float_ = 4; val Double_ = 5
  val LongLong = 8; val Int24 = 9; val Varchar = 15; val VarString = 253
  val Date = 10; val Year = 13
  val Timestamp2 = 17; val DateTime2 = 18; val Time2 = 19
  val Json = 245; val NewDecimal = 246; val Blob = 252 // 252 covers all BLOB/TEXT widths

  final case class TableMap(schema: String, table: String,
                            types: Array[Int], meta: Array[Int],
                            names: Seq[String], keyCols: Set[String])

  /** MySQL length-encoded integer. */
  private def lenenc(buf: ByteBuffer): Long = (buf.get() & 0xff) match {
    case v if v < 0xfb => v.toLong
    case 0xfc => buf.getShort.toLong & 0xffffL
    case 0xfd => (buf.get() & 0xffL) | ((buf.get() & 0xffL) << 8) | ((buf.get() & 0xffL) << 16)
    case 0xfe => buf.getLong
    case v => throw new IllegalArgumentException(s"bad length-encoded int prefix $v")
  }

  /** 6-byte little-endian unsigned (table ids). */
  private def uint48(buf: ByteBuffer): Long =
    (0 until 6).map(i => (buf.get() & 0xffL) << (8 * i)).reduce(_ | _)

  /** 1-byte-length-prefixed string (TABLE_MAP schema/table names). */
  private def lpString1(buf: ByteBuffer): String = {
    val len = buf.get() & 0xff
    val b = new Array[Byte](len); buf.get(b)
    new String(b, StandardCharsets.UTF_8)
  }

  /** n-byte little-endian unsigned (BLOB/JSON length prefixes, DATE). */
  private def leUint(buf: ByteBuffer, n: Int): Long =
    (0 until n).foldLeft(0L)((acc, i) => acc | ((buf.get() & 0xffL) << (8 * i)))

  /** n-byte BIG-endian unsigned — the temporal2/decimal types are the
    * one corner of the binlog stored big-endian (memcmp-able keys). */
  private def beUint(buf: ByteBuffer, n: Int): Long =
    (0 until n).foldLeft(0L)((acc, _) => (acc << 8) | (buf.get() & 0xffL))

  /** Fractional-seconds tail of DATETIME2/TIMESTAMP2/TIME2: ceil(fsp/2)
    * bytes big-endian holding 2 digits per byte → microseconds. */
  private def fracMicros(buf: ByteBuffer, fsp: Int): Long = {
    val n = (fsp + 1) / 2
    if (n == 0) 0L else beUint(buf, n) * Array(1L, 10000L, 100L, 1L)(n)
  }

  /** Digits-to-bytes map for MySQL packed decimal (9 digits = 4 bytes,
    * partial groups use the minimal width). */
  private val Dig2Bytes = Array(0, 1, 1, 2, 2, 3, 3, 4, 4)

  /** MySQL NEWDECIMAL wire format → exact decimal text. Digits pack in
    * base-10^9 groups of 4 bytes big-endian, a leading/trailing partial
    * group in 1–4 bytes; the first byte's MSB is the sign (set =
    * positive) and NEGATIVE values store the one's complement of every
    * byte. */
  private[cdc] def decodeDecimal(buf: ByteBuffer, precision: Int, scale: Int): String = {
    val intg = precision - scale
    val intg0 = intg / 9; val intgx = intg % 9
    val frac0 = scale / 9; val fracx = scale % 9
    val n = intg0 * 4 + Dig2Bytes(intgx) + frac0 * 4 + Dig2Bytes(fracx)
    val b = new Array[Byte](n); buf.get(b)
    val positive = (b(0) & 0x80) != 0
    b(0) = (b(0) ^ 0x80).toByte
    if (!positive) (0 until n).foreach(i => b(i) = (~b(i)).toByte)
    var pos = 0
    def group(nBytes: Int): Long = {
      var v = 0L
      var i = 0
      while (i < nBytes) { v = (v << 8) | (b(pos) & 0xffL); pos += 1; i += 1 }
      v
    }
    val ints = new StringBuilder
    if (intgx > 0) ints.append(group(Dig2Bytes(intgx)).toString)
    (0 until intg0).foreach { _ =>
      val g = group(4)
      if (ints.isEmpty) ints.append(g.toString) else ints.append(f"$g%09d")
    }
    val intPart = ints.toString.dropWhile(_ == '0') match {
      case "" => "0"
      case s => s
    }
    val fracs = new StringBuilder
    (0 until frac0).foreach(_ => fracs.append(f"${group(4)}%09d"))
    if (fracx > 0) fracs.append(("%0" + fracx + "d").format(group(Dig2Bytes(fracx))))
    val sign = if (positive) "" else "-"
    if (scale == 0) s"$sign$intPart" else s"$sign$intPart.$fracs"
  }

  /** MySQL binary-JSON (what the binlog carries for JSON columns) →
    * serialized JSON text. Covers every scalar type and the SMALL
    * object/array containers; large containers (whole document ≥64 KiB)
    * are rejected loudly — typical CDC rows stay far below, and a
    * silent wrong decode would be worse than a fail-fast. */
  private[cdc] def decodeBinaryJson(bytes: Array[Byte]): String = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    jsonBinValue(buf.get() & 0xff, buf, bytes)
  }

  private def jsonBinValue(t: Int, buf: ByteBuffer, all: Array[Byte]): String = t match {
    case 0x00 | 0x02 => // small object / small array
      val isObj = t == 0x00
      val start = buf.position() // container offsets are relative to here
      val count = buf.getShort & 0xffff
      buf.getShort // total container size — length prefix already framed us
      val keys = if (isObj)
        (0 until count).map(_ => (buf.getShort & 0xffff, buf.getShort & 0xffff))
      else Seq.empty
      val vals = (0 until count).map(_ => (buf.get() & 0xff, buf.getShort & 0xffff))
      val keyStrs = keys.map { case (off, len) =>
        new String(all, start + off, len, StandardCharsets.UTF_8)
      }
      val valStrs = vals.map { case (vt, ov) =>
        vt match {
          // small containers inline literals and 16-bit ints in the
          // 2-byte offset slot
          case 0x04 => ov match { case 1 => "true"; case 2 => "false"; case _ => "null" }
          case 0x05 => ov.toShort.toString
          case 0x06 => ov.toString
          case _ =>
            val vb = ByteBuffer.wrap(all).order(ByteOrder.LITTLE_ENDIAN)
            vb.position(start + ov)
            jsonBinValue(vt, vb, all)
        }
      }
      if (isObj)
        keyStrs.zip(valStrs).map { case (k, v) => s"${jsonString(k)}:$v" }
          .mkString("{", ",", "}")
      else valStrs.mkString("[", ",", "]")
    case 0x01 | 0x03 => throw new IllegalArgumentException(
      "binlog JSON: large container (document ≥64 KiB) not supported")
    case 0x04 => (buf.get() & 0xff) match {
      case 1 => "true"; case 2 => "false"; case _ => "null"
    }
    case 0x05 => buf.getShort.toString
    case 0x06 => (buf.getShort & 0xffff).toString
    case 0x07 => buf.getInt.toString
    case 0x08 => (buf.getInt & 0xffffffffL).toString
    case 0x09 => buf.getLong.toString
    case 0x0a => java.lang.Long.toUnsignedString(buf.getLong)
    case 0x0b => buf.getDouble.toString
    case 0x0c => // utf8 string: varint length (7 bits/byte) then bytes
      var len = 0; var shift = 0; var b = 0x80
      while ((b & 0x80) != 0) {
        b = buf.get() & 0xff; len |= (b & 0x7f) << shift; shift += 7
      }
      val s = new Array[Byte](len); buf.get(s)
      jsonString(new String(s, StandardCharsets.UTF_8))
    case other => throw new IllegalArgumentException(
      f"binlog JSON: unsupported value type 0x$other%02x")
  }

  /** Little-endian bitmap over n slots → per-slot booleans. */
  private def bitmap(buf: ByteBuffer, n: Int): Array[Boolean] = {
    val bytes = new Array[Byte]((n + 7) / 8); buf.get(bytes)
    Array.tabulate(n)(i => (bytes(i / 8) & (1 << (i % 8))) != 0)
  }

  private def jsonString(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def jsonObj(fields: Seq[(String, String)]): String =
    fields.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
}
