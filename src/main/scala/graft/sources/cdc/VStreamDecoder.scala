package graft.sources.cdc

import scala.collection.mutable

/** Vitess VStream capture decoder — the gRPC-streamed replication
  * surface of a Vitess cluster (reference connector matrix:
  * debezium-server-dist/pom.xml:848, `debezium-connector-vitess`).
  * A VStream session delivers `VStreamResponse` protobuf messages
  * (public `binlogdata.proto`), each carrying a batch of `VEvent`s:
  *
  *  - `FIELD` events announce a table's column list (`FieldEvent`:
  *    table name + `query.Field` descriptors with MySQL column
  *    flags) — the VStream analog of the binlog TABLE_MAP;
  *  - `ROW` events carry the data (`RowEvent`: per-row `RowChange`
  *    with optional `before`/`after` `query.Row` images — after-only
  *    = insert, both = update with FULL before image, before-only =
  *    hard delete);
  *  - `BEGIN`/`COMMIT`/`VGTID`/`HEARTBEAT`/... are transaction and
  *    liveness bookkeeping, consumed silently.
  *
  * `query.Row` is the MySQL textual result encoding: packed sint64
  * `lengths` (−1 = SQL NULL) slicing one concatenated `values` blob.
  *
  * Each feed message ([[ReplicationFeed]]) is one serialized
  * `VStreamResponse`; the decoder is a pure function message →
  * envelope lines with in-order LSN assignment, exactly like
  * [[BinlogDecoder]] / [[PgOutputDecoder]].
  *
  * Key columns come from the `PRI_KEY` bit of each field's MySQL
  * column flags (`query.Field.flags`); [[registerKeys]] overrides
  * for tables whose upstream doesn't mark keys. A ROW event for a
  * table with neither fails loudly — mis-keyed envelopes corrupt
  * upsert sinks silently.
  */
final class VStreamDecoder(startLsn: Long = 0L,
                           topicPrefix: String = "testc",
                           dbName: String = "db",
                           /** Compaction tombstone after each delete —
                             * `tombstones.on.delete` default. */
                           emitTombstones: Boolean = true) {
  import VStreamDecoder._

  private var lsn = startLsn
  def currentLsn: Long = lsn

  /** table → (column names in field order, key column names). */
  private val tables = mutable.Map.empty[String, (Seq[String], Set[String])]
  private val keyOverrides = mutable.Map.empty[String, Set[String]]

  /** Override the key columns for `keyspace.table` when the upstream
    * field flags don't carry PRI_KEY. Must precede the table's first
    * ROW event. */
  def registerKeys(qualified: String, keyCols: Seq[String]): Unit =
    keyOverrides(qualified) = keyCols.toSet

  /** Decode one VStreamResponse message. Bookkeeping events update
    * decoder state and return no envelopes; each RowChange of a ROW
    * event returns one envelope line. Malformed bytes fail with
    * context (never a bare index error) and emit nothing — the feed
    * re-delivers after the caller recovers. */
  def decode(message: Array[Byte]): Seq[String] =
    try decodeUnsafe(message)
    catch {
      case e: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException(
          s"vstream: truncated response (${message.length} bytes) — " +
          "frame boundary corrupted upstream", e)
    }

  def decodeAll(messages: Seq[Array[Byte]]): Seq[String] = messages.flatMap(decode)

  private def decodeUnsafe(message: Array[Byte]): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    // VStreamResponse { repeated VEvent events = 1; }
    fields(message) { (no, wire, r) =>
      if (no == 1 && wire == 2) decodeEvent(r.lenDelim(), out)
      else r.skip(wire)
    }
    out.toSeq
  }

  private def decodeEvent(event: Array[Byte], out: mutable.ArrayBuffer[String]): Unit = {
    var eventType = 0
    var rowEvent: Option[Array[Byte]] = None
    var fieldEvent: Option[Array[Byte]] = None
    fields(event) { (no, wire, r) =>
      no match {
        case 1 if wire == 0 => eventType = r.varint().toInt
        case 5 if wire == 2 => rowEvent = Some(r.lenDelim())
        case 6 if wire == 2 => fieldEvent = Some(r.lenDelim())
        case _              => r.skip(wire) // gtid/statement/vgtid/keyspace/…
      }
    }
    eventType match {
      case EventField => fieldEvent.foreach(decodeFieldEvent)
      case EventRow   => rowEvent.foreach(decodeRowEvent(_, out))
      case _          => () // BEGIN/COMMIT/GTID/VGTID/HEARTBEAT/DDL/…
    }
  }

  /** FieldEvent { string table_name = 1; repeated query.Field fields = 2; } */
  private def decodeFieldEvent(body: Array[Byte]): Unit = {
    var tableName = ""
    val cols = mutable.ArrayBuffer.empty[(String, Boolean)] // (name, isKey)
    fields(body) { (no, wire, r) =>
      no match {
        case 1 if wire == 2 => tableName = r.string()
        case 2 if wire == 2 =>
          // query.Field { string name = 1; …; uint32 flags = 10; }
          var name = ""; var flags = 0L
          fields(r.lenDelim()) { (fno, fwire, fr) =>
            fno match {
              case 1 if fwire == 2  => name = fr.string()
              case 10 if fwire == 0 => flags = fr.varint()
              case _                => fr.skip(fwire)
            }
          }
          cols += ((name, (flags & PriKeyFlag) != 0L))
        case _ => r.skip(wire)
      }
    }
    require(tableName.nonEmpty, "vstream: FIELD event without table_name")
    val flagged = cols.collect { case (n, true) => n }.toSet
    val keys = keyOverrides.getOrElse(tableName,
      if (flagged.nonEmpty) flagged
      else throw new IllegalArgumentException(
        s"vstream: no PRI_KEY flag on any field of $tableName and no " +
        s"registerKeys override — mis-keyed envelopes corrupt upsert sinks silently"))
    tables(tableName) = (cols.map(_._1).toSeq, keys)
  }

  /** RowEvent { string table_name = 1; repeated RowChange row_changes = 2; } */
  private def decodeRowEvent(body: Array[Byte], out: mutable.ArrayBuffer[String]): Unit = {
    var tableName = ""
    val changes = mutable.ArrayBuffer.empty[Array[Byte]]
    fields(body) { (no, wire, r) =>
      no match {
        case 1 if wire == 2 => tableName = r.string()
        case 2 if wire == 2 => changes += r.lenDelim()
        case _              => r.skip(wire)
      }
    }
    val (colNames, keyCols) = tables.getOrElse(tableName,
      throw new IllegalArgumentException(
        s"vstream: ROW event for $tableName before its FIELD event"))
    val (schema, table) = tableName.split("\\.", 2) match {
      case Array(ks, t) => (ks, t)
      case _            => (dbName, tableName)
    }
    changes.foreach { change =>
      // RowChange { query.Row before = 1; query.Row after = 2; }
      var before: Option[Seq[(String, String)]] = None
      var after: Option[Seq[(String, String)]] = None
      fields(change) { (no, wire, r) =>
        no match {
          case 1 if wire == 2 => before = Some(decodeRow(r.lenDelim(), colNames))
          case 2 if wire == 2 => after = Some(decodeRow(r.lenDelim(), colNames))
          case _              => r.skip(wire)
        }
      }
      val op = (before, after) match {
        case (None, Some(_))    => "c"
        case (Some(_), Some(_)) => "u"
        case (Some(_), None)    => "d"
        case (None, None) => throw new IllegalArgumentException(
          s"vstream: RowChange for $tableName with neither image")
      }
      val keyFrom = after.orElse(before).get
      lsn += 1
      val key = jsonObj(keyFrom.filter { case (n, _) => keyCols.contains(n) })
      out += s"""{"destination":"$topicPrefix.$schema.$table","key":$key,""" +
        s""""value":{"op":"$op","before":${before.fold("null")(jsonObj)},""" +
        s""""after":${after.fold("null")(jsonObj)},""" +
        s""""source":{"connector":"vitess","db":"$dbName","schema":"$schema",""" +
        s""""table":"$table","lsn":$lsn,"snapshot":"false","ts_ms":0},""" +
        s""""ts_ms":0},"headers":{}}"""
      if (op == "d" && emitTombstones)
        out += s"""{"destination":"$topicPrefix.$schema.$table","key":$key,""" +
          s""""value":null,"headers":{}}"""
    }
  }

  /** query.Row { repeated sint64 lengths = 1; bytes values = 2; } —
    * the MySQL textual row encoding: each length slices the next
    * value out of the blob, −1 is SQL NULL. */
  private def decodeRow(body: Array[Byte], colNames: Seq[String]): Seq[(String, String)] = {
    val lengths = mutable.ArrayBuffer.empty[Long]
    var values: Array[Byte] = Array.empty
    fields(body) { (no, wire, r) =>
      no match {
        case 1 if wire == 2 => // packed sint64s
          val packed = r.lenDelim()
          val pr = new Reader(packed)
          while (pr.more) lengths += zigzag(pr.varint())
        case 1 if wire == 0 => lengths += zigzag(r.varint()) // unpacked
        case 2 if wire == 2 => values = r.lenDelim()
        case _              => r.skip(wire)
      }
    }
    require(lengths.size == colNames.size,
      s"vstream: row has ${lengths.size} lengths but table has ${colNames.size} columns")
    var off = 0
    colNames.zip(lengths).map { case (name, len) =>
      if (len < 0) name -> null
      else {
        val v = new String(values, off, len.toInt, java.nio.charset.StandardCharsets.UTF_8)
        off += len.toInt
        name -> v
      }
    }
  }

  private def jsonObj(cols: Seq[(String, String)]): String =
    cols.map { case (n, v) =>
      s""""$n":${if (v == null) "null" else CdcJson.value(v)}"""
    }.mkString("{", ",", "}")
}

object VStreamDecoder {
  /** VEventType values used here (binlogdata.proto). */
  val EventRow = 12
  val EventField = 13
  /** MySQL PRI_KEY column flag (query.Field.flags). */
  val PriKeyFlag = 0x2L

  private def zigzag(n: Long): Long = (n >>> 1) ^ -(n & 1L)

  /** Minimal protobuf wire reader over one message's bytes. */
  private final class Reader(bytes: Array[Byte]) {
    private var pos = 0
    def more: Boolean = pos < bytes.length
    def varint(): Long = {
      var shift = 0; var acc = 0L; var b = 0
      do { b = bytes(pos) & 0xff; pos += 1; acc |= (b & 0x7fL) << shift; shift += 7 }
      while ((b & 0x80) != 0)
      acc
    }
    def lenDelim(): Array[Byte] = {
      val len = varint().toInt
      require(len >= 0 && pos + len <= bytes.length,
        s"vstream: declared length $len overruns the ${bytes.length}-byte message")
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
      pos += len
      out
    }
    def string(): String = new String(lenDelim(), java.nio.charset.StandardCharsets.UTF_8)
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => pos += 8
      case 2 => lenDelim(); ()
      case 5 => pos += 4
      case other => throw new IllegalArgumentException(s"vstream: wire type $other")
    }
  }

  /** Iterate a message's (fieldNumber, wireType) entries; the handler
    * MUST consume the value via the reader (or call skip). */
  private def fields(bytes: Array[Byte])(f: (Int, Int, Reader) => Unit): Unit = {
    val r = new Reader(bytes)
    while (r.more) {
      val tag = r.varint()
      f((tag >>> 3).toInt, (tag & 7).toInt, r)
    }
  }
}
