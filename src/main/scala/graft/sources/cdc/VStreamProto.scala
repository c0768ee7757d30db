package graft.sources.cdc

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Encoder for the Vitess VStream wire shapes [[VStreamDecoder]]
  * decodes — the public `binlogdata.proto` / `query.proto` layouts
  * (`VStreamResponse{events}`, `VEvent`, `FieldEvent`, `RowEvent`,
  * `RowChange`, `query.Field`, `query.Row` with packed sint64
  * lengths). One shared copy serves both the unit-spec byte fixtures
  * (VStreamSpec) and the driver-oracle replay fixture
  * (QueriesCdc.cdc21Db), so the encoding cannot silently diverge
  * between them. Fixture/replay support, not a production client —
  * the live session seam is [[ReplicationFeed]]. */
object VStreamProto {
  private def varint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def tag(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    varint(out, (field.toLong << 3) | wire)
  private def lenDelim(out: ByteArrayOutputStream, field: Int, bytes: Array[Byte]): Unit = {
    tag(out, field, 2); varint(out, bytes.length); out.write(bytes)
  }
  private def str(out: ByteArrayOutputStream, field: Int, s: String): Unit =
    lenDelim(out, field, s.getBytes(StandardCharsets.UTF_8))
  private def vint(out: ByteArrayOutputStream, field: Int, v: Long): Unit = {
    tag(out, field, 0); varint(out, v)
  }
  private def msg(f: ByteArrayOutputStream => Unit): Array[Byte] = {
    val out = new ByteArrayOutputStream(); f(out); out.toByteArray
  }
  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)

  /** query.Field { name=1, type=2, flags=10 }. */
  def field(name: String, isKey: Boolean): Array[Byte] = msg { o =>
    str(o, 1, name); vint(o, 2, 265 /* type code; unread by the decoder */)
    if (isKey) vint(o, 10, VStreamDecoder.PriKeyFlag)
  }

  /** query.Row { lengths=1 sint64 (packed or unpacked), values=2 } —
    * a None value encodes SQL NULL (length −1). */
  def row(values: Seq[Option[String]], packed: Boolean = true): Array[Byte] = msg { o =>
    val lens = values.map(_.map(_.getBytes(StandardCharsets.UTF_8).length.toLong).getOrElse(-1L))
    if (packed) {
      val p = new ByteArrayOutputStream()
      lens.foreach(l => varint(p, zigzag(l)))
      lenDelim(o, 1, p.toByteArray)
    } else lens.foreach(l => vint(o, 1, zigzag(l)))
    lenDelim(o, 2, values.flatten.mkString("").getBytes(StandardCharsets.UTF_8))
  }

  /** FIELD VEvent { type=1, field_event=6 { table_name=1, fields=2* } }. */
  def fieldEvent(table: String, fields: Array[Byte]*): Array[Byte] = msg { o =>
    vint(o, 1, VStreamDecoder.EventField)
    lenDelim(o, 6, msg { fe => str(fe, 1, table); fields.foreach(lenDelim(fe, 2, _)) })
  }

  /** ROW VEvent { type=1, row_event=5 { table_name=1, row_changes=2* } }. */
  def rowEvent(table: String, changes: Array[Byte]*): Array[Byte] = msg { o =>
    vint(o, 1, VStreamDecoder.EventRow)
    lenDelim(o, 5, msg { re => str(re, 1, table); changes.foreach(lenDelim(re, 2, _)) })
  }

  /** RowChange { before=1, after=2 } — after-only insert, both update,
    * before-only delete. */
  def change(before: Option[Array[Byte]], after: Option[Array[Byte]]): Array[Byte] =
    msg { o =>
      before.foreach(lenDelim(o, 1, _))
      after.foreach(lenDelim(o, 2, _))
    }

  /** A bookkeeping VEvent (BEGIN/COMMIT/VGTID/HEARTBEAT/...) the
    * decoder consumes silently; carries a gtid string at field 3. */
  def bookkeeping(eventType: Int): Array[Byte] = msg { o =>
    vint(o, 1, eventType); str(o, 3, "MySQL56/a-b-c:1-42")
  }

  /** VStreamResponse { events=1* } — one feed message. */
  def response(events: Array[Byte]*): Array[Byte] = msg { o =>
    events.foreach(lenDelim(o, 1, _))
  }
}
