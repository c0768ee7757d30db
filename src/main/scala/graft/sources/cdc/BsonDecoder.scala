package graft.sources.cdc

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Minimal clean-room BSON parser (the public BSON spec,
  * bsonspec.org — little-endian framing, type-byte + cstring-name
  * elements) covering the types a MongoDB change-stream event
  * carries. Unsupported element types fail loudly with the field name
  * and type byte — a silently mis-decoded value is worse than a
  * fail-fast (the same policy as [[BinlogDecoder]]'s unsupported
  * column types and [[PgOutputDecoder.binaryJsonOf]]).
  */
object Bson {

  sealed trait BVal { def json: String }
  final case class BDoc(fields: Vector[(String, BVal)]) extends BVal {
    def json: String =
      fields.map { case (k, v) => s""""${esc(k)}":${v.json}""" }.mkString("{", ",", "}")
    def get(name: String): Option[BVal] = fields.collectFirst { case (`name`, v) => v }
    def doc(name: String): Option[BDoc] = get(name).collect { case d: BDoc => d }
    def str(name: String): Option[String] = get(name).collect { case BStr(s) => s }
  }
  final case class BArr(items: Vector[BVal]) extends BVal {
    def json: String = items.map(_.json).mkString("[", ",", "]")
  }
  final case class BStr(s: String) extends BVal { def json = s""""${esc(s)}"""" }
  final case class BDouble(d: Double) extends BVal {
    def json: String =
      if (d.isNaN || d.isInfinite) s""""${if (d.isNaN) "NaN" else if (d > 0) "Infinity" else "-Infinity"}""""
      else if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
  }
  final case class BInt32(i: Int) extends BVal { def json = i.toString }
  final case class BInt64(l: Long) extends BVal { def json = l.toString }
  final case class BBool(b: Boolean) extends BVal { def json = b.toString }
  case object BNull extends BVal { def json = "null" }
  /** 12-byte ObjectId, rendered as the canonical 24-hex string. */
  final case class BObjectId(hex: String) extends BVal { def json = s""""$hex"""" }
  /** UTC datetime: int64 millis since epoch → ISO-8601 instant text
    * (Instant.toString always renders the seconds field, unlike
    * OffsetDateTime). */
  final case class BDateTime(ms: Long) extends BVal {
    def json = s""""${java.time.Instant.ofEpochMilli(ms)}""""
  }
  /** Internal replication timestamp: (seconds, increment). */
  final case class BTimestamp(t: Int, i: Int) extends BVal {
    def json = s"""{"t":$t,"i":$i}"""
  }
  final case class BBinary(bytes: Array[Byte], subtype: Byte) extends BVal {
    def json = s""""${java.util.Base64.getEncoder.encodeToString(bytes)}""""
  }

  private[cdc] def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Parse one top-level document. */
  def parse(bytes: Array[Byte]): BDoc = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val d = parseDoc(buf)
    d
  }

  private def parseDoc(buf: ByteBuffer): BDoc = {
    val start = buf.position()
    val len = buf.getInt // total bytes including this int32 and the trailing 0x00
    val fields = Vector.newBuilder[(String, BVal)]
    var t = buf.get()
    while (t != 0) {
      val name = cstring(buf)
      fields += name -> element(buf, t, name)
      t = buf.get()
    }
    require(buf.position() - start == len,
      s"bson: document length mismatch (declared $len, consumed ${buf.position() - start})")
    BDoc(fields.result())
  }

  private def element(buf: ByteBuffer, t: Byte, name: String): BVal = t match {
    case 0x01 => BDouble(buf.getDouble)
    case 0x02 => BStr(lpString(buf))
    case 0x03 => parseDoc(buf)
    case 0x04 => BArr(parseDoc(buf).fields.map(_._2)) // array = doc with "0","1",… keys
    case 0x05 =>
      val n = buf.getInt; val sub = buf.get()
      val b = new Array[Byte](n); buf.get(b); BBinary(b, sub)
    case 0x07 =>
      val b = new Array[Byte](12); buf.get(b)
      BObjectId(b.map(x => f"${x & 0xff}%02x").mkString)
    case 0x08 => BBool(buf.get() != 0)
    case 0x09 => BDateTime(buf.getLong)
    case 0x0A => BNull
    case 0x10 => BInt32(buf.getInt)
    case 0x11 => // timestamp: low 32 bits increment, high 32 seconds
      val v = buf.getLong
      BTimestamp((v >>> 32).toInt, (v & 0xffffffffL).toInt)
    case 0x12 => BInt64(buf.getLong)
    case other => throw new IllegalArgumentException(
      f"bson: unsupported element type 0x$other%02x for field '$name' — extend Bson.element")
  }

  /** int32-length-prefixed UTF-8 string (length includes the trailing
    * NUL). */
  private def lpString(buf: ByteBuffer): String = {
    val n = buf.getInt
    val b = new Array[Byte](n - 1); buf.get(b)
    require(buf.get() == 0, "bson: string missing NUL terminator")
    new String(b, StandardCharsets.UTF_8)
  }

  /** NUL-terminated UTF-8 element name — bytes accumulated, decoded
    * once (same multibyte-safety rule as PgOutputDecoder.cstring). */
  private def cstring(buf: ByteBuffer): String = {
    val out = new java.io.ByteArrayOutputStream(16)
    var b = buf.get()
    while (b != 0) { out.write(b.toInt); b = buf.get() }
    new String(out.toByteArray, StandardCharsets.UTF_8)
  }
}

/** Decoder for MongoDB CHANGE STREAM events (the document-database
  * connector family of the reference's matrix —
  * debezium-server-dist/pom.xml:359-389 ships a MongoDbConnector; its
  * event shape is the public change-stream document: operationType /
  * ns / documentKey / fullDocument / fullDocumentBeforeChange /
  * clusterTime / wallTime). Each feed message is ONE BSON change
  * event; envelopes land in the same [[CdcLayout]] the DSv2 source
  * reads, so offsets, include lists, pushed filters, and the upsert
  * sink are unchanged.
  *
  * Schema adaptation (deliberately different from the reference's
  * render-the-document-to-a-JSON-string contract): documents are
  * schemaless, so `before`/`after` carry the document AS AN OBJECT
  * and the reader's declared `rowSchema` projects it at scan time —
  * fields outside the schema drop, absent fields read as null. That
  * is the Spark-first equivalent of Debezium-MongoDB's string
  * payload: the projection moves to the (pushdown-capable) scan
  * instead of a downstream JSON re-parse.
  *
  * Op mapping: insert → 'c'; update/replace → 'u' (an update's
  * `after` is the post-image when the stream was opened with
  * fullDocument=updateLookup — absent post-image leaves after=null);
  * delete → 'd' + compaction tombstone. `fullDocumentBeforeChange`
  * (Mongo 6.0 pre-images) supplies the before image when present;
  * a delete without one falls back to the documentKey, the key-only
  * before image — exactly the pgoutput default-identity convention.
  * Keys: `key` = {"id": <_id>} (the reference's key field name).
  * drop/rename/invalidate events update no table state and emit
  * nothing. ts_ms: wallTime (millis) when present, else
  * clusterTime.t seconds. LSN: monotonic counter, like the other
  * decoders.
  */
final class MongoChangeStreamDecoder(startLsn: Long = 0L,
                                     topicPrefix: String = "testc",
                                     emitTombstones: Boolean = true) {
  import Bson._

  private var lsn = startLsn
  def currentLsn: Long = lsn

  def decode(msg: Array[Byte]): Seq[String] = {
    val ev = Bson.parse(msg)
    val opType = ev.str("operationType").getOrElse(
      throw new IllegalArgumentException("change stream event missing operationType"))
    opType match {
      case "insert" | "update" | "replace" | "delete" =>
        val ns = ev.doc("ns").getOrElse(
          throw new IllegalArgumentException(s"$opType event missing ns"))
        val db = ns.str("db").getOrElse("db")
        val coll = ns.str("coll").getOrElse(
          throw new IllegalArgumentException(s"$opType event missing ns.coll"))
        val docKey = ev.doc("documentKey").getOrElse(
          throw new IllegalArgumentException(s"$opType event missing documentKey"))
        val id = docKey.get("_id").getOrElse(
          throw new IllegalArgumentException(s"$opType event documentKey missing _id"))
        val tsMs = ev.get("wallTime").collect { case BDateTime(ms) => ms }
          .orElse(ev.get("clusterTime").collect { case BTimestamp(t, _) => t * 1000L })
          .getOrElse(0L)
        val full = ev.doc("fullDocument")
        val pre = ev.doc("fullDocumentBeforeChange")
        val (op, before, after) = opType match {
          case "insert" => ("c", None, full)
          case "update" | "replace" => ("u", pre, full)
          case "delete" => ("d", pre.orElse(Some(docKey)), None)
        }
        val env = envelope(db, coll, op, id, before, after, tsMs)
        if (op == "d" && emitTombstones) Seq(env, tombstone(db, coll, id)) else Seq(env)
      case _ => Nil // drop / rename / dropDatabase / invalidate: no row state
    }
  }

  def decodeAll(msgs: Seq[Array[Byte]]): Seq[String] = msgs.flatMap(decode)

  private def tombstone(db: String, coll: String, id: BVal): String =
    s"""{"destination":"$topicPrefix.$db.$coll","key":{"id":${id.json}},""" +
      s""""value":null,"headers":{}}"""

  private def envelope(db: String, coll: String, op: String, id: BVal,
                       before: Option[BDoc], after: Option[BDoc],
                       tsMs: Long): String = {
    lsn += 1
    s"""{"destination":"$topicPrefix.$db.$coll","key":{"id":${id.json}},""" +
      s""""value":{"op":"$op","before":${before.fold("null")(_.json)},""" +
      s""""after":${after.fold("null")(_.json)},""" +
      s""""source":{"connector":"mongodb","db":"$db","schema":"$db",""" +
      s""""table":"$coll","lsn":$lsn,"snapshot":"false","ts_ms":$tsMs},""" +
      s""""ts_ms":$tsMs},"headers":{}}"""
  }
}
