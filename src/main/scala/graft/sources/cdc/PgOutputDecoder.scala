package graft.sources.cdc

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}
import scala.collection.mutable

/** Decoder for the PostgreSQL logical-replication `pgoutput` binary
  * message format (protocol version 1; the wire format is documented
  * in the PostgreSQL manual, "Logical Replication Message Formats"),
  * emitting change envelopes into the SAME on-disk [[CdcLayout]]
  * contract the DSv2 `graft-cdc` source reads and the
  * [[JdbcPollingTailer]] writes.
  *
  * This closes the declared JDBC-polling capture boundary: the log
  * protocol carries HARD deletes and BEFORE images, which no
  * watermark-polling scheme can observe (the reference selects a
  * protocol-decoding connector per database —
  * debezium-server-dist/pom.xml:359-389; the polling tailer documents
  * the drop-in seam). The decoder is a pure byte→envelope function
  * over a replication slot's message stream: feed it the messages a
  * `START_REPLICATION ... (proto_version '1', publication_names ...)`
  * session yields, append the lines as WAL segments, and everything
  * downstream (LSN offsets, include lists, pushed filters, upsert
  * sink) is unchanged.
  *
  * Supported messages: Begin 'B', Commit 'C', Origin 'O', Relation
  * 'R', Type 'Y', Insert 'I', Update 'U', Delete 'D', Truncate 'T'.
  * Tuple columns arrive in text form ('t'); 'n' is SQL NULL; 'u'
  * (unchanged TOAST value, excluded from the old/new image) renders
  * as the sentinel string `__graft_unavailable_value` — the same
  * convention the reference uses for unavailable TOAST columns.
  *
  * Replica-identity fidelity:
  *  - DELETE with an 'O' old-tuple (REPLICA IDENTITY FULL) → op='d'
  *    with the complete before image;
  *  - DELETE with a 'K' key-tuple (default identity) → op='d' with a
  *    key-only before image — exactly what the server retains;
  *  - UPDATE carries a before image only when the old tuple is on the
  *    wire ('K'/'O'); otherwise before=null (default identity).
  *
  * LSN assignment: every DML message takes the next value of a
  * monotonic counter seeded at construction — the layout's total
  * order. (A live deployment would use the server byte LSN; the
  * counter keeps fixture segments contiguous with tailer segments.)
  * Commit timestamps convert from PostgreSQL microseconds-since-2000
  * to epoch millis and stamp each envelope's `ts_ms`.
  */
final class PgOutputDecoder(startLsn: Long = 0L,
                            topicPrefix: String = "testc",
                            dbName: String = "db",
                            /** Emit a compaction tombstone (value=null)
                              * after every DELETE — the reference's
                              * `tombstones.on.delete` default; KV/compacted
                              * sinks drop the key on it. Tombstones carry
                              * no LSN (they anchor to their predecessor's
                              * position, like heartbeats). */
                            emitTombstones: Boolean = true) {
  import PgOutputDecoder._

  private val relations = mutable.Map.empty[Int, Relation]
  private var lsn = startLsn
  private var commitTsMs = 0L

  /** LSN of the most recently emitted change (== startLsn before any). */
  def currentLsn: Long = lsn

  /** Decode one pgoutput message. Control messages (Begin/Commit/
    * Relation/Type/Origin/Truncate) update decoder state and return
    * no envelopes; DML messages return exactly one envelope line. A
    * truncated or malformed frame fails with the message type and
    * length in the error (never a bare buffer underflow) and leaves no
    * partial output — the feed re-delivers after the caller recovers. */
  def decode(msg: Array[Byte]): Seq[String] =
    try decodeUnsafe(msg)
    catch {
      case e: java.nio.BufferUnderflowException =>
        throw new IllegalArgumentException(
          s"pgoutput: truncated '${if (msg.nonEmpty) msg(0).toChar else '?'}' message " +
          s"(${msg.length} bytes) — frame boundary corrupted upstream", e)
    }

  private def decodeUnsafe(msg: Array[Byte]): Seq[String] = {
    val buf = ByteBuffer.wrap(msg) // pgoutput is big-endian, ByteBuffer's default
    buf.get().toChar match {
      case 'B' => // final LSN (8), commit ts (8, micros since 2000), xid (4)
        buf.getLong
        commitTsMs = pgMicrosToEpochMs(buf.getLong)
        Nil
      case 'C' => Nil // flags, commit LSN, end LSN, ts — stream position bookkeeping
      case 'O' => Nil // replication origin — single-origin capture ignores it
      case 'Y' => Nil // type metadata — the JSON envelope carries text values
      case 'T' => Nil // truncate — no row-level envelopes (reference parity: off by default)
      case 'R' =>
        val oid = buf.getInt
        val namespace = cstring(buf)
        val name = cstring(buf)
        val replicaIdentity = buf.get().toChar
        val ncols = buf.getShort.toInt
        val cols = (0 until ncols).map { _ =>
          val flags = buf.get()
          Column(cstring(buf), buf.getInt, typmod = buf.getInt, keyPart = (flags & 1) != 0)
        }
        relations(oid) = Relation(oid, namespace, name, replicaIdentity, cols)
        Nil
      case 'I' =>
        val rel = relation(buf.getInt)
        require(buf.get().toChar == 'N', "pgoutput INSERT must carry a new tuple")
        val after = tuple(buf, rel)
        Seq(envelope(rel, "c", before = None, after = Some(after), keyFrom = after))
      case 'U' =>
        val rel = relation(buf.getInt)
        val tag = buf.get().toChar
        val (old, newTag) = tag match {
          case 'K' | 'O' => (Some(tuple(buf, rel)), buf.get().toChar)
          case t => (None, t)
        }
        require(newTag == 'N', s"pgoutput UPDATE: expected new tuple, got '$newTag'")
        val after = tuple(buf, rel)
        val keyCols = rel.columns.filter(_.keyPart).map(_.name).toSet
        def keyImage(t: Seq[(String, String)]) =
          t.filter { case (n, _) => keyCols(n) }.sortBy(_._1)
        old match {
          case Some(o) if keyImage(o).nonEmpty && keyImage(o) != keyImage(after) =>
            // primary-key UPDATE (the server only sends the old tuple
            // when the replica identity changed): Debezium semantics —
            // retire the old key (delete + tombstone) and create the row
            // under the new key, so compacted/upsert sinks never keep a
            // stale row under the old key (reference:
            // debezium-core key-change handling in RelationalChangeRecordEmitter)
            val del = envelope(rel, "d", before = Some(o), after = None, keyFrom = o)
            val cre = envelope(rel, "c", before = None, after = Some(after), keyFrom = after)
            if (emitTombstones) Seq(del, tombstone(rel, o), cre) else Seq(del, cre)
          case _ =>
            Seq(envelope(rel, "u", before = old, after = Some(after), keyFrom = after))
        }
      case 'D' =>
        val rel = relation(buf.getInt)
        val tag = buf.get().toChar
        require(tag == 'K' || tag == 'O', s"pgoutput DELETE: expected old/key tuple, got '$tag'")
        val old = tuple(buf, rel)
        val del = envelope(rel, "d", before = Some(old), after = None, keyFrom = old)
        if (emitTombstones) Seq(del, tombstone(rel, old)) else Seq(del)
      case other =>
        throw new IllegalArgumentException(s"unknown pgoutput message type '$other'")
    }
  }

  /** Decode a whole message batch into envelope lines (order preserved). */
  def decodeAll(msgs: Seq[Array[Byte]]): Seq[String] = msgs.flatMap(decode)

  private def relation(oid: Int): Relation = relations.getOrElse(oid,
    throw new IllegalStateException(
      s"pgoutput: DML for unknown relation $oid — Relation message not seen (new slot or " +
      "decoder restart: the server re-sends Relation before the first DML per connection)"))

  /** TupleData → (column name → JSON-rendered value), only for columns
    * present on the wire ('n' null, 'u' toast sentinel, 't' text). */
  private def tuple(buf: ByteBuffer, rel: Relation): Seq[(String, String)] = {
    val ncols = buf.getShort.toInt
    (0 until ncols).flatMap { i =>
      val col = rel.columns(i)
      buf.get().toChar match {
        case 'n' => Some(col.name -> "null")
        case 'u' => Some(col.name -> "\"__graft_unavailable_value\"")
        case 't' =>
          val bytes = new Array[Byte](buf.getInt)
          buf.get(bytes)
          Some(col.name -> jsonOf(new String(bytes, StandardCharsets.UTF_8), col.typeOid))
        case other =>
          throw new IllegalArgumentException(s"unknown tuple column tag '$other'")
      }
    }
  }

  private def tombstone(rel: Relation, keyFrom: Seq[(String, String)]): String = {
    val keyCols = rel.columns.filter(_.keyPart).map(_.name).toSet
    val key = jsonObj(keyFrom.filter { case (n, _) => keyCols.contains(n) })
    s"""{"destination":"$topicPrefix.${rel.namespace}.${rel.name}","key":$key,""" +
      s""""value":null,"headers":{}}"""
  }

  private def envelope(rel: Relation, op: String,
                       before: Option[Seq[(String, String)]],
                       after: Option[Seq[(String, String)]],
                       keyFrom: Seq[(String, String)]): String = {
    lsn += 1
    val keyCols = rel.columns.filter(_.keyPart).map(_.name).toSet
    val key = jsonObj(keyFrom.filter { case (n, _) => keyCols.contains(n) })
    s"""{"destination":"$topicPrefix.${rel.namespace}.${rel.name}","key":$key,""" +
      s""""value":{"op":"$op","before":${before.fold("null")(jsonObj)},""" +
      s""""after":${after.fold("null")(jsonObj)},""" +
      s""""source":{"connector":"postgresql","db":"$dbName","schema":"${rel.namespace}",""" +
      s""""table":"${rel.name}","lsn":$lsn,"snapshot":"false","ts_ms":$commitTsMs},""" +
      s""""ts_ms":$commitTsMs},"headers":{}}"""
  }
}

object PgOutputDecoder {
  final case class Column(name: String, typeOid: Int, typmod: Int, keyPart: Boolean)
  final case class Relation(oid: Int, namespace: String, name: String,
                            replicaIdentity: Char, columns: Seq[Column])

  /** PostgreSQL epoch (2000-01-01T00:00:00Z) in Unix epoch millis. */
  private val PgEpochMs = 946684800000L
  private def pgMicrosToEpochMs(micros: Long): Long = micros / 1000L + PgEpochMs

  /** NUL-terminated identifier. PostgreSQL sends UTF-8 — accumulate the
    * raw bytes and decode ONCE (per-byte toChar would decode Latin-1
    * and garble multibyte schema/table/column names). */
  private def cstring(buf: ByteBuffer): String = {
    val out = new java.io.ByteArrayOutputStream(32)
    var b = buf.get()
    while (b != 0) { out.write(b.toInt); b = buf.get() }
    new String(out.toByteArray, StandardCharsets.UTF_8)
  }

  /** Text-form value → JSON literal, by type OID: integers/floats/
    * numeric pass through as numbers, bool 't'/'f' maps to JSON
    * booleans, everything else is an escaped string (timestamps,
    * uuids, text — the envelope schema downstream types them). */
  private def jsonOf(text: String, typeOid: Int): String = typeOid match {
    case 16 => if (text == "t") "true" else "false"
    case 20 | 21 | 23 | 26 => text // int8/int2/int4/oid
    case 700 | 701 | 1700 =>
      // float4/float8/numeric text is usually a valid JSON number, but
      // PostgreSQL can emit NaN/Infinity/-Infinity — quote those (bare,
      // they would poison the whole envelope line)
      if (text == "NaN" || text == "Infinity" || text == "-Infinity") s""""$text""""
      else text
    case _ => "\"" + text.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
  }

  private def jsonObj(fields: Seq[(String, String)]): String =
    fields.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")

  /** Append decoded envelope lines as the next immutable WAL segment of
    * `db` — the same atomic tmp+move protocol the tailer uses, so the
    * DSv2 reader never observes a partial file. No-op on empty input. */
  def appendSegment(db: Path, lines: Seq[String]): Unit = if (lines.nonEmpty) {
    val walDir = Files.createDirectories(db.resolve("wal"))
    val seq = CdcLayout.walFiles(db).size
    val tmp = walDir.resolve(f".wal-$seq%06d.jsonl.tmp")
    Files.writeString(tmp, lines.mkString("", "\n", "\n"))
    Files.move(tmp, walDir.resolve(f"wal-$seq%06d.jsonl"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}
