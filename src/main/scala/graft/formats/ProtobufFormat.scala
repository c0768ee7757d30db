package graft.formats

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Protobuf binary serialization for envelope records — the
  * reference's `protobuf` format, implemented directly against the
  * public protobuf wire format (no generated classes, no runtime dep):
  *
  *  - field numbers are the 1-based positions of the StructType
  *    fields (a deterministic schema→message mapping, like a
  *    generated .proto from the Connect schema);
  *  - wire types: varint for integers/booleans, fixed64/fixed32 for
  *    double/float, length-delimited for strings/bytes/nested
  *    messages; arrays encode as repeated fields; maps as repeated
  *    {key=1, value=2} messages (the standard proto3 map encoding);
  *  - null fields are omitted (proto3 absence semantics).
  *
  * Encoding is schema-driven per row (same UDF seam as Avro). The
  * decoder exists for consumers/tests — together they round-trip any
  * envelope shape.
  */
object ProtobufFormat {

  // ---- wire-level primitives -------------------------------------------

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v = v >>> 7 }
    out.write(v.toInt)
  }
  private def writeTag(out: ByteArrayOutputStream, field: Int, wireType: Int): Unit =
    writeVarint(out, (field.toLong << 3) | wireType)
  private def writeLenDelim(out: ByteArrayOutputStream, field: Int, bytes: Array[Byte]): Unit = {
    writeTag(out, field, 2); writeVarint(out, bytes.length.toLong); out.write(bytes)
  }
  private def writeFixed64(out: ByteArrayOutputStream, bits: Long): Unit =
    (0 until 8).foreach(i => out.write(((bits >>> (8 * i)) & 0xFF).toInt))
  private def writeFixed32(out: ByteArrayOutputStream, bits: Int): Unit =
    (0 until 4).foreach(i => out.write(((bits >>> (8 * i)) & 0xFF).toInt))

  // ---- schema-driven encode --------------------------------------------

  private def encodeValue(out: ByteArrayOutputStream, field: Int, v: Any, dt: DataType): Unit =
    (v, dt) match {
      case (null, _) => ()
      case (s: String, StringType) =>
        writeLenDelim(out, field, s.getBytes(StandardCharsets.UTF_8))
      case (b: Array[Byte], BinaryType) => writeLenDelim(out, field, b)
      case (n: Long, LongType)     => writeTag(out, field, 0); writeVarint(out, n)
      case (n: Int, IntegerType)   => writeTag(out, field, 0); writeVarint(out, n.toLong)
      case (n: Short, ShortType)   => writeTag(out, field, 0); writeVarint(out, n.toLong)
      case (n: Byte, ByteType)     => writeTag(out, field, 0); writeVarint(out, n.toLong)
      case (b: Boolean, BooleanType) => writeTag(out, field, 0); writeVarint(out, if (b) 1L else 0L)
      case (d: Double, DoubleType) =>
        writeTag(out, field, 1); writeFixed64(out, java.lang.Double.doubleToLongBits(d))
      case (f: Float, FloatType) =>
        writeTag(out, field, 5); writeFixed32(out, java.lang.Float.floatToIntBits(f))
      case (r: Row, st: StructType) => writeLenDelim(out, field, encodeRow(r, st))
      case (seq: scala.collection.Seq[_], ArrayType(et, _)) =>
        seq.foreach(x => encodeValue(out, field, x, et)) // repeated field
      case (m: scala.collection.Map[_, _], MapType(kt, vt, _)) =>
        m.foreach { case (k, mv) => // repeated {key=1, value=2} entry
          val entry = new ByteArrayOutputStream()
          encodeValue(entry, 1, k, kt)
          encodeValue(entry, 2, mv, vt)
          writeLenDelim(out, field, entry.toByteArray)
        }
      case (x, other) =>
        throw new IllegalArgumentException(s"protobuf: unsupported ($x: $other)")
    }

  def encodeRow(r: Row, st: StructType): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    st.fields.zipWithIndex.foreach { case (f, i) =>
      encodeValue(out, i + 1, if (r.isNullAt(i)) null else r.get(i), f.dataType)
    }
    out.toByteArray
  }

  private final class EncodeFn(ddl: String) extends (Row => Array[Byte]) with Serializable {
    @transient private lazy val structType = StructType.fromDDL(ddl)
    override def apply(r: Row): Array[Byte] =
      if (r == null) null else encodeRow(r, structType)
  }

  /** Serializer UDF for a struct column with the given Spark schema. */
  def encoder(st: StructType): Column => Column = {
    val enc = udf(new EncodeFn(st.toDDL))
    c => enc(c)
  }

  // ---- decode (consumers/tests) ----------------------------------------

  /** Decoded field map → Row in schema order; fields the wire omitted
    * (nulls — proto3 has no null marker, absence IS null) come back
    * null. Nested messages and repeated messages recurse.
    *
    * EMPTY-COLLECTION COLLAPSE (inherent to proto3, documented per
    * round-16 advice): an empty Seq/Map encodes to ZERO wire bytes —
    * the encoding of absence — so `encoder(Seq())` round-trips back
    * as null, not `Seq()`. Proto3 genuinely cannot distinguish the
    * two without a wrapper message; callers that care must treat
    * null and empty as equivalent after a protobuf hop (cdc36's
    * headers map is always non-empty, so its oracle never sees the
    * collapse). */
  private def mapToRow(m: Map[String, Any], st: StructType): Row =
    Row.fromSeq(st.fields.toSeq.map { f =>
      m.get(f.name) match {
        case None => null
        case Some(v) => (v, f.dataType) match {
          case (mm: Map[_, _], s: StructType) =>
            mapToRow(mm.asInstanceOf[Map[String, Any]], s)
          case (seq: Seq[_], ArrayType(et: StructType, _)) =>
            seq.map(x => mapToRow(x.asInstanceOf[Map[String, Any]], et))
          case (mm: Map[_, _], MapType(_, vt: StructType, _)) =>
            mm.asInstanceOf[Map[String, Any]].map { case (k, ev) =>
              k -> mapToRow(ev.asInstanceOf[Map[String, Any]], vt) }
          case _ => v
        }
      }
    })

  /** Bytes → Row decoder UDF — the executor-side twin of [[encoder]],
    * per-executor cached schema from the serializable DDL seed. */
  private final class DecodeFn(ddl: String)
      extends org.apache.spark.sql.api.java.UDF1[Array[Byte], Row] {
    @transient private lazy val structType = StructType.fromDDL(ddl)
    override def call(bytes: Array[Byte]): Row =
      if (bytes == null) null else mapToRow(decode(bytes, structType), structType)
  }

  /** Distributed decode for a struct column with the given schema. */
  def decoder(st: StructType): Column => Column = {
    val dec = udf(new DecodeFn(st.toDDL), st)
    c => dec(c)
  }

  /** bytes + schema → field values (field position → value). Repeated
    * fields accumulate into Seqs, map fields into Maps. */
  def decode(bytes: Array[Byte], st: StructType): Map[String, Any] = {
    var pos = 0
    def readVarint(): Long = {
      var shift = 0; var acc = 0L; var b = 0
      do { b = bytes(pos) & 0xFF; pos += 1; acc |= (b & 0x7FL) << shift; shift += 7 }
      while ((b & 0x80) != 0)
      acc
    }
    def readFixed64(): Long = {
      var acc = 0L
      (0 until 8).foreach(i => { acc |= (bytes(pos) & 0xFFL) << (8 * i); pos += 1 })
      acc
    }
    def readFixed32(): Int = {
      var acc = 0
      (0 until 4).foreach(i => { acc |= (bytes(pos) & 0xFF) << (8 * i); pos += 1 })
      acc
    }
    val acc = scala.collection.mutable.LinkedHashMap[String, Any]()
    while (pos < bytes.length) {
      val tag = readVarint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      val f = st.fields(field - 1)
      val value: Any = (wire, f.dataType) match {
        case (0, BooleanType) => readVarint() != 0L
        case (0, IntegerType) => readVarint().toInt
        case (0, _)           => readVarint()
        case (1, _)           => java.lang.Double.longBitsToDouble(readFixed64())
        case (5, _)           => java.lang.Float.intBitsToFloat(readFixed32())
        case (2, dt) =>
          val len = readVarint().toInt
          val slice = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
          pos += len
          dt match {
            case StringType => new String(slice, StandardCharsets.UTF_8)
            case BinaryType => slice
            case s: StructType => decode(slice, s)
            case ArrayType(et: StructType, _) => decode(slice, et)
            case ArrayType(StringType, _) => new String(slice, StandardCharsets.UTF_8)
            case MapType(StringType, vt, _) =>
              val entry = decode(slice, StructType(Seq(
                StructField("key", StringType), StructField("value", vt))))
              entry("key").toString -> entry("value")
            case other => throw new IllegalArgumentException(s"decode: $other")
          }
        case (w, dt) => throw new IllegalArgumentException(s"wire $w for $dt")
      }
      f.dataType match {
        case _: ArrayType =>
          val prev = acc.getOrElse(f.name, Seq.empty[Any]).asInstanceOf[Seq[Any]]
          acc(f.name) = prev :+ value
        case _: MapType =>
          val prev = acc.getOrElse(f.name, Map.empty[String, Any]).asInstanceOf[Map[String, Any]]
          acc(f.name) = prev + value.asInstanceOf[(String, Any)]
        case _ => acc(f.name) = value
      }
    }
    acc.toMap
  }
}
