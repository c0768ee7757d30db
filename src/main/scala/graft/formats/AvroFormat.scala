package graft.formats

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._
import java.io.ByteArrayOutputStream
import scala.jdk.CollectionConverters._

/** Avro binary serialization for envelope records — the reference's
  * `avro` format (DebeziumSerializationProducer.java:103-154 resolves
  * it to the Avro converter). Built directly on the Avro Java library
  * (on the Spark classpath); no schema registry — the writer schema is
  * derived from the Spark StructType, and the reader side must use the
  * same schema (schema-registry wire framing is a deployment concern).
  *
  * The encode is a Scala UDF (Row → bytes): Avro's datum writer is
  * inherently row-at-a-time JVM code, so a UDF is the right seam — the
  * surrounding projection stays whole-stage-codegen'd and only the
  * final serialize hop leaves codegen (same cost shape as the
  * reference's converter call per record).
  */
object AvroFormat {

  /** Spark StructType → Avro record schema (nullable fields become
    * [null, T] unions, matching Connect's optional fields). */
  def avroSchema(st: StructType, name: String = "Envelope", namespace: String = "graft"): Schema = {
    val fields = SchemaBuilder.record(name).namespace(namespace).fields()
    st.fields.foldLeft(fields) { (fs, f) =>
      fs.name(f.name).`type`(nullable(toAvro(f.dataType, s"${name}_${f.name}"))).withDefault(null)
    }.endRecord()
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), s))

  private def toAvro(dt: DataType, path: String): Schema = dt match {
    case StringType    => Schema.create(Schema.Type.STRING)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType      => Schema.create(Schema.Type.LONG)
    case FloatType     => Schema.create(Schema.Type.FLOAT)
    case DoubleType    => Schema.create(Schema.Type.DOUBLE)
    case BooleanType   => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType    => Schema.create(Schema.Type.BYTES)
    case s: StructType => avroSchema(s, path)
    case ArrayType(et, _) => Schema.createArray(nullable(toAvro(et, s"${path}_item")))
    case MapType(StringType, vt, _) => Schema.createMap(nullable(toAvro(vt, s"${path}_value")))
    case other => throw new IllegalArgumentException(s"avro: unsupported type $other at $path")
  }

  private def toGeneric(value: Any, dt: DataType, schema: Schema): AnyRef = {
    if (value == null) return null
    val s = if (schema.getType == Schema.Type.UNION)
      schema.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else schema
    (value, dt) match {
      case (r: Row, st: StructType) =>
        val rec = new GenericData.Record(s)
        st.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name, toGeneric(if (r.isNullAt(i)) null else r.get(i), f.dataType,
            s.getField(f.name).schema()))
        }
        rec
      case (seq: scala.collection.Seq[_], ArrayType(et, _)) =>
        val arr = new java.util.ArrayList[AnyRef](seq.length)
        seq.foreach(x => arr.add(toGeneric(x, et, s.getElementType)))
        arr
      case (m: scala.collection.Map[_, _], MapType(_, vt, _)) =>
        val jm = new java.util.HashMap[String, AnyRef]()
        m.foreach { case (k, v) => jm.put(k.toString, toGeneric(v, vt, s.getValueType)) }
        jm
      case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
      case (x, _) => x.asInstanceOf[AnyRef]
    }
  }

  /** Row → Avro bytes with per-executor cached schema/writer state
    * (the DDL string is the serializable seed; everything derived is
    * @transient lazy, rebuilt once per executor, not per row). */
  private final class EncodeFn(ddl: String) extends (Row => Array[Byte]) with Serializable {
    @transient private lazy val structType = StructType.fromDDL(ddl)
    @transient private lazy val schema = avroSchema(structType)
    @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)
    override def apply(r: Row): Array[Byte] =
      if (r == null) null
      else {
        val rec = toGeneric(r, structType, schema).asInstanceOf[GenericRecord]
        val out = new ByteArrayOutputStream()
        val e = EncoderFactory.get().binaryEncoder(out, null)
        writer.write(rec, e)
        e.flush()
        out.toByteArray
      }
  }

  /** Serializer UDF for a struct column with the given Spark schema. */
  def encoder(st: StructType): Column => Column = {
    val enc = udf(new EncodeFn(st.toDDL))
    c => enc(c)
  }

  /** JVM-side decode (for tests / consumers): bytes → GenericRecord. */
  def decode(bytes: Array[Byte], st: StructType): GenericRecord = {
    val schema = avroSchema(st)
    val d = DecoderFactory.get().binaryDecoder(bytes, null)
    new GenericDatumReader[GenericRecord](schema).read(null, d)
  }
}
