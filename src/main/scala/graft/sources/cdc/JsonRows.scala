package graft.sources.cdc

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Schema-driven JSON → InternalRow conversion for the CDC source's
  * partition readers. Self-contained (Jackson only — no dependence on
  * Spark's internal JacksonParser), covering the envelope type surface:
  * primitives, nested structs, arrays, and string→string maps
  * (graft.model.Envelope + SURVEY.md §1.3).
  */
private[graft] object JsonRows {
  private val mapper = new ObjectMapper()

  def parse(line: String): JsonNode = mapper.readTree(line)

  def toInternalRow(node: JsonNode, schema: StructType): InternalRow =
    if (node == null || node.isNull) null
    else new GenericInternalRow(
      schema.fields.map(f => convert(node.get(f.name), f.dataType)))

  private def convert(n: JsonNode, dt: DataType): Any =
    if (n == null || n.isNull) null
    else dt match {
      case StringType =>
        UTF8String.fromString(if (n.isTextual) n.textValue() else n.toString)
      case LongType      => n.asLong()
      case IntegerType   => n.asInt()
      case ShortType     => n.asInt().toShort
      case ByteType      => n.asInt().toByte
      case DoubleType    => n.asDouble()
      case FloatType     => n.asDouble().toFloat
      case BooleanType   => n.asBoolean()
      case BinaryType    => n.binaryValue()
      case d: DecimalType =>
        // exact decimal text (NEWDECIMAL / numeric envelopes) → Decimal
        Decimal(new java.math.BigDecimal(n.asText()), d.precision, d.scale)
      case DateType => // epoch-days number, or an ISO date string
        if (n.isNumber) n.asInt()
        else java.time.LocalDate.parse(n.asText()).toEpochDay.toInt
      case TimestampType => // epoch-micros number, or an ISO-8601 instant
        if (n.isNumber) n.asLong()
        else {
          val i = java.time.Instant.parse(n.asText())
          i.getEpochSecond * 1000000L + i.getNano / 1000L
        }
      case s: StructType => toInternalRow(n, s)
      case ArrayType(et, _) =>
        val it = n.elements()
        val buf = scala.collection.mutable.ArrayBuffer[Any]()
        while (it.hasNext) buf += convert(it.next(), et)
        new GenericArrayData(buf.toArray)
      case MapType(StringType, vt, _) =>
        val names = n.fieldNames()
        val ks = scala.collection.mutable.ArrayBuffer[Any]()
        val vs = scala.collection.mutable.ArrayBuffer[Any]()
        while (names.hasNext) {
          val k = names.next()
          ks += UTF8String.fromString(k)
          vs += convert(n.get(k), vt)
        }
        ArrayBasedMapData(ks.toArray, vs.toArray)
      case other =>
        throw new IllegalArgumentException(s"unsupported CDC source type: $other")
    }
}
