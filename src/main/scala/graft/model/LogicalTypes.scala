package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium logical type system → Spark (SURVEY.md §1.3), the rebuild
  * of the reference's two-way converter
  * (debezium-server-fluss/.../FlussTypeConverter.java:112-237) plus the
  * vector types the vector sinks consume
  * (MilvusSchema.java:110-148, QdrantMessageFactory.java:296-307).
  *
  * Wire values (what a connector puts in the envelope) are plain
  * primitives tagged with a logical type NAME in the schema; this
  * module maps name → Spark DataType and wire value → typed Column.
  * All conversions are Catalyst built-ins (codegen'd, no UDFs).
  */
object LogicalTypes {

  // Debezium logical type names (io.debezium.time.*, io.debezium.data.*)
  val DecimalName       = "org.apache.kafka.connect.data.Decimal"
  val VarScaleDecimal   = "io.debezium.data.VariableScaleDecimal"
  val DateName          = "io.debezium.time.Date"           // epoch DAYS (int32)
  val TimeName          = "io.debezium.time.Time"           // millis of day (int32)
  val MicroTimeName     = "io.debezium.time.MicroTime"      // micros of day (int64)
  val NanoTimeName      = "io.debezium.time.NanoTime"       // nanos of day (int64)
  val TimestampName     = "io.debezium.time.Timestamp"      // epoch millis (int64)
  val MicroTimestampName = "io.debezium.time.MicroTimestamp" // epoch micros (int64)
  val NanoTimestampName = "io.debezium.time.NanoTimestamp"  // epoch nanos (int64)
  val ZonedTimestampName = "io.debezium.time.ZonedTimestamp" // ISO-8601 string with offset
  val JsonName          = "io.debezium.data.Json"
  val UuidName          = "io.debezium.data.Uuid"
  val EnumName          = "io.debezium.data.Enum"
  val BitsName          = "io.debezium.data.Bits"
  val GeometryName      = "io.debezium.data.geometry.Geometry" // {wkb bytes, srid int}
  val PointName         = "io.debezium.data.geometry.Point"
  val FloatVectorName   = "io.debezium.data.vector.FloatVector"
  val DoubleVectorName  = "io.debezium.data.vector.DoubleVector"
  val SparseVectorName  = "io.debezium.data.vector.SparseDoubleVector"

  /** Spark type a logical type lands as (FlussTypeConverter.java:
    * 95-103 decimal, 147-165 temporals, 70-86 string-logicals +
    * geometry, 78-81 vectors). */
  def sparkTypeFor(logicalName: String, params: Map[String, String] = Map.empty): DataType =
    logicalName match {
      case DecimalName =>
        DecimalType(params.get("connect.decimal.precision").map(_.toInt).getOrElse(38),
                    params.get("scale").map(_.toInt).getOrElse(0))
      case VarScaleDecimal   => DecimalType(38, 18)
      case DateName          => DateType
      case TimeName | MicroTimeName | NanoTimeName => LongType // micros of day
      case TimestampName | MicroTimestampName | NanoTimestampName => TimestampNTZType
      case ZonedTimestampName => TimestampType
      case JsonName | UuidName | EnumName => StringType
      case BitsName          => BinaryType
      case GeometryName | PointName =>
        StructType(Seq(StructField("wkb", BinaryType), StructField("srid", IntegerType)))
      case FloatVectorName   => ArrayType(FloatType)
      case DoubleVectorName  => ArrayType(DoubleType)
      case SparseVectorName  => MapType(IntegerType, DoubleType)
      case _                 => StringType
    }

  /** epoch-days int32 → DateType (FlussTypeConverter.java:212-214). */
  def date(epochDays: Column): Column = date_add(to_date(lit("1970-01-01")), epochDays.cast("int"))

  /** time-of-day in millis/micros/nanos → micros of day (the common
    * denominator the reference renders, :215-218). */
  def timeMillisToMicros(v: Column): Column = v.cast("long") * 1000L
  def timeNanosToMicros(v: Column): Column  = v.cast("long") / lit(1000L)

  /** epoch millis/micros/nanos → timestamp (micros precision, like
    * DuckDB TIMESTAMP and the reference's rendering :219-223). */
  def timestampMillis(v: Column): Column = timestamp_millis(v.cast("long"))
  def timestampMicros(v: Column): Column = timestamp_micros(v.cast("long"))
  def timestampNanos(v: Column): Column  = timestamp_micros((v.cast("long") / lit(1000L)).cast("long"))

  /** ISO-8601 string with offset → TimestampType (UTC-normalized). */
  def zonedTimestamp(v: Column): Column = to_timestamp(v)

  /** VariableScaleDecimal wire struct {scale:int, value:bytes
    * (unscaled big-endian)} → decimal string; the byte decode needs a
    * JVM hop (conv on binary is not built-in), kept OFF the default
    * path — prefer fixed-scale Decimal columns. */
  def variableScaleDecimal(scale: Column, unscaled: Column): Column = {
    val u = udf((bytes: Array[Byte], s: Int) =>
      if (bytes == null) null else new java.math.BigDecimal(new java.math.BigInteger(bytes), s).toPlainString)
    u(unscaled, scale)
  }

  /** FloatVector wire (array<float>) → array<double> for double-side
    * math (QdrantMessageFactory.java:296-307 does the inverse). */
  def floatVectorToDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Geometry wire struct → typed struct (wkb, srid). */
  def geometry(wkb: Column, srid: Column): Column =
    struct(wkb.cast("binary").as("wkb"), srid.cast("int").as("srid"))
}
