package graft.formats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Serialization format operators — the reference's
  * `debezium.format.{key,value,header}` layer
  * (DebeziumSerializationProducer.java:60-68,103-154: json,
  * jsonbytearray, avro, protobuf, cloudevents, binary, simplestring,
  * connect). Each format is a Column transform over the typed record,
  * so serialization fuses into the same codegen stage as the SMT chain.
  *
  * Implemented: json, jsonbytearray, simplestring, connect (identity —
  * keep the typed struct end-to-end, DebeziumServerConnectFormatIT),
  * cloudevents (JSON envelope per the CloudEvents 1.0 attribute set).
  * avro/protobuf need their connector jars (not shipped here); the
  * registry rejects them with the same fail-at-startup behavior as the
  * reference's unknown-format error.
  */
object Formats {

  sealed trait Format {
    def name: String
    /** Serialize a struct column (key or value) for delivery. */
    def serialize(c: Column): Column
  }

  /** Compact JSON. `ignoreNull=false` keeps explicit nulls (before/
    * after of envelopes) so round-trips preserve shape. */
  case object Json extends Format {
    val name = "json"
    def serialize(c: Column): Column =
      to_json(c, Map("ignoreNullFields" -> "false"))
  }

  /** JSON as UTF-8 bytes (sinks that want byte arrays). */
  case object JsonByteArray extends Format {
    val name = "jsonbytearray"
    def serialize(c: Column): Column = Json.serialize(c).cast("binary")
  }

  /** toString-style rendering (SimpleString format). */
  case object SimpleString extends Format {
    val name = "simplestring"
    def serialize(c: Column): Column = c.cast("string")
  }

  /** Keep the typed struct — the Connect format pass-through. */
  case object Connect extends Format {
    val name = "connect"
    def serialize(c: Column): Column = c
  }

  def forName(name: String): Format = name match {
    case "json"          => Json
    case "jsonbytearray" => JsonByteArray
    case "simplestring"  => SimpleString
    case "connect"       => Connect
    case other => throw new IllegalArgumentException(
      s"unsupported format '$other' (supported: json, jsonbytearray, simplestring, connect)")
  }

  /** CloudEvents 1.0 JSON envelope around the serialized value —
    * the reference's cloudevents format (id = source position, type =
    * io.debezium.<connector>.datachangeevent convention). */
  def cloudEvents(df: DataFrame, sourceUri: String): DataFrame =
    df.withColumn("ce", to_json(struct(
      lit("1.0").as("specversion"),
      concat(col("destination"), lit("-"), coalesce(col("value.source.lsn"), lit(0L))).as("id"),
      lit(sourceUri).as("source"),
      lit("io.debezium.connector.datachangeevent").as("type"),
      lit("application/json").as("datacontenttype"),
      col("value").as("data"))))

  /** Apply key/value formats, producing the wire frame
    * {destination, key, value, headers} with serialized payloads. */
  def serializeRecords(df: DataFrame, key: Format, value: Format): DataFrame =
    df.select(
      col("destination"),
      key.serialize(col("key")).as("key"),
      value.serialize(col("value")).as("value"),
      col("headers"))
}
