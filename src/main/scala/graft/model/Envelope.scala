package graft.model

import org.apache.spark.sql.types._

/** The Debezium change-event envelope as a Spark schema.
  *
  * Reference shape (io.debezium.data.Envelope, consumed throughout
  * debezium-server, e.g. debezium-server-fluss/.../FlussChangeConsumer.java:188-199):
  *
  *   { op: "c"|"u"|"d"|"r", before: Struct|null, after: Struct|null,
  *     source: Struct, ts_ms: long }
  *
  * carried on a keyed stream record
  *   { destination, key, value(envelope), headers }
  * (debezium-server-core/.../BaseChangeConsumer.java:101-108).
  *
  * We model one CDC *stream* (per-table) as a DataFrame whose rows are
  * change records with a fixed envelope StructType parameterized by the
  * table's row schema — per-record schema variance in the reference
  * collapses to per-stream schema here (SURVEY.md §1.4).
  */
object Envelope {
  // Op codes — Envelope.Operation in the reference.
  val OpCreate = "c"
  val OpUpdate = "u"
  val OpDelete = "d"
  val OpRead   = "r" // snapshot read

  /** Heartbeat destination prefix
    * (debezium-server-redis/.../RedisStreamChangeConsumer.java:67-68). */
  val HeartbeatPrefix = "__debezium-heartbeat"

  /** source block: provenance + total-order position (LSN). */
  val sourceSchema: StructType = StructType(Seq(
    StructField("connector", StringType),
    StructField("db", StringType),
    StructField("schema", StringType),
    StructField("table", StringType),
    StructField("lsn", LongType),
    StructField("snapshot", StringType),
    StructField("ts_ms", LongType)
  ))

  /** Envelope value schema for a given row schema. */
  def valueSchema(row: StructType): StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("before", row),
    StructField("after", row),
    StructField("source", sourceSchema),
    StructField("ts_ms", LongType)
  ))

  /** Full change-record schema: destination + key + envelope + headers.
    * `value` nullable: a null value with non-null key is a tombstone
    * (debezium-server-core/.../TombstoneSupportProducer.java:33-42). */
  def recordSchema(keySchema: StructType, row: StructType): StructType = StructType(Seq(
    StructField("destination", StringType, nullable = false),
    StructField("key", keySchema),
    StructField("value", valueSchema(row)),
    StructField("headers", MapType(StringType, StringType))
  ))
}
