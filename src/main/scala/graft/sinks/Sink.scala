package graft.sinks

import org.apache.spark.sql.DataFrame

/** Sink contract — the Spark rebuild of DebeziumServerConsumer +
  * DebeziumServerSink lifecycle (debezium-server-core/.../api/
  * DebeziumServerConsumer.java:29-36, DebeziumServerSink.java:32-87:
  * validateConnection → configure → handle* → close).
  *
  * `write` receives one micro-batch with the canonical record schema
  * (graft.model.Envelope.recordSchema) or a flattened row frame, plus
  * the epoch id. Structured Streaming replays whole epochs on failure,
  * so every implementation must be IDEMPOTENT per (destination,
  * epochId) — the per-record commit() of the reference (SURVEY.md §7.5)
  * becomes epoch-keyed exactly-once.
  */
trait SinkConnector extends AutoCloseable {
  /** Registry name, mirrors `debezium.sink.type` values. */
  def name: String

  /** Pre-flight connectivity/config check; fail fast before the query
    * starts (DebeziumServerSink.validateConnection). */
  def validate(): Unit = ()

  /** Whether null-value records (tombstones) should be delivered
    * (TombstoneSupportProducer.java:33-42). */
  def tombstoneSupport: Boolean = true

  def write(batch: DataFrame, epochId: Long): Unit

  override def close(): Unit = ()

  /** foreachBatch adapter with tombstone gating applied, for wiring
    * into writeStream. */
  final def foreachBatchFn: (DataFrame, Long) => Unit = { (df, epoch) =>
    val gated = graft.operators.EventShaping.filterTombstones(df, tombstoneSupport)
    write(gated, epoch)
  }
}

/** Sink registry — replaces CDI @Named lookup
  * (ChangeConsumerProducer.java:61-90): unknown name fails with the
  * list of known sinks, ambiguity is impossible by construction. */
final class SinkRegistry(sinks: Seq[SinkConnector]) {
  private val byName = sinks.map(s => s.name -> s).toMap
  require(byName.size == sinks.size, "duplicate sink names")

  def resolve(name: String): SinkConnector =
    byName.getOrElse(name, throw new IllegalArgumentException(
      s"unknown sink type '$name'; known: ${byName.keys.toSeq.sorted.mkString(", ")}"))
}
