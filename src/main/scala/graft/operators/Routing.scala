package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Destination-to-transport routing computations of the remaining sink
  * families, as Column functions (pure projection, codegen'd):
  *
  *  - RabbitMQ: exchange + routing key from static config or the
  *    topic/destination (RabbitMqStreamChangeConsumer.java:149-158);
  *  - NATS: subject = destination (JetStream subjects are dotted like
  *    destinations, NatsJetStreamChangeConsumer; NATS Streaming uses
  *    it as the channel, NatsStreamingChangeConsumer.java:118-131);
  *  - RocketMQ: queue = hash(key) % queueCount
  *    (SelectMessageQueueByHash, RocketMqChangeConsumer.java:166) —
  *    the same portable hash the EventHubs routing uses.
  */
object Routing {

  /** RabbitMQ exchange: static override or the destination. */
  def rabbitExchange(staticExchange: Option[String]): Column =
    staticExchange.map(lit(_)).getOrElse(col("destination"))

  /** RabbitMQ routing key: static override or the destination with
    * dots kept (AMQP topic-exchange dotted words). */
  def rabbitRoutingKey(staticKey: Option[String]): Column =
    staticKey.map(lit(_)).getOrElse(col("destination"))

  /** NATS subject — destination, sanitized of chars NATS rejects
    * (spaces and wildcard tokens). */
  def natsSubject: Column =
    regexp_replace(col("destination"), "[ *>]", "_")

  /** RocketMQ/EventHubs hash-routed queue id for a key column. */
  def queueFor(key: Column, queueCount: Int): Column =
    Portable.partitionFor(key, queueCount)

  /** EventHubs partition-routing strategies
    * (DynamicPartitionRoutingStrategy.java:8-21):
    *  - DEFAULT: service-assigned — here a stable spread over the
    *    record's own position (round-robin analog without state);
    *  - KEY: hash(key) % partitions with a pluggable digest
    *    (HashFunction.java:18-63);
    *  - PARTITIONID: explicit partition id from a record column
    *    (header/config-driven). */
  sealed trait PartitionStrategy
  case object DefaultRouting extends PartitionStrategy
  final case class KeyRouting(hashAlgo: String = "md5") extends PartitionStrategy
  final case class PartitionIdRouting(idColumn: Column) extends PartitionStrategy

  def partitionRouting(strategy: PartitionStrategy, key: Column, nPartitions: Int): Column =
    strategy match {
      case DefaultRouting =>
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(nPartitions.toLong))
      case KeyRouting(algo) =>
        pmod(Portable.hash64(key, algo), lit(nPartitions.toLong))
      case PartitionIdRouting(idCol) =>
        val p = idCol.cast("long")
        when(p >= 0 && p < nPartitions, p).otherwise(
          raise_error(concat(lit(s"partition id out of range [0,$nPartitions): "), p.cast("string"))))
    }
}
