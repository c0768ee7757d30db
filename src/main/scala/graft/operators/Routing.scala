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
}
