package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import java.util.concurrent.{CompletableFuture, TimeUnit, TimeoutException}

/** Kafka sink semantics — debezium-server-kafka
  * (KafkaChangeConsumer.java:98-150): messages are handed to an ASYNC
  * producer as fast as it accepts them, then the returned futures are
  * awaited IN SEND ORDER (so a failure surfaces at the earliest
  * unacknowledged record and everything before it is known-delivered),
  * with an optional per-record delivery timeout; record headers travel
  * as byte headers.
  *
  * The producer is pluggable (`KafkaLikeProducer`): with the real
  * Kafka client jar on the classpath a thin adapter implements it with
  * `KafkaProducer.send`; tests use an in-process stub. On a cluster
  * the canonical route is Spark's built-in kafka writer
  * (`df.write.format("kafka")` with topic/key/value/headers columns) —
  * this sink exists to carry the reference's exact await-in-order +
  * timeout contract, which the built-in writer does not expose.
  * Runs on executors via foreachPartition; one producer per partition.
  */
object KafkaSink {
  /** Async producer contract (KafkaProducer.send shape). */
  trait KafkaLikeProducer extends AutoCloseable {
    def send(topic: String, key: String, value: String,
             headers: Map[String, String]): CompletableFuture[Unit]
  }
}

final class KafkaSink(producerFactory: () => KafkaSink.KafkaLikeProducer,
                      deliveryTimeoutMs: Option[Long] = None)
    extends SinkConnector {

  override def name: String = "kafka"
  override def tombstoneSupport: Boolean = true

  override def write(batch: DataFrame, epochId: Long): Unit = {
    val (pf, timeout) = (producerFactory, deliveryTimeoutMs)
    batch.select(col("destination"), to_json(col("key")).as("k"),
                 to_json(col("value")).as("v"), col("headers"))
      .foreachPartition { (rows: Iterator[Row]) =>
        if (rows.hasNext) {
          val producer = pf()
          try {
            // fire all sends, keep futures in send order
            val inflight = rows.map { r =>
              val headers = Option(r.getMap[String, String](3)).map(_.toMap).getOrElse(Map.empty)
              producer.send(r.getString(0), r.getString(1), r.getString(2), headers)
            }.toVector
            // await in order — first failure aborts the task (replayed
            // epoch + idempotent downstream = at-least-once, like the
            // reference's per-record commit cursor)
            inflight.foreach { f =>
              timeout match {
                case Some(ms) =>
                  try f.get(ms, TimeUnit.MILLISECONDS)
                  catch { case _: TimeoutException =>
                    throw new RuntimeException(s"kafka delivery timed out after ${ms}ms") }
                case None => f.get()
              }
            }
          } finally producer.close()
        }
      }
  }
}
